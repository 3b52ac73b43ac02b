"""Pure-stdlib media codecs (numpy + zlib + struct + wave).

The build container has no PIL/ffmpeg, but real decode kernels do not
need them for the formats a lakehouse ingest path actually controls:
PNG and BMP images and PCM WAV audio are fully decodable with the
standard library. These kernels run INSIDE Arrow-batched ``mapInPandas``
stages (see ``operators/multimodal.py``) — plain functions of bytes so
they are unit-testable without Spark and swappable for PIL/ffmpeg
equivalents where those exist.

Scope (documented, enforced): PNG — 8-bit depth, color types 0 (gray),
2 (RGB), 4 (gray+alpha), 6 (RGBA), non-interlaced, any filter mix;
BMP — uncompressed 24-bit BI_RGB; WAV — PCM 8/16/32-bit. Anything else
raises ``UnsupportedMediaError`` with the reason.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class UnsupportedMediaError(ValueError):
    """Payload is outside the documented codec scope."""


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes -> (height, width, channels) uint8 array.

    Implements the full spec path for 8-bit non-interlaced images:
    chunk walk, multi-IDAT concatenation, zlib inflate, and scanline
    unfiltering (filters 0-4 incl. Paeth).
    """
    if data[:8] != _PNG_SIG:
        raise UnsupportedMediaError("not a PNG (bad signature)")
    pos, width = 8, None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            try:
                width, height, depth, color, comp, filt, interlace = struct.unpack(
                    ">IIBBBBB", body
                )
            except struct.error as e:
                raise UnsupportedMediaError(f"malformed IHDR: {e}") from e
            if depth != 8:
                raise UnsupportedMediaError(f"bit depth {depth} (only 8)")
            if color not in _PNG_CHANNELS:
                raise UnsupportedMediaError(f"color type {color}")
            if interlace:
                raise UnsupportedMediaError("interlaced PNG")
            channels = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if width is None:
        raise UnsupportedMediaError("missing IHDR")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        # truncated/corrupt IDAT must surface as the documented decode
        # contract, not an opaque zlib.error
        raise UnsupportedMediaError(f"corrupt IDAT stream: {e}") from e
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise UnsupportedMediaError("truncated PNG pixel data")
    out = np.empty((height, stride), dtype=np.uint8)
    prior = np.zeros(stride, dtype=np.uint8)
    bpp = channels
    for y in range(height):
        f = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if f == 0:
            recon = line
        elif f == 2:  # up
            recon = line + prior
        elif f == 1:  # sub: recon[x] = line[x] + recon[x-bpp] — a running
            # sum per channel lane, so cumsum mod 256 vectorizes it
            ints = line.astype(np.int64).reshape(width, bpp)
            recon = (np.cumsum(ints, axis=0) % 256).astype(np.uint8).reshape(stride)
        elif f == 3:  # average
            recon = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = recon[x - bpp] if x >= bpp else 0
                recon[x] = (int(line[x]) + ((int(a) + int(prior[x])) >> 1)) & 0xFF
        elif f == 4:  # paeth
            recon = np.empty(stride, dtype=np.uint8)
            for x in range(stride):
                a = int(recon[x - bpp]) if x >= bpp else 0
                b = int(prior[x])
                c = int(prior[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                recon[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise UnsupportedMediaError(f"PNG filter {f}")
        out[y] = recon
        prior = out[y]
    return out.reshape(height, width, channels)


def png_encode(arr: np.ndarray) -> bytes:
    """(height, width, channels) uint8 array -> PNG bytes (filter 0)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    height, width, channels = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if color is None:
        raise UnsupportedMediaError(f"{channels} channels")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw.extend(arr[y].astype(np.uint8).tobytes())

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed)
# ---------------------------------------------------------------------------


def bmp_decode(data: bytes) -> np.ndarray:
    """BMP bytes -> (height, width, 3) uint8 RGB array."""
    if data[:2] != b"BM":
        raise UnsupportedMediaError("not a BMP")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    width, height = struct.unpack_from("<ii", data, 18)
    (bpp,) = struct.unpack_from("<H", data, 28)
    (compression,) = struct.unpack_from("<I", data, 30)
    if bpp != 24 or compression != 0:
        raise UnsupportedMediaError(f"only 24-bit BI_RGB BMP (got {bpp}-bit)")
    bottom_up = height > 0
    height = abs(height)
    stride = (width * 3 + 3) & ~3  # rows pad to 4 bytes
    # the header's pix_off/width/height are untrusted: bound-check before
    # reading so short payloads fail with the documented contract, not a
    # bare numpy ValueError
    if width <= 0 or height <= 0:
        raise UnsupportedMediaError(f"bad BMP dimensions {width}x{height}")
    needed = pix_off + (height - 1) * stride + width * 3
    if pix_off < 0 or needed > len(data):
        raise UnsupportedMediaError(
            f"truncated BMP pixel data (need {needed} bytes, have {len(data)})"
        )
    rows = []
    for y in range(height):
        row = np.frombuffer(data, np.uint8, count=width * 3, offset=pix_off + y * stride)
        rows.append(row.reshape(width, 3)[:, ::-1])  # BGR -> RGB
    img = np.stack(rows)
    return img[::-1] if bottom_up else img


# ---------------------------------------------------------------------------
# WAV (PCM)
# ---------------------------------------------------------------------------


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (samples[n_frames, n_channels] as float64 in [-1, 1],
    sample_rate). PCM 8/16/32-bit via the stdlib ``wave`` parser."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(data)) as w:
            rate = w.getframerate()
            n_ch = w.getnchannels()
            sw = w.getsampwidth()
            frames = w.readframes(w.getnframes())
    except wave.Error as e:
        raise UnsupportedMediaError(f"not a PCM WAV: {e}") from e
    if sw == 2:
        x = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 4:
        x = np.frombuffer(frames, dtype="<i4").astype(np.float64) / 2147483648.0
    elif sw == 1:  # 8-bit WAV is unsigned
        x = (np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise UnsupportedMediaError(f"sample width {sw}")
    return x.reshape(-1, n_ch), rate


def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n_frames[, n_channels]) int16 array -> PCM16 WAV bytes."""
    import io
    import wave

    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


# ---------------------------------------------------------------------------
# Dispatch + optional PIL widening
# ---------------------------------------------------------------------------


def try_import_pil():
    """PIL.Image or None — widens image decode to JPEG/WEBP/... when the
    library exists; the stdlib paths above stay the no-dependency core."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


def decode_image_bytes(data: bytes, fmt: str | None = None) -> np.ndarray:
    """Decode image bytes by sniffing/`fmt`: PNG/BMP via the stdlib
    kernels, anything else via PIL when available."""
    if data[:8] == _PNG_SIG or fmt == "png":
        return png_decode(data)
    if data[:2] == b"BM" or fmt == "bmp":
        return bmp_decode(data)
    pil = try_import_pil()
    if pil is not None:
        import io

        img = pil.open(io.BytesIO(data))
        return np.asarray(img.convert({1: "L", 3: "RGB"}.get(
            len(img.getbands()), "RGBA")))
    raise UnsupportedMediaError(
        f"format {fmt or 'unknown'} needs PIL, which is not installed "
        "(stdlib kernels cover png/bmp)"
    )
