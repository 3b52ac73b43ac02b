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


# ---------------------------------------------------------------------------
# GIF (multi-frame) — round 6. A GIF89a-structured container with GIF LZW
# (variable-width codes, clear/EOI, 12-bit cap with table reset) over a
# 256-entry grayscale palette: the engine's REAL multi-frame media format,
# which upgrades video-style frame sampling from an env-gated stub to an
# executed kernel (operators/multimodal.frame_sample). The encoder/decoder
# pair is roundtrip-verified across code-size growth and table reset; the
# LZW code-size boundary policy is self-consistent between the pair (the
# classic early-change ambiguity; external-viewer compatibility is
# untested in this container — no PIL/ffmpeg to cross-check against).


def _gif_lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    next_code = eoi + 1
    code_size = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    out_bits: list[int] = []

    def emit(code: int, size: int) -> None:
        for b in range(size):
            out_bits.append((code >> b) & 1)

    emit(clear, code_size)
    buf = b""
    for sym in indices:
        nxt = buf + bytes([sym])
        if nxt in table:
            buf = nxt
        else:
            emit(table[buf], code_size)
            table[nxt] = next_code
            next_code += 1
            if next_code - 1 == (1 << code_size) and code_size < 12:
                code_size += 1
            elif next_code - 1 == (1 << 12):
                emit(clear, code_size)
                table = {bytes([i]): i for i in range(clear)}
                next_code = eoi + 1
                code_size = min_code_size + 1
            buf = bytes([sym])
    if buf:
        emit(table[buf], code_size)
    emit(eoi, code_size)
    by = bytearray()
    for i in range(0, len(out_bits), 8):
        v = 0
        for j, bit in enumerate(out_bits[i : i + 8]):
            v |= bit << j
        by.append(v)
    return bytes(by)


def _gif_lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    table = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev = None
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + code_size <= total_bits:
        code = 0
        for b in range(code_size):
            byte = data[(bitpos + b) >> 3]
            code |= ((byte >> ((bitpos + b) & 7)) & 1) << b
        bitpos += code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:
            entry = prev + prev[:1]
            table.append(entry)
        out.extend(entry)
        prev = entry
        if len(table) == (1 << code_size) and code_size < 12:
            code_size += 1
        if len(out) >= n_expected:
            break
    return bytes(out[:n_expected])


def gif_encode(frames: np.ndarray) -> bytes:
    """(n_frames, h, w) uint8 grayscale -> multi-frame GIF bytes."""
    import struct

    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim != 3:
        raise UnsupportedMediaError("gif_encode expects (n, h, w) uint8")
    n, h, w = frames.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0xF7, 0, 0)
    for i in range(256):
        out += bytes([i, i, i])  # grayscale global palette
    mcs = 8
    for f in range(n):
        out += b"\x2C" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        out.append(mcs)
        data = _gif_lzw_encode(frames[f].ravel().tolist(), mcs)
        for i in range(0, len(data), 255):
            chunk = data[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3B"
    return bytes(out)


def gif_decode(data: bytes) -> np.ndarray:
    """Multi-frame GIF bytes -> (n_frames, h, w) uint8 (palette R channel)."""
    import struct

    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise UnsupportedMediaError("not a GIF bitstream")
    w, h, flags, _, _ = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    palette = None
    if flags & 0x80:
        gct_size = 2 << (flags & 7)
        palette = np.frombuffer(
            data[pos : pos + 3 * gct_size], dtype=np.uint8
        ).reshape(-1, 3)
        pos += 3 * gct_size
    frames = []
    while pos < len(data):
        b = data[pos]
        if b == 0x3B:
            break
        if b == 0x21:  # extension block: skip sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
            continue
        if b != 0x2C:
            raise UnsupportedMediaError(f"unexpected GIF block 0x{b:02x}")
        _, _, fw, fh, lflags = struct.unpack("<HHHHB", data[pos + 1 : pos + 10])
        pos += 10
        if lflags & 0x80:
            pos += 3 * (2 << (lflags & 7))
        mcs = data[pos]
        pos += 1
        lzw = bytearray()
        while data[pos] != 0:
            ln = data[pos]
            lzw += data[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = np.frombuffer(
            _gif_lzw_decode(bytes(lzw), mcs, fw * fh), dtype=np.uint8
        )
        frames.append(idx.reshape(fh, fw))
    if not frames:
        raise UnsupportedMediaError("GIF contains no image blocks")
    arr = np.stack(frames)
    if palette is not None:
        arr = palette[arr, 0]
    return arr
