"""Unit tests for the stdlib media codecs (no Spark needed).

The PNG unfilter paths are validated against an independently
implemented FORWARD filter (spec direction) in this file — the decoder
never sees its own encoder for filters 1-4.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from feast_ibm_spark.functions.codecs import (
    UnsupportedMediaError,
    bmp_decode,
    decode_image_bytes,
    png_decode,
    png_encode,
    wav_decode,
    wav_encode,
)


def _rand_img(h, w, ch, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, ch), dtype=np.uint8)


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_png_roundtrip_all_color_types(ch):
    img = _rand_img(13, 9, ch)
    assert np.array_equal(png_decode(png_encode(img)), img)


def _forward_filter(img: np.ndarray, filter_type: int) -> bytes:
    """Spec-direction scanline filtering (PNG §9), implemented
    independently of the decoder's unfilter math."""
    h, w, ch = img.shape
    stride = w * ch
    flat = img.reshape(h, stride).astype(np.int64)
    out = bytearray()
    prior = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        line = flat[y]
        filt = np.empty(stride, dtype=np.int64)
        for x in range(stride):
            a = line[x - ch] if x >= ch else 0
            b = prior[x]
            c = prior[x - ch] if x >= ch else 0
            if filter_type == 0:
                pred = 0
            elif filter_type == 1:
                pred = a
            elif filter_type == 2:
                pred = b
            elif filter_type == 3:
                pred = (a + b) // 2
            else:  # paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            filt[x] = (line[x] - pred) % 256
        out.append(filter_type)
        out.extend(filt.astype(np.uint8).tobytes())
        prior = line
    return bytes(out)


def _png_from_raw(raw: bytes, w: int, h: int, color: int) -> bytes:
    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_unfilter_against_independent_forward_filter(filter_type):
    img = _rand_img(11, 7, 3, seed=filter_type)
    raw = _forward_filter(img, filter_type)
    assert np.array_equal(png_decode(_png_from_raw(raw, 7, 11, 2)), img)


def test_png_mixed_filters_per_scanline():
    img = _rand_img(5, 6, 3, seed=42)
    h, w, ch = img.shape
    stride = w * ch
    # different filter per row, still one valid stream
    rows = []
    prior = np.zeros(stride, dtype=np.int64)
    for y, ft in zip(range(h), [0, 1, 2, 3, 4]):
        one = _forward_filter(img[y : y + 1], ft)  # filters row vs zero prior
        if y == 0 or ft in (0, 1):
            rows.append(one)
        else:
            # recompute with the true prior row for up/avg/paeth
            sub = _forward_filter(img[max(0, y - 1) : y + 1], ft)
            rows.append(sub[1 + stride :])  # drop the prior row's scanline
        prior = img.reshape(h, stride)[y]
    raw = b"".join(rows)
    assert np.array_equal(png_decode(_png_from_raw(raw, w, h, 2)), img)


def test_png_multiple_idat_chunks():
    img = _rand_img(4, 4, 3)
    raw = _forward_filter(img, 0)
    comp = zlib.compress(raw)
    # split compressed stream across two IDATs
    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    data = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", comp[:5]) + chunk(b"IDAT", comp[5:])
            + chunk(b"IEND", b""))
    assert np.array_equal(png_decode(data), img)


def test_png_rejects_out_of_scope():
    with pytest.raises(UnsupportedMediaError, match="signature"):
        png_decode(b"JFIF" + b"\x00" * 32)
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))
    bad = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr16)
    with pytest.raises(UnsupportedMediaError, match="depth"):
        png_decode(bad)


def _bmp_bytes(img: np.ndarray) -> bytes:
    """Minimal independent 24-bit bottom-up BMP writer."""
    h, w, _ = img.shape
    stride = (w * 3 + 3) & ~3
    pix = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = img[y][:, ::-1].astype(np.uint8).tobytes()  # RGB->BGR
        pix.extend(row + b"\x00" * (stride - len(row)))
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pix), 2835,
                      2835, 0, 0)
    return header + dib + bytes(pix)


def test_bmp_decode():
    img = _rand_img(6, 5, 3)
    assert np.array_equal(bmp_decode(_bmp_bytes(img)), img)
    with pytest.raises(UnsupportedMediaError):
        bmp_decode(b"XX" + b"\x00" * 60)


def test_malformed_payloads_raise_documented_contract():
    """Round-5 advice fix: corrupt/truncated payloads must surface as
    UnsupportedMediaError, never as a bare zlib.error / numpy ValueError
    / struct.error escaping to decode_images callers."""
    def chunk(ctype, body):
        return (struct.pack(">I", len(body)) + ctype + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))

    # corrupt IDAT: valid structure, garbage deflate stream
    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    corrupt = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", b"\xde\xad\xbe\xef\x00\x11")
               + chunk(b"IEND", b""))
    with pytest.raises(UnsupportedMediaError, match="IDAT"):
        png_decode(corrupt)

    # short IHDR body
    short_ihdr = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", b"\x00\x00")
    with pytest.raises(UnsupportedMediaError, match="IHDR"):
        png_decode(short_ihdr)

    # BMP whose header promises more pixel data than the payload holds
    img = _rand_img(6, 5, 3)
    full = _bmp_bytes(img)
    with pytest.raises(UnsupportedMediaError, match="truncated"):
        bmp_decode(full[: len(full) - 20])


def test_wav_roundtrip_pcm16_stereo():
    rng = np.random.RandomState(3)
    samples = rng.randint(-32768, 32767, size=(480, 2), dtype=np.int16)
    x, rate = wav_decode(wav_encode(samples, 16000))
    assert rate == 16000 and x.shape == (480, 2)
    assert np.allclose(x * 32768.0, samples)


def test_wav_rejects_non_wav():
    with pytest.raises(UnsupportedMediaError):
        wav_decode(b"\x00" * 64)


def test_decode_image_bytes_dispatch():
    img = _rand_img(3, 3, 3)
    assert np.array_equal(decode_image_bytes(png_encode(img)), img)
    assert np.array_equal(decode_image_bytes(_bmp_bytes(img)), img)
    with pytest.raises(UnsupportedMediaError, match="PIL|format"):
        decode_image_bytes(b"\xff\xd8\xff\xe0" + b"\x00" * 32, "jpeg")


def test_decode_image_bytes_via_pil_when_available():
    PIL = pytest.importorskip("PIL.Image")
    import io

    img = _rand_img(5, 4, 3)
    buf = io.BytesIO()
    PIL.fromarray(img).save(buf, format="JPEG", quality=100)
    out = decode_image_bytes(buf.getvalue(), "jpeg")
    assert out.shape[:2] == (5, 4)
