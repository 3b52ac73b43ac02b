"""Multimodal column handling (north-star extension).

Images/audio/video are carried as opaque ``binary`` columns plus a typed
metadata struct — the pattern that scales: payload bytes never pass
through Python row-at-a-time; they move in Arrow record batches into
Pandas UDFs (``mapInPandas``) only for the stages that genuinely need a
codec.

Since round 4 the image/audio decode kernels are REAL for the formats
the stdlib can parse — PNG/BMP images (``functions/codecs.py``: chunk
walk, inflate, full unfilter; 24-bit BMP) and PCM WAV audio — with PIL
widening image coverage to JPEG/WEBP/… when installed
(``codecs.try_import_pil``). Only the paths that genuinely require an
absent third-party codec remain stubs with a clear
``NotImplementedError``: video frame sampling (ffmpeg) and non-PNG/BMP
images without PIL. ``byte_features`` stays as the codec-free baseline
extractor.

Scale design: ``mapInPandas`` streams Arrow batches (default 10k rows /
``spark.sql.execution.arrow.maxRecordsPerBatch``); media rows are large,
so callers should ``repartition`` by size or set the batch size down to
keep executor memory bounded. No shuffle is introduced by the extractors
themselves.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),  # image|audio|video
        StructField("format", StringType()),      # png|jpeg|wav|mp4|...
        StructField("n_bytes", LongType()),
    ]
)


def attach_media_columns(
    df: DataFrame, id_col: str, bytes_col, media_type: str, fmt: str
) -> DataFrame:
    """Normalize an arbitrary DataFrame into the engine's media schema."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        bytes_col.cast("binary").alias("payload"),
        F.lit(media_type).alias("media_type"),
        F.lit(fmt).alias("format"),
        F.length(bytes_col.cast("binary")).cast("long").alias("n_bytes"),
    )


BYTE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("first_byte", LongType()),
        StructField("last_byte", LongType()),
        StructField("byte_sum_mod", LongType()),
    ]
)


def byte_features(df: DataFrame, batch_size: int | None = None) -> DataFrame:
    """Deterministic fake feature extraction over the payload bytes.

    Real Arrow-batched mapInPandas plumbing: batches arrive as pandas
    DataFrames, features are computed vectorized-ish per batch, output
    schema is declared up front. Swap the body for a real decoder
    (PIL.Image.open etc.) when codecs are available."""

    import numpy as np

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n_bytes = np.empty(len(pdf), dtype=np.int64)
            first = np.empty(len(pdf), dtype=np.int64)
            last = np.empty(len(pdf), dtype=np.int64)
            sum_mod = np.empty(len(pdf), dtype=np.int64)
            # Per-row loop, but all per-BYTE work is vectorized numpy over
            # a zero-copy uint8 view — with MB-scale media payloads the
            # byte axis is where the time goes, not the row axis.
            for i, b in enumerate(payloads):
                if not b:
                    n_bytes[i], first[i], last[i], sum_mod[i] = 0, -1, -1, 0
                    continue
                a = np.frombuffer(b, dtype=np.uint8)
                n_bytes[i] = a.size
                first[i] = a[0]
                last[i] = a[-1]
                sum_mod[i] = int(a.sum(dtype=np.int64)) % 1_000_000_007
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": n_bytes,
                    "first_byte": first,
                    "last_byte": last,
                    "byte_sum_mod": sum_mod,
                }
            )

    return df.mapInPandas(extract, schema=BYTE_FEATURES_SCHEMA)


IMAGE_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_channels", LongType()),
        StructField("mean_pixel", DoubleType()),
    ]
)


def decode_images(df: DataFrame) -> DataFrame:
    """REAL image decode: payload bytes -> (dims, channels, mean pixel).

    PNG/BMP decode with the stdlib kernels (``functions/codecs.py``);
    other formats go through PIL when installed. A payload outside the
    available codecs raises ``UnsupportedMediaError`` at execution with
    the reason — the honest behavior for an engine asked to decode a
    format it cannot."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..functions.codecs import decode_image_bytes

        for pdf in batches:
            w = np.empty(len(pdf), dtype=np.int64)
            h = np.empty(len(pdf), dtype=np.int64)
            ch = np.empty(len(pdf), dtype=np.int64)
            mean = np.empty(len(pdf), dtype=np.float64)
            fmts = pdf["format"] if "format" in pdf else [None] * len(pdf)
            for i, (payload, fmt) in enumerate(zip(pdf["payload"], fmts)):
                arr = decode_image_bytes(bytes(payload), fmt)
                h[i], w[i] = arr.shape[0], arr.shape[1]
                ch[i] = 1 if arr.ndim == 2 else arr.shape[2]
                mean[i] = float(arr.mean(dtype=np.float64))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": w,
                    "height": h,
                    "n_channels": ch,
                    "mean_pixel": mean,
                }
            )

    return df.mapInPandas(decode, schema=IMAGE_FEATURES_SCHEMA)


AHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("ahash", LongType()),
    ]
)


def image_ahash(df: DataFrame) -> DataFrame:
    """Perceptual average-hash over decoded pixels — the image twin of
    text fingerprinting, and the blocking key for image dedup: bit p is
    set iff pixel p's luminance exceeds the image mean. Both sides of
    that comparison are INTEGER (channel sum per pixel vs cross-
    multiplied total: ``lum_p * n_pixels > total_lum``), so the hash is
    a pure function of the decoded pixel values — any decode slip flips
    bits and fails the oracle. Classic aHash downsamples to 8x8 first;
    for payloads at or under 64 pixels the hash covers every pixel (the
    synthetic gate images are 4x4 -> a 16-bit hash).

    Identical images collide exactly, near-identical images land within
    a small Hamming radius; downstream exact dedup is a groupBy on the
    hash (the exact_dedup shape), near-dup is the SimHash pigeonhole
    block join — both established scale paths.
    """

    def hsh(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..functions.codecs import decode_image_bytes

        for pdf in batches:
            out = np.empty(len(pdf), dtype=np.int64)
            fmts = pdf["format"] if "format" in pdf else [None] * len(pdf)
            for i, (payload, fmt) in enumerate(zip(pdf["payload"], fmts)):
                arr = decode_image_bytes(bytes(payload), fmt)
                if arr.ndim == 2:
                    lum = arr.astype(np.int64)
                else:
                    lum = arr.astype(np.int64).sum(axis=2)
                flat = lum.reshape(-1)
                if flat.size > 64:  # classic aHash grid for big images
                    hh, ww = lum.shape
                    ys = (np.arange(8) * hh) // 8
                    xs = (np.arange(8) * ww) // 8
                    flat = lum[np.ix_(ys, xs)].reshape(-1)
                bits = flat * flat.size > flat.sum()
                out[i] = int(
                    np.bitwise_or.reduce(
                        (bits.astype(np.int64) << np.arange(flat.size))
                    )
                )
            yield pd.DataFrame({"media_id": pdf["media_id"], "ahash": out})

    return df.mapInPandas(hsh, schema=AHASH_SCHEMA)


def resize_images(df: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """REAL image resize: decode (stdlib/PIL) -> nearest-neighbor sample
    -> re-encode as PNG. Output keeps the media schema; ``format``
    becomes ``png`` (the engine's canonical re-encode target since the
    stdlib encoder is always available). Nearest-neighbor is the
    pipeline-standard cheap kernel; swap the index step for an area/
    bilinear kernel where quality matters."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..functions.codecs import decode_image_bytes, png_encode

        for pdf in batches:
            payloads = []
            for payload, fmt in zip(pdf["payload"], pdf["format"]):
                arr = decode_image_bytes(bytes(payload), fmt)
                if arr.ndim == 2:
                    arr = arr[:, :, None]
                ys = (np.arange(height) * arr.shape[0] // height).clip(
                    0, arr.shape[0] - 1
                )
                xs = (np.arange(width) * arr.shape[1] // width).clip(
                    0, arr.shape[1] - 1
                )
                payloads.append(png_encode(arr[np.ix_(ys, xs)]))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": payloads,
                    "media_type": pdf["media_type"],
                    "format": "png",
                    "n_bytes": [len(b) for b in payloads],
                }
            )

    return df.mapInPandas(resize, schema=MEDIA_SCHEMA)


AUDIO_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("sample_rate", LongType()),
        StructField("n_channels", LongType()),
        StructField("n_frames", LongType()),
        StructField("duration_s", DoubleType()),
        StructField("rms", DoubleType()),
        StructField("zero_crossings", LongType()),
    ]
)


def audio_features(df: DataFrame) -> DataFrame:
    """REAL audio decode: PCM WAV payloads -> rate/frames/duration/RMS/
    zero-crossing count (stdlib ``wave`` parser, numpy kernels)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..functions.codecs import wav_decode

        for pdf in batches:
            rate = np.empty(len(pdf), dtype=np.int64)
            n_ch = np.empty(len(pdf), dtype=np.int64)
            n_fr = np.empty(len(pdf), dtype=np.int64)
            dur = np.empty(len(pdf), dtype=np.float64)
            rms = np.empty(len(pdf), dtype=np.float64)
            zc = np.empty(len(pdf), dtype=np.int64)
            for i, payload in enumerate(pdf["payload"]):
                x, sr = wav_decode(bytes(payload))
                mono = x.mean(axis=1)
                rate[i], n_ch[i], n_fr[i] = sr, x.shape[1], x.shape[0]
                dur[i] = x.shape[0] / sr
                rms[i] = float(np.sqrt(np.mean(mono * mono))) if len(mono) else 0.0
                zc[i] = int(np.count_nonzero(np.signbit(mono[1:]) != np.signbit(mono[:-1])))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "sample_rate": rate,
                    "n_channels": n_ch,
                    "n_frames": n_fr,
                    "duration_s": dur,
                    "rms": rms,
                    "zero_crossings": zc,
                }
            )

    return df.mapInPandas(extract, schema=AUDIO_FEATURES_SCHEMA)


def decode_stub(df: DataFrame) -> DataFrame:
    """Backwards-compatible name for the pre-round-4 stub: now the REAL
    decoder (see decode_images)."""
    return decode_images(df)


FRAME_SAMPLE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("n_frames", LongType()),
        StructField("height", LongType()),
        StructField("width", LongType()),
        StructField("mean_pixel", DoubleType()),
    ]
)


def frame_sample(df: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL frame sampling over multi-frame media (round 6): decode the
    container, keep every ``every_n``-th frame, emit one row per kept
    frame with its stats — the training-pipeline shape that turns video
    into a frame dataset. The executed format is GIF (the engine's
    stdlib multi-frame codec, functions/codecs.py — real LZW
    decompression inside the Arrow batch); true video containers
    (mp4/webm) still require ffmpeg/PyAV and keep the documented raise
    (frame_sample_stub). Map-only: no shuffle, frames never leave their
    batch un-aggregated."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..functions.codecs import UnsupportedMediaError, gif_decode

        for pdf in batches:
            rows = []
            for mid, payload, fmt in zip(
                pdf["media_id"], pdf["payload"], pdf["format"]
            ):
                if fmt != "gif":
                    raise UnsupportedMediaError(
                        f"frame_sample decodes gif; {fmt!r} needs "
                        "ffmpeg/PyAV (frame_sample_stub)"
                    )
                frames = gif_decode(bytes(payload))
                n = frames.shape[0]
                for idx in range(0, n, every_n):
                    f = frames[idx]
                    rows.append(
                        (
                            int(mid),
                            idx,
                            n,
                            f.shape[0],
                            f.shape[1],
                            float(np.float64(f.sum()) / f.size),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "frame_idx", "n_frames",
                    "height", "width", "mean_pixel",
                ],
            )

    return df.mapInPandas(sample, schema=FRAME_SAMPLE_SCHEMA)


def frame_sample_stub(df: DataFrame, every_n: int = 30) -> DataFrame:
    """TRUE-video frame sampling — still a stub for mp4/webm (no
    ffmpeg/PyAV in this environment; those bitstreams are not feasibly
    parsed with the stdlib). Multi-frame sampling IS real for the GIF
    container — use :func:`frame_sample`. The plan (schema, Arrow
    batching) here is real; the kernel raises at execution with the
    reason."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        try:
            import av  # noqa: F401  (PyAV, not installed here)
        except ImportError:
            raise NotImplementedError(
                "video frame sampling requires ffmpeg/PyAV, not present in "
                "this environment"
            ) from None
        raise NotImplementedError(
            "PyAV present but the frame-sampling kernel is not wired; "
            "extend frame_sample_stub"
        )
        yield  # pragma: no cover

    return df.mapInPandas(sample, schema=MEDIA_SCHEMA)


def resize_stub(df: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Backwards-compatible name for the pre-round-4 stub: now the REAL
    nearest-neighbor resize (see resize_images)."""
    return resize_images(df, width=width, height=height)


SILENCE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_windows", LongType()),
        StructField("n_silent", LongType()),
        StructField("min_win_abs", LongType()),
        StructField("max_win_abs", LongType()),
    ]
)


def audio_silence(
    df: DataFrame, window: int = 16, threshold: int = 14_000
) -> DataFrame:
    """Silence-segment detection over REAL PCM decode — the trim/VAD
    primitive an audio-training pipeline runs before segmentation: the
    track is cut into fixed ``window``-sample frames and a frame whose
    INTEGER absolute-amplitude sum (raw PCM16 units — the decoder's
    [-1,1] floats are exact dyadic rationals, so round(x*32768)
    recovers the samples losslessly) is below ``threshold`` counts as
    silent. Everything reported is an integer, so the whole analysis is
    value-hashable — no float energy thresholds to drift cross-engine.
    Arrow-batched like every media kernel; a trailing partial window is
    dropped (standard frame semantics)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from ..functions.codecs import wav_decode

        for pdf in batches:
            n_w = np.empty(len(pdf), dtype=np.int64)
            n_s = np.empty(len(pdf), dtype=np.int64)
            lo = np.empty(len(pdf), dtype=np.int64)
            hi = np.empty(len(pdf), dtype=np.int64)
            for i, payload in enumerate(pdf["payload"]):
                x, _ = wav_decode(bytes(payload))
                raw = np.round(x[:, 0] * 32768.0).astype(np.int64)
                k = len(raw) // window
                sums = (
                    np.abs(raw[: k * window]).reshape(k, window).sum(axis=1)
                    if k
                    else np.zeros(0, dtype=np.int64)
                )
                n_w[i] = k
                n_s[i] = int((sums < threshold).sum())
                lo[i] = int(sums.min()) if k else 0
                hi[i] = int(sums.max()) if k else 0
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_windows": n_w,
                    "n_silent": n_s,
                    "min_win_abs": lo,
                    "max_win_abs": hi,
                }
            )

    return df.mapInPandas(extract, schema=SILENCE_SCHEMA)
