"""Multimodal column handling (north-star extension).

Images/audio/video are carried as opaque ``binary`` columns plus a typed
metadata struct — the pattern that scales: payload bytes never pass
through Python row-at-a-time; they move in Arrow record batches into
Pandas UDFs (``mapInPandas``) only for the stages that genuinely need a
codec.

The actual media codecs (PIL/ffmpeg/torchaudio) are NOT available in this
container, so the decode kernels are STUBS: ``decode_stub`` raises
``NotImplementedError`` where a real codec would run, and
``byte_features`` is a deterministic fake "feature extractor" (byte
statistics) that exercises the full real plumbing — schema declaration,
Arrow batching, per-partition iteration, output schema binding.

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
    ]
)


def decode_stub(df: DataFrame) -> DataFrame:
    """Where a real image decode would run (PIL / torchvision).

    The container has no codec libraries, so this raises at *execution*
    time with a clear message; the plan (schema, batching) is fully
    formed, so swapping in a real decoder is a one-function change."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "media decode requires a codec library (PIL/ffmpeg) not present "
            "in this environment; use byte_features for codec-free stats"
        )
        yield  # pragma: no cover - makes this a generator

    return df.mapInPandas(decode, schema=IMAGE_FEATURES_SCHEMA)


def frame_sample_stub(df: DataFrame, every_n: int = 30) -> DataFrame:
    """Video frame sampling stub — same contract as decode_stub."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "video frame sampling requires ffmpeg, not present in this "
            "environment"
        )
        yield  # pragma: no cover

    return df.mapInPandas(sample, schema=MEDIA_SCHEMA)


def resize_stub(df: DataFrame, width: int = 224, height: int = 224) -> DataFrame:
    """Image resize stub — same contract as decode_stub: the plan (schema,
    Arrow batching, partition-preserving mapInPandas) is real; the kernel
    raises until a codec library (PIL/torchvision) is installed. Output
    keeps the media schema — payload would be the re-encoded bytes."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        raise NotImplementedError(
            "image resize requires a codec library (PIL), not present in "
            "this environment"
        )
        yield  # pragma: no cover

    return df.mapInPandas(resize, schema=MEDIA_SCHEMA)
