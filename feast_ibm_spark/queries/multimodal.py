"""Split from the round-4 queries.py monolith; see queries/__init__.py."""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403

from ..operators.spread import spread_for_udf  # noqa: E402

# North-star: multimodal columns (binary payload + Arrow-batched Pandas UDF)
# --------------------------------------------------------------------------


def q_multimodal_byte_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real mapInPandas plumbing over binary payloads; the payload here is
    the utf-8 encoding of the document text (the container has no media
    codecs — see operators/multimodal.py). Because the corpus is pure
    ASCII, byte statistics == codepoint statistics, which the DuckDB
    oracle computes from the text directly."""
    from ..operators.multimodal import attach_media_columns, byte_features

    docs = _t(spark, sf_dir, "documents")
    media = attach_media_columns(
        docs, "doc_id", F.encode(F.col("text"), "utf-8"), "image", "raw"
    )
    return byte_features(media)


ORACLE_MULTIMODAL = """
SELECT doc_id AS media_id,
  CAST(length(text) AS BIGINT) AS n_bytes,
  CAST(unicode(text[1:1]) AS BIGINT) AS first_byte,
  CAST(unicode(text[length(text):length(text)]) AS BIGINT) AS last_byte,
  list_reduce(
    list_prepend(CAST(0 AS BIGINT),
      list_transform(range(1, length(text) + 1),
        i -> CAST(unicode(text[i:i]) AS BIGINT))),
    (acc, x) -> (acc + x) % 1000000007
  ) AS byte_sum_mod
FROM documents
"""

# Since round 4 the image/audio decode kernels are REAL (stdlib PNG/BMP +
# PCM WAV, functions/codecs.py). These two queries pin them with full
# value-hash oracles by CONSTRUCTION: the payload pixels/samples are a
# pure function of doc_id, so DuckDB computes the expected statistics
# from arithmetic alone, never seeing a codec — the Spark side only hash-
# matches if encode -> decode round-trips the exact pixel/sample values.
# Float safety: every aggregated quantity is an exactly-representable
# dyadic rational whose sum stays below 2^53 (pixel sum < 48*255; sample
# squares are integers/2^30 summing < 2^28), so the totals are
# order-independent-exact in float64 and the single final division/sqrt
# is IEEE-identical on both engines — the hash compare is bit-safe.

IMG_H, IMG_W = 4, 4  # 48 RGB bytes per synthetic image


def q_multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode at the gate: synthesize a 4x4 RGB image per doc
    (pixel[i] = (doc_id*31 + i*7) % 256), PNG-encode it in one Arrow
    stage (stdlib encoder), then run the real decode_images kernel (chunk
    walk, inflate, unfilter) and report dims/channels/mean."""
    from pyspark.sql.functions import pandas_udf

    from ..operators.multimodal import attach_media_columns, decode_images

    @pandas_udf("binary")
    def synth_png(ids):  # no hints: queries.py stringizes annotations
        import numpy as np
        import pandas as pd

        from feast_ibm_spark.functions.codecs import png_encode

        out = []
        for did in ids:
            px = (int(did) * 31 + np.arange(IMG_H * IMG_W * 3) * 7) % 256
            out.append(png_encode(px.astype(np.uint8).reshape(IMG_H, IMG_W, 3)))
        return pd.Series(out)

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = attach_media_columns(
        docs, "doc_id", synth_png(F.col("doc_id")), "image", "png"
    )
    return decode_images(media)


ORACLE_MULTIMODAL_DECODE = f"""
SELECT d.doc_id AS media_id,
       CAST({IMG_W} AS BIGINT) AS width,
       CAST({IMG_H} AS BIGINT) AS height,
       CAST(3 AS BIGINT) AS n_channels,
       CAST(SUM((d.doc_id * 31 + t.i * 7) % 256) AS DOUBLE)
         / {IMG_H * IMG_W * 3} AS mean_pixel
FROM documents d CROSS JOIN range(0, {IMG_H * IMG_W * 3}) t(i)
GROUP BY d.doc_id
"""

AUDIO_N, AUDIO_SR = 64, 8000


def q_multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode at the gate: synthesize 64 PCM16 samples per doc
    (sample[i] = ((doc_id*13 + i*17) % 4001) - 2000), WAV-encode with the
    stdlib writer, then run the real audio_features kernel (wave parser +
    numpy) for rate/frames/duration/RMS/zero-crossings."""
    from pyspark.sql.functions import pandas_udf

    from ..operators.multimodal import attach_media_columns, audio_features

    @pandas_udf("binary")
    def synth_wav(ids):  # no hints: queries.py stringizes annotations
        import numpy as np
        import pandas as pd

        from feast_ibm_spark.functions.codecs import wav_encode

        out = []
        for did in ids:
            v = ((int(did) * 13 + np.arange(AUDIO_N) * 17) % 4001) - 2000
            out.append(wav_encode(v.astype(np.int16), AUDIO_SR))
        return pd.Series(out)

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    media = attach_media_columns(
        docs, "doc_id", synth_wav(F.col("doc_id")), "audio", "wav"
    )
    return audio_features(media)


ORACLE_MULTIMODAL_AUDIO = f"""
WITH samples AS (
  SELECT d.doc_id, t.i,
         ((d.doc_id * 13 + t.i * 17) % 4001) - 2000 AS v
  FROM documents d CROSS JOIN range(0, {AUDIO_N}) t(i)
),
flags AS (
  SELECT doc_id, i, v,
         CASE WHEN (v < 0) != (lag(v) OVER (PARTITION BY doc_id ORDER BY i) < 0)
              THEN 1 ELSE 0 END AS zc
  FROM samples
)
SELECT doc_id AS media_id,
       CAST({AUDIO_SR} AS BIGINT) AS sample_rate,
       CAST(1 AS BIGINT) AS n_channels,
       CAST({AUDIO_N} AS BIGINT) AS n_frames,
       CAST({AUDIO_N} AS DOUBLE) / {AUDIO_SR} AS duration_s,
       sqrt(SUM((CAST(v AS DOUBLE) / 32768.0) * (CAST(v AS DOUBLE) / 32768.0))
            / {AUDIO_N}) AS rms,
       CAST(SUM(zc) AS BIGINT) AS zero_crossings
FROM flags
GROUP BY doc_id
"""

# --------------------------------------------------------------------------


def q_scan_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``binaryFile`` source — whole-file-as-row ingestion, the entry
    point for raw media at scale (each image/audio file becomes one
    binary row; Spark parallelizes over files and partition directories,
    no splitting). Here the corpus is materialized as one text file per
    document under ``doc_id=N/`` partition dirs, read back through the
    binaryFile source with partition discovery, and verified by content:
    byte length and SHA-256 of every file must match what DuckDB
    computes from the original text column (the text writer appends one
    LF per line, the only byte the file adds). At 100 TB the same plan
    shape reads object-store media buckets; content is NOT shuffled —
    the digest/length projection happens inside the scan stage."""
    import hashlib
    import os
    import tempfile

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    # materialize-once per sf_dir (the zorder/compaction caching pattern):
    # rewriting thousands of per-doc partition dirs on every invocation
    # is pure filesystem churn the repeated parity runs don't need
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    out_dir = os.path.join(tempfile.gettempdir(), f"fis_binfiles_{tag}")
    if not os.path.exists(os.path.join(out_dir, "_WRITTEN")):
        docs.repartition(8).write.mode("overwrite").partitionBy(
            "doc_id"
        ).text(out_dir)
        open(os.path.join(out_dir, "_WRITTEN"), "w").close()
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.txt")
        .load(out_dir)
    )
    return files.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.length(F.col("content")).cast("bigint").alias("n_bytes"),
        F.sha2(F.col("content"), 256).alias("sha256"),
    )


ORACLE_SCAN_BINARY = """
SELECT doc_id,
       CAST(strlen(text) + 1 AS BIGINT) AS n_bytes,
       sha256(text || chr(10)) AS sha256
FROM documents
"""
# strlen (BYTES), not length (characters): the Spark side measures
# F.length on BINARY content, i.e. octets — length(text) would silently
# disagree on any multi-byte UTF-8 document (round-6 review fix;
# current corpora are ASCII so both passed, but the invariant must be
# data-independent)


RESIZE_W, RESIZE_H = 2, 2


def q_multimodal_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full image transform chain, REAL at every step: synthesize a
    4x4 RGB image per doc (pixel[i] = (doc_id*31 + i*7) % 256), PNG-
    encode (stdlib), nearest-neighbor resize to 2x2 with a re-encode
    (operators/multimodal.resize_images), then decode the RESIZED bytes
    and report dims/mean. Nearest-neighbor at 4->2 samples rows {0,2} x
    cols {0,2}, so the arithmetic oracle sums the pixel formula over
    exactly those 12 flat indices — any slip anywhere in the
    encode/unfilter/index/re-encode chain shifts the mean and fails the
    value hash. All three Arrow stages are mapInPandas/pandas_udf; no
    pixel ever crosses an executor boundary un-batched."""
    from pyspark.sql.functions import pandas_udf

    from ..operators.multimodal import (
        attach_media_columns,
        decode_images,
        resize_images,
    )

    @pandas_udf("binary")
    def synth_png(ids):  # no hints: queries.py stringizes annotations
        import numpy as np
        import pandas as pd

        from feast_ibm_spark.functions.codecs import png_encode

        out = []
        for did in ids:
            px = (int(did) * 31 + np.arange(IMG_H * IMG_W * 3) * 7) % 256
            out.append(png_encode(px.astype(np.uint8).reshape(IMG_H, IMG_W, 3)))
        return pd.Series(out)

    # spread the heavy Arrow codec kernel off the one-split corpus file
    # (operators/spread.py; measured: frame_sample 9.4 -> 1.9 s at
    # sf0.1). The CHEAP kernels (byte stats, 4x4 PNG decode, 64-sample
    # PCM) deliberately stay unspread: 32 near-empty Arrow tasks cost
    # more than their single-task run (same finding as the knn spread
    # A/B).
    docs = spread_for_udf(
        _t(spark, sf_dir, "documents"), "doc_id"
    ).select("doc_id")
    media = attach_media_columns(
        docs, "doc_id", synth_png(F.col("doc_id")), "image", "png"
    )
    return decode_images(resize_images(media, RESIZE_W, RESIZE_H))


# the 12 flat pixel indices NN 4->2 samples: (y*4+x)*3+c, y,x in {0,2}
ORACLE_MULTIMODAL_RESIZE = f"""
SELECT d.doc_id AS media_id,
       CAST({RESIZE_W} AS BIGINT) AS width,
       CAST({RESIZE_H} AS BIGINT) AS height,
       CAST(3 AS BIGINT) AS n_channels,
       CAST(SUM((d.doc_id * 31 + ((y.y * {IMG_W} + x.x) * 3 + c.c) * 7) % 256)
            AS DOUBLE) / {RESIZE_W * RESIZE_H * 3} AS mean_pixel
FROM documents d
CROSS JOIN (VALUES (0), (2)) y(y)
CROSS JOIN (VALUES (0), (2)) x(x)
CROSS JOIN range(0, 3) c(c)
GROUP BY d.doc_id
"""


GIF_FRAMES, GIF_EVERY_N = 6, 2


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL multi-frame media sampling at the gate: a 6-frame 4x4
    grayscale GIF is synthesized per doc (pixel[f][i] = (doc_id*31 +
    f*17 + i*7) % 256), LZW-compressed by the engine's stdlib GIF
    encoder, then the frame_sample kernel decodes the container inside
    the Arrow batch and keeps every 2nd frame (0, 2, 4) — one row per
    kept frame with its mean. The arithmetic oracle recomputes each
    kept frame's mean from the pixel formula, so any slip in the LZW
    round-trip, frame indexing, or sampling stride fails the value
    hash."""
    from pyspark.sql.functions import pandas_udf

    from ..operators.multimodal import attach_media_columns, frame_sample

    @pandas_udf("binary")
    def synth_gif(ids):  # no hints: queries.py stringizes annotations
        import numpy as np
        import pandas as pd

        from feast_ibm_spark.functions.codecs import gif_encode

        out = []
        npx = IMG_H * IMG_W
        for did in ids:
            frames = np.empty((GIF_FRAMES, IMG_H, IMG_W), dtype=np.uint8)
            for f in range(GIF_FRAMES):
                px = (int(did) * 31 + f * 17 + np.arange(npx) * 7) % 256
                frames[f] = px.astype(np.uint8).reshape(IMG_H, IMG_W)
            out.append(gif_encode(frames))
        return pd.Series(out)

    # spread the heavy Arrow codec kernel off the one-split corpus file
    # (operators/spread.py; measured: frame_sample 9.4 -> 1.9 s at
    # sf0.1). The CHEAP kernels (byte stats, 4x4 PNG decode, 64-sample
    # PCM) deliberately stay unspread: 32 near-empty Arrow tasks cost
    # more than their single-task run (same finding as the knn spread
    # A/B).
    docs = spread_for_udf(
        _t(spark, sf_dir, "documents"), "doc_id"
    ).select("doc_id")
    media = attach_media_columns(
        docs, "doc_id", synth_gif(F.col("doc_id")), "video", "gif"
    )
    return frame_sample(media, every_n=GIF_EVERY_N)


ORACLE_FRAME_SAMPLE = f"""
SELECT d.doc_id AS media_id,
       f.f AS frame_idx,
       CAST({GIF_FRAMES} AS BIGINT) AS n_frames,
       CAST({IMG_H} AS BIGINT) AS height,
       CAST({IMG_W} AS BIGINT) AS width,
       CAST(SUM((d.doc_id * 31 + f.f * 17 + t.i * 7) % 256) AS DOUBLE)
         / {IMG_H * IMG_W} AS mean_pixel
FROM documents d
CROSS JOIN range(0, {GIF_FRAMES}) f(f)
CROSS JOIN range(0, {IMG_H * IMG_W}) t(i)
WHERE f.f % {GIF_EVERY_N} = 0
GROUP BY d.doc_id, f.f
"""


def q_multimodal_image_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image dedup through a REAL perceptual hash: the same synthetic 4x4
    PNGs as multimodal_decode_stats are decoded and average-hashed
    (operators/multimodal.image_ahash — integer luminance-vs-mean bits),
    then deduplicated with the exact_dedup shape: groupBy(ahash), min-id
    canonical, dup counts joined back per image. The synthetic pixel
    recipe repeats every 256 doc_ids (31 is invertible mod 256), so the
    gate corpus contains REAL duplicate images across documents and the
    groups are non-trivial. Oracle recomputes the hash from pixel
    arithmetic alone — decode, luminance, threshold, bit packing, and
    grouping all pinned by the value hash."""
    from pyspark.sql.functions import pandas_udf

    from ..operators.multimodal import attach_media_columns, image_ahash

    @pandas_udf("binary")
    def synth_png(ids):  # no hints: queries.py stringizes annotations
        import numpy as np
        import pandas as pd

        from feast_ibm_spark.functions.codecs import png_encode

        out = []
        for did in ids:
            px = (int(did) * 31 + np.arange(IMG_H * IMG_W * 3) * 7) % 256
            out.append(png_encode(px.astype(np.uint8).reshape(IMG_H, IMG_W, 3)))
        return pd.Series(out)

    # spread the heavy Arrow codec kernel off the one-split corpus file
    # (operators/spread.py; measured: frame_sample 9.4 -> 1.9 s at
    # sf0.1). The CHEAP kernels (byte stats, 4x4 PNG decode, 64-sample
    # PCM) deliberately stay unspread: 32 near-empty Arrow tasks cost
    # more than their single-task run (same finding as the knn spread
    # A/B).
    docs = spread_for_udf(
        _t(spark, sf_dir, "documents"), "doc_id"
    ).select("doc_id")
    media = attach_media_columns(
        docs, "doc_id", synth_png(F.col("doc_id")), "image", "png"
    )
    hashes = image_ahash(media).select(
        F.col("media_id").alias("doc_id"), "ahash"
    )
    groups = hashes.groupBy("ahash").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("dup_count"),
    )
    return hashes.join(groups, "ahash").select(
        "doc_id", "ahash", "canonical_id", "dup_count"
    )


ORACLE_IMAGE_DEDUP = f"""
WITH lum AS (
  SELECT d.doc_id, p.p,
         ((d.doc_id * 31 + (3 * p.p + 0) * 7) % 256
        + (d.doc_id * 31 + (3 * p.p + 1) * 7) % 256
        + (d.doc_id * 31 + (3 * p.p + 2) * 7) % 256) AS l
  FROM documents d CROSS JOIN range(0, {IMG_H * IMG_W}) p(p)
),
tot AS (SELECT doc_id, SUM(l) AS t FROM lum GROUP BY doc_id),
h AS (
  SELECT lum.doc_id,
         CAST(SUM(CASE WHEN lum.l * {IMG_H * IMG_W} > tot.t
                  THEN (CAST(1 AS BIGINT) << lum.p) ELSE 0 END) AS BIGINT)
           AS ahash
  FROM lum JOIN tot USING (doc_id) GROUP BY lum.doc_id
),
g AS (
  SELECT ahash, MIN(doc_id) AS canonical_id, COUNT(*) AS dup_count
  FROM h GROUP BY ahash
)
SELECT h.doc_id, h.ahash, g.canonical_id, g.dup_count
FROM h JOIN g USING (ahash)
"""


SIL_WINDOW, SIL_THRESHOLD = 16, 14_000


def q_multimodal_audio_silence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Silence-segment detection through the REAL WAV path: the same
    synthetic PCM16 tracks as multimodal_audio_stats are decoded and cut
    into 16-sample windows; a window whose integer absolute-amplitude
    sum is under the threshold counts as silent
    (operators/multimodal.audio_silence — the trim/VAD primitive).
    Every reported quantity is an integer, so the oracle reproduces the
    whole analysis from sample arithmetic alone — encode, decode,
    framing, abs-sum, and threshold all pinned by the value hash."""
    from pyspark.sql.functions import pandas_udf

    from ..operators.multimodal import attach_media_columns, audio_silence

    @pandas_udf("binary")
    def synth_wav(ids):  # no hints: queries.py stringizes annotations
        import numpy as np
        import pandas as pd

        from feast_ibm_spark.functions.codecs import wav_encode

        out = []
        for did in ids:
            v = ((int(did) * 13 + np.arange(AUDIO_N) * 17) % 4001) - 2000
            out.append(wav_encode(v.astype(np.int16), AUDIO_SR))
        return pd.Series(out)

    # spread the heavy Arrow codec kernel off the one-split corpus file
    # (operators/spread.py; measured: frame_sample 9.4 -> 1.9 s at
    # sf0.1). The CHEAP kernels (byte stats, 4x4 PNG decode, 64-sample
    # PCM) deliberately stay unspread: 32 near-empty Arrow tasks cost
    # more than their single-task run (same finding as the knn spread
    # A/B).
    docs = spread_for_udf(
        _t(spark, sf_dir, "documents"), "doc_id"
    ).select("doc_id")
    media = attach_media_columns(
        docs, "doc_id", synth_wav(F.col("doc_id")), "audio", "wav"
    )
    return audio_silence(media, window=SIL_WINDOW, threshold=SIL_THRESHOLD)


ORACLE_AUDIO_SILENCE = f"""
WITH samples AS (
  SELECT d.doc_id, t.i,
         abs(((d.doc_id * 13 + t.i * 17) % 4001) - 2000) AS a,
         t.i // {SIL_WINDOW} AS win
  FROM documents d CROSS JOIN range(0, {AUDIO_N}) t(i)
),
wins AS (
  SELECT doc_id, win, CAST(SUM(a) AS BIGINT) AS s
  FROM samples GROUP BY doc_id, win
)
SELECT doc_id AS media_id,
       COUNT(*) AS n_windows,
       CAST(SUM(CASE WHEN s < {SIL_THRESHOLD} THEN 1 ELSE 0 END) AS BIGINT)
         AS n_silent,
       MIN(s) AS min_win_abs,
       MAX(s) AS max_win_abs
FROM wins GROUP BY doc_id
"""
