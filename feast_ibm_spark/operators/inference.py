"""Batch model inference over embedding columns — the classifier-head
shape of a training-data pipeline (score every vector with a small
model, no GPU in the loop).

A linear probe (frozen-embedding classifier head) is a K x dim weight
matrix applied to every embedding: score(c) = sum_i W[c,i] * e[i],
pred = argmax_c. At 100 TB the right plan is pure JVM expressions — the
weight matrix rides INSIDE the plan (here derived from a deterministic
integer formula; in production a broadcast literal), each vector is
scored map-side in one pass, and no Python touches the hot path.

Cross-engine exactness: the score is a strict left-to-right ordered fold
over ascending dimensions (the ``cosine_topk`` discipline), and the
weights are exact integer arithmetic scaled by one double division, so
Spark and DuckDB produce bit-identical doubles; argmax ties break on
ascending class id in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# deterministic pseudo-weights: integer lattice in [-0.5, 0.5), exactly
# reproducible in any engine: w(c, i) = (((c*1009 + i*9176) % 1000) - 500) / 1000
_W = "(CAST((((c * 1009 + i * 9176) % 1000) - 500) AS DOUBLE) / 1000.0)"
_SCORE = (
    "aggregate(sequence(1, {dim}), CAST(0 AS DOUBLE),"
    " (acc, i) -> acc + " + _W + " * CAST(embedding[i - 1] AS DOUBLE))"
)


def linear_probe(
    df: DataFrame,
    n_classes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Score every embedding against the K-class head and keep the
    argmax: (id, label, pred, score, is_correct). One map-side pass —
    the class explode is a width-K expand, not a shuffle; the only
    exchange is the rn=1 window keyed by the vector id."""
    scored = df.select(
        F.col(id_col),
        F.col(label_col),
        F.explode(F.sequence(F.lit(0), F.lit(n_classes - 1))).alias("c"),
        "embedding",
    ).select(
        F.col(id_col),
        F.col(label_col),
        "c",
        F.expr(_SCORE.format(dim=dim)).alias("score"),
    )
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), "c")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col(id_col),
            F.col(label_col),
            F.col("c").cast("bigint").alias("pred"),
            "score",
            (F.col("c") == F.col(label_col)).cast("bigint").alias("is_correct"),
        )
    )
