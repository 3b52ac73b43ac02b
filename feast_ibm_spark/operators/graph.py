"""Graph algorithms beyond connected components (north-star extension;
no reference counterpart).

``pagerank_fixed_point`` is PageRank made ENGINE-EXACT: the standard
float formulation is hash-hostile (order-dependent float sums, pow ulps),
so scores are kept as scaled integers and every per-edge contribution is
an exact integer floor division computed ONCE per source node —
``c_j = (d_num * s_j) div (d_den * deg_j)`` — making each iteration a
pure integer aggregate: deterministic, order-independent, and
reproducible in any SQL engine (the same recipe that makes the
time-decay features hashable). The fixed iteration count unrolls into
the plan — each iteration is one join + one aggregate on the edge list,
the classic message-passing shape that scales as O(E) per round.

At 100 TB: the edge list shuffles on destination once per round;
iterations reuse the same partitioning (AQE), and score state is one row
per node. For billion-node graphs swap the unrolled loop for the same
body inside an iterative driver loop with lineage checkpointing every
few rounds (see dedup.dedup_clusters for the measured pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 1_000_000  # score fixed-point scale (micro-units)
PR_D_NUM, PR_D_DEN = 85, 100  # damping 0.85 as an exact rational


def pagerank_fixed_point(
    edges: DataFrame,
    iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-point PageRank over a directed edge list.

    Nodes are every id appearing as src or dst. Scores start at
    ``PR_SCALE`` and update for ``iterations`` rounds with

        s'(v) = floor(15 * PR_SCALE / 100)
              + sum over in-edges (u, v) of floor(85 * s(u) / (100 * deg_out(u)))

    — all integer, so the result is a pure function of the edge set.
    Dangling nodes (no out-edges) simply leak their damped mass, the
    standard simplification; teleport keeps every score positive.
    Output: (node, score_scaled) with score in PR_SCALE units.
    """
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .unionByName(edges.select(F.col(dst_col).alias("node")))
        .distinct()
    )
    deg = edges.groupBy(F.col(src_col).alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    scores = nodes.withColumn("score", F.lit(PR_SCALE).cast("bigint"))
    base = F.lit((15 * PR_SCALE) // 100).cast("bigint")

    for _ in range(iterations):
        contrib = (
            edges.join(scores, edges[src_col] == scores["node"])
            .join(deg, scores["node"] == deg["node"])
            .select(
                F.col(dst_col).alias("node"),
                # integer `div`, NOT float `/` + cast: float division
                # loses exactness past 2^53, which a billion-node score
                # mass exceeds — `div` floors in pure integer arithmetic
                F.expr(
                    f"({PR_D_NUM} * score) div ({PR_D_DEN} * deg)"
                ).alias("c"),
            )
        )
        scores = (
            nodes.join(
                contrib.groupBy("node").agg(F.sum("c").alias("in_mass")),
                "node",
                "left",
            )
            .select(
                "node",
                (base + F.coalesce(F.col("in_mass"), F.lit(0)))
                .cast("bigint")
                .alias("score"),
            )
        )
    return scores.select(F.col("node"), F.col("score").alias("score_scaled"))
