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


def triangle_counts(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over an undirected graph.

    The naive wedge join (all 2-paths through every node, then probe the
    closing edge) does sum(deg(v)^2) work — quadratic in the hottest
    node's degree, which is exactly what a power-law co-purchase or
    follower graph has. This uses the standard degree-ordered
    orientation instead: each undirected edge is directed from its
    lower-(degree, id) endpoint to the higher one, every triangle then
    has exactly ONE node with out-edges to the other two, and wedges are
    built only from ORIENTED out-neighbor pairs. Out-degree under this
    orientation is bounded by O(sqrt(E)) regardless of skew, so the
    wedge stage does O(E^1.5) total work and — the part that matters on
    a cluster — no single node's partition blows up: the hub with a
    million followers contributes ~zero wedges because all its edges
    point INTO it.

    Plan shape: two shuffles to canonicalize + compute degrees, one
    self-join on wedge apex (equi-join, balanced by the sqrt(E) bound),
    one equi-join probing the closing edge, one explode + hash aggregate.
    All built-in ops, no UDFs.

    Output: (node, n_triangles) for nodes in >=1 triangle.
    """
    # canonical undirected edge set: (a < b), self-loops dropped
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionByName(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    ranked = e.join(da, "a").join(db, "b")
    lo_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    # oriented edge (u -> v): u is the lower-(deg, id) endpoint; carry
    # v's rank key so wedge pairs can be ordered without a re-join
    o = ranked.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(
            lo_first,
            F.struct(F.col("deg_b").alias("d"), F.col("b").alias("n")),
        )
        .otherwise(
            F.struct(F.col("deg_a").alias("d"), F.col("a").alias("n"))
        )
        .alias("kv"),
    )
    o1, o2 = o.alias("o1"), o.alias("o2")
    wedges = o1.join(
        o2,
        (F.col("o1.u") == F.col("o2.u")) & (F.col("o1.kv") < F.col("o2.kv")),
    ).select(
        F.col("o1.u").alias("x"),
        F.col("o1.v").alias("y"),
        F.col("o2.v").alias("z"),
    )
    # closing edge: y -> z is oriented exactly this way because
    # kv(y) < kv(z) (wedge order) matches the orientation rule
    closing = o.select(F.col("u").alias("y"), F.col("v").alias("z"))
    tris = wedges.join(closing, ["y", "z"])
    members = tris.select(
        F.explode(F.array(F.col("x"), F.col("y"), F.col("z"))).alias("node")
    )
    return members.groupBy("node").agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
