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

# Frontier/visited sets up to this many rows are broadcast in the
# iterative operators' per-round joins (sizes are exact — the rounds
# checkpoint and count their frontiers anyway). 4M bigint node ids ~=
# a few tens of MB framed: comfortably inside executor broadcast budgets
# on any cluster tier, far under the 8 GB broadcast cap, and past it the
# shuffle join is the right plan regardless of this constant.
BFS_BROADCAST_MAX_ROWS = 4_000_000


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


def pagerank_iteration_scores(
    edges: DataFrame,
    iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Per-iteration PageRank state: (node, iter, score) for iter in
    1..``iterations`` under the same exact integer recurrence as
    :func:`pagerank_fixed_point` (iteration ``iterations`` equals its
    output). This is the materialized state :func:`pagerank_incremental`
    consumes — an incremental refresh needs every intermediate round, not
    just the final scores, because round k of the update reads round k-1
    of the base for all unchanged in-neighbors."""
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
    snaps = []
    for k in range(1, iterations + 1):
        contrib = (
            edges.join(scores, edges[src_col] == scores["node"])
            .join(deg, scores["node"] == deg["node"])
            .select(
                F.col(dst_col).alias("node"),
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
        snaps.append(scores.withColumn("iter", F.lit(k)))
    out = snaps[0]
    for s in snaps[1:]:
        out = out.unionByName(s)
    return out.select("node", "iter", "score")


def pagerank_incremental(
    base_edges: DataFrame,
    delta_edges: DataFrame,
    base_scores: DataFrame,
    iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Delta-edge PageRank refresh — bit-identical to a full
    :func:`pagerank_fixed_point` run over ``base_edges UNION
    delta_edges``, computed by re-evaluating only the CHANGED frontier.

    Contract: ``delta_edges`` are NEW edges disjoint from ``base_edges``
    (both duplicate-free); ``base_scores`` is
    :func:`pagerank_iteration_scores` of the base graph.

    Why the frontier is sound: adding an out-edge to u changes deg(u),
    so u's per-edge contribution changes for ALL its out-neighbors —
    the constant seed set D = out-neighbors(sources of delta) in the
    UPDATED graph, plus every brand-new node. Scores then propagate one
    hop per round: changed_k = D ∪ new ∪ out(changed_{k-1}), a superset
    of the truly-changed set by induction, and recomputing a node whose
    inputs did not change reproduces its base value exactly (integer
    arithmetic — no float drift), so overshoot is harmless. Round k
    reads updated scores for changed_{k-1} in-neighbors and base round
    k-1 scores for the rest.

    At 100 TB this is the graph twin of the aggregate-IVM family: base
    edges + per-iteration scores are materialized state, deltas arrive
    from ingestion/CDC, and each refresh round aggregates only the
    in-edges of the frontier (left-semi pruned) instead of every edge —
    work proportional to the delta's 3-hop out-neighborhood, not |E|.
    A delta touching everything degrades gracefully to the full run.
    """
    # eager localCheckpoints throughout (the dedup_clusters pattern):
    # without them each of the 3 rounds re-embeds the full edge-build
    # subtree in ein / out-neighbor / degree branches and the unrolled
    # plan grows combinatorially — measured non-terminating at sf0.01
    delta_n = delta_edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).localCheckpoint(eager=True)
    if delta_n.isEmpty():
        # no-op refresh: the answer IS the stored final round (measured:
        # the frontier machinery costs ~8s of fixed checkpoint overhead
        # even on an empty delta — skip it)
        return base_scores.filter(F.col("iter") == iterations).select(
            "node", F.col("score").alias("score_scaled")
        )
    full = (
        base_edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .unionByName(delta_n)
        .localCheckpoint(eager=True)
    )
    delta_edges = delta_n
    nodes_f = (
        full.select(F.col("src").alias("node"))
        .unionByName(full.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg_f = full.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    base_nodes = base_scores.select("node").distinct()
    new_nodes = nodes_f.join(base_nodes, "node", "left_anti")
    # name-based USING joins throughout: `changed`/`frontier_seed` derive
    # from `full`, so attribute-reference joins trip Spark's ambiguous
    # self-join detection — renaming the key to the joined column instead
    # keeps every join unambiguous
    d_src = delta_edges.select("src").distinct()
    frontier_seed = (
        full.join(d_src, "src", "left_semi")
        .select(F.col("dst").alias("node"))
        .distinct()
        .unionByName(new_nodes)
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg_by_src = deg_f.withColumnRenamed("node", "src")

    base_tel = F.lit((15 * PR_SCALE) // 100).cast("bigint")
    changed = frontier_seed
    prev_changed = None
    prev_scores = None
    for k in range(1, iterations + 1):
        ein = full.join(
            changed.withColumnRenamed("node", "dst"), "dst", "left_semi"
        )
        if k == 1:
            # round 1 reads the uniform s_0 = PR_SCALE — no lookup needed
            contrib = ein.join(deg_by_src, "src").select(
                F.col("dst").alias("node"),
                F.expr(
                    f"({PR_D_NUM} * {PR_SCALE}L) div ({PR_D_DEN} * deg)"
                ).alias("c"),
            )
        else:
            bs = base_scores.filter(F.col("iter") == k - 1).select(
                "node", "score"
            )
            sstar = prev_scores.unionByName(
                bs.join(prev_changed, "node", "left_anti")
            ).withColumnRenamed("node", "src")
            contrib = (
                ein.join(sstar, "src")
                .join(deg_by_src, "src")
                .select(
                    F.col("dst").alias("node"),
                    F.expr(
                        f"({PR_D_NUM} * score) div ({PR_D_DEN} * deg)"
                    ).alias("c"),
                )
            )
        new_scores = (
            changed.join(
                contrib.groupBy("node").agg(F.sum("c").alias("in_mass")),
                "node",
                "left",
            )
            .select(
                "node",
                (base_tel + F.coalesce(F.col("in_mass"), F.lit(0)))
                .cast("bigint")
                .alias("score"),
            )
        )
        prev_changed, prev_scores = changed, new_scores.localCheckpoint(
            eager=True
        )
        if k < iterations:
            changed = (
                frontier_seed.unionByName(
                    full.join(
                        changed.withColumnRenamed("node", "src"),
                        "src",
                        "left_semi",
                    ).select(F.col("dst").alias("node"))
                )
                .distinct()
                .localCheckpoint(eager=True)
            )

    untouched = base_scores.filter(F.col("iter") == iterations).select(
        "node", "score"
    ).join(prev_changed, "node", "left_anti")
    return untouched.unionByName(prev_scores).select(
        "node", F.col("score").alias("score_scaled")
    )


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


def kcore_peel(
    edges: DataFrame,
    k: int,
    rounds: int,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Fixed-round k-core peel over an undirected graph: each round
    recomputes degrees and drops every node below ``k`` together with
    its edges — after enough rounds this is exactly the k-core (the
    maximal subgraph with all degrees >= k). The round count is FIXED
    and unrolled so the result is a pure function of (edge set, k,
    rounds), reproducible in any engine — the same determinism recipe
    as the fixed-iteration PageRank; a production run at unknown depth
    wraps the same body in a driver loop until no node drops (peel
    depth is bounded by the degeneracy ordering, usually tens of rounds
    even on web-scale graphs), with the lineage checkpointing used here.

    Each round is two grouped counts + two left-semi equi-joins — O(E)
    per round, shrinking monotonically, no shuffle amplification.

    Output: (node, core_deg) — degrees inside the surviving subgraph.
    """
    e = (
        edges.select(
            F.least(F.col(src_col), F.col(dst_col)).alias("a"),
            F.greatest(F.col(src_col), F.col(dst_col)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _deg(ed: DataFrame) -> DataFrame:
        return (
            ed.select(F.col("a").alias("node"))
            .unionByName(ed.select(F.col("b").alias("node")))
            .groupBy("node")
            .agg(F.count(F.lit(1)).alias("core_deg"))
        )

    for _ in range(rounds):
        keep = _deg(e).filter(F.col("core_deg") >= k).select("node")
        e = (
            e.join(keep.withColumnRenamed("node", "a"), "a", "left_semi")
            .join(keep.withColumnRenamed("node", "b"), "b", "left_semi")
            .localCheckpoint(eager=True)
        )
    return _deg(e)


def personalized_pagerank(
    edges: DataFrame,
    seeds: DataFrame,
    iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Personalized PageRank — the recommendation twin of
    :func:`pagerank_fixed_point`: teleport mass returns only to the
    ``seeds`` node set (one ``node`` column), so scores measure
    reachability FROM the seeds rather than global centrality ("parts
    most co-purchased with the promoted set", "accounts nearest the
    flagged cluster"). Same exact integer recurrence (init PR_SCALE on
    seeds / 0 elsewhere; per-round teleport only on seeds), same O(E)
    join + aggregate per round, so results are engine-exact and
    hash-stable. Nodes unreachable from the seeds finish at exactly 0
    and are kept (the caller's filter is one predicate)."""
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .unionByName(edges.select(F.col(dst_col).alias("node")))
        .distinct()
    )
    deg = edges.groupBy(F.col(src_col).alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    seed_flag = seeds.select("node").distinct().withColumn(
        "__seed", F.lit(1)
    )
    flagged = nodes.join(seed_flag, "node", "left").select(
        "node", F.coalesce(F.col("__seed"), F.lit(0)).alias("__seed")
    )
    tel = F.lit((15 * PR_SCALE) // 100).cast("bigint")
    scores = flagged.withColumn(
        "score",
        (F.col("__seed") * F.lit(PR_SCALE)).cast("bigint"),
    )
    for _ in range(iterations):
        contrib = (
            edges.join(scores, edges[src_col] == scores["node"])
            .join(deg, scores["node"] == deg["node"])
            .select(
                F.col(dst_col).alias("node"),
                F.expr(
                    f"({PR_D_NUM} * score) div ({PR_D_DEN} * deg)"
                ).alias("c"),
            )
        )
        scores = (
            flagged.join(
                contrib.groupBy("node").agg(F.sum("c").alias("in_mass")),
                "node",
                "left",
            )
            .select(
                "node",
                "__seed",
                (
                    F.col("__seed") * tel
                    + F.coalesce(F.col("in_mass"), F.lit(0))
                )
                .cast("bigint")
                .alias("score"),
            )
        )
    return scores.select("node", F.col("score").alias("score_scaled"))


def pagerank_fixed_point_weighted(
    edges: DataFrame,
    iterations: int = 3,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
) -> DataFrame:
    """Weighted PageRank, integer-exact: mass leaves each node in
    proportion to integer edge WEIGHTS instead of splitting evenly —

        c(u -> v) = (85 * s(u) * w_uv) div (100 * W_u),  W_u = sum w_u*

    so a part co-purchased with something 50 times pulls 50x the rank
    mass of a once-seen pairing. Same O(E)-per-round join + aggregate
    as the uniform operator; exact while 85 * max_score * max_weight
    stays under 2^63 (score mass is bounded by ~PR_SCALE * n_nodes, so
    this holds to billions of nodes for weights up to ~10^4 —
    renormalize weights first beyond that)."""
    nodes = (
        edges.select(F.col(src_col).alias("node"))
        .unionByName(edges.select(F.col(dst_col).alias("node")))
        .distinct()
    )
    wsum = edges.groupBy(F.col(src_col).alias("node")).agg(
        F.sum(F.col(weight_col)).alias("wtot")
    )
    scores = nodes.withColumn("score", F.lit(PR_SCALE).cast("bigint"))
    base = F.lit((15 * PR_SCALE) // 100).cast("bigint")
    for _ in range(iterations):
        contrib = (
            edges.join(scores, edges[src_col] == scores["node"])
            .join(wsum, scores["node"] == wsum["node"])
            .select(
                F.col(dst_col).alias("node"),
                F.expr(
                    f"({PR_D_NUM} * score * {weight_col})"
                    f" div ({PR_D_DEN} * wtot)"
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
    return scores.select("node", F.col("score").alias("score_scaled"))


def bfs_levels(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """Multi-source BFS hop levels: shortest unweighted hop distance
    from any node in ``sources`` (one ``node`` column), capped at
    ``max_hops`` — reachability rings ("everything within 3 hops of the
    flagged accounts", "parts co-purchased at distance <= 2 from a
    recalled part").

    Level-synchronous frontier expansion — the canonical distributed
    BFS: each round joins ONLY the current frontier (not the visited
    set) against the edge list, dedups the discovered nodes, and
    anti-joins the visited set so every node is labeled with its FIRST
    discovery round, which is exactly the shortest hop distance. Work
    per round is O(frontier-adjacent edges); total O(E * rounds) worst
    case, with the same ``localCheckpoint`` lineage discipline as
    :func:`kcore_peel` (an unrolled loop of joins otherwise compounds
    the plan tree). The per-round ``isEmpty`` early-exit is a bounded
    driver probe (at most ``max_hops`` of them, LIMIT-1-shaped).

    Determinism: the output is a pure function of (edge set, source
    set, max_hops) — no tie-breaks exist to get wrong, because BFS
    levels are unique. Hub fan-in is absorbed by the distinct()'s
    map-side partial aggregate (the pagerank-hub taxonomy row, not a
    whale). Sources outside the edge set are kept at level 0 (they are
    real query nodes); unreachable nodes are absent from the output.

    Output: (node, lvl) — BIGINT hop distance in [0, max_hops].
    """
    from pyspark.sql import Observation

    if max_hops < 0:
        raise ValueError(f"max_hops={max_hops}: need >= 0")
    # Frontier/visited sizes are KNOWN each round without their own job
    # (round 13): a count aggregate rides the eager checkpoint via
    # ``observe`` — Spark materializes the checkpoint through a SQL
    # action, so the CollectMetrics accumulator is harvested from the
    # SAME job that the round already pays (one job per round instead of
    # checkpoint + count; the seed's size is now also free, so even the
    # FIRST round's frontier join can broadcast). The sizes drive the
    # join strategy: a small frontier/visited side is broadcast so the
    # per-round expansion and anti-join need no shuffle of the edge
    # list — at sf0.1 this cut the round loop from ~4 SMJ exchanges to
    # the single distinct() shuffle. Past the threshold (frontiers on
    # billion-node graphs) both joins fall back to shuffles, which is
    # the only strategy that works at that size anyway.
    vobs = Observation()
    visited = (
        sources.select("node").distinct()
        .withColumn("lvl", F.lit(0).cast("bigint"))
        .observe(vobs, F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    visited_n = int(vobs.get["n"])
    frontier = visited.select("node")
    frontier_n = visited_n
    for h in range(1, max_hops + 1):
        f_side = (
            F.broadcast(frontier)
            if frontier_n <= BFS_BROADCAST_MAX_ROWS
            else frontier
        )
        obs = Observation()
        nxt = (
            f_side.join(edges, frontier["node"] == edges[src_col])
            .select(F.col(dst_col).alias("node"))
            .distinct()
            .join(
                F.broadcast(visited)
                if visited_n <= BFS_BROADCAST_MAX_ROWS
                else visited,
                "node",
                "left_anti",
            )
            .withColumn("lvl", F.lit(h).cast("bigint"))
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        n = int(obs.get["n"])
        if n == 0:
            break
        # visited is a union of <= max_hops checkpointed frontiers —
        # lineage stays shallow without its own per-round checkpoint
        visited = visited.unionByName(nxt)
        visited_n += n
        frontier = nxt.select("node")
        frontier_n = n
    return visited


def sssp_hops(
    edges: DataFrame,
    sources: DataFrame,
    max_hops: int,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str = "weight",
) -> DataFrame:
    """Bounded-hop WEIGHTED shortest paths from any node in ``sources``
    (one ``node`` column): the cheapest total edge weight reachable in
    at most ``max_hops`` edges — Bellman-Ford with the frontier
    optimization, the min-plus sibling of :func:`bfs_levels` ("cheapest
    supply route within 4 legs", "strongest co-purchase chain to this
    part").

    Each round relaxes ONLY the nodes whose distance improved last
    round against the edge list (one join + one min-aggregate), then
    keeps the improvements (one left join against the running
    distances). The frontier-Bellman-Ford invariant — after round h,
    ``cost`` is the exact minimum over paths of <= h edges — holds
    because every <= h-edge path's prefix improved at some earlier
    round and was relaxed then; work per round is O(frontier-adjacent
    edges), same localCheckpoint lineage discipline and bounded
    ``isEmpty`` probes as BFS. Weights are BIGINT by contract
    (integer-exact min-plus — no float summation-order hazard; hop cap
    bounds negative-weight pathology, but non-negative weights are the
    intended domain and the oracle's).

    Determinism: min cost per node is unique — no tie-break exists.
    Output: (node, cost) BIGINT; unreachable nodes absent; sources at
    cost 0.
    """
    from pyspark.sql import Observation

    if max_hops < 0:
        raise ValueError(f"max_hops={max_hops}: need >= 0")
    # plain renamed-column joins throughout (no alias-qualified refs):
    # sources/edges often share lineage at the call site (sources
    # aggregated FROM the edge list), and the qualified-access style
    # hits attribute-resolution holes there (the MISSING_ATTRIBUTES
    # family) — renames sidestep it entirely
    ecols = edges.select(
        F.col(src_col).alias("__esrc"),
        F.col(dst_col).alias("__edst"),
        F.col(weight_col).cast("bigint").alias("__ew"),
    )
    dist = sources.select("node").distinct().withColumn(
        "cost", F.lit(0).cast("bigint")
    ).localCheckpoint(eager=True)
    frontier = dist
    for _ in range(1, max_hops + 1):
        cand = (
            frontier.join(ecols, frontier["node"] == ecols["__esrc"])
            .groupBy(F.col("__edst").alias("node"))
            .agg(F.min(F.col("cost") + F.col("__ew")).alias("cost"))
        )
        old = dist.select(
            F.col("node").alias("__onode"), F.col("cost").alias("__ocost")
        )
        # the emptiness probe rides the eager checkpoint via ``observe``
        # (round 13): one job per round instead of checkpoint + LIMIT-1
        obs = Observation()
        improved = (
            cand.join(old, cand["node"] == old["__onode"], "left")
            .filter(
                F.col("__ocost").isNull()
                | (F.col("cost") < F.col("__ocost"))
            )
            .select("node", "cost")
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)
        )
        if int(obs.get["n"]) == 0:
            break
        dist = (
            dist.join(improved.select("node"), "node", "left_anti")
            .unionByName(improved)
            .localCheckpoint(eager=True)
        )
        frontier = improved
    return dist
