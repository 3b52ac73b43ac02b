"""Split from the round-4 queries.py monolith; see queries/__init__.py."""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403

# Round 4: the remaining TPC-H join topologies the testdata can express.
# The schema has no partsupp table and no l_shipmode/commit/receipt dates,
# so Q12 is out of reach and Q2/Q9/Q11/Q16 use the distinct
# (l_partkey, l_suppkey) relation derived from lineitem where TPC-H reads
# partsupp — same join topology and decorrelation shapes, documented
# proxy columns. Money math rides the cents discipline throughout.
# --------------------------------------------------------------------------


def q_join_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's spend on a part
    type, by order year. Seven-way star join (two independent nation
    branches like Q7), conditional cents aggregate, and a share division
    of two exact integer sums — hash-safe without rtol. Dims broadcast;
    lineitem shuffles once into the year aggregate."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    vol = (_cents("l_extendedprice") * (100 - _cents("l_discount"))).alias("__v")
    target = (
        # no broadcast hints on part/supplier/customer: they scale with
        # SF, and a hint overrides the size threshold — the planner/AQE
        # broadcasts while they fit and degrades to shuffle joins at
        # scale (§3.1); nation/region hints stay (25/5 rows forever)
        li.join(part.filter(F.col("p_type") == "STANDARD"),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.alias("cn")),
              F.col("c_nationkey") == F.col("cn.n_nationkey"))
        .join(F.broadcast(region),
              (F.col("cn.n_regionkey") == F.col("r_regionkey"))
              & (F.col("r_name") == "AMERICA"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation.alias("sn")),
              F.col("s_nationkey") == F.col("sn.n_nationkey"))
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            vol,
            F.col("sn.n_name").alias("supp_nation"),
        )
    )
    return (
        target.groupBy("o_year")
        .agg(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("__v"))
                  .otherwise(F.lit(0))).alias("__num"),
            F.sum("__v").alias("__den"),
        )
        .select(
            "o_year",
            (F.col("__num").cast("double") / F.col("__den").cast("double"))
            .alias("mkt_share"),
        )
    )


ORACLE_MARKET_SHARE = """
WITH target AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(round(l_extendedprice * 100) AS BIGINT)
           * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS v,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_type = 'STANDARD'
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'AMERICA'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation sn ON s_nationkey = sn.n_nationkey
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN v ELSE 0 END) AS DOUBLE)
         / CAST(SUM(v) AS DOUBLE) AS mkt_share
FROM target GROUP BY o_year
"""


def q_join_nation_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year over a
    six-way join. No partsupp exists, so cost uses the documented proxy
    ``p_retailprice * l_quantity`` (same join topology: lineitem x part x
    supplier x nation x orders). profit accumulates as exact integer
    hundredths-of-cents."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part")
    nation = _t(spark, sf_dir, "nation")

    profit = (
        _cents("l_extendedprice") * (100 - _cents("l_discount"))
        - _cents("p_retailprice") * F.round(F.col("l_quantity")).cast("bigint") * 100
    )
    return (
        li.join(part.filter(F.col("p_name").contains("red")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
        )
        .agg((F.sum(profit).cast("double") / 10000.0).alias("sum_profit"))
    )


ORACLE_NATION_PROFIT = """
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS BIGINT) AS o_year,
       CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))
                - CAST(round(p_retailprice * 100) AS BIGINT)
                  * CAST(round(l_quantity) AS BIGINT) * 100) AS DOUBLE)
         / 10000.0 AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1, 2
"""


def q_join_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the EUROPE supplier with
    the minimum supply cost. The part-supplier relation derives from
    lineitem (min total extended price per (part, supplier) as the cost
    proxy — partsupp does not exist); the correlated min-cost subquery
    decorrelates into a per-part window rank with a deterministic
    (cost, s_suppkey) tie rule. Cost stays integer cents until the final
    /100 projection."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part")
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region")

    ps = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(_cents("l_extendedprice")).alias("__cost"))
    )
    europe = (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region),
              (F.col("n_regionkey") == F.col("r_regionkey"))
              & (F.col("r_name") == "EUROPE"))
        .select("s_suppkey", "s_name", "s_acctbal", F.col("n_name"))
    )
    w = Window.partitionBy("l_partkey").orderBy(
        F.col("__cost").asc(), F.col("s_suppkey").asc()
    )
    return (
        ps.join(europe, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(part.filter(F.col("p_size") == 15),
              F.col("l_partkey") == F.col("p_partkey"))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("s_acctbal"),
            F.col("s_name"),
            F.col("n_name").alias("nation"),
            F.col("p_partkey"),
            F.col("p_name"),
            (F.col("__cost").cast("double") / 100.0).alias("supply_cost"),
        )
    )


ORACLE_MIN_COST_SUPPLIER = """
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(round(l_extendedprice * 100) AS BIGINT)) AS cost
  FROM lineitem GROUP BY 1, 2
),
europe AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey AND r_name = 'EUROPE'
),
ranked AS (
  SELECT s_acctbal, s_name, n_name AS nation, p_partkey, p_name, cost,
         row_number() OVER (PARTITION BY l_partkey
                            ORDER BY cost ASC, s_suppkey ASC) AS rn
  FROM ps
  JOIN europe ON l_suppkey = s_suppkey
  JOIN part ON l_partkey = p_partkey AND p_size = 15
)
SELECT s_acctbal, s_name, nation, p_partkey, p_name,
       CAST(cost AS DOUBLE) / 100.0 AS supply_cost
FROM ranked WHERE rn = 1
"""


def q_agg_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts representing an outsized share of one
    nation's supply value. Value = cents of lineitem spend through
    GERMANY's suppliers; the correlated HAVING > fraction-of-total
    decorrelates into a 1-row broadcast total, and the threshold compare
    stays in integers (value * 10000 > total) so the predicate is exact."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")

    german = (
        li.join(
            supp.join(F.broadcast(nation.filter(F.col("n_name") == "NATION_7")),
                      F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey"),
            F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_cents("l_extendedprice")).alias("__value"))
    )
    total = german.agg(F.sum("__value").alias("__total"))
    return (
        german.crossJoin(F.broadcast(total))
        .filter(F.col("__value") * 10000 > F.col("__total"))
        .select(
            "l_partkey",
            (F.col("__value").cast("double") / 100.0).alias("part_value"),
        )
    )


ORACLE_IMPORTANT_PARTS = """
WITH german AS (
  SELECT l_partkey,
         SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey AND n_name = 'NATION_7'
  GROUP BY 1
)
SELECT l_partkey, CAST(value AS DOUBLE) / 100.0 AS part_value
FROM german
WHERE value * 10000 > (SELECT SUM(value) FROM german)
"""


def q_agg_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier count per part attribute group,
    with a NOT-IN supplier blocklist. The part-supplier relation derives
    from lineitem (distinct pairs — partsupp does not exist); the
    blocklist (negative-balance suppliers, the schema's stand-in for
    Q16's complaint predicate) becomes a broadcast anti join before the
    distinct count."""
    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    part = _t(spark, sf_dir, "part")

    pairs = li.select("l_partkey", "l_suppkey").distinct()
    blocked = supp.filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        pairs.join(blocked, "l_suppkey", "left_anti")
        .join(part.filter(F.col("p_brand") != "Brand#4"),
              F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


ORACLE_SUPPLIER_VARIETY = """
SELECT p_brand, p_type, p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) pairs
JOIN part ON l_partkey = p_partkey AND p_brand != 'Brand#4'
WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------


def q_peak_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval concurrency: the PEAK number of simultaneously
    open orders per priority class, plus the first date the peak was hit.
    An order is open from o_orderdate through its LAST shipment date
    (max l_shipdate; orders with no shipments are out of scope).

    The classic O(n log n) sweep, distributed: intervals melt to +1/-1
    boundary deltas, deltas pre-aggregate per (priority, date) — so the
    running-sum window runs over DATE-cardinality rows, not order
    cardinality (the skew/scale bound: a priority class's window input is
    at most the calendar length regardless of order volume) — then one
    running sum and a peak argmin. Pure integer/date arithmetic =>
    hash-exact. Two shuffles total (orderkey rollup; priority window)."""
    li = _t(spark, sf_dir, "lineitem")
    orders = _t(spark, sf_dir, "orders")

    close = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("close_d"))
    ivl = orders.join(
        close, F.col("o_orderkey") == F.col("l_orderkey")
    ).select(
        F.col("o_orderpriority").alias("pri"),
        F.col("o_orderdate").alias("open_d"),
        F.col("close_d"),
    )
    # melt to boundary deltas via explode, NOT a union — a union of two
    # selects over ivl would plan the whole order/lineitem subtree once
    # per branch (plan-audited: 2x scans)
    deltas = ivl.select(
        "pri",
        F.explode(
            F.array(
                F.struct(F.col("open_d").alias("d"), F.lit(1).alias("delta")),
                F.struct(
                    F.date_add(F.col("close_d"), 1).alias("d"),
                    F.lit(-1).alias("delta"),
                ),
            )
        ).alias("e"),
    ).select("pri", F.col("e.d").alias("d"), F.col("e.delta").alias("delta"))
    from pyspark.sql import Window

    net = deltas.groupBy("pri", "d").agg(F.sum("delta").alias("net"))
    w_run = (
        Window.partitionBy("pri").orderBy("d")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    run = net.withColumn("open_cnt", F.sum("net").over(w_run))
    # peak as a second window over the SAME partition key — a groupBy +
    # self-join here would duplicate the entire upstream subtree into
    # both join branches (plan-audited: 2x scans, 2x rollups); stacked
    # windows share one exchange/sort instead
    return (
        run.withColumn(
            "peak_open", F.max("open_cnt").over(Window.partitionBy("pri"))
        )
        .filter(F.col("open_cnt") == F.col("peak_open"))
        .groupBy("pri", "peak_open")
        .agg(F.min("d").alias("first_peak_date"))
        .select(
            F.col("pri").alias("o_orderpriority"),
            F.col("peak_open").cast("bigint").alias("peak_open"),
            "first_peak_date",
        )
    )


ORACLE_PEAK_OPEN = """
WITH ivl AS (
  SELECT o_orderpriority AS pri, o_orderdate AS open_d,
         max(l_shipdate) AS close_d
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY o_orderkey, o_orderpriority, o_orderdate
),
deltas AS (
  SELECT pri, open_d AS d, 1 AS delta FROM ivl
  UNION ALL
  SELECT pri, close_d + INTERVAL 1 DAY, -1 FROM ivl
),
net AS (
  SELECT pri, CAST(d AS DATE) AS d, sum(delta) AS net
  FROM deltas GROUP BY 1, 2
),
run AS (
  SELECT pri, d,
         sum(net) OVER (PARTITION BY pri ORDER BY d
                        ROWS UNBOUNDED PRECEDING) AS open_cnt
  FROM net
)
SELECT pri AS o_orderpriority,
       CAST(open_cnt AS BIGINT) AS peak_open,
       min(d) AS first_peak_date
FROM (
  SELECT pri, d, open_cnt,
         max(open_cnt) OVER (PARTITION BY pri) AS pk
  FROM run
)
WHERE open_cnt = pk
GROUP BY pri, open_cnt
"""


COPURCHASE_TOP_K = 50


def q_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top-50 part pairs most often
    ordered together. The self-join is keyed on the ORDER, so its fanout
    per order is C(basket, 2) — bounded by the max basket size (7 lines
    in this schema), never by corpus size: the classic bounded-clique
    co-occurrence shape, unlike the unbounded hot-key self-joins the
    dedup family guards against. Distinct (order, part) first so
    multi-line duplicates of one part count once; deterministic total
    order (count desc, part_a, part_b) makes LIMIT hash-stable."""
    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(COPURCHASE_TOP_K)
    )


ORACLE_COPURCHASE = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
)
SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
       count(*) AS n_orders
FROM items a JOIN items b
  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
ORDER BY n_orders DESC, part_a, part_b
LIMIT {COPURCHASE_TOP_K}
"""


RULE_MIN_BOTH, RULE_MIN_CONF_PCT = 3, 10


def q_market_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association-rule mining over order baskets: directed rules
    antecedent -> consequent with exact support / confidence / lift.
    Pair counts come from the same bounded-clique order-keyed self-join
    as ``copurchase_pairs`` (fanout C(basket,2), never corpus-quadratic);
    each unordered pair then expands into its two directed rules by
    projection. All three metrics are ONE IEEE division of exact
    integer products (lift = (n_both*n_total)/(n_ante*n_cons)), so
    values hash bit-identically; the confidence floor is tested in
    integer arithmetic before any division. The total-orders scalar
    rides a broadcast 1-row cross join — no data moves for it."""
    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    part_n = items.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_part")
    )
    a, b = items.alias("a"), items.alias("b")
    both = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= RULE_MIN_BOTH)
    )
    rules = both.selectExpr(
        "part_a AS antecedent", "part_b AS consequent", "n_both"
    ).unionByName(
        both.selectExpr(
            "part_b AS antecedent", "part_a AS consequent", "n_both"
        )
    )
    total = items.select(
        F.countDistinct("l_orderkey").alias("n_total")
    )
    na = part_n.selectExpr("l_partkey AS antecedent", "n_part AS n_ante")
    nc = part_n.selectExpr("l_partkey AS consequent", "n_part AS n_cons")
    return (
        rules.join(na, "antecedent")
        .join(nc, "consequent")
        .crossJoin(F.broadcast(total))
        .filter(F.col("n_both") * 100 >= F.lit(RULE_MIN_CONF_PCT) * F.col("n_ante"))
        .select(
            "antecedent",
            "consequent",
            "n_both",
            (F.col("n_both").cast("double") / F.col("n_total").cast("double"))
            .alias("support"),
            (F.col("n_both").cast("double") / F.col("n_ante").cast("double"))
            .alias("confidence"),
            (
                (F.col("n_both") * F.col("n_total")).cast("double")
                / (F.col("n_ante") * F.col("n_cons")).cast("double")
            ).alias("lift"),
        )
    )


ORACLE_BASKET_RULES = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
part_n AS (
  SELECT l_partkey, count(*) AS n_part FROM items GROUP BY l_partkey
),
both_n AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, count(*) AS n_both
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {RULE_MIN_BOTH}
),
rules AS (
  SELECT part_a AS antecedent, part_b AS consequent, n_both FROM both_n
  UNION ALL
  SELECT part_b AS antecedent, part_a AS consequent, n_both FROM both_n
),
total AS (SELECT count(DISTINCT l_orderkey) AS n_total FROM items)
SELECT r.antecedent, r.consequent, r.n_both,
       CAST(r.n_both AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS support,
       CAST(r.n_both AS DOUBLE) / CAST(na.n_part AS DOUBLE) AS confidence,
       CAST(r.n_both * t.n_total AS DOUBLE)
         / CAST(na.n_part * nc.n_part AS DOUBLE) AS lift
FROM rules r
JOIN part_n na ON na.l_partkey = r.antecedent
JOIN part_n nc ON nc.l_partkey = r.consequent
CROSS JOIN total t
WHERE r.n_both * 100 >= {RULE_MIN_CONF_PCT} * na.n_part
"""


PR_EDGE_MIN_BOTH, PR_ITERS = 2, 3


def _copurchase_edges(
    items: DataFrame, directed: bool = True,
    min_both: int = PR_EDGE_MIN_BOTH,
) -> DataFrame:
    """Co-purchase graph from a distinct (l_orderkey, l_partkey) item
    set (need NOT be pre-deduped — ``collect_set`` dedups per order):
    parts ordered together in >= ``min_both`` orders become an
    undirected edge, optionally doubled into a directed list (the shape
    pagerank consumes; triangle counting canonicalizes either).

    Pair generation is one ``groupBy(order) -> sorted part set ->
    in-row (i < j) expansion`` instead of the former distinct +
    equi-self-join: two shuffles rather than four, with the k^2
    per-order pair fan-out produced MAP-SIDE by a generate expression
    (identical pair multiset — each order contributes each unordered
    pair once either way; verified edge-set-equal on sf0.1). Per-order
    state is the distinct part set (k elements), the same bound the
    self-join's per-key build side had; the hub-order hazard class is
    unchanged."""
    per_order = items.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_partkey")).alias("ps")
    )
    # two chained generates instead of one flatten(transform(transform))
    # expression: building the full k^2 struct array per order row costs
    # an O(k) slice+transform allocation per element PLUS the flatten
    # copy; exploding (i, pa) first leaves one slice per anchor and no
    # flattened array (measured 1.9 -> 1.6 s for the pair build at
    # sf0.1; pair multiset identical — anchor i still pairs with every
    # later element exactly once)
    pairs = (
        per_order.select(F.col("ps"), F.posexplode("ps").alias("i", "pa"))
        .select(
            F.col("pa"),
            F.explode(F.expr("slice(ps, i + 2, size(ps))")).alias("pb"),
        )
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= min_both)
    )
    if directed:
        # both directions emitted map-side from one pass over the pair
        # aggregate — a union of two selects over ``pairs`` embeds the
        # whole build subtree twice and Spark 4.1 does not reuse the
        # exchanges, so the eager checkpoint below used to EXECUTE the
        # groupBy pipeline twice (row set identical either way)
        edges = pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("pa").alias("src"), F.col("pb").alias("dst")
                    ),
                    F.struct(
                        F.col("pb").alias("src"), F.col("pa").alias("dst")
                    ),
                )
            ).alias("e")
        ).select("e.src", "e.dst")
    else:
        edges = pairs.selectExpr("pa AS src", "pb AS dst")
    # materialized ONCE for every caller: all seven consumers are
    # iterative (pagerank rounds, k-core peels, BFS frontiers) or
    # multi-pass (triangle wedges), and Spark 4.1 reuses no exchanges —
    # without this the distinct+self-join+aggregate build re-executes
    # once per round (measured: BFS 8.43 -> 3.37 s, PageRank 3.79 ->
    # 2.69 s median at sf0.1 from the checkpoint alone). Round 12
    # re-audit: a columnar persist() was tried here and REVERTED — it
    # first looked 2x faster, but only because Spark's CacheManager was
    # substituting the previous run's cache into later identical runs;
    # with caches dropped between runs the interleaved A/B has the
    # checkpoint clearly ahead (BFS 3.49 vs 5.14 s trimmed means at
    # sf0.1: the rounds re-decompress an InMemoryRelation every scan,
    # while checkpointed rows are ready to stream).
    return edges.localCheckpoint(eager=True)


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-point PageRank over the co-purchase graph (parts as nodes,
    ordered-together-at-least-twice as undirected edges, doubled into a
    directed list): which parts are central to the co-purchase network.
    Every per-edge contribution is an exact integer floor division
    (operators/graph.pagerank_fixed_point), so three unrolled
    message-passing rounds — join + aggregate per round, O(E) each —
    produce bit-identical scores in any engine; the oracle unrolls the
    same three rounds in SQL."""
    from ..operators.graph import pagerank_fixed_point

    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey")
    edges = _copurchase_edges(items)
    out = pagerank_fixed_point(edges, iterations=PR_ITERS)
    return out.select(F.col("node").alias("part"), "score_scaled")


def _pr_round(prev: str, label: str) -> str:
    return f"""{label} AS (
  SELECT n.node, CAST(150000 + COALESCE(m.mass, 0) AS BIGINT) AS score
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node,
           SUM((85 * s.score) // (100 * d.deg)) AS mass
    FROM edges e
    JOIN {prev} s ON s.node = e.src
    JOIN deg d ON d.node = e.src
    GROUP BY e.dst) m ON m.node = n.node
)"""


ORACLE_PAGERANK = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {PR_EDGE_MIN_BOTH}
),
edges AS (
  SELECT pa AS src, pb AS dst FROM pairs
  UNION ALL
  SELECT pb AS src, pa AS dst FROM pairs
),
nodes AS (
  SELECT DISTINCT src AS node FROM edges
  UNION
  SELECT DISTINCT dst AS node FROM edges
),
deg AS (
  SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1
),
s0 AS (
  SELECT node, CAST(1000000 AS BIGINT) AS score FROM nodes
),
{_pr_round('s0', 's1')},
{_pr_round('s1', 's2')},
{_pr_round('s2', 's3')}
SELECT node AS part, score AS score_scaled FROM s3
"""


def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part triangle counts over the same co-purchase graph PageRank
    runs on: how embedded each part is in tightly-knit co-purchase
    cliques (the classic clustering/community signal). The operator
    (operators/graph.triangle_counts) uses degree-ordered orientation so
    wedge fan-out is bounded by O(sqrt(E)) per node on skewed graphs —
    the oracle counts the same triangle set with the simple a<b<c
    three-way join, which is fine at gate scale and identical by
    construction (orientation changes the enumeration order, never the
    triangle set)."""
    from ..operators.graph import triangle_counts

    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey")
    out = triangle_counts(_copurchase_edges(items, directed=False))
    return out.select(F.col("node").alias("part"), "n_triangles")


ORACLE_TRIANGLES = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
e AS (
  SELECT a.l_partkey AS a, b.l_partkey AS b
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {PR_EDGE_MIN_BOTH}
),
tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
)
SELECT node AS part, CAST(count(*) AS BIGINT) AS n_triangles FROM (
  SELECT x AS node FROM tri
  UNION ALL SELECT y FROM tri
  UNION ALL SELECT z FROM tri
) GROUP BY node
"""


PR_INCR_BASE_MOD = 7  # base graph = orders with l_orderkey % 7 != 0


def q_graph_pagerank_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-edge PageRank refresh (graph IVM): the co-purchase graph is
    split into a BASE (orders with ``l_orderkey % 7 != 0``) whose
    per-iteration scores are materialized once per sf_dir (the stored
    state a nightly job owns), and a DELTA — the edges the remaining
    orders add (pair counts only grow, so the base edge set is a subset
    of the full one and the delta is pure additions, the CDC-append
    shape). ``pagerank_incremental`` re-evaluates only the delta's 3-hop
    frontier against the stored rounds and must land BIT-IDENTICAL to
    the full fixed-point run — the oracle is literally graph_pagerank's
    full-graph SQL, making this the registry's strongest IVM pin: two
    completely different execution strategies, one hash."""
    import hashlib
    import os
    import tempfile

    from ..operators.graph import (
        pagerank_incremental,
        pagerank_iteration_scores,
    )

    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey")
    base_items = items.filter(
        F.col("l_orderkey") % PR_INCR_BASE_MOD != 0
    )
    base_edges = _copurchase_edges(base_items)
    full_edges = _copurchase_edges(items)
    delta_edges = full_edges.join(base_edges, ["src", "dst"], "left_anti")

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    dest = os.path.join(tempfile.gettempdir(), f"fis_pr_state_{tag}")
    if not os.path.exists(os.path.join(dest, "_SUCCESS")):
        pagerank_iteration_scores(base_edges, iterations=PR_ITERS).write.mode(
            "overwrite"
        ).parquet(dest)
    state = spark.read.parquet(dest)

    out = pagerank_incremental(
        base_edges, delta_edges, state, iterations=PR_ITERS
    )
    return out.select(F.col("node").alias("part"), "score_scaled")


KCORE_K, KCORE_ROUNDS = 3, 4


def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-round k-core peel over the co-purchase graph: 4 rounds of
    drop-degree-below-3, then surviving in-core degrees — the dense-core
    community signal (parts entangled in heavily cross-sold clusters).
    The round count unrolls into both engines identically (the
    fixed-iteration determinism recipe shared with PageRank); the unit
    test pins that 4 rounds reach the true fixpoint on a graph built to
    need cascading peels."""
    from ..operators.graph import kcore_peel

    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey")
    out = kcore_peel(
        _copurchase_edges(items, directed=False), k=KCORE_K,
        rounds=KCORE_ROUNDS,
    )
    return out.select(F.col("node").alias("part"), "core_deg")


def _core_round(prev: str, label: str) -> str:
    keep = (
        f"(SELECT node FROM (SELECT a AS node FROM {prev} "
        f"UNION ALL SELECT b FROM {prev}) "
        f"GROUP BY node HAVING count(*) >= {KCORE_K})"
    )
    return (
        f"{label} AS MATERIALIZED (\n  SELECT a, b FROM {prev}\n"
        f"  WHERE a IN {keep}\n    AND b IN {keep}\n)"
    )


ORACLE_KCORE = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
e0 AS MATERIALIZED (
  SELECT a.l_partkey AS a, b.l_partkey AS b
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {PR_EDGE_MIN_BOTH}
),
{_core_round('e0', 'e1')},
{_core_round('e1', 'e2')},
{_core_round('e2', 'e3')},
{_core_round('e3', 'e4')}
SELECT node AS part, count(*) AS core_deg FROM (
  SELECT a AS node FROM e4 UNION ALL SELECT b FROM e4
) GROUP BY node
"""


PPR_SEED_MOD = 50  # "promoted" seed parts: p % 50 == 0


def q_graph_ppr_recommend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized-PageRank recommendations over the co-purchase graph:
    teleport mass returns only to the promoted seed set (part % 50 == 0),
    so nonzero scores rank every part by co-purchase reachability FROM
    the promotion — the classic graph recommender. Integer-exact like
    the global PageRank; the oracle unrolls the same seeded rounds."""
    from ..operators.graph import personalized_pagerank

    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey")
    edges = _copurchase_edges(items)
    seeds = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .filter(F.col("node") % PPR_SEED_MOD == 0)
    )
    out = personalized_pagerank(edges, seeds, iterations=PR_ITERS)
    return out.select(F.col("node").alias("part"), "score_scaled")


def _ppr_round(prev: str, label: str) -> str:
    return f"""{label} AS MATERIALIZED (
  SELECT n.node,
         CAST(CASE WHEN n.node % {PPR_SEED_MOD} = 0 THEN 150000 ELSE 0 END
              + COALESCE(m.mass, 0) AS BIGINT) AS score
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node,
           SUM((85 * s.score) // (100 * d.deg)) AS mass
    FROM edges e
    JOIN {prev} s ON s.node = e.src
    JOIN deg d ON d.node = e.src
    GROUP BY e.dst) m ON m.node = n.node
)"""


ORACLE_PPR = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {PR_EDGE_MIN_BOTH}
),
edges AS MATERIALIZED (
  SELECT pa AS src, pb AS dst FROM pairs
  UNION ALL
  SELECT pb AS src, pa AS dst FROM pairs
),
nodes AS MATERIALIZED (
  SELECT DISTINCT src AS node FROM edges
  UNION
  SELECT DISTINCT dst AS node FROM edges
),
deg AS MATERIALIZED (
  SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1
),
s0 AS MATERIALIZED (
  SELECT node,
         CAST(CASE WHEN node % {PPR_SEED_MOD} = 0
              THEN 1000000 ELSE 0 END AS BIGINT) AS score
  FROM nodes
),
{_ppr_round('s0', 's1')},
{_ppr_round('s1', 's2')},
{_ppr_round('s2', 's3')}
SELECT node AS part, score AS score_scaled FROM s3
"""


def q_graph_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted PageRank over the co-purchase graph: the pair count
    (how many orders held both parts) is the edge weight, so rank mass
    follows co-purchase VOLUME, not mere adjacency — the ranking a
    merchandiser actually wants. Integer-exact
    (operators/graph.pagerank_fixed_point_weighted); the oracle unrolls
    the same weighted rounds."""
    from ..operators.graph import pagerank_fixed_point_weighted

    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"),
            F.col("b.l_partkey").alias("pb"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= PR_EDGE_MIN_BOTH)
    )
    edges = pairs.selectExpr("pa AS src", "pb AS dst", "n AS weight").unionByName(
        pairs.selectExpr("pb AS src", "pa AS dst", "n AS weight")
    )
    out = pagerank_fixed_point_weighted(edges, iterations=PR_ITERS)
    return out.select(F.col("node").alias("part"), "score_scaled")


def _wpr_round(prev: str, label: str) -> str:
    return f"""{label} AS MATERIALIZED (
  SELECT n.node, CAST(150000 + COALESCE(m.mass, 0) AS BIGINT) AS score
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS node,
           SUM((85 * s.score * e.weight) // (100 * w.wtot)) AS mass
    FROM edges e
    JOIN {prev} s ON s.node = e.src
    JOIN wsum w ON w.node = e.src
    GROUP BY e.dst) m ON m.node = n.node
)"""


ORACLE_PAGERANK_WEIGHTED = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS n
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {PR_EDGE_MIN_BOTH}
),
edges AS MATERIALIZED (
  SELECT pa AS src, pb AS dst, n AS weight FROM pairs
  UNION ALL
  SELECT pb AS src, pa AS dst, n AS weight FROM pairs
),
nodes AS MATERIALIZED (
  SELECT DISTINCT src AS node FROM edges
  UNION
  SELECT DISTINCT dst AS node FROM edges
),
wsum AS MATERIALIZED (
  SELECT src AS node, CAST(SUM(weight) AS BIGINT) AS wtot
  FROM edges GROUP BY 1
),
s0 AS MATERIALIZED (
  SELECT node, CAST(1000000 AS BIGINT) AS score FROM nodes
),
{_wpr_round('s0', 's1')},
{_wpr_round('s1', 's2')},
{_wpr_round('s2', 's3')}
SELECT node AS part, score AS score_scaled FROM s3
"""


BFS_MAX_HOPS = 3


def q_graph_bfs_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-hop reachability rings over the co-purchase graph: BFS hop
    levels from the lowest-keyed part, capped at 3 hops — "everything
    co-purchased within 3 hops of this part", the recall/contamination
    blast-radius query. Level-synchronous frontier expansion
    (operators/graph.bfs_levels): each round joins only the FRONTIER
    against the edge list (O(frontier-adjacent edges) per round, hub
    fan-in absorbed map-side), anti-joins the visited set, and labels
    nodes with their first-discovery round — the shortest hop distance,
    which is unique, so the result is engine-exact with no tie-break
    hazard. The oracle walks the same rings with a recursive CTE
    (UNION-dedup bounds the walk; min(lvl) is the BFS level). Edge
    threshold 1 (any shared order), not the PageRank queries' 2: the
    denser graph makes the 3-hop ring cover the full part population at
    every scale (20k rows at sf0.1) — a strong whole-output hash rather
    than a 2-row fragment."""
    from ..operators.graph import bfs_levels

    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey")
    # the edge build is checkpointed inside _copurchase_edges — every
    # BFS round joins against it (measured 8.43 -> 3.37 s at sf0.1)
    edges = _copurchase_edges(items, min_both=1)
    src = edges.agg(F.min("src").alias("node"))
    out = bfs_levels(edges, src, max_hops=BFS_MAX_HOPS)
    return out.select(F.col("node").alias("part"), "lvl")


ORACLE_BFS_LEVELS = f"""
WITH RECURSIVE items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
edges AS MATERIALIZED (
  SELECT pa AS src, pb AS dst FROM pairs
  UNION ALL
  SELECT pb AS src, pa AS dst FROM pairs
),
src AS (
  SELECT min(src) AS node FROM edges
),
walk(node, lvl) AS (
  SELECT node, 0 FROM src
  UNION
  SELECT e.dst, w.lvl + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.lvl < {BFS_MAX_HOPS}
)
SELECT node AS part, CAST(min(lvl) AS BIGINT) AS lvl
FROM walk GROUP BY node
"""


SSSP_MAX_HOPS = 4


def q_graph_sssp_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-hop WEIGHTED shortest paths over the co-purchase graph
    (edge weight = co-purchase count; threshold 1 like the BFS query —
    at sf0.1 the >= 2 graph shrinks to a 2-row fragment, a weak hash,
    while threshold 1 keeps the 4-hop ball covering the full part
    population at every scale): cheapest total weight within 4 legs of the
    lowest-keyed part — the min-plus sibling of the BFS rings
    (operators/graph.sssp_hops, frontier Bellman-Ford: each round
    relaxes only last round's improved nodes against the edge list).
    Integer weights make the min-plus algebra exact; min cost per node
    is unique, so there is no tie-break hazard. The oracle runs the
    same bounded relaxation as chained materialized rounds
    (d_h = min(d_{h-1}, min over edges(d_{h-1}[src] + w))) — the
    POLYNOMIAL formulation, not a path-enumerating recursive CTE, which
    would explode combinatorially on a dense graph."""
    from ..operators.graph import sssp_hops

    li = _t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"),
            F.col("b.l_partkey").alias("pb"),
        )
        .agg(F.count(F.lit(1)).alias("w"))
    )
    # checkpointed for the same reason as the BFS query: four
    # relaxation rounds would otherwise rebuild the self-join edge
    # list each round (no exchange reuse in Spark 4.1)
    edges = pairs.selectExpr("pa AS src", "pb AS dst", "w").unionByName(
        pairs.selectExpr("pb AS src", "pa AS dst", "w")
    ).localCheckpoint(eager=True)
    src = edges.agg(F.min("src").alias("node"))
    out = sssp_hops(edges, src, max_hops=SSSP_MAX_HOPS, weight_col="w")
    return out.select(F.col("node").alias("part"), "cost")


def _sssp_round(prev: str, label: str) -> str:
    return f"""{label} AS MATERIALIZED (
  SELECT node, CAST(MIN(cost) AS BIGINT) AS cost FROM (
    SELECT node, cost FROM {prev}
    UNION ALL
    SELECT e.dst AS node, p.cost + e.w AS cost
    FROM {prev} p JOIN edges e ON e.src = p.node
  ) GROUP BY node
)"""


ORACLE_SSSP_HOPS = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
),
pairs AS (
  SELECT a.l_partkey AS pa, b.l_partkey AS pb,
         CAST(count(*) AS BIGINT) AS w
  FROM items a JOIN items b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
),
edges AS MATERIALIZED (
  SELECT pa AS src, pb AS dst, w FROM pairs
  UNION ALL
  SELECT pb AS src, pa AS dst, w FROM pairs
),
d0 AS MATERIALIZED (
  SELECT min(src) AS node, CAST(0 AS BIGINT) AS cost FROM edges
),
{_sssp_round("d0", "d1")},
{_sssp_round("d1", "d2")},
{_sssp_round("d2", "d3")},
{_sssp_round("d3", "d4")}
SELECT node AS part, cost FROM d4
"""


# --------------------------------------------------------------------------
# Pareto frontier (skyline): best price-for-size trade-offs in part.
# Spark side is the monotone linear decomposition (operators/skyline.py);
# the oracle keeps the textbook quadratic NOT EXISTS as the independent
# formulation. Two strategies, one oracle.
# --------------------------------------------------------------------------


def q_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts on the (minimize retail price, maximize size) frontier —
    global_window tier: groupBy collapses to distinct prices, one
    running-max window, broadcast chain join-back. Exact ties all
    survive (duplicate prices exist from sf0.01 up)."""
    from ..operators.skyline import pareto_frontier_2d

    part = _t(spark, sf_dir, "part")
    out = pareto_frontier_2d(part, "p_retailprice", "p_size",
                             strategy="global_window")
    return out.select("p_partkey", "p_name", "p_retailprice", "p_size")


def q_skyline_pareto_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same frontier via the bucketed tier (no unpartitioned window
    anywhere: per-bucket maxima -> driver prefix array -> per-bucket
    windows) — the 100 TB shape, pinned to the identical oracle."""
    from ..operators.skyline import pareto_frontier_2d

    part = _t(spark, sf_dir, "part")
    out = pareto_frontier_2d(part, "p_retailprice", "p_size",
                             strategy="bucketed", n_buckets=64)
    return out.select("p_partkey", "p_name", "p_retailprice", "p_size")


ORACLE_SKYLINE_PARETO = """
SELECT p_partkey, p_name, p_retailprice, p_size
FROM part p
WHERE p_retailprice IS NOT NULL AND p_size IS NOT NULL
  AND NOT EXISTS (
    SELECT 1 FROM part q
    WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
      AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size)
  )
"""


def q_agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation WEIGHTED median line-item price (weight = quantity):
    the importance-weighted order statistic a corpus pipeline uses for
    quantity-weighted price floors or token-weighted doc-length cuts —
    the interpolated percentile family can't express weights at all.

    Exactness discipline: selection-only, like features_winsorize. The
    lower weighted median is the SMALLEST value whose cumulative weight
    reaches half the total — found by (1) pre-aggregating weights per
    DISTINCT value (kills any tie-order hazard: equal values merge
    before the cumsum), (2) one integer running sum over the per-nation
    distinct-value spine, (3) the half test as ``2*cum >= W`` in pure
    BIGINT (no division, no float), (4) min(value) among qualifiers.
    Every emitted number is an input element or an integer sum, so the
    DuckDB twin hashes exactly at any scale. The window runs over
    |nations x distinct prices| rows, never data rows; the two data
    passes are hash aggregates (map-side combinable). Logic lives in
    operators/weighted_stats.weighted_quantile_by_key (property-netted
    vs a pure-Python replay)."""
    from ..operators.weighted_stats import weighted_quantile_by_key

    li = _t(spark, sf_dir, "lineitem")
    supp = _t(spark, sf_dir, "supplier")
    nation = _t(spark, sf_dir, "nation")

    base = (
        li.join(supp, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            _cents("l_extendedprice").alias("__c"),
            F.round(F.col("l_quantity")).cast("bigint").alias("__w"),
        )
    )
    out = weighted_quantile_by_key(base, ["nation"], "__c", "__w")
    return out.select(
        "nation",
        "total_weight",
        (F.col("wq").cast("double") / 100.0).alias("weighted_median"),
    )


ORACLE_WEIGHTED_MEDIAN = """
WITH base AS (
  SELECT n_name AS nation,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS c,
         CAST(round(l_quantity) AS BIGINT) AS w
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
),
vals AS (
  SELECT nation, c, CAST(SUM(w) AS BIGINT) AS vw
  FROM base WHERE c IS NOT NULL AND w > 0 GROUP BY 1, 2
),
tot AS (
  SELECT nation, CAST(SUM(vw) AS BIGINT) AS total_weight
  FROM vals GROUP BY 1
),
cum AS (
  SELECT nation, c, SUM(vw) OVER (
    PARTITION BY nation ORDER BY c
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw
  FROM vals
)
SELECT cum.nation, tot.total_weight,
       CAST(MIN(cum.c) AS DOUBLE) / 100.0 AS weighted_median
FROM cum JOIN tot ON cum.nation = tot.nation
WHERE 2 * cum.cumw >= tot.total_weight
GROUP BY cum.nation, tot.total_weight
"""
