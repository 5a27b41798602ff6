"""Relational operator coverage: joins, windows, set ops, grouping
sets, subqueries, sorts/limits — SURVEY.md §2.B inventory.

Reference evidence: the full-SQL contract (reference README.md:15-16),
heap⋈columnstore joins (CHANGELOG.md:23); everything here is the query
plane the reference delegates to DuckDB, re-expressed as Catalyst logical
plans.

Type discipline: every computed integer output is cast to BIGINT on both
sides (Spark window/rank functions return INT, DuckDB returns BIGINT —
the driver compares schemas).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from pg_mooncake_spark.functions import dsum
from pg_mooncake_spark.queries.registry import (
    hash_join_hint,
    hashjoin_min_rows,
    query,
    register_views,
    t,
    table_rows,
)

# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@query(
    "join_inner_orders_customers",
    oracle="""
    SELECT o_orderkey, c_name, CAST(o_totalprice AS DOUBLE) AS totalprice
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus = 'F'
    ORDER BY o_orderkey
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join; customer is the broadcast dimension at small
    scale.

    Round-18 optimization: the unconditional customer broadcast becomes
    a shuffled-hash hint once the fact side is past the auto-broadcast
    range (hash_join_hint on orders' footer rows): at sf10 the forced
    broadcast built and shipped a 1.5M-entry (custkey, name) relation;
    shuffling both sides and hash-building per partition measured
    2.15 → 1.80 s interleaved (values identical).  At sf0.1 the gate is
    off and the planner's broadcast stays."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big = table_rows(sf_dir, "orders") >= hashjoin_min_rows()
    side = c.hint("shuffle_hash") if big else F.broadcast(c)
    return (
        o.join(side, o.o_custkey == c.c_custkey)
        .select("o_orderkey", "c_name", F.col("o_totalprice").alias("totalprice"))
        .orderBy("o_orderkey")
    )


@query(
    "join_left_outer_customer_orders",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS total_spent
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey ORDER BY c_custkey
    """,
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with no orders.

    Round-18 negative result (sf10, interleaved A/B): eager-aggregating
    orders per o_custkey before the join + shuffled-hash hint measured
    2.7–6.0 s vs 2.9–4.5 s for this shape — no consistent win, because
    the output contract is per-customer rows with a global ORDER BY, so
    the post-join aggregate+sort dominates either way (unlike q13,
    which collapses to a ~50-row histogram after its second level).
    Join-first kept."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum("o_totalprice", 2).alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


@query(
    "join_right_outer",
    oracle="""
    SELECT n_name, COUNT(s_suppkey) AS n_suppliers
    FROM supplier RIGHT JOIN nation ON s_nationkey = n_nationkey
    GROUP BY n_name ORDER BY n_name
    """,
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return (
        s.join(n, s.s_nationkey == n.n_nationkey, "right")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
        .orderBy("n_name")
    )


@query(
    "join_full_outer",
    oracle="""
    WITH cn AS (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1),
         sn AS (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT COALESCE(cn.k, sn.k) AS nationkey,
           COALESCE(n_cust, 0) AS n_cust, COALESCE(n_supp, 0) AS n_supp
    FROM cn FULL OUTER JOIN sn ON cn.k = sn.k
    ORDER BY nationkey
    """,
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two aggregates (nations with only one side)."""
    cn = (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sn = (
        t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        cn.join(sn, cn.k == sn.k, "full")
        .select(
            F.coalesce(cn.k, sn.k).alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


@query(
    "join_semi_customers_with_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_totalprice > 100000)
    ORDER BY c_custkey
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join = EXISTS (SURVEY §2.B joins).

    Round-15 negative result (sf10): pre-DISTINCTing o_custkey before
    the semi join measured 7.5 s vs 6.4 s — the semi join's shuffle
    already map-side-dedups its build keys, so the explicit distinct
    just adds an exchange.  The wall is the join + the ~1M-row global
    ORDER BY the query's contract requires.

    Round-18 optimization: at sf10 the static plan BROADCAST the
    ~7.3M-row filtered orders side (its size estimate under the
    threshold) — collecting and shipping a multi-hundred-MB hash
    relation before probing 1.5M customers against it.  The
    shuffled-hash hint (gated on orders' footer rows, hash_join_hint;
    sf0.1's genuinely small broadcast stays) shuffles both sides by
    custkey and hash-builds per partition.  Plan diff at sf10:
    BroadcastHashJoin(7.3M-entry build) → ShuffledHashJoin.  Measured
    interleaved A/B at sf10: 6.49 s → 1.45 s (4.5×), values identical
    (1.5M rows cross-checked)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return (
        c.join(
            hash_join_hint(o, table_rows(sf_dir, "orders")),
            c.c_custkey == o.o_custkey,
            "left_semi",
        )
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join = NOT EXISTS.

    Round-18 optimization: same gate as join_semi — at sf10 the static
    plan broadcast the full 15M-row orders build side; the shuffled-hash
    hint (gated on orders' footer rows) measured 6.7 → 1.2 s
    interleaved (5.5×), values identical.  The orders side is also
    projected to the join key alone (the anti join consumes nothing
    else), halving the exchanged bytes."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").select("o_custkey")
    return (
        c.join(
            hash_join_hint(o, table_rows(sf_dir, "orders")),
            c.c_custkey == o.o_custkey,
            "left_anti",
        )
        .select("c_custkey", "c_mktsegment")
        .orderBy("c_custkey")
    )


@query(
    "join_cross_region_nation",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    ORDER BY r_name, n_name
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "region")
        .crossJoin(t(spark, sf_dir, "nation"))
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    )


@query(
    "join_inequality_acctbal",
    oracle="""
    SELECT s_suppkey, COUNT(*) AS n_poorer_customers
    FROM supplier JOIN customer ON s_acctbal > c_acctbal
    GROUP BY s_suppkey ORDER BY s_suppkey
    """,
)
def join_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join (non-equi predicate) → broadcast nested loop.

    Scale note: BNL is quadratic; at 100 TB an inequality join must keep
    one side broadcast-small (supplier here) or be rewritten as a
    bucketized range join — see operators/rangejoin.py.
    """
    s = t(spark, sf_dir, "supplier")
    c = t(spark, sf_dir, "customer")
    return (
        F.broadcast(s)
        .join(c, s.s_acctbal > c.c_acctbal)
        .groupBy("s_suppkey")
        .agg(F.count(F.lit(1)).alias("n_poorer_customers"))
        .orderBy("s_suppkey")
    )


# ---------------------------------------------------------------------------
# Window functions
# ---------------------------------------------------------------------------


@query(
    "window_ranking_family",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank()       OVER w2 AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w2 AS BIGINT) AS drnk,
           ROUND(percent_rank() OVER w2, 9) AS prnk,
           ROUND(cume_dist()    OVER w2, 9) AS cdist,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile
    FROM lineitem
    WHERE l_orderkey < 100
    WINDOW w  AS (PARTITION BY l_orderkey ORDER BY l_linenumber),
           w2 AS (PARTITION BY l_orderkey ORDER BY l_returnflag)
    ORDER BY l_orderkey, l_linenumber
    """,
)
def window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank/dense_rank/percent_rank/cume_dist/ntile.

    Partitions by l_orderkey ordered by l_linenumber (FIXTURES.md window
    coverage guidance).  Note ntile/row_number use the unique ordering key
    so results are total-order deterministic.
    """
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    w = W.partitionBy("l_orderkey").orderBy("l_linenumber")
    w2 = W.partitionBy("l_orderkey").orderBy("l_returnflag")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.row_number().over(w).cast("bigint").alias("rn"),
            F.rank().over(w2).cast("bigint").alias("rnk"),
            F.dense_rank().over(w2).cast("bigint").alias("drnk"),
            F.round(F.percent_rank().over(w2), 9).alias("prnk"),
            F.round(F.cume_dist().over(w2), 9).alias("cdist"),
            F.ntile(4).over(w).cast("bigint").alias("quartile"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "window_offset_family",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           lag(l_quantity)  OVER w AS prev_qty,
           lead(l_quantity) OVER w AS next_qty,
           lag(l_quantity, 2, -1.0) OVER w AS prev2_qty,
           first_value(l_quantity) OVER wf AS first_qty,
           last_value(l_quantity)  OVER wf AS last_qty,
           nth_value(l_quantity, 2) OVER wf AS second_qty
    FROM lineitem
    WHERE l_orderkey < 100
    WINDOW w  AS (PARTITION BY l_orderkey ORDER BY l_linenumber),
           wf AS (PARTITION BY l_orderkey ORDER BY l_linenumber
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY l_orderkey, l_linenumber
    """,
)
def window_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first_value/last_value/nth_value with explicit frames."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    w = W.partitionBy("l_orderkey").orderBy("l_linenumber")
    wf = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.lag("l_quantity").over(w).alias("prev_qty"),
            F.lead("l_quantity").over(w).alias("next_qty"),
            F.lag("l_quantity", 2, -1.0).over(w).alias("prev2_qty"),
            F.first("l_quantity").over(wf).alias("first_qty"),
            F.last("l_quantity").over(wf).alias("last_qty"),
            F.nth_value("l_quantity", 2).over(wf).alias("second_qty"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "window_running_and_range_frames",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,2)))
                OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_qty,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,2)))
                OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                      ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS DOUBLE)
             AS qty_3row,
           CAST(COUNT(*) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
                               RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT)
             AS n_within_1
    FROM lineitem WHERE l_orderkey < 100
    ORDER BY l_orderkey, l_linenumber
    """,
)
def window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates over windows: running sum, sliding ROWS frame, RANGE frame."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 100)
    w = W.partitionBy("l_orderkey").orderBy("l_linenumber")
    qty_dec = F.col("l_quantity").cast("decimal(30,2)")
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            F.sum(qty_dec).over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .cast("double")
            .alias("running_qty"),
            F.sum(qty_dec).over(w.rowsBetween(-1, 1)).cast("double").alias("qty_3row"),
            F.count(F.lit(1))
            .over(
                W.partitionBy("l_orderkey")
                .orderBy("l_linenumber")
                .rangeBetween(-1, 1)
            )
            .cast("bigint")
            .alias("n_within_1"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, CAST(o_totalprice AS DOUBLE) AS totalprice,
             CAST(row_number() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
      FROM orders)
    WHERE rn <= 3
    ORDER BY o_custkey, rn
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer via ranked window (SURVEY §2.B top-k).

    Single-exchange shape (r19, the q2 coarser-co-partitioning lever
    §2.4 applied to the window family — VERDICT r18 item 6): ONE range
    exchange on o_custkey serves both the window (RangePartitioning on
    the key satisfies the window's ClusteredDistribution — equal keys
    land in one partition) and the output order.  The window sorts each
    partition by (o_custkey, totalprice DESC, o_orderkey), which within
    a customer IS rn order, and range boundaries keep customers
    ascending across partitions — so the output arrives exactly in the
    old trailing ``orderBy("o_custkey", "rn")`` order without the
    second exchange (whose range sampler re-executed the whole window
    subtree).  Ordered-identical over all 4.5M sf10 rows (A/B
    crosscheck); 0.57 → 0.42 s at sf0.1, 2.41 → 1.85 s at sf10.
    Order + shuffle-free-above-Sort pinned in tests/test_opt_r19.py."""
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.repartitionByRange(F.col("o_custkey"))
        .select(
            "o_custkey",
            "o_orderkey",
            F.col("o_totalprice").alias("totalprice"),
            F.row_number().over(w).cast("bigint").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


# ---------------------------------------------------------------------------
# Aggregation extras: distinct, filtered, grouping sets, string_agg, having
# ---------------------------------------------------------------------------


@query(
    "agg_distinct_and_filtered",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_suppkey) AS n_supp,
           COUNT(DISTINCT l_partkey) AS n_part,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) FILTER (WHERE l_discount > 0.05) AS DOUBLE) AS qty_highdisc,
           COUNT(*) FILTER (WHERE l_tax = 0) AS n_notax
    FROM lineitem
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_distinct_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) ×2 + per-aggregate FILTER clauses."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.countDistinct("l_partkey").alias("n_part"),
            F.sum(
                F.when(
                    F.col("l_discount") > 0.05,
                    F.col("l_quantity").cast("decimal(30,2)"),
                )
            )
            .cast("double")
            .alias("qty_highdisc"),
            F.count(F.when(F.col("l_tax") == 0, 1)).alias("n_notax"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_scalar_ungrouped",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT o_custkey) AS n_cust,
           CAST(MIN(o_totalprice) AS DOUBLE) AS min_price,
           CAST(MAX(o_totalprice) AS DOUBLE) AS max_price,
           CAST(MIN(o_orderdate) AS DATE) AS first_order,
           CAST(MAX(o_orderdate) AS DATE) AS last_order
    FROM orders
    """,
)
def agg_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped (scalar) aggregate over orders."""
    o = t(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_cust"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.min(F.col("o_orderdate").cast("date")).alias("first_order"),
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
    )


@query(
    "agg_stats_family",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
           ROUND(var_samp(l_quantity), 6) AS var_qty,
           ROUND(stddev_pop(l_quantity), 6) AS sdp_qty,
           ROUND(var_pop(l_quantity), 6) AS varp_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/variance (sample + population).

    Note: stddev over doubles is order-dependent in the last bits; rounded
    to 6 decimals, l_quantity values are small integers so both engines
    agree far beyond that precision.
    """
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
            F.round(F.stddev_pop("l_quantity"), 6).alias("sdp_qty"),
            F.round(F.var_pop("l_quantity"), 6).alias("varp_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (SURVEY §2.B grouping sets family)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(dsum("l_quantity", 2).alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@query(
    "agg_cube_with_grouping",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
           CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with GROUPING() markers."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("bigint").alias("g_rf"),
            F.grouping("l_linestatus").cast("bigint").alias("g_ls"),
            dsum("l_extendedprice", 2).alias("sum_price"),
        )
        .select("l_returnflag", "l_linestatus", "g_rf", "g_ls", "sum_price")
        .orderBy(
            "g_rf",
            "g_ls",
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@query(
    "agg_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via Spark SQL (same Catalyst plan family)."""
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


@query(
    "agg_string_agg",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
    """,
)
def agg_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string_agg ≡ sort(collect_list) + array_join."""
    n = t(spark, sf_dir, "nation")
    return (
        n.groupBy("n_regionkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
        )
        .orderBy("n_regionkey")
    )


@query(
    "agg_having",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey
    HAVING COUNT(*) >= 15
    ORDER BY o_custkey
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 15)
        .orderBy("o_custkey")
    )


@query(
    "agg_approx_count_distinct",
    oracle="""
    SELECT TRUE AS parts_within_tol, TRUE AS supps_within_tol
    """,
)
def agg_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ approximate distinct.  The raw estimate differs from
    DuckDB's sketch, so the oracle-checkable output is the *assertion*:
    estimate within ±5% of the exact distinct count (HLL++ rsd default
    0.05).  Both booleans must be true, which DuckDB trivially agrees on —
    this actually verifies the estimator instead of skipping the check."""
    li = t(spark, sf_dir, "lineitem")
    est = li.agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_suppkey").alias("approx_supps"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_suppkey").alias("exact_supps"),
    )
    return est.select(
        F.col("approx_parts").between(
            F.col("exact_parts") * 0.95, F.col("exact_parts") * 1.05
        ).alias("parts_within_tol"),
        F.col("approx_supps").between(
            F.col("exact_supps") * 0.95, F.col("exact_supps") * 1.05
        ).alias("supps_within_tol"),
    )


@query(
    "agg_percentiles",
    oracle="""
    SELECT l_returnflag,
           ROUND(CAST(median(l_quantity) AS DOUBLE), 6) AS med_qty,
           ROUND(quantile_cont(l_extendedprice, 0.25), 6) AS p25_price,
           ROUND(quantile_cont(l_extendedprice, 0.90), 6) AS p90_price
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (Spark `percentile` ≡ DuckDB
    quantile_cont).  approx_percentile is the 100 TB path; exact is the
    oracle-checkable one."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("med_qty"),
            F.round(F.expr("percentile(l_extendedprice, 0.25)"), 6).alias("p25_price"),
            F.round(F.expr("percentile(l_extendedprice, 0.90)"), 6).alias("p90_price"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------


@query(
    "setop_union_all",
    oracle="""
    SELECT k FROM (
      SELECT c_nationkey AS k FROM customer
      UNION ALL
      SELECT s_nationkey AS k FROM supplier
    ) ORDER BY k
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.unionAll(s).orderBy("k")


@query(
    "setop_union_distinct",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    UNION
    SELECT s_nationkey AS k FROM supplier
    ORDER BY k
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.union(s).distinct().orderBy("k")


@query(
    "setop_intersect",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    INTERSECT
    SELECT s_nationkey AS k FROM supplier
    ORDER BY k
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.intersect(s).orderBy("k")


@query(
    "setop_except",
    oracle="""
    SELECT c_nationkey AS k FROM customer
    EXCEPT
    SELECT s_nationkey AS k FROM supplier
    ORDER BY k
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return c.subtract(s).orderBy("k")


@query(
    "setop_intersect_all",
    oracle="""
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
    ORDER BY k
    """,
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k"))
    return a.intersectAll(b).orderBy("k")


@query(
    "setop_except_all",
    oracle="""
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
    ORDER BY k
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k"))
    return a.exceptAll(b).orderBy("k")


@query(
    "distinct_projection",
    oracle="""
    SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
    ORDER BY c_mktsegment, c_nationkey
    """,
)
def distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "customer")
        .select("c_mktsegment", "c_nationkey")
        .distinct()
        .orderBy("c_mktsegment", "c_nationkey")
    )


# ---------------------------------------------------------------------------
# Sorts / limits / offset
# ---------------------------------------------------------------------------


@query(
    "orderby_multikey_nulls",
    oracle="""
    SELECT o_orderkey, o_orderstatus, CAST(o_totalprice AS DOUBLE) AS totalprice
    FROM orders
    ORDER BY o_orderstatus DESC, totalprice ASC NULLS FIRST, o_orderkey
    LIMIT 50
    """,
)
def orderby_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ORDER BY with DESC + NULLS FIRST + total tiebreak."""
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_orderkey", "o_orderstatus", F.col("o_totalprice").alias("totalprice")
        )
        .orderBy(
            F.col("o_orderstatus").desc(),
            F.col("totalprice").asc_nulls_first(),
            "o_orderkey",
        )
        .limit(50)
    )


@query(
    "limit_offset",
    oracle="""
    SELECT o_orderkey FROM orders ORDER BY o_orderkey LIMIT 20 OFFSET 100
    """,
)
def limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey")
        .orderBy("o_orderkey")
        .offset(100)
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Subqueries (SQL-form: correlated subqueries aren't DataFrame-expressible)
# ---------------------------------------------------------------------------


@query(
    "subquery_scalar_uncorrelated",
    oracle="""
    SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS totalprice
    FROM orders
    WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
                          / COUNT(*) * 1.8 FROM orders)
    ORDER BY o_orderkey
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS totalprice
        FROM orders
        WHERE o_totalprice > (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
                              / COUNT(*) * 1.8 FROM orders)
        ORDER BY o_orderkey
        """
    )


@query(
    "subquery_correlated_scalar",
    oracle="""
    SELECT c_custkey,
           (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
    FROM customer
    ORDER BY c_custkey
    """,
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery — Catalyst decorrelates to a left join."""
    register_views(spark, sf_dir, "orders", "customer")
    return spark.sql(
        """
        SELECT c_custkey,
               (SELECT COUNT(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders
        FROM customer
        ORDER BY c_custkey
        """
    )


@query(
    "subquery_in_notin",
    oracle="""
    SELECT p_partkey, p_brand FROM part
    WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
      AND p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_discount > 0.09)
    ORDER BY p_partkey
    """,
)
def subquery_in_notin(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, "part", "lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_brand FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem WHERE l_quantity > 45)
          AND p_partkey NOT IN (SELECT l_partkey FROM lineitem WHERE l_discount > 0.09)
        ORDER BY p_partkey
        """
    )


@query(
    "lateral_explode_tokens",
    oracle="""
    SELECT doc_id, tok
    FROM documents, UNNEST(string_split(text, ' ')) AS u(tok)
    WHERE doc_id < 20 AND tok <> ''
    ORDER BY doc_id, tok
    """,
)
def lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL/UNNEST ≡ explode of split — table function coverage."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .orderBy("doc_id", "tok")
    )


@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_F,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_O,
           COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_P
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT (conditional-aggregate form in the oracle)."""
    o = t(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return (
        piv.select(
            "o_orderpriority",
            F.coalesce(F.col("F"), F.lit(0)).alias("status_F"),
            F.coalesce(F.col("O"), F.lit(0)).alias("status_O"),
            F.coalesce(F.col("P"), F.lit(0)).alias("status_P"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "unpivot_stack",
    oracle="""
    SELECT c_custkey, metric, val FROM (
      SELECT c_custkey,
             CAST(c_acctbal AS DOUBLE) AS acctbal,
             CAST(c_nationkey AS DOUBLE) AS nkey
      FROM customer)
    UNPIVOT (val FOR metric IN (acctbal, nkey))
    ORDER BY c_custkey, metric
    """,
)
def unpivot_stack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT via stack()."""
    c = t(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.expr(
                "stack(2, 'acctbal', CAST(c_acctbal AS DOUBLE),"
                " 'nkey', CAST(c_nationkey AS DOUBLE)) AS (metric, val)"
            ),
        )
        .orderBy("c_custkey", "metric")
    )


@query(
    "agg_approx_percentile",
    oracle="""
    SELECT o_orderstatus,
           TRUE AS p50_within_tol, TRUE AS p95_within_tol
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentiles (Greenwald-Khanna sketch, accuracy=100 →
    max rank error 1%).  Like agg_approx_count_distinct, the sketch
    value is engine-specific, so the oracle-checkable output is the
    ASSERTION: the approximate p50/p95 must sit between the exact
    percentiles at rank ∓2% — true per group, which the oracle trivially
    agrees on, so a broken estimator hash-mismatches."""
    o = t(spark, sf_dir, "orders")
    est = o.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", 0.5, 100).alias("ap50"),
        F.percentile_approx("o_totalprice", 0.95, 100).alias("ap95"),
        F.expr("percentile(o_totalprice, 0.48)").alias("e48"),
        F.expr("percentile(o_totalprice, 0.52)").alias("e52"),
        F.expr("percentile(o_totalprice, 0.93)").alias("e93"),
        F.expr("percentile(o_totalprice, 0.97)").alias("e97"),
    )
    return (
        est.select(
            "o_orderstatus",
            F.col("ap50").between(F.col("e48"), F.col("e52")).alias("p50_within_tol"),
            F.col("ap95").between(F.col("e93"), F.col("e97")).alias("p95_within_tol"),
        )
        .orderBy("o_orderstatus")
    )
