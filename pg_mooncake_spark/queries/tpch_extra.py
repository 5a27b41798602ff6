"""TPC-H queries 2, 7, 8, 9, 11, 15, 20, 21 — completing the 22-query suite.

The driver fixtures are TPC-H-ish (FIXTURES.md): there is no ``partsupp``
table and lineitem has no commit/receipt dates, so the queries that depend
on those are adapted (noted per-query) while keeping the *operator shape*
that makes each query interesting:

- q2  — correlated MIN subquery (min-cost supplier per part)
- q7  — self-join of a dimension (two nation roles), year extraction
- q8  — market share: conditional / total aggregation ratio per year
- q9  — profit decomposition, LIKE filter, multi-way join, group by year
- q11 — HAVING against an uncorrelated scalar subquery (global threshold)
- q15 — aggregate view + MAX-equality (top supplier)
- q20 — nested IN subqueries (semi-join chains)
- q21 — EXISTS + NOT EXISTS self-joins on the fact table

Reference parity: these exercise the full-SQL contract of the mirror's
query plane (reference README.md:15-16 — "query … with ordinary SQL",
executed by DuckDB); subquery handling is the Catalyst-side obligation
noted in SURVEY.md §2.B.

Scale notes (100 TB):
- every dimension join (part, supplier, nation, region, customer) is an
  explicit ``F.broadcast`` — lineitem/orders never shuffle for those;
- q21's EXISTS/NOT-EXISTS become two shuffle joins co-partitioned on
  l_orderkey — Catalyst reuses the exchange, so the fact table shuffles
  once, not three times;
- double aggregates go through exact DECIMAL sums (functions.dsum) so
  MIN/MAX-equality comparisons (q2, q15) are engine/order independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pg_mooncake_spark.functions import dsum
from pg_mooncake_spark.queries.registry import (
    hash_join_hint,
    maybe_broadcast,
    table_col_bytes_per_row,
    query,
    t,
    table_rows,
)

_REV = "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE)"


def _rev_col():
    return (
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                "decimal(30,6)"
            )
        ).cast("double")
    )


@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH supply AS (
        SELECT l_partkey, l_suppkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) /
               CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS unit_cost
        FROM lineitem GROUP BY l_partkey, l_suppkey),
    asia_supply AS (
        SELECT supply.*, s_acctbal, s_name, n_name
        FROM supply, supplier, nation, region
        WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_regionkey = r_regionkey AND r_name = 'ASIA')
    SELECT s_acctbal, s_name, n_name, p_partkey, ROUND(unit_cost, 6) AS supply_cost
    FROM part, asia_supply
    WHERE p_partkey = l_partkey AND p_size = 25
      AND unit_cost = (SELECT MIN(a2.unit_cost) FROM asia_supply a2
                       WHERE a2.l_partkey = p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (adapted: no partsupp — supply cost is the average unit
    price each supplier charged for the part across lineitem): for every
    size-25 part, the ASIA supplier(s) offering it at minimum cost.

    The correlated MIN subquery is a window-min over p_partkey — one
    shuffle on partkey instead of a per-row rescan.  The p_size filter
    keeps ~2% of parts, and unit_cost is computed independently per
    (partkey, suppkey) group, so the filter is pushed BELOW the supply
    aggregate as a broadcast semi-join on the fact table: the shuffle
    aggregates ~2% of lineitem instead of all of it.  The oracle runs
    the unpushed form (aggregate everything, filter at the end),
    proving the pushdown equivalent.

    Round-18 optimization: the supply aggregate is explicitly
    repartitioned by l_partkey ALONE before the (l_partkey, l_suppkey)
    groupBy — hashpartitioning(l_partkey) satisfies the aggregate's
    clustered-distribution requirement (a coarser co-partitioning) AND
    the window-min's partitionBy(l_partkey), so the window reuses the
    aggregate's exchange: 2 shuffles → 1.  Measured interleaved A/B at
    sf10: 1.25 s → 1.16 s (1.08×), values identical.
    """
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_size") == 25)
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    supply = (
        li.join(
            F.broadcast(part.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            (dsum("l_extendedprice", 2) / dsum("l_quantity", 2)).alias("unit_cost")
        )
    )
    asia = (
        supply.join(F.broadcast(supp), supply.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    )
    w = Window.partitionBy("l_partkey")
    return (
        asia.join(F.broadcast(part), asia.l_partkey == part.p_partkey)
        .withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            F.round("unit_cost", 6).alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year, {_REV.replace("l_extendedprice * (1 - l_discount)", "volume")} AS revenue
    FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
                 EXTRACT(year FROM l_shipdate) AS l_year,
                 l_extendedprice * (1 - l_discount) AS volume
          FROM supplier, lineitem, orders, customer, nation n1, nation n2
          WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
            AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
            AND c_nationkey = n2.n_nationkey
            AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: bilateral trade volume between two nations by ship year.

    The nation dimension joins twice under different roles (supplier's
    nation vs customer's nation) — both broadcast.  The OR-pair
    predicate only ever accepts rows where BOTH nations are in
    {NATION_1, NATION_2}, so each side's nation dim is pre-filtered to
    those two before its broadcast join: both fact inputs shrink to
    ~2/25 of their rows BEFORE the orderkey shuffle, and only the exact
    cross-pair residual remains post-join (~1.5x faster; the win grows
    with nation count at scale).

    Eager-aggregation (the r15 lever) is a predicted negative here and
    deliberately not applied: pre-aggregating li_side per (l_orderkey,
    supp_nation, l_year) collapses ~0.3 rows per key after the 2/25
    nation filter — below even q3's ~1 row/key, which measured 7.14 s
    vs 3.86 s against the join-first shape (BASELINE.md r15: the lever
    pays iff the aggregate collapses many rows per join key; q13 ~10,
    q10 ~4 ✓; q3/q5/semi ~1 ✗).

    Round-18 optimization: the nation-filtered orders⋈customer side
    projects to (o_orderkey, cust_nation) — ~8% of orders — and is
    broadcast-hinted (size-gated, maybe_broadcast) so the filtered
    lineitem side never shuffles.  Measured interleaved A/B at sf10:
    2.21 s → 2.11 s (1.05×, within noise but the plan sheds both fact
    exchanges — the structural win is what scales), values identical.
    """
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    n1 = nat.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    li_side = li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey).join(
        F.broadcast(n1), supp.s_nationkey == F.col("n1_key")
    )
    ord_side = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .select("o_orderkey", "cust_nation")
    )
    return (
        li_side.join(
            maybe_broadcast(
                ord_side,
                table_rows(sf_dir, "orders") // 12,
                table_col_bytes_per_row(sf_dir, "orders", ["o_orderkey"])
                + table_col_bytes_per_row(sf_dir, "nation", ["n_name"]),
            ),
            li_side.l_orderkey == ord_side.o_orderkey,
        )
        .filter(pair)
        .withColumn("l_year", F.year("l_shipdate").cast("long"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_rev_col().alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "q8_market_share",
    oracle="""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN nation = 'NATION_1' THEN volume
                         ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE) /
                 CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM (SELECT EXTRACT(year FROM o_orderdate) AS o_year,
                 CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)) AS volume,
                 n2.n_name AS nation
          FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
          WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
            AND l_orderkey = o_orderkey AND o_custkey = c_custkey
            AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
            AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
            AND p_type = 'ECONOMY') all_nations
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: NATION_1's share of ECONOMY-part volume sold into
    AMERICA, by order year — conditional/total aggregation ratio.

    Both fact sides are reduced before the orderkey shuffle: the
    ECONOMY part filter broadcasts into lineitem (with supplier/n2),
    and the AMERICA region filter broadcasts into orders (via
    customer/n1).  The orders side is projected to its two surviving
    columns and size-gated (maybe_broadcast, est = orders/5 — the
    AMERICA region keeps 1/5 of customers): genuinely small scales
    broadcast it (no fact exchange at all), past the gate it takes a
    shuffled-hash hint — at sf10 the 3.0M-entry broadcast build
    measured 1.5x WORSE than shuffled-hash while shuffled-hash beat
    the default sort-merge 2.38 -> 2.24 s (three-way interleaved A/B,
    OPTIMIZATION_r18.md)."""
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    part = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = nat.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nat.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(30,6)"
    )
    zero = F.lit(0).cast("decimal(30,6)")
    li_side = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    ord_side = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(reg), F.col("n1_region") == reg.r_regionkey)
        .select("o_orderkey", "o_orderdate")
    )
    return (
        li_side.join(
            maybe_broadcast(
                ord_side,
                table_rows(sf_dir, "orders") // 5,
                table_col_bytes_per_row(
                    sf_dir, "orders", ["o_orderkey", "o_orderdate"]
                ),
            ),
            li_side.l_orderkey == F.col("o_orderkey"),
        )
        .withColumn("o_year", F.year("o_orderdate").cast("long"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("nation") == "NATION_1", vol).otherwise(zero)
                ).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "q9_product_type_profit",
    oracle="""
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
                 CAST(l_extendedprice * (1 - l_discount)
                      - 0.1 * p_retailprice * l_quantity AS DECIMAL(30,6)) AS amount
          FROM part, supplier, lineitem, orders, nation
          WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
            AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
            AND p_name LIKE '%red%') profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (adapted: no partsupp — supply cost proxied as 10% of
    p_retailprice per unit): profit on 'red' parts by supplier nation
    and order year.  LIKE filter + 5-way join + two-level grouping key.

    Join order matters: the broadcast joins against the LIKE-filtered
    part (and supplier/nation) run BEFORE the orders join, so the only
    fact-fact shuffle moves the ~13% of lineitem that survives the part
    filter — broadcast filters are free reducers for later shuffles.

    Eager aggregation (round 15): profit is summed per (l_orderkey,
    n_name) BEFORE the orders join — decimal-exact, so regrouping by
    (nation, year) after the join is value-identical — shrinking both
    the shuffled lineitem side and the join's probe work (~15% at
    sf10, BASELINE.md; the q13/q10 lever at its modest end because
    only ~1.3 red lineitems share an (order, nation) pair).

    Round-18 optimization: at sf10 the planner's size estimate for the
    2-column orders projection still fell under the broadcast
    threshold, so the static plan collected and shipped a 15M-entry
    broadcast hash relation — a pathological build (hundreds of MB on
    the driver and every executor's copy).  The shuffled-hash hint
    (gated on orders' footer rows, hash_join_hint — sf0.1's genuinely
    small broadcast stays) shuffles both sides and hash-builds per
    partition instead.  Plan diff at sf10: BroadcastHashJoin(15M-entry
    build) → ShuffledHashJoin.  Measured interleaved A/B at sf10:
    12.4 s → 5.3 s (2.3×), values identical.
    """
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    supp = t(spark, sf_dir, "supplier")
    part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    nat = t(spark, sf_dir, "nation")
    # Round-18 (second pass): repartition by l_orderkey ALONE before the
    # eager aggregate — the q2 coarser-co-partitioning lever (§2.4).
    # HashPartitioning(l_orderkey) satisfies both the aggregate's
    # clustered distribution on (l_orderkey, nationkey) AND the orders
    # join's on l_orderkey, so ONE exchange serves where the previous
    # plan paid two back-to-back (Exchange under the agg, then a second
    # full Exchange(l_orderkey) of the ~8M-row aggregate feeding the
    # ShuffledHashJoin).  Map-side partial aggregation moves after the
    # shuffle, but q9's partial-agg ratio is only ~1.3 rows/group, so
    # the exchanged bytes barely change while a whole exchange
    # disappears.  Interleaved A/B, values identical: sf10
    # 4.79 → 4.27 s (1.12×), sf0.1 0.89 → 0.83 s.
    #
    # Round-18 (session 3), two exact-arithmetic levers on the same
    # eager aggregate, measured together (interleaved A/B at sf10:
    # 2.99 → 2.48-2.57 s ≈ 1.17×, values identical; sf0.1 0.66 → 0.63):
    # 1. The per-row DECIMAL(30,6) amount is replaced by an exact
    #    micro-unit BIGINT encode (the q1 fast path, sign-aware since
    #    amount can be negative: HALF_UP rounds away from zero, so the
    #    ±0.5 offset follows the sign).  Exact because amount is a
    #    product/difference of 2-decimal columns with <= 6 true
    #    decimals; a per-(order, nation) sum is bounded by the order's
    #    line count, so the long cannot overflow at any scale.  The
    #    final (nation, year) regroup — NOT order-bounded — merges
    #    per-partition long partials exactly in DECIMAL(38,0), q1's
    #    unscale_sum shape.
    # 2. The eager agg groups on s_nationkey (8-byte long) instead of
    #    n_name (~25-byte string); the 25-row nation broadcast attaches
    #    the name AFTER the final aggregate (1:1, names unique), so the
    #    fact exchange and both hash aggregates hash/compare narrow
    #    numeric keys (head-to-head A/B: 2.68 → 2.57 s, 5/6 rounds).
    amount_d = (
        "(l_extendedprice * (1 - l_discount)"
        " - 0.1D * p_retailprice * l_quantity)"
    )
    amt_expr = (
        f"CAST({amount_d} * 1000000.0D + "
        f"IF({amount_d} >= 0D, 0.5D, -0.5D) AS BIGINT) AS amount"
    )
    pre = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .selectExpr("l_orderkey", "s_nationkey", amt_expr)
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "s_nationkey")
        .agg(F.expr("sum(amount) AS amt"))
    )
    final = (
        pre.join(
            hash_join_hint(
                orders.select("o_orderkey", "o_orderdate"),
                table_rows(sf_dir, "orders"),
            ),
            pre.l_orderkey == F.col("o_orderkey"),
        )
        .selectExpr(
            "s_nationkey",
            "CAST(year(o_orderdate) AS BIGINT) AS o_year",
            "amt",
            "spark_partition_id() AS _pid",
        )
        .groupBy("s_nationkey", "o_year", "_pid")
        .agg(F.expr("sum(amt) AS amt_p"))
        .groupBy("s_nationkey", "o_year")
        .agg(
            F.expr(
                "CAST(sum(CAST(amt_p AS DECIMAL(38,0))) / 1000000"
                " AS DOUBLE) AS sum_profit"
            )
        )
    )
    return (
        final.join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .select(F.col("n_name").alias("nation"), "o_year", "sum_profit")
        .orderBy("nation", F.desc("o_year"))
    )


@query(
    "q11_important_stock",
    oracle="""
    SELECT l_partkey AS partkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS part_value
    FROM lineitem, supplier, nation
    WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      AND n_name = 'NATION_3'
    GROUP BY l_partkey
    HAVING CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) >
           (SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) * 0.01
            FROM lineitem, supplier, nation
            WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
              AND n_name = 'NATION_3')
    ORDER BY part_value DESC, partkey
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (adapted: part value = lineitem extended price instead of
    partsupp availqty×supplycost): parts representing >1% of NATION_3
    suppliers' shipped value — HAVING against an uncorrelated scalar
    subquery.

    The filtered fact projection is computed once and reused for both the
    per-part aggregate and the global threshold (two aggregations over one
    scan, not a per-row subquery).
    """
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    filtered = li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey).join(
        F.broadcast(nat), supp.s_nationkey == nat.n_nationkey
    )
    # lazy threshold: 1-row aggregate broadcast-cross-joined onto the
    # per-part aggregate (no eager .first() at plan-build time)
    total = filtered.agg((dsum("l_extendedprice", 2) * 0.01).alias("__threshold"))
    return (
        filtered.groupBy(F.col("l_partkey").alias("partkey"))
        .agg(dsum("l_extendedprice", 2).alias("part_value"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > F.col("__threshold"))
        .drop("__threshold")
        .orderBy(F.desc("part_value"), "partkey")
    )


@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no, {_REV} AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with maximum revenue in 1996Q1 — aggregate
    view consumed twice (per-supplier revenue + global max).

    MAX-equality on doubles is safe because each revenue is an exact
    DECIMAL sum cast once to double (functions.dsum).
    """
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = t(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _rev_col().alias("total_revenue")
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("__max_rev"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("__max_rev"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q20_potential_promotion",
    oracle="""
    SELECT s_name, s_acctbal
    FROM supplier, nation
    WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        WHERE l_partkey IN (SELECT p_partkey FROM part
                            WHERE p_name LIKE 'small%')
          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(30,2))) > 50)
      AND s_nationkey = n_nationkey AND n_regionkey < 3
    ORDER BY s_name
    """,
)
def q20_potential_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (adapted: availability threshold is 'shipped >50 units of
    small parts in 1996' — no partsupp): nested IN subqueries as chained
    semi-joins (part-IN inside supplier-IN)."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    part = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select(F.col("p_partkey").alias("l_partkey"))
    )
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation").filter(F.col("n_regionkey") < 3)
    heavy = (
        li.join(F.broadcast(part), "l_partkey", "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(30,2)")).alias("q"))
        .filter(F.col("q") > 50)
        .select(F.col("l_suppkey").alias("s_suppkey"))
    )
    return (
        supp.join(F.broadcast(heavy), "s_suppkey", "left_semi")
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@query(
    "q21_suppliers_kept_waiting",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders, nation
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F' AND l1.l_shipdate > o_orderdate
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate > o_orderdate)
      AND s_nationkey = n_nationkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_suppliers_kept_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (adapted: 'late' = shipped after the order date — the
    fixture has no commit/receipt dates): suppliers who were the *sole*
    late supplier on a finalized multi-supplier order.

    The naive plan is two lineitem self-joins (EXISTS → left-semi,
    NOT EXISTS → left-anti on l_orderkey), shuffling the fact table three
    times; their probe sides can't even share an exchange because column
    pruning gives them different projections.  Instead we decorrelate by
    hand into ONE groupBy(orderkey): a qualifying l1 row exists iff the
    order has ≥2 distinct suppliers (the EXISTS) and exactly one distinct
    *late* supplier (the NOT EXISTS), and then every late row in the
    order belongs to that supplier — so per-order aggregates carry the
    full answer.  Lineitem shuffles once.  The DuckDB oracle runs the
    literal EXISTS/NOT-EXISTS form, proving the rewrite.

    Round-18 optimization: orders is projected to the 2 columns the
    join actually consumes (o_orderkey, o_orderdate) before the fact
    join, and the join carries a shuffled-hash hint past the
    auto-broadcast range (gated on orders' footer rows,
    hash_join_hint).  At sf10 the static plan had chosen to BROADCAST
    the ~7.3M-row F-status orders side (its size estimate under the
    threshold) — a multi-hundred-MB driver build; the hint replaces it
    with shuffle + per-partition hash build.  Plan diff at sf10:
    BroadcastHashJoin(7.3M-entry build) → ShuffledHashJoin.  Measured
    interleaved A/B at sf10: 7.24 s → 4.12 s (1.75×), values
    identical.
    """
    li = t(spark, sf_dir, "lineitem")
    orders = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    late = F.col("l_shipdate") > F.col("o_orderdate")
    # The two COUNT(DISTINCT l_suppkey) would make Catalyst Expand every
    # fact row 3x before the shuffle; aggregating to (order, supplier)
    # grain first computes the same distinct counts as plain counts over
    # an already-reduced input — one fact-sized shuffle, no Expand.
    per_os = (
        li.join(
            hash_join_hint(orders, table_rows(sf_dir, "orders")),
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.count(F.when(late, True)).alias("late_rows"))
    )
    late_supp = F.col("late_rows") > 0
    per_order = (
        per_os.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_supp"),
            F.count(F.when(late_supp, True)).alias("n_late_supp"),
            F.max(F.when(late_supp, F.col("l_suppkey"))).alias("late_supp"),
            F.sum("late_rows").alias("n_late_rows"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
    )
    return (
        per_order.join(F.broadcast(supp), per_order.late_supp == supp.s_suppkey)
        .join(F.broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy("s_name")
        .agg(F.sum("n_late_rows").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
