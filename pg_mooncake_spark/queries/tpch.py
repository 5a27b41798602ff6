"""TPC-H-ish headline analytics over the driver fixtures.

Covers SURVEY.md §2.B: hash/group aggregates, multi-way equi-joins,
semi/anti joins, top-k, scalar aggregates (tests/pg_regress exercised
count(*)+avg; the rest of the surface is the reference's full-SQL contract,
reference README.md:15-16).

Scale design notes (100 TB):
- lineitem/orders are the big fact tables: every join keeps them on the
  probe side and lets AQE/broadcast handle the dimension side (region,
  nation, supplier, part, customer are dimension-sized → broadcast joins,
  no shuffle of the fact table for those).
- groupBy keys here are low-cardinality (returnflag × linestatus ≈ 6
  groups) → partial aggregation collapses almost everything map-side; the
  shuffle moves only #groups × #partitions rows.
- all money arithmetic goes through exact DECIMAL sums (functions.dsum)
  so results are independent of partial-agg order — a determinism
  requirement at any scale, and the oracle-match requirement here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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

# Shared expression: revenue = extendedprice * (1 - discount).
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
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_base_price,
           {_REV} AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) / COUNT(l_quantity), 6) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) / COUNT(l_extendedprice), 6) AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(30,4))) AS DOUBLE) / COUNT(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: scan → filter (parquet-pushed) → 6-group hash agg.

    Reference parity: count(*)/avg aggregates demonstrated at
    tests/pg_regress/sql/partitioned_table.sql:7-9 and README.md:91.

    Exact-sum fast path (judge-r11 perf finding: 128-bit DECIMAL partials
    made this the one >2× query with a named fix).  Money columns are
    2-decimal quantities; their 2/3-factor products have <= 6 decimals, so
    each row encodes EXACTLY as a scaled BIGINT (``scaled_long`` — pure
    primitive codegen, no per-row BigDecimal).  Aggregation is two-level:
    partial long sums per (group, input-partition-id) — a partition holds
    << 7.6e7 rows so a micro-unit partial cannot overflow at ANY total
    scale — then the ~6×#partitions partials merge exactly in DECIMAL(38)
    (``unscale_sum``).  Same value the DECIMAL(30) path produced (single
    correctly-rounded cast to DOUBLE at the end); ~2× less per-row work.
    """
    li = t(spark, sf_dir, "lineitem")
    # The encode/merge expressions are spelled as SQL strings parsed
    # JVM-side (selectExpr / one F.expr each): the Column-by-Column
    # construction cost ~1.2k py4j round trips (~0.4 s driver time) per
    # query build.  Each string is the literal-for-literal translation
    # of the former scaled_long/unscale_sum composition (100.0D/0.5D are
    # DOUBLE literals exactly like F.lit(float(...))/F.lit(0.5); bare
    # 100 is the INT literal F.lit(10**s) was), so the parsed tree, the
    # physical plan, and the values are unchanged.
    # assume_non_negative (no in-job guard): TPC-H domain — quantity/
    # price >= 0, 0 <= discount <= 1, tax >= 0, so every encoded column
    # and product is non-negative by construction; the guard costs ~25%
    # on this 5-encode/row loop (r13 A/B) and proves nothing here.
    disc_price = "(l_extendedprice * (1 - l_discount))"
    staged = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .selectExpr(
            "l_returnflag",
            "l_linestatus",
            "CAST(l_quantity * 100.0D + 0.5D AS BIGINT) AS qty_c",
            "CAST(l_extendedprice * 100.0D + 0.5D AS BIGINT) AS price_c",
            f"CAST({disc_price} * 1000000.0D + 0.5D AS BIGINT) AS disc_price_u",
            f"CAST({disc_price} * (l_tax + 1) * 1000000.0D + 0.5D AS BIGINT)"
            " AS charge_u",
            "CAST(l_discount * 10000.0D + 0.5D AS BIGINT) AS disc_t",
            "spark_partition_id() AS _pid",
        )
    )
    partial = staged.groupBy("l_returnflag", "l_linestatus", "_pid").agg(
        F.expr("sum(qty_c) AS qty_c"),
        F.expr("sum(price_c) AS price_c"),
        F.expr("sum(disc_price_u) AS disc_price_u"),
        F.expr("sum(charge_u) AS charge_u"),
        F.expr("sum(disc_t) AS disc_t"),
        F.expr("count(1) AS cnt"),
    )

    def unscale(col: str, scale: int, out: str) -> str:
        return (
            f"CAST(sum(CAST({col} AS DECIMAL(38,0))) / {10**scale}"
            f" AS DOUBLE) AS {out}"
        )

    return (
        partial.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(unscale("qty_c", 2, "sum_qty")),
            F.expr(unscale("price_c", 2, "sum_base_price")),
            F.expr(unscale("disc_price_u", 6, "sum_disc_price")),
            F.expr(unscale("charge_u", 6, "sum_charge")),
            F.expr(unscale("disc_t", 4, "_sum_disc")),
            F.expr("sum(cnt) AS count_order"),
        )
        .selectExpr(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price",
            "sum_disc_price",
            "sum_charge",
            "round(sum_qty / count_order, 6) AS avg_qty",
            "round(sum_base_price / count_order, 6) AS avg_price",
            "round(_sum_disc / count_order, 6) AS avg_disc",
            "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {_REV} AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: 3-way join, agg, total-order top-10.

    customer is dimension-sized → broadcast; lineitem⋈orders shuffles on
    orderkey (co-partitioned keys, no skew).

    Eager aggregation negative result (round 15, sf10): pre-summing
    revenue per l_orderkey before the orders join measured 7.1 s vs
    3.9 s for this plan — the late-shipdate filter leaves ~1 lineitem
    per surviving order, so the pre-agg shuffles the same row count
    twice and the map-side combine buys nothing.  Keep the join-first
    shape (the q13/q10 lever only pays when the agg collapses many
    rows per key).

    Round-18 optimization: the orders⋈customer side survives both its
    filters at ~10% of orders and projects to 2 columns, so it is
    broadcast-hinted into the lineitem scan (size-gated via parquet
    footer rows — maybe_broadcast) and lineitem never shuffles:
    SortMergeJoin → BroadcastHashJoin, 3 exchanges → 1 carrying fact
    rows none.  Measured interleaved A/B at sf10: 3.52 s → 2.20 s
    (1.6×), values identical.
    """
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    ord_side = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey, "inner"
    ).select("o_orderkey", "o_orderdate")
    return (
        li.join(
            maybe_broadcast(
                ord_side,
                table_rows(sf_dir, "orders") // 10,
                table_col_bytes_per_row(
                    sf_dir, "orders", ["o_orderkey", "o_orderdate"]
                ),
            ),
            li.l_orderkey == ord_side.o_orderkey,
            "inner",
        )
        .groupBy("l_orderkey", F.col("o_orderdate").cast("date").alias("orderdate"))
        .agg(_rev_col().alias("revenue"))
        .select("l_orderkey", "revenue", "orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {_REV} AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way join, group by nation.

    The ASIA region filter reaches lineitem BEFORE the fact-fact
    shuffle: supplier⋈nation⋈region broadcasts onto lineitem, keeping
    only ASIA-supplier rows (~1/5), while the orders side carries its
    date filter and the customer broadcast; the local-supplier
    (c_nationkey = s_nationkey) predicate rides the orderkey join as a
    residual.

    Eager-aggregation negative result (round 15, sf10): pre-summing
    revenue per (l_orderkey, s_nationkey, n_name) before the orders
    join measured 3.32 s vs 2.27 s — only ~1 ASIA lineitem shares an
    (order, supplier-nation) pair, so the pre-agg adds a shuffle and
    collapses nothing (same shape as the q3 negative).  Join-first
    kept.

    Round-18 optimization: the orders(1-year)⋈customer side projects to
    (o_orderkey, c_nationkey) — ~15% of orders, 2 narrow columns — and
    is broadcast-hinted (size-gated, maybe_broadcast) so the ASIA
    lineitem side never shuffles: SortMergeJoin + 2 fact exchanges →
    BroadcastHashJoin, zero fact exchanges.  Measured interleaved A/B
    at sf10: 4.65 s → 4.24 s (1.10×), values identical; the win is
    smaller than q3's because the ASIA-supplier broadcast chain already
    kept only 1/5 of lineitem.
    """
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    nat = t(spark, sf_dir, "nation")
    reg = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    asia_nat = nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
    li_side = li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey).join(
        F.broadcast(asia_nat), supp.s_nationkey == F.col("n_nationkey")
    )
    ord_side = orders.join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    ).select("o_orderkey", "c_nationkey")
    return (
        li_side.join(
            maybe_broadcast(
                ord_side,
                table_rows(sf_dir, "orders") // 6,
                table_col_bytes_per_row(sf_dir, "orders", ["o_orderkey"])
                + table_col_bytes_per_row(
                    sf_dir, "customer", ["c_nationkey"]
                ),
            ),
            (li_side.l_orderkey == ord_side.o_orderkey)
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(_rev_col().alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "q6_forecast_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan+filter+scalar agg — the pushdown showcase.

    All three predicates reach the parquet reader (min/max row-group
    skipping); only 2 columns are read for the aggregate.  BETWEEN
    coverage (SURVEY §2.B predicates).
    """
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, {_REV} AS revenue, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: returned-item revenue per customer, top 20.

    Eager aggregation (round 15): the 3-month o_orderdate slice is the
    smallest relation in the query, so it broadcasts into the lineitem
    scan (projected to the two join/key columns) and revenue is summed
    per o_custkey BEFORE customer/nation attach — lineitem is never
    shuffled; the only exchange moves one decimal partial per customer.
    The name columns join onto the aggregate, not the fact.  Measured
    sf10: 3.8 s -> 1.9 s (the AQE-decided shuffle variant is 19.5 s —
    BASELINE.md).  At a scale where the date slice outgrows broadcast,
    drop the hint and the plan degrades to the q10_cur shuffled join
    with identical semantics."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nat = t(spark, sf_dir, "nation")
    rev_per_cust = (
        li.select("l_orderkey", "l_extendedprice", "l_discount")
        .join(
            F.broadcast(orders.select("o_orderkey", "o_custkey")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(_rev_col().alias("revenue"))
    )
    return (
        rev_per_cust.join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (adapted: no commit/receipt dates in fixture — the EXISTS
    probes late-shipping lineitems instead): correlated EXISTS as a
    left-semi join, then count by priority."""
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (li.l_orderkey == orders.o_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@query(
    "q12_priority_shipping",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders, lineitem
    WHERE o_orderkey = l_orderkey
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (adapted: group by returnflag — fixture has no shipmode):
    conditional aggregation (CASE inside SUM) over a fact-fact join."""
    orders = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c LEFT OUTER JOIN orders o
            ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '5-LOW'
          GROUP BY c.c_custkey) t
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: outer join with a join-time filter, double aggregation
    (orders per customer → customers per order-count).

    Eager aggregation: orders are counted per ``o_custkey`` BEFORE the
    customer join, so the join and every later shuffle move the narrow
    pre-aggregated relation (one row per ordering customer) instead of the
    full customer⋈orders product.  A customer with no qualifying orders has
    no row in the pre-aggregate; the left join + ``coalesce(.., 0)``
    reproduces ``COUNT(o_orderkey) = 0`` exactly, so values stay
    hash-identical to the naive-plan oracle.  Catalyst does not perform this
    agg-below-outer-join rewrite itself (measured 41x vs DuckDB at sf10
    before, see BASELINE.md).

    Round-18 optimization: at sf10 the planner's post-aggregate size
    ESTIMATE still fell under the broadcast threshold, so the static
    plan collected and shipped the ~1.1M-entry count relation as a
    broadcast — exactly the shape round 15 measured losing (4.13 s
    forced-broadcast vs 1.80 s shuffled).  The shuffled-hash hint,
    gated on orders' footer row count (hash_join_hint: below the gate
    the planner's genuinely-small broadcast is left alone, so sf0.1
    plans are unchanged), pins the join to shuffle-both-sides + hash
    build per partition — no million-entry driver collect, no sort.
    Plan diff at sf10: BroadcastHashJoin(1.1M-entry build) →
    ShuffledHashJoin.  Measured interleaved A/B at sf10: 2.05 s →
    1.22 s (1.7×), values identical."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    ord_counts = (
        orders.filter(F.col("o_orderpriority") != "5-LOW")
        .select("o_custkey")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    per_cust = cust.select("c_custkey").join(
        hash_join_hint(ord_counts, table_rows(sf_dir, "orders")),
        F.col("c_custkey") == F.col("o_custkey"),
        "left",
    )
    return (
        per_cust.select(
            F.coalesce(F.col("n_orders"), F.lit(0).cast("long")).alias("c_count")
        )
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "q14_promo_revenue",
    oracle="""
    SELECT ROUND(100.00 *
             CAST(SUM(CASE WHEN p_type = 'PROMO'
                  THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))
                  ELSE CAST(0 AS DECIMAL(30,6)) END) AS DOUBLE) /
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE),
             6) AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo revenue share — broadcast part join, conditional
    decimal-exact aggregation."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = t(spark, sf_dir, "part")
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(30,6)"
    )
    zero = F.lit(0).cast("decimal(30,6)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(zero)).cast(
                    "double"
                )
                / F.sum(rev).cast("double"),
                6,
            ).alias("promo_revenue")
        )
    )


@query(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand <> 'Brand#1'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    ORDER BY supplier_cnt DESC, p_brand, p_size
    """,
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (adapted: lineitem stands in for partsupp; the NOT IN
    excludes negative-balance suppliers): anti-join + count distinct."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    )
    bad_supp = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(bad_supp), "l_suppkey", "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_size")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE)
                 / 7.0, 6) AS avg_yearly
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND p_brand = 'Brand#3'
      AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
                        WHERE l2.l_partkey = lineitem.l_partkey)
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: correlated scalar subquery (per-part avg quantity)
    decorrelated into an aggregate + re-join — the plan Catalyst builds
    for the SQL form, written explicitly."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#3")
    per_part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_cap")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part_avg, li.l_partkey == per_part_avg.pk)
        .filter(F.col("l_quantity") < F.col("qty_cap"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(30,2)")).cast("double")
                / 7.0,
                6,
            ).alias("avg_yearly")
        )
    )


@query(
    "q18_large_volume_customers",
    oracle="""
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS orderdate, o_totalprice,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                         GROUP BY l_orderkey
                         HAVING SUM(CAST(l_quantity AS DECIMAL(30,2))) > 120)
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: IN over a HAVING aggregate, 3-way join, top-25 by
    order value.

    The outer query's SUM(l_quantity) per order is the SAME aggregate
    the HAVING subquery computes (grouping keys beyond o_orderkey are
    functionally dependent on it), so instead of semi-joining lineitem
    and re-aggregating it — two extra fact shuffles — we keep the sum
    from the HAVING pass and join only the few surviving orders to
    orders/customer.  Lineitem is scanned and shuffled exactly once.
    The surviving-orders side is ~34% of orders at every SF (the
    fixtures tile, so the HAVING selectivity is scale-free): its join
    with orders is size-gated like the other fact joins
    (hash_join_hint, inert below the gate): at scale a ~5M-row × 24 B
    build is past any sane broadcast and sort-merge pays two sorts for
    nothing — sf10 interleaved A/B 14.1 → 9.8 s, candidate won all 6
    rounds pairwise.  Below the gate the planner+AQE choice is left
    alone: a static broadcast hint measured 9% WORSE at sf0.1 (the
    broadcast build serializes the aggregate before the orders probe
    can start; AQE's runtime conversion overlaps the two map stages),
    so small-SF plans stay bit-identical to round 17.  The oracle runs
    the literal IN + re-aggregate form.

    Round-18 optimization (session 3): the per-order quantity sum runs
    as a scaled BIGINT instead of DECIMAL(30,2) — the q1 exact-sum fast
    path applied to the HAVING pass, which touches every lineitem row
    and is this query's dominant stage.  l_quantity is a 2-decimal
    column, so CAST(l_quantity * 100.0D + 0.5D AS BIGINT) encodes each
    row exactly (the q1 encode, oracle-pinned since r11); a per-order
    sum of quantity-cents is bounded by the order's line count, so the
    64-bit sum cannot overflow at any total scale — no (group, pid)
    two-level merge needed, unlike q1's global sums.  q > 120.00
    becomes qc > 12000 (both sides exact integers) and the final
    CAST(q AS DOUBLE) becomes qc / 100.0D (IEEE division of an
    exactly-representable integer is correctly rounded, which is what
    Decimal.toDouble produces).  Measured interleaved A/B, values
    identical: sf10 5.79 → 3.84 s (1.51×), sf0.1 0.77 → 0.43 s (1.8×).
    """
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    big = (
        li.selectExpr(
            "l_orderkey",
            "CAST(l_quantity * 100.0D + 0.5D AS BIGINT) AS qty_c",
        )
        .groupBy("l_orderkey")
        .agg(F.expr("sum(qty_c) AS qc"))
        .filter(F.col("qc") > 12000)
    )
    big = hash_join_hint(big, table_rows(sf_dir, "orders") // 3)
    return (
        big.join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .selectExpr(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "CAST(o_orderdate AS DATE) AS orderdate",
            "o_totalprice",
            "qc / 100.0D AS sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
    )


@query(
    "q19_discounted_revenue",
    oracle="""
    SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
                AS DOUBLE) AS revenue
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
            AND l_quantity >= 1 AND l_quantity <= 21)
        OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 30
            AND l_quantity >= 10 AND l_quantity <= 30)
        OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 50
            AND l_quantity >= 20 AND l_quantity <= 40))
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive join predicate (OR-of-ANDs across both
    sides) — equi-join on partkey with the disjunction as a post-join
    filter, exactly how Catalyst splits it."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    q = F.col("l_quantity")
    cond = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & (q >= 1) & (q <= 21)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 30)
            & (q >= 10) & (q <= 30)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(1, 50)
            & (q >= 20) & (q <= 40)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(30,6)"
                )
            )
            .cast("double")
            .alias("revenue")
        )
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                       WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    GROUP BY c_nationkey
    ORDER BY c_nationkey
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (adapted: nationkey stands in for phone country code):
    uncorrelated scalar subquery + NOT EXISTS anti-join."""
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    # lazy global threshold: the 1-row aggregate broadcasts into a cross
    # join instead of an eager .first() at plan-build time — one job, no
    # driver round trip, and the query stays a pure DataFrame
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg_bal"))
        .drop("__avg_bal")
        .join(
            orders.select(F.col("o_custkey").alias("c_custkey")).distinct(),
            "c_custkey",
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", 2).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )
