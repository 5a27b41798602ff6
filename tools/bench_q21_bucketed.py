#!/usr/bin/env python
"""TPC-H Q21 over pre-bucketed tables — the named experiment from
VERDICT r12 #5 (q21 is the one join-heavy headline >2× at sf1; the repo
owns the operator that targets exactly this shape).

Q21's plan (queries/tpch_extra.py) already collapses the EXISTS /
NOT-EXISTS self-joins into one groupBy(l_orderkey) — its remaining cost
is the lineitem⋈orders join + the (l_orderkey, l_suppkey) aggregate,
both clustered on l_orderkey.  Bucketing lineitem AND orders on the
order key with equal bucket counts makes the on-disk layout a valid
hash partitioning: the join AND the aggregate plan with zero exchanges
on the fact side (an Exchange only remains for the 6-row tail).

This measures, at a given SF dir:
  1. one-time bucketing write cost (both tables),
  2. q21 wall over plain parquet vs over the bucketed tables
     (median of 3, same session, AQE on — the default config),
  3. fact-side Exchange counts in both plans,
and verifies the two results match row-for-row.

Usage:  python tools/bench_q21_bucketed.py [SF_DIR] [n_buckets]
Env:    SPARK_GRAFT_CPUS (default 32)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def q21_body(li, orders, supp, nat):
    from pyspark.sql import functions as F

    orders = orders.filter(F.col("o_orderstatus") == "F")
    late = F.col("l_shipdate") > F.col("o_orderdate")
    per_os = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pg_mooncake_spark-bench-q21-bucketed")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pg_mooncake_spark.operators.bucketing import write_bucketed

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    supp = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")

    t0 = time.monotonic()
    write_bucketed(
        li, "li_q21b", ["l_orderkey"], n_buckets, sort_cols=["l_orderkey"]
    )
    write_bucketed(
        orders, "o_q21b", ["o_orderkey"], n_buckets, sort_cols=["o_orderkey"]
    )
    t_bucket = time.monotonic() - t0

    def timed(fn, n=3):
        # fn must BUILD the DataFrame fresh each call: re-collecting one
        # DataFrame object lets the DAG scheduler reuse the previous
        # run's shuffle files, which measures only the final stage
        fn()  # warm (JIT, codecs, page cache)
        xs = []
        for _ in range(n):
            t = time.monotonic()
            fn()
            xs.append(time.monotonic() - t)
        return sorted(xs)[n // 2]

    def plain():
        return q21_body(
            spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
            spark.read.parquet(f"{sf_dir}/orders.parquet"),
            supp, nat,
        )

    def bucketed():
        return q21_body(
            spark.table("li_q21b"), spark.table("o_q21b"), supp, nat
        )

    plain_df, buck_df = plain(), bucketed()
    t_plain = timed(lambda: plain().collect())
    t_buck = timed(lambda: bucketed().collect())

    def exchanges(df):
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue().count("Exchange")

    match = sorted(map(tuple, plain_df.collect())) == sorted(
        map(tuple, buck_df.collect())
    )
    print(
        f"sf_dir={sf_dir} n_buckets={n_buckets} rows={li.count()}\n"
        f"bucket_write_s={t_bucket:.2f} (once)\n"
        f"q21_parquet_s={t_plain:.3f} exchanges={exchanges(plain_df)}\n"
        f"q21_bucketed_s={t_buck:.3f} exchanges={exchanges(buck_df)}\n"
        f"speedup={t_plain / t_buck:.2f}x values_match={match}"
    )
    if not match:
        sys.exit(1)


if __name__ == "__main__":
    main()
