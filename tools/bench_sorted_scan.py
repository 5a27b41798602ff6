#!/usr/bin/env python
"""Sorted-mirror file skipping, measured (VERDICT r13 #2).

q1/q6-shape scans are the last headline >2x gaps vs single-node DuckDB,
with plans already minimal.  The engine's answer for the AD-HOC
selective-predicate regime (q6: one-year shipdate range over a 7-year
table) is ``optimize_table('sort:l_shipdate')``: the rewrite range-
clusters files AND records per-file min/max stats for the sort column
in the commit log, so ``table(where=...)`` prunes the FILE LIST
planner-side (reference contract: file statistics & skipping,
reference CHANGELOG.md:26) and the parquet reader's row-group stats
prune what remains executor-side.

Measures, at a given SF (tools/make_scale.py data):
  1. mirror create + optimize('sort:l_shipdate')   — the once-ever cost
  2. q6 over the UNSORTED mirror                   — files read + wall
  3. q6 over the SORTED mirror (stat-pruned scan)  — files read + wall
  and checks 2 == 3 value-for-value.

Timing protocol per determinism rules: the DataFrame is REBUILT inside
every timed iteration (a reused plan re-serves shuffle files); warm
pass then median of N rounds.

Usage:  python tools/bench_sorted_scan.py [SF_DIR]
Env:    SPARK_GRAFT_CPUS (32), SPARK_GRAFT_BENCH_RUNS (3)
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

W = (
    "l_shipdate >= TIMESTAMP '1996-01-01 00:00:00' AND "
    "l_shipdate < TIMESTAMP '1997-01-01 00:00:00'"
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pg_mooncake_spark-bench-sorted-scan")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pg_mooncake_spark.engine import MooncakeEngine
    from pg_mooncake_spark.functions import dsum

    eng = MooncakeEngine(spark, tempfile.mkdtemp(prefix="mooncake_ss_"))
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))

    t0 = time.perf_counter()
    eng.create_table(
        "li_plain", source_df=li,
        primary_key=["l_orderkey", "l_linenumber"],
    )
    create_s = time.perf_counter() - t0
    # same file count both sides so the comparison isolates CLUSTERING,
    # not granularity
    parts = max(16, int(cpus))
    mtp = eng._moontable("li_plain")
    vp = mtp.optimize(target_partitions=parts)
    eng.catalog.update_watermarks("li_plain", flush_version=vp)

    eng.create_table(
        "li_sorted", source_df=li,
        primary_key=["l_orderkey", "l_linenumber"],
    )
    t0 = time.perf_counter()
    mts = eng._moontable("li_sorted")
    vs = mts.optimize(target_partitions=parts, sort_by=["l_shipdate"])
    eng.catalog.update_watermarks("li_sorted", flush_version=vs)
    sort_s = time.perf_counter() - t0

    def q6_over(name: str):
        # predicate split: the range goes through table(where=) so the
        # commit-log stats prune the file list; the residual predicates
        # stay in the DataFrame filter (pushed to parquet row groups)
        return (
            eng.table(name, where=W)
            .filter(F.col("l_discount").between(0.03, 0.07)
                    & (F.col("l_quantity") < 24))
            .agg(
                dsum(
                    F.col("l_extendedprice") * F.col("l_discount"), 6
                ).alias("revenue"),
                F.count(F.lit(1)).alias("n_items"),
            )
        )

    def timed(name: str) -> tuple[float, tuple]:
        q6_over(name).collect()  # warm
        times, row = [], None
        for _ in range(n_runs):
            t1 = time.perf_counter()
            row = q6_over(name).collect()[0]  # rebuilt per iteration
            times.append(time.perf_counter() - t1)
        return statistics.median(times), (row["revenue"], row["n_items"])

    total_plain = len(eng.table("li_plain").inputFiles())
    read_plain = len(eng.table("li_plain", where=W).inputFiles())
    total_sorted = len(eng.table("li_sorted").inputFiles())
    read_sorted = len(eng.table("li_sorted", where=W).inputFiles())

    t_plain, r_plain = timed("li_plain")
    t_sorted, r_sorted = timed("li_sorted")
    assert r_plain == r_sorted, (r_plain, r_sorted)

    print(json.dumps({
        "sf_dir": sf_dir,
        "rows": li.count(),
        "mirror_create_s": round(create_s, 3),
        "sort_optimize_s": round(sort_s, 3),
        "files_plain": f"{read_plain}/{total_plain}",
        "files_sorted": f"{read_sorted}/{total_sorted}",
        "files_read_fraction_sorted": round(read_sorted / total_sorted, 3),
        "q6_unsorted_s": round(t_plain, 3),
        "q6_sorted_s": round(t_sorted, 3),
        "speedup": round(t_plain / t_sorted, 2),
        "revenue": r_plain[0],
        "n_items": r_plain[1],
    }))


if __name__ == "__main__":
    main()
