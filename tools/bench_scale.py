#!/usr/bin/env python
"""Spark vs DuckDB-oracle wall-times at an arbitrary SF directory.

Validates BASELINE.md's driver-floor amortization claim (VERDICT r10
task 3): at sf0.1 Spark's fixed ~0.2-0.5 s/query scheduling floor
dominates, and the whole perf verdict rests on that floor amortizing
as data grows.  This runs a query subset at a larger SF (see
tools/make_scale.py) in BOTH engines and prints the per-query
wall-times plus the Spark/DuckDB ratio, so the ratio trend vs sf0.1
is an in-repo fact rather than an argument.

Protocol mirrors bench.py (warm pass, then median of N timed rounds,
noop sink so every output column evaluates) and BASELINE.md's DuckDB
anchor (same oracle SQL the correctness gate runs, fetchall-timed,
threads=SPARK_GRAFT_CPUS for symmetry).  DuckDB queries exceeding
--cap seconds are interrupted and reported as ">cap".

Usage:  python tools/bench_scale.py SF_DIR [query ...]
Env:    SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_RUNS (3),
        SPARK_GRAFT_ORACLE_CAP (seconds, default 300)
"""
from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "q21_suppliers_kept_waiting",
    "text_profile_analysis",
    "dedup_minhash_pairs_fast",
    "events_sessionization",
]


def median(xs: list[float]) -> float:
    s = sorted(xs)
    mid = len(s) // 2
    return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2:] or DEFAULT_QUERIES
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    cap = float(os.environ.get("SPARK_GRAFT_ORACLE_CAP", "300"))
    # r18 measurement-honesty fix (mirrors bench.py): no base-table
    # dataset cache under measurement — a persisted Dataset lazily
    # re-registers its InMemoryRelation even after clearCache(), so
    # timed Spark queries were reading memory while the DuckDB side of
    # this comparison read parquet.  Ratios produced before r18 carried
    # that benefit on the Spark side.  Forced off (not just un-defaulted)
    # so a stray env opt-in cannot tilt the comparison.
    os.environ.pop("SPARK_GRAFT_CACHE_TABLES", None)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pg_mooncake_spark-bench-scale")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry
    from pg_mooncake_spark.queries.registry import all_queries

    queries = all_queries()
    oracles = entry.oracle_sql()

    # ---- Spark side: warm pass, then median of timed rounds
    for name in names:
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    spark_t: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(n_runs):
        spark.catalog.clearCache()
        for name in names:
            t0 = time.perf_counter()
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            spark_t[name].append(time.perf_counter() - t0)

    # ---- DuckDB side: same SQL the correctness oracle runs, in a
    # SUBPROCESS that exits per query (VERDICT r15 task #6): an
    # in-process oracle holding gigabytes of buffer shares the
    # allocator/page cache with the JVM for the rest of the session, and
    # the recorded q9 ratio was inflated by exactly that — the harness
    # must not tax the thing it measures.
    import subprocess

    duck_t: dict[str, object] = {}
    for name in names:
        sql = oracles.get(name)
        if sql is None:
            duck_t[name] = None
            continue
        script = (
            "import json, sys, time, threading, duckdb\n"
            f"cap = {cap!r}\n"
            f"n_runs = {n_runs!r}\n"
            f"cpus = {cpus!r}\n"
            f"sf_dir = {sf_dir!r}\n"
            f"tables = {list(__import__('pg_mooncake_spark.queries.registry', fromlist=['TABLES']).TABLES)!r}\n"
            "sql = sys.stdin.read()\n"
            "con = duckdb.connect()\n"
            "con.execute(f'SET threads={cpus}')\n"
            "con.execute(\"SET TimeZone='UTC'\")\n"
            "for t in tables:\n"
            "    con.execute(\n"
            "        f\"CREATE VIEW {t} AS SELECT * FROM "
            "'{sf_dir}/{t}.parquet'\"\n"
            "    )\n"
            "runs, capped = [], False\n"
            "for _ in range(n_runs):\n"
            "    timer = threading.Timer(cap, con.interrupt)\n"
            "    timer.start()\n"
            "    t0 = time.perf_counter()\n"
            "    try:\n"
            "        con.execute(sql).fetchall()\n"
            "        runs.append(time.perf_counter() - t0)\n"
            "    except duckdb.InterruptException:\n"
            "        capped = True\n"
            "        break\n"
            "    finally:\n"
            "        timer.cancel()\n"
            "print(json.dumps({'runs': runs, 'capped': capped}))\n"
        )
        proc = subprocess.run(
            [sys.executable, "-c", script],
            input=sql, capture_output=True, text=True,
            timeout=cap * n_runs + 120,
        )
        if proc.returncode != 0:
            duck_t[name] = None
            continue
        res = json.loads(proc.stdout.strip().splitlines()[-1])
        duck_t[name] = (
            f">{cap:g}" if res["capped"]
            else round(median(res["runs"]), 3)
        )

    # One-line JSON in the same shape as bench.py (metric/value/unit/
    # queries/sf — VERDICT r18 item 3: the scale probe must be driver-
    # reproducible and comparable), plus the DuckDB-oracle wall-times
    # and ratios this tool exists to report.
    sf_tag = sf_dir.rstrip("/").rsplit("sf", 1)[-1].rstrip("data")
    try:
        sf_val: float | str = float(sf_tag)
    except ValueError:
        sf_val = sf_dir
    spark_med = {n: round(median(spark_t[n]), 3) for n in names}
    detail: dict[str, object] = {}
    for name in names:
        s = spark_med[name]
        d = duck_t[name]
        ratio = (
            round(s / d, 2) if isinstance(d, float) and d > 0 else None
        )
        detail[name] = {"spark": s, "duckdb": d, "ratio": ratio}
    print(
        json.dumps(
            {
                "metric": "scale_probe_query_set_total",
                "value": round(sum(spark_med.values()), 3),
                "unit": "sec",
                "queries": spark_med,
                "sf": sf_val,
                "sf_dir": sf_dir,
                "runs": n_runs,
                "cpus": int(cpus),
                "duckdb": detail,
                "loadavg": [round(x, 2) for x in os.getloadavg()],
            }
        )
    )


if __name__ == "__main__":
    main()
