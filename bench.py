#!/usr/bin/env python
"""Benchmark harness (driver contract).

Runs the headline query set at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

The headline set covers every engine subsystem: TPC-H relational core
(scan/filter/join/agg/sort), window + grouping-set analytics, and the
LLM-pipeline extensions (minhash dedup, ANN similarity, text profiling,
sessionization).  Each query executes via the "noop" batch sink, which
forces evaluation of EVERY output column without materializing rows on
the driver — .count() would let Catalyst prune the aggregate/projection
expressions and undertime expression-heavy queries.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q10_returned_items",
    "join_semi_customers_with_orders",
    "agg_grouping_sets",
    "window_ranking_family",
    "topk_per_group",
    "dedup_exact",
    "dedup_minhash_pairs_fast",
    "sim_cosine_topk_bruteforce",
    "text_profile_analysis",
    "events_sessionization",
    "events_tumbling_window",
    "events_asof_join",
    "q13_customer_distribution",
    "q18_large_volume_customers",
    "q2_min_cost_supplier",
    "q7_volume_shipping",
    "q9_product_type_profit",
    "q21_suppliers_kept_waiting",
    "delta_roundtrip_lineitem",
    "media_resize_dedup",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # r18 measurement-honesty fix: the bench no longer enables the
    # session-shared dataset cache (SPARK_GRAFT_CACHE_TABLES).  The
    # per-round clearCache() below was *intended* to make every timed
    # query do its own materialization, but a persisted Dataset
    # re-registers its InMemoryRelation lazily on next use (verified:
    # the executed plan shows InMemoryTableScan again right after
    # clearCache()), so within a round every query after the first read
    # base tables from memory instead of parquet.  Timed queries must
    # compute from the parquet inputs; the cache remains available as an
    # engine feature for user workloads, just never under the bench —
    # force it off so a stray env opt-in cannot tilt the timing.
    # (Same-box brackets with/without overlap at sf0.1 — the r05 -18%
    # does not hold on the current query shapes; OPTIMIZATION_r18.md.)
    os.environ.pop("SPARK_GRAFT_CACHE_TABLES", None)

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pg_mooncake_spark-bench")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pg_mooncake_spark.queries.registry import all_queries

    queries = all_queries()

    # Warm pass (untimed): JVM JIT, whole-stage codegen compilation, and
    # first-touch parquet footer reads all land here, so the timed rounds
    # below measure steady-state query throughput rather than charging
    # one-time session costs to whichever query happens to run first.
    # Jobs are labeled (guide §1.5) so the UI/event log attributes every
    # stage to its query when the bench runs with the UI enabled.
    for name in HEADLINE:
        spark.sparkContext.setJobDescription(f"warm: {name}")
        queries[name](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    # Noise armor: the headline value is the PER-QUERY MEDIAN over
    # SPARK_GRAFT_BENCH_RUNS timed rounds (default 5) — a transient
    # machine-load spike inflates one round, not the median — and the
    # artifact carries loadavg before/after so residual contention is
    # diagnosable from the JSON alone (round 5's uniform 1.6× inflation
    # was invisible without it).  Before each round, DataFrame caches the
    # previous round created (e.g. the MinHash signature persist) are
    # dropped so every timed query does its own materialization;
    # JIT/codegen and the OS page cache stay warm, which is the intent.
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5")))
    load_start = os.getloadavg()
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for rnd in range(n_runs):
        spark.catalog.clearCache()
        for name in HEADLINE:
            fn = queries[name]
            spark.sparkContext.setJobDescription(f"bench[{rnd}]: {name}")
            start = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples[name].append(time.perf_counter() - start)
    spark.sparkContext.setJobDescription(None)
    load_end = os.getloadavg()

    def median(xs: list[float]) -> float:
        s = sorted(xs)
        mid = len(s) // 2
        return s[mid] if len(s) % 2 else (s[mid - 1] + s[mid]) / 2

    timings = {name: round(median(xs), 3) for name, xs in samples.items()}
    spread = {
        name: round(max(xs) - min(xs), 3) for name, xs in samples.items()
    }

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "headline_query_set_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf_val,
                "runs": n_runs,
                "spread": spread,
                "loadavg_start": [round(x, 2) for x in load_start],
                "loadavg_end": [round(x, 2) for x in load_end],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
