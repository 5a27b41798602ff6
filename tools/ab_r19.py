"""Round-19 optimization A/B harness.

Times named variant pairs (current registry query vs candidate rewrite)
with the noop sink, warm pass + interleaved rounds (A,B,A,B,...) in ONE
session so monotone host drift hits both variants equally (the r18
protocol).  Values are cross-checked between variants before timing
(sorted collect; ordered collect where the experiment's point is output
order) so a faster-but-wrong rewrite can never look like a win.

Usage: python tools/ab_r19.py <sf_dir> <experiment> [runs]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F


def session(cpus: str = "32") -> SparkSession:
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pg_mooncake_spark-ab19")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.local.dir", "/tmp/ab19_scratch")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def crosscheck(a: DataFrame, b: DataFrame, name: str, ordered: bool = False) -> None:
    ra = list(map(str, a.collect()))
    rb = list(map(str, b.collect()))
    if not ordered:
        ra, rb = sorted(ra), sorted(rb)
    assert ra == rb, f"{name}: variant results differ ({len(ra)} vs {len(rb)} rows)"
    kind = "ordered" if ordered else "values"
    print(f"  {kind} identical ({len(ra)} rows)")


def median(xs: list[float]) -> float:
    s = sorted(xs)
    m = len(s) // 2
    return s[m] if len(s) % 2 else (s[m - 1] + s[m]) / 2


# ---------------------------------------------------------------- variants


def _sort_first_pair(key: str):
    """Registry query (t() applies the under-parallel-scan rebalance, a
    RoundRobin exchange that the sort-first range exchange immediately
    re-shuffles) vs the same pipeline reading the scan directly: the
    range exchange alone spreads the starved scan, so the round-robin
    is a redundant full shuffle of (id, text)."""

    def factory(spark, sf_dir):
        from pg_mooncake_spark.operators import similarity as S
        from pg_mooncake_spark.operators import text as X
        from pg_mooncake_spark.queries.registry import all_queries

        base = lambda: all_queries()[key](spark, sf_dir)

        def raw(table):
            return spark.read.parquet(f"{sf_dir}/{table}.parquet")

        def cand():
            if key == "text_profile_analysis":
                return X.text_profile(
                    raw("documents").orderBy("doc_id"), "text", "doc_id"
                ).select(
                    "doc_id", "n_tokens_ws", "n_tokens_bpe",
                    "mean_token_len", "stopword_ratio", "punct_ratio",
                    "fingerprint",
                )
            if key == "text_quality_scoring":
                return X.text_profile(
                    raw("documents").orderBy("doc_id"), "text", "doc_id"
                )
            if key == "embedding_normalize_quantize":
                return S.normalize_quantize_stats(
                    raw("embeddings").orderBy("vec_id"), "embedding", "vec_id"
                )
            raise KeyError(key)

        return base, cand

    return factory


def q9ne_variants(spark, sf_dir):
    """q9: current (eager per-(order, nation) aggregate between the part
    join and the orders join) vs NO eager aggregate (join the 8M-row
    red-lineitem side straight to orders, aggregate once at the end with
    map-side partials).  The eager agg only shrinks the probe side
    ~1.3:1 while paying a 6M-group hash build."""
    from pg_mooncake_spark.queries.registry import (
        all_queries, hash_join_hint, t, table_rows,
    )

    base = lambda: all_queries()["q9_product_type_profit"](spark, sf_dir)

    amount_d = (
        "(l_extendedprice * (1 - l_discount)"
        " - 0.1D * p_retailprice * l_quantity)"
    )
    amt_expr = (
        f"CAST({amount_d} * 1000000.0D + "
        f"IF({amount_d} >= 0D, 0.5D, -0.5D) AS BIGINT) AS amt"
    )

    def cand():
        li = t(spark, sf_dir, "lineitem")
        orders = t(spark, sf_dir, "orders")
        supp = t(spark, sf_dir, "supplier")
        part = t(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
        nat = t(spark, sf_dir, "nation")
        side = (
            li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
            .selectExpr("l_orderkey", "s_nationkey", amt_expr)
        )
        final = (
            side.join(
                hash_join_hint(
                    orders.select("o_orderkey", "o_orderdate"),
                    table_rows(sf_dir, "orders"),
                ),
                side.l_orderkey == F.col("o_orderkey"),
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

    return base, cand


def topk_variants(spark, sf_dir):
    """topk_per_group: hash exchange (window) + range exchange (trailing
    orderBy, whose sampler re-executes the window subtree) vs ONE range
    exchange on o_custkey serving both — RangePartitioning(o_custkey)
    satisfies the window's clustering, and window order (totalprice
    DESC, orderkey) makes in-partition order = (o_custkey, rn), so the
    trailing sort is order-identical by construction."""
    from pg_mooncake_spark.queries.registry import all_queries, t

    base = lambda: all_queries()["topk_per_group"](spark, sf_dir)

    def cand():
        o = t(spark, sf_dir, "orders")
        w = W.partitionBy("o_custkey").orderBy(
            F.desc("o_totalprice"), "o_orderkey"
        )
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

    return base, cand


def sess_variants(spark, sf_dir):
    """events_sessionization: the trailing orderBy(user_id, session_idx)
    adds a range exchange whose sampler re-executes the sort+2 windows+
    aggregate above the user_id shuffle (the shuffle files are reused,
    the compute is not).  Candidate: range-partition the scan by user_id
    up front — RangePartitioning(user_id) satisfies the window's AND the
    aggregate's clustering — then sortWithinPartitions the (small)
    per-session rollup, so the output arrives in the contract order with
    ONE exchange and no sampler re-execution."""
    from pg_mooncake_spark.operators.sessionize import session_stats
    from pg_mooncake_spark.queries.registry import all_queries, t

    base = lambda: all_queries()["events_sessionization"](spark, sf_dir)

    def cand():
        e = t(spark, sf_dir, "events")
        return session_stats(
            e.repartitionByRange(F.col("user_id")), 30
        ).sortWithinPartitions("user_id", "session_idx")

    return base, cand


def asof_variants(spark, sf_dir):
    """events_asof_join: hash exchange (window) + range exchange
    (trailing orderBy, sampler re-runs the window) vs ONE range
    exchange via asof_join(range_partition=True) + sortWithinPartitions."""
    from pg_mooncake_spark.operators.asof import asof_join
    from pg_mooncake_spark.queries.registry import all_queries, t

    base = lambda: all_queries()["events_asof_join"](spark, sf_dir)

    def cand():
        e = t(spark, sf_dir, "events")
        clicks = e.filter(F.col("event_type") == "click").select(
            "user_id", "ts", "event_id"
        )
        purchases = e.filter(F.col("event_type") == "purchase").select(
            "user_id", "ts", "value"
        )
        joined = asof_join(
            clicks, purchases, on="user_id", ts_col="ts",
            range_partition=True,
        )
        return joined.select(
            "user_id",
            "event_id",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
            F.round("value_r", 6).alias("last_purchase_value"),
        ).sortWithinPartitions("user_id", "event_id")

    return base, cand


EXPERIMENTS = {
    "sess": sess_variants,
    "asof": asof_variants,
    "sf_profile": _sort_first_pair("text_profile_analysis"),
    "sf_quality": _sort_first_pair("text_quality_scoring"),
    "sf_embed": _sort_first_pair("embedding_normalize_quantize"),
    "q9ne": q9ne_variants,
    "topk": topk_variants,
}

ORDERED = {"topk", "sess", "asof"}


def main() -> None:
    sf_dir = sys.argv[1]
    exp = sys.argv[2]
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    spark = session(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    base, cand = EXPERIMENTS[exp](spark, sf_dir)
    print(f"== {exp} @ {sf_dir} ==")
    if os.environ.get("AB_SKIP_CROSSCHECK") == "1":
        print("  crosscheck SKIPPED (env) — verified at smaller SF")
    else:
        crosscheck(base(), cand(), exp, ordered=exp in ORDERED)
    base().write.format("noop").mode("overwrite").save()
    cand().write.format("noop").mode("overwrite").save()
    tb, tc = [], []
    for _ in range(runs):
        for fn, acc in ((base, tb), (cand, tc)):
            spark.catalog.clearCache()
            df = fn()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            acc.append(round(time.perf_counter() - t0, 3))
    print(f"  base rounds: {tb}  median {median(tb):.3f}")
    print(f"  cand rounds: {tc}  median {median(tc):.3f}")
    ratio = median(tb) / max(median(tc), 1e-9)
    print(f"  speedup base/cand: {ratio:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
