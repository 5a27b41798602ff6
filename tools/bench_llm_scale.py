#!/usr/bin/env python
"""Scale datapoints for the round-12 LLM-pipeline operators.

VERDICT r12 #4: the 100 TB claims for the persisted MinHash index rest
on plan assertions (DPP + broadcast pinned in tests/test_plans.py);
this adds an order-of-magnitude WALL datapoint.  On a documents corpus
at the given SF directory it measures:

  1. build_minhash_index over the corpus        (once-ever cost)
  2. probe_minhash_index with a small increment (the recurring cost)
     + the shard-pruning fraction the probe achieved (DPP prunes at
       shard-directory granularity: shards the probe hashes into /
       total shards on disk)
  3. the non-incremental alternative: minhash_dedup_pairs over
     corpus ∪ increment (what you'd pay WITHOUT the index, every time)

The point at scale: (2) must stay O(increment) while (3) grows with
the corpus — the ratio is the argument.

The increment is the first ``inc_size`` doc_ids of the make_scale
second tile (doc_id in [STRIDE, STRIDE+inc_size)) so its texts HAVE
duplicates in the corpus (tiled copies); an increment chosen by
``doc_id % k`` would take every tiled copy of a doc with it (the tile
stride is divisible by any small k) and probe against nothing.

Usage:  python tools/bench_llm_scale.py [SF_DIR] [inc_size]
        (defaults /root/testdata/sf0.1, 500)
Env:    SPARK_GRAFT_CPUS (default 32)
"""
from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    inc_size = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    stride = 100_000_000  # tools/make_scale.py STRIDE

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("pg_mooncake_spark-bench-llm-scale")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pg_mooncake_spark.operators.dedup import (
        _banded,
        build_minhash_index,
        minhash_dedup_pairs,
        minhash_signature,
        probe_minhash_index,
        read_minhash_index_meta,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    has_tiles = docs.filter(f"doc_id >= {stride}").limit(1).count() > 0
    if has_tiles:
        lo, hi = stride, stride + inc_size
    else:  # plain sf dir: take the tail of the id range as the increment
        hi = docs.agg(F.max("doc_id")).first()[0] + 1
        lo = hi - inc_size
    corpus = docs.filter(f"doc_id < {lo} OR doc_id >= {hi}")
    increment = docs.filter(f"doc_id >= {lo} AND doc_id < {hi}").select(
        (F.col("doc_id") + 500_000_000).alias("doc_id"), "text"
    )
    n_corpus, n_inc = corpus.count(), increment.count()
    path = os.path.join(
        tempfile.mkdtemp(prefix="llm_scale_ix_"), "mh_index"
    )

    t0 = time.monotonic()
    build_minhash_index(corpus, path, "text", "doc_id")
    t_build = time.monotonic() - t0

    meta = read_minhash_index_meta(spark, path)
    n_shards = int(meta["n_shards"])

    # shard-pruning fraction: DPP skips every shard directory the probe
    # has no band hash in
    probe_shards = (
        _banded(
            minhash_signature(
                increment, "text", "doc_id",
                int(meta["num_hashes"]), int(meta["shingle_k"]),
            ),
            "doc_id", int(meta["num_hashes"]), int(meta["bands"]), n_shards,
        )
        .select("shard").distinct().count()
    )

    t0 = time.monotonic()
    hits = probe_minhash_index(
        spark, path, increment, "text", "doc_id", threshold=0.9
    )
    n_hits = hits.count()
    t_probe = time.monotonic() - t0

    # the no-index alternative at the same freshness: all-pairs LSH over
    # corpus ∪ increment, filtered to pairs touching the increment
    # (SPARK_GRAFT_SKIP_FULL=1 skips it for pruning-only runs)
    if os.environ.get("SPARK_GRAFT_SKIP_FULL"):
        t_full, n_pairs = float("nan"), -1
    else:
        union = corpus.select("doc_id", "text").unionByName(increment)
        t0 = time.monotonic()
        pairs = minhash_dedup_pairs(union, "text", "doc_id", threshold=0.9)
        n_pairs = pairs.filter(
            "id_a >= 500000000 OR id_b >= 500000000"
        ).count()
        t_full = time.monotonic() - t0

    print(
        f"sf_dir={sf_dir} corpus={n_corpus} increment={n_inc}\n"
        f"index_build_s={t_build:.2f} (once)\n"
        f"probe_s={t_probe:.2f} hits={n_hits} "
        f"shards_touched={probe_shards}/{n_shards} "
        f"(pruning reads {probe_shards / n_shards:.0%} of index dirs)\n"
        f"full_pairs_s={t_full:.2f} increment_pairs={n_pairs} "
        f"(the per-increment cost WITHOUT the index)\n"
        f"recurring_speedup={t_full / t_probe:.1f}x"
    )


if __name__ == "__main__":
    main()
