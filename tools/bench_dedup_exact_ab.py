#!/usr/bin/env python
"""A/B the exact-dedup formulations at a large SF (round 15).

dedup_exact sat at 6.6× DuckDB at sf10 (BASELINE.md r15 sweep) with a
"sha2+shuffle floor" verdict.  Two plan-level suspects remain before
that verdict is final:

1. the groupBy+join shape reads the parquet scan and computes the text
   hash TWICE (the aggregate's partial-agg exchange carries (h, min,
   count) rows, which is NOT reusable with the join side's (id, h)
   exchange), where a window over the hash computes them once;
2. sha2-256 is a per-row MessageDigest call; a pair of independent
   xxhash64s (Spark-native, codegen'd) is a 128-bit key at a fraction
   of the CPU.

Variants (same output columns, bit-identical grouping on identical
texts):
  v0  sha2 + groupBy/join   (shipped shape)
  v1  sha2 + window
  v2  xx64-pair + groupBy/join
  v3  xx64-pair + window

Usage:  python tools/bench_dedup_exact_ab.py SF_DIR [runs]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _grouped_join(hashed: DataFrame, keys: list[str], id_col: str) -> DataFrame:
    groups = hashed.groupBy(*keys).agg(
        F.min(id_col).alias("canonical_id"),
        F.count(F.lit(1)).cast("bigint").alias("group_size"),
    )
    return hashed.join(groups, keys).select(
        id_col, "canonical_id", "group_size",
        (F.col(id_col) != F.col("canonical_id")).alias("is_duplicate"),
    )


def _windowed(hashed: DataFrame, keys: list[str], id_col: str) -> DataFrame:
    w = Window.partitionBy(*keys)
    return hashed.select(
        id_col,
        F.min(id_col).over(w).alias("canonical_id"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("group_size"),
    ).withColumn(
        "is_duplicate", F.col(id_col) != F.col("canonical_id")
    )


def variants(docs: DataFrame) -> dict[str, DataFrame]:
    sha = docs.select(
        "doc_id", F.sha2(F.col("text"), 256).alias("__h")
    )
    xx = docs.select(
        "doc_id",
        F.xxhash64("text").alias("__h1"),
        F.xxhash64(F.lit(1), F.col("text")).alias("__h2"),
    )
    return {
        "v0_sha2_join": _grouped_join(sha, ["__h"], "doc_id"),
        "v1_sha2_window": _windowed(sha, ["__h"], "doc_id"),
        "v2_xx_join": _grouped_join(xx, ["__h1", "__h2"], "doc_id"),
        "v3_xx_window": _windowed(xx, ["__h1", "__h2"], "doc_id"),
    }


def main() -> None:
    sf_dir = sys.argv[1]
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from pg_mooncake_spark.session import get_spark
    from pg_mooncake_spark.queries.llm import _docs2

    spark = get_spark("dedup_exact_ab")
    docs = _docs2(spark, sf_dir)
    vs = variants(docs)

    # cross-check: all variants must agree exactly with v0
    base = None
    for name, df in vs.items():
        agg = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("is_duplicate").cast("int")).alias("dups"),
            F.sum("canonical_id").alias("ck"),
            F.sum("group_size").alias("gs"),
        ).collect()[0]
        sig = tuple(agg)
        if base is None:
            base = sig
        print(f"check {name}: {sig} {'OK' if sig == base else 'MISMATCH'}")
        assert sig == base, name

    for name, df in vs.items():
        df.write.format("noop").mode("overwrite").save()  # warm
        walls = []
        for _ in range(runs):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            walls.append(time.time() - t0)
        walls.sort()
        mid = walls[len(walls) // 2]
        print(f"{name}: median {mid:.2f} s  (all: "
              + ", ".join(f"{w:.2f}" for w in walls) + ")")


if __name__ == "__main__":
    main()
