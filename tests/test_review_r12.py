"""Round-12 review tests: exact-sum fast path (scaled_long/unscale_sum).

The q1 fast path replaces per-row DECIMAL(30) casts with scaled BIGINT
encoding (judge-r11 perf finding).  Its correctness contract is exact
equality with the DECIMAL path for doubles that store decimal quantities
of <= `scale` fractional digits — pin that equivalence here on values
chosen to sit near rounding boundaries.
"""

from __future__ import annotations

from decimal import Decimal

import pyspark.sql.functions as F
import pytest

from pg_mooncake_spark.functions import dsum, scaled_long, unscale_sum


def _decimal_vals(scale: int, n: int = 400) -> list[float]:
    # n decimal values with exactly `scale` fractional digits, including
    # .5-boundary-adjacent cases like x.995 / x.005 at scale 2.
    out = []
    for i in range(n):
        units = i * 7919 + (10**scale // 2) * (i % 3)  # hits ...5 endings
        out.append(float(Decimal(units) / (10**scale)))
    return out


@pytest.mark.parametrize("scale", [2, 4, 6])
def test_scaled_long_matches_decimal_cast(spark, scale):
    vals = _decimal_vals(scale)
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = df.select(
        scaled_long("x", scale).alias("fast"),
        (F.col("x").cast(f"decimal(30,{scale})") * (10**scale))
        .cast("long")
        .alias("exact"),
    )
    mismatch = got.filter(F.col("fast") != F.col("exact")).count()
    assert mismatch == 0


def test_unscale_sum_matches_dsum(spark):
    # Two-level long-partial aggregation == single-level DECIMAL(30) sum,
    # including the product columns q1 uses (<= 6 fractional digits).
    vals = [(p, d) for p in _decimal_vals(2, 120) for d in (0.0, 0.04, 0.1)]
    df = spark.createDataFrame(vals, "price double, disc double")
    prod = F.col("price") * (1 - F.col("disc"))
    staged = df.select(
        scaled_long(prod, 6).alias("u"), F.spark_partition_id().alias("p")
    )
    fast = (
        staged.groupBy("p")
        .agg(F.sum("u").alias("u"))
        .agg(unscale_sum("u", 6).alias("s"))
        .collect()[0]["s"]
    )
    exact = df.agg(dsum(prod, 6).alias("s")).collect()[0]["s"]
    assert fast == exact
