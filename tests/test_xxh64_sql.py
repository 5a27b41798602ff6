"""Differential pin: the generated DuckDB XXH64 SQL must equal Spark's
``F.xxhash64`` bit-for-bit on every shape the operators use — string
hashing (all length regimes: empty, sub-word, 4-byte chunk, 8-byte
words, 32-byte stripes, multi-stripe, unicode multi-byte), long hashing,
and the long→int seed chain of ``F.xxhash64(col, F.lit(i))``."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from pg_mooncake_spark.queries.xxh64_sql import (
    xxh64_long,
    xxh64_long_chain_int,
    xxh64_str,
)

STRINGS = [
    "",
    "a",
    "ab",
    "abc",
    "abcd",
    "abcde",
    "abcdefg",
    "abcdefgh",
    "abcdefghi",
    "hello world",
    "0123456789012345678901234567890",    # 31: below stripe
    "01234567890123456789012345678901",   # 32: exactly one stripe
    "012345678901234567890123456789012",  # 33: stripe + byte
    "x" * 63,
    "x" * 64,
    "y" * 65,
    "z" * 100,
    "w" * 1000,
    "héllo wörld ünïcode ééééééé",
    "日本語のテキスト",
    "emoji 🎉🎊 test",
    "the quick brown fox jumps over the lazy dog and keeps on jumping",
]

LONGS = [0, 1, -1, 42, 123456789, -987654321, 2**62, -(2**62), 2**63 - 1, -(2**63)]


def test_xxh64_string_matches_spark(spark):
    expected = {
        r["s"]: r["h"]
        for r in spark.createDataFrame([(s,) for s in STRINGS], "s string")
        .select("s", F.xxhash64("s").alias("h"))
        .collect()
    }
    con = duckdb.connect()
    for s in STRINGS:
        esc = s.replace("'", "''")
        got = con.execute("SELECT " + xxh64_str(f"'{esc}'")).fetchone()[0]
        assert got == expected[s], f"string {s[:30]!r}"


def test_xxh64_long_and_seed_chain_match_spark(spark):
    sdf = spark.createDataFrame([(l,) for l in LONGS], "l long").select(
        "l",
        F.xxhash64("l").alias("h"),
        *[F.xxhash64("l", F.lit(i)).alias(f"c{i}") for i in range(3)],
    )
    rows = {r["l"]: r for r in sdf.collect()}
    con = duckdb.connect()
    for l in LONGS:
        got = con.execute("SELECT " + xxh64_long(str(l))).fetchone()[0]
        assert got == rows[l]["h"], f"hashLong({l})"
        for i in range(3):
            got = con.execute(
                "SELECT " + xxh64_long_chain_int(str(l), i)
            ).fetchone()[0]
            assert got == rows[l][f"c{i}"], f"chain({l}, {i})"
