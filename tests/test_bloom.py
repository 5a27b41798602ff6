"""Bloom-filter key index: determinism, pruning power, soundness.

The one invariant that matters is NO FALSE NEGATIVES — a key present in
a file must always pass that file's filter, or MERGE would silently skip
the rewrite and drop an update.  False positives are only a perf leak.
"""

from __future__ import annotations

import datetime

import numpy as np
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pg_mooncake_spark.functions import bloom as B
from pg_mooncake_spark.storage import MoonTable


class TestBloomPrimitives:
    def test_roundtrip_and_membership(self):
        h = B.key_hash_array([np.arange(1000, dtype=np.int64)])
        m = B.bloom_m_for(1000)
        bm = B.build_bitmap(h, m)
        blob = B.serialize(bm, m)
        bm2, m2, k2 = B.deserialize(blob)
        assert m2 == m and (bm2 == bm).all()
        # every inserted key passes (no false negatives, exhaustive)
        for i in range(0, 1000, 37):
            one = B.key_hash_array([np.array([i], dtype=np.int64)])
            assert B.might_contain_any(bm2, m2, one, k2)
        # absent keys mostly fail (10 bits/key -> fp ~1%)
        absent = B.key_hash_array([np.arange(10_000, 11_000, dtype=np.int64)])
        hits = sum(
            B.might_contain_any(bm2, m2, absent[i : i + 1], k2)
            for i in range(1000)
        )
        assert hits < 50

    def test_hash_stability_pinned(self):
        """The canonical hash is part of the on-disk format: these pinned
        values must never change (a drift would false-negative every
        existing sidecar)."""
        h_int = B.key_hash_array([np.array([0, 1, -1], dtype=np.int64)])
        h_str = B.key_hash_array([np.array(["", "a", "moon"], dtype=object)])
        assert h_int.tolist() == [
            16294208416658607535,
            10451216379200822465,
            16490336266968443936,
        ]
        assert h_str.tolist() == [
            14087677454934409008,
            6857225946766476583,
            9621805213556870768,
        ]

    def test_multi_column_order_matters(self):
        a = np.array([1], dtype=np.int64)
        b = np.array([2], dtype=np.int64)
        assert B.key_hash_array([a, b])[0] != B.key_hash_array([b, a])[0]

    def test_date_and_pydate_agree(self):
        """Stage time may see datetime64 columns, probe time python
        datetime.date objects — both must encode identically."""
        d64 = np.array(["2024-03-05"], dtype="datetime64[ns]")
        dpy = np.array([datetime.date(2024, 3, 5)], dtype=object)
        assert B.key_hash_array([d64])[0] == B.key_hash_array([dpy])[0]

    def test_unknown_blob_is_none(self):
        assert B.deserialize(b"????garbage") is None
        assert B.deserialize(b"") is None


class TestBloomPruning:
    def _table(self, spark, tmp_path, n=4000, files=8):
        mt = MoonTable(spark, str(tmp_path / "t"))
        schema = T.StructType(
            [
                T.StructField("id", T.LongType(), False),
                T.StructField("v", T.StringType(), True),
            ]
        )
        mt.create(schema, primary_key=["id"])
        mt.append(
            spark.range(0, n).select(
                "id", F.concat(F.lit("v"), F.col("id")).alias("v")
            )
        )
        mt.optimize(target_partitions=files, sort_by=["id"])
        return mt

    def test_scattered_keys_prune_to_containing_files(self, spark, tmp_path):
        mt = self._table(spark, tmp_path)
        files, _ = mt._snapshot(None)
        assert all(d.get("bloom") for d in files)
        keys = spark.createDataFrame([(3,), (3999,)], "id long")
        kept = mt._bloom_prune(files, keys, ["id"], 2)
        # the two true containers MUST be kept; fp may add a couple more
        truth = mt._probe_by_keys(files, keys, ["id"])
        assert {d["name"] for d in truth} <= {d["name"] for d in kept}
        assert len(kept) <= len(truth) + 2
        assert len(kept) < len(files)

    def test_absent_key_prunes_everything(self, spark, tmp_path):
        mt = self._table(spark, tmp_path)
        files, _ = mt._snapshot(None)
        keys = spark.createDataFrame([(10_000_000,)], "id long")
        # envelope already rejects out-of-range; call bloom directly to
        # prove the filter itself rejects (allow rare fp)
        kept = mt._bloom_prune(files, keys, ["id"], 1)
        assert len(kept) <= 1

    def test_missing_sidecar_keeps_candidate(self, spark, tmp_path):
        import os

        mt = self._table(spark, tmp_path, n=500, files=2)
        files, _ = mt._snapshot(None)
        victim = files[0]
        os.remove(os.path.join(mt.path, "_index", victim["bloom"]))
        MoonTable._BLOOM_CACHE.clear()
        keys = spark.createDataFrame([(499,)], "id long")
        kept = mt._bloom_prune(files, keys, ["id"], 1)
        assert victim["name"] in {d["name"] for d in kept}

    def test_string_pk_end_to_end(self, spark, tmp_path):
        mt = MoonTable(spark, str(tmp_path / "s"))
        schema = T.StructType(
            [
                T.StructField("k", T.StringType(), False),
                T.StructField("x", T.LongType(), True),
            ]
        )
        mt.create(schema, primary_key=["k"])
        mt.append(
            spark.range(0, 2000).select(
                F.concat(F.lit("key_"), F.col("id")).alias("k"), F.col("id").alias("x")
            )
        )
        mt.optimize(target_partitions=6, sort_by=["k"])
        ch = spark.createDataFrame(
            [("key_42", -1, "U"), ("key_1999", None, "D")],
            "k string, x long, __op string",
        )
        mt.merge(ch)
        got = {r["k"]: r["x"] for r in mt.read().filter("k in ('key_42','key_1999','key_7')").collect()}
        assert got == {"key_42": -1, "key_7": 7}

    def test_vacuum_reaps_orphan_sidecars(self, spark, tmp_path):
        import os

        mt = self._table(spark, tmp_path, n=500, files=2)
        mt.optimize(target_partitions=1)  # old files + sidecars now dead
        mt.vacuum(staging_grace_s=0)
        live = {d["name"] for d in mt._snapshot(None)[0]}
        idx = os.listdir(os.path.join(mt.path, "_index"))
        assert {f[len("bloom-"):-len(".bin")] for f in idx} <= live


class TestPointReadPruning:
    def test_point_read_plans_single_file(self, spark, tmp_path):
        """read(where='id = K') on an UNSORTED multi-file table: min/max
        stats overlap everywhere, but the bloom sidecars cut the plan to
        the containing file(s) — driver-side, no probe job."""
        from pyspark.sql import functions as F

        mt = MoonTable(spark, str(tmp_path / "t"))
        mt.create(
            T.StructType(
                [
                    T.StructField("id", T.LongType(), False),
                    T.StructField("v", T.StringType(), True),
                ]
            ),
            primary_key=["id"],
        )
        # interleaved appends, one file each -> every file spans the whole
        # key range, so min/max stats overlap everywhere
        for i in range(6):
            mt.append(
                spark.range(i, 3000, 6)
                .select("id", F.concat(F.lit("v"), F.col("id")).alias("v"))
                .coalesce(1)
            )
        files, _ = mt._snapshot(None)
        n_files = len(files)
        stat_kept = mt._pk_stat_candidates(files, "id = 17")
        assert len(stat_kept) == n_files  # stats alone can't prune
        bloom_kept = mt._bloom_prune_literal(stat_kept, "id = 17")
        assert len(bloom_kept) < n_files
        got = mt.read(where="id = 17").collect()
        assert [(r["id"], r["v"]) for r in got] == [(17, "v17")]
        # absent key: typically zero files planned, always zero rows
        assert mt.read(where="id = 999999999").count() == 0

    def test_partial_or_nonliteral_predicates_keep_all(self, spark, tmp_path):
        mt = MoonTable(spark, str(tmp_path / "t"))
        mt.create(
            T.StructType(
                [
                    T.StructField("a", T.LongType(), False),
                    T.StructField("b", T.StringType(), False),
                    T.StructField("v", T.DoubleType(), True),
                ]
            ),
            primary_key=["a", "b"],
        )
        mt.append(
            spark.createDataFrame(
                [(1, "x", 1.0), (2, "y", 2.0)], "a long, b string, v double"
            )
        )
        mt.append(
            spark.createDataFrame([(3, "z", 3.0)], "a long, b string, v double")
        )
        files, _ = mt._snapshot(None)
        # partial key -> no pruning
        assert mt._bloom_prune_literal(files, "a = 1") == files
        # expression operand -> no pruning
        assert mt._bloom_prune_literal(files, "a = 1 AND b = upper('x')") == files
        # full literal key works and stays correct
        rows = mt.read(where="a = 1 AND b = 'x'").collect()
        assert [(r["a"], r["b"]) for r in rows] == [(1, "x")]


def test_null_pk_values_disable_bloom_soundly(spark, tmp_path):
    """NULL anywhere in a pk column must not corrupt neighbouring keys'
    hashes (pandas int→float coercion): the affected file gets no
    sidecar, a null-carrying batch skips pruning, and the merge still
    lands every real change."""
    mt = MoonTable(spark, str(tmp_path / "t"))
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), True),  # nullable pk (!)
            T.StructField("v", T.StringType(), True),
        ]
    )
    mt.create(schema, primary_key=["id"])
    mt.append(
        spark.createDataFrame([(1, "a"), (None, "nullkey"), (2, "b")], schema)
    )
    files, _ = mt._snapshot(None)
    # whichever staged file holds the null key must NOT have a sidecar
    # (other files of the append legitimately keep theirs)
    null_files = [
        d
        for d in files
        if (d.get("stats") or {}).get("id", [None])[0] is None
    ]
    assert null_files and all(not d.get("bloom") for d in null_files)
    mt.append(spark.createDataFrame([(10, "x"), (11, "y")], schema))
    ch = spark.createDataFrame(
        [(1, "A", "U"), (10, None, "D")], "id long, v string, __op string"
    )
    mt.merge(ch)
    got = {r["id"]: r["v"] for r in mt.read().collect()}
    assert got == {1: "A", None: "nullkey", 2: "b", 11: "y"}
