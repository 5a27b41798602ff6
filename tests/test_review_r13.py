"""Round-13 review tests: the five ADVICE_r12 findings.

1. streaming_index_dedup existence check must go through the Hadoop
   FileSystem API (not driver-local os.path) so remote index paths
   don't silently rebuild the historical index every micro-batch;
2. persisted MinHash index parameters are pinned at build time and win
   over mismatched caller arguments in extend/probe;
3. NOT NULL enforcement on API writes is case-insensitive on column
   names (constraint metadata stores lowercase);
4. EXECUTE binds each argument ONCE (Postgres extended-protocol values,
   not expression splices): volatile args are stable across repeated
   markers, column-reference args error;
5. bare EXPLAIN raises the intended ValueError, not AttributeError.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pg_mooncake_spark.engine import MooncakeEngine

from tests.conftest import SF_DIR


@pytest.fixture()
def eng(spark, warehouse):
    return MooncakeEngine(spark, warehouse)


# ------------------------------------------------- index metadata pinning


def test_index_meta_written_and_read(spark, tmp_path):
    from pg_mooncake_spark.operators.dedup import (
        build_minhash_index, minhash_index_exists, read_minhash_index_meta,
    )

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
    path = str(tmp_path / "ix_meta")
    assert not minhash_index_exists(spark, path)
    build_minhash_index(
        d, path, "text", "doc_id", num_hashes=8, bands=2, shingle_k=4,
        n_shards=4,
    )
    assert minhash_index_exists(spark, path)
    meta = read_minhash_index_meta(spark, path)
    assert meta == {
        "num_hashes": 8, "bands": 2, "shingle_k": 4, "n_shards": 4,
        "id_col": "doc_id",
    }
    # the meta file is hidden to the parquet scan of the index itself
    cols = set(spark.read.parquet(path).columns)
    assert cols == {"doc_id", "signature", "band_idx", "band_hash", "shard"}


def test_probe_with_mismatched_params_uses_pinned(spark, tmp_path):
    """Build with n_shards=3/num_hashes=8; probe with the (different)
    defaults.  Pre-fix the probe sharded by pmod(hash, 16) and missed
    every true duplicate; pinned metadata makes it find them."""
    from pg_mooncake_spark.operators.dedup import (
        build_minhash_index, probe_minhash_index,
    )

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = d.filter("doc_id < 200")
    path = str(tmp_path / "ix_pin")
    build_minhash_index(
        corpus, path, "text", "doc_id", num_hashes=8, bands=2,
        shingle_k=4, n_shards=3,
    )
    probe = d.filter("doc_id = 42").select(
        (F.col("doc_id") + 900000).alias("doc_id"), "text"
    )
    hits = probe_minhash_index(
        spark, path, probe, "text", "doc_id", threshold=0.99
    ).collect()
    assert any(r.corpus_id == 42 for r in hits)


def test_extend_with_mismatched_params_uses_pinned(spark, tmp_path):
    from pg_mooncake_spark.operators.dedup import (
        build_minhash_index, extend_minhash_index, probe_minhash_index,
    )

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    path = str(tmp_path / "ix_ext")
    build_minhash_index(
        d.filter("doc_id < 100"), path, "text", "doc_id",
        num_hashes=8, bands=2, shingle_k=4, n_shards=3,
    )
    # extend with clashing caller args: pinned build params must win,
    # else these rows land in a foreign shard/signature layout
    extend_minhash_index(
        d.filter("doc_id >= 100 AND doc_id < 150"), path, "text", "doc_id",
        num_hashes=16, bands=4, shingle_k=3, n_shards=16,
    )
    probe = d.filter("doc_id = 120").select(
        (F.col("doc_id") + 900000).alias("doc_id"), "text"
    )
    hits = probe_minhash_index(
        spark, path, probe, "text", "doc_id", threshold=0.99
    ).collect()
    assert any(r.corpus_id == 120 for r in hits)


def test_streaming_gate_uses_hadoop_fs_existence(spark, tmp_path):
    """minhash_index_exists resolves through the path's Hadoop scheme;
    an explicit file:// URI (which os.path.isdir would reject verbatim
    on some forms and any remote scheme always) must work."""
    from pg_mooncake_spark.operators.dedup import (
        build_minhash_index, minhash_index_exists,
    )

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    local = str(tmp_path / "ix_uri")
    build_minhash_index(d, local, "text", "doc_id")
    assert minhash_index_exists(spark, f"file://{local}")
    assert not minhash_index_exists(spark, f"file://{local}_nope")


# --------------------------------------------- NOT NULL case-insensitive


def test_not_null_guard_is_case_insensitive(spark, eng):
    eng.sql(
        "CREATE TABLE nn_case (k INT PRIMARY KEY, v STRING NOT NULL)"
    )
    # API write whose DataFrame uses different-cased column names: the
    # NOT NULL guard must still bind (metadata stores lowercase)
    bad = spark.createDataFrame([(1, None)], "K int, V string")
    with pytest.raises(Exception, match="not-null"):
        eng.insert("nn_case", bad)
    ok = spark.createDataFrame([(1, "x")], "K int, V string")
    eng.insert("nn_case", ok)
    assert eng.table("nn_case").count() == 1


# ------------------------------------------------- EXECUTE bind-once


def test_execute_binds_volatile_arg_once(eng, spark):
    cust = (
        spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .select("c_custkey", "c_name", "c_acctbal")
        .limit(10)
    )
    eng.create_table("c_r13", source_df=cust, primary_key=["c_custkey"])
    # $1 appears twice; a volatile argument must yield EQUAL values in
    # both positions (Postgres binds the value, not the expression)
    eng.sql(
        "PREPARE vol (double) AS "
        "SELECT $1 AS a, $1 AS b FROM c_r13 LIMIT 1"
    )
    row = eng.sql("EXECUTE vol(rand())").collect()[0]
    assert row.a == row.b


def test_execute_rejects_column_reference_arg(eng, spark):
    cust = (
        spark.read.parquet(f"{SF_DIR}/customer.parquet")
        .select("c_custkey", "c_name", "c_acctbal")
        .limit(10)
    )
    eng.create_table("c_r13b", source_df=cust, primary_key=["c_custkey"])
    eng.sql(
        "PREPARE colref AS SELECT c_custkey FROM c_r13b WHERE c_custkey = $1"
    )
    with pytest.raises(ValueError, match="cannot evaluate parameter"):
        eng.sql("EXECUTE colref(c_custkey)")


# ------------------------------------------------------- bare EXPLAIN


def test_bare_explain_raises_value_error(eng):
    with pytest.raises(ValueError, match="empty statement"):
        eng.sql("EXPLAIN")
    with pytest.raises(ValueError, match="empty statement"):
        eng.sql("EXPLAIN;")


# ------------------------------------------------- scaled_long guard


def test_scaled_long_rejects_negative_input(spark):
    from pg_mooncake_spark.functions import scaled_long

    df = spark.createDataFrame([(1.25,), (-0.5,)], "x double")
    with pytest.raises(Exception, match="scaled_long: negative"):
        df.select(scaled_long("x", 2).alias("s")).collect()
    # opt-out for proven-non-negative domains skips the guard
    ok = spark.createDataFrame([(1.25,), (2.0,)], "x double")
    rows = ok.select(
        scaled_long("x", 2, assume_non_negative=True).alias("s")
    ).collect()
    assert sorted(r.s for r in rows) == [125, 200]
    # NULLs pass through as NULL, not as a guard trip
    withnull = spark.createDataFrame([(1.0,), (None,)], "x double")
    rows = withnull.select(scaled_long("x", 2).alias("s")).collect()
    assert sorted((r.s for r in rows), key=lambda v: (v is None, v)) == [100, None]


# ------------------------------------- r13 self-review: index id_col pin


def test_extend_with_different_id_col_uses_pinned_name(spark, tmp_path):
    from pg_mooncake_spark.operators.dedup import (
        build_minhash_index, extend_minhash_index, probe_minhash_index,
    )

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    path = str(tmp_path / "ix_idcol")
    build_minhash_index(d.filter("doc_id < 100"), path, "text", "doc_id")
    # extend under a DIFFERENT id column name: rows must land under the
    # pinned name, or later reads see one generation's ids as NULL and
    # silently drop its candidates
    ext = d.filter("doc_id >= 100 AND doc_id < 150").select(
        F.col("doc_id").alias("row_id"), "text"
    )
    extend_minhash_index(ext, path, "text", "row_id")
    assert set(spark.read.parquet(path).columns) >= {"doc_id", "signature"}
    probe = d.filter("doc_id = 120").select(
        (F.col("doc_id") + 900000).alias("doc_id"), "text"
    )
    hits = probe_minhash_index(
        spark, path, probe, "text", "doc_id", threshold=0.99
    ).collect()
    assert any(r.corpus_id == 120 for r in hits)


def test_matview_duplicate_alias_and_quoted_name(spark, warehouse):
    eng = MooncakeEngine(spark, warehouse)
    src = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0)], "k int, g string, v double"
    )
    eng.create_table(
        "mq_base", source_df=src, primary_key=["k"], change_feed=True
    )
    with pytest.raises(ValueError, match="more than once"):
        eng.sql(
            "CREATE MATERIALIZED VIEW dup_mv AS "
            "SELECT g, sum(CAST(v AS DECIMAL(10,2))) AS s, count(*) AS s "
            "FROM mq_base GROUP BY g"
        )
    # quoted identifiers preserve case end-to-end (CREATE sees the same
    # canonical name table()/DROP resolve later)
    eng.sql(
        'CREATE MATERIALIZED VIEW "MyMV" AS '
        "SELECT g, count(*) AS n FROM mq_base GROUP BY g"
    )
    assert "MyMV" in eng.catalog.list_tables()
    assert eng.table('"MyMV"').count() == 2
    eng.sql('DROP MATERIALIZED VIEW "MyMV"')
    assert "MyMV" not in eng.catalog.list_tables()
