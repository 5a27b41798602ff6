"""Round-14 review fixes.

Covers the r13 ADVICE items: EXECUTE/$n parenthesization of bound
arguments (negative-literal-after-minus lexes as a comment), INSERT
RETURNING reflecting the STORED (schema-cast) values, MATERIALIZED VIEW
statements accepting quoted identifiers with spaces, and the MinHash
index existence gate requiring a complete (meta-committed) index.
"""
import pytest

from pg_mooncake_spark.engine import MooncakeEngine

from tests.conftest import SF_DIR


@pytest.fixture()
def eng(spark, warehouse):
    return MooncakeEngine(spark, warehouse)


@pytest.fixture()
def cust(spark):
    return spark.read.parquet(f"{SF_DIR}/customer.parquet")


# ---------------------------------------------- bound-arg parenthesization


def test_params_negative_after_minus(eng):
    row = eng.sql("SELECT 10-$1 AS v, $1*$1 AS w", params=[-3]).collect()[0]
    assert (row.v, row.w) == (13, 9)


# ------------------------------------------- INSERT RETURNING stored cast


def test_insert_returning_reflects_stored_values(eng):
    eng.sql("CREATE TABLE r14_ret (k INT, v INT)")
    # 2.7 into an INT column stores 2 (conform cast); RETURNING must
    # show the stored value, not the pre-cast source
    r = eng.sql(
        "INSERT INTO r14_ret VALUES (1, 2.7) RETURNING v"
    ).collect()
    assert [row.v for row in r] == [2]
    stored = eng.sql("SELECT v FROM r14_ret").collect()
    assert [row.v for row in stored] == [2]
    eng.drop_table("r14_ret")


# ------------------------------------- quoted matview names (with spaces)


def test_matview_quoted_identifier_with_space(eng, cust):
    eng.create_table("c_mvq", source_df=cust.limit(30),
                     primary_key=["c_custkey"])
    eng.sql(
        'CREATE MATERIALIZED VIEW "my mv" AS '
        "SELECT c_nationkey, count(*) AS n FROM c_mvq GROUP BY c_nationkey"
    )
    # reads go through the sanitized view alias (Spark SQL has no
    # double-quoted identifiers); the DDL spellings keep the real name
    total = sum(r.n for r in eng.sql("SELECT n FROM my_mv").collect())
    assert total == 30
    eng.sql('REFRESH MATERIALIZED VIEW "my mv"')
    total = sum(r.n for r in eng.sql("SELECT n FROM my_mv").collect())
    assert total == 30
    eng.sql('DROP MATERIALIZED VIEW "my mv"')
    eng.drop_table("c_mvq")


# ------------------------------------------ index gate needs complete meta


def test_partial_index_dir_not_treated_as_index(spark, tmp_path):
    from pg_mooncake_spark.operators.dedup import (
        _INDEX_META_FILE, build_minhash_index, minhash_index_exists,
    )

    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(20)
    path = str(tmp_path / "ix_partial")
    build_minhash_index(d, path, "text", "doc_id")
    assert minhash_index_exists(spark, path)
    # a legacy pre-metadata index (job-committed parquet, no meta file)
    # is STILL an index — it must never be mistaken for debris and
    # silently overwritten by a rebuild
    (tmp_path / "ix_partial" / _INDEX_META_FILE).unlink()
    assert minhash_index_exists(spark, path)
    # a crashed build (no meta AND no job-commit marker) is debris:
    # the next caller rebuilds instead of extending a corrupt index
    (tmp_path / "ix_partial" / "_SUCCESS").unlink()
    assert not minhash_index_exists(spark, path)
