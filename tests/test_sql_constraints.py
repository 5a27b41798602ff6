"""Table constraints (round 12): NOT NULL / CHECK / DEFAULT declared in
CREATE TABLE and enforced IN-JOB on every write path — insert, SQL
INSERT (VALUES / SELECT / DEFAULT VALUES / upsert), UPDATE (post-image
CHECK via simultaneous-assignment substitution), MERGE, COPY FROM /
load_files, and transaction staging.  Postgres error spellings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pg_mooncake_spark.engine import (
    MooncakeEngine,
    _parse_col_constraints,
    _rewrite_values_defaults,
    _subst_idents,
)


@pytest.fixture()
def eng(spark, warehouse):
    return MooncakeEngine(spark, warehouse)


DDL = """CREATE TABLE acct (
  id bigint PRIMARY KEY,
  name text NOT NULL,
  bal double precision DEFAULT 0.0 CHECK (bal >= -100.0),
  tag text DEFAULT 'new',
  CONSTRAINT sane CHECK (length(name) > 0)
)"""


# ------------------------------------------------------------- parsing


def test_parse_col_constraints_shapes():
    t, info = _parse_col_constraints("double precision DEFAULT 0.0 NOT NULL")
    assert t == "double precision"
    assert info["default"] == "0.0" and info["not_null"]
    t, info = _parse_col_constraints(
        "text CHECK (length(c) > 0) DEFAULT 'x'"
    )
    assert t == "text" and info["checks"] == [(None, "length(c) > 0")]
    assert info["default"] == "'x'"
    t, info = _parse_col_constraints("numeric(10,2) PRIMARY KEY")
    assert t == "numeric(10,2)" and info["is_pk"]
    with pytest.raises(ValueError, match="UNIQUE"):
        _parse_col_constraints("int UNIQUE")
    with pytest.raises(ValueError, match="REFERENCES"):
        _parse_col_constraints("int REFERENCES other(id)")


def test_subst_idents_skips_strings():
    out = _subst_idents("bal > 0 AND tag <> 'bal'", {"bal": "(x + 1)"})
    assert out == "(x + 1) > 0 AND tag <> 'bal'"


def test_rewrite_values_defaults_positional(spark):
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
        ]
    )
    out = _rewrite_values_defaults(
        "VALUES (1, DEFAULT), (DEFAULT, 'x')",
        ["a", "b"], schema, {"b": "'d'"},
    )
    assert "CAST(('d') AS string)" in out
    assert "CAST(NULL AS bigint)" in out
    # DEFAULT inside a string literal is untouched
    same = _rewrite_values_defaults(
        "VALUES (1, 'DEFAULT')", ["a", "b"], schema, {}
    )
    assert same == "VALUES (1, 'DEFAULT')"


# ------------------------------------------------------------ inserts


def test_defaults_fill_unlisted_and_keyword(eng):
    eng.sql(DDL)
    eng.sql("INSERT INTO acct VALUES (1, 'alice', 5.0, DEFAULT)")
    eng.sql("INSERT INTO acct (id, name) VALUES (2, 'bob')")
    rows = {r.id: r for r in eng.sql("SELECT * FROM acct").collect()}
    assert rows[1].tag == "new" and rows[2].tag == "new"
    assert rows[2].bal == 0.0


def test_not_null_and_check_on_insert(eng):
    eng.sql(DDL)
    with pytest.raises(Exception, match="not-null constraint"):
        eng.sql("INSERT INTO acct VALUES (3, NULL, 1.0, 'x')")
    with pytest.raises(Exception, match='check constraint "acct_check"'):
        eng.sql("INSERT INTO acct VALUES (3, 'c', -200.0, 'x')")
    with pytest.raises(Exception, match='check constraint "sane"'):
        eng.sql("INSERT INTO acct (id, name) VALUES (4, '')")
    # NULL check result passes (three-valued logic, Postgres)
    eng.sql("INSERT INTO acct VALUES (5, 'e', NULL, 'x')")
    assert eng.sql(
        "SELECT count(*) AS n FROM acct WHERE id = 5"
    ).collect()[0].n == 1


def test_constraints_on_api_insert(eng, spark):
    eng.sql(DDL)
    bad = spark.createDataFrame(
        [(9, None, 1.0, "x")], "id long, name string, bal double, tag string"
    )
    with pytest.raises(Exception, match="not-null constraint"):
        eng.insert("acct", bad)


# ------------------------------------------------------------- updates


def test_update_check_postimage_and_not_null(eng):
    eng.sql(DDL)
    eng.sql("INSERT INTO acct VALUES (1, 'alice', 5.0, 't')")
    with pytest.raises(Exception, match='check constraint "acct_check"'):
        eng.sql("UPDATE acct SET bal = bal - 1000.0 WHERE id = 1")
    with pytest.raises(Exception, match="not-null constraint"):
        eng.sql("UPDATE acct SET name = NULL WHERE id = 1")
    # legal update passes and lands
    eng.sql("UPDATE acct SET bal = bal - 50.0 WHERE id = 1")
    assert eng.sql(
        "SELECT bal FROM acct WHERE id = 1"
    ).collect()[0].bal == -45.0


def test_upsert_and_merge_are_guarded(eng):
    eng.sql(DDL)
    eng.sql("INSERT INTO acct VALUES (1, 'alice', 5.0, 't')")
    with pytest.raises(Exception, match='check constraint'):
        eng.sql(
            "INSERT INTO acct VALUES (1, 'alice', -500.0, 't') "
            "ON CONFLICT (id) DO UPDATE SET bal = excluded.bal"
        )
    with pytest.raises(Exception, match="not-null constraint"):
        eng.sql(
            "MERGE INTO acct USING (SELECT 1 AS id) s ON acct.id = s.id "
            "WHEN MATCHED THEN UPDATE SET name = NULL"
        )


# ------------------------------------------------- transactions & COPY


def test_constraint_violation_aborts_txn_block(eng):
    eng.sql(DDL)
    eng.sql("BEGIN")
    eng.sql("INSERT INTO acct VALUES (1, 'a', 1.0, 't')")
    with pytest.raises(Exception, match="not-null constraint"):
        eng.sql("INSERT INTO acct VALUES (2, NULL, 1.0, 't')")
    with pytest.raises(ValueError, match="transaction is aborted"):
        eng.sql("SELECT * FROM acct")
    eng.sql("ROLLBACK")
    assert eng.sql("SELECT count(*) AS n FROM acct").collect()[0].n == 0


def test_copy_from_enforces_constraints(eng, tmp_path):
    eng.sql(DDL)
    p = tmp_path / "in.csv"
    p.write_text("7,carol,-500.0,x\n")
    with pytest.raises(Exception, match="check constraint"):
        eng.sql(f"COPY acct FROM '{p}' (FORMAT csv)")
    p.write_text("7,carol,-50.0,x\n")
    eng.sql(f"COPY acct FROM '{p}' (FORMAT csv)")
    assert eng.sql("SELECT count(*) AS n FROM acct").collect()[0].n == 1


def test_default_values_statement(eng):
    eng.sql(
        "CREATE TABLE d (a int DEFAULT 7, b text DEFAULT 'x', c int)"
    )
    eng.sql("INSERT INTO d DEFAULT VALUES")
    r = eng.sql("SELECT * FROM d").collect()[0]
    assert (r.a, r.b, r.c) == (7, "x", None)
