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


# ------------------------------------------------ ALTER constraint DDL


def test_add_check_validates_existing_rows(eng):
    eng.sql("CREATE TABLE t1 (id bigint PRIMARY KEY, v double precision)")
    eng.sql("INSERT INTO t1 VALUES (1, 5.0), (2, -1.0)")
    with pytest.raises(ValueError, match="violated by some row"):
        eng.sql("ALTER TABLE t1 ADD CONSTRAINT v_pos CHECK (v > 0)")
    # NOT VALID skips the scan but still guards new writes
    eng.sql("ALTER TABLE t1 ADD CONSTRAINT v_pos CHECK (v > 0) NOT VALID")
    with pytest.raises(Exception, match='check constraint "v_pos"'):
        eng.sql("INSERT INTO t1 VALUES (3, -2.0)")
    with pytest.raises(ValueError, match="violated by some row"):
        eng.sql("ALTER TABLE t1 VALIDATE CONSTRAINT v_pos")
    eng.sql("UPDATE t1 SET v = 1.0 WHERE id = 2")
    eng.sql("ALTER TABLE t1 VALIDATE CONSTRAINT v_pos")
    with pytest.raises(ValueError, match="already exists"):
        eng.sql("ALTER TABLE t1 ADD CONSTRAINT v_pos CHECK (v > 1)")


def test_drop_constraint(eng):
    eng.sql("CREATE TABLE t2 (id bigint PRIMARY KEY, "
            "v int CHECK (v > 0))")
    with pytest.raises(ValueError, match="does not exist"):
        eng.sql("ALTER TABLE t2 DROP CONSTRAINT nope")
    eng.sql("ALTER TABLE t2 DROP CONSTRAINT IF EXISTS nope")
    eng.sql("ALTER TABLE t2 DROP CONSTRAINT t2_check")
    eng.sql("INSERT INTO t2 VALUES (1, -5)")  # check is gone


def test_alter_column_default_and_not_null(eng):
    eng.sql("CREATE TABLE t3 (id bigint PRIMARY KEY, v int, w text)")
    eng.sql("INSERT INTO t3 (id) VALUES (1)")
    with pytest.raises(ValueError, match="contains null values"):
        eng.sql("ALTER TABLE t3 ALTER COLUMN v SET NOT NULL")
    eng.sql("UPDATE t3 SET v = 0 WHERE v IS NULL")
    eng.sql("ALTER TABLE t3 ALTER COLUMN v SET NOT NULL")
    with pytest.raises(Exception, match="not-null constraint"):
        eng.sql("INSERT INTO t3 (id, w) VALUES (2, 'x')")
    eng.sql("ALTER TABLE t3 ALTER COLUMN v SET DEFAULT 42")
    eng.sql("INSERT INTO t3 (id, w) VALUES (2, 'x')")
    assert eng.sql("SELECT v FROM t3 WHERE id = 2").collect()[0].v == 42
    eng.sql("ALTER TABLE t3 ALTER COLUMN v DROP NOT NULL")
    eng.sql("ALTER TABLE t3 ALTER COLUMN v DROP DEFAULT")
    eng.sql("INSERT INTO t3 (id, w) VALUES (3, 'y')")
    assert eng.sql("SELECT v FROM t3 WHERE id = 3").collect()[0].v is None
    with pytest.raises(ValueError, match="is in a primary key"):
        eng.sql("ALTER TABLE t3 ALTER COLUMN id DROP NOT NULL")


def test_add_column_with_default_backfills(eng):
    eng.sql("CREATE TABLE t4 (id bigint PRIMARY KEY)")
    eng.sql("INSERT INTO t4 VALUES (1), (2)")
    eng.sql("ALTER TABLE t4 ADD COLUMN tag text DEFAULT 'n/a' NOT NULL")
    assert {r.tag for r in eng.sql("SELECT tag FROM t4").collect()} == {"n/a"}
    eng.sql("INSERT INTO t4 (id) VALUES (3)")
    assert eng.sql(
        "SELECT tag FROM t4 WHERE id = 3"
    ).collect()[0].tag == "n/a"
    # NOT NULL without a default on a non-empty table refuses up front
    with pytest.raises(ValueError, match="contains null values"):
        eng.sql("ALTER TABLE t4 ADD COLUMN req int NOT NULL")


# --------------------------------------------------- generated columns


GEN_DDL = """CREATE TABLE g (
  id bigint PRIMARY KEY,
  qty int NOT NULL DEFAULT 1,
  price double precision,
  total double precision GENERATED ALWAYS AS (qty * price) STORED
)"""


def test_generated_computes_on_insert_paths(eng):
    eng.sql(GEN_DDL)
    eng.sql("INSERT INTO g (id, qty, price) VALUES (1, 2, 10.0)")
    eng.sql("INSERT INTO g VALUES (2, 3, 4.0)")  # implicit list skips gen
    eng.sql("INSERT INTO g (id, qty, price, total) VALUES (3, 1, 5.0, DEFAULT)")
    got = {r.id: r.total for r in eng.sql("SELECT id, total FROM g").collect()}
    assert got == {1: 20.0, 2: 12.0, 3: 5.0}


def test_generated_refuses_explicit_writes(eng):
    eng.sql(GEN_DDL)
    eng.sql("INSERT INTO g (id, qty, price) VALUES (1, 2, 10.0)")
    with pytest.raises(ValueError, match="non-DEFAULT value"):
        eng.sql("INSERT INTO g (id, qty, price, total) VALUES (9, 1, 1.0, 7.0)")
    with pytest.raises(ValueError, match="non-DEFAULT value"):
        eng.sql("INSERT INTO g (id, total) SELECT 9, 1.0")
    with pytest.raises(ValueError, match="updated to DEFAULT"):
        eng.sql("UPDATE g SET total = 99 WHERE id = 1")
    with pytest.raises(ValueError, match="updated to DEFAULT"):
        eng.sql(
            "MERGE INTO g USING (SELECT 1 AS id) s ON g.id = s.id "
            "WHEN MATCHED THEN UPDATE SET total = 5"
        )
    with pytest.raises(ValueError, match="updated to DEFAULT"):
        eng.sql(
            "INSERT INTO g VALUES (1, 1, 1.0) "
            "ON CONFLICT (id) DO UPDATE SET total = 1.0"
        )


def test_generated_recomputes_on_update_and_merge(eng):
    eng.sql(GEN_DDL)
    eng.sql("INSERT INTO g (id, qty, price) VALUES (1, 2, 10.0), (2, 1, 3.0)")
    eng.sql("UPDATE g SET qty = qty + 1 WHERE id = 1")
    assert eng.sql(
        "SELECT total FROM g WHERE id = 1"
    ).collect()[0].total == 30.0
    # SET total = DEFAULT is legal (and a recompute no-op)
    eng.sql("UPDATE g SET price = 6.0, total = DEFAULT WHERE id = 2")
    assert eng.sql(
        "SELECT total FROM g WHERE id = 2"
    ).collect()[0].total == 6.0
    eng.sql(
        "MERGE INTO g USING (SELECT 2 AS id, 5 AS q) s ON g.id = s.id "
        "WHEN MATCHED THEN UPDATE SET qty = s.q"
    )
    assert eng.sql(
        "SELECT total FROM g WHERE id = 2"
    ).collect()[0].total == 30.0


def test_generated_add_column_backfill_and_deps(eng):
    eng.sql(GEN_DDL)
    eng.sql("INSERT INTO g (id, qty, price) VALUES (1, 2, 10.0)")
    eng.sql("ALTER TABLE g ADD COLUMN fee double precision "
            "GENERATED ALWAYS AS ((qty * price) * 0.5) STORED")
    assert eng.sql("SELECT fee FROM g WHERE id = 1").collect()[0].fee == 10.0
    with pytest.raises(ValueError, match="generated column"):
        eng.sql("ALTER TABLE g ADD COLUMN f2 double precision "
                "GENERATED ALWAYS AS (total + 1) STORED")
    with pytest.raises(ValueError, match='depends on it'):
        eng.sql("ALTER TABLE g DROP COLUMN price")
    eng.sql("ALTER TABLE g DROP COLUMN fee")  # dropping the gen col is fine
    with pytest.raises(ValueError, match="generated column"):
        eng.sql("ALTER TABLE g ALTER COLUMN total SET DEFAULT 1.0")


def test_generated_survives_rename(eng):
    eng.sql(GEN_DDL)
    eng.sql("INSERT INTO g (id, qty, price) VALUES (1, 2, 10.0)")
    eng.sql("ALTER TABLE g RENAME COLUMN qty TO quantity")
    eng.sql("UPDATE g SET quantity = 4 WHERE id = 1")
    assert eng.sql(
        "SELECT total FROM g WHERE id = 1"
    ).collect()[0].total == 40.0


def test_gen_on_gen_refused_at_create(eng):
    with pytest.raises(ValueError, match="generation expression"):
        eng.sql("""CREATE TABLE bad (
          id bigint PRIMARY KEY,
          a double precision GENERATED ALWAYS AS (id * 2) STORED,
          b double precision GENERATED ALWAYS AS (a + 1) STORED
        )""")


def test_set_gen_default_alone_recomputes(eng):
    eng.sql(GEN_DDL)
    eng.sql("INSERT INTO g (id, qty, price) VALUES (1, 2, 10.0)")
    eng.sql("UPDATE g SET total = DEFAULT WHERE id = 1")  # legal no-op-ish
    assert eng.sql(
        "SELECT total FROM g WHERE id = 1"
    ).collect()[0].total == 20.0


def test_bad_constraint_expr_refused_at_create(eng):
    with pytest.raises(ValueError, match="invalid CHECK expression"):
        eng.sql("CREATE TABLE bc (id bigint PRIMARY KEY, "
                "v int CHECK (no_such_col > 0))")
    with pytest.raises(ValueError, match="invalid GENERATED expression"):
        eng.sql("CREATE TABLE bg (id bigint PRIMARY KEY, "
                "d double precision GENERATED ALWAYS AS (missing * 2) STORED)")


# ----------------------------------------------- round-12 review fixes


def test_default_null_spellings(eng):
    eng.sql("CREATE TABLE dn (id bigint PRIMARY KEY, "
            "a text DEFAULT NULL, "
            "b text DEFAULT NULL::character varying NOT NULL)")
    d = {r.column_name: r for r in eng.sql("DESCRIBE dn").collect()}
    assert d["a"].column_default is None
    assert d["b"].is_nullable == "NO"
    eng.sql("INSERT INTO dn (id, b) VALUES (1, 'x')")
    assert eng.sql("SELECT a FROM dn").collect()[0].a is None


def test_add_column_dup_constraint_refuses_before_write(eng):
    eng.sql("CREATE TABLE adc (id bigint PRIMARY KEY, "
            "v int CONSTRAINT c1 CHECK (v IS NULL OR v > 0))")
    eng.sql("INSERT INTO adc (id, v) VALUES (1, 5)")
    with pytest.raises(ValueError, match='"c1" for relation "adc" already'):
        eng.sql("ALTER TABLE adc ADD COLUMN x int DEFAULT 1 "
                "CONSTRAINT c1 CHECK (x > 0)")
    # atomic refusal: the column must NOT have been added
    cols = [f.name for f in eng.table("adc").schema.fields]
    assert "x" not in cols


def test_alter_expressions_validated_at_ddl_time(eng):
    eng.sql("CREATE TABLE av (id bigint PRIMARY KEY, v int)")
    with pytest.raises(ValueError, match="invalid CHECK expression"):
        eng.sql("ALTER TABLE av ADD CONSTRAINT bad "
                "CHECK (no_such > 0) NOT VALID")
    with pytest.raises(ValueError, match="invalid DEFAULT expression"):
        eng.sql("ALTER TABLE av ALTER COLUMN v SET DEFAULT not_a_col")
    with pytest.raises(ValueError, match="invalid CHECK expression"):
        eng.sql("ALTER TABLE av ADD COLUMN y int CHECK (nope > 0) "
                "DEFAULT 0")
    assert "y" not in [f.name for f in eng.table("av").schema.fields]
    eng.sql("INSERT INTO av (id, v) VALUES (1, 1)")  # writes unpoisoned


def test_narrow_batches_skip_absent_constraint_inputs(eng, spark):
    """Schema-drift batches (evolve null-fills) and key-only delete
    images must not crash analysis when a CHECK or generated column
    references an absent column."""
    eng.sql("""CREATE TABLE nb (
      id bigint PRIMARY KEY,
      bal double precision CHECK (bal >= 0),
      twice double precision GENERATED ALWAYS AS (bal * 2) STORED
    )""")
    eng.sql("INSERT INTO nb (id, bal) VALUES (1, 5.0)")
    narrow = spark.createDataFrame(
        [(1, "D")], "id long, __op string"
    )
    # key-only delete image: the evolve path null-fills the absent
    # columns; the guards must not crash analysis before it runs
    eng.apply_changes("nb", narrow, on_schema_drift="evolve")
    assert eng.sql("SELECT count(*) AS n FROM nb").collect()[0].n == 0


def test_commit_replay_failure_fences_writes(eng, spark, monkeypatch):
    """A COMMIT whose replay fails mid-apply leaves the manifest as the
    durable record; the session must refuse further writes until
    recover_transactions completes the apply (otherwise a later attach
    replays the stale tail over newer data)."""
    eng.sql("CREATE TABLE fw (id bigint PRIMARY KEY, v int)")
    eng.sql("BEGIN")
    eng.sql("INSERT INTO fw VALUES (1, 10)")

    real = type(eng).insert
    calls = {"n": 0}

    def flaky(self, dst, df, source_version=None):
        calls["n"] += 1
        raise RuntimeError("transient executor loss")

    monkeypatch.setattr(type(eng), "insert", flaky)
    with pytest.raises(RuntimeError):
        eng.sql("COMMIT")
    monkeypatch.setattr(type(eng), "insert", real)

    with pytest.raises(ValueError, match="incompletely applied"):
        eng.sql("INSERT INTO fw VALUES (2, 20)")
    with pytest.raises(ValueError, match="incompletely applied"):
        eng.sql("UPDATE fw SET v = 1 WHERE id = 1")
    done = eng.recover_transactions()
    assert len(done) == 1
    eng.sql("INSERT INTO fw VALUES (2, 20)")  # fence lifted
    got = sorted((r.id, r.v) for r in eng.sql("SELECT * FROM fw").collect())
    assert got == [(1, 10), (2, 20)]


def test_streaming_sync_enforces_constraints(eng, spark, tmp_path):
    """Postgres logical replication enforces the SUBSCRIBER's
    constraints — a violating replicated row errors and halts the
    stream rather than landing silently (the CDC sync path funnels
    through apply_changes, so the in-job guards ride along)."""
    import os as _os

    from pg_mooncake_spark.streaming.cdc import start_sync

    eng.sql("CREATE TABLE sc (id bigint PRIMARY KEY, "
            "v int CHECK (v >= 0))")
    feed = str(tmp_path / "feed")
    _os.makedirs(feed)
    schema = "id long, v int, __op string"
    spark.createDataFrame([(1, 5, "I"), (2, 7, "I")], schema) \
        .coalesce(1).write.mode("append").parquet(feed)
    stream = spark.readStream.schema(schema).parquet(feed)
    q = start_sync(
        eng, "sc", stream,
        checkpoint_dir=str(tmp_path / "ck"),
        trigger_available_now=True,
    )
    q.awaitTermination()
    assert eng.sql("SELECT count(*) AS n FROM sc").collect()[0].n == 2
    # a violating replicated row halts the stream loudly
    spark.createDataFrame([(3, -1, "I")], schema) \
        .coalesce(1).write.mode("append").parquet(feed)
    stream2 = spark.readStream.schema(schema).parquet(feed)
    q2 = start_sync(
        eng, "sc", stream2,
        checkpoint_dir=str(tmp_path / "ck"),
        trigger_available_now=True,
    )
    with pytest.raises(Exception, match="check constraint"):
        q2.awaitTermination()
    assert eng.sql("SELECT count(*) AS n FROM sc").collect()[0].n == 2


def test_partial_check_fires_on_narrow_batch(eng, spark):
    """An AND-composed CHECK whose PRESENT columns already prove a
    violation must fire on a drift batch; absent inputs substitute as
    the typed NULLs the evolve path fills."""
    eng.sql("""CREATE TABLE pc (
      id bigint PRIMARY KEY, bal int, cap int,
      CONSTRAINT both_pos CHECK (bal >= 0 AND cap >= 0)
    )""")
    bad = spark.createDataFrame([(1, -5, "I")], "id long, bal int, __op string")
    with pytest.raises(Exception, match='check constraint "both_pos"'):
        eng.apply_changes("pc", bad, on_schema_drift="evolve")
    ok = spark.createDataFrame([(1, 5, "I")], "id long, bal int, __op string")
    eng.apply_changes("pc", ok, on_schema_drift="evolve")  # NULL cap: 3VL
    assert eng.sql("SELECT count(*) AS n FROM pc").collect()[0].n == 1


def test_recovery_fence_covers_ddl(eng, spark, monkeypatch):
    eng.sql("CREATE TABLE fd (id bigint PRIMARY KEY, v int)")
    eng.sql("BEGIN")
    eng.sql("INSERT INTO fd VALUES (1, 10)")
    real = type(eng).insert
    monkeypatch.setattr(
        type(eng), "insert",
        lambda self, dst, df, source_version=None:
            (_ for _ in ()).throw(RuntimeError("boom")),
    )
    with pytest.raises(RuntimeError):
        eng.sql("COMMIT")
    monkeypatch.setattr(type(eng), "insert", real)
    with pytest.raises(ValueError, match="incompletely applied"):
        eng.drop_table("fd")
    with pytest.raises(ValueError, match="incompletely applied"):
        eng.sql("ALTER TABLE fd ADD COLUMN w int")
    eng.recover_transactions()
    eng.drop_table("fd")  # fence lifted
