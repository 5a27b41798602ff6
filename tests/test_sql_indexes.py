"""CREATE/DROP INDEX and REINDEX (round 15) — the pg_dump/app
spelling, validated and catalog-recorded but execution-inert: a
columnstore prunes scans by per-file statistics, not b-trees.  UNIQUE
refuses loudly (it would silently not enforce)."""

from __future__ import annotations

import pytest

from pg_mooncake_spark.engine import MooncakeEngine


@pytest.fixture()
def eng(spark, warehouse):
    e = MooncakeEngine(spark, warehouse)
    e.sql("CREATE TABLE t (k int PRIMARY KEY, v text, x double)")
    e.sql("INSERT INTO t VALUES (1, 'a', 1.0), (2, 'b', 2.0)")
    return e


def _indexes(eng, t="t"):
    return dict((eng._constraints(t) or {}).get("indexes") or {})


class TestCreateIndex:
    def test_create_records_and_results_unchanged(self, eng):
        r = eng.sql("CREATE INDEX t_v_idx ON t (v)").collect()[0]
        assert r["statement"] == "CREATE INDEX"
        assert "t_v_idx" in _indexes(eng)
        # inert: queries still answer identically
        assert eng.sql("SELECT count(*) AS n FROM t WHERE v = 'a'") \
            .collect()[0]["n"] == 1

    def test_auto_name_and_dedup(self, eng):
        eng.sql("CREATE INDEX ON t (v)")
        eng.sql("CREATE INDEX ON t (v, k)")
        names = set(_indexes(eng))
        assert "t_v_idx" in names and "t_v_idx1" in names

    def test_unique_validates_then_records(self, eng):
        # round 17: no longer a refusal — the uniqueness scan runs at
        # build time and the index records as validated
        eng.sql("CREATE UNIQUE INDEX u_idx ON t (v)")
        assert _indexes(eng)["u_idx"].get("unique") == "validated"

    def test_unknown_column_refuses(self, eng):
        with pytest.raises(ValueError, match="does not exist"):
            eng.sql("CREATE INDEX bad_idx ON t (nope)")

    def test_expression_index_validates(self, eng):
        eng.sql("CREATE INDEX expr_idx ON t (lower(v), (x * 2) DESC)")
        assert _indexes(eng)["expr_idx"]["cols"] == ["lower(v)", "(x * 2)"]
        with pytest.raises(Exception):
            eng.sql("CREATE INDEX bad2_idx ON t (lower(nope))")

    def test_partial_index_where_validates(self, eng):
        eng.sql("CREATE INDEX part_idx ON t (k) WHERE x > 1.0")
        assert _indexes(eng)["part_idx"]["where"] == "x > 1.0"
        with pytest.raises(Exception):
            eng.sql("CREATE INDEX bad3_idx ON t (k) WHERE nope > 1")

    def test_duplicate_name_schema_wide(self, eng):
        eng.sql("CREATE TABLE t2 (a int PRIMARY KEY)")
        eng.sql("CREATE INDEX shared_idx ON t (v)")
        with pytest.raises(ValueError, match="already exists"):
            eng.sql("CREATE INDEX shared_idx ON t2 (a)")
        # IF NOT EXISTS: quiet no-op
        r = eng.sql(
            "CREATE INDEX IF NOT EXISTS shared_idx ON t2 (a)"
        ).collect()[0]
        assert r["version"] == 0

    def test_using_and_options_accepted(self, eng):
        eng.sql(
            "CREATE INDEX CONCURRENTLY opt_idx ON t USING btree (v ASC) "
            "WITH (fillfactor = 70)"
        )
        assert "opt_idx" in _indexes(eng)


class TestDropReindex:
    def test_drop_index(self, eng):
        eng.sql("CREATE INDEX d_idx ON t (v)")
        eng.sql("DROP INDEX d_idx")
        assert "d_idx" not in _indexes(eng)
        with pytest.raises(ValueError, match="does not exist"):
            eng.sql("DROP INDEX d_idx")
        eng.sql("DROP INDEX IF EXISTS d_idx")  # quiet

    def test_drop_multiple(self, eng):
        eng.sql("CREATE INDEX i1 ON t (v)")
        eng.sql("CREATE INDEX i2 ON t (k)")
        eng.sql("DROP INDEX i1, i2 CASCADE")
        assert not _indexes(eng)

    def test_drop_table_drops_its_indexes(self, eng):
        eng.sql("CREATE INDEX gone_idx ON t (v)")
        eng.sql("DROP TABLE t")
        eng.sql("CREATE TABLE t3 (a int PRIMARY KEY)")
        # the name is free again (schema-wide registry rebuilt)
        eng.sql("CREATE INDEX gone_idx ON t3 (a)")

    def test_reindex(self, eng):
        eng.sql("CREATE INDEX r_idx ON t (v)")
        assert eng.sql("REINDEX INDEX r_idx").collect()[0][
            "statement"] == "REINDEX"
        eng.sql("REINDEX TABLE t")
        with pytest.raises(ValueError, match="does not exist"):
            eng.sql("REINDEX INDEX nope_idx")
        with pytest.raises(Exception):
            eng.sql("REINDEX TABLE no_such_table")

    def test_reindex_quoted_mixed_case(self, eng):
        # quoted identifiers keep case through the same folding CREATE
        # used (round-15 advice: strip+lower spuriously errored here)
        eng.sql('CREATE INDEX "MyIdx" ON t (v)')
        assert "MyIdx" in _indexes(eng)
        eng.sql('REINDEX INDEX "MyIdx"')
        with pytest.raises(ValueError, match="does not exist"):
            eng.sql("REINDEX INDEX MyIdx")  # unquoted folds to myidx

    def test_unique_validates_by_default(self, eng):
        # round 17: validate-then-record (the r16 PK pattern) — the
        # uniqueness scan runs at build time; the GUC skips it
        eng.sql("CREATE UNIQUE INDEX u_opt_idx ON t (v)")
        assert _indexes(eng)["u_opt_idx"].get("unique") == "validated"
        # round 18: the validated index is write-enforced too — the
        # dup-v setup insert needs the bulk-load hatch
        eng.sql("SET mooncake.skip_unique_write_checks = on")
        eng.sql("INSERT INTO t VALUES (3, 'b', 3.0)")  # dup v='b'
        eng.sql("RESET mooncake.skip_unique_write_checks")
        with pytest.raises(ValueError, match="duplicate key"):
            eng.sql("CREATE UNIQUE INDEX u_dup_idx ON t (v)")
        eng.sql("SET mooncake.allow_unenforced_unique_indexes = on")
        eng.sql("CREATE UNIQUE INDEX u_dup_idx ON t (v)")
        assert _indexes(eng)["u_dup_idx"].get("unique") == "unenforced"
        eng.sql("RESET mooncake.allow_unenforced_unique_indexes")


class TestIndexInTxn:
    """Index DDL stages inside transaction blocks WITHOUT the
    untouched-table gates — inert metadata cannot invalidate staged
    batches, and pg_dump --single-transaction loads data then builds
    indexes on the same tables in one block."""

    def test_data_then_index_same_table_one_block(self, eng):
        eng.sql("BEGIN")
        eng.sql("INSERT INTO t VALUES (3, 'c', 3.0)")
        eng.sql("CREATE INDEX late_idx ON t (v)")  # after DML: allowed
        eng.sql("INSERT INTO t VALUES (4, 'd', 4.0)")  # DML after: allowed
        eng.sql("COMMIT")
        assert "late_idx" in _indexes(eng)
        assert eng.table("t").count() == 4

    def test_rollback_leaves_no_index(self, eng):
        eng.sql("BEGIN")
        eng.sql("CREATE INDEX ghost_idx ON t (v)")
        # read-your-writes: a duplicate errors inside the block
        with pytest.raises(ValueError, match="already exists"):
            eng.sql("CREATE INDEX ghost_idx ON t (k)")
        eng.sql("ROLLBACK")
        assert "ghost_idx" not in _indexes(eng)
        eng.sql("CREATE INDEX ghost_idx ON t (v)")  # name free again

    def test_staged_drop_index(self, eng):
        eng.sql("CREATE INDEX sd_idx ON t (v)")
        eng.sql("BEGIN")
        eng.sql("DROP INDEX sd_idx")
        # read-your-writes: the name is droppable/creatable again
        eng.sql("CREATE INDEX sd_idx ON t (k)")
        eng.sql("COMMIT")
        assert _indexes(eng)["sd_idx"]["cols"] == ["k"]

    def test_savepoint_rolls_back_staged_index(self, eng):
        eng.sql("BEGIN")
        eng.sql("SAVEPOINT sp")
        eng.sql("CREATE INDEX sp_idx ON t (v)")
        eng.sql("ROLLBACK TO sp")
        eng.sql("CREATE INDEX sp_idx ON t (k)")  # name free again
        eng.sql("COMMIT")
        assert _indexes(eng)["sp_idx"]["cols"] == ["k"]


class TestPgCatalog:
    """pg_catalog.pg_tables / pg_views / pg_indexes — the relations
    psql's \\dt / \\dv / \\di and ORM introspection read (unqualified
    spellings too: pg_catalog is always on the Postgres search
    path)."""

    def test_pg_tables(self, eng):
        rows = eng.sql(
            "SELECT * FROM pg_catalog.pg_tables WHERE tablename = 't'"
        ).collect()
        assert len(rows) == 1 and rows[0].hasindexes is False
        eng.sql("CREATE INDEX pt_idx ON t (v)")
        assert eng.sql(
            "SELECT hasindexes FROM pg_tables WHERE tablename = 't'"
        ).collect()[0].hasindexes is True

    def test_pg_views_lists_views_not_tables(self, eng):
        eng.sql("CREATE VIEW v_small AS SELECT k FROM t WHERE k > 1")
        rows = eng.sql("SELECT viewname, definition FROM pg_views").collect()
        byname = {r.viewname: r.definition for r in rows}
        assert "v_small" in byname
        assert "k > 1" in byname["v_small"]
        assert "t" not in byname  # base tables are not views

    def test_pg_indexes_definition_replays(self, eng):
        eng.sql("CREATE INDEX pi_idx ON t (v, lower(v)) WHERE k > 0")
        row = eng.sql(
            "SELECT * FROM pg_indexes WHERE indexname = 'pi_idx'"
        ).collect()[0]
        assert row.tablename == "t"
        eng.sql("DROP INDEX pi_idx")
        eng.sql(row.indexdef)  # the stored definition is replayable
        assert "pi_idx" in _indexes(eng)

    def test_string_literal_untouched(self, eng):
        r = eng.sql("SELECT 'pg_tables' AS s").collect()[0]
        assert r.s == "pg_tables"


class TestIndexSchemaChanges:
    """Review r15: index metadata must survive the constraint-dict
    rebuilds in rename_column / drop_column (both rebuild the dict
    explicitly and previously dropped unknown keys)."""

    def test_rename_column_renames_index_keys(self, eng):
        eng.sql("CREATE INDEX rn_idx ON t (v, lower(v)) WHERE v <> ''")
        eng.sql("ALTER TABLE t RENAME COLUMN v TO w")
        spec = _indexes(eng)["rn_idx"]
        assert spec["cols"] == ["w", "lower(w)"]
        assert spec["where"] == "w <> ''"

    def test_drop_column_drops_dependent_indexes_only(self, eng):
        eng.sql("CREATE INDEX on_v ON t (v)")
        eng.sql("CREATE INDEX on_k ON t (k)")
        eng.sql("CREATE INDEX part_on_v ON t (k) WHERE v = 'a'")
        eng.sql("ALTER TABLE t DROP COLUMN v")
        left = set(_indexes(eng))
        assert left == {"on_k"}


class TestCommentOn:
    """COMMENT ON — pg_dump emits one per documented object; the text
    persists in catalog metadata, IS NULL removes it, targets validate
    for real, and the write stages inside transaction blocks (inert
    metadata, like index DDL)."""

    def _comments(self, eng, t="t"):
        return dict((eng._constraints(t) or {}).get("comments") or {})

    def test_table_column_index_constraint(self, eng):
        eng.sql("CREATE INDEX c_idx ON t (v)")
        eng.sql("ALTER TABLE t ADD CONSTRAINT t_pos CHECK (x > 0)")
        eng.sql("COMMENT ON TABLE t IS 'the it''s table'")
        eng.sql("COMMENT ON COLUMN t.v IS 'a text column'")
        eng.sql("COMMENT ON INDEX c_idx IS 'an index'")
        eng.sql("COMMENT ON CONSTRAINT t_pos ON t IS 'positive'")
        com = self._comments(eng)
        assert com["__table__"] == "the it's table"
        assert com["col:v"] == "a text column"
        assert com["index:c_idx"] == "an index"
        assert com["constraint:t_pos"] == "positive"
        # IS NULL removes
        eng.sql("COMMENT ON COLUMN t.v IS NULL")
        assert "col:v" not in self._comments(eng)

    def test_unknown_targets_refuse(self, eng):
        with pytest.raises(ValueError, match="does not exist"):
            eng.sql("COMMENT ON TABLE nope IS 'x'")
        with pytest.raises(ValueError, match="does not exist"):
            eng.sql("COMMENT ON COLUMN t.nope IS 'x'")
        with pytest.raises(ValueError, match="does not exist"):
            eng.sql("COMMENT ON INDEX nope IS 'x'")

    def test_stages_in_txn(self, eng):
        eng.sql("BEGIN")
        eng.sql("INSERT INTO t VALUES (3, 'c', 3.0)")  # DML coexists
        eng.sql("COMMENT ON TABLE t IS 'staged'")
        eng.sql("ROLLBACK")
        assert not self._comments(eng)
        eng.sql("BEGIN")
        eng.sql("COMMENT ON TABLE t IS 'committed'")
        eng.sql("COMMIT")
        assert self._comments(eng)["__table__"] == "committed"

    def test_comment_survives_rename_and_drop_column(self, eng):
        eng.sql("COMMENT ON TABLE t IS 'kept'")
        eng.sql("COMMENT ON COLUMN t.v IS 'renamed along'")
        eng.sql("COMMENT ON COLUMN t.x IS 'dropped along'")
        eng.sql("ALTER TABLE t RENAME COLUMN v TO w")
        com = self._comments(eng)
        assert com["__table__"] == "kept"
        assert com["col:w"] == "renamed along"
        eng.sql("ALTER TABLE t DROP COLUMN x")
        com = self._comments(eng)
        assert com["__table__"] == "kept" and "col:x" not in com

    def test_comment_on_view(self, eng):
        eng.sql("CREATE VIEW tv AS SELECT k FROM t")
        eng.sql("COMMENT ON VIEW tv IS 'a view'")
        assert self._comments(eng, "tv")["__table__"] == "a view"


class TestTruncateModifiers:
    def test_multi_table_and_tokens(self, eng):
        eng.sql("CREATE TABLE t9 (a int PRIMARY KEY)")
        eng.sql("INSERT INTO t9 VALUES (1)")
        eng.sql("TRUNCATE TABLE ONLY t, t9 RESTART IDENTITY CASCADE")
        assert eng.table("t").count() == 0
        assert eng.table("t9").count() == 0

    def test_in_txn_stages_each(self, eng):
        eng.sql("CREATE TABLE t8 (a int PRIMARY KEY)")
        eng.sql("INSERT INTO t8 VALUES (1)")
        eng.sql("BEGIN")
        eng.sql("TRUNCATE t, t8 CONTINUE IDENTITY")
        assert eng.sql("SELECT count(*) AS n FROM t").collect()[0].n == 0
        eng.sql("ROLLBACK")
        assert eng.table("t").count() == 2
        assert eng.table("t8").count() == 1

    def test_quoted_schema_qualified_spellings(self, eng):
        # round-15 advice: blanket strip('"') mangled "s"."t" — the
        # per-element parse must accept valid Postgres spellings
        eng.sql('CREATE TABLE "s"."qt" (a int PRIMARY KEY)')
        eng.sql('INSERT INTO "s"."qt" VALUES (1)')
        eng.sql("CREATE TABLE plain9 (a int PRIMARY KEY)")
        eng.sql("INSERT INTO plain9 VALUES (1)")
        eng.sql('TRUNCATE "s"."qt", plain9')
        assert eng.table("s.qt").count() == 0
        assert eng.table("plain9").count() == 0
        # LOCK's table list takes the same per-element parse
        eng.sql("BEGIN")
        eng.sql('LOCK TABLE "s"."qt", ONLY plain9 IN SHARE MODE')
        eng.sql("COMMIT")
