"""Round-17 regression tests for the ADVICE.md r16 findings: the
structured owned-sequence encoding (dotted-name collisions), atomic
ALTER COLUMN TYPE dependent-expression analysis, ALTER SEQUENCE AS
bound re-derivation, quote-masked nextval materialization, and the
DROP SEQUENCE owned-dependency refusal."""

from __future__ import annotations

import pytest

from pg_mooncake_spark.engine import MooncakeEngine


@pytest.fixture()
def eng(spark, warehouse):
    return MooncakeEngine(spark, warehouse)


class TestOwnedSequenceStructuredEncoding:
    """ADVICE r16 (medium): owned_by was a dotted string matched by
    prefix — a table ``a`` and a table ``a.b`` (schema ``a``) collided
    on every owner scan."""

    @pytest.fixture()
    def pair(self, eng):
        eng.sql("CREATE SCHEMA a")
        eng.sql("CREATE TABLE a.b (id serial PRIMARY KEY, v int)")
        eng.sql("CREATE TABLE a (id serial PRIMARY KEY, v int)")
        eng.sql("INSERT INTO a.b (v) VALUES (1), (2)")
        eng.sql("INSERT INTO a (v) VALUES (10)")
        return eng

    def test_drop_table_does_not_cascade_to_dotted_sibling(self, pair):
        pair.sql("DROP TABLE a")
        # a.b's serial sequence must survive and keep assigning
        pair.sql("INSERT INTO a.b (v) VALUES (3)")
        rows = pair.sql("SELECT id, v FROM a.b ORDER BY id").collect()
        assert [r.id for r in rows] == [1, 2, 3]

    def test_truncate_restart_does_not_reset_sibling(self, pair):
        pair.sql("TRUNCATE a RESTART IDENTITY")
        seq = pair.catalog.seq_get("a.b_id_seq")
        assert seq["last_value"] == 2 and seq["is_called"]

    def test_rename_does_not_rewrite_sibling_owner(self, pair, spark,
                                                   warehouse):
        pair.sql("ALTER TABLE a RENAME TO x")
        seq = pair.catalog.seq_get("a.b_id_seq")
        assert list(seq["owned_by"]) == ["a.b", "id"]
        # engine restart reaps orphans — a.b's sequence must survive
        e2 = MooncakeEngine(spark, warehouse)
        assert "a.b_id_seq" in e2.catalog.sequences()
        e2.sql("INSERT INTO a.b (v) VALUES (3)")
        assert e2.table("a.b").count() == 3


class TestAlterColumnTypeAtomicity:
    """ADVICE r16 (low): dependent DEFAULT/CHECK analysis ran AFTER the
    retype committed — a failing expression left a half-applied DDL."""

    def test_failing_check_refuses_before_rewrite(self, eng):
        eng.sql(
            "CREATE TABLE rt (k int PRIMARY KEY, v int, "
            "CONSTRAINT bits CHECK (bit_count(v) >= 0))"
        )
        eng.sql("INSERT INTO rt VALUES (1, 3)")
        with pytest.raises(ValueError, match="invalid CHECK"):
            eng.sql("ALTER TABLE rt ALTER COLUMN v TYPE text")
        # nothing committed: type unchanged, data intact, writes work
        fld = {f.name: f.dataType.simpleString()
               for f in eng.table("rt").schema.fields}
        assert fld["v"] == "int"
        eng.sql("INSERT INTO rt VALUES (2, 5)")
        assert eng.table("rt").count() == 2


class TestAlterSequenceAsType:
    """ADVICE r16 (low): AS <type> kept the old type's default bounds."""

    def test_default_bounds_rederive(self, eng):
        eng.sql("CREATE SEQUENCE s_as")
        eng.sql("ALTER SEQUENCE s_as AS smallint")
        st = eng.catalog.seq_get("s_as")
        assert st["maxvalue"] == 32767
        assert st["data_type"] == "smallint"

    def test_retained_explicit_bound_out_of_range_errors(self, eng):
        eng.sql("CREATE SEQUENCE s_big MAXVALUE 100000")
        with pytest.raises(ValueError, match="out of range"):
            eng.sql("ALTER SEQUENCE s_big AS smallint")

    def test_widening_keeps_small_bounds_only_if_explicit(self, eng):
        eng.sql("CREATE SEQUENCE s_sm AS smallint")
        eng.sql("ALTER SEQUENCE s_sm AS bigint")
        st = eng.catalog.seq_get("s_sm")
        assert st["maxvalue"] == 9223372036854775807


class TestNextvalQuoteMasking:
    """ADVICE r16 (low): nextval substitution matched across string-
    literal boundaries in VALUES text."""

    def test_literal_spanning_values_survive(self, eng):
        eng.sql("CREATE TABLE nv (s text)")
        eng.sql(
            "INSERT INTO nv VALUES ('id=nextval(' || 'x' || ')')"
        )
        assert eng.table("nv").collect()[0].s == "id=nextval(x)"

    def test_real_nextval_still_materializes(self, eng):
        eng.sql("CREATE SEQUENCE nv_seq")
        eng.sql("CREATE TABLE nv2 (k bigint, s text)")
        eng.sql(
            "INSERT INTO nv2 VALUES (nextval('nv_seq'), 'a'), "
            "(nextval('nv_seq'), 'nextval(''nv_seq'')')"
        )
        rows = eng.sql("SELECT k, s FROM nv2 ORDER BY k").collect()
        assert [r.k for r in rows] == [1, 2]
        # the literal mentioning nextval is stored verbatim
        assert rows[1].s == "nextval('nv_seq')"
        assert eng.catalog.seq_get("nv_seq")["last_value"] == 2


class TestDropOwnedSequenceRefused:
    """ADVICE r16 (low): DROP SEQUENCE on a serial/identity-owned
    sequence left the column's nextval default dangling."""

    def test_refuses_with_dependency_error(self, eng):
        eng.sql("CREATE TABLE ds (id serial PRIMARY KEY, v int)")
        with pytest.raises(ValueError, match="requires it"):
            eng.sql("DROP SEQUENCE ds_id_seq")
        # the sanctioned path still cascades
        eng.sql("DROP TABLE ds")
        assert "ds_id_seq" not in eng.catalog.sequences()


class TestPublicSchemaAliasAndQualifiedSelect:
    """Round-17 self-found gap: schema-qualified relation references in
    SELECT never resolved (Spark has no 'public' namespace), and
    ``public.t`` / ``t`` were treated as distinct relations — every ORM
    and pg_dump emits the qualified spelling."""

    def test_qualified_select_on_bare_table(self, eng):
        eng.sql("CREATE TABLE pt (k int PRIMARY KEY)")
        eng.sql("INSERT INTO pt VALUES (1), (2)")
        assert eng.sql(
            "SELECT count(*) AS n FROM public.pt"
        ).collect()[0].n == 2

    def test_bare_select_on_qualified_table(self, eng):
        eng.sql("CREATE TABLE public.qt (k int PRIMARY KEY)")
        eng.sql("INSERT INTO qt VALUES (3)")
        assert eng.sql("SELECT k FROM qt").collect()[0].k == 3
        assert eng.sql("SELECT k FROM public.qt").collect()[0].k == 3

    def test_custom_schema_qualified_select(self, eng):
        eng.sql("CREATE SCHEMA app")
        eng.sql("CREATE TABLE app.items (id int PRIMARY KEY, v text)")
        eng.sql("INSERT INTO app.items VALUES (1, 'x')")
        rows = eng.sql(
            "SELECT i.id, i.v FROM app.items i ORDER BY i.id"
        ).collect()
        assert [(r.id, r.v) for r in rows] == [(1, "x")]

    def test_qualified_join(self, eng):
        eng.sql("CREATE TABLE jt1 (k int PRIMARY KEY)")
        eng.sql("CREATE TABLE jt2 (k int PRIMARY KEY, v int)")
        eng.sql("INSERT INTO jt1 VALUES (1)")
        eng.sql("INSERT INTO jt2 VALUES (1, 7)")
        r = eng.sql(
            "SELECT b.v FROM public.jt1 a JOIN public.jt2 b ON a.k = b.k"
        ).collect()
        assert [x.v for x in r] == [7]

    def test_duplicate_across_spellings_refused(self, eng):
        eng.sql("CREATE TABLE dup17 (k int PRIMARY KEY)")
        with pytest.raises(ValueError, match="already registered"):
            eng.sql("CREATE TABLE public.dup17 (k int PRIMARY KEY)")

    def test_qualified_dml_and_drop(self, eng):
        eng.sql("CREATE TABLE dml17 (k int PRIMARY KEY, v int)")
        eng.sql("INSERT INTO public.dml17 VALUES (1, 1)")
        eng.sql("UPDATE public.dml17 SET v = 2 WHERE k = 1")
        assert eng.table("dml17").collect()[0].v == 2
        eng.sql("DROP TABLE public.dml17")
        assert "dml17" not in eng.catalog.list_tables()

    def test_dotted_alias_column_untouched(self, eng):
        # d.v where d is a FROM alias, not a relation — must not rewrite
        eng.sql("CREATE TABLE dv (v int PRIMARY KEY)")
        eng.sql("INSERT INTO dv VALUES (5)")
        assert eng.sql("SELECT d.v FROM dv d").collect()[0].v == 5
