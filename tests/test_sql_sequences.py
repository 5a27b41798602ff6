"""Postgres sequences (round 16): CREATE/ALTER/DROP SEQUENCE,
nextval/currval/setval/lastval, serial columns, identity columns, and
the pg_dump restore shapes.  The reference gets all of this from its
host Postgres (README.md:16 full-SQL contract); here the sequence is
catalog-persisted engine state (catalog.py __sequences__)."""

from __future__ import annotations

import pytest

from pg_mooncake_spark.engine import MooncakeEngine


@pytest.fixture()
def eng(spark, warehouse):
    return MooncakeEngine(spark, warehouse)


def _val(df):
    return df.collect()[0][0]


class TestSequenceBasics:
    def test_create_nextval_currval_lastval(self, eng):
        eng.sql("CREATE SEQUENCE s START WITH 5 INCREMENT BY 3")
        assert _val(eng.sql("SELECT nextval('s')")) == 5
        assert _val(eng.sql("SELECT nextval('s')")) == 8
        assert _val(eng.sql("SELECT currval('s')")) == 8
        assert _val(eng.sql("SELECT lastval()")) == 8

    def test_currval_before_nextval_errors(self, eng):
        eng.sql("CREATE SEQUENCE s2")
        with pytest.raises(ValueError, match="not yet defined"):
            eng.sql("SELECT currval('s2')")

    def test_lastval_before_any_errors(self, eng):
        with pytest.raises(ValueError, match="not yet defined"):
            eng.sql("SELECT lastval()")

    def test_setval_is_called_semantics(self, eng):
        eng.sql("CREATE SEQUENCE s3")
        assert _val(eng.sql("SELECT setval('s3', 42)")) == 42
        assert _val(eng.sql("SELECT nextval('s3')")) == 43
        assert _val(eng.sql("SELECT setval('s3', 100, false)")) == 100
        assert _val(eng.sql("SELECT nextval('s3')")) == 100
        # the pg_dump spelling
        assert _val(eng.sql(
            "SELECT pg_catalog.setval('s3', 7, true)"
        )) == 7
        assert _val(eng.sql("SELECT nextval('s3')")) == 8

    def test_maxvalue_exhaustion_and_cycle(self, eng):
        eng.sql("CREATE SEQUENCE bounded MAXVALUE 2")
        assert _val(eng.sql("SELECT nextval('bounded')")) == 1
        assert _val(eng.sql("SELECT nextval('bounded')")) == 2
        with pytest.raises(ValueError, match="reached maxvalue"):
            eng.sql("SELECT nextval('bounded')")
        eng.sql("CREATE SEQUENCE wheel MAXVALUE 2 CYCLE")
        for expect in (1, 2, 1, 2):
            assert _val(eng.sql("SELECT nextval('wheel')")) == expect

    def test_descending_defaults(self, eng):
        eng.sql("CREATE SEQUENCE down INCREMENT BY -1")
        # descending default start = maxvalue = -1
        assert _val(eng.sql("SELECT nextval('down')")) == -1
        assert _val(eng.sql("SELECT nextval('down')")) == -2

    def test_alter_restart_and_rename(self, eng):
        eng.sql("CREATE SEQUENCE r START WITH 10")
        eng.sql("SELECT nextval('r')")
        eng.sql("ALTER SEQUENCE r RESTART")
        assert _val(eng.sql("SELECT nextval('r')")) == 10
        eng.sql("ALTER SEQUENCE r RESTART WITH 77")
        assert _val(eng.sql("SELECT nextval('r')")) == 77
        eng.sql("ALTER SEQUENCE r RENAME TO r2")
        assert _val(eng.sql("SELECT nextval('r2')")) == 78
        with pytest.raises(ValueError, match="does not exist"):
            eng.sql("SELECT nextval('r')")

    def test_drop_sequence(self, eng):
        eng.sql("CREATE SEQUENCE dd")
        eng.sql("DROP SEQUENCE dd")
        with pytest.raises(ValueError, match="does not exist"):
            eng.sql("SELECT nextval('dd')")
        eng.sql("DROP SEQUENCE IF EXISTS dd")  # no error
        with pytest.raises(ValueError, match="does not exist"):
            eng.sql("DROP SEQUENCE dd")

    def test_update_set_default_on_sequence_column_refuses(self, eng):
        eng.sql("CREATE TABLE usd (k int PRIMARY KEY, id serial, v text)")
        eng.sql("INSERT INTO usd (k, v) VALUES (1, 'a')")
        with pytest.raises(ValueError, match="sequence default"):
            eng.sql("UPDATE usd SET id = DEFAULT WHERE k = 1")
        # ordinary defaults still substitute
        eng.sql("UPDATE usd SET v = DEFAULT WHERE k = 1")
        assert eng.table("usd").collect()[0]["v"] is None

    def test_discard_sequences_clears_session_state(self, eng):
        eng.sql("CREATE SEQUENCE ds")
        eng.sql("SELECT nextval('ds')")
        eng.sql("DISCARD SEQUENCES")
        with pytest.raises(ValueError, match="not yet defined"):
            eng.sql("SELECT currval('ds')")
        with pytest.raises(ValueError, match="not yet defined"):
            eng.sql("SELECT lastval()")
        # the sequence object itself survives (only session state goes)
        assert _val(eng.sql("SELECT nextval('ds')")) == 2

    def test_persistence_across_sessions(self, eng, spark, warehouse):
        eng.sql("CREATE SEQUENCE persist START WITH 3")
        eng.sql("SELECT nextval('persist')")
        eng.sql("CREATE SEQUENCE other")
        eng.sql("SELECT nextval('other')")
        e2 = MooncakeEngine(spark, warehouse)
        assert _val(e2.sql("SELECT nextval('persist')")) == 4
        # currval is per-session, not persisted: 'other' was only ever
        # nextval'd in the FIRST session
        with pytest.raises(ValueError, match="not yet defined"):
            e2.sql("SELECT currval('other')")


class TestSerialColumns:
    def test_serial_assigns_and_advances(self, eng):
        eng.sql("CREATE TABLE st (id serial PRIMARY KEY, v text)")
        eng.sql("INSERT INTO st (v) VALUES ('a'), ('b')")
        eng.sql("INSERT INTO st VALUES (DEFAULT, 'c')")
        rows = sorted(tuple(r) for r in eng.table("st").collect())
        assert rows == [(1, "a"), (2, "b"), (3, "c")]
        # the implicit sequence exists and is owned
        st = eng.catalog.seq_get("st_id_seq")
        assert list(st["owned_by"]) == ["st", "id"]

    def test_bigserial_type(self, eng):
        eng.sql("CREATE TABLE bt (id bigserial, v text)")
        f = next(
            f for f in eng._moontable("bt").schema().fields
            if f.name == "id"
        )
        assert f.dataType.simpleString() == "bigint"

    def test_insert_select_distributed_unique_consecutive(self, eng, spark):
        eng.sql("CREATE TABLE big (id serial, n int)")
        spark.range(500).selectExpr("cast(id as int) n") \
            .repartition(7).createOrReplaceTempView("src500")
        eng.sql("INSERT INTO big (n) SELECT n FROM src500")
        ids = [r.id for r in eng.table("big").collect()]
        assert len(ids) == 500 and len(set(ids)) == 500
        assert min(ids) == 1 and max(ids) == 500

    def test_explicit_nextval_in_values(self, eng):
        eng.sql("CREATE SEQUENCE ex START WITH 100")
        eng.sql("CREATE TABLE ext (id int, v text)")
        eng.sql(
            "INSERT INTO ext VALUES (nextval('ex'), 'a'), "
            "(nextval('ex'), 'b')"
        )
        rows = sorted(tuple(r) for r in eng.table("ext").collect())
        assert rows == [(100, "a"), (101, "b")]

    def test_insert_returning_serial_id(self, eng):
        # THE app statement: INSERT ... RETURNING id on a serial pk —
        # the returned images carry the assigned sequence values
        eng.sql("CREATE TABLE app (id serial PRIMARY KEY, v text)")
        r = eng.sql(
            "INSERT INTO app (v) VALUES ('a') RETURNING id"
        ).collect()
        assert [tuple(x) for x in r] == [(1,)]
        r2 = eng.sql(
            "INSERT INTO app (v) VALUES ('b'), ('c') RETURNING id, v"
        ).collect()
        assert sorted(tuple(x) for x in r2) == [(2, "b"), (3, "c")]
        r3 = eng.sql(
            "INSERT INTO app (id, v) VALUES (100, 'x') "
            "ON CONFLICT (id) DO NOTHING RETURNING id"
        ).collect()
        assert [tuple(x) for x in r3] == [(100,)]

    def test_nextval_in_insert_select_list(self, eng, spark):
        # the migration idiom: INSERT INTO new SELECT nextval('s'), ...
        eng.sql("CREATE SEQUENCE mig START WITH 100")
        eng.sql("CREATE TABLE migt (id bigint, v text)")
        spark.createDataFrame(
            [("a",), ("b",), ("c",)], "v string"
        ).createOrReplaceTempView("mig_src")
        eng.sql(
            "INSERT INTO migt SELECT nextval('mig'), v FROM mig_src"
        )
        rows = sorted(tuple(r) for r in eng.table("migt").collect())
        assert [r[0] for r in rows] == [100, 101, 102]
        assert sorted(r[1] for r in rows) == ["a", "b", "c"]
        # aliased spelling works too; embedded expressions stay loud
        eng.sql(
            "INSERT INTO migt SELECT nextval('mig') AS id, v "
            "FROM mig_src"
        )
        assert eng.table("migt").count() == 6
        with pytest.raises(Exception):
            eng.sql(
                "INSERT INTO migt SELECT nextval('mig') + 1, v "
                "FROM mig_src"
            )

    def test_drop_table_drops_owned_sequence(self, eng):
        eng.sql("CREATE TABLE dt (id serial)")
        assert "dt_id_seq" in eng.catalog.sequences()
        eng.sql("DROP TABLE dt")
        assert "dt_id_seq" not in eng.catalog.sequences()

    def test_drop_column_drops_owned_sequence(self, eng):
        eng.sql("CREATE TABLE dc (k int PRIMARY KEY, id serial, v text)")
        assert "dc_id_seq" in eng.catalog.sequences()
        eng.sql("ALTER TABLE dc DROP COLUMN id")
        assert "dc_id_seq" not in eng.catalog.sequences()

    def test_truncate_restart_identity(self, eng):
        eng.sql("CREATE TABLE tri (id serial, v text)")
        eng.sql("INSERT INTO tri (v) VALUES ('a'), ('b')")
        eng.sql("TRUNCATE tri RESTART IDENTITY")
        eng.sql("INSERT INTO tri (v) VALUES ('c')")
        assert sorted(tuple(r) for r in eng.table("tri").collect()) \
            == [(1, "c")]


class TestIdentityColumns:
    def test_always_refuses_explicit(self, eng):
        eng.sql(
            "CREATE TABLE it (id int GENERATED ALWAYS AS IDENTITY "
            "PRIMARY KEY, v text)"
        )
        eng.sql("INSERT INTO it (v) VALUES ('x')")
        with pytest.raises(ValueError, match="GENERATED ALWAYS"):
            eng.sql("INSERT INTO it (id, v) VALUES (9, 'y')")
        eng.sql("INSERT INTO it (id, v) VALUES (DEFAULT, 'y')")
        assert sorted(tuple(r) for r in eng.table("it").collect()) \
            == [(1, "x"), (2, "y")]

    def test_overriding_system_value(self, eng):
        eng.sql(
            "CREATE TABLE io (id int GENERATED ALWAYS AS IDENTITY, v text)"
        )
        eng.sql(
            "INSERT INTO io (id, v) OVERRIDING SYSTEM VALUE "
            "VALUES (50, 'x')"
        )
        assert sorted(tuple(r) for r in eng.table("io").collect()) \
            == [(50, "x")]

    def test_overriding_user_value(self, eng):
        eng.sql(
            "CREATE TABLE iu (id int GENERATED BY DEFAULT AS IDENTITY, "
            "v text)"
        )
        eng.sql(
            "INSERT INTO iu (id, v) OVERRIDING USER VALUE "
            "VALUES (99, 'x'), (98, 'y')"
        )
        ids = sorted(r.id for r in eng.table("iu").collect())
        assert ids == [1, 2]  # user values discarded, sequence used

    def test_by_default_accepts_explicit(self, eng):
        eng.sql(
            "CREATE TABLE ib (id int GENERATED BY DEFAULT AS IDENTITY, "
            "v text)"
        )
        eng.sql("INSERT INTO ib (id, v) VALUES (7, 'x')")
        eng.sql("INSERT INTO ib (v) VALUES ('y')")
        assert sorted(tuple(r) for r in eng.table("ib").collect()) \
            == [(1, "y"), (7, "x")]

    def test_identity_options(self, eng):
        eng.sql(
            "CREATE TABLE opt (id int GENERATED ALWAYS AS IDENTITY "
            "(START WITH 1000 INCREMENT BY 10), v text)"
        )
        eng.sql("INSERT INTO opt (v) VALUES ('a'), ('b')")
        assert sorted(r.id for r in eng.table("opt").collect()) \
            == [1000, 1010]

    def test_drop_identity(self, eng):
        eng.sql(
            "CREATE TABLE di (id int GENERATED BY DEFAULT AS IDENTITY "
            "PRIMARY KEY, v text)"
        )
        eng.sql("ALTER TABLE di ALTER COLUMN id DROP IDENTITY")
        assert "di_id_seq" not in eng.catalog.sequences()
        # no default anymore: an unlisted id now inserts NULL → NOT
        # NULL (pk) refuses
        with pytest.raises(Exception):
            eng.sql("INSERT INTO di (v) VALUES ('x')")


class TestSequenceTxn:
    def test_create_rolls_back(self, eng):
        eng.sql("BEGIN")
        eng.sql("CREATE SEQUENCE ts")
        assert _val(eng.sql("SELECT nextval('ts')")) == 1
        eng.sql("ROLLBACK")
        assert "ts" not in eng.catalog.sequences()

    def test_nextval_is_nontransactional(self, eng):
        eng.sql("CREATE SEQUENCE nt")
        eng.sql("BEGIN")
        eng.sql("SELECT nextval('nt')")
        eng.sql("SELECT nextval('nt')")
        eng.sql("ROLLBACK")
        # values consumed in the rolled-back block stay consumed (PG)
        assert _val(eng.sql("SELECT nextval('nt')")) == 3

    def test_alter_options_roll_back_position_kept(self, eng):
        eng.sql("CREATE SEQUENCE ao")
        eng.sql("SELECT nextval('ao')")
        eng.sql("BEGIN")
        eng.sql("ALTER SEQUENCE ao INCREMENT BY 9")
        eng.sql("SELECT nextval('ao')")  # 10 with inc 9
        eng.sql("ROLLBACK")
        st = eng.catalog.seq_get("ao")
        assert st["increment"] == 1      # option restored
        assert st["last_value"] == 10    # position kept (PG)

    def test_drop_rolls_back_fully(self, eng):
        eng.sql("CREATE SEQUENCE dr START WITH 5")
        eng.sql("SELECT nextval('dr')")
        eng.sql("BEGIN")
        eng.sql("DROP SEQUENCE dr")
        eng.sql("ROLLBACK")
        assert _val(eng.sql("SELECT nextval('dr')")) == 6

    def test_savepoint_unwind(self, eng):
        eng.sql("BEGIN")
        eng.sql("CREATE SEQUENCE sp_a")
        eng.sql("SAVEPOINT s1")
        eng.sql("CREATE SEQUENCE sp_b")
        eng.sql("ROLLBACK TO s1")
        assert "sp_b" not in eng.catalog.sequences()
        assert "sp_a" in eng.catalog.sequences()
        eng.sql("COMMIT")
        assert "sp_a" in eng.catalog.sequences()

    def test_serial_create_table_in_txn(self, eng):
        eng.sql("BEGIN")
        eng.sql("CREATE TABLE stx (id serial PRIMARY KEY, v text)")
        eng.sql("INSERT INTO stx (v) VALUES ('a')")
        eng.sql("COMMIT")
        assert sorted(tuple(r) for r in eng.table("stx").collect()) \
            == [(1, "a")]
        eng.sql("BEGIN")
        eng.sql("CREATE TABLE sty (id serial)")
        eng.sql("ROLLBACK")
        assert "sty_id_seq" not in eng.catalog.sequences()


class TestDumpShapes:
    """The statement sequences a verbatim pg_dump emits."""

    def test_serial_wiring(self, eng):
        for s in [
            "BEGIN",
            "CREATE TABLE public.users (id integer NOT NULL, name text)",
            "CREATE SEQUENCE public.users_id_seq AS integer START WITH 1 "
            "INCREMENT BY 1 NO MINVALUE NO MAXVALUE CACHE 1",
            "ALTER SEQUENCE public.users_id_seq OWNED BY public.users.id",
            "ALTER TABLE ONLY public.users ALTER COLUMN id SET DEFAULT "
            "nextval('public.users_id_seq'::regclass)",
            "COMMIT",
        ]:
            eng.sql(s)
        eng.sql("INSERT INTO public.users (name) VALUES ('ann'), ('bo')")
        assert _val(eng.sql(
            "SELECT pg_catalog.setval('public.users_id_seq', 50, true)"
        )) == 50
        eng.sql("INSERT INTO public.users (name) VALUES ('cy')")
        assert sorted(tuple(r) for r in
                      eng.table("public.users").collect()) \
            == [(1, "ann"), (2, "bo"), (51, "cy")]

    def test_identity_wiring_in_single_transaction(self, eng):
        eng.sql("BEGIN")
        eng.sql("CREATE TABLE public.ev (id bigint NOT NULL, t text)")
        eng.sql(
            "ALTER TABLE public.ev ALTER COLUMN id ADD GENERATED ALWAYS "
            "AS IDENTITY (SEQUENCE NAME public.ev_id_seq START WITH 1 "
            "INCREMENT BY 1 NO MINVALUE NO MAXVALUE CACHE 1)"
        )
        eng.sql("INSERT INTO public.ev (t) VALUES ('in-block')")
        eng.sql("COMMIT")
        eng.sql("INSERT INTO public.ev (t) VALUES ('after')")
        assert sorted(tuple(r) for r in eng.table("public.ev").collect()) \
            == [(1, "in-block"), (2, "after")]

    def test_savepoint_restores_staged_spec(self, eng):
        eng.sql("BEGIN")
        eng.sql("CREATE TABLE public.sp (id integer NOT NULL, t text)")
        eng.sql("SAVEPOINT s1")
        eng.sql(
            "ALTER TABLE public.sp ALTER COLUMN id ADD GENERATED "
            "BY DEFAULT AS IDENTITY"
        )
        eng.sql("ROLLBACK TO s1")
        eng.sql("COMMIT")
        assert not [
            s for s in eng.catalog.sequences() if "sp_id" in s
        ]
        assert "identity" not in (eng._constraints("public.sp") or {})
