"""SQL DDL routing through engine.sql — the statement wrapper around the
reference's regress flow (reference tests/pg_regress/sql/sanity.sql:1,7
and partitioned_table.sql wrap the DML in CREATE TABLE / DROP TABLE;
TRUNCATE/ALTER complete the heap-side surface a Postgres user has)."""

from __future__ import annotations

import pytest

from pg_mooncake_spark.engine import MooncakeEngine, _pg_type_to_spark


@pytest.fixture()
def eng(spark, warehouse):
    return MooncakeEngine(spark, warehouse)


class TestTypeResolution:
    def test_postgres_spellings(self, spark):
        cases = {
            "int": "int", "integer": "int", "bigint": "bigint",
            "smallint": "smallint", "text": "string",
            "varchar(30)": "string", "character varying(10)": "string",
            "double precision": "double", "real": "float",
            "numeric(12,2)": "decimal(12,2)", "decimal(5,1)": "decimal(5,1)",
            "numeric": "decimal(38,18)", "boolean": "boolean",
            "bytea": "binary", "date": "date", "timestamp": "timestamp",
            "timestamp with time zone": "timestamp",
        }
        for pg, want in cases.items():
            assert _pg_type_to_spark(pg).simpleString() == want, pg

    def test_spark_ddl_falls_through(self, spark):
        assert _pg_type_to_spark("array<int>").simpleString() == "array<int>"
        with pytest.raises(Exception):
            _pg_type_to_spark("not a type")


class TestSqlDdl:
    def test_reference_sanity_flow(self, eng):
        """sanity.sql end-to-end as statements: CREATE/INSERT/UPDATE/
        DELETE/SELECT/DROP."""
        eng.sql("CREATE TABLE r (a int PRIMARY KEY, b text)")
        eng.sql("INSERT INTO r VALUES (1, 'a'), (2, 'b'), (3, 'c')")
        eng.sql("UPDATE r SET b = a + 1 WHERE a > 2")
        eng.sql("DELETE FROM r WHERE a < 2")
        rows = sorted(tuple(x) for x in eng.sql("SELECT * FROM r").collect())
        assert rows == [(2, "b"), (3, "4")]
        eng.sql("DROP TABLE r")
        assert "r" not in eng.catalog.list_tables()

    def test_create_table_level_pk_and_types(self, eng):
        eng.sql(
            "CREATE TABLE typed (k bigint, amt numeric(12,2), "
            "name varchar(30), ok boolean, PRIMARY KEY (k))"
        )
        mt = eng._moontable("typed")
        sch = {f.name: f.dataType.simpleString() for f in mt.schema().fields}
        assert sch == {
            "k": "bigint", "amt": "decimal(12,2)",
            "name": "string", "ok": "boolean",
        }
        assert mt.primary_key() == ["k"]

    def test_create_if_not_exists_and_duplicate(self, eng):
        eng.sql("CREATE TABLE t1 (k int PRIMARY KEY)")
        eng.sql("CREATE TABLE IF NOT EXISTS t1 (other text)")  # no-op
        with pytest.raises(ValueError, match="already registered"):
            eng.sql("CREATE TABLE t1 (k int)")
        assert [f.name for f in eng._moontable("t1").schema().fields] == ["k"]

    def test_ctas(self, eng, spark):
        eng.sql("CREATE TABLE base (k int PRIMARY KEY, v text)")
        eng.sql("INSERT INTO base VALUES (1, 'a'), (2, 'b')")
        eng.sql("CREATE TABLE derived AS SELECT k, upper(v) AS v FROM base")
        rows = sorted(tuple(x) for x in eng.table("derived").collect())
        assert rows == [(1, "A"), (2, "B")]

    def test_truncate(self, eng):
        eng.sql("CREATE TABLE tr (k int PRIMARY KEY, v text)")
        eng.sql("INSERT INTO tr VALUES (1, 'a'), (2, 'b')")
        r = eng.sql("TRUNCATE TABLE tr").collect()[0]
        assert r["statement"] == "TRUNCATE"
        assert eng.table("tr").count() == 0
        eng.sql("INSERT INTO tr VALUES (3, 'c')")  # still writable
        assert eng.table("tr").count() == 1

    def test_drop_multi_and_if_exists(self, eng):
        eng.sql("CREATE TABLE d1 (k int)")
        eng.sql("CREATE TABLE d2 (k int)")
        with pytest.raises(KeyError):
            eng.sql("DROP TABLE d1, nope")
        eng.sql("DROP TABLE IF EXISTS d2, nope")
        assert "d2" not in eng.catalog.list_tables()

    def test_alter_add_and_rename_column(self, eng):
        eng.sql("CREATE TABLE al (k int PRIMARY KEY, v text)")
        eng.sql("INSERT INTO al VALUES (1, 'a')")
        eng.sql("ALTER TABLE al ADD COLUMN score double precision")
        eng.sql("INSERT INTO al VALUES (2, 'b', 1.5)")
        # pre-evolution row reads NULL for the new column
        rows = sorted(tuple(x) for x in eng.table("al").collect())
        assert rows == [(1, "a", None), (2, "b", 1.5)]
        with pytest.raises(ValueError, match="already exists"):
            eng.sql("ALTER TABLE al ADD COLUMN score int")
        eng.sql("ALTER TABLE al ADD COLUMN IF NOT EXISTS score int")  # no-op
        eng.sql("ALTER TABLE al RENAME COLUMN v TO label")
        assert "label" in eng.table("al").columns

    def test_add_column_widens_attached_export(self, eng, spark, tmp_path):
        from pg_mooncake_spark.sources.iceberg import read_iceberg

        eng.sql("CREATE TABLE ex (k int PRIMARY KEY, v text)")
        eng.sql("INSERT INTO ex VALUES (1, 'a')")
        exp = str(tmp_path / "exp")
        eng.attach_export("ex", exp)
        eng.sql("ALTER TABLE ex ADD COLUMN score double precision")
        eng.sql("INSERT INTO ex VALUES (2, 'b', 2.5)")
        got = sorted(tuple(r) for r in read_iceberg(spark, exp).collect())
        assert got == [(1, "a", None), (2, "b", 2.5)]

    def test_alter_drop_column(self, eng):
        """DROP COLUMN is a schema-narrowing metadata commit: reads stop
        seeing the column, time travel below still does, and the change
        feed resolves to the end-version schema (VERDICT r10 task 7)."""
        eng.sql("CREATE TABLE dc (k int PRIMARY KEY, v text, x int)")
        eng.sql("INSERT INTO dc VALUES (1, 'a', 10), (2, 'b', 20)")
        v_before = eng._moontable("dc").latest_version()
        eng.sql("ALTER TABLE dc DROP COLUMN x")
        assert [f.name for f in eng._moontable("dc").schema().fields] == [
            "k", "v",
        ]
        assert sorted(tuple(r) for r in eng.table("dc").collect()) == [
            (1, "a"), (2, "b"),
        ]
        # time travel below the drop still sees the column
        old = eng.table("dc", version=v_before)
        assert sorted(tuple(r) for r in old.collect()) == [
            (1, "a", 10), (2, "b", 20),
        ]
        # DML keeps working on the narrowed shape, and a feed window
        # spanning the drop resolves to the narrow schema
        eng.sql("INSERT INTO dc VALUES (3, 'c')")
        eng.sql("UPDATE dc SET v = 'B' WHERE k = 2")
        feed = eng.table_changes("dc", 1)
        assert "x" not in feed.columns
        assert sorted(tuple(r) for r in eng.table("dc").collect()) == [
            (1, "a"), (2, "B"), (3, "c"),
        ]
        with pytest.raises(ValueError, match="primary-key"):
            eng.sql("ALTER TABLE dc DROP COLUMN k")
        with pytest.raises(ValueError, match="no column"):
            eng.sql("ALTER TABLE dc DROP COLUMN nope")
        eng.sql("ALTER TABLE dc DROP COLUMN IF EXISTS nope")  # no-op

    def test_drop_column_propagates_to_exports(self, eng, spark, tmp_path):
        from pg_mooncake_spark.sources.delta import read_delta
        from pg_mooncake_spark.sources.iceberg import read_iceberg

        eng.sql("CREATE TABLE de (k int PRIMARY KEY, v text, x int)")
        eng.sql("INSERT INTO de VALUES (1, 'a', 10)")
        ice, dl = str(tmp_path / "ice"), str(tmp_path / "dl")
        eng.attach_export("de", ice)
        eng.attach_export("de", dl, fmt="delta")
        eng.sql("ALTER TABLE de DROP COLUMN x")
        assert sorted(read_iceberg(spark, ice).columns) == ["k", "v"]
        assert sorted(read_delta(spark, dl).columns) == ["k", "v"]
        # post-drop DML still syncs both exports
        eng.sql("INSERT INTO de VALUES (2, 'b')")
        eng.sql("UPDATE de SET v = 'A' WHERE k = 1")
        want = [(1, "A"), (2, "b")]
        assert sorted(tuple(r) for r in read_iceberg(spark, ice).collect()) == want
        assert sorted(tuple(r) for r in read_delta(spark, dl).collect()) == want

    def test_drop_column_refuses_dependents(self, eng, spark):
        eng.sql("CREATE TABLE db (k int PRIMARY KEY, v text, x int)")
        eng.sql("INSERT INTO db VALUES (1, 'a', 10)")
        eng.create_materialized_view(
            "db_mv", "db", group_by=["v"], aggs={"sx": ("sum", "x")}
        )
        with pytest.raises(ValueError, match="materialized view"):
            eng.drop_column("db", "x")
        eng.drop_table("db_mv")
        eng.sql("CALL mooncake.create_table('db_f', 'db')")
        with pytest.raises(ValueError, match="follower"):
            eng.drop_column("db", "x")
        eng.drop_table("db_f")
        eng.drop_column("db", "x")
        assert eng.table("db").columns == ["k", "v"]

    def test_copy_from_csv_variants(self, eng, tmp_path):
        """COPY t FROM with Postgres defaults: csv is headerless unless
        HEADER is given; legacy 'WITH CSV HEADER' spelling accepted."""
        eng.sql("CREATE TABLE cp (k int PRIMARY KEY, v text)")
        f1 = tmp_path / "h.csv"
        f1.write_text("k,v\n1,a\n2,b\n")
        eng.sql(f"COPY cp FROM '{f1}' WITH (FORMAT csv, HEADER true)")
        f2 = tmp_path / "nh.csv"
        f2.write_text("3,c\n")
        eng.sql(f"COPY cp FROM '{f2}'")  # format inferred, no header
        f3 = tmp_path / "l.csv"
        f3.write_text("k,v\n4,d\n")
        eng.sql(f"COPY cp FROM '{f3}' WITH CSV HEADER")
        assert sorted(tuple(r) for r in eng.table("cp").collect()) == [
            (1, "a"), (2, "b"), (3, "c"), (4, "d"),
        ]

    def test_copy_to_and_query_form(self, eng, spark, tmp_path):
        eng.sql("CREATE TABLE ct (k int PRIMARY KEY, v text)")
        eng.sql("INSERT INTO ct VALUES (1, 'a'), (2, 'b')")
        out = tmp_path / "out.parquet"
        eng.sql(f"COPY ct TO '{out}'")
        assert sorted(
            tuple(r) for r in spark.read.parquet(str(out)).collect()
        ) == [(1, "a"), (2, "b")]
        qout = tmp_path / "q.csv"
        eng.sql(
            f"COPY (SELECT k FROM ct WHERE k = 2) TO '{qout}' "
            "WITH (FORMAT csv, HEADER true)"
        )
        got = spark.read.options(header="true").csv(str(qout)).collect()
        assert [r["k"] for r in got] == ["2"]

    def test_copy_from_inside_transaction_stages(self, eng, tmp_path):
        eng.sql("CREATE TABLE cpx (k int PRIMARY KEY, v text)")
        f = tmp_path / "t.csv"
        f.write_text("1,a\n")
        eng.sql("BEGIN")
        eng.sql(f"COPY cpx FROM '{f}'")
        assert eng.sql("SELECT count(*) AS n FROM cpx").collect()[0]["n"] == 1
        eng.sql("ROLLBACK")
        assert eng.table("cpx").count() == 0

    def test_copy_from_stdin_text_and_csv(self, eng):
        """COPY FROM STDIN: payload rides in sql(..., copy_data=...) —
        Postgres text format (tab, \\N nulls, \\. terminator) and csv."""
        eng.sql("CREATE TABLE si (k int PRIMARY KEY, v text, n int)")
        eng.sql(
            "COPY si FROM STDIN",
            copy_data="1\ta\t10\n2\t\\N\t20\n\\.\nignored\tx\t0\n",
        )
        eng.sql(
            "COPY si FROM STDIN WITH (FORMAT csv, HEADER true)",
            copy_data="k,v,n\n3,c,\n",
        )
        assert sorted(tuple(r) for r in eng.table("si").collect()) == [
            (1, "a", 10), (2, None, 20), (3, "c", None),
        ]

    def test_copy_stdin_column_list(self, eng):
        """``COPY t (cols) FROM STDIN`` — the spelling every pg_dump
        data section uses (round 16): listed columns map positionally,
        unlisted columns take their declared defaults (sequence
        defaults allocate)."""
        eng.sql(
            "CREATE TABLE cl (id serial PRIMARY KEY, v text, "
            "n int DEFAULT 7)"
        )
        # the dump order: explicit ids in the data section, then the
        # setval watermark, then app writes draw fresh ids
        eng.sql(
            "COPY cl (id, v, n) FROM STDIN",
            copy_data="1\ta\t10\n2\tb\t20\n",
        )
        eng.sql("SELECT setval('cl_id_seq', 2, true)")
        eng.sql("COPY cl (v) FROM STDIN", copy_data="c\n")
        rows = sorted(tuple(r) for r in eng.table("cl").collect())
        assert rows == [(1, "a", 10), (2, "b", 20), (3, "c", 7)]
        with pytest.raises(ValueError, match="does not exist"):
            eng.sql("COPY cl (nope) FROM STDIN", copy_data="x\n")

    def test_copy_to_stdout_column_list(self, eng):
        eng.sql("CREATE TABLE co (k int PRIMARY KEY, v text)")
        eng.sql("INSERT INTO co VALUES (1, 'a')")
        out = eng.sql("COPY co (v) TO STDOUT").collect()
        assert [r[0] for r in out] == ["a"]

    def test_copy_from_stdin_dataframe_and_txn(self, eng, spark):
        eng.sql("CREATE TABLE sdf (k int PRIMARY KEY, v text)")
        df = spark.createDataFrame([(1, "a")], "k int, v string")
        eng.sql("COPY sdf FROM STDIN", copy_data=df)
        eng.sql("BEGIN")
        eng.sql("COPY sdf FROM STDIN", copy_data="2\tb\n")
        assert eng.sql("SELECT count(*) AS n FROM sdf").collect()[0]["n"] == 2
        eng.sql("ROLLBACK")
        assert eng.table("sdf").count() == 1
        with pytest.raises(ValueError, match="payload"):
            eng.sql("COPY sdf FROM STDIN")
        with pytest.raises(ValueError, match="STDIN"):
            eng.sql("COPY sdf TO STDIN")

    def test_copy_to_single_file(self, eng, spark, tmp_path):
        """A local target with a matching extension yields ONE file
        (Postgres semantics); extensionless targets keep the
        distributed directory-of-parts form."""
        import os

        eng.sql("CREATE TABLE sf1t (k int PRIMARY KEY, v text)")
        eng.sql("INSERT INTO sf1t VALUES (1, 'a'), (2, 'b')")
        single = tmp_path / "one.csv"
        eng.sql(f"COPY sf1t TO '{single}' WITH (FORMAT csv, HEADER true)")
        assert os.path.isfile(single)
        assert spark.read.options(header="true").csv(str(single)).count() == 2
        par = tmp_path / "one.parquet"
        eng.sql(f"COPY sf1t TO '{par}'")
        assert os.path.isfile(par)
        assert spark.read.parquet(str(par)).count() == 2
        d = tmp_path / "parts_out"
        eng.sql(f"COPY sf1t TO '{d}' WITH (FORMAT csv)")
        assert os.path.isdir(d)

    def test_copy_to_stdout_text_roundtrip(self, eng):
        """COPY TO STDOUT returns the payload as a copy_line DataFrame
        (built in-plan, distributed); the text rendering feeds back
        through COPY FROM STDIN losslessly — incl. \\N nulls and the
        backslash/TAB/LF escapes."""
        eng.sql("CREATE TABLE so (k int PRIMARY KEY, v text, n int)")
        eng.sql("INSERT INTO so VALUES (1, 'plain', 10), (2, NULL, 20)")
        eng.sql(r"INSERT INTO so VALUES (3, 'a\tb', 30)")  # literal chars
        eng.sql("INSERT INTO so SELECT 4, concat('x', chr(10), 'y'), 40")
        out = eng.sql("COPY so TO STDOUT")
        assert out.columns == ["copy_line"]
        payload = "\n".join(r.copy_line for r in out.collect()) + "\n"
        assert "\\N" in payload  # the NULL spelling
        eng.sql("CREATE TABLE so2 (k int PRIMARY KEY, v text, n int)")
        eng.sql("COPY so2 FROM STDIN", copy_data=payload)
        assert sorted(tuple(r) for r in eng.table("so2").collect()) == \
            sorted(tuple(r) for r in eng.table("so").collect())

    def test_copy_to_stdout_csv_and_query_form(self, eng):
        eng.sql("CREATE TABLE soc (k int PRIMARY KEY, v text)")
        eng.sql("INSERT INTO soc VALUES (1, 'has,comma'), (2, 'q\"uote')")
        lines = [
            r.copy_line for r in eng.sql(
                "COPY soc TO STDOUT WITH (FORMAT csv, HEADER true)"
            ).collect()
        ]
        assert lines[0] == "k,v"
        assert '"has,comma"' in "\n".join(lines)
        assert '"q""uote"' in "\n".join(lines)
        # query form + expression
        rows = eng.sql(
            "COPY (SELECT k * 10 AS kk FROM soc ORDER BY k) TO STDOUT"
        ).collect()
        assert sorted(r.copy_line for r in rows) == ["10", "20"]
        with pytest.raises(ValueError, match="STDOUT"):
            eng.sql("COPY soc FROM STDOUT")

    def test_list_tables_as_sql_relation(self, eng):
        eng.sql("CREATE TABLE lt1 (k int PRIMARY KEY)")
        eng.sql("CREATE TABLE lt2 (k int PRIMARY KEY)")
        rows = eng.sql(
            "SELECT table, kind FROM mooncake.list_tables() "
            "WHERE table LIKE 'lt%' ORDER BY table"
        ).collect()
        assert [(r["table"], r["kind"]) for r in rows] == [
            ("lt1", "mirror"), ("lt2", "mirror"),
        ]
        # a string literal spelling the function is left alone
        lit = eng.sql(
            "SELECT 'mooncake.list_tables()' AS s"
        ).collect()[0]["s"]
        assert lit == "mooncake.list_tables()"

    def test_malformed_ddl_raises(self, eng):
        with pytest.raises(ValueError, match="cannot parse|unsupported"):
            eng.sql("CREATE TABLE")
        # OWNER TO is validated-inert since round 16: unknown table is
        # the real Postgres error, not an unsupported-statement one
        with pytest.raises(KeyError, match="unknown mirror"):
            eng.sql("ALTER TABLE x OWNER TO y")
        with pytest.raises(ValueError, match="unsupported"):
            eng.sql("ALTER TABLE x INHERIT parent_t")
        with pytest.raises(ValueError, match="column defs|cannot parse"):
            eng.sql("CREATE TABLE x LIKE y")


def test_alter_table_rename_to(eng):
    eng.sql("""CREATE TABLE rt (
      id bigint PRIMARY KEY,
      v int NOT NULL DEFAULT 3 CHECK (v > 0)
    )""")
    eng.sql("INSERT INTO rt (id) VALUES (1)")
    eng.sql("ALTER TABLE rt RENAME TO rt2")
    assert eng.sql("SELECT count(*) AS n FROM rt2").collect()[0].n == 1
    with pytest.raises(Exception):
        eng.sql("SELECT * FROM rt").collect()  # old name gone
    # constraint metadata rides the entry
    with pytest.raises(Exception, match='check constraint'):
        eng.sql("UPDATE rt2 SET v = -1 WHERE id = 1")
    eng.sql("INSERT INTO rt2 (id) VALUES (2)")  # default survives
    assert eng.sql(
        "SELECT v FROM rt2 WHERE id = 2"
    ).collect()[0].v == 3
    # refusals: name taken, logical-view dependency
    eng.sql("CREATE TABLE other (id bigint PRIMARY KEY)")
    with pytest.raises(ValueError, match="already exists"):
        eng.sql("ALTER TABLE rt2 RENAME TO other")
    eng.sql("CREATE VIEW rv AS SELECT id FROM rt2")
    with pytest.raises(ValueError, match="references it"):
        eng.sql("ALTER TABLE rt2 RENAME TO rt3")
    eng.sql("DROP VIEW rv")
    eng.sql("ALTER TABLE rt2 RENAME TO rt3")
    assert eng.sql("SELECT count(*) AS n FROM rt3").collect()[0].n == 2


def test_copy_stdout_custom_delimiter_roundtrip(eng):
    """Data containing the active delimiter must round-trip: the
    STDOUT renderer escapes it, the STDIN parser splits
    escape-aware (review r14 finding 3)."""
    eng.sql("CREATE TABLE sod (k int PRIMARY KEY, v text)")
    eng.sql("INSERT INTO sod VALUES (1, 'a|b'), (2, NULL)")
    lines = [
        r.copy_line for r in eng.sql(
            "COPY sod TO STDOUT WITH (FORMAT text, DELIMITER '|')"
        ).collect()
    ]
    assert sorted(lines) == ["1|a\\|b", "2|\\N"]
    eng.sql("CREATE TABLE sod2 (k int PRIMARY KEY, v text)")
    eng.sql(
        "COPY sod2 FROM STDIN WITH (FORMAT text, DELIMITER '|')",
        copy_data="\n".join(sorted(lines)) + "\n",
    )
    assert sorted(tuple(r) for r in eng.table("sod2").collect()) == [
        (1, "a|b"), (2, None),
    ]


class TestAlterColumnType:
    """ALTER TABLE ... ALTER COLUMN ... [SET DATA] TYPE (round 16) —
    a full-rewrite commit swapping data and schema atomically, with
    Postgres cast strictness and loud boundary refusals."""

    @pytest.fixture()
    def teng(self, spark, warehouse):
        e = MooncakeEngine(spark, warehouse)
        e.sql("CREATE TABLE ty (k int PRIMARY KEY, v text, n int)")
        e.sql("INSERT INTO ty VALUES (1, '10', 5), (2, '20', 6)")
        return e

    def test_widen_and_using(self, teng):
        teng.sql("ALTER TABLE ty ALTER COLUMN n TYPE bigint")
        assert [
            f.simpleString() for f in teng._moontable("ty").schema().fields
        ] == ["k:int", "v:string", "n:bigint"]
        teng.sql(
            "ALTER TABLE ty ALTER COLUMN v SET DATA TYPE int "
            "USING CAST(v AS INT)"
        )
        assert sorted(tuple(r) for r in teng.table("ty").collect()) == [
            (1, 10, 5), (2, 20, 6),
        ]

    def test_cast_strictness(self, teng):
        teng.sql("CREATE TABLE tb (k int PRIMARY KEY, s text)")
        teng.sql("INSERT INTO tb VALUES (1, 'abc')")
        with pytest.raises(ValueError, match="cannot be cast"):
            teng.sql("ALTER TABLE tb ALTER COLUMN s TYPE int")
        # the failed statement wrote nothing
        assert [
            f.simpleString() for f in teng._moontable("tb").schema().fields
        ] == ["k:int", "s:string"]

    def test_dml_and_time_travel_after_retype(self, teng):
        teng.sql("ALTER TABLE ty ALTER COLUMN n TYPE bigint")
        teng.sql("UPDATE ty SET n = 99 WHERE k = 1")
        assert sorted(tuple(r) for r in teng.table("ty").collect()) == [
            (1, "10", 99), (2, "20", 6),
        ]
        # below the retype commit the old type answers
        assert [
            f.simpleString() for f in teng.table("ty", version=1).schema.fields
        ] == ["k:int", "v:string", "n:int"]

    def test_refusals(self, teng):
        teng.sql("BEGIN")
        with pytest.raises(ValueError, match="transaction"):
            teng.sql("ALTER TABLE ty ALTER COLUMN n TYPE bigint")
        teng.sql("ROLLBACK")
        teng.sql(
            "CREATE TABLE tg (k int PRIMARY KEY, a int, "
            "b int GENERATED ALWAYS AS (a + 1) STORED)"
        )
        with pytest.raises(ValueError, match="generated"):
            teng.sql("ALTER TABLE tg ALTER COLUMN b TYPE bigint")
        teng.sql("CREATE TABLE ti (id int GENERATED ALWAYS AS IDENTITY)")
        with pytest.raises(ValueError, match="identity"):
            teng.sql("ALTER TABLE ti ALTER COLUMN id TYPE text")
        teng.sql("ALTER TABLE ti ALTER COLUMN id TYPE bigint")  # ok


class TestCreateTableLike:
    """CREATE TABLE x (LIKE t [INCLUDING ...]) — the app scaffold
    statement (round 16).  Schema always copies; DEFAULTS/CONSTRAINTS/
    GENERATED/INDEXES/ALL copy their classes; INCLUDING INDEXES/ALL
    copies the pk (in Postgres the pk IS an index); INCLUDING IDENTITY
    refuses loudly (silently sharing the source sequence would be
    wrong)."""

    @pytest.fixture()
    def leng(self, spark, warehouse):
        e = MooncakeEngine(spark, warehouse)
        e.sql(
            "CREATE TABLE src (k int PRIMARY KEY, "
            "v text NOT NULL DEFAULT 'x', CHECK (k > 0))"
        )
        return e

    def test_bare_like_schema_only(self, leng):
        leng.sql("CREATE TABLE c1 (LIKE src)")
        mt = leng._moontable("c1")
        assert [f.name for f in mt.schema().fields] == ["k", "v"]
        assert mt.primary_key() is None
        assert leng._constraints("c1") is None

    def test_including_all(self, leng):
        leng.sql("CREATE TABLE c2 (LIKE src INCLUDING ALL)")
        assert leng._moontable("c2").primary_key() == ["k"]
        leng.sql("INSERT INTO c2 (k) VALUES (1)")  # default fills v
        assert sorted(tuple(r) for r in leng.table("c2").collect()) \
            == [(1, "x")]
        with pytest.raises(Exception, match="c2"):
            leng.sql("INSERT INTO c2 VALUES (-1, 'z')")  # check copied

    def test_serial_default_not_copied(self, leng):
        leng.sql("CREATE TABLE s2 (id serial PRIMARY KEY, v text)")
        leng.sql("CREATE TABLE c3 (LIKE s2 INCLUDING DEFAULTS)")
        # sequence defaults never copy (they'd share the sequence)
        assert not (leng._constraints("c3") or {}).get("defaults")
        with pytest.raises(ValueError, match="IDENTITY"):
            leng.sql("CREATE TABLE c4 (LIKE s2 INCLUDING IDENTITY)")

    def test_like_in_txn(self, leng):
        leng.sql("BEGIN")
        leng.sql("CREATE TABLE c5 (LIKE src INCLUDING ALL)")
        leng.sql("INSERT INTO c5 (k) VALUES (7)")
        leng.sql("COMMIT")
        assert sorted(tuple(r) for r in leng.table("c5").collect()) \
            == [(7, "x")]


class TestSetSchema:
    def test_table_and_sequence_set_schema(self, eng):
        eng.sql("CREATE SCHEMA arch")
        eng.sql("CREATE TABLE mv_t (k int PRIMARY KEY)")
        eng.sql("INSERT INTO mv_t VALUES (1)")
        eng.sql("ALTER TABLE mv_t SET SCHEMA arch")
        assert "arch.mv_t" in eng.catalog.list_tables()
        assert eng.table("arch.mv_t").count() == 1
        eng.sql("CREATE SEQUENCE sq1")
        eng.sql("SELECT nextval('sq1')")
        eng.sql("ALTER SEQUENCE sq1 SET SCHEMA arch")
        assert eng.sql("SELECT nextval('arch.sq1')").collect()[0][0] == 2
        with pytest.raises(ValueError, match="does not exist"):
            eng.sql("ALTER TABLE arch.mv_t SET SCHEMA nope")
