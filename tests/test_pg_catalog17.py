"""Low-level pg_catalog introspection (round 17, VERDICT r16 missing
#3): pg_class / pg_namespace / pg_attribute / pg_attrdef / pg_index
plus format_type / pg_get_expr / pg_table_is_visible / pg_get_indexdef
— replayed through the REAL query shapes an ORM (SQLAlchemy
get_columns) and psql's ``\\d`` emit, including the
``OPERATOR(pg_catalog.~)`` and ``COLLATE pg_catalog.default``
spellings psql uses to stay search_path-proof."""

from __future__ import annotations

import pytest

from pg_mooncake_spark.engine import MooncakeEngine


@pytest.fixture()
def eng(spark, warehouse):
    e = MooncakeEngine(spark, warehouse)
    e.sql(
        "CREATE TABLE users (id serial PRIMARY KEY, name text NOT NULL,"
        " bal numeric(12,2) DEFAULT 0, note text)"
    )
    e.sql("CREATE INDEX users_name_idx ON users (name)")
    e.sql("INSERT INTO users (name) VALUES ('a')")
    return e


def _oid(eng, rel):
    return eng.sql(
        "SELECT c.oid FROM pg_catalog.pg_class c "
        f"WHERE c.relname = '{rel}' AND c.relkind = 'r'"
    ).collect()[0].oid


class TestSqlAlchemyGetColumns:
    def test_oid_resolution(self, eng):
        rows = eng.sql("""
            SELECT c.oid, c.relname FROM pg_catalog.pg_class c
            LEFT JOIN pg_catalog.pg_namespace n
              ON n.oid = c.relnamespace
            WHERE pg_catalog.pg_table_is_visible(c.oid)
              AND c.relname = 'users' AND c.relkind = 'r'
              AND n.nspname = 'public'
        """).collect()
        assert len(rows) == 1 and rows[0].relname == "users"

    def test_get_columns_shape(self, eng):
        oid = _oid(eng, "users")
        rows = eng.sql(f"""
            SELECT a.attname AS name,
              pg_catalog.format_type(a.atttypid, a.atttypmod) AS fmt,
              (SELECT pg_catalog.pg_get_expr(d.adbin, d.adrelid)
               FROM pg_catalog.pg_attrdef d
               WHERE d.adrelid = a.attrelid AND d.adnum = a.attnum
                 AND a.atthasdef) AS def,
              a.attnotnull AS nn, a.attrelid AS table_oid,
              a.attidentity AS ident, a.attgenerated AS gen
            FROM pg_catalog.pg_attribute a
            WHERE a.attrelid = {oid} AND a.attnum > 0
              AND NOT a.attisdropped
            ORDER BY a.attnum
        """).collect()
        got = [(r.name, r.fmt, r.def_ if hasattr(r, "def_") else r["def"],
                r.nn) for r in rows]
        assert got == [
            ("id", "integer", "nextval('users_id_seq')", True),
            ("name", "text", None, True),
            ("bal", "numeric(12,2)", "0", False),
            ("note", "text", None, False),
        ]

    def test_generated_and_identity_markers(self, eng):
        eng.sql(
            "CREATE TABLE gi (k bigint GENERATED ALWAYS AS IDENTITY "
            "PRIMARY KEY, a int, b int GENERATED ALWAYS AS (a + 1) "
            "STORED)"
        )
        oid = _oid(eng, "gi")
        rows = eng.sql(f"""
            SELECT a.attname AS name, a.attidentity AS ident,
                   a.attgenerated AS gen
            FROM pg_attribute a WHERE a.attrelid = {oid}
            ORDER BY a.attnum
        """).collect()
        m = {r.name: (r.ident, r.gen) for r in rows}
        assert m["k"] == ("a", "")
        assert m["b"] == ("", "s")
        # the generation expression surfaces through pg_attrdef
        expr = eng.sql(f"""
            SELECT pg_get_expr(d.adbin, d.adrelid) AS e
            FROM pg_attrdef d JOIN pg_attribute a
              ON a.attrelid = d.adrelid AND a.attnum = d.adnum
            WHERE d.adrelid = {oid} AND a.attname = 'b'
        """).collect()
        assert expr and "a" in expr[0].e


class TestPsqlDescribe:
    def test_relation_lookup_with_operator_and_collate(self, eng):
        rows = eng.sql("""
            SELECT c.oid, n.nspname, c.relname
            FROM pg_catalog.pg_class c
            LEFT JOIN pg_catalog.pg_namespace n
              ON n.oid = c.relnamespace
            WHERE c.relname OPERATOR(pg_catalog.~) '^(users)$'
                  COLLATE pg_catalog.default
              AND pg_catalog.pg_table_is_visible(c.oid)
            ORDER BY 2, 3
        """).collect()
        assert [(r.nspname, r.relname) for r in rows] == [
            ("public", "users")
        ]

    def test_column_query_with_pretty_flag(self, eng):
        oid = _oid(eng, "users")
        rows = eng.sql(f"""
            SELECT a.attname,
              pg_catalog.format_type(a.atttypid, a.atttypmod),
              (SELECT pg_catalog.pg_get_expr(d.adbin, d.adrelid, true)
               FROM pg_catalog.pg_attrdef d
               WHERE d.adrelid = a.attrelid AND d.adnum = a.attnum
                 AND a.atthasdef),
              a.attnotnull
            FROM pg_catalog.pg_attribute a
            WHERE a.attrelid = '{oid}' AND a.attnum > 0
              AND NOT a.attisdropped
            ORDER BY a.attnum
        """).collect()
        assert len(rows) == 4 and rows[0].attname == "id"

    def test_index_listing(self, eng):
        oid = _oid(eng, "users")
        rows = eng.sql(f"""
            SELECT c2.relname AS iname, i.indisprimary AS isp,
                   i.indisunique AS isu,
                   pg_catalog.pg_get_indexdef(i.indexrelid) AS idef
            FROM pg_catalog.pg_class c, pg_catalog.pg_class c2,
                 pg_catalog.pg_index i
            WHERE c.oid = {oid} AND c.oid = i.indrelid
              AND i.indexrelid = c2.oid
            ORDER BY i.indisprimary DESC, c2.relname
        """).collect()
        assert [(r.iname, r.isp, r.isu) for r in rows] == [
            ("users_pkey", True, True),
            ("users_name_idx", False, False),
        ]
        assert rows[0].idef == (
            "CREATE UNIQUE INDEX users_pkey ON users (id)"
        )
        assert rows[1].idef == (
            "CREATE INDEX users_name_idx ON users (name)"
        )


class TestCatalogInventory:
    def test_namespaces(self, eng):
        eng.sql("CREATE SCHEMA app17")
        names = {r.nspname for r in eng.sql(
            "SELECT nspname FROM pg_namespace"
        ).collect()}
        assert {"public", "pg_catalog", "information_schema",
                "app17"} <= names

    def test_relkinds(self, eng):
        eng.sql("CREATE VIEW uview AS SELECT id FROM users")
        kinds = {
            (r.relname, r.relkind)
            for r in eng.sql(
                "SELECT relname, relkind FROM pg_class"
            ).collect()
        }
        assert ("users", "r") in kinds
        assert ("uview", "v") in kinds
        assert ("users_id_seq", "S") in kinds
        assert ("users_name_idx", "i") in kinds

    def test_oids_are_stable_across_statements(self, eng):
        a = _oid(eng, "users")
        b = _oid(eng, "users")
        assert a == b


class TestPgConstraint:
    """pg_constraint + pg_get_constraintdef (SQLAlchemy's
    get_foreign_keys / get_pk_constraint path) and the
    information_schema FK topology relations."""

    @pytest.fixture()
    def ceng(self, eng):
        eng.sql("CREATE TABLE cparent (id int PRIMARY KEY, name text)")
        eng.sql("INSERT INTO cparent VALUES (1, 'a')")
        eng.sql(
            "CREATE TABLE cchild (cid int PRIMARY KEY, pid int, v text,"
            " CONSTRAINT pos CHECK (cid > 0))"
        )
        eng.sql(
            "ALTER TABLE cchild ADD CONSTRAINT cchild_pid_fkey "
            "FOREIGN KEY (pid) REFERENCES cparent (id) ON DELETE CASCADE"
        )
        eng.sql("CREATE UNIQUE INDEX cparent_name_key ON cparent (name)")
        return eng

    def test_get_foreign_keys_shape(self, ceng):
        rows = ceng.sql("""
            SELECT c.conname,
                   pg_catalog.pg_get_constraintdef(c.oid) AS condef
            FROM pg_catalog.pg_constraint c
            JOIN pg_catalog.pg_class cl ON cl.oid = c.conrelid
            WHERE cl.relname = 'cchild' AND c.contype = 'f'
        """).collect()
        assert len(rows) == 1
        assert rows[0].conname == "cchild_pid_fkey"
        assert rows[0].condef == (
            "FOREIGN KEY (pid) REFERENCES cparent(id) ON DELETE CASCADE"
        )

    def test_get_pk_constraint_via_conkey(self, ceng):
        rows = ceng.sql("""
            SELECT a.attname
            FROM pg_catalog.pg_constraint c
            JOIN pg_catalog.pg_class cl ON cl.oid = c.conrelid
            JOIN pg_catalog.pg_attribute a
              ON a.attrelid = c.conrelid
             AND array_contains(c.conkey, a.attnum)
            WHERE cl.relname = 'cparent' AND c.contype = 'p'
        """).collect()
        assert [r.attname for r in rows] == ["id"]

    def test_constraint_types_inventory(self, ceng):
        rows = ceng.sql(
            "SELECT conname, contype, convalidated FROM pg_constraint"
        ).collect()
        m = {r.conname: (r.contype, r.convalidated) for r in rows}
        assert m["cparent_pkey"] == ("p", True)
        assert m["cchild_pid_fkey"] == ("f", True)
        assert m["cparent_name_key"] == ("u", True)
        assert m["pos"] == ("c", True)

    def test_key_column_usage(self, ceng):
        rows = ceng.sql("""
            SELECT constraint_name, table_name, column_name,
                   ordinal_position
            FROM information_schema.key_column_usage
            WHERE table_name IN ('cparent', 'cchild')
            ORDER BY constraint_name, ordinal_position
        """).collect()
        got = [(r.constraint_name, r.column_name) for r in rows]
        assert ("cchild_pid_fkey", "pid") in got
        assert ("cparent_pkey", "id") in got
        assert ("cparent_name_key", "name") in got

    def test_referential_constraints(self, ceng):
        rows = ceng.sql("""
            SELECT constraint_name, unique_constraint_name,
                   update_rule, delete_rule
            FROM information_schema.referential_constraints
        """).collect()
        assert [(r.constraint_name, r.unique_constraint_name,
                 r.update_rule, r.delete_rule) for r in rows] == [
            ("cchild_pid_fkey", "cparent_pkey", "NO ACTION", "CASCADE")
        ]


class TestSessionIdentityAndRegclass:
    """version()/current_schema/current_database/current_user answer
    Postgres-shaped values, and 'name'::regclass resolves to the
    pg_class oid (the modern SQLAlchemy oid-resolution shape)."""

    def test_version_is_postgres_parseable(self, eng):
        v = eng.sql("SELECT version() AS v").collect()[0].v
        assert v.startswith("PostgreSQL 17")

    def test_identity_functions(self, eng):
        r = eng.sql(
            "SELECT current_schema() AS s, current_database() AS d, "
            "current_user AS u"
        ).collect()[0]
        assert (r.s, r.d, r.u) == ("public", "mooncake", "mooncake")

    def test_regclass_matches_pg_class_oid(self, eng):
        o1 = eng.sql("SELECT 'users'::regclass AS o").collect()[0].o
        o2 = _oid(eng, "users")
        assert o1 == o2
        rows = eng.sql(
            "SELECT a.attname FROM pg_attribute a "
            "WHERE a.attrelid = 'users'::regclass ORDER BY a.attnum"
        ).collect()
        assert [r.attname for r in rows] == ["id", "name", "bal", "note"]

    def test_regclass_cast_and_oid_chain(self, eng):
        o = eng.sql(
            "SELECT CAST(CAST('users' AS REGCLASS) AS OID) AS o"
        ).collect()[0].o
        assert o == _oid(eng, "users")

    def test_unknown_relation_errors(self, eng):
        with pytest.raises(ValueError, match="does not exist"):
            eng.sql("SELECT 'nope'::regclass AS o")

    def test_literals_stay_data(self, eng):
        r = eng.sql(
            "SELECT 'version() current_user ::oid' AS s, '1::oid' AS t"
        ).collect()[0]
        assert r.s == "version() current_user ::oid"
        assert r.t == "1::oid"

    def test_nextval_regclass_still_routes_to_sequences(self, eng):
        eng.sql("CREATE SEQUENCE rsq")
        assert eng.sql(
            "SELECT nextval('rsq'::regclass) AS n"
        ).collect()[0].n == 1

    def test_pg_type_join(self, eng):
        rows = eng.sql("""
            SELECT a.attname, t.typname
            FROM pg_attribute a JOIN pg_type t ON t.oid = a.atttypid
            WHERE a.attrelid = 'users'::regclass
            ORDER BY a.attnum
        """).collect()
        assert [(r.attname, r.typname) for r in rows] == [
            ("id", "int4"), ("name", "text"),
            ("bal", "numeric"), ("note", "text"),
        ]


class TestSequencesCatalogAndSerialProbe:
    def test_pg_sequences_view(self, eng):
        rows = eng.sql(
            "SELECT sequencename, data_type, start_value, increment_by,"
            " cycle, last_value FROM pg_sequences"
        ).collect()
        m = {r.sequencename: r for r in rows}
        assert "users_id_seq" in m
        r = m["users_id_seq"]
        # one row was inserted in the fixture: last_value reflects it
        assert r.last_value == 1 and r.increment_by == 1
        eng.sql("CREATE SEQUENCE fresh17")
        rows = eng.sql(
            "SELECT last_value FROM pg_sequences "
            "WHERE sequencename = 'fresh17'"
        ).collect()
        assert rows[0].last_value is None  # never called → NULL

    def test_pg_get_serial_sequence(self, eng):
        r = eng.sql(
            "SELECT pg_get_serial_sequence('users', 'id') AS s, "
            "pg_get_serial_sequence('public.users', 'id') AS q, "
            "pg_get_serial_sequence('users', 'name') AS none"
        ).collect()[0]
        assert r.s == "users_id_seq" and r.q == "users_id_seq"
        assert r.none is None

    def test_comment_on_fk_unique_pkey(self, eng):
        eng.sql("CREATE TABLE cp2 (id int PRIMARY KEY)")
        eng.sql("CREATE TABLE cc2 (k int PRIMARY KEY, pid int)")
        eng.sql(
            "ALTER TABLE cc2 ADD CONSTRAINT cc2_fk FOREIGN KEY (pid) "
            "REFERENCES cp2 (id)"
        )
        eng.sql("ALTER TABLE cc2 ADD CONSTRAINT cc2_u UNIQUE (pid)")
        eng.sql("COMMENT ON CONSTRAINT cc2_fk ON cc2 IS 'the fk'")
        eng.sql("COMMENT ON CONSTRAINT cc2_u ON cc2 IS 'the uq'")
        eng.sql("COMMENT ON CONSTRAINT cc2_pkey ON cc2 IS 'the pk'")
        com = (eng._constraints("cc2") or {}).get("comments") or {}
        assert com["constraint:cc2_fk"] == "the fk"
        assert com["constraint:cc2_u"] == "the uq"
        assert com["constraint:cc2_pkey"] == "the pk"
        with pytest.raises(ValueError, match="does not exist"):
            eng.sql("COMMENT ON CONSTRAINT nope ON cc2 IS 'x'")
