"""SQL DML routing through engine.sql (the statement surface the
reference's regress corpus runs against mooncake tables — reference
tests/pg_regress/sql/sanity.sql:2-5) and its parser edge cases."""

from __future__ import annotations

import pytest

from pg_mooncake_spark.engine import (
    MooncakeEngine,
    _find_top_keyword,
    _split_top_commas,
)


@pytest.fixture()
def eng(spark, warehouse):
    e = MooncakeEngine(spark, warehouse)
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)],
        "k long, v string, x double",
    )
    e.create_table("m", source_df=df, primary_key=["k"])
    return e


def _rows(eng):
    return sorted((r["k"], r["v"], r["x"]) for r in eng.table("m").collect())


class TestParserHelpers:
    def test_split_top_commas_respects_nesting(self):
        assert _split_top_commas("a = f(x, y), b = 'p,q', c = (1,2)") == [
            "a = f(x, y)",
            "b = 'p,q'",
            "c = (1,2)",
        ]

    def test_find_top_keyword_skips_strings_and_parens(self):
        s = "v = ' WHERE ' , u = fn(1 WHERE 2) WHERE k > 1"
        i = _find_top_keyword(s, "WHERE")
        assert s[i:].startswith("WHERE k > 1")
        assert _find_top_keyword("nowhere = 1", "WHERE") == -1


class TestSqlDml:
    def test_sanity_flow_via_sql(self, eng):
        eng.sql("INSERT INTO m VALUES (4, 'd', 4.0)")
        eng.sql("UPDATE m SET v = upper(v), x = x * 10 WHERE k >= 3")
        eng.sql("DELETE FROM m WHERE k = 1;")  # trailing semicolon ok
        assert _rows(eng) == [
            (2, "b", 2.0),
            (3, "C", 30.0),
            (4, "D", 40.0),
        ]

    def test_insert_column_subset_nulls_rest(self, eng):
        eng.sql('INSERT INTO m (k, v) VALUES (9, \'z\')')
        assert (9, "z", None) in _rows(eng)

    def test_insert_select_reads_mirrors(self, eng):
        eng.sql("INSERT INTO m SELECT k + 10, v, x FROM m WHERE k = 2")
        assert (12, "b", 2.0) in _rows(eng)

    def test_set_expression_with_commas_and_where_in_string(self, eng):
        eng.sql(
            "UPDATE m SET v = concat(v, ',', ' WHERE ') WHERE k = 1"
        )
        assert (1, "a, WHERE ", 1.0) in _rows(eng)

    def test_delete_without_where_empties(self, eng):
        eng.sql("DELETE FROM m")
        assert _rows(eng) == []

    def test_update_without_where_hits_all(self, eng):
        eng.sql("UPDATE m SET x = 0.5")
        assert {x for _, _, x in _rows(eng)} == {0.5}

    def test_dml_result_shape(self, eng):
        r = eng.sql("INSERT INTO m VALUES (7, 'g', 7.0)").collect()
        assert len(r) == 1
        assert r[0]["statement"] == "INSERT" and r[0]["table"] == "m"
        assert r[0]["version"] >= 1

    def test_merge_and_malformed_raise(self, eng):
        with pytest.raises(ValueError, match="apply_changes"):
            eng.sql("MERGE INTO m USING s ON m.k = s.k")
        with pytest.raises(ValueError, match="arity"):
            eng.sql("INSERT INTO m VALUES (1, 'a')")
        with pytest.raises(ValueError, match="SET clause"):
            eng.sql("UPDATE m SET 42 WHERE k = 1")

    def test_dml_maintains_exports(self, eng, tmp_path):
        from pg_mooncake_spark.sources.iceberg import read_iceberg

        exp = str(tmp_path / "exp")
        eng.attach_export("m", exp)
        eng.sql("UPDATE m SET x = x + 1 WHERE k = 2")
        eng.sql("DELETE FROM m WHERE k = 3")
        eng.sql("INSERT INTO m VALUES (4, 'd', 4.0)")
        spark_rows = {
            (r["k"], r["v"], r["x"]) for r in read_iceberg(eng.spark, exp).collect()
        }
        assert spark_rows == set(_rows(eng))
