"""Lifecycle-flow queries: the reference's golden CDC flows executed on
real moontable mirrors, with DuckDB oracles expressing the expected
post-DML state directly.

These run the actual engine (create mirror → apply I/U/D → snapshot-pinned
read) inside a temp warehouse, so the driver's correctness gate covers the
control plane, not just the query plane (reference
tests/pg_regress/sql/sanity.sql, partitioned_table.sql flows).
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pg_mooncake_spark.engine import MooncakeEngine
from pg_mooncake_spark.functions import dsum
from pg_mooncake_spark.queries.registry import query, t


def _temp_engine(spark: SparkSession) -> MooncakeEngine:
    return MooncakeEngine(spark, tempfile.mkdtemp(prefix="mooncake_wh_"))


@query(
    "lifecycle_sanity_cdc",
    oracle="""
    SELECT a, b FROM (VALUES (2, 'b'), (3, '4')) AS v(a, b) ORDER BY a
    """,
)
def lifecycle_sanity_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reference sanity.sql golden flow end-to-end on a moontable mirror:
    insert (1,a)(2,b)(3,c) → UPDATE b=a+1 WHERE a>2 → DELETE a<2
    → pinned read = {(2,'b'),(3,'4')} (expected/sanity.out:7-11)."""
    eng = _temp_engine(spark)
    schema = T.StructType(
        [
            T.StructField("a", T.IntegerType(), False),
            T.StructField("b", T.StringType(), True),
        ]
    )
    src = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], schema)
    eng.create_table("c", source_df=src, primary_key=["a"])
    eng.update_where("c", "a > 2", {"b": "CAST(a + 1 AS STRING)"})
    eng.delete_where("c", "a < 2")
    return eng.table("c").orderBy("a")


@query(
    "lifecycle_sql_dml",
    oracle="""
    SELECT a, b, x
    FROM (VALUES (2, 'b', 2.0), (3, 'C', 30.0), (4, 'd', 4.5),
                 (102, 'b', 2.0)) AS v(a, b, x)
    ORDER BY a
    """,
)
def lifecycle_sql_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL-statement DML surface (engine.sql routing INSERT/UPDATE/
    DELETE to the maintenance paths — the statement shapes the
    reference's regress corpus runs against mooncake tables, reference
    tests/pg_regress/sql/sanity.sql:2-5): VALUES insert with a column
    subset, expression SET list, predicate delete, and INSERT..SELECT
    reading the mirror itself."""
    eng = _temp_engine(spark)
    src = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)],
        "a int, b string, x double",
    )
    eng.create_table("s", source_df=src, primary_key=["a"])
    eng.sql("INSERT INTO s (a, b, x) VALUES (4, 'd', 4.5)")
    eng.sql("UPDATE s SET b = upper(b), x = x * 10 WHERE a = 3")
    eng.sql("DELETE FROM s WHERE a < 2")
    eng.sql("INSERT INTO s SELECT a + 100, b, x FROM s WHERE a = 2")
    return eng.table("s").orderBy("a")


@query(
    "lifecycle_partitioned_counts",
    oracle="""
    WITH r AS (SELECT g AS a FROM generate_series(0, 99) AS s(g)
               WHERE g <= 90)
    SELECT (SELECT COUNT(*) FROM r WHERE a < 25) AS n_lt25,
           (SELECT COUNT(*) FROM r WHERE a < 75) AS n_lt75,
           (SELECT COUNT(*) FROM r WHERE a < 25 OR a > 75) AS n_or
    """,
)
def lifecycle_partitioned_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reference partitioned_table.sql golden flow: two range partitions
    flatten into ONE mirror; DELETE a>90; counts 25/75/40
    (expected/partitioned_table.out:8-23)."""
    eng = _temp_engine(spark)
    mk = lambda lo, hi: spark.range(lo, hi).select(  # noqa: E731
        F.col("id").cast("int").alias("a"),
        F.concat(F.lit("val_"), F.col("id").cast("string")).alias("b"),
    )
    eng.create_table("p", source_df=mk(0, 50), primary_key=["a"])
    eng.insert("p", mk(50, 100))
    eng.delete_where("p", "a > 90")
    m = eng.table("p")
    return m.agg(
        F.count(F.when(F.col("a") < 25, 1)).alias("n_lt25"),
        F.count(F.when(F.col("a") < 75, 1)).alias("n_lt75"),
        F.count(F.when((F.col("a") < 25) | (F.col("a") > 75), 1)).alias("n_or"),
    )


@query(
    "lifecycle_trades_quickstart",
    oracle="""
    SELECT avg(price) AS avg_price
    FROM (VALUES ('AMZN', 200.0), ('AMZN', 217.0), ('GOOG', 170.0),
                 ('GOOG', 172.0)) AS v(symbol, price)
    WHERE symbol = 'AMZN'
    """,
)
def lifecycle_trades_quickstart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reference README.md:58-92 quick-start flow on a mirror:
    avg(price) for AMZN = 208.5."""
    eng = _temp_engine(spark)
    src = spark.createDataFrame(
        [(1, "AMZN", 200.0), (2, "AMZN", 217.0), (3, "GOOG", 170.0), (4, "GOOG", 172.0)],
        "id long, symbol string, price double",
    )
    eng.create_table("trades_iceberg", source_df=src, primary_key=["id"])
    return eng.sql(
        "SELECT avg(price) AS avg_price FROM trades_iceberg WHERE symbol = 'AMZN'"
    )


@query(
    "lifecycle_iceberg_mirror_sync",
    oracle="""
    WITH post AS (
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_orderkey % 10 = 0 THEN l_quantity + 1
                  ELSE l_quantity END AS q
      FROM lineitem
      WHERE l_orderkey < 3000 AND NOT (l_orderkey % 7 = 3)
    )
    SELECT CAST(SUM(CAST(q AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_rows
    FROM post
    """,
)
def lifecycle_iceberg_mirror_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's core loop end-to-end (moonlink maintains each
    mirror's Iceberg warehouse with replicated changes applied,
    README.md:13-17): mirror lineitem, ATTACH an Iceberg export, apply a
    deterministic U+D CDC batch, then aggregate what the EXPORT reads —
    not the mirror.  The export was maintained incrementally (equality
    deletes by PK + appends, each O(batch)); the oracle computes the
    post-DML state straight from the source, so a key deleted from the
    mirror but not the export (or vice versa) is a hash mismatch."""
    from pg_mooncake_spark.sources.iceberg import read_iceberg

    eng = _temp_engine(spark)
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 3000)
    eng.create_table(
        "li_sync", source_df=li, primary_key=["l_orderkey", "l_linenumber"]
    )
    exp = tempfile.mkdtemp(prefix="ice_sync_") + "/t"
    eng.attach_export("li_sync", exp)
    updates = (
        li.filter((F.col("l_orderkey") % 10 == 0) & (F.col("l_orderkey") % 7 != 3))
        .withColumn("l_quantity", F.col("l_quantity") + 1)
        .withColumn("__op", F.lit("U"))
    )
    deletes = li.filter(F.col("l_orderkey") % 7 == 3).withColumn("__op", F.lit("D"))
    eng.apply_changes("li_sync", updates.unionByName(deletes), source_version=1)
    return read_iceberg(spark, exp).agg(
        dsum("l_quantity", 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "lifecycle_cdc_lineitem_merge",
    oracle="""
    WITH post AS (
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_orderkey % 10 = 0 THEN l_quantity + 1
                  ELSE l_quantity END AS q
      FROM lineitem
      WHERE NOT (l_orderkey % 7 = 3)
    )
    SELECT CAST(SUM(CAST(q AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_rows
    FROM post
    """,
)
def lifecycle_cdc_lineitem_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture-scale CDC: mirror lineitem, apply a deterministic U+D change
    batch via MERGE (update qty+1 for orderkey%10=0; delete orderkey%7=3),
    then aggregate the pinned snapshot.  The oracle computes the post-DML
    state directly from the source table."""
    eng = _temp_engine(spark)
    li = t(spark, sf_dir, "lineitem")
    eng.create_table(
        "li_mirror", source_df=li, primary_key=["l_orderkey", "l_linenumber"]
    )
    updates = (
        li.filter((F.col("l_orderkey") % 10 == 0) & (F.col("l_orderkey") % 7 != 3))
        .withColumn("l_quantity", F.col("l_quantity") + 1)
        .withColumn("__op", F.lit("U"))
    )
    deletes = li.filter(F.col("l_orderkey") % 7 == 3).withColumn("__op", F.lit("D"))
    eng.apply_changes("li_mirror", updates.unionByName(deletes), source_version=1)
    return eng.table("li_mirror").agg(
        dsum("l_quantity", 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "lifecycle_snapshot_versions",
    oracle="""
    SELECT COUNT(*) AS n_v1,
           (SELECT COUNT(*) FROM lineitem WHERE l_quantity <= 30) AS n_v2
    FROM lineitem
    """,
)
def lifecycle_snapshot_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel: after a DELETE, the pre-delete snapshot version still
    reads complete (reference LSN pinning / create_snapshot A2)."""
    eng = _temp_engine(spark)
    li = t(spark, sf_dir, "lineitem")
    eng.create_table(
        "li_tt", source_df=li, primary_key=["l_orderkey", "l_linenumber"]
    )
    v1 = eng.create_snapshot("li_tt")
    eng.delete_where("li_tt", "l_quantity > 30")
    v2 = eng.create_snapshot("li_tt")
    old = eng.table("li_tt", version=v1).agg(F.count(F.lit(1)).alias("n_v1"))
    new = eng.table("li_tt", version=v2).agg(F.count(F.lit(1)).alias("n_v2"))
    return old.crossJoin(new)


@query(
    "lifecycle_decimal_roundtrip",
    oracle="""
    WITH base AS (
      SELECT l_orderkey, l_linenumber,
             CAST(l_extendedprice AS DECIMAL(12,2)) AS price0,
             CAST(l_discount AS DECIMAL(4,3)) AS disc
      FROM lineitem WHERE l_orderkey < 3000
    ), post AS (
      SELECT CASE WHEN l_orderkey % 10 = 0
                  THEN CAST(price0 + CAST(1.50 AS DECIMAL(12,2))
                            AS DECIMAL(12,2))
                  ELSE price0 END AS price,
             disc
      FROM base WHERE NOT (l_orderkey % 7 = 3)
    )
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(price) AS DOUBLE) AS sum_price,
           CAST(SUM(price * disc) AS DOUBLE) AS sum_weighted
    FROM post
    """,
)
def lifecycle_decimal_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NUMERIC(p,s) type matrix (SURVEY §1.2) through the FULL lifecycle:
    a DECIMAL(12,2)/DECIMAL(4,3) mirror takes UPDATE arithmetic (exact
    decimal addition, cast back to the declared scale) and a DELETE,
    exports to Iceberg (decimal(p,s) in the schema JSON, decimals in the
    manifest-chained parquet), and is read back through the manifest
    replay.  Exact decimal SUM and a scale-growing DECIMAL multiply are
    compared against the oracle's identical decimal pipeline — any
    precision loss, double round-trip, or scale mangling anywhere in
    mirror storage, DML, export, or read shows as a hash mismatch."""
    from pg_mooncake_spark.sources.iceberg import read_iceberg

    eng = _temp_engine(spark)
    li = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 3000)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_extendedprice").cast("decimal(12,2)").alias("price"),
            F.col("l_discount").cast("decimal(4,3)").alias("disc"),
        )
    )
    eng.create_table(
        "dec_m", source_df=li, primary_key=["l_orderkey", "l_linenumber"]
    )
    eng.update_where(
        "dec_m",
        "l_orderkey % 10 = 0",
        {"price": "price + CAST(1.50 AS DECIMAL(12,2))"},
    )
    eng.delete_where("dec_m", "l_orderkey % 7 = 3")
    path = tempfile.mkdtemp(prefix="dec_exp_") + "/t"
    eng.export_table("dec_m", path, fmt="iceberg")
    back = read_iceberg(spark, path)
    return back.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("price").cast("double").alias("sum_price"),
        F.sum(F.col("price") * F.col("disc")).cast("double").alias("sum_weighted"),
    )

@query(
    "lifecycle_schema_evolution_cdc",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey < 5000),
    evolved AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 10 = 0
                  THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice,
             CASE WHEN o_orderkey % 10 = 0 THEN 'bumped' END AS tag
      FROM base
      UNION ALL
      SELECT 9000000 + g AS o_orderkey,
             CAST(g AS DOUBLE) AS o_totalprice,
             'new' AS tag
      FROM generate_series(1, 5) AS s(g))
    SELECT COALESCE(tag, '<null>') AS tag,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
             AS sum_price
    FROM evolved GROUP BY 1 ORDER BY 1
    """,
)
def lifecycle_schema_evolution_cdc(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mid-stream CDC schema evolution end-to-end on a mirror: the
    upstream adds a ``tag`` column, the drifted batch applies with
    on_schema_drift='evolve' (U rows doubling every 10th price +
    new I rows), and the widened mirror reads back with pre-evolution
    rows NULL in the new column.  The oracle rebuilds the expected
    post-evolution state in SQL — a silently-dropped column, a
    mis-nulled pre-evolution row, or a lost upsert all hash-mismatch."""
    from pg_mooncake_spark.engine import changes_df

    eng = _temp_engine(spark)
    base = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 5000)
        .select("o_orderkey", "o_totalprice")
    )
    eng.create_table("evo", source_df=base, primary_key=["o_orderkey"])
    updates = (
        base.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            (F.col("o_totalprice") * 2).alias("o_totalprice"),
            F.lit("bumped").alias("tag"),
        )
    )
    inserts = spark.range(1, 6).select(
        (F.col("id") + 9000000).alias("o_orderkey"),
        F.col("id").cast("double").alias("o_totalprice"),
        F.lit("new").alias("tag"),
    )
    batch = changes_df(updates, op="U").unionByName(
        changes_df(inserts, op="I")
    )
    eng.apply_changes("evo", batch, source_version=1, on_schema_drift="evolve")
    return (
        eng.table("evo")
        .groupBy(F.coalesce(F.col("tag"), F.lit("<null>")).alias("tag"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice", 2).alias("sum_price"),
        )
        .orderBy("tag")
    )


@query(
    "lifecycle_mor_scattered_dml",
    oracle="""
    WITH post AS (
      SELECT CASE WHEN l_orderkey % 17 = 1 THEN l_quantity + 5
                  ELSE l_quantity END AS q
      FROM lineitem
      WHERE NOT (l_orderkey % 13 = 2)
    )
    SELECT CAST(SUM(CAST(q AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(q AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty_folded,
           COUNT(*) AS n_rows_folded
    FROM post
    """,
)
def lifecycle_mor_scattered_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read mirror DML (the reference's merge-on-read mirror
    semantics, reference README.md:13-14): after a sorted compaction, a
    scattered UPDATE batch and a scattered predicate DELETE both commit
    as O(batch) equality-delete tombstones (strategy='mor' — commit
    inspection in tests/test_moontable_properties.py proves no data file
    is rewritten); the MOR read path folds tombstones with sequence
    semantics, and optimize_table folds them into clean files with
    identical results (the *_folded columns)."""
    eng = _temp_engine(spark)
    li = t(spark, sf_dir, "lineitem")
    eng.create_table(
        "li_morx", source_df=li, primary_key=["l_orderkey", "l_linenumber"]
    )
    eng.optimize_table("li_morx", mode="sort:l_orderkey")
    updates = (
        li.filter(
            (F.col("l_orderkey") % 17 == 1) & (F.col("l_orderkey") % 13 != 2)
        )
        .withColumn("l_quantity", F.col("l_quantity") + 5)
        .withColumn("__op", F.lit("U"))
    )
    eng.apply_changes("li_morx", updates, source_version=1, strategy="mor")
    eng.delete_where("li_morx", "l_orderkey % 13 = 2", strategy="mor")
    pre = eng.table("li_morx").agg(
        dsum("l_quantity", 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    eng.optimize_table("li_morx", mode="sort:l_orderkey")
    post = eng.table("li_morx").agg(
        dsum("l_quantity", 2).alias("sum_qty_folded"),
        F.count(F.lit(1)).alias("n_rows_folded"),
    )
    return pre.crossJoin(post)


@query(
    "lifecycle_rename_widen_cdc",
    oracle="""
    WITH base AS (
      SELECT o_orderkey, CAST(o_custkey AS INTEGER) AS ship,
             o_totalprice
      FROM orders WHERE o_orderkey < 5000
    ),
    post AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 10 = 0
                  THEN o_orderkey + 3000000000 ELSE ship END AS ship,
             CASE WHEN o_orderkey % 10 = 0
                  THEN o_totalprice * 2 ELSE o_totalprice END AS price
      FROM base
    )
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(price AS DECIMAL(30,2))) AS DOUBLE) AS sum_price,
           CAST(MAX(ship) AS BIGINT) AS max_ship
    FROM post
    """,
)
def lifecycle_rename_widen_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upstream ALTER propagation (VERDICT r7 task 5, extension past the
    reference which does none — SURVEY §1.3): RENAME COLUMN is a
    metadata-only rename-era commit (engine.rename_column); a following
    CDC batch under the NEW name carries int→long widening on ``ship``
    and decimal(12,2)→(13,2) widening on ``price`` (from price*2), both
    absorbed by on_schema_drift='evolve' as schema-widening commits —
    pre-evolution files are never rewritten, read through parquet
    widening conversions."""
    from pg_mooncake_spark.engine import changes_df

    eng = _temp_engine(spark)
    o = t(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") < 5000).select(
        "o_orderkey",
        F.col("o_custkey").cast("int").alias("ship"),
        "o_totalprice",
    )
    eng.create_table("rw", source_df=base, primary_key=["o_orderkey"])
    eng.rename_column("rw", "o_totalprice", "price")
    upd = base.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        (F.col("o_orderkey") + 3000000000).cast("long").alias("ship"),
        (F.col("o_totalprice") * 2).alias("price"),
    )
    eng.apply_changes(
        "rw", changes_df(upd, op="U"), source_version=1,
        on_schema_drift="evolve",
    )
    return eng.table("rw").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("price", 2).alias("sum_price"),
        F.max("ship").cast("long").alias("max_ship"),
    )


@query(
    "lifecycle_change_feed",
    oracle="""
    WITH upd AS (SELECT o_totalprice FROM orders
                 WHERE o_orderkey % 10 = 0 AND o_orderkey % 7 <> 3),
    del AS (SELECT o_totalprice FROM orders WHERE o_orderkey % 7 = 3),
    ins AS (SELECT o_totalprice FROM orders WHERE o_orderkey % 13 = 5),
    feed AS (
      SELECT 'delete' AS _change_type, o_totalprice AS p FROM del
      UNION ALL SELECT 'update_preimage', o_totalprice FROM upd
      UNION ALL SELECT 'update_postimage', o_totalprice + 1 FROM upd
      UNION ALL SELECT 'insert', o_totalprice FROM ins
    )
    SELECT _change_type, COUNT(*) AS n,
           CAST(SUM(CAST(p AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
    FROM feed GROUP BY _change_type ORDER BY _change_type
    """,
)
def lifecycle_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-level change feed (moontable CDF): mirror orders with
    change_feed=True, apply one MERGE carrying genuine inserts (re-keyed
    rows), upserts of existing keys, and deletes, then read
    table_changes() for that commit and aggregate per _change_type.  The
    oracle reconstructs the exact expected feed — pre-images from the
    source state, post-images with the update applied — so a
    misclassified row (insert vs update_postimage, missing pre-image)
    is a hash mismatch, not just a count drift.  (orders, not lineitem:
    the feed contract requires a key-compacted batch, and the synthetic
    lineitem's (orderkey, linenumber) is not unique.)"""
    eng = _temp_engine(spark)
    o = t(spark, sf_dir, "orders")
    eng.create_table(
        "o_cdf", source_df=o, primary_key=["o_orderkey"], change_feed=True
    )
    updates = (
        o.filter((F.col("o_orderkey") % 10 == 0) & (F.col("o_orderkey") % 7 != 3))
        .withColumn("o_totalprice", F.col("o_totalprice") + 1)
        .withColumn("__op", F.lit("U"))
    )
    deletes = o.filter(F.col("o_orderkey") % 7 == 3).withColumn("__op", F.lit("D"))
    inserts = (
        o.filter(F.col("o_orderkey") % 13 == 5)
        .withColumn("o_orderkey", F.col("o_orderkey") + 10000000)
        .withColumn("__op", F.lit("I"))
    )
    eng.apply_changes(
        "o_cdf", updates.unionByName(deletes).unionByName(inserts),
        source_version=1,
    )
    return (
        eng.table_changes("o_cdf", start_version=2)
        .groupBy("_change_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice", 2).alias("sum_price"),
        )
        .orderBy("_change_type")
    )


@query(
    "mv_incremental_agg",
    oracle="""
    WITH post AS (
      SELECT o_orderstatus,
             CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1
                  ELSE o_totalprice END AS p
      FROM orders
      WHERE NOT (o_orderkey % 7 = 3)
    )
    SELECT o_orderstatus,
           CAST(SUM(CAST(p AS DECIMAL(30,2))) AS DOUBLE) AS sum_price,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(p AS DECIMAL(30,2))) AS DOUBLE) / COUNT(p) AS avg_price
    FROM post GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def mv_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained materialized view: sum/count/avg per
    o_orderstatus over an orders mirror, refreshed from the change feed
    after a U+D CDC batch — the refresh folds O(batch) signed deltas
    into the view state (views.py), never recomputing the base.  The
    oracle is the from-scratch GROUP BY over the post-DML state: any
    drift between incremental maintenance and recomputation (missed
    retraction, double-counted upsert, broken NULL semantics) is a hash
    mismatch."""
    eng = _temp_engine(spark)
    o = t(spark, sf_dir, "orders")
    eng.create_table(
        "o_mv", source_df=o, primary_key=["o_orderkey"], change_feed=True
    )
    eng.create_materialized_view(
        "o_agg", "o_mv", ["o_orderstatus"],
        {
            "sum_price": ("sum", "CAST(o_totalprice AS DECIMAL(30,2))"),
            "n_rows": ("count", "*"),
            "avg_price": ("avg", "CAST(o_totalprice AS DECIMAL(30,2))"),
        },
    )
    updates = (
        o.filter((F.col("o_orderkey") % 10 == 0) & (F.col("o_orderkey") % 7 != 3))
        .withColumn("o_totalprice", F.col("o_totalprice") + 1)
        .withColumn("__op", F.lit("U"))
    )
    deletes = o.filter(F.col("o_orderkey") % 7 == 3).withColumn("__op", F.lit("D"))
    eng.apply_changes("o_mv", updates.unionByName(deletes), source_version=1)
    mv = eng.materialized_view("o_agg")
    return mv.select(
        "o_orderstatus",
        F.col("sum_price").cast("double").alias("sum_price"),
        "n_rows",
        "avg_price",
    ).orderBy("o_orderstatus")


@query(
    "mv_rename_survival",
    oracle="""
    WITH post AS (
      SELECT o_orderstatus AS status,
             CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1
                  ELSE o_totalprice END AS price
      FROM orders
      WHERE NOT (o_orderkey % 7 = 3)
    )
    SELECT status,
           CAST(SUM(CAST(price AS DECIMAL(30,2))) AS DOUBLE) AS sum_price,
           COUNT(*) AS n_rows
    FROM post GROUP BY status ORDER BY status
    """,
)
def mv_rename_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A materialized view survives base column RENAMES (VERDICT r8
    task 7): the agg-referenced column renames mid-history (the spec's
    expressions remap in place), DML after the rename folds
    incrementally under the new name, and then the GROUP BY key itself
    renames — which also renames the view state table's key column, so
    the view's output column follows the base.  The oracle is the
    from-scratch GROUP BY over the post-everything state under the
    final names; a spec left pointing at the old names would fail the
    refresh (unresolved column), and a missed state-key rename would
    change the output schema — both hash-mismatch."""
    eng = _temp_engine(spark)
    o = t(spark, sf_dir, "orders")
    eng.create_table(
        "o_rn", source_df=o, primary_key=["o_orderkey"], change_feed=True
    )
    eng.create_materialized_view(
        "o_rn_mv", "o_rn", ["o_orderstatus"],
        {
            "sum_price": ("sum", "CAST(o_totalprice AS DECIMAL(30,2))"),
            "n_rows": ("count", "*"),
        },
    )
    eng.delete_where("o_rn", "o_orderkey % 7 = 3")
    eng.rename_column("o_rn", "o_totalprice", "price")
    eng.sql("UPDATE o_rn SET price = price + 1 WHERE o_orderkey % 10 = 0")
    eng.rename_column("o_rn", "o_orderstatus", "status")
    return (
        eng.materialized_view("o_rn_mv")
        .select(
            "status",
            F.col("sum_price").cast("double").alias("sum_price"),
            "n_rows",
        )
        .orderBy("status")
    )


@query(
    "mv_minmax_retraction",
    oracle="""
    SELECT p_brand,
           MIN(p_retailprice) AS min_price,
           MAX(p_size) AS max_size,
           COUNT(*) AS n
    FROM part
    WHERE NOT (p_brand = 'Brand#11' OR p_retailprice < 1200)
    GROUP BY p_brand ORDER BY p_brand
    """,
)
def mv_minmax_retraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The non-retractable half of view maintenance: min/max under
    DELETEs.  A deleted row may have BEEN the group's min, so exactly
    the groups that saw a retraction recompute from the base table
    (semi-join-bounded — views.py refresh), while untouched groups keep
    their incremental values; a group deleted wholesale (Brand#11)
    must disappear from the view entirely."""
    eng = _temp_engine(spark)
    part = t(spark, sf_dir, "part")
    eng.create_table("p_mir", source_df=part, primary_key=["p_partkey"],
                     change_feed=True)
    eng.create_materialized_view(
        "p_mv", "p_mir", ["p_brand"],
        {
            "min_price": ("min", "p_retailprice"),
            "max_size": ("max", "p_size"),
            "n": ("count", "*"),
        },
    )
    eng.delete_where("p_mir", "p_brand = 'Brand#11' OR p_retailprice < 1200")
    return eng.materialized_view("p_mv").orderBy("p_brand")


@query(
    "mv_filtered_where",
    oracle="""
    WITH post AS (
      SELECT o_orderpriority,
             CASE WHEN o_orderkey % 10 = 0 THEN 'F'
                  ELSE o_orderstatus END AS status,
             CASE WHEN o_orderkey % 10 = 5 THEN o_totalprice + 1
                  ELSE o_totalprice END AS p
      FROM orders WHERE NOT (o_orderkey % 7 = 3)
    )
    SELECT o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(p AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
    FROM post WHERE status = 'O'
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def mv_filtered_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate-restricted materialized view under row MIGRATION: the
    view covers only o_orderstatus='O'; the CDC batch flips some rows'
    status to 'F' (their pre-image retracts from the view, the post-image
    never enters), bumps prices of rows that stay, and deletes others.
    Maintenance filters the change feed per image (views.py), so a
    migration out of the predicate is exactly a retraction — the oracle
    recomputes the filtered aggregate from the post-DML state."""
    eng = _temp_engine(spark)
    o = t(spark, sf_dir, "orders")
    eng.create_table(
        "o_fw", source_df=o, primary_key=["o_orderkey"], change_feed=True
    )
    eng.create_materialized_view(
        "open_by_prio", "o_fw", ["o_orderpriority"],
        {
            "n": ("count", "*"),
            "sum_price": ("sum", "CAST(o_totalprice AS DECIMAL(30,2))"),
        },
        where="o_orderstatus = 'O'",
    )
    mig = (
        o.filter((F.col("o_orderkey") % 10 == 0) & (F.col("o_orderkey") % 7 != 3))
        .withColumn("o_orderstatus", F.lit("F"))
        .withColumn("__op", F.lit("U"))
    )
    bump = (
        o.filter((F.col("o_orderkey") % 10 == 5) & (F.col("o_orderkey") % 7 != 3))
        .withColumn("o_totalprice", F.col("o_totalprice") + 1)
        .withColumn("__op", F.lit("U"))
    )
    dels = o.filter(F.col("o_orderkey") % 7 == 3).withColumn("__op", F.lit("D"))
    eng.apply_changes(
        "o_fw", mig.unionByName(bump).unionByName(dels), source_version=1
    )
    mv = eng.table("open_by_prio")
    return mv.select(
        "o_orderpriority",
        "n",
        F.col("sum_price").cast("double").alias("sum_price"),
    ).orderBy("o_orderpriority")


@query(
    "mv_q1_pricing_summary",
    oracle="""
    WITH post AS (
      SELECT l_returnflag, l_linestatus, l_quantity,
             CASE WHEN l_orderkey % 89 = 7 THEN l_extendedprice + 1
                  ELSE l_extendedprice END AS l_extendedprice,
             l_discount, l_tax, l_shipdate
      FROM lineitem
      WHERE NOT (l_orderkey % 97 = 3)
    )
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,6))) AS DOUBLE) AS sum_charge,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) / COUNT(l_quantity), 6) AS avg_qty,
           ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) / COUNT(l_extendedprice), 6) AS avg_price,
           ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(30,4))) AS DOUBLE) / COUNT(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM post
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def mv_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 as an incrementally-maintained materialized view — the
    engine-native answer to the repeated-whole-table-aggregate regime
    (judge-r12: q1 is scan-bound at every SF; a mirror engine's fix is
    O(changes) maintenance, not a faster rescan).  The view holds the 4
    exact-decimal sums, 3 avgs (sum+count pairs), and the row count per
    (l_returnflag, l_linestatus) — 6 groups — refreshed from the change
    feed on every DML commit; reading it is a 6-row scan regardless of
    base size.  Here the base takes an UPDATE (price bump on an
    l_orderkey slice) and a DELETE after view creation, so the hash
    check covers the signed-delta fold, not just the initial full
    computation.  The oracle recomputes Q1 from scratch over the
    post-DML state: any maintenance drift is a mismatch."""
    eng = _temp_engine(spark)
    li = t(spark, sf_dir, "lineitem")
    eng.create_table(
        "li_q1", source_df=li,
        primary_key=["l_orderkey", "l_linenumber"], change_feed=True,
    )
    eng.create_materialized_view(
        "q1_mv", "li_q1", ["l_returnflag", "l_linestatus"],
        {
            "sum_qty": ("sum", "CAST(l_quantity AS DECIMAL(30,2))"),
            "sum_base_price": ("sum", "CAST(l_extendedprice AS DECIMAL(30,2))"),
            "sum_disc_price": (
                "sum",
                "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))",
            ),
            "sum_charge": (
                "sum",
                "CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) "
                "AS DECIMAL(30,6))",
            ),
            "avg_qty": ("avg", "CAST(l_quantity AS DECIMAL(30,2))"),
            "avg_price": ("avg", "CAST(l_extendedprice AS DECIMAL(30,2))"),
            "avg_disc": ("avg", "CAST(l_discount AS DECIMAL(30,4))"),
            "count_order": ("count", "*"),
        },
        where="l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'",
    )
    eng.update_where(
        "li_q1", "l_orderkey % 89 = 7",
        {"l_extendedprice": "l_extendedprice + 1"},
    )
    eng.delete_where("li_q1", "l_orderkey % 97 = 3")
    return (
        eng.materialized_view("q1_mv")
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("sum_qty").cast("double").alias("sum_qty"),
            F.col("sum_base_price").cast("double").alias("sum_base_price"),
            F.col("sum_disc_price").cast("double").alias("sum_disc_price"),
            F.col("sum_charge").cast("double").alias("sum_charge"),
            F.round("avg_qty", 6).alias("avg_qty"),
            F.round("avg_price", 6).alias("avg_price"),
            F.round("avg_disc", 6).alias("avg_disc"),
            "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "lifecycle_sql_matview",
    oracle="""
    WITH post AS (
      SELECT o_orderpriority, o_orderstatus,
             CASE WHEN o_orderkey % 10 = 0 THEN o_totalprice + 1
                  ELSE o_totalprice END AS p
      FROM orders
      WHERE NOT (o_orderkey % 7 = 3)
    )
    SELECT o_orderpriority,
           CAST(SUM(CAST(p AS DECIMAL(30,2))) AS DOUBLE) AS sum_price,
           COUNT(*) AS n,
           CAST(SUM(CAST(p AS DECIMAL(30,2))) AS DOUBLE) / COUNT(p) AS avg_price
    FROM post
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def lifecycle_sql_matview(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Postgres matview spellings end-to-end (round 13): ``CREATE
    MATERIALIZED VIEW ... AS SELECT aggs FROM mirror WHERE ... GROUP
    BY ...`` compiles into the incremental-MV machinery (sql_router
    _parse_matview_select), SQL DML on the base folds O(batch) deltas
    into it inside the same commit, ``REFRESH MATERIALIZED VIEW`` is
    the (normally no-op) recovery spelling, and the view reads through
    the ordinary table path.  Oracle = the from-scratch filtered GROUP
    BY over the post-DML state."""
    eng = _temp_engine(spark)
    o = t(spark, sf_dir, "orders")
    eng.create_table(
        "o_smv", source_df=o, primary_key=["o_orderkey"], change_feed=True
    )
    eng.sql(
        "CREATE MATERIALIZED VIEW prio_summary AS "
        "SELECT o_orderpriority, "
        "sum(CAST(o_totalprice AS DECIMAL(30,2))) AS sum_price, "
        "count(*) AS n, "
        "avg(CAST(o_totalprice AS DECIMAL(30,2))) AS avg_price "
        "FROM o_smv WHERE o_orderstatus = 'O' GROUP BY o_orderpriority"
    )
    eng.sql(
        "UPDATE o_smv SET o_totalprice = o_totalprice + 1 "
        "WHERE o_orderkey % 10 = 0"
    )
    eng.sql("DELETE FROM o_smv WHERE o_orderkey % 7 = 3")
    eng.sql("REFRESH MATERIALIZED VIEW prio_summary")
    return (
        eng.table("prio_summary")
        .select(
            "o_orderpriority",
            F.col("sum_price").cast("double").alias("sum_price"),
            "n",
            "avg_price",
        )
        .orderBy("o_orderpriority")
    )


@query(
    "lifecycle_sql_returning",
    oracle="""
    WITH base AS (
      SELECT c_custkey, c_acctbal FROM customer WHERE c_custkey <= 100
    )
    SELECT 'I' AS tag, 9001 AS k, CAST(50.0 AS DOUBLE) AS val
    UNION ALL
    SELECT 'U' AS tag, c_custkey AS k, c_acctbal + 10 AS val
    FROM base WHERE c_custkey % 10 = 3
    UNION ALL
    SELECT 'D' AS tag, c_custkey AS k, c_acctbal AS val
    FROM base WHERE c_custkey % 10 = 7
    ORDER BY tag, k
    """,
)
def lifecycle_sql_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Postgres DML RETURNING (round 13): INSERT returns the inserted
    images, UPDATE the post-images of affected rows (captured by key
    through the real update path), DELETE the pre-images pinned before
    the delete mutates state.  The oracle derives all three result sets
    from the pristine table — a lazily-evaluated capture (re-reading
    post-DML state) or a missed/extra affected row is a hash
    mismatch."""
    eng = _temp_engine(spark)
    cust = (
        t(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .filter("c_custkey <= 100")
    )
    eng.create_table("c_ret", source_df=cust, primary_key=["c_custkey"])
    ins = eng.sql(
        "INSERT INTO c_ret VALUES (9001, 'new', 50.0) "
        "RETURNING 'I' AS tag, c_custkey AS k, c_acctbal AS val"
    )
    upd = eng.sql(
        "UPDATE c_ret SET c_acctbal = c_acctbal + 10 "
        "WHERE c_custkey % 10 = 3 AND c_custkey <= 100 "
        "RETURNING 'U' AS tag, c_custkey AS k, c_acctbal AS val"
    )
    dele = eng.sql(
        "DELETE FROM c_ret WHERE c_custkey % 10 = 7 "
        "RETURNING 'D' AS tag, c_custkey AS k, c_acctbal AS val"
    )
    return ins.unionByName(upd).unionByName(dele).orderBy("tag", "k")


@query(
    "lifecycle_sql_returning_join",
    oracle="""
    WITH base AS (
      SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DOUBLE) AS bal
      FROM customer WHERE c_custkey <= 200
    ),
    spend AS (
      SELECT o_custkey AS k,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DOUBLE) AS amt
      FROM orders WHERE o_orderkey % 50 = 0 AND o_custkey <= 200
      GROUP BY o_custkey
    ),
    upd AS (
      SELECT 'U' AS tag, b.c_custkey AS k,
             CAST(CAST(b.bal AS DECIMAL(18,2))
                  + CAST(s.amt AS DECIMAL(18,2)) AS DOUBLE) AS val
      FROM base b JOIN spend s ON b.c_custkey = s.k
    ),
    del AS (
      SELECT DISTINCT 'D' AS tag, b.c_custkey AS k,
             CASE WHEN b.c_custkey IN (SELECT k FROM spend)
                  THEN CAST(CAST(b.bal AS DECIMAL(18,2))
                       + (SELECT CAST(amt AS DECIMAL(18,2)) FROM spend
                          WHERE k = b.c_custkey) AS DOUBLE)
                  ELSE b.bal END AS val
      FROM base b JOIN orders o ON b.c_custkey = o.o_custkey
      WHERE o.o_orderpriority = '1-URGENT' AND o.o_orderkey % 40 = 0
    )
    SELECT * FROM upd UNION ALL SELECT * FROM del ORDER BY tag, k
    """,
)
def lifecycle_sql_returning_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RETURNING on the join-DML shapes (VERDICT r13 task 4): UPDATE
    ... FROM returns the post-images of exactly the matched target
    rows (the U batch, generated/conform applied), DELETE ... USING
    the DISTINCT pre-images pinned before the apply mutates the
    target.  The oracle recomputes both result sets — a lazy capture
    re-reading post-DML state, a duplicate from the USING product, or
    a missed matched row is a hash mismatch."""
    eng = _temp_engine(spark)
    cust = (
        t(spark, sf_dir, "customer")
        .select(
            "c_custkey", "c_nationkey",
            F.col("c_acctbal").cast("double").alias("bal"),
        )
        .filter("c_custkey <= 200")
    )
    eng.create_table("c_rj", source_df=cust, primary_key=["c_custkey"])
    t(spark, sf_dir, "orders").filter(
        "o_orderkey % 50 = 0 AND o_custkey <= 200"
    ).groupBy(F.col("o_custkey").alias("k")).agg(
        dsum("o_totalprice", 2).alias("amt")
    ).createOrReplaceTempView("rj_spend")
    t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority", "o_orderkey"
    ).createOrReplaceTempView("rj_orders")
    upd = eng.sql("""
        UPDATE c_rj SET
          bal = CAST(CAST(c_rj.bal AS DECIMAL(18,2))
                     + CAST(rj_spend.amt AS DECIMAL(18,2)) AS DOUBLE)
        FROM rj_spend WHERE c_rj.c_custkey = rj_spend.k
        RETURNING 'U' AS tag, c_custkey AS k, bal AS val
    """)
    dele = eng.sql("""
        DELETE FROM c_rj USING rj_orders
        WHERE c_rj.c_custkey = rj_orders.o_custkey
          AND rj_orders.o_orderpriority = '1-URGENT'
          AND rj_orders.o_orderkey % 40 = 0
        RETURNING 'D' AS tag, c_custkey AS k, bal AS val
    """)
    return upd.unionByName(dele).orderBy("tag", "k")


@query(
    "iceberg_changelog_export",
    oracle="""
    WITH upd AS (SELECT o_totalprice FROM orders
                 WHERE o_orderkey % 10 = 0 AND o_orderkey % 7 <> 3),
    del AS (SELECT o_totalprice FROM orders WHERE o_orderkey % 7 = 3),
    ins AS (SELECT o_totalprice FROM orders WHERE o_orderkey % 13 = 5),
    feed AS (
      SELECT 'delete' AS _change_type, o_totalprice AS p FROM del
      UNION ALL SELECT 'delete', o_totalprice FROM upd
      UNION ALL SELECT 'insert', o_totalprice + 1 FROM upd
      UNION ALL SELECT 'insert', o_totalprice FROM ins
    )
    SELECT _change_type, COUNT(*) AS n,
           CAST(SUM(CAST(p AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
    FROM feed GROUP BY _change_type ORDER BY _change_type
    """,
)
def iceberg_changelog_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downstream CDC consumption from the mirror's ICEBERG export: the
    export is maintained as atomic row-delta snapshots (equality deletes
    + appends per batch); iceberg_changelog diffs the manifest chain
    between the backfill snapshot and the head, recovering delete
    PRE-IMAGES by joining the equality-delete keys against the parent
    snapshot's state.  An upsert surfaces as delete(pre) + insert(post)
    — the oracle builds exactly that feed, so a missing pre-image, a
    tombstone applied to the wrong snapshot generation, or an insert
    row leaking from the wrong file set all hash-mismatch."""
    from pg_mooncake_spark.sources.iceberg import (
        _latest_metadata,
        iceberg_changelog,
    )

    eng = _temp_engine(spark)
    o = t(spark, sf_dir, "orders")
    eng.create_table("o_log", source_df=o, primary_key=["o_orderkey"])
    exp = tempfile.mkdtemp(prefix="ice_log_") + "/t"
    eng.attach_export("o_log", exp)
    base_snap = _latest_metadata(exp)["current-snapshot-id"]
    updates = (
        o.filter((F.col("o_orderkey") % 10 == 0) & (F.col("o_orderkey") % 7 != 3))
        .withColumn("o_totalprice", F.col("o_totalprice") + 1)
        .withColumn("__op", F.lit("U"))
    )
    deletes = o.filter(F.col("o_orderkey") % 7 == 3).withColumn("__op", F.lit("D"))
    inserts = (
        o.filter(F.col("o_orderkey") % 13 == 5)
        .withColumn("o_orderkey", F.col("o_orderkey") + 10000000)
        .withColumn("__op", F.lit("I"))
    )
    eng.apply_changes(
        "o_log", updates.unionByName(deletes).unionByName(inserts),
        source_version=1,
    )
    return (
        iceberg_changelog(spark, exp, base_snap)
        .groupBy("_change_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice", 2).alias("sum_price"),
        )
        .orderBy("_change_type")
    )


@query(
    "iceberg_metadata_tables",
    oracle="""
    WITH src AS (SELECT * FROM orders WHERE o_orderkey < 5000),
    upd AS (SELECT * FROM src WHERE o_orderkey % 10 = 0 AND o_orderkey % 7 <> 3),
    del AS (SELECT * FROM src WHERE o_orderkey % 7 = 3),
    snaps AS (
      SELECT 1 AS sequence_number, 'append' AS operation,
             (SELECT COUNT(*) FROM src) AS added_records
      UNION ALL
      SELECT 2, 'overwrite',
             (SELECT COUNT(*) FROM upd)
    )
    SELECT s.sequence_number, s.operation, s.added_records,
           (SELECT COUNT(*) FROM src) + (SELECT COUNT(*) FROM upd)
             AS live_data_records,
           (SELECT COUNT(*) FROM upd) + (SELECT COUNT(*) FROM del)
             AS live_delete_records
    FROM snaps s ORDER BY s.sequence_number
    """,
)
def iceberg_metadata_tables(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tbl$snapshots / tbl$files introspection surface on a mirror's
    export: after backfill + one CDC row-delta, the snapshots metadata
    table must show the exact operation sequence with spec-correct
    added-records summaries, and the files table's per-content record
    sums must equal what the row-delta protocol implies (data rows =
    backfill + upserted images, since upserts append and tombstone;
    delete-file rows = every changed key).  Counts come from manifest
    entries only — a drifted record_count or a manifest entry leaking
    from a dead snapshot breaks the hash."""
    from pg_mooncake_spark.sources.iceberg import iceberg_metadata_table

    eng = _temp_engine(spark)
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    eng.create_table("o_meta", source_df=o, primary_key=["o_orderkey"])
    exp = tempfile.mkdtemp(prefix="ice_meta_") + "/t"
    eng.attach_export("o_meta", exp)
    updates = (
        o.filter((F.col("o_orderkey") % 10 == 0) & (F.col("o_orderkey") % 7 != 3))
        .withColumn("o_totalprice", F.col("o_totalprice") + 1)
        .withColumn("__op", F.lit("U"))
    )
    deletes = o.filter(F.col("o_orderkey") % 7 == 3).withColumn("__op", F.lit("D"))
    eng.apply_changes("o_meta", updates.unionByName(deletes), source_version=1)
    snaps = iceberg_metadata_table(spark, exp, "snapshots").select(
        "sequence_number",
        "operation",
        F.element_at(F.col("summary"), "added-records")
        .cast("long")
        .alias("added_records"),
    )
    files = iceberg_metadata_table(spark, exp, "files")
    sums = files.agg(
        F.sum(F.when(F.col("content") == 0, F.col("record_count")))
        .cast("long")
        .alias("live_data_records"),
        F.sum(F.when(F.col("content") > 0, F.col("record_count")))
        .cast("long")
        .alias("live_delete_records"),
    )
    return snaps.crossJoin(sums).orderBy("sequence_number")


@query(
    "lifecycle_delta_mirror_sync",
    oracle="""
    WITH post AS (
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_orderkey % 10 = 0 THEN l_quantity + 1
                  ELSE l_quantity END AS q
      FROM lineitem
      WHERE l_orderkey < 3000 AND NOT (l_orderkey % 7 = 3)
    )
    SELECT CAST(SUM(CAST(q AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_rows
    FROM post
    """,
)
def lifecycle_delta_mirror_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The incremental-mirror loop with a DELTA export (the Iceberg
    twin's sibling, attach_export fmt='delta'): each CDC batch lands as
    ONE MERGE commit — batch keys masked via deletion vectors
    (semi-join probe, executor-side roaring serialization), new images
    appended — and the post-DML aggregate of what the EXPORT reads must
    equal the oracle's recomputation from the source.  A key deleted
    from the mirror but still visible through the export's DVs (or an
    upsert image lost between the mask and the append) is a hash
    mismatch."""
    from pg_mooncake_spark.sources.delta import read_delta

    eng = _temp_engine(spark)
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 3000)
    eng.create_table(
        "li_dsync", source_df=li, primary_key=["l_orderkey", "l_linenumber"]
    )
    exp = tempfile.mkdtemp(prefix="delta_sync_") + "/t"
    eng.attach_export("li_dsync", exp, fmt="delta")
    updates = (
        li.filter((F.col("l_orderkey") % 10 == 0) & (F.col("l_orderkey") % 7 != 3))
        .withColumn("l_quantity", F.col("l_quantity") + 1)
        .withColumn("__op", F.lit("U"))
    )
    deletes = li.filter(F.col("l_orderkey") % 7 == 3).withColumn("__op", F.lit("D"))
    eng.apply_changes("li_dsync", updates.unionByName(deletes), source_version=1)
    return read_delta(spark, exp).agg(
        dsum("l_quantity", 2).alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "lifecycle_sql_merge",
    oracle="""
    WITH tgt AS (
      SELECT c_custkey, c_name, c_acctbal FROM customer
      WHERE c_custkey % 2 = 0
    ),
    src AS (
      SELECT o_custkey AS k, COUNT(*) AS cnt,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
      FROM orders GROUP BY o_custkey
    ),
    merged AS (
      -- kept: target rows with no source match
      SELECT t.c_custkey, t.c_name, t.c_acctbal
      FROM tgt t LEFT JOIN src s ON t.c_custkey = s.k WHERE s.k IS NULL
      UNION ALL
      -- updated: matched AND cnt > 10 (DELETE branch drops the rest)
      SELECT t.c_custkey, t.c_name,
             CAST(CAST(t.c_acctbal AS DECIMAL(18,2)) + s.spend AS DOUBLE)
      FROM tgt t JOIN src s ON t.c_custkey = s.k WHERE s.cnt > 10
      UNION ALL
      -- inserted: source keys absent from the target
      SELECT s.k, 'new', CAST(s.spend AS DOUBLE)
      FROM src s LEFT JOIN tgt t ON t.c_custkey = s.k WHERE t.c_custkey IS NULL
    )
    SELECT COUNT(*) AS n_rows,
           COUNT(CASE WHEN c_name = 'new' THEN 1 END) AS n_inserted,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS total_bal
    FROM merged
    """,
)
def lifecycle_sql_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``MERGE INTO`` as a SQL statement on a mirror (VERDICT r8 task 6 —
    the reference contract is full SQL on the heap side, reference
    README.md:16, and Postgres 15+ users write MERGE): all three WHEN
    branches in one statement, compiled onto ONE apply_changes CDC batch
    (atomic commit; exports/MVs sync once).  Target = even-custkey
    customers; source = per-customer order aggregates, so matched
    customers with >10 orders get their balance bumped, the rest of the
    matched ones are deleted, and odd-custkey order aggregates insert.
    The oracle reconstructs the exact post-MERGE state with plain joins;
    arithmetic stays in DECIMAL until the end so both engines are exact."""
    eng = _temp_engine(spark)
    cust = (
        t(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .filter("c_custkey % 2 = 0")
    )
    eng.create_table("cust", source_df=cust, primary_key=["c_custkey"])
    t(spark, sf_dir, "orders").groupBy(
        F.col("o_custkey").alias("k")
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend"),
    ).createOrReplaceTempView("merge_src")
    eng.sql("""
        MERGE INTO cust USING merge_src AS s ON cust.c_custkey = s.k
        WHEN MATCHED AND s.cnt > 10 THEN
          UPDATE SET c_acctbal = CAST(c_acctbal AS DECIMAL(18,2)) + s.spend
        WHEN MATCHED THEN DELETE
        WHEN NOT MATCHED THEN
          INSERT (c_custkey, c_name, c_acctbal)
          VALUES (s.k, 'new', CAST(s.spend AS DOUBLE))
    """)
    return eng.table("cust").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("c_name") == "new", 1)).alias("n_inserted"),
        dsum("c_acctbal", 2).alias("total_bal"),
    )


@query(
    "lifecycle_sql_merge_order",
    oracle="""
    WITH tgt AS (
      SELECT c_custkey, c_name, c_acctbal FROM customer
      WHERE c_custkey % 2 = 0
    ),
    src AS (
      SELECT o_custkey AS k, COUNT(*) AS cnt,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
      FROM orders GROUP BY o_custkey
    ),
    merged AS (
      -- kept: target rows with no source match
      SELECT t.c_custkey, t.c_name, t.c_acctbal
      FROM tgt t LEFT JOIN src s ON t.c_custkey = s.k WHERE s.k IS NULL
      UNION ALL
      -- first-match-wins over the three MATCHED clauses:
      --   cnt >= 20 -> DELETE (row excluded)
      --   cnt >= 5  -> UPDATE bal += spend
      --   else      -> UPDATE name = 'few'
      SELECT t.c_custkey,
             CASE WHEN s.cnt >= 5 THEN t.c_name ELSE 'few' END,
             CASE WHEN s.cnt >= 5
                  THEN CAST(CAST(t.c_acctbal AS DECIMAL(18,2)) + s.spend
                            AS DOUBLE)
                  ELSE t.c_acctbal END
      FROM tgt t JOIN src s ON t.c_custkey = s.k
      WHERE s.cnt < 20
      UNION ALL
      -- inserted: source keys absent from the target
      SELECT s.k, 'new', CAST(s.spend AS DOUBLE)
      FROM src s LEFT JOIN tgt t ON t.c_custkey = s.k WHERE t.c_custkey IS NULL
    )
    SELECT COUNT(*) AS n_rows,
           COUNT(CASE WHEN c_name = 'few' THEN 1 END) AS n_few,
           COUNT(CASE WHEN c_name = 'new' THEN 1 END) AS n_inserted,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS total_bal
    FROM merged
    """,
)
def lifecycle_sql_merge_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE with a conditional DELETE placed BEFORE overlapping UPDATE
    clauses (VERDICT r9 #1 regression key — the judge's repro shape).
    The three WHEN MATCHED conditions overlap (cnt >= 20 implies
    cnt >= 5), so a compiler that ignores clause order gives a wrong
    answer: SQL-standard semantics are FIRST-match-wins per row.  The
    oracle reconstructs the post-MERGE state with CASE expressions that
    encode the same precedence."""
    eng = _temp_engine(spark)
    cust = (
        t(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .filter("c_custkey % 2 = 0")
    )
    eng.create_table("custo", source_df=cust, primary_key=["c_custkey"])
    t(spark, sf_dir, "orders").groupBy(
        F.col("o_custkey").alias("k")
    ).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend"),
    ).createOrReplaceTempView("merge_order_src")
    eng.sql("""
        MERGE INTO custo USING merge_order_src AS s
        ON custo.c_custkey = s.k
        WHEN MATCHED AND s.cnt >= 20 THEN DELETE
        WHEN MATCHED AND s.cnt >= 5 THEN
          UPDATE SET c_acctbal = CAST(c_acctbal AS DECIMAL(18,2)) + s.spend
        WHEN MATCHED THEN UPDATE SET c_name = 'few'
        WHEN NOT MATCHED THEN
          INSERT (c_custkey, c_name, c_acctbal)
          VALUES (s.k, 'new', CAST(s.spend AS DOUBLE))
    """)
    return eng.table("custo").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("c_name") == "few", 1)).alias("n_few"),
        F.count(F.when(F.col("c_name") == "new", 1)).alias("n_inserted"),
        dsum("c_acctbal", 2).alias("total_bal"),
    )


@query(
    "lifecycle_sql_merge_by_source",
    oracle="""
    WITH tgt AS (
      SELECT c_custkey, c_name, c_acctbal FROM customer
      WHERE c_custkey % 2 = 0
    ),
    src AS (
      SELECT o_custkey AS k, COUNT(*) AS cnt
      FROM orders WHERE o_custkey % 2 = 0 GROUP BY o_custkey
    ),
    merged AS (
      -- matched: balance zeroed
      SELECT t.c_custkey, t.c_name, CAST(0.0 AS DOUBLE) AS c_acctbal
      FROM tgt t JOIN src s ON t.c_custkey = s.k
      UNION ALL
      -- not matched by source, first-match-wins:
      --   c_acctbal < 0 -> DELETE (excluded)
      --   else          -> name = 'dormant'
      SELECT t.c_custkey, 'dormant', t.c_acctbal
      FROM tgt t LEFT JOIN src s ON t.c_custkey = s.k
      WHERE s.k IS NULL AND NOT (t.c_acctbal < 0)
    )
    SELECT COUNT(*) AS n_rows,
           COUNT(CASE WHEN c_name = 'dormant' THEN 1 END) AS n_dormant,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS total_bal
    FROM merged
    """,
)
def lifecycle_sql_merge_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL:2023 ``WHEN NOT MATCHED BY SOURCE``: customers with no orders
    in the source window are deleted (negative balance) or flagged
    dormant — the retention/cleanup MERGE shape Postgres 17 and DuckDB
    run.  Ordered with a conditional DELETE before the catch-all UPDATE
    so the oracle also pins first-match-wins on the BY SOURCE side."""
    eng = _temp_engine(spark)
    cust = (
        t(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .filter("c_custkey % 2 = 0")
    )
    eng.create_table("custbs", source_df=cust, primary_key=["c_custkey"])
    t(spark, sf_dir, "orders").filter("o_custkey % 2 = 0").groupBy(
        F.col("o_custkey").alias("k")
    ).agg(F.count(F.lit(1)).alias("cnt")).createOrReplaceTempView(
        "merge_bs_src"
    )
    eng.sql("""
        MERGE INTO custbs USING merge_bs_src AS s
        ON custbs.c_custkey = s.k
        WHEN MATCHED THEN UPDATE SET c_acctbal = 0.0
        WHEN NOT MATCHED BY SOURCE AND c_acctbal < 0 THEN DELETE
        WHEN NOT MATCHED BY SOURCE THEN UPDATE SET c_name = 'dormant'
    """)
    return eng.table("custbs").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("c_name") == "dormant", 1)).alias("n_dormant"),
        dsum("c_acctbal", 2).alias("total_bal"),
    )


@query(
    "lifecycle_sql_ddl",
    oracle="""
    WITH base AS (
      SELECT c_custkey, c_name, c_acctbal FROM customer
      WHERE c_custkey % 10 = 0
    ),
    evolved AS (
      SELECT c_custkey, c_name AS name, c_acctbal,
             CASE WHEN c_acctbal > 5000 THEN 'gold' ELSE 'std' END AS tier
      FROM base WHERE c_acctbal >= 0
    )
    SELECT COUNT(*) AS n_rows,
           COUNT(CASE WHEN tier = 'gold' THEN 1 END) AS n_gold,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS total_bal
    FROM evolved
    """,
)
def lifecycle_sql_ddl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference regress shape as PURE SQL statements — CREATE TABLE
    with Postgres type spellings, INSERT..SELECT, schema-evolving ALTER
    ADD COLUMN, UPDATE over the new column, metadata-only ALTER RENAME
    COLUMN, DELETE (reference tests/pg_regress/sql/sanity.sql wraps its
    DML in exactly this DDL; the engine's _sql_ddl routes each onto the
    lifecycle API so exports/views stay current)."""
    eng = _temp_engine(spark)
    t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    ).filter("c_custkey % 10 = 0").createOrReplaceTempView("ddl_src")
    eng.sql(
        "CREATE TABLE cust_ddl (c_custkey bigint PRIMARY KEY, "
        "c_name text, c_acctbal double precision)"
    )
    eng.sql("INSERT INTO cust_ddl SELECT * FROM ddl_src")
    eng.sql("ALTER TABLE cust_ddl ADD COLUMN tier text")
    eng.sql(
        "UPDATE cust_ddl SET tier = CASE WHEN c_acctbal > 5000 "
        "THEN 'gold' ELSE 'std' END"
    )
    eng.sql("ALTER TABLE cust_ddl RENAME COLUMN c_name TO name")
    eng.sql("DELETE FROM cust_ddl WHERE c_acctbal < 0")
    return eng.table("cust_ddl").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("tier") == "gold", 1)).alias("n_gold"),
        dsum("c_acctbal", 2).alias("total_bal"),
    )


@query(
    "lifecycle_sql_call_follower",
    oracle="""
    WITH src AS (
      SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS c_acctbal
      FROM customer WHERE c_custkey % 7 = 0
    ),
    after_dml AS (
      SELECT c_custkey, c_name,
             CASE WHEN c_acctbal > 5000 THEN c_acctbal * 2
                  ELSE c_acctbal END AS c_acctbal
      FROM src WHERE NOT (c_acctbal < 0)
      UNION ALL
      SELECT -1, 'sentinel', 1234.5
    )
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS total_bal
    FROM after_dml
    """,
)
def lifecycle_sql_call_follower(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``CALL mooncake.create_table('follower', 'base')`` — the
    reference's literal procedure syntax (reference
    tests/pg_regress/sql/sanity.sql:2) with its CDC-follow semantics:
    every DML shape committed on the base AFTER the follower exists
    (UPDATE, DELETE, INSERT) drains into the follower through the
    change feed, so the follower — which this query reads — only
    matches the oracle if following is live, not snapshot-only."""
    eng = _temp_engine(spark)
    base = (
        t(spark, sf_dir, "customer")
        .select(
            "c_custkey", "c_name",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
        )
        .filter("c_custkey % 7 = 0")
    )
    eng.create_table(
        "cust_base", source_df=base, primary_key=["c_custkey"],
        change_feed=True,
    )
    eng.sql("CALL mooncake.create_table('cust_follow', 'cust_base')")
    eng.sql("UPDATE cust_base SET c_acctbal = c_acctbal * 2 WHERE c_acctbal > 5000")
    eng.sql("DELETE FROM cust_base WHERE c_acctbal < 0")
    eng.sql("INSERT INTO cust_base VALUES (-1, 'sentinel', 1234.5)")
    return eng.table("cust_follow").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("c_acctbal", 2).alias("total_bal"),
    )


@query(
    "lifecycle_sql_upsert",
    oracle="""
    WITH tgt AS (
      SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS c_acctbal
      FROM customer WHERE c_custkey % 4 = 0
    ),
    src AS (
      SELECT o_custkey AS k,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      FROM orders WHERE o_custkey % 2 = 0 GROUP BY o_custkey
    ),
    upserted AS (
      -- conflict rows: balance += spend (excluded.spend)
      SELECT t.c_custkey, t.c_name,
             CAST(CAST(t.c_acctbal AS DECIMAL(18,2))
                  + CAST(s.spend AS DECIMAL(18,2)) AS DOUBLE) AS c_acctbal
      FROM tgt t JOIN src s ON t.c_custkey = s.k
      UNION ALL
      -- untouched target rows
      SELECT t.c_custkey, t.c_name, t.c_acctbal
      FROM tgt t LEFT JOIN src s ON t.c_custkey = s.k WHERE s.k IS NULL
      UNION ALL
      -- fresh inserts
      SELECT s.k, 'upserted', s.spend
      FROM src s LEFT JOIN tgt t ON t.c_custkey = s.k WHERE t.c_custkey IS NULL
    )
    SELECT COUNT(*) AS n_rows,
           COUNT(CASE WHEN c_name = 'upserted' THEN 1 END) AS n_new,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS total_bal
    FROM upserted
    """,
)
def lifecycle_sql_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``INSERT ... ON CONFLICT (pk) DO UPDATE`` — the Postgres upsert
    a heap-side user writes constantly (reference README.md:16 promises
    full SQL on the heap side): per-customer order spend upserted into
    a customer mirror, conflicting keys folding spend into the balance
    via ``excluded``, new keys inserting, all as ONE CDC commit."""
    eng = _temp_engine(spark)
    cust = (
        t(spark, sf_dir, "customer")
        .select(
            "c_custkey", "c_name",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
        )
        .filter("c_custkey % 4 = 0")
    )
    eng.create_table("cust_up", source_df=cust, primary_key=["c_custkey"])
    t(spark, sf_dir, "orders").filter("o_custkey % 2 = 0").groupBy(
        F.col("o_custkey").alias("k")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double").alias("spend")
    ).createOrReplaceTempView("upsert_src")
    eng.sql("""
        INSERT INTO cust_up
        SELECT k, 'upserted', spend FROM upsert_src
        ON CONFLICT (c_custkey) DO UPDATE SET
          c_acctbal = CAST(cust_up.c_acctbal AS DECIMAL(18,2))
                      + CAST(excluded.c_acctbal AS DECIMAL(18,2))
    """)
    return eng.table("cust_up").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("c_name") == "upserted", 1)).alias("n_new"),
        dsum("c_acctbal", 2).alias("total_bal"),
    )


@query(
    "lifecycle_sql_upsert_returning",
    oracle="""
    WITH tgt AS (
      SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS c_acctbal
      FROM customer WHERE c_custkey % 4 = 0
    ),
    src AS (
      SELECT o_custkey AS k,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      FROM orders WHERE o_custkey % 2 = 0 GROUP BY o_custkey
    ),
    affected AS (
      -- DO UPDATE post-images (conflicting keys)
      SELECT t.c_custkey, t.c_name,
             CAST(CAST(t.c_acctbal AS DECIMAL(18,2))
                  + CAST(s.spend AS DECIMAL(18,2)) AS DOUBLE) AS c_acctbal
      FROM tgt t JOIN src s ON t.c_custkey = s.k
      UNION ALL
      -- fresh inserts, as stored
      SELECT s.k, 'upserted', s.spend
      FROM src s LEFT JOIN tgt t ON t.c_custkey = s.k WHERE t.c_custkey IS NULL
    )
    SELECT COUNT(*) AS n_ret,
           COUNT(CASE WHEN c_name = 'upserted' THEN 1 END) AS n_new,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS ret_bal
    FROM affected
    """,
)
def lifecycle_sql_upsert_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``INSERT ... ON CONFLICT (pk) DO UPDATE ... RETURNING`` — the
    upsert-and-read-back idiom (VERDICT r14 missing #1; the reference's
    host executes it natively, reference CHANGELOG.md:22).  The engine
    returns the POST-images of inserted and updated rows in one
    statement; the oracle reconstructs exactly that affected set
    (conflict post-images + fresh inserts, NOT untouched target rows)
    relationally.  A skipped row leaking into RETURNING, a pre-image
    where a post-image belongs, or a lost insert all break the hash."""
    eng = _temp_engine(spark)
    cust = (
        t(spark, sf_dir, "customer")
        .select(
            "c_custkey", "c_name",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
        )
        .filter("c_custkey % 4 = 0")
    )
    eng.create_table("cust_upr", source_df=cust, primary_key=["c_custkey"])
    t(spark, sf_dir, "orders").filter("o_custkey % 2 = 0").groupBy(
        F.col("o_custkey").alias("k")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double").alias("spend")
    ).createOrReplaceTempView("upsert_ret_src")
    ret = eng.sql("""
        INSERT INTO cust_upr
        SELECT k, 'upserted', spend FROM upsert_ret_src
        ON CONFLICT (c_custkey) DO UPDATE SET
          c_acctbal = CAST(cust_upr.c_acctbal AS DECIMAL(18,2))
                      + CAST(excluded.c_acctbal AS DECIMAL(18,2))
        RETURNING c_custkey, c_name, c_acctbal
    """)
    return ret.agg(
        F.count(F.lit(1)).alias("n_ret"),
        F.count(F.when(F.col("c_name") == "upserted", 1)).alias("n_new"),
        dsum("c_acctbal", 2).alias("ret_bal"),
    )


@query(
    "lifecycle_sql_upsert_unique",
    oracle="""
    WITH tgt AS (
      SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS c_acctbal
      FROM customer WHERE c_custkey % 3 = 0
    ),
    src1 AS (
      SELECT c_custkey + 1000000 AS k, c_name,
             CAST(c_acctbal AS DOUBLE) AS bal
      FROM customer WHERE c_custkey % 2 = 0
    ),
    after1 AS (
      -- DO UPDATE on the NAME: existing names fold, fresh names insert
      -- with their surrogate key
      SELECT t.c_custkey, t.c_name,
             CASE WHEN s.c_name IS NOT NULL
                  THEN CAST(CAST(t.c_acctbal AS DECIMAL(18,2))
                            + CAST(s.bal AS DECIMAL(18,2)) AS DOUBLE)
                  ELSE t.c_acctbal END AS c_acctbal
      FROM tgt t LEFT JOIN src1 s ON t.c_name = s.c_name
      UNION ALL
      SELECT s.k, s.c_name, s.bal
      FROM src1 s LEFT JOIN tgt t ON t.c_name = s.c_name
      WHERE t.c_name IS NULL
    ),
    src2 AS (
      SELECT c_custkey + 2000000 AS k, c_name,
             CAST(c_acctbal AS DOUBLE) AS bal
      FROM customer WHERE c_custkey % 5 = 0
    ),
    after2 AS (
      -- DO NOTHING on the NAME: only names absent from after1 land
      SELECT * FROM after1
      UNION ALL
      SELECT s.k, s.c_name, s.bal
      FROM src2 s LEFT JOIN after1 a ON a.c_name = s.c_name
      WHERE a.c_name IS NULL
    )
    SELECT COUNT(*) AS n_rows,
           COUNT(CASE WHEN c_custkey < 1000000 THEN 1 END) AS n_orig,
           COUNT(CASE WHEN c_custkey >= 1000000
                       AND c_custkey < 2000000 THEN 1 END) AS n_up_new,
           COUNT(CASE WHEN c_custkey >= 2000000 THEN 1 END) AS n_dn_new,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE)
               AS total_bal
    FROM after2
    """,
)
def lifecycle_sql_upsert_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``INSERT ... ON CONFLICT (non-pk unique column) DO UPDATE /
    DO NOTHING`` (round 18, VERDICT r17 missing #2): the natural-key
    upsert every ETL job writes — incoming rows carry FRESH surrogate
    keys but may collide on the business key, so arbitration must
    resolve against the validated unique index on ``c_name``, not the
    pk.  Statement 1 (DO UPDATE) folds balances for existing names and
    inserts new names under their surrogate keys; statement 2
    (DO NOTHING) then inserts only still-unseen names.  The oracle
    replays both arbitrations relationally by joining on the name."""
    eng = _temp_engine(spark)
    cust = (
        t(spark, sf_dir, "customer")
        .select(
            "c_custkey", "c_name",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
        )
        .filter("c_custkey % 3 = 0")
    )
    eng.create_table("cust_uu", source_df=cust, primary_key=["c_custkey"])
    eng.sql("CREATE UNIQUE INDEX cust_uu_name ON cust_uu (c_name)")
    src = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name",
        F.col("c_acctbal").cast("double").alias("bal"),
    )
    src.filter("c_custkey % 2 = 0").selectExpr(
        "c_custkey + 1000000 AS k", "c_name", "bal"
    ).createOrReplaceTempView("uu_src1")
    src.filter("c_custkey % 5 = 0").selectExpr(
        "c_custkey + 2000000 AS k", "c_name", "bal"
    ).createOrReplaceTempView("uu_src2")
    eng.sql("""
        INSERT INTO cust_uu
        SELECT k, c_name, bal FROM uu_src1
        ON CONFLICT (c_name) DO UPDATE SET
          c_acctbal = CAST(cust_uu.c_acctbal AS DECIMAL(18,2))
                      + CAST(excluded.c_acctbal AS DECIMAL(18,2))
    """)
    eng.sql("""
        INSERT INTO cust_uu
        SELECT k, c_name, bal FROM uu_src2
        ON CONFLICT (c_name) DO NOTHING
    """)
    return eng.table("cust_uu").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("c_custkey") < 1000000, 1)).alias("n_orig"),
        F.count(
            F.when(
                (F.col("c_custkey") >= 1000000)
                & (F.col("c_custkey") < 2000000), 1,
            )
        ).alias("n_up_new"),
        F.count(F.when(F.col("c_custkey") >= 2000000, 1)).alias("n_dn_new"),
        dsum("c_acctbal", 2).alias("total_bal"),
    )


@query(
    "lifecycle_sql_join_dml",
    oracle="""
    WITH tgt AS (
      SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS c_acctbal
      FROM customer WHERE c_custkey % 3 = 0
    ),
    spend AS (
      SELECT o_custkey AS k,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS amt
      FROM orders GROUP BY o_custkey
    ),
    updated AS (
      SELECT t.c_custkey, t.c_name,
             CASE WHEN s.k IS NOT NULL
                  THEN CAST(CAST(t.c_acctbal AS DECIMAL(18,2))
                            + CAST(s.amt AS DECIMAL(18,2)) AS DOUBLE)
                  ELSE t.c_acctbal END AS c_acctbal
      FROM tgt t LEFT JOIN spend s ON t.c_custkey = s.k
    ),
    final AS (
      -- DELETE USING: drop customers with an URGENT order
      SELECT u.* FROM updated u
      WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = u.c_custkey AND o.o_orderpriority = '1-URGENT'
      )
    )
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS total_bal
    FROM final
    """,
)
def lifecycle_sql_join_dml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Postgres join-DML as statements: ``UPDATE ... FROM`` folds each
    customer's total order spend into the balance (one U batch from a
    join over the registered views), then ``DELETE ... USING`` drops
    customers holding an URGENT order (DISTINCT target rows, one D
    batch).  The oracle reconstructs both steps with joins."""
    eng = _temp_engine(spark)
    cust = (
        t(spark, sf_dir, "customer")
        .select(
            "c_custkey", "c_name",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
        )
        .filter("c_custkey % 3 = 0")
    )
    eng.create_table("cust_jd", source_df=cust, primary_key=["c_custkey"])
    t(spark, sf_dir, "orders").groupBy(
        F.col("o_custkey").alias("k")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double").alias("amt")
    ).createOrReplaceTempView("jd_spend")
    t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    ).createOrReplaceTempView("jd_orders")
    eng.sql("""
        UPDATE cust_jd SET
          c_acctbal = CAST(cust_jd.c_acctbal AS DECIMAL(18,2))
                      + CAST(jd_spend.amt AS DECIMAL(18,2))
        FROM jd_spend WHERE cust_jd.c_custkey = jd_spend.k
    """)
    eng.sql("""
        DELETE FROM cust_jd USING jd_orders
        WHERE cust_jd.c_custkey = jd_orders.o_custkey
          AND jd_orders.o_orderpriority = '1-URGENT'
    """)
    return eng.table("cust_jd").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("c_acctbal", 2).alias("total_bal"),
    )


@query(
    "lifecycle_sql_dml_subquery",
    oracle="""
    WITH tgt AS (
      SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS bal
      FROM customer WHERE c_custkey % 3 = 0
    ),
    s1 AS (
      -- UPDATE ... WHERE EXISTS (urgent order), inside the block
      SELECT c_custkey, c_name,
             CASE WHEN EXISTS (
                    SELECT 1 FROM orders o
                    WHERE o.o_custkey = tgt.c_custkey
                      AND o.o_orderpriority = '1-URGENT')
                  THEN CAST(CAST(bal AS DECIMAL(18,2))
                            + CAST(100 AS DECIMAL(18,2)) AS DOUBLE)
                  ELSE bal END AS bal
      FROM tgt
    ),
    s2 AS (
      -- DELETE ... WHERE c_custkey IN (>2 LOW orders), same block
      SELECT * FROM s1
      WHERE c_custkey NOT IN (
        SELECT o_custkey FROM orders
        WHERE o_orderpriority = '5-LOW'
        GROUP BY o_custkey HAVING COUNT(*) > 2)
    ),
    s3 AS (
      -- post-commit: scalar subquery over the table itself
      SELECT c_custkey, c_name,
             CASE WHEN bal > (SELECT MAX(bal) FROM s2) / 2
                  THEN CAST(CAST(bal AS DECIMAL(18,2)) * 2 AS DOUBLE)
                  ELSE bal END AS bal
      FROM s2
    ),
    s4 AS (
      -- DELETE ... WHERE NOT EXISTS (any order)
      SELECT * FROM s3
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = s3.c_custkey)
    ),
    s5 AS (
      -- row-form SET (bal) = (correlated subquery) on a slice
      SELECT c_custkey, c_name,
             CASE WHEN c_custkey % 7 = 0
                  THEN (SELECT CAST(COUNT(*) AS DOUBLE) FROM orders o
                        WHERE o.o_custkey = s4.c_custkey)
                  ELSE bal END AS bal
      FROM s4
    )
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(bal AS DECIMAL(30,2))) AS DOUBLE) AS total_bal
    FROM s5
    """,
)
def lifecycle_sql_dml_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subquery predicates in plain UPDATE/DELETE (round 18, VERDICT
    r17 missing #3): ``IN (SELECT ...)``, ``EXISTS``, ``NOT EXISTS``
    and scalar subqueries in a DML WHERE — the shapes every Postgres
    app writes — compile through the join-DML machinery (one SELECT
    over the registered views per statement; Catalyst plans the
    subquery as a semi/anti/scalar-subquery join).  Two statements run
    INSIDE a transaction block (stage-time, read-your-writes), two
    after COMMIT, one of them a self-referencing scalar subquery (MAX
    — order-independent, so both engines agree bit-exactly), and a
    final row-form ``SET (bal) = (correlated subquery)`` over a slice.
    The oracle replays all five statements as chained CTEs."""
    eng = _temp_engine(spark)
    cust = (
        t(spark, sf_dir, "customer")
        .select(
            "c_custkey", "c_name",
            F.col("c_acctbal").cast("double").alias("bal"),
        )
        .filter("c_custkey % 3 = 0")
    )
    eng.create_table("cust_sq", source_df=cust, primary_key=["c_custkey"])
    t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderpriority"
    ).createOrReplaceTempView("sq_orders")
    eng.sql("BEGIN")
    eng.sql("""
        UPDATE cust_sq SET
          bal = CAST(bal AS DECIMAL(18,2)) + CAST(100 AS DECIMAL(18,2))
        WHERE EXISTS (SELECT 1 FROM sq_orders o
                      WHERE o.o_custkey = cust_sq.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """)
    eng.sql("""
        DELETE FROM cust_sq
        WHERE c_custkey IN (
          SELECT o_custkey FROM sq_orders
          WHERE o_orderpriority = '5-LOW'
          GROUP BY o_custkey HAVING COUNT(*) > 2)
    """)
    eng.sql("COMMIT")
    eng.sql("""
        UPDATE cust_sq SET bal = CAST(bal AS DECIMAL(18,2)) * 2
        WHERE bal > (SELECT MAX(bal) FROM cust_sq) / 2
    """)
    eng.sql("""
        DELETE FROM cust_sq
        WHERE NOT EXISTS (SELECT 1 FROM sq_orders o
                          WHERE o.o_custkey = cust_sq.c_custkey)
    """)
    eng.sql("""
        UPDATE cust_sq SET (bal) =
          (SELECT CAST(COUNT(*) AS DOUBLE) FROM sq_orders o
           WHERE o.o_custkey = cust_sq.c_custkey)
        WHERE c_custkey % 7 = 0
    """)
    return eng.table("cust_sq").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("bal", 2).alias("total_bal"),
    )


@query(
    "lifecycle_sql_txn",
    oracle="""
    WITH cust0 AS (
      SELECT c_custkey, c_name, CAST(c_acctbal AS DOUBLE) AS c_acctbal
      FROM customer WHERE c_custkey % 5 = 0
      UNION ALL
      SELECT -1, 'txn-sentinel', CAST(100.0 AS DOUBLE)
    ),
    cust AS (
      -- committed UPDATE: double balances of custkeys divisible by 10
      SELECT c_custkey, c_name,
             CASE WHEN c_custkey % 10 = 0
                  THEN CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 2 AS DOUBLE)
                  ELSE c_acctbal END AS c_acctbal
      FROM cust0
    ),
    ord0 AS (
      SELECT o_orderkey, o_custkey, CAST(o_totalprice AS DOUBLE) AS o_totalprice
      FROM orders WHERE o_orderkey % 97 = 0
    ),
    ords AS (
      -- committed DELETE of expensive orders, plus the committed INSERT
      SELECT * FROM ord0 WHERE NOT (o_totalprice > 150000)
      UNION ALL
      SELECT -7, -1, CAST(50.0 AS DOUBLE)
    )
    -- the second BEGIN (delete everything / zero prices) ROLLED BACK:
    -- the oracle models only the committed block
    SELECT (SELECT COUNT(*) FROM cust) AS n_cust,
           (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE)
            FROM cust) AS total_bal,
           (SELECT COUNT(*) FROM ords) AS n_ord,
           (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
            FROM ords) AS total_price
    """,
)
def lifecycle_sql_txn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``BEGIN .. COMMIT / ROLLBACK`` blocks (VERDICT r10 task 4 — the
    reference replicates DML transactionally, reference CHANGELOG.md:22):
    one committed block mutates TWO mirrors (insert + read-your-writes
    update + join-free delete), becoming visible only at COMMIT; a
    second block deletes/zeroes everything and ROLLS BACK, leaving no
    trace.  The oracle reconstructs exactly the committed block."""
    eng = _temp_engine(spark)
    cust = (
        t(spark, sf_dir, "customer")
        .select(
            "c_custkey", "c_name",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
        )
        .filter("c_custkey % 5 = 0")
    )
    eng.create_table("cust_txn", source_df=cust, primary_key=["c_custkey"])
    ords = (
        t(spark, sf_dir, "orders")
        .select(
            "o_orderkey", "o_custkey",
            F.col("o_totalprice").cast("double").alias("o_totalprice"),
        )
        .filter("o_orderkey % 97 = 0")
    )
    eng.create_table("ord_txn", source_df=ords, primary_key=["o_orderkey"])
    eng.sql("BEGIN")
    eng.sql("INSERT INTO cust_txn VALUES (-1, 'txn-sentinel', 100.0)")
    eng.sql("""
        UPDATE cust_txn
        SET c_acctbal = CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 2 AS DOUBLE)
        WHERE c_custkey % 10 = 0
    """)
    eng.sql("DELETE FROM ord_txn WHERE o_totalprice > 150000")
    eng.sql("INSERT INTO ord_txn VALUES (-7, -1, 50.0)")
    eng.sql("COMMIT")
    eng.sql("BEGIN")
    eng.sql("DELETE FROM cust_txn WHERE true")
    eng.sql("UPDATE ord_txn SET o_totalprice = 0.0 WHERE true")
    eng.sql("ROLLBACK")
    c = eng.table("cust_txn").agg(
        F.count(F.lit(1)).alias("n_cust"),
        dsum("c_acctbal", 2).alias("total_bal"),
    )
    o = eng.table("ord_txn").agg(
        F.count(F.lit(1)).alias("n_ord"),
        dsum("o_totalprice", 2).alias("total_price"),
    )
    return c.crossJoin(o)


@query(
    "lifecycle_sql_txn_ddl",
    oracle="""
    WITH cust AS (
      SELECT c_custkey, c_nationkey, CAST(c_acctbal AS DOUBLE) AS bal
      FROM customer WHERE c_custkey % 7 = 0
    ),
    agg AS (
      SELECT c_nationkey,
             COUNT(*) AS cnt,
             CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS nat_bal
      FROM cust GROUP BY c_nationkey
    )
    -- the committed block: CTAS of agg + created note table with 2 rows
    -- + DROP of the source mirror; the second block (ghost table, DROP
    -- of agg) rolled back, so agg survives and ghost never existed
    SELECT (SELECT COUNT(*) FROM agg) AS n_groups,
           (SELECT CAST(SUM(CAST(nat_bal AS DECIMAL(30,2))) AS DOUBLE)
            FROM agg) AS total_bal,
           CAST(2 AS BIGINT) AS n_note,
           CAST(0 AS BIGINT) AS src_alive,
           CAST(0 AS BIGINT) AS ghost_alive
    """,
)
def lifecycle_sql_txn_ddl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transactional DDL (VERDICT r13 task 3): see the impl below —
    this thin wrapper keeps the two DDL registrations adjacent."""
    return _lifecycle_sql_txn_ddl_impl(spark, sf_dir)


def _lifecycle_sql_txn_alter_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Body of lifecycle_sql_txn_alter (registered after
    lifecycle_sql_txn_ddl, keeping the DDL keys adjacent)."""
    eng = _temp_engine(spark)
    cust = (
        t(spark, sf_dir, "customer")
        .select(
            "c_custkey", "c_nationkey",
            F.col("c_acctbal").cast("double").alias("bal"),
        )
        .filter("c_custkey % 5 = 0")
    )
    eng.create_table("cust_ta", source_df=cust, primary_key=["c_custkey"])
    # committed block: widen with a DEFAULT-backfilled column + attach a
    # CHECK, both staged, while DML runs on ANOTHER table in the block
    eng.sql("CREATE TABLE note_ta (k int PRIMARY KEY, v text)")
    eng.sql("BEGIN")
    eng.sql("ALTER TABLE cust_ta ADD COLUMN tier text DEFAULT 'std'")
    eng.sql("ALTER TABLE cust_ta ADD CONSTRAINT bal_known CHECK (bal IS NOT NULL)")
    eng.sql("INSERT INTO note_ta VALUES (1, 'widened')")
    eng.sql("COMMIT")
    # rolled-back block: the second widening leaves no trace
    eng.sql("BEGIN")
    eng.sql("ALTER TABLE cust_ta ADD COLUMN ghost int")
    eng.sql("ROLLBACK")
    # post-COMMIT the new column is writable and the CHECK enforced
    eng.sql(
        "INSERT INTO cust_ta VALUES (1000000007, 99, 1.0, 'gold')"
    )
    # round-15 extension: the remaining metadata ALTER shapes stage
    # too — one committed block VALIDATEs a NOT VALID check added in
    # the same block (read-your-writes existence; the scan runs at
    # stage time), drops the original check, and sets a column DEFAULT
    # that a column-list INSERT exercises after COMMIT
    eng.sql("BEGIN")
    eng.sql(
        "ALTER TABLE cust_ta ADD CONSTRAINT tier_known "
        "CHECK (tier IS NOT NULL) NOT VALID"
    )
    eng.sql("ALTER TABLE cust_ta VALIDATE CONSTRAINT tier_known")
    eng.sql("ALTER TABLE cust_ta DROP CONSTRAINT bal_known")
    eng.sql("ALTER TABLE cust_ta ALTER COLUMN tier SET DEFAULT 'silver'")
    eng.sql("COMMIT")
    eng.sql(
        "INSERT INTO cust_ta (c_custkey, c_nationkey, bal) "
        "VALUES (1000000009, 98, 2.0)"
    )
    cols = [f.name for f in eng._moontable("cust_ta").schema().fields]
    cons = eng._constraints("cust_ta") or {}
    check_names = {n for n, _ in cons.get("checks", [])}
    validated = (
        "tier_known" in check_names
        and "tier_known" not in cons.get("not_validated", [])
    )
    return eng.table("cust_ta").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("tier") == "std", 1)).alias("n_std"),
        F.count(F.when(F.col("tier") == "gold", 1)).alias("n_gold"),
        F.count(F.when(F.col("tier") == "silver", 1)).alias("n_silver"),
        dsum("bal", 2).alias("total_bal"),
    ).select(
        "n_rows", "n_std", "n_gold", "n_silver", "total_bal",
        F.lit(1 if "ghost" not in cols else 0).cast("long")
        .alias("ghost_gone"),
        F.lit(1 if "note_ta" in eng.catalog.list_tables() else 0)
        .cast("long").alias("note_alive"),
        F.lit(0 if "bal_known" in check_names else 1).cast("long")
        .alias("bal_known_gone"),
        F.lit(1 if validated else 0).cast("long").alias("tier_validated"),
    )


def _lifecycle_sql_txn_ddl_impl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transactional DDL (VERDICT r13 task 3 — Postgres, the
    reference's host, runs CREATE/DROP TABLE transactionally; the
    reference regress wraps DDL+DML flows,
    reference tests/pg_regress/sql/sanity.sql:1-7): one committed block
    stages a CTAS, a column-def CREATE with an insert, and a DROP of
    the source mirror — all applied atomically at COMMIT through the
    durable write-ahead path; a second block creates a table and drops
    the CTAS result, then ROLLS BACK leaving no trace.  The oracle
    reconstructs exactly the committed post-state."""
    eng = _temp_engine(spark)
    cust = (
        t(spark, sf_dir, "customer")
        .select(
            "c_custkey", "c_nationkey",
            F.col("c_acctbal").cast("double").alias("bal"),
        )
        .filter("c_custkey % 7 = 0")
    )
    eng.create_table("cust_td", source_df=cust, primary_key=["c_custkey"])
    eng.sql("BEGIN")
    eng.sql("""
        CREATE TABLE agg_td AS
        SELECT c_nationkey,
               count(*) AS cnt,
               CAST(SUM(CAST(bal AS DECIMAL(18,2))) AS DOUBLE) AS nat_bal
        FROM cust_td GROUP BY c_nationkey
    """)
    eng.sql("CREATE TABLE note_td (k int PRIMARY KEY, v text NOT NULL)")
    eng.sql("INSERT INTO note_td VALUES (1, 'first'), (2, 'second')")
    eng.sql("DROP TABLE cust_td")
    eng.sql("COMMIT")
    eng.sql("BEGIN")
    eng.sql("CREATE TABLE ghost_td (k int PRIMARY KEY)")
    eng.sql("INSERT INTO ghost_td VALUES (1)")
    eng.sql("DROP TABLE agg_td")
    eng.sql("ROLLBACK")
    tables = eng.catalog.list_tables()
    a = eng.table("agg_td").agg(
        F.count(F.lit(1)).alias("n_groups"),
        dsum("nat_bal", 2).alias("total_bal"),
    )
    n = eng.table("note_td").agg(F.count(F.lit(1)).alias("n_note"))
    return a.crossJoin(n).select(
        "n_groups", "total_bal", "n_note",
        F.lit(1 if "cust_td" in tables else 0).cast("long")
        .alias("src_alive"),
        F.lit(1 if "ghost_td" in tables else 0).cast("long")
        .alias("ghost_alive"),
    )


@query(
    "lifecycle_sql_txn_alter",
    oracle="""
    WITH cust AS (
      SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS bal
      FROM customer WHERE c_custkey % 5 = 0
    )
    -- committed block: ADD COLUMN tier DEFAULT 'std' (backfills every
    -- existing row) + ADD CHECK; the ghost column rolled back; one
    -- post-COMMIT insert carries tier='gold'.  A second committed
    -- block (round-15 shapes) VALIDATEs a NOT VALID check added in the
    -- same block, drops bal_known, and sets DEFAULT 'silver' that the
    -- final column-list insert picks up
    SELECT (SELECT COUNT(*) FROM cust) + 2 AS n_rows,
           (SELECT COUNT(*) FROM cust) AS n_std,
           CAST(1 AS BIGINT) AS n_gold,
           CAST(1 AS BIGINT) AS n_silver,
           (SELECT CAST(SUM(CAST(bal AS DECIMAL(30,2))) + 3.00 AS DOUBLE)
            FROM cust) AS total_bal,
           CAST(1 AS BIGINT) AS ghost_gone,
           CAST(1 AS BIGINT) AS note_alive,
           CAST(1 AS BIGINT) AS bal_known_gone,
           CAST(1 AS BIGINT) AS tier_validated
    """,
)
def lifecycle_sql_txn_alter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transactional ALTER TABLE (round 15; VERDICT r14 missing #2 —
    Postgres runs ALTER inside transaction blocks): a committed block
    stages ADD COLUMN with a DEFAULT backfill plus ADD CONSTRAINT CHECK
    on an untouched table while DML runs on another table; a second
    block widens again and ROLLS BACK leaving no trace; after COMMIT
    the column is writable and the CHECK enforced.  The oracle
    reconstructs the committed post-state."""
    return _lifecycle_sql_txn_alter_impl(spark, sf_dir)


@query(
    "lifecycle_sql_savepoint",
    oracle="""
    WITH base AS (
      SELECT CAST(CAST(CAST(c_acctbal AS DOUBLE) AS DECIMAL(18,2)) * 3
                  AS DOUBLE) AS bal
      FROM customer WHERE c_custkey % 11 = 0
      UNION ALL
      SELECT CAST(100.0 AS DOUBLE)  -- the pre-savepoint sentinel insert
    )
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(bal AS DECIMAL(30,2))) AS DOUBLE) AS total_bal
    FROM base
    """,
)
def lifecycle_sql_savepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SAVEPOINT`` / ``ROLLBACK TO`` / ``RELEASE`` (round 12 — the last
    unrouted Postgres-script statements): work after a savepoint rolls
    back without discarding the block, a failed statement poisons the
    block and ROLLBACK TO un-poisons it (the statement's canonical use),
    RELEASE keeps changes.  The oracle models exactly the surviving
    effects: base rows with the tripled balances plus the sentinel."""
    eng = _temp_engine(spark)
    cust = (
        t(spark, sf_dir, "customer")
        .select(
            "c_custkey", "c_name",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
        )
        .filter("c_custkey % 11 = 0")
    )
    eng.create_table("cust_sp", source_df=cust, primary_key=["c_custkey"])
    eng.sql("BEGIN")
    eng.sql("INSERT INTO cust_sp VALUES (-1, 'sentinel', 100.0)")
    eng.sql("SAVEPOINT s1")
    eng.sql("INSERT INTO cust_sp VALUES (-2, 'discarded', 999.0)")
    eng.sql("UPDATE cust_sp SET c_acctbal = c_acctbal * 100 WHERE true")
    eng.sql("ROLLBACK TO SAVEPOINT s1")  # discards both statements
    eng.sql("""
        UPDATE cust_sp
        SET c_acctbal = CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 3 AS DOUBLE)
        WHERE c_custkey >= 0
    """)
    eng.sql("SAVEPOINT s2")
    eng.sql("DELETE FROM cust_sp WHERE c_custkey = -1")
    try:  # a failed statement poisons the block ...
        eng.sql("INSERT INTO no_such_mirror VALUES (1)")
    except Exception:
        pass
    eng.sql("ROLLBACK TO s2")  # ... ROLLBACK TO un-poisons it
    eng.sql("RELEASE SAVEPOINT s2")
    eng.sql("COMMIT")
    return eng.table("cust_sp").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("c_acctbal", 2).alias("total_bal"),
    )


@query(
    "lifecycle_sql_copy",
    oracle="""
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(CAST(c_acctbal AS DOUBLE) AS DECIMAL(30,2)))
                AS DOUBLE) AS total_bal
    FROM customer WHERE c_custkey % 7 = 0
    """,
)
def lifecycle_sql_copy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``COPY`` statements end-to-end (VERDICT r10 task 5 — the
    reference replicates COPY bulk loads, reference CHANGELOG.md:22):
    a customer-subset mirror COPY TO csv on disk, then COPY FROM that
    csv into a second, empty mirror — format/header options on both
    sides.  The roundtrip is the identity, so the oracle is the
    subset itself."""
    import os as _os

    eng = _temp_engine(spark)
    cust = (
        t(spark, sf_dir, "customer")
        .select(
            "c_custkey", "c_name",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
        )
        .filter("c_custkey % 7 = 0")
    )
    eng.create_table("cust_src", source_df=cust, primary_key=["c_custkey"])
    eng.create_table(
        "cust_dst", source_df=cust.limit(0), primary_key=["c_custkey"]
    )
    out = _os.path.join(
        tempfile.mkdtemp(prefix="mooncake_copy_"), "cust.csv"
    )
    eng.sql(f"COPY cust_src TO '{out}' WITH (FORMAT csv, HEADER true)")
    eng.sql(f"COPY cust_dst FROM '{out}' WITH (FORMAT csv, HEADER true)")
    return eng.table("cust_dst").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("c_acctbal", 2).alias("total_bal"),
    )


@query(
    "lifecycle_sql_prepare",
    oracle="""
    WITH base AS (
      SELECT c_custkey,
             CAST(c_acctbal AS DOUBLE) AS c_acctbal
      FROM customer WHERE c_custkey % 7 = 0
    ),
    bumped AS (
      -- EXECUTE bump(14, 10.0): +10 to custkeys divisible by 14
      SELECT c_custkey,
             CASE WHEN c_custkey % 14 = 0
                  THEN CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 10.0
                            AS DOUBLE)
                  ELSE c_acctbal END AS c_acctbal
      FROM base
    ),
    kept AS (
      -- the $1-bound DELETE removed negative balances
      SELECT * FROM bumped WHERE NOT (c_acctbal < 0)
    )
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE)
             AS total_bal,
           3 AS n_cols
    FROM kept
    """,
)
def lifecycle_sql_prepare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``PREPARE`` / ``EXECUTE`` / ``$n`` parameter binding +
    ``information_schema`` introspection (round 12): a prepared
    parameterized UPDATE executes with bound arguments, a direct
    ``sql(..., params=[...])`` DELETE binds Python values as typed
    literals, and the final result joins the mirror aggregate with a
    column count read through ``information_schema.columns`` — the
    extended-protocol + catalog surfaces every Postgres client
    library drives (reference users reach them through psycopg /
    JDBC against the source)."""
    eng = _temp_engine(spark)
    cust = (
        t(spark, sf_dir, "customer")
        .select(
            "c_custkey", "c_name",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
        )
        .filter("c_custkey % 7 = 0")
    )
    eng.create_table("cust_ps", source_df=cust, primary_key=["c_custkey"])
    eng.sql("""
        PREPARE bump (int, double precision) AS
        UPDATE cust_ps
        SET c_acctbal = CAST(CAST(c_acctbal AS DECIMAL(18,2)) + $2 AS DOUBLE)
        WHERE c_custkey % $1 = 0
    """)
    eng.sql("EXECUTE bump(14, 10.0)")
    eng.sql(
        "DELETE FROM cust_ps WHERE c_acctbal < $1", params=[0.0]
    )
    eng.sql("DEALLOCATE bump")
    agg = eng.table("cust_ps").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("c_acctbal", 2).alias("total_bal"),
    )
    cols = eng.sql(
        "SELECT CAST(count(*) AS INT) AS n_cols "
        "FROM information_schema.columns WHERE table_name = 'cust_ps'"
    )
    return agg.crossJoin(cols)


@query(
    "lifecycle_sql_time_travel",
    oracle="""
    WITH v1 AS (
      SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS c_acctbal
      FROM customer WHERE c_custkey % 13 = 0
    ),
    v2 AS (
      SELECT * FROM v1 WHERE NOT (c_acctbal < 1000)
    )
    SELECT (SELECT COUNT(*) FROM v1) AS n_v1,
           (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE)
            FROM v1) AS bal_v1,
           (SELECT COUNT(*) FROM v2) AS n_now,
           (SELECT COUNT(*) FROM v1 WHERE c_acctbal < 1000) AS n_gone
    """,
)
def lifecycle_sql_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``FROM t FOR VERSION AS OF n`` / ``FOR SYSTEM_TIME AS OF ts``
    (round 12): the engine's LSN-pinned read (A10,
    reference src/duckdb_mooncake.rs:26-29 pins XactLastCommitEnd)
    as a SQL:2011 system-versioning spelling — a pinned pre-DML
    snapshot queries alongside the current state in ONE statement,
    including a cross-version anti-join recovering exactly the
    deleted rows."""
    eng = _temp_engine(spark)
    cust = (
        t(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
        )
        .filter("c_custkey % 13 = 0")
    )
    eng.create_table("cust_tt", source_df=cust, primary_key=["c_custkey"])
    eng.sql("DELETE FROM cust_tt WHERE c_acctbal < 1000")
    return eng.sql("""
        SELECT
          (SELECT count(*) FROM cust_tt FOR VERSION AS OF 1) AS n_v1,
          (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,2))) AS DOUBLE)
           FROM cust_tt FOR VERSION AS OF 1) AS bal_v1,
          (SELECT count(*) FROM cust_tt) AS n_now,
          (SELECT count(*) FROM cust_tt FOR VERSION AS OF 1 a
           LEFT ANTI JOIN cust_tt b ON a.c_custkey = b.c_custkey) AS n_gone
    """)


@query(
    "lifecycle_sql_constraints",
    oracle="""
    WITH loaded AS (
      SELECT c_custkey AS id, CAST(c_acctbal AS DOUBLE) AS bal,
             'cust' AS tag
      FROM customer WHERE c_custkey % 9 = 0 AND c_acctbal >= 0
    ),
    all_rows AS (
      SELECT * FROM loaded
      UNION ALL SELECT -1, CAST(0.0 AS DOUBLE), 'base'   -- defaults fill
      UNION ALL SELECT -2, CAST(0.0 AS DOUBLE), 'x'      -- DEFAULT keyword
    ),
    bumped AS (
      -- the committed UPDATE: +1 on the sentinel rows
      SELECT id,
             CASE WHEN id < 0
                  THEN CAST(CAST(bal AS DECIMAL(18,2)) + 1.0 AS DOUBLE)
                  ELSE bal END AS bal,
             tag
      FROM all_rows
    )
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(bal AS DECIMAL(30,2))) AS DOUBLE) AS total_bal,
           COUNT(CASE WHEN tag = 'base' THEN 1 END) AS n_base_tag
    FROM bumped
    """,
)
def lifecycle_sql_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT NULL / CHECK / DEFAULT table constraints (round 12): declared
    in CREATE TABLE, enforced in-job on every write path (the MERGE-
    guard raise_error pattern — zero extra jobs), with Postgres error
    spellings.  Violating statements leave no trace (per-statement
    atomicity); the oracle reconstructs exactly the legal committed
    writes including both DEFAULT application forms."""
    eng = _temp_engine(spark)
    cust = (
        t(spark, sf_dir, "customer")
        .select(
            "c_custkey",
            F.col("c_acctbal").cast("double").alias("c_acctbal"),
        )
        .filter("c_custkey % 9 = 0")
    )
    eng.create_table("cust_cc", source_df=cust, primary_key=["c_custkey"])
    eng.sql("""
        CREATE TABLE acct_c (
          id bigint PRIMARY KEY,
          bal double precision DEFAULT 0.0 CHECK (bal >= 0.0),
          tag text NOT NULL DEFAULT 'base'
        )
    """)
    eng.sql("""
        INSERT INTO acct_c (id, bal, tag)
        SELECT c_custkey, c_acctbal, 'cust' FROM cust_cc
        WHERE c_acctbal >= 0
    """)
    eng.sql("INSERT INTO acct_c (id) VALUES (-1)")
    eng.sql("INSERT INTO acct_c VALUES (-2, DEFAULT, 'x')")
    for bad in (
        "INSERT INTO acct_c VALUES (-3, -5.0, 'neg')",   # CHECK
        "INSERT INTO acct_c VALUES (-4, 1.0, NULL)",     # NOT NULL
        "UPDATE acct_c SET bal = bal - 1e9 WHERE id = -1",  # CHECK post
    ):
        try:
            eng.sql(bad)
            raise AssertionError(f"constraint not enforced: {bad}")
        except AssertionError:
            raise
        except Exception:
            pass  # refused, per-statement atomic — no trace
    eng.sql("""
        UPDATE acct_c
        SET bal = CAST(CAST(bal AS DECIMAL(18,2)) + 1.0 AS DOUBLE)
        WHERE id < 0
    """)
    return eng.table("acct_c").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("bal", 2).alias("total_bal"),
        F.count(F.when(F.col("tag") == "base", 1)).alias("n_base_tag"),
    )


@query(
    "lifecycle_sql_generated",
    oracle="""
    WITH base AS (
      SELECT c_custkey AS id,
             CAST(c_custkey % 5 + 1 AS INT) AS qty,
             CAST(c_acctbal AS DOUBLE) AS price
      FROM customer WHERE c_custkey % 7 = 0
    ),
    bumped AS (
      -- the committed UPDATE: qty += 2 on id % 3 = 0 rows; the
      -- generated column recomputes simultaneously
      SELECT id,
             CASE WHEN id % 3 = 0 THEN qty + 2 ELSE qty END AS qty,
             price
      FROM base
    ),
    post AS (
      SELECT id, qty, price,
             qty * price AS amount,          -- GENERATED ALWAYS AS
             (qty * price) * 0.1 AS fee      -- added by ALTER, backfilled
      FROM bumped
    )
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(CAST(amount AS DECIMAL(30,2))) AS DOUBLE) AS total_amount,
           CAST(SUM(CAST(fee AS DECIMAL(30,4))) AS DOUBLE) AS total_fee,
           COUNT(CASE WHEN amount < 0 THEN 1 END) AS n_neg
    FROM post
    """,
)
def lifecycle_sql_generated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GENERATED ALWAYS AS (expr) STORED columns (round 12): computed
    as a pure projection on every write path (never an extra job),
    excluded from the implicit INSERT target list, recomputed through
    UPDATE's simultaneous-assignment substitution, backfillable via
    ALTER TABLE ADD COLUMN, and write-protected with the Postgres
    error spellings.  The oracle reconstructs the committed state with
    the same arithmetic."""
    eng = _temp_engine(spark)
    src = (
        t(spark, sf_dir, "customer")
        .filter("c_custkey % 7 = 0")
        .select(
            F.col("c_custkey").alias("id"),
            (F.col("c_custkey") % 5 + 1).cast("int").alias("qty"),
            F.col("c_acctbal").cast("double").alias("price"),
        )
    )
    eng.create_table("led_src", source_df=src, primary_key=["id"])
    eng.sql("""
        CREATE TABLE ledger (
          id bigint PRIMARY KEY,
          qty int NOT NULL DEFAULT 1,
          price double precision,
          amount double precision GENERATED ALWAYS AS (qty * price) STORED
        )
    """)
    eng.sql("INSERT INTO ledger (id, qty, price) SELECT id, qty, price FROM led_src")
    for bad in (
        # explicit non-DEFAULT write into a generated column
        "INSERT INTO ledger (id, qty, price, amount) VALUES (-1, 1, 1.0, 9.9)",
        "UPDATE ledger SET amount = 0 WHERE id = 7",
    ):
        try:
            eng.sql(bad)
            raise AssertionError(f"generated column not protected: {bad}")
        except AssertionError:
            raise
        except Exception:
            pass  # refused; per-statement atomic
    eng.sql("UPDATE ledger SET qty = qty + 2 WHERE id % 3 = 0")
    # ALTER adds a second generated column and backfills existing rows
    eng.sql("""
        ALTER TABLE ledger ADD COLUMN fee double precision
          GENERATED ALWAYS AS ((qty * price) * 0.1) STORED
    """)
    return eng.table("ledger").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("amount", 2).alias("total_amount"),
        dsum("fee", 4).alias("total_fee"),
        F.count(F.when(F.col("amount") < 0, 1)).alias("n_neg"),
    )


@query(
    "lifecycle_sql_views",
    oracle="""
    WITH base AS (
      SELECT c_custkey AS id, CAST(c_acctbal AS DOUBLE) AS bal,
             c_nationkey AS nk
      FROM customer WHERE c_custkey % 6 = 0
    ),
    after_dml AS (
      -- committed UPDATE: double mid-range balances — rows CROSS the
      -- view's 1000 threshold, so a stale-snapshot view would differ
      SELECT id,
             CASE WHEN bal > 500.0 AND bal <= 1500.0
                  THEN bal * 2 ELSE bal END AS bal,
             nk
      FROM base
    )
    SELECT nk,
           COUNT(*) AS n_rich,
           CAST(SUM(CAST(bal AS DECIMAL(30,2))) AS DOUBLE) AS total_bal
    FROM after_dml WHERE bal > 1000.0
    GROUP BY nk ORDER BY nk
    """,
)
def lifecycle_sql_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog-persisted logical views (round 12): CREATE VIEW stores
    the SQL; every read re-plans against the CURRENT base state, so
    DML through the base shows through the view (and a nested view)
    with zero maintenance machinery.  The oracle reconstructs the
    committed base state and applies the view predicates directly."""
    eng = _temp_engine(spark)
    src = (
        t(spark, sf_dir, "customer")
        .filter("c_custkey % 6 = 0")
        .select(
            F.col("c_custkey").alias("id"),
            F.col("c_acctbal").cast("double").alias("bal"),
            F.col("c_nationkey").alias("nk"),
        )
    )
    eng.create_table("acct_v", source_df=src, primary_key=["id"])
    eng.sql("CREATE VIEW rich_v AS "
            "SELECT id, bal, nk FROM acct_v WHERE bal > 1000.0")
    eng.sql("CREATE VIEW rich_by_nation_v AS "
            "SELECT nk, count(*) AS n_rich, "
            "CAST(SUM(CAST(bal AS DECIMAL(30,2))) AS DOUBLE) AS total_bal "
            "FROM rich_v GROUP BY nk")
    # DML AFTER the views exist must show through both layers: the
    # doubled rows cross the views' 1000 threshold, so a snapshot-at-
    # CREATE regression changes counts AND sums
    eng.sql("""
        UPDATE acct_v SET bal = bal * 2
        WHERE bal > 500.0 AND bal <= 1500.0
    """)
    return eng.sql("SELECT * FROM rich_by_nation_v ORDER BY nk")


@query(
    "lifecycle_sql_cursor",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS price,
             ROW_NUMBER() OVER (ORDER BY o_orderkey) AS rn
      FROM orders WHERE o_custkey % 19 = 0
    ),
    fetched AS (
      -- FETCH 7                    -> rows 1..7
      SELECT k, price FROM base WHERE rn BETWEEN 1 AND 7
      -- MOVE 5 skips 8..12; FETCH 6 -> rows 13..18
      UNION ALL SELECT k, price FROM base WHERE rn BETWEEN 13 AND 18
      -- FETCH ABSOLUTE 25          -> row 25
      UNION ALL SELECT k, price FROM base WHERE rn = 25
      -- FETCH BACKWARD 3           -> rows 24, 23, 22
      UNION ALL SELECT k, price FROM base WHERE rn IN (22, 23, 24)
    )
    SELECT COUNT(*) AS n_rows,
           CAST(SUM(k) AS BIGINT) AS sum_keys,
           CAST(SUM(CAST(price AS DECIMAL(30,2))) AS DOUBLE) AS sum_price,
           -- DELETE WHERE CURRENT OF removed exactly row 22 (the
           -- cursor's position after FETCH BACKWARD 3)
           (SELECT COUNT(*) - 1 FROM base) AS n_remaining
    FROM fetched
    """,
)
def lifecycle_sql_cursor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Postgres cursors end-to-end (round 15): DECLARE SCROLL inside a
    transaction block over an engine mirror, then FETCH count / MOVE /
    FETCH ABSOLUTE / FETCH BACKWARD page through the pinned plan.  The
    oracle reconstructs each fetched slice with ROW_NUMBER ranges over
    the same total order; a position drifting by one row, a MOVE that
    returns rows, or BACKWARD serving the wrong direction all break
    the hash.  The fetched chunks are unioned as a MULTISET (UNION
    ALL), so a chunk double-serving a row breaks it too."""
    eng = _temp_engine(spark)
    src = (
        t(spark, sf_dir, "orders")
        .filter("o_custkey % 19 = 0")
        .select(
            F.col("o_orderkey").alias("k"),
            F.col("o_totalprice").cast("double").alias("price"),
        )
    )
    eng.create_table("ord_cur", source_df=src, primary_key=["k"])
    eng.sql("BEGIN")
    eng.sql(
        "DECLARE cur SCROLL CURSOR FOR "
        "SELECT k, price FROM ord_cur ORDER BY k"
    )
    chunks = [eng.sql("FETCH 7 FROM cur")]
    eng.sql("MOVE 5 IN cur")
    chunks.append(eng.sql("FETCH 6 FROM cur"))
    chunks.append(eng.sql("FETCH ABSOLUTE 25 FROM cur"))
    chunks.append(eng.sql("FETCH BACKWARD 3 FROM cur"))
    # positioned on row 22 after BACKWARD 3: positioned DELETE (the
    # WHERE CURRENT OF idiom) removes exactly that row
    eng.sql("DELETE FROM ord_cur WHERE CURRENT OF cur")
    eng.sql("CLOSE cur")
    eng.sql("COMMIT")
    out = chunks[0]
    for c in chunks[1:]:
        out = out.unionAll(c)
    agg = out.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("k").alias("sum_keys"),
        dsum("price", 2).alias("sum_price"),
    )
    rem = eng.table("ord_cur").agg(
        F.count(F.lit(1)).alias("n_remaining")
    )
    return agg.crossJoin(rem)


@query(
    "lifecycle_sql_merge_returning",
    oracle="""
    WITH tgt AS (
      SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS bal
      FROM customer WHERE c_custkey % 6 = 0
    ),
    src AS (
      SELECT o_custkey AS k,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS spend
      FROM orders WHERE o_custkey % 4 = 0 GROUP BY o_custkey
    ),
    acts AS (
      -- WHEN MATCHED AND spend > 300000 THEN UPDATE (post-images)
      SELECT 'UPDATE' AS act,
             CAST(CAST(t.bal AS DECIMAL(18,2))
                  + CAST(s.spend AS DECIMAL(18,2)) AS DOUBLE) AS bal
      FROM tgt t JOIN src s ON t.c_custkey = s.k WHERE s.spend > 300000
      UNION ALL
      -- WHEN MATCHED THEN DELETE (pre-images, first-match-wins)
      SELECT 'DELETE', t.bal
      FROM tgt t JOIN src s ON t.c_custkey = s.k
      WHERE NOT (s.spend > 300000)
      UNION ALL
      -- WHEN NOT MATCHED THEN INSERT (the new rows)
      SELECT 'INSERT', s.spend
      FROM src s LEFT JOIN tgt t ON t.c_custkey = s.k
      WHERE t.c_custkey IS NULL
    )
    SELECT act, COUNT(*) AS n,
           CAST(SUM(CAST(bal AS DECIMAL(30,2))) AS DOUBLE) AS total_bal
    FROM acts GROUP BY act ORDER BY act
    """,
)
def lifecycle_sql_merge_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``MERGE ... RETURNING`` with PostgreSQL 17 semantics (round 15):
    one returned row per action taken — UPDATE post-images, DELETE
    pre-images, INSERT new rows — with ``merge_action()`` naming the
    action.  The oracle reconstructs all three action sets
    relationally; a pre-image where a post-image belongs (or vice
    versa), a mislabeled action, or a DO-branch row leaking breaks
    the hash."""
    eng = _temp_engine(spark)
    cust = (
        t(spark, sf_dir, "customer")
        .filter("c_custkey % 6 = 0")
        .select(
            "c_custkey",
            F.col("c_acctbal").cast("double").alias("bal"),
        )
    )
    eng.create_table("cust_mr", source_df=cust, primary_key=["c_custkey"])
    t(spark, sf_dir, "orders").filter("o_custkey % 4 = 0").groupBy(
        F.col("o_custkey").alias("k")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double").alias("spend")
    ).createOrReplaceTempView("merge_ret_src")
    ret = eng.sql("""
        MERGE INTO cust_mr USING merge_ret_src AS s
          ON cust_mr.c_custkey = s.k
        WHEN MATCHED AND s.spend > 300000 THEN UPDATE SET
          bal = CAST(CAST(cust_mr.bal AS DECIMAL(18,2))
                     + CAST(s.spend AS DECIMAL(18,2)) AS DOUBLE)
        WHEN MATCHED THEN DELETE
        WHEN NOT MATCHED THEN INSERT (c_custkey, bal)
          VALUES (s.k, s.spend)
        RETURNING merge_action() AS act, bal
    """)
    return (
        ret.groupBy("act")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("bal", 2).alias("total_bal"),
        )
        .orderBy("act")
    )


@query(
    "lifecycle_sql_dump_replay",
    oracle="""
    WITH copied AS (
      SELECT * FROM (VALUES (1, 'alpha', 1.5), (2, 'beta', 2.5),
                            (3, 'alpha', NULL)) AS v(k, v, x)
    ),
    app AS (
      SELECT o_orderpriority AS v, CAST(o_totalprice AS DOUBLE) AS x
      FROM orders WHERE o_orderkey % 13 = 0
    ),
    c AS (SELECT COUNT(*) AS cnt FROM app),
    loaded AS (
      SELECT v, x FROM copied
      UNION ALL
      SELECT v, x FROM app
    )
    SELECT COUNT(*) AS n_rows,
           COUNT(x) AS n_x,
           CAST(SUM(CAST(COALESCE(x, 0.0) AS DECIMAL(30,2))) AS DOUBLE)
             AS sum_x,
           COUNT(DISTINCT v) AS n_v,
           (SELECT CAST(((3 + cnt) * (4 + cnt)) // 2 AS BIGINT) FROM c)
             AS sum_k,
           CAST(1 AS BIGINT) AS pk_ok,
           CAST(1 AS BIGINT) AS idx_ok,
           CAST(1 AS BIGINT) AS comment_ok,
           CAST(1 AS BIGINT) AS seq_ok
    FROM loaded
    """,
)
def lifecycle_sql_dump_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A VERBATIM pg_dump 17 restore replayed whole through
    :meth:`~pg_mooncake_spark.sql_router.SqlRouterMixin.sql_script`
    (round 16 — the round-15 capstone used a curated script; this one
    keeps the REAL shape statement for statement): the untouched
    preamble SET list + ``set_config``, schema-qualified DDL with
    ``OWNER TO`` / ``GRANT``, the serial-pk wiring (CREATE SEQUENCE +
    OWNED BY + ``ALTER TABLE ONLY ... SET DEFAULT
    nextval('...'::regclass)``), a ``COPY t (cols) FROM STDIN`` data
    section with a ``\\N`` NULL, ``SELECT pg_catalog.setval(...)``,
    and the post-data section — ``ADD CONSTRAINT ... PRIMARY KEY``
    (the key arrives AFTER the data, as in every real dump), CREATE
    INDEX, COMMENT ON — inside one ``BEGIN .. COMMIT`` the way ``psql
    --single-transaction`` restores run.  Afterwards an application
    INSERT draws ids from the RESTORED sequence (setval watermark
    honored, distributed block assignment).  The oracle reconstructs
    the rows; ``sum_k`` pins the sequence-assigned ids (consecutive
    block after the setval), and the flag columns assert the pk /
    index / comments / sequence state actually registered."""
    from pg_mooncake_spark.queries.registry import register_views

    register_views(spark, sf_dir, "orders")
    eng = _temp_engine(spark)
    eng.sql_script("""
        SET statement_timeout = 0;
        SET lock_timeout = 0;
        SET idle_in_transaction_session_timeout = 0;
        SET client_encoding = 'UTF8';
        SET standard_conforming_strings = on;
        SELECT pg_catalog.set_config('search_path', '', false);
        SET check_function_bodies = false;
        SET xmloption = content;
        SET client_min_messages = warning;
        SET row_security = off;
        SET default_tablespace = '';
        SET default_table_access_method = heap;
        BEGIN;
        CREATE TABLE public.dump_t (
            k integer NOT NULL,
            v text,
            x double precision
        );
        ALTER TABLE public.dump_t OWNER TO app_role;
        CREATE SEQUENCE public.dump_t_k_seq
            AS integer
            START WITH 1
            INCREMENT BY 1
            NO MINVALUE
            NO MAXVALUE
            CACHE 1;
        ALTER SEQUENCE public.dump_t_k_seq OWNER TO app_role;
        ALTER SEQUENCE public.dump_t_k_seq OWNED BY public.dump_t.k;
        ALTER TABLE ONLY public.dump_t ALTER COLUMN k SET DEFAULT nextval('public.dump_t_k_seq'::regclass);
        COPY public.dump_t (k, v, x) FROM STDIN;
1	alpha	1.5
2	beta	2.5
3	alpha	\\N
\\.
        SELECT pg_catalog.setval('public.dump_t_k_seq', 3, true);
        ALTER TABLE ONLY public.dump_t ADD CONSTRAINT dump_t_pkey PRIMARY KEY (k);
        CREATE INDEX dump_t_v_idx ON public.dump_t USING btree (v);
        COMMENT ON TABLE public.dump_t IS 'restored';
        COMMENT ON COLUMN public.dump_t.v IS 'priority or letter';
        GRANT SELECT ON TABLE public.dump_t TO PUBLIC;
        COMMIT;
        ANALYZE public.dump_t;
    """)
    # post-restore application write: ids come from the restored
    # sequence (honoring the dump's setval watermark), assigned
    # distributed across the bulk INSERT ... SELECT
    eng.sql("""
        INSERT INTO public.dump_t (v, x)
        SELECT o_orderpriority, CAST(o_totalprice AS DOUBLE)
        FROM orders WHERE o_orderkey % 13 = 0
    """)
    cons = eng._constraints("public.dump_t") or {}
    idx_ok = 1 if "dump_t_v_idx" in (cons.get("indexes") or {}) else 0
    com = cons.get("comments") or {}
    comment_ok = (
        1 if com.get("__table__") == "restored"
        and com.get("col:v") == "priority or letter" else 0
    )
    pk_ok = (
        1 if eng._moontable("public.dump_t").primary_key() == ["k"] else 0
    )
    n_app = eng.table("public.dump_t").count() - 3
    seq = eng.catalog.seq_get("public.dump_t_k_seq")
    seq_ok = (
        1 if seq["last_value"] == 3 + n_app and seq["is_called"]
        and list(seq["owned_by"]) == ["public.dump_t", "k"] else 0
    )
    return eng.table("public.dump_t").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("x").alias("n_x"),
        dsum(F.coalesce(F.col("x"), F.lit(0.0)), 2).alias("sum_x"),
        F.countDistinct("v").alias("n_v"),
        F.sum("k").cast("long").alias("sum_k"),
    ).select(
        "n_rows", "n_x", "sum_x", "n_v", "sum_k",
        F.lit(pk_ok).cast("long").alias("pk_ok"),
        F.lit(idx_ok).cast("long").alias("idx_ok"),
        F.lit(comment_ok).cast("long").alias("comment_ok"),
        F.lit(seq_ok).cast("long").alias("seq_ok"),
    )


@query(
    "lifecycle_sql_sequences",
    oracle="""
    WITH n AS (SELECT COUNT(*) AS cnt FROM nation)
    SELECT CAST(10 + 15 + 20 AS BIGINT) AS explicit_sum,
           CAST(100 AS BIGINT) AS after_setval,
           (SELECT CAST((cnt * (cnt + 1)) // 2 AS BIGINT) FROM n)
             AS serial_sum,
           (SELECT CAST(cnt AS BIGINT) FROM n) AS serial_rows,
           CAST(1000 + 1010 + 1020 AS BIGINT) AS identity_sum,
           CAST(1 + 2 + 1 + 2 AS BIGINT) AS cycle_sum
    """,
)
def lifecycle_sql_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Postgres sequences end-to-end (round 16; VERDICT r15 missing #1
    — the reference's host executes these natively, README.md:16):
    CREATE SEQUENCE with START/INCREMENT, nextval/setval with
    is_called semantics, a CYCLE sequence wrapping at MAXVALUE, a
    ``serial`` column assigning consecutive ids across a bulk
    INSERT ... SELECT (the distributed block-allocation path), and a
    GENERATED ALWAYS AS IDENTITY column with options.  Every value
    lands in a mirror and the oracle recomputes the expected
    arithmetic from first principles — consecutive serial ids over the
    nation table must sum to cnt*(cnt+1)/2 regardless of which
    partition got which id."""
    from pg_mooncake_spark.queries.registry import register_views

    register_views(spark, sf_dir, "nation")
    eng = _temp_engine(spark)
    eng.sql_script("""
        CREATE TABLE seq_vals (part text, v int);
        CREATE SEQUENCE s START WITH 10 INCREMENT BY 5;
        INSERT INTO seq_vals VALUES ('explicit', nextval('s')),
                                    ('explicit', nextval('s')),
                                    ('explicit', nextval('s'));
        SELECT setval('s', 100, false);
        INSERT INTO seq_vals VALUES ('after', nextval('s'));
        CREATE SEQUENCE wheel MAXVALUE 2 CYCLE;
        INSERT INTO seq_vals VALUES ('cycle', nextval('wheel')),
                                    ('cycle', nextval('wheel')),
                                    ('cycle', nextval('wheel')),
                                    ('cycle', nextval('wheel'));
        CREATE TABLE serial_t (id serial PRIMARY KEY, name text);
        CREATE TABLE ident_t (
            id int GENERATED ALWAYS AS IDENTITY
                (START WITH 1000 INCREMENT BY 10) PRIMARY KEY,
            name text
        );
        INSERT INTO ident_t (name) VALUES ('a'), ('b'), ('c');
    """)
    # bulk INSERT ... SELECT: the distributed sequence-assignment path
    eng.sql(
        "INSERT INTO serial_t (name) SELECT n_name FROM nation"
    )
    return eng.sql("""
        SELECT
          (SELECT CAST(SUM(v) AS BIGINT) FROM seq_vals
            WHERE part = 'explicit') AS explicit_sum,
          (SELECT CAST(SUM(v) AS BIGINT) FROM seq_vals
            WHERE part = 'after') AS after_setval,
          (SELECT CAST(SUM(id) AS BIGINT) FROM serial_t) AS serial_sum,
          (SELECT COUNT(*) FROM serial_t) AS serial_rows,
          (SELECT CAST(SUM(id) AS BIGINT) FROM ident_t) AS identity_sum,
          (SELECT CAST(SUM(v) AS BIGINT) FROM seq_vals
            WHERE part = 'cycle') AS cycle_sum
    """)


@query(
    "mv_q13_distribution",
    oracle="""
    WITH post AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 47 = 3 THEN '1-URGENT'
                  WHEN o_orderkey % 53 = 11 THEN '5-LOW'
                  ELSE o_orderpriority END AS o_orderpriority
      FROM orders
      WHERE NOT (o_orderkey % 31 = 5)
    ),
    c_orders AS (
      SELECT c.c_custkey, COUNT(p.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN post p
        ON c.c_custkey = p.o_custkey
       AND p.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def mv_q13_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q13 as a CHAINED incrementally-maintained materialized
    view (round 16, VERDICT r15 task #4 — q13 was the worst weak perf
    ratio; the engine-native answer is the same O(changes) maintenance
    that fixed q1, applied through BOTH aggregation levels):

    - level 1 (``q13_counts``): orders per customer under the priority
      filter, keyed on o_custkey, maintained from the orders mirror's
      change feed — and its OWN state table carries a change feed
      (``state_change_feed=True``);
    - level 2 (``q13_hist``): the customer-count histogram, keyed on
      c_count, maintained from level 1's state feed.  A base delta that
      moves one customer from 3 to 4 orders lands as a −1 on bucket 3
      and a +1 on bucket 4 — COUNT folds under retraction exactly like
      q1's sums.

    The zero bucket (customers with no qualifying orders) is total
    customers minus the level-1 group count — a parquet-footer COUNT
    plus a tiny aggregate over the histogram, O(buckets) not O(orders).
    DML after view creation (a delete slice plus two priority-flipping
    update slices, one INTO the filter and one OUT of it) exercises the
    signed-delta fold through both levels; the oracle recomputes q13
    from scratch over the post-DML state."""
    eng = _temp_engine(spark)
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    eng.create_table(
        "om13", source_df=orders, primary_key=["o_orderkey"],
        change_feed=True,
    )
    eng.create_materialized_view(
        "q13_counts", "om13", ["o_custkey"],
        {"c_count": ("count", "*")},
        where="o_orderpriority <> '5-LOW'",
        state_change_feed=True,
    )
    eng.create_materialized_view(
        "q13_hist", "q13_counts", ["c_count"],
        {"custdist": ("count", "*")},
    )
    eng.delete_where("om13", "o_orderkey % 31 = 5")
    eng.update_where(
        "om13", "o_orderkey % 53 = 11", {"o_orderpriority": "'5-LOW'"}
    )
    eng.update_where(
        "om13", "o_orderkey % 47 = 3", {"o_orderpriority": "'1-URGENT'"}
    )
    hist = eng.materialized_view("q13_hist").select(
        F.col("c_count").cast("long").alias("c_count"),
        F.col("custdist").cast("long").alias("custdist"),
    )
    # Zero bucket derived INSIDE the returned DAG (r19, VERDICT r18
    # item 6/7): customers with no qualifying order = total customers
    # minus the histogram's weight sum, emitted as a (0, N) row only
    # when N > 0 (at tiny scale every customer can have a qualifying
    # order, and an unconditional (0, 0) row diverges from the oracle —
    # the r18 sweep's finding, preserved by the filter).  Both inputs
    # are single-row aggregates, so the cross join is two 1-row
    # broadcasts — no driver-side count()/collect() at build time.
    zero = (
        cust.agg(F.count(F.lit(1)).alias("_t"))
        .crossJoin(
            hist.agg(F.coalesce(F.sum("custdist"), F.lit(0)).alias("_w"))
        )
        .select(
            F.lit(0).cast("long").alias("c_count"),
            (F.col("_t") - F.col("_w")).cast("long").alias("custdist"),
        )
        .filter(F.col("custdist") > 0)
    )
    return hist.unionByName(zero).orderBy(
        F.desc("custdist"), F.desc("c_count")
    )


@query(
    "mv_q18_large_orders",
    oracle="""
    WITH post AS (
      SELECT l_orderkey,
             CASE WHEN l_orderkey % 89 = 7 THEN l_quantity + 5
                  ELSE l_quantity END AS l_quantity
      FROM lineitem
      WHERE NOT (l_orderkey % 97 = 3)
    ),
    big AS (
      SELECT l_orderkey,
             SUM(CAST(l_quantity AS DECIMAL(30,2))) AS q
      FROM post
      GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(30,2))) > 120
    )
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS DATE) AS orderdate, o_totalprice,
           CAST(q AS DOUBLE) AS sum_qty
    FROM big
    JOIN orders ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def mv_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q18's HAVING aggregate as an incrementally-maintained MV
    (round 16 — the MV pattern generalized to a JOIN-feeding
    aggregate): ``sum(l_quantity)`` per order maintains from the
    lineitem mirror's change feed, so the q18 read never scans or
    shuffles the fact table — it filters the O(orders) view state
    (> threshold survives a handful of rows), then joins only those to
    orders and a broadcast customer.  At any scale the read is
    view-filter + two narrow joins; the 6M-row (sf1: 6M, sf10: 60M)
    lineitem scan+shuffle that dominates the recompute plan is gone.
    DML after creation (a quantity-bump slice that pushes orders over
    the threshold and a delete slice that pulls some back under)
    exercises the signed-delta fold; the oracle recomputes the literal
    IN + re-aggregate q18 over the post-DML state."""
    eng = _temp_engine(spark)
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    eng.create_table(
        "li18", source_df=li,
        primary_key=["l_orderkey", "l_linenumber"], change_feed=True,
    )
    eng.create_materialized_view(
        "q18_qty", "li18", ["l_orderkey"],
        {"sum_qty": ("sum", "CAST(l_quantity AS DECIMAL(30,2))")},
    )
    eng.update_where(
        "li18", "l_orderkey % 89 = 7", {"l_quantity": "l_quantity + 5"}
    )
    eng.delete_where("li18", "l_orderkey % 97 = 3")
    big = eng.materialized_view("q18_qty").filter(F.col("sum_qty") > 120)
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_totalprice",
            F.col("sum_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(25)
    )


@query(
    "mv_q10_returned_items",
    oracle="""
    WITH post AS (
      SELECT l_orderkey, l_extendedprice, l_discount,
             CASE WHEN l_orderkey % 91 = 13 THEN 'R'
                  ELSE l_returnflag END AS l_returnflag
      FROM lineitem
      WHERE NOT (l_orderkey % 101 = 17)
    )
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
           n_name
    FROM customer, orders, post, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R'
      AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def mv_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q10's fact-side aggregate as an incrementally-maintained
    MV (round 16 — third of the eager-agg trio converted; q9's 5-way
    join inside the aggregate stays out of single-base MV reach and
    keeps its recorded engine-floor verdict): returned-item revenue per
    order maintains from the lineitem mirror's change feed under the
    ``l_returnflag = 'R'`` view predicate, so the q10 read joins the
    O(orders) view state to the 3-month orders slice, customer, and
    nation — the fact table is never scanned or shuffled at read time.
    The filter-crossing DML (a slice of rows flipped INTO 'R', a delete
    slice) exercises the per-image predicate fold; the oracle
    recomputes the literal 4-way q10 over the post-DML state."""
    eng = _temp_engine(spark)
    li = t(spark, sf_dir, "lineitem")
    orders = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    cust = t(spark, sf_dir, "customer")
    nat = t(spark, sf_dir, "nation")
    eng.create_table(
        "li10", source_df=li,
        primary_key=["l_orderkey", "l_linenumber"], change_feed=True,
    )
    eng.create_materialized_view(
        "q10_rev", "li10", ["l_orderkey"],
        {
            "rev": (
                "sum",
                "CAST(l_extendedprice * (1 - l_discount) "
                "AS DECIMAL(30,6))",
            )
        },
        where="l_returnflag = 'R'",
    )
    eng.update_where(
        "li10", "l_orderkey % 91 = 13", {"l_returnflag": "'R'"}
    )
    eng.delete_where("li10", "l_orderkey % 101 = 17")
    mv = eng.materialized_view("q10_rev")
    return (
        mv.join(
            F.broadcast(orders.select("o_orderkey", "o_custkey")),
            mv.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(F.sum("rev").alias("rev_c"))
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nat), cust.c_nationkey == nat.n_nationkey)
        .select(
            "c_custkey", "c_name",
            F.col("rev_c").cast("double").alias("revenue"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@query(
    "lifecycle_sql_retype",
    oracle="""
    WITH base AS (
      SELECT o_orderkey,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE)
               AS price2,
             CAST(o_orderpriority AS VARCHAR) AS prio
      FROM orders WHERE o_orderkey % 5 = 0
    )
    SELECT COUNT(*) AS n,
           CAST(SUM(CAST(price2 AS DECIMAL(30,2))) AS DOUBLE) AS sum_p,
           CAST(SUM(CAST(SUBSTR(prio, 1, 1) AS INT)) AS BIGINT)
             AS sum_code
    FROM base
    """,
)
def lifecycle_sql_retype(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``ALTER TABLE ... ALTER COLUMN ... TYPE`` end-to-end (round 16
    — the migration-script staple; the reference's host runs it
    natively): a mirror loads an orders slice, one column widens
    double→decimal(18,2) (a lossy-looking but value-preserving cast at
    2-digit money precision), another converts text→int with a USING
    expression; DML after the retypes proves row addressing survives
    the rewrite.  The oracle reproduces both casts from the raw
    parquet.  A third statement asserts strictness: retyping the
    priority text to int WITHOUT the USING errors (non-numeric
    strings), and the failed statement leaves no commit behind."""
    from pg_mooncake_spark.queries.registry import register_views

    register_views(spark, sf_dir, "orders")
    eng = _temp_engine(spark)
    eng.sql_script("""
        CREATE TABLE rt (k bigint PRIMARY KEY, price double precision,
                         prio text);
        INSERT INTO rt
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders WHERE o_orderkey % 5 = 0;
    """)
    try:
        eng.sql("ALTER TABLE rt ALTER COLUMN prio TYPE int")
        raise AssertionError("strict cast should have refused")
    except ValueError:
        pass
    eng.sql("ALTER TABLE rt ALTER COLUMN price TYPE numeric(18,2)")
    eng.sql(
        "ALTER TABLE rt ALTER COLUMN prio TYPE int "
        "USING CAST(SUBSTR(prio, 1, 1) AS INT)"
    )
    return eng.sql("""
        SELECT COUNT(*) AS n,
               CAST(SUM(CAST(CAST(price AS DOUBLE) AS DECIMAL(30,2)))
                    AS DOUBLE) AS sum_p,
               CAST(SUM(prio) AS BIGINT) AS sum_code
        FROM rt
    """)


@query(
    "lifecycle_sql_fk_restore",
    oracle="""
    SELECT r.r_name,
           COUNT(*) AS n_nations,
           CAST(SUM(n.n_nationkey) AS BIGINT) AS sum_nkey,
           -- the four flag columns are literal 1s BY DESIGN: the real
           -- assertions run engine-side (catalog state + the round-18
           -- post-restore violating INSERTs that must error); the
           -- oracle cross-checks only the join arithmetic
           CAST(1 AS BIGINT) AS fk_ok,
           CAST(1 AS BIGINT) AS uq_ok,
           CAST(1 AS BIGINT) AS pk_ok,
           CAST(1 AS BIGINT) AS enforce_ok
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    ORDER BY r.r_name
    """,
)
def lifecycle_sql_fk_restore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-table pg_dump restore every relational schema needs
    (round 17, VERDICT r16 task #1): TWO tables created and COPY-loaded
    in one ``BEGIN .. COMMIT`` block, then the post-data section —
    PRIMARY KEYs, a UNIQUE index, and a FOREIGN KEY — replayed
    VERBATIM.  The FK and UNIQUE declarations now validate-then-record
    (one referential-integrity / uniqueness scan against the staged
    overlay, the r16 PK pattern) instead of refusing behind a GUC, so
    this dump restores out of the box.  The COPY payload is generated
    from the real region/nation tables so the scan sizes follow sf; the
    oracle recomputes the cross-table join from the parquet sources and
    the flag columns assert the constraints actually registered as
    validated."""
    from pg_mooncake_spark.queries.registry import register_views

    register_views(spark, sf_dir, "nation", "region")
    regions = sorted(
        (r.r_regionkey, r.r_name)
        for r in t(spark, sf_dir, "region")
        .select("r_regionkey", "r_name").collect()
    )
    nations = sorted(
        (r.n_nationkey, r.n_regionkey, r.n_name)
        for r in t(spark, sf_dir, "nation")
        .select("n_nationkey", "n_regionkey", "n_name").collect()
    )
    region_copy = "\n".join(f"{k}\t{n}" for k, n in regions)
    nation_copy = "\n".join(f"{k}\t{rk}\t{n}" for k, rk, n in nations)
    eng = _temp_engine(spark)
    eng.sql_script(f"""
        SET statement_timeout = 0;
        SET client_encoding = 'UTF8';
        SET standard_conforming_strings = on;
        BEGIN;
        CREATE TABLE public.fkr_region (
            r_regionkey integer NOT NULL,
            r_name text
        );
        CREATE TABLE public.fkr_nation (
            n_nationkey integer NOT NULL,
            n_regionkey integer,
            n_name text
        );
        COPY public.fkr_region (r_regionkey, r_name) FROM STDIN;
{region_copy}
\\.
        COPY public.fkr_nation (n_nationkey, n_regionkey, n_name) FROM STDIN;
{nation_copy}
\\.
        ALTER TABLE ONLY public.fkr_region
            ADD CONSTRAINT fkr_region_pkey PRIMARY KEY (r_regionkey);
        ALTER TABLE ONLY public.fkr_nation
            ADD CONSTRAINT fkr_nation_pkey PRIMARY KEY (n_nationkey);
        CREATE UNIQUE INDEX fkr_region_name_key
            ON public.fkr_region USING btree (r_name);
        ALTER TABLE ONLY public.fkr_nation
            ADD CONSTRAINT fkr_nation_region_fkey
            FOREIGN KEY (n_regionkey) REFERENCES public.fkr_region(r_regionkey);
        COMMIT;
    """)
    fks = (eng._constraints("fkr_nation") or {}).get("foreign_keys") or {}
    fk = fks.get("fkr_nation_region_fkey") or {}
    fk_ok = 1 if (
        fk.get("validated") is True
        and fk.get("ref_table") == "public.fkr_region"
        and fk.get("ref_cols") == ["r_regionkey"]
    ) else 0
    idx = (eng._constraints("fkr_region") or {}).get("indexes") or {}
    uq_ok = 1 if (
        (idx.get("fkr_region_name_key") or {}).get("unique") == "validated"
    ) else 0
    pk_ok = 1 if (
        eng._moontable("fkr_nation").primary_key() == ["n_nationkey"]
        and eng._moontable("fkr_region").primary_key() == ["r_regionkey"]
    ) else 0
    # Round 18 (VERDICT r17 task #3 'done' criterion): the restored
    # constraints are ENFORCED on the write path — a violating INSERT
    # after the restore must raise Postgres's error, a fresh one lands
    enforce_ok = 0
    try:
        # fresh pkey, DUPLICATE r_name — must trip fkr_region_name_key
        eng.sql(
            "INSERT INTO public.fkr_region VALUES "
            f"(990001, '{regions[0][1]}')"
        )
    except ValueError as e:
        if "violates unique constraint" in str(e):
            try:
                eng.sql(
                    "INSERT INTO public.fkr_nation VALUES "
                    "(990001, 990001, 'NOWHERE')"
                )
            except ValueError as e2:
                if "violates foreign key constraint" in str(e2):
                    enforce_ok = 1
    return eng.sql(f"""
        SELECT r.r_name,
               COUNT(*) AS n_nations,
               CAST(SUM(n.n_nationkey) AS BIGINT) AS sum_nkey,
               CAST({fk_ok} AS BIGINT) AS fk_ok,
               CAST({uq_ok} AS BIGINT) AS uq_ok,
               CAST({pk_ok} AS BIGINT) AS pk_ok,
               CAST({enforce_ok} AS BIGINT) AS enforce_ok
        FROM public.fkr_nation n
        JOIN public.fkr_region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name
        ORDER BY r.r_name
    """)


@query(
    "mv_q5_volume",
    oracle="""
    WITH post AS (
      SELECT l_orderkey, l_suppkey,
             CASE WHEN l_suppkey % 7 = 3
                  THEN least(l_discount + 0.01, 0.1)
                  ELSE l_discount END AS l_discount,
             l_extendedprice
      FROM lineitem
      WHERE NOT (l_orderkey % 103 = 11)
    )
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(30,6))) AS DOUBLE) AS revenue
    FROM customer, orders, post l, supplier, nation, region
    WHERE c_custkey = o_custkey AND l.l_orderkey = o_orderkey
      AND l.l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def mv_q5_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q5 as an incrementally-maintained JOIN view (round 17,
    VERDICT r16 task #5 — the join-MV frontier): the fact's change feed
    folds through a STATIC dimension chain (orders date-filtered →
    customer → supplier → nation → region pre-filtered to ASIA, the
    cross-dim c_nationkey = s_nationkey as the view WHERE) before the
    signed-delta aggregate, so each commit costs O(changes) broadcast
    against the dims and the q5 READ is O(nations) — the 6M-row
    lineitem scan + the orders shuffle that dominate the recompute plan
    are both gone from the steady state.  Dim churn is declared out of
    contract (refresh after a dim advanced raises loudly; recreate).
    DML after creation (a discount bump on one supplier slice and an
    order-slice delete) exercises the fold through the chain; the
    oracle recomputes the full six-table q5 over the post-DML state.

    Round 18: the date window moved from 1994 to 1996 — the fixtures'
    o_orderdate spans 1995-01-01..2001-08-01 (FIXTURES.md), so the r17
    1994 window matched ZERO rows at every scale and the driver-green
    row was vacuous (VERDICT r17 What's-wrong #1).  1996 matches the
    plain q5 key (tpch.py) and returns 5 nations at sf0.01."""
    eng = _temp_engine(spark)
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_suppkey",
        "l_extendedprice", "l_discount",
    )
    eng.create_table(
        "li5", source_df=li,
        primary_key=["l_orderkey", "l_linenumber"], change_feed=True,
    )
    eng.create_table(
        "ord5",
        source_df=t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderdate"
        ),
    )
    eng.create_table(
        "cust5",
        source_df=t(spark, sf_dir, "customer").select(
            "c_custkey", "c_nationkey"
        ),
    )
    eng.create_table(
        "supp5",
        source_df=t(spark, sf_dir, "supplier").select(
            "s_suppkey", "s_nationkey"
        ),
    )
    eng.create_table(
        "nat5",
        source_df=t(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name", "n_regionkey"
        ),
    )
    eng.create_table(
        "reg5",
        source_df=t(spark, sf_dir, "region").select(
            "r_regionkey", "r_name"
        ),
    )
    eng.create_materialized_view(
        "q5_volume", "li5", ["n_name"],
        {"revenue": (
            "sum",
            "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))",
        )},
        where="c_nationkey = s_nationkey",
        enrich=[
            {"table": "ord5", "on": [("l_orderkey", "o_orderkey")],
             "cols": ["o_custkey"],
             "filter": "o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' "
                       "AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'"},
            {"table": "cust5", "on": [("o_custkey", "c_custkey")],
             "cols": ["c_nationkey"]},
            {"table": "supp5", "on": [("l_suppkey", "s_suppkey")],
             "cols": ["s_nationkey"]},
            {"table": "nat5", "on": [("s_nationkey", "n_nationkey")],
             "cols": ["n_name", "n_regionkey"]},
            {"table": "reg5", "on": [("n_regionkey", "r_regionkey")],
             "cols": [], "filter": "r_name = 'ASIA'"},
        ],
    )
    eng.update_where(
        "li5", "l_suppkey % 7 = 3",
        {"l_discount": "least(l_discount + 0.01, 0.1)"},
    )
    eng.delete_where("li5", "l_orderkey % 103 = 11")
    return (
        eng.materialized_view("q5_volume")
        .select("n_name", F.col("revenue").cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


@query(
    "mv_q3_shipping",
    oracle="""
    WITH post AS (
      SELECT l_orderkey, l_shipdate,
             CASE WHEN l_linenumber = 1 AND l_orderkey % 11 = 4
                  THEN l_extendedprice * 1.05
                  ELSE l_extendedprice END AS l_extendedprice,
             l_discount
      FROM lineitem
      WHERE NOT (l_orderkey % 97 = 31)
    )
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                         AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
           CAST(o_orderdate AS DATE) AS orderdate,
           o_orderpriority
    FROM customer, orders, post l
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey AND l.l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, orderdate, l_orderkey
    LIMIT 10
    """,
)
def mv_q3_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H q3 as an incrementally-maintained JOIN view (round 17 —
    the second query converted through the `enrich` chain): per-order
    revenue over BUILDING-segment, pre-1995-03-15 orders maintains from
    the lineitem feed joined through orders → customer (both static,
    date/segment filters pushed into the dim steps; the l_shipdate
    predicate is the view WHERE, applied per change-feed image).  The
    q3 READ is a top-10 sort over the O(qualifying orders) view state —
    the lineitem scan AND the orders shuffle disappear from the steady
    state, the same escape hatch q1/q13/q18 already have.  DML after
    creation (an extendedprice bump on one line slice and an order
    delete slice) exercises the fold; the oracle recomputes the full
    three-table q3 over the post-DML state."""
    eng = _temp_engine(spark)
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate",
        "l_extendedprice", "l_discount",
    )
    eng.create_table(
        "li3", source_df=li,
        primary_key=["l_orderkey", "l_linenumber"], change_feed=True,
    )
    eng.create_table(
        "ord3",
        source_df=t(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
        ),
    )
    eng.create_table(
        "cust3",
        source_df=t(spark, sf_dir, "customer").select(
            "c_custkey", "c_mktsegment"
        ),
    )
    eng.create_materialized_view(
        "q3_ship", "li3",
        ["l_orderkey", "o_orderdate", "o_orderpriority"],
        {"revenue": (
            "sum",
            "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))",
        )},
        where="l_shipdate > TIMESTAMP '1995-03-15 00:00:00'",
        enrich=[
            {"table": "ord3", "on": [("l_orderkey", "o_orderkey")],
             "cols": ["o_custkey", "o_orderdate", "o_orderpriority"],
             "filter": "o_orderdate < TIMESTAMP '1995-03-15 00:00:00'"},
            {"table": "cust3", "on": [("o_custkey", "c_custkey")],
             "cols": [], "filter": "c_mktsegment = 'BUILDING'"},
        ],
    )
    eng.update_where(
        "li3", "l_linenumber = 1 AND l_orderkey % 11 = 4",
        {"l_extendedprice": "l_extendedprice * 1.05"},
    )
    eng.delete_where("li3", "l_orderkey % 97 = 31")
    return (
        eng.materialized_view("q3_ship")
        .select(
            "l_orderkey",
            F.col("revenue").cast("double").alias("revenue"),
            F.col("o_orderdate").cast("date").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), "orderdate", "l_orderkey")
        .limit(10)
    )


@query(
    "mv_supplier_churn",
    oracle="""
    WITH supp_post AS (
      -- the churned dimension: re-tiered slice + deleted slice
      SELECT s_suppkey,
             CASE WHEN s_suppkey % 10 = 0
                  THEN (s_nationkey + 1) % 25
                  ELSE s_nationkey END AS s_nationkey
      FROM supplier WHERE NOT (s_suppkey % 17 = 3)
    ),
    li_post AS (
      SELECT l_suppkey, l_extendedprice
      FROM lineitem WHERE NOT (l_orderkey % 101 = 7)
    )
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2)))
                AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM li_post l, supp_post s, nation n
    WHERE l.l_suppkey = s.s_suppkey AND s.s_nationkey = n.n_nationkey
    GROUP BY n_name
    ORDER BY n_name
    """,
)
def mv_supplier_churn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-MV DIMENSION CHURN (round 18, VERDICT r17 missing #4): a
    revenue-per-nation view enriched through supplier → nation, then
    the supplier dimension CHANGES — one slice re-tiered to a different
    nation (UPDATE rewrites the join path), one slice deleted (its fact
    rows drop out of the INNER join) — and a fact delete lands in the
    same refresh.  The refresh absorbs the churn with a bounded
    recompute of only the affected nations
    (views._fold_dim_churn: dim change feed → changed join keys → one
    pruned fact pass for affected groups under both pins → semi-joined
    recompute), THEN folds the fact delta against the new pins — the
    ordering that avoids double-counting.  The oracle recomputes the
    post-churn join from scratch; any stale pin, unabsorbed slice, or
    double-folded delta breaks the hash."""
    eng = _temp_engine(spark)
    eng.create_table(
        "li_ch",
        source_df=t(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_linenumber", "l_suppkey", "l_extendedprice"
        ),
        primary_key=["l_orderkey", "l_linenumber"], change_feed=True,
    )
    eng.create_table(
        "supp_ch",
        source_df=t(spark, sf_dir, "supplier").select(
            "s_suppkey", "s_nationkey"
        ),
        primary_key=["s_suppkey"], change_feed=True,
    )
    eng.create_table(
        "nat_ch",
        source_df=t(spark, sf_dir, "nation").select(
            "n_nationkey", "n_name"
        ),
    )
    eng.create_materialized_view(
        "rev_nation", "li_ch", ["n_name"],
        {
            "revenue": ("sum", "CAST(l_extendedprice AS DECIMAL(30,2))"),
            "n_lines": ("count", "*"),
        },
        enrich=[
            {"table": "supp_ch", "on": [("l_suppkey", "s_suppkey")],
             "cols": ["s_nationkey"]},
            {"table": "nat_ch", "on": [("s_nationkey", "n_nationkey")],
             "cols": ["n_name"]},
        ],
    )
    # dimension churn: re-tier one slice, delete another
    eng.update_where(
        "supp_ch", "s_suppkey % 10 = 0",
        {"s_nationkey": "(s_nationkey + 1) % 25"},
    )
    eng.delete_where("supp_ch", "s_suppkey % 17 = 3")
    # a fact delta in the same refresh (churn folds first, at the
    # pre-delta fact version)
    eng.delete_where("li_ch", "l_orderkey % 101 = 7")
    return (
        eng.materialized_view("rev_nation")
        .select(
            "n_name",
            F.col("revenue").cast("double").alias("revenue"),
            F.col("n_lines").alias("n_lines"),
        )
        .orderBy("n_name")
    )
