"""Extension-operator queries: as-of join, skew-mitigation (salted ops),
and Delta-format round-trips — each oracle-checked where ANSI/DuckDB SQL
can express the semantics.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_mooncake_spark.functions import dsum
from pg_mooncake_spark.operators.asof import asof_join
from pg_mooncake_spark.operators.skew import salted_agg, salted_join
from pg_mooncake_spark.queries.registry import query, t


@query(
    "events_asof_join",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'),
    purchases AS (
      SELECT user_id, ts, value FROM events WHERE event_type = 'purchase')
    SELECT c.user_id, c.event_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           ROUND(p.value, 6) AS last_purchase_value
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts >= p.ts
    ORDER BY c.user_id, c.event_id
    """,
)
def events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via the union+window trick (one shuffle on user_id, no
    inequality-join row explosion) — checked against DuckDB's native
    ASOF JOIN.  Each click is annotated with the value of the user's most
    recent purchase at or before the click.

    Single-exchange shape (r19, the topk/sessionization lever): the
    trailing orderBy(user_id, event_id) paid a second (range) exchange
    whose sampler re-executed the union + window.  With
    ``range_partition=True`` the union is range-partitioned on user_id
    (satisfies the window's clustering; users ascend across partitions),
    so sortWithinPartitions over the click rows restores the contract
    order with ONE exchange.  Ordered-identical crosscheck over all
    1.99M sf10 rows; interleaved A/B: sf0.1 0.386 → 0.280 s (1.37×),
    sf10 1.615 → 1.269 s (1.27×).  Pinned in tests/test_opt_r19.py."""
    e = t(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    joined = asof_join(
        clicks, purchases, on="user_id", ts_col="ts", range_partition=True
    )
    return joined.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.round("value_r", 6).alias("last_purchase_value"),
    ).sortWithinPartitions("user_id", "event_id")


@query(
    "skew_salted_agg",
    oracle="""
    SELECT event_type, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value,
           ROUND(MAX(value), 6) AS max_value
    FROM events
    GROUP BY event_type ORDER BY event_type
    """,
)
def skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation over the (skewed: 5 distinct values)
    event_type key — results must be IDENTICAL to the plain groupBy the
    oracle runs; only the shuffle distribution differs."""
    e = t(spark, sf_dir, "events")
    out = salted_agg(
        e,
        ["event_type"],
        {
            "n": (F.count, F.sum, "event_type"),
            "sum_value": (
                lambda c: F.sum(F.col(c).cast("decimal(30,2)")),
                F.sum,
                "value",
            ),
            "max_value": (F.max, F.max, "value"),
        },
        salts=8,
    )
    return out.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.col("sum_value").cast("double").alias("sum_value"),
        F.round("max_value", 6).alias("max_value"),
    ).orderBy("event_type")


@query(
    "skew_salted_join",
    oracle="""
    SELECT o.o_orderkey, c.c_name, o.o_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 400000
    ORDER BY o.o_orderkey
    """,
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted join (replicate small side x8, scatter big side) — result
    identical to the plain equi-join; pair generation spreads any hot
    customer across 8 tasks."""
    orders = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    cust = t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name"
    )
    return (
        salted_join(orders, cust, on="o_custkey", salts=8)
        .select("o_orderkey", "c_name", "o_totalprice")
        .orderBy("o_orderkey")
    )


@query(
    "orc_roundtrip_lineitem",
    oracle="""
    SELECT l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
    FROM lineitem
    WHERE l_quantity >= 30
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def orc_roundtrip_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink + source (Spark's second native columnar format — the
    reference is parquet-only, SURVEY §2.B external-format rows): write
    filtered lineitem as ORC, read it back through the vectorized ORC
    reader, aggregate.  The oracle aggregates the parquet source — any
    type or row drift through the ORC round-trip is a hash mismatch."""
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 30)
    path = tempfile.mkdtemp(prefix="orc_rt_") + "/t"
    li.write.orc(path)
    back = spark.read.orc(path)
    return (
        back.groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("l_extendedprice", 2).alias("sum_price"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "iceberg_roundtrip_lineitem",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_discount AS DECIMAL(30,2))) AS DOUBLE) AS sum_disc
    FROM lineitem
    WHERE l_partkey % 5 = 0
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def iceberg_roundtrip_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg v2 sink + source (the reference mirrors tables into an
    Iceberg warehouse — reference src/functions.rs:89, README.md:17):
    write filtered lineitem as an Iceberg table (parquet + manifest Avro
    chain + metadata JSON), read it back through the manifest-chain
    replay, aggregate.  Oracle aggregates the parquet source — any drift
    through the metadata chain is a hash mismatch."""
    from pg_mooncake_spark.sources.iceberg import read_iceberg, write_iceberg

    li = t(spark, sf_dir, "lineitem").filter(F.col("l_partkey") % 5 == 0)
    path = tempfile.mkdtemp(prefix="ice_rt_") + "/t"
    write_iceberg(li, path)
    back = read_iceberg(spark, path)
    return (
        back.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("l_discount", 2).alias("sum_disc"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "jdbc_mirror_snapshot",
    oracle="""
    SELECT s_nationkey,
           COUNT(*) AS n,
           CAST(SUM(CAST(s_acctbal AS DECIMAL(30,2))) AS DOUBLE) AS sum_bal
    FROM supplier
    GROUP BY s_nationkey ORDER BY s_nationkey
    """,
)
def jdbc_mirror_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live-server mirror source (the reference's remote form of
    create_table — the source table lives on another running SQL engine,
    identified by URI; reference src/functions.rs:24-43): load supplier
    into an embedded Derby database through the executor-side JDBC sink,
    then snapshot it back through a RANGE-PARTITIONED JDBC scan (the
    parallel-ingest pattern a 1000-executor backfill would use — 8
    concurrent key-range slices here; bounds shape the stride only, rows
    outside them still land in the edge slices) and aggregate.  The
    oracle aggregates the parquet source directly — any row lost, duped,
    or type-mangled by the SQL round trip is a hash mismatch."""
    from pg_mooncake_spark.sources.jdbc import read_jdbc, write_jdbc

    sup = t(spark, sf_dir, "supplier")
    db = tempfile.mkdtemp(prefix="jdbc_src_") + "/db"
    write_jdbc(sup, f"jdbc:derby:{db};create=true", "supplier")
    back = read_jdbc(
        spark,
        f"jdbc:derby:{db}#supplier?partitionColumn=s_suppkey"
        "&lowerBound=1&upperBound=100000&numPartitions=8",
    )
    return (
        back.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("s_acctbal", 2).alias("sum_bal"),
        )
        .orderBy("s_nationkey")
    )


@query(
    "iceberg_delete_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
    FROM orders
    WHERE o_orderkey < 5000 AND NOT (o_orderkey % 7 = 0)
          AND NOT (o_custkey % 11 = 0)
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def iceberg_delete_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg merge-on-read DELETE lifecycle (the row-level-delete half
    of the reference's Iceberg mirror maintenance — moonlink keeps the
    warehouse current with deletes applied, reference README.md:13-17):
    write orders as an Iceberg v2 table, DELETE twice via positional
    delete files (no data rewrite; the second predicate exercises
    delete-file accumulation across snapshots), compact (REPLACE
    snapshot folds the deletes into clean files), expire the old
    snapshots (physically reclaims the superseded data and delete
    files), read back through the manifest chain, aggregate.  The result
    is invariant across every step; the oracle applies the same
    predicates to the source, so a mis-keyed (file, pos) row, a dropped
    prior delete manifest, a lost row in compaction, or an over-eager
    expiry all surface as a hash mismatch."""
    from pg_mooncake_spark.sources.iceberg import (
        compact_iceberg,
        delete_where_iceberg,
        expire_snapshots,
        read_iceberg,
        write_iceberg,
    )

    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    path = tempfile.mkdtemp(prefix="ice_del_") + "/t"
    write_iceberg(o, path)
    delete_where_iceberg(spark, path, "o_orderkey % 7 = 0")
    delete_where_iceberg(spark, path, "o_custkey % 11 = 0")
    compact_iceberg(spark, path)
    expire_snapshots(path, retain_last=1)
    back = read_iceberg(spark, path)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice", 2).alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "iceberg_partitioned_roundtrip",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
    FROM orders
    WHERE o_orderstatus = 'F' AND o_orderkey < 20000
          AND NOT (o_orderkey % 13 = 0)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def iceberg_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned Iceberg lifecycle (the reference's mirror warehouse is
    a partitioned Iceberg table for any large source — moonlink keeps
    per-mirror warehouses, reference README.md:13-17): create with an
    identity partition spec, append (spec inherited from metadata),
    merge-on-read DELETE, then a PARTITION-PRUNED read — the file list
    is cut down by the manifest-recorded partition tuples before the
    scan, which is what preserves pruning for downstream readers of a
    100 TB export.  The oracle applies the same predicates to the
    source; a file mis-assigned to a partition, a pruned-away live file,
    or a delete lost across the partitioned snapshots all surface as a
    hash mismatch."""
    from pg_mooncake_spark.sources.iceberg import (
        delete_where_iceberg,
        read_iceberg,
        write_iceberg,
    )

    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 20000)
    path = tempfile.mkdtemp(prefix="ice_part_") + "/t"
    write_iceberg(
        o.filter(F.col("o_orderkey") < 10000),
        path,
        partition_by=["o_orderstatus"],
    )
    write_iceberg(o.filter(F.col("o_orderkey") >= 10000), path, mode="append")
    delete_where_iceberg(spark, path, "o_orderkey % 13 = 0")
    back = read_iceberg(spark, path, partition_filter={"o_orderstatus": "F"})
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice", 2).alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "iceberg_bucket_partition_roundtrip",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
    FROM orders
    WHERE substring(o_orderpriority, 1, 2) = '2-' AND o_orderkey < 20000
          AND NOT (o_orderkey % 7 = 0)
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def iceberg_bucket_partition_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hashed + truncated Iceberg partition spec (spec 'Partition
    Transforms': ``bucket[N]`` murmur3 assignment, ``truncate[W]``
    prefixes) — how a 100 TB export spreads a high-cardinality key
    across buckets while keeping prefix point-reads prunable.  Writes
    orders bucketed 16 ways on o_custkey and truncated on
    o_orderpriority, appends under the inherited spec, merge-on-read
    deletes, then a read pruned to the ``'2-'`` priority-prefix
    partition.  The oracle applies the same prefix predicate with
    substring(): a row hashed into the wrong bucket file, a
    mis-truncated partition value, or pruning that drops a live file
    all surface as a hash mismatch.  (Bucket-number pruning itself is
    verified bit-exactly against the spec's murmur3 vectors in
    tests/test_sources.py — DuckDB has no murmur3 to oracle it.)"""
    from pg_mooncake_spark.sources.iceberg import (
        delete_where_iceberg,
        read_iceberg,
        write_iceberg,
    )

    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 20000)
    path = tempfile.mkdtemp(prefix="ice_bucket_") + "/t"
    write_iceberg(
        o.filter(F.col("o_orderkey") < 10000),
        path,
        partition_by=["bucket(16, o_custkey)", "truncate(2, o_orderpriority)"],
    )
    write_iceberg(o.filter(F.col("o_orderkey") >= 10000), path, mode="append")
    delete_where_iceberg(spark, path, "o_orderkey % 7 = 0")
    back = read_iceberg(
        spark, path, partition_filter={"o_orderpriority_trunc": "2-"}
    )
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice", 2).alias("sum_price"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "iceberg_sorted_range_scan",
    oracle="""
    SELECT l_linestatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE)
             AS sum_price
    FROM lineitem
    WHERE l_orderkey BETWEEN 5000 AND 9999 AND l_orderkey < 20000
    GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def iceberg_sorted_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted Iceberg compaction feeding a stats-pruned range scan:
    compact_iceberg(sort_by=[l_orderkey]) rewrites files with DISJOINT
    key ranges recorded as manifest lower/upper bounds, and
    read_iceberg(range_filter=...) skips files by those bounds before
    the scan — the maintenance + read pattern that keeps a 100 TB
    export's point/range queries proportional to the selected range
    instead of the table.  The exact BETWEEN re-applies row-wise, so
    the oracle's WHERE clause is the semantic contract; over-pruning
    (lost rows) or under-sorting (no skipping) both surface — the
    former as a hash mismatch, the latter in
    tests/test_sources.py::test_iceberg_range_filter_stats_file_skipping."""
    from pg_mooncake_spark.sources.iceberg import (
        compact_iceberg,
        read_iceberg,
        write_iceberg,
    )

    li = t(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 20000)
    path = tempfile.mkdtemp(prefix="ice_sorted_") + "/t"
    write_iceberg(li, path)
    compact_iceberg(spark, path, target_files=8, sort_by=["l_orderkey"])
    back = read_iceberg(
        spark, path, range_filter={"l_orderkey": (5000, 9999)}
    )
    return (
        back.groupBy("l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("l_extendedprice", 2).alias("sum_price"),
        )
        .orderBy("l_linestatus")
    )


@query(
    "delta_dv_update_roundtrip",
    oracle="""
    WITH updated AS (
      SELECT o_orderkey, o_orderstatus,
             CASE WHEN o_orderkey % 7 = 0
                  THEN o_totalprice * 1.1 ELSE o_totalprice END AS price
      FROM orders WHERE o_orderkey < 5000)
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(price AS DECIMAL(30,4))) AS DOUBLE) AS sum_price
    FROM updated
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def delta_dv_update_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read UPDATE lifecycle: write orders as Delta, UPDATE
    every 7th key's price via deletion vectors + appended copies (no
    rewrite of untouched rows), read back, aggregate.  The oracle
    applies the same CASE to the source — a row double-counted (DV not
    applied to the original), lost (copy not appended), or mis-updated
    all show up as count or hash mismatches."""
    from pg_mooncake_spark.sources.delta import (
        read_delta,
        update_where_dv,
        write_delta,
    )

    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    path = tempfile.mkdtemp(prefix="delta_upd_") + "/t"
    write_delta(o, path, mode="error")
    update_where_dv(
        spark, path, "o_orderkey % 7 = 0", {"o_totalprice": "o_totalprice * 1.1"}
    )
    back = read_delta(spark, path)
    return (
        back.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice", 4).alias("sum_price"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "delta_roundtrip_lineitem",
    oracle="""
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    WHERE l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def delta_roundtrip_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-protocol sink + source (SURVEY §2.B external-format rows):
    write filtered lineitem as a Delta table (transaction log + parquet),
    read it back through the log replay, aggregate.  The oracle computes
    the same aggregate straight from the source — any row lost or duped
    by the Delta log round-trip shows up as a hash mismatch."""
    from pg_mooncake_spark.sources.delta import read_delta, write_delta

    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")
    )
    path = tempfile.mkdtemp(prefix="delta_rt_") + "/t"
    write_delta(li, path, mode="error")
    back = read_delta(spark, path)
    return (
        back.groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity", 2).alias("sum_qty"))
        .orderBy("l_returnflag")
    )


@query(
    "delta_dv_delete_roundtrip",
    oracle="""
    SELECT o_orderstatus,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
    FROM orders
    WHERE o_orderkey < 5000 AND NOT (o_orderkey % 7 = 0)
    GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def delta_dv_delete_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full merge-on-read lifecycle: write orders as Delta, delete every
    7th key via deletion vectors (no file rewrite), OPTIMIZE-compact
    (folds the DVs into clean files), vacuum the tombstoned originals,
    read back, aggregate.  The result is invariant across every step —
    the oracle applies the same predicate to the source, so a mis-parsed
    bitmap, mis-mapped position, lost row in compaction, or
    over-eager vacuum all show up as a hash mismatch."""
    from pg_mooncake_spark.sources.delta import (
        compact_delta,
        delete_where_dv,
        read_delta,
        vacuum_delta,
        write_delta,
    )

    o = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 5000)
    path = tempfile.mkdtemp(prefix="delta_dv_") + "/t"
    write_delta(o, path, mode="error")
    delete_where_dv(spark, path, "o_orderkey % 7 = 0")
    compact_delta(spark, path)
    vacuum_delta(path, retention_ms=0)
    back = read_delta(spark, path)
    return (
        back.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice", 2).alias("sum_price"))
        .orderBy("o_orderstatus")
    )


@query(
    "delta_rename_mapping_roundtrip",
    oracle="""
    WITH src AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderkey < 3000),
    post AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 10 = 0 THEN 'X'
                  ELSE o_orderstatus END AS status,
             o_totalprice
      FROM src)
    SELECT status, COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE)
             AS sum_price
    FROM post GROUP BY status ORDER BY status
    """,
)
def delta_rename_mapping_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta column-mapping lifecycle: write orders as Delta, rename a
    column (metadata-only — enables columnMapping.mode=name, no file
    rewritten), key-batch upsert through the renamed schema (probe and
    staging resolve physical names), OPTIMIZE-compact, read back,
    aggregate.  The oracle applies the same keyed update to the source,
    so a mis-mapped physical name (old files read NULL, new files
    double columns) or a lost row in the mapped compaction fails the
    hash compare."""
    from pg_mooncake_spark.sources.delta import (
        compact_delta,
        read_delta,
        rename_column_delta,
        upsert_keys_delta,
        write_delta,
    )

    src = t(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 3000).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = tempfile.mkdtemp(prefix="delta_cm_") + "/t"
    write_delta(src, path, mode="error")
    rename_column_delta(path, "o_orderstatus", "status")
    upd = (
        src.filter(F.col("o_orderkey") % 10 == 0)
        .select(
            "o_orderkey",
            F.lit("X").alias("status"),
            "o_totalprice",
        )
    )
    upsert_keys_delta(
        spark, path, upd.select("o_orderkey"), upd
    )
    compact_delta(spark, path)
    back = read_delta(spark, path)
    return (
        back.groupBy("status")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice", 2).alias("sum_price"))
        .orderBy("status")
    )


@query(
    "media_resize_dedup",
    oracle="""
    WITH media AS (
      SELECT doc_id AS media_id, text FROM documents WHERE doc_id < 80),
    resized AS (
      SELECT media_id, sha256(text || '224x224') AS content FROM media),
    g AS (SELECT content, MIN(media_id) AS canonical_id, COUNT(*) AS n
          FROM resized GROUP BY 1)
    SELECT r.media_id, g.canonical_id, g.n AS group_size
    FROM resized r JOIN g ON r.content = g.content
    ORDER BY r.media_id
    """,
)
def media_resize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal chain: binary media → mapInPandas resize (deterministic
    fake: sha256(content || WxH)) → exact dedup over resized bytes.
    Fully oracle-checked — DuckDB reproduces the fake-resize bytes, so a
    single flipped byte anywhere in the Arrow round-trip fails the hash
    compare."""
    from pg_mooncake_spark.operators.multimodal import (
        media_from_documents,
        resize_images,
    )

    media = media_from_documents(t(spark, sf_dir, "documents"), n=80)
    resized = resize_images(media, target=(224, 224))
    g = resized.groupBy("content").agg(
        F.min("media_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("group_size"),
    )
    return (
        resized.join(g, "content")
        .select("media_id", "canonical_id", "group_size")
        .orderBy("media_id")
    )


@query(
    "sketch_hll_distinct",
    oracle="""
    SELECT TRUE AS users_within_tol, COUNT(*) AS total_events FROM events
    """,
)
def sketch_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Apache DataSketches HLL, built
    into Spark): per-group sketches union into a global estimate without
    re-scanning — the 100 TB pattern for incremental distinct counts
    (store a sketch per partition/day, merge at query time).

    The sketch binary is engine-specific, so the oracle-checkable output
    is the assertion: merged estimate within ±5% of the exact distinct
    count, plus the exact total (same trick as
    agg_approx_count_distinct)."""
    e = t(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n"),
    )
    merged = per_type.agg(
        F.hll_union_agg("sk").alias("merged"),
        F.sum("n").alias("total_events"),
    ).select(
        F.hll_sketch_estimate("merged").alias("approx_users"),
        "total_events",
    )
    exact = e.agg(F.countDistinct("user_id").alias("exact_users"))
    return merged.crossJoin(F.broadcast(exact)).select(
        F.col("approx_users")
        .between(F.col("exact_users") * 0.95, F.col("exact_users") * 1.05)
        .alias("users_within_tol"),
        "total_events",
    )


@query(
    "delta_schema_evolution_roundtrip",
    oracle="""
    WITH base AS (
      SELECT o_orderkey AS k, o_orderstatus AS v
      FROM orders WHERE o_orderkey < 2000),
    ext AS (
      SELECT o_orderkey AS k, o_orderstatus AS v, o_totalprice AS score
      FROM orders WHERE o_orderkey >= 2000 AND o_orderkey < 4000),
    unioned AS (
      SELECT k, v, CAST(NULL AS DOUBLE) AS score FROM base
      UNION ALL SELECT k, v, score FROM ext)
    SELECT v,
           COUNT(*) AS n,
           COUNT(score) AS n_score,
           CAST(SUM(CAST(COALESCE(score, 0) AS DECIMAL(30,2))) AS DOUBLE)
             AS sum_score
    FROM unioned GROUP BY v ORDER BY v
    """,
)
def delta_schema_evolution_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mergeSchema lifecycle: create a Delta table from a 2-column slice
    of orders, append a 3-column slice with merge_schema=True (the
    schema widens in the same commit; pre-evolution files surface typed
    NULLs at scan), read back, aggregate per status.  The oracle unions
    the two slices with an explicit NULL column — a reader that drops
    pre-evolution rows, mis-fills the new column, or loses the evolved
    schema hash-mismatches."""
    from pg_mooncake_spark.sources.delta import read_delta, write_delta

    o = t(spark, sf_dir, "orders")
    base = o.filter(F.col("o_orderkey") < 2000).select(
        F.col("o_orderkey").alias("k"), F.col("o_orderstatus").alias("v")
    )
    ext = o.filter(
        (F.col("o_orderkey") >= 2000) & (F.col("o_orderkey") < 4000)
    ).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("v"),
        F.col("o_totalprice").alias("score"),
    )
    path = tempfile.mkdtemp(prefix="delta_evo_") + "/t"
    write_delta(base, path, mode="error")
    write_delta(ext, path, mode="append", merge_schema=True)
    back = read_delta(spark, path)
    return (
        back.groupBy("v")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("score").alias("n_score"),
            dsum(F.coalesce(F.col("score"), F.lit(0.0)), 2).alias("sum_score"),
        )
        .orderBy("v")
    )


@query(
    "avro_roundtrip_documents",
    oracle="""
    SELECT source,
           COUNT(*) AS n,
           CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS total_chars
    FROM documents
    WHERE doc_id % 3 = 0
    GROUP BY source ORDER BY source
    """,
)
def avro_roundtrip_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jar-less Avro sink + source (sources/avro_source.py: one container
    file per partition on write, one task per file on read — the
    spark-avro datasource's shape without its jar): write a documents
    slice as Avro, read it back, aggregate.  The oracle aggregates the
    parquet source — any record lost or value mangled by the Avro
    encode/decode round trip is a hash mismatch."""
    from pg_mooncake_spark.sources.avro_source import (
        read_avro_files,
        write_avro_files,
    )

    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    path = tempfile.mkdtemp(prefix="avro_rt_") + "/t"
    write_avro_files(d.repartition(4), path)
    back = read_avro_files(spark, path)
    return (
        back.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("n_chars").cast("bigint")).alias("total_chars"),
        )
        .orderBy("source")
    )


@query(
    "delta_cdf_roundtrip",
    oracle="""
    WITH upd AS (SELECT o_totalprice FROM orders
                 WHERE o_orderkey % 10 = 0 AND o_orderkey % 7 <> 3),
    del AS (SELECT o_totalprice FROM orders WHERE o_orderkey % 7 = 3),
    feed AS (
      SELECT 'delete' AS _change_type, o_totalprice AS p FROM del
      UNION ALL SELECT 'update_preimage', o_totalprice FROM upd
      UNION ALL SELECT 'update_postimage', o_totalprice + 1 FROM upd
    )
    SELECT _change_type, COUNT(*) AS n,
           CAST(SUM(CAST(p AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
    FROM feed GROUP BY _change_type ORDER BY _change_type
    """,
)
def delta_cdf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta Change Data Feed end-to-end on the pure-python protocol
    implementation: create with delta.enableChangeDataFeed='true'
    (protocol minWriterVersion 4), DV-DELETE then DV-UPDATE (each commit
    also persists its _change_data/ cdc files), then read_delta_cdf and
    aggregate per _change_type.  The oracle reconstructs the exact feed
    from the source — wrong pre-images (post-delete state read instead
    of pre-commit), missed DV masking, or double-fed rows all
    hash-mismatch.  Delete runs FIRST so the update's images must be
    computed against the DV-masked live state."""
    from pg_mooncake_spark.sources.delta import (
        delete_where_dv,
        read_delta_cdf,
        update_where_dv,
        write_delta,
    )

    o = t(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="delta_cdf_") + "/t"
    write_delta(
        o, path, configuration={"delta.enableChangeDataFeed": "true"}
    )
    delete_where_dv(spark, path, "o_orderkey % 7 = 3")
    update_where_dv(
        spark, path, "o_orderkey % 10 = 0", {"o_totalprice": "o_totalprice + 1"}
    )
    return (
        read_delta_cdf(spark, path, start_version=1, end_version=2)
        .groupBy("_change_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("o_totalprice", 2).alias("sum_price"),
        )
        .orderBy("_change_type")
    )


@query(
    "delta_cdf_mapped_rename",
    oracle="""
    WITH del AS (SELECT o_totalprice FROM orders WHERE o_orderkey % 7 = 3),
    upd AS (SELECT o_totalprice FROM orders
            WHERE o_orderkey % 10 = 0 AND o_orderkey % 7 <> 3),
    feed AS (
      SELECT 'delete' AS _change_type, o_totalprice AS p FROM del
      UNION ALL SELECT 'update_preimage', o_totalprice FROM upd
      UNION ALL SELECT 'update_postimage', o_totalprice + 1 FROM upd
    )
    SELECT _change_type, COUNT(*) AS n,
           CAST(SUM(CAST(p AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
    FROM feed GROUP BY _change_type ORDER BY _change_type
    """,
)
def delta_cdf_mapped_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change Data Feed survives a mid-history column RENAME (VERDICT r8
    task 4): DV-DELETE before the rename, metadata-only rename
    o_totalprice→price (enables columnMapping.mode=name), DV-UPDATE on
    the renamed column after it, then one read_delta_cdf over the WHOLE
    history.  Pre-rename cdc parquet carries names equal to the physical
    names mapping later assigns; post-rename cdc carries physical names
    outright — the reader resolves both eras through the mapping and
    returns the latest logical schema, so the delete-era pre-images
    surface under the NEW name ``price``.  Wrong-era resolution (nulled
    renamed columns) or a lost feed segment hash-mismatches the oracle's
    reconstruction."""
    from pg_mooncake_spark.sources.delta import (
        delete_where_dv,
        read_delta_cdf,
        rename_column_delta,
        update_where_dv,
        write_delta,
    )

    o = t(spark, sf_dir, "orders")
    path = tempfile.mkdtemp(prefix="delta_cdf_map_") + "/t"
    write_delta(
        o, path, configuration={"delta.enableChangeDataFeed": "true"}
    )
    delete_where_dv(spark, path, "o_orderkey % 7 = 3")
    rename_column_delta(path, "o_totalprice", "price")
    update_where_dv(
        spark, path, "o_orderkey % 10 = 0", {"price": "price + 1"}
    )
    return (
        read_delta_cdf(spark, path, start_version=1)
        .groupBy("_change_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("price", 2).alias("sum_price"),
        )
        .orderBy("_change_type")
    )


_RECURSIVE_WALK_SQL = """
WITH RECURSIVE counts AS (
  SELECT CAST(o_orderkey % 5 AS INT) AS r, COUNT(*) AS c
  FROM orders GROUP BY CAST(o_orderkey % 5 AS INT)
),
walk(r, acc) AS (
  SELECT CAST(-1 AS INT), CAST(0 AS BIGINT)
  UNION ALL
  SELECT w.r + 1, w.acc + c.c
  FROM walk w JOIN counts c ON c.r = w.r + 1
  WHERE w.r < 4
)
SELECT r, acc FROM walk WHERE r >= 0 ORDER BY r
"""


@query("sql_recursive_cte", oracle=_RECURSIVE_WALK_SQL)
def sql_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE parity (SURVEY §2.B CTE row's recursive half,
    available since Spark 4.0): a recursive walk whose every step JOINS
    the recursive relation against a real aggregate of the orders table
    — each iteration accumulates the next residue class's order count.
    The oracle runs the IDENTICAL statement in DuckDB, whose recursive
    CTE implementation is independent, so both the fixpoint evaluation
    and the join-in-recursive-step semantics are cross-checked."""
    from pg_mooncake_spark.queries.registry import register_views

    register_views(spark, sf_dir, "orders")
    return spark.sql(_RECURSIVE_WALK_SQL)


_GENERATE_SERIES_SPINE_SQL = """
WITH months AS (
  SELECT m AS month_start
  FROM generate_series(DATE '1995-01-01', DATE '1995-06-01',
                       INTERVAL 1 MONTH) AS g(m)
),
rev AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
         COUNT(*) AS n_orders
  FROM orders
  WHERE o_orderdate >= DATE '1995-01-01'
    AND o_orderdate < DATE '1995-07-01'
  GROUP BY 1
)
SELECT m.month_start, COALESCE(r.n_orders, 0) AS n_orders
FROM months m LEFT JOIN rev r USING (month_start)
UNION ALL
SELECT DATE '1990-01-01' AS month_start, CAST(n AS BIGINT) AS n_orders
FROM generate_series(5, 1) AS g(n)
UNION ALL
SELECT DATE '1991-01-01' AS month_start, CAST(n AS BIGINT) AS n_orders
FROM generate_series(5, 1, -2) AS g(n)
UNION ALL
SELECT DATE '1992-01-01' AS month_start, CAST(n AS BIGINT) AS n_orders
FROM generate_series(5, 1, 1) AS g(n)
UNION ALL
SELECT DATE '1993-01-01' AS month_start, CAST(n AS BIGINT) AS n_orders
FROM generate_series(1, 5, -1) AS g(n)
UNION ALL
SELECT CAST(m AS DATE) AS month_start, CAST(99 AS BIGINT) AS n_orders
FROM generate_series(TIMESTAMP '1995-03-01', TIMESTAMP '1995-01-01',
                     INTERVAL 1 MONTH) AS g(m)
ORDER BY month_start, n_orders
"""

# DuckDB ERRORS on reversed-bounds generate_series ("cannot generate
# infinite series") where Postgres returns zero rows — for the two-arg
# form AND (round 17) the three-arg forms whose range is reversed
# relative to the explicit step, numeric or timestamp/interval.  The
# oracle spells each such branch's empty set directly (WHERE 1 = 0);
# the Spark side above still exercises the guarded rewrites — before
# the round-16/17 fixes these legs contributed descending rows (or a
# loud Spark sequence error) and failed the compare.
_GENERATE_SERIES_SPINE_ORACLE_SQL = _GENERATE_SERIES_SPINE_SQL.replace(
    "FROM generate_series(5, 1) AS g(n)",
    "FROM generate_series(1, 1) AS g(n) WHERE 1 = 0",
).replace(
    "FROM generate_series(5, 1, 1) AS g(n)",
    "FROM generate_series(1, 1) AS g(n) WHERE 1 = 0",
).replace(
    "FROM generate_series(1, 5, -1) AS g(n)",
    "FROM generate_series(1, 1) AS g(n) WHERE 1 = 0",
).replace(
    "FROM generate_series(TIMESTAMP '1995-03-01', TIMESTAMP '1995-01-01',\n"
    "                     INTERVAL 1 MONTH) AS g(m)",
    "FROM generate_series(TIMESTAMP '1995-01-01', TIMESTAMP '1995-01-01',\n"
    "                     INTERVAL 1 MONTH) AS g(m) WHERE 1 = 0",
)


@query("sql_generate_series_spine", oracle=_GENERATE_SERIES_SPINE_ORACLE_SQL)
def sql_generate_series_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``generate_series`` as a FROM-clause table function (round 15):
    the Postgres set-returning function rewrites textually onto Spark's
    ``explode(sequence(...))`` (sql_router._run_select), here building
    a six-month date spine LEFT-JOINed to per-month order counts — the
    gap-free-report idiom generate_series exists for.  The oracle runs
    the IDENTICAL statement in DuckDB, whose native generate_series
    cross-checks the rewrite (bounds inclusive, month stepping, and the
    zero-filled months all hash)."""
    import tempfile

    from pg_mooncake_spark.engine import MooncakeEngine
    from pg_mooncake_spark.queries.registry import register_views

    register_views(spark, sf_dir, "orders")
    eng = MooncakeEngine(spark, tempfile.mkdtemp(prefix="mooncake_wh_"))
    return eng.sql(_GENERATE_SERIES_SPINE_SQL)


_DISTINCT_ON_SQL = """
SELECT DISTINCT ON (o_custkey)
       o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS last_date,
       o_totalprice AS last_price
FROM orders
WHERE o_orderstatus <> 'P'
ORDER BY o_custkey, o_orderdate DESC, o_orderkey DESC
"""


@query("sql_distinct_on", oracle=_DISTINCT_ON_SQL)
def sql_distinct_on(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``SELECT DISTINCT ON (k) ... ORDER BY k, tail`` (round 17,
    VERDICT r16 missing #2) — Postgres's latest-row-per-key idiom,
    rewritten by sql_router._rewrite_distinct_on onto ``row_number()
    OVER (PARTITION BY k ORDER BY tail) = 1`` with Postgres null
    placement spelled out.  Here: each customer's most recent
    non-pending order (orderkey DESC tiebreak makes the winner unique,
    so the hash compare is exact).  The oracle runs the IDENTICAL
    statement in DuckDB, whose native DISTINCT ON implements the same
    Postgres semantics independently."""
    import tempfile

    from pg_mooncake_spark.engine import MooncakeEngine
    from pg_mooncake_spark.queries.registry import register_views

    register_views(spark, sf_dir, "orders")
    eng = MooncakeEngine(spark, tempfile.mkdtemp(prefix="mooncake_wh_"))
    return eng.sql(_DISTINCT_ON_SQL)


_DISTINCT_ON_UNORDERED_SQL = """
SELECT DISTINCT ON (o_orderpriority)
       o_orderpriority,
       upper(o_orderpriority) AS upper_priority,
       substring(o_orderpriority, 1, 1) AS prio_digit
FROM orders
"""


@query("sql_distinct_on_unordered", oracle=_DISTINCT_ON_UNORDERED_SQL)
def sql_distinct_on_unordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT ON without an ORDER BY — Postgres allows it and picks
    an arbitrary row per group, so the projected columns here are all
    functionally determined by the ON expression (any winner yields the
    same values; the engine internally orders by the ON expressions for
    determinism).  Both engines therefore hash identically even though
    neither guarantees WHICH physical row won."""
    import tempfile

    from pg_mooncake_spark.engine import MooncakeEngine
    from pg_mooncake_spark.queries.registry import register_views

    register_views(spark, sf_dir, "orders")
    eng = MooncakeEngine(spark, tempfile.mkdtemp(prefix="mooncake_wh_"))
    return eng.sql(_DISTINCT_ON_UNORDERED_SQL)
