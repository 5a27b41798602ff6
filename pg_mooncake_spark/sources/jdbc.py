"""JDBC snapshot source/sink for mirror creation.

The reference's ``create_table(dst, src, src_uri)`` mirrors a table that
lives on another RUNNING server, identified by a connection URI
(reference src/functions.rs:24-43; loopback URI construction
src/lib.rs:165-196).  This module is that remote-source form, Spark-side:
a ``jdbc:`` source_uri resolves to a snapshot scan through Spark's
executor-side JDBC datasource, which backfills the mirror; the CDC stream
then applies on top (backfill-then-tail, SURVEY §2.B streaming rows).

URI form: ``jdbc:<driver-url>#<dbtable>[?opt=val&...]`` — JDBC URLs never
carry fragments, so splitting on the LAST ``#`` is unambiguous.  The
fragment names the table (or a parenthesized pushdown subquery) and may
append Spark JDBC reader options as a query string, most importantly the
parallel-scan quartet::

    jdbc:derby:/data/db#supplier?partitionColumn=s_suppkey\
        &lowerBound=1&upperBound=100000&numPartitions=32

Scale shape: without partitioning options a JDBC scan is ONE executor
task pulling the whole table through one connection — fine for dimension
tables, wrong for facts.  With them, Spark issues ``numPartitions``
range-sliced queries concurrently (one connection each), the standard
parallel-JDBC ingest pattern; predicates and column pruning are pushed
into the remote SQL by the datasource.  The sandbox ships only the
embedded Derby driver (a real SQL engine, in-JVM); any driver on the
classpath resolves through the same code path.
"""

from __future__ import annotations

from typing import Optional
from urllib.parse import parse_qsl

from pyspark.sql import DataFrame, SparkSession


def split_jdbc_uri(uri: str) -> tuple[str, str, dict[str, str]]:
    """``jdbc:...#table?opts`` -> (jdbc_url, dbtable, reader_options)."""
    if not uri.startswith("jdbc:"):
        raise ValueError(f"not a JDBC URI: {uri!r}")
    url, sep, frag = uri.rpartition("#")
    if not sep or not frag:
        raise ValueError(
            "JDBC source URI must name the table after '#': "
            "jdbc:<url>#<dbtable>[?option=value&...]"
        )
    table, _, qs = frag.partition("?")
    opts = dict(parse_qsl(qs)) if qs else {}
    return url, table, opts


def read_jdbc(
    spark: SparkSession,
    uri: str,
    options: Optional[dict[str, str]] = None,
) -> DataFrame:
    """Snapshot-read one remote table as a DataFrame (see module doc for
    the URI form and the parallel-scan options)."""
    url, table, opts = split_jdbc_uri(uri)
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", table)
    )
    for k, v in {**opts, **(options or {})}.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame, url: str, dbtable: str, mode: str = "error"
) -> None:
    """Executor-side batched-insert sink (each partition opens one
    connection and streams its rows) — used by tests/fixtures to stand up
    a 'remote' source, and the export half of a JDBC round trip."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", dbtable)
        .mode(mode)
        .save()
    )


def jdbc_execute(spark: SparkSession, url: str, *statements: str) -> None:
    """Run DDL/DML statements over one driver-side connection (py4j into
    java.sql.DriverManager).  A fixture/maintenance utility — data-path
    reads and writes go through the executor-side datasource above."""
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)  # noqa: SLF001
    try:
        st = conn.createStatement()
        for s in statements:
            st.execute(s)
        st.close()
    finally:
        conn.close()
