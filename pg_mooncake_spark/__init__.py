"""pg_mooncake_spark — a PySpark-native analytics engine with the
capabilities of Mooncake-Labs/pg_mooncake (reference: /root/reference).

The reference is a Postgres extension that mirrors row-store tables into a
columnstore (Iceberg/Parquet) via CDC and executes analytical SQL over the
mirror with DuckDB (reference README.md:13-17).  This package re-expresses
that contract Spark-first:

- the *query plane* (joins/aggregates/windows/set-ops/scalar functions) is
  Spark SQL / DataFrame — Catalyst + Tungsten execute it (SURVEY.md §2.B);
- the *table lifecycle + CDC-sync + snapshot-consistency* plane — the part
  the reference actually implements in-tree (src/functions.rs, src/bgworker.rs)
  — is implemented here on a minimal versioned-Parquet commit-log table
  format ("moontable", storage.py) because Delta/Iceberg jars are not in
  the image.  The public API mirrors the reference's `mooncake.*` procedures.
"""

from pg_mooncake_spark.engine import MooncakeEngine
from pg_mooncake_spark.session import get_spark

__all__ = ["MooncakeEngine", "get_spark"]
__version__ = "0.1.0"
