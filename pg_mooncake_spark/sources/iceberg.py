"""External Iceberg table read (SURVEY.md §2.B contract, reference
CHANGELOG.md:25).

Iceberg's metadata chain is JSON (table metadata) → Avro (manifest list,
manifests).  This image ships neither the iceberg-spark runtime nor an
Avro reader, so full support is gated: with the runtime on the classpath
we delegate to ``spark.read.format("iceberg")``; without it we can still
serve the common "static table exported once" case by scanning the
table's data directory directly, validating that the metadata JSON shows
no delete files (position/equality deletes would make a raw scan wrong —
that case raises instead of returning bad rows).
"""

from __future__ import annotations

import json
import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


class IcebergSupportError(RuntimeError):
    pass


def have_iceberg_runtime(spark: SparkSession) -> bool:
    try:
        spark._jvm.Class.forName("org.apache.iceberg.spark.source.IcebergSource")
        return True
    except Exception:
        return False


def _latest_metadata(path: str) -> dict:
    meta_dir = os.path.join(path, "metadata")
    if not os.path.isdir(meta_dir):
        raise IcebergSupportError(f"not an Iceberg table (no metadata/): {path}")
    candidates = sorted(f for f in os.listdir(meta_dir) if f.endswith(".metadata.json"))
    if not candidates:
        raise IcebergSupportError(f"no *.metadata.json under {meta_dir}")
    with open(os.path.join(meta_dir, candidates[-1])) as fh:
        return json.load(fh)


def read_iceberg(
    spark: SparkSession, path: str, snapshot_id: Optional[int] = None
) -> DataFrame:
    """Read an external Iceberg table.

    Full fidelity requires the iceberg-spark runtime; the fallback path
    handles append-only tables by scanning data files, refusing (loudly)
    when the current snapshot carries delete files.
    """
    if have_iceberg_runtime(spark):  # pragma: no cover - runtime absent here
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", snapshot_id)
        return reader.load(path)

    meta = _latest_metadata(path)
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    sid = snapshot_id if snapshot_id is not None else meta.get("current-snapshot-id")
    snap = snaps.get(sid)
    if snap is not None:
        summary = snap.get("summary", {})
        if int(summary.get("total-delete-files", 0) or 0) > 0:
            raise IcebergSupportError(
                "Iceberg snapshot carries delete files; the jar-less "
                "fallback cannot apply them — install iceberg-spark"
            )
    data_dir = os.path.join(path, "data")
    if not os.path.isdir(data_dir):
        raise IcebergSupportError(f"no data/ directory under {path}")
    return spark.read.parquet(os.path.join(data_dir, "**", "*.parquet"))
