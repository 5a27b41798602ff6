"""External Iceberg table read (SURVEY.md §2.B contract, reference
CHANGELOG.md:25).

Iceberg's metadata chain is JSON (table metadata) → Avro (manifest list,
manifests).  Read order:

1. the iceberg-spark runtime when on the classpath
   (``spark.read.format("iceberg")``);
2. the **manifest-chain read**: metadata JSON → manifest list → manifests
   via the pure-Python Avro layer (sources/avro.py) — exact per-snapshot
   file lists (orphans from rewrites ignored by construction),
   ``snapshot_id`` time travel, the declared schema imposed on the scan
   (schema evolution surfaces NULLs for pre-evolution files),
   content=1 positional deletes applied at scan time (broadcast
   anti-join on hidden ``_metadata`` file/row-position columns),
   content=2 equality deletes applied with sequence-number scoping
   (rows equal on the equality_ids columns drop from data files with
   data_seq < delete_seq; null-safe, one broadcast anti-join per delete
   file) — refused only when sequence numbers or equality_ids are
   absent;
3. for manifest-less static exports only, a guarded raw ``data/`` scan:
   current snapshot only, no delete files, and the parquet file count
   must reconcile with the snapshot summary's ``total-data-files`` —
   every case where the raw scan could silently disagree with the
   (absent) manifests refuses instead (VERDICT/ADVICE r1).
"""

from __future__ import annotations

import glob as _glob
import json
import os
import re
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


_META_VERSION = re.compile(r"^(?:v)?(\d+)(?:-[0-9a-fA-F-]+)?\.metadata\.json$")


def _metadata_version(fname: str) -> int:
    """Numeric version of a metadata file name (``v3.metadata.json`` or
    ``00003-<uuid>.metadata.json``); -1 when unparseable."""
    m = _META_VERSION.match(fname)
    return int(m.group(1)) if m else -1


def _latest_metadata(path: str) -> dict:
    meta_dir = os.path.join(path, "metadata")
    if not os.path.isdir(meta_dir):
        raise IcebergSupportError(f"not an Iceberg table (no metadata/): {path}")
    candidates = [f for f in os.listdir(meta_dir) if f.endswith(".metadata.json")]
    if not candidates:
        raise IcebergSupportError(f"no *.metadata.json under {meta_dir}")
    # numeric sort: v10 > v9 (lexical sort would pick v9; ADVICE r1)
    candidates.sort(key=lambda f: (_metadata_version(f), f))
    with open(os.path.join(meta_dir, candidates[-1])) as fh:
        return json.load(fh)


_PRIMS = {
    "boolean": "boolean",
    "int": "int",
    "long": "bigint",
    "float": "float",
    "double": "double",
    "date": "date",
    "time": "bigint",
    "timestamp": "timestamp_ntz",
    "timestamptz": "timestamp",
    "string": "string",
    "uuid": "string",
    "binary": "binary",
}


def _iceberg_type(t) -> "object":
    """Iceberg schema JSON type → Spark DataType."""
    from pyspark.sql import types as T

    if isinstance(t, str):
        if t in _PRIMS:
            return T._parse_datatype_string(_PRIMS[t])
        if t.startswith("decimal("):
            p, s = t[len("decimal(") : -1].split(",")
            return T.DecimalType(int(p), int(s))
        if t.startswith("fixed["):
            return T.BinaryType()
        raise IcebergSupportError(f"unsupported Iceberg type {t!r}")
    kind = t.get("type")
    if kind == "struct":
        return T.StructType(
            [
                T.StructField(
                    f["name"], _iceberg_type(f["type"]), not f.get("required", False)
                )
                for f in t["fields"]
            ]
        )
    if kind == "list":
        return T.ArrayType(
            _iceberg_type(t["element"]), not t.get("element-required", False)
        )
    if kind == "map":
        return T.MapType(
            _iceberg_type(t["key"]),
            _iceberg_type(t["value"]),
            not t.get("value-required", False),
        )
    raise IcebergSupportError(f"unsupported Iceberg type {t!r}")


def _schema_from_metadata(meta: dict):
    """Current table schema from the metadata JSON (v2 'schemas' +
    current-schema-id, v1 'schema'); None when absent.

    Imposing it on the scan makes schema evolution correct: files written
    before a column was added surface NULLs for it, and declared types
    win over per-file parquet inference."""
    schema_json = None
    if meta.get("schemas"):
        sid = meta.get("current-schema-id")
        for s in meta["schemas"]:
            if s.get("schema-id") == sid:
                schema_json = s
                break
        else:
            schema_json = meta["schemas"][-1]
    elif meta.get("schema"):
        schema_json = meta["schema"]
    if schema_json is None:
        return None
    return _iceberg_type({"type": "struct", "fields": schema_json["fields"]})


def _field_names_by_id(meta: dict) -> dict[int, str]:
    """Top-level field id -> name from the current schema (equality
    delete files reference columns by Iceberg field id)."""
    schema_json = None
    if meta.get("schemas"):
        sid = meta.get("current-schema-id")
        for s in meta["schemas"]:
            if s.get("schema-id") == sid:
                schema_json = s
                break
        else:
            schema_json = meta["schemas"][-1]
    elif meta.get("schema"):
        schema_json = meta["schema"]
    if not schema_json:
        return {}
    return {int(f["id"]): f["name"] for f in schema_json["fields"] if "id" in f}


def _resolve_path(p: str, table_root: str) -> str:
    """Resolve a manifest/data-file URI against a possibly-relocated local
    table: strip the file:// scheme; if the absolute path is gone, re-root
    the /metadata/ or /data/ tail under the table directory."""
    if p.startswith("file://"):
        p = p[len("file://") :]
    if os.path.exists(p):
        return p
    for marker in ("/metadata/", "/data/"):
        idx = p.rfind(marker)
        if idx >= 0:
            candidate = os.path.join(table_root, p[idx + 1 :])
            if os.path.exists(candidate):
                return candidate
    raise IcebergSupportError(f"referenced file not found: {p}")


def _files_from_manifests(
    path: str, snap: dict
) -> tuple[list[dict], list[str], list[dict]]:
    """Live file paths for a snapshot, by replaying its manifest list →
    manifests (the real Iceberg read path, via the pure-Python Avro
    reader).

    Returns ``(data_files, positional_delete_files, equality_deletes)``.
    data_files carry the manifest-recorded path (the key positional-
    delete rows use), the resolved local path, and the data sequence
    number (entry-level, inherited from the manifest entry when absent).
    content=1 positional deletes apply by exact (path, pos); content=2
    equality deletes apply to data files with data_seq < delete_seq and
    need equality_ids + sequence numbers — refused if either is
    missing."""
    from pg_mooncake_spark.sources.avro import AvroError, read_avro

    try:
        mlist_path = _resolve_path(snap["manifest-list"], path)
        _, manifests = read_avro(mlist_path)
        files: list[dict] = []
        pos_deletes: list[str] = []
        eq_deletes: list[dict] = []
        for m in manifests:
            manifest_path = _resolve_path(m["manifest_path"], path)
            _, entries = read_avro(manifest_path)
            is_delete_manifest = int(m.get("content") or 0) == 1
            for e in entries:
                if int(e.get("status") or 0) == 2:  # DELETED entry
                    continue
                df_ = e.get("data_file") or {}
                content = int(df_.get("content") or 0)
                if is_delete_manifest and content == 0:
                    raise IcebergSupportError(
                        "delete manifest carries a content=0 entry; "
                        "refusing malformed metadata"
                    )
                fmt = str(df_.get("file_format") or "PARQUET").upper()
                if fmt != "PARQUET":
                    raise IcebergSupportError(
                        f"non-parquet Iceberg file ({fmt}) not supported"
                    )
                seq = e.get("sequence_number")
                if seq is None:
                    seq = m.get("sequence_number")  # v2 inheritance
                if content == 0:
                    files.append(
                        {
                            "recorded": df_["file_path"],
                            "resolved": _resolve_path(df_["file_path"], path),
                            "seq": seq,
                        }
                    )
                elif content == 1:  # positional deletes
                    pos_deletes.append(_resolve_path(df_["file_path"], path))
                else:  # content == 2: equality deletes
                    eq_ids = df_.get("equality_ids") or e.get("equality_ids")
                    if not eq_ids or seq is None:
                        raise IcebergSupportError(
                            "equality-delete file lacks equality_ids or a "
                            "sequence number; cannot apply it safely"
                        )
                    eq_deletes.append(
                        {
                            "resolved": _resolve_path(df_["file_path"], path),
                            "seq": int(seq),
                            "equality_ids": [int(i) for i in eq_ids],
                        }
                    )
        return files, pos_deletes, eq_deletes
    except AvroError as exc:
        raise IcebergSupportError(f"failed to read Iceberg manifests: {exc}") from exc


def read_iceberg(
    spark: SparkSession, path: str, snapshot_id: Optional[int] = None
) -> DataFrame:
    """Read an external Iceberg table.

    Preferred order: the iceberg-spark runtime if present; else the
    manifest-chain read (pure-Python Avro, sources/avro.py — exact file
    list, snapshot time travel, rewrite-safe); else, for manifest-less
    static exports, a guarded raw directory scan that refuses whenever it
    could disagree with the (absent) manifests.
    """
    if have_iceberg_runtime(spark):  # pragma: no cover - runtime absent here
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", snapshot_id)
        return reader.load(path)

    meta = _latest_metadata(path)
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    current = meta.get("current-snapshot-id")
    sid = current if snapshot_id is None else snapshot_id
    if snapshot_id is not None and snaps and snapshot_id not in snaps:
        raise IcebergSupportError(
            f"snapshot {snapshot_id} not in table history {sorted(snaps)}"
        )
    snap = snaps.get(sid)
    declared = _schema_from_metadata(meta)
    if snap is not None and snap.get("manifest-list"):
        files, pos_deletes, eq_deletes = _files_from_manifests(path, snap)
        if not files:
            raise IcebergSupportError(f"snapshot {sid} has no data files")
        reader = spark.read.schema(declared) if declared is not None else spark.read
        df = reader.parquet(*[f["resolved"] for f in files])
        if not pos_deletes and not eq_deletes:
            return df
        # v2 merge-on-read.  Positional delete parquet rows are
        # (file_path, pos) keyed by the manifest-recorded data-file path:
        # map recorded paths to the URIs Spark's scan reports, then drop
        # deleted positions with a broadcast anti-join on the hidden
        # _metadata columns.  Equality deletes (Flink/CDC writers) drop
        # rows equal on the delete file's equality_ids columns from data
        # files with data_seq < delete_seq — per delete file, one
        # null-safe broadcast anti-join; the scan side stays one
        # distributed read throughout.  Delete files are small row-level
        # deltas by design (compaction folds them into rewrites), so the
        # broadcasts are bounded.
        from pyspark.sql import functions as F

        data = df.select(
            "*",
            F.col("_metadata.file_path").alias("__fp"),
            F.col("_metadata.row_index").alias("__pos"),
        )
        if pos_deletes:
            mapping = spark.createDataFrame(
                [
                    (f["recorded"], "file:" + os.path.abspath(f["resolved"]))
                    for f in files
                ],
                "file_path string, __fp string",
            )
            deletes = (
                spark.read.parquet(*pos_deletes)
                .select("file_path", "pos")
                .join(F.broadcast(mapping), "file_path")
                .select("__fp", F.col("pos").alias("__pos"))
            )
            data = data.join(
                F.broadcast(deletes), ["__fp", "__pos"], "left_anti"
            )
        if eq_deletes:
            names_by_id = _field_names_by_id(meta)
            seq_rows = [
                ("file:" + os.path.abspath(f["resolved"]), int(f["seq"] or 0))
                for f in files
            ]
            seq_map = spark.createDataFrame(seq_rows, "__fp string, __seq long")
            data = data.join(F.broadcast(seq_map), "__fp", "left")
            for d in sorted(eq_deletes, key=lambda x: x["seq"]):
                try:
                    cols = [names_by_id[i] for i in d["equality_ids"]]
                except KeyError as exc:
                    raise IcebergSupportError(
                        f"equality_ids {d['equality_ids']} not in current "
                        f"schema (field id {exc} unknown)"
                    ) from exc
                dd = spark.read.parquet(d["resolved"]).select(*cols).distinct()
                cond = F.col("__seq") < F.lit(d["seq"])
                for c in cols:
                    cond = cond & F.col(f"__l.{c}").eqNullSafe(F.col(f"__r.{c}"))
                data = (
                    data.alias("__l")
                    .join(F.broadcast(dd.alias("__r")), cond, "left_anti")
                )
        return data.drop("__fp", "__pos", "__seq")

    # manifest-less static export: guarded raw scan (current snapshot only)
    if snapshot_id is not None and snapshot_id != current:
        raise IcebergSupportError(
            f"snapshot {snapshot_id} is not the current snapshot ({current}); "
            "time travel needs manifests and this table has none"
        )
    summary = (snap or {}).get("summary", {})
    if int(summary.get("total-delete-files", 0) or 0) > 0:
        raise IcebergSupportError(
            "Iceberg snapshot carries delete files; the jar-less "
            "fallback cannot apply them — install iceberg-spark"
        )
    data_dir = os.path.join(path, "data")
    if not os.path.isdir(data_dir):
        raise IcebergSupportError(f"no data/ directory under {path}")
    files = sorted(
        _glob.glob(os.path.join(data_dir, "**", "*.parquet"), recursive=True)
    )
    expected = summary.get("total-data-files")
    if expected is not None and len(files) != int(expected):
        raise IcebergSupportError(
            f"data/ holds {len(files)} parquet files but the current "
            f"snapshot claims {expected} — the table was rewritten/"
            "compacted and a raw scan would read orphaned files; "
            "install iceberg-spark to read via manifests"
        )
    if not files:
        raise IcebergSupportError(f"no data files under {data_dir}")
    reader = spark.read.schema(declared) if declared is not None else spark.read
    return reader.parquet(*files)
