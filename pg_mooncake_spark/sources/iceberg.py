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


class IcebergSchemaMismatchError(IcebergSupportError):
    """Row columns do not match the table's declared schema.  A distinct
    type (not a message substring) so callers that auto-evolve the table
    and retry — engine._sync_exports — can't be broken by a rewording of
    the message (ADVICE r7)."""


class IcebergEqualityDeletesPendingError(IcebergSupportError):
    """The operation needs unmerged equality deletes folded first
    (compact_iceberg); a distinct type so callers can compact-and-retry
    without matching message text."""


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
        meta = json.load(fh)
    # Pin the version this replay came from (private key, stripped before
    # any serialization).  Committers derive next-version from THIS, not
    # from the on-disk max at commit time: a concurrent commit landing
    # while a long Spark job runs bumps the disk max, and a stale-meta
    # committer that re-reads it would link at a fresh version and
    # silently erase the concurrent snapshot from history (ADVICE r6).
    # With the pinned version, os.link on v<pinned+1> collides with the
    # intervening commit and raises the intended 'concurrent commit'.
    meta["__pinned-version"] = _metadata_version(candidates[-1])
    meta["__pinned-file"] = os.path.join(meta_dir, candidates[-1])
    return meta


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
                            "partition": dict(df_.get("partition") or {}),
                            "lower": {
                                int(r["key"]): r["value"]
                                for r in df_.get("lower_bounds") or []
                            },
                            "upper": {
                                int(r["key"]): r["value"]
                                for r in df_.get("upper_bounds") or []
                            },
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


def snapshot_as_of(path: str, ts) -> int:
    """Latest snapshot-id committed at or before ``ts`` (epoch-ms / ISO
    string / datetime) — Iceberg's as-of-timestamp resolution over the
    metadata's snapshot timestamps.  Refuses timestamps before the
    oldest retained snapshot."""
    from pg_mooncake_spark.sources.delta import _to_epoch_ms

    ts_ms = _to_epoch_ms(ts)
    meta = _latest_metadata(path)
    best, best_ts, earliest = None, None, None
    for s in meta.get("snapshots") or []:
        t_ms = int(s.get("timestamp-ms") or 0)
        earliest = t_ms if earliest is None else min(earliest, t_ms)
        if t_ms <= ts_ms and (best_ts is None or t_ms >= best_ts):
            best, best_ts = int(s["snapshot-id"]), t_ms
    if best is None:
        raise IcebergSupportError(
            f"timestamp {ts_ms} is before the table's earliest retained "
            f"snapshot ({earliest})"
        )
    return best


def read_iceberg(
    spark: SparkSession,
    path: str,
    snapshot_id: Optional[int] = None,
    partition_filter: Optional[dict] = None,
    range_filter: Optional[dict] = None,
    as_of_timestamp=None,
) -> DataFrame:
    """Read an external Iceberg table.

    Preferred order: the iceberg-spark runtime if present; else the
    manifest-chain read (pure-Python Avro, sources/avro.py — exact file
    list, snapshot time travel, rewrite-safe); else, for manifest-less
    static exports, a guarded raw directory scan that refuses whenever it
    could disagree with the (absent) manifests.

    ``partition_filter`` = {partition column: value} prunes the file list
    by the manifest-recorded partition tuples BEFORE the scan — the
    Iceberg partition-pruning contract: a filtered read of a 100 TB
    table plans only matching files.  Values accept the column's type
    (dates also as 'YYYY-MM-DD').  Refused for non-partition columns.

    ``range_filter`` = {column: (lo, hi)} (inclusive; None = unbounded)
    prunes the file list by the manifest-recorded per-file lower/upper
    bounds — stats-based file skipping, the payoff of a sorted
    compaction's disjoint ranges — then applies the exact BETWEEN
    predicate row-wise (which also pushes down to the parquet scan).
    Files lacking bounds for a column are kept: missing stats never
    skip.

    ``as_of_timestamp`` (epoch-ms / ISO string / datetime) time-travels
    to the latest snapshot committed at or before the timestamp (the
    runtime's as-of-timestamp option).  Mutually exclusive with
    ``snapshot_id``."""
    if as_of_timestamp is not None:
        if snapshot_id is not None:
            raise IcebergSupportError(
                "snapshot_id and as_of_timestamp are mutually exclusive"
            )
        snapshot_id = snapshot_as_of(path, as_of_timestamp)

    def _apply_range_predicate(df: DataFrame, filt: dict) -> DataFrame:
        from pyspark.sql import functions as F

        for c, (lo, hi) in filt.items():
            if lo is not None:
                df = df.filter(F.col(c) >= F.lit(lo))
            if hi is not None:
                df = df.filter(F.col(c) <= F.lit(hi))
        return df

    if have_iceberg_runtime(spark):  # pragma: no cover - runtime absent here
        reader = spark.read.format("iceberg")
        if snapshot_id is not None:
            reader = reader.option("snapshot-id", snapshot_id)
        df = reader.load(path)
        if partition_filter:
            from pyspark.sql import functions as F

            for c, v in partition_filter.items():
                df = df.filter(
                    F.col(c).isNull() if v is None else (F.col(c) == F.lit(v))
                )
        if range_filter:
            df = _apply_range_predicate(df, range_filter)
        return df

    # (manifest-chain path)

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
        if partition_filter:
            norm = _normalize_partition_filter(
                partition_filter, _spec_partition_cols(meta)
            )
            # conservative pruning: a file whose partition tuple LACKS the
            # filtered field (written under an older spec, before partition
            # evolution added it) may still hold matching rows — keep it.
            # Only a present-and-different NON-NULL value excludes a file:
            # hive-style staging paths encode both NULL and empty string as
            # __HIVE_DEFAULT_PARTITION__, so a stored None is ambiguous for
            # string-typed fields (the exact row predicate below restores
            # precise semantics on the kept files).
            files = [
                f
                for f in files
                if all(
                    c not in f["partition"]
                    or f["partition"][c] is None
                    or f["partition"][c] == v
                    for c, v in norm.items()
                )
            ]
        if range_filter:
            # stats-based file skipping: drop files whose manifest
            # lower/upper bounds provably miss the range; files without
            # bounds are kept, the exact predicate below re-filters rows
            rf = _normalize_range_filter(range_filter, meta)
            files = [
                f
                for f in files
                if all(_file_in_range(f, spec) for spec in rf.values())
            ]
        if not files:
            # A snapshot with zero live data files is legitimate — e.g.
            # compact_iceberg after every row was deleted commits a
            # REPLACE with no entries.  Readers get the declared schema
            # and zero rows, not an error (ADVICE r6: optimize_table on a
            # fully-emptied attached export must leave it readable).
            if declared is None:
                raise IcebergSupportError(
                    f"snapshot {sid} has no data files and no schema"
                )
            return spark.createDataFrame([], declared)
        eras = _rename_eras(meta) if declared is not None else None
        era_cols = False
        if eras:
            # post-rename read: files group by the schema active at
            # their sequence number; each era scans with its physical
            # names aliased back to current (rename_column_iceberg)
            df = _era_union_scan(
                spark, declared, files, eras, _field_names_by_id(meta)
            )
            era_cols = True
        else:
            reader = (
                spark.read.schema(declared) if declared is not None else spark.read
            )
            df = reader.parquet(*[f["resolved"] for f in files])
        if partition_filter:
            # exact semantics on top of the (conservative) file pruning:
            # the transform's row predicate re-derives the partition value
            # from the source column and ALSO pushes down to the parquet
            # scan for identity transforms — kept old-spec files cannot
            # leak other partitions' rows
            import datetime as _dt

            from pyspark.sql import functions as F

            part_by_name = {p["name"]: p for p in _spec_partition_cols(meta)}
            for c, v in norm.items():
                expr = _staging_expr(part_by_name[c])
                if v is None:
                    df = df.filter(expr.isNull())
                elif part_by_name[c]["ice_type"] == "date":
                    df = df.filter(
                        expr
                        == F.lit(_dt.date(1970, 1, 1) + _dt.timedelta(days=v))
                    )
                else:
                    df = df.filter(expr == F.lit(v))
        if range_filter:
            # exact inclusive BETWEEN on the kept files; pushes down to
            # the parquet scan (row-group skipping under the file skip)
            df = _apply_range_predicate(df, range_filter)
        if not pos_deletes and not eq_deletes:
            return df.drop("__fp", "__pos") if era_cols else df
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

        data = (
            df
            if era_cols  # era scans already carry __fp/__pos
            else df.select(
                "*",
                F.col("_metadata.file_path").alias("__fp"),
                F.col("_metadata.row_index").alias("__pos"),
            )
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
                # a delete file written before a rename stores its key
                # columns under the era's physical names — resolve by
                # field id at the file's sequence, alias to current
                if eras:
                    era_n = _era_names_for_seq(eras, d["seq"])
                    phys = [
                        era_n.get(i, names_by_id[i])
                        for i in d["equality_ids"]
                    ]
                else:
                    phys = cols
                dd = (
                    spark.read.parquet(d["resolved"])
                    .select(
                        *[
                            F.col(p).alias(c)
                            for p, c in zip(phys, cols)
                        ]
                    )
                    .distinct()
                )
                cond = F.col("__seq") < F.lit(d["seq"])
                for c in cols:
                    cond = cond & F.col(f"__l.{c}").eqNullSafe(F.col(f"__r.{c}"))
                data = (
                    data.alias("__l")
                    .join(F.broadcast(dd.alias("__r")), cond, "left_anti")
                )
        return data.drop("__fp", "__pos", "__seq")

    # manifest-less static export: guarded raw scan (current snapshot only)
    if partition_filter:
        raise IcebergSupportError(
            "partition_filter needs manifests and this table has none"
        )
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
    df = reader.parquet(*files)
    if range_filter:  # row-exact only: no manifests, no file skipping
        df = _apply_range_predicate(df, range_filter)
    return df


# --------------------------------------------------------------- write path
#
# Iceberg v2 table WRITE (append snapshots): parquet data files (one Spark
# job) + manifest Avro + manifest-list Avro (sources/avro.py writer) +
# versioned metadata JSON + version-hint.  The reference stores every
# mirror as an Iceberg warehouse (reference src/functions.rs:89
# iceberg_warehouse_location, README.md:17); this is that export surface,
# Spark-side.  Conformance target: the public Iceberg v2 spec
# (iceberg.apache.org/spec) — field-ids in all metadata schemas, manifest
# file-metadata keys, sequence-number inheritance for added entries.

_MANIFEST_ENTRY_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        {"name": "status", "type": "int", "field-id": 0},
        {"name": "snapshot_id", "type": ["null", "long"], "default": None,
         "field-id": 1},
        {"name": "sequence_number", "type": ["null", "long"], "default": None,
         "field-id": 3},
        {"name": "file_sequence_number", "type": ["null", "long"],
         "default": None, "field-id": 4},
        {"name": "data_file", "field-id": 2, "type": {
            "type": "record",
            "name": "r2",
            "fields": [
                {"name": "content", "type": "int", "field-id": 134},
                {"name": "file_path", "type": "string", "field-id": 100},
                {"name": "file_format", "type": "string", "field-id": 101},
                {"name": "partition", "field-id": 102, "type": {
                    "type": "record", "name": "r102", "fields": []}},
                {"name": "record_count", "type": "long", "field-id": 103},
                {"name": "file_size_in_bytes", "type": "long",
                 "field-id": 104},
                # per-field stats (Iceberg spec ids): external readers
                # use these for min/max file skipping on our exports
                {"name": "value_counts",
                 "type": ["null", {
                     "type": "array", "logicalType": "map",
                     "items": {"type": "record", "name": "k119_v120",
                               "fields": [
                                   {"name": "key", "type": "int",
                                    "field-id": 119},
                                   {"name": "value", "type": "long",
                                    "field-id": 120}]}}],
                 "default": None, "field-id": 109},
                {"name": "null_value_counts",
                 "type": ["null", {
                     "type": "array", "logicalType": "map",
                     "items": {"type": "record", "name": "k121_v122",
                               "fields": [
                                   {"name": "key", "type": "int",
                                    "field-id": 121},
                                   {"name": "value", "type": "long",
                                    "field-id": 122}]}}],
                 "default": None, "field-id": 110},
                {"name": "lower_bounds",
                 "type": ["null", {
                     "type": "array", "logicalType": "map",
                     "items": {"type": "record", "name": "k126_v127",
                               "fields": [
                                   {"name": "key", "type": "int",
                                    "field-id": 126},
                                   {"name": "value", "type": "bytes",
                                    "field-id": 127}]}}],
                 "default": None, "field-id": 125},
                {"name": "upper_bounds",
                 "type": ["null", {
                     "type": "array", "logicalType": "map",
                     "items": {"type": "record", "name": "k129_v130",
                               "fields": [
                                   {"name": "key", "type": "int",
                                    "field-id": 129},
                                   {"name": "value", "type": "bytes",
                                    "field-id": 130}]}}],
                 "default": None, "field-id": 128},
                {"name": "equality_ids",
                 "type": ["null", {"type": "array", "items": "int"}],
                 "default": None, "field-id": 135},
                {"name": "sort_order_id", "type": ["null", "int"],
                 "default": None, "field-id": 140},
            ],
        }},
    ],
}

_MANIFEST_FILE_SCHEMA = {
    "type": "record",
    "name": "manifest_file",
    "fields": [
        {"name": "manifest_path", "type": "string", "field-id": 500},
        {"name": "manifest_length", "type": "long", "field-id": 501},
        {"name": "partition_spec_id", "type": "int", "field-id": 502},
        {"name": "content", "type": "int", "field-id": 517},
        {"name": "sequence_number", "type": "long", "field-id": 515},
        {"name": "min_sequence_number", "type": "long", "field-id": 516},
        {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        {"name": "added_data_files_count", "type": "int", "field-id": 504},
        {"name": "existing_data_files_count", "type": "int", "field-id": 505},
        {"name": "deleted_data_files_count", "type": "int", "field-id": 506},
        {"name": "added_rows_count", "type": "long", "field-id": 512},
        {"name": "existing_rows_count", "type": "long", "field-id": 513},
        {"name": "deleted_rows_count", "type": "long", "field-id": 514},
    ],
}


# ----------------------------------------------------------- partitioning
#
# Partition specs (the moonlink mirror warehouse is a partitioned Iceberg
# table for any large source; reference README.md:13-17): identity over
# int/long/string/boolean/date columns, plus the temporal transforms
# year/month/day/hour over timestamp/date columns — the spec a real 100 TB
# time-series export uses (``partition_by=["days(ts)"]``).  Data files are
# staged with partitionBy on DUPLICATE derived columns so the parquet files
# keep every source column (spec-valid — Java Iceberg writers also
# materialize source columns); the manifest entries carry the typed
# partition tuple, which is what read-side file pruning keys on.

_PART_AVRO = {"int": "int", "long": "long", "string": "string",
              "boolean": "boolean", "date": "int"}
_TEMPORAL_SOURCES = ("timestamp", "timestamptz", "date")
_TRANSFORM_RE = re.compile(r"^(years?|months?|days?|hours?)\s*\(\s*(\w+)\s*\)$")
_WIDTH_TRANSFORM_RE = re.compile(
    r"^(bucket|truncate)\s*\(\s*(\d+)\s*,\s*(\w+)\s*\)$"
)
_BUCKET_RE = re.compile(r"^bucket\[(\d+)\]$")
_TRUNCATE_RE = re.compile(r"^truncate\[(\d+)\]$")
_BUCKET_SOURCES = ("int", "long", "date", "timestamp", "timestamptz", "string")


def _murmur3_32(data: bytes, seed: int = 0) -> int:
    """32-bit Murmur3 (x86 variant, the hash the Iceberg spec's bucket
    transform mandates — spec 'Appendix B: 32-bit Hash Requirements').
    Returns a SIGNED int32 so results compare directly against the
    spec's published test vectors."""
    c1, c2, mask = 0xCC9E2D51, 0x1B873593, 0xFFFFFFFF
    h = seed & mask
    n = len(data) // 4 * 4
    for i in range(0, n, 4):
        k = int.from_bytes(data[i:i + 4], "little")
        k = (k * c1) & mask
        k = ((k << 15) | (k >> 17)) & mask
        k = (k * c2) & mask
        h ^= k
        h = ((h << 13) | (h >> 19)) & mask
        h = (h * 5 + 0xE6546B64) & mask
    tail = data[n:]
    if tail:
        k = int.from_bytes(tail, "little")
        k = (k * c1) & mask
        k = ((k << 15) | (k >> 17)) & mask
        k = (k * c2) & mask
        h ^= k
    h ^= len(data)
    h ^= h >> 16
    h = (h * 0x85EBCA6B) & mask
    h ^= h >> 13
    h = (h * 0xC2B2AE35) & mask
    h ^= h >> 16
    return h - (1 << 32) if h >= (1 << 31) else h


def _parse_partition_by(partition_by: list[str]) -> list[tuple[str, str]]:
    """``["grp", "days(ts)", "bucket(16, id)"]`` → [(source column,
    transform)].  Accepts the plural spellings delta-spark/Iceberg DSLs
    use (days/months/...); bucket/truncate normalize to the spec's
    ``bucket[N]`` / ``truncate[W]`` transform strings."""
    out = []
    for p in partition_by:
        m = _TRANSFORM_RE.match(p.strip())
        if m:
            out.append((m.group(2), m.group(1).rstrip("s")))
            continue
        w = _WIDTH_TRANSFORM_RE.match(p.strip())
        if w:
            out.append((w.group(3), f"{w.group(1)}[{w.group(2)}]"))
        else:
            out.append((p.strip(), "identity"))
    return out


def _transform_result_type(transform: str, source_type: str) -> str:
    """Iceberg result type of a partition transform (spec 'Partition
    Transforms' table): identity keeps the source type; day → date;
    year/month/hour → int offsets from 1970-01-01."""
    if transform == "identity":
        if source_type not in _PART_AVRO:
            raise IcebergSupportError(
                f"identity partitioning on type {source_type!r} not supported "
                "(int/long/string/boolean/date)"
            )
        return source_type
    if transform in ("year", "month", "day", "hour"):
        if source_type not in _TEMPORAL_SOURCES or (
            transform == "hour" and source_type == "date"
        ):
            raise IcebergSupportError(
                f"{transform}() partitioning needs a timestamp/date column, "
                f"got {source_type!r}"
            )
        return "date" if transform == "day" else "int"
    m = _BUCKET_RE.match(transform)
    if m:
        if int(m.group(1)) < 1:
            raise IcebergSupportError("bucket[N] needs N >= 1")
        if source_type not in _BUCKET_SOURCES:
            raise IcebergSupportError(
                f"bucket[] partitioning on type {source_type!r} not supported "
                f"({'/'.join(_BUCKET_SOURCES)})"
            )
        return "int"
    m = _TRUNCATE_RE.match(transform)
    if m:
        if int(m.group(1)) < 1:
            raise IcebergSupportError("truncate[W] needs W >= 1")
        if source_type not in ("int", "long", "string"):
            raise IcebergSupportError(
                f"truncate[] partitioning on type {source_type!r} not "
                "supported (int/long/string)"
            )
        return source_type
    raise IcebergSupportError(f"unsupported partition transform {transform!r}")


def _partition_spec_json(schema_json: dict, partition_by: list[str]) -> dict:
    """Partition spec over ``partition_by`` (field-ids 1000+i, the
    Iceberg partition-field id convention; derived fields named
    ``<col>_<transform>`` as the Java writer does)."""
    by_name = {f["name"]: f for f in schema_json["fields"]}
    fields = []
    for i, (src, tr) in enumerate(_parse_partition_by(partition_by)):
        f = by_name.get(src)
        if f is None:
            raise IcebergSupportError(f"partition column {src!r} not in schema")
        st = f["type"] if isinstance(f["type"], str) else "struct"
        _transform_result_type(tr, st)  # validates
        if tr == "identity":
            name = src
        elif _BUCKET_RE.match(tr):
            name = f"{src}_bucket"  # Java writer naming convention
        elif _TRUNCATE_RE.match(tr):
            name = f"{src}_trunc"
        else:
            name = f"{src}_{tr}"
        fields.append(
            {
                "name": name,
                "transform": tr,
                "source-id": int(f["id"]),
                "field-id": 1000 + i,
            }
        )
    return {"spec-id": 0, "fields": fields}


def _spec_partition_cols(meta: dict) -> list[dict]:
    """Default-spec partition fields as
    ``{"name", "source", "transform", "ice_type"}`` dicts; empty for
    unpartitioned tables.  Unknown transforms refuse loudly."""
    specs = meta.get("partition-specs") or []
    default = None
    for s in specs:
        if s.get("spec-id") == int(meta.get("default-spec-id") or 0):
            default = s
    if default is None or not default.get("fields"):
        return []
    names_by_id = _field_names_by_id(meta)
    types_by_name: dict[str, str] = {}
    if meta.get("schemas"):
        for s in meta["schemas"]:
            if s.get("schema-id") == meta.get("current-schema-id"):
                types_by_name = {
                    f["name"]: f["type"] for f in s["fields"]
                    if isinstance(f["type"], str)
                }
    out = []
    for f in default["fields"]:
        src = names_by_id.get(int(f["source-id"]))
        if src is None:
            raise IcebergSupportError(
                f"partition source-id {f.get('source-id')} not in schema"
            )
        tr = f.get("transform") or "identity"
        out.append(
            {
                "name": f.get("name") or src,
                "source": src,
                "transform": tr,
                "field-id": int(f.get("field-id") or 1000 + len(out)),
                "source_type": types_by_name.get(src, "string"),
                "ice_type": _transform_result_type(
                    tr, types_by_name.get(src, "string")
                ),
            }
        )
    return out


def _parse_partition_value(raw: str, ice_type: str):
    """Hive path segment value → typed partition value (Avro-encodable).
    Dates are stored as days-since-epoch ints, the Iceberg encoding."""
    from urllib.parse import unquote

    raw = unquote(raw)
    if raw == "__HIVE_DEFAULT_PARTITION__":
        return None
    if ice_type in ("int", "long"):
        return int(raw)
    if ice_type == "boolean":
        return raw.lower() == "true"
    if ice_type == "date":
        import datetime as _dt

        return (_dt.date.fromisoformat(raw) - _dt.date(1970, 1, 1)).days
    return raw


def _normalize_partition_filter(filt: dict, part_cols: list[dict]) -> dict:
    """User-supplied {partition field: value} → the manifest encoding
    (dates become days-since-epoch; for ``day()`` fields a date/'YYYY-MM-DD'
    value selects that day), validated against the table's partition
    spec."""
    import datetime as _dt

    types = {p["name"]: p["ice_type"] for p in part_cols}
    out = {}
    for c, v in filt.items():
        if c not in types:
            raise IcebergSupportError(
                f"{c!r} is not a partition column of this table "
                f"(partitioned by {[p['name'] for p in part_cols]})"
            )
        t = types[c]
        if v is None:
            out[c] = None
        elif t == "date":
            d = _dt.date.fromisoformat(v) if isinstance(v, str) else v
            if isinstance(d, _dt.datetime):
                d = d.date()
            out[c] = (d - _dt.date(1970, 1, 1)).days
        elif t in ("int", "long"):
            out[c] = int(v)
        elif t == "boolean":
            out[c] = bool(v)
        else:
            out[c] = str(v)
    return out


def _decode_bound(b: bytes, ice_type: str):
    """Inverse of _bound_bytes: Iceberg single-value binary → python
    value (dates stay days-since-epoch, timestamps stay micros — the
    comparison domain)."""
    import struct

    if ice_type == "int":
        return struct.unpack("<i", b)[0]
    if ice_type == "long":
        return struct.unpack("<q", b)[0]
    if ice_type == "float":
        return struct.unpack("<f", b)[0]
    if ice_type == "double":
        return struct.unpack("<d", b)[0]
    if ice_type == "date":
        return struct.unpack("<i", b)[0]
    if ice_type in ("timestamp", "timestamptz"):
        return struct.unpack("<q", b)[0]
    if ice_type == "boolean":
        return b != b"\x00"
    return None


def _normalize_range_filter(
    filt: dict, meta: dict
) -> dict[str, dict]:
    """User {column: (lo, hi)} → per-column pruning spec
    {"field_id", "ice_type", "lo", "hi"} in the manifest bounds'
    comparison domain (dates → days, timestamps → micros).  Endpoints
    are inclusive; None = unbounded.  Refuses columns not in the
    current schema or of un-bounded types."""
    import datetime as _dt

    by_name: dict[str, tuple[int, str]] = {}
    for s in meta.get("schemas") or []:
        if s.get("schema-id") == meta.get("current-schema-id"):
            for f in s.get("fields") or []:
                if isinstance(f.get("type"), str):
                    by_name[f["name"]] = (int(f["id"]), f["type"])
    orderable = (
        "int", "long", "float", "double", "date", "timestamp", "timestamptz"
    )

    def conv(v, t):
        if v is None:
            return None
        if t == "date":
            d = _dt.date.fromisoformat(v) if isinstance(v, str) else v
            if isinstance(d, _dt.datetime):
                d = d.date()
            return (d - _dt.date(1970, 1, 1)).days
        if t in ("timestamp", "timestamptz"):
            if isinstance(v, str):
                v = _dt.datetime.fromisoformat(v)
            if isinstance(v, _dt.datetime):
                if v.tzinfo is not None:
                    v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
                return (v - _dt.datetime(1970, 1, 1)) // _dt.timedelta(
                    microseconds=1
                )
            return int(v)
        return v

    out = {}
    for c, (lo, hi) in filt.items():
        if c not in by_name:
            raise IcebergSupportError(
                f"range_filter column {c!r} not a top-level primitive of "
                "the current schema"
            )
        fid, t = by_name[c]
        if t not in orderable:
            raise IcebergSupportError(
                f"range_filter on type {t!r} not supported ({c!r})"
            )
        out[c] = {
            "field_id": fid,
            "ice_type": t,
            "lo": conv(lo, t),
            "hi": conv(hi, t),
        }
    return out


def _file_in_range(f: dict, spec: dict) -> bool:
    """Manifest-bounds check for one file against one column's range:
    keep unless the file's [lower, upper] provably misses [lo, hi].
    Files lacking bounds for the column are KEPT (missing stats are
    never grounds for skipping)."""
    fid, t = spec["field_id"], spec["ice_type"]
    f_lo = f.get("lower", {}).get(fid)
    f_hi = f.get("upper", {}).get(fid)
    if f_lo is None or f_hi is None:
        return True
    f_lo = _decode_bound(f_lo, t)
    f_hi = _decode_bound(f_hi, t)
    if f_lo is None or f_hi is None:
        return True
    if spec["hi"] is not None and f_lo > spec["hi"]:
        return False
    if spec["lo"] is not None and f_hi < spec["lo"]:
        return False
    return True


def _entry_schema(part_fields: list[dict]) -> dict:
    """Manifest-entry Avro schema with the spec's typed partition record
    (the static empty record when the table is unpartitioned)."""
    if not part_fields:
        return _MANIFEST_ENTRY_SCHEMA
    part_record = {
        "type": "record",
        "name": "r102",
        "fields": [
            {
                "name": f["name"],
                "type": ["null", _PART_AVRO[f["ice_type"]]],
                "default": None,
                "field-id": f["field-id"],
            }
            for f in part_fields
        ],
    }
    schema = json.loads(json.dumps(_MANIFEST_ENTRY_SCHEMA))  # deep copy
    for f in schema["fields"]:
        if f["name"] == "data_file":
            for df_f in f["type"]["fields"]:
                if df_f["name"] == "partition":
                    df_f["type"] = part_record
    return schema


def _mm3_hash_longs(arr):
    """Vectorized murmur3_x86_32 over int64 values hashed as their
    8-byte little-endian representation (the Iceberg spec's hash for
    int/long/date/timestamp bucket sources) — pure numpy uint32
    modular arithmetic, no per-row Python."""
    import numpy as np

    with np.errstate(over="ignore"):
        u = arr.astype(np.int64).astype(np.uint64)
        h = np.zeros(len(u), dtype=np.uint32)
        for shift in (np.uint64(0), np.uint64(32)):  # LE word order
            k = ((u >> shift) & np.uint64(0xFFFFFFFF)).astype(np.uint32)
            k = k * np.uint32(0xCC9E2D51)
            k = (k << np.uint32(15)) | (k >> np.uint32(17))
            k = k * np.uint32(0x1B873593)
            h = h ^ k
            h = (h << np.uint32(13)) | (h >> np.uint32(19))
            h = h * np.uint32(5) + np.uint32(0xE6546B64)
        h = h ^ np.uint32(8)  # byte length
        h = h ^ (h >> np.uint32(16))
        h = h * np.uint32(0x85EBCA6B)
        h = h ^ (h >> np.uint32(13))
        h = h * np.uint32(0xC2B2AE35)
        h = h ^ (h >> np.uint32(16))
        return h


def _bucket_expr(col_name: str, n: int, source_type: str):
    """Spark Column computing the Iceberg ``bucket[N]`` partition value:
    ``(murmur3_x86_32(spec bytes) & MaxInt) % N``.  Spark's builtin
    ``hash()`` is murmur3 with a different seed/byte layout, so an
    Arrow-batched pandas UDF computes the spec hash over numpy —
    strings hash their UTF-8 bytes per value inside the batch.

    Temporal sources are reduced to the spec's long JVM-side FIRST
    (``unix_micros`` for timestamps — instant-based, independent of
    ``spark.sql.session.timeZone`` — and ``datediff`` from epoch for
    dates), so the UDF only ever hashes longs: a non-UTC user session
    cannot shift the hashed micros away from the spec's UTC micros
    (ADVICE r7, iceberg.py:1094)."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    # NB: `from __future__ import annotations` stringifies inline hints
    # and pandas is deliberately not a module-global (import cost), so
    # the Series annotations are attached as real objects instead of
    # decorator-syntax type hints — same type-hint UDF discovery path,
    # no deprecated PandasUDFType (VERDICT r7 task 7).
    if source_type == "string":

        def _bucket_str(s):
            import numpy as np

            out = pd.Series([pd.NA] * len(s), dtype="Int32")
            valid = s.notna()
            if not valid.any():
                return out
            vals = s[valid]
            hashes = np.fromiter(
                (_murmur3_32(str(v).encode("utf-8")) for v in vals),
                dtype=np.int64,
                count=len(vals),
            ).astype(np.uint32)
            buckets = (hashes & np.uint32(0x7FFFFFFF)) % np.uint32(n)
            out[valid] = buckets.astype(np.int32)
            return out

        _bucket_str.__annotations__ = {"s": pd.Series, "return": pd.Series}
        return pandas_udf(_bucket_str, "int")(F.col(col_name))

    if source_type in ("timestamp", "timestamptz"):
        src = F.unix_micros(F.col(col_name))
    elif source_type == "date":
        src = F.datediff(F.col(col_name), F.lit("1970-01-01")).cast("long")
    else:  # int / long hashed as 8-byte longs per the spec
        src = F.col(col_name).cast("long")

    def _bucket_long(s):
        import numpy as np

        out = pd.Series([pd.NA] * len(s), dtype="Int32")
        valid = s.notna()
        if not valid.any():
            return out
        longs = s[valid].to_numpy(dtype=np.int64)
        hashes = _mm3_hash_longs(longs)
        buckets = (hashes & np.uint32(0x7FFFFFFF)) % np.uint32(n)
        out[valid] = buckets.astype(np.int32)
        return out

    _bucket_long.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return pandas_udf(_bucket_long, "int")(src)


def _staging_expr(pc: dict):
    """Spark Column computing a partition field's value from its source
    column (the transform definitions in the Iceberg spec)."""
    from pyspark.sql import functions as F

    s, tr = pc["source"], pc["transform"]
    if tr == "identity":
        return F.col(s)
    m = _TRUNCATE_RE.match(tr)
    if m:
        w = int(m.group(1))
        if pc.get("source_type") == "string":
            # spec: truncate to at most W code points (exact for BMP text;
            # Spark substring counts UTF-16 units, fine for the supported
            # identifier-ish partition values)
            return F.substring(F.col(s), 1, w)
        # ints/longs: v - (v mod W) with floor semantics (spec examples:
        # truncate[10] of -1 is -10)
        return F.col(s) - F.pmod(F.col(s), F.lit(w))
    m = _BUCKET_RE.match(tr)
    if m:
        return _bucket_expr(s, int(m.group(1)), pc.get("source_type", "string"))
    if tr == "day":
        return F.col(s).cast("date")
    if tr == "year":
        return (F.year(s) - F.lit(1970)).cast("int")
    if tr == "month":
        return ((F.year(s) - F.lit(1970)) * 12 + F.month(s) - 1).cast("int")
    if tr == "hour":
        return F.floor(F.unix_timestamp(F.col(s)) / 3600).cast("int")
    raise IcebergSupportError(f"unsupported partition transform {tr!r}")


def _stage_data_files(
    df: DataFrame, data_dir: str, part_cols: list[dict]
) -> list[tuple[str, dict]]:
    """Stage a DataFrame as parquet data files (ONE Spark job) and return
    [(file path, partition tuple dict)].  Partitioned staging writes
    through DUPLICATE derived ``__p_<field>`` columns so the data files
    keep every source column; the hive-style directory names are parsed
    back into typed partition values for the manifest entries."""
    if not part_cols:
        df.write.parquet(data_dir)
        return [
            (f, {})
            for f in sorted(_glob.glob(os.path.join(data_dir, "part-*.parquet")))
        ]
    staged = df
    for pc in part_cols:
        staged = staged.withColumn(f"__p_{pc['name']}", _staging_expr(pc))
    staged.write.partitionBy(
        *[f"__p_{pc['name']}" for pc in part_cols]
    ).parquet(data_dir)
    out = []
    for f in sorted(
        _glob.glob(os.path.join(data_dir, "**", "part-*.parquet"), recursive=True)
    ):
        values: dict = {}
        for seg in os.path.relpath(f, data_dir).split(os.sep)[:-1]:
            name, _, raw = seg.partition("=")
            for pc in part_cols:
                if name == f"__p_{pc['name']}":
                    values[pc["name"]] = _parse_partition_value(
                        raw, pc["ice_type"]
                    )
        if len(values) != len(part_cols):
            raise IcebergSupportError(
                f"staged file {f} lacks partition path segments"
            )
        out.append((f, values))
    return out


def _bound_bytes(v, ice_type: str) -> Optional[bytes]:
    """Iceberg single-value binary serialization (spec Appendix D) for
    the bound-able primitive types.  None = type not bounded here
    (strings are skipped: parquet writers may truncate string min/max,
    and a truncated UPPER bound is unsound without increment logic)."""
    import datetime as _dt
    import struct

    if v is None:
        return None
    if ice_type == "int":
        return struct.pack("<i", int(v))
    if ice_type == "long":
        return struct.pack("<q", int(v))
    if ice_type == "float":
        return struct.pack("<f", float(v))
    if ice_type == "double":
        return struct.pack("<d", float(v))
    if ice_type == "boolean":
        return b"\x01" if v else b"\x00"
    if ice_type == "date":
        if isinstance(v, _dt.date) and not isinstance(v, _dt.datetime):
            v = (v - _dt.date(1970, 1, 1)).days
        return struct.pack("<i", int(v))
    if ice_type in ("timestamp", "timestamptz"):
        if isinstance(v, _dt.datetime):
            if v.tzinfo is not None:
                v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            v = (v - _dt.datetime(1970, 1, 1)) // _dt.timedelta(microseconds=1)
        return struct.pack("<q", int(v))
    return None


def _column_stats_maps(fpath: str, schema_json: Optional[dict]) -> dict:
    """Per-field stats for one staged parquet data file, in manifest-
    entry form: value_counts / null_value_counts for every top-level
    primitive, lower/upper bounds for the orderable non-string types —
    aggregated across row groups from the parquet footer (driver-side
    metadata, no data read).  A column whose stats are missing in ANY
    row group is omitted from the bound maps (incomplete bounds are
    unsound for skipping)."""
    import pyarrow.parquet as _pq

    if not schema_json:
        return {}
    ids, types = {}, {}
    for f in schema_json.get("fields") or []:
        if isinstance(f.get("type"), str):
            ids[f["name"]] = int(f["id"])
            types[f["name"]] = f["type"]
    if not ids:
        return {}
    md = _pq.ParquetFile(fpath).metadata
    mins: dict[str, object] = {}
    maxs: dict[str, object] = {}
    nulls: dict[str, int] = {}
    bad: set[str] = set()
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if name not in ids:
                continue
            try:  # pyarrow raises "Cannot extract statistics for type
                # ..." (e.g. decimals) on .statistics OR on .min/.max
                st = col.statistics
                ok = st is not None and st.has_min_max and st.null_count is not None
                lo, hi = (st.min, st.max) if ok else (None, None)
            except Exception:
                ok = False
            if not ok:
                bad.add(name)
                continue
            nulls[name] = nulls.get(name, 0) + int(st.null_count)
            if name not in mins or lo < mins[name]:
                mins[name] = lo
            if name not in maxs or hi > maxs[name]:
                maxs[name] = hi
    n_rows = md.num_rows
    value_counts = [{"key": fid, "value": n_rows} for fid in ids.values()]
    null_counts = [
        {"key": ids[n], "value": c} for n, c in nulls.items() if n not in bad
    ]
    lower, upper = [], []
    for name in mins:
        if name in bad:
            continue
        lo = _bound_bytes(mins[name], types[name])
        hi = _bound_bytes(maxs[name], types[name])
        if lo is not None and hi is not None:
            lower.append({"key": ids[name], "value": lo})
            upper.append({"key": ids[name], "value": hi})
    out: dict = {"value_counts": value_counts}
    if null_counts:
        out["null_value_counts"] = null_counts
    if lower:
        out["lower_bounds"] = sorted(lower, key=lambda r: r["key"])
        out["upper_bounds"] = sorted(upper, key=lambda r: r["key"])
    return out


def _spark_to_iceberg_schema(schema) -> dict:
    """Spark StructType → Iceberg schema JSON with field-ids assigned
    depth-first in declaration order (the assignment a fresh Iceberg
    CREATE TABLE produces)."""
    from pyspark.sql import types as T

    counter = {"n": 0}

    def nid() -> int:
        counter["n"] += 1
        return counter["n"]

    def conv(dt):
        if isinstance(dt, T.StructType):
            fields = []
            for f in dt.fields:
                fid = nid()
                fields.append({
                    "id": fid,
                    "name": f.name,
                    "required": not f.nullable,
                    "type": conv(f.dataType),
                })
            return {"type": "struct", "fields": fields}
        if isinstance(dt, T.ArrayType):
            eid = nid()
            return {
                "type": "list",
                "element-id": eid,
                "element": conv(dt.elementType),
                "element-required": not dt.containsNull,
            }
        if isinstance(dt, T.MapType):
            kid, vid = nid(), nid()
            return {
                "type": "map",
                "key-id": kid,
                "key": conv(dt.keyType),
                "value-id": vid,
                "value": conv(dt.valueType),
                "value-required": not dt.valueContainsNull,
            }
        if isinstance(dt, T.DecimalType):
            return f"decimal({dt.precision},{dt.scale})"
        simple = {
            T.BooleanType: "boolean",
            T.IntegerType: "int",
            T.ShortType: "int",
            T.ByteType: "int",
            T.LongType: "long",
            T.FloatType: "float",
            T.DoubleType: "double",
            T.DateType: "date",
            T.TimestampType: "timestamptz",
            T.TimestampNTZType: "timestamp",
            T.StringType: "string",
            T.BinaryType: "binary",
        }.get(type(dt))
        if simple is None:
            raise IcebergSupportError(
                f"cannot map Spark type {dt.simpleString()} to Iceberg"
            )
        return simple

    struct = conv(schema)
    return {
        "type": "struct",
        "schema-id": 0,
        "fields": struct["fields"],
        # side-channel: last assigned id (popped before serialization)
        "_last_column_id": counter["n"],
    }


def write_iceberg(
    df: DataFrame,
    path: str,
    mode: str = "error",
    merge_schema: bool = False,
    partition_by: Optional[list[str]] = None,
) -> None:
    """Write/append a DataFrame as an Iceberg v2 table.

    ``mode='error'`` creates a fresh table (refuses if one exists);
    ``mode='append'`` adds a snapshot (schema must match the table's
    unless ``merge_schema``).

    ``partition_by`` (create only) declares the partition spec: bare
    column names are identity transforms; ``"days(ts)"`` /
    ``"months(ts)"`` / ``"years(ts)"`` / ``"hours(ts)"`` are the
    temporal transforms a time-series table partitions on.  Data files
    are staged per partition value, manifest entries carry the typed
    partition tuple, and partition-filtered reads prune to matching
    files only (read_iceberg ``partition_filter``) — what keeps a
    100 TB export's downstream scans from touching every file.  Appends
    derive the spec from the table's metadata; passing a conflicting
    ``partition_by`` refuses.

    ``merge_schema`` appends evolve the schema the Iceberg way: new
    input columns join the schema under FRESH field ids (a new schema-id
    appended to the metadata's schemas list — prior schemas stay for
    time travel), and input gaps land as typed NULLs; readers impose the
    latest schema, so pre-evolution files surface NULLs for the new
    columns (the read side already handles this).  Refused when the
    existing field ids are not this writer's sequential assignment —
    re-deriving ids for an externally-authored id layout could silently
    re-key columns.

    Scale shape: ONE Spark job stages the parquet data files; metadata
    construction (per-file row counts from parquet footers, manifest +
    manifest-list Avro, metadata JSON) is driver-side over the file
    LISTING only — the same O(#files) driver work Iceberg's own commit
    path performs, never O(rows).  Appends carry previous manifest-list
    entries forward verbatim, so commit cost is O(new files + #prior
    manifests), not O(table).
    """
    import time
    import uuid as _uuid

    import pyarrow.parquet as _pq

    from pg_mooncake_spark.sources.avro import write_avro

    meta_dir = os.path.join(path, "metadata")
    exists = os.path.isdir(meta_dir)
    if exists and mode == "error":
        raise IcebergSupportError(f"Iceberg table already exists at {path}")
    if not exists and mode == "append":
        raise IcebergSupportError(f"no Iceberg table to append to at {path}")
    if mode not in ("error", "append"):
        raise IcebergSupportError(f"unsupported write_iceberg mode {mode!r}")

    schema_json = _spark_to_iceberg_schema(df.schema)
    last_column_id = schema_json.pop("_last_column_id")

    prev = None
    schema_id = 0
    schemas_list: Optional[list[dict]] = None
    if exists:
        prev = _latest_metadata(path)
        prev_schema = None
        if prev.get("schemas"):
            for s in prev["schemas"]:
                if s.get("schema-id") == prev.get("current-schema-id"):
                    prev_schema = s
        if prev_schema is not None:
            a = [(f["name"], f["type"], f["required"]) for f in prev_schema["fields"]]
            b = [(f["name"], f["type"], f["required"]) for f in schema_json["fields"]]
            if a != b and not merge_schema:
                raise IcebergSupportError(
                    "append schema differs from table schema; "
                    "pass merge_schema=True to evolve it"
                )
            if a != b:
                from pyspark.sql import functions as F
                from pyspark.sql import types as T

                prev_spark = _schema_from_metadata(prev)
                known = {f.name for f in prev_spark.fields}
                extra = [
                    T.StructField(f.name, f.dataType, True)
                    for f in df.schema.fields
                    if f.name not in known
                ]
                union = T.StructType(list(prev_spark.fields) + extra)
                df = df.select(
                    *[
                        (
                            F.col(f.name) if f.name in df.columns else F.lit(None)
                        ).cast(f.dataType).alias(f.name)
                        for f in union.fields
                    ]
                )
                if extra:  # genuinely wider: bump schema-id, fresh ids
                    schema_json = _spark_to_iceberg_schema(df.schema)
                    last_column_id = schema_json.pop("_last_column_id")
                    regen = {
                        f["name"]: f["id"]
                        for f in schema_json["fields"]
                        if f["name"] in known
                    }
                    orig = {f["name"]: f["id"] for f in prev_schema["fields"]}
                    if regen != orig:
                        raise IcebergSupportError(
                            "cannot evolve schema: existing field ids are not "
                            "this writer's sequential assignment"
                        )
                    schema_id = int(prev.get("current-schema-id") or 0) + 1
                    schema_json["schema-id"] = schema_id
                    schemas_list = list(prev.get("schemas") or []) + [
                        {k: v for k, v in schema_json.items()}
                    ]
        # non-evolving append: carry the table's schema state forward
        # verbatim — regenerating it would reset the schemas history and
        # re-key current-schema-id back to 0
        if schemas_list is None and prev is not None and prev_schema is not None:
            schema_id = int(prev.get("current-schema-id") or 0)
            schemas_list = list(prev.get("schemas") or []) or None
            schema_json = {k: v for k, v in prev_schema.items()}
            last_column_id = int(prev.get("last-column-id") or last_column_id)

    # partition spec: created tables take partition_by; appends inherit
    # the table's default spec (a conflicting explicit spec refuses)
    if prev is not None:
        part_cols = _spec_partition_cols(prev)
        if partition_by is not None and _parse_partition_by(
            list(partition_by)
        ) != [(p["source"], p["transform"]) for p in part_cols]:
            raise IcebergSupportError(
                f"append partition_by {list(partition_by)} conflicts with the "
                f"table's spec {[p['name'] for p in part_cols]}"
            )
        spec = None  # carried from prev metadata below
        for s in prev.get("partition-specs") or []:
            if s.get("spec-id") == int(prev.get("default-spec-id") or 0):
                spec = s
        if spec is None:
            spec = {"spec-id": 0, "fields": []}
    elif partition_by:
        spec = _partition_spec_json(schema_json, list(partition_by))
        part_cols = _spec_partition_cols(
            {
                "partition-specs": [spec],
                "default-spec-id": 0,
                "schemas": [schema_json],
                "current-schema-id": schema_json.get("schema-id", 0),
            }
        )
    else:
        spec = {"spec-id": 0, "fields": []}
        part_cols = []
    part_fields = [
        {"name": p["name"], "ice_type": p["ice_type"],
         "field-id": p.get("field-id", 1000 + i)}
        for i, p in enumerate(part_cols)
    ]

    version = 1 if prev is None else _metadata_version_of(prev, path) + 1
    seq = 1 if prev is None else int(prev.get("last-sequence-number") or 0) + 1
    snapshot_id = seq  # deterministic, unique per commit
    table_uuid = prev["table-uuid"] if prev else str(_uuid.uuid4())

    # 1. stage data files (the only Spark job)
    data_dir = os.path.join(path, "data", f"s{seq:05d}")
    staged = _stage_data_files(df, data_dir, part_cols)
    entries = []
    added_rows = 0
    for f, part_values in staged:
        n = _pq.ParquetFile(f).metadata.num_rows
        if n == 0:
            # empty partitions stage empty part files; a real Iceberg
            # commit never records zero-row files — drop them
            os.remove(f)
            continue
        added_rows += n
        data_file = {
            "content": 0,
            "file_path": f,
            "file_format": "PARQUET",
            "partition": part_values,
            "record_count": n,
            "file_size_in_bytes": os.path.getsize(f),
        }
        data_file.update(_column_stats_maps(f, schema_json))
        entries.append({
            "status": 1,  # ADDED
            "snapshot_id": snapshot_id,
            # null sequence numbers: inherited from the manifest-list
            # entry per the v2 inheritance rule (exercises the same path
            # external writers rely on)
            "sequence_number": None,
            "file_sequence_number": None,
            "data_file": data_file,
        })

    os.makedirs(meta_dir, exist_ok=True)
    pub_schema = {k: v for k, v in schema_json.items()}

    # 2. manifest
    manifest_path = os.path.join(
        meta_dir, f"m{seq:05d}-{_uuid.uuid4().hex[:12]}.avro"
    )
    write_avro(
        manifest_path,
        _entry_schema(part_fields),
        entries,
        extra_meta={
            "schema": json.dumps(pub_schema).encode(),
            "partition-spec": json.dumps(spec.get("fields", [])).encode(),
            "partition-spec-id": str(spec.get("spec-id", 0)).encode(),
            "format-version": b"2",
            "content": b"data",
        },
    )

    # 3. manifest list: new manifest first, previous manifests carried
    # forward verbatim (append semantics)
    new_mf = {
        "manifest_path": manifest_path,
        "manifest_length": os.path.getsize(manifest_path),
        "partition_spec_id": int(spec.get("spec-id", 0)),
        "content": 0,
        "sequence_number": seq,
        "min_sequence_number": seq,
        "added_snapshot_id": snapshot_id,
        "added_data_files_count": len(entries),
        "existing_data_files_count": 0,
        "deleted_data_files_count": 0,
        "added_rows_count": added_rows,
        "existing_rows_count": 0,
        "deleted_rows_count": 0,
    }
    carried = []
    if prev is not None:
        cur = None
        for s in prev.get("snapshots") or []:
            if s.get("snapshot-id") == prev.get("current-snapshot-id"):
                cur = s
        if cur is not None:
            from pg_mooncake_spark.sources.avro import read_avro

            _, carried = read_avro(_resolve_path(cur["manifest-list"], path))
    mlist_path = os.path.join(
        meta_dir, f"snap-{snapshot_id}-1-{_uuid.uuid4().hex[:12]}.avro"
    )
    write_avro(
        mlist_path,
        _MANIFEST_FILE_SCHEMA,
        [new_mf] + [
            {k: c.get(k) for k in
             (f["name"] for f in _MANIFEST_FILE_SCHEMA["fields"])}
            for c in carried
        ],
        extra_meta={"format-version": b"2"},
    )

    # 4. metadata JSON + version hint
    now_ms = int(time.time() * 1000)
    snapshot = {
        "snapshot-id": snapshot_id,
        "parent-snapshot-id": (prev or {}).get("current-snapshot-id"),
        "sequence-number": seq,
        "timestamp-ms": now_ms,
        "manifest-list": mlist_path,
        "schema-id": schema_id,
        "summary": {
            "operation": "append",
            "added-data-files": str(len(entries)),
            "added-records": str(added_rows),
        },
    }
    meta = {
        "format-version": 2,
        "table-uuid": table_uuid,
        "location": path,
        "last-sequence-number": seq,
        "last-updated-ms": now_ms,
        "last-column-id": last_column_id,
        "current-schema-id": schema_id,
        "schemas": schemas_list if schemas_list is not None else [pub_schema],
        "default-spec-id": int(
            (prev.get("default-spec-id") if prev else None) or spec.get("spec-id", 0)
        ),
        # appends carry the FULL spec list forward (delete commits may
        # have registered an extra unpartitioned spec for global deletes)
        "partition-specs": (
            list(prev.get("partition-specs") or [spec]) if prev else [spec]
        ),
        "last-partition-id": int(
            (prev.get("last-partition-id") if prev else None)
            or 999 + len(spec.get("fields", []))
        ),
        # carry any sort orders a sorted compaction registered (new
        # appends are unsorted, but the orders themselves persist)
        "default-sort-order-id": int(
            (prev.get("default-sort-order-id") if prev else None) or 0
        ),
        "sort-orders": (
            list(prev.get("sort-orders") or []) if prev else []
        ) or [{"order-id": 0, "fields": []}],
        # carry table properties (incl. the pgms.schema-activation-seq
        # markers rename-era reads depend on) across appends
        "properties": dict((prev.get("properties") if prev else None) or {}),
        "current-snapshot-id": snapshot_id,
        "snapshots": (list(prev.get("snapshots") or []) if prev else [])
        + [snapshot],
        "snapshot-log": (list(prev.get("snapshot-log") or []) if prev else [])
        + [{"snapshot-id": snapshot_id, "timestamp-ms": now_ms}],
        # metadata history: each commit links its predecessor file
        "metadata-log": (
            (list(prev.get("metadata-log") or []) +
             [{"metadata-file": prev["__pinned-file"],
               "timestamp-ms": int(prev.get("last-updated-ms") or 0)}])
            if prev is not None and prev.get("__pinned-file")
            else []
        ),
    }
    _write_metadata_json(meta_dir, version, meta)


def evolve_partition_spec(path: str, partition_by: list[str]) -> int:
    """Register a NEW default partition spec (Iceberg 'Partition
    Evolution') without rewriting any data — a metadata-only commit.
    Subsequent appends stage under the new spec; files written under
    prior specs stay valid: partition-filtered reads keep them
    conservatively (their tuples lack the new fields) and the
    transform's row predicate restores exact semantics.  Fields shared
    with any prior spec (same source-id + transform) REUSE their
    partition field-id, as the spec requires for v2 tables; new fields
    allocate past last-partition-id.  Returns the new default spec-id
    (the current one when the request matches it — a no-op)."""
    import time

    meta = _latest_metadata(path)
    schema = None
    for s in meta.get("schemas") or []:
        if s.get("schema-id") == meta.get("current-schema-id"):
            schema = s
    if schema is None:
        raise IcebergSupportError("table has no current schema")
    new = _partition_spec_json(schema, list(partition_by))
    specs = list(meta.get("partition-specs") or [])

    def key(f: dict) -> tuple:
        return (int(f["source-id"]), f["transform"])

    cur = next(
        (s for s in specs
         if s.get("spec-id") == int(meta.get("default-spec-id") or 0)),
        None,
    )
    if cur is not None and [key(f) for f in cur.get("fields", [])] == [
        key(f) for f in new["fields"]
    ]:
        return int(cur["spec-id"])
    last_pid = int(meta.get("last-partition-id") or 999)
    existing: dict[tuple, int] = {}
    for s in specs:
        for f in s.get("fields", []):
            existing.setdefault(key(f), int(f["field-id"]))
    for f in new["fields"]:
        k = key(f)
        if k in existing:
            f["field-id"] = existing[k]
        else:
            last_pid += 1
            f["field-id"] = last_pid
    new["spec-id"] = max((int(s["spec-id"]) for s in specs), default=-1) + 1
    out = {k: v for k, v in meta.items() if not k.startswith("__")}
    out["partition-specs"] = specs + [new]
    out["default-spec-id"] = new["spec-id"]
    out["last-partition-id"] = last_pid
    out["last-updated-ms"] = int(time.time() * 1000)
    if meta.get("__pinned-file"):
        out["metadata-log"] = list(meta.get("metadata-log") or []) + [
            {
                "metadata-file": meta["__pinned-file"],
                "timestamp-ms": int(meta.get("last-updated-ms") or 0),
            }
        ]
    meta_dir = os.path.join(path, "metadata")
    _write_metadata_json(meta_dir, _metadata_version_of(meta, path) + 1, out)
    return int(new["spec-id"])


def rename_column_iceberg(path: str, old: str, new: str) -> int:
    """Metadata-only column rename keeping the FIELD ID — the operation
    Iceberg's field-id indirection exists for (spec 'Schema Evolution':
    rename never touches data).  A new schema (same ids, renamed field)
    joins the ``schemas`` list and becomes current; no data file, no
    manifest is rewritten.

    Because this writer's parquet files carry no embedded field-id
    metadata, the reader resolves pre-rename files by ERA instead: the
    table property ``pgms.schema-activation-seq.<schema-id>`` records
    the first sequence number written under the new schema, and
    read_iceberg groups data files by the schema active at their
    sequence number, aliasing each era's physical column names back to
    the current names (read path: :func:`_rename_eras`).  External
    id-based readers are unaffected (ids never change); external
    name-based readers should be pointed at a compacted table.

    Refuses while unmerged EQUALITY deletes exist: their parquet files
    store values under era column names AND their ids must keep meaning
    across the rename — compact first (compact_iceberg), then rename.
    Positional deletes are (path, pos) and are unaffected.

    Returns the new schema-id."""
    import time

    meta = _latest_metadata(path)
    cur = None
    for s in meta.get("schemas") or []:
        if s.get("schema-id") == meta.get("current-schema-id"):
            cur = s
    if cur is None:
        raise IcebergSupportError(f"no current schema in {path}")
    names = [f["name"] for f in cur["fields"]]
    if old not in names and new in names:
        # already renamed — idempotent success, so a caller retrying a
        # multi-export rename after a transient failure does not
        # dead-end on the exports that already succeeded
        return int(meta.get("current-schema-id") or 0)
    if old not in names:
        raise IcebergSupportError(f"no column {old!r} to rename")
    if new in names:
        raise IcebergSupportError(f"column {new!r} already exists")

    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    snap = snaps.get(meta.get("current-snapshot-id"))
    if snap is not None and snap.get("manifest-list"):
        _files, _pos, eq_deletes = _files_from_manifests(path, snap)
        if eq_deletes:
            raise IcebergEqualityDeletesPendingError(
                "cannot rename while unmerged equality deletes exist; "
                "run compact_iceberg first"
            )

    new_schema = {
        **cur,
        "schema-id": max(
            int(s.get("schema-id") or 0) for s in meta.get("schemas") or []
        )
        + 1,
        "fields": [
            {**f, "name": new} if f["name"] == old else f
            for f in cur["fields"]
        ],
    }
    out = {k: v for k, v in meta.items() if not k.startswith("__")}
    out["schemas"] = list(meta.get("schemas") or []) + [new_schema]
    out["current-schema-id"] = new_schema["schema-id"]
    props = dict(out.get("properties") or {})
    props[f"pgms.schema-activation-seq.{new_schema['schema-id']}"] = str(
        int(meta.get("last-sequence-number") or 0) + 1
    )
    out["properties"] = props
    out["last-updated-ms"] = int(time.time() * 1000)
    if meta.get("__pinned-file"):
        out["metadata-log"] = list(meta.get("metadata-log") or []) + [
            {
                "metadata-file": meta["__pinned-file"],
                "timestamp-ms": int(meta.get("last-updated-ms") or 0),
            }
        ]
    meta_dir = os.path.join(path, "metadata")
    _write_metadata_json(meta_dir, _metadata_version_of(meta, path) + 1, out)
    return int(new_schema["schema-id"])


def drop_column_iceberg(path: str, col: str) -> int:
    """Metadata-only column drop keeping every other FIELD ID — the
    Iceberg spec's delete-column evolution (data files keep the
    column's bytes; readers resolving by id simply stop selecting it).
    A new schema (same ids, field removed) joins the ``schemas`` list
    and becomes current; no data file, no manifest is rewritten.

    Same era bookkeeping as :func:`rename_column_iceberg` (the
    activation-seq property), and the same refusal while unmerged
    equality deletes exist (their files store era-named columns —
    compact first).  Dropping a column any partition spec transforms
    is refused: partition values of existing files would lose their
    source field."""
    import time

    meta = _latest_metadata(path)
    cur = None
    for s in meta.get("schemas") or []:
        if s.get("schema-id") == meta.get("current-schema-id"):
            cur = s
    if cur is None:
        raise IcebergSupportError(f"no current schema in {path}")
    names = [f["name"] for f in cur["fields"]]
    if col not in names:
        # already dropped — idempotent success for multi-export retries
        return int(meta.get("current-schema-id") or 0)
    field_id = next(f["id"] for f in cur["fields"] if f["name"] == col)
    for spec in meta.get("partition-specs") or []:
        if any(
            int(f.get("source-id") or -1) == int(field_id)
            for f in spec.get("fields") or []
        ):
            raise IcebergSupportError(
                f"cannot drop {col!r}: partition spec "
                f"{spec.get('spec-id')} transforms it"
            )
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    snap = snaps.get(meta.get("current-snapshot-id"))
    if snap is not None and snap.get("manifest-list"):
        _files, _pos, eq_deletes = _files_from_manifests(path, snap)
        if eq_deletes:
            raise IcebergEqualityDeletesPendingError(
                "cannot drop a column while unmerged equality deletes "
                "exist; run compact_iceberg first"
            )
    new_schema = {
        **cur,
        "schema-id": max(
            int(s.get("schema-id") or 0) for s in meta.get("schemas") or []
        )
        + 1,
        "fields": [f for f in cur["fields"] if f["name"] != col],
    }
    out = {k: v for k, v in meta.items() if not k.startswith("__")}
    out["schemas"] = list(meta.get("schemas") or []) + [new_schema]
    out["current-schema-id"] = new_schema["schema-id"]
    props = dict(out.get("properties") or {})
    props[f"pgms.schema-activation-seq.{new_schema['schema-id']}"] = str(
        int(meta.get("last-sequence-number") or 0) + 1
    )
    out["properties"] = props
    out["last-updated-ms"] = int(time.time() * 1000)
    if meta.get("__pinned-file"):
        out["metadata-log"] = list(meta.get("metadata-log") or []) + [
            {
                "metadata-file": meta["__pinned-file"],
                "timestamp-ms": int(meta.get("last-updated-ms") or 0),
            }
        ]
    meta_dir = os.path.join(path, "metadata")
    _write_metadata_json(meta_dir, _metadata_version_of(meta, path) + 1, out)
    return int(new_schema["schema-id"])


def _rename_eras(meta: dict):
    """Era table for rename-aware reads, or None when every schema in
    the metadata agrees with the current top-level names (the common,
    zero-cost case).  Returns a list of ``(activation_seq, {field-id:
    name})`` sorted ascending; a data file resolves against the era
    with the greatest activation_seq ≤ its sequence number."""
    schemas = meta.get("schemas") or []
    if len(schemas) <= 1:
        return None
    cur_names = {}
    for s in schemas:
        if s.get("schema-id") == meta.get("current-schema-id"):
            cur_names = {int(f["id"]): f["name"] for f in s["fields"]}
    props = meta.get("properties") or {}
    eras = []
    differs = False
    for s in schemas:
        sid = int(s.get("schema-id") or 0)
        names = {int(f["id"]): f["name"] for f in s["fields"]}
        act = int(props.get(f"pgms.schema-activation-seq.{sid}") or 0)
        eras.append((act, names))
        if any(cur_names.get(i) not in (None, n) for i, n in names.items()):
            differs = True
    if not differs:
        return None
    # later activation wins ties (additive evolutions share act=0)
    eras.sort(key=lambda e: e[0])
    return eras


def _era_names_for_seq(eras, seq) -> dict:
    """The field-id → name mapping active at sequence number ``seq``
    (greatest activation ≤ seq): how a file written at that sequence
    spelled its physical column names."""
    s = int(seq or 0)
    best = eras[0][1]
    for act, names in eras:
        if act <= s:
            best = names
    return best


def _era_union_scan(spark, declared, files, eras, cur_names):
    """Union of per-era scans: each group of data files reads with its
    era's physical column names and aliases back to the CURRENT names
    (field-id correspondence, ``cur_names``: id → current name),
    carrying ``__fp``/``__pos`` metadata columns for the delete-
    application paths.  Era count is the number of renames plus one —
    a handful of scans at worst."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    cur_ids = {n: i for i, n in cur_names.items()}  # current name -> id

    def era_of(seq):
        s = int(seq or 0)
        best = eras[0][1]
        for act, names in eras:
            if act <= s:
                best = names
        return best

    groups: dict[tuple, list[dict]] = {}
    era_by_key: dict[tuple, dict] = {}
    for f in files:
        names = era_of(f["seq"])
        key = tuple(sorted(names.items()))
        groups.setdefault(key, []).append(f)
        era_by_key[key] = names
    parts = []
    for key, fs in groups.items():
        names = era_by_key[key]
        read_schema = T.StructType(
            [
                T.StructField(
                    names.get(cur_ids.get(fld.name), fld.name),
                    fld.dataType,
                    True,
                )
                for fld in declared.fields
            ]
        )
        gdf = spark.read.schema(read_schema).parquet(
            *[f["resolved"] for f in fs]
        )
        parts.append(
            gdf.select(
                *[
                    F.col(names.get(cur_ids.get(fld.name), fld.name)).alias(
                        fld.name
                    )
                    for fld in declared.fields
                ],
                F.col("_metadata.file_path").alias("__fp"),
                F.col("_metadata.row_index").alias("__pos"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _commit_snapshot(
    path: str,
    meta: dict,
    seq: int,
    snapshot_id: int,
    groups: list[dict],
    carried: list[dict],
    summary: dict[str, str],
) -> int:
    """Shared commit tail for every snapshot-producing op (DELETE /
    equality DELETE / compact / row-delta upsert): write one entry
    manifest PER GROUP, the manifest list (new manifests + carried
    verbatim), the next metadata JSON and the version hint.  Multiple
    groups make the commit a spec row-delta: delete files and data files
    land in ONE snapshot, so an external reader never observes the
    in-between state where updated rows are missing (ADVICE r6).

    Each group is ``{"entries": [...], "content": b"data"|b"deletes",
    "mlist_content": 0|1, "added_rows": int}`` plus optional
    ``entry_schema`` / ``spec_fields`` for partitioned data manifests
    (delete manifests stay globally-scoped with an empty partition
    record).  Driver work is O(#entries + #carried manifests).  Returns
    the new snapshot id."""
    import time
    import uuid as _uuid

    from pg_mooncake_spark.sources.avro import write_avro

    meta_dir = os.path.join(path, "metadata")
    schema_json = None
    for s in meta.get("schemas") or []:
        if s.get("schema-id") == meta.get("current-schema-id"):
            schema_json = s
    # Spec binding per manifest: data manifests bind the table's default
    # spec; globally-scoped delete manifests (empty partition tuples) on a
    # PARTITIONED table bind an UNPARTITIONED spec — real readers decode a
    # manifest's partition records against its declared spec, so stamping
    # an empty tuple with a fielded spec-id would mis-decode.  The empty
    # spec is registered in partition-specs on first use.
    specs = list(meta.get("partition-specs") or [{"spec-id": 0, "fields": []}])
    default_id = int(meta.get("default-spec-id") or 0)
    default_fields = next(
        (s.get("fields") or [] for s in specs if s.get("spec-id") == default_id),
        [],
    )
    empty_id = next(
        (s["spec-id"] for s in specs if not (s.get("fields") or [])), None
    )
    needs_empty = default_fields and any(
        g["mlist_content"] == 1 and not g.get("spec_fields") for g in groups
    )
    if needs_empty and empty_id is None:
        empty_id = max(int(s.get("spec-id") or 0) for s in specs) + 1
        specs.append({"spec-id": empty_id, "fields": []})
    new_mfs = []
    for g in groups:
        is_global_delete = g["mlist_content"] == 1 and not g.get("spec_fields")
        spec_id = (
            empty_id if (is_global_delete and default_fields) else default_id
        )
        spec_fields = [] if is_global_delete else (g.get("spec_fields") or [])
        manifest_path = os.path.join(
            meta_dir, f"m{seq:05d}-{_uuid.uuid4().hex[:12]}.avro"
        )
        write_avro(
            manifest_path,
            g.get("entry_schema") or _MANIFEST_ENTRY_SCHEMA,
            g["entries"],
            extra_meta={
                "schema": json.dumps(schema_json or {}).encode(),
                "partition-spec": json.dumps(spec_fields).encode(),
                "partition-spec-id": str(spec_id).encode(),
                "format-version": b"2",
                "content": g["content"],
            },
        )
        new_mfs.append(
            {
                "manifest_path": manifest_path,
                "manifest_length": os.path.getsize(manifest_path),
                "partition_spec_id": int(spec_id),
                "content": g["mlist_content"],
                "sequence_number": seq,
                "min_sequence_number": seq,
                "added_snapshot_id": snapshot_id,
                "added_data_files_count": len(g["entries"]),
                "existing_data_files_count": 0,
                "deleted_data_files_count": 0,
                "added_rows_count": g["added_rows"],
                "existing_rows_count": 0,
                "deleted_rows_count": 0,
            }
        )
    mlist_path = os.path.join(
        meta_dir, f"snap-{snapshot_id}-1-{_uuid.uuid4().hex[:12]}.avro"
    )
    write_avro(
        mlist_path,
        _MANIFEST_FILE_SCHEMA,
        new_mfs
        + [
            {k: c.get(k) for k in (f["name"] for f in _MANIFEST_FILE_SCHEMA["fields"])}
            for c in carried
        ],
        extra_meta={"format-version": b"2"},
    )
    now_ms = int(time.time() * 1000)
    snapshot = {
        "snapshot-id": snapshot_id,
        "parent-snapshot-id": meta.get("current-snapshot-id"),
        "sequence-number": seq,
        "timestamp-ms": now_ms,
        "manifest-list": mlist_path,
        "schema-id": meta.get("current-schema-id") or 0,
        "summary": summary,
    }
    version = _metadata_version_of(meta, path) + 1
    new_meta = dict(meta)
    new_meta["last-sequence-number"] = seq
    new_meta["last-updated-ms"] = now_ms
    new_meta["current-snapshot-id"] = snapshot_id
    new_meta["partition-specs"] = specs
    new_meta["snapshots"] = list(meta.get("snapshots") or []) + [snapshot]
    new_meta["snapshot-log"] = list(meta.get("snapshot-log") or []) + [
        {"snapshot-id": snapshot_id, "timestamp-ms": now_ms}
    ]
    if meta.get("__pinned-file"):
        new_meta["metadata-log"] = list(meta.get("metadata-log") or []) + [
            {"metadata-file": meta["__pinned-file"],
             "timestamp-ms": int(meta.get("last-updated-ms") or 0)}
        ]
    _write_metadata_json(meta_dir, version, new_meta)
    return snapshot_id


def delete_where_iceberg(
    spark: SparkSession, path: str, condition: str
) -> Optional[int]:
    """Merge-on-read DELETE on an Iceberg v2 table: write positional
    delete files instead of rewriting data (the row-level-delete half of
    the reference mirror's Iceberg maintenance — moonlink keeps the
    exported warehouse current with deletes applied, reference
    README.md:13-17; the read side already honors these files,
    _files_from_manifests above).

    Unlike Delta DVs (which REPLACE a file's previous vector), Iceberg
    delete files ACCUMULATE: every content=1 file reachable from the
    current snapshot applies.  So a DELETE commits one NEW delete file
    holding only the newly matched (file_path, pos) rows and carries all
    prior manifests — data and delete alike — forward verbatim.

    Scale shape: the probe is one distributed scan (predicate pushed to
    parquet) anti-joined against existing deletes, and the delete rows
    are repartitioned by file_path and written sorted (file_path, pos)
    per the spec, executor-side.  The driver handles only the file
    LISTING — never a deleted position.  A no-op DELETE (no live rows
    match) commits nothing and returns None; otherwise returns the new
    snapshot id.
    """
    import shutil
    import time
    import uuid as _uuid

    import pyarrow.parquet as _pq

    from pg_mooncake_spark.sources.avro import read_avro, write_avro
    from pyspark.sql import functions as F

    meta = _latest_metadata(path)
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    current = meta.get("current-snapshot-id")
    snap = snaps.get(current)
    if snap is None or not snap.get("manifest-list"):
        raise IcebergSupportError(
            "DELETE needs a manifest-backed Iceberg table"
        )
    files, pos_deletes, eq_deletes = _files_from_manifests(path, snap)
    if eq_deletes:
        raise IcebergSupportError(
            "DELETE over tables carrying equality deletes not supported"
        )
    if not files:
        return None

    declared = _schema_from_metadata(meta)
    reader = spark.read.schema(declared) if declared is not None else spark.read
    data = reader.parquet(*[f["resolved"] for f in files]).select(
        "*",
        F.col("_metadata.file_path").alias("__fp"),
        F.col("_metadata.row_index").alias("__pos"),
    )
    mapping = spark.createDataFrame(
        [(f["recorded"], "file:" + os.path.abspath(f["resolved"])) for f in files],
        "file_path string, __fp string",
    )
    if pos_deletes:
        # probe only LIVE rows so a repeat DELETE is a true no-op
        old = (
            spark.read.parquet(*pos_deletes)
            .select("file_path", "pos")
            .join(F.broadcast(mapping), "file_path")
            .select("__fp", F.col("pos").alias("__pos"))
        )
        data = data.join(F.broadcast(old), ["__fp", "__pos"], "left_anti")
    matched = (
        data.where(condition)
        .join(F.broadcast(mapping), "__fp")
        .select("file_path", F.col("__pos").alias("pos"))
    )

    seq = int(meta.get("last-sequence-number") or 0) + 1
    snapshot_id = seq
    del_dir = os.path.join(path, "data", f"d{seq:05d}")
    (
        matched.repartition(F.col("file_path"))
        .sortWithinPartitions("file_path", "pos")
        .write.parquet(del_dir)
    )
    entries = []
    deleted_rows = 0
    for f in sorted(_glob.glob(os.path.join(del_dir, "part-*.parquet"))):
        n = _pq.ParquetFile(f).metadata.num_rows
        if n == 0:
            os.remove(f)
            continue
        deleted_rows += n
        entries.append(
            {
                "status": 1,  # ADDED
                "snapshot_id": snapshot_id,
                "sequence_number": None,  # inherited (v2 rule)
                "file_sequence_number": None,
                "data_file": {
                    "content": 1,  # positional deletes
                    "file_path": f,
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": n,
                    "file_size_in_bytes": os.path.getsize(f),
                },
            }
        )
    if not entries:
        shutil.rmtree(del_dir, ignore_errors=True)
        return None

    _, carried = read_avro(_resolve_path(snap["manifest-list"], path))
    return _commit_snapshot(
        path, meta, seq, snapshot_id,
        groups=[{
            "entries": entries, "content": b"deletes",
            "mlist_content": 1, "added_rows": deleted_rows,
        }],
        carried=carried,
        summary={
            "operation": "delete",
            "added-delete-files": str(len(entries)),
            "added-position-deletes": str(deleted_rows),
        },
    )


def delete_keys_iceberg(
    spark: SparkSession, path: str, keys_df: DataFrame
) -> Optional[int]:
    """CDC-style equality DELETE: drop every row whose key tuple appears
    in ``keys_df`` (columns must be a subset of the table schema) by
    writing v2 EQUALITY delete files — the form streaming/CDC writers
    (and the reference's moonlink maintaining its Iceberg mirror with
    replicated deletes, reference README.md:13-17) use, because the
    writer knows the keys but not the (file, position) of the victims.

    Per the spec the delete files carry the key columns plus
    ``equality_ids`` (the field ids of those columns) and apply only to
    data files with a LOWER data sequence number — rows appended after
    this commit with the same keys survive (the read side enforces this,
    _files_from_manifests/read_iceberg above).  No table scan at all:
    cost is O(keys), written executor-side; the driver handles only the
    file listing.  Returns the new snapshot id, or None for empty keys.
    """
    import time
    import uuid as _uuid

    import pyarrow.parquet as _pq

    from pg_mooncake_spark.sources.avro import read_avro, write_avro

    meta = _latest_metadata(path)
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    snap = snaps.get(meta.get("current-snapshot-id"))
    if snap is None or not snap.get("manifest-list"):
        raise IcebergSupportError("DELETE needs a manifest-backed Iceberg table")

    ids_by_name: dict[str, int] = {}
    for s in meta.get("schemas") or []:
        if s.get("schema-id") == meta.get("current-schema-id"):
            ids_by_name = {f["name"]: int(f["id"]) for f in s.get("fields", [])}
    unknown = [c for c in keys_df.columns if c not in ids_by_name]
    if unknown:
        raise IcebergSupportError(
            f"equality-delete key columns {unknown} not in table schema"
        )
    equality_ids = [ids_by_name[c] for c in keys_df.columns]

    seq = int(meta.get("last-sequence-number") or 0) + 1
    snapshot_id = seq
    del_dir = os.path.join(path, "data", f"e{seq:05d}")
    keys_df.dropDuplicates().sortWithinPartitions(
        *keys_df.columns
    ).write.parquet(del_dir)
    entries = []
    deleted_rows = 0
    for f in sorted(_glob.glob(os.path.join(del_dir, "part-*.parquet"))):
        n = _pq.ParquetFile(f).metadata.num_rows
        if n == 0:
            os.remove(f)
            continue
        deleted_rows += n
        entries.append(
            {
                "status": 1,
                "snapshot_id": snapshot_id,
                "sequence_number": None,  # inherited (v2 rule)
                "file_sequence_number": None,
                "data_file": {
                    "content": 2,  # equality deletes
                    "file_path": f,
                    "file_format": "PARQUET",
                    "partition": {},
                    "record_count": n,
                    "file_size_in_bytes": os.path.getsize(f),
                    "equality_ids": equality_ids,
                },
            }
        )
    if not entries:
        import shutil

        shutil.rmtree(del_dir, ignore_errors=True)
        return None

    _, carried = read_avro(_resolve_path(snap["manifest-list"], path))
    return _commit_snapshot(
        path, meta, seq, snapshot_id,
        groups=[{
            "entries": entries, "content": b"deletes",
            "mlist_content": 1, "added_rows": deleted_rows,
        }],
        carried=carried,
        summary={
            "operation": "delete",
            "added-delete-files": str(len(entries)),
            "added-equality-deletes": str(deleted_rows),
        },
    )


def upsert_keys_iceberg(
    spark: SparkSession, path: str, keys_df: DataFrame, rows_df: DataFrame
) -> Optional[int]:
    """CDC row-delta upsert in ONE snapshot: equality-delete every key in
    ``keys_df`` AND append ``rows_df``, committed atomically — the
    Iceberg spec's row-delta commit shape real streaming writers use.
    Two separate commits (delete, then append) expose an in-between
    state where updated rows are missing entirely, and a crash between
    them loses the batch's upserts (ADVICE r6); one snapshot does not.

    Sequence semantics: both manifests share the commit's sequence
    number N.  Equality deletes apply only to data files with data
    sequence < N, so the same-commit appended rows survive their own
    delete — exactly the spec rule the read side enforces.

    Emptiness is decided from the written parquet footers (pyarrow
    metadata on the driver), not an extra probe job.  Cost is O(keys +
    rows); the table is never scanned.  Returns the new snapshot id, or
    None when the batch is entirely empty (no commit)."""
    import shutil

    import pyarrow.parquet as _pq

    from pg_mooncake_spark.sources.avro import read_avro

    meta = _latest_metadata(path)
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    snap = snaps.get(meta.get("current-snapshot-id"))
    if snap is None or not snap.get("manifest-list"):
        raise IcebergSupportError("upsert needs a manifest-backed Iceberg table")

    ids_by_name: dict[str, int] = {}
    for s in meta.get("schemas") or []:
        if s.get("schema-id") == meta.get("current-schema-id"):
            ids_by_name = {f["name"]: int(f["id"]) for f in s.get("fields", [])}
    unknown = [c for c in keys_df.columns if c not in ids_by_name]
    if unknown:
        raise IcebergSupportError(
            f"equality-delete key columns {unknown} not in table schema"
        )
    equality_ids = [ids_by_name[c] for c in keys_df.columns]

    declared = _schema_from_metadata(meta)
    if declared is not None and set(rows_df.columns) != {
        f.name for f in declared.fields
    }:
        raise IcebergSchemaMismatchError(
            f"upsert row columns {sorted(rows_df.columns)} differ from table "
            f"schema {sorted(f.name for f in declared.fields)}; evolve the "
            "schema with write_iceberg(merge_schema=True) first"
        )
    if declared is not None:
        from pyspark.sql import functions as F

        rows_df = rows_df.select(
            *[F.col(f.name).cast(f.dataType).alias(f.name) for f in declared.fields]
        )

    part_cols = _spec_partition_cols(meta)
    part_fields = [
        {"name": p["name"], "ice_type": p["ice_type"],
         "field-id": p.get("field-id", 1000 + i)}
        for i, p in enumerate(part_cols)
    ]
    spec_fields = None
    for s in meta.get("partition-specs") or []:
        if s.get("spec-id") == int(meta.get("default-spec-id") or 0):
            spec_fields = s.get("fields")

    seq = int(meta.get("last-sequence-number") or 0) + 1
    snapshot_id = seq
    del_dir = os.path.join(path, "data", f"e{seq:05d}")
    data_dir = os.path.join(path, "data", f"s{seq:05d}")
    keys_df.dropDuplicates().sortWithinPartitions(
        *keys_df.columns
    ).write.parquet(del_dir)
    # equality deletes stay globally scoped (empty partition tuple, the
    # spec-sanctioned form for CDC writers); data files land partitioned
    staged_rows = _stage_data_files(rows_df, data_dir, part_cols)

    cur_schema = None
    for s in meta.get("schemas") or []:
        if s.get("schema-id") == meta.get("current-schema-id"):
            cur_schema = s

    def _entries(
        staged: list[tuple[str, dict]], content: int
    ) -> tuple[list[dict], int]:
        out, rows = [], 0
        for f, part_values in staged:
            n = _pq.ParquetFile(f).metadata.num_rows
            if n == 0:
                os.remove(f)
                continue
            rows += n
            data_file = {
                "content": content,
                "file_path": f,
                "file_format": "PARQUET",
                "partition": part_values,
                "record_count": n,
                "file_size_in_bytes": os.path.getsize(f),
            }
            if content == 2:
                data_file["equality_ids"] = equality_ids
            else:
                data_file.update(_column_stats_maps(f, cur_schema))
            out.append(
                {
                    "status": 1,
                    "snapshot_id": snapshot_id,
                    "sequence_number": None,  # inherited (v2 rule)
                    "file_sequence_number": None,
                    "data_file": data_file,
                }
            )
        return out, rows

    del_entries, deleted_rows = _entries(
        [
            (f, {})
            for f in sorted(_glob.glob(os.path.join(del_dir, "part-*.parquet")))
        ],
        content=2,
    )
    data_entries, added_rows = _entries(staged_rows, content=0)
    if not del_entries and not data_entries:
        shutil.rmtree(del_dir, ignore_errors=True)
        shutil.rmtree(data_dir, ignore_errors=True)
        return None

    groups = []
    if del_entries:
        groups.append(
            {
                "entries": del_entries, "content": b"deletes",
                "mlist_content": 1, "added_rows": deleted_rows,
            }
        )
    if data_entries:
        groups.append(
            {
                "entries": data_entries, "content": b"data",
                "mlist_content": 0, "added_rows": added_rows,
                "entry_schema": _entry_schema(part_fields),
                "spec_fields": spec_fields,
            }
        )
    _, carried = read_avro(_resolve_path(snap["manifest-list"], path))
    return _commit_snapshot(
        path, meta, seq, snapshot_id, groups=groups, carried=carried,
        summary={
            "operation": "overwrite",
            "added-delete-files": str(len(del_entries)),
            "added-equality-deletes": str(deleted_rows),
            "added-data-files": str(len(data_entries)),
            "added-records": str(added_rows),
        },
    )


def compact_iceberg(
    spark: SparkSession,
    path: str,
    target_files: Optional[int] = None,
    sort_by: Optional[list[str]] = None,
    zorder_by: Optional[list[str]] = None,
    zorder_method: str = "linear",
) -> int:
    """OPTIMIZE-style rewrite: materialize the current state (positional
    deletes folded in — the rewritten files hold only surviving rows)
    and commit a REPLACE snapshot whose manifest list references ONLY the
    new data manifest.  The closing step of the merge-on-read lifecycle:
    accumulate cheap delete files, then fold them into clean files in
    one maintenance pass (the Iceberg twin of compact_delta).

    ``sort_by`` range-clusters the rewrite (spec 'Sorting'): files get
    DISJOINT value ranges on the sort columns, so the manifest
    lower/upper bounds this writer already records give external
    readers maximal min/max file skipping.  The sort order is
    registered in ``sort-orders`` metadata (identity transforms, asc,
    nulls-first — matching the physical asc-nulls-first sort) and each
    rewritten data file is stamped with its ``sort_order_id``.
    Partitioned tables sort WITHIN partition clusters.

    ``zorder_by`` clusters on the Morton interleave of SEVERAL columns
    instead (functions/zorder.py) — a range_filter on ANY of them then
    skips most files, where a linear sort only helps its leading
    column.  Mutually exclusive with ``sort_by``; not representable in
    ``sort-orders`` metadata (the spec has no z transform), the benefit
    rides entirely on the per-file column bounds.

    Prior snapshots stay readable (their manifest chains are untouched)
    until expire_snapshots reclaims them.  Returns the new snapshot id.
    """
    import time
    import uuid as _uuid

    import pyarrow.parquet as _pq

    from pg_mooncake_spark.sources.avro import write_avro

    meta = _latest_metadata(path)
    part_cols = _spec_partition_cols(meta)
    part_fields = [
        {"name": p["name"], "ice_type": p["ice_type"],
         "field-id": p.get("field-id", 1000 + i)}
        for i, p in enumerate(part_cols)
    ]
    spec_fields = None
    for s in meta.get("partition-specs") or []:
        if s.get("spec-id") == int(meta.get("default-spec-id") or 0):
            spec_fields = s.get("fields")
    if sort_by and zorder_by:
        raise IcebergSupportError("sort_by and zorder_by are mutually exclusive")
    cur_schema_fields = {}
    for s in meta.get("schemas") or []:
        if s.get("schema-id") == meta.get("current-schema-id"):
            cur_schema_fields = {
                f["name"]: int(f["id"]) for f in s.get("fields") or []
            }
    sort_order_id = None
    if sort_by:
        bad = [c for c in sort_by if c not in cur_schema_fields]
        if bad:
            raise IcebergSupportError(
                f"sort_by columns {bad} not in table schema"
            )
        want = [
            {
                "transform": "identity",
                "source-id": cur_schema_fields[c],
                "direction": "asc",
                "null-order": "nulls-first",
            }
            for c in sort_by
        ]
        orders = list(meta.get("sort-orders") or [])
        for o in orders:
            if o.get("fields") == want:
                sort_order_id = int(o["order-id"])
        if sort_order_id is None:
            sort_order_id = (
                max((int(o.get("order-id") or 0) for o in orders), default=0)
                + 1
            )
            orders.append({"order-id": sort_order_id, "fields": want})
        meta = dict(meta)
        meta["sort-orders"] = orders
        meta["default-sort-order-id"] = sort_order_id

    df = read_iceberg(spark, path)
    if part_cols:
        # cluster the rewrite on the DERIVED partition values so each
        # partition compacts to few files instead of target_files shards
        # apiece (hashing the raw source column would scatter a day's
        # rows across tasks for temporal transforms)
        df = df.repartition(
            *([target_files] if target_files is not None else []),
            *[_staging_expr(p) for p in part_cols],
        )
        if sort_by:
            df = df.sortWithinPartitions(*sort_by)
        elif zorder_by:
            from pg_mooncake_spark.functions.zorder import zorder_key

            df = df.sortWithinPartitions(
                zorder_key(df, list(zorder_by), method=zorder_method)
            )
    elif sort_by:
        # range partitioning gives files DISJOINT sort-key ranges (the
        # point of a sorted rewrite: stats-based skipping), then an
        # in-partition sort clusters rows inside each file
        df = df.repartitionByRange(
            *([target_files] if target_files is not None else []),
            *sort_by,
        ).sortWithinPartitions(*sort_by)
    elif zorder_by:
        from pg_mooncake_spark.functions.zorder import zorder_key

        zk = zorder_key(df, list(zorder_by), method=zorder_method)
        df = df.repartitionByRange(
            *([target_files] if target_files is not None else []),
            zk,
        ).sortWithinPartitions(zk)
    elif target_files is not None:
        df = df.repartition(target_files)

    seq = int(meta.get("last-sequence-number") or 0) + 1
    snapshot_id = seq
    data_dir = os.path.join(path, "data", f"s{seq:05d}")
    staged = _stage_data_files(df, data_dir, part_cols)

    cur_schema = None
    for s in meta.get("schemas") or []:
        if s.get("schema-id") == meta.get("current-schema-id"):
            cur_schema = s
    entries = []
    added_rows = 0
    for f, part_values in staged:
        n = _pq.ParquetFile(f).metadata.num_rows
        if n == 0:
            os.remove(f)
            continue
        added_rows += n
        data_file = {
            "content": 0,
            "file_path": f,
            "file_format": "PARQUET",
            "partition": part_values,
            "record_count": n,
            "file_size_in_bytes": os.path.getsize(f),
        }
        if sort_order_id is not None:
            data_file["sort_order_id"] = sort_order_id
        data_file.update(_column_stats_maps(f, cur_schema))
        entries.append(
            {
                "status": 1,
                "snapshot_id": snapshot_id,
                "sequence_number": None,
                "file_sequence_number": None,
                "data_file": data_file,
            }
        )

    return _commit_snapshot(
        path, meta, seq, snapshot_id,
        groups=[{
            "entries": entries, "content": b"data",
            "mlist_content": 0, "added_rows": added_rows,
            "entry_schema": _entry_schema(part_fields),
            "spec_fields": spec_fields,
        }],
        carried=[],
        summary={
            "operation": "replace",
            "added-data-files": str(len(entries)),
            "added-records": str(added_rows),
        },
    )


def expire_snapshots(path: str, retain_last: int = 1) -> list[str]:
    """Expire all but the last ``retain_last`` snapshots and physically
    delete files reachable ONLY from the expired ones — data parquet,
    delete parquet, manifest and manifest-list Avro (Iceberg's
    expire_snapshots + orphan cleanup, and vacuum_delta's twin).  Time
    travel to expired snapshots stops working; that is the contract.

    Driver work is proportional to manifest count + file count, the same
    O(#files) walk the real maintenance procedure performs.  Returns the
    deleted paths.
    """
    import time

    from pg_mooncake_spark.sources.avro import read_avro

    meta = _latest_metadata(path)
    snaps = list(meta.get("snapshots") or [])
    if retain_last < 1:
        raise IcebergSupportError("retain_last must be >= 1")
    if len(snaps) <= retain_last:
        return []
    retained = snaps[-retain_last:]

    reachable: set[str] = set()
    for s in retained:
        mlist = _resolve_path(s["manifest-list"], path)
        reachable.add(os.path.normpath(mlist))
        _, manifests = read_avro(mlist)
        for m in manifests:
            mp = _resolve_path(m["manifest_path"], path)
            reachable.add(os.path.normpath(mp))
            _, entries = read_avro(mp)
            for e in entries:
                df_ = e.get("data_file") or {}
                if df_.get("file_path"):
                    reachable.add(
                        os.path.normpath(_resolve_path(df_["file_path"], path))
                    )

    deleted: list[str] = []
    data_root = os.path.join(path, "data")
    for root, _dirs, files in os.walk(data_root):
        for f in files:
            full = os.path.normpath(os.path.join(root, f))
            if f.endswith(".parquet") and full not in reachable:
                os.remove(full)
                deleted.append(full)
    meta_dir = os.path.join(path, "metadata")
    for f in os.listdir(meta_dir):
        if not f.endswith(".avro"):
            continue
        full = os.path.normpath(os.path.join(meta_dir, f))
        if full not in reachable:
            os.remove(full)
            deleted.append(full)

    now_ms = int(time.time() * 1000)
    retained_ids = {s["snapshot-id"] for s in retained}
    version = _metadata_version_of(meta, path) + 1
    new_meta = dict(meta)
    new_meta["snapshots"] = retained
    new_meta["snapshot-log"] = [
        e
        for e in (meta.get("snapshot-log") or [])
        if e.get("snapshot-id") in retained_ids
    ]
    new_meta["last-updated-ms"] = now_ms
    _write_metadata_json(meta_dir, version, new_meta)
    return deleted


def _write_metadata_json(meta_dir: str, version: int, meta: dict) -> None:
    """Commit one metadata version atomically WITHOUT clobbering —
    the put-if-absent barrier every Iceberg catalog provides, so two
    concurrent committers serialize instead of silently overwriting
    each other's snapshot.  Goes through the fsio seam: locally a
    hard-link EEXIST, on an object store a conditional PUT (the
    rename-free commit an Iceberg REST/Hadoop catalog performs).  The
    version hint is an atomic overwrite (advisory — readers fall back
    to listing)."""
    from pg_mooncake_spark.fsio import CommitConflict, get_backend

    backend = get_backend(meta_dir)
    final = os.path.join(meta_dir, f"v{version}.metadata.json")
    data = json.dumps(
        {k: v for k, v in meta.items() if not k.startswith("__")}
    ).encode("utf-8")
    try:
        backend.put_if_absent(final, data)
    except CommitConflict:
        raise IcebergSupportError(
            f"concurrent commit at metadata version {version}"
        ) from None
    backend.write_atomic(
        os.path.join(meta_dir, "version-hint.text"), str(version).encode()
    )


def _metadata_version_of(meta: dict, path: str) -> int:
    """Version the replayed ``meta`` came from.  Prefers the version
    pinned at load time by ``_latest_metadata`` — commit paths must
    derive next-version from the LOADED version, so an intervening
    commit makes the put-if-absent link fail instead of being silently
    superseded.  Falls back to the on-disk max only for meta dicts that
    never went through ``_latest_metadata`` (fresh creates)."""
    pinned = meta.get("__pinned-version")
    if pinned is not None:
        return int(pinned)
    meta_dir = os.path.join(path, "metadata")
    return max(
        (_metadata_version(f) for f in os.listdir(meta_dir)
         if f.endswith(".metadata.json")),
        default=0,
    )


def iceberg_changelog(
    spark: SparkSession,
    path: str,
    from_snapshot_id: int,
    to_snapshot_id: Optional[int] = None,
) -> DataFrame:
    """Incremental changelog scan between two snapshots — the manifest-
    chain analog of Iceberg's changelog view (Spark's
    ``create_changelog_view`` procedure): table columns +
    ``_change_type`` ∈ {insert, delete} + ``_commit_snapshot_id`` +
    ``_commit_timestamp`` for every snapshot AFTER ``from_snapshot_id``
    up to and including ``to_snapshot_id`` (default: current).

    Per snapshot, changes derive from the manifest diff against its
    parent:

    - data files ADDED → their rows as ``insert`` (raw parquet scan —
      same-snapshot delete files never apply to them by the sequence-
      number rule);
    - equality-delete files ADDED → pre-images recovered by joining the
      deleted keys against the PARENT snapshot's state (the full
      read path: partition pruning, earlier deletes applied), so
      downstream consumers see complete deleted rows, not just keys —
      this is the mirror-export sync's own commit shape (one atomic
      row-delta: deletes + appends), so an attached export's changelog
      replays the mirror's CDC stream;
    - a ``replace`` (compaction) snapshot contributes nothing;
    - copy-on-write snapshots that REMOVE data files emit the removed
      files' rows as ``delete`` and the added as ``insert`` (the raw
      file-delta, same as Iceberg's non-net changelog for overwrites);
    - positional-delete files added in range are refused (the export
      sync never writes them; a general table might).

    An update therefore appears as delete(pre-image) + insert(new row).
    Driver work is O(manifest entries); every row stays executor-side.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    meta = _latest_metadata(path)
    snaps = {s["snapshot-id"]: s for s in meta.get("snapshots", [])}
    if to_snapshot_id is None:
        to_snapshot_id = meta.get("current-snapshot-id")
    if to_snapshot_id not in snaps:
        raise IcebergSupportError(f"unknown snapshot {to_snapshot_id}")
    if from_snapshot_id not in snaps:
        raise IcebergSupportError(f"unknown snapshot {from_snapshot_id}")
    # walk the parent chain to order the range (newest → oldest)
    chain: list[dict] = []
    cur = snaps[to_snapshot_id]
    while True:
        if cur["snapshot-id"] == from_snapshot_id:
            break
        chain.append(cur)
        parent = cur.get("parent-snapshot-id")
        if parent is None or parent not in snaps:
            raise IcebergSupportError(
                f"snapshot {from_snapshot_id} is not an ancestor of "
                f"{to_snapshot_id}"
            )
        cur = snaps[parent]
    chain.reverse()

    declared = _schema_from_metadata(meta)
    if declared is None:
        raise IcebergSupportError("table metadata lacks a schema")
    names_by_id = _field_names_by_id(meta)
    out_fields = list(declared.fields) + [
        T.StructField("_change_type", T.StringType(), True),
        T.StructField("_commit_snapshot_id", T.LongType(), True),
        T.StructField("_commit_timestamp", T.LongType(), True),
    ]
    out_cols = [f.name for f in out_fields]
    parts: list[DataFrame] = []
    # rename-aware raw scans: files written before a column rename store
    # data under the old physical name; resolve per era by field id,
    # same as the read path
    eras = _rename_eras(meta)
    cur_names = dict(names_by_id)

    def _raw_rows(file_dicts: list[dict]) -> DataFrame:
        if eras:
            return _era_union_scan(
                spark, declared, file_dicts, eras, cur_names
            ).drop("__fp", "__pos")
        return spark.read.schema(declared).parquet(
            *[f["resolved"] for f in file_dicts]
        )

    prev_cache: dict[int, tuple] = {}

    def _file_sets(snap: dict) -> tuple:
        sid = snap["snapshot-id"]
        if sid not in prev_cache:
            prev_cache[sid] = _files_from_manifests(path, snap)
        return prev_cache[sid]

    for snap in chain:
        op = (snap.get("summary") or {}).get("operation")
        if op == "replace":
            continue
        sid = int(snap["snapshot-id"])
        ts = int(snap.get("timestamp-ms") or 0)
        parent_id = snap.get("parent-snapshot-id")
        if parent_id is not None and parent_id in snaps:
            p_files, p_pos, p_eq = _file_sets(snaps[parent_id])
        else:
            p_files, p_pos, p_eq = [], [], []
        files, pos, eq = _file_sets(snap)
        p_paths = {f["recorded"] for f in p_files}
        p_eq_paths = {d["resolved"] for d in p_eq}
        cur_paths = {f["recorded"] for f in files}
        added = [f for f in files if f["recorded"] not in p_paths]
        removed = [f for f in p_files if f["recorded"] not in cur_paths]
        new_eq = [d for d in eq if d["resolved"] not in p_eq_paths]
        new_pos = [q for q in pos if q not in set(p_pos)]
        if new_pos:
            raise IcebergSupportError(
                f"snapshot {sid} added positional-delete files; its "
                "changelog cannot be derived"
            )

        def _tag(df: DataFrame, ct: str) -> DataFrame:
            return (
                df.withColumn("_change_type", F.lit(ct))
                .withColumn("_commit_snapshot_id", F.lit(sid).cast("long"))
                .withColumn("_commit_timestamp", F.lit(ts).cast("long"))
                .select(*out_cols)
            )

        if added:
            parts.append(_tag(_raw_rows(added), "insert"))
        if new_eq and parent_id is not None:
            parent_state = read_iceberg(spark, path, snapshot_id=int(parent_id))
            decl_by_name = {f.name: f for f in declared.fields}
            for d in new_eq:
                key_cols = [names_by_id[i] for i in d["equality_ids"]]
                # delete files written before a rename store the era's
                # physical names: reading them with the CURRENT names
                # would resolve-by-name to all-NULL and silently drop
                # every delete event of that snapshot — resolve by
                # field id at the file's sequence, alias to current
                if eras:
                    era_n = _era_names_for_seq(eras, d["seq"])
                    phys_cols = [
                        era_n.get(i, names_by_id[i])
                        for i in d["equality_ids"]
                    ]
                else:
                    phys_cols = key_cols
                key_schema = T.StructType(
                    [
                        T.StructField(p, decl_by_name[c].dataType, True)
                        for p, c in zip(phys_cols, key_cols)
                    ]
                )
                keys = (
                    spark.read.schema(key_schema)
                    .parquet(d["resolved"])
                    .select(
                        *[
                            F.col(p).alias(c)
                            for p, c in zip(phys_cols, key_cols)
                        ]
                    )
                )
                parts.append(
                    _tag(
                        parent_state.join(keys, on=key_cols, how="leftsemi"),
                        "delete",
                    )
                )
        if removed:
            parts.append(_tag(_raw_rows(removed), "delete"))
    if not parts:
        return spark.createDataFrame([], T.StructType(out_fields))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def iceberg_metadata_table(
    spark: SparkSession, path: str, kind: str
) -> DataFrame:
    """The Iceberg metadata-table surface (``SELECT * FROM tbl$files``
    etc.) over the manifest chain — the operational introspection every
    Iceberg deployment leans on:

    - ``snapshots``: one row per snapshot (id, parent, sequence number,
      timestamp, operation, summary);
    - ``history``: the snapshot-log (current-lineage timeline);
    - ``manifests``: the CURRENT snapshot's manifest list;
    - ``files``: the CURRENT snapshot's live data/delete files with
      per-file record counts and content class.

    All driver work is O(metadata); the result is a small DataFrame
    built from the JSON/Avro chain, never a data-file scan."""
    from pyspark.sql import types as T

    from pg_mooncake_spark.sources.avro import read_avro

    meta = _latest_metadata(path)
    if kind == "snapshots":
        rows = [
            (
                int(s["snapshot-id"]),
                int(s["parent-snapshot-id"])
                if s.get("parent-snapshot-id") is not None
                else None,
                int(s.get("sequence-number") or 0),
                int(s.get("timestamp-ms") or 0),
                (s.get("summary") or {}).get("operation"),
                {k: str(v) for k, v in (s.get("summary") or {}).items()},
            )
            for s in meta.get("snapshots") or []
        ]
        return spark.createDataFrame(
            rows,
            T.StructType(
                [
                    T.StructField("snapshot_id", T.LongType(), False),
                    T.StructField("parent_id", T.LongType(), True),
                    T.StructField("sequence_number", T.LongType(), True),
                    T.StructField("committed_at_ms", T.LongType(), True),
                    T.StructField("operation", T.StringType(), True),
                    T.StructField(
                        "summary", T.MapType(T.StringType(), T.StringType()), True
                    ),
                ]
            ),
        )
    if kind == "history":
        rows = [
            (int(e["snapshot-id"]), int(e.get("timestamp-ms") or 0))
            for e in meta.get("snapshot-log") or []
        ]
        return spark.createDataFrame(
            rows, "snapshot_id long, made_current_at_ms long"
        )
    snap_id = meta.get("current-snapshot-id")
    snap = next(
        (s for s in meta.get("snapshots") or [] if s["snapshot-id"] == snap_id),
        None,
    )
    if snap is None:
        raise IcebergSupportError("table has no current snapshot")
    if kind == "manifests":
        _, manifests = read_avro(_resolve_path(snap["manifest-list"], path))
        rows = [
            (
                m["manifest_path"],
                int(m.get("manifest_length") or 0),
                int(m.get("partition_spec_id") or 0),
                int(m.get("content") or 0),
                int(m.get("sequence_number") or 0),
            )
            for m in manifests
        ]
        return spark.createDataFrame(
            rows,
            "path string, length long, partition_spec_id long, "
            "content long, sequence_number long",
        )
    if kind == "files":
        _, manifests = read_avro(_resolve_path(snap["manifest-list"], path))
        rows = []
        for m in manifests:
            _, entries = read_avro(_resolve_path(m["manifest_path"], path))
            for e in entries:
                if int(e.get("status") or 0) == 2:  # DELETED
                    continue
                df_ = e.get("data_file") or {}
                rows.append(
                    (
                        df_.get("file_path"),
                        int(df_.get("content") or 0),
                        int(df_.get("record_count") or 0),
                        int(df_.get("file_size_in_bytes") or 0),
                    )
                )
        return spark.createDataFrame(
            rows,
            "file_path string, content long, record_count long, "
            "file_size_bytes long",
        )
    raise IcebergSupportError(
        f"unknown metadata table {kind!r}: expected snapshots/history/"
        "manifests/files"
    )
