"""Minimal Delta Lake table support without the delta-spark jars.

SURVEY.md §2.B contracts: "Read external Delta Lake table" and "Write
Delta Lake table" (reference CHANGELOG.md:25-27).  The runtime image has
no delta-spark package, so this module implements the subset of the
public Delta transaction-log protocol (github.com/delta-io/delta
PROTOCOL.md) those contracts need:

- **read**: replay the log — starting from the ``_last_checkpoint``
  parquet snapshot when one exists, then the JSON tail — up to an
  optional ``version_as_of``, and scan the surviving Parquet files with
  the schema from the latest ``metaData`` action (schemaString is the
  Spark StructType JSON — Spark-native round trip).  Partitioned tables
  reconstruct partition columns from each add action's
  ``partitionValues`` (the protocol's source of truth — directory
  layout is advisory only);
- **write/append**: stage Parquet via Spark executors, then commit one
  atomic log entry (protocol + metaData on create, add actions per
  file).  Every 10th commit also writes a protocol-conformant parquet
  checkpoint + ``_last_checkpoint``, like the reference implementation.
  Commits use rename-into-place, the same atomicity the real
  implementation relies on for local/HDFS stores.

Unsupported (loud errors, not silent wrongness): deletion vectors /
reader version > 1, column mapping.  When the real delta-spark jars ARE
on the classpath, ``spark.read.format("delta")`` supersedes this module;
the engine prefers it automatically (``have_delta_jars``).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_LOG = "_delta_log"
CHECKPOINT_INTERVAL = 10


class DeltaProtocolError(RuntimeError):
    pass


def have_delta_jars(spark: SparkSession) -> bool:
    """True if the real delta-spark implementation is available."""
    try:
        spark.read.format("delta")
        jvm = spark._jvm
        jvm.Class.forName("org.apache.spark.sql.delta.DeltaLog")
        return True
    except Exception:
        return False


def _log_files(path: str) -> list[tuple[int, str]]:
    log_dir = os.path.join(path, _LOG)
    if not os.path.isdir(log_dir):
        raise DeltaProtocolError(f"not a Delta table (no {_LOG}): {path}")
    out = []
    for f in os.listdir(log_dir):
        if f.endswith(".json") and f[:-5].isdigit():
            out.append((int(f[:-5]), os.path.join(log_dir, f)))
    return sorted(out)


def _last_checkpoint(path: str) -> Optional[dict]:
    lc = os.path.join(path, _LOG, "_last_checkpoint")
    if not os.path.exists(lc):
        return None
    with open(lc) as fh:
        return json.loads(fh.read())


def _checkpoint_paths(path: str, version: int, parts: Optional[int]) -> list[str]:
    log_dir = os.path.join(path, _LOG)
    if parts:
        return [
            os.path.join(
                log_dir,
                f"{version:020d}.checkpoint.{i + 1:010d}.{parts:010d}.parquet",
            )
            for i in range(parts)
        ]
    return [os.path.join(log_dir, f"{version:020d}.checkpoint.parquet")]


class _State:
    """Log-replay accumulator: live adds keyed by file path + metadata."""

    SUPPORTED_READER_FEATURES = {"columnMapping", "timestampNtz"}

    def __init__(self) -> None:
        self.files: dict[str, dict] = {}  # path -> add action dict
        self.schema_json: Optional[str] = None
        self.partition_cols: list[str] = []
        self.configuration: dict[str, str] = {}
        self.last_v = -1

    def apply_meta(self, md: dict) -> None:
        self.schema_json = md["schemaString"]
        self.partition_cols = list(md.get("partitionColumns") or [])
        self.configuration = dict(md.get("configuration") or {})

    def apply_protocol(self, p: dict) -> None:
        v = p.get("minReaderVersion", 1)
        if v <= 1:
            return
        if v == 2:  # column mapping era — handled at read time
            return
        features = set(p.get("readerFeatures") or [])
        unsupported = features - self.SUPPORTED_READER_FEATURES
        if v > 3 or unsupported:
            raise DeltaProtocolError(
                f"reader version {v} requires features {sorted(unsupported)} "
                "this reader lacks (e.g. deletion vectors)"
            )

    def apply_add(self, add: dict) -> None:
        if add.get("deletionVector"):
            raise DeltaProtocolError("deletion vectors not supported")
        self.files[add["path"]] = add

    def apply_remove(self, remove: dict) -> None:
        self.files.pop(remove["path"], None)


def _load_checkpoint(state: _State, path: str, version: int, parts: Optional[int]) -> None:
    """Seed replay state from a checkpoint parquet (read via pyarrow —
    the action list is driver-side metadata, no Spark job needed)."""
    import pyarrow.parquet as pq

    for cp_path in _checkpoint_paths(path, version, parts):
        if not os.path.exists(cp_path):
            raise DeltaProtocolError(f"_last_checkpoint points at missing {cp_path}")
        rows = pq.read_table(cp_path).to_pylist()
        for row in rows:
            if row.get("protocol"):
                state.apply_protocol(row["protocol"])
            if row.get("metaData"):
                md = dict(row["metaData"])
                if isinstance(md.get("partitionColumns"), str):
                    md["partitionColumns"] = json.loads(md["partitionColumns"])
                state.apply_meta(md)
            if row.get("add"):
                add = dict(row["add"])
                pv = add.get("partitionValues")
                if isinstance(pv, list):  # pyarrow map -> list of (k, v)
                    add["partitionValues"] = dict(pv)
                state.apply_add(add)
            if row.get("remove"):
                state.apply_remove(row["remove"])
    state.last_v = version


def _replay(
    path: str, version_as_of: Optional[int] = None
) -> tuple[list[dict], T.StructType, list[str], "_State"]:
    """Replay the log: (live add actions, schema, partition cols, version).

    Starts from the newest eligible checkpoint (≤ version_as_of) and
    replays the JSON tail after it.  Time travel below the checkpoint
    falls back to a JSON-from-v0 replay and refuses if the early log was
    vacuumed away.
    """
    state = _State()
    logs = _log_files(path)
    cp = _last_checkpoint(path)
    start_after = -1
    if cp is not None and (version_as_of is None or cp["version"] <= version_as_of):
        _load_checkpoint(state, path, cp["version"], cp.get("parts"))
        start_after = cp["version"]
    elif cp is not None:
        # time travel below the checkpoint: need the JSON history from v0
        if not logs or logs[0][0] != 0:
            raise DeltaProtocolError(
                f"version {version_as_of} predates checkpoint "
                f"{cp['version']} and the early JSON log is gone"
            )
    if not logs and cp is None:
        raise DeltaProtocolError(f"empty Delta log at {path}")

    for v, log_file in logs:
        if v <= start_after:
            continue
        if version_as_of is not None and v > version_as_of:
            break
        state.last_v = v
        with open(log_file) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "metaData" in action:
                    state.apply_meta(action["metaData"])
                elif "protocol" in action:
                    state.apply_protocol(action["protocol"])
                elif "add" in action:
                    state.apply_add(action["add"])
                elif "remove" in action:
                    state.apply_remove(action["remove"])
    if version_as_of is not None and state.last_v < version_as_of:
        raise DeltaProtocolError(
            f"version {version_as_of} not in log (latest {state.last_v})"
        )
    if state.schema_json is None:
        raise DeltaProtocolError("no metaData action found in Delta log")
    schema = T.StructType.fromJson(json.loads(state.schema_json))
    return list(state.files.values()), schema, state.partition_cols, state


def _physical_schema(schema_json: dict) -> dict:
    """schemaString JSON rewritten to physical column names (column
    mapping 'name' mode): every struct field renames to its
    delta.columnMapping.physicalName, recursively."""

    def walk_type(t):
        if isinstance(t, dict):
            if t.get("type") == "struct":
                return {"type": "struct", "fields": [walk_field(f) for f in t["fields"]]}
            if t.get("type") == "array":
                return {**t, "elementType": walk_type(t["elementType"])}
            if t.get("type") == "map":
                return {
                    **t,
                    "keyType": walk_type(t["keyType"]),
                    "valueType": walk_type(t["valueType"]),
                }
        return t

    def walk_field(f):
        md = f.get("metadata") or {}
        return {
            **f,
            "name": md.get("delta.columnMapping.physicalName", f["name"]),
            "type": walk_type(f["type"]),
            "metadata": {},
        }

    return {"type": "struct", "fields": [walk_field(f) for f in schema_json["fields"]]}


def read_delta(
    spark: SparkSession, path: str, version_as_of: Optional[int] = None
) -> DataFrame:
    """Read a Delta table (optionally time-traveled) as a DataFrame.

    Partitioned tables: data files lack the partition columns, so each
    file group is scanned with the data schema and its partition values
    (from the add actions) are re-attached as typed literals — per the
    protocol, never inferred from directory names.
    """
    if have_delta_jars(spark):  # pragma: no cover - jars absent in image
        reader = spark.read.format("delta")
        if version_as_of is not None:
            reader = reader.option("versionAsOf", version_as_of)
        return reader.load(path)
    adds, schema, partition_cols, st = _replay(path, version_as_of)
    if not adds:
        return spark.createDataFrame([], schema)
    mode = st.configuration.get("delta.columnMapping.mode") or "none"
    if mode == "none":
        phys_schema, phys_of = schema, {f.name: f.name for f in schema.fields}
    elif mode == "name":
        # parquet files carry PHYSICAL column names; the logical names
        # live only in schemaString field metadata.  Read physically,
        # then cast back — struct casts rename nested fields by position.
        sjson = json.loads(st.schema_json)
        phys_schema = T.StructType.fromJson(_physical_schema(sjson))
        phys_of = {
            f["name"]: (f.get("metadata") or {}).get(
                "delta.columnMapping.physicalName", f["name"]
            )
            for f in sjson["fields"]
        }
    else:
        raise DeltaProtocolError(
            f"column mapping mode {mode!r} not supported (parquet field-id "
            "resolution needs the delta-spark jars)"
        )

    def logical(df):
        return df.select(
            *[
                F.col(phys_of[f.name]).cast(f.dataType).alias(f.name)
                for f in schema.fields
            ]
        )

    if not partition_cols:
        paths = [os.path.join(path, a["path"]) for a in adds]
        return logical(spark.read.schema(phys_schema).parquet(*paths))

    # partitionValues keys use physical names under column mapping
    phys_parts = [phys_of[c] for c in partition_cols]
    data_schema = T.StructType(
        [f for f in phys_schema.fields if f.name not in phys_parts]
    )
    ptypes = {f.name: f.dataType for f in schema.fields if f.name in partition_cols}
    groups: dict[tuple, list[str]] = {}
    for a in adds:
        pv = a.get("partitionValues") or {}
        key = tuple(pv.get(c) for c in phys_parts)
        groups.setdefault(key, []).append(os.path.join(path, a["path"]))
    parts = []
    for key, paths in groups.items():
        df = spark.read.schema(data_schema).parquet(*paths)
        for c, pc, val in zip(partition_cols, phys_parts, key):
            lit = F.lit(None) if val is None else F.lit(val)
            df = df.withColumn(pc, lit.cast(ptypes[c]))
        parts.append(logical(df))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def delta_version(path: str) -> int:
    return _replay(path)[3].last_v


def _commit(path: str, version: int, actions: list[dict[str, Any]]) -> None:
    log_dir = os.path.join(path, _LOG)
    os.makedirs(log_dir, exist_ok=True)
    final = os.path.join(log_dir, f"{version:020d}.json")
    if os.path.exists(final):
        raise DeltaProtocolError(f"concurrent commit at version {version}")
    tmp = final + f".tmp.{uuid.uuid4().hex}"
    with open(tmp, "w") as fh:
        for a in actions:
            fh.write(json.dumps(a) + "\n")
    os.rename(tmp, final)  # atomicity barrier


def write_checkpoint(path: str, version: Optional[int] = None) -> str:
    """Write a protocol-conformant parquet checkpoint of the table state
    at ``version`` (default latest) plus ``_last_checkpoint``.

    One row per action (protocol, metaData, each live add) with the
    standard nested-struct columns, so the real delta implementation can
    consume it and vice versa.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    adds, schema, partition_cols, st = _replay(path, version)
    v = st.last_v
    kv = pa.map_(pa.string(), pa.string())
    cp_schema = pa.schema(
        [
            pa.field(
                "protocol",
                pa.struct(
                    [
                        pa.field("minReaderVersion", pa.int32()),
                        pa.field("minWriterVersion", pa.int32()),
                    ]
                ),
            ),
            pa.field(
                "metaData",
                pa.struct(
                    [
                        pa.field("id", pa.string()),
                        pa.field(
                            "format",
                            pa.struct(
                                [
                                    pa.field("provider", pa.string()),
                                    pa.field("options", kv),
                                ]
                            ),
                        ),
                        pa.field("schemaString", pa.string()),
                        pa.field("partitionColumns", pa.list_(pa.string())),
                        pa.field("configuration", kv),
                        pa.field("createdTime", pa.int64()),
                    ]
                ),
            ),
            pa.field(
                "add",
                pa.struct(
                    [
                        pa.field("path", pa.string()),
                        pa.field("partitionValues", kv),
                        pa.field("size", pa.int64()),
                        pa.field("modificationTime", pa.int64()),
                        pa.field("dataChange", pa.bool_()),
                    ]
                ),
            ),
        ]
    )
    rows: list[dict] = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": str(uuid.uuid4()),
                "format": {"provider": "parquet", "options": []},
                "schemaString": json.dumps(schema.jsonValue()),
                "partitionColumns": partition_cols,
                "configuration": [],
                "createdTime": int(time.time() * 1000),
            }
        },
    ]
    for a in adds:
        rows.append(
            {
                "add": {
                    "path": a["path"],
                    "partitionValues": sorted(
                        (a.get("partitionValues") or {}).items()
                    ),
                    "size": a.get("size", 0),
                    "modificationTime": a.get("modificationTime", 0),
                    "dataChange": False,
                }
            }
        )
    table = pa.Table.from_pylist(rows, schema=cp_schema)
    cp_path = os.path.join(path, _LOG, f"{v:020d}.checkpoint.parquet")
    pq.write_table(table, cp_path)
    lc_tmp = os.path.join(path, _LOG, f"_last_checkpoint.tmp.{uuid.uuid4().hex}")
    with open(lc_tmp, "w") as fh:
        fh.write(json.dumps({"version": v, "size": len(rows)}))
    os.rename(lc_tmp, os.path.join(path, _LOG, "_last_checkpoint"))
    return cp_path


def _partition_value_str(v: Any) -> Optional[str]:
    """Serialize a partition value per the protocol (strings; None stays
    null)."""
    import datetime

    if v is None:
        return None
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bool):
        return "true" if v else "false"
    return str(v)


def _stage_parquet(
    df: DataFrame, path: str, partition_values: Optional[dict[str, Optional[str]]] = None
) -> list[dict[str, Any]]:
    """Write df's partitions as parquet under ``path``; return add actions."""
    staging = os.path.join(path, f"_staging_{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(staging)
    adds = []
    now_ms = int(time.time() * 1000)
    for f in sorted(os.listdir(staging)):
        if not f.endswith(".parquet"):
            continue
        name = f"part-{uuid.uuid4().hex}.snappy.parquet"
        src = os.path.join(staging, f)
        size = os.path.getsize(src)
        os.rename(src, os.path.join(path, name))
        adds.append(
            {
                "add": {
                    "path": name,
                    "partitionValues": partition_values or {},
                    "size": size,
                    "modificationTime": now_ms,
                    "dataChange": True,
                }
            }
        )
    for f in os.listdir(staging):
        os.remove(os.path.join(staging, f))
    os.rmdir(staging)
    return adds


def _stage_partitioned(
    df: DataFrame, path: str, partition_by: list[str]
) -> list[dict[str, Any]]:
    """Stage one file group per partition tuple; data files exclude the
    partition columns (protocol layout).  Fine for the modest partition
    counts of mirror tables; a cluster-scale writer would use a single
    partitionBy write and walk the directory tree instead."""
    combos = df.select(*partition_by).distinct().collect()
    data_cols = [c for c in df.columns if c not in partition_by]
    adds: list[dict[str, Any]] = []
    for row in combos:
        cond = None
        for c in partition_by:
            clause = (
                F.col(c).isNull() if row[c] is None else (F.col(c) == F.lit(row[c]))
            )
            cond = clause if cond is None else (cond & clause)
        pv = {c: _partition_value_str(row[c]) for c in partition_by}
        adds.extend(_stage_parquet(df.filter(cond).select(*data_cols), path, pv))
    return adds


def _conform(df: DataFrame, schema: T.StructType) -> DataFrame:
    """Align column order and types to the table schema; refuse on
    missing columns.  Name-only validation previously let a
    type-mismatched append commit parquet whose physical types disagreed
    with the metaData schemaString (ADVICE r1)."""
    missing = [f.name for f in schema.fields if f.name not in df.columns]
    if missing:
        raise DeltaProtocolError(f"schema mismatch: input missing columns {missing}")
    extra = [c for c in df.columns if c not in {f.name for f in schema.fields}]
    if extra:
        raise DeltaProtocolError(
            f"schema mismatch: input has columns not in table schema: {extra}"
        )
    return df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )


def write_delta(
    df: DataFrame,
    path: str,
    mode: str = "error",
    partition_by: Optional[list[str]] = None,
) -> int:
    """Write a DataFrame as a Delta table (create / append / overwrite).

    Emits protocol-v1 actions readable by any Delta implementation, and a
    parquet checkpoint every ``CHECKPOINT_INTERVAL`` commits.  Returns
    the committed version.
    """
    exists = os.path.isdir(os.path.join(path, _LOG)) and (
        _log_files(path) or _last_checkpoint(path) is not None
    )
    if exists and mode == "error":
        raise DeltaProtocolError(f"Delta table already exists at {path}")
    os.makedirs(path, exist_ok=True)

    if not exists:
        partition_by = list(partition_by or [])
        bad = [c for c in partition_by if c not in df.columns]
        if bad:
            raise DeltaProtocolError(f"partition columns not in input: {bad}")
        adds = (
            _stage_partitioned(df, path, partition_by)
            if partition_by
            else _stage_parquet(df, path)
        )
        actions: list[dict[str, Any]] = [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(df.schema.jsonValue()),
                    "partitionColumns": partition_by,
                    "configuration": {},
                    "createdTime": int(time.time() * 1000),
                }
            },
            *adds,
            {
                "commitInfo": {
                    "timestamp": int(time.time() * 1000),
                    "operation": "WRITE",
                    "operationParameters": {"mode": "ErrorIfExists"},
                }
            },
        ]
        _commit(path, 0, actions)
        return 0

    live, schema, partition_cols, st = _replay(path)
    v = st.last_v
    if (st.configuration.get("delta.columnMapping.mode") or "none") != "none":
        raise DeltaProtocolError(
            "writing to a column-mapped Delta table is not supported"
        )
    if partition_by is not None and list(partition_by) != partition_cols:
        raise DeltaProtocolError(
            f"table is partitioned by {partition_cols}, got {list(partition_by)}"
        )
    df = _conform(df, schema)
    actions = []
    if mode == "overwrite":
        now_ms = int(time.time() * 1000)
        actions.extend(
            {
                "remove": {
                    "path": a["path"],
                    "deletionTimestamp": now_ms,
                    "dataChange": True,
                }
            }
            for a in live
        )
    elif mode != "append":
        raise ValueError(f"unsupported mode {mode!r}")
    if partition_cols:
        data_df = df  # partition columns re-split per group
        actions.extend(_stage_partitioned(data_df, path, partition_cols))
    else:
        actions.extend(_stage_parquet(df, path))
    actions.append(
        {
            "commitInfo": {
                "timestamp": int(time.time() * 1000),
                "operation": "WRITE",
                "operationParameters": {"mode": mode},
            }
        }
    )
    _commit(path, v + 1, actions)
    if (v + 1) % CHECKPOINT_INTERVAL == 0:
        write_checkpoint(path)
    return v + 1
