"""Minimal Delta Lake table support without the delta-spark jars.

SURVEY.md §2.B contracts: "Read external Delta Lake table" and "Write
Delta Lake table" (reference CHANGELOG.md:25-27).  The runtime image has
no delta-spark package, so this module implements the subset of the
public Delta transaction-log protocol (github.com/delta-io/delta
PROTOCOL.md) those contracts need:

- **read**: replay ``_delta_log/*.json`` add/remove actions up to an
  optional ``version_as_of``, then scan the surviving Parquet files with
  the schema from the latest ``metaData`` action (schemaString is the
  Spark StructType JSON — Spark-native round trip);
- **write/append**: stage Parquet via Spark executors, then commit one
  atomic log entry (protocol + metaData on create, add actions per
  file).  Commits use rename-into-place, the same atomicity the real
  implementation relies on for local/HDFS stores.

Unsupported (loud errors, not silent wrongness): checkpoint parquet
files (``_last_checkpoint``), deletion vectors, column mapping,
partitioned Delta tables.  When the real delta-spark jars ARE on the
classpath, `spark.read.format("delta")` supersedes this module; the
engine prefers it automatically (``have_delta_jars``).
"""

from __future__ import annotations

import json
import os
import time
import uuid
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_LOG = "_delta_log"


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
    if os.path.exists(os.path.join(log_dir, "_last_checkpoint")):
        raise DeltaProtocolError(
            "checkpointed Delta log not supported by the built-in reader "
            "(install delta-spark for full protocol support)"
        )
    out = []
    for f in os.listdir(log_dir):
        if f.endswith(".json") and f[:-5].isdigit():
            out.append((int(f[:-5]), os.path.join(log_dir, f)))
    if not out:
        raise DeltaProtocolError(f"empty Delta log at {path}")
    return sorted(out)


def _replay(
    path: str, version_as_of: Optional[int] = None
) -> tuple[list[str], T.StructType, int]:
    """Replay the log: returns (live data file paths, schema, version)."""
    files: dict[str, str] = {}
    schema_json: Optional[str] = None
    last_v = -1
    for v, log_file in _log_files(path):
        if version_as_of is not None and v > version_as_of:
            break
        last_v = v
        with open(log_file) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "metaData" in action:
                    md = action["metaData"]
                    if md.get("partitionColumns"):
                        raise DeltaProtocolError(
                            "partitioned Delta tables not supported"
                        )
                    schema_json = md["schemaString"]
                elif "protocol" in action:
                    p = action["protocol"]
                    if p.get("minReaderVersion", 1) > 1:
                        raise DeltaProtocolError(
                            f"reader version {p['minReaderVersion']} requires "
                            "features (e.g. deletion vectors) this reader lacks"
                        )
                elif "add" in action:
                    files[action["add"]["path"]] = action["add"]["path"]
                elif "remove" in action:
                    files.pop(action["remove"]["path"], None)
    if version_as_of is not None and last_v < version_as_of:
        raise DeltaProtocolError(
            f"version {version_as_of} not in log (latest {last_v})"
        )
    if schema_json is None:
        raise DeltaProtocolError("no metaData action found in Delta log")
    schema = T.StructType.fromJson(json.loads(schema_json))
    return [os.path.join(path, f) for f in files], schema, last_v


def read_delta(
    spark: SparkSession, path: str, version_as_of: Optional[int] = None
) -> DataFrame:
    """Read a Delta table (optionally time-traveled) as a DataFrame."""
    if have_delta_jars(spark):  # pragma: no cover - jars absent in image
        reader = spark.read.format("delta")
        if version_as_of is not None:
            reader = reader.option("versionAsOf", version_as_of)
        return reader.load(path)
    files, schema, _ = _replay(path, version_as_of)
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*files)


def delta_version(path: str) -> int:
    return _replay(path)[2]


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
    os.rename(tmp, final)


def _stage_parquet(df: DataFrame, path: str) -> list[dict[str, Any]]:
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
                    "partitionValues": {},
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


def write_delta(
    df: DataFrame, path: str, mode: str = "error"
) -> int:
    """Write a DataFrame as a Delta table (create / append / overwrite).

    Emits protocol-v1 actions readable by any Delta implementation.
    Returns the committed version.
    """
    exists = os.path.isdir(os.path.join(path, _LOG))
    if exists and mode == "error":
        raise DeltaProtocolError(f"Delta table already exists at {path}")
    os.makedirs(path, exist_ok=True)

    if not exists:
        adds = _stage_parquet(df, path)
        actions: list[dict[str, Any]] = [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(df.schema.jsonValue()),
                    "partitionColumns": [],
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

    live, schema, v = _replay(path)
    if [f.name for f in df.schema.fields] != [f.name for f in schema.fields]:
        raise DeltaProtocolError(
            f"schema mismatch: table has {[f.name for f in schema.fields]}, "
            f"input has {df.columns}"
        )
    actions = []
    if mode == "overwrite":
        now_ms = int(time.time() * 1000)
        actions.extend(
            {
                "remove": {
                    "path": os.path.basename(f),
                    "deletionTimestamp": now_ms,
                    "dataChange": True,
                }
            }
            for f in live
        )
    elif mode != "append":
        raise ValueError(f"unsupported mode {mode!r}")
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
    return v + 1
