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
- **write/append**: stage Parquet via Spark executors (partitioned
  tables stage through one ``partitionBy`` job regardless of partition
  count), then commit one atomic log entry (protocol + metaData on
  create, add actions per file).  Every 10th commit also writes a
  protocol-conformant parquet checkpoint + ``_last_checkpoint`` carrying
  the REPLAYED protocol/metaData/tombstones verbatim, like the reference
  implementation.  Commits use rename-into-place, the same atomicity the
  real implementation relies on for local/HDFS stores;
- **deletion vectors**: adds with a ``deletionVector`` descriptor are
  honored at scan time — Z85 inline or .bin sidecar, RoaringBitmapArray
  portable format, positions dropped via a broadcast anti-join on the
  hidden parquet ``_metadata.row_index`` column;
- **column mapping**: 'name' mode via physical-name scan + logical
  rename; 'id' mode via Spark's native parquet field-id matcher.

Column-mapped tables support reads AND writes (append/overwrite/DML with
field-id-stamped parquet, metadata-only rename, mergeSchema adds with
fresh ``col-<uuid>`` physical names).  Unsupported (loud errors, not
silent wrongness): column-mapped + partitioned writes, reader features
beyond {columnMapping, timestampNtz, deletionVectors}.  When the real delta-spark jars ARE on the classpath,
``spark.read.format("delta")`` supersedes this module; the engine
prefers it automatically (``have_delta_jars``).
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


def _v2_checkpoint_manifest(path: str, version: int) -> Optional[str]:
    """UUID-named v2Checkpoint manifest for ``version``
    (``<v>.checkpoint.<uniqueStr>.{json|parquet}``, PROTOCOL.md "V2
    Spec Checkpoints") — what current delta-spark writes when the
    v2Checkpoint table feature is enabled.  None when the table uses a
    classic or multipart checkpoint instead."""
    import re

    log_dir = os.path.join(path, _LOG)
    # exactly one non-numeric segment between 'checkpoint' and the
    # extension — multipart files have two numeric segments and classic
    # has none, so neither matches
    pat = re.compile(
        rf"^{version:020d}\.checkpoint\.(?!\d+\.\d+\.)[A-Za-z0-9-]+"
        r"\.(json|parquet)$"
    )
    cands = sorted(f for f in os.listdir(log_dir) if pat.match(f))
    return os.path.join(log_dir, cands[-1]) if cands else None


def _sidecar_path(path: str, sidecar: dict) -> str:
    """Resolve a sidecar action's path: relative names live under
    ``_delta_log/_sidecars/``; absolute URIs are used as-is."""
    p = str(sidecar.get("path") or "")
    if p.startswith("file://"):
        p = p[len("file://") :]
    if os.path.isabs(p) and os.path.exists(p):
        return p
    return os.path.join(path, _LOG, "_sidecars", os.path.basename(p))


# ---------------------------------------------------------------- deletion
# vectors (public protocol: PROTOCOL.md "Deletion Vectors").  A DV is a
# 64-bit roaring bitmap of deleted row positions, stored inline (Z85 text in
# the add action) or in a .bin sidecar file, serialized in the
# RoaringBitmapArray "portable" format.

_Z85 = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INV = {c: i for i, c in enumerate(_Z85)}
_DV_MAGIC = 1681511377  # RoaringBitmapArray portable-format magic


def _z85_decode(s: str) -> bytes:
    if len(s) % 5:
        raise DeltaProtocolError(f"Z85 length {len(s)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(s), 5):
        v = 0
        for c in s[i : i + 5]:
            v = v * 85 + _Z85_INV[c]
        out += v.to_bytes(4, "big")
    return bytes(out)


def _z85_encode(b: bytes) -> str:
    if len(b) % 4:
        raise DeltaProtocolError(f"Z85 input length {len(b)} not a multiple of 4")
    out = []
    for i in range(0, len(b), 4):
        v = int.from_bytes(b[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            chunk.append(_Z85[v % 85])
            v //= 85
        out += reversed(chunk)
    return "".join(out)


def _parse_roaring32(buf: bytes, pos: int) -> tuple[list[int], int]:
    """One standard-format 32-bit roaring bitmap at ``pos``; returns
    (values, next_pos).  Handles array, bitmap, and run containers."""
    import struct

    (cookie,) = struct.unpack_from("<i", buf, pos)
    if cookie & 0xFFFF == 12347:  # SERIAL_COOKIE: run containers present
        n = (cookie >> 16) + 1
        pos += 4
        runflags = buf[pos : pos + (n + 7) // 8]
        pos += (n + 7) // 8
        has_offsets = n >= 4
    elif cookie == 12346:  # SERIAL_COOKIE_NO_RUNCONTAINER
        (n,) = struct.unpack_from("<i", buf, pos + 4)
        pos += 8
        runflags = b""
        has_offsets = True
    else:
        raise DeltaProtocolError(f"bad roaring cookie {cookie}")
    keys, cards = [], []
    for i in range(n):
        k, c = struct.unpack_from("<HH", buf, pos)
        keys.append(k)
        cards.append(c + 1)
        pos += 4
    if has_offsets:
        pos += 4 * n  # containers are sequential; offsets are redundant
    vals: list[int] = []
    for i in range(n):
        base = keys[i] << 16
        is_run = bool(runflags and (runflags[i // 8] >> (i % 8)) & 1)
        if is_run:
            (nruns,) = struct.unpack_from("<H", buf, pos)
            pos += 2
            for _ in range(nruns):
                start, length = struct.unpack_from("<HH", buf, pos)
                pos += 4
                vals.extend(base | v for v in range(start, start + length + 1))
        elif cards[i] <= 4096:
            vals.extend(
                base | v
                for v in struct.unpack_from(f"<{cards[i]}H", buf, pos)
            )
            pos += 2 * cards[i]
        else:
            words = struct.unpack_from("<1024Q", buf, pos)
            pos += 8192
            vals.extend(
                base | (w_i << 6) | b
                for w_i, w in enumerate(words)
                if w
                for b in range(64)
                if (w >> b) & 1
            )
    return vals, pos


def _parse_roaring64(data: bytes) -> list[int]:
    """RoaringBitmapArray portable format -> sorted 64-bit positions."""
    import struct

    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != _DV_MAGIC:
        raise DeltaProtocolError(f"bad DV magic {magic}")
    (nmaps,) = struct.unpack_from("<q", data, 4)
    pos = 12  # header: magic(4) + count(8)
    out: list[int] = []
    for _ in range(nmaps):
        (high,) = struct.unpack_from("<i", data, pos)
        pos += 4
        vals, pos = _parse_roaring32(data, pos)
        out.extend((high << 32) | v for v in vals)
    return out


def _serialize_roaring64(positions: list[int]) -> bytes:
    """Inverse of _parse_roaring64.  Containers with cardinality ≤ 4096
    serialize as sorted uint16 arrays; above that the format REQUIRES a
    bitmap container (readers decide array-vs-bitmap from cardinality
    alone, so emitting an array there corrupts the stream)."""
    import struct
    from collections import defaultdict

    by_high: dict[int, dict[int, list[int]]] = defaultdict(lambda: defaultdict(list))
    for p in sorted(set(positions)):
        by_high[p >> 32][(p >> 16) & 0xFFFF].append(p & 0xFFFF)
    out = struct.pack("<iq", _DV_MAGIC, len(by_high))
    for high in sorted(by_high):
        containers = by_high[high]
        out += struct.pack("<i", high)
        out += struct.pack("<ii", 12346, len(containers))
        for k in sorted(containers):
            out += struct.pack("<HH", k, len(containers[k]) - 1)
        # offsets (required by the no-run-container cookie)
        off = 4 + 4 + 4 * len(containers) + 4 * len(containers)
        for k in sorted(containers):
            card = len(containers[k])
            out += struct.pack("<i", off)
            off += 2 * card if card <= 4096 else 8192
        for k in sorted(containers):
            vals = containers[k]
            if len(vals) <= 4096:
                out += struct.pack(f"<{len(vals)}H", *vals)
            else:
                words = [0] * 1024
                for v in vals:
                    words[v >> 6] |= 1 << (v & 63)
                out += struct.pack("<1024Q", *words)
    return out


def _dv_sidecar_path(table_path: str, dv: dict) -> Optional[str]:
    """Filesystem path of a DV's .bin sidecar (None for inline DVs).
    The single source of truth for the protocol's derived-path rule —
    used by both the read path and vacuum's live-file protection."""
    import uuid as _uuid

    st = dv["storageType"]
    if st == "i":
        return None
    if st == "u":  # <random prefix><z85 uuid> -> <prefix>/deletion_vector_<uuid>.bin
        enc = dv["pathOrInlineDv"]
        prefix, uid_z85 = enc[:-20], enc[-20:]
        uid = _uuid.UUID(bytes=_z85_decode(uid_z85))
        fname = f"deletion_vector_{uid}.bin"
        return (
            os.path.join(table_path, prefix, fname)
            if prefix
            else os.path.join(table_path, fname)
        )
    if st == "p":  # absolute path
        return dv["pathOrInlineDv"]
    raise DeltaProtocolError(f"unknown DV storageType {st!r}")


def _dv_positions(table_path: str, dv: dict) -> list[int]:
    """Deleted row positions for one deletionVector descriptor."""
    import struct
    import zlib

    if dv["storageType"] == "i":  # inline: Z85 of the serialized bitmap
        return _parse_roaring64(_z85_decode(dv["pathOrInlineDv"]))
    fpath = _dv_sidecar_path(table_path, dv)
    with open(fpath, "rb") as fh:
        blob = fh.read()
    if blob[0] != 1:
        raise DeltaProtocolError(f"unsupported DV file format version {blob[0]}")
    # checkpoint round-trips surface a missing optional offset as an
    # explicit None, so `get("offset", 1)` alone is not enough
    off = dv.get("offset") or 1
    (size,) = struct.unpack_from(">i", blob, off)
    data = blob[off + 4 : off + 4 + size]
    (crc,) = struct.unpack_from(">I", blob, off + 4 + size)
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise DeltaProtocolError(f"DV checksum mismatch in {fpath}")
    return _parse_roaring64(data)


def write_dv_blob(table_path: str, data: bytes, cardinality: int) -> dict:
    """Frame an already-serialized roaring64 payload as a deletion-vector
    .bin sidecar (version byte + big-endian length + CRC32) and return
    its add-action descriptor.  Split from write_dv_file so the DELETE
    path can serialize bitmaps executor-side and hand the driver only
    the finished bytes."""
    import struct
    import uuid as _uuid
    import zlib

    uid = _uuid.uuid4()
    blob = bytes([1]) + struct.pack(">i", len(data)) + data
    blob += struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    with open(os.path.join(table_path, f"deletion_vector_{uid}.bin"), "wb") as fh:
        fh.write(blob)
    return {
        "storageType": "u",
        "pathOrInlineDv": _z85_encode(uid.bytes),
        "offset": 1,
        "sizeInBytes": len(data),
        "cardinality": cardinality,
    }


def write_dv_file(table_path: str, positions: list[int]) -> dict:
    """Write a deletion-vector .bin file and return its add-action
    descriptor — the staging half of the protocol this module's tests
    (and a future MERGE path) use to produce DV-bearing tables."""
    return write_dv_blob(
        table_path, _serialize_roaring64(positions), len(set(positions))
    )


class _State:
    """Log-replay accumulator: live adds keyed by file path + metadata."""

    SUPPORTED_READER_FEATURES = {
        "columnMapping",
        "timestampNtz",
        "deletionVectors",
        # _load_checkpoint follows UUID manifests + sidecars
        "v2Checkpoint",
    }

    def __init__(self) -> None:
        self.files: dict[str, dict] = {}  # path -> add action dict
        self.tombstones: dict[str, dict] = {}  # path -> remove action dict
        self.schema_json: Optional[str] = None
        self.partition_cols: list[str] = []
        self.configuration: dict[str, str] = {}
        self.protocol: dict = {"minReaderVersion": 1, "minWriterVersion": 2}
        self.metadata: dict = {}
        self.last_v = -1

    def apply_meta(self, md: dict) -> None:
        self.metadata = dict(md)
        self.schema_json = md["schemaString"]
        self.partition_cols = list(md.get("partitionColumns") or [])
        self.configuration = dict(md.get("configuration") or {})

    def apply_protocol(self, p: dict) -> None:
        self.protocol = dict(p)
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
                "this reader lacks"
            )

    def apply_add(self, add: dict) -> None:
        self.files[add["path"]] = add
        self.tombstones.pop(add["path"], None)

    def apply_remove(self, remove: dict) -> None:
        self.files.pop(remove["path"], None)
        self.tombstones[remove["path"]] = remove


def _apply_checkpoint_row(state: _State, row: dict) -> None:
    """Apply one checkpoint action row (classic part, v2 manifest, or v2
    sidecar — they share the action schema) to the replay state."""
    if row.get("protocol"):
        state.apply_protocol(row["protocol"])
    if row.get("metaData"):
        md = dict(row["metaData"])
        if isinstance(md.get("partitionColumns"), str):
            md["partitionColumns"] = json.loads(md["partitionColumns"])
        # pyarrow renders parquet maps as lists of (k, v) pairs
        if isinstance(md.get("configuration"), list):
            md["configuration"] = dict(md["configuration"])
        if isinstance((md.get("format") or {}).get("options"), list):
            md["format"] = {
                **md["format"],
                "options": dict(md["format"]["options"]),
            }
        state.apply_meta(md)
    if row.get("add"):
        add = dict(row["add"])
        pv = add.get("partitionValues")
        if isinstance(pv, list):  # pyarrow map -> list of (k, v)
            add["partitionValues"] = dict(pv)
        state.apply_add(add)
    if row.get("remove"):
        state.apply_remove(row["remove"])


def _load_checkpoint(state: _State, path: str, version: int, parts: Optional[int]) -> None:
    """Seed replay state from a checkpoint (read via pyarrow — the
    action list is driver-side metadata, no Spark job needed).  Handles
    all three protocol forms: classic single-file, multipart, and
    v2Checkpoint (UUID-named manifest + sidecar files under
    ``_sidecars/``) — tables written by current delta-spark with the
    v2Checkpoint feature load through the last branch (reference
    contract: read external Delta tables, CHANGELOG.md:25)."""
    import pyarrow.parquet as pq

    cp_paths = _checkpoint_paths(path, version, parts)
    if not parts and not os.path.exists(cp_paths[0]):
        manifest = _v2_checkpoint_manifest(path, version)
        if manifest is None:
            raise DeltaProtocolError(
                f"_last_checkpoint points at missing {cp_paths[0]}"
            )
        if manifest.endswith(".json"):
            with open(manifest) as fh:
                actions = [json.loads(ln) for ln in fh if ln.strip()]
        else:
            actions = pq.read_table(manifest).to_pylist()
        sidecars = []
        for row in actions:
            cm = row.get("checkpointMetadata")
            if cm:
                if int(cm.get("version")) != version:
                    raise DeltaProtocolError(
                        f"v2 checkpoint manifest claims version "
                        f"{cm.get('version')}, expected {version}"
                    )
                continue
            if row.get("sidecar"):
                sidecars.append(row["sidecar"])
                continue
            _apply_checkpoint_row(state, row)
        for sc in sidecars:
            scp = _sidecar_path(path, sc)
            if not os.path.exists(scp):
                raise DeltaProtocolError(f"v2 checkpoint sidecar missing: {scp}")
            for row in pq.read_table(scp).to_pylist():
                _apply_checkpoint_row(state, row)
        state.last_v = version
        return
    for cp_path in cp_paths:
        if not os.path.exists(cp_path):
            raise DeltaProtocolError(f"_last_checkpoint points at missing {cp_path}")
        for row in pq.read_table(cp_path).to_pylist():
            _apply_checkpoint_row(state, row)
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


def _physical_schema(schema_json: dict, with_field_ids: bool = False) -> dict:
    """schemaString JSON rewritten to physical column names (column
    mapping 'name' mode): every struct field renames to its
    delta.columnMapping.physicalName, recursively.

    ``with_field_ids`` ('id' mode): each field additionally carries
    ``parquet.field.id`` = delta.columnMapping.id, so Spark's native
    field-id matcher (spark.sql.parquet.fieldId.read.enabled) resolves
    columns by parquet field id executor-side — names in the data files
    are ignored, which is what makes post-rename files readable."""

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
        new_md = {}
        if with_field_ids and "delta.columnMapping.id" in md:
            new_md["parquet.field.id"] = int(md["delta.columnMapping.id"])
        return {
            **f,
            "name": md.get("delta.columnMapping.physicalName", f["name"]),
            "type": walk_type(f["type"]),
            "metadata": new_md,
        }

    return {"type": "struct", "fields": [walk_field(f) for f in schema_json["fields"]]}


def _delta_partition_str(v) -> Optional[str]:
    """A filter value in the Delta protocol's partitionValues string
    serialization (booleans lowercase, dates/timestamps ISO-ish,
    numbers via str)."""
    import datetime as _dt

    if v is None:
        return None
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S")
    if isinstance(v, _dt.date):
        return v.isoformat()
    return str(v)


def _normalize_delta_range(filt: dict, schema: T.StructType) -> dict:
    """User {column: (lo, hi)} → {column: (lo, hi)} in the add-stats
    comparison domain (dates → ISO strings, matching _add_stats'
    serialization; numbers pass through).  Refuses columns absent from
    the schema or of types the stats never bound (a string filter would
    silently full-scan while looking like it prunes)."""
    import datetime as _dt

    by_name = {f.name: f.dataType for f in schema.fields}
    out = {}
    for c, (lo, hi) in filt.items():
        if c not in by_name:
            raise DeltaProtocolError(f"range_filter column {c!r} not in table")
        dt = by_name[c]
        if isinstance(dt, T.DateType):
            def conv(v):
                if v is None:
                    return None
                if isinstance(v, str):
                    return v
                if isinstance(v, _dt.datetime):
                    v = v.date()
                return v.isoformat()

            out[c] = (conv(lo), conv(hi))
        elif isinstance(
            dt,
            (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
             T.FloatType, T.DoubleType),
        ):
            out[c] = (lo, hi)
        else:
            raise DeltaProtocolError(
                f"range_filter on type {dt.simpleString()} not supported "
                f"({c!r}); stats bound only numeric/date columns"
            )
    return out


def _add_in_range(a: dict, pc: str, lo, hi) -> bool:
    """Stats-based skip check for one add action: drop only when the
    file's recorded [min, max] provably misses [lo, hi]; missing or
    unparsable stats always keep."""
    st = a.get("stats")
    if not st:
        return True
    try:
        js = json.loads(st) if isinstance(st, str) else st
        mn = (js.get("minValues") or {}).get(pc)
        mx = (js.get("maxValues") or {}).get(pc)
        if mn is None or mx is None:
            return True
        if hi is not None and mn > hi:
            return False
        if lo is not None and mx < lo:
            return False
    except (ValueError, TypeError):
        return True
    return True


def _to_epoch_ms(ts) -> int:
    """Accept an epoch-ms int, ISO string, or datetime → epoch ms (naive
    datetimes are taken as UTC, the log's clock)."""
    import datetime as _dt

    if isinstance(ts, bool):
        raise TypeError("timestamp must be epoch-ms / ISO string / datetime")
    if isinstance(ts, int):
        return ts
    if isinstance(ts, str):
        ts = _dt.datetime.fromisoformat(ts)
    if isinstance(ts, _dt.datetime):
        if ts.tzinfo is None:
            ts = ts.replace(tzinfo=_dt.timezone.utc)
        return int(ts.timestamp() * 1000)
    raise TypeError(f"unsupported timestamp {ts!r}")


def _version_at_timestamp(path: str, ts_ms: int) -> int:
    """Latest version whose commit landed at or before ``ts_ms``.

    Resolution follows delta-spark's timestampAsOf: the commit JSON
    file's modification time is the commit's timestamp.  Refuses a
    timestamp earlier than the oldest retained commit (the protocol's
    'timestamp before earliest version' error)."""
    logs = _log_files(path)
    if not logs:
        raise DeltaProtocolError(f"no Delta log at {path}")
    best = None
    earliest = None
    for v, p in logs:
        mtime_ms = int(os.path.getmtime(p) * 1000)
        earliest = mtime_ms if earliest is None else min(earliest, mtime_ms)
        if mtime_ms <= ts_ms and (best is None or v > best):
            best = v
    if best is None:
        raise DeltaProtocolError(
            f"timestamp {ts_ms} is before the table's earliest retained "
            f"commit ({earliest})"
        )
    return best


def read_delta(
    spark: SparkSession,
    path: str,
    version_as_of: Optional[int] = None,
    partition_filter: Optional[dict] = None,
    range_filter: Optional[dict] = None,
    timestamp_as_of=None,
) -> DataFrame:
    """Read a Delta table (optionally time-traveled) as a DataFrame.

    Partitioned tables: data files lack the partition columns, so each
    file group is scanned with the data schema and its partition values
    (from the add actions) are re-attached as typed literals — per the
    protocol, never inferred from directory names.

    ``partition_filter`` = {partition column: value} prunes the add-file
    list by the log-recorded partitionValues BEFORE any scan is planned
    (the same pruning the reference gets from file skipping,
    CHANGELOG.md:26).  Because partition columns exist ONLY in the log,
    file pruning here IS exact row selection.  Refused for
    non-partition columns.

    ``range_filter`` = {column: (lo, hi)} (inclusive; None = unbounded)
    prunes the add-file list by the per-add stats JSON (numeric/date
    min/max this writer records) — Delta data skipping — then applies
    the exact BETWEEN predicate row-wise.  Files without stats are
    kept; unsupported types refuse loudly.

    ``timestamp_as_of`` (epoch-ms / ISO string / datetime) time-travels
    to the latest version committed at or before the timestamp
    (delta-spark's timestampAsOf, resolved from commit-file
    modification times).  Mutually exclusive with ``version_as_of``.
    """
    if timestamp_as_of is not None:
        if version_as_of is not None:
            raise DeltaProtocolError(
                "version_as_of and timestamp_as_of are mutually exclusive"
            )
        version_as_of = _version_at_timestamp(
            path, _to_epoch_ms(timestamp_as_of)
        )

    def _range_predicate(df: DataFrame, filt: dict) -> DataFrame:
        for c, (lo, hi) in filt.items():
            if lo is not None:
                df = df.filter(F.col(c) >= F.lit(lo))
            if hi is not None:
                df = df.filter(F.col(c) <= F.lit(hi))
        return df

    if have_delta_jars(spark):  # pragma: no cover - jars absent in image
        reader = spark.read.format("delta")
        if version_as_of is not None:
            reader = reader.option("versionAsOf", version_as_of)
        df = reader.load(path)
        if partition_filter:
            for c, v in partition_filter.items():
                df = df.filter(
                    F.col(c).isNull() if v is None else (F.col(c) == F.lit(v))
                )
        if range_filter:
            df = _range_predicate(df, range_filter)
        return df
    adds, schema, partition_cols, st = _replay(path, version_as_of)
    if partition_filter:
        unknown = [c for c in partition_filter if c not in partition_cols]
        if unknown:
            raise DeltaProtocolError(
                f"{unknown} are not partition columns of this table "
                f"(partitioned by {partition_cols})"
            )
    norm_range = (
        _normalize_delta_range(range_filter, schema) if range_filter else None
    )
    if not adds:
        return spark.createDataFrame([], schema)
    mode = st.configuration.get("delta.columnMapping.mode") or "none"
    if mode == "none":
        phys_schema, phys_of = schema, {f.name: f.name for f in schema.fields}
    elif mode in ("name", "id"):
        # parquet files carry PHYSICAL column names; the logical names
        # live only in schemaString field metadata.  Read physically,
        # then cast back — struct casts rename nested fields by position.
        # 'id' mode resolves by parquet field id instead of name (files
        # written before a rename keep old names but stable ids), via
        # Spark's native matcher — enabled here, effective per-scan.
        sjson = json.loads(st.schema_json)
        phys_schema = T.StructType.fromJson(
            _physical_schema(sjson, with_field_ids=(mode == "id"))
        )
        phys_of = _col_mapping(st)  # single source of the mapping rule
        if mode == "id":
            # Session-scoped by necessity: the scan is lazy, so restoring
            # the conf after returning would disable id matching before
            # the action runs.  The conf only changes resolution for READ
            # SCHEMAS that explicitly carry parquet.field.id metadata
            # (this module's id-mode schemas); plain reads are unaffected.
            spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    else:
        raise DeltaProtocolError(f"column mapping mode {mode!r} not supported")

    def logical(df):
        return df.select(
            *[
                F.col(phys_of[f.name]).cast(f.dataType).alias(f.name)
                for f in schema.fields
            ]
        )

    def scan(read_schema: T.StructType, group_adds: list[dict]) -> DataFrame:
        """Scan one group of data files, dropping DV-deleted positions.

        Files with a deletionVector are read with the hidden parquet
        ``_metadata.row_index`` column and broadcast-anti-joined against
        their deleted (file, position) set; DV-free files scan plain.
        The positions are parsed driver-side — DVs are small row-level
        deltas by design (compaction folds them into rewrites), and the
        anti-join keeps the filter JVM-side; a reader for pathologically
        large DVs would parse them executor-side from the descriptors.
        """
        plain = [a for a in group_adds if not a.get("deletionVector")]
        dv = [a for a in group_adds if a.get("deletionVector")]
        out = []
        if plain:
            out.append(
                spark.read.schema(read_schema).parquet(
                    *[os.path.join(path, a["path"]) for a in plain]
                )
            )
        if dv:
            # _metadata.file_path is the Hadoop-style URI: file:/abs/path
            deleted = [
                ("file:" + os.path.abspath(os.path.join(path, a["path"])), int(p))
                for a in dv
                for p in _dv_positions(path, a["deletionVector"])
            ]
            df = (
                spark.read.schema(read_schema)
                .parquet(*[os.path.join(path, a["path"]) for a in dv])
                .select(
                    "*",
                    F.col("_metadata.file_path").alias("__dv_fp"),
                    F.col("_metadata.row_index").alias("__dv_pos"),
                )
            )
            del_df = spark.createDataFrame(
                deleted, "__dv_fp string, __dv_pos long"
            )
            out.append(
                df.join(F.broadcast(del_df), ["__dv_fp", "__dv_pos"], "left_anti")
                .drop("__dv_fp", "__dv_pos")
            )
        res = out[0]
        for o in out[1:]:
            res = res.unionByName(o)
        return res

    if partition_filter:
        # prune add actions on the protocol's string-serialized partition
        # values; a missing key keeps the file (conservative)
        want = {
            phys_of[c]: _delta_partition_str(v)
            for c, v in partition_filter.items()
        }
        adds = [
            a
            for a in adds
            if all(
                pc not in (a.get("partitionValues") or {})
                or (a.get("partitionValues") or {}).get(pc) == v
                for pc, v in want.items()
            )
        ]
        if not adds:
            return spark.createDataFrame([], schema)

    if norm_range:
        # data skipping on the per-add stats (keyed by the PHYSICAL
        # column names the parquet footers carry); the exact predicate
        # re-applies row-wise on the kept files below
        adds = [
            a
            for a in adds
            if all(
                _add_in_range(a, phys_of.get(c, c), lo, hi)
                for c, (lo, hi) in norm_range.items()
            )
        ]
        if not adds:
            return spark.createDataFrame([], schema)

    if not partition_cols:
        out = logical(scan(phys_schema, adds))
        return _range_predicate(out, norm_range) if norm_range else out

    # partitionValues keys use physical names under column mapping
    phys_parts = [phys_of[c] for c in partition_cols]
    data_schema = T.StructType(
        [f for f in phys_schema.fields if f.name not in phys_parts]
    )
    ptypes = {f.name: f.dataType for f in schema.fields if f.name in partition_cols}
    groups: dict[tuple, list[dict]] = {}
    for a in adds:
        pv = a.get("partitionValues") or {}
        key = tuple(pv.get(c) for c in phys_parts)
        groups.setdefault(key, []).append(a)
    parts = []
    for key, group_adds in groups.items():
        df = scan(data_schema, group_adds)
        for c, pc, val in zip(partition_cols, phys_parts, key):
            lit = F.lit(None) if val is None else F.lit(val)
            df = df.withColumn(pc, lit.cast(ptypes[c]))
        parts.append(logical(df))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return _range_predicate(out, norm_range) if norm_range else out


def delta_version(path: str) -> int:
    return _replay(path)[3].last_v


def _commit(path: str, version: int, actions: list[dict[str, Any]]) -> None:
    from pg_mooncake_spark.fsio import CommitConflict, get_backend

    backend = get_backend(path)
    log_dir = os.path.join(path, _LOG)
    backend.mkdirs(log_dir)
    final = os.path.join(log_dir, f"{version:020d}.json")
    data = "".join(json.dumps(a) + "\n" for a in actions).encode("utf-8")
    try:
        # OCC barrier (fsio seam): two writers racing to the same delta
        # version serialize on put_if_absent — locally a hard-link
        # EEXIST, on S3 a conditional PUT (what delta-on-S3 needs a
        # LogStore/DynamoDB for when the bucket lacks conditional PUTs)
        backend.put_if_absent(final, data)
    except CommitConflict:
        raise DeltaProtocolError(
            f"concurrent commit at version {version}"
        ) from None


def write_checkpoint(
    path: str, version: Optional[int] = None, v2: bool = False
) -> str:
    """Write a protocol-conformant parquet checkpoint of the table state
    at ``version`` (default latest) plus ``_last_checkpoint``.

    One row per action with the standard nested-struct columns, so the
    real delta implementation can consume it and vice versa.  The rows
    are the REPLAYED state, carried verbatim — protocol (incl. feature
    lists), metaData (same table id / configuration / createdTime the
    log declared; regenerating the id would change table identity across
    a checkpoint), per-add stats and deletionVector descriptors, and
    unexpired remove tombstones, which the protocol requires checkpoints
    to retain so vacuum still sees them.

    ``v2=True`` emits the V2 spec checkpoint this module's reader (and
    current delta-spark) consumes (PROTOCOL.md "V2 Spec Checkpoints",
    VERDICT r7 task 6): a UUID-named manifest holding
    checkpointMetadata + protocol + metaData + sidecar pointers, with
    every FILE action (add/remove) in parquet sidecars under
    ``_delta_log/_sidecars/`` — the layout that lets a 100 TB table's
    checkpoint be written and read in parallel parts.  The manifest's
    protocol row declares the v2Checkpoint reader/writer feature
    (minReader 3 / minWriter 7), as delta-spark does when the feature
    turns on.  Default stays classic: universally readable.
    """
    import pyarrow as pa
    import pyarrow.parquet as pq

    adds, schema, partition_cols, st = _replay(path, version)
    v = st.last_v
    kv = pa.map_(pa.string(), pa.string())
    dv_struct = pa.struct(
        [
            pa.field("storageType", pa.string()),
            pa.field("pathOrInlineDv", pa.string()),
            pa.field("offset", pa.int32()),
            pa.field("sizeInBytes", pa.int32()),
            pa.field("cardinality", pa.int64()),
        ]
    )
    cp_schema = pa.schema(
        [
            pa.field(
                "protocol",
                pa.struct(
                    [
                        pa.field("minReaderVersion", pa.int32()),
                        pa.field("minWriterVersion", pa.int32()),
                        pa.field("readerFeatures", pa.list_(pa.string())),
                        pa.field("writerFeatures", pa.list_(pa.string())),
                    ]
                ),
            ),
            pa.field(
                "metaData",
                pa.struct(
                    [
                        pa.field("id", pa.string()),
                        pa.field("name", pa.string()),
                        pa.field("description", pa.string()),
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
                        pa.field("stats", pa.string()),
                        pa.field("deletionVector", dv_struct),
                    ]
                ),
            ),
            pa.field(
                "remove",
                pa.struct(
                    [
                        pa.field("path", pa.string()),
                        pa.field("deletionTimestamp", pa.int64()),
                        pa.field("dataChange", pa.bool_()),
                    ]
                ),
            ),
        ]
    )
    md = st.metadata
    proto = {
        "minReaderVersion": st.protocol.get("minReaderVersion", 1),
        "minWriterVersion": st.protocol.get("minWriterVersion", 2),
        "readerFeatures": st.protocol.get("readerFeatures"),
        "writerFeatures": st.protocol.get("writerFeatures"),
    }
    if v2:
        # the v2Checkpoint table feature implies protocol (3, 7) with
        # the feature listed on both sides (PROTOCOL.md)
        proto["minReaderVersion"] = max(3, int(proto["minReaderVersion"]))
        proto["minWriterVersion"] = max(7, int(proto["minWriterVersion"]))
        rf = set(proto.get("readerFeatures") or [])
        wf = set(proto.get("writerFeatures") or [])
        rf.add("v2Checkpoint")
        wf.add("v2Checkpoint")
        proto["readerFeatures"] = sorted(rf)
        proto["writerFeatures"] = sorted(wf)
    rows: list[dict] = [
        {"protocol": proto},
        {
            "metaData": {
                "id": md.get("id") or str(uuid.uuid4()),
                "name": md.get("name"),
                "description": md.get("description"),
                "format": {
                    "provider": (md.get("format") or {}).get("provider", "parquet"),
                    "options": sorted(
                        ((md.get("format") or {}).get("options") or {}).items()
                    ),
                },
                "schemaString": st.schema_json or json.dumps(schema.jsonValue()),
                "partitionColumns": partition_cols,
                "configuration": sorted(st.configuration.items()),
                "createdTime": md.get("createdTime"),
            }
        },
    ]
    for a in adds:
        dv = a.get("deletionVector")
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
                    "stats": a.get("stats"),
                    "deletionVector": (
                        {
                            "storageType": dv.get("storageType"),
                            "pathOrInlineDv": dv.get("pathOrInlineDv"),
                            "offset": dv.get("offset"),
                            "sizeInBytes": dv.get("sizeInBytes"),
                            "cardinality": dv.get("cardinality"),
                        }
                        if dv
                        else None
                    ),
                }
            }
        )
    for r in st.tombstones.values():
        rows.append(
            {
                "remove": {
                    "path": r["path"],
                    "deletionTimestamp": r.get("deletionTimestamp"),
                    "dataChange": r.get("dataChange", True),
                }
            }
        )
    if v2:
        # sidecars hold ONLY file actions; the manifest holds
        # checkpointMetadata + protocol + metaData + sidecar pointers
        sc_dir = os.path.join(path, _LOG, "_sidecars")
        os.makedirs(sc_dir, exist_ok=True)
        sc_schema = pa.schema(
            [cp_schema.field("add"), cp_schema.field("remove")]
        )
        file_rows = rows[2:]
        sc_name = f"{uuid.uuid4()}.parquet"
        sc_path = os.path.join(sc_dir, sc_name)
        pq.write_table(pa.Table.from_pylist(file_rows, schema=sc_schema), sc_path)
        mf_schema = pa.schema(
            [
                pa.field(
                    "checkpointMetadata",
                    pa.struct([pa.field("version", pa.int64())]),
                ),
                cp_schema.field("protocol"),
                cp_schema.field("metaData"),
                pa.field(
                    "sidecar",
                    pa.struct(
                        [
                            pa.field("path", pa.string()),
                            pa.field("sizeInBytes", pa.int64()),
                            pa.field("modificationTime", pa.int64()),
                        ]
                    ),
                ),
            ]
        )
        mf_rows = [
            {"checkpointMetadata": {"version": v}},
            rows[0],
            rows[1],
            {
                "sidecar": {
                    "path": sc_name,
                    "sizeInBytes": os.path.getsize(sc_path),
                    "modificationTime": int(os.path.getmtime(sc_path) * 1000),
                }
            },
        ]
        cp_path = os.path.join(
            path, _LOG, f"{v:020d}.checkpoint.{uuid.uuid4()}.parquet"
        )
        pq.write_table(pa.Table.from_pylist(mf_rows, schema=mf_schema), cp_path)
    else:
        cp_path = os.path.join(path, _LOG, f"{v:020d}.checkpoint.parquet")
        pq.write_table(pa.Table.from_pylist(rows, schema=cp_schema), cp_path)
    lc_tmp = os.path.join(path, _LOG, f"_last_checkpoint.tmp.{uuid.uuid4().hex}")
    with open(lc_tmp, "w") as fh:
        fh.write(json.dumps({"version": v, "size": len(rows)}))
    os.rename(lc_tmp, os.path.join(path, _LOG, "_last_checkpoint"))
    return cp_path


def _add_stats(fpath: str) -> Optional[str]:
    """Delta per-file stats JSON (``numRecords`` / ``minValues`` /
    ``maxValues`` / ``nullCount``) aggregated from the parquet footer —
    driver-side metadata, no data read.  This is what gives delta-spark
    readers of our exports stats-based file skipping (and fast
    ``count(*)``).  Bounds cover the orderable numeric/date primitives;
    strings are skipped (parquet writers may truncate string stats, and
    a truncated UPPER bound is unsound) and so are timestamps (their
    JSON serialization is writer-version-specific).  A column missing
    stats in ANY row group is dropped from the bound maps."""
    import datetime as _dt

    import pyarrow.parquet as _pq

    try:
        md = _pq.ParquetFile(fpath).metadata
    except Exception:
        return None
    mins: dict[str, Any] = {}
    maxs: dict[str, Any] = {}
    nulls: dict[str, int] = {}
    bad: set[str] = set()
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if "." in name:  # nested leaves: out of scope
                continue
            try:
                st = col.statistics
                ok = (
                    st is not None
                    and st.has_min_max
                    and st.null_count is not None
                )
                lo, hi = (st.min, st.max) if ok else (None, None)
            except Exception:
                ok = False
            if not ok:
                bad.add(name)
                continue
            nulls[name] = nulls.get(name, 0) + int(st.null_count)
            if not isinstance(lo, (int, float, _dt.date)) or isinstance(
                lo, (bool, _dt.datetime)
            ):
                bad.add(name)
                continue
            if isinstance(lo, _dt.date):
                lo, hi = lo.isoformat(), hi.isoformat()
            if name not in mins or lo < mins[name]:
                mins[name] = lo
            if name not in maxs or hi > maxs[name]:
                maxs[name] = hi
    stats: dict[str, Any] = {"numRecords": md.num_rows}
    good_bounds = {k: v for k, v in mins.items() if k not in bad}
    if good_bounds:
        stats["minValues"] = good_bounds
        stats["maxValues"] = {
            k: v for k, v in maxs.items() if k not in bad
        }
    counted = {k: v for k, v in nulls.items() if k not in bad}
    if counted:
        stats["nullCount"] = counted
    return json.dumps(stats)


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
        stats = _add_stats(src)
        os.rename(src, os.path.join(path, name))
        add = {
            "path": name,
            "partitionValues": partition_values or {},
            "size": size,
            "modificationTime": now_ms,
            "dataChange": True,
        }
        if stats:
            add["stats"] = stats
        adds.append({"add": add})
    for f in os.listdir(staging):
        os.remove(os.path.join(staging, f))
    os.rmdir(staging)
    return adds


def _stage_partitioned(
    df: DataFrame, path: str, partition_by: list[str]
) -> list[dict[str, Any]]:
    """Stage all partitions in ONE ``partitionBy`` Spark write (executors
    split rows into hive-layout directories; data files exclude the
    partition columns, per the protocol), then walk the staging tree to
    build add actions with partitionValues parsed from the directory
    names.  One job regardless of partition count — the previous
    per-partition filtered-write loop issued O(#partitions) jobs plus a
    driver-side distinct().collect()."""
    import shutil
    from urllib.parse import unquote

    staging = os.path.join(path, f"_staging_{uuid.uuid4().hex}")
    df.write.mode("overwrite").partitionBy(*partition_by).parquet(staging)
    adds: list[dict[str, Any]] = []
    now_ms = int(time.time() * 1000)
    for root, _dirs, files in os.walk(staging):
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            rel_dir = os.path.relpath(root, staging)
            segs = [] if rel_dir == "." else rel_dir.split(os.sep)
            pv: dict[str, Optional[str]] = {}
            for s in segs:
                k, _, val = s.partition("=")
                pv[k] = None if val == "__HIVE_DEFAULT_PARTITION__" else unquote(val)
            name = f"part-{uuid.uuid4().hex}.snappy.parquet"
            os.makedirs(os.path.join(path, *segs), exist_ok=True)
            src = os.path.join(root, f)
            size = os.path.getsize(src)
            stats = _add_stats(src)
            os.rename(src, os.path.join(path, *segs, name))
            add = {
                "path": "/".join([*segs, name]),
                "partitionValues": {c: pv.get(c) for c in partition_by},
                "size": size,
                "modificationTime": now_ms,
                "dataChange": True,
            }
            if stats:
                add["stats"] = stats
            adds.append({"add": add})
    shutil.rmtree(staging)
    return adds


def _conform(
    df: DataFrame, schema: T.StructType, fill_missing: bool = False
) -> DataFrame:
    """Align column order and types to the table schema; refuse on
    missing columns unless ``fill_missing`` (mergeSchema semantics:
    absent columns land as typed NULLs).  Name-only validation previously
    let a type-mismatched append commit parquet whose physical types
    disagreed with the metaData schemaString (ADVICE r1)."""
    missing = [f.name for f in schema.fields if f.name not in df.columns]
    if missing and not fill_missing:
        raise DeltaProtocolError(f"schema mismatch: input missing columns {missing}")
    extra = [c for c in df.columns if c not in {f.name for f in schema.fields}]
    if extra:
        raise DeltaProtocolError(
            f"schema mismatch: input has columns not in table schema: {extra}"
        )
    return df.select(
        *[
            (
                F.col(f.name) if f.name in df.columns else F.lit(None)
            ).cast(f.dataType).alias(f.name)
            for f in schema.fields
        ]
    )


def _col_mapping(st: "_State") -> Optional[dict[str, str]]:
    """logical → physical top-level column names when column mapping is
    active (the reader resolves by ``delta.columnMapping.physicalName``
    for both 'name' and 'id' modes); None when mapping is off."""
    if (st.configuration.get("delta.columnMapping.mode") or "none") == "none":
        return None
    sj = json.loads(st.schema_json)
    return {
        f["name"]: (f.get("metadata") or {}).get(
            "delta.columnMapping.physicalName", f["name"]
        )
        for f in sj["fields"]
    }


def _col_field_ids(st: "_State") -> dict[str, Optional[int]]:
    """logical column → column-mapping field id (None when unassigned)."""
    sj = json.loads(st.schema_json)
    out: dict[str, Optional[int]] = {}
    for f in sj["fields"]:
        fid = (f.get("metadata") or {}).get("delta.columnMapping.id")
        out[f["name"]] = int(fid) if fid is not None else None
    return out


def _to_physical(
    df: DataFrame,
    mapping: Optional[dict[str, str]],
    field_ids: Optional[dict[str, Optional[int]]] = None,
) -> DataFrame:
    """Rename logical columns to their physical parquet names before a
    staged write, stamping each with its ``parquet.field.id`` (the spec
    requires mapped writers to embed field ids — 'id'-mode readers,
    including this module's, resolve by id and fail on files without
    them).  No-op when mapping is off."""
    if not mapping:
        return df
    cols = []
    for c in df.columns:
        fid = (field_ids or {}).get(c)
        if fid is not None:
            cols.append(
                F.col(c).alias(
                    mapping.get(c, c), metadata={"parquet.field.id": fid}
                )
            )
        else:
            cols.append(F.col(c).alias(mapping.get(c, c)))
    return df.select(*cols)


def rename_column_delta(
    path: str, old: str, new: str, check_only: bool = False
) -> int:
    """Metadata-only column rename on a Delta table — the Delta twin of
    ``rename_column_iceberg`` (extension territory: the reference does
    no ALTER propagation at all, SURVEY §1.3).

    The first rename enables ``columnMapping.mode=name``, assigning
    every existing field a column-mapping id and a physical name equal
    to its CURRENT name — so no data file is rewritten, existing
    parquet resolves through the mapping, and only the logical name
    changes (this module's own reader and DML paths resolve physical
    names; delta-spark does the same).  Later renames just flip the
    logical name again.

    Restrictions (refused loudly, nothing committed): partitioned
    tables (pre-mapping add actions key partitionValues by logical
    name, which mapping would reinterpret).  CDF-enabled tables rename
    fine: cdc files written before mapping carry names equal to the
    physical names mapping assigns, and DML after the rename stages
    physical-named ``_change_data`` files — read_delta_cdf resolves
    both eras through the mapping (VERDICT r8 task 4).

    Idempotent: when ``old`` is already gone and ``new`` already exists,
    the rename is treated as done and the current version returned —
    so a caller retrying a multi-export rename after a transient
    failure (concurrent-commit conflict on a later export) does not
    dead-end on the exports that already succeeded.

    ``check_only`` runs the restriction checks and returns without
    committing — the engine's pre-flight, so the refusal conditions
    live in exactly one place."""
    _adds, _schema, partition_cols, st = _replay(path)
    if partition_cols:
        raise DeltaProtocolError(
            "rename on a partitioned Delta table is not supported "
            "(partitionValues of existing files are keyed by the "
            "pre-mapping column names)"
        )
    if check_only:
        return st.last_v
    sj = json.loads(st.schema_json)
    names = [f["name"] for f in sj["fields"]]
    if old not in names and new in names:
        return st.last_v  # already renamed (retry after partial failure)
    if old not in names:
        raise DeltaProtocolError(f"no column {old!r} to rename")
    if new in names:
        raise DeltaProtocolError(f"column {new!r} already exists")
    max_id = int(st.configuration.get("delta.columnMapping.maxColumnId") or 0)
    fields = []
    for f in sj["fields"]:
        md = dict(f.get("metadata") or {})
        if "delta.columnMapping.id" not in md:
            max_id += 1
            md["delta.columnMapping.id"] = max_id
            md["delta.columnMapping.physicalName"] = f["name"]
        nf = dict(f)
        nf["metadata"] = md
        if f["name"] == old:
            nf["name"] = new
        fields.append(nf)
    cfg = dict(st.configuration)
    cfg["delta.columnMapping.mode"] = "name"
    cfg["delta.columnMapping.maxColumnId"] = str(max_id)
    md_action = dict(st.metadata)
    md_action["schemaString"] = json.dumps({**sj, "fields": fields})
    md_action["configuration"] = cfg
    actions: list[dict[str, Any]] = []
    proto = st.protocol
    rv = proto.get("minReaderVersion", 1)
    wv = proto.get("minWriterVersion", 2)
    if rv >= 3 or wv >= 7:
        # table-features protocol: columnMapping is a reader-writer
        # feature and must be listed on both sides
        rf = set(proto.get("readerFeatures") or []) | {"columnMapping"}
        wf = set(proto.get("writerFeatures") or []) | {"columnMapping"}
        if rf != set(proto.get("readerFeatures") or []) or wf != set(
            proto.get("writerFeatures") or []
        ):
            actions.append(
                {
                    "protocol": {
                        "minReaderVersion": max(rv, 3),
                        "minWriterVersion": max(wv, 7),
                        "readerFeatures": sorted(rf),
                        "writerFeatures": sorted(wf),
                    }
                }
            )
    elif rv < 2 or wv < 5:
        # legacy protocol: column mapping needs reader 2 / writer 5
        actions.append(
            {
                "protocol": {
                    "minReaderVersion": max(rv, 2),
                    "minWriterVersion": max(wv, 5),
                }
            }
        )
    actions.append({"metaData": md_action})
    actions.append(
        {
            "commitInfo": {
                "timestamp": int(time.time() * 1000),
                "operation": "RENAME COLUMN",
                "operationParameters": {"from": old, "to": new},
            }
        }
    )
    v = st.last_v + 1
    _commit(path, v, actions)
    return v


def drop_column_delta(path: str, col: str, check_only: bool = False) -> int:
    """Metadata-only column drop on a Delta table — the Delta twin of
    ``drop_column_iceberg`` and the DROP half of
    :func:`rename_column_delta`'s mapping machinery.

    Enabling ``columnMapping.mode=name`` first (ids + physical names
    assigned to every surviving field, physical = current name) means
    existing parquet keeps the dropped column's bytes while the logical
    schema no longer lists it — no data file is rewritten, and readers
    (this module's and delta-spark's) resolve the surviving columns
    through the mapping.  Partitioned tables are refused for the same
    pre-mapping partitionValues reason as rename; ``check_only`` runs
    only the restriction checks (the engine's pre-flight)."""
    _adds, _schema, partition_cols, st = _replay(path)
    if partition_cols:
        raise DeltaProtocolError(
            "drop column on a partitioned Delta table is not supported "
            "(partitionValues of existing files are keyed by the "
            "pre-mapping column names)"
        )
    if check_only:
        return st.last_v
    sj = json.loads(st.schema_json)
    names = [f["name"] for f in sj["fields"]]
    if col not in names:
        return st.last_v  # already dropped (retry after partial failure)
    max_id = int(st.configuration.get("delta.columnMapping.maxColumnId") or 0)
    fields = []
    for f in sj["fields"]:
        if f["name"] == col:
            continue
        md = dict(f.get("metadata") or {})
        if "delta.columnMapping.id" not in md:
            max_id += 1
            md["delta.columnMapping.id"] = max_id
            md["delta.columnMapping.physicalName"] = f["name"]
        fields.append({**f, "metadata": md})
    cfg = dict(st.configuration)
    cfg["delta.columnMapping.mode"] = "name"
    cfg["delta.columnMapping.maxColumnId"] = str(max_id)
    md_action = dict(st.metadata)
    md_action["schemaString"] = json.dumps({**sj, "fields": fields})
    md_action["configuration"] = cfg
    actions: list[dict[str, Any]] = []
    proto = st.protocol
    rv = proto.get("minReaderVersion", 1)
    wv = proto.get("minWriterVersion", 2)
    if rv >= 3 or wv >= 7:
        rf = set(proto.get("readerFeatures") or []) | {"columnMapping"}
        wf = set(proto.get("writerFeatures") or []) | {"columnMapping"}
        if rf != set(proto.get("readerFeatures") or []) or wf != set(
            proto.get("writerFeatures") or []
        ):
            actions.append(
                {
                    "protocol": {
                        "minReaderVersion": max(rv, 3),
                        "minWriterVersion": max(wv, 7),
                        "readerFeatures": sorted(rf),
                        "writerFeatures": sorted(wf),
                    }
                }
            )
    elif rv < 2 or wv < 5:
        actions.append(
            {
                "protocol": {
                    "minReaderVersion": max(rv, 2),
                    "minWriterVersion": max(wv, 5),
                }
            }
        )
    actions.append({"metaData": md_action})
    actions.append(
        {
            "commitInfo": {
                "timestamp": int(time.time() * 1000),
                "operation": "DROP COLUMNS",
                "operationParameters": {"columns": json.dumps([col])},
            }
        }
    )
    v = st.last_v + 1
    _commit(path, v, actions)
    return v


def write_delta(
    df: DataFrame,
    path: str,
    mode: str = "error",
    partition_by: Optional[list[str]] = None,
    merge_schema: bool = False,
    configuration: Optional[dict[str, str]] = None,
) -> int:
    """Write a DataFrame as a Delta table (create / append / overwrite).

    Emits protocol-v1 actions readable by any Delta implementation, and a
    parquet checkpoint every ``CHECKPOINT_INTERVAL`` commits.  Returns
    the committed version.

    ``merge_schema`` (appends): the mergeSchema evolution path — input
    columns the table lacks WIDEN the schema (a new metaData action in
    the same commit; earlier files surface typed NULLs at scan, which
    the reader already handles by imposing the latest schema), and table
    columns the input lacks land as typed NULLs.

    ``configuration`` (create only): table properties for the metaData
    action.  ``delta.enableChangeDataFeed='true'`` turns on Change Data
    Feed — DV DML commits then also persist ``_change_data/`` files via
    ``cdc`` actions (read back with :func:`read_delta_cdf`), and the
    protocol advertises minWriterVersion 4 as the CDF spec requires.
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
        cfg = dict(configuration or {})
        writer_v = 4 if cfg.get("delta.enableChangeDataFeed") == "true" else 2
        actions: list[dict[str, Any]] = [
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": writer_v}},
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": json.dumps(df.schema.jsonValue()),
                    "partitionColumns": partition_by,
                    "configuration": cfg,
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
    mapping = _col_mapping(st)
    if mapping and partition_cols:
        raise DeltaProtocolError(
            "writing to a column-mapped PARTITIONED Delta table is not "
            "supported"
        )
    if partition_by is not None and list(partition_by) != partition_cols:
        raise DeltaProtocolError(
            f"table is partitioned by {partition_cols}, got {list(partition_by)}"
        )
    actions = []
    field_ids = _col_field_ids(st) if mapping is not None else None
    if merge_schema and mode == "append":
        known = {f.name for f in schema.fields}
        new_fields = [
            T.StructField(f.name, f.dataType, True)
            for f in df.schema.fields
            if f.name not in known
        ]
        if new_fields:
            schema = T.StructType(list(schema.fields) + new_fields)
            md = dict(st.metadata)
            if mapping is not None:
                # mapped tables: every field needs a column-mapping id
                # and a FRESH unique physical name (delta-spark uses
                # col-<uuid>).  Reusing the logical name collides when a
                # column is re-added after a rename — e.g. rename a→b
                # (physical stays 'a') then add a new 'a': two fields
                # with physicalName 'a' (ADVICE r8 medium).
                sj = json.loads(st.schema_json)
                max_id = int(
                    st.configuration.get("delta.columnMapping.maxColumnId")
                    or 0
                )
                taken = set(mapping.values())
                for f in new_fields:
                    max_id += 1
                    phys = f"col-{uuid.uuid4()}"
                    while phys in taken:  # vanishingly unlikely
                        phys = f"col-{uuid.uuid4()}"
                    taken.add(phys)
                    sj["fields"].append(
                        {
                            "name": f.name,
                            "type": f.dataType.jsonValue(),
                            "nullable": True,
                            "metadata": {
                                "delta.columnMapping.id": max_id,
                                "delta.columnMapping.physicalName": phys,
                            },
                        }
                    )
                    mapping[f.name] = phys
                    field_ids[f.name] = max_id
                cfg = dict(st.configuration)
                cfg["delta.columnMapping.maxColumnId"] = str(max_id)
                md["schemaString"] = json.dumps(sj)
                md["configuration"] = cfg
            else:
                md["schemaString"] = json.dumps(schema.jsonValue())
            actions.append({"metaData": md})
    df = _conform(df, schema, fill_missing=merge_schema)
    df = _to_physical(df, mapping, field_ids)
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


def with_occ_retry(op, attempts: int = 3):
    """Optimistic-concurrency wrapper for commit operations.

    Every mutator in this module (write_delta append/overwrite,
    delete_where_dv, update_where_dv, compact_delta) replays the log,
    derives its actions from that snapshot, and commits at
    ``last_version + 1`` via rename-into-place — so a concurrent writer
    surfaces as DeltaProtocolError("concurrent commit at version N"),
    never as silent clobbering.  The correct reaction is the one
    delta-spark takes: re-run the WHOLE operation (the re-replay sees
    the winner's commit and re-derives against fresh state), not just
    re-rename the stale actions.  ``op`` must therefore be a zero-arg
    callable wrapping the full operation::

        with_occ_retry(lambda: delete_where_dv(spark, path, "k = 5"))
    """
    last: Optional[DeltaProtocolError] = None
    for _ in range(attempts):
        try:
            return op()
        except DeltaProtocolError as exc:
            if "concurrent commit" not in str(exc):
                raise
            last = exc
    raise DeltaProtocolError(
        f"commit contention persisted through {attempts} attempts"
    ) from last


def _probe_dv_blobs(
    spark: SparkSession,
    path: str,
    condition: Optional[str],
    adds: list[dict],
    schema: T.StructType,
    partition_cols: list[str],
    keys: Optional[tuple[DataFrame, list[str]]] = None,
    mapping: Optional[dict[str, str]] = None,
) -> list[tuple[str, bytes, int]]:
    """Find rows matching ``condition`` and serialize one roaring64
    deletion bitmap per touched file, entirely executor-side.

    The probe scans every live file with the hidden
    ``_metadata.file_path`` / ``_metadata.row_index`` columns, filters by
    the predicate (pushed into the parquet scan by Catalyst), then groups
    the matched physical positions per file with ``applyInPandas``.  Each
    worker merges the file's EXISTING deletion vector (parsed from the
    sidecar — same shared storage the data files live on) before
    serializing, so repeat deletes accumulate rather than replace.  Files
    whose matches are all already-deleted positions emit nothing, which
    keeps "DELETE matching no live rows" a true no-op for the caller.

    Driver traffic is O(#touched files) rows of (uri, bytes,
    cardinality) — never the matched positions — so a predicate DELETE
    over a 100 TB table stays executor-bound.
    """
    import pandas as pd

    def scan(read_schema: T.StructType, group_adds: list[dict]) -> DataFrame:
        if mapping:
            # column-mapped files store physical names: read physically,
            # alias back to logical so predicates/keys resolve
            phys_schema = T.StructType(
                [
                    T.StructField(
                        mapping.get(f.name, f.name), f.dataType, True
                    )
                    for f in read_schema.fields
                ]
            )
            return spark.read.schema(phys_schema).parquet(
                *[os.path.join(path, a["path"]) for a in group_adds]
            ).select(
                *[
                    F.col(mapping.get(f.name, f.name)).alias(f.name)
                    for f in read_schema.fields
                ],
                F.col("_metadata.file_path").alias("__dv_fp"),
                F.col("_metadata.row_index").alias("__dv_pos"),
            )
        return spark.read.schema(read_schema).parquet(
            *[os.path.join(path, a["path"]) for a in group_adds]
        ).select(
            "*",
            F.col("_metadata.file_path").alias("__dv_fp"),
            F.col("_metadata.row_index").alias("__dv_pos"),
        )

    if partition_cols:
        # data files lack partition columns; re-attach from add actions
        # as typed literals so the predicate can reference them
        data_schema = T.StructType(
            [f for f in schema.fields if f.name not in partition_cols]
        )
        ptypes = {
            f.name: f.dataType for f in schema.fields if f.name in partition_cols
        }
        groups: dict[tuple, list[dict]] = {}
        for a in adds:
            pv = a.get("partitionValues") or {}
            groups.setdefault(
                tuple(pv.get(c) for c in partition_cols), []
            ).append(a)
        parts = []
        for key, group_adds in groups.items():
            df = scan(data_schema, group_adds)
            for c, val in zip(partition_cols, key):
                lit = F.lit(None) if val is None else F.lit(val)
                df = df.withColumn(c, lit.cast(ptypes[c]))
            parts.append(df)
        full = parts[0]
        for p in parts[1:]:
            full = full.unionByName(p)
    else:
        full = scan(schema, adds)

    if keys is not None:
        keys_df, key_cols = keys
        matched = full.join(keys_df, on=list(key_cols), how="leftsemi").select(
            "__dv_fp", "__dv_pos"
        )
    else:
        matched = full.where(condition).select("__dv_fp", "__dv_pos")

    existing_dvs = {
        "file:" + os.path.abspath(os.path.join(path, a["path"])): a["deletionVector"]
        for a in adds
        if a.get("deletionVector")
    }
    out_schema = T.StructType(
        [
            T.StructField("uri", T.StringType()),
            T.StructField("data", T.BinaryType()),
            T.StructField("cardinality", T.LongType()),
        ]
    )

    def serialize(key: tuple, pdf: "pd.DataFrame") -> "pd.DataFrame":
        uri = key[0]
        new = set(int(p) for p in pdf["__dv_pos"])
        dv = existing_dvs.get(uri)
        old = set(_dv_positions(path, dv)) if dv else set()
        if not new - old:  # nothing newly deleted in this file
            return pd.DataFrame({"uri": [], "data": [], "cardinality": []})
        merged = sorted(new | old)
        return pd.DataFrame(
            {
                "uri": [uri],
                "data": [_serialize_roaring64(merged)],
                "cardinality": [len(merged)],
            }
        )

    rows = matched.groupBy("__dv_fp").applyInPandas(serialize, out_schema).collect()
    return [(r["uri"], bytes(r["data"]), int(r["cardinality"])) for r in rows]


_CDC_DIR = "_change_data"
_CHANGE_TYPE = "_change_type"


def _cdf_enabled(st: "_State") -> bool:
    return (st.configuration.get("delta.enableChangeDataFeed") or "").lower() == "true"


def _stage_cdc(
    df: DataFrame,
    path: str,
    mapping: Optional[dict[str, str]] = None,
    field_ids: Optional[dict[str, Optional[int]]] = None,
) -> list[dict[str, Any]]:
    """Persist one commit's change rows (table columns + _change_type)
    under ``_change_data/`` and return the ``cdc`` actions referencing
    them.  ``dataChange=false`` per the CDF spec: cdc files describe the
    commit, they are not table data.

    On column-mapped tables cdc parquet carries PHYSICAL column names +
    field ids, exactly like data files (Delta spec: change data files
    follow the table's column-mapping mode); ``_change_type`` itself is
    a CDF metadata column and stays unmapped."""
    df = _to_physical(df, mapping, field_ids)
    staging = os.path.join(path, f"_staging_{uuid.uuid4().hex}")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    cdc_dir = os.path.join(path, _CDC_DIR)
    os.makedirs(cdc_dir, exist_ok=True)
    actions = []
    for f in sorted(os.listdir(staging)):
        if not f.endswith(".parquet"):
            continue
        name = f"cdc-{uuid.uuid4().hex}.snappy.parquet"
        src = os.path.join(staging, f)
        size = os.path.getsize(src)
        os.rename(src, os.path.join(cdc_dir, name))
        actions.append(
            {
                "cdc": {
                    "path": f"{_CDC_DIR}/{name}",
                    "partitionValues": {},
                    "size": size,
                    "dataChange": False,
                }
            }
        )
    for f in os.listdir(staging):
        os.remove(os.path.join(staging, f))
    os.rmdir(staging)
    return actions


def read_delta_cdf(
    spark: SparkSession,
    path: str,
    start_version: int = 0,
    end_version: Optional[int] = None,
) -> DataFrame:
    """Change Data Feed read for commits ``start_version..end_version``
    (inclusive): table columns + ``_change_type`` ∈ {insert,
    update_preimage, update_postimage, delete} + ``_commit_version`` +
    ``_commit_timestamp`` — the same shape delta-spark's
    ``table_changes`` returns.

    Per the CDF spec, a commit's changes come from its ``cdc`` actions
    when present; an add-only data commit (plain WRITE/append) derives
    ``insert`` rows from its added files; a commit that removed or
    DV-masked rows WITHOUT writing cdc actions cannot be derived and
    raises (enable ``delta.enableChangeDataFeed`` before the DML).
    Compaction commits (``dataChange=false``) contribute nothing.
    """
    _adds, schema, partition_cols, st = _replay(path)
    # column-mapped tables: cdc and data parquet carry PHYSICAL column
    # names (stable across renames — mapping enablement sets physical =
    # then-current logical, so even pre-mapping files match).  Read with
    # the physical schema, then alias back to logical, exactly like the
    # data scan path — a renamed CDF export keeps its whole feed
    # (VERDICT r8 task 4).
    mapping = _col_mapping(st) or {}

    def _phys_fields(fields: list[T.StructField]) -> list[T.StructField]:
        return [
            T.StructField(mapping.get(f.name, f.name), f.dataType, True)
            for f in fields
        ]

    def _to_logical(df: DataFrame, fields: list[T.StructField]) -> DataFrame:
        if not mapping:
            return df
        keep = [c for c in df.columns if c not in
                {mapping.get(f.name, f.name) for f in fields}]
        return df.select(
            *[F.col(mapping.get(f.name, f.name)).alias(f.name) for f in fields],
            *keep,
        )
    if end_version is None:
        end_version = st.last_v
    log_dir = os.path.join(path, _LOG)
    cdc_pieces: list[tuple[str, int]] = []          # (relpath, version)
    ins_pieces: list[tuple[str, int, dict]] = []    # (relpath, version, partitionValues)
    ts_by_version: dict[int, int] = {}
    for v, fname in _log_files(path):
        if v < start_version or v > end_version:
            continue
        cdc_here: list[dict] = []
        adds_here: list[dict] = []
        removed = dv_masked = False
        with open(os.path.join(log_dir, fname)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                act = json.loads(line)
                if "cdc" in act:
                    cdc_here.append(act["cdc"])
                elif "add" in act and act["add"].get("dataChange", True):
                    if act["add"].get("deletionVector"):
                        dv_masked = True
                    else:
                        adds_here.append(act["add"])
                elif "remove" in act and act["remove"].get("dataChange", True):
                    removed = True
                elif "commitInfo" in act:
                    ts_by_version[v] = act["commitInfo"].get(
                        "timestamp", int(os.path.getmtime(os.path.join(log_dir, fname)) * 1000)
                    )
        if cdc_here:
            cdc_pieces.extend((c["path"], v) for c in cdc_here)
        elif removed or dv_masked:
            raise DeltaProtocolError(
                f"commit {v} changed existing rows without cdc actions; "
                "its change feed cannot be derived — create the table with "
                "delta.enableChangeDataFeed='true'"
            )
        else:
            ins_pieces.extend(
                (a["path"], v, a.get("partitionValues") or {}) for a in adds_here
            )
        ts_by_version.setdefault(
            v, int(os.path.getmtime(os.path.join(log_dir, fname)) * 1000)
        )
    out_schema = T.StructType(
        list(schema.fields)
        + [
            T.StructField(_CHANGE_TYPE, T.StringType(), True),
            T.StructField("_commit_version", T.LongType(), True),
            T.StructField("_commit_timestamp", T.LongType(), True),
        ]
    )
    out_cols = [f.name for f in out_schema.fields]
    vmap_rows = [
        (os.path.basename(rel), v, ts_by_version[v])
        for rel, v in cdc_pieces
    ] + [
        (os.path.basename(rel), v, ts_by_version[v])
        for rel, v, _pv in ins_pieces
    ]
    if not vmap_rows:
        return spark.createDataFrame([], out_schema)
    vmap = F.broadcast(
        spark.createDataFrame(
            vmap_rows, "__file string, _commit_version long, _commit_timestamp long"
        )
    )
    parts: list[DataFrame] = []
    if cdc_pieces:
        cschema = T.StructType(
            _phys_fields(list(schema.fields))
            + [T.StructField(_CHANGE_TYPE, T.StringType(), True)]
        )
        cdf = (
            spark.read.schema(cschema)
            .parquet(*[os.path.join(path, rel) for rel, _v in cdc_pieces])
            .withColumn("__file", F.element_at(F.split(F.input_file_name(), "/"), -1))
        )
        cdf = _to_logical(cdf, list(schema.fields))
        parts.append(cdf.join(vmap, "__file").select(*out_cols))
    if ins_pieces:
        # group add files by identical partition values (the columns live
        # only in the log for partitioned tables)
        data_fields = [f for f in schema.fields if f.name not in set(partition_cols)]
        by_pv: dict[tuple, list[str]] = {}
        for rel, _v, pv in ins_pieces:
            key = tuple(sorted(pv.items()))
            by_pv.setdefault(key, []).append(rel)
        for key, rels in by_pv.items():
            pv = dict(key)
            g = spark.read.schema(T.StructType(_phys_fields(data_fields))).parquet(
                *[os.path.join(path, rel) for rel in rels]
            )
            g = _to_logical(g, data_fields)
            for c in partition_cols:
                g = g.withColumn(
                    c, F.lit(pv.get(c)).cast(schema[c].dataType)
                )
            g = (
                g.withColumn(
                    "__file", F.element_at(F.split(F.input_file_name(), "/"), -1)
                )
                .withColumn(_CHANGE_TYPE, F.lit("insert"))
                .join(vmap, "__file")
            )
            parts.append(g.select(*out_cols))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _dv_protocol_actions(st: "_State") -> list[dict[str, Any]]:
    """Protocol-upgrade action for a first DV write, if needed.  When
    upgrading a legacy protocol to table features, every ACTIVE legacy
    feature must be listed — dropping one (columnMapping, or
    changeDataFeed on a CDF table) would silently remove the table's
    declared requirement, and a spec-conforming external writer honoring
    only the listed writerFeatures would stop maintaining that feature."""
    proto = st.protocol
    if proto.get("minReaderVersion", 1) >= 3 and "deletionVectors" in (
        proto.get("readerFeatures") or []
    ):
        return []
    # active legacy features, derived from the table's own state
    implied_w: set[str] = set()
    implied_r: set[str] = set()
    if (st.configuration.get("delta.columnMapping.mode") or "none") != "none":
        implied_w.add("columnMapping")
        implied_r.add("columnMapping")  # reader-writer feature
    if (st.configuration.get("delta.enableChangeDataFeed") or "").lower() == "true":
        implied_w.add("changeDataFeed")  # writer-only feature
    if (st.configuration.get("delta.appendOnly") or "").lower() == "true":
        implied_w.add("appendOnly")
    return [
        {
            "protocol": {
                "minReaderVersion": 3,
                "minWriterVersion": 7,
                "readerFeatures": sorted(
                    set(proto.get("readerFeatures") or [])
                    | {"deletionVectors"}
                    | implied_r
                ),
                "writerFeatures": sorted(
                    set(proto.get("writerFeatures") or [])
                    | {"deletionVectors"}
                    | implied_w
                ),
            }
        }
    ]


def delete_where_dv(spark: SparkSession, path: str, condition: str) -> int:
    """Merge-on-read DELETE: mark matching rows deleted via deletion
    vectors instead of rewriting files (the modern Delta writer's default
    for row-level deletes).

    One probe job finds (file, position) for matching rows via the hidden
    ``_metadata.row_index`` column; each touched file gets a .bin DV (its
    existing DV's positions merged in — row_index is the PHYSICAL
    position, stable under prior DVs) and is re-added with the descriptor
    in one atomic commit.  Untouched files are untouched — a DELETE
    hitting 0.1% of rows writes kilobytes of bitmaps, not a rewritten
    copy of the files.  Readers apply the DVs at scan time (read_delta).

    The roaring bitmaps are serialized EXECUTOR-side (applyInPandas per
    file group, _probe_dv_blobs): the driver receives one small
    (path, bytes, cardinality) row per touched file — never the matched
    positions themselves — so a predicate DELETE over a 100 TB table
    moves O(#touched files) through the driver, not O(#deleted rows).

    Returns the committed version.
    """
    adds, schema, partition_cols, st = _replay(path)
    mapping = _col_mapping(st)
    if mapping and partition_cols:
        raise DeltaProtocolError(
            "DV delete on a column-mapped PARTITIONED table is not supported"
        )
    by_uri = {
        "file:" + os.path.abspath(os.path.join(path, a["path"])): a for a in adds
    }
    if not by_uri:
        return st.last_v + 0  # empty table: nothing to do, no commit

    blobs = _probe_dv_blobs(
        spark, path, condition, adds, schema, partition_cols, mapping=mapping
    )
    if not blobs:
        return st.last_v  # no matching rows: no-op, no commit

    cdc_actions: list[dict[str, Any]] = []
    if _cdf_enabled(st):
        # the matched LIVE rows (read_delta applies existing DVs), read
        # against the pre-commit state — these ARE the deleted images
        deleted = (
            read_delta(spark, path)
            .where(condition)
            .withColumn(_CHANGE_TYPE, F.lit("delete"))
        )
        cdc_actions = _stage_cdc(deleted, path, mapping, _col_field_ids(st))

    now_ms = int(time.time() * 1000)
    actions: list[dict[str, Any]] = []
    actions.extend(_dv_protocol_actions(st))
    for uri, data, cardinality in blobs:
        a = by_uri[uri]
        dv = write_dv_blob(path, data, cardinality)
        actions.append(
            {
                "remove": {
                    "path": a["path"],
                    "deletionTimestamp": now_ms,
                    "dataChange": True,
                }
            }
        )
        actions.append({"add": {**a, "deletionVector": dv, "dataChange": True}})
    actions.extend(cdc_actions)
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "DELETE",
                "operationParameters": {"predicate": condition},
            }
        }
    )
    v = st.last_v + 1
    _commit(path, v, actions)
    if v % CHECKPOINT_INTERVAL == 0:
        write_checkpoint(path)
    return v


def update_where_dv(
    spark: SparkSession, path: str, condition: str, assignments: dict[str, str]
) -> int:
    """Merge-on-read UPDATE (the modern Delta writer's DV-backed form):
    rows matching ``condition`` are marked deleted via deletion vectors
    on their original files — no rewrite of untouched rows — and their
    updated copies (``assignments``: column -> SQL expression, evaluated
    against the pre-update row) are appended as new files, all in ONE
    atomic commit.

    Reuses the DELETE probe for the DV half: _probe_dv_blobs serializes
    per-file bitmaps executor-side and skips already-deleted positions,
    so only LIVE matched rows are tombstoned — and the rewritten-row
    scan goes through read_delta (DVs applied), so a previously deleted
    row can never be resurrected as an updated copy.  An UPDATE matching
    no live rows is a no-op (no commit).  Returns the committed version.
    """
    adds, schema, partition_cols, st = _replay(path)
    mapping = _col_mapping(st)
    if mapping and partition_cols:
        raise DeltaProtocolError(
            "DV update on a column-mapped PARTITIONED table is not supported"
        )
    by_uri = {
        "file:" + os.path.abspath(os.path.join(path, a["path"])): a for a in adds
    }
    if not by_uri:
        return st.last_v

    blobs = _probe_dv_blobs(
        spark, path, condition, adds, schema, partition_cols, mapping=mapping
    )
    if not blobs:
        return st.last_v

    names = {f.name for f in schema.fields}
    unknown = set(assignments) - names
    if unknown:
        raise DeltaProtocolError(f"assignments target unknown columns {unknown}")
    pre = read_delta(spark, path).where(condition)
    updated = pre.withColumns(
        {c: F.expr(e).cast(schema[c].dataType) for c, e in assignments.items()}
    )
    new_adds = (
        _stage_partitioned(updated, path, partition_cols)
        if partition_cols
        else _stage_parquet(
            _to_physical(updated, mapping, _col_field_ids(st)), path
        )
    )
    cdc_actions: list[dict[str, Any]] = []
    if _cdf_enabled(st):
        change_df = pre.withColumn(
            _CHANGE_TYPE, F.lit("update_preimage")
        ).unionByName(
            updated.withColumn(_CHANGE_TYPE, F.lit("update_postimage"))
        )
        cdc_actions = _stage_cdc(change_df, path, mapping, _col_field_ids(st))

    now_ms = int(time.time() * 1000)
    actions: list[dict[str, Any]] = []
    actions.extend(_dv_protocol_actions(st))
    for uri, data, cardinality in blobs:
        a = by_uri[uri]
        dv = write_dv_blob(path, data, cardinality)
        actions.append(
            {
                "remove": {
                    "path": a["path"],
                    "deletionTimestamp": now_ms,
                    "dataChange": True,
                }
            }
        )
        actions.append({"add": {**a, "deletionVector": dv, "dataChange": True}})
    actions.extend(new_adds)
    actions.extend(cdc_actions)
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "UPDATE",
                "operationParameters": {"predicate": condition},
            }
        }
    )
    v = st.last_v + 1
    _commit(path, v, actions)
    if v % CHECKPOINT_INTERVAL == 0:
        write_checkpoint(path)
    return v


def compact_delta(
    spark: SparkSession,
    path: str,
    target_files: Optional[int] = None,
    sort_by: Optional[list[str]] = None,
    zorder_by: Optional[list[str]] = None,
    zorder_method: str = "linear",
) -> int:
    """OPTIMIZE-style compaction: rewrite the current state (deletion
    vectors folded in — the rewritten files contain only surviving rows)
    and commit one version that removes every current add.  This is the
    DV lifecycle's closing step: accumulate cheap merge-on-read deletes,
    then fold them into clean files in one maintenance pass.

    ``sort_by`` range-clusters the rewrite: files get DISJOINT value
    ranges on the sort columns, which the per-add stats JSON turns into
    file skipping for any delta reader.  ``zorder_by`` (mutually
    exclusive) clusters on the Morton interleave of several columns —
    OPTIMIZE ... ZORDER — so a range_filter on ANY of them skips files.
    Partitioned tables sort within partition clusters.

    add/remove actions carry ``dataChange: false`` (per the protocol,
    OPTIMIZE does not change table content), so CDC-style readers skip
    the rewrite.  Returns the committed version.
    """
    adds, schema, partition_cols, st = _replay(path)
    mapping = _col_mapping(st)
    if mapping and partition_cols:
        raise DeltaProtocolError(
            "compacting a column-mapped PARTITIONED table is not supported"
        )
    if sort_by and zorder_by:
        raise DeltaProtocolError("sort_by and zorder_by are mutually exclusive")
    df = read_delta(spark, path)
    if sort_by:
        missing = [c for c in sort_by if c not in df.columns]
        if missing:
            raise DeltaProtocolError(f"sort_by columns {missing} not in table")
        if partition_cols:
            df = df.repartition(
                *([target_files] if target_files is not None else []),
                *partition_cols,
            ).sortWithinPartitions(*sort_by)
        else:
            df = df.repartitionByRange(
                *([target_files] if target_files is not None else []),
                *sort_by,
            ).sortWithinPartitions(*sort_by)
    elif zorder_by:
        from pg_mooncake_spark.functions.zorder import zorder_key

        zk = zorder_key(df, list(zorder_by), method=zorder_method)
        if partition_cols:
            df = df.repartition(
                *([target_files] if target_files is not None else []),
                *partition_cols,
            ).sortWithinPartitions(zk)
        else:
            df = df.repartitionByRange(
                *([target_files] if target_files is not None else []),
                zk,
            ).sortWithinPartitions(zk)
    elif target_files is not None:
        df = df.repartition(target_files)
    new_adds = (
        _stage_partitioned(df, path, partition_cols)
        if partition_cols
        else _stage_parquet(
            _to_physical(df, mapping, _col_field_ids(st)), path
        )
    )
    now_ms = int(time.time() * 1000)
    actions: list[dict[str, Any]] = []
    for a in adds:
        actions.append(
            {
                "remove": {
                    "path": a["path"],
                    "deletionTimestamp": now_ms,
                    "dataChange": False,
                }
            }
        )
    for a in new_adds:
        a["add"]["dataChange"] = False
        actions.append(a)
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "OPTIMIZE",
                "operationParameters": (
                    {"sortBy": json.dumps(sort_by)}
                    if sort_by
                    else {"zOrderBy": json.dumps(zorder_by)}
                    if zorder_by
                    else {}
                ),
            }
        }
    )
    v = st.last_v + 1
    _commit(path, v, actions)
    if v % CHECKPOINT_INTERVAL == 0:
        write_checkpoint(path)
    return v


def vacuum_delta(path: str, retention_ms: int = 7 * 24 * 3600 * 1000) -> list[str]:
    """Physically delete data/DV files no longer referenced by the
    CURRENT version, once their tombstones age past ``retention_ms``
    (default 7 days, the protocol's standard).  Time travel to versions
    needing the removed files stops working — that is vacuum's contract.

    Returns the deleted paths.  Driver-side file walking is proportional
    to the table's file count, same as the reference's vacuum.
    """
    adds, _, _, st = _replay(path)
    live: set[str] = set()
    for a in adds:
        live.add(os.path.normpath(os.path.join(path, a["path"])))
        dv = a.get("deletionVector")
        if dv and dv.get("storageType") != "i":
            live.add(os.path.normpath(_dv_sidecar_path(path, dv)))
    cutoff = time.time() * 1000 - retention_ms
    # tombstone timestamps are authoritative: a file tombstoned five
    # minutes ago keeps its retention clock even if the FILE's mtime is
    # ancient (normal after a compaction of old data)
    tombstone_ts = {
        os.path.normpath(os.path.join(path, r["path"])): r.get("deletionTimestamp") or 0
        for r in st.tombstones.values()
    }
    deleted: list[str] = []
    for root, dirs, files in os.walk(path):
        if _LOG in root:
            continue
        dirs[:] = [d for d in dirs if d != _LOG and not d.startswith("_staging_")]
        for f in files:
            full = os.path.normpath(os.path.join(root, f))
            if full in live:
                continue
            if not (f.endswith(".parquet") or f.endswith(".bin")):
                continue
            if full in tombstone_ts:
                expired = tombstone_ts[full] <= cutoff
            else:  # never committed (staging leftovers): age by mtime
                expired = os.path.getmtime(full) * 1000 <= cutoff
            if expired:
                os.remove(full)
                deleted.append(full)
    return deleted


class DeltaSchemaMismatchError(DeltaProtocolError):
    """The input's columns are not a subset of the table schema — the
    caller may widen the table (mergeSchema append) and retry."""


def upsert_keys_delta(
    spark: SparkSession,
    path: str,
    keys_df: DataFrame,
    upserts_df: DataFrame,
) -> int:
    """Atomic key-batch MERGE on a Delta table: every key in ``keys_df``
    is masked out of its current file via deletion vectors (semi-join
    probe — no predicate string, so a CDC batch of arbitrary size stays
    executor-bound) and the replacement/insert images in ``upserts_df``
    are appended, all in ONE commit — the Delta analog of the Iceberg
    row-delta upsert the mirror-export sync uses.  An external reader
    never observes the state between delete and re-insert.

    With ``delta.enableChangeDataFeed`` the commit also persists its cdc
    files: pre-images of the masked keys as ``delete``, the new images
    as ``insert`` (the same vocabulary the Iceberg changelog derives).

    Raises :class:`DeltaSchemaMismatchError` when ``upserts_df`` carries
    columns the table lacks — the caller widens the schema (mergeSchema
    append) and retries, exactly like the Iceberg export-evolution path.
    Returns the committed version.
    """
    adds, schema, partition_cols, st = _replay(path)
    mapping = _col_mapping(st)
    if mapping and partition_cols:
        raise DeltaProtocolError(
            "keyed upsert on a column-mapped PARTITIONED table is not "
            "supported"
        )
    names = {f.name for f in schema.fields}
    extra = sorted(set(upserts_df.columns) - names)
    if extra:
        raise DeltaSchemaMismatchError(
            f"upsert columns {extra} differ from table schema; widen the "
            "table first (write_delta mode='append', merge_schema=True)"
        )
    key_cols = list(keys_df.columns)
    bad = sorted(set(key_cols) - names)
    if bad:
        raise DeltaSchemaMismatchError(f"key columns {bad} not in table schema")
    blobs = (
        _probe_dv_blobs(
            spark, path, None, adds, schema, partition_cols,
            keys=(keys_df, key_cols), mapping=mapping,
        )
        if adds
        else []
    )
    ups = _conform(upserts_df, schema, fill_missing=True)
    cdc_actions: list[dict[str, Any]] = []
    if _cdf_enabled(st):
        pre = (
            read_delta(spark, path)
            .join(keys_df, on=key_cols, how="leftsemi")
            .withColumn(_CHANGE_TYPE, F.lit("delete"))
        )
        change_df = pre.unionByName(
            ups.withColumn(_CHANGE_TYPE, F.lit("insert"))
        )
        cdc_actions = _stage_cdc(change_df, path, mapping, _col_field_ids(st))
    new_adds = (
        _stage_partitioned(ups, path, partition_cols)
        if partition_cols
        else _stage_parquet(
            _to_physical(ups, mapping, _col_field_ids(st)), path
        )
    )
    # a delete-only batch stages empty parquet: don't let it accrete
    # zero-row adds commit after commit (footer stats decide, like the
    # Iceberg twin)
    kept_adds = []
    for a in new_adds:
        stats = a["add"].get("stats")
        n = json.loads(stats).get("numRecords") if stats else None
        if n == 0:
            os.remove(os.path.join(path, a["add"]["path"]))
        else:
            kept_adds.append(a)
    new_adds = kept_adds
    by_uri = {
        "file:" + os.path.abspath(os.path.join(path, a["path"])): a for a in adds
    }
    now_ms = int(time.time() * 1000)
    actions: list[dict[str, Any]] = []
    if blobs:
        actions.extend(_dv_protocol_actions(st))
    for uri, data, cardinality in blobs:
        a = by_uri[uri]
        dv = write_dv_blob(path, data, cardinality)
        actions.append(
            {
                "remove": {
                    "path": a["path"],
                    "deletionTimestamp": now_ms,
                    "dataChange": True,
                }
            }
        )
        actions.append({"add": {**a, "deletionVector": dv, "dataChange": True}})
    actions.extend(new_adds)
    actions.extend(cdc_actions)
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": "MERGE",
                "operationParameters": {"matchedPredicate": "key-batch"},
            }
        }
    )
    v = st.last_v + 1
    _commit(path, v, actions)
    if v % CHECKPOINT_INTERVAL == 0:
        write_checkpoint(path)
    return v
