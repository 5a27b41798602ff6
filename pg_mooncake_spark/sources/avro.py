"""Minimal pure-Python Avro object-container reader/writer.

Implements the subset of the public Avro 1.11 spec
(avro.apache.org/docs/current/specification) that Iceberg metadata needs:
object container files with null/deflate codecs, and the full binary
encoding for records, unions, arrays, maps, enums, fixed and primitives.
Schema-driven and generic — no code generation, values decode to plain
dicts/lists keyed by field name.

Exists because the runtime image ships no Avro library, and Iceberg's
manifest chain (manifest list → manifests) is Avro: without this the
Iceberg reader can only guess at data files by globbing (sources/
iceberg.py's guarded fallback).  Logical types are returned raw (longs
for timestamps etc.) — fine for metadata fields.
"""

from __future__ import annotations

import io
import json
import os
import struct
import zlib
from typing import Any, BinaryIO, Optional

_MAGIC = b"Obj\x01"
_PRIMITIVES = {"null", "boolean", "int", "long", "float", "double", "bytes", "string"}


class AvroError(RuntimeError):
    pass


# ------------------------------------------------------------- decoding


class _Reader:
    def __init__(self, buf: bytes):
        self.b = buf
        self.pos = 0

    def read(self, n: int) -> bytes:
        if self.pos + n > len(self.b):
            raise AvroError("truncated Avro data")
        out = self.b[self.pos : self.pos + n]
        self.pos += n
        return out

    def read_long(self) -> int:
        """zigzag varint (int and long share the encoding)."""
        shift = 0
        acc = 0
        while True:
            byte = self.read(1)[0]
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def read_bytes(self) -> bytes:
        return self.read(self.read_long())


def _resolve(schema: Any, names: dict[str, Any]) -> Any:
    """Named-type references ('type': 'SomeRecord') resolve via registry."""
    if isinstance(schema, str) and schema not in _PRIMITIVES:
        if schema not in names:
            raise AvroError(f"unknown named type {schema!r}")
        return names[schema]
    return schema


def _register(schema: Any, names: dict[str, Any]) -> None:
    if isinstance(schema, dict) and schema.get("type") in ("record", "enum", "fixed"):
        name = schema.get("name")
        if name:
            names[name] = schema
            ns = schema.get("namespace")
            if ns:
                names[f"{ns}.{name}"] = schema
        for f in schema.get("fields", []) or []:
            _register(f["type"], names)
        if schema.get("type") == "record":
            pass
    elif isinstance(schema, dict) and schema.get("type") == "array":
        _register(schema["items"], names)
    elif isinstance(schema, dict) and schema.get("type") == "map":
        _register(schema["values"], names)
    elif isinstance(schema, list):
        for s in schema:
            _register(s, names)


def _decode(r: _Reader, schema: Any, names: dict[str, Any]) -> Any:
    schema = _resolve(schema, names)
    if isinstance(schema, list):  # union
        idx = r.read_long()
        if not 0 <= idx < len(schema):
            raise AvroError(f"union index {idx} out of range")
        return _decode(r, schema[idx], names)
    t = schema["type"] if isinstance(schema, dict) else schema
    if isinstance(t, (dict, list)):  # nested type object, e.g. {"type": {...}}
        return _decode(r, t, names)
    if t == "null":
        return None
    if t == "boolean":
        return r.read(1)[0] != 0
    if t in ("int", "long"):
        return r.read_long()
    if t == "float":
        return struct.unpack("<f", r.read(4))[0]
    if t == "double":
        return struct.unpack("<d", r.read(8))[0]
    if t == "bytes":
        return r.read_bytes()
    if t == "string":
        return r.read_bytes().decode("utf-8")
    if t == "record":
        return {f["name"]: _decode(r, f["type"], names) for f in schema["fields"]}
    if t == "enum":
        return schema["symbols"][r.read_long()]
    if t == "fixed":
        return r.read(schema["size"])
    if t == "array":
        out = []
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                n = -n
                r.read_long()  # block byte size, unused
            for _ in range(n):
                out.append(_decode(r, schema["items"], names))
        return out
    if t == "map":
        out_m: dict[str, Any] = {}
        while True:
            n = r.read_long()
            if n == 0:
                break
            if n < 0:
                n = -n
                r.read_long()
            for _ in range(n):
                k = r.read_bytes().decode("utf-8")
                out_m[k] = _decode(r, schema["values"], names)
        return out_m
    raise AvroError(f"unsupported Avro type {t!r}")


def read_avro(path: str) -> tuple[dict, list[Any]]:
    """Read an Avro object container file → (writer schema, records)."""
    with open(path, "rb") as fh:
        data = fh.read()
    r = _Reader(data)
    if r.read(4) != _MAGIC:
        raise AvroError(f"not an Avro container file: {path}")
    meta = _decode(r, {"type": "map", "values": "bytes"}, {})
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported Avro codec {codec!r}")
    sync = r.read(16)
    names: dict[str, Any] = {}
    _register(schema, names)
    records: list[Any] = []
    while r.pos < len(r.b):
        count = r.read_long()
        size = r.read_long()
        block = r.read(size)
        if codec == "deflate":
            block = zlib.decompress(block, -15)
        br = _Reader(block)
        for _ in range(count):
            records.append(_decode(br, schema, names))
        if r.read(16) != sync:
            raise AvroError("sync marker mismatch (corrupt block)")
    return schema, records


# ------------------------------------------------------------- encoding


class _Writer:
    def __init__(self) -> None:
        self.out = io.BytesIO()

    def write(self, b: bytes) -> None:
        self.out.write(b)

    def write_long(self, v: int) -> None:
        v = (v << 1) ^ (v >> 63) if v >= 0 else ((-v - 1) << 1 | 1)
        while True:
            bits = v & 0x7F
            v >>= 7
            if v:
                self.write(bytes([bits | 0x80]))
            else:
                self.write(bytes([bits]))
                break

    def write_bytes(self, b: bytes) -> None:
        self.write_long(len(b))
        self.write(b)


def _encode(w: _Writer, schema: Any, value: Any, names: dict[str, Any]) -> None:
    schema = _resolve(schema, names)
    if isinstance(schema, list):  # union: pick first branch accepting value
        for idx, branch in enumerate(schema):
            if _matches(branch, value, names):
                w.write_long(idx)
                _encode(w, branch, value, names)
                return
        raise AvroError(f"no union branch for {value!r} in {schema}")
    t = schema["type"] if isinstance(schema, dict) else schema
    if isinstance(t, (dict, list)):
        _encode(w, t, value, names)
        return
    if t == "null":
        return
    if t == "boolean":
        w.write(b"\x01" if value else b"\x00")
    elif t in ("int", "long"):
        w.write_long(int(value))
    elif t == "float":
        w.write(struct.pack("<f", float(value)))
    elif t == "double":
        w.write(struct.pack("<d", float(value)))
    elif t == "bytes":
        w.write_bytes(bytes(value))
    elif t == "string":
        w.write_bytes(str(value).encode("utf-8"))
    elif t == "record":
        for f in schema["fields"]:
            _encode(w, f["type"], value.get(f["name"]), names)
    elif t == "enum":
        w.write_long(schema["symbols"].index(value))
    elif t == "fixed":
        w.write(bytes(value))
    elif t == "array":
        if value:
            w.write_long(len(value))
            for item in value:
                _encode(w, schema["items"], item, names)
        w.write_long(0)
    elif t == "map":
        if value:
            w.write_long(len(value))
            for k, v in value.items():
                w.write_bytes(str(k).encode("utf-8"))
                _encode(w, schema["values"], v, names)
        w.write_long(0)
    else:
        raise AvroError(f"unsupported Avro type {t!r}")


def _matches(schema: Any, value: Any, names: dict[str, Any]) -> bool:
    schema = _resolve(schema, names)
    t = schema["type"] if isinstance(schema, dict) else schema
    if isinstance(t, (dict, list)):
        return _matches(t, value, names)
    if t == "null":
        return value is None
    if t == "boolean":
        return isinstance(value, bool)
    if t in ("int", "long"):
        return isinstance(value, int) and not isinstance(value, bool)
    if t in ("float", "double"):
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if t in ("bytes", "fixed"):
        return isinstance(value, (bytes, bytearray))
    if t in ("string", "enum"):
        return isinstance(value, str)
    if t == "record":
        return isinstance(value, dict)
    if t == "array":
        return isinstance(value, list)
    if t == "map":
        return isinstance(value, dict)
    return False


def write_avro(
    path: str,
    schema: dict,
    records: list[Any],
    codec: str = "deflate",
    sync: Optional[bytes] = None,
    extra_meta: Optional[dict[str, bytes]] = None,
) -> None:
    """Write records as an Avro object container file.

    ``extra_meta`` adds key→bytes pairs to the container's metadata map —
    Iceberg manifests require ``schema`` / ``partition-spec`` /
    ``format-version`` / ``content`` keys there (spec: Manifests,
    "file metadata").
    """
    if codec not in ("null", "deflate"):
        raise AvroError(f"unsupported Avro codec {codec!r}")
    names: dict[str, Any] = {}
    _register(schema, names)
    body = _Writer()
    for rec in records:
        _encode(body, schema, rec, names)
    block = body.out.getvalue()
    if codec == "deflate":
        comp = zlib.compressobj(9, zlib.DEFLATED, -15)
        block = comp.compress(block) + comp.flush()
    sync = sync or os.urandom(16)
    head = _Writer()
    head.write(_MAGIC)
    _encode(
        head,
        {"type": "map", "values": "bytes"},
        {
            "avro.schema": json.dumps(schema).encode("utf-8"),
            "avro.codec": codec.encode("utf-8"),
            **(extra_meta or {}),
        },
        {},
    )
    head.write(sync)
    if records:
        head.write_long(len(records))
        head.write_long(len(block))
        head.write(block)
        head.write(sync)
    with open(path, "wb") as fh:
        fh.write(head.out.getvalue())
