"""Distributed Avro data source/sink without the spark-avro jar.

The image ships Avro core jars but not the ``spark-avro`` datasource, so
``spark.read.format("avro")`` is unavailable.  This module provides the
same capability on top of the pure-Python container codec
(sources/avro.py, already load-bearing for Iceberg manifests):

- **read**: list container files driver-side (O(#files)), then parse
  records EXECUTOR-side — one task per file via ``parallelize(files)``
  + flatMap — and build typed Rows against the Spark schema derived
  from the first file's writer schema.  A 100 TB Avro corpus scans with
  per-file parallelism and no driver bottleneck; per-file decode is the
  same work the spark-avro reader's tasks do.
- **write**: ``mapPartitions`` writes one container file per partition
  (executor-side, shared storage), mirroring how every Spark file sink
  lays out output.

Schema mapping covers the shapes Avro data files use in practice:
records of primitives, ``["null", X]`` unions (→ nullable), arrays,
maps, and nested records.  Exotic branches (multi-type unions, enums,
fixed) raise loudly rather than guessing.
"""

from __future__ import annotations

import glob as _glob
import os
from typing import Any, Optional

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import types as T


class AvroSourceError(RuntimeError):
    pass


_PRIM_TO_SPARK = {
    "boolean": T.BooleanType(),
    "int": T.IntegerType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "bytes": T.BinaryType(),
}


def _avro_to_spark(t: Any) -> tuple[T.DataType, bool]:
    """Avro type → (Spark type, nullable)."""
    if isinstance(t, list):  # union
        branches = [b for b in t if b != "null"]
        if len(branches) != 1:
            raise AvroSourceError(f"unsupported Avro union {t}")
        inner, _ = _avro_to_spark(branches[0])
        return inner, True
    if isinstance(t, str):
        if t not in _PRIM_TO_SPARK:
            raise AvroSourceError(f"unsupported Avro type {t!r}")
        return _PRIM_TO_SPARK[t], False
    kind = t.get("type")
    if kind == "record":
        fields = []
        for f in t["fields"]:
            ft, nullable = _avro_to_spark(f["type"])
            fields.append(T.StructField(f["name"], ft, nullable))
        return T.StructType(fields), False
    if kind == "array":
        it, nullable = _avro_to_spark(t["items"])
        return T.ArrayType(it, nullable), False
    if kind == "map":
        vt, nullable = _avro_to_spark(t["values"])
        return T.MapType(T.StringType(), vt, nullable), False
    if kind in _PRIM_TO_SPARK:  # {"type": "long", ...} form
        return _PRIM_TO_SPARK[kind], False
    raise AvroSourceError(f"unsupported Avro type {t!r}")


def _spark_to_avro(schema: T.StructType, name: str = "r") -> dict:
    """Spark StructType → Avro record schema (nullable → null union)."""
    counter = {"n": 0}

    def conv(dt: T.DataType, nullable: bool) -> Any:
        base: Any
        if isinstance(dt, T.StructType):
            counter["n"] += 1
            base = {
                "type": "record",
                "name": f"{name}{counter['n']}",
                "fields": [
                    {
                        "name": f.name,
                        "type": conv(f.dataType, f.nullable),
                        "default": None,
                    }
                    for f in dt.fields
                ],
            }
        elif isinstance(dt, T.ArrayType):
            base = {"type": "array",
                    "items": conv(dt.elementType, dt.containsNull)}
        elif isinstance(dt, T.MapType):
            if not isinstance(dt.keyType, T.StringType):
                raise AvroSourceError("Avro map keys must be strings")
            base = {"type": "map",
                    "values": conv(dt.valueType, dt.valueContainsNull)}
        else:
            prim = {
                T.BooleanType: "boolean",
                T.IntegerType: "int",
                T.ShortType: "int",
                T.ByteType: "int",
                T.LongType: "long",
                T.FloatType: "float",
                T.DoubleType: "double",
                T.StringType: "string",
                T.BinaryType: "bytes",
            }.get(type(dt))
            if prim is None:
                raise AvroSourceError(
                    f"cannot map Spark type {dt.simpleString()} to Avro"
                )
            base = prim
        return ["null", base] if nullable else base

    return {
        "type": "record",
        "name": name,
        "fields": [
            {"name": f.name, "type": conv(f.dataType, f.nullable),
             "default": None}
            for f in schema.fields
        ],
    }


def _list_files(path: str) -> list[str]:
    if os.path.isdir(path):
        files = sorted(
            _glob.glob(os.path.join(path, "**", "*.avro"), recursive=True)
        )
    else:
        files = sorted(_glob.glob(path))
    if not files:
        raise AvroSourceError(f"no Avro files at {path}")
    return files


def read_avro_files(
    spark: SparkSession, path: str, schema: Optional[T.StructType] = None
) -> DataFrame:
    """Read Avro container files (a directory, file, or glob) as a
    DataFrame.  One executor task per file; records decode worker-side
    with the pure-Python codec (see module doc for the scale shape)."""
    from pg_mooncake_spark.sources.avro import read_avro

    files = _list_files(path)
    if schema is None:
        writer_schema, _ = read_avro(files[0])  # header only needs 1 file
        spark_schema, _ = _avro_to_spark(writer_schema)
        if not isinstance(spark_schema, T.StructType):
            raise AvroSourceError("top-level Avro schema must be a record")
    else:
        spark_schema = schema
    names = [f.name for f in spark_schema.fields]

    def parse(fpath: str):
        _, records = read_avro(fpath)
        for rec in records:
            yield tuple(rec.get(n) for n in names)

    rdd = spark.sparkContext.parallelize(files, len(files)).flatMap(parse)
    return spark.createDataFrame(rdd, spark_schema)


def write_avro_files(df: DataFrame, path: str) -> list[str]:
    """Write a DataFrame as Avro container files, one per partition,
    executor-side (every partition serializes its own rows; the driver
    only collects the written file names).  Returns the file paths."""
    from pg_mooncake_spark.sources.avro import write_avro

    os.makedirs(path, exist_ok=True)
    avro_schema = _spark_to_avro(df.schema)
    names = [f.name for f in df.schema.fields]

    def dump(idx: int, rows) -> Any:
        records = [r.asDict(recursive=True) for r in rows]
        if not records:
            return iter(())
        fpath = os.path.join(path, f"part-{idx:05d}.avro")
        write_avro(fpath, avro_schema, records)
        return iter([fpath])

    return sorted(df.rdd.mapPartitionsWithIndex(dump).collect())
