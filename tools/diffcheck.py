"""Local differential harness: Spark result vs DuckDB oracle.

Mimics the driver's CORRECTNESS gate: for every query in
``__spark_entry__.queries()`` that has an oracle, run both engines on the
same parquet fixtures and compare row count, column names, and
order-insensitive values.  Protocol-run (no pytest wrapper: the full
gate at sf0.01 takes ~30 min, far past any sensible test timeout — the
per-round checklist in MEMORY runs it standalone before the final
commit):  python tools/diffcheck.py [sf_dir] [name ...]
"""

from __future__ import annotations

import math
import sys

import duckdb
import pandas as pd

from pg_mooncake_spark.queries.registry import TABLES


def duck_connection(sf_dir: str) -> "duckdb.DuckDBPyConnection":
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    import decimal

    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        s = df[c]
        first = s.dropna().iloc[0] if len(s.dropna()) else None
        if s.dtype == object and isinstance(first, bytes):
            df[c] = s.apply(lambda b: b.hex() if isinstance(b, bytes) else b)
        elif s.dtype == object and isinstance(first, decimal.Decimal):
            df[c] = s.astype("float64")
        elif str(s.dtype).startswith("datetime64"):
            df[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == "float32":
            df[c] = s.astype("float64")
        elif str(s.dtype) in ("int32", "int16", "int8", "uint32", "Int32", "Int64"):
            df[c] = s.astype("float64").astype("Int64")
        elif s.dtype == "int64":
            df[c] = s.astype("Int64")
    # total sort for order-insensitive compare
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True)
    return df


def compare(spark_df, duck_df: pd.DataFrame, name: str) -> list[str]:
    """Return list of mismatch descriptions (empty = pass)."""
    import decimal

    errs: list[str] = []
    sp = spark_df.toPandas()
    # The driver hashes string representations: a Decimal on one side vs a
    # float on the other ('205941.60' vs '205941.6') is a driver hash-fail
    # even when values are numerically equal.  Flag it instead of silently
    # normalizing both to float64 (which is still done below for the value
    # comparison itself).
    for c in set(sp.columns) & set(duck_df.columns):
        def _is_dec(s):
            nn = s.dropna()
            return s.dtype == object and len(nn) and isinstance(nn.iloc[0], decimal.Decimal)
        a_dec, b_dec = _is_dec(sp[c]), _is_dec(duck_df[c])
        if a_dec != b_dec:
            side = "spark" if a_dec else "oracle"
            errs.append(
                f"{name}: col {c}: DECIMAL on {side} side only — driver string-hash "
                f"would mismatch; cast both sides to DOUBLE (or DECIMAL) explicitly"
            )
        # Same class, new spelling (r2 decimals, r3 DuckDB count_if HUGEINT):
        # an integer dtype on one side vs a float dtype on the other renders
        # '2466' vs '2466.0' under the driver's string hash.  Only flag when
        # the non-float side is genuinely integer-typed AND the float side has
        # no NaN (a nullable int column legitimately floatifies through
        # pandas on either side — those render identically).
        def _kind(s):
            d = str(s.dtype)
            if d.startswith(("int", "uint", "Int", "UInt")):
                return "int"
            if d.startswith(("float", "Float")):
                return "float"
            return None
        a_k, b_k = _kind(sp[c]), _kind(duck_df[c])
        if {a_k, b_k} == {"int", "float"}:
            fs = sp[c] if a_k == "float" else duck_df[c]
            if not fs.isna().any():
                side = "spark" if a_k == "float" else "oracle"
                errs.append(
                    f"{name}: col {c}: float dtype on {side} side vs integer on the "
                    f"other — driver string-hash would mismatch ('1.0' vs '1'); cast "
                    f"both sides to the same type (BIGINT or DOUBLE) explicitly"
                )
    if errs:
        return errs
    if sorted(sp.columns) != sorted(duck_df.columns):
        errs.append(f"{name}: columns spark={sorted(sp.columns)} duck={sorted(duck_df.columns)}")
        return errs
    if len(sp) != len(duck_df):
        errs.append(f"{name}: rowcount spark={len(sp)} duck={len(duck_df)}")
        return errs
    a, b = _normalize(sp), _normalize(duck_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        if str(av.dtype) == "float64" or str(bv.dtype) == "float64":
            bad = 0
            for x, y in zip(av.tolist(), bv.tolist()):
                xn = x is None or (isinstance(x, float) and math.isnan(x))
                yn = y is None or (isinstance(y, float) and math.isnan(y))
                if xn or yn:
                    if xn != yn:
                        bad += 1
                elif x != y and abs(x - y) > 1e-9 * max(1.0, abs(x), abs(y)):
                    bad += 1
            if bad:
                errs.append(f"{name}: col {c}: {bad}/{len(av)} float mismatches "
                            f"(e.g. spark={av.iloc[0]} duck={bv.iloc[0]})")
        else:
            neq = (av.astype(str) != bv.astype(str))
            if neq.any():
                i = int(neq.idxmax())
                errs.append(f"{name}: col {c}: {int(neq.sum())}/{len(av)} mismatches "
                            f"(row{i}: spark={av.iloc[i]!r} duck={bv.iloc[i]!r})")
    return errs


def run(sf_dir: str, only: list[str] | None = None) -> int:
    import __spark_entry__ as entrymod
    from pg_mooncake_spark.session import get_spark

    spark = get_spark("diffcheck")
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    con = duck_connection(sf_dir)
    failures = 0
    ran = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        ran += 1
        try:
            sdf = fn(spark, sf_dir)
            if name in oracles:
                ddf = con.execute(oracles[name]).df()
                errs = compare(sdf, ddf, name)
            else:
                n = sdf.count()
                errs = [] if n >= 0 else [f"{name}: no rows"]
                print(f"  (rows-only) {name}: {n} rows")
        except Exception as e:  # noqa: BLE001
            errs = [f"{name}: EXCEPTION {type(e).__name__}: {e}"]
        if errs:
            failures += 1
            for e in errs:
                print("FAIL", e[:2000])
        else:
            print("ok  ", name)
    suffix = f" (subset of {len(qs)} registered)" if only else ""
    print(f"\n{ran - failures}/{ran} queries pass{suffix}")
    return failures


if __name__ == "__main__":
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    only = [a for a in args if "/" not in a] or None
    sys.exit(1 if run(sf_dir, only) else 0)
