"""Z-order (Morton) clustering expression — the multi-column analog of a
linear sort for data skipping.

A single-column sorted rewrite gives disjoint per-file ranges on ONE
column; filters on any other column still scan every file.  Interleaving
the bits of each column's normalized position makes files cluster in a
space-filling curve: a range filter on ANY of the z-ordered columns
skips most files (the OPTIMIZE ... ZORDER use-case).

Normalization here is linear min/max scaling to 16-bit positions —
bounded driver traffic (one min/max aggregate), no global sort, no
single-partition ntile bottleneck.  Heavily skewed columns cluster less
evenly than a rank-based scaling would; the skipping stays sound either
way because pruning only ever reads the per-file bounds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BITS = 16  # per-column resolution: 2^16 cells per dimension


def zorder_key(df: DataFrame, cols: list[str]) -> Column:
    """Morton key Column over ``cols`` (numeric/date/timestamp).

    One driver-side min/max aggregate bounds each column; every row's
    value scales linearly to a 16-bit cell index; the indexes' bits
    interleave into one LONG, entirely in JVM expressions (shiftleft /
    bitwise-or) — no UDF, no shuffle of its own.  NULLs sort first
    (cell 0).
    """
    if not cols:
        raise ValueError("zorder needs at least one column")
    dtypes = dict(df.dtypes)
    missing = [c for c in cols if c not in dtypes]
    if missing:
        raise ValueError(f"zorder columns {missing} not in DataFrame")

    def as_num(c: str) -> Column:
        t = dtypes[c]
        if t == "date":
            return F.datediff(F.col(c), F.lit("1970-01-01")).cast("double")
        if t.startswith("timestamp"):
            return F.unix_micros(F.col(c)).cast("double")
        return F.col(c).cast("double")

    bounds = df.agg(
        *[F.min(as_num(c)).alias(f"lo_{c}") for c in cols],
        *[F.max(as_num(c)).alias(f"hi_{c}") for c in cols],
    ).collect()[0]
    cells = []
    for c in cols:
        lo, hi = bounds[f"lo_{c}"], bounds[f"hi_{c}"]
        if lo is None or hi is None or hi <= lo:
            cells.append(F.lit(0).cast("long"))
            continue
        scaled = (
            (as_num(c) - F.lit(float(lo)))
            / F.lit(float(hi) - float(lo))
            * F.lit((1 << _BITS) - 1)
        )
        cells.append(
            F.coalesce(F.floor(scaled).cast("long"), F.lit(0).cast("long"))
        )
    n = len(cells)
    key = F.lit(0).cast("long")
    for bit in range(_BITS):
        for i, cell in enumerate(cells):
            src_bit = F.shiftright(cell, bit).bitwiseAND(F.lit(1).cast("long"))
            key = key.bitwiseOR(F.shiftleft(src_bit, bit * n + i))
    return key
