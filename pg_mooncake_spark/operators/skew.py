"""Skew-mitigation operators: salted aggregation and salted join.

At 100 TB a handful of hot keys (a viral user, a default enum value) can
put 100× the median load on one reducer.  AQE's skew-join splitting
(enabled in session.py) handles sort-merge joins at runtime; these
operators are the *declarative* counterpart for the two shapes AQE
doesn't cover — skewed aggregations, and broadcast-averse hot-key joins —
with results identical to the unsalted form (the oracle checks that).

- ``salted_agg``: groupBy (key, salt) partial → re-aggregate by key.
  Two shuffles, but the first spreads each hot key over ``salts``
  reducers; the second moves only #keys × salts pre-aggregated rows.
- ``salted_join``: explode the small side ``salts``× with a salt column,
  salt the big side's key randomly-but-deterministically, equi-join on
  (key, salt).  Hot-key rows scatter across ``salts`` tasks.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, tuple[Callable[[str], Column], Callable[[str], Column]]],
    salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    ``aggs`` maps output name → (partial_fn, merge_fn); e.g. a count is
    ``(F.count, F.sum)``, a sum is ``(F.sum, F.sum)``, a max is
    ``(F.max, F.max)``.  Result ≡ ``df.groupBy(keys).agg(...)``.
    """
    salted = df.withColumn(
        SALT, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salts))
    )
    partial = salted.groupBy(*key_cols, SALT).agg(
        *[pfn(name_in).alias(f"__p_{out}") for out, (pfn, _m, name_in) in _norm(aggs)]
    )
    return partial.groupBy(*key_cols).agg(
        *[mfn(f"__p_{out}").alias(out) for out, (_p, mfn, _n) in _norm(aggs)]
    )


def _norm(aggs):
    """Normalize aggs to (out, (partial, merge, input_col)) tuples."""
    out = []
    for name, spec in aggs.items():
        if len(spec) == 2:
            (pfn, mfn) = spec
            out.append((name, (pfn, mfn, name)))
        else:
            pfn, mfn, col = spec
            out.append((name, (pfn, mfn, col)))
    return out


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has hot keys and ``small`` is too large to
    broadcast: replicate ``small`` ``salts``× (explode), salt ``big``
    deterministically, join on (key, salt).  Result ≡ big ⋈ small."""
    exploded = small.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    salted_big = big.withColumn(
        SALT,
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salts)).cast("int"),
    )
    return (
        salted_big.join(exploded, [on, SALT], how)
        .drop(SALT)
    )
