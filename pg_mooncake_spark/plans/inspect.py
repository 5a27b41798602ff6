"""Physical-plan inspection helpers — the feedback loop for scale design.

Every operator's contract here isn't just its result set; it's the SHAPE
of the physical plan Catalyst produces: do filters reach the parquet
scan (PushedFilters), is the projection pruned (ReadSchema), are
dimension joins broadcast (no fact-table shuffle), how many exchanges
does the plan pay?  These helpers expose those properties as strings/
counts so tests can pin them — a plan regression (a lost pushdown, a
broadcast that became a sort-merge join) fails CI even while results
stay correct.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def plan_text(df: DataFrame, mode: str = "formatted") -> str:
    """The physical plan as text (what .explain prints)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def executed_plan_text(df: DataFrame) -> str:
    """Post-AQE executed plan (requires the query to have run)."""
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's file scans."""
    txt = plan_text(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", txt):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema entries (column pruning evidence) per file scan."""
    txt = plan_text(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", txt)]


def count_op(df: DataFrame, op: str) -> int:
    """Occurrences of a physical operator name in the plan.

    Counted in "simple" mode: formatted mode prints every operator twice
    (tree line + detail section), which double-counts.
    """
    return len(re.findall(rf"\b{re.escape(op)}\b", plan_text(df, "simple")))


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators — the scale cost driver.
    ``\\bExchange\\b`` does not match inside BroadcastExchange (no word
    boundary), so broadcasts (which move only the small side) are
    excluded automatically."""
    return len(re.findall(r"\bExchange\b", plan_text(df, "simple")))


def broadcast_join_count(df: DataFrame) -> int:
    return count_op(df, "BroadcastHashJoin")


def sortmerge_join_count(df: DataFrame) -> int:
    return count_op(df, "SortMergeJoin")


def codegen_span_count(df: DataFrame) -> int:
    """WholeStageCodegen regions.  Under AQE the pre-execution plan hides
    codegen (stages compile lazily, so ``explain("codegen")`` reports
    "Found 0" even when codegen is on) — disable AQE for the inspection;
    explain re-plans with the current conf."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        # a Dataset memoizes its QueryExecution: if ANY explain ran on
        # ``df`` while AQE was on, re-explaining after the conf flip
        # reuses the adaptive plan and reports "Found 0" even though
        # codegen is fully engaged (round-15 audit caught this skewing
        # an audit toward a phantom defect).  selectExpr("*") is a
        # no-op projection that forces a fresh QueryExecution honoring
        # the current conf.
        txt = plan_text(df.selectExpr("*"), "codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", txt)
    return int(m.group(1)) if m else 0
