"""Incrementally-maintained materialized views over moontable mirrors.

The reference's whole design is "keep a columnstore copy of an OLTP table
fresh under a CDC stream" (reference README.md:13-17); the natural next
consumer of that freshness is a *derived aggregate* that stays fresh too.
This module maintains GROUP BY aggregate views incrementally from the
mirror's row-level change feed (:meth:`MoonTable.changes`):

- **refresh cost is O(changes), never O(table)** — the change batch is
  delta-aggregated (insert/update_postimage count +1, delete/
  update_preimage count −1), joined to the current view state, and only
  the touched groups are merged back (MoonTable.merge keyed on the group
  columns prunes to the files containing those groups);
- **sum / count / avg are fully incremental** (signed deltas; avg is
  maintained as sum + non-null count and finalized at read);
- **min / max are incremental for insert-only deltas** (``least`` /
  ``greatest`` against the incoming rows); a group that saw a retraction
  (delete or update_preimage) cannot be maintained from deltas alone —
  the dropped row might have BEEN the min — so exactly those groups are
  recomputed from the base table (semi-join on the group keys: a bounded
  recompute, not a full refresh);
- **SQL NULL semantics are preserved**: per-aggregate non-null counts
  make SUM/AVG return NULL (not 0) for all-NULL groups, matching what a
  from-scratch GROUP BY would produce — so a DuckDB oracle running the
  plain aggregate over the post-DML state hash-matches the view.

At 100 TB the view table is the aggregate's cardinality (usually orders
of magnitude below the base); each refresh shuffles only the change
batch plus the touched slice of the view.  Group-by columns should be
non-null (wrap nullable keys in ``coalesce``): view state is keyed on
them as a moontable primary key.

Base column renames: the spec's aggregate/filter expressions reference
base columns by name, and ``engine.rename_column`` remaps them in place
(:meth:`MaterializedView.remap_base_rename`) — identifier-aware rewrite
of the agg/where expressions, and when a GROUP BY key renames, the
view's state table gets the same rename-era commit the mirror does, so
the view's output column follows the base (VERDICT r8 task 7).  The
change feed itself resolves renames by era, so a pending unrefreshed
feed segment folds correctly under the new names.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pg_mooncake_spark.fsio import get_backend
from pg_mooncake_spark.storage import (
    CHANGE_TYPE_COL,
    MoonTable,
    MoonTableError,
)

_SPEC_FILE = "_mvspec.json"
_ROWS = "__rows"
_FNS = ("sum", "count", "min", "max", "avg")


def _rewrite_ident(sql: str, old: str, new: str) -> str:
    """Rename identifier ``old`` → ``new`` in a SQL expression without
    touching single-quoted string literals; double-quoted identifiers
    rewrite on exact match.  Bounded by design — expressions here are
    the view spec's own agg/filter expressions, not arbitrary SQL."""
    import re

    out: list[str] = []
    for piece in re.split(r"('(?:[^']|'')*')", sql):
        if piece.startswith("'"):
            out.append(piece)  # string literal: untouched
            continue
        piece = piece.replace(f'"{old}"', f'"{new}"')
        piece = re.sub(
            rf"(?<![\w.\"]){re.escape(old)}(?![\w\"])", new, piece
        )
        out.append(piece)
    return "".join(out)


def _apply_enrich(spark: SparkSession, df: DataFrame, enrich) -> DataFrame:
    """Join the static dimension chain onto ``df`` (base rows OR change-
    feed images — each image enriches against the SAME pinned dim
    versions, so the signed fold stays exact).  Every step is an INNER
    join; a dim-side ``filter`` narrows before joining (q5's
    ``r_name = 'ASIA'`` prunes the whole chain).  At refresh the left
    side is the O(changes) delta batch, so AQE broadcasts it against
    even a large dimension — the refresh never shuffles the fact."""
    for step in enrich or []:
        dim = MoonTable(spark, step["path"]).read(version=step["version"])
        if step.get("filter"):
            dim = dim.filter(step["filter"])
        pairs = [tuple(p) for p in step["on"]]
        sel = [
            (F.col(d).alias(b) if d != b else F.col(d)) for b, d in pairs
        ]
        keyed = {b for b, _ in pairs}
        for c in step.get("cols") or []:
            if c not in keyed:
                sel.append(F.col(c))
        df = df.join(dim.select(*sel), on=[b for b, _ in pairs],
                     how="inner")
    return df


def _backward_fact_prune(
    spark: SparkSession,
    fact: DataFrame,
    enrich: list[dict],
    gb: list[str],
    groups: DataFrame,
) -> DataFrame:
    """Magic-sets pruning for a bounded group recompute (round 18):
    when all group keys are produced by ONE enrich step, walk the join
    chain BACKWARDS from that step to the fact — filter the producing
    dim to the affected group values, derive the set of its join-key
    values, semi-join the previous dim on them, and so on until the
    hop's join column is a FACT column, then semi-join the fact itself.
    Every hop is a small dim-to-dim semi-join (broadcast); the final
    fact semi-join is the real pruning: the recompute's scan-join
    pipeline then processes only rows that can reach an affected group,
    instead of the whole fact filtered only after the last join.

    Sound by construction (each derived key set is a superset filter —
    a fact row reaching an affected group value necessarily carries a
    key in every set along its join path); the exact group semi-join
    after aggregation still applies.  Returns ``fact`` unchanged when
    the shape does not qualify (group keys spanning steps, a hop's join
    column not traceable to a single earlier step, or fact-side group
    keys — Catalyst's own left-semi pushdown already covers those)."""
    producer: Optional[int] = None
    for i, s in enumerate(enrich):
        cols = set(s.get("cols") or [])
        if any(g in cols for g in gb):
            if not all(g in cols for g in gb) or producer is not None:
                return fact  # group keys span steps
            producer = i
    if producer is None:
        return fact  # fact-side group keys: Catalyst pushes the semi
    # who provides column `c` to the chain? the LAST step before `i`
    # listing it in cols, else the fact

    def _provider(c: str, before: int) -> int:
        for j in range(before - 1, -1, -1):
            if c in (enrich[j].get("cols") or []):
                return j
        return -1  # fact column

    def _dim(j: int) -> DataFrame:
        s = enrich[j]
        d = MoonTable(spark, s["path"]).read(version=s["version"])
        return d.filter(s["filter"]) if s.get("filter") else d

    # the producing dim's slice that reaches an affected group (group
    # keys are the dim's own column names — _apply_enrich keeps
    # non-join cols un-aliased)
    i = producer
    keyed = _dim(i).join(groups, on=list(gb), how="leftsemi")
    while True:
        pairs = [tuple(p) for p in enrich[i]["on"]]
        srcs = {_provider(b, i) for b, _ in pairs}
        if len(srcs) != 1:
            return fact  # multi-source hop — not a simple chain
        src = srcs.pop()
        # the join-key VALUES this dim slice matches, named by the
        # enriched-side (b) spelling the provider carries
        keys = keyed.select(
            *[F.col(d).alias(b) for b, d in pairs]
        ).distinct()
        bnames = [b for b, _ in pairs]
        if src < 0:
            return fact.join(keys, on=bnames, how="leftsemi")
        # an earlier dim provides these columns under the same names
        i = src
        keyed = _dim(i).join(keys, on=bnames, how="leftsemi")


class MaterializedView:
    """A persisted GROUP BY aggregate over a base moontable.

    ``aggs`` maps output column → ``(fn, expr)`` with fn ∈ {sum, count,
    min, max, avg} and expr a SQL expression over the base columns
    (``"*"`` for count).  State lives in a moontable at ``path`` keyed
    on the group columns; the spec (including the base version the state
    reflects) is one JSON beside it.

    ``enrich`` (round 17, VERDICT r16 task #5 — the join-MV frontier)
    extends the view query to ``base ⋈ dim ⋈ dim ... WHERE ... GROUP
    BY``: an ordered chain of INNER joins against SLOWLY-CHANGING
    dimension moontables, each pinned at a version.  The fact's change
    feed folds through the chain in O(changes) per commit (the delta
    batch broadcasts against the dims).  Dimension churn is absorbed
    at the next refresh by a BOUNDED recompute of only the affected
    groups (round 18, :meth:`_fold_dim_churn`) — the dim's change feed
    names the changed join keys, one pruned fact pass finds the
    affected groups under both pins, and one semi-joined recompute
    rewrites exactly those state rows; a dim whose feed cannot replay
    the gap (UPDATE/DELETE without change_feed=True) still refuses
    loudly.  This is the TPC-H q5 shape: revenue per nation with
    region/nation/supplier/customer/orders joined in and only lineitem
    hot."""

    #: fold count between automatic state compactions (see refresh)
    COMPACT_EVERY_FOLDS = 4

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path.rstrip("/")
        self.backend = get_backend(path)
        self.state = MoonTable(spark, self.path)

    # ------------------------------------------------------------- spec

    @property
    def _spec_path(self) -> str:
        return os.path.join(self.path, _SPEC_FILE)

    def spec(self) -> dict[str, Any]:
        return json.loads(self.backend.read_bytes(self._spec_path))

    def _save_spec(self, spec: dict[str, Any]) -> None:
        self.backend.write_atomic(
            self._spec_path, json.dumps(spec, indent=1).encode("utf-8")
        )

    # ----------------------------------------------------------- create

    @staticmethod
    def create(
        spark: SparkSession,
        path: str,
        base: MoonTable,
        group_by: list[str],
        aggs: dict[str, tuple[str, str]],
        where: Optional[str] = None,
        state_change_feed: bool = False,
        enrich: Optional[list[dict]] = None,
    ) -> "MaterializedView":
        """Full initial computation at the base's current version; every
        later :meth:`refresh` is incremental from that version's change
        feed (the base needs ``change_feed=True`` for DML commits).

        ``where`` restricts the view to base rows matching a SQL
        predicate.  Incremental maintenance filters the change feed
        PER IMAGE, which is exactly the filtered view's semantics: an
        update moving a row out of the predicate contributes only its
        pre-image (a retraction), one moving it in only its post-image
        (an addition).

        ``state_change_feed=True`` gives the view's OWN state table a
        change feed, so a second view can aggregate over this one —
        the two-level fold (e.g. TPC-H q13: per-customer order counts,
        then a histogram of the counts) maintains end-to-end in
        O(changes): a base delta touches a few customers, each emits a
        −1/+1 bucket move in the second level."""
        for out, (fn, _expr) in aggs.items():
            if fn not in _FNS:
                raise MoonTableError(f"unsupported aggregate {fn!r} for {out!r}")
            if out in group_by:
                raise MoonTableError(f"aggregate {out!r} collides with a group key")
        mv = MaterializedView(spark, path)
        base_version = base.latest_version()
        enrich_spec = None
        if enrich:
            enrich_spec = []
            for step in enrich:
                dim = MoonTable(spark, step["path"])
                enrich_spec.append({
                    "path": dim.path,
                    "version": dim.latest_version(),
                    "on": [list(p) for p in step["on"]],
                    "cols": list(step.get("cols") or []),
                    "filter": step.get("filter"),
                })
        src = base.read(version=base_version)
        if enrich_spec:
            src = _apply_enrich(spark, src, enrich_spec)
        if where:
            src = src.filter(where)
        full = _full_agg(src, group_by, aggs)
        mv.state.create(
            full.schema, primary_key=list(group_by),
            change_feed=state_change_feed,
        )
        mv.state.append(full, source_version=base_version)
        mv._save_spec(
            {
                "base_path": base.path,
                "group_by": list(group_by),
                "aggs": {k: list(v) for k, v in aggs.items()},
                "where": where,
                "enrich": enrich_spec,
                "base_version": base_version,
            }
        )
        return mv

    # ---------------------------------------------------------- refresh

    def refresh(self) -> int:
        """Fold the base's changes since the last refresh into the view
        state; returns the base version the view now reflects."""
        spec = self.spec()
        gb: list[str] = spec["group_by"]
        aggs = {k: tuple(v) for k, v in spec["aggs"].items()}
        base = MoonTable(self.spark, spec["base_path"])
        # the authoritative watermark is the one recorded IN the state
        # table's own commit (source_version, written atomically with
        # the folded deltas); the spec file is a cache updated after.
        # A crash between the two leaves spec stale — trusting it would
        # re-fold the same delta batch and silently double every sum.
        reflected = max(spec["base_version"], self._state_watermark())
        if reflected > spec["base_version"]:
            spec["base_version"] = reflected
            self._save_spec(spec)
        start = reflected + 1
        end = base.latest_version()
        # Round 18 (VERDICT r17 missing #4): absorb dimension churn
        # FIRST, with a bounded recompute pinned at fact@reflected —
        # the fact fold below then enriches its deltas against the NEW
        # dim pins, landing at f(fact@end, dims@new) with no double
        # count.  Ordering matters: churn-recompute over fact@end would
        # bake the pending fact deltas into affected groups, and the
        # fold would then add them again.
        if spec.get("enrich"):
            self._fold_dim_churn(spec, base, gb, aggs, reflected)
        if end < start:
            return reflected
        ch = base.changes(start, end)
        if spec.get("enrich"):
            ch = _apply_enrich(self.spark, ch, spec["enrich"])
        if spec.get("where"):
            # per-image predicate: a pre-image that matched retracts, a
            # post-image that matches adds — row migrations across the
            # predicate boundary fall out correctly
            ch = ch.filter(spec["where"])

        sign = F.when(
            F.col(CHANGE_TYPE_COL).isin("insert", "update_postimage"), F.lit(1)
        ).otherwise(F.lit(-1))
        dexprs = [F.sum(sign).alias(f"__d{_ROWS}")]
        minmax: list[str] = []
        for out, (fn, expr) in aggs.items():
            e = F.lit(1) if expr == "*" else F.expr(expr)
            if fn in ("sum", "avg"):
                col = out if fn == "sum" else f"{out}__sum"
                dexprs.append(
                    F.sum(F.when(e.isNotNull(), sign * e)).alias(f"__d_{col}")
                )
                dexprs.append(
                    F.sum(F.when(e.isNotNull(), sign).otherwise(0)).alias(
                        f"__d_{out}__nn"
                    )
                )
            elif fn == "count":
                cnt = sign if expr == "*" else F.when(e.isNotNull(), sign).otherwise(0)
                dexprs.append(F.sum(cnt).alias(f"__d_{out}"))
            else:  # min / max: insert-side candidates + retraction flag
                dexprs.append(
                    (F.min if fn == "min" else F.max)(
                        F.when(sign == 1, e)
                    ).alias(f"__d_{out}")
                )
                dexprs.append(
                    F.max(
                        F.when((sign == -1) & e.isNotNull(), 1).otherwise(0)
                    ).alias(f"__ret_{out}")
                )
                minmax.append(out)
        deltas = ch.groupBy(*gb).agg(*dexprs)

        old = self.state.read()
        state_cols = [c for c in old.columns if c not in gb]
        old_r = old.select(
            *gb, *[F.col(c).alias(f"__o_{c}") for c in state_cols]
        )
        j = old_r.join(deltas, on=gb, how="right")

        def _merged(out: str, fn: str) -> list:
            if fn in ("sum", "avg"):
                col = out if fn == "sum" else f"{out}__sum"
                nn = f"{out}__nn"
                new_nn = F.coalesce(F.col(f"__o_{nn}"), F.lit(0)) + F.coalesce(
                    F.col(f"__d_{nn}"), F.lit(0)
                )
                new_sum = F.coalesce(F.col(f"__o_{col}"), F.lit(0)) + F.coalesce(
                    F.col(f"__d_{col}"), F.lit(0)
                )
                return [
                    F.when(new_nn > 0, new_sum).alias(col),
                    new_nn.alias(nn),
                ]
            if fn == "count":
                return [
                    (
                        F.coalesce(F.col(f"__o_{out}"), F.lit(0))
                        + F.coalesce(F.col(f"__d_{out}"), F.lit(0))
                    ).alias(out)
                ]
            pick = F.least if fn == "min" else F.greatest
            return [pick(F.col(f"__o_{out}"), F.col(f"__d_{out}")).alias(out)]

        new_rows = F.coalesce(F.col(f"__o_{_ROWS}"), F.lit(0)) + F.coalesce(
            F.col(f"__d{_ROWS}"), F.lit(0)
        )
        out_cols = [F.col(c) for c in gb] + [new_rows.alias(_ROWS)]
        for out, (fn, _e) in aggs.items():
            out_cols.extend(_merged(out, fn))
        ret_cols = [F.col(f"__ret_{m}") for m in minmax]
        if not ret_cols:
            needs = F.lit(0)
        elif len(ret_cols) == 1:
            needs = ret_cols[0]
        else:
            needs = F.greatest(*ret_cols)
        inc = j.select(*out_cols, F.coalesce(needs, F.lit(0)).alias("__needs"))

        state_schema = self.state.schema()
        aligned = [
            F.col(f.name).cast(f.dataType).alias(f.name)
            for f in state_schema.fields
        ]
        if minmax:
            inc = inc.persist()
            try:
                rec_groups = inc.filter(F.col("__needs") == 1).select(*gb)
                rec_src = base.read(version=end)
                if spec.get("enrich"):
                    # magic-sets: dim-side group keys prune the fact
                    # BEFORE the join chain (round 18)
                    rec_src = _apply_enrich(
                        self.spark,
                        _backward_fact_prune(
                            self.spark, rec_src, spec["enrich"], gb,
                            rec_groups,
                        ),
                        spec["enrich"],
                    )
                if spec.get("where"):
                    rec_src = rec_src.filter(spec["where"])
                # pinned ONCE: `gone`, the batch union, and the merge's
                # ups/dels split each read it — unpinned, the bounded
                # min/max recompute re-ran per consumer (round 18, same
                # lesson as the dim-churn fold's 2.4× overshoot)
                rec = _full_agg(
                    rec_src.join(rec_groups, on=gb, how="leftsemi"),
                    gb,
                    aggs,
                ).localCheckpoint(eager=True)
                # groups whose recompute found no surviving base rows
                # disappeared entirely — delete them from the view
                gone = rec_groups.join(rec.select(*gb), on=gb, how="leftanti")
                batch = (
                    inc.filter(F.col("__needs") == 0)
                    .select(*aligned)
                    .unionByName(rec.select(*aligned))
                )
                self._merge_state(batch, gone, gb, state_schema, end)
            finally:
                inc.unpersist()
        else:
            self._merge_state(inc.select(*aligned), None, gb, state_schema, end)
        spec["base_version"] = end
        # Self-compaction (round 17, measured in BASELINE.md round-17
        # q3 section): each fold's MERGE may commit merge-on-read
        # tombstones, and a read over composed deltas cost 3.0 s where
        # the compacted state read costs 0.2 s (87 k rows, sf10).  The
        # state is orders of magnitude smaller than the base — one
        # O(state) compaction every few folds keeps reads at the
        # compacted floor for ~25% amortized fold overhead.
        spec["folds_since_compact"] = spec.get("folds_since_compact", 0) + 1
        if spec["folds_since_compact"] >= self.COMPACT_EVERY_FOLDS:
            self.state.optimize()
            spec["folds_since_compact"] = 0
        self._save_spec(spec)
        return end

    # -------------------------------------------------------- dim churn

    def _fold_dim_churn(
        self,
        spec: dict,
        base: MoonTable,
        gb: list[str],
        aggs: dict[str, tuple[str, str]],
        reflected: int,
    ) -> None:
        """Absorb advanced enrich dimensions with a BOUNDED recompute
        (round 18, VERDICT r17 missing #4) instead of refusing — the
        static-dimension contract's biggest operational gap: a
        periodically-updated dimension (price lists, user tiers) forced
        DROP + full recreate.

        Per advanced dimension, in chain order:

        1. The dim's change feed between the pinned and current
           versions yields the CHANGED JOIN KEYS (pre- and post-images,
           so key rewrites and deletes count on both sides).  Steps
           before this one are unchanged, so a fact row's join key for
           this step is identical under old and new pins — ONE
           enrichment of fact@reflected through the preceding steps,
           semi-joined to the changed keys (broadcast — the delta is
           small), finds the AFFECTED fact rows.
        2. Affected GROUPS = the groups those rows reach under the OLD
           pin ∪ under the NEW pin (a churned dim can rename the group
           key itself — q5's n_name lives on nation).  FAST PATH: when
           every group key is produced by this step or a later one and
           the remaining chain's join keys are reachable from this
           step's columns, the affected groups come from enriching the
           CHANGED DIM ROWS alone through the rest of the chain
           (pre-images reach the old groups, post-images the new) —
           no fact pass for detection at all.
        3. One full-aggregate recompute of exactly those groups over
           fact@reflected ⋈ chain@new-pin, merged into the state;
           affected groups with no surviving rows delete.

        Cost: two column-pruned fact scans (affected detection +
        bounded recompute) and an O(affected groups) state write —
        against DROP+recreate's full aggregate, full state rewrite, and
        lost refresh watermark.  Unaffected groups are untouched: their
        rows join no changed dim row under either pin, so their values
        are identical under both.

        Requires the dim's change feed to cover the gap: an insert-only
        dim replays from history, but UPDATE/DELETE commits need the
        dim created with ``change_feed=True`` — otherwise this refuses
        with the old recreate message (now actionable).  Multiple
        advanced dims fold sequentially, each against the already-
        updated pins of its predecessors."""
        for idx, step in enumerate(spec.get("enrich") or []):
            dim = MoonTable(self.spark, step["path"])
            cur = dim.latest_version()
            if cur == step["version"]:
                continue
            try:
                dch = dim.changes(step["version"] + 1, cur)
            except Exception as e:
                raise MoonTableError(
                    f"enrich dimension {step['path']!r} advanced "
                    f"(version {step['version']} → {cur}) but its "
                    "change feed cannot replay the gap "
                    f"({e}); create the dimension with "
                    "change_feed=True to let the view absorb churn, "
                    "or DROP and re-CREATE the view"
                ) from None
            pairs = [tuple(p) for p in step["on"]]
            dcols = [d for _, d in pairs]
            bcols = [b for b, _ in pairs]
            old_tail = spec["enrich"][idx:]
            new_tail = [dict(s) for s in old_tail]
            new_tail[0]["version"] = cur
            fact = base.read(version=reflected)
            # FAST PATH: when every group key is produced by this step
            # or a later one, and the remaining chain's join keys are
            # reachable from this step's columns, the affected groups
            # are derivable from the CHANGED DIM ROWS alone — no fact
            # pass for detection (q5-shape: changed suppliers → their
            # old/new nations, a driver-cheap dim-delta walk).  The
            # view WHERE is skipped here (it may reference fact
            # columns): that only widens the affected-group superset,
            # never misses one.
            avail = set(step.get("cols") or []) | set(dcols)
            reach = True
            for later in spec["enrich"][idx + 1:]:
                if any(
                    b not in avail for b, _ in (tuple(p) for p in later["on"])
                ):
                    reach = False
                    break
                avail |= set(later.get("cols") or [])
            produced = set()
            for s2 in spec["enrich"][idx:]:
                produced |= set(s2.get("cols") or [])
            dim_side = reach and all(g in produced for g in gb)

            if dim_side:
                # the feed's pre-images reach the OLD groups and its
                # post-images the NEW ones through the same (pinned)
                # remaining chain — one enrichment covers both sides
                imgs = dch.select(
                    *dict.fromkeys(
                        dcols + list(step.get("cols") or [])
                    )
                )
                affected_groups = (
                    _apply_enrich(self.spark, imgs, old_tail[1:])
                    .select(*gb).distinct()
                    .localCheckpoint(eager=True)
                )
            else:
                keys = dch.select(
                    *[
                        F.col(d).alias(f"__k{i}")
                        for i, d in enumerate(dcols)
                    ]
                ).distinct()
                pre = _apply_enrich(
                    self.spark, fact, spec["enrich"][:idx]
                )
                cond = None
                for i, b in enumerate(bcols):
                    c = pre[b] == keys[f"__k{i}"]
                    cond = c if cond is None else (cond & c)
                affected = pre.join(keys, cond, "leftsemi")

                def _groups(tail) -> DataFrame:
                    g = _apply_enrich(self.spark, affected, tail)
                    if spec.get("where"):
                        g = g.filter(spec["where"])
                    return g.select(*gb).distinct()

                affected_groups = (
                    _groups(old_tail).unionByName(_groups(new_tail))
                    .distinct().localCheckpoint(eager=True)
                )
            step["version"] = cur  # advance the pin (spec saved below)
            if not affected_groups.take(1):
                self._save_spec(spec)
                continue
            rec_src = _apply_enrich(
                self.spark,
                _backward_fact_prune(
                    self.spark, fact, spec["enrich"], gb, affected_groups
                ),
                spec["enrich"],
            )
            if spec.get("where"):
                rec_src = rec_src.filter(spec["where"])
            # pin the bounded recompute ONCE (O(affected groups) rows):
            # `gone` and the merge batch both read it, and the merge's
            # ups/dels split reads it twice more — unpinned, the full
            # fact aggregation re-ran per consumer (measured 21.9 s vs
            # 9.2 s recreate at sf10 before this checkpoint)
            rec = _full_agg(
                rec_src.join(affected_groups, on=gb, how="leftsemi"),
                gb, aggs,
            ).localCheckpoint(eager=True)
            state_schema = self.state.schema()
            aligned = [
                F.col(f.name).cast(f.dataType).alias(f.name)
                for f in state_schema.fields
            ]
            gone = affected_groups.join(
                rec.select(*gb), on=gb, how="leftanti"
            )
            # watermark unchanged: churn does not advance the BASE
            # version the state reflects
            self._merge_state(
                rec.select(*aligned), gone, gb, state_schema, reflected
            )
            spec["folds_since_compact"] = (
                spec.get("folds_since_compact", 0) + 1
            )
            if spec["folds_since_compact"] >= self.COMPACT_EVERY_FOLDS:
                self.state.optimize()
                spec["folds_since_compact"] = 0
            self._save_spec(spec)

    # ----------------------------------------------------------- rename

    def remap_base_rename(self, old: str, new: str) -> None:
        """Remap the view spec after a base column rename, so refreshes
        keep working instead of failing on an unresolved column
        (VERDICT r8 task 7; the feed already resolves renames by era).

        - agg expressions and the WHERE predicate rewrite by identifier;
        - a renamed GROUP BY key also renames the state table's key
          column (same metadata-only rename-era commit the mirror gets),
          so the view's output column follows the base's new name.

        Idempotent: remapping a spec that no longer references ``old``
        is a no-op."""
        spec = self.spec()
        changed = False
        if old in spec["group_by"]:
            self.state.rename_column(old, new)
            spec["group_by"] = [
                new if c == old else c for c in spec["group_by"]
            ]
            changed = True
        new_aggs: dict[str, list[str]] = {}
        for out, fe in spec["aggs"].items():
            fn, expr = fe[0], fe[1]
            ne = expr if expr == "*" else _rewrite_ident(expr, old, new)
            changed = changed or ne != expr
            new_aggs[out] = [fn, ne]
        spec["aggs"] = new_aggs
        if spec.get("where"):
            nw = _rewrite_ident(spec["where"], old, new)
            changed = changed or nw != spec["where"]
            spec["where"] = nw
        if changed:
            self._save_spec(spec)

    def _state_watermark(self) -> int:
        """Base version recorded by the newest state commit (−1 if none
        recorded one): the durable refresh watermark, committed in the
        same atomic log entry as the folded deltas themselves."""
        for c in reversed(self.state.history()):
            if c.source_version is not None:
                return int(c.source_version)
        return -1

    def _merge_state(
        self,
        batch: DataFrame,
        extra_deletes: Optional[DataFrame],
        gb: list[str],
        state_schema,
        base_version: int,
    ) -> None:
        """One MERGE into the state table: live groups upsert, emptied
        groups delete (a group is empty when its row count folded to 0).
        ``base_version`` rides in the same commit — the durable refresh
        watermark (:meth:`_state_watermark`)."""
        from pg_mooncake_spark.storage import OP_COL

        ups = batch.filter(F.col(_ROWS) > 0).withColumn(OP_COL, F.lit("U"))
        dels = batch.filter(F.col(_ROWS) <= 0).withColumn(OP_COL, F.lit("D"))
        merged = ups.unionByName(dels)
        if extra_deletes is not None:
            pad = extra_deletes
            for f in state_schema.fields:
                if f.name not in gb:
                    pad = pad.withColumn(f.name, F.lit(None).cast(f.dataType))
            merged = merged.unionByName(pad.withColumn(OP_COL, F.lit("D")))
        self.state.merge(merged, source_version=base_version)

    # ------------------------------------------------------------- read

    def read(self) -> DataFrame:
        """The view as a DataFrame: group columns + finalized aggregates
        (avg = sum / non-null count; all-NULL groups yield NULL)."""
        spec = self.spec()
        gb = spec["group_by"]
        aggs = {k: tuple(v) for k, v in spec["aggs"].items()}
        df = self.state.read()
        cols = [F.col(c) for c in gb]
        for out, (fn, _e) in aggs.items():
            if fn == "avg":
                # double division of the exact sum: IEEE-deterministic and
                # engine-independent (decimal division scale rules differ
                # between engines; double/int64 does not)
                nn = F.col(f"{out}__nn")
                cols.append(
                    F.when(
                        nn > 0, F.col(f"{out}__sum").cast("double") / nn
                    ).alias(out)
                )
            else:
                cols.append(F.col(out))
        return df.select(*cols)


def _full_agg(
    df: DataFrame, gb: list[str], aggs: dict[str, tuple[str, str]]
) -> DataFrame:
    """The from-scratch aggregate (create + per-group recompute path);
    its result schema IS the view's physical state schema."""
    exprs = [F.count(F.lit(1)).alias(_ROWS)]
    for out, (fn, expr) in aggs.items():
        e = F.lit(1) if expr == "*" else F.expr(expr)
        if fn == "sum":
            exprs.append(F.sum(e).alias(out))
            exprs.append(F.count(e).alias(f"{out}__nn"))
        elif fn == "count":
            exprs.append(
                (F.count(F.lit(1)) if expr == "*" else F.count(e)).alias(out)
            )
        elif fn == "avg":
            exprs.append(F.sum(e).alias(f"{out}__sum"))
            exprs.append(F.count(e).alias(f"{out}__nn"))
        else:
            exprs.append((F.min if fn == "min" else F.max)(e).alias(out))
    return df.groupBy(*gb).agg(*exprs)
