"""Sync catalog: the engine's record of every columnstore mirror.

Analog of moonlink's table registry surfaced by ``mooncake.list_tables()``
(reference src/functions.rs:84-116): for each mirror we track the source,
the storage path, the last source version ingested (= commit_lsn) and the
last mirror version flushed (= flush_lsn).  Persisted as one JSON file in
the warehouse so a restarted engine session resumes where it left off
(reference bgworker restarts and resumes from the LSN watermarks,
src/bgworker.rs:8-16).
"""

from __future__ import annotations

import json
import os
import threading
import uuid
from typing import Any, Optional


class SyncCatalog:
    def __init__(self, warehouse: str):
        self.warehouse = warehouse.rstrip("/")
        self.path = os.path.join(self.warehouse, "_mooncake_catalog.json")
        self._lock = threading.Lock()
        os.makedirs(self.warehouse, exist_ok=True)

    def _load(self) -> dict[str, dict[str, Any]]:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def _save(self, data: dict[str, dict[str, Any]]) -> None:
        tmp = self.path + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(data, f, indent=1)
        os.rename(tmp, self.path)

    # dependent objects (materialized views, follower mirrors) indexed
    # by their base table, maintained on register/drop — so the hot
    # write path (_refresh_views_of on EVERY commit) is a dict lookup,
    # not an O(catalog) scan (VERDICT r10 task 2)
    _DEPENDENTS = "__dependents__"

    @staticmethod
    def _base_of(entry: dict[str, Any]) -> Optional[str]:
        cfg = entry.get("table_config") or {}
        if cfg.get("follows"):
            return cfg["follows"]
        if cfg.get("kind") == "mview" and cfg.get("base"):
            return cfg["base"]
        return None

    def _reindex(self, data: dict[str, dict[str, Any]]) -> None:
        idx: dict[str, list[str]] = {}
        for k, v in data.items():
            if k.startswith("__"):
                continue
            base = self._base_of(v)
            if base:
                idx.setdefault(base, []).append(k)
        if idx:
            data[self._DEPENDENTS] = idx
        else:
            data.pop(self._DEPENDENTS, None)

    def dependents(self, base: str) -> list[str]:
        """Names of materialized views / followers whose base is
        ``base`` (index lookup; legacy catalogs without the index are
        scanned once and behave identically)."""
        data = self._load()
        idx = data.get(self._DEPENDENTS)
        if idx is None:
            idx = {}
            for k, v in data.items():
                if k.startswith("__"):
                    continue
                b = self._base_of(v)
                if b:
                    idx.setdefault(b, []).append(k)
        return list(idx.get(base, []))

    def register(
        self,
        table: str,
        source: Optional[str],
        path: str,
        table_config: Optional[dict[str, Any]] = None,
    ) -> None:
        with self._lock:
            data = self._load()
            if table in data:
                raise ValueError(f"mirror {table!r} already registered")
            data[table] = {
                "source": source,
                "path": path,
                "commit_version": None,   # last source version ingested
                "flush_version": None,    # last mirror version durably committed
                "table_config": table_config or {},
            }
            self._reindex(data)
            self._save(data)

    def update_watermarks(
        self,
        table: str,
        commit_version: Optional[int] = None,
        flush_version: Optional[int] = None,
        export_version: Optional[int] = None,
        applied_source_version: Optional[int] = None,
    ) -> None:
        """Watermark semantics:

        - ``commit_version``: SOURCE version ingested end-to-end (mirror
          AND exports AND views) — what wait_for_source_version gates on.
        - ``flush_version``: MIRROR version of the last commit.
        - ``export_version``: MIRROR version attached exports cover;
          lags flush_version while apply_changes(defer_exports=True)
          batches are buffered, and is the repair_exports window anchor
          after a crash loses that buffer.
        - ``applied_source_version``: SOURCE version applied to the
          mirror alone (moves on deferred applies too) — what
          repair_exports promotes commit_version to once exports
          converge."""
        with self._lock:
            data = self._load()
            if table not in data:
                raise KeyError(f"unknown mirror {table!r}")
            if commit_version is not None:
                data[table]["commit_version"] = commit_version
            if flush_version is not None:
                data[table]["flush_version"] = flush_version
            if export_version is not None:
                data[table]["export_version"] = export_version
            if applied_source_version is not None:
                data[table]["applied_source_version"] = applied_source_version
            self._save(data)

    def get_or_set_stream_base(self, table: str, checkpoint: str, base: int) -> int:
        """Source-version base for a sync stream, keyed by its checkpoint.

        Set once when the stream first attaches and reused verbatim on
        every restart: checkpointed batch ids continue across restarts,
        so re-deriving the base from the (moving) commit_version watermark
        would double-count already-applied epochs (ADVICE r1)."""
        with self._lock:
            data = self._load()
            if table not in data:
                raise KeyError(f"unknown mirror {table!r}")
            bases = data[table].setdefault("stream_bases", {})
            if checkpoint not in bases:
                bases[checkpoint] = base
                self._save(data)
            return bases[checkpoint]

    def set_field(self, table: str, key: str, value: Any) -> None:
        """Set (or clear, with None) one top-level entry field — e.g.
        ``export_defer_base``, the mirror version a deferred-export
        window started from (see engine.flush_exports)."""
        with self._lock:
            data = self._load()
            if table not in data:
                raise KeyError(f"unknown mirror {table!r}")
            if value is None:
                data[table].pop(key, None)
            else:
                data[table][key] = value
            self._save(data)

    def set_config_key(self, table: str, key: str, value: Any) -> None:
        """Update one table_config entry in place (e.g. a follower's
        ``follow_version`` watermark)."""
        with self._lock:
            data = self._load()
            if table not in data:
                raise KeyError(f"unknown mirror {table!r}")
            data[table].setdefault("table_config", {})[key] = value
            self._save(data)

    def add_export(self, table: str, path: str) -> None:
        """Record an attached open-format export the engine keeps current
        (the analog of the reference's per-mirror iceberg_warehouse_location,
        src/functions.rs:89)."""
        with self._lock:
            data = self._load()
            if table not in data:
                raise KeyError(f"unknown mirror {table!r}")
            exports = data[table].setdefault("exports", [])
            if path not in exports:
                exports.append(path)
                self._save(data)

    def get(self, table: str) -> dict[str, Any]:
        data = self._load()
        if table not in data:
            raise KeyError(f"unknown mirror {table!r}")
        return data[table]

    def rename(self, old: str, new: str) -> None:
        """Move an entry to a new name in one atomic catalog write.  The
        storage path is untouched (paths are opaque handles)."""
        with self._lock:
            data = self._load()
            if old not in data:
                raise KeyError(f"unknown mirror {old!r}")
            if new in data:
                raise ValueError(f"mirror {new!r} already registered")
            data[new] = data.pop(old)
            self._reindex(data)
            self._save(data)

    def drop(self, table: str) -> dict[str, Any]:
        with self._lock:
            data = self._load()
            entry = data.pop(table, None)
            if entry is None:
                raise KeyError(f"unknown mirror {table!r}")
            self._reindex(data)
            self._save(data)
            return entry

    # Two-phase drop (reference's DROP runs a pre-commit callback so the
    # mirror teardown is atomic with the catalog transaction,
    # src/functions.rs:45-82).  Phase 1 atomically deregisters the table
    # AND records its storage path under the reserved __pending_drops__
    # key — one file write, so a crash can never leave a listed table
    # with deleted storage.  Phase 2 (after the storage is physically
    # gone) clears the tombstone.  A crash between phases leaves only an
    # orphaned directory, reclaimed by reap on the next engine start.
    _PENDING = "__pending_drops__"

    def begin_drop(self, table: str) -> dict[str, Any]:
        """Phase 1: deregister + tombstone, one atomic catalog commit."""
        with self._lock:
            data = self._load()
            entry = data.pop(table, None)
            if entry is None:
                raise KeyError(f"unknown mirror {table!r}")
            data.setdefault(self._PENDING, {})[table] = entry["path"]
            self._reindex(data)
            self._save(data)
            return entry

    def finish_drop(self, table: str) -> None:
        """Phase 2: storage is gone; clear the tombstone."""
        with self._lock:
            data = self._load()
            pending = data.get(self._PENDING, {})
            if table in pending:
                del pending[table]
                if not pending:
                    data.pop(self._PENDING, None)
                self._save(data)

    def pending_drops(self) -> dict[str, str]:
        """table -> storage path for drops whose phase 2 never ran."""
        return dict(self._load().get(self._PENDING, {}))

    def list_tables(self) -> dict[str, dict[str, Any]]:
        """All mirrors with watermarks (mooncake.list_tables parity)."""
        return {
            k: v for k, v in self._load().items() if not k.startswith("__")
        }

    # --------------------------------------------- named object registries
    #
    # Schemas and extensions (round 16): pg_dump preambles and the
    # reference's own bootstrap (``CREATE SCHEMA mooncake``,
    # ``CREATE EXTENSION pg_mooncake``) create namespace objects the
    # engine records but does not execute against — persisted so DROP
    # SCHEMA emptiness checks and re-creation errors behave like
    # Postgres across sessions.

    def named_set(self, key: str) -> list[str]:
        return list(self._load().get(key, []))

    def named_set_add(self, key: str, name: str) -> bool:
        """Add; returns False if already present."""
        with self._lock:
            data = self._load()
            items = data.setdefault(key, [])
            if name in items:
                return False
            items.append(name)
            self._save(data)
            return True

    def named_set_remove(self, key: str, name: str) -> bool:
        with self._lock:
            data = self._load()
            items = data.get(key, [])
            if name not in items:
                return False
            items.remove(name)
            if not items:
                data.pop(key, None)
            self._save(data)
            return True

    # --------------------------------------------------------- sequences
    #
    # Postgres sequence objects (CREATE SEQUENCE / serial / IDENTITY):
    # catalog-persisted state under one reserved key, so a restarted
    # session (or a replayed pg_dump's setval) resumes where it left
    # off.  State per sequence: {data_type, increment, minvalue,
    # maxvalue, start, cycle, owned_by, last_value, is_called}.
    # ``last_value``/``is_called`` follow Postgres exactly: after
    # ``setval(s, v)`` the next nextval returns v+increment; after
    # ``setval(s, v, false)`` it returns v itself.

    _SEQUENCES = "__sequences__"

    def sequences(self) -> dict[str, dict[str, Any]]:
        return dict(self._load().get(self._SEQUENCES, {}))

    def seq_get(self, name: str) -> dict[str, Any]:
        seqs = self._load().get(self._SEQUENCES, {})
        if name not in seqs:
            raise KeyError(f'sequence "{name}" does not exist')
        return seqs[name]

    def seq_put(self, name: str, state: dict[str, Any]) -> None:
        """Create or replace one sequence's full state."""
        with self._lock:
            data = self._load()
            data.setdefault(self._SEQUENCES, {})[name] = state
            self._save(data)

    def seq_update(self, name: str, **fields: Any) -> dict[str, Any]:
        with self._lock:
            data = self._load()
            seqs = data.get(self._SEQUENCES, {})
            if name not in seqs:
                raise KeyError(f'sequence "{name}" does not exist')
            seqs[name].update(fields)
            self._save(data)
            return seqs[name]

    def seq_drop(self, name: str) -> dict[str, Any]:
        with self._lock:
            data = self._load()
            seqs = data.get(self._SEQUENCES, {})
            if name not in seqs:
                raise KeyError(f'sequence "{name}" does not exist')
            state = seqs.pop(name)
            if not seqs:
                data.pop(self._SEQUENCES, None)
            self._save(data)
            return state

    def seq_alloc(self, name: str, n: int = 1) -> int:
        """Atomically allocate ``n`` consecutive values; returns the
        FIRST.  Bounds follow Postgres: exceeding maxvalue (ascending)
        or minvalue (descending) errors unless CYCLE; a cycling
        allocation restarts at the opposite bound (single-step only —
        a bulk allocation that would cross the bound mid-batch errors,
        matching what per-row nextval would produce only for n=1)."""
        if n <= 0:
            raise ValueError("seq_alloc needs n >= 1")
        with self._lock:
            data = self._load()
            seqs = data.get(self._SEQUENCES, {})
            if name not in seqs:
                raise KeyError(f'sequence "{name}" does not exist')
            s = seqs[name]
            inc = int(s["increment"])
            if s.get("is_called"):
                first = int(s["last_value"]) + inc
            else:
                first = int(s["last_value"])
            last = first + (n - 1) * inc
            lo, hi = int(s["minvalue"]), int(s["maxvalue"])
            if (inc > 0 and last > hi) or (inc < 0 and last < lo):
                if s.get("cycle") and n == 1:
                    first = last = lo if inc > 0 else hi
                elif s.get("cycle"):
                    raise ValueError(
                        f'bulk allocation of {n} values would cycle '
                        f'sequence "{name}" mid-batch; insert in smaller '
                        "batches"
                    )
                else:
                    bound = "maxvalue" if inc > 0 else "minvalue"
                    raise ValueError(
                        f'nextval: reached {bound} of sequence "{name}" '
                        f"({hi if inc > 0 else lo})"
                    )
            s["last_value"] = last
            s["is_called"] = True
            self._save(data)
            return first
