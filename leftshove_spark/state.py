"""Engine state table — watermarks, row counts, cached schemas.

The reference keeps one SQLite row per tracked table (``nmstables`` DDL,
nmsdb.go:54-66; struct nmsdb.go:16-31): name, source id, cached source +
sink schema JSON, NMS/pkey column names, current watermark, last row
count, last-shoved timestamp. We keep the identical logical schema in a
single small parquet dataset (driver-side scale: O(#tables) rows — a
driver dict in memory, parquet on disk for restart durability, mirroring
SQLite's role).

Semantics reproduced:
- W6 upsert keyed on (name, dsn) — re-seeding refreshes schema/rowcount/
  nms without duplicating rows (nmsdb.go:126-158).
- W5 transactional watermark commit — ``commit_watermark`` is called only
  after a capture cycle's sink write succeeds (cdc.go:127-136 →
  nmsdb.go:198-212); a failed cycle leaves the watermark unchanged, the
  window is re-captured next cycle, and the dedup view absorbs the
  duplicates (at-least-once + dedup = the reference's delivery model).
- S6 state backup — JSON-lines dump (nmsdb.go:160-177).
"""

from __future__ import annotations

import json
import os
import threading
from dataclasses import asdict, dataclass, field
from datetime import datetime


@dataclass
class TableState:
    """One tracked table — mirrors nmsdb.go:16-31 / DDL nmsdb.go:54-66."""

    name: str
    dsn: str  # source id (reference: DSN enum index)
    nms_column: str
    pkey_column: str | None = None
    nms: datetime | None = None  # current watermark
    last_row_count: int = 0
    last_shoved_on: datetime | None = None
    source_schema_json: str | None = None  # nmsdb.go:59 table_schema
    sink_schema_json: str | None = None  # nmsdb.go:60 bq_schema
    path: str | None = None  # source location (our engine: parquet dir / jdbc url)
    extra: dict = field(default_factory=dict)

    def key(self) -> tuple[str, str]:
        return (self.name, self.dsn)


class StateStore:
    """Insert-or-update state store keyed on (name, dsn) with JSON-file
    durability — the SQLite analog. All access is driver-side; the data
    plane never touches this."""

    def __init__(self, path: str | None = None):
        self.path = path
        self._tables: dict[tuple[str, str], TableState] = {}
        # Engine.run_cycle commits from a ThreadPoolExecutor when
        # concurrent_streams > 1; serialize mutations + the tmp-file
        # replace so a concurrent flush can't publish a torn state file.
        self._lock = threading.Lock()
        if path and os.path.exists(path):
            self._load()

    # -- W6: upsert (nmsdb.go:126-158) ------------------------------------
    def upsert(self, st: TableState) -> None:
        with self._lock:
            existing = self._tables.get(st.key())
            if existing is not None:
                # refresh schema/count/nms, keep identity — UPDATE path
                # (nmsdb.go:132-145). A fresh seed never moves an existing
                # watermark backward.
                if st.nms is not None and existing.nms is not None:
                    st.nms = max(st.nms, existing.nms)
                st.last_shoved_on = existing.last_shoved_on
            self._tables[st.key()] = st
            self._flush()

    # -- W5: transactional watermark commit (nmsdb.go:198-212) ------------
    def commit_watermark(
        self, name: str, dsn: str, new_nms: datetime, row_count: int, now: datetime
    ) -> None:
        with self._lock:
            st = self._tables[(name, dsn)]
            st.nms = new_nms
            st.last_row_count = row_count
            st.last_shoved_on = now  # datetime('now') stamp (nmsdb.go:204)
            self._flush()

    def update_schemas(
        self,
        name: str,
        dsn: str,
        source_schema_json: str | None = None,
        sink_schema_json: str | None = None,
    ) -> None:
        """Refresh the cached schema JSON after an applied evolution
        (D6 detect → D7 apply → cache update; the reference refreshes
        its SQLite schema cache on re-seed — nmsdb.go:132-145 — ours
        also updates mid-loop when run_cycle auto-applies drift)."""
        with self._lock:
            st = self._tables[(name, dsn)]
            if source_schema_json is not None:
                st.source_schema_json = source_schema_json
            if sink_schema_json is not None:
                st.sink_schema_json = sink_schema_json
            self._flush()

    # -- S5: state scan (nmsdb.go:76-124) ----------------------------------
    def all(self) -> list[TableState]:
        return list(self._tables.values())

    def get(self, name: str, dsn: str) -> TableState | None:
        return self._tables.get((name, dsn))

    # -- S6: JSON-lines backup (nmsdb.go:160-177) ---------------------------
    def backup(self, path: str) -> None:
        with open(path, "a") as f:
            for st in self._tables.values():
                f.write(json.dumps(self._row(st), default=str) + "\n")

    # -- durability ---------------------------------------------------------
    @staticmethod
    def _row(st: TableState) -> dict:
        return asdict(st)

    def _flush(self) -> None:
        if not self.path:
            return
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump([self._row(s) for s in self._tables.values()], f, default=str)
        os.replace(tmp, self.path)

    def _load(self) -> None:
        with open(self.path) as f:
            rows = json.load(f)
        for r in rows:
            for ts_field in ("nms", "last_shoved_on"):
                if r.get(ts_field):
                    r[ts_field] = datetime.fromisoformat(r[ts_field])
            st = TableState(**r)
            self._tables[st.key()] = st
