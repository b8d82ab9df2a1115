"""Persistent payload-hash cache (sqlite in the run directory).

Semantics reimplemented (NOT copied) from the reference's LLM response cache,
/root/reference/apps/api/services/disambiguation/cache.py:16-51: values are
keyed by a sha256 hash of the canonical-JSON request payload so identical
inputs are served from disk instead of re-querying the external source. Here
it backs ``EnrichStage``/``MultiSourceEnrichStage`` BEHIND their in-memory
LRU: at 100 TB an actor restart (preemption, OOM, rescheduling) must not
refetch every key it had already resolved — the sqlite file lives in the
RunDir and survives the actor.

Concurrency: every actor opens its OWN connection (sqlite connections don't
cross process boundaries); WAL journal + busy_timeout make concurrent
single-row upserts from a pool of actors safe. A cache write failure is
non-fatal by design (the lookup result is still returned) — the cache is an
optimization, never a correctness dependency.
"""

from __future__ import annotations

import hashlib
import json
import sqlite3
from typing import Any

_SCHEMA = (
    "CREATE TABLE IF NOT EXISTS payload_cache ("
    "key TEXT PRIMARY KEY, value TEXT NOT NULL, created_at REAL NOT NULL)"
)


def payload_key(payload: Any) -> str:
    """Canonical-JSON sha256 of the payload (order-insensitive for dicts)."""
    s = json.dumps(payload, sort_keys=True, ensure_ascii=False, default=str)
    return hashlib.sha256(s.encode("utf-8")).hexdigest()[:32]


class PayloadCache:
    """One connection per actor; open in ``__init__`` (never ship handles)."""

    def __init__(self, path: str) -> None:
        self.path = str(path)
        self.conn = sqlite3.connect(self.path, timeout=30.0)
        self.conn.execute("PRAGMA journal_mode=WAL")
        self.conn.execute("PRAGMA busy_timeout=30000")
        self.conn.execute(_SCHEMA)
        self.conn.commit()

    def get(self, key: str) -> Any | None:
        try:
            row = self.conn.execute(
                "SELECT value FROM payload_cache WHERE key = ?", (key,)
            ).fetchone()
        except sqlite3.Error:
            return None
        return json.loads(row[0]) if row else None

    def put(self, key: str, value: Any) -> None:
        import time

        try:
            self.conn.execute(
                "INSERT OR REPLACE INTO payload_cache(key, value, created_at) "
                "VALUES (?, ?, ?)",
                (key, json.dumps(value, ensure_ascii=False, default=str), time.time()),
            )
            self.conn.commit()
        except sqlite3.Error:
            pass  # cache is an optimization — a write failure must not fail the row

    def __len__(self) -> int:
        try:
            return int(
                self.conn.execute("SELECT COUNT(*) FROM payload_cache").fetchone()[0]
            )
        except sqlite3.Error:
            return 0

    def close(self) -> None:
        try:
            self.conn.close()
        except sqlite3.Error:
            pass
