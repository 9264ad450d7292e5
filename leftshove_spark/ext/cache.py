"""Pinned-intermediate lifecycle: a session-wide registry so persisted
stage outputs have an OWNER that releases them.

The shingle / simhash signature stages persist their Arrow-stage output
because near-dup callers read it 2-3× (signature build + verification
joins) — without the pin each reference re-runs tokenize+md5 over the
whole corpus (420 s → 35 s for the minhash pipeline at sf0.1). But the
returned DataFrames are lazy, so the pin must outlive the operator call;
before r8 the only release path was a blanket ``spark.clearCache()``
(bench.py did; a long-running engine process would leak cache slowly —
SCALE.md known trade-off #1).

Every pin now registers here, and callers that finish consuming a
dedup/fingerprint result call :func:`release_pins` — surgical (only our
pins, not the caller's own cached tables) and idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel

_PINNED: list[DataFrame] = []


def pin(df: DataFrame, level: StorageLevel = StorageLevel.MEMORY_AND_DISK) -> DataFrame:
    """Persist ``df`` and register it for later :func:`release_pins`."""
    df.persist(level)
    _PINNED.append(df)
    return df


def release_pins() -> int:
    """Unpersist every registered pin (non-blocking); returns how many
    were released. Safe to call at any time — an unpersisted stage
    recomputes if referenced again, it never breaks correctness."""
    n = len(_PINNED)
    for df in _PINNED:
        df.unpersist()
    _PINNED.clear()
    return n


def pinned_count() -> int:
    return len(_PINNED)
