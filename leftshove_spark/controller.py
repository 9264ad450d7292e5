"""Adaptive window controller — the reference's only "optimizer".

Per table per cycle, pick the next half-open capture window ``(lo, hi]``
over the NMS column. Direct reimplementation of the 4-case machine in
cdc.go:61-96 (SURVEY.md §2.10 W2/W3), driver-side by design — the
reference keeps it in Go on the driver for the same reason we keep it in
Python: it's control-plane math over two timestamps and two row counts,
never data-plane.

Cases (same order and constants as cdc.go):
  1. skip          — shoved within the replication buffer and watermark
                     already near now ⇒ no query this cycle (cdc.go:67-68)
  2. big backlog   — row growth > backlog_batches×batch ⇒ catch-up step of
                     ≤ max_step_hours, capped at now−buffer (cdc.go:69-78)
  3. stale small   — growth < one batch AND watermark older than
                     max_step_hours ⇒ same bounded step (cdc.go:79-88)
  4. near-realtime — watermark within 2×buffer of now ⇒ fine step of
                     nms + diff/3 (cdc.go:89-91)
  default          — jump straight to now−buffer (cdc.go:92-95)

W3 (late-data guard): the new watermark NEVER exceeds now−buffer, so rows
committed late on a replica are still captured by a later window.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta
from enum import Enum


class WindowCase(Enum):
    SKIP = "skip"
    BACKLOG = "backlog"
    STALE = "stale"
    NEAR_REALTIME = "near_realtime"
    DEFAULT = "default"


@dataclass(frozen=True)
class WindowDecision:
    case: WindowCase
    lo: datetime | None  # exclusive (None on skip)
    hi: datetime | None  # inclusive (None on skip)

    @property
    def skip(self) -> bool:
        return self.case is WindowCase.SKIP


def next_window(
    now: datetime,
    nms: datetime,
    last_shoved_on: datetime | None,
    last_row_count: int,
    current_row_count: int,
    *,
    replication_buffer_secs: int = 180,
    batch_count: int = 4096,
    backlog_batches: int = 8,
    max_step_hours: int = 336,
) -> WindowDecision:
    """Pick the next capture window (cdc.go:61-96 semantics).

    ``now`` is injected (not read from the clock) so cycles are
    deterministic and testable.
    """
    buffer = timedelta(seconds=replication_buffer_secs)
    cap = now - buffer  # W3: hard upper bound for any watermark advance
    row_diff = current_row_count - last_row_count
    nms_age = now - nms

    # case 1 — skip: recently shoved and watermark is already near now
    # (cdc.go:67-68: lastShove within buffer AND nms within 2×buffer)
    if (
        last_shoved_on is not None
        and (now - last_shoved_on) < buffer
        and nms_age < 2 * buffer
    ):
        return WindowDecision(WindowCase.SKIP, None, None)

    max_step = timedelta(hours=max_step_hours)

    # W3 guard: if the watermark is already at/past now−buffer, any bounded
    # step would produce an inverted window (hi < nms) whose commit moves
    # the watermark BACKWARD — a latent flaw in the reference
    # (cdc.go:72-76) we do not reproduce. Nothing new can be captured yet.
    if cap <= nms:
        return WindowDecision(WindowCase.SKIP, None, None)

    # case 2 — big backlog: growth > 8×batch ⇒ bounded catch-up (cdc.go:69-78)
    if row_diff > backlog_batches * batch_count:
        hi = min(nms + max_step, cap)
        return WindowDecision(WindowCase.BACKLOG, nms, hi)

    # case 3 — stale small table: little growth but watermark very old
    # (cdc.go:79-88)
    if row_diff < batch_count and nms_age > max_step:
        hi = min(nms + max_step, cap)
        return WindowDecision(WindowCase.STALE, nms, hi)

    # case 4 — near-realtime: watermark within 2×buffer ⇒ fine step diff/3
    # (cdc.go:89-91)
    if nms_age < 2 * buffer:
        hi = min(nms + nms_age / 3, cap)
        if hi <= nms:
            return WindowDecision(WindowCase.SKIP, None, None)
        return WindowDecision(WindowCase.NEAR_REALTIME, nms, hi)

    # default — jump to now−buffer (cdc.go:92-95)
    return WindowDecision(WindowCase.DEFAULT, nms, cap)
