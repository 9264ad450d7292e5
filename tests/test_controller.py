"""Controller unit tests — the 4-case window machine of cdc.go:61-96
(SURVEY.md §2.10 W2/W3) plus the inverted-window clamp the reference
lacks. Pure driver-side math; no Spark session."""

from datetime import datetime, timedelta

from leftshove_spark.controller import WindowCase, next_window

NOW = datetime(2026, 8, 13, 12, 0, 0)
BUF = 180  # replication_buffer_secs (sample.env:7)
BATCH = 4096


def win(nms, last_shoved=None, last_count=0, cur_count=0, **kw):
    return next_window(
        NOW, nms, last_shoved, last_count, cur_count,
        replication_buffer_secs=BUF, batch_count=BATCH,
        backlog_batches=8, max_step_hours=336, **kw,
    )


def test_case1_skip_recent_shove_near_watermark():
    # shoved within buffer AND nms within 2×buffer ⇒ skip (cdc.go:67-68)
    d = win(NOW - timedelta(seconds=200), last_shoved=NOW - timedelta(seconds=60))
    assert d.case is WindowCase.SKIP and d.skip


def test_case2_backlog_bounded_step():
    # growth > 8×batch ⇒ catch-up step ≤ 336h (cdc.go:69-78)
    nms = NOW - timedelta(days=100)
    d = win(nms, cur_count=8 * BATCH + 1)
    assert d.case is WindowCase.BACKLOG
    assert d.lo == nms
    assert d.hi == nms + timedelta(hours=336)  # bounded, not now−buffer


def test_case2_backlog_capped_at_now_minus_buffer():
    nms = NOW - timedelta(hours=10)  # 336h step would overshoot now
    d = win(nms, cur_count=8 * BATCH + 1)
    assert d.case is WindowCase.BACKLOG
    assert d.hi == NOW - timedelta(seconds=BUF)  # W3 cap (cdc.go:72-76)


def test_case3_stale_small_table():
    # little growth, watermark older than 336h ⇒ bounded step (cdc.go:79-88)
    nms = NOW - timedelta(days=30)
    d = win(nms, cur_count=10)
    assert d.case is WindowCase.STALE
    assert d.hi == nms + timedelta(hours=336)


def test_case4_near_realtime_fine_step():
    # nms within 2×buffer ⇒ step of diff/3 (cdc.go:89-91)
    nms = NOW - timedelta(seconds=300)
    d = win(nms, cur_count=BATCH + 1)  # growth ≥ batch avoids case 3
    assert d.case is WindowCase.NEAR_REALTIME
    assert d.lo == nms
    assert d.hi == nms + timedelta(seconds=100)  # 300/3


def test_default_jump_to_now_minus_buffer():
    nms = NOW - timedelta(hours=5)
    d = win(nms, cur_count=BATCH + 1)
    assert d.case is WindowCase.DEFAULT
    assert d.hi == NOW - timedelta(seconds=BUF)


def test_watermark_never_exceeds_cap_in_any_case():
    cap = NOW - timedelta(seconds=BUF)
    for nms, cur in [
        (NOW - timedelta(days=400), 10**7),   # backlog
        (NOW - timedelta(days=400), 5),       # stale
        (NOW - timedelta(seconds=250), BATCH + 1),  # near-realtime
        (NOW - timedelta(hours=2), BATCH + 1),      # default
    ]:
        d = win(nms, cur_count=cur)
        if not d.skip:
            assert d.hi <= cap, d


def test_inverted_window_clamp():
    # watermark already past now−buffer with a huge backlog: the reference
    # would emit hi < nms, moving the watermark backward (cdc.go:72-76);
    # we skip instead. Monotonicity holds.
    d = win(NOW - timedelta(seconds=60), cur_count=10**6)
    assert d.case is WindowCase.SKIP


def test_near_realtime_zero_step_skips():
    # degenerate diff/3 == 0 must not emit an empty window
    d = win(NOW - timedelta(seconds=BUF), cur_count=BATCH + 1)
    assert d.skip or d.hi > d.lo


# ---------------------------------------------------------------- property
# Hypothesis sweep of the full input space — the invariants every cycle
# must satisfy regardless of which case fires (pure driver-side math, so
# thousands of examples cost milliseconds).

from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from leftshove_spark import controller as C

_TS = st.datetimes(
    min_value=datetime(2000, 1, 1), max_value=datetime(2035, 1, 1)
)


@settings(max_examples=500, deadline=None)
@given(
    now=_TS,
    nms_back_secs=st.integers(min_value=0, max_value=10 * 365 * 86400),
    shove_back_secs=st.one_of(
        st.none(), st.integers(min_value=0, max_value=86400)
    ),
    last_count=st.integers(min_value=0, max_value=10**12),
    diff=st.integers(min_value=-(10**9), max_value=10**12),
    buffer_secs=st.integers(min_value=1, max_value=3600),
    batch=st.integers(min_value=1, max_value=1_000_000),
    backlog=st.integers(min_value=1, max_value=64),
    step_hours=st.integers(min_value=1, max_value=10000),
)
def test_window_invariants_hold_for_all_inputs(
    now, nms_back_secs, shove_back_secs, last_count, diff,
    buffer_secs, batch, backlog, step_hours,
):
    """For EVERY input: a non-skip window is strictly forward
    (lo = nms < hi), never exceeds now−buffer (W3 late-data guard),
    never advances more than max_step (case-2/3 bound) except the
    sanctioned default jump, and the function is pure (same inputs →
    same decision)."""
    nms = now - timedelta(seconds=nms_back_secs)
    shoved = (
        None if shove_back_secs is None else now - timedelta(seconds=shove_back_secs)
    )
    kw = dict(
        replication_buffer_secs=buffer_secs,
        batch_count=batch,
        backlog_batches=backlog,
        max_step_hours=step_hours,
    )
    d = C.next_window(now, nms, shoved, last_count, last_count + diff, **kw)
    assert d == C.next_window(now, nms, shoved, last_count, last_count + diff, **kw)
    if d.skip:
        assert d.lo is None and d.hi is None
        return
    cap = now - timedelta(seconds=buffer_secs)
    assert d.lo == nms
    assert d.lo < d.hi  # strictly forward: commit can never move backward
    assert d.hi <= cap  # W3: late rows on a replica stay capturable
    if d.case in (C.WindowCase.BACKLOG, C.WindowCase.STALE):
        assert d.hi - d.lo <= timedelta(hours=step_hours)
    if d.case is C.WindowCase.NEAR_REALTIME:
        assert now - nms < 2 * timedelta(seconds=buffer_secs)
