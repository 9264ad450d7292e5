"""CDC-semantics invariants on the events fixture (SURVEY.md §5.3):

(a) consecutive half-open windows PARTITION the table — union == full
    table and pairwise disjoint (F1/W7 exactly-one-window property);
(b) re-capturing an overlapping window duplicates rows, but the dedup
    view (J3) restores exactly-once — and equals an independently
    computed latest-per-key;
(c) the engine's cycle loop commits watermarks monotonically and the
    sink equals the source after catch-up (at-least-once delivery);
(d) both dedup view forms agree when ordering is total.
"""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from leftshove_spark import views
from leftshove_spark.engine import Engine
from leftshove_spark.session import EngineConfig
from leftshove_spark.snapshot import build_capture, window_predicate
from leftshove_spark.sources import load_table

from conftest import SF0001

LO = datetime(2023, 12, 31)
HI = datetime(2024, 3, 1)


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF0001, "events").cache()


def test_windows_partition_the_table(events):
    """(a) — union of consecutive (lo,hi] windows == table; disjoint."""
    bounds = [LO + timedelta(days=7 * i) for i in range(10)]
    total = 0
    for lo, hi in zip(bounds, bounds[1:]):
        total += events.filter(window_predicate("ts", lo, hi)).count()
    full = events.filter(window_predicate("ts", bounds[0], bounds[-1])).count()
    assert total == full  # disjoint AND covering ⇔ counts add up exactly
    assert full == events.count()  # fixture fits inside the span


def test_half_open_boundary_row_in_exactly_one_window(events):
    """A row AT a boundary belongs to the earlier window only (<= hi,
    > lo strict)."""
    boundary = events.agg(F.max("ts")).collect()[0][0]
    before = events.filter(window_predicate("ts", LO, boundary))
    after = events.filter(window_predicate("ts", boundary, HI))
    assert before.filter(F.col("ts") == boundary).count() > 0
    assert after.filter(F.col("ts") == boundary).count() == 0


def test_at_least_once_plus_dedup_is_exactly_once(events):
    """(b) — overlapping re-capture then J3 == independent latest-per-key."""
    w1 = build_capture(events, "ts", LO, datetime(2024, 1, 15), snapshot_at=datetime(2026, 1, 1))
    w2 = build_capture(  # overlaps w1 on (01-05, 01-15]
        events, "ts", datetime(2024, 1, 5), HI, snapshot_at=datetime(2026, 1, 2)
    )
    cdc = w1.unionAll(w2)
    assert cdc.count() > events.count()  # duplicates really exist
    dedup = views.latest_per_key_window(cdc, "event_id", order_col="snapshot_tm")
    assert dedup.count() == events.count()
    # value-level: dedup rows == source rows (event_id is unique in events)
    src = events.select("event_id", "ts", "user_id")
    got = dedup.select("event_id", "ts", "user_id")
    assert got.exceptAll(src).count() == 0
    assert src.exceptAll(got).count() == 0


def test_dedup_forms_agree(events):
    """(d) — window form == semi-join form when ordering has no ties
    (tiebreak on event_id makes row_number total)."""
    w = views.latest_per_key_window(events, "user_id", "ts", tiebreak_cols=["event_id"])
    s = views.latest_per_key_semijoin(events, "user_id", "ts")
    # semijoin keeps all ties at max; with per-user distinct max ts they agree
    assert w.count() == s.count()
    a = w.select("event_id").exceptAll(s.select("event_id"))
    assert a.count() == 0


def test_engine_cycles_catch_up_and_commit_monotonically(spark, tmp_path):
    """(c) — run cycles until caught up; watermarks only advance; sink
    contains every source row exactly once via the current-state view."""
    eng = Engine(
        spark,
        EngineConfig(concurrent_streams=2),
        state_path=str(tmp_path / "state.json"),
        sink_root=str(tmp_path / "sink"),
    )
    eng.seed([
        {"name": "ev", "path": f"{SF0001}/events.parquet", "nms_column": "ts",
         "pkey_column": "event_id"},
    ])
    eng.create_sinks()
    seen_nms = []
    now = datetime(2026, 8, 1)
    for i in range(4):
        eng.run_cycle(now=now + timedelta(hours=i), snapshot_at=datetime(2026, 1, 1 + i))
        seen_nms.append(eng.state.get("ev", "0").nms)
    assert seen_nms == sorted(seen_nms)  # monotone watermark
    src_n = load_table(spark, SF0001, "events").count()
    assert eng.current_state("ev").count() == src_n  # exactly-once via view


def test_failed_cycle_does_not_commit(spark, tmp_path):
    """W5 — a failing capture leaves the watermark unchanged."""
    eng = Engine(
        spark,
        EngineConfig(),
        state_path=str(tmp_path / "state.json"),
        sink_root=str(tmp_path / "sink"),
    )
    eng.seed([
        {"name": "ev", "path": f"{SF0001}/events.parquet", "nms_column": "ts",
         "pkey_column": "event_id"},
    ])
    eng.create_sinks()
    before = eng.state.get("ev", "0").nms
    eng.state.get("ev", "0").path = str(tmp_path / "missing.parquet")  # break the source
    res = eng.run_cycle(now=datetime(2026, 8, 1))
    assert res["ev"] is None  # failure isolated, not raised (cdc.go:128-131)
    assert eng.state.get("ev", "0").nms == before  # no commit


def test_concurrent_fanout_matches_sequential(spark, tmp_path):
    """W4 — a bounded-concurrency cycle (ThreadPoolExecutor over tables,
    cdc.go:115-140's goroutine-per-stream analog) commits IDENTICAL state
    and sink contents to a sequential cycle over the same 3 tables."""
    tables = [
        {"name": "ev", "path": f"{SF0001}/events.parquet", "nms_column": "ts",
         "pkey_column": "event_id"},
        {"name": "ord", "path": f"{SF0001}/orders.parquet",
         "nms_column": "o_orderdate", "pkey_column": "o_orderkey"},
        {"name": "ev2", "path": f"{SF0001}/events.parquet", "nms_column": "ts",
         "pkey_column": "event_id"},
    ]
    engines = {}
    for label, workers in (("seq", 1), ("conc", 3)):
        eng = Engine(
            spark,
            EngineConfig(concurrent_streams=workers, replication_buffer_secs=0),
            state_path=str(tmp_path / f"state_{label}.json"),
            sink_root=str(tmp_path / f"sink_{label}"),
        )
        eng.seed(tables)
        eng.create_sinks()
        for i in range(3):
            eng.run_cycle(
                now=datetime(2026, 8, 1) + timedelta(hours=i),
                snapshot_at=datetime(2026, 1, 1 + i),
            )
        engines[label] = eng
    for t in tables:
        n = t["name"]
        seq, conc = engines["seq"].state.get(n, "0"), engines["conc"].state.get(n, "0")
        assert seq.nms == conc.nms  # identical watermark commits
        a = engines["seq"].current_state(n)
        b = engines["conc"].current_state(n)
        cols = [c for c in a.columns if c != "snapshot_tm"]
        assert a.select(cols).exceptAll(b.select(cols)).count() == 0
        assert b.select(cols).exceptAll(a.select(cols)).count() == 0


def test_snapshot_diff_classification_and_null_semantics(spark):
    """Diff classification on a crafted table: membership changes,
    value changes, NULL->value and value->NULL transitions (both are
    'changed'), NULL-equal columns ('unchanged'), and a NULL key row
    present in both sides (matched by the null-safe key join, not
    misread as added+removed)."""
    from leftshove_spark.views import snapshot_diff

    old = spark.createDataFrame(
        [(1, 10.0, "a"), (2, 20.0, None), (3, None, "c"), (4, 40.0, "d"),
         (None, 99.0, "nk")],
        "k int, v double, s string",
    )
    new = spark.createDataFrame(
        [(1, 10.0, "a"),            # unchanged
         (2, 20.0, "now-set"),      # NULL -> value = changed
         (3, None, "c"),            # NULL == NULL = unchanged
         (5, 50.0, "e"),            # added (4 removed)
         (None, 99.0, "nk")],       # NULL key, identical = unchanged
        "k int, v double, s string",
    )
    got = {
        (r["k"], r["change_type"])
        for r in snapshot_diff(old, new, "k").collect()
    }
    assert got == {(2, "changed"), (4, "removed"), (5, "added")}

    full = {
        (r["k"], r["change_type"])
        for r in snapshot_diff(old, new, "k", include_unchanged=True).collect()
    }
    assert (1, "unchanged") in full and (3, "unchanged") in full
    assert (None, "unchanged") in full  # null-safe key match
    assert len(full) == 6


def test_retention_select_preserves_post_horizon_state_randomized(spark):
    """Model-based check on a seeded random version history (80 keys ×
    geometric version counts, colliding timestamps included): for ANY
    query instant ts >= horizon, state over the retained rows equals
    state over the full history — verified against a pure-Python model
    at every distinct version timestamp and both boundaries."""
    import random
    from datetime import datetime, timedelta

    from leftshove_spark.views import retention_select, latest_per_key_window

    rng = random.Random(80843)
    base = datetime(2026, 1, 1)
    rows = []
    for k in range(80):
        for _ in range(rng.choice([1, 1, 2, 3, 5])):
            # coarse timestamp grid -> deliberate (key, tm) collisions
            tm = base + timedelta(hours=rng.randrange(0, 48))
            rows.append((k, tm, rng.randrange(10**6)))
    df = spark.createDataFrame(rows, "k long, snapshot_tm timestamp, v long")
    horizon = base + timedelta(hours=24)
    kept = retention_select(df, horizon, "k", tiebreak_cols=["v"]).collect()

    def model_state(rs, ts):
        best = {}
        for k, tm, v in rs:
            if tm <= ts and (k not in best or (tm, v) > best[k]):
                best[k] = (tm, v)
        return {k: tv for k, (tm, tv) in ((k, b) for k, b in best.items())}

    kept_rows = [(r["k"], r["snapshot_tm"], r["v"]) for r in kept]
    probe_ts = sorted({tm for _, tm, _ in rows if tm >= horizon})
    probe_ts += [horizon, base + timedelta(days=30)]
    for ts in probe_ts:
        assert model_state(kept_rows, ts) == model_state(rows, ts), ts

    # and the Spark state_at over the retained rows agrees with the model
    ts = probe_ts[len(probe_ts) // 2]
    kept_df = spark.createDataFrame(kept_rows, "k long, snapshot_tm timestamp, v long")
    got = {
        r["k"]: r["v"]
        for r in latest_per_key_window(
            kept_df.filter(F.col("snapshot_tm") <= ts), "k", tiebreak_cols=["v"]
        ).collect()
    }
    assert got == {k: v for k, v in model_state(rows, ts).items()}


def test_snapshot_diff_randomized_against_model(spark):
    """Model-based: seeded random old/new snapshots (overlapping keys,
    NULL-able value columns, disjoint adds/removes) — classification
    matches a pure-Python dict model exactly, and include_unchanged
    covers every key exactly once."""
    import random

    from leftshove_spark.views import snapshot_diff

    rng = random.Random(424242)

    def snap(keys):
        return {
            k: (
                rng.choice([None, rng.randrange(5)]),
                rng.choice([None, "x", "y"]),
            )
            for k in keys
        }

    old_keys = set(rng.sample(range(200), 120))
    new_keys = set(rng.sample(range(200), 120))
    old, new = snap(old_keys), snap(new_keys)
    # force some unchanged rows (same payload both sides)
    for k in list(old_keys & new_keys)[:30]:
        new[k] = old[k]

    old_df = spark.createDataFrame(
        [(k, v, s) for k, (v, s) in old.items()], "k long, v long, s string"
    )
    new_df = spark.createDataFrame(
        [(k, v, s) for k, (v, s) in new.items()], "k long, v long, s string"
    )
    got = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old_df, new_df, "k", include_unchanged=True).collect()
    }
    want = {}
    for k in old_keys | new_keys:
        if k not in old:
            want[k] = "added"
        elif k not in new:
            want[k] = "removed"
        else:
            want[k] = "unchanged" if old[k] == new[k] else "changed"
    assert got == want
    filtered = {
        r["k"]: r["change_type"]
        for r in snapshot_diff(old_df, new_df, "k").collect()
    }
    assert filtered == {k: c for k, c in want.items() if c != "unchanged"}


def test_temporal_join_asof_slice_equals_joined_states(spark):
    """Temporal-join correctness from first principles: for any probe
    instant, as_of over the ALIGNED intervals must equal the plain join
    of the two sides' as_of states — checked at several instants over a
    crafted two-key history with open intervals and version churn."""
    from datetime import datetime

    from leftshove_spark.views import as_of, history_view, temporal_join

    t = lambda d: datetime(2026, 1, d)
    a = spark.createDataFrame(
        [(1, t(1), "a1"), (1, t(5), "a2"), (1, t(9), "a3"), (2, t(2), "b1")],
        "k long, ts timestamp, av string",
    )
    b = spark.createDataFrame(
        [(1, t(3), 10), (1, t(7), 20), (2, t(1), 30), (2, t(8), 40)],
        "k long, ts timestamp, bv long",
    )
    ah = history_view(a, "k", order_col="ts").drop("ts", "is_current")
    bh = history_view(b, "k", order_col="ts").drop("ts", "is_current")
    tj = temporal_join(ah, bh, "k")

    for probe in [t(3), t(4), t(6), t(8), t(10), datetime(2027, 1, 1)]:
        aligned = {
            (r["k"], r["av"], r["bv"]) for r in as_of(tj, probe).collect()
        }
        av = {(r["k"], r["av"]) for r in as_of(history_view(a, "k", order_col="ts"), probe).collect()}
        bv = {(r["k"], r["bv"]) for r in as_of(history_view(b, "k", order_col="ts"), probe).collect()}
        want = {(k, x, y) for (k, x) in av for (k2, y) in bv if k == k2}
        assert aligned == want, probe
    # open-interval composition: exactly one current row per key
    cur = [r for r in tj.collect() if r["is_current"]]
    assert sorted((r["k"], r["av"], r["bv"]) for r in cur) == [
        (1, "a3", 20), (2, "b1", 40),
    ]
