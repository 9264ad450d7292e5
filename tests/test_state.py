"""StateStore tests — W5 commit, W6 upsert, durability, thread safety
(nmsdb.go:126-158, 198-212 semantics). No Spark session."""

import json
import threading
from datetime import datetime, timedelta

from leftshove_spark.state import StateStore, TableState

T0 = datetime(2026, 1, 1)


def mk(name="t", dsn="0", nms=T0):
    return TableState(name=name, dsn=dsn, nms_column="ts", nms=nms)


def test_upsert_inserts_then_updates_without_duplicating():
    s = StateStore()
    s.upsert(mk())
    s.upsert(mk())
    assert len(s.all()) == 1


def test_upsert_keyed_on_name_and_dsn():
    s = StateStore()
    s.upsert(mk(dsn="0"))
    s.upsert(mk(dsn="1"))  # same name, different source ⇒ distinct rows
    assert len(s.all()) == 2


def test_reseed_never_moves_watermark_backward():
    s = StateStore()
    s.upsert(mk(nms=T0 + timedelta(days=5)))
    s.upsert(mk(nms=T0))  # stale re-seed
    assert s.get("t", "0").nms == T0 + timedelta(days=5)


def test_commit_watermark_updates_all_three_fields():
    s = StateStore()
    s.upsert(mk())
    now = T0 + timedelta(days=1)
    s.commit_watermark("t", "0", T0 + timedelta(hours=6), 123, now)
    st = s.get("t", "0")
    assert st.nms == T0 + timedelta(hours=6)
    assert st.last_row_count == 123
    assert st.last_shoved_on == now


def test_durability_roundtrip(tmp_path):
    p = str(tmp_path / "state.json")
    s = StateStore(p)
    s.upsert(mk(nms=T0))
    s.commit_watermark("t", "0", T0 + timedelta(hours=1), 50, T0 + timedelta(hours=2))
    # restart
    s2 = StateStore(p)
    st = s2.get("t", "0")
    assert st.nms == T0 + timedelta(hours=1)
    assert st.last_row_count == 50
    assert st.last_shoved_on == T0 + timedelta(hours=2)


def test_concurrent_commits_leave_valid_state_file(tmp_path):
    """Engine.run_cycle commits from a thread pool (W4); concurrent
    flushes must never publish a torn/partial state file."""
    p = str(tmp_path / "state.json")
    s = StateStore(p)
    n_tables = 16
    for i in range(n_tables):
        s.upsert(mk(name=f"t{i}"))

    def commit(i):
        for k in range(20):
            s.commit_watermark(f"t{i}", "0", T0 + timedelta(hours=k + 1), k, T0)

    threads = [threading.Thread(target=commit, args=(i,)) for i in range(n_tables)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    rows = json.load(open(p))  # parses ⇒ not torn
    assert len(rows) == n_tables
    s2 = StateStore(p)
    for i in range(n_tables):
        assert s2.get(f"t{i}", "0").nms == T0 + timedelta(hours=20)


def test_backup_appends_json_lines(tmp_path):
    s = StateStore()
    s.upsert(mk(name="a"))
    s.upsert(mk(name="b"))
    bp = str(tmp_path / "seed_state.json")
    s.backup(bp)
    lines = open(bp).read().strip().splitlines()
    assert len(lines) == 2
    assert {json.loads(ln)["name"] for ln in lines} == {"a", "b"}
