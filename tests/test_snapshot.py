"""Capture-builder tests — F1–F6 composition (postgres.go:43-115)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from leftshove_spark.schema import SNAPSHOT_COL
from leftshove_spark.snapshot import build_capture
from leftshove_spark.sources import load_table

from conftest import SF0001


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF0001, "events").cache()


def test_capture_preserves_column_order_and_appends_stamp(events):
    cap = build_capture(
        events, "ts", datetime(2024, 1, 1), datetime(2024, 2, 1),
        snapshot_at=datetime(2026, 1, 1),
    )
    assert cap.columns == [*events.columns, SNAPSHOT_COL]  # F2 ordinal order + F6
    stamps = cap.select(SNAPSHOT_COL).distinct().collect()
    assert [r[0] for r in stamps] == [datetime(2026, 1, 1)]


def test_capture_runtime_stamp_is_current_timestamp(events):
    cap = build_capture(events, "ts", datetime(2024, 1, 1), datetime(2024, 1, 10))
    row = cap.select(SNAPSHOT_COL).first()
    assert row[0] is not None  # now() path (postgres.go:50)


def test_munge_to_null(events):
    min_ts = "2024-01-15 00:00:00"
    cap = build_capture(
        events, "ts", datetime(2023, 1, 1), datetime(2024, 3, 1),
        munge_to_null=True, min_ts=min_ts, snapshot_at=datetime(2026, 1, 1),
    )
    # every surviving non-null ts >= min; rows below min became NULL
    assert cap.filter(F.col("ts") < F.lit(min_ts).cast("timestamp")).count() == 0
    n_below = events.filter(
        (F.col("ts") > F.lit(datetime(2023, 1, 1)))
        & (F.col("ts") <= F.lit(datetime(2024, 3, 1)))
        & (F.col("ts") < F.lit(min_ts).cast("timestamp"))
    ).count()
    assert cap.filter(F.col("ts").isNull()).count() == n_below


def test_munge_to_min_clamps(events):
    min_ts = "2024-01-15 00:00:00"
    cap = build_capture(
        events, "ts", datetime(2023, 1, 1), datetime(2024, 3, 1),
        munge_to_min=True, min_ts=min_ts, snapshot_at=datetime(2026, 1, 1),
    )
    assert cap.filter(F.col("ts") < F.lit(min_ts).cast("timestamp")).count() == 0
    assert cap.filter(F.col("ts").isNull()).count() == 0


def test_stringify_arrays_for_ndjson_sink(spark):
    em = load_table(spark, SF001_EMBEDDINGS := "/root/testdata/sf0.001", "embeddings")
    # give embeddings a fake nms column to drive build_capture
    em2 = em.withColumn("nms", F.lit(datetime(2024, 1, 2)).cast("timestamp"))
    cap = build_capture(
        em2, "nms", datetime(2024, 1, 1), datetime(2024, 1, 3),
        stringify_arrays=True, snapshot_at=datetime(2026, 1, 1),
    )
    fld = {f.name: f.dataType for f in cap.schema.fields}
    assert isinstance(fld["embedding"], T.StringType)  # F3 array→JSON
    first = cap.select("embedding").first()[0]
    assert first.startswith("[")


def test_state_at_equals_asof_history_and_pushes_down(spark):
    """The state_at fast path: identical rows to the interval filter
    over the derived history (versions after T cannot change which
    version is current at T), and — unlike the derived form, whose
    lead() window blocks pushdown — its time predicate reaches the
    parquet scan."""
    from datetime import datetime

    from leftshove_spark.sources import load_table
    from leftshove_spark.views import as_of, history_view, state_at

    o = load_table(spark, SF0001, "orders")
    T = datetime(1997, 6, 1)
    fast = state_at(
        o, "o_custkey", T, order_col="o_orderdate", tiebreak_cols=["o_orderkey"]
    )
    slow = as_of(
        history_view(o, "o_custkey", order_col="o_orderdate",
                     tiebreak_cols=["o_orderkey"]),
        T,
    )
    a = {(r["o_orderkey"], r["o_custkey"]) for r in fast.select("o_orderkey", "o_custkey").collect()}
    b = {(r["o_orderkey"], r["o_custkey"]) for r in slow.select("o_orderkey", "o_custkey").collect()}
    assert a == b and a
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "LessThanOrEqual(o_orderdate" in plan
