"""Timestamp-type robustness battery.

Spark ≥4.1 infers tz-naive parquet timestamps (isAdjustedToUTC=false —
the test data's encoding and DuckDB's default output) as TIMESTAMP_NTZ;
older runtimes and tz-adjusted files give TIMESTAMP. The round-5 runtime
flip silently broke the F4/F5 munge comparison (wrong answers, no error)
and hard-broke every `withWatermark`/`unix_micros` path. This battery
parametrizes the capture, munge, temporal, and streaming surfaces over
BOTH types so the next runtime flip is caught by pytest, not the driver.

The NTZ variants are synthesized with an explicit cast / explicit reader
schema, so they exercise the defensive normalization even on runtimes
where `spark.sql.parquet.inferTimestampNTZ.enabled=false` took effect.
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from leftshove_spark.snapshot import build_capture
from leftshove_spark.sources import cast_ntz_to_timestamp, load_table
from leftshove_spark.streaming import (
    build_stream_capture,
    dedup_stream,
    stream_stream_join,
    tumbling_window_stream,
)

from conftest import SF0001

TS_TYPES = ["timestamp", "timestamp_ntz"]
MIN_TS = "2024-01-15 00:00:00"
LO, HI = datetime(2023, 1, 1), datetime(2024, 3, 1)


@pytest.fixture(scope="module")
def events(spark):
    return load_table(spark, SF0001, "events").cache()


def _typed(events, dtype):
    """The events table with its nms column forced to the given
    timestamp flavor — the two shapes a source may hand the engine."""
    return events.withColumn("ts", F.col("ts").cast(dtype))


def test_cast_ntz_helper_normalizes_all_and_only_ntz(events):
    mixed = events.withColumn("ts_ntz", F.col("ts").cast("timestamp_ntz"))
    out = cast_ntz_to_timestamp(mixed)
    types = {f.name: f.dataType for f in out.schema.fields}
    assert isinstance(types["ts"], T.TimestampType)
    assert isinstance(types["ts_ntz"], T.TimestampType)
    # values identical under the UTC session tz
    n_diff = out.filter(F.col("ts") != F.col("ts_ntz")).count()
    assert n_diff == 0


@pytest.mark.parametrize("dtype", TS_TYPES)
def test_munge_to_null_both_types(events, dtype):
    src = _typed(events, dtype)
    cap = build_capture(
        src, "ts", LO, HI,
        munge_to_null=True, min_ts=MIN_TS, snapshot_at=datetime(2026, 1, 1),
    )
    lo_lit = F.lit(MIN_TS).cast(dtype)
    assert cap.filter(F.col("ts") < lo_lit).count() == 0
    n_below = src.filter(
        (F.col("ts") > F.lit(LO).cast(dtype))
        & (F.col("ts") <= F.lit(HI).cast(dtype))
        & (F.col("ts") < lo_lit)
    ).count()
    assert n_below > 0  # fixture must actually exercise the clamp
    assert cap.filter(F.col("ts").isNull()).count() == n_below


@pytest.mark.parametrize("dtype", TS_TYPES)
def test_munge_to_min_both_types(events, dtype):
    src = _typed(events, dtype)
    cap = build_capture(
        src, "ts", LO, HI,
        munge_to_min=True, min_ts=MIN_TS, snapshot_at=datetime(2026, 1, 1),
    )
    assert cap.filter(F.col("ts") < F.lit(MIN_TS).cast(dtype)).count() == 0
    assert cap.filter(F.col("ts").isNull()).count() == 0
    # clamped rows sit exactly at min
    n_below = src.filter(
        (F.col("ts") > F.lit(LO).cast(dtype))
        & (F.col("ts") <= F.lit(HI).cast(dtype))
        & (F.col("ts") < F.lit(MIN_TS).cast(dtype))
    ).count()
    assert cap.filter(F.col("ts") == F.lit(MIN_TS).cast("timestamp")).count() >= n_below


@pytest.mark.parametrize("dtype", TS_TYPES)
def test_window_predicate_capture_count_both_types(events, dtype):
    src = _typed(events, dtype)
    cap = build_capture(src, "ts", datetime(2024, 1, 1), datetime(2024, 1, 10))
    want = events.filter(
        (F.col("ts") > F.lit(datetime(2024, 1, 1)))
        & (F.col("ts") <= F.lit(datetime(2024, 1, 10)))
    ).count()
    assert cap.count() == want


@pytest.mark.parametrize("dtype", TS_TYPES)
def test_range_join_both_types(spark, events, dtype):
    from leftshove_spark.operators.temporal import range_join_bucketed

    facts = _typed(events.select("event_id", "ts"), dtype)
    ranges = spark.createDataFrame(
        [(datetime(2024, 1, 1), datetime(2024, 1, 8)),
         (datetime(2024, 1, 8), datetime(2024, 1, 15))],
        "start timestamp, end timestamp",
    ).withColumn("start", F.col("start").cast(dtype)).withColumn(
        "end", F.col("end").cast(dtype)
    )
    out = range_join_bucketed(
        facts, ranges, ts_col="ts", start_col="start", end_col="end",
        bucket_seconds=7 * 86400,
    )
    want = events.filter(
        (F.col("ts") >= F.lit(datetime(2024, 1, 1)))
        & (F.col("ts") < F.lit(datetime(2024, 1, 15)))
    ).count()
    assert out.count() == want


def _ntz_stream(spark, events, tmp_path, n=400):
    """A genuinely NTZ-typed streaming source: parquet landing dir read
    back through an explicit NTZ reader schema (mimics a runtime whose
    NTZ-inference conf is immutable)."""
    landing = str(tmp_path / "landing")
    sample = events.select("event_id", "user_id", "ts").limit(n)
    sample.coalesce(1).write.mode("overwrite").parquet(landing)
    schema = T.StructType(
        [
            T.StructField("event_id", sample.schema["event_id"].dataType),
            T.StructField("user_id", sample.schema["user_id"].dataType),
            T.StructField("ts", T.TimestampNTZType()),
        ]
    )
    src = spark.readStream.schema(schema).parquet(landing)
    assert isinstance(src.schema["ts"].dataType, T.TimestampNTZType)
    return src, landing


def _drain(df, tmp_path, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append" if df.isStreaming else "complete")
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_stream_capture_accepts_ntz_source(spark, events, tmp_path):
    src, _ = _ntz_stream(spark, events, tmp_path)
    cap = build_stream_capture(src, "ts", buffer_secs=60)
    _drain(cap, tmp_path, "ntz_cap")
    got = spark.sql("select count(*) n from ntz_cap").collect()[0]["n"]
    assert got == 400


def test_tumbling_window_stream_accepts_ntz_source(spark, events, tmp_path):
    src, landing = _ntz_stream(spark, events, tmp_path)
    agg = tumbling_window_stream(src, "ts", window="7 days", buffer_secs=60)
    _drain(agg, tmp_path, "ntz_tumble")
    got = spark.sql("select sum(n) s from ntz_tumble").collect()[0]["s"]
    # availableNow append-mode emits only watermark-closed windows; every
    # emitted row must still be a real (batch-verifiable) window
    batch = (
        spark.read.parquet(landing)
        .groupBy(F.window(F.col("ts").cast("timestamp"), "7 days"))
        .count()
    )
    assert got is None or got <= 400
    assert batch.agg(F.sum("count")).collect()[0][0] == 400


def test_dedup_stream_accepts_ntz_source(spark, events, tmp_path):
    src, _ = _ntz_stream(spark, events, tmp_path)
    dd = dedup_stream(src, ["event_id"], "ts", buffer_secs=60)
    _drain(dd, tmp_path, "ntz_dedup")
    got = spark.sql("select count(*) n from ntz_dedup").collect()[0]["n"]
    assert got == 400  # event_id is unique in the fixture


def test_stream_stream_join_accepts_ntz_sources(spark, events, tmp_path):
    # W13's latent NTZ bug (VERDICT r5): its original test synthesized
    # TIMESTAMP-typed files, masking it. Drive it with NTZ on BOTH sides.
    left, _ = _ntz_stream(spark, events, tmp_path / "l")
    right, _ = _ntz_stream(spark, events, tmp_path / "r")
    right2 = right.select("event_id", F.col("ts").alias("r_ts"))
    j = stream_stream_join(
        left, right2, key="event_id", left_ts="ts", right_ts="r_ts",
        max_delay_secs=3600,
    )
    _drain(j, tmp_path, "ntz_ssj")
    got = spark.sql("select count(*) n from ntz_ssj").collect()[0]["n"]
    assert got == 400  # self-join on unique key at delay 0 → one match each
