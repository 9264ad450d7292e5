"""Temporal-join operator tests: as-of join semantics (inclusive bound,
left-join nulls, latest-wins) and bucketed range join (exact containment,
overlap multiplicity, bucket-boundary edges)."""

from datetime import datetime

from conftest import SF0001

from pyspark.sql import functions as F

from leftshove_spark.operators.temporal import asof_join, range_join_bucketed


def _ts(s):
    return datetime.fromisoformat(s)


def _asof_fixture(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-10 00:00:00"), "e1"),  # after both quotes
            (1, _ts("2024-01-05 00:00:00"), "e2"),  # exactly at quote q2
            (1, _ts("2024-01-01 00:00:00"), "e3"),  # before every quote
            (2, _ts("2024-01-10 00:00:00"), "e4"),  # key with no right rows
        ],
        "k long, t timestamp, tag string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-03 00:00:00"), 100),  # q1
            (1, _ts("2024-01-05 00:00:00"), 200),  # q2
        ],
        "k long, t timestamp, px long",
    )
    return left, right


def test_asof_backward_inclusive_and_left_nulls(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(
        left, right, on_left="t", on_right="t", by_left="k", by_right="k", value_cols=["px"]
    )
    got = {r["tag"]: r["px"] for r in out.collect()}
    assert got == {
        "e1": 200,  # latest quote at-or-before
        "e2": 200,  # INCLUSIVE bound: equal timestamp matches
        "e3": None,  # no quote yet → left-join null
        "e4": None,  # key absent from right entirely
    }


def test_asof_preserves_left_rowcount_and_columns(spark):
    left, right = _asof_fixture(spark)
    out = asof_join(
        left, right, on_left="t", on_right="t", by_left="k", by_right="k", value_cols=["px"]
    )
    assert out.count() == left.count()
    assert out.columns == ["k", "t", "tag", "px"]


def test_range_join_containment_and_overlap(spark):
    facts = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 00:00:00")),  # == w0 start (inclusive)
            (2, _ts("2024-01-08 12:00:00")),  # inside w0 AND w1 overlap
            (3, _ts("2024-01-15 00:00:00")),  # == w0 end (exclusive) == inside w1
            (4, _ts("2024-03-01 00:00:00")),  # outside every window
        ],
        "fid long, ts timestamp",
    )
    wins = spark.createDataFrame(
        [
            (0, _ts("2024-01-01 00:00:00"), _ts("2024-01-15 00:00:00")),
            (1, _ts("2024-01-08 00:00:00"), _ts("2024-01-22 00:00:00")),
        ],
        "wid long, s timestamp, e timestamp",
    )
    out = range_join_bucketed(
        facts, wins, ts_col="ts", start_col="s", end_col="e", bucket_seconds=7 * 86400
    )
    got = sorted((r["fid"], r["wid"]) for r in out.collect())
    assert got == [(1, 0), (2, 0), (2, 1), (3, 1)]


def test_range_join_matches_theta_join(spark):
    """The bucketed plan is an exact rewrite of the theta-join: same
    pairs on a randomized-ish (but deterministic) grid, including ranges
    longer than the bucket."""
    facts = spark.range(0, 500).select(
        F.col("id").alias("fid"), F.timestamp_micros(F.col("id") * 3_600_000_000).alias("ts")
    )
    wins = spark.range(0, 12).select(
        F.col("id").alias("wid"),
        F.timestamp_micros(F.col("id") * 30 * 3_600_000_000).alias("s"),
        # spans 50h..94h, several times the 12h bucket
        F.timestamp_micros(
            (F.col("id") * 30 + 50 + (F.col("id") % 3) * 22) * 3_600_000_000
        ).alias("e"),
    )
    bucketed = range_join_bucketed(
        facts, wins, ts_col="ts", start_col="s", end_col="e", bucket_seconds=12 * 3600
    )
    theta = facts.join(wins, (F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e")))
    got = sorted((r["fid"], r["wid"]) for r in bucketed.collect())
    want = sorted((r["fid"], r["wid"]) for r in theta.collect())
    assert got == want and len(want) > 0


def test_range_join_fact_side_does_not_shuffle(spark):
    """The scale property itself: with a broadcast range side there is no
    Exchange on the fact side of the join (scan → project → broadcast
    hash join → filter, fully pipelined)."""
    facts = spark.range(0, 100).select(
        F.col("id").alias("fid"), F.timestamp_micros(F.col("id") * 1_000_000).alias("ts")
    )
    wins = spark.createDataFrame(
        [(0, _ts("1970-01-01 00:00:10"), _ts("1970-01-01 00:00:50"))],
        "wid long, s timestamp, e timestamp",
    )
    out = range_join_bucketed(
        facts, wins, ts_col="ts", start_col="s", end_col="e", bucket_seconds=60
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    # the only exchange is the broadcast of the window side
    assert "Exchange hashpartitioning" not in plan


def test_asof_join_bucketed_equals_plain(spark):
    """The hot-key rewrite is exact: identical row multiset to the plain
    asof_join on the fixture join (events × latest-order)."""
    from leftshove_spark.operators.temporal import asof_join_bucketed
    from leftshove_spark.sources import load_table

    ev = load_table(spark, SF0001, "events").select("event_id", "ts", "user_id")
    ords = (
        load_table(spark, SF0001, "orders")
        .select("o_custkey", F.col("o_orderdate").alias("order_dt"), "o_orderkey")
        .groupBy("o_custkey", "order_dt")
        .agg(F.max("o_orderkey").alias("last_order_key"))
    )
    kw = dict(
        on_left="ts", on_right="order_dt", by_left="user_id",
        by_right="o_custkey", value_cols=["last_order_key", "order_dt"],
    )
    plain = asof_join(ev, ords, **kw)
    bucketed = asof_join_bucketed(ev, ords, bucket_seconds=90 * 86_400, **kw)
    assert bucketed.count() == ev.count() == plain.count()
    assert bucketed.exceptAll(plain).count() == 0
    assert plain.exceptAll(bucketed).count() == 0


def test_asof_join_bucketed_hot_key_and_boundaries(spark):
    """One dominant key; right rows at exact bucket boundaries, ties at
    the left timestamp (inclusive pick), empty leading buckets (carry
    must chain across a right-less bucket), and a key with no right
    rows at all (stays NULL)."""
    from leftshove_spark.operators.temporal import asof_join_bucketed

    B = 60  # 1-minute buckets
    mk = lambda s: datetime(2026, 1, 1, 0, 0, s) if s < 60 else datetime(2026, 1, 1, 0, s // 60, s % 60)
    left = spark.createDataFrame(
        [(i, mk(i * 37 % 600), 1) for i in range(200)]  # hot key 1, many buckets
        + [(900, mk(5), 2)],                            # key 2: no right rows
        "event_id long, t timestamp, k long",
    )
    right = spark.createDataFrame(
        [(1, mk(0), 100), (1, mk(60), 200),   # exact bucket boundaries
         (1, mk(185), 300)],                  # mid-bucket; buckets 2,4.. empty
        "k long, t timestamp, v long",
    )
    out = asof_join_bucketed(
        left, right,
        on_left="t", on_right="t", by_left="k", by_right="k",
        value_cols=["v"], bucket_seconds=B,
    ).collect()
    assert len(out) == 201
    for r in out:
        if r["k"] == 2:
            assert r["v"] is None
            continue
        s = r["t"].minute * 60 + r["t"].second
        want = 300 if s >= 185 else 200 if s >= 60 else 100  # inclusive >=
        assert r["v"] == want, (s, r["v"])


def test_asof_join_bucketed_null_keys_times_and_values(spark):
    """Review findings pinned: (a) left rows with NULL key or NULL
    timestamp are PRESERVED (left-join contract) and filled exactly as
    the plain form fills them; (b) a trailing NULL value in a bucket
    does not erase an earlier non-null value from the carry."""
    from leftshove_spark.operators.temporal import asof_join_bucketed

    left = spark.createDataFrame(
        [(1, datetime(2026, 1, 1, 0, 2, 0), 1),
         (2, datetime(2026, 1, 1, 0, 2, 0), None),   # NULL key
         (3, None, 1)],                              # NULL timestamp
        "event_id long, t timestamp, k long",
    )
    right = spark.createDataFrame(
        # one bucket (60s): v=5 then a LATER NULL value — carry must be 5
        [(1, datetime(2026, 1, 1, 0, 0, 10), 5),
         (1, datetime(2026, 1, 1, 0, 0, 40), None)],
        "k long, t timestamp, v long",
    )
    kw = dict(on_left="t", on_right="t", by_left="k", by_right="k",
              value_cols=["v"], bucket_seconds=60)
    got = {r["event_id"]: r["v"]
           for r in asof_join_bucketed(left, right, **kw).collect()}
    assert got == {1: 5, 2: None, 3: None}

    # and full parity with the plain form on the same frame
    kw2 = dict(on_left="t", on_right="t", by_left="k", by_right="k",
               value_cols=["v"])
    p = {r["event_id"]: r["v"] for r in asof_join(left, right, **kw2).collect()}
    assert got == p
