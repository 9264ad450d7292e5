"""Temporal joins — as-of join and bucketed range join.

Neither exists as a single built-in Spark operator (the reference engine
family — kdb/QuestDB-style as-of, Timescale range joins — ships them
natively), so both are expressed as compositions of DataFrame ops whose
physical plans stay scalable:

- **As-of join**: the classic union + running-``last(ignorenulls)``
  window. ONE shuffle on the join key, one in-partition sort — the same
  cost as a sort-merge join, with no range-condition fallback to
  broadcast-nested-loop (which is what a naive
  ``left.join(right, (k==k) & (rt <= lt))`` + window degenerates to).
- **Range join**: equi-join on overlapping time *buckets* + exact
  containment filter. The interval side explodes into its covered
  buckets (small multiplier: ceil(len/bucket)+1); the fact side never
  explodes and, with a broadcast interval side, never shuffles.

Both are exact operators, not approximations, and both have ANSI-SQL
twins (DuckDB ``ASOF JOIN`` / ``BETWEEN`` join) used as oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on_left: str,
    on_right: str,
    by_left: str,
    by_right: str,
    value_cols: list[str],
) -> DataFrame:
    """Backward as-of left join: for each left row, attach ``value_cols``
    from the LATEST right row with the same key and ``right.t <= left.t``
    (inclusive — DuckDB ``ASOF JOIN ... ON l.t >= r.t`` semantics); null
    when no such row exists.

    Right rows must be unique per (key, time) for a deterministic result
    — pre-aggregate the right side (as the registered query does).

    Plan: tag sides, union, one ``Window.partitionBy(key).orderBy(t,
    side)`` running ``last(ignorenulls)``, filter back to left rows. At
    equal timestamps the right row sorts first (side 0 < 1), giving the
    inclusive bound. Scale: one hash exchange on the key + one
    in-partition sort; no range join, no nested loop. Skewed keys are
    split by AQE like any other shuffle.
    """
    t_type = left.schema[on_left].dataType
    lrow = F.struct(*[F.col(c) for c in left.columns]).alias("__lrow")
    l_tagged = left.select(
        F.col(by_left).alias("__k"),
        F.col(on_left).cast(t_type).alias("__t"),
        F.lit(1).alias("__side"),
        lrow,
    )
    r_tagged = right.select(
        F.col(by_right).alias("__k"),
        F.col(on_right).cast(t_type).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = (
        Window.partitionBy("__k")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.select(
        "__side",
        "__lrow",
        *[F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"__f_{c}") for c in value_cols],
    )
    return filled.filter(F.col("__side") == 1).select(
        F.col("__lrow.*"),
        *[F.col(f"__f_{c}").alias(c) for c in value_cols],
    )


def range_join_bucketed(
    facts: DataFrame,
    ranges: DataFrame,
    *,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
    broadcast_ranges: bool = True,
) -> DataFrame:
    """Interval containment join: every fact row paired with every range
    whose half-open window ``[start, end)`` contains ``facts.ts_col``.

    Plan: the range side explodes into the time buckets it covers
    (``ceil(length/bucket)+1`` rows per range — pick ``bucket_seconds``
    near the typical range length so the multiplier stays ~2); facts map
    to exactly one bucket; equi-join on the bucket key, then the exact
    ``start <= ts < end`` filter. With ``broadcast_ranges`` (the common
    shape: few windows, many facts) the fact side NEVER shuffles — scan →
    broadcast hash join → filter, fully pipelined. A raw theta-join
    (``ts BETWEEN start AND end``) would plan as broadcast-nested-loop:
    O(facts × ranges) comparisons instead of O(facts).
    """
    b_us = F.lit(int(bucket_seconds) * 1_000_000)

    # unix_micros demands TIMESTAMP; a no-op cast keeps the operator
    # type-stable when a caller hands NTZ columns (Spark ≥4.1 inference)
    def _us(c: str):
        return F.unix_micros(F.col(c).cast("timestamp"))

    rb = ranges.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(_us(start_col) / b_us),
                # end is exclusive: the last covered instant is end−1µs
                F.floor((_us(end_col) - 1) / b_us),
            )
        ),
    )
    if broadcast_ranges:
        rb = F.broadcast(rb)
    fb = facts.withColumn("__bucket", F.floor(_us(ts_col) / b_us))
    return (
        fb.join(rb, "__bucket")
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("__bucket")
    )


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    *,
    on_left: str,
    on_right: str,
    by_left: str,
    by_right: str,
    value_cols: list[str],
    bucket_seconds: int,
) -> DataFrame:
    """:func:`asof_join` with the hot-key escape hatch engaged: the
    running-fill window partitions on **(key, time bucket)** instead of
    the key alone, so one dominant key spreads across
    ``time_range / bucket_seconds`` parallel partitions instead of
    serializing one sort. Identical results to :func:`asof_join` by
    construction (pytest-pinned) — choose it when skew diagnostics
    (operators.skew) show a key owning a partition-sized share of the
    stream.

    Plan:
    1. union both sides keyed by ``(k, b = floor(t / bucket))`` and run
       the same running ``last(ignorenulls)`` INSIDE each bucket — the
       big window, now skew-free;
    2. summarize the right side to its latest value per (k, b) — an
       O(active key-buckets) relation — and chain the carry across
       buckets with a per-key window **over that summary grid**, rows
       strictly before the current bucket (the only per-key sequential
       pass, on bucket-count rows, not data);
    3. left rows whose in-bucket fill is null coalesce to the carried
       value joined back on (k, b) — the join key equals the window's
       partitioning, so the big side does not re-shuffle.

    Trade-off: the carry grid is O(distinct (key, bucket)) rows; with
    millions of keys and fine buckets prefer the plain
    :func:`asof_join` (AQE handles mild skew) — this variant is for the
    few-hot-keys regime, and ``bucket_seconds`` should give tens to
    thousands of buckets over the data's time range."""
    t_type = left.schema[on_left].dataType
    b_us = F.lit(int(bucket_seconds) * 1_000_000)

    def _b(tcol):
        return F.floor(F.unix_micros(tcol.cast("timestamp")) / b_us)

    lrow = F.struct(*[F.col(c) for c in left.columns]).alias("__lrow")
    l_tagged = left.select(
        F.col(by_left).alias("__k"),
        F.col(on_left).cast(t_type).alias("__t"),
        F.lit(1).alias("__side"),
        lrow,
    )
    r_tagged = right.select(
        F.col(by_right).alias("__k"),
        F.col(on_right).cast(t_type).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True).withColumn(
        "__b", _b(F.col("__t"))
    )

    # 1. skew-free in-bucket running fill
    w_local = (
        Window.partitionBy("__k", "__b")
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = u.select(
        "__side",
        "__k",
        "__b",
        "__lrow",
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w_local).alias(f"__lf_{c}")
            for c in value_cols
        ],
    )

    # 2. per-(k, b) right summary + strictly-previous-bucket carry over
    #    the O(key-buckets) grid
    # per-column last NON-NULL value in the bucket (max_by keyed on a
    # null-masked timestamp: rows whose value is null are ignored, so a
    # trailing null row cannot erase an earlier value — mirroring the
    # per-column last(ignorenulls) semantics of the plain form)
    r_sum = r_tagged.withColumn("__b", _b(F.col("__t"))).groupBy("__k", "__b").agg(
        *[
            F.max_by(
                f"__v_{c}",
                F.when(F.col(f"__v_{c}").isNotNull(), F.col("__t")),
            ).alias(f"__s_{c}")
            for c in value_cols
        ]
    )
    # grid = left's (k, b) set ∪ right's summary buckets — derived from
    # a NARROW projection of each side, not from `u` (re-deriving the
    # union here would recompute the right side's upstream plan a
    # second time; the left contribution is a 2-column scan + map-side
    # distinct)
    r_sum_r = r_sum.select(
        F.col("__k").alias("__sk"),
        F.col("__b").alias("__sb"),
        *[F.col(f"__s_{c}") for c in value_cols],
    )
    grid = (
        l_tagged.select("__k", _b(F.col("__t")).alias("__b"))
        .unionByName(r_sum.select("__k", "__b"))
        .distinct()
        # null-safe: NULL-key grid cells still pick up NULL-key right
        # summaries, mirroring the plain form's NULL window partition
        .join(
            r_sum_r,
            F.col("__k").eqNullSafe(F.col("__sk"))
            & F.col("__b").eqNullSafe(F.col("__sb")),
            "left",
        )
        .drop("__sk", "__sb")
    )
    w_carry = (
        Window.partitionBy("__k")
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = grid.select(
        "__k",
        "__b",
        *[
            F.last(f"__s_{c}", ignorenulls=True).over(w_carry).alias(f"__c_{c}")
            for c in value_cols
        ],
    )

    # 3. coalesce in-bucket fill with the carried boundary value. The
    # join is NULL-SAFE on (k, b): a left row with a NULL key (or NULL
    # timestamp → NULL bucket) matches its own grid row instead of
    # silently dropping — the left-join row-preservation contract. The
    # grid contains every left (k, b) by construction, so the null-safe
    # equi-join is total over left rows.
    carry_r = carry.select(
        F.col("__k").alias("__ck"),
        F.col("__b").alias("__cb"),
        *[F.col(f"__c_{c}") for c in value_cols],
    )
    # Join strategy pinned (r16, guide §3.1): Spark's size estimate of
    # the filtered window output undershoots (struct payload) and it
    # BROADCASTS the big left side — driver-collecting the whole fact
    # stream, the one shape this operator exists to avoid at scale. The
    # SHUFFLE_HASH hint on the carry grid makes the O(key-buckets) side
    # the per-partition build relation; the big side's (k, b) hash
    # partitioning from the in-bucket window is reused, so it does not
    # re-exchange, and nothing is ever driver-collected.
    out = local.filter(F.col("__side") == 1).join(
        carry_r.hint("shuffle_hash"),
        F.col("__k").eqNullSafe(F.col("__ck"))
        & F.col("__b").eqNullSafe(F.col("__cb")),
    )
    return out.select(
        F.col("__lrow.*"),
        *[
            F.coalesce(F.col(f"__lf_{c}"), F.col(f"__c_{c}")).alias(c)
            for c in value_cols
        ],
    )
