"""Skew mitigation — salted joins and salted two-phase aggregation.

At 100 TB the failure mode of every shuffle op is the HOT KEY: one
user_id / orderkey with 100M rows lands on one reducer while 999
executors idle. Two mitigation layers, in preference order:

1. **AQE skew-join** (``spark.sql.adaptive.skewJoin.enabled``, on in
   ``session.get_spark``): splits oversized join partitions at runtime.
   Free, but only covers sort-merge JOINS — a skewed *aggregation* or a
   join shape AQE won't rewrite still hot-spots.
2. **Explicit salting** (this module): spread each hot key over
   ``n_salts`` synthetic sub-keys. Joins replicate the small side per
   salt (×n_salts rows — bounded, it's the small side); aggregations run
   two phases (partial per salt, final merge). Deterministic — no
   ``rand()``: the salt is a hash of row content, so retried tasks
   produce identical output (a rand() salt breaks Spark's task-retry
   idempotency and can double-count on speculative execution).

Both transformations are semantically TRANSPARENT: results equal the
unsalted op exactly (oracle-checked via the plain-SQL twin in the gate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def _content_salt(df: DataFrame, n_salts: int) -> Column:
    """Deterministic per-row salt in [0, n_salts): hash of the full row.
    Identical duplicate rows share a salt — harmless for correctness,
    and real hot keys (many DISTINCT rows per key) spread evenly."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    *,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has skewed join keys: ``big`` rows get a
    content-hash salt, ``small`` is replicated once per salt value, and
    the join runs on (key, salt) — each hot key now spreads over
    ``n_salts`` reducers. Cost: small side ×n_salts (it's the
    broadcast-or-small side by contract). Result is exactly the plain
    join; the salt column never escapes."""
    if how not in {"inner", "left", "left_outer", "left_semi", "left_anti"}:
        # right/full-outer would emit every UNMATCHED small-side row once
        # per salt replica — no longer "exactly the plain join". Those
        # shapes need a post-join dedup; flip the sides instead.
        raise ValueError(f"salted_join supports inner/left joins only, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    b = big.withColumn(SALT, _content_salt(big, n_salts))
    s = small.withColumn(
        SALT, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return b.join(s, on=[*keys, SALT], how=how).drop(SALT)


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    *,
    n_salts: int = 8,
    counts: list[str] | None = None,
    sums: dict[str, str] | None = None,
) -> DataFrame:
    """Two-phase salted aggregation for skewed group keys: phase 1
    aggregates per (key, salt) — the hot key's rows split over
    ``n_salts`` reducers — phase 2 merges the ≤n_salts partials per key.
    Supports the decomposable aggregates (count → sum of counts, sum →
    sum of sums); ``counts`` names output count columns, ``sums`` maps
    input column → output alias.

    Note Spark's hash aggregation already does map-side partials, which
    absorbs MOST group-by skew; explicit salting matters when the
    per-key *merge* state itself is heavy (collect_list, count distinct
    expansion) or partial aggregation is defeated (high group
    cardinality per partition)."""
    counts = counts or []
    sums = sums or {}
    salted = df.withColumn(SALT, _content_salt(df, n_salts))
    phase1 = salted.groupBy(*group_cols, SALT).agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(c).alias(f"__s_{c}") for c in sums],
    )
    return phase1.groupBy(*group_cols).agg(
        *[F.sum("__n").cast("long").alias(a) for a in counts],
        *[F.sum(f"__s_{c}").alias(a) for c, a in sums.items()],
    )


def skew_diagnostics(df, key_cols):
    """Key-distribution diagnostics — the measurement that decides WHEN
    the salting operators in this module are worth their extra merge
    level (and what AQE's skew-join threshold will see): per-key row
    counts reduced to one row of max / mean / p99 / distinct-key
    stats plus ``skew_factor`` = max/mean (a balanced key space is
    ~1; hundreds means one task owns the join).

    Two-level shape: count per key (one shuffle with map-side
    partials), then a single-row aggregate over the O(distinct keys)
    count relation — the corpus is touched once. Exactness: counts are
    integers, mean is one division, p99 is the (n-1)·p interpolated
    percentile (quantile_cont-identical, o7-pinned)."""
    from pyspark.sql import functions as F

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    return counts.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_per_key"),
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("mean_per_key"),
        F.expr("percentile(n, 0.99)").alias("p99_per_key"),
        (
            F.max("n").cast("double")
            / (F.sum("n").cast("double") / F.count(F.lit(1)))
        ).alias("skew_factor"),
    )
