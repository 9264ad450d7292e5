"""Deterministic mergeable sketches built on the 60-bit cross-engine hash.

The engine's sketch family differs from the usual HLL/theta toolbox in
one deliberate way: every sketch here is a DETERMINISTIC function of the
data (ext.hashing's md5-based hash60, no RNG, no engine-specific
hashing), so sketch contents AND estimates are bit-identical in any
engine that can compute md5 — the driver's DuckDB oracle certifies the
ESTIMATES by value hash, not just "close enough". The price is a fixed
hash family (an adversary who knows it can craft collisions; irrelevant
for corpus accounting, the target workload).

KMV (k-minimum-values) distinct counting [Bar-Yossef et al. 2002]:
keep the k smallest distinct hash values of a column; with U = 2^60 the
estimate is ``(k-1) * U / kth_min`` (the k-th smallest of n uniform
draws sits near k/n · U). Standard error ≈ 1/√(k−2).

Why KMV and not HLL here: identical accuracy class for the same few KB,
but the sketch is a sorted integer array — trivially mergeable with
array built-ins (union = k smallest of the concatenation), exactly
representable in parquet, and oracle-checkable. Each sketch row is
O(k) longs; sketches for billions of rows per group move O(groups·k)
data — the same partial-agg envelope as any count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .hashing import hash60

U60 = float(1 << 60)


def _bucket_prune(
    df: DataFrame, order_cols: list[str], k: int
) -> DataFrame:
    """Pre-prune the UNGROUPED top-k: the global k-smallest stage is a
    ``Window.partitionBy(lit(1))`` — a single-partition sort, which over
    the raw input would contradict the module's O(groups·k) envelope
    (and the repo's no-single-partition discipline) the moment there is
    no group key. Bucket by the hash's low bits (deterministic — NOT
    spark_partition_id), keep k per bucket via a WindowGroupLimit-pruned
    rank, and the single-partition stage then sees only buckets·k rows
    regardless of input size. Output-invariant: the global k smallest
    survive any bucketing that keeps k per bucket."""
    width = max(df.sparkSession.sparkContext.defaultParallelism, 16)
    b = F.pmod(F.col(order_cols[0]), F.lit(width))
    w = Window.partitionBy(b).orderBy(*order_cols)
    return (
        df.withColumn("__bk_rn", F.row_number().over(w))
        .filter(F.col("__bk_rn") <= k)
        .drop("__bk_rn")
    )


def kmv_sketch(
    df: DataFrame,
    value_col: str | Column,
    group_cols: list[str] | None = None,
    k: int = 256,
) -> DataFrame:
    """Per-group KMV sketch: ``sketch`` = the k smallest DISTINCT
    hash60 values (ascending array), plus ``n_seen`` = |sketch|.

    Plan: groupBy(group, hash) collapses duplicates with map-side
    combine (the only corpus-sized shuffle, same as exact
    countDistinct); a per-group window keeps rank ≤ k (WindowGroupLimit
    prunes inside the sort); collect_list over ≤ k rows per group. At
    100 TB the build costs what one countDistinct costs — the sketch's
    value is afterwards: stored per source/day, merged without
    rescanning (:func:`kmv_merge`), estimated anywhere
    (:func:`kmv_estimate`)."""
    gcols = list(group_cols or [])
    c = F.col(value_col) if isinstance(value_col, str) else value_col
    distinct = df.groupBy(*gcols, hash60(c).alias("__h")).agg(F.lit(1).alias("__one"))
    if not gcols:
        distinct = _bucket_prune(distinct, ["__h"], k)
    w = Window.partitionBy(*[F.col(g) for g in gcols] or [F.lit(1)]).orderBy("__h")
    topk = distinct.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    return topk.groupBy(*gcols).agg(
        F.sort_array(F.collect_list("__h")).alias("sketch"),
        F.count(F.lit(1)).cast("long").alias("n_seen"),
    )


def kmv_merge(sketch_a: Column, sketch_b: Column, k: int = 256) -> Column:
    """Union of two sketches = the k smallest of the merged distinct
    hash sets — pure array built-ins, no shuffle, associative and
    commutative (pytest pins merge(sketch(A), sketch(B)) ≡
    sketch(A ∪ B))."""
    return F.slice(
        F.array_sort(F.array_distinct(F.concat(sketch_a, sketch_b))), 1, k
    )


def kmv_estimate(sketch: Column, k: int = 256) -> Column:
    """Distinct-count estimate from a sketch: exact |sketch| while the
    sketch is unsaturated (fewer than k distinct values exist — the
    sketch IS the distinct hash set), else ``(k-1)·2^60 / kth_min``.
    Pure double arithmetic on integer inputs — bit-identical in any
    IEEE engine, which is what lets the driver hash-check an
    *estimate*."""
    kth = F.element_at(sketch, k).cast("double")
    return F.when(
        F.size(sketch) < k, F.size(sketch).cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(U60) / kth)


def kmv_jaccard(sketch_a: Column, sketch_b: Column, k: int = 256) -> Column:
    """Jaccard resemblance of two SETS from their KMV sketches alone
    [Beyer et al. 2007]: take the k smallest of the union of the two
    sketches (a KMV sketch of A ∪ B), count how many of those lie in
    BOTH sketches (a uniform sample of A ∪ B scored for membership in
    A ∩ B), divide. Deterministic like everything in this module, so
    the ESTIMATE is oracle-checkable; exact whenever both sketches are
    unsaturated (they then ARE the distinct hash sets). Pure array
    built-ins — pairwise group similarity matrices come from the
    O(groups·k) sketch table with no second corpus scan."""
    u = F.slice(
        F.array_sort(F.array_distinct(F.concat(sketch_a, sketch_b))), 1, k
    )
    inter = F.size(F.array_intersect(F.array_intersect(u, sketch_a), sketch_b))
    return inter.cast("double") / F.size(u)


# ------------------------------------------------------- bottom-k quantiles
def bottomk_sample_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    k: int = 256,
    id_col: str = "doc_id",
    salt: str = "qs:",
) -> DataFrame:
    """Per-group bottom-k quantile sketch: the ``value_col`` of the k
    rows with the smallest salted hash60(id) — a deterministic uniform
    row sample held as ``sketch`` = array<struct{h, v}> sorted by h,
    plus ``n_rows`` = the exact group size (it falls out of the same
    aggregation; estimation needs only the sample, the count rides
    along for accounting).

    Unlike KMV (distinct-value hashing) the sample is over ROWS — the
    hash is of the row id, so duplicate values keep their multiplicity
    and the sample estimates the value DISTRIBUTION (quantiles, means),
    not set cardinality. Deterministic like everything here: the sketch
    and every estimate from it are bit-identical cross-engine, so the
    driver hash-certifies the estimates.

    Mergeable (the point at 100 TB): sketches per source/day/shard
    combine with :func:`bottomk_merge` — k smallest of the union is
    exactly the bottom-k sample of the combined rows, so quantiles of
    any group combination come from the O(groups·k) sketch table with
    no second corpus scan.

    Build plan: the sample branch is one group-key shuffle whose
    per-group sort is WindowGroupLimit-PRUNED to k rows (the filter on
    the rank sits directly over the window, so the rewrite fires —
    plan-pinned by pytest; a full-group sort would be O(n log n) per
    group instead of O(n log k)); ``n_rows`` comes from a separate
    count branch whose shuffle moves only O(groups) partial rows (its
    scan projects just the group columns). Ranks tiebreak on the
    NATIVE-typed id after the hash, so a 60-bit hash collision at the
    k boundary cannot make the sketch nondeterministic — and the
    (h, i) prefix of the stored struct is a total order, which is what
    keeps :func:`bottomk_merge`'s k-smallest-of-concat exactly
    consistent with building over the unioned rows."""
    gcols = list(group_cols or [])
    h = hash60(F.concat(F.lit(salt), F.col(id_col).cast("string")))
    base = df.select(
        *gcols,
        h.alias("__h"),
        F.col(id_col).alias("__i"),
        F.col(value_col).cast("long").alias("__v"),
    )
    if not gcols:
        base = _bucket_prune(base, ["__h", "__i"], k)
    w = Window.partitionBy(*[F.col(g) for g in gcols] or [F.lit(1)]).orderBy(
        "__h", "__i"
    )
    topk = base.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    sk = topk.groupBy(*gcols).agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("__h").alias("h"),
                    F.col("__i").alias("i"),
                    F.col("__v").alias("v"),
                )
            )
        ).alias("sketch")
    )
    counts = df.groupBy(*gcols).agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    if gcols:
        return sk.join(counts, gcols)
    return sk.crossJoin(counts)


def bottomk_merge(sketch_a: Column, sketch_b: Column, k: int = 256) -> Column:
    """k smallest-by-hash of two merged row samples — pure array
    built-ins (struct arrays sort lexicographically, h first), no
    shuffle; associative/commutative, pytest-pinned ≡ sketching the
    unioned rows."""
    return F.slice(F.array_sort(F.concat(sketch_a, sketch_b)), 1, k)


def bottomk_quantile(
    sketch: Column, q_num: int, q_den: int
) -> Column:
    """Quantile estimate from a bottom-k sample: the value at 1-based
    position ``ceil(q·n)`` of the value-sorted sample (percentile_disc
    semantics). Positions use exact rational arithmetic —
    ``(q_num·n + q_den - 1) div q_den`` — zero floating point, so the
    estimate is bit-identical in any engine."""
    vals = F.array_sort(F.transform(sketch, lambda x: x["v"]))
    num = F.lit(q_num) * F.size(vals).cast("long") + F.lit(q_den - 1)
    pos = F.greatest(F.lit(1), ((num - num % F.lit(q_den)) / F.lit(q_den))).cast(
        "int"
    )
    return F.element_at(vals, pos)
