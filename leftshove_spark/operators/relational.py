"""Relational operator surface (SURVEY.md §2.2–2.7).

The reference's relational semantics live in the SQL it generates and
pushes to Postgres/BigQuery (SURVEY.md §2 intro). Here each one is a
DataFrame builder; Catalyst owns the physical strategy (broadcast vs
sort-merge joins, hash aggregation, pushdown — §4 shows the reference has
no optimizer of its own to replicate).

Scale notes per operator are on the functions. The global rule: dimension
tables (region/nation/customer at TPC-H shape) are broadcast — an
explicit ``F.broadcast`` hint where we *know* the side is dimension-sized,
because at 100 TB the fact side must never shuffle for a dim join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def left_equi_join(
    left: DataFrame, right: DataFrame, on: str | list[str], *, broadcast_right: bool = False
) -> DataFrame:
    """J1 — left equi-join (postgres.go:124-128: key_column_usage LEFT JOIN
    table_constraints ON constraint_name). ``broadcast_right=True`` when
    the right side is dimension-sized: the fact side then streams through
    map-side hash probes with zero shuffle."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how="left")


def inner_equi_join(
    left: DataFrame, right: DataFrame, on: str | list[str], *, broadcast_right: bool = False
) -> DataFrame:
    """J2 — inner equi-join (postgres.go:168-173)."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=on, how="inner")


def anti_membership(df: DataFrame, col: str, excluded: list[str]) -> DataFrame:
    """F8 — unlogged-table exclusion analog (postgres.go:227-237): drop rows
    whose ``col`` is in a driver-side list. Small list ⇒ an IN-filter
    evaluated in codegen (no join at all); for a large exclusion set use
    a broadcast left-anti join instead."""
    return df.filter(~F.col(col).isin(excluded))


def min_watermark(df: DataFrame, nms_col: str) -> DataFrame:
    """A1 — ``SELECT MIN(nms)`` seed watermark (postgres.go:193). On parquet
    this is answered from footer statistics when aggregate pushdown is on
    — no row scan."""
    return df.agg(F.min(nms_col).alias("min_nms"))


def max_per_key(df: DataFrame, key_cols: list[str] | str, order_col: str) -> DataFrame:
    """A2 — ``SELECT key, MAX(col) GROUP BY key`` (bigquery.go:190). One
    shuffle on key with map-side partial aggregation."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    return df.groupBy(*keys).agg(F.max(order_col).alias(f"max_{order_col}"))


def row_count(df: DataFrame) -> DataFrame:
    """A5 — row count. The reference uses a catalog *estimate*
    (postgres.go:144-149) to avoid a full scan; Spark's parquet count is
    metadata-only, so exact is as cheap as the estimate was."""
    return df.agg(F.count(F.lit(1)).alias("n"))


def agg_string_list(
    df: DataFrame, group_cols: list[str], item_col: str, sep: str = ", "
) -> DataFrame:
    """A3 — ARRAY_TO_STRING(ARRAY_AGG(...)) GROUP BY (postgres.go:47-49, 68).
    collect_list order is nondeterministic under parallel merge, so the
    list is sorted before joining — deterministic output at any
    parallelism (the reference gets determinism from ORDER BY inside the
    aggregate, postgres.go:66)."""
    return df.groupBy(*group_cols).agg(
        F.concat_ws(sep, F.sort_array(F.collect_list(F.col(item_col).cast("string")))).alias(
            "agg_list"
        )
    )


def agg_json_list(df: DataFrame, group_cols: list[str], item_col: str) -> DataFrame:
    """A4 — array_agg into a JSON document per group (postgres.go:166-178:
    ``array_agg(row_to_json(...))``). Sorted for determinism."""
    return df.groupBy(*group_cols).agg(
        F.to_json(F.sort_array(F.collect_list(item_col))).alias("agg_json")
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Single-pass column profile — per column: null count, exact
    distinct count, min, max, plus the table row count — the data-quality
    summary a pipeline runs before trusting a new snapshot (the
    reference's users eyeball exactly these via ad-hoc SQL on the
    captured tables; here it is one operator).

    One wide row, every stat natively typed (no stringified mins — the
    min of a timestamp column stays a timestamp), so results hash
    exactly cross-engine.

    Scale shape: ONE scan. Multiple exact ``countDistinct`` columns
    compile to a single Expand-based aggregate — the input is replicated
    (k+1)× map-side (k = profiled columns), then partially aggregated
    before the one shuffle, so network cost is O(groups), not O(rows).
    At extreme k or cardinality, swap ``countDistinct`` for
    ``approx_count_distinct`` (the engine's approx battery pins that
    path against this exact form)."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls"),
            F.countDistinct(F.col(c)).alias(f"{c}_ndv"),
            F.min(c).alias(f"{c}_min"),
            F.max(c).alias(f"{c}_max"),
        ]
    return df.agg(*aggs)


def referential_orphans(
    child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """Rows of ``child`` whose ``child_key`` has no match in
    ``parent.parent_key`` — the referential-integrity probe run before
    trusting a captured snapshot pair (CDC capture windows can land
    child rows before their parents; the count should be transient
    zero). One LEFT ANTI hash join on the key — at scale the parent
    side broadcasts when small, else both sides shuffle once on the
    key; no fact re-scan, no subquery."""
    return child.join(
        parent.select(F.col(parent_key).alias(child_key)).distinct(),
        child_key,
        "left_anti",
    )


def duplicate_keys(df: DataFrame, key_cols: list[str] | str) -> DataFrame:
    """(key, n_copies) for keys violating uniqueness — the primary-key
    check of the data-quality battery. One hash-groupBy with map-side
    partials; output is O(violations)."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    return (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
    )
