"""Capture-query builder — F1–F6, the heart of the engine.

The reference *generates SQL* for each capture cycle (postgres.go:43-115):
a SELECT that (F2) enumerates every column in ordinal order, (F3) rewrites
array columns to JSON, (F4/F5) munges out-of-range timestamps, (F6)
appends ``now() AS snapshot_tm``, and (F1) filters to the half-open window
``WHERE nms > lo AND nms <= hi``. Here the same plan is *declared* on a
DataFrame and Catalyst does what Postgres did: the window predicate pushes
down to the scan (parquet row-group min/max skipping or JDBC WHERE), the
rewrites run inside whole-stage codegen, and only matching rows move.

Scale notes: every transform below is a narrow op — a capture cycle is
scan→filter→project→append with ZERO shuffles. The window predicate on a
timestamp column prunes parquet row groups (and partitions, if the source
is dt-partitioned), so cost is proportional to the window, not the table.
That is exactly the property that makes the reference's model work on big
tables, preserved under Spark.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .schema import SNAPSHOT_COL


def window_predicate(nms_col: str, lo: datetime | str, hi: datetime | str) -> Column:
    """F1 — half-open interval ``nms > lo AND nms <= hi``
    (postgres.go:52-53, substitution postgres.go:103). Monotone nms ⇒ each
    row is captured by exactly one window (W7 tumbling property)."""
    return (F.col(nms_col) > F.lit(lo)) & (F.col(nms_col) <= F.lit(hi))


def munge_timestamp_to_null(
    c: str, min_ts: str, dtype: T.DataType | None = None
) -> Column:
    """F4 — ``CASE WHEN c < min THEN NULL ELSE c END`` (postgres.go:72-92).

    ``dtype`` is the column's actual timestamp type; the clamp literal is
    cast to IT so the comparison stays type-stable whether the source
    arrived as TIMESTAMP or TIMESTAMP_NTZ (Spark ≥4.1 infers tz-naive
    parquet as NTZ; a mismatched literal silently stops matching)."""
    lo = F.lit(min_ts).cast(dtype or T.TimestampType())
    return F.when(F.col(c) < lo, F.lit(None)).otherwise(F.col(c))


def munge_timestamp_to_min(
    c: str, min_ts: str, dtype: T.DataType | None = None
) -> Column:
    """F5 — clamp to min: ``CASE WHEN c < min THEN to_timestamp(min) ELSE c
    END`` (postgres.go:80-100). Same type-stability contract as F4."""
    lo = F.lit(min_ts).cast(dtype or T.TimestampType())
    return F.when(F.col(c) < lo, lo).otherwise(F.col(c))


def rewrite_column(
    field: T.StructField,
    *,
    munge_to_null: bool = False,
    munge_to_min: bool = False,
    min_ts: str = "1970-01-01 00:00:00",
    stringify_arrays: bool = False,
) -> Column:
    """F2's per-column rewrite dispatch (postgres.go:45-68):

    - array columns → `to_json` ONLY when the sink needs the reference's
      NDJSON-compatible stringified form (F3, postgres.go:59-60); the
      engine default keeps arrays native (SURVEY.md §1.3).
    - timestamp columns → F4/F5 munging when enabled (postgres.go:72-101).
    - everything else passes through.
    """
    c = field.name
    if isinstance(field.dataType, T.ArrayType) and stringify_arrays:
        return F.to_json(F.col(c)).alias(c)
    if isinstance(field.dataType, (T.TimestampType, T.TimestampNTZType)):
        if munge_to_null:
            return munge_timestamp_to_null(c, min_ts, field.dataType).alias(c)
        if munge_to_min:
            return munge_timestamp_to_min(c, min_ts, field.dataType).alias(c)
    return F.col(c)


def capture_query_sql(
    table: str,
    columns: list[tuple[str, str]],
    nms_col: str,
    lo: str,
    hi: str,
    *,
    munge_to_null: bool = False,
    munge_to_min: bool = False,
    min_ts: str = "1970-01-01 00:00:00",
) -> str:
    """The literal capture SELECT pushed to a JDBC source — the SQL-text
    twin of :func:`build_capture`, mirroring the reference's generated
    query (postgres.go:43-115): columns in ordinal order, array/vector
    columns rewritten ``array_to_json(c) AS c`` (postgres.go:59-60),
    timestamp columns optionally munged via CASE (postgres.go:72-101),
    ``now() AS snapshot_tm`` appended (postgres.go:50), and the half-open
    window ``WHERE nms > lo AND nms <= hi`` (postgres.go:52-53).

    ``columns`` is ``[(name, udt_name), ...]`` in ordinal order, udt names
    as the source catalog reports them (``_``-prefixed = array, per the
    reference's ``udt_name LIKE '\\_%'`` test). Feed the result to
    :func:`leftshove_spark.sources.read_jdbc_window` — Spark wraps it as a
    subquery so the window predicate executes source-side, same as the
    reference. Used for parity pinning in tests/test_jdbc_contract.py."""
    exprs = []
    for name, udt in columns:
        if udt.startswith("_") or udt.endswith("vector"):
            exprs.append(f"array_to_json({name}) AS {name}")
        elif udt in ("timestamp", "timestamptz") and (munge_to_null or munge_to_min):
            if munge_to_null:
                exprs.append(
                    f"CASE WHEN {name} < '{min_ts}' THEN NULL "
                    f"ELSE {name} END AS {name}"
                )
            else:
                exprs.append(
                    f"CASE WHEN {name} < '{min_ts}' THEN "
                    f"to_timestamp('{min_ts}','YYYY-MM-DD HH24:MI:SS') "
                    f"ELSE {name} END AS {name}"
                )
        else:
            exprs.append(name)
    cols = ", ".join([*exprs, f"now() AS {SNAPSHOT_COL}"])
    return (
        f"SELECT {cols} FROM {table} "
        f"WHERE {nms_col} > '{lo}' AND {nms_col} <= '{hi}'"
    )


def build_capture(
    src: DataFrame,
    nms_col: str,
    lo: datetime,
    hi: datetime,
    *,
    munge_to_null: bool = False,
    munge_to_min: bool = False,
    min_ts: str = "1970-01-01 00:00:00",
    stringify_arrays: bool = False,
    snapshot_at: datetime | None = None,
) -> DataFrame:
    """Compose F1+F2–F5+F6 into one capture DataFrame — the analog of the
    generated snapshot SELECT (postgres.go:43-115).

    ``snapshot_at`` fixes the F6 stamp for deterministic tests; production
    leaves it None → ``current_timestamp()`` (postgres.go:50 ``now()``).
    """
    cols = [
        rewrite_column(
            f,
            munge_to_null=munge_to_null,
            munge_to_min=munge_to_min,
            min_ts=min_ts,
            stringify_arrays=stringify_arrays,
        )
        for f in src.schema.fields
    ]
    stamp = F.lit(snapshot_at) if snapshot_at is not None else F.current_timestamp()
    return (
        src.filter(window_predicate(nms_col, lo, hi))
        .select(*cols)
        .withColumn(SNAPSHOT_COL, stamp.cast("timestamp"))
    )
