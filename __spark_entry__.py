"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (current-state dedup view, the
reference's headline queryable artifact, bigquery.go:187-207) at sf0.001.
``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2, compared against DuckDB at sf0.01 by the driver.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from leftshove_spark import queries as Q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: latest state per user over events (J3 dedup view)."""
    _ensure_nanos_conf(spark)
    return Q.QUERIES["j3_dedup_latest_window"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Gate dict in GATE_ORDER: the driver scores from the front (~50
    per round), so first-time entries lead and long-green veterans sit
    in the tail (which tests/test_gate_tail_oracle.py oracle-checks
    every round regardless). The full registry is Q.QUERIES."""
    return Q.gate_queries()


def oracle_sql() -> dict[str, str]:
    return {n: Q.oracle(n) for n in Q.gate_queries() if n in Q.ORACLES}


def _ensure_nanos_conf(spark: SparkSession) -> None:
    """The driver may hand us a session built without the engine confs;
    set them if possible (both are runtime-settable in 4.x). NTZ
    inference must be OFF: Spark ≥4.1 otherwise reads the tz-naive test
    parquet as TIMESTAMP_NTZ, which watermarks/unix_micros reject. The
    session timezone is pinned UTC as well — the NTZ→TIMESTAMP read is
    value-identical only under UTC, so a driver session in another zone
    would silently shift wall-clock values against the oracle.

    Non-ANSI arithmetic joins the contract: result-identical for this
    NULL-safe corpus (try_divide / decimal up-casts everywhere a checked
    op could fire), ~17% cheaper on scan+agg shapes than Spark 4's
    checked default (see session.py)."""
    for k, v in (
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
        ("spark.sql.parquet.inferTimestampNTZ.enabled", "false"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.ansi.enabled", "false"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass
