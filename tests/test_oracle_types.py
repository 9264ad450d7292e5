"""Type-level lint for every ORACLES entry: the driver fetches DuckDB
results through Arrow/pandas, where HUGEINT (DuckDB's default type for
``sum(INTEGER)``) and wide DECIMALs coerce to float64/decimal128 — so a
Spark BIGINT ``7243`` hash-compares against an oracle ``7243.0`` and the
row goes red even though both answers are correct.  The local nets
(test_gate_tail_oracle.py, scripts/check_oracle.py) fetch via Python
``fetchall()``, where HUGEINT arrives as a plain int, so they
structurally CANNOT see this divergence: r6's only red row
(q12_shipmode_priority) shipped exactly this way.

This lint closes the class permanently: DESCRIBE binds each oracle
query (no execution) and asserts no output column is typed HUGEINT /
UHUGEINT / DECIMAL.  Fix for a flagged column is a top-level
``CAST(... AS BIGINT)`` (counts) or ``CAST(... AS DOUBLE)`` (money),
matching what Spark's analyzer produces for the same aggregate.
"""

import duckdb
import pytest

import __spark_entry__ as entrymod

from conftest import SF0001

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# DuckDB types whose Arrow/pandas representation diverges from the
# Python-native fetchall() representation the local nets use.
# DATE: pandas widens to datetime64 → "1995-01-02 00:00:00" while Spark
# collects datetime.date → "1995-01-02"; emit dates CAST AS TIMESTAMP
# (both engines then stringify identically) or as VARCHAR.
_DRIFTING = ("HUGEINT", "UHUGEINT", "DATE")


def _flagged_types(con, sql):
    out = []
    for col, typ, *_ in con.execute("DESCRIBE " + sql).fetchall():
        if typ in _DRIFTING or typ.startswith("DECIMAL"):
            out.append((col, typ))
    return out


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF0001}/{t}.parquet')"
        )
    return con


def test_lint_catches_uncast_integer_sum(ddb):
    """Self-check: the exact q12 bug shape must trip the lint."""
    flagged = _flagged_types(
        ddb,
        "SELECT sum(CASE WHEN r_regionkey > 1 THEN 1 ELSE 0 END) AS n FROM region",
    )
    assert flagged == [("n", "HUGEINT")]


def test_lint_passes_cast_integer_sum(ddb):
    flagged = _flagged_types(
        ddb,
        "SELECT CAST(sum(CASE WHEN r_regionkey > 1 THEN 1 ELSE 0 END) AS BIGINT)"
        " AS n FROM region",
    )
    assert flagged == []


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql()))
def test_oracle_output_types_survive_pandas_fetch(ddb, name):
    flagged = _flagged_types(ddb, entrymod.oracle_sql()[name])
    assert not flagged, (
        f"{name}: columns {flagged} are typed HUGEINT/DECIMAL in DuckDB; "
        "the driver's pandas fetch coerces them to float64/decimal128 and "
        "the value hash diverges from Spark. Wrap the aggregate in "
        "CAST(... AS BIGINT) or CAST(... AS DOUBLE)."
    )


def test_lint_catches_bare_date_output(ddb):
    """DATE widens to datetime64 under pandas — must trip the lint."""
    flagged = _flagged_types(ddb, "SELECT DATE '1995-01-02' AS d")
    assert flagged == [("d", "DATE")]


# ---------------------------------------------------------------------------
# Spark-side twin of the oracle lint (r7's blind spot): the driver
# canonicalizes BOTH frames with a pandas sort over all columns, which
# raises TypeError on unhashable cells — list (ArrayType), bytearray
# (BinaryType), dict (MapType), Row (StructType). r7's only two reds
# (x_multimodal_decode / x_multimodal_frames) were exactly this: correct
# values, unsortable output typing. This lint makes the class
# structurally impossible: every gated query's SPARK output schema must
# contain only atomic, pandas-sortable types.
# ---------------------------------------------------------------------------


def _unsortable_fields(schema):
    from pyspark.sql import types as T

    # Array/Map/Struct/Binary: pandas sort_values raises (r7's reds).
    # Date: a pandas-path fetch widens to datetime64 midnight while a
    # Python-native fetch keeps datetime.date — the same fetch-path
    # drift class as DuckDB DATE (linted above); emit TIMESTAMP or a
    # formatted string instead.
    bad = (T.ArrayType, T.MapType, T.StructType, T.BinaryType, T.DateType)
    return [(f.name, f.dataType.simpleString()) for f in schema.fields
            if isinstance(f.dataType, bad)]


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_gate_spark_output_schema_is_driver_sortable(spark, gate_build, name):
    # session-cached build (conftest.gate_build, r17): this sweep only
    # reads .schema — it shares the one build the oracle/lint sweeps use
    sdf = gate_build(name)
    flagged = _unsortable_fields(sdf.schema)
    assert not flagged, (
        f"{name}: Spark output columns {flagged} are ARRAY/MAP/STRUCT/"
        "BINARY; the driver's pandas canonicalizer cannot sort those "
        "cells (TypeError: unhashable type) and the row goes red before "
        "any value compare. Project to_json(...) / hex(...) scalars in "
        "the gate query (the operator itself can keep the rich type)."
    )


def test_spark_lint_catches_array_output(spark):
    """Self-check: the exact r7 bug shape must trip the Spark-side lint."""
    df = spark.range(1).selectExpr("array(1.0f, 2.0f) AS features",
                                   "cast('ab' as binary) AS frame",
                                   "date'1995-01-02' AS d")
    flagged = _unsortable_fields(df.schema)
    assert [c for c, _ in flagged] == ["features", "frame", "d"]
