"""Schema-translation unit tests — the §1.3 type fold (D9,
bigquery.go:252-364) including the Q1 scale fix. No Spark session."""

import pytest
from pyspark.sql import types as T

from leftshove_spark import schema as sch

# (udt_name, precision, scale, expected) — SURVEY.md §1.3 table
CASES = [
    ("text", None, None, T.StringType()),
    ("varchar", None, None, T.StringType()),
    ("char", None, None, T.StringType()),
    ("inet", None, None, T.StringType()),
    ("ltree", None, None, T.StringType()),
    ("name", None, None, T.StringType()),
    ("point", None, None, T.StringType()),
    ("regproc", None, None, T.StringType()),
    ("interval", None, None, T.StringType()),  # lossy, reference parity (bigquery.go:311-312)
    ("json", None, None, T.StringType()),
    ("jsonb", None, None, T.StringType()),  # Spark has no JSON type; from_json on demand
    ("int2", None, None, T.LongType()),
    ("int4", None, None, T.LongType()),
    ("int8", None, None, T.LongType()),
    ("oid", None, None, T.LongType()),
    ("xid", None, None, T.LongType()),
    ("float4", None, None, T.DoubleType()),
    ("float8", None, None, T.DoubleType()),
    ("bool", None, None, T.BooleanType()),
    ("bytea", None, None, T.BinaryType()),
    ("abstime", None, None, T.TimestampType()),
    ("date", None, None, T.DateType()),
    ("timestamp", None, None, T.TimestampType()),
    ("timestamptz", None, None, T.TimestampType()),
    ("numeric", 12, 3, T.DecimalType(12, 3)),  # Q1 FIX: scale lands in scale
    ("numeric", None, None, T.DecimalType(38, 18)),  # no catalog precision
    ("_text", None, None, T.ArrayType(T.StringType())),
    ("_int4", None, None, T.ArrayType(T.LongType())),
    ("intvector", None, None, T.ArrayType(T.LongType())),
    ("some_custom_enum", None, None, T.StringType()),  # catch-all (bigquery.go:347-348)
]


@pytest.mark.parametrize("udt,p,s,expected", CASES)
def test_pg_udt_to_spark(udt, p, s, expected):
    assert sch.pg_udt_to_spark(udt, p, s) == expected


def test_q1_scale_fix_regression():
    """The reference assigns numeric_scale to Precision (bigquery.go:290-291,
    326-327), losing scale entirely. Our numeric(10,2) must carry scale 2."""
    dt = sch.pg_udt_to_spark("numeric", 10, 2)
    assert isinstance(dt, T.DecimalType)
    assert dt.precision == 10 and dt.scale == 2


def test_translate_catalog_orders_by_ordinal_and_is_nullable():
    cols = [
        {"column_name": "b", "udt_name": "int8", "ordinal_position": 2},
        {"column_name": "a", "udt_name": "text", "ordinal_position": 1},
        {"column_name": "c", "udt_name": "numeric", "ordinal_position": 3,
         "numeric_precision": 6, "numeric_scale": 2},
    ]
    st = sch.translate_catalog(cols)
    assert [f.name for f in st.fields] == ["a", "b", "c"]
    assert all(f.nullable for f in st.fields)  # Q2: everything nullable
    assert st["c"].dataType == T.DecimalType(6, 2)


def test_sink_schema_appends_snapshot_tm():
    src = T.StructType([T.StructField("id", T.LongType(), True)])
    sk = sch.sink_schema(src)
    assert sk.fields[-1].name == sch.SNAPSHOT_COL
    assert sk.fields[-1].dataType == T.TimestampType()


def test_schema_json_roundtrip_and_diff():
    src = T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField("v", T.DecimalType(10, 2), True),
        ]
    )
    assert sch.schema_from_json(sch.schema_to_json(src)) == src
    other = T.StructType(
        [
            T.StructField("id", T.StringType(), True),
            T.StructField("w", T.LongType(), True),
        ]
    )
    d = sch.diff_schemas(src, other)
    assert d == {"added": ["w"], "removed": ["v"], "retyped": ["id"]}
    assert not sch.schemas_equal(src, other)
    assert sch.schemas_equal(src, sch.schema_from_json(sch.schema_to_json(src)))


def test_apply_schema_diff_add_column_end_to_end(spark, tmp_path):
    """D7 apply path: additive drift lands as a zero-row schema append —
    no data rewrite — and mergeSchema reads surface the union (old rows
    NULL in the new column). Destructive diffs raise."""
    path = str(tmp_path / "sink")
    v1 = T.StructType(
        [T.StructField("id", T.LongType(), True), T.StructField("a", T.StringType(), True)]
    )
    v2 = T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField("a", T.StringType(), True),
            T.StructField("b", T.DoubleType(), True),
        ]
    )
    spark.createDataFrame([(1, "x"), (2, "y")], v1).write.parquet(path)
    applied = sch.apply_schema_diff(spark, path, v2)
    assert applied == {"added": ["b"], "removed": [], "retyped": []}
    spark.createDataFrame([(3, "z", 1.5)], v2).write.mode("append").parquet(path)
    out = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(out.columns) == {"id", "a", "b"}
    rows = {r["id"]: r["b"] for r in out.collect()}
    assert rows == {1: None, 2: None, 3: 1.5}
    # second apply is a no-op
    assert sch.apply_schema_diff(spark, path, v2) == {
        "added": [], "removed": [], "retyped": []
    }
    import pytest as _pytest

    v3 = T.StructType([T.StructField("id", T.StringType(), True)])
    with _pytest.raises(ValueError):
        sch.apply_schema_diff(spark, path, v3)


# ---------------------------------------------------------------- property
from hypothesis import given, settings
from hypothesis import strategies as st

_ATOMS = [
    T.LongType(), T.IntegerType(), T.DoubleType(), T.StringType(),
    T.BooleanType(), T.TimestampType(), T.DateType(), T.BinaryType(),
]
_types = st.recursive(
    st.sampled_from(_ATOMS),
    lambda children: st.one_of(
        children.map(lambda t: T.ArrayType(t)),
        children.map(lambda t: T.MapType(T.StringType(), t)),
    ),
    max_leaves=4,
)
_names = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=12
)
_schemas = st.dictionaries(_names, _types, min_size=0, max_size=8).map(
    lambda d: T.StructType(
        [T.StructField(n, t, True) for n, t in sorted(d.items())]
    )
)


@settings(max_examples=200, deadline=None)
@given(a=_schemas, b=_schemas)
def test_schema_json_roundtrip_and_diff_laws(a, b):
    """For ANY pair of schemas (nested arrays/maps included): the JSON
    codec round-trips exactly; diff(a, a) is empty; diff is
    anti-symmetric in added/removed; equality ⇔ empty diff + same
    field order."""
    assert sch.schema_from_json(sch.schema_to_json(a)) == a
    d_self = sch.diff_schemas(a, a)
    assert d_self == {"added": [], "removed": [], "retyped": []}
    d_ab, d_ba = sch.diff_schemas(a, b), sch.diff_schemas(b, a)
    assert d_ab["added"] == d_ba["removed"]
    assert d_ab["removed"] == d_ba["added"]
    assert d_ab["retyped"] == d_ba["retyped"]
    if sch.schemas_equal(a, b):
        assert d_ab == {"added": [], "removed": [], "retyped": []}
