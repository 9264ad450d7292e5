"""Contract tests for the JDBC seam (S1's live-connector form).

No Postgres exists in this harness, so these tests pin the SEAM instead
of the wire: (1) the exact option set ``read_jdbc_window`` hands to
Spark's JDBC reader (query text, partitionColumn bounds, queryTimeout,
fetchsize — reference: postgres.go:29-41, 52-53), and (2) the literal
capture SELECT ``capture_query_sql`` generates (reference generated
query: postgres.go:43-115). A future live run only has to trust Spark's
JDBC datasource, which is not ours to test.

Pure-Python: the stub records builder calls; no SparkSession is built.
"""

from __future__ import annotations

import pytest

from leftshove_spark.snapshot import capture_query_sql
from leftshove_spark.sources import read_jdbc_window


class _StubReader:
    """Records format/option calls the way DataFrameReader chains them."""

    def __init__(self):
        self.fmt = None
        self.options: dict[str, str] = {}
        self.loaded = False

    def format(self, fmt):
        self.fmt = fmt
        return self

    def option(self, k, v):
        self.options[k] = v
        return self

    def load(self):
        self.loaded = True
        return self  # stands in for the DataFrame


class _StubSpark:
    def __init__(self):
        self.read = _StubReader()


URL = "jdbc:postgresql://db.example.com:5432/prod"


def test_windowed_scan_option_contract():
    spark = _StubSpark()
    q = "SELECT * FROM t WHERE nms > '2024-01-01' AND nms <= '2024-01-02'"
    out = read_jdbc_window(
        spark,
        URL,
        q,
        partition_column="id",
        lower="0",
        upper="100000",
        num_partitions=16,
        query_timeout_s=300,
        fetchsize=10000,
    )
    r = spark.read
    assert out is r and r.loaded
    assert r.fmt == "jdbc"
    assert r.options == {
        "url": URL,
        "query": q,
        "partitionColumn": "id",
        "lowerBound": "0",
        "upperBound": "100000",
        "numPartitions": "16",
        "queryTimeout": "300",
        "fetchsize": "10000",
    }


def test_unpartitioned_scan_sets_no_bound_options():
    spark = _StubSpark()
    read_jdbc_window(spark, URL, "SELECT 1", query_timeout_s=60)
    r = spark.read
    assert r.options == {"url": URL, "query": "SELECT 1", "queryTimeout": "60"}


def test_timeout_is_whole_seconds_string():
    """PG_TIMEOUT_MILLIS (postgres.go:34) is milliseconds; Spark's
    queryTimeout is seconds — the caller converts, the option must be a
    stringified int (Spark rejects floats)."""
    spark = _StubSpark()
    read_jdbc_window(spark, URL, "SELECT 1", query_timeout_s=120000 // 1000)
    assert spark.read.options["queryTimeout"] == "120"


def test_capture_query_sql_plain_columns():
    q = capture_query_sql(
        "public.orders",
        [("o_orderkey", "int8"), ("o_comment", "text"), ("nms", "timestamptz")],
        "nms",
        "2024-01-01 00:00:00",
        "2024-01-02 00:00:00",
    )
    assert q == (
        "SELECT o_orderkey, o_comment, nms, now() AS snapshot_tm "
        "FROM public.orders "
        "WHERE nms > '2024-01-01 00:00:00' AND nms <= '2024-01-02 00:00:00'"
    )


def test_capture_query_sql_array_and_vector_rewrite():
    # udt '_int4' (array) and 'halfvec'/'vector' columns stringify via
    # array_to_json — postgres.go:59-60
    q = capture_query_sql(
        "t",
        [("tags", "_int4"), ("emb", "vector"), ("id", "int8")],
        "nms",
        "a",
        "b",
    )
    assert "array_to_json(tags) AS tags" in q
    assert "array_to_json(emb) AS emb" in q
    assert q.index("tags") < q.index("emb") < q.index("id")  # ordinal order


def test_capture_query_sql_munge_to_null():
    q = capture_query_sql(
        "t",
        [("ts", "timestamp")],
        "nms",
        "a",
        "b",
        munge_to_null=True,
        min_ts="1970-01-01 00:00:00",
    )
    assert (
        "CASE WHEN ts < '1970-01-01 00:00:00' THEN NULL ELSE ts END AS ts" in q
    )


def test_capture_query_sql_munge_to_min():
    q = capture_query_sql(
        "t",
        [("ts", "timestamptz")],
        "nms",
        "a",
        "b",
        munge_to_min=True,
        min_ts="2000-01-01 00:00:00",
    )
    assert (
        "CASE WHEN ts < '2000-01-01 00:00:00' THEN "
        "to_timestamp('2000-01-01 00:00:00','YYYY-MM-DD HH24:MI:SS') "
        "ELSE ts END AS ts" in q
    )


def test_capture_query_sql_munge_skips_non_timestamps():
    q = capture_query_sql(
        "t", [("n", "int8")], "nms", "a", "b", munge_to_null=True
    )
    assert "CASE" not in q and "SELECT n, now() AS snapshot_tm" in q


@pytest.mark.parametrize("flag", ["munge_to_null", "munge_to_min"])
def test_capture_sql_matches_dataframe_form_semantics(flag):
    """The SQL text and build_capture declare the same per-column plan:
    every timestamp column gets exactly one CASE, every other column
    passes through, snapshot_tm closes the list."""
    cols = [("id", "int8"), ("ts", "timestamp"), ("nms", "timestamptz")]
    q = capture_query_sql("t", cols, "nms", "a", "b", **{flag: True})
    assert q.count("CASE WHEN") == 2  # ts and nms are both timestamps
    body = q.split("SELECT ", 1)[1].split(" FROM ", 1)[0]
    assert body.endswith("now() AS snapshot_tm")
