"""The approximate aggregation scale paths, pinned against their exact
oracles: at 100 TB, exact COUNT(DISTINCT) pays an Expand shuffle per
distinct column and exact percentile() buffers whole groups — the scale
forms are approx_count_distinct (HyperLogLog++) and percentile_approx
(t-digest-style quantile sketch), both MERGEABLE partial aggregations
(map-side partials, O(sketch) shuffle bytes per partition regardless of
cardinality). These tests pin the accuracy contract that makes the swap
safe, and the plan shape that makes it scale.
"""

from pyspark.sql import functions as F

from conftest import SF001
from leftshove_spark.sources import load_table


def test_approx_count_distinct_within_rsd(spark):
    li = load_table(spark, SF001, "lineitem")
    row = li.agg(
        F.count_distinct("l_orderkey").alias("exact"),
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx"),
    ).collect()[0]
    # HLL++ at rsd=0.02: generous 3-sigma band
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.06


def test_percentile_approx_brackets_exact(spark):
    li = load_table(spark, SF001, "lineitem")
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.9)").alias("exact"),
        F.percentile_approx("l_extendedprice", 0.9, 10000).alias("approx"),
    ).collect()[0]
    # accuracy=10000 → rank error ≤ n/10000; price spread at sf0.01 is
    # wide, so allow 1% relative
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.01


def test_approx_aggs_are_partial_merge_shaped(spark):
    """The reason these are the scale path: partial aggregation on the
    map side (sketches merge), so the shuffle carries sketches, not
    values. Assert the two-phase HashAggregate/ObjectHashAggregate
    shape is actually planned."""
    li = load_table(spark, SF001, "lineitem")
    df = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_suppkey").alias("nd"),
        F.percentile_approx("l_quantity", 0.5, 1000).alias("p50"),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ObjectHashAggregate") + plan.count("HashAggregate") >= 2
    assert "partial" in plan.lower()
