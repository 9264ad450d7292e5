import sys

import pytest

sys.path.insert(0, "/root/repo")

SF0001 = "/root/testdata/sf0.001"
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from leftshove_spark.session import get_spark

    spark = get_spark(app_name="leftshove-spark-tests", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    # Codegen-compile lint (r9 What's-wrong #1/#2): a whole-stage
    # compile failure is runtime-SILENT in production (Spark logs an
    # ERROR and re-runs the stage interpreted, row-at-a-time — the PQ
    # ADC WHEN-chain shipped that way for a round, invisible to
    # correctness checks and plan lints alike). With fallback disabled,
    # every query ANY test executes — including the full-gate sweep in
    # test_gate_tail_oracle — raises instead, so an expression-tree
    # blowup is a red test forever. See tests/test_codegen_lint.py.
    spark.conf.set("spark.sql.codegen.fallback", "false")
    yield spark
    spark.stop()
