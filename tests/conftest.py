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
    yield spark
    spark.stop()
