import os

import pytest

SF_SMALL = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
SF_MED = os.environ.get("SPARK_GRAFT_SF_MED", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from maps_spark.session import get_spark
    s = get_spark("maps-spark-tests", cpus=os.environ.get("SPARK_GRAFT_CPUS", 8),
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def occ_small(spark):
    from maps_spark.sources.occurrence import occurrence_df
    return occurrence_df(spark, SF_SMALL).cache()
