import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "8")
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")


@pytest.fixture(scope="session")
def spark():
    from inputlayer_spark.session import get_spark

    s = get_spark("tests")
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture()
def engine(spark):
    from inputlayer_spark.engine import IQLEngine

    return IQLEngine(spark)


def rows(df):
    """Result as a sorted list of tuples (set semantics compare)."""
    return sorted(tuple(r) for r in df.collect())
