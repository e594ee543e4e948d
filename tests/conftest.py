from __future__ import annotations

import os

import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from shaha_spark.session import get_spark

    spark = get_spark(app_name="shaha-spark-tests", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("SHAHA_TEST_SF_DIR", "/root/testdata/sf0.001")
