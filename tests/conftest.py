from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from etl_data_ingestion_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
