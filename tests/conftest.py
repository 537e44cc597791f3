from __future__ import annotations

import pytest

from tile_processor_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="tps-tests", shuffle_partitions=8)
    yield spark
