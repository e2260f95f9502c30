from __future__ import annotations

import pytest

from etl_consumer_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="etl_consumer_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s


SF_DIR = "/root/testdata/sf0.001"
