from __future__ import annotations

import pytest

from real_time_data_analytics_cassandra_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.001"  # fast local gate; the driver runs sf0.01


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="rtdac-tests", shuffle_partitions=8)
    yield s
    s.stop()
