from __future__ import annotations

import pytest

from reddit_apache_airflow_postgres_pipeline_spark.config import EngineConfig
from reddit_apache_airflow_postgres_pipeline_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def cfg():
    return EngineConfig(gdpr_salt="test-salt")
