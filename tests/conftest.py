import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crawler_core_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark(
        app_name="crawler-core-spark-tests",
        master="local[4]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.adaptive.enabled": "false"},  # stable tiny-test plans
    )
    yield s
    s.stop()


@pytest.fixture()
def store(spark, tmp_path):
    from crawler_core_spark.storage import TableStore

    return TableStore(spark, str(tmp_path / "warehouse"))
