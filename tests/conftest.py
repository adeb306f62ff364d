from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from kahi_spark.session import get_spark

    s = get_spark(
        app_name="kahi_spark_tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.sql.warehouse.dir": "/tmp/kahi_test_warehouse"},
    )
    yield s


@pytest.fixture()
def tmp_table_dir(tmp_path):
    return str(tmp_path / "table")
