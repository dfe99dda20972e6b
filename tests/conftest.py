import tempfile

import pytest


@pytest.fixture(scope="session")
def spark():
    from trading_dashboard_spark.session import get_spark

    spark = get_spark(
        "tests",
        shuffle_partitions=8,
        extra_conf={
            # catalog tables (bucketing tests) land in a throwaway dir
            "spark.sql.warehouse.dir": tempfile.mkdtemp(prefix="tds_warehouse_"),
        },
    )
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
