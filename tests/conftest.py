import pytest


@pytest.fixture(scope="session")
def spark():
    from trading_dashboard_spark.session import get_spark

    spark = get_spark("tests", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_dir():
    return "/root/testdata/sf0.001"
