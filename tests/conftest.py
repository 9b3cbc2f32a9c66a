import pytest

from timeseries_harmonizer_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[4]", shuffle_partitions=4)
    yield s


@pytest.fixture(scope="session")
def pages(spark):
    from timeseries_harmonizer_spark.sources.webpages import web_pages

    df = web_pages(spark, n_urls=30, points_per_url=120, n_domains=8, seed=42)
    df.cache().count()
    return df


@pytest.fixture(scope="session")
def reg(spark, pages):
    from timeseries_harmonizer_spark.sources.webpages import registry

    df = registry(spark, pages, seed=42)
    df.cache().count()
    return df
