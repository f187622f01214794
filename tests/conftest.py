import pytest

from s_crawler_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="s_crawler_spark-tests", master="local[4]",
                  shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages(spark):
    from s_crawler_spark.corpus import synthesize_pages
    df = synthesize_pages(spark, SF_DIR).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def pages_dict(pages):
    """The corpus collected to a {url: html} dict for the sequential simulator."""
    return {r["url"]: bytes(r["html"]) for r in pages.select("url", "html").collect()}
