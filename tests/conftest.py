import pytest


@pytest.fixture(scope="session")
def spark():
    from json_to_parquet_spark.session import get_spark
    s = get_spark(app="tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def pages(spark):
    from json_to_parquet_spark.sources.webpages import synth_webpages
    return synth_webpages(spark, 2000, seed=42).cache()
