from __future__ import annotations

import pytest

from pipz_spark.session import get_session
from pipz_spark.sources.catalog import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_session(app_name="pipz-spark-tests", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def orders(spark):
    return load_table(spark, "orders", SF_DIR).cache()


@pytest.fixture(scope="session")
def customer(spark):
    return load_table(spark, "customer", SF_DIR).cache()


@pytest.fixture(scope="session")
def lineitem(spark):
    return load_table(spark, "lineitem", SF_DIR).cache()


@pytest.fixture(scope="session")
def documents(spark):
    return load_table(spark, "documents", SF_DIR).cache()


@pytest.fixture(scope="session")
def embeddings(spark):
    return load_table(spark, "embeddings", SF_DIR).cache()


@pytest.fixture(scope="session")
def events(spark):
    return load_table(spark, "events", SF_DIR).cache()


# module-scoped aliases for hypothesis tests (function-scoped fixtures
# clash with @given re-execution)
@pytest.fixture(scope="session")
def spark_prop(spark):
    return spark


@pytest.fixture(scope="session")
def orders_prop(spark):
    return load_table(spark, "orders", SF_DIR).limit(500).cache()
