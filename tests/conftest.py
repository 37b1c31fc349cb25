from __future__ import annotations

import os

import pytest

os.environ.setdefault("TZ", "UTC")
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")  # small data — big JVMs waste startup

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from pulsar_cdc_experiment_spark.session import get_spark

    spark = get_spark(app_name="tests", shuffle_partitions=8)
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def spark_global(spark):
    """Alias for hypothesis-driven tests (function args can't share the
    'spark' name with @given-injected params in some layouts)."""
    return spark
