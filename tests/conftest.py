from __future__ import annotations

import os

import pytest

os.environ.setdefault("TZ", "UTC")
# small data — more cores only add task-scheduling overhead: the suite's
# module timings measured local[4] ~17% faster than local[8] and ~25%
# faster than local[2] on the lifecycle-heaviest module (round 20)
os.environ.setdefault("SPARK_GRAFT_CPUS", "4")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from pulsar_cdc_experiment_spark.session import get_spark

    spark = get_spark(app_name="tests", shuffle_partitions=8)
    # Test-session-only acceleration (round 20, suite wall-time): on
    # sub-MB fixtures the Janino compile of every unique whole-stage
    # plan costs more than interpreted evaluation saves (~0.2 s per
    # unique plan, hundreds of unique plans across the suite).
    # Semantics are identical — production sessions keep codegen on.
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
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
