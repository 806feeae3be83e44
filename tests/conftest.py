from __future__ import annotations

import os

import pandas as pd
import pytest

os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


@pytest.fixture(scope="session")
def spark():
    from sequali_spark.session import get_spark

    s = get_spark(app_name="sequali_spark_tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_small() -> pd.DataFrame:
    from sequali_spark.fixtures import generate_pages

    return generate_pages(2000, seed=42)


@pytest.fixture(scope="session")
def pages_tiny() -> pd.DataFrame:
    from sequali_spark.fixtures import generate_pages

    return generate_pages(200, seed=42)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
