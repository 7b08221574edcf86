from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402

from xrpl_rich_list_py_crawler_spark.sources.fixtures import (  # noqa: E402
    ensure_crawl_fixtures,
)


def _build_spark(parallelism: str = "local[8]") -> SparkSession:
    return (
        SparkSession.builder.master(parallelism)
        .appName("engine-tests")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    s = _build_spark()
    yield s
    s.stop()


@pytest.fixture(scope="session")
def crawl_sf0001() -> str:
    return ensure_crawl_fixtures("sf0.001")


@pytest.fixture(scope="session")
def crawl_sf001() -> str:
    return ensure_crawl_fixtures("sf0.01")


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return "/root/testdata/sf0.001"
