"""Shared fixtures. One session-scoped local Spark; sf0.001 data."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from ballista_extensions_spark.session import get_session

    s = get_session("pytest")
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


@pytest.fixture(scope="session")
def lineitem(spark, sf_dir):
    from ballista_extensions_spark.io import load_table

    return load_table(spark, sf_dir, "lineitem")


@pytest.fixture(scope="session")
def documents(spark, sf_dir):
    from ballista_extensions_spark.io import load_table

    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="session")
def orders(spark, sf_dir):
    from ballista_extensions_spark.io import load_table

    return load_table(spark, sf_dir, "orders")


@pytest.fixture(scope="session")
def embeddings(spark, sf_dir):
    from ballista_extensions_spark.io import load_table

    return load_table(spark, sf_dir, "embeddings")
