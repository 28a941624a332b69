"""Shared fixtures: one SparkSession per test run, testdata views."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from keenwa_spark.session import get_spark

    spark = get_spark("keenwa_spark_tests")
    yield spark


@pytest.fixture(scope="session")
def views(spark):
    """Session with the standard testdata tables registered."""
    from keenwa_spark.queries import ensure_views

    ensure_views(spark, SF_DIR)
    return spark


@pytest.fixture(scope="session")
def engine(spark):
    from keenwa_spark.engine import Engine

    return Engine(spark, sf_dir=SF_DIR)
