"""Shared fixtures: one SparkSession per test run + a small deterministic
synthetic changelog (FIXTURES.md F2)."""

from __future__ import annotations

import shutil
import tempfile

import pandas as pd
import pytest
from pyspark.sql import SparkSession

from scylla_cdc_source_connector_spark import fixtures


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.default.parallelism", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "6g")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .appName("scylla-cdc-spark-tests")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture(scope="session")
def tmp_root():
    d = tempfile.mkdtemp(prefix="sccs_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def small_spec() -> fixtures.FixtureSpec:
    return fixtures.FixtureSpec(n_events=3_000, n_clips=300, n_shards=8)


@pytest.fixture(scope="session")
def changelog_pdf(small_spec) -> pd.DataFrame:
    return fixtures.make_changelog(small_spec)


@pytest.fixture(scope="session")
def changelog_path(tmp_root, small_spec) -> str:
    path = f"{tmp_root}/changelog.parquet"
    fixtures.write_changelog_parquet(path, small_spec)
    return path


@pytest.fixture(scope="session")
def changelog_df(spark, changelog_path):
    return spark.read.parquet(changelog_path)
