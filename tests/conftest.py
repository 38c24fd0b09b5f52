"""Shared Spark fixtures for the engine's test suite."""

from __future__ import annotations

import pytest

from web_content_extractor_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="wce-tests", master="local[4]")
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


SF_DIR = "/root/testdata/sf0.001"
