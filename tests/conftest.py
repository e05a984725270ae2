"""Shared Spark session + web-fixture helpers for the test suite."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from crawler_spark.schema import DOCUMENTS, REDIRECTS, ROBOTS_RULES


@pytest.fixture(scope="session")
def spark():
    from crawler_spark.session import build_session

    s = build_session(app_name="crawler_spark_tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture()
def tmp_state(tmp_path):
    d = tempfile.mkdtemp(dir=tmp_path)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def web_to_spark(spark, web):
    """Generated pandas web (genweb.generate) → Spark DataFrames."""
    docs = spark.createDataFrame(web["documents"].to_dict("records"), DOCUMENTS)
    red = web["redirects"]
    redirects = spark.createDataFrame(
        red.to_dict("records") if len(red) else [], REDIRECTS
    )
    rob = web["robots_rules"]
    robots = spark.createDataFrame(
        rob.to_dict("records") if len(rob) else [], ROBOTS_RULES
    )
    return docs, redirects, robots
