from __future__ import annotations

import os

import pytest

SF_SMOKE = os.environ.get("SPARK_GRAFT_SF_SMOKE", "/root/testdata/sf0.001")
SF_CORRECTNESS = os.environ.get("SPARK_GRAFT_SF_CORRECTNESS", "/root/testdata/sf0.01")

# Driver-facing FAST LANE (r14 verdict item 1): the full suite (~555 tests,
# 60-70 min of Spark work) outruns the driver's verify window, so the driver
# never sees a completed green run. A default `pytest tests/` therefore runs
# the fast lane — everything except tests marked `slow` — sized to finish
# well inside the window while still covering the plan pins, every
# optimization round's invariance/bit-equality pins, and a representative
# oracle-parity sample (every query an optimization round ever touched plus
# the headline bench basket; the driver separately hash-checks a 50-query
# oracle sample itself, so exhaustive parity is redundant in its window).
# The FULL suite (exhaustive 263-query parity sweep + the slow end-to-end
# replays) remains one env var away and stays the bar for round-close:
#
#     SPARK_GRAFT_FULL_TESTS=1 python -m pytest tests/
FULL_TESTS = os.environ.get("SPARK_GRAFT_FULL_TESTS", "") not in ("", "0")


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: full-suite-only test (skipped unless SPARK_GRAFT_FULL_TESTS=1; "
        "the default lane must finish inside the driver's verify window)",
    )


def pytest_collection_modifyitems(config, items):
    if FULL_TESTS:
        return
    skip = pytest.mark.skip(
        reason="slow: full-suite lane only (set SPARK_GRAFT_FULL_TESTS=1)"
    )
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)


@pytest.fixture(scope="session")
def spark():
    from kafka_streams_rosetta_demo_spark.session import get_spark

    spark = get_spark(app_name="rosetta-tests", master="local[*]", shuffle_partitions=8)
    yield spark


@pytest.fixture(scope="session")
def sf_smoke() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def sf_correctness() -> str:
    return SF_CORRECTNESS
