from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
# The DuckDB-oracle mirror runs at the DRIVER's scale factor (sf0.01) so
# the local gate and the round gate can never diverge on sf-sensitive
# queries again (VERDICT r04 item 3: the two r1 driver reds — q12,
# agg_approx_distinct — were exactly the class that passes at one sf and
# fails at another). Everything else stays at sf0.001 for suite speed.
SF_DIR_ORACLE = os.environ.get(
    "SPARK_GRAFT_ORACLE_SF_DIR",
    # fall back to SF_DIR on machines without the driver's sf0.01 data
    # so the oracle suite still runs (at the available scale) there
    "/root/testdata/sf0.01" if os.path.isdir("/root/testdata/sf0.01") else SF_DIR,
)


@pytest.fixture(scope="session")
def spark():
    from pgwarehouse_spark.session import get_spark

    s = get_spark(app_name="pgwarehouse_spark_tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
