"""Every registered query with an oracle must match DuckDB exactly —
the local mirror of the driver's CORRECTNESS gate (row count + column
names + order-insensitive values). Runs at the driver's scale factor
(sf0.01, ``conftest.SF_DIR_ORACLE``) so the two gates agree on
sf-sensitive queries."""

from __future__ import annotations

import pytest

from pgwarehouse_spark.registry import all_queries

from .conftest import SF_DIR_ORACLE
from pgwarehouse_spark.oraclecheck import compare, duckdb_conn

SPECS = all_queries()
WITH_ORACLE = sorted(name for name, s in SPECS.items() if s.oracle)
NO_ORACLE = sorted(name for name, s in SPECS.items() if not s.oracle)


@pytest.fixture(scope="module")
def con():
    c = duckdb_conn(SF_DIR_ORACLE)
    yield c
    c.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_match(spark, con, name):
    spec = SPECS[name]
    df = spec.fn(spark, SF_DIR_ORACLE)
    report = compare(df, con, spec.oracle)
    assert report["ok"], f"{name}: {report}"


def test_every_query_has_an_oracle():
    """Since the verdict-oracle conversion, the whole surface is
    oracle-checked; a new oracle-less registration should be a
    deliberate, visible decision (this test starts failing)."""
    assert NO_ORACLE == []


@pytest.mark.parametrize("name", NO_ORACLE)
def test_rows_only_runs(spark, sf_dir, name):
    """Fallback for any future oracle-less query: must at least run and
    return a stable schema with ≥0 rows. (Currently an empty set.)"""
    spec = SPECS[name]
    df = spec.fn(spark, sf_dir)
    assert df.columns, name
    assert df.count() >= 0, name
