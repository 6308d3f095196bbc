"""Degenerate-input robustness: every registered query must build and
execute against EMPTY base tables without raising — at warehouse scale an
empty slice is normal (fresh feed, filtered partition, new tenant), and a
driver-side crash on it is an operator bug regardless of scale.

Each query may legitimately return zero rows (most do) or a few
aggregate rows with NULL/zero measures; what it may NOT do is throw.
"""

from __future__ import annotations

import os

import pytest

from pgwarehouse_spark.registry import all_queries

SPECS = all_queries()


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir, tmp_path_factory):
    """Write an empty copy (same schema) of every base table."""
    from pgwarehouse_spark.sources.tables import load_table

    out = str(tmp_path_factory.mktemp("empty_sf"))
    tables = [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    for name in tables:
        df = load_table(spark, sf_dir, name)
        df.limit(0).write.parquet(os.path.join(out, f"{name}.parquet"))
    return out


@pytest.mark.parametrize("name", sorted(SPECS))
def test_runs_on_empty_tables(spark, empty_sf_dir, name):
    df = SPECS[name].fn(spark, empty_sf_dir)
    assert df.count() >= 0
