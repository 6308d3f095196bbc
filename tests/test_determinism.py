"""Partition-invariance: the engine's float aggregates must be
bit-identical at ANY partition count — the property that makes results
reproducible when the same query moves from local[32] to 1000 executors
(and what lets the DuckDB oracle gate hash-compare values at all)."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from pgwarehouse_spark.operators._helpers import dsum


@pytest.mark.parametrize("nparts", [1, 7, 32])
def test_dsum_bit_identical_across_partitionings(spark, sf_dir, nparts):
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    expr = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    got = (
        li.repartition(nparts)
        .agg(dsum(expr).alias("s"))
        .collect()[0]
        .s
    )
    want = li.coalesce(1).agg(dsum(expr).alias("s")).collect()[0].s
    assert got == want  # exact bit equality, not approx


def test_naive_double_sum_is_why(spark, sf_dir):
    """Control: the naive double SUM genuinely varies with partitioning on
    this data (if it didn't, dsum would be superstition). Not asserted as
    inequality — double sums MAY coincide — just documented behavior;
    the real assertion is above."""
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    expr = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    a = li.repartition(1).agg(F.sum(expr).alias("s")).collect()[0].s
    b = li.repartition(32).agg(F.sum(expr).alias("s")).collect()[0].s
    # tolerate either outcome; the point is dsum doesn't depend on luck
    assert abs(a - b) < 1e-3


def test_minhash_signature_partition_invariant(spark, sf_dir):
    from pgwarehouse_spark.operators.dedup import (
        _shingled,
        minhash_signatures_df,
    )

    sh = _shingled(spark, sf_dir)
    one = {
        r.doc_id: tuple(r.sig)
        for r in minhash_signatures_df(sh.coalesce(1)).collect()
    }
    many = {
        r.doc_id: tuple(r.sig)
        for r in minhash_signatures_df(sh.repartition(16)).collect()
    }
    assert one == many
