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


def test_sketch_rollup_merge_equals_direct_and_near_exact(spark, sf_dir):
    """Mergeability: weekly estimate from unioned DAILY sketches must
    equal the estimate of one sketch built directly over the week (HLL
    register-max merge is associative/commutative), and both must sit
    within 2% of the exact distinct count."""
    from pyspark.sql import functions as F

    from pgwarehouse_spark.operators.eventwindows import (
        events_distinct_rollup_estimates,
    )
    from pgwarehouse_spark.sources.tables import load_table

    merged = {
        r["week_start"]: r["est_users"]
        for r in events_distinct_rollup_estimates(spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "events")
    wk = e.select(
        F.date_trunc("week", F.col("ts")).cast("date").alias("week_start"),
        "user_id",
    )
    direct = {
        r["week_start"]: r["est"]
        for r in wk.groupBy("week_start")
        .agg(F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias("est"))
        .collect()
    }
    exact = {
        r["week_start"]: r["ex"]
        for r in wk.groupBy("week_start")
        .agg(F.countDistinct("user_id").alias("ex"))
        .collect()
    }
    assert merged == direct
    for k, ex in exact.items():
        assert abs(merged[k] - ex) <= max(1, 0.02 * ex)


@pytest.mark.parametrize("nparts", [1, 7, 32])
def test_fixed_point_dot_bit_identical_across_partitionings(spark, sf_dir, nparts):
    """dot_fixed / l2sq_fixed (FLOOR fixed-point folds) must aggregate
    bit-identically at any partition count — the property the kNN-graph,
    BQ, MRL and k-center selections rely on for reproducible ranking."""
    from pgwarehouse_spark.functions.vector import dot_fixed, l2sq_fixed

    e = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    q = e.orderBy("vec_id").limit(1).select(F.col("embedding").alias("q_emb"))
    scored = e.crossJoin(F.broadcast(q)).select(
        dot_fixed(F.col("embedding"), F.col("q_emb")).alias("d"),
        l2sq_fixed(F.col("embedding"), F.col("q_emb")).alias("l2"),
    )
    got = (
        scored.repartition(nparts)
        .agg(
            F.sum(F.col("d").cast("decimal(28,12)")).alias("sd"),
            F.sum(F.col("l2").cast("decimal(28,12)")).alias("sl"),
        )
        .collect()[0]
    )
    want = scored.coalesce(1).agg(
        F.sum(F.col("d").cast("decimal(28,12)")).alias("sd"),
        F.sum(F.col("l2").cast("decimal(28,12)")).alias("sl"),
    ).collect()[0]
    assert got.sd == want.sd and got.sl == want.sl


def test_quantile_rollup_merge_equals_direct_and_bounded(spark, sf_dir):
    """Log-grid quantile sketch mergeability (r4): the weekly histogram
    summed from DAILY histograms must equal the histogram built
    directly over the week — integer vector addition, exact — and the
    derived p50/p90 estimates must sit within the grid's error bound
    of the exact percentiles."""
    from pyspark.sql import functions as F

    from pgwarehouse_spark.operators.eventwindows import (
        _QSK_REL_ERR,
        _QSK_SUB,
        events_quantile_rollup_estimates,
    )
    from pgwarehouse_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    wk = e.select(
        F.date_trunc("week", F.col("ts")).cast("date").alias("week_start"),
        F.to_date("ts").alias("d"),
        F.floor(F.log(F.col("value")) * _QSK_SUB).cast("bigint").alias("bucket"),
        "value",
    )
    # merged-of-daily == direct weekly, bucket by bucket
    daily_then_week = (
        wk.groupBy("week_start", "d", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("week_start", "bucket")
        .agg(F.sum("n").alias("n"))
    )
    direct_week = wk.groupBy("week_start", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    assert daily_then_week.exceptAll(direct_week).count() == 0
    assert direct_week.exceptAll(daily_then_week).count() == 0

    # estimates vs exact percentiles within the documented bound
    est = {
        r["week_start"]: (r["p50_est"], r["p90_est"])
        for r in events_quantile_rollup_estimates(spark, sf_dir).collect()
    }
    exact = {
        r["week_start"]: (r["p50"], r["p90"])
        for r in wk.groupBy("week_start")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.9)").alias("p90"),
        )
        .collect()
    }
    assert set(est) == set(exact)
    for k, (e50, e90) in est.items():
        x50, x90 = exact[k]
        assert abs(e50 - x50) / x50 <= _QSK_REL_ERR, (k, e50, x50)
        assert abs(e90 - x90) / x90 <= _QSK_REL_ERR, (k, e90, x90)


def test_countmin_rollup_merge_equals_direct_and_overestimates(spark, sf_dir):
    """Count-min sketch mergeability (r4): the weekly counter grid summed
    from DAILY grids must equal the grid built directly over the week
    (integer vector addition, exact), and every probe estimate must
    dominate the exact count — the CMS one-sided-error guarantee."""
    from pyspark.sql import functions as F

    from pgwarehouse_spark.operators.eventwindows import (
        _CMS_HASHES,
        _CMS_P,
        _CMS_W,
        events_countmin_rollup_sketch,
    )
    from pgwarehouse_spark.sources.tables import load_table

    e = load_table(spark, sf_dir, "events")
    cells = e.select(
        F.date_trunc("week", "ts").cast("date").alias("week_start"),
        F.to_date("ts").alias("d"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        (
                            (F.lit(a) * F.col("user_id") + F.lit(b))
                            % _CMS_P
                            % _CMS_W
                        ).alias("bucket"),
                    )
                    for r, a, b in _CMS_HASHES
                ]
            )
        ).alias("h"),
    )
    daily_then_week = (
        cells.groupBy("week_start", "d", "h.r", "h.bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("week_start", "r", "bucket")
        .agg(F.sum("n").alias("n"))
    )
    direct_week = cells.groupBy("week_start", "h.r", "h.bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    assert (
        daily_then_week.exceptAll(direct_week).count() == 0
        and direct_week.exceptAll(daily_then_week).count() == 0
    )
    rows = events_countmin_rollup_sketch(spark, sf_dir).collect()
    assert rows, "sketch probe returned no rows"
    assert all(r["overcount"] >= 0 for r in rows)
    assert all(r["cms_est"] >= r["exact_n"] for r in rows)
