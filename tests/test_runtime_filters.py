"""Runtime (bloom) filter evidence — the sibling of the AQE skew test.

At 100 TB a selective dimension predicate should not just broadcast the
dim — Spark's runtime filter injects a bloom-filter/semi-join predicate
into the FACT-side scan, skipping row groups before the join even runs.
This pins that the optimizer actually injects one for a selective
dim-filtered join over parquet, so a conf regression fails CI.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def test_runtime_bloom_filter_injected(spark, tmp_path):
    fact_path = str(tmp_path / "fact")
    dim_path = str(tmp_path / "dim")
    # a fact table big enough to clear the application-side threshold
    # (lowered below) and a dim with a selective predicate
    spark.range(300_000).select(
        (F.col("id") % 1000).alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    ).write.parquet(fact_path)
    spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 50).alias("grp")
    ).write.parquet(dim_path)

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        # force the shuffle-join path: broadcast joins get their own
        # pushdown; the bloom filter is the mechanism for the SMJ path
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # thresholds sized for the MB-scale fixture
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "1KB",
        "spark.sql.optimizer.runtimeFilter.semiJoinReduction.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        fact = spark.read.parquet(fact_path)
        dim = spark.read.parquet(dim_path).filter(F.col("grp") == 7)
        joined = fact.join(dim, "k")
        plan = joined._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan or "BloomFilter" in plan, plan[:3000]
        # and it executes correctly with the filter in place
        assert joined.count() == 20 * 300  # 20 dim keys x 300 fact rows each
        final = joined._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in final, final[:3000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
