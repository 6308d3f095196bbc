"""AQE skew-join evidence (VERDICT r02 item 8).

The engine carries MANUAL salting operators (`join_skew_salted`,
`agg_skew_salted_distinct`) for planned-ahead skew; for UNPLANNED skew
the session enables `spark.sql.adaptive.skewJoin` (session.py:33-35) and
relies on AQE to split oversized partitions at runtime. This test pins
that the runtime re-plan actually happens for a fact-fact sort-merge
join over a deliberately skewed key — the plan's final (adaptive)
SortMergeJoin must carry `skew=true` — so a future conf regression
(someone disabling AQE or skew-join) fails CI instead of silently
degrading 100 TB joins.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _final_plan(df) -> str:
    # executedPlan after an action reflects the final adaptive plan
    return df._jdf.queryExecution().executedPlan().toString()


def test_aqe_splits_skewed_sort_merge_join(spark):
    confs = {
        # force a shuffle join (the probe side is small enough to
        # broadcast, which never skews)
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        # lower the skew thresholds so the test fixture (a few MB) is
        # "skewed" by AQE's accounting: a partition is skewed if larger
        # than factor * median AND > threshold bytes
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        # keep AQE from coalescing everything into one partition first
        "spark.sql.adaptive.coalescePartitions.minPartitionSize": "8KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # fact A: 400k rows, 90% on one hot key; fact B: 2k rows spread
        # over the key domain with a few rows on the hot key
        hot = (
            spark.range(400_000)
            .select(
                F.when(F.col("id") % 10 != 0, F.lit(7))
                .otherwise(F.col("id") % 1000)
                .alias("k"),
                F.sha2(F.col("id").cast("string"), 256).alias("pad"),
            )
        )
        probe = spark.range(2_000).select(
            (F.col("id") % 1000).alias("k"),
            F.col("id").alias("v"),
        )
        # plain fact-fact join, NO aggregation after it: an agg on the
        # join key would require hash distribution on k and AQE declines
        # to skew-split a join whose output partitioning is required
        # downstream (splitting would force an extra shuffle)
        joined = hot.select("k").join(probe, "k")
        # execute THIS DataFrame (count() would build a sibling plan and
        # leave joined's own adaptive plan unfinalized)
        rows = joined.collect()
        assert len(rows) > 0
        plan = _final_plan(joined)
        assert "isFinalPlan=true" in plan, plan[:2000]
        assert "skew=true" in plan, plan[:4000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
