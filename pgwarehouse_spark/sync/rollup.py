"""Incremental aggregate maintenance: keep a rollup table up to date by
additively merging delta partials — the warehouse "continuous aggregate"
the reference's sync loop feeds but never maintains itself (its
warehouses recompute aggregates per query; here the engine maintains
them incrementally, the same way it maintains the base table).

Three mergeable measure kinds are maintained: *additive* (SUM / COUNT
partials), *sketch* (hll_sketch_agg partials, merged with hll_union),
and *OR-masks* (int64 bit words — Bloom filters, presence bitmaps —
merged with bitwise OR). Derived ratios (avg = sum/count) are computed
at read time from the partials — the standard
incremental-view-maintenance decomposition.

Scale design: the delta is pre-aggregated to one row per touched group
BEFORE any target IO (map-side combine + one small shuffle); the target
is bucket-partitioned by group key, so the merge reads and rewrites only
the buckets containing touched groups (same pruning as
merge_into_bucketed). Work is O(groups touched by the delta), never
O(rollup size) — at 100 TB of events with a bounded group space the
rollup update cost is constant per batch.

Delivery semantics: applying the same delta twice double-counts —
additive maintenance is NOT idempotent, so pair it with an exactly-once
delivery mechanism (the Structured Streaming checkpoint in
streaming/events.py::stream_sync provides exactly that per epoch).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .merge import BUCKET_COL, bucket_expr, write_bucketed

Measures = list[tuple[str, Column]]


def rollup_delta(
    delta: DataFrame,
    group_keys: list[str],
    measures: Measures,
    sketch_measures: Measures | None = None,
    or_measures: Measures | None = None,
) -> DataFrame:
    """Pre-aggregate a delta to one partial row per touched group."""
    aggs = [m.alias(n) for n, m in measures]
    aggs += [m.alias(n) for n, m in (sketch_measures or [])]
    aggs += [m.alias(n) for n, m in (or_measures or [])]
    return delta.groupBy(*group_keys).agg(*aggs)


def update_rollup(
    spark: SparkSession,
    path: str,
    delta: DataFrame,
    group_keys: list[str],
    measures: Measures,
    num_buckets: int = 16,
    sketch_measures: Measures | None = None,
    or_measures: Measures | None = None,
) -> int:
    """Merge a delta into the bucketed rollup at `path`: additive
    measures merge with `+`, sketch measures (e.g. ``hll_sketch_agg``
    partials for distinct counts) merge with ``hll_union``, and
    or_measures (int64 bit masks — Bloom-filter words, presence
    bitmaps) merge with bitwise OR.

    Delivery semantics differ per measure kind: additive partials
    double-count on redelivery (pair with exactly-once); sketch unions
    are register-max and OR-merges are set-union — both IDEMPOTENT, so
    re-applying the same delta leaves them unchanged and those columns
    tolerate at-least-once delivery.

    Creates the rollup on first call. Returns the number of target
    buckets rewritten (0 on create or empty delta).
    """
    d = rollup_delta(delta, group_keys, measures, sketch_measures, or_measures)
    names = [n for n, _ in measures]
    sketch_names = [n for n, _ in (sketch_measures or [])]
    or_names = [n for n, _ in (or_measures or [])]
    # Hadoop FS existence check, not os.path.exists: a rollup at an
    # s3://... or hdfs://... path would otherwise ALWAYS take the create
    # branch and overwrite the accumulated rollup with just this delta
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    if not hpath.getFileSystem(hconf).exists(hpath):
        write_bucketed(d, path, group_keys, num_buckets)
        return 0
    d = d.withColumn(BUCKET_COL, bucket_expr(group_keys, num_buckets))
    affected = [r[BUCKET_COL] for r in d.select(BUCKET_COL).distinct().collect()]
    if not affected:
        return 0
    target = spark.read.parquet(path).filter(F.col(BUCKET_COL).isin(affected))
    t, x = target.alias("t"), d.alias("x")
    merged = t.join(x, [F.col(f"t.{k}").eqNullSafe(F.col(f"x.{k}")) for k in group_keys], "full_outer").select(
        *[
            F.coalesce(F.col(f"t.{k}"), F.col(f"x.{k}")).alias(k)
            for k in group_keys
        ],
        *[
            (
                F.coalesce(F.col(f"t.{n}"), F.lit(0))
                + F.coalesce(F.col(f"x.{n}"), F.lit(0))
            ).alias(n)
            for n in names
        ],
        *[
            F.when(
                F.col(f"t.{n}").isNotNull() & F.col(f"x.{n}").isNotNull(),
                F.expr(f"hll_union(t.{n}, x.{n})"),
            )
            .otherwise(F.coalesce(F.col(f"t.{n}"), F.col(f"x.{n}")))
            .alias(n)
            for n in sketch_names
        ],
        *[
            F.coalesce(F.col(f"t.{n}"), F.lit(0))
            .bitwiseOR(F.coalesce(F.col(f"x.{n}"), F.lit(0)))
            .alias(n)
            for n in or_names
        ],
    ).withColumn(BUCKET_COL, bucket_expr(group_keys, num_buckets))
    # Materialize before overwriting the files the plan reads from
    # (plain parquet has no snapshot isolation).
    merged = merged.localCheckpoint(eager=True)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return len(affected)


def read_rollup(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path).drop(BUCKET_COL)
