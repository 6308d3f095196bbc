"""Parquet table access for the driver testdata layout.

``spark.read.parquet`` gives vectorized columnar scans with predicate
pushdown and column pruning via Catalyst — the Spark-native equivalent of
the reference's bulk CSV staging path (reference pgwarehouse.py:254-303,
which streams `psql \\copy` CSV to gzip chunks). At 100 TB the same call
reads a partitioned parquet lake; nothing here assumes local files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables small enough to broadcast at any realistic scale factor
# (region/nation are bounded by geography; supplier/part/customer grow with
# SF but stay ≪ fact tables — broadcast decisions for those are left to
# AQE + autoBroadcastJoinThreshold rather than hard-coded).
ALWAYS_BROADCAST = {"region", "nation"}


# Files whose single parquet row group exceeds this many rows get an
# explicit repartition after the scan — a one-row-group file is an
# indivisible split, so without it the scan AND everything codegen-fused
# above it (filter, partial aggregation, shingling/hashing) run in ONE
# task regardless of cluster size. Real lakes avoid this via compaction
# into many files/row-groups; this recovers parallelism for pathological
# inputs. The threshold is low (1k rows) because per-row cost can be
# large (documents carry full text; embeddings carry float arrays) —
# only dimension-sized tables are exempt.
_SPLIT_MIN_ROWS = 1_000
_layout_cache: dict[str, bool] = {}


def _single_large_row_group(path: str) -> bool:
    if path not in _layout_cache:
        try:
            import pyarrow.parquet as pq

            meta = pq.ParquetFile(path).metadata
            _layout_cache[path] = (
                meta.num_row_groups == 1 and meta.num_rows >= _SPLIT_MIN_ROWS
            )
        except Exception:
            _layout_cache[path] = False
    return _layout_cache[path]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _load_events(spark, sf_dir)
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    if _single_large_row_group(path):
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores `ts` as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects. Read nanos as long (runtime conf) and convert
    to a microsecond TimestampType via integer division — the same
    truncation DuckDB applies when it reads ns into its µs TIMESTAMP, so
    both engines see identical values."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register each testdata table as a temp view for spark.sql queries."""
    for name in tables or TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(name)
