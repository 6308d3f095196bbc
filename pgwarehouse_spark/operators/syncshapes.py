"""The reference's sync-engine operators (SURVEY.md §2-A) expressed as
oracle-checkable queries over the testdata.

The actual engine lives in ``pgwarehouse_spark.sync``; these queries pin
down the *semantics* of each incremental strategy so the driver's DuckDB
oracle can verify them:

- watermark read        (A11, clickhouse_backend.py:210-227)
- incremental delta     (A12, filter pushed into the source scan)
- upsert dedup-latest   (A17, duckdb INSERT OR REPLACE ≡ row_number()=1)
- merge anti-join+union (A15/A16, snowflake MERGE / clickhouse
                         delete-then-insert ≡ left-anti + union all)
- catalog listing       (A19/A22, pg_class size query ≡ per-table stats)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ._helpers import t

# Cutoff splitting orders into "already synced" target vs "new/changed"
# delta — mirrors the reference's high-watermark split.
_CUTOFF = "2001-01-01"


@register(
    "sync_watermark_max",
    category="sync",
    oracle="""
    SELECT 'orders' AS table_name,
           MAX(o_orderkey) AS max_pk,
           MAX(o_orderdate) AS max_last_modified,
           COUNT(*) AS n_rows
    FROM orders
    """,
)
def sync_watermark_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: the high-watermark read. At 100 TB this is a parquet-footer
    min/max aggregate — Spark answers it from statistics without a full
    scan when the table is sorted/partitioned on the key."""
    return t(spark, sf_dir, "orders").agg(
        F.lit("orders").alias("table_name"),
        F.max("o_orderkey").alias("max_pk"),
        F.max("o_orderdate").alias("max_last_modified"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "sync_incremental_delta",
    category="sync",
    oracle=f"""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '{_CUTOFF}'
    ORDER BY o_orderkey
    """,
)
def sync_incremental_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: the delta extract `where last_modified >= watermark`. The
    predicate reaches the parquet scan (PushedFilters) exactly as the
    reference pushes its filter into `psql \\copy (select ... where ...)`."""
    return (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit(_CUTOFF).cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy("o_orderkey")
    )


@register(
    "sync_upsert_dedup_latest",
    category="sync",
    oracle="""
    SELECT o_custkey, o_orderkey AS latest_orderkey, o_totalprice AS latest_price
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders
    ) WHERE rn = 1
    ORDER BY o_custkey
    """,
)
def sync_upsert_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A17: keep-latest-per-key — the DataFrame form of DuckDB
    `INSERT OR REPLACE` (duckdb_backend.py:192). Scales as one shuffle on
    the key; Spark pushes a group-limit below the exchange."""
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_custkey",
            F.col("o_orderkey").alias("latest_orderkey"),
            F.col("o_totalprice").alias("latest_price"),
        )
        .orderBy("o_custkey")
    )


@register(
    "sync_merge_upsert",
    category="sync",
    oracle=f"""
    WITH target AS (
      SELECT o_orderkey, o_totalprice, o_orderdate FROM orders
      WHERE o_orderdate < TIMESTAMP '{_CUTOFF}'
    ), delta AS (
      SELECT o_orderkey, o_totalprice * 1.1 AS o_totalprice, o_orderdate
      FROM orders WHERE o_orderdate >= TIMESTAMP '2000-06-01'
    )
    SELECT o_orderkey, CAST(ROUND(o_totalprice, 4) AS DOUBLE) AS o_totalprice, o_orderdate
    FROM (
      SELECT t.* FROM target t
      WHERE NOT EXISTS (SELECT 1 FROM delta d WHERE d.o_orderkey = t.o_orderkey)
      UNION ALL
      SELECT * FROM delta
    )
    ORDER BY o_orderkey
    """,
)
def sync_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15/A16: MERGE upsert as left-anti join + union-all. This is the
    engine's merge primitive (sync/merge.py); expressed here as a query so
    the oracle pins its semantics (updated rows replace, new rows append,
    untouched rows survive)."""
    o = t(spark, sf_dir, "orders")
    target = o.filter(F.col("o_orderdate") < F.lit(_CUTOFF).cast("timestamp")).select(
        "o_orderkey", "o_totalprice", "o_orderdate"
    )
    delta = o.filter(
        F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp")
    ).select(
        "o_orderkey",
        (F.col("o_totalprice") * 1.1).alias("o_totalprice"),
        "o_orderdate",
    )
    merged = target.join(delta, "o_orderkey", "left_anti").unionByName(delta)
    return merged.select(
        "o_orderkey",
        F.round("o_totalprice", 4).alias("o_totalprice"),
        "o_orderdate",
    ).orderBy("o_orderkey")


@register(
    "sync_catalog_list",
    category="sync",
    oracle="""
    SELECT table_name, n_rows FROM (
      SELECT 'orders' AS table_name, COUNT(*) AS n_rows FROM orders
      UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
      UNION ALL SELECT 'customer', COUNT(*) FROM customer
      UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
      UNION ALL SELECT 'part', COUNT(*) FROM part
      UNION ALL SELECT 'nation', COUNT(*) FROM nation
      UNION ALL SELECT 'region', COUNT(*) FROM region
    ) ORDER BY n_rows DESC, table_name
    """,
)
def sync_catalog_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A19/A22: catalog listing with sizes, sorted descending — the shape of
    the reference's pg_class size query (pgwarehouse.py:218-237). Counts
    come from parquet metadata, so this is O(footers) not O(data)."""
    parts = []
    for name in ["orders", "lineitem", "customer", "supplier", "part", "nation", "region"]:
        parts.append(
            t(spark, sf_dir, name).agg(
                F.lit(name).alias("table_name"), F.count(F.lit(1)).alias("n_rows")
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy(F.col("n_rows").desc(), "table_name")
