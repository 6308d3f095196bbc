"""Shared helpers for registered queries.

Cross-engine float determinism: a double-precision SUM computed in a
different accumulation order (Spark partial aggregates vs DuckDB) differs
in the last ulps, which would break the driver's value-hash comparison.
The fix used throughout: compute the per-row expression in double (bit
identical in both engines), cast each addend to DECIMAL(18,6) (exact,
identical rounding in both engines — no double is an exact midpoint at
scale 6), SUM the decimals (exact), then cast the final sum back to
DOUBLE. The result is bit-identical regardless of partitioning, so it is
also *stable at any scale* — a 1000-executor sum hashes the same as a
single-threaded one.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.tables import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def dsum(col: Column | str, scale: int = 6) -> Column:
    """Order-independent (exact) sum of a double expression, as double.

    Cross-engine caveat (found via embedding_covariance): the per-value
    double->DECIMAL cast breaks ties differently — Spark rounds HALF_UP,
    DuckDB HALF_EVEN — so a dyadic double landing EXACTLY on a .5 decimal
    boundary at `scale` (e.g. 0.1983642578125 at scale 12) diverges by
    one unit. Safe here because the summed columns are decimal-valued
    business numbers (prices at scale ≤ 2) or floats whose products
    don't terminate at the boundary at the gate SF; for raw float32
    moments use the FLOOR-to-BIGINT fixed-point pattern
    (operators/similarity.py::embedding_covariance) instead."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 6) -> Column:
    """Order-independent mean: exact decimal sum / count, double division."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def global_rank_cumsum(
    df: DataFrame,
    order_cols: list,
    value_col: Column | None = None,
    rank_name: str = "_grk",
    cum_name: str = "_gcum",
    partitions: int | None = None,
):
    """Distributed global ROW_NUMBER (+ running SUM) — the two-pass
    prefix sum, with NO single-partition Exchange anywhere in the plan:

    1. range-partition on the order (parallel sampled exchange);
    2. rank/cumsum *within* each partition (windows partitioned by
       ``spark_partition_id()``, so every window is bounded);
    3. collect one (count, sum) row per partition — O(partitions)
       driver-side control plane, like a watermark read — compute
       exclusive prefix offsets, broadcast-join them back.

    Range partition i precedes j ⇒ every key in i sorts before j, so
    local rank + offset is the exact global ROW_NUMBER. Value sums
    should be decimal-cast by the caller for bit-exact totals.

    Returns ``(df, total_rows, total_sum)`` where df carries
    ``rank_name`` (bigint) and, when ``value_col`` given, ``cum_name``.
    The input must not already contain ``_pid``/offset temp columns.
    """
    spark = df.sparkSession
    P = partitions or spark.sparkContext.defaultParallelism
    part = df.repartitionByRange(P, *order_cols).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = W.partitionBy("_pid").orderBy(*order_cols)
    local = part.withColumn(rank_name, F.row_number().over(w))
    aggs = [F.count(F.lit(1)).alias("_n")]
    if value_col is not None:
        local = local.withColumn(
            "_lcum",
            F.sum(value_col).over(
                w.rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
        aggs.append(F.sum(value_col).alias("_s"))
    # localCheckpoint, not a bare persist(): the frame feeds both the
    # O(P) totals collect and the output plan, and a persist with no
    # unpersist pins cached partitions for the session's lifetime
    # (this helper runs in 6+ registered analytics queries)
    local = local.localCheckpoint()
    totals = sorted(
        local.groupBy("_pid").agg(*aggs).collect(), key=lambda r: r["_pid"]
    )
    run_n, run_s = 0, None
    offsets = []
    for row in totals:
        offsets.append((row["_pid"], run_n, run_s))
        run_n += row["_n"]
        if value_col is not None and row["_s"] is not None:
            run_s = row["_s"] if run_s is None else run_s + row["_s"]
    fields = [
        T.StructField("_pid", T.IntegerType()),
        T.StructField("_offn", T.LongType()),
    ]
    if value_col is not None:
        fields.append(T.StructField("_offs", local.schema["_lcum"].dataType))
    else:
        offsets = [(p, n) for p, n, _ in offsets]
    offs = spark.createDataFrame(offsets, T.StructType(fields))
    out = local.join(F.broadcast(offs), "_pid").withColumn(
        rank_name, (F.col(rank_name).cast("bigint") + F.col("_offn")).alias(rank_name)
    )
    drop = ["_pid", "_offn"]
    if value_col is not None:
        cum_t = local.schema["_lcum"].dataType
        out = out.withColumn(
            cum_name,
            (F.col("_lcum") + F.coalesce(F.col("_offs"), F.lit(0).cast(cum_t))).cast(
                cum_t
            ),
        )
        drop += ["_lcum", "_offs"]
    return out.drop(*drop), run_n, run_s


def ntile_from_rank(rk: Column, n: int, buckets: int = 5) -> Column:
    """Exact NTILE(buckets) reproduced arithmetically from a global rank
    (SQL-standard split: first ``n % buckets`` tiles get one extra row),
    so quintile scoring needs no single-partition window — pair with
    `global_rank_cumsum`."""
    q, r = divmod(n, buckets)
    boundary = r * (q + 1)
    big = F.ceil(rk / F.lit(q + 1))
    small = F.lit(r) + F.ceil((rk - F.lit(boundary)) / F.lit(max(q, 1)))
    # bigint to match SQL NTILE's return type (driver hash is type-aware)
    return F.when(F.lit(boundary) >= rk, big).otherwise(small).cast("bigint")


# SQL-side equivalents (same text works in Spark SQL and DuckDB).
def sql_dsum(expr: str, scale: int = 6) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 6) -> str:
    return f"({sql_dsum(expr, scale)} / COUNT({expr}))"
