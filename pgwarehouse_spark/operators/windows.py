"""Window-function surface (SURVEY.md §2-B "Window functions").

The reference's upsert-dedup is canonically `row_number() over
(partition by pk order by last_modified desc) = 1` (the semantics of
DuckDB `INSERT OR REPLACE`, reference duckdb_backend.py:192) and its
watermark is `max() over ()` (reference clickhouse_backend.py:210-227);
the full ranking/analytic/frame surface is provisioned via the warehouse.

Scale note: every window here partitions by a real key (customer, order)
— never `Window.partitionBy()` with no key, which would funnel 100 TB
through one task. Order keys always end with a unique column so ranks
are deterministic under any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ._helpers import t


@register(
    "window_rank",
    category="window",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS rnk,
           DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderstatus) AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    w_rn = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    w_rank = W.partitionBy("o_custkey").orderBy("o_orderstatus")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w_rn).cast("bigint").alias("rn"),
            F.rank().over(w_rank).cast("bigint").alias("rnk"),
            F.dense_rank().over(w_rank).cast("bigint").alias("drnk"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "window_lag_lead",
    category="window",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           LAG(o_totalprice) OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           LAG(o_totalprice, 2, -1.0) OVER w AS prev2_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.lag("o_totalprice").over(w).alias("prev_price"),
            F.lead("o_totalprice").over(w).alias("next_price"),
            F.lag("o_totalprice", 2, -1.0).over(w).alias("prev2_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "window_running_frame",
    category="window",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_spend,
           CAST(ROUND(AVG(o_totalprice)
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4)
                AS DOUBLE) AS moving_avg_3,
           MAX(o_totalprice)
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS running_max
    FROM orders
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_running_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running/moving aggregates with explicit ROWS frames. The running sum
    uses the decimal-exact pattern so it is reproducible across engines;
    the bounded moving average is rounded (3-term double sums are stable
    to ~1e-13 relative)."""
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .cast("double")
            .alias("running_spend"),
            F.round(
                F.avg("o_totalprice").over(w.rowsBetween(-2, W.currentRow)), 4
            ).alias("moving_avg_3"),
            F.max("o_totalprice")
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .alias("running_max"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "window_ntile_cumedist",
    category="window",
    oracle="""
    SELECT o_orderkey,
           NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS quartile,
           CAST(ROUND(PERCENT_RANK() OVER (ORDER BY o_totalprice, o_orderkey), 8) AS DOUBLE) AS pct_rank,
           CAST(ROUND(CUME_DIST() OVER (ORDER BY o_totalprice, o_orderkey), 8) AS DOUBLE) AS cdist
    FROM orders
    ORDER BY o_orderkey
    """,
)
def window_ntile_cumedist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions WITHOUT the single-partition window
    a bare `OVER (ORDER BY ...)` costs: the order key is unique (price,
    orderkey), so NTILE, PERCENT_RANK and CUME_DIST are all pure
    functions of (global rank, n) — rank comes from the two-pass
    distributed prefix sum (`global_rank_cumsum`), then
    quartile = ntile_from_rank(rk, n, 4), pct_rank = (rk-1)/(n-1),
    cume_dist = rk/n. Exact-int double division is bit-identical
    cross-engine; with ties in the order key you'd rank by the key
    prefix and take max(rk) per tie-group first."""
    from ._helpers import global_rank_cumsum, ntile_from_rank

    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    ranked, n, _ = global_rank_cumsum(
        o, [F.col("o_totalprice"), F.col("o_orderkey")]
    )
    rk = F.col("_grk")
    return (
        ranked.select(
            "o_orderkey",
            ntile_from_rank(rk, n, 4).alias("quartile"),
            # max(n-1, 1): SQL PERCENT_RANK of a single row is 0, while
            # a literal /0 would yield NULL
            F.round((rk - 1) / F.lit(max(n - 1, 1)), 8).alias("pct_rank"),
            F.round(rk / F.lit(max(n, 1)), 8).alias("cdist"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "topk_per_group",
    category="window",
    oracle="""
    SELECT c_mktsegment, o_orderkey, o_totalprice, rn FROM (
      SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                                ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rn <= 5
    ORDER BY c_mktsegment, rn
    """,
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group: window + filter. At scale Spark pushes a per-group
    rank limit (WindowGroupLimit) below the shuffle, so each partition
    only keeps K rows per group before exchanging."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 5)
        .orderBy("c_mktsegment", "rn")
    )


@register(
    "window_first_last",
    category="window",
    oracle="""
    SELECT DISTINCT l_orderkey,
           FIRST_VALUE(l_partkey) OVER w AS first_part,
           LAST_VALUE(l_partkey)  OVER w AS last_part,
           COUNT(*) OVER (PARTITION BY l_orderkey) AS n_lines
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_partkey, l_suppkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    ORDER BY l_orderkey
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    # (l_orderkey, l_linenumber) is NOT unique in this dataset — the order
    # key must include l_partkey/l_suppkey or first/last are tie-dependent.
    w = (
        W.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_partkey", "l_suppkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return (
        li.select(
            "l_orderkey",
            F.first("l_partkey").over(w).alias("first_part"),
            F.last("l_partkey").over(w).alias("last_part"),
            F.count(F.lit(1)).over(W.partitionBy("l_orderkey")).alias("n_lines"),
        )
        .distinct()
        .orderBy("l_orderkey")
    )


@register(
    "window_range_frame",
    category="window",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
             PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS trailing_1h_sum
    FROM events
    ORDER BY user_id, event_id
    """,
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame (value-based, not row-based): trailing one-hour sum of
    event values per user — peers at the same timestamp are always all
    included, so the result is deterministic even with ts ties (a ROWS
    frame would be order-dependent there). Frame bounds are exact epoch-
    MICROsecond offsets: second-granularity keys would truncate (Spark)
    vs round (DuckDB `CAST(epoch(ts) AS BIGINT)`) sub-second timestamps
    differently, shifting boundary rows in or out of the hour — caught
    at sf0.1 where timestamps are dense enough to land on boundaries.
    One shuffle on user_id."""
    e = t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        e.select(
            "user_id",
            "event_id",
            F.sum(F.col("value").cast("decimal(18,6)"))
            .over(w)
            .cast("double")
            .alias("trailing_1h_sum"),
        )
        .orderBy("user_id", "event_id")
    )


@register(
    "window_percent_nth",
    category="window",
    oracle="""
    SELECT o_custkey, o_orderkey,
           percent_rank() OVER w AS pr,
           nth_value(o_totalprice, 2) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_price
    FROM orders
    WHERE o_custkey <= 200
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    ORDER BY o_custkey, o_orderkey
    """,
)
def window_percent_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + nth_value — the remaining ranking/value window
    functions. The order key (o_orderkey) is unique within each
    customer partition, so both are deterministic; nth_value uses the
    full-partition frame (its default differs between engines, so the
    frame is explicit)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 200)
    w = W.partitionBy("o_custkey").orderBy("o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            F.percent_rank().over(w).alias("pr"),
            F.nth_value("o_totalprice", 2).over(wfull).alias("second_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "window_ignore_nulls_locf",
    category="window",
    oracle="""
    WITH sparse AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_id % 3 <> 0 THEN value END AS v
      FROM events WHERE user_id <= 40
    )
    SELECT event_id, user_id, v,
           LAST_VALUE(v IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_filled,
           LAG(v, 1 IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY ts, event_id) AS v_prev_known
    FROM sparse ORDER BY user_id, event_id
    """,
)
def window_ignore_nulls_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window navigation: last-observation-carried-forward
    over a sparse column (every third reading nulled deterministically so
    both engines see identical gaps) plus the previous known value (lag
    skipping nulls) — the sensor-reading/feature-store fill pattern. One
    shuffle at entity grain; the running frame is a single ordered pass."""
    e = t(spark, sf_dir, "events").filter(F.col("user_id") <= 40)
    sparse = e.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.col("event_id") % 3 != 0, F.col("value")).alias("v"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        sparse.select(
            "event_id",
            "user_id",
            "v",
            F.last("v", ignorenulls=True)
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
            .alias("v_filled"),
            F.expr(
                "lag(v, 1) IGNORE NULLS OVER "
                "(PARTITION BY user_id ORDER BY ts, event_id)"
            ).alias("v_prev_known"),
        )
        .orderBy("user_id", "event_id")
    )
