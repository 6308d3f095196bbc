"""As-of (point-in-time) join — an operator Spark lacks natively
(SURVEY.md §2-B joins row: "as-of via window trick").

Implemented as the union+window technique: interleave left and right
rows on the time axis, then `last_value(payload) IGNORE NULLS` over an
unbounded-preceding window per key carries the most recent right-side
row forward to each left row. This scales as ONE shuffle on
(key, time) — no per-row range probe, no cartesian expansion — and is
exactly how you'd do it on a 1000-executor cluster (compare
`pd.merge_asof`, which the per-group applyInPandas fallback would use).

The DuckDB oracle uses the same ANSI window construction, so the exact
semantics are pinned cross-engine. Ties: right rows at ts == left ts DO
match (side=0 sorts before side=1); among multiple right rows sharing
one timestamp, the LAST row in `__payload DESC` order wins — i.e. the
row with the LOWEST payload struct (for the events query: the lowest
event_id), because `last_value` keeps the final row of the sorted
frame, not the first. Both engines use the identical ORDER BY, so
cross-engine parity holds regardless of which extreme is kept.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ._helpers import t


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    right_payload: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Generic as-of join: for each left row, attach the latest right row
    with right_time <= left_time for the same `on` key.

    Both inputs are unioned into one stream; right rows sort before left
    rows at equal timestamps (side=0 < side=1) so `<=` semantics hold.
    """
    payload_struct = F.struct(*[F.col(c) for c in right_payload])
    r = right.select(
        F.col(on).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        payload_struct.alias("__payload"),
    )
    l = left.select(
        F.col(on).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__payload"].dataType).alias("__payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
    )
    unioned = r.select(
        "__key", "__t", "__side", "__payload", F.lit(None).cast(l.schema["__left"].dataType).alias("__left")
    ).unionByName(l)
    w = (
        W.partitionBy("__key")
        .orderBy("__t", "__side", F.col("__payload").desc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.withColumn(
        "__asof", F.last("__payload", ignorenulls=True).over(w)
    )
    out = carried.filter(F.col("__side") == 1).select(
        F.col("__left.*"),
        *[F.col(f"__asof.{c}").alias(f"{c}{suffix}") for c in right_payload],
    )
    return out


@register(
    "asof_join_events",
    category="asof",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    ), views AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
    ), unioned AS (
      SELECT user_id, ts, 0 AS side, event_id AS view_event_id,
             NULL::BIGINT AS purchase_event_id, NULL::DOUBLE AS purchase_value
      FROM views
      UNION ALL
      SELECT user_id, ts, 1 AS side, NULL, event_id, value FROM purchases
    ), carried AS (
      SELECT *,
             LAST_VALUE(view_event_id IGNORE NULLS) OVER (
               PARTITION BY user_id
               ORDER BY ts, side, view_event_id DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS last_view_id
      FROM unioned
    )
    SELECT purchase_event_id AS event_id, user_id, ts,
           purchase_value AS value, last_view_id
    FROM carried WHERE side = 1
    ORDER BY event_id
    """,
)
def asof_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each 'purchase' event: the most recent preceding (or
    simultaneous) 'view' event by the same user."""
    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    joined = asof_join(
        purchases,
        views,
        on="user_id",
        left_time="ts",
        right_time="ts",
        right_payload=["event_id"],
        suffix="_view",
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.col("event_id_view").alias("last_view_id"),
    ).orderBy("event_id")


@register(
    "asof_join_forward_tolerance",
    category="asof",
    oracle="""
    WITH views AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
    ), purchases AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    ), unioned AS (
      SELECT user_id, ts, 0 AS side, event_id AS view_event_id,
             NULL::BIGINT AS p_id, NULL::DOUBLE AS p_value, NULL::TIMESTAMP AS p_ts
      FROM views
      UNION ALL
      SELECT user_id, ts, 1, NULL, event_id, value, ts FROM purchases
    ), carried AS (
      SELECT *,
        FIRST_VALUE(p_id IGNORE NULLS) OVER w AS next_p_id,
        FIRST_VALUE(p_value IGNORE NULLS) OVER w AS next_p_value,
        FIRST_VALUE(p_ts IGNORE NULLS) OVER w AS next_p_ts
      FROM unioned
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, side, p_id
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT view_event_id AS event_id, user_id, ts,
           CASE WHEN next_p_ts <= ts + INTERVAL 1 HOUR THEN next_p_id END
             AS next_purchase_id,
           CASE WHEN next_p_ts <= ts + INTERVAL 1 HOUR THEN next_p_value END
             AS next_purchase_value
    FROM carried WHERE side = 0
    ORDER BY event_id
    """,
)
def asof_join_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with a tolerance window (conversion
    attribution): for each 'view', the NEXT 'purchase' by the same user
    within one hour — null if none. Same union+window plan as the
    backward as-of (one shuffle on (user, time), no range probe): the
    carry direction flips to first_value over CURRENT ROW → UNBOUNDED
    FOLLOWING, and the tolerance is a post-hoc null-out, so it costs
    nothing extra. Purchases tie-break by event_id ascending."""
    e = t(spark, sf_dir, "events")
    views = e.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    unioned = views.select(
        "user_id",
        "ts",
        F.lit(0).alias("side"),
        F.col("event_id").alias("view_event_id"),
        F.lit(None).cast("bigint").alias("p_id"),
        F.lit(None).cast("double").alias("p_value"),
        F.lit(None).cast("timestamp").alias("p_ts"),
    ).unionByName(
        purchases.select(
            "user_id",
            "ts",
            F.lit(1).alias("side"),
            F.lit(None).cast("bigint").alias("view_event_id"),
            F.col("event_id").alias("p_id"),
            F.col("value").alias("p_value"),
            F.col("ts").alias("p_ts"),
        )
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "side", "p_id")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    carried = unioned.select(
        "*",
        F.first("p_id", ignorenulls=True).over(w).alias("next_p_id"),
        F.first("p_value", ignorenulls=True).over(w).alias("next_p_value"),
        F.first("p_ts", ignorenulls=True).over(w).alias("next_p_ts"),
    )
    in_window = F.col("next_p_ts") <= F.col("ts") + F.expr("INTERVAL 1 HOUR")
    return (
        carried.filter(F.col("side") == 0)
        .select(
            F.col("view_event_id").alias("event_id"),
            "user_id",
            "ts",
            F.when(in_window, F.col("next_p_id")).alias("next_purchase_id"),
            F.when(in_window, F.col("next_p_value")).alias("next_purchase_value"),
        )
        .orderBy("event_id")
    )


@register(
    "asof_join_nearest",
    category="asof",
    oracle="""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), views AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
    ), unioned AS (
      SELECT user_id, ts, 0 AS side, event_id AS view_event_id, ts AS view_ts,
             NULL::BIGINT AS purchase_event_id
      FROM views
      UNION ALL
      SELECT user_id, ts, 1, NULL, NULL, event_id FROM purchases
    ), carried AS (
      SELECT *,
             LAST_VALUE(view_event_id IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, side, view_event_id DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS back_id,
             LAST_VALUE(view_ts IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, side, view_event_id DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS back_ts,
             FIRST_VALUE(view_event_id IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, side, view_event_id DESC
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
             ) AS fwd_id,
             FIRST_VALUE(view_ts IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, side, view_event_id DESC
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
             ) AS fwd_ts
      FROM unioned
    )
    SELECT purchase_event_id AS event_id, user_id, ts,
           CASE
             WHEN back_id IS NULL AND fwd_id IS NULL THEN NULL
             WHEN fwd_id IS NULL THEN back_id
             WHEN back_id IS NULL THEN fwd_id
             WHEN date_diff('microsecond', back_ts, ts)
                  <= date_diff('microsecond', ts, fwd_ts) THEN back_id
             ELSE fwd_id
           END AS nearest_view_id,
           CASE
             WHEN back_id IS NULL AND fwd_id IS NULL THEN NULL
             WHEN fwd_id IS NULL
               THEN -date_diff('microsecond', back_ts, ts)
             WHEN back_id IS NULL
               THEN date_diff('microsecond', ts, fwd_ts)
             WHEN date_diff('microsecond', back_ts, ts)
                  <= date_diff('microsecond', ts, fwd_ts)
               THEN -date_diff('microsecond', back_ts, ts)
             ELSE date_diff('microsecond', ts, fwd_ts)
           END AS nearest_delta_us
    FROM carried WHERE side = 1
    ORDER BY event_id
    """,
    doc="Nearest-in-time as-of join (direction-free): for each purchase, "
    "the closest 'view' by the same user in EITHER direction — backward "
    "candidate via the carry-forward window, forward candidate via the "
    "mirrored carry-backward window, then an arithmetic pick of the "
    "smaller |Δt| (ties → backward, matching pd.merge_asof "
    "direction='nearest'). Completes the as-of family (backward / "
    "forward+tolerance / nearest). Both windows share ONE (key, time) "
    "sort — a single shuffle, no range probe, no candidate expansion; "
    "deltas are integer microseconds so the pick is exact cross-engine. "
    "At equal timestamps a view counts as backward (side orders it "
    "before the purchase), so the tie rule is total.",
)
def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = e.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )
    r = views.select(
        F.col("user_id").alias("__key"),
        F.col("ts").alias("__t"),
        F.lit(0).alias("__side"),
        F.col("event_id").alias("view_event_id"),
        F.col("ts").alias("view_ts"),
        F.lit(None).cast("bigint").alias("purchase_event_id"),
    )
    l = purchases.select(
        F.col("user_id").alias("__key"),
        F.col("ts").alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("bigint").alias("view_event_id"),
        F.lit(None).cast("timestamp").alias("view_ts"),
        F.col("event_id").alias("purchase_event_id"),
    )
    unioned = r.unionByName(l)
    order = [F.col("__t"), F.col("__side"), F.col("view_event_id").desc()]
    w_back = (
        W.partitionBy("__key")
        .orderBy(*order)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_fwd = (
        W.partitionBy("__key")
        .orderBy(*order)
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    carried = unioned.select(
        "*",
        F.last("view_event_id", ignorenulls=True).over(w_back).alias("back_id"),
        F.last("view_ts", ignorenulls=True).over(w_back).alias("back_ts"),
        F.first("view_event_id", ignorenulls=True).over(w_fwd).alias("fwd_id"),
        F.first("view_ts", ignorenulls=True).over(w_fwd).alias("fwd_ts"),
    ).filter(F.col("__side") == 1)
    d_back = F.unix_micros(F.col("__t")) - F.unix_micros(F.col("back_ts"))
    d_fwd = F.unix_micros(F.col("fwd_ts")) - F.unix_micros(F.col("__t"))
    both_null = F.col("back_id").isNull() & F.col("fwd_id").isNull()
    pick_back = F.col("fwd_id").isNull() | (
        F.col("back_id").isNotNull() & (d_back <= d_fwd)
    )
    return carried.select(
        F.col("purchase_event_id").alias("event_id"),
        F.col("__key").alias("user_id"),
        F.col("__t").alias("ts"),
        F.when(both_null, F.lit(None).cast("bigint"))
        .when(pick_back, F.col("back_id"))
        .otherwise(F.col("fwd_id"))
        .alias("nearest_view_id"),
        F.when(both_null, F.lit(None).cast("bigint"))
        .when(pick_back, -d_back)
        .otherwise(d_fwd)
        .alias("nearest_delta_us"),
    ).orderBy("event_id")
