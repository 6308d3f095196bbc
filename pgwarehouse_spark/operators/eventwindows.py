"""Time-window aggregation over the ``events`` table: tumbling, sliding,
and session windows (SURVEY.md §2-B "Incremental / streaming" row).

These are the batch forms; the Structured Streaming forms (readStream +
withWatermark over the same window specs) live in
``pgwarehouse_spark.streaming`` and are tested by driving a memory-sink
stream to completion. Batch and stream share the window semantics, so
the DuckDB oracles here pin the streaming results too.

Scale notes: tumbling/sliding windows are pure groupBy on a derived key
(one shuffle, partial aggregation map-side). Session windows use the
lag+cumsum gap technique — one shuffle on user_id, no state explosion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ._helpers import sql_dsum, dsum, t, views

TUMBLE_MINUTES = 60
SLIDE_WIDTH_MIN = 120
SLIDE_STEP_MIN = 60
SESSION_GAP_MINUTES = 30


@register(
    "events_tumbling_window",
    category="events",
    oracle=f"""
    SELECT time_bucket(INTERVAL {TUMBLE_MINUTES} MINUTES, ts) AS wstart,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY wstart, event_type
    ORDER BY wstart, event_type
    """,
)
def events_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type. Uses F.window (the same
    construct Structured Streaming uses), projecting window.start."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window("ts", f"{TUMBLE_MINUTES} minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("wstart"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("wstart", "event_type")
    )


@register(
    "events_sliding_window",
    category="events",
    oracle=f"""
    WITH offsets AS (SELECT UNNEST([0, 1]) AS k),
    assigned AS (
      SELECT time_bucket(INTERVAL {SLIDE_STEP_MIN} MINUTES, e.ts)
               - k * (INTERVAL {SLIDE_STEP_MIN} MINUTES) AS wstart,
             e.value
      FROM events e, offsets
    )
    SELECT wstart, COUNT(*) AS n_events, {sql_dsum('value')} AS sum_value
    FROM assigned
    GROUP BY wstart ORDER BY wstart
    """,
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2-hour windows stepping hourly: each event lands in 2
    windows (F.window with slideDuration). The oracle replays the same
    assignment with an explicit offset cross join."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.window(
                "ts", f"{SLIDE_WIDTH_MIN} minutes", f"{SLIDE_STEP_MIN} minutes"
            ).alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n_events"), dsum("value").alias("sum_value"))
        .select(F.col("w.start").alias("wstart"), "n_events", "sum_value")
        .orderBy("wstart")
    )


@register(
    "events_sessionize",
    category="events",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts, event_id, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL {SESSION_GAP_MINUTES} MINUTES
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new_session
      FROM events
    ), sessions AS (
      SELECT *,
             SUM(is_new_session) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_seq
      FROM ordered
    )
    SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM sessions
    GROUP BY user_id, session_seq
    ORDER BY user_id, session_seq
    """,
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag-gap > 30min starts a new session; cumulative sum
    of boundaries numbers the sessions (ANSI-portable; the streaming form
    uses session_window in streaming/events.py)."""
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # Microsecond-exact gap (cast-to-long would truncate to seconds and
    # disagree with the oracle's µs-precise interval comparison).
    gap = F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)
    ordered = e.withColumn(
        "is_new_session",
        F.when(
            gap.isNull() | (gap > SESSION_GAP_MINUTES * 60 * 1_000_000), 1
        ).otherwise(0),
    )
    sessions = ordered.withColumn(
        "session_seq",
        F.sum("is_new_session").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .orderBy("user_id", "session_seq")
    )


@register(
    "events_rollup_multi_granularity",
    category="timeseries",
    oracle=f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           date_trunc('hour', ts) AS hour,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY GROUPING SETS (
      (date_trunc('day', ts), event_type),
      (date_trunc('day', ts), date_trunc('hour', ts), event_type)
    )
    ORDER BY day, hour, event_type
    """,
)
def events_rollup_multi_granularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate shape: one pass produces
    hourly AND daily rollups via GROUPING SETS (hour rows carry the day,
    day rows have hour NULL). Spark expands the sets in a single Expand +
    one shuffle — at 100 TB this halves the scan cost versus running the
    two rollups separately, which is exactly why time-series stores
    maintain multi-granularity aggregates this way."""
    views(spark, sf_dir, "events")
    return spark.sql(
        f"""
        SELECT date_trunc('day', ts) AS day,
               date_trunc('hour', ts) AS hour,
               event_type,
               COUNT(*) AS n_events,
               {sql_dsum('value')} AS sum_value
        FROM events
        GROUP BY GROUPING SETS (
          (date_trunc('day', ts), event_type),
          (date_trunc('day', ts), date_trunc('hour', ts), event_type)
        )
        ORDER BY day, hour, event_type
        """
    )


@register(
    "events_cohort_retention",
    category="events",
    oracle="""
    WITH f AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ),
    c AS (SELECT user_id, MIN(day) AS cohort_day FROM f GROUP BY user_id)
    SELECT c.cohort_day,
           CAST(f.day - c.cohort_day AS INTEGER) AS days_since,
           COUNT(*) AS n_users
    FROM f JOIN c ON f.user_id = c.user_id
    GROUP BY c.cohort_day, days_since
    ORDER BY c.cohort_day, days_since
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by their first active day,
    counted on each subsequent active day. The classic product-analytics
    triangle. Plan: one distinct over (user, day) — the fact collapses
    to user-day grain immediately — then the cohort MIN reuses the same
    user clustering; the join input is user-day-sized, never
    event-sized. At 100 TB of events the user-day distinct is the only
    big shuffle, and it's also the partial-aggregatable one."""
    e = t(spark, sf_dir, "events")
    f = e.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct()
    c = f.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        f.join(c, "user_id")
        .groupBy("cohort_day", F.datediff("day", "cohort_day").alias("days_since"))
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_day", "days_since")
    )


@register(
    "events_funnel",
    category="events",
    oracle="""
    WITH steps AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id
    )
    SELECT
      COUNT(*) AS n_users,
      CAST(SUM(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS step1_signup,
      CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_view > t_signup
                    THEN 1 ELSE 0 END) AS BIGINT) AS step2_viewed_after,
      CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_view > t_signup
                     AND t_purchase > t_view
                    THEN 1 ELSE 0 END) AS BIGINT) AS step3_purchased_after
    FROM steps
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (signup → first view after signup → first purchase
    after that view): per-user first-occurrence timestamps via
    conditional MIN — ONE shuffle at user grain, no self-joins, no
    sequence explosion (the naive funnel is an N-way self-join; this is
    the aggregation rewrite that scales). NULL comparisons drop
    un-reached steps automatically."""
    e = t(spark, sf_dir, "events")
    steps = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    s1 = F.col("t_signup").isNotNull()
    s2 = s1 & (F.col("t_view") > F.col("t_signup"))
    s3 = s2 & (F.col("t_purchase") > F.col("t_view"))
    return steps.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum(F.when(s1, 1).otherwise(0)).alias("step1_signup"),
        F.sum(F.when(s2, 1).otherwise(0)).alias("step2_viewed_after"),
        F.sum(F.when(s3, 1).otherwise(0)).alias("step3_purchased_after"),
    )


@register(
    "events_zscore_anomaly",
    category="events",
    oracle=f"""
    WITH stats AS (
      SELECT event_type,
             COUNT(value) AS n,
             {sql_dsum('value')} AS s1,
             {sql_dsum('value * value', 4)} AS s2
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           CASE WHEN n >= 2 AND (s2 - s1 * s1 / n) > 0
                THEN CAST(ROUND((e.value - s1 / n)
                      / SQRT((s2 - s1 * s1 / n) / (n - 1)), 6) AS DOUBLE)
           END AS zscore,
           CASE WHEN n >= 2 AND (s2 - s1 * s1 / n) > 0
                     AND ABS(ROUND((e.value - s1 / n)
                       / SQRT((s2 - s1 * s1 / n) / (n - 1)), 6)) > 2.0
                THEN 1 ELSE 0 END AS is_anomaly
    FROM events e JOIN stats USING (event_type)
    ORDER BY e.event_id
    """,
)
def events_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population z-score outlier flag per event_type. Group moments are
    computed once with order-independent decimal sums (see _helpers) so
    mean/stddev are bit-identical at any partition count, then broadcast
    back onto the fact rows — the event_type dimension is tiny, so the
    enrich join never shuffles the fact side. The variance uses the
    sum-of-squares identity (one pass, no second scan)."""
    e = t(spark, sf_dir, "events")
    stats = e.groupBy("event_type").agg(
        F.count("value").alias("n"),
        dsum("value").alias("s1"),
        dsum(F.col("value") * F.col("value"), 4).alias("s2"),
    )
    # one-row groups (n-1 = 0) and zero-variance groups are guarded:
    # under the session's ANSI mode the unguarded divide ABORTS the job
    # (and SQRT of a rounding-negative variance hard-errors in DuckDB),
    # where the defined answer is simply "no z-score for this group"
    mean = F.col("s1") / F.col("n")
    var_num = F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")
    ok = (F.col("n") >= 2) & (var_num > 0)
    sd = F.sqrt(var_num / (F.col("n") - 1))
    z = F.when(ok, F.round((F.col("value") - mean) / sd, 6))
    return (
        e.join(F.broadcast(stats), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            z.alias("zscore"),
            F.when(F.abs(z) > 2.0, 1).otherwise(0).alias("is_anomaly"),
        )
        .orderBy("event_id")
    )


@register(
    "events_gaps_islands",
    category="events",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    numbered AS (
      SELECT user_id, d,
             d - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d)
                      AS INTEGER) AS grp
      FROM days
    )
    SELECT user_id,
           MIN(d) AS island_start,
           MAX(d) AS island_end,
           CAST(COUNT(*) AS BIGINT) AS n_days
    FROM numbered GROUP BY user_id, grp
    ORDER BY user_id, island_start
    """,
)
def events_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: maximal runs of consecutive active days per user
    (the classic streak/retention-streak shape). Each distinct active day
    gets a per-user row number by date; `date - row_number` is constant
    exactly within a consecutive run, so grouping on it collapses each
    island to (start, end, length) with no self-join and no recursion.

    Scale: the distinct collapses events→user-days with map-side partial
    aggregation, so the one wide shuffle moves unique (user, day) pairs,
    not raw events. The window and island grouping re-key that already-
    deduplicated set (two more exchanges, each over ~active-days rows —
    audit shows 3 total); per-user window state is one row counter, so
    no skew unless a single user is active for decades."""
    e = t(spark, sf_dir, "events")
    days = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    rn = F.row_number().over(W.partitionBy("user_id").orderBy("d"))
    numbered = days.withColumn("grp", F.date_sub(F.col("d"), rn))
    return (
        numbered.groupBy("user_id", "grp")
        .agg(
            F.min("d").alias("island_start"),
            F.max("d").alias("island_end"),
            F.count(F.lit(1)).alias("n_days"),
        )
        .select("user_id", "island_start", "island_end", "n_days")
        .orderBy("user_id", "island_start")
    )


@register(
    "events_cumulative_distinct_users",
    category="events",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ),
    cum AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             COUNT(DISTINCT user_id) OVER (
               PARTITION BY event_type ORDER BY CAST(ts AS DATE)
             ) AS cum_users
      FROM events
      QUALIFY ROW_NUMBER() OVER (
        PARTITION BY event_type, CAST(ts AS DATE) ORDER BY event_id
      ) = 1
    )
    SELECT d.event_type, d.d, d.n_events, c.cum_users
    FROM daily d JOIN cum c USING (event_type, d)
    ORDER BY d.event_type, d.d
    """,
)
def events_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per event_type by day — COUNT(DISTINCT)
    OVER, which Spark's window functions reject outright. The rewrite:
    a user contributes to the running distinct count exactly once, on the
    day they first appear, so `min(first day) per (type,user)` → count of
    first-appearances per day → running SUM. The DuckDB oracle uses its
    native windowed DISTINCT aggregate, so the two engines cross-check
    genuinely different algorithms.

    Scale: both aggregations are map-side-combinable hash aggs (the naive
    windowed-distinct would carry a per-day user SET through the window —
    O(users) state per row); the running sum's window runs over ~days ×
    types rows, trivially small. The day-level join is broadcastable."""
    e = t(spark, sf_dir, "events")
    d = F.to_date("ts").alias("d")
    daily = e.groupBy("event_type", d).agg(F.count(F.lit(1)).alias("n_events"))
    first_seen = e.groupBy("event_type", "user_id").agg(
        F.min(F.to_date("ts")).alias("d")
    )
    new_by_day = first_seen.groupBy("event_type", "d").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("d")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    # Left-join onto the daily spine first: an active day where no NEW
    # user appeared still needs a row (carrying the running total).
    return (
        daily.join(new_by_day, ["event_type", "d"], "left")
        .withColumn("n_new", F.coalesce("n_new", F.lit(0)))
        .withColumn("cum_users", F.sum("n_new").over(w))
        .select("event_type", "d", "n_events", "cum_users")
        .orderBy("event_type", "d")
    )


@register(
    "events_rolling_active_users",
    category="events",
    oracle="""
    WITH days AS (
      SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events
    )
    SELECT d,
           COUNT(DISTINCT user_id) OVER (
             ORDER BY d RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
           ) AS wau
    FROM days
    QUALIFY ROW_NUMBER() OVER (PARTITION BY d ORDER BY user_id) = 1
    ORDER BY d
    """,
)
def events_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day active users (WAU per day) — a rolling-window
    DISTINCT, which unlike the cumulative case cannot be decomposed into
    first-appearance flags. The scalable rewrite: each deduplicated
    (user, day) activity contributes to the 7 window-days it falls in
    (explode a 7-element date sequence), then countDistinct per window
    day. The DuckDB oracle instead uses its native windowed DISTINCT over
    a RANGE frame — two genuinely different algorithms cross-checked.

    Scale: shuffle volume is 7× the deduplicated user-day set (NOT 7× the
    event stream — dedup happens map-side first), and the window width is
    a constant factor you pay in exchange for never materializing a
    per-day user set in window state. The day spine broadcast keeps
    phantom trailing days (a user's contribution past the last observed
    day) out without a shuffle."""
    e = t(spark, sf_dir, "events")
    days = e.select(F.to_date("ts").alias("d"), "user_id").distinct()
    spine = days.select(F.col("d").alias("spine_d")).distinct()
    contrib = days.select(
        F.explode(F.sequence(F.col("d"), F.date_add("d", 6))).alias("wd"),
        "user_id",
    )
    return (
        contrib.join(F.broadcast(spine), contrib.wd == spine.spine_d)
        .groupBy("spine_d")
        .agg(F.countDistinct("user_id").alias("wau"))
        .select(F.col("spine_d").alias("d"), "wau")
        .orderBy("d")
    )


@register(
    "events_winsorize_clip",
    category="events",
    oracle="""
    WITH bounds AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS lo,
             quantile_cont(value, 0.95) AS hi
      FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, e.value,
           LEAST(GREATEST(e.value, b.lo), b.hi) AS value_wins,
           CASE WHEN e.value < b.lo OR e.value > b.hi THEN 1 ELSE 0 END
             AS is_clipped
    FROM events e JOIN bounds b USING (event_type)
    ORDER BY e.event_id
    """,
)
def events_winsorize_clip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization: clamp each value to its event type's
    [p5, p95] band — the outlier treatment feature pipelines apply before
    scaling/training. Exact interpolated percentiles (bit-identical
    across engines, see agg_percentiles) computed once per group, then
    broadcast back onto the stream; the clamp itself is a pure JVM
    LEAST/GREATEST per row.

    Scale: same enrich shape as the z-score flag — the bounds table is
    |event_type| rows, so the fact side is never shuffled; the only
    wide operation is the percentile aggregation itself. If exact
    percentiles get too hot at 100 TB, swap approx_percentile into the
    bounds CTE — the enrich plan is unchanged."""
    e = t(spark, sf_dir, "events")
    bounds = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        e.join(F.broadcast(bounds), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            clipped.alias("value_wins"),
            F.when(
                (F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")), 1
            )
            .otherwise(0)
            .alias("is_clipped"),
        )
        .orderBy("event_id")
    )


_SKETCH_ROLLUP_REL_ERR = 0.02  # matches the tests' 2% envelope


@register(
    "events_distinct_rollup_sketch",
    category="events",
    oracle=f"""
    SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
           COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS within_bounds
    FROM events
    GROUP BY 1 ORDER BY week_start
    """,
    doc="Mergeable-sketch distinct rollup, registered as a bounded-error "
    "verdict (the agg_approx_distinct pattern): DuckDB cannot reproduce "
    "the DataSketches HLL binary, so the query emits the EXACT per-week "
    "distinct-user counts (hash-matched cross-engine) plus "
    f"within_bounds = |sketch_est - exact|/exact <= {_SKETCH_ROLLUP_REL_ERR} "
    "computed in Spark, pinned to literal TRUE by the oracle. Tests "
    "additionally pin merged-of-daily == direct-per-week exactly "
    "(register-max merge is associative/commutative).",
)
def events_distinct_rollup_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered verdict wrapper over `events_distinct_rollup_estimates`."""
    wk = t(spark, sf_dir, "events").select(
        F.date_trunc("week", F.col("ts")).cast("date").alias("week_start"),
        "user_id",
    )
    rolled = events_distinct_rollup_estimates(spark, sf_dir)
    # Verdict join: the exact per-week distinct count (what the SQL
    # oracle reproduces) + the sketch's bounded-error claim. The exact
    # branch is one extra distinct-agg pass at verification scale; a
    # production rollup ships only the estimates frame.
    exact = wk.groupBy("week_start").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    rel_err = (
        F.abs(F.col("est_users") - F.col("exact_users"))
        / F.col("exact_users")
    )
    return (
        rolled.join(exact, "week_start")
        .select(
            "week_start",
            "n_days",
            "exact_users",
            (rel_err <= _SKETCH_ROLLUP_REL_ERR).alias("within_bounds"),
        )
        .orderBy("week_start")
    )


def events_distinct_rollup_estimates(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental distinct-count maintenance via mergeable HLL sketches:
    build one sketch per (week, day), then roll weeks up by UNIONING the
    daily sketches — never re-touching the raw events. This is the only
    way a continuously-maintained rollup can serve distinct counts at
    100 TB: exact countDistinct cannot merge across refreshes (distinct
    state is data-sized), while sketches are a few KB each, additive, and
    re-aggregable to any coarser granularity (day→week→month) for free.

    Scale: pass 1 partial-aggregates sketches map-side (register-max is
    commutative); the rollup shuffles O(days) sketch blobs, not user
    sets. Estimates are deterministic at any partition count because the
    merged register state is identical whatever the merge order."""
    e = t(spark, sf_dir, "events")
    # week key = the week's Monday DATE (date_trunc), not weekofyear alone:
    # a bare ISO week number merges same-numbered weeks across years and
    # mislabels early-January days that belong to week 52/53 of the prior
    # ISO year. A week-start date is unambiguous at any time span.
    wk = e.select(
        F.date_trunc("week", F.col("ts")).cast("date").alias("week_start"),
        F.to_date("ts").alias("d"),
        "user_id",
    )
    daily = wk.groupBy("week_start", "d").agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk")
    )
    rolled = daily.groupBy("week_start").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est_users"),
    )
    return rolled


_QSK_SUB = 8  # log-grid sub-buckets per e-fold → ≤ e^(1/8)-1 ≈ 13.3% rel err
_QSK_REL_ERR = 0.15  # verdict envelope (grid bound + interpolation slack)


def events_quantile_rollup_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable QUANTILE maintenance — the percentile sibling of the
    HLL distinct rollup: per (week, day) build a fixed log-grid
    histogram over `value` (bucket = floor(ln(value)·8), a few hundred
    bigint counters — the poor man's KLL/t-digest with engine-exact
    determinism), then roll days to weeks by SUMMING bucket counts —
    integer vector addition, associative/commutative/re-aggregable to
    any coarser granularity without touching raw events. Exact
    percentiles cannot do this (percentile state is data-sized), which
    is why every 100 TB latency/size dashboard ships on mergeable
    sketches. Estimate for percentile p = geometric midpoint of the
    first bucket whose cumulative count reaches ceil(p·total); the log
    grid bounds relative error by e^(1/8)-1 regardless of the value
    distribution's scale.

    Scale: pass 1 partial-aggregates (week, day, bucket) counts
    map-side; the rollup shuffles O(weeks·buckets) counter rows, not
    values. Returns (week_start, n_days, n_events, p50_est, p90_est)."""
    e = t(spark, sf_dir, "events")
    # clamp below at 1e-12 so zero/negative/NULL values keep a (lowest)
    # bucket instead of a NULL that would drop them from the histogram —
    # the verdict's n_events == COUNT(*) match depends on zero row loss
    clamped = F.greatest(F.coalesce(F.col("value"), F.lit(0.0)), F.lit(1e-12))
    wk = e.select(
        F.date_trunc("week", F.col("ts")).cast("date").alias("week_start"),
        F.to_date("ts").alias("d"),
        F.floor(F.log(clamped) * _QSK_SUB).cast("bigint").alias("bucket"),
    )
    daily = wk.groupBy("week_start", "d", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )
    weekly = daily.groupBy("week_start", "bucket").agg(F.sum("n").alias("n"))
    n_days = (
        daily.select("week_start", "d")
        .distinct()
        .groupBy("week_start")
        .agg(F.count(F.lit(1)).alias("n_days"))
    )
    w_cum = W.partitionBy("week_start").orderBy("bucket")
    cum = weekly.withColumn("cum", F.sum("n").over(w_cum)).withColumn(
        "total", F.sum("n").over(W.partitionBy("week_start"))
    )

    def _est(p: float, name: str):
        b = F.min(
            F.when(
                F.col("cum") >= F.ceil(F.lit(p) * F.col("total")), F.col("bucket")
            )
        )
        return F.exp((b + 0.5) / _QSK_SUB).alias(name)

    est = cum.groupBy("week_start").agg(
        F.max("total").alias("n_events"),
        _est(0.5, "p50_est"),
        _est(0.9, "p90_est"),
    )
    return est.join(n_days, "week_start").select(
        "week_start", "n_days", "n_events", "p50_est", "p90_est"
    )


@register(
    "events_quantile_rollup_sketch",
    category="events",
    oracle="""
    SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
           CAST(COUNT(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS n_days,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           TRUE AS p50_ok, TRUE AS p90_ok
    FROM events GROUP BY 1 ORDER BY week_start
    """,
    doc="Mergeable log-grid quantile rollup, registered as a "
    "bounded-error verdict (the HLL-rollup pattern): exact per-week "
    "day/event counts hash-match cross-engine — n_events comes FROM THE "
    "MERGED SKETCH, proving the histogram lost no rows — and p50/p90 "
    "estimate-vs-exact relative errors, computed in Spark against exact "
    "percentile(), are pinned within the grid's error bound as literal "
    "TRUE. Merged-of-daily == direct-weekly is pinned exactly in "
    "tests/test_determinism.py.",
)
def events_quantile_rollup_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered verdict wrapper over `events_quantile_rollup_estimates`."""
    est = events_quantile_rollup_estimates(spark, sf_dir)
    e = t(spark, sf_dir, "events")
    exact = (
        e.select(
            F.date_trunc("week", F.col("ts")).cast("date").alias("week_start"),
            "value",
        )
        .groupBy("week_start")
        .agg(
            F.expr("percentile(value, 0.5)").alias("p50x"),
            F.expr("percentile(value, 0.9)").alias("p90x"),
        )
    )
    ok = lambda a, b: (F.abs(F.col(a) - F.col(b)) / F.col(b) <= _QSK_REL_ERR)  # noqa: E731
    return (
        est.join(exact, "week_start")
        .select(
            "week_start",
            F.col("n_days").cast("bigint").alias("n_days"),
            F.col("n_events").cast("bigint").alias("n_events"),
            ok("p50_est", "p50x").alias("p50_ok"),
            ok("p90_est", "p90x").alias("p90_ok"),
        )
        .orderBy("week_start")
    )


@register(
    "events_markov_transitions",
    category="events",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS prev_type
      FROM events
    ),
    trans AS (
      SELECT prev_type, event_type AS next_type,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, next_type
    )
    SELECT prev_type, next_type, n,
           CAST(n AS DOUBLE)
             / SUM(n) OVER (PARTITION BY prev_type) AS p
    FROM trans ORDER BY prev_type, next_type
    """,
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current), the behavioral-model /
    next-action-prediction primitive. lag() pairs each event with its
    predecessor in one pass; a count + per-row normalization yields the
    row-stochastic matrix.

    Scale: the only event-sized operation is the lag window, partitioned
    by user_id (high cardinality, one-row state). The transition counts
    collapse to |types|² rows before the normalizing window, so the
    second window is over a handful of rows. The division n/Σn is the
    same double expression both engines — bit-identical."""
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
    wp = W.partitionBy("prev_type")
    return (
        trans.withColumn("p", F.col("n").cast("double") / F.sum("n").over(wp))
        .select("prev_type", "next_type", "n", "p")
        .orderBy("prev_type", "next_type")
    )


@register(
    "events_session_window_native",
    category="events",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, ts, event_id,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL {SESSION_GAP_MINUTES} MINUTES
                  OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    s AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS seq
      FROM ordered
    )
    SELECT user_id,
           MIN(ts) AS wstart,
           MAX(ts) + INTERVAL {SESSION_GAP_MINUTES} MINUTES AS wend,
           COUNT(*) AS n_events
    FROM s GROUP BY user_id, seq
    ORDER BY user_id, wstart
    """,
)
def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's NATIVE session_window aggregation — the
    exact construct the streaming form uses (gap-merged dynamic windows,
    window end = last event + gap). The lag+cumsum twin
    (events_sessionize) is the ANSI-portable form; this one exercises
    Spark's dedicated operator, and the oracle replays its half-open
    boundary semantics (an event exactly at last_ts + gap starts a NEW
    session, hence >= in the oracle's gap test, vs > in the lag form).

    Scale: session_window aggregates partially map-side (partial session
    merge) before one exchange on user_id — the same one-shuffle shape
    as the window rewrite, but with the merge logic inside the
    aggregation operator, which is what lets the IDENTICAL code run
    under Structured Streaming with watermark-driven state eviction."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.session_window("ts", f"{SESSION_GAP_MINUTES} minutes").alias("w"),
            "user_id",
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "n_events",
        )
        .orderBy("user_id", "wstart")
    )


@register(
    "audit_fk_orphans",
    category="sync",
    oracle="""
    SELECT 'lineitem->orders' AS fk,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
             WHERE NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) AS n_orphans,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_rows
    UNION ALL
    SELECT 'orders->customer',
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders o
             WHERE NOT EXISTS (SELECT 1 FROM customer c
                               WHERE c.c_custkey = o.o_custkey)),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM orders)
    ORDER BY fk
    """,
)
def audit_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit: orphan counts for each declared FK
    edge (child rows whose parent key is missing) — the data-quality
    check a warehouse runs after every load, and the one the reference's
    blind append loop structurally needs (a late-arriving child can land
    before its parent).

    Scale: each edge is a LEFT ANTI join — parent side reduced to its
    key column (column pruning) and broadcast when it fits, so the child
    table is scanned once per edge with no shuffle; the result is one
    row per edge. Anti join is also null-safe where NOT IN is not."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = t(spark, sf_dir, "customer").select("c_custkey")

    def edge(name: str, child: DataFrame, parent: DataFrame, ck: str, pk: str) -> DataFrame:
        # no explicit broadcast hint: a forced broadcast of the parent key
        # set is a driver-OOM risk at scale (orders/customer keys can be
        # huge). autoBroadcastJoinThreshold + AQE pick broadcast only when
        # the pruned key column actually fits.
        orphans = child.join(
            parent, child[ck] == parent[pk], "left_anti"
        ).agg(F.count(F.lit(1)).alias("n_orphans"))
        total = child.agg(F.count(F.lit(1)).alias("n_rows"))
        return orphans.crossJoin(total).select(
            F.lit(name).alias("fk"), "n_orphans", "n_rows"
        )

    return (
        edge("lineitem->orders", li, o.select("o_orderkey"), "l_orderkey", "o_orderkey")
        .unionAll(
            edge("orders->customer", o.select("o_custkey"), c, "o_custkey", "c_custkey")
        )
        .orderBy("fk")
    )


@register(
    "events_props_extract",
    category="events",
    oracle="""
    WITH typed AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS INT) AS k,
             CAST(json_extract_string(props, '$.missing') AS INT) AS absent
      FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(k) AS BIGINT) AS n_with_k,
           CAST(COUNT(absent) AS BIGINT) AS n_with_missing,
           CAST(MIN(k) AS INT) AS k_min,
           CAST(MAX(k) AS INT) AS k_max,
           CAST(SUM(k) AS BIGINT) AS k_sum,
           CAST(SUM(k) AS DOUBLE) / COUNT(k) AS k_avg
    FROM typed
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured property extraction: pull typed fields out of the
    JSON ``props`` column (the event-payload pattern every product
    analytics source ships) and aggregate them per event type —
    including the count of a property that does NOT exist, pinning
    missing-key → NULL semantics cross-engine.

    Scale: get_json_object compiles to Spark's JVM JSON path evaluator
    inside whole-stage codegen — a single-pass projection, no Python,
    no UDF; the aggregate is a standard partial/final hash agg on
    event_type (map-side combine shrinks the shuffle to
    n_event_types × partitions rows). For repeated multi-field
    extraction at 100 TB, promote to from_json with an explicit schema
    once and prune columns at the scan (the `scalar_from_json` query
    pins that variant); integer sums keep the oracle exact."""
    e = t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    absent = F.get_json_object("props", "$.missing").cast("int")
    typed = e.select("event_type", k.alias("k"), absent.alias("absent"))
    return (
        typed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.count("absent").alias("n_with_missing"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.sum("k").alias("k_sum"),
            (F.sum("k").cast("double") / F.count("k")).alias("k_avg"),
        )
        .orderBy("event_type")
    )


_EWMA_ALPHA = 0.3
_EWMA_BETA = 1 - _EWMA_ALPHA  # both engines fold with these exact doubles


@register(
    "events_ewma_smoothing",
    category="events",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY event_type, date_trunc('day', ts)
    ),
    seqs AS (
      SELECT event_type,
             list(day ORDER BY day) AS days,
             list(CAST(n_events AS DOUBLE) ORDER BY day) AS xs,
             list(n_events ORDER BY day) AS ns
      FROM daily GROUP BY event_type
    ),
    unrolled AS (
      SELECT event_type, days, xs, ns,
             unnest(generate_series(1, len(xs))) AS t
      FROM seqs
    )
    SELECT event_type,
           CAST(days[t] AS TIMESTAMP) AS day,
           ns[t] AS n_events,
           list_reduce(
             list_slice(xs, 1, t),
             (acc, x) -> CAST({_EWMA_ALPHA!r} AS DOUBLE) * x
                         + CAST({_EWMA_BETA!r} AS DOUBLE) * acc
           ) AS ewma
    FROM unrolled
    ORDER BY event_type, day
    """,
)
def events_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of the daily event volume
    per type (s_1 = x_1; s_t = a*x_t + (1-a)*s_[t-1], a={alpha}) —
    the standard smoothing/short-horizon-forecast primitive a metrics
    pipeline layers on the warehouse (`ewma` at the last day IS the
    one-step forecast; pair with events_zscore_anomaly for control
    bands).

    Scale: the recurrence is inherently sequential per series, so each
    series' history is collected into ONE array (bounded by days — a
    few thousand elements even for a decade) and folded with JVM array
    lambdas; parallelism is the series count, and nothing row-grained
    shuffles after the daily pre-aggregation (map-side combined). The
    per-day prefix folds re-reduce the slice (O(days²) per series —
    at typical day counts cheaper than materializing state); for very
    long series switch to per-year segment folds carried forward.
    Determinism: both engines fold identical IEEE doubles in identical
    day order, so the EWMA stream hash-matches bit-for-bit."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    seqs = daily.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(F.struct("day", "n_events"))
        ).alias("seq")
    )
    unrolled = seqs.select(
        "event_type",
        F.expr("transform(seq, s -> CAST(s.n_events AS DOUBLE))").alias("xs"),
        F.posexplode(F.col("seq")).alias("p", "s"),
    )
    ewma = F.expr(
        f"aggregate(slice(xs, 2, p), xs[0], "
        f"(acc, x) -> CAST({_EWMA_ALPHA!r} AS DOUBLE) * x"
        f" + CAST({_EWMA_BETA!r} AS DOUBLE) * acc)"
    )
    return (
        unrolled.select(
            "event_type",
            F.col("s.day").alias("day"),
            F.col("s.n_events").alias("n_events"),
            ewma.alias("ewma"),
        )
        .orderBy("event_type", "day")
    )


events_ewma_smoothing.__doc__ = events_ewma_smoothing.__doc__.replace(
    "{alpha}", str(_EWMA_ALPHA)
)


@register(
    "audit_value_constraints",
    category="sync",
    oracle="""
    WITH li AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 50
                           THEN 0 ELSE 1 END) AS BIGINT) AS v_qty,
             CAST(SUM(CASE WHEN l_discount BETWEEN 0.0 AND 0.1
                           THEN 0 ELSE 1 END) AS BIGINT) AS v_disc,
             CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS v_ship
      FROM lineitem
    ),
    o AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN o_orderstatus IN ('O', 'F', 'P')
                           THEN 0 ELSE 1 END) AS BIGINT) AS v_status,
             CAST(SUM(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END)
                  AS BIGINT) AS v_price
      FROM orders
    )
    SELECT * FROM (
      SELECT 'lineitem' AS table_name, 'quantity_range' AS constraint_name,
             n AS n_rows, v_qty AS n_violations,
             CAST(v_qty AS DOUBLE) / n AS violation_rate FROM li
      UNION ALL
      SELECT 'lineitem', 'discount_range', n, v_disc,
             CAST(v_disc AS DOUBLE) / n FROM li
      UNION ALL
      SELECT 'lineitem', 'shipdate_not_null', n, v_ship,
             CAST(v_ship AS DOUBLE) / n FROM li
      UNION ALL
      SELECT 'orders', 'status_enum', n, v_status,
             CAST(v_status AS DOUBLE) / n FROM o
      UNION ALL
      SELECT 'orders', 'totalprice_positive', n, v_price,
             CAST(v_price AS DOUBLE) / n FROM o
    ) ORDER BY table_name, constraint_name
    """,
)
def audit_value_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-contract audit: declarative value constraints (range, enum,
    not-null) evaluated as conditional aggregates — the post-load gate
    that catches a source schema drift or a bad extract before it
    propagates (complements audit_fk_orphans' referential checks and
    profile_columns' unconstrained stats).

    Scale: ALL of a table's constraints evaluate in ONE scan (each is a
    conditional sum, map-side combined into a single aggregate row), so
    cost is scans-per-table, not scans-per-constraint; output is one
    row per constraint. Adding a constraint is adding a column
    expression — no new pass."""
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders")

    def viol(cond):
        return F.sum(F.when(cond, 0).otherwise(1)).cast("bigint")

    li_agg = li.agg(
        F.count(F.lit(1)).alias("n"),
        viol(F.col("l_quantity").between(1, 50)).alias("v_qty"),
        viol(F.col("l_discount").between(0.0, 0.1)).alias("v_disc"),
        F.sum(F.when(F.col("l_shipdate").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("v_ship"),
    )
    o_agg = o.agg(
        F.count(F.lit(1)).alias("n"),
        viol(F.col("o_orderstatus").isin("O", "F", "P")).alias("v_status"),
        viol(F.col("o_totalprice") > 0).alias("v_price"),
    )

    def row(src, tbl, cname, vcol):
        return src.select(
            F.lit(tbl).alias("table_name"),
            F.lit(cname).alias("constraint_name"),
            F.col("n").alias("n_rows"),
            F.col(vcol).alias("n_violations"),
            (F.col(vcol).cast("double") / F.col("n")).alias("violation_rate"),
        )

    return (
        row(li_agg, "lineitem", "quantity_range", "v_qty")
        .unionAll(row(li_agg, "lineitem", "discount_range", "v_disc"))
        .unionAll(row(li_agg, "lineitem", "shipdate_not_null", "v_ship"))
        .unionAll(row(o_agg, "orders", "status_enum", "v_status"))
        .unionAll(row(o_agg, "orders", "totalprice_positive", "v_price"))
        .orderBy("table_name", "constraint_name")
    )


# ---------------------------------------------------------------------------
# Rolling median (order-statistic window)
# ---------------------------------------------------------------------------

_ROLLMED_PRECEDING = 6  # current row + 6 preceding = 7-row window


@register(
    "events_rolling_median",
    category="events",
    oracle=f"""
    SELECT event_id, event_type, value,
           ROUND(quantile_cont(value, 0.5) OVER (
             PARTITION BY event_type ORDER BY ts, event_id
             ROWS BETWEEN {_ROLLMED_PRECEDING} PRECEDING AND CURRENT ROW
           ), 8) AS rolling_median
    FROM events
    ORDER BY event_type, ts, event_id
    """,
    doc="Rolling median of event values over a 7-row trailing window per "
    "event-type series — the robust (outlier-immune) smoother that "
    "complements events_ewma_smoothing's mean-based one.",
)
def events_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-statistic window: `percentile(value, 0.5)` as a window
    aggregate over a bounded ROWS frame (Spark evaluates the exact
    interpolated percentile per frame; DuckDB's quantile_cont is the
    identical definition, and the 8-dp round absorbs the at-most-1-ulp
    a+f*(b-a) associativity difference).

    Scale: the frame is ROWS-bounded (7 rows), so state per window
    position is O(1) and the only shuffle is the hash partition on
    event_type; the per-partition sort is the same one every window in
    the series shares. A RANGE/time-bounded variant swaps the frame
    spec, same plan. Order keys (ts, event_id) are unique per series,
    so results are total-order deterministic."""
    e = t(spark, sf_dir, "events")
    w = (
        W.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-_ROLLMED_PRECEDING, 0)
    )
    return e.select(
        "event_id",
        "event_type",
        "value",
        F.round(F.expr("percentile(value, 0.5)").over(w), 8).alias(
            "rolling_median"
        ),
        "ts",
    ).orderBy("event_type", "ts", "event_id").drop("ts")


@register(
    "events_bitmap_distinct_rollup",
    category="events",
    oracle="""
    SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start,
           COUNT(DISTINCT CAST(ts AS DATE)) AS n_days,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY 1 ORDER BY week_start
    """,
    doc="EXACT mergeable distinct rollup via bitmaps: daily "
    "(bucket-sharded) user bitmaps OR-merge into weekly bitmaps — the "
    "integer-key companion to events_distinct_rollup_sketch that trades "
    "HLL's fixed few-KB state for exactness at O(range/8) bits. Unlike "
    "the sketch the result hash-matches COUNT(DISTINCT) directly.",
)
def events_bitmap_distinct_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct maintenance that still merges like a sketch:
    bitmap_construct_agg builds one bitmap per (week, day, 32k-bucket)
    map-side; the week rollup is bitmap_or_agg per bucket (associative/
    commutative — register-OR, order- and partition-independent) and the
    final count sums bitmap_count over buckets. Nothing ever re-touches
    raw events at rollup time, and unlike HLL the counts are exact —
    the right tool when keys are dense integers (user ids, FK
    surrogates): a 1e9-id space is ~30.5k buckets × 4 KB = manageable,
    partitioned by bucket. For sparse/string keys the sketch variant
    stays the scale path."""
    e = t(spark, sf_dir, "events")
    wk = e.select(
        F.date_trunc("week", F.col("ts")).cast("date").alias("week_start"),
        F.to_date("ts").alias("d"),
        "user_id",
    )
    daily = wk.groupBy(
        "week_start",
        "d",
        F.expr("bitmap_bucket_number(user_id)").alias("bkt"),
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm")
    )
    weekly_buckets = daily.groupBy("week_start", "bkt").agg(
        F.expr("bitmap_or_agg(bm)").alias("bm")
    )
    counts = weekly_buckets.groupBy("week_start").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("n_users")
    )
    # day spine from the daily bitmap frame (NOT per bucket — a single
    # bucket need not span every active day of the week)
    days = daily.groupBy("week_start").agg(F.countDistinct("d").alias("n_days"))
    return (
        days.join(counts, "week_start")
        .select("week_start", "n_days", "n_users")
        .orderBy("week_start")
    )


# ---------------------------------------------------------------------------
# Path analysis and audience overlap
# ---------------------------------------------------------------------------

_PATH_LEN = 3  # first N event types of each user journey
_PATH_TOP = 25


@register(
    "events_top_paths",
    category="events",
    oracle=f"""
    WITH ordered AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS rn
      FROM events
    ),
    paths AS (
      SELECT user_id,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM ordered WHERE rn <= {_PATH_LEN}
      GROUP BY user_id
    )
    SELECT path, COUNT(*) AS n_users FROM paths
    GROUP BY path
    ORDER BY n_users DESC, path
    LIMIT {_PATH_TOP}
    """,
    doc="Top user journeys: the first 3 event types of every user's "
    "ordered stream, concatenated into a path string and ranked by "
    "frequency — the funnel-discovery / Sankey-source query.",
)
def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis without per-user state explosion: one window ranks
    each user's stream (hash shuffle on user_id, the series sort every
    per-user operator shares), the head-N rows aggregate into an
    ordered path string via sort_array over (rn, type) structs —
    deterministic regardless of partitioning — and the path histogram
    partial-aggregates map-side. Path cardinality is bounded by
    |event_types|^N, not user count, so the final rank is TakeOrdered
    over a small relation."""
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    heads = (
        e.select("user_id", "event_type", "ts", "event_id")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _PATH_LEN)
    )
    paths = heads.groupBy("user_id").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("rn", "event_type"))
                ),
                lambda s: s["event_type"],
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy(F.col("n_users").desc(), "path")
        .limit(_PATH_TOP)
    )


@register(
    "events_audience_overlap",
    category="events",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           COUNT(*) AS n_both
    FROM ut a JOIN ut b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY type_a, type_b
    ORDER BY type_a, type_b
    """,
    doc="Audience overlap matrix: distinct users shared by every pair of "
    "event types — the segment-intersection query behind campaign "
    "overlap and cohort Venn reports.",
)
def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlap from the DISTINCT (user, type) relation, never raw
    events: the distinct collapse is the only event-sized shuffle; the
    self-join then pairs each user's type set with itself — per-user
    fan-out is bounded by |event_types|² (constant), so the join output
    is O(users · types²), independent of event volume. The same shape
    scales to bitmap/sketch intersections when the pair matrix itself
    gets large."""
    e = t(spark, sf_dir, "events")
    ut = e.select("user_id", "event_type").distinct()
    a = ut.alias("a")
    b = ut.alias("b")
    return (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
        .orderBy("type_a", "type_b")
    )


@register(
    "events_mad_outliers",
    category="events",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, ABS(e.value - m.med) AS d
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(d, 0.5) AS mad FROM dev
      GROUP BY event_type
    )
    SELECT d.event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN m.mad > 0 AND d.d / (1.4826 * m.mad) > 3.0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           md.med, m.mad
    FROM dev d
    JOIN mad m USING (event_type)
    JOIN med md USING (event_type)
    GROUP BY d.event_type, md.med, m.mad
    ORDER BY d.event_type
    """,
    doc="Robust (median/MAD) outlier detection per event-type series — "
    "the heavy-tail-safe companion to events_zscore_anomaly: median and "
    "MAD are immune to the very outliers being hunted, where mean/std "
    "are dragged by them.",
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two exact-percentile aggregations (median, then median absolute
    deviation) with the per-group scalars broadcast back onto the
    stream — the same enrich shape as winsorize/z-score, so the fact
    side never shuffles; robust_z = dev/(1.4826*mad) is evaluated with
    the identical expression order in both engines (Spark percentile ≡
    DuckDB quantile_cont bit-for-bit, see events_winsorize_clip)."""
    e = t(spark, sf_dir, "events")
    med = e.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    # dev feeds BOTH the MAD percentile and the flagging pass —
    # un-checkpointed, the scan + median aggregate + enrich join ran
    # twice (guide §3.3). The materialization is three narrow columns;
    # measured ~15% at sf0.1.
    dev = (
        e.join(F.broadcast(med), "event_type")
        .select(
            "event_type", F.abs(F.col("value") - F.col("med")).alias("d"), "med"
        )
        .localCheckpoint()
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(d, 0.5)").alias("mad")
    )
    flagged = dev.join(F.broadcast(mad), "event_type")
    # mad = 0 whenever >= half a group's values equal its median
    # (routine for integer/zero-inflated metrics) — the unguarded
    # divide ABORTS under ANSI mode; the robust convention is that a
    # zero-MAD group flags nothing (its spread is degenerate, not wide)
    outlier = (F.col("mad") > 0) & (
        F.col("d") / (F.lit(1.4826) * F.col("mad")) > 3.0
    )
    return (
        flagged.groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(outlier, 1).otherwise(0)).alias("n_outliers"),
        )
        .select("event_type", "n", "n_outliers", "med", "mad")
        .orderBy("event_type")
    )


@register(
    "events_audience_overlap_sketch",
    category="events",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
    SELECT a.event_type AS type_a, b.event_type AS type_b,
           COUNT(*) AS exact_both,
           TRUE AS within_bounds
    FROM ut a JOIN ut b
      ON a.user_id = b.user_id AND a.event_type < b.event_type
    GROUP BY type_a, type_b
    ORDER BY type_a, type_b
    """,
    doc="Sketch-algebra audience overlap, registered as a bounded-error "
    "verdict (the agg_approx_distinct pattern): intersection sizes from "
    "HLL sketches via inclusion-exclusion |A|+|B|-|A∪B| — the form that "
    "serves segment-Venn queries from a few KB per segment instead of "
    "re-scanning membership. The exact overlap hash-matches the SQL "
    "oracle; within_bounds pins the sketch estimate inside the "
    "triangle-inequality error budget (three 3-sigma HLL terms).",
)
def events_audience_overlap_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type, ONE reusable HLL sketch of its audience; every
    pair's intersection estimate is |A|+|B|-|A∪B| with the union sketch
    merged from the two per-type sketches (hll_union — register-max,
    never re-reading events). The exact branch exists for the verdict
    only; a production rollup ships just the sketch table. Error
    budget: each estimate carries ~1.6% rsd (lgK=12), so the
    inclusion-exclusion error is bounded by 3*rsd*(est_a+est_b+est_u),
    plus a +5 absolute floor for near-empty intersections."""
    e = t(spark, sf_dir, "events")
    ut = e.select("user_id", "event_type").distinct()
    sk = ut.groupBy("event_type").agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk"),
        F.countDistinct("user_id").alias("n_exact"),
    )
    a = sk.select(
        F.col("event_type").alias("type_a"),
        F.col("sk").alias("sk_a"),
        F.col("n_exact").alias("n_a"),
    )
    b = sk.select(
        F.col("event_type").alias("type_b"),
        F.col("sk").alias("sk_b"),
        F.col("n_exact").alias("n_b"),
    )
    pairs = a.join(b, F.col("type_a") < F.col("type_b"))
    est_a = F.expr("hll_sketch_estimate(sk_a)")
    est_b = F.expr("hll_sketch_estimate(sk_b)")
    est_u = F.expr("hll_sketch_estimate(hll_union(sk_a, sk_b))")
    est_both = est_a + est_b - est_u
    exact = (
        ut.alias("x")
        .join(
            ut.alias("y"),
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("exact_both"))
    )
    rsd = 0.0163  # lgK=12 default: 1.04/sqrt(4096)
    bound = 3 * rsd * (est_a + est_b + est_u) + 5
    return (
        pairs.join(exact, ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            "exact_both",
            (F.abs(est_both - F.col("exact_both")) <= bound).alias(
                "within_bounds"
            ),
        )
        .orderBy("type_a", "type_b")
    )


@register(
    "events_pattern_reversals",
    category="events",
    oracle="""
    WITH seq AS (
      SELECT event_type, event_id, value,
             LAG(value) OVER (
               PARTITION BY event_type ORDER BY ts, event_id) AS prev_v,
             LEAD(value) OVER (
               PARTITION BY event_type ORDER BY ts, event_id) AS next_v
      FROM events
    ),
    bottoms AS (
      SELECT event_type, event_id, value,
             (prev_v - value) + (next_v - value) AS depth
      FROM seq
      WHERE prev_v IS NOT NULL AND next_v IS NOT NULL
        AND value < prev_v AND value < next_v
    )
    SELECT event_type,
           COUNT(*) AS n_reversals,
           CAST(MIN(event_id) AS BIGINT) AS first_reversal_id,
           MAX(depth) AS max_depth
    FROM bottoms GROUP BY event_type ORDER BY event_type
    """,
    doc="Row-pattern matching (MATCH_RECOGNIZE's DOWN+ UP+ shape, "
    "rewritten as lag/lead predicates): V-shaped reversals — strict "
    "local minima — per event-type series, with count and deepest "
    "reversal. The rewrite runs in one windowed pass per series instead "
    "of an NFA, which is how row-pattern queries compile onto engines "
    "without MATCH_RECOGNIZE.",
)
def events_pattern_reversals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One (event_type, time) sort serves both navigation functions;
    depth arithmetic ((prev-v)+(next-v)) is the same expression order in
    both engines, and MAX over it is order-independent. Pattern spans
    never cross partition keys, so the shuffle is the series hash
    partition every per-series operator shares."""
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("event_type").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        "event_id",
        "value",
        F.lag("value").over(w).alias("prev_v"),
        F.lead("value").over(w).alias("next_v"),
    )
    bottoms = seq.filter(
        F.col("prev_v").isNotNull()
        & F.col("next_v").isNotNull()
        & (F.col("value") < F.col("prev_v"))
        & (F.col("value") < F.col("next_v"))
    ).select(
        "event_type",
        "event_id",
        (
            (F.col("prev_v") - F.col("value"))
            + (F.col("next_v") - F.col("value"))
        ).alias("depth"),
    )
    return (
        bottoms.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_reversals"),
            F.min("event_id").alias("first_reversal_id"),
            F.max("depth").alias("max_depth"),
        )
        .orderBy("event_type")
    )


@register(
    "events_dow_hour_heatmap",
    category="events",
    oracle="""
    WITH cells AS (
      SELECT CAST(dayofweek(ts) AS INT) AS dow,
             CAST(hour(ts) AS INT) AS hour_of_day,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM events GROUP BY 1, 2
    )
    SELECT dow, hour_of_day, n_events, n_users,
           CAST(n_events AS DOUBLE)
             / (SELECT SUM(n_events) FROM cells) AS activity_share
    FROM cells ORDER BY dow, hour_of_day
    """,
    doc="Day-of-week × hour-of-day activity heatmap with distinct users "
    "and each cell's share of total traffic — the load-profile / "
    "engagement matrix behind every ops dashboard. DuckDB's dayofweek "
    "is 0=Sunday-based like Spark's dayofweek-1; both sides emit "
    "Spark's convention via the explicit CAST arithmetic below. One "
    "combinable groupBy to ≤168 cells; the share join runs on that "
    "constant-size frame — a single data-sized shuffle (the distinct "
    "expands to the standard two-phase plan).",
)
def events_dow_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    cells = e.groupBy(
        (F.dayofweek("ts") - 1).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hour_of_day"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )
    total = cells.agg(F.sum("n_events").alias("tot"))
    return (
        cells.crossJoin(F.broadcast(total))
        .select(
            "dow",
            "hour_of_day",
            "n_events",
            "n_users",
            (F.col("n_events").cast("double") / F.col("tot")).alias(
                "activity_share"
            ),
        )
        .orderBy("dow", "hour_of_day")
    )


@register(
    "events_funnel_time_to_convert",
    category="events",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END)
               AS first_purchase
      FROM events GROUP BY user_id
    ),
    converted AS (
      SELECT user_id,
             CAST(FLOOR(date_diff('microsecond', first_view, first_purchase)
                        / 1000000) AS BIGINT) AS secs_to_convert
      FROM firsts
      WHERE first_view IS NOT NULL AND first_purchase IS NOT NULL
        AND first_purchase >= first_view
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           CAST(MIN(secs_to_convert) AS BIGINT) AS min_secs,
           CAST(quantile_disc(secs_to_convert, 0.5) AS BIGINT) AS median_secs,
           CAST(quantile_disc(secs_to_convert, 0.9) AS BIGINT) AS p90_secs,
           CAST(MAX(secs_to_convert) AS BIGINT) AS max_secs
    FROM converted
    """,
    doc="Funnel latency: per user, seconds from FIRST view to FIRST "
    "subsequent purchase; reported as exact discrete quantiles "
    "(min / median / p90 / max) over converting users — the "
    "time-to-convert read every funnel dashboard pairs with the "
    "conversion-rate read (events_funnel). Elapsed seconds are "
    "FLOOR(Δmicroseconds/1e6) on both engines — DuckDB's "
    "date_diff('second') counts boundary CROSSINGS, not elapsed time, "
    "and diverges on sub-second components. Plan: one conditional-MIN "
    "groupBy collapses events to a row per user (map-side "
    "combinable), the latency arithmetic is exact integer seconds, "
    "and the quantiles run over the converted-user frame with "
    "percentile_approx's EXACT sibling (sort-based percentile on "
    "integers — both engines pick the lower discrete value, no "
    "interpolation ambiguity).",
)
def events_funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    converted = firsts.filter(
        F.col("first_view").isNotNull()
        & F.col("first_purchase").isNotNull()
        & (F.col("first_purchase") >= F.col("first_view"))
    ).select(
        (
            (
                F.unix_micros(F.col("first_purchase"))
                - F.unix_micros(F.col("first_view"))
            )
            / 1_000_000
        )
        .cast("bigint")
        .alias("secs_to_convert")
    )
    # discrete (type-1) quantiles: sort-based exact percentile over the
    # collapsed converted-user frame
    q = F.expr(
        "percentile_disc(0.5) WITHIN GROUP (ORDER BY secs_to_convert)"
    )
    q90 = F.expr(
        "percentile_disc(0.9) WITHIN GROUP (ORDER BY secs_to_convert)"
    )
    return converted.agg(
        F.count(F.lit(1)).alias("n_converted"),
        F.min("secs_to_convert").alias("min_secs"),
        q.cast("bigint").alias("median_secs"),
        q90.cast("bigint").alias("p90_secs"),
        F.max("secs_to_convert").alias("max_secs"),
    )


@register(
    "events_npath_sequence",
    category="events",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type,
             LEAD(event_type, 1) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next1,
             LEAD(event_type, 2) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next2
      FROM events
    ),
    matches AS (
      SELECT user_id, event_id AS start_event_id, ts AS start_ts
      FROM ordered
      WHERE event_type = 'view' AND next1 = 'click' AND next2 = 'purchase'
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_matches,
           MIN(start_event_id) AS first_match_event_id
    FROM matches
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="nPath/MATCH_RECOGNIZE-style sequence matching: occurrences of "
    "the exact consecutive pattern view → click → purchase per user "
    "(no intervening events — the strict-adjacency semantics of "
    "Teradata nPath / SQL MATCH_RECOGNIZE with no quantifiers), via "
    "LEAD windows over the per-user event order — the pattern becomes "
    "a row-local predicate after ONE (user, time) sort, so any "
    "fixed-length pattern costs exactly one shuffle regardless of "
    "pattern width. Tie order (ts, event_id) is total, so matches are "
    "engine-reproducible. For variable-length patterns (A B* C) the "
    "same sort feeds the gaps-islands machinery "
    "(events_gaps_islands) instead.",
)
def events_npath_sequence(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.lead("event_type", 1).over(w).alias("next1"),
        F.lead("event_type", 2).over(w).alias("next2"),
    )
    matches = ordered.filter(
        (F.col("event_type") == "view")
        & (F.col("next1") == "click")
        & (F.col("next2") == "purchase")
    )
    return (
        matches.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_matches"),
            F.min("event_id").alias("first_match_event_id"),
        )
        .orderBy("user_id")
    )


@register(
    "events_cusum_changepoint",
    category="events",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ),
    stats AS (
      SELECT event_type,
             CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mu,
             COUNT(*) AS n_days
      FROM daily GROUP BY event_type
    ),
    dev AS (
      SELECT d.event_type, d.day, s.n_days,
             CAST(FLOOR((d.x - s.mu) * 1e6) AS BIGINT) AS dev_fixed
      FROM daily d JOIN stats s USING (event_type)
    ),
    cusum AS (
      SELECT event_type, day, n_days,
             SUM(dev_fixed) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS s_fixed
      FROM dev
    )
    SELECT event_type, day AS changepoint_day,
           CAST(ABS(s_fixed) AS DOUBLE) / 1e6 AS max_abs_cusum,
           CAST(n_days AS BIGINT) AS n_days
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY event_type ORDER BY ABS(s_fixed) DESC, day ASC
      ) AS rk
      FROM cusum
    ) WHERE rk = 1
    ORDER BY event_type
    """,
    doc="CUSUM changepoint detection per event-type series: cumulative "
    "sum of (daily value − series mean), with the |CUSUM| peak marking "
    "the most likely level-shift day (Page's classic statistic; the "
    "peak splits the series into before/after means at maximum "
    "contrast). Deviations are FLOOR fixed-point so the running sum is "
    "an exact integer cumulative — bit-identical cross-engine and "
    "immune to window-accumulation order. Plan: one combinable "
    "(type, day) collapse of the raw stream, broadcast per-type means, "
    "one window over the DAY-grain frame (constant per type, never "
    "data-sized), argmax via group-limit.",
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("x")
    )
    stats = daily.groupBy("event_type").agg(
        (
            F.sum(F.col("x").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mu"),
        F.count(F.lit(1)).alias("n_days"),
    )
    dev = daily.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "day",
        "n_days",
        F.floor((F.col("x") - F.col("mu")) * F.lit(1e6))
        .cast("bigint")
        .alias("dev_fixed"),
    )
    w_cum = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    cusum = dev.withColumn("s_fixed", F.sum("dev_fixed").over(w_cum))
    w_peak = W.partitionBy("event_type").orderBy(
        F.abs(F.col("s_fixed")).desc(), F.col("day").asc()
    )
    return (
        cusum.withColumn("rk", F.row_number().over(w_peak))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("day").alias("changepoint_day"),
            (F.abs(F.col("s_fixed")).cast("double") / F.lit(1e6)).alias(
                "max_abs_cusum"
            ),
            F.col("n_days").cast("bigint").alias("n_days"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Ordered funnel (windowFunnel analogue; round 3)
# ---------------------------------------------------------------------------

_FUNNEL_STEPS = ["signup", "view", "click", "purchase"]
_FUNNEL_DAYS = 7


@register(
    "events_window_funnel",
    category="events",
    oracle=f"""
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = '{_FUNNEL_STEPS[0]}' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = '{_FUNNEL_STEPS[1]}' AND e.ts > s1.t1
      GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = '{_FUNNEL_STEPS[2]}' AND e.ts > s2.t2
      GROUP BY e.user_id
    ),
    s4 AS (
      SELECT e.user_id, MIN(e.ts) AS t4
      FROM events e JOIN s3 ON e.user_id = s3.user_id
      WHERE e.event_type = '{_FUNNEL_STEPS[3]}' AND e.ts > s3.t3
      GROUP BY e.user_id
    ),
    lvl AS (
      SELECT s1.user_id,
             CASE
               WHEN s4.t4 IS NOT NULL
                    AND s4.t4 <= s1.t1 + INTERVAL {_FUNNEL_DAYS} DAY THEN 4
               WHEN s3.t3 IS NOT NULL
                    AND s3.t3 <= s1.t1 + INTERVAL {_FUNNEL_DAYS} DAY THEN 3
               WHEN s2.t2 IS NOT NULL
                    AND s2.t2 <= s1.t1 + INTERVAL {_FUNNEL_DAYS} DAY THEN 2
               ELSE 1
             END AS funnel_level
      FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
              LEFT JOIN s3 ON s1.user_id = s3.user_id
              LEFT JOIN s4 ON s1.user_id = s4.user_id
    )
    SELECT CAST(funnel_level AS INT) AS funnel_level,
           COUNT(*) AS n_users
    FROM lvl GROUP BY funnel_level ORDER BY funnel_level
    """,
    doc="Ordered conversion funnel (the windowFunnel primitive "
    "ClickHouse users lean on; the reference provisions ClickHouse but "
    "cannot express this itself): greedy earliest-chain semantics — "
    "t1 = first signup, each later step the earliest matching event "
    "STRICTLY after the previous step, funnel level = deepest step "
    "reached within 7 days of t1. Users are bucketed by deepest level "
    "(1-4). Deterministic (min timestamps; no tie ambiguity at the "
    "per-user event granularity) and exactly mirrored by the oracle's "
    "chained CTEs. Plan: 4 chained window-min passes ALL partitioned "
    "by user_id — one shuffle, the three later passes reuse the "
    "exchange — then a 4-row aggregate. At 100 TB: shuffle is one "
    "pass over events keyed by user; per-user state is 4 timestamps; "
    "no self-joins of the event table (the oracle's joins are the "
    "SQL spelling; Spark computes the same chain with windows).",
)
def events_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    w = W.partitionBy("user_id")
    step = e
    prev_t = None
    for i, name in enumerate(_FUNNEL_STEPS, start=1):
        cond = F.col("event_type") == name
        if prev_t is not None:
            cond = cond & F.col("ts").isNotNull() & (F.col("ts") > F.col(prev_t))
        step = step.withColumn(
            f"t{i}", F.min(F.when(cond, F.col("ts"))).over(w)
        )
        prev_t = f"t{i}"
    horizon = F.col("t1") + F.expr(f"INTERVAL {_FUNNEL_DAYS} DAY")
    per_user = (
        step.filter(F.col("t1").isNotNull())
        .select("user_id", "t1", "t2", "t3", "t4", horizon.alias("hz"))
        .distinct()
        .select(
            "user_id",
            F.when(F.col("t4").isNotNull() & (F.col("t4") <= F.col("hz")), 4)
            .when(F.col("t3").isNotNull() & (F.col("t3") <= F.col("hz")), 3)
            .when(F.col("t2").isNotNull() & (F.col("t2") <= F.col("hz")), 2)
            .otherwise(1)
            .cast("int")
            .alias("funnel_level"),
        )
    )
    return (
        per_user.groupBy("funnel_level")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("funnel_level")
    )


# ---------------------------------------------------------------------------
# Holt's linear-trend smoothing (round 3)
# ---------------------------------------------------------------------------

_HOLT_ALPHA = 0.5
_HOLT_GAMMA = 0.25


@register(
    "events_holt_forecast",
    category="events",
    oracle=f"""
    WITH RECURSIVE daily AS (
      SELECT event_type, date_trunc('day', ts) AS day,
             CAST(COUNT(*) AS DOUBLE) AS x
      FROM events GROUP BY event_type, date_trunc('day', ts)
    ),
    seqs AS (
      SELECT event_type, list(x ORDER BY day) AS xs, COUNT(*) AS n
      FROM daily GROUP BY event_type
    ),
    holt(event_type, t, l, b) AS (
      SELECT event_type, 2, xs[2],
             CAST(xs[2] AS DOUBLE) - CAST(xs[1] AS DOUBLE)
      FROM seqs WHERE n >= 2
      UNION ALL
      SELECT h.event_type, h.t + 1,
             CAST({_HOLT_ALPHA!r} AS DOUBLE) * s.xs[h.t + 1]
               + CAST({1 - _HOLT_ALPHA!r} AS DOUBLE) * (h.l + h.b),
             CAST({_HOLT_GAMMA!r} AS DOUBLE) *
               ((CAST({_HOLT_ALPHA!r} AS DOUBLE) * s.xs[h.t + 1]
                 + CAST({1 - _HOLT_ALPHA!r} AS DOUBLE) * (h.l + h.b)) - h.l)
               + CAST({1 - _HOLT_GAMMA!r} AS DOUBLE) * h.b
      FROM holt h JOIN seqs s USING (event_type)
      WHERE h.t < s.n
    ),
    final AS (
      SELECT h.event_type, s.n AS n_days, h.l AS level, h.b AS trend
      FROM holt h JOIN seqs s USING (event_type)
      WHERE h.t = s.n
    )
    SELECT event_type, CAST(n_days AS BIGINT) AS n_days, level, trend,
           level + trend AS forecast_next
    FROM final ORDER BY event_type
    """,
    doc="Holt's linear-trend double-exponential smoothing over the "
    "daily event volume per type (level l_t = a*x_t + (1-a)*(l+b); "
    "trend b_t = g*(l_t - l) + (1-g)*b; init l_2 = x_2, b_2 = x_2-x_1) "
    "— the trend-aware upgrade of events_ewma_smoothing; "
    "forecast_next = l+b is the one-step-ahead prediction capacity "
    "planning reads. The 2-component state folds as ONE struct "
    "accumulator over each series' day array (series collected once, "
    "bounded by days), so parallelism is the series count and nothing "
    "row-grained shuffles after the map-side daily pre-aggregation — "
    "the same sequential-recurrence shape as EWMA, with the oracle "
    "replaying the identical IEEE expressions step-by-step through a "
    "recursive CTE (both engines evaluate the same two expressions in "
    "the same day order, so level/trend hash-match bit-for-bit).",
)
def events_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("day")
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    seqs = daily.groupBy("event_type").agg(
        F.expr("transform(array_sort(collect_list(struct(day, x))), s -> s.x)")
        .alias("xs"),
        F.count(F.lit(1)).alias("n_days"),
    ).filter(F.col("n_days") >= 2)
    a, g = _HOLT_ALPHA, _HOLT_GAMMA
    state = F.expr(
        f"""aggregate(
              slice(xs, 3, size(xs) - 2),
              named_struct('l', CAST(xs[1] AS DOUBLE),
                           'b', CAST(xs[1] AS DOUBLE) - CAST(xs[0] AS DOUBLE)),
              (acc, x) -> named_struct(
                'l', CAST({a!r} AS DOUBLE) * x
                     + CAST({1 - a!r} AS DOUBLE) * (acc.l + acc.b),
                'b', CAST({g!r} AS DOUBLE) *
                       ((CAST({a!r} AS DOUBLE) * x
                         + CAST({1 - a!r} AS DOUBLE) * (acc.l + acc.b))
                        - acc.l)
                     + CAST({1 - g!r} AS DOUBLE) * acc.b))"""
    )
    return (
        seqs.select(
            "event_type",
            F.col("n_days").cast("bigint").alias("n_days"),
            state.alias("st"),
        )
        .select(
            "event_type",
            "n_days",
            F.col("st.l").alias("level"),
            F.col("st.b").alias("trend"),
            (F.col("st.l") + F.col("st.b")).alias("forecast_next"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Seasonal decomposition (trend + day-of-week seasonal + residual)
# ---------------------------------------------------------------------------

_SD_HALF = 3  # centered moving-average half-width -> 7-day trend window


@register(
    "timeseries_seasonal_decompose",
    category="timeseries",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev_dec
      FROM orders GROUP BY 1
    ),
    tr AS (
      SELECT day, rev_dec,
             CAST(SUM(rev_dec) OVER w AS DOUBLE)
               / CAST(COUNT(*) OVER w AS DOUBLE) AS trend
      FROM daily
      WINDOW w AS (ORDER BY day
                   ROWS BETWEEN {_SD_HALF} PRECEDING AND {_SD_HALF} FOLLOWING)
    ),
    det AS (
      SELECT day, CAST(rev_dec AS DOUBLE) AS daily_rev, trend,
             CAST(rev_dec AS DOUBLE) - trend AS detrended,
             (CAST(day AS DATE) - DATE '1970-01-01') % 7 AS dow
      FROM tr
    ),
    seas AS (
      SELECT dow,
             CAST(SUM(CAST(FLOOR(detrended * 1e6) AS BIGINT)) AS DOUBLE)
               / CAST(COUNT(*) * 1000000 AS DOUBLE) AS seasonal
      FROM det GROUP BY dow
    )
    SELECT d.day, d.daily_rev, d.trend, s.seasonal,
           d.detrended - s.seasonal AS residual
    FROM det d JOIN seas s ON d.dow = s.dow
    ORDER BY d.day
    """,
)
def timeseries_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition of daily order revenue:
    trend = centered 7-day moving average, seasonal = per-day-of-week
    mean of the detrended series, residual = what's left — the
    anomaly-baseline primitive (dashboards alert on residual, forecast
    on trend + seasonal; this is the moving-average skeleton of STL
    without its loess refinements).

    Scale: the raw-data pass is ONE partial-aggregated groupBy to the
    day grain; every window after that runs over the day SERIES, whose
    length is calendar-bounded (a decade ≈ 3.7k rows) and does not grow
    with data volume — the single-partition trend window is over that
    series, never over raw orders. Day-of-week comes from epoch-day
    mod 7 (engine-neutral; both engines' dayofweek() numberings
    disagree), and the seasonal means join back as a 7-row broadcast.
    Determinism: daily revenue accumulates in exact decimal; the
    per-DOW seasonal mean folds FLOOR(detrended*1e6) BIGINTs (the
    fixed-point pattern from functions/vector.py — a double→DECIMAL
    cast here would hit the Spark shortest-repr vs DuckDB exact-binary
    rounding split at 17+ significant digits), so the decomposition is
    bit-identical across engines and partition counts."""
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("rev_dec")
    )
    w7 = W.orderBy("day").rowsBetween(-_SD_HALF, _SD_HALF)
    tr = daily.select(
        "day",
        "rev_dec",
        (
            F.sum("rev_dec").over(w7).cast("double")
            / F.count(F.lit(1)).over(w7).cast("double")
        ).alias("trend"),
    )
    det = tr.select(
        "day",
        F.col("rev_dec").cast("double").alias("daily_rev"),
        "trend",
        (F.col("rev_dec").cast("double") - F.col("trend")).alias("detrended"),
        (
            F.datediff(F.to_date("day"), F.lit("1970-01-01").cast("date")) % 7
        ).alias("dow"),
    )
    seas = det.groupBy("dow").agg(
        (
            F.sum(
                F.floor(F.col("detrended") * F.lit(1e6)).cast("bigint")
            ).cast("double")
            / (F.count(F.lit(1)) * F.lit(1000000)).cast("double")
        ).alias("seasonal")
    )
    return (
        det.join(F.broadcast(seas), "dow")
        .select(
            "day",
            "daily_rev",
            "trend",
            "seasonal",
            (F.col("detrended") - F.col("seasonal")).alias("residual"),
        )
        .orderBy("day")
    )


# ---------------------------------------------------------------------------
# Multi-touch conversion attribution (first / last / linear)
# ---------------------------------------------------------------------------


@register(
    "events_attribution_touch",
    category="events",
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, event_id, event_type FROM events
      WHERE event_type IN ('click', 'view', 'signup', 'purchase')
    ),
    seq AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS pseq
      FROM ev
    ),
    purchases AS (
      SELECT user_id, pseq AS conv_no FROM seq WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT user_id, pseq + 1 AS conv_no, event_type, ts, event_id
      FROM seq WHERE event_type <> 'purchase'
    ),
    ct AS (
      SELECT t.user_id, t.conv_no, t.event_type, t.ts, t.event_id
      FROM touches t JOIN purchases p
        ON t.user_id = p.user_id AND t.conv_no = p.conv_no
    ),
    ranked AS (
      SELECT event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, conv_no
                                ORDER BY ts, event_id) AS rn_f,
             ROW_NUMBER() OVER (PARTITION BY user_id, conv_no
                                ORDER BY ts DESC, event_id DESC) AS rn_l
      FROM ct
    ),
    ft AS (
      SELECT event_type AS channel,
             CAST(COUNT(*) AS BIGINT) AS first_touch_conversions
      FROM ranked WHERE rn_f = 1 GROUP BY 1
    ),
    lt AS (
      SELECT event_type AS channel,
             CAST(COUNT(*) AS BIGINT) AS last_touch_conversions
      FROM ranked WHERE rn_l = 1 GROUP BY 1
    ),
    lin AS (
      SELECT event_type AS channel,
             CAST(SUM((1000000 * n_chan) // n_touches) AS BIGINT)
               AS linear_credit_ppm
      FROM (
        SELECT user_id, conv_no, event_type, COUNT(*) AS n_chan,
               SUM(COUNT(*)) OVER (PARTITION BY user_id, conv_no)
                 AS n_touches
        FROM ct GROUP BY user_id, conv_no, event_type
      )
      GROUP BY 1
    )
    SELECT l.channel,
           COALESCE(f.first_touch_conversions, 0) AS first_touch_conversions,
           COALESCE(t.last_touch_conversions, 0) AS last_touch_conversions,
           l.linear_credit_ppm
    FROM lin l
    LEFT JOIN ft f ON l.channel = f.channel
    LEFT JOIN lt t ON l.channel = t.channel
    ORDER BY l.channel
    """,
)
def events_attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch conversion attribution — the marketing-analytics
    primitive layered on event streams: every purchase is a conversion,
    the click/view/signup events since the user's previous purchase are
    its touch path, and each channel is credited under three standard
    models at once (first-touch, last-touch, linear). Linear credit is
    integer ppm per conversion (1e6·n_chan DIV n_touches — integer
    division, no float nondeterminism), so a channel's column sums to
    ≤ 1e6 per attributed conversion.

    Scale: touch→conversion assignment is ONE running-count window per
    user (the sessionize gap-trick shape — no self-join against the
    purchase list), the conversion join is an equi-join on
    (user, conv_no), and the first/last picks are row_number windows
    over per-conversion groups whose cardinality is the user's path
    length, never the table. Everything after the per-conversion
    grouping is channel-cardinality (a handful of rows). Integer-only
    outputs ⇒ bit parity with the oracle's window replay."""
    e = t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view", "signup", "purchase")
    )
    w_seq = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    seq = e.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        )
        .over(w_seq)
        .alias("pseq"),
    )
    purchases = seq.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("pseq").alias("conv_no")
    )
    touches = seq.filter(F.col("event_type") != "purchase").select(
        "user_id",
        (F.col("pseq") + 1).alias("conv_no"),
        "event_type",
        "ts",
        "event_id",
    )
    ct = touches.join(purchases, ["user_id", "conv_no"])
    w_f = W.partitionBy("user_id", "conv_no").orderBy("ts", "event_id")
    w_l = W.partitionBy("user_id", "conv_no").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = ct.select(
        "event_type",
        F.row_number().over(w_f).alias("rn_f"),
        F.row_number().over(w_l).alias("rn_l"),
    )
    ft = (
        ranked.filter(F.col("rn_f") == 1)
        .groupBy(F.col("event_type").alias("channel"))
        .agg(F.count(F.lit(1)).alias("first_touch_conversions"))
    )
    lt = (
        ranked.filter(F.col("rn_l") == 1)
        .groupBy(F.col("event_type").alias("channel"))
        .agg(F.count(F.lit(1)).alias("last_touch_conversions"))
    )
    w_conv = W.partitionBy("user_id", "conv_no")
    per_chan = (
        ct.groupBy("user_id", "conv_no", "event_type")
        .agg(F.count(F.lit(1)).alias("n_chan"))
        .withColumn("n_touches", F.sum("n_chan").over(w_conv))
    )
    lin = per_chan.groupBy(F.col("event_type").alias("channel")).agg(
        F.sum(
            F.expr("(1000000 * n_chan) DIV n_touches")
        ).cast("bigint").alias("linear_credit_ppm")
    )
    return (
        lin.join(ft, "channel", "left")
        .join(lt, "channel", "left")
        .select(
            "channel",
            F.coalesce("first_touch_conversions", F.lit(0))
            .cast("bigint")
            .alias("first_touch_conversions"),
            F.coalesce("last_touch_conversions", F.lit(0))
            .cast("bigint")
            .alias("last_touch_conversions"),
            "linear_credit_ppm",
        )
        .orderBy("channel")
    )


@register(
    "timeseries_acf",
    category="timeseries",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev_dec
      FROM orders GROUP BY 1
    ),
    s0 AS (
      SELECT ROW_NUMBER() OVER (ORDER BY day) AS idx,
             CAST(FLOOR(CAST(rev_dec AS DOUBLE) / 1000) AS BIGINT) AS x
      FROM daily
    ),
    st AS (SELECT CAST(SUM(x) AS BIGINT) // COUNT(*) AS m FROM s0),
    s AS (SELECT idx, x - (SELECT m FROM st) AS dev FROM s0),
    den AS (SELECT CAST(SUM(dev * dev) AS BIGINT) AS den FROM s),
    lags AS (SELECT CAST(range AS BIGINT) AS lag_k FROM range(1, 11)),
    pairs AS (
      SELECT l.lag_k, CAST(COUNT(*) AS BIGINT) AS n_pairs,
             CAST(SUM(a.dev * b.dev) AS BIGINT) AS num
      FROM lags l
      CROSS JOIN s a
      JOIN s b ON b.idx = a.idx - l.lag_k
      GROUP BY l.lag_k
    )
    SELECT p.lag_k, p.n_pairs, p.num, d.den,
           CAST(FLOOR(1000.0 * p.num / d.den) AS BIGINT) AS acf_milli
    FROM pairs p, den d
    ORDER BY p.lag_k
    """,
)
def timeseries_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function of daily order revenue at lags 1-10 —
    the seasonality/persistence detector that picks the window for the
    seasonal decomposition (a weekly cycle shows as a lag-7 peak) and
    the forecasting-model order (Box-Jenkins identification step).

    Fixed-point contract: the series is FLOOR(daily_revenue / 1000)
    int64 (kilodollar grain keeps dev^2 sums far from overflow at any
    shipped sf while the correlation RATIO loses nothing measurable);
    deviations use the FLOORed integer mean — a deterministic statistic
    both engines compute identically, documented as such. num/den are
    exact int64 sums; acf_milli = FLOOR(1000.0*num/den) is one IEEE
    division of exactly-representable integers (<2^53), correctly
    rounded and so bit-identical cross-engine even for negative
    correlations (FLOOR, not integer DIV, whose negative semantics
    differ between engines).

    Scale: the data-sized pass is ONE partial-aggregated groupBy to day
    grain; everything downstream operates on the calendar-bounded day
    SERIES (a decade ~ 3.7k rows, independent of row volume — same
    contract as timeseries_seasonal_decompose, which documents the
    bounded single-partition series window). The lag alignment is an
    equi self-join on the shifted row index against a 10-row broadcast
    lag table, not 10 sequential window passes."""
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("rev_dec"))
    s0 = daily.select(
        F.row_number().over(W.orderBy("day")).alias("idx"),
        F.floor(F.col("rev_dec").cast("double") / 1000)
        .cast("long")
        .alias("x"),
    )
    st = s0.agg(F.expr("CAST(SUM(x) AS BIGINT) DIV COUNT(*)").alias("m"))
    s = (
        s0.crossJoin(F.broadcast(st))
        .select("idx", (F.col("x") - F.col("m")).alias("dev"))
        .localCheckpoint()
    )
    den = s.agg(F.sum(F.col("dev") * F.col("dev")).cast("bigint").alias("den"))
    lags = spark.range(1, 11).select(F.col("id").alias("lag_k"))
    a = s.select(F.col("idx").alias("a_idx"), F.col("dev").alias("a_dev"))
    b = s.select(F.col("idx").alias("b_idx"), F.col("dev").alias("b_dev"))
    pairs = (
        a.crossJoin(F.broadcast(lags))
        .join(b, F.col("b_idx") == F.col("a_idx") - F.col("lag_k"))
        .groupBy("lag_k")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.col("a_dev") * F.col("b_dev")).cast("bigint").alias("num"),
        )
    )
    return (
        pairs.crossJoin(F.broadcast(den))
        .select(
            "lag_k",
            "n_pairs",
            "num",
            "den",
            F.floor(1000.0 * F.col("num") / F.col("den")).cast("bigint").alias(
                "acf_milli"
            ),
        )
        .orderBy("lag_k")
    )


#: count-min sketch geometry + per-row hash constants (MINSTD-family
#: multipliers, public domain). Depth 3 × width 512 integer counters;
#: the SAME literals appear in the oracle so the sketch — unlike a
#: seeded-HLL binary — is replayed bit-for-bit by DuckDB.
_CMS_HASHES = [(0, 48271, 11), (1, 69621, 25), (2, 40692, 7)]
_CMS_P = 2147483647
_CMS_W = 512


@register(
    "events_countmin_rollup_sketch",
    category="events",
    oracle=f"""
    WITH base AS (
      SELECT user_id, date_trunc('day', ts) AS day FROM events
    ),
    hcfg AS (
      SELECT * FROM (VALUES
        {', '.join(f'({r}, {a}, {b})' for r, a, b in _CMS_HASHES)}
      ) h(r, a, b)
    ),
    daily AS (
      SELECT day, h.r,
             ((h.a * user_id + h.b) % {_CMS_P}) % {_CMS_W} AS bucket,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM base CROSS JOIN hcfg h GROUP BY 1, 2, 3
    ),
    weekly AS (
      SELECT CAST(date_trunc('week', day) AS DATE) AS week_start, r, bucket,
             CAST(SUM(cnt) AS BIGINT) AS cnt
      FROM daily GROUP BY 1, 2, 3
    ),
    exact AS (
      SELECT CAST(date_trunc('week', ts) AS DATE) AS week_start, user_id,
             CAST(COUNT(*) AS BIGINT) AS exact_n
      FROM events GROUP BY 1, 2
    ),
    top AS (
      SELECT week_start, user_id, exact_n FROM (
        SELECT week_start, user_id, exact_n,
               ROW_NUMBER() OVER (PARTITION BY week_start
                                  ORDER BY exact_n DESC, user_id) AS rk
        FROM exact
      ) WHERE rk <= 5
    ),
    probe AS (
      SELECT t.week_start, t.user_id, t.exact_n, h.r,
             ((h.a * t.user_id + h.b) % {_CMS_P}) % {_CMS_W} AS bucket
      FROM top t CROSS JOIN hcfg h
    ),
    est AS (
      SELECT p.week_start, p.user_id, p.exact_n,
             CAST(MIN(w.cnt) AS BIGINT) AS cms_est
      FROM probe p
      JOIN weekly w ON w.week_start = p.week_start
                   AND w.r = p.r AND w.bucket = p.bucket
      GROUP BY 1, 2, 3
    )
    SELECT week_start, user_id, exact_n, cms_est,
           cms_est - exact_n AS overcount
    FROM est ORDER BY week_start, exact_n DESC, user_id
    """,
)
def events_countmin_rollup_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min frequency rollup — the heavy-count sibling of the HLL
    distinct rollup and the log-grid quantile rollup, completing the
    mergeable-sketch trio (distinct / quantile / frequency). Per-day
    depth-3 × width-512 integer counter grids roll day→week by plain
    vector ADDITION (associative, re-aggregable without touching raw
    events); each week's top-5 users by exact count are then probed
    against the merged sketch, showing est = min over rows of the hashed
    counter, the one-sided overestimate (`overcount` ≥ 0 always — the
    CMS guarantee), and its magnitude against the exact truth.

    Unlike the seeded-HLL binary, the whole sketch is integer arithmetic
    on literal hash constants, so DuckDB replays BUILD, MERGE, and PROBE
    bit-for-bit — no bounded-error verdict needed.

    Scale: the raw pass explodes each event into 3 (row, bucket) cells
    whose counts partial-aggregate MAP-SIDE — the shuffle carries at
    most days × 3 × 512 counter rows regardless of event volume, and the
    week merge moves only sketch rows. The probe is a 15-row-per-week
    broadcast-sized join against the sketch. This is the shape that lets
    a 100 TB event store keep per-shard sketches and answer 'roughly how
    often did X occur last week' without a raw re-scan."""
    e = t(spark, sf_dir, "events")
    hexpr = lambda u: [
        F.struct(
            F.lit(r).alias("r"),
            ((F.lit(a) * u + F.lit(b)) % _CMS_P % _CMS_W).alias("bucket"),
        )
        for r, a, b in _CMS_HASHES
    ]
    daily = (
        e.select(
            F.date_trunc("day", "ts").alias("day"),
            F.explode(F.array(*hexpr(F.col("user_id")))).alias("h"),
        )
        .groupBy("day", "h.r", "h.bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    weekly = daily.groupBy(
        F.date_trunc("week", "day").cast("date").alias("week_start"),
        "r",
        "bucket",
    ).agg(F.sum("cnt").alias("cnt"))
    exact = e.groupBy(
        F.date_trunc("week", "ts").cast("date").alias("week_start"), "user_id"
    ).agg(F.count(F.lit(1)).alias("exact_n"))
    wk = W.partitionBy("week_start").orderBy(F.col("exact_n").desc(), "user_id")
    top = (
        exact.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= 5)
        .drop("rk")
    )
    probe = top.select(
        "week_start",
        "user_id",
        "exact_n",
        F.explode(F.array(*hexpr(F.col("user_id")))).alias("h"),
    ).select("week_start", "user_id", "exact_n", "h.r", "h.bucket")
    est = (
        probe.join(weekly, ["week_start", "r", "bucket"])
        .groupBy("week_start", "user_id", "exact_n")
        .agg(F.min("cnt").alias("cms_est"))
    )
    return est.select(
        "week_start",
        "user_id",
        "exact_n",
        "cms_est",
        (F.col("cms_est") - F.col("exact_n")).alias("overcount"),
    ).orderBy("week_start", F.col("exact_n").desc(), "user_id")


@register(
    "timeseries_trend_mann_kendall",
    category="timeseries",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', o_orderdate) AS day,
             SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS rev_dec
      FROM orders GROUP BY 1
    ),
    s AS (
      SELECT ROW_NUMBER() OVER (ORDER BY day) AS idx,
             CAST(FLOOR(CAST(rev_dec AS DOUBLE) / 1000) AS BIGINT) AS x
      FROM daily
    ),
    stat AS (
      SELECT CAST(SUM(CASE WHEN b.x > a.x THEN 1
                           WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT)
             AS s_stat
      FROM s a JOIN s b ON b.idx > a.idx
    ),
    nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM s),
    ties AS (
      SELECT COALESCE(CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT), 0)
             AS tie_corr
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM s GROUP BY x)
      WHERE t > 1
    ),
    agg AS (
      SELECT nn.n_days, stat.s_stat,
             nn.n_days * (nn.n_days - 1) * (2 * nn.n_days + 5)
               - ties.tie_corr AS var18
      FROM nn, stat, ties
    )
    SELECT n_days, s_stat, var18,
           CAST(FLOOR(1000.0 * (s_stat - CASE WHEN s_stat > 0 THEN 1
                                              WHEN s_stat < 0 THEN -1
                                              ELSE 0 END)
                      / sqrt(var18 / 18.0)) AS BIGINT) AS z_milli
    FROM agg
    """,
)
def timeseries_trend_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test on daily revenue — the nonparametric
    'is there a monotonic trend?' statistic (S = sum of pairwise
    sign(x_j - x_i), j later than i), with the tie-corrected variance
    n(n-1)(2n+5) - Σ t(t-1)(2t+5) over 18 and the continuity-corrected
    z-score. Complements the CUSUM changepoint (level SHIFT) and the ACF
    (periodicity) with monotone DRIFT detection; |z_milli| > 1960 is the
    5% significance call.

    Determinism: the series is the same FLOOR(revenue/1000) int64 grain
    as timeseries_acf; S, n, and var18 are exact integer folds; the only
    float step is one sqrt + divide + FLOOR over exactly-representable
    integers (< 2^53), which IEEE semantics make bit-identical in both
    engines.

    Scale: the data-sized pass is ONE groupBy to day grain. The O(n²)
    pairwise comparison runs on the calendar-bounded day SERIES (n ≈
    2.4k for TPC-H's seven years — ~3M sign evaluations, constant in
    row volume; a decade of days is n=3.7k regardless of whether the
    table is 1 GB or 100 TB). Spark executes it as a nested-loop join
    of a broadcast series against itself — bounded by the calendar, the
    documented contract of every timeseries_* query here."""
    o = t(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", F.col("o_orderdate")).alias("day")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("rev_dec"))
    s = daily.select(
        F.row_number().over(W.orderBy("day")).alias("idx"),
        F.floor(F.col("rev_dec").cast("double") / 1000)
        .cast("long")
        .alias("x"),
    ).localCheckpoint()
    a = s.select(F.col("idx").alias("a_idx"), F.col("x").alias("a_x"))
    b = s.select(F.col("idx").alias("b_idx"), F.col("x").alias("b_x"))
    sign = (
        F.when(F.col("b_x") > F.col("a_x"), F.lit(1))
        .when(F.col("b_x") < F.col("a_x"), F.lit(-1))
        .otherwise(F.lit(0))
    )
    stat = (
        a.join(b, F.col("b_idx") > F.col("a_idx"))
        .agg(F.sum(sign).cast("bigint").alias("s_stat"))
    )
    nn = s.agg(F.count(F.lit(1)).alias("n_days"))
    ties = (
        s.groupBy("x")
        .agg(F.count(F.lit(1)).alias("tcnt"))
        .filter(F.col("tcnt") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("tcnt")
                    * (F.col("tcnt") - 1)
                    * (2 * F.col("tcnt") + 5)
                ),
                F.lit(0),
            ).cast("bigint").alias("tie_corr")
        )
    )
    agg = (
        nn.crossJoin(F.broadcast(stat))
        .crossJoin(F.broadcast(ties))
        .select(
            "n_days",
            "s_stat",
            (
                F.col("n_days")
                * (F.col("n_days") - 1)
                * (2 * F.col("n_days") + 5)
                - F.col("tie_corr")
            ).alias("var18"),
        )
    )
    cc = (
        F.when(F.col("s_stat") > 0, F.lit(1))
        .when(F.col("s_stat") < 0, F.lit(-1))
        .otherwise(F.lit(0))
    )
    return agg.select(
        "n_days",
        "s_stat",
        "var18",
        F.floor(
            1000.0 * (F.col("s_stat") - cc) / F.sqrt(F.col("var18") / 18.0)
        ).cast("bigint").alias("z_milli"),
    )


@register(
    "timeseries_linear_interpolate",
    category="timeseries",
    oracle="""
    WITH daily AS (
      SELECT event_type,
             datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_idx,
             CAST(FLOOR(1000 * SUM(CAST(value AS DECIMAL(18,6)))) AS BIGINT)
               AS v
      FROM events
      WHERE CAST(ts AS DATE) BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
      GROUP BY 1, 2
    ),
    spine AS (
      SELECT d.event_type, s.g AS day_idx
      FROM (SELECT event_type, MIN(day_idx) AS lo, MAX(day_idx) AS hi
            FROM daily GROUP BY event_type) d
      CROSS JOIN LATERAL (
        SELECT UNNEST(generate_series(d.lo, d.hi)) AS g
      ) s
    ),
    obs AS (
      SELECT sp.event_type, sp.day_idx,
             CASE WHEN sp.day_idx % 3 <> 0 THEN da.v END AS v
      FROM spine sp LEFT JOIN daily da
        ON da.event_type = sp.event_type AND da.day_idx = sp.day_idx
    ),
    ctx AS (
      SELECT event_type, day_idx, v,
             LAST_VALUE(v IGNORE NULLS) OVER w_prev AS pv,
             LAST_VALUE(CASE WHEN v IS NOT NULL THEN day_idx END
                        IGNORE NULLS) OVER w_prev AS pd,
             FIRST_VALUE(v IGNORE NULLS) OVER w_next AS nv,
             FIRST_VALUE(CASE WHEN v IS NOT NULL THEN day_idx END
                         IGNORE NULLS) OVER w_next AS nd
      FROM obs
      WINDOW
        w_prev AS (PARTITION BY event_type ORDER BY day_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        w_next AS (PARTITION BY event_type ORDER BY day_idx
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, day_idx,
           CAST(v IS NOT NULL AS INT) AS observed,
           CASE
             WHEN v IS NOT NULL THEN v
             WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
               CAST(FLOOR((1.0 * pv * (nd - day_idx)
                           + 1.0 * nv * (day_idx - pd))
                          / (nd - pd)) AS BIGINT)
             WHEN pv IS NOT NULL THEN pv
             ELSE nv
           END AS value_milli
    FROM ctx
    ORDER BY event_type, day_idx
    """,
)
def timeseries_linear_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation of missing points in a daily series — the
    step beyond LOCF gap-fill (`timeseries_gap_fill`): dropped readings
    (a simulated every-third-day sensor dropout over one year) are
    reconstructed as the line between the flanking observations, with
    LOCF/backfill only at the edges. The window-function idiom is the
    IGNORE NULLS pair: last-non-null value+day over the strict prefix,
    first-non-null over the strict suffix, then one arithmetic blend —
    no self-join against the observation list.

    Determinism: daily values are FLOOR(1000·Σ decimal) int64; the
    interpolated value FLOOR((pv·(nd−d) + nv·(d−pd))/(nd−pd)) is one
    correctly-rounded IEEE divide over exact <2^53 integers, so both
    engines agree bit-for-bit.

    Scale: one partial-aggregated groupBy to (type, day) grain is the
    only data-sized pass; the spine, the four IGNORE-NULLS windows, and
    the blend all run on the calendar-bounded per-type day series
    (same contract as every timeseries_* query here)."""
    e = t(spark, sf_dir, "events")
    day = F.to_date("ts")
    daily = (
        e.filter(day.between(F.lit("1995-01-01"), F.lit("1995-12-31")))
        .groupBy(
            "event_type",
            F.datediff(day, F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("day_idx"),
        )
        .agg(
            F.floor(
                1000 * F.sum(F.col("value").cast("decimal(18,6)"))
            ).cast("bigint").alias("v")
        )
    )
    spine = (
        daily.groupBy("event_type")
        .agg(F.min("day_idx").alias("lo"), F.max("day_idx").alias("hi"))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi")).alias("day_idx"),
        )
    )
    obs = spine.join(daily, ["event_type", "day_idx"], "left").select(
        "event_type",
        "day_idx",
        F.when(F.col("day_idx") % 3 != 0, F.col("v")).alias("v"),
    )
    w_prev = (
        W.partitionBy("event_type")
        .orderBy("day_idx")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    w_next = (
        W.partitionBy("event_type")
        .orderBy("day_idx")
        .rowsBetween(1, W.unboundedFollowing)
    )
    obs_day = F.when(F.col("v").isNotNull(), F.col("day_idx"))
    ctx = obs.select(
        "event_type",
        "day_idx",
        "v",
        F.last("v", ignorenulls=True).over(w_prev).alias("pv"),
        F.last(obs_day, ignorenulls=True).over(w_prev).alias("pd"),
        F.first("v", ignorenulls=True).over(w_next).alias("nv"),
        F.first(obs_day, ignorenulls=True).over(w_next).alias("nd"),
    )
    interp = F.floor(
        (
            1.0 * F.col("pv") * (F.col("nd") - F.col("day_idx"))
            + 1.0 * F.col("nv") * (F.col("day_idx") - F.col("pd"))
        )
        / (F.col("nd") - F.col("pd"))
    ).cast("bigint")
    return ctx.select(
        "event_type",
        "day_idx",
        F.col("v").isNotNull().cast("int").alias("observed"),
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(), interp
        )
        .when(F.col("pv").isNotNull(), F.col("pv"))
        .otherwise(F.col("nv"))
        .alias("value_milli"),
    ).orderBy("event_type", "day_idx")


# ---------------------------------------------------------------------------
# Mergeable Bloom membership rollup (the OR-merge sibling of the HLL /
# quantile / count-min rollups — sketch quartet: distinct, quantile,
# frequency, MEMBERSHIP)

# 3 affine hashes over user_id; 64 words x 63 usable bits = 4032 bits
# per day. 63 bits/word keeps every mask off the sign bit so shift/OR
# semantics are identical (and ANSI-overflow-free) in Spark and DuckDB.
_BF_HASHES = [(0, 48271, 101), (1, 69621, 203), (2, 40692, 307)]
_BF_P = 2147483647
_BF_WORD_BITS = 63
_BF_WORDS = 64
_BF_M = _BF_WORDS * _BF_WORD_BITS
_BF_DIGEST_SALT = 2654435761  # Knuth multiplicative constant


@register(
    "events_bloom_membership_rollup",
    category="events",
    oracle=f"""
    WITH hcfg AS (
      SELECT * FROM (VALUES
        {', '.join(f'({j}, {a}, {b})' for j, a, b in _BF_HASHES)}
      ) h(j, a, b)
    ),
    pos AS (
      SELECT date_trunc('day', ts) AS day,
             ((h.a * user_id + h.b) % {_BF_P}) % {_BF_M} AS pos
      FROM events CROSS JOIN hcfg h
    ),
    daily AS (
      SELECT day, pos // {_BF_WORD_BITS} AS word,
             bit_or(CAST(1 AS BIGINT)
                    << CAST(pos % {_BF_WORD_BITS} AS INT)) AS bits
      FROM pos GROUP BY 1, 2
    ),
    weekly AS (
      SELECT CAST(date_trunc('week', day) AS DATE) AS week_start, word,
             bit_or(bits) AS bits
      FROM daily GROUP BY 1, 2
    ),
    digest AS (
      SELECT week_start,
             bit_xor(xor(bits, word * {_BF_DIGEST_SALT})) AS filter_digest
      FROM weekly GROUP BY week_start
    ),
    members AS (
      SELECT week_start, user_id, TRUE AS is_member FROM (
        SELECT week_start, user_id,
               ROW_NUMBER() OVER (PARTITION BY week_start
                                  ORDER BY user_id) AS rk
        FROM (SELECT DISTINCT CAST(date_trunc('week', ts) AS DATE)
                     AS week_start, user_id
              FROM events) e
      ) WHERE rk <= 3
    ),
    absent AS (
      SELECT w.week_start,
             (SELECT MAX(user_id) FROM events) + g.o AS user_id,
             FALSE AS is_member
      FROM (SELECT DISTINCT week_start FROM weekly) w,
           generate_series(1, 3) AS g(o)
    ),
    probes AS (SELECT * FROM members UNION ALL SELECT * FROM absent),
    checks AS (
      SELECT p.week_start, p.user_id, p.is_member,
             bool_and(
               (COALESCE(w.bits, 0)
                & (CAST(1 AS BIGINT) <<
                   CAST(((h.a * p.user_id + h.b) % {_BF_P}) % {_BF_M}
                        % {_BF_WORD_BITS} AS INT)))
               <> 0
             ) AS bloom_hit
      FROM probes p
      CROSS JOIN hcfg h
      LEFT JOIN weekly w
        ON w.week_start = p.week_start
       AND w.word = ((h.a * p.user_id + h.b) % {_BF_P}) % {_BF_M}
                    // {_BF_WORD_BITS}
      GROUP BY 1, 2, 3
    )
    SELECT c.week_start, c.user_id AS probe_user, c.is_member, c.bloom_hit,
           (c.bloom_hit OR NOT c.is_member) AS no_false_neg,
           d.filter_digest
    FROM checks c JOIN digest d ON c.week_start = d.week_start
    ORDER BY c.week_start, probe_user
    """,
)
def events_bloom_membership_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Mergeable MEMBERSHIP rollup: per-day Bloom words over user_id
    roll day→week by bitwise OR (associative, commutative, IDEMPOTENT —
    unlike the additive count-min counters, a replayed day cannot
    corrupt the filter), then each week's filter answers 'was this user
    active this week?' without touching raw events. Probes are the
    week's 3 lowest active users (must hit — Bloom filters have no
    false negatives; pinned by no_false_neg) and 3 ids beyond
    MAX(user_id) (genuinely absent; their bloom_hit exposes the
    false-positive behavior honestly at whatever the fill rate is).

    The whole sketch is integer arithmetic on literal affine-hash
    constants, so DuckDB replays build, merge, and probe bit-for-bit;
    filter_digest (xor over word-salted filter cells) additionally pins
    the merged filter CONTENTS cross-engine, so both engines must build
    the identical filter, not merely agree on probe outcomes.

    Scale: the build explodes each event into 3 positions whose word-OR
    partial-aggregates MAP-SIDE — the shuffle carries at most
    days × 64 word rows regardless of event volume; the week merge and
    the probe join move only filter rows. The maintained streaming form
    is stream_bloom_maintenance (same words, OR-merged per micro-batch
    via update_rollup or_measures)."""
    e = t(spark, sf_dir, "events")
    pos = e.select(
        F.date_trunc("day", "ts").alias("day"),
        F.explode(
            F.array(
                *[
                    (F.lit(a) * F.col("user_id") + F.lit(b)) % _BF_P % _BF_M
                    for _, a, b in _BF_HASHES
                ]
            )
        ).alias("pos"),
    )
    daily = (
        pos.select(
            "day",
            F.expr(f"pos DIV {_BF_WORD_BITS}").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"CAST(pos % {_BF_WORD_BITS} AS INT))"
            ).alias("mask"),
        )
        .groupBy("day", "word")
        .agg(F.bit_or("mask").alias("bits"))
    )
    weekly = daily.groupBy(
        F.date_trunc("week", "day").cast("date").alias("week_start"), "word"
    ).agg(F.bit_or("bits").alias("bits"))

    digest = weekly.groupBy("week_start").agg(
        F.bit_xor(
            F.col("bits").bitwiseXOR(F.col("word") * F.lit(_BF_DIGEST_SALT))
        ).alias("filter_digest")
    )

    wk = W.partitionBy("week_start").orderBy("user_id")
    members = (
        e.select(
            F.date_trunc("week", "ts").cast("date").alias("week_start"),
            "user_id",
        )
        .distinct()
        .withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= 3)
        .select("week_start", "user_id", F.lit(True).alias("is_member"))
    )
    maxu = e.agg(F.max("user_id").alias("mu"))
    absent = (
        weekly.select("week_start")
        .distinct()
        .crossJoin(F.broadcast(maxu))
        .select(
            "week_start",
            F.explode(
                F.array(*[(F.col("mu") + F.lit(o)) for o in (1, 2, 3)])
            ).alias("user_id"),
            F.lit(False).alias("is_member"),
        )
    )
    probes = members.unionByName(absent)

    hj = F.explode(
        F.array(
            *[
                (
                    (F.lit(a) * F.col("user_id") + F.lit(b)) % _BF_P % _BF_M
                )
                for _, a, b in _BF_HASHES
            ]
        )
    ).alias("pos")
    pp = probes.select("week_start", "user_id", "is_member", hj).select(
        "week_start",
        "user_id",
        "is_member",
        F.expr(f"pos DIV {_BF_WORD_BITS}").alias("word"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), "
            f"CAST(pos % {_BF_WORD_BITS} AS INT))"
        ).alias("mask"),
    )
    hit = F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask")) != 0
    checks = (
        pp.join(F.broadcast(weekly), ["week_start", "word"], "left")
        .withColumn("hit", hit)
        .groupBy("week_start", "user_id", "is_member")
        .agg(F.bool_and("hit").alias("bloom_hit"))
    )
    return (
        checks.join(F.broadcast(digest), "week_start")
        .select(
            "week_start",
            F.col("user_id").alias("probe_user"),
            "is_member",
            "bloom_hit",
            (F.col("bloom_hit") | ~F.col("is_member")).alias("no_false_neg"),
            "filter_digest",
        )
        .orderBy("week_start", "probe_user")
    )
