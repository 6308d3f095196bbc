"""Core relational operators: scan/project/filter, every join type, and
the aggregation surface (SURVEY.md §2-B).

These are the queries the reference provisions by loading data into a
columnar warehouse (reference README.md:13-15); here they run natively on
Spark. Each is written so the physical plan is the one you'd want at
100 TB: filters/projections push to the parquet scan, dimension joins are
broadcast (no shuffle of the fact table), aggregations use partial
(map-side) aggregation, and sums are decimal-exact so results are
partitioning-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ._helpers import davg, dsum, sql_davg, sql_dsum, t

# ---------------------------------------------------------------------------
# Flagship: TPC-H Q1-shaped pricing summary (scan → filter → groupBy → sort).
# The watermark-style shipdate filter mirrors the reference's incremental
# predicate pushdown (reference clickhouse_backend.py:217,227 builds
# `where pk > max ORDER BY pk` pushed into the source scan).
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    category="aggregate",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Scan / projection / filter (reference A23 `_query_table`: select cols +
# where + limit probes, clickhouse_backend.py:182-187)
# ---------------------------------------------------------------------------


@register(
    "scan_project_filter",
    category="scan",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE o_orderstatus = 'O' AND o_totalprice > 150000.0
    ORDER BY o_orderkey
    """,
)
def scan_project_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + predicate; both reach the parquet scan (PushedFilters +
    ReadSchema show only the 4 referenced columns at any scale)."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
        .filter((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") > 150000.0))
        .drop("o_orderstatus")
        .orderBy("o_orderkey")
    )


@register(
    "filter_in_like_between",
    category="filter",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size
    FROM part
    WHERE p_brand IN ('Brand#1', 'Brand#7', 'Brand#13')
      AND p_type LIKE 'PROMO%'
      AND p_size BETWEEN 10 AND 40
      AND p_name IS NOT NULL
    ORDER BY p_partkey
    """,
)
def filter_in_like_between(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN / LIKE / BETWEEN / null-test predicate surface (reference builds
    these via f-string SQL, e.g. ilike probe snowflake_backend.py:62)."""
    return (
        t(spark, sf_dir, "part")
        .filter(
            F.col("p_brand").isin("Brand#1", "Brand#7", "Brand#13")
            & F.col("p_type").like("PROMO%")
            & F.col("p_size").between(10, 40)
            & F.col("p_name").isNotNull()
        )
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
        .orderBy("p_partkey")
    )


# ---------------------------------------------------------------------------
# Joins (reference joins inventoried in SURVEY §2: LEFT JOIN catalog query
# pgwarehouse.py:229; semi-join delete clickhouse_backend.py:264; MERGE
# equi-join snowflake_backend.py:205). All equi-joins here shuffle on the
# join key unless the dim side is broadcast; Catalyst+AQE pick the strategy.
# ---------------------------------------------------------------------------


@register(
    "join_inner_agg",
    category="join",
    oracle=f"""
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           {sql_dsum('o.o_totalprice')} AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def join_inner_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈dim inner join. No forced hint: under the broadcast
    threshold AQE builds a broadcast join (orders never shuffles — one
    exchange total, for the groupBy); past it, customer is no longer
    broadcastable and the planner falls back to a shuffle join instead
    of a forced driver-side OOM."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "join_left_outer",
    category="join",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           COUNT(o.o_orderkey) AS n_orders,
           COALESCE({sql_dsum('o.o_totalprice')}, 0.0) AS spend
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY c.c_custkey
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving customers with zero orders (the shape of
    the reference's catalog LEFT JOIN, pgwarehouse.py:229)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("spend"),
        )
        .orderBy("c_custkey")
    )


@register(
    "join_right_outer",
    category="join",
    oracle="""
    SELECT o.o_orderkey, c.c_name
    FROM orders o RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_acctbal < 0
    ORDER BY c.c_name, o.o_orderkey
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "right")
        .filter(F.col("c_acctbal") < 0)
        .select("o_orderkey", "c_name")
        .orderBy("c_name", "o_orderkey")
    )


@register(
    "join_full_outer",
    category="join",
    oracle="""
    SELECT n.n_nationkey, n.n_name, agg.n_cust
    FROM nation n
    FULL JOIN (
        SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey
    ) agg ON n.n_nationkey = agg.c_nationkey
    ORDER BY n.n_nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = t(spark, sf_dir, "nation")
    c = t(spark, sf_dir, "customer")
    agg = c.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n_cust"))
    return (
        n.join(agg, n.n_nationkey == agg.c_nationkey, "full")
        .select("n_nationkey", "n_name", "n_cust")
        .orderBy("n_nationkey")
    )


@register(
    "join_semi",
    category="join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000.0
    )
    ORDER BY c_custkey
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join = EXISTS. This is the Spark form of the reference's
    ClickHouse delete `WHERE pk IN (SELECT pk FROM t__changes)`
    (clickhouse_backend.py:264)."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000.0)
    c = t(spark, sf_dir, "customer")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_anti",
    category="join",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    ORDER BY c_custkey
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join = NOT EXISTS — the keep-unmatched half of the
    reference's delete-then-insert merge (clickhouse_backend.py:263-269)."""
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_star_broadcast",
    category="join",
    oracle=f"""
    SELECT r.r_name AS region, n.n_name AS nation,
           COUNT(*) AS n_items,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    ORDER BY region, nation
    """,
)
def join_star_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema join: every dim broadcast, so the 100 TB fact table is
    scanned exactly once with zero join shuffles; the only shuffle is the
    final (tiny) groupBy on region×nation."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
        .orderBy("region", "nation")
    )


@register(
    "join_range_nonequi",
    category="join",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, p.p_partkey
    FROM lineitem l JOIN part p
      ON l.l_partkey = p.p_partkey
     AND l.l_extendedprice > p.p_retailprice * 24.0
    ORDER BY l.l_orderkey, l.l_linenumber, p.p_partkey
    """,
)
def join_range_nonequi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi key + non-equi range condition. Catalyst plans the equi part as
    the join key (hash/broadcast) and evaluates the range predicate as a
    post-join filter — the scalable shape for theta-joins (never a pure
    cartesian product)."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    return (
        li.join(
            p,
            (li.l_partkey == p.p_partkey)
            & (li.l_extendedprice > p.p_retailprice * 24.0),
        )
        .select("l_orderkey", "l_linenumber", "p_partkey")
        .orderBy("l_orderkey", "l_linenumber", "p_partkey")
    )


# ---------------------------------------------------------------------------
# Aggregation surface (reference A11 max-watermark, A18 count(*), catalog
# size sums pgwarehouse.py:220-232; everything else provisioned via the
# warehouse).
# ---------------------------------------------------------------------------


@register(
    "agg_basic",
    category="aggregate",
    oracle=f"""
    SELECT o_orderpriority,
           COUNT(*) AS n,
           MIN(o_totalprice) AS min_price,
           MAX(o_totalprice) AS max_price,
           {sql_dsum('o_totalprice')} AS sum_price,
           {sql_davg('o_totalprice')} AS avg_price
    FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
            dsum("o_totalprice").alias("sum_price"),
            davg("o_totalprice").alias("avg_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "agg_count_distinct",
    category="aggregate",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct counts (Spark expands to a two-phase partial/final
    plan). The approximate HLL variant is `agg_approx_distinct`."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_approx_distinct",
    category="aggregate",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS orders_within_bounds,
           TRUE AS parts_within_bounds
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="approx_count_distinct (HyperLogLog++): the 100 TB-scale path for "
    "distinct counts — single pass, fixed memory, no distinct expansion. "
    "HLL sketches are engine-specific, so the oracle checks the *verdict*: "
    "Spark computes both the approximate and exact counts per group and "
    "emits within_bounds = |approx-exact|/exact <= 3*rsd, which the SQL "
    "oracle reproduces as the exact counts plus literal TRUE. A sketch "
    "drifting outside its published error bound turns the row red.",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    rsd = 0.01
    bound = 3 * rsd

    def within(approx: str, exact: str):
        rel_err = F.abs(F.col(approx) - F.col(exact)) / F.col(exact)
        return rel_err <= bound

    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_orderkey", rsd=rsd).alias("approx_orders"),
            F.approx_count_distinct("l_partkey", rsd=rsd).alias("approx_parts"),
            F.countDistinct("l_orderkey").alias("exact_orders"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "l_returnflag",
            "exact_orders",
            "exact_parts",
            within("approx_orders", "exact_orders").alias("orders_within_bounds"),
            within("approx_parts", "exact_parts").alias("parts_within_bounds"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "agg_rollup",
    category="aggregate",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n, {sql_dsum('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .rollup("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("sum_price"))
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@register(
    "agg_cube",
    category="aggregate",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("sum_qty"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "agg_grouping_sets",
    category="aggregate",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           {sql_dsum('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = t(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders")
    return spark.sql(
        f"""
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
               {sql_dsum('o_totalprice')} AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
        """
    )


@register(
    "agg_having",
    category="aggregate",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n_orders
    FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 12
    ORDER BY o_custkey
    """,
)
def agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") >= 12)
        .orderBy("o_custkey")
    )


@register(
    "agg_stats",
    category="aggregate",
    oracle=f"""
    SELECT l_linestatus,
           CAST(ROUND(STDDEV_SAMP(l_quantity), 6) AS DOUBLE) AS sd_qty,
           CAST(ROUND(VAR_SAMP(l_quantity), 6) AS DOUBLE) AS var_qty,
           {sql_davg('l_quantity')} AS mean_qty
    FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/variance; rounded to 6 decimals — the one place cross-engine
    float accumulation order can differ (relative error ~1e-12, far from
    the 5e-7 rounding boundary)."""
    return (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_linestatus")
        .agg(
            F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
            F.round(F.var_samp("l_quantity"), 6).alias("var_qty"),
            davg("l_quantity").alias("mean_qty"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "agg_collect_ordered",
    category="aggregate",
    oracle="""
    SELECT lang,
           string_agg(DISTINCT source, ',' ORDER BY source) AS sources_csv,
           COUNT(DISTINCT source) AS n_sources,
           COUNT(*) AS n_docs
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def agg_collect_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg family): the
    collect_set is order-nondeterministic under parallelism, so the sort
    happens *after* collection (array_sort) — the only way a distributed
    listagg can be deterministic. The set of distinct sources per group is
    tiny, so the array never strains the row size."""
    return (
        t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.concat_ws(",", F.array_sort(F.collect_set("source"))).alias(
                "sources_csv"
            ),
            F.countDistinct("source").alias("n_sources"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy("lang")
    )


@register(
    "agg_histogram_equi_width",
    category="aggregate",
    oracle="""
    WITH b AS (SELECT MIN(o_totalprice) AS mn, MAX(o_totalprice) AS mx FROM orders)
    SELECT CAST(LEAST(FLOOR((o_totalprice - mn) / ((mx - mn) / 10.0)), 9) AS INT)
             AS bucket,
           COUNT(*) AS n
    FROM orders CROSS JOIN b GROUP BY bucket ORDER BY bucket
    """,
)
def agg_histogram_equi_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram with data-driven bounds: one global min/max
    aggregate (a single tiny row, broadcast to every task), then a pure
    per-row bucket expression and a 10-group aggregate. Two passes over
    the data but no wide shuffle — the groupBy has 10 keys, so the
    map-side partial aggregation reduces each partition to ≤10 rows.
    Bucketing arithmetic is identical double ops in both engines, so the
    boundaries are bit-exact."""
    orders = t(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    bucket = F.least(
        F.floor(
            (F.col("o_totalprice") - F.col("mn"))
            / ((F.col("mx") - F.col("mn")) / 10.0)
        ),
        F.lit(9),
    ).cast("int")
    return (
        orders.crossJoin(F.broadcast(bounds))
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("bucket")
    )


@register(
    "agg_pivot",
    category="aggregate",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_o,
           {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_f
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot = groupBy().pivot(col, values).agg — with explicit value list so
    no extra distinct-scan pass is needed (required at 100 TB)."""
    df = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum("l_quantity"))
    )
    return (
        df.withColumnRenamed("O", "qty_o")
        .withColumnRenamed("F", "qty_f")
        .orderBy("l_returnflag")
    )


@register(
    "sort_limit_topn",
    category="sort",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25
    """,
)
def sort_limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N: Spark plans this as TakeOrderedAndProject — each
    partition keeps its local top-25, the driver merges — O(N) scan, no
    global sort shuffle. Tie-broken on the unique key for determinism."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


@register(
    "agg_skew_salted_distinct",
    category="aggregate",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type ORDER BY event_type
    """,
)
def agg_skew_salted_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant exact distinct count via salting. A plain
    groupBy(event_type) has final-stage parallelism = #distinct types (a
    handful), so one hot type serializes on one reducer at 100 TB. Salt
    = pmod(xxhash64(user_id), 32) routes each user to exactly ONE salt
    bucket, so per-bucket COUNT(DISTINCT) values are disjoint and their
    SUM is the exact answer — the hot key's distinct-state is spread
    across 32 reducers, then reduced by a trivially small second agg.
    Same technique pre-spreads a skewed shuffle-join key (replicate the
    small side per salt); for joins AQE skew-split handles it at runtime,
    but salting is the only lever for aggregation state."""
    n_salt = 32
    e = t(spark, sf_dir, "events")
    per_bucket = (
        e.withColumn("salt", F.pmod(F.xxhash64("user_id"), F.lit(n_salt)))
        .groupBy("event_type", "salt")
        .agg(F.count_distinct("user_id").alias("d"))
    )
    return (
        per_bucket.groupBy("event_type")
        .agg(F.sum("d").alias("n_users"))
        .orderBy("event_type")
    )


@register(
    "join_cross",
    category="join",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation
    FROM region r CROSS JOIN nation n
    ORDER BY region, nation
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit Cartesian product (crossJoin) — only ever sane between
    bounded dimension tables; Spark plans it as BroadcastNestedLoopJoin
    when one side broadcasts. Fact-side cross joins are a scale bug, not
    an operator: anything unbounded must carry an equi/range condition."""
    r = t(spark, sf_dir, "region").select(F.col("r_name").alias("region"))
    n = t(spark, sf_dir, "nation").select(F.col("n_name").alias("nation"))
    return r.crossJoin(n).orderBy("region", "nation")


@register(
    "filter_ilike_probe",
    category="filter",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_name ILIKE '%customer#00000012%' AND c_mktsegment <> ''
    ORDER BY c_custkey
    """,
)
def filter_ilike_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive LIKE — the reference's existence probe idiom
    (`information_schema ... ilike`, snowflake_backend.py:62) as a query
    over data. The equality conjunct still reaches the scan as a pushed
    filter; the ILIKE evaluates JVM-side post-scan."""
    c = t(spark, sf_dir, "customer")
    return (
        c.filter(
            F.col("c_name").ilike("%Customer#00000012%")
            & (F.col("c_mktsegment") != "")
        )
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@register(
    "join_skew_salted",
    category="join",
    oracle="""
    SELECT e.event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_bal
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY e.event_type ORDER BY e.event_type
    """,
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant shuffle join via salting, the manual form of AQE's
    skew-split (which only triggers on observed partition-size skew):
    the fact side appends salt = pmod(xxhash64(monotonic row id), S) to
    its join key; the build side is replicated S× with every salt value
    (explode of a literal range — S× the SMALL side, never the fact).
    Each hot key's rows then spread across S reducers instead of one.
    Result is verified equal to the plain join. The salt here derives
    from a per-row id, NOT rand(): deterministic under retries — a
    failed-task re-run salts identically, which rand() would not (a
    correctness hazard in any retried shuffle)."""
    n_salt = 8
    e = t(spark, sf_dir, "events")
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    salted_fact = e.select(
        "user_id",
        "event_type",
        F.pmod(F.xxhash64("event_id"), F.lit(n_salt)).alias("salt"),
    )
    replicated_dim = c.select(
        "c_custkey",
        "c_acctbal",
        F.explode(F.array(*[F.lit(s) for s in range(n_salt)])).alias("salt"),
    )
    return (
        salted_fact.join(
            # shuffle_hash hint: at test SF the replicated dim is tiny
            # and would auto-broadcast, which never skews — force the
            # shuffle plan the technique exists for.
            replicated_dim.hint("shuffle_hash"),
            (salted_fact.user_id == replicated_dim.c_custkey)
            & (salted_fact.salt == replicated_dim.salt),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("c_acctbal").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_bal"),
        )
        .orderBy("event_type")
    )


@register(
    "agg_corr_regression",
    category="aggregate",
    oracle=f"""
    WITH m AS (
      SELECT event_type,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(HOUR(ts) AS BIGINT)) AS DOUBLE) AS sx,
             CAST(SUM(CAST(HOUR(ts) AS BIGINT) * CAST(HOUR(ts) AS BIGINT))
                  AS DOUBLE) AS sxx,
             {sql_dsum('value')} AS sy,
             {sql_dsum('value * value', 4)} AS syy,
             {sql_dsum('CAST(HOUR(ts) AS DOUBLE) * value', 4)} AS sxy
      FROM events GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_rows,
           (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
           (sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n
             AS intercept,
           (n * sxy - sx * sy)
             / SQRT((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr,
           ((n * sxy - sx * sy) * (n * sxy - sx * sy))
             / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
    FROM m ORDER BY event_type
    """,
)
def agg_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORR / REGR_SLOPE / REGR_INTERCEPT / REGR_R2 (value vs. hour of
    day, per event type) — the bivariate statistical aggregate family.
    Not Spark's built-in corr()/regr_*(): those accumulate doubles in
    partition order, so their last ulps differ run-to-run and engine-to-
    engine. Instead the five raw moments (n, Σx, Σx², Σy, Σy², Σxy) are
    computed exactly — integer sums for the hour terms, decimal-cast sums
    (see _helpers) for the value terms — and the statistics derived from
    them with the same double expression tree the oracle SQL spells out,
    making every output bit-identical at any partition count.

    Scale: one pass, map-side-combinable (moments are additive), output
    cardinality = |event_type|. The exact-moment trick is also the only
    way a 1000-executor corr() is reproducible against a re-run with
    different partitioning — built-in floating accumulation is not."""
    e = t(spark, sf_dir, "events")
    x = F.hour("ts").cast("bigint")
    m = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(x * x).cast("double").alias("sxx"),
        dsum("value").alias("sy"),
        dsum(F.col("value") * F.col("value"), 4).alias("syy"),
        dsum(F.hour("ts").cast("double") * F.col("value"), 4).alias("sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    num = n * sxy - sx * sy
    dx = n * sxx - sx * sx
    dy = n * syy - sy * sy
    slope = num / dx
    return m.select(
        "event_type",
        n.cast("bigint").alias("n_rows"),
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
        (num / F.sqrt(dx * dy)).alias("corr"),
        ((num * num) / (dx * dy)).alias("r2"),
    ).orderBy("event_type")


@register(
    "agg_mode_deterministic",
    category="aggregate",
    oracle="""
    WITH counts AS (
      SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n
      FROM documents GROUP BY lang, source
    ),
    ranked AS (
      SELECT lang, source, n,
             ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY n DESC, source
             ) AS rk
      FROM counts
    )
    SELECT lang, source AS mode_source, n AS mode_count
    FROM ranked WHERE rk = 1 ORDER BY lang
    """,
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MODE() / most-frequent-value aggregate with a deterministic
    tie-break (highest count, then lexicographically smallest value) —
    built-in mode() in both engines picks an arbitrary winner on ties,
    which is unacceptable anywhere results are compared across runs.

    Scale: the count collapses the corpus to |lang × source| rows
    map-side; the rank window then runs on that collapsed frame and
    Catalyst turns rk=1 into a WindowGroupLimit (per-partition running
    top-1, nothing group-sized is buffered)."""
    d = t(spark, sf_dir, "documents")
    counts = d.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("lang").orderBy(F.col("n").desc(), "source")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("lang", F.col("source").alias("mode_source"), F.col("n").alias("mode_count"))
        .orderBy("lang")
    )


@register(
    "join_interval_banded",
    category="join",
    oracle="""
    WITH p AS (
      SELECT quantile_cont(o_totalprice, 0.00) AS p0,
             quantile_cont(o_totalprice, 0.25) AS p1,
             quantile_cont(o_totalprice, 0.50) AS p2,
             quantile_cont(o_totalprice, 0.75) AS p3,
             quantile_cont(o_totalprice, 0.90) AS p4,
             quantile_cont(o_totalprice, 1.00) AS p5
      FROM orders
    ),
    bands AS (
      SELECT 0 AS band_id, p0 AS lo, p1 AS hi FROM p UNION ALL
      SELECT 1, p1, p2 FROM p UNION ALL
      SELECT 2, p2, p3 FROM p UNION ALL
      SELECT 3, p3, p4 FROM p UNION ALL
      SELECT 4, p4, p5 + 1.0 FROM p UNION ALL
      SELECT 5, p3, p5 + 1.0 FROM p
    )
    SELECT band_id, lo, hi, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM bands b JOIN orders o
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY band_id, lo, hi ORDER BY band_id
    """,
)
def join_interval_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure interval-containment join (no equi key, overlapping intervals
    allowed — band 5 deliberately overlaps bands 3-4) via the BANDING
    rewrite: quantize the value domain into grid cells, explode each
    interval into the cells it overlaps, equi-join on the cell, then
    refine with the exact containment predicate. The oracle does the
    naive BETWEEN join.

    Scale: a naive theta-join is a broadcast-nested-loop —
    O(rows × intervals) compare operations with no pruning. Banding makes
    it an equi hash join: each row probes exactly one cell, each interval
    replicates into (width/step) cells, so cost is O(rows + intervals ×
    avg_cells + true_matches·refine). With a 100M-row band table (IP
    geolocation, tariff schedules) the banded form is the only one that
    finishes; the grid granularity trades replication against refine
    selectivity. Candidate generation is a superset by monotonicity of
    the cell function, so float rounding at cell edges cannot lose a
    match — the refine predicate decides membership exactly."""
    o = t(spark, sf_dir, "orders")
    p = o.agg(
        *[
            F.expr(f"percentile(o_totalprice, {q})").alias(f"p{i}")
            for i, q in enumerate([0.0, 0.25, 0.5, 0.75, 0.9, 1.0])
        ]
    )
    edges = [(0, "p0", "p1"), (1, "p1", "p2"), (2, "p2", "p3"),
             (3, "p3", "p4"), (4, "p4", None), (5, "p3", None)]
    bands = p.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band_id"),
                        F.col(lo).alias("lo"),
                        (
                            F.col("p5") + 1.0 if hi is None else F.col(hi)
                        ).alias("hi"),
                    )
                    for i, lo, hi in edges
                ]
            )
        ).alias("b"),
        F.col("p0").alias("mn"),
        (
            F.greatest((F.col("p5") + 1.0 - F.col("p0")) / 64.0, F.lit(1e-9))
        ).alias("step"),
    ).select("b.*", "mn", "step")
    cell = lambda v: F.floor((v - F.col("mn")) / F.col("step")).cast("int")
    band_cells = bands.select(
        "band_id", "lo", "hi",
        F.explode(F.sequence(cell(F.col("lo")), cell(F.col("hi")))).alias("cell"),
    )
    rows = o.select("o_totalprice").crossJoin(
        F.broadcast(bands.select("mn", "step").limit(1))
    ).select("o_totalprice", cell(F.col("o_totalprice")).alias("cell"))
    return (
        rows.join(F.broadcast(band_cells), "cell")
        .filter(
            (F.col("o_totalprice") >= F.col("lo"))
            & (F.col("o_totalprice") < F.col("hi"))
        )
        .groupBy("band_id", "lo", "hi")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy("band_id")
    )


@register(
    "join_copurchase_pairs",
    category="join",
    oracle="""
    WITH pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    )
    SELECT part_a, part_b, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM pairs GROUP BY part_a, part_b
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 20
    """,
)
def join_copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: the top part pairs bought together in
    one order — a self-join of the fact table on its grouping key, the
    affinity/association primitive.

    Scale: the self-join shuffles lineitem ONCE on l_orderkey (both
    sides share the exchange; Catalyst reuses it) and the per-order pair
    fan-out is quadratic in basket size — bounded at ~7 lines for TPC-H,
    and in general capped by collecting each basket to an array first
    and exploding combinations only for baskets under a size limit. The
    pair counts partial-aggregate map-side and TakeOrdered keeps only
    the head — nothing pair-space-sized is ever sorted globally."""
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(20)
    )


@register(
    "agg_approx_percentile",
    category="aggregate",
    oracle="""
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           TRUE AS p50_within_bounds,
           TRUE AS p95_within_bounds
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="approx_percentile (Greenwald-Khanna sketch): the fixed-memory "
    "single-pass quantile path for 100 TB inputs. Sketch VALUES are "
    "merge-order-specific, so — like agg_approx_distinct — the oracle "
    "checks the published RANK-ERROR bound as a verdict: Spark counts "
    "rows strictly below / at-or-below each approximate quantile and "
    "asserts the rank lands within p*n ± n/accuracy; the SQL oracle "
    "reproduces the exact group sizes plus literal TRUE. A sketch "
    "drifting outside its guarantee turns the row red.",
)
def agg_approx_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    accuracy = 1000  # rank error <= n / accuracy
    li = t(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    approx = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_quantity", 0.5, accuracy).alias("a50"),
        F.percentile_approx("l_quantity", 0.95, accuracy).alias("a95"),
        F.count(F.lit(1)).alias("n_rows"),
    )

    def verdict(p: str, frac: float):
        # GK guarantee: the returned value's rank r satisfies
        # (frac - eps)*n <= r <= (frac + eps)*n with eps = 1/accuracy.
        # cnt_le >= lower bound AND cnt_lt <= upper bound pins it using
        # only exact integer counts.
        eps_n = F.col("n_rows").cast("double") / accuracy
        lower = frac * F.col("n_rows").cast("double") - eps_n
        upper = frac * F.col("n_rows").cast("double") + eps_n
        return (F.col(f"cnt_le_{p}").cast("double") >= lower) & (
            F.col(f"cnt_lt_{p}").cast("double") <= upper
        )

    ranked = (
        li.join(F.broadcast(approx), "l_returnflag")
        .groupBy("l_returnflag", "n_rows")
        .agg(
            F.sum((F.col("l_quantity") <= F.col("a50")).cast("long")).alias(
                "cnt_le_p50"
            ),
            F.sum((F.col("l_quantity") < F.col("a50")).cast("long")).alias(
                "cnt_lt_p50"
            ),
            F.sum((F.col("l_quantity") <= F.col("a95")).cast("long")).alias(
                "cnt_le_p95"
            ),
            F.sum((F.col("l_quantity") < F.col("a95")).cast("long")).alias(
                "cnt_lt_p95"
            ),
        )
    )
    return (
        ranked.select(
            "l_returnflag",
            F.col("n_rows").cast("bigint").alias("n_rows"),
            verdict("p50", 0.5).alias("p50_within_bounds"),
            verdict("p95", 0.95).alias("p95_within_bounds"),
        )
        .orderBy("l_returnflag")
    )


# ---------------------------------------------------------------------------
# Fuzzy (edit-distance) similarity join
# ---------------------------------------------------------------------------

_FUZZY_MAX_DIST = 3


@register(
    "join_fuzzy_levenshtein",
    category="join",
    oracle=f"""
    WITH names AS (
      SELECT p_name AS name, CAST(COUNT(*) AS BIGINT) AS n
      FROM part GROUP BY p_name
    ),
    b AS (SELECT name, n, string_split(name, ' ')[-1] AS blk FROM names)
    SELECT a.name AS name1, c.name AS name2,
           CAST(levenshtein(a.name, c.name) AS INT) AS dist,
           a.n AS n1, c.n AS n2
    FROM b a JOIN b c ON a.blk = c.blk AND a.name < c.name
    WHERE levenshtein(a.name, c.name) <= {_FUZZY_MAX_DIST}
    ORDER BY name1, name2
    """,
    doc="Fuzzy self-join (record linkage): near-identical part names at "
    "edit distance <= 3, blocked on the trailing token so the quadratic "
    "verify runs only inside blocks — the standard blocking+verify "
    "linkage shape. Both engines implement unit-cost Levenshtein, so "
    "distances hash-match exactly.",
)
def join_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking + verify, the scale shape for fuzzy matching: (1)
    collapse the corpus to its distinct-name dictionary with weights
    (one groupBy — at 100 TB names ≪ rows, exactly like the dedup
    collapse); (2) equi-join on a blocking key (here the trailing
    token; phonetic keys or q-gram prefixes slot in identically), which
    turns the all-pairs O(D²) comparison into O(Σ block²); (3) verify
    candidates with the exact edit-distance predicate, JVM-side
    (F.levenshtein codegen — never a Python UDF). A hot-block cap
    (mirror of the dedup hot-shingle guard) is the knob if one blocking
    key degenerates."""
    p = t(spark, sf_dir, "part")
    names = p.groupBy(F.col("p_name").alias("name")).agg(
        F.count(F.lit(1)).alias("n")
    )
    blocked = names.select(
        "name", "n", F.element_at(F.split(F.col("name"), " "), -1).alias("blk")
    )
    a = blocked.alias("a")
    c = blocked.alias("c")
    dist = F.levenshtein(F.col("a.name"), F.col("c.name"))
    return (
        a.join(
            c,
            (F.col("a.blk") == F.col("c.blk"))
            & (F.col("a.name") < F.col("c.name")),
        )
        .filter(dist <= _FUZZY_MAX_DIST)
        .select(
            F.col("a.name").alias("name1"),
            F.col("c.name").alias("name2"),
            dist.cast("int").alias("dist"),
            F.col("a.n").alias("n1"),
            F.col("c.n").alias("n2"),
        )
        .orderBy("name1", "name2")
    )


@register(
    "agg_percentile_weighted",
    category="aggregate",
    oracle="""
    WITH grouped AS (
      SELECT l_returnflag,
             l_extendedprice AS price,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS w
      FROM lineitem GROUP BY l_returnflag, l_extendedprice
    ),
    cum AS (
      SELECT l_returnflag, price, w,
             CAST(SUM(CAST(w AS DECIMAL(18,6))) OVER (
               PARTITION BY l_returnflag ORDER BY price
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS DOUBLE) AS cw,
             CAST(SUM(CAST(w AS DECIMAL(18,6))) OVER (
               PARTITION BY l_returnflag
             ) AS DOUBLE) AS total_w
      FROM grouped
    )
    SELECT l_returnflag,
           MIN(CASE WHEN cw >= 0.25 * total_w THEN price END) AS p25_weighted,
           MIN(CASE WHEN cw >= 0.50 * total_w THEN price END) AS median_weighted,
           MIN(CASE WHEN cw >= 0.90 * total_w THEN price END) AS p90_weighted
    FROM cum GROUP BY l_returnflag ORDER BY l_returnflag
    """,
    doc="Exact weighted percentiles (price weighted by quantity) per "
    "group — the inventory-weighted distribution cut every pricing/"
    "capacity report needs and percentile_approx cannot answer exactly. "
    "Values pre-aggregate to (group, price) grain FIRST (removing "
    "duplicate order-keys entirely — the running frame is then over a "
    "unique-keyed sequence, so no tie-order ambiguity cross-engine), "
    "then one per-group ordered window computes decimal-exact "
    "cumulative weights and each percentile is a conditional MIN over "
    "the threshold — three percentiles from ONE sort, no re-scan. "
    "Scale: the pre-aggregation is map-side combinable and typically "
    "collapses 1000×; the per-group window shuffles the collapsed "
    "frame once on the group key.",
)
def agg_percentile_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    grouped = li.groupBy(
        "l_returnflag", F.col("l_extendedprice").alias("price")
    ).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,6)"))
        .cast("double")
        .alias("w")
    )
    w_cum = (
        W.partitionBy("l_returnflag")
        .orderBy("price")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    w_tot = W.partitionBy("l_returnflag")
    cum = grouped.select(
        "l_returnflag",
        "price",
        F.sum(F.col("w").cast("decimal(18,6)"))
        .over(w_cum)
        .cast("double")
        .alias("cw"),
        F.sum(F.col("w").cast("decimal(18,6)"))
        .over(w_tot)
        .cast("double")
        .alias("total_w"),
    )
    def cut(p: float, name: str):
        return F.min(
            F.when(F.col("cw") >= p * F.col("total_w"), F.col("price"))
        ).alias(name)
    return (
        cum.groupBy("l_returnflag")
        .agg(
            cut(0.25, "p25_weighted"),
            cut(0.50, "median_weighted"),
            cut(0.90, "p90_weighted"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "join_cardinality_estimate",
    category="join",
    oracle="""
    WITH k AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY l_partkey
    ),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS left_rows,
             CAST(COUNT(*) AS BIGINT) AS distinct_keys,
             CAST(SUM(n * n) AS BIGINT) AS predicted_join_rows,
             CAST(MAX(n) AS BIGINT) AS max_key_rows
      FROM k
    ),
    top5 AS (
      SELECT CAST(SUM(sq) AS BIGINT) AS top5_sq FROM (
        SELECT n * n AS sq FROM k ORDER BY n DESC, l_partkey ASC LIMIT 5
      )
    )
    SELECT left_rows, distinct_keys, predicted_join_rows, max_key_rows,
           CAST((1000000 * top5_sq) // predicted_join_rows AS BIGINT)
             AS top5_share_ppm
    FROM tot CROSS JOIN top5
    """,
    doc="Exact join-cardinality prediction from per-key counts — the "
    "'will this join explode?' planning primitive: for a self-join on "
    "l_partkey the output size is exactly SUM(n_k^2) over the key "
    "histogram, computable from one aggregation WITHOUT running the "
    "join. Emits one row: input rows, distinct keys, predicted join "
    "rows, the heaviest key's count, and the top-5 keys' share of the "
    "predicted output in ppm (integer division — no float) — high "
    "share = skew-salt before joining, high predicted/input ratio = "
    "reconsider the join. Scale: the histogram is one map-side-"
    "combinable groupBy (shuffle = distinct keys, not rows); the "
    "top-5 is a 5-row TakeOrdered; totals cross-join as one-row "
    "broadcasts. This is precisely the statistic AQE's skew detection "
    "consumes — exposed as a query so a pipeline can gate on it "
    "BEFORE committing to a 100 TB shuffle.",
)
def join_cardinality_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    k = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n"))
    tot = k.agg(
        F.sum("n").cast("bigint").alias("left_rows"),
        F.count(F.lit(1)).cast("bigint").alias("distinct_keys"),
        F.sum(F.col("n") * F.col("n")).cast("bigint").alias(
            "predicted_join_rows"
        ),
        F.max("n").cast("bigint").alias("max_key_rows"),
    )
    top5 = (
        k.orderBy(F.col("n").desc(), F.col("l_partkey").asc())
        .limit(5)
        .agg(F.sum(F.col("n") * F.col("n")).cast("bigint").alias("top5_sq"))
    )
    return tot.crossJoin(F.broadcast(top5)).select(
        "left_rows",
        "distinct_keys",
        "predicted_join_rows",
        "max_key_rows",
        F.expr("CAST((1000000 * top5_sq) DIV predicted_join_rows AS BIGINT)")
        .alias("top5_share_ppm"),
    )
