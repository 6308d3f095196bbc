"""Scalar-function surface: string / date / math / JSON / array /
conditional expressions (SURVEY.md §2-B "Scalar fns").

The reference touches these only as SQL-gen fragments (name sanitization
clickhouse_backend.py:118-119, regex schema parsing pgwarehouse.py:314-333,
best-effort timestamp parse clickhouse_backend.py:135, size arithmetic
pgwarehouse.py:220-232) and punts arrays/JSON to strings
(clickhouse_backend.py:79-86); the rebuild exposes them natively.

All expressions run JVM-side inside whole-stage codegen — no Python UDFs
in any of these paths. Transcendental outputs are rounded to 8 decimals
(libm vs JVM StrictMath can differ in the last ulp); everything else is
bit-exact across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._helpers import t


@register(
    "scalar_string",
    category="scalar",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name) AS name_upper,
           LOWER(c_mktsegment) AS seg_lower,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           CAST(LENGTH(c_name) AS INT) AS name_len,
           REPLACE(c_name, '#', '-') AS name_repl,
           CONCAT(c_mktsegment, ':', c_name) AS seg_name,
           TRIM(CONCAT('  ', c_name, ' ')) AS name_trim,
           LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS key_pad,
           REGEXP_EXTRACT(c_name, '([0-9]+)', 1) AS name_digits,
           CAST(STRPOS(c_name, '#') AS INT) AS hash_pos
    FROM customer ORDER BY c_custkey
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = t(spark, sf_dir, "customer")
    return (
        c.select(
            "c_custkey",
            F.upper("c_name").alias("name_upper"),
            F.lower("c_mktsegment").alias("seg_lower"),
            F.substring("c_name", 1, 8).alias("name_prefix"),
            F.length("c_name").alias("name_len"),
            F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_repl"),
            F.concat_ws(":", "c_mktsegment", "c_name").alias("seg_name"),
            F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("name_trim"),
            F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("key_pad"),
            F.regexp_extract("c_name", "([0-9]+)", 1).alias("name_digits"),
            F.instr("c_name", "#").alias("hash_pos"),
        )
        .orderBy("c_custkey")
    )


@register(
    "scalar_date",
    category="scalar",
    oracle="""
    SELECT o_orderkey,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month,
           CAST(YEAR(o_orderdate) AS INT) AS yr,
           CAST(MONTH(o_orderdate) AS INT) AS mth,
           CAST(DAY(o_orderdate) AS INT) AS dom,
           CAST(QUARTER(o_orderdate) AS INT) AS qtr,
           STRFTIME(o_orderdate, '%Y-%m-%d') AS iso_day,
           CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS plus3m,
           CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT) AS days_to_2002
    FROM orders WHERE o_orderkey <= 200 ORDER BY o_orderkey
    """,
)
def scalar_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions — the Spark form of the reference's best-effort
    date handling (clickhouse parseDateTimeBestEffortOrNull, ch:135)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderkey") <= 200)
        .select(
            "o_orderkey",
            F.date_trunc("month", "o_orderdate").alias("order_month"),
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mth"),
            F.dayofmonth("o_orderdate").alias("dom"),
            F.quarter("o_orderdate").alias("qtr"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("iso_day"),
            F.add_months(F.col("o_orderdate").cast("date"), 3)
            .cast("timestamp")
            .alias("plus3m"),
            F.datediff(
                F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date")
            ).alias("days_to_2002"),
        )
        .orderBy("o_orderkey")
    )


@register(
    "scalar_timestamp_parse",
    category="scalar",
    oracle="""
    SELECT e.event_id,
           CAST(STRFTIME(e.ts, '%Y-%m-%d %H:%M:%S') AS VARCHAR) AS ts_str,
           CAST(STRPTIME(STRFTIME(e.ts, '%Y-%m-%d %H:%M:%S'), '%Y-%m-%d %H:%M:%S') AS TIMESTAMP) AS ts_roundtrip,
           DATE_TRUNC('hour', e.ts) AS ts_hour,
           CAST(EXTRACT(epoch FROM DATE_TRUNC('second', e.ts)) AS BIGINT) AS epoch_s
    FROM events e WHERE e.event_id <= 100 ORDER BY e.event_id
    """,
)
def scalar_timestamp_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String↔timestamp round-trip — the reference's two-phase typing (parse
    as string, cast at load; clickhouse_backend.py:58-65,134-138) done with
    to_timestamp/date_format."""
    e = t(spark, sf_dir, "events")
    ts_str = F.date_format("ts", "yyyy-MM-dd HH:mm:ss")
    return (
        e.filter(F.col("event_id") <= 100)
        .select(
            "event_id",
            ts_str.alias("ts_str"),
            F.to_timestamp(ts_str, "yyyy-MM-dd HH:mm:ss").alias("ts_roundtrip"),
            F.date_trunc("hour", "ts").alias("ts_hour"),
            F.unix_timestamp(F.date_trunc("second", "ts")).alias("epoch_s"),
        )
        .orderBy("event_id")
    )


@register(
    "scalar_math",
    category="scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS net,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(CEIL(l_quantity) AS BIGINT) AS qty_ceil,
           CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
           CAST(ROUND(SQRT(l_extendedprice), 8) AS DOUBLE) AS price_sqrt,
           CAST(ROUND(LN(l_extendedprice + 1), 8) AS DOUBLE) AS price_ln,
           CAST(ROUND(POWER(l_quantity, 2), 6) AS DOUBLE) AS qty_sq,
           GREATEST(l_discount, l_tax) AS max_rate,
           LEAST(l_discount, l_tax) AS min_rate
    FROM lineitem WHERE l_orderkey <= 100 ORDER BY l_orderkey, l_linenumber
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") <= 100)
        .select(
            "l_orderkey",
            "l_linenumber",
            # Decimal arithmetic, not ROUND(double): Spark rounds the shortest
            # decimal repr of a double while DuckDB rounds the exact binary
            # value, so they disagree on decimal-valued midpoints like x.xx45.
            F.round(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1).cast("decimal(18,2)") - F.col("l_discount").cast("decimal(18,2)")),
                2,
            )
            .cast("double")
            .alias("net"),
            F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
            F.ceil("l_quantity").alias("qty_ceil"),
            F.floor("l_quantity").alias("qty_floor"),
            (F.col("l_orderkey") % 7).alias("key_mod"),
            F.round(F.sqrt("l_extendedprice"), 8).alias("price_sqrt"),
            F.round(F.log(F.col("l_extendedprice") + 1), 8).alias("price_ln"),
            F.round(F.pow("l_quantity", F.lit(2)), 6).alias("qty_sq"),
            F.greatest("l_discount", "l_tax").alias("max_rate"),
            F.least("l_discount", "l_tax").alias("min_rate"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@register(
    "scalar_json",
    category="scalar",
    oracle="""
    SELECT event_id,
           json_extract_string(props, '$.k') AS k_str,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
    FROM events WHERE event_id <= 200 ORDER BY event_id
    """,
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction — done natively instead of the reference's
    degrade-JSON-to-string (clickhouse_backend.py:79-86 TODO comment)."""
    e = t(spark, sf_dir, "events")
    return (
        e.filter(F.col("event_id") <= 200)
        .select(
            "event_id",
            F.get_json_object("props", "$.k").alias("k_str"),
            F.get_json_object("props", "$.k").cast("bigint").alias("k_int"),
        )
        .orderBy("event_id")
    )


@register(
    "scalar_array",
    category="scalar",
    oracle="""
    SELECT vec_id,
           CAST(LEN(embedding) AS INT) AS dim,
           CAST(embedding[1] AS DOUBLE) AS first_elem,
           CAST(list_sum(list_transform(embedding, x -> CAST(CAST(x AS DOUBLE) AS DECIMAL(18,6)))) AS DOUBLE) AS elem_sum,
           CAST(list_max(embedding) AS DOUBLE) AS elem_max
    FROM embeddings WHERE vec_id <= 100 ORDER BY vec_id
    """,
)
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array functions over the embedding column — native ArrayType instead
    of the reference's arrays→string degradation (duckdb_backend.py:64-67).
    The element sum uses the decimal-exact fold so it matches bit-for-bit."""
    e = t(spark, sf_dir, "embeddings")
    return (
        e.filter(F.col("vec_id") <= 100)
        .select(
            "vec_id",
            F.size("embedding").alias("dim"),
            F.element_at("embedding", 1).cast("double").alias("first_elem"),
            F.aggregate(
                F.transform("embedding", lambda x: x.cast("double").cast("decimal(18,6)")),
                F.lit(0).cast("decimal(38,6)"),
                lambda acc, x: acc + x,
            )
            .cast("double")
            .alias("elem_sum"),
            F.array_max("embedding").cast("double").alias("elem_max"),
        )
        .orderBy("vec_id")
    )


@register(
    "scalar_conditional",
    category="scalar",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 250000.0 THEN 'high'
                WHEN o_totalprice > 100000.0 THEN 'mid'
                ELSE 'low' END AS price_band,
           COALESCE(NULLIF(o_orderstatus, 'P'), 'PENDING') AS status_norm,
           CASE WHEN o_orderstatus = 'O' THEN o_totalprice END AS open_price
    FROM orders WHERE o_orderkey <= 300 ORDER BY o_orderkey
    """,
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderkey") <= 300)
        .select(
            "o_orderkey",
            F.when(F.col("o_totalprice") > 250000.0, "high")
            .when(F.col("o_totalprice") > 100000.0, "mid")
            .otherwise("low")
            .alias("price_band"),
            F.coalesce(F.nullif("o_orderstatus", F.lit("P")), F.lit("PENDING")).alias(
                "status_norm"
            ),
            F.when(F.col("o_orderstatus") == "O", F.col("o_totalprice")).alias(
                "open_price"
            ),
        )
        .orderBy("o_orderkey")
    )


@register(
    "scalar_higher_order",
    category="scalar",
    oracle="""
    SELECT vec_id,
           CAST(LEN(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0.0)) AS INT) AS n_pos,
           CAST(list_sum(list_transform(embedding,
                x -> CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(18,6))))
                AS DOUBLE) AS sum_sq,
           LEN(list_filter(embedding, x -> CAST(x AS DOUBLE) > 0.2)) > 0 AS has_big,
           LEN(list_filter(embedding,
                x -> NOT (CAST(x AS DOUBLE) BETWEEN -1.5 AND 1.5))) = 0 AS all_bounded,
           list_slice(list_reverse_sort(list_transform(embedding,
                x -> CAST(x AS DOUBLE))), 1, 3) AS top3
    FROM embeddings WHERE vec_id <= 100 ORDER BY vec_id
    """,
)
def scalar_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions — filter / zip_with / exists / forall
    / sort+slice as JVM lambda expressions (SURVEY §2-B array surface,
    which the reference degrades to strings at duckdb_backend.py:64-67).
    All run inside whole-stage codegen per row: zero shuffles, zero
    Python. The self-dot-product (zip_with → decimal fold) is the exact
    kernel the vector/similarity operators build on."""
    e = t(spark, sf_dir, "embeddings")
    as_d = lambda x: x.cast("double")  # noqa: E731
    return (
        e.filter(F.col("vec_id") <= 100)
        .select(
            "vec_id",
            F.size(F.filter("embedding", lambda x: as_d(x) > 0.0)).alias("n_pos"),
            F.aggregate(
                F.zip_with(
                    "embedding",
                    "embedding",
                    lambda a, b: (as_d(a) * as_d(b)).cast("decimal(18,6)"),
                ),
                F.lit(0).cast("decimal(38,6)"),
                lambda acc, x: acc + x,
            )
            .cast("double")
            .alias("sum_sq"),
            F.exists("embedding", lambda x: as_d(x) > 0.2).alias("has_big"),
            F.forall(
                "embedding", lambda x: as_d(x).between(-1.5, 1.5)
            ).alias("all_bounded"),
            F.slice(
                F.reverse(F.array_sort(F.transform("embedding", as_d))), 1, 3
            ).alias("top3"),
        )
        .orderBy("vec_id")
    )


@register(
    "scalar_map_ops",
    category="scalar",
    oracle=r"""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
           CAST(LEN(json_keys(props)) AS INT) AS n_keys,
           array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
           CAST(LEN(list_filter(json_keys(props),
                kk -> CAST(json_extract_string(props, '$.' || kk) AS INT) > 50))
                AS INT) AS n_big,
           CAST(2 * CAST(json_extract_string(props, '$.k') AS INT) AS INT)
             AS k_doubled
    FROM events WHERE event_id <= 500 ORDER BY event_id
    """,
)
def scalar_map_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAP-type column surface: parse the props JSON into a real
    map<string,int>, then exercise the map functions — element_at,
    map_keys, cardinality, and the map higher-order functions
    (map_filter, transform_values). The DuckDB oracle never builds a
    map; it derives the same answers through json_keys/list lambdas, so
    the engines cross-check different representations.

    Scale: all map construction and traversal is per-row JVM codegen —
    no shuffle, no Python; maps stay columnar (keys/values child arrays)
    in Tungsten rows. The pattern to avoid at scale is exploding a map
    per row when a direct map HOF answers the question — explode
    multiplies rows, the lambda doesn't."""
    e = t(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,int>")
    return (
        e.filter(F.col("event_id") <= 500)
        .select(
            "event_id",
            F.element_at(m, "k").cast("int").alias("k_val"),
            F.size(m).cast("int").alias("n_keys"),
            F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("keys_csv"),
            F.size(F.map_filter(m, lambda k, v: v > 50)).cast("int").alias("n_big"),
            F.element_at(
                F.transform_values(m, lambda k, v: v * 2), "k"
            ).cast("int").alias("k_doubled"),
        )
        .orderBy("event_id")
    )
