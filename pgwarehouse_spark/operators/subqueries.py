"""Subqueries, explode/unnest, percentiles, typed JSON, and multi-format
timestamp parsing — the remaining SURVEY §2-B surface.

Spark SQL handles scalar/IN/EXISTS subqueries via de-correlation into
joins (Catalyst RewriteCorrelatedScalarSubquery / RewritePredicateSubquery)
— the same plans the DataFrame semi/anti forms produce, shown here
through the SQL front-end for API-surface parity with the warehouses the
reference targets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._helpers import t, views


@register(
    "subquery_scalar",
    category="subquery",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE CAST(o_totalprice AS DECIMAL(18,2)) * (SELECT COUNT(*) FROM orders)
          > 2 * (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders)
    ORDER BY o_orderkey
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery in a predicate (de-correlated to a broadcast of one
    row — no per-row execution). The threshold is the cross-multiplied
    decimal form (price·n > 2·Σprice) rather than a double AVG: a plain
    double average's last ulp depends on accumulation order, so a row
    sitting within ulps of 2·avg could flip between engines (or between
    partition counts under AQE) — the same reason every other threshold
    query folds through the decimal-exact dsum pattern."""
    views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE CAST(o_totalprice AS DECIMAL(18,2)) * (SELECT COUNT(*) FROM orders)
          > 2 * (SELECT SUM(CAST(o_totalprice AS DECIMAL(18,2))) FROM orders)
        ORDER BY o_orderkey
        """
    )


@register(
    "subquery_in",
    category="subquery",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_nationkey IN (
      SELECT c_nationkey FROM customer GROUP BY c_nationkey HAVING COUNT(*) >= 80
    )
    ORDER BY c_custkey
    """,
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    views(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM customer
        WHERE c_nationkey IN (
          SELECT c_nationkey FROM customer GROUP BY c_nationkey HAVING COUNT(*) >= 80
        )
        ORDER BY c_custkey
        """
    )


@register(
    "subquery_correlated_exists",
    category="subquery",
    oracle="""
    SELECT o.o_orderkey FROM orders o
    WHERE EXISTS (
      SELECT 1 FROM lineitem l
      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45
    )
    AND NOT EXISTS (
      SELECT 1 FROM lineitem l2
      WHERE l2.l_orderkey = o.o_orderkey AND l2.l_returnflag = 'R'
    )
    ORDER BY o.o_orderkey
    """,
)
def subquery_correlated_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS → semi + anti join after Catalyst
    de-correlation (one pass over lineitem each, no per-row probing)."""
    views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(
        """
        SELECT o.o_orderkey FROM orders o
        WHERE EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 45
        )
        AND NOT EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = o.o_orderkey AND l2.l_returnflag = 'R'
        )
        ORDER BY o.o_orderkey
        """
    )


@register(
    "explode_word_counts",
    category="lateral",
    oracle=r"""
    SELECT word, COUNT(*) AS n
    FROM (
      SELECT unnest(string_split_regex(TRIM(text), '\s+')) AS word
      FROM documents
    )
    GROUP BY word
    HAVING COUNT(*) >= 10
    ORDER BY n DESC, word
    """,
)
def explode_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode (UNNEST/LATERAL VIEW): array → rows, then aggregate — the
    canonical tokenize-and-count shape."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 10)
        .orderBy(F.col("n").desc(), "word")
    )


@register(
    "agg_percentiles",
    category="aggregate",
    oracle="""
    SELECT o_orderstatus,
           quantile_cont(o_totalprice, 0.5) AS p50,
           quantile_cont(o_totalprice, 0.9) AS p90,
           quantile_cont(o_totalprice, 0.99) AS p99,
           MEDIAN(o_totalprice) AS med
    FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (both engines: linear interpolation,
    bit-identical — verified). The approximate scale path is
    percentile_approx (single-pass sketch), used when a full sort per
    group is too expensive."""
    o = t(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
            F.expr("percentile(o_totalprice, 0.99)").alias("p99"),
            F.median("o_totalprice").alias("med"),
        )
        .orderBy("o_orderstatus")
    )


@register(
    "scalar_from_json",
    category="scalar",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k_typed,
           CASE WHEN json_valid(props) THEN 1 ELSE 0 END AS is_valid
    FROM events WHERE event_id <= 300 ORDER BY event_id
    """,
)
def scalar_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing with from_json + schema (vs string-path
    get_json_object in scalar_json) — what the reference punts on
    entirely (JSON → String, README.md:252-254)."""
    e = t(spark, sf_dir, "events")
    parsed = F.from_json("props", "k int")
    return (
        e.filter(F.col("event_id") <= 300)
        .select(
            "event_id",
            parsed.getField("k").alias("k_typed"),
            # validity probe: get_json_object('$') — PERMISSIVE
            # from_json returns a non-null struct-of-nulls for garbage,
            # so struct nullity would report malformed JSON as valid;
            # the '$' probe matches DuckDB json_valid on every case
            # incl. scalars and the 'null' literal (empirically pinned)
            F.when(F.get_json_object("props", "$").isNotNull(), 1)
            .otherwise(0)
            .alias("is_valid"),
        )
        .orderBy("event_id")
    )


@register(
    "scalar_multiformat_timestamp",
    category="scalar",
    oracle="""
    WITH strs AS (
      SELECT o_orderkey, STRFTIME(o_orderdate, '%m/%d/%Y') AS mdy
      FROM orders WHERE o_orderkey <= 200
    )
    SELECT o_orderkey, mdy,
           STRPTIME(mdy, '%m/%d/%Y') AS parsed,
           CAST(NULL AS TIMESTAMP) AS bad_parse
    FROM strs ORDER BY o_orderkey
    """,
)
def scalar_multiformat_timestamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Best-effort timestamp parsing (reference A9:
    parseDateTimeBestEffortOrNull, clickhouse_backend.py:134-138, and the
    M/D/YYYY fixture format its tests require): non-ISO format parse via
    to_timestamp(fmt), with try_to_timestamp returning NULL on garbage
    instead of failing the job."""
    o = t(spark, sf_dir, "orders")
    strs = o.filter(F.col("o_orderkey") <= 200).select(
        "o_orderkey", F.date_format("o_orderdate", "MM/dd/yyyy").alias("mdy")
    )
    return strs.select(
        "o_orderkey",
        "mdy",
        F.to_timestamp("mdy", "MM/dd/yyyy").alias("parsed"),
        F.try_to_timestamp(F.lit("not a date"), F.lit("MM/dd/yyyy")).alias("bad_parse"),
    ).orderBy("o_orderkey")


@register(
    "recursive_cte_hierarchy",
    category="recursive",
    oracle="""
    WITH RECURSIVE walk AS (
      SELECT c_custkey AS node, CAST(c_custkey AS BIGINT) AS cur,
             0 AS depth
      FROM customer
      UNION ALL
      SELECT node, cur // 2, depth + 1 FROM walk WHERE cur > 1
    )
    SELECT depth AS root_depth, CAST(COUNT(*) AS BIGINT) AS n_customers,
           MIN(node) AS min_key, MAX(node) AS max_key
    FROM walk WHERE cur = 1
    GROUP BY depth ORDER BY depth
    """,
)
def recursive_cte_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Genuine `WITH RECURSIVE` in Spark SQL (new in Spark 4) — the
    iterative-traversal QUERY SURFACE, complementing the hand-unrolled
    DataFrame iterations (PageRank, connected components, BFS) with the
    declarative form a SQL user migrating from a recursive-CTE warehouse
    writes. Each customer key walks its binary-heap ancestry (k → k DIV
    2) to the root; output is the census of root distances. DuckDB runs
    the same recursion natively (`//` vs `DIV` is the one dialect
    split), so the oracle is a true recursive-engine cross-check, not a
    replay.

    Scale: the recursive step is a pure PROJECTION (no join, no
    shuffle) — each iteration rewrites (node, cur, depth) narrowly, and
    rows exit as they reach the root, so total work is N·log(maxkey)
    with log-bounded iteration count; Spark's recursion executes as
    iterative union steps over the same partitioning. Integer-only
    arithmetic ⇒ bit-identical across engines."""
    views(spark, sf_dir, "customer")
    return spark.sql(
        """
        WITH RECURSIVE walk AS (
          SELECT c_custkey AS node, CAST(c_custkey AS BIGINT) AS cur,
                 0 AS depth
          FROM customer
          UNION ALL
          SELECT node, cur DIV 2, depth + 1 FROM walk WHERE cur > 1
        )
        SELECT depth AS root_depth, CAST(COUNT(*) AS BIGINT) AS n_customers,
               MIN(node) AS min_key, MAX(node) AS max_key
        FROM walk WHERE cur = 1
        GROUP BY depth ORDER BY depth
        """
    )
