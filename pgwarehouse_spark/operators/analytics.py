"""Composite analytic queries — TPC-H-shaped multi-join plans (the
workload the reference's warehouses exist to serve) and TF-IDF term
scoring over documents.

These exercise join *ordering* and mixed broadcast/shuffle planning:
selective dimension filters first, facts joined on broadcast dims, one
final aggregation shuffle. The plans to expect at 100 TB: lineitem never
shuffles for a join; only the groupBy exchanges data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..registry import register
from ._helpers import dsum, sql_dsum, t


@register(
    "q3_shipping_priority",
    category="analytics",
    oracle=f"""
    SELECT l.l_orderkey,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND l.l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → two joins → agg → top-10.
    customer (filtered) broadcasts into orders, the joined key set
    broadcasts into lineitem — the fact table is filtered and aggregated
    in a single scan."""
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp")
    )
    return (
        li.join(
            o.join(c, o.o_custkey == c.c_custkey),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    category="analytics",
    oracle=f"""
    SELECT n.n_name AS nation,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, nation
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join with the customer-nation = supplier-
    nation co-location constraint; every dimension broadcasts."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "nation")
    )


@register(
    "q4_order_priority",
    category="analytics",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate >= o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o.o_orderpriority
    ORDER BY o.o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted: the testdata lineitem has no commitdate/
    receiptdate, so "late" = shipped ≥60 days after order date): EXISTS
    correlated on the fact table → left-semi join with a non-equi
    residual, then a tiny groupBy. The semi join never duplicates orders,
    so the aggregation input stays order-sized at any scale."""
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate >= o.o_orderdate + F.expr("INTERVAL 60 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q6_forecast_revenue",
    category="analytics",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate <  TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan→filter→global agg, zero joins, zero wide
    shuffles. At 100 TB this is the min-boundary query: every predicate
    reaches the parquet reader (PushedFilters on l_shipdate min/max per
    row group), and the agg is a partial-sum + single-row exchange."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))


@register(
    "q7_volume_shipping",
    category="analytics",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_dsum('volume')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: nation-pair trade volume by year. The nation
    disjunction can only be evaluated after both nation joins, but every
    non-fact table broadcasts, so lineitem still flows through a single
    scan → broadcast-join chain → one groupBy exchange."""
    s = t(spark, sf_dir, "supplier")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), s.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), c.c_nationkey == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q10_returned_items",
    category="analytics",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           c.c_acctbal, n.n_name AS nation
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1996-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returns, top-20 customers.
    Fact-side filters (returnflag, via broadcast order date range) cut
    the join input before the customer-grained aggregation; the final
    top-k is TakeOrderedAndProject, not a global sort."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", F.col("n_name").alias("nation"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
        )
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "nation")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "q14_promo_revenue",
    category="analytics",
    oracle=f"""
    SELECT 100.0 * {sql_dsum("CASE WHEN p.p_type LIKE 'PROMO%' "
                             "THEN l.l_extendedprice * (1 - l.l_discount) "
                             "ELSE 0.0 END")}
               / {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')}
           AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01'
      AND l.l_shipdate <  TIMESTAMP '1996-10-01'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: promo share of monthly revenue. Conditional aggregation
    — one pass over the filtered fact, part broadcasts, ratio of two
    exact decimal sums keeps the double bit-stable cross-engine."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            (
                100.0
                * dsum(F.when(F.col("p_type").like("PROMO%"), rev).otherwise(0.0))
                / dsum(rev)
            ).alias("promo_revenue_pct")
        )
    )


@register(
    "q18_large_volume_customer",
    category="analytics",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           {sql_dsum('l.l_quantity')} AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING {sql_dsum('l_quantity')} > 250
    )
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold.

    The HAVING pre-aggregation ALREADY IS the final total_qty (the
    GROUP BY keys are per-order), so lineitem is scanned and aggregated
    exactly once; the surviving (orderkey, qty) set is tiny (p99 of
    per-order quantity ≈ 262), and every join after it keeps that tiny
    frame on the build side — orders and customer are each scanned once
    and NEVER broadcast whole (a forced full-orders broadcast is a
    driver OOM at scale; AQE broadcasts the qty-filtered side, which
    shrinks with the filter, not the fact table)."""
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 250)
    )
    return (
        # no broadcast hints: the qty-filtered set is tiny at every SF
        # tested, but it grows linearly with the fact table — AQE picks
        # broadcast from its RUNTIME size instead of a forced hint
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .select(
            "c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
    )


@register(
    "q19_discounted_revenue",
    category="analytics",
    oracle=f"""
    SELECT {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#14' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (adapted: no container/shipmode columns in the
    testdata): disjunctive mixed-side predicate. Catalyst extracts the
    common l_quantity bounds (1..30) and the p_brand IN-list as pushable
    conjuncts below the broadcast join; the full disjunction evaluates
    as the join residual."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    joined = li.join(p, p.p_partkey == li.l_partkey)
    cond = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 11)
    ) | (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & F.col("l_quantity").between(10, 20)
    ) | (
        (F.col("p_brand") == "Brand#14")
        & F.col("p_size").between(1, 35)
        & F.col("l_quantity").between(20, 30)
    )
    return joined.filter(cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )


@register(
    "text_tfidf_top_terms",
    category="text",
    oracle=r"""
    WITH tf AS (
      SELECT doc_id, word, COUNT(*) AS tf FROM (
        SELECT doc_id, unnest(string_split_regex(TRIM(text), '\s+')) AS word
        FROM documents
      ) GROUP BY doc_id, word
    ),
    df AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY word),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.word,
             CAST(ROUND(tf.tf * LN((n.n_docs + 1.0) / (df.df + 1.0)), 8) AS DOUBLE) AS tfidf
      FROM tf JOIN df USING (word) CROSS JOIN n
    )
    SELECT doc_id, word, tfidf, rnk FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY tfidf DESC, word
      ) AS rnk FROM scored
    ) WHERE rnk <= 3 AND doc_id < 100
    ORDER BY doc_id, rnk
    """,
)
def text_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document: explode → tf groupBy → df groupBy
    → broadcast df back → window top-k. Two shuffles total (tf, df);
    the df table (vocabulary-sized) broadcasts."""
    d = t(spark, sf_dir, "documents")
    words = d.select(
        "doc_id", F.explode(F.split(F.trim("text"), r"\s+")).alias("word")
    )
    # tf feeds the document-frequency rollup AND the scoring join —
    # checkpointed so the tokenize + tf aggregation runs once, not
    # twice (guide §3.3; the dsir dw pattern)
    tf = (
        words.groupBy("doc_id", "word")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint()
    )
    df_counts = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.count()
    scored = tf.join(df_counts, "word").select(
        "doc_id",
        "word",
        F.round(
            F.col("tf") * F.log((n_docs + 1.0) / (F.col("df") + 1.0)), 8
        ).alias("tfidf"),
    )
    w = W.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "word")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter((F.col("rnk") <= 3) & (F.col("doc_id") < 100))
        .select("doc_id", "word", "tfidf", "rnk")
        .orderBy("doc_id", "rnk")
    )


_Q8_NATION_SUM = sql_dsum(
    "CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END"
)


@register(
    "q8_market_share",
    category="analytics",
    oracle=f"""
    SELECT l_year,
           {_Q8_NATION_SUM}
             / {sql_dsum('volume')} AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = (SELECT r_name FROM region ORDER BY r_regionkey LIMIT 1)
        AND o.o_orderdate >= TIMESTAMP '1996-01-01'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01'
        AND p.p_type LIKE 'ECONOMY%'
    ) all_nations
    GROUP BY l_year
    ORDER BY l_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of regional revenue for a part
    type, by year. Eight-table join where every non-fact table broadcasts;
    the share is a conditional-sum / total-sum ratio of exact decimal
    aggregates computed in one pass."""
    p = t(spark, sf_dir, "part").filter(F.col("p_type").like("ECONOMY%"))
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region")
    first_region = r.orderBy("r_regionkey").limit(1).select("r_regionkey", "r_name")
    n1 = n.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), c.c_nationkey == F.col("n1_key"))
        .join(
            F.broadcast(first_region),
            F.col("n1_region") == F.col("r_regionkey"),
        )
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("l_year"))
        .agg(
            (
                dsum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(0.0))
                / dsum(vol)
            ).alias("mkt_share")
        )
        .orderBy("l_year")
    )


@register(
    "q13_customer_distribution",
    category="analytics",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '1-URGENT'
      GROUP BY c.c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: distribution of orders per customer, including the
    zero-order bucket (the LEFT JOIN is load-bearing — an inner join
    would drop inactive customers). Two aggregations: per-customer count,
    then the tiny histogram. At scale both sides are large, so this is a
    shuffle join on the customer key; orders is pre-aggregated per
    customer first so the join input is the *counted* (much smaller)
    relation, not raw orders — and the shuffle carries one row per
    active customer instead of one per order."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    o_counts = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    per_cust = c.join(
        o_counts, c.c_custkey == F.col("k"), "left"
    ).select(
        "c_custkey", F.coalesce("n_orders", F.lit(0)).alias("c_count")
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q15_top_supplier",
    category="analytics",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue — a
    reused CTE probed by its own MAX (scalar subquery). The revenue CTE
    is computed once and self-joined against its broadcast max; exact
    decimal sums make the equality comparison safe cross-engine."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = t(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    ).localCheckpoint()
    max_rev = revenue.agg(F.max("total_revenue").alias("m"))
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_revenue") == F.col("m"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q17_small_quantity_revenue",
    category="analytics",
    oracle=f"""
    SELECT {sql_dsum('l.l_extendedprice')} / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#13'
      AND l.l_quantity < (
        SELECT 0.2 * AVG(l2.l_quantity)
        FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
      )
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated aggregate subquery (per-part average
    quantity) decorrelated into a pre-aggregation + broadcast join — the
    rewrite every optimizer applies; here it is explicit so the plan is
    guaranteed: lineitem scanned twice (once aggregated per part, once
    probed), zero fact shuffles for joins. Quantities are integral
    doubles, so AVG*0.2 is deterministic cross-engine."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    per_part = li.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_threshold")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(per_part, li.l_partkey == F.col("pp_key"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg((dsum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@register(
    "q22_global_sales_opportunity",
    category="analytics",
    oracle="""
    SELECT cntrycode, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS totacctbal
    FROM (
      SELECT CAST(c.c_nationkey % 10 AS INTEGER) AS cntrycode, c.c_acctbal
      FROM customer c
      WHERE c.c_acctbal > (
        SELECT AVG(c2.c_acctbal) FROM customer c2 WHERE c2.c_acctbal > 0.0
      )
      AND NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '2000-01-01'
      )
    ) custsale
    GROUP BY cntrycode
    ORDER BY cntrycode
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: no phone column, so country code =
    nationkey % 10): customers with above-average balance and NO orders —
    an uncorrelated scalar aggregate (broadcast single row) + NOT EXISTS
    (left-anti join against the recent-order key set — "no orders" is
    windowed because every customer has SOME order in this data). AVG over doubles is the one non-decimal aggregate
    here: it only gates a > comparison and no customer balance sits
    within double-rounding distance of the mean."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("avg_bal")
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            o.filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")),
            c.c_custkey == o.o_custkey,
            "left_anti",
        )
        .groupBy((F.col("c_nationkey") % 10).cast("int").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,6)"))
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@register(
    "q2_min_cost_supplier",
    category="analytics",
    oracle="""
    WITH ps AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS supplycost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eur AS (
      SELECT ps.l_partkey, ps.l_suppkey, ps.supplycost,
             s.s_acctbal, s.s_name, n.n_name
      FROM ps
      JOIN supplier s ON s.s_suppkey = ps.l_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    )
    SELECT e.s_acctbal, e.s_name, e.n_name,
           p.p_partkey, e.l_suppkey AS s_suppkey, e.supplycost
    FROM part p
    JOIN eur e ON p.p_partkey = e.l_partkey
    WHERE p.p_size = 15 AND p.p_type = 'STANDARD'
      AND e.supplycost = (
        SELECT MIN(e2.supplycost) FROM eur e2
        WHERE e2.l_partkey = p.p_partkey
      )
    ORDER BY s_acctbal DESC, p_partkey, s_suppkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (partsupp derived from lineitem: supply cost =
    min unit price ever charged per (part, supplier)): for filtered
    parts, the EUROPE supplier(s) achieving the per-part minimum cost —
    a correlated MIN subquery decorrelated into a same-key window.

    Scale plan: the derived partsupp costs one fact shuffle on
    (partkey, suppkey) — with map-side partial aggregation, so the wire
    carries ~1 row per pair, not per lineitem. The correlated min's
    window then re-shuffles only the pair-sized aggregate by partkey
    (hash clustering on (pk, sk) does not satisfy a pk-only window, but
    that second exchange moves the reduced relation). Dims broadcast.
    (partkey, suppkey) is unique, so the top-100 tiebreak is total.
    Ref semantics anchor: /root/reference/README.md:13-15 (warehouse
    query surface); min-unit-price per pair stands in for ps_supplycost.
    """
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost")
    )
    eur_dims = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_acctbal", "s_name", "n_name")
    )
    eur = ps.join(eur_dims, ps.l_suppkey == F.col("s_suppkey"))
    w = W.partitionBy("l_partkey")
    return (
        eur.withColumn("min_cost", F.min("supplycost").over(w))
        .filter(F.col("supplycost") == F.col("min_cost"))
        .join(p, F.col("l_partkey") == p.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "s_suppkey", "supplycost"
        )
        .orderBy(F.col("s_acctbal").desc(), "p_partkey", "s_suppkey")
        .limit(100)
    )


@register(
    "q9_product_type_profit",
    category="analytics",
    oracle=f"""
    SELECT nation, l_year, {sql_dsum('amount')} AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS l_year,
             l.l_extendedprice * (1 - l.l_discount)
               - p.p_retailprice * l.l_quantity * 0.1 AS amount
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%gear%'
    ) profit
    GROUP BY nation, l_year
    ORDER BY nation, l_year DESC
    """,
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (supply cost proxied as 10% of retail price —
    no partsupp table): profit by supplier nation and ship year for
    parts whose name matches a pattern. The LIKE filter prunes part
    before the broadcast, so the fact scan joins against a reduced
    build side and never shuffles; the only exchange is the final
    (nation, year) aggregation — 25×7 groups, trivially small."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "p_retailprice"
    ) * F.col("l_quantity") * 0.1
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(dsum(amount).alias("sum_profit"))
        .orderBy("nation", F.col("l_year").desc())
    )


@register(
    "q11_important_part_value",
    category="analytics",
    oracle=f"""
    WITH val AS (
      SELECT l.l_partkey,
             {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_7'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey, value
    FROM val
    WHERE value > (SELECT SUM(value) * 0.001 FROM val)
    ORDER BY value DESC, l_partkey
    """,
)
def q11_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part traded value from one nation's
    suppliers, keeping only parts above a fraction of the grand total
    (uncorrelated scalar aggregate over the same CTE). The per-part
    aggregate is computed once, cached, and probed by its own
    broadcast sum — the same reuse pattern as q15. The exact decimal
    sums make value identical cross-engine; the 0.001 multiply happens
    in double on the already-exact total."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    nat_supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey"
    )
    val = (
        li.join(nat_supp, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value"))
        .localCheckpoint()
    )
    threshold = val.agg((F.sum(F.col("value").cast("decimal(28,6)")).cast("double") * 0.001).alias("thr"))
    return (
        val.join(F.broadcast(threshold))
        .filter(F.col("value") > F.col("thr"))
        .select("l_partkey", "value")
        .orderBy(F.col("value").desc(), "l_partkey")
    )


@register(
    "q12_priority_shipping",
    category="analytics",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
)
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (return flag stands in for the absent
    l_shipmode): count lines from high- vs low-priority orders per
    flag, one ship-year window. Conditional SUM(CASE) pairs compute
    both counts in a single pass. Orders participates only through
    (o_orderkey, o_orderpriority) — projected before the join, so the
    shuffle (or broadcast, when it fits) carries two columns, not the
    whole orders row."""
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "q16_supplier_part_count",
    category="analytics",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 24, 28, 33)
      AND ps.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct suppliers per (brand, type, size) for
    a part subset, excluding a blacklist (negative-balance suppliers ≈
    complaint suppliers) via NOT IN → left-anti join. The distinct
    (part, supplier) projection happens FIRST on the fact — one shuffle
    that also serves the count-distinct — and the blacklist is tiny, so
    the anti join broadcasts."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#13")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 28, 33)
    )
    bad_supp = (
        t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    ps = li.select("l_partkey", "l_suppkey").distinct()
    return (
        ps.join(bad_supp, ps.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(p, ps.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_dominant_suppliers",
    category="analytics",
    oracle="""
    WITH shipped AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS qty
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    part_total AS (
      SELECT l_partkey, SUM(qty) AS total_qty FROM shipped GROUP BY l_partkey
    )
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_5'
      AND s.s_suppkey IN (
        SELECT sh.l_suppkey
        FROM shipped sh
        JOIN part_total pt ON sh.l_partkey = pt.l_partkey
        JOIN part p ON p.p_partkey = sh.l_partkey
        WHERE p.p_name LIKE 'small%'
          AND sh.qty > 0.3 * pt.total_qty
      )
    ORDER BY s.s_name
    """,
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (availqty threshold recast as shipped-share:
    suppliers providing >30% of a matching part's total shipped
    quantity): nested IN subqueries become a semi-join chain. The fact
    shuffles once, partially aggregated to (partkey, suppkey); the
    per-part total is a window over that pair aggregate — a second
    exchange, but of the ~11×-reduced pair relation, never a second
    fact scan. Quantities are integral doubles, so the sums and the
    0.3 multiply are exact cross-engine."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    shipped = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("qty")
    )
    dominant = (
        shipped.withColumn(
            "total_qty", F.sum("qty").over(W.partitionBy("l_partkey"))
        )
        .join(p.select("p_partkey"), F.col("l_partkey") == F.col("p_partkey"))
        .filter(F.col("qty") > 0.3 * F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(dominant, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "q21_waiting_suppliers",
    category="analytics",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F'
      AND n.n_name = 'NATION_1'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape ("late" = shipped >90 days after order date —
    the data has no commit/receipt dates): suppliers who were the SOLE
    late supplier on a finished multi-supplier order. The correlated
    EXISTS / NOT EXISTS pair collapses into two stacked aggregations:
    per (order, supplier) line/late-line counts, then per order the
    distinct-supplier and late-supplier counts plus the sole late
    supplier's key and late-line total. Both aggregate map-side
    (windows can't), the second reuses the first's hash partitioning
    (its keys are a prefix), and the EXISTS semantics never need a
    self-join (the classic Q21 plan carries two). o_orderstatus = 'F'
    is pushed into the orders scan — it is an order-level property, so
    filtering before the fact join is semantics-preserving and prunes
    the shuffle."""
    li = t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_1")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
    per_supp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.count(F.when(late, 1)).alias("n_late_lines"))
    )
    per_order = per_supp.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"),
        F.count(F.when(F.col("n_late_lines") > 0, 1)).alias("n_late_supp"),
        F.max(
            F.when(F.col("n_late_lines") > 0, F.col("l_suppkey"))
        ).alias("late_supp"),
        F.sum(
            F.when(F.col("n_late_lines") > 0, F.col("n_late_lines"))
        ).alias("late_lines"),
    )
    nat_supp = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "s_name"
    )
    return (
        per_order.filter((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
        .join(nat_supp, F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("late_lines").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )


@register(
    "timeseries_gap_fill",
    category="analytics",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             COUNT(*) AS n_orders,
             {sql_dsum('o_totalprice')} AS revenue
      FROM orders WHERE o_custkey % 1000 = 0
      GROUP BY CAST(o_orderdate AS DATE)
    ),
    bounds AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
    spine AS (
      SELECT CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM bounds
    )
    SELECT s.day,
           COALESCE(d.n_orders, 0) AS n_orders,
           COALESCE(d.revenue, 0.0) AS revenue,
           LAST_VALUE(d.revenue IGNORE NULLS) OVER (
             ORDER BY s.day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS revenue_locf
    FROM spine s LEFT JOIN daily d ON s.day = d.day
    ORDER BY s.day
    """,
)
def timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-spine gap filling: a generated calendar (sequence + explode)
    left-joined with sparse daily aggregates; missing days appear with
    zero counts and last-observation-carried-forward revenue — the
    standard warehouse treatment for irregular time series.

    Scale: the spine is day-grained (bounded by the calendar, not the
    fact), the daily aggregate is partial-aggregated before its one
    shuffle, and the LOCF window runs over spine-sized input. The
    global (un-partitioned) window is safe ONLY because of that bound;
    per-entity gap fill would partition the window by the entity key."""
    o = t(spark, sf_dir, "orders").filter(F.col("o_custkey") % 1000 == 0)
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )
    spine = daily.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    ).select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    w = W.orderBy("day").rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        spine.join(daily, "day", "left")
        .select(
            "day",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
            F.last(F.col("revenue"), ignorenulls=True).over(w).alias("revenue_locf"),
        )
        .orderBy("day")
    )


_BM25_TERMS = ("spark", "table", "query")
_BM25_K1, _BM25_B = 1.2, 0.75


def _bm25_sql_parts() -> tuple[str, str, str]:
    """(tf_cols, df_cols, score) SQL fragments for the fixed BM25 query —
    shared by _bm25_oracle and _rrf_oracle so a k1/b/idf/rounding tweak
    cannot desynchronize the hybrid-retrieval arm from the standalone
    ranker (r4 self-review: the three fragments existed twice)."""
    from .textstats import _sql_count_token

    tf_cols = ",\n             ".join(
        f"CAST({_sql_count_token('text', w)} AS INT) AS tf_{i}"
        for i, w in enumerate(_BM25_TERMS)
    )
    df_cols = ",\n             ".join(
        f"SUM(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(_BM25_TERMS))
    )
    score = "\n           + ".join(
        f"LN(1 + (n_docs - df_{i} + 0.5) / (df_{i} + 0.5))"
        f" * (tf_{i} * ({_BM25_K1} + 1)) / (tf_{i} + {_BM25_K1}"
        f" * (1 - {_BM25_B} + {_BM25_B} * dl / (CAST(sum_dl AS DOUBLE) / n_docs)))"
        for i in range(len(_BM25_TERMS))
    )
    return tf_cols, df_cols, score


def _bm25_scored(spark, sf_dir: str):
    """Spark-side BM25 scoring frame (doc_id, dl, bm25-unrounded parts
    folded to one `score` column expression applied below): returns the
    base⨯broadcast(stats) frame and the score Column — the single
    construction both text_bm25_rank and retrieval_hybrid_rrf rank."""
    from .textstats import _count_token, token_count

    d = t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id",
        token_count(F.col("text")).alias("dl"),
        *[
            _count_token(F.col("text"), w).cast("int").alias(f"tf_{i}")
            for i, w in enumerate(_BM25_TERMS)
        ],
    )
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("sum_dl"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)).alias(f"df_{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    avgdl = F.col("sum_dl").cast("double") / F.col("n_docs")
    score = None
    for i in range(len(_BM25_TERMS)):
        tf, df = F.col(f"tf_{i}"), F.col(f"df_{i}")
        idf = F.log(1 + (F.col("n_docs") - df + 0.5) / (df + 0.5))
        part = idf * (tf * (_BM25_K1 + 1)) / (
            tf + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / avgdl)
        )
        score = part if score is None else score + part
    return base.crossJoin(F.broadcast(stats)), score


def _bm25_oracle() -> str:
    tf_cols, df_cols, score = _bm25_sql_parts()
    return rf"""
    WITH base AS (
      SELECT doc_id,
             CAST(LEN(string_split_regex(TRIM(text), '\s+')) AS INT) AS dl,
             {tf_cols}
      FROM documents
    ),
    stats AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl,
             {df_cols}
      FROM base
    )
    SELECT doc_id, dl,
           CAST(ROUND({score}, 8) AS DOUBLE) AS bm25
    FROM base CROSS JOIN stats
    ORDER BY bm25 DESC, doc_id
    LIMIT 50
    """


@register("text_bm25_rank", category="text", oracle=_bm25_oracle())
def text_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval scoring against a fixed query ('spark table query'):
    term frequencies and document length are per-row integers; the corpus
    statistics (N, total length, per-term document frequencies) are ONE
    aggregated row broadcast back onto the scan — no driver-side count,
    no shuffle of the corpus itself, and the top-50 is
    TakeOrderedAndProject. Scores are fixed-order double arithmetic over
    exact integers, rounded to 8 (LN differs by ≤1 ulp across libm
    implementations), so the ranking is cross-engine stable."""
    scored, score = _bm25_scored(spark, sf_dir)
    return (
        scored.select("doc_id", "dl", F.round(score, 8).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(50)
    )


@register(
    "customer_rfm_segments",
    category="analytics",
    oracle=f"""
    WITH rfm AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_order,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             {sql_dsum('o_totalprice')} AS monetary
      FROM orders GROUP BY o_custkey
    ),
    scored AS (
      SELECT o_custkey, last_order, frequency, monetary,
             NTILE(5) OVER (ORDER BY last_order DESC, o_custkey) AS r_score,
             NTILE(5) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
             NTILE(5) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
      FROM rfm
    )
    SELECT r_score, f_score, m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           {sql_dsum('monetary')} AS segment_value
    FROM scored
    GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency / frequency / monetary quintiles per
    customer, rolled up to segment sizes and value — the classic
    warehouse customer-scoring query. Ties broken by customer key so the
    quintile assignment is total-ordered and engine-reproducible.

    Scale: the base aggregate collapses orders to one row per customer
    map-side. Each quintile is computed WITHOUT a global-window NTILE
    (which would serialize the customer frame through one partition):
    a distributed ROW_NUMBER (range partition → local rank → broadcast
    per-partition offsets, `global_rank_cumsum`) plus the exact NTILE
    arithmetic from (rank, n) — `ntile_from_rank`. No Exchange in the
    plan is SinglePartition (pinned in tests/test_plans.py), so the
    scoring survives billion-customer cardinality unchanged."""
    from ._helpers import global_rank_cumsum, ntile_from_rank

    o = t(spark, sf_dir, "orders")
    rfm = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        dsum("o_totalprice").alias("monetary"),
    )
    scored, n, _ = global_rank_cumsum(
        rfm, [F.col("last_order").desc(), F.col("o_custkey")]
    )
    scored = scored.withColumn(
        "r_score", ntile_from_rank(F.col("_grk"), n)
    ).drop("_grk")
    for name, order in [
        ("f_score", [F.col("frequency").desc(), F.col("o_custkey")]),
        ("m_score", [F.col("monetary").desc(), F.col("o_custkey")]),
    ]:
        scored, _, _ = global_rank_cumsum(scored, order)
        scored = scored.withColumn(
            name, ntile_from_rank(F.col("_grk"), n)
        ).drop("_grk")
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            dsum("monetary").alias("segment_value"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


@register(
    "supplier_pareto_revenue",
    category="analytics",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey,
             {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
      FROM lineitem GROUP BY l_suppkey
    ),
    ranked AS (
      SELECT l_suppkey, revenue,
             ROW_NUMBER() OVER (ORDER BY revenue DESC, l_suppkey) AS rk,
             SUM(CAST(revenue AS DECIMAL(18,6))) OVER (
               ORDER BY revenue DESC, l_suppkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_dec,
             SUM(CAST(revenue AS DECIMAL(18,6))) OVER () AS tot_dec,
             COUNT(*) OVER () AS n_sup
      FROM rev
    )
    SELECT rk, l_suppkey, revenue,
           CAST(cum_dec AS DOUBLE) / CAST(tot_dec AS DOUBLE) AS cum_share,
           CASE WHEN CAST(cum_dec AS DOUBLE) / CAST(tot_dec AS DOUBLE) <= 0.8
                THEN 1 ELSE 0 END AS in_top80
    FROM ranked ORDER BY rk
    """,
)
def supplier_pareto_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto / 80-20 concentration analysis: suppliers ranked by revenue
    with each one's cumulative share of the total, flagging the set that
    carries 80% of revenue. Cumulative and total sums run in DECIMAL so
    every share is a ratio of exact numbers — bit-identical cross-engine
    (a double running sum would drift with accumulation order).

    Scale: the fact table collapses to one row per supplier before any
    window, then rank and running sum come from the two-pass distributed
    prefix sum (`global_rank_cumsum`: range partition → per-partition
    cumsum → broadcast offsets) — no single-partition Exchange in the
    plan (pinned in tests/test_plans.py), so the concentration curve
    computes identically over a billion-entity frame. The grand total is
    the exact decimal sum of the per-partition totals (driver-side,
    O(partitions)); decimal addition is associative so it is
    bit-identical to the engines' own SUM."""
    from ._helpers import global_rank_cumsum

    li = t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue")
    )
    ranked, _, tot = global_rank_cumsum(
        rev,
        [F.col("revenue").desc(), F.col("l_suppkey")],
        value_col=F.col("revenue").cast("decimal(18,6)"),
        rank_name="rk",
        cum_name="_cum",
    )
    # tot is None on empty input (no rows → no shares evaluated; the
    # guard only prevents float(None) at plan-build time)
    share = F.col("_cum").cast("double") / F.lit(
        float(tot) if tot is not None else 1.0
    )
    return (
        ranked.withColumn("cum_share", share)
        .withColumn("in_top80", F.when(share <= 0.8, 1).otherwise(0))
        .select("rk", "l_suppkey", "revenue", "cum_share", "in_top80")
        .orderBy("rk")
    )


# ---------------------------------------------------------------------------
# Market-basket association rules
# ---------------------------------------------------------------------------

_ASSOC_MIN_PAIR = 3  # sf0.01 keeps ~63 rules; scale raises counts, not the floor
_ASSOC_TOP = 50


@register(
    "basket_association_rules",
    category="analytics",
    oracle=f"""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    n_orders AS (
      SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n FROM baskets
    ),
    items AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c
      FROM baskets GROUP BY l_partkey
    ),
    pairs AS (
      SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
             CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM baskets a JOIN baskets b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY item_a, item_b
    )
    SELECT item_a, item_b, c_ab,
           CAST(c_ab AS DOUBLE) / n.n AS support,
           CAST(c_ab AS DOUBLE) / ia.c AS confidence_ab,
           (CAST(c_ab AS DOUBLE) * n.n)
             / (CAST(ia.c AS DOUBLE) * ib.c) AS lift
    FROM pairs
    JOIN items ia ON item_a = ia.l_partkey
    JOIN items ib ON item_b = ib.l_partkey
    CROSS JOIN n_orders n
    WHERE c_ab >= {_ASSOC_MIN_PAIR}
    ORDER BY lift DESC, item_a, item_b
    LIMIT {_ASSOC_TOP}
    """,
    doc="Market-basket association rules over order baskets: support, "
    "confidence and lift per co-purchased part pair with a pair-count "
    "floor — the recommendation/affinity primitive. All ratios divide "
    "exact integer counts (every product < 2^53, so the doubles are "
    "exact and the single division rounds identically cross-engine).",
)
def basket_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One distinct collapse to basket membership, one self-join on the
    basket key for pair counts (bounded per basket by items², like the
    co-purchase graph), then two broadcast joins of the Zipf-bounded
    item-count table plus a 1-row total. The pair count floor prunes
    before ranking; top-N is TakeOrdered on lift."""
    li = t(spark, sf_dir, "lineitem")
    # localCheckpoint: the basket set feeds FOUR consumers (both self-
    # join sides, the item counts, the order total) and Spark reuses no
    # common subplan — without it the lineitem scan + distinct shuffle
    # runs four times and the query's codegen surface quadruples (its
    # fresh-JVM profile read 6.9 -> 2.4 s over six runs, pure JIT churn).
    # Materialized once it is a ~540k-row/sf narrow table; every
    # consumer reads the checkpointed blocks. Same pattern as
    # split_leakage_safe's reused CC pair list.
    baskets = (
        li.select("l_orderkey", "l_partkey").distinct()
        .localCheckpoint(eager=True)
    )
    n_orders = baskets.agg(
        F.countDistinct("l_orderkey").cast("double").alias("n")
    )
    items = baskets.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    a = baskets.alias("a")
    b = baskets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("item_a"),
            F.col("b.l_partkey").alias("item_b"),
        )
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .filter(F.col("c_ab") >= _ASSOC_MIN_PAIR)
    )
    ia = items.select(F.col("l_partkey").alias("item_a"), F.col("c").alias("c_a"))
    ib = items.select(F.col("l_partkey").alias("item_b"), F.col("c").alias("c_b"))
    lift = (F.col("c_ab").cast("double") * F.col("n")) / (
        F.col("c_a").cast("double") * F.col("c_b")
    )
    return (
        pairs.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "item_a",
            "item_b",
            "c_ab",
            (F.col("c_ab").cast("double") / F.col("n")).alias("support"),
            (F.col("c_ab").cast("double") / F.col("c_a")).alias("confidence_ab"),
            lift.alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "item_a", "item_b")
        .limit(_ASSOC_TOP)
    )


@register(
    "orders_seasonality",
    category="analytics",
    oracle=f"""
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             COUNT(*) AS n_orders,
             {sql_dsum('o_totalprice')} AS revenue
      FROM orders GROUP BY 1
    )
    SELECT month, n_orders, revenue,
           AVG(revenue) OVER (
             ORDER BY month ROWS BETWEEN 11 PRECEDING AND CURRENT ROW
           ) AS trailing_12m_avg,
           revenue / AVG(revenue) OVER (
             ORDER BY month ROWS BETWEEN 11 PRECEDING AND CURRENT ROW
           ) AS seasonal_index
    FROM monthly ORDER BY month
    """,
    doc="Seasonality decomposition: monthly revenue, trailing-12-month "
    "moving average, and the seasonal index (month over trend) — the BI "
    "trend/seasonality splitter. The window runs over the MONTH grain "
    "(dozens of rows after the collapse, constant in data size), so the "
    "ordered single-partition frame is safe at any scale; per-month "
    "revenue is the decimal-exact dsum, whose scale-6 doubles sum "
    "exactly in any frame-evaluation order (DuckDB's segment-tree "
    "window and Spark's running frame agree bit-for-bit).",
)
def orders_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    o = t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )
    w = W.orderBy("month").rowsBetween(-11, 0)
    ma = F.avg("revenue").over(w)
    return monthly.select(
        "month",
        "n_orders",
        "revenue",
        ma.alias("trailing_12m_avg"),
        (F.col("revenue") / ma).alias("seasonal_index"),
    ).orderBy("month")


@register(
    "orders_open_backlog_daily",
    category="analytics",
    oracle="""
    WITH spans AS (
      SELECT o.o_orderkey,
             CAST(o.o_orderdate AS DATE) AS open_d,
             CAST(MAX(l.l_shipdate) AS DATE) AS close_d
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      GROUP BY o.o_orderkey, o.o_orderdate
    ),
    deltas AS (
      SELECT open_d AS d, CAST(1 AS BIGINT) AS delta FROM spans
      UNION ALL
      SELECT close_d + 1, CAST(-1 AS BIGINT) FROM spans
    ),
    daily AS (SELECT d, SUM(delta) AS net FROM deltas GROUP BY d)
    SELECT d, CAST(net AS BIGINT) AS net,
           CAST(SUM(net) OVER (ORDER BY d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS open_orders
    FROM daily ORDER BY d
    """,
    doc="Open-order backlog over time (interval concurrency): each order "
    "is open from orderdate through its last shipment; +1/-1 boundary "
    "deltas collapse per day, and the running sum over the day spine is "
    "the concurrent-open count — the sweep-line rewrite that replaces a "
    "per-day interval-containment join (O(days*orders)) with one "
    "aggregation plus a prefix sum over O(days) rows.",
)
def orders_open_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The day-grain frame after the delta collapse is O(distinct days)
    — thousands of rows at any corpus size — so its running sum uses
    the distributed two-pass prefix sum (global_rank_cumsum: range
    partition + per-partition window + broadcast offsets, no
    single-partition Exchange), same as the RFM/Pareto analytics."""
    from ._helpers import global_rank_cumsum

    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    spans = (
        o.join(l, o.o_orderkey == l.l_orderkey)
        .groupBy(o.o_orderkey, "o_orderdate")
        .agg(F.max("l_shipdate").alias("close_d"))
        .select(
            F.col("o_orderdate").cast("date").alias("open_d"),
            F.col("close_d").cast("date").alias("close_d"),
        )
    )
    deltas = spans.select(
        F.col("open_d").alias("d"), F.lit(1).cast("bigint").alias("delta")
    ).unionByName(
        spans.select(
            F.date_add("close_d", 1).alias("d"),
            F.lit(-1).cast("bigint").alias("delta"),
        )
    )
    daily = deltas.groupBy("d").agg(F.sum("delta").alias("net"))
    ranked, _, _ = global_rank_cumsum(
        daily, [F.col("d")], value_col=F.col("net"), cum_name="open_orders"
    )
    return (
        ranked.select(
            "d",
            F.col("net").cast("bigint").alias("net"),
            F.col("open_orders").cast("bigint").alias("open_orders"),
        )
        .orderBy("d")
    )


@register(
    "orders_yoy_growth",
    category="analytics",
    oracle=f"""
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             COUNT(*) AS n_orders,
             {sql_dsum('o_totalprice')} AS revenue
      FROM orders GROUP BY 1
    )
    SELECT month, n_orders, revenue,
           LAG(revenue, 12) OVER (ORDER BY month) AS revenue_prev_year,
           CASE WHEN LAG(revenue, 12) OVER (ORDER BY month) IS NULL THEN NULL
                ELSE CAST(ROUND(
                  CAST((revenue - LAG(revenue, 12) OVER (ORDER BY month))
                       / LAG(revenue, 12) OVER (ORDER BY month) * 100
                       AS DECIMAL(28,12)), 6) AS DOUBLE)
           END AS yoy_pct
    FROM monthly ORDER BY month
    """,
    doc="Year-over-year growth: monthly revenue vs the same month last "
    "year (LAG 12 over the month grain) with percentage growth — the "
    "standard BI comparison query. Like orders_seasonality, the window "
    "runs AFTER the collapse to month grain (dozens of rows, constant in "
    "data size), so the single-partition ordered frame is safe at any "
    "scale; the scan-side aggregation is the only data-sized work and it "
    "is a plain partial/final groupBy. Revenue is the decimal-exact "
    "dsum; the growth ratio is rounded through DECIMAL(28,12) so both "
    "engines round the same double.",
)
def orders_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    monthly = o.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice").alias("revenue"),
    )
    w = W.orderBy("month")
    prev = F.lag("revenue", 12).over(w)
    yoy = F.when(
        prev.isNull(), F.lit(None).cast("double")
    ).otherwise(
        F.round(
            ((F.col("revenue") - prev) / prev * 100).cast("decimal(28,12)"), 6
        ).cast("double")
    )
    return monthly.select(
        "month",
        "n_orders",
        "revenue",
        prev.alias("revenue_prev_year"),
        yoy.alias("yoy_pct"),
    ).orderBy("month")


@register(
    "orders_cohort_ltv",
    category="analytics",
    oracle=f"""
    WITH firsts AS (
      SELECT o_custkey,
             CAST(date_trunc('month', MIN(o_orderdate)) AS DATE) AS cohort_month
      FROM orders GROUP BY o_custkey
    ),
    monthly AS (
      SELECT f.cohort_month,
             CAST(date_diff('month', f.cohort_month,
                            CAST(date_trunc('month', o.o_orderdate) AS DATE))
                  AS INT) AS months_since,
             {sql_dsum('o.o_totalprice')} AS revenue
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
      GROUP BY 1, 2
    )
    SELECT cohort_month, months_since, revenue,
           CAST(SUM(CAST(revenue AS DECIMAL(18,6)))
                  OVER (PARTITION BY cohort_month ORDER BY months_since)
                AS DOUBLE) AS cum_revenue
    FROM monthly ORDER BY cohort_month, months_since
    """,
    doc="Customer-cohort lifetime value: customers grouped by first-order "
    "month, revenue bucketed by months-since-acquisition, cumulative LTV "
    "per cohort — the acquisition-payback curve every subscription/"
    "commerce warehouse reports. Plan: the firsts aggregate is one "
    "map-side-combinable groupBy on custkey; the fact join shuffles on "
    "custkey ONCE against that pre-collapsed (one row per customer) "
    "frame — never against raw orders; the cohort×month matrix is "
    "months² rows (constant in data size) so the cumulative window "
    "runs post-collapse, partitioned by cohort. Revenue is the "
    "decimal-exact dsum, so the running cumulative sums agree "
    "bit-for-bit in any frame-evaluation order.",
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    firsts = o.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).cast("date").alias("cohort_month")
    )
    monthly = (
        o.join(firsts, "o_custkey")
        .groupBy(
            "cohort_month",
            (
                F.months_between(
                    F.date_trunc("month", F.col("o_orderdate")).cast("date"),
                    F.col("cohort_month"),
                )
            )
            .cast("int")
            .alias("months_since"),
        )
        .agg(dsum("o_totalprice").alias("revenue"))
    )
    w = W.partitionBy("cohort_month").orderBy("months_since")
    return monthly.select(
        "cohort_month",
        "months_since",
        "revenue",
        # cumulative through DECIMAL: a double running sum differs in the
        # last ulp between Spark's streaming frame and DuckDB's segment
        # tree; the scale-6 decimal re-cast is exact for scale-2 money.
        F.sum(F.col("revenue").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("cum_revenue"),
    ).orderBy("cohort_month", "months_since")


# ---------------------------------------------------------------------------
# Hybrid retrieval: BM25 ⊕ dense cosine via reciprocal-rank fusion
# ---------------------------------------------------------------------------

_RRF_K = 60
_RRF_POOL = 100  # depth of each ranked list entering the fusion
_RRF_TOP = 20


def _rrf_oracle() -> str:
    from ..functions.vector import sql_cosine_fixed

    tf_cols, df_cols, score = _bm25_sql_parts()
    return rf"""
    WITH base AS (
      SELECT doc_id,
             CAST(LEN(string_split_regex(TRIM(text), '\s+')) AS INT) AS dl,
             {tf_cols}
      FROM documents
    ),
    stats AS (
      SELECT COUNT(*) AS n_docs, SUM(dl) AS sum_dl, {df_cols} FROM base
    ),
    bm AS (
      SELECT doc_id, CAST(ROUND({score}, 8) AS DOUBLE) AS bm25
      FROM base CROSS JOIN stats
      ORDER BY bm25 DESC, doc_id LIMIT {_RRF_POOL}
    ),
    bm_ranked AS (
      SELECT doc_id, bm25,
             ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS r_text
      FROM bm
    ),
    q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    cs AS (
      SELECT e.vec_id AS doc_id,
             {sql_cosine_fixed('e.embedding', 'q.embedding')} AS cosine
      FROM embeddings e CROSS JOIN q
      ORDER BY cosine DESC, e.vec_id LIMIT {_RRF_POOL}
    ),
    cs_ranked AS (
      SELECT doc_id, cosine,
             ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS r_dense
      FROM cs
    )
    SELECT COALESCE(b.doc_id, c.doc_id) AS doc_id,
           b.r_text, c.r_dense,
           COALESCE(1.0 / ({_RRF_K} + b.r_text), 0)
             + COALESCE(1.0 / ({_RRF_K} + c.r_dense), 0) AS rrf_score
    FROM bm_ranked b FULL OUTER JOIN cs_ranked c ON b.doc_id = c.doc_id
    ORDER BY rrf_score DESC, doc_id LIMIT {_RRF_TOP}
    """


@register(
    "retrieval_hybrid_rrf",
    category="similarity",
    oracle=_rrf_oracle(),
    doc="Hybrid retrieval: BM25 lexical ranking and dense cosine ranking "
    "fused by reciprocal-rank fusion (score = Σ 1/(60+rank)) — the "
    "standard RAG retrieval stack (sparse ⊕ dense, rank-level fusion "
    "needs no score calibration). Each arm produces its top-100 as a "
    "TakeOrderedAndProject (per-partition heaps, no global sort of the "
    "corpus); ranks are then assigned inside the 100-row pool (constant "
    "size — the single-partition window is data-independent), and the "
    "fusion is a full-outer join of two 100-row lists. At 100 TB the "
    "dense arm swaps brute-force for the IVF/LSH probes (sim_topk_*) "
    "and the lexical arm keeps its one broadcast-stats pass — fusion "
    "cost never changes. doc_id ≡ vec_id for embedded documents.",
)
def retrieval_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.vector import dot_fixed

    scored, score = _bm25_scored(spark, sf_dir)
    bm = (
        scored.select("doc_id", F.round(score, 8).alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(_RRF_POOL)
    )
    w_text = W.orderBy(F.col("bm25").desc(), "doc_id")
    bm_ranked = bm.select(
        "doc_id", F.row_number().over(w_text).cast("bigint").alias("r_text")
    )

    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_emb")
    )
    cs = (
        e.crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            (
                dot_fixed(F.col("embedding"), F.col("q_emb"))
                / (
                    F.sqrt(dot_fixed(F.col("embedding"), F.col("embedding")))
                    * F.sqrt(dot_fixed(F.col("q_emb"), F.col("q_emb")))
                )
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "doc_id")
        .limit(_RRF_POOL)
    )
    w_dense = W.orderBy(F.col("cosine").desc(), "doc_id")
    cs_ranked = cs.select(
        "doc_id", F.row_number().over(w_dense).cast("bigint").alias("r_dense")
    )

    fused = (
        bm_ranked.join(cs_ranked, "doc_id", "full_outer")
        .select(
            "doc_id",
            "r_text",
            "r_dense",
            (
                F.coalesce(1.0 / (_RRF_K + F.col("r_text")), F.lit(0.0))
                + F.coalesce(1.0 / (_RRF_K + F.col("r_dense")), F.lit(0.0))
            ).alias("rrf_score"),
        )
        .orderBy(F.col("rrf_score").desc(), "doc_id")
        .limit(_RRF_TOP)
    )
    return fused



# ---------------------------------------------------------------------------
# Retrieval evaluation: precision@k / MRR / nDCG over dense top-k
# ---------------------------------------------------------------------------

_REV_NQ = 8    # queries: vec_id 0..7
_REV_K = 10    # cutoff
# 1e6-scaled DCG gains 1/log2(rank+1) for ranks 1..10, precomputed as
# INTEGER LITERALS shared by both engines — no runtime log2, so DCG and
# IDCG are pure int64 sums, bit-identical everywhere.
_REV_GAINS = [1000000, 630930, 500000, 430677, 386853, 356207, 333333, 315465, 301030, 289065]
_REV_CUM_GAINS = [1000000, 1630930, 2130930, 2561607, 2948460, 3304667, 3638000, 3953465, 4254495, 4543560]  # IDCG prefix sums for truncation at nrel < k


def _retrieval_eval_oracle() -> str:
    from ..functions.vector import sql_cosine_fixed

    gains_rows = ", ".join(
        f"({i + 1}, {g})" for i, g in enumerate(_REV_GAINS)
    )
    cum_rows = ", ".join(
        f"({i + 1}, {c})" for i, c in enumerate(_REV_CUM_GAINS)
    )
    return f"""
    WITH q AS (
      SELECT vec_id AS qid, embedding AS q_emb, label AS q_label
      FROM embeddings WHERE vec_id < {_REV_NQ}
    ),
    scored AS (
      SELECT q.qid, q.q_label, e.vec_id, e.label,
             {sql_cosine_fixed('e.embedding', 'q.q_emb')} AS cosine
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.qid
    ),
    ranked AS (
      SELECT qid, q_label, vec_id, label,
             ROW_NUMBER() OVER (PARTITION BY qid
                                ORDER BY cosine DESC, vec_id) AS rk
      FROM scored
    ),
    topk AS (SELECT * FROM ranked WHERE rk <= {_REV_K}),
    gains AS (SELECT * FROM (VALUES {gains_rows}) g(rk, gain)),
    cums AS (SELECT * FROM (VALUES {cum_rows}) c(n, cum_gain)),
    nrel AS (
      SELECT q.qid,
             (SELECT COUNT(*) FROM embeddings e
              WHERE e.label = q.q_label AND e.vec_id <> q.qid) AS n_relevant
      FROM q
    ),
    per_q AS (
      SELECT t.qid,
             CAST(SUM(CASE WHEN t.label = t.q_label THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_hits,
             CAST(SUM(CASE WHEN t.label = t.q_label THEN g.gain ELSE 0 END)
                  AS BIGINT) AS dcg_micro,
             MIN(CASE WHEN t.label = t.q_label THEN t.rk END) AS first_rel
      FROM topk t JOIN gains g ON g.rk = t.rk
      GROUP BY t.qid
    )
    SELECT p.qid AS query_id,
           p.n_hits,
           p.n_hits * 1000000 // {_REV_K} AS precision_micro,
           COALESCE(1000000 // p.first_rel, 0) AS rr_micro,
           CASE WHEN n.n_relevant = 0 THEN 0
                ELSE p.dcg_micro * 1000000 //
                     (SELECT cum_gain FROM cums
                      WHERE n = LEAST(n.n_relevant, {_REV_K}))
           END AS ndcg_micro
    FROM per_q p JOIN nrel n ON p.qid = n.qid
    ORDER BY query_id
    """


@register(
    "retrieval_eval_metrics",
    category="similarity",
    oracle=_retrieval_eval_oracle(),
    doc="Retrieval evaluation harness: precision@10, MRR, and nDCG@10 "
    "for 8 dense queries against label-match ground truth, all in "
    "1e6-scaled integer arithmetic (DCG gains are precomputed literal "
    "constants, so both engines fold identical int64 sums — no runtime "
    "log2, no float drift).",
)
def retrieval_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The eval loop every retrieval/RAG stack needs next to its index:
    given ranked lists and a relevance oracle (here: embedding label
    match, self excluded), score each query with precision@k, MRR, and
    nDCG@k. Rank-gain arithmetic is where cross-engine float drift
    usually creeps in (1/log2(rank+1) sums); precomputing the ten gains
    as 1e6-scaled INTEGER literals makes DCG, the truncated IDCG
    (prefix-sum constants, cut at min(n_relevant, k)), and every final
    metric pure int64 — bit-identical across engines, partitionings,
    and cluster sizes. MRR uses the same convention (1e6 DIV rank).

    Plan: queries broadcast onto one corpus scan (8·N fixed-point dots,
    map-side); per-query top-10 via a window over the 8 query
    partitions; the relevant-count side is a label-sized aggregate
    broadcast back. At 100 TB the scoring arm swaps brute-force for the
    IVF/LSH probes (sim_topk_*) exactly as retrieval_hybrid_rrf does —
    the metric fold is rank-arithmetic on k rows per query and never
    changes. Reference class: the warehouse-side eval SQL the reference
    defers to its backends (README.md:15-25)."""
    from ..functions.vector import dot_fixed

    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _REV_NQ).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("q_label"),
    )
    cos = (
        dot_fixed(F.col("embedding"), F.col("q_emb"))
        / (
            F.sqrt(dot_fixed(F.col("embedding"), F.col("embedding")))
            * F.sqrt(dot_fixed(F.col("q_emb"), F.col("q_emb")))
        )
    )
    scored = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", "q_label", "vec_id", "label", cos.alias("cosine"))
    )
    wq = W.partitionBy("qid").orderBy(F.col("cosine").desc(), "vec_id")
    topk = scored.withColumn("rk", F.row_number().over(wq)).filter(
        F.col("rk") <= _REV_K
    )
    gain = F.element_at(
        F.array(*[F.lit(g) for g in _REV_GAINS]), F.col("rk")
    ).cast("bigint")
    rel = F.col("label") == F.col("q_label")
    per_q = topk.groupBy("qid").agg(
        F.sum(F.when(rel, 1).otherwise(0)).cast("bigint").alias("n_hits"),
        F.sum(F.when(rel, gain).otherwise(0)).cast("bigint").alias("dcg_micro"),
        F.min(F.when(rel, F.col("rk"))).alias("first_rel"),
    )
    label_counts = e.groupBy("label").agg(F.count(F.lit(1)).alias("c"))
    nrel = q.join(
        F.broadcast(label_counts), q.q_label == label_counts.label
    ).select("qid", (F.col("c") - 1).alias("n_relevant"))
    # clamp the index to >=1: element_at is evaluated unconditionally
    # (before the n_relevant == 0 guard below), and index 0 throws
    # under ANSI; the guard still forces ndcg_micro = 0 for that row
    idcg = F.element_at(
        F.array(*[F.lit(c) for c in _REV_CUM_GAINS]),
        F.greatest(
            F.least(F.col("n_relevant"), F.lit(_REV_K)), F.lit(1)
        ).cast("int"),
    ).cast("bigint")
    return (
        per_q.join(F.broadcast(nrel), "qid")
        .withColumn("_idcg", idcg)
        .select(
            F.col("qid").alias("query_id"),
            "n_hits",
            F.expr(f"n_hits * 1000000 DIV {_REV_K}").alias("precision_micro"),
            F.coalesce(
                F.expr("1000000 DIV first_rel").cast("bigint"), F.lit(0)
            ).alias("rr_micro"),
            F.when(F.col("n_relevant") == 0, F.lit(0).cast("bigint"))
            .otherwise(F.expr("(dcg_micro * 1000000) DIV _idcg"))
            .alias("ndcg_micro"),
        )
        .orderBy("query_id")
    )


_DID_CUT = "1998-01-01"


@register(
    "promo_lift_did",
    category="analytics",
    oracle=f"""
    WITH cells AS (
      SELECT CASE WHEN p.p_type LIKE 'PROMO%' THEN 1 ELSE 0 END AS treated,
             CASE WHEN l.l_shipdate >= TIMESTAMP '{_DID_CUT}' THEN 1 ELSE 0 END
               AS period_after,
             {sql_dsum("l.l_extendedprice * (1 - l.l_discount)")} AS revenue,
             CAST(COUNT(*) AS BIGINT) AS n_lines
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      GROUP BY 1, 2
    ),
    wide AS (
      SELECT
        MAX(CASE WHEN treated = 1 AND period_after = 0 THEN revenue END) AS t_before,
        MAX(CASE WHEN treated = 1 AND period_after = 1 THEN revenue END) AS t_after,
        MAX(CASE WHEN treated = 0 AND period_after = 0 THEN revenue END) AS c_before,
        MAX(CASE WHEN treated = 0 AND period_after = 1 THEN revenue END) AS c_after
      FROM cells
    )
    SELECT treated, period_after, revenue, n_lines,
           (SELECT (t_after - t_before) - (c_after - c_before) FROM wide)
             AS did_estimate
    FROM cells
    ORDER BY treated, period_after
    """,
    doc="Difference-in-differences promo lift: revenue in the four "
    "(treated=PROMO part, period=before/after the cut) cells, plus the "
    "DiD estimate (ΔT − ΔC) — the standard quasi-experimental uplift "
    "read when there is no randomized holdout. One fact scan, the part "
    "flag joined in (broadcast-eligible dim), a 4-row conditional "
    "aggregate, and the estimate as arithmetic over the broadcast "
    "4-row frame. Decimal-exact revenue makes the estimate "
    "bit-stable cross-engine. At scale this is exactly a q14-shaped "
    "plan — the heavy operator is the one map-side-combinable groupBy.",
)
def promo_lift_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select(
        "p_partkey",
        F.when(F.col("p_type").like("PROMO%"), 1).otherwise(0).alias("treated"),
    )
    cells = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy(
            "treated",
            F.when(
                F.col("l_shipdate") >= F.lit(_DID_CUT).cast("timestamp"), 1
            )
            .otherwise(0)
            .alias("period_after"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    wide = cells.agg(
        F.max(F.when((F.col("treated") == 1) & (F.col("period_after") == 0), F.col("revenue"))).alias("t_before"),
        F.max(F.when((F.col("treated") == 1) & (F.col("period_after") == 1), F.col("revenue"))).alias("t_after"),
        F.max(F.when((F.col("treated") == 0) & (F.col("period_after") == 0), F.col("revenue"))).alias("c_before"),
        F.max(F.when((F.col("treated") == 0) & (F.col("period_after") == 1), F.col("revenue"))).alias("c_after"),
    ).select(
        (
            (F.col("t_after") - F.col("t_before"))
            - (F.col("c_after") - F.col("c_before"))
        ).alias("did_estimate")
    )
    return (
        cells.crossJoin(F.broadcast(wide))
        .select("treated", "period_after", "revenue", "n_lines", "did_estimate")
        .orderBy("treated", "period_after")
    )


_MIGRATION_CUT = "1998-01-01"


def _period_quintiles(o: DataFrame, before: bool):
    """Per-customer monetary quintile within one period, computed with the
    distributed prefix-sum rank (no single-partition NTILE)."""
    from ._helpers import global_rank_cumsum, ntile_from_rank

    cond = (
        F.col("o_orderdate") < F.lit(_MIGRATION_CUT).cast("timestamp")
        if before
        else F.col("o_orderdate") >= F.lit(_MIGRATION_CUT).cast("timestamp")
    )
    per_cust = (
        o.filter(cond)
        .groupBy("o_custkey")
        .agg(dsum("o_totalprice").alias("monetary"))
    )
    ranked, n, _ = global_rank_cumsum(
        per_cust,
        [F.col("monetary").desc(), F.col("o_custkey")],
        rank_name="_grk",
    )
    return ranked.select(
        "o_custkey", ntile_from_rank(F.col("_grk"), n).alias("segment")
    )


@register(
    "customer_value_migration",
    category="analytics",
    oracle=f"""
    WITH before_m AS (
      SELECT o_custkey, {sql_dsum('o_totalprice')} AS monetary
      FROM orders WHERE o_orderdate < TIMESTAMP '{_MIGRATION_CUT}'
      GROUP BY o_custkey
    ),
    after_m AS (
      SELECT o_custkey, {sql_dsum('o_totalprice')} AS monetary
      FROM orders WHERE o_orderdate >= TIMESTAMP '{_MIGRATION_CUT}'
      GROUP BY o_custkey
    ),
    seg_b AS (
      SELECT o_custkey,
             NTILE(5) OVER (ORDER BY monetary DESC, o_custkey) AS segment
      FROM before_m
    ),
    seg_a AS (
      SELECT o_custkey,
             NTILE(5) OVER (ORDER BY monetary DESC, o_custkey) AS segment
      FROM after_m
    )
    SELECT COALESCE(CAST(b.segment AS BIGINT), 0) AS segment_before,
           COALESCE(CAST(a.segment AS BIGINT), 0) AS segment_after,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM seg_b b FULL OUTER JOIN seg_a a USING (o_custkey)
    GROUP BY 1, 2
    ORDER BY segment_before, segment_after
    """,
    doc="Customer value-segment migration matrix: monetary quintile "
    "before vs after the period cut, with 0 standing for "
    "absent-in-period (new / churned customers) — the retention-"
    "movement read behind every customer-value program. Quintiles come "
    "from the distributed prefix-sum rank + closed-form NTILE "
    "arithmetic (ntile_from_rank, tie-broken by customer key — "
    "engine-reproducible and plan-pinned single-partition-free for its "
    "other consumers); the matrix is a full-outer join of two "
    "one-row-per-customer frames then a ≤36-cell combinable "
    "aggregate. Both period collapses are map-side partial "
    "aggregations of the fact scan.",
)
def customer_value_migration(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    seg_b = _period_quintiles(o, before=True).withColumnRenamed(
        "segment", "segment_before"
    )
    seg_a = _period_quintiles(o, before=False).withColumnRenamed(
        "segment", "segment_after"
    )
    return (
        seg_b.join(seg_a, "o_custkey", "full_outer")
        .select(
            F.coalesce(F.col("segment_before").cast("bigint"), F.lit(0)).alias(
                "segment_before"
            ),
            F.coalesce(F.col("segment_after").cast("bigint"), F.lit(0)).alias(
                "segment_after"
            ),
        )
        .groupBy("segment_before", "segment_after")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("segment_before", "segment_after")
    )


@register(
    "part_chi2_independence",
    category="analytics",
    oracle="""
    WITH cells AS (
      SELECT p_brand, p_type, CAST(COUNT(*) AS BIGINT) AS obs
      FROM part GROUP BY p_brand, p_type
    ),
    rows_t AS (SELECT p_brand, SUM(obs) AS row_n FROM cells GROUP BY p_brand),
    cols_t AS (SELECT p_type, SUM(obs) AS col_n FROM cells GROUP BY p_type),
    tot AS (SELECT SUM(obs) AS n FROM cells),
    terms AS (
      SELECT c.obs,
             CAST(r.row_n AS DOUBLE) * c2.col_n / t.n AS expected,
             CAST(FLOOR(
               (c.obs - CAST(r.row_n AS DOUBLE) * c2.col_n / t.n)
               * (c.obs - CAST(r.row_n AS DOUBLE) * c2.col_n / t.n)
               / (CAST(r.row_n AS DOUBLE) * c2.col_n / t.n) * 1e9
             ) AS BIGINT) AS term_fixed
      FROM cells c
      JOIN rows_t r USING (p_brand)
      JOIN cols_t c2 USING (p_type)
      CROSS JOIN tot t
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_cells,
           CAST((SELECT COUNT(*) FROM rows_t) - 1 AS BIGINT)
             * ((SELECT COUNT(*) FROM cols_t) - 1) AS dof,
           CAST(SUM(term_fixed) AS DOUBLE) / 1e9 AS chi2,
           CASE WHEN LEAST((SELECT COUNT(*) FROM rows_t) - 1,
                           (SELECT COUNT(*) FROM cols_t) - 1) > 0
                THEN SQRT( (CAST(SUM(term_fixed) AS DOUBLE) / 1e9)
                      / ((SELECT n FROM tot)
                         * LEAST((SELECT COUNT(*) FROM rows_t) - 1,
                                 (SELECT COUNT(*) FROM cols_t) - 1)) )
           END AS cramers_v
    FROM terms
    """,
    doc="Chi-square independence test between two categorical columns "
    "(brand × type) with Cramér's V effect size — the "
    "feature-association screen every profiling/feature-selection "
    "pass runs. Observed counts are ONE combinable groupBy; expected "
    "counts come from broadcast row/column marginals (constant-size "
    "frames); per-cell (O−E)²/E terms are FLOOR fixed-point so the "
    "sum over cells is order-independent and bit-identical "
    "cross-engine (plain double summation over hundreds of cells "
    "would differ in the last ulp per accumulation order). V's SQRT "
    "is IEEE-correctly-rounded.",
)
def part_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part")
    cells = p.groupBy("p_brand", "p_type").agg(
        F.count(F.lit(1)).alias("obs")
    )
    rows_t = cells.groupBy("p_brand").agg(F.sum("obs").alias("row_n"))
    cols_t = cells.groupBy("p_type").agg(F.sum("obs").alias("col_n"))
    tot = cells.agg(F.sum("obs").alias("n"))
    expected = F.col("row_n").cast("double") * F.col("col_n") / F.col("n")
    term_fixed = F.floor(
        (F.col("obs") - expected) * (F.col("obs") - expected) / expected
        * F.lit(1e9)
    ).cast("bigint")
    terms = (
        cells.join(F.broadcast(rows_t), "p_brand")
        .join(F.broadcast(cols_t), "p_type")
        .crossJoin(F.broadcast(tot))
        .select("obs", term_fixed.alias("term_fixed"), "n")
    )
    n_rows = rows_t.count()
    n_cols = cols_t.count()
    chi2 = F.sum("term_fixed").cast("double") / F.lit(1e9)
    mindim = min(n_rows - 1, n_cols - 1)
    # a single-level categorical (mindim = 0) has no defined V — the
    # unguarded divide ABORTS under ANSI mode where NULL is the answer
    cramers = (
        F.sqrt(chi2 / (F.max("n") * F.lit(mindim)))
        if mindim > 0
        else F.lit(None).cast("double")
    )
    return terms.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.lit((n_rows - 1) * (n_cols - 1)).cast("bigint").alias("dof"),
        chi2.alias("chi2"),
        cramers.alias("cramers_v"),
    )


@register(
    "supplier_abc_classification",
    category="analytics",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey,
             {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
      FROM lineitem GROUP BY l_suppkey
    ),
    ranked AS (
      SELECT l_suppkey, revenue,
             SUM(CAST(revenue AS DECIMAL(18,6))) OVER (
               ORDER BY revenue DESC, l_suppkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_dec,
             SUM(CAST(revenue AS DECIMAL(18,6))) OVER () AS tot_dec
      FROM rev
    ),
    classed AS (
      SELECT l_suppkey, revenue,
             CASE WHEN CAST(cum_dec AS DOUBLE) / CAST(tot_dec AS DOUBLE) <= 0.8
                    THEN 'A'
                  WHEN CAST(cum_dec AS DOUBLE) / CAST(tot_dec AS DOUBLE) <= 0.95
                    THEN 'B'
                  ELSE 'C' END AS abc_class
      FROM ranked
    )
    SELECT abc_class,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(SUM(CAST(revenue AS DECIMAL(18,6))) AS DOUBLE) AS class_revenue
    FROM classed GROUP BY abc_class ORDER BY abc_class
    """,
    doc="ABC classification (the operations-management standard on top "
    "of the Pareto curve): suppliers carrying the first 80% of revenue "
    "are class A, the next 15% B, the tail C — reported as class sizes "
    "and revenue. Same machinery as supplier_pareto_revenue: collapse "
    "to one row per supplier, distributed two-pass prefix sum for the "
    "decimal-exact cumulative (no single-partition Exchange), then a "
    "3-row combinable rollup. Class boundaries compare the same exact "
    "ratios both engines compute, so membership never flips on float "
    "noise.",
)
def supplier_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ._helpers import global_rank_cumsum

    li = t(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        )
    )
    ranked, _, tot = global_rank_cumsum(
        rev,
        [F.col("revenue").desc(), F.col("l_suppkey")],
        value_col=F.col("revenue").cast("decimal(18,6)"),
        rank_name="rk",
        cum_name="_cum",
    )
    share = F.col("_cum").cast("double") / F.lit(
        float(tot) if tot is not None else 1.0
    )
    abc = (
        F.when(share <= 0.8, "A").when(share <= 0.95, "B").otherwise("C")
    )
    return (
        ranked.withColumn("abc_class", abc)
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.sum(F.col("revenue").cast("decimal(18,6)"))
            .cast("double")
            .alias("class_revenue"),
        )
        .orderBy("abc_class")
    )


@register(
    "orders_priority_mix_shift",
    category="analytics",
    oracle="""
    WITH cells AS (
      SELECT CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter,
             o_orderpriority,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1, 2
    ),
    shared AS (
      SELECT quarter, o_orderpriority, n_orders,
             CAST(n_orders AS DOUBLE)
               / SUM(n_orders) OVER (PARTITION BY quarter) AS share
      FROM cells
    )
    SELECT quarter, o_orderpriority, n_orders, share,
           share - LAG(share) OVER (
             PARTITION BY o_orderpriority ORDER BY quarter
           ) AS share_delta
    FROM shared
    ORDER BY quarter, o_orderpriority
    """,
    doc="Mix-shift monitor: each order priority's share of its quarter "
    "and the delta vs the previous quarter — the composition-drift "
    "read that separates volume changes from mix changes (the same "
    "shape monitors language mix or source mix in a data pipeline; "
    "corpus_drift_kl is its information-theoretic sibling). Shares "
    "are single divisions of exact integers and the LAG difference "
    "subtracts two such doubles — no accumulation, bit-stable. The "
    "data-sized work is one combinable groupBy; both windows run on "
    "the quarter×priority grid (constant size).",
)
def orders_priority_mix_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders")
    cells = o.groupBy(
        F.date_trunc("quarter", F.col("o_orderdate")).cast("date").alias(
            "quarter"
        ),
        "o_orderpriority",
    ).agg(F.count(F.lit(1)).alias("n_orders"))
    w_q = W.partitionBy("quarter")
    shared = cells.select(
        "quarter",
        "o_orderpriority",
        "n_orders",
        (
            F.col("n_orders").cast("double") / F.sum("n_orders").over(w_q)
        ).alias("share"),
    )
    w_lag = W.partitionBy("o_orderpriority").orderBy("quarter")
    return shared.select(
        "quarter",
        "o_orderpriority",
        "n_orders",
        "share",
        (F.col("share") - F.lag("share").over(w_lag)).alias("share_delta"),
    ).orderBy("quarter", "o_orderpriority")


@register(
    "skyline_pareto_frontier",
    category="analytics",
    oracle=f"""
    WITH rev AS (
      SELECT l_suppkey,
             {sql_dsum('l_extendedprice * (1 - l_discount)')} AS total_revenue
      FROM lineitem GROUP BY l_suppkey
    ),
    sup AS (
      SELECT s.s_suppkey, s.s_name, r.total_revenue, s.s_acctbal
      FROM supplier s JOIN rev r ON r.l_suppkey = s.s_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue, s_acctbal
    FROM sup a
    WHERE NOT EXISTS (
      SELECT 1 FROM sup b
      WHERE b.total_revenue >= a.total_revenue
        AND b.s_acctbal >= a.s_acctbal
        AND (b.total_revenue > a.total_revenue OR b.s_acctbal > a.s_acctbal)
    )
    ORDER BY total_revenue DESC, s_suppkey
    """,
)
def skyline_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Börzsönyi et al., ICDE'01): suppliers not dominated
    on (total lineitem revenue ↑, account balance ↑) — the multi-criteria
    shortlist ("no other supplier is at least as good on both axes and
    strictly better on one"). The oracle is the literal NOT EXISTS
    dominance test, a quadratic nested-loop only a verifier can afford.

    In 2-D the skyline reduces to an exclusive prefix max: order by
    revenue DESC; a supplier survives iff no strictly-higher-revenue row
    has balance >= its own AND no equal-revenue row has balance strictly
    greater. Both maxima come from one per-revenue aggregation plus a
    DISTRIBUTED prefix max — the same two-pass shape as
    `_helpers.global_rank_cumsum`: range-partition on the sort key,
    windows partitioned by `spark_partition_id()` (every window bounded,
    NO single-partition exchange), one O(P) driver collect of partition
    maxima folded into exclusive offsets and broadcast back. Equal sort
    keys land in one range partition, so the exclusive frame never leaks
    a same-key row into the strict prefix.

    Scale: cost is one groupBy to per-revenue grain, one sampled range
    exchange over that (distinct-key-sized) table, one broadcast of P
    offset rows, one equi-join back — every step linear and parallel;
    the classic sort-filter skyline's sequential scan is replaced by
    partition-local scans + an O(P) fold. Suppliers with no lineitem
    are excluded by the inner join (documented; the oracle matches)."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("k")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "total_revenue"
        )
    )
    sup = s.join(rev, s.s_suppkey == F.col("k")).select(
        "s_suppkey", "s_name", "total_revenue", "s_acctbal"
    )
    # per-revenue max balance (M2): the strict same-key dominator test
    per = sup.groupBy("total_revenue").agg(F.max("s_acctbal").alias("m2"))
    # distributed exclusive prefix max of m2 over revenue DESC (M1)
    P = spark.sparkContext.defaultParallelism
    part = per.repartitionByRange(P, F.col("total_revenue").desc()).withColumn(
        "_pid", F.spark_partition_id()
    )
    w = (
        W.partitionBy("_pid")
        .orderBy(F.col("total_revenue").desc())
        .rowsBetween(W.unboundedPreceding, -1)
    )
    # localCheckpoint, not persist: the frame is referenced twice (the
    # O(P) offsets collect and the final join), and a bare persist()
    # with no unpersist leaks cached partitions for the session's
    # lifetime — checkpoint files are released when the frame is GC'd
    local = part.withColumn("_lmax", F.max("m2").over(w)).localCheckpoint()
    pmax = sorted(
        local.groupBy("_pid").agg(F.max("m2").alias("_m")).collect(),
        key=lambda r: r["_pid"],
    )
    run = None
    offsets = []
    for row in pmax:
        offsets.append((row["_pid"], run))
        if row["_m"] is not None:
            run = row["_m"] if run is None else max(run, row["_m"])
    bal_t = sup.schema["s_acctbal"].dataType.simpleString()
    offs = spark.createDataFrame(
        [(p, m) for p, m in offsets], f"_pid int, _off {bal_t}"
    )
    m1 = (
        local.join(F.broadcast(offs), "_pid")
        .select(
            "total_revenue",
            "m2",
            F.greatest(
                F.coalesce("_lmax", F.lit(None).cast(bal_t)),
                F.coalesce("_off", F.lit(None).cast(bal_t)),
            ).alias("m1"),
        )
    )
    return (
        sup.join(m1, "total_revenue")
        .filter(
            (F.col("m1").isNull() | (F.col("m1") < F.col("s_acctbal")))
            & (F.col("m2") <= F.col("s_acctbal"))
        )
        .select("s_suppkey", "s_name", "total_revenue", "s_acctbal")
        .orderBy(F.col("total_revenue").desc(), "s_suppkey")
    )
