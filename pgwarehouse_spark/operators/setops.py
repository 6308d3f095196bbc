"""Set operations (SURVEY.md §2-B "Set ops").

The reference's ClickHouse merge is semantically `(target EXCEPT changed
keys) UNION ALL changes` (reference clickhouse_backend.py:263-269); the
full union/intersect/except surface is provisioned via the warehouse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._helpers import t


def _hi_lo(spark: SparkSession, sf_dir: str):
    o = t(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") > 200000.0).select("o_custkey")
    recent = o.filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select("o_custkey")
    return hi, recent


@register(
    "set_union_all",
    category="setop",
    oracle="""
    SELECT o_custkey, COUNT(*) AS n FROM (
      SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0
      UNION ALL
      SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
    ) GROUP BY o_custkey ORDER BY o_custkey
    """,
)
def set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    hi, recent = _hi_lo(spark, sf_dir)
    return (
        hi.unionByName(recent)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_custkey")
    )


@register(
    "set_union_distinct",
    category="setop",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0
    UNION
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
    ORDER BY o_custkey
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    hi, recent = _hi_lo(spark, sf_dir)
    return hi.unionByName(recent).distinct().orderBy("o_custkey")


@register(
    "set_intersect",
    category="setop",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
    ORDER BY o_custkey
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    hi, recent = _hi_lo(spark, sf_dir)
    return hi.intersect(recent).orderBy("o_custkey")


@register(
    "set_except",
    category="setop",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
    ORDER BY o_custkey
    """,
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    hi, recent = _hi_lo(spark, sf_dir)
    return hi.subtract(recent).orderBy("o_custkey")


_UNPIVOT_SUMS = """CAST(SUM(CAST((l_quantity) AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST((l_extendedprice) AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
             CAST(SUM(CAST((l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc,
             CAST(SUM(CAST((l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_tax"""


@register(
    "reshape_unpivot",
    category="setop",
    oracle=f"""
    WITH agg AS (
      SELECT l_returnflag,
             {_UNPIVOT_SUMS}
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM agg
    UNION ALL
    SELECT l_returnflag, 'sum_price', sum_price FROM agg
    UNION ALL
    SELECT l_returnflag, 'sum_disc', sum_disc FROM agg
    UNION ALL
    SELECT l_returnflag, 'sum_tax', sum_tax FROM agg
    ORDER BY l_returnflag, metric
    """,
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (wide → long), the inverse of agg_pivot: aggregate
    first, then melt the tiny wide result — the 100 TB-sane order (the
    melt multiplies rows ×4, so it must run on the aggregate, never on
    the fact). Spark's native df.unpivot is one ProjectExec+Expand, no
    shuffle; the oracle spells it as UNION ALL, the portable form."""
    from ._helpers import dsum

    li = t(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_price"),
        dsum("l_discount").alias("sum_disc"),
        dsum("l_tax").alias("sum_tax"),
    )
    return agg.unpivot(
        ["l_returnflag"],
        ["sum_qty", "sum_price", "sum_disc", "sum_tax"],
        "metric",
        "value",
    ).orderBy("l_returnflag", "metric")


@register(
    "set_intersect_all",
    category="setop",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
    ORDER BY o_custkey
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics intersect: duplicates survive up to the minimum
    multiplicity on either side (Spark plans this as a count-tracking
    aggregate, not a distinct)."""
    hi, recent = _hi_lo(spark, sf_dir)
    return hi.intersectAll(recent).orderBy("o_custkey")


@register(
    "set_except_all",
    category="setop",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderdate >= TIMESTAMP '1999-01-01'
    ORDER BY o_custkey
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics except: each right-side occurrence cancels ONE
    left-side occurrence (multiplicity subtraction)."""
    hi, recent = _hi_lo(spark, sf_dir)
    return hi.exceptAll(recent).orderBy("o_custkey")
