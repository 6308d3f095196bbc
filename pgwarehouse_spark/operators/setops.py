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
