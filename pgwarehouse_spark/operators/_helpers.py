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

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def dsum(col: Column | str, scale: int = 6) -> Column:
    """Order-independent (exact) sum of a double expression, as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def davg(col: Column | str, scale: int = 6) -> Column:
    """Order-independent mean: exact decimal sum / count, double division."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


# SQL-side equivalents (same text works in Spark SQL and DuckDB).
def sql_dsum(expr: str, scale: int = 6) -> str:
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(18,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 6) -> str:
    return f"({sql_dsum(expr, scale)} / COUNT({expr}))"
