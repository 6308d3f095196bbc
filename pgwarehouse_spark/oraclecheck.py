"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a registered Spark query and its oracle SQL side-by-side, then
compares row count, column names, and order-insensitive values
(columns sorted by name, rows sorted, floats compared bit-for-bit —
the queries are engineered to be bit-deterministic cross-engine).
"""

from __future__ import annotations

import datetime as _dt
import math
import os

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{path}')"
            )
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return bool(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, _dt.timedelta):
        return v.total_seconds()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return float(v)
    except ImportError:
        # decimal is stdlib and should always import; if a stripped
        # interpreter lacks it, no Decimal values can exist either, so
        # falling through to the identity return is safe.
        pass
    return v


def _norm_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda row: tuple((x is None, str(type(x)), str(x)) for x in row))
    return out


def compare(spark_df, con: duckdb.DuckDBPyConnection, oracle_sql: str) -> dict:
    spark_cols = [c.lower() for c in spark_df.columns]
    spark_rows = [tuple(r) for r in spark_df.collect()]

    res = con.execute(oracle_sql)
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    report = {
        "spark_count": len(spark_rows),
        "duck_count": len(duck_rows),
        "spark_cols": sorted(spark_cols),
        "duck_cols": sorted(duck_cols),
    }
    report["count_match"] = report["spark_count"] == report["duck_count"]
    report["cols_match"] = report["spark_cols"] == report["duck_cols"]
    if report["count_match"] and report["cols_match"]:
        a = _norm_rows(spark_cols, spark_rows)
        b = _norm_rows(duck_cols, duck_rows)
        report["values_match"] = a == b
        if not report["values_match"]:
            diffs = [(x, y) for x, y in zip(a, b) if x != y]
            report["first_diffs"] = diffs[:5]
    else:
        report["values_match"] = False
    report["ok"] = report["count_match"] and report["cols_match"] and report["values_match"]
    return report
