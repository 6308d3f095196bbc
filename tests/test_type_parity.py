"""Cross-engine output-TYPE parity for every oracle-backed query.

The driver's value hash is type-aware (round-1 lesson: q12 was
hash-red with identical values because the oracle's SUM(CASE) came
back DECIMAL(38,0) against Spark's bigint). Values matching is not
enough — every output column must carry the equivalent physical type
in both engines. This test runs the full registry: Spark side needs
only the analyzed schema (no job), DuckDB side executes the oracle at
the small fixture scale.
"""

from __future__ import annotations

import sys

import pytest

SPARK_DUCK_EQUIV = {
    ("bigint", "int64"),
    ("int", "int32"),
    ("smallint", "int16"),
    ("tinyint", "int8"),
    ("double", "double"),
    ("float", "float"),
    ("string", "string"),
    ("string", "large_string"),
    ("boolean", "bool"),
    ("date", "date32[day]"),
    ("timestamp", "timestamp[us]"),
    ("timestamp_ntz", "timestamp[us]"),
    ("binary", "binary"),
    ("binary", "large_binary"),
}


def _equiv(spark_t: str, duck_t: str) -> bool:
    if (spark_t, duck_t) in SPARK_DUCK_EQUIV:
        return True
    if spark_t.startswith("decimal(") and duck_t.startswith("decimal128("):
        return spark_t[8:-1].replace(" ", "") == duck_t[11:-1].replace(" ", "")
    # element-type parity for lists is covered by the value compare;
    # here we only require both sides to be list-shaped
    if spark_t.startswith("array<") and duck_t.startswith(("list<", "large_list<")):
        return True
    return False


def test_all_oracle_queries_have_type_parity(spark, sf_dir):
    from pgwarehouse_spark.registry import all_queries

    sys.path.insert(0, "tests")
    from pgwarehouse_spark.oraclecheck import duckdb_conn

    con = duckdb_conn(sf_dir)
    bad = []
    for name, spec in sorted(all_queries().items()):
        if not spec.oracle:
            continue
        stypes = {
            f.name.lower(): f.dataType.simpleString()
            for f in spec.fn(spark, sf_dir).schema.fields
        }
        duck = con.execute(spec.oracle).fetch_arrow_table().schema
        dtypes = {f.name.lower(): str(f.type) for f in duck}
        if sorted(stypes) != sorted(dtypes):
            bad.append((name, "columns", sorted(stypes), sorted(dtypes)))
            continue
        for col, st in stypes.items():
            if not _equiv(st, dtypes[col]):
                bad.append((name, col, st, dtypes[col]))
    assert not bad, f"{len(bad)} type mismatches: {bad}"
