"""Backend-aware DDL emission (VERDICT r01 item 4): the sink must
reproduce the reference's per-warehouse CREATE TABLE semantics —
Snowflake reserved-word quoting (snowflake_backend.py:111-115, list at
:21), ClickHouse Nullable wrapping + PK-derived engine clause
(clickhouse_backend.py:145-153) — and run the emitted DDL against a
live JDBC target."""

from __future__ import annotations

import pytest

from pyspark.sql import types as T

from pgwarehouse_spark.sync.dialects import (
    ClickHouseDialect,
    DuckDBDialect,
    SinkDialect,
    SnowflakeDialect,
    dialect_for,
)

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), nullable=False),
        T.StructField("order", T.StringType()),  # reserved word
        T.StructField("price", T.DecimalType(12, 2)),
        T.StructField("ts", T.TimestampType()),
        T.StructField("tags", T.ArrayType(T.StringType())),
    ]
)


def test_snowflake_reserved_word_quoting_matches_reference():
    d = SnowflakeDialect()
    sql = d.create_table_sql("items", SCHEMA, pk=["id"])
    # reference quotes exactly the RESERVED_COL_NAMES list (":111-115")
    assert '"order" VARCHAR' in sql
    assert sql.count('"') == 2  # only the reserved column is quoted
    assert "id NUMBER(19,0) NOT NULL" in sql
    assert "price NUMBER(12,2)" in sql
    assert "ts TIMESTAMP_NTZ" in sql
    # arrays fall back to the catch-all type (reference: String)
    assert "tags VARCHAR" in sql
    # every name in the reference's list quotes; near-misses don't
    for w in ("current_date", "order", "to", "from", "values", "start", "current"):
        assert d.quote_ident(w) == f'"{w}"'
    assert d.quote_ident("ordering") == "ordering"


def test_clickhouse_nullable_wrap_and_engine_clause():
    d = ClickHouseDialect()
    sql = d.create_table_sql("items", SCHEMA, pk=["id"])
    # PK column stays bare; every other column Nullable(...) (:145-147)
    assert "id Int64" in sql and "Nullable(Int64)" not in sql
    assert "`order` Nullable(String)" in sql
    assert "price Nullable(Decimal(12,2))" in sql
    assert "ts Nullable(DateTime64(6))" in sql
    assert "tags Nullable(Array(String))" in sql
    assert sql.rstrip().endswith("ENGINE = MergeTree() ORDER BY (id)")
    # no PK → StripeLog fallback (:152-153)
    nopk = d.create_table_sql("items", SCHEMA, pk=[])
    assert nopk.rstrip().endswith("ENGINE = StripeLog")
    # with no PK, even id is Nullable-wrapped
    assert "id Nullable(Int64)" in nopk


def test_generic_and_duckdb_ansi_ddl():
    sql = DuckDBDialect().create_table_sql("t", SCHEMA, pk=["id"])
    assert sql.startswith('CREATE TABLE t (id BIGINT NOT NULL, "order" VARCHAR')
    g = SinkDialect()
    assert g.quote_ident("select") == '"select"'
    assert g.quote_ident("weird name") == '"weird name"'
    assert g.quote_ident("a\"b") == '"a""b"'
    assert g.quote_ident("plain") == "plain"


def test_dialect_for_lookup():
    assert dialect_for(None) is None
    assert dialect_for("snowflake").name == "snowflake"
    assert dialect_for("ClickHouse").name == "clickhouse"
    d = SnowflakeDialect()
    assert dialect_for(d) is d
    with pytest.raises(ValueError, match="unknown sink dialect"):
        dialect_for("oracle9i")


# ---- live: dialect-emitted DDL actually runs on a JDBC target --------

DERBY = "org.apache.derby.jdbc.EmbeddedDriver"


def test_dialect_ddl_roundtrip_on_derby(spark, tmp_path):
    """Generic-dialect DDL (quoted reserved-word column) executes on a
    real database and the parallel append + read-back agree."""
    from pgwarehouse_spark.sync.jdbc_sink import JdbcWarehouse

    db = str(tmp_path / "derbydb")
    wh = JdbcWarehouse(
        f"jdbc:derby:{db};create=true", driver=DERBY, dialect="generic"
    )
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 6.5)],
        T.StructType(
            [
                T.StructField("id", T.IntegerType(), nullable=False),
                T.StructField("order", T.StringType()),  # reserved in Derby too
                T.StructField("v", T.DoubleType()),
            ]
        ),
    )
    ddl = wh.dialect.create_table_sql("items", df.schema, pk=["id"])
    assert '"order"' in ddl
    wh.write_full(df, "items", pk=["id"])
    back = wh.read(spark, "items")
    assert back.count() == 2
    assert sorted(c.lower() for c in back.columns) == ["id", "order", "v"]
    # overwrite path again (drop + recreate) stays idempotent
    wh.write_full(df, "items", pk=["id"])
    assert wh.count(spark, "items") == 2
