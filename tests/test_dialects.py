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


# ---------------------------------------------------------------------------
# Golden-DDL parity vs the reference's own fixture schemas
# (/root/reference/pgwarehouse/tests/pg_setup.sql:1-29; VERDICT r02 item 3).
# Column pg-types are what psql \d prints for those declarations — the
# exact input parse_schema_file hands each backend.
# ---------------------------------------------------------------------------

from pgwarehouse_spark.sync.dialects import reference_create_table_sql

USERS10 = {
    "id": "integer",  # serial prints as integer
    "name": "text",
    "email": "character varying",
    "age": "integer",
}
MY_ORDERS = {
    "id": "bigint",  # bigserial prints as bigint
    "user_id": "integer",
    "order_date": "date",
    "order_amount": "double precision",  # float = double precision
    "order_updated": "timestamp without time zone",
}
LOCAL_PARKS = {
    "park_name": "text",
    "park_type": "park_type",  # enum type name; unknown to every backend
    "park_size": "integer",
    "park_location_lat": "double precision",
    "park_location_lon": "double precision",
    "park state": "character varying",  # quoted, space-bearing
}


def test_golden_ddl_clickhouse():
    # clickhouse_backend.py:143-159: Nullable wrap for non-PK columns,
    # MergeTree ORDER BY pk / StripeLog without PK, spaces → underscores
    assert reference_create_table_sql(
        "clickhouse", "users10", USERS10, ["id"]
    ) == (
        "CREATE TABLE IF NOT EXISTS users10 (id Int64, "
        "name Nullable(String), email Nullable(String), "
        "age Nullable(Int64)) ENGINE = MergeTree() ORDER BY (id);"
    )
    assert reference_create_table_sql(
        "clickhouse", "my_orders", MY_ORDERS, ["id"]
    ) == (
        "CREATE TABLE IF NOT EXISTS my_orders (id Int64, "
        "user_id Nullable(Int64), order_date Nullable(DateTime), "
        "order_amount Nullable(Float64), "
        "order_updated Nullable(DateTime64(3))) "
        "ENGINE = MergeTree() ORDER BY (id);"
    )
    assert reference_create_table_sql(
        "clickhouse", "local_parks", LOCAL_PARKS, []
    ) == (
        "CREATE TABLE IF NOT EXISTS local_parks "
        "(park_name Nullable(String), park_type Nullable(String), "
        "park_size Nullable(Int64), park_location_lat Nullable(Float64), "
        "park_location_lon Nullable(Float64), park_state Nullable(String)) "
        "ENGINE = StripeLog;"
    )


def test_golden_ddl_snowflake():
    # snowflake_backend.py:126-134: flat ANSI-ish types, schema-qualified
    # name, reserved-word-only quoting (space-bearing names emit
    # unquoted — faithfully reproduced; the engine's own SnowflakeDialect
    # quotes them properly)
    assert reference_create_table_sql(
        "snowflake", "users10", USERS10, ["id"]
    ) == (
        "CREATE TABLE IF NOT EXISTS PUBLIC.users10 "
        "(id BIGINT, name STRING, email STRING, age BIGINT);"
    )
    assert reference_create_table_sql(
        "snowflake", "my_orders", MY_ORDERS, ["id"]
    ) == (
        "CREATE TABLE IF NOT EXISTS PUBLIC.my_orders "
        "(id BIGINT, user_id BIGINT, order_date DATETIME, "
        "order_amount NUMERIC, order_updated TIMESTAMP);"
    )
    assert reference_create_table_sql(
        "snowflake", "local_parks", LOCAL_PARKS, []
    ) == (
        "CREATE TABLE IF NOT EXISTS PUBLIC.local_parks "
        "(park_name STRING, park_type String, park_size BIGINT, "
        "park_location_lat NUMERIC, park_location_lon NUMERIC, "
        "park state STRING);"
    )


def test_golden_ddl_duckdb():
    # duckdb_backend.py:89-97: per-column PRIMARY KEY suffix, spaces →
    # underscores, ANSI types with BIGINT-for-int
    assert reference_create_table_sql(
        "duckdb", "users10", USERS10, ["id"]
    ) == (
        "CREATE TABLE IF NOT EXISTS users10 (id BIGINT PRIMARY KEY, "
        "name VARCHAR, email VARCHAR, age BIGINT);"
    )
    assert reference_create_table_sql(
        "duckdb", "my_orders", MY_ORDERS, ["id"]
    ) == (
        "CREATE TABLE IF NOT EXISTS my_orders (id BIGINT PRIMARY KEY, "
        "user_id BIGINT, order_date TIMESTAMP, order_amount DOUBLE, "
        "order_updated TIMESTAMP);"
    )
    assert reference_create_table_sql(
        "duckdb", "local_parks", LOCAL_PARKS, []
    ) == (
        "CREATE TABLE IF NOT EXISTS local_parks (park_name VARCHAR, "
        "park_type VARCHAR, park_size BIGINT, park_location_lat DOUBLE, "
        "park_location_lon DOUBLE, park_state VARCHAR);"
    )


def test_golden_ddl_duckdb_executes():
    """The duckdb golden actually runs in a live DuckDB — the one
    backend available in this container — proving the parity DDL is
    executable, not just string-equal."""
    import duckdb

    con = duckdb.connect()
    for tbl, cols, pk in (
        ("users10", USERS10, ["id"]),
        ("my_orders", MY_ORDERS, ["id"]),
        ("local_parks", LOCAL_PARKS, []),
    ):
        con.execute(reference_create_table_sql("duckdb", tbl, cols, pk))
        assert con.execute(f"SELECT COUNT(*) FROM {tbl}").fetchone()[0] == 0


# ---------------------------------------------------------------------------
# Golden UPSERT statement sequences (VERDICT r5 task 8): the upsert
# siblings of the CREATE TABLE goldens above — pin the exact statement
# order + token streams of the reference's Snowflake MERGE
# (snowflake_backend.py:161-211) and ClickHouse delete-then-insert
# (clickhouse_backend.py:245-270) for the reference's fixture schemas.
# ---------------------------------------------------------------------------

from pgwarehouse_spark.sync.dialects import (
    reference_clickhouse_upsert_sql,
    reference_snowflake_merge_sql,
)


def test_golden_snowflake_merge_sequence():
    stmts = reference_snowflake_merge_sql(
        "my_orders", MY_ORDERS, ["id"],
        csv_name="my_orders10.csv.gz",
        csv_path="/data/my_orders_data/my_orders10.csv.gz",
        database="PGW", sf_schema="PUBLIC",
    )
    assert stmts == [
        "USE SCHEMA PUBLIC",
        "PUT file:///data/my_orders_data/my_orders10.csv.gz "
        "@PGW.PUBLIC.%my_orders;",
        "CREATE OR REPLACE FILE FORMAT pgw_csv_format TYPE = 'csv' "
        "SKIP_HEADER = 1 FIELD_OPTIONALLY_ENCLOSED_BY = '0x22' "
        "ESCAPE_UNENCLOSED_FIELD = NONE",
        "MERGE INTO PGW.PUBLIC.my_orders USING "
        "(SELECT id, user_id, order_date, order_amount, order_updated "
        "FROM @%my_orders(FILE_FORMAT => 'pgw_csv_format', "
        "PATTERN => 'my_orders10.csv.gz')) csvsrc "
        "ON csvsrc.id = my_orders.id "
        "WHEN MATCHED THEN UPDATE SET "
        "my_orders.id = csvsrc.id, my_orders.user_id = csvsrc.user_id, "
        "my_orders.order_date = csvsrc.order_date, "
        "my_orders.order_amount = csvsrc.order_amount, "
        "my_orders.order_updated = csvsrc.order_updated "
        "WHEN NOT MATCHED THEN INSERT "
        "(id, user_id, order_date, order_amount, order_updated) VALUES "
        "(csvsrc.id, csvsrc.user_id, csvsrc.order_date, "
        "csvsrc.order_amount, csvsrc.order_updated)",
        "REMOVE @%my_orders PATTERN = 'my_orders10.csv.gz'",
    ]


def test_golden_snowflake_merge_quotes_reserved_columns():
    # quote_col (:111-115) quotes only reserved names inside the MERGE
    cols = {"id": "bigint", "order": "integer", "value": "text"}
    stmts = reference_snowflake_merge_sql("t", cols, ["id"], "t10.csv.gz")
    merge = stmts[3]
    assert 'SELECT id, "order", value FROM' in merge
    assert 't."order" = csvsrc."order"' in merge
    assert '(id, "order", value) VALUES (csvsrc.id, csvsrc."order"' in merge


def test_golden_clickhouse_upsert_sequence():
    stmts = reference_clickhouse_upsert_sql("my_orders", MY_ORDERS, ["id"])
    assert stmts == [
        "DROP TABLE IF EXISTS my_orders__changes",
        # temp table is a full create (load_table create_table=True path)
        "CREATE TABLE IF NOT EXISTS my_orders__changes (id Int64, "
        "user_id Nullable(Int64), order_date Nullable(DateTime), "
        "order_amount Nullable(Float64), "
        "order_updated Nullable(DateTime64(3))) "
        "ENGINE = MergeTree() ORDER BY (id);",
        # CSV ingest: temporal columns read as String, repaired by
        # parseDateTimeBestEffortOrNull (for_parse=True, :58-64)
        "INSERT INTO my_orders__changes SELECT id, user_id, "
        "parseDateTimeBestEffortOrNull(order_date), order_amount, "
        "parseDateTimeBestEffortOrNull(order_updated) "
        "FROM input('id Int64, user_id Int64, order_date String, "
        "order_amount Float64, order_updated String') "
        "FORMAT CSVWithNames "
        "SETTINGS date_time_input_format='best_effort';",
        "ALTER TABLE my_orders DELETE WHERE id IN "
        "(SELECT id from my_orders__changes);",
        "INSERT INTO my_orders SELECT * FROM my_orders__changes;",
        "DROP TABLE my_orders__changes",
    ]


def test_golden_clickhouse_upsert_requires_pk():
    # clickhouse_backend.py:253-254: refuses without a PK
    with pytest.raises(ValueError, match="have to reload"):
        reference_clickhouse_upsert_sql("local_parks", LOCAL_PARKS, [])
