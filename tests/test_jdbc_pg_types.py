"""Postgres-typed JDBC fidelity contract (VERDICT r04 item 8).

Derby (the live JDBC e2e backend, tests/test_jdbc.py) cannot represent
`uuid`, enums, arrays, `jsonb`, or `interval` — exactly the pg types the
reference's three mappers handle (SURVEY §1.3; clickhouse_backend.py:49-86,
snowflake_backend.py:78-109, duckdb_backend.py:33-67). This test feeds
JdbcSource.discover_schema the FULL §1.3 matrix through a pure-Python
DatabaseMetaData shim speaking the JDBC interface (getColumns /
getPrimaryKeys ResultSet protocol), pinning typemap behavior for every
row in both native and compat modes — no live database involved.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from pgwarehouse_spark.sync.engine import JdbcSource
from pgwarehouse_spark.typemap import jdbc_type_to_spark, pg_jdbc_type_name_to_pg

# java.sql.Types constants used by the matrix
BOOLEAN, CHAR, VARCHAR, TIME, DATE, TIMESTAMP = 16, 1, 12, 92, 91, 93
INTEGER, BIGINT, SMALLINT, NUMERIC, REAL, DOUBLE = 4, -5, 5, 2, 7, 8
BINARY, OTHER, ARRAY, TS_TZ = -2, 1111, 2003, 2014

# The SURVEY §1.3 matrix, spelled the way the Postgres JDBC driver
# reports it (pg_type.typname; arrays as leading-underscore): one row per
# reference mapping rule, expected Spark type in native and compat modes.
MATRIX = [
    # (column, TYPE_NAME over JDBC, DATA_TYPE, native, compat)
    ("kind", "park_type_enum", OTHER, T.StringType(), T.StringType()),
    ("flag", "bool", BOOLEAN, T.BooleanType(), T.BooleanType()),
    ("name", "varchar", VARCHAR, T.StringType(), T.StringType()),
    ("code", "bpchar", CHAR, T.StringType(), T.StringType()),
    ("doc", "jsonb", OTHER, T.StringType(), T.StringType()),
    ("body", "text", VARCHAR, T.StringType(), T.StringType()),
    ("at_time", "time", TIME, T.StringType(), T.StringType()),
    ("day", "date", DATE, T.DateType(), T.TimestampType()),
    ("ts", "timestamp", TIMESTAMP, T.TimestampType(), T.TimestampType()),
    ("ts_tz", "timestamptz", TS_TZ, T.TimestampType(), T.TimestampType()),
    ("id", "int8", BIGINT, T.LongType(), T.LongType()),
    ("n", "int4", INTEGER, T.IntegerType(), T.IntegerType()),
    ("small", "int2", SMALLINT, T.ShortType(), T.IntegerType()),
    ("amount", "numeric", NUMERIC, T.DecimalType(38, 18), T.DoubleType()),
    ("ratio", "float4", REAL, T.FloatType(), T.DoubleType()),
    ("score", "float8", DOUBLE, T.DoubleType(), T.DoubleType()),
    ("yr", "year", OTHER, T.StringType(), T.StringType()),
    ("uid", "uuid", OTHER, T.StringType(), T.StringType()),
    ("tags", "_text", ARRAY, T.ArrayType(T.StringType()), T.StringType()),
    ("nums", "_int4", ARRAY, T.ArrayType(T.IntegerType()), T.StringType()),
    ("span", "interval", OTHER, T.StringType(), T.StringType()),
    ("blob", "bytea", BINARY, T.BinaryType(), T.BinaryType()),
    ("mystery", "hstore", OTHER, T.StringType(), T.StringType()),
]


class _Rows:
    """JDBC ResultSet protocol over a list of dicts."""

    def __init__(self, rows: list[dict]):
        self._rows, self._i = rows, -1

    def next(self):
        self._i += 1
        return self._i < len(self._rows)

    def _get(self, key):
        return self._rows[self._i][key]

    getString = _get
    getInt = _get
    getShort = _get

    def close(self):
        pass


class _Meta:
    def __init__(self, columns: list[dict], pks: list[dict]):
        self._columns, self._pks = columns, pks

    def getColumns(self, _cat, _schem, table, _pat):
        return _Rows(self._columns if table == "parks" else [])

    def getPrimaryKeys(self, _cat, _schem, table):
        return _Rows(self._pks if table == "parks" else [])


class _Conn:
    def __init__(self, meta):
        self._meta = meta

    def getMetaData(self):
        return self._meta

    def close(self):
        pass


@pytest.fixture()
def pg_shim(monkeypatch):
    columns = [
        {
            "COLUMN_NAME": col,
            "TYPE_NAME": type_name,
            "DATA_TYPE": code,
            "ORDINAL_POSITION": i + 1,
            "TABLE_CAT": None,
            "TABLE_SCHEM": "public",
            # unconstrained numeric reports 0/0 (JDBC getInt on NULL)
            "COLUMN_SIZE": 0,
            "DECIMAL_DIGITS": 0,
        }
        for i, (col, type_name, code, _, _) in enumerate(MATRIX)
    ]
    pks = [
        {"TABLE_CAT": None, "TABLE_SCHEM": "public", "KEY_SEQ": 1,
         "COLUMN_NAME": "id"},
    ]
    meta = _Meta(columns, pks)
    monkeypatch.setattr(
        JdbcSource, "_jvm_connection", lambda self, spark: _Conn(meta)
    )
    return JdbcSource("jdbc:postgresql://shim/db")


def test_discover_schema_full_pg_matrix_native(pg_shim):
    schema = pg_shim.discover_schema(None, "parks")
    assert schema is not None and len(schema) == len(MATRIX)
    for (col, type_name, _, native, _), field in zip(MATRIX, schema):
        assert field.name == col
        assert field.dataType == native, f"{col} ({type_name})"
    # PK column is non-nullable; everything else nullable
    assert schema["id"].nullable is False
    assert schema["name"].nullable is True


def test_discover_schema_full_pg_matrix_compat(pg_shim):
    schema = pg_shim.discover_schema(None, "parks", compat=True)
    for (col, type_name, _, _, compat), field in zip(MATRIX, schema):
        assert field.dataType == compat, f"{col} ({type_name}) compat"


@pytest.mark.parametrize("col,type_name,code,native,compat", MATRIX)
def test_jdbc_type_to_spark_row(col, type_name, code, native, compat):
    assert jdbc_type_to_spark(type_name, code) == native
    assert jdbc_type_to_spark(type_name, code, compat=True) == compat


def test_pg_jdbc_internal_spellings_normalize():
    assert pg_jdbc_type_name_to_pg("_int4") == "integer[]"
    assert pg_jdbc_type_name_to_pg("float8") == "double precision"
    assert pg_jdbc_type_name_to_pg("bpchar") == "character"
    assert pg_jdbc_type_name_to_pg("timestamptz") == "timestamp with time zone"
    assert pg_jdbc_type_name_to_pg("text[]") == "text[]"
    assert pg_jdbc_type_name_to_pg("uuid") == "uuid"


def test_array_code_forces_array_when_driver_reports_element_name():
    # some drivers report ARRAY columns with the ELEMENT type name and
    # DATA_TYPE=2003; the code must still force array treatment
    assert jdbc_type_to_spark("int4", 2003) == T.ArrayType(T.IntegerType())
    assert jdbc_type_to_spark("int4", 2003, compat=True) == T.StringType()


def test_discover_watermark_over_shim(monkeypatch):
    """Watermark discovery on pg-typed metadata: a timestamptz
    `updated_at` (DATA_TYPE 2014, which Derby can't produce) is found;
    a varchar `last_modified` is rejected (name without type)."""
    columns = [
        {"COLUMN_NAME": "id", "TYPE_NAME": "int8", "DATA_TYPE": BIGINT,
         "ORDINAL_POSITION": 1},
        {"COLUMN_NAME": "last_modified", "TYPE_NAME": "varchar",
         "DATA_TYPE": VARCHAR, "ORDINAL_POSITION": 2},
        {"COLUMN_NAME": "updated_at", "TYPE_NAME": "timestamptz",
         "DATA_TYPE": TS_TZ, "ORDINAL_POSITION": 3},
    ]
    meta = _Meta(columns, [])
    monkeypatch.setattr(
        JdbcSource, "_jvm_connection", lambda self, spark: _Conn(meta)
    )
    src = JdbcSource("jdbc:postgresql://shim/db")
    assert src.discover_watermark(None, "parks") == "updated_at"


def test_custom_schema_ddl_from_shim(pg_shim):
    """The customSchema DDL that type_fidelity reads pass to Spark's
    JDBC reader: every §1.3 column present, spelled in Spark SQL type
    syntax, cached after the first metadata probe."""
    ddl = pg_shim.custom_schema_ddl(None, "parks")
    assert ddl is not None
    # type spellings contain commas (decimal(38,18)) — assert by
    # substring, count columns from the cached schema
    assert "`id` bigint" in ddl
    assert "`amount` decimal(38,18)" in ddl
    assert "`tags` array<string>" in ddl
    assert "`day` date" in ddl
    assert "`uid` string" in ddl
    assert len(pg_shim._schema_cache["parks"]) == len(MATRIX)
    # cache: second call must not re-probe (shim would still answer,
    # so assert identity through the cache dict)
    assert pg_shim._schema_cache["parks"] is not None
    assert pg_shim.custom_schema_ddl(None, "parks") == ddl
    # unknown table -> None, not a crash
    assert pg_shim.custom_schema_ddl(None, "nope") is None


def test_declared_numeric_precision_scale_honored(monkeypatch):
    """numeric(p,s) keeps its DECLARED precision/scale through
    COLUMN_SIZE/DECIMAL_DIGITS (ADVICE r5 medium): forcing 38,18 on a
    numeric(24,20) column truncates fractional digits, and on a
    numeric(38,0) with >20 integer digits overflows to null. The
    fallback applies only to unconstrained numeric (reported 0/0)."""
    columns = [
        {"COLUMN_NAME": "price", "TYPE_NAME": "numeric", "DATA_TYPE": NUMERIC,
         "ORDINAL_POSITION": 1, "TABLE_CAT": None, "TABLE_SCHEM": "public",
         "COLUMN_SIZE": 12, "DECIMAL_DIGITS": 4},
        {"COLUMN_NAME": "micro", "TYPE_NAME": "numeric", "DATA_TYPE": NUMERIC,
         "ORDINAL_POSITION": 2, "TABLE_CAT": None, "TABLE_SCHEM": "public",
         "COLUMN_SIZE": 24, "DECIMAL_DIGITS": 20},
        {"COLUMN_NAME": "free", "TYPE_NAME": "numeric", "DATA_TYPE": NUMERIC,
         "ORDINAL_POSITION": 3, "TABLE_CAT": None, "TABLE_SCHEM": "public",
         "COLUMN_SIZE": 0, "DECIMAL_DIGITS": 0},
        # pg allows p>38 and negative scale; Spark can't — fall back
        {"COLUMN_NAME": "huge", "TYPE_NAME": "numeric", "DATA_TYPE": NUMERIC,
         "ORDINAL_POSITION": 4, "TABLE_CAT": None, "TABLE_SCHEM": "public",
         "COLUMN_SIZE": 60, "DECIMAL_DIGITS": 2},
        {"COLUMN_NAME": "neg", "TYPE_NAME": "numeric", "DATA_TYPE": NUMERIC,
         "ORDINAL_POSITION": 5, "TABLE_CAT": None, "TABLE_SCHEM": "public",
         "COLUMN_SIZE": 10, "DECIMAL_DIGITS": -3},
    ]
    meta = _Meta(columns, [])
    monkeypatch.setattr(
        JdbcSource, "_jvm_connection", lambda self, spark: _Conn(meta)
    )
    src = JdbcSource("jdbc:postgresql://shim/db")
    schema = src.discover_schema(None, "parks")
    assert schema["price"].dataType == T.DecimalType(12, 4)
    assert schema["micro"].dataType == T.DecimalType(24, 20)
    assert schema["free"].dataType == T.DecimalType(38, 18)
    assert schema["huge"].dataType == T.DecimalType(38, 18)
    assert schema["neg"].dataType == T.DecimalType(38, 18)
    # compat mode still degrades every numeric to double (reference
    # duckdb_backend.py:54-55 semantics)
    compat = src.discover_schema(None, "parks", compat=True)
    assert all(f.dataType == T.DoubleType() for f in compat.fields)


def test_custom_schema_ddl_survives_metadata_errors(monkeypatch):
    """A getColumns/getPrimaryKeys failure must degrade to generic
    inference (return None), never propagate and fail a read that would
    load fine without type fidelity (ADVICE r5 low)."""

    class _BrokenConn:
        def getMetaData(self):
            raise RuntimeError("permission denied on getColumns")

        def close(self):
            pass

    monkeypatch.setattr(
        JdbcSource, "_jvm_connection", lambda self, spark: _BrokenConn()
    )
    src = JdbcSource("jdbc:postgresql://shim/db", type_fidelity=True)
    assert src.custom_schema_ddl(None, "parks") is None
    # cached: the broken probe is not retried per read
    assert src._schema_cache["parks"] is None


def test_pg_range_and_vector_types_degrade_to_string():
    """int-prefixed composite typnames must NOT fall into the bigint
    rule: a fidelity read would call getLong on 'int4range' values and
    crash at runtime. Every range/multirange/vector spelling degrades to
    string, like the reference's unknown-type fallback."""
    for name in (
        "int4range", "int8range", "numrange", "tsrange", "tstzrange",
        "daterange", "int4multirange", "int8multirange", "nummultirange",
        "tsmultirange", "tstzmultirange", "datemultirange", "int2vector",
    ):
        assert jdbc_type_to_spark(name, OTHER) == T.StringType(), name
    # ...while the genuine int types still map to ints
    assert jdbc_type_to_spark("int4", INTEGER) == T.IntegerType()
    assert jdbc_type_to_spark("int8", BIGINT) == T.LongType()
    # and daterange must not be captured by the 'date' prefix rule
    assert jdbc_type_to_spark("daterange", OTHER) != T.DateType()


def test_discover_schema_ambiguous_across_schemas_returns_none(monkeypatch):
    """public.events and audit.events both match a null schema filter;
    merging their columns would fabricate a hybrid StructType — the
    probe must return None (generic inference fallback), mirroring
    discover_primary_key's guard."""
    columns = [
        {"COLUMN_NAME": "id", "TYPE_NAME": "int8", "DATA_TYPE": BIGINT,
         "ORDINAL_POSITION": 1, "TABLE_CAT": None, "TABLE_SCHEM": "public",
         "COLUMN_SIZE": 0, "DECIMAL_DIGITS": 0},
        {"COLUMN_NAME": "who", "TYPE_NAME": "text", "DATA_TYPE": VARCHAR,
         "ORDINAL_POSITION": 1, "TABLE_CAT": None, "TABLE_SCHEM": "audit",
         "COLUMN_SIZE": 0, "DECIMAL_DIGITS": 0},
    ]
    meta = _Meta(columns, [])
    monkeypatch.setattr(
        JdbcSource, "_jvm_connection", lambda self, spark: _Conn(meta)
    )
    src = JdbcSource("jdbc:postgresql://shim/db")
    assert src.discover_schema(None, "parks") is None
    assert src.custom_schema_ddl(None, "parks") is None


def test_custom_schema_ddl_quotes_raw_names(monkeypatch):
    """customSchema entries that don't match a result column are
    SILENTLY dropped by Spark, so the DDL must carry the raw source
    spelling, backtick-quoted (backticks escaped by doubling)."""
    columns = [
        {"COLUMN_NAME": "my col", "TYPE_NAME": "text", "DATA_TYPE": VARCHAR,
         "ORDINAL_POSITION": 1, "TABLE_CAT": None, "TABLE_SCHEM": "public",
         "COLUMN_SIZE": 0, "DECIMAL_DIGITS": 0},
        {"COLUMN_NAME": "weird`name", "TYPE_NAME": "int4",
         "DATA_TYPE": INTEGER, "ORDINAL_POSITION": 2, "TABLE_CAT": None,
         "TABLE_SCHEM": "public", "COLUMN_SIZE": 0, "DECIMAL_DIGITS": 0},
    ]
    meta = _Meta(columns, [])
    monkeypatch.setattr(
        JdbcSource, "_jvm_connection", lambda self, spark: _Conn(meta)
    )
    src = JdbcSource("jdbc:postgresql://shim/db")
    schema = src.discover_schema(None, "parks")
    assert [f.name for f in schema.fields] == ["my col", "weird`name"]
    ddl = src.custom_schema_ddl(None, "parks")
    assert "`my col` string" in ddl
    assert "`weird``name` int" in ddl
