from pyspark.sql import types as T

from pgwarehouse_spark.typemap import (
    pg_type_to_spark,
    sanitize_column_name,
    schema_from_pg_columns,
)


def test_scalar_mappings():
    assert pg_type_to_spark("boolean") == T.BooleanType()
    assert pg_type_to_spark("bigint") == T.LongType()
    assert pg_type_to_spark("smallint") == T.ShortType()
    assert pg_type_to_spark("integer") == T.IntegerType()
    assert pg_type_to_spark("numeric(10,2)") == T.DecimalType(10, 2)
    assert pg_type_to_spark("numeric") == T.DecimalType(38, 18)
    assert pg_type_to_spark("double precision") == T.DoubleType()
    assert pg_type_to_spark("timestamp without time zone") == T.TimestampType()
    assert pg_type_to_spark("date") == T.DateType()
    assert pg_type_to_spark("character varying(255)") == T.StringType()
    assert pg_type_to_spark("text") == T.StringType()
    assert pg_type_to_spark("jsonb") == T.StringType()
    assert pg_type_to_spark("uuid") == T.StringType()
    assert pg_type_to_spark("bytea") == T.BinaryType()


def test_enum_and_unknown_degrade_to_string():
    assert pg_type_to_spark("park_type_enum") == T.StringType()
    assert pg_type_to_spark("some_custom_type") == T.StringType()


def test_arrays_native_vs_compat():
    assert pg_type_to_spark("integer[]") == T.ArrayType(T.IntegerType())
    assert pg_type_to_spark("text[]") == T.ArrayType(T.StringType())
    # compat mode reproduces the reference's arrays→string degradation
    assert pg_type_to_spark("integer[]", compat=True) == T.StringType()


def test_compat_mode_lossy_mappings():
    assert pg_type_to_spark("numeric(10,2)", compat=True) == T.DoubleType()
    assert pg_type_to_spark("date", compat=True) == T.TimestampType()
    assert pg_type_to_spark("smallint", compat=True) == T.IntegerType()


def test_schema_with_pk_nullability_and_sanitization():
    schema = schema_from_pg_columns(
        {"id": "bigint", "park state": "character varying", "when": "timestamp"},
        primary_key_cols=["id"],
    )
    assert schema["id"].nullable is False
    assert schema["park_state"].dataType == T.StringType()
    assert sanitize_column_name("park state") == "park_state"


def test_declared_numeric_display_name_keeps_precision():
    # `\d` display path: a declared numeric(p,s) keeps its exact
    # precision/scale; unconstrained numeric falls back to (38,18)
    assert pg_type_to_spark("numeric(12,4)") == T.DecimalType(12, 4)
    assert pg_type_to_spark("numeric(24,20)") == T.DecimalType(24, 20)
    assert pg_type_to_spark("decimal(9)") == T.DecimalType(9, 0)
    assert pg_type_to_spark("numeric") == T.DecimalType(38, 18)
    # un-honorable declarations (p>38, negative scale) fall back too
    assert pg_type_to_spark("numeric(60,2)") == T.DecimalType(38, 18)
    assert pg_type_to_spark("numeric(10,-3)") == T.DecimalType(38, 18)
