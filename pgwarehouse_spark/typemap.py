"""Postgres → Spark type translation (reference operator A6).

The reference hand-writes three per-backend mapping functions
(clickhouse_backend.py:49-86, snowflake_backend.py:78-109,
duckdb_backend.py:33-67), each degrading arrays/JSON to strings
(README.md:252-254). Here it is one table mapping PG type names to
``pyspark.sql.types`` — and arrays map to real ArrayType instead of
strings (the reference's own TODO at clickhouse_backend.py:82-84).

A ``compat`` mode reproduces the reference's lossy choices exactly
(numeric→double, arrays/json/uuid→string) for byte-parity migrations.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

# Prefix-match rules, first hit wins (mirrors the reference's if-chains).
_RULES: list[tuple[str, T.DataType]] = [
    ("boolean", T.BooleanType()),
    ("bigint", T.LongType()),
    ("bigserial", T.LongType()),
    ("smallint", T.ShortType()),
    ("serial", T.IntegerType()),
    ("integer", T.IntegerType()),
    # BEFORE the "int" prefix rule: "interval", the range types, and the
    # catalog vector types all start with "int" and would silently map
    # to bigint — a fidelity read would then call getLong on a composite
    # value and fail at runtime. No Spark external type carries them, so
    # degrade to string (the reference backends degrade unknown types to
    # text the same way).
    ("interval", T.StringType()),
    ("int4range", T.StringType()),
    ("int8range", T.StringType()),
    ("int4multirange", T.StringType()),
    ("int8multirange", T.StringType()),
    ("int2vector", T.StringType()),
    ("int", T.LongType()),
    # non-int-prefixed range types, same degradation
    ("numrange", T.StringType()),
    ("nummultirange", T.StringType()),
    ("tsrange", T.StringType()),
    ("tstzrange", T.StringType()),
    ("tsmultirange", T.StringType()),
    ("tstzmultirange", T.StringType()),
    ("daterange", T.StringType()),
    ("datemultirange", T.StringType()),
    ("numeric", T.DecimalType(38, 18)),
    ("decimal", T.DecimalType(38, 18)),
    ("double", T.DoubleType()),
    ("real", T.FloatType()),
    ("float", T.DoubleType()),
    ("timestamp", T.TimestampType()),
    ("date", T.DateType()),
    ("time ", T.StringType()),  # time-of-day: no Spark type; keep string
    ("time", T.StringType()),
    ("uuid", T.StringType()),
    ("jsonb", T.StringType()),
    ("json", T.StringType()),
    ("character", T.StringType()),
    ("varchar", T.StringType()),
    ("text", T.StringType()),
    ("year", T.StringType()),
    ("bytea", T.BinaryType()),
]

# compat mode: reproduce the reference's degradations bit-for-bit
# (numeric → Float64/DOUBLE, duckdb_backend.py:54-55; date → DateTime,
# clickhouse_backend.py:58-61).
_COMPAT_OVERRIDES: dict[str, T.DataType] = {
    "numeric": T.DoubleType(),
    "decimal": T.DoubleType(),
    "real": T.DoubleType(),
    "date": T.TimestampType(),
    "smallint": T.IntegerType(),
}


def _declared_decimal(precision: int, scale: int) -> T.DecimalType | None:
    """DecimalType for a DECLARED numeric(p,s), or None when the
    declaration can't be honored by Spark: p must be 1..38, s in 0..p
    (pg allows negative scale and p>38; those fall back to the
    unconstrained default rather than producing an invalid type)."""
    if 1 <= precision <= 38 and 0 <= scale <= precision:
        return T.DecimalType(precision, scale)
    return None


def pg_type_to_spark(pg_type: str, compat: bool = False) -> T.DataType:
    """Translate a Postgres type name (as printed by `\\d`) to a Spark type.

    Enums (`*_enum`, or any unrecognized user type) and arrays degrade per
    the rules above; `<type>[]` maps to ArrayType(element) unless compat.
    """
    s = pg_type.strip().lower()
    if s.endswith("[]"):
        if compat:
            return T.StringType()  # reference: arrays → String (ch:79-86)
        return T.ArrayType(pg_type_to_spark(s[:-2], compat=compat))
    if s.endswith("_enum") or s.startswith("enum"):
        return T.StringType()
    # A declared numeric(p,s) keeps its exact precision/scale (the
    # fallback Decimal(38,18) is only for UNCONSTRAINED numeric; forcing
    # it on numeric(24,20) would truncate fractional digits).
    if not compat:
        m = re.match(r"(?:numeric|decimal)\s*\((\d+)(?:\s*,\s*(-?\d+))?\)$", s)
        if m:
            dt = _declared_decimal(int(m.group(1)), int(m.group(2) or 0))
            if dt is not None:
                return dt
    # strip modifiers: "character varying(255)" → "character varying"
    s = re.sub(r"\(.*\)", "", s).strip()
    if compat:
        for prefix, dtype in _COMPAT_OVERRIDES.items():
            if s.startswith(prefix):
                return dtype
    for prefix, dtype in _RULES:
        if s.startswith(prefix):
            return dtype
    # Unknown type: warn-and-string, like all three reference backends
    # (ch:76-77, sf:99-100, duck:60-61).
    return T.StringType()


def schema_from_pg_columns(
    columns: dict[str, str],
    primary_key_cols: list[str] | None = None,
    compat: bool = False,
) -> T.StructType:
    """Build a StructType from {column: pg_type}; PK columns are non-null
    (the reference keeps PK columns out of Nullable(...), ch:145-147)."""
    pks = set(primary_key_cols or [])
    return T.StructType(
        [
            T.StructField(
                sanitize_column_name(name),
                pg_type_to_spark(pg_type, compat=compat),
                nullable=name not in pks,
            )
            for name, pg_type in columns.items()
        ]
    )


def sanitize_column_name(name: str) -> str:
    """Spaces → underscores, matching the reference's sanitization
    (clickhouse_backend.py:118-119, duckdb_backend.py:72-76)."""
    return name.strip().replace(" ", "_")


# Postgres reports INTERNAL type spellings over JDBC metadata
# (pg_type.typname: int4/int8/float8/bpchar/timestamptz, arrays as a
# leading underscore "_int4"), not the `\d` display names the reference
# scrapes (pgwarehouse.py:305-335). Normalize the JDBC spelling to the
# display name so ONE rule table (`_RULES`) serves both discovery paths.
_PG_JDBC_NAMES: dict[str, str] = {
    "int2": "smallint",
    "int4": "integer",
    "int8": "bigint",
    "serial2": "serial",
    "serial4": "serial",
    "serial8": "bigserial",
    "float4": "real",
    "float8": "double precision",
    "bool": "boolean",
    "bpchar": "character",
    "timestamptz": "timestamp with time zone",
    "timetz": "time with time zone",
}


def pg_jdbc_type_name_to_pg(type_name: str) -> str:
    """Normalize a Postgres JDBC ``TYPE_NAME`` to its `\\d` display name
    (``_int4`` → ``integer[]``, ``float8`` → ``double precision``)."""
    s = type_name.strip().lower()
    suffix = ""
    if s.startswith("_"):  # pg internal array spelling
        s, suffix = s[1:], "[]"
    elif s.endswith("[]"):  # some drivers report the display spelling
        s, suffix = s[:-2], "[]"
    return _PG_JDBC_NAMES.get(s, s) + suffix


def jdbc_type_to_spark(
    type_name: str,
    jdbc_code: int | None = None,
    compat: bool = False,
    precision: int | None = None,
    scale: int | None = None,
) -> T.DataType:
    """Translate a JDBC ``DatabaseMetaData.getColumns`` row to a Spark
    type. ``TYPE_NAME`` (normalized from pg internal spellings) drives
    the mapping so pg-specific types Spark's generic JDBC path degrades
    (uuid, enums, arrays → java.sql.Types.OTHER/ARRAY) resolve exactly
    like the reference's `\\d`-scrape path (SURVEY §1.3). ``jdbc_code``
    2003 (ARRAY) forces array treatment when a driver reports a bare
    element name for an array column. For NUMERIC/DECIMAL codes (2, 3),
    ``precision``/``scale`` (COLUMN_SIZE/DECIMAL_DIGITS) carry the
    DECLARED numeric(p,s): honoring them beats the Decimal(38,18)
    fallback, which truncates scale>18 and overflows >20 integer
    digits. Unconstrained pg numeric reports precision 0 → fallback."""
    name = pg_jdbc_type_name_to_pg(type_name)
    if jdbc_code == 2003 and not name.endswith("[]"):  # java.sql.Types.ARRAY
        name += "[]"
    if not compat and jdbc_code in (2, 3) and precision:
        dt = _declared_decimal(precision, scale or 0)
        if dt is not None:
            return dt
    return pg_type_to_spark(name, compat=compat)
