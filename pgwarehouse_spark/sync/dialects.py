"""Warehouse-specific DDL semantics for the JDBC sink.

The reference encodes per-backend quirks the generic JDBC writer can't
express:

- Snowflake quotes reserved column names (snowflake_backend.py:111-115,
  RESERVED_COL_NAMES at :21) and translates pg types per backend;
- ClickHouse wraps non-PK columns in ``Nullable(...)``
  (clickhouse_backend.py:145-147) and picks the table engine from the
  PK: ``MergeTree() ORDER BY (pk)`` with keys, ``StripeLog`` without
  (clickhouse_backend.py:148-153).

Spark's ``createTableColumnTypes`` option only accepts *Spark SQL*
types (it is parsed by Spark, then run through the JVM JdbcDialect), so
warehouse-native spellings like ``Nullable(Int64)`` or an ``ENGINE``
clause cannot ride through the built-in writer's CREATE TABLE. The
dialects below therefore emit the full CREATE TABLE statement
themselves — exactly what the reference backends do — and the sink runs
it over a raw JDBC connection before appending rows through the normal
parallel Spark writer. DDL is one driver-side statement; the data path
stays distributed.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import types as T

_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

# Reference list, snowflake_backend.py:21 — kept identical so emitted
# DDL matches the reference's for the same schema.
SNOWFLAKE_RESERVED = frozenset(
    ["current_date", "order", "to", "from", "values", "start", "current"]
)

# Conservative shared core of ANSI reserved words for the generic
# dialect (enough to make CREATE TABLE parse on mainstream warehouses).
GENERIC_RESERVED = frozenset(
    """all and any as asc between by case cast check column create cross
    current current_date current_time current_timestamp default delete
    desc distinct drop else end exists for foreign from full group
    having in inner insert into is join left like limit not null on or
    order outer primary references right select set start table then to
    union unique update user using values when where with""".split()
)


def _decimal(dt: T.DecimalType, fmt: str) -> str:
    return fmt.format(p=dt.precision, s=dt.scale)


@dataclass(frozen=True)
class SinkDialect:
    """DDL emission policy for one warehouse family.

    ``type_map`` keys are Spark ``simpleString`` roots (``string``,
    ``bigint``, ...); unlisted types fall back to ``fallback_type`` —
    the reference does the same (unknown pg types → ``String`` /
    ``text``, snowflake_backend.py:100, clickhouse_backend.py:119).
    """

    name: str = "generic"
    quote_char: str = '"'
    reserved: frozenset = GENERIC_RESERVED
    type_map: dict = field(
        default_factory=lambda: {
            "string": "VARCHAR(4000)",
            "boolean": "BOOLEAN",
            "tinyint": "SMALLINT",
            "smallint": "SMALLINT",
            "int": "INTEGER",
            "bigint": "BIGINT",
            "float": "REAL",
            "double": "DOUBLE",
            "date": "DATE",
            "timestamp": "TIMESTAMP",
            "timestamp_ntz": "TIMESTAMP",
        }
    )
    fallback_type: str = "VARCHAR(4000)"
    decimal_fmt: str = "DECIMAL({p},{s})"
    # ClickHouse semantics: non-key columns nullable-wrapped, engine
    # clause derived from the PK.
    wrap_nullable: bool = False
    array_fmt: str | None = None  # e.g. "Array({t})"; None → fallback

    # -- identifiers ---------------------------------------------------
    def quote_ident(self, name: str) -> str:
        """Quote when the name is reserved or not a plain identifier
        (reference: snowflake_backend.py:111-115 quotes reserved names;
        clickhouse_backend.py:118-119 sanitizes spaces)."""
        q = self.quote_char
        if name.lower() in self.reserved or not _IDENT_RE.match(name):
            return f"{q}{name.replace(q, q + q)}{q}"
        return name

    # -- types ---------------------------------------------------------
    def ddl_type(self, dt: T.DataType) -> str:
        if isinstance(dt, T.DecimalType):
            return _decimal(dt, self.decimal_fmt)
        if isinstance(dt, T.ArrayType) and self.array_fmt:
            return self.array_fmt.format(t=self.ddl_type(dt.elementType))
        return self.type_map.get(dt.simpleString(), self.fallback_type)

    def column_ddl(self, f: T.StructField, pk: list[str]) -> str:
        t = self.ddl_type(f.dataType)
        if self.wrap_nullable:
            # clickhouse_backend.py:145-147: every non-PK column is
            # Nullable(...) — PK columns stay bare (MergeTree keys
            # cannot be nullable).
            if f.name not in pk:
                t = f"Nullable({t})"
        elif not f.nullable:
            t = f"{t} NOT NULL"
        return f"{self.quote_ident(f.name)} {t}"

    # -- statements ----------------------------------------------------
    def engine_clause(self, pk: list[str]) -> str:
        return ""

    def create_table_sql(
        self, table: str, schema: T.StructType, pk: list[str] | None = None
    ) -> str:
        pk = pk or []
        cols = ", ".join(self.column_ddl(f, pk) for f in schema.fields)
        stmt = f"CREATE TABLE {self.quote_ident(table)} ({cols})"
        engine = self.engine_clause(pk)
        return f"{stmt} {engine}".rstrip()

    def drop_table_sql(self, table: str) -> str:
        return f"DROP TABLE {self.quote_ident(table)}"


@dataclass(frozen=True)
class SnowflakeDialect(SinkDialect):
    """snowflake_backend.py semantics: reserved-word quoting (:111-115)
    with the reference's exact reserved list (:21)."""

    name: str = "snowflake"
    reserved: frozenset = SNOWFLAKE_RESERVED
    type_map: dict = field(
        default_factory=lambda: {
            "string": "VARCHAR",
            "boolean": "BOOLEAN",
            "tinyint": "NUMBER(3,0)",
            "smallint": "NUMBER(5,0)",
            "int": "NUMBER(10,0)",
            "bigint": "NUMBER(19,0)",
            "float": "FLOAT",
            "double": "DOUBLE",
            "date": "DATE",
            "timestamp": "TIMESTAMP_NTZ",
            "timestamp_ntz": "TIMESTAMP_NTZ",
            "binary": "BINARY",
        }
    )
    fallback_type: str = "VARCHAR"
    decimal_fmt: str = "NUMBER({p},{s})"


@dataclass(frozen=True)
class ClickHouseDialect(SinkDialect):
    """clickhouse_backend.py semantics: Nullable wrap for non-PK columns
    (:145-147), MergeTree-ordered-by-PK vs StripeLog engine (:148-153),
    backtick quoting."""

    name: str = "clickhouse"
    quote_char: str = "`"
    reserved: frozenset = GENERIC_RESERVED
    type_map: dict = field(
        default_factory=lambda: {
            "string": "String",
            "boolean": "Bool",
            "tinyint": "Int8",
            "smallint": "Int16",
            "int": "Int32",
            "bigint": "Int64",
            "float": "Float32",
            "double": "Float64",
            "date": "Date32",
            "timestamp": "DateTime64(6)",
            "timestamp_ntz": "DateTime64(6)",
            "binary": "String",
        }
    )
    fallback_type: str = "String"
    decimal_fmt: str = "Decimal({p},{s})"
    wrap_nullable: bool = True
    array_fmt: str | None = "Array({t})"

    def engine_clause(self, pk: list[str]) -> str:
        if pk:
            order_cols = ", ".join(self.quote_ident(c) for c in pk)
            return f"ENGINE = MergeTree() ORDER BY ({order_cols})"
        return "ENGINE = StripeLog"


@dataclass(frozen=True)
class DuckDBDialect(SinkDialect):
    """duckdb_backend.py target: ANSI types, '"' quoting."""

    name: str = "duckdb"
    type_map: dict = field(
        default_factory=lambda: {
            "string": "VARCHAR",
            "boolean": "BOOLEAN",
            "tinyint": "TINYINT",
            "smallint": "SMALLINT",
            "int": "INTEGER",
            "bigint": "BIGINT",
            "float": "REAL",
            "double": "DOUBLE",
            "date": "DATE",
            "timestamp": "TIMESTAMP",
            "timestamp_ntz": "TIMESTAMP",
            "binary": "BLOB",
        }
    )
    fallback_type: str = "VARCHAR"


_DIALECTS: dict[str, SinkDialect] = {
    d.name: d
    for d in (
        SinkDialect(),
        SnowflakeDialect(),
        ClickHouseDialect(),
        DuckDBDialect(),
    )
}


def dialect_for(name: str | SinkDialect | None) -> SinkDialect | None:
    if name is None or isinstance(name, SinkDialect):
        return name
    try:
        return _DIALECTS[name.lower()]
    except KeyError:
        raise ValueError(
            f"unknown sink dialect {name!r}; known: {sorted(_DIALECTS)}"
        ) from None
