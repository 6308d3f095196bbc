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


# ---------------------------------------------------------------------------
# Reference-compat DDL (golden parity; VERDICT r02 item 3)
# ---------------------------------------------------------------------------
#
# The dialects above emit DDL from SPARK schemas with this engine's own
# (tighter) type choices. For byte-parity migration audits we also emit
# exactly what the reference backends would CREATE for a given *Postgres*
# schema — including their lossy type degradations and quoting quirks:
#
# - clickhouse_backend.py:48-86 type chain, :118-119 space→underscore,
#   :143-153 Nullable wrap + MergeTree/StripeLog engine;
# - snowflake_backend.py:78-109 type chain, :111-115 reserved-only
#   quoting (NOTE: the reference does NOT handle space-bearing columns
#   for Snowflake — `"park state"` emits unquoted, which its own
#   fixture local_parks would trip on; reproduced faithfully here, the
#   non-compat SnowflakeDialect above quotes properly);
# - duckdb_backend.py:33-67 type chain, :72-76 space→underscore +
#   per-column PRIMARY KEY suffix.
#
# Prefix rules are ORDER-SENSITIVE, mirroring each backend's if-chain.

_REF_CH_RULES = [
    ("boolean", "Bool"), ("character", "String"), ("jsonb", "String"),
    ("time ", "String"), ("date", "DateTime"),
    ("timestamp", "DateTime64(3)"), ("int", "Int64"), ("bigint", "Int64"),
    ("smallint", "Int32"), ("numeric", "Float64"), ("real", "Float64"),
    ("double", "Float64"),
]
_REF_SF_RULES = [
    ("boolean", "BOOLEAN"), ("character", "STRING"), ("jsonb", "STRING"),
    ("time ", "TIME"), ("date", "DATETIME"), ("timestamp", "TIMESTAMP"),
    ("int", "BIGINT"), ("bigint", "BIGINT"), ("smallint", "SMALLINT"),
    ("numeric", "NUMERIC"), ("real", "NUMERIC"), ("double", "NUMERIC"),
]
_REF_DUCK_RULES = [
    ("boolean", "BOOLEAN"), ("character", "VARCHAR"), ("jsonb", "VARCHAR"),
    ("time ", "TIMESTAMP"), ("date", "TIMESTAMP"), ("timestamp", "TIMESTAMP"),
    ("int", "BIGINT"), ("bigint", "BIGINT"), ("smallint", "INTEGER"),
    ("numeric", "DOUBLE"), ("real", "DOUBLE"), ("double", "DOUBLE"),
]
# exact-match / fallback quirks per backend (ref keeps inconsistent
# casing for some fallbacks — preserved verbatim)
_REF_EXACT = {
    "clickhouse": {"text": "String", "year": "String", "uuid": "String"},
    "snowflake": {"text": "STRING", "year": "String"},
    "duckdb": {"text": "VARCHAR", "year": "VARCHAR", "uuid": "UUID"},
}
_REF_ENUM = {"clickhouse": "String", "snowflake": "STRING", "duckdb": "String"}
_REF_ARRAY = {"clickhouse": "String", "snowflake": "String", "duckdb": "VARCHAR"}
_REF_FALLBACK = {"clickhouse": "String", "snowflake": "String", "duckdb": "VARCHAR"}
_REF_RULES = {
    "clickhouse": _REF_CH_RULES,
    "snowflake": _REF_SF_RULES,
    "duckdb": _REF_DUCK_RULES,
}


def reference_pg_type(backend: str, pg_type: str, for_parse: bool = False) -> str:
    """The type string the named reference backend would emit for a
    Postgres type. ``for_parse`` is ClickHouse's CSV-ingest variant
    (clickhouse_backend.py:58-64): date/timestamp columns read as
    String so ``parseDateTimeBestEffortOrNull`` can repair them in the
    INSERT's SELECT."""
    s = pg_type.strip().lower()
    if s.endswith("[]"):
        return _REF_ARRAY[backend]
    if s.endswith("_enum"):
        return _REF_ENUM[backend]
    if (
        for_parse
        and backend == "clickhouse"
        and (s.startswith("date") or s.startswith("timestamp"))
    ):
        return "String"
    exact = _REF_EXACT[backend]
    if s in exact:
        return exact[s]
    for prefix, out in _REF_RULES[backend]:
        if s.startswith(prefix):
            return out
    return _REF_FALLBACK[backend]


def reference_create_table_sql(
    backend: str,
    table: str,
    columns: dict[str, str],
    primary_key_cols: list[str] | None = None,
    sf_schema: str = "PUBLIC",
) -> str:
    """Byte-identical CREATE TABLE to what the reference backend's
    load_table would execute for this (pg-typed) schema — the golden
    the parity tests pin (clickhouse_backend.py:143-159,
    snowflake_backend.py:132-134, duckdb_backend.py:89-97)."""
    pk = primary_key_cols or []
    if backend == "clickhouse":
        cols = []
        for name, ctype in columns.items():
            t = reference_pg_type(backend, ctype)
            if name not in pk:
                t = f"Nullable({t})"
            cols.append(f"{name.replace(' ', '_')} {t}")
        if pk:
            engine = f"ENGINE = MergeTree() ORDER BY ({', '.join(pk)})"
        else:
            engine = "ENGINE = StripeLog"
        return (
            f"CREATE TABLE IF NOT EXISTS {table} ({', '.join(cols)}) {engine};"
        )
    if backend == "snowflake":
        cols = []
        for name, ctype in columns.items():
            q = f'"{name}"' if name.lower() in SNOWFLAKE_RESERVED else name
            cols.append(f"{q} {reference_pg_type(backend, ctype)}")
        return (
            f"CREATE TABLE IF NOT EXISTS {sf_schema}.{table} "
            f"({', '.join(cols)});"
        )
    if backend == "duckdb":
        cols = []
        for name, ctype in columns.items():
            c = f"{name.replace(' ', '_')} {reference_pg_type(backend, ctype)}"
            if name in pk:
                c += " PRIMARY KEY"
            cols.append(c)
        return f"CREATE TABLE IF NOT EXISTS {table} ({', '.join(cols)});"
    raise ValueError(f"unknown reference backend {backend!r}")


def _sf_quote(name: str) -> str:
    """snowflake_backend.quote_col (:111-115): quote reserved names only."""
    return f'"{name}"' if name.lower() in SNOWFLAKE_RESERVED else name


def reference_snowflake_merge_sql(
    table: str,
    columns: dict[str, str],
    primary_key_cols: list[str],
    csv_name: str,
    csv_path: str | None = None,
    database: str = "PGWAREHOUSE",
    sf_schema: str = "PUBLIC",
) -> list[str]:
    """The statement SEQUENCE the reference's Snowflake backend executes
    per staged CSV chunk during an upsert (snowflake_backend.py:161-211):
    USE SCHEMA → PUT into the table stage → CREATE FILE FORMAT →
    MERGE ON the (single) PK with UPDATE SET / INSERT branches →
    REMOVE the staged file. Whitespace-normalized (the reference uses
    indented triple-quoted SQL); the golden tests compare these token
    streams. The MERGE keys on ``primary_key_cols[0]`` only — the
    reference ignores the rest of a composite key (:174), one of the
    behaviors the Spark-side merge fixes."""
    cols = list(columns)
    column_list = ", ".join(_sf_quote(c) for c in cols)
    update_sets = ", ".join(
        f"{table}.{_sf_quote(c)} = csvsrc.{_sf_quote(c)}" for c in cols
    )
    values_list = ", ".join(f"csvsrc.{_sf_quote(c)}" for c in cols)
    key = primary_key_cols[0]
    path = csv_path or csv_name
    return [
        f"USE SCHEMA {sf_schema}",
        f"PUT file://{path} @{database}.{sf_schema}.%{table};",
        "CREATE OR REPLACE FILE FORMAT pgw_csv_format TYPE = 'csv' "
        "SKIP_HEADER = 1 FIELD_OPTIONALLY_ENCLOSED_BY = '0x22' "
        "ESCAPE_UNENCLOSED_FIELD = NONE",
        f"MERGE INTO {database}.{sf_schema}.{table} USING "
        f"(SELECT {column_list} FROM @%{table}(FILE_FORMAT => "
        f"'pgw_csv_format', PATTERN => '{csv_name}')) csvsrc "
        f"ON csvsrc.{key} = {table}.{key} "
        f"WHEN MATCHED THEN UPDATE SET {update_sets} "
        f"WHEN NOT MATCHED THEN INSERT ({column_list}) VALUES ({values_list})",
        f"REMOVE @%{table} PATTERN = '{csv_name}'",
    ]


def reference_snowflake_load_sql(
    table: str,
    csv_name: str,
    csv_path: str | None = None,
    database: str = "PGWAREHOUSE",
    sf_schema: str = "PUBLIC",
) -> list[str]:
    """The statement SEQUENCE the reference's Snowflake backend executes
    per staged CSV chunk during an initial/full LOAD
    (snowflake_backend.py:148-157): USE SCHEMA → PUT into the table
    stage → COPY INTO from the staged file with an inline FILE_FORMAT,
    ON_ERROR=CONTINUE FORCE=TRUE and PURGE=TRUE (so no separate REMOVE).
    Whitespace-normalized like the merge generator. This is the keyless
    path — loads never merge; the reference reserves MERGE for
    merge_table."""
    path = csv_path or csv_name
    return [
        f"USE SCHEMA {sf_schema}",
        f"PUT file://{path} @{database}.{sf_schema}.%{table};",
        f"COPY INTO {database}.{sf_schema}.{table} FROM "
        f"@{database}.{sf_schema}.%{table}/{csv_name} "
        "FILE_FORMAT = (type = csv field_optionally_enclosed_by='\\\"' "
        "SKIP_HEADER=1) ON_ERROR=CONTINUE FORCE=TRUE PURGE = TRUE",
    ]


def reference_clickhouse_upsert_sql(
    table: str,
    columns: dict[str, str],
    primary_key_cols: list[str],
) -> list[str]:
    """The statement SEQUENCE the reference's ClickHouse backend
    executes for a last-modified upsert (clickhouse_backend.py:245-270):
    ClickHouse has no MERGE, so it stages the delta into a
    ``<table>__changes`` temp table (full load_table path :141-171,
    dates ingested as String and repaired by
    ``parseDateTimeBestEffortOrNull``), then ALTER DELETE the matching
    PKs from the target, INSERT the delta, DROP the temp. This is the
    delete-then-insert upsert (A16) whose Spark equivalent is the
    left-anti + union in sync/merge.py:61. Single-statement-per-chunk
    INSERT is collapsed to one entry (the per-chunk loop repeats it)."""
    if not primary_key_cols:
        raise ValueError("No primary key for the table found, have to reload")
    temp = f"{table}__changes"
    pk = primary_key_cols[0]
    import_structure = ", ".join(
        f"{name.replace(' ', '_')} "
        f"{reference_pg_type('clickhouse', ctype, for_parse=True)}"
        for name, ctype in columns.items()
    )
    select_cols = [
        (
            f"parseDateTimeBestEffortOrNull({name.replace(' ', '_')})"
            if (ctype.startswith("date") or ctype.startswith("time"))
            else name.replace(" ", "_")
        )
        for name, ctype in columns.items()
    ]
    return [
        f"DROP TABLE IF EXISTS {temp}",
        reference_create_table_sql(
            "clickhouse", temp, columns, primary_key_cols
        ),
        f"INSERT INTO {temp} SELECT {', '.join(select_cols)} "
        f"FROM input('{import_structure}') FORMAT CSVWithNames "
        "SETTINGS date_time_input_format='best_effort';",
        f"ALTER TABLE {table} DELETE WHERE {pk} IN "
        f"(SELECT {pk} from {temp});",
        f"INSERT INTO {table} SELECT * FROM {temp};",
        f"DROP TABLE {temp}",
    ]


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
