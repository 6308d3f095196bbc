"""The sync engine: extract → (stage) → load with three incremental
strategies, rebuilt Spark-first (reference operators A1-A31, SURVEY §2-A).

Reference dataflow (pgwarehouse.py): psql \\copy → gzip CSV chunks →
per-backend bulk load, with watermark SQL against the warehouse. Here
each piece is a DataFrame expression:

- extract  = source read with the watermark predicate *pushed into the
  scan* (JDBC `query` pushdown / parquet PushedFilters) — A1 + A12
- load     = parquet/bucketed write (create/append/overwrite) — A7/A8/A10/A14
- watermark = one `agg(max(...))` on the target — A11
- zero-delta short-circuit — A13
- upsert   = bucket-pruned merge (sync/merge.py) — A15-A17
- sync     = dispatcher with skip/scheduled-reload support — A25 (+ the
  documented-but-unimplemented options from README.md:190-215)

Strategy selection matches the reference (pgwarehouse.py:180-189):
`reload` if configured, else upsert when a last_modified column exists,
else PK append; tables with no PK are reload-only (README.md:175-177).
"""

from __future__ import annotations

import logging
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import Config, TableSpec
from .merge import BUCKET_COL, bucket_expr, merge_into_bucketed, write_bucketed

DEFAULT_BUCKETS = 16

log = logging.getLogger(__name__)


@dataclass
class SyncResult:
    table: str
    action: str  # created | appended | merged | reloaded | noop | skipped
    rows: int


def jvm_jdbc_connection(
    spark: SparkSession,
    url: str,
    driver: str | None = None,
    user: str | None = None,
    password: str | None = None,
):
    """Raw java.sql.Connection through the Spark JVM gateway — the
    standard JDBC DatabaseMetaData/DDL route (works for every driver on
    Spark's classpath; no SQL dialect differences to paper over, unlike
    information_schema which e.g. Derby lacks). Shared by JdbcSource
    metadata discovery and JdbcWarehouse DDL execution so driver
    loading and credential wiring can't drift apart."""
    jvm = spark._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)
    props = jvm.java.util.Properties()
    if user:
        props.setProperty("user", user)
    if password:
        props.setProperty("password", password)
    return jvm.java.sql.DriverManager.getConnection(url, props)


class Source:
    """Source adapter: returns a DataFrame, pushing `where` into the scan."""

    def read(self, spark: SparkSession, table: str, where: str | None = None) -> DataFrame:
        raise NotImplementedError

    def exists(self, spark: SparkSession, table: str) -> bool:
        raise NotImplementedError

    def discover_primary_key(self, spark: SparkSession, table: str) -> list[str]:
        """Key metadata the source can surface (reference parity: `psql
        \\d` PK scrape, pgwarehouse.py:330-333 — its configs never
        declare a PK). File sources carry no constraints → []."""
        return []

    def discover_watermark(self, spark: SparkSession, table: str) -> str | None:
        """Best-effort watermark column (a date/timestamp column with a
        conventional change-tracking name). File sources → None."""
        return None


class ParquetSource(Source):
    def __init__(self, path: str):
        self.path = path

    def _file(self, table: str) -> str:
        direct = os.path.join(self.path, f"{table}.parquet")
        return direct if os.path.exists(direct) else os.path.join(self.path, table)

    def read(self, spark: SparkSession, table: str, where: str | None = None) -> DataFrame:
        from ..sources.tables import load_table

        if os.path.isdir(self.path) and os.path.exists(
            os.path.join(self.path, f"{table}.parquet")
        ):
            df = load_table(spark, self.path, table)
        else:
            df = spark.read.parquet(self._file(table))
        # Catalyst pushes this predicate to the parquet scan (row-group
        # pruning via min/max stats) — the analogue of the reference
        # embedding its filter in `psql \copy (select … where …)`.
        return df.filter(where) if where else df

    def exists(self, spark: SparkSession, table: str) -> bool:
        return os.path.exists(self._file(table))


class CsvSource(Source):
    """CSV (optionally gzipped) staging directories — the reference's
    interchange format (`<data_dir>/<table>_data/*.csv.gz`,
    pgwarehouse.py:265-267). Schema-on-read with explicit schema when
    provided (never inferSchema in production paths)."""

    def __init__(self, path: str, schemas: dict[str, str] | None = None):
        self.path = path
        self.schemas = schemas or {}

    def _dir(self, table: str) -> str:
        d = os.path.join(self.path, f"{table}_data")
        return d if os.path.exists(d) else os.path.join(self.path, table)

    def read(self, spark: SparkSession, table: str, where: str | None = None) -> DataFrame:
        reader = spark.read.option("header", "true")
        schema = self.schemas.get(table)
        if schema:
            reader = reader.schema(schema)
        else:
            reader = reader.option("inferSchema", "true")
        df = reader.csv(self._dir(table))
        return df.filter(where) if where else df

    def exists(self, spark: SparkSession, table: str) -> bool:
        return os.path.exists(self._dir(table))


class JsonSource(Source):
    """Line-delimited JSON directories/files (``<path>/<table>.json[l]`` or
    ``<path>/<table>/``). Schema-on-read with an explicit schema when
    provided — inference requires an extra full pass over the data, which
    at lake scale doubles the scan cost, so production configs should
    always pin schemas."""

    def __init__(self, path: str, schemas: dict[str, str] | None = None):
        self.path = path
        self.schemas = schemas or {}

    def _loc(self, table: str) -> str:
        for suffix in (f"{table}.jsonl", f"{table}.json", table):
            cand = os.path.join(self.path, suffix)
            if os.path.exists(cand):
                return cand
        return os.path.join(self.path, table)

    def read(self, spark: SparkSession, table: str, where: str | None = None) -> DataFrame:
        reader = spark.read
        schema = self.schemas.get(table)
        if schema:
            reader = reader.schema(schema)
        df = reader.json(self._loc(table))
        return df.filter(where) if where else df

    def exists(self, spark: SparkSession, table: str) -> bool:
        return os.path.exists(self._loc(table))


class OrcSource(Source):
    """ORC files/directories — same columnar pushdown story as parquet
    (predicate pushdown + column pruning reach the ORC reader)."""

    def __init__(self, path: str):
        self.path = path

    def _loc(self, table: str) -> str:
        direct = os.path.join(self.path, f"{table}.orc")
        return direct if os.path.exists(direct) else os.path.join(self.path, table)

    def read(self, spark: SparkSession, table: str, where: str | None = None) -> DataFrame:
        df = spark.read.orc(self._loc(table))
        return df.filter(where) if where else df

    def exists(self, spark: SparkSession, table: str) -> bool:
        return os.path.exists(self._loc(table))


class BinaryFileSource(Source):
    """Raw media/file ingest via Spark's built-in ``binaryFile`` format:
    each file under ``<path>/<table>/`` becomes one row of
    (path, modificationTime, length, content binary) — the lake-ingest
    step that turns an object-store prefix of images/audio/documents
    into a multimodal table the mapInPandas decode pipeline
    (operators/multimodal.py) consumes directly.

    Scale: listing is distributed (InMemoryFileIndex), each file is read
    by the executor that owns the split, and
    ``spark.sql.files.maxPartitionBytes`` packs many small media files
    into one task — the small-files problem is handled by the packer,
    not by a driver-side loop. `pathGlobFilter` narrows by extension
    BEFORE content is fetched; the `where` predicate (e.g. on `length`
    or `path`) prunes on listing metadata without touching bytes."""

    def __init__(self, path: str, glob: str | None = None):
        self.path = path
        self.glob = glob

    def _dir(self, table: str) -> str:
        return os.path.join(self.path, table)

    def read(self, spark: SparkSession, table: str, where: str | None = None) -> DataFrame:
        reader = spark.read.format("binaryFile")
        if self.glob:
            reader = reader.option("pathGlobFilter", self.glob)
        df = reader.load(self._dir(table))
        return df.filter(where) if where else df

    def exists(self, spark: SparkSession, table: str) -> bool:
        return os.path.isdir(self._dir(table))


def quote_source_ident(name: str, url: str = "") -> str:
    """Quote a (possibly schema-qualified) SOURCE identifier for
    interpolation into a pushed-down JDBC query. Mixed-case,
    space-bearing, or reserved-word table names (the reference's
    `local_parks` fixture exercises this class, pg_setup.sql) break an
    unquoted `SELECT * FROM {table}`; plain lower/upper-case names stay
    unquoted so backend case-folding keeps working. MySQL-family URLs
    get backticks; everything else ANSI double quotes. Already-quoted
    spellings pass through verbatim."""
    import re as _re

    from .dialects import GENERIC_RESERVED

    q = "`" if _re.match(r"jdbc:(mysql|mariadb):", url or "") else '"'
    # split on dots OUTSIDE quoted spans: myschema."my.table" is two
    # parts, not three (a naive split would re-quote the fragments and
    # emit a broken query). Doubled escape quotes toggle twice — inert.
    parts, cur, in_quote = [], [], False
    for ch in name:
        if ch == q:
            in_quote = not in_quote
            cur.append(ch)
        elif ch == "." and not in_quote:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    out = []
    for part in parts:
        if part.startswith(q) and part.endswith(q) and len(part) >= 2:
            out.append(part)  # caller already quoted
        elif (
            _re.fullmatch(r"[a-z_][a-z0-9_]*", part)
            or _re.fullmatch(r"[A-Z_][A-Z0-9_]*", part)
        ) and part.lower() not in GENERIC_RESERVED:
            out.append(part)  # safe: let the backend case-fold
        else:
            out.append(q + part.replace(q, q + q) + q)
    return ".".join(out)


class JdbcSource(Source):
    r"""Partitioned-parallel JDBC extract (reference A1, rebuilt as
    `spark.read.jdbc` with partitionColumn bounds so N executors each
    pull a key range — replacing the single `psql \copy` pipe).

    The watermark predicate is embedded in the pushed-down `query` —
    exactly the reference's `where pk > {max}` filter (A12) but executed
    by the source database before bytes ever move.
    """

    def __init__(
        self,
        url: str,
        user: str | None = None,
        password: str | None = None,
        num_partitions: int = 8,
        partition_columns: dict[str, str] | None = None,
        partition_bounds: dict[str, tuple] | None = None,
        fetchsize: int = 10_000,
        driver: str | None = None,
        type_fidelity: bool = False,
    ):
        self.url = url
        self.user = user
        self.password = password
        self.driver = driver
        self.num_partitions = num_partitions
        self.partition_columns = partition_columns or {}
        self.partition_bounds = dict(partition_bounds or {})
        self.fetchsize = fetchsize
        # pg_type_fidelity: read through the §1.3 type matrix (one
        # metadata probe per table, cached) instead of Spark's generic
        # JDBC inference — for Postgres sources whose uuid/enum/array
        # columns the generic path degrades to OTHER. Off by default:
        # non-pg backends (and pg users happy with Spark's dialect)
        # skip the extra metadata round-trip.
        self.type_fidelity = type_fidelity
        self._schema_cache: dict[str, object] = {}

    def jdbc_options(self, table: str, where: str | None = None) -> dict[str, str]:
        """Assemble the JDBC reader options (pure; unit-testable without a
        live database).

        Partitioned parallel extract requires (column, lower, upper)
        bounds; Spark splits [lower, upper] into numPartitions range
        predicates, one executor-side cursor each. Bounds come from
        config or from `resolve_bounds` (a min/max probe — the same
        watermark-style query the reference issues, A11)."""
        opts = {"url": self.url, "fetchsize": str(self.fetchsize)}
        if self.driver:
            opts["driver"] = self.driver
        if self.user:
            opts["user"] = self.user
        if self.password:
            opts["password"] = self.password
        pcol = self.partition_columns.get(table)
        bounds = self.partition_bounds.get(table)
        query = f"SELECT * FROM {quote_source_ident(table, self.url)}"
        if where:
            query += f" WHERE {where}"
        if pcol and bounds:
            # partitionColumn requires dbtable (not query) in Spark's
            # JDBC source; wrap the pushed-down query as a derived table.
            opts["dbtable"] = f"({query}) AS src"
            opts["partitionColumn"] = pcol
            opts["lowerBound"] = str(bounds[0])
            opts["upperBound"] = str(bounds[1])
            opts["numPartitions"] = str(self.num_partitions)
        else:
            opts["query"] = query
        return opts

    def resolve_bounds(self, spark: SparkSession, table: str) -> tuple | None:
        """Probe min/max of the partition column (one tiny aggregate on
        the source DB) and cache it for subsequent partitioned reads."""
        pcol = self.partition_columns.get(table)
        if not pcol:
            return None
        probe = {
            "url": self.url,
            "query": (
                f"SELECT MIN({quote_source_ident(pcol, self.url)}) AS lo, "
                f"MAX({quote_source_ident(pcol, self.url)}) AS hi "
                f"FROM {quote_source_ident(table, self.url)}"
            ),
        }
        if self.driver:
            probe["driver"] = self.driver
        if self.user:
            probe["user"] = self.user
        if self.password:
            probe["password"] = self.password
        # positional access: JDBC backends fold unquoted aliases to their
        # own case (Derby/Oracle uppercase LO/HI), so row.lo would miss
        row = spark.read.format("jdbc").options(**probe).load().collect()[0]
        if row[0] is None:
            return None
        self.partition_bounds[table] = (row[0], row[1])
        return self.partition_bounds[table]

    def custom_schema_ddl(self, spark: SparkSession, table: str) -> str | None:
        """``customSchema`` DDL from `discover_schema` (cached per
        table): '`col` TYPE, ...' in Spark SQL type syntax, overriding
        the generic JDBC inference with the §1.3 matrix types. Names are
        the RAW source spellings, backtick-quoted (escaped by doubling):
        Spark's getCustomSchema silently drops entries whose name
        matches no result column, so a sanitized/unquoted spelling would
        defeat the override for any column needing quoting."""
        if table not in self._schema_cache:
            # A metadata error (driver quirk, getColumns permission) must
            # not fail a read that generic inference would serve fine —
            # type fidelity degrades gracefully, it never blocks.
            try:
                self._schema_cache[table] = self.discover_schema(spark, table)
            except Exception as exc:  # noqa: BLE001 — any metadata failure
                log.warning(
                    "type-fidelity metadata discovery failed for %s "
                    "(falling back to generic JDBC inference): %s",
                    table,
                    exc,
                )
                self._schema_cache[table] = None
        schema = self._schema_cache[table]
        if schema is None:
            return None
        return ", ".join(
            "`{}` {}".format(f.name.replace("`", "``"), f.dataType.simpleString())
            for f in schema.fields
        )

    def read(self, spark: SparkSession, table: str, where: str | None = None) -> DataFrame:
        pcol = self.partition_columns.get(table)
        if pcol and table not in self.partition_bounds:
            self.resolve_bounds(spark, table)
        reader = spark.read.format("jdbc").options(
            **self.jdbc_options(table, where)
        )
        if self.type_fidelity:
            ddl = self.custom_schema_ddl(spark, table)
            if ddl:
                reader = reader.option("customSchema", ddl)
        return reader.load()

    def exists(self, spark: SparkSession, table: str) -> bool:
        try:
            self.read(spark, table).schema
            return True
        except Exception:
            return False

    # -- metadata discovery (reference parity: zero-config sync) -------
    def _jvm_connection(self, spark: SparkSession):
        return jvm_jdbc_connection(
            spark, self.url, self.driver, self.user, self.password
        )

    def _table_case_candidates(self, table: str) -> list[str]:
        # unquoted identifiers fold to the backend's preferred case
        # (Derby/Oracle upper, Postgres lower) — probe the spellings
        out = [table, table.upper(), table.lower()]
        return list(dict.fromkeys(out))

    def discover_primary_key(self, spark: SparkSession, table: str) -> list[str]:
        """`DatabaseMetaData.getPrimaryKeys`, ordered by KEY_SEQ — the
        JDBC-portable equivalent of the reference's `psql \\d` PK regex
        (pgwarehouse.py:330-333), so `sync <table>` needs no
        `primary_key:` stanza, matching reference configs that never
        declare one (tests/test_postgres.py:101-130)."""
        conn = self._jvm_connection(spark)
        try:
            meta = conn.getMetaData()
            for cand in self._table_case_candidates(table):
                rs = meta.getPrimaryKeys(None, None, cand)
                # keyed by (catalog, schema): a null schema filter matches
                # same-named tables in EVERY schema, and merging their PK
                # rows would fabricate a bogus composite key
                per_table: dict[tuple, list[tuple[int, str]]] = {}
                while rs.next():
                    key = (rs.getString("TABLE_CAT"), rs.getString("TABLE_SCHEM"))
                    per_table.setdefault(key, []).append(
                        (int(rs.getShort("KEY_SEQ")), rs.getString("COLUMN_NAME"))
                    )
                rs.close()
                if len(per_table) > 1:
                    return []  # ambiguous across schemas → safe fallback
                if per_table:
                    (cols,) = per_table.values()
                    return [c for _, c in sorted(cols)]
            return []
        finally:
            conn.close()

    def discover_schema(
        self, spark: SparkSession, table: str, compat: bool = False
    ):
        """StructType from ``DatabaseMetaData.getColumns`` via the §1.3
        type matrix (typemap.jdbc_type_to_spark) — the JDBC-portable
        equivalent of the reference's `\\d` column scrape
        (pgwarehouse.py:305-335). Postgres-specific types that Spark's
        generic JDBC reader degrades to OTHER (uuid, enums, interval)
        resolve here exactly like the reference's three backend mappers;
        the result feeds ``customSchema`` so a pg read round-trips the
        full SURVEY §1.3 matrix. PK columns (getPrimaryKeys) come back
        non-nullable, mirroring the reference's Nullable(...) exclusion
        (clickhouse_backend.py:145-147). Field names are the SOURCE
        names verbatim (this schema describes the source relation;
        sink-side sanitization happens at write). Like
        discover_primary_key, rows are grouped per (catalog, schema):
        a null schema filter matches same-named tables in EVERY schema,
        and merging their columns would fabricate a bogus hybrid
        StructType — ambiguity returns None (safe fallback to generic
        inference)."""
        from pyspark.sql import types as T

        from ..typemap import jdbc_type_to_spark

        pks = {c.lower() for c in self.discover_primary_key(spark, table)}
        conn = self._jvm_connection(spark)
        try:
            meta = conn.getMetaData()
            for cand in self._table_case_candidates(table):
                rs = meta.getColumns(None, None, cand, None)
                per_table: dict[tuple, list[tuple[int, T.StructField]]] = {}
                while rs.next():
                    key = (rs.getString("TABLE_CAT"), rs.getString("TABLE_SCHEM"))
                    name = rs.getString("COLUMN_NAME")
                    per_table.setdefault(key, []).append((
                        int(rs.getInt("ORDINAL_POSITION")),
                        T.StructField(
                            name,
                            jdbc_type_to_spark(
                                rs.getString("TYPE_NAME"),
                                int(rs.getInt("DATA_TYPE")),
                                compat=compat,
                                # declared numeric(p,s) — see typemap
                                precision=int(rs.getInt("COLUMN_SIZE")),
                                scale=int(rs.getInt("DECIMAL_DIGITS")),
                            ),
                            nullable=name.lower() not in pks,
                        ),
                    ))
                rs.close()
                if len(per_table) > 1:
                    return None  # ambiguous across schemas → safe fallback
                if per_table:
                    (cols,) = per_table.values()
                    return T.StructType(
                        [f for _, f in sorted(cols, key=lambda x: x[0])]
                    )
            return None
        finally:
            conn.close()

    # conventional change-tracking column names, checked in order
    WATERMARK_NAMES = (
        "last_modified",
        "last_updated",
        "updated_at",
        "modified_at",
        "updated_ts",
        "modified_ts",
    )
    _TEMPORAL_JDBC_TYPES = {91, 93, 2014}  # DATE, TIMESTAMP, TS_WITH_TZ

    def discover_watermark(self, spark: SparkSession, table: str) -> str | None:
        """A date/timestamp column with a conventional change-tracking
        name (DatabaseMetaData.getColumns). Name AND type must match —
        a varchar `updated_at` is not a watermark. The table-found
        signal is "getColumns returned ANY row" (not "has temporal
        columns"): a matched spelling with zero temporal columns must
        stop the probe rather than fall through to a DIFFERENT
        same-named-other-case table."""
        conn = self._jvm_connection(spark)
        try:
            meta = conn.getMetaData()
            for cand in self._table_case_candidates(table):
                rs = meta.getColumns(None, None, cand, None)
                found = False
                temporal: dict[str, str] = {}
                while rs.next():
                    found = True
                    name = rs.getString("COLUMN_NAME")
                    if int(rs.getInt("DATA_TYPE")) in self._TEMPORAL_JDBC_TYPES:
                        temporal[name.lower()] = name
                rs.close()
                if found:
                    for wm in self.WATERMARK_NAMES:
                        if wm in temporal:
                            return temporal[wm]
                    return None
            return None
        finally:
            conn.close()


def make_source(conf: dict) -> Source:
    kind = (conf.get("type") or "parquet").lower()
    if kind == "parquet":
        return ParquetSource(conf["path"])
    if kind == "csv":
        return CsvSource(conf["path"], conf.get("schemas"))
    if kind == "json":
        return JsonSource(conf["path"], conf.get("schemas"))
    if kind == "orc":
        return OrcSource(conf["path"])
    if kind == "binaryfile":
        return BinaryFileSource(conf["path"], conf.get("glob"))
    if kind == "jdbc":
        return JdbcSource(
            conf["url"],
            user=conf.get("user"),
            password=conf.get("password"),
            num_partitions=int(conf.get("num_partitions", 8)),
            partition_columns=conf.get("partition_columns"),
            driver=conf.get("driver"),
            type_fidelity=bool(conf.get("pg_type_fidelity", False)),
        )
    if kind in ("psql", "postgres"):
        # the reference's literal topology: psql \copy subprocess extract
        from .psql import PsqlCopySource

        return PsqlCopySource(
            conf.get("staging_dir") or conf.get("data_dir") or ".pgw_staging",
            host=conf.get("host") or os.environ.get("PGHOST"),
            port=conf.get("port") or os.environ.get("PGPORT"),
            user=conf.get("user") or os.environ.get("PGUSER"),
            dbname=conf.get("dbname") or os.environ.get("PGDATABASE"),
            password=conf.get("password"),
            pgschema=conf.get("pgschema", "public"),
        )
    raise ValueError(f"unknown source type: {kind}")


class SyncEngine:
    """Orchestrates extract/load/sync for a warehouse directory of
    bucketed parquet tables (reference PGWarehouse class, minus the
    subprocess plumbing Spark replaces)."""

    def __init__(
        self,
        spark: SparkSession,
        source: Source,
        warehouse_path: str,
        specs: dict[str, TableSpec] | None = None,
        num_buckets: int = DEFAULT_BUCKETS,
    ):
        self.spark = spark
        self.source = source
        self.warehouse_path = warehouse_path
        self.specs = specs or {}
        self.num_buckets = num_buckets
        self._discovered: set[str] = set()  # tables metadata-probed once

    @classmethod
    def from_config(cls, spark: SparkSession, config: Config, **kw) -> "SyncEngine":
        return cls(
            spark,
            make_source(config.source),
            config.warehouse["path"],
            specs=config.tables,
            **kw,
        )

    # -- catalog ops (A19-A22, A24) -----------------------------------
    def table_path(self, table: str) -> str:
        return os.path.join(self.warehouse_path, table)

    def table_exists(self, table: str) -> bool:
        return os.path.exists(self.table_path(table))

    def list_warehouse_tables(self) -> list[str]:
        if not os.path.exists(self.warehouse_path):
            return []
        return sorted(
            d for d in os.listdir(self.warehouse_path)
            if os.path.isdir(os.path.join(self.warehouse_path, d))
        )

    def _tx(self, table: str):
        from .txlog import TxTable

        spec = self.spec(table)
        return TxTable(self.table_path(table), spec.primary_key, self.num_buckets)

    def _is_tx(self, table: str) -> bool:
        return os.path.isdir(os.path.join(self.table_path(table), "manifest"))

    def _route_tx(self, table: str, spec) -> bool:
        """Layout routing for an EXISTING table: the on-disk layout is
        the truth. Reads already route on it; incremental writes must
        too, or flipping `transactional:` in config against an existing
        table sends a merge into the wrong layout and dies with a
        confusing FileNotFoundError / corrupt-parquet error deep in the
        stack (ADVICE r02 medium). A spec that disagrees with the disk
        gets a clear migration message instead; `reload` migrates
        (it drops and re-creates in the spec's layout)."""
        on_disk = self._is_tx(table)
        if bool(spec.transactional) != on_disk:
            want = "transactional" if spec.transactional else "plain"
            have = "transactional" if on_disk else "plain"
            raise ValueError(
                f"{table}: config requests the {want} layout but the "
                f"existing table on disk is {have}; run `reload {table}` "
                f"to migrate it to the configured layout"
            )
        return on_disk

    def read_table(self, table: str, version: int | None = None) -> DataFrame:
        # Transactional tables resolve a manifest snapshot (optionally a
        # historical version); plain tables read the bucketed directory.
        if self._is_tx(table):
            return self._tx(table).read(self.spark, version=version)
        if version is not None:
            raise ValueError(f"{table} is not transactional; no time travel")
        # mergeSchema: after schema evolution (source grew a column
        # mid-history) files carry different schemas; the union schema is
        # the table's schema, with nulls where old files lack the column.
        df = self.spark.read.option("mergeSchema", "true").parquet(
            self.table_path(table)
        )
        return df.drop(BUCKET_COL) if BUCKET_COL in df.columns else df

    def _reconcile_schema(self, table: str, delta: DataFrame) -> DataFrame:
        """Schema evolution policy (the reference has none — a drifted
        source breaks its CSV load): existing columns keep the target's
        type (delta cast to it), columns the delta dropped become typed
        nulls, NEW source columns are appended and flow through (old
        rows read as null via mergeSchema)."""
        target = self.read_table(table).schema
        known = {f.name for f in target.fields}
        cols = [
            (
                F.col(f.name).cast(f.dataType) if f.name in delta.columns
                else F.lit(None).cast(f.dataType)
            ).alias(f.name)
            for f in target.fields
        ]
        cols += [F.col(c) for c in delta.columns if c not in known]
        return delta.select(*cols)

    def count_table(self, table: str) -> int:
        return self.read_table(table).count()

    def drop_table(self, table: str) -> None:
        import shutil

        if self.table_exists(table):
            shutil.rmtree(self.table_path(table))

    def query_table(
        self,
        table: str,
        cols: list[str] | None = None,
        where: str | None = None,
        limit: int | None = None,
    ) -> DataFrame:
        """A23: projection + filter + limit probe."""
        df = self.read_table(table)
        if cols:
            df = df.select(*cols)
        if where:
            df = df.filter(where)
        if limit is not None:
            df = df.limit(limit)
        return df

    # -- spec resolution ----------------------------------------------
    def spec(self, table: str) -> TableSpec:
        """Resolve the table's sync spec, filling missing PK/watermark
        from source metadata once (reference parity: `psql \\d` scrape
        means zero per-table config — pgwarehouse.py:248-252). Explicit
        YAML always wins; discovery only fills blanks. Failures (no
        metadata API, table missing) degrade silently to the reference's
        reload-only fallback."""
        spec = self.specs.get(table)
        if spec is None:
            spec = TableSpec(name=table)
            self.specs[table] = spec
        if table not in self._discovered:
            # memoize only on SUCCESS: a transient JDBC failure must not
            # permanently downgrade the table to reload-only — the next
            # spec() call retries (discovery is one metadata round trip)
            try:
                if not spec.primary_key:
                    spec.primary_key = self.source.discover_primary_key(
                        self.spark, table
                    )
                if spec.primary_key and not spec.last_modified:
                    spec.last_modified = self.source.discover_watermark(
                        self.spark, table
                    )
                self._discovered.add(table)
            except Exception:
                pass
        return spec

    # -- extract (A1-A3) ----------------------------------------------
    def extract(self, table: str, where: str | None = None) -> DataFrame:
        spec = self.spec(table)
        df = self.source.read(self.spark, table, where)
        if spec.max_records:
            df = df.limit(spec.max_records)  # A3 row-limit guard
        return df

    # -- load paths (A7/A8/A10/A14) -----------------------------------
    def _write_full(self, table: str, df: DataFrame) -> int:
        spec = self.spec(table)
        rows = df.count()
        if spec.transactional and spec.primary_key:
            from .txlog import TxTable

            self.drop_table(table)  # reload = fresh version history
            TxTable.create(
                df, self.table_path(table), spec.primary_key, self.num_buckets
            )
        elif spec.primary_key:
            write_bucketed(
                df, self.table_path(table), spec.primary_key, self.num_buckets
            )
        else:
            df.write.mode("overwrite").parquet(self.table_path(table))
        return rows

    def _append(self, table: str, delta: DataFrame) -> int:
        spec = self.spec(table)
        rows = delta.count()
        if rows == 0:
            return 0
        delta = self._reconcile_schema(table, delta)
        if self._route_tx(table, spec) and spec.primary_key:
            # insert-only merge: new keys commit a new version
            self._tx(table).merge(self.spark, delta)
            return rows
        if spec.primary_key:
            from .merge import bucket_expr

            (
                delta.withColumn(
                    BUCKET_COL, bucket_expr(spec.primary_key, self.num_buckets)
                )
                .write.mode("append")
                .partitionBy(BUCKET_COL)
                .parquet(self.table_path(table))
            )
        else:
            delta.write.mode("append").parquet(self.table_path(table))
        return rows

    def verify(self, table: str) -> dict:
        """Consistency audit source↔warehouse (the scaled-up form of the
        reference's post-load count check A18, clickhouse_backend.py:
        171-173): per-bucket row counts and order-independent content
        digests (xor of per-row xxhash64 over sorted column names)
        compared side-by-side. Returns {'ok': bool, 'buckets': [bucket
        ids that disagree]} — at 100 TB the digest runs as one parallel
        scan per side, no shuffle wider than num_buckets rows, and a
        mismatch pinpoints which bucket partitions to re-sync instead of
        forcing a full reload."""
        spec = self.spec(table)
        src = self.extract(table)
        tgt = self.read_table(table).select(*src.columns)

        def digests(df: DataFrame) -> dict:
            cols = sorted(df.columns)
            row_hash = F.xxhash64(
                *[F.col(c).cast("string") for c in cols]
            )
            bucket = (
                bucket_expr(spec.primary_key, self.num_buckets)
                if spec.primary_key
                else F.lit(0)
            )
            return {
                r["b"]: (r["n"], r["d"])
                for r in df.select(bucket.alias("b"), row_hash.alias("h"))
                .groupBy("b")
                .agg(F.count(F.lit(1)).alias("n"), F.bit_xor("h").alias("d"))
                .collect()
            }

        a, b = digests(src), digests(tgt)
        bad = sorted(
            k for k in set(a) | set(b) if a.get(k) != b.get(k)
        )
        return {"ok": not bad, "buckets": bad}

    def optimize_zorder(self, table: str, cols: list[str]) -> None:
        """Rewrite a plain (no-PK) table z-ordered on two integer/date/timestamp
        columns so parquet min/max stats prune scans on EITHER column
        (operators/zorder.py; the Delta OPTIMIZE ZORDER analogue).
        Bucketed and transactional tables refuse: their physical layout
        IS the merge-key layout, and re-sorting it would break
        bucket-pruned MERGE — z-order the derived read-optimized copy
        instead (publish it as its own table)."""
        spec = self.spec(table)
        if spec.primary_key or self._is_tx(table):
            raise ValueError(
                f"{table}: z-order applies to plain tables only — the "
                f"bucketed/transactional layout is the merge-key layout; "
                f"publish a read-optimized copy and z-order that"
            )
        if len(cols) != 2:
            raise ValueError("z-order takes exactly two columns")
        from ..operators.zorder import write_zorder_layout

        df = self.read_table(table).localCheckpoint(eager=True)
        n_files = max(1, self.spark.sparkContext.defaultParallelism // 4)
        write_zorder_layout(
            df, self.table_path(table), cols[0], cols[1], n_files=n_files
        )

    def compact(self, table: str) -> tuple[int, int]:
        """Warehouse maintenance (the OPTIMIZE every columnar store runs;
        ClickHouse does it continuously via MergeTree background merges —
        the layout the reference relies on): rewrite the table into the
        canonical bucketed, key-sorted layout, collapsing the small files
        incremental appends leave behind. Returns (files_before,
        files_after).

        At scale this is the compaction job a table format (Delta/Iceberg)
        schedules; on plain parquet it is a bucket-partitioned rewrite —
        one shuffle, sorted within buckets, so post-compaction scans get
        large row groups and range-clustered keys."""
        import glob

        path = self.table_path(table)

        def _nfiles() -> int:
            return len(
                glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
            )

        before = _nfiles()
        spec = self.spec(table)
        if self._is_tx(table):
            # transactional tables compact as a NEW VERSION (readers
            # pinned at old snapshots unaffected; vacuum reclaims the
            # fragmented dirs). Report PER-SNAPSHOT file counts — the
            # files a reader of each latest manifest touches — not the
            # whole-directory count, which grows with the new version's
            # files until vacuum and would read as if compaction made
            # things worse (ADVICE r03).
            from .txlog import _read_manifest

            tx = self._tx(table)

            def _snapshot_nfiles() -> int:
                m = _read_manifest(tx.root, tx.latest_version())
                return sum(
                    len(glob.glob(os.path.join(tx.root, rel, "*.parquet")))
                    for rel in m["buckets"].values()
                )

            before = _snapshot_nfiles()
            tx.compact(self.spark)
            return before, _snapshot_nfiles()
        # Materialize off the files being replaced (plain parquet has no
        # snapshot isolation; see merge_into_bucketed).
        df = self.read_table(table).localCheckpoint(eager=True)
        if spec.primary_key:
            write_bucketed(df, path, spec.primary_key, self.num_buckets)
        else:
            df.coalesce(
                max(1, self.spark.sparkContext.defaultParallelism // 4)
            ).write.mode("overwrite").parquet(path)
        return before, _nfiles()

    # -- watermarks (A11) ---------------------------------------------
    def watermark(self, table: str, column: str):
        row = self.read_table(table).agg(F.max(column).alias("wm")).collect()[0]
        return row["wm"]

    # -- strategies ---------------------------------------------------
    def reload(self, table: str) -> SyncResult:
        """A10: drop + full re-extract + load."""
        df = self.extract(table)
        rows = self._write_full(table, df)
        return SyncResult(table, "reloaded", rows)

    def sync(self, table: str, today=None) -> SyncResult:
        """A25: the dispatcher."""
        spec = self.spec(table)
        if spec.skip:
            return SyncResult(table, "skipped", 0)
        if not self.source.exists(self.spark, table):
            raise FileNotFoundError(f"source table not found: {table}")
        if not self.table_exists(table):
            df = self.extract(table)
            rows = self._write_full(table, df)
            return SyncResult(table, "created", rows)
        if spec.should_reload(today):
            return self.reload(table)
        if spec.last_modified:
            return self._sync_upsert(table, spec)
        if spec.primary_key:
            return self._sync_append(table, spec)
        return self.reload(table)

    def _sync_append(self, table: str, spec: TableSpec) -> SyncResult:
        """New-records-only strategy: pk > max(pk) (reference default,
        README.md:155-160) for a single-column monotonic PK.

        Composite PK: the watermark is MAX(keys[0]) and a strict '>'
        would PERMANENTLY drop new rows sharing the already-synced
        maximum (a new line under the max orderkey) — so the composite
        branch extracts the boundary-inclusive delta ('>=') and MERGEs
        on the full key, which is idempotent at the boundary instead of
        lossy. An empty warehouse table (created from an empty source)
        has no watermark; the extract is unfiltered rather than the
        nonsense predicate 'pk > None'."""
        pk = spec.primary_key[0]
        wm = self.watermark(table, pk)
        if wm is None:
            where = None
        elif len(spec.primary_key) == 1:
            where = f"{pk} > {_sql_literal(wm)}"
        else:
            where = f"{pk} >= {_sql_literal(wm)}"
        delta = self.extract(table, where=where)
        if len(spec.primary_key) > 1:
            delta = delta.localCheckpoint(eager=True)
            rows = delta.count()
            if rows == 0:
                return SyncResult(table, "noop", 0)
            delta = self._reconcile_schema(table, delta)
            if self._route_tx(table, spec):
                self._tx(table).merge(self.spark, delta)
            else:
                merge_into_bucketed(
                    self.spark,
                    self.table_path(table),
                    delta,
                    spec.primary_key,
                    self.num_buckets,
                )
            return SyncResult(table, "merged", rows)
        rows = self._append(table, delta)
        if rows == 0:
            return SyncResult(table, "noop", 0)  # A13 zero-delta skip
        return SyncResult(table, "appended", rows)

    def _sync_upsert(self, table: str, spec: TableSpec) -> SyncResult:
        """Last-modified strategy: lm >= max(lm), merged by PK
        (README.md:161-174). `>=` not `>`, matching the reference
        (clickhouse_backend.py:227) — rows sharing the boundary
        timestamp re-merge idempotently."""
        if not spec.primary_key:
            raise ValueError(f"{table}: upsert requires a primary key")
        lm = spec.last_modified
        wm = self.watermark(table, lm)
        # wm None (empty table) -> full extract, not 'lm >= None';
        # localCheckpoint so the source is pulled ONCE (the old
        # isEmpty + count + merge sequence re-ran a JDBC extract 3x)
        delta = self.extract(
            table, where=None if wm is None else f"{lm} >= {_sql_literal(wm)}"
        ).localCheckpoint(eager=True)
        rows = delta.count()
        if rows == 0:
            return SyncResult(table, "noop", 0)
        delta = self._reconcile_schema(table, delta)
        if self._route_tx(table, spec):
            self._tx(table).merge(self.spark, delta, order_col=lm)
        else:
            merge_into_bucketed(
                self.spark,
                self.table_path(table),
                delta,
                spec.primary_key,
                self.num_buckets,
                order_col=lm,
            )
        return SyncResult(table, "merged", rows)

    def sync_all(
        self,
        today=None,
        parallel: int = 1,
        consistent: bool = False,
        audit_fk: bool = False,
    ) -> list[SyncResult]:
        """A26: multi-table loop with per-table error isolation.

        ``parallel`` > 1 syncs tables through a bounded thread pool
        (VERDICT r7 task 6): Spark job submission is thread-safe, each
        worker tags its jobs with a per-table FAIR scheduler pool (so
        one huge table doesn't starve the rest — on a cluster set
        ``spark.scheduler.mode=FAIR``), per-table exception isolation
        is preserved, and results come back in spec order.

        ``consistent`` (VERDICT r7 task 5) wraps the whole loop in one
        exported source snapshot (``PsqlCopySource.snapshot``): every
        per-table extract reads the SAME MVCC view, so cross-table FK
        consistency survives a live, mutating source — the guarantee
        the reference's one-table-at-a-time loop (reference
        pgwarehouse.py:96-110) cannot give. Raises for sources without
        snapshot support rather than silently degrading.

        ``audit_fk`` appends post-sync referential results: one
        ``<child>-><parent>: fk_orphans`` row per discovered FK edge
        (see :meth:`audit_fk_orphans`)."""
        return orchestrate_sync_all(
            self,
            today=today,
            parallel=parallel,
            consistent=consistent,
            audit_fk=audit_fk,
            thread_safe=True,
        )

    def audit_fk_orphans(self, edges: list[dict] | None = None) -> list[dict]:
        """Post-sync referential-integrity audit over the WAREHOUSE
        copies (VERDICT r7 task 5): for each FK edge, count child rows
        whose parent key is absent — the measurable symptom of a
        non-snapshot multi-table sync against a live source. Edges
        default to the source's declared constraints
        (``discover_foreign_keys``) when it exposes them.

        Scale: one LEFT ANTI join per edge, parent pruned to its key
        columns; AQE broadcasts the key set when it fits, so the child
        is scanned once per edge with no driver-side data."""
        if edges is None:
            disc = getattr(self.source, "discover_foreign_keys", None)
            edges = disc() if disc else []
        out = []
        for e in edges:
            if not (self.table_exists(e["child"]) and self.table_exists(e["parent"])):
                continue
            child = self.read_table(e["child"])
            parent = self.read_table(e["parent"]).select(*e["parent_cols"])
            cond = None
            for ck, pk in zip(e["child_cols"], e["parent_cols"]):
                clause = child[ck] == parent[pk]
                cond = clause if cond is None else (cond & clause)
            # NULL FK columns mean "no parent declared" (SQL MATCH
            # SIMPLE): not orphans
            notnull = None
            for ck in e["child_cols"]:
                clause = child[ck].isNotNull()
                notnull = clause if notnull is None else (notnull & clause)
            n = child.where(notnull).join(parent, cond, "left_anti").count()
            out.append({**e, "n_orphans": n})
        return out


def orchestrate_sync_all(
    eng,
    today=None,
    parallel: int = 1,
    consistent: bool = False,
    audit_fk: bool = False,
    thread_safe: bool = True,
) -> list[SyncResult]:
    """Shared `sync all` orchestration for every engine flavor (parquet
    lake, live DuckDB, fake warehouses): one place owns the snapshot
    context, the bounded thread pool, per-table error isolation, and
    the FK-audit result rows, so the engines cannot drift on the
    contract (a round-8 review found exactly that drift: the DuckDB
    engine crashed on the CLI's new kwargs). Engines provide ``specs``,
    ``spec``, ``sync``, ``source``, ``spark``, ``audit_fk_orphans``.
    ``thread_safe=False`` (single-connection warehouses: DuckDB file,
    protocol fakes) accepts ``parallel`` but runs serially — protocol
    fidelity, not throughput."""
    import contextlib

    tables = list(eng.specs or {})

    def one(table: str) -> SyncResult:
        try:
            return eng.sync(table, today=today)
        except Exception as exc:  # isolate failures per table
            return SyncResult(table, f"error: {exc}", 0)

    ctx = contextlib.nullcontext()
    if consistent:
        snap = getattr(eng.source, "snapshot", None)
        if snap is None:
            raise ValueError(
                "consistent=True requires a snapshot-capable source "
                "(live Postgres via PsqlCopySource); "
                f"{type(eng.source).__name__} has no snapshot()"
            )
        ctx = snap()
    with ctx:
        if parallel <= 1 or len(tables) <= 1 or not thread_safe:
            results = [one(t) for t in tables]
        else:
            from concurrent.futures import ThreadPoolExecutor

            # spec discovery mutates shared dicts (specs/_discovered):
            # do it serially up front so worker threads only read
            for t in tables:
                try:
                    eng.spec(t)
                except Exception:
                    pass

            def run(table: str) -> SyncResult:
                eng.spark.sparkContext.setLocalProperty(
                    "spark.scheduler.pool", f"sync_{table}"
                )
                try:
                    return one(table)
                finally:
                    eng.spark.sparkContext.setLocalProperty(
                        "spark.scheduler.pool", None
                    )

            with ThreadPoolExecutor(max_workers=parallel) as ex:
                results = list(ex.map(run, tables))
    if audit_fk:
        # Mirror the consistent=True contract (ADVICE r8): a source with
        # no FK discovery at all cannot be audited — raise rather than
        # silently appending zero rows ("audited, clean" vs "never
        # audited" must be distinguishable). A capable source that
        # declares zero constraints gets an explicit no-edges marker row.
        if getattr(eng.source, "discover_foreign_keys", None) is None:
            raise ValueError(
                "audit_fk=True requires a source that can discover FK "
                "constraints (live Postgres via PsqlCopySource); "
                f"{type(eng.source).__name__} has no discover_foreign_keys()"
            )
        audited = eng.audit_fk_orphans()
        if not audited:
            results.append(SyncResult("fk_audit", "no_fk_edges_declared", 0))
        results.extend(
            SyncResult(f"{e['child']}->{e['parent']}", "fk_orphans",
                       e["n_orphans"])
            for e in audited
        )
    return results


def _sql_literal(value) -> str:
    import datetime as dt

    if isinstance(value, (dt.datetime, dt.date)):
        return f"'{value}'"
    if isinstance(value, str):
        escaped = value.replace("'", "''")
        return f"'{escaped}'"
    return str(value)
