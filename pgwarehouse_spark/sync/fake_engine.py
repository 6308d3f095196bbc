"""Sync engine over the wire-protocol fakes: the reference's LITERAL
ClickHouse/Snowflake dataflow, end-to-end, in-process.

``warehouse: {type: snowflake, fake: true}`` (or clickhouse) routes the
CLI here instead of the loud "not available in this build" error: every
sync stages gzip CSV chunks (header per chunk, the reference's staging
shape), emits the PINNED golden statement sequences
(:mod:`.dialects` — the same generators the token-parity tests pin),
and EXECUTES them on :class:`.fakes.FakeSnowflake` /
:class:`.fakes.FakeClickHouse`, which accept only those shapes. The
strategy dispatch mirrors the reference (create on first sync,
scheduled reload, last-modified ``>=``-watermark upsert, PK
``>``-watermark append, reload without a PK — reference
pgwarehouse.py:180-189), with watermarks computed WAREHOUSE-side like
the live backends do (clickhouse_backend.py:227, snowflake_backend.py
watermark query).

Scale contract: none — this is a protocol-fidelity harness. The 100 TB
paths remain the parquet lake (SyncEngine), live DuckDB, and JDBC
publish; the fake engine exists so the A15/A16 statement paths run
end-to-end (stage → sequence → warehouse → assert CONTENTS) in this
container, not just emit.

Full/initial loads run the reference's actual LOAD sequence (PUT +
COPY INTO … PURGE per chunk, snowflake_backend.py:148-157, now pinned
via :func:`.dialects.reference_snowflake_load_sql`); deltas run the
pinned MERGE sequence, which — like the reference's merge_table —
requires a primary key (keyless tables take the reload strategy).
"""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .dialects import reference_create_table_sql, reference_pg_type
from .engine import SyncResult, _sql_literal, make_source
from .fakes import (
    FakeClickHouse,
    FakeSnowflake,
    run_clickhouse_upsert,
    run_snowflake_load,
    run_snowflake_upsert,
)

#: Spark -> Postgres type spellings for the golden generators (their
#: input contract is the pg-typed schema the reference scrapes with
#: `\d`; a PsqlCopySource provides it directly, other sources derive it
#: from the Spark schema through this map).
_SPARK_TO_PG = {
    "byte": "smallint", "short": "smallint", "integer": "integer",
    "long": "bigint", "float": "real", "double": "double precision",
    "boolean": "boolean", "string": "text", "binary": "bytea",
    "date": "date", "timestamp": "timestamp without time zone",
    "timestamp_ntz": "timestamp without time zone",
}


def _pg_columns(source, table: str, df: DataFrame) -> dict[str, str]:
    info = getattr(source, "schema_info", None)
    if info:
        try:
            return dict(info(table)["columns"])
        except Exception:
            pass
    cols: dict[str, str] = {}
    for f in df.schema.fields:
        if isinstance(f.dataType, T.DecimalType):
            cols[f.name] = f"numeric({f.dataType.precision},{f.dataType.scale})"
        else:
            cols[f.name] = _SPARK_TO_PG.get(f.dataType.typeName(), "text")
    return cols


class FakeWarehouseSyncEngine:
    """Reference-dispatch sync into a fake Snowflake/ClickHouse."""

    def __init__(
        self,
        spark: SparkSession,
        source,
        backend: str,
        specs=None,
        db_path: str | None = None,
        staging_dir: str | None = None,
    ):
        if backend not in ("snowflake", "clickhouse"):
            raise ValueError(f"unsupported fake backend {backend!r}")
        self.spark = spark
        self.source = source
        self.backend = backend
        self.specs = specs or {}
        self.wh = (
            FakeSnowflake(db_path) if backend == "snowflake"
            else FakeClickHouse(db_path)
        )
        self.staging_dir = staging_dir or tempfile.mkdtemp(prefix="fake_wh_stage_")
        os.makedirs(self.staging_dir, exist_ok=True)
        self._discovered: set[str] = set()
        self._columns: dict[str, dict[str, str]] = {}

    @classmethod
    def from_config(cls, spark: SparkSession, config) -> "FakeWarehouseSyncEngine":
        wh = config.warehouse or {}
        return cls(
            spark,
            make_source(config.source),
            wh["type"],
            specs=config.tables,
            db_path=wh.get("path"),
            staging_dir=wh.get("staging"),
        )

    # -- catalog ------------------------------------------------------
    def spec(self, table: str):
        from ..catalog import TableSpec

        spec = self.specs.get(table)
        if spec is None:
            spec = TableSpec(name=table)
            self.specs[table] = spec
        if table not in self._discovered:
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

    def table_exists(self, table: str) -> bool:
        return bool(
            self.wh.con.execute(
                "SELECT count(*) FROM duckdb_tables() WHERE table_name = ?",
                [table],
            ).fetchone()[0]
        )

    def count_table(self, table: str) -> int:
        return self.wh.con.execute(f"SELECT count(*) FROM {table}").fetchone()[0]

    def list_warehouse_tables(self) -> list[str]:
        return sorted(
            r[0]
            for r in self.wh.con.execute(
                "SELECT table_name FROM duckdb_tables()"
            ).fetchall()
        )

    def watermark(self, table: str, col: str):
        return self.wh.con.execute(f"SELECT max({col}) FROM {table}").fetchone()[0]

    # -- staging (the reference's chunked gzip CSV shape) --------------
    def _stage(self, table: str, df: DataFrame) -> list[str]:
        out = os.path.join(self.staging_dir, f"{table}_data")
        (
            df.write.mode("overwrite")
            .option("header", "true")
            .option("compression", "gzip")
            # pg CSV quoting: RFC4180 doubled quotes, not backslash
            .option("escape", '"')
            .csv(out)
        )
        # Spark emits a header-only part file per EMPTY partition; the
        # reference's staging never contains record-less chunks, so drop
        # them (they also defeat CSV type sniffing downstream)
        import gzip as _gzip

        chunks = []
        for path in sorted(glob.glob(os.path.join(out, "part-*.csv.gz"))):
            with _gzip.open(path, "rt") as f:
                f.readline()
                if f.readline():
                    chunks.append(path)
        return chunks

    # -- load paths (golden sequences, executed) ------------------------
    def _create(self, table: str, columns: dict[str, str], pk: list[str]) -> None:
        if self.backend == "snowflake":
            self.wh.execute("USE SCHEMA PUBLIC")
        self.wh.execute(
            reference_create_table_sql(self.backend, table, columns, pk)
        )

    def _load_chunks(
        self,
        table: str,
        columns: dict[str, str],
        pk: list[str],
        chunks: list[str],
        full: bool = False,
    ) -> None:
        if self.backend == "snowflake":
            if full or not pk:
                # the reference's initial/full load path: PUT + COPY INTO
                # … PURGE per chunk (snowflake_backend.py:148-157) —
                # plain inserts, keyless by design, so multi-chunk loads
                # can never collide on a key
                run_snowflake_load(self.wh, table, chunks)
                return
            run_snowflake_upsert(self.wh, table, columns, pk, chunks)
            return
        if pk:
            run_clickhouse_upsert(self.wh, table, columns, pk, chunks)
            return
        # no PK: the reference's plain per-chunk load (clickhouse_
        # backend.py:141-171) — the same pinned INSERT ... FROM input()
        # shape the upsert uses, aimed at the target instead of a temp
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
        stmt = (
            f"INSERT INTO {table} SELECT {', '.join(select_cols)} "
            f"FROM input('{import_structure}') FORMAT CSVWithNames "
            "SETTINGS date_time_input_format='best_effort';"
        )
        for path in chunks:
            with open(path, "rb") as f:
                self.wh.execute(stmt, stdin=f.read())

    def _loading_marker(self, table: str) -> str:
        return os.path.join(self.staging_dir, f"{table}.loading")

    def _full_load(self, table: str, df: DataFrame) -> int:
        spec = self.spec(table)
        columns = _pg_columns(self.source, table, df)
        self._columns[table] = columns
        df.persist()
        # Crash-resume protocol (VERDICT r8 task 5): the reference's
        # per-chunk PUT + COPY INTO … PURGE commits chunk-by-chunk
        # (snowflake_backend.py:136-159 archives as it goes), so a crash
        # mid-load leaves a PARTIAL table — and because chunks are
        # arbitrary row partitions, the partial state is NOT a pk-prefix:
        # a later watermark append would silently leave holes (the
        # reference does exactly that on restart). This rebuild is
        # stricter: a marker brackets the multi-chunk load; sync() sees
        # a leftover marker and forces a reload instead of trusting the
        # watermark.
        marker = self._loading_marker(table)
        try:
            rows = df.count()
            if self.table_exists(table):
                self.wh.con.execute(f"DROP TABLE {table}")
            self._create(table, columns, spec.primary_key or [])
            with open(marker, "w") as f:
                f.write("load in progress")
            self._load_chunks(
                table, columns, spec.primary_key or [],
                self._stage(table, df), full=True,
            )
            os.remove(marker)
        finally:
            df.unpersist()
        return rows

    def _delta_load(self, table: str, delta: DataFrame, pk: list[str]) -> int:
        delta.persist()
        # Same crash bracket as _full_load: a crash between delta chunks
        # leaves the loaded chunks' keys in the table, which RAISES the
        # watermark above the unloaded chunks' keys — the next plain
        # append would skip them forever. Marker -> next sync reloads.
        marker = self._loading_marker(table)
        try:
            rows = delta.count()
            if rows:
                columns = self._columns.get(table) or _pg_columns(
                    self.source, table, delta
                )
                with open(marker, "w") as f:
                    f.write("delta load in progress")
                self._load_chunks(table, columns, pk, self._stage(table, delta))
                os.remove(marker)
        finally:
            delta.unpersist()
        return rows

    # -- strategies (reference dispatch) --------------------------------
    def extract(self, table: str, where: str | None = None) -> DataFrame:
        spec = self.spec(table)
        df = self.source.read(self.spark, table, where)
        if spec.max_records:
            df = df.limit(spec.max_records)
        return df

    def reload(self, table: str) -> SyncResult:
        rows = self._full_load(table, self.extract(table))
        return SyncResult(table, "reloaded", rows)

    def sync(self, table: str, today=None) -> SyncResult:
        spec = self.spec(table)
        if spec.skip:
            return SyncResult(table, "skipped", 0)
        if not self.source.exists(self.spark, table):
            raise FileNotFoundError(f"source table not found: {table}")
        if not self.table_exists(table):
            return SyncResult(table, "created", self._full_load(
                table, self.extract(table)
            ))
        if os.path.exists(self._loading_marker(table)):
            # a prior multi-chunk load crashed mid-sequence: the table
            # holds an arbitrary subset of rows, so the watermark paths
            # below would leave holes — reload (see _full_load docstring)
            return self.reload(table)
        if spec.should_reload(today):
            return self.reload(table)
        if spec.last_modified and spec.primary_key:
            lm = spec.last_modified
            wm = self.watermark(table, lm)
            delta = self.extract(
                table, where=None if wm is None else f"{lm} >= {_sql_literal(wm)}"
            )
            rows = self._delta_load(table, delta, spec.primary_key)
            return SyncResult(table, "merged" if rows else "noop", rows)
        if spec.primary_key:
            pk = spec.primary_key[0]
            wm = self.watermark(table, pk)
            delta = self.extract(
                table, where=None if wm is None else f"{pk} > {_sql_literal(wm)}"
            )
            rows = self._delta_load(table, delta, spec.primary_key)
            return SyncResult(table, "appended" if rows else "noop", rows)
        return self.reload(table)

    def sync_all(
        self,
        today=None,
        parallel: int = 1,
        consistent: bool = False,
        audit_fk: bool = False,
    ) -> list[SyncResult]:
        """Shared orchestration (engine.orchestrate_sync_all); the
        fakes' DuckDB connection is single-threaded, so ``parallel`` is
        accepted but executes serially (protocol fidelity, not
        throughput)."""
        from .engine import orchestrate_sync_all

        return orchestrate_sync_all(
            self,
            today=today,
            parallel=parallel,
            consistent=consistent,
            audit_fk=audit_fk,
            thread_safe=False,
        )

    def audit_fk_orphans(self, edges: list[dict] | None = None) -> list[dict]:
        if edges is None:
            disc = getattr(self.source, "discover_foreign_keys", None)
            edges = disc() if disc else []
        out = []
        for e in edges:
            if not (self.table_exists(e["child"]) and self.table_exists(e["parent"])):
                continue
            conds = " AND ".join(
                f"c.{ck} = p.{pk}"
                for ck, pk in zip(e["child_cols"], e["parent_cols"])
            )
            notnull = " AND ".join(f"c.{ck} IS NOT NULL" for ck in e["child_cols"])
            n = self.wh.con.execute(
                f"SELECT count(*) FROM {e['child']} c WHERE {notnull} "
                f"AND NOT EXISTS (SELECT 1 FROM {e['parent']} p WHERE {conds})"
            ).fetchone()[0]
            out.append({**e, "n_orphans": n})
        return out
