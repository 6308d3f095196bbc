"""Live DuckDB warehouse sink — the engine's first end-to-end non-JDBC
warehouse backend, mirroring the reference's DuckDB loader
(`duckdb_backend.py:78-110` bulk load, `:130-175` incremental /
last-modified update) with a Spark-first data path.

Dataflow: Spark writes the frame as PARQUET to a staging directory (a
distributed, parallel write — every executor emits its partitions), then
DuckDB ingests the staged files directly via ``read_parquet`` — columnar
end-to-end. The reference funnels rows through gzip'd CSV chunks and
per-chunk ``COPY FROM`` statements (`duckdb_backend.py:104-110`); the
parquet handoff removes the text round-trip and the type lossiness that
comes with it, and at scale keeps the Spark side fully parallel (the
single-node half is DuckDB itself, exactly as in the reference's
topology).

Reads come back the same way (``COPY table TO parquet`` then
``spark.read.parquet``), so types survive both directions bit-exactly.

Upsert strategy: delta staged to parquet, then one DuckDB transaction
``DELETE ... USING delta`` + ``INSERT ... SELECT`` — the net effect of
the reference's ``INSERT OR REPLACE`` keyed on the primary key
(`duckdb_backend.py:181-189`), but valid for composite keys and tables
without a declared PK constraint. Latest-row-per-key collapse
(``order_col``) happens in Spark before staging (``dedup_latest``), so
the warehouse transaction applies an already-net delta.

DDL comes from the DuckDB sink dialect (`dialects.py`), with the primary
key surfaced as a table constraint like the reference's
``col type PRIMARY KEY`` columns (`duckdb_backend.py:72-76`).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

from .dialects import DuckDBDialect
from .merge import dedup_latest


def _quoted(dialect: DuckDBDialect, names: list[str]) -> str:
    return ", ".join(dialect.quote_ident(n) for n in names)


class DuckDBWarehouse:
    """Interface-compatible with :class:`JdbcWarehouse` (`jdbc_sink.py`)
    so ``publish_incremental`` and the CLI publish path drive either; the
    extra ``watermark``/``query`` helpers push probe SQL into DuckDB
    instead of pulling the table back (the reference reads its watermark
    warehouse-side too, `duckdb_backend.py:147-151`)."""

    def __init__(self, db_path: str, staging_dir: str | None = None):
        self.db_path = db_path
        self.staging_dir = staging_dir or db_path + ".staging"
        self.dialect = DuckDBDialect()

    # -- connection ----------------------------------------------------
    def _con(self):
        import duckdb

        os.makedirs(os.path.dirname(os.path.abspath(self.db_path)), exist_ok=True)
        return duckdb.connect(self.db_path)

    def query(self, sql: str, params: list | None = None) -> list[tuple]:
        """Probe queries against the live warehouse (the reference's
        `_query_table`, duckdb_backend.py:124-129)."""
        con = self._con()
        try:
            return con.execute(sql, params).fetchall()
        finally:
            con.close()

    # -- staging -------------------------------------------------------
    def _stage(self, df: DataFrame, tag: str) -> str:
        """Distributed parquet write of `df` into a fresh staging dir;
        returns the glob DuckDB reads. Caller must `_unstage` after the
        ingest transaction commits."""
        os.makedirs(self.staging_dir, exist_ok=True)
        out = tempfile.mkdtemp(prefix=f"{tag}-", dir=self.staging_dir)
        path = os.path.join(out, "delta")
        df.write.mode("overwrite").parquet(path)
        return os.path.join(path, "*.parquet")

    @staticmethod
    def _unstage(glob_path: str) -> None:
        shutil.rmtree(os.path.dirname(os.path.dirname(glob_path)), ignore_errors=True)

    # -- DDL (A7) ------------------------------------------------------
    def create_table_sql(self, table: str, schema, pk: list[str] | None = None) -> str:
        """Dialect DDL plus the PK as a table constraint (reference puts
        PRIMARY KEY on the key column, duckdb_backend.py:72-76)."""
        sql = self.dialect.create_table_sql(table, schema)
        if pk:
            sql = sql[: sql.rfind(")")] + f", PRIMARY KEY ({_quoted(self.dialect, pk)}))"
        return sql

    # -- A7/A8/A10: create-or-replace bulk load ------------------------
    def write_full(self, df: DataFrame, table: str, pk: list[str] | None = None) -> None:
        glob_path = self._stage(df, table)
        cols = _quoted(self.dialect, df.columns)
        con = self._con()
        try:
            con.execute("BEGIN")
            con.execute(f"DROP TABLE IF EXISTS {self.dialect.quote_ident(table)}")
            con.execute(self.create_table_sql(table, df.schema, pk))
            con.execute(
                f"INSERT INTO {self.dialect.quote_ident(table)} ({cols}) "
                f"SELECT {cols} FROM read_parquet(?)",
                [glob_path],
            )
            con.execute("COMMIT")
        finally:
            con.close()
            self._unstage(glob_path)

    # -- A14: incremental append ---------------------------------------
    def append(self, df: DataFrame, table: str) -> None:
        glob_path = self._stage(df, table)
        cols = _quoted(self.dialect, df.columns)
        con = self._con()
        try:
            con.execute(
                f"INSERT INTO {self.dialect.quote_ident(table)} ({cols}) "
                f"SELECT {cols} FROM read_parquet(?)",
                [glob_path],
            )
        finally:
            con.close()
            self._unstage(glob_path)

    # -- A15-A17: upsert ----------------------------------------------
    def merge(
        self,
        df: DataFrame,
        table: str,
        keys: list[str],
        order_col: str | None = None,
    ) -> None:
        """Keyed upsert, O(delta) over the wire. When the table's
        declared PRIMARY KEY covers `keys`, this is the reference's own
        strategy verbatim — one ``INSERT OR REPLACE`` transaction
        (duckdb_backend.py:181-189). DELETE-then-INSERT of the same key
        inside one DuckDB transaction trips the documented ART-index
        limitation (deleted keys stay indexed until commit), so the
        no-PK fallback is an atomic ``CREATE OR REPLACE TABLE`` rewrite
        from anti-join ∪ delta — O(target), the same shape as the
        generic-JDBC fallback, but entirely warehouse-side."""
        spark = df.sparkSession
        if not self.exists(spark, table):
            self.write_full(df, table, keys)
            return
        net = dedup_latest(df, keys, order_col) if order_col else df
        glob_path = self._stage(net, table)
        q = self.dialect.quote_ident(table)
        cols = _quoted(self.dialect, net.columns)
        on = " AND ".join(
            f"t.{self.dialect.quote_ident(k)} = d.{self.dialect.quote_ident(k)}"
            for k in keys
        )
        con = self._con()
        try:
            pk_rows = con.execute(
                "SELECT constraint_column_names FROM duckdb_constraints() "
                "WHERE table_name = ? AND constraint_type = 'PRIMARY KEY'",
                [table],
            ).fetchall()
            pk_covers = bool(pk_rows) and set(pk_rows[0][0]) == set(keys)
            con.execute("BEGIN")
            # CREATE VIEW cannot be a prepared statement in DuckDB —
            # inline the (engine-generated, quote-free) staging path
            con.execute(
                "CREATE OR REPLACE TEMP VIEW _pgw_delta AS "
                f"SELECT * FROM read_parquet('{glob_path}')"
            )
            if pk_covers:
                con.execute(
                    f"INSERT OR REPLACE INTO {q} ({cols}) "
                    f"SELECT {cols} FROM _pgw_delta"
                )
            else:
                con.execute(
                    f"CREATE OR REPLACE TABLE {q} AS "
                    f"SELECT * FROM {q} t WHERE NOT EXISTS "
                    f"(SELECT 1 FROM _pgw_delta d WHERE {on}) "
                    f"UNION ALL BY NAME SELECT {cols} FROM _pgw_delta"
                )
            con.execute("COMMIT")
        finally:
            con.close()
            self._unstage(glob_path)

    # -- probes (A11/A18/A21/A23) --------------------------------------
    def read(self, spark: SparkSession, table: str) -> DataFrame:
        """Full-fidelity read-back: DuckDB COPYs the table to parquet,
        Spark reads it — types survive exactly (no pandas hop). The
        staging files live until the next read of the same table."""
        out = os.path.join(self.staging_dir, f"_read_{table}")
        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out, exist_ok=True)
        con = self._con()
        try:
            con.execute(
                f"COPY (SELECT * FROM {self.dialect.quote_ident(table)}) "
                f"TO '{os.path.join(out, 'data.parquet')}' (FORMAT PARQUET)"
            )
        finally:
            con.close()
        return spark.read.parquet(os.path.join(out, "data.parquet"))

    def read_sql(self, spark: SparkSession, sql: str, tag: str = "q") -> DataFrame:
        """Distributed read of an arbitrary warehouse QUERY: DuckDB COPYs
        the result to parquet, Spark reads it. The point over `query()`
        (fetchall → driver list) is that only the projected columns cross
        the boundary and land as splittable parquet — e.g. `diff` exports
        (pk, digest) pairs, never row width."""
        out = os.path.join(self.staging_dir, f"_read_sql_{tag}")
        shutil.rmtree(out, ignore_errors=True)
        os.makedirs(out, exist_ok=True)
        con = self._con()
        try:
            con.execute(
                f"COPY ({sql}) "
                f"TO '{os.path.join(out, 'data.parquet')}' (FORMAT PARQUET)"
            )
        finally:
            con.close()
        return spark.read.parquet(os.path.join(out, "data.parquet"))

    def count(self, spark: SparkSession, table: str) -> int:
        return self.query(
            f"SELECT COUNT(*) FROM {self.dialect.quote_ident(table)}"
        )[0][0]

    def exists(self, spark: SparkSession, table: str) -> bool:
        rows = self.query(
            "SELECT COUNT(*) FROM information_schema.tables "
            "WHERE table_name = ?",
            [table],
        )
        return rows[0][0] > 0

    def watermark(self, table: str, col: str):
        """MAX-watermark computed warehouse-side (A11; the reference's
        `SELECT max({pk}) FROM {table}`, duckdb_backend.py:147-151) —
        one scalar crosses the wire, not the table."""
        q = self.dialect
        return self.query(
            f"SELECT MAX({q.quote_ident(col)}) FROM {q.quote_ident(table)}"
        )[0][0]


class DuckDBSyncEngine:
    """The reference's PRIMARY topology made first-class: `sync` lands
    rows directly in a live DuckDB warehouse (`warehouse: {type:
    duckdb, path: wh.duckdb}` in the config), with the reference's
    strategy dispatch (pgwarehouse.py:180-189 / duckdb_backend.py
    update_table): create on first sync, scheduled/requested reload,
    last-modified `>=`-watermark upsert, PK `>`-watermark append,
    reload-only fallback without a PK — watermarks computed
    WAREHOUSE-side, deltas extracted with the predicate pushed into
    the source scan, zero-delta short-circuit (A10-A17, A25-A26).

    This intentionally mirrors the SyncEngine dispatcher over a
    different load target; the parquet SyncEngine remains the lake
    path, this is the reference-parity warehouse path."""

    def __init__(self, spark, source, wh: DuckDBWarehouse, specs=None):
        self.spark = spark
        self.source = source
        self.wh = wh
        self.specs = specs or {}
        self._discovered: set[str] = set()

    @classmethod
    def from_config(cls, spark, config):
        from .engine import make_source

        return cls(
            spark,
            make_source(config.source),
            DuckDBWarehouse(config.warehouse["path"]),
            specs=config.tables,
        )

    # -- catalog (A19-A22) --------------------------------------------
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
        return self.wh.exists(self.spark, table)

    def count_table(self, table: str) -> int:
        return self.wh.count(self.spark, table)

    def list_warehouse_tables(self) -> list[str]:
        import os as _os

        if not _os.path.exists(self.wh.db_path):
            return []
        return sorted(
            r[0]
            for r in self.wh.query(
                "SELECT table_name FROM information_schema.tables "
                "WHERE table_schema = 'main'"
            )
        )

    def read_table(self, table: str):
        return self.wh.read(self.spark, table)

    # -- extract (A1-A3) ----------------------------------------------
    def extract(self, table: str, where: str | None = None):
        spec = self.spec(table)
        df = self.source.read(self.spark, table, where)
        if spec.max_records:
            df = df.limit(spec.max_records)
        return df

    def _write_full(self, table: str, df) -> int:
        """CLI `load` shim (A8): full load of a staged frame."""
        df.persist()
        try:
            rows = df.count()
            self.wh.write_full(df, table, self.spec(table).primary_key or None)
        finally:
            df.unpersist()
        return rows

    # -- strategies (A10, A13-A17, A25-A26) ---------------------------
    def reload(self, table: str):
        from .engine import SyncResult

        spec = self.spec(table)
        df = self.extract(table)
        df.persist()
        try:
            rows = df.count()
            self.wh.write_full(df, table, spec.primary_key or None)
        finally:
            df.unpersist()
        return SyncResult(table, "reloaded", rows)

    def sync(self, table: str, today=None):
        from .engine import SyncResult, _sql_literal

        spec = self.spec(table)
        if spec.skip:
            return SyncResult(table, "skipped", 0)
        if not self.source.exists(self.spark, table):
            raise FileNotFoundError(f"source table not found: {table}")
        if not self.table_exists(table):
            res = self.reload(table)
            return SyncResult(table, "created", res.rows)
        if spec.should_reload(today):
            return self.reload(table)
        if spec.last_modified and spec.primary_key:
            lm = spec.last_modified
            wm = self.wh.watermark(table, lm)
            delta = self.extract(
                table,
                where=None if wm is None else f"{lm} >= {_sql_literal(wm)}",
            )
            # persist FIRST, then count — isEmpty() before persist would
            # run the filtered source extraction twice (and with a '>='
            # watermark the delta is never empty after the first sync
            # anyway: rows at the watermark always re-extract)
            delta.persist()
            try:
                rows = delta.count()
                if rows == 0:
                    return SyncResult(table, "noop", 0)
                self.wh.merge(delta, table, spec.primary_key, order_col=lm)
            finally:
                delta.unpersist()
            return SyncResult(table, "merged", rows)
        if spec.primary_key:
            pk = spec.primary_key[0]
            wm = self.wh.watermark(table, pk)
            delta = self.extract(
                table,
                where=None if wm is None else f"{pk} > {_sql_literal(wm)}",
            )
            delta.persist()
            try:
                rows = delta.count()
                if rows == 0:
                    return SyncResult(table, "noop", 0)
                self.wh.append(delta, table)
            finally:
                delta.unpersist()
            return SyncResult(table, "appended", rows)
        return self.reload(table)

    def _canon_components(self, src, cols):
        """Per-column canonical STRING components for the row digest,
        type-aware: float/double columns go through the exact IEEE bit
        decomposition (`canon_float_component`) because no decimal
        rendering agrees between Java 17 (legacy non-shortest
        Double.toString) and DuckDB (Ryu shortest) — CAST AS STRING
        produces false 'diverged' verdicts on identical data for any
        double outside ~(1e-3, 1e7). All other types CAST AS STRING,
        which both engines render identically."""
        from pyspark.sql import functions as F

        from ..operators.syncshapes import canon_float_component

        dtypes = dict(src.dtypes)
        return [
            canon_float_component(F.col(c))
            if dtypes[c] in ("float", "double")
            else F.col(c).cast("string")
            for c in cols
        ]

    def _canon_sql(self, src, cols) -> str:
        """DuckDB mirror of `_canon_components` ('|'-joined, '<NULL>'
        sentinel — the canon_row_digest contract)."""
        from ..operators.syncshapes import sql_canon_float

        qi = self.wh.dialect.quote_ident
        dtypes = dict(src.dtypes)
        parts = [
            f"COALESCE({sql_canon_float(f'CAST({qi(c)} AS DOUBLE)')}, '<NULL>')"
            if dtypes[c] in ("float", "double")
            else f"COALESCE(CAST({qi(c)} AS VARCHAR), '<NULL>')"
            for c in cols
        ]
        return " || '|' || ".join(parts)

    def verify(self, table: str) -> dict:
        """Source↔live-warehouse consistency audit (the DuckDB form of
        SyncEngine.verify / A18): per-group row counts and
        order-independent content digests compared side-by-side, with
        the SOURCE side computed in Spark and the WAREHOUSE side as one
        SQL aggregate INSIDE DuckDB — no table read-back. Both engines
        hash the identical canonical string (coalesced '<NULL>'
        sentinels, '|' separators, md5 prefix → bigint; the
        cross-engine-portable form `operators/syncshapes.py::
        canon_row_digest` pins against DuckDB in its own oracle), and
        group on digest % 64 — portable, unlike xxhash64 bucketing —
        so a mismatch pinpoints 1/64th of the rows to re-sync.
        Returns {'ok': bool, 'groups': [diverging group ids]}."""
        from pyspark.sql import functions as F

        from ..operators.syncshapes import canon_row_digest

        src = self.extract(table)
        cols = sorted(src.columns)
        n_groups = 64

        h = canon_row_digest(*self._canon_components(src, cols))
        src_side = {
            r["g"]: (r["n"], r["d"])
            for r in src.select(
                F.pmod(h, F.lit(n_groups)).alias("g"), h.alias("h")
            )
            .groupBy("g")
            .agg(F.count(F.lit(1)).alias("n"), F.bit_xor("h").alias("d"))
            .collect()
        }

        qi = self.wh.dialect.quote_ident
        canon_sql = self._canon_sql(src, cols)
        h_sql = f"CAST('0x' || SUBSTR(md5({canon_sql}), 1, 15) AS BIGINT)"
        wh_side = {
            g: (n, d)
            for g, n, d in self.wh.query(
                f"SELECT h % {n_groups} AS g, CAST(COUNT(*) AS BIGINT) AS n, "
                f"BIT_XOR(h) AS d FROM "
                f"(SELECT {h_sql} AS h FROM {qi(table)}) GROUP BY g"
            )
        }
        bad = sorted(
            g
            for g in set(src_side) | set(wh_side)
            if src_side.get(g) != wh_side.get(g)
        )
        return {"ok": not bad, "groups": bad, "buckets": bad}

    def diff(self, table: str, sample: int = 10) -> dict:
        """Key-level source↔warehouse reconciliation — the drill-down
        behind `verify`: where verify says 'digest group 17 diverged',
        diff names the KEYS. Classes (warehouse-centric):
        `missing_in_warehouse` (source row never landed),
        `extra_in_warehouse` (row the source no longer has),
        `mismatched` (same key, different row digest), `identical`.

        Scale contract: the source side reduces to (pk, digest) in
        Spark; the warehouse side computes the SAME canonical digest
        INSIDE DuckDB and exports only (pk, digest) via `read_sql` —
        row width never crosses the boundary, and the full-outer join
        shuffles 8-byte digests on the PK both layouts already cluster
        on. Digest portability is the verify() contract
        (`canon_row_digest` ≡ the SQL md5-prefix form, oracle-pinned).

        Returns {'ok', 'counts': {class: n}, 'sample_keys': {class:
        [first `sample` keys]}}."""
        from pyspark.sql import functions as F

        from ..operators.syncshapes import canon_row_digest

        spec = self.spec(table)
        pk = spec.primary_key
        if not pk:
            raise ValueError(f"diff requires a primary key for {table}")
        pk_cols = [pk] if isinstance(pk, str) else list(pk)
        src = self.extract(table)
        cols = sorted(src.columns)
        h = canon_row_digest(*self._canon_components(src, cols))
        s = src.select(*pk_cols, h.alias("_dig_src"))
        qi = self.wh.dialect.quote_ident
        canon_sql = self._canon_sql(src, cols)
        h_sql = f"CAST('0x' || SUBSTR(md5({canon_sql}), 1, 15) AS BIGINT)"
        pk_sql = ", ".join(qi(c) for c in pk_cols)
        w = self.wh.read_sql(
            self.spark,
            f"SELECT {pk_sql}, {h_sql} AS _dig_wh FROM {qi(table)}",
            tag=f"diff_{table}",
        )
        cls = (
            F.when(F.col("_dig_wh").isNull(), F.lit("missing_in_warehouse"))
            .when(F.col("_dig_src").isNull(), F.lit("extra_in_warehouse"))
            .when(F.col("_dig_src") != F.col("_dig_wh"), F.lit("mismatched"))
            .otherwise(F.lit("identical"))
        )
        lab = (
            s.join(w, pk_cols, "full_outer")
            .select(*pk_cols, cls.alias("_class"))
            .persist()
        )
        try:
            counts = {
                r["_class"]: r["n"]
                for r in lab.groupBy("_class")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            samples = {}
            for c in ("missing_in_warehouse", "extra_in_warehouse", "mismatched"):
                if counts.get(c):
                    rows = (
                        lab.filter(F.col("_class") == c)
                        .orderBy(*pk_cols)
                        .limit(sample)
                        .collect()
                    )
                    samples[c] = [
                        tuple(r[k] for k in pk_cols)
                        if len(pk_cols) > 1
                        else r[pk_cols[0]]
                        for r in rows
                    ]
        finally:
            lab.unpersist()
        ok = set(counts) <= {"identical"}
        return {"ok": ok, "counts": counts, "sample_keys": samples}

    def sync_all(
        self,
        today=None,
        parallel: int = 1,
        consistent: bool = False,
        audit_fk: bool = False,
    ):
        """Shared orchestration (engine.orchestrate_sync_all) so the
        live-DuckDB warehouse honors the same sync-all contract as the
        lake engine: ``consistent`` exports one source snapshot across
        every extract, ``audit_fk`` appends warehouse-side orphan
        counts. The DuckDB connection is single-threaded, so
        ``parallel`` is accepted but runs serially."""
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
        """Post-sync referential audit over the live-DuckDB warehouse:
        child rows whose non-NULL FK has no parent, per edge (edges
        default to the source's declared constraints)."""
        if edges is None:
            disc = getattr(self.source, "discover_foreign_keys", None)
            edges = disc() if disc else []
        out = []
        for e in edges:
            if not (
                self.table_exists(e["child"]) and self.table_exists(e["parent"])
            ):
                continue
            conds = " AND ".join(
                f"c.{ck} = p.{pk}"
                for ck, pk in zip(e["child_cols"], e["parent_cols"])
            )
            notnull = " AND ".join(
                f"c.{ck} IS NOT NULL" for ck in e["child_cols"]
            )
            n = self.wh.query(
                f"SELECT count(*) FROM {e['child']} c WHERE {notnull} "
                f"AND NOT EXISTS (SELECT 1 FROM {e['parent']} p WHERE {conds})"
            )[0][0]
            out.append({**e, "n_orphans": n})
        return out
