r"""In-process wire-protocol fakes for the Snowflake and ClickHouse
backends (VERDICT r7 task 8).

The reference executes its A15/A16 upserts through engines this
container cannot run: Snowflake via connector ``cursor.execute`` of a
PUT → CREATE FILE FORMAT → MERGE → REMOVE sequence
(reference snowflake_backend.py:136-211) and ClickHouse via
``clickhouse-client --query`` calls with CSV piped on stdin
(reference clickhouse_backend.py:99-173, 245-270). The repo already
pins those statement sequences token-for-token
(:func:`.dialects.reference_snowflake_merge_sql`,
:func:`.dialects.reference_clickhouse_upsert_sql`,
tests/test_dialects.py); what was missing is anything that ACCEPTS the
sequences, so the code paths ran up to emission and stopped.

These fakes are minimal statement-level servers backed by an in-memory
DuckDB database: they parse exactly the statement shapes the golden
generators emit (anything else raises — a fake that accepts malformed
SQL proves nothing), execute their semantics (stage files, merge by
key, best-effort date repair, delete-then-insert), and let tests drive
the full extract → stage → statement-sequence → warehouse round trip
and assert on final TABLE CONTENTS, not on emitted strings.

Scale note: these exist for protocol-fidelity testing only. The real
100 TB path is the Spark-side merge (sync/merge.py) or the live JDBC/
DuckDB sinks; a statement-replaying fake has no scale story and needs
none.
"""

from __future__ import annotations

import gzip
import os
import re
import shutil
import tempfile

# duckdb is imported lazily inside each fake's __init__ (matching
# duckdb_sink.py): it is a test-extra dependency, and this module is
# imported unconditionally by cli.py's isinstance routing — a minimal
# install (pyspark+pyyaml only) must not crash on `sync` against the
# default parquet-lake warehouse just because the fakes exist.


class FakeStatementError(ValueError):
    """A statement the fake does not recognize — the sequence under
    test drifted from the pinned reference shape."""


def _one_line(sql: str) -> str:
    return " ".join(sql.split()).rstrip(";").strip()


class FakeSnowflake:
    """Accepts the reference Snowflake backend's statement sequence
    (snowflake_backend.py:136-211): USE SCHEMA, PUT into a table stage,
    CREATE FILE FORMAT, MERGE from the stage, REMOVE, plus the
    CREATE TABLE the load path issues first. Table state lives in an
    in-memory DuckDB; stages are real files so PUT/REMOVE semantics
    (upload, pattern remove) are honest."""

    # Snowflake type names DuckDB doesn't know, mapped for execution
    _TYPE_MAP = {"STRING": "VARCHAR", "NUMERIC": "DOUBLE", "DATETIME": "TIMESTAMP"}

    def __init__(self, db_path: str | None = None) -> None:
        import duckdb  # lazy: test extra, see module docstring note

        # file-backed when the CLI config gives a path, so `sync` in one
        # invocation is queryable in the next; in-memory for tests
        self.con = duckdb.connect(db_path or ":memory:")
        self.stage_root = tempfile.mkdtemp(prefix="fake_sf_stage_")
        self.current_schema: str | None = None
        self.file_formats: dict[str, dict] = {}
        self.executed: list[str] = []
        # Per-COPY outcome rows mirroring the Snowflake COPY result set
        # (rows_parsed / rows_loaded / errors_seen / status): the
        # reference runs ON_ERROR=CONTINUE, so bad rows vanish silently
        # there — here the skip is executed AND visible, so tests can
        # pin exactly which rows a dirty chunk loses (VERDICT r8 task 5).
        self.load_reports: list[dict] = []

    def close(self) -> None:
        shutil.rmtree(self.stage_root, ignore_errors=True)

    # -- the connector surface: cursor.execute(sql) ---------------------
    def execute(self, sql: str) -> None:
        self.executed.append(sql)
        s = _one_line(sql)
        for pattern, handler in self._HANDLERS:
            m = pattern.match(s)
            if m:
                handler(self, m)
                return
        raise FakeStatementError(f"fake snowflake cannot parse: {s[:200]}")

    def _use_schema(self, m: re.Match) -> None:
        self.current_schema = m.group(1)

    def _create_table(self, m: re.Match) -> None:
        schema, table, cols = m.group(1), m.group(2), m.group(3)
        ddl_cols = []
        for col in self._split_cols(cols):
            name, _, ctype = col.rpartition(" ")
            ddl_cols.append(f"{name} {self._TYPE_MAP.get(ctype.upper(), ctype)}")
        self.con.execute(
            f"CREATE TABLE IF NOT EXISTS {table} ({', '.join(ddl_cols)})"
        )

    def _put(self, m: re.Match) -> None:
        path, table = m.group(1), m.group(2)
        stage = os.path.join(self.stage_root, table)
        os.makedirs(stage, exist_ok=True)
        shutil.copy(path, os.path.join(stage, os.path.basename(path)))

    def _file_format(self, m: re.Match) -> None:
        self.file_formats[m.group(1)] = {"skip_header": 1}

    def _merge(self, m: re.Match) -> None:
        table, fmt, pattern, key = (
            m.group("table"), m.group("fmt"), m.group("pattern"), m.group("key"),
        )
        if fmt not in self.file_formats:
            raise FakeStatementError(f"file format {fmt!r} not created")
        stage = os.path.join(self.stage_root, table)
        files = sorted(
            os.path.join(stage, f)
            for f in (os.listdir(stage) if os.path.isdir(stage) else [])
            if re.fullmatch(pattern, f)
        )
        if not files:
            raise FakeStatementError(
                f"MERGE pattern {pattern!r} matched nothing in @%{table}"
            )
        target_cols = [
            r[0] for r in self.con.execute(
                f"SELECT name FROM pragma_table_info('{table}')"
            ).fetchall()
        ]
        col_list = ", ".join(f'"{c}"' for c in target_cols)
        src = "SELECT * FROM read_csv_auto(" + repr(files) + ", header=true)"
        # a header-only staged file is legal (real Snowflake types it
        # from the FILE FORMAT; a 0-row MERGE is a no-op) but defeats
        # CSV sniffing here — skip the merge body instead of binding
        # all-VARCHAR columns against the typed target
        if not self.con.execute(f"SELECT count(*) FROM ({src})").fetchone()[0]:
            return
        # MERGE semantics as delete-then-insert: WHEN MATCHED UPDATE SET
        # <all cols> + WHEN NOT MATCHED INSERT <all cols> is row
        # replacement by key — identical final state
        self.con.execute(
            f"DELETE FROM {table} WHERE {key} IN (SELECT {key} FROM ({src}))"
        )
        self.con.execute(f"INSERT INTO {table} ({col_list}) {src}")

    def _copy_into(self, m: re.Match) -> None:
        """The reference's LOAD statement (snowflake_backend.py:152-157):
        insert of one staged file, PURGE removes it after. The pinned
        statement carries ON_ERROR=CONTINUE, and the fake honors it for
        real (VERDICT r8 task 5): the CSV is parsed against the TARGET
        table's column types (Snowflake casts to the target schema, not
        a sniffed one); rows that fail the parse/cast are skipped and
        the rest load. Each COPY appends a result row to
        ``load_reports`` shaped like Snowflake's COPY result set —
        where the real engine loses bad rows silently, the fake makes
        the loss assertable."""
        table, csv = m.group("table"), m.group("csv")
        path = os.path.join(self.stage_root, table, csv)
        if not os.path.exists(path):
            raise FakeStatementError(f"COPY INTO source not staged: {csv}")
        info = self.con.execute(
            f"SELECT name, type FROM pragma_table_info('{table}')"
        ).fetchall()
        col_list = ", ".join(f'"{n}"' for n, _ in info)
        colspec = ", ".join(f"'{n}': '{t}'" for n, t in info)
        # rows_parsed: physical records seen (all-varchar + null-padding
        # so count failures can't hide short rows; overlong rows are the
        # one class this undercounts, documented here)
        rows_parsed = self.con.execute(
            f"SELECT count(*) FROM read_csv('{path}', header=true, "
            f"all_varchar=true, null_padding=true, ignore_errors=true)"
        ).fetchone()[0]
        before = self.con.execute(
            f"SELECT count(*) FROM {table}"
        ).fetchone()[0]
        self.con.execute(
            f"INSERT INTO {table} ({col_list}) SELECT * FROM "
            f"read_csv('{path}', header=true, columns={{{colspec}}}, "
            f"ignore_errors=true)"
        )
        loaded = self.con.execute(
            f"SELECT count(*) FROM {table}"
        ).fetchone()[0] - before
        self.load_reports.append({
            "file": csv,
            "table": table,
            "rows_parsed": int(rows_parsed),
            "rows_loaded": int(loaded),
            "errors_seen": int(rows_parsed - loaded),
            "status": "LOADED" if loaded == rows_parsed
            else "PARTIALLY_LOADED",
        })
        os.remove(path)  # PURGE = TRUE

    def _remove(self, m: re.Match) -> None:
        table, pattern = m.group(1), m.group(2)
        stage = os.path.join(self.stage_root, table)
        if os.path.isdir(stage):
            for f in os.listdir(stage):
                if re.fullmatch(pattern, f):
                    os.remove(os.path.join(stage, f))

    @staticmethod
    def _split_cols(cols: str) -> list[str]:
        out, depth, cur = [], 0, []
        for ch in cols:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            if ch == "," and depth == 0:
                out.append("".join(cur).strip())
                cur = []
            else:
                cur.append(ch)
        if cur:
            out.append("".join(cur).strip())
        return out

    def table_rows(self, table: str) -> list[tuple]:
        return self.con.execute(f"SELECT * FROM {table} ORDER BY 1").fetchall()

    def staged_files(self, table: str) -> list[str]:
        stage = os.path.join(self.stage_root, table)
        return sorted(os.listdir(stage)) if os.path.isdir(stage) else []

    _HANDLERS = [
        (re.compile(r"USE SCHEMA (\w+)$", re.I), _use_schema),
        (
            re.compile(r"CREATE TABLE IF NOT EXISTS (\w+)\.(\w+) \((.*)\)$", re.I),
            _create_table,
        ),
        (
            re.compile(r"PUT file://(\S+) @(?:\w+)\.(?:\w+)\.%(\w+)$", re.I),
            _put,
        ),
        (
            re.compile(r"CREATE OR REPLACE FILE FORMAT (\w+) TYPE = 'csv' .*", re.I),
            _file_format,
        ),
        (
            re.compile(
                r"MERGE INTO (?:\w+)\.(?:\w+)\.(?P<table>\w+) USING "
                r"\(SELECT (?P<cols>.*?) FROM @%(?:\w+)\(FILE_FORMAT => "
                r"'(?P<fmt>\w+)', PATTERN => '(?P<pattern>[^']+)'\)\) csvsrc "
                r"ON csvsrc\.(?P<key>\w+) = (?:\w+)\.(?:\w+) "
                r"WHEN MATCHED THEN UPDATE SET .* "
                r"WHEN NOT MATCHED THEN INSERT .*",
                re.I,
            ),
            _merge,
        ),
        (
            re.compile(r"REMOVE @%(\w+) PATTERN = '([^']+)'$", re.I),
            _remove,
        ),
        (
            re.compile(
                r"COPY INTO (?:\w+)\.(?:\w+)\.(?P<table>\w+) FROM "
                r"@(?:\w+)\.(?:\w+)\.%(?:\w+)/(?P<csv>\S+) "
                r"FILE_FORMAT = \(type = csv [^)]*SKIP_HEADER=1\) "
                r"ON_ERROR=CONTINUE FORCE=TRUE PURGE = TRUE$",
                re.I,
            ),
            _copy_into,
        ),
    ]


class FakeClickHouse:
    """Accepts the ``clickhouse-client --query`` call shapes the
    reference ClickHouse backend issues (clickhouse_backend.py:99-173
    load, :245-270 upsert): CREATE ... ENGINE=MergeTree/StripeLog,
    INSERT ... FROM input('...') FORMAT CSVWithNames with CSV on stdin,
    ALTER TABLE ... DELETE WHERE, INSERT INTO ... SELECT, DROP TABLE.
    ``parseDateTimeBestEffortOrNull(col)`` in the INSERT's SELECT is
    honored as a real best-effort timestamp repair (TRY_CAST)."""

    _TYPE_MAP = {
        "String": "VARCHAR", "Int64": "BIGINT", "Int32": "INTEGER",
        "Float64": "DOUBLE", "Bool": "BOOLEAN",
        "DateTime64(3)": "TIMESTAMP", "DateTime": "TIMESTAMP",
    }

    def __init__(self, db_path: str | None = None) -> None:
        import duckdb  # lazy: test extra, see module docstring note

        self.con = duckdb.connect(db_path or ":memory:")
        self.executed: list[str] = []

    # -- the client surface: clickhouse-client --query=<sql> [stdin] ----
    def execute(self, sql: str, stdin: bytes | None = None) -> None:
        self.executed.append(sql)
        s = _one_line(sql)
        if re.match(r"DROP TABLE IF EXISTS (\w+)$", s, re.I):
            self.con.execute(s)
            return
        if re.match(r"DROP TABLE (\w+)$", s, re.I):
            self.con.execute(s)
            return
        m = re.match(
            r"CREATE TABLE IF NOT EXISTS (\w+) \((.*)\) ENGINE = .*$", s, re.I
        )
        if m:
            self._create_table(m.group(1), m.group(2))
            return
        m = re.match(
            r"INSERT INTO (\w+) SELECT (.*) FROM input\('(.*)'\) "
            r"FORMAT CSVWithNames SETTINGS .*$",
            s, re.I,
        )
        if m:
            self._insert_csv(m.group(1), m.group(2), m.group(3), stdin)
            return
        m = re.match(
            r"ALTER TABLE (\w+) DELETE WHERE (\w+) IN \(SELECT (\w+) from (\w+)\)$",
            s, re.I,
        )
        if m:
            self.con.execute(
                f"DELETE FROM {m.group(1)} WHERE {m.group(2)} IN "
                f"(SELECT {m.group(3)} FROM {m.group(4)})"
            )
            return
        m = re.match(r"INSERT INTO (\w+) SELECT \* FROM (\w+)$", s, re.I)
        if m:
            self.con.execute(s)
            return
        raise FakeStatementError(f"fake clickhouse cannot parse: {s[:200]}")

    def _map_type(self, ch_type: str) -> str:
        t = ch_type.strip()
        inner = re.fullmatch(r"Nullable\((.*)\)", t)
        if inner:
            t = inner.group(1)
        return self._TYPE_MAP.get(t, "VARCHAR")

    def _create_table(self, table: str, cols: str) -> None:
        ddl = []
        for col in FakeSnowflake._split_cols(cols):
            name, _, ctype = col.partition(" ")
            ddl.append(f"{name} {self._map_type(ctype)}")
        self.con.execute(f"CREATE TABLE IF NOT EXISTS {table} ({', '.join(ddl)})")

    def _insert_csv(
        self, table: str, select_cols: str, structure: str, stdin: bytes | None
    ) -> None:
        if stdin is None:
            raise FakeStatementError(
                f"INSERT ... FORMAT CSVWithNames into {table} needs CSV on stdin"
            )
        payload = gzip.decompress(stdin) if stdin[:2] == b"\x1f\x8b" else stdin
        fd, path = tempfile.mkstemp(prefix="fake_ch_", suffix=".csv")
        try:
            with os.fdopen(fd, "wb") as f:
                f.write(payload)
            exprs = []
            for item in FakeSnowflake._split_cols(select_cols):
                m = re.fullmatch(r"parseDateTimeBestEffortOrNull\((\w+)\)", item)
                if m:
                    exprs.append(f"TRY_CAST({m.group(1)} AS TIMESTAMP)")
                else:
                    exprs.append(item)
            # sniffed types (not all_varchar): empty fields become NULL
            # instead of '' (which would fail numeric casts on insert);
            # a column with unparseable dates sniffs VARCHAR, which is
            # exactly what the TRY_CAST repair expects
            self.con.execute(
                f"INSERT INTO {table} SELECT {', '.join(exprs)} FROM "
                f"read_csv_auto('{path}', header=true)"
            )
        finally:
            os.remove(path)

    def table_rows(self, table: str) -> list[tuple]:
        return self.con.execute(f"SELECT * FROM {table} ORDER BY 1").fetchall()


def run_snowflake_upsert(
    fake: FakeSnowflake,
    table: str,
    columns: dict[str, str],
    primary_key_cols: list[str],
    chunk_paths: list[str],
    database: str = "PGWAREHOUSE",
    sf_schema: str = "PUBLIC",
) -> None:
    """Drive the reference's A15 upsert end-to-end: emit the EXACT
    golden sequence per staged chunk (reference snowflake_backend.py:
    161-211 loops per file) and execute each statement on the fake."""
    from .dialects import reference_create_table_sql, reference_snowflake_merge_sql

    fake.execute(f"USE SCHEMA {sf_schema}")
    fake.execute(
        reference_create_table_sql(
            "snowflake", table, columns, primary_key_cols, sf_schema=sf_schema
        )
    )
    for path in chunk_paths:
        stmts = reference_snowflake_merge_sql(
            table,
            columns,
            primary_key_cols,
            os.path.basename(path),
            csv_path=path,
            database=database,
            sf_schema=sf_schema,
        )
        for stmt in stmts:
            fake.execute(stmt)


def run_snowflake_load(
    fake: FakeSnowflake,
    table: str,
    chunk_paths: list[str],
    database: str = "PGWAREHOUSE",
    sf_schema: str = "PUBLIC",
) -> None:
    """Drive the reference's initial/full LOAD end-to-end: the exact
    per-chunk PUT + COPY INTO … PURGE sequence (reference
    snowflake_backend.py:148-157) executed on the fake. Keyless by
    design — plain inserts, so chunk contents can never collide."""
    from .dialects import reference_snowflake_load_sql

    for path in chunk_paths:
        for stmt in reference_snowflake_load_sql(
            table, os.path.basename(path), csv_path=path,
            database=database, sf_schema=sf_schema,
        ):
            fake.execute(stmt)


def run_clickhouse_upsert(
    fake: FakeClickHouse,
    table: str,
    columns: dict[str, str],
    primary_key_cols: list[str],
    chunk_paths: list[str],
) -> None:
    """Drive the reference's A16 delete-then-insert upsert end-to-end:
    golden sequence (reference clickhouse_backend.py:245-270), CSV
    chunks piped on stdin of the INSERT exactly as clickhouse-client
    receives them (the reference pipes per chunk; the INSERT statement
    is one entry in the pinned sequence, repeated per chunk)."""
    from .dialects import reference_clickhouse_upsert_sql

    stmts = reference_clickhouse_upsert_sql(table, columns, primary_key_cols)
    drop_tmp, create_tmp, insert_tmp, alter_delete, insert_target, drop_end = stmts
    fake.execute(drop_tmp)
    fake.execute(create_tmp)
    for path in chunk_paths:
        with open(path, "rb") as f:
            fake.execute(insert_tmp, stdin=f.read())
    fake.execute(alter_delete)
    fake.execute(insert_target)
    fake.execute(drop_end)
