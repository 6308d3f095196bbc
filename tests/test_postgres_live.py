r"""Live Postgres end-to-end — the reference's literal topology
(VERDICT r5 task 1).

Boots an ephemeral Postgres cluster (initdb + pg_ctl on a tmpdir unix
socket, no TCP), seeds the reference's fixture SHAPES (pg_setup.sql:
serial-PK users10, BIGSERIAL+timestamp my_orders, no-PK enum +
quoted-"park state" local_parks — data generated here, not copied),
and runs the reference's three test scenarios
(tests/test_postgres.py:101-187) through PsqlCopySource → SyncEngine:

1. extract+load counts (test_extract_load / test_basic_sync)
2. incremental +2 rows   (test_incremental_sync)
3. last-modified upsert with value asserts (test_last_modified_sync)

plus uuid/enum/array/numeric(p,s) columns flowing through typemap from
live ``\d`` output. Skips (visibly) when the container lacks the
postgres server binaries.
"""

from __future__ import annotations

import glob
import gzip
import os
import shutil
import subprocess
import tempfile

import pytest
from pyspark.sql import types as T

from pgwarehouse_spark.catalog import TableSpec
from pgwarehouse_spark.sync.engine import SyncEngine
from pgwarehouse_spark.sync.psql import PsqlCopySource, parse_schema_text

INITDB = "/usr/local/bin/initdb"
PG_CTL = "/usr/local/bin/pg_ctl"
HAVE_PG = (
    os.path.exists(INITDB)
    and os.path.exists(PG_CTL)
    and shutil.which("psql") is not None
)

pytestmark = pytest.mark.skipif(
    not HAVE_PG, reason="postgres server binaries not present"
)


def _as_pg(argv: list[str]) -> list[str]:
    """postgres refuses to run as root; re-exec under the postgres OS
    user when we are root (the container's default)."""
    if os.geteuid() == 0:
        return ["runuser", "-u", "postgres", "--"] + argv
    return argv


SETUP_SQL = """
CREATE TABLE users10 (
    id serial primary key,
    name text,
    email VARCHAR,
    age integer
);
CREATE TABLE my_orders (
    id BIGSERIAL primary key,
    user_id integer,
    order_date date,
    order_amount float,
    order_updated timestamp without time zone
);
CREATE TYPE park_type AS ENUM ('urban', 'country', 'dog', 'kids');
CREATE TABLE local_parks (
    park_name text,
    park_type PARK_TYPE,
    park_size integer,
    park_location_lat float,
    park_location_lon float,
    "park state" VARCHAR
);
CREATE TABLE gadgets (
    id serial primary key,
    uid uuid,
    tags text[],
    nums integer[],
    doc jsonb,
    price numeric(12,4),
    active boolean,
    updated_at timestamptz
);

INSERT INTO users10 (name, email, age)
SELECT 'user ' || i, 'u' || i || '@example.com', 18 + (i * 7) % 60
FROM generate_series(1, 50) AS i;

INSERT INTO my_orders (user_id, order_date, order_amount, order_updated)
SELECT (i * 13) % 40,
       DATE '2022-01-01' + (i % 365),
       (i * 137.5)::float / 7,
       TIMESTAMP '2023-01-01 00:00:00' + (i || ' hours')::interval
FROM generate_series(1, 100) AS i;

INSERT INTO local_parks VALUES
  ('North Commons', 'urban',   2000,  44.98, -93.29, 'MN'),
  ('Dog Run Meadow', 'dog',     150,  40.78, -73.97, 'NY'),
  ('Prairie Reach', 'country', 8000,  41.88, -87.63, NULL),
  ('Tot Lot', 'kids',            12, -33.87, 151.21, 'AU');

INSERT INTO gadgets (uid, tags, nums, doc, price, active, updated_at)
SELECT md5(i::text)::uuid,
       ARRAY['tag' || i, 'shared', 'pg array'],
       ARRAY[i, i * 2, NULL]::integer[],
       json_build_object('k', i, 'note', 'a,b "quoted"')::jsonb,
       (i * 1000.1234)::numeric(12,4),
       i % 2 = 0,
       TIMESTAMPTZ '2024-06-01 12:00:00+00' + (i || ' days')::interval
FROM generate_series(1, 20) AS i;

-- full SURVEY §1.3 type matrix (VERDICT r6 task 6), incl. a
-- composite PK with a quoted mixed-case identifier
CREATE TABLE type_matrix (
    id integer NOT NULL,
    "Mixed Case" smallint NOT NULL,
    c_smallint smallint,
    c_real real,
    c_double double precision,
    c_numeric numeric(10,3),
    c_numeric_free numeric,
    c_char character(5),
    c_varchar varchar(20),
    c_date date,
    c_time time,
    c_timetz time with time zone,
    c_ts timestamp without time zone,
    c_tstz timestamptz,
    c_interval interval,
    c_bytea bytea,
    PRIMARY KEY (id, "Mixed Case")
);
INSERT INTO type_matrix VALUES
 (1, 7, 3, 1.5, 2.25, 123.456, 9.87654321,
  'abc', 'varchar val', DATE '2024-02-29', TIME '13:14:15',
  TIME WITH TIME ZONE '13:14:15+02', TIMESTAMP '2024-03-01 06:07:08',
  TIMESTAMPTZ '2024-03-01 06:07:08+00', INTERVAL '1 day 02:03:04',
  '\\x0102fe'::bytea),
 (2, 8, NULL, NULL, NULL, NULL, NULL,
  NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL, NULL);
"""


@pytest.fixture(scope="module")
def pg_server():
    base = tempfile.mkdtemp(prefix="pgw_live_")
    os.chmod(base, 0o777)  # postgres OS user must own/write pgdata + socket
    data = os.path.join(base, "pgdata")
    try:
        subprocess.run(
            _as_pg([INITDB, "-D", data, "-E", "UTF8", "--no-locale", "-A", "trust"]),
            check=True, capture_output=True, timeout=120,
        )
        subprocess.run(
            _as_pg([
                PG_CTL, "-D", data, "-l", os.path.join(base, "pg.log"),
                "-o", f"-c listen_addresses='' -c unix_socket_directories={base}",
                "-w", "start",
            ]),
            check=True, capture_output=True, timeout=60,
        )
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired) as exc:
        shutil.rmtree(base, ignore_errors=True)
        out = getattr(exc, "stderr", b"") or b""
        pytest.skip(f"could not boot ephemeral postgres: {out.decode()[:500]}")
    server = {"host": base, "user": "postgres", "dbname": "postgres"}
    _psql(server, "SET datestyle = 'ISO'; " + SETUP_SQL)
    yield server
    subprocess.run(
        _as_pg([PG_CTL, "-D", data, "-m", "immediate", "-w", "stop"]),
        capture_output=True, timeout=60,
    )
    shutil.rmtree(base, ignore_errors=True)


def _psql(server: dict, sql: str) -> str:
    proc = subprocess.run(
        ["psql", "--no-psqlrc", "--quiet", "-h", server["host"],
         "-U", server["user"], "-d", server["dbname"],
         "-v", "ON_ERROR_STOP=1", "-c", sql],
        capture_output=True, text=True, timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    return proc.stdout


def _count(server: dict, table: str) -> int:
    out = subprocess.run(
        ["psql", "--no-psqlrc", "-h", server["host"], "-U", server["user"],
         "-d", server["dbname"], "--tuples-only", "--pset=format=unaligned",
         "-c", f"select count(*) from {table}"],
        capture_output=True, text=True, timeout=120,
    )
    return int(out.stdout.strip())


@pytest.fixture()
def source(pg_server, tmp_path) -> PsqlCopySource:
    return PsqlCopySource(
        str(tmp_path / "staging"),
        host=pg_server["host"],
        user=pg_server["user"],
        dbname=pg_server["dbname"],
    )


@pytest.fixture()
def engine(spark, source, tmp_path) -> SyncEngine:
    return SyncEngine(spark, source, str(tmp_path / "wh"), num_buckets=4)


# ---- schema scrape + parse against the live server ----


def test_live_schema_scrape_and_parse(source):
    info = source.schema_info("users10")
    assert list(info["columns"]) == ["id", "name", "email", "age"]
    assert info["columns"]["id"] == "integer"
    assert info["primary_key_cols"] == ["id"]

    parks = source.schema_info("local_parks")
    assert "park state" in parks["columns"]  # quoted name, raw spelling
    assert parks["columns"]["park_type"] == "park_type"  # enum typename
    assert parks["primary_key_cols"] == []  # no PK → reload-only table

    g = source.schema_info("gadgets")
    assert g["columns"]["uid"] == "uuid"
    assert g["columns"]["tags"] == "text[]"
    assert g["columns"]["nums"] == "integer[]"
    assert g["columns"]["price"] == "numeric(12,4)"


def test_live_spark_schema_types(source):
    schema = source.spark_schema("gadgets")
    assert schema["id"].dataType == T.IntegerType()
    assert schema["id"].nullable is False  # PK
    assert schema["uid"].dataType == T.StringType()
    assert schema["tags"].dataType == T.ArrayType(T.StringType())
    assert schema["nums"].dataType == T.ArrayType(T.IntegerType())
    assert schema["doc"].dataType == T.StringType()
    # declared numeric(12,4) honored from live \d output (ADVICE r5)
    assert schema["price"].dataType == T.DecimalType(12, 4)
    assert schema["active"].dataType == T.BooleanType()
    assert schema["updated_at"].dataType == T.TimestampType()


def test_live_discovery(source):
    assert source.discover_primary_key(None, "users10") == ["id"]
    assert source.discover_primary_key(None, "local_parks") == []
    assert source.discover_watermark(None, "gadgets") == "updated_at"
    assert source.discover_watermark(None, "users10") is None
    assert source.exists(None, "my_orders")
    assert not source.exists(None, "nonexistent")
    assert set(source.list_tables()) == {
        "users10", "my_orders", "local_parks", "gadgets", "type_matrix"
    }


# ---- extract: chunked gzip staging + where pushdown ----


def test_live_extract_chunked_staging(pg_server, tmp_path):
    src = PsqlCopySource(
        str(tmp_path / "st"), host=pg_server["host"],
        user=pg_server["user"], dbname=pg_server["dbname"],
        chunk_bytes=512,  # force rotation on 50 small rows
    )
    files, rows = src.extract_to_staging("users10")
    assert rows == 50 and files > 1
    chunks = sorted(glob.glob(str(tmp_path / "st" / "users10_data" / "*.csv.gz")))
    assert len(chunks) == files
    # every chunk independently schema-complete (header repeated)
    for c in chunks:
        with gzip.open(c, "rt") as f:
            assert f.readline().strip() == "id,name,email,age"
    # the .schema file sits next to the staging dir, reference layout
    assert os.path.exists(str(tmp_path / "st" / "users10.schema"))


def test_live_where_pushdown_filters_at_source(source, spark):
    # the predicate executes inside \copy's SELECT: the staged CSV
    # already contains only matching rows (A12 — reference semantics)
    df = source.read(spark, "users10", where="id > 40")
    assert df.count() == 10
    staged = spark.read.option("header", "true").csv(
        source._staging("users10")
    )
    assert staged.count() == 10


def test_live_zero_row_extract_keeps_schema(source, spark):
    df = source.read(spark, "users10", where="id > 999999")
    assert df.count() == 0
    assert df.columns == ["id", "name", "email", "age"]


# ---- reference scenario 1: extract + load counts ----


def test_live_extract_load_counts(pg_server, engine):
    """reference test_extract_load + test_basic_sync
    (test_postgres.py:101-130): every fixture table syncs and the
    warehouse count matches the live table count."""
    for table in ["local_parks", "users10", "my_orders", "gadgets"]:
        res = engine.sync(table)
        assert res.action == "created", table
        assert engine.count_table(table) == _count(pg_server, table), table
    # no-PK table discovered as reload-only (reference README.md:175-177)
    assert engine.spec("local_parks").strategy == "reload"
    assert engine.spec("users10").strategy == "append"


# ---- reference scenario 2: incremental +2 rows ----


def test_live_incremental_sync(pg_server, engine):
    """reference test_incremental_sync (test_postgres.py:131-151):
    initial sync, two inserts on the live server, re-sync appends
    exactly the delta — the watermark predicate runs inside \\copy."""
    table = "users10"
    assert engine.sync(table).action == "created"
    orig = _count(pg_server, table)
    assert engine.count_table(table) == orig

    # zero-delta short-circuit (A13)
    assert engine.sync(table).action == "noop"

    _psql(pg_server, (
        f"insert into {table} (name,email,age) values"
        " ('new person a','a@example.com', 55),"
        " ('new person b','b@example.com', 45)"
    ))
    assert _count(pg_server, table) == orig + 2

    res = engine.sync(table)
    assert res.action == "appended" and res.rows == 2
    assert engine.count_table(table) == orig + 2


# ---- reference scenario 3: last-modified upsert with value asserts ----


def test_live_last_modified_upsert(pg_server, spark, source, tmp_path):
    """reference test_last_modified_sync (test_postgres.py:154-187):
    update two rows + insert one on the live server, upsert re-sync
    lands all three (count +1, updated values visible)."""
    table = "my_orders"
    engine = SyncEngine(
        spark, source, str(tmp_path / "wh2"),
        specs={table: TableSpec(table, ["id"], last_modified="order_updated")},
        num_buckets=4,
    )
    assert engine.sync(table).action == "created"
    orig = _count(pg_server, table)
    assert engine.count_table(table) == orig

    before = {
        r["id"]: r["order_amount"]
        for r in engine.query_table(table, ["id", "order_amount"], "id in (18,19)").collect()
    }
    assert int(before[18]) != 18 and int(before[19]) != 19

    _psql(pg_server, (
        f"update {table} set order_updated = now(), order_amount = 18 where id = 18;"
        f"update {table} set order_updated = now(), order_amount = 19 where id = 19;"
        f"insert into {table} (user_id, order_date, order_amount, order_updated)"
        " values (7, '2024-01-01', 9999.9, now());"
    ))

    res = engine.sync(table)
    assert res.action == "merged"
    assert engine.count_table(table) == orig + 1

    after = {
        r["id"]: r["order_amount"]
        for r in engine.query_table(table, ["id", "order_amount"], "id in (18,19)").collect()
    }
    assert int(after[18]) == 18 and int(after[19]) == 19
    assert (
        engine.query_table(table, ["id"], "order_amount = 9999.9").count() == 1
    )


# ---- pg-typed values through the live pipeline ----


def test_live_pg_typed_values_roundtrip(pg_server, spark, source):
    df = source.read(spark, "gadgets")
    rows = {r["id"]: r for r in df.collect()}
    assert len(rows) == 20
    r1 = rows[1]
    # uuid text form (md5('1') formatted 8-4-4-4-12)
    assert len(r1["uid"]) == 36 and r1["uid"].count("-") == 4
    # arrays parsed into real Spark arrays, NULL element preserved,
    # quoted element with a space survives
    assert r1["tags"] == ["tag1", "shared", "pg array"]
    assert r1["nums"] == [1, 2, None]
    # jsonb string with embedded comma + doubled quotes survives CSV
    assert '"note": "a,b \\"quoted\\""' in r1["doc"] or "a,b" in r1["doc"]
    # declared decimal keeps scale
    from decimal import Decimal

    assert r1["price"] == Decimal("1000.1234")
    # pg t/f booleans repaired to real booleans
    assert r1["active"] is False and rows[2]["active"] is True
    assert r1["updated_at"] is not None


# ---- \d parser unit coverage (no server needed) ----


def test_parse_schema_text_canned():
    text = (
        'Table "public.local_parks"\n'
        "Column|Type|Collation|Nullable|Default\n"
        "park_name|text|||\n"
        "park_type|park_type|||\n"
        "park size|integer|||\n"
        "park state|character varying|||\n"
    )
    info = parse_schema_text(text, "local_parks")
    assert list(info["columns"]) == [
        "park_name", "park_type", "park size", "park state"
    ]
    assert info["primary_key_cols"] == []


def test_parse_schema_text_composite_pk_and_quoted():
    text = (
        'Table "public.t"\n'
        "Column|Type|Collation|Nullable|Default\n"
        "id|bigint||not null|\n"
        "ts|timestamp without time zone||not null|\n"
        "v|text|||\n"
        "Indexes:\n"
        '    "t_pkey" PRIMARY KEY, btree (id, "ts")\n'
        '    "t_v_idx" btree (v)\n'
    )
    info = parse_schema_text(text, "t")
    assert info["primary_key_cols"] == ["id", "ts"]
    assert info["columns"]["ts"] == "timestamp without time zone"


def test_live_list_tables_with_sizes(pg_server, source):
    """reference `list` command (pgwarehouse.py:218-237): source catalog
    with byte sizes + row estimates from pg_class, largest first."""
    _psql(pg_server, "ANALYZE")  # populate reltuples estimates
    rows = source.list_tables_with_sizes()
    by_name = {r["table"]: r for r in rows}
    assert set(by_name) >= {"users10", "my_orders", "local_parks", "gadgets"}
    assert all(r["schema"] == "public" for r in rows)
    assert all(r["total_bytes"] > 0 for r in rows)
    # row estimates track the true counts after ANALYZE
    assert by_name["local_parks"]["row_estimate"] == 4
    assert by_name["my_orders"]["row_estimate"] >= 100
    # sorted largest-first like the reference's output
    sizes = [r["total_bytes"] for r in rows]
    assert sizes == sorted(sizes, reverse=True)


def test_make_source_psql_no_server_needed(tmp_path, monkeypatch):
    """Config wiring: `source: {type: psql}` builds a PsqlCopySource with
    env-var fallbacks (reference pgwarehouse.py:200-210 config shape)."""
    from pgwarehouse_spark.sync.engine import make_source

    monkeypatch.setenv("PGHOST", "/tmp/sock")
    monkeypatch.setenv("PGDATABASE", "app")
    monkeypatch.setenv("PGUSER", "svc")
    src = make_source({"type": "psql", "staging_dir": str(tmp_path)})
    assert isinstance(src, PsqlCopySource)
    assert src.host == "/tmp/sock" and src.dbname == "app" and src.user == "svc"
    assert src.pgschema == "public"
    # explicit config wins over env
    src2 = make_source({
        "type": "postgres", "staging_dir": str(tmp_path),
        "host": "db1", "dbname": "x", "user": "u", "pgschema": "audit",
    })
    assert src2.host == "db1" and src2.pgschema == "audit"


def test_live_reserved_word_table_syncs(pg_server, spark, tmp_path):
    """A pg table literally named `order` (reserved word) must scrape,
    extract, and sync — the psql sibling of the Derby reserved-word
    JDBC test (VERDICT r5 item 6): every psql-issued statement quotes
    the identifier, since unquoted `order` is a syntax error."""
    _psql(pg_server, (
        'DROP TABLE IF EXISTS "order";'
        'CREATE TABLE "order" (id serial primary key, v text);'
        "INSERT INTO \"order\" (v) SELECT 'v' || i FROM generate_series(1, 7) i;"
    ))
    src = PsqlCopySource(
        str(tmp_path / "st"), host=pg_server["host"],
        user=pg_server["user"], dbname=pg_server["dbname"],
    )
    info = src.schema_info("order")
    assert list(info["columns"]) == ["id", "v"]
    assert info["primary_key_cols"] == ["id"]
    eng = SyncEngine(spark, src, str(tmp_path / "wh"), num_buckets=2)
    assert eng.sync("order").action == "created"
    assert eng.count_table("order") == 7
    # incremental with the watermark predicate inside the quoted \copy
    _psql(pg_server, "INSERT INTO \"order\" (v) VALUES ('late')")
    res = eng.sync("order")
    assert res.action == "appended" and res.rows == 1
    _psql(pg_server, 'DROP TABLE "order"')


def test_live_schema_evolution_resync(pg_server, spark, tmp_path):
    """Source grows a column mid-history (the drift that breaks the
    reference's CSV load): ALTER TABLE ADD COLUMN on the live server,
    then an incremental re-sync — new column flows through, old rows
    read as null via mergeSchema (_reconcile_schema policy)."""
    _psql(pg_server, (
        "DROP TABLE IF EXISTS evolving;"
        "CREATE TABLE evolving (id serial primary key, v text);"
        "INSERT INTO evolving (v) SELECT 'v' || i FROM generate_series(1, 5) i;"
    ))
    src = PsqlCopySource(
        str(tmp_path / "st"), host=pg_server["host"],
        user=pg_server["user"], dbname=pg_server["dbname"],
    )
    eng = SyncEngine(spark, src, str(tmp_path / "wh"), num_buckets=2)
    assert eng.sync("evolving").action == "created"
    _psql(pg_server, (
        "ALTER TABLE evolving ADD COLUMN score integer;"
        "INSERT INTO evolving (v, score) VALUES ('new', 42);"
    ))
    src.schema_info("evolving", refresh=True)  # re-scrape sees the column
    res = eng.sync("evolving")
    assert res.action == "appended" and res.rows == 1
    out = eng.read_table("evolving")
    assert "score" in out.columns
    rows = {r["id"]: r["score"] for r in out.collect()}
    assert rows[6] == 42
    assert all(rows[i] is None for i in range(1, 6))  # old rows: null
    _psql(pg_server, "DROP TABLE evolving")


def test_live_embedded_newlines_and_empty_strings(pg_server, spark, tmp_path):
    """CSV fidelity edges (r6 review findings): quoted values carrying
    embedded newlines must survive chunk rotation (records, not physical
    lines, are the chunk unit) and the multiLine read; pg distinguishes
    NULL from the empty string and so must the loaded frame."""
    _psql(pg_server, (
        "DROP TABLE IF EXISTS tricky;"
        "CREATE TABLE tricky (id serial primary key, v text);"
        "INSERT INTO tricky (v) VALUES"
        "  (E'line1\\nline2\\nline3'),"   # embedded newlines
        "  (''),"                          # empty string (NOT null)
        "  (NULL),"
        "  (E'quote \" comma, and\\nnewline'),"
        "  ('plain');"
        "INSERT INTO tricky (v) SELECT E'bulk\\n' || i FROM generate_series(6, 40) i;"
    ))
    src = PsqlCopySource(
        str(tmp_path / "st"), host=pg_server["host"],
        user=pg_server["user"], dbname=pg_server["dbname"],
        chunk_bytes=64,  # rotate aggressively: every record boundary
    )
    files, rows = src.extract_to_staging("tricky")
    assert rows == 40 and files > 5  # rotation really happened
    df = src.read(spark, "tricky")
    got = {r["id"]: r["v"] for r in df.collect()}
    assert len(got) == 40
    assert got[1] == "line1\nline2\nline3"
    assert got[2] == ""          # empty string preserved, NOT null
    assert got[3] is None        # NULL preserved, NOT ''
    assert got[4] == 'quote " comma, and\nnewline'
    assert got[5] == "plain"
    assert got[40] == "bulk\n40"
    _psql(pg_server, "DROP TABLE tricky")


# ---- full SURVEY §1.3 type matrix, live from real `\d` output ----
# (VERDICT r6 task 6: mirrors tests/test_jdbc_pg_types.py but the type
# names come from a real server's psql scrape, and the values ride the
# actual \copy → CSV → cast-on-load pipeline end-to-end.)

_TYPE_MATRIX_EXPECTED = [
    # (column as the SOURCE reports it — raw spelling; the engine
    # sanitizes at warehouse-load time, covered by
    # test_live_reserved_word_table_syncs — `\d` type name, Spark
    # type, nullable)
    ("id", "integer", T.IntegerType(), False),
    ("Mixed Case", "smallint", T.ShortType(), False),
    ("c_smallint", "smallint", T.ShortType(), True),
    ("c_real", "real", T.FloatType(), True),
    ("c_double", "double precision", T.DoubleType(), True),
    ("c_numeric", "numeric(10,3)", T.DecimalType(10, 3), True),
    ("c_numeric_free", "numeric", T.DecimalType(38, 18), True),
    ("c_char", "character(5)", T.StringType(), True),
    ("c_varchar", "character varying(20)", T.StringType(), True),
    ("c_date", "date", T.DateType(), True),
    ("c_time", "time without time zone", T.StringType(), True),
    ("c_timetz", "time with time zone", T.StringType(), True),
    ("c_ts", "timestamp without time zone", T.TimestampType(), True),
    ("c_tstz", "timestamp with time zone", T.TimestampType(), True),
    ("c_interval", "interval", T.StringType(), True),
    ("c_bytea", "bytea", T.BinaryType(), True),
]


@pytest.mark.parametrize(
    "col,pg_name,spark_type,nullable",
    _TYPE_MATRIX_EXPECTED,
    ids=[c for c, *_ in _TYPE_MATRIX_EXPECTED],
)
def test_live_type_matrix_schema(source, col, pg_name, spark_type, nullable):
    """Every §1.3 type's `\\d` spelling and typemap translation, from a
    real server (composite quoted-identifier PK drives the two
    nullable=False rows)."""
    info = source.schema_info("type_matrix")
    assert info["columns"][col] == pg_name
    schema = source.spark_schema("type_matrix")
    assert schema[col].dataType == spark_type, col
    assert schema[col].nullable is nullable, col
    assert info["primary_key_cols"] == ["id", "Mixed Case"]


def test_live_type_matrix_values_roundtrip(pg_server, spark, source):
    """The matrix's VALUES through the live \\copy → gzip CSV →
    cast-on-load pipeline: typed fidelity plus NULL propagation."""
    from datetime import date, datetime
    from decimal import Decimal

    rows = {r["id"]: r for r in source.read(spark, "type_matrix").collect()}
    assert len(rows) == 2
    r = rows[1]
    assert r["Mixed Case"] == 7 and r["c_smallint"] == 3
    assert r["c_real"] == 1.5 and r["c_double"] == 2.25
    assert r["c_numeric"] == Decimal("123.456")
    assert r["c_numeric_free"] == Decimal("9.87654321")
    assert r["c_char"].rstrip() == "abc"  # char(5) space padding
    assert r["c_varchar"] == "varchar val"
    assert r["c_date"] == date(2024, 2, 29)
    assert r["c_time"] == "13:14:15"
    assert r["c_timetz"] == "13:14:15+02"
    assert r["c_ts"] == datetime(2024, 3, 1, 6, 7, 8)
    # session + server are both UTC, so tstz round-trips to the same
    # wall-clock instant as the naive timestamp
    assert r["c_tstz"] == r["c_ts"]
    assert r["c_interval"] == "1 day 02:03:04"
    assert bytes(r["c_bytea"]) == b"\x01\x02\xfe"
    n = rows[2]
    for c, *_ in _TYPE_MATRIX_EXPECTED:
        if c in ("id", "Mixed Case"):
            continue
        assert n[c] is None, f"{c} should be NULL"


# ---- snapshot-consistent multi-table sync (VERDICT r7 task 5) ----

FK_SETUP = """
CREATE TABLE fk_parent (id serial primary key, name text);
CREATE TABLE fk_child  (id serial primary key,
                        parent_id integer NOT NULL REFERENCES fk_parent(id),
                        note text);
INSERT INTO fk_parent (name) SELECT 'p' || i FROM generate_series(1, 5) i;
INSERT INTO fk_child (parent_id, note)
SELECT 1 + (i % 5), 'c' || i FROM generate_series(1, 10) i;
"""

FK_TEARDOWN = "DROP TABLE IF EXISTS fk_child; DROP TABLE IF EXISTS fk_parent;"

# one INSERT statement so parent+child commit atomically: the live
# writer we simulate is itself transactional — the inconsistency under
# test comes from the SYNC reading tables at different times, not from
# a torn source write
FK_MUTATE = """
WITH p AS (INSERT INTO fk_parent (name) VALUES ('late parent') RETURNING id)
INSERT INTO fk_child (parent_id, note) SELECT id, 'late child' FROM p;
"""


def _fk_engine(spark, pg_server, tmp_path, tag):
    src = PsqlCopySource(
        str(tmp_path / f"staging_{tag}"),
        host=pg_server["host"],
        user=pg_server["user"],
        dbname=pg_server["dbname"],
    )
    eng = SyncEngine(
        spark,
        src,
        str(tmp_path / f"wh_{tag}"),
        specs={
            "fk_parent": TableSpec("fk_parent", ["id"]),
            "fk_child": TableSpec("fk_child", ["id"]),
        },
        num_buckets=4,
    )
    return src, eng


def _mutate_after_first_sync(eng, pg_server):
    """Simulate a live writer committing between the per-table extracts
    of `sync all` — the exact window the reference's one-table-at-a-time
    loop (reference pgwarehouse.py:96-110) leaves open."""
    orig, fired = eng.sync, {"done": False}

    def wrapped(table, today=None):
        res = orig(table, today=today)
        if not fired["done"]:
            fired["done"] = True
            _psql(pg_server, FK_MUTATE)
        return res

    eng.sync = wrapped
    return fired


def test_live_discover_foreign_keys(pg_server, spark, tmp_path):
    _psql(pg_server, FK_SETUP)
    try:
        src, _ = _fk_engine(spark, pg_server, tmp_path, "disc")
        edges = [e for e in src.discover_foreign_keys()
                 if e["child"] == "fk_child"]
        assert edges == [{
            "child": "fk_child", "child_cols": ["parent_id"],
            "parent": "fk_parent", "parent_cols": ["id"],
        }]
    finally:
        _psql(pg_server, FK_TEARDOWN)


def test_live_naive_sync_all_is_inconsistent_under_writes(
    pg_server, spark, tmp_path
):
    """Control: WITHOUT a snapshot, a parent+child pair committed
    between the parent and child extracts leaves the warehouse child
    citing a parent the warehouse never saw — a real FK orphan."""
    _psql(pg_server, FK_SETUP)
    try:
        src, eng = _fk_engine(spark, pg_server, tmp_path, "naive")
        _mutate_after_first_sync(eng, pg_server)
        results = eng.sync_all(audit_fk=True)
        by_table = {r.table: r for r in results}
        assert by_table["fk_parent"].rows == 5   # pre-mutation view
        assert by_table["fk_child"].rows == 11   # post-mutation view
        assert by_table["fk_child->fk_parent"].action == "fk_orphans"
        assert by_table["fk_child->fk_parent"].rows == 1  # the torn pair
    finally:
        _psql(pg_server, FK_TEARDOWN)


def test_live_consistent_sync_all_survives_writes(pg_server, spark, tmp_path):
    """With consistent=True the identical mid-sync commit is invisible
    to BOTH extracts: one exported REPEATABLE READ snapshot spans every
    per-table \\copy session, so the warehouse pair is mutually
    consistent (0 orphans) and reflects one point in time."""
    _psql(pg_server, FK_SETUP)
    try:
        src, eng = _fk_engine(spark, pg_server, tmp_path, "snap")
        fired = _mutate_after_first_sync(eng, pg_server)
        results = eng.sync_all(consistent=True, audit_fk=True)
        assert fired["done"], "mutation hook never fired"
        by_table = {r.table: r for r in results}
        assert by_table["fk_parent"].rows == 5
        assert by_table["fk_child"].rows == 10  # snapshot predates commit
        assert by_table["fk_child->fk_parent"].rows == 0
        # the source really did change — the snapshot is what hid it
        assert _count(pg_server, "fk_child") == 11
        # snapshot released on exit: a fresh sync sees the new rows
        assert src._snapshot_id is None
    finally:
        _psql(pg_server, FK_TEARDOWN)


def test_live_consistent_parallel_sync_all(pg_server, spark, tmp_path):
    """parallel=2 + consistent=True compose: worker threads share the
    one exported snapshot id, so concurrent per-table \\copy sessions
    still read a single MVCC view."""
    _psql(pg_server, FK_SETUP)
    try:
        src, eng = _fk_engine(spark, pg_server, tmp_path, "par")
        with src.snapshot():
            _psql(pg_server, FK_MUTATE)  # committed after export
            results = eng.sync_all(parallel=2)
        by_table = {r.table: r for r in results}
        assert by_table["fk_parent"].rows == 5
        assert by_table["fk_child"].rows == 10
        assert eng.audit_fk_orphans()[0]["n_orphans"] == 0
    finally:
        _psql(pg_server, FK_TEARDOWN)


def test_live_snapshot_covers_schema_scrape_too(pg_server, spark, tmp_path):
    """DDL committed mid-sync must not desync the scraped schema from
    the \\copy data: inside a snapshot window the `\\d` scrape imports
    the same snapshot (catalogs are MVCC), so both describe one point
    in time — the extract parses with the matching column set even
    though the live table now has an extra column."""
    _psql(pg_server, FK_SETUP)
    try:
        src, eng = _fk_engine(spark, pg_server, tmp_path, "ddl")
        with src.snapshot():
            before = list(src.schema_info("fk_parent", refresh=True)["columns"])
            _psql(pg_server, "ALTER TABLE fk_parent ADD COLUMN extra text "
                             "DEFAULT 'x'")
            # scrape re-run INSIDE the window: still the old schema
            after = list(src.schema_info("fk_parent", refresh=True)["columns"])
            assert after == before == ["id", "name"]
            res = eng.sync("fk_parent")
            assert res.action == "created" and res.rows == 5
            assert eng.read_table("fk_parent").columns == ["id", "name"]
        # window closed: the new column is visible again
        assert list(src.schema_info("fk_parent", refresh=True)["columns"]) == [
            "id", "name", "extra",
        ]
    finally:
        _psql(pg_server, FK_TEARDOWN)
