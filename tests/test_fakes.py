"""Wire-protocol fakes end-to-end (VERDICT r7 task 8): the EXACT golden
statement sequences the dialect tests pin (tests/test_dialects.py) are
now also EXECUTED, against in-process fakes that accept only those
shapes, and the assertions are on final warehouse contents — the
reference's A15 (Snowflake PUT→MERGE→REMOVE) and A16 (ClickHouse
delete-then-insert with best-effort date repair) paths run end-to-end
without the engines' binaries."""

from __future__ import annotations

import gzip
import os

import pytest

from pgwarehouse_spark.sync.fakes import (
    FakeClickHouse,
    FakeSnowflake,
    FakeStatementError,
    run_clickhouse_upsert,
    run_snowflake_upsert,
)

COLUMNS = {
    "id": "bigint",
    "name": "text",
    "amount": "double precision",
    "updated": "timestamp without time zone",
}


def _chunk(tmp_path, name: str, rows: list[str]) -> str:
    """One staged gzip CSV chunk, shaped like PsqlCopySource staging
    output (header + records, gzip, <table>{i}0.csv.gz naming)."""
    path = str(tmp_path / name)
    with gzip.open(path, "wt") as f:
        f.write("id,name,amount,updated\n")
        for r in rows:
            f.write(r + "\n")
    return path


@pytest.fixture()
def sf():
    fake = FakeSnowflake()
    yield fake
    fake.close()


def test_snowflake_sequence_end_to_end_upsert(sf, tmp_path):
    c1 = _chunk(tmp_path, "t10.csv.gz", [
        "1,alpha,10.5,2024-01-01 00:00:00",
        "2,beta,20.0,2024-01-02 00:00:00",
    ])
    run_snowflake_upsert(sf, "t", COLUMNS, ["id"], [c1])
    assert [r[:2] for r in sf.table_rows("t")] == [(1, "alpha"), (2, "beta")]
    # second sequence: update row 2, insert row 3 — MERGE semantics
    c2 = _chunk(tmp_path, "t20.csv.gz", [
        "2,beta2,99.0,2024-02-01 00:00:00",
        "3,gamma,30.0,2024-02-02 00:00:00",
    ])
    run_snowflake_upsert(sf, "t", COLUMNS, ["id"], [c2])
    rows = sf.table_rows("t")
    assert [r[:2] for r in rows] == [(1, "alpha"), (2, "beta2"), (3, "gamma")]
    assert rows[1][2] == 99.0
    # REMOVE ran: the stage is empty again after each sequence
    assert sf.staged_files("t") == []
    # and the fake was driven by the pinned golden statements verbatim
    from pgwarehouse_spark.sync.dialects import reference_snowflake_merge_sql

    golden = reference_snowflake_merge_sql(
        "t", COLUMNS, ["id"], "t20.csv.gz", csv_path=c2
    )
    assert sf.executed[-4:] == golden[1:]  # PUT..REMOVE (USE SCHEMA is 1st)


def test_snowflake_fake_rejects_unpinned_statements(sf):
    with pytest.raises(FakeStatementError):
        sf.execute("TRUNCATE TABLE t")
    with pytest.raises(FakeStatementError):
        # MERGE with no staged files must fail loudly, not no-op
        sf.execute("USE SCHEMA PUBLIC") or sf.execute(
            "CREATE TABLE IF NOT EXISTS PUBLIC.t (id BIGINT)"
        )
        sf.execute(
            "MERGE INTO PGWAREHOUSE.PUBLIC.t USING (SELECT id FROM @%t("
            "FILE_FORMAT => 'pgw_csv_format', PATTERN => 'none.csv.gz')) csvsrc "
            "ON csvsrc.id = t.id WHEN MATCHED THEN UPDATE SET t.id = csvsrc.id "
            "WHEN NOT MATCHED THEN INSERT (id) VALUES (csvsrc.id)"
        )


def test_clickhouse_sequence_end_to_end_upsert(tmp_path):
    fake = FakeClickHouse()
    # target table exists with prior rows (the reference's upsert runs
    # against an existing table; create via the pinned CREATE shape)
    from pgwarehouse_spark.sync.dialects import reference_create_table_sql

    fake.execute(reference_create_table_sql("clickhouse", "t", COLUMNS, ["id"]))
    seed = _chunk(tmp_path, "t00.csv.gz", [
        "1,alpha,10.5,2024-01-01 00:00:00",
        "2,beta,20.0,2024-01-02 00:00:00",
    ])
    run_clickhouse_upsert(fake, "t", COLUMNS, ["id"], [seed])
    # delta: update 2, insert 3; timestamp arrives as CSV text and is
    # repaired by parseDateTimeBestEffortOrNull -> real TIMESTAMP
    delta = _chunk(tmp_path, "t10.csv.gz", [
        "2,beta2,99.0,2024-02-01 08:30:00",
        "3,gamma,30.0,not-a-date",
    ])
    run_clickhouse_upsert(fake, "t", COLUMNS, ["id"], [delta])
    rows = fake.table_rows("t")
    assert [r[:2] for r in rows] == [(1, "alpha"), (2, "beta2"), (3, "gamma")]
    import datetime as dt

    assert rows[1][3] == dt.datetime(2024, 2, 1, 8, 30)
    assert rows[2][3] is None  # best-effort repair: unparseable -> NULL
    # temp table dropped by the sequence's final DROP
    assert fake.con.execute(
        "SELECT count(*) FROM duckdb_tables() WHERE table_name='t__changes'"
    ).fetchone()[0] == 0


def test_clickhouse_fake_rejects_unpinned_statements():
    fake = FakeClickHouse()
    with pytest.raises(FakeStatementError):
        fake.execute("OPTIMIZE TABLE t FINAL")
    with pytest.raises(FakeStatementError):
        # the piped-CSV INSERT without its stdin payload is malformed use
        fake.execute(
            "INSERT INTO t SELECT id FROM input('id Int64') "
            "FORMAT CSVWithNames SETTINGS date_time_input_format='best_effort';"
        )


def test_clickhouse_no_pk_refuses_like_reference():
    """reference clickhouse_backend.py:246 raises without a PK; the
    golden generator preserves that, so the driver surfaces it too."""
    fake = FakeClickHouse()
    with pytest.raises(ValueError, match="primary key"):
        run_clickhouse_upsert(fake, "t", COLUMNS, [], [])


# ---- FakeWarehouseSyncEngine: reference dispatch over the fakes ----


def _fake_engine(spark, sf_dir, tmp_path, backend):
    import os as _os

    from pyspark.sql import functions as F

    from pgwarehouse_spark.catalog import TableSpec
    from pgwarehouse_spark.sync.engine import ParquetSource
    from pgwarehouse_spark.sync.fake_engine import FakeWarehouseSyncEngine

    src_dir = str(tmp_path / f"src_{backend}")
    _os.makedirs(src_dir)
    orders = (
        spark.read.parquet(_os.path.join(sf_dir, "orders.parquet"))
        .filter(F.col("o_orderkey") <= 1000)
    )
    orders.write.mode("overwrite").parquet(_os.path.join(src_dir, "orders.parquet"))
    eng = FakeWarehouseSyncEngine(
        spark,
        ParquetSource(src_dir),
        backend,
        specs={"orders": TableSpec("orders", ["o_orderkey"],
                                   last_modified="o_orderdate")},
        staging_dir=str(tmp_path / f"staging_{backend}"),
    )
    return eng, orders, src_dir


@pytest.mark.parametrize("backend", ["snowflake", "clickhouse"])
def test_fake_engine_full_dispatch_roundtrip(spark, sf_dir, tmp_path, backend):
    """create -> merged(last-modified upsert) -> noop against the fake
    warehouse, asserting CONTENTS in the warehouse after each step —
    the reference's A15/A16 dataflow end-to-end in-process."""
    import datetime as dt
    import os as _os

    from pyspark.sql import functions as F

    eng, orders, src_dir = _fake_engine(spark, sf_dir, tmp_path, backend)
    n0 = orders.count()
    res = eng.sync("orders")
    assert res.action == "created" and res.rows == n0
    assert eng.count_table("orders") == n0
    assert eng.list_warehouse_tables() == ["orders"]

    # upsert: bump two rows' price at a future watermark + insert one
    future = dt.datetime(2005, 1, 1)
    updated = (
        orders.filter(F.col("o_orderkey").isin(7, 32))
        .withColumn("o_totalprice", F.lit(4242.5))
        .withColumn("o_orderdate", F.lit(future))
    )
    inserted = (
        orders.filter(F.col("o_orderkey") == 1)
        .withColumn("o_orderkey", F.lit(99_999_999).cast("long"))
        .withColumn("o_totalprice", F.lit(7.25))
        .withColumn("o_orderdate", F.lit(future))
    )
    new_source = (
        orders.filter(~F.col("o_orderkey").isin(7, 32))
        .unionByName(updated)
        .unionByName(inserted)
    )
    new_source.write.mode("overwrite").parquet(
        _os.path.join(src_dir, "orders.parquet")
    )
    res = eng.sync("orders")
    # >= 3: the '>='-watermark delta re-extracts rows AT the boundary too
    assert res.action == "merged" and res.rows >= 3
    assert eng.count_table("orders") == n0 + 1
    got = dict(
        eng.wh.con.execute(
            "SELECT o_orderkey, o_totalprice FROM orders "
            "WHERE o_orderkey IN (7, 32, 99999999)"
        ).fetchall()
    )
    assert got[7] == 4242.5 and got[32] == 4242.5 and got[99999999] == 7.25
    # idempotent boundary re-merge, then nothing newer -> same count
    res = eng.sync("orders")
    assert res.action == "merged" and eng.count_table("orders") == n0 + 1
    # every executed statement was one of the pinned shapes (the fakes
    # raise FakeStatementError otherwise), and the sequence is non-empty
    assert len(eng.wh.executed) > 4


def test_fake_engine_cli_config_route(spark, sf_dir, tmp_path, monkeypatch):
    """warehouse: {type: snowflake, fake: true} routes `sync all`
    through the fake engine from the CLI, and a file-backed duckdb path
    makes the result queryable after the run."""
    import os as _os

    import duckdb

    from pgwarehouse_spark import cli

    src_dir = str(tmp_path / "src")
    _os.makedirs(src_dir)
    spark.read.parquet(_os.path.join(sf_dir, "nation.parquet")).write.mode(
        "overwrite"
    ).parquet(_os.path.join(src_dir, "nation.parquet"))
    db_path = str(tmp_path / "fakewh.duckdb")
    cfg = tmp_path / "pgw.yaml"
    cfg.write_text(
        "source:\n"
        f"  path: {src_dir}\n"
        "warehouse:\n"
        "  type: snowflake\n"
        "  fake: true\n"
        f"  path: {db_path}\n"
        f"  staging: {tmp_path / 'stage'}\n"
        "tables:\n"
        "  nation:\n"
        "    primary_key: n_nationkey\n"
    )
    rc = cli.main(["sync", "all", "--config", str(cfg)], spark=spark)
    assert rc == 0
    con = duckdb.connect(db_path)
    assert con.execute("SELECT count(*) FROM nation").fetchone()[0] == 25
    con.close()
    # unsupported command classes error cleanly, not crash
    rc = cli.main(["compact", "nation", "--config", str(cfg)], spark=spark)
    assert rc == 1


def test_fake_engine_clickhouse_keyless_plain_load(spark, sf_dir, tmp_path):
    """No PK -> the reference's plain per-chunk CH load path (INSERT
    FROM input into the target) + reload-only strategy."""
    import os as _os

    from pgwarehouse_spark.catalog import TableSpec
    from pgwarehouse_spark.sync.engine import ParquetSource
    from pgwarehouse_spark.sync.fake_engine import FakeWarehouseSyncEngine

    src_dir = str(tmp_path / "src_ch")
    _os.makedirs(src_dir)
    region = spark.read.parquet(_os.path.join(sf_dir, "region.parquet"))
    region.write.mode("overwrite").parquet(_os.path.join(src_dir, "region.parquet"))
    eng = FakeWarehouseSyncEngine(
        spark,
        ParquetSource(src_dir),
        "clickhouse",
        specs={"region": TableSpec("region")},
        staging_dir=str(tmp_path / "stage_ch"),
    )
    assert eng.sync("region").action == "created"
    assert eng.count_table("region") == region.count()
    assert eng.sync("region").action == "reloaded"  # no PK: always reload
    assert eng.count_table("region") == region.count()


def test_snowflake_copy_load_sequence_golden_and_keyless_multichunk(sf, tmp_path):
    """The reference's initial/full LOAD is PUT + COPY INTO ... PURGE
    per chunk (reference snowflake_backend.py:148-157) — pinned by
    reference_snowflake_load_sql and EXECUTED here. Keyless semantics:
    plain inserts, so rows sharing a first-column value across chunks
    all survive (the round-8 review caught the old fake-merge-key path
    silently deleting chunk-1 rows on collisions)."""
    from pgwarehouse_spark.sync.dialects import (
        reference_create_table_sql,
        reference_snowflake_load_sql,
    )
    from pgwarehouse_spark.sync.fakes import run_snowflake_load

    sf.execute("USE SCHEMA PUBLIC")
    sf.execute(reference_create_table_sql("snowflake", "t", COLUMNS, []))
    # duplicate id=1 across two chunks: a keyed merge would lose one
    c1 = _chunk(tmp_path, "t10.csv.gz", ["1,alpha,10.5,2024-01-01 00:00:00"])
    c2 = _chunk(tmp_path, "t20.csv.gz", ["1,beta,20.0,2024-01-02 00:00:00",
                                         "2,gamma,30.0,2024-01-03 00:00:00"])
    run_snowflake_load(sf, "t", [c1, c2])
    rows = sf.table_rows("t")
    assert [r[:2] for r in rows] == [(1, "alpha"), (1, "beta"), (2, "gamma")]
    # PURGE = TRUE removed every staged file
    assert sf.staged_files("t") == []
    # and the executed statements ARE the golden sequence verbatim
    golden = reference_snowflake_load_sql("t", "t20.csv.gz", csv_path=c2)
    assert sf.executed[-2:] == golden[1:]  # PUT + COPY (USE SCHEMA dedup'd)


def test_fake_engine_snowflake_keyless_reload(spark, sf_dir, tmp_path):
    """No PK -> COPY-load path + reload-only strategy, mirrored from
    the clickhouse keyless test."""
    import os as _os

    from pgwarehouse_spark.catalog import TableSpec
    from pgwarehouse_spark.sync.engine import ParquetSource
    from pgwarehouse_spark.sync.fake_engine import FakeWarehouseSyncEngine

    src_dir = str(tmp_path / "src_sf_keyless")
    _os.makedirs(src_dir)
    region = spark.read.parquet(_os.path.join(sf_dir, "region.parquet"))
    # several partitions -> several staged chunks on the load path
    region.repartition(3).write.mode("overwrite").parquet(
        _os.path.join(src_dir, "region.parquet")
    )
    eng = FakeWarehouseSyncEngine(
        spark,
        ParquetSource(src_dir),
        "snowflake",
        specs={"region": TableSpec("region")},
        staging_dir=str(tmp_path / "stage_sf_keyless"),
    )
    assert eng.sync("region").action == "created"
    assert eng.count_table("region") == region.count()
    assert eng.sync("region").action == "reloaded"
    assert eng.count_table("region") == region.count()


def test_duckdb_engine_sync_all_accepts_shared_contract(spark, sf_dir, tmp_path):
    """The CLI forwards parallel/consistent/audit_fk to every engine's
    sync_all; the live-DuckDB engine crashed on them before the shared
    orchestrator (round-8 review finding). Drive the actual CLI path."""
    import os as _os

    import duckdb

    from pgwarehouse_spark import cli

    src_dir = str(tmp_path / "src_duck")
    _os.makedirs(src_dir)
    spark.read.parquet(_os.path.join(sf_dir, "nation.parquet")).write.mode(
        "overwrite"
    ).parquet(_os.path.join(src_dir, "nation.parquet"))
    db_path = str(tmp_path / "wh.duckdb")
    cfg = tmp_path / "duck.yaml"
    cfg.write_text(
        "source:\n"
        f"  path: {src_dir}\n"
        "warehouse:\n"
        "  type: duckdb\n"
        f"  path: {db_path}\n"
        "tables:\n"
        "  nation:\n"
        "    primary_key: n_nationkey\n"
    )
    rc = cli.main(["sync", "all", "--config", str(cfg)], spark=spark)
    assert rc == 0
    con = duckdb.connect(db_path)
    assert con.execute("SELECT count(*) FROM nation").fetchone()[0] == 25
    con.close()
    # --consistent on a snapshot-less source: clean error, not traceback
    rc = cli.main(
        ["sync", "all", "--consistent", "--config", str(cfg)], spark=spark
    )
    assert rc == 1
    # single-table sync with --consistent on snapshot-less source too
    rc = cli.main(
        ["sync", "nation", "--consistent", "--config", str(cfg)], spark=spark
    )
    assert rc == 1


# ---- fault injection (VERDICT r8 task 5) ------------------------------
# The reference's load is ON_ERROR=CONTINUE (snowflake_backend.py:
# 153-157) — bad rows vanish silently — and its per-chunk PUT+COPY+
# archive protocol commits chunk-by-chunk, so a crash mid-load leaves
# partial state the reference's restart path silently mis-handles (the
# watermark append skips the missing rows forever). The fakes let us
# TEST both behaviors end-to-end, and pin where this rebuild is
# stricter than the reference (README "Fault handling").


def _crash_on(fake, substr: str, nth: int = 1):
    """Monkeypatch fake.execute to raise on the nth statement containing
    `substr`; returns the original for restoration."""
    orig = fake.execute
    state = {"seen": 0}

    def wrapper(sql, **kw):
        if substr in sql:
            state["seen"] += 1
            if state["seen"] == nth:
                raise RuntimeError(f"injected crash at {substr!r} #{nth}")
        return orig(sql, **kw)

    fake.execute = wrapper
    return orig


def test_snowflake_on_error_continue_skips_bad_rows(sf, tmp_path):
    """A malformed row in a staged chunk: the pinned COPY INTO carries
    ON_ERROR=CONTINUE, and the fake executes that semantic for real —
    rows failing the TARGET-typed parse are skipped, the rest load, and
    the loss is visible in the COPY result report (where real Snowflake
    loses them silently)."""
    from pgwarehouse_spark.sync.dialects import reference_create_table_sql
    from pgwarehouse_spark.sync.fakes import run_snowflake_load

    sf.execute("USE SCHEMA PUBLIC")
    sf.execute(reference_create_table_sql("snowflake", "t", COLUMNS, ["id"]))
    dirty = _chunk(tmp_path, "t10.csv.gz", [
        "1,alpha,10.5,2024-01-01 00:00:00",
        "notanumber,bad,xx,also-not-a-timestamp",   # fails BIGINT cast
        "3,gamma,30.0,2024-01-03 00:00:00",
    ])
    run_snowflake_load(sf, "t", [dirty])
    rows = sf.table_rows("t")
    assert [r[0] for r in rows] == [1, 3], "good rows load, bad row skipped"
    rep = sf.load_reports[-1]
    assert rep["rows_parsed"] == 3 and rep["rows_loaded"] == 2
    assert rep["errors_seen"] == 1 and rep["status"] == "PARTIALLY_LOADED"
    assert sf.staged_files("t") == []  # PURGE still ran


def test_snowflake_clean_chunk_reports_loaded(sf, tmp_path):
    from pgwarehouse_spark.sync.dialects import reference_create_table_sql
    from pgwarehouse_spark.sync.fakes import run_snowflake_load

    sf.execute("USE SCHEMA PUBLIC")
    sf.execute(reference_create_table_sql("snowflake", "t", COLUMNS, ["id"]))
    clean = _chunk(tmp_path, "t10.csv.gz", ["1,a,1.0,2024-01-01 00:00:00"])
    run_snowflake_load(sf, "t", [clean])
    assert sf.load_reports[-1]["status"] == "LOADED"
    assert sf.load_reports[-1]["errors_seen"] == 0


def test_snowflake_crash_between_chunks_leaves_partial_state(sf, tmp_path):
    """Crash on the SECOND chunk's COPY INTO: chunk 1 is committed and
    purged, chunk 2 is staged-but-unloaded — exactly the partial state
    the reference's archive-as-you-go protocol can leave. The partial
    table is NOT a pk-prefix (chunk 1 holds the HIGH keys here), which
    is why a watermark append after the crash would lose rows."""
    from pgwarehouse_spark.sync.dialects import reference_create_table_sql
    from pgwarehouse_spark.sync.fakes import run_snowflake_load

    sf.execute("USE SCHEMA PUBLIC")
    sf.execute(reference_create_table_sql("snowflake", "t", COLUMNS, ["id"]))
    c1 = _chunk(tmp_path, "t10.csv.gz", [
        "10,j,1.0,2024-01-01 00:00:00", "11,k,2.0,2024-01-02 00:00:00",
    ])
    c2 = _chunk(tmp_path, "t20.csv.gz", [
        "1,a,3.0,2024-01-03 00:00:00", "2,b,4.0,2024-01-04 00:00:00",
    ])
    _crash_on(sf, "COPY INTO", nth=2)
    with pytest.raises(RuntimeError, match="injected crash"):
        run_snowflake_load(sf, "t", [c1, c2])
    assert [r[0] for r in sf.table_rows("t")] == [10, 11]
    # chunk 2 was PUT but never COPY'd: still in the table stage
    assert sf.staged_files("t") == ["t20.csv.gz"]
    # the hole: max(pk)=11, so `pk > 11` re-extracts nothing — keys 1,2
    # would be lost forever by a watermark append (the engine's marker
    # protocol forces a reload instead; test below)


def test_fake_engine_crash_resume_reloads_not_appends(spark, sf_dir, tmp_path):
    """End-to-end crash-resume through the sync engine: a crash mid
    multi-chunk initial load leaves a partial table + the loading
    marker; the next sync sees the marker and RELOADS (this rebuild is
    stricter than the reference, whose restart would watermark-append
    over the holes). Final contents equal the source exactly."""
    import os as _os

    from pgwarehouse_spark.catalog import TableSpec
    from pgwarehouse_spark.sync.engine import ParquetSource
    from pgwarehouse_spark.sync.fake_engine import FakeWarehouseSyncEngine

    src_dir = str(tmp_path / "src")
    _os.makedirs(src_dir)
    nation = spark.read.parquet(_os.path.join(sf_dir, "nation.parquet"))
    nation.repartition(3).write.mode("overwrite").parquet(
        _os.path.join(src_dir, "nation.parquet")
    )
    # one scan partition per file -> 3 staged chunks (openCostInBytes
    # forces no small-file packing for this test only)
    prev_cost = spark.conf.get("spark.sql.files.openCostInBytes", "4194304")
    spark.conf.set("spark.sql.files.openCostInBytes", str(128 * 1024 * 1024))
    try:
        eng = FakeWarehouseSyncEngine(
            spark, ParquetSource(src_dir), "snowflake",
            specs={"nation": TableSpec("nation", ["n_nationkey"])},
            staging_dir=str(tmp_path / "stage"),
        )
        orig = _crash_on(eng.wh, "COPY INTO", nth=2)
        with pytest.raises(RuntimeError, match="injected crash"):
            eng.sync("nation")
        # partial state + the crash marker
        n_partial = eng.count_table("nation")
        assert 0 < n_partial < 25
        assert _os.path.exists(eng._loading_marker("nation"))
        # resume: marker forces reload, not watermark append
        eng.wh.execute = orig
        res = eng.sync("nation")
        assert res.action == "reloaded"
        assert eng.count_table("nation") == 25
        assert not _os.path.exists(eng._loading_marker("nation"))
        # steady state afterwards: plain watermark paths resume
        assert eng.sync("nation").action in ("appended", "noop")
        assert eng.count_table("nation") == 25
    finally:
        spark.conf.set("spark.sql.files.openCostInBytes", prev_cost)


def test_clickhouse_mid_upsert_crash_self_heals_on_rerun(tmp_path):
    """ClickHouse has no MERGE: the reference's delete-then-insert has a
    window between ALTER DELETE and the target INSERT where matched rows
    are GONE. Crash there, then re-run the full pinned sequence (what a
    re-sync does): delete of already-deleted keys no-ops, insert
    restores — the sequence is idempotent and the final state heals."""
    from pgwarehouse_spark.sync.dialects import reference_create_table_sql

    fake = FakeClickHouse()
    fake.execute(reference_create_table_sql("clickhouse", "t", COLUMNS, ["id"]))
    seed = _chunk(tmp_path, "t00.csv.gz", [
        "1,alpha,10.5,2024-01-01 00:00:00",
        "2,beta,20.0,2024-01-02 00:00:00",
    ])
    run_clickhouse_upsert(fake, "t", COLUMNS, ["id"], [seed])
    delta = _chunk(tmp_path, "t10.csv.gz", [
        "2,beta2,99.0,2024-02-01 08:30:00",
        "3,gamma,30.0,2024-02-02 09:00:00",
    ])
    orig = _crash_on(fake, "INSERT INTO t SELECT * FROM", nth=1)
    with pytest.raises(RuntimeError, match="injected crash"):
        run_clickhouse_upsert(fake, "t", COLUMNS, ["id"], [delta])
    # the crash window: row 2 deleted, replacement never inserted
    assert [r[0] for r in fake.table_rows("t")] == [1]
    fake.execute = orig
    run_clickhouse_upsert(fake, "t", COLUMNS, ["id"], [delta])
    rows = fake.table_rows("t")
    assert [r[:2] for r in rows] == [(1, "alpha"), (2, "beta2"), (3, "gamma")]


def test_clickhouse_rejects_malformed_chunk_loudly(tmp_path):
    """Contrast with Snowflake's ON_ERROR=CONTINUE: clickhouse-client
    with the reference's settings rejects malformed input (default
    input_format_allow_errors_num=0), so the fake fails the statement
    rather than skipping rows — and the target stays untouched because
    the failure happens in the __changes temp table."""
    from pgwarehouse_spark.sync.dialects import reference_create_table_sql

    fake = FakeClickHouse()
    fake.execute(reference_create_table_sql("clickhouse", "t", COLUMNS, ["id"]))
    bad = _chunk(tmp_path, "t00.csv.gz", [
        "1,alpha,10.5,2024-01-01 00:00:00",
        "2,only,three,fields,extra,columns,here",
    ])
    with pytest.raises(Exception):
        run_clickhouse_upsert(fake, "t", COLUMNS, ["id"], [bad])
    assert fake.table_rows("t") == []
