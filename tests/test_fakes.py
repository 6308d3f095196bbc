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
