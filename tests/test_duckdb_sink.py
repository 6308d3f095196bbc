"""Live-DuckDB warehouse round trips (VERDICT r03 item 4).

The reference ships a working DuckDB loader and tests it end-to-end
(`/root/reference/pgwarehouse/tests/test_postgres.py:101-187`); these
are the same three scenarios — extract/load round-trip, incremental
sync appending exactly 2 new rows, last-modified upsert landing updates
plus 1 insert — executed against a REAL DuckDB database file through
the Spark→parquet→DuckDB path (`sync/duckdb_sink.py`), with the
reference's own value-level asserts (updated rows where amount == id, a
probe for the 9999.9 insert)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pgwarehouse_spark.sync.duckdb_sink import DuckDBWarehouse
from pgwarehouse_spark.sync.jdbc_sink import publish_incremental


def _orders(spark, sf_dir, n=300):
    from pgwarehouse_spark.sources.tables import load_table

    return (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy("o_orderkey")
        .limit(n)
    )


def _users(spark, sf_dir, n=10):
    from pgwarehouse_spark.sources.tables import load_table

    return (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy("c_custkey")
        .limit(n)
    )


def test_extract_load_roundtrip(spark, sf_dir, tmp_path):
    """test_extract_load (reference :101-109): bulk load, then
    warehouse count == source count — plus value spot-checks and a
    full-fidelity Spark read-back the reference can't do."""
    src = _orders(spark, sf_dir)
    n_src = src.count()
    wh = DuckDBWarehouse(str(tmp_path / "wh.duckdb"))
    wh.write_full(src, "my_orders", pk=["o_orderkey"])

    assert wh.exists(spark, "my_orders")
    assert wh.count(spark, "my_orders") == n_src

    # live-SQL value spot-check (reference's _query_table asserts)
    got = wh.query(
        "SELECT o_orderkey, o_totalprice FROM my_orders "
        "ORDER BY o_orderkey LIMIT 3"
    )
    want = [
        (r["o_orderkey"], r["o_totalprice"])
        for r in src.orderBy("o_orderkey").limit(3).collect()
    ]
    assert got == want

    # parquet round-trip preserves types and every row
    back = wh.read(spark, "my_orders")
    assert dict(back.dtypes) == dict(src.dtypes)
    assert back.count() == n_src
    assert (
        back.unionByName(src).groupBy(*src.columns).count()
        .filter(F.col("count") != 2).count() == 0
    )


def test_incremental_sync_appends_two_rows(spark, sf_dir, tmp_path):
    """test_incremental_sync (reference :132-155): initial sync, insert
    2 source rows, resync → warehouse holds orig+2 and only the delta
    crossed (publish_incremental returns 2)."""
    users = _users(spark, sf_dir)
    orig = users.count()
    wh = DuckDBWarehouse(str(tmp_path / "wh.duckdb"))

    assert publish_incremental(spark, users, wh, "users10", "c_custkey") == orig
    assert wh.count(spark, "users10") == orig
    # idempotent resync with no source change: zero-delta short-circuit
    assert publish_incremental(spark, users, wh, "users10", "c_custkey") == 0

    top = users.agg(F.max("c_custkey")).collect()[0][0]
    two_more = spark.createDataFrame(
        [(top + 1, "sean hannity", 55.0), (top + 2, "laura ingraham", 45.0)],
        schema=users.schema,
    )
    grown = users.unionByName(two_more)
    assert publish_incremental(spark, grown, wh, "users10", "c_custkey") == 2
    assert wh.count(spark, "users10") == orig + 2
    got = wh.query(
        f"SELECT c_name FROM users10 WHERE c_custkey > {top} ORDER BY c_custkey"
    )
    assert [r[0] for r in got] == ["sean hannity", "laura ingraham"]


def test_last_modified_upsert(spark, sf_dir, tmp_path):
    """test_last_modified_sync (reference :158-187): update 2 rows
    (amount := id, watermark column bumped), insert 1 row with amount
    9999.9; merge the >=-watermark delta → count is orig+1, the two
    updated rows satisfy amount == id, and exactly one 9999.9 row
    exists."""
    src = _orders(spark, sf_dir)
    orig = src.count()
    wh = DuckDBWarehouse(str(tmp_path / "wh.duckdb"))
    wh.write_full(src, "my_orders", pk=["o_orderkey"])

    keys = [r["o_orderkey"] for r in src.limit(2).collect()]
    for k in keys:
        assert wh.query(
            f"SELECT o_totalprice FROM my_orders WHERE o_orderkey = {k}"
        )[0][0] != float(k)

    wm = wh.watermark("my_orders", "o_orderdate")
    assert wm is not None
    bump = F.lit(wm) + F.expr("INTERVAL 1 DAY")
    new_key = src.agg(F.max("o_orderkey")).collect()[0][0] + 1
    updated = src.withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey").isin(keys),
               F.col("o_orderkey").cast("double"))
        .otherwise(F.col("o_totalprice")),
    ).withColumn(
        "o_orderdate",
        F.when(F.col("o_orderkey").isin(keys), bump)
        .otherwise(F.col("o_orderdate")),
    )
    inserted = spark.createDataFrame(
        [(new_key, 1, 9999.9, None)], schema=src.schema
    ).withColumn("o_orderdate", bump)
    source_now = updated.unionByName(inserted)

    # the reference extracts WHERE last_modified >= warehouse-max and
    # INSERT-OR-REPLACEs it; same delta, same net effect here
    delta = source_now.filter(F.col("o_orderdate") >= F.lit(wm))
    wh.merge(delta, "my_orders", keys=["o_orderkey"])

    assert wh.count(spark, "my_orders") == orig + 1
    for k in keys:
        assert wh.query(
            f"SELECT o_totalprice FROM my_orders WHERE o_orderkey = {k}"
        )[0][0] == float(k)
    assert wh.query(
        "SELECT COUNT(*) FROM my_orders WHERE o_totalprice = 9999.9"
    )[0][0] == 1


def test_merge_fallback_without_pk_constraint(spark, sf_dir, tmp_path):
    """Composite-key / no-PK tables can't use INSERT OR REPLACE; the
    atomic table-rewrite fallback must produce identical net semantics
    (update 1 existing key-pair, insert 1 new one)."""
    src = _orders(spark, sf_dir, n=50)
    wh = DuckDBWarehouse(str(tmp_path / "wh.duckdb"))
    wh.write_full(src, "orders_nopk", pk=None)  # no PK constraint

    row = src.limit(1).collect()[0]
    delta = spark.createDataFrame(
        [
            (row["o_orderkey"], row["o_custkey"], 123.45, row["o_orderdate"]),
            (999_999, 1, 678.9, row["o_orderdate"]),
        ],
        schema=src.schema,
    )
    wh.merge(delta, "orders_nopk", keys=["o_orderkey", "o_custkey"])
    assert wh.count(spark, "orders_nopk") == 51
    assert wh.query(
        f"SELECT o_totalprice FROM orders_nopk "
        f"WHERE o_orderkey = {row['o_orderkey']}"
    )[0][0] == 123.45
    assert wh.query(
        "SELECT o_totalprice FROM orders_nopk WHERE o_orderkey = 999999"
    )[0][0] == 678.9


def test_cli_publish_to_duckdb(spark, tmp_path, capsys):
    """`publish --duckdb-path` lands warehouse tables in a live DuckDB
    file end-to-end through the CLI."""
    import yaml

    from pgwarehouse_spark import cli
    from pgwarehouse_spark.sources.tables import load_table

    src_dir = tmp_path / "src"
    load_table(spark, "/root/testdata/sf0.001", "nation").write.parquet(
        str(src_dir / "nation")
    )
    cfg = tmp_path / "pgw.yaml"
    cfg.write_text(
        yaml.safe_dump(
            {
                "source": {"type": "parquet", "path": str(src_dir)},
                "warehouse": {"path": str(tmp_path / "wh")},
                "tables": {"nation": {"primary_key": "n_nationkey"}},
            }
        )
    )
    db = str(tmp_path / "live.duckdb")
    assert cli.main(["sync", "nation", "--config", str(cfg)], spark=spark) == 0
    assert cli.main(
        ["publish", "nation", "--config", str(cfg), "--duckdb-path", db],
        spark=spark,
    ) == 0
    assert "published nation: 25 rows" in capsys.readouterr().out
    wh = DuckDBWarehouse(db)
    assert wh.count(spark, "nation") == 25


# ---------------------------------------------------------------------------
# warehouse: {type: duckdb} — the reference's PRIMARY topology (sync
# straight into the live warehouse), end-to-end through the CLI with
# the reference's own scenario shapes (test_postgres.py:122-187).
# ---------------------------------------------------------------------------


def _duck_cfg(tmp_path, src_dir, tables):
    import yaml

    db = str(tmp_path / "live_wh.duckdb")
    cfg = tmp_path / "pgw_duck.yaml"
    cfg.write_text(
        yaml.safe_dump(
            {
                "source": {"type": "parquet", "path": str(src_dir)},
                "warehouse": {"type": "duckdb", "path": db},
                "tables": tables,
            }
        )
    )
    return str(cfg), db


def test_sync_into_live_duckdb_basic_and_incremental(spark, sf_dir, tmp_path):
    """test_basic_sync + test_incremental_sync through `sync`: first
    sync creates the warehouse table, an unchanged resync is a noop,
    two new source rows append exactly 2."""
    from pgwarehouse_spark import cli

    src_dir = tmp_path / "src"
    users = _users(spark, sf_dir)
    users.write.parquet(str(src_dir / "users10"))
    cfg, db = _duck_cfg(
        tmp_path, src_dir, {"users10": {"primary_key": "c_custkey"}}
    )

    assert cli.main(["sync", "users10", "--config", cfg], spark=spark) == 0
    wh = DuckDBWarehouse(db)
    orig = users.count()
    assert wh.count(spark, "users10") == orig
    # resync: zero-delta noop
    assert cli.main(["sync", "users10", "--config", cfg], spark=spark) == 0
    assert wh.count(spark, "users10") == orig

    top = users.agg(F.max("c_custkey")).collect()[0][0]
    two = spark.createDataFrame(
        [(top + 1, "sean hannity", 55.0), (top + 2, "laura ingraham", 45.0)],
        schema=users.schema,
    )
    users.unionByName(two).write.mode("overwrite").parquet(
        str(src_dir / "users10")
    )
    assert cli.main(["sync", "users10", "--config", cfg], spark=spark) == 0
    assert wh.count(spark, "users10") == orig + 2
    assert wh.query(
        f"SELECT COUNT(*) FROM users10 WHERE c_custkey > {top}"
    )[0][0] == 2


def test_sync_into_live_duckdb_last_modified_upsert(spark, sf_dir, tmp_path):
    """test_last_modified_sync through `sync`: bump 2 rows' watermark
    (amount := id) and add 1 row; the resync merges — count orig+1,
    amount == id on the touched rows."""
    from pgwarehouse_spark import cli

    src_dir = tmp_path / "src"
    orders = _orders(spark, sf_dir, n=100)
    orders.write.parquet(str(src_dir / "my_orders"))
    cfg, db = _duck_cfg(
        tmp_path,
        src_dir,
        {
            "my_orders": {
                "primary_key": "o_orderkey",
                "last_modified": "o_orderdate",
            }
        },
    )
    assert cli.main(["sync", "my_orders", "--config", cfg], spark=spark) == 0
    wh = DuckDBWarehouse(db)
    orig = orders.count()
    assert wh.count(spark, "my_orders") == orig

    keys = [r["o_orderkey"] for r in orders.limit(2).collect()]
    new_key = orders.agg(F.max("o_orderkey")).collect()[0][0] + 1
    future = orders.agg(F.max("o_orderdate")).collect()[0][0]
    bump = F.lit(future) + F.expr("INTERVAL 1 DAY")
    updated = orders.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey").isin(keys), F.col("o_orderkey").cast("double")
        ).otherwise(F.col("o_totalprice")),
    ).withColumn(
        "o_orderdate",
        F.when(F.col("o_orderkey").isin(keys), bump).otherwise(
            F.col("o_orderdate")
        ),
    )
    extra = spark.createDataFrame(
        [(new_key, 1, 9999.9, None)], schema=orders.schema
    ).withColumn("o_orderdate", bump)
    updated.unionByName(extra).write.mode("overwrite").parquet(
        str(src_dir / "my_orders")
    )

    assert cli.main(["sync", "my_orders", "--config", cfg], spark=spark) == 0
    assert wh.count(spark, "my_orders") == orig + 1
    for k in keys:
        assert wh.query(
            f"SELECT o_totalprice FROM my_orders WHERE o_orderkey = {k}"
        )[0][0] == float(k)
    assert wh.query(
        "SELECT COUNT(*) FROM my_orders WHERE o_totalprice = 9999.9"
    )[0][0] == 1
    # lake-only maintenance refuses clearly on a duckdb warehouse
    assert cli.main(["compact", "my_orders", "--config", cfg], spark=spark) == 1


def test_verify_against_live_duckdb_detects_divergence(spark, sf_dir, tmp_path):
    """Source↔live-warehouse digest audit: green after a faithful sync,
    red (pinpointing a digest group) after the warehouse copy is
    tampered with warehouse-side — all warehouse hashing runs INSIDE
    DuckDB, no read-back."""
    from pgwarehouse_spark import cli
    from pgwarehouse_spark.sync.duckdb_sink import DuckDBSyncEngine

    src_dir = tmp_path / "src"
    _orders(spark, sf_dir, n=120).write.parquet(str(src_dir / "my_orders"))
    cfg, db = _duck_cfg(
        tmp_path, src_dir, {"my_orders": {"primary_key": "o_orderkey"}}
    )
    assert cli.main(["sync", "my_orders", "--config", cfg], spark=spark) == 0
    assert cli.main(["verify", "my_orders", "--config", cfg], spark=spark) == 0

    # tamper in the warehouse only
    wh = DuckDBWarehouse(db)
    wh.query("UPDATE my_orders SET o_totalprice = o_totalprice + 1 "
             "WHERE o_orderkey = (SELECT MIN(o_orderkey) FROM my_orders)")
    assert cli.main(["verify", "my_orders", "--config", cfg], spark=spark) == 1

    import yaml

    eng = DuckDBSyncEngine.from_config(
        spark, __import__("pgwarehouse_spark.catalog", fromlist=["Config"])
        .Config.from_yaml(cfg)
    )
    report = eng.verify("my_orders")
    assert not report["ok"]
    # exactly the tampered row's group(s) flagged, counts still equal
    assert 1 <= len(report["groups"]) <= 2


def test_diff_names_divergent_keys_live_duckdb(spark, sf_dir, tmp_path):
    """Key-level diff drill-down (r4): green after a faithful sync; after
    a warehouse-side UPDATE + DELETE + INSERT, `diff` reports exactly one
    mismatched, one missing_in_warehouse, one extra_in_warehouse — each
    with the right key — while only (pk, digest) pairs ever cross the
    warehouse boundary (read_sql exports the projection, not the rows)."""
    from pgwarehouse_spark import cli
    from pgwarehouse_spark.catalog import Config
    from pgwarehouse_spark.sync.duckdb_sink import DuckDBSyncEngine

    src_dir = tmp_path / "src"
    _orders(spark, sf_dir, n=120).write.parquet(str(src_dir / "my_orders"))
    cfg, db = _duck_cfg(
        tmp_path, src_dir, {"my_orders": {"primary_key": "o_orderkey"}}
    )
    assert cli.main(["sync", "my_orders", "--config", cfg], spark=spark) == 0
    assert cli.main(["diff", "my_orders", "--config", cfg], spark=spark) == 0

    wh = DuckDBWarehouse(db)
    k_upd = wh.query("SELECT MIN(o_orderkey) FROM my_orders")[0][0]
    k_del = wh.query("SELECT MAX(o_orderkey) FROM my_orders")[0][0]
    k_ins = k_del + 1_000_000
    wh.query(
        f"UPDATE my_orders SET o_totalprice = o_totalprice + 1 "
        f"WHERE o_orderkey = {k_upd}"
    )
    wh.query(f"DELETE FROM my_orders WHERE o_orderkey = {k_del}")
    wh.query(
        f"INSERT INTO my_orders SELECT {k_ins}, o_custkey, o_totalprice, "
        f"o_orderdate FROM my_orders WHERE o_orderkey = {k_upd}"
    )

    eng = DuckDBSyncEngine.from_config(spark, Config.from_yaml(cfg))
    rep = eng.diff("my_orders")
    assert not rep["ok"]
    assert rep["counts"]["mismatched"] == 1
    assert rep["counts"]["missing_in_warehouse"] == 1
    assert rep["counts"]["extra_in_warehouse"] == 1
    assert rep["counts"]["identical"] == 118
    assert rep["sample_keys"]["mismatched"] == [k_upd]
    assert rep["sample_keys"]["missing_in_warehouse"] == [k_del]
    assert rep["sample_keys"]["extra_in_warehouse"] == [k_ins]
    assert cli.main(["diff", "my_orders", "--config", cfg], spark=spark) == 1


def test_verify_and_diff_green_on_large_and_special_doubles(
    spark, sf_dir, tmp_path
):
    """Regression (r4 self-review): the digest canonical for DOUBLE
    columns must agree cross-engine for values where Spark's
    CAST(double AS STRING) uses Java scientific notation (>= 1e7,
    < 1e-3) and where Java 17's legacy Double.toString emits
    non-shortest digits (e.g. 5.101019214421436e18) — with the old
    string canonical every such row digested differently in the two
    engines and verify() reported a faithful sync as DIVERGED."""
    from pgwarehouse_spark import cli
    from pgwarehouse_spark.catalog import Config
    from pgwarehouse_spark.sync.duckdb_sink import DuckDBSyncEngine

    rows = [
        (1, 12345678.25),       # sci-notation in Spark, plain in DuckDB
        (2, 1e7),
        (3, 1e-4),
        (4, 5.101019214421436e18),  # legacy-Java non-shortest digits
        (5, -9.87654321e-9),
        (6, 0.0),
        (7, None),
        (8, float("nan")),
        (9, 42.5),
    ]
    src_dir = tmp_path / "src"
    spark.createDataFrame(rows, "k bigint, v double").write.parquet(
        str(src_dir / "dbl_tbl")
    )
    cfg, db = _duck_cfg(tmp_path, src_dir, {"dbl_tbl": {"primary_key": "k"}})
    assert cli.main(["sync", "dbl_tbl", "--config", cfg], spark=spark) == 0
    assert cli.main(["verify", "dbl_tbl", "--config", cfg], spark=spark) == 0
    eng = DuckDBSyncEngine.from_config(spark, Config.from_yaml(cfg))
    assert eng.verify("dbl_tbl")["ok"]
    rep = eng.diff("dbl_tbl")
    assert rep["ok"], rep
    assert rep["counts"] == {"identical": len(rows)}

    # tamper one double warehouse-side: still detected (multiplicative —
    # +1 on a 5.1e18 double is below one ulp and would be a true no-op)
    eng.wh.query("UPDATE dbl_tbl SET v = v * 2 WHERE k = 4")
    rep = eng.diff("dbl_tbl")
    assert not rep["ok"]
    assert rep["counts"].get("mismatched") == 1
    assert rep["sample_keys"]["mismatched"] == [4]


def test_publish_incremental_composite_pk_no_boundary_loss(
    spark, sf_dir, tmp_path
):
    """Regression (r4 self-review): with a composite PK the watermark is
    MAX(keys[0]); a strict '>' filter permanently dropped new rows that
    share the already-published maximum (a new line under the max
    orderkey). The composite path must take the boundary-inclusive
    delta and anti-join the warehouse's boundary slice on the FULL key."""
    from pgwarehouse_spark.sources.tables import load_table

    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .orderBy("l_orderkey", "l_linenumber")
        .limit(50)
    )
    wh = DuckDBWarehouse(str(tmp_path / "pub.duckdb"))
    keys = ["l_orderkey", "l_linenumber"]
    n0 = publish_incremental(spark, li, wh, "li_pub", keys)
    assert n0 == 50

    max_ok = li.agg(F.max("l_orderkey")).collect()[0][0]
    extra = spark.createDataFrame(
        [(int(max_ok), 9901, 1.0), (int(max_ok) + 7, 1, 2.0)],
        "l_orderkey bigint, l_linenumber int, l_quantity double",
    )
    src2 = li.unionByName(extra.selectExpr(
        "l_orderkey", "cast(l_linenumber as int) l_linenumber",
        "l_quantity"
    ).select(*li.columns))
    # the boundary row (same max orderkey, new linenumber) must land;
    # existing rows must not duplicate
    n1 = publish_incremental(spark, src2, wh, "li_pub", keys)
    assert n1 == 2, f"expected both new rows published, got {n1}"
    assert wh.count(spark, "li_pub") == 52
    # idempotent: re-publish of the same source is a zero-delta noop
    assert publish_incremental(spark, src2, wh, "li_pub", keys) == 0
