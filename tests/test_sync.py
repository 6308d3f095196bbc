"""Round-trip sync-engine tests, mirroring the reference's test strategy
(SURVEY §5: boot source, sync, assert count equality source↔warehouse,
then incremental-append and last-modified-upsert scenarios with value
spot-checks — reference tests/test_postgres.py:101-187)."""

from __future__ import annotations

import datetime as dt
import os
import shutil

import pytest

from pyspark.sql import functions as F

from pgwarehouse_spark.catalog import TableSpec
from pgwarehouse_spark.sync.engine import ParquetSource, SyncEngine


@pytest.fixture()
def workspace(tmp_path):
    src = tmp_path / "source"
    wh = tmp_path / "warehouse"
    src.mkdir()
    return str(src), str(wh)


def _write_source(spark, src_dir, name, df):
    df.write.mode("overwrite").parquet(os.path.join(src_dir, f"{name}.parquet"))


def _orders(spark, sf_dir, limit=None):
    df = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    return df.limit(limit) if limit else df


def make_engine(spark, src, wh, specs):
    return SyncEngine(spark, ParquetSource(src), wh, specs=specs, num_buckets=4)


def test_initial_sync_counts_match(spark, sf_dir, workspace):
    src, wh = workspace
    orders = _orders(spark, sf_dir)
    _write_source(spark, src, "orders", orders)
    eng = make_engine(
        spark, src, wh, {"orders": TableSpec("orders", ["o_orderkey"])}
    )
    res = eng.sync("orders")
    assert res.action == "created"
    assert eng.count_table("orders") == orders.count()


def test_incremental_append(spark, sf_dir, workspace):
    """Insert rows in the source, re-sync, count goes up by exactly that
    many (reference test_incremental_sync:132-153)."""
    src, wh = workspace
    orders = _orders(spark, sf_dir)
    base = orders.filter(F.col("o_orderkey") <= 1000)
    _write_source(spark, src, "orders", base)
    eng = make_engine(spark, src, wh, {"orders": TableSpec("orders", ["o_orderkey"])})
    eng.sync("orders")
    n0 = eng.count_table("orders")

    newrows = orders.filter(
        (F.col("o_orderkey") > 1000) & (F.col("o_orderkey") <= 1010)
    )
    n_new = newrows.count()
    assert n_new > 0
    _write_source(spark, src, "orders", base.unionByName(newrows))
    res = eng.sync("orders")
    assert res.action == "appended"
    assert res.rows == n_new
    assert eng.count_table("orders") == n0 + n_new

    # idempotent: nothing new → zero-delta short-circuit (A13)
    assert eng.sync("orders").action == "noop"


def test_last_modified_upsert(spark, sf_dir, workspace):
    """Update two rows + insert one, re-sync with last_modified; updated
    values land, count +1 (reference test_last_modified_sync:156-187)."""
    src, wh = workspace
    orders = _orders(spark, sf_dir).filter(F.col("o_orderkey") <= 2000)
    _write_source(spark, src, "orders", orders)
    spec = TableSpec("orders", ["o_orderkey"], last_modified="o_orderdate")
    eng = make_engine(spark, src, wh, {"orders": spec})
    eng.sync("orders")
    n0 = eng.count_table("orders")

    future = dt.datetime(2005, 1, 1)
    updated = (
        orders.filter(F.col("o_orderkey").isin(18, 19))
        .withColumn("o_totalprice", F.col("o_orderkey").cast("double"))
        .withColumn("o_orderdate", F.lit(future))
    )
    inserted = (
        orders.filter(F.col("o_orderkey") == 20)
        .withColumn("o_orderkey", F.lit(99_999_999).cast("bigint"))
        .withColumn("o_totalprice", F.lit(9999.9))
        .withColumn("o_orderdate", F.lit(future))
    )
    new_source = (
        orders.filter(~F.col("o_orderkey").isin(18, 19))
        .unionByName(updated)
        .unionByName(inserted)
    )
    _write_source(spark, src, "orders", new_source)
    res = eng.sync("orders")
    assert res.action == "merged"
    assert eng.count_table("orders") == n0 + 1

    vals = {
        r.o_orderkey: r.o_totalprice
        for r in eng.query_table(
            "orders", ["o_orderkey", "o_totalprice"], "o_orderkey in (18, 19, 99999999)"
        ).collect()
    }
    assert vals[18] == 18.0 and vals[19] == 19.0
    assert vals[99999999] == 9999.9


def test_upsert_composite_key(spark, sf_dir, workspace):
    """Composite-PK merge — the case the reference refuses
    (clickhouse_backend.py:203-204)."""
    src, wh = workspace
    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).filter(
        F.col("l_orderkey") <= 500
    )
    _write_source(spark, src, "lineitem", li)
    keys = ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"]
    spec = TableSpec("lineitem", keys, last_modified="l_shipdate")
    eng = make_engine(spark, src, wh, {"lineitem": spec})
    eng.sync("lineitem")
    n0 = eng.count_table("lineitem")

    future = dt.datetime(2005, 6, 1)
    bumped = (
        li.orderBy(*keys).limit(3)
        .withColumn("l_quantity", F.lit(777.0))
        .withColumn("l_shipdate", F.lit(future))
    )
    key_rows = [tuple(r[k] for k in keys) for r in bumped.collect()]
    rest = li.join(bumped.select(*keys), keys, "left_anti")
    _write_source(spark, src, "lineitem", rest.unionByName(bumped))
    res = eng.sync("lineitem")
    assert res.action == "merged"
    assert eng.count_table("lineitem") == n0

    got = eng.query_table("lineitem", where="l_quantity = 777.0").collect()
    assert {tuple(r[k] for k in keys) for r in got} == set(key_rows)


def test_reload_and_scheduled_reload(spark, sf_dir, workspace):
    src, wh = workspace
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    _write_source(spark, src, "customer", cust)
    spec = TableSpec("customer", ["c_custkey"], reload="sun")
    eng = make_engine(spark, src, wh, {"customer": spec})
    assert eng.sync("customer").action == "created"
    sunday = dt.date(2026, 8, 16)
    monday = dt.date(2026, 8, 17)
    assert eng.sync("customer", today=monday).action == "noop"
    assert eng.sync("customer", today=sunday).action == "reloaded"
    # day-of-month schedule
    spec31 = TableSpec("customer", ["c_custkey"], reload=17)
    eng.specs["customer"] = spec31
    assert eng.sync("customer", today=monday).action == "reloaded"


def test_skip_and_no_pk_reload_fallback(spark, sf_dir, workspace):
    src, wh = workspace
    region = spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
    _write_source(spark, src, "region", region)
    eng = make_engine(
        spark,
        src,
        wh,
        {
            "region": TableSpec("region"),  # no PK → reload-only strategy
            "ghost": TableSpec("ghost", skip=True),
        },
    )
    assert eng.sync("ghost").action == "skipped"
    assert eng.sync("region").action == "created"
    assert eng.sync("region").action == "reloaded"  # no PK: always reload
    assert eng.count_table("region") == region.count()


def test_sync_all_error_isolation(spark, sf_dir, workspace):
    src, wh = workspace
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    _write_source(spark, src, "nation", nation)
    eng = make_engine(
        spark,
        src,
        wh,
        {
            "nation": TableSpec("nation", ["n_nationkey"]),
            "missing_table": TableSpec("missing_table", ["x"]),
        },
    )
    results = {r.table: r for r in eng.sync_all()}
    assert results["nation"].action == "created"
    assert results["missing_table"].action.startswith("error:")


def test_max_records_guard(spark, sf_dir, workspace):
    src, wh = workspace
    part = spark.read.parquet(os.path.join(sf_dir, "part.parquet"))
    _write_source(spark, src, "part", part)
    eng = make_engine(
        spark, src, wh, {"part": TableSpec("part", ["p_partkey"], max_records=50)}
    )
    eng.sync("part")
    assert eng.count_table("part") == 50


def test_json_source_roundtrip(spark, sf_dir, workspace):
    """JSONL staging in, parquet warehouse out — schema pinned, no
    inference pass."""
    from pgwarehouse_spark.sync.engine import JsonSource

    src, wh = workspace
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    nation.write.json(os.path.join(src, "nation.jsonl"))
    eng = SyncEngine(
        spark,
        JsonSource(src, schemas={"nation": "n_nationkey int, n_name string, n_regionkey int"}),
        wh,
        specs={"nation": TableSpec("nation", ["n_nationkey"])},
        num_buckets=2,
    )
    assert eng.sync("nation").action == "created"
    assert eng.count_table("nation") == nation.count()


def test_orc_source_roundtrip(spark, sf_dir, workspace):
    """ORC staging in, parquet warehouse out — columnar pushdown source."""
    from pgwarehouse_spark.sync.engine import OrcSource

    src, wh = workspace
    supplier = spark.read.parquet(os.path.join(sf_dir, "supplier.parquet"))
    supplier.write.orc(os.path.join(src, "supplier.orc"))
    eng = SyncEngine(
        spark,
        OrcSource(src),
        wh,
        specs={"supplier": TableSpec("supplier", ["s_suppkey"])},
        num_buckets=2,
    )
    assert eng.sync("supplier").action == "created"
    assert eng.count_table("supplier") == supplier.count()


def test_make_source_dispatch():
    from pgwarehouse_spark.sync.engine import (
        CsvSource, JsonSource, OrcSource, ParquetSource, make_source,
    )

    assert isinstance(make_source({"type": "parquet", "path": "/x"}), ParquetSource)
    assert isinstance(make_source({"type": "csv", "path": "/x"}), CsvSource)
    assert isinstance(make_source({"type": "json", "path": "/x"}), JsonSource)
    assert isinstance(make_source({"type": "orc", "path": "/x"}), OrcSource)
    with pytest.raises(ValueError):
        make_source({"type": "avro", "path": "/x"})


def test_csv_source_roundtrip(spark, sf_dir, workspace, tmp_path):
    """CSV staging interchange (the reference's extract format, A2/A8):
    gzip chunked CSV in, parquet warehouse out."""
    from pgwarehouse_spark.sync.engine import CsvSource

    src, wh = workspace
    nation = spark.read.parquet(os.path.join(sf_dir, "nation.parquet"))
    csv_dir = os.path.join(src, "nation_data")
    nation.write.option("header", "true").option("compression", "gzip").csv(csv_dir)
    eng = SyncEngine(
        spark,
        CsvSource(src, schemas={"nation": "n_nationkey int, n_name string, n_regionkey int"}),
        wh,
        specs={"nation": TableSpec("nation", ["n_nationkey"])},
        num_buckets=2,
    )
    assert eng.sync("nation").action == "created"
    assert eng.count_table("nation") == nation.count()


def test_incremental_rollup_matches_full_recompute(spark, sf_dir, tmp_path):
    """Additive rollup maintenance: two delta waves merged incrementally
    must equal the one-shot aggregation over all data; only buckets
    containing touched groups are rewritten."""
    from pgwarehouse_spark.operators._helpers import dsum
    from pgwarehouse_spark.sources.tables import load_table
    from pgwarehouse_spark.sync.rollup import read_rollup, update_rollup

    path = str(tmp_path / "rollup")
    events = load_table(spark, sf_dir, "events")
    keys = ["event_type"]
    def measures():
        return [
            ("n_events", F.count(F.lit(1))),
            ("sum_value", dsum(F.coalesce("value", F.lit(0.0)))),
        ]

    wave1 = events.filter(F.col("event_id") % 2 == 0)
    wave2 = events.filter(F.col("event_id") % 2 == 1)
    update_rollup(spark, path, wave1, keys, measures(), num_buckets=4)
    touched = update_rollup(spark, path, wave2, keys, measures(), num_buckets=4)
    assert touched >= 1

    got = {
        r.event_type: (r.n_events, r.sum_value)
        for r in read_rollup(spark, path).collect()
    }
    want = {
        r.event_type: (r.n_events, r.sum_value)
        for r in events.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_events"),
             dsum(F.coalesce("value", F.lit(0.0))).alias("sum_value"))
        .collect()
    }
    assert got == want  # decimal partials: bit-exact additivity


def test_incremental_rollup_prunes_buckets(spark, sf_dir, tmp_path):
    """A delta touching one group must rewrite only that group's bucket."""
    from pgwarehouse_spark.sources.tables import load_table
    from pgwarehouse_spark.sync.rollup import update_rollup

    path = str(tmp_path / "rollup")
    events = load_table(spark, sf_dir, "events")
    keys = ["event_type"]
    measures = [("n_events", F.count(F.lit(1)))]
    update_rollup(spark, path, events, keys, measures, num_buckets=8)
    one_type = events.limit(1).collect()[0].event_type
    touched = update_rollup(
        spark, path, events.filter(F.col("event_type") == one_type),
        keys, measures, num_buckets=8,
    )
    assert touched == 1


def test_schema_evolution_append_new_column(spark, sf_dir, workspace):
    """Source grows a column between syncs: new rows carry it, old rows
    read back as NULL — the sync must not break (the reference's CSV
    load would)."""
    src, wh = workspace
    orders = _orders(spark, sf_dir, limit=200)
    _write_source(spark, src, "orders", orders)
    eng = make_engine(spark, src, wh, {"orders": TableSpec("orders", ["o_orderkey"])})
    eng.sync("orders")

    evolved = _orders(spark, sf_dir).limit(260).withColumn(
        "o_channel", F.lit("web")
    )
    _write_source(spark, src, "orders", evolved)
    res = eng.sync("orders")
    assert res.action == "appended"
    out = eng.read_table("orders")
    assert "o_channel" in out.columns
    assert out.count() == 260
    assert out.filter(F.col("o_channel").isNull()).count() == 200
    assert out.filter(F.col("o_channel") == "web").count() == 60


def test_schema_evolution_upsert_and_dropped_column(spark, sf_dir, workspace):
    """Upsert with a delta that (a) adds a new column and (b) lost one the
    target has: updated rows get the new column, the lost column becomes
    NULL for them, untouched rows keep every value."""
    src, wh = workspace
    orders = _orders(spark, sf_dir, limit=100)
    _write_source(spark, src, "orders", orders)
    spec = TableSpec("orders", ["o_orderkey"], last_modified="o_orderdate")
    eng = make_engine(spark, src, wh, {"orders": spec})
    eng.sync("orders")

    wm = eng.watermark("orders", "o_orderdate")
    touched = (
        eng.read_table("orders")
        .filter(F.col("o_orderdate") == wm)
        .drop("o_orderpriority")
        .withColumn("o_flag", F.lit(1))
    )
    n_touched = touched.count()
    assert n_touched > 0
    _write_source(spark, src, "orders", touched)
    res = eng.sync("orders")
    assert res.action == "merged"
    out = eng.read_table("orders")
    assert out.count() == 100
    assert out.filter(F.col("o_flag") == 1).count() == n_touched
    # untouched rows keep o_orderpriority; touched rows lost it
    assert out.filter(
        F.col("o_orderpriority").isNull() & (F.col("o_flag") == 1)
    ).count() == n_touched
    assert (
        out.filter(F.col("o_orderpriority").isNotNull()).count()
        == 100 - n_touched
    )


def test_compact_collapses_append_files(spark, sf_dir, workspace):
    """Repeated incremental appends leave small files in each bucket
    partition; compact rewrites the canonical layout without changing
    the table's contents."""
    src, wh = workspace
    orders = _orders(spark, sf_dir)
    base = orders.filter(F.col("o_orderkey") <= 1000)
    _write_source(spark, src, "orders", base)
    eng = make_engine(spark, src, wh, {"orders": TableSpec("orders", ["o_orderkey"])})
    eng.sync("orders")

    for hi in (1100, 1200, 1300):
        _write_source(
            spark, src, "orders", orders.filter(F.col("o_orderkey") <= hi)
        )
        assert eng.sync("orders").action == "appended"

    before_rows = sorted(
        (r.o_orderkey, r.o_totalprice) for r in eng.read_table("orders").collect()
    )
    before, after = eng.compact("orders")
    assert after < before  # small append files collapsed
    after_rows = sorted(
        (r.o_orderkey, r.o_totalprice) for r in eng.read_table("orders").collect()
    )
    assert after_rows == before_rows


def test_verify_detects_bucket_level_divergence(spark, sf_dir, workspace):
    """Consistency audit: clean sync verifies ok; after corrupting one
    row in the warehouse, verify pinpoints exactly the bucket holding
    that key."""
    from pgwarehouse_spark.sync.merge import BUCKET_COL, bucket_expr

    src, wh = workspace
    orders = _orders(spark, sf_dir).filter(F.col("o_orderkey") <= 1000)
    _write_source(spark, src, "orders", orders)
    eng = make_engine(spark, src, wh, {"orders": TableSpec("orders", ["o_orderkey"])})
    eng.sync("orders")
    assert eng.verify("orders") == {"ok": True, "buckets": []}

    # corrupt: append a rogue duplicate of key 7 with a wrong price
    rogue = (
        orders.filter(F.col("o_orderkey") == 7)
        .withColumn("o_totalprice", F.lit(-1.0))
        .withColumn(BUCKET_COL, bucket_expr(["o_orderkey"], 4))
    )
    rogue.write.mode("append").partitionBy(BUCKET_COL).parquet(
        os.path.join(wh, "orders")
    )
    expected_bucket = rogue.select(BUCKET_COL).collect()[0][0]
    report = eng.verify("orders")
    assert report["ok"] is False
    assert report["buckets"] == [expected_bucket]


def test_incremental_rollup_sketch_distinct_idempotent(spark, sf_dir, tmp_path):
    """Sketch measures in the maintained rollup: (a) two delta waves
    merged via hll_union must estimate the same distinct count as a
    one-shot sketch over all data; (b) RE-applying a wave leaves the
    sketch estimate unchanged (register-max union is idempotent) while
    the additive count double-counts — the documented at-least-once
    tolerance difference between the two measure kinds."""
    from pgwarehouse_spark.sources.tables import load_table
    from pgwarehouse_spark.sync.rollup import read_rollup, update_rollup

    path = str(tmp_path / "rollup_sk")
    events = load_table(spark, sf_dir, "events")
    keys = ["event_type"]
    measures = [("n_events", F.count(F.lit(1)))]
    sketches = [("sk_users", F.expr("hll_sketch_agg(user_id)"))]

    wave1 = events.filter(F.col("event_id") % 2 == 0)
    wave2 = events.filter(F.col("event_id") % 2 == 1)
    update_rollup(spark, path, wave1, keys, measures, 4, sketch_measures=sketches)
    update_rollup(spark, path, wave2, keys, measures, 4, sketch_measures=sketches)

    def snapshot():
        return {
            r.event_type: (r.n_events, r.est)
            for r in read_rollup(spark, path)
            .select(
                "event_type",
                "n_events",
                F.expr("hll_sketch_estimate(sk_users)").alias("est"),
            )
            .collect()
        }

    got = snapshot()
    want = {
        r.event_type: (r.n, r.est)
        for r in events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias("est"),
        )
        .collect()
    }
    assert got == want

    # redelivery: sketch unchanged, additive count inflated
    update_rollup(spark, path, wave2, keys, measures, 4, sketch_measures=sketches)
    after = snapshot()
    for k, (n, est) in after.items():
        assert est == got[k][1]
        assert n > got[k][0]



def test_incremental_rollup_or_masks_idempotent(spark, sf_dir, tmp_path):
    """OR-merged mask measures (r6, update_rollup or_measures): (a) two
    delta waves OR-merged must equal the one-shot bit_or over all data;
    (b) RE-applying a wave leaves the mask unchanged — bitwise OR is
    set-union, fully idempotent, so unlike additive counters a Bloom/
    bitmap column needs no exactly-once coordination at all."""
    from pgwarehouse_spark.sources.tables import load_table
    from pgwarehouse_spark.sync.rollup import read_rollup, update_rollup

    path = str(tmp_path / "rollup_or")
    events = load_table(spark, sf_dir, "events")
    keys = ["event_type"]
    mask = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(user_id % 63 AS INT))")
    ors = lambda: [("bits", F.bit_or(mask.alias("m")))]

    wave1 = events.filter(F.col("event_id") % 2 == 0)
    wave2 = events.filter(F.col("event_id") % 2 == 1)
    update_rollup(spark, path, wave1, keys, [], 4, or_measures=ors())
    update_rollup(spark, path, wave2, keys, [], 4, or_measures=ors())

    def snapshot():
        return {
            r.event_type: r.bits for r in read_rollup(spark, path).collect()
        }

    got = snapshot()
    want = {
        r.event_type: r.bits
        for r in events.groupBy("event_type")
        .agg(F.bit_or(mask).alias("bits"))
        .collect()
    }
    assert got == want and got

    # redelivery: OR-merge is a no-op on a replayed wave
    update_rollup(spark, path, wave2, keys, [], 4, or_measures=ors())
    assert snapshot() == got


def test_zorder_write_narrows_bands_on_both_dimensions(spark, sf_dir, tmp_path):
    """Z-ordered files must carry usefully narrow min/max footer bands on
    BOTH clustered columns (the property multi-dim pruning needs), where
    single-key range clustering narrows only its sort key."""
    import glob

    import pyarrow.parquet as pq

    from pgwarehouse_spark.sources.tables import load_table
    from pgwarehouse_spark.operators.zorder import write_zorder_layout

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    zpath = str(tmp_path / "z")
    rpath = str(tmp_path / "r")
    write_zorder_layout(orders, zpath, "o_custkey", "o_totalprice", n_files=16)
    (
        orders.repartitionByRange(16, "o_custkey")
        .sortWithinPartitions("o_custkey")
        .write.mode("overwrite")
        .parquet(rpath)
    )

    def avg_band(path, col):
        spans, total = [], None
        for f in glob.glob(path + "/*.parquet"):
            meta = pq.ParquetFile(f).metadata
            idx = [meta.schema.column(i).name for i in range(meta.num_columns)].index(col)
            lo = min(meta.row_group(g).column(idx).statistics.min for g in range(meta.num_row_groups))
            hi = max(meta.row_group(g).column(idx).statistics.max for g in range(meta.num_row_groups))
            spans.append(hi - lo)
            total = (min(lo, total[0]), max(hi, total[1])) if total else (lo, hi)
        return sum(spans) / len(spans) / max(total[1] - total[0], 1e-9)

    # z-order: both dims meaningfully narrowed (< 60% of global range,
    # ~sqrt(1/16)≈25% ideal for 16 files over 2 dims)
    assert avg_band(zpath, "o_custkey") < 0.6
    assert avg_band(zpath, "o_totalprice") < 0.6
    # single-key: sort key razor-thin, other dim near-full-range
    assert avg_band(rpath, "o_custkey") < 0.15
    assert avg_band(rpath, "o_totalprice") > 0.8


def test_canon_digest_null_safe_vs_duckdb(spark, tmp_path):
    """NULL-bearing rows must digest identically in Spark and DuckDB:
    concat_ws drops NULLs while SQL || propagates them, so without the
    '<NULL>' sentinel the engines diverge and (NULL, 'x') collides with
    ('', 'x'). Exercises every NULL placement plus the ''-vs-NULL case
    (ADVICE r01: syncshapes.py audit_group_checksums)."""
    import duckdb

    from pgwarehouse_spark.operators.syncshapes import canon_row_digest

    rows = [
        (1, "g", None, "s"),
        (2, "g", 10, None),
        (3, "g", None, None),
        (4, "g", 11, ""),      # empty string must NOT collide with NULL
        (5, "h", None, "x"),
        (6, "h", 12, "y"),
    ]
    df = spark.createDataFrame(rows, "id INT, grp STRING, v INT, s STRING")
    path = str(tmp_path / "nulls_pq")
    df.coalesce(1).write.parquet(path)

    got = {
        r["grp"]: r["digest"]
        for r in df.groupBy("grp")
        .agg(
            F.bit_xor(
                canon_row_digest(
                    F.col("id").cast("string"),
                    F.col("v").cast("string"),
                    F.col("s"),
                )
            ).alias("digest")
        )
        .collect()
    }
    want = {
        g: d
        for g, d in duckdb.sql(
            f"""
            SELECT grp, BIT_XOR(CAST('0x' || SUBSTR(md5(
              COALESCE(CAST(id AS VARCHAR), '<NULL>') || '|' ||
              COALESCE(CAST(v AS VARCHAR), '<NULL>') || '|' ||
              COALESCE(s, '<NULL>')
            ), 1, 15) AS BIGINT)) AS digest
            FROM read_parquet('{path}/*.parquet') GROUP BY grp
            """
        ).fetchall()
    }
    assert got == want

    # and the sentinel actually separates NULL from '' within one column
    d4 = df.filter("id = 4").select(
        canon_row_digest(F.col("s")).alias("d")
    ).collect()[0]["d"]
    d3 = df.filter("id = 3").select(
        canon_row_digest(F.col("s")).alias("d")
    ).collect()[0]["d"]
    assert d4 != d3


# ---------------------------------------------------------------------------
# ADVICE r02 (high): apply_cdc_bucketed must physically drop buckets whose
# merged result is empty — dynamic partition overwrite alone never rewrites
# a partition absent from the written data.
# ---------------------------------------------------------------------------


def _mk_bucketed(spark, tmp_path, n=40, buckets=4):
    from pgwarehouse_spark.sync.merge import write_bucketed

    path = str(tmp_path / "cdc_tbl")
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    write_bucketed(df, path, ["k"], buckets)
    return path


def test_cdc_delete_all_empties_table(spark, tmp_path):
    """Delete-everything: every bucket empties; the table must read back
    as zero rows (the exact repro from ADVICE r02)."""
    from pgwarehouse_spark.sync.merge import apply_cdc_bucketed

    path = _mk_bucketed(spark, tmp_path)
    deletes = spark.range(40).select(
        F.col("id").alias("k"),
        F.lit(None).cast("long").alias("v"),
        F.lit("D").alias("op"),
    )
    touched = apply_cdc_bucketed(spark, path, deletes, ["k"], 4)
    assert touched == 4
    back = spark.read.parquet(path)
    assert back.count() == 0
    # schema survives (zero-row marker file)
    assert "k" in back.columns and "v" in back.columns


def test_cdc_delete_empties_one_bucket_keeps_others(spark, tmp_path):
    """Delete every key of ONE bucket plus upsert another: the emptied
    bucket's directory must be gone, the upsert visible, untouched
    buckets intact."""
    from pgwarehouse_spark.sync.merge import (
        BUCKET_COL,
        apply_cdc_bucketed,
        bucket_expr,
    )

    path = _mk_bucketed(spark, tmp_path)
    keyed = spark.range(40).select(
        F.col("id").alias("k"), bucket_expr(["k"], 4).alias("b")
    )
    by_bucket = {
        r["b"]: [x["k"] for x in keyed.filter(F.col("b") == r["b"]).collect()]
        for r in keyed.select("b").distinct().collect()
    }
    victim = sorted(by_bucket)[0]
    other = sorted(by_bucket)[1]
    del_keys = by_bucket[victim]
    up_key = by_bucket[other][0]
    changes = spark.createDataFrame(
        [(k, None, "D") for k in del_keys] + [(up_key, 9999, "U")],
        "k long, v long, op string",
    )
    apply_cdc_bucketed(spark, path, changes, ["k"], 4)
    back = spark.read.parquet(path)
    assert back.count() == 40 - len(del_keys)
    assert back.filter(F.col("k") == up_key).collect()[0]["v"] == 9999
    assert not os.path.isdir(os.path.join(path, f"{BUCKET_COL}={victim}"))
    # untouched bucket directories still present
    for b in sorted(by_bucket)[2:]:
        assert os.path.isdir(os.path.join(path, f"{BUCKET_COL}={b}"))


def test_transactional_flag_flip_raises_clear_migration_error(spark, sf_dir, tmp_path):
    """ADVICE r02 (medium): flipping `transactional:` against an existing
    table must fail with a clear migration message in BOTH directions,
    and `reload` must migrate the layout."""
    src = ParquetSource(str(sf_dir))
    wh = str(tmp_path / "wh")
    spec = TableSpec(
        name="orders", primary_key=["o_orderkey"], last_modified="o_orderdate"
    )
    eng = SyncEngine(spark, src, wh, specs={"orders": spec}, num_buckets=4)
    eng.sync("orders")  # creates PLAIN layout
    assert not eng._is_tx("orders")

    # flip to transactional: incremental sync must explain, not crash
    spec.transactional = True
    with pytest.raises(ValueError, match="reload"):
        eng.sync("orders")
    # reload migrates to the tx layout
    eng.reload("orders")
    assert eng._is_tx("orders")
    assert eng.sync("orders").action in ("merged", "noop")

    # flip back to plain: same clear error, reload migrates back
    spec.transactional = False
    with pytest.raises(ValueError, match="reload"):
        eng.sync("orders")
    eng.reload("orders")
    assert not eng._is_tx("orders")
    assert eng.sync("orders").action in ("merged", "noop")


def test_composite_pk_sync_keeps_boundary_rows(spark, sf_dir, workspace):
    """Regression (r4 self-review): a composite-PK table without a
    watermark column synced with `keys[0] > max` — new rows sharing the
    already-synced maximum of the first key component (a new lineitem
    line under the max orderkey) were silently lost forever. The
    composite branch must take the boundary-inclusive delta and MERGE
    on the full key (idempotent at the boundary, no loss, no dupes)."""
    src, wh = workspace
    li = (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .filter(F.col("l_orderkey") <= 1000)
        # raw testdata carries duplicate (orderkey, linenumber) pairs at
        # sf0.01+ which a keyed merge legitimately collapses — start
        # key-unique so the count arithmetic below is exact
        .dropDuplicates(["l_orderkey", "l_linenumber"])
    )
    _write_source(spark, src, "lineitem", li)
    spec = TableSpec("lineitem", ["l_orderkey", "l_linenumber"])
    eng = make_engine(spark, src, wh, {"lineitem": spec})
    assert eng.sync("lineitem").action == "created"
    n0 = eng.count_table("lineitem")

    max_ok = li.agg(F.max("l_orderkey")).collect()[0][0]
    extra = spark.createDataFrame(
        [(int(max_ok), 9901, 1.0), (int(max_ok) + 3, 1, 2.0)],
        "l_orderkey bigint, l_linenumber int, l_quantity double",
    ).select(
        "l_orderkey",
        F.col("l_linenumber").cast(dict(li.dtypes)["l_linenumber"]),
        F.col("l_quantity").cast(dict(li.dtypes)["l_quantity"]),
    )
    _write_source(spark, src, "lineitem", li.unionByName(extra))
    res = eng.sync("lineitem")
    assert res.action == "merged"
    # BOTH new rows landed — including the one under the max orderkey
    assert eng.count_table("lineitem") == n0 + 2
    # idempotent: boundary rows re-merge without duplicating
    eng.sync("lineitem")
    assert eng.count_table("lineitem") == n0 + 2


# ---- parallel sync_all (VERDICT r7 task 6) ----


def test_sync_all_parallel_truly_concurrent_with_isolation(
    spark, sf_dir, workspace
):
    """Two tables, parallel=2, and a barrier INSIDE the source read
    that only releases when both extracts are in flight at once — a
    serial loop deadlocks the barrier and times out into an error row,
    so this passes ONLY if table syncs genuinely overlap. A third
    missing table proves per-table error isolation survives threading,
    and results come back in spec order."""
    import threading

    src, wh = workspace
    orders = _orders(spark, sf_dir, limit=500)
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet")).limit(500)
    n_orders, n_cust = orders.count(), cust.count()
    _write_source(spark, src, "orders", orders)
    _write_source(spark, src, "customer", cust)
    eng = make_engine(
        spark,
        src,
        wh,
        {
            "orders": TableSpec("orders", ["o_orderkey"]),
            "customer": TableSpec("customer", ["c_custkey"]),
            "ghost": TableSpec("ghost", ["id"]),  # not in the source
        },
    )
    barrier = threading.Barrier(2, timeout=60)
    inner_read = eng.source.read

    def barrier_read(spark_, table, where=None):
        barrier.wait()  # both extracts must be concurrent to pass
        return inner_read(spark_, table, where)

    eng.source.read = barrier_read
    results = eng.sync_all(parallel=2)
    eng.source.read = inner_read
    assert [r.table for r in results] == ["orders", "customer", "ghost"]
    assert results[0].action == "created" and results[0].rows == n_orders
    assert results[1].action == "created" and results[1].rows == n_cust
    assert results[2].action.startswith("error:")
    assert eng.count_table("orders") == n_orders
    assert eng.count_table("customer") == n_cust


def test_sync_all_consistent_requires_snapshot_source(spark, sf_dir, workspace):
    """consistent=True must refuse loudly on a source with no snapshot
    machinery instead of silently syncing inconsistently."""
    src, wh = workspace
    _write_source(spark, src, "orders", _orders(spark, sf_dir, limit=10))
    eng = make_engine(spark, src, wh, {"orders": TableSpec("orders", ["o_orderkey"])})
    with pytest.raises(ValueError, match="snapshot"):
        eng.sync_all(consistent=True)


def test_audit_fk_orphans_engine_counts(spark, sf_dir, workspace):
    """Engine-level FK audit on explicit edges: a child row whose
    parent key is absent counts as an orphan; NULL FK values do not
    (SQL MATCH SIMPLE)."""
    src, wh = workspace
    orders = _orders(spark, sf_dir, limit=100)
    cust = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    present = [r[0] for r in orders.select("o_custkey").distinct().limit(3).collect()]
    # keep all but one referenced customer -> orphans = rows citing it
    cust_missing = cust.filter(F.col("c_custkey") != present[0])
    n_orphans = orders.filter(F.col("o_custkey") == present[0]).count()
    assert n_orphans > 0
    _write_source(spark, src, "orders", orders)
    _write_source(spark, src, "customer", cust_missing)
    eng = make_engine(
        spark,
        src,
        wh,
        {
            "orders": TableSpec("orders", ["o_orderkey"]),
            "customer": TableSpec("customer", ["c_custkey"]),
        },
    )
    edges = [
        {
            "child": "orders",
            "child_cols": ["o_custkey"],
            "parent": "customer",
            "parent_cols": ["c_custkey"],
        }
    ]
    results = eng.sync_all()
    assert all(not r.action.startswith("error") for r in results)
    audit = eng.audit_fk_orphans(edges)
    assert audit[0]["n_orphans"] == n_orphans
    # edges whose tables are not synced are skipped, not crashed
    assert eng.audit_fk_orphans(
        [{"child": "nope", "child_cols": ["x"], "parent": "customer",
          "parent_cols": ["c_custkey"]}]
    ) == []

def test_sync_all_audit_fk_requires_fk_capable_source(spark, sf_dir, workspace):
    """audit_fk=True must refuse loudly on a source with no FK discovery
    (ADVICE r8): silently appending zero audit rows is indistinguishable
    from 'audited, found no orphans'. Mirrors the consistent=True
    contract tested above."""
    src, wh = workspace
    _write_source(spark, src, "orders", _orders(spark, sf_dir, limit=10))
    eng = make_engine(spark, src, wh, {"orders": TableSpec("orders", ["o_orderkey"])})
    assert getattr(eng.source, "discover_foreign_keys", None) is None
    with pytest.raises(ValueError, match="discover_foreign_keys"):
        eng.sync_all(audit_fk=True)


def test_sync_all_audit_fk_zero_edges_marker_row(spark, sf_dir, workspace):
    """A source that CAN discover FKs but declares none yields an
    explicit no-edges marker row, so 'ran, nothing declared' is visible
    in the results rather than silent."""
    src, wh = workspace
    _write_source(spark, src, "orders", _orders(spark, sf_dir, limit=10))
    eng = make_engine(spark, src, wh, {"orders": TableSpec("orders", ["o_orderkey"])})
    eng.source.discover_foreign_keys = lambda: []
    results = eng.sync_all(audit_fk=True)
    marker = [r for r in results if r.action == "no_fk_edges_declared"]
    assert len(marker) == 1 and marker[0].table == "fk_audit"
