"""Transaction-log tables: snapshot isolation, time travel, CDC deletes,
and vacuum safety over the bucketed layout (sync/txlog.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pgwarehouse_spark.sync.txlog import TxTable


def _orders(spark, sf_dir):
    from pgwarehouse_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )


def test_create_read_roundtrip(spark, sf_dir, tmp_path):
    o = _orders(spark, sf_dir)
    t = TxTable.create(o, str(tmp_path / "tx"), ["o_orderkey"], num_buckets=8)
    assert t.versions() == [0]
    got = t.read(spark)
    assert got.count() == o.count()
    assert sorted(got.columns) == sorted(o.columns)


def test_merge_creates_new_version_and_time_travel(spark, sf_dir, tmp_path):
    o = _orders(spark, sf_dir)
    t = TxTable.create(o, str(tmp_path / "tx"), ["o_orderkey"], num_buckets=8)
    delta = o.filter(F.col("o_orderkey") % 100 == 0).withColumn(
        "o_totalprice", F.lit(999.0)
    )
    v = t.merge(spark, delta)
    assert v == 1
    # latest sees updates
    latest = t.read(spark)
    n_delta = delta.count()
    assert latest.filter(F.col("o_totalprice") == 999.0).count() == n_delta
    assert latest.count() == o.count()
    # v0 time travel: no updated rows
    v0 = t.read(spark, version=0)
    assert v0.filter(F.col("o_totalprice") == 999.0).count() == 0
    assert v0.count() == o.count()


def test_snapshot_isolation_reader_survives_merge(spark, sf_dir, tmp_path):
    """A frame resolved at v0 keeps reading v0's immutable files even
    after a merge commits v1 — the property the in-place bucketed layout
    cannot give."""
    o = _orders(spark, sf_dir)
    t = TxTable.create(o, str(tmp_path / "tx"), ["o_orderkey"], num_buckets=8)
    pinned = t.read(spark, version=0)  # resolved BEFORE the merge
    delta = o.limit(50).withColumn("o_totalprice", F.lit(111.0))
    t.merge(spark, delta)
    # pinned frame still computes v0's answer, post-commit
    assert pinned.filter(F.col("o_totalprice") == 111.0).count() == 0
    assert pinned.count() == o.count()


def test_apply_cdc_deletes_and_upserts(spark, sf_dir, tmp_path):
    o = _orders(spark, sf_dir)
    t = TxTable.create(o, str(tmp_path / "tx"), ["o_orderkey"], num_buckets=8)
    n0 = o.count()
    dels = o.filter(F.col("o_orderkey") % 7 == 0).select(
        "*", F.lit("D").alias("op"), F.lit(1).alias("seq")
    )
    ups = o.filter(F.col("o_orderkey") % 7 == 1).select(
        "*", F.lit("U").alias("op"), F.lit(1).alias("seq")
    ).withColumn("o_totalprice", F.lit(55.0))
    v = t.apply_cdc(spark, dels.unionByName(ups), order_col="seq")
    assert v == 1
    latest = t.read(spark).drop("seq")
    n_del = dels.count()
    n_up = ups.count()
    assert latest.count() == n0 - n_del
    assert latest.filter(F.col("o_orderkey") % 7 == 0).count() == 0
    assert latest.filter(F.col("o_totalprice") == 55.0).count() == n_up
    # history intact
    assert t.read(spark, version=0).count() == n0


def test_vacuum_keeps_referenced_versions(spark, sf_dir, tmp_path):
    o = _orders(spark, sf_dir)
    root = str(tmp_path / "tx")
    t = TxTable.create(o, root, ["o_orderkey"], num_buckets=4)
    for i in range(3):
        delta = o.limit(20).withColumn("o_totalprice", F.lit(float(i)))
        t.merge(spark, delta)
    assert t.versions() == [0, 1, 2, 3]
    removed = t.vacuum(keep_last=1)
    # only the latest manifest survives; its buckets may still reference
    # v0 directories for untouched buckets, which must NOT be deleted
    assert t.versions() == [3]
    latest = t.read(spark)
    assert latest.count() == o.count()
    assert latest.filter(F.col("o_totalprice") == 2.0).count() == 20
    # intermediate version dirs unreferenced by v3 are gone
    data = os.listdir(os.path.join(root, "data"))
    for name in removed:
        assert name not in data


def test_sync_engine_transactional_table(spark, sf_dir, tmp_path):
    """End-to-end: a `transactional: true` table syncs through TxTable —
    initial load commits v0, an incremental upsert commits v1, history
    is time-travelable through the engine, and verify/count still work."""
    from pgwarehouse_spark.catalog import Config
    from pgwarehouse_spark.sync.engine import SyncEngine

    src_dir = str(tmp_path / "src")
    o = _orders(spark, sf_dir)
    o.filter(F.col("o_orderdate") < "1997-01-01").write.parquet(
        os.path.join(src_dir, "orders")
    )
    config = Config.from_dict(
        {
            "source": {"type": "parquet", "path": src_dir},
            "warehouse": {"path": str(tmp_path / "wh")},
            "tables": {
                "orders": {
                    "primary_key": "o_orderkey",
                    "last_modified": "o_orderdate",
                    "transactional": True,
                }
            },
        }
    )
    eng = SyncEngine.from_config(spark, config, num_buckets=8)
    r1 = eng.sync("orders")
    assert r1.action in ("created", "reloaded", "loaded", "merged") or r1.rows > 0
    t0 = eng.count_table("orders")
    assert t0 == o.filter(F.col("o_orderdate") < "1997-01-01").count()
    assert eng._is_tx("orders")

    # incremental wave: later rows + an update to one boundary row
    o.filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1998-01-01")
    ).write.mode("append").parquet(os.path.join(src_dir, "orders"))
    r2 = eng.sync("orders")
    assert r2.rows > 0
    t1 = eng.count_table("orders")
    assert t1 == o.filter(F.col("o_orderdate") < "1998-01-01").count()

    # time travel: v0 still answers the pre-incremental count
    assert eng.read_table("orders", version=0).count() == t0
    versions = eng._tx("orders").versions()
    assert versions[0] == 0 and len(versions) >= 2


def test_empty_snapshots_stay_readable(spark, sf_dir, tmp_path):
    """Zero-row create and delete-everything commits keep a readable
    (empty, schema-correct) snapshot — the manifest records the schema."""
    o = _orders(spark, sf_dir).limit(30)
    # zero-row create
    t0 = TxTable.create(
        o.limit(0), str(tmp_path / "tx0"), ["o_orderkey"], num_buckets=4
    )
    empty = t0.read(spark)
    assert empty.count() == 0
    assert sorted(empty.columns) == sorted(o.columns)
    # delete-everything commit
    t1 = TxTable.create(o, str(tmp_path / "tx1"), ["o_orderkey"], num_buckets=4)
    dels = o.select("*", F.lit("D").alias("op"))
    t1.apply_cdc(spark, dels)
    latest = t1.read(spark)
    assert latest.count() == 0
    assert t1.read(spark, version=0).count() == 30


def test_torn_write_without_manifest_is_invisible(spark, sf_dir, tmp_path):
    """Crash safety: a writer that died after writing data files but
    BEFORE publishing the manifest leaves the table exactly at the
    previous version — orphan data dirs are invisible to readers and
    reclaimed by vacuum."""
    o = _orders(spark, sf_dir).limit(100)
    root = str(tmp_path / "tx")
    t = TxTable.create(o, root, ["o_orderkey"], num_buckets=4)
    # simulate a torn commit: data for v1 lands, manifest never does
    torn = os.path.join(root, "data", "v1", "__bucket=0")
    os.makedirs(torn)
    with open(os.path.join(torn, "junk.parquet"), "wb") as f:
        f.write(b"not a parquet file")
    assert t.versions() == [0]
    assert t.read(spark).count() == 100  # reads only manifest-listed paths
    removed = t.vacuum(keep_last=1)
    assert "v1" in removed  # orphan reclaimed
    assert t.read(spark).count() == 100
