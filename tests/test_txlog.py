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
    # retention_seconds=0: no writer is in flight in these tests —
    # production default leaves fresh unreferenced dirs for the window
    removed = t.vacuum(keep_last=1, retention_seconds=0)
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
    removed = t.vacuum(keep_last=1, retention_seconds=0)
    assert "v1" in removed  # orphan reclaimed
    assert t.read(spark).count() == 100


# ---------------------------------------------------------------------------
# Round 3: multi-writer safety, torn-commit recovery, checkpointing,
# grouped snapshot reads (VERDICT r02 items 5-6; ADVICE r02 medium+low).
# ---------------------------------------------------------------------------


def test_exclusive_publish_one_commit_per_version(tmp_path):
    from pgwarehouse_spark.sync.txlog import (
        CommitConflict,
        _publish_manifest,
        _read_manifest,
    )

    root = str(tmp_path / "tx")
    m = {"version": 1, "keys": ["k"], "num_buckets": 4, "buckets": {},
         "schema": "{}"}
    _publish_manifest(root, 1, m)
    try:
        _publish_manifest(root, 1, dict(m, keys=["other"]))
        raise AssertionError("second publish of v1 must conflict")
    except CommitConflict:
        pass
    # the surviving manifest is the winner's, intact
    assert _read_manifest(root, 1)["keys"] == ["k"]
    # no temp droppings
    mdir = os.path.join(root, "manifest")
    assert [n for n in os.listdir(mdir) if ".tmp-" in n] == []


def test_concurrent_writer_conflict_rebases_and_keeps_both(spark, sf_dir, tmp_path):
    """Two interleaved writers: writer B lands v1 while writer A is
    computing its own v1. A's publish conflicts, A rebases onto B's
    snapshot and commits v2 — both updates survive, exactly one commit
    per version."""
    from pgwarehouse_spark.sync import txlog as tx

    o = _orders(spark, sf_dir).limit(200)
    root = str(tmp_path / "tx")
    t = TxTable.create(o, root, ["o_orderkey"], num_buckets=4)

    keys = [r["o_orderkey"] for r in o.select("o_orderkey").limit(2).collect()]
    delta_a = o.filter(F.col("o_orderkey") == keys[0]).withColumn(
        "o_totalprice", F.lit(111.0)
    )
    delta_b = o.filter(F.col("o_orderkey") == keys[1]).withColumn(
        "o_totalprice", F.lit(222.0)
    )

    # interleave: first time A tries to publish, B sneaks its commit in
    real_publish = tx._publish_manifest
    state = {"injected": False}

    def racing_publish(root_, version, manifest):
        if not state["injected"]:
            state["injected"] = True
            # writer B commits v1 first (through the real path)
            TxTable(root, ["o_orderkey"], 4).merge(spark, delta_b)
        return real_publish(root_, version, manifest)

    tx._publish_manifest = racing_publish
    try:
        v = t.merge(spark, delta_a)
    finally:
        tx._publish_manifest = real_publish

    assert v == 2  # A rebased past B's v1
    assert t.versions() == [0, 1, 2]
    final = t.read(spark)
    assert final.filter(F.col("o_orderkey") == keys[0]).collect()[0][
        "o_totalprice"
    ] == 111.0
    assert final.filter(F.col("o_orderkey") == keys[1]).collect()[0][
        "o_totalprice"
    ] == 222.0
    assert final.count() == 200


def test_torn_commit_does_not_wedge_next_writer(spark, sf_dir, tmp_path):
    """ADVICE r02 (medium): after a crash between the data write and the
    manifest publish, the NEXT commit must succeed (commit-private data
    dirs can't collide) and vacuum reclaims the orphan."""
    o = _orders(spark, sf_dir).limit(100)
    root = str(tmp_path / "tx")
    t = TxTable.create(o, root, ["o_orderkey"], num_buckets=4)

    # simulate the torn commit: stage v1 data exactly like a writer would,
    # then "crash" before publishing
    delta = o.limit(5).withColumn("o_totalprice", F.lit(1.0))
    from pgwarehouse_spark.sync import txlog as tx
    from pgwarehouse_spark.sync.merge import BUCKET_COL, bucket_expr

    staged = delta.withColumn(BUCKET_COL, bucket_expr(["o_orderkey"], 4))
    torn_dir = os.path.join(root, "data", "v1-deadbeef")
    staged.write.partitionBy(BUCKET_COL).parquet(torn_dir)

    # next writer commits v1 without error
    v = t.merge(spark, delta, order_col=None)
    assert v == 1
    assert t.read(spark).filter(F.col("o_totalprice") == 1.0).count() == 5
    removed = t.vacuum(keep_last=1, retention_seconds=0)
    assert "v1-deadbeef" in removed
    assert t.read(spark).count() == 100


def test_checkpoint_resolution_and_vacuum_at_100_versions(spark, sf_dir, tmp_path):
    """VERDICT r02 item 6: 100+ commits; version resolution goes through
    the checkpoint (O(1)+probe, no full listing), vacuum prunes
    manifests past the checkpoint, history/time-travel stay correct."""
    from pgwarehouse_spark.sync import txlog as tx

    o = _orders(spark, sf_dir).limit(50)
    root = str(tmp_path / "tx")
    t = TxTable.create(o, root, ["o_orderkey"], num_buckets=2)
    key = o.select("o_orderkey").limit(1).collect()[0]["o_orderkey"]
    one = o.filter(F.col("o_orderkey") == key)
    n_commits = 2 * tx.CHECKPOINT_INTERVAL + 5  # 45 → crosses 2 checkpoints
    for i in range(1, n_commits + 1):
        v = t.merge(spark, one.withColumn("o_totalprice", F.lit(float(i))))
        assert v == i
    assert tx._read_checkpoint(root) == 2 * tx.CHECKPOINT_INTERVAL
    assert t.latest_version() == n_commits

    # resolution must NOT require listing every v*.json: probe path only
    real_list = tx._list_versions
    tx._list_versions = lambda root_: (_ for _ in ()).throw(
        AssertionError("latest_version fell back to a full listing")
    )
    try:
        assert t.latest_version() == n_commits
    finally:
        tx._list_versions = real_list

    removed = t.vacuum(keep_last=3, retention_seconds=0)
    assert removed  # old commit dirs reclaimed
    # manifest dir is small now: keep_last manifests + checkpoint file
    mdir = os.path.join(root, "manifest")
    assert len(os.listdir(mdir)) <= 3 + 1
    # checkpoint refreshed so the forward probe walks kept versions only
    assert tx._read_checkpoint(root) == n_commits - 2
    assert t.latest_version() == n_commits
    assert t.read(spark).filter(F.col("o_orderkey") == key).collect()[0][
        "o_totalprice"
    ] == float(n_commits)
    # time travel within the kept window
    prev = t.read(spark, version=n_commits - 1)
    assert prev.filter(F.col("o_orderkey") == key).collect()[0][
        "o_totalprice"
    ] == float(n_commits - 1)


def test_snapshot_read_one_scan_per_version_dir(spark, sf_dir, tmp_path):
    """ADVICE r02 (low): a snapshot read groups bucket pointers by
    version directory — the plan carries one parquet scan per referenced
    version, not one per bucket."""
    o = _orders(spark, sf_dir).limit(400)
    root = str(tmp_path / "tx")
    t = TxTable.create(o, root, ["o_orderkey"], num_buckets=16)
    # one merge touching a single key → pointers reference 2 version dirs
    key = o.select("o_orderkey").limit(1).collect()[0]["o_orderkey"]
    t.merge(spark, o.filter(F.col("o_orderkey") == key))
    df = t.read(spark)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    n_scans = plan.count("Relation")
    assert n_scans == 2, plan  # v0 dir + v1 dir, NOT 16 bucket scans
    assert df.count() == 400


def test_compact_rewrites_fragmented_buckets_as_new_version(spark, sf_dir, tmp_path):
    """Round 3: small-file compaction — repeated merges fragment hot
    buckets into one file per commit; compact() collapses each
    fragmented bucket to one sorted file in a new version, leaves
    already-compact buckets' pointers untouched, and preserves both the
    current snapshot and time travel."""
    import glob as _glob

    o = _orders(spark, sf_dir).limit(200)
    root = str(tmp_path / "tx")
    # fragment the create the way it happens at scale: a bucket larger
    # than maxRecordsPerFile splits into several files
    prev = spark.conf.get("spark.sql.files.maxRecordsPerFile", "0")
    spark.conf.set("spark.sql.files.maxRecordsPerFile", "20")
    try:
        t = TxTable.create(o, root, ["o_orderkey"], num_buckets=4)
    finally:
        spark.conf.set("spark.sql.files.maxRecordsPerFile", prev)
    # one ordinary merge so the table also has multi-version pointers
    k0 = o.select("o_orderkey").limit(1).collect()[0]["o_orderkey"]
    t.merge(
        spark,
        o.filter(F.col("o_orderkey") == k0).withColumn(
            "o_totalprice", F.lit(0.0)
        ),
    )
    pre_v = t.latest_version()
    pre_rows = {r["o_orderkey"]: r["o_totalprice"] for r in t.read(spark).collect()}

    from pgwarehouse_spark.sync.txlog import _read_manifest

    pre_m = _read_manifest(root, pre_v)

    def nfiles(rel):
        return len(_glob.glob(os.path.join(root, rel, "*.parquet")))

    assert any(nfiles(rel) >= 2 for rel in pre_m["buckets"].values())

    v = t.compact(spark)
    assert v == pre_v + 1
    post_m = _read_manifest(root, v)
    # every bucket now holds exactly one file
    assert all(nfiles(rel) == 1 for rel in post_m["buckets"].values())
    # untouched (already-compact) buckets kept their old pointers
    untouched = [
        b for b, rel in pre_m["buckets"].items() if nfiles(rel) == 1
    ]
    for b in untouched:
        assert post_m["buckets"][b] == pre_m["buckets"][b]
    # content identical
    post_rows = {r["o_orderkey"]: r["o_totalprice"] for r in t.read(spark).collect()}
    assert post_rows == pre_rows
    # time travel to the pre-compaction version still works
    assert t.read(spark, version=pre_v).count() == 200
    # compacting an already-compact table is a no-op version-wise
    assert t.compact(spark) == v


def test_merge_schema_evolution_updates_manifest_schema(spark, sf_dir, tmp_path):
    """Round 3: a widening merge (delta grew a column) must surface the
    new column — in reads, in old-version time travel (as nulls via
    allowMissingColumns is NOT expected: old snapshots keep the old
    schema), and in the manifest schema that an empty snapshot would
    fall back to."""
    import json as _json

    from pgwarehouse_spark.sync.txlog import _read_manifest

    o = _orders(spark, sf_dir).limit(100)
    root = str(tmp_path / "tx")
    t = TxTable.create(o, root, ["o_orderkey"], num_buckets=4)
    delta = o.limit(5).withColumn("o_channel", F.lit("web"))
    v = t.merge(spark, delta)

    cur = t.read(spark)
    assert "o_channel" in cur.columns
    assert cur.filter(F.col("o_channel") == "web").count() == 5
    # untouched rows read the new column as null
    assert cur.filter(F.col("o_channel").isNull()).count() == 95
    # the committed manifest records the widened schema
    m = _read_manifest(root, v)
    fields = {f["name"] for f in _json.loads(m["schema"])["fields"]}
    assert "o_channel" in fields
    # pre-evolution snapshot unchanged
    assert "o_channel" not in t.read(spark, version=0).columns


def test_concurrent_threaded_writers_lose_no_updates(spark, sf_dir, tmp_path):
    """Genuine concurrency (not injected interleaving): two driver
    threads each commit 5 single-key merges against the same table.
    Optimistic concurrency must serialize them into exactly 10 new
    versions with every update's final value visible — no lost updates,
    no torn reads, no duplicate versions."""
    import threading

    o = _orders(spark, sf_dir).limit(200)
    root = str(tmp_path / "tx")
    t = TxTable.create(o, root, ["o_orderkey"], num_buckets=4)
    keys = [r["o_orderkey"] for r in o.select("o_orderkey").limit(10).collect()]
    errors = []

    def writer(my_keys, base_val):
        try:
            w = TxTable(root, ["o_orderkey"], 4)
            for i, k in enumerate(my_keys):
                delta = o.filter(F.col("o_orderkey") == k).withColumn(
                    "o_totalprice", F.lit(float(base_val + i))
                )
                w.merge(spark, delta, max_retries=20)
        except Exception as exc:  # surface in the main thread
            errors.append(exc)

    t1 = threading.Thread(target=writer, args=(keys[:5], 1000))
    t2 = threading.Thread(target=writer, args=(keys[5:], 2000))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errors, errors

    assert t.versions() == list(range(11))  # v0 + exactly 10 commits
    final = {
        r["o_orderkey"]: r["o_totalprice"]
        for r in t.read(spark).filter(F.col("o_orderkey").isin(keys)).collect()
    }
    for i, k in enumerate(keys[:5]):
        assert final[k] == float(1000 + i), (k, final[k])
    for i, k in enumerate(keys[5:]):
        assert final[k] == float(2000 + i), (k, final[k])
    assert t.read(spark).count() == 200


# ---------------------------------------------------------------------------
# Round 4: vacuum retention guard (ADVICE r03 medium), process-level
# commit exclusivity (VERDICT r03 item 7), schema-widening commits
# (ADVICE r03 low).
# ---------------------------------------------------------------------------


def test_vacuum_retention_protects_inflight_staging(spark, sf_dir, tmp_path):
    """ADVICE r03 (medium): a FRESH unreferenced data dir is
    indistinguishable from a torn-commit orphan by name — it may be a
    live writer's commit-private staging whose manifest publish hasn't
    happened yet. Default-retention vacuum must leave it alone; only
    once every file in it is older than the retention window is it
    reclaimed."""
    import time as _time

    o = _orders(spark, sf_dir).limit(50)
    root = str(tmp_path / "tx")
    t = TxTable.create(o, root, ["o_orderkey"], num_buckets=2)

    # simulate an in-flight writer: staged data, no manifest yet
    staging = os.path.join(root, "data", "v1-cafebabe", "__bucket=0")
    os.makedirs(staging)
    with open(os.path.join(staging, "part-000.parquet"), "wb") as f:
        f.write(b"in-flight bytes")

    # default retention: the fresh dir SURVIVES vacuum
    removed = t.vacuum(keep_last=1)
    assert "v1-cafebabe" not in removed
    assert os.path.isdir(staging)

    # age the whole tree past a 1-hour window -> now reclaimable
    old = _time.time() - 7200
    for dirpath, _dn, fns in os.walk(os.path.join(root, "data", "v1-cafebabe")):
        os.utime(dirpath, (old, old))
        for fn in fns:
            os.utime(os.path.join(dirpath, fn), (old, old))
    removed = t.vacuum(keep_last=1, retention_seconds=3600)
    assert "v1-cafebabe" in removed
    assert not os.path.isdir(staging)
    assert t.read(spark).count() == 50


def _mp_publish_race_worker(args):
    """Top-level (picklable) worker for the cross-process commit race:
    claims versions with the real exclusive-publish protocol, rebasing
    to the next version on conflict — the manifest half of merge()'s
    optimistic-concurrency loop, with no Spark in the child."""
    repo_root, tx_root, wid, n_commits = args
    import sys as _sys

    _sys.path.insert(0, repo_root)
    from pgwarehouse_spark.sync.txlog import CommitConflict, _publish_manifest

    committed, v = [], 0
    while len(committed) < n_commits:
        v += 1
        try:
            _publish_manifest(
                tx_root,
                v,
                {
                    "version": v,
                    "keys": ["k"],
                    "num_buckets": 1,
                    "buckets": {},
                    "schema": "{}",
                    "writer": wid,
                    # sizable payload so a torn (non-atomic) write would
                    # surface as truncated JSON in the reader below
                    "pad": "x" * 4096,
                },
            )
            committed.append(v)
        except CommitConflict:
            continue
    return committed


def test_multiprocess_exclusive_publish_one_winner_per_version(tmp_path):
    """VERDICT r03 item 7: the os.link exclusivity claim proven ACROSS
    PROCESSES, not threads in one interpreter. Two spawned processes
    race 25 commits each against one table; exactly one winner per
    version, a contiguous version chain, and every manifest readable
    and intact (no torn reads)."""
    import json as _json
    import multiprocessing as mp

    from pgwarehouse_spark.sync.txlog import _read_manifest

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = str(tmp_path / "tx")
    n_each = 25
    ctx = mp.get_context("spawn")
    with ctx.Pool(2) as pool:
        results = pool.map(
            _mp_publish_race_worker,
            [(repo_root, root, "A", n_each), (repo_root, root, "B", n_each)],
        )
    a, b = results
    assert len(a) == n_each and len(b) == n_each
    assert not (set(a) & set(b)), "a version committed by both writers"
    assert sorted(set(a) | set(b)) == list(range(1, 2 * n_each + 1))
    for v in range(1, 2 * n_each + 1):
        m = _read_manifest(root, v)  # parses -> not torn
        assert m["version"] == v
        assert m["writer"] in ("A", "B")
        assert len(m["pad"]) == 4096
    # no temp droppings from losing publishes
    mdir = os.path.join(root, "manifest")
    assert [n for n in os.listdir(mdir) if ".tmp-" in n] == []


def test_narrow_delta_into_absent_buckets_keeps_table_schema(
    spark, sf_dir, tmp_path
):
    """ADVICE r03 (low): when a delta touches only buckets ABSENT from
    the manifest, merge() commits the delta frame as-is — a delta
    narrower than the table must not narrow the manifest's recorded
    schema, or an empty-after-delete snapshot read would silently drop
    columns."""
    import json as _json

    from pgwarehouse_spark.sync.txlog import _read_manifest

    o = _orders(spark, sf_dir).limit(40)
    root = str(tmp_path / "tx")
    t = TxTable.create(o, root, ["o_orderkey"], num_buckets=4)

    # drop every bucket's contents via CDC deletes, so some buckets
    # leave the manifest entirely
    dels = o.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    v = t.apply_cdc(spark, dels.withColumn("op", F.lit("D")))
    assert t.read(spark).count() == 0

    # a NARROW delta (missing o_orderdate) into now-absent buckets
    narrow = (
        o.limit(5)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .withColumn("o_totalprice", F.lit(9.0))
    )
    v = t.merge(spark, narrow)
    m = _read_manifest(root, v)
    fields = {f["name"] for f in _json.loads(m["schema"])["fields"]}
    # the table's full schema survives the narrow commit
    assert "o_orderdate" in fields
    # and a subsequent delete-all snapshot still carries the full schema
    t.apply_cdc(
        spark,
        t.read(spark)
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .withColumn("op", F.lit("D")),
    )
    empty = t.read(spark)
    assert empty.count() == 0
    assert "o_orderdate" in empty.columns
