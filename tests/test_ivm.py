"""Incremental join-view maintenance: the three-term delta must make the
maintained view exactly equal a full recompute, including bag
multiplicities and retraction weights."""

from __future__ import annotations

from pyspark.sql import functions as F

from pgwarehouse_spark.sources.tables import load_table
from pgwarehouse_spark.sync.ivm import join_view_delta, maintain_join_view


def _bases(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    a_old = o.filter(F.col("o_orderkey") % 7 != 3)
    da = o.filter(F.col("o_orderkey") % 7 == 3)
    b_old = l.filter(F.col("o_orderkey") % 5 != 2)
    db = l.filter(F.col("o_orderkey") % 5 == 2)
    return a_old, da, b_old, db


def _bag(df):
    cols = df.columns
    return {
        tuple(r[c] for c in cols if c != "n"): r["n"]
        for r in df.groupBy(*cols).agg(F.count(F.lit(1)).alias("n")).collect()
    }


def test_maintained_view_equals_full_recompute(spark, sf_dir):
    a_old, da, b_old, db = _bases(spark, sf_dir)
    view_old = a_old.join(b_old, "o_orderkey")
    maintained = maintain_join_view(view_old, a_old, da, b_old, db, "o_orderkey")
    full = a_old.unionByName(da).join(b_old.unionByName(db), "o_orderkey")
    assert _bag(maintained) == _bag(full)
    assert maintained.count() == full.count()


def test_delta_never_contains_old_old_pairs(spark, sf_dir):
    """Every delta row involves at least one delta-side base row: joining
    the delta back against a view computed ONLY from old bases can
    account for none of it (disjoint key slices would make this vacuous,
    so check via composition instead: delta + old == full, old⋂delta
    multiplicity-exact)."""
    a_old, da, b_old, db = _bases(spark, sf_dir)
    dv = join_view_delta(a_old, da, b_old, db, "o_orderkey")
    # dA keys and old-A keys are disjoint by construction; so any dv row
    # joining through dA has a key ∉ a_old. Rows from the A_old⋈dB term
    # carry old A keys but a delta B row. Verify term accounting exactly:
    n_term1 = da.join(b_old, "o_orderkey").count()
    n_term2 = a_old.join(db, "o_orderkey").count()
    n_term3 = da.join(db, "o_orderkey").count()
    assert dv.count() == n_term1 + n_term2 + n_term3


def test_retraction_weights_cancel(spark, sf_dir):
    """Upsert-as-retraction: feeding a delta that contains a -1-weighted
    copy of an old row plus a +1 new version leaves the weighted view
    identical to recomputing with the row replaced (linearity check on a
    small slice)."""
    a_old, da, b_old, db = _bases(spark, sf_dir)
    # retract the first old order and reinsert it with a changed custkey
    first = a_old.orderBy("o_orderkey").limit(1)
    retracted = first.withColumn("w", F.lit(-1))
    replaced = first.withColumn("o_custkey", F.col("o_custkey") + 1).withColumn(
        "w", F.lit(1)
    )
    da_w = da.withColumn("w", F.lit(1)).unionByName(retracted).unionByName(replaced)
    a_old_w = a_old.withColumn("w", F.lit(1))
    b_old_w = b_old.withColumn("bw", F.lit(1))
    db_w = db.withColumn("bw", F.lit(1))
    dv = join_view_delta(a_old_w, da_w, b_old_w, db_w, "o_orderkey")
    view_old = a_old_w.join(b_old_w, "o_orderkey")
    maintained_mass = (
        view_old.unionByName(dv)
        .groupBy("o_custkey")
        .agg(F.sum(F.col("w") * F.col("bw")).alias("m"))
        .filter(F.col("m") != 0)
    )
    # reference: replace the row in A, then full recompute
    a_new = (
        a_old.join(first.select("o_orderkey"), "o_orderkey", "left_anti")
        .unionByName(first.withColumn("o_custkey", F.col("o_custkey") + 1))
        .unionByName(da)
    )
    full = (
        a_new.join(b_old.unionByName(db), "o_orderkey")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("m"))
    )
    got = {(r["o_custkey"]): r["m"] for r in maintained_mass.collect()}
    want = {(r["o_custkey"]): r["m"] for r in full.collect()}
    assert got == want


def test_stream_join_maintenance_matches_batch(spark, sf_dir, tmp_path):
    """Drain a tagged CDC feed (orders + lineitem rows interleaved across
    micro-batches) through per-batch three-term deltas: the maintained
    view must equal the one-shot join of everything fed."""
    import os

    from pgwarehouse_spark.sources.tables import load_table
    from pgwarehouse_spark.streaming.events import (
        read_cdc_join_stream,
        stream_join_maintenance,
    )

    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey")
        .limit(300)
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    ).limit(900)

    feed = str(tmp_path / "feed")
    # 4 part files -> 4 micro-batches (maxFilesPerTrigger=1); hash-split
    # interleaves A and B rows, so every batch exercises the cross terms
    # against prior state
    tagged_a = o.select(
        F.lit("A").alias("side"),
        "o_orderkey",
        "o_custkey",
        F.lit(None).cast("double").alias("l_quantity"),
    )
    tagged_b = l.select(
        F.lit("B").alias("side"),
        "o_orderkey",
        F.lit(None).cast("bigint").alias("o_custkey"),
        "l_quantity",
    )
    tagged_a.unionByName(tagged_b).repartition(4).write.parquet(feed)

    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    stream = read_cdc_join_stream(spark, feed, max_files_per_trigger=1)
    q = stream_join_maintenance(stream, state, checkpoint=ckpt).start()
    q.processAllAvailable()
    q.stop()

    from pgwarehouse_spark.streaming.events import read_cdc_join_view

    view = read_cdc_join_view(spark, state)
    full = o.join(l, "o_orderkey")
    got = _bag(view.select("o_orderkey", "o_custkey", "l_quantity"))
    want = _bag(full.select("o_orderkey", "o_custkey", "l_quantity"))
    assert got == want

    # Replay idempotence (foreachBatch is at-least-once): re-applying an
    # already-committed epoch must leave the view EXACTLY unchanged —
    # the epoch overwrites its own subdirectories with identical content
    # because pre-batch state excludes the epoch's own output.
    from pgwarehouse_spark.streaming.events import apply_cdc_join_batch

    # reconstruct epoch 1's exact batch from its own committed deltas
    ra = spark.read.parquet(os.path.join(state, "base_a", "e1")).select(
        F.lit("A").alias("side"),
        "o_orderkey",
        "o_custkey",
        F.lit(None).cast("double").alias("l_quantity"),
    )
    rb = spark.read.parquet(os.path.join(state, "base_b", "e1")).select(
        F.lit("B").alias("side"),
        "o_orderkey",
        F.lit(None).cast("bigint").alias("o_custkey"),
        "l_quantity",
    )
    apply_cdc_join_batch(ra.unionByName(rb).localCheckpoint(), 1, state)
    got_replay = _bag(
        read_cdc_join_view(spark, state).select(
            "o_orderkey", "o_custkey", "l_quantity"
        )
    )
    assert got_replay == want


def test_stream_join_maintenance_state_read_failure_raises(spark, tmp_path):
    """A corrupt (non-path-missing) state read must RAISE, never silently
    degrade to empty state and drop delta terms."""
    import os

    import pytest

    from pgwarehouse_spark.streaming.events import apply_cdc_join_batch

    state = str(tmp_path / "state")
    bad = os.path.join(state, "base_a", "e0")
    os.makedirs(bad)
    with open(os.path.join(bad, "part-00000.parquet"), "w") as f:
        f.write("this is not parquet")
    batch = spark.createDataFrame(
        [("A", 1, 10, None), ("B", 1, None, 2.0)],
        "side string, o_orderkey bigint, o_custkey bigint, l_quantity double",
    )
    with pytest.raises(Exception):
        apply_cdc_join_batch(batch, 1, state)
