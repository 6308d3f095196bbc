"""Structured Streaming tests: drive file-based streams to completion
synchronously (memory sink + processAllAvailable) and assert parity with
the batch operators / sync results."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F


@pytest.fixture()
def events_stream_dir(spark, sf_dir, tmp_path):
    """Stage events as multiple parquet files so maxFilesPerTrigger yields
    several micro-batches (late/out-of-order arrival included: files are
    split by hash, not time)."""
    from pgwarehouse_spark.sources.tables import load_table

    out = str(tmp_path / "events_stream")
    load_table(spark, sf_dir, "events").repartition(4).write.parquet(out)
    return out


def _run_to_completion(stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete" if name.endswith("agg") else "append")
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_stream_tumbling_matches_batch(spark, sf_dir, events_stream_dir):
    from pgwarehouse_spark.operators.eventwindows import events_tumbling_window
    from pgwarehouse_spark.streaming.events import (
        read_event_stream,
        stream_tumbling_counts,
    )

    stream = read_event_stream(spark, events_stream_dir, max_files_per_trigger=1)
    _run_to_completion(stream_tumbling_counts(stream), "tumbling_agg")
    got = {
        (r.wstart, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in spark.sql("select * from tumbling_agg").collect()
    }
    want = {
        (r.wstart, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in events_tumbling_window(spark, sf_dir).collect()
    }
    assert got == want


def test_stream_dedup_exactly_once(spark, events_stream_dir, tmp_path):
    from pgwarehouse_spark.streaming.events import read_event_stream, stream_dedup

    # Duplicate the whole directory's contents into the stream twice.
    dup_dir = str(tmp_path / "events_dup")
    df = spark.read.parquet(events_stream_dir)
    df.write.parquet(dup_dir)
    df.write.mode("append").parquet(dup_dir)
    assert spark.read.parquet(dup_dir).count() == 2 * df.count()

    stream = read_event_stream(spark, dup_dir, max_files_per_trigger=2)
    _run_to_completion(stream_dedup(stream), "dedup_stream")
    got = spark.sql("select count(*) c, count(distinct event_id) d from dedup_stream").collect()[0]
    assert got.c == got.d == df.count()


def test_stream_sync_merges_into_warehouse(spark, sf_dir, tmp_path):
    """End-to-end streaming sync: two waves of source files; second wave
    contains updated rows (same keys, newer ts) — final warehouse state
    reflects last-writer-wins, exactly once."""
    from pgwarehouse_spark.sources.tables import load_table
    from pgwarehouse_spark.streaming.events import read_event_stream, stream_sync

    src = str(tmp_path / "incoming")
    wh = str(tmp_path / "wh_events")
    ckpt = str(tmp_path / "ckpt")
    events = load_table(spark, sf_dir, "events")
    wave1 = events.filter(F.col("event_id") < 500)
    wave1.write.parquet(src)

    stream = read_event_stream(spark, src, max_files_per_trigger=4)
    q = stream_sync(
        stream, wh, keys=["event_id"], num_buckets=4, checkpoint=ckpt
    ).start()
    q.processAllAvailable()

    # wave 2: 100 updated rows (value bumped, ts advanced) + 100 new rows
    updated = (
        events.filter(F.col("event_id") < 100)
        .withColumn("value", F.lit(1234.5))
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 10 DAYS"))
    )
    new = events.filter((F.col("event_id") >= 500) & (F.col("event_id") < 600))
    updated.unionByName(new).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    wh_df = spark.read.parquet(wh).drop("__bucket")
    assert wh_df.count() == 600  # 500 original + 100 new, updates in place
    assert (
        wh_df.filter((F.col("event_id") < 100) & (F.col("value") == 1234.5)).count()
        == 100
    )


def test_stream_running_totals_stateful(spark, sf_dir, events_stream_dir):
    """applyInPandasWithState keeps per-user state across micro-batches:
    after draining the stream, the latest emitted running totals equal
    the batch groupBy answer."""
    from pgwarehouse_spark.sources.tables import load_table
    from pgwarehouse_spark.streaming.events import (
        read_event_stream,
        stream_running_totals,
    )

    stream = read_event_stream(spark, events_stream_dir, max_files_per_trigger=1)
    q = (
        stream_running_totals(stream)
        .writeStream.format("memory")
        .queryName("running_totals")
        .outputMode("update")
        .start()
    )
    q.processAllAvailable()
    q.stop()

    # update-mode memory sink appends one row per touched key per batch;
    # the row with the max n_events per user is the final state.
    got = {
        r.user_id: (r.n_events, round(r.sum_value, 6))
        for r in spark.sql(
            """
            select user_id, n_events, sum_value from (
              select *, row_number() over (
                partition by user_id order by n_events desc
              ) rn from running_totals
            ) where rn = 1
            """
        ).collect()
    }
    want = {
        r.user_id: (r.n, round(r.s, 6))
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.coalesce("value", F.lit(0.0))).alias("s"))
        .collect()
    }
    assert set(got) == set(want)
    assert all(got[k][0] == want[k][0] for k in want)
    # sums accumulate in arrival order — compare with fp tolerance
    assert all(abs(got[k][1] - want[k][1]) < 1e-6 for k in want)


def test_stream_sessionize_runs(spark, events_stream_dir):
    from pgwarehouse_spark.streaming.events import (
        read_event_stream,
        stream_sessionize,
    )

    stream = read_event_stream(spark, events_stream_dir, max_files_per_trigger=2)
    _run_to_completion(stream_sessionize(stream), "session_agg")
    rows = spark.sql("select * from session_agg").collect()
    assert rows
    assert all(r.session_start <= r.session_end for r in rows)


def test_stream_enrich_matches_batch_join(spark, sf_dir, events_stream_dir):
    """Stream-static broadcast enrichment must equal the equivalent batch
    left join, row for row."""
    from pgwarehouse_spark.sources.tables import load_table
    from pgwarehouse_spark.streaming.events import read_event_stream, stream_enrich

    dim = load_table(spark, sf_dir, "customer")
    stream = read_event_stream(spark, events_stream_dir, max_files_per_trigger=2)
    q = (
        stream_enrich(stream, dim)
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.event_id, r.segment, r.nationkey)
        for r in spark.sql("select * from enriched").collect()
    }
    events = load_table(spark, sf_dir, "events")
    want = {
        (r.event_id, r.segment, r.nationkey)
        for r in stream_enrich(events, dim).collect()
    }
    assert got == want and len(got) == events.count()


def test_stream_stream_interval_join_matches_batch(spark, sf_dir, events_stream_dir):
    """Stream-stream interval join (purchase attributed to same-user views
    in the preceding hour) must produce exactly the batch self-join rows
    once both streams drain."""
    from pgwarehouse_spark.sources.tables import load_table
    from pgwarehouse_spark.streaming.events import (
        read_event_stream,
        stream_stream_attribution,
    )

    stream = read_event_stream(spark, events_stream_dir, max_files_per_trigger=2)
    q = (
        stream_stream_attribution(stream)
        .writeStream.format("memory")
        .queryName("attributed")
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.user_id, r.view_id, r.purchase_id)
        for r in spark.sql("select * from attributed").collect()
    }
    events = load_table(spark, sf_dir, "events")
    want = {
        (r.user_id, r.view_id, r.purchase_id)
        for r in stream_stream_attribution(events).collect()
    }
    assert got == want
    assert got  # the interval join is non-degenerate at sf0.01


def test_stream_rollup_maintenance_matches_batch(spark, sf_dir, events_stream_dir, tmp_path):
    """Continuous aggregate: after draining the stream through per-batch
    additive merges, the rollup table equals the batch groupBy answer."""
    from pgwarehouse_spark.sources.tables import load_table
    from pgwarehouse_spark.streaming.events import (
        read_event_stream,
        stream_rollup_maintenance,
    )
    from pgwarehouse_spark.sync.rollup import read_rollup

    rollup = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")
    stream = read_event_stream(spark, events_stream_dir, max_files_per_trigger=1)
    q = stream_rollup_maintenance(stream, rollup, checkpoint=ckpt).start()
    q.processAllAvailable()
    q.stop()

    got = {
        (r.hour, r.event_type): (r.n_events, round(r.sum_value, 6))
        for r in read_rollup(spark, rollup).collect()
    }
    want = {
        (r.hour, r.event_type): (r.n, round(r.s, 6))
        for r in load_table(spark, sf_dir, "events")
        .withColumn("hour", F.date_trunc("hour", F.col("ts")))
        .groupBy("hour", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.coalesce("value", F.lit(0.0))).alias("s"),
        )
        .collect()
    }
    assert set(got) == set(want)
    assert all(got[k][0] == want[k][0] for k in want)
    assert all(abs(got[k][1] - want[k][1]) < 1e-6 for k in want)

    # the maintained distinct-user sketch must estimate exactly what a
    # one-shot sketch over all data estimates (union across micro-batches
    # leaves identical register state)
    got_sk = {
        (r.hour, r.event_type): r.est
        for r in read_rollup(spark, rollup)
        .select(
            "hour",
            "event_type",
            F.expr("hll_sketch_estimate(sk_users)").alias("est"),
        )
        .collect()
    }
    want_sk = {
        (r.hour, r.event_type): r.est
        for r in load_table(spark, sf_dir, "events")
        .withColumn("hour", F.date_trunc("hour", F.col("ts")))
        .groupBy("hour", "event_type")
        .agg(F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))").alias("est"))
        .collect()
    }
    assert got_sk == want_sk


def test_stream_sync_restart_resumes_from_checkpoint(spark, sf_dir, tmp_path):
    """Exactly-once across restarts: stop the query after wave 1, start a
    NEW query instance on the same checkpoint, feed wave 2 — no replays
    (no double-merge of wave 1), no gaps."""
    from pgwarehouse_spark.sources.tables import load_table
    from pgwarehouse_spark.streaming.events import read_event_stream, stream_sync

    src = str(tmp_path / "incoming")
    wh = str(tmp_path / "wh_events")
    ckpt = str(tmp_path / "ckpt")
    events = load_table(spark, sf_dir, "events")
    events.filter(F.col("event_id") < 400).write.parquet(src)

    q1 = read_event_stream(spark, src, max_files_per_trigger=4)
    h1 = stream_sync(q1, wh, keys=["event_id"], num_buckets=4, checkpoint=ckpt).start()
    h1.processAllAvailable()
    h1.stop()
    assert spark.read.parquet(wh).count() == 400

    # second wave lands while no query is running
    events.filter((F.col("event_id") >= 400) & (F.col("event_id") < 450)).write.mode(
        "append"
    ).parquet(src)

    q2 = read_event_stream(spark, src, max_files_per_trigger=4)
    h2 = stream_sync(q2, wh, keys=["event_id"], num_buckets=4, checkpoint=ckpt).start()
    h2.processAllAvailable()
    h2.stop()

    wh_df = spark.read.parquet(wh)
    assert wh_df.count() == 450  # wave 1 not replayed, wave 2 complete
    assert wh_df.select("event_id").distinct().count() == 450


def test_stream_near_dup_filter_across_batches(spark, tmp_path):
    """Streaming ingest filter: duplicates are dropped WITHIN a batch
    (first-seen wins) and ACROSS batches via the maintained band index;
    distinct docs always pass. Batches arrive in doc_id order
    (maxFilesPerTrigger=1, one file per batch)."""
    import os

    from pgwarehouse_spark.streaming.events import (
        read_document_stream,
        stream_near_dup_filter,
    )

    def doc(i, words):
        return (i, " ".join(words))

    base = [f"tok{j}" for j in range(30)]
    other = [f"alt{j}" for j in range(30)]
    # batch 1: A(1), B(2, distinct), E(3, dup of A — in-batch drop)
    b1 = [doc(1, base), doc(2, other), doc(3, base)]
    # batch 2: C(10, dup of A — cross-batch drop), D(11, distinct)
    b2 = [doc(10, base[:-1] + ["tokx"]), doc(11, [f"new{j}" for j in range(30)])]

    src = str(tmp_path / "docs_src")
    os.makedirs(src)
    schema = "doc_id BIGINT, text STRING"
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(src)

    accepted = str(tmp_path / "accepted")
    index = str(tmp_path / "bands")
    stream = read_document_stream(spark, src, max_files_per_trigger=1)
    q = stream_near_dup_filter(
        stream, accepted, index, checkpoint=str(tmp_path / "ckpt")
    ).trigger(availableNow=True).start()
    q.awaitTermination(120)

    got = sorted(
        r.doc_id for r in spark.read.parquet(accepted).select("doc_id").collect()
    )
    assert got == [1, 2, 11], got
    # the index holds band keys for exactly the accepted docs
    idx_docs = {
        r.doc_id for r in spark.read.parquet(index).select("doc_id").distinct().collect()
    }
    assert idx_docs == {1, 2, 11}


def test_stream_dedup_within_watermark_collapses_restamped(spark, tmp_path):
    """Two deliveries of the same event_id with different ts (producer
    restamp) must collapse to one row; distinct ids all survive."""
    from pgwarehouse_spark.streaming.events import (
        read_event_stream,
        stream_dedup_within_watermark,
    )

    src = str(tmp_path / "restamped")
    rows = [
        (1, "2024-01-01 10:00:00", 1, "click", 1.0, "{}"),
        (2, "2024-01-01 10:01:00", 2, "click", 2.0, "{}"),
    ]
    redelivered = [
        # same event_id=1, restamped 30s later — inside the horizon
        (1, "2024-01-01 10:00:30", 1, "click", 1.0, "{}"),
        (3, "2024-01-01 10:02:00", 3, "view", 3.0, "{}"),
    ]
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    for i, batch in enumerate([rows, redelivered]):
        spark.createDataFrame(batch, cols).withColumn(
            "ts", F.to_timestamp("ts")
        ).coalesce(1).write.mode("append").parquet(src)

    stream = read_event_stream(spark, src, max_files_per_trigger=1)
    _run_to_completion(stream_dedup_within_watermark(stream), "dedup_wm")
    got = spark.sql("select event_id from dedup_wm").collect()
    ids = sorted(r.event_id for r in got)
    assert ids == [1, 2, 3], ids


def test_stream_scd2_maintenance_matches_batch(spark, sf_dir, tmp_path):
    """Streaming SCD2: drain a time-ordered event feed through per-batch
    interval maintenance; the compacted state must equal the one-shot
    scd2_intervals history."""
    import os
    import time as _time

    from pgwarehouse_spark.operators.syncshapes import scd2_intervals
    from pgwarehouse_spark.sources.tables import load_table
    from pgwarehouse_spark.streaming.events import (
        read_event_stream,
        read_scd2_state,
        stream_scd2_maintenance,
    )

    e = load_table(spark, sf_dir, "events")
    # 4 time-ordered chunks (the in-order-per-entity contract); explicit
    # mtimes pin the FileStreamSource processing order
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    tq = [r[0] for r in e.selectExpr(
        "percentile(unix_micros(ts), array(0.25, 0.5, 0.75)) AS q"
    ).selectExpr("explode(q)").collect()]
    um = F.unix_micros(F.col("ts"))
    chunks = [
        e.filter(um <= tq[0]),
        e.filter((um > tq[0]) & (um <= tq[1])),
        e.filter((um > tq[1]) & (um <= tq[2])),
        e.filter(um > tq[2]),
    ]
    for i, c in enumerate(chunks):
        p = os.path.join(feed, f"chunk_{i}")
        c.coalesce(1).write.parquet(p)
        # move the part file up with an increasing mtime
        part = [f for f in os.listdir(p) if f.endswith(".parquet")][0]
        dst = os.path.join(feed, f"{i:03d}.parquet")
        os.rename(os.path.join(p, part), dst)
        os.utime(dst, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
        import shutil

        shutil.rmtree(p)

    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    stream = read_event_stream(spark, feed, max_files_per_trigger=1)
    q = stream_scd2_maintenance(stream, state, checkpoint=ckpt).start()
    q.processAllAvailable()
    q.stop()

    got = {
        (r.user_id, r.valid_from): (r.event_type, r.valid_to, r.is_current)
        for r in read_scd2_state(spark, state).collect()
    }
    want = {
        (r.user_id, r.valid_from): (r.event_type, r.valid_to, r.is_current)
        for r in scd2_intervals(spark, sf_dir).collect()
    }
    assert got == want


def test_stream_cdc_apply_opcodes(spark, sf_dir, tmp_path):
    """Streaming CDC APPLY: I/U/D opcode feed maintains the bucketed
    warehouse — updates replace, deletes physically remove, and a key
    whose batch-net opcode is D (insert then delete within one batch)
    never lands."""
    from pgwarehouse_spark.sources.tables import load_table
    from pgwarehouse_spark.streaming.events import stream_cdc_apply

    src = str(tmp_path / "cdc_feed")
    wh = str(tmp_path / "wh_cdc")
    ckpt = str(tmp_path / "ckpt_cdc")
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )

    wave1 = events.filter(F.col("event_id") < 500).select(
        "*", F.lit("I").alias("op"), F.lit(1).alias("seq")
    )
    wave1.write.parquet(src)

    stream = (
        spark.readStream.schema(wave1.schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(src)
    )
    q = stream_cdc_apply(
        stream, wh, keys=["event_id"], num_buckets=4, checkpoint=ckpt
    ).start()
    q.processAllAvailable()
    assert spark.read.parquet(wh).count() == 500

    updates = (
        events.filter(F.col("event_id") < 100)
        .withColumn("value", F.lit(777.0))
        .select("*", F.lit("U").alias("op"), F.lit(2).alias("seq"))
    )
    deletes = (
        events.filter((F.col("event_id") >= 400) & (F.col("event_id") < 450))
        .select("*", F.lit("D").alias("op"), F.lit(2).alias("seq"))
    )
    inserts = (
        events.filter((F.col("event_id") >= 500) & (F.col("event_id") < 600))
        .select("*", F.lit("I").alias("op"), F.lit(2).alias("seq"))
    )
    # same-batch insert-then-delete: net effect is D, must never land
    ephemeral = (
        events.filter(F.col("event_id") == 700)
        .select("*", F.lit("I").alias("op"), F.lit(3).alias("seq"))
        .unionByName(
            events.filter(F.col("event_id") == 700).select(
                "*", F.lit("D").alias("op"), F.lit(4).alias("seq")
            )
        )
    )
    # ONE file for the whole second wave: the file source orders new
    # files by (mtime, path), and parallel write tasks finish in
    # arbitrary order under load — split across files, D(700) could get
    # an earlier mtime than I(700), land in an earlier micro-batch, and
    # the insert would survive (observed as a 551-row flake in a full-
    # suite run under CPU contention). A CDC feed's per-key ordering
    # guarantee maps to one file here; the same-batch net-effect
    # collapse is exactly what this wave exists to exercise.
    updates.unionByName(deletes).unionByName(inserts).unionByName(
        ephemeral
    ).coalesce(1).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    final = spark.read.parquet(wh)
    assert final.count() == 550  # 500 - 50 deleted + 100 inserted
    assert final.filter(F.col("event_id") == 700).count() == 0
    assert (
        final.filter((F.col("event_id") < 100) & (F.col("value") == 777.0)).count()
        == 100
    )
    assert final.filter(
        (F.col("event_id") >= 400) & (F.col("event_id") < 450)
    ).count() == 0


def test_stream_cdc_apply_restart_resumes_from_checkpoint(spark, sf_dir, tmp_path):
    """Exactly-once CDC apply across restarts: stop after wave 1 (inserts),
    restart a NEW query on the same checkpoint with wave 2 (deletes) —
    wave 1 is not replayed, deletes land exactly once."""
    from pgwarehouse_spark.sources.tables import load_table
    from pgwarehouse_spark.streaming.events import stream_cdc_apply

    src = str(tmp_path / "cdc_feed")
    wh = str(tmp_path / "wh_cdc")
    ckpt = str(tmp_path / "ckpt_cdc")
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "value"
    )
    wave1 = events.filter(F.col("event_id") < 300).select(
        "*", F.lit("I").alias("op"), F.lit(1).alias("seq")
    )
    wave1.write.parquet(src)

    def new_query():
        stream = (
            spark.readStream.schema(wave1.schema)
            .option("maxFilesPerTrigger", 4)
            .parquet(src)
        )
        return stream_cdc_apply(
            stream, wh, keys=["event_id"], num_buckets=4, checkpoint=ckpt
        ).start()

    h1 = new_query()
    h1.processAllAvailable()
    h1.stop()
    assert spark.read.parquet(wh).count() == 300

    # deletes land while no query runs
    events.filter(F.col("event_id") < 40).select(
        "*", F.lit("D").alias("op"), F.lit(2).alias("seq")
    ).write.mode("append").parquet(src)

    h2 = new_query()
    h2.processAllAvailable()
    h2.stop()
    final = spark.read.parquet(wh)
    assert final.count() == 260
    assert final.filter(F.col("event_id") < 40).count() == 0


def test_stream_sync_transactional_versions(spark, sf_dir, tmp_path):
    """stream_sync(transactional=True): each micro-batch wave commits a
    snapshot version; history time-travels."""
    from pgwarehouse_spark.sources.tables import load_table
    from pgwarehouse_spark.streaming.events import read_event_stream, stream_sync
    from pgwarehouse_spark.sync.txlog import TxTable

    src = str(tmp_path / "incoming")
    wh = str(tmp_path / "wh_tx")
    ckpt = str(tmp_path / "ckpt_tx")
    events = load_table(spark, sf_dir, "events")
    events.filter(F.col("event_id") < 200).write.parquet(src)

    q = stream_sync(
        read_event_stream(spark, src, max_files_per_trigger=100),
        wh,
        keys=["event_id"],
        num_buckets=4,
        checkpoint=ckpt,
        transactional=True,
    ).start()
    q.processAllAvailable()
    events.filter(
        (F.col("event_id") >= 200) & (F.col("event_id") < 260)
    ).write.mode("append").parquet(src)
    q.processAllAvailable()
    q.stop()

    t = TxTable(wh, ["event_id"], 4)
    assert len(t.versions()) >= 2
    assert t.read(spark).count() == 260
    assert t.read(spark, version=0).count() == 200


def test_stream_stream_left_outer_emits_unmatched_after_watermark(
    spark, sf_dir, tmp_path
):
    """Round 3: left-outer interval join — unmatched purchases must emit
    with null view columns, but only after the watermark passes the join
    horizon. A sentinel event far in the future pushes the watermark so
    every withheld outer row flushes; the drained result must equal the
    batch left-outer join."""
    from pgwarehouse_spark.sources.tables import load_table
    from pgwarehouse_spark.streaming.events import (
        read_event_stream,
        stream_stream_attribution,
    )

    events = load_table(spark, sf_dir, "events")
    out = str(tmp_path / "ev")
    events.repartition(4).write.parquet(out)

    sink = str(tmp_path / "attributed_out")
    ckpt = str(tmp_path / "ckpt")

    def run_drain():
        q = (
            stream_stream_attribution(
                read_event_stream(spark, out, max_files_per_trigger=2),
                how="left_outer",
            )
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run_drain()
    n_before = spark.read.parquet(sink).count()

    # sentinel: one far-future purchase for an unused user pushes the
    # event-time watermark past every real event's join horizon. The
    # checkpointed RESTART guarantees it is processed AFTER every real
    # file — appending it to a fresh uncheckpointed run could batch it
    # first and mark the real events late.
    far = events.agg(F.max("ts")).collect()[0][0]
    # BOTH event types: the join's global watermark is the MIN of the
    # view-side and purchase-side watermarks, so advancing only one
    # side would hold the horizon back forever
    sentinel = spark.createDataFrame(
        [
            (10_000_000, far, 999_999_999, "purchase", 0.0, "{}"),
            (10_000_002, far, 999_999_999, "view", 0.0, "{}"),
        ],
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string",
    ).withColumn("ts", F.col("ts") + F.expr("INTERVAL 30 DAY"))
    sentinel.write.mode("append").parquet(out)
    run_drain()
    # the watermark only ADVANCES at the end of the sentinel batch, and
    # outer-null eviction runs in the NEXT batch — push a second
    # sentinel so that batch exists (the standard outer-join flush
    # pattern; without it the trailing nulls stay withheld forever on a
    # quiet file source)
    sentinel.withColumn("event_id", F.col("event_id") + 1).withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 1 DAY")
    ).write.mode("append").parquet(out)
    run_drain()

    got = {
        (r.user_id, r.view_id, r.purchase_id)
        for r in spark.read.parquet(sink).collect()
        if r.user_id != 999_999_999  # drop the sentinel itself
    }
    want = {
        (r.user_id, r.view_id, r.purchase_id)
        for r in stream_stream_attribution(events, how="left_outer").collect()
    }
    assert got == want
    # the outer rows are a strict superset of the inner ones
    unmatched = {g for g in got if g[1] is None}
    assert unmatched, "expected some unattributed purchases"
    # and before the watermark push, at least those trailing outer rows
    # were withheld (streaming held them back for correctness)
    assert n_before <= len(got)


def test_stream_quantile_maintenance_matches_batch(
    spark, sf_dir, events_stream_dir, tmp_path
):
    """Streaming quantile state (r4): after draining the stream through
    per-batch histogram merges, the maintained (day, type, qbucket)
    counters equal the one-shot batch histogram EXACTLY (integer vector
    addition is order/batching-independent), so any percentile served
    from the table matches the batch sketch."""
    from pgwarehouse_spark.operators.eventwindows import _QSK_SUB
    from pgwarehouse_spark.sources.tables import load_table
    from pgwarehouse_spark.streaming.events import (
        read_event_stream,
        stream_quantile_maintenance,
    )
    from pgwarehouse_spark.sync.rollup import read_rollup

    rollup = str(tmp_path / "qrollup")
    ckpt = str(tmp_path / "qckpt")
    stream = read_event_stream(spark, events_stream_dir, max_files_per_trigger=1)
    q = stream_quantile_maintenance(stream, rollup, checkpoint=ckpt).start()
    q.processAllAvailable()
    q.stop()

    got = {
        (r.day, r.event_type, r.qbucket): r.n
        for r in read_rollup(spark, rollup).collect()
    }
    clamped = F.greatest(F.coalesce(F.col("value"), F.lit(0.0)), F.lit(1e-12))
    want = {
        (r.day, r.event_type, r.qbucket): r.n
        for r in load_table(spark, sf_dir, "events")
        .select(
            F.to_date("ts").alias("day"),
            "event_type",
            F.floor(F.log(clamped) * _QSK_SUB).cast("bigint").alias("qbucket"),
        )
        .groupBy("day", "event_type", "qbucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and got


def test_stream_countmin_maintenance_matches_batch(
    spark, sf_dir, events_stream_dir, tmp_path
):
    """Streaming count-min state (r4): after draining the stream through
    per-batch cell merges, the maintained (day, r, bucket) counters
    equal the one-shot batch grid EXACTLY (integer vector addition is
    order/batching-independent), so any frequency estimate served from
    the table matches the batch sketch."""
    from pgwarehouse_spark.operators.eventwindows import (
        _CMS_HASHES,
        _CMS_P,
        _CMS_W,
    )
    from pgwarehouse_spark.sources.tables import load_table
    from pgwarehouse_spark.streaming.events import (
        read_event_stream,
        stream_countmin_maintenance,
    )
    from pgwarehouse_spark.sync.rollup import read_rollup

    rollup = str(tmp_path / "cmrollup")
    ckpt = str(tmp_path / "cmckpt")
    stream = read_event_stream(spark, events_stream_dir, max_files_per_trigger=1)
    q = stream_countmin_maintenance(stream, rollup, checkpoint=ckpt).start()
    q.processAllAvailable()
    q.stop()

    got = {
        (r.day, r.r, r.bucket): r.n
        for r in read_rollup(spark, rollup).collect()
    }
    want = {
        (r.day, r.r, r.bucket): r.n
        for r in load_table(spark, sf_dir, "events")
        .select(
            F.to_date("ts").alias("day"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(h_r).alias("r"),
                            (
                                (F.lit(a) * F.col("user_id") + F.lit(b))
                                % _CMS_P
                                % _CMS_W
                            ).alias("bucket"),
                        )
                        for h_r, a, b in _CMS_HASHES
                    ]
                )
            ).alias("h"),
        )
        .groupBy("day", "h.r", "h.bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and got


def test_stream_bloom_maintenance_matches_batch(
    spark, sf_dir, events_stream_dir, tmp_path
):
    """Streaming Bloom membership state (r6): after draining the stream
    through per-batch OR-merges, the maintained (day, word) filter words
    equal the one-shot batch grid EXACTLY (bitwise OR is order/batching-
    independent), every day-active user probes TRUE against the table,
    and replaying the full event set through another merge leaves the
    filter bit-identical (OR idempotency — the at-least-once tolerance
    the additive count-min sibling does not have)."""
    from pgwarehouse_spark.operators.eventwindows import (
        _BF_HASHES,
        _BF_M,
        _BF_P,
        _BF_WORD_BITS,
    )
    from pgwarehouse_spark.sources.tables import load_table
    from pgwarehouse_spark.streaming.events import (
        read_event_stream,
        stream_bloom_maintenance,
    )
    from pgwarehouse_spark.sync.rollup import read_rollup, update_rollup

    rollup = str(tmp_path / "bfrollup")
    ckpt = str(tmp_path / "bfckpt")
    stream = read_event_stream(spark, events_stream_dir, max_files_per_trigger=1)
    q = stream_bloom_maintenance(stream, rollup, checkpoint=ckpt).start()
    q.processAllAvailable()
    q.stop()

    events = load_table(spark, sf_dir, "events")
    grid = lambda df: df.select(
        F.to_date("ts").alias("day"),
        F.explode(
            F.array(
                *[
                    (F.lit(a) * F.col("user_id") + F.lit(b)) % _BF_P % _BF_M
                    for _, a, b in _BF_HASHES
                ]
            )
        ).alias("pos"),
    ).select(
        "day",
        F.expr(f"pos DIV {_BF_WORD_BITS}").alias("word"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {_BF_WORD_BITS} AS INT))"
        ).alias("mask"),
    )

    def snapshot():
        return {
            (r.day, r.word): r.bits
            for r in read_rollup(spark, rollup).collect()
        }

    got = snapshot()
    want = {
        (r.day, r.word): r.bits
        for r in grid(events).groupBy("day", "word")
        .agg(F.bit_or("mask").alias("bits"))
        .collect()
    }
    assert got == want and got

    # every (day, user) actually active must probe all-bits-set
    probe = (
        grid(events)
        .join(
            read_rollup(spark, rollup).withColumnRenamed("bits", "tbits"),
            ["day", "word"],
        )
        .withColumn("hit", F.col("tbits").bitwiseAND(F.col("mask")) != 0)
        .agg(F.bool_and("hit").alias("all_hit"))
        .collect()[0]
    )
    assert probe.all_hit

    # full replay through another OR-merge: filter bit-identical
    update_rollup(
        spark,
        rollup,
        grid(events),
        group_keys=["day", "word"],
        measures=[],
        or_measures=[("bits", F.bit_or("mask"))],
        num_buckets=8,
    )
    assert snapshot() == got
