"""Structured Streaming generalization of the reference's high-watermark
incremental loop (SURVEY §2-B "Incremental / streaming": the reference
simulates incrementality with batch `where lm >= max(lm)` polling —
README.md:150-176; a stream IS that loop with the watermark managed by
the engine).

Each builder takes a *streaming* DataFrame (from ``readStream``) and
returns the transformed streaming frame, so the same logic composes with
any source (files here; Kafka in production — the transformations are
source-agnostic). Batch/stream parity: the window specs match
operators/eventwindows.py, whose DuckDB oracles therefore pin these
results too (asserted in tests/test_streaming.py by driving a
memory-sink stream to completion and comparing to the batch answer).

Scale notes: watermarks bound state (late events beyond the horizon are
dropped, state for closed windows is evicted); `foreachBatch` +
merge_upsert gives exactly-once-per-epoch upsert into the warehouse —
the streaming form of the reference's A15-A17 merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, "
    "event_type string, value double, props string"
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-based event stream (parquet dir). maxFilesPerTrigger bounds
    per-batch work — the streaming analogue of the reference's 1 GiB
    chunking (pgwarehouse.py:261)."""
    return (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_tumbling_counts(
    events: DataFrame, minutes: int = 60, watermark: str = "2 hours"
) -> DataFrame:
    """Windowed aggregation with late-data handling: events later than the
    watermark horizon are dropped; closed-window state is evicted."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{minutes} minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("wstart"), "event_type", "n_events", "sum_value")
    )


def stream_dedup(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Exactly-once by (event_id, ts) within the watermark horizon.
    `ts` MUST be part of the dedup subset: Spark only evicts
    dropDuplicates state when the watermarked event-time column is one
    of the dedup keys — `dropDuplicates(["event_id"])` alone keeps one
    state entry per event_id for the stream's lifetime and OOMs on an
    unbounded id space. This form collapses exact re-deliveries (same
    id, same stamp); redeliveries RESTAMPED by the producer are the
    sibling `stream_dedup_within_watermark`'s job."""
    return events.withWatermark("ts", watermark).dropDuplicates(
        ["event_id", "ts"]
    )


def stream_dedup_within_watermark(
    events: DataFrame, watermark: str = "2 hours"
) -> DataFrame:
    """At-least-once ingest dedup via ``dropDuplicatesWithinWatermark``:
    collapses re-deliveries of the same event_id whose event TIMESTAMPS
    differ (a redelivered record restamped by the producer — the case
    plain dropDuplicates treats as two distinct keys-with-state when the
    key includes ts, or keeps state for forever when it does not).
    State for a key is evicted once the watermark passes the FIRST
    sighting + delay, so memory is bounded by the horizon's key arrival
    rate rather than the stream's lifetime key count — the property
    that matters when event_id space is unbounded at 100 TB/day.

    The first-arriving record per event_id within the horizon wins —
    matching the reference's INSERT OR IGNORE-style at-least-once load
    semantics (SURVEY §2-A upserts)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def stream_sessionize(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "2 hours"
) -> DataFrame:
    """Session windows with a dynamic gap — the streaming form of the
    lag+cumsum batch sessionization (operators/eventwindows.py)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(
            F.session_window("ts", f"{gap_minutes} minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


RUNNING_TOTALS_SCHEMA = "user_id bigint, n_events bigint, sum_value double"
_STATE_SCHEMA = "n bigint, s double"


def stream_running_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via ``applyInPandasWithState``: per-user
    running (count, sum) maintained across micro-batches — unbounded
    running totals are exactly what built-in windowed aggregation cannot
    express (every window op needs a bounded window + watermark eviction).

    State is one (long, double) pair per user_id — O(distinct keys), not
    O(events); each micro-batch touches only the keys present in that
    batch (Arrow-batched, one pandas frame per key-group per batch). At
    100 TB/day this is the shape of a streaming feature store: state
    scales with entities, input scales with traffic.
    """
    import pandas as pd  # local import: only the streaming path needs it

    def _update(key, pdfs, state):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += int(len(pdf))
            s += float(pdf["value"].fillna(0.0).sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_value": [s]}
        )

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=RUNNING_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    )


def stream_sync(
    events: DataFrame,
    warehouse_path: str,
    keys: list[str],
    num_buckets: int = 16,
    order_col: str | None = "ts",
    checkpoint: str | None = None,
    transactional: bool = False,
):
    """Continuous warehouse sync: each micro-batch MERGEs into the
    bucketed parquet target via foreachBatch — the streaming
    generalization of the reference's poll-extract-merge loop, with the
    stream's checkpoint replacing the hand-rolled MAX-watermark query
    (A11) and giving exactly-once epochs."""
    import os

    from ..sync.merge import merge_into_bucketed, write_bucketed
    from ..sync.txlog import TxTable

    from ..sync.merge import dedup_latest

    def _merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        # the FIRST batch also needs the latest-row-per-key collapse:
        # the create paths write the frame verbatim, so an at-least-once
        # upstream delivering two versions of a key in batch 0 would
        # seed the table with a duplicated primary key that later merges
        # only heal if that key arrives again
        def _net():
            return (
                dedup_latest(batch_df, keys, order_col)
                if order_col
                else batch_df
            )

        if transactional:
            # each micro-batch commits one snapshot version: concurrent
            # readers keep their pinned manifest mid-commit
            if not os.path.exists(os.path.join(warehouse_path, "manifest")):
                TxTable.create(_net(), warehouse_path, keys, num_buckets)
            else:
                TxTable(warehouse_path, keys, num_buckets).merge(
                    spark, batch_df, order_col=order_col
                )
        elif not os.path.exists(warehouse_path):
            write_bucketed(_net(), warehouse_path, keys, num_buckets)
        else:
            merge_into_bucketed(
                spark, warehouse_path, batch_df, keys, num_buckets, order_col=order_col
            )

    writer = events.writeStream.foreachBatch(_merge_batch).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def stream_enrich(events: DataFrame, dim: DataFrame) -> DataFrame:
    """Stream-static enrichment: each micro-batch of the event stream
    joins against a static dimension (here: the customer table keyed by
    user_id). The static side is broadcast, so enrichment is map-side
    per batch — no stream-side shuffle, no state. Spark re-plans the
    static side per micro-batch, so a dimension refreshed in place is
    picked up on the next trigger (slowly-changing-dimension refresh
    without restarting the query)."""
    d = F.broadcast(
        dim.select(
            F.col("c_custkey").alias("user_id"),
            F.col("c_mktsegment").alias("segment"),
            F.col("c_nationkey").alias("nationkey"),
        )
    )
    return events.join(d, "user_id", "left").select(
        "event_id", "ts", "user_id", "event_type", "value", "segment", "nationkey"
    )


def stream_stream_attribution(
    events: DataFrame, watermark: str = "2 hours", how: str = "inner"
) -> DataFrame:
    """Stream-stream interval join: attribute each purchase to every view
    by the same user in the preceding hour. Both sides carry watermarks
    and the join condition bounds purchase_ts to [view_ts, view_ts + 1h],
    so Spark can evict view-side state once the purchase watermark passes
    view_ts + 1h and purchase-side state immediately — state stays
    O(events in the horizon), the requirement for an unbounded run.

    ``how="left_outer"`` keeps UNATTRIBUTED purchases too (view columns
    null) — the funnel-leak side of attribution. In streaming, outer
    rows are emitted only once the watermark passes the join horizon
    (correctness over latency: until then a matching view could still
    arrive); the test drives this with a watermark-pushing sentinel.

    ``withWatermark`` is a no-op on batch frames, so the same builder
    runs in batch for the parity test (the batch plan is a plain
    non-equi self-join)."""
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("view_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("user_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
            F.col("value").alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return purchases.join(
        views,
        F.expr(
            "v_user = user_id AND "
            "purchase_ts >= view_ts AND "
            "purchase_ts <= view_ts + INTERVAL 1 HOUR"
        ),
        how,
    ).select(
        "user_id", "view_id", "purchase_id", "view_ts", "purchase_ts", "purchase_value"
    )


def stream_rollup_maintenance(
    events: DataFrame,
    rollup_path: str,
    checkpoint: str | None = None,
):
    """Continuous aggregate maintenance: every micro-batch's partials are
    additively merged into the bucketed rollup table (hourly x event_type
    counts/sums) via foreachBatch — the streaming materialized view the
    reference's warehouses recompute per query.

    Exactly-once matters here: additive merges double-count on replay, so
    the streaming checkpoint (epoch-tracked foreachBatch) is the delivery
    contract — see sync/rollup.py's docstring. State is zero (the rollup
    table IS the state); per-batch work is O(groups touched).

    The rollup also maintains a distinct-user HLL sketch per group
    (merged with hll_union): unlike the additive columns, the sketch is
    idempotent under replay, so the served distinct counts stay correct
    even where delivery degrades to at-least-once."""
    from ..sync.rollup import update_rollup

    def _measures():
        return [
            ("n_events", F.count(F.lit(1))),
            ("sum_value", F.sum(F.coalesce("value", F.lit(0.0)))),
        ]

    def _merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        delta = batch_df.withColumn("hour", F.date_trunc("hour", F.col("ts")))
        update_rollup(
            batch_df.sparkSession,
            rollup_path,
            delta,
            group_keys=["hour", "event_type"],
            measures=_measures(),
            num_buckets=8,
            sketch_measures=[("sk_users", F.expr("hll_sketch_agg(user_id)"))],
        )

    writer = events.writeStream.foreachBatch(_merge_batch).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


DOCS_SCHEMA = "doc_id bigint, text string"


def read_document_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-based document stream (parquet dir of (doc_id, text))."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_near_dup_filter(
    docs: DataFrame,
    accepted_path: str,
    index_path: str,
    checkpoint: str | None = None,
):
    """Streaming near-dup ingest filter: each micro-batch of documents is
    (1) deduped within the batch (first-seen/lowest-id wins, LSH + exact
    verify), (2) matched against the MAINTAINED corpus band index
    (operators/dedup.py::incremental_near_dup_pairs with the stored
    index — the corpus is never re-shingled), and (3) the survivors are
    appended to the accepted table AND their band keys to the index.
    The index is the dedup state, stored as a table rather than in
    operator memory — so state size doesn't bound the corpus, restarts
    recover from the checkpoint + tables, and the same index serves
    batch backfills.

    At 100 TB: per batch the shuffle is O(bands·|batch|) band keys
    probing a bucketed index table; accepted-doc shingles are read only
    for the candidate doc_ids (join pruned by the candidate set).
    Exactly-once: appends replay on failure before checkpoint commit —
    replayed survivors re-match against the index they were just added
    to and would be dropped, but the accepted append may duplicate;
    dedup-on-read by doc_id (or a MERGE sink) closes that gap, exactly
    as sync/merge.py does for the warehouse path."""
    import os

    from ..operators.dedup import (
        band_keys,
        incremental_near_dup_pairs,
        minhash_signatures_df,
        hashed_shingles_expr,
        verified_pairs_from_shingled,
    )

    def _filter_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        sh_batch = (
            batch_df.select(
                "doc_id", "text", hashed_shingles_expr(F.col("text")).alias("shingles")
            )
            .localCheckpoint(eager=True)
        )
        # (1) within-batch: later id drops against any earlier near-dup
        within_drop = (
            verified_pairs_from_shingled(
                sh_batch.select("doc_id", "shingles"),
                materialize="localCheckpoint",  # cache() would leak per batch
            )
            .select(F.col("id2").alias("doc_id"))
            .distinct()
        )
        survivors = sh_batch.join(within_drop, "doc_id", "left_anti")
        # (2) vs corpus: probe the stored band index
        if os.path.exists(index_path):
            acc_sh = spark.read.parquet(accepted_path).select("doc_id", "shingles")
            idx = spark.read.parquet(index_path)
            matched = (
                incremental_near_dup_pairs(
                    acc_sh,
                    survivors.select("doc_id", "shingles"),
                    corpus_bands=idx,
                )
                .select(F.col("new_doc_id").alias("doc_id"))
                .distinct()
            )
            survivors = survivors.join(matched, "doc_id", "left_anti")
        # materialize before appending to the tables the plan reads
        survivors = survivors.localCheckpoint(eager=True)
        # (3) accept + index the survivors
        survivors.write.mode("append").parquet(accepted_path)
        band_keys(
            minhash_signatures_df(survivors.select("doc_id", "shingles"))
        ).write.mode("append").parquet(index_path)

    writer = docs.writeStream.foreachBatch(_filter_batch).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


# ---------------------------------------------------------------------------
# Streaming incremental join-view maintenance (CDC feed -> maintained view)
# ---------------------------------------------------------------------------

CDC_JOIN_SCHEMA = (
    "side string, o_orderkey bigint, o_custkey bigint, l_quantity double"
)


def read_cdc_join_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """Tagged CDC feed for a two-table join view: side='A' rows carry
    (o_orderkey, o_custkey), side='B' rows carry (o_orderkey,
    l_quantity)."""
    return (
        spark.readStream.schema(CDC_JOIN_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def stream_join_maintenance(
    tagged: DataFrame,
    state_dir: str,
    checkpoint: str | None = None,
):
    """Continuously-maintained JOIN view over a tagged two-table CDC
    feed: each micro-batch splits into base-table deltas dA / dB, the
    exact view delta dV = dA⋈B ∪ A⋈dB ∪ dA⋈dB is computed against the
    CURRENT base snapshots (sync/ivm.py), and dV appends to the view —
    A_old⋈B_old is never recomputed, so per-batch cost tracks batch
    size, not view size.

    Replay safety (foreachBatch is at-least-once): every table write is
    scoped to an epoch subdirectory (``<table>/e<epoch_id>``) written
    with mode=overwrite, and the pre-batch snapshot is assembled by
    reading exactly the subdirectories of EARLIER epochs. A replayed
    epoch therefore reads the identical pre-batch state (its own
    partial output is excluded by construction, whether or not the
    crash happened mid-write) and overwrites its own subdirectories
    with identical content — idempotent, no markers needed. A missing
    state directory means "no earlier epochs" (first batch); any other
    read failure raises instead of being treated as empty state."""
    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        apply_cdc_join_batch(batch_df, epoch_id, state_dir)

    writer = tagged.writeStream.foreachBatch(_apply).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def _earlier_epochs(path: str, epoch_id: int) -> list[str]:
    import os

    if not os.path.isdir(path):
        return []
    return [
        os.path.join(path, d)
        for d in os.listdir(path)
        if d.startswith("e") and d[1:].isdigit() and int(d[1:]) < epoch_id
    ]


def _read_state(
    spark: SparkSession, path: str, epoch_id: int, schema: str
) -> DataFrame:
    paths = _earlier_epochs(path, epoch_id)
    if not paths:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*paths)


def apply_cdc_join_batch(
    batch_df: DataFrame, epoch_id: int, state_dir: str
) -> None:
    """One epoch of join-view maintenance (see stream_join_maintenance
    for the replay-idempotence argument). Module-level so replay
    behavior is directly testable."""
    import os

    from ..sync.ivm import join_view_delta

    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    a_path = os.path.join(state_dir, "base_a")
    b_path = os.path.join(state_dir, "base_b")
    v_path = os.path.join(state_dir, "view")
    da = batch_df.filter(F.col("side") == "A").select("o_orderkey", "o_custkey")
    db = batch_df.filter(F.col("side") == "B").select("o_orderkey", "l_quantity")
    a_old = _read_state(
        spark, a_path, epoch_id, "o_orderkey bigint, o_custkey bigint"
    )
    b_old = _read_state(
        spark, b_path, epoch_id, "o_orderkey bigint, l_quantity double"
    )
    dv = join_view_delta(a_old, da, b_old, db, "o_orderkey")
    sub = f"e{epoch_id}"
    dv.write.mode("overwrite").parquet(os.path.join(v_path, sub))
    da.write.mode("overwrite").parquet(os.path.join(a_path, sub))
    db.write.mode("overwrite").parquet(os.path.join(b_path, sub))


def read_cdc_join_view(spark: SparkSession, state_dir: str) -> DataFrame:
    """The maintained view = union of all epoch subdirectories."""
    import os

    return spark.read.option("recursiveFileLookup", "true").parquet(
        os.path.join(state_dir, "view")
    )


# ---------------------------------------------------------------------------
# Streaming SCD2 maintenance
# ---------------------------------------------------------------------------


def _scd2_state_path(state_dir: str) -> str:
    import os

    return os.path.join(state_dir, "scd2")


def read_scd2_state(spark: SparkSession, state_dir: str) -> DataFrame:
    """Current SCD2 table: the epoch log compacted on read — latest
    version per (user_id, valid_from) wins (an interval is rewritten by
    a later epoch only to close it)."""
    from pyspark.sql import Window as W

    path = _scd2_state_path(state_dir)
    raw = spark.read.option("recursiveFileLookup", "true").schema(
        "user_id bigint, event_type string, valid_from timestamp, "
        "valid_to timestamp, epoch bigint"
    ).parquet(path)
    w = W.partitionBy("user_id", "valid_from").orderBy(F.col("epoch").desc())
    return (
        raw.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "epoch")
        .withColumn(
            "is_current", F.when(F.col("valid_to").isNull(), 1).otherwise(0)
        )
    )


def apply_scd2_batch(batch_df: DataFrame, epoch_id: int, state_dir: str) -> None:
    """One epoch of streaming SCD2 maintenance over an in-order (per
    entity) change feed: the batch's events merge with each affected
    entity's OPEN interval, transitions are re-derived over that tiny
    union, and the epoch emits only rewritten/new intervals for the
    affected entities — work is O(batch + open intervals touched), never
    O(history).

    Replay safety: the epoch's rows land in an epoch subdirectory
    (overwrite), state reads use only earlier epochs (see
    stream_join_maintenance), and the compaction key (user_id,
    valid_from, max epoch) makes re-applied epochs overwrite themselves.
    Ordering contract: events arrive watermark-ordered per entity
    (batch N's events all follow batch N-1's) — the same contract the
    watermark incremental sync relies on."""
    import os

    from pyspark.sql import Window as W

    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    path = _scd2_state_path(state_dir)

    paths = _earlier_epochs(path, epoch_id)
    if paths:
        raw = spark.read.schema(
            "user_id bigint, event_type string, valid_from timestamp, "
            "valid_to timestamp, epoch bigint"
        ).parquet(*paths)
        w_latest = W.partitionBy("user_id", "valid_from").orderBy(
            F.col("epoch").desc()
        )
        state = (
            raw.withColumn("_rn", F.row_number().over(w_latest))
            .filter(F.col("_rn") == 1)
            .drop("_rn", "epoch")
        )
    else:
        state = spark.createDataFrame(
            [],
            "user_id bigint, event_type string, valid_from timestamp, "
            "valid_to timestamp",
        )

    users = batch_df.select("user_id").distinct()
    open_iv = state.join(users, "user_id", "left_semi").filter(
        F.col("valid_to").isNull()
    )
    # pseudo-events: each open interval re-enters the transition derive
    # at its own valid_from with its type, so a batch whose first event
    # repeats the open type extends it (no spurious rewrite), and a
    # different type closes it at the new event's timestamp.
    pseudo = open_iv.select(
        "user_id",
        "event_type",
        F.col("valid_from").alias("ts"),
        F.lit(-1).cast("bigint").alias("event_id"),
    )
    evs = batch_df.select(
        "user_id", "event_type", "ts", "event_id"
    ).unionByName(pseudo)
    w_ev = W.partitionBy("user_id").orderBy("ts", "event_id")
    transitions = (
        evs.select(
            "user_id",
            "event_type",
            F.col("ts").alias("valid_from"),
            F.lag("event_type").over(w_ev).alias("prev_type"),
        )
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .drop("prev_type")
    )
    w_tr = W.partitionBy("user_id").orderBy("valid_from")
    rewritten = transitions.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w_tr).alias("valid_to"),
    )
    out = rewritten.withColumn("epoch", F.lit(epoch_id).cast("bigint"))
    out.write.mode("overwrite").parquet(os.path.join(path, f"e{epoch_id}"))


def stream_scd2_maintenance(
    events: DataFrame, state_dir: str, checkpoint: str | None = None
):
    """Continuously-maintained SCD2 dimension from the event stream —
    the streaming form of operators/syncshapes.py::scd2_intervals."""

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        apply_scd2_batch(batch_df, epoch_id, state_dir)

    writer = events.writeStream.foreachBatch(_apply).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def stream_cdc_apply(
    changes: DataFrame,
    warehouse_path: str,
    keys: list[str],
    num_buckets: int = 16,
    op_col: str = "op",
    seq_col: str | None = "seq",
    checkpoint: str | None = None,
):
    """Streaming CDC APPLY: a Debezium/wal2json-style opcode feed
    (I/U/D + per-key sequence) continuously maintains the bucketed
    warehouse table — the streaming form of `sync_cdc_apply_opcodes`
    and the fourth sync strategy the reference lacks (deletes applied,
    not just detected). Per micro-batch: collapse the batch to its net
    effect per key (last opcode by `seq_col` wins), then one
    bucket-pruned rewrite via sync/merge.py::apply_cdc_bucketed —
    deletes drop the key, upserts replace it, untouched buckets are
    never read. The stream checkpoint gives exactly-once epochs; work
    per batch is O(batch × bucket-width), so a trickle of changes
    against a 100 TB table touches only the buckets it names."""
    import os

    from ..sync.merge import apply_cdc_bucketed, write_bucketed

    def _apply(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        if not os.path.exists(warehouse_path):
            from ..sync.merge import dedup_latest

            net = dedup_latest(batch_df, keys, seq_col)
            initial = net.filter(F.col(op_col) != "D").drop(op_col)
            if initial.isEmpty():
                return
            write_bucketed(initial, warehouse_path, keys, num_buckets)
        else:
            apply_cdc_bucketed(
                spark,
                warehouse_path,
                batch_df,
                keys,
                num_buckets,
                op_col=op_col,
                order_col=seq_col,
            )

    writer = changes.writeStream.foreachBatch(_apply).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def stream_quantile_maintenance(
    events: DataFrame,
    rollup_path: str,
    checkpoint: str | None = None,
):
    """Continuously-maintained QUANTILE state (r4): every micro-batch
    additively merges its (day, event_type, qbucket) log-grid histogram
    counts into the bucketed rollup — the streaming feed of
    `events_quantile_rollup_estimates`'s mergeable sketch. Because the
    sketch is plain integer counters keyed by bucket, maintenance needs
    NO new machinery: it is `update_rollup` with the quantile bucket as
    a group key, so per-batch work is O(groups touched) and serving
    p50/p99 from the table is a cumulative-sum read, never a raw-event
    scan. Exactly-once via the streaming checkpoint (additive counters
    double-count on replay, same contract as stream_rollup_maintenance)."""
    from ..operators.eventwindows import _QSK_SUB
    from ..sync.rollup import update_rollup

    def _merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        clamped = F.greatest(
            F.coalesce(F.col("value"), F.lit(0.0)), F.lit(1e-12)
        )
        delta = batch_df.select(
            F.to_date("ts").alias("day"),
            "event_type",
            F.floor(F.log(clamped) * _QSK_SUB).cast("bigint").alias("qbucket"),
        )
        update_rollup(
            batch_df.sparkSession,
            rollup_path,
            delta,
            group_keys=["day", "event_type", "qbucket"],
            measures=[("n", F.count(F.lit(1)))],
            num_buckets=8,
        )

    writer = events.writeStream.foreachBatch(_merge_batch).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def stream_countmin_maintenance(
    events: DataFrame,
    rollup_path: str,
    checkpoint: str | None = None,
):
    """Continuously-maintained COUNT-MIN state (r4): every micro-batch
    hashes its events into the depth-3 × width-512 counter grid of
    `events_countmin_rollup_sketch` and additively merges the per-(day,
    row, bucket) cell counts into the bucketed rollup — the streaming
    feed of the frequency sketch, completing the maintained-sketch trio
    beside `stream_rollup_maintenance` (distinct) and
    `stream_quantile_maintenance` (quantile). Counters are plain
    integers keyed by cell, so maintenance is `update_rollup` with the
    hash cell as a group key: per-batch work is O(cells touched ≤ 3 ×
    batch rows, post-combine ≤ days × 1536), and serving a frequency
    estimate is a 3-row MIN probe of the table, never a raw-event scan.
    Exactly-once via the streaming checkpoint (additive counters
    double-count on replay, same contract as the other two)."""
    from ..operators.eventwindows import _CMS_HASHES, _CMS_P, _CMS_W
    from ..sync.rollup import update_rollup

    def _merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        delta = batch_df.select(
            F.to_date("ts").alias("day"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"),
                            (
                                (F.lit(a) * F.col("user_id") + F.lit(b))
                                % _CMS_P
                                % _CMS_W
                            ).alias("bucket"),
                        )
                        for r, a, b in _CMS_HASHES
                    ]
                )
            ).alias("h"),
        ).select("day", "h.r", "h.bucket")
        update_rollup(
            batch_df.sparkSession,
            rollup_path,
            delta,
            group_keys=["day", "r", "bucket"],
            measures=[("n", F.count(F.lit(1)))],
            num_buckets=8,
        )

    writer = events.writeStream.foreachBatch(_merge_batch).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer


def stream_bloom_maintenance(
    events: DataFrame,
    rollup_path: str,
    checkpoint: str | None = None,
):
    """Continuously-maintained BLOOM MEMBERSHIP state (r6): every
    micro-batch hashes its events' user_ids into the per-day 64-word
    Bloom grid of `events_bloom_membership_rollup` and OR-merges the
    (day, word) bit words into the bucketed rollup via update_rollup's
    or_measures — completing the maintained-sketch QUARTET beside
    distinct (HLL), quantile (log-grid), and frequency (count-min).

    The semantics OR-merge buys over the additive siblings: bitwise OR
    is IDEMPOTENT, so a replayed micro-batch leaves the filter
    unchanged — membership state tolerates at-least-once delivery with
    no checkpoint coordination (the additive counters double-count and
    NEED the exactly-once epoch guarantee). Serving 'was user X active
    on day D' is a ≤3-row probe of the table, never a raw-event scan;
    day filters roll to weeks by further ORs at read time.

    Per-batch work: ≤3 cells per event pre-combine, ≤ days × 64 word
    rows post-combine; only rollup buckets containing touched days are
    rewritten."""
    from ..operators.eventwindows import (
        _BF_HASHES,
        _BF_M,
        _BF_P,
        _BF_WORD_BITS,
    )
    from ..sync.rollup import update_rollup

    def _merge_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        delta = batch_df.select(
            F.to_date("ts").alias("day"),
            F.explode(
                F.array(
                    *[
                        (F.lit(a) * F.col("user_id") + F.lit(b))
                        % _BF_P
                        % _BF_M
                        for _, a, b in _BF_HASHES
                    ]
                )
            ).alias("pos"),
        ).select(
            "day",
            F.expr(f"pos DIV {_BF_WORD_BITS}").alias("word"),
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT), "
                f"CAST(pos % {_BF_WORD_BITS} AS INT))"
            ).alias("mask"),
        )
        update_rollup(
            batch_df.sparkSession,
            rollup_path,
            delta,
            group_keys=["day", "word"],
            measures=[],
            or_measures=[("bits", F.bit_or("mask"))],
            num_buckets=8,
        )

    writer = events.writeStream.foreachBatch(_merge_batch).outputMode("update")
    if checkpoint:
        writer = writer.option("checkpointLocation", checkpoint)
    return writer
