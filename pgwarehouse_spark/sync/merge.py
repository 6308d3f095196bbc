"""MERGE/upsert primitive: left-anti join + union-all (reference A15-A17
unified — snowflake MERGE snowflake_backend.py:199-208, clickhouse
delete-then-insert clickhouse_backend.py:245-270, duckdb INSERT OR
REPLACE duckdb_backend.py:185-197).

Composite keys are fully supported (the reference refuses them,
clickhouse_backend.py:203-204 / README.md:256-257).

Scale design — bucket-pruned rewrite: a plain-parquet target cannot be
mutated in place, so the naive merge rewrites the whole table. Instead
the target is laid out partitioned by a stable hash bucket of the key
(``__bucket = pmod(xxhash64(key...), n)``); a merge then:

1. computes the delta's affected buckets (tiny distinct),
2. reads ONLY those partitions of the target (partition pruning),
3. anti-joins + unions within them,
4. rewrites ONLY those partitions via dynamic partition overwrite.

This is the plain-parquet analogue of Delta's file-pruned MERGE: work is
O(delta × bucket-width), not O(table). At 100 TB with 4096 buckets a
1%-of-keys delta touches ~every bucket, so bucket count should scale
with table size; the knob is exposed. Last-writer-wins within the delta
is enforced with the row_number()=1 dedup (A17 semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

BUCKET_COL = "__bucket"


def bucket_expr(keys: list[str], num_buckets: int):
    return F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(num_buckets)).cast("int")


def dedup_latest(df: DataFrame, keys: list[str], order_col: str | None) -> DataFrame:
    """Keep one row per key — the latest by order_col (or arbitrary-but-
    deterministic when no order column exists)."""
    order = [F.col(order_col).desc()] if order_col else []
    order += [F.col(k).desc() for k in df.columns if k not in keys][:1]
    w = W.partitionBy(*keys).orderBy(*order) if order else W.partitionBy(*keys).orderBy(keys[0])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def _widen(df: DataFrame, other: DataFrame) -> DataFrame:
    """Schema evolution: add (as typed nulls) any column the other side
    has that this side lacks, so both sides share the union schema."""
    have = set(df.columns)
    for f in other.schema.fields:
        if f.name not in have:
            df = df.withColumn(f.name, F.lit(None).cast(f.dataType))
    return df


def _anti_by_keys(target: DataFrame, key_rows: DataFrame, keys: list[str]) -> DataFrame:
    """left_anti on the key columns with NULL-SAFE equality: the plain
    name-list join uses `=`, under which NULL keys never match — a
    target row with a NULL key column would survive every merge while
    the delta's copy unions in beside it, one new duplicate per merge.
    eqNullSafe treats NULL as a joinable key value (still one shuffle
    hash join; <=> is a plannable equi-condition)."""
    t, d = target.alias("_t"), key_rows.alias("_d")
    cond = None
    for k in keys:
        c = F.col(f"_t.{k}").eqNullSafe(F.col(f"_d.{k}"))
        cond = c if cond is None else (cond & c)
    return t.join(d, cond, "left_anti")


def merge_upsert(
    target: DataFrame,
    delta: DataFrame,
    keys: list[str],
    order_col: str | None = None,
) -> DataFrame:
    """Pure-DataFrame MERGE: rows of `target` whose key appears in `delta`
    are replaced; new keys append. Columns only one side has survive as
    nulls on the other (schema evolution). Returns the merged DataFrame."""
    target = _widen(target, delta)
    delta = _widen(delta, target).select(*target.columns)
    delta = dedup_latest(delta, keys, order_col)
    kept = _anti_by_keys(target, delta.select(*keys).distinct(), keys)
    return kept.unionByName(delta)


def merge_into_bucketed(
    spark: SparkSession,
    path: str,
    delta: DataFrame,
    keys: list[str],
    num_buckets: int,
    order_col: str | None = None,
) -> int:
    """Bucket-pruned MERGE into a parquet table partitioned by BUCKET_COL.

    Only partitions containing delta keys are read and rewritten
    (dynamic partition overwrite). Returns the number of buckets touched.
    """
    delta = delta.withColumn(BUCKET_COL, bucket_expr(keys, num_buckets))
    affected = [r[BUCKET_COL] for r in delta.select(BUCKET_COL).distinct().collect()]
    if not affected:
        return 0
    target = (
        spark.read.option("mergeSchema", "true")
        .parquet(path)
        .filter(F.col(BUCKET_COL).isin(affected))
    )
    merged = merge_upsert(target, delta, keys, order_col)
    # Materialize before the overwrite: the plan reads the same files the
    # write will replace (plain parquet has no snapshot isolation — at
    # scale this is exactly what Delta/Iceberg MERGE solves natively).
    merged = merged.localCheckpoint(eager=True)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    return len(affected)


def write_bucketed(
    df: DataFrame, path: str, keys: list[str], num_buckets: int, mode: str = "overwrite"
) -> None:
    """Initial bucketed layout: partition dirs by key-hash bucket, rows
    sorted by key within each file (PK-ordered physical layout — the
    Spark analogue of the reference's MergeTree ORDER BY pk,
    clickhouse_backend.py:149-153)."""
    (
        df.withColumn(BUCKET_COL, bucket_expr(keys, num_buckets))
        .repartition(BUCKET_COL)
        .sortWithinPartitions(*keys)
        .write.mode(mode)
        .partitionBy(BUCKET_COL)
        .parquet(path)
    )


def apply_cdc_bucketed(
    spark: SparkSession,
    path: str,
    net: DataFrame,
    keys: list[str],
    num_buckets: int,
    op_col: str = "op",
    order_col: str | None = None,
) -> int:
    """Bucket-pruned CDC APPLY: upserts AND deletes in one rewrite.

    `net` is an opcode-carrying change set (one or more rows per key;
    collapsed here to last-writer-wins by `order_col`). Rows whose final
    opcode is 'D' remove the key from the target; anything else
    ('I'/'U') replaces it — the batch engine under the streaming CDC
    sink and the registered `sync_cdc_apply_opcodes` query, extended to
    physical deletes. Same partition-pruned plan as merge_into_bucketed:
    only buckets containing changed keys are read and rewritten
    (dynamic partition overwrite), so work is O(changes × bucket-width),
    not O(table). The reference cannot express this at all — its
    watermark strategies never delete (README.md:150-176).
    """
    net = dedup_latest(net, keys, order_col)
    net = net.withColumn(BUCKET_COL, bucket_expr(keys, num_buckets))
    affected = [r[BUCKET_COL] for r in net.select(BUCKET_COL).distinct().collect()]
    if not affected:
        return 0
    target = (
        spark.read.option("mergeSchema", "true")
        .parquet(path)
        .filter(F.col(BUCKET_COL).isin(affected))
    )
    # NULL-safe: a malformed change row with op=NULL must be treated as
    # an upsert (the "anything else replaces" contract), not silently
    # deleted — plain `op != 'D'` is NULL-falsy, which excluded the row
    # from upserts while its key still anti-joined the target away
    upserts = net.filter(~F.col(op_col).eqNullSafe("D")).drop(op_col)
    # every changed key leaves the target once; non-delete finals re-enter
    kept = _anti_by_keys(target, net.select(*keys).distinct(), keys)
    kept = _widen(kept, upserts)
    upserts = _widen(upserts, kept).select(*kept.columns)
    merged = kept.unionByName(upserts).localCheckpoint(eager=True)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        merged.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    # Dynamic overwrite only rewrites partitions PRESENT in the written
    # data — an affected bucket whose rows were ALL deleted (and got no
    # upserts) writes nothing and would silently keep its old files.
    # Drop those partition directories explicitly (the mirror of
    # TxTable._commit_buckets removing emptied buckets from its
    # manifest). Driver-side: one distinct over the checkpointed merged
    # frame plus O(emptied) filesystem deletes.
    survivors = {
        r[BUCKET_COL] for r in merged.select(BUCKET_COL).distinct().collect()
    }
    emptied = [b for b in affected if b not in survivors]
    if emptied:
        jvm = spark.sparkContext._jvm
        hconf = spark.sparkContext._jsc.hadoopConfiguration()
        for b in emptied:
            p = jvm.org.apache.hadoop.fs.Path(f"{path}/{BUCKET_COL}={b}")
            p.getFileSystem(hconf).delete(p, True)
        if not survivors:
            # the delete emptied EVERY affected bucket; if no other
            # bucket survives, leave one zero-row schema-carrying file so
            # the table stays readable (plain parquet cannot represent a
            # file-less table)
            root = jvm.org.apache.hadoop.fs.Path(path)
            fs = root.getFileSystem(hconf)
            has_bucket = any(
                s.getPath().getName().startswith(f"{BUCKET_COL}=")
                for s in fs.listStatus(root)
            )
            if not has_bucket:
                (
                    merged.limit(0)
                    .drop(BUCKET_COL)
                    .repartition(1)
                    .write.mode("overwrite")
                    .parquet(f"{path}/{BUCKET_COL}={emptied[0]}")
                )
    return len(affected)
