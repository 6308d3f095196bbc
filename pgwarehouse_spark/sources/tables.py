"""Parquet table access for the driver testdata layout.

``spark.read.parquet`` gives vectorized columnar scans with predicate
pushdown and column pruning via Catalyst — the Spark-native equivalent of
the reference's bulk CSV staging path (reference pgwarehouse.py:254-303,
which streams `psql \\copy` CSV to gzip chunks). At 100 TB the same call
reads a partitioned parquet lake; nothing here assumes local files.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Dimension tables small enough to broadcast at any realistic scale factor
# (region/nation are bounded by geography; supplier/part/customer grow with
# SF but stay ≪ fact tables — broadcast decisions for those are left to
# AQE + autoBroadcastJoinThreshold rather than hard-coded).
ALWAYS_BROADCAST = {"region", "nation"}


# Files whose single parquet row group exceeds this many rows are an
# indivisible split: without intervention the scan AND everything
# codegen-fused above it (filter, partial aggregation, shingling/hashing)
# run in ONE task regardless of cluster size. Real lakes fix this by
# COMPACTION, and so does this engine: the first load of such a table
# rewrites it once into a multi-file, range-clustered local copy
# (`_ensure_compacted`), after which every scan is parallel with NO
# per-query repartition shuffle, and date-filtered queries get real
# file/row-group min/max pruning from the clustering. Set
# SPARK_GRAFT_NO_COMPACT=1 to fall back to a per-query repartition.
# The threshold is low (1k rows) because per-row cost can be large
# (documents carry full text; embeddings carry float arrays) — only
# dimension-sized tables are exempt.
_SPLIT_MIN_ROWS = 1_000
_layout_cache: dict[str, bool] = {}

# Cluster fact tables by their natural pruning key when compacting —
# the Spark analogue of the reference's MergeTree ORDER BY
# (reference clickhouse_backend.py:149-153): range-partition + local
# sort gives each output file a tight min/max band on the key, so
# time-window predicates skip whole files.
_RANGE_KEYS = {
    "lineitem": "l_shipdate",
    "orders": "o_orderdate",
    "events": "ts",
    "documents": "doc_id",
    "embeddings": "vec_id",
}

_COMPACT_ROOT = os.environ.get(
    "SPARK_GRAFT_COMPACT_DIR", "/tmp/pgwarehouse_spark_compacted"
)

_LAYOUT_VERSION = 2


def _single_large_row_group(path: str) -> bool:
    if path not in _layout_cache:
        try:
            import pyarrow.parquet as pq

            meta = pq.ParquetFile(path).metadata
            _layout_cache[path] = (
                meta.num_row_groups == 1 and meta.num_rows >= _SPLIT_MIN_ROWS
            )
        except Exception:
            _layout_cache[path] = False
    return _layout_cache[path]


# Plan memo (r9, guide §6 — file-listing/metadata overhead): every
# `spark.read.parquet` call re-lists the path and re-reads footer
# schemas (~130 ms on this box), and the 278 registered queries call
# load_table 1-6 times EACH, so pure metadata re-resolution was ~15-25%
# of total bench wall. The memo stores the UNEXECUTED logical plan —
# never data, never results: every action on the returned frame still
# scans parquet, exactly like Spark's own session file-index cache
# (spark.sql.hive.filesourcePartitionFileCacheSize) or a lakehouse
# catalog holding table metadata. Staleness is guarded by a stat
# signature (mtime_ns + size, one scandir level for directories), so
# the incremental-sync paths that rewrite a source table between reads
# (sync/engine.py ParquetSource) get a fresh plan the moment the file
# changes; the session key (applicationId) drops plans from stopped
# contexts.
_DF_CACHE: dict[tuple, DataFrame] = {}
_DF_CACHE_MAX = 256


def _path_sig(path: str):
    try:
        st = os.stat(path)
    except OSError:
        return None
    if os.path.isdir(path):
        # Recursive signature (r10, ADVICE r9): one scandir level missed
        # in-place rewrites below the first level of a partitioned/nested
        # parquet directory, and a scandir failure must disable caching
        # (returning a degraded-but-stable signature would pin a stale
        # plan), so it returns None — the caller then reads fresh.
        def _raise(err: OSError):
            raise err

        try:
            entries = []
            # onerror re-raises: os.walk swallows listing errors by
            # default, which would silently shrink the signature
            for root, dirs, files in os.walk(path, onerror=_raise):
                dirs.sort()
                for name in sorted(files):
                    fst = os.stat(os.path.join(root, name))
                    rel = os.path.relpath(os.path.join(root, name), path)
                    entries.append((rel, fst.st_mtime_ns, fst.st_size))
        except OSError:
            return None
        return (st.st_mtime_ns, tuple(entries))
    return (st.st_mtime_ns, st.st_size)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    sig = _path_sig(path)
    if sig is None:
        # missing path: let the underlying reader raise, uncached
        return _load_table_fresh(spark, sf_dir, name)
    key = (
        spark.sparkContext.applicationId,
        os.path.abspath(path),
        sig,
        bool(os.environ.get("SPARK_GRAFT_NO_COMPACT")),
    )
    df = _DF_CACHE.get(key)
    if df is None:
        df = _load_table_fresh(spark, sf_dir, name)
        if len(_DF_CACHE) >= _DF_CACHE_MAX:
            _DF_CACHE.pop(next(iter(_DF_CACHE)))
        _DF_CACHE[key] = df
    return df


def _load_table_fresh(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if _single_large_row_group(path) and not os.environ.get(
        "SPARK_GRAFT_NO_COMPACT"
    ):
        compacted = _ensure_compacted(spark, sf_dir, name, path)
        if compacted:
            return _normalize_ts(spark.read.parquet(compacted))
    df = _read_raw(spark, sf_dir, name)
    if _single_large_row_group(path):
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def _read_raw(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def _ensure_compacted(
    spark: SparkSession, sf_dir: str, name: str, src_path: str
) -> str | None:
    """One-time local compaction of a single-row-group file: rewrite as
    defaultParallelism files, range-clustered + locally sorted on the
    table's pruning key. Returns the compacted directory, or None if
    compaction failed (caller falls back to per-query repartition).

    Values are byte-identical to the source (parquet rewrite is
    lossless; the events ns→µs truncation is applied before the write,
    exactly as the uncompacted read path applies it after)."""
    import hashlib
    import shutil
    import uuid

    # _LAYOUT_VERSION invalidates cached copies when the normalization
    # applied before the compacting write changes (e.g. the ntz→timestamp
    # cast): a copy written by older code would otherwise be read forever.
    tag = hashlib.md5(
        f"{os.path.abspath(sf_dir)}|{os.path.getmtime(src_path)}|v{_LAYOUT_VERSION}".encode()
    ).hexdigest()[:12]
    dest = os.path.join(_COMPACT_ROOT, tag, name)
    if os.path.exists(os.path.join(dest, "_SUCCESS")):
        return dest
    try:
        df = _read_raw(spark, sf_dir, name)
        n = spark.sparkContext.defaultParallelism
        key = _RANGE_KEYS.get(name)
        if key and key in df.columns:
            df = df.repartitionByRange(n, key).sortWithinPartitions(key)
        else:
            df = df.repartition(n)
        tmp = f"{dest}.tmp-{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(tmp)
        try:
            os.replace(tmp, dest)
        except OSError:
            # Another process won the race; use theirs.
            shutil.rmtree(tmp, ignore_errors=True)
        return dest if os.path.exists(os.path.join(dest, "_SUCCESS")) else None
    except Exception:
        return None


def _normalize_ts(df: DataFrame) -> DataFrame:
    """Normalize any `ts` column to a session-UTC TimestampType whatever
    the parquet file's physical flavor (applied on BOTH the raw and the
    compacted read path, so a cached compacted copy written by older code
    still comes out normalized):

    - TIMESTAMP(NANOS) read as long (runtime conf): truncate to µs — the
      same truncation DuckDB applies reading ns into its µs TIMESTAMP.
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads TIMESTAMP_NTZ,
      which time-arithmetic functions (unix_micros, etc.) reject — cast to
      TimestampType. With the session pinned to UTC the wall-clock values
      are unchanged, which is exactly DuckDB's naive-timestamp semantics."""
    from pyspark.sql import functions as F

    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the legacy flag is consumed at load()-time schema resolution, so
    # it can be restored immediately after — leaving it set session-wide
    # would silently turn TIMESTAMP(NANOS) columns in every OTHER
    # parquet the caller reads into bigint (and _normalize_ts only
    # repairs columns literally named 'ts')
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    return _normalize_ts(df)


def register_views(spark: SparkSession, sf_dir: str, tables: list[str] | None = None) -> None:
    """Register each testdata table as a temp view for spark.sql queries."""
    for name in tables or TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)
