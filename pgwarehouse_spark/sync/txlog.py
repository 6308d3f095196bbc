"""Minimal transaction log over the bucketed parquet layout — snapshot
isolation, time travel, and safe vacuum for the sync engine's tables.

`sync/merge.py` documents the plain-parquet caveat: a bucket-pruned MERGE
rewrites partition directories in place, so a concurrent reader can see a
half-written table (exactly what Delta/Iceberg transaction logs solve).
This module is the engine's own minimal log, reference-free and
idiomatic-Spark:

- Data files are IMMUTABLE: version ``n`` writes its changed buckets
  under ``data/v{n}/__bucket=K/``; unchanged buckets keep pointing at the
  directory of the version that last wrote them.
- A manifest ``manifest/v{n}.json`` maps every bucket to the directory
  holding its current files. Commits are atomic: manifest written to a
  temp name then ``os.replace``d (POSIX-atomic), and the latest version
  is simply the highest ``v{n}.json`` present — no mutable pointer file
  to tear.
- Readers resolve a manifest ONCE and read only immutable paths, so a
  reader pinned at version ``n`` is untouched by later merges
  (snapshot isolation) and any historical version remains queryable
  until vacuumed (time travel).
- ``vacuum(keep_last)`` deletes data directories no surviving manifest
  references — never anything a retained snapshot can still read.

At 100 TB this is the same layout Delta uses (immutable files + log),
minus compaction of the log itself; a manifest holds one entry per
bucket (thousands, not millions — it stays driver-trivial). Multi-writer
coordination is out of scope (single-writer, many-reader — the sync
engine's actual topology; reference parity: the reference's loaders are
single-writer too, pgwarehouse.py:96-110).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .merge import BUCKET_COL, bucket_expr, dedup_latest, merge_upsert

_MANIFEST_DIR = "manifest"
_DATA_DIR = "data"


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, _MANIFEST_DIR, f"v{version}.json")


def _list_versions(root: str) -> list[int]:
    mdir = os.path.join(root, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in os.listdir(mdir):
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _write_manifest(root: str, version: int, manifest: dict) -> None:
    os.makedirs(os.path.join(root, _MANIFEST_DIR), exist_ok=True)
    final = _manifest_path(root, version)
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, sort_keys=True)
    os.replace(tmp, final)  # atomic publish


def _read_manifest(root: str, version: int) -> dict:
    with open(_manifest_path(root, version)) as f:
        return json.load(f)


class TxTable:
    """Single-writer, many-reader versioned bucketed table."""

    def __init__(self, root: str, keys: list[str], num_buckets: int):
        self.root = root
        self.keys = keys
        self.num_buckets = num_buckets

    # -- versions ------------------------------------------------------

    def versions(self) -> list[int]:
        return _list_versions(self.root)

    def latest_version(self) -> int:
        vs = self.versions()
        if not vs:
            raise FileNotFoundError(f"no committed version under {self.root}")
        return vs[-1]

    # -- create --------------------------------------------------------

    @classmethod
    def create(
        cls,
        df: DataFrame,
        root: str,
        keys: list[str],
        num_buckets: int = 16,
    ) -> "TxTable":
        t = cls(root, keys, num_buckets)
        data_dir = os.path.join(root, _DATA_DIR, "v0")
        (
            df.withColumn(BUCKET_COL, bucket_expr(keys, num_buckets))
            .repartition(BUCKET_COL)
            .sortWithinPartitions(*keys)
            .write.mode("errorifexists")
            .partitionBy(BUCKET_COL)
            .parquet(data_dir)
        )
        buckets = {}
        if os.path.isdir(data_dir):
            for name in os.listdir(data_dir):
                if name.startswith(f"{BUCKET_COL}="):
                    b = name.split("=", 1)[1]
                    buckets[b] = os.path.join(_DATA_DIR, "v0", name)
        _write_manifest(
            root,
            0,
            {"version": 0, "keys": keys, "num_buckets": num_buckets,
             "buckets": buckets, "schema": df.schema.json()},
        )
        return t

    # -- read ----------------------------------------------------------

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Snapshot read: resolves the manifest once; the returned frame
        only references immutable per-version directories, so later
        commits never change (or break) it."""
        v = self.latest_version() if version is None else version
        m = _read_manifest(self.root, v)
        if not m["buckets"]:
            # empty snapshot (zero-row create / every key deleted): the
            # manifest's recorded schema keeps it queryable
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(json.loads(m["schema"]))
            return spark.createDataFrame([], schema)
        frames = []
        for b, rel in sorted(m["buckets"].items()):
            frames.append(
                spark.read.parquet(os.path.join(self.root, rel)).withColumn(
                    BUCKET_COL, F.lit(int(b))
                )
            )
        out = frames[0]
        for fdf in frames[1:]:
            out = out.unionByName(fdf, allowMissingColumns=True)
        return out.drop(BUCKET_COL)

    # -- write paths ---------------------------------------------------

    def _commit_buckets(
        self,
        spark: SparkSession,
        new_per_bucket: DataFrame,
        affected: list[int],
    ) -> int:
        """Write `new_per_bucket` (already carrying BUCKET_COL limited to
        `affected`) as the next version's files and publish a manifest
        where untouched buckets keep their old directories."""
        prev_v = self.latest_version()
        prev = _read_manifest(self.root, prev_v)
        v = prev_v + 1
        data_dir = os.path.join(self.root, _DATA_DIR, f"v{v}")
        (
            new_per_bucket.repartition(BUCKET_COL)
            .sortWithinPartitions(*self.keys)
            .write.mode("errorifexists")
            .partitionBy(BUCKET_COL)
            .parquet(data_dir)
        )
        buckets = dict(prev["buckets"])
        schema_json = prev.get("schema")
        written = set()
        if os.path.isdir(data_dir):
            for name in os.listdir(data_dir):
                if name.startswith(f"{BUCKET_COL}="):
                    b = name.split("=", 1)[1]
                    buckets[b] = os.path.join(_DATA_DIR, f"v{v}", name)
                    written.add(int(b))
        # a bucket whose merge result became EMPTY (every key deleted)
        # writes no files — drop it from the manifest entirely
        for b in affected:
            if b not in written and str(b) in buckets:
                del buckets[str(b)]
        _write_manifest(
            self.root,
            v,
            {"version": v, "keys": self.keys, "num_buckets": self.num_buckets,
             "buckets": buckets,
             "schema": schema_json or new_per_bucket.drop(BUCKET_COL).schema.json()},
        )
        return v

    def merge(
        self,
        spark: SparkSession,
        delta: DataFrame,
        order_col: str | None = None,
    ) -> int:
        """MERGE (upsert) as a new version: only buckets containing delta
        keys get new files; every other bucket's pointer carries over.
        Returns the committed version number."""
        delta = delta.withColumn(
            BUCKET_COL, bucket_expr(self.keys, self.num_buckets)
        )
        affected = [
            r[BUCKET_COL] for r in delta.select(BUCKET_COL).distinct().collect()
        ]
        if not affected:
            return self.latest_version()
        m = _read_manifest(self.root, self.latest_version())
        old_frames = [
            spark.read.parquet(os.path.join(self.root, m["buckets"][str(b)]))
            .withColumn(BUCKET_COL, F.lit(int(b)))
            for b in affected
            if str(b) in m["buckets"]
        ]
        if old_frames:
            target = old_frames[0]
            for fdf in old_frames[1:]:
                target = fdf.unionByName(target, allowMissingColumns=True)
            merged = merge_upsert(target, delta, self.keys, order_col)
        else:
            merged = dedup_latest(delta, self.keys, order_col)
        merged = merged.withColumn(
            BUCKET_COL, bucket_expr(self.keys, self.num_buckets)
        )
        return self._commit_buckets(spark, merged, affected)

    def apply_cdc(
        self,
        spark: SparkSession,
        net: DataFrame,
        op_col: str = "op",
        order_col: str | None = None,
    ) -> int:
        """CDC APPLY as a new version: last-op-per-key collapse, then 'D'
        removes the key, anything else upserts — the versioned twin of
        sync/merge.py::apply_cdc_bucketed."""
        net = dedup_latest(net, self.keys, order_col)
        net = net.withColumn(BUCKET_COL, bucket_expr(self.keys, self.num_buckets))
        affected = [
            r[BUCKET_COL] for r in net.select(BUCKET_COL).distinct().collect()
        ]
        if not affected:
            return self.latest_version()
        m = _read_manifest(self.root, self.latest_version())
        old_frames = [
            spark.read.parquet(os.path.join(self.root, m["buckets"][str(b)]))
            .withColumn(BUCKET_COL, F.lit(int(b)))
            for b in affected
            if str(b) in m["buckets"]
        ]
        upserts = net.filter(F.col(op_col) != "D").drop(op_col)
        if old_frames:
            target = old_frames[0]
            for fdf in old_frames[1:]:
                target = fdf.unionByName(target, allowMissingColumns=True)
            kept = target.join(
                net.select(*self.keys).distinct(), self.keys, "left_anti"
            )
            from .merge import _widen

            kept = _widen(kept, upserts)
            upserts = _widen(upserts, kept).select(*kept.columns)
            merged = kept.unionByName(upserts)
        else:
            merged = upserts
        merged = merged.withColumn(
            BUCKET_COL, bucket_expr(self.keys, self.num_buckets)
        )
        return self._commit_buckets(spark, merged, affected)

    # -- vacuum --------------------------------------------------------

    def vacuum(self, keep_last: int = 1) -> list[str]:
        """Drop manifests older than the newest `keep_last`, then delete
        any data directory no surviving manifest references. Never
        touches directories a retained snapshot can still read."""
        import shutil

        vs = self.versions()
        keep = vs[-keep_last:] if keep_last > 0 else vs
        removed = []
        for v in vs:
            if v not in keep:
                os.remove(_manifest_path(self.root, v))
        live: set[str] = set()
        for v in keep:
            m = _read_manifest(self.root, v)
            for rel in m["buckets"].values():
                # a bucket pointer is data/v{n}/__bucket=K — the live unit
                # is the whole version directory data/v{n}
                live.add(rel.split(os.sep)[1])
        ddir = os.path.join(self.root, _DATA_DIR)
        if os.path.isdir(ddir):
            for name in os.listdir(ddir):
                if name not in live:
                    shutil.rmtree(os.path.join(ddir, name))
                    removed.append(name)
        return removed
