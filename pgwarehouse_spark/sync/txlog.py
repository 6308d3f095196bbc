"""Minimal transaction log over the bucketed parquet layout — snapshot
isolation, time travel, multi-writer commits, and safe vacuum for the
sync engine's tables.

`sync/merge.py` documents the plain-parquet caveat: a bucket-pruned MERGE
rewrites partition directories in place, so a concurrent reader can see a
half-written table (exactly what Delta/Iceberg transaction logs solve).
This module is the engine's own minimal log, reference-free and
idiomatic-Spark:

- Data files are IMMUTABLE and commit-private: version ``n`` stages its
  changed buckets under ``data/v{n}-{token}/__bucket=K/`` where
  ``token`` is a per-commit random suffix, so a torn commit (crash after
  the data write, before the manifest publish) leaves an orphan
  directory that never collides with any later writer — the next commit
  proceeds normally and ``vacuum`` reclaims the orphan. Unchanged
  buckets keep pointing at the directory of the version that last wrote
  them.
- A manifest ``manifest/v{n}.json`` maps every bucket to the directory
  holding its current files. Publishing is ATOMIC AND EXCLUSIVE: the
  manifest is written to a temp name and ``os.link``ed to its final
  name — the hard link both appears atomically (readers never see a
  torn manifest) and fails with ``FileExistsError`` if another writer
  already committed that version, which surfaces as
  :class:`CommitConflict`. ``merge``/``apply_cdc`` catch the conflict
  and REBASE: re-read the new latest snapshot, recompute the merge, and
  retry — so under concurrent writers exactly one commit per version
  survives and no update is lost (optimistic concurrency, the same
  protocol Delta's log store uses).
- Readers resolve a manifest ONCE and read only immutable paths, so a
  reader pinned at version ``n`` is untouched by later merges
  (snapshot isolation) and any historical version remains queryable
  until vacuumed (time travel). A snapshot read groups bucket pointers
  by version directory and issues ONE parquet scan per referenced
  version (``basePath`` recovers ``__bucket`` from the directory
  names) — the plan holds O(referenced versions) scan nodes, not
  O(buckets), so thousand-bucket tables stay driver-trivial.
- Every ``CHECKPOINT_INTERVAL`` commits, ``manifest/checkpoint.json``
  records the latest version, making resolution O(1)+O(gap): read the
  checkpoint, probe forward for newer manifests — no full directory
  listing. ``vacuum`` refreshes the checkpoint to the oldest retained
  version so probing always walks a contiguous range.
- ``vacuum(keep_last)`` deletes data directories no surviving manifest
  references — never anything a retained snapshot can still read — and
  prunes manifests (and torn-commit orphans) past the checkpoint. An
  unreferenced dir is only reclaimed once older than a retention window
  (newest mtime in the tree): a FRESH unreferenced dir may be a live
  writer's not-yet-published staging, which must survive vacuum.

At 100 TB this is the same layout Delta uses (immutable files + log +
periodic checkpoint). A manifest holds one entry per bucket (thousands,
not millions — it stays driver-trivial). Reference parity note: the
reference's loaders are single-writer with no isolation at all
(pgwarehouse.py:96-110); this module exists because a 1000-executor
deployment cannot assume that.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

from .merge import BUCKET_COL, bucket_expr, dedup_latest, merge_upsert

_MANIFEST_DIR = "manifest"
_DATA_DIR = "data"
_CKPT = "checkpoint.json"

#: a checkpoint manifest is refreshed every this-many commits
CHECKPOINT_INTERVAL = 20

#: vacuum only reclaims UNREFERENCED data dirs whose newest file is at
#: least this old — a fresh unreferenced dir may be a live writer's
#: commit-private staging (manifest not yet published), and deleting it
#: would corrupt that writer's commit (Delta guards the identical race
#: with deletedFileRetentionDuration)
DEFAULT_VACUUM_RETENTION = 24 * 3600.0


def _tree_newest_mtime(path: str) -> float:
    """Newest mtime across a directory tree (the dir itself included):
    a writer streaming parquet into nested __bucket=K/ subdirs only
    bumps the leaf dirs' mtimes, so the top-level mtime alone would
    under-report recency."""
    # EVERY stat is guarded, not just the per-file loop: the tree being
    # walked is by definition unreferenced, so a concurrent writer
    # aborting (or a racing vacuum) can remove the top-level dir or a
    # nested __bucket=K subdir between listdir and stat — an unguarded
    # getmtime would abort the whole vacuum() on exactly the race the
    # retention window exists to survive. A vanished path reads as
    # "fresh" (now), so this pass skips it; if it is truly gone the next
    # vacuum sees nothing, and if it is mid-write the retention window
    # protects it.
    try:
        newest = os.path.getmtime(path)
    except OSError:
        return time.time()
    for dirpath, _dirnames, filenames in os.walk(path):
        try:
            newest = max(newest, os.path.getmtime(dirpath))
        except OSError:  # dir vanished mid-walk (concurrent writer)
            return time.time()
        for fn in filenames:
            try:
                newest = max(
                    newest, os.path.getmtime(os.path.join(dirpath, fn))
                )
            except OSError:  # file vanished mid-walk (concurrent writer)
                newest = time.time()
    return newest

#: rebase attempts before a concurrent-writer conflict propagates
MAX_COMMIT_RETRIES = 5


class CommitConflict(RuntimeError):
    """Another writer published this version first; rebase and retry."""


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


def _publish_manifest(root: str, version: int, manifest: dict) -> None:
    """Atomic, EXCLUSIVE publish: hard-link a private temp file to the
    final name. The link appears atomically (no reader sees partial
    JSON) and raises if the version was already committed — the
    mutual-exclusion primitive for multi-writer safety. POSIX-local by
    design; an object-store port would swap in a put-if-absent."""
    os.makedirs(os.path.join(root, _MANIFEST_DIR), exist_ok=True)
    final = _manifest_path(root, version)
    tmp = final + f".tmp-{os.urandom(4).hex()}"
    with open(tmp, "w") as f:
        json.dump(manifest, f, sort_keys=True)
    try:
        os.link(tmp, final)
    except FileExistsError:
        raise CommitConflict(
            f"version {version} already committed under {root}; rebase"
        ) from None
    finally:
        try:
            os.remove(tmp)
        except OSError:
            pass


def _read_manifest(root: str, version: int) -> dict:
    with open(_manifest_path(root, version)) as f:
        return json.load(f)


def _checkpoint_path(root: str) -> str:
    return os.path.join(root, _MANIFEST_DIR, _CKPT)


def _read_checkpoint(root: str) -> int | None:
    try:
        with open(_checkpoint_path(root)) as f:
            return int(json.load(f)["version"])
    except (OSError, ValueError, KeyError, json.JSONDecodeError):
        return None


def _write_checkpoint(root: str, version: int) -> None:
    """Monotone best-effort checkpoint: losing a concurrent-writer race
    can only leave an OLDER checkpoint behind, which makes resolution
    probe a few extra versions — never wrong, because probing always
    walks forward from the checkpoint."""
    current = _read_checkpoint(root)
    if current is not None and current >= version:
        return
    path = _checkpoint_path(root)
    tmp = path + f".tmp-{os.urandom(4).hex()}"
    with open(tmp, "w") as f:
        json.dump({"version": version}, f)
    os.replace(tmp, path)


class TxTable:
    """Multi-writer, many-reader versioned bucketed table."""

    def __init__(self, root: str, keys: list[str], num_buckets: int):
        self.root = root
        self.keys = keys
        self.num_buckets = num_buckets

    # -- versions ------------------------------------------------------

    def versions(self) -> list[int]:
        return _list_versions(self.root)

    def latest_version(self) -> int:
        """O(1)+O(gap): checkpoint + forward probe. Falls back to a full
        listing when no checkpoint exists yet (young table)."""
        ck = _read_checkpoint(self.root)
        if ck is None or not os.path.exists(_manifest_path(self.root, ck)):
            vs = self.versions()
            if not vs:
                raise FileNotFoundError(f"no committed version under {self.root}")
            return vs[-1]
        v = ck
        while os.path.exists(_manifest_path(self.root, v + 1)):
            v += 1
        return v

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
        dirname = f"v0-{os.urandom(4).hex()}"
        data_dir = os.path.join(root, _DATA_DIR, dirname)
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
                    buckets[b] = os.path.join(_DATA_DIR, dirname, name)
        _publish_manifest(
            root,
            0,
            {"version": 0, "keys": keys, "num_buckets": num_buckets,
             "buckets": buckets, "schema": df.schema.json()},
        )
        return t

    # -- read ----------------------------------------------------------

    def _snapshot_frame(
        self,
        spark: SparkSession,
        manifest: dict,
        wanted: set[int] | None = None,
    ) -> DataFrame | None:
        """Union of the manifest's bucket files (optionally restricted to
        `wanted` buckets), BUCKET_COL retained. ONE scan per referenced
        version directory: pointers are grouped by dirname and passed as
        multiple paths to a single reader with basePath set to the
        version dir, so partition discovery re-derives __bucket — the
        plan stays O(versions), not O(buckets) (ADVICE r02)."""
        pointers = {
            b: rel
            for b, rel in manifest["buckets"].items()
            if wanted is None or int(b) in wanted
        }
        if not pointers:
            return None
        groups: dict[str, list[str]] = {}
        for rel in pointers.values():
            groups.setdefault(os.path.dirname(rel), []).append(rel)
        frames = []
        for vdir, rels in sorted(groups.items()):
            reader = spark.read.option(
                "basePath", os.path.join(self.root, vdir)
            )
            frames.append(
                reader.parquet(*[os.path.join(self.root, r) for r in sorted(rels)])
            )
        out = frames[0]
        for fdf in frames[1:]:
            out = out.unionByName(fdf, allowMissingColumns=True)
        return out

    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Snapshot read: resolves the manifest once; the returned frame
        only references immutable per-version directories, so later
        commits never change (or break) it."""
        v = self.latest_version() if version is None else version
        m = _read_manifest(self.root, v)
        snap = self._snapshot_frame(spark, m)
        if snap is None:
            # empty snapshot (zero-row create / every key deleted): the
            # manifest's recorded schema keeps it queryable
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(json.loads(m["schema"]))
            return spark.createDataFrame([], schema)
        return snap.drop(BUCKET_COL)

    # -- write paths ---------------------------------------------------

    def _commit_buckets(
        self,
        spark: SparkSession,
        new_per_bucket: DataFrame,
        affected: list[int],
        base_version: int,
        base_manifest: dict,
    ) -> int:
        """Write `new_per_bucket` (already carrying BUCKET_COL limited to
        `affected`) into a commit-private staging directory, then
        exclusively publish a manifest for base_version+1 where
        untouched buckets keep their old directories. Raises
        CommitConflict (leaving only an orphan data dir for vacuum) if
        another writer won the version."""
        v = base_version + 1
        dirname = f"v{v}-{os.urandom(4).hex()}"
        data_dir = os.path.join(self.root, _DATA_DIR, dirname)
        (
            new_per_bucket.repartition(BUCKET_COL)
            .sortWithinPartitions(*self.keys)
            .write.mode("errorifexists")
            .partitionBy(BUCKET_COL)
            .parquet(data_dir)
        )
        buckets = dict(base_manifest["buckets"])
        # record the UNION of the base manifest's schema and the commit
        # frame's schema. Commit-only columns must surface (schema
        # evolution — delta grew a column, or an empty-after-delete
        # snapshot would resurrect the pre-evolution schema), but base
        # columns must survive too: when the delta touches only buckets
        # absent from the manifest, merge()/apply_cdc() commit the delta
        # frame as-is, and a delta narrower than the table would
        # silently narrow the recorded schema (mirrors merge._widen).
        from pyspark.sql.types import StructType

        commit_schema = new_per_bucket.drop(BUCKET_COL).schema
        base_schema = StructType.fromJson(json.loads(base_manifest["schema"]))
        have = {f.name for f in commit_schema.fields}
        widened = StructType(
            list(commit_schema.fields)
            + [f for f in base_schema.fields if f.name not in have]
        )
        schema_json = widened.json()
        written = set()
        if os.path.isdir(data_dir):
            for name in os.listdir(data_dir):
                if name.startswith(f"{BUCKET_COL}="):
                    b = name.split("=", 1)[1]
                    buckets[b] = os.path.join(_DATA_DIR, dirname, name)
                    written.add(int(b))
        # a bucket whose merge result became EMPTY (every key deleted)
        # writes no files — drop it from the manifest entirely
        for b in affected:
            if b not in written and str(b) in buckets:
                del buckets[str(b)]
        _publish_manifest(
            self.root,
            v,
            {"version": v, "keys": self.keys, "num_buckets": self.num_buckets,
             "buckets": buckets,
             "schema": schema_json},
        )
        if v % CHECKPOINT_INTERVAL == 0:
            _write_checkpoint(self.root, v)
        return v

    def merge(
        self,
        spark: SparkSession,
        delta: DataFrame,
        order_col: str | None = None,
        max_retries: int = MAX_COMMIT_RETRIES,
    ) -> int:
        """MERGE (upsert) as a new version: only buckets containing delta
        keys get new files; every other bucket's pointer carries over.
        On a concurrent-writer conflict the merge REBASES onto the new
        latest snapshot and retries. Returns the committed version."""
        delta = delta.withColumn(
            BUCKET_COL, bucket_expr(self.keys, self.num_buckets)
        )
        affected = [
            r[BUCKET_COL] for r in delta.select(BUCKET_COL).distinct().collect()
        ]
        if not affected:
            return self.latest_version()
        for attempt in range(max_retries + 1):
            base_v = self.latest_version()
            m = _read_manifest(self.root, base_v)
            target = self._snapshot_frame(spark, m, set(affected))
            if target is not None:
                merged = merge_upsert(target, delta, self.keys, order_col)
            else:
                merged = dedup_latest(delta, self.keys, order_col)
            merged = merged.withColumn(
                BUCKET_COL, bucket_expr(self.keys, self.num_buckets)
            )
            try:
                return self._commit_buckets(spark, merged, affected, base_v, m)
            except CommitConflict:
                if attempt == max_retries:
                    raise
        raise AssertionError("unreachable")

    def apply_cdc(
        self,
        spark: SparkSession,
        net: DataFrame,
        op_col: str = "op",
        order_col: str | None = None,
        max_retries: int = MAX_COMMIT_RETRIES,
    ) -> int:
        """CDC APPLY as a new version: last-op-per-key collapse, then 'D'
        removes the key, anything else upserts — the versioned twin of
        sync/merge.py::apply_cdc_bucketed, with the same rebase-on-
        conflict protocol as merge()."""
        from pyspark.sql import functions as F

        net = dedup_latest(net, self.keys, order_col)
        net = net.withColumn(BUCKET_COL, bucket_expr(self.keys, self.num_buckets))
        affected = [
            r[BUCKET_COL] for r in net.select(BUCKET_COL).distinct().collect()
        ]
        if not affected:
            return self.latest_version()
        # null-safe op compare + anti-join: see merge.apply_cdc_bucketed
        upserts = net.filter(~F.col(op_col).eqNullSafe("D")).drop(op_col)
        for attempt in range(max_retries + 1):
            base_v = self.latest_version()
            m = _read_manifest(self.root, base_v)
            target = self._snapshot_frame(spark, m, set(affected))
            if target is not None:
                from .merge import _anti_by_keys

                kept = _anti_by_keys(
                    target, net.select(*self.keys).distinct(), self.keys
                )
                from .merge import _widen

                kept = _widen(kept, upserts)
                aligned = _widen(upserts, kept).select(*kept.columns)
                merged = kept.unionByName(aligned)
            else:
                merged = upserts
            merged = merged.withColumn(
                BUCKET_COL, bucket_expr(self.keys, self.num_buckets)
            )
            try:
                return self._commit_buckets(spark, merged, affected, base_v, m)
            except CommitConflict:
                if attempt == max_retries:
                    raise
        raise AssertionError("unreachable")

    # -- compact -------------------------------------------------------

    def compact(
        self,
        spark: SparkSession,
        min_files: int = 2,
        max_retries: int = MAX_COMMIT_RETRIES,
    ) -> int:
        """Small-file compaction as a NEW VERSION: every bucket whose
        current directory holds >= `min_files` data files is rewritten
        as one sorted file; buckets already compact keep their old
        pointers untouched. Concurrent-writer safe via the same
        rebase-on-conflict protocol as merge() — a compaction racing a
        merge simply retries against the merged snapshot. Readers
        pinned at older versions are unaffected (immutable files);
        vacuum reclaims the fragmented directories once unreferenced.

        This is the maintenance half of a log-structured table at
        100 TB: buckets fragment when a commit's writer splits them
        (spark.sql.files.maxRecordsPerFile caps, speculative tasks,
        AQE-split writes); compaction bounds read amplification without
        blocking readers or writers — the OPTIMIZE of Delta, expressed
        over the same bucket manifest."""
        import glob as _glob

        for attempt in range(max_retries + 1):
            base_v = self.latest_version()
            m = _read_manifest(self.root, base_v)
            fragmented = []
            for b, rel in m["buckets"].items():
                n = len(
                    _glob.glob(os.path.join(self.root, rel, "*.parquet"))
                )
                if n >= min_files:
                    fragmented.append(int(b))
            if not fragmented:
                return base_v
            snap = self._snapshot_frame(spark, m, set(fragmented))
            if snap is None:
                return base_v
            # one output file per bucket: repartition on the bucket key
            # then sort by PK within (the PK-ordered physical layout the
            # initial create used)
            try:
                return self._commit_buckets(
                    spark, snap, fragmented, base_v, m
                )
            except CommitConflict:
                if attempt == max_retries:
                    raise
        raise AssertionError("unreachable")

    # -- vacuum --------------------------------------------------------

    def vacuum(
        self,
        keep_last: int = 1,
        retention_seconds: float = DEFAULT_VACUUM_RETENTION,
    ) -> list[str]:
        """Drop manifests older than the newest `keep_last`, refresh the
        checkpoint to the oldest retained version (so latest_version's
        forward probe always walks a contiguous range), then delete any
        data directory no surviving manifest references — torn-commit
        orphans included. Never touches directories a retained snapshot
        can still read.

        Unreferenced directories are only reclaimed once every file in
        them is older than `retention_seconds` (newest-mtime over the
        tree): an in-flight writer's commit-private staging dir
        (data/v{n}-{token} written, manifest not yet published) is
        indistinguishable from a torn-commit orphan by name alone, and
        deleting it would let the writer's subsequent exclusive manifest
        publish commit bucket pointers to vanished files — corrupting
        that version for every reader. The age guard is the same defense
        Delta's vacuum uses (deletedFileRetentionDuration): anything a
        live writer is still producing is, by construction, recent.
        Pass retention_seconds=0 only when no writer can be in flight
        (single-process maintenance windows, tests)."""
        import shutil

        vs = self.versions()
        keep = vs[-keep_last:] if keep_last > 0 else vs
        removed = []
        for v in vs:
            if v not in keep:
                os.remove(_manifest_path(self.root, v))
        if keep:
            _write_checkpoint(self.root, keep[0])
        live: set[str] = set()
        for v in keep:
            m = _read_manifest(self.root, v)
            for rel in m["buckets"].values():
                # a bucket pointer is data/v{n}-{token}/__bucket=K — the
                # live unit is the whole commit directory
                live.add(rel.split(os.sep)[1])
        ddir = os.path.join(self.root, _DATA_DIR)
        now = time.time()
        if os.path.isdir(ddir):
            for name in os.listdir(ddir):
                if name in live:
                    continue
                path = os.path.join(ddir, name)
                if now - _tree_newest_mtime(path) < retention_seconds:
                    continue  # possibly an in-flight writer's staging
                shutil.rmtree(path)
                removed.append(name)
        return removed
