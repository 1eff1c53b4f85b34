"""Streaming CDC apply — versioned, bucket-partitioned, append-only
upsert state with a manifest commit log (a miniature lakehouse table).

The lakehouse ingestion primitive: a stream of change batches (CDC deltas)
is MERGEd into a queryable table as it arrives. The reference applies
changes tuple-at-a-time through its Insert/Update executors
(src/execution/update_executor.cpp); the streaming-scale equivalent is
foreachBatch + set-level merge (operators/cdc.merge_upsert), with the
state layout doing the heavy lifting:

  layout      state_dir/v{N}/bucket={b}/*.parquet — version directories
              are APPEND-ONLY; version N holds only the buckets its delta
              touched (bucket = pmod(key, n_buckets)). v0 is the full
              base. Nothing is ever overwritten or deleted, so readers
              racing a commit see a consistent older snapshot.
  manifest    a JSON commit log (manifest.json, atomic os.replace) maps
              each version -> (touched buckets, source batch_id). The
              CURRENT view resolves, per bucket, the newest version
              containing it — exactly how Delta/Iceberg resolve data
              files from their log; driver cost is O(n_buckets), not
              O(rows).
  merge       per batch: resolve + read ONLY the touched buckets'
              current files, broadcast-delta merge (the state partitions
              are never shuffled), write the merged buckets as the next
              version. Per-batch cost is O(touched buckets) — a daily 1%
              delta against a 100 TB base rewrites ~1% of the table.
  exactly-once the manifest records the foreachBatch batch_id; a replayed
              batch (at-least-once delivery after a crash) is recognized
              and skipped, so the commit log never double-applies.
  time travel state_df(version=k) reads the table as of any committed
              version — reproducibility for training-data snapshots
              ("which exact rows did the 2026-08-01 run see?") comes free
              from the append-only layout.
  compaction  compact() folds every bucket's current view into one new
              full version, bounding the per-bucket version chain that
              the resolver walks (the Delta OPTIMIZE analogue). Old
              versions stay readable until vacuum(retain) drops them.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.cdc import merge_upsert

BUCKET_COL = "_bucket"


class StreamUpsertSink:
    """foreachBatch sink merging delta batches into versioned state."""

    def __init__(
        self,
        spark: SparkSession,
        base: DataFrame,
        key_col: "str | list[str]",
        state_dir: str,
        n_buckets: int = 8,
        compact_every: "int | None" = None,
        auto_vacuum: bool = False,
    ):
        # operational policy, not table identity: how many delta versions
        # may accumulate before process_batch folds them into one full
        # version (bounding both the resolver chain and the small-file
        # count — the Delta OPTIMIZE cadence), and whether the fold also
        # vacuums the now-unreferenced older dirs (trading time travel
        # below the fold for a bounded on-disk footprint). Exactly-once
        # replay detection survives vacuum via the max_batch_id watermark
        # (structured streaming batch ids are monotonic; a replay
        # redelivers an id <= the watermark).
        self.compact_every = compact_every
        self.auto_vacuum = auto_vacuum
        self.spark = spark
        # composite keys bucket by xxhash64 over all key columns —
        # deterministic and resume-stable (recorded via n_buckets in the
        # manifest; the hash function itself is versionless Spark builtin)
        self.key_cols = [key_col] if isinstance(key_col, str) else list(key_col)
        self.state_dir = state_dir
        self.n_buckets = n_buckets
        self.columns = base.columns
        manifest = os.path.join(state_dir, "manifest.json")
        if os.path.exists(manifest):  # resume an existing table
            from pyspark.sql.types import StructType

            with open(manifest) as f:
                m = json.load(f)
            self.versions = m["versions"]
            self.schema = StructType.fromJson(json.loads(m["schema"]))
            # the bucket FUNCTION is part of the table's on-disk identity:
            # resuming with different n_buckets OR different/reordered key
            # columns would route keys to the wrong partition dirs and
            # silently duplicate them on merge — both are restored from
            # the manifest, the caller's values ignored. bucket_fn guards
            # the hash itself: pre-fix manifests (pmod over a long cast for
            # single keys) keep their legacy routing; new tables always
            # hash with xxhash64
            self.n_buckets = m["n_buckets"]
            self.key_cols = m["key_cols"]
            self.bucket_fn = m.get("bucket_fn", "pmod_long")
            self.vacuum_floor = m.get("vacuum_floor")
            # pre-watermark manifests: recover the high-water mark from
            # the surviving version entries (their batch ids)
            self.max_batch_id = m.get(
                "max_batch_id",
                max(
                    (e["batch_id"] for e in self.versions if e["batch_id"] is not None),
                    default=None,
                ),
            )
            return
        self.schema = base.select(*self.columns).schema
        self.bucket_fn = "xxhash64"
        self.vacuum_floor = None
        self.max_batch_id = None
        (
            base.withColumn(BUCKET_COL, self._bucket())
            .write.mode("overwrite")
            .partitionBy(BUCKET_COL)
            .parquet(os.path.join(state_dir, "v0"))
        )
        self.versions: list[dict] = [
            {"v": 0, "buckets": list(range(n_buckets)), "batch_id": None}
        ]
        self._write_manifest()

    def _bucket(self) -> F.Column:
        # xxhash64 for ANY key shape (single or composite, numeric or
        # string): a long cast of a non-numeric string key yields NULL,
        # which parquet's partitionBy writes under __HIVE_DEFAULT_PARTITION__
        # — a dir _resolve never looks at, i.e. silent full-table row loss.
        # xxhash64 never returns NULL (even NULL inputs hash to a value),
        # so no NULL-bucket dir can exist. Legacy manifests keep their
        # recorded pmod routing so existing dirs stay addressable.
        if self.bucket_fn == "pmod_long":
            if len(self.key_cols) == 1:
                return F.pmod(F.col(self.key_cols[0]).cast("long"), F.lit(self.n_buckets))
            return F.pmod(F.xxhash64(*self.key_cols), F.lit(self.n_buckets))
        return F.pmod(F.xxhash64(*self.key_cols), F.lit(self.n_buckets))

    def _write_manifest(self) -> None:
        fd, tmp = tempfile.mkstemp(dir=self.state_dir, prefix=".manifest_")
        with os.fdopen(fd, "w") as f:
            json.dump(
                {
                    "versions": self.versions,
                    "schema": self.schema.json(),
                    "n_buckets": self.n_buckets,
                    "key_cols": self.key_cols,
                    "bucket_fn": self.bucket_fn,
                    "vacuum_floor": self.vacuum_floor,
                    "max_batch_id": self.max_batch_id,
                },
                f,
            )
        os.replace(tmp, os.path.join(self.state_dir, "manifest.json"))

    def _resolve(self, version: int | None = None) -> dict[int, str]:
        """bucket -> newest data dir at-or-before ``version`` (current if
        None). O(versions x touched-buckets) driver arithmetic, no I/O."""
        paths: dict[int, str] = {}
        for entry in self.versions:
            if version is not None and entry["v"] > version:
                continue
            for b in entry["buckets"]:
                paths[b] = os.path.join(
                    self.state_dir, f"v{entry['v']}", f"{BUCKET_COL}={b}"
                )
        return paths

    def _read(self, paths) -> DataFrame:
        """Read the given bucket dirs; a resolved dir can be legitimately
        ABSENT (a bucket emptied by deletes, or never populated — parquet's
        partitionBy writes no dir for a value with zero rows), which means
        "empty", never "fall back to an older version"."""
        existing = sorted(p for p in paths if os.path.isdir(p))
        if not existing:
            return self.spark.createDataFrame([], self.schema)
        return self.spark.read.parquet(*existing).select(*self.columns)

    def state_df(self, version: int | None = None) -> DataFrame:
        """The table as of ``version`` (default: current)."""
        if version is not None and self.vacuum_floor is not None and version < self.vacuum_floor:
            # below the floor, SOME dirs may still resolve (e.g. the v0
            # base survives because newer versions reference it) — reading
            # them would fabricate a snapshot that never existed (base
            # without its vacuumed deltas). Hard-refuse instead.
            raise ValueError(
                f"version {version} is below the vacuum floor "
                f"{self.vacuum_floor} — its snapshot is no longer complete"
            )
        paths = self._resolve(version)
        if not paths and version is not None and version < self.versions[0]["v"]:
            raise ValueError(f"no committed version at or before {version}")
        return self._read(paths.values())

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        # at-least-once redelivery: structured streaming batch ids are
        # monotonic, so anything at or below the committed high-water mark
        # is a replay. The watermark (persisted in the manifest) survives
        # vacuum, which drops old version entries along with their
        # recorded batch ids.
        if self.max_batch_id is not None and batch_id <= self.max_batch_id:
            return
        if any(e["batch_id"] == batch_id for e in self.versions):
            return  # pre-watermark manifests only
        # a batch carrying an _op column is a full Debezium-shaped change
        # set (upserts + tombstones); without it, every row is an upsert
        has_ops = "_op" in batch_df.columns
        delta = batch_df.select(*(self.columns + ["_op"] if has_ops else self.columns))
        touched = sorted(
            r["b"]
            for r in delta.select(self._bucket().alias("b"))
            .distinct()
            .collect()
        )
        if not touched:
            return
        paths = self._resolve()
        current = self._read(paths[b] for b in touched if b in paths)
        if has_ops:
            from ..operators.cdc import apply_changes

            merged = apply_changes(
                current, delta, self.key_cols, broadcast_source=True
            )
        else:
            merged = merge_upsert(current, delta, self.key_cols, broadcast_source=True)
        v = self.versions[-1]["v"] + 1
        vdir = os.path.join(self.state_dir, f"v{v}")
        if os.path.exists(vdir):
            # leftover from a crash between write and manifest commit —
            # unreferenced by the log, safe to discard (single writer)
            shutil.rmtree(vdir)
        (
            merged.withColumn(BUCKET_COL, self._bucket())
            .write.mode("errorifexists")
            .partitionBy(BUCKET_COL)
            .parquet(vdir)
        )
        # commit point: readers see the new version only after this replace
        self.versions.append({"v": v, "buckets": touched, "batch_id": batch_id})
        self.max_batch_id = (
            batch_id if self.max_batch_id is None else max(self.max_batch_id, batch_id)
        )
        self._write_manifest()
        if self.compact_every is not None:
            # versions since the last FULL version (one that carries every
            # bucket — v0 or a prior compaction)
            since_full = 0
            for e in reversed(self.versions):
                if len(e["buckets"]) == self.n_buckets:
                    break
                since_full += 1
            if since_full >= self.compact_every:
                cv = self.compact()
                if self.auto_vacuum:
                    self.vacuum(retain_from=cv)

    def compact(self) -> int:
        """Fold the current view into one full version (bounds the version
        chain). Returns the new version number."""
        v = self.versions[-1]["v"] + 1
        vdir = os.path.join(self.state_dir, f"v{v}")
        if os.path.exists(vdir):
            shutil.rmtree(vdir)
        (
            self.state_df()
            .withColumn(BUCKET_COL, self._bucket())
            .write.mode("errorifexists")
            .partitionBy(BUCKET_COL)
            .parquet(vdir)
        )
        self.versions.append(
            {"v": v, "buckets": list(range(self.n_buckets)), "batch_id": None}
        )
        self._write_manifest()
        return v

    def vacuum(self, retain_from: int) -> list[int]:
        """Drop version directories no longer reachable from any version
        >= ``retain_from`` (time travel below that floor stops working).
        Returns the versions removed."""
        latest = self.versions[-1]["v"]
        if retain_from > latest:
            raise ValueError(
                f"retain_from={retain_from} is above the newest committed "
                f"version {latest} — refusing a vacuum that would drop the "
                "current table"
            )
        keep_dirs = set()
        for entry in self.versions:
            if entry["v"] < retain_from:
                continue
            keep_dirs.update(self._resolve(entry["v"]).values())
        removed = []
        for entry in list(self.versions):
            vdir = os.path.join(self.state_dir, f"v{entry['v']}")
            live = any(d.startswith(vdir + os.sep) or d == vdir for d in keep_dirs)
            if not live:
                shutil.rmtree(vdir, ignore_errors=True)
                self.versions.remove(entry)
                removed.append(entry["v"])
        # record the floor even when nothing was removable: time travel
        # below retain_from is no longer guaranteed-complete either way
        self.vacuum_floor = (
            retain_from
            if self.vacuum_floor is None
            else max(self.vacuum_floor, retain_from)
        )
        self._write_manifest()
        return removed


def apply_stream(
    stream: DataFrame,
    sink: StreamUpsertSink,
    checkpoint_dir: str,
):
    """Wire a delta stream into the sink (availableNow: drain staged files
    then stop — the gated-entry shape; production runs drop the trigger)."""
    return (
        stream.writeStream.foreachBatch(sink.process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
