"""J1: latest-wins keyed store + enrichment join (SURVEY.md §2.4 J1,
§7 hard-part #1).

The reference synchronizes its two streams *through Cassandra*: every
attach event upserts ``attach_event`` keyed by bearer_id
(``TrafficStreamProcessor.scala:42``), and every celltower event
point-joins that table (``:52-56``) — so a celltower event matches
the latest attach seen *at any time in the past* (unbounded state),
and unmatched events drop (inner join).  A watermarked stream-stream
join cannot reproduce that; a keyed upsert store can.

``KeyedUpsertStore`` is a parquet-backed compacted table, hash-
bucketed by key: rows live under ``_bucket=hash(key) % B`` partition
directories.  Each micro-batch merge touches ONLY the buckets its
keys fall in — the current snapshot of those buckets is read
(partition-pruned), unioned with the batch, compacted latest-wins,
and the rewritten bucket directories are swapped in; every other
bucket's files are left byte-for-byte untouched.  Per-batch cost is
therefore O(batch + store/B · touched_buckets), not O(store): at
100 TB of accumulated attach state with B sized so a bucket fits an
executor (e.g. B = store_bytes / 256 MB), a batch touching k distinct
key-buckets rewrites only those k · 256 MB.  On a real cluster this
is Delta ``MERGE`` (same semantics, transactional, file-level skip);
parquet-dir-swap keeps the container dependency-free while preserving
the incremental shape.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.enrich import latest_per_key

_BUCKET = "_bucket"


class KeyedUpsertStore:
    """Latest-wins upsert store over hash-bucketed parquet
    (Delta-MERGE semantics, touched-buckets-only rewrite)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_col: str,
        order_col: str,
        n_buckets: int = 16,
    ):
        self.spark = spark
        self.path = path
        self.key_col = key_col
        self.order_col = order_col
        self.n_buckets = n_buckets

    def _bucket_expr(self):
        # xxhash64 is deterministic across sessions/executors (fixed
        # seed 42), so a key's bucket never moves between batches.
        # Null keys (xxhash64 -> null) pin to bucket 0 so they never
        # create a hive default-partition directory.
        return F.coalesce(
            F.pmod(F.xxhash64(F.col(self.key_col)), F.lit(self.n_buckets)),
            F.lit(0),
        )

    def exists(self) -> bool:
        return os.path.exists(os.path.join(self.path, "_SUCCESS"))

    def _raw(self) -> DataFrame | None:
        """Snapshot including the _bucket partition column.

        Stores written by the earlier flat (pre-bucketing) layout —
        part files at the store root, no ``_bucket=N`` directories —
        are read without the partition column; ``_bucket`` is derived
        on the fly so the first upsert migrates them: every legacy
        key's bucket counts as touched and the root part files are
        removed after the bucketed rewrite lands."""
        if not self.exists():
            return None
        legacy = self._legacy_root_files()
        bucket_dirs = glob.glob(os.path.join(self.path, f"{_BUCKET}=*"))
        if legacy and bucket_dirs:
            # Crash window between the migration's bucket-dir renames
            # and the legacy-file removal leaves BOTH layouts on disk;
            # partition discovery over the mixed tree fails, so read
            # each layout from its explicit file list and self-heal:
            # latest-wins collapses the stale flat rows (they are the
            # same or older versions of keys already in buckets), and
            # the next upsert's migration pass removes them for good.
            flat = self.spark.read.parquet(*legacy).withColumn(
                _BUCKET, self._bucket_expr()
            )
            part = self.spark.read.option("basePath", self.path).parquet(
                *bucket_dirs
            )
            return latest_per_key(
                part.unionByName(flat), [self.key_col], [self.order_col]
            )
        raw = self.spark.read.option("basePath", self.path).parquet(self.path)
        if _BUCKET not in raw.columns:  # legacy flat layout
            raw = raw.withColumn(_BUCKET, self._bucket_expr())
        return raw

    def _legacy_root_files(self) -> list[str]:
        return glob.glob(os.path.join(self.path, "part-*"))

    def snapshot(self) -> DataFrame | None:
        raw = self._raw()
        return raw.drop(_BUCKET) if raw is not None else None

    def upsert(self, batch: DataFrame) -> None:
        """Merge a batch: latest row per key wins across (old, new).

        Only bucket directories containing a batch key are rewritten;
        all other buckets are untouched on disk.
        """
        newb = batch.withColumn(_BUCKET, self._bucket_expr())
        cur = self._raw()
        legacy = self._legacy_root_files() if cur is not None else []
        if cur is not None and legacy:
            # One-time migration off the flat layout: every legacy
            # row must land in a bucket directory, so this batch
            # rewrites every occupied bucket (subsequent batches are
            # touched-only again).
            newb = cur.unionByName(newb, allowMissingColumns=True)
            touched = [r[0] for r in newb.select(_BUCKET).distinct().collect()]
        else:
            # Tiny driver-side list (<= n_buckets ints) — this is what
            # bounds the rewrite to touched buckets.
            touched = [r[0] for r in newb.select(_BUCKET).distinct().collect()]
            if cur is not None:
                cur = cur.where(F.col(_BUCKET).isin(touched))  # pruned
                newb = cur.unionByName(newb, allowMissingColumns=True)
        merged = latest_per_key(newb, [self.key_col], [self.order_col])
        # Stage the rewritten buckets, then swap each directory in —
        # never read-and-overwrite the same files in one job.
        tmp = self.path + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        merged.write.partitionBy(_BUCKET).mode("overwrite").parquet(tmp)
        os.makedirs(self.path, exist_ok=True)
        for b in touched:
            src = os.path.join(tmp, f"{_BUCKET}={b}")
            dst = os.path.join(self.path, f"{_BUCKET}={b}")
            if os.path.exists(dst):
                shutil.rmtree(dst)
            if os.path.exists(src):
                os.rename(src, dst)
        shutil.rmtree(tmp)
        for f in legacy:  # flat-layout files now folded into buckets
            os.remove(f)
        # Commit marker (idempotent).
        with open(os.path.join(self.path, "_SUCCESS"), "w"):
            pass

    def join(self, facts: DataFrame, fact_key: str, how: str = "inner") -> DataFrame:
        """Enrich facts against the current snapshot (inner = reference
        drop-unmatched semantics).  Dim columns that collide with fact
        columns (topic/ts/...) are dropped from the dim side — the
        fact stream's values win, matching the reference's projection
        right after the join (TrafficStreamProcessor.scala:54-56)."""
        dim = self.snapshot()
        if dim is None:
            return facts.limit(0) if how == "inner" else facts
        overlap = (set(facts.columns) & set(dim.columns)) - {self.key_col}
        dim = dim.drop(*overlap)
        joined = facts.join(dim, facts[fact_key] == dim[self.key_col], how)
        return joined.drop(dim[self.key_col]) if fact_key == self.key_col else joined


def run_upsert_stream(
    attach_stream: DataFrame,
    store: KeyedUpsertStore,
    checkpoint: str,
    available_now: bool = True,
):
    """K1: drive the attach stream into the store via foreachBatch."""

    def sink(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        store.upsert(batch)

    writer = (
        attach_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
