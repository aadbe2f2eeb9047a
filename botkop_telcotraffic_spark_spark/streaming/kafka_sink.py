"""Kafka egress (K2/K4 in SURVEY.md §2.2).

The reference hand-rolls a producer per partition per batch
(``KafkaStreamPublisher.scala:9-25``, at-least-once, ``acks=all``).
Structured Streaming's Kafka sink gives the same at-least-once
contract with pooled producers — the whole operator reduces to a
``to_json`` projection plus ``writeStream.format("kafka")``.

``to_kafka_payload`` is the pure (and unit-testable) half: it turns
any DataFrame into the two-column (key, value) shape the sink needs,
serializing all non-key columns as one JSON object — the counterpart
of the reference's hand-built JSON emission (``package.scala:47-57``,
``MetricStats.scala:16-23``).

Scale notes: the sink parallelism is the upstream partitioning —
repartition before the sink only to cap producer connections; output
ordering is per-partition, as in the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def to_kafka_payload(df: DataFrame, key_cols: list[str] | None = None) -> DataFrame:
    """(key: string|null, value: json-string) projection of ``df``.

    ``key_cols`` (optional) are concat'd with '/' into the message key
    — choose the partition-affinity key (e.g. celltower id) here.
    """
    payload_cols = [c for c in df.columns if not key_cols or c not in key_cols]
    value = F.to_json(F.struct(*[F.col(c) for c in payload_cols]))
    if key_cols:
        key = F.concat_ws("/", *[F.col(c).cast("string") for c in key_cols])
    else:
        key = F.lit(None).cast("string")
    return df.select(key.alias("key"), value.alias("value"))


def kafka_json_sink(
    df: DataFrame,
    topic: str,
    bootstrap_servers: str,
    checkpoint: str,
    key_cols: list[str] | None = None,
    trigger_interval: str = "1 second",
    available_now: bool = False,
) -> StreamingQuery:
    """Publish a streaming DataFrame to a Kafka topic as JSON
    (at-least-once; micro-batch cadence mirrors the reference's 1 s
    batch interval, application.conf:4).  ``available_now=True`` runs
    a bounded drain instead (replay/backfill/integration-test shape).
    """
    payload = to_kafka_payload(df, key_cols)
    writer = (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        return writer.trigger(availableNow=True).start()
    return writer.trigger(processingTime=trigger_interval).start()
