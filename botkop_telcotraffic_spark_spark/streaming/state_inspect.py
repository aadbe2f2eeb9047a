"""Streaming state observability: read a running/stopped query's
state store as DataFrames (Spark 4 state data source).

The reference's only observability was a debug print sink
(`AppUtil.scala:8-10`); a production engine needs to answer "what is
this query remembering?" — key counts per operator, hot keys, state
age — without stopping the query.  The state data source reads the
checkpoint directly (batch read, no interference with the stream's
own state store instances).

Scale: state files are partitioned exactly like the stream (one store
per shuffle partition), so these reads parallelize and prune the same
way; reading CPU cost is on the inspector, not the pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """One row per stateful operator in the checkpoint: operator
    name/id, store name, partition count, batch id range."""
    return spark.read.format("state-metadata").load(checkpoint)


def state_rows(
    spark: SparkSession,
    checkpoint: str,
    batch_id: int | None = None,
    operator_id: int = 0,
) -> DataFrame:
    """The raw (key, value) state rows of one stateful operator."""
    r = spark.read.format("statestore").option("operatorId", operator_id)
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    return r.load(checkpoint)


def state_summary(
    spark: SparkSession, checkpoint: str, operator_id: int = 0
) -> DataFrame:
    """Keys per shuffle partition for one operator — the skew view:
    a hot partition here is a hot key group in the stream."""
    return (
        state_rows(spark, checkpoint, operator_id=operator_id)
        .groupBy("partition_id")
        .agg(F.count(F.lit(1)).alias("n_keys"))
        .orderBy("partition_id")
    )
