"""Parquet table sources for the synthetic test warehouse.

The reference ingests JSON from Kafka (sources S1-S4 in SURVEY.md;
``/root/reference/src/main/scala/traffic/TrafficStreamProcessor.scala:35-49``);
the batch analog here is columnar parquet scans, which give Catalyst
predicate pushdown + column pruning for free.  Streaming ingest lives
in ``streaming/`` and ``sources/json_stream.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = [
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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # TIMESTAMP(NANOS) parquet columns arrive as epoch-nanos longs
    # (see session.RUNTIME_CONFS); convert with integer division —
    # double division would lose precision at 1e18 nanos.  DuckDB
    # truncates nanos->micros the same way.
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` queries can
    run against the same names the DuckDB oracle uses."""
    for n in TABLE_NAMES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
