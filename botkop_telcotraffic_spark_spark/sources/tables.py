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


# Tables whose downstream per-row work (interpreted HOF folds, UDFs,
# shingle/fingerprint math) is heavy enough that a scan narrower than
# the cluster is the bottleneck and worth one extra shuffle.  The
# relational tables stay as-is: their operators are whole-stage
# codegen where the scan-width shuffle costs more than it buys
# (measured at sf0.1), and dimension tables get broadcast anyway.
_WIDE_TABLES = {"documents", "embeddings"}


def _estimated_scan_partitions(spark: SparkSession, path: str) -> int:
    """File-size estimate of the scan's partition count (driver-side
    stat, no job).  Optimistic for huge single-row-group files, which
    don't exist in sanely-written warehouses."""
    max_bytes = int(
        str(spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728")).rstrip(
            "b"
        )
    )
    if os.path.isdir(path):
        sizes = [e.stat().st_size for e in os.scandir(path) if e.is_file()]
    else:
        sizes = [os.stat(path).st_size]
    return sum(max(1, s // max_bytes) for s in sizes) or 1


# Inferred parquet schema per table path: the warehouse fixtures are
# immutable for a process lifetime, and re-inferring the footer on
# every load_table call (1-3 per query build, thousands per bench or
# driver run) is pure repeated driver work (r13).  Keyed by absolute
# path; scratch/sink dirs never go through load_table.
_SCHEMA_CACHE: dict[str, object] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = os.path.join(sf_dir, f"{name}.parquet")
    cached = _SCHEMA_CACHE.get(path)
    reader = spark.read if cached is None else spark.read.schema(cached)
    df = reader.parquet(path)
    if cached is None:
        _SCHEMA_CACHE[path] = df.schema
    # TIMESTAMP(NANOS) parquet columns arrive as epoch-nanos longs
    # (see session.RUNTIME_CONFS); convert with integer division —
    # double division would lose precision at 1e18 nanos.  DuckDB
    # truncates nanos->micros the same way.
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    # Parallelism floor: a fact table served by fewer input splits
    # than the cluster has cores single-threads every scan-side
    # operator (UDFs, fingerprints, distance math).  Round-robin
    # repartition costs one small shuffle of the (pruned, filtered —
    # predicates push through Repartition) scan output and restores
    # full-width execution.  At production scale fact tables span
    # many splits, the estimate exceeds the core count, and this is
    # a no-op.
    if name in _WIDE_TABLES:
        parallelism = spark.sparkContext.defaultParallelism
        if _estimated_scan_partitions(spark, path) < parallelism:
            df = df.repartition(parallelism)
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so ``spark.sql`` queries can
    run against the same names the DuckDB oracle uses."""
    for n in TABLE_NAMES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
