"""File-format ingress/egress beyond parquet (CSV / JSON lines).

Parquet is the warehouse format (sources/tables.py); these wrappers
cover interchange with external producers — with the defaults that
make round-trips LOSSLESS, which neither format gives you out of the
box:

  * timestamps: Spark's CSV default writes millisecond precision —
    micros silently truncate.  Both directions here pin a
    microsecond format.
  * CSV needs an explicit schema on read (inference is both a
    correctness and a performance hazard — it scans the data twice).
  * JSON lines likewise read with an explicit schema; malformed rows
    follow the engine's decode-and-drop convention (PERMISSIVE +
    drop, matching streaming/json_stream.py).

Scale notes: both formats scan-parallelize by file split like
parquet, but carry no column pruning or predicate pushdown — convert
to parquet at the ingest boundary; don't run analytics on them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TS_FORMAT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def write_csv(df: DataFrame, path: str) -> None:
    (
        df.write.mode("overwrite")
        .option("header", "true")
        .option("timestampFormat", TS_FORMAT)
        .csv(path)
    )


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .option("timestampFormat", TS_FORMAT)
        .csv(path)
    )


def write_orc(df: DataFrame, path: str) -> None:
    """ORC egress — columnar like parquet (typed, lossless, split-
    table), for interchange with Hive/Trino warehouses."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("timestampFormat", TS_FORMAT).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    out = (
        spark.read.schema(schema)
        .option("timestampFormat", TS_FORMAT)
        .option("mode", "PERMISSIVE")
        .json(path)
    )
    return out


def write_partitioned_parquet(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Hive-style partitioned parquet layout (one directory level per
    partition column).  Queries filtering on a partition column read
    ONLY matching directories — partition pruning happens at plan
    time, before any IO (see tests/test_plans.py for the proof).

    Choose low-cardinality columns (date, type, region): at 100 TB a
    high-cardinality partition column produces millions of tiny files
    and kills the listing phase.
    """
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)
