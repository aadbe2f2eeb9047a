"""Bucketed tables for shuffle-free co-located joins.

At 100 TB the dominant cost of a large equi-join is the shuffle.
Bucketing pre-partitions both tables by the join key at write time
(`bucketBy` + `saveAsTable`), so a later sort-merge join reads
bucket-aligned splits and Catalyst plans NO Exchange on either side —
the join cost becomes a local merge per bucket.  The tested guarantee
is in tests/test_plans.py: a bucket-aligned join plan contains no
shuffle above the scans.

Rules of thumb encoded here:
  * bucket count should be stable across tables that join together
    (mismatched counts re-shuffle one side, Spark 3.1+ can coalesce
    neighbor counts but same-count is the safe contract);
  * sortBy the join key inside buckets so the merge needs no sort;
  * bucketing pays off when a table is joined repeatedly on the same
    key — one shuffle at write time amortized over every later join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and in-bucket sorted) managed
    table keyed for co-located joins on ``bucket_cols``."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort:
        writer = writer.sortBy(*bucket_cols)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
