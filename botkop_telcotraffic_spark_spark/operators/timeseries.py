"""Time-series densification: gap filling over regular buckets.

The reference's windowed pipelines silently skip empty windows (a
DStream batch with no events for a key emits nothing —
``MetricStatsProducer.scala:16-36`` only sees arriving records).
Serving layers usually want explicit zero/null rows for the gaps;
this operator synthesizes them declaratively.

Scale shape: the bucket spine is generated per key from that key's
own [min, max] range with ``sequence()`` + ``explode`` — scan-side,
no driver loop, no global calendar table.  One shuffle for the
per-(key, bucket) aggregate and one keyed join of spine↔aggregate
(both sides hash on the same key, AQE picks the strategy).  Spine
size is bounded by span/step per key; a key with a pathological
span surfaces as data (cap with an explicit horizon filter), never
as driver memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_counts(
    df: DataFrame,
    key: str,
    ts_col: str,
    step: str = "1 hour",
    value_col: str | None = None,
) -> DataFrame:
    """Per-key, per-bucket event counts (and optional value sums)
    with explicit zero rows for empty buckets between each key's
    first and last event.

    Returns (key, bucket_start, n_events[, sum_value]).
    """
    bucket = F.date_trunc("hour", F.col(ts_col)) if step == "1 hour" else F.window(
        F.col(ts_col), step
    ).start
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    per_bucket = (
        df.select(F.col(key), bucket.alias("bucket_start"), *( [F.col(value_col)] if value_col else [] ))
        .groupBy(key, "bucket_start")
        .agg(*aggs)
    )
    spine = (
        per_bucket.groupBy(key)
        .agg(
            F.min("bucket_start").alias("_lo"),
            F.max("bucket_start").alias("_hi"),
        )
        .select(
            key,
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.expr(f"INTERVAL {step}"))
            ).alias("bucket_start"),
        )
    )
    filled = spine.join(per_bucket, [key, "bucket_start"], "left_outer").select(
        key,
        "bucket_start",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        *(
            [F.coalesce("sum_value", F.lit(0.0)).alias("sum_value")]
            if value_col
            else []
        ),
    )
    return filled


def resample_locf(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    round_digits: int = 4,
) -> DataFrame:
    """Regular resample with last-observation-carried-forward: per-key
    bucket averages of ``value_col``, densified over the key's own
    [first, last] range, with empty buckets inheriting the most recent
    observed bucket's (rounded) average.

    Returns (key, bucket_start, n_events, locf_value).

    The per-bucket average is rounded BEFORE the forward fill so the
    carried value is bit-stable regardless of aggregation order.
    Scale shape matches ``gap_fill_counts`` (scan-side spine, one agg
    shuffle, one keyed join); the fill itself is one window pass
    partitioned by the key — ``last(ignorenulls)`` over an
    already-densified, per-key-bounded frame."""
    bucket = (
        F.date_trunc("hour", F.col(ts_col))
        if step == "1 hour"
        else F.window(F.col(ts_col), step).start
    )
    per = (
        df.select(F.col(key), bucket.alias("bucket_start"), F.col(value_col))
        .groupBy(key, "bucket_start")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg(value_col), round_digits).alias("_avg_v"),
        )
    )
    spine = (
        per.groupBy(key)
        .agg(
            F.min("bucket_start").alias("_lo"),
            F.max("bucket_start").alias("_hi"),
        )
        .select(
            key,
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.expr(f"INTERVAL {step}"))
            ).alias("bucket_start"),
        )
    )
    w = (
        Window.partitionBy(key)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(per, [key, "bucket_start"], "left_outer")
        .select(
            key,
            "bucket_start",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("_avg_v", ignorenulls=True).over(w).alias("locf_value"),
        )
    )
