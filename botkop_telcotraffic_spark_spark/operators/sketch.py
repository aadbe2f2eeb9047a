"""Mergeable cardinality sketches (Apache DataSketches HLL via Spark
3.5+ builtins) — the 100 TB pattern for distinct counts.

``approx_count_distinct`` gives one number per group per query;
**sketches** are state you can store: build per-partition (per day,
per shard) once, then answer any coarser rollup by unioning the
binary sketches — no rescan of the raw data.  That turns "distinct
users last quarter" from a 100 TB scan into a union of ~90 daily
sketches of a few KB each.

Key invariant (unit-tested): union-of-partial-sketches estimates ==
one-shot sketch estimate, exactly — the sketch is a deterministic
function of the value set, so pre-aggregation is lossless.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LG_K = 12  # 4096 buckets, ~1.6% relative error — datasketches default


def build_sketches(
    df: DataFrame, keys: list[str], value_col: str, lg_k: int = LG_K
) -> DataFrame:
    """Per-group binary HLL sketch of distinct ``value_col`` values —
    the materializable partial (store it partitioned by the keys)."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch"),
        F.count(F.lit(1)).alias("rows"),
    )


def rollup_sketches(
    sketches: DataFrame, keys: list[str], lg_k: int = LG_K
) -> DataFrame:
    """Union finer-grained sketches up to ``keys`` and estimate:
    (keys..., approx_distinct, rows).  Reads only the sketch table."""
    return sketches.groupBy(*keys).agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col("sketch"), F.lit(True))
        ).alias("approx_distinct"),
        F.sum("rows").alias("rows"),
    )
