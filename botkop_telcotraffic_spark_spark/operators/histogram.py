"""Equi-width histograms — the distribution-shape profiler that
complements the engine's equi-depth path (decile/quantile binning via
ntile, __spark_entry__.decile_bins_events) and the mergeable log₂
sketch (operators/sketch.py::loghist_build): fixed linear bin edges
derived from the observed per-group [min, max], the shape dashboards
and drift monitors want.

Physical shape: one tiny per-group (min, max) aggregate broadcast
back onto the facts (one row per group — never a fact-side shuffle),
then one groupBy on (group, bin) with map-side partial aggregation.
Two fact scans, zero fact shuffles beyond the final keyed aggregate;
at 100 TB both scans are embarrassingly parallel and the aggregate
shards on (group, bin).

Determinism: bin indices come from a single IEEE expression
``floor((v - lo) / ((hi - lo) / bins))`` evaluated identically by
Spark and the DuckDB oracle (correctly-rounded double ops), with the
``v = hi`` row clamped into the last bin.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def equi_width_hist(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    bins: int = 16,
) -> DataFrame:
    """Per-group equi-width histogram: one row per occupied bin —
    (keys..., bin, bin_lo, bin_hi, n).

    Bin edges span the group's own [min, max] (``bins`` equal
    widths); a degenerate group (min == max) lands entirely in bin 0.
    Empty bins emit no row (join against a spine if you need dense
    output — see timeseries.gap_fill_counts for the pattern).
    """
    keys = list(key_cols)
    v = F.col(value_col).cast("double")
    rng = df.where(v.isNotNull()).groupBy(*keys).agg(
        F.min(v).alias("_lo"), F.max(v).alias("_hi")
    )
    with_rng = df.where(v.isNotNull()).join(F.broadcast(rng), keys)
    width = (F.col("_hi") - F.col("_lo")) / F.lit(float(bins))
    raw_bin = F.floor((v - F.col("_lo")) / width)
    bin_ = (
        F.when(F.col("_hi") == F.col("_lo"), F.lit(0))
        .otherwise(F.least(raw_bin, F.lit(bins - 1)))
        .cast("long")
    )
    return (
        with_rng.withColumn("bin", bin_)
        .groupBy(*keys, "bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.min(F.col("_lo") + F.col("bin") * width), 6
            ).alias("bin_lo"),
            F.round(
                F.min(F.col("_lo") + (F.col("bin") + 1) * width), 6
            ).alias("bin_hi"),
        )
    )
