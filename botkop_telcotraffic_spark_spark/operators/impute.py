"""Group-wise null imputation — the data-prep step between profiling
(which counts the nulls) and modeling (which cannot eat them).

Strategy is per-GROUP, not global: a telco value distribution differs
per event type / cell / plan, and imputing a global constant drags
every group toward the pooled center.  Exact interpolating median is
the default (robust to the same skew that motivates MAD outliers);
``mean`` for symmetric data; ``approx`` swaps the median for the
percentile_approx sketch when group value lists outgrow memory (the
100 TB path, same trade as ``operators/iqr.py``).

Physical shape: one per-key aggregate (key-count rows), broadcast
back onto the fact — the fact table is never shuffled; output is
input-sized with two appended columns.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def impute_group_stat(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: str,
    strategy: str = "median",
    accuracy: int = 10000,
    out_col: str | None = None,
) -> DataFrame:
    """Fill NULLs in ``value_col`` with its group's statistic.

    Appends ``out_col`` (default ``<value_col>_filled``) and
    ``was_imputed``.  A group whose values are ALL null keeps null
    (nothing to impute from) with ``was_imputed`` still true — the
    caller decides whether such groups survive.
    """
    v = F.col(value_col)
    if strategy == "median":
        agg = F.percentile(v, F.lit(0.5))
    elif strategy == "median_approx":
        agg = F.percentile_approx(v, F.lit(0.5), accuracy)
    elif strategy == "mean":
        agg = F.avg(v)
    else:
        raise ValueError(f"unknown strategy {strategy!r}")
    out = out_col or f"{value_col}_filled"
    stats = df.groupBy(*key_cols).agg(agg.alias("_fill")).select(
        *[F.col(k).alias(f"_sk_{k}") for k in key_cols], "_fill"
    )
    # Left join on null-safe equality: rows whose key IS NULL must still
    # match their (NULL-key) stats group — an inner equi-join would drop
    # them and break the "output is input-sized" contract.  Keys are
    # renamed so the condition never resolves both sides to one attr.
    cond = None
    for k in key_cols:
        c = F.col(k).eqNullSafe(F.col(f"_sk_{k}"))
        cond = c if cond is None else cond & c
    return (
        df.join(F.broadcast(stats), cond, "left")
        .drop(*[f"_sk_{k}" for k in key_cols])
        .withColumn(out, F.coalesce(v, F.col("_fill")))
        .withColumn("was_imputed", v.isNull())
        .drop("_fill")
    )
