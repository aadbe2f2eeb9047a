"""Slowly-changing-dimension (SCD type-2) interval builder.

Turns a keyed change log (one row per observation, e.g. the orders
feed the reference's Cassandra writer consumed —
``TrafficStreamProcessor.scala:42,53`` stores only latest-wins; this
is the historized generalization) into versioned validity intervals:
one row per (key, attribute-state run) with ``valid_from`` /
``valid_to`` / ``is_current``.  The standard warehouse primitive for
point-in-time joins ("what was the customer's status when the order
shipped?").

Physical shape: one hash shuffle on the key feeding two window
passes (change detection via lag, interval close via lead) — no
joins, no global sort.  Each key's history lives in one partition;
state per key is one row of lag/lead, so 100 TB of change log
shards by key like any windowed aggregate.  Runs of identical
attribute states are collapsed BEFORE the interval close, so the
output carries one row per state change, not per observation —
typically orders of magnitude smaller than the log.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_intervals(
    df: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    attr_cols: Sequence[str],
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """One validity interval per run of identical ``attr_cols`` values
    per key: (keys..., attrs..., valid_from, valid_to, is_current).

    ``valid_to`` is the next run's start (half-open intervals — a
    point-in-time lookup is ``valid_from <= t AND (valid_to IS NULL
    OR t < valid_to)``); NULL for the current run.  ``tiebreak_cols``
    must make (ts, tiebreaks) a total order per key for deterministic
    results when timestamps collide.
    """
    keys = [F.col(c) for c in key_cols]
    order = [F.col(ts_col), *[F.col(c) for c in tiebreak_cols]]
    w = Window.partitionBy(*keys).orderBy(*order)

    # change detection: a row starts a new run iff any attribute
    # differs from the previous observation (null-safe compare)
    changed = F.lit(False)
    for c in attr_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))
    first = F.lag(F.col(ts_col)).over(w).isNull()
    starts = df.withColumn("_new_run", first | changed).where("_new_run")

    # interval close over the collapsed run-start rows only
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        starts.withColumn("valid_to", F.lead(F.col(ts_col)).over(w2))
        .select(
            *key_cols,
            *attr_cols,
            F.col(ts_col).alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )
