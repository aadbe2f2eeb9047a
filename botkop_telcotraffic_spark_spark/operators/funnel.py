"""Ordered-funnel and cohort-retention analytics over event streams.

Classic event-analytics shapes the reference's fixed DAG cannot
express but a telco/product analytics engine needs.  Both are pure
DataFrame compositions — no window-spanning state, no UDFs.

Scale shape (funnel): one groupBy per stage, each keyed on the
entity id, joined entity-to-entity (same key → co-partitioned under
AQE).  Stage k's input is the survivors of stage k-1 — cardinality
is monotonically non-increasing, so later stages get cheaper.
Counts are integers (bit-exact across engines).

Scale shape (retention): two aggregates over the fact (first-seen
per entity, distinct (entity, period) activity) joined on the
entity key, then a small (cohort, offset) count — the output is
O(periods²), independent of fact size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    entity: str,
    ts_col: str,
    type_col: str,
    stages: Sequence[str],
) -> DataFrame:
    """Strictly-ordered funnel: for each entity, stage k counts only
    if its event happens at-or-after the entity's stage k-1 time.

    Returns one row per stage: (stage_idx, stage, n_entities),
    n_entities = entities whose first qualifying stage-k event
    exists.
    """
    reached = None  # DataFrame(entity, _t) of stage survivors
    out_rows = []
    for i, stage in enumerate(stages):
        ev = events.where(F.col(type_col) == stage).select(
            F.col(entity).alias("_e"), F.col(ts_col).alias("_ts")
        )
        if reached is None:
            cur = ev.groupBy("_e").agg(F.min("_ts").alias("_t"))
        else:
            cur = (
                ev.join(reached, ev["_e"] == reached["_e"])
                .where(F.col("_ts") >= F.col("_t"))
                .select(ev["_e"].alias("_e2"), "_ts")
                .groupBy("_e2")
                .agg(F.min("_ts").alias("_t"))
                .withColumnRenamed("_e2", "_e")
            )
        reached = cur
        out_rows.append(
            cur.agg(
                F.lit(i).alias("stage_idx"),
                F.lit(stage).alias("stage"),
                F.count(F.lit(1)).alias("n_entities"),
            )
        )
    result = out_rows[0]
    for r in out_rows[1:]:
        result = result.unionByName(r)
    return result


def cohort_retention(
    events: DataFrame,
    entity: str,
    ts_col: str,
    period: str = "week",
    max_offset: int = 4,
) -> DataFrame:
    """(cohort_start, offset, n_active): of the entities first seen
    in `cohort_start`'s period, how many were active `offset`
    periods later (offset 0 = the cohort period itself)."""
    days = {"week": 7, "day": 1}[period]
    first = events.groupBy(F.col(entity).alias("_e")).agg(
        F.date_trunc(period, F.min(ts_col)).alias("cohort_start")
    )
    active = events.select(
        F.col(entity).alias("_e"), F.date_trunc(period, F.col(ts_col)).alias("_p")
    ).distinct()
    joined = active.join(first, "_e").withColumn(
        "offset",
        (F.datediff(F.col("_p"), F.col("cohort_start")) / days).cast("int"),
    )
    return (
        joined.where(F.col("offset") <= max_offset)
        .groupBy("cohort_start", "offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
