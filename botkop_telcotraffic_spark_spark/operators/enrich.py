"""Latest-wins keyed enrichment join (operator J1 in SURVEY.md §2.4).

The reference maintains a Cassandra table keyed on ``bearer_id`` where
the latest attach upsert wins, then point-joins each celltower event
against it (``TrafficStreamProcessor.scala:42,52-56``).  The batch
re-expression: reduce the dimension stream to its latest row per key
(argmax on event time with a deterministic tiebreak), then inner
equi-join the fact stream — unmatched facts are dropped exactly like
the reference's inner ``joinWithCassandraTable``.

Scale notes: the latest-per-key reduction is ``max_by`` (one partial
+ final agg, no sort, no window-function shuffle-sort); the join is a
plain equi-join Catalyst can broadcast (dim small) or sort-merge with
AQE skew handling (dim large).  The streaming version keeps the dim
as a compacted keyed store updated in foreachBatch — see
streaming/upsert_join.py.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_per_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
) -> DataFrame:
    """One row per key: the row with the max (order_cols...) tuple.

    Implemented with ``max_by`` over a struct so ties break
    deterministically on the later order columns.
    """
    ordk = F.struct(*[F.col(c) for c in order_cols])
    payload = F.struct(*[F.col(c) for c in df.columns])
    latest = df.groupBy(*key_cols).agg(F.max_by(payload, ordk).alias("_r"))
    return latest.select("_r.*")


def enrich_latest(
    facts: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    dim_order: Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """J1: join each fact to the latest dim row for its key."""
    d = latest_per_key(dim, [dim_key], dim_order)
    return facts.join(d, facts[fact_key] == d[dim_key], how)
