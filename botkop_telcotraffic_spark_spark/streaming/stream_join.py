"""J1 Option B: watermarked stream-stream enrichment join
(SURVEY.md §2.4 J1, §7 hard-part #1).

The reference's enrichment (``TrafficStreamProcessor.scala:52-56``)
matches each celltower event against the latest attach *ever* seen
for its bearer — unbounded state via Cassandra.  ``upsert_join`` is
the semantics-faithful reproduction; THIS module is the pure
Structured-Streaming alternative: a stream-stream inner equi-join on
``bearerId`` with watermarks on both sides, which bounds state (the
100 TB-friendly trade) at the cost of dropping pairings that arrive
farther apart than the watermark delay.  Both are first-class; the
delta is documented here and in SURVEY.md §7.

State sizing: each side keeps only rows younger than its watermark,
so state ~ rate x delay, independent of stream lifetime.  The join
condition adds a time-range predicate (attach within ``max_lag``
BEFORE the celltower event) so Spark can evict attach rows as the
celltower watermark advances — without it, inner-join state on the
attach side never ages out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def watermarked_enrich_join(
    attaches: DataFrame,
    celltowers: DataFrame,
    key_col: str = "bearerId",
    attach_ts_col: str = "ts",
    cell_ts_col: str = "ts",
    delay: str = "30 seconds",
    max_lag: str = "1 hour",
) -> DataFrame:
    """Inner stream-stream join: each celltower event pairs with
    attaches for the same bearer whose timestamp lies in
    ``[cell_ts - max_lag, cell_ts]``.

    Output columns: every celltower column plus the attach's
    ``subscriber`` struct and ``attach_ts``.  Late rows beyond
    ``delay`` are dropped by the watermark on either side.
    """
    a = attaches.select(
        F.col(key_col).alias("_a_key"),
        F.col(attach_ts_col).alias("attach_ts"),
        "subscriber",
    ).withWatermark("attach_ts", delay)
    c = celltowers.withWatermark(cell_ts_col, delay)
    cond = (
        (c[key_col] == a["_a_key"])
        & (a["attach_ts"] <= c[cell_ts_col])
        & (a["attach_ts"] >= c[cell_ts_col] - F.expr(f"INTERVAL {max_lag}"))
    )
    return c.join(a, cond, "inner").drop("_a_key")
