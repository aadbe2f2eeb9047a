"""As-of (time-travel) join — an operator Spark lacks natively
(SURVEY.md §2.4 lists it absent from both Spark and the reference;
mandated by the extension surface).

Semantics: for each left row, attach the single right row with the
greatest ``right_ts <= left_ts`` for the same key (inner: left rows
with no prior right row drop).  DuckDB expresses this natively with
``ASOF JOIN`` — the oracle uses exactly that.

Implementation is the union-window pattern, which is how you want it
at scale: tag both sides, one shuffle on the key, one ordered window
pass with ``last(ignorenulls)`` — no range-explosion, no per-row
probing.  State per partition is O(1) (the running last right
payload), so it survives arbitrarily large inputs; skewed keys are
handled by AQE like any single-key window (salt if one key dominates).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    tolerance: str | None = None,
) -> DataFrame:
    """Inner as-of join.  ``right_cols`` are the right-side payload
    columns to attach (prefixed ``asof_``).  Equal timestamps match
    (at-or-before).  ``tolerance`` (an interval literal like
    '10 minutes') optionally bounds how stale a match may be.
    """
    lcols = left.columns
    l_tagged = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in right_cols],
    )
    r_tagged = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    # right sorts before left at equal timestamps -> equality matches
    combined = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t"), F.col("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = combined.select(
        "*",
        F.max(F.when(F.col("_side") == 0, F.col("_t"))).over(w).alias("_rt"),
        *[
            F.last(F.col(f"_r_{c}"), ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_cols
        ],
    )
    out = filled.where((F.col("_side") == 1) & F.col("_rt").isNotNull())
    if tolerance is not None:
        out = out.where(
            F.col("_t") <= F.col("_rt") + F.expr(f"INTERVAL {tolerance}")
        )
    return out.select(
        *lcols,
        F.col("_rt").alias(f"asof_{right_ts}"),
        *[F.col(f"asof_{c}") for c in right_cols],
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str | None = None,
    right_key: str | None = None,
) -> DataFrame:
    """Interval/range join: pair each left row with every right row of
    the same key whose timestamp falls in
    ``[left_ts - lower, left_ts)`` (or ``(left_ts, left_ts + upper]``
    bounds when ``upper`` is given instead of a trailing window).

    Spark plans this as an equi-join on ``key`` with the range
    predicate as a residual filter — the shuffle is keyed, so each
    partition only compares within-key candidates (never a global
    band sweep).  At 100 TB the key join bounds the blow-up; a key
    whose interval density explodes is a data problem (salt or bucket
    the time axis).

    Left rows keep their identity; aggregate after joining (e.g.
    count matches per left row) rather than asking this operator to —
    composability over fused semantics.

    Name the right side's columns distinctly (``right_key`` etc.) so
    the joined output is unambiguous.
    """
    lo = F.expr(f"INTERVAL {lower}")
    lcol = left[left_ts]
    rcol = right[right_ts]
    keq = left[key] == right[right_key or key]
    cond = keq & (rcol >= lcol - lo) & (rcol < lcol)
    if upper is not None:
        up = F.expr(f"INTERVAL {upper}")
        cond = keq & (rcol > lcol) & (rcol <= lcol + up)
    return left.join(right, cond, "left_outer")
