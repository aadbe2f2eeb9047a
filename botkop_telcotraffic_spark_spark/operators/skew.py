"""Skew-mitigated joins (salting).

A shuffled equi-join puts every row of one key into one task; a hot
key (the reference's analogue: one mega-celltower) turns the join
into a single straggler.  AQE's skew-join splits oversized partitions
at runtime and is the first line of defense (on in session.py); this
operator is the explicit fallback for keys so hot that even one key
exceeds a task — classic salting:

  * skewed side: key -> (key, salt) with a deterministic salt derived
    by hashing stable row columns into [0, n_salts);
  * small side: replicated n_salts times with every salt value;
  * equi-join on (key, salt) — the hot key now spreads over n_salts
    tasks.  Row multiplication is only on the SMALL side (n_salts x).

Result is row-identical to the plain join (salt is an internal
column, dropped on output).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def heavy_hitters(
    df: DataFrame,
    key_cols: Sequence[str],
    k: int = 20,
    weight_col: str | None = None,
) -> DataFrame:
    """Exact top-``k`` heavy-hitter diagnostic over ``key_cols``: the
    k keys with the largest count (or sum of ``weight_col``), each
    with its share of the total and the cumulative share — the
    pre-join skew probe that decides whether a key needs
    :func:`salted_join` / bucketing before it melts a shuffle.  (The
    streaming/mergeable analogue is the CMS sketch in
    ``operators/sketch.py``; this is the exact batch form.)

    Physical shape: one keyed aggregate (map-side partial combine —
    the per-task state is bounded by distinct keys per task), then a
    global top-k sort-limit (TakeOrderedAndProject: per-partition
    heaps of k rows, k rows per task to the driver-side merge — NOT a
    global sort).  The grand total rides along via a window over the
    aggregated keyspace, partial-agg'd the same way.  No fact-table
    rescan, no broadcast of anything unbounded; scale cost is one
    shuffle of (distinct keys) rows.

    Cumulative share is computed over the k-row result only — a
    k-row single task, deliberately.
    """
    from pyspark.sql import Window

    keys = [F.col(c) for c in key_cols]
    wexpr = (
        F.sum(F.col(weight_col)) if weight_col else F.count(F.lit(1))
    ).alias("weight")
    counts = df.groupBy(*keys).agg(wexpr)
    total = counts.agg(
        F.sum("weight").cast("double").alias("_total")
    )
    order = [F.col("weight").desc(), *[F.col(c).asc() for c in key_cols]]
    topk = counts.orderBy(*order).limit(k)
    w_cum = (
        Window.orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        topk.crossJoin(F.broadcast(total))
        .withColumn("share", F.col("weight") / F.col("_total"))
        .withColumn(
            "cum_share", F.sum("weight").over(w_cum) / F.col("_total")
        )
        .select(
            *key_cols,
            (
                F.round("weight", 6).alias("weight")
                if weight_col
                else F.col("weight").cast("long").alias("weight")
            ),
            F.round("share", 6).alias("share"),
            F.round("cum_share", 6).alias("cum_share"),
        )
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 16,
    salt_cols: Sequence[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed fact side with a (replicable) small side on
    ``on`` keys, spreading each key over ``n_salts`` shuffle
    partitions.

    ``salt_cols``: columns whose hash assigns the salt (default: all
    of the skewed side's non-key columns — deterministic, no rand()).
    ``how``: inner or left (the skewed side must be the left/preserved
    side; right/full would need the salt on the other side).
    """
    assert how in ("inner", "left"), "salted_join supports inner/left"
    salt_src = list(salt_cols or [c for c in skewed.columns if c not in on])
    assert salt_src, "need at least one non-key column to derive the salt"
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in salt_src]), F.lit(n_salts))
    left = skewed.withColumn("_salt", salt.cast("int"))
    right = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = left.join(right, [*on, "_salt"], how)
    return out.drop("_salt")
