"""Snapshot diff — keyed change-data-capture between two versions of
a table (corpus build N vs N+1, yesterday's dim vs today's): which
rows were added, removed, or changed, and which columns changed.

The pipeline use: an incremental corpus rebuild wants to re-embed /
re-dedup ONLY the changed slice; a training-data audit wants the
delta between two dataset versions as a first-class table.  The SCD2
builder (`operators/scd.py`) consumes exactly this shape.

Physical shape: ONE full-outer equi-join on the key columns (both
sides shuffle on the same key — co-partitioned, AQE-handled), then
pure column math for the verdict.  Column comparison is null-safe
(``eqNullSafe``: NULL→value and value→NULL are changes, NULL→NULL is
not).  Unchanged rows are dropped IN the join's output filter, so
the result is delta-sized, not table-sized — at 100 TB the output is
proportional to churn, which is the quantity a CDC consumer pays
for.  No row-hash precomputation: hashing would touch the same bytes
the direct comparison touches, and the direct form keeps the changed
-column attribution free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_changes(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    version_col: str,
    op_col: str = "op",
    delete_op: str = "D",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """MERGE-INTO / CDC-apply: fold a changelog into a base snapshot
    and return the next snapshot — the write-side complement of
    `snapshot_diff` (which extracts a changelog this operator can
    replay).

    ``base`` holds one row per key with a ``version_col`` (its rows
    are implicit upserts); ``changes`` has the same columns plus
    ``op_col`` ∈ {upsert, ``delete_op``}.  Latest version wins per
    key; at equal ``(version, *tiebreak_cols)`` the changelog row
    beats the base row (a re-delivered change must supersede the
    snapshot it was derived from — at-least-once replay safety).  A
    winning ``delete_op`` removes the key from the output.

    Physical shape: union (narrow) + ONE shuffle on ``key_cols`` for
    a per-key ``row_number`` — no global window, no driver state.
    The per-key partition is changelog-depth-sized, so skew follows
    update-hotness, not table size; this is the same plan Delta/Hudi
    execute for MERGE after their file-pruning step.  Determinism:
    pass ``tiebreak_cols`` that make ``(version, *tiebreaks)`` unique
    per key and the winner is total-ordered on every engine.
    """
    from pyspark.sql import Window

    out_cols = list(base.columns)
    b = base.withColumn(op_col, F.lit("U")).withColumn(
        "_src", F.lit(0)
    )
    c = changes.select(*out_cols, op_col).withColumn("_src", F.lit(1))
    u = b.select(*out_cols, op_col, "_src").unionByName(c)
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(version_col).desc(),
        *[F.col(t).desc() for t in tiebreak_cols],
        F.col("_src").desc(),
    )
    return (
        u.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") == 1) & (F.col(op_col) != delete_op))
        .select(*out_cols)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Delta between two snapshots keyed by ``key_cols``.

    Returns one row per added / removed / changed key:
    ``(*key_cols, status, changed_cols)`` where ``status`` ∈
    {'added', 'removed', 'changed'} and ``changed_cols`` is the
    comma-joined sorted list of differing columns ('' for
    added/removed).  Keys identical in every compare column are
    omitted (delta-sized output).
    """
    if compare_cols is None:
        compare_cols = [c for c in old.columns if c not in set(key_cols)]
    if len(set(compare_cols)) != len(list(compare_cols)):
        raise ValueError(f"duplicate names in compare_cols: {list(compare_cols)}")
    keys = list(key_cols)
    o = old.select(
        *[F.col(c).alias(f"k_{c}") for c in keys],
        *[F.col(c).alias(f"o_{c}") for c in compare_cols],
        F.lit(True).alias("_in_old"),
    )
    n = new.select(
        *[F.col(c).alias(f"n_{c}") for c in keys],
        *[F.col(c).alias(f"n_{c}_v") for c in compare_cols],
        F.lit(True).alias("_in_new"),
    )
    cond = None
    for c in keys:
        eq = F.col(f"k_{c}") == F.col(f"n_{c}")
        cond = eq if cond is None else cond & eq
    j = o.join(n, cond, "full_outer")

    diffs = [
        ~F.col(f"o_{c}").eqNullSafe(F.col(f"n_{c}_v")) for c in compare_cols
    ]
    any_diff = diffs[0]
    for d in diffs[1:]:
        any_diff = any_diff | d
    status = (
        F.when(F.col("_in_old").isNull(), F.lit("added"))
        .when(F.col("_in_new").isNull(), F.lit("removed"))
        .when(any_diff, F.lit("changed"))
    )
    changed = F.when(
        status == "changed",
        F.concat_ws(
            ",",
            *[
                F.when(d, F.lit(c))
                for c, d in sorted(zip(compare_cols, diffs), key=lambda t: t[0])
            ],
        ),
    ).otherwise(F.lit(""))
    return (
        j.withColumn("status", status)
        .where(F.col("status").isNotNull())
        .select(
            *[
                F.coalesce(F.col(f"k_{c}"), F.col(f"n_{c}")).alias(c)
                for c in keys
            ],
            "status",
            changed.alias("changed_cols"),
        )
    )
