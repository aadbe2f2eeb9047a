"""Deterministic Poisson bootstrap confidence intervals.

The scalable bootstrap (Efron resampling reformulated for one-pass
distributed execution, as popularized for MapReduce-era systems):
instead of drawing n rows with replacement per replicate — impossible
without a global shuffle per replicate — each row contributes to
replicate j with an independent Poisson(1) weight, which matches
multinomial resampling to O(1/n).  One narrow explode by n_boot, one
keyed aggregate, one tiny per-group percentile over n_boot replicate
means: the fact table is scanned ONCE regardless of replicate count.

Determinism discipline (shared with every sampler in
``operators/sampling.py``): the Poisson draw is NOT an RNG — u is the
rolling-hash fingerprint of (salt, replicate, row key) mapped to
(0, 1), pushed through the exact inverse-CDF threshold chain with
literal double constants, so every engine, partitioning, and re-run
produces identical weights and the DuckDB oracle reproduces the CI
bit-for-bit.

Scale shape at 100 TB: explode(n_boot) is narrow (no shuffle);
the (group, replicate) aggregate is ONE exchange with map-side
partials; group × n_boot is sketch-sized; the final exact percentile
sees n_boot values per group.  Skewed groups cost what any groupBy
costs — no global windows, no driver loops.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textfn import rolling_fingerprint

# Inverse-CDF thresholds for Poisson(1): c[k] = P(X <= k).  Embedded
# as repr'd literals in BOTH the column expression and the oracle SQL
# so the doubles are identical by construction.  Mass beyond w=8
# (~1.1e-8) collapses into w=8 — bias far below bootstrap noise.
POISSON1_CDF: tuple[float, ...] = tuple(
    sum(math.exp(-1.0) / math.factorial(i) for i in range(k + 1))
    for k in range(8)
)


def poisson1_weight(u: Column) -> Column:
    """Poisson(1) inverse-CDF: #thresholds at or below u."""
    w: Column = F.lit(0)
    for c in POISSON1_CDF:
        w = w + F.when(u >= F.lit(c), 1).otherwise(0)
    return w


def poisson1_weight_sql(u_sql: str) -> str:
    """The oracle twin of :func:`poisson1_weight` (DuckDB SQL)."""
    terms = " + ".join(
        f"(CASE WHEN {u_sql} >= {c!r} THEN 1 ELSE 0 END)"
        for c in POISSON1_CDF
    )
    return f"({terms})"


# Mixing constants: Mersenne prime 2^31-1 and the 32-bit golden-ratio
# increment; two quadratic steps x -> x² + c (mod p) decorrelate the
# per-replicate stream from the per-row hash.
MIX_P = 2_147_483_647
MIX_J = 2_654_435_761
MIX_C1 = 12_345
MIX_C2 = 6_789


def mix_u(h: Column, j: Column) -> Column:
    """Deterministic u in (0, 1) for (row-hash h, replicate j)."""
    x0 = (h + j * F.lit(MIX_J)) % F.lit(MIX_P)
    x1 = (x0 * x0 + F.lit(MIX_C1)) % F.lit(MIX_P)
    x2 = (x1 * x1 + F.lit(MIX_C2)) % F.lit(MIX_P)
    return (x2.cast("double") + F.lit(0.5)) / F.lit(float(MIX_P))


def mix_u_sql(h_sql: str, j_sql: str) -> str:
    """The oracle twin of :func:`mix_u` (DuckDB SQL)."""
    x0 = f"(({h_sql} + {j_sql} * {MIX_J}) % {MIX_P})"
    x1 = f"(({x0} * {x0} + {MIX_C1}) % {MIX_P})"
    x2 = f"(({x1} * {x1} + {MIX_C2}) % {MIX_P})"
    return f"((CAST({x2} AS DOUBLE) + 0.5) / {float(MIX_P)!r})"


def bootstrap_mean_ci(
    df: DataFrame,
    group_cols: Sequence[str],
    value_col: str,
    key_col: str,
    n_boot: int = 32,
    lo_q: float = 0.025,
    hi_q: float = 0.975,
    salt: str = "boot:",
    round_to: int = 6,
) -> DataFrame:
    """Per-group mean with a deterministic Poisson-bootstrap CI.

    Returns (*group_cols, n, mean, ci_lo, ci_hi): n and mean are the
    plain per-group aggregates over non-null values; ci_lo/ci_hi are
    the lo_q/hi_q interpolating percentiles of the ``n_boot``
    replicate means.  Replicates whose total weight is 0 (possible
    only for near-empty groups) are dropped from the percentile.
    """
    if n_boot < 2:
        raise ValueError("n_boot must be >= 2")
    v = F.col(value_col).cast("double")
    # ONE interpreted fingerprint fold per ROW (computed before the
    # replicate explode — folding per (row, replicate) measured 19 s
    # vs 1 s at sf0.1), then cheap nonlinear integer mixing per
    # replicate: two quadratic-residue steps (x -> x² + c mod p,
    # Blum-Blum-Shub flavor) break the affine-in-j structure a linear
    # congruence would leak into the replicate weights.  Every step
    # stays below 2^63 (x < 2^31 → x² < 2^62) and is bit-identical
    # in DuckDB.
    base = df.where(v.isNotNull()).select(
        *group_cols,
        v.alias("_v"),
        rolling_fingerprint(
            F.concat(F.lit(salt), F.col(key_col).cast("string"))
        ).alias("_h"),
    )
    rep = base.select(
        *group_cols,
        "_v",
        "_h",
        F.explode(F.sequence(F.lit(0), F.lit(n_boot - 1))).alias("_j"),
    )
    u = mix_u(F.col("_h"), F.col("_j"))
    weighted = rep.withColumn("_w", poisson1_weight(u).cast("double"))
    reps = (
        weighted.groupBy(*group_cols, "_j")
        .agg(
            F.sum(F.col("_w") * F.col("_v")).alias("_swv"),
            F.sum("_w").alias("_sw"),
        )
        .where(F.col("_sw") > 0)
        .select(*group_cols, (F.col("_swv") / F.col("_sw")).alias("_bm"))
    )
    ci = reps.groupBy(*group_cols).agg(
        F.round(F.percentile(F.col("_bm"), F.lit(lo_q)), round_to).alias(
            "ci_lo"
        ),
        F.round(F.percentile(F.col("_bm"), F.lit(hi_q)), round_to).alias(
            "ci_hi"
        ),
    )
    point = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("_v"), round_to).alias("mean"),
    )
    return point.join(ci, list(group_cols))
