"""Privacy audits for training-data / analytics release: k-anonymity
and l-diversity over quasi-identifier columns (Sweeney, "k-anonymity:
a model for protecting privacy", 2002; Machanavajjhala et al.,
"l-diversity", 2007 — public literature).

A table is k-anonymous w.r.t. a quasi-identifier set Q when every
equivalence class (distinct combination of Q values) contains at
least k rows; l-diverse w.r.t. sensitive column s when every class
contains at least l DISTINCT values of s.  The audits return the
VIOLATING classes — the actionable output: each row is a class that
must be generalized, suppressed, or merged before release.

Complements ``operators/mask.py`` (salted column masking): masking
hides direct identifiers; these audits catch re-identification via
quasi-identifier joins, which masking alone does not.

Scale shape: ONE keyed aggregate on the quasi-identifier columns
(count / count-distinct), filtered to violations — output is
violation-sized, never table-sized.  Cardinality of Q drives the
shuffle; skewed classes are exactly the NON-violating ones (big
classes), so the filter drops the heavy groups and violation output
stays tiny.  At 100 TB this is the same plan as any groupBy-count:
partial aggregation map-side, then one exchange on hash(Q).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymity_violations(
    df: DataFrame,
    quasi_cols: Sequence[str | Column],
    k: int,
) -> DataFrame:
    """Equivalence classes over ``quasi_cols`` with fewer than ``k``
    rows.  Returns (*quasi_cols, class_size) — empty result means the
    table is k-anonymous for this quasi-identifier set.

    NULL quasi values form their own class (groupBy NULL-key
    semantics), matching the attacker model: a NULL in a released
    quasi column is as linkable as any other value.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("class_size"))
        .where(F.col("class_size") < k)
    )


def l_diversity_violations(
    df: DataFrame,
    quasi_cols: Sequence[str | Column],
    sensitive_col: str,
    l: int,
) -> DataFrame:
    """Equivalence classes over ``quasi_cols`` whose ``sensitive_col``
    has fewer than ``l`` distinct (non-null) values.  Returns
    (*quasi_cols, class_size, distinct_sensitive) for each violating
    class.  Exact count-distinct per class — at extreme class
    cardinality swap in approx_count_distinct, trading the exact
    audit for a sketch (documented, not default: a privacy audit
    should not under-count diversity).
    """
    if l < 1:
        raise ValueError("l must be >= 1")
    return (
        df.groupBy(*quasi_cols)
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.count_distinct(F.col(sensitive_col)).alias(
                "distinct_sensitive"
            ),
        )
        .where(F.col("distinct_sensitive") < l)
    )


def dp_counts(
    df: DataFrame,
    group_cols: Sequence[str],
    epsilon: float = 1.0,
    salt: str = "dp:",
) -> DataFrame:
    """ε-differentially-private group counts via the Laplace
    mechanism (Dwork et al. 2006, public literature): released count
    = true count + Laplace(1/ε) noise (count queries have L1
    sensitivity 1).  The privacy audits above say WHAT cannot be
    released raw; this is the standard mechanism for releasing it
    anyway.

    REPRODUCIBILITY over RNG: the Laplace draw derives from the
    engine's rolling-hash fingerprint of (salt, group key) through
    the inverse CDF — u in (0,1),
    ``noise = -(1/ε)·sign(u-½)·ln(1-2|u-½|)`` — so every engine,
    partitioning, and re-run releases the identical table (and the
    DuckDB oracle reproduces it bit-for-bit).  A deterministic draw
    per (salt, group) is one fixed sample of the mechanism; release
    a new version under a FRESH salt, and account ε per release
    (standard composition), never re-drawing to shop for noise.

    Returns (*group_cols, n_noisy) with the noisy count rounded to 6
    (negative releases are kept: post-hoc clamping is allowed but
    changes the estimator's bias — caller's choice).

    Scale shape: ONE keyed aggregate (map-side combined) + scan-side
    noise math on the group-sized result.  Nothing else touches the
    fact table.
    """
    from ..functions.textfn import FP_MOD, rolling_fingerprint

    if epsilon <= 0:
        raise ValueError(f"epsilon must be > 0, got {epsilon}")
    counts = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_n")
    )
    # length-prefix each value so the concatenated key is INJECTIVE:
    # a bare concat would collide ("x","yz") with ("xy","z"), giving
    # two groups byte-identical noise draws — comparing their
    # released counts would then cancel the noise exactly (caught in
    # review).  NULL encodes as "-1:" (no length can be -1).
    def _piece(c: str):
        v = F.col(c).cast("string")
        return F.coalesce(
            F.concat(F.length(v).cast("string"), F.lit(":"), v),
            F.lit("-1:"),
        )

    key = F.concat(F.lit(salt), *[_piece(c) for c in group_cols])
    u = (rolling_fingerprint(key).cast("double") + F.lit(0.5)) / F.lit(
        float(FP_MOD)
    )
    b = 1.0 / float(epsilon)
    centered = u - F.lit(0.5)
    noise = (
        F.lit(-b)
        * F.signum(centered)
        * F.log(F.lit(1.0) - F.lit(2.0) * F.abs(centered))
    )
    return counts.select(
        *group_cols,
        (F.round(F.col("_n") + noise, 6) + F.lit(0.0)).alias("n_noisy"),
    )
