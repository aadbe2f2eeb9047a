"""Dataset distribution drift between two slices.

Training-data pipelines rebuild corpora continuously; the silent
failure mode is the NEW crawl's distribution (languages, sources,
topics, token frequencies) quietly diverging from the corpus the
model was tuned on.  This operator quantifies that drift per
category and in aggregate: given one DataFrame and a boolean slice
predicate, it computes each category's count and smoothed
probability in slice A (predicate false) and slice B (true), the
per-category Jensen-Shannon divergence contribution, and the
pointwise KL term — so `sum(js_term)` over the result is the JS
divergence (base 2, in [0, 1]) and the largest `js_term` rows ARE
the drift explanation ("which categories moved").

Laplace smoothing (default 0.5 per category) keeps categories that
appear in only one slice finite; K (the observed category count)
enters the smoothing denominator, computed in-plan.

Physical shape: ONE keyed aggregate over the category columns with
conditional partial sums (single shuffle of distinct-category rows,
map-side combined), a 1-row totals aggregate broadcast back, and
pure column arithmetic.  No fact rescans, nothing driver-side;
scale cost is one shuffle of |categories| rows regardless of input
size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def categorical_drift(
    df: DataFrame,
    cat_cols: Sequence[str],
    in_b: Column,
    laplace: float = 0.5,
) -> DataFrame:
    """Per-category drift between slice A (``in_b`` false) and slice
    B (``in_b`` true) over the ``cat_cols`` categories.

    Returns one row per observed category: ``n_a``, ``n_b`` (raw
    counts), ``p_a``, ``p_b`` (Laplace-smoothed probabilities),
    ``js_term`` (this category's JS-divergence contribution, base 2)
    and ``kl_term`` (pointwise KL(A||B) contribution), each rounded
    to 6 decimals for cross-engine determinism.
    """
    b = in_b.cast("boolean")
    agg = df.groupBy(*[F.col(c) for c in cat_cols]).agg(
        F.sum(F.when(~b, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(b, 1).otherwise(0)).cast("long").alias("n_b"),
    )
    totals = agg.agg(
        F.sum("n_a").cast("double").alias("_ta"),
        F.sum("n_b").cast("double").alias("_tb"),
        F.count(F.lit(1)).cast("double").alias("_k"),
    )
    lam = F.lit(float(laplace))
    out = agg.crossJoin(F.broadcast(totals))
    p_a = (F.col("n_a") + lam) / (F.col("_ta") + lam * F.col("_k"))
    p_b = (F.col("n_b") + lam) / (F.col("_tb") + lam * F.col("_k"))
    m = (p_a + p_b) / F.lit(2.0)
    log2 = lambda c: F.log(2.0, c)  # noqa: E731
    js = (p_a * log2(p_a / m) + p_b * log2(p_b / m)) / F.lit(2.0)
    kl = p_a * log2(p_a / p_b)
    return out.select(
        *cat_cols,
        "n_a",
        "n_b",
        F.round(p_a, 6).alias("p_a"),
        F.round(p_b, 6).alias("p_b"),
        F.round(js, 6).alias("js_term"),
        F.round(kl, 6).alias("kl_term"),
    )


def chi_square_drift(
    df: DataFrame,
    cat_cols: Sequence[str],
    in_b: Column,
    round_to: int = 6,
) -> DataFrame:
    """Pearson chi-square two-sample homogeneity test between slice A
    (``in_b`` false) and slice B (``in_b`` true) over the
    ``cat_cols`` categories — the classical significance companion to
    :func:`categorical_drift`'s information-theoretic view (JS says
    "how different", chi-square says "could this be chance").

    Per category: observed a/b counts, expected counts under
    homogeneity (row_total * col_total / grand_total), and the
    category's chi-square contribution Σ (obs-exp)²/exp over both
    slices.  The statistic is the sum of the ``chi2_term`` column;
    degrees of freedom = (#categories - 1) — left to the caller, who
    knows which categories they consider structural.

    Physical shape: ONE keyed aggregate over the categories (map-side
    combined), a 1-row grand-total broadcast joined back — same
    profile as categorical_drift; output is category-sized.
    Zero-expected categories cannot occur: a category only appears if
    observed in at least one slice, so both its row total and each
    column total are positive.
    """
    b = in_b.cast("boolean")
    keys = [F.col(c) for c in cat_cols]
    counts = df.groupBy(*keys).agg(
        F.sum(F.when(~b, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(b, 1).otherwise(0)).alias("n_b"),
    )
    totals = counts.agg(
        F.sum("n_a").cast("double").alias("_ta"),
        F.sum("n_b").cast("double").alias("_tb"),
    )
    j = counts.crossJoin(F.broadcast(totals))
    row_tot = (F.col("n_a") + F.col("n_b")).cast("double")
    grand = F.col("_ta") + F.col("_tb")
    exp_a = row_tot * F.col("_ta") / grand
    exp_b = row_tot * F.col("_tb") / grand
    chi = (F.col("n_a") - exp_a) * (F.col("n_a") - exp_a) / exp_a + (
        F.col("n_b") - exp_b
    ) * (F.col("n_b") - exp_b) / exp_b
    return j.select(
        *cat_cols,
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.round(exp_a, round_to).alias("exp_a"),
        F.round(exp_b, round_to).alias("exp_b"),
        F.round(chi, round_to).alias("chi2_term"),
    )


def psi_drift(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: Column | str,
    in_b: Column,
    bins: int = 10,
    laplace: float = 0.5,
    round_to: int = 6,
) -> DataFrame:
    """Population Stability Index per key between slice A (``in_b``
    false, the "expected"/reference population) and slice B (true,
    the "actual"/current one) — the scorecard-monitoring classic
    (PSI = Σ (p_b - p_a)·ln(p_b/p_a) over bins; rule of thumb:
    < 0.1 stable, 0.1-0.25 shifting, > 0.25 action).  Completes the
    drift family: JS (information), chi-square (significance), KS
    (worst-case ECDF gap), PSI (industry-standard magnitude score).

    Values are bucketed into ``bins`` equi-width bins over the GLOBAL
    [min, max] range (one 1-row broadcast, same binning contract as
    :func:`ks_drift_binned`); per-slice bin probabilities are
    Laplace-smoothed over the OBSERVED bin count so a bin empty in
    one slice contributes a finite term instead of ±inf — same
    smoothing contract as :func:`categorical_drift`.

    Returns per key: ``n_a``, ``n_b``, ``psi`` (sum of bin terms)
    and ``psi_max_bin`` (the bin contributing the largest term;
    smallest index on ties) — the "which region of the distribution
    moved" explanation.  Keys with an empty slice are omitted.

    Physical shape: one 1-row min/max broadcast, ONE (key, bin)
    aggregate (map-side combined), one ≤ ``bins``-row-per-key window
    — input-size-independent output, no data-path Python.
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    b = in_b.cast("boolean")
    base = df.where(v.isNotNull()).select(
        *[F.col(c) for c in key_cols], v.alias("_v"), b.alias("_b")
    )
    rng = base.agg(F.min("_v").alias("_lo"), F.max("_v").alias("_hi"))
    binned = (
        base.crossJoin(F.broadcast(rng))
        .select(
            *key_cols,
            "_b",
            # same degenerate-range guard as ks_drift_binned: a
            # constant column lands in bin 0, not a NaN-poisoned NULL
            F.least(
                F.lit(bins - 1),
                F.floor(
                    (F.col("_v") - F.col("_lo"))
                    / (
                        F.when(
                            F.col("_hi") > F.col("_lo"),
                            F.col("_hi") - F.col("_lo"),
                        ).otherwise(F.lit(1.0))
                        / bins
                    )
                ).cast("int"),
            ).alias("bin"),
        )
        .groupBy(*key_cols, "bin")
        .agg(
            F.sum(F.when(~F.col("_b"), 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("_b"), 1).otherwise(0)).alias("cb"),
        )
    )
    tot = Window.partitionBy(*key_cols)
    lam = F.lit(float(laplace))
    with_tot = binned.select(
        *key_cols,
        "bin",
        "ca",
        "cb",
        F.sum("ca").over(tot).alias("n_a"),
        F.sum("cb").over(tot).alias("n_b"),
        F.count(F.lit(1)).over(tot).cast("double").alias("_k"),
    ).where((F.col("n_a") > 0) & (F.col("n_b") > 0))
    p_a = (F.col("ca") + lam) / (F.col("n_a") + lam * F.col("_k"))
    p_b = (F.col("cb") + lam) / (F.col("n_b") + lam * F.col("_k"))
    term = (p_b - p_a) * F.log(p_b / p_a)
    terms = with_tot.select(
        *key_cols,
        "bin",
        "n_a",
        "n_b",
        term.alias("_term"),
    )
    wmax = Window.partitionBy(*key_cols).orderBy(
        F.col("_term").desc(), F.col("bin")
    )
    return (
        terms.withColumn("_rn", F.row_number().over(wmax))
        .groupBy(*key_cols)
        .agg(
            F.first(F.col("n_a")).cast("long").alias("n_a"),
            F.first(F.col("n_b")).cast("long").alias("n_b"),
            F.round(F.sum("_term"), round_to).alias("psi"),
            F.min(F.when(F.col("_rn") == 1, F.col("bin"))).alias(
                "psi_max_bin"
            ),
        )
    )


def ks_drift_binned(
    df: DataFrame,
    key_cols: Sequence[str],
    value_col: Column | str,
    in_b: Column,
    bins: int = 64,
    round_to: int = 6,
) -> DataFrame:
    """Binned two-sample Kolmogorov-Smirnov drift per key: the max
    ECDF gap between slice A (``in_b`` false) and slice B over a
    fixed equi-width binning of the GLOBAL [min, max] value range —
    the continuous-value companion to :func:`chi_square_drift`.

    Binned deliberately, and the contract says so: the exact KS
    statistic needs every value in sorted order — per key that is a
    single-task window at 100 TB (the same shape the engine refused
    in ``token_budget_selection``).  With ``bins`` buckets the
    statistic is exact FOR THE BINNED ECDF, a lower bound on (and
    within max-bin-mass of) the exact KS; doubling ``bins`` halves
    the resolution term, and the physical shape stays: one 1-row
    min/max broadcast, one (key, bin) aggregate, one window over ≤
    ``bins`` rows per key.

    Returns per key: ``n_a``, ``n_b``, ``ks`` and ``ks_bin`` (the
    bin index attaining the max gap; smallest such bin on ties —
    deterministic).  Keys with an empty slice are omitted (no
    two-sample question to ask).
    """
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    b = in_b.cast("boolean")
    base = df.where(v.isNotNull()).select(
        *[F.col(c) for c in key_cols], v.alias("_v"), b.alias("_b")
    )
    rng = base.agg(
        F.min("_v").alias("_lo"), F.max("_v").alias("_hi")
    )
    binned = (
        base.crossJoin(F.broadcast(rng))
        .select(
            *key_cols,
            "_b",
            # Degenerate range (min == max): (v-lo)/0 is NaN → floor →
            # NULL → null-skipping least() silently buckets everything
            # into bin bins-1 and reports ks=0.  Guard the span like
            # layout.quantize: a constant column lands in bin 0 exactly.
            F.least(
                F.lit(bins - 1),
                F.floor(
                    (F.col("_v") - F.col("_lo"))
                    / (
                        F.when(
                            F.col("_hi") > F.col("_lo"),
                            F.col("_hi") - F.col("_lo"),
                        ).otherwise(F.lit(1.0))
                        / bins
                    )
                ).cast("int"),
            ).alias("bin"),
        )
        .groupBy(*key_cols, "bin")
        .agg(
            F.sum(F.when(~F.col("_b"), 1).otherwise(0)).alias("ca"),
            F.sum(F.when(F.col("_b"), 1).otherwise(0)).alias("cb"),
        )
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy(*key_cols)
    cum = binned.select(
        *key_cols,
        "bin",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
        F.sum("ca").over(tot).alias("n_a"),
        F.sum("cb").over(tot).alias("n_b"),
    )
    gap = F.abs(
        F.col("cum_a") / F.col("n_a") - F.col("cum_b") / F.col("n_b")
    )
    ranked = cum.where((F.col("n_a") > 0) & (F.col("n_b") > 0)).select(
        *key_cols,
        "n_a",
        "n_b",
        "bin",
        F.round(gap, round_to).alias("_gap"),
    )
    wmax = Window.partitionBy(*key_cols).orderBy(
        F.col("_gap").desc(), F.col("bin")
    )
    return (
        ranked.withColumn("_rn", F.row_number().over(wmax))
        .where(F.col("_rn") == 1)
        .select(
            *key_cols,
            "n_a",
            "n_b",
            F.col("_gap").alias("ks"),
            F.col("bin").alias("ks_bin"),
        )
    )
