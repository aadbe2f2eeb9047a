"""Experiment-analysis operators: CUPED variance reduction (Deng,
Xu, Kohavi, Walker 2013, "Improving the Sensitivity of Online
Controlled Experiments by Utilizing Pre-Experiment Data", public
literature).

CUPED replaces each unit's metric y with y* = y - θ·(x - E[x]) where
x is a pre-experiment covariate and θ = cov(x, y) / var(x); E[y*] =
E[y] (unbiased treatment-effect estimates) while var(y*) shrinks by
the squared correlation — the standard ~30-50% sensitivity win every
experimentation platform ships.

Scale shape: ONE pass computes the global θ/E[x] scalars (map-side
combined covariance sums → 1-row broadcast), the adjustment is
scan-side column math, and the per-arm report is one keyed aggregate
over |arms| groups.  The unit table is never shuffled except for the
final arm aggregate.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cuped_adjust(
    df: DataFrame,
    y_col: str,
    x_col: str,
    arm_col: str,
) -> DataFrame:
    """Per-arm CUPED report: (arm, n, mean_y, mean_cuped, var_y,
    var_cuped, var_reduction) — var_reduction = 1 - var*/var, the
    realized sensitivity gain (≈ corr(x,y)² when θ is fit globally).

    Units with NULL covariate are excluded from θ but keep their raw
    metric with zero adjustment (x imputed at the global mean — the
    standard treatment of missing pre-period data: contributes no
    variance reduction, introduces no bias).  Units with NULL METRIC
    are dropped entirely (they have nothing to measure); θ and E[x]
    come from the COMPLETE-PAIR population only, so θ is the actual
    regression slope on one consistent sample — mixing cov over
    pairs with var/mean over all x-rows attenuates θ (caught in
    review).

    θ is fit POOLED across arms (the published estimator; per-arm θ
    reintroduces bias under randomization imbalance).  All reported
    floats round to 6.
    """
    y = F.col(y_col).cast("double")
    x = F.col(x_col).cast("double")
    df = df.where(y.isNotNull())
    stats = df.where(x.isNotNull()).agg(
        F.covar_pop(x, y).alias("_cxy"),
        F.var_pop(x).alias("_vx"),
        F.avg(x).alias("_mx"),
    )
    staged = df.crossJoin(F.broadcast(stats))
    theta = F.when(
        F.col("_vx") > 0, F.col("_cxy") / F.col("_vx")
    ).otherwise(0.0)
    adj = F.when(
        x.isNotNull(), y - theta * (x - F.col("_mx"))
    ).otherwise(y)
    return (
        staged.withColumn("_adj", adj)
        .groupBy(F.col(arm_col).alias("arm"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            (F.round(F.avg(y), 6) + F.lit(0.0)).alias("mean_y"),
            (F.round(F.avg("_adj"), 6) + F.lit(0.0)).alias("mean_cuped"),
            (F.round(F.var_pop(y), 6) + F.lit(0.0)).alias("var_y"),
            (F.round(F.var_pop("_adj"), 6) + F.lit(0.0)).alias("var_cuped"),
            (
                F.round(
                    F.when(
                        F.var_pop(y) > 0,
                        F.lit(1.0) - F.var_pop("_adj") / F.var_pop(y),
                    ).otherwise(0.0),
                    6,
                )
                + F.lit(0.0)
            ).alias("var_reduction"),
        )
    )


def conformal_intervals(
    cal: DataFrame,
    test: DataFrame,
    pred_col: str,
    actual_col: str,
    group_cols: list[str],
    alpha: float = 0.1,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Split conformal prediction (Vovk et al.; Lei et al. 2018,
    public literature): per group, q̂ = the ⌈(n+1)(1-α)⌉-th smallest
    absolute calibration residual; the interval prediction ± q̂ then
    covers ≥ 1-α of exchangeable test points — the
    distribution-free guarantee every 'give me error bars on this
    model' request actually wants.

    Returns per group: (group..., n_cal, q_hat, n_test, covered,
    coverage) where covered counts test rows with |actual - pred| ≤
    q̂ and coverage rounds to 6.  Groups whose ⌈(n+1)(1-α)⌉ exceeds
    n_cal get q_hat = NULL (n too small for the level — the honest
    answer) and zero coverage.

    Exact integer order statistics (rank window over residuals with
    a total-order tiebreak), NOT interpolated percentiles — engines
    disagree on interpolation conventions; the kth order statistic
    is engine-independent.

    Scale shape: one per-group rank window on the CALIBRATION set
    (calibration is the small split by construction), one broadcast
    of the |groups|-row q̂ table onto the test side, one keyed
    aggregate.  The test set is never sorted.
    """
    from pyspark.sql import Window

    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0,1), got {alpha}")
    r = F.abs(
        F.col(actual_col).cast("double") - F.col(pred_col).cast("double")
    )
    order = [F.col("_r")] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(*group_cols).orderBy(*order)
    wn = Window.partitionBy(*group_cols)
    ranked = (
        cal.withColumn("_r", r)
        .withColumn("_rk", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wn))
        .withColumn(
            "_k", F.ceil((F.col("_n") + 1) * (1.0 - alpha)).cast("long")
        )
    )
    qs = (
        ranked.where(F.col("_rk") == F.col("_k"))
        .select(*group_cols, F.col("_r").alias("q_hat"), F.col("_n"))
        .union(
            # groups too small for the level: emit NULL q_hat
            ranked.where(F.col("_k") > F.col("_n"))
            .groupBy(*group_cols)
            .agg(F.first("_n").alias("_n"))
            .select(
                *group_cols,
                F.lit(None).cast("double").alias("q_hat"),
                "_n",
            )
        )
    )
    t = test.withColumn("_r", r)
    joined = t.join(F.broadcast(qs), group_cols, "inner")
    return (
        joined.groupBy(*group_cols)
        .agg(
            F.first("_n").cast("long").alias("n_cal"),
            (F.round(F.first("q_hat"), 6) + F.lit(0.0)).alias("q_hat"),
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                F.when(F.col("_r") <= F.col("q_hat"), 1).otherwise(0)
            )
            .cast("long")
            .alias("covered"),
            (
                F.round(
                    F.coalesce(
                        F.sum(
                            F.when(F.col("_r") <= F.col("q_hat"), 1).otherwise(0)
                        )
                        / F.count(F.lit(1)),
                        F.lit(0.0),
                    ),
                    6,
                )
                + F.lit(0.0)
            ).alias("coverage"),
        )
    )


def msprt_test(
    df: DataFrame,
    y_col: str,
    arm_col: str,
    control: str,
    treatment: str,
    tau2: float = 1.0,
) -> DataFrame:
    """Mixture sequential probability ratio test — the always-valid
    p-value construction (Johari, Koomen, Pekelis, Walsh 2017,
    "Peeking at A/B Tests", public literature): with a normal
    mixture prior of variance ``tau2`` over the effect, the
    likelihood ratio at the current sample is

        Λ = sqrt(V / (V + τ²)) · exp(θ̂² τ² / (2 V (V + τ²)))

    where θ̂ = mean(treatment) - mean(control) and V = s²(1/n_t +
    1/n_c) with the pooled variance s².  p_always = min(1, 1/Λ) is
    valid at EVERY peek — continuous monitoring without alpha
    inflation, which the fixed-horizon t-test (and the CUPED report
    above) cannot give.

    The statistic is computed and EMITTED in log space:

        log_lambda = 0.5·ln(V / (V + τ²)) + θ̂² τ² / (2 V (V + τ²))
        p_always   = exp(-max(0, log_lambda))      (= min(1, 1/Λ))

    because Λ itself overflows double precision in the near-zero-
    variance regime (V ≈ 1e-11 with θ̂ ≈ 1 puts Λ at e^4e10 —
    IEEE-754 saturates to +Inf and the "round only at the final
    select" determinism contract becomes unstatable; found by the
    round-8 magnitude-boundary property sweep, the twin of round-7's
    UCB1 rounding finding).  log_lambda is finite for every V > 0,
    and exp(-max(0, ·)) underflows monotonically to a deterministic
    0.0 instead of saturating.

    Returns ONE row: (n_control, n_treatment, mean_control,
    mean_treatment, effect, log_lambda, p_always), floats rounded
    to 6.  A degenerate batch where BOTH arms have zero variance
    (V = 0) yields zero rows instead of a divide-by-zero — the same
    guard welch_t applies via se2 > 0 (found by the round-8
    rounding-boundary property sweep under ANSI mode).

    Scale shape: a single two-group aggregate (map-side combined);
    everything else is scalar math on that 2-row result.
    """
    if tau2 <= 0:
        raise ValueError(f"tau2 must be > 0, got {tau2}")
    y = F.col(y_col).cast("double")
    g = (
        df.where(F.col(arm_col).isin(control, treatment) & y.isNotNull())
        .groupBy(arm_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg(y).alias("m"),
            F.var_pop(y).alias("v"),
        )
    )
    c = g.where(F.col(arm_col) == control).select(
        F.col("n").alias("nc"), F.col("m").alias("mc"), F.col("v").alias("vc")
    )
    t = g.where(F.col(arm_col) == treatment).select(
        F.col("n").alias("nt"), F.col("m").alias("mt"), F.col("v").alias("vt")
    )
    j = c.crossJoin(t)
    s2 = (F.col("nc") * F.col("vc") + F.col("nt") * F.col("vt")) / (
        F.col("nc") + F.col("nt")
    )
    V = s2 * (1.0 / F.col("nc") + 1.0 / F.col("nt"))
    theta = F.col("mt") - F.col("mc")
    log_lam = 0.5 * F.log(V / (V + tau2)) + (theta * theta) * tau2 / (
        2.0 * V * (V + tau2)
    )
    # V = 0 (both arms constant) would divide by zero in log_lam; the
    # test is undefined there, drop the row (welch_t's se2 > 0 twin)
    j = j.where(V > 0)
    return j.select(
        F.col("nc").cast("long").alias("n_control"),
        F.col("nt").cast("long").alias("n_treatment"),
        (F.round(F.col("mc"), 6) + F.lit(0.0)).alias("mean_control"),
        (F.round(F.col("mt"), 6) + F.lit(0.0)).alias("mean_treatment"),
        (F.round(theta, 6) + F.lit(0.0)).alias("effect"),
        (F.round(log_lam, 6) + F.lit(0.0)).alias("log_lambda"),
        (
            F.round(F.exp(-F.greatest(F.lit(0.0), log_lam)), 6) + F.lit(0.0)
        ).alias("p_always"),
    )


# Abramowitz & Stegun 26.2.17 rational-polynomial tail of the standard
# normal CDF — |error| < 7.5e-8, pure arithmetic + exp, so BOTH Spark
# and a SQL oracle can evaluate the identical formula (no scipy on the
# executors, no erf builtin needed in either engine).
_AS_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
_AS_T = 0.2316419
_INV_SQRT_2PI = 0.3989422804014327


def normal_sf(z):
    """Upper-tail P(Z > z) for z >= 0 as a Column expression
    (Abramowitz-Stegun 26.2.17).  Callers pass |z| and double the
    result for a two-sided p-value."""
    t = 1.0 / (1.0 + _AS_T * z)
    poly = (
        _AS_B[0] * t
        + _AS_B[1] * t * t
        + _AS_B[2] * t * t * t
        + _AS_B[3] * t * t * t * t
        + _AS_B[4] * t * t * t * t * t
    )
    return _INV_SQRT_2PI * F.exp(-z * z / 2.0) * poly


def normal_sf_sql(z_expr: str) -> str:
    """The IDENTICAL A&S 26.2.17 formula as a SQL fragment over the
    (non-negative) expression ``z_expr`` — keep in lockstep with
    :func:`normal_sf` so engine and oracle agree to float precision."""
    t = f"(1.0 / (1.0 + {_AS_T} * ({z_expr})))"
    poly = (
        f"({_AS_B[0]} * {t} + {_AS_B[1]} * {t}*{t} "
        f"+ {_AS_B[2]} * {t}*{t}*{t} + {_AS_B[3]} * {t}*{t}*{t}*{t} "
        f"+ {_AS_B[4]} * {t}*{t}*{t}*{t}*{t})"
    )
    return f"({_INV_SQRT_2PI} * exp(-({z_expr})*({z_expr})/2.0) * {poly})"


def bh_adjust(
    df: DataFrame,
    key_cols,
    p_col: str = "p",
    alpha: float = 0.05,
    round_to: int = 6,
) -> DataFrame:
    """Benjamini-Hochberg FDR correction (JRSS-B 1995) over a table of
    per-hypothesis p-values — the multiple-testing gate every
    many-segment experiment readout needs (m segments tested at 0.05
    yield 0.05·m false alarms uncorrected; BH caps the FALSE DISCOVERY
    RATE at alpha instead).

    q_i = min_{j >= i} p_(j)·m/j over the ascending p order (ties
    broken by the key columns for cross-engine determinism), clamped
    to 1; ``discovery`` = (q <= alpha).  The step-up min is a single
    suffix-min window — the textbook algorithm, expressed relationally.

    Scale note: the input is HYPOTHESIS-sized (one row per segment /
    metric), not data-sized — the global rank window over it is a
    deliberate single-task sort of a model-sized table, same contract
    as the centroid tables.  The data-sized work (computing each
    p-value) happens upstream in keyed aggregates.

    Returns the input keys + ``p`` (rounded), ``rank``, ``q_value``,
    ``discovery``.
    """
    from pyspark.sql import Window

    keys = [F.col(c) for c in key_cols]
    wr = Window.orderBy(F.col(p_col), *keys)
    wm = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # m comes from a window count, not a driver-side .count() — the
    # builder stays action-free (bench/driver construct lazily)
    ranked = df.select(
        *key_cols,
        F.col(p_col).alias("_p"),
        F.row_number().over(wr).alias("rank"),
        F.count(F.lit(1)).over(wm).cast("double").alias("_m"),
    )
    ws = Window.orderBy("rank").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    q = F.least(
        F.lit(1.0),
        F.min(F.col("_p") * F.col("_m") / F.col("rank")).over(ws),
    )
    return ranked.select(
        *key_cols,
        F.round(F.col("_p"), round_to).alias("p"),
        "rank",
        F.round(q, round_to).alias("q_value"),
        (F.round(q, round_to) <= F.lit(alpha)).alias("discovery"),
    )


def mann_whitney_auc(
    df: DataFrame,
    group_cols,
    label_col: str,
    score_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Tie-aware Mann-Whitney U / AUC per group (Mann & Whitney
    1947; the AUC = P(score⁺ > score⁻) + ½·P(=) identity is the
    standard ranking-quality readout): with average ranks R⁺ summed
    over positives,

        U   = ΣR⁺ - n⁺(n⁺+1)/2
        AUC = U / (n⁺ · n⁻)

    Output per group: n_pos, n_neg, auc.  Groups lacking either
    class are dropped (AUC undefined).

    Scale shape: ranks are computed over the DISTINCT-SCORE relation,
    not the fact table — one keyed aggregate to (group, score) cells
    with per-cell counts, one window over scores WITHIN each group
    (cells-sized, bounded by distinct scores per group), one final
    keyed reduce.  The window is partitioned by the group key, so no
    single-partition global sort exists at any scale.
    """
    from pyspark.sql import Window

    group_cols = list(group_cols)
    pos = F.when(F.col(label_col).cast("int") == 1, 1).otherwise(0)
    cells = (
        df.where(F.col(score_col).isNotNull())
        .groupBy(*group_cols, F.col(score_col).alias("_s"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("_m"),
            F.sum(pos).cast("double").alias("_mp"),
        )
    )
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("_s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    avg_rank = F.coalesce(F.sum("_m").over(w), F.lit(0.0)) + (
        F.col("_m") + 1
    ) / 2
    per = cells.select(
        *group_cols,
        F.col("_mp").alias("_np"),
        (F.col("_m") - F.col("_mp")).alias("_nq"),
        (avg_rank * F.col("_mp")).alias("_rp"),
    )
    g = per.groupBy(*group_cols).agg(
        F.sum("_np").alias("np"),
        F.sum("_nq").alias("nq"),
        F.sum("_rp").alias("rp"),
    )
    u = F.col("rp") - F.col("np") * (F.col("np") + 1) / 2
    return g.where((F.col("np") > 0) & (F.col("nq") > 0)).select(
        *group_cols,
        F.col("np").cast("long").alias("n_pos"),
        F.col("nq").cast("long").alias("n_neg"),
        (
            F.round(u / (F.col("np") * F.col("nq")), round_to)
            + F.lit(0.0)
        ).alias("auc"),
    )


def calibration_bins(
    df: DataFrame,
    prob_col: str,
    label_col: str,
    bins: int = 10,
    round_to: int = 6,
) -> DataFrame:
    """Reliability-diagram bins + per-bin ECE contribution for a
    probabilistic scorer (the calibration readout of Guo et al. 2017
    "On Calibration of Modern Neural Networks", public literature):
    fixed-width bins over [0, 1] (bin = min(floor(p·B), B-1)), and
    per bin the count, mean predicted probability, empirical positive
    rate, signed gap, and weight·|gap| — so ``sum(ece_term)`` over
    the result IS the Expected Calibration Error.

    Scale shape: ONE keyed aggregate over ≤ B groups (map-side
    combined) plus a 1-row total broadcast for the ECE weights; the
    fact table is scanned once.  Rows with NULL or out-of-range
    probabilities are dropped (they are scorer bugs, not data).
    """
    p = F.col(prob_col).cast("double")
    lbl = F.when(F.col(label_col).cast("int") == 1, 1.0).otherwise(0.0)
    binned = (
        df.where(p.isNotNull() & (p >= 0) & (p <= 1))
        .withColumn(
            "bin",
            F.least(F.floor(p * bins), F.lit(bins - 1)).cast("long"),
        )
    )
    cells = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum(p).alias("_sp"),
        F.sum(lbl).alias("_sl"),
    )
    tot = cells.agg(F.sum("_n").alias("_nt"))
    mean_p = F.col("_sp") / F.col("_n")
    rate = F.col("_sl") / F.col("_n")
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "bin",
            F.col("_n").cast("long").alias("n"),
            (F.round(mean_p, round_to) + F.lit(0.0)).alias("mean_p"),
            (F.round(rate, round_to) + F.lit(0.0)).alias("pos_rate"),
            (F.round(rate - mean_p, round_to) + F.lit(0.0)).alias("gap"),
            (
                F.round(
                    F.col("_n") / F.col("_nt") * F.abs(rate - mean_p),
                    round_to,
                )
                + F.lit(0.0)
            ).alias("ece_term"),
        )
    )


def delta_ratio_metric(
    df: DataFrame,
    arm_col: str,
    unit_col: str,
    num_col: str,
    den_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Delta-method standard error for a per-arm RATIO metric
    (Deng, Knoblich & Lu 2018, "Applying the Delta Method in Metric
    Analytics", public literature): the metric is Σnum/Σden across
    units (e.g. clicks per view), whose naive per-row variance is
    wrong because the unit — not the row — is the randomization
    grain.  With x̄, ȳ the per-unit means and r = x̄/ȳ:

        var(r) ≈ (s_x² - 2·r·s_xy + r²·s_y²) / (n·ȳ²)

    (sample moments, n-1 denominator).  Output per arm: n units,
    ratio, se — the pair every ratio-metric scorecard needs.

    Scale shape: one keyed aggregate to units (map-side combined),
    one keyed aggregate to arms carrying six moment sums — the fact
    table is scanned once; nothing downstream is data-sized.  Arms
    with < 2 units or a zero denominator are dropped (SE undefined).
    """
    units = df.groupBy(F.col(arm_col).alias("arm"), F.col(unit_col)).agg(
        F.sum(F.col(num_col).cast("double")).alias("_x"),
        F.sum(F.col(den_col).cast("double")).alias("_y"),
    )
    arms = units.groupBy("arm").agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
    )
    n = F.col("_n")
    xbar = F.col("_sx") / n
    ybar = F.col("_sy") / n
    r = xbar / ybar
    vx = (F.col("_sxx") - n * xbar * xbar) / (n - 1)
    vy = (F.col("_syy") - n * ybar * ybar) / (n - 1)
    cxy = (F.col("_sxy") - n * xbar * ybar) / (n - 1)
    var_r = (vx - 2 * r * cxy + r * r * vy) / (n * ybar * ybar)
    return arms.where((n >= 2) & (F.col("_sy") != 0)).select(
        "arm",
        n.cast("long").alias("n"),
        (F.round(r, round_to) + F.lit(0.0)).alias("ratio"),
        (
            F.round(F.sqrt(F.greatest(var_r, F.lit(0.0))), round_to)
            + F.lit(0.0)
        ).alias("se"),
    )


def srm_check(
    df: DataFrame,
    arm_col: str,
    unit_col: str,
    expected: dict | None = None,
    threshold: float = 3.841459,
) -> DataFrame:
    """Sample-Ratio-Mismatch chi-square over experiment arms — the
    first sanity gate of every A/B readout (Fabijan et al. 2019,
    "Diagnosing Sample Ratio Mismatch in Online Controlled
    Experiments", public literature): units (NOT rows — exposure
    rows per unit vary by engagement, which is exactly the bias SRM
    catches) are counted per arm and tested against the design
    allocation.

        chi2 = Σ_arms (n_arm - e_arm)² / e_arm

    ``expected`` maps arm -> design share (default: equal split);
    ``srm`` = 1 when chi2 exceeds ``threshold`` (default 3.84, the
    0.05 critical value at 1 df for a two-arm test — pass the
    appropriate df's critical value for more arms).

    Output: one row per arm (arm, n_units, expected_units, chi2,
    srm) — chi2/srm are the experiment-level values repeated per arm
    so the result stays a flat scalar-column table.

    Scale shape: ONE distinct-aggregate to |arms| rows, then totals
    and the chi2 sum as unpartitioned window sums over that tiny
    frame — the fact table is scanned exactly once (was 4x as
    agg->crossJoin scalars).
    """
    if expected is not None:
        # design shares must be a complete, valid allocation — a share
        # silently missing for an observed arm would NULL its
        # (n-e)^2/e term out of the chi2 SUM and mask a real mismatch
        total_share = math.fsum(float(s) for s in expected.values())
        if abs(total_share - 1.0) > 1e-9:
            raise ValueError(
                f"srm_check: expected shares sum to {total_share!r}, not 1"
            )
        if any(float(s) <= 0.0 for s in expected.values()):
            raise ValueError("srm_check: expected shares must be > 0")
    from pyspark.sql import Window

    units = df.groupBy(F.col(arm_col).alias("arm")).agg(
        F.countDistinct(F.col(unit_col)).cast("double").alias("_n")
    )
    # totals as UNPARTITIONED window sums over the |arms|-row frame:
    # the former agg->crossJoin(broadcast) scalar re-ran the units
    # aggregate per scalar and scanned the fact table 4x
    # (.explain-verified); the window form is single-scan
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    j = units.withColumn("_nt", F.sum("_n").over(w_all)).withColumn(
        "_k", F.count(F.lit(1)).over(w_all)
    )
    if expected is None:
        e = F.col("_nt") / F.col("_k")
    else:
        e = F.col("_nt") * F.coalesce(
            *[
                F.when(F.col("arm") == a, F.lit(float(s)))
                for a, s in sorted(expected.items())
            ],
            # observed arm absent from the design dict: fail loudly at
            # execution (NULL would silently drop the term from chi2)
            F.raise_error(
                F.concat(
                    F.lit("srm_check: arm '"),
                    F.col("arm"),
                    F.lit("' observed in data but absent from expected"),
                )
            ),
        )
    d = F.col("_n") - e
    per = j.select("arm", "_n", e.alias("_e"), (d * d / e).alias("_t"))
    per = per.withColumn("_chi2", F.sum("_t").over(w_all))
    return per.select(
        "arm",
        F.col("_n").cast("long").alias("n_units"),
        (F.round(F.col("_e"), 6) + F.lit(0.0)).alias("expected_units"),
        (F.round(F.col("_chi2"), 6) + F.lit(0.0)).alias("chi2"),
        F.when(F.col("_chi2") > threshold, 1).otherwise(0).cast("int").alias("srm"),
    )


def diff_in_diff(
    df: DataFrame,
    arm_col: str,
    period_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Difference-in-differences over a 2x2 (arm x period) design
    (Card & Krueger 1994 popularized it; any causal-inference text,
    public literature): the treatment effect under the parallel-
    trends assumption is

        DiD = (ȳ_t,after - ȳ_t,before) - (ȳ_c,after - ȳ_c,before)

    with SE = sqrt(Σ_cells s²/n) (independent-cell normal approx —
    the standard back-of-envelope; regression DiD with clustered
    errors is the heavyweight alternative).  ``arm_col`` and
    ``period_col`` must be 0/1 ints (0 = control / before).

    Output: one row — per-cell ns and means, did, se.

    Scale shape: ONE conditional aggregate (8 map-side-combined
    sums); no joins, no second scan.
    """
    a = F.col(arm_col).cast("int")
    p = F.col(period_col).cast("int")
    y = F.col(y_col).cast("double")
    rows = df.where(y.isNotNull())

    def cell(ai, pi):
        cond = (a == ai) & (p == pi)
        n = F.sum(F.when(cond, 1).otherwise(0)).cast("double")
        s = F.sum(F.when(cond, y).otherwise(0.0))
        ss = F.sum(F.when(cond, y * y).otherwise(0.0))
        return n, s, ss

    aggs, names = [], []
    for ai in (0, 1):
        for pi in (0, 1):
            n, s, ss = cell(ai, pi)
            aggs += [
                n.alias(f"_n{ai}{pi}"),
                s.alias(f"_s{ai}{pi}"),
                ss.alias(f"_ss{ai}{pi}"),
            ]
            names.append(f"{ai}{pi}")
    g = rows.agg(*aggs)
    mean = {c: F.col(f"_s{c}") / F.col(f"_n{c}") for c in names}
    var = {
        c: (F.col(f"_ss{c}") - F.col(f"_n{c}") * mean[c] * mean[c])
        / (F.col(f"_n{c}") - 1)
        for c in names
    }
    did = (mean["11"] - mean["10"]) - (mean["01"] - mean["00"])
    se = F.sqrt(
        sum(
            (F.greatest(var[c], F.lit(0.0)) / F.col(f"_n{c}") for c in names),
            F.lit(0.0),
        )
    )
    ok = F.lit(True)
    for c in names:
        ok = ok & (F.col(f"_n{c}") >= 2)
    out = [F.col(f"_n{c}").cast("long").alias(f"n_{c}") for c in names]
    out += [
        (F.round(mean[c], round_to) + F.lit(0.0)).alias(f"mean_{c}")
        for c in names
    ]
    out += [
        (F.round(did, round_to) + F.lit(0.0)).alias("did"),
        (F.round(se, round_to) + F.lit(0.0)).alias("se"),
    ]
    return g.where(ok).select(*out)


def mde_two_arm(
    df: DataFrame,
    group_cols,
    arm_col: str,
    y_col: str,
    z_alpha: float = 1.959964,
    z_power: float = 0.841621,
    round_to: int = 6,
) -> DataFrame:
    """Minimum Detectable Effect for a two-arm test at the CURRENT
    sample sizes — the power-analysis readout every experiment
    review asks for (standard normal-approximation formula, any
    power-analysis text):

        MDE = (z_{1-α/2} + z_{power}) · sqrt(s²_pooled · (1/n_a + 1/n_b))

    with the pooled two-sample variance.  Defaults: α = 0.05
    two-sided, 80% power (z literals injected DOUBLE-cast so the
    oracle's arithmetic is identical).  Groups where either arm has
    < 2 observations are dropped.

    Scale shape: ONE conditional keyed aggregate (six map-side
    sums); scan-once, |groups|-sized output.
    """
    group_cols = list(group_cols)
    a = F.col(arm_col).cast("int")
    y = F.col(y_col).cast("double")
    rows = df.where(y.isNotNull())
    na = F.sum(F.when(a == 0, 1).otherwise(0)).cast("double")
    nb = F.sum(F.when(a == 1, 1).otherwise(0)).cast("double")
    sa = F.sum(F.when(a == 0, y).otherwise(0.0))
    sb = F.sum(F.when(a == 1, y).otherwise(0.0))
    ssa = F.sum(F.when(a == 0, y * y).otherwise(0.0))
    ssb = F.sum(F.when(a == 1, y * y).otherwise(0.0))
    g = rows.groupBy(*group_cols).agg(
        na.alias("_na"), nb.alias("_nb"), sa.alias("_sa"),
        sb.alias("_sb"), ssa.alias("_ssa"), ssb.alias("_ssb"),
    )
    n_a, n_b = F.col("_na"), F.col("_nb")
    ma, mb = F.col("_sa") / n_a, F.col("_sb") / n_b
    va = F.col("_ssa") - n_a * ma * ma
    vb = F.col("_ssb") - n_b * mb * mb
    pooled = (va + vb) / (n_a + n_b - 2)
    mde = (F.lit(z_alpha) + F.lit(z_power)) * F.sqrt(
        F.greatest(pooled, F.lit(0.0)) * (1 / n_a + 1 / n_b)
    )
    return g.where((n_a >= 2) & (n_b >= 2)).select(
        *group_cols,
        n_a.cast("long").alias("n_a"),
        n_b.cast("long").alias("n_b"),
        (F.round(F.sqrt(F.greatest(pooled, F.lit(0.0))), round_to) + F.lit(0.0)).alias("sd_pooled"),
        (F.round(mde, round_to) + F.lit(0.0)).alias("mde"),
    )


def anova_oneway(
    df: DataFrame,
    group_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """One-way ANOVA decomposition (Fisher 1925, public literature):
    between/within sums of squares for ``y_col`` across the levels
    of ``group_col``, with

        eta² = SSB / (SSB + SSW)        (effect-size share)
        F    = (SSB/(k-1)) / (SSW/(N-k))

    — the "does this factor matter at all" screen (day-of-week
    seasonality strength, cell-site heterogeneity) that precedes any
    per-level modeling.  One row out: k, n, ss_between, ss_within,
    eta_sq, f_stat.  Degenerate cases (k < 2 or N <= k) are dropped.

    Scale shape: ONE keyed aggregate to |levels| groups (three
    map-side sums each), grand totals as unpartitioned window sums
    over that frame, and a final |levels|-sized reduce; the fact
    table is scanned exactly once.  SSW is
    computed per level as Σy² - n·ȳ² (no second residual pass).
    """
    y = F.col(y_col).cast("double")
    cells = (
        df.where(y.isNotNull())
        .groupBy(F.col(group_col).alias("_g"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("_n"),
            F.sum(y).alias("_s"),
            F.sum(y * y).alias("_ss"),
        )
    )
    # grand totals as UNPARTITIONED window sums over the |levels|-row
    # frame (the former agg->crossJoin scalar re-ran the cells
    # aggregate and scanned the fact table twice — .explain-verified)
    from pyspark.sql import Window

    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    j = (
        cells.withColumn("_nt", F.sum("_n").over(w_all))
        .withColumn("_st", F.sum("_s").over(w_all))
        .withColumn("_k", F.count(F.lit(1)).over(w_all).cast("double"))
    )
    gm = F.col("_st") / F.col("_nt")
    m = F.col("_s") / F.col("_n")
    ssb_term = F.col("_n") * (m - gm) * (m - gm)
    ssw_term = F.col("_ss") - F.col("_n") * m * m
    g = j.agg(
        F.first("_k").alias("_k"),
        F.first("_nt").alias("_nt"),
        F.sum(ssb_term).alias("_ssb"),
        F.sum(ssw_term).alias("_ssw"),
    )
    k, n = F.col("_k"), F.col("_nt")
    ssb, ssw = F.col("_ssb"), F.col("_ssw")
    eta = F.when(ssb + ssw > 0, ssb / (ssb + ssw)).otherwise(F.lit(0.0))
    fstat = F.when(ssw > 0, (ssb / (k - 1)) / (ssw / (n - k)))
    return g.where((k >= 2) & (n > k)).select(
        k.cast("long").alias("k"),
        n.cast("long").alias("n"),
        (F.round(ssb, round_to) + F.lit(0.0)).alias("ss_between"),
        (F.round(ssw, round_to) + F.lit(0.0)).alias("ss_within"),
        (F.round(eta, round_to) + F.lit(0.0)).alias("eta_sq"),
        (F.round(fstat, round_to) + F.lit(0.0)).alias("f_stat"),
    )


def welch_t(
    df: DataFrame,
    arm_col: str,
    y_col: str,
    arm_a: str | int,
    arm_b: str | int,
    round_to: int = 6,
) -> DataFrame:
    """Welch's unequal-variance t-test (Welch 1947, public
    literature) for the mean of ``y_col`` between two arms — the
    default two-sample comparison when variances differ (they always
    do in telemetry):

        t  = (m_b - m_a) / sqrt(v_a/n_a + v_b/n_b)
        df = (v_a/n_a + v_b/n_b)^2
             / ((v_a/n_a)^2/(n_a-1) + (v_b/n_b)^2/(n_b-1))

    p-value is the large-sample NORMAL approximation 2*sf(|t|)
    (A&S 26.2.17, shared with msprt_test) — at the n where an A/B
    readout matters the Student-t correction is < 1e-3, and the
    normal keeps the oracle expressible in portable SQL.

    Determinism contract: per-arm mean and sample variance are
    rounded to ``round_to`` FIRST, and t / df / p are pure scalar
    math over the rounded inputs — so engine and oracle agree
    bit-for-bit regardless of aggregation order.

    One row out: n_a, n_b, mean_a, mean_b, var_a, var_b, t, df_welch,
    p_value.  Degenerate (either arm n < 2) rows are dropped.

    Scale shape: ONE conditional aggregate over the fact scan (six
    map-side sums); everything after is a 1-row select.  No shuffle
    beyond the global aggregate's single exchange.
    """
    y = F.col(y_col).cast("double")
    in_a = F.col(arm_col) == F.lit(arm_a)
    in_b = F.col(arm_col) == F.lit(arm_b)
    g = df.where(y.isNotNull() & (in_a | in_b)).agg(
        F.sum(F.when(in_a, 1).otherwise(0)).cast("double").alias("_na"),
        F.sum(F.when(in_b, 1).otherwise(0)).cast("double").alias("_nb"),
        F.sum(F.when(in_a, y).otherwise(0.0)).alias("_sa"),
        F.sum(F.when(in_b, y).otherwise(0.0)).alias("_sb"),
        F.sum(F.when(in_a, y * y).otherwise(0.0)).alias("_qa"),
        F.sum(F.when(in_b, y * y).otherwise(0.0)).alias("_qb"),
    )
    na, nb = F.col("_na"), F.col("_nb")
    # sample variance via Σy² - n·ȳ², same single-pass identity as
    # anova_oneway; rounded (with -0.0 normalized) before any reuse
    ma = F.round(F.col("_sa") / na, round_to) + F.lit(0.0)
    mb = F.round(F.col("_sb") / nb, round_to) + F.lit(0.0)
    va = (
        F.round(
            (F.col("_qa") - F.col("_sa") * F.col("_sa") / na) / (na - 1),
            round_to,
        )
        + F.lit(0.0)
    )
    vb = (
        F.round(
            (F.col("_qb") - F.col("_sb") * F.col("_sb") / nb) / (nb - 1),
            round_to,
        )
        + F.lit(0.0)
    )
    pre = g.where((na >= 2) & (nb >= 2)).select(
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        ma.alias("mean_a"),
        mb.alias("mean_b"),
        va.alias("var_a"),
        vb.alias("var_b"),
    )
    sea = F.col("var_a") / F.col("n_a")
    seb = F.col("var_b") / F.col("n_b")
    se2 = sea + seb
    t = (F.col("mean_b") - F.col("mean_a")) / F.sqrt(se2)
    dfw = (se2 * se2) / (
        sea * sea / (F.col("n_a") - 1) + seb * seb / (F.col("n_b") - 1)
    )
    p = F.least(F.lit(1.0), 2.0 * normal_sf(F.abs(t)))
    return pre.where(se2 > 0).select(
        "n_a",
        "n_b",
        "mean_a",
        "mean_b",
        "var_a",
        "var_b",
        (F.round(t, round_to) + F.lit(0.0)).alias("t"),
        (F.round(dfw, round_to) + F.lit(0.0)).alias("df_welch"),
        (F.round(p, round_to) + F.lit(0.0)).alias("p_value"),
    )


def ucb1_readout(
    df: DataFrame,
    arm_col: str,
    reward_col,
    round_to: int = 6,
) -> DataFrame:
    """UCB1 index computation (Auer, Cesa-Bianchi & Fischer 2002,
    "Finite-time Analysis of the Multiarmed Bandit Problem", public
    literature) over a logged pull history: per arm

        ucb = mean_reward + sqrt(2 * ln(t) / n)

    with t = total pulls across arms — the batch replay every bandit
    deployment runs to decide the NEXT allocation from the reward
    log so far.  ``reward_col`` is a Column expression expected in
    [0, 1] (the UCB1 boundedness assumption; clamp upstream).

    Determinism contract: mean_reward is rounded to ``round_to``
    first and the index is scalar math over it; ``best`` marks the
    max-index arm comparing ROUNDED indexes with lexicographic
    arm-name tie-break, so engine and oracle cannot diverge on ulp
    ties (the pq_codes sqrt-rank lesson).  The bit-exact guarantee is
    Spark<->DuckDB (both round HALF_UP on the accumulated double);
    a plain-Python replay using half-even round() may differ by
    exactly one unit of the last rounded decimal when the true mean
    sits on the rounding boundary — parity vs Python is therefore
    ±10^-round_to, not exact (round-7 verdict finding).

    Output: one row per arm (arm, n_pulls, mean_reward, ucb_index,
    best).

    Scale shape: one keyed aggregate to |arms| rows, then t = total
    pulls as an UNPARTITIONED window sum over that |arms|-row frame
    (NOT an agg->crossJoin scalar, which re-runs the aggregate
    subtree and scans the pull log twice — .explain-verified), plus
    the |arms|-sized rank window; the log is scanned ONCE however
    large it grows.
    """
    from pyspark.sql import Window
    r = reward_col if not isinstance(reward_col, str) else F.col(reward_col)
    r = r.cast("double")
    arms = (
        df.where(r.isNotNull())
        .groupBy(F.col(arm_col).alias("arm"))
        .agg(
            F.count(F.lit(1)).cast("double").alias("_n"),
            F.sum(r).alias("_s"),
        )
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    j = arms.withColumn("_t", F.sum("_n").over(w_all))
    mean = F.round(F.col("_s") / F.col("_n"), round_to) + F.lit(0.0)
    scored = j.select(
        "arm",
        F.col("_n").cast("long").alias("n_pulls"),
        mean.alias("mean_reward"),
        (
            F.round(
                mean + F.sqrt(2.0 * F.log(F.col("_t")) / F.col("_n")),
                round_to,
            )
            + F.lit(0.0)
        ).alias("ucb_index"),
    )
    # global (unpartitioned) rank is fine: the frame is |arms| rows
    w = Window.orderBy(F.col("ucb_index").desc(), F.col("arm").asc())
    return scored.select(
        "*",
        F.when(F.row_number().over(w) == 1, 1)
        .otherwise(0)
        .cast("int")
        .alias("best"),
    )
