"""Survival analysis: Kaplan-Meier product-limit estimator (Kaplan &
Meier 1958, public literature) — retention/churn with CENSORING,
which the naive cohort-retention curve (operators/funnel.py::
cohort_retention) cannot express: a user still active at the end of
the observation window hasn't churned, they're censored, and
dropping or death-counting them biases the curve.

Scale shape: one keyed aggregate collapses subjects to the DISTINCT
duration grid (d_t deaths + c_t censored per time), then every
window runs over that grid — bounded by distinct durations, never
subject count (the same distinct-frame trick as
percentile_normalize).  The subject table is touched once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier(
    df: DataFrame,
    duration_col: str,
    observed_col: str,
) -> DataFrame:
    """Product-limit survival curve.  ``duration_col``: time to event
    or to censoring; ``observed_col``: boolean, True = the event
    (churn/death) happened at that time, False = censored there.

    Returns one row per distinct duration with at least one death:
    (t, at_risk, deaths, survival) where survival = Π_{t_i <= t}
    (1 - d_i / n_i), rounded to 6.  Once survival hits exactly 0
    (a time where everyone at risk dies) it stays 0.

    The estimator's convention: subjects censored at t are still at
    risk AT t (they leave after), matching lifelines/R survfit.

    SCALE NOTE: the curve windows are global-ordered over the
    DISTINCT duration grid.  Quantize continuous durations upstream
    (days/hours — the standard reporting grain) so the grid stays
    thousands of rows regardless of subject count; with raw
    float durations the grid degenerates to subject cardinality and
    the ordered window becomes the single-task wall this operator
    otherwise avoids.
    """
    d = F.col(duration_col).cast("double")
    grid = (
        df.where(d.isNotNull())
        .groupBy(d.alias("t"))
        .agg(
            F.sum(
                F.when(F.col(observed_col), 1).otherwise(0)
            ).alias("deaths"),
            F.count(F.lit(1)).alias("arrivals"),
        )
    )
    w_after = (
        Window.orderBy("t").rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    w_upto = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # at_risk(t) = subjects with duration >= t = suffix sum of arrivals
    curve = (
        grid.withColumn("at_risk", F.sum("arrivals").over(w_after))
        .withColumn(
            "_dead_all", (F.col("deaths") >= F.col("at_risk")).cast("int")
        )
        .withColumn("_zeroed", F.max("_dead_all").over(w_upto))
        .withColumn(
            "_lnf",
            F.when(
                F.col("deaths") < F.col("at_risk"),
                F.log(1.0 - F.col("deaths") / F.col("at_risk")),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "survival",
            F.when(F.col("_zeroed") == 1, F.lit(0.0)).otherwise(
                F.round(F.exp(F.sum("_lnf").over(w_upto)), 6) + F.lit(0.0)
            ),
        )
    )
    return (
        curve.where(F.col("deaths") > 0)
        .select(
            "t",
            F.col("at_risk").cast("long").alias("at_risk"),
            F.col("deaths").cast("long").alias("deaths"),
            "survival",
        )
    )


def nelson_aalen(
    df: DataFrame,
    duration_col: str,
    observed_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Nelson-Aalen cumulative-hazard estimator (Nelson 1972 / Aalen
    1978, public literature) — the additive companion to
    :func:`kaplan_meier`:

        H(t)      = Σ_{t_i <= t} d_i / n_i
        var(H(t)) = Σ_{t_i <= t} d_i / n_i²    (Klein 1991 form)

    Returns one row per distinct duration with >= 1 death:
    (t, at_risk, deaths, cum_hazard, se) rounded to 6.  H is the
    quantity that ADDS across strata and whose slope is the hazard
    rate itself (flat = constant churn; steepening = accelerating) —
    the readout the exponential-fit in retention_decay approximates.

    Same conventions and SCALE NOTE as kaplan_meier: censored-at-t
    subjects are still at risk AT t; durations should be quantized
    upstream so the ordered window runs over a reporting-grain grid,
    not subject cardinality.
    """
    d = F.col(duration_col).cast("double")
    grid = (
        df.where(d.isNotNull())
        .groupBy(d.alias("t"))
        .agg(
            F.sum(
                F.when(F.col(observed_col), 1).otherwise(0)
            ).alias("deaths"),
            F.count(F.lit(1)).alias("arrivals"),
        )
    )
    w_after = Window.orderBy("t").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    w_upto = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    nr = F.col("at_risk").cast("double")
    curve = (
        grid.withColumn("at_risk", F.sum("arrivals").over(w_after))
        .withColumn("_h", F.col("deaths") / nr)
        .withColumn("_v", F.col("deaths") / (nr * nr))
        .withColumn("cum_hazard", F.sum("_h").over(w_upto))
        .withColumn("se", F.sqrt(F.sum("_v").over(w_upto)))
    )
    return curve.where(F.col("deaths") > 0).select(
        "t",
        F.col("at_risk").cast("long").alias("at_risk"),
        F.col("deaths").cast("long").alias("deaths"),
        (F.round("cum_hazard", round_to) + F.lit(0.0)).alias("cum_hazard"),
        (F.round("se", round_to) + F.lit(0.0)).alias("se"),
    )


def logrank_test(
    df: DataFrame,
    duration_col: str,
    observed_col: str,
    group_col: str,
    group_a,
    group_b,
    round_to: int = 6,
) -> DataFrame:
    """Two-group log-rank test (Mantel 1966 / Peto 1972, public
    literature) — the standard nonparametric comparison of two
    survival curves, completing the KM / Nelson-Aalen family: at each
    distinct death time t,

        E_a(t) = d_t * n_a(t) / n(t)
        V(t)   = d_t * (n_a/n) * (n_b/n) * (n - d_t) / (n - 1)

    and the statistic is chi2 = (O_a - E_a)^2 / V with 1 df
    (O_a = Sigma d_a(t), E_a = Sigma E_a(t), V = Sigma V(t)); V terms
    at times with n(t) < 2 are zero by convention.  The p-value uses
    P(chi2_1 > c) = 2 * P(Z > sqrt(c)) through the shared A&S
    normal_sf, so the oracle reproduces it in portable SQL.

    Censoring convention matches kaplan_meier / nelson_aalen:
    censored-at-t subjects are still at risk AT t.

    Determinism contract: O/E/V are rounded to ``round_to`` FIRST and
    chi2 / z / p are pure scalar math over the rounded one-row inputs
    (the welch_t convention).

    One row out: n_a, n_b, deaths_a, deaths_b, expected_a, var_lr,
    chi2, p_value.

    Scale shape (same as nelson_aalen): ONE keyed aggregate to the
    |distinct durations| grid, ONE ordered window pass computing both
    groups' at-risk counts via the suffix-sum trick (group sizes ride
    along as unbounded window sums — no second scan of the subject
    table, no scalar crossJoin), then a 1-row reduce.  Quantize durations upstream to a reporting grain so the
    window frame is grid-sized, not subject-sized.
    """
    d = F.col(duration_col).cast("double")
    in_a = F.col(group_col) == F.lit(group_a)
    in_b = F.col(group_col) == F.lit(group_b)
    obs = F.col(observed_col)
    grid = (
        df.where(d.isNotNull() & (in_a | in_b))
        .groupBy(d.alias("t"))
        .agg(
            F.sum(F.when(in_a & obs, 1).otherwise(0)).alias("d1"),
            F.sum(F.when(in_b & obs, 1).otherwise(0)).alias("d2"),
            F.sum(F.when(in_a, 1).otherwise(0)).alias("c1"),
            F.sum(F.when(in_b, 1).otherwise(0)).alias("c2"),
        )
    )
    w_after = Window.orderBy("t").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    # group sizes = at-risk at the earliest time = the full suffix
    # sum; computed as an unbounded window over the SAME grid frame
    # (an agg->crossJoin scalar here would re-run the grid aggregate
    # and scan the subject table twice — .explain-verified)
    w_all = Window.orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    n1 = F.sum("c1").over(w_after).cast("double")
    n2 = F.sum("c2").over(w_after).cast("double")
    terms = grid.select(
        "t",
        "d1",
        "d2",
        n1.alias("n1"),
        n2.alias("n2"),
        F.sum("c1").over(w_all).cast("long").alias("_na"),
        F.sum("c2").over(w_all).cast("long").alias("_nb"),
    ).where(F.col("d1") + F.col("d2") > 0)
    nt = F.col("n1") + F.col("n2")
    dt = (F.col("d1") + F.col("d2")).cast("double")
    e1 = dt * F.col("n1") / nt
    v1 = F.when(
        nt > 1,
        dt
        * (F.col("n1") / nt)
        * (F.col("n2") / nt)
        * (nt - dt)
        / (nt - 1),
    ).otherwise(F.lit(0.0))
    j = terms.agg(
        F.first("_na").alias("n_a"),
        F.first("_nb").alias("n_b"),
        F.sum("d1").cast("long").alias("deaths_a"),
        F.sum("d2").cast("long").alias("deaths_b"),
        (F.round(F.sum(e1), round_to) + F.lit(0.0)).alias("expected_a"),
        (F.round(F.sum(v1), round_to) + F.lit(0.0)).alias("var_lr"),
    )
    z = (F.col("deaths_a") - F.col("expected_a")) / F.sqrt(F.col("var_lr"))
    chi2 = z * z
    from .experiment import normal_sf

    p = F.least(F.lit(1.0), 2.0 * normal_sf(F.abs(z)))
    return j.where(F.col("var_lr") > 0).select(
        "n_a",
        "n_b",
        "deaths_a",
        "deaths_b",
        "expected_a",
        "var_lr",
        (F.round(chi2, round_to) + F.lit(0.0)).alias("chi2"),
        (F.round(p, round_to) + F.lit(0.0)).alias("p_value"),
    )
