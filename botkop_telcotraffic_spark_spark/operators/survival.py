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
