"""Customer-base analytics: RFM segmentation and weekly growth
accounting — the subscriber-lifecycle layer next to the engagement
ratio (`telecom.py::dau_wau_stickiness`) and cohort retention
(`funnel.py`).

The reference models subscribers generating traffic
(`/root/reference/src/main/scala/traffic`); these operators answer
the lifecycle questions a subscriber-base owner asks of that
activity: who are the high-value actives (RFM — the
recency/frequency/monetary segmentation direct marketing
standardized, Hughes 1994), and is the base growing or churning
(growth accounting: new / retained / resurrected / churned per
week — the SaaS-metrics decomposition where the four classes
partition each week's actives and last week's leavers).

Determinism: RFM scores come from exact interpolating quantile
boundaries (the decile_bins pattern) — scores are "1 + #boundaries
<= metric", so no rank tie-break is ever needed; boundaries AND
metrics are pre-rounded so both engines compare identical doubles.
Growth accounting is pure set logic on (user, week) — integers and
timestamps only.

Scale shape: RFM is one keyed aggregate (customer-sized) + a 1-row
boundary aggregate broadcast back — the fact table is never
shuffled twice and no global sort exists (ntile over all customers
would be a single task; the boundary fold is scan-side).  Growth
accounting is one distinct-reducing aggregate + per-user ordered
windows over the user's WEEK table (weeks-per-user-sized) + two
weeks-sized aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rfm_scores(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    amount_col: str,
    n_bins: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """RFM segmentation: per key, quantile scores 1..``n_bins`` for
    Recency (days of the LAST activity since the fixed 1992-01-01
    origin — higher = more recent), Frequency (activity count) and
    Monetary (amount sum), plus the concatenated segment label
    ("555" = recent, frequent, big spender).

    Scores are "1 + #boundaries <= metric" over the exact
    interpolating (k/n_bins)-quantile boundaries of each metric —
    the decile_bins pattern: deterministic without any rank
    tie-break, boundaries broadcast, no global sort.  R and F are
    integers (exact in both engines); M and its boundaries are
    rounded to ``round_to`` before comparison.

    Returns (key, last_day, n_acts, monetary, r_score, f_score,
    m_score, rfm).
    """
    qs = [i / n_bins for i in range(1, n_bins)]
    per_key = df.groupBy(F.col(key_col).alias("key")).agg(
        F.datediff(F.max(ts_col), F.lit("1992-01-01").cast("date"))
        .cast("long")
        .alias("last_day"),
        F.count(F.lit(1)).cast("long").alias("n_acts"),
        (F.round(F.sum(amount_col), round_to) + F.lit(0.0)).alias(
            "monetary"
        ),
    )
    bounds = per_key.agg(
        F.percentile(
            "last_day", F.array(*[F.lit(q) for q in qs])
        ).alias("_rb"),
        F.percentile("n_acts", F.array(*[F.lit(q) for q in qs])).alias(
            "_fb"
        ),
        F.transform(
            F.percentile(
                "monetary", F.array(*[F.lit(q) for q in qs])
            ),
            lambda b: F.round(b, round_to),
        ).alias("_mb"),
    )

    def score(metric, bs):
        return (
            1
            + F.aggregate(
                F.col(bs),
                F.lit(0),
                lambda acc, b: acc
                + F.when(b <= metric, 1).otherwise(0),
            )
        ).cast("long")

    r = score(F.col("last_day").cast("double"), "_rb")
    f = score(F.col("n_acts").cast("double"), "_fb")
    m = score(F.col("monetary"), "_mb")
    return per_key.crossJoin(F.broadcast(bounds)).select(
        "key",
        "last_day",
        "n_acts",
        "monetary",
        r.alias("r_score"),
        f.alias("f_score"),
        m.alias("m_score"),
        F.concat_ws(
            "",
            r.cast("string"),
            f.cast("string"),
            m.cast("string"),
        ).alias("rfm"),
    )


def growth_accounting(
    df: DataFrame,
    user_col: str,
    ts_col: str,
) -> DataFrame:
    """Weekly growth accounting: decompose each week's activity into
    new (first-ever week), retained (also active the immediately
    preceding week), resurrected (active some earlier week, but not
    the preceding one), and churned (active the PRECEDING week,
    absent this week — attributed to the week they went missing).
    The identity actives(w) = new + retained + resurrected and
    churned(w) = actives(w-1) − retained(w) is the standard
    SaaS-metrics decomposition; a churn week one past the last
    observed activity is emitted honestly (that cohort HAS churned).

    Physical shape: one (user, week) distinct-reducing aggregate,
    ONE per-user ordered window over the user's week table
    (weeks-per-user-sized) computing lag/min in a single pass, then
    weeks-sized aggregates outer-joined on week.

    Returns (week, n_active, n_new, n_retained, n_resurrected,
    n_churned) — churn-only weeks carry zero actives.
    """
    wk = df.select(
        F.col(user_col).alias("_u"),
        F.date_trunc("week", ts_col).alias("week"),
    ).distinct()
    w = Window.partitionBy("_u").orderBy("week")
    seven = F.expr("INTERVAL 7 DAYS")
    flagged = wk.select(
        "_u",
        "week",
        F.lag("week").over(w).alias("_prev"),
        F.lead("week").over(w).alias("_next"),
        F.min("week").over(
            Window.partitionBy("_u")
        ).alias("_first"),
    )
    status = flagged.select(
        "week",
        F.when(F.col("week") == F.col("_first"), "new")
        .when(F.col("_prev") == F.col("week") - seven, "retained")
        .otherwise("resurrected")
        .alias("_st"),
        # this row also decides churn: no activity next week
        (
            F.col("_next").isNull()
            | (F.col("_next") > F.col("week") + seven)
        ).alias("_churns"),
    )
    actives = status.groupBy("week").agg(
        F.count(F.lit(1)).cast("long").alias("n_active"),
        F.sum(F.when(F.col("_st") == "new", 1).otherwise(0))
        .cast("long")
        .alias("n_new"),
        F.sum(F.when(F.col("_st") == "retained", 1).otherwise(0))
        .cast("long")
        .alias("n_retained"),
        F.sum(F.when(F.col("_st") == "resurrected", 1).otherwise(0))
        .cast("long")
        .alias("n_resurrected"),
    )
    churned = (
        status.where("_churns")
        .groupBy((F.col("week") + seven).alias("week"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_churned"))
    )
    return (
        actives.join(churned, "week", "full_outer")
        .na.fill(
            0,
            [
                "n_active",
                "n_new",
                "n_retained",
                "n_resurrected",
                "n_churned",
            ],
        )
    )
