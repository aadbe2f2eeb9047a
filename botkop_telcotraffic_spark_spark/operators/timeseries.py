"""Time-series densification: gap filling over regular buckets.

The reference's windowed pipelines silently skip empty windows (a
DStream batch with no events for a key emits nothing —
``MetricStatsProducer.scala:16-36`` only sees arriving records).
Serving layers usually want explicit zero/null rows for the gaps;
this operator synthesizes them declaratively.

Scale shape: the bucket spine is generated per key from that key's
own [min, max] range with ``sequence()`` + ``explode`` — scan-side,
no driver loop, no global calendar table.  One shuffle for the
per-(key, bucket) aggregate and one keyed join of spine↔aggregate
(both sides hash on the same key, AQE picks the strategy).  Spine
size is bounded by span/step per key; a key with a pathological
span surfaces as data (cap with an explicit horizon filter), never
as driver memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_counts(
    df: DataFrame,
    key: str,
    ts_col: str,
    step: str = "1 hour",
    value_col: str | None = None,
) -> DataFrame:
    """Per-key, per-bucket event counts (and optional value sums)
    with explicit zero rows for empty buckets between each key's
    first and last event.

    Returns (key, bucket_start, n_events[, sum_value]).
    """
    bucket = F.date_trunc("hour", F.col(ts_col)) if step == "1 hour" else F.window(
        F.col(ts_col), step
    ).start
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(F.sum(value_col).alias("sum_value"))
    per_bucket = (
        df.select(F.col(key), bucket.alias("bucket_start"), *( [F.col(value_col)] if value_col else [] ))
        .groupBy(key, "bucket_start")
        .agg(*aggs)
    )
    spine = (
        per_bucket.groupBy(key)
        .agg(
            F.min("bucket_start").alias("_lo"),
            F.max("bucket_start").alias("_hi"),
        )
        .select(
            key,
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.expr(f"INTERVAL {step}"))
            ).alias("bucket_start"),
        )
    )
    filled = spine.join(per_bucket, [key, "bucket_start"], "left_outer").select(
        key,
        "bucket_start",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        *(
            [F.coalesce("sum_value", F.lit(0.0)).alias("sum_value")]
            if value_col
            else []
        ),
    )
    return filled


def resample_locf(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    round_digits: int = 4,
) -> DataFrame:
    """Regular resample with last-observation-carried-forward: per-key
    bucket averages of ``value_col``, densified over the key's own
    [first, last] range, with empty buckets inheriting the most recent
    observed bucket's (rounded) average.

    Returns (key, bucket_start, n_events, locf_value).

    The per-bucket average is rounded BEFORE the forward fill so the
    carried value is bit-stable regardless of aggregation order.
    Scale shape matches ``gap_fill_counts`` (scan-side spine, one agg
    shuffle, one keyed join); the fill itself is one window pass
    partitioned by the key — ``last(ignorenulls)`` over an
    already-densified, per-key-bounded frame."""
    bucket = (
        F.date_trunc("hour", F.col(ts_col))
        if step == "1 hour"
        else F.window(F.col(ts_col), step).start
    )
    per = (
        df.select(F.col(key), bucket.alias("bucket_start"), F.col(value_col))
        .groupBy(key, "bucket_start")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg(value_col), round_digits).alias("_avg_v"),
        )
    )
    spine = (
        per.groupBy(key)
        .agg(
            F.min("bucket_start").alias("_lo"),
            F.max("bucket_start").alias("_hi"),
        )
        .select(
            key,
            F.explode(
                F.sequence(F.col("_lo"), F.col("_hi"), F.expr(f"INTERVAL {step}"))
            ).alias("bucket_start"),
        )
    )
    w = (
        Window.partitionBy(key)
        .orderBy("bucket_start")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(per, [key, "bucket_start"], "left_outer")
        .select(
            key,
            "bucket_start",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("_avg_v", ignorenulls=True).over(w).alias("locf_value"),
        )
    )


def trend_ols(
    df: DataFrame,
    key_cols: list[str],
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-key simple linear regression (closed form) — slope,
    intercept and r² of ``y ~ x`` for every key group, in ONE keyed
    aggregate.

    The normal equations need only the five sufficient statistics
    (n, Σx, Σy, Σxy, Σx²) plus Σy² for r² — a mergeable monoid like
    ``stat_partials``, so the map-side combine does almost all the
    work and the final shuffle carries one row of six sums per key
    regardless of input size.  No window, no second scan, no driver
    math: the closed forms

        slope = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
        intercept = (Σy − slope·Σx) / n
        r² = (nΣxy − ΣxΣy)² / ((nΣx² − (Σx)²)(nΣy² − (Σy)²))

    are column expressions over the aggregate.  Degenerate groups
    (n < 2 or zero x-variance) yield NULL slope/intercept/r² rather
    than a division error; zero y-variance (flat but fittable) yields
    r² = NULL while slope/intercept stay defined.

    Scale: x should be pre-centered to a magnitude where Σx² does not
    lose float precision (callers pass e.g. epoch-seconds relative to
    a fixed origin, not raw nanoseconds) — documented contract, the
    operator does not rescale.
    """
    rows = df.where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    x, y = F.col(x_col).cast("double"), F.col(y_col).cast("double")
    agg = rows.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.sum(x).alias("_sx"),
        F.sum(y).alias("_sy"),
        F.sum(x * y).alias("_sxy"),
        F.sum(x * x).alias("_sxx"),
        F.sum(y * y).alias("_syy"),
    )
    n, sx, sy = F.col("_n"), F.col("_sx"), F.col("_sy")
    sxy, sxx, syy = F.col("_sxy"), F.col("_sxx"), F.col("_syy")
    cov_n = n * sxy - sx * sy        # n² · cov(x, y)
    var_x = n * sxx - sx * sx        # n² · var(x)
    var_y = n * syy - sy * sy        # n² · var(y)
    slope = F.when((n >= 2) & (var_x > 0), cov_n / var_x)
    intercept = F.when(
        (n >= 2) & (var_x > 0), (sy - (cov_n / var_x) * sx) / n
    )
    r2 = F.when(
        (n >= 2) & (var_x > 0) & (var_y > 0),
        (cov_n * cov_n) / (var_x * var_y),
    )
    return agg.select(
        *key_cols,
        F.col("_n").cast("long").alias("n"),
        F.round(slope, round_to).alias("slope"),
        F.round(intercept, round_to).alias("intercept"),
        F.round(r2, round_to).alias("r2"),
    )


def autocorrelation(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    max_lag: int = 6,
    round_to: int = 6,
) -> DataFrame:
    """Per-key sample autocorrelation function at lags 1..``max_lag``
    — the seasonality/burstiness probe (a daily-periodic hourly
    series lights up at lag 24; a bursty one decays slowly from
    lag 1) complementing :func:`trend_ols` (trend) and
    :func:`seasonal_zscore` (per-slot anomalies).

    The standard biased estimator (Box-Jenkins):

        r_k = Σ_{t<=n-k} (x_t − x̄)(x_{t+k} − x̄) / Σ_t (x_t − x̄)²

    with x̄ the full-series mean — the whole-series denominator (not
    per-overlap) is what makes r_k a positive-definite sequence, and
    matches statsmodels' ``acf(adjusted=False)``.

    ``order_col`` must be unique per key (callers pass a bucketed
    time axis, e.g. the hour).  Missing buckets are NOT gap-filled
    here — compose with :func:`gap_fill_counts` upstream when the
    series has holes, otherwise lag-k pairs span the gap.

    Physical shape: one per-key ordered window producing the
    ``max_lag`` lead columns + centered terms in a single pass, then
    ONE keyed aggregate.  The per-key window is a single task over
    that key's series — bounded by the bucketed-axis contract
    (series length = time range / bucket, thousands not billions;
    same contract as resample_locf/rolling windows).  Keys with
    < max_lag + 2 points emit NULL acf at unobservable lags.

    Returns (keys, lag, n, acf) long-form, one row per key × lag.
    """
    w = Window.partitionBy(*key_cols).orderBy("_o")
    wall = Window.partitionBy(*key_cols)
    x = F.col(value_col).cast("double")
    base = df.where(x.isNotNull()).select(
        *key_cols,
        F.col(order_col).alias("_o"),
        x.alias("_x"),
        F.avg(x).over(wall).alias("_mean"),
    )
    cen = base.select(
        *key_cols,
        "_o",
        (F.col("_x") - F.col("_mean")).alias("_c"),
    )
    lead_terms = cen.select(
        *key_cols,
        F.col("_c"),
        *[
            (F.col("_c") * F.lead("_c", k).over(w)).alias(f"_t{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    agg = lead_terms.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("_c") * F.col("_c")).alias("_den"),
        *[F.sum(f"_t{k}").alias(f"_num{k}") for k in range(1, max_lag + 1)],
    )
    stack = ", ".join(f"{k}, _num{k}" for k in range(1, max_lag + 1))
    long = agg.select(
        *key_cols,
        "n",
        "_den",
        F.expr(f"stack({max_lag}, {stack}) as (lag, _num)"),
    )
    acf = F.when(
        F.col("_den") > 0, F.col("_num") / F.col("_den")
    )
    return long.select(
        *key_cols,
        "lag",
        "n",
        (F.round(acf, round_to) + F.lit(0.0)).alias("acf"),
    )


def seasonal_zscore(
    df: DataFrame,
    ts_col: str,
    key_cols: list[str],
    value_col: str,
    z_thresh: float = 2.5,
) -> DataFrame:
    """Seasonality-conditioned anomaly detection: score each row
    against the mean/stddev of its OWN (key, hour-of-day) cell and
    keep rows with ``|z| > z_thresh``.

    A global or per-key threshold (IQR/MAD operators here) flags the
    nightly batch spike every night; conditioning on the seasonal
    cell ("EV charging at 3 am") only fires when a value is unusual
    FOR THAT HOUR — the standard first model for telemetry/traffic
    monitoring, and the degenerate (profile-free) case of what the
    streaming z-score operator maintains incrementally.

    Physical shape: one scan-side aggregate to the (keys × 24)
    profile dim, then one equi-join back on (keys, hour) — both
    sides hash-partition on the same compound key, so the join is
    co-partitioned and AQE broadcasts the profile when it is tiny.
    Cells with zero variance (or a single row) score NULL and are
    never flagged.  Output is anomaly-sized, not table-sized.
    """
    hr = F.hour(F.col(ts_col)).alias("_hr")
    v = F.col(value_col).cast("double")
    prof = (
        df.select(*key_cols, hr, v.alias("_v"))
        .groupBy(*key_cols, "_hr")
        .agg(
            F.avg("_v").alias("_mu"),
            F.stddev_pop("_v").alias("_sd"),
        )
    )
    z = (v - F.col("_mu")) / F.col("_sd")
    return (
        df.withColumn("_hr", F.hour(F.col(ts_col)))
        .join(prof, [*key_cols, "_hr"])
        .where((F.col("_sd") > 0) & (F.abs(z) > z_thresh))
        .select(
            *df.columns,
            F.col("_hr").alias("hour_of_day"),
            F.round(F.col("_mu"), 6).alias("cell_mean"),
            F.round(z, 6).alias("z"),
        )
    )


def cusum_changepoint(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    value_col: str,
    tiebreak_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Offline CUSUM changepoint location (Page 1954, public
    literature): per key, the running cumulative sum of deviations
    from the key's mean, S_i = Σ_{j<=i} (v_j - mean); the most likely
    single changepoint is the position where |S_i| peaks.

    Returns per key: (key_cols..., n, cp_ts, cusum_peak) — cp_ts is
    the timestamp attaining the max |S| (earliest on rounded ties),
    cusum_peak the signed S there, rounded.

    Determinism: the running sum is evaluated in (ts, tiebreak)
    order — a sequential left-to-right accumulation both engines
    share — and the argmax ranks on the ROUNDED |S| with the
    timestamp tiebreak, so engine-ulp differences in the (unordered)
    mean cannot flip the reported position unless two peaks round
    equal, where the earlier wins on both sides.

    Scale shape: one per-key mean aggregate broadcast back (the fact
    is not shuffled for it when AQE broadcasts the tiny aggregate),
    ONE keyed sort-window for the running sum — the same shuffle
    profile as sessionization — and a per-key 1-row argmax reduce.
    Never a global window; skew follows key hotness.
    """
    v = F.col(value_col).cast("double")
    base = df.where(v.isNotNull()).select(
        *key_cols, F.col(ts_col).alias("_ts"), v.alias("_v"),
        *([F.col(tiebreak_col).alias("_tb")] if tiebreak_col else []),
    )
    means = base.groupBy(*key_cols).agg(F.avg("_v").alias("_mu"))
    wsum = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col("_ts"), *([F.col("_tb")] if tiebreak_col else []))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = base.join(F.broadcast(means), list(key_cols)).select(
        *key_cols,
        "_ts",
        *(["_tb"] if tiebreak_col else []),
        F.sum(F.col("_v") - F.col("_mu")).over(wsum).alias("_s"),
    )
    # the argmax must share the running sum's total order: without the
    # tiebreak, two rows at one timestamp with equal rounded |S| would
    # pick nondeterministically across runs/engines
    wmax = Window.partitionBy(*key_cols).orderBy(
        F.round(F.abs(F.col("_s")), round_to).desc(),
        F.col("_ts"),
        *([F.col("_tb")] if tiebreak_col else []),
    )
    counts = base.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("n"))
    peak = (
        cum.withColumn("_rk", F.row_number().over(wmax))
        .where(F.col("_rk") == 1)
        .select(
            *key_cols,
            F.col("_ts").alias("cp_ts"),
            F.round(F.col("_s"), round_to).alias("cusum_peak"),
        )
    )
    return counts.join(peak, list(key_cols))


def interarrival_stats(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    order_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Per-key inter-arrival-time statistics: mean gap, the
    exponential-MLE rate (λ = 1/mean, the closed-form fit: arrivals
    per unit time if the process were Poisson) and the coefficient of
    variation (CV = σ/μ of the gaps) — the burstiness diagnostic
    (CV ≈ 1 Poisson, CV ≫ 1 bursty/self-exciting, CV ≪ 1
    regular/heartbeat).  The arrival-process companion to
    :func:`autocorrelation`'s value-series view — telco traffic
    profiling 101 (is this event type machine-heartbeat or
    human-bursty?).

    Gaps are epoch-second differences of consecutive events per key,
    ordered by (``ts_col``, *order_cols*) — extra columns break
    timestamp ties so ``lag`` is well-defined; the gap MULTISET is
    tie-order-invariant anyway (permuting equal timestamps permutes
    which rows pair but not the resulting gap values), so the
    aggregate is deterministic.

    Physical shape: one per-key ordered window (single pass), one
    keyed aggregate of the gap sufficient statistics (map-side
    combined).  Per-key window is a single task over that key's
    events — callers key by a bounded-cardinality dimension
    (event_type, cell tower), not by a key with unbounded per-key
    volume, or pre-bucket time; documented contract shared with the
    rolling-window family.

    Returns (keys, n_gaps, mean_gap_s, lambda_per_s, cv) — keys with
    < 2 events have no gap and are omitted.
    """
    tie_cols = list(order_cols or [])
    w = Window.partitionBy(*key_cols).orderBy("_t", *tie_cols)
    gaps = (
        df.select(
            *key_cols,
            F.col(ts_col).cast("double").alias("_t"),
            *tie_cols,
        )
        .withColumn("_gap", F.col("_t") - F.lag("_t").over(w))
        .where(F.col("_gap").isNotNull())
    )
    agg = gaps.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.avg("_gap").alias("_mu"),
        F.stddev_pop("_gap").alias("_sigma"),
    )
    mu = F.col("_mu")
    return agg.select(
        *key_cols,
        "n_gaps",
        (F.round(mu, round_to) + F.lit(0.0)).alias("mean_gap_s"),
        (
            F.round(F.when(mu > 0, F.lit(1.0) / mu), round_to)
            + F.lit(0.0)
        ).alias("lambda_per_s"),
        (
            F.round(
                F.when(mu > 0, F.col("_sigma") / mu), round_to
            )
            + F.lit(0.0)
        ).alias("cv"),
    )


def theil_sen(
    df: DataFrame,
    key_cols: list[str],
    x_col: str,
    y_col: str,
    max_pair_lag: int = 24,
    round_to: int = 6,
) -> DataFrame:
    """Per-key Theil-Sen robust trend: the MEDIAN of pairwise slopes
    (y_j − y_i)/(x_j − x_i) — the outlier-proof companion to
    :func:`trend_ols` (OLS slope has breakdown point 0: one corrupted
    point moves it arbitrarily; the slope-median tolerates ~29%
    corruption).

    WINDOWED-pair variant, and the contract says so: full Theil-Sen
    is all C(n,2) pairs — quadratic, the same shape this repo refuses
    everywhere else.  Pairs are restricted to points ≤
    ``max_pair_lag`` apart in x-rank, which (a) bounds work at
    n·``max_pair_lag`` rows per key, and (b) is itself a published
    robustness/efficiency trade (nearby-pair slope medians; cf.
    Siegel's repeated-median line of work on bounded-pair robust
    slopes).  All ``max_pair_lag`` lead columns come from ONE ordered
    window pass — no self-join.

    The median is ``percentile(0.5)`` (linear interpolation — the
    same estimator as DuckDB's ``quantile_cont``, so an oracle
    matches exactly up to rounding).  The intercept is the classic
    median of residuals y_i − m̂·x_i, one key-sized join + one more
    percentile aggregate.

    Degenerate pairs (equal x) are skipped; keys with no valid pair
    are omitted.  Returns (keys, n_pairs, slope, intercept).
    """
    w = Window.partitionBy(*key_cols).orderBy("_x")
    base = df.where(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).select(
        *key_cols,
        F.col(x_col).cast("double").alias("_x"),
        F.col(y_col).cast("double").alias("_y"),
    )
    led = base.select(
        *key_cols,
        "_x",
        "_y",
        *[
            F.when(
                F.lead("_x", k).over(w) != F.col("_x"),
                (F.lead("_y", k).over(w) - F.col("_y"))
                / (F.lead("_x", k).over(w) - F.col("_x")),
            ).alias(f"_s{k}")
            for k in range(1, max_pair_lag + 1)
        ],
    )
    stack = ", ".join(f"_s{k}" for k in range(1, max_pair_lag + 1))
    slopes = led.select(
        *key_cols,
        F.expr(
            f"stack({max_pair_lag}, {stack}) as (_slope)"
        ),
    ).where(F.col("_slope").isNotNull())
    m = slopes.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.percentile("_slope", F.lit(0.5)).alias("_m"),
    )
    resid = base.join(m, key_cols).select(
        *key_cols,
        "n_pairs",
        "_m",
        (F.col("_y") - F.col("_m") * F.col("_x")).alias("_r"),
    )
    return resid.groupBy(*key_cols).agg(
        F.first("n_pairs").alias("n_pairs"),
        (F.round(F.first("_m"), round_to) + F.lit(0.0)).alias("slope"),
        (
            F.round(F.percentile("_r", F.lit(0.5)), round_to)
            + F.lit(0.0)
        ).alias("intercept"),
    )


def page_hinkley(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    delta: float = 0.0,
    lam: float = 10.0,
    round_to: int = 6,
) -> DataFrame:
    """Per-key Page-Hinkley mean-shift detector (Page 1954, Hinkley
    1971; the sequential form used by data-stream drift monitors
    such as MOA/river): the SEQUENTIAL drift test next to the
    two-sample batch family (KS/PSI/chi-square/JS) — it answers
    "WHEN did the mean move", not "do two snapshots differ".

        m_t  = mean(x_1..x_t)              (expanding mean)
        U_t  = Σ_{i<=t} (x_i − m_i − δ)    (cumulative deviation)
        PH_t = U_t − min_{i<=t} U_i        (drawup above the trough)

    An alarm fires where round(PH_t, ``round_to``) > λ — the alarm
    compares the ROUNDED statistic (cusum_changepoint's rounded-|S|
    precedent) because engines accumulate ordered-frame sums in
    different orders (running vs segment tree) and an unrounded
    boundary comparison would not be reproducible.  δ absorbs
    tolerated drift; λ trades detection delay against false alarms.

    Physical shape: THREE chained expanding-frame expressions over
    ONE per-key ordered window spec (mean, then cumsum, then cummin
    — each a separate projection step, no extra shuffle: the sort
    order is reused) + ONE keyed aggregate.  Per-key series stay
    under the bucketed-axis contract (thousands of rows per key).

    Returns (keys, n_obs, n_alarms, max_ph, first_alarm_o) —
    first_alarm_o is the ``order_col`` value of the FIRST alarmed
    row (NULL when no alarm).
    """
    w = Window.partitionBy(*key_cols).orderBy("_o")
    exp = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    x = F.col(value_col).cast("double")
    base = df.where(x.isNotNull()).select(
        *key_cols,
        F.col(order_col).cast("double").alias("_o"),
        x.alias("_x"),
    )
    m = base.withColumn("_m", F.avg("_x").over(exp))
    u = m.withColumn(
        "_u",
        F.sum(F.col("_x") - F.col("_m") - F.lit(float(delta))).over(exp),
    )
    ph = u.withColumn(
        "_ph", F.col("_u") - F.min("_u").over(exp)
    ).withColumn(
        "_alarm",
        (F.round(F.col("_ph"), round_to) > F.lit(float(lam))).cast(
            "int"
        ),
    )
    return ph.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum("_alarm").cast("long").alias("n_alarms"),
        (F.round(F.max("_ph"), round_to) + F.lit(0.0)).alias("max_ph"),
        F.min(F.when(F.col("_alarm") == 1, F.col("_o"))).alias(
            "first_alarm_o"
        ),
    )


def cross_correlation(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    x_col: str,
    y_col: str,
    max_lag: int = 6,
    round_to: int = 6,
) -> DataFrame:
    """Per-key lagged cross-correlation ccf(k) = corr(x_t, y_{t+k})
    for k = 0..``max_lag`` — the lead/lag coupling probe between two
    aligned series (does a click surge FORESHADOW an error surge k
    hours later?), the two-series companion to
    :func:`autocorrelation`.

    Pearson correlation per lag over the overlapping rows, computed
    from the 6 sufficient sums (the trend_ols monoid) so partial
    aggregation stays map-side; zero variance on either side at a
    lag answers NULL honestly.  ``order_col`` must be unique per key
    (bucketed axis — compose with gap_fill upstream when the series
    has holes, same contract as :func:`autocorrelation`).

    Physical shape: ONE per-key ordered window producing all
    ``max_lag`` + 1 lead columns in a single pass, a stack melt
    (scan-side), then ONE (key, lag) aggregate.

    Returns (keys, lag, n, ccf) long-form.
    """
    w = Window.partitionBy(*key_cols).orderBy("_o")
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    base = df.where(x.isNotNull() & y.isNotNull()).select(
        *key_cols,
        F.col(order_col).alias("_o"),
        x.alias("_x"),
        y.alias("_y"),
    )
    leads = base.select(
        *key_cols,
        "_x",
        *[
            F.lead("_y", k).over(w).alias(f"_y{k}")
            for k in range(max_lag + 1)
        ],
    )
    pairs = leads.select(
        *key_cols,
        "_x",
        F.expr(
            "stack("
            + str(max_lag + 1)
            + ", "
            + ", ".join(f"{k}, _y{k}" for k in range(max_lag + 1))
            + ") AS (lag, _yl)"
        ),
    ).where(F.col("_yl").isNotNull())
    pairs = pairs.withColumn("lag", F.col("lag").cast("long"))
    n = F.count(F.lit(1)).cast("double")
    sx, sy = F.sum("_x"), F.sum("_yl")
    sxy = F.sum(F.col("_x") * F.col("_yl"))
    sxx = F.sum(F.col("_x") * F.col("_x"))
    syy = F.sum(F.col("_yl") * F.col("_yl"))
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    ccf = F.when(
        (vx > 0) & (vy > 0),
        (n * sxy - sx * sy) / F.sqrt(vx * vy),
    )
    return pairs.groupBy(*key_cols, "lag").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.round(ccf, round_to) + F.lit(0.0)).alias("ccf"),
    )


def holt_update_sql(
    st: str, x: str, alpha: float, beta: float, dialect: str = "spark"
) -> str:
    """Dual-dialect SQL fragment for a single Holt linear (double
    exponential) smoothing step (Holt 1957, public literature): given
    state ``st`` = [level, trend] (a 2-element DOUBLE array) and
    observation ``x``, returns the updated [level', trend'] where

        level' = a*x + (1-a)*(level + trend)
        trend' = b*(level' - level) + (1-b)*trend

    level' is textually repeated inside trend' — deterministic
    recomputation keeps the fragment a pure expression so it runs
    under Spark's ``aggregate`` and DuckDB's ``list_reduce`` with
    bit-identical IEEE op sequences (the erlang_b_sql contract).
    The ``dialect`` switch changes ONLY the array-indexing syntax
    (Spark ``element_at`` is 1-based like DuckDB's ``lst[i]``; the
    arithmetic tree is character-identical), the geohash_sql
    precedent.  Literals are CAST to DOUBLE so DuckDB cannot promote
    them to DECIMAL.
    """
    if dialect == "spark":
        lv, tr = f"element_at({st}, 1)", f"element_at({st}, 2)"
    else:
        lv, tr = f"{st}[1]", f"{st}[2]"
    a = f"CAST({alpha!r} AS DOUBLE)"
    b = f"CAST({beta!r} AS DOUBLE)"
    lvl = f"({a} * {x} + (CAST(1.0 AS DOUBLE) - {a}) * ({lv} + {tr}))"
    trd = f"({b} * ({lvl} - {lv}) + (CAST(1.0 AS DOUBLE) - {b}) * {tr})"
    ctor = "array" if dialect == "spark" else "list_value"
    return f"{ctor}({lvl}, {trd})"


def holt_linear(
    df: DataFrame,
    group_cols,
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    round_to: int = 6,
) -> DataFrame:
    """Holt linear-trend (double exponential) smoothing per group:
    the classical level+trend forecaster (Holt 1957 / Winters 1960,
    public literature) every capacity-trend dashboard runs over
    daily per-cell or per-service load series.

    Initialization is the textbook one: level_0 = x_1,
    trend_0 = x_2 - x_1, then the recurrence folds over x_3..x_n.
    Output per group: ``n`` observations, final ``level`` and
    ``trend``, and ``forecast`` = level + trend (the one-step-ahead
    prediction).  Groups with < 2 observations are dropped (no trend
    is estimable).

    Cross-engine determinism: the per-step update is ONE dual-dialect
    SQL fragment (:func:`holt_update_sql`) evaluated by Spark's
    ``aggregate`` higher-order function and, verbatim, by DuckDB's
    ``list_reduce`` — fold order is the sorted ``order_col`` order on
    both sides, so the whole recurrence is bit-identical.

    Scale shape: one keyed aggregate collects each group's series
    (series are GROUP-sized — e.g. days-per-cell, bounded by the
    calendar, never data-sized); the fold is scan-side expression
    math on the aggregated relation.  The fact table is shuffled
    once, on the group key.  Interpreted (non-codegen) fold cost is
    paid once per GROUP, not per input row.
    """
    group_cols = list(group_cols)
    vals = F.transform(
        F.array_sort(
            F.collect_list(F.struct(F.col(order_col).alias("o"),
                                    F.col(value_col).alias("v")))
        ),
        lambda s: s["v"],
    )
    g = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*group_cols)
        .agg(vals.alias("_vs"))
        .where(F.size("_vs") >= 2)
    )
    step = holt_update_sql("st", "x", alpha, beta)
    fold = (
        f"aggregate(slice(_vs, 3, greatest(size(_vs) - 2, 0)), "
        f"array(_vs[0], _vs[1] - _vs[0]), (st, x) -> {step})"
    )
    st = F.expr(fold)
    return g.select(
        *group_cols,
        F.size("_vs").cast("long").alias("n"),
        (F.round(st[0], round_to) + F.lit(0.0)).alias("level"),
        (F.round(st[1], round_to) + F.lit(0.0)).alias("trend"),
        (F.round(st[0] + st[1], round_to) + F.lit(0.0)).alias("forecast"),
    )


def hw_update_sql(
    st: str,
    x: str,
    alpha: float,
    beta: float,
    gamma: float,
    period: int,
    dialect: str = "spark",
) -> str:
    """Dual-dialect fragment for one additive Holt-Winters step
    (Winters 1960, public literature) over a ROTATING state array
    ``st`` = [level, trend, s_cur, s_next, ..., s_last] (2 + period
    elements; the current phase's seasonal is always slot 3, so the
    fold never needs a position counter):

        level' = a*(x - s_cur) + (1-a)*(level + trend)
        trend' = b*(level' - level) + (1-b)*trend
        s'     = g*(x - level') + (1-g)*s_cur
        st'    = [level', trend', s_next, ..., s_last, s']

    Same determinism contract as :func:`holt_update_sql`: the
    ``dialect`` switch changes only indexing/constructor syntax, the
    arithmetic tree is character-identical, every literal is
    DOUBLE-cast, and level' is recomputed textually where reused.
    """
    if dialect == "spark":
        el = lambda i: f"element_at({st}, {i})"  # noqa: E731
        ctor = "array"
    else:
        el = lambda i: f"{st}[{i}]"  # noqa: E731
        ctor = "list_value"
    a = f"CAST({alpha!r} AS DOUBLE)"
    b = f"CAST({beta!r} AS DOUBLE)"
    g = f"CAST({gamma!r} AS DOUBLE)"
    one = "CAST(1.0 AS DOUBLE)"
    lv, tr, sc = el(1), el(2), el(3)
    lvl = f"({a} * ({x} - {sc}) + ({one} - {a}) * ({lv} + {tr}))"
    trd = f"({b} * ({lvl} - {lv}) + ({one} - {b}) * {tr})"
    snew = f"({g} * ({x} - {lvl}) + ({one} - {g}) * {sc})"
    rot = ", ".join(el(i) for i in range(4, period + 3))
    rot = (rot + ", ") if rot else ""
    return f"{ctor}({lvl}, {trd}, {rot}{snew})"


def holt_winters(
    df: DataFrame,
    group_cols,
    order_col: str,
    value_col: str,
    period: int = 7,
    alpha: float = 0.3,
    beta: float = 0.1,
    gamma: float = 0.2,
    round_to: int = 6,
) -> DataFrame:
    """Additive Holt-Winters (triple exponential) smoothing per
    group: level + trend + a ``period``-slot seasonal cycle — the
    weekly-seasonality capacity forecaster (Winters 1960, public
    literature).  Textbook simple initialization: level_0 = mean of
    the first period (a left-associated fold sum / period), trend_0
    = 0, s_i = x_i - level_0; the recurrence folds from observation
    period+1.  Groups with < period+1 observations are dropped.

    Output per group: n, level, trend, seasonal_next (the seasonal
    slot the next observation lands on) and forecast = level + trend
    + seasonal_next.

    Determinism/scale: identical contracts to :func:`holt_linear` —
    the per-step update is the shared dual-dialect fragment
    (:func:`hw_update_sql`, Spark ``aggregate`` == DuckDB
    ``list_reduce``), series are collected per GROUP (calendar-
    bounded), the fact table shuffles once on the group key.
    """
    group_cols = list(group_cols)
    vals = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(order_col).alias("o"), F.col(value_col).alias("v")
                )
            )
        ),
        lambda s: s["v"],
    )
    g = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*group_cols)
        .agg(vals.alias("_vs"))
        .where(F.size("_vs") >= period + 1)
    )
    init_sum = " + ".join(f"element_at(_vs, {i})" for i in range(1, period + 1))
    lvl0 = f"(({init_sum}) / CAST({float(period)!r} AS DOUBLE))"
    init = (
        "array(" + lvl0 + ", CAST(0.0 AS DOUBLE), "
        + ", ".join(
            f"(element_at(_vs, {i}) - {lvl0})" for i in range(1, period + 1)
        )
        + ")"
    )
    step = hw_update_sql("st", "x", alpha, beta, gamma, period, "spark")
    fold = (
        f"aggregate(slice(_vs, {period + 1}, "
        f"greatest(size(_vs) - {period}, 0)), {init}, (st, x) -> {step})"
    )
    st = F.expr(fold)
    return g.select(
        *group_cols,
        F.size("_vs").cast("long").alias("n"),
        (F.round(st[0], round_to) + F.lit(0.0)).alias("level"),
        (F.round(st[1], round_to) + F.lit(0.0)).alias("trend"),
        (F.round(st[2], round_to) + F.lit(0.0)).alias("seasonal_next"),
        (
            F.round(st[0] + st[1] + st[2], round_to) + F.lit(0.0)
        ).alias("forecast"),
    )


def burst_runs(
    df: DataFrame,
    key_cols,
    bucket_col: str,
    factor: float = 2.0,
    round_to: int = 6,
) -> DataFrame:
    """Burst detection over a pre-bucketed count series: per key,
    buckets whose event count exceeds ``factor`` x the key's mean
    bucket count are "bursty"; output counts the bursty buckets and
    the longest consecutive RUN of them (consecutiveness = adjacent
    rank in the key's bucket order) — the load-spike profile
    (flash-crowd vs steady overload) a capacity planner reads next
    to the busy hour.

    Output: (keys..., n_buckets, n_bursty, max_run, burst_share).

    The mean-threshold comparison uses the UNROUNDED mean on both
    engines (one division, deterministic from integer sums).  Scale
    shape: one keyed (key, bucket) count aggregate, one keyed mean
    re-aggregate of that cells table joined back, one window pass
    over the key's OWN bucket table (calendar-bounded) for the
    run-length — the gaps-and-islands pattern; the fact table
    shuffles once.
    """
    from pyspark.sql import Window

    key_cols = list(key_cols)
    cells = df.groupBy(*key_cols, F.col(bucket_col).alias("_b")).agg(
        F.count(F.lit(1)).cast("double").alias("_n")
    )
    means = cells.groupBy(*key_cols).agg(
        (F.sum("_n") / F.count(F.lit(1))).alias("_mu")
    )
    j = cells.join(means, key_cols).withColumn(
        "_hot", (F.col("_n") > F.lit(float(factor)) * F.col("_mu")).cast("int")
    )
    w = Window.partitionBy(*key_cols).orderBy("_b")
    # gaps-and-islands: island id = rank - hot_rank stays constant
    # within a consecutive hot run
    j = j.withColumn("_rk", F.row_number().over(w)).withColumn(
        "_hrk",
        F.sum("_hot").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    runs = (
        j.where(F.col("_hot") == 1)
        .groupBy(*key_cols, (F.col("_rk") - F.col("_hrk")).alias("_isl"))
        .agg(F.count(F.lit(1)).alias("_len"))
    )
    per_key = j.groupBy(*key_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.sum("_hot").cast("long").alias("n_bursty"),
    )
    longest = runs.groupBy(*key_cols).agg(
        F.max("_len").cast("long").alias("max_run")
    )
    return per_key.join(longest, key_cols, "left").select(
        *key_cols,
        "n_buckets",
        "n_bursty",
        F.coalesce("max_run", F.lit(0)).cast("long").alias("max_run"),
        (
            F.round(
                F.col("n_bursty").cast("double")
                / F.col("n_buckets").cast("double"),
                round_to,
            )
            + F.lit(0.0)
        ).alias("burst_share"),
    )


def holt_backtest(
    df: DataFrame,
    group_cols,
    order_col: str,
    value_col: str,
    train_frac: float = 0.8,
    alpha: float = 0.5,
    beta: float = 0.3,
    round_to: int = 6,
) -> DataFrame:
    """Time-split BACKTEST of the Holt linear forecaster: per group,
    fit on the first floor(n·train_frac) observations, forecast the
    remaining horizon as level + h·trend, and report MAE and RMSE
    against the held-out actuals — the forecast-accuracy readout
    that turns a smoother into an evaluated model (standard
    rolling-origin evaluation, Tashman 2000, public literature).

    Output: (keys..., n, train_n, horizon, mae, rmse).  Groups
    whose train split has < 2 points or whose horizon is empty are
    dropped.

    Determinism/scale: identical contracts to :func:`holt_linear` —
    the fit is the shared dual-dialect fold over the SORTED series,
    the error sums are folds over an integer horizon sequence, and
    everything runs scan-side on the calendar-bounded aggregated
    relation (one shuffle on the group key).
    """
    group_cols = list(group_cols)
    vals = F.transform(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col(order_col).alias("o"), F.col(value_col).alias("v")
                )
            )
        ),
        lambda s: s["v"],
    )
    tf = f"CAST({train_frac!r} AS DOUBLE)"
    g = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*group_cols)
        .agg(vals.alias("_vs"))
        .withColumn(
            "_tn", F.expr(f"CAST(floor(size(_vs) * {tf}) AS INT)")
        )
        .where((F.col("_tn") >= 2) & (F.size("_vs") > F.col("_tn")))
    )
    step = holt_update_sql("st", "x", alpha, beta, "spark")
    fit = (
        f"aggregate(slice(_vs, 3, greatest(_tn - 2, 0)), "
        f"array(element_at(_vs, 1), element_at(_vs, 2) - element_at(_vs, 1)), "
        f"(st, x) -> {step})"
    )
    g = g.withColumn("_st", F.expr(fit))
    err = (
        "(element_at(_st, 1) + CAST(h AS DOUBLE) * element_at(_st, 2))"
        " - element_at(_vs, _tn + h)"
    )
    g = g.withColumn(
        "_sae",
        F.expr(
            f"aggregate(sequence(1, size(_vs) - _tn), CAST(0.0 AS DOUBLE), "
            f"(acc, h) -> acc + abs({err}))"
        ),
    ).withColumn(
        "_sse",
        F.expr(
            f"aggregate(sequence(1, size(_vs) - _tn), CAST(0.0 AS DOUBLE), "
            f"(acc, h) -> acc + ({err}) * ({err}))"
        ),
    )
    h = (F.size("_vs") - F.col("_tn")).cast("double")
    return g.select(
        *group_cols,
        F.size("_vs").cast("long").alias("n"),
        F.col("_tn").cast("long").alias("train_n"),
        h.cast("long").alias("horizon"),
        (F.round(F.col("_sae") / h, round_to) + F.lit(0.0)).alias("mae"),
        (
            F.round(F.sqrt(F.col("_sse") / h), round_to) + F.lit(0.0)
        ).alias("rmse"),
    )
