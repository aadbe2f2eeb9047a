"""Teletraffic engineering and subscriber-engagement analytics: the
capacity-planning layer of a telco pipeline, on top of the movement
layer (`trajectory.py`) and the network-pathology layer (ping-pong
handovers).

The reference's domain is simulated telco traffic
(`/root/reference/src/main/scala/traffic` — subscribers generating
load against cell infrastructure).  These operators answer the
questions a capacity planner asks of that load: how much offered
traffic does each cell carry (erlangs), what fraction of call
attempts would BLOCK at a given trunk count (Erlang B — the
teletraffic formula, Erlang 1917), how evenly is load spread across
cells (Jain's fairness index, Jain et al. 1984), when is each cell's
busy hour (the dimensioning input in every radio-planning handbook),
and how sticky is the subscriber base (DAU/WAU — the engagement
ratio product analytics standardized).

Cross-engine determinism: Erlang B is generated as ONE SQL formula
string (`erlang_b_sql`) with left-associated multiplication chains
(no `pow`, whose libm rounding differs across engines) and
factorial literals cast to DOUBLE — the identical expression tree is
evaluated by `F.expr` on the Spark side and verbatim by the DuckDB
oracle, the same contract as `haversine_sql` / `geohash_sql`.

Scale shape: every operator here is one or two keyed aggregates
(map-side combined) followed by scan-side closed-form arithmetic on
the AGGREGATED relation (cells- or weeks-sized, never data-sized);
the busy-hour argmax windows run over per-key 24-row hour tables.
"""

from __future__ import annotations

from math import factorial

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def erlang_b_sql(erlang_expr: str, channels: int) -> str:
    """ONE dual-dialect SQL string for the Erlang B blocking
    probability B(E, m) = (E^m/m!) / Σ_{k=0..m} E^k/k! — the
    probability a call arriving at an m-trunk group carrying offered
    load E erlangs finds all trunks busy (Erlang 1917, the formula
    every trunk-dimensioning table is printed from).

    Powers are LEFT-ASSOCIATED multiplication chains (``(e*e)*e``),
    not ``pow`` — repeated multiplication is the same IEEE op
    sequence in every engine, while ``pow`` goes through libm and
    may differ in the last ulp.  Factorials are DOUBLE-cast literals
    (DuckDB would otherwise parse them as DECIMAL and propagate
    DECIMAL arithmetic).  Additions are left-associated by SQL
    grammar in both dialects, so the whole tree is bit-identical.
    """
    e = f"({erlang_expr})"
    pows = ["CAST(1.0 AS DOUBLE)"]
    for _ in range(channels):
        pows.append(f"({pows[-1]} * {e})" if len(pows) > 1 else e)
    terms = [
        f"({p} / CAST({float(factorial(k))} AS DOUBLE))"
        for k, p in enumerate(pows)
    ]
    return f"({terms[-1]} / ({' + '.join(terms)}))"


def erlang_b_blocking(
    df: DataFrame,
    erlang_col: str,
    channels: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """Erlang B blocking probability per row of an AGGREGATED
    offered-load relation (one row per cell/trunk group, produced by
    an upstream keyed aggregate): appends ``blocking`` — the
    fraction of call attempts lost at ``channels`` trunks.

    Pure scan-side closed-form column math over the cells-sized
    input — zero shuffles, zero UDFs; the formula string comes from
    :func:`erlang_b_sql` so an oracle can evaluate the identical
    expression tree.
    """
    b = F.expr(erlang_b_sql(f"CAST({erlang_col} AS DOUBLE)", channels))
    return df.withColumn(
        "blocking", F.round(b, round_to) + F.lit(0.0)
    )


def jain_fairness(
    df: DataFrame,
    value_col: str,
    key_cols: list[str] | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Jain's fairness index J = (Σx)² / (n·Σx²) over an allocation
    column (Jain, Chiu & Hawe 1984) — 1 = perfectly even load across
    cells, 1/n = one cell carries everything; the single-number
    answer to "is the network balanced" next to the Lorenz-style
    :func:`~..profile.gini_concentration`.

    ONE aggregate (global, or keyed when ``key_cols`` is given) of
    the three sufficient sums — map-side combined, one output row
    per group regardless of input size.  Zero-sum groups answer NULL
    honestly.

    Returns (keys?, n, jain).
    """
    x = F.col(value_col).cast("double")
    n = F.count(F.lit(1)).cast("double")
    sx, sxx = F.sum(x), F.sum(x * x)
    j = F.when(sxx > 0, (sx * sx) / (n * sxx))
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n"),
        (F.round(j, round_to) + F.lit(0.0)).alias("jain"),
    ]
    if key_cols:
        return df.groupBy(*key_cols).agg(*aggs)
    return df.agg(*aggs)


def busy_hour(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-key busy hour: the hour-of-day carrying the most events —
    THE dimensioning input of radio planning (networks are sized for
    the busy hour, not the average) — plus its share of the key's
    total traffic.  Deterministic tie-break: the EARLIEST hour wins.

    Physical shape: ONE (key, hour-of-day) aggregate (map-side
    combined — at most 24 rows per key reach the shuffle), then a
    window argmax + share over that 24-row-per-key table.

    Returns (keys, busy_hour, n_busy, n_total, busy_share).
    """
    counts = df.groupBy(
        *key_cols, F.hour(ts_col).cast("long").alias("busy_hour")
    ).agg(F.count(F.lit(1)).alias("_n"))
    wk = Window.partitionBy(*key_cols)
    rn = F.row_number().over(
        wk.orderBy(F.desc("_n"), F.asc("busy_hour"))
    )
    tot = F.sum("_n").over(wk)
    return (
        counts.select(
            *key_cols,
            "busy_hour",
            F.col("_n").cast("long").alias("n_busy"),
            tot.cast("long").alias("n_total"),
            rn.alias("_rn"),
        )
        .where(F.col("_rn") == 1)
        .select(
            *key_cols,
            "busy_hour",
            "n_busy",
            "n_total",
            (
                F.round(
                    F.col("n_busy") / F.col("n_total").cast("double"),
                    round_to,
                )
                + F.lit(0.0)
            ).alias("busy_share"),
        )
    )


def dau_wau_stickiness(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Weekly DAU/WAU stickiness: mean daily-active over
    weekly-active distinct users per ISO week — the engagement ratio
    (1.0 = every weekly user shows up every observed day; 1/7 = each
    appears once).  Weeks are ``date_trunc('week')`` (Monday start
    in both engines).

    Physical shape: one (week, day, user) distinct-reducing
    aggregate, one (week, day) count, one (week) average — plus one
    (week, user) distinct count — all map-side combined, joined on
    the weeks-sized key.  Days with zero events contribute nothing
    (observed-day mean, documented).

    Returns (week, n_days, avg_dau, wau, stickiness).
    """
    base = df.select(
        F.date_trunc("week", ts_col).alias("week"),
        F.date_trunc("day", ts_col).alias("day"),
        F.col(user_col).alias("_u"),
    )
    daily = (
        base.groupBy("week", "day")
        .agg(F.countDistinct("_u").alias("_dau"))
        .groupBy("week")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            (F.round(F.avg("_dau"), round_to) + F.lit(0.0)).alias(
                "avg_dau"
            ),
            F.avg("_dau").alias("_avg_raw"),
        )
    )
    weekly = base.groupBy("week").agg(
        F.countDistinct("_u").cast("long").alias("wau")
    )
    return daily.join(weekly, "week").select(
        "week",
        "n_days",
        "avg_dau",
        "wau",
        (
            F.round(
                F.col("_avg_raw") / F.col("wau").cast("double"), round_to
            )
            + F.lit(0.0)
        ).alias("stickiness"),
    )


def erlang_c_sql(erlang_expr: str, channels: int) -> str:
    """ONE dual-dialect SQL string for the Erlang C waiting
    probability — the delay-system companion to :func:`erlang_b_sql`
    (calls QUEUE instead of blocking; the call-center / paging-channel
    dimensioning formula):

        C(E, m) = A / (Σ_{k<m} E^k/k! + A),
        A = (E^m/m!) · m/(m−E)      for E < m; C = 1 when E >= m
        (the M/M/m queue is unstable at or past full load).

    Same determinism contract as Erlang B: left-associated power
    chains (no pow), DOUBLE-cast factorial literals, grammar-ordered
    additions — a bit-identical tree in both engines.
    """
    e = f"({erlang_expr})"
    pows = ["CAST(1.0 AS DOUBLE)"]
    for _ in range(channels):
        pows.append(f"({pows[-1]} * {e})" if len(pows) > 1 else e)
    terms = [
        f"({p} / CAST({float(factorial(k))} AS DOUBLE))"
        for k, p in enumerate(pows)
    ]
    m = float(channels)
    a = (
        f"({terms[-1]} * (CAST({m} AS DOUBLE)"
        f" / (CAST({m} AS DOUBLE) - {e})))"
    )
    partial = " + ".join(terms[:-1])
    return (
        f"(CASE WHEN {e} < CAST({m} AS DOUBLE)"
        f" THEN ({a} / (({partial}) + {a}))"
        f" ELSE CAST(1.0 AS DOUBLE) END)"
    )


def erlang_c_waiting(
    df: DataFrame,
    erlang_col: str,
    channels: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """Erlang C waiting probability per row of an AGGREGATED
    offered-load relation: appends ``p_wait`` — the fraction of
    arrivals that find all ``channels`` servers busy and must queue
    (1.0 at or past saturation).  Scan-side closed-form column math,
    zero shuffles; formula from :func:`erlang_c_sql` so an oracle
    evaluates the identical tree.
    """
    c = F.expr(erlang_c_sql(f"CAST({erlang_col} AS DOUBLE)", channels))
    return df.withColumn("p_wait", F.round(c, round_to) + F.lit(0.0))
