"""Ordered-funnel and cohort-retention analytics over event streams.

Classic event-analytics shapes the reference's fixed DAG cannot
express but a telco/product analytics engine needs.  Both are pure
DataFrame compositions — no window-spanning state, no UDFs.

Scale shape (funnel): one groupBy per stage, each keyed on the
entity id, joined entity-to-entity (same key → co-partitioned under
AQE).  Stage k's input is the survivors of stage k-1 — cardinality
is monotonically non-increasing, so later stages get cheaper.
Counts are integers (bit-exact across engines).

Scale shape (retention): two aggregates over the fact (first-seen
per entity, distinct (entity, period) activity) joined on the
entity key, then a small (cohort, offset) count — the output is
O(periods²), independent of fact size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_stages(
    events: DataFrame,
    entity: str,
    ts_col: str,
    type_col: str,
    stages: Sequence[str],
    within: str | None = None,
) -> DataFrame:
    """Strictly-ordered funnel: for each entity, stage k counts only
    if its event happens at-or-after the entity's stage k-1 time —
    and, when ``within`` is given (an INTERVAL string like
    ``'7 days'``), no later than that long after it.  The bounded
    form answers the question product analytics actually asks
    ("converted WITHIN a week"), and makes abandoned journeys visible
    instead of folding them into eventual converters.

    Returns one row per stage: (stage_idx, stage, n_entities),
    n_entities = entities whose first qualifying stage-k event
    exists.  Note the bound applies per consecutive stage pair, and
    the surviving timestamp is the FIRST qualifying one — an entity
    that converts late is dropped even if an unqualifying earlier
    path existed (first-touch attribution, documented contract).
    """
    reached = None  # DataFrame(entity, _t) of stage survivors
    out_rows = []
    for i, stage in enumerate(stages):
        ev = events.where(F.col(type_col) == stage).select(
            F.col(entity).alias("_e"), F.col(ts_col).alias("_ts")
        )
        if reached is None:
            cur = ev.groupBy("_e").agg(F.min("_ts").alias("_t"))
        else:
            gate = F.col("_ts") >= F.col("_t")
            if within is not None:
                gate = gate & (
                    F.col("_ts")
                    <= F.col("_t") + F.expr(f"INTERVAL {within}")
                )
            cur = (
                ev.join(reached, ev["_e"] == reached["_e"])
                .where(gate)
                .select(ev["_e"].alias("_e2"), "_ts")
                .groupBy("_e2")
                .agg(F.min("_ts").alias("_t"))
                .withColumnRenamed("_e2", "_e")
            )
        reached = cur
        out_rows.append(
            cur.agg(
                F.lit(i).alias("stage_idx"),
                F.lit(stage).alias("stage"),
                F.count(F.lit(1)).alias("n_entities"),
            )
        )
    result = out_rows[0]
    for r in out_rows[1:]:
        result = result.unionByName(r)
    return result


def cohort_retention(
    events: DataFrame,
    entity: str,
    ts_col: str,
    period: str = "week",
    max_offset: int = 4,
) -> DataFrame:
    """(cohort_start, offset, n_active): of the entities first seen
    in `cohort_start`'s period, how many were active `offset`
    periods later (offset 0 = the cohort period itself)."""
    days = {"week": 7, "day": 1}[period]
    first = events.groupBy(F.col(entity).alias("_e")).agg(
        F.date_trunc(period, F.min(ts_col)).alias("cohort_start")
    )
    active = events.select(
        F.col(entity).alias("_e"), F.date_trunc(period, F.col(ts_col)).alias("_p")
    ).distinct()
    joined = active.join(first, "_e").withColumn(
        "offset",
        (F.datediff(F.col("_p"), F.col("cohort_start")) / days).cast("int"),
    )
    return (
        joined.where(F.col("offset") <= max_offset)
        .groupBy("cohort_start", "offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )


def markov_transitions(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    state_col: str,
    tiebreak_col: str,
    round_to: int = 6,
) -> DataFrame:
    """First-order Markov transition matrix over per-entity event
    sequences: for every (state → next_state) pair, the transition
    count and the conditional probability P(next | current) — the
    next-event model behind journey analysis, autocomplete-style
    next-action suggestions, and anomalous-path detection.

    ``tiebreak_col`` is REQUIRED, not optional: same-timestamp events
    are real at scale, and ``lead()`` over a non-total order is
    engine-dependent — the tiebreaker pins one canonical sequence so
    every engine derives the same transitions.

    Physical shape: ONE keyed window (partition by entity, order by
    (ts, tiebreak)) to derive successors — the same shuffle profile
    as any per-entity sessionization — then a (state, next) aggregate
    whose cardinality is |states|², independent of data size, and a
    broadcast-sized per-state total joined back via a window over the
    tiny aggregate.  No self-join of the fact against itself.
    """
    w = Window.partitionBy(entity_col).orderBy(ts_col, tiebreak_col)
    trans = (
        df.select(
            F.col(state_col).alias("state"),
            F.lead(state_col).over(w).alias("next_state"),
        )
        .where(F.col("next_state").isNotNull())
        .groupBy("state", "next_state")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("state")
    return trans.select(
        "state",
        "next_state",
        "n",
        F.round(F.col("n") / F.sum("n").over(tot), round_to).alias("p"),
    )


def last_touch_attribution(
    conversions: DataFrame,
    touches: DataFrame,
    key: str,
    conv_ts: str,
    touch_ts: str,
    channel_col: str,
    value_col: str,
    touch_tiebreak: str,
    unattributed: str = "direct",
) -> DataFrame:
    """Last-touch revenue attribution: each conversion's ``value_col``
    is credited to the entity's LATEST touch at-or-before the
    conversion time (ties on touch timestamp broken by the highest
    ``touch_tiebreak`` — deterministic across engines); conversions
    with no prior touch credit the ``unattributed`` channel.

    Returns (channel, n_conversions, revenue) — revenue rounded to 2.

    Physical shape: the union-window as-of pattern (operators/asof.py)
    — touches and conversions are unioned, partitioned by the entity
    key and ordered by (ts, side, tiebreak) so each conversion row
    reads the running last-non-null channel via one window pass: ONE
    keyed shuffle of touches + conversions, never a per-pair join
    explosion; then a |channels|-sized aggregate.  At 100 TB both
    inputs shuffle once on the same key — the same profile as any
    per-entity sessionization.
    """
    t = touches.select(
        F.col(key).alias("_k"),
        F.col(touch_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.col(touch_tiebreak).cast("long").alias("_tb"),
        F.col(channel_col).alias("_ch"),
        F.lit(None).cast("double").alias("_val"),
    )
    c = conversions.select(
        F.col(key).alias("_k"),
        F.col(conv_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.lit(None).cast("long").alias("_tb"),
        F.lit(None).cast("string").alias("_ch"),
        F.col(value_col).cast("double").alias("_val"),
    )
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_t"), F.col("_side"), F.col("_tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    attributed = (
        t.unionByName(c)
        .select(
            "_side",
            "_val",
            F.last(F.col("_ch"), ignorenulls=True).over(w).alias("_last_ch"),
        )
        .where(F.col("_side") == 1)
    )
    return (
        attributed.groupBy(
            F.coalesce(F.col("_last_ch"), F.lit(unattributed)).alias(
                "channel"
            )
        )
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.round(F.sum("_val"), 2).alias("revenue"),
        )
    )


def sequence_pattern_counts(
    df: DataFrame,
    entity_col: str,
    type_col: str,
    ts_col: str,
    pattern: str,
    type_chars: dict[str, str],
    tiebreak_col: str | None = None,
    default_char: str = "x",
) -> DataFrame:
    """CEP-style regex over per-entity event sequences — the
    MATCH_RECOGNIZE shape: encode each entity's time-ordered event
    types as a character string via ``type_chars`` (unmapped types
    become ``default_char``) and count NON-OVERLAPPING matches of
    ``pattern``.  Where ``funnel_stages`` counts staged reach and
    ``markov_transitions`` models adjacent pairs, this matches
    arbitrary ordered motifs with gaps ("a view, then any clicks or
    errors, then a purchase" = ``v[ce]*p``).

    DETERMINISM: pick patterns whose character classes are disjoint
    from their terminators (like ``v[ce]*p`` — the class cannot eat
    the terminator), so the match decomposition is unique and
    backtracking (Java) and DFA (RE2/DuckDB) engines agree exactly.
    Ambiguous patterns may count differently across engines.  Ties in
    ``ts_col`` are broken by ``tiebreak_col`` for a total order.

    Returns (entity_col, seq_len, n_matches).

    Scale shape: ONE keyed shuffle (the per-entity collect_list);
    per-entity state is the event-type string — bytes per event, the
    same order as any per-entity feature.  The regex runs scan-side
    post-aggregate.
    """
    mapping = F.create_map(
        *[F.lit(x) for kv in type_chars.items() for x in kv]
    )
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    ch = F.coalesce(mapping[F.col(type_col)], F.lit(default_char))
    seq = (
        df.select(
            F.col(entity_col).alias("entity"),
            F.struct(*order, ch.alias("ch")).alias("s"),
        )
        .groupBy("entity")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda s: s["ch"]
                ),
                "",
            ).alias("_seq")
        )
    )
    return seq.select(
        F.col("entity").alias(entity_col),
        F.length("_seq").cast("long").alias("seq_len"),
        F.regexp_count("_seq", F.lit(pattern)).cast("long").alias("n_matches"),
    )


def conversion_lag(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    type_col: str,
    from_type: str,
    to_type: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per-entity conversion lag: microseconds from the entity's
    FIRST ``from_type`` event to its first ``to_type`` event strictly
    after it — the time-to-convert distribution funnels report next
    to their rates.  Entities that never convert are dropped (the
    censored tail belongs to the Kaplan-Meier operator).

    Output: (entity_col, lag_us long).

    Determinism: timestamps compare at full microsecond precision
    (unix_micros — the rolling_hour idiom), ties resolved by
    ``tiebreak_col``.  Scale shape: ONE window pass partitioned by
    the entity (min-from carried as a running window min over the
    (ts, tiebreak)-ordered frame), then a per-entity aggregate —
    one shuffle, no self-join.
    """
    from pyspark.sql import Window

    us = F.unix_micros(F.col(ts_col))
    w = (
        Window.partitionBy(entity_col)
        .orderBy(F.col(ts_col), F.col(tiebreak_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    first_from = F.min(
        F.when(F.col(type_col) == from_type, us)
    ).over(w)
    return (
        df.withColumn("_ff", first_from)
        .where(
            (F.col(type_col) == to_type)
            & F.col("_ff").isNotNull()
            & (us > F.col("_ff"))
        )
        .groupBy(entity_col)
        .agg(F.min(us - F.col("_ff")).cast("long").alias("lag_us"))
    )
