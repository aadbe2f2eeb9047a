"""Fuzzy (approximate) string join — the record-linkage /
entity-resolution primitive: pair strings whose edit distance is
within a bound, without an all-pairs comparison.

Candidate generation is a q-gram inverted-index join (the same
postings-shape as the Jaccard near-dup path): two strings within
Levenshtein distance d share at least one q-gram PROVIDED
``len >= q * (d + 1)`` — a single edit disturbs at most q of the
``len - q + 1`` grams, so for long-enough strings an untouched gram
survives verbatim in both.  Under that length precondition the
candidate join is therefore RECALL-EXACT: candidates → exact
``levenshtein`` verification equals the naive all-pairs join, which
is what the DuckDB oracle checks.

Scale: the quadratic residual is hot grams (every "widget" shares
"idg").  ``prefix_k`` enables Chaudhuri-style prefix filtering — keep
only each string's k globally-rarest grams.  NOTE: prefix filtering
here is RECALL-LOSSY, not conservative: the distance-d guarantee is
only that SOME gram survives in both strings, and that surviving
gram may fall outside one side's k-rarest prefix, so a true match
can be dropped.  It is therefore an opt-in approximate scale knob
(the contract test asserts candidates ⊆ exact and >= 90% recall on
the fixture), never the oracle-checked default.  Gram frequencies
come from one bounded
aggregate (vocab ≤ alphabet^q) broadcast back; postings shrink from
O(len) to O(k) per string and the hot-gram explosion disappears.
Everything is Catalyst column math + one postings shuffle; the
verify step uses the built-in ``levenshtein`` (JVM codegen).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from ..functions.textfn import char_ngrams


def _grams(col, q: int):
    return F.array_distinct(char_ngrams(F.lower(col), q))


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 1,
    q: int = 3,
    prefix_k: int | None = None,
) -> DataFrame:
    """Pairs ``(a, b, dist)`` with ``levenshtein(a, b) <= max_dist``,
    for distinct values of the join columns (case-insensitive grams,
    case-sensitive distance).  Both sides are length-filtered to
    ``len >= q * (max_dist + 1)`` — below that no gram-overlap
    guarantee exists and the caller should brute-force the short
    stragglers (tiny by construction).

    ``prefix_k``: keep only each string's ``prefix_k`` rarest grams
    (global frequency order, gram as tie-break) before the join — the
    scale path for corpora with hot grams.
    """
    min_len = q * (max_dist + 1)
    a = (
        left.select(F.col(left_col).alias("a"))
        .where(F.length("a") >= min_len)
        .distinct()
    )
    b = (
        right.select(F.col(right_col).alias("b"))
        .where(F.length("b") >= min_len)
        .distinct()
    )
    ag = a.select("a", F.explode(_grams(F.col("a"), q)).alias("g"))
    bg = b.select("b", F.explode(_grams(F.col("b"), q)).alias("g"))

    if prefix_k is not None:
        freq = (
            ag.select("g").union(bg.select("g"))
            .groupBy("g")
            .agg(F.count(F.lit(1)).alias("_f"))
        )
        w_a = Window.partitionBy("a").orderBy("_f", "g")
        ag = (
            ag.join(F.broadcast(freq), "g")
            .withColumn("_rk", F.row_number().over(w_a))
            .where(F.col("_rk") <= prefix_k)
            .select("a", "g")
        )
        w_b = Window.partitionBy("b").orderBy("_f", "g")
        bg = (
            bg.join(F.broadcast(freq), "g")
            .withColumn("_rk", F.row_number().over(w_b))
            .where(F.col("_rk") <= prefix_k)
            .select("b", "g")
        )

    cand = (
        ag.join(bg, "g")
        .where(
            F.abs(F.length("a") - F.length("b")) <= max_dist
        )
        .select("a", "b")
        .distinct()
    )
    return (
        cand.withColumn("dist", F.levenshtein("a", "b"))
        .where(F.col("dist") <= max_dist)
    )


def fellegi_sunter_score(
    pairs: DataFrame,
    fields: dict[str, tuple],
    upper: float = 6.0,
    lower: float = 0.0,
) -> DataFrame:
    """Fellegi–Sunter probabilistic record-linkage scoring (Fellegi &
    Sunter 1969, public literature): each candidate pair accumulates
    per-field log-likelihood-ratio weights — ``log2(m/u)`` when the
    field agrees, ``log2((1-m)/(1-u))`` when it disagrees — where m =
    P(agree | match) and u = P(agree | non-match) are the field's
    configured priors (in production these come from EM or labeled
    data; here they are explicit inputs, which keeps the operator
    deterministic).

    ``fields`` maps field name -> (agreement Column (boolean), m, u).
    Adds per-field ``<name>_agree`` flags, the total ``score``
    (rounded to 6), and the classic three-band ``decision``:
    'match' (score >= upper), 'non-match' (score <= lower),
    'possible' in between (the clerical-review band).

    Determinism / oracle parity: weights are computed in PYTHON and
    injected as double literals — neither engine ever evaluates a
    log, so cross-engine libm differences cannot appear; the score is
    a fixed-order sum of literals selected by boolean conditions.

    Scale shape: pure scan-side projection over the candidate-pair
    relation — scoring adds zero shuffles; candidate generation
    (fuzzy_join / LSH blocking) owns the join cost.
    """
    import math

    score = F.lit(0.0)
    flags = []
    for name, (agree_col, mm, uu) in fields.items():
        w_a = math.log2(mm / uu)
        w_d = math.log2((1.0 - mm) / (1.0 - uu))
        flag = F.coalesce(agree_col.cast("boolean"), F.lit(False))
        flags.append(flag.alias(f"{name}_agree"))
        score = score + F.when(flag, F.lit(w_a)).otherwise(F.lit(w_d))
    decision = (
        F.when(score >= upper, F.lit("match"))
        .when(score <= lower, F.lit("non-match"))
        .otherwise(F.lit("possible"))
    )
    return pairs.select(
        *pairs.columns,
        *flags,
        (F.round(score, 6) + F.lit(0.0)).alias("score"),
        decision.alias("decision"),
    )
