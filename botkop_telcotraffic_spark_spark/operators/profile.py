"""Dataset profiling and declarative data-quality constraints
(SURVEY.md §2.12 extension surface — the "did the crawl shard arrive
sane?" gate every large-scale corpus build runs before spending
cluster-hours on it).

Design (Deequ-shaped, Spark-first):

* ``profile_columns`` computes per-column completeness / cardinality
  / numeric range in ONE aggregation pass — all metrics are plain
  Catalyst aggregate expressions over a single scan, so the physical
  plan is scan -> partial agg -> single-row exchange -> final agg,
  then a constant-side explode to one row per column.  At 100 TB the
  only shuffle is the one-row metric exchange; there is no per-column
  re-scan (a naive loop of ``df.select(col).agg(...)`` would scan the
  table N_cols times).

  Exact ``count(distinct)`` over many columns at once would multiply
  the shuffle by N_cols (Catalyst expands one row per distinct
  aggregate), so cardinality uses ``approx_count_distinct`` by
  default (HLL, map-side mergeable, rsd 1.5%%); pass
  ``exact_distinct=True`` for the expensive exact variant when
  auditing small dimensions.

* ``check_constraints`` evaluates a list of named boolean predicates
  as conditional counts in the same single-pass shape and returns one
  row per constraint with its violation count — the declarative
  "completeness > x / values in set / non-negative" rule pack.
  Predicates are Column expressions (or SQL strings), so they stay
  inside whole-stage codegen; nothing row-at-a-time.

Reference parity note: the reference has no profiling surface (its
553-line Scala pipeline trusts the simulator's schema,
TrafficStreamProcessor.scala:22-58); this is part of the
training-data-pipeline extension the brief mandates.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def profile_columns(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """One row per profiled column:

    ``col_name | n_rows | n_null | null_frac | n_distinct | min_num |
    max_num | mean_num``

    (``col_name``, not ``column`` — COLUMN is an ANSI reserved word
    and the oracle SQL should not need quoting gymnastics.)

    Numeric min/max/mean are NULL for non-numeric columns (kept
    numeric, not stringified, so engines cannot disagree on float
    rendering; null_frac/mean round to 6 per engine convention).
    """
    if cols is None:
        cols = df.columns
    numeric = {
        f.name
        for f in df.schema.fields
        if f.dataType.typeName()
        in ("integer", "long", "short", "byte", "double", "float", "decimal")
    }

    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"nn_{c}"))
        if exact_distinct:
            aggs.append(F.countDistinct(F.col(c)).alias(f"nd_{c}"))
        else:
            aggs.append(
                F.approx_count_distinct(F.col(c)).alias(f"nd_{c}")
            )
        if c in numeric:
            aggs.append(F.min(F.col(c)).cast("double").alias(f"mn_{c}"))
            aggs.append(F.max(F.col(c)).cast("double").alias(f"mx_{c}"))
            aggs.append(F.avg(F.col(c)).cast("double").alias(f"av_{c}"))

    row = df.agg(*aggs)

    # Constant-side pivot of the single metrics row into one row per
    # column: a stack() over already-computed scalars — no second
    # scan, no shuffle.
    stacked = []
    for c in cols:
        mn = f"mn_{c}" if c in numeric else "CAST(NULL AS DOUBLE)"
        mx = f"mx_{c}" if c in numeric else "CAST(NULL AS DOUBLE)"
        av = f"av_{c}" if c in numeric else "CAST(NULL AS DOUBLE)"
        stacked.append(f"'{c}', nn_{c}, nd_{c}, {mn}, {mx}, {av}")
    n = len(cols)
    expr = (
        f"stack({n}, " + ", ".join(stacked) +
        ") AS (col_name, n_nonnull, n_distinct, min_num, max_num, mean_num)"
    )
    return row.selectExpr("n_rows", expr).select(
        "col_name",
        "n_rows",
        (F.col("n_rows") - F.col("n_nonnull")).alias("n_null"),
        F.round(
            (F.col("n_rows") - F.col("n_nonnull")) / F.col("n_rows"), 6
        ).alias("null_frac"),
        "n_distinct",
        "min_num",
        "max_num",
        F.round("mean_num", 6).alias("mean_num"),
    )


def check_constraints(
    df: DataFrame,
    constraints: Mapping[str, Column | str],
) -> DataFrame:
    """Evaluate named row-level predicates in one pass; return
    ``check_name | n_rows | n_violations | violation_frac | passed``
    (passed = zero violations), one row per constraint.

    A predicate that evaluates to NULL (e.g. a comparison on a NULL
    cell) counts as a violation — data-quality semantics, not SQL
    three-valued logic: an unknown is not a pass.
    """
    names = list(constraints)
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for i, name in enumerate(names):
        pred = constraints[name]
        col = F.expr(pred) if isinstance(pred, str) else pred
        ok = F.coalesce(col.cast("boolean"), F.lit(False))
        aggs.append(
            F.sum(F.when(~ok, 1).otherwise(0)).alias(f"v_{i}")
        )
    row = df.agg(*aggs)
    stacked = ", ".join(
        f"'{name.replace(chr(39), chr(39) * 2)}', v_{i}"
        for i, name in enumerate(names)
    )
    expr = f"stack({len(names)}, {stacked}) AS (check_name, n_violations)"
    return row.selectExpr("n_rows", expr).select(
        "check_name",
        "n_rows",
        "n_violations",
        F.round(F.col("n_violations") / F.col("n_rows"), 6).alias(
            "violation_frac"
        ),
        (F.col("n_violations") == 0).alias("passed"),
    )


def benford_screen(
    df: DataFrame,
    value_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """Benford's-law first-digit screen (Newcomb 1881 / Benford 1938,
    public literature; the standard forensic-accounting and
    data-quality test): compare the leading-digit distribution of
    |value| against P(d) = log10(1 + 1/d) and report per-digit
    chi-square contributions — fabricated or unit-mangled numeric
    columns light up here before they poison downstream stats.

    Determinism note: leading digit comes from the INTEGER
    floor(|v|·scale) rendered as a string — float formatting differs
    across engines, integer rendering does not; values with
    |v|·scale < 1 (true zeros at the given scale) are excluded like
    zeros are in the standard test.

    Returns ALL 9 rows — observed counts are right-joined onto a
    literal 1..9 digit spine (observed coalesced to 0), so a digit
    that never appears still contributes its full (0-e)²/e = e term
    to the chi-square sum.  A completely absent leading digit is the
    strongest fabrication signal the test exists to catch; dropping
    its row would silently understate χ².  (digit, observed,
    expected, contrib) with expected = n·P(d) and contrib = (o-e)²/e,
    both rounded to 6; sum of contribs ~ χ²(8) under the null.  On an
    empty input all expected/contrib are 0.0 by the 0²/0 := 0
    convention.

    Scale shape: one scan-side digit projection + a 9-key aggregate,
    spine-joined (broadcast hash, 9×≤9 rows) and totalled by a
    single-partition window over the 9-row result; nothing else
    touches the table — no cross join, no second scan.
    """
    import math

    from pyspark.sql import Window

    v = F.col(value_col).cast("double")
    i = F.floor(F.abs(v) * scale).cast("long")
    d = F.substring(i.cast("string"), 1, 1).cast("int")
    digits = (
        df.where(v.isNotNull() & (i >= 1))
        .groupBy(d.alias("digit"))
        .agg(F.count(F.lit(1)).cast("long").alias("observed"))
    )
    spine = df.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    spined = spine.join(digits, "digit", "left").select(
        "digit",
        F.coalesce(F.col("observed"), F.lit(0).cast("long")).alias(
            "observed"
        ),
    )
    n = F.sum("observed").over(
        Window.partitionBy()
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    probs = F.create_map(
        *[
            x
            for dd in range(1, 10)
            for x in (F.lit(dd), F.lit(math.log10(1 + 1 / dd)))
        ]
    )
    e = n * probs[F.col("digit")]
    contrib = F.when(e > 0, (F.col("observed") - e) ** 2 / e).otherwise(
        F.lit(0.0)
    )
    return spined.select(
        "digit",
        "observed",
        (F.round(e, 6) + F.lit(0.0)).alias("expected"),
        (F.round(contrib, 6) + F.lit(0.0)).alias("contrib"),
    )


def gini_concentration(
    df: DataFrame,
    group_cols: list[str],
    weight_col: str,
) -> DataFrame:
    """Gini coefficient of ``weight_col`` concentration within each
    group — the standard inequality audit (Gini 1912, public
    literature) for corpus balance: a source where 1% of documents
    hold 90% of the tokens trains very differently from a uniform one,
    and a per-user event Gini near 1 means a handful of heavy hitters
    dominate the key distribution (shuffle-skew early warning).

    Uses the rank form G = 2·Σ(i·xᵢ) / (n·Σx) − (n+1)/n with xᵢ
    ascending — every term is a sum over exactly-ranked values, so
    with integer weights the arithmetic is EXACT until the final
    division (cross-engine stable at 6 decimals).  Ties rank
    arbitrarily but Σ(i·xᵢ) is tie-order-invariant within equal x.

    Returns (group_cols..., n, total, gini).

    Scale shape: one keyed shuffle for the per-group rank window +
    one keyed aggregate.  Ranking is per group (not global); a group
    is one key's rows — the same distribution any per-key window op
    carries.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*group_cols).orderBy(
        F.col(weight_col).asc(), F.monotonically_increasing_id()
    )
    x = F.col(weight_col).cast("double")
    ranked = df.select(
        *group_cols, x.alias("_x"), F.row_number().over(w).alias("_i")
    )
    return (
        ranked.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("_x").alias("_sx"),
            F.sum(F.col("_i") * F.col("_x")).alias("_six"),
        )
        .select(
            *group_cols,
            "n",
            (F.round(F.col("_sx"), 6) + F.lit(0.0)).alias("total"),
            (
                F.round(
                    F.lit(2.0) * F.col("_six") / (F.col("n") * F.col("_sx"))
                    - (F.col("n") + F.lit(1.0)) / F.col("n"),
                    6,
                )
                + F.lit(0.0)
            ).alias("gini"),
        )
    )


def mutual_information(
    df: DataFrame,
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Mutual information I(X;Y) between two categorical columns,
    decomposed per observed (x, y) cell — the dependence probe for
    feature selection / leakage screening (is this column secretly
    the label?) that correlation misses for non-linear or
    non-ordinal relationships.

        I(X;Y) = Σ_{x,y} p(x,y) · log2( p(x,y) / (p(x)·p(y)) )

    Plug-in (maximum-likelihood) estimator over observed cells only —
    unobserved cells contribute exactly 0 to the sum, so skipping
    them is exact, not an approximation.  ``sum(mi_term)`` over the
    result IS the MI estimate (>= 0 up to float noise); the largest
    positive terms are the over-represented cells ("which
    combinations carry the dependence").  NULL in either column is
    treated as a category of its own (dependence involving
    missingness is usually the leak being hunted): the marginal
    joins are null-safe (``eqNullSafe`` ↔ ``IS NOT DISTINCT FROM``
    in the oracle), so NULL cells keep their marginals instead of
    silently dropping out of an inner equi-join.

    Physical shape: ONE (x, y) cell aggregate (map-side combined),
    two marginal re-aggregates of the CELL table (|X×Y|-sized, not
    data-sized), joined back keyed, and a 1-row total broadcast —
    input is scanned once; everything downstream is cell-table-sized.
    """
    cells = (
        df.groupBy(
            F.col(x_col).alias("x"), F.col(y_col).alias("y")
        ).agg(F.count(F.lit(1)).alias("n_xy"))
    )
    mx = cells.groupBy("x").agg(F.sum("n_xy").alias("n_x")).select(
        F.col("x").alias("_mx"), "n_x"
    )
    my = cells.groupBy("y").agg(F.sum("n_xy").alias("n_y")).select(
        F.col("y").alias("_my"), "n_y"
    )
    tot = cells.agg(F.sum("n_xy").cast("double").alias("_n"))
    j = (
        cells.join(mx, F.col("x").eqNullSafe(F.col("_mx")))
        .join(my, F.col("y").eqNullSafe(F.col("_my")))
        .crossJoin(F.broadcast(tot))
    )
    p_xy = F.col("n_xy") / F.col("_n")
    p_x = F.col("n_x") / F.col("_n")
    p_y = F.col("n_y") / F.col("_n")
    term = p_xy * F.log(2.0, p_xy / (p_x * p_y))
    return j.select(
        "x",
        "y",
        F.col("n_xy").cast("long").alias("n_xy"),
        (F.round(term, round_to) + F.lit(0.0)).alias("mi_term"),
    )


def column_entropy(
    df: DataFrame,
    cols,
    round_to: int = 6,
) -> DataFrame:
    """Per-column Shannon entropy profile: for each listed column,
    the number of values, distinct count, entropy in bits
    (−Σ p·log2 p over the value distribution, NULL counted as a
    category — missingness is information too) and the top value's
    frequency share — the "how informative / how degenerate is this
    column" scan that picks partition keys, spots constant columns,
    and sizes dictionary encodings.

    Physical shape: one ``stack`` melt (scan-side, no shuffle), ONE
    (col, value) aggregate (map-side combined), a per-column window
    over the VALUE-DISTRIBUTION table (vocabulary-sized, not
    data-sized), and a per-column final aggregate.  Adding columns
    multiplies melt rows, not passes.
    """
    from pyspark.sql import Window

    pairs = ", ".join(f"'{c}', CAST({c} AS STRING)" for c in cols)
    melted = df.select(
        F.expr(f"stack({len(cols)}, {pairs}) as (col, val)")
    )
    counts = melted.groupBy("col", "val").agg(
        F.count(F.lit(1)).alias("n")
    )
    wc = Window.partitionBy("col")
    cc = counts.withColumn(
        "_tot", F.sum("n").over(wc).cast("double")
    )
    p = F.col("n") / F.col("_tot")
    return cc.groupBy("col").agg(
        F.first("_tot").cast("long").alias("n_values"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        (
            F.round(F.sum(-p * F.log(2.0, p)), round_to) + F.lit(0.0)
        ).alias("entropy_bits"),
        (
            F.round(F.max("n") / F.first("_tot"), round_to)
            + F.lit(0.0)
        ).alias("top_freq_ratio"),
    )


def cramers_v(
    df: DataFrame,
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Cramér's V association between two categorical columns
    (Cramér 1946, public literature): the [0, 1]-normalized
    chi-square,

        V = sqrt( (chi2 / n) / min(r - 1, c - 1) )

    where chi2 = Σ (n_xy - e_xy)²/e_xy over observed AND structurally
    absent cells, e_xy = n_x·n_y/n.  Absent cells contribute e_xy
    (since (0 - e)²/e = e), so chi2 is computed as
    Σ_observed ((n_xy - e)²/e - e) + n — exact without materializing
    the full r×c grid (the same skip-the-zeros trick
    ``mutual_information`` uses, adapted to chi-square's nonzero
    null-cell contribution).  One row out: n, r, c, chi2, v.

    NULLs are categories of their own (null-safe marginal joins).
    Scale shape: identical to ``mutual_information`` — one (x, y)
    cell aggregate, two cell-table-sized marginal re-aggregates
    joined back null-safe, a 1-row totals broadcast, one final 1-row
    reduce; the fact table is scanned once.
    """
    cells = df.groupBy(
        F.col(x_col).alias("x"), F.col(y_col).alias("y")
    ).agg(F.count(F.lit(1)).alias("n_xy"))
    # marginals as DOUBLE before the n_x*n_y product: at 100 TB a
    # BIGINT product of two ~1e12 marginals overflows; DOUBLE loses
    # only ulps the final round() absorbs (oracle casts identically)
    mx = (
        cells.groupBy("x")
        .agg(F.sum("n_xy").cast("double").alias("n_x"))
        .select(F.col("x").alias("_mx"), "n_x")
    )
    my = (
        cells.groupBy("y")
        .agg(F.sum("n_xy").cast("double").alias("n_y"))
        .select(F.col("y").alias("_my"), "n_y")
    )
    tot = cells.agg(
        F.sum("n_xy").cast("double").alias("_n"),
        F.countDistinct("x").cast("double").alias("_r"),
        F.countDistinct("y").cast("double").alias("_c"),
    )
    j = (
        cells.join(mx, F.col("x").eqNullSafe(F.col("_mx")))
        .join(my, F.col("y").eqNullSafe(F.col("_my")))
        .crossJoin(F.broadcast(tot))
    )
    e = F.col("n_x") * F.col("n_y") / F.col("_n")
    d = F.col("n_xy") - e
    term = d * d / e - e
    out = j.groupBy().agg(
        F.first("_n").alias("_n"),
        F.first("_r").alias("_r"),
        F.first("_c").alias("_c"),
        F.sum(term).alias("_s"),
    )
    chi2 = F.col("_s") + F.col("_n")
    denom = F.least(F.col("_r") - 1, F.col("_c") - 1)
    v = F.when(denom > 0, F.sqrt(chi2 / F.col("_n") / denom)).otherwise(
        F.lit(0.0)
    )
    return out.select(
        F.col("_n").cast("long").alias("n"),
        F.col("_r").cast("long").alias("r"),
        F.col("_c").cast("long").alias("c"),
        (F.round(chi2, round_to) + F.lit(0.0)).alias("chi2"),
        (F.round(v, round_to) + F.lit(0.0)).alias("v"),
    )


def capture_recapture(
    df: DataFrame,
    unit_col: str,
    occasion_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Chapman capture-recapture population estimate (Chapman 1951,
    the bias-corrected Lincoln-Petersen index; standard in ecology
    and increasingly in data-quality work — "how many users/entities
    exist that we have NOT observed yet"): with n1, n2 the units seen
    on each of two occasions and m the units seen on both,

        N̂ = (n1 + 1)(n2 + 1) / (m + 1) - 1
        var(N̂) = (n1+1)(n2+1)(n1-m)(n2-m) / ((m+1)²(m+2))

    ``occasion_col`` must be 0/1.  Output: one row — n1, n2, m,
    est_population, se.  The estimate is undefined at m = 0 only in
    the uncorrected form; Chapman stays finite.

    Scale shape: ONE distinct-reducing aggregate to (unit,
    seen0, seen1) flags (map-side combined max), one 1-row reduce —
    scan-once, nothing data-sized downstream.
    """
    occ = F.col(occasion_col).cast("int")
    units = df.groupBy(F.col(unit_col).alias("_u")).agg(
        F.max(F.when(occ == 0, 1).otherwise(0)).alias("_s0"),
        F.max(F.when(occ == 1, 1).otherwise(0)).alias("_s1"),
    )
    g = units.agg(
        F.sum("_s0").cast("double").alias("_n1"),
        F.sum("_s1").cast("double").alias("_n2"),
        F.sum(F.col("_s0") * F.col("_s1")).cast("double").alias("_m"),
    )
    n1, n2, m = F.col("_n1"), F.col("_n2"), F.col("_m")
    est = (n1 + 1) * (n2 + 1) / (m + 1) - 1
    var = ((n1 + 1) * (n2 + 1) * (n1 - m) * (n2 - m)) / (
        (m + 1) * (m + 1) * (m + 2)
    )
    return g.select(
        n1.cast("long").alias("n1"),
        n2.cast("long").alias("n2"),
        m.cast("long").alias("m"),
        (F.round(est, round_to) + F.lit(0.0)).alias("est_population"),
        (F.round(F.sqrt(var), round_to) + F.lit(0.0)).alias("se"),
    )
