"""Categorical feature encoding for training pipelines — the
feature-engineering steps between raw categories and a model matrix.

Two encoders, both single-aggregate + broadcast join-back shapes (the
fact table is never shuffled, output is input-sized):

* ``target_encode`` — smoothed mean-target encoding
  ``enc(c) = (Σ target_c + α·μ) / (n_c + α)``: a category's code
  shrinks toward the global mean μ as its support shrinks (α is the
  pseudo-count).  NOTE the leakage contract: this is the FIT-ON-TRAIN
  form — encode validation/test rows with the training-fit table
  (pass ``fit_df``), never with their own targets; for strict
  leave-one-out within train, subtract the row's own target from the
  numerator (documented variant, not default — it doubles the
  aggregate width for a correction most pipelines skip in favor of
  CV-fold fitting, see ``sampling.kfold_assign``).

* ``collapse_rare`` — categories with support < ``min_count`` become
  one ``rare_token`` level: stabilizes downstream encodings (a
  1-occurrence category's target mean is noise) and bounds the
  one-hot/embedding vocabulary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def target_encode(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    alpha: float = 10.0,
    fit_df: DataFrame | None = None,
    out_col: str | None = None,
    round_to: int = 6,
) -> DataFrame:
    """Append ``out_col`` (default ``<cat_col>_enc``) = smoothed mean
    target of the row's category, fit on ``fit_df`` (default: df
    itself — the train-encode case).  Unseen categories get the
    global mean (the α-shrinkage limit)."""
    fit = fit_df if fit_df is not None else df
    t = F.col(target_col).cast("double")
    stats = fit.groupBy(cat_col).agg(
        F.sum(t).alias("_s"), F.count(t).alias("_n")
    )
    glob = fit.agg(
        (F.sum(t) / F.count(t)).alias("_mu")
    )
    out = out_col or f"{cat_col}_enc"
    enc = (F.col("_s") + F.lit(alpha) * F.col("_mu")) / (
        F.col("_n") + F.lit(alpha)
    )
    return (
        df.join(F.broadcast(stats), cat_col, "left")
        .crossJoin(F.broadcast(glob))
        .withColumn(
            out,
            F.round(F.coalesce(enc, F.col("_mu")), round_to),
        )
        .drop("_s", "_n", "_mu")
    )


def collapse_rare(
    df: DataFrame,
    cat_col: str,
    min_count: int,
    rare_token: str = "__rare__",
) -> DataFrame:
    """Replace categories seen fewer than ``min_count`` times with
    ``rare_token`` (in place, same column name).  NULL categories are
    left NULL — missing is its own signal, not a rare level."""
    counts = df.groupBy(cat_col).agg(F.count(F.lit(1)).alias("_n"))
    keep = counts.where(F.col("_n") >= min_count).select(
        F.col(cat_col).alias("_keep")
    )
    return (
        df.join(
            F.broadcast(keep), df[cat_col] == F.col("_keep"), "left"
        )
        .withColumn(
            cat_col,
            F.when(F.col(cat_col).isNull(), F.lit(None).cast("string"))
            .when(F.col("_keep").isNotNull(), F.col(cat_col))
            .otherwise(F.lit(rare_token)),
        )
        .drop("_keep")
    )


def percentile_normalize(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str = "pctile",
) -> DataFrame:
    """Within-group percentile rank of ``value_col`` — the
    cross-source score normalizer: a quality score's PERCENTILE
    within its own source is comparable across sources whose raw
    score distributions differ (the standard fix before mixing
    corpora filtered by heterogeneous classifiers).

    Semantics are exactly SQL ``percent_rank() OVER (PARTITION BY
    group ORDER BY value)``: (min_rank - 1) / (n - 1), ties share a
    rank, single-row groups get 0.  Output is input-sized with
    ``out_col`` rounded to 6.

    Scale shape: the naive window sorts EVERY ROW of a group in one
    task — a hot source is a straggler wall.  This computes the same
    number on the (group, DISTINCT value) frame instead: one keyed
    count aggregate (map-side combined), a window over the
    distinct-value rows only (bounded by value cardinality, not row
    count), and one keyed join back onto the fact.  NULL VALUES pass
    through with NULL percentile (SQL window semantics would rank
    them; a NULL score has no meaningful percentile); NULL GROUP
    KEYS are a group like any other (null-safe join back — the same
    contract as winsorize/impute_group_stat)."""
    g = [F.col(c) for c in group_cols]
    vc = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(*g, F.col(value_col))
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*group_cols)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wg = Window.partitionBy(*group_cols)
    ranked = (
        vc.withColumn("_below", F.coalesce(F.sum("_c").over(w), F.lit(0)))
        .withColumn("_n", F.sum("_c").over(wg))
        .select(
            *group_cols,
            value_col,
            (
                F.round(
                    F.when(
                        F.col("_n") > 1,
                        F.col("_below") / (F.col("_n") - 1),
                    ).otherwise(0.0),
                    6,
                )
                + F.lit(0.0)
            ).alias(out_col),
        )
    )
    r = ranked.select(
        *[F.col(c).alias(f"_r_{c}") for c in group_cols],
        F.col(value_col).alias("_r_v"),
        out_col,
    )
    cond = [df[c].eqNullSafe(r[f"_r_{c}"]) for c in group_cols] + [
        df[value_col] == r["_r_v"]
    ]
    joined = df.join(r, cond, "left")
    return joined.drop("_r_v", *[f"_r_{c}" for c in group_cols])


def quantile_match(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str = "matched",
) -> DataFrame:
    """Quantile normalization across groups: replace each value with
    the GLOBAL value at the same percentile its group assigns it —
    the bioinformatics quantile-normalization / score-calibration
    recipe that makes per-source quality scores comparable by
    construction (each group's distribution maps onto the pooled
    one; `percentile_normalize` reports the percentile, this maps it
    back into value space).

    matched(x) = min global v with global_pctile(v) >= group_pctile(x),
    both percentiles in percent_rank semantics.  NULL values pass
    through with NULL ``out_col``.

    Scale shape: both percentile passes run on distinct-value frames
    (the percentile_normalize decomposition); the forward as-of
    lookup is ONE ordered window over the UNION of the two grids —
    grid-sized, never row-sized.  Like kaplan_meier, quantize
    continuous values upstream so grids stay bounded.
    """
    from pyspark.sql import Window

    src = percentile_normalize(df, group_cols, value_col, "_p")
    src_grid = (
        src.where(F.col(value_col).isNotNull())
        .select(*group_cols, value_col, "_p")
        .distinct()
    )
    ref_grid = (
        percentile_normalize(df, [], value_col, "_gp")
        .where(F.col(value_col).isNotNull())
        .select(F.col(value_col).alias("_rv"), "_gp")
        .distinct()
    )
    # union as-of: order by (key, side) with ref AFTER src on ties so
    # an equal-percentile global value is eligible for the src row
    u = src_grid.select(
        *group_cols,
        F.col(value_col),
        F.col("_p").alias("_key"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(df.schema[value_col].dataType).alias("_rv"),
    ).unionByName(
        ref_grid.select(
            *[F.lit(None).cast(df.schema[c].dataType).alias(c) for c in group_cols],
            F.lit(None).cast(df.schema[value_col].dataType).alias(value_col),
            F.col("_gp").alias("_key"),
            F.lit(1).alias("_side"),
            "_rv",
        )
    )
    # _rv ascending third: if two distinct global values round to the
    # same 6-decimal percentile (adjacent percent_rank steps collide as
    # the distinct-value grid approaches ~1e6 values), ties resolve to
    # the MINIMUM global value — matching the oracle's correlated
    # min(rv) semantics deterministically.
    w = (
        Window.orderBy("_key", "_side", F.col("_rv").asc_nulls_first())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    matched_grid = (
        u.withColumn("_m", F.first("_rv", ignorenulls=True).over(w))
        .where(F.col("_side") == 0)
        .select(*group_cols, value_col, F.col("_m").alias(out_col))
    )
    r = matched_grid.select(
        *[F.col(c).alias(f"_g_{c}") for c in group_cols],
        F.col(value_col).alias("_g_v"),
        out_col,
    )
    cond = [df[c].eqNullSafe(r[f"_g_{c}"]) for c in group_cols] + [
        df[value_col] == r["_g_v"]
    ]
    return df.join(F.broadcast(r), cond, "left").drop(
        "_g_v", *[f"_g_{c}" for c in group_cols]
    )


def woe_iv(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Weight of Evidence / Information Value per category — the
    credit-scoring-standard supervised encoding + feature-strength
    screen (Siddiqi 2006, "Credit Risk Scorecards", public
    literature): for a binary label,

        woe(c)  = ln( (pos_c + 0.5)/pos_tot  /  ((neg_c + 0.5)/neg_tot) )
        iv(c)   = ( (pos_c + 0.5)/pos_tot - (neg_c + 0.5)/neg_tot ) * woe(c)

    with the conventional +0.5 cell smoothing so categories pure in
    one class stay finite.  ``sum(iv_term)`` over the result is the
    feature's IV (the <0.02 useless / >0.3 strong rule of thumb);
    per-category WOE is the encoding a scorecard substitutes for the
    raw level.  NULL categories are kept as a level of their own
    (missingness often carries the signal).

    Scale shape: ONE keyed aggregate over |categories| groups
    (map-side combined counts), a 1-row totals broadcast, and
    scan-side closed-form math on the category-sized relation — the
    fact table is scanned once, shuffled once on the category key.
    """
    pos = F.when(F.col(label_col).cast("int") == 1, 1).otherwise(0)
    cells = df.groupBy(F.col(cat_col).alias("category")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(pos).cast("double").alias("_p"),
        F.sum(1 - pos).cast("double").alias("_q"),
    )
    tot = cells.agg(
        F.sum("_p").alias("_pt"), F.sum("_q").alias("_qt")
    )
    # one-class corpus (all labels 0 or all 1): a zero class TOTAL
    # divides by zero (ANSI error) and WoE is undefined — guard the
    # shares themselves so woe and iv_term both answer NULL (round-9
    # magnitude-boundary sweep; the 0.5 smoothing guards empty CELLS,
    # not an empty class)
    sp = F.when(F.col("_pt") > 0, (F.col("_p") + F.lit(0.5)) / F.col("_pt"))
    sq = F.when(F.col("_qt") > 0, (F.col("_q") + F.lit(0.5)) / F.col("_qt"))
    woe = F.log(sp / sq)
    return (
        cells.crossJoin(F.broadcast(tot))
        .select(
            "category",
            "n",
            F.col("_p").cast("long").alias("n_pos"),
            F.col("_q").cast("long").alias("n_neg"),
            (F.round(woe, round_to) + F.lit(0.0)).alias("woe"),
            (F.round((sp - sq) * woe, round_to) + F.lit(0.0)).alias(
                "iv_term"
            ),
        )
    )
