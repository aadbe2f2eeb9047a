"""Association-rule mining (support / confidence / lift) over
basket-shaped data — market-basket analysis, co-access patterns,
"users who triggered X also triggered Y".

Distinct from the bigram-PMI collocation miner (`operators/text.py`
path): PMI scores ADJACENT word pairs inside documents; association
rules score CO-OCCURRENCE of items within an unordered basket, in
both directions (confidence is asymmetric: a→b ≠ b→a).

    support(a→b)    = |baskets ∋ {a,b}|
    confidence(a→b) = support(a,b) / support(a)
    lift(a→b)       = confidence(a→b) / (support(b) / N)

Physical shape: basket-item pairs are deduplicated once (one keyed
shuffle), the pair join is keyed on the basket id (per-basket
blow-up bounded by basket size squared — baskets are small by
domain; a degenerate mega-basket is a data bug this would surface,
not hide), pair counts are a keyed aggregate with ``min_support``
pruning BEFORE the metric joins, and the two item-support joins run
on the pruned pair table (AQE broadcasts the item table when small).
N rides a 1-row broadcast.  Nothing is quadratic in items globally —
only within a basket.

Round-4→5 perf adjudication (`assoc_rules_parts`, sf0.1): the r4
full-sweep row read 2.96 s vs 1.71 s in r3 — flagged as a possible
regression.  Isolated fresh-JVM A/B (warmup + best-of-2, the ANN
methodology): r3-end commit 034270b best = 2.01–2.28 s, round-5 HEAD
best = 1.97 s.  HEAD is at parity-or-better in isolation; the
in-sweep number was shared-JVM aging (the sweep grew from ~110 to
196 queries between rounds), not a plan regression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def association_rules(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    round_to: int = 6,
) -> DataFrame:
    """(antecedent, consequent, support, confidence, lift) for every
    directed item pair co-occurring in ≥ ``min_support`` baskets."""
    bi = df.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("item")
    ).distinct()
    n_baskets = bi.select("b").distinct().agg(
        F.count(F.lit(1)).cast("double").alias("_n")
    )
    item_sup = bi.groupBy("item").agg(F.count(F.lit(1)).alias("sup"))
    rhs = bi.select(F.col("b"), F.col("item").alias("consequent"))
    pairs = (
        bi.select(F.col("b"), F.col("item").alias("antecedent"))
        .join(rhs, "b")
        .where(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).alias("support"))
        .where(F.col("support") >= min_support)
    )
    return (
        pairs.join(
            item_sup.select(
                F.col("item").alias("antecedent"), F.col("sup").alias("_sa")
            ),
            "antecedent",
        )
        .join(
            item_sup.select(
                F.col("item").alias("consequent"), F.col("sup").alias("_sb")
            ),
            "consequent",
        )
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "antecedent",
            "consequent",
            "support",
            F.round(F.col("support") / F.col("_sa"), round_to).alias(
                "confidence"
            ),
            F.round(
                (F.col("support") / F.col("_sa"))
                / (F.col("_sb") / F.col("_n")),
                round_to,
            ).alias("lift"),
        )
    )
