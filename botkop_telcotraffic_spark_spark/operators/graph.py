"""Connected components — the clustering step that turns near-dup
candidate PAIRS into dedup GROUPS (pick one representative per
component).  Spark has no built-in graph connectivity; this is the
DataFrame-only implementation (no GraphX/graphframes dependency).

Algorithm: iterative min-label propagation.  Every node starts
labeled with itself; each round every node takes the minimum label
among itself and its neighbors; fixpoint after O(component diameter)
rounds.  Near-dup graphs are dense little cliques (diameter 2-4), so
this converges in a handful of shuffles.  For long-chain graphs at
100 TB, switch to the large-star/small-star contraction of
Kiveris et al. (CC-MR), which converges in O(log n) rounds — same
DataFrame building blocks, more rounds bookkeeping.

Each round ends in localCheckpoint: iterative self-joins otherwise
stack an exponentially growing lineage/plan (analysis time blows up
long before data does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``
    (undirected); component = min node id reachable.

    Raises if ``max_iter`` rounds don't reach the fixpoint (raise it
    for long-chain graphs, or switch to star-contraction).
    """
    e = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    e = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    e = e.localCheckpoint()
    labels = e.select("u").distinct().withColumn("label", F.col("u"))
    for _ in range(max_iter):
        neigh = (
            e.join(labels.withColumnRenamed("u", "v"), "v")
            .groupBy("u")
            .agg(F.min("label").alias("_nl"))
        )
        stepped = labels.join(neigh, "u", "left").select(
            "u",
            F.least(
                F.col("label"), F.coalesce(F.col("_nl"), F.col("label"))
            ).alias("label"),
        )
        # pointer jumping: label <- label(label).  Labels are min-
        # monotone (label(v) <= v), so one compression hop halves the
        # remaining path length — O(log diameter) rounds instead of
        # O(diameter), i.e. fewer checkpoint+check jobs per component.
        lut = stepped.select(
            F.col("u").alias("_lu"), F.col("label").alias("_ll")
        )
        new_labels = (
            stepped.join(lut, stepped["label"] == lut["_lu"], "left")
            .select(
                "u",
                F.coalesce(F.col("_ll"), F.col("label")).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.join(labels.withColumnRenamed("label", "_old"), "u")
            .where(F.col("label") != F.col("_old"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(F.col("u").alias("node"), F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds — "
        "long-chain graph; raise max_iter or use star-contraction"
    )


def dedup_groups_from_pairs(
    all_ids: DataFrame,
    pairs: DataFrame,
    id_col: str,
    src: str = "a",
    dst: str = "b",
) -> DataFrame:
    """Full dedup output: every id mapped to its duplicate-cluster
    representative (the component min; singletons map to themselves).
    Keep rows where ``id = cluster`` to materialize the deduplicated
    corpus."""
    comps = connected_components(pairs, src=src, dst=dst)
    return (
        all_ids.select(F.col(id_col).alias("id"))
        .join(comps.withColumnRenamed("node", "id"), "id", "left")
        .select(
            "id", F.coalesce(F.col("component"), F.col("id")).alias("cluster")
        )
    )
