"""DSIR-style data selection: hashed n-gram importance resampling
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling", public literature).

The published recipe: featurize every document as a bag of hashed
n-grams, fit bucketed unigram distributions for the TARGET slice and
the RAW corpus, score each document by the summed log importance
ratio of its tokens, then resample by weight.  This module computes
the scores; resampling composes with the engine's existing
Efraimidis–Spirakis ``sampling.weighted_sample`` (exp(logw) weights)
or a deterministic ``orderBy(...).limit(k)`` top-k
(TakeOrderedAndProject — no global sort materializes).

Hashing is the engine-wide portable rolling fingerprint
(``functions.textfn.rolling_fingerprint``: h = (h*131 + cp) mod 1e9+7,
sequential char fold) so a DuckDB oracle reproduces every bucket id
bit-exactly; only the per-document float SUM of log-ratios is
order-sensitive, handled by 6-decimal rounding like every other
aggregated double on the oracle surface.

Scale shape (100 TB): one narrow explode to (doc, bucket) token rows,
ONE groupBy on ``buckets``-bounded keys for the two count columns
(raw + target share the same aggregate — a single scan, map-side
combine collapses each partition to <= buckets rows), a 1-row totals
aggregate cross-joined back (broadcast), and a broadcast join of the
``buckets``-row ratio table onto the token stream for the per-doc
sum.  No shuffle key exceeds ``buckets`` cardinality except the final
per-doc aggregate, which is the same O(docs) keyed shuffle every
per-doc statistic pays.  Bucket-count skew is bounded by Zipf mass in
the hot buckets; raise ``buckets`` to spread (the paper uses 10k).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textfn import word_fingerprints_sql


def dsir_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: Column,
    buckets: int = 256,
    smoothing: float = 1.0,
) -> DataFrame:
    """Per-document DSIR log importance weight.

    ``target`` is a boolean Column marking the rows whose token
    distribution defines the target domain (e.g. ``F.col("lang") ==
    "en"``); the raw distribution is the whole ``df``.  Laplace
    smoothing with ``smoothing`` pseudo-counts per bucket keeps
    never-seen-in-target buckets finite.

    Returns (id_col, n_tokens, logw) — logw rounded to 6 decimals
    (the bucket ids and counts underneath are integer-exact; only
    this final sum is float-order-sensitive).
    """
    if buckets < 2:
        raise ValueError(f"buckets must be >= 2, got {buckets}")
    tok = df.select(
        F.col(id_col).alias("id"),
        target.alias("_t"),
        # SQL-string fingerprint build (r13): identical fold tree,
        # one JVM parse instead of ~30 Py4J Column constructions
        F.explode(F.expr(word_fingerprints_sql(f"`{text_col}`"))).alias("fp"),
    ).select("id", "_t", (F.col("fp") % buckets).alias("bucket"))
    cnt = tok.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("raw_c"),
        F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("tgt_c"),
    )
    tot = cnt.agg(
        F.sum("raw_c").alias("_r"), F.sum("tgt_c").alias("_t_tot")
    )
    s = float(smoothing)
    ratio = cnt.crossJoin(F.broadcast(tot)).select(
        "bucket",
        (
            F.log((F.col("tgt_c") + s) / (F.col("_t_tot") + s * buckets))
            - F.log((F.col("raw_c") + s) / (F.col("_r") + s * buckets))
        ).alias("lr"),
    )
    return (
        tok.join(F.broadcast(ratio), "bucket")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            (F.round(F.sum("lr"), 6) + F.lit(0.0)).alias("logw"),
        )
        .select(F.col("id").alias(id_col), "n_tokens", "logw")
    )
