"""Benchmark-contamination detection (SURVEY.md §2.12 extension):
flag training documents whose k-word shingles overlap a benchmark /
eval set — the decontamination step every LLM training pipeline runs
before training (PaLM used 8-gram overlap; GPT-3 used 13-gram).

Design (Spark-first):
  1. both sides project to DISTINCT k-shingle rolling-hash tokens
     (integer tokens via ``textfn.shingle_tokens_from_fps`` — pure
     column expressions, codegen'd, no Python);
  2. the benchmark token set is aggregated to DISTINCT tokens and
     **broadcast** — eval sets are small (thousands of docs) even
     when the train corpus is 100 TB, so the overlap join is a
     map-side broadcast-hash join with zero shuffle on the fat side;
  3. one hash aggregation per train doc counts overlapping tokens;
     the per-doc shingle totals ride along in the same aggregate
     (conditional count) so no second scan or join is needed.

At scale: the explode produces ~n_words rows per doc but they are
consumed map-side by the partial aggregate (per-doc keys are
partition-local after the explode), so the only shuffle is the final
per-doc count — O(contaminated docs), tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textfn import shingle_tokens_sql, word_fingerprints_sql


def _doc_tokens(df: DataFrame, id_col: str, text_col: str, k: int) -> DataFrame:
    """(id, tok) postings of DISTINCT k-shingle tokens per doc.

    Built via the SQL-string fingerprint/shingle twins (r13):
    identical fold trees and integers, one JVM parse per stage
    instead of ~60 Py4J Column constructions."""
    wf = df.selectExpr(
        f"`{id_col}` AS id",
        f"{word_fingerprints_sql(f'`{text_col}`')} AS wf",
    )
    toks = wf.selectExpr(
        "id",
        f"explode(array_distinct({shingle_tokens_sql('wf', k)})) AS tok",
    )
    return toks


def benchmark_overlap(
    train: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
) -> DataFrame:
    """Per-train-doc contamination against the benchmark set.

    Returns (id, n_overlap, n_shingles, overlap_frac) for every train
    doc with at least one shingle shared with any benchmark doc.
    ``overlap_frac`` near 1.0 means the doc is (close to) a verbatim
    copy of benchmark material and must be dropped before training.
    """
    train_toks = _doc_tokens(train, id_col, text_col, k)
    bench_toks = (
        _doc_tokens(bench, id_col, text_col, k).select("tok").distinct()
    )
    hit = F.col("hit")
    marked = train_toks.join(
        F.broadcast(bench_toks.withColumn("hit", F.lit(True))), "tok", "left"
    )
    per_doc = marked.groupBy("id").agg(
        F.count(F.when(hit, True)).alias("n_overlap"),
        F.count(F.lit(1)).alias("n_shingles"),
    )
    return per_doc.where(F.col("n_overlap") > 0).select(
        F.col("id").alias(id_col),
        "n_overlap",
        "n_shingles",
        F.round(F.col("n_overlap") / F.col("n_shingles"), 6).alias("overlap_frac"),
    )


def cross_corpus_overlap(
    left: DataFrame,
    right: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    min_shared: int = 2,
    max_token_freq: int | None = None,
) -> DataFrame:
    """Big-vs-big n-gram overlap: document pairs (one from each
    corpus) sharing >= ``min_shared`` distinct k-word shingles, with
    per-side overlap fractions.  This is the decontamination /
    cross-snapshot dedup shape when BOTH sides are large (snapshot A
    vs snapshot B of a crawl) and ``benchmark_overlap``'s broadcast
    of the small side no longer applies.

    Returns (a_id, b_id, n_shared, size_a, size_b, frac_a, frac_b),
    frac = n_shared / distinct-shingle count of that side, rounded
    to 6.

    Scale shape: both sides explode to DISTINCT (token, id) postings
    and meet in ONE shuffle-hash join on the 8-byte token — the
    bipartite twin of ``jaccard_pairs``'s self-join, with the same
    hot-token hazard and the same cure: ``max_token_freq`` drops
    tokens whose combined document frequency exceeds the cap
    (boilerplate shingles explode the pair count quadratically and
    carry no contamination signal at sane thresholds).  The pair
    aggregate's key set is bounded by truly-overlapping pairs, not
    the cross product.
    """
    lt = _doc_tokens(left, id_col, text_col, k)
    rt = _doc_tokens(right, id_col, text_col, k)
    if max_token_freq is not None:
        hot = (
            lt.select("tok").union(rt.select("tok"))
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") > max_token_freq)
            .select("tok")
        )
        lt = lt.join(hot, "tok", "left_anti")
        rt = rt.join(hot, "tok", "left_anti")
    ls = lt.groupBy("id").agg(F.count(F.lit(1)).alias("size_a"))
    rs = rt.groupBy("id").agg(F.count(F.lit(1)).alias("size_b"))
    pairs = (
        lt.select(F.col("id").alias("a_id"), "tok")
        .join(rt.select(F.col("id").alias("b_id"), "tok"), "tok")
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    return (
        pairs.join(ls.withColumnRenamed("id", "a_id"), "a_id")
        .join(rs.withColumnRenamed("id", "b_id"), "b_id")
        .select(
            "a_id",
            "b_id",
            "n_shared",
            F.col("size_a").cast("long").alias("size_a"),
            F.col("size_b").cast("long").alias("size_b"),
            (F.round(F.col("n_shared") / F.col("size_a"), 6) + F.lit(0.0)).alias("frac_a"),
            (F.round(F.col("n_shared") / F.col("size_b"), 6) + F.lit(0.0)).alias("frac_b"),
        )
    )
