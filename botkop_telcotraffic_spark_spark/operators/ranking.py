"""Retrieval-quality metrics — the offline eval loop for the
similarity-search operators (operators/similarity.py): given ranked
candidates with graded relevance, compute per-query MRR, NDCG@k and
recall@k.  This is how an embedding index (IVF/LSH vs brute force)
or a reranker is actually judged before it ships into a RAG or
dedup pipeline.

Physical shape: metrics are per-query aggregates over an
already-small candidate list (queries × k rows), so the whole
computation is one window pass (ideal ranking for IDCG) + one
groupBy on the query id — no joins against the corpus, nothing
driver-side.  At 100 TB the eval set shards by query id like any
keyed aggregate.

Determinism: DCG/IDCG use log2 on small integer ranks (exact in
doubles) and the per-query sums are over <= k terms; results are
rounded before comparison like every float-bearing query in the
engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ranking_metrics(
    ranked: DataFrame,
    query_col: str,
    rank_col: str,
    rel_col: str,
    k: int = 10,
) -> DataFrame:
    """Per-query retrieval metrics from (query, rank, relevance) rows.

    ``rank_col``: 1-based position assigned by the system under eval.
    ``rel_col``: graded relevance (0 = irrelevant); binary inputs are
    the usual case but grades work (standard DCG gain = rel).

    Returns one row per query:
    (query, n_candidates, n_relevant, mrr, ndcg_at_k, recall_at_k).

    * mrr: 1/rank of the first relevant candidate (0 if none).
    * ndcg_at_k: DCG@k / IDCG@k with DCG = Σ rel_i / log2(i + 1);
      IDCG ranks the SAME candidate list ideally (rel desc, then
      system rank for determinism).  0 when the list has no
      relevant candidate.
    * recall_at_k: relevant found in the top k / relevant in the
      whole candidate list (the retrieval-stage recall proxy;
      corpus-wide recall needs corpus-wide labels).
    """
    q = F.col(query_col)
    rank = F.col(rank_col)
    rel = F.col(rel_col).cast("double")

    w_ideal = Window.partitionBy(q).orderBy(F.desc(rel_col), rank_col)
    staged = ranked.select(
        q.alias("_q"),
        rank.alias("_rank"),
        rel.alias("_rel"),
        F.row_number().over(w_ideal).alias("_ideal_rank"),
    )

    dcg = F.sum(
        F.when(
            F.col("_rank") <= k,
            F.col("_rel") / F.log2(F.col("_rank") + 1),
        ).otherwise(0.0)
    )
    idcg = F.sum(
        F.when(
            F.col("_ideal_rank") <= k,
            F.col("_rel") / F.log2(F.col("_ideal_rank") + 1),
        ).otherwise(0.0)
    )
    first_rel_rank = F.min(F.when(F.col("_rel") > 0, F.col("_rank")))
    n_rel = F.sum(F.when(F.col("_rel") > 0, 1).otherwise(0))
    n_rel_topk = F.sum(
        F.when((F.col("_rel") > 0) & (F.col("_rank") <= k), 1).otherwise(0)
    )

    return staged.groupBy(F.col("_q").alias(query_col)).agg(
        F.count(F.lit(1)).alias("n_candidates"),
        n_rel.cast("long").alias("n_relevant"),
        F.coalesce(1.0 / first_rel_rank, F.lit(0.0)).alias("mrr"),
        F.when(idcg > 0, dcg / idcg).otherwise(0.0).alias("ndcg_at_k"),
        F.when(n_rel > 0, n_rel_topk.cast("double") / n_rel)
        .otherwise(0.0)
        .alias("recall_at_k"),
    )


def bm25_scores(
    docs,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 20,
):
    """Okapi BM25 scoring of every document against a fixed query
    term set (Robertson & Walker 1994; the Lucene idf variant
    ``ln((N - df + 0.5) / (df + 0.5) + 1)``, which is always
    positive) — the lexical-retrieval complement of the embedding
    ANN family, and the usual first stage before MMR re-ranking.

    Returns the ``top_n`` docs by score: (id_col, matched_terms,
    score, rank); ties break on the doc id.

    Physical shape — the 100 TB discipline:
      * doc length is computed SCAN-SIDE (size of the token array) —
        no separate length aggregate;
      * postings are filtered to the broadcast query-term set BEFORE
        the (doc, term) aggregate, so the shuffle carries only
        matching occurrences (|q| terms, not the vocabulary);
      * df and avgdl are |q|-row / 1-row broadcast aggregates;
      * one final groupBy(doc) sums <= |q| per-term scores, then a
        global top-n (TakeOrderedAndProject).
    """
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    spark = docs.sparkSession
    # ONE parameterized spark.sql call (r13): the same scan-side
    # tokenize + broadcast term filter + (doc, term) tf aggregate +
    # |q|-row df / 1-row stats broadcasts + per-doc score sum the
    # per-op chain produced — identical arithmetic (double literals
    # D-suffixed so they parse to the exact F.lit doubles), built
    # with ~2 Py4J round-trips instead of ~70.  The global top-n is
    # the same ORDER BY round(score) LIMIT cut
    # (TakeOrderedAndProject), rank windowed over only top_n rows.
    terms_values = ", ".join(
        "('" + t.replace("'", "''") + "')" for t in sorted(set(query_terms))
    )
    q = f"""
    WITH base AS (
      SELECT _id, size(_w) AS _dl, explode(_w) AS term
      FROM (SELECT `{id_col}` AS _id, split(`{text_col}`, ' ') AS _w
            FROM {{docs}})
    ),
    qt AS (SELECT term FROM (VALUES {terms_values}) AS v(term)),
    matched AS (
      SELECT /*+ BROADCAST(qt) */ base.* FROM base JOIN qt USING (term)
    ),
    stats AS (
      SELECT CAST(count(1) AS DOUBLE) AS _N, avg(_dl0) AS _avgdl
      FROM (SELECT size(split(`{text_col}`, ' ')) AS _dl0 FROM {{docs}})
    ),
    tf AS (
      SELECT _id, term, CAST(count(1) AS DOUBLE) AS _tf,
             CAST(first(_dl) AS DOUBLE) AS _dl
      FROM matched GROUP BY _id, term
    ),
    df_tbl AS (
      SELECT term, CAST(count(1) AS DOUBLE) AS _df FROM tf GROUP BY term
    ),
    scored AS (
      SELECT /*+ BROADCAST(df_tbl), BROADCAST(stats) */ _id,
             count(1) AS matched_terms,
             sum(ln((_N - _df + 0.5D) / (_df + 0.5D) + 1.0D)
                 * (_tf * {float(k1 + 1.0)!r}D)
                 / (_tf + {float(k1)!r}D
                    * ({float(1.0 - b)!r}D + {float(b)!r}D * _dl / _avgdl)))
               AS _score
      FROM tf JOIN df_tbl USING (term) CROSS JOIN stats
      GROUP BY _id
    ),
    cut AS (
      SELECT * FROM scored ORDER BY round(_score, 6) DESC, _id
      LIMIT {int(top_n)}
    )
    SELECT _id AS `{id_col}`, matched_terms,
           round(_score, 6) AS score,
           row_number() OVER (ORDER BY round(_score, 6) DESC, _id) AS rank
    FROM cut
    """
    return spark.sql(q, docs=docs)


def rrf_fuse(
    rankings,
    id_col: str,
    rank_col: str = "rank",
    k: int = 60,
    top_n: int = 20,
):
    """Reciprocal Rank Fusion (Cormack, Clarke & Buettcher 2009,
    public literature): combine N independent rankings of the same id
    space by ``score(id) = Σ_lists 1 / (k + rank)`` — the standard
    hybrid-search merge (BM25 lexical + embedding ANN) that needs no
    score calibration between the lists.

    ``rankings``: list of DataFrames each carrying (id_col, rank_col).
    Returns (id_col, n_lists, rrf_score, fused_rank) for the top_n
    fused ids; ties break on the id.

    Scale shape: inputs are already top-n-sized (the upstream
    retrievers' cut), so the union + groupBy is list-count × n rows —
    broadcast territory; the final cut is TakeOrderedAndProject.  The
    operator never touches the corpora, only the rankings.
    """
    if not rankings:
        raise ValueError("rankings must be non-empty")
    # ONE parameterized spark.sql call (r13): same per-list 1/(k+rank)
    # projection, UNION ALL, fused aggregate and top-n cut the per-op
    # chain produced (1.0D / (kD + CAST(rank AS DOUBLE)) is the exact
    # F.lit arithmetic), ~3 Py4J round-trips instead of ~25.
    spark = rankings[0].sparkSession
    contrib = f"1.0D / ({float(k)!r}D + CAST(`{rank_col}` AS DOUBLE))"
    union = " UNION ALL ".join(
        f"SELECT `{id_col}` AS _id, {contrib} AS _c FROM {{r{i}}}"
        for i in range(len(rankings))
    )
    q = f"""
    WITH u AS ({union}),
    fused AS (
      SELECT _id, count(1) AS n_lists, round(sum(_c), 6) AS rrf_score
      FROM u GROUP BY _id
    ),
    cut AS (
      SELECT * FROM fused ORDER BY rrf_score DESC, _id LIMIT {int(top_n)}
    )
    SELECT _id AS `{id_col}`, n_lists, rrf_score,
           row_number() OVER (ORDER BY rrf_score DESC, _id) AS fused_rank
    FROM cut
    """
    return spark.sql(q, **{f"r{i}": r for i, r in enumerate(rankings)})


def cross_encoder_rerank(
    docs,
    shortlist,
    query_terms: list[str],
    query_vec=None,
    doc_vecs=None,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_col: str = "embedding",
    vec_id_col: str = "vec_id",
    weights: tuple = (2.0, 1.5, 1.0, 0.25),
):
    """Cross-encoder-style rerank of a bounded retrieval shortlist —
    the final stage of the BM25 → ANN → RRF → MMR chain.  A real
    cross-encoder scores each (query, document) PAIR with full
    interaction between the two texts; this deterministic stand-in
    computes the classic interaction features a learned model
    consumes (and that a bi-encoder cosine cannot see), combined with
    fixed weights through a logistic link:

      * coverage  = distinct query terms present / |query|
      * proximity = 1 / (1 + min_gap), where min_gap is the minimum
        token distance between occurrences of two DIFFERENT query
        terms (0 when fewer than 2 distinct terms match) — positional
        interaction, the hallmark cross-encoder signal;
      * cosine    = embedding similarity query ↔ doc (0 if absent);
      * ltf       = ln(1 + total query-term occurrences);
      * ce_score  = sigmoid(w · [coverage, proximity, cosine, ltf]).

    min_gap uses the sorted-adjacency equivalence: in the
    position-sorted hit list the minimal distinct-term pair is always
    adjacent (any closer hit in between either forms a closer
    distinct pair or shares the left term, pushing a distinct
    boundary right) — so one array_sort + one zip_with over shifted
    slices, O(h log h) per doc instead of the O(h²) pair join.

    Physical shape — the production cross-encoder pattern: retrieval
    is cheap at corpus scale, the EXPENSIVE per-pair scoring runs
    only on the k-row shortlist.  Documents are broadcast-semi-joined
    against the shortlist ids (one corpus scan, k rows survive), all
    features are column expressions on those k rows, the query vector
    is a 1-row broadcast.  Nothing here grows with the corpus.

    Returns shortlist columns + (n_terms, n_hits, min_gap [-1 when
    undefined], coverage, proximity, cosine, ce_score, ce_rank);
    ties break on the id.
    """
    from ..functions import vector
    from ..functions.textfn import words

    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    nq = len(set(query_terms))
    w_cov, w_prox, w_cos, w_ltf = (float(w) for w in weights)

    ids = shortlist.select(id_col)
    hits = (
        docs.join(F.broadcast(ids), id_col)
        .select(id_col, F.posexplode(words(F.col(text_col))).alias("pos", "term"))
        .where(F.col("term").isin([str(t) for t in set(query_terms)]))
    )
    srt = F.array_sort(F.collect_list(F.struct("pos", "term")))
    feats = hits.groupBy(id_col).agg(
        F.countDistinct("term").alias("n_terms"),
        F.count(F.lit(1)).alias("n_hits"),
        srt.alias("_hs"),
    )
    # adjacent distinct-term gaps over the position-sorted hits
    adj = F.zip_with(
        F.slice(F.col("_hs"), 1, F.size("_hs") - 1),
        F.slice(F.col("_hs"), 2, F.size("_hs") - 1),
        lambda a, b: F.when(a["term"] != b["term"], b["pos"] - a["pos"]),
    )
    feats = feats.withColumn(
        "min_gap",
        F.array_min(F.filter(adj, lambda x: x.isNotNull())).cast("long"),
    ).drop("_hs")

    out = shortlist.join(feats, id_col, "left")
    if query_vec is not None and doc_vecs is not None:
        qv = F.broadcast(query_vec.select(F.col(vec_col).alias("_qv")))
        cosd = (
            doc_vecs.select(
                F.col(vec_id_col).alias(id_col), F.col(vec_col).alias("_dv")
            )
            .join(F.broadcast(ids), id_col)
            .crossJoin(qv)
            .select(
                id_col,
                F.expr(vector.cosine_sql("_dv", "_qv")).alias("_cos"),
            )
        )
        out = out.join(cosd, id_col, "left")
    else:
        out = out.withColumn("_cos", F.lit(None).cast("double"))

    coverage = F.coalesce(F.col("n_terms"), F.lit(0)).cast("double") / float(nq)
    proximity = F.when(
        F.col("min_gap").isNotNull(),
        F.lit(1.0) / (F.lit(1.0) + F.col("min_gap").cast("double")),
    ).otherwise(F.lit(0.0))
    cosine = F.coalesce(F.col("_cos"), F.lit(0.0))
    ltf = F.log(
        F.lit(1.0) + F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
    )
    z = (
        F.lit(w_cov) * coverage
        + F.lit(w_prox) * proximity
        + F.lit(w_cos) * cosine
        + F.lit(w_ltf) * ltf
    )
    ce = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6) + F.lit(0.0)
    scored = out.select(
        *[F.col(c) for c in shortlist.columns],
        F.coalesce(F.col("n_terms"), F.lit(0)).cast("long").alias("n_terms"),
        F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
        F.coalesce(F.col("min_gap"), F.lit(-1)).cast("long").alias("min_gap"),
        (F.round(coverage, 6) + F.lit(0.0)).alias("coverage"),
        (F.round(proximity, 6) + F.lit(0.0)).alias("proximity"),
        (F.round(cosine, 6) + F.lit(0.0)).alias("cosine"),
        ce.alias("ce_score"),
    )
    w = Window.orderBy(F.col("ce_score").desc(), F.col(id_col))
    return scored.withColumn("ce_rank", F.row_number().over(w))
