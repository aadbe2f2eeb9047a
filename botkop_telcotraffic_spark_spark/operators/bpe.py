"""Distributed BPE merge training (Sennrich-Haddow-Birch 2016,
public literature) — the actual tokenizer-training step of an LLM
data pipeline, on Spark.

Algorithm (word-level BPE, the standard formulation):

1. Aggregate the corpus to a (word, freq) vocabulary ONCE — after
   this the corpus is never touched again; every merge round runs on
   the vocab-sized relation (Heaps'-law sublinear in corpus size).
2. Represent each word as a sep-joined symbol sequence
   (``h␟e␟l␟l␟o␟</w>``; ␟ = U+001F, a char no fixture text
   contains — asserted in the unit test).
3. Per round: count adjacent symbol pairs weighted by word freq,
   pick the most frequent pair (count desc, then pair text asc —
   deterministic), and merge it in every word via literal
   single-pass ``replace``.

Determinism / oracle parity: the merge applies LEFT-TO-RIGHT,
NON-OVERLAPPING, ONE PASS per round — exactly what ``replace()``
does in both Spark SQL and DuckDB.  Because the pattern is
boundary-guarded (``␟l␟r␟``), a replacement CONSUMES its trailing
separator, so in a repeated chain (``aaaa`` merging ``a,a``) only
the FIRST occurrence merges that round (``aa·a·a``), the rest on
later rounds — classic BPE would merge odd/even positions in one
round.  This is the only rule both engines implement natively with
identical semantics; it is deterministic and converges to the same
merge table on natural text (repeated-identical-pair chains are the
single divergence, exercised in tests).

Scale shape: one corpus-sized keyed aggregate (word counts), then
``n_merges`` rounds of [vocab-scan pair-count aggregate (map-side
combined, pair-space keys) + 1-row top-pair collect + vocab-wide
literal replace].  The driver holds only the n_merges picked pairs
(model-sized); the vocab relation is localCheckpoint'ed per round to
cut the growing lineage (the iterative-operator convention —
`graph.py` k-core / PageRank).  On a cluster swap localCheckpoint
for persist+count; rounds are inherently sequential (each merge
depends on the last), as in every BPE trainer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"
END_WORD = "</w>"


def word_vocab(df: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) over space-tokenized text — the one corpus-sized
    aggregate of BPE training."""
    return (
        df.select(
            F.explode(
                F.filter(
                    F.split(F.col(text_col), " "), lambda w: w != ""
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )


def _initial_rep(word_col: str) -> F.Column:
    """sep-joined character symbols + end-of-word marker.

    Characters come from ``substring(word, i, 1)`` — CHARACTER
    indexed in both Spark and DuckDB (not a regex split, whose
    code-unit semantics could diverge on astral-plane text)."""
    chars = F.expr(
        f"transform(sequence(1, length({word_col})), "
        f"i -> substring({word_col}, i, 1))"
    )
    return F.concat(
        F.array_join(chars, SEP), F.lit(SEP), F.lit(END_WORD)
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(left, right, cnt): adjacent symbol pairs weighted by freq.

    The symbol array is materialized in its own projection before the
    pair transform so CollapseProject cannot inline the split into
    every pair position (the token_postings O(n²) lesson)."""
    syms = vocab.select(
        "freq", F.split(F.col("rep"), SEP).alias("_s")
    )
    pairs = F.expr(
        "transform(sequence(1, size(_s) - 1), "
        "i -> struct(element_at(_s, i) AS l, element_at(_s, i + 1) AS r))"
    )
    return (
        syms.select(F.col("freq"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.l").alias("left"), F.col("p.r").alias("right"))
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_merges(
    df: DataFrame,
    text_col: str,
    n_merges: int = 10,
    return_vocab: bool = False,
    sample_fraction: float | None = None,
    sample_key_col: str | None = None,
):
    """Train ``n_merges`` BPE merges; returns the merge table
    (step, left, right, merged, cnt) — ``n_merges`` rows, the
    artifact a tokenizer ships.  With ``return_vocab=True`` also
    returns the post-training (word, rep) vocabulary (the encode
    step reuses it instead of replaying the merges).

    ``cnt`` is the weighted occurrence count of the pair at the time
    it was picked (single-pass adjacency, see module docstring).

    ``sample_fraction``: train on a DETERMINISTIC hash-sample of the
    documents (keep rows where xxhash64(text) mod 2^20 falls under
    fraction·2^20) — the standard 100 TB recipe: tokenizer merge
    ranks stabilize long before the full corpus is seen (GPT-2/
    SentencePiece train on samples), so training cost becomes
    sample-sized while the ENCODE step still covers every document.
    Deterministic across runs and cluster layouts (pure function of
    the text bytes, no RNG, no partition dependence); None (default)
    trains on the full corpus.  See SCALE.md "Distributed BPE".

    ``sample_key_col``: when given alongside ``sample_fraction``, the
    sample decision hashes THIS stable key with the engine-wide
    PORTABLE rolling fingerprint (sampling.hash_bucket, salt "bpe:")
    instead of xxhash64(text) — bit-reproducible in ANSI SQL, so the
    sampled training run is itself oracle-checkable (the
    bpe_merges_sampled_docs registry entry pins exactly this path).
    xxhash64 stays the default engine-fast path when no key is given
    (JVM intrinsic vs an interpreted per-char fold over the full
    text).
    """
    spark = df.sparkSession
    if sample_fraction is not None and sample_fraction < 1.0:
        if sample_key_col is not None:
            from .sampling import hash_bucket

            buckets = 10_000
            df = df.where(
                hash_bucket(F.col(sample_key_col), buckets, salt="bpe:")
                < F.lit(int(sample_fraction * buckets))
            )
        else:
            denom = 1 << 20
            thr = int(sample_fraction * denom)
            df = df.where(
                F.pmod(F.xxhash64(F.col(text_col)), F.lit(denom)) < F.lit(thr)
            )
    vocab = word_vocab(df, text_col).select(
        "word", _initial_rep("word").alias("rep"), "freq"
    )
    merges: list[tuple[int, str, str, str, int]] = []
    # Per-round top-pair plan as ONE parameterized spark.sql call
    # (r13): the same _pair_counts projection/aggregate and ORDER BY
    # cnt DESC, left, right LIMIT 1 cut the per-op chain produced
    # (the separator rides in as a bound parameter, never spliced
    # into the SQL text), ~3 Py4J round-trips per round instead of
    # ~25.  _pair_counts stays for the vocab/encode callers.
    _top_sql = """
        WITH syms AS (SELECT freq, split(rep, :sep) AS _s FROM {vocab}),
        pc AS (
          SELECT p.l AS `left`, p.r AS `right`, sum(freq) AS cnt
          FROM (SELECT freq,
                       explode(transform(sequence(1, size(_s) - 1),
                         i -> struct(element_at(_s, i) AS l,
                                     element_at(_s, i + 1) AS r))) AS p
                FROM syms)
          GROUP BY p.l, p.r
        )
        SELECT * FROM pc ORDER BY cnt DESC, `left` ASC, `right` ASC LIMIT 1
    """
    for step in range(1, n_merges + 1):
        top = spark.sql(_top_sql, args={"sep": SEP}, vocab=vocab).collect()
        if not top:
            break
        l, r, cnt = top[0]["left"], top[0]["right"], int(top[0]["cnt"])
        merged = l + r
        merges.append((step, l, r, merged, cnt))
        # Boundary-guarded merge: pad with sep on both ends and match
        # ␟l␟r␟ so a symbol merely ENDING in l (or starting with r)
        # can never false-match; strip the pads after.  Single pass,
        # left-to-right — identical in Spark and DuckDB.
        padded = F.concat(F.lit(SEP), F.col("rep"), F.lit(SEP))
        replaced = F.replace(
            padded,
            F.lit(f"{SEP}{l}{SEP}{r}{SEP}"),
            F.lit(f"{SEP}{merged}{SEP}"),
        )
        # LAZY checkpoint: the next step's top-pair collect (or the
        # return_vocab consumer) materializes it inside its own
        # action — one action per merge step instead of two, and the
        # final step's vocab is never materialized when unused.
        vocab = vocab.select(
            "word",
            F.btrim(replaced, F.lit(SEP)).alias("rep"),
            "freq",
        ).localCheckpoint(eager=False)
    merges_df = spark.createDataFrame(
        merges, "step int, left string, right string, merged string, cnt long"
    )
    if return_vocab:
        return merges_df, vocab.select("word", "rep")
    return merges_df


def bpe_token_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_merges: int = 10,
) -> DataFrame:
    """Train ``n_merges`` merges, APPLY them, and report per-document
    BPE token counts — the full tokenizer loop (train -> encode),
    and the honest replacement for the heuristic ``bpe_token_est``
    in text.token_stats.

    Returns (id_col, n_words, n_tokens): whitespace word count and
    the post-merge symbol count summed over the document's words.

    Scale shape: training as in ``bpe_merges`` (which carries the
    word column through, so the trained vocab IS the encode table —
    no merge replay); application is a WORD-LEVEL join — each word's
    final symbol count comes from the trained vocab relation
    (vocab-sized), joined back to the document's exploded words (one
    keyed shuffle), then re-aggregated per document.  The corpus is
    never re-tokenized per merge.
    """
    _, vocab = bpe_merges(df, text_col, n_merges, return_vocab=True)
    word_tokens = vocab.select(
        "word", F.size(F.split(F.col("rep"), SEP)).alias("_wt")
    )
    doc_words = df.select(
        F.col(id_col),
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
        ).alias("word"),
    )
    return (
        doc_words.join(word_tokens, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("_wt").cast("long").alias("n_tokens"),
        )
    )
