"""Document chunking for embedding / RAG pipelines (SURVEY.md §2.12
extension): split each document into fixed-size word windows with a
configurable stride (overlap = size - stride).

Two implementations of the same semantics:

* ``chunk_words`` — the hot path: pure column expressions
  (``sequence`` -> ``transform`` -> ``slice`` -> ``posexplode``),
  whole-stage-codegen'd, zero Python.  Use this one in pipelines.
* ``ChunkWords`` — a Python UDTF (``pyspark.sql.functions.udtf``)
  exposing the identical row-expansion through the lateral-join SQL
  surface (``SELECT * FROM chunk_words(TABLE(docs), ...)`` style /
  per-row invocation).  Arrow-batched, but still the slow path —
  kept because a table-function API is part of the engine surface,
  and some downstream chunkers (sentence splitters, tokenizer-aware
  packers) need imperative Python.  Unit tests assert both paths
  produce byte-identical rows.

Chunk rule: chunks start at word offsets 0, stride, 2*stride, ...
while the offset is < n_words; the final chunk is truncated (no
padding).  A doc shorter than ``size`` yields exactly one chunk.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textfn import words


def _chunk_starts(n: Column, stride: int) -> Column:
    # 1-based start offsets: 1, 1+stride, ... <= n  (slice is 1-based)
    return F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride))


def chunk_words(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 32,
    stride: int = 24,
) -> DataFrame:
    """(id, chunk_id, n_words, chunk_text) — one row per chunk.

    Scale: per-row expansion only (narrow transform, no shuffle); the
    expansion factor is ~n_words/stride, bounded and predictable, so
    partition sizing survives a 100x scale-up unchanged.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    w = words(F.col(text_col))
    chunks = F.transform(
        _chunk_starts(F.size(w), stride), lambda i: F.slice(w, i, size)
    )
    return (
        df.select(F.col(id_col), chunks.alias("chunks"))
        .select(id_col, F.posexplode("chunks").alias("chunk_id", "chunk"))
        .select(
            id_col,
            "chunk_id",
            F.size("chunk").alias("n_words"),
            F.array_join("chunk", " ").alias("chunk_text"),
        )
    )


def make_chunk_udtf(size: int = 32, stride: int = 24):
    """Build the UDTF class for a given (size, stride) — UDTF analyze
    is static, so the geometry is baked into the class like SQL
    table-function literal args."""

    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id int, n_words int, chunk_text string")
    class ChunkWords:
        def eval(self, doc_id, text: str) -> Iterator[tuple]:  # noqa: ARG002
            # mirrors F.split: "" -> [""], so both paths agree on
            # degenerate docs (one empty chunk, n_words = 1)
            toks = (text or "").split(" ")
            n = len(toks)
            for cid, lo in enumerate(range(0, n, stride)):
                piece = toks[lo : lo + size]
                yield cid, len(piece), " ".join(piece)

    return ChunkWords


def register_chunk_udtf(spark, name: str = "chunk_words", **kw) -> None:
    """Expose the chunker on the SQL surface:
    ``SELECT d.doc_id, c.* FROM docs d, LATERAL chunk_words(d.doc_id, d.text) c``
    """
    spark.udtf.register(name, make_chunk_udtf(**kw))


def length_bucket_stats(
    df: DataFrame,
    len_col: str,
    batch_tokens: int = 4096,
) -> DataFrame:
    """Power-of-two length bucketing for padded batch assembly — the
    inference/training-batcher planning step: sequences padded to
    their bucket's length waste ``bucket − len`` tokens each, and
    this operator prices that waste per bucket BEFORE any batches are
    built.

    Per bucket (the next power of two ≥ length, floor 1):
    ``n_seqs``, ``sum_tokens`` (real), ``padded_tokens``
    (n · bucket), ``waste_frac`` (padding share of the padded total)
    and ``n_batches`` (ceil(padded / batch_tokens) — full-bucket
    batches of uniform shape, the layout compilers want).

    Physical shape: pure scan-side bucket math + ONE keyed aggregate
    over ≤ log2(max_len) buckets — the output is bucket-count sized
    regardless of corpus size.  The bucket uses float log2, which is
    EXACT at powers of two (IEEE) and >1 ulp away from integers
    elsewhere, so Spark and any oracle agree on every boundary.
    """
    n = F.greatest(F.col(len_col).cast("long"), F.lit(1))
    bucket = F.pow(F.lit(2.0), F.ceil(F.log2(n))).cast("long")
    agg = (
        df.select(n.alias("_n"), bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_seqs"),
            F.sum("_n").alias("sum_tokens"),
        )
    )
    pad = F.col("n_seqs") * F.col("bucket")
    return agg.select(
        "bucket",
        "n_seqs",
        "sum_tokens",
        pad.alias("padded_tokens"),
        F.round((pad - F.col("sum_tokens")) / pad.cast("double"), 6).alias(
            "waste_frac"
        ),
        F.ceil(pad / F.lit(float(batch_tokens))).alias("n_batches"),
    )


def assemble_transcripts(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    text_col: str,
    max_tokens: int,
    tiebreak_col: str | None = None,
    sep: str = "\n",
) -> DataFrame:
    """Context-window transcript assembly — the SFT/chat-data shape:
    per entity, keep the LATEST messages whose cumulative token count
    fits ``max_tokens`` (recency-first truncation, the standard
    context-window packing rule), then emit them in chronological
    order as one transcript document.

    Returns (entity_col, n_msgs, n_kept, tokens_kept, transcript);
    an entity whose newest single message already overflows the
    budget gets an empty transcript (0 kept) rather than a silently
    truncated message — message-level truncation composes with
    ``chunk_text`` upstream if needed.

    Scale shape: ONE keyed shuffle; the reverse-cumulative token sum
    and the final assembly are per-entity windows/aggregates bounded
    by messages-per-entity (cap upstream for unbounded entities —
    same guidance as sessionization).  Tokens are whitespace tokens
    (compose with token_stats' BPE estimate for model budgets).
    """
    from pyspark.sql import Window

    tok = F.size(F.split(F.col(text_col), " "))
    order = [F.col(ts_col).desc()] + (
        [F.col(tiebreak_col).desc()] if tiebreak_col else []
    )
    w = (
        Window.partitionBy("entity")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sort_key = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    staged = df.select(
        F.col(entity_col).alias("entity"),
        *[F.col(c) for c in {ts_col, *( [tiebreak_col] if tiebreak_col else [] )}],
        F.col(text_col).alias("_txt"),
        tok.alias("_tok"),
    ).withColumn("_kept", F.sum("_tok").over(w) <= max_tokens)
    return staged.groupBy("entity").agg(
        F.count(F.lit(1)).cast("long").alias("n_msgs"),
        F.sum(F.when(F.col("_kept"), 1).otherwise(0))
        .cast("long")
        .alias("n_kept"),
        F.coalesce(
            F.sum(F.when(F.col("_kept"), F.col("_tok"))), F.lit(0)
        )
        .cast("long")
        .alias("tokens_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("_kept"),
                            F.struct(*sort_key, F.col("_txt").alias("t")),
                        )
                    )
                ),
                lambda s: s["t"],
            ),
            sep,
        ).alias("transcript"),
    ).withColumnRenamed("entity", entity_col)
