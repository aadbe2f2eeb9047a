"""Tests for the LLM-pipeline extension operators added on top of the
core text surface: contamination scan, sequence packing, blocklist
gate, chunking (native + UDTF parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from botkop_telcotraffic_spark_spark.operators import chunking, contamination, sampling, text
from botkop_telcotraffic_spark_spark.functions.textfn import words


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_native_equals_udtf(spark):
    """The codegen chunker and the Python UDTF produce identical rows
    (including the truncated tail chunk and short-doc edge cases)."""
    df = _docs(
        spark,
        [
            (1, " ".join(f"w{i}" for i in range(70))),
            (2, "just three words"),
            (3, "solo"),
            (4, ""),
        ],
    )
    native = chunking.chunk_words(df, "doc_id", "text", size=16, stride=10)
    got = sorted(tuple(r) for r in native.collect())

    chunking.register_chunk_udtf(spark, "chunk16", size=16, stride=10)
    df.createOrReplaceTempView("chunk_docs_in")
    via_udtf = spark.sql(
        "SELECT d.doc_id, c.chunk_id, c.n_words, c.chunk_text "
        "FROM chunk_docs_in d, LATERAL chunk16(d.doc_id, d.text) c"
    )
    assert sorted(tuple(r) for r in via_udtf.collect()) == got

    # expansion sanity: 70 words, stride 10 -> 7 chunks, last is 60..69
    by_doc = [r for r in got if r[0] == 1]
    assert len(by_doc) == 7
    assert by_doc[-1][2] == 10 and by_doc[-1][3].startswith("w60")


def test_pack_sequences_conservation(spark):
    """Every doc lands in exactly one pack; token totals are conserved;
    pack ids within a shard are dense from 0."""
    rows = [(i, " ".join(["tok"] * (5 + i % 7))) for i in range(100)]
    df = _docs(spark, rows).select(
        "doc_id", F.size(words(F.col("text"))).alias("n_tokens")
    )
    packs = sampling.pack_sequences(df, "doc_id", "n_tokens", budget=40, shards=4)
    p = packs.collect()
    total_tokens = sum(5 + i % 7 for i in range(100))
    assert sum(r["pack_tokens"] for r in p) == total_tokens
    assert sum(r["n_docs"] for r in p) == 100
    for shard in range(4):
        ids = sorted(r["pack_id"] for r in p if r["shard"] == shard)
        assert ids == list(range(len(ids)))
        # packs hold >= 1 doc and (except possibly the last) cross the budget
        sizes = {r["pack_id"]: r["pack_tokens"] for r in p if r["shard"] == shard}
        for pid in ids[:-1]:
            assert sizes[pid] + 11 > 40  # next doc (<= 11 tokens) overflowed


def test_contamination_detects_planted_copy(spark):
    shared = " ".join(f"s{i}" for i in range(20))
    train = _docs(
        spark,
        [
            (1, shared),  # verbatim copy of bench doc
            (2, shared + " extra tail words here now ok fine yes sure"),
            (3, " ".join(f"u{i}" for i in range(30))),  # clean
        ],
    )
    bench = _docs(spark, [(100, shared)])
    out = contamination.benchmark_overlap(train, bench, "doc_id", "text", k=8)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["overlap_frac"] == 1.0
    assert 0.0 < rows[2]["overlap_frac"] < 1.0
    assert 3 not in rows


def test_blocklist_gate_rules(spark):
    clean = " ".join(["fine"] * 30)
    spammy = " ".join(["slow"] * 10 + ["fine"] * 20)  # 1/3 flagged
    short = "fine words only"
    df = _docs(spark, [(1, clean), (2, spammy), (3, short)])
    out = {r["doc_id"]: r for r in text.blocklist_gate(df, "doc_id", "text").collect()}
    assert out[1]["keep"] and out[1]["n_flagged"] == 0
    assert not out[2]["keep"] and out[2]["n_flagged"] == 10
    assert not out[3]["keep"]  # under the word floor
    assert abs(out[2]["flagged_frac"] - round(10 / 30, 6)) < 1e-9


def test_temperature_mix_flattens_sources(spark):
    """alpha=0.5 mixing: the smallest source survives whole; keep
    rates decrease with source size; selection is deterministic."""
    rows = (
        [(i, "s_big") for i in range(4000)]
        + [(i + 10_000, "s_mid") for i in range(1000)]
        + [(i + 20_000, "s_small") for i in range(100)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = sampling.temperature_mix(df, "doc_id", "source", alpha=0.5)
    counts = {r["source"]: r["n"] for r in
              kept.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts["s_small"] == 100  # smallest keeps everything
    rate_big = counts["s_big"] / 4000
    rate_mid = counts["s_mid"] / 1000
    assert rate_big < rate_mid < 1.0
    # expected rates ~ sqrt(n_small/n): 0.158, 0.316 (hash noise ~1%)
    assert abs(rate_big - (100 / 4000) ** 0.5) < 0.05
    assert abs(rate_mid - (100 / 1000) ** 0.5) < 0.05
    # deterministic: second run identical
    again = sampling.temperature_mix(df, "doc_id", "source", alpha=0.5)
    assert sorted(r["doc_id"] for r in again.collect()) == sorted(
        r["doc_id"] for r in kept.collect()
    )


def test_ngram_lm_score_flags_gibberish(spark):
    """A doc with corpus-typical character statistics must outscore a
    gibberish doc under the corpus-trained trigram model."""
    from pyspark.sql import functions as F

    from botkop_telcotraffic_spark_spark.operators.text import ngram_lm_score

    normal = "the quick brown fox jumps over the lazy dog and runs away "
    docs = [(i, normal * 3) for i in range(20)]
    docs.append((99, "xq zvkj qqwx jzxv kqzj xxqv zzjk qvxz jkqx vzqj " * 3))
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    scores = {
        r["doc_id"]: r["avg_logprob"]
        for r in ngram_lm_score(df, "doc_id", "text").collect()
    }
    assert scores[99] < scores[0], scores


def test_ngram_lm_score_broadcasts_model_on_testdata(spark):
    from botkop_telcotraffic_spark_spark.operators.text import ngram_lm_score
    from botkop_telcotraffic_spark_spark.plans.inspect import physical_plan

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = physical_plan(ngram_lm_score(d, "doc_id", "text"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan


def test_bigram_pmi_survives_single_token_docs(spark, monkeypatch):
    """A one-token (or empty) doc must contribute zero bigrams, not
    crash the descending-sequence element_at path."""
    import __spark_entry__ as m

    docs = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "a b a b a b a b a b a b")],
        ["doc_id", "text"],
    )
    monkeypatch.setattr(m, "_t", lambda spark, sf, name: docs)
    out = m.bigram_pmi_docs(spark, "ignored").collect()
    assert {(r["wa"], r["wb"]) for r in out} == {("a", "b"), ("b", "a")}
