"""Bloom-filter runtime join pruning — cut a fact-table shuffle down
to (selectivity x fact) rows before it happens.

The classic 100 TB join problem: ``fact JOIN dim_subset`` where the
dim subset matches only a few percent of fact rows, but the fact side
still shuffles in FULL before the join discards the misses.  Spark's
own runtime row-level Bloom injection
(``spark.sql.optimizer.runtime.bloomFilter.enabled``) covers some
shapes; this operator is the explicit, engine-portable form:

  1. BUILD — one aggregate over the (small) build side computes a
     Bloom bitset as ``num_bits/64`` longs: each key sets
     ``num_hashes`` bits, positions combined per 64-bit word with
     ``bit_or``.  The collected filter is O(num_bits/64) driver state
     — a bounded *parameter* (default 8 KiB), like a centroid table,
     NOT data-proportional.
  2. PROBE — the bitset is re-broadcast as an array literal and the
     membership test is pure scan-side column math on the fact: the
     filter sits UNDER the fact's Exchange, so the shuffle moves only
     probable matches.
  3. VERIFY — the ordinary equi-join still runs after the pre-filter,
     so Bloom false positives are dropped exactly and the result is
     row-identical to the plain join.  The operator is a pure
     physical optimization; its oracle is the plain SQL join.

Bit positions use Kirsch-Mitzenmacher double hashing
(g_i = h1 + i*h2 mod m, "Less Hashing, Same Performance", ESA 2006):
two ``xxhash64`` calls per key, ``num_hashes`` arithmetic
derivations.  ``h2`` is forced odd so the stride is coprime with the
power-of-two ``m`` and the g_i never collapse onto one bit.  The
hash is deliberately NOT the engine-wide portable fingerprint: a
Bloom filter only needs build and probe to agree WITHIN the engine
(the exact join makes the final result hash-independent), and
``xxhash64`` is a whole-stage-codegen builtin — per-row cost is
nanoseconds, where a portable string fold would be an interpreted
HOF dominating the fact scan (measured 10x the entire query).

Sizing rule (documented, asserted in tests): false-positive rate
``(1 - e^(-k*n/m))^k``; ``bloom_prune_join`` auto-sizes to ≥ 16 bits
per build key (~0.14% FP at k=5) because an under-sized filter
saturates silently — and a Bloom FP only costs a wasted shuffle row,
never a wrong result.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 1 << i as int64 for i in 0..63 (bit 63 wraps to Long.MIN_VALUE);
# indexed by element_at because Spark's shiftleft takes only a
# literal shift amount, not a column.
_MASKS64 = [1 << i for i in range(63)] + [-(1 << 63)]


def _mask_for(b: Column) -> Column:
    """int64 with bit ``b mod 64`` set, via the literal mask table."""
    return F.element_at(
        F.lit(_MASKS64), (b.bitwiseAND(F.lit(63)) + 1).cast("int")
    )


def _hash_pair(key: Column, num_bits: int, salt: str) -> tuple[Column, Column]:
    """(h1, h2) for double hashing: two salt-namespaced xxhash64
    draws of the key, reduced mod ``num_bits``; h2 forced odd."""
    h1 = F.pmod(F.xxhash64(F.lit(salt + "a"), key), F.lit(num_bits))
    h2 = F.pmod(F.xxhash64(F.lit(salt + "b"), key), F.lit(num_bits)).bitwiseOR(
        F.lit(1).cast("long")
    )
    return h1, h2


def _bit_positions(
    key: Column, num_bits: int, num_hashes: int, salt: str
) -> list[Column]:
    h1, h2 = _hash_pair(key, num_bits, salt)
    return [(h1 + F.lit(i).cast("long") * h2) % num_bits for i in range(num_hashes)]


def bloom_build(
    df: DataFrame,
    key_col: str,
    num_bits: int = 1 << 16,
    num_hashes: int = 5,
    salt: str = "bloom:",
) -> list[int]:
    """Distributed Bloom build: one narrow projection + one tiny
    aggregate.  Returns the bitset as ``num_bits // 64`` Python ints
    (missing words zero-filled) — bounded driver state by parameter.

    Physical shape: the build side projects ``num_hashes`` (word,
    mask) pairs per key, exploded and combined with a map-side
    partial ``bit_or`` groupBy on word index — at most
    ``num_bits/64`` groups TOTAL, so the final shuffle is KBs no
    matter how large the build side is.
    """
    if num_bits % 64 or num_bits <= 0:
        raise ValueError("num_bits must be a positive multiple of 64")
    bits = _bit_positions(F.col(key_col), num_bits, num_hashes, salt)
    pairs = F.array(
        *[
            F.struct(
                F.shiftrightunsigned(b, 6).alias("word"),
                _mask_for(b).alias("mask"),
            )
            for b in bits
        ]
    )
    rows = (
        df.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.word").alias("word"))
        .agg(F.bit_or(F.col("p.mask")).alias("mask"))
        .collect()
    )
    words = [0] * (num_bits // 64)
    for r in rows:
        words[int(r["word"])] = int(r["mask"])
    return words


def _bit_tests(
    key: Column,
    words_ref: Column,
    num_bits: int,
    num_hashes: int,
    salt: str,
) -> Column:
    """AND of the k bit tests against ``words_ref`` (a column or
    literal holding the bitset array)."""
    cond = None
    for b in _bit_positions(key, num_bits, num_hashes, salt):
        word = F.element_at(
            words_ref, (F.shiftrightunsigned(b, 6) + 1).cast("int")
        )
        test = word.bitwiseAND(_mask_for(b)) != 0
        cond = test if cond is None else cond & test
    return cond


def bloom_probe(
    key: Column,
    words: list[int],
    num_hashes: int = 5,
    salt: str = "bloom:",
) -> Column:
    """Membership test against a built filter as a standalone Column
    (array-literal form) — convenient for composing into arbitrary
    expressions and exact for any size, but NOTE: Spark materializes
    an array literal PER ROW, so per-row cost grows with
    ``len(words)`` (measured ~1 µs/row at 1 024 words).  For the hot
    fact-scan path use :func:`bloom_prune_join`, which routes the
    bitset through a 1-row broadcast so the array is a per-batch
    REFERENCE instead."""
    return _bit_tests(key, F.lit(words), len(words) * 64, num_hashes, salt)


def bloom_false_positive_rate(
    n_keys: int, num_bits: int, num_hashes: int
) -> float:
    """Expected FP rate (1 - e^(-k n / m))^k — the sizing rule."""
    return (1.0 - math.exp(-num_hashes * n_keys / num_bits)) ** num_hashes


def bloom_prune_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    num_bits: int | None = None,
    num_hashes: int = 5,
    salt: str = "bloom:",
    how: str = "inner",
) -> DataFrame:
    """``fact JOIN dim`` with a Bloom pre-filter on the fact side —
    row-identical to the plain join (the exact join after the filter
    drops Bloom false positives), but the fact shuffle carries only
    rows whose key is probably in ``dim``.

    ``num_bits=None`` auto-sizes: the next power of two ≥ 16 bits per
    build key (FP ≈ 0.14% at k=5), floor 2^16 — an UNDER-sized filter
    saturates silently (at 16x load the FP rate is ~59%: the filter
    passes most of the fact and prunes nothing), so sizing follows
    the build side by default and the parameter is an override, not a
    guess.

    Probe mechanics: the bitset rides a 1-row broadcast and the k bit
    tests are the JOIN CONDITION of a BroadcastNestedLoopJoin against
    that single row.  This is deliberate, not an accident of style —
    as a ``where()`` over an array LITERAL, Spark materializes the
    full array per fact row (cost ∝ filter size: measured 5x the
    whole query at 8 KiB); as a broadcast attribute the array is a
    per-batch reference and only PASSING rows pay an output copy.
    The fact side still reaches the exact join without any shuffle
    before the Bloom cut (plan-asserted).

    ``how`` must be a join type that cannot resurrect filtered fact
    rows: inner / left_semi (a left-outer fact side would need its
    misses back).
    """
    if how not in ("inner", "left_semi", "semi"):
        raise ValueError(f"bloom_prune_join supports inner/semi, got {how!r}")
    if num_bits is None:
        n_keys = dim.count()
        num_bits = max(1 << 16, 1 << max(6, (16 * max(n_keys, 1) - 1).bit_length()))
    words = bloom_build(dim, dim_key, num_bits, num_hashes, salt)
    wdf = fact.sparkSession.createDataFrame([(words,)], "_bloom_words array<bigint>")
    pruned = fact.join(
        F.broadcast(wdf),
        _bit_tests(
            fact[fact_key], F.col("_bloom_words"), num_bits, num_hashes, salt
        ),
        "inner",
    ).drop("_bloom_words")
    return pruned.join(dim, pruned[fact_key] == dim[dim_key], how)
