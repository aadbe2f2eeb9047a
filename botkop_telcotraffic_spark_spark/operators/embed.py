"""Embedding transformations for the vector-pipeline surface:
Johnson–Lindenstrauss random projection and symmetric int8
quantization (the two standard memory levers before ANN indexing —
JL cuts dimensionality with bounded pairwise-distance distortion,
int8 cuts bytes/dim 4x with bounded reconstruction error).

Both are deterministic by construction (no RNG): the JL matrix is
the Achlioptas sparse {+1, 0, -1} family derived from an integer
hash of (plane, dim) — the same shared-with-the-oracle recipe as the
LSH hyperplanes (similarity.py:44) — and quantization scales are
corpus maxima.  All vector math is sequential-fold column
expressions (F.expr, parsed once JVM-side), so DuckDB's
``list_reduce`` reproduces every value bit-identically.

Scale shape: JL is pure scan-side math (no shuffle at all).
Quantization needs the per-dim max — ONE 64-key aggregate (map-side
combined) collapsed to a single model-sized row broadcast back; the
fact table is never shuffled.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


JL_A = 1_315_423_911
JL_B = 2_654_435_761
JL_P = 1_000_000_007


def _jl_sign_sql(j: int) -> str:
    """Achlioptas sparse entry for output dim j as a SQL CASE over the
    lambda var d (1-based): +1 / -1 each with prob 1/6, 0 with 2/3.

    The (j, d) pair is hashed through a LARGE PRIME before the mod-6
    reduction: any direct polynomial mod 6 is period-6 in j (integer
    coefficients shift by multiples of 6), which would make rows j
    and j+6 identical and cap the projection's rank at 6 — the
    large-prime mix breaks the periodicity, so all out_dim rows are
    distinct (asserted by the unit test).  Products stay < 2·10¹¹,
    well inside 64-bit, identical in Spark and DuckDB."""
    return (
        f"(CASE ((({j * JL_A} + (d - 1) * CAST({JL_B} AS BIGINT))"
        f" % {JL_P}) % 6) "
        "WHEN 0 THEN 1.0 WHEN 1 THEN -1.0 ELSE 0.0 END)"
    )


def jl_project(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    out_dim: int = 16,
) -> DataFrame:
    """Project ``dim``-vectors to ``out_dim`` with the sparse
    Achlioptas JL matrix, scaled by sqrt(3/out_dim) (the variance
    correction for the 2/3-sparse family).  E[|Px - Py|²] = |x - y|²;
    distortion concentrates as out_dim grows (JL lemma).

    Returns (id_col, proj: array<double> rounded to 6).  Scan-side
    only — compose with lsh/ivf_topk or quantize_int8 downstream.
    """
    if not 1 <= out_dim:
        raise ValueError(f"out_dim must be >= 1, got {out_dim}")
    s = math.sqrt(3.0 / out_dim)
    comps = ", ".join(
        "round("
        f"aggregate(transform(sequence(1, {dim}), d -> "
        f"CAST(element_at({vec_col}, d) AS DOUBLE) * {_jl_sign_sql(j)}), "
        f"CAST(0.0 AS DOUBLE), (a, x) -> a + x) * {s!r}, 6) + 0.0"
        for j in range(out_dim)
    )
    return df.select(
        F.col(id_col), F.expr(f"array({comps})").alias("proj")
    )


def quantize_int8(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Symmetric per-dimension int8 quantization: scale_d =
    corpus-max |x_d| / 127, q_d = clamp(round(x_d · 127 / max_d)).
    Returns (id_col, qvec: array<int>, mse: double) where mse is the
    per-vector mean squared reconstruction error (sequential fold,
    rounded to 6) — the quality report that says whether int8 is
    safe for this corpus before the index rebuild.

    Physical shape: posexplode → ``dim``-key max aggregate →
    single-row sorted scale array (model-sized, broadcast back as a
    1-row cross join — the centroid pattern); quantization itself is
    scan-side.  All-zero dimensions quantize to 0 (guarded divisor).
    """
    sc = (
        df.select(F.posexplode(F.col(vec_col)).alias("d", "v"))
        .groupBy("d")
        .agg(F.max(F.abs(F.col("v").cast("double"))).alias("mx"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct("d", "mx"))
            ).alias("_sm")
        )
        .select(
            F.transform(F.col("_sm"), lambda s: s["mx"]).alias("_scales")
        )
    )
    staged = df.select(F.col(id_col), F.col(vec_col)).crossJoin(
        F.broadcast(sc)
    )
    q_sql = (
        f"transform(sequence(1, {dim}), d -> CAST(least(127.0, "
        "greatest(-127.0, round(CASE WHEN element_at(_scales, d) > 0 "
        f"THEN CAST(element_at({vec_col}, d) AS DOUBLE) * 127.0 "
        "/ element_at(_scales, d) ELSE 0.0 END, 0))) AS INT))"
    )
    mse_sql = (
        f"round(aggregate(transform(sequence(1, {dim}), d -> "
        f"pow(CAST(element_at({vec_col}, d) AS DOUBLE) - "
        "CAST(element_at(_q, d) AS DOUBLE) * element_at(_scales, d) "
        f"/ 127.0, 2)), CAST(0.0 AS DOUBLE), (a, x) -> a + x) / {dim}, 6)"
        " + 0.0"
    )
    return (
        staged.withColumn("_q", F.expr(q_sql))
        .select(
            F.col(id_col),
            F.col("_q").alias("qvec"),
            F.expr(mse_sql).alias("mse"),
        )
    )
