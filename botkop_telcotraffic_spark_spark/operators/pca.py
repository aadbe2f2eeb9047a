"""Distributed PCA over an embedding column — dimensionality
reduction / whitening for the similarity-search and clustering
surface (IVF coarse quantizers, near-dup embedding compaction,
2-D corpus maps).

The decomposition splits exactly along the data/model boundary:

  * DISTRIBUTED (data-sized): the Gram matrix Σ x·xᵀ, the column sum
    Σ x, and n — computed as per-Arrow-batch BLAS partials
    (`X.T @ X`, one gemm per batch) reduced to ONE row.  This is the
    only pass over the data, and its cost is the cost of reading it.
  * DRIVER (model-sized): the d×d covariance
    C = (G − n·μμᵀ)/n and its eigendecomposition — O(d²) state and
    O(d³) compute for d = tens-to-thousands, independent of row
    count.  Exactly the centroid-table pattern (`kmeans.py`): the
    driver holds a MODEL, never data.

Eigenvectors are sign-fixed (largest-|component| coordinate made
positive) so the fit is deterministic: numpy's ``eigh`` is exact up
to per-eigenvector sign, and without the fix two runs could emit
mirrored projections.

Projection back over the data is a fold-based dot product
(``functions/vector.py`` discipline: F.aggregate, bit-deterministic,
no UDF) against the broadcast (k × d) component literals.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def gram_summary(df: DataFrame, vec_col: str, dim: int) -> tuple:
    """(n, sum_vec[d], gram[d*d]) in one distributed pass: BLAS
    per-batch partials via mapInPandas, merged with a fold-based
    elementwise array sum (one final 1-row aggregate — the partial
    set is O(#batches), collect_list of it is bounded and tiny).

    float32 inputs are widened to float64 BEFORE any product, so
    every partial is exact-representable arithmetic on both engines
    (a float32 value converts to float64 losslessly).
    """

    def gen(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "n": [len(X)],
                    "s": [X.sum(axis=0).tolist()],
                    "g": [(X.T @ X).ravel().tolist()],
                }
            )

    partials = df.select(vec_col).mapInPandas(
        gen, schema="n long, s array<double>, g array<double>"
    )

    def arr_sum(col: Column, width: int) -> Column:
        return F.aggregate(
            col,
            F.array([F.lit(0.0)] * width),
            lambda acc, x: F.zip_with(acc, x, lambda p, q: p + q),
        )

    row = partials.agg(
        F.sum("n").alias("n"),
        arr_sum(F.collect_list("s"), dim).alias("s"),
        arr_sum(F.collect_list("g"), dim * dim).alias("g"),
    ).collect()[0]
    return int(row["n"]), list(row["s"]), list(row["g"])


def pca_fit(df: DataFrame, vec_col: str, dim: int, k: int) -> dict:
    """Fit PCA: one distributed gram pass + driver-side d×d eigen.

    Returns ``{"mean": [d], "components": [k][d] (rows = descending
    eigenvalue, sign-fixed), "explained_var": [k], "ratio": [k]}``.
    """
    import numpy as np

    n, s, g = gram_summary(df, vec_col, dim)
    if n < 2:
        raise ValueError(f"pca_fit needs >= 2 rows, got {n}")
    mu = np.asarray(s, dtype=np.float64) / n
    G = np.asarray(g, dtype=np.float64).reshape(dim, dim)
    cov = G / n - np.outer(mu, mu)
    cov = (cov + cov.T) / 2.0  # exact symmetry for eigh
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # k x d
    for i in range(comps.shape[0]):  # sign fix: dominant coord > 0
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    ev = evals[order]
    total = float(evals.sum())
    return {
        "mean": mu.tolist(),
        "components": comps.tolist(),
        "explained_var": ev.tolist(),
        "ratio": (ev / total).tolist() if total > 0 else [0.0] * len(ev),
    }


def pca_project(
    df: DataFrame,
    vec_col: str,
    mean: list,
    components: list,
    out_col: str = "pc",
    round_to: int = 6,
) -> DataFrame:
    """Append ``out_col`` = array of k principal coordinates
    ((x − μ)·cᵢ), computed as sequential fold dot products over the
    broadcast component literals — scan-side column math, order-
    deterministic (the fold matches an oracle's list_reduce exactly),
    no shuffle, no UDF."""
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.lit([float(v) for v in mean]),
        lambda x, m: x - m,
    )
    coords = []
    for comp in components:
        c = F.lit([float(v) for v in comp])
        coords.append(
            F.round(
                F.aggregate(
                    F.zip_with(centered, c, lambda x, w: x * w),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                ),
                round_to,
            )
        )
    return df.withColumn(out_col, F.array(*coords))
