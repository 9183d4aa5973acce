"""Distributed PCA over embedding columns — whitening / dimensionality
reduction for semantic dedup and embedding analytics (public recipe:
covariance eigendecomposition; SemDeDup-style pipelines PCA-reduce
embeddings before clustering. Beyond the reference, which has no
vector surface).

Scale shape (the only one that works at 100 TB embeddings):

1. ``covariance_matrix``: ONE corpus scan; each partition accumulates
   its Gram partials ``X^T X`` (a dim×dim float64 matrix, BLAS
   ``syrk``-shaped) and its coordinate sums in numpy, then emits only
   the dim(dim+1)/2 upper-triangle rows + dim sum rows + a count row
   — ``mapInPandas`` output is O(dim²) PER PARTITION, independent of
   row count. One combinable groupBy(i, j) sum finishes it; the
   ≤ dim(dim+1)/2 + dim + 1 grouped rows (contract-bounded) collect
   once and assemble driver-side, so the corpus is scanned EXACTLY
   once per call (fit included). No row ever shuffles; no per-pair
   expression evaluates row-at-a-time.
2. ``pca_fit``: collect the dim×dim covariance (bounded: dim ≤ 1024
   enforced — 8 MB of float64; an embedding table's dim is a model
   constant, not data-dependent), ``numpy.linalg.eigh`` on the
   driver, sign-normalized components (largest-|coordinate| entry
   made positive) so results are deterministic across BLAS builds.
3. ``pca_project``: components broadcast; one scan, one numpy matmul
   per Arrow batch.

Oracle: the covariance itself is plain SQL (``avg(e[i]*e[j]) -
avg(e[i])*avg(e[j])`` per cell) — the driver checks it EXACTLY; the
projection is ALSO value-level oracled since r10 by pinning the
deterministic fitted components as SQL literals (stable: eigenvalue
gaps >> aggregation-order noise; see ``_pca_project_oracle`` in
``__spark_entry__.py``), with pytest additionally asserting
orthonormality, eigenvalue order, and projection-variance ==
eigenvalue.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["covariance_matrix", "pca_fit", "pca_project"]

_MAX_DIM = 1024  # driver collect ceiling: dim² float64 ≤ 8 MB


def _cov_upper(df: DataFrame, vec_col: str, dim: int):
    """ONE corpus scan -> upper-triangle covariance as numpy arrays
    ``(gi, gj, cov)`` (empty arrays when no valid vectors). Shared by
    :func:`covariance_matrix` and :func:`pca_fit` so neither pays the
    Gram pass twice."""
    if dim > _MAX_DIM:
        raise ValueError(f"dim={dim} exceeds the driver-collect "
                         f"contract ({_MAX_DIM}); reduce first")

    def partials(batches):
        import numpy as np
        import pandas as pd
        gram = np.zeros((dim, dim))
        sums = np.zeros(dim)
        n = 0
        for pdf in batches:
            vs = [v for v in pdf[vec_col]
                  if v is not None and len(v) == dim]
            if not vs:
                continue
            X = np.asarray(vs, dtype=np.float64)
            gram += X.T @ X
            sums += X.sum(axis=0)
            n += len(X)
        iu, ju = np.triu_indices(dim)
        out = {"i": np.concatenate([iu, np.arange(dim), [-1]]),
               "j": np.concatenate([ju, np.full(dim, -1), [-1]]),
               "s": np.concatenate([gram[iu, ju], sums, [float(n)]])}
        yield pd.DataFrame(out)

    # The grouped partials are at most dim(dim+1)/2 + dim + 1 rows
    # (contract-bounded by _MAX_DIM: ~525k rows / 12 MB at dim=1024),
    # so finish driver-side in numpy after ONE corpus scan — the
    # previous eager .first() for n plus a lazily-recomputed return
    # frame paid the Gram pass twice.
    import numpy as np
    agg = (df.select(vec_col).mapInPandas(partials, "i int, j int, s double")
           .groupBy("i", "j").agg(F.sum("s").alias("s")).toPandas())
    nmask = (agg["i"] == -1) & (agg["j"] == -1)
    total = float(agg.loc[nmask, "s"].max()) if nmask.any() else 0.0
    empty = (np.array([], dtype="int32"), np.array([], dtype="int32"),
             np.array([], dtype="float64"))
    if total == 0:
        return empty
    smask = (agg["j"] == -1) & (agg["i"] >= 0)
    mean = np.zeros(dim)
    mean[agg.loc[smask, "i"].to_numpy()] = \
        agg.loc[smask, "s"].to_numpy() / total
    gmask = agg["j"] >= 0
    gi = agg.loc[gmask, "i"].to_numpy().astype("int32")
    gj = agg.loc[gmask, "j"].to_numpy().astype("int32")
    cov = agg.loc[gmask, "s"].to_numpy() / total - mean[gi] * mean[gj]
    return gi, gj, cov


def covariance_matrix(df: DataFrame, vec_col: str,
                      dim: int) -> DataFrame:
    """Population covariance of an ``array<float/double>`` column:
    rows ``(i, j, cov)`` for the upper triangle ``i <= j`` (0-based),
    ``cov = E[x_i x_j] - E[x_i] E[x_j]``. Rows whose vector is null
    or mis-sized are EXCLUDED (counted out of n)."""
    import pandas as pd
    gi, gj, cov = _cov_upper(df, vec_col, dim)
    spark = df.sparkSession
    if not len(gi):
        return spark.createDataFrame([], "i int, j int, cov double")
    out = pd.DataFrame({"i": gi, "j": gj, "cov": cov})
    return spark.createDataFrame(out.sort_values(["i", "j"]),
                                 "i int, j int, cov double")


def pca_fit(df: DataFrame, vec_col: str, dim: int, k: int):
    """Top-``k`` principal components: returns ``(components, eigenvalues)``
    as numpy arrays of shape (k, dim) and (k,), eigenvalues descending.
    Driver-side eigh on the collected dim×dim covariance (bounded by
    the ``covariance_matrix`` contract). Components sign-normalized:
    each row's largest-|coordinate| entry is made positive, removing
    the eigenvector sign ambiguity across BLAS builds."""
    import numpy as np
    gi, gj, cov = _cov_upper(df, vec_col, dim)
    C = np.zeros((dim, dim))
    C[gi, gj] = cov
    C[gj, gi] = cov
    vals, vecs = np.linalg.eigh(C)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T.copy()
    for c in comps:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1
    return comps, vals[order]


def pca_project(df: DataFrame, components, id_col: str,
                vec_col: str) -> DataFrame:
    """Project each vector onto the given components: ``(id, proj)``
    with ``proj`` an array<double> of length k. Components ship once
    per executor via broadcast; scoring is one numpy matmul per Arrow
    batch — no shuffle, no per-row UDF."""
    import numpy as np
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(np.asarray(components,
                                                 dtype=np.float64))
    idt = df.select(id_col).schema[id_col].dataType.simpleString()

    def proj(batches):
        import pandas as pd
        W = bc.value
        for pdf in batches:
            ok = pdf[vec_col].map(
                lambda v: v is not None and len(v) == W.shape[1])
            pdf = pdf[ok]
            if not len(pdf):
                continue
            X = np.asarray(list(pdf[vec_col]), dtype=np.float64)
            P = X @ W.T
            yield pd.DataFrame({id_col: pdf[id_col],
                                "proj": list(P)})

    return (df.select(id_col, vec_col)
            .mapInPandas(proj, f"{id_col} {idt}, proj array<double>"))
