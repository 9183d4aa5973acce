"""DSIR importance weighting (pipeline/selection.py) and distributed
PCA (pipeline/decomp.py) — round-9 additions, beyond the reference
(tablite has no corpus-selection or vector surface; public recipes:
Xie et al. 2023 arXiv:2302.03169, covariance eigendecomposition)."""
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tablite_spark.pipeline.decomp import (
    covariance_matrix, pca_fit, pca_project,
)
from tablite_spark.pipeline.selection import dsir_select, dsir_weights


def _docs(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "the dog sat on the log"),
        (2, "stock market prices fell sharply today"),
        (3, "market prices rose in early trading"),
        (4, "the cat and the dog"),
        (5, ""),            # no grams -> weight 0
        (6, "!!! ???"),     # normalizes away -> weight 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dsir_weights_reference_implementation(spark):
    """Weights must equal an independent pure-python replay of the
    hashed-ngram importance model (same md5-prefix bucketing, add-1
    smoothing, integer micronats)."""
    import hashlib
    import re
    B = 64
    raw = _docs(spark)
    target = raw.filter(F.col("doc_id").isin(2, 3))  # finance-like

    def grams(text):
        toks = [t for t in re.sub(r"[^a-z0-9 ]", " ", text.lower())
                .split(" ") if t]
        return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]

    def bucket(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B

    texts = {r["doc_id"]: r["text"] for r in raw.collect()}
    rawc, tgtc = {}, {}
    for d, t in texts.items():
        for g in grams(t):
            b = bucket(g)
            rawc[b] = rawc.get(b, 0) + 1
            if d in (2, 3):
                tgtc[b] = tgtc.get(b, 0) + 1
    tr, tt = sum(rawc.values()), sum(tgtc.values())
    lam = {b: math.floor(1e6 * (
        math.log((tgtc.get(b, 0) + 1) / (tt + B))
        - math.log((rawc.get(b, 0) + 1) / (tr + B)))) for b in range(B)}
    want = {d: (len(grams(t)),
                sum(lam[bucket(g)] for g in grams(t)))
            for d, t in texts.items()}

    got = {r["doc_id"]: (r["n_grams"], r["dsir_micro"]) for r in
           dsir_weights(raw, target, "text", "doc_id",
                        buckets=B).collect()}
    assert got == want
    assert got[5] == (0, 0) and got[6] == (0, 0)
    # target-like docs must outrank the pet docs
    assert min(got[2][1], got[3][1]) > max(got[0][1], got[1][1])


def test_dsir_select_topk_deterministic(spark):
    raw = _docs(spark)
    target = raw.filter(F.col("doc_id").isin(2, 3))
    out = dsir_select(raw, target, "text", "doc_id", k=2,
                      buckets=64).collect()
    assert [r["rank"] for r in sorted(out, key=lambda r: r["rank"])] \
        == [1, 2]
    assert {r["doc_id"] for r in out} == {2, 3}


def test_dsir_select_no_single_task_sort(spark):
    plan = dsir_select(_docs(spark), _docs(spark).limit(2), "text",
                       "doc_id", k=2)._jdf \
        .queryExecution().executedPlan().toString()
    # the global phase ranks <= k*partitions pre-filtered survivors;
    # the full weight table must never range-shuffle to one task
    assert "rangepartitioning" not in plan.lower()


def _vecs(spark, n=300, dim=6, seed=3):
    rng = np.random.default_rng(seed)
    # anisotropic: two dominant directions + noise
    W = rng.normal(size=(dim, dim))
    X = rng.normal(size=(n, 2)) @ W[:2] + 0.05 * rng.normal(
        size=(n, dim))
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    return (spark.createDataFrame(rows,
                                  "vec_id long, embedding array<double>"),
            X)


def test_covariance_matches_numpy(spark):
    df, X = _vecs(spark)
    got = {(r["i"], r["j"]): r["cov"] for r in
           covariance_matrix(df, "embedding", 6).collect()}
    C = np.cov(X, rowvar=False, bias=True)
    for i in range(6):
        for j in range(i, 6):
            assert got[(i, j)] == pytest.approx(C[i, j], abs=1e-9)
    # null / mis-sized rows are excluded, not crashed on
    extra = spark.createDataFrame(
        [(900, None), (901, [1.0, 2.0])],
        "vec_id long, embedding array<double>")
    got2 = {(r["i"], r["j"]): r["cov"] for r in covariance_matrix(
        df.unionByName(extra), "embedding", 6).collect()}
    assert got2[(0, 0)] == pytest.approx(C[0, 0], abs=1e-9)


def test_pca_fit_project_properties(spark):
    df, X = _vecs(spark)
    comps, evals = pca_fit(df, "embedding", dim=6, k=3)
    assert comps.shape == (3, 6) and evals.shape == (3,)
    # orthonormal, descending eigenvalues, signs normalized
    assert np.allclose(comps @ comps.T, np.eye(3), atol=1e-9)
    assert evals[0] >= evals[1] >= evals[2] >= -1e-12
    for c in comps:
        assert c[np.argmax(np.abs(c))] > 0
    # projection variance along component k == eigenvalue k
    proj = pca_project(df, comps, "vec_id", "embedding")
    P = np.array([r["proj"] for r in proj.collect()])
    assert P.shape == (300, 3)
    assert np.allclose(P.var(axis=0), evals, rtol=1e-6)
    # the 2-plane structure: first two components carry ~all variance
    assert evals[2] < 0.01 * evals[0]


def test_covariance_dim_guard(spark):
    df, _ = _vecs(spark, n=5)
    with pytest.raises(ValueError, match="driver-collect"):
        covariance_matrix(df, "embedding", 2000)


def test_dsir_empty_target_and_buckets_guard(spark):
    """An empty target corpus is a valid (degenerate) model: every
    bucket smooths to 1/(0+B), weights are finite and favor docs with
    FEWER raw-common grams; the buckets cap guards the driver-side
    lambda-table collect."""
    raw = _docs(spark)
    empty = raw.filter(F.col("doc_id") < 0)
    out = {r["doc_id"]: r["dsir_micro"] for r in
           dsir_weights(raw, empty, "text", "doc_id",
                        buckets=32).collect()}
    assert len(out) == 7 and out[5] == 0 and out[6] == 0
    assert all(isinstance(v, int) for v in out.values())
    with pytest.raises(ValueError, match="buckets"):
        dsir_weights(raw, empty, "text", "doc_id", buckets=2_000_000)


def test_pca_fit_stable_across_partitionings(spark):
    """The r10 pca_project oracle PINS the fitted components as SQL
    literals, so the fit must be reproducible however the corpus is
    partitioned: the grouped Gram partials may merge in any order
    (ulp-level sum differences), but eigenvalue gaps dwarf that
    noise and the sign normalization must never flip. Gate: rounded
    projections identical at 1/4/13 partitions."""
    import numpy as np
    from pyspark.sql import functions as F

    from tablite_spark.pipeline.decomp import pca_fit, pca_project
    dim = 16
    vec = F.array(*[F.sin(F.col("id") * (0.01 * (i + 1)) + i)
                    for i in range(dim)])
    base = spark.range(2000).select(F.col("id").alias("vec_id"),
                                    vec.alias("embedding"))
    outs = []
    for parts in (1, 4, 13):
        df = base.repartition(parts)
        comps, _ = pca_fit(df, "embedding", dim, 3)
        p = pca_project(df, comps, "vec_id", "embedding")
        rows = p.select("vec_id",
                        *[F.round(F.element_at("proj", i + 1), 4)
                          .alias(f"pc{i}") for i in range(3)]).collect()
        outs.append(sorted(map(tuple, rows)))
    assert outs[0] == outs[1] == outs[2]
    # and no -0.0 anywhere in the rounded projections
    flat = np.array([v for row in outs[0] for v in row[1:]])
    assert not ((flat == 0) & np.signbit(flat)).any()
