"""Distributed PCA over an embedding column — the dimensionality
reduction / whitening step an embedding pipeline runs before ANN
indexing or semantic dedup (shrinking vectors shrinks every downstream
shuffle, and decorrelated dimensions make quantization and LSH planes
better behaved).

Scale shape (100 TB): fitting needs only the Gram matrix and the mean —
classic distributable sufficient statistics. Each partition reduces to
ONE row of (count, sum_vector, flattened X^T X) via Arrow
``mapInPandas`` (numpy BLAS inside the batch), so the driver sees
#partitions × (dim² + dim + 1) doubles, never the data — the same
bounded-collect discipline as ``similarity.kmeans_centroids`` and
``packing``'s per-partition offsets. The eigendecomposition is
driver-side on the dim×dim covariance (dim is hundreds, not data
scale). Projection is pure JVM expression math: ``zip_with`` +
``aggregate`` per component, the exact pattern of
``dedup.hyperplane_signatures`` — no Python in the projection path.

Float note: partial Gram sums depend on partition boundaries at ~1e-15
relative, so fitted models are reproducible to float tolerance (tested
under repartitioning), not bit-identical — fine for a model, which is
why PCA ships with numpy-equality unit tests instead of a bit-exact
DuckDB oracle leg.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _partial_gram(vec_col: str, dim: int):
    def fn(batches):
        import numpy as np
        import pandas as pd
        n = 0
        s = np.zeros(dim)
        g = np.zeros((dim, dim))
        for pdf in batches:
            if len(pdf) == 0:
                continue
            arr = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if arr.shape[1] != dim:
                raise ValueError(
                    f"pca_fit: vector dimension {arr.shape[1]} != {dim}")
            n += arr.shape[0]
            s += arr.sum(axis=0)
            g += arr.T @ arr
        if n:
            yield pd.DataFrame([{"n": n, "s": s.tolist(),
                                 "g": g.reshape(-1).tolist()}])
    return fn


def pca_fit(embs: DataFrame, vec_col: str = "embedding", k: int = 8,
            dim: int | None = None) -> dict:
    """Fit a PCA model: returns ``{mean, components (k×dim, rows are
    unit eigenvectors, descending eigenvalue), eigenvalues,
    explained_variance_ratio, n, dim, k}`` as plain Python lists —
    broadcastable into any projection plan as literals.

    Component signs are fixed (largest-magnitude entry positive) so
    the model is deterministic up to float tolerance.
    """
    import numpy as np

    if dim is None:
        row = embs.select(F.size(F.col(vec_col)).alias("d")).first()
        dim = (row and row[0]) or 0
    parts = (embs.select(vec_col)
                 .mapInPandas(_partial_gram(vec_col, dim),
                              schema="n long, s array<double>, "
                                     "g array<double>")
                 .collect())
    if not parts:
        raise ValueError("pca_fit: empty input")
    n = sum(p["n"] for p in parts)
    if n < 2:
        raise ValueError("pca_fit: need >= 2 vectors")
    s = np.sum([np.array(p["s"]) for p in parts], axis=0)
    g = np.sum([np.array(p["g"]).reshape(dim, dim) for p in parts], axis=0)
    mean = s / n
    cov = (g - n * np.outer(mean, mean)) / (n - 1)
    eigval, eigvec = np.linalg.eigh(cov)        # ascending
    order = np.argsort(eigval)[::-1][:k]
    comps = []
    evs = []
    for idx in order:
        v = eigvec[:, idx]
        if v[np.argmax(np.abs(v))] < 0:         # deterministic sign
            v = -v
        comps.append(v.tolist())
        evs.append(float(max(eigval[idx], 0.0)))
    total = float(np.trace(cov))
    ratios = [e / total if total > 0 else 0.0 for e in evs]
    return {"mean": mean.tolist(), "components": comps,
            "eigenvalues": evs, "explained_variance_ratio": ratios,
            "n": int(n), "dim": int(dim), "k": len(comps)}


def pca_project(embs: DataFrame, model: dict,
                vec_col: str = "embedding", out_col: str = "pca",
                whiten: bool = False) -> DataFrame:
    """Adds ``out_col``: the k-dimensional projection of ``vec_col``
    onto the fitted components (``whiten=True`` scales each coordinate
    by 1/√eigenvalue, giving unit variance). Pure JVM expression math
    (zip_with + aggregate per component) — no shuffle, no Python."""
    mean_lit = F.array(*[F.lit(float(m)) for m in model["mean"]])
    centered = F.zip_with(F.col(vec_col).cast("array<double>"), mean_lit,
                          lambda x, m: x - m)
    staged = embs.select("*", centered.alias("__pca_c"))
    coords = []
    for j, comp in enumerate(model["components"]):
        comp_lit = F.array(*[F.lit(float(c)) for c in comp])
        dot = F.aggregate(F.zip_with("__pca_c", comp_lit,
                                     lambda x, c: x * c),
                          F.lit(0.0), lambda a, v: a + v)
        if whiten:
            ev = model["eigenvalues"][j]
            dot = dot / F.lit(float(ev) ** 0.5 if ev > 0 else 1.0)
        coords.append(dot)
    return staged.select("*", F.array(*coords).alias(out_col)) \
                 .drop("__pca_c")
