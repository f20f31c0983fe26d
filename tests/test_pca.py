"""Distributed PCA: partial-Gram fit, numpy equality, projection."""

import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from log2seq_spark.operators import pca


def _embs(spark, mat, parts=4):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(mat)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>").repartition(parts)


def _lowrank(n=200, dim=8, seed=7):
    rng = random.Random(seed)
    u = [1.0, 0.5, -0.3, 0.2, 0.0, 0.0, 0.1, -0.4]
    w = [0.0, 0.2, 0.7, -0.1, 0.9, -0.5, 0.0, 0.3]
    out = []
    for _ in range(n):
        g1, g2 = rng.gauss(0, 1), rng.gauss(0, 1)
        # per-coordinate noise at DISTINCT scales: keeps the trailing
        # eigenvalues separated so eigenvectors are well-defined (a
        # degenerate eigenspace has no canonical basis to compare)
        out.append([3.0 * g1 * a + g2 * b + 0.5
                    + rng.gauss(0, 0.01 * (j + 1))
                    for j, (a, b) in enumerate(zip(u, w))])
    return out


class TestPCAFit:
    def test_matches_numpy(self, spark):
        mat = _lowrank()
        model = pca.pca_fit(_embs(spark, mat), k=4)
        x = np.array(mat)
        cov = np.cov(x, rowvar=False)
        eigval, eigvec = np.linalg.eigh(cov)
        order = np.argsort(eigval)[::-1][:4]
        assert np.allclose(model["mean"], x.mean(axis=0), atol=1e-9)
        for j, idx in enumerate(order):
            v = eigvec[:, idx]
            if v[np.argmax(np.abs(v))] < 0:
                v = -v
            assert np.allclose(model["components"][j], v, atol=1e-8)
            assert model["eigenvalues"][j] == pytest.approx(
                eigval[idx], abs=1e-8)

    def test_partition_invariant_to_float_tolerance(self, spark):
        mat = _lowrank()
        m1 = pca.pca_fit(_embs(spark, mat, parts=1), k=3)
        m7 = pca.pca_fit(_embs(spark, mat, parts=7), k=3)
        assert np.allclose(m1["components"], m7["components"], atol=1e-9)
        assert np.allclose(m1["eigenvalues"], m7["eigenvalues"], atol=1e-9)

    def test_lowrank_variance_concentrates(self, spark):
        model = pca.pca_fit(_embs(spark, _lowrank()), k=2)
        assert sum(model["explained_variance_ratio"]) > 0.99

    def test_dim_mismatch_raises(self, spark):
        df = spark.createDataFrame(
            [(0, [1.0, 2.0]), (1, [1.0, 2.0, 3.0])],
            "vec_id long, embedding array<double>")
        with pytest.raises(Exception, match="dimension"):
            pca.pca_fit(df, k=1, dim=2)


class TestPCAProject:
    def test_projection_variance_matches_eigenvalues(self, spark):
        mat = _lowrank()
        df = _embs(spark, mat)
        model = pca.pca_fit(df, k=2)
        out = np.array([r["pca"] for r in
                        pca.pca_project(df, model).collect()])
        var = out.var(axis=0, ddof=1)
        for j in range(2):
            assert var[j] == pytest.approx(model["eigenvalues"][j],
                                           rel=1e-6)
        # components are orthogonal -> projected coords uncorrelated
        corr = np.corrcoef(out, rowvar=False)[0, 1]
        assert abs(corr) < 1e-6

    def test_whiten_gives_unit_variance(self, spark):
        df = _embs(spark, _lowrank())
        model = pca.pca_fit(df, k=2)
        out = np.array([r["pca"] for r in
                        pca.pca_project(df, model, whiten=True).collect()])
        assert np.allclose(out.var(axis=0, ddof=1), 1.0, atol=1e-6)

    def test_matches_numpy_projection(self, spark):
        mat = _lowrank(n=50)
        df = _embs(spark, mat)
        model = pca.pca_fit(df, k=3)
        got = {r["vec_id"]: r["pca"] for r in
               pca.pca_project(df, model).collect()}
        x = np.array(mat) - np.array(model["mean"])
        want = x @ np.array(model["components"]).T
        for i in range(len(mat)):
            assert np.allclose(got[i], want[i], atol=1e-9)


class TestPCACompose:
    def test_near_dup_pairs_survive_projection(self, spark):
        # structured corpus (rank-2 + tiny noise) with 10 planted
        # near-duplicate pairs: PCA-4 projection must keep every
        # planted pair a near-duplicate — the SemDeDup-style
        # shrink-then-dedup composition
        import random
        from log2seq_spark.operators import dedup
        rng = random.Random(11)
        base = _lowrank(n=80, seed=11)
        rows = [(i, v) for i, v in enumerate(base)]
        planted = set()
        for j in range(10):
            src = base[j]
            dup = [x + rng.gauss(0, 1e-4) for x in src]
            rows.append((1000 + j, dup))
            planted.add((j, 1000 + j))
        df = spark.createDataFrame(
            [(i, [float(x) for x in v]) for i, v in rows],
            "vec_id long, embedding array<double>")
        model = pca.pca_fit(df, k=4)
        proj = pca.pca_project(df, model, out_col="p").select(
            "vec_id", F.col("p").alias("embedding"))
        pairs = {(r["id_a"], r["id_b"]) for r in
                 dedup.embedding_near_duplicates(
                     proj, threshold=0.999, n_planes=0).collect()}
        assert planted <= pairs
