"""Distributed PCA (operators/pca.py): numpy parity, determinism,
corrupt-vector hygiene, and codegen-only projection plan."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_data_pr_spark.operators import pca
from big_data_pr_spark.tables import load


@pytest.fixture(scope="module")
def emb_np(spark, sf_dir):
    rows = (
        load(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


def test_gram_stats_matches_numpy(spark, sf_dir, emb_np):
    n, s, g = pca.gram_stats(load(spark, sf_dir, "embeddings"), "embedding", dim=64)
    assert n == emb_np.shape[0]
    np.testing.assert_allclose(s, emb_np.sum(axis=0), rtol=1e-10)
    np.testing.assert_allclose(g, emb_np.T @ emb_np, rtol=1e-10)


def test_fit_matches_sequential_numpy(spark, sf_dir, emb_np):
    model = pca.fit_pca(load(spark, sf_dir, "embeddings"), "embedding", k=3, dim=64)
    cov = np.cov(emb_np, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:3]
    for i, comp in enumerate(np.asarray(model.components)):
        ref = evecs[:, order[i]]
        j = int(np.argmax(np.abs(ref)))
        if ref[j] < 0:
            ref = -ref
        np.testing.assert_allclose(comp, ref, atol=1e-8)
        np.testing.assert_allclose(np.linalg.norm(comp), 1.0, atol=1e-10)
    np.testing.assert_allclose(
        model.explained_variance, evals[order], rtol=1e-10
    )
    # ratios sum below 1 and descend
    r = model.explained_variance_ratio
    assert r == sorted(r, reverse=True) and 0 < sum(r) < 1


def test_fit_invariant_to_partitioning(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    a = pca.fit_pca(emb, "embedding", k=2, dim=64)
    b = pca.fit_pca(emb.repartition(13), "embedding", k=2, dim=64)
    np.testing.assert_allclose(a.components, b.components, atol=1e-9)


def test_corrupt_vectors_skipped(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    bad = spark.createDataFrame(
        [(10_001, None), (10_002, [1.0, 2.0])],
        "vec_id long, embedding array<float>",
    )
    n_clean, s_clean, _ = pca.gram_stats(emb, "embedding", dim=64)
    n, s, _ = pca.gram_stats(
        emb.select("vec_id", "embedding").unionByName(bad), "embedding", dim=64
    )
    assert n == n_clean
    np.testing.assert_allclose(s, s_clean, rtol=1e-12)


def test_projection_is_codegen_only(spark, sf_dir, emb_np):
    """The scoring path must stay JVM-side: no Python eval nodes, and
    the projected values equal the numpy projection."""
    emb = load(spark, sf_dir, "embeddings")
    model = pca.fit_pca(emb, "embedding", k=2, dim=64)
    proj = pca.project(emb, model)
    plan = proj._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    got = {
        r["vec_id"]: (r["pc1"], r["pc2"])
        for r in proj.select("vec_id", "pc1", "pc2").collect()
    }
    centered = emb_np - emb_np.mean(axis=0)
    want = centered @ np.asarray(model.components).T
    for i in range(emb_np.shape[0]):
        np.testing.assert_allclose(got[i], want[i], atol=1e-6)


def test_empty_input_raises(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        pca.gram_stats(empty, "embedding")
