"""Incremental dedup against a persisted index: cross-batch exact and
near duplicates are dropped WITHOUT rescanning accepted documents, the
index grows append-only, and replaying a batch drops everything."""

from __future__ import annotations

import os

import pytest

from big_data_pr_spark.operators import incremental_dedup as inc

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden under "
    "a bright morning sun with dew on the green grass everywhere"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_incremental_pure(spark):
    b1 = _docs(spark, [(1, "aaa bbb ccc"), (2, "ddd eee fff"), (3, "aaa bbb ccc")])
    s1, h1 = inc.exact_dedup_incremental(b1, None)
    assert {r["doc_id"] for r in s1.collect()} == {1, 2}  # intra-batch dup 3 dropped
    assert h1.count() == 2
    b2 = _docs(spark, [(10, "aaa bbb ccc"), (11, "new content here")])
    s2, h2 = inc.exact_dedup_incremental(b2, h1)
    assert {r["doc_id"] for r in s2.collect()} == {11}  # 10 known from batch 1
    assert [r["content_hash"] for r in h2.collect()] and h2.count() == 1


def test_minhash_incremental_pure(spark):
    near = BASE.replace("morning", "evening")
    b1 = _docs(spark, [(1, BASE), (2, "unrelated text about query engines and shuffles today")])
    s1, sig1 = inc.minhash_dedup_incremental(b1, None)
    assert {r["doc_id"] for r in s1.collect()} == {1, 2}
    b2 = _docs(spark, [(10, near), (11, "completely fresh words nothing shared with previous batches at all")])
    s2, _sig2 = inc.minhash_dedup_incremental(b2, sig1)
    assert {r["doc_id"] for r in s2.collect()} == {11}  # 10 ≈ accepted doc 1


def test_ingest_batch_end_to_end(spark, tmp_path):
    idx = str(tmp_path / "index")
    near = BASE.replace("morning", "evening")
    b1 = _docs(spark, [(1, BASE), (2, "unrelated text about query engines and shuffles today")])
    s1 = inc.ingest_batch(spark, b1, idx, near_dup=True)
    assert {r["doc_id"] for r in s1.collect()} == {1, 2}
    assert os.path.isdir(os.path.join(idx, "exact"))
    assert os.path.isdir(os.path.join(idx, "minhash"))

    b2 = _docs(
        spark,
        [
            (10, BASE),  # exact cross-batch dup
            (11, near),  # near cross-batch dup
            (12, "completely fresh words nothing shared with previous batches at all"),
        ],
    )
    s2 = inc.ingest_batch(spark, b2, idx, near_dup=True)
    assert {r["doc_id"] for r in s2.collect()} == {12}

    # index grew append-only: 2 (batch1) + 1 (batch2 survivor) digests
    assert spark.read.parquet(os.path.join(idx, "exact")).count() == 3

    # replaying batch 2 drops everything (all content now indexed)
    s3 = inc.ingest_batch(spark, b2, idx, near_dup=True)
    assert s3.count() == 0
    assert spark.read.parquet(os.path.join(idx, "exact")).count() == 3


def test_ingest_batch_exact_only(spark, tmp_path):
    idx = str(tmp_path / "index")
    b1 = _docs(spark, [(1, "alpha beta gamma"), (2, "delta epsilon zeta")])
    assert inc.ingest_batch(spark, b1, idx).count() == 2
    b2 = _docs(spark, [(3, "alpha beta gamma"), (4, "eta theta iota")])
    s2 = inc.ingest_batch(spark, b2, idx)
    assert {r["doc_id"] for r in s2.collect()} == {4}


def test_connected_components_driver_gate_matches_distributed(spark):
    """r8: the cardinality-gated driver union-find (small edge sets)
    must be row-identical to the distributed min-label propagation on
    the same pairs — chains, cliques, singleton-free edge lists, and
    string ids (lexicographic min)."""
    from big_data_pr_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [  # chain 1-2-3, clique 10-11-12, isolated edge 20-21
            (2, 1), (2, 3), (10, 11), (11, 12), (10, 12), (21, 20),
        ],
        "id_a long, id_b long",
    )
    kwargs = dict(id_a="id_a", id_b="id_b")
    small = {
        (r["node"], r["label"])
        for r in connected_components(pairs, **kwargs).collect()
    }
    dist = {
        (r["node"], r["label"])
        for r in connected_components(
            pairs, **kwargs, driver_cc_max_edges=0
        ).collect()
    }
    assert small == dist
    assert small == {
        (1, 1), (2, 1), (3, 1),
        (10, 10), (11, 10), (12, 10),
        (20, 20), (21, 20),
    }

    spairs = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("z", "y")], "id_a string, id_b string"
    )
    s_small = {
        (r["node"], r["label"])
        for r in connected_components(spairs, **kwargs).collect()
    }
    s_dist = {
        (r["node"], r["label"])
        for r in connected_components(
            spairs, **kwargs, driver_cc_max_edges=0
        ).collect()
    }
    assert s_small == s_dist == {
        ("a", "a"), ("b", "a"), ("c", "a"), ("y", "y"), ("z", "y")
    }
