"""Behavioral tests for the hash-family operators that have no SQL
oracle (MinHash+LSH, SimHash, ANN-LSH) — planted duplicates must be
found — plus the multimodal plumbing stubs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from big_data_pr_spark.operators import dedup, multimodal, similarity
from big_data_pr_spark.tables import load

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden under "
    "a bright morning sun with dew on the green grass everywhere"
)


@pytest.fixture(scope="module")
def planted(spark):
    """Corpus with planted duplicate structure: 0=original, 1=exact copy,
    2=near-dup (one word changed), 3=half-overlap, 4-5=unrelated."""
    near = BASE.replace("morning", "evening")
    half = " ".join(BASE.split()[:18]) + " completely different tail of tokens here now"
    rows = [
        (0, BASE),
        (1, BASE),
        (2, near),
        (3, half),
        (4, "unrelated text about distributed query engines and shuffles"),
        (5, "another separate document mentioning vectors and indexes only"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_keeps_min_id(planted):
    out = dedup.dedup_exact(planted).orderBy("doc_id").collect()
    ids = [r["doc_id"] for r in out]
    assert 0 in ids and 1 not in ids  # doc 1 deduped into doc 0
    assert len(ids) == 5


def test_jaccard_pairs_find_planted(planted):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.jaccard_pairs(planted, threshold=0.05).collect()
    }
    assert pairs[(0, 1)] == 1.0  # exact copy
    assert pairs[(0, 2)] > 0.8  # near-dup
    assert (0, 4) not in pairs  # unrelated


def test_minhash_lsh_recall_on_planted(planted):
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in dedup.minhash_lsh_pairs(planted, min_est_jaccard=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs  # near-dup caught by banding
    assert (4, 5) not in pairs


def test_simhash_hamming_on_planted(planted):
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash(planted).collect()}
    assert sigs[0] == sigs[1]  # identical text → identical signature
    # near-dup sits at hamming 7 → 8 bands guarantee candidate recall ≤7
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_pairs(planted, max_hamming=8, bands=8).collect()
    }
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs and pairs[(0, 2)] <= 8
    assert (4, 5) not in pairs


def test_connected_components_chain_and_island(spark):
    """Min-label propagation + path compression: a 4-node chain (worst
    diameter shape) collapses to one component labeled by its min id;
    a disjoint pair stays separate."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "id_a long, id_b long"
    )
    labels = {r["node"]: r["label"] for r in dedup.connected_components(pairs).collect()}
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_propagate_seed_hops_bfs_distances(spark):
    """Level-synchronous BFS from a seed set: a 5-node chain seeded at
    one end gets true min-hop distances, the hop budget cuts the tail,
    an unseeded island never appears, and a diamond (two paths of
    different length to the same node) records the SHORTER one."""
    edges = spark.createDataFrame(
        # chain 1-2-3-4-5, island 10-11, diamond 1-20-21 and 1-21
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (1, 20), (20, 21), (1, 21)],
        "id_a long, id_b long",
    )
    seeds = spark.createDataFrame([(1,)], "doc_id long")
    got = {
        r["node"]: r["hop"]
        for r in dedup.propagate_seed_hops(seeds, edges, max_hops=3).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 20: 1, 21: 1}
    # hop budget 1: only direct neighbours
    got1 = {
        r["node"]: r["hop"]
        for r in dedup.propagate_seed_hops(seeds, edges, max_hops=1).collect()
    }
    assert got1 == {1: 0, 2: 1, 20: 1, 21: 1}
    # seed inside the island reaches only the island
    got_isl = {
        r["node"]: r["hop"]
        for r in dedup.propagate_seed_hops(
            spark.createDataFrame([(10,)], "doc_id long"), edges, max_hops=3
        ).collect()
    }
    assert got_isl == {10: 0, 11: 1}


def test_propagate_seed_hops_driver_distributed_parity(spark, monkeypatch):
    """The r13 cardinality-gated driver BFS and the distributed
    frontier loop must produce identical (node, hop) sets; the env
    override forces the distributed path on the same tiny graph."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (1, 20), (20, 21), (1, 21)],
        "id_a long, id_b long",
    )
    seeds = spark.createDataFrame([(1,), (10,)], "doc_id long")
    fast = {
        (r["node"], r["hop"])
        for r in dedup.propagate_seed_hops(seeds, edges, max_hops=2).collect()
    }
    monkeypatch.setenv("SPARK_GRAFT_BFS_DRIVER_MAX_EDGES", "0")
    dist = {
        (r["node"], r["hop"])
        for r in dedup.propagate_seed_hops(seeds, edges, max_hops=2).collect()
    }
    assert fast == dist == {(1, 0), (2, 1), (3, 2), (20, 1), (21, 1), (10, 0), (11, 1)}


def test_lsh_pairs_driver_distributed_parity(spark, monkeypatch):
    """The r13 cardinality-gated driver LSH path (banding arithmetic,
    any-band candidate set, pre-normalized sequential-fold verify,
    Spark-round replica) must emit exactly the distributed rows."""
    import random

    from big_data_pr_spark.operators import similarity

    rnd = random.Random(7)
    base = [[rnd.gauss(0, 1) for _ in range(8)] for _ in range(40)]
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(base)]
    # plant near-duplicates so the verify threshold actually bites
    rows += [
        (100 + i, [float(x + rnd.gauss(0, 0.05)) for x in base[i]])
        for i in range(10)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    fast = sorted(
        tuple(r)
        for r in similarity.lsh_pairs(
            emb, dim=8, threshold=0.4, n_bands=12, planes_per_band=4
        ).collect()
    )
    monkeypatch.setenv("SPARK_GRAFT_EMB_DRIVER_MAX_VECS", "0")
    dist = sorted(
        tuple(r)
        for r in similarity.lsh_pairs(
            emb, dim=8, threshold=0.4, n_bands=12, planes_per_band=4
        ).collect()
    )
    assert fast == dist
    assert len(fast) >= 10  # the planted near-dups all verified


def test_dedup_clusters_transitive_chain(spark, planted):
    """A≈B and B≈C (but A̸≈C directly) must collapse into ONE cluster;
    singletons survive as their own cluster."""
    # hand-planted candidate pairs: 0-1 exact, 1-2 near — 0-2 missing
    # on purpose (the transitive case pairwise dedup gets wrong)
    pairs = spark.createDataFrame([(0, 1), (1, 2)], "id_a long, id_b long")
    out = {r["doc_id"]: r for r in dedup.dedup_clusters(planted, pairs).collect()}
    assert len(out) == 6  # every doc gets an assignment
    assert out[0]["cluster_id"] == out[1]["cluster_id"] == out[2]["cluster_id"] == 0
    assert out[0]["is_survivor"] and not out[1]["is_survivor"] and not out[2]["is_survivor"]
    for singleton in (3, 4, 5):
        assert out[singleton]["cluster_id"] == singleton
        assert out[singleton]["is_survivor"]


def test_dedup_clusters_from_lsh_pairs(planted):
    """End-to-end: LSH pairs → clusters. Docs 0/1/2 share a cluster
    (exact + near dup), unrelated docs survive independently."""
    pairs = dedup.minhash_lsh_pairs(planted, min_est_jaccard=0.5)
    out = {r["doc_id"]: r for r in dedup.dedup_clusters(planted, pairs).collect()}
    assert out[0]["cluster_id"] == out[1]["cluster_id"] == out[2]["cluster_id"] == 0
    survivors = {i for i, r in out.items() if r["is_survivor"]}
    assert 0 in survivors and 1 not in survivors and 2 not in survivors
    assert {4, 5} <= survivors


def test_ann_recall_vs_bruteforce(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    exact = {r["vec_id"] for r in similarity.cosine_topk(emb, q, k=10).collect()}
    # few planes → big buckets → high recall (deterministic seed)
    approx = {
        r["vec_id"]
        for r in similarity.ann_lsh_topk(emb, q, dim=64, k=10, n_planes=2).collect()
    }
    assert len(approx) == 10
    assert len(exact & approx) >= 3  # deterministic on seed-42 planes
    # ANN scores are true cosines (re-ranked exactly inside the bucket)
    both = similarity.ann_lsh_topk(emb, q, dim=64, k=10, n_planes=2).collect()
    assert all(-1.0 <= r["cos_sim"] <= 1.0 for r in both)


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    exact = {r["vec_id"] for r in similarity.cosine_topk(emb, q, k=10).collect()}
    approx = similarity.ann_ivf_topk(emb, q, k=10, n_list=8, n_probe=4).collect()
    assert len(approx) == 10
    got = {r["vec_id"] for r in approx}
    assert len(exact & got) >= 3  # deterministic given seeded centroids
    assert all(-1.0 <= r["cos_sim"] <= 1.0 for r in approx)
    # probing every cell = exhaustive → must equal brute force exactly
    full = {
        r["vec_id"]
        for r in similarity.ann_ivf_topk(emb, q, k=10, n_list=8, n_probe=8).collect()
    }
    assert full == exact


def test_lsh_pairs_subset_of_exact(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    exact = {
        (r["id_a"], r["id_b"])
        for r in similarity.cosine_pairs(emb, threshold=0.4).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in similarity.lsh_pairs(emb, dim=64, threshold=0.4).collect()
    }
    assert approx <= exact  # verifier is exact → no false positives
    if exact:
        assert len(approx) / len(exact) >= 0.4  # bucket-boundary losses only


def test_multimodal_plumbing(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(20)
    payload = multimodal.attach_payload(docs, "doc_id")
    meta = multimodal.decode_images(payload).collect()
    assert len(meta) == 20
    m0 = {r["id"]: r for r in meta}
    # deterministic fake decode: re-running yields identical dims
    meta2 = {r["id"]: r for r in multimodal.decode_images(payload).collect()}
    for k in m0:
        assert (m0[k]["width"], m0[k]["height"], m0[k]["mode"]) == (
            meta2[k]["width"],
            meta2[k]["height"],
            meta2[k]["mode"],
        )
        assert 64 <= m0[k]["width"] <= 255
    frames = multimodal.sample_frames(payload, n_frames=4).collect()
    assert len(frames) == 80
    assert {r["offset_ms"] for r in frames if r["frame_idx"] == 2} == {5000}
    feats = multimodal.extract_features(payload).collect()
    assert all(len(r["feature"]) == multimodal.FEATURE_DIM for r in feats)
    resized = multimodal.resize_images(
        multimodal.decode_images(payload), max_side=128
    ).collect()
    assert len(resized) == 20
    for r in resized:
        assert max(r["out_width"], r["out_height"]) <= 128
        assert r["scale"] <= 1.0  # never upscales
        if max(r["width"], r["height"]) <= 128:
            assert (r["out_width"], r["out_height"]) == (r["width"], r["height"])
        else:  # aspect ratio preserved within rounding
            assert abs(r["out_width"] / r["out_height"] - r["width"] / r["height"]) < 0.05
    # real decode handles P6 PPM only — a non-PPM payload (utf-8 text
    # here) hits the PIL production-hook raise from the executor
    with pytest.raises(Exception, match="P6 PPM"):
        multimodal.decode_images(payload, real=True).collect()
    with pytest.raises(NotImplementedError):
        multimodal.resize_images(multimodal.decode_images(payload), real=True)


def test_lsh_bucket_distribution(spark, sf_dir):
    emb = load(spark, sf_dir, "embeddings")
    bucketed = similarity.with_lsh_bucket(emb, dim=64, n_planes=4)
    counts = bucketed.groupBy("lsh_bucket").count().collect()
    assert 2 <= len(counts) <= 16  # 4 planes → ≤16 buckets, spread out


def test_ivf_batch_matches_loop_form(spark, sf_dir):
    """The join-form batch IVF (one corpus scan for ALL queries, no
    driver loop) must return exactly what the per-query loop form
    returns, for a multi-row query table."""
    emb = load(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    kw = dict(k=10, n_list=8, n_probe=4)
    loop = similarity.ann_ivf_topk(emb, qs, **kw).collect()
    batch = similarity.ann_ivf_topk_batch(emb, qs, **kw).collect()
    key = lambda r: (r["query_id"], r["vec_id"], r["cos_sim"])
    assert sorted(map(key, batch)) == sorted(map(key, loop))
    # every query got exactly k results
    from collections import Counter

    per_q = Counter(r["query_id"] for r in batch)
    assert set(per_q) == {0, 1, 2, 3, 4} and set(per_q.values()) == {10}


def test_ivf_batch_plan_is_single_join_plus_window(spark, sf_dir):
    """Plan shape: one equi-join on the probe cell + one row_number
    window — not a unionByName chain of per-query subplans."""
    emb = load(spark, sf_dir, "embeddings")
    qs = emb.filter(F.col("vec_id") < 5)
    df = similarity.ann_ivf_topk_batch(emb, qs, k=10, n_list=8, n_probe=4)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # exactly one join node in the tree (the broadcast cell equi-join)
    assert plan.count("BroadcastHashJoin Inner") == 1
    assert "Window" in plan
    # rank pushdown: WindowGroupLimit caps window input at k per query
    assert "WindowGroupLimit" in plan
    assert "Union" not in plan


def test_split_by_cluster_eliminates_cross_split_leakage(spark, sf_dir):
    """The grouped split is the FIX for what cross_split_contamination
    audits: rekeying every doc to its cluster survivor's split must
    leave zero near-dup pairs straddling splits."""
    from big_data_pr_spark.queries import REGISTRY

    pairs = dedup.jaccard_pairs(
        load(spark, sf_dir, "documents"), threshold=0.5, max_doc_freq=100
    ).select("id_a", "id_b")
    grouped = REGISTRY["split_by_cluster"].fn(spark, sf_dir)
    sa = grouped.select(
        F.col("doc_id").alias("id_a"), F.col("split").alias("split_a")
    )
    sb = grouped.select(
        F.col("doc_id").alias("id_b"), F.col("split").alias("split_b")
    )
    leaked = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(F.col("split_a") != F.col("split_b"))
    )
    assert leaked.isEmpty()
    # and the audit query finds a nonzero baseline on the plain split
    # (otherwise this test would pass vacuously)
    audit = REGISTRY["cross_split_contamination"].fn(spark, sf_dir)
    assert audit.count() > 0


def test_release_tracked_caches(spark, sf_dir):
    """contamination() and jaccard_pairs() register their persisted
    relations; the release APIs unpersist and clear them so long-lived
    apps can bound executor storage."""
    docs = load(spark, sf_dir, "documents").limit(50)
    bench_docs = load(spark, sf_dir, "documents").limit(5)
    dedup.contamination(docs, bench_docs).count()
    dedup.jaccard_pairs(docs, threshold=0.5).count()
    assert dedup.release_benchmark_caches() >= 1
    assert dedup.release_shingle_caches() >= 1
    assert dedup.release_benchmark_caches() == 0  # idempotent
    assert dedup.release_shingle_caches() == 0


def test_dedup_spans_removes_planted_span(spark):
    """A 10-word span copied verbatim into a later doc is removed from
    that doc; the first occurrence survives; unique spans are kept."""
    span = "one two three four five six seven eight nine ten"
    rows = [
        (10, span + " alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (20, span + " lambda mu nu xi omicron pi rho sigma tau upsilon"),
        (30, "entirely fresh words with no overlap at all in here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in dedup.dedup_spans(df, chunk_words=10).collect()
    }
    assert out[10]["kept_chunks"] == 2 and out[10]["total_chunks"] == 2
    assert out[10]["clean_text"] == rows[0][1]
    # doc 20 loses the copied first chunk, keeps its unique tail
    assert out[20]["kept_chunks"] == 1 and out[20]["total_chunks"] == 2
    assert out[20]["clean_text"] == "lambda mu nu xi omicron pi rho sigma tau upsilon"
    assert out[30]["kept_chunks"] == 1  # 10 words -> 1 chunk, kept
    assert out[30]["clean_text"] == rows[2][1]


def test_dedup_spans_fully_duplicate_doc_empties(spark):
    """A document that is chunk-for-chunk identical to an earlier one
    reassembles to the empty string (everything was seen before)."""
    text = " ".join(f"w{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, text), (2, text)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in dedup.dedup_spans(df, chunk_words=10).collect()}
    assert out[1]["clean_text"] == text
    assert out[2]["kept_chunks"] == 0
    assert out[2]["clean_text"] == ""


def test_minhash_md5_recall_on_planted(planted):
    """The oracle-parity md5 MinHash variant finds the exact copy and
    the near-dup, like the xxhash64 fast path."""
    pairs = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in dedup.minhash_lsh_pairs_md5(planted, min_est_jaccard=0.5).collect()
    }
    assert pairs.get((0, 1)) == 1.0  # exact copy: identical signatures
    assert (0, 2) in pairs or (1, 2) in pairs  # near-dup collides in >=1 band


def test_simhash_md5_on_planted(planted):
    """The oracle-parity md5 SimHash twin: identical docs at Hamming 0,
    the near-dup within the band-guaranteed radius, unrelated apart."""
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_pairs_md5(planted, max_hamming=8, bands=8).collect()
    }
    assert pairs[(0, 1)] == 0
    assert (0, 2) in pairs and pairs[(0, 2)] <= 8
    assert (4, 5) not in pairs


def test_banded_lsh_recall_curve(spark, sf_dir):
    """Pin the band-count↔recall tradeoff (VERDICT r5 #5). Analytic
    recall for random-hyperplane LSH is 1 − (1 − p^r)^b with
    p = 1 − arccos(s)/π; the defaults must put ≥0.9 analytic recall at
    the dedup threshold s = 0.4 while generating FEWER candidates than
    the old b=4/r=3 geometry (candidate volume ~b/2^r of the n²
    self-join). Measured recall on the fixture corpus must track the
    analytic bound."""
    import inspect
    import math

    sig = inspect.signature(similarity.lsh_pairs)
    b = sig.parameters["n_bands"].default
    r = sig.parameters["planes_per_band"].default
    p = 1 - math.acos(0.4) / math.pi
    analytic = 1 - (1 - p**r) ** b
    assert analytic >= 0.9, (b, r, analytic)
    # candidate volume (fraction of n² from random pairs) must not
    # exceed the old geometry's 4/2^3 = 0.5
    assert b / 2**r <= 0.5, (b, r)
    emb = load(spark, sf_dir, "embeddings")
    exact = {
        (x["id_a"], x["id_b"])
        for x in similarity.cosine_pairs(emb, threshold=0.4).collect()
    }
    got = {
        (x["id_a"], x["id_b"])
        for x in similarity.lsh_pairs(emb, dim=64, threshold=0.4).collect()
    }
    assert got <= exact  # exact-cosine verifier: no false positives
    if len(exact) >= 5:
        recall = len(exact & got) / len(exact)
        assert recall >= 0.8, (recall, len(exact))


def test_bind_equals_unbound_shingles(spark):
    """The _bind let-binding is a pure performance rewrite: the bound
    shingle builders must return exactly the arrays the naive inline
    form produces."""
    from big_data_pr_spark.operators import dedup

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y"), (3, ""), (4, "q q q q")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["s"], r["h"])
        for r in df.select(
            "doc_id",
            dedup.shingle_array("text", 3).alias("s"),
            dedup.shingle_hash_array("text", 3).alias("h"),
        ).collect()
    }
    # naive reference in python
    for doc_id, text in [(1, "a b c d e"), (2, "x y"), (3, ""), (4, "q q q q")]:
        toks = text.split(" ")
        grams = (
            [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
            if len(toks) >= 3
            else []
        )
        want = list(dict.fromkeys(grams))
        assert got[doc_id][0] == want, doc_id
        assert len(got[doc_id][1]) == len(want), doc_id


def test_spherical_kmeans_matches_naive(spark):
    """spherical_kmeans_assign's cluster decision equals a plain-python
    spherical Lloyd with the same init/tie-break conventions."""
    import math

    from big_data_pr_spark.operators.similarity import (
        spherical_kmeans_assign,
    )

    vecs = [
        (0, [1.0, 0.0]), (1, [0.9, 0.1]), (2, [0.0, 1.0]),
        (3, [0.1, 0.9]), (4, [-1.0, 0.0]), (5, [-0.9, -0.1]),
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs], "vec_id long, embedding array<double>"
    )
    got = {
        r["vec_id"]: r["cluster"]
        for r in spherical_kmeans_assign(df, k=3, iters=2).collect()
    }

    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [x / n for x in v] if n else v

    cents = {i: unit(vecs[i][1]) for i in range(3)}
    for _ in range(2):
        assign = {}
        for i, v in vecs:
            dots = [(-(sum(a * b for a, b in zip(v, c))), cid)
                    for cid, c in sorted(cents.items())]
            assign[i] = min(dots)[1]
        if _ == 0:  # recompute once (iters=2 -> one update)
            by = {}
            for i, v in vecs:
                by.setdefault(assign[i], []).append(v)
            cents = {
                cid: unit([sum(x) / len(vs) for x in zip(*vs)])
                for cid, vs in by.items()
            }
    assert got == assign


def test_cosine_pairs_matches_numpy_reference(spark):
    """r8: the norm-precompute + repartitioned cross join must return
    exactly the pairs and 6-dp cosines a per-row numpy reference does
    (including the threshold boundary and a zero vector, which must
    yield NULL cosine and never qualify)."""
    import numpy as np

    from big_data_pr_spark.operators.similarity import cosine_pairs

    rng = np.random.default_rng(7)
    vecs = rng.standard_normal((30, 8)).astype(np.float32)
    vecs[5] = 0.0  # zero vector: try_divide -> NULL, filtered out
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in cosine_pairs(df, threshold=0.3).collect()
    }
    want = {}
    for i in range(len(vecs)):
        for j in range(i + 1, len(vecs)):
            a, b = vecs[i].astype(np.float64), vecs[j].astype(np.float64)
            na, nb = np.sqrt((a * a).sum()), np.sqrt((b * b).sum())
            if na == 0 or nb == 0:
                continue
            c = round(float(a @ b / (na * nb)), 6)
            if c >= 0.3:
                want[(i, j)] = c
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=2e-6)


def test_cosine_pairs_cardinality_gate(spark):
    """r9 (r8 verdict #6): the exact all-pairs verifier must refuse to
    schedule a grid above max_pairs — loudly, naming the bucketed
    alternative — and stay plan-identical below it (the registry
    oracles run far under the default gate)."""
    import numpy as np

    from big_data_pr_spark.operators.similarity import cosine_pairs

    rng = np.random.default_rng(11)
    df = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(4)]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    # 40 vectors -> 780 pairs: above a 100-pair gate, below the default
    with pytest.raises(ValueError, match="with_banded_lsh"):
        cosine_pairs(df, threshold=0.3, max_pairs=100)
    assert cosine_pairs(df, threshold=0.99999, max_pairs=1000).count() >= 0


def test_cosine_pairs_arrow_grid_distributed_parity(spark, monkeypatch):
    """r14: the gated MapInArrow grid (numpy sequential-fold replica)
    must return BIT-identical (pairs, cos_sim) to the BNLJ HOF plan —
    including the zero vector (NULL cosine, filtered) and values at the
    rounding boundary."""
    import numpy as np

    from big_data_pr_spark.operators.similarity import cosine_pairs

    rng = np.random.default_rng(13)
    vecs = rng.standard_normal((64, 16)).astype(np.float32)
    vecs[7] = 0.0  # zero vector: try_divide -> NULL on both paths
    vecs[9] = vecs[3]  # exact duplicate: cos exactly 1.0
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    monkeypatch.setenv("SPARK_GRAFT_COSINE_ARROW_MAX_VECS", "0")
    bnlj = sorted(map(tuple, cosine_pairs(df, threshold=0.2).collect()))
    monkeypatch.setenv("SPARK_GRAFT_COSINE_ARROW_MAX_VECS", "65536")
    arrow_df = cosine_pairs(df, threshold=0.2)
    arrow = sorted(map(tuple, arrow_df.collect()))
    assert "MapInArrow" in arrow_df._jdf.queryExecution().executedPlan().toString()
    assert bnlj == arrow  # exact equality: same pairs, same doubles


def test_cosine_pairs_arrow_grid_falls_back_on_nan(spark, monkeypatch):
    """A NaN element must reject the numpy replica (Spark SQL treats
    NaN as greater than any double; numpy comparisons drop it) and fall
    back to the distributed BNLJ plan."""
    from big_data_pr_spark.operators.similarity import cosine_pairs

    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, float("nan")]),
        (2, [0.5, 0.5]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    monkeypatch.setenv("SPARK_GRAFT_COSINE_ARROW_MAX_VECS", "65536")
    out_df = cosine_pairs(df, threshold=0.2)
    plan = out_df._jdf.queryExecution().executedPlan().toString()
    assert "MapInArrow" not in plan  # guard fired -> BNLJ
    monkeypatch.setenv("SPARK_GRAFT_COSINE_ARROW_MAX_VECS", "0")
    # repr-compare: NaN != NaN under tuple equality, but the NaN rows
    # (which Spark's >= keeps) must be present identically on both paths
    canon = lambda rows: sorted((r[0], r[1], repr(r[2])) for r in rows)
    assert canon(out_df.collect()) == canon(
        cosine_pairs(df, threshold=0.2).collect()
    )
