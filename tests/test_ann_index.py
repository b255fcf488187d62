"""IVF index-at-rest: partition-pruned probes + recall vs brute force."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from big_data_pr_spark.operators.ann_index import probe_ivf_index, write_ivf_index
from big_data_pr_spark.operators.similarity import cosine
from big_data_pr_spark.tables import load


def test_ivf_index_partition_pruned_probe(spark, sf_dir, tmp_path):
    emb = load(spark, sf_dir, "embeddings")
    out = str(tmp_path / "ivf")
    n_list, n_probe, k = 8, 3, 10
    write_ivf_index(emb, out, n_list=n_list)

    # physical layout: one directory per cell
    cells = [d for d in os.listdir(os.path.join(out, "vectors")) if d.startswith("cell=")]
    assert 1 < len(cells) <= n_list

    qvec = emb.orderBy("vec_id").limit(1).collect()[0]["embedding"]
    res = probe_ivf_index(spark, out, qvec, k=k, n_probe=n_probe)

    # the cell predicate must be partition pruning, not a post-scan filter
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        res.explain("formatted")
    plan = buf.getvalue()
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "cell" in pf[0], plan

    rows = res.collect()
    assert len(rows) == k
    # probed results only come from the probed cells
    assert len({r["cell"] for r in rows}) <= n_probe

    # recall vs exact brute force: the probe must recover most of the
    # true top-k (self included in both sides, so rankings align)
    qcol = F.array(*[F.lit(float(x)) for x in qvec])
    exact = (
        emb.select("vec_id", F.round(cosine(F.col("embedding"), qcol), 6).alias("s"))
        .orderBy(F.desc("s"), F.asc("vec_id"))
        .limit(k)
        .collect()
    )
    got = {r["vec_id"] for r in rows}
    want = {r["vec_id"] for r in exact}
    assert len(got & want) >= k // 2, (sorted(got), sorted(want))


def test_ivf_index_rebuild_is_idempotent(spark, sf_dir, tmp_path):
    emb = load(spark, sf_dir, "embeddings").limit(100)
    out = str(tmp_path / "ivf2")
    c1 = write_ivf_index(emb, out, n_list=4)
    c2 = write_ivf_index(emb, out, n_list=4)
    assert (c1 == c2).all()  # deterministic seeds + Lloyd -> same centroids
    n = spark.read.parquet(os.path.join(out, "vectors")).count()
    assert n == 100


def test_append_to_ivf_index_searchable_without_rebuild(spark, sf_dir, tmp_path):
    from big_data_pr_spark.operators import ann_index

    emb = load(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 400)
    extra = emb.filter(F.col("vec_id") >= 400)
    idx = str(tmp_path / "ivf")
    ann_index.write_ivf_index(base, idx, n_list=8)
    target = emb.filter(F.col("vec_id") == 450).first()
    # before the append, the held-out vector is not findable
    pre = ann_index.probe_ivf_index(
        spark, idx, target["embedding"], k=5, n_probe=8
    ).collect()
    assert all(r["vec_id"] != 450 for r in pre)
    n = ann_index.append_to_ivf_index(extra, idx)
    assert n == extra.count()
    # after: an exhaustive probe finds the vector itself at rank 1
    post = ann_index.probe_ivf_index(
        spark, idx, target["embedding"], k=5, n_probe=8
    ).collect()
    assert post[0]["vec_id"] == 450 and post[0]["cos_sim"] == 1.0
    # the probe still partition-prunes (append preserved the layout)
    probe_df = ann_index.probe_ivf_index(
        spark, idx, target["embedding"], k=5, n_probe=2
    )
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe_df.explain()
    assert "PartitionFilters" in buf.getvalue()


def test_stream_into_ivf_index(spark, sf_dir, tmp_path):
    """Embeddings arriving on a stream become searchable incrementally:
    two micro-batch files append into the built index, a held-out
    vector is findable afterwards, and restarting the drained stream
    (same checkpoint) appends nothing twice."""
    import json

    from big_data_pr_spark.operators import ann_index

    emb = load(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") < 300)
    idx = str(tmp_path / "ivf")
    ann_index.write_ivf_index(base, idx, n_list=8)

    in_dir = tmp_path / "in"
    in_dir.mkdir()
    extra = emb.filter(F.col("vec_id") >= 300).collect()
    half = len(extra) // 2
    for name, chunk in [("b0.json", extra[:half]), ("b1.json", extra[half:])]:
        (in_dir / name).write_text(
            "\n".join(
                json.dumps(
                    {"vec_id": r["vec_id"], "embedding": [float(x) for x in r["embedding"]]}
                )
                for r in chunk
            )
            + "\n"
        )

    stream = ann_index.vec_file_source(spark, str(in_dir))
    q = ann_index.stream_into_ivf_index(stream, idx, str(tmp_path / "cp"))
    q.awaitTermination(120)

    vectors = spark.read.parquet(os.path.join(idx, "vectors"))
    assert vectors.count() == 500
    target = extra[-1]
    post = ann_index.probe_ivf_index(
        spark, idx, target["embedding"], k=3, n_probe=8
    ).collect()
    assert post[0]["vec_id"] == target["vec_id"] and post[0]["cos_sim"] == 1.0

    # drained restart: same checkpoint, no new files → no growth
    q2 = ann_index.stream_into_ivf_index(
        ann_index.vec_file_source(spark, str(in_dir)), idx, str(tmp_path / "cp")
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(os.path.join(idx, "vectors")).count() == 500
