"""Behavioral tests for training-mix sampling and context-window
packing (operators/sampling.py): determinism under repartitioning —
the property the md5 keying exists to provide — plus quota and
offset invariants. Value-level correctness is oracle-gated in
tests/test_queries_oracle.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_pr_spark.operators import sampling, text
from big_data_pr_spark.tables import load


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_stratified_sample_partitioning_invariant(spark, sf_dir):
    """Both variants pick the identical document set no matter how the
    corpus is partitioned — a re-run on a re-sharded corpus yields the
    same training mix."""
    docs = load(spark, sf_dir, "documents")
    for fn in (sampling.stratified_sample_exact, sampling.stratified_sample_hash):
        base = _ids(fn(docs, ["lang"], 10))
        reparted = _ids(fn(docs.repartition(17, "source"), ["lang"], 10))
        assert base == reparted, fn.__name__


def test_stratified_sample_exact_quota(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    out = sampling.stratified_sample_exact(docs, ["lang"], 10)
    per = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    avail = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    for lang, n in per.items():
        assert n == min(10, avail[lang]), lang


def test_pack_offsets_within_capacity_and_contiguous(spark, sf_dir):
    """pack_offset ∈ [0, capacity); within a shard, pack_ids are
    non-decreasing in doc order and start at 0."""
    cap = 256
    docs = load(spark, sf_dir, "documents").withColumn(
        "n_tok", text.n_tokens(F.col("text"))
    )
    packed = sampling.pack_context_windows(docs, cap).collect()
    assert all(0 <= r["pack_offset"] < cap for r in packed)
    by_shard: dict[str, list] = {}
    for r in sorted(packed, key=lambda r: (r["source"], r["doc_id"])):
        by_shard.setdefault(r["source"], []).append(r)
    for shard, rows in by_shard.items():
        assert rows[0]["pack_id"] == 0 and rows[0]["pack_offset"] == 0, shard
        for a, b in zip(rows, rows[1:]):
            assert b["pack_id"] >= a["pack_id"], shard


def test_pack_bins_whole_docs_invariants(spark):
    from big_data_pr_spark.operators.sampling import pack_bins_whole_docs

    rows = [(i, "s%d" % (i % 2), 1 + (i * 37) % 400) for i in range(60)]
    rows += [(100, "s0", 900), (101, "s1", 2000)]  # oversize docs
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tok long")
    out = pack_bins_whole_docs(df, 512).collect()
    assert len(out) == len(rows)  # every doc packed exactly once

    from collections import defaultdict

    fill = defaultdict(int)
    for r in out:
        if not r["oversize"]:
            fill[(r["source"], r["pack_id"])] += r["n_tok"]
    assert fill and all(v <= 512 for v in fill.values())
    # oversize docs isolated in their own packs
    oversized = [r for r in out if r["oversize"]]
    assert {r["doc_id"] for r in oversized} == {100, 101}
    for r in oversized:
        assert (r["source"], r["pack_id"]) not in fill

    # FFD can't use more bins than docs, nor fewer than the volume bound
    import math

    for shard in ("s0", "s1"):
        shard_rows = [r for r in out if r["source"] == shard and not r["oversize"]]
        n_bins = len({r["pack_id"] for r in shard_rows})
        lower = math.ceil(sum(r["n_tok"] for r in shard_rows) / 512)
        assert lower <= n_bins <= len(shard_rows)
        # FFD guarantee: within 11/9 OPT + 1 of the volume lower bound
        assert n_bins <= math.ceil(11 * lower / 9) + 1

    # deterministic across runs
    again = pack_bins_whole_docs(df, 512).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_weighted_reservoir_fixed_size_and_partition_invariant(spark, sf_dir):
    from big_data_pr_spark.operators.sampling import weighted_reservoir
    from big_data_pr_spark.tables import load
    from pyspark.sql import functions as F

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    a = {r["doc_id"] for r in weighted_reservoir(docs, "n_chars", 20).collect()}
    b = {
        r["doc_id"]
        for r in weighted_reservoir(docs.repartition(16), "n_chars", 20).collect()
    }
    assert len(a) == 20
    assert a == b  # deterministic under adversarial partitioning
    # weight-proportional inclusion: the sample skews long across seeds
    corpus_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    means = []
    for seed in ("res1", "res2", "res3"):
        s = weighted_reservoir(docs, "n_chars", 20, seed=seed)
        means.append(s.agg(F.avg("n_chars")).collect()[0][0])
    assert sum(means) / len(means) > corpus_mean
