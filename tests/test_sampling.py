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
