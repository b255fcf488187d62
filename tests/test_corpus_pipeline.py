"""End-to-end pretraining-corpus pipeline: planted-defect behavior,
output invariants, single-pass observed metrics, partitioned write."""

from __future__ import annotations

import pyspark.sql.functions as F

from big_data_pr_spark.pipelines import build_pretrain_corpus
from big_data_pr_spark.tables import load


def _planted_docs(spark):
    """Small corpus with planted defects: an exact duplicate pair, a
    near-duplicate chain, a junk (repetitive) doc, and clean fillers."""
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away to find a quiet field full of tall grass and warm sun "
        "where it naps for a while before the long trip home at dusk"
    )
    near1 = base.replace("quiet field", "silent meadow")
    near2 = near1.replace("warm sun", "bright sun")
    rows = [
        (1, base, "srcA"),
        (2, base, "srcA"),  # exact dup of 1
        (3, near1, "srcA"),  # near-dup chain 1~3~4
        (4, near2, "srcB"),
        (5, "spam spam spam spam spam spam spam spam spam spam spam spam", "srcB"),
        (6, "a completely different document about the history of ships "
            "and the sailors who crossed wide oceans in search of new "
            "lands with maps and stars to guide them on the way there", "srcB"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_pipeline_planted_defects(spark):
    docs = _planted_docs(spark)
    res = build_pretrain_corpus(
        docs, None, quality_min=0.0, repetition_max=0.5, lsh_min_jaccard=0.5,
        pack_capacity=32,
    )
    out = res.documents.collect()
    ids = sorted(r["doc_id"] for r in out)
    # exact dup: only min-id survivor of {1,2}; near-dup chain 1~3~4
    # collapses transitively to the min id as well
    assert 2 not in ids
    assert 1 in ids
    assert not {3, 4} & set(ids)
    # repetitive junk dropped by the repetition gate
    assert 5 not in ids
    # clean doc kept
    assert 6 in ids
    # metrics observed on the action's single pass, monotone decreasing
    m = res.metrics()
    assert m["00_input"] == 6
    assert m["01_quality_gate"] == 5  # junk doc 5 out
    assert m["02_exact_dedup"] == 4  # doc 2 out
    assert m["03_near_dedup"] == 2  # docs 3, 4 out
    # split column present and valid
    assert {r["split"] for r in out} <= {"train", "val", "test"}


def test_pipeline_decontamination(spark):
    docs = _planted_docs(spark)
    # doc 6's text as the "benchmark" -> doc 6 must be dropped
    bench = docs.filter(F.col("doc_id") == 6).select("doc_id", "text")
    res = build_pretrain_corpus(
        docs.filter(F.col("doc_id").isin(1, 5, 6)),
        bench,
        quality_min=0.0,
        repetition_max=0.5,
        contamination_max=0.2,
    )
    ids = sorted(r["doc_id"] for r in res.documents.collect())
    assert 6 not in ids
    assert 1 in ids
    m = res.metrics()
    assert m["04_decontaminated"] < m["03_near_dedup"]


def test_pipeline_fixture_write(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents")
    res = build_pretrain_corpus(docs, None, pack_capacity=512)
    metrics = res.write(str(tmp_path / "corpus"))
    assert metrics["00_input"] == docs.count()
    # pipeline always shrinks (or keeps) the corpus, never grows it
    stages = sorted(metrics)
    for a, b in zip(stages, stages[1:]):
        assert metrics[b] <= metrics[a], (a, b, metrics)
    # partitioned layout: one subdir per split, readable round-trip
    back = spark.read.parquet(str(tmp_path / "corpus" / "documents"))
    assert back.count() == metrics[stages[-1]]
    assert set(r["split"] for r in back.select("split").distinct().collect()) <= {
        "train", "val", "test",
    }
    # no duplicate content survives
    assert (
        back.groupBy(F.md5("text")).count().filter(F.col("count") > 1).isEmpty()
    )
    # quality gate respected
    assert back.filter(F.col("quality") < 0.3).isEmpty()
    # packs: offsets within capacity, every surviving doc packed
    packs = spark.read.parquet(str(tmp_path / "corpus" / "packs"))
    assert packs.count() == back.count()
    assert packs.filter(
        (F.col("pack_offset") < 0) | (F.col("pack_offset") >= 512)
    ).isEmpty()


def test_streaming_corpus_intake(spark, tmp_path):
    """Streaming front half: JSON-lines docs -> scrub/gate/in-flight
    dedup -> date-partitioned append staging; replays and intra-stream
    exact dups are dropped, junk quality is gated."""
    import json as _json

    from big_data_pr_spark.streaming.corpus_intake import (
        clean_doc_stream,
        doc_file_source,
        start_intake,
    )

    good = (
        "the quick brown fox jumps over the lazy dog and runs to a "
        "field of tall grass where it naps in the warm sun for a while"
    )
    rows = [
        {"doc_id": 1, "fetched_at": "2024-01-01T10:00:00", "text": good, "source": "crawlA"},
        {"doc_id": 2, "fetched_at": "2024-01-01T10:00:30", "text": good, "source": "crawlB"},  # dup content
        {"doc_id": 3, "fetched_at": "2024-01-01T10:01:00",
         "text": "call 25-989-741-2988 " + good.replace("fox", "cat"), "source": "crawlA"},
        {"doc_id": 4, "fetched_at": "2024-01-02T09:00:00", "text": "spam " * 10, "source": "crawlB"},  # junk
    ]
    src = tmp_path / "in"
    src.mkdir()
    (src / "batch1.json").write_text("\n".join(_json.dumps(r) for r in rows))

    out = str(tmp_path / "staged")
    q = start_intake(
        clean_doc_stream(doc_file_source(spark, str(src)), quality_min=0.2),
        out,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)

    staged = spark.read.parquet(out)
    got = {r["doc_id"]: r for r in staged.collect()}
    assert 1 in got and 3 in got
    assert 2 not in got  # in-flight content dedup
    assert 4 not in got  # quality gate
    assert "[PHONE]" in got[3]["text"]  # PII scrubbed before landing
    # date-partitioned staging layout
    import os

    assert any(d.startswith("ingest_date=") for d in os.listdir(out))

    # a replay of the same file through a NEW stream epoch with the same
    # checkpoint is a no-op (source tracking), keeping the sink append-safe
    q2 = start_intake(
        clean_doc_stream(doc_file_source(spark, str(src)), quality_min=0.2),
        out,
        str(tmp_path / "ckpt"),
    )
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == len(got)
