"""RAG pipeline: chunk -> stub-embed -> IVF index -> pruned retrieval."""

from __future__ import annotations

from big_data_pr_spark.pipelines.rag import (
    _embed_text,
    build_rag_index,
    rag_query,
)
from big_data_pr_spark.tables import load


def test_embed_stub_deterministic_and_normalized():
    a = _embed_text("the quick brown fox", 64)
    b = _embed_text("the quick brown fox", 64)
    assert a == b
    assert abs(sum(x * x for x in a) - 1.0) < 1e-9
    assert _embed_text("something else entirely", 64) != a


def test_rag_index_and_retrieval(spark, sf_dir, tmp_path):
    docs = load(spark, sf_dir, "documents").limit(200)
    out = str(tmp_path / "rag")
    build_rag_index(docs, out, n_list=8, dim=64)

    # querying with a document's own text must retrieve one of its own
    # chunks at rank 1 (self-similarity ~1 in the hashed-token space)
    probe_doc = docs.orderBy("doc_id").limit(1).collect()[0]
    hits = rag_query(spark, out, probe_doc["text"], k=5, n_probe=4).collect()
    assert hits, "no hits returned"
    assert hits[0]["doc_id"] == probe_doc["doc_id"]
    assert hits[0]["cos_sim"] >= 0.9
    # chunk text rides along for the generation stage
    assert isinstance(hits[0]["chunk"], str) and hits[0]["chunk"]
    # deterministic retrieval
    again = rag_query(spark, out, probe_doc["text"], k=5, n_probe=4).collect()
    assert [(h["chunk_key"], h["cos_sim"]) for h in hits] == [
        (h["chunk_key"], h["cos_sim"]) for h in again
    ]
