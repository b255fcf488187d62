"""RAG indexing pipeline: documents → sliding-window chunks →
embeddings → IVF index at rest → partition-pruned retrieval.

The embedder here is a deterministic hashed bag-of-tokens stub (the
container ships no model runtime): each token hashes into one of
``dim`` buckets with a ±1 sign, the bucket sums are L2-normalized.
That keeps every Spark-side property of a real encoder — Arrow-batched
``pandas_udf`` over the chunk column, array<float> output schema,
per-executor batch shape — while being reproducible on the driver for
query-time embedding. Swapping in a real model is replacing
``_embed_text``'s body (load the model once per executor in the UDF
closure), nothing else moves.

Scale: chunking is a narrow fan-out (see ``text.chunk_tokens``); the
embed stage is one Arrow-batched pass; the index write pays the IVF
assignment once and partitions by cell (``operators/ann_index.py``),
so a query probes ``n_probe/n_list`` of the chunk corpus via partition
pruning. End to end there is exactly one wide stage — the partitioned
index write.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text
from ..operators.ann_index import probe_ivf_index, write_ivf_index

# chunk_key = doc_id * CHUNK_STRIDE + chunk_id — one bigint key per
# chunk, stable across runs (documents carry < CHUNK_STRIDE chunks)
CHUNK_STRIDE = 1_000_000


def _embed_text(s: str, dim: int) -> list[float]:
    """Deterministic hashed bag-of-tokens embedding (pure python so the
    driver can embed query strings identically to the executors)."""
    buckets = [0.0] * dim
    for tok in s.split(" "):
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        buckets[h % dim] += 1.0 if (h >> 63) & 1 == 0 else -1.0
    norm = sum(b * b for b in buckets) ** 0.5
    if norm > 1e-12:
        buckets = [b / norm for b in buckets]
    return buckets


def _embed_udf(dim: int):
    import pandas as pd

    from pyspark.sql.types import ArrayType, FloatType

    def embed(chunks):
        # a real encoder loads its model HERE (once per python worker)
        # and runs batched inference over the Arrow batch
        return chunks.map(lambda s: _embed_text(s, dim))

    # real annotations, set explicitly: this module's
    # `from __future__ import annotations` would stringize inline hints,
    # which PySpark's pandas-UDF signature inspection rejects
    embed.__annotations__ = {"chunks": pd.Series, "return": pd.Series}
    return F.pandas_udf(ArrayType(FloatType()))(embed)


def embed_chunks(
    chunks: DataFrame, dim: int = 64, chunk_col: str = "chunk"
) -> DataFrame:
    """Arrow-batched embedding pass; adds ``embedding`` array<float>."""
    return chunks.withColumn("embedding", _embed_udf(dim)(F.col(chunk_col)))


def build_rag_index(
    docs: DataFrame,
    out_dir: str,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    stride: int = 48,
    dim: int = 64,
    n_list: int = 16,
):
    """documents → chunks → embeddings → cell-partitioned IVF index."""
    chunks = text.chunk_tokens(docs, id_col, text_col, window, stride).withColumn(
        "chunk_key", F.col(id_col) * CHUNK_STRIDE + F.col("chunk_id")
    )
    embedded = embed_chunks(chunks, dim).select("chunk_key", "chunk", "embedding")
    cents = write_ivf_index(
        embedded, out_dir, n_list=n_list, id_col="chunk_key", vec_col="embedding"
    )
    with open(os.path.join(out_dir, "dim.txt"), "w") as f:
        f.write(str(dim))
    return cents


def rag_query(
    spark: SparkSession,
    index_dir: str,
    query_text: str,
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """Embed the query driver-side (same hash space as the index) and
    retrieve top-k chunks from the probed cells only. Returns
    (chunk_key, doc_id, chunk_id, cell, cos_sim)."""
    with open(os.path.join(index_dir, "dim.txt")) as f:
        dim = int(f.read().strip())
    qvec = _embed_text(query_text, dim)
    hits = probe_ivf_index(
        spark,
        index_dir,
        qvec,
        k=k,
        n_probe=n_probe,
        id_col="chunk_key",
        keep_cols=("chunk",),
    )
    return hits.select(
        "chunk_key",
        F.floor(F.col("chunk_key") / CHUNK_STRIDE).cast("long").alias("doc_id"),
        (F.col("chunk_key") % CHUNK_STRIDE).cast("long").alias("chunk_id"),
        "cell",
        "cos_sim",
        "chunk",
    )
