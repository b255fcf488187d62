"""Training-data-pipeline query surface on ``documents`` and
``embeddings`` (the north-star extensions: text analysis, dedup,
similarity search — BASELINE.json).

Oracle construction notes:
- token counts use the same space-counting formula on both engines
  (documents are single-space-separated; verified);
- the rolling hash folds identical integer arithmetic (mod 1e9+7) —
  DuckDB ``list_reduce`` has no init parameter, so a 0 is prepended;
- cosine arithmetic is an ordered left-to-right double fold on both
  sides (Spark ``aggregate``, DuckDB ``list_sum``) over float32→double
  casts, rounded to 6 dp;
- MinHash/SimHash/ANN-LSH have no oracle (hash families are
  engine-specific) → rows-only checks; their behavioral tests with
  planted duplicates live in tests/test_dedup_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, multimodal, similarity, text
from ..tables import load
from .registry import register

# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

_STOP_PRED = " OR ".join(f"x = '{s}'" for s in text.STOPWORDS)
_TOKENS = "string_split(text, ' ')"
_NT = "(length(text) - length(replace(text, ' ', '')) + 1)"


@register(
    "text_stats",
    f"""
    SELECT doc_id, lang, n_chars,
           length(text)                                        AS n_chars_calc,
           {_NT}                                               AS n_tok,
           len(list_distinct({_TOKENS}))                       AS n_uniq,
           len(regexp_extract_all(text, '{text.TOKEN_REGEX}')) AS n_subword,
           round((length(text) - ({_NT} - 1)) / {_NT}, 6)      AS avg_token_len,
           round(len(list_filter({_TOKENS}, x -> {_STOP_PRED})) / {_NT}, 6)
                                                               AS stopword_ratio
    FROM documents ORDER BY doc_id
    """,
    doc="Per-document token statistics: chars, whitespace tokens, unique "
    "tokens, BPE-ish subword count, mean token length, stopword ratio — "
    "all JVM built-ins, no UDF.",
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return (
        text.token_stats(docs)
        .select(
            "doc_id", "lang", "n_chars",
            "n_chars_calc", "n_tok", "n_uniq", "n_subword",
            "avg_token_len", "stopword_ratio",
        )
    )


def _marker_count(markers: tuple[str, ...]) -> str:
    pred = " OR ".join(f"x = '{m}'" for m in markers)
    return f"len(list_filter({_TOKENS}, x -> {pred}))"


@register(
    "lang_id",
    f"""
    WITH c AS (
      SELECT doc_id, lang,
             {_marker_count(text.LANG_MARKERS["de"])} AS c_de,
             {_marker_count(text.LANG_MARKERS["en"])} AS c_en,
             {_marker_count(text.LANG_MARKERS["es"])} AS c_es,
             {_marker_count(text.LANG_MARKERS["fr"])} AS c_fr,
             {_marker_count(text.LANG_MARKERS["zh"])} AS c_zh
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN c_de + c_en + c_es + c_fr + c_zh = 0 THEN 'en'
                WHEN c_de >= c_en AND c_de >= c_es AND c_de >= c_fr AND c_de >= c_zh THEN 'de'
                WHEN c_en >= c_es AND c_en >= c_fr AND c_en >= c_zh THEN 'en'
                WHEN c_es >= c_fr AND c_es >= c_zh THEN 'es'
                WHEN c_fr >= c_zh THEN 'fr'
                ELSE 'zh' END AS pred_lang
    FROM c ORDER BY doc_id
    """,
    doc="Heuristic stopword/n-gram language ID with deterministic argmax "
    "(first language in sorted order wins ties).",
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return text.lang_id(docs).select("doc_id", "lang", "pred_lang")


@register(
    "quality_score",
    f"""
    SELECT doc_id,
           CAST(floor((0.4 * least({_NT} / 200.0, 1.0)
               + 0.3 * (len(list_distinct({_TOKENS})) / {_NT})
               + 0.3 * least(len(list_filter({_TOKENS}, x -> {_STOP_PRED})) / 10.0, 1.0))
               * 1e6 + 0.5) AS BIGINT) / 1e6 AS quality
    FROM documents ORDER BY doc_id
    """,
    doc="Gopher/C4-shaped deterministic quality score: length saturation + "
    "lexical diversity + stopword presence.",
)
def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return text.quality_score(docs).select("doc_id", "quality")


@register(
    "doc_fingerprint",
    """
    SELECT doc_id, md5(text) AS md5,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(string_split(text, ''), ch -> CAST(ascii(ch) AS BIGINT))),
             (acc, x) -> (acc * 31 + x) % 1000000007) AS rolling_hash
    FROM documents ORDER BY doc_id
    """,
    doc="Content fingerprints: MD5 + polynomial rolling hash (base 31 mod "
    "1e9+7) folded over the character array JVM-side.",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return text.fingerprint(docs).select("doc_id", "md5", "rolling_hash")


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    """
    SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
    FROM documents GROUP BY md5(text) ORDER BY content_hash
    """,
    doc="Exact dedup: hash-groupBy on the content digest, min-id survivor.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return dedup.exact_duplicates(docs)


@register(
    "dedup_ngram_jaccard",
    """
    WITH sh AS (
      SELECT doc_id AS sid, unnest(list_distinct(list_transform(
               range(1, greatest(len(string_split(text,' ')) - 2, 0) + 1),
               i -> string_split(text,' ')[i] || ' ' ||
                    string_split(text,' ')[i+1] || ' ' ||
                    string_split(text,' ')[i+2]))) AS shingle
      FROM documents
    ),
    sizes AS (SELECT sid, count(*) AS set_size FROM sh GROUP BY sid),
    rare AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100),
    filtered AS (SELECT sh.* FROM sh JOIN rare USING (shingle)),
    inter AS (
      SELECT a.sid AS id_a, b.sid AS id_b, count(*) AS n_common
      FROM filtered a JOIN filtered b
        ON a.shingle = b.shingle AND a.sid < b.sid
      GROUP BY a.sid, b.sid
    )
    SELECT id_a, id_b, n_common,
           round(n_common / (sa.set_size + sb.set_size - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.sid = id_a
    JOIN sizes sb ON sb.sid = id_b
    WHERE round(n_common / (sa.set_size + sb.set_size - n_common), 6) >= 0.005
    ORDER BY id_a, id_b
    """,
    doc="Exact word-3-gram Jaccard over the inverted shingle index with "
    "stop-shingle (doc-freq) skew guard — the verification stage of a "
    "MinHash pipeline, runnable standalone.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return dedup.jaccard_pairs(docs, threshold=0.005, max_doc_freq=100)


@register(
    "dedup_minhash_lsh",
    None,  # xxhash64 family is engine-specific → rows-only
    doc="MinHash(16)+LSH(4 bands) candidate pairs with estimated Jaccard — "
    "banded bucket join, never all-pairs. Behavioral recall test with "
    "planted duplicates in tests/test_dedup_similarity.py.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(docs, min_est_jaccard=0.5)


@register(
    "dedup_simhash",
    None,  # xxhash64-based signature → rows-only
    doc="SimHash-64 near-dup pairs (Hamming ≤ 3) via 4×16-bit band "
    "pigeonhole + popcount verify.",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return dedup.simhash_pairs(docs)


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------

_COS_EXPR = """
    round(
      list_sum(list_transform(range(1, len(a.embedding) + 1),
        i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(range(1, len(a.embedding) + 1),
           i -> CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE))))
       * sqrt(list_sum(list_transform(range(1, len(b.embedding) + 1),
           i -> CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE))))),
      6)
"""


@register(
    "knn_cosine_bruteforce",
    f"""
    SELECT b.vec_id AS query_id, a.vec_id, {_COS_EXPR} AS cos_sim
    FROM embeddings a, (SELECT vec_id, embedding FROM embeddings WHERE vec_id = 0) b
    WHERE a.vec_id <> b.vec_id
    ORDER BY cos_sim DESC, a.vec_id
    LIMIT 10
    """,
    doc="Exact cosine top-10 for query vec_id=0: broadcast query, one "
    "narrow JVM pass (zip_with+aggregate), TakeOrderedAndProject heap.",
)
def knn_cosine_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    return similarity.cosine_topk(emb, q, k=10)


@register(
    "embedding_dup_pairs",
    f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COS_EXPR} AS cos_sim
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_COS_EXPR} >= 0.4
    ORDER BY id_a, id_b
    """,
    doc="Embedding near-duplicate pairs (cosine ≥ 0.4) — exact self-join "
    "verifier; at scale gate it behind the LSH candidate generator.",
)
def embedding_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return similarity.cosine_pairs(emb, threshold=0.4)


@register(
    "embedding_dup_pairs_lsh",
    None,  # seeded-hyperplane buckets → rows-only; recall vs the exact
    # pair set asserted in tests/test_dedup_similarity.py
    doc="Embedding near-dup pairs, scale path: banded LSH candidate "
    "generation (4 bands × 3 planes, bucket-local join, no O(n²) "
    "cross) + exact cosine verify ≥ 0.4 — subset of embedding_dup_pairs.",
)
def embedding_dup_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    return similarity.lsh_pairs(emb, dim=64, threshold=0.4)


@register(
    "ann_ivf_topk",
    None,  # approximate (centroid-probe restriction) → rows-only
    doc="ANN top-k via IVF: deterministic-seed centroids + 2 Lloyd "
    "iterations, n_probe=4 of n_list=16 cells probed, exact re-rank "
    "inside probed cells; recall vs brute force asserted in tests.",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    return similarity.ann_ivf_topk(emb, q, k=10, n_list=16, n_probe=4)


@register(
    "ann_lsh_topk",
    None,  # approximate + RNG-plane buckets → rows-only
    doc="ANN top-k via random-hyperplane LSH bucket restriction + exact "
    "re-rank; recall vs brute force asserted in tests.",
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0)
    return similarity.ann_lsh_topk(emb, q, dim=64, k=10, n_planes=6)


# ---------------------------------------------------------------------------
# Multimodal plumbing (binary columns + typed metadata)
# ---------------------------------------------------------------------------


@register(
    "multimodal_meta",
    """
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text)               AS sha_hex
    FROM documents ORDER BY doc_id
    """,
    doc="Binary-column plumbing: utf-8 payload bytes + SHA-256 digest — "
    "the metadata pass every image/audio/video column gets before decode.",
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        F.length(payload).alias("n_bytes"),
        F.sha2(payload, 256).alias("sha_hex"),
    )


@register(
    "multimodal_decode",
    None,  # fake-decoder output (deterministic, but not SQL) → rows-only
    doc="Image-decode plumbing over mapInPandas: binary payload → "
    "(n_bytes, width, height, mode, sha) metadata batch-wise; the "
    "decoder body is the production PIL/ffmpeg hook (stubbed: "
    "deterministic digest-derived dims; real=True raises).",
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return multimodal.decode_images(multimodal.attach_payload(docs, "doc_id"))


@register(
    "multimodal_frames",
    """
    SELECT doc_id AS id, f.frame_idx,
           CAST(f.frame_idx * 2500 AS BIGINT) AS offset_ms
    FROM documents, (SELECT unnest(range(0, 4)) AS frame_idx) f
    ORDER BY id, f.frame_idx
    """,
    doc="Video frame-sampling plumbing: K evenly spaced offsets per "
    "payload via JVM-side explode (decode of each frame then goes "
    "through the mapInPandas image path).",
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return multimodal.sample_frames(
        multimodal.attach_payload(docs, "doc_id"), n_frames=4, duration_ms=10_000
    )


@register(
    "multimodal_features",
    None,  # digest-derived fake features → rows-only
    doc="Feature-extraction plumbing: payload → fixed-dim array<double> "
    "via Arrow-batched mapInPandas (production hook for any vision/"
    "audio encoder).",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return multimodal.extract_features(multimodal.attach_payload(docs, "doc_id"))
