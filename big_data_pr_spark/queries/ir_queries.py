"""Information-retrieval & association analytics over the fixture corpus.

Generalizes the reference's serving-layer *search* surface (app.py's
Elasticsearch match/term queries are BM25-ranked by ES itself — the
ranking function the serving layer relies on but never shows) into
engine-native, oracle-checkable queries:

- ``bm25_search_lit``   — Okapi BM25 ranking for a literal term query
  (the scoring ES applies to app.py's index queries, reproduced as
  three grouped aggregates — no index server needed);
- ``pmi_collocations``  — pointwise-mutual-information collocation
  mining (phrase discovery for tokenizer/vocab curation);
- ``market_basket_pairs`` — co-occurrence + lift over order baskets
  (the classic association-rule building block, keyed self-join);
- ``containment_pairs`` — asymmetric shingle containment, the
  doc-inside-doc twin of ``dedup_ngram_jaccard`` (catches quote/
  wrapper duplication that symmetric Jaccard under-scores).

Scale posture (100 TB):
- BM25 filters the exploded token stream to the |Q| query terms BEFORE
  any shuffle — the aggregate state is O(matching docs), the df/avgdl
  side-inputs are O(|Q|) and O(1) broadcasts.
- PMI's state is vocabulary-bounded (unigram + bigram counts), the
  same two grouped aggregates as ``bigram_lm``; top-k is a heap.
- Basket pairs self-join is keyed by the basket id; TPC-H order size
  is bounded (≤7 lineitems), so per-key fanout is O(k²) with tiny k —
  never a cross join. Pair counts partial-aggregate map-side.
- Containment reuses the rare-shingle inverted index (stop-shingle cap
  = skew guard); the pair state is edge-sized, not corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup
from ..operators.text import bigrams, n_tokens, tokens
from ..tables import load
from .registry import REGISTRY, register

# Literal search query — terms present in the synthetic vocabulary.
_BM25_TERMS = ["window", "merge", "scan"]
_BM25_K1 = 1.2
_BM25_B = 0.75
_TERMS_SQL = "('" + "', '".join(_BM25_TERMS) + "')"


@register(
    "bm25_search_lit",
    f"""
    WITH dl AS (
      SELECT doc_id,
             (length(text) - length(replace(text, ' ', '')) + 1) AS dl
      FROM documents),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents),
    qtok AS (SELECT * FROM tok WHERE term IN {_TERMS_SQL}),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM qtok
           GROUP BY doc_id, term),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
                 * tf.tf * ({_BM25_K1} + 1)
                 / (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
                    + {_BM25_B} * dl.dl / s.avgdl))) AS score,
             count(*) AS n_terms_hit
      FROM tf
      JOIN df USING (term)
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s
      GROUP BY tf.doc_id)
    SELECT doc_id, n_terms_hit, round(score, 6) AS score
    FROM scored
    ORDER BY round(score, 6) DESC, doc_id
    LIMIT 10
    """,
    doc="Okapi BM25 top-10 for a literal 3-term query — the ranking "
    "function behind the reference serving layer's Elasticsearch "
    "match queries (app.py), engine-native: token stream filtered to "
    "the query terms BEFORE the shuffle, so tf state is O(hits), df "
    "is |Q| rows, avgdl/N a 1-row broadcast. k1=1.2, b=0.75.",
)
def bm25_search_lit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    dl = docs.select("doc_id", n_tokens(F.col("text")).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    qtok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    ).filter(F.col("term").isin(_BM25_TERMS))
    tf = qtok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = F.col("tf") + _BM25_K1 * (
        1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * F.col("tf") * (_BM25_K1 + 1) / norm
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.sum(contrib).alias("score"),
            F.count(F.lit(1)).alias("n_terms_hit"),
        )
    )
    return (
        scored.select(
            "doc_id", "n_terms_hit", F.round("score", 6).alias("score")
        )
        .orderBy(F.desc("score"), "doc_id")
        .limit(10)
    )


@register(
    "pmi_collocations",
    """
    WITH toks AS (SELECT string_split(text, ' ') AS t FROM documents),
    bg AS (SELECT unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                                        i -> t[i] || ' ' || t[i+1])) AS bigram
           FROM toks),
    c2 AS (SELECT bigram, count(*) AS n_xy FROM bg GROUP BY bigram),
    uni AS (SELECT unnest(t) AS w FROM toks),
    c1 AS (SELECT w, count(*) AS n_w FROM uni GROUP BY w),
    tot AS (SELECT (SELECT count(*) FROM bg) AS n_bi,
                   (SELECT count(*) FROM uni) AS n_uni),
    pmi AS (
      SELECT c2.bigram, c2.n_xy,
             ln((c2.n_xy / t.n_bi)
                / ((ca.n_w / t.n_uni) * (cb.n_w / t.n_uni))) AS pmi
      FROM c2
      JOIN c1 ca ON ca.w = string_split(c2.bigram, ' ')[1]
      JOIN c1 cb ON cb.w = string_split(c2.bigram, ' ')[2]
      CROSS JOIN tot t
      WHERE c2.n_xy >= 20)
    SELECT bigram, n_xy, round(pmi, 6) AS pmi
    FROM pmi
    ORDER BY round(pmi, 6) DESC, bigram
    LIMIT 40
    """,
    doc="Top-40 bigram collocations by pointwise mutual information "
    "(min count 20) — phrase discovery for tokenizer/vocabulary "
    "curation. Two vocabulary-bounded grouped aggregates (same state "
    "shape as bigram_lm), unigram counts joined back onto each side "
    "of the pair, top-k via heap. PMI = ln(p(xy)/(p(x)p(y))).",
)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    bg = docs.select(F.explode(bigrams("text")).alias("bigram"))
    c2 = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("n_xy"))
    uni = docs.select(F.explode(tokens(F.col("text"))).alias("w"))
    c1 = uni.groupBy("w").agg(F.count(F.lit(1)).alias("n_w"))
    tot = bg.agg(F.count(F.lit(1)).alias("n_bi")).crossJoin(
        uni.agg(F.count(F.lit(1)).alias("n_uni"))
    )
    parts = F.split(F.col("bigram"), " ")
    ca = c1.select(
        F.col("w").alias("w_a"), F.col("n_w").alias("n_a")
    )
    cb = c1.select(
        F.col("w").alias("w_b"), F.col("n_w").alias("n_b")
    )
    pmi = F.log(
        (F.col("n_xy") / F.col("n_bi"))
        / ((F.col("n_a") / F.col("n_uni")) * (F.col("n_b") / F.col("n_uni")))
    )
    return (
        c2.filter(F.col("n_xy") >= 20)
        .withColumn("w_a", parts[0])
        .withColumn("w_b", parts[1])
        .join(F.broadcast(ca), "w_a")
        .join(F.broadcast(cb), "w_b")
        .crossJoin(F.broadcast(tot))
        .select("bigram", "n_xy", F.round(pmi, 6).alias("pmi"))
        .orderBy(F.desc("pmi"), "bigram")
        .limit(40)
    )


@register(
    "market_basket_pairs",
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
      FROM lineitem),
    n AS (SELECT count(DISTINCT basket) AS n_baskets FROM items),
    freq AS (SELECT item, count(*) AS n_item FROM items GROUP BY item),
    pairs AS (
      SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_ab
      FROM items a JOIN items b
        ON a.basket = b.basket AND a.item < b.item
      GROUP BY a.item, b.item)
    SELECT p.item_a, p.item_b, p.n_ab,
           round(CAST(p.n_ab AS DOUBLE) * n.n_baskets
                 / (fa.n_item * fb.n_item), 6) AS lift
    FROM pairs p
    JOIN freq fa ON fa.item = p.item_a
    JOIN freq fb ON fb.item = p.item_b
    CROSS JOIN n
    WHERE p.n_ab >= 2
    ORDER BY p.n_ab DESC, p.item_a, p.item_b
    LIMIT 50
    """,
    doc="Frequently-bought-together: part-pair co-occurrence counts + "
    "lift over order baskets. Self-join keyed by the basket id (TPC-H "
    "order size ≤7 ⇒ per-key fanout O(k²), never a cross join), pair "
    "counts partial-aggregate map-side, item frequencies broadcast "
    "back, top-50 via heap. The association-rule building block.",
)
def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    # r13 NOTE: a localCheckpoint on `items` (shared by three
    # consumers) was measured and REVERTED: 2.4 -> 3.8 s at sf0.1 —
    # AQE stage reuse already shares the distinct's exchange across
    # the consumers, and the eager materialization barrier cost more
    # than the duplicate plan text.
    items = li.select(
        F.col("l_orderkey").alias("basket"), F.col("l_partkey").alias("item")
    ).distinct()
    n = items.select("basket").distinct().agg(
        F.count(F.lit(1)).alias("n_baskets")
    )
    freq = items.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    a = items.select("basket", F.col("item").alias("item_a"))
    b = items.select("basket", F.col("item").alias("item_b"))
    pairs = (
        a.join(b, "basket")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 2)
    )
    fa = freq.select(F.col("item").alias("item_a"), F.col("n_item").alias("n_a"))
    fb = freq.select(F.col("item").alias("item_b"), F.col("n_item").alias("n_b"))
    lift = F.round(
        F.col("n_ab").cast("double")
        * F.col("n_baskets")
        / (F.col("n_a") * F.col("n_b")),
        6,
    )
    return (
        pairs.join(fa, "item_a")
        .join(fb, "item_b")
        .crossJoin(F.broadcast(n))
        .select("item_a", "item_b", "n_ab", lift.alias("lift"))
        .orderBy(F.desc("n_ab"), "item_a", "item_b")
        .limit(50)
    )


@register(
    "containment_pairs",
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
           round(n_common / least(sa.set_size, sb.set_size), 6)
             AS containment
    FROM inter
    JOIN sizes sa ON sa.sid = id_a
    JOIN sizes sb ON sb.sid = id_b
    WHERE round(n_common / least(sa.set_size, sb.set_size), 6) >= 0.02
    ORDER BY id_a, id_b
    """,
    doc="Asymmetric shingle containment C = |A∩B| / min(|A|,|B|) over "
    "the rare-shingle inverted index — the doc-inside-doc twin of "
    "dedup_ngram_jaccard: catches quote/wrapper duplication that "
    "symmetric Jaccard under-scores (a 50-token doc fully embedded in "
    "a 5000-token doc has tiny Jaccard but containment 1.0). Same "
    "stop-shingle skew guard and edge-sized pair state.",
)
def containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return dedup.containment_pairs(docs, threshold=0.02, max_doc_freq=100)


@register(
    "bm25_ndcg_eval",
    f"""
    WITH dl AS (
      SELECT doc_id,
             (length(text) - length(replace(text, ' ', '')) + 1) AS dl
      FROM documents),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
    tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents),
    qtok AS (SELECT * FROM tok WHERE term IN {_TERMS_SQL}),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM qtok
           GROUP BY doc_id, term),
    df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    rel AS (
      SELECT doc_id, CASE WHEN count(DISTINCT term) = 3 THEN 1 ELSE 0 END
               AS relevant
      FROM tf GROUP BY doc_id),
    scored AS (
      SELECT tf.doc_id,
             round(sum(ln(1 + (s.n_docs - df.df + 0.5) / (df.df + 0.5))
                 * tf.tf * ({_BM25_K1} + 1)
                 / (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
                    + {_BM25_B} * dl.dl / s.avgdl))), 6) AS score
      FROM tf
      JOIN df USING (term)
      JOIN dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s
      GROUP BY tf.doc_id),
    ranked AS (
      SELECT s.doc_id, r.relevant,
             row_number() OVER (ORDER BY s.score DESC, s.doc_id) AS rk
      FROM scored s JOIN rel r USING (doc_id)),
    nrel AS (SELECT sum(relevant) AS n_relevant FROM ranked),
    dcg AS (
      SELECT sum(relevant / log2(rk + 1)) AS dcg,
             sum(relevant) AS hits_at_10
      FROM ranked WHERE rk <= 10),
    idcg AS (
      SELECT sum(1.0 / log2(r + 1)) AS idcg
      FROM (SELECT unnest(range(1, 11)) AS r) t CROSS JOIN nrel
      WHERE r <= least(nrel.n_relevant, 10))
    SELECT CAST(nrel.n_relevant AS BIGINT) AS n_relevant,
           CAST(dcg.hits_at_10 AS BIGINT) AS hits_at_10,
           round(dcg.dcg, 6) AS dcg_10,
           round(idcg.idcg, 6) AS idcg_10,
           round(dcg.dcg / idcg.idcg, 6) AS ndcg_10
    FROM dcg CROSS JOIN idcg CROSS JOIN nrel
    """,
    doc="Retrieval-quality evaluation of the BM25 ranker: NDCG@10 with "
    "binary relevance (docs containing ALL query terms), the ranking "
    "ordered by rounded score + doc_id so both engines agree on ties. "
    "DCG over the top-10, ideal DCG from the relevant count, all from "
    "the same single-pass BM25 state as bm25_search_lit — the "
    "evaluation half of the IR family (same pattern as "
    "minhash_eval_metrics for dedup).",
)
def bm25_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window  # noqa: PLC0415

    docs = load(spark, sf_dir, "documents")
    dl = docs.select("doc_id", n_tokens(F.col("text")).alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    qtok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    ).filter(F.col("term").isin(_BM25_TERMS))
    tf = qtok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    rel = tf.groupBy("doc_id").agg(
        F.when(F.countDistinct("term") == 3, 1).otherwise(0).alias("relevant")
    )
    idf = F.log(
        1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm = F.col("tf") + _BM25_K1 * (
        1 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl")
    )
    contrib = idf * F.col("tf") * (_BM25_K1 + 1) / norm
    scored = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(contrib), 6).alias("score"))
    )
    ranked = scored.join(rel, "doc_id").select(
        "relevant",
        F.row_number()
        .over(Window.orderBy(F.desc("score"), "doc_id"))
        .alias("rk"),
    )
    # ONE aggregate branch over ranked computes n_relevant, DCG@10 and
    # hits@10 together (three separate branches each re-executed the
    # whole scoring subplan = repeated corpus scans); IDCG is then a
    # pure sequence-fold EXPRESSION over n_relevant — no extra branch,
    # no range crossJoin.
    combined = ranked.agg(
        F.sum("relevant").alias("n_relevant"),
        F.sum(
            F.when(
                F.col("rk") <= 10, F.col("relevant") / F.log2(F.col("rk") + 1)
            ).otherwise(0.0)
        ).alias("dcg"),
        F.sum(
            F.when(F.col("rk") <= 10, F.col("relevant")).otherwise(0)
        ).alias("hits_at_10"),
    )
    idcg_expr = F.aggregate(
        F.sequence(F.lit(1), F.least(F.col("n_relevant"), F.lit(10)).cast("int")),
        F.lit(0.0),
        lambda acc, r: acc + 1.0 / F.log2(r.cast("double") + 1),
    )
    return combined.select(
        F.col("n_relevant").cast("long").alias("n_relevant"),
        F.col("hits_at_10").cast("long").alias("hits_at_10"),
        F.round("dcg", 6).alias("dcg_10"),
        F.round(idcg_expr, 6).alias("idcg_10"),
        F.round(F.col("dcg") / idcg_expr, 6).alias("ndcg_10"),
    )


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion of lexical (TF-IDF cosine) and semantic
# (embedding cosine) retrieval for query document 0
# ---------------------------------------------------------------------------

_RRF_K = 60
_RRF_POOL = 50

_COS_EMB_RRF = """
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
    "rrf_hybrid_search",
    f"""
    WITH tok AS (
      SELECT doc_id, t.token FROM documents,
             unnest(string_split(lower(text), ' ')) AS t(token)
      WHERE t.token <> ''
    ),
    tf AS (SELECT doc_id, token, count(*) AS c FROM tok GROUP BY 1, 2),
    idf AS (
      SELECT token,
             ln((SELECT count(*) FROM documents) * 1.0
                / count(DISTINCT doc_id)) AS idf
      FROM tok GROUP BY token
    ),
    vec AS (
      SELECT tf.doc_id, tf.token, tf.c * idf.idf AS w
      FROM tf JOIN idf USING (token)
    ),
    nrm AS (SELECT doc_id, sqrt(sum(w * w)) AS nrm FROM vec GROUP BY doc_id),
    q AS (SELECT token, w FROM vec WHERE doc_id = 0),
    dots AS (
      SELECT v.doc_id, sum(v.w * q.w) AS dot
      FROM vec v JOIN q USING (token) WHERE v.doc_id <> 0
      GROUP BY v.doc_id
    ),
    lex AS (
      SELECT d.doc_id,
             row_number() OVER (
               ORDER BY round(d.dot / (n.nrm
                 * (SELECT nrm FROM nrm WHERE doc_id = 0)), 6) DESC,
               d.doc_id
             ) AS r
      FROM dots d JOIN nrm n USING (doc_id)
    ),
    sem AS (
      SELECT a.vec_id AS doc_id,
             row_number() OVER (ORDER BY {_COS_EMB_RRF} DESC, a.vec_id) AS r
      FROM embeddings a,
           (SELECT embedding FROM embeddings WHERE vec_id = 0) b
      WHERE a.vec_id <> 0
    ),
    fused AS (
      SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
             l.r AS lex_rank, s.r AS sem_rank,
             coalesce(1.0 / ({_RRF_K} + l.r), 0)
               + coalesce(1.0 / ({_RRF_K} + s.r), 0) AS rrf
      FROM (SELECT * FROM lex WHERE r <= {_RRF_POOL}) l
      FULL OUTER JOIN (SELECT * FROM sem WHERE r <= {_RRF_POOL}) s
        ON l.doc_id = s.doc_id
    )
    SELECT doc_id, CAST(lex_rank AS BIGINT) AS lex_rank,
           CAST(sem_rank AS BIGINT) AS sem_rank,
           round(rrf, 6) AS rrf_score
    FROM fused
    ORDER BY round(rrf, 6) DESC, doc_id
    LIMIT 10
    """,
    doc="Reciprocal-rank fusion (k=60) of the two retrieval modalities "
    "for query document 0: lexical rank from TF-IDF cosine over the "
    "corpus vocabulary, semantic rank from embedding cosine, each "
    "pooled to top-50, fused by sum of 1/(60+rank) — the standard "
    "score-free hybrid-search combiner (ranks are integers, so fusion "
    "is engine-exact; both rankings order by the ROUNDED score with "
    "doc_id tie-break, pinning ranks across engines). Complements "
    "lexical_semantic_agreement, which measures whether fusion is "
    "worth doing; this query IS the fusion. Both rank chains are "
    "broadcast-query + one grouped aggregate; the fusion join is over "
    "two 50-row pools.",
)
def rrf_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.similarity import cosine

    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"),
    ).filter(F.col("token") != "")
    tok = tok.cache()
    n_docs = docs.count()
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("c"))
    idf = tok.groupBy("token").agg(
        F.log(F.lit(float(n_docs)) / F.countDistinct("doc_id")).alias("idf")
    )
    vec = tf.join(F.broadcast(idf), "token").select(
        "doc_id", "token", (F.col("c") * F.col("idf")).alias("w")
    )
    vec = vec.cache()
    nrm = vec.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    q = vec.where(F.col("doc_id") == 0).select(
        F.col("token"), F.col("w").alias("qw")
    )
    qnrm = float(nrm.where(F.col("doc_id") == 0).collect()[0]["nrm"])
    dots = (
        vec.where(F.col("doc_id") != 0)
        .join(F.broadcast(q), "token")
        .groupBy("doc_id")
        .agg(F.sum(F.col("w") * F.col("qw")).alias("dot"))
    )
    lex = dots.join(nrm, "doc_id").select(
        "doc_id",
        F.row_number()
        .over(
            Window.orderBy(
                F.desc(F.round(F.col("dot") / (F.col("nrm") * F.lit(qnrm)), 6)),
                F.asc("doc_id"),
            )
        )
        .alias("r"),
    )
    emb = load(spark, sf_dir, "embeddings")
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("__q")
    )
    sem = (
        emb.crossJoin(F.broadcast(qv))
        .filter(F.col("vec_id") != 0)
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(F.col("embedding"), F.col("__q")), 6).alias("cos"),
        )
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("cos"), F.asc("doc_id")))
            .alias("r"),
        )
    )
    lexp = lex.filter(F.col("r") <= _RRF_POOL).select(
        F.col("doc_id").alias("ldoc"), F.col("r").alias("lex_rank")
    )
    semp = sem.filter(F.col("r") <= _RRF_POOL).select(
        F.col("doc_id").alias("sdoc"), F.col("r").alias("sem_rank")
    )
    fused = lexp.join(
        semp, lexp.ldoc == semp.sdoc, "full_outer"
    ).select(
        F.coalesce("ldoc", "sdoc").alias("doc_id"),
        F.col("lex_rank").cast("bigint").alias("lex_rank"),
        F.col("sem_rank").cast("bigint").alias("sem_rank"),
        (
            F.coalesce(F.lit(1.0) / (_RRF_K + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (_RRF_K + F.col("sem_rank")), F.lit(0.0))
        ).alias("rrf"),
    )
    return (
        fused.orderBy(F.desc(F.round("rrf", 6)), F.asc("doc_id"))
        .limit(10)
        .select(
            "doc_id",
            "lex_rank",
            "sem_rank",
            F.round("rrf", 6).alias("rrf_score"),
        )
    )


_QL_MU = 100.0  # Dirichlet prior mass (docs here average ~50 tokens)


@register(
    "dirichlet_ql_search_lit",
    f"""
    WITH dl AS (
      SELECT doc_id,
             (length(text) - length(replace(text, ' ', '')) + 1) AS dl
      FROM documents),
    tot AS (SELECT sum(dl) AS ctot FROM dl),
    tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term
      FROM documents),
    qtok AS (SELECT * FROM tok WHERE term IN {_TERMS_SQL}),
    cf AS (SELECT term, count(*) AS cf FROM qtok GROUP BY term),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM qtok
           GROUP BY doc_id, term),
    grid AS (SELECT dl.doc_id, dl.dl, cf.term, cf.cf FROM dl CROSS JOIN cf),
    scored AS (
      SELECT g.doc_id,
             sum(ln((coalesce(tf.tf, 0) + {_QL_MU} * g.cf / t.ctot)
                    / (g.dl + {_QL_MU}))) AS score,
             CAST(sum(CASE WHEN tf.tf IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_terms_hit
      FROM grid g
      LEFT JOIN tf ON tf.doc_id = g.doc_id AND tf.term = g.term
      CROSS JOIN tot t
      GROUP BY g.doc_id)
    SELECT doc_id, n_terms_hit, round(score, 6) AS score
    FROM scored
    ORDER BY round(score, 6) DESC, doc_id
    LIMIT 10
    """,
    doc="Dirichlet-smoothed query-likelihood top-10 (Zhai & Lafferty "
    "2001), the language-model retrieval twin of bm25_search_lit for "
    "the same literal 3-term query: score = sum over query terms of "
    "log((tf + mu*P(t|C)) / (dl + mu)), mu=100 — unlike BM25, absent "
    "terms still contribute their collection-probability mass, so the "
    "score grid is |docs| x |Q| (built by cross-joining the "
    "broadcast 3-row collection-frequency table; tf left-joins in). "
    "Token stream is filtered to the query terms BEFORE any shuffle; "
    "top-k via TakeOrderedAndProject.",
)
def dirichlet_ql_search_lit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    dl = docs.select("doc_id", n_tokens(F.col("text")).alias("dl"))
    tot = dl.agg(F.sum("dl").alias("ctot"))
    qtok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("term")
    ).filter(F.col("term").isin(_BM25_TERMS))
    cf = qtok.groupBy("term").agg(F.count(F.lit(1)).alias("cf"))
    tf = qtok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    grid = dl.crossJoin(F.broadcast(cf))
    scored = (
        grid.join(tf, ["doc_id", "term"], "left")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.log(
                    (F.coalesce(F.col("tf"), F.lit(0))
                     + _QL_MU * F.col("cf") / F.col("ctot"))
                    / (F.col("dl") + _QL_MU)
                )
            ).alias("score"),
            F.sum(F.col("tf").isNotNull().cast("int"))
            .cast("bigint")
            .alias("n_terms_hit"),
        )
    )
    return (
        scored.select("doc_id", "n_terms_hit", F.round("score", 6).alias("score"))
        .orderBy(F.desc(F.round(F.col("score"), 6)), F.asc("doc_id"))
        .limit(10)
    )


_RM3_EXPANSION_K = 8


_RM3_ORACLE = f"""
    WITH top10 AS (
      SELECT doc_id, score FROM ({REGISTRY["bm25_search_lit"].oracle})
    ),
    wd AS (
      SELECT doc_id, score / sum(score) OVER () AS w FROM top10
    ),
    tok AS (
      SELECT d.doc_id, wd.w, unnest(string_split(d.text, ' ')) AS term
      FROM documents d JOIN wd USING (doc_id)
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
    tf AS (SELECT doc_id, term, w, count(*) AS tf
           FROM tok GROUP BY doc_id, term, w),
    ptr AS (
      SELECT term,
             sum(tf.w * tf.tf / dl.dl) AS p_rel,
             CAST(count(DISTINCT tf.doc_id) AS BIGINT) AS n_fb_docs
      FROM tf JOIN dl USING (doc_id)
      WHERE term NOT IN {_TERMS_SQL}
      GROUP BY term
    )
    SELECT term, n_fb_docs, round(p_rel, 6) AS p_rel
    FROM ptr
    ORDER BY round(p_rel, 6) DESC, term
    LIMIT {_RM3_EXPANSION_K}
"""


@register(
    "rm3_expansion_terms_lit",
    _RM3_ORACLE,
    doc="RM3 pseudo-relevance-feedback expansion terms (Lavrenko & "
    "Croft 2001 relevance model, Abdul-Jaleel et al. 2004 RM3): the "
    "BM25 top-10 for the literal query becomes a pseudo-relevant set; "
    "each document contributes its maximum-likelihood term "
    "distribution P(t|d) = tf/dl weighted by its normalized BM25 "
    "score; the top expansion terms by P(t|R), original query terms "
    "excluded, feed the second-pass query. Composes the certified "
    "bm25_search_lit decision (its oracle body is a CTE here — the "
    "minhash_eval_metrics composition pattern). Scale: the feedback "
    "set is 10 rows broadcast against one token scan; the term "
    "distribution is |terms-in-10-docs|-bounded.",
)
def rm3_expansion_terms_lit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    top10 = bm25_search_lit(spark, sf_dir).select(
        "doc_id", F.col("score").alias("bscore")
    )
    wall = Window.partitionBy()
    wd = top10.select(
        "doc_id", (F.col("bscore") / F.sum("bscore").over(wall)).alias("w")
    )
    tok = docs.join(F.broadcast(wd), "doc_id").select(
        "doc_id", "w", F.explode(tokens(F.col("text"))).alias("term")
    )
    dl = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    ptr = (
        tok.groupBy("doc_id", "term", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
        .join(F.broadcast(dl), "doc_id")
        .groupBy("term")
        .agg(
            F.sum(F.col("w") * F.col("tf") / F.col("dl")).alias("p_rel"),
            F.countDistinct("doc_id").cast("bigint").alias("n_fb_docs"),
        )
        .where(~F.col("term").isin(_BM25_TERMS))
    )
    return (
        ptr.select(
            "term", "n_fb_docs", F.round("p_rel", 6).alias("p_rel")
        )
        .orderBy(F.desc(F.round(F.col("p_rel"), 6)), F.asc("term"))
        .limit(_RM3_EXPANSION_K)
    )


