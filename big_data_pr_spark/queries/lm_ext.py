"""Kneser-Ney smoothed bigram language model.

Reference capability this generalizes: the reference has no LM at all;
this engine's LM stack (add-0.5 `bigram_lm_top` / `perplexity_scores`,
`bpe_*` tokenizer training) gains the smoothing that production
n-gram LMs (KenLM, the CCNet reference filter) actually use —
absolute discounting with continuation-probability backoff (Kneser &
Ney 1995, interpolated form).

All inputs to the float expression are EXACT integers (bigram counts,
left/right continuation type counts, distinct-bigram total), computed
by grouped aggregates; both engines evaluate the identical closed-form
expression on those integers, so the value hash agrees without any
recursion. Scale: three vocabulary-bounded aggregates over one
exploded token stream + one join keyed by the leading token —
LM training at engine scale IS counting (same posture as
bigram_lm_top); the discount arithmetic is a narrow map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import text
from ..tables import load
from .registry import register

_KN_D = 0.75  # absolute discount


@register(
    "kneser_ney_bigram_top",
    f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    bg AS (
      SELECT unnest(list_transform(range(1, greatest(len(t) - 1, 0) + 1),
                                   i -> [t[i], t[i+1]])) AS pair
      FROM toks
    ),
    c2 AS (
      SELECT pair[1] AS w1, pair[2] AS w2, count(*) AS c2
      FROM bg GROUP BY 1, 2
    ),
    c1 AS (SELECT w1, sum(c2) AS c1, count(*) AS n_follow FROM c2 GROUP BY w1),
    cont AS (SELECT w2, count(*) AS n_prec FROM c2 GROUP BY w2),
    nbg AS (SELECT count(*) AS n_bigram_types FROM c2)
    SELECT c2.w1 || ' ' || c2.w2 AS bigram, CAST(c2.c2 AS BIGINT) AS n,
           round(ln(
             (c2.c2 - {_KN_D}) / c1.c1
             + ({_KN_D} * c1.n_follow / c1.c1)
               * (cont.n_prec * 1.0 / nbg.n_bigram_types)
           ), 6) AS logp_kn
    FROM c2
    JOIN c1 USING (w1)
    JOIN cont ON cont.w2 = c2.w2
    CROSS JOIN nbg
    ORDER BY n DESC, bigram LIMIT 50
    """,
    doc="Interpolated Kneser-Ney bigram LM (d=0.75), top-50 bigrams by "
    "count: P(w2|w1) = max(c(w1,w2)-d,0)/c(w1) + lambda(w1) * "
    "Pcont(w2), with lambda = d*|follow-set|/c(w1) and the "
    "continuation probability Pcont(w2) = |preceding-type set| / "
    "|bigram types| — the discounting/backoff that KenLM-class "
    "production LMs use, upgrading add-0.5 bigram_lm_top. (max(.,0) "
    "is vacuous on the emitted rows: every surfaced bigram has "
    "c2 >= 1 > d.) All counts exact integers; identical closed form "
    "on both engines.",
)
def kneser_ney_bigram_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    toks = docs.select(text.tokens(F.col("text")).alias("t"))
    bg = toks.select(
        F.explode(
            F.when(
                F.size("t") >= 2,
                F.expr("transform(sequence(1, size(t) - 1), i -> struct(t[i-1] AS w1, t[i] AS w2))"),
            ).otherwise(F.expr("CAST(array() AS array<struct<w1:string,w2:string>>)"))
        ).alias("p")
    ).select("p.w1", "p.w2")
    c2 = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    c1 = c2.groupBy("w1").agg(
        F.sum("c2").alias("c1"), F.count("*").alias("n_follow")
    )
    cont = c2.groupBy("w2").agg(F.count("*").alias("n_prec"))
    nbg = c2.agg(F.count("*").alias("n_bigram_types"))
    return (
        c2.join(c1, "w1")
        .join(cont, "w2")
        .crossJoin(F.broadcast(nbg))
        .select(
            F.concat_ws(" ", "w1", "w2").alias("bigram"),
            F.col("c2").cast("bigint").alias("n"),
            F.round(
                F.log(
                    (F.col("c2") - _KN_D) / F.col("c1")
                    + (_KN_D * F.col("n_follow") / F.col("c1"))
                    * (F.col("n_prec") * F.lit(1.0) / F.col("n_bigram_types"))
                ),
                6,
            ).alias("logp_kn"),
        )
        .orderBy(F.desc("n"), "bigram")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Round-6m: per-source distribution distances (mixture diagnostics)
# ---------------------------------------------------------------------------

_JS_V = 100  # vocabulary: top-100 global tokens
_JS_A = 0.5  # add-alpha smoothing
_BD_V = 30  # Burrows' Delta marker-word count


@register(
    "js_divergence_sources",
    f"""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    vocab AS (
      SELECT w FROM (SELECT w, count(*) AS c FROM tok GROUP BY w)
      ORDER BY c DESC, w LIMIT {_JS_V}
    ),
    sc AS (
      SELECT tok.source, tok.w, count(*) AS c
      FROM tok JOIN vocab USING (w) GROUP BY tok.source, tok.w
    ),
    stot AS (SELECT source, sum(c) AS n FROM sc GROUP BY source),
    grid AS (
      SELECT s.source, v.w, coalesce(sc.c, 0) AS c, s.n
      FROM stot s CROSS JOIN vocab v
      LEFT JOIN sc ON sc.source = s.source AND sc.w = v.w
    ),
    p AS (
      SELECT source, w, (c + {_JS_A}) / (n + {_JS_A} * {_JS_V}) AS p
      FROM grid
    ),
    pairs AS (
      SELECT a.source AS src_a, b.source AS src_b,
             0.5 * sum(a.p * ln(a.p / ((a.p + b.p) / 2)))
             + 0.5 * sum(b.p * ln(b.p / ((a.p + b.p) / 2))) AS jsd
      FROM p a JOIN p b ON a.w = b.w AND a.source < b.source
      GROUP BY a.source, b.source
    )
    SELECT src_a, src_b, round(jsd, 6) AS jsd
    FROM pairs ORDER BY src_a, src_b
    """,
    doc="Jensen-Shannon divergence between every source pair's "
    f"smoothed top-{_JS_V}-token unigram distributions — the "
    "symmetric, bounded [0, ln 2] mixture diagnostic answering 'which "
    "scrapes say the same things' before weights are assigned "
    "(complements dsir_bucket_kl, which compares ONE target against "
    "the pool in hash space; JSD here is pairwise in token space). "
    "Scale: one vocabulary-capped token count, a |sources| x "
    f"{_JS_V} smoothed grid, and a pair join keyed on the token — "
    "work bounded by |sources|^2 x vocab, independent of corpus size "
    "after the first aggregate.",
)
def js_divergence_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(text.tokens(F.col("text"))).alias("w")
    )
    vocab = (
        tok.groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(_JS_V)
        .select("w")
    )
    sc = (
        tok.join(F.broadcast(vocab), "w")
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
    )
    stot = sc.groupBy("source").agg(F.sum("c").alias("n"))
    grid = (
        stot.crossJoin(F.broadcast(vocab))
        .join(sc, ["source", "w"], "left")
        .select(
            "source",
            "w",
            ((F.coalesce(F.col("c"), F.lit(0)) + _JS_A) / (F.col("n") + _JS_A * _JS_V)).alias("p"),
        )
    )
    a = grid.select(
        F.col("source").alias("src_a"), F.col("w").alias("w"), F.col("p").alias("pa")
    )
    b = grid.select(
        F.col("source").alias("src_b"), F.col("w").alias("w"), F.col("p").alias("pb")
    )
    m = (F.col("pa") + F.col("pb")) / 2
    return (
        a.join(b, "w")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(
            F.round(
                0.5 * F.sum(F.col("pa") * F.log(F.col("pa") / m))
                + 0.5 * F.sum(F.col("pb") * F.log(F.col("pb") / m)),
                6,
            ).alias("jsd")
        )
        .orderBy("src_a", "src_b")
    )


@register(
    "burrows_delta_sources",
    f"""
    WITH tok AS (
      SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
    ),
    vocab AS (
      SELECT w FROM (SELECT w, count(*) AS c FROM tok GROUP BY w)
      ORDER BY c DESC, w LIMIT {_BD_V}
    ),
    stot AS (SELECT source, count(*) AS n FROM tok GROUP BY source),
    sc AS (
      SELECT tok.source, tok.w, count(*) AS c
      FROM tok JOIN vocab USING (w) GROUP BY tok.source, tok.w
    ),
    freq AS (
      SELECT s.source, v.w, coalesce(sc.c, 0) * 1.0 / s.n AS f
      FROM stot s CROSS JOIN vocab v
      LEFT JOIN sc ON sc.source = s.source AND sc.w = v.w
    ),
    z AS (
      SELECT source, w,
             (f - avg(f) OVER (PARTITION BY w))
               / sqrt(avg(f * f) OVER (PARTITION BY w)
                      - avg(f) OVER (PARTITION BY w) * avg(f) OVER (PARTITION BY w))
               AS z
      FROM freq
    )
    SELECT a.source AS src_a, b.source AS src_b,
           round(avg(abs(a.z - b.z)), 6) AS delta
    FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
    GROUP BY a.source, b.source
    ORDER BY delta, src_a, src_b LIMIT 50
    """,
    doc="Burrows' Delta (the stylometry/authorship standard): relative "
    f"frequencies of the top-{_BD_V} corpus words, z-scored per word "
    "across sources (population sd), pairwise mean |z-gap| — the 50 "
    "most stylistically-similar source pairs, i.e. scrapes that look "
    "like the same underlying generator/pipeline even when content "
    "differs (JSD sees topic; Delta sees FUNCTION-WORD style). Same "
    "vocabulary-capped shape as js_divergence_sources: nothing after "
    "the first token count scales with the corpus.",
)
def burrows_delta_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(text.tokens(F.col("text"))).alias("w")
    )
    vocab = (
        tok.groupBy("w")
        .agg(F.count("*").alias("c"))
        .orderBy(F.desc("c"), "w")
        .limit(_BD_V)
        .select("w")
    )
    stot = tok.groupBy("source").agg(F.count("*").alias("n"))
    sc = (
        tok.join(F.broadcast(vocab), "w")
        .groupBy("source", "w")
        .agg(F.count("*").alias("c"))
    )
    freq = (
        stot.crossJoin(F.broadcast(vocab))
        .join(sc, ["source", "w"], "left")
        .select(
            "source",
            "w",
            (F.coalesce(F.col("c"), F.lit(0)) * 1.0 / F.col("n")).alias("f"),
        )
    )
    wv = Window.partitionBy("w")
    z = freq.select(
        "source",
        "w",
        (
            (F.col("f") - F.avg("f").over(wv))
            / F.sqrt(
                F.avg(F.col("f") * F.col("f")).over(wv)
                - F.avg("f").over(wv) * F.avg("f").over(wv)
            )
        ).alias("z"),
    )
    a = z.select(F.col("source").alias("src_a"), "w", F.col("z").alias("za"))
    b = z.select(F.col("source").alias("src_b"), "w", F.col("z").alias("zb"))
    return (
        a.join(b, "w")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.round(F.avg(F.abs(F.col("za") - F.col("zb"))), 6).alias("delta"))
        .orderBy("delta", "src_a", "src_b")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Round-6m: unigram-LM (SentencePiece-style) tokenizer — one Viterbi
# E-step over a frequency-initialized candidate vocabulary
# ---------------------------------------------------------------------------

_UL_MAXP = 3  # max piece length (chars)
_UL_TOP = 60  # candidate vocabulary budget beyond single chars
_NEG = -1e18


def _unigram_lm_oracle() -> str:
    return f"""
    WITH RECURSIVE tok AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    words AS MATERIALIZED (
      SELECT w, CAST(count(*) AS BIGINT) AS c, len(w) AS l FROM tok GROUP BY w
    ),
    subs AS MATERIALIZED (
      SELECT substr(words.w, s.s, q.q) AS piece, sum(words.c) AS freq
      FROM words
      CROSS JOIN (SELECT unnest(range(1, 64)) AS s) s
      CROSS JOIN (SELECT unnest(range(1, {_UL_MAXP} + 1)) AS q) q
      WHERE s.s + q.q - 1 <= words.l
      GROUP BY 1
    ),
    vocab AS MATERIALIZED (
      SELECT DISTINCT piece FROM (
        (SELECT piece FROM subs ORDER BY freq DESC, piece LIMIT {_UL_TOP})
        UNION ALL
        SELECT piece FROM subs WHERE len(piece) = 1
      )
    ),
    sc AS MATERIALIZED (
      SELECT subs.piece,
             ln(subs.freq * 1.0 /
                (SELECT sum(s2.freq) FROM subs s2 JOIN vocab v2 USING (piece)))
               AS s
      FROM subs JOIN vocab USING (piece)
    ),
    maxl AS (SELECT max(l) AS m FROM words),
    it AS (
      SELECT w, l, 0 AS t,
             CAST(0.0 AS DOUBLE) AS dp0, CAST(NULL AS DOUBLE) AS dp1,
             CAST(NULL AS DOUBLE) AS dp2,
             CAST([] AS VARCHAR[]) AS seg, CAST(NULL AS VARCHAR[]) AS seg1,
             CAST(NULL AS VARCHAR[]) AS seg2
      FROM words
      UNION ALL
      SELECT w, l, t + 1,
             CASE WHEN t >= l THEN dp0
                  WHEN v3 >= v2 AND v3 >= v1 THEN v3
                  WHEN v2 >= v1 THEN v2 ELSE v1 END,
             CASE WHEN t >= l THEN dp1 ELSE dp0 END,
             CASE WHEN t >= l THEN dp2 ELSE dp1 END,
             CASE WHEN t >= l THEN seg
                  WHEN v3 >= v2 AND v3 >= v1 THEN list_append(seg2, p3)
                  WHEN v2 >= v1 THEN list_append(seg1, p2)
                  ELSE list_append(seg, p1) END,
             CASE WHEN t >= l THEN seg1 ELSE seg END,
             CASE WHEN t >= l THEN seg2 ELSE seg1 END
      FROM (
        SELECT it.*,
               substr(it.w, it.t + 1, 1) AS p1,
               substr(it.w, it.t, 2) AS p2,
               substr(it.w, it.t - 1, 3) AS p3,
               coalesce(it.dp0 + s1.s, {_NEG}) AS v1,
               CASE WHEN it.t >= 1
                    THEN coalesce(it.dp1 + s2.s, {_NEG}) ELSE {_NEG} END AS v2,
               CASE WHEN it.t >= 2
                    THEN coalesce(it.dp2 + s3.s, {_NEG}) ELSE {_NEG} END AS v3
        FROM it
        LEFT JOIN sc s1 ON s1.piece = substr(it.w, it.t + 1, 1)
        LEFT JOIN sc s2 ON s2.piece = substr(it.w, it.t, 2)
        LEFT JOIN sc s3 ON s3.piece = substr(it.w, it.t - 1, 3)
        WHERE it.t < (SELECT m FROM maxl)
      )
    ),
    fin AS (
      SELECT it.w, it.seg FROM it CROSS JOIN maxl WHERE it.t = maxl.m
    ),
    use AS (
      SELECT u.piece, sum(words.c) AS usage
      FROM fin JOIN words USING (w), unnest(fin.seg) AS u(piece)
      GROUP BY u.piece
    )
    SELECT piece, CAST(usage AS BIGINT) AS usage,
           round(usage * 1.0 / (SELECT sum(usage) FROM use), 6) AS prob
    FROM use ORDER BY usage DESC, piece LIMIT 50
    """


@register(
    "unigram_lm_viterbi",
    _unigram_lm_oracle(),
    doc="Unigram-LM tokenizer (the SentencePiece/Kudo 2018 model): "
    f"candidate vocabulary = top-{_UL_TOP} substrings (length <= "
    f"{_UL_MAXP}) by corpus frequency plus all single characters; "
    "piece scores = log relative frequency; every distinct word is "
    "segmented by VITERBI dynamic programming (ties break to the "
    "LONGEST piece — pinned identically on both engines), and the "
    "M-step usage counts + renormalized piece probabilities come back "
    "corpus-weighted — one full EM iteration's E-step, the "
    "complementary tokenizer-training algorithm to bpe_merge_rules "
    "(BPE grows greedily bottom-up; unigram prunes top-down via "
    "exactly this segmentation). Scale: the DP state is the "
    "DISTINCT-WORD table (same posture as BPE: corpus scanned once "
    "into (word, count) state); Viterbi is per-word-parallel via "
    "mapInPandas with the <=124-piece score table broadcast, and the "
    "oracle replays the identical DP as a recursive CTE carrying a "
    "3-deep dp/segmentation window.",
)
def unigram_lm_viterbi(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    docs = load(spark, sf_dir, "documents")
    tok = docs.select(F.explode(text.tokens(F.col("text"))).alias("w"))
    words = tok.groupBy("w").agg(F.count("*").cast("bigint").alias("c"))
    subs = (
        words.select(
            "c",
            F.explode(
                F.expr(
                    f"""flatten(transform(sequence(1, length(w)), s ->
                        transform(sequence(1, least({_UL_MAXP},
                                                    length(w) - s + 1)),
                                  q -> substring(w, s, q))))"""
                )
            ).alias("piece"),
        )
        .groupBy("piece")
        .agg(F.sum("c").alias("freq"))
    )
    top = subs.orderBy(F.desc("freq"), "piece").limit(_UL_TOP).select("piece")
    chars = subs.where(F.length("piece") == 1).select("piece")
    vocab = top.union(chars).distinct()
    scored = subs.join(vocab, "piece")
    tot = scored.agg(F.sum("freq").alias("t"))
    sc = (
        scored.crossJoin(F.broadcast(tot))
        .select("piece", F.log(F.col("freq") * 1.0 / F.col("t")).alias("s"))
    )
    scores = {r["piece"]: float(r["s"]) for r in sc.collect()}  # <=124 rows

    def seg_batch(it):
        for pdf in it:
            out = []
            for w in pdf["w"]:
                L = len(w)
                dp = [0.0] + [None] * L
                back: list[tuple[int, str]] = [(0, "")] * (L + 1)
                for j in range(1, L + 1):
                    best_v, best = None, None
                    # scan l descending: ties keep the LONGEST piece
                    for l in range(min(_UL_MAXP, j), 0, -1):
                        piece = w[j - l : j]
                        s = scores.get(piece)
                        if s is None or dp[j - l] is None:
                            continue
                        v = dp[j - l] + s
                        if best_v is None or v > best_v:
                            best_v, best = v, (j - l, piece)
                    dp[j] = best_v
                    back[j] = best
                pieces = []
                j = L
                while j > 0:
                    i, piece = back[j]
                    pieces.append(piece)
                    j = i
                pieces.reverse()
                for p in pieces:
                    out.append((w, p))
            yield pd.DataFrame(out, columns=["w", "piece"])

    segs = words.select("w").mapInPandas(seg_batch, "w string, piece string")
    use = (
        segs.join(words, "w")
        .groupBy("piece")
        .agg(F.sum("c").alias("usage"))
    )
    tot_u = use.agg(F.sum("usage").alias("tu"))
    return (
        use.crossJoin(F.broadcast(tot_u))
        .select(
            "piece",
            F.col("usage").cast("bigint").alias("usage"),
            F.round(F.col("usage") * 1.0 / F.col("tu"), 6).alias("prob"),
        )
        .orderBy(F.desc("usage"), "piece")
        .limit(50)
    )
