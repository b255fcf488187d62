"""Pretraining data-selection family: DSIR hashed importance
resampling and CCNet-style per-language perplexity bucketing.

Reference scope: the reference (`Big_Data_Pr`) stops at ingest +
serving; a training-data engine must also DECIDE which documents to
train on. Two published selection recipes, re-expressed Spark-first:

- DSIR (Xie et al. 2023, "Data Selection for Language Models via
  Importance Resampling"): hash every token into B buckets, estimate
  target vs raw bucket distributions, and weight each document by the
  summed log-likelihood ratio of its tokens. At 100 TB this is the
  canonical shape: two vocabulary-FREE aggregates (the feature space is
  the fixed 256-bucket hash range, not the vocabulary), one broadcast
  join of a 256-row weight table against the exploded corpus, one
  per-doc sum. No model, no driver loop, nothing scales with corpus
  size except embarrassingly-parallel token maps.
- CCNet (Wenzek et al. 2020): score every document by LM perplexity
  and keep per-language quantile buckets (head/middle/tail). The
  bucket assignment here is ntile(3) over a per-language total order —
  purely ordinal, so both engines agree bit-for-bit without comparing
  interpolated quantile thresholds.

Cross-engine determinism: the hash bucket is the first two hex chars
of md5(token) — the same engine-neutral md5 trick split_by_hash /
jl_projection_distortion use — so Spark and DuckDB build identical
256-bucket histograms; all float outputs are rounded and every rank is
tie-broken by doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import dedup, text
from ..tables import load
from .docs_queries import _BG_SQL
from .registry import register

_B = 256  # hashed feature space size (two hex chars)
_ALPHA = 0.5  # add-alpha smoothing on bucket counts
_TARGET_LANG = "en"  # DSIR target distribution: the English slice
_KEEP_FRAC = 0.25  # resampling budget: top quarter by log-ratio

# Shared CTE: token -> 256-way hash bucket, target vs raw smoothed
# bucket log-probs. Raw = the whole corpus; target = lang='en'.
_DSIR_SQL = f"""
    tok0 AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS wtok
      FROM documents
    ),
    tok AS (SELECT doc_id, lang, substr(md5(wtok), 1, 2) AS b FROM tok0),
    dom AS (
      SELECT lower(lpad(to_hex(i), 2, '0')) AS b
      FROM (SELECT unnest(range(0, {_B})) AS i)
    ),
    q AS (SELECT b, count(*) AS qc FROM tok GROUP BY b),
    p AS (SELECT b, count(*) AS pc FROM tok WHERE lang = '{_TARGET_LANG}' GROUP BY b),
    tot AS (
      SELECT (SELECT coalesce(sum(qc), 0) FROM q) AS qt,
             (SELECT coalesce(sum(pc), 0) FROM p) AS pt
    ),
    w AS (
      SELECT dom.b, coalesce(q.qc, 0) AS qc, coalesce(p.pc, 0) AS pc,
             ln((coalesce(p.pc, 0) + {_ALPHA}) / (tot.pt + {_ALPHA} * {_B}))
             - ln((coalesce(q.qc, 0) + {_ALPHA}) / (tot.qt + {_ALPHA} * {_B})) AS logw
      FROM dom LEFT JOIN q USING (b) LEFT JOIN p USING (b) CROSS JOIN tot
    )
"""


def _dsir_tables(spark: SparkSession, docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(exploded token buckets, full 256-row smoothed weight table).

    The weight table carries raw counts (qc, pc), totals (qt, pt) and
    the per-bucket log-likelihood ratio logw over the COMPLETE hash
    domain — smoothed masses then sum to exactly 1 per side, which is
    what makes the KL diagnostic a real (nonnegative) divergence.
    """
    tok = docs.select(
        "doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("wtok")
    ).select("doc_id", "lang", F.substring(F.md5("wtok"), 1, 2).alias("b"))
    dom = spark.range(_B).select(
        F.lower(F.lpad(F.hex(F.col("id")), 2, "0")).alias("b")
    )
    q = tok.groupBy("b").agg(F.count("*").alias("qc"))
    p = (
        tok.where(F.col("lang") == _TARGET_LANG)
        .groupBy("b")
        .agg(F.count("*").alias("pc"))
    )
    tot = q.agg(F.coalesce(F.sum("qc"), F.lit(0)).alias("qt")).crossJoin(
        p.agg(F.coalesce(F.sum("pc"), F.lit(0)).alias("pt"))
    )
    w = (
        dom.join(q, "b", "left")
        .join(p, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.coalesce(F.col("qc"), F.lit(0)).alias("qc"),
            F.coalesce(F.col("pc"), F.lit(0)).alias("pc"),
            "qt",
            "pt",
            (
                F.log(
                    (F.coalesce(F.col("pc"), F.lit(0)) + _ALPHA)
                    / (F.col("pt") + _ALPHA * _B)
                )
                - F.log(
                    (F.coalesce(F.col("qc"), F.lit(0)) + _ALPHA)
                    / (F.col("qt") + _ALPHA * _B)
                )
            ).alias("logw"),
        )
    )
    return tok, w


@register(
    "dsir_importance_weights",
    f"""
    WITH {_DSIR_SQL},
    per_doc AS (
      SELECT tok.doc_id, max(tok.lang) AS lang,
             CAST(count(*) AS BIGINT) AS n_tok,
             round(sum(w.logw), 6) AS logratio
      FROM tok JOIN w ON w.b = tok.b
      GROUP BY tok.doc_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (ORDER BY logratio DESC, doc_id) AS rn,
             count(*) OVER () AS n_docs
      FROM per_doc
    )
    SELECT doc_id, lang, n_tok, logratio,
           CAST(rn <= ceil({_KEEP_FRAC} * n_docs) AS INTEGER) AS selected
    FROM ranked ORDER BY doc_id
    """,
    doc="DSIR data selection (Xie et al. 2023): every token hashes "
    "into a fixed 256-bucket feature space (first two hex chars of "
    "md5 — engine-neutral); the document's importance weight is the "
    "summed log-ratio of smoothed target (lang='en') vs raw bucket "
    "probabilities, and the top 25% by weight are flagged selected. "
    "Scale: the feature space is CONSTANT (256 rows) regardless of "
    "corpus or vocabulary size, so the plan is two partial-agg "
    "shuffles over exploded tokens, a broadcast join of the 256-row "
    "weight table, and one per-doc sum — no model state, no driver "
    "loop, and the rank is a single |docs|-sized window with doc_id "
    "tie-break.",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok, w = _dsir_tables(spark, docs)
    per_doc = (
        tok.join(F.broadcast(w.select("b", "logw")), "b")
        .groupBy("doc_id")
        .agg(
            F.max("lang").alias("lang"),
            F.count("*").cast("bigint").alias("n_tok"),
            F.round(F.sum("logw"), 6).alias("logratio"),
        )
    )
    ranked = per_doc.select(
        "*",
        F.row_number()
        .over(Window.orderBy(F.desc("logratio"), "doc_id"))
        .alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n_docs"),
    )
    return ranked.select(
        "doc_id",
        "lang",
        "n_tok",
        "logratio",
        (F.col("rn") <= F.ceil(_KEEP_FRAC * F.col("n_docs")))
        .cast("int")
        .alias("selected"),
    ).orderBy("doc_id")


@register(
    "dsir_bucket_kl",
    f"""
    WITH {_DSIR_SQL},
    d AS (
      SELECT w.b,
             (w.pc + {_ALPHA}) / (tot.pt + {_ALPHA} * {_B}) AS ph,
             (w.qc + {_ALPHA}) / (tot.qt + {_ALPHA} * {_B}) AS qh
      FROM w CROSS JOIN tot
    )
    SELECT CAST(count(*) AS BIGINT) AS n_buckets,
           CAST((SELECT tot.pt FROM tot) AS BIGINT) AS target_tokens,
           CAST((SELECT tot.qt FROM tot) AS BIGINT) AS raw_tokens,
           round(sum(ph * ln(ph / qh)), 6) AS kl_target_raw,
           round(sum(qh * ln(qh / ph)), 6) AS kl_raw_target
    FROM d
    """,
    doc="DSIR selection diagnostic: symmetric KL divergences between "
    "the smoothed target (lang='en') and raw hashed-unigram bucket "
    "distributions — how far importance resampling has to bend the "
    "corpus (near 0 = target is distributionally indistinct; large = "
    "aggressive reweighting, check selected-set size). Aggregate over "
    "the CONSTANT 256-bucket table, so cost beyond the shared token "
    "histogram is nil.",
)
def dsir_bucket_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    _, w = _dsir_tables(spark, docs)
    d = w.select(
        "qt",
        "pt",
        ((F.col("pc") + _ALPHA) / (F.col("pt") + _ALPHA * _B)).alias("ph"),
        ((F.col("qc") + _ALPHA) / (F.col("qt") + _ALPHA * _B)).alias("qh"),
    )
    return d.agg(
        F.count("*").cast("bigint").alias("n_buckets"),
        F.max("pt").cast("bigint").alias("target_tokens"),
        F.max("qt").cast("bigint").alias("raw_tokens"),
        F.round(F.sum(F.col("ph") * F.log(F.col("ph") / F.col("qh"))), 6).alias(
            "kl_target_raw"
        ),
        F.round(F.sum(F.col("qh") * F.log(F.col("qh") / F.col("ph"))), 6).alias(
            "kl_raw_target"
        ),
    )


@register(
    "ccnet_perplexity_buckets",
    f"""
    WITH {_BG_SQL},
    nll AS (
      SELECT doc_id, round(-avg(logp), 6) AS nll
      FROM bg JOIN lm USING (bigram)
      GROUP BY doc_id
    ),
    lab AS (
      SELECT d.doc_id, d.lang, nll.nll,
             ntile(3) OVER (PARTITION BY d.lang ORDER BY nll.nll, d.doc_id) AS t
      FROM nll JOIN documents d USING (doc_id)
    )
    SELECT doc_id, lang, nll,
           CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
    FROM lab ORDER BY doc_id
    """,
    doc="CCNet-style quality bucketing (Wenzek et al. 2020): every "
    "document's corpus-bigram-LM negative log-likelihood, cut into "
    "per-LANGUAGE head/middle/tail terciles — the standard pretraining "
    "curation signal (train on head+middle, sample tail). Tercile "
    "assignment is ntile(3) over (rounded nll, doc_id), an ordinal "
    "rank — no interpolated quantile thresholds to disagree on across "
    "engines. Plan: the perplexity_scores explode+join pipeline plus "
    "one per-language |docs|-sized window.",
)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    lm, _ = text.bigram_lm(docs)
    nll = text.perplexity_score(docs, lm).select(
        "doc_id", F.round("nll", 6).alias("nll")
    )
    lab = nll.join(docs.select("doc_id", "lang"), "doc_id").select(
        "doc_id",
        "lang",
        "nll",
        F.ntile(3).over(Window.partitionBy("lang").orderBy("nll", "doc_id")).alias("t"),
    )
    return lab.select(
        "doc_id",
        "lang",
        "nll",
        F.when(F.col("t") == 1, "head")
        .when(F.col("t") == 2, "middle")
        .otherwise("tail")
        .alias("bucket"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Round-6g: Gopher rule flags, first-occurrence novelty, temperature mixing
# ---------------------------------------------------------------------------

_GOPHER_STOPS = ("the", "and", "of", "to", "in", "a", "is", "for")
_STOPS_SQL = "['" + "', '".join(_GOPHER_STOPS) + "']"


@register(
    "gopher_quality_flags",
    f"""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w,
             len(string_split(text, ' ')) AS nw
      FROM documents
    ),
    bg0 AS (
      SELECT doc_id, unnest(list_transform(range(1, greatest(nw - 1, 0) + 1),
                            i -> w[i] || ' ' || w[i+1])) AS bigram
      FROM t
    ),
    bgtop AS (
      SELECT doc_id, max(c) AS top_bigram_n
      FROM (SELECT doc_id, bigram, count(*) AS c FROM bg0 GROUP BY doc_id, bigram)
      GROUP BY doc_id
    ),
    feats AS (
      SELECT t.doc_id, CAST(t.nw AS BIGINT) AS n_words,
             round(list_sum(list_transform(t.w, x -> len(x)))::DOUBLE / t.nw, 6)
               AS mean_word_len,
             round(len(list_filter(t.w, x -> regexp_matches(x, '[a-zA-Z]')))::DOUBLE
                   / t.nw, 6) AS alpha_word_frac,
             len(list_intersect(list_distinct(t.w), {_STOPS_SQL})) AS n_stops,
             round(coalesce(2.0 * bgtop.top_bigram_n / t.nw, 0.0), 6)
               AS top_bigram_frac
      FROM t LEFT JOIN bgtop USING (doc_id)
    )
    SELECT doc_id, n_words, mean_word_len, alpha_word_frac, top_bigram_frac,
           CAST(n_words BETWEEN 50 AND 100000 AS INTEGER) AS flag_word_count,
           CAST(mean_word_len BETWEEN 3 AND 10 AS INTEGER) AS flag_mean_word_len,
           CAST(alpha_word_frac >= 0.8 AS INTEGER) AS flag_alpha_words,
           CAST(n_stops >= 2 AS INTEGER) AS flag_stopwords,
           CAST(top_bigram_frac <= 0.2 AS INTEGER) AS flag_top_bigram,
           CAST(n_words BETWEEN 50 AND 100000
                AND mean_word_len BETWEEN 3 AND 10
                AND alpha_word_frac >= 0.8
                AND n_stops >= 2
                AND top_bigram_frac <= 0.2 AS INTEGER) AS passed
    FROM feats ORDER BY doc_id
    """,
    doc="Gopher quality rules (Rae et al. 2021, Table A1), the "
    "word-level subset applicable to single-line corpora: word count "
    "in [50, 100k], mean word length in [3, 10], >=80% of words "
    "containing an alphabetic character, >=2 distinct stopwords "
    "(Gopher's 'stop word' rule), and top-bigram token coverage "
    "<= 0.2 (the duplicate-text family; line/paragraph rules need "
    "multi-line text and are inapplicable to this fixture). Each rule "
    "surfaces as its own flag so downstream mixes can relax "
    "individual gates. Narrow per-row maps except ONE per-doc bigram "
    "mode aggregate (explode + two grouped aggs keyed by doc_id — "
    "embarrassingly parallel, no cross-doc state).",
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        text.tokens(F.col("text")).alias("w"),
        F.size(text.tokens(F.col("text"))).alias("nw"),
    )
    # guard: Spark's sequence(1, 0) DESCENDS, so gate on nw >= 2
    bg = t.select(
        "doc_id",
        F.explode(
            F.when(
                F.col("nw") >= 2,
                F.expr(
                    "transform(sequence(1, nw - 1), i -> concat(w[i-1], ' ', w[i]))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bigram"),
    )
    bgtop = (
        bg.groupBy("doc_id", "bigram")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_bigram_n"))
    )
    stops = F.array(*[F.lit(s) for s in _GOPHER_STOPS])
    feats = (
        t.join(bgtop, "doc_id", "left")
        .select(
            "doc_id",
            F.col("nw").cast("bigint").alias("n_words"),
            F.round(
                F.aggregate("w", F.lit(0), lambda a, x: a + F.length(x)).cast(
                    "double"
                )
                / F.col("nw"),
                6,
            ).alias("mean_word_len"),
            F.round(
                F.size(F.filter("w", lambda x: x.rlike("[a-zA-Z]"))).cast("double")
                / F.col("nw"),
                6,
            ).alias("alpha_word_frac"),
            F.size(F.array_intersect(F.array_distinct("w"), stops)).alias("n_stops"),
            F.round(
                F.coalesce(
                    2.0 * F.col("top_bigram_n") / F.col("nw"), F.lit(0.0)
                ),
                6,
            ).alias("top_bigram_frac"),
        )
    )
    f_wc = F.col("n_words").between(50, 100000)
    f_mwl = F.col("mean_word_len").between(3, 10)
    f_alpha = F.col("alpha_word_frac") >= 0.8
    f_stops = F.col("n_stops") >= 2
    f_bg = F.col("top_bigram_frac") <= 0.2
    return feats.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "alpha_word_frac",
        "top_bigram_frac",
        f_wc.cast("int").alias("flag_word_count"),
        f_mwl.cast("int").alias("flag_mean_word_len"),
        f_alpha.cast("int").alias("flag_alpha_words"),
        f_stops.cast("int").alias("flag_stopwords"),
        f_bg.cast("int").alias("flag_top_bigram"),
        (f_wc & f_mwl & f_alpha & f_stops & f_bg).cast("int").alias("passed"),
    ).orderBy("doc_id")


@register(
    "doc_novelty_fraction",
    """
    WITH sh0 AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               range(1, greatest(len(string_split(text,' ')) - 2, 0) + 1),
               i -> string_split(text,' ')[i] || ' ' ||
                    string_split(text,' ')[i+1] || ' ' ||
                    string_split(text,' ')[i+2]))) AS g
      FROM documents
    ),
    firsts AS (SELECT g, min(doc_id) AS first_doc FROM sh0 GROUP BY g)
    SELECT sh0.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN firsts.first_doc = sh0.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           round(sum(CASE WHEN firsts.first_doc = sh0.doc_id THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS novelty
    FROM sh0 JOIN firsts USING (g)
    GROUP BY sh0.doc_id ORDER BY sh0.doc_id
    """,
    doc="First-occurrence novelty score: the fraction of a document's "
    "distinct word-3-grams whose globally FIRST occurrence (by doc_id "
    "ingest order) is this document — the streaming-order 'how much "
    "new material does this doc add' signal used for curriculum "
    "ordering and incremental-crawl triage (novelty ~0 = the corpus "
    "already said all of this). Two count-compressing aggregates "
    "joined at |docs| size (r6 verdict #3): per-doc shingle counts "
    "come straight from the pre-join shingle table, and per-doc novel "
    "counts from grouping the |vocab|-sized first-occurrence table by "
    "its winner — the full shingle table is never joined back, so the "
    "only data-sized exchanges are two map-side-combinable aggregates "
    "(the shingle build is recomputed per branch: narrow CPU, no "
    "shuffle — the right trade at 100 TB where caching the exploded "
    "table is impossible anyway); no doc-pair term ever materializes.",
)
def doc_novelty_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    # identity-only consumer (counts + min winner): hashed shingles —
    # no gram string is ever built, exchanges carry 8-byte longs
    sh = docs.select(
        "doc_id", F.explode(dedup.shingle_hash_array("text", 3)).alias("g")
    )
    # shingle arrays are distinct per doc, so count(*) == n distinct grams
    per_doc = sh.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_shingles")
    )
    # every gram's first_doc contains the gram, so the novel count per
    # doc is just the first-occurrence table grouped by its winner
    novel_ct = (
        sh.groupBy("g")
        .agg(F.min("doc_id").alias("first_doc"))
        .groupBy("first_doc")
        .agg(F.count("*").cast("bigint").alias("n_novel"))
    )
    return (
        per_doc.join(
            novel_ct, per_doc["doc_id"] == novel_ct["first_doc"], "left"
        )
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_novel", F.lit(0)).cast("bigint").alias("n_novel"),
            F.round(
                F.coalesce("n_novel", F.lit(0)) / F.col("n_shingles"), 6
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


@register(
    "mixture_temperature_weights",
    """
    WITH n AS (
      SELECT source,
             CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    )
    SELECT source, n_tokens,
           round(pow(n_tokens, 0.3) / sum(pow(n_tokens, 0.3)) OVER (), 6) AS w_a30,
           round(pow(n_tokens, 0.5) / sum(pow(n_tokens, 0.5)) OVER (), 6) AS w_a50,
           round(pow(n_tokens, 0.7) / sum(pow(n_tokens, 0.7)) OVER (), 6) AS w_a70,
           round(n_tokens * 1.0 / sum(n_tokens) OVER (), 6) AS w_a100
    FROM n ORDER BY source
    """,
    doc="Temperature-based mixture sampling weights (the multilingual "
    "/ multi-source standard from mBERT/XLM-R and data-mixing papers): "
    "per-source sampling probability proportional to n_tokens^alpha at "
    "alpha in {0.3, 0.5, 0.7, 1.0} — low alpha flattens the mix toward "
    "small sources, alpha=1 is proportional sampling. One token-count "
    "aggregate (map-side combinable sums over string lengths) to a "
    "|sources|-row table; the normalizing windows are over that tiny "
    "relation, so cost is the token count scan and nothing else.",
)
def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    n = docs.groupBy("source").agg(
        F.sum(F.size(text.tokens(F.col("text")))).cast("bigint").alias("n_tokens")
    )
    tot = Window.partitionBy()

    def w(alpha: float, name: str):
        p = F.pow(F.col("n_tokens"), alpha)
        return F.round(p / F.sum(p).over(tot), 6).alias(name)

    return n.select(
        "source",
        "n_tokens",
        w(0.3, "w_a30"),
        w(0.5, "w_a50"),
        w(0.7, "w_a70"),
        F.round(F.col("n_tokens") / F.sum("n_tokens").over(tot), 6).alias("w_a100"),
    ).orderBy("source")


# ---------------------------------------------------------------------------
# Round-7a: DoReMi-style excess-loss domain reweighting
# ---------------------------------------------------------------------------

_DRM_ETA = 1.0  # exponentiated-gradient step (effective temperature)
_DRM_SMOOTH = 0.2  # uniform smoothing mass c: w = (1-c)*softmax + c/k


@register(
    "doremi_mixture_weights",
    f"""
    WITH {{bg}},
    srcnll AS (
      SELECT d.source, CAST(count(*) AS BIGINT) AS n_bigrams,
             -avg(lm.logp) AS nll
      FROM bg JOIN lm USING (bigram) JOIN documents d USING (doc_id)
      GROUP BY d.source
    ),
    ref AS (SELECT min(nll) AS ref_nll FROM srcnll),
    ex AS (
      SELECT source, n_bigrams, nll,
             greatest(nll - ref.ref_nll, 0) AS excess
      FROM srcnll CROSS JOIN ref
    ),
    sm AS (
      SELECT source, n_bigrams, nll, excess,
             exp({_DRM_ETA} * excess)
               / sum(exp({_DRM_ETA} * excess)) OVER () AS sw,
             count(*) OVER () AS k
      FROM ex
    )
    SELECT source, n_bigrams, round(nll, 6) AS proxy_nll,
           round(excess, 6) AS excess_loss,
           round((1 - {_DRM_SMOOTH}) * sw + {_DRM_SMOOTH} / k, 6) AS weight
    FROM sm ORDER BY source
    """.replace("{bg}", _BG_SQL),
    doc="DoReMi-style domain reweighting (Xie et al. 2023): each "
    "source's proxy loss is its mean token NLL under the corpus bigram "
    "LM; excess loss clips at the best domain's NLL; one exponentiated-"
    "gradient step turns excesses into a softmax over domains, smoothed "
    "with uniform mass c=0.2 (DoReMi's alpha-smoothing) — hard domains "
    "get upweighted, the reference mix is never starved. With a FIXED "
    "proxy model the T-step EG recursion collapses to a single softmax "
    "at temperature T*eta, so one step IS the converged reweighting "
    "(documented divergence from the online form, which retrains the "
    "proxy between steps). Scale: the only data-sized work is the "
    "bigram NLL join (vocabulary-bounded LM state); everything after "
    "is a |sources|-row window.",
)
def doremi_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    lm, _ = text.bigram_lm(docs)
    # r13: carry `source` with the exploded bigrams directly — it sits
    # on the same input row as `text`, so the oracle's JOIN documents
    # USING (doc_id) (re-attaching a unique-keyed row's own column) is
    # a no-op relationally; dropping it removes one full documents
    # scan + a per-bigram-instance broadcast-hash probe.
    bg = docs.select("source", F.explode(text.bigrams("text")).alias("bigram"))
    srcnll = (
        bg.join(lm.select("bigram", "logp"), "bigram")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            (-F.avg("logp")).alias("nll"),
        )
    )
    wall = Window.partitionBy()
    ex = srcnll.withColumn(
        "excess", F.greatest(F.col("nll") - F.min("nll").over(wall), F.lit(0.0))
    )
    sw = F.exp(_DRM_ETA * F.col("excess")) / F.sum(
        F.exp(_DRM_ETA * F.col("excess"))
    ).over(wall)
    k = F.count("*").over(wall)
    return ex.select(
        "source",
        "n_bigrams",
        F.round("nll", 6).alias("proxy_nll"),
        F.round("excess", 6).alias("excess_loss"),
        F.round((1 - _DRM_SMOOTH) * sw + _DRM_SMOOTH / k, 6).alias("weight"),
    ).orderBy("source")
