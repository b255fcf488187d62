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

from ..operators import text
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
