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
