"""Probabilistic record linkage / entity resolution — round-6p.

Reference capability this extends: the reference dedups rows by exact
doc-id (batch_processor.py step 5, `union_dedup` family here) and this
engine already has similarity dedup (MinHash/SimHash) and blocked
fuzzy matching (`fuzzy_supplier_pairs`). What was missing is the
*probabilistic* member of the family — the Fellegi–Sunter model
(JASA 1969) that underlies Splink/dedupe.io-class production linkage:

- ``fs_linkage_patterns`` — blocked pairwise comparison vectors over
  the ``part`` table (two listings of the same product agree on brand
  / descriptor / noun), aggregated to the 2^3 agreement patterns with
  the Fellegi–Sunter log2 match weight per pattern;
- ``em_linkage_step`` — one exact EM iteration (Winkler 1988 latent
  -class formulation) re-estimating per-field m/u probabilities and
  the match prior from those pattern counts;
- ``sorted_neighborhood_stats`` — the OTHER classic blocking
  topology (Hernandez & Stolfo, SIGMOD 1995): sort within blocks,
  compare each record to its next-w neighbors via ``lead`` windows —
  a sort+window physical shape, deliberately NOT a self-join.

Scale posture: linkage at 100 TB is never all-pairs — it is blocked
self-joins (pair count bounded by sum over blocks of C(n_b, 2); here
(p_type, p_size) gives ~666 k pairs at sf0.1) or sorted-neighborhood
windows (pair count = w * N, linear). The EM step runs on the
8-row pattern table — aggregate-sized, iterable for free. All m/u
literals cross the engine boundary as repr'd Python doubles so both
engines parse bit-identical values; posterior products are written as
chained CASE multiplications (no `pow`), which IEEE-evaluate
identically left-to-right on both sides.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from .registry import register

# Per-field (brand, adjective, noun) match / non-match agreement
# probabilities for the Fellegi-Sunter weights. Literal model
# parameters (as in any FS scorer before EM refinement); the EM query
# below estimates them from data instead.
_FS_M = (0.95, 0.90, 0.90)
_FS_U = (0.04, 0.125, 0.125)
# Agreement / disagreement log2 weights, computed ONCE in Python and
# embedded as identical literals in both engines.
_W_A = tuple(math.log2(m / u) for m, u in zip(_FS_M, _FS_U))
_W_D = tuple(math.log2((1 - m) / (1 - u)) for m, u in zip(_FS_M, _FS_U))

# EM starting point (uniform across the three fields).
_EM_L0 = 0.05  # match prior
_EM_M0 = 0.9  # P(field agrees | match)
_EM_U0 = 0.1  # P(field agrees | non-match)


def _d(v: float) -> str:
    """Embed a Python double as a DuckDB DOUBLE literal.

    DuckDB types bare numeric literals as DECIMAL, which both
    overflows scale on chained multiplication and hash-mismatches
    Spark's float results; an explicit CAST keeps the oracle in IEEE
    double like Spark."""
    return f"CAST({v!r} AS DOUBLE)"

_PAIRS_SQL = """
      SELECT CASE WHEN a.p_brand = b.p_brand THEN 1 ELSE 0 END AS g1,
             CASE WHEN string_split(a.p_name, ' ')[1]
                     = string_split(b.p_name, ' ')[1] THEN 1 ELSE 0 END AS g2,
             CASE WHEN string_split(a.p_name, ' ')[2]
                     = string_split(b.p_name, ' ')[2] THEN 1 ELSE 0 END AS g3
      FROM part a JOIN part b
        ON a.p_type = b.p_type AND a.p_size = b.p_size
       AND a.p_partkey < b.p_partkey
"""


def _pair_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked comparison vectors: (g1, g2, g3, n_pairs) — 8 rows.

    Block key (p_type, p_size) bounds the candidate space (sum_b
    C(n_b, 2), ~666 k pairs at sf0.1); the self-join is an equi-join
    on the block key, so it shuffles once on (type, size) and never
    goes all-pairs. g1/g2/g3 = brand / name-adjective / name-noun
    agreement.
    """
    part = load(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_type", "p_size"
    )
    a, b = part.alias("a"), part.alias("b")
    pairs = a.join(
        b,
        (F.col("a.p_type") == F.col("b.p_type"))
        & (F.col("a.p_size") == F.col("b.p_size"))
        & (F.col("a.p_partkey") < F.col("b.p_partkey")),
    )
    return (
        pairs.select(
            (F.col("a.p_brand") == F.col("b.p_brand")).cast("int").alias("g1"),
            (
                F.split(F.col("a.p_name"), " ")[0]
                == F.split(F.col("b.p_name"), " ")[0]
            )
            .cast("int")
            .alias("g2"),
            (
                F.split(F.col("a.p_name"), " ")[1]
                == F.split(F.col("b.p_name"), " ")[1]
            )
            .cast("int")
            .alias("g3"),
        )
        .groupBy("g1", "g2", "g3")
        .agg(F.count("*").alias("n_pairs"))
    )


@register(
    "fs_linkage_patterns",
    f"""
    WITH pairs AS ({_PAIRS_SQL}),
    pat AS (
      SELECT g1, g2, g3, CAST(count(*) AS BIGINT) AS n_pairs
      FROM pairs GROUP BY 1, 2, 3)
    SELECT CAST(g1 AS VARCHAR) || CAST(g2 AS VARCHAR) || CAST(g3 AS VARCHAR)
             AS pattern,
           n_pairs,
           round(  (CASE WHEN g1 = 1 THEN {_d(_W_A[0])} ELSE {_d(_W_D[0])} END)
                 + (CASE WHEN g2 = 1 THEN {_d(_W_A[1])} ELSE {_d(_W_D[1])} END)
                 + (CASE WHEN g3 = 1 THEN {_d(_W_A[2])} ELSE {_d(_W_D[2])} END),
                 6) AS fs_weight
    FROM pat ORDER BY pattern
    """,
    doc="Fellegi-Sunter (JASA 1969) probabilistic linkage over "
    "(p_type, p_size)-blocked part pairs: per agreement pattern "
    "(brand, name-adjective, name-noun) the pair count and the "
    "composite log2 match weight sum_k [gk ? log2(mk/uk) : "
    "log2((1-mk)/(1-uk))]. The Splink-style scorer: pairs above a "
    "weight threshold are links. Blocked equi-self-join — one "
    "shuffle on the block key, never all-pairs.",
)
def fs_linkage_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    pat = _pair_patterns(spark, sf_dir)
    weight = (
        F.when(F.col("g1") == 1, F.lit(_W_A[0])).otherwise(F.lit(_W_D[0]))
        + F.when(F.col("g2") == 1, F.lit(_W_A[1])).otherwise(F.lit(_W_D[1]))
        + F.when(F.col("g3") == 1, F.lit(_W_A[2])).otherwise(F.lit(_W_D[2]))
    )
    return pat.select(
        F.concat(
            F.col("g1").cast("string"),
            F.col("g2").cast("string"),
            F.col("g3").cast("string"),
        ).alias("pattern"),
        F.col("n_pairs").cast("bigint").alias("n_pairs"),
        F.round(weight, 6).alias("fs_weight"),
    ).orderBy("pattern")


@register(
    "em_linkage_step",
    f"""
    WITH pairs AS ({_PAIRS_SQL}),
    pat AS (SELECT g1, g2, g3, count(*) AS n FROM pairs GROUP BY 1, 2, 3),
    post AS (
      SELECT g1, g2, g3, n,
             {_d(_EM_L0)}
               * (CASE WHEN g1 = 1 THEN {_d(_EM_M0)} ELSE {_d(1 - _EM_M0)} END)
               * (CASE WHEN g2 = 1 THEN {_d(_EM_M0)} ELSE {_d(1 - _EM_M0)} END)
               * (CASE WHEN g3 = 1 THEN {_d(_EM_M0)} ELSE {_d(1 - _EM_M0)} END)
               AS num,
             {_d(1 - _EM_L0)}
               * (CASE WHEN g1 = 1 THEN {_d(_EM_U0)} ELSE {_d(1 - _EM_U0)} END)
               * (CASE WHEN g2 = 1 THEN {_d(_EM_U0)} ELSE {_d(1 - _EM_U0)} END)
               * (CASE WHEN g3 = 1 THEN {_d(_EM_U0)} ELSE {_d(1 - _EM_U0)} END)
               AS den2
      FROM pat),
    g AS (SELECT *, num / (num + den2) AS gp FROM post),
    agg AS (
      SELECT sum(gp * n) AS sm, sum((1 - gp) * n) AS su, sum(n) AS nt,
             sum(gp * n * g1) AS a1, sum(gp * n * g2) AS a2,
             sum(gp * n * g3) AS a3,
             sum((1 - gp) * n * g1) AS b1, sum((1 - gp) * n * g2) AS b2,
             sum((1 - gp) * n * g3) AS b3
      FROM g)
    SELECT f.field,
           round(CASE f.i WHEN 1 THEN a1 / sm WHEN 2 THEN a2 / sm
                          ELSE a3 / sm END, 6) AS m1,
           round(CASE f.i WHEN 1 THEN b1 / su WHEN 2 THEN b2 / su
                          ELSE b3 / su END, 6) AS u1,
           round(sm / nt, 6) AS lambda1
    FROM agg, (VALUES ('brand', 1), ('name_adjective', 2), ('name_noun', 3))
           AS f(field, i)
    ORDER BY field
    """,
    doc="One exact EM iteration of the Fellegi-Sunter latent-class "
    "model (Winkler 1988) on the blocked part-pair agreement "
    "patterns: E-step posterior P(match | pattern) from uniform "
    "starting parameters (lambda=0.05, m=0.9, u=0.1), M-step "
    "re-estimates per-field m/u and the match prior. Runs entirely "
    "on the 8-row pattern table, so further iterations are "
    "aggregate-sized — the pair scan happens once. Posterior "
    "products are chained CASE multiplications (no pow), "
    "IEEE-identical across engines.",
)
def em_linkage_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    pat = _pair_patterns(spark, sf_dir).withColumnRenamed("n_pairs", "n")

    def _prod(p_agree: float, lead: float) -> F.Column:
        col = F.lit(lead)
        for gk in ("g1", "g2", "g3"):
            col = col * F.when(
                F.col(gk) == 1, F.lit(p_agree)
            ).otherwise(F.lit(1 - p_agree))
        return col

    g = pat.withColumn("num", _prod(_EM_M0, _EM_L0)).withColumn(
        "den2", _prod(_EM_U0, 1 - _EM_L0)
    )
    g = g.withColumn("gp", F.col("num") / (F.col("num") + F.col("den2")))
    agg = g.agg(
        F.sum(F.col("gp") * F.col("n")).alias("sm"),
        F.sum((1 - F.col("gp")) * F.col("n")).alias("su"),
        F.sum("n").alias("nt"),
        *[
            F.sum(F.col("gp") * F.col("n") * F.col(gk)).alias(f"a{i}")
            for i, gk in enumerate(("g1", "g2", "g3"), start=1)
        ],
        *[
            F.sum((1 - F.col("gp")) * F.col("n") * F.col(gk)).alias(f"b{i}")
            for i, gk in enumerate(("g1", "g2", "g3"), start=1)
        ],
    )
    fields = F.array(
        *[
            F.struct(
                F.lit(name).alias("field"),
                (F.col(f"a{i}") / F.col("sm")).alias("m1"),
                (F.col(f"b{i}") / F.col("su")).alias("u1"),
            )
            for i, name in enumerate(
                ("brand", "name_adjective", "name_noun"), start=1
            )
        ]
    )
    return (
        agg.select(
            F.explode(fields).alias("r"),
            (F.col("sm") / F.col("nt")).alias("lam"),
        )
        .select(
            F.col("r.field").alias("field"),
            F.round("r.m1", 6).alias("m1"),
            F.round("r.u1", 6).alias("u1"),
            F.round("lam", 6).alias("lambda1"),
        )
        .orderBy("field")
    )


@register(
    "sorted_neighborhood_stats",
    """
    WITH p AS (
      SELECT p_partkey, p_name, p_brand, p_size,
             string_split(p_name, ' ')[1] AS blk
      FROM part),
    nbr AS (
      SELECT blk, p_brand, p_size,
             lead(p_brand, 1) OVER w AS brand_1,
             lead(p_size, 1) OVER w AS size_1,
             lead(p_brand, 2) OVER w AS brand_2,
             lead(p_size, 2) OVER w AS size_2
      FROM p
      WINDOW w AS (PARTITION BY blk ORDER BY p_name, p_partkey)),
    pairs AS (
      SELECT 1 AS offset_pos, p_brand = brand_1 AS brand_match,
             abs(p_size - size_1) AS size_gap
      FROM nbr WHERE brand_1 IS NOT NULL
      UNION ALL
      SELECT 2, p_brand = brand_2, abs(p_size - size_2)
      FROM nbr WHERE brand_2 IS NOT NULL)
    SELECT CAST(offset_pos AS BIGINT) AS offset_pos,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN brand_match THEN 1 ELSE 0 END) AS BIGINT)
             AS n_brand_match,
           round(avg(CAST(size_gap AS DOUBLE)), 6) AS mean_size_gap
    FROM pairs GROUP BY 1 ORDER BY 1
    """,
    doc="Sorted-neighborhood blocking (Hernandez & Stolfo, SIGMOD "
    "1995): within name-adjective blocks, sort by (p_name, "
    "p_partkey) and compare each record to its next-2 neighbors via "
    "lead windows — candidate count is w*N (linear), the classic "
    "alternative to join-based blocking. Emits per-offset pair "
    "counts, brand-agreement counts, and mean size gap. Window is "
    "PARTITIONed by the block key, so the sort is distributed (no "
    "single-partition global window).",
)
def sorted_neighborhood_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").select(
        "p_partkey",
        "p_name",
        "p_brand",
        "p_size",
        F.split(F.col("p_name"), " ")[0].alias("blk"),
    )
    w = Window.partitionBy("blk").orderBy("p_name", "p_partkey")
    nbr = p.select(
        "p_brand",
        "p_size",
        F.lead("p_brand", 1).over(w).alias("brand_1"),
        F.lead("p_size", 1).over(w).alias("size_1"),
        F.lead("p_brand", 2).over(w).alias("brand_2"),
        F.lead("p_size", 2).over(w).alias("size_2"),
    )
    parts = [
        nbr.where(F.col(f"brand_{o}").isNotNull()).select(
            F.lit(o).alias("offset_pos"),
            (F.col("p_brand") == F.col(f"brand_{o}")).alias("brand_match"),
            F.abs(F.col("p_size") - F.col(f"size_{o}")).alias("size_gap"),
        )
        for o in (1, 2)
    ]
    pairs = parts[0].unionAll(parts[1])
    return (
        pairs.groupBy("offset_pos")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.col("brand_match").cast("bigint")).alias("n_brand_match"),
            F.round(F.avg(F.col("size_gap").cast("double")), 6).alias(
                "mean_size_gap"
            ),
        )
        .select(
            F.col("offset_pos").cast("bigint").alias("offset_pos"),
            "n_pairs",
            "n_brand_match",
            "mean_size_gap",
        )
        .orderBy("offset_pos")
    )
