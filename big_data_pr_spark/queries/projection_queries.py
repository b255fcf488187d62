"""Johnson-Lindenstrauss random projection with a measured distortion
certificate.

Reference capability this generalizes: the reference stores no
embeddings at all; this engine's similarity stack (knn/ANN/PQ/PCA,
operators/similarity.py) gains the remaining classic dimensionality
tool — a data-independent sign (Achlioptas) random projection, whose
whole point at 100 TB is that the projection matrix needs NO training
pass and is regenerated anywhere from a hash, so executors never ship
or broadcast model state.

Cross-engine determinism: the +-1 projection matrix entry R[j,k] is
derived from md5(j||'_'||k) (first hex char < '8' -> +1) — the same
engine-neutral hash trick split_by_hash/pseudonymize_users use — so
Spark and the DuckDB oracle build bit-identical matrices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import load
from .registry import register

_IN_DIM = 64
_OUT_DIM = 16


@register(
    "jl_projection_distortion",
    f"""
    WITH r AS (
      SELECT j.j, k.k,
             CASE WHEN substr(md5(j.j || '_' || k.k), 1, 1) < '8'
                  THEN 1.0 ELSE -1.0 END AS sgn
      FROM (SELECT unnest(range(0, {_IN_DIM})) AS j) j
      CROSS JOIN (SELECT unnest(range(0, {_OUT_DIM})) AS k) k
    ),
    el AS (
      SELECT e.vec_id, u.j, CAST(e.embedding[u.j + 1] AS DOUBLE) AS x
      FROM embeddings e
      CROSS JOIN (SELECT unnest(range(0, {_IN_DIM})) AS j) u
    ),
    proj AS (
      SELECT el.vec_id, r.k,
             sum(el.x * r.sgn) / sqrt({_OUT_DIM}) AS y
      FROM el JOIN r ON r.j = el.j
      GROUP BY 1, 2
    ),
    d_orig AS (
      SELECT a.vec_id AS i,
             sqrt(list_sum(list_transform(range(1, {_IN_DIM} + 1),
               q -> pow(CAST(a.embedding[q] AS DOUBLE)
                        - CAST(b.embedding[q] AS DOUBLE), 2)))) AS d0
      FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
    ),
    d_proj AS (
      SELECT a.vec_id AS i,
             sqrt(sum(pow(a.y - b.y, 2))) AS d1
      FROM proj a JOIN proj b ON b.vec_id = a.vec_id + 1 AND b.k = a.k
      GROUP BY 1
    ),
    ratio AS (
      SELECT o.i, p.d1 / o.d0 AS rr
      FROM d_orig o JOIN d_proj p ON p.i = o.i
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           round(min(rr), 6) AS min_ratio,
           round(avg(rr), 6) AS mean_ratio,
           round(max(rr), 6) AS max_ratio,
           CAST(sum(CASE WHEN rr BETWEEN 0.7 AND 1.3 THEN 1 ELSE 0 END)
                AS BIGINT) AS within_30pct
    FROM ratio
    """,
    doc=f"Johnson-Lindenstrauss certificate: project the {_IN_DIM}-dim "
    f"embeddings to {_OUT_DIM} dims with the Achlioptas +-1 sign "
    "matrix (entry sign = md5(j_k) parity, so the matrix is "
    "regenerable on any executor with no broadcast or training pass), "
    "then measure the Euclidean-distance distortion ratio "
    "d_proj/d_orig over the consecutive-id pair sample. JL theory "
    "says ratios concentrate near 1 at rate 1/sqrt(out_dim); the "
    "certificate reports min/mean/max and the count within +-30%. "
    "Shapes: the projection is one narrow posexplode fan-out "
    "(rows x dim) joined to the broadcast 1024-entry sign table and "
    "re-grouped by (vec_id, k) — embarrassingly parallel; the pair "
    "sample joins on vec_id+1, never all-pairs.",
)
def jl_projection_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    j = spark.range(0, _IN_DIM).select(F.col("id").alias("j"))
    k = spark.range(0, _OUT_DIM).select(F.col("id").alias("k"))
    r = j.crossJoin(k).select(
        "j",
        "k",
        F.when(
            F.substring(F.md5(F.concat_ws("_", "j", "k")), 1, 1) < "8", 1.0
        )
        .otherwise(-1.0)
        .alias("sgn"),
    )
    el = emb.select(
        "vec_id", F.posexplode("embedding").alias("j", "xf")
    ).select("vec_id", "j", F.col("xf").cast("double").alias("x"))
    proj = (
        el.join(F.broadcast(r), "j")
        .groupBy("vec_id", "k")
        .agg((F.sum(F.col("x") * F.col("sgn")) / F.sqrt(F.lit(float(_OUT_DIM)))).alias("y"))
    )
    a, b = emb.alias("a"), emb.alias("b")
    d_orig = a.join(b, F.col("b.vec_id") == F.col("a.vec_id") + 1).select(
        F.col("a.vec_id").alias("i"),
        F.sqrt(
            F.aggregate(
                F.zip_with(
                    F.col("a.embedding"),
                    F.col("b.embedding"),
                    lambda x, y: (x.cast("double") - y.cast("double"))
                    * (x.cast("double") - y.cast("double")),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        ).alias("d0"),
    )
    pa, pb = proj.alias("pa"), proj.alias("pb")
    d_proj = (
        pa.join(
            pb,
            (F.col("pb.vec_id") == F.col("pa.vec_id") + 1)
            & (F.col("pb.k") == F.col("pa.k")),
        )
        .groupBy(F.col("pa.vec_id").alias("i"))
        .agg(
            F.sqrt(
                F.sum(
                    (F.col("pa.y") - F.col("pb.y"))
                    * (F.col("pa.y") - F.col("pb.y"))
                )
            ).alias("d1")
        )
    )
    ratio = d_orig.join(d_proj, "i").select((F.col("d1") / F.col("d0")).alias("rr"))
    return ratio.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.round(F.min("rr"), 6).alias("min_ratio"),
        F.round(F.avg("rr"), 6).alias("mean_ratio"),
        F.round(F.max("rr"), 6).alias("max_ratio"),
        F.sum(F.when(F.col("rr").between(0.7, 1.3), 1).otherwise(0))
        .cast("bigint")
        .alias("within_30pct"),
    )
