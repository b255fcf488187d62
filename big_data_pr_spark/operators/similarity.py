"""Similarity search over embedding columns (``array<float>``).

Two tiers, as a 100 TB pipeline needs:

- **brute-force cosine top-k** — the exact baseline: broadcast the
  query vector(s), one narrow pass computing dot/norms with JVM
  higher-order functions (zip_with + aggregate), TakeOrderedAndProject
  for the top-k. Linear scan, zero shuffle besides the final k-heap
  merge; the right answer up to ~billions of rows × small k.
- **LSH-bucketed ANN** — random-hyperplane signatures (sign of dot with
  deterministic pseudo-random planes), candidates restricted to equal
  signature buckets (shuffle by bucket), exact cosine re-rank inside
  the bucket. Trades recall for a bucket-local join; the scale path
  when queries are many or k-NN graphs are built.

Plane generation uses a seeded numpy RNG inside an Arrow-batched
pandas UDF (defined inline — executor-import-safe); everything else is
built-in expressions.
"""

# NOTE: no `from __future__ import annotations` here — it would turn the
# pandas-UDF type hints into strings, which PySpark's signature
# inspection rejects ([UNSUPPORTED_SIGNATURE]).
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, JVM-side."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(
    df: DataFrame,
    query_df: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against a single-row query DataFrame
    (broadcast — no shuffle of the big side)."""
    q = query_df.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__q")
    )
    joined = df.crossJoin(F.broadcast(q)).filter(F.col(id_col) != F.col("query_id"))
    scored = joined.select(
        "query_id",
        id_col,
        F.round(cosine(F.col(vec_col), F.col("__q")), 6).alias("cos_sim"),
    )
    return scored.orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k)


def cosine_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold over the
    self-join. Exact (O(n²)) — at scale run :func:`ann_lsh_pairs` first
    and feed only candidate buckets through this verifier."""
    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42):
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def with_lsh_bucket(
    df: DataFrame,
    dim: int,
    n_planes: int = 8,
    seed: int = 42,
    vec_col: str = "embedding",
) -> DataFrame:
    """Random-hyperplane LSH signature as an int bucket id (Arrow-batched
    pandas UDF; planes re-derived deterministically on each executor from
    the seed — nothing shipped, nothing module-level)."""
    import pandas as pd

    from pyspark.sql.types import IntegerType

    @F.pandas_udf(IntegerType())
    def bucket(vecs: pd.Series) -> pd.Series:
        import numpy as np

        planes = np.random.default_rng(seed).standard_normal((n_planes, dim))
        mat = np.stack(vecs.to_numpy())  # (batch, dim) float32
        bits = (mat @ planes.T) > 0  # (batch, n_planes)
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series((bits @ weights).astype("int32"))

    return df.withColumn("lsh_bucket", bucket(F.col(vec_col)))


def ann_lsh_topk(
    df: DataFrame,
    query_df: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: restrict the exact cosine scan to the query's
    LSH bucket. Recall < 1 by construction (bucket boundary losses);
    multi-probe (flip one bit) is the standard extension."""
    base = with_lsh_bucket(df, dim, n_planes, seed, vec_col)
    q = with_lsh_bucket(query_df, dim, n_planes, seed, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__q"),
        F.col("lsh_bucket").alias("__qb"),
    )
    joined = (
        base.join(F.broadcast(q), base["lsh_bucket"] == F.col("__qb"))
        .filter(F.col(id_col) != F.col("query_id"))
    )
    return (
        joined.select(
            "query_id",
            id_col,
            F.round(cosine(F.col(vec_col), F.col("__q")), 6).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), F.asc(id_col))
        .limit(k)
    )
