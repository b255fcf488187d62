"""Misra-Gries heavy-hitters certificate — sketch-family extension.

The count-min sketch (operators/sketch.py) answers "how often does
THIS key occur"; Misra-Gries answers the dual "WHICH keys are
frequent" with a deterministic, mergeable, k-sized summary — the
at-scale replacement for exact per-key counts when only the heavy tail
matters (trending users, hot partitions, top tokens). The certificate
below converts the engine-specific summary into an oracle-gated
correctness row, exactly like cms_error_certificate /
approx_distinct_certificate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.privacy import hash_uniform_sql
from ..operators.sketch import mg_topk
from ..tables import load
from .registry import register

_MG_K = 64


@register(
    "heavy_hitters_certificate",
    f"""
    WITH tok AS (
      SELECT t.token FROM documents,
             unnest(string_split(lower(text), ' ')) AS t(token)
      WHERE t.token <> ''
    )
    SELECT token, TRUE AS captured, TRUE AS no_overcount,
           TRUE AS within_bound
    FROM tok GROUP BY token
    HAVING count(*) > (SELECT count(*) / {_MG_K}.0 FROM tok)
    ORDER BY token
    """,
    doc="Driver-checkable certificate for the Misra-Gries frequent-items "
    f"summary (operators/sketch.py, k={_MG_K}) over the Zipfian corpus "
    "token stream (vocabulary >> k, so the decrement/evict path is "
    "genuinely exercised): for every token whose TRUE count exceeds "
    "n/k, the merged per-partition summary must (a) contain the token "
    "— the pigeonhole capture guarantee, (b) never overcount, and (c) "
    "undercount by at most n/k. All three guarantees are deterministic "
    "(no hashing, no probability), so the oracle is the constant TRUE "
    "table over the true heavy hitters. The summary itself is one "
    "Arrow-batched mapInPandas pass (at most k-1 rows per partition — "
    "the genuinely imperative tier-c path) merged by a kilobyte-sized "
    "groupBy; the exact-count side exists only to CHECK the bounds and "
    "disappears in production use.",
)
def heavy_hitters_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    ).filter(F.col("token") != "")
    tok = tok.cache()
    est = mg_topk(tok, "token", _MG_K)
    exact = tok.groupBy("token").agg(F.count("*").alias("true_c"))
    wall_n = exact.agg(
        F.sum("true_c").alias("n")
    )  # driver-sized scalar relation, broadcast below
    hh = (
        exact.crossJoin(F.broadcast(wall_n))
        .where(F.col("true_c") > F.col("n") / float(_MG_K))
        .join(
            F.broadcast(est.withColumnRenamed("key", "token_est")),
            F.col("token") == F.col("token_est"),
            "left",
        )
    )
    return (
        hh.select(
            "token",
            F.col("est_count").isNotNull().alias("captured"),
            (F.col("est_count") <= F.col("true_c")).alias("no_overcount"),
            (
                F.col("est_count")
                >= F.col("true_c") - F.col("n") / float(_MG_K)
            ).alias("within_bound"),
        )
        .orderBy("token")
    )


_BLOOM_BUCKETS = 1024


@register(
    "bloom_fpr_certificate",
    """
    WITH member AS (
      SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    ),
    nonmember AS (
      SELECT c_custkey FROM customer
      WHERE c_custkey NOT IN (SELECT o_custkey FROM member)
    )
    SELECT CAST((SELECT count(*) FROM member) AS BIGINT) AS n_members,
           CAST((SELECT count(*) FROM nonmember) AS BIGINT) AS n_nonmembers,
           TRUE AS no_false_negatives,
           TRUE AS fpr_within_bound
    """,
    doc="Driver-checkable certificate for the explicit bloom-style "
    "hashset prefilter (operators/bloomfilter.py, shrunk to 1024 "
    "buckets so collisions actually occur): membership = customers "
    "with an urgent order; probe = all OTHER customers. The filter "
    "must (a) pass every true member — the no-false-negative guarantee "
    "that makes it safe as a join prefilter — and (b) keep the "
    "false-positive rate under 3x the n_keys/num_buckets expectation "
    "(deterministic here: fixed fixture + fixed xxhash64). The exact "
    "member/nonmember counts come from data, so the oracle recomputes "
    "them and the TRUE flags gate the engine-side guarantees — same "
    "pattern as cms_error_certificate.",
)
def bloom_fpr_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.bloomfilter import hashset_prefilter

    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    member = (
        orders.where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("ck"))
        .distinct()
    ).cache()
    nonmember = cust.select(F.col("c_custkey").alias("ck")).join(
        member, "ck", "left_anti"
    )
    kept_members = hashset_prefilter(
        member, member, "ck", "ck", num_buckets=_BLOOM_BUCKETS
    ).count()
    n_members = member.count()
    n_nonmembers = nonmember.count()
    false_pos = hashset_prefilter(
        nonmember, member, "ck", "ck", num_buckets=_BLOOM_BUCKETS
    ).count()
    bound = 3.0 * n_members / _BLOOM_BUCKETS
    row = [
        (
            n_members,
            n_nonmembers,
            bool(kept_members == n_members),
            bool(false_pos <= bound * n_nonmembers),
        )
    ]
    return spark.createDataFrame(
        row,
        "n_members long, n_nonmembers long, no_false_negatives boolean, "
        "fpr_within_bound boolean",
    )


_RES_K = 50


@register(
    "weighted_reservoir_docs",
    f"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             exp(ln({hash_uniform_sql("CAST(doc_id AS VARCHAR)", "res1")})
                 / n_chars) AS rkey
      FROM documents
    ),
    top AS (
      SELECT doc_id, n_chars,
             row_number() OVER (ORDER BY rkey DESC, doc_id) AS rank
      FROM keyed
    )
    SELECT rank, doc_id, n_chars FROM top
    WHERE rank <= {_RES_K} ORDER BY rank
    """,
    doc="Efraimidis-Spirakis weighted reservoir: exactly 50 documents "
    "sampled without replacement with inclusion probability "
    "proportional to length — the fixed-budget counterpart to the "
    "Bernoulli weighted_sample for building a pinned-size training "
    "subset. key = u^(1/w) over the seeded md5 uniform, top-k by key "
    "(TakeOrderedAndProject heaps — no global sort, no rand()); the "
    "oracle replays the identical key formula, so the exact sample "
    "membership AND order are hash-gated. operators/sampling.py.",
)
def weighted_reservoir_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import weighted_reservoir

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    res = weighted_reservoir(docs, "n_chars", _RES_K, id_col="doc_id")
    w = Window.orderBy(F.desc("__rkey"), F.asc("doc_id"))
    return res.select(
        F.row_number().over(w).alias("rank"), "doc_id", "n_chars"
    ).orderBy("rank")


# ---------------------------------------------------------------------------
# Round-6i: AMS (tug-of-war) F2 sketch with exact certificate
# ---------------------------------------------------------------------------

_AMS_K = 16  # number of independent sign sketches


@register(
    "ams_f2_certificate",
    f"""
    WITH tok0 AS (
      SELECT unnest(string_split(text, ' ')) AS w FROM documents
    ),
    sk AS (SELECT unnest(range(0, {_AMS_K})) AS j),
    z AS (
      SELECT sk.j,
             sum(CASE WHEN substr(md5(tok0.w || '#' || sk.j), 1, 1) < '8'
                      THEN 1.0 ELSE -1.0 END) AS zj
      FROM tok0 CROSS JOIN sk GROUP BY sk.j
    ),
    est AS (SELECT avg(zj * zj) AS f2_est FROM z),
    ex AS (
      SELECT sum(c * c) AS f2_exact FROM
        (SELECT count(*) AS c FROM tok0 GROUP BY w)
    )
    SELECT CAST(ex.f2_exact AS BIGINT) AS f2_exact,
           round(est.f2_est, 2) AS f2_est,
           round(abs(est.f2_est - ex.f2_exact) / ex.f2_exact, 6) AS rel_err,
           CAST(abs(est.f2_est - ex.f2_exact)
                <= 4 * ex.f2_exact * sqrt(2.0 / {_AMS_K}) AS INTEGER)
             AS within_4sigma
    FROM est CROSS JOIN ex
    """,
    doc="AMS 'tug-of-war' second-moment sketch (Alon-Matias-Szegedy "
    f"1996) with an exact certificate: {_AMS_K} independent +-1 sign "
    "sketches (sign = md5(token#j) first hex char — engine-neutral, "
    "replayable anywhere), each accumulating Z_j = sum_w s_j(w) f_w; "
    "E[Z^2] = F2 = sum f^2, Var <= 2 F2^2 / k, so the mean-of-squares "
    "estimate is certified against the exact self-join size F2 within "
    "4 sigma. F2 IS the join/skew cost oracle (self-join output size "
    "on that key), which is why engines sketch it. Scale: each Z_j is "
    "ONE map-side-combinable sum over the token stream — k x corpus "
    "narrow work, 16-row state, no vocabulary materialized; the exact "
    "side (one vocab-bounded groupBy) exists only to certify.",
)
def ams_f2_certificate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
    sk = spark.range(_AMS_K).select(F.col("id").alias("j"))
    sign = F.when(
        F.substring(F.md5(F.concat_ws("#", "w", "j")), 1, 1) < "8", F.lit(1.0)
    ).otherwise(F.lit(-1.0))
    z = (
        tok.crossJoin(F.broadcast(sk))
        .groupBy("j")
        .agg(F.sum(sign).alias("zj"))
    )
    est = z.agg(F.avg(F.col("zj") * F.col("zj")).alias("f2_est"))
    ex = (
        tok.groupBy("w")
        .agg(F.count("*").alias("c"))
        .agg(F.sum(F.col("c") * F.col("c")).alias("f2_exact"))
    )
    return est.crossJoin(ex).select(
        F.col("f2_exact").cast("bigint").alias("f2_exact"),
        F.round("f2_est", 2).alias("f2_est"),
        F.round(
            F.abs(F.col("f2_est") - F.col("f2_exact")) / F.col("f2_exact"), 6
        ).alias("rel_err"),
        (
            F.abs(F.col("f2_est") - F.col("f2_exact"))
            <= 4 * F.col("f2_exact") * F.lit((2.0 / _AMS_K) ** 0.5)
        )
        .cast("int")
        .alias("within_4sigma"),
    )
