"""Training-mix sampling and sequence packing for corpus pipelines.

A pretraining data pipeline rarely trains on the raw corpus: it *mixes*
strata (languages, sources, quality buckets) at chosen rates and then
*packs* variable-length documents into fixed-size context windows. Both
steps must be deterministic — a re-run over the same corpus has to pick
the same documents and build the same packs, or training is not
reproducible and eval splits leak. Everything here keys on content/id
hashes (md5), never on ``rand()`` or partition order.

Scale design (100 TB posture):

- **hash-threshold sampling** is the at-scale path: one tiny per-stratum
  count aggregate (|strata| rows, broadcast back), then a narrow per-row
  filter ``hash(id) < rate`` — the corpus is scanned once and never
  sorted or shuffled. Quota is hit in expectation (binomial jitter
  ~1/sqrt(quota)).
- **exact-quota sampling** ranks within each stratum (one shuffle on the
  stratum key + per-stratum sort) — exact counts, but pays a sort of
  the corpus; use it when strata are modest or quotas must be exact.
- **packing** is per-shard by construction (running sum within a natural
  shard such as ``source``): each shard's prefix-sum is an independent
  window, so the job parallelizes across shards and no global order is
  ever imposed. Shard skew is the thing to watch — split oversized
  shards on a hash prefix before packing.

Reference parity note: the reference has no sampling/packing surface
(SURVEY.md §2 — serving-layer scans only); these are north-star
training-data extensions (BASELINE.json).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _id_hash(id_col: str) -> F.Column:
    """Deterministic engine-portable per-row hash: md5 of the decimal id
    string. Used instead of xxhash64 so DuckDB oracles can reproduce the
    exact sample (both engines emit identical lowercase hex)."""
    return F.md5(F.col(id_col).cast("string"))


def stratified_sample_exact(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly ``n_per_stratum`` rows per stratum (fewer if the stratum
    is smaller), chosen by ranking on the id hash — deterministic,
    engine-portable, independent of partitioning.

    Cost: one shuffle on the strata key + a per-stratum sort (the
    ``row_number`` window). Exact quotas; prefer
    :func:`stratified_sample_hash` when expectation-level quotas are
    acceptable and the corpus is large.
    """
    w = Window.partitionBy(*strata_cols).orderBy(_id_hash(id_col), F.col(id_col))
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def stratified_sample_hash(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """~``n_per_stratum`` rows per stratum in expectation, via a hash
    threshold: stratum rate = quota / stratum_count, keep rows whose
    16-bit hash prefix falls under rate·2¹⁶.

    The at-scale mixing path: the per-stratum counts are an aggregate of
    |strata| rows joined back by broadcast; the keep decision is a
    narrow per-row map. No sort, no corpus shuffle. The same row is
    kept or dropped regardless of engine, partitioning, or corpus
    growth within a stratum snapshot.
    """
    counts = df.groupBy(*strata_cols).agg(F.count(F.lit(1)).alias("_n"))
    bucket = F.conv(F.substring(_id_hash(id_col), 1, 4), 16, 10).cast("bigint")
    return (
        df.join(F.broadcast(counts), strata_cols)
        .filter(
            bucket
            < F.ceil(F.lit(n_per_stratum) * F.lit(65536) / F.col("_n"))
        )
        .drop("_n")
    )


def pack_bins_whole_docs(
    df: DataFrame,
    capacity: int,
    shard_col: str = "source",
    tokens_col: str = "n_tok",
    id_col: str = "doc_id",
) -> DataFrame:
    """Whole-document bin packing: greedy first-fit-decreasing per
    shard. Unlike :func:`pack_context_windows` (concat-and-chunk, docs
    may straddle pack boundaries), every document lands whole in one
    pack — the layout for training recipes that forbid cross-document
    attention without masking. Documents longer than ``capacity`` get
    their own pack, flagged ``oversize``.

    FFD is inherently sequential state (open-bin remaining capacities),
    so this is a per-shard ``applyInPandas`` — Arrow-batched, linear in
    shard size, state = open-bin list (bounded by shard_tokens /
    capacity). Shards pack independently and in parallel; FFD waste is
    ≤ 11/9·OPT + 1 bins per shard. Deterministic: ties broken by id.

    Returns ``(id, shard, n_tok, pack_id, oversize)`` with ``pack_id``
    unique within the shard.
    """
    import pandas as pd

    from pyspark.sql.types import (
        BooleanType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField(id_col, LongType()),
            StructField(shard_col, StringType()),
            StructField(tokens_col, LongType()),
            StructField("pack_id", LongType()),
            StructField("oversize", BooleanType()),
        ]
    )

    def pack(pdf):
        pdf = pdf.sort_values([tokens_col, id_col], ascending=[False, True])
        bins = []  # remaining capacity per open bin
        assign = []
        oversize = []
        for n in pdf[tokens_col]:
            n = int(n)
            if n > capacity:
                bins.append(-1)  # closed oversize bin
                assign.append(len(bins) - 1)
                oversize.append(True)
                continue
            for b, rem in enumerate(bins):
                if rem >= n:
                    bins[b] = rem - n
                    assign.append(b)
                    break
            else:
                bins.append(capacity - n)
                assign.append(len(bins) - 1)
            oversize.append(False)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].values,
                shard_col: pdf[shard_col].values,
                tokens_col: pdf[tokens_col].values,
                "pack_id": assign,
                "oversize": oversize,
            }
        )

    cols = [id_col, shard_col, tokens_col]
    return (
        df.select(*cols)
        .groupBy(shard_col)
        .applyInPandas(pack, out_schema)
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    rate_scale: float = 1.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep each row independently with probability
    ``min(weight · rate_scale, 1)`` — the quality/source-weighted
    training-mix step (upsample high-quality documents, downsample
    boilerplate sources) made deterministic: the coin flip is the
    row's 16-bit id-hash bucket against ``p·2¹⁶``, so the same row is
    kept on every engine, re-run, and partitioning.

    Scale: a narrow per-row map — no shuffle, no state, no rand(); at
    100 TB the sample is a filter fused into the scan. IEEE evaluation
    order of the threshold is fixed (least(w·s, 1)·65536) so SQL
    oracles replay bit-identically.
    """
    bucket = F.conv(F.substring(_id_hash(id_col), 1, 4), 16, 10).cast("bigint")
    p = F.least(F.col(weight_col) * F.lit(rate_scale), F.lit(1.0))
    return df.filter(bucket < p * F.lit(65536.0))


def pack_context_windows(
    df: DataFrame,
    capacity: int,
    shard_col: str = "source",
    tokens_col: str = "n_tok",
    id_col: str = "doc_id",
) -> DataFrame:
    """Assign each document to a fixed-capacity context-window pack by
    contiguous greedy packing within a shard: documents are laid out in
    deterministic id order and cut into ``capacity``-token windows
    (``pack_id``), recording each doc's starting ``pack_offset``.

    This is the concat-and-chunk packing used to build pretraining
    batches: ``pack_id = floor(prefix_tokens / capacity)`` where
    ``prefix_tokens`` is the running token count *before* the document.
    Documents longer than ``capacity`` simply span packs (their offset
    still marks where they start).

    Scale: the running sum is windowed per shard — one shuffle on the
    shard key, per-shard sort, no global order. Shards are independent,
    so the 100-TB corpus packs in parallel across its natural shards.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prefix = F.sum(tokens_col).over(w) - F.col(tokens_col)
    return df.select(
        id_col,
        shard_col,
        tokens_col,
        F.floor(prefix / capacity).cast("bigint").alias("pack_id"),
        (prefix % capacity).cast("bigint").alias("pack_offset"),
    )


def mixture_weights(
    df: DataFrame,
    group_cols: list[str],
    size_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Training-mixture weights per source/domain: weight ∝ (Σ size)^α,
    normalized — the standard sub-linear upsampling of small domains
    (α < 1 flattens the mixture toward uniform; α = 1 is proportional).

    One aggregation to |groups| rows, then a global window over that
    driver-sized aggregate — the corpus is touched once. α defaults to
    0.5 because IEEE ``sqrt`` is correctly rounded, so the oracle
    reproduces the weights bit-identically; pass e.g. 0.7 for the
    usual mixture exponent when cross-engine exactness doesn't matter.
    """
    agg = df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(size_col).alias("n_tokens"),
    )
    powed = (
        F.sqrt(F.col("n_tokens").cast("double"))
        if alpha == 0.5
        else F.pow(F.col("n_tokens").cast("double"), F.lit(alpha))
    )
    w = Window.partitionBy()
    return (
        agg.withColumn("__p", powed)
        .withColumn("weight", F.round(F.col("__p") / F.sum("__p").over(w), 6))
        .drop("__p")
    )


def waterfill(avail: DataFrame, budget_col: str = "b") -> DataFrame:
    """Capped water-filling: allocate a global budget across groups
    proportionally to ``w`` but never above ``cap``; budget freed by
    saturated groups re-flows to the rest.

    ``avail`` columns: a group key ``lang``, ``cap`` (long), ``w``
    (double), ``b`` (the global budget, same on every row). Classic
    result: in increasing cap/w order the saturated set is a prefix,
    so the whole allocation is two window prefix-sums over the
    |groups|-sized relation plus one pivot row — no iteration. Returns
    (lang, cap, w, alloc, saturated); sum(alloc) == min(b, sum(cap))
    and 0 <= alloc <= cap (pinned in tests/test_pipeline_ext.py).
    """
    w_prev = Window.orderBy(F.col("cap") / F.col("w"), "lang").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_rest = Window.orderBy(F.col("cap") / F.col("w"), "lang").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    ordered = avail.select(
        "lang",
        "cap",
        "w",
        F.col(budget_col).alias("b"),
        F.coalesce(F.sum("cap").over(w_prev), F.lit(0)).alias("capsum"),
        F.sum("w").over(w_rest).alias("wsum"),
    )
    flagged = ordered.withColumn(
        "sat",
        F.when(
            F.col("cap") * F.col("wsum")
            <= (F.col("b") - F.col("capsum")) * F.col("w"),
            1,
        ).otherwise(0),
    )
    # first unsaturated row in ratio order: capsum increases along the
    # order (min = first), wsum decreases (max = first). Computed as
    # GLOBAL windows over the |groups|-sized relation — not a separate
    # aggregate branch crossJoined back, which would re-execute the
    # upstream (corpus-scan) aggregate once per branch.
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    pivoted = flagged.withColumns(
        {
            "capsum_k": F.min(
                F.when(F.col("sat") == 0, F.col("capsum"))
            ).over(w_all),
            "wsum_k": F.max(
                F.when(F.col("sat") == 0, F.col("wsum"))
            ).over(w_all),
        }
    )
    return pivoted.select(
        "lang",
        "cap",
        "w",
        F.when(F.col("sat") == 1, F.col("cap").cast("double"))
        .otherwise(
            (F.col("b") - F.col("capsum_k")) * F.col("w") / F.col("wsum_k")
        )
        .alias("alloc"),
        (F.col("sat") == 1).alias("saturated"),
    )


def weighted_reservoir(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    seed: str = "res1",
) -> DataFrame:
    """Fixed-size weighted sample WITHOUT replacement (Efraimidis &
    Spirakis A-ES): each row draws key = u^(1/w) from its seeded
    deterministic uniform and the k largest keys win — inclusion
    probability proportional to weight, exactly k rows, no rejection
    loop. Complements ``weighted_sample`` (independent Bernoulli,
    variable size).

    Scale: the key is a narrow map (no shuffle, no rand()); the top-k
    is TakeOrderedAndProject — per-partition heaps of size k, never a
    global sort. Deterministic md5 uniform (privacy.hash_uniform) means
    the same reservoir on every engine, re-run, and partitioning — and
    makes the sample SQL-oracle-able.
    """
    from .privacy import hash_uniform

    u = hash_uniform(F.col(id_col).cast("string"), seed)
    key = F.exp(F.log(u) / F.col(weight_col))
    return (
        df.withColumn("__rkey", key)
        .orderBy(F.desc("__rkey"), F.asc(id_col))
        .limit(k)
    )
