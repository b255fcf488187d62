"""Count-min sketch — mergeable frequency estimation for heavy hitters.

Completes the engine's sketch family (HLL via approx_count_distinct,
GK quantiles via percentile_approx) with frequencies: a d×w counter
matrix where each of d rows hashes every key into one of w buckets.
Estimated count = min over rows — always an OVERestimate (one-sided),
within ε·N with probability 1-δ for w = ⌈e/ε⌉, d = ⌈ln(1/δ)⌉.

Spark shape: the sketch is ``(row, bucket) -> count`` — d·w cells
regardless of key cardinality — built with ONE grouped aggregate over
d·|input| exploded rows (partial map-side combine shrinks the shuffle
to d·w per mapper). Sketches from different partitions/days/streams
merge by cell-wise addition (`cms_merge`), which is what makes this
the at-scale swap for exact per-key counts in dashboards: the 100 TB
corpus reduces to a KB-sized mergeable state per window.

Hashing: xxhash64(key, seed=row) — engine-internal (no SQL oracle;
behavioral guarantees pinned in tests/test_sketch.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cms_build(
    df: DataFrame,
    key_col: str,
    width: int = 256,
    depth: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the sketch: returns ``(row, bucket, c)`` with d·w cells."""
    w = F.lit(1).cast("long") if weight_col is None else F.col(weight_col)
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).alias("row"),
                    F.pmod(F.xxhash64(F.col(key_col), F.lit(d)), F.lit(width)).alias(
                        "bucket"
                    ),
                )
                for d in range(depth)
            ]
        )
    )
    return (
        df.select(rows.alias("cell"), w.alias("__w"))
        .groupBy(F.col("cell.row").alias("row"), F.col("cell.bucket").alias("bucket"))
        .agg(F.sum("__w").alias("c"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of same-shape sketches (the mergeability that lets
    per-partition/per-day sketches roll up without rescanning)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("c").alias("c"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    width: int = 256,
    depth: int = 4,
) -> DataFrame:
    """Estimated count per key in ``keys``: min over the d probed cells.
    The sketch is d·w rows — broadcast it; the probe is a narrow map +
    one tiny aggregate."""
    probes = keys.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("row"),
                        F.pmod(
                            F.xxhash64(F.col(key_col), F.lit(d)), F.lit(width)
                        ).alias("bucket"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(key_col, F.col("cell.row").alias("row"), F.col("cell.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("est_count"))
    )


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters — mergeable deterministic frequent-items summary
# ---------------------------------------------------------------------------


def mg_fold(counters: dict, key: str, w: int, k: int) -> dict:
    """One weighted Misra-Gries update, in place: add ``w`` to ``key``;
    if the dict exceeds k-1 entries, subtract the current MIN from
    every counter and evict non-positives. Each subtract-min of amount
    m cancels m mass from >= k counters (the k-1 kept plus the
    arrival), so total per-key undercount <= n/k and a key with true
    weight > n/k can never be fully cancelled. Pure function so the
    guarantee is property-testable without Spark."""
    counters[key] = counters.get(key, 0) + w
    if len(counters) > k - 1:
        m = min(counters.values())
        doomed = [kk for kk, c in counters.items() if c <= m]
        for kk in counters:
            counters[kk] -= m
        for kk in doomed:
            del counters[kk]
    return counters


def mg_partition_summaries(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Per-partition Misra-Gries summaries: ``(key, c)`` with at most
    k-1 rows per partition.

    The classical streaming algorithm: keep a dict of at most k-1
    counters; an unseen key with a full dict decrements ALL counters by
    the arriving weight's share and evicts non-positive ones. Within a
    partition of n_p rows every kept count underestimates the true
    partition count by at most n_p/k, and any key with partition
    frequency > n_p/k is guaranteed to survive.

    This is the genuinely imperative per-partition path (SURVEY §4's
    "custom operator" tier c): state across rows of one partition, so
    ``mapInPandas`` with a dict — Arrow-batched, zero shuffle. The
    output is at most 32*(k-1) rows total on local[32]; at 1000
    executors it is still executor-count * k, kilobytes.
    """
    import pandas as pd  # noqa: PLC0415

    out_schema = "key string, c long"

    def summarize(batches):
        # Weighted MG: fold each Arrow batch's value_counts in as
        # (key, weight) pairs. The Python loop runs over DISTINCT keys
        # per batch, not rows.
        counters: dict[str, int] = {}
        for pdf in batches:
            for key, w in pdf[key_col].astype(str).value_counts().items():
                mg_fold(counters, key, int(w), k)
        yield pd.DataFrame(
            {"key": list(counters), "c": list(counters.values())}
        )

    return df.select(F.col(key_col).cast("string").alias(key_col)).mapInPandas(
        summarize, schema=out_schema
    )


def mg_topk(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """Merged Misra-Gries estimate: ``(key, est_count)``.

    Merging per-partition summaries by plain summation preserves both
    guarantees globally (error bounds add: sum_p n_p/k = n/k, and a key
    with global frequency > n/k exceeds n_p/k in at least one partition
    by pigeonhole, so it appears in the union):

    - est_count <= true count (never overcounts),
    - est_count >= true count - n/k,
    - every key with true count > n/k is present.

    One mapInPandas pass + one tiny groupBy over executor_count*k rows.
    """
    return (
        mg_partition_summaries(df, key_col, k)
        .groupBy("key")
        .agg(F.sum("c").alias("est_count"))
    )
