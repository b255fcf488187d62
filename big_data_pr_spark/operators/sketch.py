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
