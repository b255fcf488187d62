"""Bucketized range join — point-in-interval without a cartesian.

Spark's Catalyst has no range-join optimization: a join whose ONLY
predicate is ``point BETWEEN start AND end`` plans as
BroadcastNestedLoop/cartesian + filter — O(|L|·|R|) at 100 TB. The
standard fix is bucketization: quantize time into fixed buckets,
explode each interval to the buckets it covers, key points by their
bucket, and equi-join on the bucket id. The equi-join hash-partitions
both sides; each point meets only the intervals overlapping its
bucket, so work is O(points + Σ interval_spans) — candidates bounded
by bucket width, not table sizes.

A point lies in exactly ONE bucket, so each (interval, point) pair
meets at most once — no post-join dedup. Pick ``bucket_width`` near
the typical interval length: wider ⇒ fewer explode rows but more
false candidates filtered after the join; narrower ⇒ the reverse.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..timeutil import epoch_micros


def _bucket_seq(first: Column, last: Column) -> Column:
    """``sequence(first, last)`` hardened against malformed intervals.

    ``F.sequence(a, b)`` with ``b < a`` defaults to step -1 and yields a
    DESCENDING array instead of an empty one — a degenerate or inverted
    interval (``end <= start``) would fan out into spurious bucket rows
    (unboundedly many for badly inverted data, e.g. an epoch-0 end
    generates ~470k bucket rows per interval at 1 h buckets). Clamp such
    rows to their single start bucket: they still survive ``left``/
    ``outer`` joins as one row, and the real range predicate in the join
    condition guarantees they match nothing spurious.
    """
    return F.when(last >= first, F.sequence(first, last)).otherwise(
        F.array(first)
    )


def point_in_interval_join(
    intervals: DataFrame,
    points: DataFrame,
    start_col: str = "start",
    end_col: str = "end",
    point_col: str = "ts",
    bucket_width_s: int = 3600,
    how: str = "inner",
) -> DataFrame:
    """Join ``points`` to every interval containing them
    (``start <= point < end``) via bucket equi-join. Returns the
    interval columns + the point columns (both sides' columns must not
    collide apart from the internal ``__bkt``).

    Bucket coverage is computed at MICROSECOND precision (timestamp's
    full resolution): truncating to whole seconds would drop the last
    bucket of an interval whose ``end`` has a fractional-second
    component (e.g. [00:30:00, 01:00:00.500) with 1 h buckets must
    cover bucket 1 to reach a point at 01:00:00.200).

    With ``how='left'``/``'outer'``, an unmatched interval spanning k
    buckets comes back k times (one null-padded row per exploded
    bucket): callers must aggregate or ``dropDuplicates`` on the
    interval key. Inner joins need no dedup — a point lies in exactly
    one bucket, so each (interval, point) pair meets at most once.
    """
    width_us = F.lit(int(bucket_width_s) * 1_000_000)
    start_us = epoch_micros(F.col(start_col))
    end_us = epoch_micros(F.col(end_col))
    # buckets covered by [start, end): floor(start/w) .. floor((end-1)/w)
    iv = intervals.withColumn(
        "__bkt",
        F.explode(
            _bucket_seq(
                F.floor(start_us / width_us),
                F.floor((end_us - 1) / width_us),
            )
        ),
    )
    pt = points.withColumn(
        "__bkt", F.floor(epoch_micros(F.col(point_col)) / width_us)
    )
    # the range predicate rides IN the join condition (not a post-join
    # filter) so outer joins keep unmatched intervals; the bucket
    # equality is still the equi-key Catalyst hash-partitions on
    cond = (
        (iv["__bkt"] == pt["__bkt"])
        & (pt[point_col] >= iv[start_col])
        & (pt[point_col] < iv[end_col])
    )
    return iv.join(pt, cond, how).drop(iv["__bkt"]).drop(pt["__bkt"])


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    start_col: str = "sess_start",
    end_col: str = "sess_end",
    width_seconds: int = 3600,
) -> DataFrame:
    """Interval x interval overlap join (closed intervals: overlap iff
    ``l.start <= r.end AND r.start <= l.end``) without a nested loop:
    both sides explode to the fixed-width buckets they cover, the join
    runs as an equi-join on the bucket key with the true overlap
    predicate riding in the condition, and the bucket-induced
    duplicates (a pair overlapping across k shared buckets appears k
    times) collapse with one ``dropDuplicates`` over the joined key
    columns. Cost is |rows| x avg-buckets-per-interval through one hash
    shuffle — never |left| x |right| — the distributed form of the
    overlap joins interval trees serve locally. Columns on each side
    must be pre-aliased to be disjoint; every left+right column is
    treated as the pair identity for the dedup.
    """
    lw = left.withColumn(
        "__bkt",
        F.explode(
            _bucket_seq(
                F.floor(epoch_micros(F.col(start_col)) / (width_seconds * 1_000_000)),
                F.floor(epoch_micros(F.col(end_col)) / (width_seconds * 1_000_000)),
            )
        ),
    )
    rcols = [f"__r_{c}" for c in right.columns]
    rr = right.toDF(*rcols)
    rw = rr.withColumn(
        "__bkt",
        F.explode(
            _bucket_seq(
                F.floor(
                    epoch_micros(F.col(f"__r_{start_col}")) / (width_seconds * 1_000_000)
                ),
                F.floor(
                    epoch_micros(F.col(f"__r_{end_col}")) / (width_seconds * 1_000_000)
                ),
            )
        ),
    )
    cond = (
        (lw["__bkt"] == rw["__bkt"])
        & (lw[start_col] <= rw[f"__r_{end_col}"])
        & (rw[f"__r_{start_col}"] <= lw[end_col])
    )
    out = lw.join(rw, cond).drop("__bkt")
    return out.dropDuplicates(left.columns + rcols)
