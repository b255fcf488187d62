"""Window-function operators (SURVEY.md §2.5).

Reference parity:
- W1/W2: trailing SMA-7 / SMA-30 over (symbol, timeframe) ordered by
  timestamp (reference ``batch_processor.py:109-115``) — this is
  literally Spark's ``avg().over(Window.rowsBetween)`` primitive.
- W3: top-1-per-key ("latest stats row", reference ``app.py:102-104``)
  — ``row_number() == 1`` over a desc-ordered key window.
- EMA / pct-change: described in the reference report §6 (code absent
  from the snapshot); EMA is a recursion, expressed here exactly via
  ``collect_list`` over the growing frame + ``F.aggregate`` (JVM-side
  higher-order function — no Python UDF).

Scale notes (100 TB posture):
- All window specs partition by the series key, so Spark shuffles once
  by key and sorts within partitions; no global sort anywhere (the
  reference's redundant global ``orderBy`` at ``batch_processor.py:104``
  is deliberately NOT reproduced — see SURVEY.md §4).
- Skewed keys: a single symbol's full history lands in one task. For
  crypto-candle data (≤ a few M rows/key) this is fine; for larger
  series chunk by (key, coarse time bucket) and stitch overlaps.
- ``ema`` materializes the per-row prefix as an array (O(n²) per key);
  use it for bounded series (dashboards); ``ema_long`` below is the
  linear-memory ``applyInPandas`` variant for long series.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sma(
    df: DataFrame,
    value_col: str,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    window_rows: int,
    out_col: str | None = None,
) -> DataFrame:
    """Trailing simple moving average over the previous ``window_rows`` rows
    (inclusive of current), per key.

    Mirrors reference ``batch_processor.py:109-115`` (SMA-7 uses
    ``rowsBetween(-6, 0)``). Warm-up rows (< window_rows available)
    average over what exists — same as the reference (no nulls).
    """
    out_col = out_col or f"sma_{window_rows}"
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(-(window_rows - 1), 0)
    )
    return df.withColumn(out_col, F.avg(value_col).over(w))


def pct_change(
    df: DataFrame,
    value_col: str,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    out_col: str = "pct_change",
) -> DataFrame:
    """Percent change vs the previous row per key: ``value/lag(value) - 1``.

    Reference report §6 dashboard feature; first row per key is null.
    ``try_divide`` yields NULL when the previous value is 0 instead of
    raising under ANSI mode — matching DuckDB/standard-SQL double
    division semantics (x/0 → NULL), so a zero-priced row poisons one
    output row, not the job.
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    prev = F.lag(F.col(value_col)).over(w)
    return df.withColumn(out_col, F.try_divide(F.col(value_col), prev) - F.lit(1.0))


def ema(
    df: DataFrame,
    value_col: str,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    span: int,
    out_col: str | None = None,
) -> DataFrame:
    """Exponential moving average (pandas ``ewm(span=..., adjust=False)``
    semantics): ``e_0 = x_0;  e_t = α·x_t + (1-α)·e_{t-1}``, α = 2/(span+1).

    The recursion is not a frame aggregate, so we materialize the prefix
    of each series with ``collect_list`` over an unbounded-preceding
    frame and fold it with ``F.aggregate`` — a JVM higher-order
    function, no Python in the loop. O(n²) state per key: use only for
    bounded series; see :func:`ema_long` for the linear variant.
    """
    out_col = out_col or f"ema_{span}"
    alpha = 2.0 / (span + 1.0)
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    prefix = F.collect_list(F.col(value_col)).over(w)
    folded = F.aggregate(
        F.slice(prefix, 2, F.greatest(F.size(prefix) - 1, F.lit(0))),
        F.element_at(prefix, 1).cast("double"),
        lambda acc, x: F.lit(alpha) * x + F.lit(1.0 - alpha) * acc,
    )
    return df.withColumn(out_col, folded)


def ema_long(
    df: DataFrame,
    value_col: str,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    span: int,
    out_col: str | None = None,
) -> DataFrame:
    """Linear-memory EMA for long series: per-key ``applyInPandas`` with
    pandas ``ewm`` — Arrow-batched, one pass per key.

    At 100 TB the shuffle is by key only (same exchange the window
    variant needs); each task streams its group once.
    """
    import pandas as pd  # noqa: F401 — required on executors

    out_col = out_col or f"ema_{span}"
    schema_df = df.withColumn(out_col, F.lit(0.0).cast("double"))
    out_schema = schema_df.schema
    order_list = list(order_cols)

    def per_key(pdf):
        pdf = pdf.sort_values(order_list)
        pdf[out_col] = pdf[value_col].ewm(span=span, adjust=False).mean()
        return pdf

    return df.groupBy(*partition_cols).applyInPandas(per_key, schema=out_schema)


def top1_per_key(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[Column],
) -> DataFrame:
    """Latest/first row per key (reference ``app.py:102-104``: ES
    ``size:1, sort window_end desc`` per symbol).

    ``row_number() == 1`` over the per-key window; Catalyst executes
    this as a single shuffle + per-partition sort with early stop
    (TopK via ``WindowGroupLimit`` in Spark ≥3.5).
    """
    w = Window.partitionBy(*partition_cols).orderBy(*order_cols)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def topk(df: DataFrame, order_cols: Sequence[Column], k: int) -> DataFrame:
    """Global top-k (reference ``app.py:219-228``: sort desc, size k).

    ``orderBy().limit(k)`` — Spark plans TakeOrderedAndProject: each
    partition keeps a k-heap, driver merges; no global sort.
    """
    return df.orderBy(*order_cols).limit(k)


def rolling_median(
    df: DataFrame,
    value_col: str,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    window: int,
    out_col: str = "rolling_median",
) -> DataFrame:
    """Exact trailing-window median per key — the robust (outlier-proof)
    twin of the trailing SMA.

    Spark has no exact median window aggregate, so the frame's values
    are collected and sorted per row JVM-side (``collect_list`` +
    ``sort_array`` inside the window) and the middle element(s) picked
    with ``element_at`` — interpolating the two middle values for even
    frames, matching ``quantile_cont(0.5)``. Cost is O(window log
    window) per row on an array bounded by the FRAME (never the
    partition), riding the same single shuffle + sort every other
    window aggregate over this key uses — acceptable for bounded
    trailing frames (e.g. 25 rows); for large frames swap in
    ``approx_percentile`` as the mergeable at-scale estimate.
    """
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*order_cols)
        .rowsBetween(-(window - 1), Window.currentRow)
    )
    arr = F.sort_array(F.collect_list(F.col(value_col)).over(w))
    n = F.size(arr)
    lo = F.element_at(arr, (n / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    mid = F.element_at(arr, ((n + 1) / 2).cast("int"))
    return df.withColumn(
        out_col,
        F.when(n % 2 == 1, mid).otherwise((lo + hi) / 2),
    )


def md5_bounds(num_buckets: int = 32) -> list[str]:
    """Static range boundaries for an md5-hex leading key: md5 is
    uniform over [0, 16^32), so equal hex-prefix splits are balanced
    WITHOUT a sampling job — pass as ``bounds=`` to
    :func:`distributed_row_number` / :func:`distributed_cumsum` when
    the leading order column is an md5 string (saves one plan-build
    job per call)."""
    step = 256 // num_buckets or 1
    return [f"{i:02x}" for i in range(step, 256, step)]


def _range_bucketed(
    df: DataFrame,
    order_cols: Sequence[str],
    num_buckets: int | None,
    bounds: Sequence | None = None,
) -> DataFrame:
    """Tag each row with an order-consistent range-bucket id derived
    from the LEADING order column's value.

    Why not ``repartitionByRange`` + ``spark_partition_id()``:
    RangePartitioner re-samples boundaries per physical execution (its
    sketch seed includes the RDD id), so when column pruning makes the
    offsets branch's exchange differ from the main branch's, exchange
    reuse fails and the two branches see DIFFERENT bucket ids for the
    same row — silently wrong ranks (observed: distributed rank off by
    ~20 on a dense-id column). Instead boundaries are sampled ONCE at
    plan-build time (a bounded TakeOrdered over hash-smallest keys —
    k-heap per partition, ≤ 40·num_buckets scalars to the driver) and
    embedded as literals, so the bucket id is a pure deterministic
    function of the key and every branch agrees by construction. Rank
    values are boundary-independent, so sampling quality only affects
    balance, never correctness.

    Ties on the leading column all land in one bucket (comparisons are
    ``>= boundary``), so secondary order columns need no tie handling
    across buckets; a leading column with few distinct values degrades
    to fewer effective buckets — pass a more selective leading key.
    Order keys must be non-null.
    """
    if num_buckets is None:
        num_buckets = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    lead = order_cols[0]
    if bounds is None:
        sample = sorted(
            r[0]
            for r in df.select(lead)
            .orderBy(F.xxhash64(F.col(lead)))
            .limit(num_buckets * 40)
            .collect()
            if r[0] is not None
        )
        picked: list = []
        for i in range(1, num_buckets):
            v = sample[min(len(sample) - 1, (i * len(sample)) // num_buckets)] if sample else None
            if v is not None and (not picked or v > picked[-1]):
                picked.append(v)
        bounds = picked
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + F.when(F.col(lead) >= F.lit(b), 1).otherwise(0)
    return df.withColumn("_rb_bucket", bucket)


def distributed_row_number(
    df: DataFrame,
    order_cols: Sequence[str],
    out_col: str = "r",
    num_buckets: int | None = None,
    bounds: Sequence | None = None,
) -> DataFrame:
    """Global ``row_number() OVER (ORDER BY order_cols)`` WITHOUT the
    single-task plan.

    Spark executes an unpartitioned ``Window.orderBy`` as ONE WindowExec
    partition — every raw row funnels through a single task (the
    scale-killer class flagged by ``tools/plan_audit.py``'s
    global-window column). This computes the identical rank in three
    distributed steps:

    1. range-shuffle on the order key (boundaries sampled from the
       data — balanced under skew, no driver involvement);
    2. per-bucket counts → exclusive prefix offsets via a window over
       |buckets| rows (a compressed domain, audit-exempt);
    3. bucket-local ``row_number`` partitioned by bucket id, plus the
       broadcast offset.

    ``order_cols`` MUST form a total order (no ties): tied keys may
    straddle a range boundary, making per-row ranks boundary-dependent.
    Materialize expression keys (e.g. ``md5(text)``) as columns first.
    """
    bucketed = _range_bucketed(df, order_cols, num_buckets, bounds)
    per = bucketed.groupBy("_rb_bucket").agg(F.count(F.lit(1)).alias("_rb_n"))
    w_off = Window.orderBy("_rb_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = per.select(
        "_rb_bucket",
        F.coalesce(F.sum("_rb_n").over(w_off), F.lit(0)).alias("_rb_off"),
    )
    w_loc = Window.partitionBy("_rb_bucket").orderBy(*order_cols)
    return (
        bucketed.join(F.broadcast(offs), "_rb_bucket")
        .withColumn(
            out_col,
            (F.row_number().over(w_loc) + F.col("_rb_off")).cast("long"),
        )
        .drop("_rb_bucket", "_rb_off")
    )


def distributed_cumsum(
    df: DataFrame,
    order_cols: Sequence[str],
    value_col: str,
    out_col: str = "cum",
    num_buckets: int | None = None,
    bounds: Sequence | None = None,
) -> DataFrame:
    """Global running ``sum(value_col) OVER (ORDER BY order_cols ROWS
    UNBOUNDED PRECEDING)`` as a two-pass distributed prefix sum.

    Same shape as :func:`distributed_row_number`: range-shuffle on the
    order key, per-bucket subtotals → exclusive prefix offsets over
    |buckets| rows, bucket-local running sum + broadcast offset. The
    classic parallel scan — no raw-row single-partition WindowExec.
    ``order_cols`` must be tie-free (see distributed_row_number).
    """
    bucketed = _range_bucketed(df, order_cols, num_buckets, bounds)
    per = bucketed.groupBy("_rb_bucket").agg(
        F.sum(value_col).alias("_rb_sum")
    )
    w_off = Window.orderBy("_rb_bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = per.select(
        "_rb_bucket",
        F.coalesce(F.sum("_rb_sum").over(w_off), F.lit(0)).alias("_rb_off"),
    )
    w_loc = (
        Window.partitionBy("_rb_bucket")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        bucketed.join(F.broadcast(offs), "_rb_bucket")
        .withColumn(
            out_col, F.sum(value_col).over(w_loc) + F.col("_rb_off")
        )
        .drop("_rb_bucket", "_rb_off")
    )
