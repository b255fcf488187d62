"""Incremental aggregation — partial-aggregate state merge.

The pattern behind incremental materialized views and the reference's
hourly batch cadence (``run_batch_processor.sh`` cron + high-watermark
ingest, ``hourly_updater.py:58-106``): instead of recomputing an
aggregate over the full history every cycle, keep a per-key partial
state (count / sum / min / max — any commutative monoid) and fold each
new delta into it.

Scale: the state table is |keys| rows — orders of magnitude smaller
than the fact table — so each refresh shuffles only the delta (one
partial-agg exchange) plus the state, never the 100 TB history. The
merge is a union + second-level aggregate, which AQE plans as a small
shuffle; with the state bucketed by key it is co-located and
exchange-free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# monoid name -> (partial agg over raw rows, merge agg over partials)
MERGEABLE = {
    "count": (lambda c: F.count(F.lit(1)), F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def partial_state(
    df: DataFrame, keys: Sequence[str | Column], aggs: dict[str, tuple[str, str]]
) -> DataFrame:
    """Aggregate raw rows into a per-key partial state.

    ``aggs`` maps output column name -> (monoid, input column), e.g.
    ``{"n": ("count", "*"), "total": ("sum", "value")}``.
    """
    exprs = []
    for out, (monoid, col) in aggs.items():
        partial, _ = MERGEABLE[monoid]
        exprs.append(partial(col).alias(out))
    return df.groupBy(*keys).agg(*exprs)


def merge_states(
    states: Sequence[DataFrame], keys: Sequence[str], aggs: dict[str, tuple[str, str]]
) -> DataFrame:
    """Merge partial states (same schema) into one: the second level of
    a two-level aggregation, valid for any commutative monoid column."""
    unioned = states[0]
    for s in states[1:]:
        unioned = unioned.unionByName(s)
    exprs = []
    for out, (monoid, _col) in aggs.items():
        _, merge = MERGEABLE[monoid]
        exprs.append(merge(out).alias(out))
    return unioned.groupBy(*keys).agg(*exprs)
