"""Snapshot reconciliation: diff two versions of a keyed table into
added / removed / changed rows — the validation step after every
backfill, migration, or idempotent re-run (the reference re-processes
its full CSV set hourly and trusts upsert-by-doc-id blindly,
`batch_processor.py:142-148`; this operator makes such re-runs
auditable).

Scale shape: ONE full outer join on the key — both sides shuffle once
on the same key (co-located if the tables are bucketed by it, zero
extra exchange), and the column comparison is a null-safe JVM
expression, no UDF. Output is change rows only (≪ table size in any
sane re-run), so the driver never sees table-sized data.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: Sequence[str],
    compare_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Rows that differ between two snapshots, keyed by ``key_cols``.

    Returns one row per changed key: the key columns plus ``change`` ∈
    {'added', 'removed', 'changed'}. Unchanged keys are dropped.
    ``compare_cols`` defaults to every non-key column present in BOTH
    snapshots; comparison is null-safe (NULL == NULL, NULL != value).
    """
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in set(key_cols)
        ]
    o = old.select(*key_cols, *compare_cols).alias("o")
    n = new.select(*key_cols, *compare_cols).alias("n")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"o.{k}") == F.col(f"n.{k}") for k in key_cols],
    )
    in_old = F.col(f"o.{key_cols[0]}").isNotNull()
    in_new = F.col(f"n.{key_cols[0]}").isNotNull()
    same = reduce(
        lambda a, b: a & b,
        [F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}")) for c in compare_cols],
        F.lit(True),
    )
    change = (
        F.when(~in_old, F.lit("added"))
        .when(~in_new, F.lit("removed"))
        .when(~same, F.lit("changed"))
    )
    keys_out = [
        F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k) for k in key_cols
    ]
    return (
        o.join(n, cond, "full_outer")
        .select(*keys_out, change.alias("change"))
        .filter(F.col("change").isNotNull())
    )
