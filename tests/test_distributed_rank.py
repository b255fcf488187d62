"""r9 (r8 verdict #2/#3): distributed global rank / prefix sum.

Spark executes an unpartitioned ``Window.orderBy`` as a SINGLE
WindowExec task — the scale-killer the r8 judge plan-audit found in
three queries. ``windows.distributed_row_number`` /
``distributed_cumsum`` compute the identical values via range-bucketed
two-pass scans; these tests pin value parity against the single-window
reference and the plan-audit guard that keeps the class extinct.

Regression pinned here: the first implementation derived bucket ids
from ``repartitionByRange`` + ``spark_partition_id()``; RangePartitioner
re-samples boundaries per physical execution (sketch seed includes the
RDD id), so when column pruning broke exchange reuse between the
offsets branch and the main branch, ranks silently drifted (~±20 on a
dense-id column). Bucket ids are now literal functions of the key.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from big_data_pr_spark.operators import windows


def test_distributed_row_number_matches_window(spark, sf_dir):
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", F.md5(F.col("event_id").cast("string")).alias("h"))
    )
    # chained calls: the second ranks a frame that already went through
    # a join + window (the exchange-reuse failure shape)
    got = windows.distributed_row_number(ev, ["event_id"], out_col="r")
    got = windows.distributed_row_number(got, ["h", "event_id"], out_col="rp")
    ref = ev.select(
        "event_id",
        F.row_number().over(Window.orderBy("event_id")).alias("r_ref"),
        F.row_number().over(Window.orderBy("h", "event_id")).alias("rp_ref"),
    )
    bad = (
        got.join(ref, "event_id")
        .filter(
            (F.col("r") != F.col("r_ref")) | (F.col("rp") != F.col("rp_ref"))
        )
        .count()
    )
    assert bad == 0


def test_distributed_cumsum_matches_window(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "n_chars", F.md5("text").alias("h"))
    )
    got = windows.distributed_cumsum(
        docs, ["h", "doc_id"], "n_chars", out_col="cs"
    )
    ref = docs.select(
        "doc_id",
        F.sum("n_chars")
        .over(
            Window.orderBy("h", "doc_id").rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        .alias("cs_ref"),
    )
    bad = got.join(ref, "doc_id").filter(F.col("cs") != F.col("cs_ref")).count()
    assert bad == 0


def test_distributed_row_number_fans_out(spark, sf_dir):
    """The whole point: the rank must NOT run as one task. The plan's
    local window is partitioned by the bucket column, and the guard
    sees no raw-global WindowExec."""
    from tools.plan_audit import global_window_violations

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id")
    df = windows.distributed_row_number(ev, ["event_id"], out_col="r")
    df.collect()
    assert global_window_violations(df) == []


def test_global_window_guard_flags_raw_and_clears_compressed(spark, sf_dir):
    """r8 verdict #3: the audit tool must find the class the judge
    found by hand — a deliberately global-windowed raw query fails it;
    the sanctioned compress-first shape passes."""
    from tools.plan_audit import global_window_violations

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    bad = ev.select(
        "event_id", F.row_number().over(Window.orderBy("event_id")).alias("r")
    )
    bad.collect()
    assert global_window_violations(bad) == ["WindowExec"]

    agg = ev.groupBy("event_type").count()
    good = agg.select(
        "event_type", F.row_number().over(Window.orderBy("count")).alias("r")
    )
    good.collect()
    assert global_window_violations(good) == []

    keyed = ev.select(
        "event_id",
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("event_id"))
        .alias("r"),
    )
    keyed.collect()
    assert global_window_violations(keyed) == []


@pytest.mark.parametrize(
    "name",
    ["woe_value_deciles", "token_budget_select", "permutation_importance_gbt"],
)
def test_r8_flagged_queries_have_no_raw_global_window(spark, sf_dir, name):
    """The three r8 plan-audit findings, pinned fixed."""
    from big_data_pr_spark.queries import REGISTRY
    from tools.plan_audit import global_window_violations

    df = REGISTRY[name].fn(spark, sf_dir)
    df.collect()
    assert global_window_violations(df) == []


def test_distributed_rank_edge_cases(spark):
    """Empty frame, single row, and a HEAVY-TIED leading column (ties
    must never straddle buckets — bucket assignment is >= boundary on
    the leading key, so secondary keys order within one bucket)."""
    empty = spark.createDataFrame([], "k long, v long")
    assert windows.distributed_row_number(empty, ["k"], out_col="r").count() == 0
    assert (
        windows.distributed_cumsum(empty, ["k"], "v", out_col="c").count() == 0
    )

    one = spark.createDataFrame([(7, 3)], "k long, v long")
    row = windows.distributed_row_number(one, ["k"], out_col="r").collect()[0]
    assert row["r"] == 1

    # 1000 rows over just 3 distinct leading keys, unique tiebreaker
    rows = [(i % 3, i) for i in range(1000)]
    df = spark.createDataFrame(rows, "k long, id long")
    got = {
        r["id"]: r["r"]
        for r in windows.distributed_row_number(
            df, ["k", "id"], out_col="r", num_buckets=8
        ).collect()
    }
    want = {
        id_: rank + 1
        for rank, (_, id_) in enumerate(sorted(rows, key=lambda t: (t[0], t[1])))
    }
    assert got == want


def test_distributed_cumsum_heavy_ties(spark):
    rows = [(i % 2, i, i + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, id long, v long")
    got = {
        r["id"]: r["c"]
        for r in windows.distributed_cumsum(
            df, ["k", "id"], "v", out_col="c", num_buckets=8
        ).collect()
    }
    run = 0
    want = {}
    for _, id_, v in sorted(rows, key=lambda t: (t[0], t[1])):
        run += v
        want[id_] = run
    assert got == want
