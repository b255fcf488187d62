"""table_diff: snapshot reconciliation semantics on hand-built
versions — added/removed/changed classification, null-safe compares,
composite keys, unchanged rows dropped."""

from __future__ import annotations

from big_data_pr_spark.operators.diff import table_diff


def test_table_diff_classifies(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 20.0), (3, "c", None), (4, "D", 40.0), (5, "e", 50.0)],
        "k long, s string, v double",
    )
    got = {r["k"]: r["change"] for r in table_diff(old, new, ["k"]).collect()}
    # 1 only in old; 5 only in new; 4 changed (s differs); 2 unchanged
    # (dropped); 3 unchanged — NULL == NULL under null-safe compare
    assert got == {1: "removed", 4: "changed", 5: "added"}


def test_table_diff_null_to_value_is_changed(spark):
    old = spark.createDataFrame([(1, None)], "k long, v string")
    new = spark.createDataFrame([(1, "x")], "k long, v string")
    rows = table_diff(old, new, ["k"]).collect()
    assert [(r["k"], r["change"]) for r in rows] == [(1, "changed")]


def test_table_diff_composite_key_and_subset_cols(spark):
    old = spark.createDataFrame(
        [(1, 1, "x", 9.0), (1, 2, "y", 8.0)], "a long, b long, s string, ignored double"
    )
    new = spark.createDataFrame(
        [(1, 1, "x", 7.0), (1, 2, "z", 8.0)], "a long, b long, s string, ignored double"
    )
    rows = table_diff(old, new, ["a", "b"], compare_cols=["s"]).collect()
    # (1,1): only `ignored` differs and it's excluded → unchanged/dropped
    assert [(r["a"], r["b"], r["change"]) for r in rows] == [(1, 2, "changed")]
