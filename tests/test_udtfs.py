"""UDTF extension surface (operators/udtfs.py)."""

from __future__ import annotations

from big_data_pr_spark.operators.udtfs import register_udtfs


def test_top_tokens_deterministic_ties(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [("b a b a c",)], "text string"
    ).createOrReplaceTempView("__u1")
    rows = spark.sql(
        "SELECT t.* FROM __u1, LATERAL top_tokens(text, 3) t ORDER BY t.rk"
    ).collect()
    # a and b tie at 2 — lexicographic break puts a first
    assert [(r["token"], r["n"], r["rk"]) for r in rows] == [
        ("a", 2, 1),
        ("b", 2, 2),
        ("c", 1, 3),
    ]


def test_top_tokens_null_and_empty(spark):
    register_udtfs(spark)
    spark.createDataFrame(
        [(None,), ("",)], "text string"
    ).createOrReplaceTempView("__u2")
    rows = spark.sql(
        "SELECT t.* FROM __u2, LATERAL top_tokens(text, 2) t"
    ).collect()
    # NULL yields nothing; '' splits to one empty token
    assert len(rows) == 1 and rows[0]["token"] == ""


def test_char_ngrams_positions(spark):
    register_udtfs(spark)
    spark.createDataFrame([("abcd",)], "text string").createOrReplaceTempView(
        "__u3"
    )
    rows = spark.sql(
        "SELECT t.* FROM __u3, LATERAL char_ngrams(text, 3) t ORDER BY t.pos"
    ).collect()
    assert [(r["pos"], r["gram"]) for r in rows] == [(1, "abc"), (2, "bcd")]
