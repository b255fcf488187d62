"""Salted-join correctness: row-identical to the plain equi-join on a
deliberately skewed key distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_pr_spark.operators.skew import salted_join
from big_data_pr_spark.tables import load


def _skewed(spark, sf_dir):
    """events with ~half the rows collapsed onto one hot user."""
    ev = load(spark, sf_dir, "events").select("event_id", "user_id", "value")
    return ev.withColumn(
        "user_id",
        F.when(F.col("event_id") % 2 == 0, F.lit(7)).otherwise(F.col("user_id")),
    )


def _dim(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return (
        ev.select("user_id").distinct().withColumn("segment", F.col("user_id") % 5)
    )


def _key_counts(df):
    return {
        (r["user_id"], r["segment"]): r["n"]
        for r in df.groupBy("user_id", "segment").agg(F.count(F.lit(1)).alias("n")).collect()
    }


def test_salted_inner_join_matches_plain(spark, sf_dir):
    big, dim = _skewed(spark, sf_dir), _dim(spark, sf_dir)
    plain = big.join(dim, "user_id", "inner")
    salted = salted_join(big, dim, "user_id", n_salt=8, how="inner")
    assert salted.count() == plain.count()
    assert _key_counts(salted) == _key_counts(plain)


def test_salted_left_join_matches_plain(spark, sf_dir):
    big, dim = _skewed(spark, sf_dir), _dim(spark, sf_dir)
    # drop some dim keys so the left side actually exercises null fill
    dim = dim.filter(F.col("user_id") % 3 != 0)
    plain = big.join(dim, "user_id", "left")
    salted = salted_join(big, dim, "user_id", n_salt=8, how="left")
    assert salted.count() == plain.count()
    assert _key_counts(salted) == _key_counts(plain)


def test_salted_join_hot_keys_only(spark, sf_dir):
    big, dim = _skewed(spark, sf_dir), _dim(spark, sf_dir)
    plain = big.join(dim, "user_id", "inner")
    salted = salted_join(big, dim, "user_id", n_salt=8, how="inner", hot_keys=[7])
    assert salted.count() == plain.count()
    assert _key_counts(salted) == _key_counts(plain)
    # non-hot keys are not duplicated on the small side
    s = dim.withColumn(
        "__salt",
        F.explode(
            F.when(F.col("user_id").isin([7]), F.sequence(F.lit(0), F.lit(7)))
            .otherwise(F.array(F.lit(0)))
        ),
    )
    per_key = {r["user_id"]: r["n"] for r in s.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per_key[7] == 8
    assert all(v == 1 for k, v in per_key.items() if k != 7)
