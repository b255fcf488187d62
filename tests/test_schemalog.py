"""Metadata-only schema evolution (operators/schemalog.py): evolution
ops never rewrite data, renames keep old+new files readable, defaults
backfill, pushdown survives the mapping."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from big_data_pr_spark.operators import schemalog
from big_data_pr_spark.tables import load


def _data_files(table_dir: str) -> dict[str, float]:
    return {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(table_dir, "data", "*.parquet"))
    }


@pytest.fixture()
def table(spark, sf_dir, tmp_path):
    d = str(tmp_path / "tbl")
    orders = load(spark, sf_dir, "orders")
    v1 = orders.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    schemalog.init_table(v1, d)
    return d


def test_lifecycle_add_rename_append(spark, sf_dir, table):
    orders = load(spark, sf_dir, "orders")
    n_even = orders.filter(F.col("o_orderkey") % 2 == 0).count()
    n_odd = orders.filter(F.col("o_orderkey") % 2 == 1).count()

    before = _data_files(table)
    schemalog.add_column(table, "flag", "string", default="NONE")
    schemalog.rename_column(table, "o_totalprice", "price")
    # evolution is metadata-only: same files, same mtimes
    assert _data_files(table) == before

    v2 = orders.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey",
        "o_orderstatus",
        F.col("o_totalprice").alias("price"),
        F.col("o_orderpriority").alias("flag"),
    )
    schemalog.append(v2, table)

    got = schemalog.read(spark, table)
    assert set(got.columns) == {"o_orderkey", "o_orderstatus", "price", "flag"}
    assert got.count() == n_even + n_odd
    # old rows: default-backfilled flag, renamed price still readable
    assert got.filter(F.col("flag") == "NONE").count() == n_even
    old_sum = (
        orders.filter(F.col("o_orderkey") % 2 == 0)
        .agg(F.sum("o_totalprice"))
        .collect()[0][0]
    )
    got_sum = (
        got.filter(F.col("flag") == "NONE").agg(F.sum("price")).collect()[0][0]
    )
    assert abs(old_sum - got_sum) < 1e-6


def test_history_and_drop(spark, table):
    schemalog.add_column(table, "extra", "int")
    schemalog.drop_column(table, "extra")
    hist = schemalog.schema_history(table)
    assert [h["version"] for h in hist] == [0, 1, 2]
    assert hist[1]["op"] == "add:extra"
    assert hist[2]["op"] == "drop:extra"
    assert "extra" not in [c["name"] for c in schemalog.current_schema(table)]
    assert "extra" not in schemalog.read(spark, table).columns


def test_filter_pushdown_through_rename(spark, table):
    schemalog.rename_column(table, "o_totalprice", "price")
    df = schemalog.read(spark, table).filter(F.col("price") > 100000.0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the logical-name filter reaches the parquet scan on the physical name
    assert "PushedFilters: [" in plan
    assert "o_totalprice" in plan.split("PushedFilters:")[1][:200]


def test_append_requires_logical_schema(spark, table):
    schemalog.rename_column(table, "o_totalprice", "price")
    bad = spark.createDataFrame(
        [(1, "O", 1.0)], "o_orderkey long, o_orderstatus string, o_totalprice double"
    )
    with pytest.raises(ValueError, match="price"):
        schemalog.append(bad, table)


def test_guards(spark, table):
    with pytest.raises(ValueError):
        schemalog.add_column(table, "o_orderkey", "long")
    with pytest.raises(KeyError):
        schemalog.rename_column(table, "nope", "x")
    schemalog.add_column(table, "dup", "int")
    with pytest.raises(ValueError):
        schemalog.rename_column(table, "o_orderstatus", "dup")
    with pytest.raises(KeyError):
        schemalog.drop_column(table, "nope")


def test_drop_then_readd_does_not_resurrect(spark, tmp_path):
    """ADVICE r5 (low): dropping a column and re-adding one with the
    same logical name must NOT map onto the dropped column's physical
    data in old files — deleted values would resurrect. The re-added
    column gets a fresh physical name and reads as its default."""
    import os

    d = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id int, status string"
    )
    schemalog.init_table(df, d)
    schemalog.drop_column(d, "status")
    schemalog.add_column(d, "status", "string", default="fresh")
    out = {r["id"]: r["status"] for r in schemalog.read(spark, d).collect()}
    # old files still physically contain status=a/b — must NOT leak
    assert out == {1: "fresh", 2: "fresh"}
    # appends under the new schema land in the fresh physical column
    schemalog.append(
        spark.createDataFrame([(3, "live")], "id int, status string"), d
    )
    out = {r["id"]: r["status"] for r in schemalog.read(spark, d).collect()}
    assert out == {1: "fresh", 2: "fresh", 3: "live"}
    phys = {c["name"]: c["physical"] for c in schemalog.current_schema(d)}
    assert phys["status"] != "status"
