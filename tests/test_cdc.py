"""CDC MERGE semantics: upsert/delete/last-wins/idempotent replay."""

from __future__ import annotations

from big_data_pr_spark.operators.cdc import apply_changes, merge_changes


def _rows(spark, path):
    return {
        r["k"]: (r["v"], r["note"])
        for r in spark.read.parquet(path).collect()
    }


def test_apply_changes_full_lifecycle(spark, tmp_path):
    path = str(tmp_path / "tbl")
    schema = "k long, v double, note string, op string, seq long"

    # bootstrap from inserts (including a delete for a never-seen key)
    c1 = spark.createDataFrame(
        [
            (1, 1.0, "a", "I", 1),
            (2, 2.0, "b", "I", 2),
            (3, 3.0, "c", "I", 3),
            (9, None, None, "D", 4),
        ],
        schema,
    )
    assert apply_changes(spark, path, c1, "k", "seq") == 3

    # update + delete + insert in one changeset; key 2 gets two changes,
    # highest seq wins
    c2 = spark.createDataFrame(
        [
            (2, 20.0, "b1", "U", 10),
            (2, 22.0, "b2", "U", 12),
            (3, None, None, "D", 11),
            (4, 4.0, "d", "I", 13),
        ],
        schema,
    )
    assert apply_changes(spark, path, c2, "k", "seq") == 3
    got = _rows(spark, path)
    assert got == {1: (1.0, "a"), 2: (22.0, "b2"), 4: (4.0, "d")}

    # replaying the same changeset is a no-op (at-least-once safety)
    assert apply_changes(spark, path, c2, "k", "seq") == 3
    assert _rows(spark, path) == got

    # delete-then-reinsert at higher seq resurrects the key
    c3 = spark.createDataFrame(
        [(4, None, None, "D", 20), (4, 44.0, "d2", "I", 21)], schema
    )
    apply_changes(spark, path, c3, "k", "seq")
    assert _rows(spark, path)[4] == (44.0, "d2")


def test_merge_changes_pure_dataframe(spark):
    target = spark.createDataFrame(
        [(1, 1.0, "a"), (2, 2.0, "b")], "k long, v double, note string"
    )
    changes = spark.createDataFrame(
        [(1, None, None, "D", 5), (3, 3.0, "c", "I", 6)],
        "k long, v double, note string, op string, seq long",
    )
    out = {
        r["k"]: r["v"]
        for r in merge_changes(target, changes, "k", "seq").collect()
    }
    assert out == {2: 2.0, 3: 3.0}
