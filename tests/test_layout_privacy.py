"""Unit tests for the round-6 layout (Z-order) and privacy (DP noise,
k-anonymity) operators."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from big_data_pr_spark.operators import layout, privacy


def _morton_ref(x: int, y: int, bits: int = 8) -> int:
    cap = (1 << bits) - 1
    x, y = max(0, min(x, cap)), max(0, min(y, cap))
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zvalue_matches_reference_interleave(spark):
    rows = [(x, y) for x in (0, 1, 5, 37, 255, 300) for y in (0, 2, 9, 128, 255)]
    df = spark.createDataFrame(rows, "x int, y int").withColumn(
        "z", layout.zvalue(F.col("x"), F.col("y"))
    )
    for r in df.collect():
        assert r["z"] == _morton_ref(r["x"], r["y"]), (r["x"], r["y"])


def test_zvalue_locality(spark):
    """Adjacent (x, y) cells land in nearby Z-ranges: the max Z-spread
    of any aligned 2x2 block is bounded (the property file skipping
    relies on)."""
    rows = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(rows, "x int, y int").withColumn(
        "z", layout.zvalue(F.col("x"), F.col("y"), bits=4)
    )
    zmap = {(r["x"], r["y"]): r["z"] for r in df.collect()}
    assert sorted(zmap.values()) == list(range(256))  # bijection
    for bx in range(0, 16, 2):
        for by in range(0, 16, 2):
            blk = [zmap[(bx + i, by + j)] for i in range(2) for j in range(2)]
            assert max(blk) - min(blk) == 3  # aligned quad is contiguous


def test_zvalue_sql_parity(spark):
    """The SQL twin (oracle side) computes the identical Z-value."""
    rows = [(x, y) for x in (0, 3, 77, 255) for y in (1, 31, 200)]
    df = spark.createDataFrame(rows, "x int, y int")
    df.createOrReplaceTempView("zt")
    got = spark.sql(
        f"SELECT x, y, {layout.zvalue_sql('x', 'y').replace('//', ' DIV ')} AS z FROM zt"
    ).collect()
    for r in got:
        assert r["z"] == _morton_ref(r["x"], r["y"])


def test_laplace_noise_deterministic_and_distributed(spark):
    """Same key ⇒ identical noise across calls; across many keys the
    noise is centred near 0 with scale ≈ b (Laplace variance 2b²)."""
    keys = spark.range(2000).select(F.col("id").cast("string").alias("k"))
    b = 2.0
    noised = keys.select(
        "k", privacy.laplace_noise(F.col("k"), b).alias("e")
    )
    again = keys.select(
        "k", privacy.laplace_noise(F.col("k"), b).alias("e2")
    )
    joined = noised.join(again, "k")
    assert joined.filter(F.col("e") != F.col("e2")).count() == 0
    stats = noised.agg(
        F.mean("e").alias("m"), F.variance("e").alias("v")
    ).collect()[0]
    assert abs(stats["m"]) < 0.25  # mean ~0 (se ≈ b·sqrt(2/n) ≈ 0.06)
    assert abs(stats["v"] - 2 * b * b) / (2 * b * b) < 0.25


def test_laplace_noise_sql_parity(spark):
    """Oracle-side noise replays the Spark-side noise bit-for-bit."""
    keys = spark.range(50).select(F.col("id").cast("string").alias("k"))
    keys.createOrReplaceTempView("kt")
    a = {
        r["k"]: r["e"]
        for r in keys.select(
            "k", F.round(privacy.laplace_noise(F.col("k"), 1.5), 6).alias("e")
        ).collect()
    }
    sql_expr = privacy.laplace_noise_sql("k", 1.5)
    # Spark SQL accepts the DuckDB expression modulo the hex-cast idiom
    import duckdb

    con = duckdb.connect()
    b = {
        r[0]: r[1]
        for r in con.execute(
            "SELECT k, round(" + sql_expr + ", 6) FROM "
            "(SELECT CAST(range AS VARCHAR) AS k FROM range(50))"
        ).fetchall()
    }
    assert a == b


def test_hash_uniform_range(spark):
    u = spark.range(1000).select(
        privacy.hash_uniform(F.col("id").cast("string")).alias("u")
    )
    r = u.agg(
        F.min("u").alias("lo"), F.max("u").alias("hi"), F.mean("u").alias("m")
    ).collect()[0]
    assert 0.0 < r["lo"] and r["hi"] < 1.0
    assert abs(r["m"] - 0.5) < 0.05


def test_erase_subject_physically_removes_rows(spark, tmp_path):
    """GDPR right-to-erasure over a versioned table: the subject's rows
    are gone from the current version AND older versions are vacuumed
    so no committed data directory still contains them (erasure beats
    time travel by contract)."""
    import glob
    import os

    import pyarrow.parquet as pq

    from big_data_pr_spark.operators import versioned

    d = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], "user_id int, payload string"
    )
    versioned.write_version(df, d, "load")
    res = privacy.erase_subject(spark, d, "user_id", [1])
    assert res["rows_removed"] == 2
    cur = versioned.read_version(spark, d)
    assert cur.filter(F.col("user_id") == 1).count() == 0
    assert cur.count() == 2
    # no parquet file anywhere under the table still holds user 1
    for p in glob.glob(os.path.join(d, "v*", "*.parquet")):
        t = pq.read_table(p)
        assert 1 not in t.column("user_id").to_pylist(), p
    # the erasure is itself audited in the manifest
    man = versioned.manifest(d)
    assert man["extra"]["erased"] == {"user_id": ["1"]}


def test_pseudonymize_stable_and_salted(spark):
    df = spark.range(100).select(F.col("id").alias("user_id"))
    a = {r[0] for r in df.select(privacy.pseudonymize(F.col("user_id"), "s1")).collect()}
    b = {r[0] for r in df.select(privacy.pseudonymize(F.col("user_id"), "s1")).collect()}
    c = {r[0] for r in df.select(privacy.pseudonymize(F.col("user_id"), "s2")).collect()}
    assert a == b          # stable under the same salt
    assert len(a) == 100   # injective on this domain
    assert a != c          # salt rotation breaks linkage
