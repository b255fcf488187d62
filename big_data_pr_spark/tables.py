"""Fixture-table loaders (driver-provided Parquet, TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet per table under
``/root/testdata/sf{0.001,0.01,0.1}``.

Reads are plain ``spark.read.parquet`` so Catalyst gets full filter
pushdown + column pruning on the scan. No schema inference cost:
parquet carries its schema.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Lazy-PLAN memo (r13): `spark.read.parquet(path)` costs ~210 ms of
# driver time PER CALL on this runtime (file listing + footer schema
# read, uncached by Spark across DataFrameReader calls), and a bench
# pass issues >1000 load() calls — the single largest fixed cost in
# the suite. The memo returns the same immutable DataFrame (a logical
# plan, NO materialized data): every action still scans parquet, so
# nothing about results or the no-result-caching contract changes.
# Keyed by (session, dir, table, file mtime_ns) — a rewritten fixture
# dir (tests overwrite tmp paths) gets a fresh read because the mtime
# moves; a stopped session's entries are never hit because the session
# object itself is part of the key.
_DF_PLAN_MEMO: dict = {}


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame.

    ``events.ts`` has shipped in two parquet flavors across driver
    rounds: INT64 TIMESTAMP(NANOS) (rejected by Spark's vectorized
    reader — we flip ``spark.sql.legacy.parquet.nanosAsLong`` and
    rebuild µs TimestampType, lossless since the data has no
    sub-µs bits) and tz-less ``timestamp[us]`` (read natively as
    TIMESTAMP_NTZ). NTZ is kept as-is: wall-clock semantics match
    DuckDB's naive TIMESTAMP independent of session time zone, and
    the untouched scan column keeps predicate pushdown on ``ts``.
    Epoch extraction goes through ``timeutil`` (NTZ-safe).
    """
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # Let AQE re-partition CACHED plan output (r13, found by the
    # vanilla-ratio sweep): a persisted relation materialized through a
    # shuffle pins its reducer layout, and under a session that leaves
    # spark.sql.shuffle.partitions at the 200 default every
    # track_cache'd signature/edge relation carries 200-partition
    # stages that AQE is FORBIDDEN to coalesce while this conf is
    # false (its default). Interleaved on/off at sf0.01 under the
    # driver's bare session: jaccard_supplier_pairs 3.7→0.6 s,
    # triangle_count_suppliers 5.7→0.8 s, source_overlap 5.2→0.5 s,
    # lexical_semantic_agreement 7.0→1.3 s. Set here (like
    # nanosAsLong) because every registry query funnels through load()
    # and the driver builds its own session we cannot configure.
    spark.conf.set(
        "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"
    )
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        mtime = os.stat(path).st_mtime_ns
    except OSError:
        mtime = None
    key = (spark, sf_dir, name, mtime)
    memo = _DF_PLAN_MEMO.get(key)
    if memo is not None:
        return memo
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            # integer div — float div would lose precision above 2^53 ns
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = spark.read.parquet(path)
    if len(_DF_PLAN_MEMO) > 512:  # test suites churn tmp fixture dirs
        _DF_PLAN_MEMO.clear()
    _DF_PLAN_MEMO[key] = df
    return df


# derived serving views (reference app.py's canned query surface,
# SQL-first): view name -> registry query that defines it
SERVING_VIEWS = {
    "candles_sma": "ohlcv_candles_sma",
    "latest_per_user": "latest_event_per_user",
    "daily_vwap": "vwap_daily",
    "corpus_card": "corpus_profile",
}


def register_views(spark: SparkSession, sf_dir: str, serving: bool = True) -> None:
    """Register every fixture table as a temp view, plus the derived
    serving views (lazy — a view is just its logical plan; nothing runs
    until queried, and Catalyst prunes/pushes through it)."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
    if serving:
        from .queries import REGISTRY

        for view, query in SERVING_VIEWS.items():
            REGISTRY[query].fn(spark, sf_dir).createOrReplaceTempView(view)
