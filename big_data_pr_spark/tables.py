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
# Keyed by (session, dir, table, newest mtime_ns of the .parquet dir
# and its immediate entries) — a rewritten fixture dir (tests
# overwrite tmp paths) gets a fresh read because Spark's overwrite
# recreates the dir AND its part files, moving both mtimes; the one
# remaining blind spot is a byte-level in-place rewrite of a part
# file's CONTENT with a back-dated mtime, which nothing in this repo
# does. A stopped session's entries are never hit because the session
# object itself is part of the key.
_DF_PLAN_MEMO: dict = {}

# Sessions whose reader confs have been applied (r14: the two
# spark.conf.set calls cost a py4j round trip each, >2000 per bench
# pass when issued per load() call — hoisted to once per session).
# id() keys with the session kept in the memo keys above would leak
# across id reuse after GC; the set is tiny and cleared with the memo.
_SESSION_CONFD: dict = {}


def _fixture_mtime(path: str) -> int | None:
    """Newest mtime_ns among *path* and its immediate entries (a
    parquet 'file' is a directory of part files when Spark wrote it)."""
    try:
        newest = os.stat(path).st_mtime_ns
    except OSError:
        return None
    try:
        with os.scandir(path) as it:
            for e in it:
                try:
                    m = e.stat().st_mtime_ns
                except OSError:
                    continue
                if m > newest:
                    newest = m
    except (OSError, NotADirectoryError):
        pass
    return newest


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
    # Session confs, once per session and BEFORE the memo lookup (r14,
    # ADVICE: a memo hit must execute under the same reader config the
    # plan was built with; hoisting also drops ~2 py4j round trips from
    # every subsequent load() call — >2000 per bench pass).
    if spark not in _SESSION_CONFD:
        # Let AQE re-partition CACHED plan output (r13, found by the
        # vanilla-ratio sweep): a persisted relation materialized
        # through a shuffle pins its reducer layout, and under a
        # session that leaves spark.sql.shuffle.partitions at the 200
        # default every track_cache'd signature/edge relation carries
        # 200-partition stages that AQE is FORBIDDEN to coalesce while
        # this conf is false (its default). Interleaved on/off at
        # sf0.01 under the driver's bare session:
        # jaccard_supplier_pairs 3.7→0.6 s, triangle_count_suppliers
        # 5.7→0.8 s, source_overlap 5.2→0.5 s,
        # lexical_semantic_agreement 7.0→1.3 s. Set here because every
        # registry query funnels through load() and the driver builds
        # its own session we cannot configure.
        spark.conf.set(
            "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true"
        )
        # events.ts INT64 TIMESTAMP(NANOS) flavor needs the legacy
        # reader flag at both plan AND execution time — set for the
        # whole session so memoized events plans always execute under
        # it (ADVICE r13).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        _SESSION_CONFD[spark] = True
        if len(_SESSION_CONFD) > 64:  # test suites churn sessions
            live = {spark}
            _SESSION_CONFD.clear()
            _SESSION_CONFD[next(iter(live))] = True
    path = os.path.join(sf_dir, f"{name}.parquet")
    mtime = _fixture_mtime(path)
    key = (spark, sf_dir, name, mtime)
    memo = _DF_PLAN_MEMO.get(key)
    if memo is not None:
        return memo
    if name == "events":
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
