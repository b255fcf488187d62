"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`big_data_pr_spark.queries` — the registry is
the single source of truth for every implemented operator from
SURVEY.md §2 (plus the training-data-pipeline extensions), each wired
to both a Spark implementation and a DuckDB oracle SQL string.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, _REPO_DIR)
# Propagate to executor python workers (effective when the JVM starts
# after this import; registry queries also avoid module-level UDF
# references so they run under any session).
os.environ["PYTHONPATH"] = _REPO_DIR + os.pathsep + os.environ.get("PYTHONPATH", "")

from big_data_pr_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    events → hourly OHLCV candles → trailing SMA-7/SMA-30 per symbol —
    the reference's batch pipeline shape (batch_processor.py steps 2-9).
    """
    return REGISTRY["ohlcv_candles_sma"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted → rows-only)."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
