"""SparkSession factory with scale-appropriate defaults.

The reference pinned ``spark.sql.shuffle.partitions=4`` and UTC
session time zone (reference ``batch_processor.py:38,45``); we keep
the UTC pin (required for DuckDB-oracle comparability) but replace
the fixed shuffle constant with AQE coalescing, which is the right
answer at both local and 1000-executor scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "big_data_pr_spark",
    cpus: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession.

    Defaults chosen for correctness + scale:

    - AQE on (runtime partition coalescing, skew-join splitting,
      dynamic join-strategy switch) — at 100 TB this replaces any
      hand-tuned ``shuffle.partitions`` constant.
    - UTC session TZ so event-time semantics are absolute.
    - Arrow enabled for the pandas-UDF slow path.
    """
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # cached-plan output may be AQE-re-partitioned (see tables.load
        # for the measured rationale; set here too so non-load entry
        # points share it)
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
