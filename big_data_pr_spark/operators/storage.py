"""Storage-layout operators: bucketed and partitioned writes.

The two physical-layout levers that matter at 100 TB:

- **Hash bucketing** (`write_bucketed`): pre-shuffle a fact table ONCE
  at write time into N buckets on its join/agg key. Every later
  equi-join or groupBy on that key between same-bucketed tables reads
  co-located buckets and skips the Exchange entirely — the shuffle is
  amortized across every downstream query (verified by plan assertion
  in tests/test_plans.py::test_bucketed_join_no_shuffle). Spark
  bucketing requires the table catalog (``saveAsTable``); plain
  ``.parquet(path)`` writes cannot record bucket metadata.
- **Date/key partitioning** (`write_partitioned`): directory-level
  partition values that Catalyst prunes from scans when a query
  filters on the partition column (the reference's daily
  ``chartdata-YYYY-MM-DD`` indices, SURVEY §2.1 S9) — and the unit of
  cheap retention drops (T9, streaming/pipeline.py::apply_retention).

Bucket-count sizing: aim for (table size / n_buckets) ≈ 128-512 MB per
bucket file per partition; too few buckets caps parallelism, too many
makes small files.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as an external bucketed (and optionally
    sort-within-bucket) parquet table registered as ``table``.

    Sorting within buckets additionally lets sort-merge joins skip the
    per-task Sort, not just the Exchange."""
    writer = (
        df.write.mode(mode)
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — preserves bucketing metadata (a plain
    ``spark.read.parquet(path)`` of the same files would NOT)."""
    return spark.table(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: Sequence[str],
    mode: str = "overwrite",
) -> None:
    """Directory-partitioned parquet write; queries filtering on
    ``partition_cols`` prune at the file index (PartitionFilters in the
    scan node), and retention = dropping directories."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
