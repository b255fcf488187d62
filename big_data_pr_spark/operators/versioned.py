"""Versioned parquet tables — Delta-less MVCC with time travel.

The staging-swap writers (``storage.compact``, ``cdc.apply_changes``)
still have a two-rename window where a concurrent reader can miss the
table. This module removes the race the way real table formats do:

- every write lands in a NEW immutable version directory ``v{N}``;
- commit is ONE atomic rename of a tiny pointer file (``_LATEST``);
- readers resolve the pointer once, then read an immutable directory —
  a write can never change data under a running scan;
- old versions stay readable (time travel / reproducible pipelines)
  until ``vacuum`` drops them, and the current version is never
  vacuumable.

Scale posture: data directories are written by the cluster like any
parquet output; the version manifest and pointer are O(bytes) driver
metadata. Pointer atomicity relies on ``os.rename`` — local
filesystems and HDFS; on S3-class object stores this pointer swap is
exactly the step Delta's log / Iceberg's catalog performs with a
conditional put, so the design carries over, only the commit primitive
changes.

Capability parity note: generalizes the reference's full-overwrite
refresh (batch_processor.py writes each day's chartdata index anew)
into retained, queryable history.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_LATEST"
_MANIFESTS = "_versions"


def _vdir(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, f"v{version:06d}")


def current_version(table_dir: str) -> int | None:
    """Version the pointer names, or None for an empty table."""
    try:
        with open(os.path.join(table_dir, _POINTER)) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return None


def versions(table_dir: str) -> list[dict]:
    """All committed version manifests, oldest first."""
    mdir = os.path.join(table_dir, _MANIFESTS)
    if not os.path.isdir(mdir):
        return []
    out = []
    for name in sorted(os.listdir(mdir)):
        if name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                out.append(json.load(f))
    return out


def manifest(table_dir: str, version: int | None = None) -> dict:
    """The manifest of ``version`` (default: the committed latest)."""
    ver = version if version is not None else current_version(table_dir)
    if ver is None:
        raise FileNotFoundError(f"no committed version at {table_dir}")
    with open(os.path.join(table_dir, _MANIFESTS, f"v{ver:06d}.json")) as f:
        return json.load(f)


def write_version(
    df: DataFrame, table_dir: str, note: str = "", extra: dict | None = None
) -> int:
    """Commit ``df`` as the next version of the table; returns the new
    version number. The data write is fully distributed; the commit is
    the atomic pointer rename at the end — a crash before it leaves the
    table at the previous version with an orphan directory (re-runnable,
    never corrupt).

    ``extra`` rides inside the version manifest, so caller metadata
    (e.g. a refresh watermark) commits atomically WITH the data — state
    and metadata can never diverge across a crash (the Delta/Iceberg
    txn-metadata pattern)."""
    os.makedirs(os.path.join(table_dir, _MANIFESTS), exist_ok=True)
    ver = (current_version(table_dir) or 0) + 1
    data_dir = _vdir(table_dir, ver)
    df.write.mode("overwrite").parquet(data_dir)
    manifest = {
        "version": ver,
        "committed_at": time.time(),
        "note": note,
        "schema": df.schema.simpleString(),
        **({"extra": extra} if extra else {}),
    }
    with open(
        os.path.join(table_dir, _MANIFESTS, f"v{ver:06d}.json"), "w"
    ) as f:
        json.dump(manifest, f)
    tmp = os.path.join(table_dir, f"{_POINTER}.tmp")
    with open(tmp, "w") as f:
        f.write(str(ver))
    os.rename(tmp, os.path.join(table_dir, _POINTER))
    return ver


def read_version(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read the table at ``version`` (default: the committed latest).
    The returned DataFrame is pinned to an immutable directory — later
    commits cannot change what this scan reads."""
    ver = version if version is not None else current_version(table_dir)
    if ver is None:
        raise FileNotFoundError(f"no committed version at {table_dir}")
    data_dir = _vdir(table_dir, ver)
    if not os.path.isdir(data_dir):
        raise FileNotFoundError(
            f"version {ver} of {table_dir} was vacuumed or never committed"
        )
    return spark.read.parquet(data_dir)


def merge_version(
    spark: SparkSession,
    table_dir: str,
    changes: DataFrame,
    key_col: str,
    seq_col: str,
    op_col: str = "op",
    note: str = "",
) -> int:
    """CDC MERGE as a new version: latest version + changeset → next
    version (cdc.merge_changes semantics: last-wins, D deletes,
    idempotent replay produces an identical-content new version).
    History stays queryable — ``snapshot diff`` between versions is a
    plain table_diff of two reads."""
    from .cdc import latest_changes, merge_changes

    cur = current_version(table_dir)
    if cur is None:
        from pyspark.sql import functions as F

        base = latest_changes(changes, key_col, seq_col, op_col).filter(
            F.col(op_col) != "D"
        ).drop(op_col, seq_col)
        return write_version(base, table_dir, note or "initial load")
    target = read_version(spark, table_dir, cur)
    merged = merge_changes(target, changes, key_col, seq_col, op_col)
    return write_version(merged, table_dir, note or f"merge onto v{cur}")


def vacuum(table_dir: str, keep_last: int = 2) -> list[int]:
    """Drop version data directories older than the newest
    ``keep_last`` (manifests are kept — history metadata survives).
    The current version is always retained. Returns dropped versions."""
    cur = current_version(table_dir)
    if cur is None:
        return []
    committed = [v["version"] for v in versions(table_dir)]
    keep = set(sorted(committed)[-max(keep_last, 1) :]) | {cur}
    dropped = []
    for v in committed:
        if v in keep:
            continue
        d = _vdir(table_dir, v)
        if os.path.isdir(d):
            shutil.rmtree(d)
            dropped.append(v)
    return dropped


def optimize_version(
    spark: SparkSession,
    table_dir: str,
    zorder_cols: list[str] | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
    note: str = "",
) -> int:
    """Delta-style OPTIMIZE [ZORDER BY] as a version commit: rewrite
    the current version into ~``target_file_bytes`` files — plain
    bin-packing, or Morton-clustered on ``zorder_cols`` so every listed
    column's row-group stats prune (storage.zorder_column) — and commit
    the result as the NEXT version. Readers of the old layout are
    untouched (immutable dirs); the pointer flip publishes the
    optimized layout atomically. Content is identical by construction;
    only the physical layout changes."""
    import math

    cur = current_version(table_dir)
    if cur is None:
        raise FileNotFoundError(f"no committed version at {table_dir}")
    data_dir = _vdir(table_dir, cur)
    total = sum(
        os.path.getsize(os.path.join(data_dir, f))
        for f in os.listdir(data_dir)
        if f.endswith(".parquet")
    )
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = read_version(spark, table_dir, cur)
    if zorder_cols:
        from .storage import zorder_column

        df = (
            zorder_column(df, zorder_cols)
            .repartitionByRange(n_out, "__z")
            .sortWithinPartitions("__z")
            .drop("__z")
        )
    else:
        df = df.coalesce(n_out)
    return write_version(
        df,
        table_dir,
        note or f"optimize v{cur}"
        + (f" zorder={','.join(zorder_cols)}" if zorder_cols else ""),
    )
