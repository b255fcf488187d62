"""Continuous aggregates — incrementally refreshed materialized views.

TimescaleDB-style continuous aggregates on Spark primitives, composing
two operators this repo already certifies:

- the per-key partial-aggregate state merge (``incremental.py`` —
  any commutative monoid: count/sum/min/max), and
- MVCC versioned commits (``versioned.py`` — atomic pointer swap, so
  a refresh never tears a reader, and the MV's own history stays
  queryable).

This is exactly the reference's operating shape done right: its cron
re-runs the FULL batch job hourly over all CSVs (run_batch_processor.sh
+ batch_processor.py re-reads everything, upsert making it merely
idempotent); a continuous aggregate folds only the NEW rows into
|keys|-sized state, so the hourly cost is O(delta), not O(history).

Refresh protocol:
1. read the stored high watermark (epoch µs of the watermark column);
2. filter the source to rows STRICTLY ABOVE it — at scale this prunes
   by partition/row-group stats, so the history is never rescanned;
3. partial-aggregate the delta (one |keys|-bounded shuffle);
4. merge with the current state (second-level monoid aggregate);
5. commit state + new watermark as ONE new version (atomic; crash
   before the pointer swap leaves the old version intact — re-running
   the refresh re-reads the same delta, and the merge is idempotent
   because the previous state version is untouched).

Late data BELOW the watermark is by definition not folded; pair the MV
with an ingest-time watermark delay (hold back the newest W minutes)
or trigger a bounded backfill refresh — same contract as any
watermarked streaming aggregate (SCALE.md §Streaming).
"""

from __future__ import annotations

import json
import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..timeutil import epoch_micros
from . import incremental, versioned

_META = "_mv.json"


def _meta_path(mv_dir: str) -> str:
    return os.path.join(mv_dir, _META)


def _read_meta(mv_dir: str) -> dict:
    with open(_meta_path(mv_dir)) as f:
        return json.load(f)


def _write_meta(mv_dir: str, meta: dict) -> None:
    tmp = _meta_path(mv_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.rename(tmp, _meta_path(mv_dir))


def _current_watermark(mv_dir: str, meta: dict) -> int:
    """Watermark of the CURRENT committed version. Lives in the version
    manifest (committed by the same atomic pointer swap as the state);
    falls back to legacy _mv.json for MVs created before the manifest
    carried it."""
    man = versioned.manifest(mv_dir)
    extra = man.get("extra") or {}
    if "watermark_us" in extra:
        return int(extra["watermark_us"])
    return int(meta["watermark_us"])


def create(
    source: DataFrame,
    mv_dir: str,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    watermark_col: str,
) -> int:
    """Materialize the view from the current source contents and record
    the high watermark. ``aggs`` as in ``incremental.partial_state``."""
    os.makedirs(mv_dir, exist_ok=True)
    wm_row = source.agg(
        F.max(epoch_micros(F.col(watermark_col))).alias("wm")
    ).collect()[0]
    wm = int(wm_row["wm"]) if wm_row["wm"] is not None else -1
    state = incremental.partial_state(source, list(keys), aggs)
    # The watermark commits atomically WITH the state (inside the
    # version manifest the pointer swap publishes); _mv.json holds only
    # the static view definition, so a crash between any two steps can
    # never pair new state with a stale watermark (or vice versa).
    v = versioned.write_version(
        state, mv_dir, note=f"create wm={wm}", extra={"watermark_us": wm}
    )
    _write_meta(
        mv_dir,
        {
            "keys": list(keys),
            "aggs": {k: list(v_) for k, v_ in aggs.items()},
            "watermark_col": watermark_col,
        },
    )
    return v


def refresh(spark: SparkSession, mv_dir: str, source: DataFrame) -> dict:
    """Fold rows above the stored watermark into the state; commit as a
    new version. Returns refresh metrics (no-op ⇒ no new version)."""
    meta = _read_meta(mv_dir)
    aggs = {k: tuple(v) for k, v in meta["aggs"].items()}
    wm_col = meta["watermark_col"]
    old_wm = _current_watermark(mv_dir, meta)
    delta = source.filter(epoch_micros(F.col(wm_col)) > F.lit(old_wm))
    stats = delta.agg(
        F.count(F.lit(1)).alias("n"),
        F.max(epoch_micros(F.col(wm_col))).alias("wm"),
    ).collect()[0]
    if stats["n"] == 0:
        return {
            "refreshed": False,
            "delta_rows": 0,
            "version": versioned.current_version(mv_dir),
        }
    delta_state = incremental.partial_state(delta, meta["keys"], aggs)
    current = versioned.read_version(spark, mv_dir)
    merged = incremental.merge_states(
        [current, delta_state], meta["keys"], aggs
    )
    new_wm = int(stats["wm"])
    # State + watermark commit in ONE atomic pointer swap: a crash at
    # any point leaves the previous (state, watermark) pair current, so
    # the replayed refresh re-folds exactly the same delta once —
    # never double-counts (the exactly-once property matview_sink's
    # crash-replay relies on).
    v = versioned.write_version(
        merged,
        mv_dir,
        note=f"refresh wm={new_wm}",
        extra={"watermark_us": new_wm},
    )
    return {"refreshed": True, "delta_rows": int(stats["n"]), "version": v}


def read(spark: SparkSession, mv_dir: str) -> DataFrame:
    """Current MV contents (older versions via versioned.read_version)."""
    return versioned.read_version(spark, mv_dir)
