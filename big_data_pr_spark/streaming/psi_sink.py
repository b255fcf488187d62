"""Streaming PSI drift monitor — per-micro-batch population-stability
index against a reference distribution pinned at the first epoch,
exactly-once.

The batch query (queries/stat_queries.psi_value_drift) splits one
static table into early/late halves; a live feed wants the same
question continuously: "does THIS micro-batch still look like the
distribution we validated on?" The first epoch freezes the reference:
its equi-width bin proportions AND the bin edges commit into the
versioned state, so every later epoch is scored against the same
yardstick (re-deriving edges per batch would hide drift inside the
re-binning). Each subsequent trigger computes

    PSI = sum_bins (p_cur - p_ref) * ln(p_cur / p_ref)

with epsilon-floored proportions, appends the per-epoch PSI to the
state, and raises the standard alarm at PSI > 0.2 (industry rule of
thumb: < 0.1 stable, 0.1-0.2 drifting, > 0.2 action).

State = the B reference bins + a one-row summary (latest PSI, alarm
streak) per version, epoch id in the manifest — the topk_sink /
sprt_sink exactly-once pattern: a crash-replayed micro-batch sees its
epoch already committed and no-ops.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators import versioned

_EPS = 1e-6


def _bin_props(
    batch_df: DataFrame, value_col: str, lo: float, hi: float, bins: int
) -> list[float]:
    width = (hi - lo) / bins
    binned = batch_df.select(
        F.least(
            F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int"),
            F.lit(bins - 1),
        ).alias("bin")
    )
    counts = {
        r["bin"]: r["c"]
        for r in binned.groupBy("bin").agg(F.count("*").alias("c")).collect()
    }
    total = max(1, sum(counts.values()))
    return [counts.get(b, 0) / total for b in range(bins)]


def fold_batch(
    batch_df: DataFrame,
    epoch_id: int,
    value_col: str,
    state_dir: str,
    bins: int = 10,
    alarm_at: float = 0.2,
) -> None:
    """Fold one micro-batch into the drift state. Public for direct
    testing of the reference pin, the PSI math, and replay no-ops."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    cur = versioned.current_version(state_dir)
    if cur is not None:
        extra = versioned.manifest(state_dir).get("extra", {})
        if epoch_id <= extra.get("epoch_id", -1):
            return  # crash-replayed micro-batch
        lo, hi = extra["lo"], extra["hi"]
        ref = [
            r["p_ref"]
            for r in versioned.read_version(spark, state_dir)
            .orderBy("bin")
            .collect()
        ]
        p_cur = _bin_props(batch_df, value_col, lo, hi, bins)
        psi = sum(
            (max(c, _EPS) - max(r, _EPS))
            * math.log(max(c, _EPS) / max(r, _EPS))
            for c, r in zip(p_cur, ref)
        )
        streak = extra.get("alarm_streak", 0)
        streak = streak + 1 if psi > alarm_at else 0
        state = spark.createDataFrame(
            [(b, ref[b]) for b in range(bins)], "bin int, p_ref double"
        )
        versioned.write_version(
            state,
            state_dir,
            note=f"epoch {epoch_id}",
            extra={
                "epoch_id": epoch_id,
                "lo": lo,
                "hi": hi,
                "psi": psi,
                "alarm": psi > alarm_at,
                "alarm_streak": streak,
            },
        )
        return
    # first epoch: freeze the reference distribution AND its bin edges
    agg = batch_df.agg(
        F.min(value_col).alias("lo"), F.max(value_col).alias("hi")
    ).collect()[0]
    lo, hi = float(agg["lo"]), float(agg["hi"])
    if hi <= lo:
        hi = lo + 1.0
    ref = _bin_props(batch_df, value_col, lo, hi, bins)
    state = spark.createDataFrame(
        [(b, ref[b]) for b in range(bins)], "bin int, p_ref double"
    )
    versioned.write_version(
        state,
        state_dir,
        note=f"epoch {epoch_id} (reference)",
        extra={
            "epoch_id": epoch_id,
            "lo": lo,
            "hi": hi,
            "psi": 0.0,
            "alarm": False,
            "alarm_streak": 0,
        },
    )


def start_psi_stream(
    stream: DataFrame,
    value_col: str,
    state_dir: str,
    checkpoint_dir: str,
    bins: int = 10,
    alarm_at: float = 0.2,
    trigger: str | None = None,
) -> StreamingQuery:
    """Monitor ``stream[value_col]`` drift at ``state_dir``. ``trigger``
    is a processingTime string; ``None`` -> availableNow."""

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        fold_batch(batch_df, epoch_id, value_col, state_dir, bins, alarm_at)

    trig = {"processingTime": trigger} if trigger else {"availableNow": True}
    return (
        stream.writeStream.outputMode("update")
        .foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**trig)
        .start()
    )
