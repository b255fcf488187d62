"""Streaming Wald SPRT monitor — an anytime-valid A/B decision folded
over an unbounded event stream, exactly-once, with a latched verdict.

The batch query (queries/risk_queries.sprt_purchase_rate) replays the
whole history per run; a live rollout wants the same sequential test
updated per micro-batch with O(1) state. Each trigger adds the batch's
binomial log-likelihood-ratio increment

    k * ln(p1/p0) + (n - k) * ln((1-p1)/(1-p0))

to the running LLR and compares it to the Wald boundaries
A = ln((1-beta)/alpha), B = ln(beta/(1-alpha)). Sequential-test
semantics REQUIRE the decision to latch: once a boundary is crossed
the test has stopped, and later data must not un-decide it (that is
what makes the error rates alpha/beta valid). The latch also makes the
monitor robust to post-decision drift.

State = one row (cumulative LLR, totals, decision) committed as an
MVCC version with the epoch id in the manifest — the topk_sink
pattern: a crash-replayed micro-batch sees its epoch already committed
and no-ops, so at-least-once delivery folds exactly once.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators import versioned

_STATE_SCHEMA = (
    "cum_llr double, n_total long, k_total long, decision string"
)


def fold_batch(
    batch_df: DataFrame,
    epoch_id: int,
    success_col: str,
    state_dir: str,
    p0: float,
    p1: float,
    alpha: float = 0.05,
    beta: float = 0.05,
) -> None:
    """Fold one micro-batch of boolean/0-1 ``success_col`` trials into
    the sequential test state. Public so replay semantics and the latch
    are directly testable."""
    if batch_df.isEmpty():
        return
    spark = batch_df.sparkSession
    cur = versioned.current_version(state_dir)
    llr_prev, n_prev, k_prev, decision = 0.0, 0, 0, "continue"
    if cur is not None:
        extra = versioned.manifest(state_dir).get("extra", {})
        if epoch_id <= extra.get("epoch_id", -1):
            return  # crash-replayed micro-batch: already folded
        row = versioned.read_version(spark, state_dir).collect()[0]
        llr_prev, n_prev, k_prev = row["cum_llr"], row["n_total"], row["k_total"]
        decision = row["decision"]
    agg = batch_df.agg(
        F.count("*").cast("long").alias("n"),
        F.sum(F.col(success_col).cast("int")).cast("long").alias("k"),
    ).collect()[0]
    n, k = agg["n"], agg["k"]
    llr = (
        llr_prev
        + k * math.log(p1 / p0)
        + (n - k) * math.log((1 - p1) / (1 - p0))
    )
    hi = math.log((1 - beta) / alpha)
    lo = math.log(beta / (1 - alpha))
    if decision == "continue":  # a crossed boundary latches forever
        if llr >= hi:
            decision = "accept_h1"
        elif llr <= lo:
            decision = "accept_h0"
    state = spark.createDataFrame(
        [(llr, n_prev + n, k_prev + k, decision)], _STATE_SCHEMA
    )
    versioned.write_version(
        state,
        state_dir,
        note=f"epoch {epoch_id}",
        extra={"epoch_id": epoch_id, "p0": p0, "p1": p1},
    )


def start_sprt_stream(
    stream: DataFrame,
    success_col: str,
    state_dir: str,
    checkpoint_dir: str,
    p0: float,
    p1: float,
    alpha: float = 0.05,
    beta: float = 0.05,
    trigger: str | None = None,
) -> StreamingQuery:
    """Maintain the sequential test at ``state_dir`` over a stream of
    trials. ``trigger`` is a processingTime string; ``None`` ->
    availableNow (drain-and-stop)."""

    def fold(batch_df: DataFrame, epoch_id: int) -> None:
        fold_batch(
            batch_df, epoch_id, success_col, state_dir, p0, p1, alpha, beta
        )

    trig = {"processingTime": trigger} if trigger else {"availableNow": True}
    return (
        stream.writeStream.outputMode("update")
        .foreachBatch(fold)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**trig)
        .start()
    )
