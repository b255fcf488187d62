"""Behavioral tests for the round-4 operators: PII redaction, token
chunking, int8 quantization, partial-aggregate merge (the oracle suite
covers their registry queries; these pin edge-case semantics)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from big_data_pr_spark.operators.incremental import merge_states, partial_state
from big_data_pr_spark.operators.similarity import quantize_int8
from big_data_pr_spark.operators.text import chunk_tokens, redact_pii


def test_redact_pii_masks_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "call 25-989-741-2988 or mail bob@example.com now"),
            (2, "two phones 11-222-333-4444 and 55-666-777-8888"),
            (3, "clean text, nothing to scrub"),
        ],
        "id int, contact string",
    )
    rows = {
        r["id"]: r
        for r in redact_pii(df, "contact").orderBy("id").collect()
    }
    assert rows[1]["n_phone"] == 1 and rows[1]["n_email"] == 1
    assert rows[1]["redacted"] == "call [PHONE] or mail [EMAIL] now"
    assert rows[2]["n_phone"] == 2
    assert rows[2]["redacted"] == "two phones [PHONE] and [PHONE]"
    assert rows[3]["n_phone"] == 0 and rows[3]["n_email"] == 0
    assert rows[3]["redacted"] == "clean text, nothing to scrub"


@pytest.mark.parametrize(
    "n_tokens,window,stride,expected_starts",
    [
        (5, 64, 48, [0]),            # shorter than one window -> 1 chunk
        (64, 64, 48, [0]),           # exactly one window
        (65, 64, 48, [0, 48]),       # one token past -> second chunk
        (100, 64, 48, [0, 48]),      # last chunk [48,100) reaches the end
        (200, 64, 48, [0, 48, 96, 144]),
        (1, 8, 4, [0]),
    ],
)
def test_chunk_tokens_boundaries(spark, n_tokens, window, stride, expected_starts):
    text = " ".join(f"t{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(1, text)], "doc_id int, text string")
    chunks = (
        chunk_tokens(df, "doc_id", "text", window=window, stride=stride)
        .orderBy("chunk_id")
        .collect()
    )
    assert [c["chunk_id"] * stride for c in chunks] == expected_starts
    # every chunk is the exact token slice; the last chunk ends at the doc end
    toks = text.split(" ")
    for c in chunks:
        start = c["chunk_id"] * stride
        expected = toks[start : start + window]
        assert c["chunk"].split(" ") == expected
        assert c["n_chunk_tokens"] == len(expected)
    last = chunks[-1]
    assert last["chunk_id"] * stride + last["n_chunk_tokens"] == n_tokens
    # full coverage: union of chunk ranges is [0, n_tokens)
    covered = set()
    for c in chunks:
        covered.update(range(c["chunk_id"] * stride, c["chunk_id"] * stride + c["n_chunk_tokens"]))
    assert covered == set(range(n_tokens))


def test_quantize_int8_bounds_and_zero_vector(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, -2.0, 0.5, 127.0]),
            (2, [0.0, 0.0, 0.0, 0.0]),
            (3, [-1e-3, 1e-3, 0.0, 5e-4]),
        ],
        "vec_id int, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in quantize_int8(df, "embedding", keep_vec=True).collect()}
    # int8 range respected, max-magnitude element hits ±127
    for vid in (1, 3):
        assert all(-127 <= q <= 127 for q in rows[vid]["q_vec"])
        assert max(abs(q) for q in rows[vid]["q_vec"]) == 127
    # per-element error <= scale/2 (half-up quantization) -> rms too
    for vid in (1, 3):
        assert rows[vid]["rms_err"] <= rows[vid]["scale"] / 2 + 1e-9
    # zero vector: scale 0, all-zero codes, zero error
    assert rows[2]["scale"] == 0.0
    assert rows[2]["q_vec"] == [0, 0, 0, 0]
    assert rows[2]["rms_err"] == 0.0


def test_merge_states_equals_full_recompute(spark):
    df = spark.createDataFrame(
        [(k % 3, float(k * 7 % 11), k) for k in range(200)],
        "key int, value double, seq int",
    )
    aggs = {
        "n": ("count", "*"),
        "total": ("sum", "value"),
        "vmin": ("min", "value"),
        "vmax": ("max", "value"),
    }
    # split on an arbitrary predicate, build partial states, merge
    parts = [
        partial_state(df.filter(F.col("seq") % 4 == i), ["key"], aggs)
        for i in range(4)
    ]
    merged = {r["key"]: r for r in merge_states(parts, ["key"], aggs).collect()}
    full = {r["key"]: r for r in partial_state(df, ["key"], aggs).collect()}
    assert merged.keys() == full.keys()
    for k in full:
        for c in ("n", "vmin", "vmax"):
            assert merged[k][c] == full[k][c]
        assert merged[k]["total"] == pytest.approx(full[k]["total"], rel=1e-12)


def test_approx_percentiles_close_to_exact(spark, sf_dir):
    """The mergeable-sketch path (percentile_approx, accuracy 10000) must
    track the exact interpolated percentiles within the sketch's rank
    guarantee — at fixture scale the ranks are exact for p50."""
    from big_data_pr_spark.queries import REGISTRY

    approx = {
        r["event_type"]: r
        for r in REGISTRY["approx_value_percentiles"].fn(spark, sf_dir).collect()
    }
    ev = REGISTRY["value_percentiles"].fn(spark, sf_dir).collect()
    exact = {r["event_type"]: r for r in ev}
    assert approx.keys() == exact.keys()
    for k in exact:
        # exact query emits p25/p50/p75 interpolated; GK sketch returns a
        # real data point within eps ranks — compare loosely (1% of range)
        spread = exact[k]["p90"] - exact[k]["p25"] + 1e-9
        for p in ("p25", "p50", "p90"):
            assert abs(approx[k][p] - exact[k][p]) <= max(0.05 * spread, 1e-6), (
                k, p, approx[k][p], exact[k][p])


def test_weighted_sample_deterministic_and_monotone(spark):
    from big_data_pr_spark.operators.sampling import weighted_sample

    df = spark.createDataFrame(
        [(i, 1.0 if i % 2 else 0.0) for i in range(400)],
        "doc_id int, w double",
    )
    kept = weighted_sample(df, "w", rate_scale=1.0)
    ids1 = sorted(r["doc_id"] for r in kept.collect())
    ids2 = sorted(r["doc_id"] for r in kept.collect())
    assert ids1 == ids2  # deterministic across executions
    assert all(i % 2 == 1 for i in ids1)  # weight 0 -> never kept
    assert len(ids1) == 200  # weight 1 -> always kept (p*65536 > any bucket)
    # halving the scale keeps a subset of the full sample
    half = sorted(
        r["doc_id"] for r in weighted_sample(df, "w", rate_scale=0.5).collect()
    )
    assert set(half) <= set(ids1)
    assert 40 <= len(half) <= 160  # ~100 expected, generous binomial bounds
