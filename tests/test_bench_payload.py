"""Tail-order guard for the bench payload (r11 verdict #2).

The driver records only the TAIL of bench.py's stdout, so the printed
JSON must end with the summary scalars — ``"value"`` last. The r6 fix
ordered the literal dict that way, but the carry-forward of the static
``streaming_sustained*`` records (tools/stream_probe.py output) was
appended AFTER construction, so the tail ended inside unchanged static
content and BENCH_r10/BENCH_r11 parsed as null. assemble_payload() now
owns the ordering; this test pins it against both regressions.
"""

import json

import bench


def _payload(prev):
    return bench.assemble_payload(
        {"q1": 1.0, "q2": 2.0},
        {"q1": 1.1, "q2": 2.1},
        {"parse": 0.5},
        prev,
        stream_rps=1000.0,
        fit_secs={"gbt_fit_sec": 3.0},
        recalls={"recall_lsh_pair": 0.9},
        load_start=1.0,
        total=3.0,
        sf="0.1",
    )


def test_value_is_last_key_without_carry_forward():
    assert list(_payload({}))[-1] == "value"


def test_value_is_last_key_with_carried_sustained_records():
    prev = {
        "streaming_sustained": {"rows_per_sec": 90000, "secs": 60},
        "streaming_sustained_bootstrap": {"rows_per_sec": 80000},
        "value": 999.0,  # stale scalar from last round must NOT carry
    }
    payload = _payload(prev)
    keys = list(payload)
    assert keys[-1] == "value"
    assert payload["value"] == 3.0
    # carried records present, but BEFORE every summary scalar
    assert keys.index("streaming_sustained") < keys.index("streaming_rows_per_sec")
    assert keys.index("streaming_sustained_bootstrap") < keys.index("metric")


def test_printed_tail_ends_with_value_scalar():
    """The driver greps the tail for '\"value\":' — simulate the dump."""
    prev = {"streaming_sustained": {"rows_per_sec": 90000}}
    text = json.dumps(_payload(prev))
    tail = text[-60:]
    assert '"value": 3.0' in tail and text.rstrip().endswith("}")


def test_big_dicts_first_and_sorted():
    payload = _payload({})
    keys = list(payload)
    assert keys[:3] == ["queries", "queries_median", "streaming_breakdown"]
    assert list(payload["queries"]) == sorted(payload["queries"])


def test_canary_keys_before_value():
    payload = bench.assemble_payload(
        {"q": 1.0}, {"q": 1.0}, {}, {},
        stream_rps=1.0, fit_secs={}, recalls={},
        load_start=0.0, total=1.0, sf="0.1",
        canary={"canary_python_sec": 0.5, "canary_blas_sec": 0.1},
    )
    keys = list(payload)
    assert keys[-1] == "value"
    assert keys.index("canary_python_sec") < keys.index("loadavg_start")


def test_host_adjusted_total():
    """r12 verdict #3: the canary-normalized headline. Same-speed host
    → identity; 2x-slower canaries → total halved; clamp keeps a
    pathological canary from inverting the headline; missing canary →
    None (and the raw value is untouched either way)."""
    ref = dict(bench.CANARY_REF)
    assert bench.host_adjusted_total(100.0, ref) == 100.0
    slow = {k: v * 2 for k, v in ref.items()}
    assert bench.host_adjusted_total(100.0, slow) == 50.0
    absurd = {k: v * 100 for k, v in ref.items()}
    assert bench.host_adjusted_total(100.0, absurd) == round(100.0 / 3.0, 3)
    assert bench.host_adjusted_total(100.0, None) is None
    assert bench.host_adjusted_total(100.0, {}) is None
    payload = bench.assemble_payload(
        {"q": 1.0}, {"q": 1.0}, {}, {},
        stream_rps=1.0, fit_secs={}, recalls={},
        load_start=0.0, total=100.0, sf="0.1",
        canary={k: v * 2 for k, v in ref.items()},
    )
    keys = list(payload)
    assert keys[-2:] == ["value_host_adj", "value"]
    assert payload["value_host_adj"] == 50.0 and payload["value"] == 100.0


def test_host_canary_shape():
    c = bench.host_canary()
    assert set(c) == {"canary_python_sec", "canary_blas_sec"}
    # positivity + finiteness only — a hard wall-clock ceiling flakes
    # on a heavily stolen/overloaded host (r12 ADVICE #5)
    assert all(0 < v < float("inf") for v in c.values())
