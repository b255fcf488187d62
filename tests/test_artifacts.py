"""Restricted-unpickler loading of the reference's real MinMaxScaler
artifacts (r6 verdict #5): sklearn/joblib are absent from the
container, so the loader must recover the fitted parameters from the
joblib pickle bytes alone — and refuse any global outside the
allowlist."""

from __future__ import annotations

import io
import os
import pickle

import numpy as np
import pytest

from big_data_pr_spark.ohlcv.artifacts import (
    MinMaxScalerParams,
    _RestrictedJoblibUnpickler,
    load_minmax_scaler,
)

REF_MODELS = "/root/reference/trained_models"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_MODELS), reason="reference artifacts not present"
)


@pytest.mark.parametrize("sym", ["BTC", "ETH"])
def test_reference_scaler_loads_and_is_consistent(sym):
    s = load_minmax_scaler(f"{REF_MODELS}/{sym}_USDT_scaler.pkl")
    assert s.n_features_in_ == 1
    assert s.feature_range == (0, 1)
    assert s.n_samples_seen_ > 0
    # sklearn invariants: scale_ = 1/(data_max-data_min),
    # min_ = -data_min*scale_ for feature_range (0,1)
    span = s.data_max_ - s.data_min_
    assert np.allclose(s.scale_, 1.0 / span)
    assert np.allclose(s.min_, -s.data_min_ * s.scale_)


def test_btc_scaler_transform_fixture():
    """Pin the BTC artifact's learned endpoints so a silently changed
    or mis-decoded payload fails loudly (values read from the real
    pickle: data_min_=49804.0, data_max_=111780.84, n=9000)."""
    s = load_minmax_scaler(f"{REF_MODELS}/BTC_USDT_scaler.pkl")
    assert s.data_min_[0] == pytest.approx(49804.0)
    assert s.data_max_[0] == pytest.approx(111780.84)
    assert s.n_samples_seen_ == 9000
    x = np.array([[49804.0], [111780.84], [80792.42]])
    t = s.transform(x)
    assert t.ravel() == pytest.approx([0.0, 1.0, 0.5], abs=1e-9)
    assert s.inverse_transform(t).ravel() == pytest.approx(x.ravel())


def test_scaler_plugs_into_recursive_forecast():
    from big_data_pr_spark.ohlcv.forecast import recursive_forecast

    s = load_minmax_scaler(f"{REF_MODELS}/ETH_USDT_scaler.pkl")
    closes = [2000.0, 2010.0, 2020.0, 2030.0, 2040.0]
    preds = recursive_forecast(closes, last_ts_ms=0, steps=3, scaler=s)
    assert len(preds) == 3
    # DriftModel sees scaled inputs; inverse-transform must land the
    # prediction back in price space near the window
    for _, p in preds:
        assert 1500 < p < 2500


def test_disallowed_global_is_rejected():
    evil = pickle.dumps(os.system)
    with pytest.raises(pickle.UnpicklingError, match="not in the restricted"):
        _RestrictedJoblibUnpickler(io.BytesIO(evil)).load()


def test_object_dtype_payload_rejected():
    class W:  # emulate a wrapper state for an object-dtype array
        pass

    from big_data_pr_spark.ohlcv.artifacts import _NumpyArrayWrapper

    w = _NumpyArrayWrapper()
    w.shape = (1,)
    w.order = "C"
    w.dtype = np.dtype("O")
    w.numpy_array_alignment_bytes = None

    class U:
        file_handle = io.BytesIO(b"\x00" * 16)

    with pytest.raises(pickle.UnpicklingError, match="object-dtype"):
        w.read(U())


def test_params_roundtrip_synthetic():
    s = MinMaxScalerParams(
        scale_=np.array([0.5]), min_=np.array([-1.0]),
        data_min_=np.array([2.0]), data_max_=np.array([4.0]),
    )
    x = np.array([[2.0], [3.0], [4.0]])
    assert s.transform(x).ravel() == pytest.approx([0.0, 0.5, 1.0])
    assert s.inverse_transform(s.transform(x)).ravel() == pytest.approx(
        x.ravel()
    )


# --- real XGBoost boosters via UBJSON (no xgboost package) ---------------


@pytest.mark.parametrize("sym,k", [("BTC", 5), ("ETH", 24)])
def test_reference_booster_decodes(sym, k):
    """app.py:203-206 configures window 5 for BTC, 24 for ETH; the
    decoded booster must agree (n_estimators=150 per the pickled
    hyperparams)."""
    from big_data_pr_spark.ohlcv.xgb_ubjson import load_reference_regressor

    m, params = load_reference_regressor(
        f"{REF_MODELS}/{sym}_USDT_xgboost_model.pkl"
    )
    assert m.n_features_in_ == k
    assert len(m.trees) == params["n_estimators"] == 150
    # every split index addresses a real feature slot
    for t in m.trees:
        assert all(-1 <= f < k for f in t.feature)


def test_real_artifact_recursive_forecast_matches_reference_loop():
    """End-to-end U1 with the REAL model+scaler, checked against an
    inline transcription of the reference's scaled-space recursion
    (app.py:229-238: scale window once per element, append SCALED
    predictions, inverse-transform only outputs). recursive_forecast
    now IS that loop (ADVICE round 7: the old (1, k)-shaped
    scaler.transform call would fail a real fitted sklearn MinMaxScaler
    whose n_features_in_ is 1); this test pins the parity."""
    from big_data_pr_spark.ohlcv.forecast import recursive_forecast
    from big_data_pr_spark.ohlcv.xgb_ubjson import load_reference_regressor

    model, _ = load_reference_regressor(f"{REF_MODELS}/BTC_USDT_xgboost_model.pkl")
    scaler = load_minmax_scaler(f"{REF_MODELS}/BTC_USDT_scaler.pkl")
    closes = [80000.0, 80500.0, 81000.0, 80800.0, 81200.0]

    got = recursive_forecast(closes, last_ts_ms=0, steps=24,
                             model=model, scaler=scaler)

    # reference transcription (scaled-space sliding window)
    w = scaler.transform(np.asarray(closes).reshape(-1, 1)).flatten()
    want = []
    for i in range(24):
        p_scaled = float(model.predict(w.reshape(1, -1))[0])
        p_price = float(scaler.inverse_transform(
            np.array([[p_scaled]]))[0, 0])
        want.append(((i + 1) * 3_600_000, p_price))
        w = np.append(w[1:], p_scaled)

    assert len(got) == 24
    for (ts_g, p_g), (ts_w, p_w) in zip(got, want):
        assert ts_g == ts_w
        assert p_g == pytest.approx(p_w, rel=1e-9)
    # forecasts stay inside the scaler's trained price range
    lo, hi = scaler.data_min_[0], scaler.data_max_[0]
    assert all(lo * 0.9 <= p <= hi * 1.1 for _, p in got)


def test_ubjson_decoder_roundtrip_handbuilt():
    """Decode a hand-assembled UBJSON document (typed array, nested
    object, all int widths, strings, bools)."""
    import struct

    from big_data_pr_spark.ohlcv.xgb_ubjson import decode_ubjson

    def S(s):
        b = s.encode()
        return b"S" + b"U" + bytes([len(b)]) + b

    def key(s):
        b = s.encode()
        return b"U" + bytes([len(b)]) + b

    doc = (
        b"{"
        + key("ints") + b"[$l#" + b"U\x03"
        + struct.pack(">iii", -1, 0, 7)
        + key("floats") + b"[$D#" + b"U\x02"
        + struct.pack(">dd", 1.5, -2.25)
        + key("nested") + b"{" + key("s") + S("hi")
        + key("t") + b"T" + key("f") + b"F" + key("z") + b"Z" + b"}"
        + key("plain") + b"[" + b"i\x05" + b"L" + struct.pack(">q", 1 << 40)
        + b"]"
        + b"}"
    )
    got = decode_ubjson(doc)
    assert list(got["ints"]) == [-1, 0, 7]
    assert list(got["floats"]) == [1.5, -2.25]
    assert got["nested"] == {"s": "hi", "t": True, "f": False, "z": None}
    assert got["plain"] == [5, 1 << 40]


# --- per-node default_left NaN routing (r7 verdict #4) --------------------


def _naive_tree_eval(t, row):
    """Per-row reference traversal honoring default_left."""
    i = 0
    while t.feature[i] >= 0:
        x = row[t.feature[i]]
        if np.isnan(x):
            go_left = bool(t.default_left[i]) if t.default_left else True
        else:
            go_left = x < t.threshold[i]
        i = t.left[i] if go_left else t.right[i]
    return t.value[i]


def test_default_left_nan_routing_hand_built_booster():
    """A hand-built UBJSON-shaped model doc with MIXED default_left
    must route NaN per node — vectorized Tree.predict vs a transcribed
    per-row reference traversal."""
    from big_data_pr_spark.ohlcv.xgb_ubjson import booster_to_gbt

    # node 0 splits f0 (NaN -> right), node 1 splits f1 (NaN -> left)
    doc = {
        "learner": {
            "learner_model_param": {"base_score": "0.5", "num_feature": "2"},
            "objective": {"name": "reg:squarederror"},
            "gradient_booster": {
                "model": {
                    "trees": [
                        {
                            "left_children": [1, 3, -1, -1, -1],
                            "right_children": [2, 4, -1, -1, -1],
                            "split_indices": [0, 1, 0, 0, 0],
                            "split_conditions": [10.0, 5.0, 100.0, 7.0, 9.0],
                            "default_left": [0, 1, 0, 0, 0],
                        }
                    ]
                }
            },
        }
    }
    m = booster_to_gbt(doc, ["f0", "f1"])
    X = np.array(
        [
            [np.nan, 1.0],   # node0 NaN -> right -> leaf 100
            [1.0, np.nan],   # node0 left, node1 NaN -> left -> leaf 7
            [1.0, 1.0],      # left, 1<5 left -> 7
            [1.0, 6.0],      # left, 6>=5 right -> 9
            [11.0, 0.0],     # right -> 100
        ]
    )
    got = m.predict(X)
    want = np.array(
        [0.5 + _naive_tree_eval(m.trees[0], row) for row in X]
    )
    assert got == pytest.approx(want)
    assert got == pytest.approx([100.5, 7.5, 7.5, 9.5, 100.5])


def test_real_booster_decodes_and_honors_default_left():
    """The reference's real BTC booster carries default_left=0 nodes;
    NaN input must follow them (vectorized vs per-row traversal), and
    the all-left shortcut must NOT be equivalent on this model."""
    from big_data_pr_spark.ohlcv.xgb_ubjson import load_reference_regressor

    m, _ = load_reference_regressor(
        f"{REF_MODELS}/BTC_USDT_xgboost_model.pkl"
    )
    assert any(0 in t.default_left for t in m.trees)
    X = np.array([[0.5, np.nan, 0.4, np.nan, 0.6]])
    want = m.base_score + sum(_naive_tree_eval(t, X[0]) for t in m.trees)
    assert m.predict(X)[0] == pytest.approx(want)
    # all-left routing would give a DIFFERENT answer on this input —
    # i.e. honoring default_left is material, not a no-op
    import dataclasses

    forced = dataclasses.replace(m)
    forced.trees = [
        dataclasses.replace(t, default_left=None) for t in m.trees
    ]
    assert forced.predict(X)[0] != pytest.approx(want)


def test_dump_format_missing_field_maps_to_default_left():
    """from_xgboost_dump: the public dump's per-node "missing" child id
    becomes default_left (missing == yes -> 1, == no -> 0)."""
    from big_data_pr_spark.operators.gbt import GBTModel

    dump = [
        {
            "nodeid": 0,
            "split": "f0",
            "split_condition": 1.0,
            "yes": 1,
            "no": 2,
            "missing": 2,
            "children": [
                {"nodeid": 1, "leaf": -1.0},
                {"nodeid": 2, "leaf": 2.0},
            ],
        }
    ]
    m = GBTModel.from_xgboost_dump(dump, ["f0"], base_score=0.0)
    assert m.trees[0].default_left == [0, 1, 1]
    assert m.predict(np.array([[np.nan]]))[0] == pytest.approx(2.0)
    assert m.predict(np.array([[0.0]]))[0] == pytest.approx(-1.0)
