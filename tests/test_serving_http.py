"""HTTP serving facade tests (ohlcv/serving_http.py): route-for-route
parity with reference app.py:86-244 — payload shapes, symbol decoding,
the Chart.js dataset contract, and the full error contract (400/404
with the reference's message shapes). The server runs in-process on an
ephemeral port against tiny parquet-shaped DataFrames; the predict
endpoint exercises the REAL reference artifacts when present."""

from __future__ import annotations

import json
import os
import urllib.error
import urllib.request

import pytest

from big_data_pr_spark.ohlcv.serving_http import ServingBackend, start_server

BASE_MS = 1_700_000_000_000


def _get(port: int, path: str):
    try:
        with urllib.request.urlopen(f"http://127.0.0.1:{port}{path}") as r:
            return r.status, r.read().decode(), r.headers.get("Content-Type")
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode(), e.headers.get("Content-Type")


@pytest.fixture(scope="module")
def server(spark):
    from pyspark.sql import functions as F

    closes = [80000.0, 80900.0, 80400.0, 81300.0, 80700.0, 81100.0,
              80500.0, 81250.0]
    hist = spark.createDataFrame(
        [("BTC/USDT", "1h", i, c, c - 10, c - 20) for i, c in enumerate(closes)]
        + [("ETH/USDT", "1h", i, 2000.0 + i, 1990.0 + i, 1980.0 + i)
           for i in range(3)],
        "symbol string, timeframe string, hour int, close double, "
        "sma_7 double, sma_30 double",
    ).selectExpr(
        "symbol", "timeframe",
        f"timestamp_millis({BASE_MS} + hour * 3600000) AS timestamp_dt",
        "close", "sma_7", "sma_30",
    )
    latest = spark.createDataFrame(
        [("BTC/USDT", 81250.0), ("ETH/USDT", 2002.0)],
        "symbol string, close double",
    )
    stats = spark.createDataFrame(
        [("BTC/USDT", 1, 80950.0), ("BTC/USDT", 2, 81000.0)],
        "symbol string, wend int, avg_close double",
    ).selectExpr(
        "symbol",
        f"timestamp_millis({BASE_MS} + wend * 60000) AS window_end",
        "avg_close",
    )
    chart = spark.createDataFrame(
        [("BTC/USDT", m, 81000.0 + m) for m in range(40)],
        "symbol string, minute int, close double",
    ).selectExpr(
        "symbol",
        f"timestamp_millis({BASE_MS} + minute * 60000) AS event_timestamp",
        "close",
    )
    now_col = F.expr(f"timestamp_millis({BASE_MS} + 39 * 60000)")
    backend = ServingBackend(
        hist=hist,
        latest=latest,
        stats=stats,
        chart=chart,
        artifacts_dir="/root/reference/trained_models",
        now_fn=lambda: now_col,
    )
    srv, port = start_server(backend)
    yield port
    srv.shutdown()


def test_pages_render_symbol_contract(server):
    code, body, ctype = _get(server, "/")
    assert code == 200 and ctype == "text/html"
    assert "BTC/USDT" in body and "ETH/USDT" in body
    code, body, _ = _get(server, "/historical")
    assert code == 200
    # app.py:146: ETH_USDT_1h is the preferred initial selection
    assert "ETH_USDT_1h" in body and "initial: ETH_USDT_1h" in body


def test_realtime_stats_decodes_symbol_and_picks_latest_window(server):
    code, body, _ = _get(server, "/api/realtime_stats/BTC-USDT")
    assert code == 200
    d = json.loads(body)
    assert d["latest"]["close"] == 81250.0
    # top-1 by window_end desc (the reference's sort+size=1)
    assert d["stats"]["avg_close"] == 81000.0


def test_realtime_stats_unknown_symbol_empty_shapes(server):
    code, body, _ = _get(server, "/api/realtime_stats/DOGE-USDT")
    assert code == 200
    assert json.loads(body) == {"latest": {}, "stats": {}}


def test_chart_data_last_35_minutes(server):
    code, body, _ = _get(server, "/api/chart_data_1m/BTC-USDT")
    assert code == 200
    pts = json.loads(body)
    # now = minute 39, window = [now-35m, now] → minutes 4..39
    assert len(pts) == 36
    assert pts[0] == [BASE_MS + 4 * 60000, 81004.0]
    assert pts[-1] == [BASE_MS + 39 * 60000, 81039.0]


def test_historical_data_chartjs_payload(server):
    code, body, _ = _get(server, "/api/historical_data/BTC_USDT_1h?range=all")
    assert code == 200
    d = json.loads(body)
    assert len(d["labels"]) == 8
    assert d["labels"][0] == "2023-11-14 22:13:20"
    assert [ds["label"] for ds in d["datasets"]] == [
        "BTC/USDT Close (1h)", "BTC/USDT SMA 7 (1h)", "BTC/USDT SMA 30 (1h)",
    ]
    assert d["datasets"][0]["data"][-1] == 81250.0
    assert d["datasets"][1]["hidden"] and d["datasets"][2]["hidden"]


def test_historical_data_bad_format_400(server):
    code, body, _ = _get(server, "/api/historical_data/nounderscore")
    assert code == 400
    assert "Invalid symbol_timeframe format" in json.loads(body)["error"]


def test_predict_error_contract(server):
    # non-1h timeframe → 400 (app.py:201-202)
    code, body, _ = _get(server, "/api/predict_xgboost/BTC_USDT_4h")
    assert code == 400
    assert "only for 1h timeframe" in json.loads(body)["error"]
    # invalid format → 400 (app.py:198)
    code, body, _ = _get(server, "/api/predict_xgboost/plain")
    assert code == 400
    # unconfigured symbol → 400 BEFORE any filesystem check (app.py:206
    # rejects symbols outside the window-size config table with 400;
    # the 404s are reserved for configured symbols with missing files)
    code, body, _ = _get(server, "/api/predict_xgboost/DOGE_USDT_1h")
    assert code == 400
    assert "No specific XGBoost window size configured" in json.loads(body)["error"]


def test_predict_static_config_contract(tmp_path):
    """app.py:204-206 — the window-size config is STATIC and a
    SUBSTRING match: BTC_USDT/ETH_USDT (and e.g. BTC_USDT_PERP) are
    configured even with NO artifact files on disk, so a missing file
    is a 404 'Model ... not found', never the 400 config error."""
    backend = ServingBackend(artifacts_dir=str(tmp_path))
    for sym in ("ETH_USDT_1h", "BTC_USDT_1h", "BTC_USDT_PERP_1h"):
        payload, code = backend.predict(sym)
        assert code == 404, (sym, payload)
        assert "not found" in payload["error"], (sym, payload)
    # outside the static config AND no artifact on disk → 400
    payload, code = backend.predict("DOGE_USDT_1h")
    assert code == 400
    assert "No specific XGBoost window size configured" in payload["error"]


def test_predict_real_artifacts_24_steps(server, spark):
    if not os.path.isdir("/root/reference/trained_models"):
        pytest.skip("reference artifacts not present")
    code, body, _ = _get(server, "/api/predict_xgboost/BTC_USDT_1h")
    assert code == 200
    preds = json.loads(body)
    assert len(preds) == 24
    # hourly steps from the last hist timestamp (app.py:236-238)
    last_hist_ms = BASE_MS + 7 * 3600000
    assert preds[0]["timestamp"] == last_hist_ms + 3600000
    assert preds[23]["timestamp"] == last_hist_ms + 24 * 3600000
    # parity with the recursion the CLI/forecast tests already pin
    from big_data_pr_spark.ohlcv.artifacts import load_minmax_scaler
    from big_data_pr_spark.ohlcv.forecast import recursive_forecast
    from big_data_pr_spark.ohlcv.xgb_ubjson import load_reference_regressor

    model, _ = load_reference_regressor(
        "/root/reference/trained_models/BTC_USDT_xgboost_model.pkl")
    scaler = load_minmax_scaler(
        "/root/reference/trained_models/BTC_USDT_scaler.pkl")
    k = model.n_features_in_
    closes = [80000.0, 80900.0, 80400.0, 81300.0, 80700.0, 81100.0,
              80500.0, 81250.0][-k:]
    want = recursive_forecast(closes, last_hist_ms, steps=24,
                              model=model, scaler=scaler)
    assert [(p["timestamp"], p["predicted_price"]) for p in preds] == [
        (ts, float(p)) for ts, p in want
    ]


def test_predict_insufficient_history_found_need(server, spark):
    if not os.path.isdir("/root/reference/trained_models"):
        pytest.skip("reference artifacts not present")
    # ETH model needs k=24 but the fixture has only 3 ETH rows
    code, body, _ = _get(server, "/api/predict_xgboost/ETH_USDT_1h")
    assert code == 404
    msg = json.loads(body)["error"]
    assert "found 3" in msg and "need 24" in msg


def test_unknown_route_404(server):
    code, body, _ = _get(server, "/api/nope")
    assert code == 404

def test_percent_encoded_symbol_decoded(server):
    # Flask percent-decodes path segments before routing (r9 advice):
    # BTC%2DUSDT must hit the same lookup as BTC-USDT
    code, body, _ = _get(server, "/api/realtime_stats/BTC%2DUSDT")
    assert code == 200
    assert json.loads(body)["latest"]["close"] == 81250.0
    code, body, _ = _get(server, "/api/chart_data_1m/BTC%2DUSDT")
    assert code == 200 and len(json.loads(body)) == 36
    code, body, _ = _get(server, "/api/historical_data/BTC%5FUSDT_1h?range=all")
    assert code == 200 and len(json.loads(body)["labels"]) == 8


def test_historical_data_missing_table_404(spark):
    # app.py:190: NotFoundError on this route is a 404, unlike the
    # realtime/chart routes' empty shapes (r9 advice)
    backend = ServingBackend(hist=None)
    srv, port = start_server(backend)
    try:
        code, body, _ = _get(port, "/api/historical_data/BTC_USDT_1h")
        assert code == 404
        assert "not found" in json.loads(body)["error"]
    finally:
        srv.shutdown()


def test_predict_configured_symbol_missing_model_404(spark, tmp_path):
    # a symbol WITH artifacts present but a missing model file keeps the
    # reference's 404 (app.py:209) — the 400 config gate must not
    # swallow it
    (tmp_path / "BTC_USDT_scaler.pkl").write_bytes(b"x")
    backend = ServingBackend(artifacts_dir=str(tmp_path))
    srv, port = start_server(backend)
    try:
        code, body, _ = _get(port, "/api/predict_xgboost/BTC_USDT_1h")
        assert code == 404
        assert "Model for BTC_USDT not found" in json.loads(body)["error"]
    finally:
        srv.shutdown()


def test_pages_escape_markup_in_symbols(spark):
    # the reference renders via auto-escaping Jinja templates; a symbol
    # containing markup must not be reflected verbatim (r9 advice)
    evil = spark.createDataFrame(
        [('<script>alert(1)</script>', 1.0)], "symbol string, close double"
    )
    backend = ServingBackend(latest=evil)
    srv, port = start_server(backend)
    try:
        code, body, _ = _get(port, "/")
        assert code == 200
        assert "<script>" not in body
        assert "&lt;script&gt;" in body
    finally:
        srv.shutdown()


def test_predict_prefix_symbol_not_treated_as_configured(spark, tmp_path):
    # 'BTC' must not ride on BTC_USDT's artifacts via a prefix match —
    # it is outside the configured set, so the reference's 400 applies
    (tmp_path / "BTC_USDT_xgboost_model.pkl").write_bytes(b"x")
    (tmp_path / "BTC_USDT_scaler.pkl").write_bytes(b"x")
    backend = ServingBackend(artifacts_dir=str(tmp_path))
    srv, port = start_server(backend)
    try:
        code, body, _ = _get(port, "/api/predict_xgboost/BTC_1h")
        assert code == 400
        assert "No specific XGBoost window size configured" in json.loads(body)["error"]
    finally:
        srv.shutdown()
