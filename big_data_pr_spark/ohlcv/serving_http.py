"""HTTP serving facade — the reference's Flask+Elasticsearch app
(reference ``app.py:86-244``) re-expressed as a dependency-free stdlib
``http.server`` layer over the Spark serving tables.

Route-for-route parity with the reference, including its error
contract (status codes and message shapes), minus the Chart.js
template bodies (the two HTML pages render the same data contract —
available symbols + initial selection — as a minimal document):

- ``GET /``                                  → realtime page (symbol dropdown, app.py:86-90)
- ``GET /historical``                        → historical page (symbol_timeframe dropdown, app.py:138-151)
- ``GET /api/realtime_stats/<enc_symbol>``   → {"latest": {...}, "stats": {...}} (app.py:92-107)
- ``GET /api/chart_data_1m/<enc_symbol>``    → [[ts_ms, close], ...] last 35 min (app.py:109-135)
- ``GET /api/historical_data/<sym_tf>?range=`` → Chart.js labels/datasets (app.py:153-193)
- ``GET /api/predict_xgboost/<sym_tf>``      → 24-step forecast [{timestamp, predicted_price}] (app.py:195-241)

Design notes (documented divergences, all behavior-preserving):

- ES indexes become Spark DataFrames (parquet serving tables); every
  ES query-DSL construct maps per ``serving.py``'s table (term →
  equality predicate, range → between, sort+size → orderBy+limit) —
  the lookups stay partition-prunable scans, so the same facade in
  front of a 100 TB hist table serves from partition/file pruning,
  not full scans.
- The recursive forecast window size ``k`` derives from the decoded
  model artifact's ``n_features_in_`` instead of the reference's
  hardcoded per-symbol table (app.py:203-206) — same values for the
  shipped artifacts (BTC=5, ETH=24), but any new artifact serves
  without a code change. The reference's CONFIG gate stays first in
  the error order (app.py:206 returns 400 "No specific XGBoost window
  size configured" before ever touching the filesystem): here the
  configured set is "symbols with any artifact file present", so a
  symbol with no artifacts is the same 400, while a configured symbol
  whose model/scaler file is missing is the reference's 404.
- Symbols are canonical slash form ("BTC/USDT") in the tables; URL
  forms ("BTC-USDT", "BTC_USDT") are decoded endpoint-side exactly
  like the reference (app.py:94 ``replace('-','/')``; the historical
  index keys on the underscore form, ours converts to slash form —
  the ``cmd_forecast`` CLI contract).
- Results that reach JSON are serving-sized by construction (get-by-id,
  limit 200, limit 10000, top-k), so the driver-side collect is the
  endpoint payload, never a data-scale funnel.
"""

from __future__ import annotations

import html
import json
import os
import threading
from datetime import datetime, timezone
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, unquote, urlparse

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.windows import top1_per_key
from . import serving

PREDICTION_STEPS_XGBOOST = 24  # app.py:23

# app.py:162-166 range → days
_RANGE_DAYS = {"1m": 30, "3m": 90, "6m": 180, "1y": 365}


def _row_dict(row) -> dict:
    """Row → JSON-safe dict (timestamps → ISO strings)."""
    out = {}
    for k, v in row.asDict().items():
        out[k] = v.isoformat(sep=" ") if isinstance(v, datetime) else v
    return out


def _ts_ms(dt: datetime) -> int:
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1000)


class ServingBackend:
    """The five endpoint computations over the serving DataFrames.

    Any table may be None: the realtime/chart endpoints then answer
    with their empty shapes, but ``historical_data`` 404s (its
    upstream route 404s on a missing ES index — app.py:190). ``now_fn``
    yields the chart window's "now" Column — ``F.current_timestamp()``
    in production, a literal in tests for determinism.
    """

    def __init__(
        self,
        hist: DataFrame | None = None,
        latest: DataFrame | None = None,
        stats: DataFrame | None = None,
        chart: DataFrame | None = None,
        artifacts_dir: str | None = None,
        now_fn=None,
    ):
        self.hist = hist
        self.latest = latest
        self.stats = stats
        self.chart = chart
        self.artifacts_dir = artifacts_dir
        self.now_fn = now_fn or F.current_timestamp

    # -- dropdown data (app.py:46-83) ---------------------------------
    def symbols(self) -> list[str]:
        if self.latest is None:
            return []
        return [
            r["symbol"] for r in serving.distinct_symbols(self.latest).collect()
        ]

    def symbol_timeframes(self) -> list[str]:
        if self.hist is None:
            return []
        return [
            r["symbol_tf"].replace("/", "_")
            for r in serving.distinct_symbol_timeframes(self.hist).collect()
        ]

    # -- /api/realtime_stats (app.py:92-107) ---------------------------
    def realtime_stats(self, encoded_symbol: str) -> dict:
        sym = encoded_symbol.replace("-", "/")
        latest_d, stats_d = {}, {}
        if self.latest is not None:
            rows = self.latest.filter(F.col("symbol") == sym).limit(1).collect()
            if rows:
                latest_d = _row_dict(rows[0])
        if self.stats is not None:
            rows = top1_per_key(
                self.stats.filter(F.col("symbol") == sym),
                ["symbol"],
                [F.desc("window_end")],
            ).collect()
            if rows:
                stats_d = _row_dict(rows[0])
        return {"latest": latest_d, "stats": stats_d}

    # -- /api/chart_data_1m (app.py:109-135) ---------------------------
    def chart_data_1m(self, encoded_symbol: str) -> list[list]:
        if self.chart is None:
            return []
        sym = encoded_symbol.replace("-", "/")
        rows = serving.chart_data_1m(self.chart, sym, self.now_fn()).collect()
        return [[_ts_ms(r["event_timestamp"]), r["close"]] for r in rows]

    # -- /api/historical_data (app.py:153-193) --------------------------
    def historical_data(self, symbol_timeframe: str, range_str: str):
        parts = symbol_timeframe.split("_")
        if len(parts) < 2:
            return {"error": "Invalid symbol_timeframe format."}, 400
        timeframe = parts[-1]
        symbol = "_".join(parts[:-1]).replace("_", "/")
        if self.hist is None:
            # app.py:190: this route 404s on NotFoundError (missing ES
            # index) — unlike realtime/chart, which return empty shapes
            return {"error": "historical table not found."}, 404
        rows = serving.historical_data(
            self.hist, symbol, timeframe, _RANGE_DAYS.get(range_str)
        ).collect()
        labels = [r["timestamp_dt"].strftime("%Y-%m-%d %H:%M:%S") for r in rows]
        closes = [r["close"] for r in rows]
        sma7 = [r["sma_7"] for r in rows]
        sma30 = [r["sma_30"] for r in rows]
        # dataset entries replicate the reference's Chart.js payload
        # (app.py:184-188) so its front end renders unmodified
        datasets = [
            {"label": f"{symbol} Close ({timeframe})", "data": closes,
             "borderColor": "rgb(75, 192, 192)", "tension": 0.1, "fill": False},
            {"label": f"{symbol} SMA 7 ({timeframe})", "data": sma7,
             "borderColor": "rgb(255, 159, 64)", "tension": 0.1, "fill": False,
             "hidden": True},
            {"label": f"{symbol} SMA 30 ({timeframe})", "data": sma30,
             "borderColor": "rgb(153, 102, 255)", "tension": 0.1, "fill": False,
             "hidden": True},
        ]
        return {"labels": labels, "datasets": datasets}, 200

    # -- /api/predict_xgboost (app.py:195-241) --------------------------
    def predict(self, symbol_timeframe: str):
        parts = symbol_timeframe.split("_")
        if len(parts) < 2:
            return {
                "error": "Invalid format. Expected SYMBOL_TIMEFRAME "
                "(e.g., BTC_USDT_1h)"
            }, 400
        timeframe_req = parts[-1]
        symbol_req = "_".join(parts[:-1])
        if timeframe_req != "1h":
            return {
                "error": "XGBoost prediction only for 1h timeframe. "
                f"Requested: {timeframe_req}"
            }, 400
        if not self.artifacts_dir:
            return {"error": "No artifacts directory configured."}, 404
        # app.py:203-206: the per-symbol window-size CONFIG check runs
        # before any filesystem lookup and is a 400, not a 404. The
        # reference's config is STATIC and a SUBSTRING match
        # (`if "BTC_USDT" in symbol_req` / `"ETH_USDT" in symbol_req`),
        # so BTC_USDT and ETH_USDT — and e.g. BTC_USDT_PERP — are
        # always configured and fall through to the 404 file check even
        # with no artifacts on disk. We honor that contract exactly,
        # and ADDITIONALLY treat any symbol with an artifact present as
        # configured (exact suffix strip, not a prefix match — BTC must
        # not ride on BTC_USDT's artifacts), so extra shipped artifacts
        # stay servable.
        configured = "BTC_USDT" in symbol_req or "ETH_USDT" in symbol_req
        if not configured:
            try:
                known = {
                    f.removesuffix("_xgboost_model.pkl").removesuffix("_scaler.pkl")
                    for f in os.listdir(self.artifacts_dir)
                    if f.endswith(("_xgboost_model.pkl", "_scaler.pkl"))
                }
                configured = symbol_req in known
            except OSError:
                configured = False
        if not configured:
            return {
                "error": "No specific XGBoost window size configured "
                f"for symbol {symbol_req}."
            }, 400
        model_pkl = os.path.join(
            self.artifacts_dir, f"{symbol_req}_xgboost_model.pkl"
        )
        scaler_pkl = os.path.join(self.artifacts_dir, f"{symbol_req}_scaler.pkl")
        if not os.path.exists(model_pkl):
            return {"error": f"Model for {symbol_req} not found."}, 404
        if not os.path.exists(scaler_pkl):
            return {"error": f"Scaler for {symbol_req} not found."}, 404
        from .artifacts import load_minmax_scaler
        from .forecast import recursive_forecast
        from .xgb_ubjson import load_reference_regressor

        model, _params = load_reference_regressor(model_pkl)
        scaler = load_minmax_scaler(scaler_pkl)
        k = model.n_features_in_
        sym = symbol_req.replace("_", "/")
        if self.hist is None:
            return {"error": "No historical table configured."}, 404
        rows = serving.model_input_topk(self.hist, sym, timeframe_req, k).collect()
        if len(rows) < k:
            return {
                "error": f"Not enough recent historical data for "
                f"{symbol_req} (found {len(rows)}, need {k})."
            }, 404
        closes = [float(r["close"]) for r in rows]
        last_ms = _ts_ms(rows[-1]["timestamp_dt"])
        preds = recursive_forecast(
            closes,
            last_ms,
            steps=PREDICTION_STEPS_XGBOOST,
            model=model,
            scaler=scaler,
        )
        return [
            {"timestamp": ts, "predicted_price": float(p)} for ts, p in preds
        ], 200

    # -- HTML pages (app.py:86-90, 138-151) -----------------------------
    def realtime_page(self) -> str:
        # symbols come from data and are escaped like the reference's
        # auto-escaping Jinja templates would render them
        syms = [html.escape(s, quote=True) for s in self.symbols()]
        initial = syms[0] if syms else None
        opts = "".join(f'<option value="{s}">{s}</option>' for s in syms)
        return (
            "<!doctype html><html><head><title>Realtime OHLCV</title></head>"
            f"<body><h1>Realtime dashboard</h1><select id=symbol>{opts}"
            f"</select><p>initial: {initial}</p></body></html>"
        )

    def historical_page(self) -> str:
        tfs = self.symbol_timeframes()
        # app.py:146-148 default selection
        initial = "ETH_USDT_1h" if "ETH_USDT_1h" in tfs else (
            tfs[0] if tfs else None
        )
        initial = html.escape(initial, quote=True) if initial else None
        opts = "".join(
            f'<option value="{html.escape(s, quote=True)}">'
            f"{html.escape(s, quote=True)}</option>"
            for s in tfs
        )
        return (
            "<!doctype html><html><head><title>Historical OHLCV</title></head>"
            f"<body><h1>Historical data</h1><select id=symbol_tf>{opts}"
            f"</select><p>initial: {initial}</p></body></html>"
        )


def make_handler(backend: ServingBackend):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet — tests/CLI own stdout
            pass

        def _send(self, code: int, payload, content_type="application/json"):
            body = (
                payload.encode()
                if isinstance(payload, str)
                else json.dumps(payload, default=str).encode()
            )
            self.send_response(code)
            self.send_header("Content-Type", content_type)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib handler contract)
            parsed = urlparse(self.path)
            path = parsed.path.rstrip("/") or "/"
            try:
                if path == "/":
                    self._send(200, backend.realtime_page(), "text/html")
                elif path == "/historical":
                    self._send(200, backend.historical_page(), "text/html")
                elif path.startswith("/api/realtime_stats/"):
                    enc = unquote(path.rsplit("/", 1)[1])
                    self._send(200, backend.realtime_stats(enc))
                elif path.startswith("/api/chart_data_1m/"):
                    enc = unquote(path.rsplit("/", 1)[1])
                    self._send(200, backend.chart_data_1m(enc))
                elif path.startswith("/api/historical_data/"):
                    sym_tf = unquote(path.rsplit("/", 1)[1])
                    rng = parse_qs(parsed.query).get("range", ["all"])[0]
                    payload, code = backend.historical_data(sym_tf, rng)
                    self._send(code, payload)
                elif path.startswith("/api/predict_xgboost/"):
                    sym_tf = unquote(path.rsplit("/", 1)[1])
                    payload, code = backend.predict(sym_tf)
                    self._send(code, payload)
                else:
                    self._send(404, {"error": f"no route for {path}"})
            except Exception as exc:  # app.py returns 500 + message
                self._send(500, {"error": str(exc)})

    return Handler


def start_server(backend: ServingBackend, port: int = 0):
    """Start the facade on 127.0.0.1:<port> (0 → ephemeral) in a
    daemon thread; returns (server, bound_port). Caller shuts down
    with ``server.shutdown()``."""
    srv = ThreadingHTTPServer(("127.0.0.1", port), make_handler(backend))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    return srv, srv.server_address[1]
