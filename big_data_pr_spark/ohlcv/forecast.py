"""U1-U3: recursive multi-step price forecast (reference ``app.py:195-244``).

The reference loads a per-symbol XGBoost regressor + MinMaxScaler
(joblib), takes the last *k* closes, and iterates 24 times:
scale → predict → append → slide window (``app.py:229-238``).

Here the recursion is faithfully reproduced as a driver-side loop over a
collected top-k window (k ≤ 24 rows — collecting it is correct even at
100 TB: the *scan* that produces the top-k is distributed, see
``serving.model_input_topk``; only the k-row window crosses to the
driver). The model is pluggable:

- :class:`DriftModel` — deterministic stub (mean pct-change drift) so
  tests and the correctness gate never need binary artifacts;
- any object with ``predict(ndarray) -> ndarray`` (e.g. a joblib-loaded
  XGBoost regressor) + optional scaler with ``transform``/
  ``inverse_transform`` — the reference's exact protocol (U2).

For many-symbol batch inference the same ``step()`` runs inside
``applyInPandas`` (one group per symbol) — see
:func:`forecast_all_symbols`.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HOUR_MS = 3_600_000


@dataclass
class DriftModel:
    """Deterministic stand-in for the XGBoost regressor: next value =
    last value grown by the window's mean pct-change, clamped ±5%."""

    clamp: float = 0.05

    def predict(self, window: np.ndarray) -> np.ndarray:
        w = window.reshape(-1)
        if len(w) < 2 or not np.all(w[:-1] != 0):
            drift = 0.0
        else:
            drift = float(np.mean(w[1:] / w[:-1] - 1.0))
        drift = max(-self.clamp, min(self.clamp, drift))
        return np.asarray([w[-1] * (1.0 + drift)])


def _validate(model, scaler, window_size: int) -> None:
    """U3: load-time sanity checks (reference ``app.py:214-217``)."""
    n_in = getattr(model, "n_features_in_", None)
    if n_in is not None and n_in != window_size:
        raise ValueError(f"model expects {n_in} features, window is {window_size}")
    if scaler is not None and not (
        hasattr(scaler, "transform") and hasattr(scaler, "inverse_transform")
    ):
        raise ValueError("scaler must implement transform/inverse_transform")


def recursive_forecast(
    closes: list[float],
    last_ts_ms: int,
    steps: int = 24,
    model=None,
    scaler=None,
    step_ms: int = HOUR_MS,
) -> list[tuple[int, float]]:
    """The U1 loop: predict → append → slide, ``steps`` times.

    ``closes`` is the ascending model-input window (k = len(closes));
    returns [(ts_ms, predicted_price)] for ts = last + i·step.

    With a scaler this is the reference loop verbatim (app.py:232-240):
    the window is scaled ONCE per element (``reshape(-1, 1)`` — the
    fitted MinMaxScaler has ``n_features_in_ == 1``, so a (1, k) batch
    would fail sklearn's feature-count validation), the recursion runs
    in SCALED space (scaled predictions are appended to the window),
    and only emitted predictions are inverse-transformed back to price.
    """
    model = model or DriftModel()
    k = len(closes)
    _validate(model, scaler, k)
    out: list[tuple[int, float]] = []
    if scaler is None:
        window = np.asarray(closes, dtype=np.float64)
        for i in range(1, steps + 1):
            pred = float(np.asarray(model.predict(window.reshape(1, -1))).reshape(-1)[0])
            out.append((last_ts_ms + i * step_ms, pred))
            window = np.append(window[1:], pred)
        return out
    window = scaler.transform(
        np.asarray(closes, dtype=np.float64).reshape(-1, 1)
    ).flatten()
    for i in range(1, steps + 1):
        pred_scaled = float(
            np.asarray(model.predict(window.reshape(1, -1))).reshape(-1)[0]
        )
        pred = float(
            scaler.inverse_transform(np.asarray([[pred_scaled]]))[0, 0]
        )
        out.append((last_ts_ms + i * step_ms, pred))
        window = np.append(window[1:], pred_scaled)
    return out


def load_artifacts(model_path: str, scaler_path: str):
    """Load the reference's model artifacts (``app.py:22-23,207-218``).

    With joblib+xgboost installed this is the reference's exact load
    path; without them (this container) the restricted unpickler +
    UBJSON booster decoder recover the SAME fitted state — real trees,
    real scaler parameters — so the serving path needs no stub (see
    :mod:`.artifacts` / :mod:`.xgb_ubjson`;
    tests/test_artifacts.py proves recursion parity)."""
    try:
        import joblib  # noqa: PLC0415
        import xgboost  # noqa: F401, PLC0415
        return joblib.load(model_path), joblib.load(scaler_path)
    except ImportError:
        from .artifacts import load_minmax_scaler  # noqa: PLC0415
        from .xgb_ubjson import load_reference_regressor  # noqa: PLC0415

        model, _params = load_reference_regressor(model_path)
        return model, load_minmax_scaler(scaler_path)


def forecast_all_symbols(
    hist: DataFrame, k: int = 24, steps: int = 24, step_ms: int = HOUR_MS
) -> DataFrame:
    """Distributed many-symbol variant: per-(symbol, timeframe) group,
    run the same recursion inside ``applyInPandas`` (Arrow-batched; one
    group = one model window — no driver collect)."""
    import pandas as pd

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("timestamp_dt").tail(k)
        closes = pdf["close"].tolist()
        last_ms = int(pdf["timestamp_dt"].iloc[-1].timestamp() * 1000)
        preds = recursive_forecast(closes, last_ms, steps=steps, step_ms=step_ms)
        return pd.DataFrame(
            {
                "symbol": pdf["symbol"].iloc[0],
                "timeframe": pdf["timeframe"].iloc[0],
                "horizon_ms": [t for t, _ in preds],
                "forecast": [p for _, p in preds],
            }
        )

    return (
        hist.select("symbol", "timeframe", "timestamp_dt", "close")
        .groupBy("symbol", "timeframe")
        .applyInPandas(
            per_group,
            schema="symbol string, timeframe string, horizon_ms long, forecast double",
        )
        .orderBy("symbol", "timeframe", "horizon_ms")
    )
