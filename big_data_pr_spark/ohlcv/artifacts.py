"""Load the reference's MinMaxScaler artifacts WITHOUT sklearn/joblib.

The reference serves its forecast endpoint from two joblib artifacts per
symbol (``/root/reference/app.py:207-218``,
``trained_models/{BTC,ETH}_USDT_scaler.pkl``). This container has
neither ``sklearn`` nor ``xgboost``, so ``joblib.load`` (which imports
the artifact's classes) cannot run — but the scaler's learned state is
just four float64 arrays. A RESTRICTED unpickler recovers them:

- ``find_class`` resolves ONLY an explicit allowlist — the sklearn
  scaler class maps to a plain parameter shell, joblib's
  ``NumpyArrayWrapper`` to a minimal reader, and ``numpy.dtype``/
  ``numpy.ndarray`` to the real numpy objects. Anything else raises
  ``pickle.UnpicklingError`` (arbitrary-code-execution hardening AND
  the no-sklearn gate in one mechanism).
- joblib's on-disk format (public, BSD: ``joblib/numpy_pickle.py``)
  interleaves raw ndarray bytes into the pickle byte stream right
  after each wrapper's BUILD opcode; the ``load_build`` override
  mirrors joblib's ``NumpyUnpickler``: pop the built wrapper, read the
  alignment padding byte + padding, then ``shape × itemsize`` raw
  bytes from the underlying file, and push the decoded ndarray.

The recovered parameters feed :class:`MinMaxScalerParams`, a
numpy-only reimplementation of sklearn's transform/inverse contract
(``X*scale_ + min_`` / ``(X - min_)/scale_``), which plugs directly
into ``forecast.recursive_forecast``'s U2 scaler protocol.
"""

from __future__ import annotations

import pickle
from dataclasses import dataclass, field

import numpy as np

_ALIGN_KEY = "numpy_array_alignment_bytes"


@dataclass
class MinMaxScalerParams:
    """sklearn-compatible MinMax transform from extracted parameters.

    sklearn computes ``scale_ = (fr_max - fr_min) / (data_max_ -
    data_min_)`` and ``min_ = fr_min - data_min_ * scale_`` at fit
    time; transform is then affine: ``X * scale_ + min_``.
    """

    scale_: np.ndarray
    min_: np.ndarray
    data_min_: np.ndarray = field(default=None)  # type: ignore[assignment]
    data_max_: np.ndarray = field(default=None)  # type: ignore[assignment]
    feature_range: tuple = (0, 1)
    n_features_in_: int = 1
    n_samples_seen_: int = 0

    def transform(self, x: np.ndarray) -> np.ndarray:
        return np.asarray(x, dtype=np.float64) * self.scale_ + self.min_

    def inverse_transform(self, x: np.ndarray) -> np.ndarray:
        return (np.asarray(x, dtype=np.float64) - self.min_) / self.scale_


class _ScalerShell:
    """Attribute bag standing in for sklearn.MinMaxScaler at unpickle
    time (NEWOBJ + BUILD writes straight into ``__dict__``)."""


class _NumpyArrayWrapper:
    """Minimal reader for joblib's NumpyArrayWrapper state
    (subclass/shape/order/dtype/allow_mmap/alignment)."""

    def read(self, unpickler: "_RestrictedJoblibUnpickler") -> np.ndarray:
        fh = unpickler.file_handle
        if getattr(self, _ALIGN_KEY, None):
            padding_length = int.from_bytes(fh.read(1), "little")
            if padding_length:
                fh.read(padding_length)
        dtype = self.dtype  # type: ignore[attr-defined]
        if getattr(dtype, "hasobject", False):
            raise pickle.UnpicklingError(
                "object-dtype arrays are not allowed in restricted load"
            )
        count = int(np.prod(self.shape)) if self.shape else 1  # type: ignore[attr-defined]
        data = fh.read(count * dtype.itemsize)
        if len(data) != count * dtype.itemsize:
            raise pickle.UnpicklingError("truncated ndarray payload")
        arr = np.frombuffer(data, dtype=dtype, count=count)
        order = getattr(self, "order", "C")
        return arr.reshape(self.shape, order=order)  # type: ignore[attr-defined]


class _XGBRegressorShell:
    """Attribute bag for xgboost.sklearn.XGBRegressor pickles: hyper-
    params land in ``__dict__``; the fitted state is ``_Booster``."""


class _BoosterShell:
    """Attribute bag for xgboost.core.Booster: its pickled state is
    ``{'handle': bytearray(<UBJSON model bytes>)}`` — the real
    ``__setstate__`` would call into libxgboost; we just keep the raw
    buffer for :mod:`.xgb_ubjson` to decode."""


_ALLOWED = {
    ("sklearn.preprocessing._data", "MinMaxScaler"): _ScalerShell,
    ("sklearn.preprocessing.data", "MinMaxScaler"): _ScalerShell,  # old sklearn
    ("joblib.numpy_pickle", "NumpyArrayWrapper"): _NumpyArrayWrapper,
    ("numpy", "dtype"): np.dtype,
    ("numpy", "ndarray"): np.ndarray,
    ("xgboost.sklearn", "XGBRegressor"): _XGBRegressorShell,
    ("xgboost.core", "Booster"): _BoosterShell,
    ("builtins", "bytearray"): bytearray,
}


class _RestrictedJoblibUnpickler(pickle._Unpickler):  # noqa: SLF001
    """pickle._Unpickler (pure-Python, so the BUILD dispatch is
    overridable) + allowlisted ``find_class`` + joblib raw-array reads."""

    def __init__(self, file_handle):
        super().__init__(file_handle)
        self.file_handle = file_handle

    def find_class(self, module: str, name: str):
        try:
            return _ALLOWED[(module, name)]
        except KeyError:
            raise pickle.UnpicklingError(
                f"global '{module}.{name}' is not in the restricted "
                "artifact allowlist"
            ) from None

    def load_build(self) -> None:
        pickle._Unpickler.load_build(self)  # noqa: SLF001
        if isinstance(self.stack[-1], _NumpyArrayWrapper):
            wrapper = self.stack.pop()
            self.stack.append(wrapper.read(self))

    dispatch = pickle._Unpickler.dispatch.copy()  # noqa: SLF001
    dispatch[pickle.BUILD[0]] = load_build


def load_minmax_scaler(path: str) -> MinMaxScalerParams:
    """Extract a fitted sklearn MinMaxScaler's parameters from a joblib
    ``.pkl`` without importing sklearn/joblib; returns the numpy-only
    :class:`MinMaxScalerParams` (U2 transform/inverse contract)."""
    with open(path, "rb") as f:
        shell = _RestrictedJoblibUnpickler(f).load()
    d = shell.__dict__

    def arr(key: str) -> np.ndarray:
        v = d.get(key)
        return None if v is None else np.asarray(v, dtype=np.float64)

    scale, minv = arr("scale_"), arr("min_")
    if scale is None or minv is None:
        raise ValueError(f"{path}: artifact carries no fitted scale_/min_")
    return MinMaxScalerParams(
        scale_=scale,
        min_=minv,
        data_min_=arr("data_min_"),
        data_max_=arr("data_max_"),
        feature_range=tuple(d.get("feature_range", (0, 1))),
        n_features_in_=int(d.get("n_features_in_", len(scale))),
        n_samples_seen_=int(d.get("n_samples_seen_", 0)),
    )
