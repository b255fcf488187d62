"""Decode the reference's REAL XGBoost boosters without xgboost.

The reference's ``trained_models/*_xgboost_model.pkl`` are pickled
``xgboost.sklearn.XGBRegressor`` objects whose fitted state is a raw
model buffer (``Booster.__getstate__`` → ``{'handle': bytearray}``).
Since xgboost 1.6 that buffer is **UBJSON** (ubjson.org draft-12 —
xgboost's public on-disk JSON schema, just binary-framed), so the full
tree ensemble is recoverable with a ~60-line decoder:

    learner.gradient_booster.model.trees[*].{left_children,
    right_children, split_indices, split_conditions, default_left}

Leaf nodes carry their value in ``split_conditions`` (xgboost JSON
schema: the field doubles as threshold for internal nodes and leaf
output for leaves). The decoded ensemble loads into
:class:`..operators.gbt.GBTModel` and predicts with
``base_score + Σ tree(x)`` (``reg:squarederror`` has identity link).

The per-node ``default_left`` array is decoded and honored by
``Tree.predict`` (a NaN feature — e.g. a missing candle passing through
the affine scaler as NaN — routes to the node's trained default branch,
exactly as xgboost's own predictor does), closing the last semantic
delta vs the reference's real boosters.
"""

from __future__ import annotations

import struct

import numpy as np

from ..operators.gbt import GBTModel, Tree

_INT_FMT = {
    b"i": ("b", 1), b"U": ("B", 1), b"I": (">h", 2),
    b"l": (">i", 4), b"L": (">q", 8),
}
_NUM_FMT = {**_INT_FMT, b"d": (">f", 4), b"D": (">d", 8)}


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        if len(b) != n:
            raise ValueError("truncated UBJSON")
        self.pos += n
        return b

    def marker(self) -> bytes:
        m = self.take(1)
        while m == b"N":  # no-op
            m = self.take(1)
        return m


def _read_scalar(r: _Reader, m: bytes):
    if m in _NUM_FMT:
        fmt, n = _NUM_FMT[m]
        return struct.unpack(fmt, r.take(n))[0]
    if m == b"S" or m == b"H":
        ln = _read_scalar(r, r.marker())
        return r.take(int(ln)).decode("utf-8")
    if m == b"C":
        return r.take(1).decode("utf-8")
    if m == b"T":
        return True
    if m == b"F":
        return False
    if m == b"Z":
        return None
    raise ValueError(f"unexpected UBJSON marker {m!r} at {r.pos}")


def _container_header(r: _Reader):
    """Optional ``$<type>`` and ``#<count>`` for arrays/objects."""
    typ = count = None
    m = r.marker()
    if m == b"$":
        typ = r.take(1)
        m = r.marker()
    if m == b"#":
        count = int(_read_scalar(r, r.marker()))
        m = None
    return typ, count, m


def _read_value(r: _Reader, m: bytes):
    if m == b"[":
        typ, count, nxt = _container_header(r)
        if count is not None:
            if typ in _NUM_FMT:  # strongly-typed numeric array → ndarray
                fmt, n = _NUM_FMT[typ]
                raw = r.take(n * count)
                dt = {">f": ">f4", ">d": ">f8", "b": "i1", "B": "u1",
                      ">h": ">i2", ">i": ">i4", ">q": ">i8"}[fmt]
                return np.frombuffer(raw, dtype=dt).astype(
                    np.float64 if fmt in (">f", ">d") else np.int64
                )
            out = []
            for _ in range(count):
                mm = typ or r.marker()
                out.append(_read_value(r, mm))
            return out
        out = []
        while nxt != b"]":
            out.append(_read_value(r, nxt))
            nxt = r.marker()
        return out
    if m == b"{":
        typ, count, nxt = _container_header(r)
        obj = {}
        if count is not None:
            for _ in range(count):
                klen = _read_scalar(r, r.marker())
                key = r.take(int(klen)).decode("utf-8")
                mm = typ or r.marker()
                obj[key] = _read_value(r, mm)
            return obj
        while nxt != b"}":
            klen = _read_scalar(r, nxt)
            key = r.take(int(klen)).decode("utf-8")
            obj[key] = _read_value(r, r.marker())
            nxt = r.marker()
        return obj
    return _read_scalar(r, m)


def decode_ubjson(buf: bytes):
    """Decode one UBJSON value (xgboost model buffers are one object)."""
    r = _Reader(bytes(buf))
    return _read_value(r, r.marker())


def booster_to_gbt(model_doc: dict, features: list[str]) -> GBTModel:
    """xgboost UBJSON/JSON model document → :class:`GBTModel`."""
    learner = model_doc["learner"]
    base = float(learner["learner_model_param"]["base_score"])
    objective = learner["objective"]["name"]
    if not objective.startswith("reg:"):
        raise ValueError(
            f"only regression objectives supported, got {objective}"
        )
    trees = []
    for t in learner["gradient_booster"]["model"]["trees"]:
        left = np.asarray(t["left_children"], dtype=np.int64)
        right = np.asarray(t["right_children"], dtype=np.int64)
        sidx = np.asarray(t["split_indices"], dtype=np.int64)
        scond = np.asarray(t["split_conditions"], dtype=np.float64)
        is_leaf = left < 0
        dleft = np.asarray(
            t.get("default_left", np.ones(len(left))), dtype=np.int64
        )
        trees.append(
            Tree(
                feature=np.where(is_leaf, -1, sidx).tolist(),
                threshold=np.where(is_leaf, 0.0, scond).tolist(),
                left=np.where(is_leaf, np.arange(len(left)), left).tolist(),
                right=np.where(is_leaf, np.arange(len(right)), right).tolist(),
                value=np.where(is_leaf, scond, 0.0).tolist(),
                default_left=dleft.tolist(),
            )
        )
    return GBTModel(features=features, trees=trees, base_score=base)


def load_reference_regressor(pkl_path: str) -> tuple[GBTModel, dict]:
    """Restricted-unpickle an XGBRegressor ``.pkl`` and decode its
    booster buffer; returns (GBTModel, sklearn-wrapper hyperparams).
    The GBTModel exposes ``n_features_in_`` for forecast._validate."""
    from .artifacts import _RestrictedJoblibUnpickler

    with open(pkl_path, "rb") as f:
        shell = _RestrictedJoblibUnpickler(f).load()
    params = dict(shell.__dict__)
    booster = params.pop("_Booster", None)
    if booster is None:
        raise ValueError(f"{pkl_path}: no fitted _Booster state")
    doc = decode_ubjson(booster.__dict__["handle"])
    # Booster.__getstate__ wraps the model doc: {"Config": ..., "Model": ...}
    doc = doc.get("Model", doc)
    n_feat = int(doc["learner"]["learner_model_param"]["num_feature"])
    model = booster_to_gbt(doc, [f"f{i}" for i in range(n_feat)])
    model.n_features_in_ = n_feat  # forecast._validate (U3) contract
    return model, params
