"""Gradient-boosted decision trees: distributed histogram training +
vectorized inference (reference ``app.py:195-244``).

The reference loads per-symbol XGBoost regressors
(``trained_models/{BTC,ETH}_USDT_xgboost_model.pkl``, ``app.py:207``)
and runs a recursive 24-step forecast. This container has no xgboost,
so this module supplies the same capability Spark-first:

- :func:`fit_gbt` — **distributed** second-order-free GBDT training in
  the LightGBM data-parallel shape (Ke et al., NeurIPS 2017): features
  are binned once (equal-width over exact global min/max — deterministic,
  unlike approxQuantile), then each tree level is ONE ``stack`` +
  ``groupBy(node, feature, bin)`` aggregation producing a tiny
  (nodes × features × bins) gradient histogram. Split selection runs on
  the driver over that driver-sized histogram — the only data that ever
  leaves the executors. At 100 TB the per-level shuffle is a map-side-
  combined partial agg of a few-KB state; rows never move.
- :class:`GBTModel` / :class:`Tree` — driver-sized model artifact with
  vectorized numpy ``predict`` (plugs into
  ``ohlcv.forecast.recursive_forecast``'s model protocol) and JSON
  round-trip.
- :func:`GBTModel.from_xgboost_dump` — parses the public XGBoost
  ``dump_model(dump_format="json")`` node format, so a real trained
  artifact from the reference can be served here without importing
  xgboost at all.
- :func:`predict_gbt` — Arrow-batched scoring of a DataFrame (one
  pandas UDF, zero shuffle).

Prediction semantics match xgboost exactly: missing/NaN routes to the
node's trained ``default_left`` branch (all-left when the model never
saw missing values — xgboost's default), decision is ``x < threshold``
→ left (yes) branch, score = ``base_score + Σ leaf`` (leaf values
already include the learning rate, as xgboost stores them).
"""

from __future__ import annotations

import json
import math
from dataclasses import dataclass, field

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass
class Tree:
    """Flat-array binary tree: internal node i splits on
    ``feature[i] < threshold[i]`` → left[i], else right[i]; leaves have
    ``feature[i] == -1`` and carry ``value[i]``. ``default_left[i]``
    (0/1) is the per-node missing-value branch, xgboost's
    ``default_left`` array; ``None`` (models trained here, where
    binning never emits NaN) means all-left — xgboost's own default."""

    feature: list[int]
    threshold: list[float]
    left: list[int]
    right: list[int]
    value: list[float]
    default_left: list[int] | None = None

    def predict(self, X: np.ndarray) -> np.ndarray:
        """Vectorized traversal: one gather per depth level."""
        feat = np.asarray(self.feature, dtype=np.int64)
        thr = np.asarray(self.threshold, dtype=np.float64)
        lo = np.asarray(self.left, dtype=np.int64)
        hi = np.asarray(self.right, dtype=np.int64)
        val = np.asarray(self.value, dtype=np.float64)
        dl = (
            np.ones(len(feat), dtype=bool)
            if self.default_left is None
            else np.asarray(self.default_left, dtype=np.int64).astype(bool)
        )
        idx = np.zeros(len(X), dtype=np.int64)
        # depth is bounded by node count; loop exits when all rows leaf
        for _ in range(len(feat)):
            at_leaf = feat[idx] < 0
            if at_leaf.all():
                break
            f = np.where(at_leaf, 0, feat[idx])
            x = X[np.arange(len(X)), f]
            # missing routes per the node's trained default branch
            go_left = np.where(np.isnan(x), dl[idx], x < thr[idx])
            nxt = np.where(go_left, lo[idx], hi[idx])
            idx = np.where(at_leaf, idx, nxt)
        return val[idx]


@dataclass
class GBTModel:
    """Driver-sized ensemble: ``predict = base_score + Σ tree(x)``."""

    features: list[str]
    trees: list[Tree] = field(default_factory=list)
    base_score: float = 0.0

    # --- inference ----------------------------------------------------
    def predict(self, X: np.ndarray) -> np.ndarray:
        X = np.asarray(X, dtype=np.float64)
        if X.ndim == 1:
            X = X.reshape(1, -1)
        out = np.full(len(X), self.base_score, dtype=np.float64)
        for t in self.trees:
            out += t.predict(X)
        return out

    def predict_proba(self, X: np.ndarray) -> np.ndarray:
        """Sigmoid of the margin — for ``objective="binary"`` models."""
        return 1.0 / (1.0 + np.exp(-self.predict(X)))

    def feature_importances(self) -> dict[str, int]:
        """Split-count importance per feature (the model card summary;
        xgboost's ``weight`` importance type)."""
        counts = dict.fromkeys(self.features, 0)
        for t in self.trees:
            for fi in t.feature:
                if fi >= 0:
                    counts[self.features[fi]] += 1
        return counts

    # --- serialization ------------------------------------------------
    def to_json(self) -> str:
        return json.dumps(
            {
                "features": self.features,
                "base_score": self.base_score,
                "trees": [t.__dict__ for t in self.trees],
            }
        )

    @classmethod
    def from_json(cls, s: str) -> GBTModel:
        d = json.loads(s)
        return cls(
            features=d["features"],
            base_score=d["base_score"],
            trees=[Tree(**t) for t in d["trees"]],
        )

    @classmethod
    def from_xgboost_dump(
        cls, dump: list[dict | str], features: list[str], base_score: float = 0.5
    ) -> GBTModel:
        """Parse the public ``Booster.get_dump(dump_format="json")``
        format (one JSON object per tree, nodes as nested ``children``
        with ``split``/``split_condition``/``yes``/``no``/``leaf``) —
        the portable way to serve the reference's xgboost artifacts
        without the xgboost package."""
        name_to_idx = {f: i for i, f in enumerate(features)}
        trees = []
        for obj in dump:
            node = json.loads(obj) if isinstance(obj, str) else obj
            feat: list[int] = []
            thr: list[float] = []
            lo: list[int] = []
            hi: list[int] = []
            val: list[float] = []
            dl: list[int] = []

            def add(n: dict) -> int:
                i = len(feat)
                feat.append(-1)
                thr.append(0.0)
                lo.append(i)
                hi.append(i)
                val.append(0.0)
                dl.append(1)
                if "leaf" in n:
                    val[i] = float(n["leaf"])
                    return i
                split = n["split"]
                if split in name_to_idx:
                    feat[i] = name_to_idx[split]
                else:  # xgboost default feature names: f0, f1, ...
                    feat[i] = int(str(split).lstrip("f") or 0)
                thr[i] = float(n["split_condition"])
                # dump format: "missing" names the child id NaN routes to
                dl[i] = int(n.get("missing", n["yes"]) == n["yes"])
                kids = {c["nodeid"]: c for c in n["children"]}
                lo[i] = add(kids[n["yes"]])
                hi[i] = add(kids[n["no"]])
                return i

            add(node)
            trees.append(Tree(feat, thr, lo, hi, val, dl))
        return cls(features=features, trees=trees, base_score=base_score)


# ---------------------------------------------------------------------------
# Distributed training
# ---------------------------------------------------------------------------


def _bin_edges(
    df: DataFrame, features: list[str], n_bins: int
) -> tuple[dict[str, tuple[float, float]], int]:
    """Exact global (min, max) per feature + row count — ONE aggregation.
    Equal-width bins are deterministic (approxQuantile's GK merge is
    partition-order sensitive, which would make training
    non-reproducible). The count sizes the training frame's partitions
    (fit_gbt coalesces tiny inputs so the 3-jobs-per-tree loop doesn't
    schedule 64 tasks to histogram a few thousand rows)."""
    aggs: list[Column] = [F.count(F.lit(1)).alias("n_rows")]
    for f in features:
        aggs += [F.min(f).alias(f"min_{f}"), F.max(f).alias(f"max_{f}")]
    row = df.agg(*aggs).collect()[0]
    edges = {
        f: (float(row[f"min_{f}"]), float(row[f"max_{f}"])) for f in features
    }
    return edges, int(row["n_rows"])


def _leaf(value: float) -> tuple[int, float, int, int, float]:
    return (-1, 0.0, 0, 0, value)


def _select_level_splits(
    hist: list[tuple[int, int, int, float, float, int]],
    splits: dict[int, tuple[int, int]],
    closed: set[int],
    node_sums: dict[int, tuple[float, float, int]],
    n_bins: int,
    min_child_rows: int,
    lam: float,
) -> dict[int, tuple[int, int]]:
    """Best-gain split per open node from one level's (node, feat, bin,
    Σr, Σh, n) histogram — the driver-side half of the histogram
    algorithm, SHARED verbatim by the distributed path and the
    cardinality-gated driver path so both make bit-identical decisions.
    Mutates ``closed`` (nodes with no valid split) and ``node_sums``
    (parents + children born this level)."""
    per_node: dict[int, dict[int, dict[int, tuple[float, float, int]]]] = {}
    for node, feat, bin_, s, hs, n in hist:
        per_node.setdefault(node, {}).setdefault(feat, {})[bin_] = (s, hs, n)
    level_splits: dict[int, tuple[int, int]] = {}
    for nid, by_feat in per_node.items():
        if nid in closed or nid in splits:
            continue
        # sorted bin order: totals are reproducible regardless of
        # collect row order (leaf values derive from them)
        any_f = by_feat[min(by_feat)]
        s_tot = sum(any_f[b][0] for b in sorted(any_f))
        h_tot = sum(any_f[b][1] for b in sorted(any_f))
        n_tot = sum(any_f[b][2] for b in sorted(any_f))
        node_sums[nid] = (s_tot, h_tot, n_tot)
        best_gain, best = 0.0, None
        parent = s_tot * s_tot / (h_tot + lam) if n_tot else 0.0
        # ascending feature order: equal-gain ties break to the lowest
        # feature index, independent of dict/collect order
        for fi in sorted(by_feat):
            bins = by_feat[fi]
            s_l = 0.0
            h_l = 0.0
            n_l = 0
            for b in range(n_bins - 1):
                if b in bins:
                    s_l += bins[b][0]
                    h_l += bins[b][1]
                    n_l += bins[b][2]
                n_r = n_tot - n_l
                if n_l < min_child_rows or n_r < min_child_rows:
                    continue
                h_r = h_tot - h_l
                gain = (
                    s_l * s_l / (h_l + lam)
                    + (s_tot - s_l) ** 2 / (h_r + lam)
                    - parent
                )
                if gain > best_gain + 1e-12:
                    best_gain, best = gain, (fi, b)
        if best is None:
            closed.add(nid)
        else:
            level_splits[nid] = best
            fi, bt = best
            picked = [b for b in sorted(by_feat[fi]) if b <= bt]
            s_l = sum(by_feat[fi][b][0] for b in picked)
            h_l = sum(by_feat[fi][b][1] for b in picked)
            n_l = sum(by_feat[fi][b][2] for b in picked)
            node_sums[2 * nid + 1] = (s_l, h_l, n_l)
            node_sums[2 * nid + 2] = (s_tot - s_l, h_tot - h_l, n_tot - n_l)
    return level_splits


def _fit_gbt_driver(
    df: DataFrame,
    features: list[str],
    label: str,
    edges: dict[str, tuple[float, float]],
    width: dict[str, float],
    n_trees: int,
    max_depth: int,
    n_bins: int,
    learning_rate: float,
    min_child_rows: int,
    objective: str,
    reg_lambda: float,
) -> GBTModel:
    """Small-input escape hatch: the SAME histogram GBDT loop run on
    driver numpy arrays — ONE collect job instead of n_trees×max_depth
    aggregation jobs (the cardinality-gated pattern of
    dedup.connected_components; r8 verdict #7 measured the per-job
    floor at ~0.24 s even for a 1-task 3.5 k-row frame, so 36 jobs =
    ~9 s of pure scheduling). Decision parity with the distributed
    path: split selection is the shared :func:`_select_level_splits`;
    histogram sums accumulate via ``np.add.at`` in row order — the same
    sequential per-group adds a single-partition Spark aggregate does
    (below the gate the distributed frame coalesces to 1 partition), so
    sums are bit-identical for the regression objective (binary differs
    only by exp() ulps between numpy and the JVM); pinned in
    tests/test_gbt.py."""
    m = len(features)
    rows = df.select(
        F.col(label).cast("double").alias("y"),
        *[F.col(f).cast("double").alias(f) for f in features],
    ).collect()
    n = len(rows)
    y = np.fromiter((r["y"] for r in rows), dtype=np.float64, count=n)
    B = np.empty((n, m), dtype=np.int64)
    for i, f in enumerate(features):
        x = np.fromiter((r[f] for r in rows), dtype=np.float64, count=n)
        if np.isnan(x).any():
            raise ValueError(
                f"fit_gbt: feature {f!r} contains NaN — drop or impute "
                "before training (matches the distributed path, which "
                "rejects null bins)"
            )
        # identical IEEE ops to the distributed bin expression
        B[:, i] = np.minimum(
            n_bins - 1,
            np.maximum(
                0, np.floor((x - edges[f][0]) / width[f]).astype(np.int64)
            ),
        )
    y_bar = sum(map(float, y)) / n if n else 0.0  # sequential, as Spark's 1-partition avg
    if objective == "binary":
        p0 = min(max(y_bar, 1e-12), 1 - 1e-12)
        base_score = math.log(p0 / (1 - p0))
    else:
        base_score = y_bar
    model = GBTModel(features=list(features), base_score=base_score)
    margin = np.full(n, base_score, dtype=np.float64)
    lam = reg_lambda
    for _ in range(n_trees):
        if objective == "binary":
            p = 1.0 / (1.0 + np.exp(-margin))
            r_arr, h_arr = y - p, p * (1.0 - p)
        else:
            r_arr, h_arr = y - margin, np.ones(n, dtype=np.float64)
        splits: dict[int, tuple[int, int]] = {}
        closed: set[int] = set()
        node_sums: dict[int, tuple[float, float, int]] = {}
        node = np.zeros(n, dtype=np.int64)
        for _level in range(max_depth):
            n_nodes = int(node.max()) + 1 if n else 1
            hist: list[tuple[int, int, int, float, float, int]] = []
            for fi in range(m):
                s_acc = np.zeros((n_nodes, n_bins), dtype=np.float64)
                h_acc = np.zeros((n_nodes, n_bins), dtype=np.float64)
                c_acc = np.zeros((n_nodes, n_bins), dtype=np.int64)
                np.add.at(s_acc, (node, B[:, fi]), r_arr)
                np.add.at(h_acc, (node, B[:, fi]), h_arr)
                np.add.at(c_acc, (node, B[:, fi]), 1)
                for nid, b in zip(*np.nonzero(c_acc)):
                    hist.append(
                        (int(nid), fi, int(b), float(s_acc[nid, b]),
                         float(h_acc[nid, b]), int(c_acc[nid, b]))
                    )
            level_splits = _select_level_splits(
                hist, splits, closed, node_sums, n_bins, min_child_rows, lam
            )
            if not level_splits:
                break
            splits.update(level_splits)
            for nid, (fi, bt) in level_splits.items():
                mask = node == nid
                node[mask] = np.where(
                    B[mask, fi] <= bt, 2 * nid + 1, 2 * nid + 2
                )
        leaf_val = {
            nid: learning_rate * s / (h + lam)
            for nid, (s, h, cnt) in node_sums.items()
            if nid not in splits and cnt > 0
        }
        model.trees.append(
            _tree_from_splits(splits, leaf_val, features, edges, width, n_bins)
        )
        if leaf_val and n:
            lut = np.zeros(max(leaf_val) + 1, dtype=np.float64)
            for nid, v in leaf_val.items():
                lut[nid] = v
            margin = margin + lut[np.minimum(node, len(lut) - 1)]
    return model


def fit_gbt(
    df: DataFrame,
    features: list[str],
    label: str,
    n_trees: int = 10,
    max_depth: int = 3,
    n_bins: int = 16,
    learning_rate: float = 0.3,
    min_child_rows: int = 5,
    objective: str = "regression",
    reg_lambda: float = 0.0,
    driver_fit_max_rows: int = 200_000,
) -> GBTModel:
    """Histogram GBDT fit where only (nodes × features × bins) gradient
    sums ever reach the driver.

    Per tree level: ``stack`` the m binned columns into long form, ONE
    ``groupBy(node, feature, bin).agg(sum r, count)`` (map-side partial
    agg → tiny shuffle), then driver-side best-gain split selection via
    prefix sums. Node assignment is re-derived each level from the
    accumulated split list as a pure column expression — no per-row
    state, no Python in the scan. Variance-reduction gain:
    ``S_L²/n_L + S_R²/n_R − S²/n`` over the pseudo-residuals.

    ``objective="binary"``: second-order (Newton) logistic boosting in
    the xgboost formulation — trees fit the pseudo-residual
    ``y − σ(margin)`` with per-row hessian ``p(1−p)`` carried through
    the same histogram (one extra sum per bin), leaf =
    ``Σr/(Σh+reg_lambda)``, gain = ``S²/(H+λ)`` form. The model's
    output is the MARGIN (log-odds; ``predict_proba`` applies the
    sigmoid), and base_score is the log-odds of the base rate. Each
    iteration's residual/hessian are pure column expressions (sigmoid
    over the accumulated bin-expressed margin), so per-tree cost is
    one scan per level regardless of objective. With squared loss the
    hessian is 1, so ``Σh == n`` and the formulas reduce exactly to
    the classic mean-residual / variance-reduction ones.
    """
    if objective not in ("regression", "binary"):
        raise ValueError(f"unknown objective {objective!r}")
    m = len(features)
    edges, n_rows = _bin_edges(df, features, n_bins)
    width = {f: max((hi - lo), 1e-12) / n_bins for f, (lo, hi) in edges.items()}

    # Cardinality gate (dedup.connected_components pattern): below the
    # gate the whole fit runs on driver numpy from ONE collect — the
    # n_trees×max_depth job loop is pure scheduling overhead at this
    # size (~0.24 s/job floor measured on a 1-task frame). Above the
    # gate, the distributed histogram path below is the 100 TB shape.
    if n_rows <= driver_fit_max_rows:
        return _fit_gbt_driver(
            df, features, label, edges, width, n_trees, max_depth,
            n_bins, learning_rate, min_child_rows, objective, reg_lambda,
        )

    bin_cols = [
        F.least(
            F.lit(n_bins - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col(f) - F.lit(edges[f][0])) / F.lit(width[f])).cast("int"),
            ),
        ).alias(f"b{i}")
        for i, f in enumerate(features)
    ]
    base = df.select(F.col(label).cast("double").alias("y"), *bin_cols)
    # size partitions to the data: the training loop schedules
    # n_trees x max_depth histogram jobs against this frame, and at
    # fixture scale a few thousand rows spread over the shuffle's 32+
    # partitions makes every job pay ~64 task launches for microseconds
    # of work (r8 verdict #7: job overhead, not compute, was the
    # forecast_gbt floor). coalesce is NARROW (no shuffle) and a
    # deterministic function of the row count, so training stays
    # reproducible; at scale ceil(n/256k) >= the existing partition
    # count and this is a no-op.
    # coalesce never INCREASES partition count, so no current-count
    # probe is needed (and .rdd is banned — Spark Connect): at scale
    # the target exceeds the existing parallelism and this is a no-op
    target = max(1, math.ceil(n_rows / 262_144))
    base = base.coalesce(target)
    base = base.localCheckpoint(eager=False)  # binning computed once; lineage cut

    y_bar = float(base.agg(F.avg("y")).collect()[0][0] or 0.0)
    if objective == "binary":
        p0 = min(max(y_bar, 1e-12), 1 - 1e-12)
        base_score = math.log(p0 / (1 - p0))
    else:
        base_score = y_bar
    stack_expr = "stack({}, {}) as (feat, bin)".format(
        m, ", ".join(f"{i}, b{i}" for i in range(m))
    )

    model = GBTModel(features=list(features), base_score=base_score)
    pred_exprs: list[Column] = []  # per-tree prediction expressed over bins
    # margin folding: every _FOLD_EVERY trees the accumulated margin is
    # materialized as a checkpointed column, so the residual expression
    # each histogram job compiles stays O(_FOLD_EVERY) tree-maps deep
    # instead of growing with the ensemble (measured: marginal tree cost
    # crept 0.9 s -> 1.5 s by tree 12 from codegen alone). Costs one
    # narrow re-materialization of (m+2) columns per fold.
    _FOLD_EVERY = 4
    margin_folded = False

    for _tree_i in range(n_trees):
        pred = F.col("__margin") if margin_folded else F.lit(base_score)
        for e in pred_exprs:
            pred = pred + e
        if objective == "binary":
            pred = F.lit(1.0) / (F.lit(1.0) + F.exp(-pred))
        resid = (F.col("y") - pred).alias("r")
        # hessian: p(1−p) for logistic loss (Newton step, as xgboost);
        # constant 1 for squared loss — then Σh == n exactly and the
        # leaf/gain formulas reduce to the classic mean-residual /
        # variance-reduction forms
        hess = (pred * (1 - pred) if objective == "binary" else F.lit(1.0)).alias("h")

        # splits[node] = (feature_idx, bin_threshold) accumulated per level.
        # node_e is grown LEVEL-WISE: each level's expression references
        # the previous level's exactly (frontier+1) times — a chained
        # when(node==nid, child).otherwise(node). Rebuilding from the
        # full split list one node at a time instead triples the
        # expression per split (3^n blow-up — found the hard way).
        splits: dict[int, tuple[int, int]] = {}
        closed: set[int] = set()
        node_e: Column = F.lit(0)
        # node_sums[nid] = (Σr, Σh, n) over the node's rows — from the
        # node's own histogram row, or (for children born at the last
        # level) from the parent split's left/right partial sums. Leaf
        # values fall out of these, so NO separate leaf-aggregation
        # pass is needed: max_depth corpus passes per tree, not
        # max_depth + 1. Newton leaf = Σr/(Σh+λ); gain =
        # S_L²/(H_L+λ) + S_R²/(H_R+λ) − S²/(H+λ). With h≡1 (regression)
        # these are exactly mean-residual / variance-reduction.
        node_sums: dict[int, tuple[float, float, int]] = {}
        lam = reg_lambda

        for _level in range(max_depth):
            hist = [
                (row["node"], row["feat"], row["bin"],
                 float(row["s"]), float(row["hs"]), int(row["n"]))
                for row in (
                    base.select(
                        node_e.alias("node"), resid, hess, F.expr(stack_expr)
                    )
                    .groupBy("node", "feat", "bin")
                    .agg(
                        F.sum("r").alias("s"),
                        F.sum("h").alias("hs"),
                        F.count("*").alias("n"),
                    )
                    .collect()
                )
            ]
            level_splits = _select_level_splits(
                hist, splits, closed, node_sums, n_bins, min_child_rows, lam
            )
            if not level_splits:
                break
            splits.update(level_splits)
            w = None
            for nid, (fi, bt) in level_splits.items():
                child = F.when(
                    F.col(f"b{fi}") <= bt, F.lit(2 * nid + 1)
                ).otherwise(F.lit(2 * nid + 2))
                w = (w.when if w is not None else F.when)(node_e == nid, child)
            node_e = w.otherwise(node_e)

        # leaf values: Newton step Σr/(Σh+λ) per terminal node, scaled
        # by lr — straight from the tracked histogram sums (no extra
        # pass). h is strictly positive (p∈(0,1) for logistic; 1 for
        # squared loss), so the denominator never vanishes.
        leaf_val = {
            nid: learning_rate * s / (h + lam)
            for nid, (s, h, n) in node_sums.items()
            if nid not in splits and n > 0
        }

        tree = _tree_from_splits(splits, leaf_val, features, edges, width, n_bins)
        model.trees.append(tree)

        # tree prediction over bins for later residuals: a map literal
        # keyed by terminal node id references node_e exactly once
        leaf_map = F.create_map(
            *[F.lit(x) for nv in leaf_val.items() for x in nv]
        )
        pred_exprs.append(F.coalesce(leaf_map[node_e], F.lit(0.0)))

        if (_tree_i + 1) % _FOLD_EVERY == 0 and _tree_i + 1 < n_trees:
            new_margin = (
                F.col("__margin") if margin_folded else F.lit(base_score)
            )
            for e in pred_exprs:
                new_margin = new_margin + e
            base = base.select(
                "y",
                *[f"b{i}" for i in range(m)],
                new_margin.alias("__margin"),
            ).localCheckpoint(eager=False)
            pred_exprs = []
            margin_folded = True

    return model


def _tree_from_splits(
    splits: dict[int, tuple[int, int]],
    leaf_val: dict[int, float],
    features: list[str],
    edges: dict[str, tuple[float, float]],
    width: dict[str, float],
    n_bins: int,
) -> Tree:
    """Convert heap-indexed (node → (feature, bin)) splits + leaf values
    into a flat-array Tree with RAW thresholds (upper edge of the bin):
    ``bin(x) <= bt  ⇔  x < lo + (bt+1)·w`` for in-range x."""
    feat: list[int] = []
    thr: list[float] = []
    lo_: list[int] = []
    hi_: list[int] = []
    val: list[float] = []

    def build(nid: int) -> int:
        i = len(feat)
        feat.append(-1)
        thr.append(0.0)
        lo_.append(i)
        hi_.append(i)
        val.append(0.0)
        if nid in splits:
            fi, bt = splits[nid]
            f = features[fi]
            feat[i] = fi
            thr[i] = edges[f][0] + (bt + 1) * width[f]
            lo_[i] = build(2 * nid + 1)
            hi_[i] = build(2 * nid + 2)
        else:
            val[i] = leaf_val.get(nid, 0.0)
        return i

    build(0)
    return Tree(feat, thr, lo_, hi_, val)


# ---------------------------------------------------------------------------
# DataFrame inference
# ---------------------------------------------------------------------------


def predict_gbt(df: DataFrame, model: GBTModel, out_col: str = "score") -> DataFrame:
    """Arrow-batched ensemble scoring — one pandas UDF over the feature
    columns, zero shuffle; the model travels as a broadcast-sized JSON
    closure constant."""
    import pandas as pd  # noqa: PLC0415

    spec = model.to_json()

    # no type hints: `from __future__ import annotations` stringifies
    # them and PySpark's signature inspection rejects string hints
    # ([UNSUPPORTED_SIGNATURE]) — returnType carries the type instead
    @F.pandas_udf("double")
    def score(*cols):
        mdl = GBTModel.from_json(spec)
        X = np.column_stack([c.to_numpy(dtype=np.float64) for c in cols])
        return pd.Series(mdl.predict(X))

    return df.withColumn(out_col, score(*[F.col(f) for f in model.features]))
