"""Reference-implementation parity: the DISTRIBUTED trainers must
produce bit-identical models to sequential numpy replicas of the same
algorithms (same binning, same gain, same tie-breaks). This is the
strong correctness check for fit_gbt / kmeans_lloyd — their registry
queries are rows-only (gbt_train_docs) or SQL-replayed only at fixed
iteration count (kmeans_assign), so algorithm parity is pinned here."""

from __future__ import annotations

import numpy as np
import pytest

from big_data_pr_spark.operators.gbt import GBTModel, fit_gbt

# ---------------------------------------------------------------------------
# numpy replica of fit_gbt (equal-width bins, variance-reduction gain,
# level-order growth, heap node ids, mean-residual leaves × lr)
# ---------------------------------------------------------------------------


def _ref_fit(X, y, n_trees, max_depth, n_bins, lr, min_child):
    n, m = X.shape
    lo = X.min(axis=0)
    hi = X.max(axis=0)
    width = np.maximum(hi - lo, 1e-12) / n_bins
    B = np.clip(np.floor((X - lo) / width).astype(int), 0, n_bins - 1)
    base = float(y.mean())
    pred = np.full(n, base)
    trees = []
    for _ in range(n_trees):
        r = y - pred
        node = np.zeros(n, dtype=int)
        splits = {}
        closed = set()
        for _level in range(max_depth):
            level_splits = {}
            for nid in sorted(set(node.tolist())):
                if nid in closed or nid in splits:
                    continue
                mask = node == nid
                s_tot, n_tot = r[mask].sum(), int(mask.sum())
                parent = s_tot * s_tot / n_tot if n_tot else 0.0
                best_gain, best = 0.0, None
                for fi in range(m):
                    for bt in range(n_bins - 1):
                        lmask = mask & (B[:, fi] <= bt)
                        n_l = int(lmask.sum())
                        n_r = n_tot - n_l
                        if n_l < min_child or n_r < min_child:
                            continue
                        s_l = r[lmask].sum()
                        gain = (
                            s_l * s_l / n_l + (s_tot - s_l) ** 2 / n_r - parent
                        )
                        if gain > best_gain + 1e-12:
                            best_gain, best = gain, (fi, bt)
                if best is None:
                    closed.add(nid)
                else:
                    level_splits[nid] = best
            if not level_splits:
                break
            splits.update(level_splits)
            new_node = node.copy()
            for nid, (fi, bt) in level_splits.items():
                mask = node == nid
                new_node[mask & (B[:, fi] <= bt)] = 2 * nid + 1
                new_node[mask & (B[:, fi] > bt)] = 2 * nid + 2
            node = new_node
        leaf_val = {}
        for nid in sorted(set(node.tolist())):
            leaf_val[nid] = lr * float(r[node == nid].mean())
        trees.append((splits, leaf_val))
        pred = pred + np.array([leaf_val[v] for v in node])
    return base, trees, lo, width


def _flatten_ref_tree(splits, leaf_val, lo, width):
    """Same pre-order flattening + raw thresholds as _tree_from_splits."""
    feat, thr, left, right, val = [], [], [], [], []

    def build(nid):
        i = len(feat)
        feat.append(-1)
        thr.append(0.0)
        left.append(i)
        right.append(i)
        val.append(0.0)
        if nid in splits:
            fi, bt = splits[nid]
            feat[i] = fi
            thr[i] = float(lo[fi] + (bt + 1) * width[fi])
            left[i] = build(2 * nid + 1)
            right[i] = build(2 * nid + 2)
        else:
            val[i] = leaf_val.get(nid, 0.0)
        return i

    build(0)
    return feat, thr, left, right, val


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fit_gbt_matches_numpy_reference(spark, seed):
    rng = np.random.RandomState(seed)
    n = 300
    X = rng.uniform(0, 10, size=(n, 3)).round(3)  # exact dyadic-ish floats
    y = (
        3.0 * (X[:, 0] > 5)
        + 2.0 * (X[:, 1] > 2.5)
        + 0.5 * (X[:, 2] > 7.5)
        + rng.choice([0.0, 0.25], size=n)
    )
    rows = [
        (i, float(X[i, 0]), float(X[i, 1]), float(X[i, 2]), float(y[i]))
        for i in range(n)
    ]
    df = spark.createDataFrame(
        rows, "id long, f0 double, f1 double, f2 double, y double"
    )
    kw = dict(n_trees=5, max_depth=3, n_bins=8, learning_rate=0.5, min_child_rows=5)
    model = fit_gbt(df, ["f0", "f1", "f2"], "y", **{
        "n_trees": kw["n_trees"], "max_depth": kw["max_depth"],
        "n_bins": kw["n_bins"], "learning_rate": kw["learning_rate"],
        "min_child_rows": kw["min_child_rows"],
    })
    base, trees, lo, width = _ref_fit(
        X, y, kw["n_trees"], kw["max_depth"], kw["n_bins"],
        kw["learning_rate"], kw["min_child_rows"],
    )
    assert model.base_score == pytest.approx(base, abs=1e-12)
    assert len(model.trees) == len(trees)
    for t, (splits, leaf_val) in zip(model.trees, trees):
        feat, thr, left, right, val = _flatten_ref_tree(splits, leaf_val, lo, width)
        assert t.feature == feat
        assert t.left == left and t.right == right
        np.testing.assert_allclose(t.threshold, thr, rtol=0, atol=1e-12)
        np.testing.assert_allclose(t.value, val, rtol=0, atol=1e-9)
    # end-to-end: distributed-trained model predicts ≈ reference on X
    ref_model = GBTModel(
        features=["f0", "f1", "f2"],
        base_score=base,
        trees=[
            __import__(
                "big_data_pr_spark.operators.gbt", fromlist=["Tree"]
            ).Tree(*_flatten_ref_tree(s, lv, lo, width))
            for s, lv in trees
        ],
    )
    np.testing.assert_allclose(
        model.predict(X), ref_model.predict(X), rtol=0, atol=1e-9
    )


# ---------------------------------------------------------------------------
# numpy replica of kmeans_lloyd (first-k init, squared L2, lowest-cid
# tie-break, emptied clusters drop out)
# ---------------------------------------------------------------------------


def _ref_kmeans(ids, V, k, iters):
    order = np.argsort(ids, kind="stable")
    cents = {i: V[order[i]].astype(float) for i in range(k)}
    assign = None
    for it in range(iters):
        cid_list = sorted(cents)
        C = np.stack([cents[c] for c in cid_list])
        d = ((V[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        best = d.argmin(axis=1)  # argmin takes first (lowest) on ties
        assign = np.array([cid_list[b] for b in best])
        dist = d[np.arange(len(V)), best]
        if it < iters - 1:
            cents = {
                c: V[assign == c].mean(axis=0)
                for c in sorted(set(assign.tolist()))
            }
    return assign, dist


@pytest.mark.parametrize("seed,k,iters", [(0, 3, 2), (1, 4, 3), (2, 5, 1)])
def test_kmeans_lloyd_matches_numpy_reference(spark, seed, k, iters):
    from big_data_pr_spark.operators.similarity import kmeans_lloyd

    rng = np.random.RandomState(seed)
    n, dim = 120, 6
    V = rng.randn(n, dim).round(4)
    ids = np.arange(n)
    rows = [(int(i), [float(x) for x in V[i]]) for i in ids]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: (r["cluster"], r["dist"])
        for r in kmeans_lloyd(df, k=k, iters=iters).collect()
    }
    assign, dist = _ref_kmeans(ids, V, k, iters)
    for i in ids:
        assert out[i][0] == assign[i], i
        assert out[i][1] == pytest.approx(dist[i], abs=1e-9)
