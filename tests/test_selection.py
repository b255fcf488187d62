"""Behavioral invariants for the data-selection family
(queries/selection_queries.py) — the selection-semantics properties the
value-hash oracle can't express (budget adherence, directionality,
per-language balance)."""

from __future__ import annotations

import math

from big_data_pr_spark.queries import REGISTRY


def test_dsir_selects_exact_budget_toward_target(spark, sf_dir):
    rows = REGISTRY["dsir_importance_weights"].fn(spark, sf_dir).collect()
    n = len(rows)
    assert n > 0
    picked = [r for r in rows if r["selected"] == 1]
    # hard budget: exactly ceil(25%) documents selected
    assert len(picked) == math.ceil(0.25 * n)
    # directionality: resampling toward lang='en' must over-represent
    # en among the selected vs the corpus base rate
    en_base = sum(r["lang"] == "en" for r in rows) / n
    en_sel = sum(r["lang"] == "en" for r in picked) / len(picked)
    assert en_sel > en_base
    # and en docs score higher on average than non-en docs (per token,
    # so doc length doesn't confound the check)
    en_avg = _mean(r["logratio"] / r["n_tok"] for r in rows if r["lang"] == "en")
    other_avg = _mean(r["logratio"] / r["n_tok"] for r in rows if r["lang"] != "en")
    assert en_avg > other_avg


def _mean(it):
    vals = list(it)
    return sum(vals) / len(vals)


def test_dsir_kl_nonnegative_and_consistent(spark, sf_dir):
    r = REGISTRY["dsir_bucket_kl"].fn(spark, sf_dir).first()
    # smoothed KL is strictly positive unless the slices coincide
    assert r["kl_target_raw"] >= 0.0
    assert r["kl_raw_target"] >= 0.0
    assert r["n_buckets"] == 256
    assert 0 < r["target_tokens"] < r["raw_tokens"]


def test_ccnet_terciles_balanced_per_lang(spark, sf_dir):
    rows = REGISTRY["ccnet_perplexity_buckets"].fn(spark, sf_dir).collect()
    by_lang: dict[str, dict[str, list[float]]] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], {}).setdefault(r["bucket"], []).append(r["nll"])
    for lang, buckets in by_lang.items():
        counts = {b: len(v) for b, v in buckets.items()}
        # ntile(3): bucket sizes differ by at most one
        assert max(counts.values()) - min(counts.values()) <= 1, (lang, counts)
        # head is the LOW-perplexity (high-quality) end
        if "head" in buckets and "tail" in buckets:
            assert max(buckets["head"]) <= min(buckets["tail"]) + 1e-9
