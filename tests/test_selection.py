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


def test_gopher_flags_consistent(spark, sf_dir):
    rows = REGISTRY["gopher_quality_flags"].fn(spark, sf_dir).collect()
    assert rows
    flag_cols = [
        "flag_word_count",
        "flag_mean_word_len",
        "flag_alpha_words",
        "flag_stopwords",
        "flag_top_bigram",
    ]
    for r in rows:
        for c in flag_cols + ["passed"]:
            assert r[c] in (0, 1)
        # passed is exactly the conjunction of the individual flags
        assert r["passed"] == min(r[c] for c in flag_cols)
        assert 0.0 <= r["alpha_word_frac"] <= 1.0
        assert 0.0 <= r["top_bigram_frac"] <= 1.0 + 1e-9


def test_novelty_first_doc_is_fully_novel(spark, sf_dir):
    rows = REGISTRY["doc_novelty_fraction"].fn(spark, sf_dir).collect()
    assert rows
    # the lowest doc_id sees every one of its shingles first
    first = min(rows, key=lambda r: r["doc_id"])
    assert first["novelty"] == 1.0
    for r in rows:
        assert 0 <= r["n_novel"] <= r["n_shingles"]
        assert 0.0 <= r["novelty"] <= 1.0


def test_temperature_weights_flatten_the_mix(spark, sf_dir):
    rows = REGISTRY["mixture_temperature_weights"].fn(spark, sf_dir).collect()
    assert len(rows) >= 2
    for col in ("w_a30", "w_a50", "w_a70", "w_a100"):
        s = sum(r[col] for r in rows)
        assert abs(s - 1.0) < 1e-3
    # lower temperature alpha => flatter mix: the largest source's
    # share shrinks monotonically as alpha drops
    big = max(rows, key=lambda r: r["n_tokens"])
    assert big["w_a30"] <= big["w_a50"] <= big["w_a70"] <= big["w_a100"]
    small = min(rows, key=lambda r: r["n_tokens"])
    assert small["w_a30"] >= small["w_a50"] >= small["w_a70"] >= small["w_a100"]


def test_mmr_prefix_is_relevance_topk_then_diversifies(spark, sf_dir):
    out = REGISTRY["mmr_rerank_lit"].fn(spark, sf_dir).collect()
    assert len(out) == 10
    assert [r["rank"] for r in out] == list(range(1, 11))
    assert len({r["vec_id"] for r in out}) == 10  # no repeats
    # scores are non-increasing only for the FIRST pick vs pure
    # relevance; the invariant that always holds: every score is
    # bounded by lambda * max relevance
    assert all(r["mmr_score"] <= 0.7 * 1.0 + 1e-9 for r in out)


def test_cdc_chunks_partition_docs(spark, sf_dir):
    from big_data_pr_spark.tables import load as _load

    rows = REGISTRY["cdc_chunk_stats"].fn(spark, sf_dir).collect()
    docs = {
        r["doc_id"]: r["n_words"]
        for r in _load(spark, sf_dir, "documents")
        .selectExpr("doc_id", "size(split(text, ' ')) AS n_words")
        .collect()
    }
    assert len(rows) == len(docs)
    for r in rows:
        # chunks tile the doc exactly: n_chunks * avg == total words
        assert abs(r["n_chunks"] * r["avg_chunk_words"] - docs[r["doc_id"]]) < 1e-3
        assert 0 <= r["n_dup_chunks"] <= r["n_chunks"]


def test_jsd_bounded_and_symmetric_pairs(spark, sf_dir):
    import math as _m

    rows = REGISTRY["js_divergence_sources"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["src_a"] < r["src_b"]
        assert -1e-9 <= r["jsd"] <= _m.log(2) + 1e-9


def test_burrows_delta_nonnegative(spark, sf_dir):
    rows = REGISTRY["burrows_delta_sources"].fn(spark, sf_dir).collect()
    assert rows
    deltas = [r["delta"] for r in rows]
    assert all(d >= 0 for d in deltas)
    assert deltas == sorted(deltas)


def test_unigram_lm_viterbi_is_a_distribution_over_pieces(spark, sf_dir):
    rows = REGISTRY["unigram_lm_viterbi"].fn(spark, sf_dir).collect()
    assert rows
    assert all(r["usage"] >= 1 for r in rows)
    assert all(0.0 < r["prob"] <= 1.0 for r in rows)
    usages = [r["usage"] for r in rows]
    assert usages == sorted(usages, reverse=True)
    # pieces respect the max length bound
    assert all(1 <= len(r["piece"]) <= 3 for r in rows)
