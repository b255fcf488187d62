#!/usr/bin/env python
"""Plan (and now GENERATE) the next round's driver window rotation.

Reads DRIVER_LEDGER.json (regenerate first with tools/ledger_update.py
after the new CORRECTNESS file lands) and the query registry, and
reports: which oracle-backed queries have never been driver-verified
(these MUST take window slots — the guard test enforces it), which
current-window entries are re-verifications that can rotate out, and
how many free slots the next window has.

``--suggest`` additionally prints a ready-to-paste 50-name _FRONT for
the next round: flagship first, then never-driver-verified oracle
queries (in _POST_FREEZE declaration order — the builder's priority
order), then already-green family-insurance representatives for any
family the never-verified picks don't cover. FAMILIES below is the
single source of truth for family coverage — the guard test
tests/test_queries_oracle.py::test_driver_window_family_coverage
imports it from here.

Usage: python tools/rotate_window.py [--suggest]
"""

from __future__ import annotations

import ast
import inspect
import json
import os
import re
import subprocess
import sys
import types

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from big_data_pr_spark.queries import REGISTRY  # noqa: E402

import __spark_entry__ as entry  # noqa: E402

FLAGSHIP = "ohlcv_candles_sma"

# Operator families and their registry representatives: every round's
# 50-slot window must keep >= 1 member of each family (guard-enforced).
# Grow a family's list when new members land; never shrink it.
FAMILIES: dict[str, list[str]] = {
    "ohlcv": ["ohlcv_candles_sma", "vwap_daily", "bollinger_bands",
              "atr_14", "obv_running", "stochastic_oscillator_14",
              "ewma_volatility", "cusum_changepoint_daily",
              "pettitt_changepoint", "stl_decompose_daily",
              "hurst_rs_daily", "ljung_box_hourly"],
    "window": ["sma_events", "window_first_last_nth", "gap_fill_forward",
               "gap_fill_interpolate", "merged_active_intervals",
               "interarrival_profile", "weekday_hour_heatmap"],
    "watermark": ["high_watermark", "incremental_new_rows"],
    "streaming-batch": ["sliding_window_stats", "session_window_native"],
    "tpch": ["q1_pricing", "q21_waiting_supplier_v", "returns_analysis",
             "customer_ltv_deciles", "supplier_scorecard"],
    "join": ["asof_join_nearest_click", "join_semi_discounted", "join_anti_customers",
             "salted_join_segment_revenue", "bloom_prefilter_urgent_revenue"],
    "agg-ext": ["grouping_sets_pricing", "string_agg_statuses", "stats_moments",
                "winsorized_stats"],
    "dedup": ["dedup_exact", "dedup_minhash_lsh", "dedup_cluster_assign",
              "dedup_minhash_md5", "dedup_simhash_md5", "dedup_survivorship",
              "substring_dup_fraction", "winnowing_fingerprints"],
    "similarity": ["knn_cosine_bruteforce", "embedding_quantize",
                   "ann_lsh_topk_lit", "ann_ivf_topk_lit",
                   "embedding_pca_project_lit", "pq_adc_topk_lit",
                   "pq_reconstruction_error", "embedding_norm_profile",
                   "lexical_semantic_agreement",
                   "embedding_anisotropy_probe", "ivfpq_adc_topk_lit",
                   "kmeans_cosine_assign", "pq_adc_topk_md5"],
    "text": ["lang_id_confusion", "token_burstiness_top",
             "text_stats", "tfidf_top_terms", "perplexity_scores",
             "char_entropy_hist", "zipf_token_slope", "bpe_encode_tokens",
             "vocab_oov_rate", "heaps_law_fit", "token_coverage_curve"],
    "hygiene": ["compression_ratio_proxy", "contamination_ngram", "boilerplate_ngrams", "repetition_ratio",
                "contamination_transitive", "blocklist_hit_rate",
                "watermark_greenlist_zscore"],
    "sampling": ["stratified_sample_exact", "stratified_sample_hash",
                 "weighted_sample_quality", "token_budget_select",
                 "pack_bins_ffd_global", "corpus_shuffle_shards",
                 "token_budget_waterfill", "weighted_reservoir_docs"],
    "multimodal": ["multimodal_meta", "multimodal_frames",
                   "multimodal_ppm_decode", "multimodal_wav_decode",
                   "multimodal_video_frames", "multimodal_decode",
                   "multimodal_features", "multimodal_resize",
                   "multimodal_phash_groups"],
    "selection": ["dsir_importance_weights", "dsir_bucket_kl",
                  "ccnet_perplexity_buckets", "gopher_quality_flags",
                  "doc_novelty_fraction", "mixture_temperature_weights",
                  "doremi_mixture_weights"],
    "valuation": ["knn_shapley_valuation", "kcenter_coreset_greedy",
                  "t_closeness_audit", "good_turing_smoothing",
                  "hill_tail_index"],
    "linkage": ["fs_linkage_patterns", "em_linkage_step",
                "sorted_neighborhood_stats"],
    "lm": ["kneser_ney_bigram_top", "unigram_lm_viterbi",
           "perplexity_scores", "bpe_fertility_by_lang"],
    "incremental": ["incremental_agg_merge", "snapshot_diff_orders",
                    "matview_incremental_refresh", "scd2_build_customer_priority",
                    "cdc_merge_apply"],
    "stattest": ["cox_ph_ship_priority", "mad_anomalies", "welch_ttest_purchase_vs_view",
                 "chisq_type_weekday", "ks_test_purchase_vs_view",
                 "mannwhitney_value_shift", "kruskal_wallis_value_by_type",
                 "spearman_qty_price_corr", "kendall_tau_sampled",
                 "benjamini_hochberg_types", "mann_kendall_trend",
                 "bootstrap_mean_ci", "runs_test_daily",
                 "friedman_type_ranks", "sharpe_sortino_calmar",
                 "var_cvar_historical", "jarque_bera_returns",
                 "effect_sizes_purchase_view", "sprt_purchase_rate",
                 "lift_gain_deciles", "pr_auc_value",
                 "anova_weekday_revenue", "levene_brown_forsythe",
                 "granger_lag1_purchases", "kaplan_meier_ship_latency",
                 "mutual_info_type_weekday", "did_value_estimate",
                 "price_elasticity_by_brand", "weekend_purchase_contrast",
                 "dunn_posthoc_pairwise", "ab_power_mde",
                 "cuped_variance_reduction", "srm_check_hash_split",
                 "regression_diagnostics_daily",
                 "engle_granger_cointegration",
                 "newey_west_trend_test", "breusch_pagan_daily",
                 "youden_optimal_threshold", "lad_trend_profile"],
    "graph": ["ktruss_suppliers", "recursive_reachability_signup", "pagerank_event_transitions",
              "triangle_count_suppliers", "jaccard_supplier_pairs",
              "degree_assortativity_suppliers"],
    "forecast": ["gbt_score_events", "forecast_linear", "forecast_gbt",
                 "holt_linear_forecast", "pinball_loss_eval",
                 "conformal_interval_coverage", "seasonal_naive_mase",
                 "periodogram_top_periods", "cv_rmse_linreg_daily"],
    "marketing": ["returns_analysis", "customer_ltv_deciles",
                  "cohort_retention", "attribution_last_touch",
                  "rfm_segmentation", "multi_touch_attribution",
                  "cohort_ltv_matrix", "pareto_share_curve",
                  "spend_band_migration", "price_index_fisher_yearly",
                  "markov_attribution_removal", "shapley_attribution_sets"],
    "validation": ["validate_orders", "jsonl_corrupt_quarantine",
                   "schema_evolution_roundtrip", "sequence_gap_audit",
                   "expectation_suite_audit", "order_total_reconciliation",
                   "duplicate_order_pairs", "order_priority_transitions",
                   "fk_containment_profile",
                   "process_capability_ship_latency",
                   "xbar_control_chart_weekly"],
    "profiling": ["corpus_profile", "profile_orders",
                  "doc_length_histogram", "benford_first_digit",
                  "skew_key_deciles", "join_size_profile",
                  "range_partition_boundaries"],
}


def _round_marker_commits() -> dict[int, str]:
    """Map round number -> the 'round N: verdict/...' marker commit.

    The driver commits one marker per judged round; a query whose
    source file changed AFTER the marker of its last driver-green round
    is 'dirty since green' (r11 verdict #3): the ledger certifies bytes
    that no longer exist, so it should jump the re-verification queue.
    """
    try:
        log = subprocess.run(
            ["git", "log", "--format=%H %s"],
            cwd=ROOT, capture_output=True, text=True, check=True,
        ).stdout
    except (OSError, subprocess.CalledProcessError):
        return {}
    markers: dict[int, str] = {}
    for line in log.splitlines():
        sha, _, subject = line.partition(" ")
        m = re.match(r"round (\d+): verdict", subject)
        if m:
            # git log is newest-first; keep the newest marker per round
            markers.setdefault(int(m.group(1)), sha)
    return markers


def _changed_since(commit: str) -> set[str]:
    """Repo-relative paths changed between *commit* and the worktree."""
    try:
        out = subprocess.run(
            ["git", "diff", "--name-only", commit],
            cwd=ROOT, capture_output=True, text=True, check=True,
        ).stdout
    except (OSError, subprocess.CalledProcessError):
        return set()
    return {p.strip() for p in out.splitlines() if p.strip()}


def _def_block(source: str, name: str) -> str | None:
    """Extract the top-level ``def name(...)`` block from *source*.

    Registry query functions are top-level defs; the block runs from
    its ``def`` line (plus decorators) to the next column-0 statement.
    Returns None when the def is absent (new function → dirty).
    """
    lines = source.splitlines()
    start = None
    deco_start = None
    for i, ln in enumerate(lines):
        if not ln or ln[0].isspace():
            continue  # blank / indented continuation: keeps deco block
        if ln.startswith("@"):
            if deco_start is None:
                deco_start = i
            continue
        if re.match(rf"def {re.escape(name)}\s*\(", ln):
            # include the @decorator block (inspect.getsource does)
            start = deco_start if deco_start is not None else i
            def_line = i
            break
        if not ln.startswith(")"):  # column-0 ')' closes a multi-line
            deco_start = None       # decorator call — not a new stmt
    if start is None:
        return None
    end = len(lines)
    for j in range(def_line + 1, len(lines)):
        ln = lines[j]
        if ln and not ln[0].isspace() and not ln.startswith(")"):
            end = j
            break
    return "\n".join(lines[start:end]).rstrip()


def _norm_block(block: str) -> str:
    """Normalize a def block for comparison (r12 ADVICE #2).

    ``_def_block`` extends to the next column-0 statement, so indented
    trailing comments / blank lines after a function's body land in the
    historical block but are absent from ``inspect.getsource``. Strip
    trailing lines that are blank or comment-only from BOTH sides so
    that difference alone never flags a spurious 'dirty'.
    """
    lines = block.rstrip().splitlines()
    while lines and (not lines[-1].strip() or lines[-1].lstrip().startswith("#")):
        lines.pop()
    return "\n".join(lines)


def _blob_at(commit: str, rel: str) -> str | None:
    try:
        return subprocess.run(
            ["git", "show", f"{commit}:{rel}"],
            cwd=ROOT, capture_output=True, text=True, check=True,
        ).stdout
    except (OSError, subprocess.CalledProcessError):
        return None


_DEPS_CACHE: dict = {}


def _callable_deps(fn) -> tuple:
    """Package functions that *fn*'s source references (one hop).

    r12 gap: the query-fn def block alone misses operator rewrites —
    f3817f2 rewrote ``operators/dedup.py::simhash`` while the simhash
    query fns were byte-identical, so staleness_rank saw them clean.
    Parse the def block for ``name(...)`` / ``module.attr`` references
    and resolve through ``fn.__globals__`` to plain module-level
    functions defined under big_data_pr_spark. Methods, lambdas and
    closures are skipped — this is a dirtiness signal, not a call
    graph; misses fail toward 'clean', which the oldest-green rotation
    tier eventually covers anyway.
    """
    cached = _DEPS_CACHE.get(fn)
    if cached is not None:
        return cached
    try:
        tree = ast.parse(inspect.getsource(fn))
    except (OSError, TypeError, SyntaxError, IndentationError):
        _DEPS_CACHE[fn] = ()
        return ()
    g = getattr(fn, "__globals__", {})
    deps: list = []
    seen_ids: set[int] = set()
    for node in ast.walk(tree):
        obj = None
        if isinstance(node, ast.Attribute) and isinstance(node.value, ast.Name):
            mod = g.get(node.value.id)
            if (isinstance(mod, types.ModuleType)
                    and mod.__name__.startswith("big_data_pr_spark")):
                obj = getattr(mod, node.attr, None)
        elif (isinstance(node, ast.Attribute)
                and isinstance(node.value, ast.Subscript)
                and isinstance(node.value.value, ast.Name)
                and isinstance(node.value.slice, ast.Constant)):
            # query composition: REGISTRY["other_query"].fn(spark, sf)
            # is a real dependency channel (the eval-metrics family)
            container = g.get(node.value.value.id)
            if isinstance(container, dict):
                obj = getattr(container.get(node.value.slice.value), node.attr, None)
        elif isinstance(node, ast.Name):
            obj = g.get(node.id)
        if (isinstance(obj, types.FunctionType) and obj is not fn
                and id(obj) not in seen_ids
                and getattr(obj, "__module__", "").startswith("big_data_pr_spark")):
            seen_ids.add(id(obj))
            deps.append(obj)
    out = tuple(deps)
    _DEPS_CACHE[fn] = out
    return out


def _fn_dirty(fn, commit: str, changed: set[str],
              blob_cache: dict, seen: dict, depth: int = 3) -> bool:
    """True when *fn* or any (transitive, ≤ depth hops) package
    function it references changed between *commit* and the worktree."""
    try:
        src_file = inspect.getsourcefile(fn) or ""
        rel = os.path.relpath(os.path.abspath(src_file), ROOT)
    except (TypeError, ValueError):
        return True
    if rel.startswith(".."):
        return False  # outside the repo (pyspark/stdlib) — not ours
    key = (rel, getattr(fn, "__qualname__", fn.__name__))
    if key in seen:
        return seen[key]
    seen[key] = False  # cycle guard while this node is in progress
    dirty = False
    if rel in changed:
        if rel not in blob_cache:
            blob_cache[rel] = _blob_at(commit, rel)
        old = blob_cache[rel]
        if old is None:
            dirty = True
        else:
            try:
                now = inspect.getsource(fn)
            except (OSError, TypeError):
                now = ""
            then = _def_block(old, fn.__name__)
            dirty = then is None or _norm_block(then) != _norm_block(now)
    if not dirty and depth > 0:
        for dep in _callable_deps(fn):
            if _fn_dirty(dep, commit, changed, blob_cache, seen, depth - 1):
                dirty = True
                break
    seen[key] = dirty
    return dirty


def staleness_rank(ledger) -> list[tuple[bool, int, str]]:
    """Risk-ranked re-verification order for already-green queries.

    Returns (dirty, last_green_round, name) triples sorted so that
    queries whose registry source file changed after their last green
    round come first (oldest green first within the dirty set), then
    clean queries oldest-green-first. This is the r11 verdict's #3:
    'modified since last green' is the one rotation signal that tracks
    risk — alphabetical top-up re-verifies random already-safe queries.
    """
    markers = _round_marker_commits()
    changed_cache: dict[int, set[str]] = {}
    blob_caches: dict[int, dict] = {}
    seen_caches: dict[int, dict] = {}
    ranked: list[tuple[bool, int, str]] = []
    for name in ledger:
        if name not in REGISTRY:
            continue
        last_green = max(e["round"] for e in ledger[name])
        # r12 ADVICE #3: when the green round has no marker commit,
        # fall back to the nearest OLDER marker (its diff is a superset
        # of 'since the green' — fails toward dirty, the safe side);
        # with no older marker at all, mark dirty outright.
        marker_round = last_green
        if marker_round not in markers:
            older = [r for r in markers if r < last_green]
            marker_round = max(older) if older else None
        if marker_round is None:
            ranked.append((True, last_green, name))
            continue
        if marker_round not in changed_cache:
            changed_cache[marker_round] = _changed_since(markers[marker_round])
            blob_caches[marker_round] = {}
            seen_caches[marker_round] = {}
        # function-level, dependency-aware (file-level flagged 217/406;
        # def-block-only missed the f3817f2 operator rewrite): a query
        # is dirty when its OWN def block or any package function it
        # (transitively, ≤3 hops) references changed since the marker.
        dirty = _fn_dirty(
            REGISTRY[name].fn, markers[marker_round],
            changed_cache[marker_round], blob_caches[marker_round],
            seen_caches[marker_round],
        )
        ranked.append((dirty, last_green, name))
    # dirty first (False sorts before True, so negate), then oldest green
    ranked.sort(key=lambda t: (not t[0], t[1], t[2]))
    return ranked


def load_state():
    with open(os.path.join(ROOT, "DRIVER_LEDGER.json")) as f:
        ledger = json.load(f)["queries"]
    oracle_backed = {n for n, s in REGISTRY.items() if s.oracle is not None}
    never = sorted(oracle_backed - set(ledger))
    return ledger, oracle_backed, never


def suggest(ledger, never) -> list[str]:
    """A 50-name _FRONT for the next round.

    Priority: flagship, then never-driver-verified oracle-backed
    queries, then never-RUN rows-only queries (their weaker rows-only
    driver check still needs a window slot to be recorded — the r11
    spill plan seats the 14 of them in r12), then family insurance /
    already-green top-up."""
    picks: list[str] = [FLAGSHIP]
    # never-verified in _POST_FREEZE declaration order (builder priority),
    # then any stragglers alphabetically — but names that are a family's
    # ONLY never-verified representative jump the queue, so family
    # coverage is satisfied by rotation targets instead of spending
    # slots on already-green insurance reps
    pf_order = [n for n in entry._POST_FREEZE if n in never]
    rest = [n for n in never if n not in set(pf_order) and n != FLAGSHIP]
    queue = pf_order + sorted(rest)
    never_set = set(queue)
    priority: list[str] = []
    for names in FAMILIES.values():
        fam_never = [n for n in queue if n in set(names)]
        if fam_never and fam_never[0] not in priority:
            priority.append(fam_never[0])
    queue = priority + [n for n in queue if n not in set(priority)]
    for n in queue:
        if len(picks) >= 50:
            break
        if n not in picks:
            picks.append(n)
    # never-RUN rows-only queries come next: the driver's rows-only
    # check is weaker but it is still the only driver-side record these
    # queries can ever get (each decision is also covered by a green
    # md5/lit twin — COVERAGE.md). Seated ALPHABETICALLY by design
    # (r11 ADVICE #3): rows-only picks have no oracle-risk ordering
    # signal, and a deterministic name sort keeps partial spills
    # reproducible; _POST_FREEZE declaration order applies only to
    # oracle-backed picks, where registration order encodes priority.
    rows_only_never = sorted(
        n for n in REGISTRY
        if REGISTRY[n].oracle is None and n not in ledger and n not in picks
    )
    for n in rows_only_never:
        if len(picks) >= 50:
            break
        picks.append(n)
    # family insurance (r8 relaxation, per r7 verdict #1/#2: burn debt):
    # a family is covered if it has a window rep OR any driver-green
    # member in the ledger — fully-certified families no longer spend
    # re-verification slots. Only fill a green rep for a family with
    # neither (should not happen once every family has landed once).
    for fam, names in FAMILIES.items():
        if any(n in picks for n in names) or any(n in ledger for n in names):
            continue
        green = [n for n in names if n in ledger]
        if green and len(picks) < 50:
            picks.append(green[0])
    # top up with already-green representatives if under 50 —
    # RISK-RANKED, not alphabetical (r11 verdict #3): queries whose
    # source file changed after their last driver-green round first
    # (their ledger green certifies bytes that no longer exist), then
    # oldest-green-first rotation so stale certifications refresh.
    if len(picks) < 50:
        for dirty, last_green, n in staleness_rank(ledger):
            if n not in picks:
                picks.append(n)
            if len(picks) >= 50:
                break
    return picks[:50]


def main() -> None:
    ledger, oracle_backed, never = load_state()
    rows_only = set(REGISTRY) - oracle_backed
    never_rows = sorted(rows_only - set(ledger))
    window = list(entry._FRONT)
    reverify = [n for n in window if n in ledger]

    if "--suggest" in sys.argv:
        picks = suggest(ledger, never)
        # a family is covered by a window pick OR any driver-green
        # ledger member (the r8 relaxation the guard test enforces)
        missing_fams = [
            f for f, ns in FAMILIES.items()
            if not any(n in picks for n in ns)
            and not any(n in ledger for n in ns)
        ]
        print("# suggested _FRONT for the next round "
              f"({len([n for n in picks if n not in ledger])} never-verified, "
              f"{len(picks)} total; families uncovered by window+ledger: "
              f"{missing_fams or 'none'})")
        print("_FRONT = [")
        for n in picks:
            print(f'    "{n}",')
        print("]")
        return

    print(f"registry: {len(REGISTRY)} ({len(oracle_backed)} oracle, "
          f"{len(rows_only)} rows-only); ledger: {len(ledger)} driver-verified")
    print(f"\nnever-verified ORACLE queries ({len(never)}) — "
          "must occupy window slots (guard-enforced):")
    for n in never:
        marker = "in-window" if n in window else "** MISSING FROM WINDOW **"
        print(f"  {n}  [{marker}]")
    print(f"\nnever-run ROWS-ONLY queries ({len(never_rows)}) — optional slots:")
    for n in never_rows:
        print(f"  {n}{'  [in-window]' if n in window else ''}")
    print(f"\ncurrent window re-verifications ({len(reverify)}) — rotation "
          "candidates once their families stay covered:")
    for n in reverify:
        kinds = {e["kind"] for e in ledger[n]}
        print(f"  {n}  (verified r{sorted(e['round'] for e in ledger[n])}, "
              f"{'/'.join(sorted(kinds))})")
    free = 50 - len([n for n in window if n not in ledger])
    print(f"\nwindow capacity: 50; never-verified in window: "
          f"{len([n for n in window if n not in ledger])}; "
          f"slots spendable on re-verification/rotation: {free}")


if __name__ == "__main__":
    main()
