"""Unit tests for the window-rotation tool (r11 verdict #3: risk-ranked
re-verification — 'dirty since last green' must outrank alphabetical)."""

import json
import os

from big_data_pr_spark.queries import REGISTRY
from tools.rotate_window import (
    FLAGSHIP,
    _callable_deps,
    _def_block,
    _norm_block,
    staleness_rank,
    suggest,
)

ROOT = os.path.join(os.path.dirname(__file__), "..")


def _ledger():
    with open(os.path.join(ROOT, "DRIVER_LEDGER.json")) as f:
        return json.load(f)["queries"]


def test_def_block_includes_decorators():
    """Registry functions carry an @register(...) decorator whose SQL
    oracle is part of the certified pair; the historical-source
    extraction must span it (and its column-0 closing paren) or every
    query reads as dirty the moment inspect.getsource is compared."""
    src = (
        "import x\n"
        "\n"
        "@register(\n"
        '    "q_one",\n'
        '    "SELECT 1",\n'
        ")\n"
        "def q_one(spark, sf):\n"
        "    return spark.range(1)\n"
        "\n"
        "@register(\n"
        '    "q_two",\n'
        '    "SELECT 2",\n'
        ")\n"
        "def q_two(spark, sf):\n"
        "    return spark.range(2)\n"
    )
    blk = _def_block(src, "q_one")
    assert blk is not None
    assert blk.startswith("@register(")
    assert '"SELECT 1"' in blk and "range(1)" in blk
    assert "q_two" not in blk
    # plain def without decorator still extracts
    assert _def_block("def f():\n    pass\n", "f").startswith("def f(")
    # absent def → None (new function reads as dirty)
    assert _def_block(src, "q_missing") is None


def test_norm_block_strips_trailing_comment_noise():
    """r12 ADVICE #2: _def_block extends to the next column-0 statement,
    so indented trailing comments/blank lines after the body land in the
    historical block but not in inspect.getsource — normalization must
    make that difference invisible to the dirty comparison."""
    body = "def f():\n    return 1"
    with_noise = body + "\n\n    # trailing indented comment\n   \n"
    assert _norm_block(with_noise) == _norm_block(body)
    # a REAL trailing statement still differs
    assert _norm_block(body + "\n    x = 2") != _norm_block(body)


def test_callable_deps_sees_operator_and_registry_composition():
    """r13 upgrade (r12 verdict #1 gap): staleness must track the
    functions a query CALLS, not just its own def block — f3817f2
    rewrote operators/dedup.py::simhash while every simhash query fn
    stayed byte-identical. Two real channels are pinned here:
    module-attr operator calls (dedup.simhash_pairs) and
    REGISTRY["other"].fn composition (the eval-metrics family)."""
    dep_names = {
        (d.__module__, d.__name__)
        for d in _callable_deps(REGISTRY["dedup_simhash"].fn)
    }
    assert ("big_data_pr_spark.operators.dedup", "simhash_pairs") in dep_names
    # transitively (hop 2): simhash_pairs references simhash itself
    hop2 = {
        d.__name__
        for dep in _callable_deps(REGISTRY["dedup_simhash"].fn)
        for d in _callable_deps(dep)
    }
    assert "simhash" in hop2
    # REGISTRY["..."].fn composition resolves to the composed query fns
    # (minhash_eval_metrics kept the REGISTRY composition; its simhash
    # twin moved to the shared-tokenization operator prefix in 7c3503c,
    # so it now pins the module-attr operator channel instead)
    eval_deps = {
        d.__name__ for d in _callable_deps(REGISTRY["minhash_eval_metrics"].fn)
    }
    assert {"dedup_ngram_jaccard", "dedup_minhash_md5"} <= eval_deps
    simhash_eval_deps = {
        d.__name__ for d in _callable_deps(REGISTRY["simhash_eval_metrics"].fn)
    }
    assert {"tokens_frame", "jaccard_pairs", "simhash_pairs_md5"} <= simhash_eval_deps


def test_staleness_rank_missing_marker_falls_back():
    """r12 ADVICE #3: a green round with no marker commit must not read
    as silently clean — it falls back to the nearest OLDER marker
    (superset diff, fails toward dirty), or dirty outright when no
    older marker exists."""
    fake = {next(iter(REGISTRY)): [{"round": 0, "kind": "hash"}]}
    ranked = staleness_rank(fake)
    assert len(ranked) == 1
    dirty, last_green, _name = ranked[0]
    assert last_green == 0
    assert dirty, "round with no (older) marker must rank dirty, not clean"


def test_staleness_rank_order_invariant():
    """Dirty-since-green queries must ALL precede clean ones; within
    each group the order is oldest-green-first, then name — the r11
    verdict's replacement for alphabetical top-up."""
    ranked = staleness_rank(_ledger())
    assert ranked, "ledger should not be empty"
    dirty_flags = [d for d, _, _ in ranked]
    # no clean entry before a dirty one
    first_clean = dirty_flags.index(False) if False in dirty_flags else len(ranked)
    assert True not in dirty_flags[first_clean:], (
        "dirty entries must form a contiguous prefix"
    )
    for group_flag in (True, False):
        grp = [(r, n) for d, r, n in ranked if d is group_flag]
        assert grp == sorted(grp), f"group dirty={group_flag} not (round, name) sorted"


def test_suggest_window_invariants():
    """The 50-name suggestion: flagship first, every never-verified
    oracle query seated (while slots remain), rows-only never-run
    seated alphabetically (documented design), top-up follows
    staleness_rank order."""
    ledger = _ledger()
    oracle_backed = {n for n, s in REGISTRY.items() if s.oracle is not None}
    never = sorted(oracle_backed - set(ledger))
    picks = suggest(ledger, never)
    assert len(picks) == 50 and len(set(picks)) == 50
    assert picks[0] == FLAGSHIP
    unseated = [n for n in never if n not in picks]
    assert not unseated or len(never) > 49, (
        f"never-verified left out despite free slots: {unseated}"
    )
    # rows-only never-run block is alphabetical where present
    rows_only_never = [
        n for n in picks
        if REGISTRY[n].oracle is None and n not in ledger
    ]
    assert rows_only_never == sorted(rows_only_never)
    # top-up (already-green picks) follows staleness_rank order
    green_picks = [n for n in picks if n in ledger and n != FLAGSHIP]
    rank_pos = {n: i for i, (_, _, n) in enumerate(staleness_rank(ledger))}
    ranked_green = [n for n in green_picks if n in rank_pos]
    assert [rank_pos[n] for n in ranked_green] == sorted(
        rank_pos[n] for n in ranked_green
    ), "top-up picks must appear in staleness_rank order"
