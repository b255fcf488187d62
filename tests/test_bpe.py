"""Distributed BPE training: hand-checkable merges (the Sennrich
worked example), determinism, and round-trip tokenization."""

from __future__ import annotations

from big_data_pr_spark.operators.bpe import END, apply_bpe, train_bpe


def _corpus(spark):
    # Sennrich et al. worked example: low*5 lower*2 newest*6 widest*3
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    return spark.createDataFrame([(1, text)], "doc_id long, text string")


def test_bpe_first_merges_match_hand_computation(spark):
    merges = train_bpe(_corpus(spark), n_merges=4)
    pairs = [(a, b) for a, b, _ in merges]
    # es: 6+3=9 -> est: 9 -> est</w>: 9 (then 'lo': 5+2=7)
    assert pairs[0] == ("e", "s")
    assert merges[0][2] == 9
    assert pairs[1] == ("es", "t")
    assert pairs[2] == ("est", END)
    assert pairs[3] == ("l", "o")
    assert merges[3][2] == 7


def test_bpe_deterministic_and_applies(spark):
    corpus = _corpus(spark)
    m1 = train_bpe(corpus, n_merges=6)
    m2 = train_bpe(corpus, n_merges=6)
    assert m1 == m2
    # training words round-trip: 'newest' collapses to few pieces,
    # every piece is a substring chain ending with the end marker
    toks = (
        apply_bpe(spark.createDataFrame([(1, "newest lowest")], "id long, text string"), m1)
        .collect()[0]["bpe_tokens"]
    )
    assert "".join(toks).replace(END, "") == "newestlowest"
    # 'est</w>' was learned as a unit -> appears as one piece
    assert "est" + END in toks


def test_bpe_min_freq_stops(spark):
    df = spark.createDataFrame([(1, "ab cd ef")], "id long, text string")
    # every pair occurs once -> below min_freq=2 -> no merges learned
    assert train_bpe(df, n_merges=10, min_freq=2) == []


def test_driver_train_matches_distributed_exactly(spark):
    """r9: below the word-count gate train_bpe runs the merge loop on
    the driver. Pair counts are integer sums and the tie-break
    replicates ORDER BY freq DESC, pair ASC, so the rule list must be
    BIT-IDENTICAL between paths."""
    rows = [
        ("the cat sat on the mat",),
        ("the cat ate the rat",),
        ("a cat and a rat and a mat",),
        ("low lower lowest",),
    ] * 5
    df = spark.createDataFrame(rows, "text string")
    drv = train_bpe(df, n_merges=12, min_freq=2)
    dist = train_bpe(df, n_merges=12, min_freq=2, driver_train_max_words=0)
    assert drv == dist
    assert len(drv) > 3
