"""Distributed BPE tokenizer training — merge-rule learning at corpus
scale.

Byte-pair encoding training is an iterative count-and-merge loop
(Sennrich et al. 2016): count adjacent symbol pairs across the corpus,
merge the most frequent pair everywhere, repeat. The counting is a
grouped aggregate — exactly what the engine distributes — so the loop
runs as:

1. state = (distinct word, count, symbol array) — word-frequency
   compression first: merging operates on DISTINCT words weighted by
   count, so per-iteration work scales with |vocabulary|, not corpus
   tokens (the corpus is scanned exactly once, up front).
2. per iteration: explode adjacent pairs weighted by word count →
   one vocabulary-bounded aggregate → top-1 pair (deterministic
   tie-break) → apply the merge to every symbol array (Arrow-batched
   pandas UDF — list surgery is sequential per word) →
   ``localCheckpoint`` truncates the growing lineage.

At 100 TB the distinct-word state is still cluster-sized, never
driver-sized: only the single winning pair (a 2-string row) is ever
collected per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"
SEP = "\x00"


def _merge_udf(a: str, b: str):
    import pandas as pd

    from pyspark.sql.types import ArrayType, StringType

    def merge(col):
        def one(seq):
            out, i, n = [], 0, len(seq)
            while i < n:
                if i < n - 1 and seq[i] == a and seq[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            return out

        return col.map(one)

    merge.__annotations__ = {"col": pd.Series, "return": pd.Series}
    return F.pandas_udf(ArrayType(StringType()))(merge)


def word_state(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Initial BPE state: distinct words with corpus counts, split to
    character symbols + end-of-word marker."""
    words = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sym = F.concat(F.split(F.col("w"), ""), F.array(F.lit(END)))
    return words.select("w", "n", sym.alias("sym"))


def _pair_counts(state: DataFrame) -> DataFrame:
    npairs = F.greatest(F.size("sym") - 1, F.lit(0))
    pair = F.explode(
        F.zip_with(
            F.slice("sym", 1, npairs),
            F.slice("sym", 2, npairs),
            lambda x, y: F.concat_ws(SEP, x, y),
        )
    )
    return (
        state.select("n", pair.alias("pair"))
        .groupBy("pair")
        .agg(F.sum("n").alias("freq"))
    )


def train_bpe(
    df: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    min_freq: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` BPE merge rules; returns
    ``[(left, right, freq), ...]`` in merge order. Stops early when no
    pair reaches ``min_freq``."""
    state = word_state(df, text_col).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(state)
            .orderBy(F.desc("freq"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["freq"] < min_freq:
            break
        a, b = top[0]["pair"].split(SEP)
        merges.append((a, b, int(top[0]["freq"])))
        state = state.withColumn("sym", _merge_udf(a, b)(F.col("sym"))).localCheckpoint()
    return merges


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Tokenize text with learned merge rules (per-row pandas UDF
    applying merges in rule order — the same greedy order training
    used, so training words round-trip to single tokens)."""
    import pandas as pd

    from pyspark.sql.types import ArrayType, StringType

    rules = [(a, b) for a, b, _ in merges]

    def tokenize(col):
        def word_pieces(w):
            seq = list(w) + [END]
            for a, b in rules:
                out, i, n = [], 0, len(seq)
                while i < n:
                    if i < n - 1 and seq[i] == a and seq[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(seq[i])
                        i += 1
                seq = out
            return seq

        return col.map(
            lambda t: [p for w in t.split(" ") if w for p in word_pieces(w)]
        )

    tokenize.__annotations__ = {"col": pd.Series, "return": pd.Series}
    udf = F.pandas_udf(ArrayType(StringType()))(tokenize)
    return df.withColumn(out_col, udf(F.col(text_col)))
