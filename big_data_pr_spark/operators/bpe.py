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
collected per iteration. Below ``driver_train_max_words`` (r9
cardinality gate) the whole word table collects once and the merge
loop runs in Python — integer pair counts + the same tie-break make
the learned rules bit-identical to the distributed path's.
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


def _merge_seq(seq: list[str], a: str, b: str) -> list[str]:
    """One greedy left-to-right merge pass — the exact logic
    :func:`_merge_udf` runs per row, shared so the driver-gated trainer
    makes bit-identical decisions."""
    out: list[str] = []
    i, n = 0, len(seq)
    while i < n:
        if i < n - 1 and seq[i] == a and seq[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(seq[i])
            i += 1
    return out


def train_bpe(
    df: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    min_freq: int = 2,
    driver_train_max_words: int = 200_000,
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` BPE merge rules; returns
    ``[(left, right, freq), ...]`` in merge order. Stops early when no
    pair reaches ``min_freq``.

    Cardinality gate (fit_gbt / connected_components pattern, r9): the
    training state is the DISTINCT-WORD table — already compressed, and
    at fixture scale each merge round spends ~2 Spark jobs (pair-count
    top-1 + state re-materialization) of pure scheduling overhead on a
    few-thousand-row frame. Below the gate the word table collects once
    and the merge loop runs in Python: pair frequencies are INTEGER
    sums and the tie-break replicates ``ORDER BY freq DESC, pair ASC``
    on the same SEP-joined pair string, so the learned rules are
    bit-identical to the distributed path's (and to the DuckDB oracle
    that replays them). Above the gate the per-round jobs below are the
    100 TB shape — only the winning 2-string pair crosses the driver."""
    state = word_state(df, text_col)
    n_words = state.count()
    merges: list[tuple[str, str, int]] = []
    if n_words <= driver_train_max_words:
        words: list[tuple[int, list[str]]] = [
            (int(r["n"]), list(r["sym"])) for r in state.collect()
        ]
        for _ in range(n_merges):
            freq: dict[str, int] = {}
            for cnt, sym in words:
                for x, y in zip(sym, sym[1:]):
                    key = x + SEP + y
                    freq[key] = freq.get(key, 0) + cnt
            if not freq:
                break
            best = min(freq.items(), key=lambda kv: (-kv[1], kv[0]))
            if best[1] < min_freq:
                break
            a, b = best[0].split(SEP)
            merges.append((a, b, int(best[1])))
            words = [(cnt, _merge_seq(sym, a, b)) for cnt, sym in words]
        return merges
    state = state.localCheckpoint()
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


def bpe_oracle_sql(n_merges: int = 10, min_freq: int = 2) -> str:
    """DuckDB oracle for :func:`train_bpe` over the ``documents`` view:
    the fixed merge rounds UNROLL into chained CTEs (like the PageRank
    and FFD oracles), so the *entire training trajectory* — pair
    counts, deterministic tie-break, greedy merge application — is
    hash-checked against an independent engine.

    The greedy left-to-right non-overlapping merge is replayed with a
    doubled-sentinel string encoding: token lists become
    ``␀␀tok₁␀␀tok₂␀␀…`` (␀ = chr(0), which no token contains), and
    merging pair (a, b) is the literal replace
    ``␀a␀␀b␀ → ␀ab␀`` — each replacement consumes one sentinel from
    each boundary, leaving one behind, so consecutive matches chain
    exactly like the sequential scan's ``i += 2`` and token prefixes
    can never false-match. Pair keys use a single ␀ separator (the
    same byte the Spark side uses), so ``ORDER BY freq DESC, pair``
    breaks ties identically.
    """
    nul = "chr(0)"
    cc = f"{nul}||{nul}"
    parts = [
        f"""WITH v0 AS MATERIALIZED (
  SELECT w, count(*) AS n,
         {cc} || array_to_string(list_append(string_split(w, ''), '</w>'), {cc})
            || {cc} AS s
  FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY w)"""
    ]
    for i in range(1, n_merges + 1):
        parts.extend([
            f"""m{i} AS MATERIALIZED (
  SELECT pair, CAST(freq AS BIGINT) AS freq,
         string_split(pair, {nul})[1] AS a,
         string_split(pair, {nul})[2] AS b,
         {nul} || string_split(pair, {nul})[1] || {cc}
                || string_split(pair, {nul})[2] || {nul} AS pat,
         {nul} || string_split(pair, {nul})[1]
                || string_split(pair, {nul})[2] || {nul} AS rep
  FROM (
    SELECT pair, sum(n) AS freq FROM (
      SELECT n, unnest(list_transform(
        range(1, len(string_split(trim(s, {nul}), {cc}))),
        i -> string_split(trim(s, {nul}), {cc})[i] || {nul}
             || string_split(trim(s, {nul}), {cc})[i + 1])) AS pair
      FROM v{i - 1})
    GROUP BY pair)
  WHERE freq >= {min_freq}
  ORDER BY freq DESC, pair ASC LIMIT 1)""",
            f"""v{i} AS MATERIALIZED (
  SELECT v.w, v.n,
         CASE WHEN m.pat IS NULL THEN v.s ELSE replace(v.s, m.pat, m.rep) END AS s
  FROM v{i - 1} v LEFT JOIN m{i} m ON TRUE)""",
        ])
    winners = "\nUNION ALL ".join(
        f"SELECT CAST({i - 1} AS INTEGER) AS merge_order, a AS \"left\", "
        f"b AS \"right\", freq FROM m{i}"
        for i in range(1, n_merges + 1)
    )
    return ",\n".join(parts) + f"\n{winners}\nORDER BY merge_order"


def bpe_encode_oracle_sql(n_merges: int = 10, min_freq: int = 2) -> str:
    """DuckDB oracle for the tokenizer ROUND-TRIP
    (:func:`train_bpe` → :func:`apply_bpe`): replays training via
    :func:`bpe_oracle_sql`'s CTE chain, then reads each document's BPE
    token count off the final per-word state (every corpus word is in
    the training vocabulary, so encode = vocabulary lookup)."""
    nul = "chr(0)"
    cc = f"{nul}||{nul}"
    train = bpe_oracle_sql(n_merges, min_freq)
    # keep only the WITH chain — drop the winners SELECT block (which
    # starts at merge_order 0)
    ctes = train.split("\nSELECT CAST(0 AS INTEGER)")[0].rstrip().rstrip(",")
    return f"""{ctes},
wordlen AS MATERIALIZED (
  SELECT w, CAST(len(string_split(trim(s, {nul}), {cc})) AS BIGINT) AS n_tok
  FROM v{n_merges}),
enc AS (
  SELECT doc_id, sum(n_tok) AS n_bpe FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents)
  JOIN wordlen USING (w) WHERE w <> '' GROUP BY doc_id)
SELECT d.doc_id,
       CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_whitespace,
       CAST(coalesce(e.n_bpe, 0) AS BIGINT) AS n_bpe
FROM documents d LEFT JOIN enc e USING (doc_id)
ORDER BY d.doc_id"""
