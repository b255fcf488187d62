"""Property-based tests (hypothesis): operator invariants that must
hold on arbitrary inputs, not just fixtures. Example counts are kept
small — every example is a real Spark job."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from big_data_pr_spark.operators.skew import salted_join
from big_data_pr_spark.operators.windows import sma

SETTINGS = dict(max_examples=5, deadline=None)

# (key, value) rows with deliberately clumpy keys so joins/windows see
# both hot and singleton groups
ROWS = st.lists(
    st.tuples(st.integers(0, 3), st.integers(-1000, 1000)),
    min_size=1,
    max_size=40,
)


@given(big=ROWS, dim_keys=st.sets(st.integers(0, 3)))
@settings(**SETTINGS)
def test_salted_join_equivalence(spark, big, dim_keys):
    b = spark.createDataFrame(
        [(k, i, v) for i, (k, v) in enumerate(big)], "k long, rid long, v long"
    )
    d = spark.createDataFrame([(k, k * 10) for k in dim_keys] or [(99, 0)], "k long, seg long")
    plain = sorted(
        tuple(r) for r in b.join(d, "k", "left").select("k", "rid", "seg").collect()
    )
    salted = sorted(
        tuple(r)
        for r in salted_join(b, d, "k", n_salt=4, how="left")
        .select("k", "rid", "seg")
        .collect()
    )
    assert salted == plain


@given(vals=st.lists(st.floats(-100, 100, allow_nan=False), min_size=1, max_size=30))
@settings(**SETTINGS)
def test_sma_matches_pandas_rolling(spark, vals):
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "i long, v double"
    ).withColumn("g", F.lit("a"))
    out = (
        sma(df, "v", ["g"], ["i"], 7)
        .orderBy("i")
        .select("sma_7")
        .toPandas()["sma_7"]
    )
    expect = pd.Series(vals).rolling(7, min_periods=1).mean()
    assert all(abs(a - b) < 1e-9 for a, b in zip(out, expect))


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=20,
    )
)
@settings(**SETTINGS)
def test_connected_components_matches_union_find(spark, edges):
    """Distributed min-label propagation must produce exactly the
    partition a sequential union-find produces, with each component
    labeled by its minimum node id — on arbitrary graphs (cycles,
    chains, self-merging stars), not just near-dup cliques."""
    from big_data_pr_spark.operators.dedup import connected_components

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {n: find(n) for n in parent}

    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "id_a long, id_b long"
    )
    got = {r["node"]: r["label"] for r in connected_components(pairs).collect()}
    assert got == expected


@given(
    gaps=st.lists(st.integers(1, 4000), min_size=1, max_size=25),
)
@settings(**SETTINGS)
def test_sessionize_invariants(spark, gaps):
    """Sessions partition the events; intra-session gaps ≤ 30 min;
    consecutive sessions are separated by > 30 min."""
    from big_data_pr_spark.queries.events_queries import sessionize_events  # noqa: F401
    from pyspark.sql import Window

    ts = [0]
    for g in gaps:
        ts.append(ts[-1] + g)
    df = spark.createDataFrame(
        [(1, i, t) for i, t in enumerate(ts)], "user_id long, event_id long, sec long"
    ).select("user_id", "event_id", F.timestamp_seconds("sec").alias("ts"), F.lit(1.0).alias("value"))

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    numbered = df.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    ).withColumn(
        "sess_no", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    rows = sorted((r["ts"].timestamp(), r["sess_no"]) for r in numbered.collect())
    assert len(rows) == len(ts)  # partition: every event in exactly one session
    for (t0, s0), (t1, s1) in zip(rows, rows[1:]):
        if s1 == s0:
            assert t1 - t0 <= 1800  # intra-session gap bounded
        else:
            assert s1 == s0 + 1 and t1 - t0 > 1800  # boundary = real gap


@given(
    n_tokens=st.integers(1, 300),
    window=st.integers(2, 64),
    stride_frac=st.floats(0.3, 1.0),
)
@settings(**SETTINGS)
def test_chunk_tokens_total_coverage(spark, n_tokens, window, stride_frac):
    """Chunking invariants on arbitrary shapes: chunks tile [0, n) with
    the configured overlap, never exceed the window, and the last chunk
    always reaches the end of the document."""
    from big_data_pr_spark.operators.text import chunk_tokens

    stride = max(1, int(window * stride_frac))
    text = " ".join(f"w{i}" for i in range(n_tokens))
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    chunks = sorted(
        (r["chunk_id"], r["n_chunk_tokens"], r["chunk"])
        for r in chunk_tokens(df, window=window, stride=stride).collect()
    )
    covered = set()
    for cid, n_chunk, chunk in chunks:
        assert 1 <= n_chunk <= window
        assert len(chunk.split(" ")) == n_chunk
        covered.update(range(cid * stride, cid * stride + n_chunk))
    assert covered == set(range(n_tokens))
    last_cid, last_n, _ = chunks[-1]
    assert last_cid * stride + last_n == n_tokens


@given(
    vec=st.lists(
        st.floats(-1e3, 1e3, allow_nan=False, width=32), min_size=1, max_size=32
    )
)
@settings(**SETTINGS)
def test_quantize_int8_error_bound(spark, vec):
    """Quantization invariant: every reconstructed element is within
    scale/2 of the original (half-up rounding), codes fit int8."""
    from big_data_pr_spark.operators.similarity import quantize_int8

    df = spark.createDataFrame([(0, vec)], "vec_id long, embedding array<float>")
    r = quantize_int8(df, keep_vec=True).collect()[0]
    # float32 storage: compare against the float32 value Spark read
    import numpy as np

    stored = np.asarray(vec, dtype=np.float32).astype(np.float64)
    scale = max(abs(x) for x in stored) / 127.0 if any(stored) else 0.0
    assert all(-127 <= q <= 127 for q in r["q_vec"])
    if scale > 0:
        recon = np.asarray(r["q_vec"], dtype=np.float64) * scale
        assert np.all(np.abs(stored - recon) <= scale / 2 + 1e-12)
        assert r["rms_err"] <= scale / 2 + 1e-9


@given(
    changesets=st.lists(
        st.lists(
            st.tuples(
                st.integers(0, 5),                  # key
                st.sampled_from(["I", "U", "D"]),   # op
                st.integers(-100, 100),             # value payload
            ),
            min_size=1,
            max_size=8,
        ),
        min_size=1,
        max_size=3,
    )
)
@settings(**SETTINGS)
def test_cdc_merge_matches_dict_model(spark, changesets):
    """Applying arbitrary I/U/D changesets sequentially through
    merge_changes must equal the naive last-wins dict model."""
    from big_data_pr_spark.operators.cdc import merge_changes

    schema = "k long, v long, op string, seq long"
    table = spark.createDataFrame([], "k long, v long")
    model: dict[int, int] = {}
    seq = 0
    for cs in changesets:
        rows = []
        staged: dict[int, tuple[int, str, int]] = {}
        for k, op, v in cs:
            seq += 1
            rows.append((k, v, op, seq))
            # model: highest seq per key wins within the changeset
            staged[k] = (seq, op, v)
        for k, (_, op, v) in staged.items():
            if op == "D":
                model.pop(k, None)
            else:
                model[k] = v
        changes = spark.createDataFrame(rows, schema)
        table = merge_changes(table, changes, "k", "seq")
    got = {r["k"]: r["v"] for r in table.collect()}
    assert got == model


@given(
    intervals=st.lists(
        st.tuples(st.integers(0, 500_000), st.integers(1, 400_000)),
        min_size=1,
        max_size=8,
    ),
    points=st.lists(st.integers(0, 1_000_000), min_size=1, max_size=20),
    width=st.sampled_from([1, 7, 60]),
)
@settings(**SETTINGS)
def test_rangejoin_matches_naive_at_millis(spark, intervals, points, width):
    """Bucketized point-in-interval == naive range join for arbitrary
    MILLISECOND-precision bounds (the round-4 advice bug class: bucket
    coverage must not truncate to whole seconds)."""
    from big_data_pr_spark.operators.rangejoin import point_in_interval_join

    iv = spark.createDataFrame(
        [(i, s, s + d) for i, (s, d) in enumerate(intervals)],
        "iv_id long, s long, e long",
    ).select(
        "iv_id",
        F.timestamp_millis(F.col("s")).cast("timestamp_ntz").alias("start"),
        F.timestamp_millis(F.col("e")).cast("timestamp_ntz").alias("end"),
    )
    pt = spark.createDataFrame(
        [(i, p) for i, p in enumerate(points)], "p_id long, ms long"
    ).select("p_id", F.timestamp_millis(F.col("ms")).cast("timestamp_ntz").alias("ts"))
    got = sorted(
        (r.iv_id, r.p_id)
        for r in point_in_interval_join(iv, pt, bucket_width_s=width)
        .select("iv_id", "p_id")
        .collect()
    )
    naive = sorted(
        (r.iv_id, r.p_id)
        for r in iv.join(pt, (pt.ts >= iv.start) & (pt.ts < iv.end))
        .select("iv_id", "p_id")
        .collect()
    )
    assert got == naive


@given(
    groups=st.lists(
        st.tuples(st.integers(0, 4), st.integers(1, 10_000)),
        min_size=1,
        max_size=30,
    )
)
@settings(**SETTINGS)
def test_mixture_weights_normalized_and_monotone(spark, groups):
    from big_data_pr_spark.operators.sampling import mixture_weights

    df = spark.createDataFrame(
        [(g, n) for g, n in groups], "g long, n_tok long"
    )
    out = mixture_weights(df, ["g"], "n_tok", alpha=0.5).collect()
    total = sum(r.weight for r in out)
    assert abs(total - 1.0) < 1e-4  # rounded to 6dp per row
    by_mass = sorted(out, key=lambda r: r.n_tokens)
    for lo, hi in zip(by_mass, by_mass[1:]):
        assert lo.weight <= hi.weight + 1e-9  # monotone in token mass


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcde"), min_size=1, max_size=25).map(
            lambda ws: " ".join(ws)
        ),
        min_size=1,
        max_size=6,
    ),
    k=st.integers(2, 5),
)
@settings(**SETTINGS)
def test_dedup_spans_matches_model(spark, docs, k):
    """dedup_spans ≡ the obvious sequential model: chunk every doc into
    k-word segments in (doc_id, position) order, keep a segment iff its
    text was never seen before, reassemble."""
    from big_data_pr_spark.operators.dedup import dedup_spans

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["total_chunks"], r["kept_chunks"], r["clean_text"])
        for r in dedup_spans(df, chunk_words=k).collect()
    }
    seen: set[str] = set()
    for i, t in enumerate(docs):
        words = t.split(" ")
        chunks = [
            " ".join(words[j : j + k]) for j in range(0, len(words), k)
        ]
        kept = []
        for c in chunks:
            if c not in seen:
                seen.add(c)
                kept.append(c)
        assert got[i] == (len(chunks), len(kept), " ".join(kept)), (i, t)


# ---------------------------------------------------------------------------
# Misra-Gries fold: guarantees hold for arbitrary streams (no Spark)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(
    stream=st.lists(
        st.tuples(st.integers(0, 30), st.integers(1, 50)), max_size=200
    ),
    k=st.integers(2, 12),
)
def test_mg_fold_guarantees_any_stream(stream, k):
    """For ANY weighted stream and any k: never overcount, undercount
    <= n/k, every key with true weight > n/k survives, and the dict
    never exceeds k-1 entries."""
    from big_data_pr_spark.operators.sketch import mg_fold

    counters: dict = {}
    exact: dict = {}
    for key, w in stream:
        kk = f"k{key}"
        exact[kk] = exact.get(kk, 0) + w
        mg_fold(counters, kk, w, k)
        assert len(counters) <= k - 1
    n = sum(exact.values())
    for key, c in counters.items():
        assert c <= exact[key]
        assert c >= exact[key] - n / k
    for key, c in exact.items():
        if c > n / k:
            assert key in counters, (key, c, n, k)
