"""Robust statistics, classical time-series, and distributed-classifier
queries — round-5 surface extensions over the fixture tables.

Reference capability these generalize: the reference's analytics layer
is "stats over recent candles + a recursive forecast loop"
(batch_processor.py steps 7-9, app.py:195-244 recursive multi-step
forecast). This module adds the robust/classical members of that same
family — median/MAD outlier gating, Holt's linear-trend recursion (the
closed-form cousin of the reference's recursive 24-step loop),
seasonal decomposition, a multinomial Naive Bayes language classifier
(the classical baseline for the corpus lang-id task), per-document
character entropy (a quality-scoring signal), and an ORC sink/source
round-trip (columnar-format parity next to the CSV/JSONL twins).

Every query is oracle-backed: pure built-in expressions (no Python in
the data path except Holt's applyInPandas recursion, which is
inherently sequential per key and O(1) state), value-hash-compared
against DuckDB SQL at sf0.001 (pytest) and sf0.01 (driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..tables import load
from .registry import register

# ---------------------------------------------------------------------------
# Robust statistics: median / MAD anomaly gate
# ---------------------------------------------------------------------------


@register(
    "mad_anomalies",
    """
    WITH med AS (
      SELECT event_type,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY value) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_type, e.value, m.med, abs(e.value - m.med) AS adev
      FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY adev) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           count(*) AS n_events,
           CAST(sum(CASE WHEN d.adev > 3.0 * 1.4826 * m.mad
                         THEN 1 ELSE 0 END) AS BIGINT)
             AS n_anomalies,
           round(any_value(d.med), 6) AS med,
           round(m.mad, 6) AS mad
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type, m.mad
    ORDER BY d.event_type
    """,
    doc="Median/MAD robust outlier gate per event_type: flag events "
    "whose absolute deviation from the group median exceeds 3 robust "
    "sigmas (1.4826·MAD). The robust sibling of zscore_anomalies — "
    "medians don't move when the outliers themselves are extreme. "
    "Exact interpolated percentiles on both engines (Spark "
    "`percentile`, DuckDB `percentile_cont`); two grouped passes + "
    "one broadcast join back, no Python. At 100 TB swap the exact "
    "median for approx_percentile (same plan shape, sketch-mergeable).",
)
def mad_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "mad")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(
                    F.col("adev") > 3.0 * 1.4826 * F.col("mad"), 1
                ).otherwise(0)
            ).alias("n_anomalies"),
            F.round(F.first("med"), 6).alias("med"),
        )
        .select(
            "event_type",
            "n_events",
            "n_anomalies",
            "med",
            F.round(F.col("mad"), 6).alias("mad"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Classical time-series: Holt linear trend + seasonal factors
# ---------------------------------------------------------------------------

_HOLT_ALPHA = 0.5
_HOLT_BETA = 0.3
_HOLT_H = 7


@register(
    "holt_linear_forecast",
    f"""
    WITH RECURSIVE daily AS (
      SELECT o_orderpriority AS priority,
             CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
             round(sum(o_totalprice), 2) AS y
      FROM orders GROUP BY 1, 2
    ),
    seq AS (
      SELECT priority, y,
             row_number() OVER (PARTITION BY priority ORDER BY d) AS rn,
             count(*) OVER (PARTITION BY priority) AS n
      FROM daily
    ),
    rec AS (
      SELECT s.priority, 1 AS rn, s.n, s.y AS l,
             coalesce(s2.y - s.y, 0.0) AS b
      FROM seq s
      LEFT JOIN seq s2 ON s2.priority = s.priority AND s2.rn = 2
      WHERE s.rn = 1
      UNION ALL
      SELECT r.priority, r.rn + 1, r.n,
             {_HOLT_ALPHA} * s.y + {1 - _HOLT_ALPHA} * (r.l + r.b),
             {_HOLT_BETA} * (({_HOLT_ALPHA} * s.y
                              + {1 - _HOLT_ALPHA} * (r.l + r.b)) - r.l)
               + {1 - _HOLT_BETA} * r.b
      FROM rec r JOIN seq s ON s.priority = r.priority AND s.rn = r.rn + 1
    )
    SELECT priority, h, round(l + h * b, 2) AS forecast
    FROM rec, unnest(generate_series(1, {_HOLT_H})) AS t(h)
    WHERE rn = n
    ORDER BY priority, h
    """,
    doc="Holt's linear-trend (double exponential smoothing) 7-step "
    "forecast of daily revenue per order priority — the classical "
    "closed-form cousin of the reference's recursive 24-step model "
    "loop (app.py:195-244): level/trend recursion α=0.5, β=0.3, "
    "l₁=y₁, b₁=y₂−y₁, ŷ(T+h)=l_T+h·b_T. Spark runs the recursion "
    "per key via applyInPandas (O(1) state, one pass over each "
    "key's ordered series — inherently sequential per key, "
    "embarrassingly parallel across keys); the oracle replays the "
    "identical float ops in a recursive CTE. Daily inputs rounded to "
    "2 dp on both sides so engine-order summation noise can't enter "
    "the recursion.",
)
def holt_linear_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd  # noqa: PLC0415

    orders = load(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
            F.col("o_orderpriority").alias("priority"),
            F.to_date(F.date_trunc("day", F.col("o_orderdate"))).alias("d"),
        )
        .agg(F.round(F.sum("o_totalprice"), 2).alias("y"))
    )

    def _holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("d")
        ys = pdf["y"].tolist()
        lvl = ys[0]
        b = (ys[1] - ys[0]) if len(ys) > 1 else 0.0
        for t in range(1, len(ys)):
            l_new = _HOLT_ALPHA * ys[t] + (1 - _HOLT_ALPHA) * (lvl + b)
            b = _HOLT_BETA * (l_new - lvl) + (1 - _HOLT_BETA) * b
            lvl = l_new
        return pd.DataFrame(
            {
                "priority": [pdf["priority"].iloc[0]] * _HOLT_H,
                "h": list(range(1, _HOLT_H + 1)),
                "forecast": [
                    round(lvl + h * b, 2) for h in range(1, _HOLT_H + 1)
                ],
            }
        )

    return (
        daily.groupBy("priority")
        .applyInPandas(_holt, "priority string, h bigint, forecast double")
        .orderBy("priority", "h")
    )


@register(
    "seasonal_hourly_factors",
    """
    WITH hourly AS (
      SELECT date_trunc('hour', ts) AS hr, round(sum(value), 2) AS total
      FROM events GROUP BY 1
    ),
    trended AS (
      SELECT hr, total,
             avg(total) OVER w AS trend,
             count(*) OVER w AS n_win
      FROM hourly
      WINDOW w AS (ORDER BY hr ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
    )
    SELECT CAST(extract(hour FROM hr) AS INT) AS hour_of_day,
           count(*) AS n_obs,
           round(avg(total - trend), 2) AS seasonal
    FROM trended
    WHERE n_win = 25
    GROUP BY 1
    ORDER BY 1
    """,
    doc="Classical seasonal decomposition of the hourly event-value "
    "series: trend = 25-hour centered moving average (full windows "
    "only), seasonal factor = mean detrended residual per hour-of-day. "
    "One narrow agg to hourly grain, one ordered window (single "
    "range-partitioned sort at scale — at 100 TB partition the window "
    "by a coarse time slice and stitch boundaries, as SCALE.md "
    "documents for the gap-fill family), one 24-row agg. No Python.",
)
def seasonal_hourly_factors(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("hr")).agg(
        F.round(F.sum("value"), 2).alias("total")
    )
    w = Window.orderBy("hr").rowsBetween(-12, 12)
    trended = hourly.select(
        "hr",
        "total",
        F.avg("total").over(w).alias("trend"),
        F.count(F.lit(1)).over(w).alias("n_win"),
    ).filter(F.col("n_win") == 25)
    return (
        trended.groupBy(F.hour("hr").cast("int").alias("hour_of_day"))
        .agg(
            F.count(F.lit(1)).alias("n_obs"),
            F.round(F.avg(F.col("total") - F.col("trend")), 2).alias("seasonal"),
        )
        .orderBy("hour_of_day")
    )


# ---------------------------------------------------------------------------
# Multinomial Naive Bayes language classifier (train + self-score)
# ---------------------------------------------------------------------------


@register(
    "naive_bayes_confusion",
    """
    WITH tok AS (
      SELECT doc_id, lang, t.token
      FROM documents, unnest(string_split(lower(text), ' ')) AS t(token)
      WHERE t.token <> ''
    ),
    tf AS (
      SELECT doc_id, lang AS true_lang, token, count(*) AS tf
      FROM tok GROUP BY doc_id, lang, token
    ),
    wc AS (
      SELECT lang, token, count(*) AS n_ct FROM tok GROUP BY lang, token
    ),
    cls AS (SELECT lang AS c_lang, sum(n_ct) AS n_tok_c FROM wc GROUP BY 1),
    pri AS (SELECT lang AS c_lang, count(*) AS n_docs_c FROM documents GROUP BY 1),
    tot AS (SELECT count(*) AS total FROM documents),
    voc AS (SELECT count(DISTINCT token) AS v FROM wc),
    ll AS (
      SELECT tf.doc_id, tf.true_lang, c.c_lang,
             sum(tf.tf * (ln(coalesce(w.n_ct, 0) + 1.0)
                          - ln(c.n_tok_c + v.v))) AS ll
      FROM tf
      CROSS JOIN cls c
      CROSS JOIN voc v
      LEFT JOIN wc w ON w.token = tf.token AND w.lang = c.c_lang
      GROUP BY tf.doc_id, tf.true_lang, c.c_lang
    ),
    scored AS (
      SELECT ll.doc_id, ll.true_lang, ll.c_lang,
             ll.ll + ln(CAST(p.n_docs_c AS DOUBLE) / t.total) AS score
      FROM ll JOIN pri p ON p.c_lang = ll.c_lang CROSS JOIN tot t
    ),
    pred AS (
      SELECT doc_id, true_lang, c_lang AS pred_lang,
             row_number() OVER (
               PARTITION BY doc_id ORDER BY score DESC, c_lang
             ) AS rn
      FROM scored
    )
    SELECT true_lang, pred_lang, count(*) AS n_docs
    FROM pred WHERE rn = 1
    GROUP BY true_lang, pred_lang
    ORDER BY true_lang, pred_lang
    """,
    doc="Multinomial Naive Bayes language classifier, trained and "
    "self-scored on the corpus in one job: Laplace-smoothed per-class "
    "token log-likelihoods + doc-count log-priors, argmax per doc "
    "(deterministic lang-asc tie-break), emitted as a confusion "
    "matrix against the labeled lang column — the classical "
    "supervised baseline for the lang_id heuristic. Fully "
    "distributed, no Python: the model IS a DataFrame (vocab×classes "
    "token counts) joined back on the hash-partitioned token key; "
    "class/prior/vocab scalars ride as 1-row broadcast cross joins. "
    "The discrete argmax output keeps floats out of the value hash.",
)
def naive_bayes_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token"),
    ).filter(F.col("token") != "")
    tf = tok.groupBy(
        "doc_id", F.col("lang").alias("true_lang"), "token"
    ).agg(F.count(F.lit(1)).alias("tf"))
    # r14 (guide §2.3/§2.4): wc derives from tf — n_ct per (lang,token)
    # is exactly sum(tf) — so the corpus is tokenized and exploded ONCE
    # (the tf aggregate's map-side partials carry it) instead of the tf
    # and wc branches each re-scanning documents; the second aggregate
    # runs over the already-reduced |docs×vocab| relation, not the raw
    # token stream.
    wc = tf.groupBy(
        F.col("true_lang").alias("lang"), "token"
    ).agg(F.sum("tf").alias("n_ct"))
    # vocabulary size: distinct tokens in wc as a partial-aggregated
    # two-stage count (r14 — the previous max(dense_rank) over a global
    # unpartitioned window sorted the whole |lang×vocab| relation in
    # ONE task, the serial stage behind this query's 0.50 core-scaling
    # ratio). The |classes|-row doc total still rides a global window.
    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    voc = wc.agg(F.countDistinct("token").cast("long").alias("v"))
    cls = (
        wc.groupBy(F.col("lang").alias("c_lang"))
        .agg(F.sum("n_ct").alias("n_tok_c"))
        .crossJoin(F.broadcast(voc))
    )
    pri = (
        docs.groupBy(F.col("lang").alias("c_lang"))
        .agg(F.count(F.lit(1)).alias("n_docs_c"))
        .withColumn("total", F.sum("n_docs_c").over(w_all))
    )
    model = wc.select(
        F.col("lang").alias("m_lang"), F.col("token").alias("m_token"), "n_ct"
    )
    ll = (
        tf.crossJoin(F.broadcast(cls))
        .join(
            model,
            (F.col("m_token") == F.col("token"))
            & (F.col("m_lang") == F.col("c_lang")),
            "left",
        )
        .groupBy("doc_id", "true_lang", "c_lang")
        .agg(
            F.sum(
                F.col("tf")
                * (
                    F.log(F.coalesce(F.col("n_ct"), F.lit(0)) + 1.0)
                    - F.log(F.col("n_tok_c") + F.col("v"))
                )
            ).alias("ll")
        )
    )
    scored = (
        ll.join(F.broadcast(pri), "c_lang")
        .withColumn(
            "score",
            F.col("ll")
            + F.log(F.col("n_docs_c").cast("double") / F.col("total")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("c_lang")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("true_lang", F.col("c_lang").alias("pred_lang"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("true_lang", "pred_lang")
    )


# ---------------------------------------------------------------------------
# Per-document character entropy (quality signal)
# ---------------------------------------------------------------------------


@register(
    "char_entropy_hist",
    """
    WITH chars AS (
      SELECT doc_id, substr(text, p, 1) AS ch
      FROM documents, unnest(generate_series(1, len(text))) AS t(p)
      WHERE len(text) > 0
    ),
    cnt AS (SELECT doc_id, ch, count(*) AS c FROM chars GROUP BY doc_id, ch),
    ent AS (
      SELECT doc_id,
             ln(sum(c)) - sum(c * ln(c)) / sum(c) AS h
      FROM cnt GROUP BY doc_id
    )
    SELECT CAST(floor(h * 10) AS INT) AS ent_decile,
           count(*) AS n_docs
    FROM ent GROUP BY 1 ORDER BY 1
    """,
    doc="Shannon character-entropy histogram over the corpus (nats, "
    "0.1-wide buckets): low-entropy docs are repetitive boilerplate, "
    "high-entropy docs are noise/binary junk — a standard pretraining "
    "quality gate next to repetition_ratio. Characters are exploded "
    "positionally (substr over a generated index — identical "
    "semantics on both engines, no regex/locale dependence), counted "
    "per doc, entropy via ln(n) − Σc·ln(c)/n. Narrow explode + two "
    "hash aggs keyed by doc_id — shuffles are doc-count-sized, not "
    "char-sized, after partial aggregation.",
)
def char_entropy_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").filter(F.length("text") > 0)
    # r13: split-to-chars is O(len) per doc; the previous positional
    # explode evaluated substring(text, p, 1) per position, and UTF-8
    # position lookup walks the string from the start — O(len²) per
    # doc. split(text, '') yields exactly the same per-position
    # single-character strings (verified incl. multibyte chars), so
    # the (doc_id, ch) multiset — and every count downstream — is
    # identical.
    chars = docs.select(
        "doc_id", F.explode(F.split("text", "")).alias("ch")
    )
    cnt = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    ent = cnt.groupBy("doc_id").agg(
        (
            F.log(F.sum("c"))
            - F.sum(F.col("c") * F.log(F.col("c"))) / F.sum("c")
        ).alias("h")
    )
    return (
        ent.groupBy(F.floor(F.col("h") * 10).cast("int").alias("ent_decile"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("ent_decile")
    )


# ---------------------------------------------------------------------------
# ORC sink → source round-trip (columnar-format parity with CSV/JSONL)
# ---------------------------------------------------------------------------


@register(
    "orc_roundtrip_stats",
    """
    SELECT o_orderstatus, o_orderpriority,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price,
           min(o_orderkey) AS min_key,
           max(o_orderkey) AS max_key,
           CAST(min(o_orderdate) AS DATE) AS min_date,
           CAST(max(o_orderdate) AS DATE) AS max_date
    FROM orders
    GROUP BY o_orderstatus, o_orderpriority
    ORDER BY o_orderstatus, o_orderpriority
    """,
    doc="ORC sink → source round-trip certification (S6 family, "
    "columnar sibling of csv_roundtrip_stats / jsonl_roundtrip_stats): "
    "orders written as ORC (Spark-native columnar format with "
    "predicate pushdown + column pruning, the Hive-ecosystem "
    "counterpart of the parquet primary store), re-read with an "
    "explicit schema, aggregated; the oracle computes the same "
    "aggregate from the original parquet, so any value mangled by the "
    "ORC writer/reader (timestamps, doubles, dictionary-encoded "
    "strings) flips the hash.",
)
def orc_roundtrip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    orders = load(spark, sf_dir, "orders")
    out_dir = os.path.join(
        tempfile.gettempdir(),
        "big_data_pr_spark_orc",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    orders.write.mode("overwrite").orc(out_dir)
    # explicit schema (no inference pass), carried from the writer so the
    # timestamp flavor (TIMESTAMP vs TIMESTAMP_NTZ — the fixture has
    # shipped both across rounds, see tables.py) always matches what the
    # ORC files actually hold
    back = spark.read.schema(orders.schema).orc(out_dir)
    return (
        back.groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
            F.min("o_orderdate").cast("date").alias("min_date"),
            F.max("o_orderdate").cast("date").alias("max_date"),
        )
        .orderBy("o_orderstatus", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# SQL-standard regression aggregates + Zipf law fit
# ---------------------------------------------------------------------------


@register(
    "linreg_value_trend",
    """
    WITH pts AS (
      SELECT event_type,
             CAST(epoch(date_trunc('hour', ts)) AS DOUBLE) / 3600.0 AS xh,
             value AS y
      FROM events
    ),
    centered AS (
      SELECT event_type, xh - avg(xh) OVER (PARTITION BY event_type) AS x, y
      FROM pts
    )
    SELECT event_type,
           count(*) AS n,
           round(regr_slope(y, x), 4) AS slope,
           round(regr_intercept(y, x), 4) AS intercept,
           round(regr_r2(y, x), 4) AS r2
    FROM centered GROUP BY event_type ORDER BY event_type
    """,
    doc="SQL-standard least-squares aggregates (regr_slope / "
    "regr_intercept / regr_r2) fitting value against event-hour per "
    "event_type — the one-agg trend detector behind drift monitors. "
    "The regressor is mean-centered per group first (one window + one "
    "agg) so the single-pass covariance accumulators are numerically "
    "well-conditioned — epoch-scale abscissae (~1e9) would otherwise "
    "cancel catastrophically and engine accumulation order would leak "
    "into the rounded output. Two shuffles on the same key, no Python.",
)
def linreg_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..timeutil import epoch_seconds, trunc_wallclock  # noqa: PLC0415

    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        "event_type",
        (
            epoch_seconds(trunc_wallclock("hour", F.col("ts"))).cast("double")
            / 3600.0
        ).alias("xh"),
        F.col("value").alias("y"),
    )
    w = Window.partitionBy("event_type")
    centered = pts.select(
        "event_type", (F.col("xh") - F.avg("xh").over(w)).alias("x"), "y"
    )
    return (
        centered.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.regr_slope("y", "x"), 4).alias("slope"),
            F.round(F.regr_intercept("y", "x"), 4).alias("intercept"),
            F.round(F.regr_r2("y", "x"), 4).alias("r2"),
        )
        .orderBy("event_type")
    )


_ZIPF_TOP = 500


@register(
    "zipf_token_slope",
    f"""
    WITH tok AS (
      SELECT t.token FROM documents,
             unnest(string_split(lower(text), ' ')) AS t(token)
      WHERE t.token <> ''
    ),
    freq AS (SELECT token, count(*) AS f FROM tok GROUP BY token),
    ranked AS (
      SELECT f, row_number() OVER (ORDER BY f DESC, token) AS r
      FROM freq
    )
    SELECT count(*) AS n_terms,
           round(regr_slope(ln(CAST(f AS DOUBLE)), ln(CAST(r AS DOUBLE))), 4)
             AS zipf_slope,
           round(regr_r2(ln(CAST(f AS DOUBLE)), ln(CAST(r AS DOUBLE))), 4)
             AS r2
    FROM ranked WHERE r <= {_ZIPF_TOP}
    """,
    doc="Zipf's-law fit over the corpus token distribution: slope of "
    "ln(frequency) against ln(rank) for the top-500 tokens (a healthy "
    "natural-language corpus sits near −1; big deviations flag "
    "boilerplate floods or synthetic junk — a corpus-level quality "
    "gate next to char_entropy_hist). Token counting is one "
    "map-side-partial agg; the rank window runs over the top slice "
    "only (vocab-sized, then 500 rows), so the global sort is "
    "bounded. Log abscissae are O(1)–O(6): well-conditioned for the "
    "single-pass regression accumulator.",
)
def zipf_token_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    tok = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("token")
    ).filter(F.col("token") != "")
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("f"))
    ranked = freq.select(
        "f",
        F.row_number()
        .over(Window.orderBy(F.desc("f"), F.asc("token")))
        .alias("r"),
    ).filter(F.col("r") <= _ZIPF_TOP)
    lf = F.log(F.col("f").cast("double"))
    lr = F.log(F.col("r").cast("double"))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(F.regr_slope(lf, lr), 4).alias("zipf_slope"),
        F.round(F.regr_r2(lf, lr), 4).alias("r2"),
    )


# ---------------------------------------------------------------------------
# Corrupt-record quarantine (PERMISSIVE JSONL ingest)
# ---------------------------------------------------------------------------


@register(
    "jsonl_corrupt_quarantine",
    """
    SELECT CASE WHEN doc_id % 7 = 0 THEN '__corrupt__' ELSE lang END
             AS bucket,
           count(*) AS n_rows,
           CAST(sum(CASE WHEN doc_id % 7 = 0 THEN 0 ELSE n_chars END)
                AS BIGINT)
             AS sum_chars
    FROM documents GROUP BY 1 ORDER BY 1
    """,
    doc="Malformed-input quarantine: the corpus is serialized to JSON "
    "lines with every 7th record deterministically truncated (invalid "
    "JSON), then re-read with Spark's PERMISSIVE mode + "
    "columnNameOfCorruptRecord — the standard don't-fail-the-job "
    "ingest posture for dirty feeds (the reference's Kafka payloads "
    "are exactly such JSON lines, stream_processor.py:70-90). Rows "
    "are bucketed by the corrupt-record column, NOT by salvaged "
    "fields (PERMISSIVE may salvage a valid prefix), and the oracle "
    "replays the planted corruption rule — certifying that the "
    "quarantine decision matches the corruption exactly: no dropped "
    "good rows, no silently-accepted bad ones.",
)
def jsonl_corrupt_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    docs = load(spark, sf_dir, "documents")
    line = F.to_json(
        F.struct("doc_id", "lang", "source", "n_chars", "text")
    ).alias("l")
    mangled = docs.select(F.col("doc_id").alias("did"), line).select(
        F.when(
            F.col("did") % 7 == 0,
            F.expr("substring(l, 1, length(l) - 2)"),
        )
        .otherwise(F.col("l"))
        .alias("value")
    )
    out_dir = os.path.join(
        tempfile.gettempdir(),
        "big_data_pr_spark_jsonl_corrupt",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    mangled.write.mode("overwrite").text(out_dir)
    back = (
        spark.read.schema(
            "doc_id bigint, lang string, source string, n_chars bigint, "
            "text string, _corrupt string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(out_dir)
    )
    return (
        back.groupBy(
            F.when(F.col("_corrupt").isNotNull(), "__corrupt__")
            .otherwise(F.col("lang"))
            .alias("bucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(F.col("_corrupt").isNotNull(), 0).otherwise(
                    F.col("n_chars")
                )
            ).alias("sum_chars"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# ML evaluation metrics: AUC (rank-based) + PSI drift
# ---------------------------------------------------------------------------


@register(
    "auc_value_predicts_purchase",
    """
    WITH scored AS (
      SELECT round(value, 6) AS s,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
      FROM events
    ),
    per_score AS (
      SELECT s, sum(y) AS n_pos, sum(1 - y) AS n_neg
      FROM scored GROUP BY s
    ),
    cum AS (
      SELECT s, n_pos, n_neg,
             coalesce(sum(n_neg) OVER (
               ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), 0) AS neg_below
      FROM per_score
    ),
    tot AS (
      SELECT sum(n_pos) AS p, sum(n_neg) AS n FROM per_score
    )
    SELECT CAST(any_value(t.p) AS BIGINT) AS n_pos,
           CAST(any_value(t.n) AS BIGINT) AS n_neg,
           round(sum(c.n_pos * (c.neg_below + 0.5 * c.n_neg))
                 / (any_value(t.p) * any_value(t.n)), 6) AS auc
    FROM cum c CROSS JOIN tot t
    """,
    doc="Distributed AUC-ROC of `value` as a ranking score for the "
    "purchase label, via the Mann-Whitney identity P(s⁺>s⁻)+½P(tie) — "
    "the model-evaluation primitive for every scorer in the ML family "
    "(gbt_score_events / logreg_score_events). Scale-right shape: NO "
    "global sort of the events table — scores aggregate to per-"
    "distinct-score (pos, neg) counts first (map-side partial), and "
    "the cumulative window runs over the distinct-score relation "
    "only. All-integer accumulators until the final division.",
)
def auc_value_predicts_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    scored = ev.select(
        F.round("value", 6).alias("s"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    per_score = scored.groupBy("s").agg(
        F.sum("y").alias("n_pos"), F.sum(1 - F.col("y")).alias("n_neg")
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    cum = per_score.select(
        "s",
        "n_pos",
        "n_neg",
        F.coalesce(F.sum("n_neg").over(w), F.lit(0)).alias("neg_below"),
    )
    tot = per_score.agg(
        F.sum("n_pos").alias("p"), F.sum("n_neg").alias("n")
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            F.first("p").alias("n_pos"),
            F.first("n").alias("n_neg"),
            F.round(
                F.sum(
                    F.col("n_pos") * (F.col("neg_below") + 0.5 * F.col("n_neg"))
                )
                / (F.first("p") * F.first("n")),
                6,
            ).alias("auc"),
        )
    )


_PSI_BINS = 10


@register(
    "psi_value_drift",
    f"""
    WITH bounds AS (
      SELECT min(value) AS lo, max(value) AS hi,
             min(ts) AS t0, max(ts) AS t1
      FROM events
    ),
    binned AS (
      SELECT least(CAST(floor((value - b.lo) / ((b.hi - b.lo) / {_PSI_BINS}))
                        AS INT), {_PSI_BINS - 1}) AS bin,
             CASE WHEN epoch_us(ts) * 2 < epoch_us(b.t0) + epoch_us(b.t1)
                  THEN 0 ELSE 1 END AS half
      FROM events CROSS JOIN bounds b
    ),
    counts AS (
      SELECT bin,
             sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS c_ref,
             sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS c_cur
      FROM binned GROUP BY bin
    ),
    tot AS (SELECT sum(c_ref) AS n_ref, sum(c_cur) AS n_cur FROM counts),
    shares AS (
      SELECT bin,
             CAST(c_ref + 1 AS DOUBLE) / (t.n_ref + {_PSI_BINS}) AS p,
             CAST(c_cur + 1 AS DOUBLE) / (t.n_cur + {_PSI_BINS}) AS q
      FROM counts CROSS JOIN tot t
    )
    SELECT CAST({_PSI_BINS} AS INT) AS n_bins,
           round(sum((p - q) * ln(p / q)), 6) AS psi
    FROM shares
    """,
    doc="Population Stability Index of the value distribution between "
    "the first and second time half — the standard production drift "
    "gate (PSI > 0.2 ⇒ retrain/alert). Ten equal-width bins from the "
    "global min/max (two 1-row scalar aggregates broadcast back), "
    "Laplace-smoothed shares so empty bins stay finite, deterministic "
    "time split at the epoch midpoint. Two scans + one 10-row agg — "
    "no sort, no Python; bin edges would come from the reference "
    "window's quantile sketch in a rolling deployment.",
)
def psi_value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..timeutil import epoch_micros  # noqa: PLC0415

    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(
        F.min("value").alias("lo"),
        F.max("value").alias("hi"),
        F.min("ts").alias("t0"),
        F.max("ts").alias("t1"),
    )
    b = ev.crossJoin(F.broadcast(bounds))
    binned = b.select(
        F.least(
            F.floor(
                (F.col("value") - F.col("lo"))
                / ((F.col("hi") - F.col("lo")) / _PSI_BINS)
            ).cast("int"),
            F.lit(_PSI_BINS - 1),
        ).alias("bin"),
        F.when(
            epoch_micros(F.col("ts")) * 2
            < epoch_micros(F.col("t0")) + epoch_micros(F.col("t1")),
            0,
        )
        .otherwise(1)
        .alias("half"),
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("c_ref"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("c_cur"),
    )
    tot = counts.agg(
        F.sum("c_ref").alias("n_ref"), F.sum("c_cur").alias("n_cur")
    )
    shares = counts.crossJoin(F.broadcast(tot)).select(
        (
            (F.col("c_ref") + 1).cast("double")
            / (F.col("n_ref") + _PSI_BINS)
        ).alias("p"),
        (
            (F.col("c_cur") + 1).cast("double")
            / (F.col("n_cur") + _PSI_BINS)
        ).alias("q"),
    )
    return shares.agg(
        F.lit(_PSI_BINS).cast("int").alias("n_bins"),
        F.round(
            F.sum((F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))),
            6,
        ).alias("psi"),
    )


# ---------------------------------------------------------------------------
# Autocorrelation function (ACF) of the hourly value series
# ---------------------------------------------------------------------------


@register(
    "acf_value_lags",
    """
    WITH hourly AS (
      SELECT CAST(epoch(date_trunc('hour', ts)) / 3600 AS BIGINT) AS h,
             avg(value) AS v
      FROM events GROUP BY 1),
    lags AS (SELECT unnest([1, 2, 3, 4, 5]) AS lag)
    SELECT l.lag,
           count(*) AS n_pairs,
           round(corr(cur.v, prev.v), 6) AS acf
    FROM lags l
    JOIN hourly cur ON TRUE
    JOIN hourly prev ON prev.h = cur.h - l.lag
    GROUP BY l.lag
    ORDER BY l.lag
    """,
    doc="Sample autocorrelation of the hourly mean-value series at lags "
    "1-5 — the diagnostic that decides AR order / seasonality before "
    "fitting models like Holt's (holt_linear_forecast). The corpus "
    "collapses to one row per hour FIRST (one grouped agg), then each "
    "lag is an equi-join of the tiny series against itself shifted by "
    "the lag (gaps drop out via the inner join) and a corr() "
    "aggregate. The only all-pairs step runs on the hours-sized "
    "series, never the raw events.",
)
def acf_value_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..timeutil import epoch_seconds, trunc_wallclock  # noqa: PLC0415

    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        (epoch_seconds(trunc_wallclock("hour", F.col("ts"))) / 3600)
        .cast("long")
        .alias("h")
    ).agg(F.avg("value").alias("v"))
    lags = spark.range(1, 6).select(F.col("id").alias("lag"))
    cur = hourly.select(F.col("h").alias("h_cur"), F.col("v").alias("v_cur"))
    prev = hourly.select(F.col("h").alias("h_prev"), F.col("v").alias("v_prev"))
    return (
        F.broadcast(lags)
        .crossJoin(cur)
        .join(prev, F.col("h_prev") == F.col("h_cur") - F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.corr("v_cur", "v_prev"), 6).alias("acf"),
        )
        .orderBy("lag")
    )


# ---------------------------------------------------------------------------
# Metadata-only schema evolution round-trip (operators/schemalog.py)
# ---------------------------------------------------------------------------


@register(
    "schema_evolution_roundtrip",
    """
    WITH unioned AS (
      SELECT o_orderstatus, o_totalprice AS price, 'NONE' AS flag
      FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderstatus, o_totalprice AS price, o_orderpriority AS flag
      FROM orders WHERE o_orderkey % 2 = 1)
    SELECT flag, o_orderstatus,
           count(*) AS n_orders,
           round(sum(price), 2) AS sum_price
    FROM unioned
    GROUP BY flag, o_orderstatus
    ORDER BY flag, o_orderstatus
    """,
    doc="Schema-evolution semantics certified end-to-end: half of "
    "orders is written as a v0 table (operators/schemalog.py), then "
    "ADD COLUMN flag DEFAULT 'NONE' and RENAME o_totalprice→price are "
    "applied as METADATA-ONLY ops (no file rewrite — old files keep "
    "the old physical column name), the other half is appended under "
    "the NEW schema, and the mapped mergeSchema read is aggregated. "
    "The oracle replays the same history as a plain SQL union on the "
    "original parquet, so a wrong default backfill, a rename that "
    "loses old files, or a cast mangle flips the hash.",
)
def schema_evolution_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os  # noqa: PLC0415
    import shutil  # noqa: PLC0415
    import tempfile  # noqa: PLC0415

    from ..operators import schemalog  # noqa: PLC0415

    orders = load(spark, sf_dir, "orders")
    table = os.path.join(
        tempfile.gettempdir(),
        "big_data_pr_spark_schemalog",
        os.path.basename(os.path.normpath(sf_dir)),
    )
    shutil.rmtree(table, ignore_errors=True)
    schemalog.init_table(
        orders.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", "o_orderstatus", "o_totalprice"
        ),
        table,
    )
    schemalog.add_column(table, "flag", "string", default="NONE")
    schemalog.rename_column(table, "o_totalprice", "price")
    schemalog.append(
        orders.filter(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey",
            "o_orderstatus",
            F.col("o_totalprice").alias("price"),
            F.col("o_orderpriority").alias("flag"),
        ),
        table,
    )
    return (
        schemalog.read(spark, table)
        .groupBy("flag", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("price"), 2).alias("sum_price"),
        )
        .orderBy("flag", "o_orderstatus")
    )


# ---------------------------------------------------------------------------
# Classical hypothesis tests: chi-square independence, Welch's t
# ---------------------------------------------------------------------------


@register(
    "chisq_type_weekday",
    """
    WITH obs AS (
      SELECT event_type, dayofweek(ts) AS dow, count(*) AS o
      FROM events GROUP BY event_type, dayofweek(ts)),
    margins AS (
      SELECT o.event_type, o.dow, o.o,
             sum(o.o) OVER (PARTITION BY o.event_type) AS row_tot,
             sum(o.o) OVER (PARTITION BY o.dow) AS col_tot,
             sum(o.o) OVER () AS n
      FROM obs o)
    SELECT count(*) AS n_cells,
           CAST((count(DISTINCT event_type) - 1)
                * (count(DISTINCT dow) - 1) AS BIGINT) AS dof,
           round(sum(pow(o - row_tot * col_tot / n, 2)
                     / (row_tot * col_tot / n)), 6) AS chi2
    FROM margins
    """,
    doc="Pearson chi-square independence test: is event_type "
    "distributed independently of weekday? Contingency counts in one "
    "grouped aggregate (cells = |types|×7, tiny), marginals via "
    "windows over the cell table (never the raw events), then the "
    "χ² = Σ(O−E)²/E statistic with its degrees of freedom — the "
    "standard seasonality/data-drift gate next to psi_value_drift. "
    "The corpus is scanned exactly once.",
)
def chisq_type_weekday(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    obs = ev.groupBy(
        "event_type", F.dayofweek("ts").alias("dow")
    ).agg(F.count(F.lit(1)).alias("o"))
    margins = (
        obs.withColumn(
            "row_tot", F.sum("o").over(Window.partitionBy("event_type"))
        )
        .withColumn("col_tot", F.sum("o").over(Window.partitionBy("dow")))
        .withColumn(
            "n", F.sum("o").over(Window.partitionBy())
        )
    )
    e = F.col("row_tot") * F.col("col_tot") / F.col("n")
    return margins.agg(
        F.count(F.lit(1)).alias("n_cells"),
        (
            (F.countDistinct("event_type") - 1) * (F.countDistinct("dow") - 1)
        ).cast("long").alias("dof"),
        F.round(F.sum(F.pow(F.col("o") - e, 2) / e), 6).alias("chi2"),
    )


@register(
    "welch_ttest_purchase_vs_view",
    """
    WITH g AS (
      SELECT event_type,
             count(*) AS n,
             avg(value) AS m,
             var_samp(value) AS v
      FROM events
      WHERE event_type IN ('purchase', 'view')
      GROUP BY event_type),
    wide AS (
      SELECT max(CASE WHEN event_type = 'purchase' THEN n END) AS n1,
             max(CASE WHEN event_type = 'purchase' THEN m END) AS m1,
             max(CASE WHEN event_type = 'purchase' THEN v END) AS v1,
             max(CASE WHEN event_type = 'view' THEN n END) AS n2,
             max(CASE WHEN event_type = 'view' THEN m END) AS m2,
             max(CASE WHEN event_type = 'view' THEN v END) AS v2
      FROM g)
    SELECT n1, n2,
           round(m1 - m2, 6) AS mean_diff,
           round((m1 - m2) / sqrt(v1 / n1 + v2 / n2), 6) AS t_stat,
           round(pow(v1 / n1 + v2 / n2, 2)
                 / (pow(v1 / n1, 2) / (n1 - 1)
                    + pow(v2 / n2, 2) / (n2 - 1)), 6) AS welch_dof
    FROM wide
    """,
    doc="Welch's unequal-variance t-test: do purchase and view events "
    "carry different mean values? Per-group (n, mean, variance) in ONE "
    "grouped aggregate over the filtered scan, pivoted to a single row "
    "(conditional max — 2 groups), then the t statistic and "
    "Welch-Satterthwaite dof as closed-form arithmetic. The A/B-test "
    "primitive at engine scale: the corpus reduces to 2×3 numbers "
    "before any math happens.",
)
def welch_ttest_purchase_vs_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("value").alias("m"),
        F.var_samp("value").alias("v"),
    )
    def pick(col: str, t: str):
        return F.max(F.when(F.col("event_type") == t, F.col(col)))

    wide = g.agg(
        pick("n", "purchase").alias("n1"),
        pick("m", "purchase").alias("m1"),
        pick("v", "purchase").alias("v1"),
        pick("n", "view").alias("n2"),
        pick("m", "view").alias("m2"),
        pick("v", "view").alias("v2"),
    )
    se2 = F.col("v1") / F.col("n1") + F.col("v2") / F.col("n2")
    dof = F.pow(se2, 2) / (
        F.pow(F.col("v1") / F.col("n1"), 2) / (F.col("n1") - 1)
        + F.pow(F.col("v2") / F.col("n2"), 2) / (F.col("n2") - 1)
    )
    return wide.select(
        "n1",
        "n2",
        F.round(F.col("m1") - F.col("m2"), 6).alias("mean_diff"),
        F.round((F.col("m1") - F.col("m2")) / F.sqrt(se2), 6).alias("t_stat"),
        F.round(dof, 6).alias("welch_dof"),
    )


# ---------------------------------------------------------------------------
# Robust regression (Theil-Sen) and winsorized means
# ---------------------------------------------------------------------------


@register(
    "theil_sen_trend",
    """
    WITH hourly AS (
      SELECT CAST(epoch(date_trunc('hour', ts)) / 3600 AS BIGINT) AS h,
             avg(value) AS v
      FROM events GROUP BY 1),
    pairs AS (
      SELECT (b.v - a.v) / (b.h - a.h) AS slope
      FROM hourly a JOIN hourly b ON a.h < b.h),
    m AS (SELECT median(slope) AS slope FROM pairs)
    SELECT (SELECT count(*) FROM hourly) AS n_hours,
           (SELECT count(*) FROM pairs) AS n_pairs,
           round(m.slope, 6) AS slope,
           round((SELECT median(hourly.v - m.slope * hourly.h)
                  FROM hourly), 6) AS intercept
    FROM m
    """,
    doc="Theil-Sen robust trend of the hourly mean-value series: the "
    "median of all pairwise slopes (then median residual intercept) — "
    "the 29%-breakdown-point alternative to least squares "
    "(linreg_value_trend) that one outlier hour cannot drag. The "
    "corpus collapses to one row per hour FIRST; the O(hours²) pair "
    "join runs on the tiny aggregated series, never the raw events — "
    "at 100 TB the pair count depends on the time span, not the data "
    "volume.",
)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..timeutil import epoch_seconds, trunc_wallclock  # noqa: PLC0415

    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        (epoch_seconds(trunc_wallclock("hour", F.col("ts"))) / 3600)
        .cast("long")
        .alias("h")
    ).agg(F.avg("value").alias("v"))
    # n_hours rides on the hourly rows via a global window and the
    # slope/count/n_hours all come from ONE aggregate over the pair
    # relation; the only second branch is the residual-median pass,
    # which needs the slope scalar. 5 executions of the corpus
    # aggregate collapse to 2.
    from pyspark.sql import Window  # noqa: PLC0415

    w_all = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    hourly_n = hourly.withColumn("n_hours", F.count(F.lit(1)).over(w_all))
    a = hourly_n.select(
        F.col("h").alias("ha"), F.col("v").alias("va"), "n_hours"
    )
    b = hourly.select(F.col("h").alias("hb"), F.col("v").alias("vb"))
    pairs = a.join(b, F.col("ha") < F.col("hb")).select(
        ((F.col("vb") - F.col("va")) / (F.col("hb") - F.col("ha"))).alias(
            "slope"
        ),
        "n_hours",
    )
    pm = pairs.agg(
        F.median("slope").alias("slope"),
        F.count(F.lit(1)).alias("n_pairs"),
        F.first("n_hours").alias("n_hours"),
    )
    return (
        hourly.crossJoin(F.broadcast(pm))
        .agg(
            F.first("n_hours").alias("n_hours"),
            F.first("n_pairs").alias("n_pairs"),
            F.round(F.first("slope"), 6).alias("slope"),
            F.round(
                F.median(F.col("v") - F.col("slope") * F.col("h")), 6
            ).alias("intercept"),
        )
    )


@register(
    "winsorized_stats",
    """
    WITH bounds AS (
      SELECT event_type,
             quantile_cont(value, 0.05) AS lo,
             quantile_cont(value, 0.95) AS hi
      FROM events GROUP BY event_type)
    SELECT e.event_type,
           count(*) AS n,
           round(avg(e.value), 6) AS mean_raw,
           round(avg(least(greatest(e.value, b.lo), b.hi)), 6)
             AS mean_winsor
    FROM events e JOIN bounds b USING (event_type)
    GROUP BY e.event_type
    ORDER BY e.event_type
    """,
    doc="5/95% winsorized mean per event type next to the raw mean — "
    "the standard tail-robust location estimate for heavy-tailed "
    "value distributions (clip, don't drop). Per-group exact "
    "percentile bounds in one aggregate (|types| rows, broadcast "
    "back), then a narrow clip + one grouped mean: two scans, no "
    "sort of the fact table. approx_percentile is the documented "
    "100 TB swap for the bounds pass.",
)
def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.05)").alias("lo"),
        F.expr("percentile(value, 0.95)").alias("hi"),
    )
    clipped = ev.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "value",
        F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")).alias(
            "wv"
        ),
    )
    return (
        clipped.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 6).alias("mean_raw"),
            F.round(F.avg("wv"), 6).alias("mean_winsor"),
        )
        .orderBy("event_type")
    )


@register(
    "benford_first_digit",
    """
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR),
                         1, 1) AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1),
    n AS (SELECT count(*) AS total FROM d)
    SELECT digit,
           count(*) AS n,
           round(count(*) * 1.0 / n.total, 6) AS observed_p,
           round(log10(1.0 + 1.0 / digit), 6) AS benford_p,
           round(abs(count(*) * 1.0 / n.total
                     - log10(1.0 + 1.0 / digit)), 6) AS abs_dev
    FROM d CROSS JOIN n
    GROUP BY digit, n.total
    ORDER BY digit
    """,
    doc="Benford's-law first-digit audit of order totals — the classic "
    "fabricated-data / corruption screen for financial columns "
    "(digit share vs log10(1+1/d)). One narrow digit extraction, a "
    "9-row grouped aggregate, the total as a 1-row broadcast. A "
    "synthetic uniform price distribution (like TPC-H's) shows large "
    "abs_dev by construction — the query reports the deviation, the "
    "alert threshold is the caller's.",
)
def benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    d = o.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
        )
        .cast("long")
        .alias("digit")
    )
    n = d.agg(F.count(F.lit(1)).alias("total"))
    benford = F.log10(1.0 + 1.0 / F.col("digit"))
    return (
        d.crossJoin(F.broadcast(n))
        .groupBy("digit", "total")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "digit",
            "n",
            F.round(F.col("n") * 1.0 / F.col("total"), 6).alias("observed_p"),
            F.round(benford, 6).alias("benford_p"),
            F.round(
                F.abs(F.col("n") * 1.0 / F.col("total") - benford), 6
            ).alias("abs_dev"),
        )
        .orderBy("digit")
    )


# ---------------------------------------------------------------------------
# Inequality / concentration metrics
# ---------------------------------------------------------------------------


@register(
    "gini_user_value",
    """
    WITH per_user AS (
      SELECT user_id, sum(value) AS x FROM events GROUP BY user_id),
    ranked AS (
      SELECT x, row_number() OVER (ORDER BY x, user_id) AS i,
             count(*) OVER () AS n, sum(x) OVER () AS total
      FROM per_user)
    SELECT max(n) AS n_users,
           round(2.0 * sum(i * x) / (max(n) * max(total))
                 - (max(n) + 1.0) / max(n), 6) AS gini
    FROM ranked
    """,
    doc="Gini coefficient of per-user total event value — the standard "
    "inequality summary of an engagement/revenue distribution. One "
    "grouped aggregate collapses the corpus to |users| rows; the rank "
    "window and the closed-form Σi·x estimator run on that tiny "
    "relation (deterministic (x, user_id) ordering). At 100 TB the "
    "only full-data pass is the first aggregate.",
)
def gini_user_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(F.sum("value").alias("x"))
    w = Window.orderBy("x", "user_id")
    wall = Window.partitionBy()
    ranked = per_user.select(
        "x",
        F.row_number().over(w).alias("i"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("x").over(wall).alias("total"),
    )
    return ranked.agg(
        F.max("n").alias("n_users"),
        F.round(
            2.0 * F.sum(F.col("i") * F.col("x")) / (F.max("n") * F.max("total"))
            - (F.max("n") + 1.0) / F.max("n"),
            6,
        ).alias("gini"),
    )


@register(
    "revenue_concentration",
    """
    WITH per_cust AS (
      SELECT o_custkey, sum(o_totalprice) AS rev FROM orders
      GROUP BY o_custkey),
    ranked AS (
      SELECT rev, row_number() OVER (ORDER BY rev DESC, o_custkey) AS rk,
             count(*) OVER () AS n, sum(rev) OVER () AS total
      FROM per_cust)
    SELECT max(n) AS n_customers,
           CAST(ceil(max(n) * 0.2) AS BIGINT) AS top20_count,
           round(sum(CASE WHEN rk <= ceil(n * 0.2) THEN rev ELSE 0 END)
                 / max(total), 6) AS top20_share
    FROM ranked
    """,
    doc="Pareto concentration: revenue share of the top-20% customers — "
    "the 80/20 health metric of any revenue base. Corpus collapses to "
    "|customers| rows in one aggregate; ranking and the share run on "
    "that relation with a deterministic (rev, custkey) tie-break.",
)
def revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(F.sum("o_totalprice").alias("rev"))
    w = Window.orderBy(F.desc("rev"), "o_custkey")
    wall = Window.partitionBy()
    ranked = per_cust.select(
        "rev",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum("rev").over(wall).alias("total"),
    )
    return ranked.agg(
        F.max("n").alias("n_customers"),
        F.ceil(F.max("n") * 0.2).cast("long").alias("top20_count"),
        F.round(
            F.sum(
                F.when(
                    F.col("rk") <= F.ceil(F.col("n") * 0.2), F.col("rev")
                ).otherwise(0.0)
            )
            / F.max("total"),
            6,
        ).alias("top20_share"),
    )


@register(
    "herfindahl_by_type",
    """
    WITH s AS (
      SELECT event_type, sum(value) AS v FROM events GROUP BY event_type),
    t AS (SELECT sum(v) AS total FROM s)
    SELECT count(*) AS n_types,
           round(sum(pow(s.v / t.total, 2)), 6) AS hhi
    FROM s CROSS JOIN t
    """,
    doc="Herfindahl-Hirschman concentration index of value by event "
    "type (Σ share² — 1/n for perfectly even, 1.0 for a monopoly "
    "type): the mixture-balance gate for training-data source "
    "composition, same family as mixture_weights. One grouped "
    "aggregate + a 1-row broadcast.",
)
def herfindahl_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    s = ev.groupBy("event_type").agg(F.sum("value").alias("v"))
    t = s.agg(F.sum("v").alias("total"))
    return (
        s.crossJoin(F.broadcast(t))
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.round(F.sum(F.pow(F.col("v") / F.col("total"), 2)), 6).alias(
                "hhi"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Survival analysis: Kaplan-Meier product-limit estimator
# ---------------------------------------------------------------------------


@register(
    "survival_user_retention",
    """
    WITH bounds AS (SELECT max(ts) AS t_end FROM events),
    users AS (
      SELECT user_id,
             CAST(floor((epoch_us(max(e.ts)) - epoch_us(min(e.ts)))
                        / 86400e6) AS BIGINT) AS t_days,
             CASE WHEN epoch_us(b.t_end) - epoch_us(max(e.ts))
                       > 12 * 3600e6
                  THEN 1 ELSE 0 END AS churned
      FROM events e CROSS JOIN bounds b
      GROUP BY user_id, b.t_end),
    n AS (SELECT count(*) AS n0 FROM users),
    ticks AS (
      SELECT t_days,
             count(*) AS n_leaving,
             CAST(sum(churned) AS BIGINT) AS d_events
      FROM users GROUP BY t_days),
    km AS (
      SELECT t_days, d_events,
             CAST(n.n0 - coalesce(sum(n_leaving) OVER (ORDER BY t_days
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
      FROM ticks CROSS JOIN n)
    SELECT t_days, n_risk, d_events,
           round(exp(sum(ln(1.0 - CAST(d_events AS DOUBLE) / n_risk))
                     OVER (ORDER BY t_days ROWS UNBOUNDED PRECEDING)),
                 6) AS km_survival
    FROM km
    WHERE d_events > 0
    ORDER BY t_days
    """,
    doc="Kaplan-Meier user-retention curve with right-censoring: a "
    "user's lifetime is first→last event (whole days); users still "
    "active within 12 hours of the corpus end are CENSORED (they "
    "leave the risk set without counting as churn) — the estimator "
    "every retention dashboard approximates, done properly. The "
    "corpus collapses to |users| rows, then |lifetime| ticks; the "
    "product-limit Π(1 − d/n) runs as exp(Σln) so both engines "
    "accumulate identically. Curve rows only at actual churn ticks.",
)
def survival_user_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..timeutil import epoch_micros  # noqa: PLC0415

    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(F.max(epoch_micros(F.col("ts"))).alias("t_end_us"))
    users = (
        ev.crossJoin(F.broadcast(bounds))
        .groupBy("user_id")
        .agg(
            F.floor(
                (
                    F.max(epoch_micros(F.col("ts")))
                    - F.min(epoch_micros(F.col("ts")))
                )
                / 86400e6
            )
            .cast("long")
            .alias("t_days"),
            F.when(
                F.max(F.col("t_end_us")) - F.max(epoch_micros(F.col("ts")))
                > 12 * 3600e6,
                1,
            )
            .otherwise(0)
            .alias("churned"),
        )
    )
    n = users.agg(F.count(F.lit(1)).alias("n0"))
    ticks = users.groupBy("t_days").agg(
        F.count(F.lit(1)).alias("n_leaving"),
        F.sum("churned").alias("d_events"),
    )
    w_prev = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, -1
    )
    km = ticks.crossJoin(F.broadcast(n)).select(
        "t_days",
        "d_events",
        (
            F.col("n0")
            - F.coalesce(F.sum("n_leaving").over(w_prev), F.lit(0))
        ).alias("n_risk"),
    )
    w_run = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    surv = F.exp(
        F.sum(
            F.log(1.0 - F.col("d_events").cast("double") / F.col("n_risk"))
        ).over(w_run)
    )
    return (
        km.withColumn("km_survival", F.round(surv, 6))
        .filter(F.col("d_events") > 0)
        .select("t_days", "n_risk", "d_events", "km_survival")
        .orderBy("t_days")
    )


@register(
    "arch_effect_lags",
    """
    WITH hourly AS (
      SELECT CAST(epoch(date_trunc('hour', ts)) / 3600 AS BIGINT) AS h,
             avg(value) AS v
      FROM events GROUP BY 1),
    r AS (
      SELECT h, pow(v / lag(v) OVER (ORDER BY h) - 1, 2) AS r2
      FROM hourly),
    clean AS (SELECT h, r2 FROM r WHERE r2 IS NOT NULL),
    lags AS (SELECT unnest([1, 2, 3]) AS lag)
    SELECT l.lag,
           count(*) AS n_pairs,
           round(corr(cur.r2, prev.r2), 6) AS acf_sq
    FROM lags l
    JOIN clean cur ON TRUE
    JOIN clean prev ON prev.h = cur.h - l.lag
    GROUP BY l.lag ORDER BY l.lag
    """,
    doc="ARCH-effect diagnostic: autocorrelation of SQUARED hourly "
    "returns at lags 1-3 — volatility clustering (Engle's ARCH LM "
    "proxy), the test that decides whether a GARCH-family model is "
    "warranted for the reference's price series. Same collapsed-series "
    "shape as acf_value_lags: all joins run on the hours-sized "
    "relation, never raw events.",
)
def arch_effect_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..timeutil import epoch_seconds, trunc_wallclock  # noqa: PLC0415

    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        (epoch_seconds(trunc_wallclock("hour", F.col("ts"))) / 3600)
        .cast("long")
        .alias("h")
    ).agg(F.avg("value").alias("v"))
    w = Window.orderBy("h")
    clean = hourly.select(
        "h",
        F.pow(F.col("v") / F.lag("v").over(w) - 1, 2).alias("r2"),
    ).filter(F.col("r2").isNotNull())
    lags = spark.range(1, 4).select(F.col("id").alias("lag"))
    cur = clean.select(F.col("h").alias("h_cur"), F.col("r2").alias("r2_cur"))
    prev = clean.select(F.col("h").alias("h_prev"), F.col("r2").alias("r2_prev"))
    return (
        F.broadcast(lags)
        .crossJoin(cur)
        .join(prev, F.col("h_prev") == F.col("h_cur") - F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.corr("r2_cur", "r2_prev"), 6).alias("acf_sq"),
        )
        .orderBy("lag")
    )


@register(
    "wow_growth_by_type",
    """
    WITH weekly AS (
      SELECT event_type,
             CAST(date_trunc('week', ts) AS DATE) AS week,
             round(sum(value), 4) AS total
      FROM events GROUP BY event_type, date_trunc('week', ts))
    SELECT event_type, week, total,
           round(total / lag(total) OVER (PARTITION BY event_type
                                          ORDER BY week) - 1, 6)
             AS wow_growth
    FROM weekly
    ORDER BY event_type, week
    """,
    doc="Week-over-week growth per event type — the BI staple: weekly "
    "sums (one grouped aggregate) + lag ratio on the weeks-sized "
    "relation; first week NULL by construction on both engines.",
)
def wow_growth_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..timeutil import trunc_wallclock  # noqa: PLC0415

    ev = load(spark, sf_dir, "events")
    weekly = ev.groupBy(
        "event_type",
        F.to_date(trunc_wallclock("week", F.col("ts"))).alias("week"),
    ).agg(F.round(F.sum("value"), 4).alias("total"))
    w = Window.partitionBy("event_type").orderBy("week")
    return weekly.select(
        "event_type",
        "week",
        "total",
        F.round(F.col("total") / F.lag("total").over(w) - 1, 6).alias(
            "wow_growth"
        ),
    ).orderBy("event_type", "week")


@register(
    "burstiness_fano_per_user",
    """
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS h, count(*) AS n
      FROM events GROUP BY user_id, date_trunc('hour', ts))
    SELECT user_id,
           count(*) AS n_active_hours,
           round(avg(n), 6) AS mean_per_hour,
           round(var_pop(n) / avg(n), 6) AS fano
    FROM hourly
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Burstiness (Fano factor = var/mean of active-hour event "
    "counts) per user: ≈1 for Poisson-like organic activity, ≫1 for "
    "bursty bot/scraper traffic, ≪1 for metronomic automation — the "
    "cheap behavioral abuse signal. Two keyed aggregates, state "
    "bounded by |user×hour| then |users|. (Zero-count hours are "
    "excluded: this is burstiness GIVEN activity, the form that needs "
    "no calendar spine.)",
)
def burstiness_fano_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..timeutil import trunc_wallclock  # noqa: PLC0415

    ev = load(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "user_id", trunc_wallclock("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        hourly.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_active_hours"),
            F.round(F.avg("n"), 6).alias("mean_per_hour"),
            F.round(F.var_pop("n") / F.avg("n"), 6).alias("fano"),
        )
        .orderBy("user_id")
    )
