"""Golden-oracle tests: every registry query vs its DuckDB oracle at
sf0.001 (the driver runs the same comparison at sf0.01 — SURVEY.md §5)."""

from __future__ import annotations

import os

import pytest

from big_data_pr_spark.queries import REGISTRY

from tools.verify_oracle import compare, duck_connect


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    ok, msg = compare(name, spark, duck, sf_dir)
    assert ok, f"{name}: {msg}"


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sma_7" in df.columns and "sma_30" in df.columns


def test_contract_shapes():
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 25


def test_driver_window_family_coverage():
    """The driver verifies only the FIRST 50 queries() entries (observed
    r2/r3): pin that the window stays exactly 50 known names and keeps
    one representative of every operator family, so adding registry
    entries can never silently push a family out of the verified set."""
    import __spark_entry__ as e

    # the r4 window had 51 _FRONT entries, silently dropping the 51st —
    # pin the rotation list itself to exactly 50 known registry names
    from big_data_pr_spark.queries import REGISTRY

    assert len(e._FRONT) == 50
    assert len(set(e._FRONT)) == 50
    assert set(e._FRONT) <= set(REGISTRY)
    front50 = list(e.queries())[:50]
    assert front50 == e._FRONT
    # The family map is shared with the rotation generator
    # (tools/rotate_window.py::FAMILIES — single source of truth);
    # candidate lists grow as families gain members. r8 relaxation (per
    # r7 verdict #1/#2): a family is covered when it has a window rep OR
    # any driver-green member in the cumulative ledger — fully-certified
    # families stop spending re-verification slots so the window burns
    # certification debt faster.
    import json

    from tools.rotate_window import FAMILIES

    with open(
        os.path.join(os.path.dirname(__file__), "..", "DRIVER_LEDGER.json")
    ) as f:
        ledger = json.load(f)["queries"]
    for fam, names in FAMILIES.items():
        assert set(names) <= set(REGISTRY), (fam, set(names) - set(REGISTRY))
        assert any(n in front50 for n in names) or any(
            n in ledger for n in names
        ), (fam, names)


def test_driver_ledger_consistent():
    """DRIVER_LEDGER.json (cumulative driver-green names from past
    CORRECTNESS files) only names real registry queries, and the current
    window spends its slots on never-verified queries first: every
    oracle-backed registry query absent from the ledger must be inside
    the 50-slot window."""
    import json

    import __spark_entry__ as e
    from big_data_pr_spark.queries import REGISTRY

    with open(os.path.join(os.path.dirname(__file__), "..", "DRIVER_LEDGER.json")) as f:
        ledger = json.load(f)["queries"]
    assert set(ledger) <= set(REGISTRY)
    never = {
        n
        for n, s in REGISTRY.items()
        if s.oracle is not None and n not in ledger
    }
    window = set(e._FRONT)
    # queries registered after the round's window was frozen may wait
    # for the next rotation, but ONLY those explicitly declared
    assert never - window == set(e._POST_FREEZE), sorted(
        (never - window) ^ set(e._POST_FREEZE)
    )
    assert not (set(e._POST_FREEZE) & window)


@pytest.mark.parametrize(
    "name",
    [
        "tumbling_hour_stats",
        "sliding_window_stats",
        "scalar_datetime",
        "high_watermark",
        "incremental_agg_merge",
        "ohlcv_candles_sma",
        "vwap_daily",
        "bollinger_bands",
        "cohort_retention",
        "unpivot_ohlc",
        "sessionize_events",
        "range_frame_rolling_sum",
        "rolling_corr_pairs",
        "gap_fill_forward",
        "asof_join_purchase_click",
        "incremental_new_rows",
        "union_dedup",
        "macd_12_26_9",
        "rsi_cutler_14",
        "session_window_native",
        "funnel_time_to_purchase",
        "interval_clicks_in_hot_windows",
        "candles_daily_rollup",
        "funnel_strict_sequence",
        # round-5b additions that read ts
        "gbt_score_events",
        "logreg_score_events",
        "gap_fill_interpolate",
        "forecast_gbt",
    ],
)
def test_timezone_independence(name, spark, sf_dir):
    """The driver controls its own session time zone; every timestamp
    query must produce identical results under ANY tz (guaranteed by
    keeping events.ts TIMESTAMP_NTZ — wall-clock semantics — and
    extracting epochs via timeutil's NTZ-safe arithmetic)."""
    utc_rows = sorted(
        map(repr, REGISTRY[name].fn(spark, sf_dir).collect())
    )
    other = spark.newSession()
    try:
        other.conf.set("spark.sql.session.timeZone", "Asia/Tokyo")
        tokyo_rows = sorted(
            map(repr, REGISTRY[name].fn(other, sf_dir).collect())
        )
    finally:
        other.conf.set("spark.sql.session.timeZone", "UTC")
    assert utc_rows == tokyo_rows


def test_no_decimal_oracle_columns(duck, sf_dir):
    """Driver-parity type guard (round-5 lesson): DuckDB types a raw
    integer ``sum()`` as HUGEINT, which serializes as Arrow
    decimal128(38,0) while Spark emits int64 — the driver hashes TYPED
    values, so numerically-equal results hash-mismatch (r5's only two
    red rows, plus 12 latent). Every oracle result must be decimal-free:
    wrap integer sums in CAST(... AS BIGINT)."""
    offenders = {}
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        if spec.oracle is None:
            continue
        tbl = duck.execute(spec.oracle).fetch_arrow_table()
        bad = [
            (f.name, str(f.type)) for f in tbl.schema if "decimal" in str(f.type)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, offenders


def test_no_negative_zero_oracle_cells(duck, sf_dir):
    """Registry-wide signed-zero lint (round-10 lesson, the companion
    of test_no_decimal_oracle_columns): a float output cell of IEEE
    -0.0 means the query rounds a signed quantity that lands at zero
    from below — exactly the configuration where Spark's F.round
    yields +0.0 and the driver's typed hash flips
    (sharpe_sortino_calmar, r10's only red row). The convention is to
    sign-normalize on BOTH sides (registry.roundz / oracle `+ 0.0`),
    so NO oracle may emit a -0.0 at the fixture SFs. Data-dependent by
    nature: the per-query compare gates catch an actual mismatch; this
    lint catches the exposure before the data ever exercises it."""
    import math

    import pyarrow as pa

    offenders = {}
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        if spec.oracle is None:
            continue
        tbl = duck.execute(spec.oracle).fetch_arrow_table()
        bad = [
            f.name
            for f in tbl.schema
            if pa.types.is_floating(f.type)
            and any(
                v is not None and v == 0.0 and math.copysign(1.0, v) < 0
                for v in tbl.column(f.name).to_pylist()
            )
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        f"oracle emits -0.0 (apply roundz / '+ 0.0'): {offenders}"
    )


def test_roundz_sign_normalization(spark):
    """registry.roundz contract: -0.0 → +0.0 (the whole point), every
    other value — positive, negative, NULL — passes through as plain
    round(x, n) would. Checked by bit pattern, not numeric equality."""
    import math
    import struct

    from pyspark.sql import functions as F

    from big_data_pr_spark.queries.registry import roundz

    cases = [-3.8e-7, -0.0, 0.0, 3.8e-7, -1.2345675, 1.2345675, None]
    df = spark.createDataFrame([(v,) for v in cases], "x double")
    got = [r["z"] for r in df.select(roundz(F.col("x")).alias("z")).collect()]
    for v, z in zip(cases, got):
        if v is None:
            assert z is None
            continue
        want = round(v, 6) + 0.0  # Python round + the same normalization
        assert struct.pack("<d", z) == struct.pack("<d", want), (v, z, want)
        assert math.copysign(1.0, z) > 0 or z != 0.0, (v, z)


def test_verifier_catches_hugeint(spark, duck, sf_dir):
    """Regression: the hardened Arrow-typed comparator must FAIL a
    deliberately un-CAST integer-sum oracle even though every value is
    numerically equal — exactly the class fetchall()-based comparison
    masked in round 5."""
    from big_data_pr_spark.queries.registry import QuerySpec
    from tools import verify_oracle

    bad_sql = "SELECT lang, sum(n_chars) AS sum_chars FROM documents GROUP BY lang ORDER BY lang"

    def fn(spark, sf_dir):
        import pyspark.sql.functions as F

        from big_data_pr_spark.tables import load

        return (
            load(spark, sf_dir, "documents")
            .groupBy("lang")
            .agg(F.sum("n_chars").alias("sum_chars"))
        )

    name = "__hugeint_regression__"
    REGISTRY[name] = QuerySpec(fn=fn, oracle=bad_sql, doc="test-only")
    try:
        ok, msg = verify_oracle.compare(name, spark, duck, sf_dir)
    finally:
        del REGISTRY[name]
    assert not ok
    assert "decimal" in msg, msg


def test_verifier_catches_signed_zero(spark, duck, sf_dir):
    """Regression (round-10 lesson): the comparator must FAIL on IEEE
    -0.0 vs +0.0 — numerically equal, but the driver hashes typed bytes
    and the sign bit differs (`sharpe_sortino_calmar` r10 driver-red).
    The previous `repr(v + 0.0)` normalization collapsed exactly this
    class. Oracle emits -0.0 via IEEE `-1.0 * 0.0`; Spark emits +0.0."""
    from big_data_pr_spark.queries.registry import QuerySpec
    from tools import verify_oracle

    def fn(spark, sf_dir):
        import pyspark.sql.functions as F

        return spark.range(1).select(F.lit(0.0).alias("z"))

    name = "__signed_zero_regression__"
    REGISTRY[name] = QuerySpec(
        fn=fn, oracle="SELECT -1.0 * CAST(0.0 AS DOUBLE) AS z", doc="test-only"
    )
    try:
        ok, msg = verify_oracle.compare(name, spark, duck, sf_dir)
        # and the sign-normalized form (the roundz/+0.0 contract) passes
        REGISTRY[name] = QuerySpec(
            fn=fn,
            oracle="SELECT -1.0 * CAST(0.0 AS DOUBLE) + 0.0 AS z",
            doc="test-only",
        )
        ok_fixed, msg_fixed = verify_oracle.compare(name, spark, duck, sf_dir)
    finally:
        del REGISTRY[name]
    assert not ok, "comparator must distinguish -0.0 from +0.0"
    assert "values differ" in msg, msg
    assert ok_fixed, f"+0.0 normalization should restore the match: {msg_fixed}"


def test_verifier_catches_spark_side_negative_zero(spark, duck, sf_dir):
    """r11 ADVICE: the exposure lint must also see SPARK-side -0.0 —
    a both-sides-unnormalized query (Spark -0.0, oracle -0.0) hashes
    green today but flips the moment either engine, SF, or fold order
    changes the sign. compare() now scans the Spark Arrow output for
    IEEE -0.0 float cells and fails with an EXPOSURE message even when
    the oracle matches bit-for-bit."""
    from big_data_pr_spark.queries.registry import QuerySpec
    from tools import verify_oracle

    def fn(spark, sf_dir):
        import pyspark.sql.functions as F

        return spark.range(1).select(
            (F.lit(-1.0) * F.lit(0.0)).alias("z")
        )

    name = "__spark_signed_zero_exposure__"
    REGISTRY[name] = QuerySpec(
        fn=fn, oracle="SELECT -1.0 * CAST(0.0 AS DOUBLE) AS z", doc="test-only"
    )
    try:
        ok, msg = verify_oracle.compare(name, spark, duck, sf_dir)
    finally:
        del REGISTRY[name]
    assert not ok, "both-sides -0.0 must register as exposure, not pass"
    assert "SPARK EXPOSURE" in msg, msg


def test_roundz_oracle_pairing_static():
    """r11 ADVICE: the roundz/'+ 0.0' contract was enforced only by
    data-dependent checks — a one-sided normalization stays green until
    some SF produces a near-zero negative. Static pairing lint: every
    oracle-backed query that sign-normalizes on the Spark side (a
    ``roundz(`` call or a literal ``+ 0.0`` term in the function
    source) must also normalize in its oracle (a ``+ 0.0`` term), and
    vice versa. The regex rejects ``+ 0.01``-style false hits."""
    import inspect
    import re

    plus0 = re.compile(r"\+ 0\.0(?![0-9])")
    one_sided = {}
    for name in sorted(REGISTRY):
        spec = REGISTRY[name]
        if spec.oracle is None:
            continue
        try:
            src = inspect.getsource(spec.fn)
        except (OSError, TypeError):
            src = ""
        spark_norm = bool(re.search(r"\broundz\(", src) or plus0.search(src))
        oracle_norm = bool(plus0.search(spec.oracle))
        if spark_norm != oracle_norm:
            one_sided[name] = {"spark": spark_norm, "oracle": oracle_norm}
    assert not one_sided, (
        f"one-sided signed-zero normalization (add roundz / '+ 0.0' "
        f"to the missing side): {one_sided}"
    )
