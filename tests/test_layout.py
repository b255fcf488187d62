"""Z-order layout: multi-dimensional clustering must shrink per-file
min/max spans on EVERY z-ordered column simultaneously (the property
that makes parquet row-group skipping work for more than one filter
axis), and the rewrite must be content-preserving.

At equal file counts the PRODUCT of spans is ~1/n_files for any
clustered layout — Z-order's value is balance: a plain sort leaves its
non-leading columns at full span (no skipping for filters on them),
while Z-order bounds every listed dimension."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from big_data_pr_spark.operators import storage
from big_data_pr_spark.tables import load
from big_data_pr_spark.timeutil import epoch_micros


def _avg_dim_spans(path: str, cols: list[str]) -> dict[str, float]:
    """Per column: the average over files of the file's normalized
    min/max span — the fraction of the column's range a filter on that
    column must still read from a typical file (1.0 = no skipping)."""
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    lo: dict[str, float] = {}
    hi: dict[str, float] = {}
    per_file: list[dict[str, tuple[float, float]]] = []
    for f in files:
        md = pq.ParquetFile(f).metadata
        spans: dict[str, tuple[float, float]] = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name not in cols or col.statistics is None:
                    continue
                mn, mx = float(col.statistics.min), float(col.statistics.max)
                cur = spans.get(name)
                spans[name] = (
                    (mn, mx)
                    if cur is None
                    else (min(cur[0], mn), max(cur[1], mx))
                )
        per_file.append(spans)
        for name, (mn, mx) in spans.items():
            lo[name] = min(lo.get(name, mn), mn)
            hi[name] = max(hi.get(name, mx), mx)
    out: dict[str, float] = {}
    for name in cols:
        total = (hi[name] - lo[name]) or 1.0
        out[name] = sum(
            (s[name][1] - s[name][0]) / total for s in per_file
        ) / len(per_file)
    return out


@pytest.fixture(scope="module")
def events_numeric(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        epoch_micros("ts").alias("ts_us"),
        "value",
    )


def test_zorder_bounds_every_dimension(events_numeric, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("layout"))
    time_sorted = os.path.join(base, "by_time")
    zordered = os.path.join(base, "zorder")
    n_files = 16
    (
        events_numeric.repartitionByRange(n_files, "ts_us")
        .sortWithinPartitions("ts_us")
        .write.mode("overwrite")
        .parquet(time_sorted)
    )
    storage.write_zordered(
        events_numeric, zordered, ["user_id", "ts_us"], n_files
    )
    spans_t = _avg_dim_spans(time_sorted, ["user_id", "ts_us"])
    spans_z = _avg_dim_spans(zordered, ["user_id", "ts_us"])
    # plain time sort: files span the FULL user range — a user_id
    # filter skips nothing
    assert spans_t["user_id"] > 0.9, spans_t
    # z-order: both axes bounded (measured ~0.41 / ~0.31 at 16 files)
    assert spans_z["user_id"] < 0.65, spans_z
    assert spans_z["ts_us"] < 0.55, spans_z
    # minimax: the worst single-dimension filter is far better served
    assert max(spans_z.values()) < max(spans_t.values()) * 0.7


def test_zorder_write_is_content_preserving(events_numeric, spark, tmp_path):
    out = str(tmp_path / "z")
    storage.write_zordered(events_numeric, out, ["user_id", "ts_us"], 4)
    back = spark.read.parquet(out)
    assert back.count() == events_numeric.count()
    assert sorted(back.columns) == sorted(events_numeric.columns)
    a = events_numeric.agg(
        F.sum("event_id"), F.sum("user_id"), F.round(F.sum("value"), 2)
    ).first()
    b = back.agg(
        F.sum("event_id"), F.sum("user_id"), F.round(F.sum("value"), 2)
    ).first()
    assert tuple(a) == tuple(b)


def test_zorder_key_width_guard(events_numeric):
    with pytest.raises(ValueError):
        storage.zorder_column(
            events_numeric, ["user_id", "ts_us", "value", "event_id"], 16
        )
