"""Metadata-only schema evolution over raw parquet — Iceberg-style
column mapping without the table format.

Raw parquet directories can't rename or default-fill columns without
rewriting every file. Real table formats solve this with a *logical
schema* kept in metadata and mapped onto the physical file columns;
this module implements that mechanism directly:

- the table directory carries ``_schema.json`` — an append-only log of
  schema versions; each column spec is
  ``{"name": logical, "physical": file_column, "type": t,
  "default": v}``;
- ``add_column`` / ``rename_column`` / ``drop_column`` append a new
  schema version — O(bytes) metadata writes, NO data rewrite (old
  files are never touched; a rename keeps the original physical name
  so old AND new files stay readable);
- ``append`` writes new data files under the CURRENT schema (logical →
  physical rename on the way in);
- ``read`` scans with ``mergeSchema`` and applies the mapping on the
  way out: physical → logical select, missing-column backfill via the
  column default, type cast. Catalyst still sees a plain parquet scan
  underneath, so pushdown/pruning survive (filters on a renamed column
  push down to its physical name).

Atomicity: the schema log is written tmp + ``os.rename`` (same
commit primitive as operators/versioned.py — local-fs/HDFS atomic; an
object-store deployment swaps in a conditional put).

At 100 TB this is the difference between an ALTER TABLE that takes
milliseconds and one that rewrites 100 TB: evolution cost is O(schema
versions), never O(data).

Reference capability: generalizes the reference's implicit
schema-on-write evolution (Elasticsearch ``index.auto.create`` with an
optional index template, README.md:83-98) into explicit, versioned,
audited schema history.
"""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SCHEMA_FILE = "_schema.json"


def _log_path(table_dir: str) -> str:
    return os.path.join(table_dir, _SCHEMA_FILE)


def _read_log(table_dir: str) -> list[dict]:
    with open(_log_path(table_dir)) as f:
        return json.load(f)


def _write_log(table_dir: str, log: list[dict]) -> None:
    fd, tmp = tempfile.mkstemp(dir=table_dir, prefix="._schema_")
    try:
        with os.fdopen(fd, "w") as f:
            json.dump(log, f, indent=1)
        os.rename(tmp, _log_path(table_dir))
    except BaseException:
        if os.path.exists(tmp):
            os.remove(tmp)
        raise


def current_schema(table_dir: str) -> list[dict]:
    """Column specs of the latest schema version."""
    return _read_log(table_dir)[-1]["columns"]


def schema_history(table_dir: str) -> list[dict]:
    """The full append-only evolution log (audit trail)."""
    return _read_log(table_dir)


def init_table(df: DataFrame, table_dir: str) -> None:
    """Create the table: data files from ``df`` + schema version 0
    (logical names == physical names)."""
    os.makedirs(table_dir, exist_ok=True)
    df.write.mode("overwrite").parquet(os.path.join(table_dir, "data"))
    cols = [
        {"name": n, "physical": n, "type": t, "default": None}
        for n, t in df.dtypes
    ]
    _write_log(table_dir, [{"version": 0, "op": "init", "columns": cols}])


def _evolve(table_dir: str, op: str, columns: list[dict]) -> int:
    log = _read_log(table_dir)
    v = log[-1]["version"] + 1
    log.append({"version": v, "op": op, "columns": columns})
    _write_log(table_dir, log)
    return v


def add_column(
    table_dir: str, name: str, dtype: str, default=None
) -> int:
    """Metadata-only ADD COLUMN; rows in pre-existing files read back
    as ``default`` (NULL if not given). Returns the new schema version.

    Default semantics are read-time NULL-fill (ClickHouse-style): the
    default replaces NULLs from files predating the column AND genuine
    NULLs written later — declare a default only where null ≡ default.
    Distinguishing the two (Iceberg v3's initial-default vs
    write-default) would need per-file lineage, which plain parquet
    deliberately doesn't carry here."""
    log = _read_log(table_dir)
    cols = [dict(c) for c in log[-1]["columns"]]
    if any(c["name"] == name for c in cols):
        raise ValueError(f"column {name!r} already exists")
    # The physical name must be fresh across the WHOLE schema history,
    # not just the current version: reusing the physical name of a
    # previously-dropped column would map the new logical column onto
    # the dropped column's data still sitting in old files — deleted
    # values would resurrect instead of reading as the default. Real
    # table formats prevent this with monotonically-assigned field IDs;
    # the equivalent here is suffixing a never-before-used version.
    ever_physical = {
        c["physical"] for ver in log for c in ver["columns"]
    }
    physical = name
    if physical in ever_physical:
        physical = f"{name}_v{log[-1]['version'] + 1}"
        while physical in ever_physical:  # paranoia: suffixed name reused
            physical += "_"
    cols.append(
        {"name": name, "physical": physical, "type": dtype, "default": default}
    )
    return _evolve(table_dir, f"add:{name}", cols)


def rename_column(table_dir: str, old: str, new: str) -> int:
    """Metadata-only RENAME COLUMN: the physical name is retained so no
    file is rewritten; reads map physical → new logical name."""
    cols = [dict(c) for c in current_schema(table_dir)]
    names = {c["name"] for c in cols}
    if old not in names:
        raise KeyError(f"no column {old!r}")
    if new in names:
        raise ValueError(f"column {new!r} already exists")
    for c in cols:
        if c["name"] == old:
            c["name"] = new
    return _evolve(table_dir, f"rename:{old}->{new}", cols)


def drop_column(table_dir: str, name: str) -> int:
    """Metadata-only DROP COLUMN (data stays in old files; reads simply
    stop projecting it — column pruning means it is never even
    decoded)."""
    cols = [dict(c) for c in current_schema(table_dir) if c["name"] != name]
    if len(cols) == len(current_schema(table_dir)):
        raise KeyError(f"no column {name!r}")
    return _evolve(table_dir, f"drop:{name}", cols)


def append(df: DataFrame, table_dir: str) -> None:
    """Append data under the CURRENT logical schema. ``df`` must carry
    logical column names; they are mapped to physical names on the way
    in so files written before and after a rename stay consistent."""
    cols = current_schema(table_dir)
    missing = [c["name"] for c in cols if c["name"] not in df.columns]
    if missing:
        raise ValueError(f"append missing columns {missing}")
    phys = df.select(
        *[
            F.col(c["name"]).cast(c["type"]).alias(c["physical"])
            for c in cols
        ]
    )
    phys.write.mode("append").parquet(os.path.join(table_dir, "data"))


def read(spark: SparkSession, table_dir: str) -> DataFrame:
    """Scan the table under its current logical schema: mergeSchema
    parquet scan + physical→logical mapping + default backfill + cast.

    The projection is narrow (coalesce/cast/alias over the scan), so
    Catalyst pushes filters on logical columns down to the physical
    parquet columns."""
    cols = current_schema(table_dir)
    scan = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(table_dir, "data")
    )
    out = []
    for c in cols:
        if c["physical"] in scan.columns:
            e = F.col(c["physical"])
            if c["default"] is not None:
                e = F.coalesce(e, F.lit(c["default"]))
        else:
            # column added after every existing file was written and no
            # file carries it yet
            e = F.lit(c["default"])
        out.append(e.cast(c["type"]).alias(c["name"]))
    return scan.select(*out)
