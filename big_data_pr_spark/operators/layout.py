"""Multi-dimensional data layout: Z-order (Morton) clustering.

THE physical-layout lever for multi-column filters at 100 TB. Sorting
a table by one column gives perfect file skipping on that column and
none on any other; interleaving the bits of two (or more) columns into
a single Z-value and range-partitioning on it bounds EVERY dimension's
min/max range within each file, so predicates on either column prune
files (the Delta Lake ``OPTIMIZE ZORDER BY`` / ClickHouse
space-filling-curve idea, from Morton 1966).

Everything here is integer bit arithmetic on built-in column
expressions — whole-stage codegen, no UDFs, no shuffle beyond the one
range sort that IS the layout operation.

Scale notes:
- the Z-value is computed per-row (narrow map); the only wide
  operation is the final ``repartitionByRange``/sort on the Z-value —
  exactly the shuffle a single-column layout sort would pay;
- file-level min/max stats per dimension (what parquet row-group
  pruning reads) shrink as O(1/sqrt(files)) per dim for 2-D Z-order
  vs O(1) (no pruning) for the non-sorted dimension of a linear sort.

No reference parity: the reference has no layout optimizer; this
extends the storage family (storage.write_partitioned/write_bucketed).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def zvalue(x: Column, y: Column, bits: int = 8) -> Column:
    """Morton-interleave two non-negative ints clamped to ``bits`` bits
    each into a single Z-value (x in even bit positions, y in odd).

    Pure integer arithmetic (`shiftright`/`&`/`*`) so it stays inside
    whole-stage codegen and is reproducible in ANSI SQL oracles
    (DuckDB: ``(x // 2^i) % 2 * 2^(2i)`` terms).
    """
    cap = (1 << bits) - 1
    xc = F.least(F.greatest(x.cast("long"), F.lit(0)), F.lit(cap))
    yc = F.least(F.greatest(y.cast("long"), F.lit(0)), F.lit(cap))
    z = F.lit(0)
    for i in range(bits):
        z = (
            z
            + F.shiftright(xc, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
            + F.shiftright(yc, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
        )
    return z


def zvalue_sql(x: str, y: str, bits: int = 8) -> str:
    """The DuckDB/ANSI twin of :func:`zvalue` (oracle parity)."""
    cap = (1 << bits) - 1
    xc = f"least(greatest(CAST({x} AS BIGINT), 0), {cap})"
    yc = f"least(greatest(CAST({y} AS BIGINT), 0), {cap})"
    terms = []
    for i in range(bits):
        terms.append(f"(({xc} // {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"(({yc} // {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return "(" + " + ".join(terms) + ")"
