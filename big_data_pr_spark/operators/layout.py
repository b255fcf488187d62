"""Z-order (Morton) interleaving as an ORACLE-PARITY expression pair.

The WRITE path for multi-dimensional clustering lives in
``operators/storage.py`` (``zorder_column``/``write_zordered``: N
min-max-scaled columns → range-clustered files, span shrinkage
asserted from parquet footers in tests/test_layout.py). This module is
its ANALYSIS twin: the same Morton interleave as a pair of expressions
— a Spark Column AND a character-identical ANSI-SQL string — so
Z-value computations can be hash-certified against a DuckDB oracle
(``zorder_layout_stats``). Differences are deliberate:

- raw clamped ints, NOT min-max scaling — scaling needs a stats pass
  whose float rounding an independent engine cannot replay exactly;
- additive bit placement (``+`` of disjoint powers of two, equal to
  ``|`` here) because DuckDB has no shiftleft/bitwiseOR spelled the
  same way.

Everything stays integer arithmetic inside whole-stage codegen. The
Morton bijection and 2×2-block locality are pinned in
tests/test_layout_privacy.py; the write path's multi-axis span
shrinkage in tests/test_layout.py.
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
