"""Query registry — the single source of truth wiring every implemented
operator (SURVEY.md §2 + extensions) to

1. a Spark implementation ``(spark, sf_dir) -> DataFrame``, and
2. an equivalent ANSI-SQL oracle string runnable by DuckDB on the same
   parquet fixture tables (``None`` for genuinely non-SQL-expressible
   ops — the driver then records a weaker rows-only check).

``__spark_entry__.py`` re-exports this registry as ``queries()`` /
``oracle_sql()``.

Contract invariants (driver compares row-count + schema + order-
insensitive value hash):
- column NAMES must match between Spark result and oracle result —
  alias everything on both sides;
- float aggregates are rounded (4-6 dp) on BOTH sides so
  accumulation-order differences between engines can't flip the hash;
- rounded float outputs that can be NEGATIVE near zero are
  sign-normalized on BOTH sides (``roundz`` here / ``+ 0.0`` in the
  oracle SQL): a value like -3.8e-7 rounds to IEEE -0.0 in DuckDB but
  +0.0 in Spark — numerically equal, hash-DIFFERENT under the driver's
  typed-bytes hash (round-10 red row ``sharpe_sortino_calmar``);
- every LIMIT/top-k is preceded by a total order (unique tie-break
  column) so the selected row set is deterministic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None  # DuckDB-runnable ANSI SQL, or None → rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def roundz(col, scale: int = 6):
    """Sign-normalized round for float output columns.

    ``round()`` of a tiny negative (e.g. -3.8e-7) yields IEEE **-0.0**
    in DuckDB but **+0.0** under Spark's ``F.round`` — numerically
    equal, but the driver hashes typed bytes and the sign bit differs
    (round-10 driver-red ``sharpe_sortino_calmar``). Adding literal
    +0.0 canonicalizes: IEEE round-to-nearest gives -0.0 + 0.0 = +0.0,
    and every other value is unchanged. The oracle twin must apply the
    same normalization: ``round(x, n) + 0.0``.
    """
    from pyspark.sql import functions as F

    return F.round(col, scale) + F.lit(0.0)


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco
