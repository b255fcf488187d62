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


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco
