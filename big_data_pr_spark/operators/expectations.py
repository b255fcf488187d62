"""Data-quality expectations — declarative table checks in ONE pass.

The dbt-test / Great-Expectations surface reduced to its Spark shape:
each rule compiles to a conditional-count aggregate expression, the
whole rule set evaluates in a single scan (one partial-agg reduce to a
1-row frame), and the result unpivots to ``(rule, n_violations)`` so a
pipeline can gate on ``max(n_violations) == 0``.

Supported rules:
- ``not_null(col)``
- ``unique(col)``          (violations = extra copies: n - n_distinct)
- ``accepted_values(col, values)``
- ``in_range(col, lo, hi)``  (inclusive; NULLs don't violate — pair
  with not_null when they should)
- ``matches(col, regex)``

Scale: everything is COUNT/COUNT DISTINCT aggregates — map-side
partial, 1-row output, no second scan per rule (the failure mode of
running N separate test queries over a 100 TB table). ``unique`` is
the only rule that expands the shuffle (distinct by value); run it on
key columns, not payloads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def not_null(col: str) -> tuple[str, Column]:
    return f"not_null:{col}", F.count(F.when(F.col(col).isNull(), 1))


def unique(col: str) -> tuple[str, Column]:
    return f"unique:{col}", F.count(F.col(col)) - F.countDistinct(F.col(col))


def accepted_values(col: str, values) -> tuple[str, Column]:
    cond = ~F.col(col).isin(*values) & F.col(col).isNotNull()
    return f"accepted_values:{col}", F.count(F.when(cond, 1))


def in_range(col: str, lo, hi) -> tuple[str, Column]:
    cond = (F.col(col) < lo) | (F.col(col) > hi)
    return f"in_range:{col}", F.count(F.when(cond, 1))


def matches(col: str, regex: str) -> tuple[str, Column]:
    cond = ~F.col(col).rlike(regex) & F.col(col).isNotNull()
    return f"matches:{col}", F.count(F.when(cond, 1))


def check(df: DataFrame, rules) -> DataFrame:
    """Evaluate all rules in one aggregation pass; returns
    ``(rule, n_violations)`` one row per rule, ordered by rule name."""
    names, exprs = zip(*rules)
    agg = df.agg(*[e.cast("long").alias(f"__r{i}") for i, e in enumerate(exprs)])
    stack = F.expr(
        "stack({n}, {pairs})".format(
            n=len(names),
            pairs=", ".join(f"'{name}', __r{i}" for i, name in enumerate(names)),
        )
    ).alias("rule", "n_violations")
    return agg.select(stack).orderBy("rule")


def passed(df: DataFrame, rules) -> bool:
    """True iff every rule has zero violations (gate form)."""
    row = check(df, rules).agg(F.max("n_violations")).collect()[0][0]
    return (row or 0) == 0
