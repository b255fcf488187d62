"""User-defined table functions (PySpark 4 UDTF API) — the engine's
SQL-callable extension point.

The hot paths in this repo stay inside whole-stage codegen on purpose
(SCALE.md §Python boundary); UDTFs are the documented escape hatch for
logic a user wants callable FROM SQL as a table source — the Spark-4
equivalent of Hive's LATERAL VIEW + custom UDTF surface. Registration
is per-session (``register_udtfs``); invocation is
``SELECT t.* FROM docs, LATERAL top_tokens(text, 3) t``.

Scale posture: a UDTF evaluates row-at-a-time in a Python worker, so
it carries the same cost ceiling as any Python UDF — fine as a narrow
map over already-reduced data, wrong for corpus-scale hot loops (use
the codegen/Arrow operators in text.py for those). The point here is
the API surface and its correctness contract, which
``udtf_top_tokens`` hash-certifies against a pure-SQL replay.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="token string, n int, rk int")
class TopTokens:
    """Top-``k`` whitespace tokens of ``text`` by count, ties broken
    lexicographically — deterministic, so SQL-replayable."""

    def eval(self, text: str, k: int):  # noqa: D102
        from collections import Counter

        if text is None:  # SQL semantics: NULL input -> no rows
            return
        ranked = sorted(
            Counter(text.split(" ")).items(), key=lambda kv: (-kv[1], kv[0])
        )
        for rk, (tok, n) in enumerate(ranked[: k or 0], start=1):
            yield tok, n, rk


@udtf(returnType="pos int, gram string")
class CharNgrams:
    """Character ``n``-grams of ``text`` with 1-based positions."""

    def eval(self, text: str, n: int):  # noqa: D102
        if text is None:  # SQL semantics: NULL input -> no rows
            return
        for i in range(max(len(text) - n + 1, 0)):
            yield i + 1, text[i : i + n]


def register_udtfs(spark) -> None:
    """Register every UDTF on the session (idempotent overwrite)."""
    spark.udtf.register("top_tokens", TopTokens)
    spark.udtf.register("char_ngrams", CharNgrams)
