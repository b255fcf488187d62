#!/usr/bin/env python
"""Physical-plan audit: summarize the Catalyst/Tungsten plan of every
bench headline query into PLANS.md — one row per query with the scan
pushdown, join strategies, exchange count, and codegen coverage that
the 100 TB design rules (SCALE.md) demand. Run after any plan-shaping
change; tests/test_plans.py pins the invariants, this file shows them.

Usage: python tools/plan_audit.py [sf_dir] [out_md]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from big_data_pr_spark.queries import REGISTRY  # noqa: E402
from big_data_pr_spark.session import get_spark  # noqa: E402


def plan_str(df) -> str:
    # simple mode: codegen spans show as `*(n)`, Exchange/Scan/
    # PushedFilters inline — one line per operator (formatted mode
    # duplicates operators in its details section)
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


JOIN_RE = re.compile(
    r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)"
)

# A nested-loop join is only scale-safe when one side is constant-
# bounded (1-row scalar, k centroids, a literal grid...). Above this
# many rows on BOTH sides it's a data-scale O(|L|x|R|) — flagged.
BNLJ_SMALL_SIDE_MAX = 10_000


def _simple_name(node) -> str:
    return node.getClass().getSimpleName()


def _rows_of(node):
    """numOutputRows of the executed subtree, descending through AQE/
    stage/codegen wrappers that carry no metric of their own."""
    opt = node.metrics().get("numOutputRows")
    if not opt.isEmpty():
        return opt.get().value()
    name = _simple_name(node)
    if name == "AdaptiveSparkPlanExec":
        return _rows_of(node.executedPlan())
    if name == "ReusedExchangeExec":
        # leaf wrapper around the original exchange; metrics live there
        return _rows_of(node.child())
    if "QueryStage" in name:
        try:
            return _rows_of(node.plan())
        except Exception:
            pass
    ch = node.children()
    if ch.size() >= 1:
        return _rows_of(ch.apply(0))
    return None


def nested_loop_sides(df) -> list[tuple[str, int | None, int | None]]:
    """(node, left_rows, right_rows) for every executed nested-loop
    join (BNLJ/cartesian) in the FINALIZED plan. The DataFrame must
    already have been executed (metrics are populated by the run)."""
    out: list[tuple[str, int | None, int | None]] = []

    def walk(node):
        name = _simple_name(node)
        if name == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if name in ("BroadcastNestedLoopJoinExec", "CartesianProductExec"):
            ch = node.children()
            out.append((name, _rows_of(ch.apply(0)), _rows_of(ch.apply(1))))
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))
        if "QueryStage" in name:
            try:
                walk(node.plan())
            except Exception:
                pass

    walk(df._jdf.queryExecution().executedPlan())
    return out


def bnlj_violations(
    df, max_rows: int = BNLJ_SMALL_SIDE_MAX
) -> list[tuple[str, int | None, int | None]]:
    """Nested-loop joins whose SMALLER side exceeds ``max_rows`` —
    i.e. data-scale O(|L|x|R|) work that no constant bound excuses.
    Unknown row counts (missing metrics) are treated as violations."""
    viol = []
    for name, l_rows, r_rows in nested_loop_sides(df):
        if l_rows is None or r_rows is None or min(l_rows, r_rows) > max_rows:
            viol.append((name, l_rows, r_rows))
    return viol


# Aggregates and limits COMPRESS their input: a global window above one
# runs over |groups|/k rows, not raw rows — the sanctioned pattern
# (SCALE.md:403 compress-first rule; e.g. lift_gain_deciles).
_COMPRESS_STOPS = (
    "HashAggregateExec",
    "ObjectHashAggregateExec",
    "SortAggregateExec",
    "AggregateInPandasExec",
    "GlobalLimitExec",
    "LocalLimitExec",
    "TakeOrderedAndProjectExec",
    "CollectLimitExec",
)

# Leaf scans that are constant-bounded at ANY scale factor (TPC-H fixed
# dimension tables) or driver literals — a global window over them is
# size-bounded by construction. RDDScanExec is a localCheckpoint scan:
# lineage is truncated there by design, so the audit cannot prove the
# checkpointed data was compressed — in this repo localCheckpoint is
# the idiom for SMALL iterative state (|days| peeling sets, CC labels),
# so it is exempted rather than flagged; a checkpoint of raw-scale rows
# fed to a global window would evade this guard (covered by review +
# the per-query scale notes, not the tool).
_BOUNDED_LEAVES = ("LocalTableScanExec", "EmptyRelationExec", "RDDScanExec")
_BOUNDED_TABLES = ("nation.parquet", "region.parquet")


def _unwrap(node):
    name = _simple_name(node)
    if name == "AdaptiveSparkPlanExec":
        return _unwrap(node.executedPlan())
    if name == "ReusedExchangeExec":
        return _unwrap(node.child())
    if "QueryStage" in name:
        try:
            return _unwrap(node.plan())
        except Exception:
            return node
    return node


def _raw_leaf_reachable(node) -> bool:
    """True if some path below ``node`` reaches a data-scale leaf scan
    without passing an aggregate or limit."""
    node = _unwrap(node)
    name = _simple_name(node)
    if name in _COMPRESS_STOPS:
        return False
    ch = node.children()
    if ch.size() == 0:
        if name in _BOUNDED_LEAVES:
            return False
        if name == "InMemoryTableScanExec":
            # a .cache()d intermediate is as raw as the plan that
            # produced it — descend into the cached plan so per-day /
            # per-group aggregates cached before a window don't flag
            try:
                return _raw_leaf_reachable(node.relation().cachedPlan())
            except Exception:
                return True
        s = node.toString()
        if any(t in s for t in _BOUNDED_TABLES):
            return False
        return True
    return any(_raw_leaf_reachable(ch.apply(i)) for i in range(ch.size()))


def global_window_violations(df) -> list[str]:
    """WindowExec/WindowInPandasExec nodes with an EMPTY partition spec
    whose input is raw-scale — Spark executes such windows as ONE task
    (every row through a single WindowExec partition), the scale-killer
    class the r8 judge plan-audit found 3 of by hand. A global window
    is fine when its child is an aggregate/limit/bounded table (a
    compressed domain); otherwise use windows.distributed_row_number /
    distributed_cumsum. The DataFrame must already have been executed
    (audits the finalized AQE plan)."""
    out: list[str] = []

    def walk(node):
        node = _unwrap(node)
        name = _simple_name(node)
        if name in ("WindowExec", "WindowInPandasExec"):
            try:
                unpartitioned = node.partitionSpec().isEmpty()
            except Exception:
                unpartitioned = False
            if unpartitioned and _raw_leaf_reachable(node.children().apply(0)):
                out.append(name)
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out


def single_partition_violations(df) -> list[str]:
    """ShuffleExchangeExec nodes with SinglePartition output whose input
    is raw-scale — the sibling of the global-window class: every raw row
    funnels through ONE shuffle partition and the downstream operator
    runs as one task (``repartition(1)``/``coalesce(1)`` on data,
    single-partition sorts). Legitimate SinglePartition exchanges sit
    above a compress stop by construction (GlobalLimit above LocalLimit,
    final aggregate above partial aggregate), so raw-reachable ones are
    plan defects. The DataFrame must already have been executed (audits
    the finalized AQE plan)."""
    out: list[str] = []

    def walk(node):
        node = _unwrap(node)
        name = _simple_name(node)
        if name == "ShuffleExchangeExec":
            try:
                single = (
                    node.outputPartitioning().toString() == "SinglePartition"
                )
            except Exception:
                single = False
            if single and _raw_leaf_reachable(node.children().apply(0)):
                out.append(name)
        elif name == "CoalesceExec":
            # coalesce(1) is WORSE than repartition(1): no shuffle, so
            # the entire upstream stage collapses to one task
            try:
                single = node.numPartitions() == 1
            except Exception:
                single = False
            if single and _raw_leaf_reachable(node.children().apply(0)):
                out.append(name)
        ch = node.children()
        for i in range(ch.size()):
            walk(ch.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out


def nested_output_columns(df) -> list[str]:
    """Output columns with nested types (array/map/struct) — the driver's
    oracle canonicalizer (pandas sort_values -> factorize over every
    column) cannot hash list/dict cells, so ANY nested output column
    makes the whole query driver-RED with `unhashable type` (r9's
    `multimodal_features` was the registry's only offender). Vector
    outputs must use the long form (id, dim, value) — posexplode — or a
    hex encoding. Schema-only: no execution needed."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    return [
        f"{f.name}: {f.dataType.simpleString()}"
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]


def audit(df) -> dict:
    # AQE only finalizes (and codegen-annotates) the plan on execution;
    # run the query so the audit reflects the plan that actually ran —
    # including runtime broadcast conversions and coalesced shuffles
    df.collect()
    # the finalized AQE output appends the pre-execution tree under
    # "== Initial Plan ==" — audit only the plan that ran
    plan = plan_str(df).split("== Initial Plan ==")[0]
    joins = JOIN_RE.findall(plan)
    short = {
        "BroadcastHashJoin": "BHJ",
        "SortMergeJoin": "SMJ",
        "ShuffledHashJoin": "SHJ",
        "BroadcastNestedLoopJoin": "BNLJ",
        "CartesianProduct": "CART",
    }
    n_exchange = len(
        re.findall(r"Exchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan)
    )
    n_scan = len(re.findall(r"FileScan parquet", plan))
    pushed = len(re.findall(r"PushedFilters: \[(?!\])", plan))
    codegen = len(set(re.findall(r"\*\((\d+)\)", plan)))
    # BatchEvalPython = row-at-a-time Python (banned on relational hot
    # paths; the UDTF extension point is the one sanctioned exception —
    # tests/test_plans.py::test_no_rowwise_python_udf_anywhere enforces
    # the ban per-query, this audit REPORTS it so one offender can't
    # kill the whole audit run)
    rowwise = "BatchEvalPython" in plan
    python_eval = any(
        node in plan
        for node in (
            "ArrowEvalPython",
            "MapInPandas",
            "FlatMapGroupsInPandas",
            "AggregateInPandas",
        )
    )
    topk = "TakeOrderedAndProject" in plan
    viol = bnlj_violations(df) if ("NestedLoop" in plan or "CartesianProduct" in plan) else []
    gw = global_window_violations(df) if "Window" in plan else []
    sp = (
        single_partition_violations(df)
        if ("Exchange SinglePartition" in plan or "Coalesce" in plan)
        else []
    )
    return {
        "bnlj_bounded": (
            "UNBOUNDED " + ";".join(f"{l}x{r}" for _, l, r in viol)
            if viol
            else "ok"
        ),
        "global_window": (
            f"RAW-GLOBAL x{len(gw)}" if gw else "ok"
        ),
        "single_partition": (
            f"RAW-SP x{len(sp)}" if sp else "ok"
        ),
        "joins": ",".join(short[j] for j in joins) or "—",
        "exchanges": n_exchange,
        "scans": n_scan,
        "pushed": pushed,
        "codegen": codegen,
        "python": (
            "ROW-WISE (UDTF)"
            if rowwise
            else "map/agg-InPandas" if python_eval else "none"
        ),
        "topk_heap": "yes" if topk else "—",
        "nested_output": (
            "NESTED " + ";".join(nested) if (nested := nested_output_columns(df)) else "ok"
        ),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_md = sys.argv[2] if len(sys.argv) > 2 else "PLANS.md"
    from bench import HEADLINE

    spark = get_spark("plan-audit")
    lines = [
        "# PLANS — physical-plan audit of the bench headline queries",
        "",
        f"Generated by `tools/plan_audit.py` at `{sf_dir}`. Columns: join",
        "strategies in plan order (BHJ=broadcast hash, SMJ=sort-merge),",
        "shuffle Exchange count, parquet scans, scans with non-empty",
        "`PushedFilters`, WholeStageCodegen span count, Python boundary",
        "(Arrow-batched only, never row-at-a-time), top-k via",
        "`TakeOrderedAndProject` (per-partition heaps, no global sort).",
        "",
        "Plans are the FINALIZED AQE plans (post-execution), so runtime",
        "re-optimizations are visible: e.g. fact-fact sort-merge joins",
        "(q21) convert to broadcast at this fixture scale — at 100 TB the",
        "same query keeps SMJ on the co-located l_orderkey shuffle, which",
        "is what `tests/test_plans.py` pins on the static plan.",
        "",
        "",
        "`global-window` flags WindowExec with an EMPTY partition spec",
        "whose input reaches a raw-scale scan with no aggregate/limit in",
        "between — Spark runs those as ONE task (use",
        "windows.distributed_row_number / distributed_cumsum instead);",
        "windows over aggregates/limits/fixed dimension tables are ok.",
        "",
        "`single-partition` flags Exchange SinglePartition whose input is",
        "raw-scale (same one-task funnel via repartition(1)/coalesce(1) or",
        "a single-partition sort); SinglePartition above a partial",
        "aggregate or LocalLimit is the normal compressed form and ok.",
        "",
        "`nested` flags array/map/struct OUTPUT columns — the driver's",
        "oracle canonicalizer cannot hash nested cells, so any such",
        "column driver-reds the query (vector outputs ship long-form",
        "(id, dim, value) or hex; guard:",
        "tests/test_plans.py::test_no_nested_output_schema_anywhere).",
        "",
        "| query | joins | exchanges | scans | pushed | codegen | python | top-k heap | bnlj | global-window | single-partition | nested |",
        "|---|---|---|---|---|---|---|---|---|---|---|---|",
    ]
    for name in HEADLINE:
        if name not in REGISTRY:
            continue
        a = audit(REGISTRY[name].fn(spark, sf_dir))
        lines.append(
            f"| {name} | {a['joins']} | {a['exchanges']} | {a['scans']} | "
            f"{a['pushed']} | {a['codegen']} | {a['python']} | {a['topk_heap']} | "
            f"{a['bnlj_bounded']} | {a['global_window']} | {a['single_partition']} | "
            f"{a['nested_output']} |"
        )
    lines.append("")
    with open(out_md, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_md} ({len(lines)} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
