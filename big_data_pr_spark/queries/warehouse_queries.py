"""Data-warehousing staples: SCD Type-2 dimension management and
gaps-and-islands interval analytics.

Reference capability these generalize: the reference serves only the
LATEST state per key (stream_processor.py's doc_id=symbol last-writer-
wins snapshot). SCD2 is the warehouse-grade version of that same
idea — keep every state interval with validity bounds so facts can be
joined against the attribute *as of their own event time* — and
gaps-and-islands is the interval algebra that turns point events back
into coverage spans.

Scale posture:
- SCD2 build: change detection + interval stitching are two frames of
  ONE keyed window sort (lag for the change gate, lead for the close
  bound) — a single hash exchange on the dimension key, dimension-
  sized state.
- Point-in-time join: equi-join on the dimension key with the validity
  range riding in the join condition — per-key fanout is the number of
  versions per key (orders per customer here), never a cross join.
- Interval merge: running max of interval ends over one keyed window
  detects island starts; a running sum labels islands; per-island
  bounds aggregate with one more keyed shuffle. All µs-integer
  arithmetic in codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..tables import load
from ..timeutil import epoch_micros
from .registry import register

_SCD2_SQL = """
    ordered AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
             lag(o_orderpriority) OVER w AS prev_prio
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)),
    changes AS (
      SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
      FROM ordered
      WHERE prev_prio IS NULL OR o_orderpriority <> prev_prio),
    dim AS (
      SELECT o_custkey AS custkey, o_orderpriority AS priority,
             o_orderdate AS valid_from,
             lead(o_orderdate) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey)
               AS valid_to
      FROM changes)
"""


@register(
    "scd2_build_customer_priority",
    f"""
    WITH {_SCD2_SQL}
    SELECT custkey, priority, valid_from, valid_to,
           (valid_to IS NULL) AS is_current
    FROM dim
    ORDER BY custkey, valid_from
    """,
    doc="SCD Type-2 dimension build from a change log: each customer's "
    "order-priority history collapsed into validity intervals — change "
    "detection via lag (only rows where the attribute actually "
    "changes open a version), interval stitching via lead (each "
    "version closes when the next opens; NULL valid_to = current). "
    "Both frames share ONE keyed window sort; deterministic "
    "(o_orderdate, o_orderkey) ordering makes the version set "
    "engine-stable. The warehouse-grade generalization of the "
    "reference's last-writer-wins doc_id=symbol snapshot.",
)
def scd2_build_customer_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    changes = orders.withColumn(
        "prev_prio", F.lag("o_orderpriority").over(w)
    ).filter(
        F.col("prev_prio").isNull()
        | (F.col("o_orderpriority") != F.col("prev_prio"))
    )
    dim = changes.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate")
        .over(Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey"))
        .alias("valid_to"),
    )
    return dim.select(
        "custkey",
        "priority",
        "valid_from",
        "valid_to",
        F.col("valid_to").isNull().alias("is_current"),
    ).orderBy("custkey", "valid_from")


@register(
    "scd2_point_in_time_revenue",
    f"""
    WITH {_SCD2_SQL}
    SELECT d.priority AS priority_at_ship,
           count(*) AS n_items,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN dim d
      ON d.custkey = o.o_custkey
     AND l.l_shipdate >= d.valid_from
     AND (d.valid_to IS NULL OR l.l_shipdate < d.valid_to)
    GROUP BY d.priority
    ORDER BY priority_at_ship
    """,
    doc="Point-in-time (temporal) join against the SCD2 dimension: "
    "revenue attributed to the priority regime each customer was in "
    "WHEN THE ITEM SHIPPED — not the current one, and not the "
    "ordering-time one (ships happen after newer orders may have "
    "changed the attribute). Equi-join on custkey with the validity "
    "range in the join condition: per-key fanout = versions per "
    "customer, so the fact table is shuffled once and never "
    "cross-joined.",
)
def scd2_point_in_time_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    dim = scd2_build_customer_priority(spark, sf_dir).drop("is_current")
    facts = li.join(
        orders.select("o_orderkey", "o_custkey"),
        li["l_orderkey"] == F.col("o_orderkey"),
    )
    joined = facts.join(
        dim,
        (F.col("o_custkey") == dim["custkey"])
        & (F.col("l_shipdate") >= dim["valid_from"])
        & (dim["valid_to"].isNull() | (F.col("l_shipdate") < dim["valid_to"])),
    )
    return (
        joined.groupBy(F.col("priority").alias("priority_at_ship"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
        .orderBy("priority_at_ship")
    )


@register(
    "merged_active_intervals",
    """
    WITH iv AS (
      SELECT user_id, event_id,
             epoch_us(ts) AS s,
             epoch_us(ts) + 900 * 1000000 AS e
      FROM events),
    marked AS (
      SELECT user_id, event_id, s, e,
             CASE WHEN s > max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND 1 PRECEDING)
                    OR max(e) OVER (PARTITION BY user_id ORDER BY s, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) IS NULL
                  THEN 1 ELSE 0 END AS new_island
      FROM iv),
    labeled AS (
      -- label ordered by the SAME total order (s, event_id) as the
      -- marking window: (s, e) ties whenever s ties (e = s + const),
      -- so engine-arbitrary tie order could diverge between engines
      SELECT user_id, s, e,
             sum(new_island) OVER (PARTITION BY user_id ORDER BY s, event_id
                                   ROWS UNBOUNDED PRECEDING) AS island
      FROM marked),
    islands AS (
      SELECT user_id, island, min(s) AS island_start, max(e) AS island_end
      FROM labeled GROUP BY user_id, island)
    SELECT user_id,
           count(*) AS n_islands,
           CAST(floor(sum(island_end - island_start) / 1000000) AS BIGINT)
             AS active_seconds
    FROM islands
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Gaps-and-islands interval merge: each event opens a 15-minute "
    "activity interval; overlapping intervals per user merge into "
    "islands (a new island starts when an interval's start exceeds the "
    "running max of all previous ends — THE gaps-and-islands gate, "
    "robust to intervals nested inside earlier ones where a simple "
    "lag(e) comparison miscounts), then per-user island count and "
    "total covered seconds. One keyed window sort + two keyed "
    "aggregates, all µs-integer codegen arithmetic.",
)
def merged_active_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        epoch_micros(F.col("ts")).alias("s"),
        (epoch_micros(F.col("ts")) + 900 * 1_000_000).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = iv.withColumn("prev_max_e", F.max("e").over(w_prev)).withColumn(
        "new_island",
        F.when(
            F.col("prev_max_e").isNull() | (F.col("s") > F.col("prev_max_e")), 1
        ).otherwise(0),
    )
    # same deterministic total order (s, event_id) as the marking
    # window — (s, e) ties whenever s does, and tie order must not be
    # engine-arbitrary or Spark and the oracle can label differently
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("s", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    labeled = marked.withColumn("island", F.sum("new_island").over(w_run))
    islands = labeled.groupBy("user_id", "island").agg(
        F.min("s").alias("island_start"), F.max("e").alias("island_end")
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_islands"),
            F.floor(
                F.sum(F.col("island_end") - F.col("island_start")) / 1_000_000
            )
            .cast("long")
            .alias("active_seconds"),
        )
        .orderBy("user_id")
    )
