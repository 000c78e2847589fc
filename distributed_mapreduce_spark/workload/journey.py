"""User/customer journey analytics — funnel conversion over `events`,
SCD-2 style status islands over `orders`, weekly retention cohorts.

These are the sequential-behavior shapes a product-analytics or
warehouse pipeline runs daily: each is a pure DataFrame plan (staged
conditional aggregates, gaps-and-islands windows, cohort joins) with
an exact DuckDB oracle.

Reference parity note: the reference has no sequential operators —
its closest shape is the juice-side per-key reduce
(`juice_wordcount.py`); the funnel generalizes that to per-key
*ordered* state, which Spark expresses with windows and staged
min-aggregates instead of imperative reducers.

Scale notes (100 TB):
- The funnel is three filtered min-aggregates chained by equi-joins on
  user_id — every stage shuffles on the same key, so Spark reuses the
  partitioning; no window over raw events, no per-user state blowup.
- Status islands use windows partitioned by custkey (bounded per-key
  state, streams through WindowExec).
- Retention joins the per-user cohort (one row per user) back to
  distinct user-weeks; both sides shuffle on user_id once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from distributed_mapreduce_spark.workload.registry import query, table

#: Ordered funnel stages over `events.event_type`.
FUNNEL_STAGES = ("view", "click", "purchase")


@query(
    "events_funnel",
    oracle="""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
      SELECT e.user_id, min(e.ts) AS t_click
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t_view
      GROUP BY e.user_id
    ), s3 AS (
      SELECT e.user_id, min(e.ts) AS t_purchase
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
      GROUP BY e.user_id
    ), u AS (
      SELECT DISTINCT user_id FROM events
    )
    SELECT u.user_id, s1.t_view, s2.t_click, s3.t_purchase,
           CAST(CASE WHEN s3.user_id IS NOT NULL THEN 3
                     WHEN s2.user_id IS NOT NULL THEN 2
                     WHEN s1.user_id IS NOT NULL THEN 1
                     ELSE 0 END AS INTEGER) AS stage_reached
    FROM u
    LEFT JOIN s1 ON u.user_id = s1.user_id
    LEFT JOIN s2 ON u.user_id = s2.user_id
    LEFT JOIN s3 ON u.user_id = s3.user_id
    """,
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strictly-ordered funnel (view → click → purchase): per user the
    earliest view, the earliest click AFTER that view, the earliest
    purchase AFTER that click, and the stage reached.

    Plan: three filtered min-aggregates, each joined to the previous
    stage on user_id — same shuffle key throughout, so the exchanges
    collapse; no global windows, no per-user event collection."""
    ev = table(spark, sf_dir, "events")
    view, click, purchase = FUNNEL_STAGES
    s1 = ev.filter(F.col("event_type") == view).groupBy("user_id").agg(
        F.min("ts").alias("t_view")
    )
    s2 = (
        ev.filter(F.col("event_type") == click)
        .join(s1, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    s3 = (
        ev.filter(F.col("event_type") == purchase)
        .join(s2, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    u = ev.select("user_id").distinct()
    out = (
        u.join(s1, "user_id", "left")
        .join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
    )
    stage = (
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .when(F.col("t_view").isNotNull(), 1)
        .otherwise(0)
    )
    return out.select(
        "user_id", "t_view", "t_click", "t_purchase", stage.cast("int").alias("stage_reached")
    )


@query(
    "scd2_status_islands",
    oracle="""
    WITH ordered AS (
      SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
             CASE WHEN lag(o_orderstatus) OVER w IS NULL
                       OR lag(o_orderstatus) OVER w <> o_orderstatus
                  THEN 1 ELSE 0 END AS chg
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ), isl AS (
      SELECT o_custkey, o_orderstatus, o_orderdate,
             CAST(sum(chg) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey
                                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island_id
      FROM ordered
    )
    SELECT o_custkey, island_id, o_orderstatus AS status,
           min(o_orderdate) AS valid_from, max(o_orderdate) AS valid_to,
           count(*) AS n_orders
    FROM isl GROUP BY o_custkey, island_id, o_orderstatus
    """,
)
def q_scd2_status_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-2 style history build: collapse each customer's consecutive
    run of identical order statuses (ordered by orderdate, orderkey)
    into one [valid_from, valid_to] interval — the gaps-and-islands
    pattern (change flag via lag, island id via running sum).

    Plan: both windows partition by o_custkey with bounded per-key
    state; the final rollup re-aggregates on the same key."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderstatus").over(w)
    chg = F.when(prev.isNull() | (prev != F.col("o_orderstatus")), 1).otherwise(0)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    isl = orders.select(
        "o_custkey",
        "o_orderstatus",
        "o_orderdate",
        F.sum(chg).over(run).cast("long").alias("island_id"),
    )
    return (
        isl.groupBy("o_custkey", "island_id", F.col("o_orderstatus").alias("status"))
        .agg(
            F.min("o_orderdate").alias("valid_from"),
            F.max("o_orderdate").alias("valid_to"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .select(
            "o_custkey", "island_id", "status", "valid_from", "valid_to", "n_orders"
        )
    )


@query(
    "retention_cohorts",
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS ws FROM events
    ), cohort AS (
      SELECT user_id, min(ws) AS cohort_ws FROM uw GROUP BY user_id
    )
    SELECT CAST(cohort.cohort_ws AS TIMESTAMP) AS cohort_ws,
           CAST(date_diff('day', cohort.cohort_ws, uw.ws) / 7 AS BIGINT)
             AS week_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM uw JOIN cohort ON uw.user_id = cohort.user_id
    GROUP BY 1, 2
    """,
)
def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention triangle: users grouped by first-active week
    (cohort), counted in each later week they were active.

    Plan: distinct user-weeks (hash agg), per-user cohort (re-agg on
    user_id, same shuffle key), equi-join back on user_id, final small
    aggregate on (cohort, offset). DuckDB's date_trunc('week') returns
    DATE while Spark returns TIMESTAMP — the oracle casts (both engines
    truncate to Monday)."""
    ev = table(spark, sf_dir, "events")
    uw = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("ws")
    ).distinct()
    cohort = uw.groupBy("user_id").agg(F.min("ws").alias("cohort_ws"))
    joined = uw.join(cohort, "user_id")
    return (
        joined.select(
            "cohort_ws",
            (
                F.datediff(F.col("ws").cast("date"), F.col("cohort_ws").cast("date"))
                / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .groupBy("cohort_ws", "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
