"""Semantic invariants for the journey workload (funnel ordering,
island structure, retention triangle)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from distributed_mapreduce_spark.workload import QUERIES


def test_funnel_strict_ordering(spark, sf_dir):
    f = QUERIES["events_funnel"](spark, sf_dir).cache()
    assert f.filter((F.col("stage_reached") >= 2) & ~(F.col("t_click") > F.col("t_view"))).count() == 0
    assert f.filter((F.col("stage_reached") >= 3) & ~(F.col("t_purchase") > F.col("t_click"))).count() == 0
    # stage_reached encodes exactly which timestamps are present.
    bad = f.filter(
        (F.col("stage_reached") >= 1) != F.col("t_view").isNotNull()
    ).unionAll(
        f.filter((F.col("stage_reached") >= 2) != F.col("t_click").isNotNull())
    ).unionAll(
        f.filter((F.col("stage_reached") >= 3) != F.col("t_purchase").isNotNull())
    )
    assert bad.count() == 0
    f.unpersist()


def test_islands_alternate_and_cover(spark, sf_dir):
    isl = QUERIES["scd2_status_islands"](spark, sf_dir).cache()
    # Islands are numbered 1..k per customer and consecutive islands
    # never share a status (else they would have been merged).
    w = Window.partitionBy("o_custkey").orderBy("island_id")
    seq = isl.select(
        "o_custkey",
        "island_id",
        "status",
        F.lag("island_id").over(w).alias("prev_id"),
        F.lag("status").over(w).alias("prev_status"),
    )
    assert seq.filter(
        F.col("prev_id").isNotNull() & (F.col("island_id") != F.col("prev_id") + 1)
    ).count() == 0
    assert seq.filter(
        F.col("prev_status").isNotNull() & (F.col("status") == F.col("prev_status"))
    ).count() == 0
    # Interval sanity + total order coverage.
    assert isl.filter(F.col("valid_from") > F.col("valid_to")).count() == 0
    from distributed_mapreduce_spark.workload.registry import table

    n_orders = table(spark, sf_dir, "orders").count()
    assert isl.agg(F.sum("n_orders")).first()[0] == n_orders
    isl.unpersist()


def test_retention_week0_equals_cohort_size(spark, sf_dir):
    r = QUERIES["retention_cohorts"](spark, sf_dir).cache()
    assert r.filter(F.col("week_offset") < 0).count() == 0
    # Week-0 cell of each cohort counts every cohort member (everyone
    # is active in their own first week), so it is the row-max per cohort.
    w0 = r.filter(F.col("week_offset") == 0).select("cohort_ws", F.col("n_users").alias("w0"))
    mx = r.groupBy("cohort_ws").agg(F.max("n_users").alias("mx"))
    assert w0.join(mx, "cohort_ws").filter(F.col("w0") != F.col("mx")).count() == 0
    r.unpersist()


def test_scd2_asof_covers_all_lineitems(spark, sf_dir):
    """Every lineitem whose ship date is on/after its customer's first
    interval matches exactly one status; totals reconcile."""
    from pyspark.sql import functions as F

    from distributed_mapreduce_spark.workload.registry import table

    total_matched = (
        QUERIES["scd2_asof_status"](spark, sf_dir)
        .agg(F.sum("n_lines"))
        .first()[0]
    )
    li = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    # ship date >= the customer's earliest order date → a dim row exists
    first_dt = orders.groupBy("o_custkey").agg(F.min("o_orderdate").alias("d0"))
    # the harness lineitem has duplicate (orderkey, linenumber) pairs;
    # the as-of window emits one status per distinct fact key
    eligible = (
        li.join(orders.select("o_orderkey", "o_custkey"),
                li["l_orderkey"] == F.col("o_orderkey"))
        .join(first_dt, "o_custkey")
        .filter(F.col("l_shipdate") >= F.col("d0"))
        .select("l_orderkey", "l_linenumber")
        .distinct()
        .count()
    )
    assert total_matched == eligible > 0
