"""Scale-posture assertions on physical plans: pushdown, pruning,
broadcast, top-k strategy. These encode the '100 TB would still work'
properties the DataFrame-first design buys."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_mapreduce_spark.plans import (
    explain_str,
    has_broadcast_join,
    pushed_filters,
    read_schema_columns,
)
from distributed_mapreduce_spark.workload import QUERIES


def test_filter_pushdown_reaches_parquet_scan(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderstatus") == "F"
    )
    assert any("o_orderstatus" in f for f in pushed_filters(df))


def test_projection_prunes_scan_columns(spark, sf_dir):
    df = QUERIES["project_column"](spark, sf_dir)
    schemas = read_schema_columns(df)
    assert schemas and all(cols == ["l_returnflag"] for cols in schemas)


def test_flagship_scan_reads_only_two_columns(spark, sf_dir):
    df = QUERIES["flagship_pct"](spark, sf_dir)
    schemas = read_schema_columns(df)
    assert schemas and set(schemas[0]) == {"o_orderstatus", "o_orderpriority"}
    # NB: trim(col) == lit is deliberately NOT pushed to parquet (a
    # function over the column defeats stats-based pushdown, and the
    # trim semantics are load-bearing); the filter still runs fused in
    # the scan's codegen stage before any exchange.


def test_dim_joins_broadcast(spark, sf_dir):
    assert has_broadcast_join(QUERIES["join_inner"](spark, sf_dir))
    assert has_broadcast_join(QUERIES["join_multiway"](spark, sf_dir))


def test_topk_avoids_global_sort(spark, sf_dir):
    plan = explain_str(QUERIES["topk"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


def test_grep_count_does_not_read_text_twice(spark, sf_dir):
    # regex filter must be applied at scan output, not post-shuffle:
    # the aggregate input schema is just the filter's output
    df = QUERIES["grep_count"](spark, sf_dir)
    schemas = read_schema_columns(df)
    assert schemas and set(schemas[0]) <= {"text"}
