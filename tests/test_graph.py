"""Structural invariants for the co-occurrence graph workload
(`workload/graph.py`) beyond the registry-wide differential."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_mapreduce_spark.workload import QUERIES
from distributed_mapreduce_spark.workload.graph import _edges


def test_edges_oriented_and_distinct(spark, sf_dir):
    e = _edges(spark, sf_dir).cache()
    assert e.filter(F.col("src") >= F.col("dst")).count() == 0
    assert e.count() == e.distinct().count()
    e.unpersist()


def test_triangle_corner_identity(spark, sf_dir):
    """Σ per-node triangle counts = 3 × total triangles (each triangle
    has exactly three corners)."""
    per_node = QUERIES["graph_triangle_counts"](spark, sf_dir)
    corner_sum = per_node.agg(F.sum("n_triangles")).first()[0]
    assert corner_sum % 3 == 0 and corner_sum > 0


def test_degree_hist_mass(spark, sf_dir):
    e = _edges(spark, sf_dir)
    n_nodes = (
        e.select(F.col("src").alias("n"))
        .unionAll(e.select(F.col("dst").alias("n")))
        .distinct()
        .count()
    )
    hist = QUERIES["graph_degree_hist"](spark, sf_dir)
    assert hist.agg(F.sum("n_nodes")).first()[0] == n_nodes


def test_common_neighbors_positive_and_sorted(spark, sf_dir):
    rows = QUERIES["graph_common_neighbors"](spark, sf_dir).collect()
    assert 0 < len(rows) <= 100
    counts = [r.n_common for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(c >= 1 for c in counts)
