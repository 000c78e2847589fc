"""Bloom filter invariants: zero false negatives, plausible false
positives, filter geometry."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_mapreduce_spark.workload import QUERIES
from distributed_mapreduce_spark.workload.sketches import BLOOM_BITS, WORD_BITS


def test_bloom_no_false_negatives_and_geometry(spark, sf_dir):
    stats = QUERIES["bloom_probe_stats"](spark, sf_dir).first()
    assert stats.n_false_neg == 0  # Bloom filters never miss a member
    assert stats.n_maybe >= stats.n_true
    assert stats.n_probes >= stats.n_maybe
    filt = QUERIES["bloom_build"](spark, sf_dir)
    assert filt.count() <= BLOOM_BITS // WORD_BITS
    # Every word fits in 32 bits (the DuckDB-safe mask range).
    assert filt.filter((F.col("bits") < 0) | (F.col("bits") >= (1 << 32))).count() == 0


def test_transitions_rows_sum_to_total(spark, sf_dir):
    t = QUERIES["event_transitions"](spark, sf_dir).cache()
    from distributed_mapreduce_spark.workload.registry import table

    ev = table(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # One transition per event except each user's first.
    assert t.agg(F.sum("n_transitions")).first()[0] == n_events - n_users
    # Row-normalized probabilities sum to ~10000 bp per source state.
    sums = t.groupBy("prev_type").agg(F.sum("prob_bp").alias("s"))
    assert sums.filter((F.col("s") > 10000) | (F.col("s") < 10000 - 25)).count() == 0
    t.unpersist()


def test_ab_arms_partition_users(spark, sf_dir):
    ab = QUERIES["ab_split_metrics"](spark, sf_dir)
    rows = {r.arm: r for r in ab.collect()}
    assert set(rows) == {"control", "treatment"}
    from distributed_mapreduce_spark.workload.registry import table

    ev = table(spark, sf_dir, "events")
    assert sum(r.n_users for r in rows.values()) == ev.select("user_id").distinct().count()
    assert sum(r.n_events for r in rows.values()) == ev.count()
