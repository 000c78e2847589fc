"""Structured Streaming: the streaming aggregations must equal their
batch twins on a closed input (availableNow trigger, memory sink)."""

from __future__ import annotations

import pytest

from distributed_mapreduce_spark.streaming.events_stream import (
    read_events_stream,
    run_to_memory,
    sessionized_counts,
    stateful_user_counts,
    windowed_counts,
)
from distributed_mapreduce_spark.workload.registry import table


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Re-land the sf0.001 events as micro-timestamped parquet (the
    original file uses TIMESTAMP(NANOS), unreadable by the stream
    source's schema reader)."""
    out = str(tmp_path_factory.mktemp("events_stream") / "landing")
    ev = table(spark, "/root/testdata/sf0.001", "events")
    ev.repartition(4).write.mode("overwrite").parquet(out)
    return out


def test_windowed_counts_matches_batch(spark, events_dir):
    stream = windowed_counts(read_events_stream(spark, events_dir), "1 hour", "2 hours")
    run_to_memory(stream, "win_stream")
    got = {
        (r["ws"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.table("win_stream").collect()
    }

    batch = spark.read.parquet(events_dir)
    from distributed_mapreduce_spark.workload.events import q_events_tumbling
    import distributed_mapreduce_spark.workload.events as we

    # batch twin over the same frame
    from pyspark.sql import functions as F

    expected_df = (
        batch.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("decimal(30,6)").alias("sum_value"),
        )
        .select(F.col("w.start").alias("ws"), "event_type", "n_events", "sum_value")
    )
    expected = {
        (r["ws"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in expected_df.collect()
    }
    assert got == expected and len(got) > 0


def test_stateful_user_counts_final_state_matches_batch(spark, events_dir):
    stream = stateful_user_counts(read_events_stream(spark, events_dir))
    run_to_memory(stream, "state_stream", output_mode="update")
    # Update-mode memory sink appends per batch; cumulative counts are
    # monotone so the max per user is the final state.
    rows = spark.table("state_stream").collect()
    got: dict[int, int] = {}
    for r in rows:
        got[r["user_id"]] = max(got.get(r["user_id"], 0), r["n_events"])
    expected = {
        r["user_id"]: r["n"]
        for r in spark.read.parquet(events_dir).groupBy("user_id").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert got == expected and len(got) > 0


def test_sessionized_counts_total_events_preserved(spark, events_dir):
    stream = sessionized_counts(read_events_stream(spark, events_dir), "30 minutes", "2 hours")
    run_to_memory(stream, "sess_stream")
    rows = spark.table("sess_stream").collect()
    total = sum(r["n_events"] for r in rows)
    assert total == spark.read.parquet(events_dir).count()
    assert all(r["session_start"] <= r["session_end"] for r in rows)
