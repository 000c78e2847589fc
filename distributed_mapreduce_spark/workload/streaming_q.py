"""Driver-graded Structured Streaming row (VERDICT r09 #9).

The nine streaming twins are bit-certified against their batch twins in
tests/test_streaming.py, but until round 10 none was graded by the
DRIVER's DuckDB differential. This module wraps the flagship streaming
operator — the watermarked tumbling-window aggregate — as a registry
query: land the events table as a streaming source directory, drain it
with an availableNow trigger into a memory sink, and return the final
table. On a closed input the result is bit-equal to the batch twin
(`events_tumbling`, Spark's batch/stream unification guarantee), so the
batch twin's DuckDB oracle grades the STREAMING execution path —
watermark bookkeeping, state store, micro-batch planner included.

Reference parity: the reference has no streaming surface; this is part
of the training-data-pipeline extension (SURVEY.md §6), where ingestion
is continuous and the batch operators must have streaming twins.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

from distributed_mapreduce_spark.workload.registry import query, table

#: Memory-sink names must be unique per drain within a session (a
#: second drain under the same name would race the first's table).
_SINK_SEQ = [0]


def _landing_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize `{sf_dir}/events.parquet` as a streaming landing
    directory (micro-timestamped parquet — the harness file is
    TIMESTAMP(NANOS), which the stream source's schema reader cannot
    take directly; `table()` already normalizes it).

    Keyed by the source file's identity (path, size, mtime) so a
    regenerated harness file re-lands instead of reusing stale data
    (same discipline as dedup's dataset fingerprint, ADVICE r07); the
    relanding is one linear write, cached across invocations within
    and across sessions. A `_SUCCESS` marker gates reuse so a crashed
    partial write is never streamed."""
    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    key = hashlib.sha256(
        f"{os.path.abspath(src)}|{st.st_size}|{st.st_mtime_ns}".encode()
    ).hexdigest()[:16]
    out = os.path.join("/tmp/spark_graft_stream_landing", key)
    if not os.path.exists(os.path.join(out, "_SUCCESS")):
        table(spark, sf_dir, "events").repartition(4).write.mode(
            "overwrite"
        ).parquet(out)
    return out


@query(
    "stream_events_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS ws, event_type,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,6))) AS DECIMAL(30,6)) AS sum_value
    FROM events GROUP BY 1, 2
    """,
)
def q_stream_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window per event_type, computed BY THE STREAMING
    ENGINE: file-source stream over the landed events directory →
    watermarked window aggregate (`streaming.events_stream.
    windowed_counts`) → availableNow drain into a memory sink; the
    returned DataFrame reads the sink's final (complete-mode) table.

    Unlike every other registry row this executes at build time (the
    drain must finish before the result table exists) — the plan-sweep
    tests account for materializing entries. The oracle is the batch
    twin's SQL verbatim: on a closed input the streaming aggregate's
    final state must equal the batch aggregate bit-for-bit (certified
    in tests/test_streaming.py; graded by the driver here).

    Scale shape: state is O(active windows x event types) under the
    watermark, not O(stream length); the memory sink is test/driver
    plumbing — production uses the kafka/parquet sink writers in
    streaming/events_stream.py."""
    from distributed_mapreduce_spark.streaming.events_stream import (
        read_events_stream,
        run_to_memory,
        windowed_counts,
    )

    landing = _landing_dir(spark, sf_dir)
    _SINK_SEQ[0] += 1
    name = f"stream_events_tumbling_sink_{_SINK_SEQ[0]}"
    stream = windowed_counts(
        read_events_stream(spark, landing), window="1 hour", watermark="2 hours"
    )
    run_to_memory(stream, name, output_mode="complete")
    return spark.table(name)
