"""Task-failure recovery: the Spark-native form of the reference's
failure rescheduler (pending tasks re-run on healthy nodes,
fileserver.py:739-790; gossip detection feeding it, server.py:163-171).

In Spark this is configuration, not code — `local[N, 3]` /
`spark.task.maxFailures` — so the test injects a real task failure
(first attempt of one partition dies) and asserts the stage retries to
the correct result.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark import TaskContext
from pyspark.sql import functions as F


def _flaky_first_attempt(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    ctx = TaskContext.get()
    if ctx is not None and ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
        raise RuntimeError("injected failure: first attempt of partition 0")
    for pdf in batches:
        yield pd.DataFrame({"doubled": pdf["v"] * 2})


def test_task_retry_recovers_from_injected_failure(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("v")).repartition(4)
    out = df.mapInPandas(_flaky_first_attempt, schema="doubled long")
    total = out.agg(F.sum("doubled").alias("s")).collect()[0]["s"]
    assert total == sum(2 * i for i in range(1000))


def test_task_retry_preserves_exactly_once_results(spark):
    # The retried partition's rows must appear exactly once (no
    # duplication from the failed attempt).
    df = spark.range(0, 1000).select(F.col("id").alias("v")).repartition(4)
    out = df.mapInPandas(_flaky_first_attempt, schema="doubled long")
    assert out.count() == 1000
    assert out.distinct().count() == 1000
