"""SparkSession factory with scale-ready defaults.

The reference engine hand-rolls its runtime (leader election at
file_server/fileserver.py:1075-1079, round-robin task placement at
fileserver.py:340-341, failure rescheduling at fileserver.py:739-790).
All of that is Spark configuration here, not code: AQE re-plans at
runtime, skew joins are auto-split, and shuffle partitioning is sized
for the local harness while remaining overridable for a real cluster.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "distributed_mapreduce_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    ``cpus`` defaults to $SPARK_GRAFT_CPUS (harness contract) or all
    local cores. On a real cluster, ``master`` comes from spark-submit
    and the local[] default is ignored.
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 1)

    # local[N, 3]: up to 3 attempts per task. Plain local[N] runs with
    # maxFailures=1 (any task error fails the job), which hides the
    # failure-recovery semantics the reference hand-rolls (pending-task
    # rescheduling, fileserver.py:739-790) and every real cluster has.
    builder = (
        SparkSession.builder.master(f"local[{cpus}, 3]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime coalescing, skew-join splitting, dynamic join
        # strategy switch — the scale posture for 100 TB inputs.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Exchanges START wide and AQE coalesces them by measured bytes:
        # with a fixed spark.sql.shuffle.partitions=cores, a billion-row
        # gram/pair shuffle lands ~50 M rows per task and goes
        # super-linear on spill (text_ngram_novelty measured x1000
        # slope 2.07 at 32 partitions); with a wide initial count the
        # same stage keeps enough tasks while small stages still
        # coalesce down to a handful. This is the data-dependent
        # partition sizing the engine wants everywhere, done by the
        # runtime instead of per-query sizing jobs.
        .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "1024")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Arrow for every pandas_udf / applyInPandas boundary.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
