"""Query/oracle registry backing ``__spark_entry__.py``.

Contract (driver-imposed): each named query is a callable
``(spark, sf_dir) -> DataFrame``; its oracle is an ANSI-SQL string
DuckDB runs over the same parquet tables. Column names and values must
match exactly (the driver hashes values after sorting columns by name).
"""

from __future__ import annotations

import os
import zipfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

#: SparkContext ids already carrying the package zip (idempotence).
_SHIPPED: set[int] = set()


def _ensure_package_on_workers(spark: SparkSession) -> None:
    """Ship `distributed_mapreduce_spark` to Python workers via
    `addPyFile` (once per SparkContext).

    Queries that cross the Arrow boundary (`mapInPandas` /
    `applyInPandas`) serialize closures that reference this package BY
    MODULE NAME; the worker then has to import it. That works when the
    driver's cwd is the repo root (cwd lands on the worker's
    sys.path), but a grading harness launched from elsewhere with a
    default session would fail with ModuleNotFoundError on exactly the
    Python-boundary queries. Shipping the package as a zip makes the
    contract location-independent — addPyFile entries are placed on
    every task's sys.path.
    """
    sc = spark.sparkContext
    key = id(sc)
    if key in _SHIPPED:
        return
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zip_path = os.path.join("/tmp", "spark_graft_pkg.zip")
    # rebuild if missing or stale vs any source file
    try:
        zmtime = os.path.getmtime(zip_path)
    except OSError:
        zmtime = -1.0
    newest = max(
        (
            os.path.getmtime(os.path.join(dp, f))
            for dp, _, fs in os.walk(pkg_root)
            for f in fs
            if f.endswith(".py")
        ),
        default=0.0,
    )
    if newest > zmtime:
        tmp = zip_path + ".tmp"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as z:
            for dp, _, fs in os.walk(pkg_root):
                for f in fs:
                    if f.endswith(".py"):
                        full = os.path.join(dp, f)
                        rel = os.path.join(
                            "distributed_mapreduce_spark",
                            os.path.relpath(full, pkg_root),
                        )
                        z.write(full, rel)
        os.replace(tmp, zip_path)
    sc.addPyFile(zip_path)
    _SHIPPED.add(key)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a workload query; ``oracle=None`` → rows-only check
    (reserved for genuinely non-SQL-expressible ops)."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query id: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a harness table (see /root/repo/TESTDATA.md).

    Timestamp normalization (applied to whatever session the driver
    passes in — all three confs are runtime-settable):

    - NTZ-annotated parquet timestamps read as plain TIMESTAMP
      (`inferTimestampNTZ.enabled=false`): the stored micros become
      UTC instants, so `unix_micros` etc. see exactly the values
      DuckDB's naive TIMESTAMP exposes, independent of machine zone.
    - Session timezone pinned to UTC so zone-dependent derivations
      (date_trunc, hour, casts to string/date) agree with the naive
      oracle arithmetic.
    - Historic generators stored TIMESTAMP(NANOS), which Spark's
      vectorized reader rejects; read nanos as long and truncate to
      micros (what DuckDB does on the oracle side).
    """
    _ensure_package_on_workers(spark)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        ev = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(ev.dtypes).get("ts") == "bigint":
            ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return ev
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name in ("documents", "embeddings"):
        df = _spread_scan(df, spark)
    return df


def _spread_scan(df, spark: SparkSession):
    """Source-parallelism guard for the compute-heavy tables: the
    harness parquet ships ONE row group per file, and Spark cannot
    split a row group across tasks, so a `documents` or `embeddings`
    scan is a SINGLE task no matter spark.sql.files.maxPartitionBytes —
    which serializes every per-row token/vector pipeline built on it
    (winnowing's whole gram-hash/window-min stage ran as one 2.6 s
    task at sf0.1; ann_range_search's cosine scan ran as one 3 s task
    at sf1.0).

    When the scan under-parallelizes the session (fewer source tasks
    than half the configured shuffle parallelism), one round-robin
    exchange of the raw rows — megabytes here, and linear always —
    buys back full parallelism for the ~100x-the-bytes compute stages
    above it. At real scale the source has many splits and this is a
    NO-OP plan-wise; the gate reads only partition metadata (no job).
    Safe by construction: the engine has no input-order- or
    partition-dependent operator (grep-verified: no
    monotonically_increasing_id / input_file_name / spark_partition_id
    anywhere in the workload) and every oracle comparison is
    order-insensitive."""
    target = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if df.rdd.getNumPartitions() * 2 >= target:
        return df
    return df.repartition(target)
