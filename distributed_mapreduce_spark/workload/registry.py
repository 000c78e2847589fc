"""Query/oracle registry backing ``__spark_entry__.py``.

Contract (driver-imposed): each named query is a callable
``(spark, sf_dir) -> DataFrame``; its oracle is an ANSI-SQL string
DuckDB runs over the same parquet tables. Column names and values must
match exactly (the driver hashes values after sorting columns by name).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


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
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F

        ev = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if dict(ev.dtypes).get("ts") == "bigint":
            ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return ev
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
