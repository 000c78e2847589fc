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

        ev = _read_spread(spark, f"{sf_dir}/{name}.parquet", spread=False)
        if dict(ev.dtypes).get("ts") == "bigint":
            ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return ev
    return _read_spread(
        spark,
        f"{sf_dir}/{name}.parquet",
        spread=name in ("documents", "embeddings"),
    )


def _read_spread(spark: SparkSession, path: str, spread: bool):
    """Read a parquet table, optionally guarding source parallelism:
    the harness parquet ships ONE row group per file, and Spark cannot
    split a row group across tasks, so every base scan here is a
    SINGLE task no matter spark.sql.files.maxPartitionBytes.

    ``spread`` is True for the COMPUTE-DENSE tables only — documents
    (text) and embeddings (vectors), whose every consumer runs heavy
    per-row kernels (tokenization, gram hashing, dot products) directly
    above the scan, so a serialized first stage dominates the query
    (winnowing's gram-hash/window-min ran as one 2.6 s task at sf0.1;
    ann_range_search's cosine scan as one 3 s task at sf1.0). For
    those, one round-robin exchange of the raw rows — megabytes, and
    linear always — buys back full parallelism for the ~100x-the-bytes
    compute above it. At real scale the source has many splits and the
    gate below makes this a NO-OP plan-wise.

    Deliberately NOT applied to the relational/scalar tables
    (VERDICT r09 #8 asked for uniformity; measured and rejected): their
    plans reach a Catalyst exchange after cheap narrow ops, so the
    single-task scan pipelines into the first shuffle's map side and
    the extra exchange is pure cost — spreading every table regressed
    the 69-query sf0.1 bench by +21.8 s spread over 66 queries
    (+0.3-1.1 s each, BENCH r10 bisect) with no winner outside the
    compute-dense pair. The distinction is a semantic property of the
    table's columns (per-row kernel inputs vs relational scalars), not
    a byte heuristic.

    This helper OWNS the read rather than wrapping arbitrary plans
    (ADVICE r09): the parallelism probe `df.rdd.getNumPartitions()` is
    job-free only on a bare file-source scan — under AQE, `.rdd` on a
    plan with pending exchanges would silently execute them. Filters
    and projections callers add later still reach the scan: Catalyst
    pushes predicates/pruning through RepartitionOperation, so the
    exchange carries only post-filter rows.

    Safe by construction: the engine has no input-order- or
    partition-dependent operator (grep-verified: no
    monotonically_increasing_id / input_file_name / spark_partition_id
    anywhere in the workload) and every oracle comparison is
    order-insensitive."""
    df = spark.read.parquet(path)
    if not spread:
        return df
    target = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if df.rdd.getNumPartitions() * 2 >= target:
        return df
    return df.repartition(target)


#: wide_shuffle_parts sizing: one shuffle task per this many SOURCE
#: parquet bytes. A token/gram explode inflates text ~10-30x in flight,
#: so 2 MiB of source parquet ≈ 20-60 MiB of shuffle per task — inside
#: executor memory with headroom. Derived from the measured x1000
#: point: documents at x1000 is ~850 MB → ~420 tasks, the width class
#: AQE picked (and that fixed the 2.07 slope) under round 9's global
#: initialPartitionNum=1024 before it was scoped away.
WIDE_BYTES_PER_TASK = 2 << 20

#: Hard cap on an input-scaled exchange width (same role as
#: PAIR_MAX_PARTITIONS / RA_MAX_PARTITIONS in the pair families).
WIDE_MAX_PARTITIONS = 2048


def wide_shuffle_parts(
    spark: SparkSession,
    sf_dir: str,
    table_name: str = "documents",
    bytes_per_task: int = WIDE_BYTES_PER_TASK,
) -> int | None:
    """Input-scaled width for a compute-EXPANDING exchange (token/gram
    explode streams, per-key window sorts over the full fact table), or
    None when the session default already suffices — callers skip the
    repartition entirely, so small-SF plans are byte-identical to the
    ungated ones.

    This is the scoped replacement for round 9's global
    `initialPartitionNum=1024` (VERDICT r09 #1): that conf fixed the
    gram shuffles (text_ngram_novelty x1000 slope 2.07→1.01) but taxed
    every tiny exchange in the iterative queries 3-4.4x. Width belongs
    to the exchange that needs it, sized from the exchange's own input
    volume, not to the session.

    Sizing reads ONLY filesystem metadata for the source table (file
    size on disk; no Spark job — plan-only constructions stay
    job-free, unlike the sizing-job helpers `_pair_shuffle_parts` /
    `_wedge_shuffle_parts` whose volumes are super-linear in input and
    must be measured). A gram/token/window stream is linear in source
    bytes, so compressed parquet bytes are an honest proxy. Callers
    hash-partition by (a subset of) the downstream aggregation or
    window keys, so the explicit exchange REPLACES the default-width
    one Catalyst would insert rather than adding a shuffle."""
    path = os.path.join(sf_dir, f"{table_name}.parquet")
    try:
        if os.path.isdir(path):
            nbytes = sum(
                os.path.getsize(os.path.join(dp, f))
                for dp, _, fs in os.walk(path)
                for f in fs
            )
        else:
            nbytes = os.path.getsize(path)
    except OSError:
        return None
    default_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    n = -(-nbytes // bytes_per_task)
    if n <= default_parts:
        return None
    return int(min(WIDE_MAX_PARTITIONS, n))
