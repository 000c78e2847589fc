"""The MapleJuice generality surface (SURVEY.md §2.9) — the reference's
defining capability: run *arbitrary user logic* over shards (maple) and
key groups (juice).

Reference contract:
- ``maple <exe> <num_maples> <prefix> <src> <param>`` runs the exe per
  shard; it emits per-key files ``prefix--key.csv`` whose lines are
  values (file_server/fileserver.py:1338-1355, data/maple-exe.go:102-142).
- ``juice <exe> <num_juices> <prefix> <dest> <delete> <hash|range>``
  runs the exe per reducer over its assigned key groups
  (fileserver.py:1356-1371, 557-571).

Spark-first re-expression:
- The *functional* runner is primary: maple = Arrow-batched
  ``mapInPandas`` over shards; juice = ``applyInPandas`` over key
  groups (grouped-map Pandas UDF — exactly "arbitrary function per key
  group"). Keys live in a column, not in filenames.
- The *executable* runner is a compatibility shim on ``rdd.pipe``:
  the exe reads lines on stdin and writes ``key\\tvalue`` lines on
  stdout (the key-in-filename hack doesn't survive distribution).

Partitioning: ``num`` maps to the stage's partition count and
``hash``/``range`` to HashPartitioning / RangePartitioning
(fileserver.py:682-732). Spark recognizes the explicit repartition as
satisfying the groupBy's clustering requirement, so the juice stage
adds no second exchange.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Schema of the maple (map) output — the reference's string KV model.
KV_SCHEMA = "key string, value string"


def maple(
    df: DataFrame,
    fn: Callable[[pd.DataFrame], Iterator[tuple[str, str]]],
    num_maples: int | None = None,
) -> DataFrame:
    """Map phase: apply `fn` to each input shard, emitting (key, value)
    string pairs — the reference's maple exe contract
    (data/maple-exe.go:102-142) with the emit-to-file replaced by rows.

    `fn` receives a pandas DataFrame (one Arrow batch of the shard) and
    yields (key, value) tuples. Runs as ``mapInPandas`` so batches
    stream through Python with Arrow transfer, never row-at-a-time.
    """
    if num_maples is not None:
        df = df.repartition(num_maples)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pairs = list(fn(pdf))
            if pairs:
                yield pd.DataFrame(pairs, columns=["key", "value"])

    return df.mapInPandas(run, schema=KV_SCHEMA)


def juice(
    kv: DataFrame,
    fn: Callable[[str, pd.DataFrame], pd.DataFrame],
    num_juices: int | None = None,
    partition: str = "hash",
    output_schema: str = KV_SCHEMA,
) -> DataFrame:
    """Reduce phase: apply `fn` to each key group — the juice exe
    contract (one invocation per key, data/juice-exe.go:12-43) as a
    grouped-map Pandas UDF.

    `partition` ∈ {hash, range} mirrors the user-visible juice argument
    (README.md:45; fileserver.py:507-512). The explicit repartition
    already clusters by key, so the groupBy adds no extra shuffle.
    """
    if partition not in ("hash", "range"):
        raise ValueError(f"partition must be 'hash' or 'range', got {partition!r}")
    if num_juices is not None:
        if partition == "hash":
            kv = kv.repartition(num_juices, F.col("key"))
        else:
            kv = kv.repartitionByRange(num_juices, F.col("key"))

    def run(key: tuple[Any, ...], pdf: pd.DataFrame) -> pd.DataFrame:
        return fn(key[0], pdf)

    return kv.groupBy("key").applyInPandas(run, schema=output_schema)


def maple_exe(df: DataFrame, command: str, num_maples: int | None = None) -> DataFrame:
    """Executable-runner shim: pipe shard lines through an external
    command that prints ``key\\tvalue`` lines (rdd.pipe — the faithful
    primitive for the reference's scp'd-exe surface,
    fileserver.py:364-379). Input rows are serialized one line per row
    (single-column DataFrames pass the raw value)."""
    if num_maples is not None:
        df = df.repartition(num_maples)
    if len(df.columns) == 1:
        lines = df.rdd.map(lambda r: str(r[0]))
    else:
        lines = df.rdd.map(lambda r: ",".join("" if v is None else str(v) for v in r))
    kv = lines.pipe(command).map(lambda line: line.split("\t", 1)).filter(lambda p: len(p) == 2)
    return df.sparkSession.createDataFrame(kv, schema=KV_SCHEMA)


def juice_exe(
    kv: DataFrame,
    command: str,
    num_juices: int | None = None,
    partition: str = "hash",
) -> DataFrame:
    """Executable-runner reduce shim: co-locate each key's rows, then
    pipe ``key\\tvalue`` lines of the reducer's keys through the
    command, which prints ``key\\tvalue`` result lines (the per-reducer
    exe invocation, fileserver.py:557-571)."""
    n = num_juices or kv.sparkSession.conf.get("spark.sql.shuffle.partitions")
    if partition == "hash":
        kv = kv.repartition(int(n), F.col("key"))
    elif partition == "range":
        kv = kv.repartitionByRange(int(n), F.col("key"))
    else:
        raise ValueError(f"partition must be 'hash' or 'range', got {partition!r}")
    lines = kv.rdd.map(lambda r: f"{r['key']}\t{r['value']}")
    out = lines.pipe(command).map(lambda line: line.split("\t", 1)).filter(lambda p: len(p) == 2)
    return kv.sparkSession.createDataFrame(out, schema=KV_SCHEMA)


def select_where(df: DataFrame, regex: str, columns: list[str] | None = None) -> DataFrame:
    """The `SELECT ALL FROM <ds> WHERE <regex>` entry point
    (fileserver.py:1372-1382): whole-line regex over the row rendered as
    a comma-joined line (data/sql-juice.go:42-60). Unlike the reference
    — which shuffles first and filters in the juice phase (§4.1) — the
    predicate here is declarative, so Catalyst runs it at the scan."""
    cols = columns or df.columns
    line = F.concat_ws(",", *[F.col(c).cast("string") for c in cols])
    return df.withColumn("_line", line).filter(F.col("_line").rlike(regex)).drop("_line")
