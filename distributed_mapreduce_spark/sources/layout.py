"""Z-order (Morton) data layout — multi-column range pruning for the
warehouse.

Bucketing (bucketing.py) solves repeated equi-joins; it does nothing
for range predicates over several columns. Sorting a table by column A
clusters A-ranges but scatters B; a filter on B then touches every
file. Interleaving the bits of (A, B) into one Morton code and
range-partitioning + sorting by that code clusters BOTH dimensions:
a box predicate (a_lo..a_hi AND b_lo..b_hi) lands in O(perimeter)
files instead of O(all), and parquet min/max row-group stats skip the
rest. This is the layout trick behind Delta/Iceberg `OPTIMIZE ZORDER
BY` — here as a plain parquet writer.

The code path is pure integer arithmetic (quantize → interleave), so
z-values are engine-portable and differentially checkable in DuckDB
(`zorder_assign` query).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantize(col: Column, lo: int, hi: int, bits: int) -> Column:
    """Map an integer-valued column from [lo, hi] onto [0, 2^bits),
    clamped: `floor((x - lo) * 2^bits / (hi - lo + 1))`. The floor of
    the double quotient equals exact integer division for these
    magnitudes (numerator < 2^53 and |true quotient - nearest int| >>
    double ulp), so it matches DuckDB's `//` bit-for-bit."""
    n = 1 << bits
    span = hi - lo + 1
    q = ((col.cast("long") - F.lit(lo)) * F.lit(n)).cast("long") / F.lit(span)
    q = F.floor(q).cast("long")
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), q))


def _sql_quantize(c: str, lo: int, hi: int, bits: int) -> str:
    n = 1 << bits
    span = hi - lo + 1
    return f"greatest(0, least({n - 1}, (({c} - {lo}) * {n}) // {span}))"


def morton2(qa: Column, qb: Column, bits: int) -> Column:
    """Interleave the low `bits` bits of two quantized columns into one
    Morton code (a in even positions, b in odd). Pure JVM bit ops."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z + F.shiftleft(F.shiftright(qa.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
        z = z + F.shiftleft(F.shiftright(qb.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
    return z.cast("long")


def _sql_morton2(a: str, b: str, bits: int) -> str:
    parts = []
    for i in range(bits):
        parts.append(f"((({a} >> {i}) & 1) << {2 * i})")
        parts.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"


def write_zordered(
    df: DataFrame,
    path: str,
    z: Column,
    num_files: int,
) -> None:
    """Lay `df` out as `num_files` parquet files clustered by the given
    z-code: range-partition on z (sampled bounds — parallel, no global
    sort) and sort within each partition so every file covers a tight
    z-interval and its per-column min/max footer stats are tight too.
    One shuffle at write time buys every later multi-column range scan
    its pruning — the same pay-once economics as bucketing."""
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact_small_files(
    df: DataFrame,
    out_dir: str,
    target_rows_per_file: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> int:
    """Small-file compaction: rewrite a dataset into
    ceil(rows / target_rows_per_file) parquet files, optionally
    clustered on ``sort_cols`` so row-group min/max stats stay
    selective after the rewrite.

    The streaming landing path (foreachBatch per micro-batch) and
    over-parallel writers both produce file counts that grow without
    bound; listing and opening millions of tiny files then dominates
    scan time (the classic small-files problem). Compaction is the
    maintenance pass every table format schedules (Delta/Iceberg
    OPTIMIZE) — here as a plain parquet rewrite.

    Row count is one metadata-cheap aggregate; the rewrite is a single
    repartition (range repartition when clustering, so files hold
    contiguous key ranges). Returns the file count written.
    """
    import math

    n = df.count()
    files = max(1, math.ceil(n / max(1, target_rows_per_file)))
    if sort_cols:
        out = df.repartitionByRange(files, *[F.col(c) for c in sort_cols])
        out = out.sortWithinPartitions(*sort_cols)
    else:
        out = df.repartition(files)
    out.write.mode(mode).parquet(out_dir)
    return files
