"""As-of and range joins — operators Spark lacks natively, composed
from built-ins so they scale (SURVEY.md build plan: custom operators as
compositions first, Pandas UDFs only if semantics demand).

`asof_join` uses the union+window plan instead of a nested-loop or
per-key pandas merge: tag both sides, union, and for every left row
take the last right timestamp at-or-before it via a running
last_value(ignorenulls) window. One shuffle on the join key, sorted
once per partition — O(n log n) per key group, no O(n·m) probing, and
no whole-group materialization in Python.

`range_join_binned` turns an interval predicate into an equi-join on
time buckets (join each left bucket to right buckets b-1..b), then
re-applies the exact predicate. Catalyst gets a hash-joinable key, so
100 TB of events never meets a BroadcastNestedLoopJoin.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    suffix: str = "_asof",
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For each left row, attach the nearest right row within the same
    `on` key: the greatest `right_ts` <= `left_ts` (backward, default)
    or the smallest `right_ts` >= `left_ts` (forward). NULLs when no
    such right row exists — the pandas `merge_asof` surface, as one
    shuffle + one window.

    Tie rule: a right row at exactly left_ts matches (inclusive), which
    the union encodes by sorting right rows before left rows at equal
    timestamps (in the direction of travel). When several RIGHT rows
    share (key, right_ts), the window order breaks the tie by the
    attached value columns (last in column order wins) so the result is
    deterministic; rows identical in every attached column tie
    harmlessly.

    `tolerance_seconds` nulls out matches farther than the tolerance
    (applied after the window, like pandas) — matches stay positional,
    only the attachment is dropped.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    value_cols = value_cols or [c for c in right.columns if c not in (on, right_ts)]

    l_tagged = left.select(
        F.col(on),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left.columns if c != on],
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"{c}{suffix}") for c in value_cols],
        F.lit(None).cast(dict(right.dtypes)[right_ts]).alias(f"{right_ts}{suffix}"),
    )
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in left.columns if c != on],
        *[F.col(c).alias(f"{c}{suffix}") for c in value_cols],
        F.col(right_ts).alias(f"{right_ts}{suffix}"),
    )
    unioned = l_tagged.unionByName(r_tagged)

    ts_order = F.col("_ts") if direction == "backward" else F.col("_ts").desc()
    # Deterministic tiebreak among right rows at the same (key, ts):
    # order by the attached values themselves (ADVICE r01 — without
    # this, which right row "wins" a timestamp tie is partition-order
    # dependent).
    tiebreak = [F.col(f"{c}{suffix}") for c in value_cols]
    w = (
        Window.partitionBy(on)
        .orderBy(ts_order, F.col("_side"), *tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        "*",
        *[
            F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(w).alias(f"_f_{c}")
            for c in [*value_cols, right_ts]
        ],
    )
    out_cols = [on] + [c for c in left.columns if c != on]
    matched_ts = F.col(f"_f_{right_ts}")
    if tolerance_seconds is not None:
        delta = F.abs(F.unix_micros(F.col("_ts")) - F.unix_micros(matched_ts))
        in_tol = delta <= F.lit(tolerance_seconds * 1_000_000)
        attach = [
            F.when(in_tol, F.col(f"_f_{c}")).alias(f"{c}{suffix}")
            for c in [*value_cols, right_ts]
        ]
    else:
        attach = [F.col(f"_f_{c}").alias(f"{c}{suffix}") for c in [*value_cols, right_ts]]
    return filled.filter(F.col("_side") == 1).select(*out_cols, *attach)


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower: Column | int,
    upper: Column | int,
    bin_seconds: int,
) -> DataFrame:
    """Equi-join `on` key with `lower <= left_ts - right_ts <= upper`
    (seconds), executed as a bucket equi-join + exact filter.

    Each right row is replicated into every bucket offset a matching
    left row could fall in — `floor(lower/bin) .. floor(upper/bin)+1`,
    derived from the interval, so the join is complete for ANY lower <=
    upper (negative bounds included), with (upper-lower)/bin_seconds + 2
    probes per row. Work stays O(matches + rows·probes), never a cross
    product; pick `bin_seconds` ≈ the window width so probes ≈ 2.
    """
    lower, upper = int(lower), int(upper)
    if lower > upper:
        raise ValueError(f"lower ({lower}) must be <= upper ({upper})")
    lsec = F.unix_micros(F.col(left_ts))
    rsec = F.unix_micros(F.col(right_ts))
    lb = (lsec / F.lit(bin_seconds * 1_000_000)).cast("long")
    rb = (rsec / F.lit(bin_seconds * 1_000_000)).cast("long")

    l2 = left.withColumn("_lb", lb)
    r2 = right.withColumn("_rb", rb)
    # All bucket offsets a match can span: floor bounds of the interval
    # ends plus the boundary-crossing successor.
    offsets = range(lower // bin_seconds, upper // bin_seconds + 2)
    r_dup = r2.withColumn(
        "_probe", F.explode(F.array(*[F.col("_rb") + F.lit(o) for o in offsets]))
    )
    joined = l2.join(
        r_dup,
        [l2[on] == r_dup[on], l2["_lb"] == r_dup["_probe"]],
        "inner",
    )
    delta_us = F.unix_micros(l2[left_ts]) - F.unix_micros(r_dup[right_ts])
    lo_us = F.lit(int(lower) * 1_000_000)
    hi_us = F.lit(int(upper) * 1_000_000)
    return (
        joined.filter((delta_us >= lo_us) & (delta_us <= hi_us))
        .drop("_lb", "_rb", "_probe")
        .drop(r_dup[on])
    )
