"""Skew mitigation: salted aggregation and salted join.

First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
on by default in our session factory) which splits oversized shuffle
partitions at runtime. Salting is the manual fallback for pathological
keys — a handful of keys holding a double-digit percentage of 100 TB —
where even a split partition is one key's worth of data.

Both operators preserve exact semantics: salting only changes the
*physical* key-space; a second phase (re-aggregation / small-side
replication) removes the salt before results surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salted_group_count(df: DataFrame, key_col: str, salt: int = 16) -> DataFrame:
    """Count per key via two-phase aggregation over (key, salt).

    Phase 1 shuffles on (key, salt) — a hot key spreads over `salt`
    reducers; phase 2 re-aggregates the tiny per-salt partials on key.
    Works for any algebraic aggregate (count/sum/min/max); shown for
    count. The salt derives from a hash of the whole row, so placement
    is deterministic for a given input.
    """
    salted = df.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt))
    )
    partial = salted.groupBy(key_col, SALT_COL).agg(F.count(F.lit(1)).alias("_c"))
    return partial.groupBy(key_col).agg(F.sum("_c").alias("cnt"))


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    parts: int | None = None,
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side, replicate the small
    side `salt`×, join on (key, salt), drop the salt.

    Use when the small side is too large to broadcast but the big
    side's key distribution is pathological: each hot key's rows spread
    across `salt` tasks instead of serializing through one. Replication
    multiplies the small side's shuffle volume by `salt` — pick the
    smallest salt that flattens the skew.

    The salted exchange is PINNED via an explicit user repartition on
    (key, salt): the operator's whole contract is task-level
    parallelism, and AQE's byte-based partition coalescing would
    otherwise merge the salt buckets right back into one task whenever
    the hot key is CPU-heavy but byte-light (measured in round 11:
    `AQEShuffleRead coalesced` collapsed the 16-way spread to ~2 tasks
    at sf0.1 and cost 1.67x wall-clock, PERF_PROBE_r11.json; AQE sizes
    partitions by BYTES, not downstream CPU — the same blind spot that
    keeps its skew-join split from firing here). A user-specified
    repartition width is exempt from coalescing. `parts` defaults to
    the session's shuffle width; pass an input-scaled width for
    compute-expanding joins at large SF.
    """
    if parts is None:
        parts = int(
            big.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    big_salted = big.withColumn(
        SALT_COL, F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    ).repartition(parts, on, SALT_COL)
    small_rep = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn(SALT_COL, F.col(SALT_COL).cast("long"))
    return big_salted.join(small_rep, [on, SALT_COL], "inner").drop(SALT_COL)
