"""Round-11 regression probe + fix record (VERDICT r10 "What's wrong"
#3): the two unexplained sf0.1 bench regressions, `skew_join_salted`
(0.64→1.35 s) and `text_rake_keywords` (0.74→1.14 s), both
code-untouched in round 10.

Diagnosis (in-round, before any timing):

- skew_join_salted — the executed plan shows `AQEShuffleRead coalesced`
  on BOTH inputs of the salted sort-merge join: with the round-9
  global `initialPartitionNum` conf gone, AQE's byte-based coalescing
  (parallelismFirst target = max(total/parallelism, minPartitionSize
  1 MB)) merges the ~2 MB post-shuffle stream into ~2 partitions,
  collapsing the 16-way salt spread of the CPU-heavy probe (16 KB
  SHA-256 per joined row) back into ~2 tasks — structurally defeating
  the operator. Interleaved A/B measured the pin worth 1.67x.
  FIX (operators/skew.py): `salted_join` pins its salted exchange via
  an explicit user repartition on (key, salt) — exempt from AQE
  coalescing; width defaults to the session shuffle width, callers can
  pass input-scaled widths.

- text_rake_keywords — NOT the same mechanism: lowering
  minPartitionSize to 64 KB made it WORSE (2.33 vs 1.40 s), and
  pinning the doc_id exchange bought only 1.07x. Stage decomposition
  showed the cost spread across a triple re-execution of the
  explode+window chain (three document scans) plus a phrases⋈occ
  shuffle join. FIX (workload/quality.py): run length `plen` computed
  as a COUNT window over (doc_id, grp) on the SAME doc_id exchange,
  phrase string assembled in the same aggregate that sums word scores
  — one fewer shuffle join and one fewer subplan execution at any
  scale. Interleaved A/B: 1.59→1.28 s min, 1.71→1.33 s median.

This tool re-measures the COMMITTED (fixed) plans against faithful
reconstructions of the round-10 plans, so the artifact records the
effect on equal ambient. Output: PERF_PROBE_r11.json.

Usage: python tools/perf_probe_r11.py [sf_dir] [trials]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _interleaved(spark, build_a, build_b, trials: int) -> tuple[float, float]:
    """Alternate A/B per trial so ambient drift hits both variants
    equally; min-of-N with the bench.py cache-clear discipline."""
    a: list[float] = []
    b: list[float] = []
    for _ in range(trials):
        for build, acc in ((build_a, a), (build_b, b)):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            acc.append(time.perf_counter() - t0)
    return round(min(a), 3), round(min(b), 3)


def old_salted_join(spark, sf_dir: str):
    """The round-10 salted join: no pinned exchange (AQE coalesces the
    salt buckets)."""
    from distributed_mapreduce_spark.operators.skew import SALT_COL
    from distributed_mapreduce_spark.workload.skew_q import (
        SKEW_SALT,
        _skew_checksum,
        _skew_inputs,
    )

    big, small = _skew_inputs(spark, sf_dir)
    big_salted = big.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(SKEW_SALT)),
    )
    small_rep = small.hint("merge").withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(SKEW_SALT - 1)))
    ).withColumn(SALT_COL, F.col(SALT_COL).cast("long"))
    return _skew_checksum(
        big_salted.join(small_rep, ["k", SALT_COL], "inner").drop(SALT_COL)
    )


def old_rake(spark, sf_dir: str):
    """The round-10 rake plan: separate phrases aggregate joined back
    to occurrences (third subplan execution + extra shuffle join)."""
    from distributed_mapreduce_spark.workload.quality import (
        RAKE_SCALE,
        RAKE_TOP_K,
        STOPWORDS,
        _tokens,
    )
    from distributed_mapreduce_spark.workload.registry import table

    docs = table(spark, sf_dir, "documents")
    tk = docs.select(
        "doc_id", F.posexplode(_tokens(F.col("text"))).alias("pos", "tok")
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    nonstop = tk.filter(~F.col("tok").isin(*STOPWORDS)).withColumn(
        "grp", F.col("pos") - F.row_number().over(wd)
    )
    phrases = nonstop.groupBy("doc_id", "grp").agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s.getField("tok"),
            ),
        ).alias("phrase"),
        F.count(F.lit(1)).cast("long").alias("plen"),
    )
    occ = nonstop.select("doc_id", "grp", "tok").join(phrases, ["doc_id", "grp"])
    wordstats = occ.groupBy("tok").agg(
        F.expr(f"CAST(sum(plen) * {RAKE_SCALE} DIV count(*) AS BIGINT)").alias(
            "wscore"
        ),
    )
    pscore = (
        occ.join(wordstats.select("tok", "wscore"), "tok")
        .groupBy("doc_id", "grp", "phrase")
        .agg(F.sum("wscore").cast("long").alias("score_e3"))
    )
    return (
        pscore.groupBy("phrase")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.min("score_e3").alias("score_e3"),
        )
        .orderBy(F.desc("score_e3"), "phrase")
        .limit(RAKE_TOP_K)
    )


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from distributed_mapreduce_spark.session import get_spark
    from distributed_mapreduce_spark.workload import QUERIES

    spark = get_spark("perf_probe_r11", cpus=32, shuffle_partitions=32)
    QUERIES["flagship_pct"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out = {
        "sf_dir": sf_dir,
        "trials": trials,
        "loadavg_at_start": round(os.getloadavg()[0], 2),
        "method": "interleaved A/B per trial, min-of-N, cache cleared per trial",
    }
    for name, old in (
        ("skew_join_salted", old_salted_join),
        ("text_rake_keywords", old_rake),
    ):
        fixed_sec, old_sec = _interleaved(
            spark,
            lambda: QUERIES[name](spark, sf_dir),
            lambda: old(spark, sf_dir),
            trials,
        )
        ra = sorted(map(str, QUERIES[name](spark, sf_dir).collect()))
        rb = sorted(map(str, old(spark, sf_dir).collect()))
        out[name] = {
            "fixed_sec": fixed_sec,
            "round10_plan_sec": old_sec,
            "speedup": round(old_sec / fixed_sec, 2) if fixed_sec else None,
            "results_equal": ra == rb,
        }
    print(json.dumps(out))
    with open("/root/repo/PERF_PROBE_r11.json", "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
