"""Round-11 regression probe (VERDICT r10 "What's wrong" #3): the two
unexplained sf0.1 bench regressions, `skew_join_salted` (0.64→1.35 s)
and `text_rake_keywords` (0.74→1.14 s), both code-untouched in round
10.

Mechanism (confirmed by the executed AQE plan before any timing):
`AQEShuffleRead coalesced` appears on BOTH inputs of the salted
sort-merge join and on the rake token stream's doc_id exchanges. With
the round-9 global `initialPartitionNum=1024` conf removed, AQE's
byte-based coalescing (parallelismFirst target = max(total/parallelism,
minPartitionSize=1 MB)) merges the ~2 MB post-shuffle stream into ~2
partitions — so the salted join's 16-way CPU spread (16 KB SHA-256 per
joined row) and the rake window/phrase aggregation collapse to ~2
tasks. Bytes are a bad width metric for CPU-expanding exchanges; the
round-10 lesson ("width belongs to the exchange") extends to a FLOOR:
a CPU-expanding exchange must also never shrink below the session's
core width just because its bytes are small.

Probe: time variant A (registry plan as committed) vs variant B (the
same plan with the CPU-expanding exchange pinned via an explicit
user repartition — REPARTITION_BY_NUM is exempt from AQE coalescing)
at sf0.1, min-of-N with cache clearing (bench.py methodology). Output:
one JSON line per query; committed as PERF_PROBE_r11.json.

Usage: python tools/perf_probe_r11.py [sf_dir] [trials]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def _time(spark, build, trials: int) -> float:
    best = float("inf")
    for _ in range(trials):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def salted_variant_pinned(spark, sf_dir: str):
    """skew_join_salted with the salted exchange pinned at the session
    width (variant B)."""
    from distributed_mapreduce_spark.operators.skew import SALT_COL
    from distributed_mapreduce_spark.workload.skew_q import (
        SKEW_SALT,
        _skew_checksum,
        _skew_inputs,
    )

    big, small = _skew_inputs(spark, sf_dir)
    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    big_salted = big.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(SKEW_SALT)),
    ).repartition(parts, "k", SALT_COL)
    small_rep = small.hint("merge").withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(SKEW_SALT - 1)))
    ).withColumn(SALT_COL, F.col(SALT_COL).cast("long"))
    joined = big_salted.join(small_rep, ["k", SALT_COL], "inner").drop(SALT_COL)
    return _skew_checksum(joined)


def rake_variant_pinned(spark, sf_dir: str):
    """text_rake_keywords with the token stream's doc_id exchange
    pinned at the session width (variant B)."""
    from pyspark.sql import Window

    from distributed_mapreduce_spark.workload.quality import (
        RAKE_SCALE,
        RAKE_TOP_K,
        STOPWORDS,
        _tokens,
    )
    from distributed_mapreduce_spark.workload.registry import table

    parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    docs = table(spark, sf_dir, "documents")
    tk = docs.select(
        "doc_id", F.posexplode(_tokens(F.col("text"))).alias("pos", "tok")
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    nonstop = (
        tk.filter(~F.col("tok").isin(*STOPWORDS))
        .repartition(parts, "doc_id")
        .withColumn("grp", F.col("pos") - F.row_number().over(wd))
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
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from distributed_mapreduce_spark.session import get_spark
    from distributed_mapreduce_spark.workload import QUERIES

    spark = get_spark("perf_probe_r11", cpus=32, shuffle_partitions=32)
    # warm the JVM/IO path once, untimed
    QUERIES["flagship_pct"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out = {"sf_dir": sf_dir, "trials": trials, "loadavg": os.getloadavg()[0]}
    for name, pinned in (
        ("skew_join_salted", salted_variant_pinned),
        ("text_rake_keywords", rake_variant_pinned),
    ):
        a = _time(spark, lambda: QUERIES[name](spark, sf_dir), trials)
        b = _time(spark, lambda: pinned(spark, sf_dir), trials)
        out[name] = {
            "committed_sec": a,
            "pinned_width_sec": b,
            "speedup": round(a / b, 2) if b else None,
        }
        # sanity: identical results (salting/pinning must never change
        # values) — compare sorted collected rows
        ra = sorted(map(str, QUERIES[name](spark, sf_dir).collect()))
        rb = sorted(map(str, pinned(spark, sf_dir).collect()))
        out[name]["results_equal"] = ra == rb
    print(json.dumps(out))
    with open("/root/repo/PERF_PROBE_r11.json", "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
