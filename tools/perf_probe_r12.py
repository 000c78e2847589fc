"""Round-12 drift probe (VERDICT r11 "What's wrong" #2): three bench
rows drifted UP between the r10 and r11 artifacts with their code (and
every module they import) untouched — `dsir_importance_weights`
1.134→1.412 s (+25%), `events_markov_stationary` 0.810→0.976 s (+20%),
`decontam_ngram_overlap` 0.620→0.731 s (+18%) — while the 69-query
TOTAL went DOWN 46.21→43.49 s. Three more rows show the same smaller
signature (retrieval_hard_negatives +13%, semdedup_keep_verdicts +12%,
embedding_pca_power_probe +14%).

Probe design (PERF_PROBE_r11.json discipline: decomposition first,
interleaved A/B, artifact committed either way):

A. ISOLATION — each drifted row + two near-flat controls
   (`bm25_top_docs` −8%, `graph_triangle_counts` −8%), interleaved
   round-robin min-of-N in a fresh bench-config session. If the
   isolated minima sit at the r10 level while controls hold, the
   queries themselves did not get slower — the r11 deltas were
   measurement context, not plan regressions.

B. BENCH-CONTEXT — the full HEADLINE sequence exactly as bench.py
   runs it (same order, same clearCache boundary, 1 trial), recording
   the drifted rows' in-sequence times. If in-sequence reproduces the
   r11-level numbers while isolation reproduces r10-level, the drift
   lives in cross-query session state (JVM/GC/code-cache pressure from
   the 66 preceding queries), not in the drifted plans.

C. STAGE DECOMPOSITION of `dsir_importance_weights` (largest drift):
   the exploded-gram aggregate (`_ex_df`+`_bt_df`), the model join,
   and the full query — bounded above by A's isolation number; any
   stage-level anomaly shows here.

Usage: python tools/perf_probe_r12.py [sf_dir] [trials]
Output: PERF_PROBE_r12.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DRIFTED = [
    "dsir_importance_weights",
    "events_markov_stationary",
    "decontam_ngram_overlap",
]
CONTROLS = ["bm25_top_docs", "graph_triangle_counts"]

#: The committed artifact values this probe adjudicates between.
R10 = {
    "dsir_importance_weights": 1.134,
    "events_markov_stationary": 0.810,
    "decontam_ngram_overlap": 0.620,
    "bm25_top_docs": 0.986,
    "graph_triangle_counts": 1.033,
}
R11 = {
    "dsir_importance_weights": 1.412,
    "events_markov_stationary": 0.976,
    "decontam_ngram_overlap": 0.731,
    "bm25_top_docs": 0.911,
    "graph_triangle_counts": 0.955,
}


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(spark, build) -> float:
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    _noop(build())
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    from distributed_mapreduce_spark.session import get_spark
    from distributed_mapreduce_spark.workload import QUERIES

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("perf_probe_r12", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    _noop(QUERIES["flagship_pct"](spark, sf_dir))  # warm-up, untimed

    out: dict = {"sf_dir": sf_dir, "trials": trials, "r10": R10, "r11": R11}

    # --- A: isolation, interleaved round-robin --------------------
    names = DRIFTED + CONTROLS
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(trials):
        for n in names:
            samples[n].append(_timed(spark, lambda n=n: QUERIES[n](spark, sf_dir)))
    out["isolation_min"] = {n: round(min(v), 3) for n, v in samples.items()}
    out["isolation_median"] = {
        n: round(sorted(v)[len(v) // 2], 3) for n, v in samples.items()
    }

    # --- B: full bench-order context (1 pass) ---------------------
    from bench import HEADLINE, MATERIALIZING

    ctx: dict[str, float] = {}
    for name in HEADLINE:
        spark.catalog.clearCache()
        if name in MATERIALIZING:
            t0 = time.perf_counter()
            df = QUERIES[name](spark, sf_dir)
        else:
            df = QUERIES[name](spark, sf_dir)
            t0 = time.perf_counter()
        _noop(df)
        ctx[name] = time.perf_counter() - t0
    out["bench_context"] = {n: round(ctx[n], 3) for n in names if n in ctx}
    out["bench_context_total"] = round(sum(ctx.values()), 3)

    # --- C: dsir stage decomposition ------------------------------
    from pyspark.sql import functions as F

    from distributed_mapreduce_spark.workload.importance import (
        _bt_df,
        _ex_df,
        _lam_df,
        _scored_df,
    )
    from distributed_mapreduce_spark.workload.registry import table

    docs = table(spark, sf_dir, "documents")
    stages = {
        "explode_grams": lambda: _ex_df(docs).agg(F.count(F.lit(1))),
        "bucket_model": lambda: _bt_df(_ex_df(docs)),
        "lambda_model": lambda: _lam_df(_bt_df(_ex_df(docs))),
        "full_scored": lambda: _scored_df(spark, sf_dir),
    }
    dec: dict[str, float] = {}
    for sname, build in stages.items():
        vals = [_timed(spark, build) for _ in range(3)]
        dec[sname] = round(min(vals), 3)
    out["dsir_stages_min3"] = dec

    out["loadavg_end"] = round(os.getloadavg()[0], 2)
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PERF_PROBE_r12.json",
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=2, sort_keys=True)
    print(json.dumps(out, indent=2, sort_keys=True))


if __name__ == "__main__":
    main()
