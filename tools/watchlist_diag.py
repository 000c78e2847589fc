"""Watch-list slope diagnosis (VERDICT r07 #5, second half).

`dedup_exact_substring_runs` (x100 slope 0.975) and `text_ngram_novelty`
(0.954) are <= 1.0 but within noise of linear-degradation. Two rival
explanations:

1. ENGINE: the fixed 32-partition shuffles spill as the token stream
   grows — cured by input-scaled shuffle partitions (the round-5/6
   wedge cure). If true, re-running x100 with more partitions drops
   the time materially.
2. CORPUS GEOMETRY: the builder has only 26 Caesar rotations, so at
   x100 each rotation is shared by ~4 replicas and every window/gram
   is duplicated ACROSS replicas — the per-input-row workload truly
   grows (more duplicated positions per doc, bigger islands relation),
   which no partitioning fixes. If true, the duplicated-position
   density jumps between x10 (disjoint replicas) and x100, and extra
   partitions change little.

This tool measures both discriminants on the corpora the scaling
harness leaves behind in /tmp/spark_graft_scaling:
  - wall time of each query at x100 under 32 / 128 / 256 shuffle
    partitions (warm-up + min of 2);
  - the stage-density counters: window-hash rows (g), duplicated-
    position rows (dup) for runs; distinct (doc, gram) rows and
    novel-gram fraction for novelty — at x10 and x100.

Writes WATCHLIST_DIAG.json; the verdict belongs in SCALING_r08.json's
narrative.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

BASE = "/tmp/spark_graft_scaling"


def _runs_densities(spark, sf_dir: str) -> dict:
    """Row counts of the exact-substring pipeline's internal stages."""
    from pyspark.sql import functions as F

    from distributed_mapreduce_spark.workload.corpus import ES_K, _ngrams
    from distributed_mapreduce_spark.workload.dedup import _hash_u32, _tokens
    from distributed_mapreduce_spark.workload.registry import table

    docs = table(spark, sf_dir, "documents")
    g = (
        docs.select("doc_id", _tokens(F.col("text")).alias("__toks"))
        .select(
            "doc_id",
            F.posexplode(_ngrams(F.col("__toks"), ES_K)).alias("pos", "gram"),
        )
        .select("doc_id", "pos", _hash_u32(F.col("gram"), "es_").alias("gh"))
    ).persist()
    n_g = g.count()
    idx = (
        g.groupBy("gh").agg(F.count(F.lit(1)).alias("cnt")).filter("cnt > 1")
    )
    n_dup = g.join(idx.select("gh"), "gh").count()
    g.unpersist()
    return {
        "g_rows": n_g,
        "dup_rows": n_dup,
        "dup_density": round(n_dup / max(n_g, 1), 4),
    }


def _novelty_densities(spark, sf_dir: str) -> dict:
    from pyspark.sql import functions as F

    from distributed_mapreduce_spark.workload.quality import _ngrams
    from distributed_mapreduce_spark.workload.dedup import _tokens
    from distributed_mapreduce_spark.workload.registry import table

    docs = table(spark, sf_dir, "documents")
    g = (
        docs.select("doc_id", _tokens(F.col("text")).alias("__toks"))
        .select("doc_id", F.explode(_ngrams(F.col("__toks"), 3)).alias("gram"))
        .distinct()
    ).persist()
    n_pairs = g.count()
    n_grams = g.select("gram").distinct().count()
    g.unpersist()
    return {
        "doc_gram_rows": n_pairs,
        "distinct_grams": n_grams,
        "pairs_per_gram": round(n_pairs / max(n_grams, 1), 3),
    }


def _time_query(spark, name: str, sf_dir: str, trials: int = 2) -> float:
    from distributed_mapreduce_spark.workload import QUERIES

    QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    best = float("inf")
    for _ in range(trials):
        spark.catalog.clearCache()  # no cross-run cache riding
        t0 = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> int:
    out_json = (
        sys.argv[1] if len(sys.argv) > 1 else "/root/repo/WATCHLIST_DIAG.json"
    )
    for d in ("x10", "x100"):
        if not Path(f"{BASE}/{d}").exists():
            raise SystemExit(
                f"{BASE}/{d} missing — run tools/scaling_bench.py --x100 first"
            )

    from distributed_mapreduce_spark.session import get_spark

    spark = get_spark("watchlist_diag", cpus=32, shuffle_partitions=32)

    res: dict = {"densities": {}, "partition_sweep": {}}
    for d in ("x10", "x100"):
        res["densities"][d] = {
            "dedup_exact_substring_runs": _runs_densities(spark, f"{BASE}/{d}"),
            "text_ngram_novelty": _novelty_densities(spark, f"{BASE}/{d}"),
        }
        print(d, json.dumps(res["densities"][d]), flush=True)

    for parts in (32, 128, 256):
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        row = {}
        for q in ("dedup_exact_substring_runs", "text_ngram_novelty"):
            row[q] = _time_query(spark, q, f"{BASE}/x100")
        res["partition_sweep"][str(parts)] = row
        print(f"x100 @ {parts} partitions: {row}", flush=True)
    spark.conf.set("spark.sql.shuffle.partitions", "32")

    Path(out_json).write_text(json.dumps(res, indent=2) + "\n")
    print(f"wrote {out_json}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
