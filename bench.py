"""Benchmark runner (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is materialized with a `noop` write (full execution, no
driver-side row transfer) so the measurement is engine time, not
collect() serialization.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: Headline queries: the flagship parity pipeline plus one representative
#: per workload family (agg, join, window, text, dedup, ANN, events).
HEADLINE = [
    "flagship_pct",
    "agg_q1",
    "group_count",
    "wordcount",
    "join_multiway",
    "tpch_q3_shipping",
    "tpch_q5_region_volume",
    "topk",
    "window_running",
    "select_regex",
    "tpch_q18_large_orders",
    "dedup_minhash_pairs",
    "dedup_simhash",
    "ann_ivf",
    "ann_lsh",
    "events_tumbling",
    "events_sessionize",
    # round-2 additions (no round-1 baseline): layout, rollup, sampling,
    # sketches, scrub, integrity
    "zorder_assign",
    "events_multi_rollup",
    "events_stratified_sample",
    "approx_distinct_counts",
    "text_scrub_pii",
    "table_checksum",
    # round-2 second wave: corpus quality/vocab, graph, clustering,
    # journey, sketches
    "quality_repetition",
    "vocab_build",
    "graph_triangle_counts",
    "kmeans_assign",
    "events_funnel",
    "bloom_probe_stats",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1])
    except ValueError:
        sf = -1.0

    from distributed_mapreduce_spark.session import get_spark
    from distributed_mapreduce_spark.workload import QUERIES

    spark = get_spark("bench", cpus=cpus, shuffle_partitions=cpus)

    # Warm up the JVM/IO path once (not timed): tiny scan + shuffle.
    QUERIES["flagship_pct"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    times: dict[str, float] = {}
    for name in HEADLINE:
        df = QUERIES[name](spark, sf_dir)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
