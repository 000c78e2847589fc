"""Phase E of the round-12 drift probe: is `dsir_importance_weights`'s
bench-context inflation reclaimable JVM/session state?

Design: fresh bench-config session → run the HEADLINE prefix up to
dsir once (the exact state bench.py has when it reaches the row) →
time dsir min-of-3 (CONTEXT number) → force a full collection (Python
gc + JVM System.gc + settle) → time dsir min-of-3 again (POST-GC).
If POST-GC drops to the warm floor phase D measured (~1.2-1.3 s, the
r10 level), the bench-context number is accumulated reclaimable state
(localCheckpoint blocks awaiting the async ContextCleaner, JIT/GC
pressure), not a plan regression.

Appends the result into PERF_PROBE_r12.json.
Usage: python tools/perf_probe_r12_gc.py [sf_dir]
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from bench import HEADLINE, wait_for_quiet

    from distributed_mapreduce_spark.session import get_spark
    from distributed_mapreduce_spark.workload import QUERIES

    spark = get_spark("perf_probe_r12_gc", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    noop(QUERIES["flagship_pct"](spark, sf_dir))
    load0 = round(wait_for_quiet(), 2)

    target = "dsir_importance_weights"
    for name in HEADLINE[: HEADLINE.index(target)]:
        spark.catalog.clearCache()
        noop(QUERIES[name](spark, sf_dir))

    def time3() -> list[float]:
        out = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            noop(QUERIES[target](spark, sf_dir))
            out.append(round(time.perf_counter() - t0, 3))
        return out

    in_context = time3()

    # Full reclaim: drop Python-side refs so the ContextCleaner can
    # collect checkpoint/broadcast blocks, then force both collectors.
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    time.sleep(5)
    gc.collect()
    spark.sparkContext._jvm.System.gc()
    time.sleep(5)
    post_gc = time3()

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PERF_PROBE_r12.json",
    )
    art = json.load(open(path))
    art["dsir_gc_experiment"] = {
        "loadavg_at_start": load0,
        "in_context_trials": in_context,
        "post_full_gc_trials": post_gc,
        "in_context_min": min(in_context),
        "post_full_gc_min": min(post_gc),
    }
    with open(path, "w") as f:
        json.dump(art, f, indent=2, sort_keys=True)
    print(json.dumps(art["dsir_gc_experiment"], indent=2))


if __name__ == "__main__":
    main()
