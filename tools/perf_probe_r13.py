"""Round-13 probes (VERDICT r12 items #3 and #4).

#3 — `dedup_minhash_pairs` doubled on the driver (0.61 -> 1.19 s)
with ZERO code change on its path.  Probe design (PERF_PROBE
discipline: decomposition first, interleaved A/B, artifact committed
either way):

A. COLD ISOLATION — a fresh bench-config subprocess per trial that
   times ONLY dedup_minhash_pairs (clearCache + noop write, the exact
   bench boundary).  If the isolated cold number sits at the r11
   level, the query did not get slower — the r12 driver delta was
   bench-sequence context (the r12 probe already demonstrated the
   JIT/GC mechanism on dsir).
B. IN-SEQUENCE — the query timed after replaying the HEADLINE
   prefix that precedes it in bench order (same session, same
   clearCache boundary).  Reproducing the slow number here and not in
   A localizes the drift to cross-query session state.
C. STAGE DECOMPOSITION — shingle_table persist build / LSH candidate
   join / verify join, timed separately in-session.

#4 — the three persist-affected rows the driver regressed
(`ks_statistic_returnflag`, `text_packing` on
SPARK_GRAFT_PREFIXSUM_INPUT_PERSIST; `text_rake_keywords` on
SPARK_GRAFT_RAKE_PERSIST).  Paired COLD-JVM A/B at 32 AND 8 cores
(VERDICT: "if the cache write loses cold, make the persist
conditional or drop it"): one subprocess per (query, arm, rep),
arms interleaved A/B/A/B so box drift hits both equally.

Usage: python tools/perf_probe_r13.py [part]   # part in {minhash, persist, all}
Output: PERF_PROBE_r13.json (merged across invocations)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(HERE, "PERF_PROBE_r13.json")

# One cold subprocess = one timed sample.  The child prints a single
# float (seconds for the noop write of the named query).
_CHILD = r"""
import os, sys, time
sys.path.insert(0, {here!r})
from distributed_mapreduce_spark.session import get_spark
from distributed_mapreduce_spark.workload import QUERIES
spark = get_spark("probe_r13", cpus={cpus}, shuffle_partitions={cpus})
spark.sparkContext.setLogLevel("ERROR")
QUERIES["flagship_pct"](spark, {sf_dir!r}).write.format("noop").mode("overwrite").save()
for name in {prefix!r}:
    spark.catalog.clearCache()
    QUERIES[name](spark, {sf_dir!r}).write.format("noop").mode("overwrite").save()
best = float("inf")
for _ in range({trials}):
    spark.catalog.clearCache()
    df = QUERIES[{name!r}](spark, {sf_dir!r})
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    best = min(best, time.perf_counter() - t0)
print(f"RESULT {{best:.3f}}")
"""


def cold_sample(name, cpus, env_extra=None, prefix=(), trials=1):
    env = dict(os.environ)
    env.update(env_extra or {})
    code = _CHILD.format(
        here=HERE, cpus=cpus, sf_dir=SF_DIR, name=name,
        prefix=list(prefix), trials=trials,
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        env=env, timeout=900,
    )
    for line in r.stdout.splitlines():
        if line.startswith("RESULT "):
            return float(line.split()[1])
    raise RuntimeError(f"{name} cpus={cpus} env={env_extra}: {r.stderr[-1500:]}")


def probe_minhash(res):
    from bench import HEADLINE

    name = "dedup_minhash_pairs"
    pre = HEADLINE[: HEADLINE.index(name)]
    res["minhash"] = m = {}
    # A: cold isolation, 3 fresh JVMs, min-of-3 trials each (the exact
    # bench boundary: clearCache before each trial, min over trials —
    # trial 1 carries the row's JIT compilation, exactly as in bench)
    m["cold_isolated"] = [cold_sample(name, 32, trials=3) for _ in range(3)]
    # B: in-sequence — replay the full preceding HEADLINE prefix once,
    # then min-of-3 the row (one JVM; this is exactly bench position)
    m["cold_in_sequence"] = [
        cold_sample(name, 32, prefix=pre, trials=3) for _ in range(2)
    ]
    # C: stage decomposition, in-session warm (min-of-3 per stage)
    import time as _t

    from distributed_mapreduce_spark.session import get_spark
    from distributed_mapreduce_spark.workload.dedup import (
        _verify_pairs,
        minhash_candidate_pairs,
        shingle_table,
    )
    from distributed_mapreduce_spark.workload.registry import table

    spark = get_spark("probe_r13_stages", cpus=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    def best_of(f, n=3):
        b = float("inf")
        for _ in range(n):
            spark.catalog.clearCache()
            t0 = _t.perf_counter()
            f()
            b = min(b, _t.perf_counter() - t0)
        return round(b, 3)

    docs = table(spark, SF_DIR, "documents")
    m["stage_shingle_build"] = best_of(
        lambda: shingle_table(docs).write.format("noop").mode("overwrite").save()
    )
    m["stage_candidates"] = best_of(
        lambda: minhash_candidate_pairs(shingle_table(docs))
        .write.format("noop").mode("overwrite").save()
    )
    m["stage_full_verify"] = best_of(
        lambda: _verify_pairs(
            shingle_table(docs), minhash_candidate_pairs(shingle_table(docs))
        ).write.format("noop").mode("overwrite").save()
    )
    spark.stop()


def probe_persist(res):
    cases = [
        ("ks_statistic_returnflag", "SPARK_GRAFT_PREFIXSUM_INPUT_PERSIST"),
        ("text_packing", "SPARK_GRAFT_PREFIXSUM_INPUT_PERSIST"),
        ("text_rake_keywords", "SPARK_GRAFT_RAKE_PERSIST"),
    ]
    res["persist_ab"] = out = {}
    for cpus in (32, 8):
        for name, var in cases:
            key = f"{name}@{cpus}"
            out[key] = {"on": [], "off": [], "env": var}
            for _rep in range(3):  # interleaved A/B/A/B...
                out[key]["on"].append(cold_sample(name, cpus, {var: "1"}, trials=3))
                out[key]["off"].append(cold_sample(name, cpus, {var: "0"}, trials=3))
    for key, v in out.items():
        v["min_on"], v["min_off"] = min(v["on"]), min(v["off"])
        v["verdict"] = "persist_wins" if v["min_on"] <= v["min_off"] else "persist_loses"


def main():
    part = sys.argv[1] if len(sys.argv) > 1 else "all"
    res = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            res = json.load(f)
    res["sf_dir"] = SF_DIR
    if part in ("minhash", "all"):
        probe_minhash(res)
    if part in ("persist", "all"):
        probe_persist(res)
    with open(OUT, "w") as f:
        json.dump(res, f, indent=1)
        f.write("\n")
    print(json.dumps({k: v for k, v in res.items() if k != "persist_ab"}, indent=1)[:2000])
    if "persist_ab" in res:
        for k, v in res["persist_ab"].items():
            print(k, "on:", v["on"], "off:", v["off"], "->", v["verdict"])


if __name__ == "__main__":
    main()
