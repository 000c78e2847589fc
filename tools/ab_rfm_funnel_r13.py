"""Round-13 paired A/Bs for the two VERDICT-mandated variant
measurements (#9 orders_rfm_segments three-narrow-projection quartiles,
#10 events_funnel single-scan window shape).

Each sample is a COLD subprocess running the exact bench boundary
(warmup query, then min-of-3 noop-write trials with clearCache between
trials); arms are interleaved A/B/A/B so box drift hits both equally.

Usage: python tools/ab_rfm_funnel_r13.py
Output: AB_RFM_FUNNEL_r13.json
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "tools"))

from perf_probe_r13 import cold_sample  # noqa: E402

CASES = [
    ("orders_rfm_segments", "SPARK_GRAFT_RFM_PARALLEL"),
    ("events_funnel", "SPARK_GRAFT_FUNNEL_WINDOW"),
]


def main():
    out = {}
    for cpus in (32, 8):
        for name, var in CASES:
            key = f"{name}@{cpus}"
            out[key] = {"committed": [], "variant": [], "env": var}
            for _rep in range(3):
                out[key]["committed"].append(
                    cold_sample(name, cpus, {var: "0"}, trials=3)
                )
                out[key]["variant"].append(
                    cold_sample(name, cpus, {var: "1"}, trials=3)
                )
            v = out[key]
            v["min_committed"] = min(v["committed"])
            v["min_variant"] = min(v["variant"])
            v["verdict"] = (
                "variant_wins"
                if v["min_variant"] < v["min_committed"]
                else "committed_wins"
            )
            print(key, v["committed"], "vs", v["variant"], "->", v["verdict"])
    with open(os.path.join(HERE, "AB_RFM_FUNNEL_r13.json"), "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")


if __name__ == "__main__":
    main()
