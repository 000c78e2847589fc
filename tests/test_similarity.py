"""ANN quality invariants: the probe hierarchy must pay off — a
superset candidate set can only improve top-k quality (scores are
deterministic, so this is an exact invariant, not a statistical one).
"""

from __future__ import annotations

from distributed_mapreduce_spark.workload import QUERIES


def _topk(spark, sf_dir, name):
    rows = QUERIES[name](spark, sf_dir).collect()
    out: dict[int, list] = {}
    for r in rows:
        out.setdefault(r["query_id"], []).append((r["rnk"], r["neighbor_id"], r["cos_u"]))
    return {q: sorted(v) for q, v in out.items()}


def test_multiprobe_dominates_single_probe(spark, sf_dir):
    single = _topk(spark, sf_dir, "ann_lsh")
    multi = _topk(spark, sf_dir, "ann_lsh_multiprobe")
    brute = _topk(spark, sf_dir, "ann_bruteforce")
    assert set(single) == set(multi) == set(brute)
    for q in brute:
        s_score = sum(c for _, _, c in single.get(q, []))
        m_score = sum(c for _, _, c in multi.get(q, []))
        b_score = sum(c for _, _, c in brute[q])
        # Superset candidates → top-k total score can only improve, and
        # brute force is the ceiling.
        assert s_score <= m_score <= b_score

    # Recall@k vs brute force: multiprobe must be at least as good.
    def recall(approx):
        hits = total = 0
        for q in brute:
            exact = {n for _, n, _ in brute[q]}
            got = {n for _, n, _ in approx.get(q, [])}
            hits += len(exact & got)
            total += len(exact)
        return hits / total

    assert recall(multi) >= recall(single)
