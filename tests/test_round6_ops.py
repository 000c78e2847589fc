"""Round-6 operator semantics: positional phrase retrieval, ANN range
search, model quality gate interplay (oracle equality is covered by
tools/check_correctness.py; these pin the semantic invariants)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_mapreduce_spark.workload import QUERIES
from distributed_mapreduce_spark.workload.registry import table


def test_phrase_match_occurrences_verified_against_text(spark, sf_dir):
    """Every reported match must be a real adjacent-token occurrence:
    re-verify n_matches for each doc by counting the phrase in the
    doc's own token stream driver-side."""
    rows = QUERIES["retrieval_phrase_match"](spark, sf_dir).collect()
    assert rows, "most frequent trigram must match somewhere"
    phrases = {r.phrase for r in rows}
    assert len(phrases) == 1
    w = next(iter(phrases)).split(" ")
    assert len(w) == 3
    docs = {
        r.doc_id: r.text
        for r in table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isin([r.doc_id for r in rows]))
        .collect()
    }
    for r in rows:
        toks = [t for t in docs[r.doc_id].split(" ") if t]
        occ = [
            i
            for i in range(len(toks) - 2)
            if toks[i : i + 3] == w
        ]
        assert len(occ) == r.n_matches
        assert occ[0] == r.first_pos


def test_range_search_is_exactly_the_thresholded_bruteforce(spark, sf_dir):
    """Range search must agree with the brute-force scorer: every pair
    at/above the radius appears, none below, no self-pairs."""
    from distributed_mapreduce_spark.workload.similarity import (
        N_QUERIES,
        RANGE_COS_U,
    )

    df = QUERIES["ann_range_search"](spark, sf_dir)
    assert df.filter(f"cos_u < {RANGE_COS_U}").count() == 0
    assert df.filter("query_id = neighbor_id").count() == 0
    assert df.filter(f"query_id >= {N_QUERIES}").count() == 0
    # completeness: per-query row counts match an independent Spark
    # formulation (cross join + having)
    from distributed_mapreduce_spark.workload.similarity import cosine_u

    emb = table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    expect = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select("qid", cosine_u(F.col("qv"), F.col("embedding")).alias("c"))
        .filter(F.col("c") >= RANGE_COS_U)
        .groupBy("qid")
        .count()
        .collect()
    )
    got = {r.query_id: r["count"] for r in df.groupBy("query_id").count().collect()}
    assert {r.qid: r["count"] for r in expect} == got
