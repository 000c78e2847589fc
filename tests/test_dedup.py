"""Dedup operators on crafted near-duplicates (the harness documents
are mostly unique; these tests plant known duplicates)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_mapreduce_spark.workload.dedup import (
    minhash_candidate_pairs,
    ngram_jaccard_pairs,
    shingle_table,
    shingles,
    simhash_pairs,
    simhash_table,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm window sill in the afternoon sun"
)
NEAR = BASE.replace("afternoon sun", "evening light")  # small edit
FAR = "completely different content about spark query engines and shuffles everywhere"


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, NEAR), (3, FAR), (4, BASE)], ["doc_id", "text"]
    )


def test_shingles_width_and_dedup(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b"), (3, "x x x x")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: sorted(r["sh"])
        for r in df.select("doc_id", shingles(F.col("text")).alias("sh")).collect()
    }
    assert got[1] == ["a b c", "b c d"]
    assert got[2] == []  # fewer tokens than shingle width
    assert got[3] == ["x x x"]  # distinct shingles


def test_minhash_finds_near_and_exact_dups_not_far(spark, docs):
    sh_df = shingle_table(docs)
    try:
        pairs = {
            (r["doc_a"], r["doc_b"]) for r in minhash_candidate_pairs(sh_df).collect()
        }
    finally:
        sh_df.unpersist()
    assert (1, 4) in pairs  # exact dup always collides
    assert (1, 2) in pairs or (2, 4) in pairs  # near dup collides in some band
    assert not any(3 in p for p in pairs)  # unrelated doc never pairs


def test_ngram_jaccard_exact_candidates(spark, docs):
    sh_df = shingle_table(docs)
    try:
        pairs = {
            (r["doc_a"], r["doc_b"]) for r in ngram_jaccard_pairs(sh_df).collect()
        }
    finally:
        sh_df.unpersist()
    # Exact inverted index: every pair sharing a rare shingle, no misses.
    assert {(1, 2), (1, 4), (2, 4)} <= pairs
    assert not any(3 in p for p in pairs)


def test_ngram_jaccard_max_df_drops_stop_grams(spark):
    # Every doc shares the ubiquitous gram; cap df at 2 → no candidates.
    df = spark.createDataFrame(
        [(i, "common stop gram") for i in range(1, 5)], ["doc_id", "text"]
    )
    sh_df = shingle_table(df)
    try:
        assert ngram_jaccard_pairs(sh_df, max_df=2).count() == 0
        assert ngram_jaccard_pairs(sh_df, max_df=4).count() == 6
    finally:
        sh_df.unpersist()


def test_simhash_pairs_banding_finds_close_pairs(spark, docs):
    sim = simhash_table(docs)
    got = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in simhash_pairs(sim).collect()}
    assert got.get((1, 4)) == 0  # identical docs: distance 0
    # Pigeonhole guarantee: any pair within distance 3 shares a band, so
    # if (1,2) is within 3 it MUST be found; either way doc 3 never pairs.
    hashes = {r["doc_id"]: r["simhash"] for r in sim.collect()}
    d12 = bin(hashes[1] ^ hashes[2]).count("1")
    assert ((1, 2) in got) == (d12 <= 3)
    assert not any(3 in p for p in got)


def test_simhash_similar_docs_have_close_hashes(spark, docs):
    got = {r["doc_id"]: r["simhash"] for r in simhash_table(docs).collect()}

    def hamming(a: int, b: int) -> int:
        return bin(a ^ b).count("1")

    assert got[1] == got[4]  # identical docs, identical simhash
    assert hamming(got[1], got[2]) < hamming(got[1], got[3])  # near < far


def test_connected_components_chain_merges_transitively(spark):
    from distributed_mapreduce_spark.workload.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)],
        ["doc_a", "doc_b"],
    )
    got = {
        r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).collect()
    }
    # Chain 1-2-3-4 collapses to min label 1 even though (1,4) never pairs.
    assert {got[1], got[2], got[3], got[4]} == {1}
    assert got[10] == got[11] == 10
    assert got[20] == got[21] == 20


def test_prefix_filter_superset_of_capped_index(spark, sf_dir):
    """Prefix filtering is provably complete, so its verified pair set
    must contain every pair the df-capped inverted index finds (and
    every LSH-found pair — both alternatives can only miss)."""
    from distributed_mapreduce_spark.workload import QUERIES

    pf = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_prefix_filter_join"](spark, sf_dir).collect()
    }
    ngram = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_ngram_jaccard"](spark, sf_dir).collect()
    }
    mh = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_minhash_pairs"](spark, sf_dir).collect()
    }
    assert ngram <= pf
    assert mh <= pf
    assert len(pf) > 0


@pytest.mark.deepaudit  # ~19 s synthetic chain; operator-internal convergence property
def test_pointer_jump_cc_converges_logarithmically_on_chain(spark):
    """A 41-node path is the adversarial shape: plain min-label needs
    ~40 rounds to drag label 0 to the far end; pointer jumping halves
    chain length per round, so 10 rounds MUST suffice — if the doubling
    step were broken this asserts False, not just slow."""
    from distributed_mapreduce_spark.workload.dedup import (
        connected_components,
        connected_components_pointer_jump,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], ["doc_a", "doc_b"]
    )
    jump = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components_pointer_jump(pairs, max_iter=10).collect()
    }
    assert jump == {i: 0 for i in range(41)}
    # and the fixed point matches plain min-label given enough rounds
    plain = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs, max_iter=50).collect()
    }
    assert plain == jump


def test_pair_volume_cache_invalidates_on_data_regeneration(tmp_path):
    """The memoized pair-volume sizing must key on dataset CONTENT, not
    path (ADVICE r07): regenerating files in place under the same
    sf_dir changes the fingerprint, so a stale volume can never mis-size
    the shuffle. Driver-side only — no Spark session involved."""
    import os
    import time as _time

    from distributed_mapreduce_spark.workload.dedup import (
        _dataset_fingerprint,
        clear_pair_volume_cache,
    )

    d = tmp_path / "sfX"
    d.mkdir()
    f = d / "documents.parquet"
    f.write_bytes(b"v1")
    fp1 = _dataset_fingerprint(str(d))
    assert fp1 == _dataset_fingerprint(str(d))  # stable when untouched

    # same path, regenerated content -> different fingerprint (size or
    # mtime_ns moves; bump mtime explicitly so same-size rewrites on
    # coarse-mtime filesystems still register)
    f.write_bytes(b"v2-longer")
    fp2 = _dataset_fingerprint(str(d))
    assert fp2 != fp1
    st = os.stat(f)
    os.utime(f, ns=(st.st_atime_ns, st.st_mtime_ns + 1))
    assert _dataset_fingerprint(str(d)) != fp2

    # non-data files are ignored; the explicit hook exists and is a
    # no-op-safe clear
    (d / "_SUCCESS").write_bytes(b"")
    assert len(_dataset_fingerprint(str(d))) == 1
    clear_pair_volume_cache()


def test_dataset_fingerprint_nonlocal_paths_stay_distinct(tmp_path):
    """Paths that walk to zero data files (remote URIs, missing dirs)
    must NOT collapse to one memo key — the raw path is folded in so two
    different unwalkable datasets never share a cached pair volume
    (ADVICE r08)."""
    from distributed_mapreduce_spark.workload.dedup import _dataset_fingerprint

    fp_s3a = _dataset_fingerprint("s3a://bucket-a/corpus")
    fp_s3b = _dataset_fingerprint("s3a://bucket-b/corpus")
    fp_missing = _dataset_fingerprint(str(tmp_path / "does_not_exist"))
    assert fp_s3a != fp_s3b
    assert fp_s3a != fp_missing
    assert fp_s3a == _dataset_fingerprint("s3a://bucket-a/corpus")  # stable
    # a local dir WITH data files keeps the stat-based key (no path leak)
    d = tmp_path / "sfY"
    d.mkdir()
    (d / "x.parquet").write_bytes(b"v1")
    assert "__no_local_listing__" not in str(_dataset_fingerprint(str(d))[0])
