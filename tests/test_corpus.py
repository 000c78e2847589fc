"""Invariants for the corpus-prep operators (decontamination, LM
counts, fertility, incremental dedup, filter reasons, passages)."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_mapreduce_spark.workload import QUERIES
from distributed_mapreduce_spark.workload.corpus import (
    DECON_EVAL_MOD,
    INCR_BATCH_MOD,
    INCR_BATCH_REM,
)
from distributed_mapreduce_spark.workload.registry import table


def test_decontam_excludes_eval_docs(spark, sf_dir):
    df = QUERIES["decontam_ngram_overlap"](spark, sf_dir)
    assert df.filter(F.col("doc_id") % DECON_EVAL_MOD == 0).count() == 0
    assert df.filter("n_shared < 1").count() == 0


def test_lm_bigram_cond_bp_bounded(spark, sf_dir):
    df = QUERIES["lm_bigram_counts"](spark, sf_dir)
    assert df.filter("cond_bp < 0 OR cond_bp > 10000").count() == 0
    # a bigram can't outnumber its first token's occurrences
    assert df.filter("n_bigram > n_unigram").count() == 0


def test_tokenizer_fertility_totals(spark, sf_dir):
    rows = QUERIES["tokenizer_fertility"](spark, sf_dir).collect()
    n_docs = table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        # BPE splitting never merges words: fertility >= 1x
        assert r.fertility_bp >= 10000


def test_dedup_incremental_covers_batch(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    n_batch = docs.filter(
        F.col("doc_id") % INCR_BATCH_MOD == INCR_BATCH_REM
    ).count()
    df = QUERIES["dedup_incremental"](spark, sf_dir)
    assert df.count() == n_batch
    statuses = {r.status for r in df.select("status").distinct().collect()}
    assert statuses <= {"new", "dup_of_corpus", "dup_within_batch"}


def test_quality_filter_mask_consistent_with_kept(spark, sf_dir):
    df = QUERIES["quality_filter_reasons"](spark, sf_dir)
    assert df.filter("(reason_mask = 0) <> kept").count() == 0
    assert df.filter("reason_mask < 0 OR reason_mask > 15").count() == 0
    assert df.count() == table(spark, sf_dir, "documents").count()


def test_repeated_passages_bounds(spark, sf_dir):
    df = QUERIES["dedup_repeated_passages"](spark, sf_dir)
    assert df.filter("n_shared > n_passages").count() == 0
    assert df.filter("boilerplate_bp < 0 OR boilerplate_bp > 10000").count() == 0


def test_exact_substring_runs_are_maximal_and_disjoint(spark, sf_dir):
    """Runs are gaps-and-islands of duplicated window positions: within
    a doc they must be sorted-disjoint with a GAP between consecutive
    runs (adjacent runs would have been merged), and every span covers
    n_windows + ES_K - 1 tokens."""
    from distributed_mapreduce_spark.workload.corpus import ES_K

    df = QUERIES["dedup_exact_substring_runs"](spark, sf_dir)
    assert df.filter(f"span_tokens <> n_windows + {ES_K - 1}").count() == 0
    assert df.filter("n_windows < 1 OR run_start < 0").count() == 0
    rows = sorted(
        df.select("doc_id", "run_start", "n_windows").collect(),
        key=lambda r: (r.doc_id, r.run_start),
    )
    prev = {}
    for r in rows:
        if r.doc_id in prev:
            # next run starts at least one NON-duplicated position past
            # the previous run's last duplicated window (maximality)
            assert r.run_start > prev[r.doc_id] + 1
        prev[r.doc_id] = r.run_start + r.n_windows - 1


def test_quality_model_logit_consistent(spark, sf_dir):
    from distributed_mapreduce_spark.workload.corpus import (
        QM_KEEP_MIN_MICRO,
        QM_WEIGHTS,
    )

    assert len(QM_WEIGHTS) == 64
    df = QUERIES["quality_model_logit"](spark, sf_dir)
    # verdict must be exactly the documented threshold on the score
    assert (
        df.filter(
            f"model_keep <> (n_tokens > 0 AND logit_pt_micro >= {QM_KEEP_MIN_MICRO})"
        ).count()
        == 0
    )
    assert df.count() == table(spark, sf_dir, "documents").count()


def test_quality_model_agreement_covers_corpus(spark, sf_dir):
    df = QUERIES["quality_model_rule_agreement"](spark, sf_dir)
    rows = df.collect()
    assert sum(r.n_docs for r in rows) == table(spark, sf_dir, "documents").count()
    assert df.count() <= 4
