"""Invariant tests for the corpus-quality / vocabulary workload
(`workload/quality.py`) beyond the registry-wide differential."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_mapreduce_spark.workload import QUERIES
from distributed_mapreduce_spark.workload.quality import (
    ENCODE_LEN,
    TFIDF_TOP_K,
    VOCAB_MIN_DF,
)


def test_repetition_bounds(spark, sf_dir):
    df = QUERIES["quality_repetition"](spark, sf_dir).cache()
    bad = df.filter(
        (F.col("dup_tri_bp") < 0)
        | (F.col("dup_tri_bp") > 10000)
        | (F.col("top_bigram_bp") < 0)
        | (F.col("top_bigram_bp") > 10000)
        | (F.col("tri_distinct") > F.col("tri_total"))
    )
    assert bad.count() == 0
    # The fixture corpus is word salad over a small lexicon: every doc
    # long enough to have trigrams repeats at least one.
    assert df.filter(F.col("tri_total") > 100).filter(F.col("dup_tri_bp") == 0).count() == 0
    df.unpersist()


def test_vocab_ids_dense_and_thresholded(spark, sf_dir):
    vocab = QUERIES["vocab_build"](spark, sf_dir).cache()
    n = vocab.count()
    assert n > 0
    ids = [r.vocab_id for r in vocab.select("vocab_id").collect()]
    assert sorted(ids) == list(range(1, n + 1))
    assert vocab.filter(F.col("df") < VOCAB_MIN_DF).count() == 0
    vocab.unpersist()


def test_encode_prefix_and_oov(spark, sf_dir):
    enc = QUERIES["vocab_encode"](spark, sf_dir).cache()
    assert enc.filter(F.size("token_ids") > ENCODE_LEN).count() == 0
    # Ids are either -1 (OOV) or positive vocab ids.
    bad = enc.filter(
        F.exists("token_ids", lambda t: (t < 1) & (t != -1))
    )
    assert bad.count() == 0
    enc.unpersist()


def test_tfidf_topk_shape(spark, sf_dir):
    top = QUERIES["tfidf_top_terms"](spark, sf_dir).cache()
    assert top.filter(F.col("rnk") > TFIDF_TOP_K).count() == 0
    # rnk values are contiguous from 1 within each doc.
    per_doc = top.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("rnk").alias("mx")
    )
    assert per_doc.filter(F.col("n") != F.col("mx")).count() == 0
    top.unpersist()
