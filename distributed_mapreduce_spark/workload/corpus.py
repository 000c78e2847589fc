"""Corpus-level training-data preparation: benchmark decontamination,
n-gram language-model statistics, tokenizer fertility.

These are the remaining table-stakes operators of an LLM data pipeline
(after dedup/quality/vocab/packing, which live in `dedup.py`,
`text.py`, `quality.py`): strip evaluation-set contamination from the
training corpus, build the count tables a statistical LM (or a
data-mixing heuristic) consumes, and audit how many model tokens each
written word costs per language.

Reference parity note: all three are explode → hash-aggregate → join
pipelines — the reference's wordcount/grep skeleton
(`data/maple-exe.go` / `data/juice-exe.go`) with a second relation
joined in; no operator here exceeds the shuffle vocabulary the
reference's maple/juice surface implies.

Scale notes (100 TB):
- Decontamination joins the exploded training n-grams against the
  DISTINCT benchmark n-gram relation — the benchmark side is
  aggregated first (eval suites are millions of grams, not billions),
  so AQE broadcasts it when small and falls back to a shuffle join
  when not; the training side streams through one explode + one
  equi-join, never a cross product. Grams travel as portable u32
  hashes (md5-derived, same scheme as MinHash shingles), not strings.
- LM bigram counts are two hash aggregations (bigram, unigram) plus
  an equi-join on the first token — map-side partials everywhere;
  the df >= threshold filter caps the output like vocab_build.
- Fertility is a pure per-row expression folded into one per-language
  aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_mapreduce_spark.workload.dedup import _hash_u32, _sql_hash_u32
from distributed_mapreduce_spark.workload.quality import _ngrams, _sql_ngrams
from distributed_mapreduce_spark.workload.registry import query, table
from distributed_mapreduce_spark.workload.text import BPE_REGEX, _sql_tokens, _tokens

#: Deterministic eval-set gate: ~1% of docs stand in for the benchmark
#: suite (doc_id % DECON_EVAL_MOD == 0).
DECON_EVAL_MOD = 97

#: Contamination n-gram size. Production decontamination uses 8-13-gram
#: windows; the harness corpus is synthetic with near-zero 8-gram
#: collision mass, so the registered query uses 3 to keep the result
#: set meaningful — the plan is length-independent.
DECON_N = 3

#: Shared-gram count at/above which a training doc is flagged.
DECON_FLAG_MIN = 2

_DECON_SQL = f"""
    WITH t AS (
      SELECT doc_id, list_distinct({_sql_ngrams(_sql_tokens('text'), DECON_N)}) AS grams
      FROM (SELECT doc_id, text FROM documents)
    ), eg AS (
      SELECT DISTINCT {_sql_hash_u32('gram', 'dc_')} AS gh
      FROM t, unnest(grams) AS u(gram)
      WHERE doc_id % {DECON_EVAL_MOD} = 0
    ), tg AS (
      SELECT doc_id, {_sql_hash_u32('gram', 'dc_')} AS gh
      FROM t, unnest(grams) AS u(gram)
      WHERE doc_id % {DECON_EVAL_MOD} <> 0
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_shared,
           count(*) >= {DECON_FLAG_MIN} AS contaminated
    FROM tg JOIN eg USING (gh)
    GROUP BY doc_id
"""


@query("decontam_ngram_overlap", oracle=_DECON_SQL)
def q_decontam_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per training document, the number of
    distinct {DECON_N}-grams it shares with the (deterministic ~1%)
    eval split, plus a contamination flag at >= {DECON_FLAG_MIN}
    shared grams — the pre-training hygiene pass that keeps test-set
    text out of the training corpus.

    Plan: per-doc DISTINCT gram sets on both sides; the eval side is
    globally deduplicated into a compact (gh) relation BEFORE the join
    (AQE broadcasts it while it fits, shuffle-joins otherwise); one
    equi-join on the u32 gram hash + one per-doc aggregate. Gram
    strings never shuffle — only their hashes."""
    docs = table(spark, sf_dir, "documents").repartition(
        spark.sparkContext.defaultParallelism
    )
    grams = docs.select(
        "doc_id",
        F.array_distinct(_ngrams(_tokens(F.col("text")), DECON_N)).alias("grams"),
    )
    exploded = grams.select(
        "doc_id", F.explode("grams").alias("gram")
    ).select("doc_id", _hash_u32(F.col("gram"), "dc_").alias("gh"))
    eval_grams = (
        exploded.filter(F.col("doc_id") % DECON_EVAL_MOD == 0).select("gh").distinct()
    )
    train_grams = exploded.filter(F.col("doc_id") % DECON_EVAL_MOD != 0)
    return (
        train_grams.join(eval_grams, "gh")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .select(
            "doc_id",
            "n_shared",
            (F.col("n_shared") >= DECON_FLAG_MIN).alias("contaminated"),
        )
    )


#: Bigrams kept in the LM table: corpus count at/above this.
LM_MIN_COUNT = 3


@query(
    "lm_bigram_counts",
    oracle=f"""
    WITH t AS (
      SELECT {_sql_tokens('text')} AS toks FROM documents
    ), bg AS (
      SELECT gram,
             string_split(gram, ' ')[1] AS w1,
             CAST(count(*) AS BIGINT) AS c2
      FROM t, unnest({_sql_ngrams('toks', 2)}) AS u(gram)
      GROUP BY gram
    ), ug AS (
      SELECT tok AS w1, CAST(count(*) AS BIGINT) AS c1
      FROM t, unnest(toks) AS u(tok)
      GROUP BY tok
    )
    SELECT bg.gram AS bigram, bg.c2 AS n_bigram, ug.c1 AS n_unigram,
           CAST(bg.c2 * 10000 // ug.c1 AS BIGINT) AS cond_bp
    FROM bg JOIN ug ON bg.w1 = ug.w1
    WHERE bg.c2 >= {LM_MIN_COUNT}
    """,
)
def q_lm_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-LM count table: corpus bigram counts joined with the
    first token's unigram count, and the conditional probability
    P(w2|w1) in exact basis points (integer floor — bit-portable,
    unlike float log-probs). Thresholded like vocab_build so the
    output is the Heaps'-law-sublinear head, not the raw tail.

    Plan: one explode per granularity, two hash aggregations with
    map-side partials, one equi-join on w1 (AQE-chosen strategy — the
    unigram table is sublinear but unbounded)."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(_tokens(F.col("text")).alias("toks"))
    bg = (
        toks.select(F.explode(_ngrams(F.col("toks"), 2)).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_bigram"))
        .filter(F.col("n_bigram") >= LM_MIN_COUNT)
        .select(
            F.col("gram").alias("bigram"),
            F.split(F.col("gram"), " ").getItem(0).alias("w1"),
            "n_bigram",
        )
    )
    ug = (
        toks.select(F.explode("toks").alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("n_unigram"))
    )
    return bg.join(ug, "w1").select(
        "bigram",
        "n_bigram",
        "n_unigram",
        F.expr("(n_bigram * 10000) DIV n_unigram").cast("long").alias("cond_bp"),
    )


@query(
    "tokenizer_fertility",
    oracle=f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len({_sql_tokens('text')})) AS BIGINT) AS n_words,
           CAST(sum(len(regexp_extract_all(text, '{BPE_REGEX}'))) AS BIGINT)
             AS n_bpe_tokens,
           CAST(sum(len(regexp_extract_all(text, '{BPE_REGEX}'))) * 10000
                // sum(len({_sql_tokens('text')})) AS BIGINT) AS fertility_bp,
           CAST(sum(n_chars) * 10000
                // sum(len(regexp_extract_all(text, '{BPE_REGEX}'))) AS BIGINT)
             AS chars_per_token_bp
    FROM documents
    GROUP BY lang
    """,
)
def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit per language: BPE-ish tokens per
    whitespace word and characters per BPE token (both in basis
    points) — the metric that tells a multilingual pipeline which
    languages pay a token tax under the current tokenizer. Pure
    columnar expressions folded into one per-language hash aggregate;
    integer floor ratios keep the oracle exact."""
    docs = table(spark, sf_dir, "documents")
    words = F.size(_tokens(F.col("text")))
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_REGEX), F.lit(0)))
    agg = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(words).cast("long").alias("n_words"),
        F.sum(bpe).cast("long").alias("n_bpe_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars_sum"),
    )
    return agg.select(
        "lang",
        "n_docs",
        "n_words",
        "n_bpe_tokens",
        F.expr("(n_bpe_tokens * 10000) DIV n_words").cast("long").alias("fertility_bp"),
        F.expr("(n_chars_sum * 10000) DIV n_bpe_tokens")
        .cast("long")
        .alias("chars_per_token_bp"),
    )
