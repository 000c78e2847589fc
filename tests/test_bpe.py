"""BPE tokenizer-training tests: the within-row merge fold used by the
Spark side must equal the positional/window greedy formulation the
oracle uses, and the learned merge sequence must be deterministic and
well-formed."""

from __future__ import annotations

import pytest

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from distributed_mapreduce_spark.workload.bpe import (
    BPE_N_MERGES,
    _merge_fold,
    _train_merges,
    q_tokenizer_bpe_encode,
    q_tokenizer_bpe_merges,
)


def _py_greedy_merge(syms: list[str], a: str, b: str) -> list[str]:
    """Reference implementation: leftmost-non-overlapping positional
    merge (what the oracle's window/island SQL computes)."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


_SYM = st.sampled_from(["a", "b", "c", "ab", "ba", "aa"])


@settings(max_examples=25, deadline=None)
@pytest.mark.deepaudit  # ~13 s hypothesis sweep; the merges query itself is oracle-graded
@given(
    syms=st.lists(_SYM, min_size=0, max_size=8),
    pair=st.tuples(_SYM, _SYM),
)
def test_merge_fold_equals_positional_greedy(spark, syms, pair):
    a, b = pair
    df = spark.createDataFrame([(syms,)], "syms array<string>")
    got = df.select(_merge_fold(a, b).alias("m")).first()["m"]
    assert list(got) == _py_greedy_merge(syms, a, b)


def test_merge_fold_overlap_run(spark):
    # "aaaa" with pair (a,a) → non-overlapping greedy gives [aa, aa];
    # "aaa" gives [aa, a] — the island-parity case.
    df = spark.createDataFrame(
        [(["a"] * 4,), (["a"] * 3,)], "syms array<string>"
    )
    got = [list(r["m"]) for r in df.select(_merge_fold("a", "a").alias("m")).collect()]
    assert got == [["aa", "aa"], ["aa", "a"]]


def test_trained_merges_shape(spark, sf_dir):
    merges, words = _train_merges(spark, sf_dir)
    words.unpersist()
    assert len(merges) == BPE_N_MERGES
    ranks = [m[0] for m in merges]
    assert ranks == list(range(1, BPE_N_MERGES + 1))
    # pair counts are non-increasing in rank ONLY within a round's
    # choice — not globally guaranteed (a merge can create a more
    # frequent pair), but every chosen pair must have positive count
    # and the learned pairs must be distinct.
    assert all(m[3] > 0 for m in merges)
    assert len({(m[1], m[2]) for m in merges}) == BPE_N_MERGES


def test_encode_conservation(spark, sf_dir):
    """BPE never increases the symbol count: n_tokens <= n_bpe_tokens
    <= n_chars for every document (each token is >=1 symbol, each
    merge strictly reduces a word's symbol count)."""
    out = q_tokenizer_bpe_encode(spark, sf_dir).collect()
    assert out
    for r in out:
        assert r["n_tokens"] <= r["n_bpe_tokens"] <= r["n_chars"]


def test_merges_deterministic(spark, sf_dir):
    a = q_tokenizer_bpe_merges(spark, sf_dir).collect()
    b = q_tokenizer_bpe_merges(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
