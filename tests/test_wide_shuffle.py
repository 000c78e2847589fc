"""Input-scaled exchange width (the scoped replacement for round 9's
global initialPartitionNum=1024, VERDICT r09 #1).

Three properties:
- sizing math: wide_shuffle_parts reads only filesystem metadata, is
  None at/below the session default (small inputs keep byte-identical
  plans), and scales ceil(bytes / bytes_per_task) capped at
  WIDE_MAX_PARTITIONS above it;
- plan shape: when the wide path engages, the explicit repartition
  REPLACES the downstream default-width exchanges (the partitioning key
  is a subset of every downstream aggregation/window key) instead of
  adding a shuffle;
- value equality: wide and default widths produce identical results
  (width is physical, never semantic).
"""

from __future__ import annotations

import pytest

from distributed_mapreduce_spark.plans import explain_str
from distributed_mapreduce_spark.workload import registry
from distributed_mapreduce_spark.workload.registry import (
    WIDE_MAX_PARTITIONS,
    wide_shuffle_parts,
)

#: (query name, module holding the imported-by-name helper, key the wide
#: exchange hashes on). The four families are exactly the ones whose
#: x1000 decade was at/over linear at the 32-part default in
#: SCALING_r08 (ngram_novelty 2.07, vocab_build 1.04, simpson 1.03,
#: gap_fill 1.04).
WIDE_FAMILIES = [
    ("text_ngram_novelty", "distributed_mapreduce_spark.workload.quality", "gram"),
    ("vocab_build", "distributed_mapreduce_spark.workload.quality", "token"),
    (
        "text_simpson_diversity",
        "distributed_mapreduce_spark.workload.text",
        "doc_id",
    ),
    (
        "events_gap_fill_interpolate",
        "distributed_mapreduce_spark.workload.events",
        "user_id",
    ),
    # Added after the round-10 x1000 re-measure crash: same explode →
    # index-aggregate → join-back shape as ngram_novelty, same fix.
    ("dedup_repeated_passages", "distributed_mapreduce_spark.workload.corpus", "gh"),
]


def test_sizing_returns_none_at_small_inputs(spark, sf_dir):
    # sf0.001 documents is a few KB; the default 2 MiB/task → 1 task →
    # below the session default → None (callers skip the repartition,
    # so the sf0.001/sf0.01/sf0.1 bench plans are untouched by the
    # wide-path code).
    assert wide_shuffle_parts(spark, sf_dir) is None
    assert wide_shuffle_parts(spark, sf_dir, table_name="events") is None


def test_sizing_scales_with_bytes_and_caps(spark, sf_dir):
    import os

    nbytes = os.path.getsize(f"{sf_dir}/documents.parquet")
    # One task per byte → n = nbytes, capped.
    assert (
        wide_shuffle_parts(spark, sf_dir, bytes_per_task=1)
        == WIDE_MAX_PARTITIONS
    )
    per_task = max(1, nbytes // 100)
    n = wide_shuffle_parts(spark, sf_dir, bytes_per_task=per_task)
    assert n == -(-nbytes // per_task)  # ceil, above the default of 4


def test_sizing_none_on_missing_table(spark, tmp_path):
    assert wide_shuffle_parts(spark, str(tmp_path), "nonexistent") is None


def test_sizing_sums_directory_parquet(spark, sf_dir, tmp_path):
    # Spark-written (directory) parquet — the scaled-corpus layout —
    # sizes by the sum of the part files.
    out = str(tmp_path / "documents.parquet")
    spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(3).write.parquet(
        out
    )
    n = wide_shuffle_parts(spark, str(tmp_path), bytes_per_task=1)
    assert n == WIDE_MAX_PARTITIONS


@pytest.fixture
def force_wide(monkeypatch):
    """Make the wide path engage at sf0.001 (width 16 > the test
    session's 4 shuffle partitions) by patching the name each workload
    module imported."""
    import importlib

    def fake(spark, sf_dir, table_name="documents", bytes_per_task=0):
        return 16

    for _q, mod_name, _key in WIDE_FAMILIES:
        mod = importlib.import_module(mod_name)
        monkeypatch.setattr(mod, "wide_shuffle_parts", fake)
    return 16


@pytest.mark.parametrize("name,mod,key", WIDE_FAMILIES)
def test_wide_width_preserves_values_and_plan(
    spark, sf_dir, force_wide, name, mod, key
):
    from distributed_mapreduce_spark.workload import QUERIES

    df = QUERIES[name](spark, sf_dir)
    plan = explain_str(df)
    # The wide exchange is present and hashes on the declared key...
    assert f"hashpartitioning({key}" in plan and ", 16)" in plan
    # ...and it REPLACED the default-width exchanges ON THE STREAM KEY:
    # no hash exchange keyed by the exploded-stream key survives at the
    # session default width (4). Post-aggregate exchanges over the
    # already-collapsed relation (e.g. global_rank's _pid offsets and
    # range shuffle in vocab_build) legitimately keep session width —
    # they carry the sublinear aggregate, not the stream.
    import re

    key_widths = {
        int(m)
        for m in re.findall(
            rf"hashpartitioning\({re.escape(key)}#[^)]*, (\d+)\)", plan
        )
    }
    assert key_widths == {16}, plan

    wide_rows = sorted(map(repr, df.collect()))
    # Default-width twin: un-patch by calling through the registry
    # module directly (its own attribute is untouched by the fixture).
    import importlib

    m = importlib.import_module(mod)
    fake = m.wide_shuffle_parts
    try:
        m.wide_shuffle_parts = registry.wide_shuffle_parts
        base_rows = sorted(map(repr, QUERIES[name](spark, sf_dir).collect()))
    finally:
        m.wide_shuffle_parts = fake
    assert wide_rows == base_rows
