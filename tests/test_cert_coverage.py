"""Certification coverage assertion (VERDICT r10 #3): a subset run must
report "partial: N/M", never "ALL PASS" — the round-10 sf1.0 artifact
hid a 111-query hole behind a subset's ALL PASS, and the fix is in
tooling, not prose."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/tools")


def test_subset_run_reports_partial_not_all_pass(spark, tmp_path):
    from check_correctness import run

    from distributed_mapreduce_spark.workload import QUERIES

    log = tmp_path / "cert.log"
    failures = run(
        "/root/testdata/sf0.001",
        only={"group_count"},
        log_path=str(log),
        spark=spark,
    )
    text = log.read_text()
    assert failures == 0
    assert "PASS group_count" in text
    assert f"partial: 1/{len(QUERIES)}" in text
    assert "ALL PASS" not in text


def test_start_after_resume_is_registration_order():
    """--start-after NAME must derive the subset from registration
    order (the crashed log's tail), not a hand-picked list."""
    from distributed_mapreduce_spark.workload import QUERIES

    names = list(QUERIES)
    anchor = names[5]
    expect = set(names[6:])
    # Reproduce main()'s derivation without running the queries.
    got = set(names[names.index(anchor) + 1 :])
    assert got == expect and anchor not in got


def test_sf1_logs_cover_every_registered_query():
    """The committed CORRECTNESS_SF1_*.log set must give every
    registered query a PASS (or documented SKIP) row — the gate that
    makes the round-10 111-query hole structurally impossible to
    re-open silently. A new query without an sf1.0 row fails here
    until certified."""
    from tools.sf1_coverage import coverage

    passed, skipped, uncovered = coverage()
    assert not uncovered, f"queries with no sf1.0 row: {sorted(uncovered)[:20]}"
