"""Provenance rules of the scaling harness's merge (VERDICT r07 #5):
carried rows must keep their ORIGINAL run id, never cite the merge
target, and narrative notes must survive a partial refresh (the
round-8 --merge regression that silently dropped the notes object)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo/tools")


def test_merge_carried_preserves_origin_and_notes():
    from scaling_bench import merge_carried

    prior = {
        "queries": {
            # modern row: has its own origin stamp
            "q_modern": {"x1_sec": 1.0, "measured_in": "SCALING_r08-run1"},
            # legacy row: predates measured_in, carries the old
            # self-referential tag that must be shed
            "q_legacy": {"x1_sec": 2.0, "carried_from": "SCALING_r07.json"},
        },
        "notes": {"diagnosis": "documented"},
    }
    rows, notes = merge_carried(prior, "SCALING_r07")

    assert rows["q_modern"]["measured_in"] == "SCALING_r08-run1"
    assert rows["q_modern"]["carried"] is True
    assert rows["q_legacy"]["measured_in"] == "SCALING_r07"
    assert "carried_from" not in rows["q_legacy"]
    assert notes == {"diagnosis": "documented"}
    # input must not be mutated (rows are copies)
    assert "carried" not in prior["queries"]["q_modern"]


def test_merge_carried_never_cites_merge_target():
    from scaling_bench import merge_carried

    prior = {"queries": {"q": {"x1_sec": 1.0}}}
    rows, _ = merge_carried(prior, "SCALING_r07")
    # the target artifact name (r08) appears nowhere; the source stem is
    # the fallback origin
    assert rows["q"]["measured_in"] == "SCALING_r07"
