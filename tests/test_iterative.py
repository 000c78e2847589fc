"""PageRank power-iteration loop: convergence contraction, mass
conservation bounds, and readout shape."""

from __future__ import annotations

from distributed_mapreduce_spark.workload import QUERIES
from distributed_mapreduce_spark.workload.iterative import (
    PR_DAMP_DEN,
    PR_DAMP_NUM,
    PR_ITERS,
    PR_M0,
)


def _readout(spark, sf_dir):
    rows = QUERIES["pagerank_converge"](spark, sf_dir).orderBy("iter").collect()
    assert [r.iter for r in rows] == list(range(1, PR_ITERS + 1))
    return rows


def test_pagerank_delta_contracts(spark, sf_dir):
    """The L1 delta between successive mass vectors shrinks every
    round, at roughly the damping rate (power iteration on a damped
    stochastic-ish matrix is a contraction)."""
    rows = _readout(spark, sf_dir)
    deltas = [r.l1_delta for r in rows]
    assert all(d > 0 for d in deltas)
    for a, b in zip(deltas, deltas[1:]):
        # contraction factor ≤ damping + slack for integer floors
        assert b < a
        assert b <= a * (PR_DAMP_NUM + 5) / PR_DAMP_DEN
    assert deltas[-1] < deltas[0]


def test_pagerank_mass_bounds(spark, sf_dir):
    """Total mass stays within [BASE·n, M0·n]: floor division only
    leaks mass downward, the teleport floor only adds it back."""
    rows = _readout(spark, sf_dir)
    for r in rows:
        assert r.n_nodes > 0
        assert r.total_mass <= PR_M0 * r.n_nodes
        assert r.total_mass > (PR_M0 // 2) * r.n_nodes
        # node count is constant across iterations (graph is fixed)
        assert r.n_nodes == rows[0].n_nodes
