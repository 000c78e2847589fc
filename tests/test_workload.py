"""Registry-wide smoke: every registered query runs at sf0.001 with a
stable non-empty schema, and every oracle is syntactically runnable by
DuckDB. Full value-level differential checking lives in
tools/check_correctness.py (run per milestone; the driver re-runs it
at sf0.01)."""

from __future__ import annotations

import duckdb
import pytest

from distributed_mapreduce_spark.workload import ORACLES, QUERIES

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

#: queries whose correct result may be empty on tiny inputs
MAY_BE_EMPTY = {"join_anti", "embedding_near_dup", "fuzzy_match_levenshtein"}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs_and_schema_stable(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.columns, f"{name}: no columns"
    n = df.count()
    if name not in MAY_BE_EMPTY:
        assert n > 0, f"{name}: empty result"
    # column names match the oracle's projection
    if name in ORACLES:
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        desc = con.execute(ORACLES[name]).description
        assert sorted(d[0] for d in desc) == sorted(df.columns), name


def test_every_query_has_oracle():
    assert set(ORACLES) == set(QUERIES)
