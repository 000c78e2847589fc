"""CLI end-to-end smoke (VERDICT r05 #8): drive the REPL-parity verbs
`put / select / maple / juice / get / store / ls / delete` through
`distributed_mapreduce_spark.__main__.main` against a temp warehouse,
and hash-check the pipeline output against the flagship DuckDB oracle.

This is the reference user's whole session shape (README.md:25-56):
ingest a file, SELECT with a regex, run a maple exe then a juice exe
(with delete_input=1), fetch the merged result to a local CSV.
"""

from __future__ import annotations

import csv
import os
import json

import duckdb
import pytest

from distributed_mapreduce_spark.__main__ import main

MAPLE_AWK = """awk -F',' '$1 == "F" { print $2 "\t1" }'"""
JUICE_AWK = """awk -F'\t' '{ s[$1] += $2 } END { for (k in s) print k "\t" s[k] }'"""


@pytest.fixture()
def orders_lines(tmp_path, sf_dir):
    """The reference's untyped line model: one 'status,priority' CSV
    line per order, as a plain text file."""
    con = duckdb.connect()
    rows = con.execute(
        "SELECT o_orderstatus || ',' || o_orderpriority "
        f"FROM read_parquet('{sf_dir}/orders.parquet') ORDER BY o_orderkey"
    ).fetchall()
    p = tmp_path / "orders_lines.txt"
    p.write_text("\n".join(r[0] for r in rows) + "\n")
    return str(p), con


def test_cli_put_select_maple_juice_get_roundtrip(
    spark, sf_dir, tmp_path, capsys, orders_lines
):
    lines_path, con = orders_lines
    wh = str(tmp_path / "warehouse")
    base = ["--warehouse", wh]

    assert main(base + ["put", lines_path, "lines"]) == 0

    # SELECT ALL FROM lines WHERE '^F,' — row count must equal the
    # oracle's status-F order count.
    capsys.readouterr()
    assert main(base + ["select", "lines", "^F,"]) == 0
    n_sel = len([ln for ln in capsys.readouterr().out.splitlines() if ln])
    n_f = con.execute(
        f"SELECT count(*) FROM read_parquet('{sf_dir}/orders.parquet') "
        "WHERE o_orderstatus = 'F'"
    ).fetchone()[0]
    assert n_sel == n_f

    # maple exe -> intermediate; juice exe -> result, deleting the input.
    assert main(base + ["maple", MAPLE_AWK, "4", "inter", "lines"]) == 0
    assert (
        main(base + ["juice", JUICE_AWK, "4", "inter", "result", "1", "hash"])
        == 0
    )

    # store: intermediate is gone (delete_input=1), result + lines remain.
    capsys.readouterr()
    assert main(base + ["store"]) == 0
    stored = set(capsys.readouterr().out.split())
    assert "result" in stored and "lines" in stored and "inter" not in stored

    # ls: metadata JSON for the result dataset.
    capsys.readouterr()
    assert main(base + ["ls", "result"]) == 0
    meta = json.loads(capsys.readouterr().out)
    assert meta["name"] == "result"
    assert meta["bytes"] > 0 and os.path.isdir(meta["path"])

    # get: merged local CSV equals the flagship oracle's counts exactly.
    out_csv = str(tmp_path / "result.csv")
    assert main(base + ["get", "result", out_csv]) == 0
    with open(out_csv, newline="") as f:
        rows = list(csv.DictReader(f))
    got = {r["key"]: int(r["value"]) for r in rows}
    oracle = dict(
        con.execute(
            "SELECT o_orderpriority, count(*) "
            f"FROM read_parquet('{sf_dir}/orders.parquet') "
            "WHERE o_orderstatus = 'F' GROUP BY o_orderpriority"
        ).fetchall()
    )
    assert got == oracle

    # delete: removing a dataset succeeds once, then reports not-found.
    assert main(base + ["delete", "lines"]) == 0
    assert main(base + ["delete", "lines"]) == 1


def test_get_to_local_keeps_pandas_csv_dialect(spark, tmp_path):
    """The executor-side single-file export must keep the dialect the
    API shipped with (ADVICE r08): embedded quotes doubled per RFC 4180
    (not backslash-escaped), booleans True/False (not true/false), and
    timestamps without the ISO 'T' separator."""
    import datetime

    from distributed_mapreduce_spark.catalog import Catalog

    cat = Catalog(spark, str(tmp_path / "store"))
    df = spark.createDataFrame(
        [
            (1, 'say "hi", ok', True, datetime.datetime(2024, 3, 1, 12, 30, 5)),
            (2, "plain", False, datetime.datetime(2024, 3, 2, 0, 0, 0)),
        ],
        schema="id int, txt string, flag boolean, ts timestamp",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "store" / "t1"))
    out = tmp_path / "t1.csv"
    cat.get_to_local("t1", str(out))
    text = out.read_text()
    assert '"say ""hi"", ok"' in text  # RFC 4180 quote doubling
    assert "\\" not in text  # no backslash escaping anywhere
    assert "True" in text and "False" in text
    assert "2024-03-01 12:30:05" in text and "T12:30" not in text
    # pandas parses it back identically
    import pandas as pd

    rt = pd.read_csv(out).sort_values("id")
    assert list(rt["txt"]) == ['say "hi", ok', "plain"]
    assert list(rt["flag"]) == [True, False]
