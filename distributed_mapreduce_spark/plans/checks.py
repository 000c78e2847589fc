"""Physical-plan assertions — the feedback loop that keeps operators
scale-honest (the instructions every operator must pass: filters reach
the scan, small dims broadcast, hot paths stay in whole-stage codegen).

The reference has no optimizer at all (SURVEY.md §4.1); here the
optimizer is Catalyst and these helpers verify we didn't accidentally
defeat it.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The explain output as a string (what `.explain()` prints)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", explain_str(df)):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each scan (ReadSchema) — the
    column-pruning check."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", explain_str(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df) or "BroadcastNestedLoopJoin" in explain_str(df)


def wholestage_codegen_count(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans (wider/fewer = better fusion).

    Formatted mode tags fused operators `[codegen id : N]`; the legacy
    tree mode prints `WholeStageCodegen (N)` — count either.
    """
    s = explain_str(df)
    ids = set(re.findall(r"codegen id : (\d+)", s))
    ids |= set(re.findall(r"WholeStageCodegen \((\d+)\)", s))
    return len(ids)


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle/broadcast) operators in the plan —
    counted from the formatted details section so each operator counts
    once."""
    return len(re.findall(r"\(\d+\) Exchange", explain_str(df)))
