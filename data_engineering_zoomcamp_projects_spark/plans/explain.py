"""Physical-plan inspection helpers — the engine's performance hygiene
harness (SURVEY.md §4).

The scale contract ("would this plan survive 100x data?") is checked in
tests, not prose: these helpers assert that filters actually reach the
parquet scan (PushedFilters), projections prune columns (ReadSchema),
bounded dims broadcast, and hot paths stay inside whole-stage codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan advertises a pushed filter mentioning
    `fragment` (column name, usually)."""
    plan = formatted_plan(df)
    for m in re.finditer(r"PushedFilters: \[(.*?)\]", plan):
        if fragment in m.group(1):
            return True
    return False


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from the scan (column pruning check)."""
    plan = formatted_plan(df)
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<(.*?)>", plan):
        cols.extend(p.split(":")[0] for p in m.group(1).split(",") if p)
    return cols


def uses_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df) or "BroadcastNestedLoopJoin" in formatted_plan(df)


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen subtrees — wider is better on hot
    paths. Uses the 'codegen' explain mode (the AQE formatted plan does
    not annotate codegen)."""
    text = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "codegen"
    )
    m = re.search(r"Found (\d+) WholeStageCodegen", text)
    return int(m.group(1)) if m else 0


def shuffle_count(df: DataFrame) -> int:
    """Exchange operators in the plan = shuffles this query will run
    (formatted plans put the operator header `(n) Exchange` and its
    partitioning arguments on separate lines)."""
    return len(re.findall(r"\(\d+\) Exchange\b", formatted_plan(df)))
