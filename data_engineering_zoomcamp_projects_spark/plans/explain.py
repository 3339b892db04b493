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


def _split_top_level(args: str) -> list[str]:
    """Split a rendered expression argument list on top-level commas."""
    parts, depth, cur = [], 0, []
    for ch in args:
        if ch in "([":
            depth += 1
        elif ch in ")]":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())
    return parts


def _classify_spec_head(head: str) -> str:
    """Classify a windowspecdefinition's first argument: 'order' /
    'frame' (=> empty partition clause), 'partition' (an attribute or
    expression reference), or raise on anything unclassifiable — plan
    strings are truncated by spark.sql.debug.maxToStringFields, and a
    spec whose ASC/DESC marker got cut must fail LOUDLY rather than
    silently pass the single-partition guard (the session factory
    raises the field limit; this is the belt to that suspender)."""
    if " ASC" in head or " DESC" in head:
        return "order"
    if head.startswith("specifiedwindowframe"):
        return "frame"
    if re.search(r"#\d+", head):  # attribute reference, e.g. lang#12
        return "partition"
    raise ValueError(f"unclassifiable windowspecdefinition head: {head!r}")


def has_global_window(df: DataFrame) -> bool:
    """True if any Window in the plan sorts WITHOUT partition keys —
    the single-partition scale-killer (the whole frame funnels through
    one task). Detected from windowspecdefinition(...): its argument
    list is partition exprs, then order exprs (carrying ASC/DESC
    markers), then the frame — so a spec whose FIRST argument is an
    order expr or the frame itself has an empty partition clause."""
    plan = formatted_plan(df)
    for m in re.finditer(r"windowspecdefinition\((.*)", plan):
        head = _split_top_level(m.group(1))[0]
        if _classify_spec_head(head) in ("order", "frame"):
            return True
    return False


def window_partition_keys(df: DataFrame) -> list[list[str]]:
    """Partition-clause column names (attr ids stripped) of every
    windowspecdefinition in the plan. Feeds the low-cardinality-window
    audit: a window partitioned only by e.g. `lang` (a handful of
    values) is the same single-task pathology as a global window,
    sharded — every partition clause must carry an id-bearing /
    shard-bearing key or be whitelisted with a grain justification."""
    plan = formatted_plan(df)
    specs: list[list[str]] = []
    for m in re.finditer(r"windowspecdefinition\((.*)", plan):
        keys: list[str] = []
        for arg in _split_top_level(m.group(1)):
            if _classify_spec_head(arg) != "partition":
                break
            keys.append(re.sub(r"#\d+L?", "", arg).strip())
        specs.append(keys)
    return specs


def plan_profile(df: DataFrame) -> dict[str, int]:
    """Compact per-plan hygiene profile: shuffle / broadcast /
    sort-merge-join / cartesian counts. Used by the registry-wide audit
    (tests/test_plans.py) so a future edit that introduces an
    unnecessary exchange or degrades a broadcast to a sort-merge join
    fails a test instead of silently shipping."""
    plan = formatted_plan(df)
    return {
        "exchanges": len(re.findall(r"\(\d+\) Exchange\b", plan)),
        "broadcasts": plan.count("BroadcastExchange"),
        "sort_merge_joins": plan.count("SortMergeJoin"),
        "cartesians": plan.count("CartesianProduct"),
        "bnl_joins": plan.count("BroadcastNestedLoopJoin"),
    }
