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


def _simple_plan_tree(df: DataFrame) -> list[tuple[int, int, str]]:
    """Parse the simple executed-plan rendering into (idx, depth, text)
    nodes. The simple mode (unlike 'formatted') inlines each scan's
    PushedFilters on the scan line itself, which is what the structural
    audits below need. Depth comes from the tree markers: a node at
    depth d has its ':-'/'+-' marker at column 3*(d-1)."""
    text = df._jdf.queryExecution().executedPlan().toString()
    nodes: list[tuple[int, int, str]] = []
    for line in text.splitlines():
        m = re.search(r"[:+]- ", line)
        if m is None:
            if line.strip() and not nodes:
                nodes.append((0, 0, line.strip()))
            continue
        depth = m.start() // 3 + 1
        nodes.append((len(nodes), depth, line[m.end() :].strip()))
    return nodes


def _subtree(nodes: list[tuple[int, int, str]], idx: int) -> list[str]:
    """Texts of the subtree rooted at nodes[idx] (inclusive)."""
    root_depth = nodes[idx][1]
    out = [nodes[idx][2]]
    for _, d, t in nodes[idx + 1 :]:
        if d <= root_depth:
            break
        out.append(t)
    return out


def _scan_is_selective(scan_line: str) -> bool:
    """A scan line carries a REAL pushed predicate (anything beyond
    IsNotNull). The simple-plan rendering TRUNCATES long filter lists
    ('IsNo..., ReadSchema:'), eating the closing bracket — so the list
    ends at ']' or at the next ', <Key>:' metadata field, whichever
    comes first."""
    m = re.search(r"PushedFilters: \[([^\]]*?)(?:\]|, \w+:)", scan_line)
    if not m or not m.group(1).strip():
        return False
    return any(
        f.strip() and not f.strip().startswith("IsNotNull")
        for f in _split_top_level(m.group(1))
    )


def unfiltered_fact_agg_under_selective_bhj(
    df: DataFrame, fact_prefixes: tuple[str, ...] = ("l_", "o_")
) -> list[str]:
    """The q2 pathology detector (round-9 verdict item 1, promoted to a
    standing guard in round 10): a HashAggregate that consumes a FACT
    scan with only IsNotNull pushed (no selective predicate, no
    semi-join prefilter anywhere below the aggregate) while an ancestor
    BroadcastHashJoin's OTHER side carries a real pushed predicate.
    Such a plan aggregates 100% of the fact table and lets the
    selective broadcast dim discard most groups only afterwards — the
    fix is always a left_semi prefilter against the broadcast key set
    below the groupBy (q20's structure, q2's round-10 rewrite; measured
    3.0x at sf0.1 / ~2% of the fact table aggregated at 100x).

    Returns human-readable violation strings (empty = clean). Fact-ness
    is recognized from the scan's column prefixes (l_/o_ — the TPC-H
    fact tables); dims pass freely."""
    nodes = _simple_plan_tree(df)
    parents: dict[int, int] = {}
    stack: list[tuple[int, int]] = []  # (depth, idx)
    for idx, depth, _ in nodes:
        while stack and stack[-1][0] >= depth:
            stack.pop()
        if stack:
            parents[idx] = stack[-1][1]
        stack.append((depth, idx))

    violations: list[str] = []
    for idx, depth, text in nodes:
        if not text.startswith("HashAggregate"):
            continue
        sub = _subtree(nodes, idx)
        # only the top-most HashAggregate of a partial/final pair
        pidx = parents.get(idx)
        chain = pidx
        is_top = True
        while chain is not None:
            if nodes[chain][2].startswith("HashAggregate"):
                is_top = False
                break
            if "Join" in nodes[chain][2]:
                break
            chain = parents.get(chain)
        if not is_top:
            continue
        fact_scans = [
            t
            for t in sub
            if t.startswith(("FileScan", "Scan parquet"))
            and any(
                re.search(rf"\[{p}\w+#\d+", t) or f" {p}" in t.split("]")[0]
                for p in fact_prefixes
            )
        ]
        if not fact_scans:
            continue
        if any(_scan_is_selective(t) for t in fact_scans):
            continue
        if any("Join" in t for t in sub if not t.startswith("HashAggregate")):
            continue  # a semi/hash prefilter already guards the agg
        # ancestor BroadcastHashJoins: does any OTHER side filter hard?
        anc = parents.get(idx)
        child = idx
        while anc is not None:
            if nodes[anc][2].startswith("BroadcastHashJoin"):
                anc_depth = nodes[anc][1]
                for oidx, od, _ in nodes[anc + 1 :]:
                    if od <= anc_depth:
                        break
                    if od == anc_depth + 1 and oidx != _branch_root(
                        nodes, parents, child, anc
                    ):
                        other = _subtree(nodes, oidx)
                        if any(
                            _scan_is_selective(t)
                            for t in other
                            if t.startswith(("FileScan", "Scan parquet"))
                        ):
                            violations.append(
                                f"HashAggregate({text[:60]}...) aggregates an "
                                "unfiltered fact scan below a selective "
                                f"broadcast join ({nodes[anc][2][:60]}...) — "
                                "semi-join-prefilter the fact side before "
                                "the groupBy (the q20/q2 pattern)"
                            )
                            break
            child = anc
            anc = parents.get(anc)
    return violations


def _branch_root(
    nodes: list[tuple[int, int, str]],
    parents: dict[int, int],
    descendant: int,
    ancestor: int,
) -> int:
    """The ancestor's direct child on the path down to `descendant`."""
    cur = descendant
    while parents.get(cur) is not None and parents[cur] != ancestor:
        cur = parents[cur]
    return cur


_EXPENSIVE_HEADS = (
    "transform(",
    "aggregate(",
    "zip_with(",
    "md5(",
    "array_sort(",
    "filter(",
)


def _balanced_paren(s: str, open_idx: int) -> str | None:
    depth = 0
    for i in range(open_idx, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return s[open_idx : i + 1]
    return None


def duplicated_expensive_exprs(df: DataFrame) -> list[tuple[int, str]]:
    """The CollapseProject-re-inlining detector (the repo's most
    recurrent perf bug, mechanized in round 10): identical EXPENSIVE
    subtrees (HOF transform/aggregate/zip_with/filter, md5, array_sort;
    > 60 rendered chars) appearing 2+ times within ONE physical-plan
    line mean the same expression is re-evaluated per consumer or per
    lambda element — Catalyst does no common-subexpression elimination
    across lambda boundaries or collapsed projections. The fix is a
    staged projection (materialize the expr as a named column in its
    own .select(); see functions/text.py::shingles for the in-lambda
    variant). Returns (count, subtree-prefix) pairs; expression IDs
    (#n) make genuinely identical subtrees textually identical, so
    exact string equality is the right match."""
    out: list[tuple[int, str]] = []
    text = df._jdf.queryExecution().executedPlan().toString()
    # the analyzer mints fresh LAMBDA variable ids per expression
    # instance (lambda x_1#7 vs #8 for textually identical trees), so
    # strip the ids but KEEP the variable names — a reused Column
    # object carries the same names across its uses (the bug shape),
    # while genuinely distinct lambda variables keep distinct names
    # (stripping names too made different vars compare equal — a
    # measured false positive on sim_topk_ivf's per-cell lambdas).
    # Attribute refs keep their ids untouched.
    text = re.sub(r"(lambda \w+)#\d+", r"\1", text)
    for line in text.splitlines():
        found: dict[str, int] = {}
        for kw in _EXPENSIVE_HEADS:
            for m in re.finditer(re.escape(kw), line):
                sub = _balanced_paren(line, m.start() + len(kw) - 1)
                if sub is not None and len(sub) > 60:
                    key = kw + sub
                    found[key] = found.get(key, 0) + 1
        out.extend((c, k[:100]) for k, c in found.items() if c >= 2)
    return out


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
