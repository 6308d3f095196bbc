"""Physical-plan inspection helpers.

The engine's scale guarantees are plan properties, not hopes: filters
must reach the parquet scan (PushedFilters), projections must prune the
read schema (ReadSchema), dimension joins must be broadcast (no shuffle
of the fact side), top-N must be TakeOrderedAndProject (no global sort).
These helpers make those properties assertable in tests, so a regression
that silently de-optimizes a plan fails CI — the `.explain("formatted")
and iterate` loop, mechanized.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def has_operator(df: DataFrame, name: str) -> bool:
    return name.lower() in physical_plan(df).lower()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across scans (flattened)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", physical_plan(df)):
        # top-level-comma split: a filter like In(o_orderstatus, [F,O])
        # or GreaterThan(k,100) contains commas of its own — a naive
        # split would report fragments as extra "filters"
        entries, depth, cur = [], 0, []
        for ch in m.group(1):
            if ch == "," and depth == 0:
                entries.append("".join(cur).strip())
                cur = []
                continue
            if ch in "([":
                depth += 1
            elif ch in ")]":
                depth -= 1
            cur.append(ch)
        entries.append("".join(cur).strip())
        out.extend(e for e in entries if e)
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists read by each parquet scan (ReadSchema)."""
    scans = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", physical_plan(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        scans.append(cols)
    return scans


def broadcast_join_count(df: DataFrame) -> int:
    """Broadcast joins in the plan. Formatted explain prints each join
    TWICE — the tree line ('* BroadcastHashJoin Inner BuildRight (4)')
    and its details header ('(4) BroadcastHashJoin') — so a bare
    substring count reports 2x. Count details headers when present
    (exchange_count's fix, mirrored); fall back to the substring count
    for simple-mode plans, which print each join once."""
    plan = physical_plan(df)
    formatted = len(
        re.findall(
            r"^\s*\(\d+\) (?:BroadcastHashJoin|BroadcastNestedLoopJoin)",
            plan,
            re.MULTILINE,
        )
    )
    if formatted:
        return formatted
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan))


def exchange_count(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (excludes broadcast exchanges).

    Handles both explain styles: simple mode inlines the partitioning
    (``Exchange hashpartitioning(...)``); formatted mode emits a bare
    ``(n) Exchange`` operator line with the partitioning on a separate
    ``Arguments:`` line — so count operator headers, not argument text.
    """
    plan = physical_plan(df)
    inline = len(
        re.findall(
            r"\bExchange (?:hashpartitioning|rangepartitioning|SinglePartition)", plan
        )
    )
    formatted = len(re.findall(r"^\s*\(\d+\) Exchange\s*$", plan, re.MULTILINE))
    return max(inline, formatted)
