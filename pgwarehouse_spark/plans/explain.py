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
        entries = [e.strip() for e in m.group(1).split(",") if e.strip()]
        out.extend(entries)
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists read by each parquet scan (ReadSchema)."""
    scans = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", physical_plan(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        scans.append(cols)
    return scans


def broadcast_join_count(df: DataFrame) -> int:
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", physical_plan(df)))


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
