"""Central registry binding each operator to (a) its Spark implementation
and (b) its DuckDB oracle SQL.

This is the engine's coverage ledger for SURVEY.md §2: every operator the
reference supports (directly or by provisioning a warehouse) registers a
named query here; ``__spark_entry__.py`` re-exports the registry through
the driver contract (``queries()`` / ``oracle_sql()``).

Queries whose semantics are not ANSI-SQL-expressible (hash-seeded sketches
like MinHash/SimHash, LSH bucketing, ANN) register a *verdict oracle*
instead of going oracle-less: the query emits the EXACT result the SQL
oracle can reproduce hash-exactly, plus the approximation claim (recall
floor / error bound) computed in Spark as a boolean the oracle pins to
literal TRUE. Every registered query therefore carries an oracle; see
``operators/similarity.py::recall_verdict`` and ``agg_approx_distinct``
for the two canonical shapes. ``oracle=None`` remains legal for a future
operator with no exact component at all, and falls back to the driver's
rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    category: str
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    category: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, category=category,
            doc=doc or (fn.__doc__ or ""), tags=tags,
        )
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    _ensure_loaded()
    return dict(_REGISTRY)


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: spec.fn for name, spec in _REGISTRY.items()}


def oracles() -> dict[str, str]:
    _ensure_loaded()
    return {name: spec.oracle for name, spec in _REGISTRY.items() if spec.oracle}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from .operators import (  # noqa: F401
        analytics,
        relational,
        windows,
        setops,
        scalars,
        subqueries,
        syncshapes,
        dedup,
        similarity,
        textstats,
        multimodal,
        asof,
        eventwindows,
        pipeline,
        graph,
        zorder,
        spatial,
        sketches,
    )

    _LOADED = True
