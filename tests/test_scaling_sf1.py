"""Bench-scale slope gate (VERDICT r03 item 2).

`tests/test_scaling.py` derives its 10x replica from sf0.001, where
fixed overhead dominates every timing — round 3 proved that gate can
pass (slopes "1-3") while the bench's own sf0.1->sf1 section measures a
15x blow-up on the same query (`sim_topk_ivfpq`, unbounded IVF centroid
growth). This gate measures the SAME slope the bench reports: each
bench.HEAVY query timed at sf0.1 and at the bench's own key-shifted 10x
replica (cached in /tmp across runs), asserted against a per-query
slope budget. At this scale the hot queries run seconds, not tens of
milliseconds, so a superlinear operator cannot hide inside startup
overhead: the round-3 IVF defect measures 14.9x here (red) and 1.8x
after the centroid cap (green).

Budgets default to linear (10x wall at 10x data on fixed cores) with a
headroom multiplier for timing jitter; queries whose OUTPUT grows
superlinearly on the duplicate-heavy replica carry documented larger
budgets.
"""

from __future__ import annotations

import os
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

_BASE = "/root/testdata/sf0.1"

# Slope budgets: wall(10x) / wall(1x). Linear-in-data on fixed cores is
# 10; budgets sit above the round-3/4 measured slopes with ~2x headroom
# for CI jitter but far below a quadratic signature (the old IVF defect
# measured 14.9x; an all-pairs regression lands at 50-100x).
_DEFAULT_BUDGET = 10.0
_BUDGETS = {
    # output-bound: the 10x-duplicated replica grows the TRUE duplicate
    # pair count ~143x (512 -> 73k); wall grows ~13x — sublinear in
    # output (see SCALE.md). Budget bounds it at 2x the measured slope.
    "dedup_containment": 26.0,
    # wedge/iteration work genuinely grows faster than rows on the
    # densified replica: healthy measured slopes ~6-7 — a warm base
    # timing can push the RATIO past 10 with no algorithmic change, so
    # these carry ~2x-healthy budgets. A quadratic regression lands at
    # 50-100x (the old IVF defect measured 14.9x from a healthy 2.5);
    # these budgets still catch that class.
    "graph_triangle_count": 14.0,
    "sim_topk_bruteforce": 14.0,
    "graph_pagerank": 13.0,
}
_FLOOR = 0.4  # seconds; sf0.1 timings below this are overhead-dominated


@pytest.fixture(scope="module")
def sf1_dir(spark):
    if not os.path.isdir(_BASE):
        pytest.skip(f"{_BASE} not present")
    out = bench._ensure_sf1(spark, _BASE, copies=10)
    if out is None:
        pytest.skip("sf1 replica derivation failed")
    return out


def _slope(fn, spark, sf1: str) -> float:
    t0 = time.perf_counter()
    fn(spark, _BASE).count()
    t1x = time.perf_counter() - t0
    t0 = time.perf_counter()
    fn(spark, sf1).count()
    t10x = time.perf_counter() - t0
    return t10x / max(t1x, _FLOOR)


def test_bench_heavy_slopes_within_budget(spark, sf1_dir):
    from pgwarehouse_spark.registry import all_queries

    specs = all_queries()
    slopes: dict[str, float] = {}
    for name in bench.HEAVY:
        assert name in specs, f"bench.HEAVY references unknown query {name}"
        fn = specs[name].fn
        fn(spark, _BASE).count()  # warm-up: codegen + parquet footers
        slopes[name] = _slope(fn, spark, sf1_dir)
    over = {
        n: s for n, s in slopes.items() if s > _BUDGETS.get(n, _DEFAULT_BUDGET)
    }
    # Two retries (best-of) before failing: a single timing inside a
    # long suite can be polluted by GC or a concurrent stage; genuine
    # superlinear work reproduces across every rerun, jitter does not —
    # so the gate fails only when the MINIMUM of the reruns still
    # exceeds the budget.
    persistent = {}
    for name in over:
        s = min(_slope(specs[name].fn, spark, sf1_dir) for _ in range(2))
        slopes[name] = s
        if s > _BUDGETS.get(name, _DEFAULT_BUDGET):
            persistent[name] = round(s, 1)
    assert not persistent, (
        f"bench-scale superlinear slope (sf0.1 -> 10x replica, confirmed "
        f"on retry): {persistent}; all slopes: "
        f"{ {n: round(s, 2) for n, s in slopes.items()} }"
    )
