"""Bench-scale slope gate (VERDICT r03 item 2; de-flaked per r04 item 6).

`tests/test_scaling.py` derives its 10x replica from sf0.001, where
fixed overhead dominates every timing — round 3 proved that gate can
pass (slopes "1-3") while the bench's own sf0.1->sf1 section measures a
15x blow-up on the same query (`sim_topk_ivfpq`, unbounded IVF centroid
growth). This gate measures the SAME slope the bench reports — it calls
``bench.measure_slope`` directly, so the gate and BENCH_FULL's
``slope_floored`` section are one definition: best-of-2 wall at sf0.1
and at the bench's own key-shifted 10x replica, denominator floored at
``bench.SLOPE_FLOOR`` (1s) so sub-second base timings can't turn jitter
into a fake ratio. At this scale the hot queries run seconds, so a
superlinear operator cannot hide inside startup overhead: the round-3
IVF defect measures ~15x here (red) and ~2x after the centroid cap.

Budgets default to linear (10x wall at 10x data on fixed cores) with a
headroom multiplier for timing jitter. ``dedup_containment`` is NOT
wall-budgeted (r04 item 4): its output grows ~143x on the duplicate-
heavy replica, so its gate is output-normalized — wall per result pair
must not grow more than the per-pair headroom, replacing the old
hand-set 26x wall budget with a measured sublinearity-in-output check.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench

_BASE = "/root/testdata/sf0.1"

# Slope budgets: wall(10x) / max(wall(1x), FLOOR). Linear-in-data on
# fixed cores is 10; budgets sit above the round-3/4 measured slopes
# with ~2x headroom for CI jitter but far below a quadratic signature
# (the old IVF defect measured 14.9x; an all-pairs regression lands at
# 50-100x).
_DEFAULT_BUDGET = 10.0
_BUDGETS = {
    # wedge/iteration work genuinely grows faster than rows on the
    # densified replica: healthy measured slopes ~6-7 — these carry
    # ~2x-healthy budgets. A quadratic regression lands at 50-100x;
    # these budgets still catch that class.
    "graph_triangle_count": 14.0,
    "sim_topk_bruteforce": 14.0,
    "graph_pagerank": 13.0,
}
# Output-bound queries gated on per-result-pair cost instead of wall
# ratio: {name: max allowed (sf1 sec/pair) / (base sec/pair)}. The
# replica multiplies true pairs ~143x while wall grows ~13x, so the
# HEALTHY per-pair ratio is ~0.1; 2.0 allows 20x jitter headroom while
# still failing any wall-superlinear-in-output regression.
_OUTPUT_NORMALIZED_BUDGETS = {
    "dedup_containment": 2.0,
}


@pytest.fixture(scope="module")
def sf1_dir(spark):
    if not os.path.isdir(_BASE):
        pytest.skip(f"{_BASE} not present")
    out = bench._ensure_sf1(spark, _BASE, copies=10)
    if out is None:
        pytest.skip("sf1 replica derivation failed")
    return out


def test_bench_heavy_slopes_within_budget(spark, sf1_dir):
    from pgwarehouse_spark.registry import all_queries

    specs = all_queries()
    slopes: dict[str, float] = {}
    wall_gated = [n for n in bench.HEAVY if n not in _OUTPUT_NORMALIZED_BUDGETS]
    for name in wall_gated:
        assert name in specs, f"bench.HEAVY references unknown query {name}"
        fn = specs[name].fn
        fn(spark, _BASE).count()  # warm-up: codegen + parquet footers
        slopes[name], _, _ = bench.measure_slope(fn, spark, _BASE, sf1_dir)
    over = {
        n: s for n, s in slopes.items() if s > _BUDGETS.get(n, _DEFAULT_BUDGET)
    }
    # Best-of-3 confirmation before failing: a single timing inside a
    # long suite can be polluted by GC or a concurrent stage; genuine
    # superlinear work reproduces across every rerun, jitter does not —
    # so the gate fails only when the MINIMUM of three reruns still
    # exceeds the budget.
    persistent = {}
    for name in over:
        s = min(
            bench.measure_slope(specs[name].fn, spark, _BASE, sf1_dir)[0]
            for _ in range(3)
        )
        slopes[name] = s
        if s > _BUDGETS.get(name, _DEFAULT_BUDGET):
            persistent[name] = round(s, 1)
    assert not persistent, (
        f"bench-scale superlinear slope (sf0.1 -> 10x replica, confirmed "
        f"best-of-3): {persistent}; all slopes: "
        f"{ {n: round(s, 2) for n, s in slopes.items()} }"
    )


def test_output_bound_queries_sublinear_per_pair(spark, sf1_dir):
    """Output-normalized gate (VERDICT r04 item 4): for queries whose
    result-set itself grows superlinearly on the duplicate-heavy
    replica, assert wall-per-result-pair, not wall. Measured, not
    argued: a regression that makes containment superlinear in its
    OUTPUT (e.g. losing the inverted-index join for all-pairs) raises
    per-pair cost by orders of magnitude and fails here."""
    from pgwarehouse_spark.registry import all_queries

    specs = all_queries()
    failures = {}
    for name, budget in _OUTPUT_NORMALIZED_BUDGETS.items():
        fn = specs[name].fn
        fn(spark, _BASE).count()  # warm-up
        t1, _, n1 = bench.time_query(fn, spark, _BASE, runs=2)
        t10, _, n10 = bench.time_query(fn, spark, sf1_dir, runs=2)
        assert n1 > 0 and n10 > n1, (
            f"{name}: replica must grow the result set ({n1} -> {n10})"
        )
        per_pair_1 = max(t1, bench.SLOPE_FLOOR) / n1
        per_pair_10 = t10 / n10
        ratio = per_pair_10 / per_pair_1
        if ratio > budget:
            # best-of-3 confirmation, same policy as the wall gate
            t10 = min(
                bench.time_query(fn, spark, sf1_dir, runs=1)[0]
                for _ in range(3)
            )
            ratio = (t10 / n10) / per_pair_1
        if ratio > budget:
            failures[name] = {
                "per_pair_ratio": round(ratio, 2),
                "budget": budget,
                "pairs": (n1, n10),
                "wall": (round(t1, 2), round(t10, 2)),
            }
    assert not failures, f"output-normalized superlinearity: {failures}"
