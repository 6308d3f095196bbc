"""Scaling-slope regression gate (VERDICT r02 item 7).

`bench.py` reports wall-time slopes for the heavy queries at a derived
10x replica; this test makes a SUPERLINEAR regression (an accidental
all-pairs join, a lost pushdown, a driver-side loop) fail CI rather
than only moving a bench number. It derives the same key-shifted 10x
replica from sf0.001 (small enough for CI) and asserts every heavy
query's wall-time slope stays at or below linear-in-data on fixed
cores: slope = t(10x) / max(t(1x), floor) <= 10. Fixed overhead
dominates at this scale, so healthy slopes land near 1-3; a quadratic
operator lands at 50-100 and trips regardless of jitter (the `floor`
denominator damps sub-100ms noise).
"""

from __future__ import annotations

import os
import sys
import time

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the bench's sf1-slope set, minus nothing — keep the two lists in sync
# (a query heavy enough for the bench slope section is heavy enough to
# gate here)
import bench

_FLOOR = 0.2  # seconds; damps jitter on overhead-dominated timings
_LINEAR = 10.0  # 10x data on fixed cores


@pytest.fixture(scope="module")
def replica_dir(spark, tmp_path_factory):
    base = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
    out = str(tmp_path_factory.mktemp("sf10x"))
    os.environ["SPARK_GRAFT_SF1_DIR"] = out
    try:
        got = bench._ensure_sf1(spark, base, copies=10)
    finally:
        del os.environ["SPARK_GRAFT_SF1_DIR"]
    assert got == out
    return base, out


def test_heavy_queries_scale_at_most_linearly(spark, replica_dir):
    from pgwarehouse_spark.registry import all_queries

    base, big = replica_dir
    specs = all_queries()
    slopes = {}
    for name in bench.HEAVY:
        assert name in specs, f"bench.HEAVY references unknown query {name}"
        fn = specs[name].fn
        fn(spark, base).count()  # warm-up: codegen + readers
        t0 = time.perf_counter()
        fn(spark, base).count()
        t1x = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn(spark, big).count()
        t10x = time.perf_counter() - t0
        slopes[name] = t10x / max(t1x, _FLOOR)
    offenders = {n for n, s in slopes.items() if s > _LINEAR}
    # Re-time suspected offenders once before failing: inside a long
    # suite a single timing can be polluted by GC / a concurrent stage;
    # genuine superlinear work (the thing this gate exists for)
    # reproduces on the retry, jitter doesn't.
    persistent = {}
    for name in offenders:
        fn = specs[name].fn
        t0 = time.perf_counter()
        fn(spark, base).count()
        t1x = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn(spark, big).count()
        t10x = time.perf_counter() - t0
        s = t10x / max(t1x, _FLOOR)
        slopes[name] = s
        if s > _LINEAR:
            persistent[name] = round(s, 1)
    assert not persistent, (
        f"superlinear scaling detected (slope > {_LINEAR}x at 10x data, "
        f"confirmed on retry): {persistent}; all slopes: "
        f"{ {n: round(s, 2) for n, s in slopes.items()} }"
    )
