"""Red-path tests for the clean-bench auto-adjudication + ratchet
(VERDICT r8 tasks 1+2): the adjudicate/gate core is pure, so the
expensive fresh-JVM rerun is injected and every branch is cheap to pin.
"""

from __future__ import annotations

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(_REPO, "scripts"))

import bench_clean_report as bcr  # noqa: E402


def _payloads():
    prior = {"value": 10.0, "queries": {
        "fast_q": 1.0, "steady_q": 4.0, "touched_q": 2.0, "mover_q": 3.0,
    }}
    cur = {"value": 16.0, "queries": {
        "fast_q": 0.5,      # 0.5x speedup on untouched file -> adjudicated
        "steady_q": 4.2,    # inside band -> untouched, not flagged
        "touched_q": 5.0,   # 2.5x but file touched -> diff explains it
        "mover_q": 6.3,     # 2.1x on untouched file -> adjudicated
    }}
    qfiles = {
        "fast_q": "pkg/a.py", "steady_q": "pkg/b.py",
        "touched_q": "pkg/c.py", "mover_q": "pkg/d.py",
    }
    changed = {"pkg/c.py", "docs/readme.md"}
    return prior, cur, qfiles, changed


def test_adjudication_reruns_only_untouched_movers():
    prior, cur, qfiles, changed = _payloads()
    reran = []

    def rerun(name):
        reran.append(name)
        # isolated rerun lands back inside the band
        return {"isolated": prior["queries"][name] * 1.1,
                "runs": [9.9, prior["queries"][name] * 1.1]}

    isolated, violations = bcr.adjudicate_and_gate(
        cur, prior, qfiles, changed, rerun)
    assert sorted(reran) == ["fast_q", "mover_q"]
    assert not violations
    # both numbers live in the artifact
    assert cur["isolated"]["mover_q"]["in_run"] == 6.3
    assert cur["isolated"]["mover_q"]["isolated"] == 3.0 * 1.1
    assert cur["isolated"]["mover_q"]["source_file"] == "pkg/d.py"
    assert "ratchet_violations" not in cur


def test_ratchet_red_path_isolated_still_over():
    """An untouched-file mover whose ISOLATED rerun is still >1.5x prior
    is a violation — this is the regression the code diff cannot
    explain; a speedup never violates."""
    prior, cur, qfiles, changed = _payloads()

    def rerun(name):
        return {"isolated": cur["queries"][name], "runs": [cur["queries"][name]]}

    _, violations = bcr.adjudicate_and_gate(cur, prior, qfiles, changed, rerun)
    names = [v["query"] for v in violations]
    assert names == ["mover_q"]          # fast_q sped up: not a violation
    v = violations[0]
    assert v["ratio_after_adjudication"] == 2.1
    assert cur["ratchet_violations"] == violations


def test_unattributed_query_counts_as_touched():
    """No source-file mapping -> cannot prove untouched -> no isolated
    rerun and no violation (the delta table still flags it)."""
    prior, cur, qfiles, changed = _payloads()
    del qfiles["mover_q"]

    def rerun(name):
        raise AssertionError(f"must not rerun {name}")

    isolated, violations = bcr.adjudicate_and_gate(
        cur, prior, {k: v for k, v in qfiles.items() if k != "fast_q"},
        changed, lambda n: {"isolated": 0.5, "runs": [0.5]})
    assert "mover_q" not in isolated and not violations


def test_report_prints_isolated_with_in_run_parenthesized():
    prior, cur, qfiles, changed = _payloads()
    bcr.adjudicate_and_gate(
        cur, prior, qfiles, changed,
        lambda n: {"isolated": prior["queries"][n] * 1.2,
                   "runs": [prior["queries"][n] * 1.2]})
    report = bcr.build_report(9, cur, "BENCH_CLEAN_r08.json", prior)
    # adjudicated row shows the isolated number with in-run parenthesized
    assert "3.60 (in-run 6.30)" in report
    assert "Ratchet clean" in report


def test_report_surfaces_violations():
    prior, cur, qfiles, changed = _payloads()
    bcr.adjudicate_and_gate(
        cur, prior, qfiles, changed,
        lambda n: {"isolated": cur["queries"][n], "runs": [cur["queries"][n]]})
    report = bcr.build_report(9, cur, "BENCH_CLEAN_r08.json", prior)
    assert "RATCHET VIOLATIONS (1)" in report
    assert "mover_q" in report


def test_round_boundary_and_source_attribution_live():
    """The live plumbing the pure core rides on: the repo's round
    boundary commit resolves, and every benched query maps to a
    repo-relative source file that exists."""
    ref = bcr.round_boundary_ref()
    assert ref and len(ref) == 40
    import subprocess

    subject = subprocess.run(
        ["git", "log", "-1", "--format=%s", ref],
        cwd=_REPO, capture_output=True, text=True,
    ).stdout
    assert subject.startswith("round ")
    qfiles = bcr.query_source_files()
    import bench as bench_mod

    for name in bench_mod.HEADLINE:
        assert name in qfiles, f"{name} has no source attribution"
        assert os.path.exists(os.path.join(_REPO, qfiles[name])), qfiles[name]
        assert qfiles[name].startswith("pgwarehouse_spark/")
