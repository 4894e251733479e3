"""Registry bookkeeping guards: the verification-priority contract that the
external driver depends on (round-2 verdict) must stay consistent as rounds
add queries and edit implementations."""

from __future__ import annotations

from bigdataprocessingcoursework_nyc_rideshare_analysis__spark.registry import (
    CHANGED_SINCE_VERIFIED,
    DRIVER_VERIFIED,
    load_all,
)


def test_verified_and_changed_names_exist_in_registry():
    """A typo'd name in either table would silently distort the ordering."""
    reg = load_all()
    missing_verified = [n for n in DRIVER_VERIFIED if n not in reg]
    missing_changed = [n for n in CHANGED_SINCE_VERIFIED if n not in reg]
    assert not missing_verified, missing_verified
    assert not missing_changed, missing_changed


def test_ordering_puts_unverified_and_changed_first():
    reg = list(load_all())
    def unverified(n: str) -> bool:
        return n in CHANGED_SINCE_VERIFIED or n not in DRIVER_VERIFIED

    flags = [unverified(n) for n in reg]
    # all unverified/changed entries precede every verified one
    assert flags == sorted(flags, reverse=True)
    # verified tier is ordered oldest round first (stalest re-confirm first)
    rounds = [DRIVER_VERIFIED[n] for n, f in zip(reg, flags) if not f]
    assert rounds == sorted(rounds)


def test_every_query_runs_and_every_oracle_names_a_query():
    reg = load_all()
    assert len(reg) >= 118
    for name, spec in reg.items():
        assert callable(spec.fn), name
        if spec.oracle is not None:
            assert "SELECT" in spec.oracle.upper(), name


def test_coverage_totals_match_registry():
    """COVERAGE.md is the audit trail; its totals line and rows-only
    evidence table drifted from the registry twice (round-5 verdict).
    tools/coverage_totals.py encodes the invariants; this runs them in
    every pytest sweep."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
    )
    import coverage_totals

    problems = coverage_totals.check(open(coverage_totals.COVERAGE_PATH).read())
    assert problems == []
