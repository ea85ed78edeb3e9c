"""The sweep postscript's completeness claim is machine-enforced
(r9 verdict #7): a ``final``-status CORRECTNESS_LOCAL.md postscript with
an unnamed successor commit fails the suite. Pure-logic cases exercise
the parser/classifier; the live test runs the real check against the
repo's git history."""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(HERE, "tools"))

import check_postscript as cp  # noqa: E402


def test_parse_block_roundtrip():
    text = (
        "prose...\n"
        "Sweep-Status: final\n"
        "Sweep-Tree: abc1234\n"
        "Post-Sweep-Commits: dead007 beef008\n"
    )
    b = cp.parse_block(text)
    assert b == {"tree": "abc1234", "status": "final",
                 "named": {"dead007", "beef008"}}
    assert cp.parse_block("no block here") is None
    # superseded status enforces nothing
    assert cp.unlisted_commits({"tree": "x", "status": "superseded",
                                "named": set()}) == []


def test_exempt_matches_driver_artifacts_only():
    for name in ("BENCH_r10.json", "CORRECTNESS_r09.json", "VERDICT.md",
                 "ADVICE.md", "PROGRESS.jsonl", "BENCH_DETAIL.md",
                 "CORRECTNESS_LOCAL.md",  # the postscript commit itself
                 "BENCH_SF1.md"):         # scale-run bench artifact
        assert cp.EXEMPT.match(name), name
    for name in ("bench.py", "vector_db_api_spark/suite.py",
                 "BENCH_SCALE.md", "tools/x.py",
                 "tests/test_x.py", "README.md"):
        assert not cp.EXEMPT.match(name), name


def test_live_postscript_is_clean_or_superseded():
    """The repo's own artifact must always pass: either the claim is
    withdrawn (superseded, round in progress) or every post-sweep commit
    is named. A red result here is exactly the r9 finding — a regenerated
    completeness claim with an uncovered successor commit."""
    problems = cp.check()
    assert problems == [], "\n".join(problems)


def test_final_status_flags_unnamed_commit():
    """Against the real git history: pretend the CURRENT head's parent was
    the sweep tree with nothing named — HEAD itself must be flagged unless
    it is a driver-artifact-only commit."""
    import subprocess

    head = subprocess.run(
        ["git", "-C", HERE, "rev-parse", "--short", "HEAD"],
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    files = subprocess.run(
        ["git", "-C", HERE, "show", "--name-only", "--format=", head],
        capture_output=True, text=True, check=True,
    ).stdout.split()
    bad = cp.unlisted_commits(
        {"tree": f"{head}~1", "status": "final", "named": set()}
    )
    if files and all(cp.EXEMPT.match(f) for f in files):
        assert head not in bad
    else:
        assert bad == [head]
    # naming it clears the violation
    assert cp.unlisted_commits(
        {"tree": f"{head}~1", "status": "final", "named": {head}}
    ) == []
