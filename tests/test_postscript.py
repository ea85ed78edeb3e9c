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


def test_parse_block_rejects_short_tokens():
    """r10 advice #4: a short/typo'd token (the old parse accepted ANY hex
    run, even one char) combined with prefix matching silently exempted
    every commit sharing the prefix — tokens under 7 hex chars must not be
    collected at all."""
    text = (
        "Sweep-Status: final\n"
        "Sweep-Tree: abc1234\n"
        "Post-Sweep-Commits: e dead0 dead007 beef00812345\n"
    )
    b = cp.parse_block(text)
    assert b["named"] == {"dead007", "beef00812345"}


def _tmp_repo(tmp_path):
    import subprocess

    def g(*args):
        return subprocess.run(
            ["git", "-C", str(tmp_path), *args],
            capture_output=True, text=True, check=True,
        ).stdout.strip()

    g("init", "-q", "-b", "main")
    g("config", "user.email", "t@example.org")
    g("config", "user.name", "t")
    return g


def test_merge_commits_diff_against_first_parent(tmp_path, monkeypatch):
    """r10 advice #4: ``git show`` prints no files for a merge commit, so
    merges always landed in ``bad`` — the first-parent diff is what the
    merge actually added to the swept line of history, and an exempt-only
    (or empty) first-parent diff must be exempt."""
    g = _tmp_repo(tmp_path)
    (tmp_path / "a.py").write_text("x = 1\n")
    g("add", "a.py"); g("commit", "-qm", "base")
    base = g("rev-parse", "HEAD")
    # side branch: artifact-only commit
    g("checkout", "-qb", "side")
    (tmp_path / "VERDICT.md").write_text("v\n")
    g("add", "VERDICT.md"); g("commit", "-qm", "verdict")
    # main: artifact-only commit, then merge the side branch
    g("checkout", "-q", "main")
    (tmp_path / "BENCH_DETAIL.md").write_text("b\n")
    g("add", "BENCH_DETAIL.md"); g("commit", "-qm", "detail")
    g("merge", "-q", "--no-ff", "-m", "merge side", "side")
    monkeypatch.setattr(cp, "HERE", str(tmp_path))
    # merge's first-parent diff is VERDICT.md only -> exempt; both direct
    # commits artifact-only -> clean
    assert cp.unlisted_commits(
        {"tree": base, "status": "final", "named": set()}
    ) == []
    # a code commit on top IS flagged, and a dangling token exempts nothing
    (tmp_path / "a.py").write_text("x = 2\n")
    g("add", "a.py"); g("commit", "-qm", "code")
    short = g("rev-parse", "--short", "HEAD")
    assert cp.unlisted_commits(
        {"tree": base, "status": "final", "named": {"1234567"}}
    ) == [short]
    # naming it (short form resolves via rev-parse) clears the violation
    assert cp.unlisted_commits(
        {"tree": base, "status": "final", "named": {short}}
    ) == []


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


def test_parse_block_collects_wrapped_token_lines():
    """r11 advice: a Post-Sweep-Commits list wrapped across indented
    continuation lines must keep ALL tokens — the old single-line capture
    silently dropped later lines, failing commits the postscript DID
    name. A non-indented following line ends the list (it's prose, not
    tokens)."""
    import tools.check_postscript as cp

    text = (
        "Sweep-Tree: aaaaaaa1\n"
        "Sweep-Status: final\n"
        "Post-Sweep-Commits: bbbbbbb2 ccccccc3\n"
        "  ddddddd4 eeeeeee5\n"
        "\tfffffff6\n"
        "prose resumes here deadbeef0\n"
    )
    b = cp.parse_block(text)
    assert b["named"] == {
        "bbbbbbb2", "ccccccc3", "ddddddd4", "eeeeeee5", "fffffff6"
    }
    # single-line lists and short-token filtering are unchanged
    one = cp.parse_block(
        "Sweep-Tree: aaaaaaa1\nSweep-Status: final\n"
        "Post-Sweep-Commits: bbbbbbb2 e\n"
    )
    assert one["named"] == {"bbbbbbb2"}
