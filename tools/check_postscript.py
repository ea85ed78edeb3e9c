"""Machine check for CORRECTNESS_LOCAL.md's freeze-discipline postscript
(r9 verdict #7: a postscript that claims completeness must be the last
word — or name its successors).

The sweep artifact carries a machine block::

    Sweep-Tree: <commit the sweeps ran on>
    Sweep-Status: final | superseded
    Post-Sweep-Commits: <hash> <hash> ...

Semantics:

- ``final`` — the sweep results describe the current tree; every commit
  after ``Sweep-Tree`` must be NAMED in ``Post-Sweep-Commits`` (proving a
  human looked at it and the postscript prose covers it). Exempt: commits
  that touch only driver-written round artifacts (BENCH_r*.json,
  CORRECTNESS_r*.json, VERDICT.md, ADVICE.md, PROGRESS.jsonl,
  BENCH_DETAIL.md) — the driver commits those after the builder's last
  commit by construction, so a final postscript cannot name them.

  The artifact-only exemption (named rule, r10 verdict #6 — first
  applied by commit 3c4b21e): a commit whose ENTIRE file set matches
  ``EXEMPT`` is measurement/prose REGENERATION — BENCH_DETAIL.md,
  BENCH_SF*.md, CORRECTNESS_LOCAL.md itself, and the driver's round
  records. Such a commit cannot invalidate a code sweep because no file
  it touches participates in any swept plan: the sweeps execute package
  code + registry entries, and regenerating a report about them changes
  no executed byte. CORRECTNESS_LOCAL.md is additionally exempt because
  the commit that writes the final postscript cannot name its own hash.
  Any commit touching even one non-exempt file must be named.
- ``superseded`` — the claim is withdrawn (a new round started changing
  code); nothing is enforced beyond the block being parseable. The
  round's end-of-sweep regeneration flips it back to ``final``.

Run as a script (exit 1 on violation) or import ``check`` from pytest.
"""

from __future__ import annotations

import os
import re
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# measurement/round artifacts: a commit touching ONLY these cannot falsify
# a sweep. Driver-written files land after the builder's last commit by
# design; CORRECTNESS_LOCAL.md itself is exempt because the postscript
# commit cannot name its own hash; BENCH_SF*.md are scale-run bench
# artifacts written by bench.py.
EXEMPT = re.compile(
    r"^(BENCH_r\d+\.json|CORRECTNESS_r\d+\.json|VERDICT\.md|ADVICE\.md|"
    r"PROGRESS\.jsonl|BENCH_DETAIL\.md|CORRECTNESS_LOCAL\.md|"
    r"BENCH_SF[0-9.]+\.md)$"
)


def parse_block(md_text: str) -> dict | None:
    """The machine block, or None when the artifact predates it.

    Named tokens must be >= 7 hex chars (r10 advice #4): a short or typo'd
    token under the old anything-hex parse, combined with bidirectional
    prefix matching, silently exempted EVERY commit sharing the prefix —
    e.g. a stray ``e`` exempted most of the repo. Short tokens are simply
    not collected (they then can't exempt anything, and the unnamed commit
    they meant to cover fails the check loudly).

    A long token list may WRAP (r11 advice: the old ``re.M`` capture
    stopped at the first newline, silently dropping later tokens —
    commits the postscript DID name then failed the check): continuation
    lines are collected as long as they are indented and contain only hex
    tokens/whitespace; the first non-indented or non-hex line ends the
    list."""
    tree = re.search(r"^Sweep-Tree:\s*([0-9a-f]{7,40})", md_text, re.M)
    status = re.search(r"^Sweep-Status:\s*(final|superseded)", md_text, re.M)
    named = re.search(
        r"^Post-Sweep-Commits:([^\n]*)((?:\n[ \t]+[0-9a-f][0-9a-f \t]*)*)",
        md_text, re.M,
    )
    if not (tree and status):
        return None
    toks = (named.group(1) + named.group(2)).split() if named else []
    return {
        "tree": tree.group(1),
        "status": status.group(1),
        "named": {t for t in toks if re.fullmatch(r"[0-9a-f]{7,40}", t)},
    }


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", "-C", HERE, *args], capture_output=True, text=True, check=True
    ).stdout


def unlisted_commits(block: dict) -> list[str]:
    """Commits after the sweep tree that a ``final`` postscript fails to
    name, excluding driver-artifact-only commits. Empty for
    ``superseded``.

    Named tokens resolve through ``git rev-parse`` prefix matching
    against real objects (r10 advice #4) — a token that names nothing in
    this repo exempts nothing. Merge commits are diffed against their
    FIRST PARENT (``git show`` prints no files for merges, which used to
    land every merge in ``bad`` even when it introduced nothing): the
    first-parent diff is exactly what the merge added to the line of
    history the sweep ran on, so an empty or exempt-only diff is exempt
    like any other commit's."""
    if block["status"] != "final":
        return []
    resolved = set()
    for tok in block["named"]:
        try:
            resolved.add(_git("rev-parse", "--verify", f"{tok}^{{commit}}").strip())
        except subprocess.CalledProcessError:
            continue  # token matches no commit here — can't exempt anything
    log = _git("log", "--format=%H %h", f"{block['tree']}..HEAD").splitlines()
    bad = []
    for line in log:
        full, short = line.split()
        if full in resolved:
            continue
        # first-parent diff covers merge commits too; --root-safe is not
        # needed (a commit inside tree..HEAD always has a parent)
        files = _git("diff", "--name-only", f"{full}^1", full).split("\n")
        files = [f for f in files if f]
        if all(EXEMPT.match(f) for f in files):
            continue
        bad.append(short)
    return bad


def check(md_path: str | None = None) -> list[str]:
    """Violations for the repo's sweep artifact (empty = clean)."""
    md_path = md_path or os.path.join(HERE, "CORRECTNESS_LOCAL.md")
    with open(md_path) as f:
        text = f.read()
    block = parse_block(text)
    if block is None:
        return [
            "CORRECTNESS_LOCAL.md has no machine postscript block "
            "(Sweep-Tree / Sweep-Status / Post-Sweep-Commits)"
        ]
    bad = unlisted_commits(block)
    return [
        f"commit {h} postdates the sweep tree {block['tree']} but is not "
        f"named in Post-Sweep-Commits (and is not a driver-artifact-only "
        f"commit) — name it in the postscript or flip Sweep-Status to "
        f"superseded and re-sweep"
        for h in bad
    ]


if __name__ == "__main__":
    problems = check()
    for p in problems:
        print(f"POSTSCRIPT VIOLATION: {p}")
    sys.exit(1 if problems else 0)
