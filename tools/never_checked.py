"""Machine-derive the never-driver-checked ledger (r12 verdict #2).

The driver's per-round correctness gate checks the first 50 registry
entries and commits the results as ``CORRECTNESS_r{N}.json``. Which
entries have EVER had a driver-green row is therefore a pure function of
the committed artifacts — this tool derives it from ``git show`` so the
ledger can never drift from the evidence the way a hand-maintained
comment can (the r12 judge counted 24 never-checked where the hand
ledger said <=22; the committed artifacts said 24).

Green = rows_match AND schema_match AND hash_match is not False AND no
err — the same bar the driver's gate applies (hash_match is None for
the weaker rows-only check; None never happens for this repo's entries
since every entry is oracle-backed, but the guard keeps the derivation
honest if one ever regresses).

Usage: ``python tools/never_checked.py`` prints the count and the set;
``tests/test_registry.py`` imports :func:`never_checked` as the single
source of truth for the rotation-policy invariants.
"""

from __future__ import annotations

import json
import os
import re
import subprocess

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def committed_green_union(repo: str = HERE) -> set[str]:
    """Union of driver-green entry names across every COMMITTED
    CORRECTNESS_r*.json (HEAD versions — a working-tree file is whatever
    some run left behind, not evidence; same rule as the bench-prior
    miner, r11 verdict #8)."""
    ls = subprocess.run(
        ["git", "-C", repo, "ls-tree", "--name-only", "HEAD"],
        capture_output=True, text=True, check=True,
    ).stdout.split()
    green: set[str] = set()
    for name in ls:
        if not re.fullmatch(r"CORRECTNESS_r\d+\.json", name):
            continue
        blob = subprocess.run(
            ["git", "-C", repo, "show", f"HEAD:{name}"],
            capture_output=True, text=True, check=True,
        ).stdout
        try:
            record = json.loads(blob)
        except json.JSONDecodeError:
            continue  # malformed committed record contributes nothing
        for entry, row in record.items():
            if (
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") is not False
                and not row.get("err")
            ):
                green.add(entry)
    return green


def never_checked(registry_names: list[str], repo: str = HERE) -> list[str]:
    """Registry entries (in registry order) with no committed
    driver-green row in any round."""
    green = committed_green_union(repo)
    return [n for n in registry_names if n not in green]


def drain_prose(registry_names: list[str], repo: str = HERE) -> str:
    """The drain paragraph CORRECTNESS_LOCAL.md embeds, machine-written
    (r13 verdict #3: the r12 hand ledger said <=22 where the artifacts
    said 24, and the r13 hand prose said 'drains 24 -> 17' where the tool
    said 19 — the PROSE itself must come from this tool, pinned by
    tests/test_registry.py::test_ledger_prose_is_machine_written)."""
    never = never_checked(registry_names, repo)
    window = set(registry_names[:50])
    inw = [n for n in never if n in window]
    outw = [n for n in never if n not in window]
    lines = [
        f"Never-driver-checked (machine-derived from the committed "
        f"CORRECTNESS_r*.json by `tools/never_checked.py`): **{len(never)}** "
        f"of {len(registry_names)} registry entries.",
    ]
    if inw:
        lines.append(
            f"In the next driver window ({len(inw)}, drain to "
            f"{len(never) - len(inw)} expected): "
            + ", ".join(f"`{n}`" for n in inw) + "."
        )
    if outw:
        lines.append(
            f"Still queued out-of-window ({len(outw)}): "
            + ", ".join(f"`{n}`" for n in outw) + "."
        )
    if not never:
        lines.append("Queue empty: every registry entry has a committed "
                     "driver-green row.")
    return "\n".join(lines)


def main() -> None:
    import sys

    # same bootstrap the sibling tools use so the documented
    # `python tools/never_checked.py` works without PYTHONPATH
    sys.path.insert(0, HERE)
    from vector_db_api_spark import suite

    names = list(suite.SUITE)
    if "--prose" in sys.argv[1:]:
        print(drain_prose(names))
        return
    never = never_checked(names)
    window = set(names[:50])
    print(f"registry entries: {len(names)}")
    print(f"committed driver-green union: {len(names) - len(never)}")
    print(f"never driver-checked: {len(never)}")
    for n in never:
        marker = "  [IN WINDOW — will be checked next round]" if n in window else ""
        print(f"  {n}{marker}")


if __name__ == "__main__":
    main()
