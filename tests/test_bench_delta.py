"""bench.py's round-over-round delta miner against REAL driver records.

The driver's BENCH_r{N}.json wraps a truncated stdout tail; the miner must
recover per-query warm times from (a) the tail's last line (the compact
headline bench.py prints last) and (b) the truncated detail fragment —
and tolerate malformed or non-dict records without crashing the bench.
No Spark needed: pure parsing.
"""

from __future__ import annotations

import json
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_delta_fn():
    src = open(os.path.join(HERE, "bench.py")).read()
    ns = {"__name__": "bench_under_test", "__file__": os.path.join(HERE, "bench.py")}
    exec(src.split("def main")[0], ns)
    return ns["_round_over_round_delta"]


def test_mines_real_driver_records():
    fn = _load_delta_fn()
    # timings resembling a current run, overlapping the r4 record's queries
    out = fn(HERE, {"doc_bm25": 1.0, "events_hourly": 0.3, "crud_upsert": 0.7})
    if not os.path.exists(os.path.join(HERE, "BENCH_r04.json")):
        return  # artifact layout changed; nothing to mine
    assert "Round-over-round delta" in out
    assert "doc_bm25" in out and "| r" in out
    assert "Median ratio" in out


def test_tolerates_malformed_and_nondict_records(tmp_path):
    fn = _load_delta_fn()
    (tmp_path / "BENCH_r01.json").write_text("[1, 2, 3]")       # valid, non-dict
    (tmp_path / "BENCH_r02.json").write_text("{not json")        # invalid
    (tmp_path / "BENCH_r03.json").write_text("null")             # valid, non-dict
    assert fn(str(tmp_path), {"q": 1.0}) == ""  # no priors, no crash


def test_mines_tail_headline_and_detail_fragment(tmp_path):
    fn = _load_delta_fn()
    detail_frag = '"doc_x": 2.5, "doc_y": 1.25}, "recall_at_10": {"doc_x": 0.4}'
    headline = json.dumps(
        {"metric": "suite_wall_sec", "value": 9.9, "queries": {"doc_z": 0.5}}
    )
    rec = {"n": 1, "rc": 0, "tail": detail_frag + "\n" + headline}
    (tmp_path / "BENCH_r01.json").write_text(json.dumps(rec))
    out = fn(str(tmp_path), {"doc_x": 5.0, "doc_z": 0.5, "unknown": 1.0})
    # detail fragment mined up to its closing brace; recall dict NOT mined
    assert "| doc_x | 5.00 | 2.50 | r1 | 2.00x |" in out
    assert "| doc_z | 0.50 | 0.50 | r1 | 1.00x |" in out
    assert "unknown" not in out
