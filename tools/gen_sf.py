"""Generate a schema-faithful synthetic sf dir for LOCAL sweeps above the
driver-provided scales (r9 verdict #2: put measured numbers behind the sf1
scale claims).

Mirrors /root/testdata/sf0.1's schemas, key ranges, and value shapes
(inspected, not copied): TPC-H-ish star tables + events + documents +
embeddings, scaled linearly from the sf0.1 row counts. The data is NOT the
driver's (its generator is private to the driver); correctness sweeps
compare Spark against DuckDB over the SAME files, so any schema-faithful
corpus exercises the identical code paths — and bench numbers at sf1 are
comparable to sf0.1 runs over the driver data because both measure the
same plans over 10x the rows.

Usage: python tools/gen_sf.py <sf> <out_dir>   (e.g. 1 /tmp/sf1)
Deterministic: seed 42. Timestamps are written as parquet micros
(sources/tables.py handles micros and the driver's nanos identically).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "batch part spark line column order small sort fast value scan hash "
    "slow group query table vector agg filter customer stream key the "
    "window join a merge big row data"
).split()
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
PTYPES = ["LARGE", "STANDARD", "MEDIUM", "PROMO", "SMALL", "ECONOMY"]
PADJ = ["large", "hot", "blue", "red", "small", "green", "dark", "light"]
PNOUN = ["ring", "bolt", "case", "drum", "wheel", "plate", "cable", "tube"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "zh", "fr", "es", "de"]


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out_dir, f"{name}.parquet"))
    print(f"{name}: {table.num_rows} rows")


def _ts(days_start: str, days_span_days: float, frac: np.ndarray) -> pa.Array:
    base = np.datetime64(days_start, "us").astype("int64")
    span = int(days_span_days * 86400 * 1_000_000)
    return pa.array((base + (frac * span).astype("int64")).astype(
        "datetime64[us]"))


def main(sf: float, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)
    n_user = int(15_000 * sf)

    _write(out_dir, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out_dir, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    _write(out_dir, "customer", pa.table({
        "c_custkey": np.arange(n_cust, dtype="int64"),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-999, 9999, n_cust), 2),
        "c_mktsegment": pa.array(np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]),
    }))
    _write(out_dir, "supplier", pa.table({
        "s_suppkey": np.arange(n_supp, dtype="int64"),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-999, 9999, n_supp), 2),
    }))
    _write(out_dir, "part", pa.table({
        "p_partkey": np.arange(n_part, dtype="int64"),
        "p_name": [f"{PADJ[i % 8]} {PNOUN[(i // 8) % 8]}"
                   for i in rng.integers(0, 64, n_part)],
        "p_brand": [f"Brand#{i}" for i in rng.integers(1, 26, n_part)],
        "p_type": pa.array(np.array(PTYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(900.0 + np.arange(n_part) * 0.1, 2),
    }))
    _write(out_dir, "orders", pa.table({
        "o_orderkey": np.arange(n_ord, dtype="int64"),
        "o_custkey": rng.integers(0, n_cust, n_ord),
        "o_orderstatus": pa.array(np.array(["O", "F", "P"])[
            rng.integers(0, 3, n_ord)]),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": _ts("1995-01-01", 2404,
                           rng.integers(0, 2404, n_ord) / 2404.0),
        "o_orderpriority": pa.array(np.array(PRIORITIES)[
            rng.integers(0, 5, n_ord)]),
    }))
    # ~4 lines per order, 1..7 each
    lines_per = rng.integers(1, 8, n_ord)
    okey = np.repeat(np.arange(n_ord, dtype="int64"), lines_per)
    n_li = len(okey)
    lnum = np.concatenate([np.arange(1, c + 1) for c in lines_per])
    _write(out_dir, "lineitem", pa.table({
        "l_orderkey": okey,
        "l_partkey": rng.integers(0, n_part, n_li),
        "l_suppkey": rng.integers(0, n_supp, n_li),
        "l_linenumber": pa.array(lnum, pa.int32()),
        "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
        "l_extendedprice": np.round(rng.uniform(1000, 100_000, n_li), 2),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": pa.array(np.array(["A", "N", "R"])[
            rng.integers(0, 3, n_li)]),
        "l_linestatus": pa.array(np.array(["O", "F"])[
            rng.integers(0, 2, n_li)]),
        "l_shipdate": _ts("1995-01-01", 2404,
                          rng.integers(0, 2404, n_li) / 2404.0),
    }))
    ts_frac = np.sort(rng.uniform(0, 1, n_ev))
    _write(out_dir, "events", pa.table({
        "event_id": np.arange(n_ev, dtype="int64"),
        "ts": _ts("2024-01-01", 30, ts_frac),
        "user_id": rng.integers(0, n_user, n_ev),
        "event_type": pa.array(np.array(EVENT_TYPES)[
            rng.integers(0, 5, n_ev)]),
        "value": np.round(np.minimum(rng.exponential(50.0, n_ev), 560.21), 2),
        "props": [json.dumps({"k": int(k)})
                  for k in rng.integers(0, 100, n_ev)],
    }))
    # documents: tech-vocab word soup (the sf0.1 shape), 20 sources, the
    # five language labels, a sprinkle of exact and near duplicates
    word_idx = rng.integers(0, len(VOCAB), (n_doc, 100))
    n_words = rng.integers(8, 101, n_doc)
    n_words[:10] = 100  # suite queries slice doc 1's text — keep it long
    texts = [
        " ".join(VOCAB[j] for j in word_idx[i, :n_words[i]])
        for i in range(n_doc)
    ]
    dup_src = rng.integers(0, n_doc, max(2, n_doc // 500))
    for t, s in enumerate(dup_src):
        tgt = (int(s) + 7919) % n_doc
        if tgt > 10:
            texts[tgt] = texts[s]  # exact duplicate
    near_src = rng.integers(0, n_doc, max(2, n_doc // 500))
    for s in near_src:
        tgt = (int(s) + 104729) % n_doc
        if tgt > 10 and len(texts[s]) > 40:
            texts[tgt] = texts[s] + " extra"  # near duplicate
    _write(out_dir, "documents", pa.table({
        "doc_id": np.arange(n_doc, dtype="int64"),
        "text": texts,
        "lang": pa.array(np.array(LANGS)[np.minimum(
            rng.integers(0, 12, n_doc), 4)]),  # en-heavy like sf0.1
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": np.array([len(t) for t in texts], dtype="int64"),
    }))
    # embeddings: 10 labeled clusters on the 64-dim sphere + noise, float32
    centers = rng.standard_normal((10, 64))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, 10, n_emb)
    mat = (0.2 * centers[labels]
           + 0.12 * rng.standard_normal((n_emb, 64))).astype("float32")
    _write(out_dir, "embeddings", pa.table({
        "vec_id": np.arange(n_emb, dtype="int64"),
        "embedding": pa.array(list(mat), pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    }))


if __name__ == "__main__":
    main(float(sys.argv[1]), sys.argv[2])
