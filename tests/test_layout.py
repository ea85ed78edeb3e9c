"""Z-order layout: interleave correctness, clustering benefit, oracle replay."""

from __future__ import annotations

import glob

import pytest

from pyspark.sql import functions as F

from vector_db_api_spark.operators import layout as L


def _py_interleave(vals, bits):
    out = 0
    for i, v in enumerate(vals):
        for j in range(bits):
            out += ((v >> j) & 1) << (j * len(vals) + i)
    return out


def test_interleave_matches_python(spark):
    rows = [(5, 9), (0, 0), (255, 1), (170, 85)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = [
        r["z"]
        for r in df.select(
            L.interleave_bits([F.col("a"), F.col("b")], bits=8).alias("z")
        ).collect()
    ]
    assert got == [_py_interleave(v, 8) for v in rows]


def test_interleave_preserves_locality_order(spark):
    # z of (k, k) grows with k: diagonal points keep their order
    df = spark.createDataFrame([(k, k) for k in range(64)], "a long, b long")
    zs = [
        r["z"]
        for r in df.select(
            "a", L.interleave_bits([F.col("a"), F.col("b")], bits=8).alias("z")
        ).orderBy("a").collect()
    ]
    assert zs == sorted(zs)


def test_write_zordered_clusters_both_dims(spark, tmp_path):
    from vector_db_api_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "user_id", "ts", "value"
    )
    path = str(tmp_path / "zev")
    L.write_zordered(ev, path, ["user_id", "ts"], bits=8, num_files=16)
    files = sorted(glob.glob(path + "/part-*.parquet"))
    assert len(files) > 4
    # per-file spans: a z-ordered layout keeps each file's user_id AND ts
    # ranges far narrower than the global range (a single-column sort
    # would cluster one dim and leave the other at ~full width per file)
    import pyarrow.parquet as pq

    gl_u_min = gl_u_max = None
    spans_u, spans_t = [], []
    for f in files:
        t = pq.read_table(f, columns=["user_id", "ts"])
        u = t.column("user_id").to_pylist()
        ts = t.column("ts").to_pylist()
        spans_u.append(max(u) - min(u))
        spans_t.append(max(ts) - min(ts))
        gl_u_min = min(u) if gl_u_min is None else min(gl_u_min, min(u))
        gl_u_max = max(u) if gl_u_max is None else max(gl_u_max, max(u))
    global_u = gl_u_max - gl_u_min
    # average per-file user span well under the global span
    assert sum(spans_u) / len(spans_u) < 0.6 * global_u
    # and the rows still all arrive
    assert spark.read.parquet(path).count() == ev.count()


def test_zorder_value_deterministic_with_tiebreak(spark):
    df = spark.createDataFrame(
        [(i, i % 7, i * 3 % 11) for i in range(200)], "id long, a long, b long"
    )
    z1 = sorted(
        (r["id"], r["zvalue"])
        for r in L.zorder_value(df, ["a", "b"], bits=4, tiebreak="id").collect()
    )
    z2 = sorted(
        (r["id"], r["zvalue"])
        for r in L.zorder_value(df, ["a", "b"], bits=4, tiebreak="id").collect()
    )
    assert z1 == z2
