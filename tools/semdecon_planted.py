"""Planted-paraphrase recall for cell-blocked semantic decontamination
(r14 verdict #6).

The blocked kernel's nprobe curve was measured on synthetic clustered /
near-orthogonal geometry; the regime its docstring names as risky is "low
thresholds over diffuse geometry" — real text embeddings where a
contaminated pair sits barely above the threshold. This drill makes that
regime concrete with KNOWN ground truth:

- take N real testdata docs; for each, plant ONE paraphrase by replacing a
  seeded fraction r of its words with unrelated tokens (md5-derived, no
  shared character n-grams) — r cycles through STRENGTHS per doc, so the
  planted pairs' cosines span from near-dup (~0.95) down to around the
  registry threshold;
- embed BOTH sides with the repo's lexical hashed-ngram embedder
  (operators/embed.py — the designed-in stand-in for the reference's
  external embedding model);
- ground truth = the EXACT kernel's pair set at the registry threshold
  (semantic_contamination_pairs_np); recall = the fraction of
  exact-found PLANTED pairs the blocked kernel also finds, per nprobe,
  with centroids k-means-trained on the corpus side (K=32, the registry
  K) — the production configuration, not the synthetic fixed hyperplanes.

Prints a BENCH_SCALE.md-ready section; tests/test_decontam_repetition.py
pins the >=0.9 bar at the registry nprobe the way LSH/IVF pin their
recall floors.

Usage: python tools/semdecon_planted.py [sf_dir] [n_docs]
"""

from __future__ import annotations

import hashlib
import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import numpy as np  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402

STRENGTHS = (0.1, 0.3, 0.5, 0.7)  # word-replacement fraction, cycled by doc


def _u(doc_id: int, i: int) -> float:
    """Deterministic uniform in [0,1) for (doc, word-position)."""
    h = hashlib.md5(f"{doc_id}|{i}|plant".encode()).hexdigest()[:8]
    return int(h, 16) / 0xFFFFFFFF


def paraphrase(text: str, doc_id: int, strength: float) -> str:
    """Replace ~strength of the words with unrelated md5 tokens (prefix
    'zz' + hex — shares no character n-gram with real words), seeded by
    (doc_id, position) so both engines and reruns agree."""
    words = text.split()
    out = []
    for i, w in enumerate(words):
        if _u(doc_id, i) < strength:
            out.append("zz" + hashlib.md5(
                f"{doc_id}|{i}|{w}".encode()).hexdigest()[:6])
        else:
            out.append(w)
    return " ".join(out)


def planted_frames(spark, sf_dir: str, n_docs: int):
    """(train_df, bench_df, strength_by_id): originals vs planted
    paraphrases, embedded with the hashed-ngram embedder (dim 64)."""
    from vector_db_api_spark.operators.embed import (
        embed_texts,
        hashed_ngram_embedder,
    )
    from vector_db_api_spark.sources.tables import load_table

    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text").orderBy("doc_id").limit(n_docs)
    )
    rows = docs.collect()
    strength_by_id = {
        r["doc_id"]: STRENGTHS[i % len(STRENGTHS)]
        for i, r in enumerate(rows)
    }
    para_rows = [
        (r["doc_id"], paraphrase(r["text"], r["doc_id"],
                                 strength_by_id[r["doc_id"]]))
        for r in rows
    ]
    para = spark.createDataFrame(para_rows, "bench_id bigint, text string")
    fn = hashed_ngram_embedder(64)
    train = embed_texts(docs, model_fn=fn, dim=64).repartition(8)
    bench = embed_texts(para, model_fn=fn, dim=64,
                        id_col="bench_id").repartition(8)
    return train, bench, strength_by_id


def measure(spark, sf_dir: str, n_docs: int, nprobes=(2, 4, 6, 8),
            num_centroids: int = 32, threshold: float | None = None):
    """{'threshold', 'exact_pairs', 'planted_in_exact', 'per_strength',
    'rows': [(nprobe, recall_planted, recall_all, per-strength dict)]}."""
    from vector_db_api_spark.operators.decontaminate import (
        semantic_contamination_pairs_blocked_np,
        semantic_contamination_pairs_np,
    )
    from vector_db_api_spark.operators.ivf import IVFIndex
    from vector_db_api_spark.suite import SEMDECON_THRESHOLD

    thr = SEMDECON_THRESHOLD if threshold is None else threshold
    train, bench, strength_by_id = planted_frames(spark, sf_dir, n_docs)
    train = train.localCheckpoint(eager=True)
    bench = bench.localCheckpoint(eager=True)

    exact = {
        (r["doc_id"], r["bench_id"])
        for r in semantic_contamination_pairs_np(
            train, bench, thr, id_col="doc_id",
        ).collect()
    }
    planted = {(d, d) for d in strength_by_id}
    planted_exact = exact & planted
    per_strength_denom: dict[float, int] = {s: 0 for s in STRENGTHS}
    for d, _ in planted_exact:
        per_strength_denom[strength_by_id[d]] += 1

    cents = IVFIndex.train(
        train, num_centroids=num_centroids, vec_col="embedding", seed=7,
    ).centroids

    rows = []
    for p in nprobes:
        blocked = {
            (r["doc_id"], r["bench_id"])
            for r in semantic_contamination_pairs_blocked_np(
                train, bench, thr, cents, nprobe=p, id_col="doc_id",
            ).collect()
        }
        assert blocked <= exact, "blocked must be a subset of exact"
        hit_planted = blocked & planted_exact
        per_strength = {}
        for s in STRENGTHS:
            num = sum(1 for d, _ in hit_planted if strength_by_id[d] == s)
            den = per_strength_denom[s]
            per_strength[s] = (num / den) if den else None
        rows.append((
            p,
            len(hit_planted) / len(planted_exact) if planted_exact else None,
            len(blocked & exact) / len(exact) if exact else None,
            per_strength,
        ))
    return {
        "threshold": thr,
        "exact_pairs": len(exact),
        "planted_in_exact": len(planted_exact),
        "planted_total": len(planted),
        "per_strength_denom": per_strength_denom,
        "rows": rows,
    }


def main() -> None:
    from vector_db_api_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    spark = get_spark("semdecon-planted")
    m = measure(spark, sf_dir, n_docs)
    lines = [
        f"\n### Blocked-decon recall on PLANTED paraphrases "
        f"({sf_dir}, {n_docs} docs — tools/semdecon_planted.py)\n",
        f"Planted pairs: {m['planted_total']} (one per doc, replacement "
        f"strengths {STRENGTHS} cycled); exact kernel finds "
        f"{m['planted_in_exact']} of them at the registry threshold "
        f"{m['threshold']} (total exact pairs {m['exact_pairs']}); "
        f"per-strength denominators "
        f"{ {s: d for s, d in m['per_strength_denom'].items()} }. "
        f"Centroids: k-means K=32 on the corpus side (production config).\n",
        "| nprobe | planted recall | all-pair recall | " +
        " | ".join(f"r={s}" for s in STRENGTHS) + " |",
        "|---|---|---|" + "---|" * len(STRENGTHS),
    ]
    for p, rp, ra, per in m["rows"]:
        cells = " | ".join(
            "n/a" if per[s] is None else f"{per[s]:.3f}" for s in STRENGTHS
        )
        lines.append(
            f"| {p} | {rp:.3f} | {ra:.3f} | {cells} |"
        )
    print("\n".join(lines))
    with open("/tmp/semdecon_planted_section.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\nwritten: /tmp/semdecon_planted_section.md")
    spark.stop()


if __name__ == "__main__":
    main()
