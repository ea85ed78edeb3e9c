"""Deterministic clustered vector corpus — the geometry ANN indexes exist for.

The driver's synthetic ``embeddings`` table is isotropic Gaussian (measured:
nearest-neighbor cosine ≈ 0.41, within-label mean cosine ≈ 0.0), which is the
information-theoretic worst case for any LSH/IVF scheme: neighbors are barely
closer than random vectors, so high recall at a small candidate fraction is
unavailable no matter the parameters. Real embedding corpora are clustered —
that is the regime where an ANN index pays for itself. This module generates
a clustered corpus of arbitrary size so the bench and the recall tests can
measure the ANN paths in their intended regime at the SAME scale as the
isotropic corpus, alongside (not instead of) the honest isotropic numbers.

Generation is per-row deterministic: row ``i`` is derived from
``default_rng([seed, i])`` and its cluster center from
``default_rng([seed, n_clusters, cluster_id])``, so ANY partitioning of the
``spark.range`` produces identical vectors — the generator is safe to run
distributed at any scale (100 TB of synthetic vectors is an
embarrassingly-parallel range scan, no driver materialization, no shuffle).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession


def clustered_corpus(
    spark: SparkSession,
    n_rows: int,
    dim: int = 64,
    n_clusters: int = 16,
    spread: float = 0.25,
    seed: int = 7,
    num_partitions: int | None = None,
) -> DataFrame:
    """(id bigint, embedding array<float>, label int) with ``n_clusters``
    unit-norm centers and members center + spread·noise (then re-normalized).

    ``spread`` sets the within-cluster tightness: at 0.25 the within-cluster
    cosine is ≈ 0.94 and cross-cluster ≈ 0 — comfortably separated, the shape
    of a real embedding space with topical structure.
    """
    rng = np.random.default_rng([seed, n_clusters])
    centers = rng.standard_normal((n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["id"].to_numpy()
            labels = (ids % n_clusters).astype(np.int64)
            out = np.empty((len(ids), dim), dtype=np.float64)
            for j, i in enumerate(ids):
                noise = np.random.default_rng([seed, int(i)]).standard_normal(dim)
                out[j] = centers[labels[j]] + spread * noise
            out /= np.linalg.norm(out, axis=1, keepdims=True)
            yield pd.DataFrame(
                {
                    "id": ids,
                    "embedding": [row.astype(np.float32).tolist() for row in out],
                    "label": labels,
                }
            )

    rng_range = spark.range(n_rows, numPartitions=num_partitions)
    return rng_range.mapInPandas(
        gen, schema="id bigint, embedding array<float>, label int"
    )
