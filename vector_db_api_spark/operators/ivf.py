"""IVF (inverted-file) ANN index: k-means centroids + posting lists.

Spark re-expression of the reference IVFIndex
(src/vector_db_api/indexing/ivf.py:13-201): train k centroids with
spherical k-means (normalized means, max-dot assignment), keep an
assignment (posting) table, search by probing the nprobe nearest centroids
and exact-re-ranking their postings.

Scale design:
- Training uses MLlib ``KMeans(distanceMeasure="cosine")`` — the built-in
  distributed Lloyd's with map-side partial aggregation; the reference's
  hand-rolled 20-iteration loop (ivf.py:133-189) is exactly what MLlib
  already does, so we don't re-implement it.
- The centroid table is tiny (k ≤ a few thousand × d) → collected to the
  driver / broadcast; top-nprobe selection is a driver-side numpy argpartition
  (the reference scores centroids linearly per query too, ivf.py:101-104).
- The assignment table (id, centroid_id) is the posting list; persisted
  partitioned by ``centroid_id`` the nprobe probe becomes partition pruning —
  only nprobe/k of the corpus bytes are read at 100 TB.
- Re-rank: exact scoring of candidates (semi-join), TakeOrderedAndProject.

Deliberate deviations from the reference (SURVEY.md §2.10):
- re-rank ALL nprobe candidates (ivf.py:112-115 truncates to k in arbitrary
  set order before scoring — a recall bug);
- untrained index falls back to exact full scan (parity: ivf.py:96-99).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vector_db_api_spark.operators.knn import knn

DEFAULT_NUM_CENTROIDS = 64   # registry.py:51-54 defaults
DEFAULT_NPROBE = 4


class IVFIndex:
    """Trained IVF model: normalized centroid matrix + assignment table."""

    def __init__(self, centroids: np.ndarray, nprobe: int = DEFAULT_NPROBE) -> None:
        norms = np.linalg.norm(centroids, axis=1, keepdims=True)
        self.centroids = centroids / np.where(norms == 0, 1.0, norms)
        self.nprobe = nprobe

    # -- training ----------------------------------------------------------

    @classmethod
    def train(
        cls,
        corpus: DataFrame,
        num_centroids: int = DEFAULT_NUM_CENTROIDS,
        nprobe: int = DEFAULT_NPROBE,
        vec_col: str = "embedding",
        seed: int = 42,
        max_iter: int = 20,
    ) -> "IVFIndex":
        """Spherical k-means via MLlib (distributed, seeded, deterministic).

        max_iter=20 mirrors the reference constant IVF_KMEAN_ITERS
        (ivf.py:10). Zero vectors are excluded (ivf.py:41-43).
        """
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        vecs = (
            corpus.filter(F.col(vec_col).isNotNull())
            .select(F.col(vec_col).alias("__arr"))
            .withColumn("__nrm", F.sqrt(F.aggregate(
                F.transform("__arr", lambda x: x.cast("double") * x.cast("double")),
                F.lit(0.0), lambda a, x: a + x)))
            .filter(F.col("__nrm") > 0)
            .select(array_to_vector(F.col("__arr")).alias("features"))
        )
        # Clamp k without a full corpus scan: limit(k).count() stops after
        # finding num_centroids rows, so this never double-scans at 100 TB.
        n = vecs.limit(num_centroids).count()
        k = max(1, min(num_centroids, n))
        model = KMeans(
            k=k, seed=seed, maxIter=max_iter, distanceMeasure="cosine"
        ).fit(vecs)
        return cls(np.asarray(model.clusterCenters(), dtype=np.float64), nprobe=nprobe)

    # -- assignment (posting lists) ----------------------------------------

    def assign(
        self, corpus: DataFrame, id_col: str = "id", vec_col: str = "embedding"
    ) -> DataFrame:
        """(id, centroid_id) posting table: nearest centroid by dot product
        on normalized vectors (== cosine). Broadcast the centroid matrix into
        an Arrow-batched numpy matmul; incremental adds reuse this on the
        delta only (ivf.py:40-49 semantics)."""
        from collections.abc import Iterator

        import pandas as pd

        cent = self.centroids
        # Match the corpus id type exactly so downstream semi-joins never
        # implicitly coerce (string=bigint loses precision on large int64).
        id_type = corpus.schema[id_col].dataType.simpleString()
        out_schema = f"{id_col} {id_type}, centroid_id int"

        def assign_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if pdf.empty:
                    continue
                mat = np.asarray(pdf[vec_col].tolist(), dtype=np.float64)
                norms = np.linalg.norm(mat, axis=1)
                keep = norms > 0
                if not keep.any():
                    continue
                unit = mat[keep] / norms[keep, None]
                best = (unit @ cent.T).argmax(axis=1).astype(np.int32)
                yield pd.DataFrame(
                    {id_col: pdf[id_col].to_numpy()[keep], "centroid_id": best}
                )

        return corpus.filter(F.col(vec_col).isNotNull()).mapInPandas(
            assign_batches, schema=out_schema
        )

    # -- search --------------------------------------------------------------

    def probe_centroids(self, query_vec: Sequence[float]) -> list[int]:
        """Top-nprobe centroid ids by dot with the normalized query
        (driver-side; the centroid table is tiny by construction)."""
        q = np.asarray(query_vec, dtype=np.float64)
        qn = np.linalg.norm(q)
        if qn == 0:
            return []  # zero query → empty (ivf.py:92-93)
        scores = self.centroids @ (q / qn)
        nprobe = min(self.nprobe, len(scores))
        idx = np.argpartition(-scores, nprobe - 1)[:nprobe] if nprobe < len(scores) else np.arange(len(scores))
        return [int(i) for i in idx[np.argsort(-scores[idx], kind="stable")]]

    def search(
        self,
        corpus: DataFrame,
        assignments: DataFrame,
        query_vec: Sequence[float],
        k: int,
        metric: str = "cosine",
        id_col: str = "id",
        vec_col: str = "embedding",
    ) -> DataFrame:
        """ANN top-k: nprobe centroid filter (partition-prunable) → semi-join
        → exact re-rank of ALL candidates."""
        probe = self.probe_centroids(query_vec)
        if not probe:
            id_type = corpus.schema[id_col].dataType.simpleString()
            return corpus.sparkSession.createDataFrame([], f"{id_col} {id_type}, score double")
        cand = assignments.filter(F.col("centroid_id").isin(probe)).select(id_col)
        hydrated = corpus.join(cand, id_col, "left_semi")
        return knn(hydrated, query_vec, k, metric=metric, id_col=id_col, vec_col=vec_col)
