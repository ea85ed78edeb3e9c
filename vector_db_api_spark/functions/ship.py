"""Ship model matrices (centroids, hyperplanes, codebooks) to executors.

Every ANN/dedup operator in this repo carries a small dense model — IVF
centroids, LSH hyperplanes, PQ codebooks, SemDeDup cluster centers — into an
Arrow-batched ``mapInPandas``/``applyInPandas`` kernel. Capturing the numpy
array directly in the Python closure re-serializes it into EVERY task: fine
at the test defaults (kilobytes), catastrophic at the scale these operators
exist for (SemDeDup's 50k × 768 float64 centroid matrix ≈ 300 MB shipped
per task — driver egress × tasks, plus per-task deserialization; cf.
semdedup.py's LAION-scale sizing note).

:func:`ship_model` picks the transport:

- below ``min_broadcast_bytes`` (default 1 MiB): plain closure capture — a
  broadcast round-trip would only add latency for single-query paths;
- at or above it: ``sparkContext.broadcast`` — torrent-distributed once per
  executor, dereferenced lazily inside the task via ``.get()``.

The returned handle is transport-agnostic: capture the HANDLE in the UDF
closure and call ``handle.get()`` inside the generator body (executor-side),
never at closure-build time on the driver.

Reference parity note: the reference engine is single-process
(src/vector_db_api/indexing/*.py holds models as plain attributes), so it
has no counterpart decision; this is pure Spark-distribution engineering.
"""

from __future__ import annotations

import numpy as np

#: Matrices at or above this many bytes ride a Spark broadcast; smaller ones
#: stay in the task closure. Tests may monkeypatch this to 0 to force the
#: broadcast path for small models.
DEFAULT_MIN_BROADCAST_BYTES = 1 << 20


class _LocalModel:
    """Closure-captured model: pickles the array into the task closure
    (the right call for models far below the broadcast break-even)."""

    __slots__ = ("_v",)
    is_broadcast = False

    def __init__(self, value: np.ndarray) -> None:
        self._v = value

    def get(self) -> np.ndarray:
        return self._v

    def release(self) -> None:
        """No-op for closure capture (symmetry with _BroadcastModel)."""


class _BroadcastModel:
    """Broadcast-backed model: the closure carries only the broadcast id;
    executors fetch the blob once and every task derefs the local copy.

    Lifecycle (ADVICE r5): broadcasts live on driver + executors until
    destroyed, so a RESIDENT service calling per-query operators must
    ``release()`` the handle once the last job using it finishes —
    otherwise blobs accumulate for the life of the SparkContext. Batch
    jobs can skip it (context teardown reclaims everything)."""

    __slots__ = ("_b",)
    is_broadcast = True

    def __init__(self, bcast) -> None:
        self._b = bcast

    def get(self) -> np.ndarray:
        return self._b.value

    def release(self) -> None:
        """Remove the broadcast blob from driver and executors. Safe to call
        once no in-flight job references the handle; idempotent."""
        try:
            self._b.unpersist(blocking=False)
            self._b.destroy(blocking=False)
        except Exception:  # already destroyed / context gone
            pass


def ship_model(
    session_source,
    arr,
    min_broadcast_bytes: int | None = None,
):
    """Wrap ``arr`` for executor shipping; see module docstring.

    ``session_source`` is anything that leads to a session: a DataFrame, a
    SparkSession, or None (None or a Connect-style session without a
    ``sparkContext`` always yields closure capture — correct, just not
    torrent-distributed).
    """
    a = np.ascontiguousarray(arr)
    if min_broadcast_bytes is None:
        min_broadcast_bytes = DEFAULT_MIN_BROADCAST_BYTES
    if a.nbytes < min_broadcast_bytes or session_source is None:
        return _LocalModel(a)
    spark = getattr(session_source, "sparkSession", session_source)
    try:
        sc = spark.sparkContext
    except Exception:  # Spark Connect etc. — fall back to closure capture
        return _LocalModel(a)
    return _BroadcastModel(sc.broadcast(a))
