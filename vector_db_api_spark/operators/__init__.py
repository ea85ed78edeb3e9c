from vector_db_api_spark.operators import dedup, ivf, knn, lsh, topk

__all__ = ["knn", "lsh", "ivf", "topk", "dedup"]
