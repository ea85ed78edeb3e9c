from vector_db_api_spark.functions import hashing, text, vector

__all__ = ["vector", "text", "hashing"]
