from vector_db_api_spark.functions import hashing, ship, text, vector

__all__ = ["vector", "text", "hashing", "ship"]
