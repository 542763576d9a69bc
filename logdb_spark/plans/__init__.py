from logdb_spark.plans.session import configure, get_spark

__all__ = ["configure", "get_spark"]
