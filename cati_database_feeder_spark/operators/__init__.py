from cati_database_feeder_spark.operators import aggregates, joins, windows, dedup, similarity

__all__ = ["aggregates", "joins", "windows", "dedup", "similarity"]
