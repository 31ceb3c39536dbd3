from cati_database_feeder_spark.functions import scalar, text, vectors

__all__ = ["scalar", "text", "vectors"]
