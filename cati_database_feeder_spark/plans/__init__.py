from cati_database_feeder_spark.plans import feeder, backfill

__all__ = ["feeder", "backfill"]
