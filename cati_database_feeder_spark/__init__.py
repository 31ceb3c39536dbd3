"""cati_database_feeder_spark — a PySpark-native analytics/ETL engine.

Re-expresses the full semantic surface of the reference pipeline
(`tenetko/cati-database-feeder`, see SURVEY.md) as idiomatic Spark
DataFrame/SQL plans, plus the LLM-data-pipeline extension operators
(dedup, similarity search, multimodal columns, text analysis), all
designed for 100 TB scale: declarative plans for Catalyst, broadcast
hints for dimension joins, partial aggregation, no driver-side row
loops, no row-at-a-time Python UDFs in hot paths.
"""

from cati_database_feeder_spark.session import get_session
from cati_database_feeder_spark.catalog import load_tables, TABLES

__all__ = ["get_session", "load_tables", "TABLES"]
