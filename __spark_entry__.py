"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship feeder pipeline on sf0.001 (smoke).
``queries()`` — one callable per implemented operator (SURVEY.md §2).
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query.

Column-name and value discipline: every computed column is aliased
identically in the Spark plan and the SQL; double aggregates go
through exact DECIMAL summation then a final cast to DOUBLE so both
engines produce bit-identical values regardless of partial-aggregation
order (see cati_database_feeder_spark/operators/aggregates.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cati_database_feeder_spark import queryset


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return queryset.QUERIES["flagship_feeder"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(queryset.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents, keyed like ``queries()``."""
    # the jsonl_scan oracle reads a repo-written fixture file; write it
    # now so the SQL is runnable even if the oracle lane executes
    # before the Spark lane ever ran
    queryset.ensure_jsonl_fixture()
    return dict(queryset.ORACLES)
