"""Table catalog: load the canonical parquet tables and register views.

The reference reads one Excel sheet at a time into pandas
(feeder.py:121-122); the engine's canonical storage is parquet on
distributed storage — columnar, splittable, predicate-pushdown-able.
At 100 TB the same ``spark.read.parquet`` call fans out to thousands
of tasks; nothing here is driver-bound.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


# columns stored as TIMESTAMP(NANOS) in parquet, which Spark can only
# read as epoch-nanos longs (session.py nanosAsLong); converted to µs
# timestamps at load — integer div so no double precision loss, and the
# same floor-truncation DuckDB applies when it narrows ns to its native µs
_NANOS_TS_COLS = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one canonical table. Column pruning + filter pushdown are
    Catalyst's job — callers just ``select``/``filter`` declaratively."""
    if name in _NANOS_TS_COLS:
        # Runtime-settable; makes nanos columns arrive as epoch-ns bigints
        # on ANY session, not just ones built by session.get_session.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANOS_TS_COLS.get(name, []):
        if dict(df.dtypes).get(col) == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every canonical table as a dict of DataFrames."""
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register each table as a temp view so plans can be spark.sql too."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
