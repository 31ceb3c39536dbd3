"""Window-function operators (SURVEY.md §2.6 extension surface).

The reference's nearest relative is the per-file first-row peek
(add_q5011_2t.py:28). The engine exposes proper window analytics; the
headline one is ``first_occurrence_dedup`` — the declarative, in-batch
superset of the reference's cross-batch phone dedup (feeder.py:157-160).

Scale note: a window over ``partitionBy(k)`` shuffles once on k and
sorts within partitions — same cost class as a groupBy on k. Skewed
keys are AQE's problem for joins but NOT for windows, so callers should
pick partition keys with bounded cardinality per key (phone, user_id…),
which all of these do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def first_occurrence_dedup(df: DataFrame, keys: list[str], order: list) -> DataFrame:
    """Keep the first row per key by a deterministic order — the
    within-batch dedup the reference cannot do (SURVEY.md §2.6)."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return (df.withColumn("__rn", F.row_number().over(w))
              .filter(F.col("__rn") == 1).drop("__rn"))


def rank_within_group(df: DataFrame, keys: list[str], order: list,
                      col_name: str = "rn") -> DataFrame:
    """row_number() over an explicit deterministic order."""
    w = Window.partitionBy(*keys).orderBy(*order)
    return df.withColumn(col_name, F.row_number().over(w))


def running_total(df: DataFrame, keys: list[str], order: list, value,
                  col_name: str = "running_total"):
    """Cumulative sum within group (rowsBetween unbounded→current)."""
    w = (Window.partitionBy(*keys).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return df.withColumn(col_name, F.sum(value).over(w))
