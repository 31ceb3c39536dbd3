"""Partitioned lake sink — the parquet counterpart of the JDBC
keyed-update sink (sinks/jdbc.py): where the reference re-runs a wave
by UPDATE-ing keyed rows in PostgreSQL (add_q5010.py:33-40), a lake
pipeline re-runs a day/wave by REPLACING exactly the partitions the
batch touches and leaving every other partition's files untouched.

That is Spark's dynamic partition overwrite
(`spark.sql.sources.partitionOverwriteMode=dynamic`): `overwrite`
mode deletes only partitions present in the incoming frame. Static
overwrite (the default) would wipe the WHOLE table for a one-day
backfill — the classic production data-loss foot-gun this module
exists to fence off.

Scale notes (100 TB): a daily backfill rewrites one day-partition
regardless of table size; untouched partitions are never read,
listed, or rewritten. `repartition(partition_cols)` before the write
keeps one task per output partition, so a 1000-executor re-run of 3
days emits 3 files, not 3×1000 small files (the
streaming/ingest.py:_bucketed_writer argument applied to the batch
sink).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Explicit allow-list: modes this sink supports, mapped to the
# partitionOverwriteMode the writer must pin PER WRITE (session-level
# config would leak into unrelated writers on the shared session).
_MODES = {"dynamic", "static", "append"}


def write_partitioned(df: DataFrame, path: str, partition_cols,
                      mode: str = "dynamic") -> None:
    """Write ``df`` partitioned by ``partition_cols``.

    - ``dynamic``: overwrite ONLY the partitions present in ``df``
      (idempotent day/wave backfill — re-running the same batch
      converges to the same files).
    - ``static``: overwrite the whole table (initial loads).
    - ``append``: add files to existing partitions (log-style feeds).

    One shuffle on the partition key so each output partition is
    written by one task (file-count hygiene at fleet parallelism).
    """
    if mode not in _MODES:
        raise ValueError(f"mode must be one of {sorted(_MODES)}")
    cols = list(partition_cols)
    writer = df.repartition(*cols).write.partitionBy(*cols)
    if mode == "append":
        writer.mode("append").parquet(path)
        return
    writer.option("partitionOverwriteMode",
                  "dynamic" if mode == "dynamic" else "static") \
          .mode("overwrite").parquet(path)
