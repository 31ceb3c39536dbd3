"""ORC source — the second columnar lake format next to parquet.

Spark ships a native vectorized ORC reader/writer (no extra package),
and long-lived Hadoop estates hold years of ORC history that a
migration to this engine must scan in place — the same "read the
lake as it is" argument as the schema-evolution parquet scan (E125).

The fixture is written BY Spark's own ORC writer at first use (ORC
bytes are not reproducible byte-for-byte across writer versions, so
unlike the xlsx/jsonl fixtures the freshness contract is a marker
file carrying a hash of the pinned ROWS, not of the bytes): the
oracle replays the same pinned rows as VALUES, so the registered scan
proves Spark recovers every typed value — bigint, Cyrillic varchar,
binary-exact doubles, booleans, NULLs — from real ORC bytes through
the real vectorized reader.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession

# Pinned rows: (id, region, amount, active, note). Doubles are
# binary-exact decimals so the VALUES oracle matches bit-for-bit;
# note exercises Cyrillic and NULL; active exercises booleans.
ORC_ROWS = [
    (1, "north", 10.5, True, "первый"),
    (2, "south", 0.25, False, None),
    (3, "north", 3.75, True, "кв. 12"),
    (4, "east", 100.0, False, "plain"),
    (5, "west", 2.5, True, "дом 9, стр. 2"),
    (6, "south", 0.125, True, None),
    (7, "east", 55.5, False, "последний"),
]

ORC_SCHEMA = ("id bigint, region string, amount double, "
              "active boolean, note string")


def _rows_hash() -> str:
    return hashlib.md5(repr(ORC_ROWS).encode("utf-8")).hexdigest()


def ensure_orc_fixture(spark: SparkSession, dirpath: str) -> str:
    """Write the pinned rows as a real ORC file if absent or stale.

    Staleness = the marker file's row-hash differs from the current
    pinned rows (editing ORC_ROWS invalidates the on-disk fixture —
    the round-12 jsonl content-check lesson, adapted to a binary
    format whose bytes are writer-version-dependent)."""
    marker = os.path.join(dirpath, "_ROWS_MD5")
    want = _rows_hash()
    try:
        with open(marker, "r", encoding="ascii") as f:
            if f.read().strip() == want and any(
                    n.endswith(".orc") for n in os.listdir(dirpath)):
                return dirpath
    except OSError:
        pass
    from cati_database_feeder_spark.session import local_frame
    df = local_frame(spark, ORC_ROWS, ORC_SCHEMA)
    df.write.mode("overwrite").orc(dirpath)
    with open(marker, "w", encoding="ascii") as f:
        f.write(want + "\n")
    return dirpath


def read_orc(spark: SparkSession, dirpath: str) -> DataFrame:
    """Scan the ORC dir with the native vectorized reader. Schema
    comes from the ORC footer; filters and column pruning push into
    the scan exactly as for parquet (same DataSource V1/V2 path)."""
    return spark.read.orc(dirpath)
