"""Delimited-text (CSV) source — §2.1 breadth alongside the Excel,
REST, JDBC, JSONL and parquet sources.

The reference ingests tabular survey waves from xlsx workbooks
(/root/reference/feeder.py:119-122); the same operational shape very
often arrives as CSV exports, so the engine carries a first-class CSV
rung with the SAME contract as the JSONL source: declared schema, JVM
parser (splittable scan, whole-stage codegen downstream), PERMISSIVE
quarantine — a malformed cell never kills the batch and never
silently zeroes a row; the raw line is kept verbatim in a corrupt
column for the skipped-rows report (reference feeder semantics:
reject rows are REPORTED, ops #12/#15).

Two non-defaults are pinned here and matter in production:

- ``escape='"'`` — RFC 4180 doubles quotes inside quoted fields;
  Spark's csv default escape is backslash, which would leave
  ``"a ""b"" c"`` raw in the value (empirically probed).
- header handling is by DECLARED schema, never inferSchema: schema
  inference reads the data twice and types drift per shard; a 100 TB
  ingest pins the contract up front (same argument as
  sources/jsonl.py).

The pinned fixture is byte-exact (md5-checked, rewritten on
mismatch — the round-12 ADVICE class): the generator's rows are the
oracle's VALUES, so the correctness gate proves Spark recovered the
values from real CSV bytes, quoting and quarantine included.
"""
from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (DoubleType, IntegerType, LongType,
                               StringType, StructField, StructType)

CORRUPT_COL = "_corrupt_record"

# The fixture: reference-flavored wave report with every CSV hazard a
# real export shows — embedded delimiter, RFC 4180 doubled quotes, a
# bare empty field (NULL), a trailing empty pair, a type-corrupt cell
# (quarantined, not zeroed), and whitespace that quoting preserves.
CSV_FIXTURE = """respondent_code,status,survey_date,quota,score,comment
101,complete,05.03.2024,12,4.5,"plain text"
102,interrupted,06.03.2024,7,3.25,"has, comma"
103,complete,07.03.2024,,2.0,"quoted ""word"" inside"
104,refused,08.03.2024,9,,
105,complete,09.03.2024,not_a_number,1.5,trailing
106,complete,10.03.2024,3,6.75,"  padded  "
"""

CSV_SCHEMA = StructType([
    StructField("respondent_code", LongType()),
    StructField("status", StringType()),
    StructField("survey_date", StringType()),
    StructField("quota", IntegerType()),
    StructField("score", DoubleType()),
    StructField("comment", StringType()),
    StructField(CORRUPT_COL, StringType()),
])


def ensure_csv_fixture(path: str) -> str:
    """Write the pinned shard if absent or content-drifted (md5 of the
    bytes, not the size — a same-length corruption must not survive)."""
    data = CSV_FIXTURE.encode("utf-8")
    want = hashlib.md5(data).hexdigest()
    try:
        with open(path, "rb") as fh:
            if hashlib.md5(fh.read()).hexdigest() == want:
                return path
    except OSError:
        pass
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as fh:
        fh.write(data)
    os.replace(tmp, path)
    return path


def read_csv_report(spark: SparkSession, path: str,
                    schema: StructType = CSV_SCHEMA) -> DataFrame:
    """PERMISSIVE CSV scan under the declared schema. A cell that
    fails its declared type parses the REST of the row normally and
    lands the raw line in ``_corrupt_record`` (never a silent null-out
    of the whole row). Splittable (no multiLine), so a single large
    shard still fans out across tasks; gzip shards parallelize per
    file."""
    return spark.read.csv(
        path, header=True, schema=schema, mode="PERMISSIVE",
        columnNameOfCorruptRecord=CORRUPT_COL, escape='"')
