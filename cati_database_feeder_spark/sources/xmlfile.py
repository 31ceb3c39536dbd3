"""XML source — Spark 4's native XML reader (the spark-xml package
donated into core), closing the last common legacy-feed format next
to xlsx / CSV / fixed-width / JSONL / ORC: European survey and
telephony vendors still deliver row-per-element XML exports.

The schema is DECLARED, never inferred: inference samples the data
and can type a column differently between file generations (the same
argument as the jsonl declared-schema scan, sources/jsonl.py), and a
pinned schema is what makes the VALUES oracle's types stable. A
missing element inside a row is NULL — the optional-column semantics
the reference's `row.get(...)` feeder path relies on (#19).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

XML_SCHEMA = "id bigint, status string, score double, note string"

# Pinned fixture: Cyrillic payloads, two rows each missing one
# optional element (NULL path), binary-exact double literals.
XML_FIXTURE = """<?xml version="1.0" encoding="UTF-8"?>
<rows>
  <row><id>1</id><status>complete</status><score>4.5</score><note>первый</note></row>
  <row><id>2</id><status>interrupted</status><score>2.25</score></row>
  <row><id>3</id><status>complete</status><score>3.0</score><note>кв. 7, дом 9</note></row>
  <row><id>4</id><status>refused</status><note>plain</note></row>
  <row><id>5</id><status>complete</status><score>4.125</score><note>последний</note></row>
</rows>
"""


def ensure_xml_fixture(path: str) -> str:
    """Write the pinned XML shard if absent or stale — staleness by
    CONTENT (the round-12 jsonl lesson), atomic rename."""
    data = XML_FIXTURE.encode("utf-8")
    if os.path.exists(path):
        try:
            with open(path, "rb") as f:
                if f.read() == data:
                    return path
        except OSError:
            pass
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def read_xml(spark: SparkSession, path: str,
             row_tag: str = "row",
             schema: str = XML_SCHEMA) -> DataFrame:
    """Scan row-per-element XML with the native reader under a
    declared schema. Files split per row-tag boundary on the JVM
    side; like xlsx, a single huge document is one task — the
    canonical pipeline converts to parquet once downstream."""
    return (spark.read.schema(schema).option("rowTag", row_tag)
            .xml(path))
