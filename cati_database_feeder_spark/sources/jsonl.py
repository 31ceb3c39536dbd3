"""JSON-lines source with schema enforcement and corrupt-record
accounting (extension E114).

A 100 TB text corpus almost always ARRIVES as JSONL (one document
object per line, gzip-sharded); the two production concerns a naive
``spark.read.json`` misses are (1) schema drift — inference samples
the data and silently changes types between drops, so the schema must
be DECLARED — and (2) corrupt lines, which at crawl scale are a
guaranteed fraction and must be counted and quarantined, never
silently dropped. Both engines of this repo read the same parquet
fixtures, so this source is gated by pytest on written-to-disk JSONL
(tests/test_sources.py), the same lane as the Excel/REST sources.

Scale shape: line-delimited JSON splits by newline, so a plain
(non-gzip) shard parallelizes within the file; gzip shards
parallelize per file — the loader takes globs and at production
cadence the shard count, not the file size, sets parallelism. Parsing
is JVM-side Jackson (no Python in the path)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(spark: SparkSession, path, schema: StructType,
               persist: bool = True) -> DataFrame:
    """Read JSONL under a DECLARED schema in PERMISSIVE mode, keeping
    the raw text of unparseable lines in :data:`CORRUPT_COL`. The
    frame is persisted by default: Spark refuses a filter that
    references ONLY the internal corrupt-record column on a lazy scan
    (it could not prove the other columns need parsing), and the two
    consumers below each filter on it — one materialization serves
    both."""
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(
            f"schema already contains {CORRUPT_COL!r} — pass the "
            f"payload schema only; the corrupt column is appended here")
    # build a COPY — StructType.add mutates in place and returns self,
    # which would poison a caller-held schema reused across shard
    # batches (the second call would see the corrupt column already
    # present and refuse)
    full = StructType(list(schema.fields)
                      + [StructField(CORRUPT_COL, StringType())])
    df = (spark.read.schema(full)
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", CORRUPT_COL)
          .json(path))
    return df.persist() if persist else df


def jsonl_good_rows(raw: DataFrame) -> DataFrame:
    """Rows that parsed under the declared schema, corrupt column
    dropped."""
    return raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)


def jsonl_quarantine(raw: DataFrame) -> DataFrame:
    """The corrupt lines, verbatim — the quarantine table a pipeline
    writes next to the ingest so bad shards are diagnosable (and
    re-playable after an upstream fix) instead of silently missing."""
    return (raw.filter(F.col(CORRUPT_COL).isNotNull())
            .select(F.col(CORRUPT_COL).alias("raw_line")))


def jsonl_scan_report(raw: DataFrame) -> dict:
    """One-pass ingest accounting: {'good': n, 'corrupt': n} — the
    numbers an ingest job logs per shard batch."""
    row = raw.agg(
        F.sum(F.col(CORRUPT_COL).isNull().cast("long")).alias("good"),
        F.sum(F.col(CORRUPT_COL).isNotNull().cast("long")).alias("bad")
    ).collect()[0]
    return {"good": int(row["good"] or 0), "corrupt": int(row["bad"] or 0)}
