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


# ---------------------------------------------------------------------------
# Deterministic ingest fixture for the registered `jsonl_scan` query.
#
# The parquet fixtures under /root/testdata are read-only and hold no
# JSONL, so the one source row that CAN carry a DuckDB oracle writes
# its own input: a fixed shard of good lines (all five corpus
# languages, null/missing/negative/int64-edge ids, missing and null
# texts, unknown extra fields, non-ASCII payloads) interleaved with
# the corrupt classes a crawl actually produces (syntactic junk,
# non-object JSON, and doc_id type drift: string / float / boolean).
# Content is pinned byte-for-byte (no timestamps, no randomness) so
# the Spark scan and the DuckDB oracle replay identical accounting.
#
# Cross-type string coercions ({"text": 42}, {"lang": {...}}) are
# deliberately NOT in the fixture: Spark PERMISSIVE coerces them to
# strings while a type-faithful reader calls them drift — an
# engine-specific judgment the contract should not depend on.

_LANGS = ("en", "zh", "es", "de", "fr")

_CORRUPT_LINES = (
    'not json at all {{{',
    '["an", "array", "not", "an", "object"]',
    '{"doc_id": "str-7", "text": "string id drift", "lang": "en"}',
    '{"doc_id": 8.25, "text": "float id drift", "lang": "fr"}',
    '{"doc_id": true, "text": "bool id drift", "lang": "en"}',
    '{"doc_id": 99, "text": "unterminated', )


def fixture_lines() -> list[str]:
    """The pinned shard: 40 good lines + 2 id-edge lines + 1
    missing-id line, with the corrupt classes interleaved every 8
    lines. The registered query's ``first_bad_line`` is the
    LEXICOGRAPHIC min of the corrupt lines (both engines compute
    MIN(), not a positional first) — interleaving only proves the
    classifier handles corrupt lines anywhere in the shard."""
    good = []
    for i in range(1, 41):
        lang = _LANGS[i % len(_LANGS)]
        if i % 11 == 0:
            good.append(f'{{"doc_id": {i}, "lang": "{lang}"}}')
        elif i % 7 == 0:
            good.append(
                f'{{"doc_id": {i}, "text": null, "lang": "{lang}"}}')
        elif i % 13 == 0:
            good.append(f'{{"doc_id": {i}, "text": "doc {i} body", '
                        f'"lang": "{lang}", "bonus": {i * 3}}}')
        else:
            good.append(f'{{"doc_id": {i}, "text": "doc {i} körpus '
                        f'текст 文本", "lang": "{lang}"}}')
    good.append('{"doc_id": -7, "text": "negative id", "lang": "de"}')
    good.append('{"doc_id": 9007199254740993, "text": "past float53", '
                '"lang": "zh"}')
    good.append('{"doc_id": null, "text": "null id", "lang": "es"}')
    good.append('{"text": "missing id", "lang": "en"}')
    lines, ci = [], 0
    for n, g in enumerate(good):
        if n % 8 == 4 and ci < len(_CORRUPT_LINES):
            lines.append(_CORRUPT_LINES[ci])
            ci += 1
        lines.append(g)
    lines.extend(_CORRUPT_LINES[ci:])
    return lines


def ensure_fixture(path: str) -> str:
    """Write the pinned shard to ``path`` if absent or stale (atomic
    rename so concurrent Spark/oracle lanes never see a half-written
    file); returns ``path``. Staleness is decided by CONTENT, not
    size (round-12 advice): a byte-equal-length edit of
    :func:`fixture_lines` must invalidate the on-disk shard, or both
    engines silently replay old data."""
    import os
    data = ("\n".join(fixture_lines()) + "\n").encode("utf-8")
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


# ---------------------------------------------------------------------------
# Schema-evolution parquet fixture (E125, registered as `parquet_evolution`).
# Columnar lake tables evolve: new shards gain columns old shards lack.
# Three pinned generations written as separate parquet files:
#   gen 0: (doc_id, text)                       — the original shard
#   gen 1: (doc_id, text, lang)                 — lang added
#   gen 2: (doc_id, text, lang, quality)        — quality added
# Deterministic content (pyarrow, fixed rows, no timestamps) so the
# merged-schema scan's accounting replays bit-for-bit in DuckDB
# (read_parquet(..., union_by_name=true)).

def evolution_generations():
    gens = []
    g0 = [(i, f"gen zero doc {i}") for i in range(1, 11)]
    gens.append((["doc_id", "text"], g0))
    g1 = [(i, f"gen one doc {i}", ["en", "fr", "de"][i % 3])
          for i in range(11, 26)]
    gens.append((["doc_id", "text", "lang"], g1))
    g2 = [(i, f"gen two doc {i}", ["es", "zh"][i % 2], (i * 37) % 100)
          for i in range(26, 41)]
    gens.append((["doc_id", "text", "lang", "quality"], g2))
    return gens


def ensure_evolution_fixture(dirpath: str) -> str:
    """Write the three generations as part-g{n}.parquet under
    ``dirpath`` if absent; atomic per-file (tmp + rename)."""
    import os
    import pyarrow as pa
    import pyarrow.parquet as pq
    types = {"doc_id": pa.int64(), "text": pa.string(),
             "lang": pa.string(), "quality": pa.int64()}
    os.makedirs(dirpath, exist_ok=True)
    for n, (cols, rows) in enumerate(evolution_generations()):
        path = os.path.join(dirpath, f"part-g{n}.parquet")
        if os.path.exists(path):
            continue
        arrays = [pa.array([r[i] for r in rows], type=types[c])
                  for i, c in enumerate(cols)]
        table = pa.table(dict(zip(cols, arrays)))
        tmp = f"{path}.tmp.{os.getpid()}"
        pq.write_table(table, tmp)
        os.replace(tmp, path)
    return dirpath
