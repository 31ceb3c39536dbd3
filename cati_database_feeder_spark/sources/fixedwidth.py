"""Fixed-width text source — the mainframe/legacy-export cousin of
the reference's delimited inputs (the reference consumes xlsx/CSV
survey waves; long-lived CATI shops also receive column-aligned .txt
dumps from dialer hardware and 1C exports, which is the gap this
source closes).

Design: `spark.read.text` keeps each line intact (no delimiter
inference to get wrong), then the layout is applied as CHARACTER
substrings — `F.substring` is character-based on strings, so
multibyte Cyrillic payloads slice correctly as long as the producer
pads by character count (this fixture does; a byte-padded feed would
decode via binaryFile + a byte-slicing mapInPandas instead). Blank
fields (all spaces) become NULL after trim; numeric columns are cast
from their trimmed text. Everything is JVM-side codegen — no Python
in the scan path — and text lines split per HDFS block, so the scan
parallelizes like any line-oriented source at 100 TB.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# (name, start (0-based, in characters), width, spark type)
FIXEDWIDTH_LAYOUT = [
    ("respondent_code", 0, 6, "bigint"),
    ("status", 6, 12, "string"),
    ("survey_date", 18, 10, "string"),
    ("quota", 28, 5, "bigint"),
    ("score", 33, 8, "double"),
    ("comment", 41, 20, "string"),
]

# Pinned fixture rows (the writer pads these to the layout; the
# oracle re-emits them as VALUES). Cyrillic comment exercises the
# character-position contract; the all-blank quota/score row pins
# blank→NULL; the trailing-space comment pins rtrim.
FIXEDWIDTH_ROWS = [
    (201, "complete", "2024-04-01", 15, 4.5, "plain note"),
    (202, "interrupted", "2024-04-02", 3, 2.25, "Бланк анкеты"),
    (203, "complete", "2024-04-03", None, None, "padded      "),
    (204, "refused", "2024-04-04", 120, 3.0, None),
    (205, "complete", "2024-04-05", 8, 4.125, "кв. 7, дом 9"),
]


def _pad(val, width: int, right_align: bool = False) -> str:
    s = "" if val is None else str(val)
    if len(s) > width:
        raise ValueError(f"value {s!r} wider than field ({width})")
    return s.rjust(width) if right_align else s.ljust(width)


def fixture_lines() -> list[str]:
    """The pinned fixture rendered to fixed-width lines (numbers
    right-aligned, text left-aligned — both paddings must trim back
    to the same values)."""
    out = []
    for code, status, date, quota, score, comment in FIXEDWIDTH_ROWS:
        out.append(
            _pad(code, 6, right_align=True)
            + _pad(status, 12)
            + _pad(date, 10)
            + _pad(quota, 5, right_align=True)
            + _pad(score, 8, right_align=True)
            + _pad(comment, 20))
    return out


def ensure_fixture(path: str) -> str:
    """Write the pinned fixed-width shard if absent or stale —
    staleness by CONTENT, not size (the round-12 jsonl lesson), and
    atomic rename so concurrent readers never see a torn file."""
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


def read_fixedwidth(spark: SparkSession, path: str,
                    layout=None) -> DataFrame:
    """Scan a fixed-width file into typed columns per the layout.

    One `spark.read.text` (line-splittable, block-parallel), then per
    column: character substring → trim → empty-as-NULL → cast. All
    codegen expressions; the cast of a blank numeric field never
    fires because the NULLIF runs first (ANSI-safe)."""
    layout = layout or FIXEDWIDTH_LAYOUT
    lines = spark.read.text(path)
    cols = []
    for name, start, width, typ in layout:
        raw = F.trim(F.substring(F.col("value"), start + 1, width))
        c = F.nullif(raw, F.lit(""))
        if typ != "string":
            c = c.cast(typ)
        cols.append(c.alias(name))
    return lines.select(*cols)
