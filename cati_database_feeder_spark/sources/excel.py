"""Excel / zip-archive sources (SURVEY.md §2.1 ops #1-#3).

Reference behavior: download a zip, read ``namelist()[0]`` as an xlsx,
``pd.read_excel`` into one in-RAM frame (feeder.py:119-122); updaters
glob ``./xlsx/*.zip`` / ``*.xlsx`` one file at a time
(add_q5010.py:44-49, add_q5011_2t.py:102-116).

Engine shape: ``spark.read.format("binaryFile").load(glob)`` fans the
*files* out across executors, and an Arrow-batched ``mapInPandas``
decodes each archive where it lands — no driver bottleneck, no whole-
dataset RAM spike; one task per file, which is the right granularity
because xlsx is not splittable. The canonical pipeline converts to
parquet once and every downstream query scans parquet (catalog.py).

openpyxl is an optional dependency (present in the reference's lockfile,
absent in minimal clusters) — when missing, decode falls back to a
dependency-free minimal xlsx parser (zipfile + ElementTree over the
sheet XML) that covers the reference's export workbooks: one sheet,
header row, string/number cells. Only a genuinely unreadable payload
degrades to a clear error row.
"""

from __future__ import annotations

import io
import zipfile
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

# xlsx sheets become string columns; schema-on-read like the reference
# (feeder.py:121), but explicit here so the scan has a stable schema.
DECODED_SCHEMA = "path string, sheet string, row_idx long, col_name string, value string"


_XLSX_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


def _col_index(cell_ref: str) -> int:
    """'A1' → 0, 'AB7' → 27: the column part of a cell reference."""
    idx = 0
    for ch in cell_ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - 64)
    return idx - 1


def _read_xlsx_minimal(payload: bytes) -> pd.DataFrame:
    """Dependency-free xlsx decode (fallback when openpyxl is absent):
    zipfile + ElementTree over the first worksheet, sharedStrings and
    inline strings resolved, first row as header, every value a string
    — the same shape ``pd.read_excel(dtype=str)`` yields for the
    reference's export workbooks (one sheet, header + scalar cells)."""
    import xml.etree.ElementTree as ET
    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{_XLSX_NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{_XLSX_NS}t")))
        sheets = sorted(n for n in zf.namelist()
                        if n.startswith("xl/worksheets/sheet") and n.endswith(".xml"))
        if not sheets:
            raise ValueError("no worksheet in xlsx payload")
        root = ET.fromstring(zf.read(sheets[0]))
    raw_rows: list[dict[int, str | None]] = []
    for row in root.iter(f"{_XLSX_NS}row"):
        cells: dict[int, str | None] = {}
        for pos, c in enumerate(row.findall(f"{_XLSX_NS}c")):
            ref = c.attrib.get("r")
            idx = _col_index(ref) if ref else pos
            kind = c.attrib.get("t")
            if kind == "s":
                v = c.find(f"{_XLSX_NS}v")
                val = shared[int(v.text)] if v is not None else None
            elif kind == "inlineStr":
                val = "".join(t.text or "" for t in c.iter(f"{_XLSX_NS}t"))
            else:
                v = c.find(f"{_XLSX_NS}v")
                val = v.text if v is not None else None
            cells[idx] = val
        raw_rows.append(cells)
    if not raw_rows:
        return pd.DataFrame()
    width = max((max(r) + 1 for r in raw_rows if r), default=0)
    header = [raw_rows[0].get(i) or f"col{i}" for i in range(width)]
    data = [[r.get(i) for i in range(width)] for r in raw_rows[1:]]
    return pd.DataFrame(data, columns=header, dtype="object")


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: binaryFile rows (path, content) → long-form
    (path, sheet, row_idx, col_name, value) rows. Long form keeps the
    schema stable across heterogeneous workbooks; callers pivot with
    groupBy().pivot() once they know the wave's columns."""
    for pdf in batches:
        out = []
        for path, content in zip(pdf["path"], pdf["content"]):
            try:
                payload = bytes(content)
                # extension-only detection on purpose: xlsx files are
                # ALSO zip archives (PK magic), so sniffing bytes would
                # mis-unwrap them; the reference unwraps only *.zip
                # (feeder.py:119, add_q5011_2t.py:112)
                if path.endswith(".zip"):
                    with zipfile.ZipFile(io.BytesIO(payload)) as zf:
                        # reference semantics: first archive member is the data
                        # (feeder.py:120: namelist()[0])
                        payload = zf.read(zf.namelist()[0])
                try:
                    frame = pd.read_excel(io.BytesIO(payload), dtype=str)
                except ImportError:  # openpyxl missing on executor
                    frame = _read_xlsx_minimal(payload)
            except Exception as exc:
                out.append(pd.DataFrame(
                    {"path": [path], "sheet": ["<error>"], "row_idx": [-1],
                     "col_name": ["__error__"], "value": [str(exc)[:500]]}))
                continue
            molten = frame.melt(ignore_index=False).reset_index()
            molten.columns = ["row_idx", "col_name", "value"]
            molten.insert(0, "sheet", "0")
            molten.insert(0, "path", path)
            molten["value"] = molten["value"].astype("string")
            out.append(molten)
        yield from out or [pd.DataFrame(columns=["path", "sheet", "row_idx", "col_name", "value"])]


def read_excel_glob(spark: SparkSession, glob_path: str) -> DataFrame:
    """Ops #1-#3: distributed multi-file Excel/zip scan.

    ``glob_path`` like ``/data/xlsx/*.zip`` or ``*.xlsx``; per-file
    semantics (the updaters' one-batch-per-file logic) come free from
    the ``path`` column — group on it like ``input_file_name()``.
    """
    binary = (spark.read.format("binaryFile")
              .option("pathGlobFilter", glob_path.rsplit("/", 1)[-1])
              .load(glob_path.rsplit("/", 1)[0])
              .select("path", "content"))
    return binary.mapInPandas(_decode_batches, schema=DECODED_SCHEMA)


def pivot_wave(decoded: DataFrame, columns: list[str]) -> DataFrame:
    """Re-widen the long-form decode for a known wave layout."""
    from pyspark.sql import functions as F
    return (decoded.filter(F.col("col_name").isin(columns))
            .groupBy("path", "row_idx")
            .pivot("col_name", columns)
            .agg(F.first("value")))
