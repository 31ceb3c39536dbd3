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


# ---------------------------------------------------------------------------
# Deterministic xlsx/zip fixture for the registered `excel_scan` query
# (round-12 verdict, missing #1: the reference's PRIMARY input —
# xlsx-in-zip, feeder.py:119-122; bare-xlsx glob, add_q5010.py:44-49 —
# was the last §2.1 source without a value-checked oracle).
#
# The repo writes its own workbooks with a dependency-free OOXML
# writer (the mirror of _read_xlsx_minimal above): pinned rows, pinned
# zip metadata (DOS epoch timestamps, STORED compression), so the
# bytes are reproducible and the oracle can assert the decoded VALUES.
# Layout exercises the reference's real shapes: dotted Cyrillic
# headers (the recruits_log columns renamed by op #14), status
# literals ("Брак"/"Полное"/"Комплит", feeder.py status map),
# dd.MM.yyyy date strings, NUMERIC cells (ids/quotas — typed in the
# sheet, read back as strings like pd.read_excel(dtype=str)), a blank
# cell per file, and non-ASCII payloads. One bare .xlsx and one .zip
# whose first member is an .xlsx — both decode rungs of the scan.

EXCEL_WAVE_COLUMNS = [
    "Респондент.Код", "Статус", "Дата.Опроса", "Квота", "Комментарий"]
# ASCII aliases the registered query (and its oracle) rename to — the
# op-#14 rename semantics, applied to the pivoted wide frame.
EXCEL_WAVE_ALIASES = [
    "respondent_code", "status", "survey_date", "quota", "comment"]


def excel_fixture_rows() -> dict[str, list[tuple]]:
    """Pinned decode expectation per fixture file: the DECODED string
    values (numeric cells come back as their canonical string repr,
    blank cells as None). The writer below derives the cell TYPE from
    the string: values parsing as numbers are written as numeric
    cells, everything else as inline strings — so the round trip
    through either decode rung (pandas+openpyxl or the minimal
    parser) must land exactly back on these tuples."""
    return {
        "wave1.xlsx": [
            ("101", "Полное", "05.03.2024", "12", "обычный ответ"),
            ("102", "Брак", "06.03.2024", "7", None),
            ("103", "Комплит", "07.03.2024", "8.25", "вторая строка"),
            ("104", "Полное", "08.03.2024", "0", "смешанный 文本 text"),
        ],
        "wave2.zip": [
            ("201", "Брак", "09.03.2024", "3", "строка из архива"),
            ("202", "Полное", "10.03.2024", "15", "ещё строка"),
            ("203", "Комплит", "11.03.2024", "9", None),
        ],
    }


def _xml_escape(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
            .replace(">", "&gt;"))


def _col_letter(idx: int) -> str:
    """0 → 'A', 27 → 'AB' — inverse of :func:`_col_index`."""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


def _is_numeric(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


def write_xlsx_bytes(header: list[str], rows: list[tuple]) -> bytes:
    """Minimal valid .xlsx: one sheet, header row, inline strings for
    text, numeric cells for number-shaped values, omitted cells for
    None. Deterministic bytes: fixed member order, DOS-epoch
    timestamps, STORED compression."""
    def cell(r: int, c: int, v) -> str:
        ref = f"{_col_letter(c)}{r}"
        if v is None:
            return ""
        v = str(v)
        if _is_numeric(v):
            return f'<c r="{ref}"><v>{v}</v></c>'
        return (f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">'
                f'{_xml_escape(v)}</t></is></c>')

    body = []
    for rn, vals in enumerate([tuple(header)] + list(rows), start=1):
        cells = "".join(cell(rn, cn, v) for cn, v in enumerate(vals))
        body.append(f'<row r="{rn}">{cells}</row>')
    sheet = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             '<worksheet xmlns="http://schemas.openxmlformats.org/'
             'spreadsheetml/2006/main"><sheetData>'
             + "".join(body) + '</sheetData></worksheet>')
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/'
        'vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
        'worksheet+xml"/></Types>')
    rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            'package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats'
            '.org/officeDocument/2006/relationships/officeDocument" '
            'Target="xl/workbook.xml"/></Relationships>')
    workbook = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<workbook xmlns="http://schemas.openxmlformats.org/'
                'spreadsheetml/2006/main" xmlns:r="http://schemas.'
                'openxmlformats.org/officeDocument/2006/relationships">'
                '<sheets><sheet name="Sheet1" sheetId="1" r:id="rId1"/>'
                '</sheets></workbook>')
    wb_rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
               '<Relationships xmlns="http://schemas.openxmlformats.org/'
               'package/2006/relationships">'
               '<Relationship Id="rId1" Type="http://schemas.'
               'openxmlformats.org/officeDocument/2006/relationships/'
               'worksheet" Target="worksheets/sheet1.xml"/>'
               '</Relationships>')
    members = [("[Content_Types].xml", content_types),
               ("_rels/.rels", rels),
               ("xl/workbook.xml", workbook),
               ("xl/_rels/workbook.xml.rels", wb_rels),
               ("xl/worksheets/sheet1.xml", sheet)]
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
        for name, text_ in members:
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(info, text_.encode("utf-8"))
    return buf.getvalue()


def ensure_excel_fixture(dirpath: str) -> str:
    """Write the pinned fixture files (one bare .xlsx, one .zip whose
    first member is an .xlsx — the two reference ingest shapes) under
    ``dirpath`` if absent or stale. Staleness is byte-compare (the
    jsonl ensure_fixture discipline); writes are tmp + atomic
    rename."""
    import os
    files = {}
    for fname, rows in excel_fixture_rows().items():
        xlsx = write_xlsx_bytes(EXCEL_WAVE_COLUMNS, rows)
        if fname.endswith(".zip"):
            buf = io.BytesIO()
            with zipfile.ZipFile(buf, "w", zipfile.ZIP_STORED) as zf:
                info = zipfile.ZipInfo(
                    "export.xlsx", date_time=(1980, 1, 1, 0, 0, 0))
                zf.writestr(info, xlsx)
            files[fname] = buf.getvalue()
        else:
            files[fname] = xlsx
    os.makedirs(dirpath, exist_ok=True)
    for fname, data in files.items():
        path = os.path.join(dirpath, fname)
        if os.path.exists(path):
            try:
                with open(path, "rb") as f:
                    if f.read() == data:
                        continue
            except OSError:
                pass
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
    return dirpath
