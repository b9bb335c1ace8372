"""XLSX source: distributed ingestion of Office Open XML spreadsheets.

XLSX (ECMA-376, public spec) is a ZIP of SpreadsheetML parts:
`xl/workbook.xml` names the sheets, `xl/worksheets/sheetN.xml` holds
rows of cells, and `xl/sharedStrings.xml` interns repeated strings.
Analysts ship corpora as spreadsheets constantly; this source makes
them one more directory format: binaryFile lists the files (one task
per workbook), each task unzips ITS blob in memory and parses the
sheet with stdlib ElementTree — no openpyxl, no driver-side reads.

Scope: the first worksheet by default (or a named one), cell types
shared-string / inline / numeric / boolean / formula-cached; every
value surfaces as a STRING column (header row = column names) and the
caller casts — the CSV-source convention, because spreadsheet cells
have no reliable column-wide type.
"""

from __future__ import annotations

import io
import re
import zipfile
from typing import Iterator
from xml.etree import ElementTree as ET

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from graph_db_clustering_spark.sources.files import read_binary_dir

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"


class XlsxError(ValueError):
    pass


def _col_index(ref: str) -> int:
    """'BC12' -> zero-based column 54."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1


def _sheet_rows(blob: bytes, sheet: str | None) -> list[list[str | None]]:
    zf = zipfile.ZipFile(io.BytesIO(blob))
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    sheets = [
        (s.get("name"), i + 1)
        for i, s in enumerate(wb.iter(f"{_NS}sheet"))
    ]
    if not sheets:
        raise XlsxError("xlsx: workbook has no sheets")
    if sheet is None:
        idx = sheets[0][1]
    else:
        match = [i for name, i in sheets if name == sheet]
        if not match:
            raise XlsxError(f"xlsx: sheet {sheet!r} not in {[n for n, _ in sheets]}")
        idx = match[0]
    shared: list[str] = []
    try:
        ss = ET.fromstring(zf.read("xl/sharedStrings.xml"))
        for si in ss.iter(f"{_NS}si"):
            shared.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    except KeyError:
        pass
    ws = ET.fromstring(zf.read(f"xl/worksheets/sheet{idx}.xml"))
    rows: list[list[str | None]] = []
    for row in ws.iter(f"{_NS}row"):
        cells: list[str | None] = []
        for c in row.iter(f"{_NS}c"):
            ci = _col_index(c.get("r", ""))
            while len(cells) < ci:
                cells.append(None)
            t = c.get("t", "n")
            v = c.find(f"{_NS}v")
            if t == "s":
                val = shared[int(v.text)] if v is not None else None
            elif t == "inlineStr":
                is_el = c.find(f"{_NS}is")
                val = (
                    "".join(x.text or "" for x in is_el.iter(f"{_NS}t"))
                    if is_el is not None
                    else None
                )
            elif t == "b":
                val = None if v is None else ("true" if v.text == "1" else "false")
            else:  # n / str / formula-cached
                val = v.text if v is not None else None
            cells.append(val)
        rows.append(cells)
    return rows


def read_xlsx(
    spark: SparkSession,
    path: str,
    glob: str = "*.xlsx",
    sheet: str | None = None,
    header: bool = True,
) -> DataFrame:
    """Directory of workbooks -> one DataFrame of strings. Column names
    come from the FIRST file's header row (driver parses only that
    one); every file decodes in its own executor task and must carry
    the same header."""
    files = read_binary_dir(spark, path, glob)
    first = files.select("content").orderBy("path").first()
    if first is None:
        raise XlsxError(f"xlsx: no files matching {glob!r} under {path}")
    head_rows = _sheet_rows(bytes(first["content"]), sheet)
    if not head_rows:
        raise XlsxError("xlsx: first workbook sheet is empty")
    if header:
        names = [
            re.sub(r"\W+", "_", c or f"col{i}") for i, c in enumerate(head_rows[0])
        ]
    else:
        names = [f"col{i}" for i in range(len(head_rows[0]))]
    ddl = ", ".join(f"{n} string" for n in names)
    width = len(names)

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for blob in pdf["content"]:
                rows = _sheet_rows(bytes(blob), sheet)
                data = rows[1:] if header else rows
                fixed = [
                    (r + [None] * width)[:width] for r in data
                ]
                yield pd.DataFrame(fixed, columns=names, dtype=object)

    return files.select("content").mapInPandas(decode, ddl)


def write_xlsx_fixture(rows: list[dict], columns: list[str], path: str) -> None:
    """Minimal single-sheet workbook writer (fixtures + the export a
    stakeholder asks for): shared strings for every text value, plain
    numerics inline."""
    strings: list[str] = []
    sindex: dict = {}

    def cell(ref, v):
        if v is None:
            return f'<c r="{ref}"/>'
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            return f'<c r="{ref}"><v>{v}</v></c>'
        s = str(v)
        if s not in sindex:
            sindex[s] = len(strings)
            strings.append(s)
        return f'<c r="{ref}" t="s"><v>{sindex[s]}</v></c>'

    def colref(i):
        out = ""
        i += 1
        while i:
            i, r = divmod(i - 1, 26)
            out = chr(65 + r) + out
        return out

    body = []
    allrows = [dict(zip(columns, columns))] + rows
    for rn, row in enumerate(allrows, 1):
        cells = "".join(
            cell(f"{colref(ci)}{rn}", row.get(c)) for ci, c in enumerate(columns)
        )
        body.append(f'<row r="{rn}">{cells}</row>')
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    sheet_xml = (
        f'<?xml version="1.0"?><worksheet xmlns="{ns}"><sheetData>'
        + "".join(body)
        + "</sheetData></worksheet>"
    )
    ss_xml = (
        f'<?xml version="1.0"?><sst xmlns="{ns}" count="{len(strings)}" '
        f'uniqueCount="{len(strings)}">'
        + "".join(f"<si><t>{s}</t></si>" for s in strings)
        + "</sst>"
    )
    wb_xml = (
        f'<?xml version="1.0"?><workbook xmlns="{ns}"><sheets>'
        '<sheet name="Sheet1" sheetId="1"/></sheets></workbook>'
    )
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("xl/workbook.xml", wb_xml)
        zf.writestr("xl/worksheets/sheet1.xml", sheet_xml)
        zf.writestr("xl/sharedStrings.xml", ss_xml)
