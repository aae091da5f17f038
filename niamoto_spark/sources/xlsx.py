"""Pure-python XLSX reader — no openpyxl/pandas.read_excel dependency.

The reference reads spreadsheets with pandas/openpyxl during import
profiling (profiler.py:219-259).  XLSX is a public format: a zip of XML
parts.  This reader covers the subset real import spreadsheets use —
shared strings, inline strings, numbers, booleans, multiple sheets — with
stdlib ``zipfile`` + ``xml.etree`` only, so the xlsx import path no longer
gates on openpyxl.  Spreadsheets are driver-small by nature (the reference
loads them whole with pandas); the result lands in a Spark DataFrame.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = ("{http://schemas.openxmlformats.org/officeDocument/2006/"
           "relationships}")


def _col_index(cell_ref: str) -> int:
    """'A1' -> 0, 'BC12' -> 54."""
    letters = re.match(r"[A-Z]+", cell_ref).group(0)
    idx = 0
    for ch in letters:
        idx = idx * 26 + (ord(ch) - 64)
    return idx - 1


def list_sheets(path: str) -> list[str]:
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
    return [s.get("name") for s in wb.iter(f"{_NS}sheet")]


def read_xlsx_rows(path: str, sheet: int | str = 0) -> list[list]:
    """Sheet cells as a list of rows (python values: str/float/bool/None)."""
    with zipfile.ZipFile(path) as z:
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        sheets = [(s.get("name"), s.get(f"{_REL_NS}id"))
                  for s in wb.iter(f"{_NS}sheet")]
        if isinstance(sheet, str):
            match = [rid for name, rid in sheets if name == sheet]
            if not match:
                raise ValueError(f"sheet {sheet!r} not in {path!r} "
                                 f"(has {[n for n, _ in sheets]})")
            rid = match[0]
        else:
            rid = sheets[sheet][1]
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        target = next(r.get("Target") for r in rels
                      if r.get("Id") == rid)
        target = target.lstrip("/")
        if not target.startswith("xl/"):
            target = "xl/" + target
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            ss = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in ss.iter(f"{_NS}si"):
                shared.append("".join(t.text or ""
                                      for t in si.iter(f"{_NS}t")))
        sheet_xml = ET.fromstring(z.read(target))

    rows: list[list] = []
    for row_el in sheet_xml.iter(f"{_NS}row"):
        cells: dict[int, object] = {}
        for c in row_el.iter(f"{_NS}c"):
            ref = c.get("r")
            idx = _col_index(ref) if ref else len(cells)
            ctype = c.get("t", "n")
            v_el = c.find(f"{_NS}v")
            if ctype == "inlineStr":
                is_el = c.find(f"{_NS}is")
                cells[idx] = "".join(t.text or ""
                                     for t in is_el.iter(f"{_NS}t")) \
                    if is_el is not None else None
                continue
            if v_el is None or v_el.text is None:
                cells[idx] = None
                continue
            raw = v_el.text
            if ctype == "s":
                cells[idx] = shared[int(raw)]
            elif ctype == "b":
                cells[idx] = raw == "1"
            elif ctype == "str":
                cells[idx] = raw
            else:
                f = float(raw)
                cells[idx] = f
        if cells:
            width = max(cells) + 1
            rows.append([cells.get(i) for i in range(width)])
    if rows:
        width = max(len(r) for r in rows)
        rows = [r + [None] * (width - len(r)) for r in rows]
    return rows


def read_xlsx_native(spark, path: str, sheet: int | str = 0,
                     header: bool = True):
    """XLSX -> Spark DataFrame via the pure-python parser."""
    import pandas as pd

    rows = read_xlsx_rows(path, sheet)
    if not rows:
        raise ValueError(f"empty sheet in {path!r}")
    if header:
        cols = [str(c) if c is not None else f"col{i}"
                for i, c in enumerate(rows[0])]
        body = rows[1:]
    else:
        cols = [f"col{i}" for i in range(len(rows[0]))]
        body = rows
    return spark.createDataFrame(pd.DataFrame(body, columns=cols))


def write_xlsx(path: str, rows: list[list], sheet_name: str = "Sheet1") -> None:
    """Minimal XLSX writer (inline strings + numbers) for fixtures/tests."""

    def col_letter(i: int) -> str:
        s = ""
        i += 1
        while i:
            i, r = divmod(i - 1, 26)
            s = chr(65 + r) + s
        return s

    cells_xml = []
    for ri, row in enumerate(rows, 1):
        cs = []
        for ci, v in enumerate(row):
            ref = f"{col_letter(ci)}{ri}"
            if v is None:
                continue
            if isinstance(v, bool):
                cs.append(f'<c r="{ref}" t="b"><v>{int(v)}</v></c>')
            elif isinstance(v, (int, float)):
                cs.append(f'<c r="{ref}"><v>{v}</v></c>')
            else:
                from xml.sax.saxutils import escape

                cs.append(f'<c r="{ref}" t="inlineStr"><is><t>'
                          f"{escape(str(v))}</t></is></c>")
        cells_xml.append(f'<row r="{ri}">{"".join(cs)}</row>')
    sheet = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
             '<worksheet xmlns="http://schemas.openxmlformats.org/'
             'spreadsheetml/2006/main"><sheetData>'
             + "".join(cells_xml) + "</sheetData></worksheet>")
    workbook = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                '<workbook xmlns="http://schemas.openxmlformats.org/'
                'spreadsheetml/2006/main" xmlns:r="http://schemas.'
                'openxmlformats.org/officeDocument/2006/relationships">'
                f'<sheets><sheet name="{sheet_name}" sheetId="1" '
                'r:id="rId1"/></sheets></workbook>')
    rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
            '<Relationships xmlns="http://schemas.openxmlformats.org/'
            'package/2006/relationships"><Relationship Id="rId1" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/'
            'relationships/worksheet" Target="worksheets/sheet1.xml"/>'
            "</Relationships>")
    content_types = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                     '<Types xmlns="http://schemas.openxmlformats.org/'
                     'package/2006/content-types">'
                     '<Default Extension="xml" ContentType="application/xml"/>'
                     '<Override PartName="/xl/workbook.xml" ContentType='
                     '"application/vnd.openxmlformats-officedocument.'
                     'spreadsheetml.sheet.main+xml"/>'
                     '<Override PartName="/xl/worksheets/sheet1.xml" '
                     'ContentType="application/vnd.openxmlformats-'
                     'officedocument.spreadsheetml.worksheet+xml"/></Types>')
    root_rels = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                 '<Relationships xmlns="http://schemas.openxmlformats.org/'
                 'package/2006/relationships"><Relationship Id="rId1" '
                 'Type="http://schemas.openxmlformats.org/officeDocument/'
                 '2006/relationships/officeDocument" '
                 'Target="xl/workbook.xml"/></Relationships>')
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", content_types)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", rels)
        z.writestr("xl/worksheets/sheet1.xml", sheet)
