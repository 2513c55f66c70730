"""Dependency-free minimal ``.xlsx`` reader/writer (stdlib zip + XML).

The reference reads Excel through ``pd.read_excel`` (fsheet.py:33-36) and
writes through ``pd.DataFrame.to_excel`` (query_iterator.py:210), both of
which require openpyxl.  This container ships neither openpyxl nor xlrd,
so the engine carries its own minimal OOXML SpreadsheetML implementation:

* reader: handles shared strings, inline strings, numbers, booleans and
  blank cells; returns ``(columns, rows)`` with the first sheet row as
  the header (matching ``pd.read_excel`` defaults);
* writer: inline-string cells (no sharedStrings table needed), one
  worksheet per (name, columns, rows) tuple.

Type inference mirrors what ``pd.read_excel`` produced on the reference's
shipped files (SURVEY §1.3): numeric cells → int when integral else
float; everything else stays ``str``; blanks → ``None``.

If pandas+openpyxl are available, callers can still prefer them; this
module is the always-available fallback and the one used in tests.
"""

from __future__ import annotations

import io
import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = {"m": "http://schemas.openxmlformats.org/spreadsheetml/2006/main",
       "r": "http://schemas.openxmlformats.org/officeDocument/2006/relationships"}


def _col_to_idx(ref: str) -> int:
    """``'A1'`` → 0, ``'AB3'`` → 27."""
    idx = 0
    for ch in ref:
        if ch.isalpha():
            idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
        else:
            break
    return idx - 1


def _idx_to_col(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def sheet_names(path: str) -> list[str]:
    with zipfile.ZipFile(path) as zf:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        return [s.attrib["name"] for s in wb.findall("m:sheets/m:sheet", _NS)]


def read_sheet(path: str | bytes, sheet: str | int = 0,
               header: bool = True) -> tuple[list[str], list[list]]:
    """Read one worksheet → (column_names, data_rows).

    ``path`` may be a filesystem path or raw xlsx bytes (the distributed
    Excel source hands in bytes from ``binaryFile`` rows).
    """
    src = io.BytesIO(path) if isinstance(path, (bytes, bytearray)) else path
    with zipfile.ZipFile(src) as zf:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        sheets = wb.findall("m:sheets/m:sheet", _NS)
        if isinstance(sheet, int):
            target = sheets[sheet]
        else:
            matches = [s for s in sheets if s.attrib["name"] == sheet]
            if not matches:
                raise KeyError(f"sheet {sheet!r} not in {path!r}")
            target = matches[0]
        rid = target.attrib[f"{{{_NS['r']}}}id"]
        rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
        rel_map = {r.attrib["Id"]: r.attrib["Target"] for r in rels}
        sheet_path = "xl/" + rel_map[rid].lstrip("/")
        if sheet_path.startswith("xl/xl/"):
            sheet_path = sheet_path[3:]

        shared: list[str] = []
        if "xl/sharedStrings.xml" in zf.namelist():
            sst = ET.fromstring(zf.read("xl/sharedStrings.xml"))
            for si in sst.findall("m:si", _NS):
                shared.append("".join(t.text or "" for t in si.iter(f"{{{_NS['m']}}}t")))

        ws = ET.fromstring(zf.read(sheet_path))
        raw_rows: list[dict[int, object]] = []
        max_col = -1
        for row_el in ws.findall("m:sheetData/m:row", _NS):
            cells: dict[int, object] = {}
            for c_el in row_el.findall("m:c", _NS):
                ref = c_el.attrib.get("r", "")
                ci = _col_to_idx(ref) if ref else (max(cells) + 1 if cells else 0)
                ctype = c_el.attrib.get("t", "n")
                v_el = c_el.find("m:v", _NS)
                if ctype == "inlineStr":
                    is_el = c_el.find("m:is", _NS)
                    val = "".join(t.text or "" for t in is_el.iter(f"{{{_NS['m']}}}t")) if is_el is not None else None
                elif v_el is None or v_el.text is None:
                    val = None
                elif ctype == "s":
                    val = shared[int(v_el.text)]
                elif ctype == "b":
                    val = v_el.text == "1"
                elif ctype == "str":
                    val = v_el.text
                else:  # numeric
                    txt = v_el.text
                    f = float(txt)
                    val = int(f) if f.is_integer() and "e" not in txt.lower() and "." not in txt else f
                cells[ci] = val
                max_col = max(max_col, ci)
            raw_rows.append(cells)

    width = max_col + 1
    dense = [[r.get(i) for i in range(width)] for r in raw_rows]
    if header and dense:
        cols = [str(c) if c is not None else f"Unnamed_{i}" for i, c in enumerate(dense[0])]
        return cols, dense[1:]
    return [f"col_{i}" for i in range(width)], dense


_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
{sheet_overrides}
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""


def _cell_xml(ref: str, value) -> str:
    if value is None:
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    text = escape(str(value))
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{text}</t></is></c>'


def write_workbook(path: str, sheets: list[tuple[str, list[str], list[list]]]) -> None:
    """Write an xlsx file: ``sheets = [(sheet_name, columns, rows), ...]``.

    One worksheet per query result, matching the reference's Excel sink
    shape (query_iterator.py:197-212) — header row then data rows,
    no index column (reference passes ``index=False``).
    """
    sheet_overrides = "\n".join(
        f'<Override PartName="/xl/worksheets/sheet{i+1}.xml" '
        f'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
        for i in range(len(sheets)))
    wb_sheets = "\n".join(
        f'<sheet name="{escape(name)}" sheetId="{i+1}" r:id="rId{i+1}"/>'
        for i, (name, _, _) in enumerate(sheets))
    workbook = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets>{wb_sheets}</sheets></workbook>"""
    wb_rels = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" + "".join(
        f'<Relationship Id="rId{i+1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet{i+1}.xml"/>'
        for i in range(len(sheets))) + "</Relationships>"

    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", _CONTENT_TYPES.format(sheet_overrides=sheet_overrides))
        zf.writestr("_rels/.rels", _ROOT_RELS)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, (name, cols, rows) in enumerate(sheets):
            body = []
            all_rows = [cols] + [list(r) for r in rows]
            for ri, row in enumerate(all_rows):
                cells = "".join(_cell_xml(f"{_idx_to_col(ci)}{ri+1}", v)
                                for ci, v in enumerate(row))
                body.append(f'<row r="{ri+1}">{cells}</row>')
            ws = ('<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
                  '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
                  f'<sheetData>{"".join(body)}</sheetData></worksheet>')
            zf.writestr(f"xl/worksheets/sheet{i+1}.xml", ws)
