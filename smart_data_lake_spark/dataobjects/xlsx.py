"""Minimal xlsx (OOXML spreadsheet) codec on the Python stdlib.

Reference: `sdl-core/.../dataobject/ExcelFileDataObject.scala:56-73` reads
Excel through the external spark-excel package (POI). Neither POI nor
openpyxl is installable in this container, but .xlsx is just a zip of XML
parts — `zipfile` + `xml.etree` cover the subset a data pipeline needs:

read: shared strings, inline strings, formula cached strings, booleans,
numbers, and date/datetime cells (style-based detection: builtin numFmtIds
14-22/45-47 plus custom formats containing date tokens, Excel serial →
datetime with the 1899-12-30 epoch convention). Sparse rows/missing cells
become None; sheet selection by name or index; header row / skip rows.

write: a complete minimal workbook — [Content_Types].xml, rels, workbook,
one worksheet with inline strings (valid OOXML, no sharedStrings part
needed), plus a two-entry styles.xml so datetimes round-trip as real
date-formatted serial cells rather than text.

Excel files are small reference/config sheets by nature — never the 100 TB
fact path — so the per-file decode cost is irrelevant; the Spark integration
still distributes one-file-per-task via binaryFile + mapInPandas so a
directory of thousands of workbooks scans in parallel.
"""

from __future__ import annotations

import datetime as dt
import io
import re
import zipfile
from typing import Any
from xml.etree import ElementTree as ET

MAIN_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
REL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
PKG_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"

_EXCEL_EPOCH = dt.datetime(1899, 12, 30)
_BUILTIN_DATE_FMTS = set(range(14, 23)) | set(range(45, 48))
_DATE_TOKEN_RE = re.compile(r"(?<!\\)[ymdhs]", re.IGNORECASE)


def _col_index(ref: str) -> int:
    """'C7' → 2 (0-based column)."""
    n = 0
    for ch in ref:
        if ch.isalpha():
            n = n * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return n - 1


def _col_letter(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(65 + rem) + out
    return out


# ------------------------------------------------------------------- read


def _date_style_ids(z: zipfile.ZipFile) -> set[int]:
    """0-based cellXfs indexes whose number format is a date format."""
    try:
        root = ET.fromstring(z.read("xl/styles.xml"))
    except KeyError:
        return set()
    custom_date_fmts = {
        int(nf.get("numFmtId"))
        for nf in root.iter(f"{MAIN_NS}numFmt")
        if _DATE_TOKEN_RE.search(re.sub(r"\[[^\]]*\]|&quot;.*?&quot;|\".*?\"", "", nf.get("formatCode", "")))
    }
    date_fmts = _BUILTIN_DATE_FMTS | custom_date_fmts
    out = set()
    cell_xfs = root.find(f"{MAIN_NS}cellXfs")
    if cell_xfs is not None:
        for i, xf in enumerate(cell_xfs.findall(f"{MAIN_NS}xf")):
            if int(xf.get("numFmtId", "0")) in date_fmts:
                out.add(i)
    return out


def _shared_strings(z: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(z.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    out = []
    for si in root.findall(f"{MAIN_NS}si"):
        # plain <t> or rich-text runs <r><t>
        out.append("".join(t.text or "" for t in si.iter(f"{MAIN_NS}t")))
    return out


def _sheet_part(z: zipfile.ZipFile, sheet_name: str | int) -> str:
    wb = ET.fromstring(z.read("xl/workbook.xml"))
    rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
    target_by_rid = {
        rel.get("Id"): rel.get("Target") for rel in rels.findall(f"{PKG_REL_NS}Relationship")
    }
    sheets = wb.find(f"{MAIN_NS}sheets").findall(f"{MAIN_NS}sheet")
    if isinstance(sheet_name, int):
        if sheet_name >= len(sheets):
            raise ValueError(f"sheet index {sheet_name} out of range ({len(sheets)} sheets)")
        chosen = sheets[sheet_name]
    else:
        by_name = {s.get("name"): s for s in sheets}
        if sheet_name not in by_name:
            raise ValueError(f"sheet {sheet_name!r} not found (have {list(by_name)})")
        chosen = by_name[sheet_name]
    target = target_by_rid[chosen.get(f"{REL_NS}id")]
    return target if target.startswith("xl/") else f"xl/{target.lstrip('/')}"


def _cell_value(c: ET.Element, shared: list[str], date_styles: set[int]) -> Any:
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(f"{MAIN_NS}is")
        return "".join(x.text or "" for x in is_el.iter(f"{MAIN_NS}t")) if is_el is not None else None
    v = c.find(f"{MAIN_NS}v")
    if v is None or v.text is None:
        return None
    raw = v.text
    if t == "s":
        return shared[int(raw)]
    if t == "str":
        return raw
    if t == "b":
        return raw == "1"
    if t == "e":  # error cell (#DIV/0! etc.)
        return None
    # numeric; style decides date-ness
    num = float(raw)
    if int(c.get("s", "-1") or "-1") in date_styles:
        val = _EXCEL_EPOCH + dt.timedelta(days=num)
        if num == int(num):
            return dt.datetime(val.year, val.month, val.day)
        # round sub-second serial noise to the nearest millisecond
        micro = round(val.microsecond / 1000) * 1000
        if micro == 1_000_000:
            val, micro = val + dt.timedelta(seconds=1), 0
        return val.replace(microsecond=micro)
    return num


def read_xlsx_bytes(
    data: bytes,
    sheet_name: str | int = 0,
    header_row: int = 0,
    skip_rows: int = 0,
) -> tuple[list[str], list[list[Any]]]:
    """Decode one workbook → (column names, rows). `header_row` is the
    0-based row holding column names; `skip_rows` drops extra rows after it
    (ExcelFileDataObject.scala rowRange semantics)."""
    with zipfile.ZipFile(io.BytesIO(data)) as z:
        shared = _shared_strings(z)
        date_styles = _date_style_ids(z)
        part = _sheet_part(z, sheet_name)
        root = ET.fromstring(z.read(part))
        grid: dict[int, dict[int, Any]] = {}
        max_col = -1
        for row in root.iter(f"{MAIN_NS}row"):
            r_idx = int(row.get("r", len(grid) + 1)) - 1
            cells: dict[int, Any] = {}
            for pos, c in enumerate(row.findall(f"{MAIN_NS}c")):
                ref = c.get("r")
                col = _col_index(ref) if ref else pos
                cells[col] = _cell_value(c, shared, date_styles)
                max_col = max(max_col, col)
            grid[r_idx] = cells
    if not grid:
        return [], []
    dense = [
        [grid.get(r, {}).get(c) for c in range(max_col + 1)]
        for r in range(min(grid), max(grid) + 1)
    ]
    header = dense[header_row] if header_row < len(dense) else []
    columns = [
        str(h) if h is not None else f"_c{i}" for i, h in enumerate(header)
    ]
    body = dense[header_row + 1 + skip_rows :]
    return columns, body


# ------------------------------------------------------------------ write


def _esc(s: str) -> str:
    return (
        s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
        .replace('"', "&quot;")
    )


_CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
</Types>"""

_ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

_WB_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
</Relationships>"""

# style index 1 = datetime (builtin numFmtId 22: m/d/yy h:mm)
_STYLES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>
<fills count="1"><fill><patternFill patternType="none"/></fill></fills>
<borders count="1"><border/></borders>
<cellStyleXfs count="1"><xf numFmtId="0"/></cellStyleXfs>
<cellXfs count="2"><xf numFmtId="0" xfId="0"/><xf numFmtId="22" xfId="0" applyNumberFormat="1"/></cellXfs>
</styleSheet>"""


def _workbook_xml(sheet_name: str) -> str:
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{_esc(sheet_name)}" sheetId="1" r:id="rId1"/></sheets>'
        "</workbook>"
    )


def _cell_xml(ref: str, value: Any) -> str:
    if value is None or (isinstance(value, float) and value != value):
        return ""
    if isinstance(value, bool):
        return f'<c r="{ref}" t="b"><v>{1 if value else 0}</v></c>'
    if isinstance(value, (dt.datetime, dt.date)):
        if isinstance(value, dt.date) and not isinstance(value, dt.datetime):
            value = dt.datetime(value.year, value.month, value.day)
        serial = (value.replace(tzinfo=None) - _EXCEL_EPOCH).total_seconds() / 86400.0
        return f'<c r="{ref}" s="1"><v>{serial!r}</v></c>'
    if isinstance(value, (int, float)):
        return f'<c r="{ref}"><v>{value!r}</v></c>'
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{_esc(str(value))}</t></is></c>'


def write_xlsx_bytes(
    columns: list[str],
    rows: list[list[Any]],
    sheet_name: str = "Sheet1",
) -> bytes:
    parts = [
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>\n'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
    ]
    all_rows = [list(columns)] + rows
    for r, row in enumerate(all_rows, start=1):
        cells = "".join(_cell_xml(f"{_col_letter(c)}{r}", v) for c, v in enumerate(row))
        parts.append(f'<row r="{r}">{cells}</row>')
    parts.append("</sheetData></worksheet>")
    sheet_xml = "".join(parts)

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES)
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", _workbook_xml(sheet_name))
        z.writestr("xl/_rels/workbook.xml.rels", _WB_RELS)
        z.writestr("xl/styles.xml", _STYLES)
        z.writestr("xl/worksheets/sheet1.xml", sheet_xml)
    return buf.getvalue()
