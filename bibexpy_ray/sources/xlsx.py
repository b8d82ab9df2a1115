"""Minimal XLSX sink/source — stdlib only (zipfile + ElementTree).

Every reference service round-trips XLSX (the merged dataset, Statistic
report and overview tables are all .xlsx files —
/root/reference/apps/api/services/merger.py:87-88,
/root/reference/apps/api/services/smart_merger.py:770-779,
/root/reference/apps/api/routers/quality.py:196-214). The engine's run
directories are parquet by design (SURVEY §1.2), but a user migrating
BibexPy analyses still needs an xlsx-compatible sink/source; neither
openpyxl nor xlsxwriter is installable in this sandbox, so this module
implements the minimal OOXML subset directly:

- ``write_xlsx``: one worksheet per DataFrame, header row + typed cells
  (numbers as native ``n`` cells, booleans as ``b``, everything else as
  inline strings — no sharedStrings table needed on the write path).
- ``read_xlsx``: workbook/sheet discovery via the package rels, cell
  parsing for the types this writer emits PLUS shared strings and cached
  formula values, so files written by Excel/openpyxl load too.

This is a DRIVER-SIDE sink for small result tables (cluster reports,
quality overviews, merge audits — the things the reference serves as
.xlsx downloads), not a distributed format: XLSX is a zip of XML with no
row-group parallelism, so big data stays in parquet.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

import numpy as np
import pandas as pd

_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_NS_REL = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_NS_PKG_REL = "http://schemas.openxmlformats.org/package/2006/relationships"

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


def _col_letter(idx: int) -> str:
    """0-based column index -> A, B, …, Z, AA, …"""
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def _cell_xml(ref: str, value) -> str:
    if value is None or (isinstance(value, float) and np.isnan(value)):
        return ""
    if isinstance(value, (bool, np.bool_)):
        return f'<c r="{ref}" t="b"><v>{int(value)}</v></c>'
    if isinstance(value, (int, np.integer)):
        return f'<c r="{ref}"><v>{int(value)}</v></c>'
    if isinstance(value, (float, np.floating)):
        return f'<c r="{ref}"><v>{repr(float(value))}</v></c>'
    text = escape(str(value))
    return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{text}</t></is></c>'


def _sheet_xml(df: pd.DataFrame) -> str:
    rows = []
    header = "".join(
        _cell_xml(f"{_col_letter(j)}1", str(c)) for j, c in enumerate(df.columns)
    )
    rows.append(f'<row r="1">{header}</row>')
    for i, (_, rec) in enumerate(df.iterrows(), start=2):
        cells = "".join(
            _cell_xml(f"{_col_letter(j)}{i}", v) for j, v in enumerate(rec)
        )
        rows.append(f'<row r="{i}">{cells}</row>')
    return (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<worksheet xmlns="{_NS}"><sheetData>' + "".join(rows) +
        "</sheetData></worksheet>"
    )


_SHEETNAME_BAD = re.compile(r"[\\/?*\[\]:]")


def write_xlsx(sheets: "pd.DataFrame | dict[str, pd.DataFrame]", path: str) -> str:
    """Write one or more DataFrames as a minimal valid .xlsx workbook."""
    if isinstance(sheets, pd.DataFrame):
        sheets = {"Sheet1": sheets}
    if not sheets:
        raise ValueError("write_xlsx needs at least one sheet")
    names = [
        (_SHEETNAME_BAD.sub("_", str(n))[:31] or f"Sheet{i+1}")
        for i, n in enumerate(sheets)
    ]
    sheet_entries = "".join(
        f'<sheet name="{escape(n)}" sheetId="{i+1}" r:id="rId{i+1}"/>'
        for i, n in enumerate(names)
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<workbook xmlns="{_NS}" xmlns:r="{_NS_REL}">'
        f"<sheets>{sheet_entries}</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<Relationships xmlns="{_NS_PKG_REL}">'
        + "".join(
            f'<Relationship Id="rId{i+1}" '
            'Type="http://schemas.openxmlformats.org/officeDocument/2006/'
            'relationships/worksheet" '
            f'Target="worksheets/sheet{i+1}.xml"/>'
            for i in range(len(names))
        )
        + "</Relationships>"
    )
    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i+1}.xml" '
        'ContentType="application/vnd.openxmlformats-officedocument.'
        'spreadsheetml.worksheet+xml"/>'
        for i in range(len(names))
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", _CONTENT_TYPES.format(sheet_overrides=overrides))
        z.writestr("_rels/.rels", _ROOT_RELS)
        z.writestr("xl/workbook.xml", workbook)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        for i, df in enumerate(sheets.values()):
            z.writestr(f"xl/worksheets/sheet{i+1}.xml", _sheet_xml(df))
    return path


def _parse_ref(ref: str) -> tuple[int, int]:
    """'B3' -> (row 2, col 1), 0-based."""
    m = re.match(r"([A-Z]+)(\d+)", ref)
    col = 0
    for ch in m.group(1):
        col = col * 26 + (ord(ch) - ord("A") + 1)
    return int(m.group(2)) - 1, col - 1


def _cell_value(cell: ET.Element, shared: list[str]):
    t = cell.get("t", "n")
    if t == "inlineStr":
        node = cell.find(f"{{{_NS}}}is")
        return "".join(x.text or "" for x in node.iter(f"{{{_NS}}}t"))
    v = cell.find(f"{{{_NS}}}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return bool(int(v.text))
    if t == "str":
        return v.text
    txt = v.text
    try:
        if re.fullmatch(r"-?\d+", txt):
            return int(txt)
        return float(txt)
    except ValueError:
        return txt


def read_xlsx(path: str) -> dict[str, pd.DataFrame]:
    """Load every worksheet; first row is the header. Supports this
    writer's cells plus shared strings / cached formula values."""
    with zipfile.ZipFile(path) as z:
        shared: list[str] = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.iter(f"{{{_NS}}}si"):
                shared.append("".join(x.text or "" for x in si.iter(f"{{{_NS}}}t")))
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        rels = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        target_by_id = {
            r.get("Id"): r.get("Target")
            for r in rels.iter(f"{{{_NS_PKG_REL}}}Relationship")
        }
        out: dict[str, pd.DataFrame] = {}
        for sheet in wb.iter(f"{{{_NS}}}sheet"):
            name = sheet.get("name")
            target = target_by_id[sheet.get(f"{{{_NS_REL}}}id")]
            target = target if target.startswith("xl/") else f"xl/{target}"
            root = ET.fromstring(z.read(target))
            grid: dict[int, dict[int, object]] = {}
            max_row = -1  # all-empty rows still count toward the extent
            for row in root.iter(f"{{{_NS}}}row"):
                r_attr = row.get("r")
                if r_attr is not None:
                    max_row = max(max_row, int(r_attr) - 1)
                for cell in row.iter(f"{{{_NS}}}c"):
                    ref = cell.get("r")
                    if ref is None:
                        continue
                    ri, ci = _parse_ref(ref)
                    max_row = max(max_row, ri)
                    grid.setdefault(ri, {})[ci] = _cell_value(cell, shared)
            if max_row < 0:
                out[name] = pd.DataFrame()
                continue
            ncol = max(
                (max(r.keys(), default=-1) for r in grid.values()), default=-1
            ) + 1
            header = [grid.get(0, {}).get(j, f"col{j}") for j in range(ncol)]
            body = [
                [grid.get(i, {}).get(j) for j in range(ncol)]
                for i in range(1, max_row + 1)
            ]
            out[name] = pd.DataFrame(body, columns=[str(h) for h in header])
        return out
