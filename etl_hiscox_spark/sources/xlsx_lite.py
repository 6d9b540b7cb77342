"""Dependency-free .xlsx read/write (SURVEY.md §2.1 S5).

The reference declares Excel ingestion (``tests/unit/test_ingestion.py:
118-129`` reads .xlsx into the bronze layer); this container has no
openpyxl, so ``read_excel`` previously gated out. SpreadsheetML is public
ECMA-376: a .xlsx is a zip of XML parts — workbook.xml (sheet registry),
worksheets/sheetN.xml (cells), sharedStrings.xml (string pool). This module
implements the subset the reference's inputs need (strings, numbers,
booleans, blanks; no formulas/styles/dates-as-serials) with only the
stdlib: ``zipfile`` + ``xml.etree``.

Scope note: Excel files are driver-side small by nature (the format caps at
~1M rows) — a distributed read is not a thing worth building. The parse
happens on the driver and the result becomes a normal DataFrame, same
policy as the pandas/openpyxl path it falls back from.
"""

from __future__ import annotations

import re
import zipfile
from xml.etree import ElementTree as ET
from xml.sax.saxutils import escape

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_REL_NS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_PKG_REL_NS = "{http://schemas.openxmlformats.org/package/2006/relationships}"

_CELL_REF = re.compile(r"([A-Z]+)(\d+)")


def _col_index(ref: str) -> int:
    """'A1' -> 0, 'AB7' -> 27 (base-26 letters, 1-origin digits ignored)."""
    m = _CELL_REF.match(ref)
    if not m:
        raise ValueError(f"bad cell ref {ref!r}")
    idx = 0
    for ch in m.group(1):
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _sheet_targets(zf: zipfile.ZipFile) -> dict[str, str]:
    """sheet name -> zip member path, in workbook order."""
    wb = ET.fromstring(zf.read("xl/workbook.xml"))
    rels = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    rid_to_target = {
        rel.get("Id"): rel.get("Target") for rel in rels.iter(f"{_PKG_REL_NS}Relationship")
    }
    out: dict[str, str] = {}
    for sh in wb.iter(f"{_NS}sheet"):
        target = rid_to_target[sh.get(f"{_REL_NS}id")]
        if not target.startswith("/"):
            target = "xl/" + target
        out[sh.get("name")] = target.lstrip("/")
    return out


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    out = []
    for si in root.iter(f"{_NS}si"):
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _cell_value(c: ET.Element, shared: list[str]):
    t = c.get("t", "n")
    v = c.find(f"{_NS}v")
    if t == "inlineStr":
        is_el = c.find(f"{_NS}is")
        return "".join(tt.text or "" for tt in is_el.iter(f"{_NS}t")) if is_el is not None else None
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "str":
        return v.text
    if t == "b":
        return v.text == "1"
    # Numbers stay float here; per-column int narrowing happens in
    # read_xlsx_records so a column mixing 1500.5 and 99 is uniformly
    # float (pandas.read_excel behavior) instead of ragged int/float —
    # ragged object columns fail spark.createDataFrame type merging.
    return float(v.text)


def read_xlsx_rows(path: str, sheet: str | int = 0) -> list[list]:
    """Parse one worksheet into a dense list of rows (ragged rows padded
    with None to the sheet's max width).

    Rows Excel omits from sheetData entirely (blank rows) are restored
    from the row elements' ``r`` attributes as all-None rows, so data
    below a blank row keeps its sheet position — without this, subsequent
    rows shift up and header detection can grab the wrong row.
    """
    with zipfile.ZipFile(path) as zf:
        targets = _sheet_targets(zf)
        if isinstance(sheet, int):
            try:
                member = list(targets.values())[sheet]
            except IndexError:
                raise ValueError(f"sheet index {sheet} out of range ({len(targets)} sheets)")
        else:
            if sheet not in targets:
                raise ValueError(f"sheet {sheet!r} not in {sorted(targets)}")
            member = targets[sheet]
        shared = _shared_strings(zf)
        root = ET.fromstring(zf.read(member))
        indexed: dict[int, list] = {}
        next_ri = 1
        for row_el in root.iter(f"{_NS}row"):
            r_attr = row_el.get("r")
            ri = int(r_attr) if r_attr and r_attr.isdigit() else next_ri
            next_ri = ri + 1
            cells: dict[int, object] = {}
            for c in row_el.iter(f"{_NS}c"):
                ref = c.get("r")
                ci = _col_index(ref) if ref else len(cells)
                cells[ci] = _cell_value(c, shared)
            width = max(cells) + 1 if cells else 0
            indexed[ri] = [cells.get(i) for i in range(width)]
    if not indexed:
        return []
    rows = [indexed.get(ri, []) for ri in range(1, max(indexed) + 1)]
    width = max((len(r) for r in rows), default=0)
    return [r + [None] * (width - len(r)) for r in rows]


def read_xlsx_records(path: str, sheet: str | int = 0) -> tuple[list[str], list[list]]:
    """(header, data_rows): first sheet row is the header (stringified).

    Numeric columns are normalized per COLUMN, matching pandas.read_excel:
    all-integral with no blanks -> int; any fractional value or blank ->
    float throughout. Mixed str/number columns are left as parsed.
    """
    rows = read_xlsx_rows(path, sheet)
    if not rows:
        return [], []
    header = [str(h) if h is not None else f"_c{i}" for i, h in enumerate(rows[0])]
    data = [list(r) for r in rows[1:]]
    for ci in range(len(header)):
        col = [r[ci] for r in data if ci < len(r)]
        vals = [v for v in col if v is not None]
        if vals and all(type(v) is float for v in vals):
            if len(vals) == len(col) and all(v.is_integer() for v in vals):
                for r in data:
                    if ci < len(r):
                        r[ci] = int(r[ci])
    return header, data


# ---------------------------------------------------------------------------
# Writer — enough of ECMA-376 to produce files Excel/pandas/this reader all
# open; used by tests and the seed path (inline strings, no style part).
# ---------------------------------------------------------------------------


def _col_letter(idx: int) -> str:
    out = ""
    idx += 1
    while idx:
        idx, rem = divmod(idx - 1, 26)
        out = chr(ord("A") + rem) + out
    return out


def write_xlsx(path: str, header: list[str], rows: list[list], sheet_name: str = "Sheet1") -> None:
    def cell_xml(ci: int, ri: int, v) -> str:
        ref = f"{_col_letter(ci)}{ri}"
        if v is None:
            return ""
        if isinstance(v, bool):
            return f'<c r="{ref}" t="b"><v>{1 if v else 0}</v></c>'
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v!r}</v></c>'
        return f'<c r="{ref}" t="inlineStr"><is><t xml:space="preserve">{escape(str(v))}</t></is></c>'

    all_rows = [list(header)] + [list(r) for r in rows]
    row_xml = "".join(
        f'<row r="{ri}">' + "".join(cell_xml(ci, ri, v) for ci, v in enumerate(row)) + "</row>"
        for ri, row in enumerate(all_rows, start=1)
    )
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        f"<sheetData>{row_xml}</sheetData></worksheet>"
    )
    workbook = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">'
        f'<sheets><sheet name="{escape(sheet_name)}" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
        'Target="worksheets/sheet1.xml"/></Relationships>'
    )
    pkg_rels = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" '
        'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" '
        'Target="xl/workbook.xml"/></Relationships>'
    )
    content_types = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
        '<Default Extension="rels" '
        'ContentType="application/vnd.openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.'
        'openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>'
    )
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", content_types)
        zf.writestr("_rels/.rels", pkg_rels)
        zf.writestr("xl/workbook.xml", workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)
