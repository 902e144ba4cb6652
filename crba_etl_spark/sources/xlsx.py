"""Minimal stdlib .xlsx sheet reader (SRC-XLS, SURVEY.md §2.1).

The reference ingests real Excel workbooks
(/root/reference/etl/source_adapter/excel.py:1-3,
/root/reference/etl/source_adapter/manual.py:1-3); pandas' read_excel
needs openpyxl, which cannot be installed in this environment. An .xlsx
file is just a zip of XML parts (ECMA-376 / ISO 29500 SpreadsheetML), so
this module parses the subset a data sheet actually uses with nothing
but ``zipfile`` + ``xml.etree.ElementTree``:

- workbook.xml + its .rels      → sheet name → worksheet part path
- sharedStrings.xml             → the shared-string table (incl. rich
                                  text runs, which concatenate)
- worksheets/sheetN.xml         → the cell grid: typed cells
  (t="s" shared string, t="inlineStr", t="b" boolean, t="str" formula
  cache, t="e" error → None, default numeric), sparse rows/columns
  padded with None.

Deliberately out of scope (documented, loud): date/time styling (Excel
stores dates as serial numbers + a number format; without a style table
lookup they surface as floats), formula evaluation (the cached value is
returned), and the legacy binary .xls container.

Returned as a pandas DataFrame so it plugs into the ``pandas_files``
mapInPandas seam (sources/registry.py) exactly like read_csv/read_stata:
the FILE LIST is the parallelism unit; each executor parses whole
workbooks (the format is not splittable).
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET

_NS_MAIN = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_NS_PREL = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_NS_DREL = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
)
_CELL_REF = re.compile(r"([A-Z]+)(\d+)$")


def _col_index(ref: str) -> int:
    """'A1' -> 0, 'B3' -> 1, 'AA7' -> 26 (base-26 column letters)."""
    m = _CELL_REF.match(ref)
    if not m:
        raise ValueError(f"malformed cell reference {ref!r}")
    idx = 0
    for ch in m.group(1):
        idx = idx * 26 + (ord(ch) - ord("A") + 1)
    return idx - 1


def _text_of(el) -> str:
    """Concatenate every <t> descendant — plain and rich-text runs."""
    return "".join(t.text or "" for t in el.iter(f"{_NS_MAIN}t"))


def _shared_strings(z: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(z.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    return [_text_of(si) for si in root.iter(f"{_NS_MAIN}si")]


def _sheet_paths(z: zipfile.ZipFile) -> dict[str, str]:
    """sheet name -> zip member path, in workbook order."""
    rels = {}
    for rel in ET.fromstring(z.read("xl/_rels/workbook.xml.rels")).iter(
        f"{_NS_PREL}Relationship"
    ):
        target = rel.get("Target", "")
        rels[rel.get("Id")] = (
            target.lstrip("/") if target.startswith("/") else f"xl/{target}"
        )
    out: dict[str, str] = {}
    for sheet in ET.fromstring(z.read("xl/workbook.xml")).iter(f"{_NS_MAIN}sheet"):
        rid = sheet.get(f"{_NS_DREL}id")
        out[sheet.get("name")] = rels[rid]
    return out


def _cell_value(c, shared: list[str]):
    t = c.get("t", "n")
    if t == "inlineStr":
        is_el = c.find(f"{_NS_MAIN}is")
        return _text_of(is_el) if is_el is not None else None
    v = c.find(f"{_NS_MAIN}v")
    if v is None or v.text is None:
        return None
    raw = v.text
    if t == "s":
        return shared[int(raw)]
    if t == "str":
        return raw
    if t == "b":
        return bool(int(raw))
    if t == "e":
        return None  # cell error (#DIV/0! etc.) — no value to carry
    # t == "n" (or absent): ECMA-376 number; keep ints exact
    try:
        return int(raw)
    except ValueError:
        return float(raw)


def read_xlsx(path, sheet: str | int = 0, header: bool = True):
    """Read one worksheet of an .xlsx workbook into a pandas DataFrame.

    ``sheet`` selects by name or 0-based workbook position. With
    ``header=True`` (the pandas default shape) the first non-empty row
    supplies column names; otherwise columns are named col0..colN.
    Sparse cells/rows come back as None — column dtypes are object,
    exactly what the mapInPandas seam's schema projection expects.
    """
    import pandas as pd

    with zipfile.ZipFile(path) as z:
        sheets = _sheet_paths(z)
        if isinstance(sheet, int):
            try:
                sheet_name = list(sheets)[sheet]
            except IndexError:
                raise ValueError(
                    f"{path}: sheet index {sheet} out of range "
                    f"(workbook has {list(sheets)})"
                ) from None
        else:
            sheet_name = sheet
            if sheet_name not in sheets:
                raise ValueError(
                    f"{path}: no sheet named {sheet_name!r} "
                    f"(workbook has {list(sheets)})"
                )
        shared = _shared_strings(z)
        root = ET.fromstring(z.read(sheets[sheet_name]))

    rows: list[dict[int, object]] = []
    n_cols = 0
    for row in root.iter(f"{_NS_MAIN}row"):
        vals: dict[int, object] = {}
        for c in row.iter(f"{_NS_MAIN}c"):
            ref = c.get("r")
            # cells without an r attribute are positional — rare, but legal
            ci = _col_index(ref) if ref else len(vals)
            vals[ci] = _cell_value(c, shared)
        if vals:
            n_cols = max(n_cols, max(vals) + 1)
        rows.append(vals)

    grid = [[r.get(i) for i in range(n_cols)] for r in rows]
    if header:
        first = next((i for i, g in enumerate(grid) if any(v is not None for v in g)), None)
        if first is None:
            return pd.DataFrame()
        names = [
            str(v) if v is not None else f"col{i}"
            for i, v in enumerate(grid[first])
        ]
        return pd.DataFrame(grid[first + 1 :], columns=names, dtype=object)
    return pd.DataFrame(grid, columns=[f"col{i}" for i in range(n_cols)], dtype=object)
