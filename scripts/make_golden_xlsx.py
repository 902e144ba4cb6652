"""One-off generator for tests/fixtures/golden.xlsx.

Builds a REAL ECMA-376 workbook (zip of handwritten SpreadsheetML parts
— openable by Excel/LibreOffice) exercising the cell-grid features the
stdlib reader (crba_etl_spark/sources/xlsx.py) must handle: shared
strings, a rich-text shared string (multiple <r> runs), an inline
string, booleans, ints, floats, a cell error, an empty shared string,
absent cells mid-row, and a second sheet. Checked in so the binary
fixture is reproducible: ``python scripts/make_golden_xlsx.py``.

The fixture is handwritten XML — NOT produced by the reader's own
writer (there is none) — so the golden test is not circular.
"""

import os
import zipfile

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "tests", "fixtures", "golden.xlsx")

CONTENT_TYPES = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/worksheets/sheet2.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
</Types>"""

ROOT_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""

WORKBOOK = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<sheets>
<sheet name="indicators" sheetId="1" r:id="rId1"/>
<sheet name="meta" sheetId="2" r:id="rId2"/>
</sheets>
</workbook>"""

WORKBOOK_RELS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
<Relationship Id="rId3" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>
</Relationships>"""

# 0..7; index 4 is a rich-text string in two runs; index 7 is empty
SHARED_STRINGS = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="9" uniqueCount="9">
<si><t>country</t></si>
<si><t>year</t></si>
<si><t>value</t></si>
<si><t>ok</t></si>
<si><r><t>Côte </t></r><r><t>d&apos;Ivoire</t></r></si>
<si><t>France</t></si>
<si><t>baseline</t></si>
<si><t/></si>
<si><t>note</t></si>
</sst>"""

SHEET1 = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1">
<c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c>
<c r="C1" t="s"><v>2</v></c><c r="D1" t="s"><v>3</v></c>
<c r="E1" t="s"><v>8</v></c>
</row>
<row r="2">
<c r="A2" t="s"><v>5</v></c><c r="B2"><v>2019</v></c>
<c r="C2"><v>3.5</v></c><c r="D2" t="b"><v>1</v></c>
<c r="E2" t="s"><v>6</v></c>
</row>
<row r="3">
<c r="A3" t="s"><v>4</v></c><c r="B3"><v>2020</v></c>
<c r="C3"><v>7</v></c><c r="D3" t="b"><v>0</v></c>
</row>
<row r="4">
<c r="A4" t="inlineStr"><is><t>Egypt</t></is></c><c r="B4"><v>2021</v></c>
<c r="C4"><v>-0.25</v></c>
<c r="E4" t="str"><v>rev 2</v></c>
</row>
<row r="5">
<c r="A5" t="inlineStr"><is><t>Peru</t></is></c><c r="B5"><v>2022</v></c>
<c r="C5" t="e"><v>#DIV/0!</v></c><c r="D5" t="b"><v>1</v></c>
<c r="E5" t="s"><v>7</v></c>
</row>
</sheetData>
</worksheet>"""

SHEET2 = """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
<sheetData>
<row r="1"><c r="A1" t="inlineStr"><is><t>k</t></is></c><c r="B1" t="inlineStr"><is><t>v</t></is></c></row>
<row r="2"><c r="A2" t="inlineStr"><is><t>source</t></is></c><c r="B2" t="inlineStr"><is><t>manual</t></is></c></row>
</sheetData>
</worksheet>"""


def main() -> None:
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", CONTENT_TYPES)
        z.writestr("_rels/.rels", ROOT_RELS)
        z.writestr("xl/workbook.xml", WORKBOOK)
        z.writestr("xl/_rels/workbook.xml.rels", WORKBOOK_RELS)
        z.writestr("xl/sharedStrings.xml", SHARED_STRINGS)
        z.writestr("xl/worksheets/sheet1.xml", SHEET1)
        z.writestr("xl/worksheets/sheet2.xml", SHEET2)
    print(f"wrote {os.path.normpath(OUT)}")


if __name__ == "__main__":
    main()
