"""Stdlib xlsx codec + ExcelFileDataObject tests.

The writer emits inline strings; a hand-built workbook with a sharedStrings
part, rich-text runs, formula cells, sparse rows and a second sheet
exercises the reader paths our own writer doesn't produce — pinning the
reader to the OOXML spec rather than to the writer.
Reference semantics: `dataobject/ExcelFileDataObject.scala:56-73`.
"""

from __future__ import annotations

import datetime as dt
import io
import zipfile

import pytest

from smart_data_lake_spark.dataobjects.xlsx import (
    _col_index,
    _col_letter,
    read_xlsx_bytes,
    write_xlsx_bytes,
)


def test_col_letters():
    assert _col_letter(0) == "A" and _col_letter(25) == "Z"
    assert _col_letter(26) == "AA" and _col_letter(27 * 26 - 1) == "ZZ"
    for i in (0, 25, 26, 51, 701, 702, 16383):
        assert _col_index(_col_letter(i) + "1") == i


def test_roundtrip_types():
    cols = ["name", "qty", "ok", "when", "note"]
    rows = [
        ["ä<&>", 1.5, True, dt.datetime(2024, 3, 1, 12, 30, 45), "x"],
        ["b", -2.0, False, None, None],
        [None, None, None, dt.datetime(2020, 1, 1), ""],
    ]
    data = write_xlsx_bytes(cols, rows, sheet_name="S1")
    out_cols, out_rows = read_xlsx_bytes(data, sheet_name="S1")
    assert out_cols == cols
    assert out_rows == rows


def test_date_only_roundtrip():
    data = write_xlsx_bytes(["d"], [[dt.date(2024, 2, 29)]])
    _, rows = read_xlsx_bytes(data)
    # date cells come back as midnight datetimes (Excel stores serials)
    assert rows == [[dt.datetime(2024, 2, 29)]]


def _foreign_workbook() -> bytes:
    """A workbook shaped like Excel's own output: sharedStrings (with a
    rich-text run), two sheets, sparse rows, explicit cell refs, a formula
    cell with cached value, and a custom date style."""
    shared = (
        '<?xml version="1.0"?>'
        '<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="4" uniqueCount="4">'
        "<si><t>id</t></si><si><t>label</t></si>"
        "<si><r><t>ri</t></r><r><t>ch</t></r></si><si><t>plain</t></si></sst>"
    )
    styles = (
        '<?xml version="1.0"?>'
        '<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        '<numFmts count="1"><numFmt numFmtId="164" formatCode="yyyy\\-mm\\-dd"/></numFmts>'
        "<cellStyleXfs><xf/></cellStyleXfs>"
        '<cellXfs count="2"><xf numFmtId="0"/><xf numFmtId="164"/></cellXfs></styleSheet>'
    )
    # row 2 missing entirely; C4 is a formula with cached numeric value
    sheet1 = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="s"><v>1</v></c><c r="C1" t="str"><v>dt</v></c></row>'
        '<row r="3"><c r="A3"><v>1</v></c><c r="B3" t="s"><v>2</v></c><c r="C3" s="1"><v>45352</v></c></row>'
        '<row r="4"><c r="A4"><v>2</v></c><c r="B4" t="s"><v>3</v></c><c r="C4"><f>1+1</f><v>2</v></c></row>'
        "</sheetData></worksheet>"
    )
    sheet2 = (
        '<?xml version="1.0"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
        '<row r="1"><c r="A1" t="inlineStr"><is><t>only</t></is></c></row>'
        '<row r="2"><c r="A2" t="b"><v>1</v></c></row>'
        "</sheetData></worksheet>"
    )
    wb = (
        '<?xml version="1.0"?>'
        '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
        'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>'
        '<sheet name="Data" sheetId="1" r:id="rId1"/><sheet name="Extra" sheetId="2" r:id="rId2"/>'
        "</sheets></workbook>"
    )
    wb_rels = (
        '<?xml version="1.0"?>'
        '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>'
        '<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>'
        '<Relationship Id="rId3" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/sharedStrings" Target="sharedStrings.xml"/>'
        '<Relationship Id="rId4" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>'
        "</Relationships>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/sharedStrings.xml", shared)
        z.writestr("xl/styles.xml", styles)
        z.writestr("xl/worksheets/sheet1.xml", sheet1)
        z.writestr("xl/worksheets/sheet2.xml", sheet2)
    return buf.getvalue()


def test_foreign_workbook_sharedstrings_sparse_formula_customdate():
    cols, rows = read_xlsx_bytes(_foreign_workbook(), sheet_name="Data")
    assert cols == ["id", "label", "dt"]
    # row 2 absent → a row of Nones; serial 45352 with custom date fmt = 2024-03-01
    assert rows == [
        [None, None, None],
        [1.0, "rich", dt.datetime(2024, 3, 1)],
        [2.0, "plain", 2.0],
    ]
    # sheet by index and by name
    cols2, rows2 = read_xlsx_bytes(_foreign_workbook(), sheet_name=1)
    assert cols2 == ["only"] and rows2 == [[True]]
    with pytest.raises(ValueError, match="not found"):
        read_xlsx_bytes(_foreign_workbook(), sheet_name="Nope")


def test_excel_dataobject_roundtrip(spark, tmp_path):
    from smart_data_lake_spark.dataobjects import ExcelFileDataObject

    df = spark.createDataFrame(
        [(1, "a", 1.5, True), (2, "b", None, False), (3, None, 2.5, None)],
        "id long, s string, v double, ok boolean",
    )
    target = str(tmp_path / "report.xlsx")
    do = ExcelFileDataObject(id="xl", path=target, sheet_name="Rep")
    metrics = do.write_dataframe(df)
    assert metrics["records_written"] == 3
    back = ExcelFileDataObject(id="xl2", path=target, sheet_name="Rep").get_dataframe(spark)
    # numbers come back as double (Excel has one numeric type)
    got = {tuple(r) for r in back.collect()}
    assert got == {(1.0, "a", 1.5, True), (2.0, "b", None, False), (3.0, None, 2.5, None)}
    assert [f.dataType.simpleString() for f in back.schema.fields] == [
        "double", "string", "double", "boolean",
    ]


def test_excel_dataobject_multifile_distributed(spark, tmp_path):
    from smart_data_lake_spark.dataobjects import ExcelFileDataObject

    for i in range(3):
        ExcelFileDataObject(id=f"w{i}", path=str(tmp_path / f"wb{i}.xlsx")).write_dataframe(
            spark.createDataFrame([(i, f"r{i}")], "id long, s string")
        )
    do = ExcelFileDataObject(id="all", path=str(tmp_path))
    out = do.get_dataframe(spark)
    assert {tuple(r) for r in out.collect()} == {(0.0, "r0"), (1.0, "r1"), (2.0, "r2")}


def test_excel_dataobject_explicit_schema(spark, tmp_path):
    from smart_data_lake_spark.dataobjects import ExcelFileDataObject

    target = str(tmp_path / "typed.xlsx")
    ExcelFileDataObject(id="w", path=target).write_dataframe(
        spark.createDataFrame([(7, "x")], "id long, s string")
    )
    do = ExcelFileDataObject(id="r", path=target, schema="id long, s string")
    out = do.get_dataframe(spark)
    assert out.schema.simpleString() == "struct<id:bigint,s:string>"
    assert out.collect()[0].asDict() == {"id": 7, "s": "x"}


def test_excel_type_drift_across_workbooks_raises(spark, tmp_path):
    """r6 ADVICE regression: schema is inferred from the first workbook; a
    later workbook whose numeric column holds text must RAISE (like the
    column-name mismatch), not silently null the value."""
    import pytest as _pytest

    from smart_data_lake_spark.dataobjects import ExcelFileDataObject

    ExcelFileDataObject(id="a", path=str(tmp_path / "a.xlsx")).write_dataframe(
        spark.createDataFrame([(1, "x")], "n long, s string")
    )
    ExcelFileDataObject(id="b", path=str(tmp_path / "b.xlsx")).write_dataframe(
        spark.createDataFrame([("oops", "y")], "n string, s string")
    )
    do = ExcelFileDataObject(id="all", path=str(tmp_path))
    with _pytest.raises(Exception, match="type drift"):
        do.get_dataframe(spark).collect()
