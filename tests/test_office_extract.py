"""OOXML (.docx) extraction: stdlib zip+XML subset (SURVEY M2/M4 —
the reference needs LibreOffice; the OOXML slice needs nothing)."""

import io
import random
import zipfile

from documentconvert_ray.functions.office_extract import extract_docx
from documentconvert_ray.sources.corpus import make_docx


def _docx(xml: str, name: str = "word/document.xml") -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr(name, xml)
    return buf.getvalue()


W = '<w:document xmlns:w="x"><w:body>{}</w:body></w:document>'


def test_paragraphs_and_headings():
    xml = W.format(
        '<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr>'
        "<w:r><w:t>Title Here</w:t></w:r></w:p>"
        "<w:p><w:r><w:t>Body text one.</w:t></w:r></w:p>"
    )
    res = extract_docx(_docx(xml))
    assert res.ok
    assert "# Title Here" in res.text_md
    assert "Body text one." in res.text_md


def test_runs_concatenate_and_entities():
    xml = W.format(
        '<w:p><w:r><w:t xml:space="preserve">A &amp; </w:t></w:r>'
        "<w:r><w:t>B</w:t></w:r></w:p>"
    )
    res = extract_docx(_docx(xml))
    assert res.ok and "A & B" in res.text_md


def test_table_renders_markdown():
    xml = W.format(
        "<w:tbl>"
        "<w:tr><w:tc><w:p><w:r><w:t>h1</w:t></w:r></w:p></w:tc>"
        "<w:tc><w:p><w:r><w:t>h2</w:t></w:r></w:p></w:tc></w:tr>"
        "<w:tr><w:tc><w:p><w:r><w:t>a</w:t></w:r></w:p></w:tc>"
        "<w:tc><w:p><w:r><w:t>b</w:t></w:r></w:p></w:tc></w:tr>"
        "</w:tbl>"
    )
    res = extract_docx(_docx(xml))
    assert res.ok
    assert "| h1 | h2 |" in res.text_md
    assert "| a | b |" in res.text_md


def test_truncated_zip_classifies():
    payload = _docx(W.format("<w:p><w:r><w:t>x</w:t></w:r></w:p>"))
    res = extract_docx(payload[: len(payload) * 2 // 3])
    assert not res.ok and res.error_kind == "office_truncated"


def test_missing_document_xml_is_unsupported():
    res = extract_docx(_docx("<x/>", name="other/part.xml"))
    assert not res.ok and res.error_kind == "office_unsupported"


def test_generator_roundtrip_deterministic():
    r1 = random.Random(5)
    r2 = random.Random(5)
    p1, n1 = make_docx(r1)
    p2, n2 = make_docx(r2)
    assert p1 == p2 and n1 == n2  # byte-identical payloads
    res = extract_docx(p1)
    assert res.ok and n1.split()[0] in res.text_md


def _xlsx(sheet_xml: str, shared: list | None = None) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        if shared is not None:
            sst = "<sst>" + "".join(f"<si><t>{s}</t></si>" for s in shared) + "</sst>"
            z.writestr("xl/sharedStrings.xml", sst)
        z.writestr("xl/worksheets/sheet1.xml", sheet_xml)
    return buf.getvalue()


def test_xlsx_shared_inline_and_numeric_cells():
    sheet = (
        '<worksheet><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c>'
        '<c r="B1" t="s"><v>1</v></c></row>'
        '<row r="2"><c r="A2" t="inlineStr"><is><t>inline</t></is></c>'
        '<c r="B2"><v>42</v></c></row>'
        '</sheetData></worksheet>'
    )
    res = extract_docx(_xlsx(sheet, shared=["colA", "colB"]))
    assert res.ok
    assert "| colA | colB |" in res.text_md
    assert "| inline | 42 |" in res.text_md


def test_xlsx_generator_roundtrip():
    r = random.Random(11)
    from documentconvert_ray.sources.corpus import make_xlsx

    p, naive = make_xlsx(r)
    res = extract_docx(p)
    assert res.ok
    for w in naive.split()[:8]:
        assert w in res.text_md.replace("\\|", "|")


def test_ooxml_without_main_part_unsupported():
    # zip with no known main part (not word/, xl/worksheets/, ppt/slides/)
    res = extract_docx(_docx("<x/>", name="visio/pages/page1.xml"))
    assert not res.ok and res.error_kind == "office_unsupported"


def test_pptx_slides_numeric_order():
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("ppt/slides/slide10.xml",
                   "<p:sld><a:p><a:r><a:t>tenth slide text</a:t></a:r></a:p></p:sld>")
        z.writestr("ppt/slides/slide2.xml",
                   "<p:sld><a:p><a:r><a:t>second slide text</a:t></a:r></a:p></p:sld>")
    res = extract_docx(buf.getvalue())
    assert res.ok
    assert res.text_md.index("## Slide 2") < res.text_md.index("## Slide 10")
    assert "second slide text" in res.text_md


def test_pptx_generator_roundtrip():
    from documentconvert_ray.sources.corpus import make_pptx

    r = random.Random(9)
    p, naive = make_pptx(r)
    res = extract_docx(p)
    assert res.ok
    for w in naive.split()[:8]:
        assert w in res.text_md


def test_xlsx_sparse_rows_align_by_reference():
    """Worksheet XML omits empty cells; values must land in their
    r=\"B2\"-addressed columns, not shift left."""
    sheet = (
        '<worksheet><sheetData>'
        '<row r="1"><c r="A1" t="s"><v>0</v></c>'
        '<c r="B1" t="s"><v>1</v></c></row>'
        '<row r="2"><c r="B2"><v>42</v></c></row>'
        '</sheetData></worksheet>'
    )
    res = extract_docx(_xlsx(sheet, shared=["name", "age"]))
    assert res.ok and "|  | 42 |" in res.text_md


def test_xlsx_sheets_numeric_order():
    def one(txt):
        return ('<worksheet><sheetData><row r="1">'
                f'<c r="A1" t="inlineStr"><is><t>{txt}</t></is></c>'
                '</row></sheetData></worksheet>')

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("xl/worksheets/sheet10.xml", one("s10"))
        z.writestr("xl/worksheets/sheet2.xml", one("s2"))
    res = extract_docx(buf.getvalue())
    assert res.text_md.index("s2") < res.text_md.index("s10")


def test_docx_nested_table_keeps_following_content():
    nested = (
        "<w:tbl><w:tr ><w:tc><w:p><w:r><w:t>outer</w:t></w:r></w:p>"
        "<w:tbl><w:tr ><w:tc><w:p><w:r><w:t>inner</w:t></w:r></w:p>"
        "</w:tc></w:tr></w:tbl></w:tc></w:tr></w:tbl>"
        "<w:p ><w:r><w:t>after table paragraph</w:t></w:r></w:p>"
    )
    res = extract_docx(_docx(W.format(nested)))
    assert res.ok
    # the outer span is nesting-balanced: following content survives
    assert "after table paragraph" in res.text_md
