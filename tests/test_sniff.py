"""Content-type sniffing: magic bytes, never extensions (SURVEY M1/M9)."""

from documentconvert_ray.functions.sniff import (
    DOC_HTML,
    DOC_OFFICE,
    DOC_OTHER,
    DOC_PDF,
    sniff_doc_type,
)


def test_pdf_magic_and_preamble():
    assert sniff_doc_type(b"%PDF-1.4\n...") == DOC_PDF
    assert sniff_doc_type(b"\n\n junk preamble %PDF-1.7\n") == DOC_PDF
    # magic beyond the first 1 KiB does not count
    assert sniff_doc_type(b"x" * 2000 + b"%PDF-1.4") != DOC_PDF


def test_office_ole2_magic():
    assert sniff_doc_type(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1" + b"\0" * 100) \
        == DOC_OFFICE


def test_office_ooxml_zip():
    assert sniff_doc_type(b"PK\x03\x04xx[Content_Types].xmlrest") == DOC_OFFICE
    assert sniff_doc_type(b"PK\x03\x04xxword/document.xml") == DOC_OFFICE
    # a plain zip without office parts is NOT office
    assert sniff_doc_type(b"PK\x03\x04plainzipdata") == DOC_OTHER


def test_html_hints():
    assert sniff_doc_type(b"<!DOCTYPE html><html></html>") == DOC_HTML
    assert sniff_doc_type(b"  <div>x</div>") == DOC_HTML
    assert sniff_doc_type(b"\xef\xbb\xbf<html>") == DOC_HTML


def test_other():
    assert sniff_doc_type(b"") == DOC_OTHER
    assert sniff_doc_type(b"GIF89a\x01\x02") == DOC_OTHER
    assert sniff_doc_type(b"\x00\x01\x02\x03") == DOC_OTHER


def test_precedence_pdf_over_html():
    # payload with both signals: PDF magic wins (order-fixed rules)
    assert sniff_doc_type(b"%PDF-1.4 <html>") == DOC_PDF


def test_odf_zip_routing():
    import io
    import zipfile

    # spec-shaped ODF: stored `mimetype` first — marker in the head
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        zi = zipfile.ZipInfo("mimetype")
        zi.compress_type = zipfile.ZIP_STORED
        z.writestr(zi, "application/vnd.oasis.opendocument.text")
        z.writestr("content.xml", "<office:document-content/>")
    assert sniff_doc_type(buf.getvalue()) == DOC_OFFICE

    # mimetype-less ODF: first local header IS content.xml
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("content.xml", "<office:document-content/>")
    assert sniff_doc_type(buf.getvalue()) == DOC_OFFICE

    # a NON-office zip whose first member merely MENTIONS content.xml
    # (e.g. 'docs/content.xml.md') must not be routed office
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("docs/content.xml.readme", "about content.xml")
    assert sniff_doc_type(buf.getvalue()) == DOC_OTHER
