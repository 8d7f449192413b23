"""ODF (.odt/.ods/.odp) and RTF extraction legs (reference
office_formats, services/document_service.py:49-56 — LibreOffice there,
direct stdlib parses here)."""

import random
import re

from documentconvert_ray.functions.office_extract import extract_docx
from documentconvert_ray.functions.rtf_extract import extract_rtf
from documentconvert_ray.functions.sniff import DOC_OFFICE, sniff_doc_type
from documentconvert_ray.sources.corpus import (
    make_odp,
    make_ods,
    make_odt,
    make_rtf,
)

_WS = re.compile(r"\s+")


def _flat(md: str) -> str:
    return _WS.sub(" ", md.replace("|", " ").replace("#", " ")).strip()


# ------------------------------------------------------------------ ODF


def test_odt_headings_paragraphs_table():
    payload, _ = make_odt(random.Random(3))
    assert sniff_doc_type(payload) == DOC_OFFICE
    res = extract_docx(payload)
    assert res.ok
    assert res.text_md.startswith("# ")  # outline-level 1 title


def test_odt_span_and_space_elements_join():
    body = ("<office:text><text:p>alpha<text:span>beta</text:span>"
            "<text:s/>gamma</text:p></office:text>")
    from documentconvert_ray.sources.corpus import _odf_zip

    res = extract_docx(_odf_zip("odt", body))
    assert res.ok
    assert res.text_md == "alphabeta gamma"


def test_odt_table_cells_render_markdown():
    body = ('<office:text><table:table table:name="T">'
            "<table:table-row>"
            "<table:table-cell><text:p>h1</text:p></table:table-cell>"
            "<table:table-cell><text:p>h2</text:p></table:table-cell>"
            "</table:table-row><table:table-row>"
            "<table:table-cell><text:p>a</text:p></table:table-cell>"
            "<table:table-cell><text:p>b</text:p></table:table-cell>"
            "</table:table-row></table:table></office:text>")
    from documentconvert_ray.sources.corpus import _odf_zip

    res = extract_docx(_odf_zip("odt", body))
    assert "| h1 | h2 |" in res.text_md
    assert "| a | b |" in res.text_md
    # cell paragraphs must not double as body paragraphs
    assert res.text_md.count("h1") == 1


def test_ods_repeated_columns_expand():
    body = ('<office:spreadsheet><table:table table:name="S">'
            "<table:table-row>"
            '<table:table-cell table:number-columns-repeated="3">'
            "<text:p>x</text:p></table:table-cell>"
            "</table:table-row></table:table></office:spreadsheet>")
    from documentconvert_ray.sources.corpus import _odf_zip

    res = extract_docx(_odf_zip("ods", body))
    assert res.ok
    assert res.text_md.count(" x ") == 3


def test_odp_slides_in_order():
    payload, naive = make_odp(random.Random(5))
    res = extract_docx(payload)
    assert res.ok
    nums = [int(m) for m in re.findall(r"## Slide (\d+)", res.text_md)]
    assert nums == sorted(nums) and nums[0] == 1
    for w in naive.split():
        assert w in _flat(res.text_md)


def test_odf_generator_roundtrip():
    for seed in range(20):
        for mk in (make_odt, make_ods, make_odp):
            payload, naive = mk(random.Random(seed))
            res = extract_docx(payload)
            assert res.ok, (mk.__name__, seed, res.error)
            flat = _flat(res.text_md)
            for w in naive.split():
                assert w in flat, (mk.__name__, seed, w)


def test_truncated_odf_classifies_office_truncated():
    payload, _ = make_odt(random.Random(7))
    res = extract_docx(payload[: int(len(payload) * 0.7)])
    assert not res.ok
    assert res.error_kind == "office_truncated"


# ------------------------------------------------------------------ RTF


def test_rtf_basic_paragraphs():
    res = extract_rtf(b"{\\rtf1\\ansi hello world\\par second para\\par}")
    assert res.ok
    assert res.text_md == "hello world\n\nsecond para"


def test_rtf_header_tables_dropped():
    res = extract_rtf(
        b"{\\rtf1\\ansi{\\fonttbl{\\f0 Times;}}{\\colortbl;\\red1;}"
        b"{\\*\\generator acme 1.0;}{\\stylesheet{\\s1 Body;}}"
        b"visible\\par}")
    assert res.ok
    assert res.text_md == "visible"
    assert "Times" not in res.text_md
    assert "acme" not in res.text_md


def test_rtf_formatting_groups_flatten():
    res = extract_rtf(b"{\\rtf1 plain {\\b bold} {\\i\\fs48 italic} end}")
    assert res.text_md == "plain bold italic end"


def test_rtf_hex_escapes_cp1252():
    res = extract_rtf(b"{\\rtf1\\ansi\\ansicpg1252 caf\\'e9 na\\'efve}")
    assert res.text_md == "café naïve"


def test_rtf_unicode_escapes_skip_fallback():
    # \uc1 → one fallback char after each \uN must be dropped
    res = extract_rtf(b"{\\rtf1\\uc1 A\\u8212?B \\u24179?\\u25910?}")
    assert res.text_md == "A—B 平收"
    # \uc2 → two fallback chars dropped
    res = extract_rtf(b"{\\rtf1\\uc2 \\u956??X}")
    assert res.text_md == "μX"
    # negative code point wraps per spec
    res = extract_rtf(b"{\\rtf1\\uc1 \\u-3913?}")
    assert res.text_md == chr(-3913 + 65536)


def test_rtf_special_char_words():
    res = extract_rtf(
        b"{\\rtf1 a\\~b\\emdash c\\lquote d\\rquote\\tab e\\line f}")
    assert res.text_md == "a b—c‘d’ e\nf"


def test_rtf_bin_skipped():
    res = extract_rtf(b"{\\rtf1 x\\bin5 \xd0\xcf\x00\xff{y\\par}")
    assert res.ok
    assert res.text_md == "xy"


def test_rtf_escaped_braces_and_backslash():
    res = extract_rtf(b"{\\rtf1 a\\{b\\}c\\\\d}")
    assert res.text_md == "a{b}c\\d"


def test_rtf_truncation_total():
    payload, _ = make_rtf(random.Random(11))
    for frac in (0.9, 0.6, 0.3, 0.1):
        res = extract_rtf(payload[: int(len(payload) * frac)])
        assert res.ok  # scanner is total: prefix still extracts


def test_rtf_generator_roundtrip():
    for seed in range(20):
        payload, naive = make_rtf(random.Random(seed))
        assert sniff_doc_type(payload) == DOC_OFFICE
        res = extract_rtf(payload)
        assert res.ok, (seed, res.error)
        flat = _flat(res.text_md)
        for w in naive.split():
            assert w in flat, (seed, w)


def test_rtf_non_rtf_rejected():
    res = extract_rtf(b"not rtf at all")
    assert not res.ok
    assert res.error_kind == "office_unsupported"


# -------------------------------------------- review-finding regressions


def test_rtf_surrogate_pairs_combine():
    # non-BMP chars arrive as TWO \uN words (16-bit signed surrogate
    # halves); they must combine and the result must be sha256-able
    import hashlib

    res = extract_rtf(b"{\\rtf1\\uc1 hello \\u-10179?\\u-9089? world\\par}")
    assert res.ok
    assert res.text_md == "hello \U0001F47F world"
    hashlib.sha256(res.text_md.encode("utf-8"))  # must not raise


def test_rtf_lone_surrogate_replaced():
    res = extract_rtf(b"{\\rtf1\\uc1 a\\u-10179?b}")
    assert res.ok
    assert "\ud800" not in res.text_md and "�" in res.text_md
    res.text_md.encode("utf-8")  # must not raise


def test_rtf_mixed_case_word_ignored_whole():
    res = extract_rtf(b"{\\rtf1 a\\Xyz b}")
    assert res.text_md == "ab"  # 'yz' must NOT leak into the text


def test_rtf_pend_skip_dies_with_group():
    # the \uN fallback lives in the \uN's group: a '}' discards the
    # unconsumed skip instead of swallowing following text
    res = extract_rtf(b"{\\rtf1\\uc1 {\\u956}X}")
    assert res.text_md == "μX"


def test_odf_attributeless_table_extracts():
    from documentconvert_ray.sources.corpus import _odf_zip

    body = ("<office:spreadsheet><table:table>"
            "<table:table-row>"
            "<table:table-cell><text:p>v1</text:p></table:table-cell>"
            "<table:table-cell><text:p>v2</text:p></table:table-cell>"
            "</table:table-row></table:table></office:spreadsheet>")
    res = extract_docx(_odf_zip("ods", body))
    assert res.ok
    assert "v1" in res.text_md and "v2" in res.text_md


def test_odf_covered_cells_keep_position():
    from documentconvert_ray.sources.corpus import _odf_zip

    body = ('<office:spreadsheet><table:table table:name="S">'
            "<table:table-row>"
            "<table:table-cell><text:p>h1</text:p></table:table-cell>"
            "<table:table-cell><text:p>h2</text:p></table:table-cell>"
            "<table:table-cell><text:p>h3</text:p></table:table-cell>"
            "</table:table-row><table:table-row>"
            '<table:table-cell table:number-columns-spanned="2">'
            "<text:p>merged</text:p></table:table-cell>"
            "<table:covered-table-cell/>"
            "<table:table-cell><text:p>c3</text:p></table:table-cell>"
            "</table:table-row></table:table></office:spreadsheet>")
    res = extract_docx(_odf_zip("ods", body))
    assert "| merged |  | c3 |" in res.text_md  # c3 stays under h3
