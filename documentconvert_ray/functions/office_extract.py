"""OOXML (.docx) → Markdown extraction, stdlib-only.

The reference's office leg shells out to LibreOffice → PDF → MinerU
(services/document_service.py:128-185, 599-650) because it targets
every legacy format. The modern OOXML subset needs no converter at
all: a .docx is a zip whose ``word/document.xml`` holds paragraphs
(``<w:p>``), text runs (``<w:t>``), heading styles
(``<w:pStyle w:val="HeadingN"/>``) and tables (``<w:tbl>``); this
module parses that subset directly into the same Block/render model
the HTML and PDF legs use. Legacy OLE2 payloads remain classified
``office_unsupported`` error rows.

Determinism: upfront end-of-central-directory check (a zip whose EOCD
record is missing is truncated — the analogue of the PDF %%EOF rule,
and exactly mirrorable in the flagship's SQL oracle); fixed regex
parse, document order preserved.
"""

from __future__ import annotations

import io
import re
import zipfile
from html import unescape

from ..config import DEFAULT_CONFIG, ExtractConfig
from .html_extract import ExtractResult
from .markdown import Block, render, render_table

_P_RE = re.compile(r"<w:p[ >].*?</w:p>|<w:p/>", re.S)
_T_RE = re.compile(r"<w:t(?: [^>]*)?>(.*?)</w:t>", re.S)
_STYLE_RE = re.compile(r'<w:pStyle[^>]*w:val="Heading([1-6])"')
_TBL_RE = re.compile(r"<w:tbl>.*?</w:tbl>", re.S)
_TR_RE = re.compile(r"<w:tr[ >].*?</w:tr>", re.S)
_TC_RE = re.compile(r"<w:tc>.*?</w:tc>", re.S)
_WS_RE = re.compile(r"\s+")

# presentation (pptx) parts
_AP_RE = re.compile(r"<a:p(?: [^>]*)?>.*?</a:p>", re.S)
_AT_RE = re.compile(r"<a:t>(.*?)</a:t>", re.S)
_SLIDE_NUM_RE = re.compile(r"slide(\d+)\.xml$")

# OpenDocument (ODF) parts — content.xml of .odt/.ods/.odp. ODF text
# lives directly in elements (no run wrappers), so paragraph text is
# "strip inner tags, unescape"; <text:s/> and <text:tab/> are explicit
# whitespace elements that must become spaces BEFORE tag stripping.
_ODF_P_RE = re.compile(
    r"<text:h(?: [^>]*)?>.*?</text:h>|<text:p(?: [^>]*)?>.*?</text:p>"
    r"|<text:p(?: [^>]*)?/>", re.S)
_ODF_OUTLINE_RE = re.compile(r'text:outline-level="(\d)"')
_ODF_ROW_RE = re.compile(
    r"<table:table-row(?: [^>]*)?>.*?</table:table-row>", re.S)
# covered cells (under a merged span) must keep their column POSITION
# as an empty value, so the cell pattern matches both element names
_ODF_CELL_RE = re.compile(
    r"<table:(covered-)?table-cell(?: ([^>/]*))?"
    r"(?:/>|>(.*?)</table:(?:covered-)?table-cell>)", re.S)
_ODF_REPEAT_RE = re.compile(r'table:number-columns-repeated="(\d+)"')
_ODF_PAGE_RE = re.compile(r"<draw:page(?: [^>]*)?>.*?</draw:page>", re.S)
_ODF_WS_EL_RE = re.compile(r"<text:(?:s|tab|line-break)\s*/>")
_TAG_RE = re.compile(r"<[^>]+>")

# spreadsheet (xlsx) parts
_ROW_RE = re.compile(r"<row[ >].*?</row>", re.S)
_CELL_RE = re.compile(r"<c(?: ([^>/]*))?(?:/>|>(.*?)</c>)", re.S)
_V_RE = re.compile(r"<v>(.*?)</v>", re.S)
_IS_T_RE = re.compile(r"<t(?: [^>]*)?>(.*?)</t>", re.S)
_SI_RE = re.compile(r"<si>(.*?)</si>", re.S)
_TYPE_RE = re.compile(r'(?:^|\s)t="([^"]+)"')
_REF_COL_RE = re.compile(r'(?:^|\s)r="([A-Z]+)\d+"')
_SHEET_NUM_RE = re.compile(r"sheet(\d+)\.xml$")


def _col_index(letters: str) -> int:
    """'A' → 0, 'B' → 1, … 'AA' → 26 (spreadsheet base-26)."""
    v = 0
    for ch in letters:
        v = v * 26 + (ord(ch) - 64)
    return v - 1


def _runs_text(xml: str) -> str:
    return _WS_RE.sub(" ", unescape("".join(_T_RE.findall(xml)))).strip()


def extract_docx(raw: bytes,
                 cfg: ExtractConfig = DEFAULT_CONFIG) -> ExtractResult:
    """bytes → (text_md, spans) for an OOXML payload. Never raises."""
    try:
        # EOCD check first: the PK\x05\x06 end-of-central-directory
        # record must appear in the final 64 KiB + 22 bytes (the spec's
        # maximum comment length) — missing → truncated payload,
        # classified deterministically. Comment-less zips (all the
        # corpus generates) put it exactly 22 bytes from EOF, which is
        # what the flagship SQL oracle mirrors.
        if len(raw) < 22 or raw.rfind(
            b"PK\x05\x06", max(0, len(raw) - 65557)
        ) < 0:
            return ExtractResult(
                False, "", [], "office_truncated",
                "zip end-of-central-directory record missing")
        try:
            zf = zipfile.ZipFile(io.BytesIO(raw))
            names = set(zf.namelist())
            if "word/document.xml" in names:
                with zf.open("word/document.xml") as f:
                    xml = f.read().decode("utf-8", "replace")
            elif any(n.startswith("xl/worksheets/") for n in names):
                return _extract_xlsx(zf, names)
            elif any(n.startswith("ppt/slides/slide") for n in names):
                return _extract_pptx(zf, names)
            elif "content.xml" in names:
                # OpenDocument (.odt/.ods/.odp): the reference's
                # LibreOffice leg lists these in office_formats
                # (services/document_service.py:49-56); parsed
                # directly from content.xml
                with zf.open("content.xml") as f:
                    return _extract_odf(
                        f.read().decode("utf-8", "replace"))
            else:
                return ExtractResult(
                    False, "", [], "office_unsupported",
                    "OOXML zip without a known main part")
        except zipfile.BadZipFile as e:
            # an EOCD-bearing payload the zip machinery still rejects
            # is cut/corrupt content, not an unsupported format
            return ExtractResult(
                False, "", [], "office_truncated",
                f"corrupt zip structure: {e}"[:200])
        except (KeyError, OSError, NotImplementedError) as e:
            return ExtractResult(
                False, "", [], "office_unsupported",
                f"not a parseable OOXML document: {e}"[:200])

        blocks: list[Block] = []
        # tables are rendered as markdown tables and removed from the
        # paragraph stream (their <w:p> cells would otherwise double);
        # spans are depth-balanced so a table nested inside a cell
        # stays within its OUTER table's span (its text flattens into
        # the containing cell) instead of truncating the outer match
        spans = _balanced_spans(xml, "<w:tbl>", "</w:tbl>")
        tables = [xml[a:b] for a, b in spans]
        segs: list[str] = []
        prev = 0
        for a, b in spans:
            segs.append(xml[prev:a])
            prev = b
        segs.append(xml[prev:])
        ti = 0
        for seg in segs:
            for pm in _P_RE.finditer(seg):
                p = pm.group(0)
                txt = _runs_text(p)
                if not txt:
                    continue
                sm = _STYLE_RE.search(p)
                if sm:
                    blocks.append(
                        Block("heading", "#" * int(sm.group(1)) + " " + txt))
                else:
                    blocks.append(Block("para", txt))
            if ti < len(tables):
                rows = [
                    [_runs_text(tc) for tc in _TC_RE.findall(tr)]
                    for tr in _TR_RE.findall(tables[ti])
                ]
                md = render_table(rows)
                if md:
                    blocks.append(Block("table", md))
                ti += 1
        text_md, spans = render(blocks)
        return ExtractResult(True, text_md, spans)
    except Exception as e:  # noqa: BLE001 — row-level capture (M12)
        return ExtractResult(False, "", [], "office_parse_error",
                             str(e)[:200])


def _extract_xlsx(zf: "zipfile.ZipFile", names: set) -> ExtractResult:
    """xl/worksheets/*.xml → one markdown table per sheet (first row is
    the header). Cell values: shared strings (t="s" → sharedStrings
    index), inline strings (t="inlineStr" → <is><t>), raw <v>
    otherwise."""
    shared: list[str] = []
    if "xl/sharedStrings.xml" in names:
        with zf.open("xl/sharedStrings.xml") as f:
            sst = f.read().decode("utf-8", "replace")
        shared = [
            _WS_RE.sub(" ", unescape("".join(_IS_T_RE.findall(si)))).strip()
            for si in _SI_RE.findall(sst)
        ]
    blocks: list[Block] = []

    def sheet_key(n: str):
        m = _SHEET_NUM_RE.search(n)
        return (0, int(m.group(1)), n) if m else (1, 0, n)

    sheets = sorted(
        (n for n in names
         if n.startswith("xl/worksheets/") and n.endswith(".xml")),
        key=sheet_key)
    for sheet in sheets:
        with zf.open(sheet) as f:
            xml = f.read().decode("utf-8", "replace")
        rows: list[list[str]] = []
        for rxml in _ROW_RE.findall(xml):
            # cells are placed by their r="B2" column reference —
            # worksheet XML omits empty cells, so positional append
            # would shift values into the wrong columns
            by_col: dict[int, str] = {}
            seq = 0
            for cm in _CELL_RE.finditer(rxml):
                attrs = cm.group(1) or ""
                body = cm.group(2) or ""
                tm = _TYPE_RE.search(attrs)
                ctype = tm.group(1) if tm else ""
                if ctype == "s":
                    vm = _V_RE.search(body)
                    idx = int(vm.group(1)) if vm else -1
                    val = shared[idx] if 0 <= idx < len(shared) else ""
                elif ctype == "inlineStr":
                    val = _WS_RE.sub(" ", unescape(
                        "".join(_IS_T_RE.findall(body)))).strip()
                else:
                    vm = _V_RE.search(body)
                    val = unescape(vm.group(1)).strip() if vm else ""
                rm = _REF_COL_RE.search(attrs)
                col = _col_index(rm.group(1)) if rm else seq
                seq = col + 1
                by_col[col] = val
            if by_col:
                width = max(by_col) + 1
                rows.append([by_col.get(j, "") for j in range(width)])
        md = render_table(rows)
        if md:
            blocks.append(Block("table", md))
    text_md, spans = render(blocks)
    return ExtractResult(True, text_md, spans)


def _extract_pptx(zf: "zipfile.ZipFile", names: set) -> ExtractResult:
    """ppt/slides/slideN.xml → per-slide heading + one paragraph per
    <a:p> text block (runs concatenated), slides in numeric order."""
    slides = []
    for n in names:
        m = _SLIDE_NUM_RE.search(n)
        if m and n.startswith("ppt/slides/slide"):
            slides.append((int(m.group(1)), n))
    blocks: list[Block] = []
    for num, name in sorted(slides):
        with zf.open(name) as f:
            xml = f.read().decode("utf-8", "replace")
        paras = []
        for pxml in _AP_RE.findall(xml):
            txt = _WS_RE.sub(
                " ", unescape("".join(_AT_RE.findall(pxml)))).strip()
            if txt:
                paras.append(txt)
        if paras:
            blocks.append(Block("heading", f"## Slide {num}"))
            for txt in paras:
                blocks.append(Block("para", txt))
    text_md, spans = render(blocks)
    return ExtractResult(True, text_md, spans)


def _odf_text(xml: str) -> str:
    """Inner text of an ODF element: whitespace elements → spaces,
    remaining child tags (text:span etc.) stripped, entities
    unescaped, whitespace normalized."""
    return _WS_RE.sub(
        " ", unescape(_TAG_RE.sub("", _ODF_WS_EL_RE.sub(" ", xml)))).strip()


def _odf_table_block(table_xml: str, blocks: list) -> None:
    """One <table:table> → a markdown table block (cells honour
    table:number-columns-repeated; covered/empty cells render '')."""
    rows: list[list[str]] = []
    for rxml in _ODF_ROW_RE.findall(table_xml):
        cells: list[str] = []
        for cm in _ODF_CELL_RE.finditer(rxml):
            covered = cm.group(1)
            attrs = cm.group(2) or ""
            body = cm.group(3) or ""
            val = "" if covered else _odf_text(body)
            rm = _ODF_REPEAT_RE.search(attrs)
            cells.extend([val] * (int(rm.group(1)) if rm else 1))
        if cells:
            rows.append(cells)
    md = render_table(rows)
    if md:
        blocks.append(Block("table", md))


def _extract_odf(xml: str) -> ExtractResult:
    """content.xml → blocks, by document family:

    - ``<office:text>`` (.odt): headings (text:h + outline-level),
      paragraphs (text:p, incl. list items), tables;
    - ``<office:spreadsheet>`` (.ods): one markdown table per
      table:table, in document order;
    - ``<office:presentation>`` (.odp): per-slide heading + one para
      per text:p, pages in document order (mirrors the pptx leg).
    """
    # attribute-less tables would be invisible to the "<table:table "
    # span search (the trailing space exists to exclude table-row /
    # table-cell); normalize them once
    xml = xml.replace("<table:table>", "<table:table >")
    blocks: list[Block] = []
    if "<office:presentation" in xml:
        for num, page in enumerate(_ODF_PAGE_RE.findall(xml), start=1):
            paras = [t for t in
                     (_odf_text(p) for p in _ODF_P_RE.findall(page)) if t]
            if paras:
                blocks.append(Block("heading", f"## Slide {num}"))
                blocks.extend(Block("para", t) for t in paras)
    elif "<office:spreadsheet" in xml:
        for span in _balanced_spans(xml, "<table:table ", "</table:table>"):
            _odf_table_block(xml[span[0]:span[1]], blocks)
    elif "<office:text" in xml:
        spans = _balanced_spans(xml, "<table:table ", "</table:table>")
        segs: list[str] = []
        prev = 0
        for a, b in spans:
            segs.append(xml[prev:a])
            prev = b
        segs.append(xml[prev:])
        ti = 0
        for seg in segs:
            for pm in _ODF_P_RE.finditer(seg):
                p = pm.group(0)
                txt = _odf_text(p)
                if not txt:
                    continue
                om = _ODF_OUTLINE_RE.search(p)
                if p.startswith("<text:h"):
                    lvl = min(6, int(om.group(1))) if om else 1
                    blocks.append(Block("heading", "#" * lvl + " " + txt))
                else:
                    blocks.append(Block("para", txt))
            if ti < len(spans):
                _odf_table_block(xml[spans[ti][0]:spans[ti][1]], blocks)
                ti += 1
    else:
        return ExtractResult(
            False, "", [], "office_unsupported",
            "ODF content.xml without a known document family")
    text_md, out_spans = render(blocks)
    return ExtractResult(True, text_md, out_spans)


def _balanced_spans(xml: str, open_tok: str, close_tok: str) -> list:
    """Spans [start, end) of OUTERMOST open_tok..close_tok regions,
    nesting-aware (regex non-greedy matching would truncate an outer
    region at the first inner close)."""
    spans = []
    depth = 0
    start = 0
    i = 0
    n = len(xml)
    while i < n:
        o = xml.find(open_tok, i)
        c = xml.find(close_tok, i)
        if depth == 0:
            if o < 0:
                break
            start = o
            depth = 1
            i = o + len(open_tok)
            continue
        if c < 0:  # unterminated table: drop it
            break
        if 0 <= o < c:
            depth += 1
            i = o + len(open_tok)
        else:
            depth -= 1
            i = c + len(close_tok)
            if depth == 0:
                spans.append((start, i))
    return spans
