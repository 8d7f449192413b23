"""Content-type sniffing: payload bytes → doc_type ∈ {html, pdf, other}.

Replaces the reference's extension-based routing
(`DocumentService.validate_input_file` + the conversion dispatcher,
reference services/document_service.py:49-56,83-126): content is
sniffed from magic bytes, never trusted from a name (SURVEY.md §2.2
M1/M9).
"""

from __future__ import annotations

import re

_HTML_HINT_RE = re.compile(
    rb"<(?:!doctype\s+html|html|head|body|div|p|h1|title|meta)[\s>]", re.IGNORECASE
)

DOC_HTML = "html"
DOC_PDF = "pdf"
DOC_OFFICE = "office"
DOC_OTHER = "other"

# OLE2 compound-file magic (legacy .doc/.xls/.ppt)
_OLE2_MAGIC = b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"
# OOXML = a zip whose head names an office part; ODF = a zip whose
# FIRST member is the stored (uncompressed) `mimetype` entry, so the
# opendocument mime string sits in the first ~100 bytes by spec
_ZIP_MAGIC = b"PK\x03\x04"
_OOXML_HINTS = (b"[Content_Types].xml", b"word/", b"xl/", b"ppt/",
                b"mimetypeapplication/vnd.oasis.opendocument")
# ODF packages missing the spec's stored-first `mimetype` member are
# still recognized by their FIRST local-file-header name — a bare
# b"content.xml" substring scan would misroute any non-office zip
# that happens to carry that common filename in its first 4 KiB
_ODF_FIRST_MEMBERS = (b"mimetype", b"content.xml")
# RTF is a text format opened by its version group
_RTF_MAGIC = b"{\\rtf"

# gzip transport wrapper (Common-Crawl payloads are commonly stored
# gzip'd); unwrapped BEFORE content sniffing, bounded by a byte cap
GZIP_MAGIC = b"\x1f\x8b"
MAX_GUNZIP_BYTES = 64 * 1024 * 1024


def gunzip_payload(raw: bytes,
                   max_bytes: int = MAX_GUNZIP_BYTES
                   ) -> tuple[bytes | None, str]:
    """Inflate a gzip-wrapped payload: (inner_bytes, "") on success,
    (None, reason) on a malformed/truncated stream or when the output
    would exceed ``max_bytes`` (zip-bomb guard — the decompressor is
    fed a hard output cap, so a bomb costs O(cap), not O(blowup)).
    Trailing bytes after the first member are ignored (multi-member
    archives are not page payloads)."""
    import zlib

    try:
        d = zlib.decompressobj(wbits=31)  # gzip header + window
        out = d.decompress(raw, max_bytes)
        if d.unconsumed_tail:
            return None, f"gunzip output exceeds {max_bytes}-byte cap"
        out += d.flush()
        if len(out) > max_bytes:
            return None, f"gunzip output exceeds {max_bytes}-byte cap"
        if not d.eof:
            return None, "truncated gzip stream"
        return out, ""
    except zlib.error as exc:
        return None, f"bad gzip stream: {exc}"


def _zip_first_member_name(raw: bytes) -> bytes:
    """Name of the first local-file-header entry (b'' if malformed)."""
    if len(raw) < 30:
        return b""
    nlen = int.from_bytes(raw[26:28], "little")
    return raw[30:30 + nlen]


def sniff_doc_type(raw: bytes) -> str:
    """Classify payload bytes. Deterministic, order-fixed rules:

    1. ``%PDF-`` magic within the first 1024 bytes (real-world PDFs may
       carry a preamble) → pdf;
    2. OLE2 compound-file magic at offset 0, a zip whose first 4 KiB
       names an OOXML/ODF part, or the ``{\\rtf`` group → office (the
       reference's office leg, services/document_service.py:49-56,
       128-185: .doc/.docx/.xls/.xlsx/.ppt/.pptx/.odt/.ods/.odp/.rtf);
    3. an HTML tag hint within the first 4096 bytes (case-insensitive,
       after optional BOM/whitespace) → html;
    4. otherwise → other.
    """
    if not raw:
        return DOC_OTHER
    head = raw[:1024]
    if head.startswith(b"%PDF-") or b"%PDF-" in head:
        return DOC_PDF
    if raw.startswith(_OLE2_MAGIC):
        return DOC_OFFICE
    if raw.startswith(_ZIP_MAGIC) and (
        any(h in raw[:4096] for h in _OOXML_HINTS)
        or _zip_first_member_name(raw) in _ODF_FIRST_MEMBERS
    ):
        return DOC_OFFICE
    if raw.startswith(_RTF_MAGIC):
        return DOC_OFFICE
    if _HTML_HINT_RE.search(raw[:4096]):
        return DOC_HTML
    return DOC_OTHER
