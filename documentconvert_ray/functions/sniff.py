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
DOC_OTHER = "other"


def sniff_doc_type(raw: bytes) -> str:
    """Classify payload bytes. Deterministic, order-fixed rules:

    1. ``%PDF-`` magic within the first 1024 bytes (real-world PDFs may
       carry a preamble) → pdf;
    2. an HTML tag hint within the first 4096 bytes (case-insensitive,
       after optional BOM/whitespace) → html;
    3. otherwise → other.
    """
    if not raw:
        return DOC_OTHER
    head = raw[:1024]
    if head.startswith(b"%PDF-") or b"%PDF-" in head:
        return DOC_PDF
    if _HTML_HINT_RE.search(raw[:4096]):
        return DOC_HTML
    return DOC_OTHER
