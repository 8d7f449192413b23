"""Markdown assembly with exact span bookkeeping.

Plays the role of the reference's middle_json → Markdown rendering
step (`pipeline_union_make(pdf_info, MakeMode.MM_MD, image_dir)`,
reference services/document_service.py:268-272): an ordered list of
typed blocks is rendered to one Markdown string, and every block's
exact [start, end) character range in that string is recorded as a
span — the analogue of middle_json's per-page block/span structure
(SURVEY.md §1.1), kept as a native Arrow list<struct> column.

Kinds: heading, para, list_item, table, code, figure.
`page` is 0 for HTML documents and the 0-based page number for PDFs.

Invariants (tested in tests/test_properties.py):
- ``text_md[s.start:s.end]`` reproduces the block text exactly;
- spans are non-overlapping and ordered by start;
- rendering is a pure function of the block list.
"""

from __future__ import annotations

from dataclasses import dataclass

BLOCK_SEP = "\n\n"

# "formula": math-font-driven display-math regions (reference parity:
# MinerU formula_enable, services/document_service.py:240-246; see
# pdf_extract.page_math_fonts for the detection contract)
KINDS = ("heading", "para", "list_item", "table", "code", "figure",
         "formula")


@dataclass(frozen=True)
class Block:
    kind: str
    text: str  # fully rendered markdown for this block (no trailing sep)
    page: int = 0


def render_table(rows: list[list[str]]) -> str:
    """Cell grid → markdown table text (first row is the header).

    One formatter for the PDF-table, OOXML docx/xlsx and legacy
    .doc/.xls legs (the HTML leg keeps its own renderer — it must
    SYNTHESIZE a blank header row for <th>-less tables, where this one
    drops all-empty rows): escapes ``|`` in cells, pads ragged rows to
    the widest row, emits header + ``---`` separator + body. Returns
    "" for an empty/all-empty grid."""
    rows = [r for r in rows if any(r)]
    if not rows:
        return ""
    width = max(len(r) for r in rows)
    norm = [[c.replace("|", "\\|") for c in r] + [""] * (width - len(r))
            for r in rows]
    lines = ["| " + " | ".join(norm[0]) + " |",
             "| " + " | ".join(["---"] * width) + " |"]
    for r in norm[1:]:
        lines.append("| " + " | ".join(r) + " |")
    return "\n".join(lines)


def render(blocks: list[Block]) -> tuple[str, list[dict]]:
    """Join blocks with a blank line; return (text_md, spans).

    Span dicts have keys start, end, kind, page — matching the Arrow
    output type list<struct<start:int64, end:int64, kind:string,
    page:int32>>.
    """
    parts: list[str] = []
    spans: list[dict] = []
    pos = 0
    for b in blocks:
        if not b.text:
            continue
        if parts:
            pos += len(BLOCK_SEP)
        start = pos
        parts.append(b.text)
        pos += len(b.text)
        spans.append({"start": start, "end": pos, "kind": b.kind, "page": b.page})
    return BLOCK_SEP.join(parts), spans
