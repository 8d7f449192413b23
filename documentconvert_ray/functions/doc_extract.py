"""Legacy Word binary (.doc) → Markdown extraction, stdlib-only.

The reference converts .doc via LibreOffice→PDF→MinerU
(services/document_service.py:128-185, 599-650); 3 of the 7 documents
in its own test corpus are .doc. This leg parses the MS-DOC format
directly (plain-text fidelity — the VERDICT r2 #1 scope):

- CFB container (functions/ole2.py) → ``WordDocument`` + table stream;
- FIB: ``wIdent`` 0xA5EC magic, flag bit 0x0200 picks ``1Table`` vs
  ``0Table``, fcClx/lcbClx at FIB offset 0x1A2 (the Word-97+ layout,
  constant for every nFib the format ever shipped);
- Clx → Pcdt ('clxt' 2) → PlcPcd piece table: n+1 CPs + n PCDs; each
  piece maps a CP range to a WordDocument offset, 2nd PCD dword bit 30
  = fCompressed (cp1252 single-byte, offset/2) vs UTF-16LE;
- control characters: 0x0D/0x0B end paragraphs, 0x07 ends a table
  cell/row (rendered as markdown table rows), field begin/separator
  0x13/0x14 drop the instruction half, 0x15 ends the field result,
  object anchors (0x01, 0x08) drop.

Classification is byte-deterministic and mirrored by the flagship SQL
oracle: an OLE2 payload whose bytes contain the UTF-16LE stream name
``WordDocument`` extracts (the corpus writer always emits parseable
files); containers without any known office stream name classify
``office_unsupported``; marker present but container unparseable →
``office_truncated`` (the corpus truncation variant cuts before the
directory, removing the marker, so both sides agree).
"""

from __future__ import annotations

import re
import struct

from ..config import DEFAULT_CONFIG, ExtractConfig
from .html_extract import ExtractResult
from .markdown import Block, render, render_table
from .ole2 import CfbError, cfb_streams

DOC_MARKER = "WordDocument".encode("utf-16-le")
XLS_MARKERS = ("Workbook".encode("utf-16-le"), "Book".encode("utf-16-le"))
PPT_MARKER = "PowerPoint Document".encode("utf-16-le")

_WS_RE = re.compile(r"\s+")


class DocError(ValueError):
    pass


def _pieces(word: bytes, table: bytes) -> list[tuple[int, int, bool]]:
    """Piece table: [(WordDocument offset, n_chars, is_unicode), ...]."""
    if len(word) < 0x1AA:
        raise DocError("WordDocument stream too short for FIB")
    (fc_clx, lcb_clx) = struct.unpack_from("<II", word, 0x1A2)
    if lcb_clx == 0 or fc_clx + lcb_clx > len(table):
        raise DocError("missing Clx")
    clx = table[fc_clx:fc_clx + lcb_clx]
    i = 0
    while i < len(clx):
        t = clx[i]
        if t == 1:  # Prc (property modifier): skip
            if i + 3 > len(clx):
                raise DocError("truncated Prc")
            (cb,) = struct.unpack_from("<H", clx, i + 1)
            i += 3 + cb
        elif t == 2:  # Pcdt → PlcPcd
            (lcb,) = struct.unpack_from("<I", clx, i + 1)
            plc = clx[i + 5:i + 5 + lcb]
            if len(plc) < lcb or (lcb - 4) % 12:
                raise DocError("bad PlcPcd size")
            n = (lcb - 4) // 12
            cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
            out = []
            for k in range(n):
                (fc_raw,) = struct.unpack_from(
                    "<I", plc, (n + 1) * 4 + k * 8 + 2)
                compressed = bool(fc_raw & 0x40000000)
                fc = fc_raw & 0x3FFFFFFF
                if compressed:
                    fc //= 2
                out.append((fc, cps[k + 1] - cps[k], not compressed))
            return out
        else:
            raise DocError(f"unknown clx type {t}")
    raise DocError("no Pcdt in Clx")


def _doc_text(word: bytes, table: bytes) -> str:
    chunks: list[str] = []
    for (fc, n_chars, unicode_) in _pieces(word, table):
        if n_chars <= 0:
            continue
        nb = n_chars * (2 if unicode_ else 1)
        raw = word[fc:fc + nb]
        if len(raw) < nb:
            raise DocError("piece beyond WordDocument stream")
        chunks.append(raw.decode("utf-16-le" if unicode_ else "cp1252",
                                 "replace"))
    return "".join(chunks)


# innermost complete field: \x13 instruction \x14 result \x15 → keep
# the result; \x13 instruction \x15 (no separator) → drop whole field.
# Applied to fixpoint so NESTED fields (TOC containing PAGE refs,
# HYPERLINK inside REF — routine in real .doc files) reduce from the
# inside out instead of leaking the outer instruction and raw \x14.
_FIELD_FULL_RE = re.compile("\x13[^\x13\x14\x15]*\x14([^\x13\x14\x15]*)\x15")
_FIELD_BARE_RE = re.compile("\x13[^\x13\x14\x15]*\x15")
_DROP_RE = re.compile("[\x00\x01\x02\x05\x08\x13\x14\x15\x0c]")


def _strip_fields(text: str) -> str:
    while "\x13" in text:
        new = _FIELD_FULL_RE.sub(r"\1", text)
        new = _FIELD_BARE_RE.sub("", new)
        if new == text:
            break  # unterminated/garbled field: leftover marks drop below
        text = new
    return _DROP_RE.sub("", text)


def _text_blocks(text: str) -> list[Block]:
    """Character stream → paragraph / table blocks. 0x07 terminates a
    table cell; an EMPTY 0x07-run (the TTP mark real Word emits right
    after the last cell's mark) terminates the row. Plain-char-stream
    limitation: a genuinely empty non-first cell is indistinguishable
    from a row mark without PAP fTtp flags, so it closes the row —
    acceptable for plain-text fidelity (documented scope)."""
    text = _strip_fields(text)
    text = text.replace("\x0b", "\r").replace("\xa0", " ")

    blocks: list[Block] = []
    table_rows: list[list[str]] = []

    def flush_table() -> None:
        nonlocal table_rows
        md = render_table(table_rows)
        table_rows = []
        if md:
            blocks.append(Block("table", md))

    row: list[str] = []
    for para in text.split("\r"):
        if "\x07" in para:
            cells = para.split("\x07")
            # every element but the last was 0x07-terminated: non-empty
            # → a cell; empty with cells pending → the row (TTP) mark
            for c in cells[:-1]:
                c = _WS_RE.sub(" ", c).strip()
                if c == "" and row:
                    table_rows.append(row)
                    row = []
                else:
                    row.append(c)
            tail = _WS_RE.sub(" ", cells[-1]).strip()
            if row:
                table_rows.append(row)
                row = []
            if tail:
                flush_table()
                blocks.append(Block("para", tail))
        else:
            if row:
                table_rows.append(row)
                row = []
            flush_table()
            p = _WS_RE.sub(" ", para).strip()
            if p:
                blocks.append(Block("para", p))
    if row:
        table_rows.append(row)
    flush_table()
    return blocks


def extract_ole2(raw: bytes,
                 cfg: ExtractConfig = DEFAULT_CONFIG) -> ExtractResult:
    """bytes (OLE2 magic) → (text_md, spans). Never raises."""
    try:
        try:
            streams = cfb_streams(raw)
        except (CfbError, struct.error) as e:
            if DOC_MARKER in raw or PPT_MARKER in raw or any(
                    m in raw for m in XLS_MARKERS):
                return ExtractResult(
                    False, "", [], "office_truncated",
                    f"broken compound file: {e}"[:200])
            return ExtractResult(
                False, "", [], "office_unsupported",
                f"unparseable OLE2 container: {e}"[:200])
        if "WordDocument" in streams:
            return _extract_doc(streams)
        if "PowerPoint Document" in streams:
            return _extract_ppt(streams["PowerPoint Document"])
        wb = streams.get("Workbook", streams.get("Book"))
        if wb is not None:
            return _extract_xls(wb)
        return ExtractResult(
            False, "", [], "office_unsupported",
            "OLE2 container without a known office stream")
    except Exception as e:  # noqa: BLE001 — row-level capture (M12)
        return ExtractResult(False, "", [], "office_parse_error",
                             str(e)[:200])


def _extract_doc(streams: dict) -> ExtractResult:
    word = streams["WordDocument"]
    if len(word) < 12 or struct.unpack_from("<H", word, 0)[0] != 0xA5EC:
        return ExtractResult(False, "", [], "office_truncated",
                             "WordDocument stream has no FIB magic")
    (flags,) = struct.unpack_from("<H", word, 0x0A)
    if flags & 0x0100:  # fEncrypted: password-protected document
        # reference M11's password branch (document_service.py:394-424)
        # — deterministic kind, not a generic parse error. Not in the
        # synthetic corpus (the FIB flag is invisible to the SQL
        # oracle), so this is a real-world-input classification only.
        return ExtractResult(False, "", [], "office_encrypted",
                             "encrypted .doc (FIB fEncrypted set)")
    tbl_name = "1Table" if flags & 0x0200 else "0Table"
    table = streams.get(tbl_name, streams.get(
        "1Table" if tbl_name == "0Table" else "0Table"))
    if table is None:
        return ExtractResult(False, "", [], "office_truncated",
                             f"missing {tbl_name} stream")
    try:
        text = _doc_text(word, table)
    except (DocError, struct.error) as e:
        # struct.error = a Clx/PlcPcd header read ran off the end of a
        # cut table stream — same taxonomy as any other truncation
        return ExtractResult(False, "", [], "office_truncated",
                             f"bad piece table: {e}"[:200])
    text_md, spans = render(_text_blocks(text))
    return ExtractResult(True, text_md, spans)


# ------------------------------------------------- legacy PowerPoint (.ppt)

_PPT_TEXTCHARS = 0x0FA0   # TextCharsAtom: UTF-16LE
_PPT_TEXTBYTES = 0x0FA8   # TextBytesAtom: cp1252


def _extract_ppt(data: bytes) -> ExtractResult:
    """PowerPoint Document stream → one paragraph per text atom.

    Records are [verAndInstance u16 | recType u16 | recLen u32];
    containers (recVer == 0xF) nest, so a linear walk that descends
    into containers visits every atom in document order."""
    paras: list[str] = []

    def walk(lo: int, hi: int, depth: int) -> None:
        i = lo
        while i + 8 <= hi and depth < 32:
            (ver_inst, rtype, rlen) = struct.unpack_from("<HHI", data, i)
            body_lo = i + 8
            body_hi = min(body_lo + rlen, hi)
            if (ver_inst & 0x000F) == 0x000F:
                walk(body_lo, body_hi, depth + 1)
            elif rtype == _PPT_TEXTCHARS:
                paras.append(
                    data[body_lo:body_hi].decode("utf-16-le", "replace"))
            elif rtype == _PPT_TEXTBYTES:
                paras.append(
                    data[body_lo:body_hi].decode("cp1252", "replace"))
            i = body_hi
    walk(0, len(data), 0)
    blocks = []
    for p in paras:
        for line in p.replace("\x0b", "\r").split("\r"):
            line = _WS_RE.sub(" ", line).strip()
            if line:
                blocks.append(Block("para", line))
    text_md, spans = render(blocks)
    return ExtractResult(True, text_md, spans)


# ------------------------------------------------------ legacy Excel (.xls)

_BIFF_SST = 0x00FC
_BIFF_LABELSST = 0x00FD
_BIFF_LABEL = 0x0204
_BIFF_NUMBER = 0x0203
_BIFF_RK = 0x027E
# BIFF8 sheet bounds (Excel 97: 256 cols × 65536 rows); cells beyond
# them only occur in crafted/corrupt streams — dropping them bounds
# the dense output grid (a 1 MB stream could otherwise demand 4e9
# cells via col=65535 records)
_XLS_MAX_COL = 255
_XLS_MAX_CELLS = 1_000_000


def _xlunicode(data: bytes, off: int) -> tuple[str, int]:
    """XLUnicodeRichExtendedString at off → (text, next offset).
    Handles the compressed/uncompressed flag and rich/phonetic tails;
    does NOT handle strings split across Continue records (the corpus
    writer never splits; real files that do lose that one string)."""
    (cch, flags) = struct.unpack_from("<HB", data, off)
    off += 3
    crun = 0
    cbext = 0
    if flags & 0x08:
        (crun,) = struct.unpack_from("<H", data, off)
        off += 2
    if flags & 0x04:
        (cbext,) = struct.unpack_from("<I", data, off)
        off += 4
    if flags & 0x01:
        s = data[off:off + 2 * cch].decode("utf-16-le", "replace")
        off += 2 * cch
    else:
        s = data[off:off + cch].decode("cp1252", "replace")
        off += cch
    off += crun * 4 + cbext
    return s, off


def _extract_xls(data: bytes) -> ExtractResult:
    """Workbook (BIFF8) stream → markdown table of the text/number
    cells in row-major order (LabelSst via the SST, inline Label,
    Number, RK)."""
    sst: list[str] = []
    cells: dict[tuple[int, int], str] = {}
    i = 0
    n = len(data)
    while i + 4 <= n:
        (rtype, rlen) = struct.unpack_from("<HH", data, i)
        body = data[i + 4:i + 4 + rlen]
        i += 4 + rlen
        if rtype == _BIFF_SST and len(body) >= 8:
            (_total, unique) = struct.unpack_from("<II", body, 0)
            off = 8
            try:
                for _ in range(unique):
                    s, off = _xlunicode(body, off)
                    sst.append(s)
            except struct.error:
                pass  # SST continued into a Continue record: keep prefix
        elif rtype == _BIFF_LABELSST and len(body) >= 10:
            (row, col, _ixfe, isst) = struct.unpack_from("<HHHI", body, 0)
            # skip empty SST strings, like the inline-Label branch: an
            # all-empty row must not survive to (and be dropped by)
            # render_table while still widening the grid
            if 0 <= isst < len(sst) and sst[isst]:
                cells[(row, col)] = sst[isst]
        elif rtype == _BIFF_LABEL and len(body) >= 9:
            (row, col, _ixfe) = struct.unpack_from("<HHH", body, 0)
            try:
                s, _ = _xlunicode(body, 6)
            except struct.error:
                s = ""
            if s:
                cells[(row, col)] = s
        elif rtype == _BIFF_NUMBER and len(body) >= 14:
            (row, col, _ixfe) = struct.unpack_from("<HHH", body, 0)
            (v,) = struct.unpack_from("<d", body, 6)
            cells[(row, col)] = f"{v:g}"
        elif rtype == _BIFF_RK and len(body) >= 10:
            (row, col, _ixfe, rk) = struct.unpack_from("<HHHI", body, 0)
            cells[(row, col)] = f"{_rk_value(rk):g}"
    cells = {(r, c): v for (r, c), v in cells.items()
             if c <= _XLS_MAX_COL}
    if not cells:
        return ExtractResult(True, "", [])
    rows = sorted({r for (r, _c) in cells})
    width = max(c for (_r, c) in cells) + 1
    if len(rows) * width > _XLS_MAX_CELLS:
        rows = rows[: _XLS_MAX_CELLS // max(1, width)]
    grid = [[cells.get((r, c), "") for c in range(width)] for r in rows]
    text_md, spans = render([Block("table", render_table(grid))])
    return ExtractResult(True, text_md, spans)


def _rk_value(rk: int) -> float:
    mul = 0.01 if rk & 1 else 1.0
    if rk & 2:  # signed 30-bit integer
        v = rk >> 2
        if v & 0x20000000:
            v -= 0x40000000
        return v * mul
    return struct.unpack("<d", struct.pack("<Q", (rk & ~0x3) << 32))[0] * mul
