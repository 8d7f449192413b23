"""RTF → Markdown extraction, stdlib-only.

The reference routes ``.rtf`` through its LibreOffice office leg
(services/document_service.py:49-56 lists it in ``office_formats``);
this module parses the format directly: RTF is a plain-byte markup
stream of groups (``{...}``), control words (``\\par``, ``\\uN``,
``\\'hh``) and text, so a single linear scan recovers the document
text with no converter.

Scope: paragraph text with correct character decoding — hex escapes
(``\\'hh`` in the declared codepage), unicode escapes (``\\uN`` with
``\\ucN`` skip-count semantics), special-character words (dashes,
quotes, non-breaking space), binary runs (``\\binN`` skipped), and
destination groups (font/color/style tables, ``{\\*...}``) dropped.
Formatting (bold/italic/styles) is intentionally flattened — the
training-data pipeline consumes text.

The parser is TOTAL on arbitrary bytes after the ``{\\rtf`` magic:
truncated or unbalanced payloads still yield their readable prefix
(tolerant like the HTML leg), so classification is deterministic and
the flagship SQL oracle's rule is simply "RTF magic → ok".
"""

from __future__ import annotations

import re

from ..config import DEFAULT_CONFIG, ExtractConfig
from .html_extract import ExtractResult
from .markdown import Block, render

# destinations whose entire group content is non-document text
_SKIP_DESTS = frozenset((
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "object",
    "header", "footer", "headerl", "headerr", "headerf",
    "footerl", "footerr", "footerf", "footnote", "annotation",
    "generator", "themedata", "colorschememapping", "datastore",
    "latentstyles", "listtable", "listoverridetable", "revtbl",
    "xmlnstbl", "filetbl", "operator",
))

# control words that map to a literal character
_PARA_WORDS = frozenset(("par", "sect", "page"))
_CHAR_WORDS = {
    "line": "\n", "tab": "\t",
    "emdash": "—", "endash": "–", "bullet": "•",
    "lquote": "‘", "rquote": "’",
    "ldblquote": "“", "rdblquote": "”",
    "emspace": " ", "enspace": " ", "qmspace": " ",
}

# consume the FULL alphabetic run (case-insensitive) so a mixed-case
# extension word (\moMath …) is ignored whole instead of leaking its
# uppercase tail into the text; all words we INTERPRET are lowercase
_CW_RE = re.compile(rb"[a-zA-Z]{1,32}")
_NUM_RE = re.compile(rb"-?\d{1,10}")
_WS_RE = re.compile(r"[ \t]+")


def _decode_byte(b: int, codepage: str) -> str:
    try:
        return bytes([b]).decode(codepage)
    except (UnicodeDecodeError, LookupError):
        return bytes([b]).decode("latin-1")


def extract_rtf(raw: bytes,
                cfg: ExtractConfig = DEFAULT_CONFIG) -> ExtractResult:
    """bytes → (text_md, spans) for an RTF payload. Never raises."""
    try:
        if not raw.startswith(b"{\\rtf"):
            return ExtractResult(False, "", [], "office_unsupported",
                                 "not an RTF payload")
        paras = _scan(raw)
        blocks = [Block("para", p) for p in paras if p]
        text_md, spans = render(blocks)
        return ExtractResult(True, text_md, spans)
    except Exception as e:  # noqa: BLE001 — row-level capture (M12)
        return ExtractResult(False, "", [], "office_parse_error",
                             str(e)[:200])


def _scan(raw: bytes) -> list:
    """One linear pass → list of paragraph strings.

    Group state (skip-destination flag, \\uc skip count, codepage) is
    a stack so a ``}`` restores the enclosing group's state exactly;
    unknown control words are ignored per the RTF spec's
    forward-compatibility rule."""
    out: list[str] = []  # text fragments of the CURRENT paragraph
    paras: list[str] = []
    codepage = "cp1252"
    # (skipping, uc, pend) per open group; current state at top. pend
    # is the \uN alternate-representation skip count — PER GROUP, so a
    # '}' discards an unconsumed fallback skip (the fallback lives in
    # the \uN's own group per spec) instead of swallowing later text.
    stack: list = [[False, 1, 0]]
    i = 0
    n = len(raw)

    def emit_u(num: int) -> None:
        # \u params are 16-bit signed; non-BMP chars arrive as TWO \u
        # words forming a surrogate pair — combine them, since a lone
        # surrogate cannot be utf-8-encoded and would detonate far
        # from here (batch sha256 / arrow conversion)
        code = (num + 65536 if num < 0 else num) & 0xFFFF
        if (0xDC00 <= code <= 0xDFFF and out and out[-1]
                and 0xD800 <= ord(out[-1][-1]) <= 0xDBFF):
            hi = ord(out[-1][-1])
            out[-1] = out[-1][:-1]
            out.append(chr(0x10000 + ((hi - 0xD800) << 10)
                           + (code - 0xDC00)))
        else:
            out.append(chr(code))

    def flush_para() -> None:
        text = _WS_RE.sub(" ", "".join(out)).strip()
        out.clear()
        if text:
            # a surrogate half whose partner never arrived must not
            # reach text_md (unencodable)
            text = "".join(
                "�" if 0xD800 <= ord(ch) <= 0xDFFF else ch
                for ch in text)
            paras.append(text)

    while i < n:
        c = raw[i]
        if c == 0x7B:  # {
            stack.append(list(stack[-1]))
            i += 1
            continue
        if c == 0x7D:  # }
            if len(stack) > 1:
                stack.pop()
            i += 1
            continue
        if c == 0x5C:  # backslash
            i += 1
            if i >= n:
                break
            c2 = raw[i]
            if c2 == 0x27:  # \'hh hex escape
                hh = raw[i + 1:i + 3]
                i += 3
                if stack[-1][2] > 0:
                    stack[-1][2] -= 1
                    continue
                if not stack[-1][0] and len(hh) == 2:
                    try:
                        out.append(_decode_byte(int(hh, 16), codepage))
                    except ValueError:
                        pass
                continue
            m = _CW_RE.match(raw, i)
            if not m:
                # control symbol: \~ nbsp, \- soft hyphen, \_ hyphen,
                # \\ \{ \} literals; anything else ignored
                sym = chr(c2)
                i += 1
                if sym == "*":
                    # skippable-destination marker: the group holds
                    # non-document data for any reader that doesn't
                    # implement its (extension) destination — we
                    # implement none of them, so skip the group
                    stack[-1][0] = True
                    continue
                if not stack[-1][0] and stack[-1][2] == 0:
                    if sym == "~":
                        out.append(" ")
                    elif sym in "\\{}":
                        out.append(sym)
                    elif sym == "_":
                        out.append("-")
                continue
            word = m.group(0).decode("ascii")
            i = m.end()
            nm = _NUM_RE.match(raw, i)
            num = None
            if nm:
                num = int(nm.group(0))
                i = nm.end()
            if i < n and raw[i] == 0x20:  # delimiter space is consumed
                i += 1
            if word == "bin" and num and num > 0:
                i += num  # raw binary: never text
                continue
            if word == "u" and num is not None:
                if not stack[-1][0]:
                    emit_u(num)
                stack[-1][2] = stack[-1][1]
                continue
            if word == "uc" and num is not None:
                stack[-1][1] = max(0, num)
                continue
            if word == "ansicpg" and num is not None:
                try:
                    codepage = f"cp{num}"
                    "\x41".encode(codepage)  # probe the codec exists
                except LookupError:
                    codepage = "cp1252"
                continue
            if word in _SKIP_DESTS:
                stack[-1][0] = True
                continue
            if word in _PARA_WORDS:
                if not stack[-1][0]:
                    flush_para()
                continue
            if word in _CHAR_WORDS:
                if not stack[-1][0]:
                    out.append(_CHAR_WORDS[word])
                continue
            continue  # unknown control word: ignored
        # plain byte
        i += 1
        if c in (0x0D, 0x0A, 0x00):
            continue  # source line breaks are not text
        if stack[-1][2] > 0:
            stack[-1][2] -= 1
            continue
        if not stack[-1][0]:
            out.append(_decode_byte(c, codepage))

    flush_para()
    return paras
