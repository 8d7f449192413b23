"""Deterministic bytes→str decoding chain for web payloads.

Re-expresses the *semantics* of the reference's mojibake-repair chain
(`EncodingUtils._try_encoding_fixes`, reference
utils/encoding_utils.py:174-225, and `ensure_utf8` :139-158): a fixed,
documented fallback order that never raises and always yields the same
text for the same bytes. The reference applies its chain to filenames;
here it is applied to page payloads, which is where the reference's
converters relied on MinerU to guess encodings.

Fallback order (fixed; SURVEY.md §2.2 M15):

1. BOM sniff (UTF-8 / UTF-16 LE / UTF-16 BE) — decode accordingly.
2. Charset declared in the first 2048 bytes (``<meta charset=...>`` or
   ``<meta http-equiv="content-type" content="...charset=...">`` or an
   XML declaration) — strict decode; on failure fall through.
3. UTF-8 strict.
4. GB18030 strict (superset of GBK/GB2312 — covers the reference's
   gbk→utf-8 leg).
5. Latin-1 (never fails; final fallback).

Returns (text, encoding_name_used).
"""

from __future__ import annotations

import codecs
import re

# Case-insensitive, ASCII-safe charset sniffing over raw bytes.
_META_CHARSET_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([a-zA-Z0-9_\-]+)""", re.IGNORECASE
)
_XML_DECL_RE = re.compile(
    rb"""<\?xml[^>]+encoding\s*=\s*["']([a-zA-Z0-9_\-]+)["']""", re.IGNORECASE
)

# Normalized charset aliases → python codec names (fixed table, no guessing).
_CHARSET_ALIASES = {
    "utf8": "utf-8",
    "utf-8": "utf-8",
    "gbk": "gb18030",
    "gb2312": "gb18030",
    "gb18030": "gb18030",
    "iso-8859-1": "latin-1",
    "latin-1": "latin-1",
    "latin1": "latin-1",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
    "us-ascii": "ascii",
    "ascii": "ascii",
    "big5": "big5",
    "shift-jis": "shift_jis",
    "shift_jis": "shift_jis",
    "euc-jp": "euc_jp",
    "utf-16": "utf-16",
    "utf-16le": "utf-16-le",
    "utf-16be": "utf-16-be",
}


def sniff_declared_charset(head: bytes) -> str | None:
    """Return the python codec name declared in the payload head, if any."""
    m = _META_CHARSET_RE.search(head)
    if m is None:
        m = _XML_DECL_RE.search(head)
    if m is None:
        return None
    name = m.group(1).decode("ascii", "replace").lower()
    return _CHARSET_ALIASES.get(name)


def decode_bytes(raw: bytes) -> tuple[str, str]:
    """Decode payload bytes to text via the fixed fallback chain.

    Deterministic: same bytes → same (text, encoding) always.
    """
    if not raw:
        return "", "utf-8"

    # 1. BOM
    if raw.startswith(codecs.BOM_UTF8):
        return raw[len(codecs.BOM_UTF8):].decode("utf-8", "replace"), "utf-8-sig"
    if raw.startswith(codecs.BOM_UTF16_LE):
        return raw[2:].decode("utf-16-le", "replace"), "utf-16-le"
    if raw.startswith(codecs.BOM_UTF16_BE):
        return raw[2:].decode("utf-16-be", "replace"), "utf-16-be"

    # 2. declared charset (strict; fall through on failure)
    declared = sniff_declared_charset(raw[:2048])
    if declared is not None:
        try:
            return raw.decode(declared), declared
        except (UnicodeDecodeError, LookupError):
            pass

    # 3. utf-8 strict
    try:
        return raw.decode("utf-8"), "utf-8"
    except UnicodeDecodeError:
        pass

    # 4. gb18030 strict
    try:
        return raw.decode("gb18030"), "gb18030"
    except UnicodeDecodeError:
        pass

    # 5. latin-1 (total function)
    return raw.decode("latin-1"), "latin-1"
