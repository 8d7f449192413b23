"""URL / filename canonicalization (SURVEY.md §2.2 M14).

Re-implements, from scratch, the semantics of the reference's
URL-decoder (``utils/encoding_utils.py:27-70``): percent-decode a
``%XX``-encoded name with UTF-8, but KEEP the original when decoding
fails or produces mojibake — a decode must never make a name worse.
The mojibake heuristic mirrors the reference's garbled-character list
(``encoding_utils.py:19-25``, the classic UTF-8-read-as-Latin-1
signature) as a rule rather than a table: two adjacent codepoints from
the Latin-1 supplement block.

Pure functions — usable inside any ``map_batches`` normalize stage.
"""

from __future__ import annotations

import re
import urllib.parse

_PCT_RE = re.compile(r"%[0-9A-Fa-f]{2}")


def looks_garbled(text: str) -> bool:
    """UTF-8-bytes-decoded-as-Latin-1 signature: a codepoint that would
    be a UTF-8 lead byte (0xC0-0xEF) immediately followed by one that
    would be a continuation byte (0x80-0xBF) -- e.g. '\u00c3\u00a9' for
    '\u00e9'. Real words with adjacent accented letters ('Gr\u00f6\u00dfe':
    \u00f6=0xF6, \u00df=0xDF) do not match: neither pair has the
    lead+continuation structure."""
    prev_lead = False
    for ch in text:
        o = ord(ch)
        if prev_lead and 0x80 <= o <= 0xBF:
            return True
        prev_lead = 0xC0 <= o <= 0xEF
    return False


def percent_decode(text: str) -> str:
    """Decode %XX sequences (UTF-8) iff present AND the result is not
    mojibake; otherwise return the input unchanged (M14 rule)."""
    if "%" not in text or not _PCT_RE.search(text):
        return text
    try:
        decoded = urllib.parse.unquote(text, encoding="utf-8",
                                       errors="strict")
    except UnicodeDecodeError:
        return text
    if decoded != text and not looks_garbled(decoded):
        return decoded
    return text


def decode_url_filename(url_or_path: str) -> str:
    """Last path segment, percent-decoded per the M14 rule."""
    name = url_or_path.rstrip("/").rsplit("/", 1)[-1]
    return percent_decode(name)


def canonicalize_url(url: str) -> str:
    """Deterministic url canonical form: lowercase scheme+host, strip
    default ports and fragments, percent-decode the path per M14."""
    try:
        p = urllib.parse.urlsplit(url)
    except ValueError:
        return url
    scheme = p.scheme.lower()
    host = p.netloc.lower()
    if host.endswith(":443") and scheme == "https":
        host = host[:-4]
    elif host.endswith(":80") and scheme == "http":
        host = host[:-3]
    path = percent_decode(p.path) or "/"
    return urllib.parse.urlunsplit((scheme, host, path, p.query, ""))
