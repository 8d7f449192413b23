"""Bitmap-font OCR: a stdlib nearest-template glyph matcher.

The engine's answer to the reference's image→markdown OCR leg
(reference: services/document_service.py:826-907 — `mineru -p <img>`
subprocess, a black-box text-from-pixels step). No OCR model exists
in this environment, so the kernel is real on the corpus's own terms
(VERDICT r4 task 3): the corpus plants text rendered in a FIXED 8×8
bitmap font (sources/corpus.render_ocr_png) and this module recovers
it from decoded pixels by nearest-template matching — per 8×8 cell,
the glyph with the minimum Hamming distance between 64-bit bitmaps
wins, so clean glyphs recover byte-exactly and glyphs with a few
flipped pixels (the corpus's noisy slice) still match correctly.

The font table is deterministic: space is blank; every other glyph
takes its 8 row bytes from md5('glyph:'+char). Template OCR only
needs the shapes to be fixed and mutually distant — md5 patterns are
both (verified pairwise at import: min distance ≥ 16 bits), and a
64-entry table of hand-drawn letterforms would change nothing about
the matcher. One source of truth: the corpus renderer imports THIS
table.
"""

from __future__ import annotations

import hashlib

# planted alphabet: the corpus filters text to this set before
# rendering, so every cell is a known glyph
OCR_GLYPH_CHARS = " ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"

OCR_CELL = 8  # glyph cell is 8×8 px, one byte per row, MSB leftmost


def glyph_rows(ch: str) -> bytes:
    """8 row bytes (MSB = leftmost pixel) for one glyph."""
    if ch == " ":
        return bytes(OCR_CELL)
    return hashlib.md5(b"glyph:" + ch.encode("ascii")).digest()[:OCR_CELL]


def _glyph_bits(ch: str) -> int:
    return int.from_bytes(glyph_rows(ch), "big")


_GLYPH_BITS = [_glyph_bits(c) for c in OCR_GLYPH_CHARS]

# pairwise-distance floor: noise of up to (floor-1)//2 flipped pixels
# per cell can never flip a nearest-template decision
_MIN_DIST = min(
    bin(a ^ b).count("1")
    for i, a in enumerate(_GLYPH_BITS)
    for b in _GLYPH_BITS[i + 1:]
)
assert _MIN_DIST >= 16, f"glyph table degenerate (min dist {_MIN_DIST})"
OCR_NOISE_BUDGET = (_MIN_DIST - 1) // 2


def glyph_pixels(ch: str):
    """8×8 uint8 pixel array (255 = glyph pixel) for one glyph —
    cached; the renderer and the vectorized matcher both read it."""
    import numpy as np

    arr = _GLYPH_PX.get(ch)
    if arr is None:
        rows = glyph_rows(ch)
        bits = np.unpackbits(np.frombuffer(rows, np.uint8))
        arr = (bits.reshape(8, 8) * np.uint8(255))
        arr.setflags(write=False)
        _GLYPH_PX[ch] = arr
    return arr


_GLYPH_PX: dict = {}


def _glyph_bit_matrix():
    """(n_glyphs, 64) uint8 bit matrix of the font table (cached) —
    the vectorized nearest-template matcher's operand."""
    import numpy as np

    global _GLYPH_BITMAT
    if _GLYPH_BITMAT is None:
        rows = np.frombuffer(
            b"".join(glyph_rows(c) for c in OCR_GLYPH_CHARS), np.uint8)
        _GLYPH_BITMAT = np.unpackbits(rows).reshape(
            len(OCR_GLYPH_CHARS), 64)
        _GLYPH_BITMAT.setflags(write=False)
    return _GLYPH_BITMAT


_GLYPH_BITMAT = None


def match_cell(bits: int) -> str:
    """Nearest glyph (Hamming distance over the 64-bit cell bitmap);
    ties break to the first glyph in OCR_GLYPH_CHARS order."""
    best_i = 0
    best_d = 65
    for i, g in enumerate(_GLYPH_BITS):
        d = bin(bits ^ g).count("1")
        if d < best_d:
            best_d = d
            best_i = i
    return OCR_GLYPH_CHARS[best_i]


def ocr_gray_row(pixels: bytes, width: int) -> str:
    """Recover the text of a single-line glyph strip: ``pixels`` is an
    8-row 8-bit grayscale buffer, width a multiple of 8; each 8×8
    cell thresholds at 128 and nearest-matches the font table.
    Vectorized: one (cells × glyphs) Hamming-distance matrix per
    strip; ties break to the first glyph in OCR_GLYPH_CHARS order
    (argmin takes the first minimum — same rule as match_cell)."""
    import numpy as np

    if width % OCR_CELL or len(pixels) != width * OCR_CELL:
        raise ValueError("not an 8-row glyph strip")
    ncells = width // OCR_CELL
    arr = np.frombuffer(pixels, np.uint8).reshape(OCR_CELL, ncells,
                                                  OCR_CELL)
    # (cells, 64) bit planes, row-major within each cell
    bits = (arr.transpose(1, 0, 2).reshape(ncells, 64)
            >= 128).astype(np.uint8)
    gm = _glyph_bit_matrix()
    # Hamming distances via XOR-sum: (cells, glyphs)
    dist = (bits[:, None, :] ^ gm[None, :, :]).sum(axis=2)
    pick = dist.argmin(axis=1)
    return "".join(OCR_GLYPH_CHARS[i] for i in pick)
