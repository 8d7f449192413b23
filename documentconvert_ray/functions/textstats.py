"""Text-analysis primitives for training-data pipelines.

Beyond the reference's operator set (which has no corpus analytics —
SURVEY.md §2.5/§2.7), these are the first-class large-scale
training-data operators: token counting, quality scoring, language ID,
document fingerprinting, shingles/MinHash/SimHash for near-dedup.

All functions are pure and deterministic — never python's salted
``hash()``. Two hash families, chosen per operator: md5-derived
(DuckDB ``md5_number_upper`` convention) wherever the value must be
SQL-mirrorable (simhash token hashes, fingerprint fallback), blake2b
with fixed persons elsewhere (shingles/MinHash, whose oracles compare
exact-Jaccard RESULTS, not hashes).
"""

from __future__ import annotations

import hashlib
import re

# EXACTLY DuckDB/RE2 '\s' = [\t\n\f\r ] (probed: no \v, no Unicode
# whitespace) — python's own \s is Unicode-wide and would diverge
# from every token-based SQL oracle on NBSP/thin-space/VT input
_WS_SPLIT_RE = re.compile(r"[ \t\n\r\f]+")
_PUNCT_RE = re.compile(r"[.!,?;:]")

# fixed stopword list (shared with the SQL oracle — keep in sync with
# pipelines/queries.py)
STOPWORDS = ("the", "a", "and", "of", "to")

# fixed per-language marker sets for the n-gram/stopword lang-ID heuristic
_LANG_MARKERS = {
    "en": frozenset("the and of to a in is that it for on with as".split()),
    "de": frozenset("der die das und ist nicht mit für von zu ein".split()),
    "fr": frozenset("le la les et est pas pour dans une des que".split()),
    "es": frozenset("el la los y es no por para una con del".split()),
}


def tokens(text: str) -> list[str]:
    """Whitespace tokens, empties dropped — byte-for-byte == SQL
    list_filter(string_split_regex(text,'\\s+'), x -> x <> '') for ANY
    input (the split class mirrors RE2's \\s exactly; see
    _WS_SPLIT_RE). Residual i18n caveat shared by all token oracles:
    str.lower() vs DuckDB lower() can differ on rare locale-specific
    codepoints (e.g. Turkish İ); identical on ASCII and standard
    Unicode case folds."""
    return [t for t in _WS_SPLIT_RE.split(text) if t]


def token_count(text: str) -> int:
    return len(tokens(text))


def punct_count(text: str) -> int:
    return len(_PUNCT_RE.findall(text))


def stopword_count(text: str) -> int:
    sw = set(STOPWORDS)
    return sum(1 for t in tokens(text) if t in sw)


def lang_id(text: str) -> str:
    """Heuristic language ID: CJK codepoint ratio, else marker-word
    voting over the fixed lists; '' when nothing matches.

    Deterministic tie-break: languages compared by (score desc, name
    asc)."""
    if not text:
        return ""
    cjk = sum(1 for c in text[:2000] if "一" <= c <= "鿿")
    if cjk * 10 >= min(len(text), 2000):
        return "zh"
    toks = [t.lower().strip(".,!?;:()[]\"'") for t in tokens(text[:4000])]
    if not toks:
        return ""
    best_lang, best_score = "", 0
    for lang in sorted(_LANG_MARKERS):
        score = sum(1 for t in toks if t in _LANG_MARKERS[lang])
        if score > best_score:
            best_lang, best_score = lang, score
    # require at least ~2% marker density
    if best_score * 50 < len(toks):
        return ""
    return best_lang


def _h64(data: bytes, *, person: bytes = b"") -> int:
    """Stable 64-bit hash (blake2b, fixed key space)."""
    return int.from_bytes(
        hashlib.blake2b(data, digest_size=8, person=person.ljust(16, b"\0")).digest(),
        "big",
    )


def _md5_u64(data: bytes) -> int:
    """First 8 md5 digest bytes read little-endian — exactly DuckDB's
    ``md5_number_upper``, so fallback fingerprints are SQL-mirrorable
    (same convention as simhash64's per-token hash)."""
    return int.from_bytes(hashlib.md5(data).digest()[:8], "little")


_FP_M = (1 << 61) - 1  # Mersenne modulus of the polynomial hash
_FP_LUTS: dict[int, object] = {}


def _fp_lut(window: int):
    """(window, 256) uint64 LUT of (byte · 257^(window-1-j)) mod M.
    Built with Python ints (the raw product overflows 64 bits); each
    entry is < 2^61, so the window sum of ≤ 8 entries stays < 2^64 and
    plain uint64 addition is exact."""
    lut = _FP_LUTS.get(window)
    if lut is None:
        import numpy as np

        lut = np.array(
            [[(b * pow(257, window - 1 - j, _FP_M)) % _FP_M
              for b in range(256)] for j in range(window)],
            dtype=np.uint64,
        )
        _FP_LUTS[window] = lut
    return lut


def rolling_fingerprint(text: str, window: int = 8) -> int:
    """Polynomial rolling-hash document fingerprint: XOR of the
    content-sampled (h mod 16 == 0) `window`-byte rolling-window
    hashes — cheap, deterministic, shift-tolerant content id.

    Vectorized: one LUT gather + uint64 add per window offset over the
    whole byte array (no per-byte Python loop). Identical values to
    the scalar recurrence h·257+b mod 2^61−1. Non-ASCII docs, docs
    shorter than the window, and docs where no window samples all take
    the md5-derived fallback — SQL can only address CHARACTERS
    (ascii()/length()), not UTF-8 bytes, so routing non-ASCII text to
    the fallback is what makes the function TOTAL under its DuckDB
    mirror (the ``doc_fingerprints`` oracle recomputes the window path
    with ascii()·257^j HUGEINT sums + bit_xor and mirrors this routing
    with an octet_length(encode())<>length() CASE)."""
    data = text.encode("utf-8")
    n = len(data)
    if n < window or n != len(text):  # short or non-ASCII
        return _md5_u64(b"fp:" + data)
    import numpy as np

    lut = _fp_lut(window)
    arr = np.frombuffer(data, dtype=np.uint8)  # ASCII: bytes == chars
    n_win = n - window + 1
    h = lut[0][arr[:n_win]].copy()
    for j in range(1, window):
        h += lut[j][arr[j:j + n_win]]
        if j % 7 == 0:  # ≤ 8 unreduced terms keeps the sum < 2^64
            h %= np.uint64(_FP_M)
    h %= np.uint64(_FP_M)
    sel = h[h % np.uint64(16) == 0]  # content-defined sampling
    out = int(np.bitwise_xor.reduce(sel)) if sel.size else 0
    return out or _md5_u64(b"fp:" + data)


def shingles(text: str, k: int = 3) -> set[int]:
    """k-word shingle hash set (lowercased tokens)."""
    toks = [t.lower() for t in tokens(text)]
    if len(toks) < k:
        return {_h64(" ".join(toks).encode(), person=b"shingle")} if toks else set()
    return {
        _h64(" ".join(toks[i:i + k]).encode(), person=b"shingle")
        for i in range(len(toks) - k + 1)
    }


# MinHash: 64 permutations via the classic (a*x + b) mod p trick with
# fixed seeds derived from blake2b of the permutation index. The
# modulus is the 31-bit Mersenne prime so a*x fits in uint64 and the
# whole signature is ONE vectorized numpy expression (the 61-bit
# variant needs arbitrary-precision ints: ~3 ms/doc in pure Python vs
# ~20 µs here).
_MERSENNE31 = (1 << 31) - 1
_N_PERM = 64


def _perm_params(i: int) -> tuple[int, int]:
    a = _h64(i.to_bytes(4, "big"), person=b"mh-a") % (_MERSENNE31 - 1) + 1
    b = _h64(i.to_bytes(4, "big"), person=b"mh-b") % _MERSENNE31
    return a, b


def _perm_arrays():
    import numpy as np

    ab = [_perm_params(i) for i in range(_N_PERM)]
    a = np.asarray([x[0] for x in ab], dtype=np.uint64)[:, None]
    b = np.asarray([x[1] for x in ab], dtype=np.uint64)[:, None]
    return a, b


_PERM_A, _PERM_B = _perm_arrays()


def minhash_signature(shingle_set: set[int]) -> list[int]:
    """64-value MinHash signature (values < 2^31, int64-safe)."""
    import numpy as np

    if not shingle_set:
        return [0] * _N_PERM
    x = np.fromiter(shingle_set, dtype=np.uint64, count=len(shingle_set))
    x %= _MERSENNE31
    v = (_PERM_A * x[None, :] + _PERM_B) % _MERSENNE31
    return v.min(axis=1).astype(np.int64).tolist()


def lsh_band_keys(sig: list[int], bands: int = 16) -> list[int]:
    """Band-bucket keys: hash of each band's rows; pair candidates share
    any band key. 16 bands × 4 rows over 64 perms."""
    rows = len(sig) // bands
    keys = []
    for b in range(bands):
        chunk = sig[b * rows:(b + 1) * rows]
        data = b"".join(v.to_bytes(8, "big") for v in chunk)
        keys.append(
            (b << 56) | (_h64(data, person=b"lsh") & 0x00FFFFFFFFFFFFFF)
        )
    return keys


def jaccard(a: set[int], b: set[int]) -> float:
    if not a and not b:
        return 1.0
    if not a or not b:
        return 0.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


# worker-process-wide token-hash cache: values are pure functions of
# the token, so sharing across batches/actors cannot affect results
_SIMHASH_CACHE: dict[str, int] = {}


def simhash64(text: str) -> int:
    """64-bit SimHash over lowercased tokens (unit weights).
    Bit-vote accumulation is vectorized; per-token hashes are memoized
    per worker. The per-token hash is md5 of 'simhash:'+token read as
    LITTLE-endian from the first 8 digest bytes — exactly DuckDB's
    ``md5_number_upper('simhash:' || tok)`` — so the entire operator
    (hash → bit votes → band keys → hamming verify) is SQL-mirrorable
    and simhash_near_dups carries a full DuckDB oracle."""
    import numpy as np

    toks = [t.lower() for t in tokens(text)]
    if not toks:
        return 0
    hs = np.empty(len(toks), dtype=np.uint64)
    cache = _SIMHASH_CACHE
    for i, t in enumerate(toks):
        h = cache.get(t)
        if h is None:
            if len(cache) > 1_000_000:
                cache.clear()
            h = _md5_u64(b"simhash:" + t.encode())
            cache[t] = h
        hs[i] = h
    bits = (hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1
    acc = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    out = 0
    for bit in np.flatnonzero(acc > 0):
        out |= 1 << int(bit)
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def levenshtein_capped(a: str, b: str, cap: int) -> int:
    """Banded Levenshtein distance: the exact unit-cost edit distance
    when it is ≤ cap, else cap+1 (early exit). Semantics match
    DuckDB's levenshtein() (insert/delete/substitute, cost 1) so SQL
    oracles can mirror thresholded checks exactly."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) > cap:
        return cap + 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    if la == 0:
        return lb if lb <= cap else cap + 1
    prev = list(range(la + 1))
    for j in range(1, lb + 1):
        cur = [j] + [0] * la
        cb = b[j - 1]
        lo = max(1, j - cap)
        hi = min(la, j + cap)
        if lo > 1:
            cur[lo - 1] = cap + 1
        best = cap + 1
        for i in range(lo, hi + 1):
            cost = 0 if a[i - 1] == cb else 1
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + cost)
            if cur[i] < best:
                best = cur[i]
        if hi < la:
            cur[hi + 1:] = [cap + 1] * (la - hi)
        if best > cap:
            return cap + 1
        prev = cur
    return prev[la] if prev[la] <= cap else cap + 1
