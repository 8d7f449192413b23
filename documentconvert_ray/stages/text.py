"""Text-analysis stages over a `documents`-shaped table.

Each is a vectorized map_batches callable. Stateful ones (compiled
automata, marker tables) are classes for actor pools; the cheap ones
are plain functions. Semantics are kept exactly SQL-expressible where
an oracle exists (see pipelines/queries.py — e.g. token counting ==
``list_filter(string_split_regex(text,'\\s+'), x -> x <> '')``).
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa

from ..functions.textstats import (
    lang_id,
    tokens,
    punct_count,
    rolling_fingerprint,
    simhash64,
    stopword_count,
    token_count,
)


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens, n_punct, n_stop) per document."""
    texts = batch.column("text").to_pylist()
    return pa.Table.from_pydict(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array([token_count(t) for t in texts], pa.int64()),
            "n_punct": pa.array([punct_count(t) for t in texts], pa.int64()),
            "n_stop": pa.array([stopword_count(t) for t in texts], pa.int64()),
        }
    )


def md5_batch(batch: pa.Table) -> pa.Table:
    """Adds text_md5 (hex) — the exact-dedup key (== SQL md5(text))."""
    md5s = [
        hashlib.md5(t.encode("utf-8")).hexdigest()
        for t in batch.column("text").to_pylist()
    ]
    return batch.append_column("text_md5", pa.array(md5s, pa.string()))


class LangIdStage:
    """Actor-pool language-ID stage: marker tables built once per actor
    (the ST1 pattern — warm state amortized across batches)."""

    def __init__(self) -> None:
        from ..functions import textstats as _ts  # warm tables
        self._lang_id = _ts.lang_id

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self._lang_id(t) for t in batch.column("text").to_pylist()]
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(preds, pa.string()),
            }
        )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, fingerprint_hex, simhash_hex) — stable content ids."""
    texts = batch.column("text").to_pylist()
    return pa.Table.from_pydict(
        {
            "doc_id": batch.column("doc_id"),
            "fingerprint_hex": pa.array(
                [f"{rolling_fingerprint(t):016x}" for t in texts], pa.string()
            ),
            "simhash_hex": pa.array(
                [f"{simhash64(t):016x}" for t in texts], pa.string()
            ),
        }
    )


def ngram_partial_counts(batch: pa.Table) -> pa.Table:
    """Per-batch partial unigram counts (the combiner before the global
    groupby — SURVEY-guide 'pre-aggregate before a shuffle')."""
    from collections import Counter

    c: Counter = Counter()
    for t in batch.column("text").to_pylist():
        c.update(tokens(t))
    if not c:
        return pa.Table.from_pydict(
            {"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    words, ns = zip(*sorted(c.items()))
    return pa.Table.from_pydict(
        {"word": pa.array(list(words), pa.string()),
         "n": pa.array(list(ns), pa.int64())}
    )


MG_SIZE = 4096  # Misra-Gries counters per batch summary
MG_CANDIDATES = 256  # lower-bound top-k kept for the exact rescore pass


def mg_partial_counts(batch: pa.Table) -> pa.Table:
    """Per-batch MISRA-GRIES unigram summary — the heavy-hitters
    scale twin of ngram_partial_counts. Exact per-batch counts are
    compressed to ≤ MG_SIZE (word, n) rows by subtracting the
    (MG_SIZE+1)-th largest count and dropping non-positives: each kept
    n underestimates truth by ≤ N_batch/(MG_SIZE+1), and summing
    summaries keeps the total undercount ≤ N/(MG_SIZE+1). The shuffle
    after this stage carries ≤ MG_SIZE rows PER BATCH instead of the
    batch's full vocabulary — the web-scale n-gram trade."""
    from collections import Counter

    c: Counter = Counter()
    for t in batch.column("text").to_pylist():
        c.update(tokens(t))
    if not c:
        return pa.Table.from_pydict(
            {"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    items = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    if len(items) > MG_SIZE:
        thresh = items[MG_SIZE][1]
        items = [(w, n - thresh) for w, n in items[:MG_SIZE] if n > thresh]
    words, ns = zip(*sorted(items))
    return pa.Table.from_pydict(
        {"word": pa.array(list(words), pa.string()),
         "n": pa.array(list(ns), pa.int64())}
    )


def tf_rows_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, term, tf) per distinct (document, term) — the exploded
    term-frequency relation behind TF-IDF scoring. Token-level row
    volume is inherent to the operator; everything downstream shrinks
    it (hot-term filter, join, per-doc top-k combiner)."""
    from collections import Counter

    ids: list[int] = []
    terms: list[str] = []
    tfs: list[int] = []
    for i, t in zip(batch.column("doc_id").to_pylist(),
                    batch.column("text").to_pylist()):
        for w, n in sorted(Counter(tokens(t)).items()):
            ids.append(i)
            terms.append(w)
            tfs.append(n)
    return pa.Table.from_pydict(
        {"doc_id": pa.array(ids, pa.int64()),
         "term": pa.array(terms, pa.string()),
         "tf": pa.array(tfs, pa.int64())}
    )


def df_partial_counts(batch: pa.Table) -> pa.Table:
    """Per-batch partial DOCUMENT-frequency counts (term → number of
    batch docs containing it) — the combiner before the tiny
    vocabulary groupby; the shuffle carries ≤ one row per (batch,
    distinct term), never a row per occurrence."""
    from collections import Counter

    c: Counter = Counter()
    for t in batch.column("text").to_pylist():
        c.update(set(tokens(t)))
    words = sorted(c)
    return pa.Table.from_pydict(
        {"term": pa.array(words, pa.string()),
         "nd": pa.array([c[w] for w in words], pa.int64())}
    )


# cross-document duplicated-substring signal (word-5-gram windows;
# cf. the substring-dedup finding that verbatim cross-doc spans
# degrade LM training — "Deduplicating Training Data Makes Language
# Models Better", Lee et al. 2022, arXiv:2107.06499)
DUPG_N = 5


def _doc_grams(text: str):
    toks = tokens(text)
    k = DUPG_N
    n_pos = max(0, len(toks) - k + 1)
    c: dict = {}
    for i in range(n_pos):
        g = " ".join(toks[i:i + k])
        c[g] = c.get(g, 0) + 1
    return c, n_pos


def _gram_hashes_i64(grams) -> "object":
    """md5-derived 64-bit gram keys (DuckDB ``md5_number_upper``
    convention via textstats._md5_u64), reinterpreted int64 for Arrow.
    Shipping 8-byte hashes instead of ~30-byte gram STRINGS through
    the df combiner and the join is the web-scale exchange trade; the
    SQL oracle applies the SAME hash so both sides share collision
    semantics exactly (64-bit birthday caveat documented at the
    query)."""
    import numpy as np

    from ..functions.textstats import _md5_u64

    return np.fromiter(
        (_md5_u64(g.encode("utf-8")) for g in grams), np.uint64, len(grams)
    ).view(np.int64)


def dupgram_partial_df(batch: pa.Table) -> pa.Table:
    """Per-batch partial gram DOCUMENT counts (gram hash → number of
    batch docs containing it) — the combiner before the gram-df
    groupby; ≤ one 16-byte (gh, nd) row per (batch, distinct gram)
    shuffles, never a gram string."""
    import numpy as np

    c: dict = {}
    for t in batch.column("text").to_pylist():
        for g in _doc_grams(t)[0]:
            c[g] = c.get(g, 0) + 1
    grams = sorted(c)
    return pa.Table.from_pydict(
        {"gh": pa.array(_gram_hashes_i64(grams), pa.int64()),
         "nd": pa.array(np.fromiter((c[g] for g in grams), np.int64,
                                    len(grams)))}
    )


def dupgram_doc_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, gh, n_occ, is_tot) per distinct (doc, gram) + ONE
    per-doc total row (is_tot=true, n_occ = total positions, gh =
    doc_id — an arbitrary spread key that never feeds the numerator),
    so a single text pass emits both the join probe and the
    denominator; per-doc total keys spread the denominators instead
    of hot-keying one partition."""
    import numpy as np

    ids: list[int] = []
    ghs: list[int] = []
    occ: list[int] = []
    tot: list[bool] = []
    for i, t in zip(batch.column("doc_id").to_pylist(),
                    batch.column("text").to_pylist()):
        c, n_pos = _doc_grams(t)
        ids.append(i)
        ghs.append(0)  # placeholder; patched to doc_id below
        occ.append(n_pos)
        tot.append(True)
        grams = sorted(c)
        hs = _gram_hashes_i64(grams)
        for g, h in zip(grams, hs):
            ids.append(i)
            ghs.append(int(h))
            occ.append(c[g])
            tot.append(False)
    gh_arr = np.array(ghs, np.int64)
    id_arr = np.array(ids, np.int64)
    tot_arr = np.array(tot, bool)
    gh_arr[tot_arr] = id_arr[tot_arr]  # per-doc denominator spread keys
    return pa.Table.from_pydict(
        {"doc_id": pa.array(id_arr),
         "gh": pa.array(gh_arr),
         "n_occ": pa.array(occ, pa.int64()),
         "is_tot": pa.array(tot_arr)}
    )


class CandidateCountStage:
    """Exact rescore pass: count ONLY the broadcast candidate words
    (≤ a few hundred strings via ray.put, fetched once per actor)."""

    def __init__(self, words_ref) -> None:
        self._words_ref = words_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        from collections import Counter

        from .similarity import resolve_broadcast

        wset = resolve_broadcast(self._words_ref, key="mg-candidates")
        c: Counter = Counter()
        for t in batch.column("text").to_pylist():
            c.update(tok for tok in tokens(t) if tok in wset)
        words = sorted(c)
        return pa.Table.from_pydict(
            {"word": pa.array(words, pa.string()),
             "n": pa.array([c[w] for w in words], pa.int64())}
        )


# ------------------------------------------------ curation-filter stages
#
# The three web-corpus hygiene operators a training-data pipeline runs
# between extraction and dedup: blocklist redaction (the PII-scrub
# shape), repetition quality signals (Gopher-style filters), and
# benchmark decontamination (eval n-gram overlap). All map-side — no
# shuffle; the only non-local piece is a broadcast small side.

# Blocklist for the redaction op — the PII stand-in over this corpus's
# vocabulary (the synthetic tables contain no emails/phones, so a term
# blocklist exercises the same scrub machinery non-trivially). One
# source of truth: the SQL oracle's IN-list is generated from this set.
SCRUB_TERMS = frozenset({"hash", "spark", "vector"})

# doc_id % BENCH_MOD == 0 → the "benchmark/eval" slice of the corpus
# (the deterministic stand-in for a real eval suite's documents).
BENCH_MOD = 100
BENCH_NGRAM = 8


class TermScrubStage:
    """Blocklist redaction: every blocklisted whitespace token becomes
    ``[REDACTED]``. The blocklist is the broadcast small side (ray.put
    once, resolved+cached per worker) — the same shape a real PII scrub
    (regex bank / denylist of secrets) runs at 100 TB.

    Emits (doc_id, n_redacted, redacted_md5); redacted_md5 hashes the
    whitespace-NORMALIZED redacted text (split + single-space join), the
    exact SQL mirror ``md5(array_to_string(list_transform(toks, …), ' '))``.
    """

    def __init__(self, block_ref) -> None:
        self._block_ref = block_ref  # resolved lazily in the worker

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .similarity import resolve_broadcast

        block = resolve_broadcast(self._block_ref, key="scrub-terms")
        n_out: list[int] = []
        md5_out: list[str] = []
        for t in batch.column("text").to_pylist():
            toks = tokens(t)
            n = 0
            for i, w in enumerate(toks):
                if w in block:
                    toks[i] = "[REDACTED]"
                    n += 1
            n_out.append(n)
            md5_out.append(
                hashlib.md5(" ".join(toks).encode("utf-8")).hexdigest())
        return pa.Table.from_pydict(
            {"doc_id": batch.column("doc_id"),
             "n_redacted": pa.array(n_out, pa.int64()),
             "redacted_md5": pa.array(md5_out, pa.string())})


def repetition_stats_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style repetition signals per doc (Rae et al. 2021 §A1.1
    quality filters, the two that need no external model): type-token
    ratio and top-bigram mass, in integer micro-units so the DuckDB
    oracle is equality-exact.

    (doc_id, n_tokens, distinct_frac_micro, top_bigram_frac_micro,
    is_repetitive) where is_repetitive flags (≥20 tokens and
    top-bigram mass ≥ 10%) or (≥10 tokens and distinct fraction
    ≤ 30%). Both branches carry a minimum-length guard: below it the
    ratios are dominated by 1/(n−1) quantization, not repetition (an
    all-distinct 6-token doc already has top-bigram mass 20%)."""
    from collections import Counter

    nt_out: list[int] = []
    df_out: list[int] = []
    tb_out: list[int] = []
    rep_out: list[bool] = []
    for t in batch.column("text").to_pylist():
        toks = tokens(t)
        n = len(toks)
        distinct_frac = len(set(toks)) * 1_000_000 // n if n else 0
        if n >= 2:
            top = max(Counter(zip(toks, toks[1:])).values())
            top_frac = top * 1_000_000 // (n - 1)
        else:
            top_frac = 0
        nt_out.append(n)
        df_out.append(distinct_frac)
        tb_out.append(top_frac)
        rep_out.append((n >= 20 and top_frac >= 100_000)
                       or (n >= 10 and distinct_frac <= 300_000))
    return pa.Table.from_pydict(
        {"doc_id": batch.column("doc_id"),
         "n_tokens": pa.array(nt_out, pa.int64()),
         "distinct_frac_micro": pa.array(df_out, pa.int64()),
         "top_bigram_frac_micro": pa.array(tb_out, pa.int64()),
         "is_repetitive": pa.array(rep_out, pa.bool_())})


def benchmark_gram_rows(batch: pa.Table) -> pa.Table:
    """Benchmark-slice docs (doc_id % BENCH_MOD == 0) → one row per
    distinct word-8-gram (column ``g``); all other docs emit nothing.
    Feeds the driver-side small-set build in q_benchmark_contamination."""
    out: set[str] = set()
    for doc_id, t in zip(batch.column("doc_id").to_pylist(),
                         batch.column("text").to_pylist()):
        if doc_id % BENCH_MOD != 0:
            continue
        toks = tokens(t)
        k = BENCH_NGRAM
        out.update(" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1))
    return pa.Table.from_pydict({"g": pa.array(sorted(out), pa.string())})


class ContaminationStage:
    """Benchmark decontamination: flag corpus docs sharing any word-8-
    gram with the benchmark slice (the TRAINING-side hygiene step that
    keeps eval data out of the corpus; cf. GPT-3 appx C / PaLM §7-style
    n-gram overlap). The benchmark gram set is the broadcast small side
    — real eval suites are ~10⁵ examples, ≪ corpus, so a ray.put
    frozenset is the right 100 TB shape (the mod-BENCH_MOD selector is
    only the deterministic stand-in on the synthetic table).

    Emits (doc_id, n_hits, contaminated) for NON-benchmark docs;
    n_hits = |distinct doc 8-grams ∩ benchmark grams|."""

    def __init__(self, grams_ref) -> None:
        self._grams_ref = grams_ref

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .similarity import resolve_broadcast

        grams = resolve_broadcast(self._grams_ref, key="bench-grams")
        ids_out: list[int] = []
        hit_out: list[int] = []
        for doc_id, t in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            if doc_id % BENCH_MOD == 0:
                continue
            toks = tokens(t)
            k = BENCH_NGRAM
            dg = {" ".join(toks[i:i + k])
                  for i in range(len(toks) - k + 1)}
            ids_out.append(doc_id)
            hit_out.append(len(dg & grams))
        return pa.Table.from_pydict(
            {"doc_id": pa.array(ids_out, pa.int64()),
             "n_hits": pa.array(hit_out, pa.int64()),
             "contaminated": pa.array([h > 0 for h in hit_out],
                                      pa.bool_())})


# ------------------------------------------------- sequence packing
#
# GPT-style training-data packing: concatenate every document's tokens
# in doc_id order and cut the stream into fixed PACK_BLOCK-token
# blocks (documents may straddle a cut — the standard pretraining
# layout). The distributed shape is a TWO-PHASE PREFIX SCAN:
#   1. map: per-doc token counts, tagged with an ORDER-PRESERVING
#      range key rb (doc_id-range partition, not a hash);
#   2. groupby(rb) → per-range token sums (small);
#   3. driver: exclusive prefix over the per-range sums (one int per
#      range — the only driver-side state, broadcast back);
#   4. groupby(rb) map_groups: sort by doc_id, local cumsum + the
#      range's global offset → every doc's absolute start token.
# Nothing but (int, int, int) rows ever shuffles; the text column is
# dropped at phase 1.

PACK_BLOCK = 1024  # tokens per training block


def pack_count_rows(batch: pa.Table, max_id: int, n_ranges: int) -> pa.Table:
    """(doc_id, text) → (rb, doc_id, n_tokens); rb = doc_id's
    position-scaled range index (order-preserving, unlike the hash
    buckets used for the dedup shuffles — the scan needs contiguous
    doc_id ranges)."""
    import numpy as np

    ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
    toks = [len(tokens(t)) for t in batch.column("text").to_pylist()]
    rb = (ids.astype(np.uint64) * np.uint64(n_ranges)
          // np.uint64(max_id + 1)).astype(np.int32)
    return pa.Table.from_pydict(
        {"rb": pa.array(rb),
         "doc_id": pa.array(ids, pa.int64()),
         "n_tokens": pa.array(toks, pa.int64())})


class PackScanStage:
    """Phase-4 local scan: one doc_id range (pandas group) → absolute
    token offsets + block spans. The broadcast small side is the
    rb → exclusive-prefix-offset dict from phase 3."""

    def __init__(self, offsets_ref, block: int = PACK_BLOCK) -> None:
        self._offsets_ref = offsets_ref
        self.block = block

    def __call__(self, group):
        import numpy as np

        from .similarity import resolve_broadcast

        offsets = resolve_broadcast(self._offsets_ref, key="pack-offsets")
        g = group.sort_values("doc_id", kind="mergesort")
        n = g["n_tokens"].to_numpy()
        cum = np.cumsum(n)
        start = cum - n + offsets[int(g["rb"].iloc[0])]
        end_tok = start + n  # exclusive
        b = self.block
        block_start = start // b
        # empty docs sit AT their start offset; non-empty end at their
        # last token's block
        block_end = np.where(n == 0, block_start, (end_tok - 1) // b)
        out = g[["doc_id", "n_tokens"]].copy()
        out["start_tok"] = start.astype("int64")
        out["block_start"] = block_start.astype("int64")
        out["block_end"] = block_end.astype("int64")
        return out.reset_index(drop=True)


# ------------------------------------------------- token rarity (T91)


def token_count_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial token OCCURRENCE counts (token hash → number
    of occurrences across the batch's docs) — the combiner before the
    vocabulary reduce behind unigram-LM rarity scoring. Ships 16-byte
    (th, cnt) rows, never token strings (same md5_number_upper keying
    as the dup-gram exchange, so the SQL oracle shares collision
    semantics exactly)."""
    import numpy as np

    c: dict = {}
    for t in batch.column("text").to_pylist():
        for w in tokens(t):
            c[w] = c.get(w, 0) + 1
    words = sorted(c)
    return pa.Table.from_pydict(
        {"th": pa.array(_gram_hashes_i64(words), pa.int64()),
         "cnt": pa.array(np.fromiter((c[w] for w in words), np.int64,
                                     len(words)))}
    )


def rare_token_rows(batch: pa.Table) -> pa.Table:
    """(doc_id, th, occ) per distinct (doc, token) — the join probe of
    the rarity score. Token-level row volume is inherent (same as the
    TF-IDF tf relation); the count join and the per-doc top-k
    combiner shrink everything downstream."""
    import numpy as np

    ids: list[int] = []
    ths_all: list = []
    occ: list[int] = []
    for i, t in zip(batch.column("doc_id").to_pylist(),
                    batch.column("text").to_pylist()):
        c: dict = {}
        for w in tokens(t):
            c[w] = c.get(w, 0) + 1
        words = sorted(c)
        ids.extend([i] * len(words))
        ths_all.append(_gram_hashes_i64(words))
        occ.extend(c[w] for w in words)
    ths = (np.concatenate(ths_all) if ths_all
           else np.empty(0, np.int64))
    return pa.Table.from_pydict(
        {"doc_id": pa.array(ids, pa.int64()),
         "th": pa.array(ths, pa.int64()),
         "occ": pa.array(occ, pa.int64())}
    )


def lang_word_partial_counts(batch: pa.Table) -> pa.Table:
    """Per-batch partial (lang, word) counts — the combiner in front of
    the Zipf-slope rank reduce (same shape as ngram_partial_counts,
    keyed by language)."""
    from collections import Counter

    c: Counter = Counter()
    for lang, t in zip(batch.column("lang").to_pylist(),
                       batch.column("text").to_pylist()):
        for w in tokens(t):
            c[(lang, w)] += 1
    if not c:
        return pa.Table.from_pydict(
            {"lang": pa.array([], pa.string()),
             "word": pa.array([], pa.string()),
             "n": pa.array([], pa.int64())})
    items = sorted(c.items())
    return pa.Table.from_pydict(
        {"lang": pa.array([k[0] for k, _ in items], pa.string()),
         "word": pa.array([k[1] for k, _ in items], pa.string()),
         "n": pa.array([v for _, v in items], pa.int64())})


def char_diversity_batch(batch: pa.Table) -> pa.Table:
    """Per-doc character-diversity stats, integer-exact (no float logs,
    so the SQL mirror is equality-safe): distinct codepoints and the
    Simpson repeat probability Σc(c−1) / n(n−1) in micro-units.
    Characters = Unicode codepoints on both sides (DuckDB length() /
    substr() are codepoint-addressed), hence the utf-32 view."""
    import numpy as np

    nobs: list[int] = []
    ndis: list[int] = []
    rep: list[int] = []
    for t in batch.column("text").to_pylist():
        cps = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
        n = len(cps)
        nobs.append(n)
        if n < 2:
            ndis.append(n)
            rep.append(0)
            continue
        counts = np.unique(cps, return_counts=True)[1]
        ndis.append(len(counts))
        num = int((counts.astype(np.int64) * (counts - 1)).sum())
        rep.append(num * 1_000_000 // (n * (n - 1)))
    return pa.Table.from_pydict(
        {"doc_id": batch.column("doc_id"),
         "n_chars_obs": pa.array(nobs, pa.int64()),
         "n_distinct_chars": pa.array(ndis, pa.int64()),
         "char_repeat_micro": pa.array(rep, pa.int64())})


# adjacent-codepoint pair codes: (cp1 << 21) | cp2 (codepoints < 2^21,
# so the int64 code order == (cp1, cp2) tuple order == UTF-8 binary
# order of the 2-char string — the SQL ORDER BY pair tie-break)
_PAIR_SHIFT = 21
_PAIR_SEP = 10  # '\n' — a tokens() split char, never inside a token


def token_pair_partial_counts(batch: pa.Table) -> pa.Table:
    """Per-batch partial counts of adjacent character pairs WITHIN
    whitespace tokens (the BPE first-merge statistic): all tokens in
    the batch are joined with '\\n' into one codepoint vector, pair
    codes are formed vectorized, and '\\n'-touching positions are
    masked out — one np.unique per batch, no per-token Python."""
    import numpy as np

    parts = []
    for t in batch.column("text").to_pylist():
        tk = tokens(t)
        if tk:
            parts.append("\n".join(tk))
    empty = pa.Table.from_pydict(
        {"pair_code": pa.array([], pa.int64()),
         "n": pa.array([], pa.int64())})
    if not parts:
        return empty
    cps = np.frombuffer(
        "\n".join(parts).encode("utf-32-le"), dtype=np.uint32
    ).astype(np.int64)
    if len(cps) < 2:
        return empty
    a, b = cps[:-1], cps[1:]
    mask = (a != _PAIR_SEP) & (b != _PAIR_SEP)
    if not mask.any():
        return empty
    codes = (a[mask] << _PAIR_SHIFT) | b[mask]
    uc, cnt = np.unique(codes, return_counts=True)
    return pa.Table.from_pydict(
        {"pair_code": pa.array(uc, pa.int64()),
         "n": pa.array(cnt.astype(np.int64), pa.int64())})


def pair_code_to_str(code: int) -> str:
    return chr(code >> _PAIR_SHIFT) + chr(code & ((1 << _PAIR_SHIFT) - 1))


def lang_confusion_partial(batch: pa.Table) -> pa.Table:
    """Per-batch (label, prediction) cell counts for the lang-ID
    confusion matrix — the combiner in front of a ≤|langs|² cell
    aggregate."""
    from collections import Counter

    c: Counter = Counter()
    for lab, t in zip(batch.column("lang").to_pylist(),
                      batch.column("text").to_pylist()):
        c[(lab, lang_id(t))] += 1
    items = sorted(c.items())
    return pa.Table.from_pydict(
        {"lang": pa.array([k[0] for k, _ in items], pa.string()),
         "lang_pred": pa.array([k[1] for k, _ in items], pa.string()),
         "n_docs": pa.array([v for _, v in items], pa.int64())})


DSIR_TARGET_LANG = "en"


def dsir_count_partial(batch: pa.Table) -> pa.Table:
    """Per-batch partial per-SIDE token occurrence counts for DSIR
    importance weighting (Xie et al. 2023, arXiv:2302.03169): one
    corpus pass emits (th, ct, cs) rows — target-side and source-side
    occurrence counts ride the SAME exchange (16 extra bytes per row
    instead of a second scan). Side = lang == DSIR_TARGET_LANG.
    8-byte md5 token keys (``md5_number_upper`` convention), never
    token strings."""
    import numpy as np

    ct: dict = {}
    cs: dict = {}
    for lang, t in zip(batch.column("lang").to_pylist(),
                       batch.column("text").to_pylist()):
        side = ct if lang == DSIR_TARGET_LANG else cs
        for w in tokens(t or ""):
            side[w] = side.get(w, 0) + 1
    words = sorted(set(ct) | set(cs))
    return pa.Table.from_pydict(
        {"th": pa.array(_gram_hashes_i64(words), pa.int64()),
         "ct": pa.array(np.fromiter((ct.get(w, 0) for w in words),
                                    np.int64, len(words))),
         "cs": pa.array(np.fromiter((cs.get(w, 0) for w in words),
                                    np.int64, len(words)))})


# --- PII redaction (C4 / Dolma-style curation step) -----------------
# Patterns restricted to the RE2 ∩ Python `re` common subset (ASCII
# classes, \b, bounded repetition) so the DuckDB oracle — RE2 — and
# this kernel agree byte-for-byte. Order matters only if patterns
# could overlap; these three are mutually exclusive (emails carry '@',
# phones are dash-separated digit runs, IPs dot-separated), so
# count-then-replace is well defined.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IP_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_PII_EMAIL = re.compile(PII_EMAIL_RE)
_PII_PHONE = re.compile(PII_PHONE_RE)
_PII_IP = re.compile(PII_IP_RE)


def pii_augment(doc_id: int, text: str) -> str:
    """Deterministic PII injection — the sf corpus text is PII-free, so
    both sides (this kernel and the SQL oracle) derive the SAME
    augmented column; the redaction regexes then do real work that the
    value-hash check verifies. Formulas are mirrored literally in
    ORACLES['pii_scrub']."""
    t = text
    if doc_id % 3 == 0:
        t += f" contact user{doc_id}@example.com now"
    if doc_id % 5 == 0:
        t += f" call 555-{100 + doc_id % 900}-{1000 + doc_id % 9000} today"
    if doc_id % 7 == 0:
        t += (f" from 10.{doc_id % 256}.{(doc_id // 7) % 256}"
              f".{doc_id % 100} logged")
    return t


def pii_scrub_batch(batch: pa.Table) -> pa.Table:
    """Map-side PII scrub: per-kind match counts + md5 of the redacted
    text. Zero shuffle — the 100 TB shape is exactly this batch fn.
    Regex evaluation IS the per-row work (cf. the sha256 note on
    _stats_partials); patterns are compiled once at module import."""
    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    n_em, n_ph, n_ip, md5s = [], [], [], []
    for i, t in zip(ids, texts):
        t = pii_augment(int(i), t or "")
        n_em.append(len(_PII_EMAIL.findall(t)))
        n_ph.append(len(_PII_PHONE.findall(t)))
        n_ip.append(len(_PII_IP.findall(t)))
        red = _PII_EMAIL.sub("<EMAIL>", t)
        red = _PII_PHONE.sub("<PHONE>", red)
        red = _PII_IP.sub("<IP>", red)
        md5s.append(hashlib.md5(red.encode("utf-8")).hexdigest())
    return pa.Table.from_pydict(
        {"doc_id": batch.column("doc_id"),
         "n_emails": pa.array(n_em, pa.int64()),
         "n_phones": pa.array(n_ph, pa.int64()),
         "n_ips": pa.array(n_ip, pa.int64()),
         "redacted_md5": pa.array(md5s, pa.string())})
