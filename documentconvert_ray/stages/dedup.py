"""Deduplication stages: exact, MinHash+LSH, SimHash banding.

Scale design (the 100 TB story):
- exact dedup: content-hash column in a vectorized map_batches, then
  hash-partitioned ``groupby(text_md5)`` keeping min-id — the only
  shuffle moves 32-byte keys + ids, never text;
- MinHash+LSH: per-batch shingle→signature (O(doc) work, no shuffle),
  explode to (band_key, doc_id) rows — 16 small rows per doc — then
  ``groupby(band_key)`` emits candidate pairs per bucket; pairs are
  verified by exact shingle Jaccard only for candidates. Bucket skew is
  bounded: a bucket with B docs emits B·(B−1)/2 pairs, so buckets are
  capped (deterministically, by sorted doc_id) and the cap is logged in
  the result;
- SimHash: 4×16-bit bands of the 64-bit fingerprint; same
  groupby-band → verify (hamming) shape.

The reference has no near-dedup at all (SURVEY.md §2.7); this is new
first-class capability.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.textstats import (
    hamming64,
    lsh_band_keys,
    minhash_signature,
    shingles,
    simhash64,
)

MAX_BUCKET = 64  # deterministic candidate cap per LSH bucket


class MinHashStage:
    """doc → 16 (bucket, band_key, doc_id) rows. Signature params fixed
    (64 perms, 16 bands × 4 rows ≈ Jaccard 0.5+ sensitivity).
    ``bucket = band_key % NGRAM_BUCKETS`` is the explicit hash
    partitioning key for the candidate-pair shuffle (few big groups
    with vectorized pair emission instead of one Python call per
    band)."""

    def __init__(self, k_shingle: int = 3) -> None:
        self.k = k_shingle

    def __call__(self, batch: pa.Table) -> pa.Table:
        band_keys: list[int] = []
        doc_ids: list[int] = []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            sig = minhash_signature(shingles(text, self.k))
            for key in lsh_band_keys(sig):
                band_keys.append(key)
                doc_ids.append(doc_id)
        return pa.Table.from_pydict(
            {"bucket": pa.array([k % NGRAM_BUCKETS for k in band_keys],
                                pa.int32()),
             "band_key": pa.array(band_keys, pa.int64()),
             "doc_id": pa.array(doc_ids, pa.int64())}
        )


def bucket_candidate_pairs(group: "pa.Table | object") -> pa.Table:
    """Within one LSH bucket: all doc-id pairs (sorted, capped)."""
    import pandas as pd

    if isinstance(group, pd.DataFrame):
        ids = sorted(set(int(x) for x in group["doc_id"]))
    else:
        ids = sorted(set(group.column("doc_id").to_pylist()))
    ids = ids[:MAX_BUCKET]
    a, b = [], []
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            a.append(ids[i])
            b.append(ids[j])
    return pa.Table.from_pydict(
        {"doc_id_a": pa.array(a, pa.int64()), "doc_id_b": pa.array(b, pa.int64())}
    )


class SimHashStage:
    """doc → 4 (bucket, band_key, doc_id, simhash) rows (16-bit
    bands); bucket as in MinHashStage."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        band_keys: list[int] = []
        doc_ids: list[int] = []
        hashes: list[int] = []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            sh = simhash64(text)
            signed = sh - (1 << 64) if sh >= (1 << 63) else sh
            for band in range(4):
                chunk = (sh >> (band * 16)) & 0xFFFF
                band_keys.append((band << 16) | chunk)
                doc_ids.append(doc_id)
                hashes.append(signed)
        return pa.Table.from_pydict(
            {
                "bucket": pa.array([k % NGRAM_BUCKETS for k in band_keys],
                                   pa.int32()),
                "band_key": pa.array(band_keys, pa.int64()),
                "doc_id": pa.array(doc_ids, pa.int64()),
                "simhash": pa.array(hashes, pa.int64()),
            }
        )


def band_bucket_pairs(group):
    """One band-hash bucket (pandas) → candidate pairs for every
    band_key in the bucket, ids sorted, per-band cap MAX_BUCKET.
    Vectorized run-length grouping (one Python call per BUCKET, not
    per band). Carries sh_a/sh_b when a ``simhash`` column is
    present."""
    import numpy as np
    import pandas as pd

    has_sh = "simhash" in group.columns
    cols = ["band_key", "doc_id"] + (["simhash"] if has_sh else [])
    df = (
        group[cols]
        .drop_duplicates(["band_key", "doc_id"])
        .sort_values(["band_key", "doc_id"], kind="mergesort")
    )
    keys = df["band_key"].to_numpy()
    ids = df["doc_id"].to_numpy()
    sh = df["simhash"].to_numpy() if has_sh else None
    empty_cols = {"doc_id_a": pd.Series(dtype="int64"),
                  "doc_id_b": pd.Series(dtype="int64")}
    if has_sh:
        empty_cols.update({"sh_a": pd.Series(dtype="int64"),
                           "sh_b": pd.Series(dtype="int64")})
    if not len(df):
        return pd.DataFrame(empty_cols)
    change = np.empty(len(keys), dtype=bool)
    change[0] = True
    change[1:] = keys[1:] != keys[:-1]
    starts = np.flatnonzero(change)
    counts = np.diff(np.append(starts, len(keys)))
    out = []
    for s, c in zip(starts, counts):
        if c < 2:
            continue
        c2 = min(int(c), MAX_BUCKET)
        gi = ids[s : s + c2]
        iu, ju = np.triu_indices(c2, 1)
        cols_out = {"doc_id_a": gi[iu], "doc_id_b": gi[ju]}
        if has_sh:
            gs = sh[s : s + c2]
            cols_out.update({"sh_a": gs[iu], "sh_b": gs[ju]})
        out.append(pd.DataFrame(cols_out))
    if not out:
        return pd.DataFrame(empty_cols)
    return pd.concat(out, ignore_index=True)


# ------------------------------------------- exact n-gram Jaccard dedup
#
# Inverted-index idiom (vs MinHash above, which is the sketch path):
#   docs → distinct word-3gram rows (shingle, doc_id, n_sh)   [map_batches]
#   → groupby(shingle): emit co-occurring doc pairs, skipping
#     hot shingles (doc-frequency > NGRAM_DF_CAP — the scalability
#     guard; stop-phrase groups would otherwise emit O(df²) pairs)
#   → groupby(pair): count shared shingles co
#   → jaccard_micro = co·10⁶ // (|A|+|B|−co), integer-exact.
# Only shingle strings + int ids are shuffled, never document text; at
# larger scale the shingle key would be a 64-bit hash to shrink the
# exchange (kept as the raw string here so the DuckDB oracle is
# equality-exact with no collision asterisk).

NGRAM_DF_CAP = 500  # mirror: oracle HAVING count(*) <= 500
NGRAM_K = 3

_WS = None  # compiled lazily (regex mirrors the oracle's '\s+')


def _word_shingles(text: str, k: int = NGRAM_K) -> set[str]:
    """Distinct lowercase word k-grams; tokenization mirrors the SQL
    oracle exactly: split on '\\s+', drop empties."""
    global _WS
    if _WS is None:
        import re

        _WS = re.compile(r"\s+")
    tk = [w for w in _WS.split(text.lower()) if w]
    return {" ".join(tk[i : i + k]) for i in range(len(tk) - k + 1)}


NGRAM_BUCKETS = 32  # shuffle granularity of the posting-list exchange


def shingle_rows(batch: pa.Table) -> pa.Table:
    """doc → one row per distinct word-3gram:
    (bucket, shingle, doc_id, n_sh).

    ``bucket = crc32(shingle) % NGRAM_BUCKETS`` is the explicit hash
    partitioning key: the downstream groupby shuffles into only
    NGRAM_BUCKETS groups (all rows of a shingle share a bucket), and
    pair emission is vectorized within each bucket. n_sh is
    denormalized onto every row so the pair stage never needs a sizes
    join/broadcast (an int per row beats a 10^12-entry dict)."""
    import zlib

    sh_col: list[str] = []
    id_col: list[int] = []
    n_col: list[int] = []
    b_col: list[int] = []
    for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                            batch.column("text").to_pylist()):
        ss = _word_shingles(text or "")
        sh_col.extend(ss)
        id_col.extend([doc_id] * len(ss))
        n_col.extend([len(ss)] * len(ss))
        b_col.extend(zlib.crc32(s.encode()) % NGRAM_BUCKETS for s in ss)
    return pa.Table.from_pydict(
        {"bucket": pa.array(b_col, pa.int32()),
         "shingle": pa.array(sh_col, pa.string()),
         "doc_id": pa.array(id_col, pa.int64()),
         "n_sh": pa.array(n_col, pa.int64())}
    )


def shingle_partition_pairs(batch: pa.Table) -> pa.Table:
    """One hash bucket of (shingle, doc_id, n_sh) posting rows →
    co-occurring doc pairs (a<b) for every shingle in the bucket (the
    bucket key guarantees a shingle's full posting list is present).
    Hot shingles (df > NGRAM_DF_CAP) emit nothing.

    Vectorized: pandas sort groups the runs, numpy emits the pair
    index triangles — ~30× faster than a per-group ``map_groups``
    (which pays ~ms of Python per shingle; measured 44 s → 1.5 s on
    5k docs)."""
    import numpy as np

    df = batch.select(["shingle", "doc_id", "n_sh"]).to_pandas()
    if not len(df):
        return pa.Table.from_pydict(
            {"doc_id_a": pa.array([], pa.int64()),
             "doc_id_b": pa.array([], pa.int64()),
             "na": pa.array([], pa.int64()),
             "nb": pa.array([], pa.int64())}
        )
    df = df.sort_values(["shingle", "doc_id"], kind="mergesort")
    ids = df["doc_id"].to_numpy()
    ns = df["n_sh"].to_numpy()
    sh = df["shingle"].to_numpy()
    # run-length boundaries of the sorted shingle column
    change = np.empty(len(sh), dtype=bool)
    change[0] = True
    change[1:] = sh[1:] != sh[:-1]
    starts = np.flatnonzero(change)
    counts = np.diff(np.append(starts, len(sh)))

    out_a, out_b, out_na, out_nb = [], [], [], []
    for s, c in zip(starts, counts):
        if c < 2 or c > NGRAM_DF_CAP:
            continue
        gi = ids[s : s + c]
        gn = ns[s : s + c]
        iu, ju = np.triu_indices(int(c), 1)
        out_a.append(gi[iu])
        out_b.append(gi[ju])
        out_na.append(gn[iu])
        out_nb.append(gn[ju])
    if not out_a:
        return pa.Table.from_pydict(
            {"pair_bucket": pa.array([], pa.int32()),
             "doc_id_a": pa.array([], pa.int64()),
             "doc_id_b": pa.array([], pa.int64()),
             "na": pa.array([], pa.int64()),
             "nb": pa.array([], pa.int64())}
        )
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    # explicit hash partitioning for the pair-count shuffle: the same
    # (a,b) pair from different shingle buckets must meet again, but
    # in one of only NGRAM_BUCKETS groups (vectorized combine inside)
    pb = ((a * 2654435761 + b) % NGRAM_BUCKETS).astype(np.int32)
    return pa.Table.from_pydict(
        {"pair_bucket": pa.array(pb),
         "doc_id_a": pa.array(a, pa.int64()),
         "doc_id_b": pa.array(b, pa.int64()),
         "na": pa.array(np.concatenate(out_na), pa.int64()),
         "nb": pa.array(np.concatenate(out_nb), pa.int64())}
    )


def pair_bucket_jaccard(group, threshold_micro: int):
    """One pair-hash bucket → final (doc_id_a, doc_id_b, jaccard_micro)
    rows. C-speed pandas groupby: co = number of shared shingles;
    jaccard in integer micro-units (co·10⁶ // (na+nb−co)), exact."""
    g = (
        group.groupby(["doc_id_a", "doc_id_b"], sort=False)
        .agg(co=("na", "size"), na=("na", "first"), nb=("nb", "first"))
        .reset_index()
    )
    jm = (g["co"] * 1_000_000) // (g["na"] + g["nb"] - g["co"])
    out = g.loc[jm >= threshold_micro, ["doc_id_a", "doc_id_b"]].copy()
    out["jaccard_micro"] = jm[jm >= threshold_micro].astype("int64")
    return out.reset_index(drop=True)


def jaccard_from_counts(batch: pa.Table, threshold_micro: int) -> pa.Table:
    """(pair, co, na, nb) → integer-exact jaccard_micro, thresholded."""
    import numpy as np

    co = np.asarray(batch.column("co").to_pylist(), dtype=np.int64)
    na = np.asarray(batch.column("na").to_pylist(), dtype=np.int64)
    nb = np.asarray(batch.column("nb").to_pylist(), dtype=np.int64)
    jm = (co * 1_000_000) // (na + nb - co)
    keep = jm >= threshold_micro
    return pa.Table.from_pydict(
        {"doc_id_a": pa.array(
            np.asarray(batch.column("doc_id_a").to_pylist(), dtype=np.int64)[keep]),
         "doc_id_b": pa.array(
            np.asarray(batch.column("doc_id_b").to_pylist(), dtype=np.int64)[keep]),
         "jaccard_micro": pa.array(jm[keep])}
    )


def verify_jaccard_pairs(
    pairs: list[tuple[int, int]],
    texts_by_id: dict[int, str],
    k_shingle: int = 3,
    threshold_micro: int = 700_000,
) -> pa.Table:
    """Exact shingle-Jaccard verification of candidate pairs.

    Jaccard is reported in integer micro-units (deterministic compare;
    SURVEY.md §7.4 no-float rule). `texts_by_id` is the broadcast small
    side (ray.put on the driver for big runs)."""
    cache: dict[int, set[int]] = {}

    def sh(i: int) -> set[int]:
        if i not in cache:
            cache[i] = shingles(texts_by_id.get(i, ""), k_shingle)
        return cache[i]

    out_a, out_b, out_j = [], [], []
    for a, b in pairs:
        sa, sb = sh(a), sh(b)
        inter = len(sa & sb)
        union = len(sa) + len(sb) - inter
        # integer micro-units directly on set sizes (no float rounding;
        # SURVEY.md §7.4 — matches the oracle-checked co*10⁶ // union)
        jm = (inter * 1_000_000) // union if union else 0
        if jm >= threshold_micro:
            out_a.append(a)
            out_b.append(b)
            out_j.append(jm)
    return pa.Table.from_pydict(
        {
            "doc_id_a": pa.array(out_a, pa.int64()),
            "doc_id_b": pa.array(out_b, pa.int64()),
            "jaccard_micro": pa.array(out_j, pa.int64()),
        }
    )


def verify_simhash_pairs(
    pairs: list[tuple[int, int, int, int]], max_hamming: int = 3
) -> pa.Table:
    """(a, b, sh_a, sh_b) candidates → pairs with hamming ≤ max."""
    out_a, out_b, out_h = [], [], []
    for a, b, sa, sb in pairs:
        h = hamming64(sa & ((1 << 64) - 1), sb & ((1 << 64) - 1))
        if h <= max_hamming:
            out_a.append(a)
            out_b.append(b)
            out_h.append(h)
    return pa.Table.from_pydict(
        {
            "doc_id_a": pa.array(out_a, pa.int64()),
            "doc_id_b": pa.array(out_b, pa.int64()),
            "hamming": pa.array(out_h, pa.int64()),
        }
    )
