"""Distributed Bloom-filter build for sideways-information-passing
semi-joins.

The shape (reference analogue: the resume anti-join / url-dedup keep
lists, SURVEY.md §2.4; scale technique: bloom-pruned semi-join a la
"sideways information passing" in distributed SQL engines): when the
build side's DISTINCT key set is too large to broadcast exactly, a
fixed-size Bloom bitmap is built distributively — each build batch
emits ONE packed-bitmap partial row, partials OR-merge through a
bounded-fan-in tree of shuffle-free map_batches levels (no task folds
more than _TREE_FANOUT bitmaps, however many build batches there
are), and only the final ≤ a-few-MiB bitmap is broadcast via
ray.put. The probe side then drops non-members map-side
BEFORE its shuffle; the bitmap's false positives (rate ≈ (1-e^{-kn/m})^k,
< 2.5% at 8 bits/key, k=4) are removed by the exact co-partitioned
hash join that follows, so results are EXACT — the bloom only shrinks
the exchange.

All hashing is closed-form uint64 arithmetic (wrap-around multiply +
shift double hashing) — deterministic across runs, processes and
partitionings.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

BLOOM_K = 4  # probes per key
_TREE_FANOUT = 32  # OR-merge tree width (bitmap rows per reduce group)
_MIN_BITS = 1 << 20

_H1 = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio mix
_H2 = np.uint64(0xC2B2AE3D27D4EB4F)  # xxhash64 prime


def bloom_bits(n_keys: int) -> int:
    """Bitmap size: ≥ 8 bits per expected distinct key, power of two
    (probe positions become a mask), floor 1 MiBit. 10^9 build keys →
    1 GiB bitmap: at that point raise bits/key pressure by sharding
    the JOIN key space and building one bloom per shard instead."""
    m = _MIN_BITS
    while m < max(1, n_keys) * 8:
        m <<= 1
    return m


def _positions(keys: np.ndarray, m: int) -> list[np.ndarray]:
    """k probe positions per key, double hashing h1 + i·h2 (mod m).
    uint64 multiplies wrap mod 2^64 — intended and deterministic."""
    x = keys.astype(np.uint64)
    h1 = (x * _H1) >> np.uint64(7)
    h2 = ((x * _H2) >> np.uint64(9)) | np.uint64(1)
    mask = np.uint64(m - 1)
    return [(h1 + np.uint64(i) * h2) & mask for i in range(BLOOM_K)]


def partial_bitmap(keys: np.ndarray, m: int) -> np.ndarray:
    """One batch's packed (m/8-byte uint8) bitmap partial."""
    buf = np.zeros(m // 8, np.uint8)
    for pos in _positions(np.unique(keys), m):
        np.bitwise_or.at(
            buf, (pos >> np.uint64(3)).astype(np.int64),
            np.left_shift(np.uint8(1), (pos & np.uint64(7)).astype(np.uint8)),
        )
    return buf


def contains(keys: np.ndarray, bits: np.ndarray) -> np.ndarray:
    """Vectorized membership mask (true members always pass; false
    positives possible — callers MUST exact-verify downstream)."""
    m = int(bits.shape[0]) * 8
    out = np.ones(keys.shape[0], dtype=bool)
    for pos in _positions(keys, m):
        byte = bits[(pos >> np.uint64(3)).astype(np.int64)]
        out &= (
            np.right_shift(byte, (pos & np.uint64(7)).astype(np.uint8))
            & np.uint8(1)
        ).astype(bool)
    return out


def build_bloom(keys_ds, column: str, n_keys_hint: int) -> np.ndarray:
    """Distributed bitmap build over ``keys_ds[column]``: per-batch
    packed partials (one row each) → bounded-fan-in OR-merge tree —
    each level is a shuffle-FREE ``map_batches(batch_size=_TREE_FANOUT)``
    that folds ≤ _TREE_FANOUT bitmap rows into one, repeated (OR is
    associative+commutative, so level grouping is free to be
    arbitrary) until ≤ _TREE_FANOUT rows remain for the driver fold.
    No task or the driver ever materializes more than _TREE_FANOUT
    bitmaps at once, regardless of the build batch count; the key
    rows themselves never leave their read tasks."""
    m = bloom_bits(n_keys_hint)

    def make_partial(batch: pa.Table) -> pa.Table:
        buf = partial_bitmap(batch.column(column).to_numpy(), m)
        return pa.Table.from_pydict({
            "bits": pa.array([buf.tobytes()], pa.binary()),
        })

    def or_batch(batch: pa.Table) -> pa.Table:
        acc = np.zeros(m // 8, np.uint8)
        for b in batch.column("bits"):
            acc |= np.frombuffer(b.as_py(), np.uint8)
        return pa.Table.from_pydict({
            "bits": pa.array([acc.tobytes()], pa.binary()),
        })

    # batch_size=None → one partial bitmap per BLOCK, not per 1024
    # rows: at a 32 MiB bitmap the default batch size would stream
    # thousands of near-empty bitmaps through the first OR level
    level = keys_ds.map_batches(
        make_partial, batch_size=None, batch_format="pyarrow"
    ).map_batches(
        or_batch, batch_size=_TREE_FANOUT, batch_format="pyarrow"
    ).materialize()
    n = level.count()
    while n > _TREE_FANOUT:
        # batch bundling usually gives full fan-in; if block layout
        # ever stalls the shrink, force it with an explicit coalesce
        nxt = level.map_batches(
            or_batch, batch_size=_TREE_FANOUT, batch_format="pyarrow"
        ).materialize()
        n_nxt = nxt.count()
        if n_nxt >= n:
            nxt = level.repartition(
                max(1, n // _TREE_FANOUT)
            ).map_batches(or_batch, batch_format="pyarrow").materialize()
            n_nxt = nxt.count()
        level, n = nxt, n_nxt

    final = np.zeros(m // 8, np.uint8)
    for row in level.take_all():
        final |= np.frombuffer(row["bits"], np.uint8)
    return final
