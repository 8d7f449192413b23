"""Bloom-filter stage kernels (stages/bloom.py): no false negatives,
bounded false positives, tree-merge == whole-set build."""

import numpy as np
import pytest

from documentconvert_ray.stages import bloom as bl


def test_no_false_negatives_and_fp_bound():
    rng = np.random.RandomState(11)
    keys = np.unique(rng.randint(0, 1 << 48, size=20_000).astype(np.int64))
    m = bl.bloom_bits(len(keys))
    bits = bl.partial_bitmap(keys, m)
    assert bl.contains(keys, bits).all(), "member keys must always pass"

    probe = np.unique(rng.randint(1 << 48, 1 << 52, size=50_000).astype(np.int64))
    fp = bl.contains(probe, bits).mean()
    # (1 - e^{-k n / m})^k at 8 bits/key, k=4 ≈ 2.4%
    assert fp < 0.05, fp


def test_partial_or_merge_equals_whole():
    rng = np.random.RandomState(7)
    keys = rng.randint(0, 1 << 40, size=5_000).astype(np.int64)
    m = bl.bloom_bits(len(keys))
    whole = bl.partial_bitmap(keys, m)
    merged = np.zeros(m // 8, np.uint8)
    for chunk in np.array_split(keys, 13):
        merged |= bl.partial_bitmap(chunk, m)
    assert np.array_equal(whole, merged)


def test_bits_size_derivation():
    assert bl.bloom_bits(0) == 1 << 20
    assert bl.bloom_bits(1 << 17) == 1 << 20
    assert bl.bloom_bits((1 << 17) + 1) == 1 << 21
    # power of two (positions use a mask)
    for n in (1, 1000, 123_456, 10_000_000):
        m = bl.bloom_bits(n)
        assert m & (m - 1) == 0 and m >= 8 * n


def test_distributed_build_matches_local(ray_session):
    import pyarrow as pa
    import ray.data

    rng = np.random.RandomState(3)
    keys = rng.randint(0, 1 << 40, size=4_000).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys, pa.int64())})
    ).repartition(7)
    dist = bl.build_bloom(ds, "k", len(keys))
    local = bl.partial_bitmap(keys, bl.bloom_bits(len(keys)))
    assert np.array_equal(dist, local)


def test_distributed_build_multilevel_tree(ray_session):
    """More partial rows than _TREE_FANOUT forces a second OR level —
    the result must still equal the local whole-set bitmap."""
    import pyarrow as pa
    import ray.data

    rng = np.random.RandomState(5)
    keys = rng.randint(0, 1 << 40, size=9_000).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"k": pa.array(keys, pa.int64())})
    ).repartition(bl._TREE_FANOUT * 2 + 9)
    dist = bl.build_bloom(ds, "k", len(keys))
    local = bl.partial_bitmap(keys, bl.bloom_bits(len(keys)))
    assert np.array_equal(dist, local)
