"""Round-5 scale-path coverage: the r4-verdict cutover fixes for the
three domain-axis graph queries. Each distributed path is forced via
its env override on the tiny sf0.001 graph and must produce results
IDENTICAL to the default (broadcast / driver-close) path — the same
contract the CC_DRIVER_MAX_PAIRS cutover tests use."""

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def registry(ray_session):
    from documentconvert_ray.pipelines.queries import queries

    return queries()


def _canon(df):
    from check_oracles import canon, to_pandas

    return canon(to_pandas(df))


def test_harmonic_distributed_equals_broadcast(registry, ray_session,
                                               monkeypatch):
    base = _canon(registry["harmonic_centrality"](SF))
    monkeypatch.setenv("HARMONIC_BCAST_MAX_NODES", "1")
    dist = _canon(registry["harmonic_centrality"](SF))
    assert len(base) > 0
    assert base.equals(dist)


def test_harmonic_distributed_runs_frontier_path(registry, ray_session,
                                                 monkeypatch):
    # the cutover really selects the frontier-join implementation
    from documentconvert_ray.pipelines import queries as q

    called = {}
    orig = q._harmonic_distributed

    def spy(und):
        called["yes"] = True
        return orig(und)

    monkeypatch.setattr(q, "_harmonic_distributed", spy)
    monkeypatch.setenv("HARMONIC_BCAST_MAX_NODES", "1")
    q.q_harmonic_centrality(SF)
    assert called.get("yes")


def test_domain_clustering_close_is_distributed(registry, ray_session):
    # the bucketed close returns a Dataset (not a driver frame) and
    # matches a brute pandas recompute of coeff from its own inputs
    import ray.data

    got = registry["domain_clustering"](SF)
    assert isinstance(got, ray.data.Dataset)
    df = _canon(got)
    assert (df["deg"] >= 2).all()
    possible = df["deg"].to_numpy(np.int64) * (
        df["deg"].to_numpy(np.int64) - 1) // 2
    want = df["n_tri"].to_numpy(np.int64) * 1_000_000 // possible
    assert (df["coeff_ppm"].to_numpy(np.int64) == want).all()


def test_hits_node_index_without_driver_edges(registry, ray_session,
                                              monkeypatch):
    # q_hits_domains must not call Dataset.to_pandas on the edge
    # Dataset any more — only O(nodes) frames may be collected
    import ray.data

    big_pulls = []
    orig = ray.data.Dataset.to_pandas

    def spy(self, *a, **k):
        out = orig(self, *a, **k)
        if "src_domain" in out.columns and "n_links" in out.columns:
            big_pulls.append(len(out))
        return out

    monkeypatch.setattr(ray.data.Dataset, "to_pandas", spy)
    got = registry["hits_domains"](SF)
    assert len(got) > 0
    assert big_pulls == []


# --- round-5 OCR leg (r4-verdict task 3) -----------------------------


def test_ocr_glyph_table_noise_immunity():
    # flipping up to OCR_NOISE_BUDGET pixels of any glyph can never
    # change the nearest-template decision
    from documentconvert_ray.functions.ocr import (
        OCR_GLYPH_CHARS, OCR_NOISE_BUDGET, _glyph_bits, match_cell)

    assert OCR_NOISE_BUDGET >= 4
    rng = np.random.RandomState(7)
    for ch in OCR_GLYPH_CHARS:
        bits = _glyph_bits(ch)
        for _ in range(5):
            noisy = bits
            for pos in rng.choice(64, OCR_NOISE_BUDGET, replace=False):
                noisy ^= 1 << int(pos)
            assert match_cell(noisy) == ch


def test_ocr_render_roundtrip_clean_and_noisy():
    from documentconvert_ray.functions.image_codec import decode_pixels
    from documentconvert_ray.functions.ocr import ocr_gray_row
    from documentconvert_ray.sources.corpus import render_ocr_png

    s = "HELLO WORLD 42"
    for seed in (None, 0, 123):
        png = render_ocr_png(s, noise_seed=seed)
        info, buf = decode_pixels(png)
        assert (info.width, info.height) == (8 * len(s), 8)
        assert ocr_gray_row(buf, info.width) == s


def test_ocr_text_matches_planted_ground_truth(registry, ray_session):
    import re

    import pyarrow.parquet as pq

    got = _canon(registry["ocr_text"](SF))
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "text"]).to_pandas()
    planted = [re.sub(r"[^A-Za-z0-9 ]", "", x or "")[:32].upper()
               for x in t["text"]]
    kind = ["no_image" if p == "" else
            ("ocr_noisy" if i % 7 == 3 else "ocr")
            for i, p in zip(t["doc_id"], planted)]
    want = _canon(pd.DataFrame({
        "doc_id": t["doc_id"].to_numpy(np.int64),
        "kind": kind, "ocr_text": planted}))
    assert len(got) == len(t)
    assert (got["kind"] == "ocr_noisy").sum() > 0
    assert got.equals(want)
