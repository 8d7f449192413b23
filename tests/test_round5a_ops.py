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
