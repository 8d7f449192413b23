"""Web-graph analytics ops: PageRank invariants + vs-reference bound
(the iterative op has no SQL oracle; this is its correctness gate)."""

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.usefixtures("ray_session")
def test_pagerank_matches_dense_reference():
    from documentconvert_ray.pipelines.queries import (
        PAGERANK_DAMPING,
        PAGERANK_ITERS,
        _link_edges,
        q_pagerank_domains,
    )

    got = q_pagerank_domains(SF_DIR).sort_values("domain").reset_index(
        drop=True)
    edges = _link_edges(SF_DIR).to_pandas()
    nodes = sorted(set(edges["src_domain"]) | set(edges["dst_domain"]))
    ix = {d: i for i, d in enumerate(nodes)}
    n = len(nodes)
    m = np.zeros((n, n))
    for s, d, w in zip(edges["src_domain"], edges["dst_domain"],
                       edges["n_links"]):
        m[ix[d], ix[s]] += w
    ol = m.sum(axis=0)
    r = np.full(n, 1.0 / n)
    for _ in range(PAGERANK_ITERS):
        flow = m @ np.where(ol > 0, r / np.maximum(ol, 1), 0.0)
        dang = r[ol == 0].sum()
        r = (1 - PAGERANK_DAMPING) / n + PAGERANK_DAMPING * (flow + dang / n)
    ref = dict(zip(nodes, np.floor(r * 1e9 + 0.5).astype(np.int64)))

    assert list(got["domain"]) == nodes
    # distributed float sums may differ from the dense product in the
    # last ulp; ±2 ppb absorbs that without hiding real defects
    for d, v in zip(got["domain"], got["rank_ppb"]):
        assert abs(int(v) - int(ref[d])) <= 2, d
    # probability mass invariant
    assert abs(int(got["rank_ppb"].sum()) - 1_000_000_000) <= n
    assert (got["rank_ppb"] > 0).all()


@pytest.mark.usefixtures("ray_session")
def test_degrees_consistent_with_edges():
    from documentconvert_ray.pipelines.queries import (
        _link_edges,
        q_domain_degrees,
    )

    deg = q_domain_degrees(SF_DIR).to_pandas()
    edges = _link_edges(SF_DIR).to_pandas()
    assert deg["out_degree"].sum() == len(edges)
    assert deg["in_degree"].sum() == len(edges)
    assert deg["out_links"].sum() == edges["n_links"].sum()
    assert deg["in_links"].sum() == edges["n_links"].sum()
