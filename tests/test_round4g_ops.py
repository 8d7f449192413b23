"""Unit coverage for the session-8 operators (T150-T151): brute-force
numpy recompute of greedy k-center (independent of both the Ray plan
and the chained-CTE oracle), block-count invariance for the iterative
selection, and quantization code-range/dequant-error bounds."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _micro_mat(sf):
    t = pq.read_table(f"{sf}/embeddings.parquet",
                      columns=["vec_id", "embedding"])
    ids = t.column("vec_id").to_numpy()
    m = np.stack(t.column("embedding").to_pylist())
    order = np.argsort(ids)
    return (ids[order].astype(np.int64),
            np.floor(m[order].astype(np.float64) * 1_000_000)
            .astype(np.int64))


def _kcenter_brute(ids, X, k):
    sel = [(0, int(ids[0]), 0)]
    cent = X[0][None, :]
    for j in range(1, k):
        d = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        mind = d.min(axis=1)
        i = int(np.lexsort((ids, -mind))[0])
        sel.append((j, int(ids[i]), int(mind[i])))
        cent = np.vstack([cent, X[i][None, :]])
    return pd.DataFrame(sel, columns=["rnk", "vec_id", "dist_micro2"])


def test_kcenter_matches_bruteforce(ray_session):
    from documentconvert_ray.pipelines import queries as Q

    ids, X = _micro_mat(SF)
    want = _kcenter_brute(ids, X, Q.KCENTER_K)
    got = Q.q_kcenter_coreset(SF).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # farthest-point invariant: cover radius is non-increasing
    d = got["dist_micro2"].to_numpy()[1:]
    assert (np.diff(d) <= 0).all()
    assert got["vec_id"].is_unique


def test_kcenter_block_count_invariance(ray_session):
    """The per-block argmax partial + driver fold must be independent
    of how the materialized projection is blocked."""
    from documentconvert_ray.pipelines import queries as Q

    base = Q.q_kcenter_coreset(SF)

    orig_read = Q._read

    def shredded(sf_dir, name, columns=None):
        return orig_read(sf_dir, name, columns).repartition(7)

    Q._read = shredded
    try:
        got = Q.q_kcenter_coreset(SF)
    finally:
        Q._read = orig_read
    pd.testing.assert_frame_equal(got, base)


def test_quantize_codes_bounds_and_dequant(ray_session):
    from documentconvert_ray.pipelines import queries as Q

    got = (Q.q_embedding_quantize(SF).to_pandas()
           .sort_values("vec_id").reset_index(drop=True))
    ids, X = _micro_mat(SF)
    mn = X.min(axis=1)
    mx = X.max(axis=1)
    span = np.where(mx > mn, mx - mn, 1)
    codes = ((X - mn[:, None]) * 255) // span[:, None]
    codes[mx == mn] = 0
    assert (got["vec_id"].to_numpy() == ids).all()
    assert (got["min_micro"].to_numpy() == mn).all()
    assert (got["max_micro"].to_numpy() == mx).all()
    assert (got["code_sum"].to_numpy() == codes.sum(axis=1)).all()
    assert (got["code_sq_sum"].to_numpy()
            == (codes * codes).sum(axis=1)).all()
    # code range and dequantization error bound: reconstructing
    # x̂ = mn + code·span/255 is within one quantization step of x
    assert codes.min() >= 0 and codes.max() <= 255
    xhat = mn[:, None] + codes * (span[:, None] / 255.0)
    err = np.abs(xhat - X)
    assert (err <= span[:, None] / 255.0 + 1).all()
