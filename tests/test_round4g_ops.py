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


def _duck(sf):
    import duckdb

    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem", "supplier", "part"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    return con


def _to_df(res):
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    return res


def test_cheapest_supplier_vs_duckdb(ray_session):
    from documentconvert_ray.pipelines import queries as Q

    got = _to_df(Q.q_cheapest_supplier(SF)).reset_index(drop=True)
    want = (_duck(SF).execute(Q.ORACLES["cheapest_supplier"]).df()
            .sort_values("p_partkey").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # argmin invariant: one row per part, price is that part's min
    assert got["p_partkey"].is_unique


def test_returned_priority_counts_vs_duckdb(ray_session):
    from documentconvert_ray.pipelines import queries as Q

    got = (_to_df(Q.q_returned_priority_counts(SF))
           .sort_values("priority").reset_index(drop=True))
    want = (_duck(SF).execute(Q.ORACLES["returned_priority_counts"])
            .df().sort_values("priority").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_small_qty_revenue_vs_duckdb(ray_session):
    from documentconvert_ray.pipelines import queries as Q

    got = _to_df(Q.q_small_qty_revenue(SF))
    want = _duck(SF).execute(Q.ORACLES["small_qty_revenue"]).df()
    assert int(got["avg_yearly_cents"][0]) == int(
        want["avg_yearly_cents"][0])
    assert int(got["n_small_lineitems"][0]) == int(
        want["n_small_lineitems"][0])


def test_top_suppliers_ties_and_max(ray_session):
    from documentconvert_ray.pipelines import queries as Q

    got = _to_df(Q.q_top_suppliers(SF))
    want = _duck(SF).execute(Q.ORACLES["top_suppliers"]).df()
    assert len(got) == len(want) >= 1
    assert set(got["s_suppkey"]) == set(want["s_suppkey"])
    # every returned supplier has exactly the max revenue
    assert got["total_rev_micro"].nunique() == 1


def test_idle_rich_customers_vs_duckdb(ray_session):
    from documentconvert_ray.pipelines import queries as Q

    got = (_to_df(Q.q_idle_rich_customers(SF))
           .sort_values("c_mktsegment").reset_index(drop=True))
    want = (_duck(SF).execute(Q.ORACLES["idle_rich_customers"]).df()
            .sort_values("c_mktsegment").reset_index(drop=True))
    assert len(want) >= 1  # predicate must be non-degenerate
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_brand_supplier_counts_vs_duckdb(ray_session):
    from documentconvert_ray.pipelines import queries as Q

    got = (_to_df(Q.q_brand_supplier_counts(SF))
           .sort_values(["p_brand", "p_size"]).reset_index(drop=True))
    want = (_duck(SF).execute(Q.ORACLES["brand_supplier_counts"]).df()
            .sort_values(["p_brand", "p_size"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_domain_link_agg_vs_duckdb(ray_session):
    import duckdb

    from documentconvert_ray.pipelines import queries as Q

    got = (_to_df(Q.q_domain_link_agg(SF))
           .sort_values("src_domain").reset_index(drop=True))
    want = (duckdb.connect().execute(
        Q.oracle_sql()["domain_link_agg"]).df()
        .sort_values("src_domain").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # list is sorted ascending and its length matches n_dsts
    for lst, n in zip(got["dst_list"], got["n_dsts"]):
        parts = lst.split(",")
        assert parts == sorted(parts) and len(parts) == n


def test_geo_mean_value_vs_duckdb(ray_session):
    import duckdb

    from documentconvert_ray.pipelines import queries as Q

    got = (_to_df(Q.q_geo_mean_value(SF))
           .sort_values("event_type").reset_index(drop=True))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    want = (con.execute(Q.ORACLES["geo_mean_value"]).df()
            .sort_values("event_type").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # geo-mean(log2) must sit between min and max log2 of the values
    assert (got["geo_log2_micro"] > 0).all()


def _bpe_brute(sf, k):
    """Independent trainer: word counts straight from DuckDB, merge
    loop re-implemented with different data structures (list-of-
    symbols rewrite instead of dict rebuild)."""
    import duckdb
    from collections import Counter

    rows = duckdb.connect().execute(f"""
        SELECT tok, count(*) FROM (
          SELECT unnest(list_filter(
              string_split_regex(text, '\\s+'), x -> x <> '')) AS tok
          FROM read_parquet('{sf}/documents.parquet'))
        GROUP BY 1""").fetchall()
    seqs = [(list(w), int(n)) for w, n in sorted(rows)]
    out = []
    for r in range(k):
        pc = Counter()
        for sym, n in seqs:
            for a, b in zip(sym, sym[1:]):
                pc[(a, b)] += n
        if not pc:
            break
        (la, rb), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((r, la, rb, la + rb, cnt))
        for i, (sym, n) in enumerate(seqs):
            j, new = 0, []
            while j < len(sym):
                if (j + 1 < len(sym) and sym[j] == la
                        and sym[j + 1] == rb):
                    new.append(la + rb)
                    j += 2
                else:
                    new.append(sym[j])
                    j += 1
            seqs[i] = (new, n)
    return out


def test_bpe_vocab_matches_bruteforce(ray_session):
    from documentconvert_ray.pipelines import queries as Q

    got = _to_df(Q.q_bpe_vocab(SF))
    want = _bpe_brute(SF, Q.BPE_MERGES)
    assert [tuple(r) for r in got.itertuples(index=False)] == want


def test_bpe_vocab_block_invariance(ray_session):
    from documentconvert_ray.pipelines import queries as Q

    base = _to_df(Q.q_bpe_vocab(SF))
    orig = Q._read

    def shredded(sf_dir, name, columns=None):
        return orig(sf_dir, name, columns).repartition(5)

    Q._read = shredded
    try:
        got = _to_df(Q.q_bpe_vocab(SF))
    finally:
        Q._read = orig
    pd.testing.assert_frame_equal(got, base)


def test_hard_negatives_vs_bruteforce(ray_session):
    """Independent numpy recompute: top-k cosine among different-label
    vectors, ties to smallest id."""
    from documentconvert_ray.pipelines import queries as Q

    t = pq.read_table(f"{SF}/embeddings.parquet",
                      columns=["vec_id", "embedding", "label"])
    ids = np.asarray(t.column("vec_id").to_pylist(), np.int64)
    labs = np.asarray(t.column("label").to_pylist(), np.int64)
    m = np.stack(t.column("embedding").to_pylist()).astype(np.float64)
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    got = (_to_df(Q.q_hard_negatives(SF))
           .sort_values(["query_id", "rnk"]).reset_index(drop=True))
    rows = []
    for qid in range(Q.N_KNN_QUERIES):
        qi = int(np.flatnonzero(ids == qid)[0])
        sims = m @ m[qi]
        cand = np.flatnonzero(labs != labs[qi])
        order = cand[np.lexsort((ids[cand], -sims[cand]))][:Q.KNN_K]
        for r, j in enumerate(order, 1):
            rows.append((qid, int(ids[j]), r))
    want = pd.DataFrame(rows, columns=["query_id", "neighbor_id",
                                       "rnk"])
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # no negative shares its query's label
    lab_of = dict(zip(ids, labs))
    qlab = {q: lab_of[q] for q in got["query_id"].unique()}
    assert all(lab_of[n] != qlab[q]
               for q, n in zip(got["query_id"], got["neighbor_id"]))


def test_class_balance_plan_invariants(ray_session):
    from documentconvert_ray.pipelines import queries as Q

    got = _to_df(Q.q_class_balance_plan(SF))
    mx = got["n_vecs"].max()
    # the plan always reaches at least the majority-class size and
    # overshoots by less than one repeat
    assert (got["n_after"] >= mx).all()
    assert (got["n_after"] - got["n_vecs"] < mx).all()
    assert (got["repeat_factor"]
            == -(-mx // got["n_vecs"])).all()


def test_filtered_revenue_vs_duckdb(ray_session):
    from documentconvert_ray.pipelines import queries as Q

    got = _to_df(Q.q_filtered_revenue(SF))
    want = _duck(SF).execute(Q.ORACLES["filtered_revenue"]).df()
    assert int(got["revenue_cents"][0]) == int(want["revenue_cents"][0])
    assert int(got["n_items"][0]) == int(want["n_items"][0])
    assert int(got["n_items"][0]) > 0  # predicate non-degenerate


def test_important_parts_vs_duckdb(ray_session):
    from documentconvert_ray.pipelines import queries as Q

    got = (_to_df(Q.q_important_parts(SF))
           .sort_values("p_partkey").reset_index(drop=True))
    want = (_duck(SF).execute(Q.ORACLES["important_parts"]).df()
            .sort_values("p_partkey").reset_index(drop=True))
    assert len(want) >= 1
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # every kept part strictly exceeds 3/2 x the average
    import duckdb
    tot, np_ = _duck(SF).execute(
        "SELECT sum(v), count(*) FROM (SELECT sum(CAST(floor("
        "l_extendedprice*100+0.5) AS BIGINT)) v FROM lineitem "
        "GROUP BY l_partkey)").fetchone()
    assert all(int(v) * int(np_) * Q.Q11_DEN > int(tot) * Q.Q11_NUM
               for v in got["value_cents"])
