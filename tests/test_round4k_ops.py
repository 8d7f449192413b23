"""Unit coverage for the session-11 operators (T196-T201): brute-force
dominance recompute of the Pareto skyline plus the combiner-soundness
property, KMV sketch error bound / exactness-below-K / partitioning
invariance, mutual-information bounds and a crafted
perfectly-dependent table, multi-touch window recompute, and RLE
reconstruction invariants."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

SF = "/root/testdata/sf0.001"


def _canon(df):
    from check_oracles import canon, to_pandas

    return canon(to_pandas(df))


def _events_table(tmp_path, rows):
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value", "props"])
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    df = df.astype({"event_id": "int64", "user_id": "int64",
                    "value": "float64"})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_pareto_docs_brute_force(ray_session):
    """Every returned doc is undominated; every excluded doc is
    dominated by at least one returned doc (2D skyline totality)."""
    from documentconvert_ray.functions.textstats import tokens
    from documentconvert_ray.pipelines import queries as Q

    out = Q.q_pareto_docs(SF)
    docs = pd.read_parquet(os.path.join(SF, "documents.parquet"),
                           columns=["doc_id", "text"])
    pts = {}
    for r in docs.itertuples(index=False):
        tk = tokens(r.text)
        pts[int(r.doc_id)] = (len(tk), len(set(tk)))
    sky_ids = set(int(i) for i in out["doc_id"])

    def dominated(p, q):
        return (q[0] >= p[0] and q[1] >= p[1]
                and (q[0] > p[0] or q[1] > p[1]))

    for did, p in pts.items():
        is_dom = any(dominated(p, q) for o, q in pts.items() if o != did)
        assert (did in sky_ids) == (not is_dom), (did, p)
    # output coordinates are the true ones
    for r in out.itertuples(index=False):
        assert pts[int(r.doc_id)] == (int(r.n_tokens), int(r.n_distinct))


def test_skyline_local_combiner_soundness():
    """Global skyline of random int grids == skyline(union of local
    skylines) for every split — the combiner never loses a winner."""
    from documentconvert_ray.pipelines.queries import _skyline2

    rng = np.random.RandomState(7)
    for trial in range(10):
        df = pd.DataFrame({
            "doc_id": np.arange(200, dtype=np.int64),
            "x": rng.randint(0, 25, 200).astype(np.int64),
            "y": rng.randint(0, 25, 200).astype(np.int64)})
        whole = _skyline2(df)
        parts = [df.iloc[i::3] for i in range(3)]
        union = pd.concat([_skyline2(p) for p in parts])
        again = _skyline2(union)
        a = set(map(tuple, whole[["doc_id", "x", "y"]].to_numpy()))
        b = set(map(tuple, again[["doc_id", "x", "y"]].to_numpy()))
        assert a == b


def test_kmv_exact_below_k(ray_session, tmp_path):
    """n ≤ K on every side ⇒ all estimates are EXACT counts."""
    from documentconvert_ray.pipelines import queries as Q

    rows = []
    eid = 0
    ts = pd.Timestamp("2025-01-01")
    for u in range(40):
        rows.append((eid, ts, u, "click", 1.0, "{}")); eid += 1
        if u < 25:
            rows.append((eid, ts, u, "purchase", 1.0, "{}")); eid += 1
    sf = _events_table(tmp_path, rows)
    out = Q.q_user_overlap_kmv(sf).iloc[0]
    assert int(out["est_click"]) == 40
    assert int(out["est_purchase"]) == 25
    assert int(out["est_union"]) == 40
    assert int(out["est_intersection"]) == 25


def test_kmv_error_bound_and_invariance(ray_session, tmp_path):
    """n ≫ K: estimates land within 4/√K of truth (tail-safe bound for
    one fixed hash draw), and the whole row is invariant under input
    repartitioning (the k-min set is a set function)."""
    from documentconvert_ray.pipelines import queries as Q

    rows = []
    eid = 0
    ts = pd.Timestamp("2025-01-01")
    for u in range(3000):
        rows.append((eid, ts, u, "click", 1.0, "{}")); eid += 1
        if u % 2 == 0:
            rows.append((eid, ts, u, "purchase", 1.0, "{}")); eid += 1
    sf = _events_table(tmp_path, rows)
    out = Q.q_user_overlap_kmv(sf).iloc[0]
    K = Q.KMV_K
    tol = 4.0 / np.sqrt(K)
    assert abs(int(out["est_click"]) - 3000) <= 3000 * tol
    assert abs(int(out["est_purchase"]) - 1500) <= 1500 * tol
    assert abs(int(out["est_union"]) - 3000) <= 3000 * tol
    assert abs(int(out["est_intersection"]) - 1500) <= 1500 * 2 * tol
    # repartition the parquet into 5 shards → identical output row
    df = pd.read_parquet(os.path.join(sf, "events.parquet"))
    sf2 = tmp_path / "resharded"
    sf2.mkdir()
    for i in range(5):
        pq.write_table(
            pa.Table.from_pandas(df.iloc[i::5], preserve_index=False),
            str(sf2 / f"events_{i}.parquet"))
    # single-file layout expected by _read: concat shards instead
    merged = pd.concat([df.iloc[i::5] for i in range(5)],
                       ignore_index=True)
    sf3 = tmp_path / "reordered"
    sf3.mkdir()
    pq.write_table(pa.Table.from_pandas(merged, preserve_index=False),
                   str(sf3 / "events.parquet"))
    out2 = Q.q_user_overlap_kmv(str(sf3)).iloc[0]
    assert out.to_dict() == out2.to_dict()


def test_lang_source_mi_bounds_and_dependence(ray_session, tmp_path):
    """MI ≤ min(H(lang), H(source)) + floor slack; a perfectly
    dependent crafted table gives MI ≈ H exactly (micro-bit scale)."""
    from documentconvert_ray.pipelines import queries as Q

    out = Q.q_lang_source_mi(SF).iloc[0]
    n = int(out["n_docs"])
    mi_micro = int(out["mi_sum_micro"]) / n
    assert mi_micro >= -len("xx") * 2  # floored terms: tiny negative ok
    assert mi_micro <= min(int(out["h_lang_micro"]),
                           int(out["h_source_micro"])) + 2

    df = pd.DataFrame({
        "doc_id": np.arange(64, dtype=np.int64),
        "text": ["w"] * 64,
        "lang": [f"l{i % 4}" for i in range(64)],
        "source": [f"s{i % 4}" for i in range(64)],  # source == f(lang)
        "n_chars": np.int64(1)})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    dep = Q.q_lang_source_mi(str(tmp_path)).iloc[0]
    # uniform 4-way dependent: H = 2 bits, MI = 2 bits
    assert int(dep["h_lang_micro"]) == 2_000_000
    assert abs(int(dep["mi_sum_micro"]) // 64 - 2_000_000) <= 2


def test_multi_touch_window_recompute(ray_session):
    """Brute-force recount of the 7-day window for every purchase of
    the 3 busiest users at sf0.001."""
    from documentconvert_ray.pipelines import queries as Q

    out = _canon(Q.q_multi_touch_attribution(SF))
    ev = pd.read_parquet(os.path.join(SF, "events.parquet"))
    ev["t"] = ev["ts"].astype("datetime64[us]").astype("int64")
    busy = ev["user_id"].value_counts().index[:3]
    for u in busy:
        g = ev[ev["user_id"] == u]
        clicks = np.sort(g.loc[g["event_type"] == "click", "t"].to_numpy())
        for p in g[g["event_type"] == "purchase"].itertuples(index=False):
            n = int(((clicks >= p.t - Q.MTA_WINDOW_US)
                     & (clicks < p.t)).sum())
            got = out.loc[out["event_id"] == p.event_id, "n_touches"]
            assert int(got.iloc[0]) == n
            cr = out.loc[out["event_id"] == p.event_id, "credit_ppm"]
            assert int(cr.iloc[0]) == (1_000_000 // n if n else 0)


def test_event_rle_reconstruction(ray_session):
    """Σ run_len per user == event count; expanding the runs in
    run_idx order reproduces each user's type sequence; adjacent runs
    never share a type."""
    from documentconvert_ray.pipelines import queries as Q

    out = _canon(Q.q_event_rle(SF))
    ev = pd.read_parquet(os.path.join(SF, "events.parquet"))
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
    for u, g in ev.groupby("user_id"):
        runs = out[out["user_id"] == u].sort_values("run_idx")
        assert int(runs["run_len"].sum()) == len(g)
        assert list(runs["run_idx"]) == list(range(1, len(runs) + 1))
        rebuilt = [t for t, n in zip(runs["event_type"], runs["run_len"])
                   for _ in range(int(n))]
        assert rebuilt == list(g["event_type"])
        et = runs["event_type"].to_numpy()
        assert (et[1:] != et[:-1]).all()
