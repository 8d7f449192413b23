"""Unit coverage for the session-12 operators (T201-T212): exact
brute-force pandas recomputes for feature hashing, the time-RANGE
window, and the Heaps trigram-vocabulary curve, plus a dense-numpy
recompute of HITS (the iterative float fixpoint has no SQL oracle —
same contract as PageRank/k-means)."""

import os
import sys

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
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


def test_feature_hash_matches_bruteforce(registry, ray_session):
    from documentconvert_ray.functions.textstats import _md5_u64, tokens
    from documentconvert_ray.pipelines.queries import FEATURE_HASH_D

    got = _canon(registry["feature_hash_vectors"](SF))

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    acc: dict = {}
    for doc_id, text in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
        for tok in tokens(text):
            h = _md5_u64(b"fh:" + tok.lower().encode())
            k = (doc_id, h % FEATURE_HASH_D)
            acc[k] = acc.get(k, 0) + (1 if (h >> 6) & 1 else -1)
    want = _canon(pd.DataFrame(
        [{"doc_id": d, "dim": dim, "weight": w}
         for (d, dim), w in acc.items() if w != 0]))
    assert len(got) > 0
    assert got.equals(want)


def test_events_time_window_matches_bruteforce(registry, ray_session):
    got = _canon(registry["events_time_window"](SF))

    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["event_id", "user_id", "ts", "value"])
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    df["vm"] = np.floor(df["value"].to_numpy(np.float64) * 1e6
                        + 0.5).astype(np.int64)
    rows = []
    for _, g in df.groupby("user_id"):
        ts = g["ts"].to_numpy("datetime64[us]").view(np.int64)
        vm = g["vm"].to_numpy(np.int64)
        for i in range(len(g)):
            # RANGE frame: every peer within [ts_i - 1h, ts_i],
            # INCLUDING later rows that tie on ts_i
            m = (ts >= ts[i] - 3_600_000_000) & (ts <= ts[i])
            rows.append({"event_id": int(g["event_id"].iloc[i]),
                         "user_id": int(g["user_id"].iloc[i]),
                         "win_sum_micro": int(vm[m].sum()),
                         "win_n": int(m.sum())})
    want = _canon(pd.DataFrame(rows))
    assert len(got) == len(want) > 0
    assert got.equals(want)


def test_vocab_growth_matches_bruteforce(registry, ray_session):
    from documentconvert_ray.functions.textstats import _md5_u64, tokens

    got = _canon(registry["vocab_growth"](SF))

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    n = max(t.column("doc_id").to_pylist()) + 1
    first: dict = {}
    for doc_id, text in zip(t.column("doc_id").to_pylist(),
                            t.column("text").to_pylist()):
        toks = [x.lower() for x in tokens(text)]
        for i in range(len(toks) - 2):
            h = _md5_u64(b"vg:" + " ".join(toks[i:i + 3]).encode())
            if h not in first or doc_id < first[h]:
                first[h] = doc_id
    cnt: dict = {}
    for d in first.values():
        cnt[d * 10 // n] = cnt.get(d * 10 // n, 0) + 1
    decs = sorted(cnt)
    cum = np.cumsum([cnt[d] for d in decs])
    want = _canon(pd.DataFrame({
        "decile": decs,
        "new_terms": [cnt[d] for d in decs],
        "cum_vocab": cum.astype(np.int64)}))
    assert len(got) > 0
    assert got.equals(want)
    # invariants: the curve is a growth curve
    g = got.sort_values("decile")
    assert (g["new_terms"] > 0).all()
    assert g["cum_vocab"].is_monotonic_increasing
    assert int(g["cum_vocab"].iloc[-1]) == len(first)


def test_hits_matches_dense_numpy(registry, ray_session):
    from documentconvert_ray.pipelines.queries import HITS_ITERS

    got = registry["hits_domains"](SF).sort_values("domain") \
        .reset_index(drop=True)
    edges = _canon(registry["link_domains"](SF))

    nodes = sorted(set(edges["src_domain"]) | set(edges["dst_domain"]))
    idx = {d: i for i, d in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    for s, d, w in zip(edges["src_domain"], edges["dst_domain"],
                       edges["n_links"]):
        A[idx[s], idx[d]] = w
    h = np.full(n, 1.0 / np.sqrt(n))
    for _ in range(HITS_ITERS):
        a = A.T @ h
        a /= np.linalg.norm(a) or 1.0
        h = A @ a
        h /= np.linalg.norm(h) or 1.0
    want_hub = np.floor(h / h.sum() * 1e9 + 0.5).astype(np.int64)
    want_auth = np.floor(a / a.sum() * 1e9 + 0.5).astype(np.int64)

    assert list(got["domain"]) == nodes
    assert np.abs(got["hub_ppb"].to_numpy() - want_hub).max() <= 2
    assert np.abs(got["auth_ppb"].to_numpy() - want_auth).max() <= 2
    # invariants: nonnegative, each axis sums to ~1e9
    for c in ("hub_ppb", "auth_ppb"):
        assert (got[c] >= 0).all()
        assert abs(int(got[c].sum()) - 1_000_000_000) <= n


def test_domain_kcore_matches_brute_peeling(registry, ray_session):
    """The h-index fixpoint must EQUAL classic Matula-Beck peeling
    (remove a min-degree node, coreness = running max of its degree
    at removal) on the same undirected edge set."""
    got = registry["domain_kcore"](SF).sort_values("domain") \
        .reset_index(drop=True)
    edges = _canon(registry["link_domains"](SF))

    adj: dict = {}
    for s, d in zip(edges["src_domain"], edges["dst_domain"]):
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    core: dict = {}
    remaining = set(adj)
    k = 0
    while remaining:
        v = min(remaining,
                key=lambda x: (len(adj[x] & remaining), x))
        k = max(k, len(adj[v] & remaining))
        core[v] = k
        remaining.discard(v)

    want = pd.DataFrame(sorted(core.items()),
                        columns=["domain", "coreness"])
    assert len(got) == len(want) > 0
    assert list(got["domain"]) == list(want["domain"])
    assert got["coreness"].to_numpy().tolist() == \
        want["coreness"].to_numpy().tolist()
    # invariant: coreness never exceeds degree
    deg = {d: len(a) for d, a in adj.items()}
    assert all(c <= deg[d] for d, c in zip(got["domain"],
                                           got["coreness"]))


def test_degree_assortativity_matches_bruteforce(registry, ray_session):
    """Exact-integer moment sums recomputed in pandas from the edge
    list; r_ppm floor-division semantics pinned."""
    got = registry["degree_assortativity"](SF).iloc[0]
    edges = _canon(registry["link_domains"](SF))

    pairs = set()
    for s, d in zip(edges["src_domain"], edges["dst_domain"]):
        if s != d:
            pairs.add((min(s, d), max(s, d)))
    deg: dict = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    m = len(pairs)
    s_jk = sum(deg[a] * deg[b] for a, b in pairs)
    s_sum = sum(deg[a] + deg[b] for a, b in pairs)
    s_sq = sum(deg[a] ** 2 + deg[b] ** 2 for a, b in pairs)
    num = 4 * m * s_jk - s_sum * s_sum
    den = 2 * m * s_sq - s_sum * s_sum
    assert int(got["m"]) == m
    assert int(got["s_jk"]) == s_jk
    assert int(got["s_sum"]) == s_sum
    assert int(got["s_sq"]) == s_sq
    assert int(got["r_ppm"]) == ((num * 1_000_000) // den if den else 0)
    assert -1_000_000 <= int(got["r_ppm"]) <= 1_000_000


def test_value_interp_crafted_edges(ray_session, tmp_path):
    """Crafted per-user timelines: sentinels outside the first/last
    purchase, purchase rows return their own value, NEGATIVE-slope
    gaps pin floor (not truncation) division, and a same-ts purchase
    pair brackets an event via (ts, event_id) order."""
    import pyarrow as pa

    from documentconvert_ray.pipelines import queries as Q

    rows = [
        # user 1: view, purchase(10), view, view, purchase(1), view
        (1, 1, "2024-01-01 00:00", "view", 0.0),
        (2, 1, "2024-01-01 01:00", "purchase", 10.0),
        (3, 1, "2024-01-01 02:00", "view", 0.0),
        (4, 1, "2024-01-01 03:00", "view", 0.0),
        (5, 1, "2024-01-01 04:00", "purchase", 1.0),
        (6, 1, "2024-01-01 05:00", "view", 0.0),
        # user 2: no purchases at all
        (7, 2, "2024-01-01 00:00", "view", 5.0),
        # user 3: event between two same-ts purchases (event_id order)
        (8, 3, "2024-01-01 00:00", "purchase", 2.0),
        (9, 3, "2024-01-01 00:00", "view", 0.0),
        (10, 3, "2024-01-01 00:00", "purchase", 4.0),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "ts",
                                     "event_type", "value"])
    df["ts"] = pd.to_datetime(df["ts"])
    df["props"] = "{}"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))

    got = _canon(Q.q_value_interp(str(tmp_path))).set_index("event_id")
    # before first purchase / no purchase: -1
    assert got.loc[1, "interp_micro"] == -1
    assert got.loc[7, "interp_micro"] == -1
    # after last purchase: -1
    assert got.loc[6, "interp_micro"] == -1
    # purchase rows: own value
    assert got.loc[2, "interp_micro"] == 10_000_000
    assert got.loc[5, "interp_micro"] == 1_000_000
    # negative slope 10 -> 1 over rn span 3: floor semantics
    assert got.loc[3, "interp_micro"] == \
        10_000_000 + (-9_000_000 * 1) // 3
    assert got.loc[4, "interp_micro"] == \
        10_000_000 + (-9_000_000 * 2) // 3
    # same-ts bracket via event_id order: midpoint of 2 and 4
    assert got.loc[9, "interp_micro"] == 3_000_000

    import duckdb
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')")
    want = _canon(con.sql(Q.ORACLES["value_interp"]).df())
    pd.testing.assert_frame_equal(
        _canon(Q.q_value_interp(str(tmp_path))), want)


def test_harmonic_centrality_matches_brute_bfs(registry, ray_session):
    """Plain-python all-source BFS over the same undirected edge set,
    capped at HARMONIC_MAX, floor-ppm sums."""
    from documentconvert_ray.pipelines.queries import HARMONIC_MAX

    got = _canon(registry["harmonic_centrality"](SF))
    edges = _canon(registry["link_domains"](SF))

    adj: dict = {}
    for s, d in zip(edges["src_domain"], edges["dst_domain"]):
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    rows = []
    for src in sorted(adj):
        seen, frontier, n_r, h = {src}, {src}, 0, 0
        for d in range(1, HARMONIC_MAX + 1):
            nxt = set().union(*(adj[u] for u in frontier)) - seen
            if not nxt:
                break
            seen |= nxt
            n_r += len(nxt)
            h += (1_000_000 // d) * len(nxt)
            frontier = nxt
        rows.append({"domain": src, "n_reached": n_r,
                     "harmonic_ppm": h})
    want = _canon(pd.DataFrame(rows))
    assert len(got) == len(want) > 0
    assert got.equals(want)


def test_event_path_trigrams_matches_bruteforce(registry, ray_session):
    """Plain pandas recompute: per-user (ts, event_id) order, all
    consecutive triples, global top-20 with the deterministic
    tie-break."""
    got = _canon(registry["event_path_trigrams"](SF))

    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["event_id", "user_id", "ts",
                               "event_type"])
    df = t.to_pandas().sort_values(["user_id", "ts", "event_id"])
    cnt: dict = {}
    for _, g in df.groupby("user_id"):
        et = list(g["event_type"])
        for i in range(len(et) - 2):
            k = (et[i], et[i + 1], et[i + 2])
            cnt[k] = cnt.get(k, 0) + 1
    rows = sorted(cnt.items(), key=lambda kv: (-kv[1],) + kv[0])[:20]
    want = _canon(pd.DataFrame(
        [{"e1": a, "e2": b, "e3": c, "n": n}
         for (a, b, c), n in rows]))
    assert len(got) == len(want) > 0
    assert got.equals(want)


def test_weighted_median_matches_bruteforce(registry, ray_session):
    """Per-flag lower weighted median recomputed by sorting cents and
    scanning cumulative quantity."""
    got = _canon(registry["weighted_median_price"](SF))

    t = pq.read_table(f"{SF}/lineitem.parquet",
                      columns=["l_returnflag", "l_extendedprice",
                               "l_quantity"]).to_pandas()
    t["cents"] = np.floor(t["l_extendedprice"].to_numpy(np.float64)
                          * 100 + 0.5).astype(np.int64)
    t["qty"] = np.floor(t["l_quantity"].to_numpy(np.float64) + 0.5).astype(np.int64)
    rows = []
    for flag, g in t.groupby("l_returnflag"):
        m = g.groupby("cents", as_index=False)["qty"].sum() \
            .sort_values("cents")
        cum = m["qty"].cumsum().to_numpy(np.int64)
        tot = int(cum[-1])
        i = int(np.searchsorted(2 * cum, tot, side="left"))
        rows.append({"flag": flag,
                     "wmedian_cents": int(m["cents"].iloc[i]),
                     "total_qty": tot})
    want = _canon(pd.DataFrame(rows))
    assert got.equals(want)
    # invariant: at least half the quantity sits at or below the
    # weighted median in every flag group
    for flag, g in t.groupby("l_returnflag"):
        wm = int(got.set_index("flag").loc[flag, "wmedian_cents"])
        assert 2 * int(g.loc[g["cents"] <= wm, "qty"].sum()) >= \
            int(g["qty"].sum())
