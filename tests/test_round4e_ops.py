"""Unit coverage for the session-5 operators (T133-T138) — local
brute-force recomputations independent of BOTH the engine's
distributed plan and the DuckDB oracles: interval-explode equality
and day-mass conservation for the calendar range join, exact DSIR
score recomputation, SRP pair soundness (subset of the exact sweep,
cosine bound holds), substring-span coverage algebra, and the linear
scorer's closed-form weights."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _lineitem():
    return pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_linenumber", "l_shipdate"]).to_pandas()


def test_in_transit_daily_matches_explode(ray_session):
    """Delta-encoded sweep == brute-force interval explode."""
    from documentconvert_ray.pipelines import queries as Q

    got = Q.q_in_transit_daily(SF)
    got = got.sort_values("day").reset_index(drop=True)
    li = _lineitem()
    day0 = li["l_shipdate"].astype("int64") // Q.US_PER_DAY
    dur = (li["l_orderkey"] + li["l_linenumber"]) % 30 + 1
    counts: dict[int, int] = {}
    for d0, du in zip(day0, dur):
        for d in range(int(d0), int(d0) + int(du) + 1):
            counts[d] = counts.get(d, 0) + 1
    want = pd.DataFrame(sorted(counts.items()), columns=["di", "n"])
    assert len(got) == len(want)
    got_di = got["day"].astype("int64") // Q.US_PER_DAY
    assert (got_di.to_numpy() == want["di"].to_numpy()).all()
    assert (got["n_in_transit"].to_numpy() == want["n"].to_numpy()).all()


def test_in_transit_day_mass_conservation(ray_session):
    """Σ per-day counts == Σ (dur+1) over lineitems — no interval
    loses or gains days through the delta encoding."""
    from documentconvert_ray.pipelines import queries as Q

    got = Q.q_in_transit_daily(SF)
    li = _lineitem()
    dur = (li["l_orderkey"] + li["l_linenumber"]) % 30 + 1
    assert int(got["n_in_transit"].sum()) == int((dur + 1).sum())


def test_dsir_weights_local_recompute(ray_session):
    """Engine DSIR scores == a single-process recomputation with
    Python bigints (one dict per side, no hashing shortcuts beyond
    the shared md5 keying)."""
    from documentconvert_ray.functions.textstats import _md5_u64, tokens
    from documentconvert_ray.pipelines import queries as Q
    from documentconvert_ray.stages.text import DSIR_TARGET_LANG

    docs = pq.read_table(
        f"{SF}/documents.parquet",
        columns=["doc_id", "text", "lang"]).to_pandas()
    ct: dict[int, int] = {}
    cs: dict[int, int] = {}
    per_doc: list[tuple[int, dict[int, int]]] = []
    for did, text, lang in zip(docs["doc_id"], docs["text"], docs["lang"]):
        occ: dict[int, int] = {}
        for w in tokens(text or ""):
            th = _md5_u64(w.encode("utf-8"))
            occ[th] = occ.get(th, 0) + 1
        side = ct if lang == DSIR_TARGET_LANG else cs
        for th, n in occ.items():
            side[th] = side.get(th, 0) + n
        if occ:
            per_doc.append((int(did), occ))
    t_total = sum(ct.values())
    s_total = sum(cs.values())
    want = {
        did: sum(
            n * (((ct.get(th, 0) + 1) * (s_total + 1) * 1_000_000)
                 // ((cs.get(th, 0) + 1) * (t_total + 1)))
            for th, n in occ.items())
        for did, occ in per_doc
    }
    got = Q.q_dsir_weights(SF).to_pandas()
    assert len(got) == len(want)
    for did, sc in zip(got["doc_id"], got["dsir_score"]):
        assert int(sc) == want[int(did)], did


def test_srp_pairs_sound_and_subset_of_exact(ray_session):
    """Every SRP pair clears the cosine threshold (recomputed in
    float64 here) — LSH banding may MISS pairs (probabilistic recall)
    but must never ADMIT a below-threshold one."""
    from documentconvert_ray.pipelines import queries as Q

    emb = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    vecs = {int(i): np.asarray(v, np.float64)
            for i, v in zip(emb["vec_id"], emb["embedding"])}
    got = Q.q_srp_embedding_dups(SF).to_pandas()
    for a, b in zip(got["vec_id_a"], got["vec_id_b"]):
        assert a < b
        va, vb = vecs[int(a)], vecs[int(b)]
        cos = float(va @ vb) / (np.linalg.norm(va) * np.linalg.norm(vb))
        assert cos >= Q.SRP_COS_MIN - 1e-12
    # subset of the exact sweep's pair set at the same threshold
    exact = Q.q_embedding_near_dups(SF)
    if not isinstance(exact, pd.DataFrame):
        exact = exact.to_pandas()
    eset = set(zip(exact["vec_id_a"], exact["vec_id_b"]))
    for pair in zip(got["vec_id_a"], got["vec_id_b"]):
        assert pair in eset


def test_substring_dup_spans_local_recompute(ray_session):
    """Window hashing, ≥2-distinct-doc dup rule, and merged-interval
    coverage recomputed single-process — exact frame equality."""
    from documentconvert_ray.functions.textstats import _md5_u64
    from documentconvert_ray.pipelines import queries as Q

    W, S = Q.SUBSTR_W, Q.SUBSTR_STRIDE
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    owners: dict[int, set[int]] = {}
    wins: dict[int, list[tuple[int, int]]] = {}
    totals: dict[int, tuple[int, int]] = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        t = text or ""
        starts = list(range(0, len(t) - (W - 1), S))
        if not starts:
            continue
        totals[int(did)] = (len(starts), len(t))
        for p in starts:
            h = _md5_u64(t[p:p + W].encode("utf-8"))
            owners.setdefault(h, set()).add(int(did))
            wins.setdefault(int(did), []).append((p, h))
    want = {}
    for did, (nw, ln) in totals.items():
        dup_starts = sorted(p for p, h in wins[did]
                            if len(owners[h]) >= 2)
        cov = 0
        for i, p in enumerate(dup_starts):
            if i + 1 < len(dup_starts):
                cov += min(W, dup_starts[i + 1] - p)
            else:
                cov += W
        want[did] = (nw, len(dup_starts), cov * 1_000_000 // ln)
    got = Q.q_substring_dup_spans(SF).to_pandas()
    assert len(got) == len(want)
    for row in got.itertuples():
        assert (row.n_windows, row.n_dup_windows,
                row.dup_char_ppm) == want[int(row.doc_id)], row.doc_id


def test_quality_lr_closed_form(ray_session):
    """Scores match the closed-form hashed weights; the label column
    is exactly score ≥ 0."""
    from documentconvert_ray.functions.textstats import _md5_u64, tokens
    from documentconvert_ray.pipelines import queries as Q

    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    want = {}
    for did, text in zip(docs["doc_id"], docs["text"]):
        tk = tokens((text or "").lower())
        if tk:
            want[int(did)] = sum(
                (_md5_u64(b"lrw:" + w.encode("utf-8")) % 2001) - 1000
                for w in tk)
    got = Q.q_quality_lr(SF).to_pandas()
    assert len(got) == len(want)
    for row in got.itertuples():
        assert int(row.score_milli) == want[int(row.doc_id)]
        assert bool(row.is_quality) == (row.score_milli >= 0)


def test_q21_waiting_suppliers_local_recompute(ray_session):
    """Single-process recomputation of the Q21 multi-EXISTS verdict
    (≥2 suppliers, exactly one late, that one is the waiter)."""
    from documentconvert_ray.pipelines import queries as Q

    li = _lineitem()
    orders = pq.read_table(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_orderdate"]).to_pandas()
    odate = dict(zip(orders["o_orderkey"].astype("int64"),
                     orders["o_orderdate"].astype("int64")))
    # lineitem has no l_suppkey column read above — reload with it
    li = pq.read_table(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate"]).to_pandas()
    ms: dict[tuple[int, int], int] = {}
    for ok, sk, sd in zip(li["l_orderkey"].astype("int64"),
                          li["l_suppkey"].astype("int64"),
                          li["l_shipdate"].astype("int64")):
        key = (int(ok), int(sk))
        ms[key] = max(ms.get(key, -1), int(sd))
    per_order: dict[int, list[tuple[int, bool]]] = {}
    late_us = Q.Q21_LATE_DAYS * Q.US_PER_DAY
    for (ok, sk), m in ms.items():
        if ok in odate:
            per_order.setdefault(ok, []).append(
                (sk, m > odate[ok] + late_us))
    waiting: dict[int, int] = {}
    for ok, sups in per_order.items():
        if len(sups) >= 2 and sum(l for _, l in sups) == 1:
            sk = next(s for s, l in sups if l)
            waiting[sk] = waiting.get(sk, 0) + 1
    want = sorted(waiting.items(),
                  key=lambda kv: (-kv[1], kv[0]))[:Q.Q21_TOP_K]
    got = Q.q_q21_waiting_suppliers(SF).to_pandas()
    assert list(zip(got["s_suppkey"], got["n_waiting"])) == want


def test_value_quantiles_cont_local_recompute(ray_session):
    """Interpolated quantiles == numpy recomputation of the exact
    integer lo/hi formula over raw micro values."""
    from documentconvert_ray.pipelines import queries as Q

    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["event_type", "value"]).to_pandas()
    got = Q.q_value_quantiles_cont(SF).to_pandas().set_index("event_type")
    for et, g in ev.groupby("event_type"):
        v = np.sort(np.floor(
            g["value"].to_numpy(np.float64) * 1_000_000 + 0.5)
            .astype(np.int64))
        n = len(v)
        for q_micro, col in ((250_000, "p25_pico"), (500_000, "p50_pico"),
                             (900_000, "p90_pico")):
            num = q_micro * (n - 1)
            lo, r = num // 1_000_000, num % 1_000_000
            vhi = int(v[lo + 1]) if lo + 1 < n else int(v[lo])
            want = int(v[lo]) * (1_000_000 - r) + vhi * r
            assert int(got.loc[et, col]) == want, (et, col)
        assert int(got.loc[et, "n_events"]) == n


def test_sliding_distinct_users_local_recompute(ray_session):
    """Sliding 24 h distinct == dict-of-sets recomputation; also the
    peak window is ≥ any single hour's distinct count."""
    from documentconvert_ray.pipelines import queries as Q

    ev = pq.read_table(
        f"{SF}/events.parquet", columns=["user_id", "ts"]).to_pandas()
    hours = ev["ts"].astype("int64") // Q.US_PER_HOUR
    wins: dict[int, set[int]] = {}
    hour_sets: dict[int, set[int]] = {}
    for h, u in zip(hours, ev["user_id"].astype("int64")):
        hour_sets.setdefault(int(h), set()).add(int(u))
        for k in range(Q.SLIDE_WINDOW_HOURS):
            wins.setdefault(int(h) + k, set()).add(int(u))
    got = Q.q_sliding_distinct_users(SF)
    assert len(got) == len(wins)
    got_w = got["w_hour"].astype("int64").to_numpy() \
        // (Q.US_PER_HOUR * (1000 if got["w_hour"].dtype ==
                             np.dtype("datetime64[ns]") else 1))
    for w, n in zip(got_w, got["n_users"]):
        assert int(n) == len(wins[int(w)])
    assert got["n_users"].max() >= max(len(s) for s in hour_sets.values())


def test_write_corpus_resumes_missing_shards(tmp_path):
    """Corpus generation is per-shard idempotent: a killed run's
    missing shards are regenerated byte-identically on re-run,
    existing shards are not rewritten, torn .tmp files are cleaned."""
    import os

    from documentconvert_ray.sources.corpus import write_corpus

    d = str(tmp_path / "c")
    files = write_corpus(d, 300, rows_per_file=100)
    assert len(files) == 3
    victim = files[1]
    ref_bytes = open(victim, "rb").read()
    os.unlink(victim)
    open(victim + ".tmp", "wb").write(b"torn")  # simulated torn write
    keeper = files[0]
    mtime0 = os.stat(keeper).st_mtime_ns
    files2 = write_corpus(d, 300, rows_per_file=100)
    assert files2 == files
    assert open(victim, "rb").read() == ref_bytes
    assert os.stat(keeper).st_mtime_ns == mtime0  # untouched
    assert not os.path.exists(victim + ".tmp")
