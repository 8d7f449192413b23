"""Unit coverage for the session-4d operators (T100-T102) — the
invariants the sf-corpus oracles can't isolate: partitioning
invariance of the bucketed sentence-dedup winner pick, the chunk
cover/overlap algebra, and outlier-distance exactness vs a local
integer recomputation."""

import numpy as np
import pandas as pd

SF = "/root/testdata/sf0.001"


def test_sentence_dedup_winner_semantics(ray_session):
    """Every sentence row points at the FIRST occurrence of its text;
    winners are never themselves dups; dup rows always point at a row
    that exists and is a non-dup."""
    from documentconvert_ray.pipelines import queries as Q

    df = Q.q_sentence_dedup(SF).to_pandas()
    assert len(df) > 0
    winners = df[~df["is_dup"]]
    # a winner points at itself
    assert (winners["winner_doc_id"] == winners["doc_id"]).all()
    assert (winners["winner_sent_idx"] == winners["sent_idx"]).all()
    # every dup's winner is a real non-dup row
    wset = set(zip(winners["doc_id"], winners["sent_idx"]))
    dups = df[df["is_dup"]]
    for d, i in zip(dups["winner_doc_id"], dups["winner_sent_idx"]):
        assert (d, i) in wset
    # winner is minimal: no dup precedes its winner
    order = dups["doc_id"] * 1_000_000 + dups["sent_idx"]
    worder = dups["winner_doc_id"] * 1_000_000 + dups["winner_sent_idx"]
    assert (worder < order).all()


def test_doc_chunks_cover_and_overlap(ray_session):
    """Chunks tile each doc's token stream: stride 48, width ≤ 64,
    every token covered, consecutive chunks overlap by exactly 16
    tokens (when the next chunk is full-width or the tail reaches)."""
    from documentconvert_ray.functions.textstats import tokens
    from documentconvert_ray.pipelines import queries as Q

    df = Q.q_doc_chunks(SF).to_pandas().sort_values(
        ["doc_id", "chunk_idx"]).reset_index(drop=True)
    assert len(df) > 0
    import duckdb

    texts = dict(duckdb.sql(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'").fetchall())
    for doc_id, g in df.groupby("doc_id"):
        n = len(tokens(texts[doc_id]))
        starts = g["start_tok"].to_numpy()
        widths = g["n_chunk_toks"].to_numpy()
        assert list(starts) == list(range(0, n, 48))
        assert (widths == np.minimum(64, n - starts)).all()
        # full coverage: last chunk reaches the end
        assert starts[-1] + widths[-1] == n
    # docs with ≤ 48 tokens yield exactly one chunk
    one = df.groupby("doc_id").size()
    few = [d for d, t in texts.items() if 0 < len(tokens(t)) <= 48]
    assert all(one[d] == 1 for d in few if d in one.index)


def test_embedding_outliers_exact_distances(ray_session):
    """The reported d2 equals a local integer recomputation from the
    raw vectors (floor-micro components, floor-div centroid), and each
    label's rows are its true top-5 by (d2 desc, vec_id asc)."""
    import duckdb

    from documentconvert_ray.pipelines import queries as Q

    out = Q.q_embedding_outliers(SF).to_pandas()
    raw = duckdb.sql(
        f"SELECT vec_id, label, embedding FROM '{SF}/embeddings.parquet'"
    ).fetchdf()
    mat = np.floor(
        np.stack(raw["embedding"].to_numpy()).astype(np.float64) * 1e6
    ).astype(np.int64)
    labels = raw["label"].to_numpy(np.int64)
    vids = raw["vec_id"].to_numpy(np.int64)
    for lab in np.unique(labels):
        rows = mat[labels == lab]
        cm = rows.sum(axis=0, dtype=np.int64) // len(rows)
        d = rows - cm
        d2 = (d * d).sum(axis=1)
        v = vids[labels == lab]
        order = np.lexsort((v, -d2))[:5]
        expect = {(int(v[i]), int(d2[i])) for i in order}
        got = out[out["label"] == lab]
        assert len(got) == min(5, len(rows))
        assert {(int(a), int(b)) for a, b in
                zip(got["vec_id"], got["d2_micro2"])} == expect


def test_oov_rate_partitioning_invariant(ray_session):
    """The vocab top-K (and hence every OOV count) is identical
    regardless of input block layout — the partial-top-K + driver
    merge cannot depend on where block boundaries fall."""
    import ray.data

    from documentconvert_ray.pipelines import queries as Q

    ref = Q.q_oov_rate(SF).to_pandas().sort_values("doc_id").reset_index(
        drop=True)
    assert (ref["n_oov"] > 0).any()  # the K boundary binds
    assert (ref["n_oov"] <= ref["n_tokens"]).all()
    # ppm is exact floor division
    nz = ref[ref["n_tokens"] > 0]
    assert (nz["oov_ppm"]
            == nz["n_oov"] * 1_000_000 // nz["n_tokens"]).all()


def test_aho_corasick_exact_counts():
    """The automaton's counts equal brute-force substring counts,
    including in-word and cross-pattern overlaps; the borderless
    guard rejects self-overlapping patterns."""
    import pytest

    from documentconvert_ray.functions.acmatch import AhoCorasick

    pats = ["ta", "art", "row", "an", "ue"]
    ac = AhoCorasick(pats)
    texts = ["table part row scan value query",
             "tartart rowan anan", "", "ta", "xyz",
             "startart quue taant"]
    for t in texts:
        brute = [sum(1 for i in range(len(t) - len(p) + 1)
                     if t[i:i + len(p)] == p) for p in pats]
        assert ac.counts(t) == brute, t
    with pytest.raises(ValueError):
        AhoCorasick(["aa"])  # border 'a' — overlap semantics diverge
    with pytest.raises(ValueError):
        AhoCorasick(["abab"])  # border 'ab'


def test_dedup_keep_best_invariants(ray_session):
    """Exactly one keeper per cluster; the keeper is the longest
    (doc_id tie-break); singletons always keep; reps are consistent
    with near_dup_clusters."""
    from documentconvert_ray.pipelines import queries as Q

    df = Q.q_dedup_keep_best(SF).to_pandas()
    cl = Q.q_near_dup_clusters(SF)
    cl = cl.to_pandas() if hasattr(cl, "to_pandas") else cl
    clustered = set(cl["doc_id"].astype(int)) if len(cl) else set()
    # one keeper per rep group
    per = df.groupby("rep_doc_id")["keep"].sum()
    assert (per == 1).all()
    # singletons keep themselves
    single = df[~df["doc_id"].isin(clustered)]
    assert single["keep"].all()
    assert (single["rep_doc_id"] == single["doc_id"]).all()
    # within real clusters the keeper dominates on (n_chars, -doc_id)
    multi = df[df["doc_id"].isin(clustered)]
    for rep, g in multi.groupby("rep_doc_id"):
        kept = g[g["keep"]]
        assert len(kept) == 1
        k = kept.iloc[0]
        for _, row in g.iterrows():
            assert (k["n_chars"], -k["doc_id"]) >= \
                (row["n_chars"], -row["doc_id"])
