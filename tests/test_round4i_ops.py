"""Unit coverage for the session-10 operators (T185-T192): crafted
documents exercising the Gopher rule branches the sf corpus never
hits (bullet lines, ellipsis lines, '#'/'...' symbols, empty and
non-alpha docs), padding-waste batch-boundary cases, a brute-force
Gini recompute, URL suffix-blocklist semantics, numpy recomputes of
both contamination flags (embedding-cosine and cross-slice fuzzy
Jaccard), NFC normalization on decomposed/precomposed/compatibility
codepoints, and a mixed-language code-switch document."""

import hashlib
import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

SF = "/root/testdata/sf0.001"


def _canon(df):
    from check_oracles import canon, to_pandas

    return canon(to_pandas(df))


def _docs_table(texts, tmp_path):
    df = pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts,
        "lang": "en",
        "source": "s",
        "n_chars": [len(t) for t in texts],
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_gopher_rules_crafted_branches(ray_session, tmp_path):
    """Bullet/ellipsis/symbol/empty/non-alpha docs — every rule fires
    at least once; engine == oracle SQL on the same crafted table."""
    from documentconvert_ray.pipelines import queries as Q

    body = " ".join(["word"] * 60)
    texts = [
        body,                                        # clean pass
        "",                                          # empty: all-zero row
        "- a\n- b\n- c\nplain " + body,              # bullet lines
        ("tail...\nalso...\nx\n" + body),            # ellipsis lines
        ("## head ### " + body + " #"),              # '#' symbols
        ("dots... in... text... " + body),           # '...' symbols
        " ".join(["123"] * 60),                      # non-alpha words
        " ".join(["w"] * 10),                        # too few words
        " ".join(["extraordinarily"] * 60),          # mean wlen > 10
    ]
    d = _docs_table(texts, tmp_path)
    got = _canon(Q.q_gopher_rules(d))

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')")
    want = _canon(con.sql(Q.ORACLES["gopher_rules"]).df())
    pd.testing.assert_frame_equal(got, want)

    by_id = got.set_index("doc_id")
    assert bool(by_id.loc[0, "passes"])
    assert not bool(by_id.loc[1, "passes"]) and \
        by_id.loc[1, "n_words"] == 0
    assert by_id.loc[2, "bullet_ppm"] > 0
    assert by_id.loc[3, "ellipsis_ppm"] > 0
    assert by_id.loc[4, "sym_ppm"] > 0 and by_id.loc[5, "sym_ppm"] > 0
    assert by_id.loc[6, "alpha_ppm"] == 0
    assert not bool(by_id.loc[7, "passes"])  # word-count floor
    assert not bool(by_id.loc[8, "passes"])  # mean-word-length cap


def test_padding_waste_batch_boundaries(ray_session, tmp_path):
    """61 docs at PAD_BATCH=32 → one full batch + one 29-doc tail;
    includes all-empty docs (max_tok 0 → pad_ppm 0 guard)."""
    from documentconvert_ray.pipelines import queries as Q

    texts = [""] * 35 + ["w " * (i + 1) for i in range(26)]
    d = _docs_table(texts, tmp_path)
    got = _canon(Q.q_padding_waste(d))

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')")
    want = _canon(con.sql(Q.ORACLES["padding_waste"]).df())
    pd.testing.assert_frame_equal(got, want)

    by_id = got.set_index("batch_id").sort_index()
    assert by_id.loc[0, "max_tok"] == 0 and by_id.loc[0, "pad_ppm"] == 0
    assert by_id.loc[1, "n_docs"] == 29  # short tail batch


def test_domain_gini_bruteforce(ray_session):
    """Exact-int Gini from a pandas recompute over the corpus parquet
    (per-domain counts → sorted rank-sum formula) == the histogram-
    fold engine path."""
    from documentconvert_ray.pipelines import queries as Q

    got = _canon(Q.q_domain_gini(SF)).iloc[0]

    glob = os.path.join(Q._corpus_dir(), "*.parquet")
    d = duckdb.sql(
        f"SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS dom, "
        f"count(*)::BIGINT AS c FROM read_parquet('{glob}') "
        f"GROUP BY 1").df()
    c = np.sort(d["c"].to_numpy(np.int64))
    n, tot = len(c), int(c.sum())
    src = int((np.arange(1, n + 1, dtype=np.int64) * c).sum())
    want = (2 * src - (n + 1) * tot) * 1_000_000 // (n * tot)
    assert got["n_domains"] == n
    assert got["n_docs"] == tot
    assert got["gini_ppm"] == want


def test_url_host_rules_suffix_semantics(ray_session):
    """Brute-force recompute of the suffix blocklist over the corpus
    urls: blocked iff ANY dot-suffix of the host hashes into band 0
    (subdomain blocking), path flag only for unblocked hosts."""
    from documentconvert_ray.pipelines import queries as Q

    got = _canon(Q.q_url_host_rules(SF))

    def u64(b):
        return int.from_bytes(hashlib.md5(b).digest()[:8], "little")

    glob = os.path.join(Q._corpus_dir(), "*.parquet")
    df = duckdb.sql(
        f"SELECT url, regexp_extract(url, 'https://([^/]+)/', 1) AS "
        f"dom, octet_length(html)::BIGINT AS nb "
        f"FROM read_parquet('{glob}')").df()

    def reason(u, dom):
        parts = dom.split(".")
        if any(u64(b"blk:" + ".".join(parts[i:]).encode())
               % Q.BLK_MOD == 0 for i in range(len(parts))):
            return "blocked_domain"
        return "flagged_path" if "/junk/" in u else "kept"

    df["reason"] = [reason(u, d) for u, d in zip(df["url"], df["dom"])]
    want = _canon(df.groupby("reason", as_index=False).agg(
        n_urls=("nb", "size"), sum_bytes=("nb", "sum")))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert set(got.columns) == {"reason", "n_urls", "sum_bytes"}
    assert (got["n_urls"] > 0).all() and len(got) == 3


def test_nfc_audit_crafted_unicode(ray_session, tmp_path):
    """Decomposed vs precomposed accents: NFC composes 'e'+U+0301 →
    'é' (changed, shorter), leaves precomposed text alone, and does
    NOT touch compatibility chars (ﬁ ligature survives NFC). Engine
    (unicodedata) == oracle (DuckDB utf8proc) on the same table."""
    import duckdb as _dd

    from documentconvert_ray.pipelines import queries as Q

    texts = [
        "cafe\u0301 cre\u0300me",  # decomposed: changes, 2 shorter
        "caf\u00e9 plain",          # precomposed: unchanged
        "\ufb01le ligature",        # NFC keeps U+FB01 (compat-only)
        "",                          # empty
    ]
    d = _docs_table(texts, tmp_path)
    got = _canon(Q.q_nfc_audit(d))

    con = _dd.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')")
    want = _canon(con.sql(Q.ORACLES["nfc_audit"]).df())
    pd.testing.assert_frame_equal(got, want)
    row = got.iloc[0]
    assert row["n_changed"] == 1
    assert row["sum_nfc_chars"] == row["sum_chars"] - 2


def test_fuzzy_contamination_cross_slice_only(ray_session):
    """Every flagged doc is a TRAIN doc (id % MOD != 0), and the
    result equals the cross-slice projection of the exact prefix-join
    pair set."""
    from documentconvert_ray.pipelines import queries as Q

    got = _canon(Q.q_fuzzy_contamination(SF))
    assert (got["doc_id"] % Q.FUZZY_EVAL_MOD != 0).all()

    pairs = _canon(Q.q_prefix_jaccard_dups(SF))
    a = pairs["doc_id_a"].to_numpy(np.int64)
    b = pairs["doc_id_b"].to_numpy(np.int64)
    j = pairs["jaccard_micro"].to_numpy(np.int64)
    cross = (a % Q.FUZZY_EVAL_MOD == 0) != (b % Q.FUZZY_EVAL_MOD == 0)
    train = np.where(a % Q.FUZZY_EVAL_MOD == 0, b, a)[cross]
    want = _canon(pd.DataFrame({"doc_id": train,
                                "jaccard_micro": j[cross]})
                  .groupby("doc_id", as_index=False)
                  .agg(n_eval_matches=("jaccard_micro", "size"),
                       max_jaccard_micro=("jaccard_micro", "max")))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert len(got) > 0


def test_sentence_lang_mismatch_code_switch(ray_session, tmp_path):
    """A doc with English and German sentences labeled 'en' →
    mismatch fires exactly on the German sentences; engine == oracle
    on the crafted table."""
    import duckdb as _dd

    from documentconvert_ray.pipelines import queries as Q

    en = "the cat and the dog sat on the mat with it. "
    de = "der hund und die katze ist nicht mit der maus zu haus. "
    texts = [
        en * 2 + de + en,      # 1 German sentence of 4
        de * 3,                # all German, labeled en
        en * 2,                # clean
        "",                    # no sentences
    ]
    d = _docs_table(texts, tmp_path)
    got = _canon(Q.q_sentence_lang_mismatch(d))

    con = _dd.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')")
    want = _canon(con.sql(Q.ORACLES["sentence_lang_mismatch"]).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    by_id = got.set_index("doc_id")
    assert by_id.loc[0, "n_mismatch"] == 1
    assert by_id.loc[1, "n_mismatch"] == by_id.loc[1, "n_pred"] > 0
    assert by_id.loc[2, "n_mismatch"] == 0
    assert by_id.loc[3, "n_sents"] == 0 and \
        by_id.loc[3, "mismatch_ppm"] == 0


def test_session_duration_stats_hand_case(ray_session, tmp_path):
    """User 1: events at 0/10/41 min (31-min gap splits → sessions of
    10 min and 0); user 2: one event (0). Exactly-30-min gaps do NOT
    split (rule is strictly greater). quantile_disc: n=3 → p50 = 2nd
    smallest, p90 = 3rd."""
    from documentconvert_ray.pipelines import queries as Q

    mins = [0, 10, 41]
    df = pd.DataFrame({
        "event_id": np.arange(4, dtype=np.int64),
        "user_id": np.int64(1),
        "ts": pd.to_datetime(
            [f"2024-01-01 00:{m:02d}:00" for m in mins]
            + ["2024-01-01 05:00:00"]),
        "event_type": "click",
        "value": 1.0,
        "props": "{}",
    })
    df.loc[3, "user_id"] = np.int64(2)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = _canon(Q.q_session_duration_stats(str(tmp_path))).iloc[0]
    assert got["n_sessions"] == 3
    assert got["p50_us"] == 0                    # durs: 0, 0, 600s
    assert got["p90_us"] == 600 * 1_000_000
    assert got["mean_us"] == 600 * 1_000_000 // 3
    assert got["max_us"] == 600 * 1_000_000

    # 30-min boundary: gap == 30 min keeps one session
    df2 = df.iloc[:2].copy()
    df2.loc[1, "ts"] = pd.Timestamp("2024-01-01 00:30:00")
    pq.write_table(pa.Table.from_pandas(df2, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got2 = _canon(Q.q_session_duration_stats(str(tmp_path))).iloc[0]
    assert got2["n_sessions"] == 1
    assert got2["max_us"] == 30 * 60 * 1_000_000


def test_intra_domain_link_ratio_bruteforce(ray_session):
    """Self-link counts recomputed independently over the corpus
    parquet (same byte-transparent scan contract) == the engine's
    bucketed reduce; the corpus carries real self-links."""
    from documentconvert_ray.pipelines import queries as Q

    got = _canon(Q.q_intra_domain_link_ratio(SF))

    glob = os.path.join(Q._corpus_dir(), "*.parquet")
    want = _canon(duckdb.sql(f"""
        WITH src AS (
          SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS s,
                 CAST(html AS VARCHAR) AS body
          FROM read_parquet('{glob}')
          WHERE substr(hex(html), 1, 4) <> '1F8B'),
        e AS (SELECT s, unnest(regexp_extract_all(body,
                  'href=\\\\x22https://(site-[0-9]+\\.example)/', 1))
                  AS d FROM src)
        SELECT s AS src_domain,
               CAST(count(*) AS BIGINT) AS n_links,
               CAST(count(*) FILTER (WHERE s = d) AS BIGINT)
                   AS self_links,
               CAST(count(*) FILTER (WHERE s = d) * 1000000
                    // count(*) AS BIGINT) AS self_ppm
        FROM e GROUP BY s
    """).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["self_links"].sum() > 0


def test_hourly_anomaly_burst_and_uniform(ray_session, tmp_path):
    """A 500-event burst in one hour over a flat 1/hour background
    flags exactly that bucket; a perfectly uniform profile flags
    nothing. Engine == oracle on the same crafted table."""
    import duckdb as _dd

    from documentconvert_ray.pipelines import queries as Q

    # one event per hour-of-week bucket (uniform base)...
    base = pd.date_range("2024-01-07", periods=168, freq="h")  # Sun 00
    ts = list(base)
    # ...plus a burst: 500 extra events Monday 09:00
    ts += [pd.Timestamp("2024-01-08 09:00:00")] * 500
    df = pd.DataFrame({
        "event_id": np.arange(len(ts), dtype=np.int64),
        "user_id": np.int64(1), "ts": ts, "event_type": "click",
        "value": 1.0, "props": "{}"})
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got = _canon(Q.q_hourly_anomaly(str(tmp_path)))

    con = _dd.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{tmp_path}/events.parquet')")
    want = _canon(con.sql(Q.ORACLES["hourly_anomaly"]).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    flagged = got[got["anomalous"]]
    assert len(flagged) == 1
    assert (int(flagged.iloc[0]["dow"]), int(flagged.iloc[0]["hour"])) \
        == (1, 9)  # Monday 09:00, SQL dow semantics (Sunday=0)

    # uniform profile: nothing flags
    df2 = df.iloc[:168]
    pq.write_table(pa.Table.from_pandas(df2, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    got2 = _canon(Q.q_hourly_anomaly(str(tmp_path)))
    assert not got2["anomalous"].any()
    assert (got2["n_events"] == 1).all()


def test_embedding_contamination_bruteforce(ray_session):
    """Numpy recompute: eval slice by vec_id mod, max cosine per train
    vector, per-label counts."""
    from documentconvert_ray.pipelines import queries as Q

    got = _canon(Q.q_embedding_contamination(SF))

    t = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    mat = np.stack([np.asarray(v, np.float64) for v in t["embedding"]])
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    ev = t["vec_id"].to_numpy() % Q.EVAL_SLICE_MOD == 0
    mx = (mat[~ev] @ mat[ev].T).max(axis=1)
    df = pd.DataFrame({
        "label": t["label"].to_numpy(np.int64)[~ev],
        "cont": (mx >= Q.CONTAM_COS_MIN).astype(np.int64)})
    want = _canon(df.groupby("label", as_index=False).agg(
        n_train=("cont", "size"), n_contaminated=("cont", "sum")))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["n_contaminated"].sum() > 0  # the flag actually fires
