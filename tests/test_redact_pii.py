"""Opt-in PII redaction of the extraction output (cfg.redact_pii):
the scrub really rewrites text_md + derived columns, leaves the
default path byte-identical, and keeps redacted / unredacted runs on
separate resume manifests (semantic fingerprint)."""

import hashlib
import os

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from documentconvert_ray.config import DEFAULT_CONFIG, ExtractConfig
from documentconvert_ray.pipelines.extract import run_extract_job


def _write_pii_corpus(d: str) -> str:
    os.makedirs(d, exist_ok=True)
    body = (b"<html><body><p>Write to team-lead@example.org or call "
            b"555-867-5309; origin host 192.168.10.42 serves this "
            b"page. A second paragraph with enough plain text that "
            b"the density heuristics keep the block as main content "
            b"rather than boilerplate.</p></body></html>")
    clean = (b"<html><body><p>No contact details here, only a "
             b"paragraph of ordinary prose long enough to be kept "
             b"as main content by the density heuristics.</p>"
             b"</body></html>")
    t = pa.table({
        "url": ["https://site-0.example/html/pii", (
            "https://site-0.example/html/clean")],
        "warc_ts": pa.array([0, 0], pa.timestamp("us")),
        "html": pa.array([body, clean], pa.binary()),
        "lang": ["en", "en"],
    })
    path = os.path.join(d, "corpus-000.parquet")
    pq.write_table(t, path)
    return path


def _rows(out_dir: str) -> dict:
    tbl = pads.dataset(
        [os.path.join(r, f) for r, _, fs in os.walk(out_dir)
         for f in fs if f.endswith(".parquet")]).to_table()
    return {u: i for i, u in enumerate(tbl.column("url").to_pylist())}, tbl


def test_redact_pii_job(ray_session, tmp_path):
    corpus = str(tmp_path / "in")
    _write_pii_corpus(corpus)
    cfg = ExtractConfig(redact_pii=True)
    assert cfg.fingerprint() != DEFAULT_CONFIG.fingerprint()

    out_red = str(tmp_path / "out_red")
    m1 = run_extract_job(corpus, out_red, cfg)
    assert m1["ok"] == 2 and m1["errors"] == 0
    idx, tbl = _rows(out_red)
    md = tbl.column("text_md").to_pylist()
    sha = tbl.column("text_sha256").to_pylist()
    nmb = tbl.column("n_md_bytes").to_pylist()
    pii = idx["https://site-0.example/html/pii"]
    clean = idx["https://site-0.example/html/clean"]
    assert "<EMAIL>" in md[pii] and "<PHONE>" in md[pii] \
        and "<IP>" in md[pii]
    assert "team-lead@example.org" not in md[pii]
    assert "555-867-5309" not in md[pii]
    assert "192.168.10.42" not in md[pii]
    for i in (pii, clean):  # derived columns recomputed
        assert sha[i] == hashlib.sha256(
            md[i].encode("utf-8")).hexdigest()
        assert nmb[i] == len(md[i].encode("utf-8"))

    # default path: byte-identical to an unredacted run, and the two
    # configs never cross-resume (distinct manifest fingerprints)
    out_plain = str(tmp_path / "out_plain")
    m2 = run_extract_job(corpus, out_plain, DEFAULT_CONFIG)
    assert m2["resumed_shards"] == 0
    _, tp = _rows(out_plain)
    plain_md = tp.column("text_md").to_pylist()
    assert "team-lead@example.org" in plain_md[
        tp.column("url").to_pylist().index(
            "https://site-0.example/html/pii")]

    # re-run redacted over its own output dir → full resume
    m3 = run_extract_job(corpus, out_red, cfg)
    assert m3["resumed_shards"] == 1 and m3["processed_shards"] == 0
    # but the plain config against the redacted dir must NOT resume
    m4 = run_extract_job(corpus, out_red, DEFAULT_CONFIG)
    assert m4["resumed_shards"] == 0
