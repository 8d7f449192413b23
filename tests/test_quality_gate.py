"""Opt-in extraction-time quality gate (cfg.min_quality_tokens): short
documents are reclassified as low_quality error rows (payload
dropped, counts preserved), the default path is byte-identical, and
gated / ungated runs keep separate resume manifests."""

import os

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from documentconvert_ray.config import DEFAULT_CONFIG, ExtractConfig
from documentconvert_ray.pipelines.extract import run_extract_job


def _write_corpus(d: str) -> None:
    os.makedirs(d, exist_ok=True)
    long_body = (b"<html><body><p>" + b"plenty of ordinary prose "
                 * 20 + b"kept as main content by the density "
                 b"heuristics.</p></body></html>")
    short_body = (b"<html><body><p>tiny page body here kept by "
                  b"density heuristics nonetheless.</p></body></html>")
    t = pa.table({
        "url": ["https://site-0.example/html/long",
                "https://site-0.example/html/short"],
        "warc_ts": pa.array([0, 0], pa.timestamp("us")),
        "html": pa.array([long_body, short_body], pa.binary()),
        "lang": ["en", "en"],
    })
    pq.write_table(t, os.path.join(d, "corpus-000.parquet"))


def _table(out_dir: str) -> pa.Table:
    return pads.dataset(
        [os.path.join(r, f) for r, _, fs in os.walk(out_dir)
         for f in fs if f.endswith(".parquet")]).to_table()


def test_quality_gate_reclassifies_short_docs(ray_session, tmp_path):
    corpus = str(tmp_path / "in")
    _write_corpus(corpus)
    cfg = ExtractConfig(min_quality_tokens=20)
    assert cfg.fingerprint() != DEFAULT_CONFIG.fingerprint()

    out = str(tmp_path / "out_gated")
    m = run_extract_job(corpus, out, cfg)
    assert m["rows"] == 2
    assert m["ok"] + m["errors"] == 2  # rows invariant preserved
    assert m["by_error_kind"].get("low_quality") == 1
    tbl = _table(out)
    rows = {u: i for i, u in enumerate(tbl.column("url").to_pylist())}
    short = rows["https://site-0.example/html/short"]
    long_ = rows["https://site-0.example/html/long"]
    assert not tbl.column("ok")[short].as_py()
    assert tbl.column("error_kind")[short].as_py() == "low_quality"
    assert tbl.column("text_md")[short].as_py() == ""
    assert tbl.column("n_md_bytes")[short].as_py() == 0
    assert tbl.column("ok")[long_].as_py()
    assert len(tbl.column("text_md")[long_].as_py().split()) >= 20


def test_quality_gate_default_path_unchanged(ray_session, tmp_path):
    corpus = str(tmp_path / "in")
    _write_corpus(corpus)
    out = str(tmp_path / "out_plain")
    m = run_extract_job(corpus, out, DEFAULT_CONFIG)
    assert m["ok"] == 2 and m["errors"] == 0
    tbl = _table(out)
    assert all(tbl.column("ok").to_pylist())


def test_quality_gate_resume_isolation(ray_session, tmp_path):
    """Gated and ungated runs to the SAME output dir never
    cross-resume: the semantic fingerprint differs, so the second run
    reprocesses rather than trusting the other config's manifests."""
    corpus = str(tmp_path / "in")
    _write_corpus(corpus)
    out = str(tmp_path / "out_shared")
    m1 = run_extract_job(corpus, out, DEFAULT_CONFIG)
    assert m1["processed_shards"] == 1
    m2 = run_extract_job(corpus, out, ExtractConfig(
        min_quality_tokens=20))
    assert m2["processed_shards"] == 1  # NOT resumed across configs
    assert m2["by_error_kind"].get("low_quality") == 1
    # and re-running the gated config resumes cleanly
    m3 = run_extract_job(corpus, out, ExtractConfig(
        min_quality_tokens=20))
    assert m3["processed_shards"] == 0
    assert m3["resumed_shards"] == 1
    assert m3["by_error_kind"].get("low_quality") == 1
