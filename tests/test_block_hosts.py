"""Opt-in extraction-time host blocklist (cfg.block_hosts): urls whose
host has ANY dot-suffix on the list become blocked_host error rows
BEFORE decode/sniff (subdomain semantics), PDF payloads never reach
the actor leg, the default path is untouched, and blocked / unblocked
runs keep separate resume manifests."""

import os

import pyarrow as pa
import pyarrow.dataset as pads
import pyarrow.parquet as pq

from documentconvert_ray.config import DEFAULT_CONFIG, ExtractConfig
from documentconvert_ray.pipelines.extract import run_extract_job

HTML = (b"<html><body><p>" + b"plenty of ordinary prose " * 20
        + b"kept as main content.</p></body></html>")
# structurally broken PDF: would raise inside the parser — the gate
# must keep it from ever reaching the PDF leg
BAD_PDF = b"%PDF-1.4 garbage with no xref"


def _write_corpus(d: str) -> None:
    os.makedirs(d, exist_ok=True)
    t = pa.table({
        "url": [
            "https://keep.example/html/0",
            "https://bad.example/html/1",          # exact host match
            "https://sub.bad.example/html/2",      # subdomain block
            "https://bad.example.org/html/3",      # NOT a dot-suffix
            "https://bad.example/pdf/4",           # blocked pdf
        ],
        "warc_ts": pa.array([0] * 5, pa.timestamp("us")),
        "html": pa.array([HTML, HTML, HTML, HTML, BAD_PDF],
                         pa.binary()),
        "lang": ["en"] * 5,
    })
    pq.write_table(t, os.path.join(d, "corpus-000.parquet"))


def _table(out_dir: str) -> pa.Table:
    return pads.dataset(
        [os.path.join(r, f) for r, _, fs in os.walk(out_dir)
         for f in fs if f.endswith(".parquet")]).to_table()


def test_block_hosts_suffix_semantics(ray_session, tmp_path):
    corpus = str(tmp_path / "in")
    _write_corpus(corpus)
    cfg = ExtractConfig(block_hosts=("bad.example",))
    assert cfg.fingerprint() != DEFAULT_CONFIG.fingerprint()

    out = str(tmp_path / "out_blocked")
    m = run_extract_job(corpus, out, cfg)
    assert m["rows"] == 5
    assert m["ok"] + m["errors"] == 5
    # host, subdomain and the blocked pdf; the .org lookalike passes
    assert m["by_error_kind"].get("blocked_host") == 3
    tbl = _table(out)
    by_url = {u: i for i, u in enumerate(tbl.column("url").to_pylist())}
    for u in ("https://bad.example/html/1",
              "https://sub.bad.example/html/2",
              "https://bad.example/pdf/4"):
        i = by_url[u]
        assert not tbl.column("ok")[i].as_py()
        assert tbl.column("error_kind")[i].as_py() == "blocked_host"
        assert tbl.column("doc_type")[i].as_py() == "blocked"
        assert tbl.column("text_md")[i].as_py() == ""
        # stored payload size still reported (capacity accounting)
        assert tbl.column("n_bytes")[i].as_py() > 0
    for u in ("https://keep.example/html/0",
              "https://bad.example.org/html/3"):
        assert tbl.column("ok")[by_url[u]].as_py()
    # the broken PDF produced no parse error: it was gated, not parsed
    assert "truncated_pdf" not in m["by_error_kind"]
    assert "bad_pdf" not in m["by_error_kind"]


def test_block_hosts_default_path_unchanged(ray_session, tmp_path):
    corpus = str(tmp_path / "in")
    _write_corpus(corpus)
    out = str(tmp_path / "out_plain")
    m = run_extract_job(corpus, out, DEFAULT_CONFIG)
    assert "blocked_host" not in m["by_error_kind"]
    assert m["ok"] == 4  # only the garbage pdf errors


def test_block_hosts_resume_isolation(ray_session, tmp_path):
    """Blocked and unblocked runs to the SAME output never
    cross-resume (the blocklist is semantic config)."""
    corpus = str(tmp_path / "in")
    _write_corpus(corpus)
    out = str(tmp_path / "out_shared")
    m1 = run_extract_job(corpus, out, DEFAULT_CONFIG)
    assert m1["processed_shards"] == 1
    cfg = ExtractConfig(block_hosts=("bad.example",))
    m2 = run_extract_job(corpus, out, cfg)
    assert m2["processed_shards"] == 1  # reprocessed, not resumed
    assert m2["by_error_kind"].get("blocked_host") == 3
    m3 = run_extract_job(corpus, out, cfg)
    assert m3["resumed_shards"] == 1    # same config resumes cleanly
