"""Opt-in JSONL output format (cfg.output_format="jsonl"): the shard
artifacts are gzip'd JSON Lines whose rows are value-identical to the
parquet run's (images base64, timestamps ISO-8601), metrics/manifests
are format-independent, resume works, and the two formats keep
separate resume manifests (semantic fingerprint)."""

import base64
import gzip
import json
import os

from documentconvert_ray.config import DEFAULT_CONFIG, ExtractConfig
from documentconvert_ray.pipelines.extract import run_extract_job
from documentconvert_ray.sources.corpus import write_corpus


def _jsonl_rows(out_dir: str) -> list[dict]:
    rows = []
    for r, _, fs in os.walk(out_dir):
        for f in sorted(fs):
            if f.endswith(".jsonl.gz"):
                with gzip.open(os.path.join(r, f), "rt",
                               encoding="utf-8") as fh:
                    rows.extend(json.loads(line) for line in fh)
    return rows


def _parquet_rows(out_dir: str) -> list[dict]:
    import pyarrow.dataset as pads

    files = [os.path.join(r, f) for r, _, fs in os.walk(out_dir)
             for f in fs if f.endswith(".parquet")]
    return pads.dataset(files).to_table().to_pylist()


def test_jsonl_job_matches_parquet(ray_session, tmp_path):
    corpus = str(tmp_path / "in")
    write_corpus(corpus, 200, rows_per_file=100)
    cfg = ExtractConfig(output_format="jsonl")
    assert cfg.fingerprint() != DEFAULT_CONFIG.fingerprint()

    out_j = str(tmp_path / "out_jsonl")
    out_p = str(tmp_path / "out_parquet")
    mj = run_extract_job(corpus, out_j, cfg)
    mp = run_extract_job(corpus, out_p, DEFAULT_CONFIG)
    # metrics are artifact-format independent
    for k in ("rows", "ok", "errors", "out_md_bytes", "by_error_kind"):
        assert mj[k] == mp[k], k

    jr = {r["url"]: r for r in _jsonl_rows(out_j)}
    pr = {r["url"]: r for r in _parquet_rows(out_p)}
    assert set(jr) == set(pr) and len(jr) == mj["rows"]
    some_image = False
    for url, p in pr.items():
        j = jr[url]
        for col in ("lang", "doc_type", "ok", "error_kind", "error",
                    "text_md", "text_sha256", "n_bytes", "n_md_bytes",
                    "part", "spans"):
            assert j[col] == p[col], (url, col)
        assert j["warc_ts"] == p["warc_ts"].isoformat()
        jim, pim = j["images"] or [], p["images"] or []
        assert len(jim) == len(pim)
        for a, b in zip(jim, pim):
            assert a["name"] == b["name"]
            assert base64.b64decode(a["data"]) == b["data"]
            some_image = True
    assert some_image  # the corpus really exercises the base64 leg

    # no parquet artifacts in the jsonl run's data dirs (and vice versa)
    assert not [f for r, _, fs in os.walk(out_j) for f in fs
                if f.endswith(".parquet")]
    assert not [f for r, _, fs in os.walk(out_p) for f in fs
                if f.endswith(".jsonl.gz")]


def test_jsonl_uri_output(ray_session, tmp_path):
    """The object-store leg (atomic PUT via pyarrow.fs, no
    rename/fsync) writes the same jsonl artifacts through a file://
    URI."""
    corpus = str(tmp_path / "in")
    write_corpus(corpus, 100, rows_per_file=100)
    cfg = ExtractConfig(output_format="jsonl")
    out_local = str(tmp_path / "out_local")
    out_uri = "file://" + str(tmp_path / "out_uri")
    ml = run_extract_job(corpus, out_local, cfg)
    mu = run_extract_job(corpus, out_uri, cfg)
    assert mu["rows"] == ml["rows"] and mu["ok"] == ml["ok"]
    lr = {r["url"]: r for r in _jsonl_rows(out_local)}
    ur = {r["url"]: r for r in _jsonl_rows(str(tmp_path / "out_uri"))}
    assert lr == ur and len(lr) == ml["rows"]
    # resume works through the URI too
    m2 = run_extract_job(corpus, out_uri, cfg)
    assert m2["processed_shards"] == 0 and m2["resumed_shards"] == 1


def test_jsonl_resume(ray_session, tmp_path):
    corpus = str(tmp_path / "in")
    write_corpus(corpus, 100, rows_per_file=100)
    cfg = ExtractConfig(output_format="jsonl")
    out = str(tmp_path / "out")
    m1 = run_extract_job(corpus, out, cfg)
    assert m1["processed_shards"] == 1
    m2 = run_extract_job(corpus, out, cfg)
    assert m2["processed_shards"] == 0 and m2["resumed_shards"] == 1
    assert m2["rows"] == m1["rows"]
    # a parquet-format run of the same input does NOT resume off the
    # jsonl manifests (semantic fingerprint isolation)
    out2 = str(tmp_path / "out2")
    m3 = run_extract_job(corpus, out2, DEFAULT_CONFIG)
    assert m3["processed_shards"] == 1
