"""E2E golden tests: full Ray pipeline vs frozen fixtures (FIXTURES.md §5).

Byte-identical text_md per url at any batch size / partition count /
actor concurrency, row conservation, and resume correctness — the
operational form of the north_rule's "byte-identical extracted text
per url" invariant.
"""

import glob
import os
import shutil

import pyarrow.dataset as pads
import pytest

from conftest import CORPUS_DIR

from documentconvert_ray.config import ExtractConfig
from documentconvert_ray.pipelines.extract import (
    build_extract_ds,
    expand_input_files,
    run_extract_job,
)


def corpus_files():
    return expand_input_files(CORPUS_DIR)


def _check_against_fixtures(rows: dict, expected_by_url: dict):
    assert set(rows) == set(expected_by_url), "row conservation violated"
    for url, (ok, kind, md, sha, imgs) in expected_by_url.items():
        got = rows[url]
        assert got["ok"] == ok, (url, got["error_kind"], kind)
        assert got["error_kind"] == kind, (url, got["error_kind"], kind)
        assert got["text_sha256"] == sha, f"digest mismatch for {url}"
        assert got["text_md"] == md, f"byte mismatch for {url}"
        assert got["images"] == imgs, f"image payload mismatch for {url}"


def _collect(ds) -> dict:
    out = {}
    for batch in ds.iter_batches(batch_size=1000, batch_format="pyarrow"):
        for i in range(batch.num_rows):
            url = batch.column("url")[i].as_py()
            out[url] = {
                "ok": batch.column("ok")[i].as_py(),
                "error_kind": batch.column("error_kind")[i].as_py(),
                "text_md": batch.column("text_md")[i].as_py(),
                "text_sha256": batch.column("text_sha256")[i].as_py(),
                "spans": batch.column("spans")[i].as_py(),
                "images": batch.column("images")[i].as_py(),
            }
    return out


def test_e2e_default_config(ray_session, expected_by_url):
    ds = build_extract_ds(corpus_files())
    rows = _collect(ds)
    _check_against_fixtures(rows, expected_by_url)


@pytest.mark.parametrize("html_bs,pdf_bs,conc", [(1, 1, (1, 1)), (17, 3, (1, 4))])
def test_e2e_batch_size_invariance(ray_session, expected_by_url, html_bs, pdf_bs, conc):
    cfg = ExtractConfig(html_batch_size=html_bs, pdf_batch_size=pdf_bs)
    ds = build_extract_ds(corpus_files(), cfg, pdf_concurrency=conc)
    rows = _collect(ds)
    _check_against_fixtures(rows, expected_by_url)


def test_part_column_is_url_hash(ray_session):
    """Every output row's `part` equals crc32(url) % num_partitions —
    the deterministic placement key (SURVEY.md §4.3.1)."""
    import zlib

    from documentconvert_ray.config import DEFAULT_CONFIG

    ds = build_extract_ds(corpus_files())
    for batch in ds.iter_batches(batch_size=500, batch_format="pyarrow"):
        urls = batch.column("url").to_pylist()
        parts = batch.column("part").to_pylist()
        for u, p in zip(urls, parts):
            assert p == zlib.crc32(u.encode()) % DEFAULT_CONFIG.num_partitions


def test_e2e_elephant_routing(ray_session, expected_by_url):
    """Skew leg: with a tiny elephant threshold every sizable PDF is
    re-routed through the single-row elephant pool — output must stay
    byte-identical (SURVEY.md §4.3.2)."""
    cfg = ExtractConfig(elephant_bytes=2000)
    ds = build_extract_ds(corpus_files(), cfg)
    rows = _collect(ds)
    _check_against_fixtures(rows, expected_by_url)


def test_spans_reconstruct_text(ray_session):
    ds = build_extract_ds(corpus_files())
    for batch in ds.iter_batches(batch_size=500, batch_format="pyarrow"):
        for i in range(batch.num_rows):
            md = batch.column("text_md")[i].as_py()
            spans = batch.column("spans")[i].as_py() or []
            prev_end = -2
            for s in spans:
                assert 0 <= s["start"] < s["end"] <= len(md)
                assert s["start"] > prev_end, "overlapping spans"
                seg = md[s["start"]:s["end"]]
                assert seg == seg.strip("\n")
                prev_end = s["end"]
            if spans:
                # spans + separators tile the whole string
                assert spans[0]["start"] == 0 and spans[-1]["end"] == len(md)


def test_job_resume_partial_manifest(ray_session, expected_by_url, tmp_path):
    out_dir = str(tmp_path / "out")
    m1 = run_extract_job(CORPUS_DIR, out_dir)
    assert m1["rows"] == len(expected_by_url)
    assert m1["processed_shards"] == len(corpus_files())

    # delete one manifest → exactly that shard recomputes
    manifests = sorted(glob.glob(os.path.join(out_dir, "_manifest", "*.json")))
    os.remove(manifests[1])
    shutil.rmtree(os.path.join(out_dir, "data", "shard=1"))
    m2 = run_extract_job(CORPUS_DIR, out_dir)
    assert m2["processed_shards"] == 1
    assert m2["resumed_shards"] == len(corpus_files()) - 1
    assert m2["rows"] == m1["rows"]

    # final output matches fixtures exactly
    t = pads.dataset(os.path.join(out_dir, "data"), partitioning="hive").to_table(
        columns=["url", "ok", "error_kind", "text_md", "text_sha256",
                 "images"]
    )
    rows = {
        u: {"ok": ok, "error_kind": k, "text_md": md, "text_sha256": sha,
            "images": imgs}
        for u, ok, k, md, sha, imgs in zip(
            t.column("url").to_pylist(),
            t.column("ok").to_pylist(),
            t.column("error_kind").to_pylist(),
            t.column("text_md").to_pylist(),
            t.column("text_sha256").to_pylist(),
            t.column("images").to_pylist(),
        )
    }
    _check_against_fixtures(rows, expected_by_url)

    # config change invalidates resume
    m3 = run_extract_job(CORPUS_DIR, out_dir, ExtractConfig(link_density_pct=51))
    assert m3["processed_shards"] == len(corpus_files())


def test_shard_writer_retry_idempotent(ray_session, tmp_path):
    """A retried write task replaces its own file (content-derived
    name), never duplicates rows — the write-side exactly-once claim."""
    import pyarrow as pa

    from documentconvert_ray.pipelines.extract import ShardWriter
    from documentconvert_ray.stages.extract import OUTPUT_SCHEMA

    batch = pa.Table.from_pylist(
        [
            {f.name: {"url": "https://a/1", "warc_ts": 0, "lang": "en",
                      "doc_type": "html", "ok": True, "error_kind": "",
                      "error": "", "text_md": "x", "spans": [],
                      "text_sha256": "s", "n_bytes": 1, "n_md_bytes": 1,
                      "part": 0}.get(f.name)
             for f in OUTPUT_SCHEMA}
        ],
        schema=OUTPUT_SCHEMA,
    ).append_column("shard", pa.array([3], pa.int32()))
    w = ShardWriter(str(tmp_path / "out"))
    w(batch)
    w(batch)  # simulated Ray task retry
    files = glob.glob(str(tmp_path / "out" / "data" / "shard=3" / "*.parquet"))
    assert len(files) == 1
    t = pads.dataset(files[0]).to_table()
    assert t.num_rows == 1


def test_empty_input_is_noop_and_missing_raises(ray_session, tmp_path):
    empty = tmp_path / "empty"
    empty.mkdir()
    m = run_extract_job(str(empty), str(tmp_path / "out"))
    assert m["rows"] == 0 and m["processed_shards"] == 0
    with pytest.raises(FileNotFoundError):
        run_extract_job(str(tmp_path / "nope"), str(tmp_path / "out2"))


def test_resume_across_parallelism_change(ray_session, tmp_path):
    """Execution sizing (pool/batch) is not part of the manifest
    fingerprint: a rerun at different parallelism resumes cleanly."""
    out_dir = str(tmp_path / "out")
    m1 = run_extract_job(
        CORPUS_DIR, out_dir,
        ExtractConfig(pdf_pool_min=1, pdf_pool_max=1, pdf_batch_size=4),
    )
    m2 = run_extract_job(
        CORPUS_DIR, out_dir,
        ExtractConfig(pdf_pool_min=2, pdf_pool_max=4, pdf_batch_size=64),
    )
    assert m2["processed_shards"] == 0
    assert m2["resumed_shards"] == m1["processed_shards"]
    assert m2["rows"] == m1["rows"]


def test_row_order_independence(ray_session, expected_by_url):
    """Extraction is per-row pure: shuffling input rows changes nothing."""
    import ray.data

    ds = ray.data.read_parquet(corpus_files(),
                               columns=["url", "warc_ts", "html", "lang"])
    ds = ds.random_shuffle(seed=7)
    from documentconvert_ray.config import DEFAULT_CONFIG
    from documentconvert_ray.stages.extract import PdfExtractor, SniffAndExtractHtml

    ds = ds.map_batches(SniffAndExtractHtml(DEFAULT_CONFIG),
                        batch_format="pyarrow", batch_size=64)
    ds = ds.map_batches(PdfExtractor, fn_constructor_args=(DEFAULT_CONFIG,),
                        batch_format="pyarrow", batch_size=8, concurrency=(1, 2),
                        num_cpus=1)
    rows = _collect(ds)
    _check_against_fixtures(rows, expected_by_url)
