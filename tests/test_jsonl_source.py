"""JSONL source: writer/reader round-trip over both payload lanes
(base64 binary vs UTF-8 string), timestamp-variant parsing,
malformed-line tolerance, gzip and plain shards, and the staged e2e
path through the real extraction job (digest-equal to the parquet
job on the same rows)."""

import datetime
import gzip
import json
import os

from documentconvert_ray.sources.corpus import doc_row
from documentconvert_ray.sources.jsonl import (
    jsonl_batch_to_rows,
    jsonl_rows,
    make_jsonl_bytes,
)


def _rows(n=12, start=0):
    return [doc_row(i) for i in range(start, start + n)]


def test_roundtrip_plain_and_gzip():
    rows = _rows(12)
    for gz in (False, True):
        data = make_jsonl_bytes(rows, compress=gz)
        got = jsonl_rows(data)
        assert len(got) == len(rows)
        for g, r in zip(got, rows):
            assert g["url"] == r["url"]
            assert g["html"] == r["html"]
            assert g["warc_ts"] == r["warc_ts"]


def test_payload_lanes_and_ts_variants():
    lines = [
        # binary lane
        {"url": "https://a.example/1", "warc_ts": "2024-03-04T05:06:07",
         "html_b64": "JVBERi0=", "lang": "en"},
        # string-HTML lane
        {"url": "https://a.example/2", "ts": "2024-03-04T05:06:07Z",
         "html": "<html><p>hi</p></html>"},
        # pre-extracted text lane, no ts → fixed epoch
        {"url": "https://a.example/3", "text": "already extracted"},
        # tz-aware offset normalizes to naive UTC
        {"url": "https://a.example/4", "warc_ts": "2024-01-01T02:00:00+02:00",
         "html": "x"},
    ]
    blob = ("\n".join(json.dumps(x) for x in lines)).encode()
    got = jsonl_rows(blob)
    assert [g["url"] for g in got] == [x["url"] for x in lines]
    assert got[0]["html"] == b"%PDF-"
    assert got[0]["lang"] == "en"
    assert got[1]["html"] == b"<html><p>hi</p></html>"
    assert got[1]["warc_ts"] == datetime.datetime(2024, 3, 4, 5, 6, 7)
    assert got[2]["html"] == b"" and got[2]["text"] == "already extracted"
    assert got[2]["warc_ts"] == datetime.datetime(2024, 1, 1)
    assert got[3]["warc_ts"] == datetime.datetime(2024, 1, 1, 0, 0, 0)


def test_malformed_lines_skipped_not_raised():
    good = json.dumps({"url": "https://ok.example/x", "html": "y"})
    blob = b"\n".join([
        b"not json at all {",
        b'{"no_url": 1}',
        b'{"url": 42}',                                # non-string url
        b'{"url": "https://bad.example/b64", "html_b64": "@@@"}',
        b'"a bare string"',
        b"",
        good.encode(),
    ])
    got = jsonl_rows(blob)
    assert len(got) == 1 and got[0]["url"] == "https://ok.example/x"
    # corrupt gzip container → empty, not an exception
    assert jsonl_rows(b"\x1f\x8b" + b"\x00" * 16) == []


def test_batch_to_rows_schema():
    import pyarrow as pa

    rows = _rows(5)
    b = pa.Table.from_pydict({
        "path": pa.array(["shard0.jsonl.gz"]),
        "bytes": pa.array([make_jsonl_bytes(rows)], pa.binary()),
    })
    t = jsonl_batch_to_rows(b)
    assert t.column_names == ["url", "warc_ts", "html", "text", "lang"]
    assert t.num_rows == 5
    assert t.schema.field("warc_ts").type == pa.timestamp("us")
    assert t.schema.field("html").type == pa.binary()


def test_staged_jsonl_e2e_matches_parquet_job(ray_session, tmp_path):
    """Extraction over JSONL-staged input == extraction over the same
    rows written as parquet directly (per-url text digests equal)."""
    import pyarrow.parquet as pq

    from documentconvert_ray.pipelines.extract import (
        run_extract_job,
        stage_jsonl_files,
    )
    from documentconvert_ray.sources.corpus import write_corpus

    rows = _rows(40)
    jl_dir = tmp_path / "jsonl"
    os.makedirs(jl_dir)
    (jl_dir / "shard-0.jsonl.gz").write_bytes(
        make_jsonl_bytes(rows[:20]))
    (jl_dir / "shard-1.jsonl").write_bytes(
        make_jsonl_bytes(rows[20:], compress=False))

    staged = tmp_path / "staged"
    files = stage_jsonl_files(str(jl_dir), str(staged))
    assert files
    out_a = tmp_path / "out_jsonl"
    run_extract_job(str(staged), str(out_a), resume=False)

    pq_dir = tmp_path / "pq"
    write_corpus(str(pq_dir), 40)
    out_b = tmp_path / "out_pq"
    run_extract_job(str(pq_dir), str(out_b), resume=False)

    def digests(out_dir):
        import glob

        d = {}
        for f in glob.glob(str(out_dir) + "/**/*.parquet", recursive=True):
            t = pq.read_table(f, columns=["url", "text_sha256", "ok"])
            for u, h, ok in zip(t.column("url").to_pylist(),
                                t.column("text_sha256").to_pylist(),
                                t.column("ok").to_pylist()):
                d[u] = (h, ok)
        return d

    da, db = digests(out_a), digests(out_b)
    assert set(da) == set(db) and len(da) == 40
    assert da == db


def test_stage_jsonl_uri_path(ray_session, tmp_path):
    """file:// URI inputs resolve through pyarrow.fs like the other
    staging legs."""
    from documentconvert_ray.pipelines.extract import stage_jsonl_files

    rows = _rows(6)
    jl_dir = tmp_path / "jl"
    os.makedirs(jl_dir)
    (jl_dir / "s.jsonl.gz").write_bytes(make_jsonl_bytes(rows))
    staged = tmp_path / "staged_uri"
    files = stage_jsonl_files(f"file://{jl_dir}", str(staged))
    assert files
    import pyarrow.parquet as pq

    n = sum(pq.read_metadata(f).num_rows for f in files)
    assert n == 6
