"""WARC source: writer/reader round-trip, CC-style per-record gzip,
HTTP envelope + chunked decoding, malformed-record tolerance, and the
staged e2e path through the real extraction job."""

import datetime
import gzip
import os

import pyarrow as pa
import pytest

from documentconvert_ray.sources.corpus import doc_row
from documentconvert_ray.sources.warc import (
    _dechunk,
    iter_gzip_members,
    make_warc_bytes,
    parse_warc_file,
    warc_batch_to_rows,
)


def _rows(n=12, start=0):
    return [doc_row(i) for i in range(start, start + n)]


def test_roundtrip_plain_and_gzip():
    rows = _rows(12)
    for gz in (False, True):
        data = make_warc_bytes(rows, gzip_per_record=gz)
        got = list(parse_warc_file(data))
        assert len(got) == len(rows)
        for (url, ts, body), r in zip(got, rows):
            assert url == r["url"]
            assert body == r["html"]
            assert ts == r["warc_ts"].replace(microsecond=0)


def test_gzip_members_split():
    rows = _rows(5)
    data = make_warc_bytes(rows, gzip_per_record=True)
    members = list(iter_gzip_members(data))
    assert len(members) == 5
    assert all(m.startswith(b"WARC/1.0") for m in members)


def test_chunked_http_body_is_dechunked():
    body = b"<html><body><p>chunky page content here</p></body></html>"
    chunked = b""
    for i in range(0, len(body), 10):
        part = body[i:i + 10]
        chunked += f"{len(part):x}".encode() + b"\r\n" + part + b"\r\n"
    chunked += b"0\r\n\r\n"
    assert _dechunk(chunked) == body
    payload = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
               + chunked)
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: https://x.example/1\r\n"
           b"WARC-Date: 2024-01-01T00:00:00Z\r\n"
           b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
           + payload + b"\r\n\r\n")
    got = list(parse_warc_file(rec))
    assert got == [("https://x.example/1",
                    datetime.datetime(2024, 1, 1), body)]


def test_malformed_records_skipped_not_raised():
    rows = _rows(3)
    good = make_warc_bytes(rows)
    bad = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"Content-Length: notanumber\r\n\r\n")
    noise = b"garbage bytes with no record marker"
    metadata = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\n"
                b"Content-Length: 4\r\n\r\nabcd\r\n\r\n")
    data = bad + metadata + good + noise
    got = list(parse_warc_file(data))
    assert [u for u, _, _ in got] == [r["url"] for r in rows]
    # truncated gzip tail: parse what's whole, never raise, and never
    # emit a record whose declared length overruns the buffer
    gz = make_warc_bytes(rows, gzip_per_record=True)
    got = list(parse_warc_file(gz[: len(gz) - 200]))
    assert len(got) == 2
    assert all(b == r["html"] for (_, _, b), r in zip(got, rows))


def test_warc_batch_to_rows_schema():
    data = make_warc_bytes(_rows(4), gzip_per_record=True)
    batch = pa.Table.from_pydict(
        {"path": ["a.warc.gz"], "bytes": pa.array([data], pa.binary())})
    out = warc_batch_to_rows(batch)
    assert out.column_names == ["url", "warc_ts", "html", "text", "lang"]
    assert out.num_rows == 4


@pytest.mark.usefixtures("ray_session")
def test_staged_warc_e2e_matches_parquet_job(tmp_path):
    """Extraction over WARC-staged input == extraction over the same
    rows written as parquet directly (per-url text digests equal)."""
    import pyarrow.parquet as pq

    from documentconvert_ray.pipelines.extract import (
        run_extract_job,
        stage_warc_files,
    )
    from documentconvert_ray.sources.corpus import write_corpus

    rows = _rows(40)
    warc_dir = tmp_path / "warc"
    os.makedirs(warc_dir)
    for shard in range(2):
        chunk = rows[shard * 20:(shard + 1) * 20]
        (warc_dir / f"shard-{shard}.warc.gz").write_bytes(
            make_warc_bytes(chunk, gzip_per_record=True))

    staged = tmp_path / "staged"
    files = stage_warc_files(str(warc_dir), str(staged))
    assert files
    out_a = tmp_path / "out_warc"
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
