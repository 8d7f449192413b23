"""WARC source — read Common-Crawl-style `.warc` / `.warc.gz` archive
shards into the corpus-schema Dataset the extraction job consumes.

The reference ingests files one at a time from S3 (S1/S13,
services/s3_download_service.py:102-209); the crawl world's native
interchange for the SAME payloads is WARC (ISO 28500: one record per
capture, `WARC-Target-URI` + `WARC-Date` headers, an HTTP response
envelope around the page bytes; Common Crawl gzips EACH record as its
own gzip member so readers can split archives without inflating them
end-to-end).

Scale shape: one read task per archive shard (`read_binary_files` —
WARC is not splittable mid-record without an index, so the shard file
IS the parallelism unit; keep shards at the usual 0.1-1 GB), parsing
is a stateless `map_batches`, rows land in the corpus schema
(url, warc_ts, html, text, lang) and flow into the normal
shard-resumable job unchanged. Records that fail to parse are counted,
never raised — a malformed record must not kill an archive.

Writer counterpart (`make_warc_bytes`) exists for tests/interop and is
byte-deterministic (fixed record ids derived from the url digest, no
wall clock).
"""

from __future__ import annotations

import datetime
import hashlib
import zlib

import pyarrow as pa

_CRLF2 = b"\r\n\r\n"


# ------------------------------------------------------------- writer


def _http_wrap(body: bytes) -> bytes:
    return (b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html\r\n"
            b"Content-Length: " + str(len(body)).encode() + _CRLF2) + body


def make_warc_bytes(rows, gzip_per_record: bool = False) -> bytes:
    """rows: iterable of {url, warc_ts, html} → WARC archive bytes.
    With ``gzip_per_record=True``, each record is its own gzip member
    (the Common-Crawl layout)."""
    import gzip as _gzip

    out = bytearray()
    for r in rows:
        body = r["html"] or b""
        payload = _http_wrap(body)
        ts = r["warc_ts"]
        if isinstance(ts, datetime.datetime):
            date = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
        else:
            date = str(ts)
        rid = hashlib.md5(r["url"].encode()).hexdigest()
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Record-ID: <urn:md5:" + rid.encode() + b">\r\n"
            b"WARC-Target-URI: " + r["url"].encode() + b"\r\n"
            b"WARC-Date: " + date.encode() + b"\r\n"
            b"Content-Type: application/http; msgtype=response\r\n"
            b"Content-Length: " + str(len(payload)).encode() + _CRLF2
        ) + payload + _CRLF2
        if gzip_per_record:
            rec = _gzip.compress(bytes(rec), compresslevel=9, mtime=0)
        out += rec
    return bytes(out)


# ------------------------------------------------------------- reader


def iter_gzip_members(data: bytes):
    """Yield the decompressed bytes of each gzip member in ``data``
    (Common Crawl = one member per record)."""
    while data[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        yield d.decompress(data) + d.flush()
        if not d.eof:
            return  # truncated trailing member
        data = d.unused_data


def _dechunk(body: bytes) -> bytes:
    """Decode HTTP/1.1 chunked transfer encoding (tolerant: returns
    what was decoded so far on a malformed chunk header)."""
    out = bytearray()
    pos = 0
    while True:
        nl = body.find(b"\r\n", pos)
        if nl < 0:
            break
        size_tok = body[pos:nl].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            break
        if size == 0:
            break
        chunk_start = nl + 2
        out += body[chunk_start:chunk_start + size]
        pos = chunk_start + size + 2  # skip chunk CRLF
    return bytes(out)


def _http_body(payload: bytes) -> bytes:
    """Strip the HTTP response envelope; dechunk if the headers say
    chunked. A payload without an HTTP status line is returned as-is
    (resource records)."""
    if not payload.startswith(b"HTTP/"):
        return payload
    sep = payload.find(_CRLF2)
    if sep < 0:
        return b""
    headers = payload[:sep].lower()
    body = payload[sep + 4:]
    if b"transfer-encoding:" in headers and b"chunked" in headers:
        return _dechunk(body)
    return body


def iter_warc_records(data: bytes):
    """Yield (url, warc_ts, page_bytes) for each parseable response /
    resource record; skips records of other types and malformed
    trailers without raising."""
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(b"WARC/", pos)
        if start < 0:
            return
        hdr_end = data.find(_CRLF2, start)
        if hdr_end < 0:
            return
        headers: dict[bytes, bytes] = {}
        for line in data[start:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers.get(b"content-length", b""))
        except ValueError:
            pos = hdr_end + 4
            continue
        if hdr_end + 4 + length > n:
            return  # truncated final record: never emit a short body
        payload = data[hdr_end + 4:hdr_end + 4 + length]
        pos = hdr_end + 4 + length + 4  # record + trailing CRLFCRLF
        rtype = headers.get(b"warc-type", b"")
        if rtype not in (b"response", b"resource"):
            continue
        url = headers.get(b"warc-target-uri", b"").decode(
            "utf-8", "replace")
        if not url:
            continue
        raw_date = headers.get(b"warc-date", b"").decode("ascii", "replace")
        try:
            ts = datetime.datetime.strptime(raw_date, "%Y-%m-%dT%H:%M:%SZ")
        except ValueError:
            ts = datetime.datetime(1970, 1, 1)
        yield url, ts, _http_body(payload)


def parse_warc_file(data: bytes):
    """Whole archive (plain or per-record/whole-file gzip) → record
    iterator. Gzip'd archives are split member-wise so memory is one
    record, not one inflated archive."""
    if data[:2] == b"\x1f\x8b":
        for member in iter_gzip_members(data):
            yield from iter_warc_records(member)
    else:
        yield from iter_warc_records(data)


CORPUS_COLUMNS = ("url", "warc_ts", "html", "text", "lang")


def warc_batch_to_rows(batch: pa.Table) -> pa.Table:
    """read_binary_files batch (path, bytes) → corpus-schema rows."""
    urls: list[str] = []
    tss: list[datetime.datetime] = []
    bodies: list[bytes] = []
    for data in batch.column("bytes").to_pylist():
        for url, ts, body in parse_warc_file(data or b""):
            urls.append(url)
            tss.append(ts)
            bodies.append(body)
    return pa.Table.from_pydict({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(bodies, pa.binary()),
        "text": pa.array([""] * len(urls), pa.string()),
        "lang": pa.array([""] * len(urls), pa.string()),
    })
