"""JSON-Lines source — read `.jsonl` / `.jsonl.gz` crawl dumps into
the corpus-schema Dataset the extraction job consumes.

Beside WARC (sources/warc.py), the other interchange the crawl world
actually ships is JSON Lines — one object per page, URL + timestamp +
payload fields (the WET/CC-NEWS derivative dumps, most scraped-data
vendors, and this engine's own ``--output-format jsonl`` sink). The
reference ingests single files from S3 (S1/S13,
services/s3_download_service.py:102-209); this leg accepts the same
payloads in bulk.

Accepted per-line fields (everything else is ignored):

- ``url``       required; lines without it are skipped, not raised
- ``warc_ts``/``ts``  ISO-8601 timestamp (optional; a fixed 2024-01-01
                epoch otherwise — staging stays byte-deterministic)
- ``html_b64``  base64-encoded raw payload bytes (binary-safe lane)
- ``html``      payload as a UTF-8 string (HTML-text lane)
- ``text``      pre-extracted text (no payload; flows through the
                text column untouched)
- ``lang``      optional language tag

Scale shape: one read task per shard file (gzip'd JSONL is not
splittable mid-stream, same contract as WARC — keep shards 0.1-1 GB),
parsing is a stateless ``map_batches``, rows land in the corpus schema
(url, warc_ts, html, text, lang) and flow into the normal
shard-resumable job unchanged. Malformed lines (bad JSON, bad base64,
missing url) are skipped, never raised — one broken line must not kill
a shard.
"""

from __future__ import annotations

import base64
import binascii
import datetime
import gzip
import json
import zlib

import pyarrow as pa

_EPOCH = datetime.datetime(2024, 1, 1)


def _parse_ts(row: dict) -> datetime.datetime:
    raw = row.get("warc_ts") or row.get("ts")
    if not isinstance(raw, str):
        return _EPOCH
    try:
        ts = datetime.datetime.fromisoformat(raw.replace("Z", "+00:00"))
    except ValueError:
        return _EPOCH
    if ts.tzinfo is not None:
        ts = ts.astimezone(datetime.timezone.utc).replace(tzinfo=None)
    return ts


def jsonl_rows(blob: bytes) -> list[dict]:
    """One `.jsonl`/`.jsonl.gz` shard blob → corpus-schema row dicts.
    Gzip detected by magic (multi-member streams inflate fully —
    `gzip.decompress` walks members); every malformed line is skipped."""
    if blob[:2] == b"\x1f\x8b":
        try:
            blob = gzip.decompress(blob)
        except (OSError, EOFError, zlib.error):
            return []
    rows: list[dict] = []
    for line in blob.split(b"\n"):
        line = line.strip()
        if not line:
            continue
        try:
            obj = json.loads(line)
        except (UnicodeDecodeError, json.JSONDecodeError):
            continue
        if not isinstance(obj, dict) or not isinstance(obj.get("url"), str):
            continue
        html = b""
        b64 = obj.get("html_b64")
        if isinstance(b64, str):
            try:
                html = base64.b64decode(b64, validate=True)
            except (binascii.Error, ValueError):
                continue
        elif isinstance(obj.get("html"), str):
            html = obj["html"].encode("utf-8")
        text = obj.get("text")
        lang = obj.get("lang")
        rows.append({
            "url": obj["url"],
            "warc_ts": _parse_ts(obj),
            "html": html,
            "text": text if isinstance(text, str) else "",
            "lang": lang if isinstance(lang, str) else "",
        })
    return rows


def jsonl_batch_to_rows(b: pa.Table) -> pa.Table:
    """``read_binary_files`` batch (path, bytes) → corpus-schema rows."""
    out: list[dict] = []
    for blob in b.column("bytes").to_pylist():
        out.extend(jsonl_rows(blob))
    return pa.Table.from_pydict({
        "url": pa.array([r["url"] for r in out], pa.string()),
        "warc_ts": pa.array([r["warc_ts"] for r in out],
                            pa.timestamp("us")),
        "html": pa.array([r["html"] for r in out], pa.binary()),
        "text": pa.array([r["text"] for r in out], pa.string()),
        "lang": pa.array([r["lang"] for r in out], pa.string()),
    })


# ------------------------------------------------------------- writer
# test/interop counterpart; byte-deterministic (gzip mtime=0)


def make_jsonl_bytes(rows: list[dict], *, compress: bool = True) -> bytes:
    """Corpus-style row dicts → a `.jsonl(.gz)` shard blob. Binary
    payloads ride ``html_b64``; naive timestamps render ISO-8601."""
    lines = []
    for r in rows:
        obj = {"url": r["url"]}
        ts = r.get("warc_ts")
        if ts is not None:
            obj["warc_ts"] = ts.isoformat()
        if r.get("html"):
            obj["html_b64"] = base64.b64encode(r["html"]).decode("ascii")
        if r.get("text"):
            obj["text"] = r["text"]
        if r.get("lang"):
            obj["lang"] = r["lang"]
        lines.append(json.dumps(obj, ensure_ascii=False).encode("utf-8"))
    blob = b"\n".join(lines) + b"\n" if lines else b""
    if not compress:
        return blob
    import io

    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
        gz.write(blob)
    return buf.getvalue()
