"""Gzip transport-wrapper handling (CC-style stored pages): transparent
inflate before sniffing, byte-identical extraction vs the plain twin,
bounded zip-bomb/corruption error rows. No Ray needed — stage 1 is a
plain callable over an Arrow batch."""

import datetime
import gzip

import pyarrow as pa

from documentconvert_ray.config import DEFAULT_CONFIG, ExtractConfig
from documentconvert_ray.functions.html_extract import extract_html
from documentconvert_ray.functions.sniff import gunzip_payload
from documentconvert_ray.sources.corpus import make_html
from documentconvert_ray.stages.extract import SniffAndExtractHtml


def _batch(payloads):
    n = len(payloads)
    return pa.Table.from_pydict({
        "url": [f"https://site-0.example/x/html/{i}" for i in range(n)],
        "warc_ts": pa.array([datetime.datetime(2024, 1, 1)] * n,
                            pa.timestamp("us")),
        "html": pa.array(payloads, pa.binary()),
        "lang": ["en"] * n,
    })


def test_gzip_twin_extracts_byte_identical():
    html, _, _ = make_html(7)
    wrapped = gzip.compress(html, compresslevel=9, mtime=0)
    out = SniffAndExtractHtml()(_batch([html, wrapped]))
    plain, gz = out.to_pylist()
    assert plain["ok"] and gz["ok"]
    assert gz["doc_type"] == "html"
    assert gz["text_md"] == plain["text_md"]
    assert gz["text_sha256"] == plain["text_sha256"]
    # n_bytes reports the OUTER (stored) size, like the SQL oracle
    assert gz["n_bytes"] == len(wrapped)
    assert plain["n_bytes"] == len(html)


def test_corrupt_gzip_is_error_row_not_crash():
    html, _, _ = make_html(9)
    wrapped = bytearray(gzip.compress(html, compresslevel=9, mtime=0))
    truncated = bytes(wrapped[: len(wrapped) // 2])
    wrapped[20] ^= 0xFF  # flip a deflate byte
    out = SniffAndExtractHtml()(_batch([truncated, bytes(wrapped)]))
    for row in out.to_pylist():
        assert not row["ok"]
        assert row["error_kind"] == "bad_gzip"
        assert row["doc_type"] == "other"
        assert row["text_md"] == ""


def test_zip_bomb_capped_to_error_row():
    bomb = gzip.compress(b"\x00" * 200_000, compresslevel=9, mtime=0)
    cfg = ExtractConfig(max_gunzip_bytes=4096)
    out = SniffAndExtractHtml(cfg)(_batch([bomb]))
    row = out.to_pylist()[0]
    assert not row["ok"]
    assert row["error_kind"] == "bad_gzip"
    assert "cap" in row["error"]


def test_gunzip_payload_contract():
    inner = b"<html><body><p>hello hello hello</p></body></html>"
    wrapped = gzip.compress(inner, compresslevel=9, mtime=0)
    got, err = gunzip_payload(wrapped)
    assert got == inner and err == ""
    got, err = gunzip_payload(wrapped[:10])
    assert got is None and "truncated" in err
    got, err = gunzip_payload(b"\x1f\x8b\x00garbage")
    assert got is None
    # cap binds exactly: inner fits at len(inner), errors one below
    assert gunzip_payload(wrapped, len(inner))[0] == inner
    assert gunzip_payload(wrapped, len(inner) - 1)[0] is None


def test_corpus_gzip_variant_matches_plain_markdown():
    """The doc_id%13==5 html slice is gzip'd at the transport layer
    only — extraction output must equal the unwrapped payload's."""
    from documentconvert_ray.sources.corpus import doc_row

    row = None
    for i in range(5, 400, 13):
        r = doc_row(i)
        if "/html/" in r["url"] and r["html"][:2] == b"\x1f\x8b":
            row = r
            break
    assert row is not None, "no gzip html row found in corpus slice"
    inner, err = gunzip_payload(row["html"])
    assert err == ""
    direct = extract_html(inner, DEFAULT_CONFIG)
    out = SniffAndExtractHtml()(_batch([row["html"]])).to_pylist()[0]
    assert out["ok"] and out["text_md"] == direct.text_md
