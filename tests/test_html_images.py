"""Data-URI embedded-image harvest in the HTML leg: payloads land in
the images output column (independent of boilerplate pruning),
malformed/oversized embeds skip without erroring, and the corpus
slice really exercises the path end-to-end."""

import base64
import os

import pyarrow.dataset as pads

from documentconvert_ray.functions.html_extract import (
    MAX_EMBED_IMAGES, extract_html)
from documentconvert_ray.pipelines.extract import run_extract_job
from documentconvert_ray.sources.corpus import synth_image, write_corpus

BODY = ("<p>Enough plain prose that the density heuristics keep this "
        "block as main content rather than boilerplate text.</p>")


def _page(*imgs: str) -> bytes:
    return (f"<html><body><div>{BODY}{''.join(imgs)}</div></body>"
            f"</html>").encode()


def _img(fmt: str, payload: bytes) -> str:
    b64 = base64.b64encode(payload).decode("ascii")
    return f'<img src="data:image/{fmt};base64,{b64}">'


def test_data_uri_images_harvested():
    png = synth_image("png", 5, 4, b"\x10\x20\x30")
    bmp = synth_image("bmp", 4, 3, b"\x40\x50\x60")
    res = extract_html(_page(_img("png", png), _img("bmp", bmp)))
    assert res.ok
    assert [n for n, _ in res.images] == ["embed-0.png", "embed-1.bmp"]
    assert res.images[0][1] == png and res.images[1][1] == bmp
    # extraction text is unaffected by the embeds
    assert extract_html(_page()).text_md == res.text_md


def test_malformed_and_capped_embeds_skip():
    png = synth_image("png", 4, 4, b"\x01\x02\x03")
    res = extract_html(_page(
        '<img src="data:image/png;base64,AAABB">',      # bad padding
        '<img src="data:image/png;base64,">',            # empty
        '<img src="data:image/tiff;base64,AAAA">',       # unknown fmt
        _img("png", png)))
    assert res.ok
    assert [n for n, _ in res.images] == ["embed-0.png"]
    assert res.images[0][1] == png
    # cap: only the first MAX_EMBED_IMAGES survive
    many = extract_html(_page(*[_img("png", png)] * (MAX_EMBED_IMAGES + 4)))
    assert len(many.images) == MAX_EMBED_IMAGES


def test_corpus_slice_end_to_end(ray_session, tmp_path):
    corpus = str(tmp_path / "in")
    write_corpus(corpus, 300, rows_per_file=300)
    out = str(tmp_path / "out")
    m = run_extract_job(corpus, out)
    assert m["rows"] == 300
    files = [os.path.join(r, f) for r, _, fs in os.walk(out)
             for f in fs if f.endswith(".parquet")]
    tbl = pads.dataset(files).to_table(columns=["url", "ok", "images"])
    with_imgs = [
        (u, im) for u, ok, im in zip(tbl.column("url").to_pylist(),
                                     tbl.column("ok").to_pylist(),
                                     tbl.column("images").to_pylist())
        if ok and im and "/html/" in u]
    # the doc_id%9==4 html slice must produce real embedded payloads
    assert len(with_imgs) > 5
    for _, im in with_imgs:
        for entry in im:
            assert entry["name"].startswith("embed-")
            assert len(entry["data"]) > 0
