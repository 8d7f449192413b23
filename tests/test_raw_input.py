"""Raw-document input mode (the reference's actual input: a directory
of .pdf/.docx/.html/.doc files — S1/S11/S13 + the M6/M7 batch loops):
`stage_raw_files` turns the tree into corpus-schema parquet shards the
shard-resumable main job consumes unchanged; routing comes from the
SNIFFER, never the file extension (M1/M9)."""

import json
import os
import random

import pytest


@pytest.fixture(scope="module")
def raw_tree(tmp_path_factory):
    from documentconvert_ray.sources.corpus import (
        make_doc_legacy,
        make_docx,
        make_html,
        make_pdf,
        make_rtf,
    )

    d = tmp_path_factory.mktemp("rawdocs")
    (d / "sub").mkdir()
    files = {}
    payload, _, _ = make_html(1)
    files["page.html"] = payload
    payload, _, _ = make_html(2)
    files["sub/page2.html"] = payload
    payload, _, _ = make_pdf(3)
    files["report.pdf"] = payload
    payload, _ = make_docx(random.Random(4))
    files["memo.docx"] = payload
    payload, _ = make_doc_legacy(random.Random(5))
    files["legacy.doc"] = payload
    payload, _ = make_rtf(random.Random(6))
    files["notes.rtf"] = payload
    files["junk.bin"] = b"\x00\x01\x02 not a document"
    # extension LIES: pdf bytes under .txt must still route to the
    # pdf leg (sniffer, not extension); doc 8 is a clean (non-variant)
    # pdf — doc 7 draws the /Encrypt variant
    payload, _, _ = make_pdf(8)
    files["mislabeled.txt"] = payload
    for name, data in files.items():
        p = d / name
        p.write_bytes(data)
    return d, files


def test_stage_raw_files_schema(raw_tree, ray_session, tmp_path):
    import pyarrow.parquet as pq

    from documentconvert_ray.pipelines.extract import stage_raw_files

    d, files = raw_tree
    out = tmp_path / "staged"
    written = stage_raw_files(str(d), str(out))
    assert written
    import pyarrow.dataset as pads

    tbl = pads.dataset(written).to_table()
    assert tbl.num_rows == len(files)
    cols = set(tbl.column_names)
    assert {"url", "warc_ts", "html", "text", "lang"} <= cols
    urls = tbl.column("url").to_pylist()
    assert all(u.startswith("file://") for u in urls)
    # payload bytes survive verbatim
    by_name = {u.rsplit("/", 1)[-1]: h
               for u, h in zip(urls, tbl.column("html").to_pylist())}
    assert by_name["report.pdf"] == files["report.pdf"]
    assert by_name["legacy.doc"] == files["legacy.doc"]


def test_raw_job_end_to_end_and_resume(raw_tree, ray_session, tmp_path):
    from documentconvert_ray.pipelines.extract import (
        run_extract_job,
        stage_raw_files,
    )

    d, files = raw_tree
    staged = tmp_path / "staged"
    out = tmp_path / "out"
    stage_raw_files(str(d), str(staged))
    m = run_extract_job(str(staged), str(out))
    assert m["rows"] == len(files)
    # html×2, pdf×2 (incl. the mislabeled .txt), docx, .doc, rtf → ok
    assert m["ok"] == 7
    assert m["by_error_kind"] == {"unsupported": 1}  # junk.bin only
    m2 = run_extract_job(str(staged), str(out))
    assert m2["processed_shards"] == 0
    assert m2["resumed_shards"] == m["shards"]


def test_staging_is_deterministic(raw_tree, ray_session, tmp_path):
    import pyarrow.dataset as pads

    from documentconvert_ray.pipelines.extract import stage_raw_files

    d, _files = raw_tree
    a = stage_raw_files(str(d), str(tmp_path / "a"))
    b = stage_raw_files(str(d), str(tmp_path / "b"))
    ta = pads.dataset(a).to_table().sort_by("url")
    tb = pads.dataset(b).to_table().sort_by("url")
    assert ta.equals(tb)
