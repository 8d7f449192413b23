"""URI (pyarrow.fs) input/output support — reference S1-S3 semantics
(s3_download_service.py) expressed through the fs layer. file:// is the
in-sandbox stand-in for any remote scheme (same code path as s3://)."""

import os

from documentconvert_ray.pipelines.extract import (
    expand_input_files,
    run_extract_job,
)
from documentconvert_ray.sources.corpus import write_corpus
from documentconvert_ray.state import manifest as mf


def test_expand_input_files_uri(tmp_path):
    d = tmp_path / "corpus"
    write_corpus(str(d), 60, rows_per_file=20)
    uri = f"file://{d}"
    files = expand_input_files(uri)
    assert len(files) == 3
    assert all(f.startswith("file:///") and f.endswith(".parquet")
               for f in files)
    # single-file URI resolves to itself
    one = files[0]
    assert expand_input_files(one) == [one]
    # missing URI dir → empty, not a crash
    assert expand_input_files(f"file://{tmp_path}/nope") == []


def test_manifest_roundtrip_uri(tmp_path):
    out = f"file://{tmp_path}/out"
    mf.write_manifest(out, 3, {"input_file": "x", "rows": 7,
                               "config_fingerprint": "f"})
    m = mf.read_manifest(out, 3)
    assert m["rows"] == 7 and m["shard"] == 3
    assert mf.read_manifest(out, 4) is None
    # plain-path read sees the same file (file:// is the local fs)
    assert mf.read_manifest(f"{tmp_path}/out", 3)["rows"] == 7


def test_extract_job_over_uris(ray_session, tmp_path):
    d = tmp_path / "corpus"
    write_corpus(str(d), 60, rows_per_file=20)
    in_uri = f"file://{d}"
    out_uri = f"file://{tmp_path}/out"

    m1 = run_extract_job(in_uri, out_uri)
    assert m1["rows"] == 60
    assert m1["processed_shards"] == 3 and m1["resumed_shards"] == 0
    # manifests + data written through the fs layer
    assert len(os.listdir(tmp_path / "out" / "_manifest")) == 3
    assert mf._shard_has_data(out_uri, 0)

    # resume: nothing recomputes, metrics identical
    m2 = run_extract_job(in_uri, out_uri)
    assert m2["processed_shards"] == 0 and m2["resumed_shards"] == 3
    assert m2["rows"] == m1["rows"] and m2["errors"] == m1["errors"]

    # lost data dir with surviving manifest → that shard reprocesses
    import shutil

    shutil.rmtree(tmp_path / "out" / "data" / "shard=1")
    m3 = run_extract_job(in_uri, out_uri)
    assert m3["processed_shards"] == 1 and m3["resumed_shards"] == 2
    assert m3["rows"] == m1["rows"]
