"""Per-shard lineage manifests: the deterministic replacement for the
reference's mutable task table + crash recovery.

The reference tracks per-task status/retry/timing in a SQL table
(database/models.py:35-89) and recovers after a crash by resetting
`processing` rows to `pending` (enhanced_task_processor.py:196-235)
plus converter-level skip-if-output-exists
(services/document_service.py:210-220). Here the same semantics are
immutable files (SURVEY.md §4.3.4-5):

- output layout: ``out/data/shard=<k>/*.parquet`` — one directory per
  input fragment (the resumable unit);
- ``out/_manifest/shard-<k>.json`` — written atomically (tmp+rename)
  only AFTER the shard's data is fully written, holding lineage
  (input file, row counts, error counts, config fingerprint, engine
  version) and an order-insensitive content digest (sum mod 2^256 of per-row
  sha256(url || text_sha256) — mergeable, partition-order independent,
  and duplicate rows cannot cancel);
- resume = anti-join: shards with a valid manifest for the same
  (input file, config fingerprint) are skipped; shard data dirs
  without a manifest are partial output from a crashed run and are
  deleted before reprocessing.

A shard id is the rank of its input file in the sorted file list —
deterministic across runs for a fixed input set.
"""

from __future__ import annotations

import json
import os
import shutil

from .. import ENGINE_VERSION

MANIFEST_DIR = "_manifest"
DATA_DIR = "data"


def is_uri(path: str) -> bool:
    return "://" in path


def fs_for(path: str):
    """(pyarrow FileSystem, fs-local path) for a path or URI — the
    reference reads/writes S3 via boto3 (s3_download_service.py:102-209,
    s3_upload_service.py); here any pyarrow.fs scheme (s3://, file://,
    …) works uniformly for inputs, shard output and manifests."""
    import pyarrow.fs as pafs

    if is_uri(path):
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), path


def shard_map(input_files: list[str]) -> dict[str, int]:
    """Stable input-file → shard-id assignment (sorted order rank)."""
    return {p: i for i, p in enumerate(sorted(input_files))}


def manifest_path(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, f"shard-{shard:06d}.json")


def shard_data_dir(out_dir: str, shard: int) -> str:
    return os.path.join(out_dir, DATA_DIR, f"shard={shard}")


def write_manifest(out_dir: str, shard: int, payload: dict) -> None:
    """Atomic write. Local: tmp file + fsync + rename (SURVEY.md §7.4
    resume rule). URI outputs (e.g. s3://): one direct object write —
    object stores give per-object atomic PUT, which is the same
    all-or-nothing guarantee the rename provides locally."""
    path = manifest_path(out_dir, shard)
    payload = dict(payload, engine_version=ENGINE_VERSION, shard=shard)
    if is_uri(out_dir):
        fs, p = fs_for(path)
        fs.create_dir(os.path.dirname(p), recursive=True)
        with fs.open_output_stream(p) as f:
            f.write(json.dumps(payload, sort_keys=True).encode())
        return
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def read_manifest(out_dir: str, shard: int) -> dict | None:
    path = manifest_path(out_dir, shard)
    if is_uri(out_dir):
        fs, p = fs_for(path)
        try:
            with fs.open_input_stream(p) as f:
                return json.loads(f.read().decode())
        except (OSError, json.JSONDecodeError):
            return None
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def completed_shards(out_dir: str, shards: dict[str, int],
                     config_fingerprint: str) -> set[int]:
    """Shards whose manifest exists and matches (input file, config).

    The manifest alone is not trusted: a shard with rows > 0 must also
    still have its data directory with at least one parquet file —
    otherwise (data lost/deleted while the manifest survived) the shard
    is reprocessed instead of silently reported complete."""
    done: set[int] = set()
    for path, sid in shards.items():
        m = read_manifest(out_dir, sid)
        if (
            m is None
            or m.get("input_file") != path
            or m.get("config_fingerprint") != config_fingerprint
            or m.get("engine_version") != ENGINE_VERSION
        ):
            continue
        if m.get("rows", 0) > 0 and not _shard_has_data(out_dir, sid):
            continue  # manifest without data → reprocess
        done.add(sid)
    return done


def _shard_has_data(out_dir: str, sid: int) -> bool:
    # either artifact format counts as data (cfg.output_format is part
    # of the fingerprint, so a matching manifest implies the format
    # that produced these files)
    exts = (".parquet", ".jsonl.gz")
    d = shard_data_dir(out_dir, sid)
    if is_uri(out_dir):
        import pyarrow.fs as pafs

        fs, p = fs_for(d)
        try:
            infos = fs.get_file_info(pafs.FileSelector(p, recursive=False))
        except (OSError, FileNotFoundError):
            return False
        return any(i.path.endswith(exts) for i in infos)
    import glob as _glob

    return any(_glob.glob(os.path.join(d, f"*{e}")) for e in exts)


def clean_partial_shards(out_dir: str, shards_to_run: set[int]) -> None:
    """Delete data dirs of shards about to be (re)processed — partial
    output from a crashed run (the redo-from-pending analogue)."""
    for sid in shards_to_run:
        d = shard_data_dir(out_dir, sid)
        if is_uri(out_dir):
            fs, p = fs_for(d)
            try:
                fs.delete_dir(p)
            except (OSError, FileNotFoundError):
                pass
            continue
        if os.path.isdir(d):
            shutil.rmtree(d)


def aggregate_metrics(out_dir: str, shards: dict[str, int]) -> dict:
    """Global job metrics = Σ over shard manifests (SURVEY.md §2.5 A1-A3)."""
    total = {"rows": 0, "ok": 0, "errors": 0, "out_md_bytes": 0,
             "by_error_kind": {}, "shards": 0}
    for sid in sorted(shards.values()):
        m = read_manifest(out_dir, sid)
        if not m:
            continue
        total["shards"] += 1
        total["rows"] += m.get("rows", 0)
        total["ok"] += m.get("ok", 0)
        total["errors"] += m.get("errors", 0)
        total["out_md_bytes"] += m.get("out_md_bytes", 0)
        for k, v in (m.get("by_error_kind") or {}).items():
            total["by_error_kind"][k] = total["by_error_kind"].get(k, 0) + v
    return total
