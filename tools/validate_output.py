"""Validate an extraction output dir against its manifests WITHOUT
reprocessing: recompute each shard's order-insensitive content digest
(XOR of sha256(url || text_sha256)) from the written parquet and
compare to ``_manifest/shard-<k>.json`` — the operational integrity
check the manifests exist for (upload-verify semantics of the
reference, ``services/s3_upload_service.py:169-177``, without a
byte-for-byte re-read of payloads).

Usage: python tools/validate_output.py <out_dir>
Exit 0 = every shard verifies; 1 = mismatch/missing (listed).
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _small_cols(f: str):
    """Yield (url, text_sha256) rows from either artifact format."""
    if f.endswith(".jsonl.gz"):
        import gzip
        import json as _json

        with gzip.open(f, "rt", encoding="utf-8") as fh:
            for line in fh:
                r = _json.loads(line)
                yield r["url"], r["text_sha256"]
        return
    import pyarrow.parquet as pq

    t = pq.read_table(f, columns=["url", "text_sha256"])
    yield from zip(t.column("url").to_pylist(),
                   t.column("text_sha256").to_pylist())


def shard_digest(files: list[str]) -> tuple[int, int]:
    """(row_count, sum-mod-2^256 digest) from the small columns only."""
    digest = 0
    rows = 0
    for f in sorted(files):
        for url, sha in _small_cols(f):
            rows += 1
            h = hashlib.sha256((url + "\x00" + sha).encode()).hexdigest()
            digest = (digest + int(h, 16)) % (1 << 256)
    return rows, digest


def validate(out_dir: str) -> list[str]:
    problems: list[str] = []
    manifests = sorted(glob.glob(os.path.join(out_dir, "_manifest", "*.json")))
    if not manifests:
        return [f"no manifests under {out_dir}"]
    for mp in manifests:
        with open(mp) as f:
            m = json.load(f)
        sid = m["shard"]
        d = os.path.join(out_dir, "data", f"shard={sid}")
        files = (glob.glob(os.path.join(d, "*.parquet"))
                 + glob.glob(os.path.join(d, "*.jsonl.gz")))
        if not files and m.get("rows", 0) > 0:
            problems.append(f"shard {sid}: manifest but no data files")
            continue
        rows, digest = shard_digest(files)
        if rows != m.get("rows"):
            problems.append(
                f"shard {sid}: rows {rows} != manifest {m.get('rows')}"
            )
        if f"{digest:064x}" != m.get("content_digest"):
            problems.append(f"shard {sid}: content digest mismatch")
    # data dirs without a manifest = partial output
    for d in glob.glob(os.path.join(out_dir, "data", "shard=*")):
        sid = int(d.rsplit("=", 1)[1])
        if not os.path.exists(
            os.path.join(out_dir, "_manifest", f"shard-{sid:06d}.json")
        ):
            problems.append(f"shard {sid}: data without manifest (partial)")
    return problems


def main() -> int:
    out_dir = sys.argv[1]
    problems = validate(out_dir)
    if problems:
        for p in problems:
            print(f"[FAIL] {p}")
        return 1
    n = len(glob.glob(os.path.join(out_dir, "_manifest", "*.json")))
    print(f"[OK] {n} shards verify")
    return 0


if __name__ == "__main__":
    sys.exit(main())
