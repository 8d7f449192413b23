"""One-time golden-fixture generation (FIXTURES.md §5).

Runs the frozen extraction core SINGLE-THREADED (no Ray) over the
deterministic smoke corpus and freezes expected outputs. Thereafter
`python -m pytest -x -q` requires the full Ray pipeline to be
byte-identical per url at any parallelism — the same role MinerU's
middle_json → Markdown chain plays for the reference (SURVEY.md §5).

Usage: python tools/gen_fixtures.py  (idempotent; rewrites fixtures)
"""

from __future__ import annotations

import hashlib
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from documentconvert_ray.config import DEFAULT_CONFIG
from documentconvert_ray.functions.html_extract import extract_html
from documentconvert_ray.functions.pdf_extract import extract_pdf
from documentconvert_ray.functions.sniff import (
    DOC_HTML,
    DOC_OFFICE,
    DOC_PDF,
    GZIP_MAGIC,
    gunzip_payload,
    sniff_doc_type,
)
from documentconvert_ray.sources.corpus import write_corpus
from documentconvert_ray.stages.extract import IMAGE_TYPE, SPAN_TYPE

FIXTURE_DIR = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
# 1500 = smallest corpus in which every classification class AND every
# office family appears (encrypted_pdf, legacy-OLE2 ok + unsupported,
# OOXML, ODF odt/ods/odp — ods first at doc 1383 — RTF, truncations)
N_ROWS = 1500


def main() -> None:
    corpus_dir = os.path.join(FIXTURE_DIR, "corpus")
    write_corpus(corpus_dir, N_ROWS, rows_per_file=50)

    rows = []
    for f in sorted(os.listdir(corpus_dir)):
        t = pq.read_table(os.path.join(corpus_dir, f))
        for url, payload in zip(t.column("url").to_pylist(),
                                t.column("html").to_pylist()):
            payload = payload or b""
            if payload[:2] == GZIP_MAGIC:
                # transport unwrap, mirroring SniffAndExtractHtml
                # (the corpus generator never emits corrupt gzip)
                payload, _ = gunzip_payload(payload)
                assert payload is not None
            dt = sniff_doc_type(payload)
            if dt == DOC_HTML:
                res = extract_html(payload, DEFAULT_CONFIG)
            elif dt == DOC_PDF:
                res = extract_pdf(payload, DEFAULT_CONFIG)
            elif dt == DOC_OFFICE:
                if payload.startswith(b"\xd0\xcf\x11\xe0"):
                    from documentconvert_ray.functions.doc_extract import (
                        extract_ole2,
                    )
                    res = extract_ole2(payload, DEFAULT_CONFIG)
                elif payload.startswith(b"{\\rtf"):
                    from documentconvert_ray.functions.rtf_extract import (
                        extract_rtf,
                    )
                    res = extract_rtf(payload, DEFAULT_CONFIG)
                else:
                    from documentconvert_ray.functions.office_extract import (
                        extract_docx,
                    )
                    res = extract_docx(payload, DEFAULT_CONFIG)
            else:
                from documentconvert_ray.functions.html_extract import ExtractResult
                res = ExtractResult(False, "", [], "unsupported",
                                    "unsupported payload (not html/pdf)")
            rows.append(
                {
                    "url": url,
                    "doc_type": dt,
                    "ok": res.ok,
                    "error_kind": res.error_kind,
                    "text_md": res.text_md,
                    "spans": res.spans,
                    "images": [{"name": nm, "data": d}
                               for nm, d in getattr(res, "images", ())],
                    "text_sha256": hashlib.sha256(
                        res.text_md.encode()).hexdigest(),
                }
            )

    schema = pa.schema(
        [
            pa.field("url", pa.string()),
            pa.field("doc_type", pa.string()),
            pa.field("ok", pa.bool_()),
            pa.field("error_kind", pa.string()),
            pa.field("text_md", pa.string()),
            pa.field("spans", SPAN_TYPE),
            pa.field("images", IMAGE_TYPE),
            pa.field("text_sha256", pa.string()),
        ]
    )
    expected = pa.Table.from_pylist(rows, schema=schema)
    out = os.path.join(FIXTURE_DIR, "expected.parquet")
    pq.write_table(expected, out)
    with open(os.path.join(FIXTURE_DIR, "digests.csv"), "w") as f:
        f.write("url,text_sha256\n")
        for r in rows:
            f.write(f"{r['url']},{r['text_sha256']}\n")
    print(f"wrote {len(rows)} fixtures → {out}")


if __name__ == "__main__":
    main()
