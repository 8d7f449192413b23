"""CLI entry point — ``ray job submit -- python -m documentconvert_ray.run``.

Replaces the reference's FastAPI/uvicorn service boot (main.py:38-79)
with a single batch job per the north_rule ("pure Dataset pipeline
launched via ray job submit").

Usage:
    python -m documentconvert_ray.run --input <dir-or-glob> --output <dir>
        [--no-resume] [--num-cpus N] [--corpus-rows N]

If --corpus-rows is given and the input dir is empty/missing, the
deterministic synthetic corpus is generated there first (test/bench
convenience; real runs point --input at Common-Crawl-style shards).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="documentconvert_ray.run")
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--corpus-rows", type=int, default=None)
    # per-stage execution stats to stderr (SURVEY.md §2.5 A4: the
    # reference's queue-depth snapshot becomes ds.stats())
    ap.add_argument("--stats", action="store_true")
    # input-hygiene prep pass (SURVEY.md §2.7): exact url-dedup the
    # input into a new corpus dir, then point the extract job at it
    ap.add_argument("--dedup-urls-to", metavar="DIR", default=None,
                    help="run the url-dedup prep pass writing a deduped "
                         "corpus copy to DIR, then extract from DIR")
    # raw-document input (the reference's actual mode: a directory/
    # bucket of .pdf/.docx/.html files): stage into corpus-schema
    # parquet shards at --input first, then run the normal job
    ap.add_argument("--stage-raw-from", metavar="SRC", default=None,
                    help="stage raw document files from SRC into corpus "
                         "parquet shards at --input, then extract")
    # crawl-native input: .warc/.warc.gz archive shards
    ap.add_argument("--stage-warc-from", metavar="SRC", default=None,
                    help="stage WARC archive shards from SRC into corpus "
                         "parquet shards at --input, then extract")
    # dump-style input: .jsonl/.jsonl.gz shards (url + payload fields)
    ap.add_argument("--stage-jsonl-from", metavar="SRC", default=None,
                    help="stage JSON-Lines dump shards from SRC into "
                         "corpus parquet shards at --input, then extract")
    # opt-in output transform: scrub emails/phones/IPv4 from the
    # extracted markdown (semantic config — redacted and unredacted
    # runs keep separate resume manifests)
    ap.add_argument("--redact-pii", action="store_true",
                    help="redact emails/phones/IPv4 in extracted text")
    # opt-in quality gate: OK rows below this whitespace-token count
    # become ok=false / error_kind="low_quality" rows (semantic
    # config — gated and ungated runs keep separate resume manifests)
    ap.add_argument("--min-quality-tokens", type=int, default=0,
                    metavar="N",
                    help="drop extracted docs with fewer than N "
                         "tokens (recorded as low_quality rows)")
    # opt-in crawl-hygiene host blocklist (UT1-style; semantic
    # config — blocked and unblocked runs keep separate manifests):
    # one host suffix per line, '#' comments; a url whose host has
    # ANY dot-suffix in the list becomes a blocked_host row before
    # decode/extraction
    ap.add_argument("--block-hosts", metavar="FILE", default=None,
                    help="file of host suffixes to block (one per "
                         "line; subdomains of a listed suffix are "
                         "blocked too)")
    # output serialization (semantic config: jsonl and parquet runs
    # keep separate resume manifests — the artifact bytes differ)
    ap.add_argument("--output-format", choices=("parquet", "jsonl"),
                    default="parquet",
                    help="shard artifact format: columnar parquet "
                         "(default) or gzip'd JSON Lines (training-"
                         "loader friendly; images base64)")
    args = ap.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(
            address="local",
            num_cpus=args.num_cpus,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    try:
        from .config import DEFAULT_CONFIG
        from .pipelines.extract import run_extract_job
        from .sources.corpus import write_corpus

        if args.corpus_rows:
            listing = (os.listdir(args.input)
                       if os.path.isdir(args.input) else [])
            # generate when the dir is empty OR holds only corpus
            # shards (write_corpus is per-shard idempotent, so a
            # partially generated corpus resumes instead of silently
            # passing as complete); a dir of user files is untouched
            if not listing or all(
                f.startswith("corpus-") for f in listing
            ):
                write_corpus(args.input, args.corpus_rows)

        if args.stage_raw_from:
            from .pipelines.extract import stage_raw_files

            if not (os.path.isdir(args.input) and os.listdir(args.input)):
                stage_raw_files(args.stage_raw_from, args.input)

        if args.stage_warc_from:
            from .pipelines.extract import stage_warc_files

            if not (os.path.isdir(args.input) and os.listdir(args.input)):
                stage_warc_files(args.stage_warc_from, args.input)

        if args.stage_jsonl_from:
            from .pipelines.extract import stage_jsonl_files

            if not (os.path.isdir(args.input) and os.listdir(args.input)):
                stage_jsonl_files(args.stage_jsonl_from, args.input)

        input_path = args.input
        if args.dedup_urls_to:
            import ray.data

            from .pipelines.extract import dedup_input_urls, expand_input_files

            files = expand_input_files(args.input)
            ds = ray.data.read_parquet(files)
            dedup_input_urls(ds).write_parquet(args.dedup_urls_to)
            input_path = args.dedup_urls_to

        block_hosts: tuple = ()
        if args.block_hosts:
            with open(args.block_hosts, encoding="utf-8") as f:
                block_hosts = tuple(sorted({
                    ln.strip() for ln in f
                    if ln.strip() and not ln.lstrip().startswith("#")}))

        cfg = DEFAULT_CONFIG
        if (args.redact_pii or args.min_quality_tokens > 0
                or args.output_format != "parquet" or block_hosts):
            import dataclasses

            cfg = dataclasses.replace(
                cfg, redact_pii=args.redact_pii,
                min_quality_tokens=args.min_quality_tokens,
                output_format=args.output_format,
                block_hosts=block_hosts)

        t0 = time.monotonic()
        metrics = run_extract_job(
            input_path, args.output, cfg, resume=not args.no_resume,
            stats_sink=(lambda s: print(s, file=sys.stderr))
            if args.stats else None,
        )
        metrics["wall_sec"] = round(time.monotonic() - t0, 3)
        if metrics["wall_sec"] > 0:
            metrics["docs_per_sec"] = round(
                metrics["rows"] / metrics["wall_sec"], 2
            )
        print(json.dumps(metrics, sort_keys=True))
        return 0
    finally:
        if owns_session:
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
