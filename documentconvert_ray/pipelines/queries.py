"""Query registry: every operator/pipeline exposed to the driver.

Each entry returns a callable(sf_dir) → Dataset / pandas / pyarrow
result; ORACLES maps the same names to ANSI SQL that DuckDB runs on the
same parquet tables for the correctness gate. Column names and value
semantics match EXACTLY (integer micro-units for float aggregates so
sums are order-independent; fixed tie-breaks on every top-k).

The 10 queries without an oracle entry are genuinely
non-SQL-expressible (the two approximate IVF paths, the mergeable
quantile sketch whose result is partitioning-dependent, the
HyperLogLog estimate, the iterative float fixpoints k-means /
PageRank / HITS, the integer h-index fixpoint k-core — pinned EQUAL
to brute peeling in pytest — and the BPE merge loop's iterative
string rewriting, both trainer and encoder); those
are covered by the pytest determinism/recall/rank-bound/error-bound/
brute-force-equality suites instead and get the driver's rows-only
check. (Greedy k-center, though iterative, IS oracled — exact integer
distances make its selection deterministic, so the rounds unroll into
a chained-CTE ladder.)
"""

from __future__ import annotations

import os
import re
import zlib

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum

from ..config import DEFAULT_CONFIG
from ..sources.corpus import write_corpus
from ..stages import bloom as bl
from ..stages import dedup as dd
from ..stages import similarity as sim
from ..stages import text as tx
from ..stages.extract import OUTPUT_SCHEMA  # noqa: F401 (re-export for tests)
from ..stages.multimodal import (
    AudioDecodeStage,
    AudioFeatureStage,
    FeatureExtractStage,
    FrameSampleStage,
    ImageDecodeStage,
    ImageResampleStage,
    OcrStage,
)
from .extract import build_extract_ds, expand_input_files

# Synthetic web-corpus size used by the extraction queries at any sf
# (deterministic; cached under /tmp keyed by engine+rows). 1500 is the
# smallest size at which EVERY classification class AND office family
# appears (incl. encrypted_pdf, the legacy-OLE2 ok/unsupported split,
# ODF odt/ods/odp — ods first at doc 1383 — and RTF), so the driver's
# flagship oracle actually exercises each CASE branch.
CORPUS_ROWS = 1500


def _corpus_dir() -> str:
    from .. import ENGINE_VERSION

    d = f"/tmp/documentconvert_ray/corpus-v{ENGINE_VERSION}-{CORPUS_ROWS}"
    marker = os.path.join(d, "_DONE")
    if not os.path.exists(marker):
        write_corpus(d, CORPUS_ROWS, rows_per_file=100)
        with open(marker, "w") as f:
            f.write("ok")
    return d


def _read(sf_dir: str, name: str, columns: list[str] | None = None):
    """Pruned parquet read with a METADATA-FREE schema: the sf tables
    carry a b'pandas' schema blob whose dict payload makes pa.Schema
    unhashable, which defeats Ray Data's block-schema dedup and spams
    'Failed to hash the schemas' warnings in every shuffle (VERDICT
    r2 #5). Passing the stripped schema fixes every query at the
    source; one driver-side footer read, no extra stage.

    `{name}.parquet` may be a single file OR a directory of shard
    files (the 100 TB layout — one read task per shard, so the read
    itself parallelizes; a single fat file is a 1-task serial read
    that gates every downstream stage's ramp)."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    schema_src = path
    if os.path.isdir(path):
        shards = sorted(
            f for f in os.listdir(path) if f.endswith(".parquet"))
        schema_src = os.path.join(path, shards[0])
    full = pq.read_schema(schema_src).remove_metadata()
    if columns is not None:
        schema = pa.schema([full.field(c).remove_metadata() for c in columns])
    else:
        schema = pa.schema([f.remove_metadata() for f in full])
    return ray.data.read_parquet(path, columns=columns, schema=schema)


def _parquet_col_max(sf_dir: str, name: str, col: str) -> int:
    """Column max from parquet ROW-GROUP STATISTICS — footer reads
    only, no data scan (ADVICE r4: q_vocab_growth issued a second
    column scan just for max(doc_id)). Falls back to a pruned
    single-column Dataset scan when any row group lacks min/max
    stats."""
    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, f"{name}.parquet")
    files = [path]
    if os.path.isdir(path):
        files = [os.path.join(path, f) for f in sorted(os.listdir(path))
                 if f.endswith(".parquet")]
    best = None
    try:
        for f in files:
            md = pq.ParquetFile(f).metadata
            ci = md.schema.to_arrow_schema().get_field_index(col)
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(ci).statistics
                if st is None or not st.has_min_max:
                    raise ValueError("missing column statistics")
                v = int(st.max)
                best = v if best is None or v > best else best
    except (ValueError, KeyError, OSError):
        return int(_read(sf_dir, name, [col]).max(col))
    if best is None:
        raise ValueError(f"no row groups in {path}")
    return best


# ---------------------------------------------------------------- helpers


def _micro_int_col(series) -> "np.ndarray":
    """float → integer micro-units, round-half-up (== SQL
    CAST(floor(x*1000000 + 0.5) AS BIGINT))."""
    return np.floor(np.asarray(series, dtype=np.float64) * 1_000_000 + 0.5).astype(
        np.int64
    )


def _cents_col(series) -> "np.ndarray":
    return np.floor(np.asarray(series, dtype=np.float64) * 100 + 0.5).astype(np.int64)


def _knuth32(ids) -> "np.ndarray":
    """(id · 2654435761) mod 2^32, wrap-safe: int64 multiply would
    wrap silently for ids > ~3.4e9 (any multi-billion-row corpus)
    while the SQL side errored — so hash in uint64 and mirror with
    doc_id::HUGEINT in the oracles. Wrap mod 2^64 then mod 2^32 ==
    exact mod 2^32 (2^32 | 2^64), so both sides agree for ALL ids."""
    return (
        (np.asarray(ids).astype(np.uint64) * np.uint64(2654435761))
        % np.uint64(4294967296)
    ).astype(np.int64)


def _crc_bucket_col(tbl: pa.Table, col: str, nb: int) -> pa.Table:
    """Append ``bucket = crc32(str_col) % nb`` — the string-key leg of
    the repo's bucketed-reduce idiom (a native per-key aggregate pays
    per-distinct-key overhead: measured 30× at ≥100k keys, see
    BASELINE.md)."""
    bk = [zlib.crc32(s.encode()) % nb for s in tbl.column(col).to_pylist()]
    return tbl.append_column("bucket", pa.array(bk, pa.int32()))


# ------------------------------------------------------- extraction queries


def q_extract_pipeline(sf_dir: str):
    """Flagship: synth corpus → full extraction. Returns the
    SQL-checkable projection: the corpus generator embeds the payload
    KIND in each url, so a DuckDB oracle over the raw corpus parquet
    independently derives doc_type (sniffer vs ground truth), ok /
    error_kind (html always extracts; a pdf extracts iff its %%EOF
    trailer survives — verified exhaustively in sources/corpus tests;
    office/junk classify as errors) and n_bytes. Byte-level equality
    of text_md itself is the pytest fixture suite's job
    (tests/test_pipeline_e2e.py)."""
    files = expand_input_files(_corpus_dir())
    ds = build_extract_ds(files, DEFAULT_CONFIG)
    return ds.select_columns(
        ["url", "doc_type", "ok", "error_kind", "n_bytes"]
    )


def q_extract_error_stats(sf_dir: str):
    """Error-kind rollup of the extraction run (reference A2 semantics:
    COUNT(*) GROUP BY status — database_manager.py:270-305)."""
    files = expand_input_files(_corpus_dir())
    ds = build_extract_ds(files, DEFAULT_CONFIG)
    return (
        ds.groupby(["doc_type", "ok", "error_kind"])
        .aggregate(Count(alias_name="n_docs"))
    )


def q_domain_stats(sf_dir: str):
    """Per-DOMAIN curation rollup over the web corpus (the
    crawl-hygiene view every CC-scale pipeline needs before sampling:
    which hosts dominate, what payload mix they serve, how many
    bytes). Map-side per-batch combiner — url parse (reference S5
    family, sources/urls.py semantics), payload-kind split, byte
    totals — then a tiny per-domain groupby (domains ≪ docs). Payload
    bytes are length-counted in place and never shuffle."""
    import pandas as pd
    import re as _re

    files = expand_input_files(_corpus_dir())
    ds = ray.data.read_parquet(files, columns=["url", "html"])
    dom_re = _re.compile(r"https://([^/]+)/")
    kind_re = _re.compile(r"/(html|pdf|office|junk)/")

    def partial(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        urls = b.column("url").to_pylist()
        doms = [m.group(1) if (m := dom_re.search(u)) else "" for u in urls]
        kinds = [m.group(1) if (m := kind_re.search(u)) else "" for u in urls]
        nb = pc.binary_length(b.column("html")).to_numpy().astype(np.int64)
        k = pd.Series(kinds)
        df = pd.DataFrame({
            "domain": doms,
            "is_html": (k == "html").to_numpy(np.int64),
            "is_pdf": (k == "pdf").to_numpy(np.int64),
            "is_office": (k == "office").to_numpy(np.int64),
            "n_bytes": nb,
        })
        out = df.groupby("domain", as_index=False).agg(
            n_docs=("n_bytes", "size"), n_html=("is_html", "sum"),
            n_pdf=("is_pdf", "sum"), n_office=("is_office", "sum"),
            sum_bytes=("n_bytes", "sum"))
        # from_pydict, NOT from_pandas: the pandas metadata blob makes
        # pa.Schema unhashable and defeats Ray's block-schema dedup
        return pa.Table.from_pydict({
            "domain": pa.array(out["domain"].tolist(), pa.string()),
            **{c: pa.array(out[c].to_numpy(np.int64), pa.int64())
               for c in ("n_docs", "n_html", "n_pdf", "n_office",
                         "sum_bytes")},
        })

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("domain")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("n_html", alias_name="n_html"),
                   Sum("n_pdf", alias_name="n_pdf"),
                   Sum("n_office", alias_name="n_office"),
                   Sum("sum_bytes", alias_name="sum_bytes"))
    )


# ------------------------------------------------------- documents queries


def q_doc_stats_by_lang(sf_dir: str):
    ds = _read(sf_dir, "documents", ["lang", "n_chars"])
    return ds.groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_chars", alias_name="sum_chars"),
        Min("n_chars", alias_name="min_chars"),
        Max("n_chars", alias_name="max_chars"),
    )


ROLLUP_ALL = "ALL"  # grouping-sets sentinel (no real lang/source is 'ALL')


def q_lang_source_rollup(sf_dir: str):
    """Multi-level ROLLUP aggregate — (lang, source), (lang, ALL) and
    (ALL, ALL) doc counts + char sums in ONE pass (the OLAP cube
    shape): the per-batch combiner emits partial rows for every
    grouping level, so the corpus is read once and the shuffle carries
    ≤ (combos+langs+1) tiny partial rows per batch; a single small
    two-key groupby finishes. The naive alternative — one groupby per
    level — reads and shuffles the table three times."""
    import pandas as pd

    ds = _read(sf_dir, "documents", ["lang", "source", "n_chars"])

    def partial(df):
        base = df.groupby(["lang", "source"], as_index=False).agg(
            n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum"))
        by_lang = base.groupby("lang", as_index=False).agg(
            n_docs=("n_docs", "sum"), sum_chars=("sum_chars", "sum"))
        by_lang["source"] = ROLLUP_ALL
        total = pd.DataFrame({
            "lang": [ROLLUP_ALL], "source": [ROLLUP_ALL],
            "n_docs": [base["n_docs"].sum()],
            "sum_chars": [base["sum_chars"].sum()],
        })
        out = pd.concat([base, by_lang, total], ignore_index=True)
        return out.astype({"n_docs": "int64", "sum_chars": "int64"})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["lang", "source"])
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("sum_chars", alias_name="sum_chars"))
    )


def q_token_counts(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(tx.token_stats_batch, batch_format="pyarrow")


def q_exact_dedup(sf_dir: str):
    """Exact dedup: content-hash keyed, hash-BUCKETED per-key reduce
    keeping min doc_id (the hash-partition + per-group-first pattern;
    only hashes shuffle, and the reduce is one vectorized pandas
    groupby per bucket — a native per-key aggregate pays
    per-distinct-key overhead, key count = corpus size here)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    nb = dd.derive_buckets(ds.count())

    def keyed(b: pa.Table) -> pa.Table:
        t = tx.md5_batch(b).select(["doc_id", "text_md5"])
        return _crc_bucket_col(t, "text_md5", nb)

    def reduce_bucket(g):
        s = g.groupby("text_md5", as_index=False).agg(
            rep_doc_id=("doc_id", "min"), n_copies=("doc_id", "size"))
        return s.astype({"rep_doc_id": "int64", "n_copies": "int64"})

    return (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


def q_ngram_top20(sf_dir: str):
    """Top-20 unigrams: per-batch partial counts (combiner) →
    word-hash-BUCKETED vectorized sum with a per-bucket partial
    top-20 (each word lives in exactly one bucket, so the global
    top-20 is a subset of the per-bucket top-20s) → final sort over
    ≤ 20·buckets rows, deterministic (n desc, word asc)."""
    ds = _read(sf_dir, "documents", ["text"])
    nb = dd.derive_buckets(ds.count(), rows_per_doc=8)

    def part(b: pa.Table) -> pa.Table:
        return _crc_bucket_col(tx.ngram_partial_counts(b), "word", nb)

    def reduce_top(g):
        s = g.groupby("word", as_index=False).agg(n=("n", "sum"))
        s = s.sort_values(["n", "word"], ascending=[False, True],
                          kind="mergesort").head(20)
        return s.astype({"n": "int64"})

    return (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(reduce_top, batch_format="pandas")
        .sort(["n", "word"], descending=[True, False])
        .limit(20)
    )


def q_ngram_top20_mg(sf_dir: str):
    """Top-20 unigrams via MISRA-GRIES heavy hitters — the web-scale
    twin of ngram_top20. The exact op's shuffle carries every distinct
    word per batch (vocabulary-sized at web scale); here each batch
    emits a ≤ MG_SIZE summary (stages/text.py mg_partial_counts), so
    the exchange is O(batches · MG_SIZE) regardless of vocabulary.
    Summed summaries give per-word LOWER bounds undercounting truth by
    ≤ N/(MG_SIZE+1); the top MG_CANDIDATES by lower bound (a few
    hundred strings — driver take + ray.put broadcast is the right
    size) are then rescored EXACTLY in a second pass, so the final
    top-20 equals the exact operator's whenever the 20th word's true
    count clears the MG error bound — on natural-language frequencies
    (Zipf) that holds by orders of magnitude, and the shared DuckDB
    oracle enforces exact equality every run."""
    ds = _read(sf_dir, "documents", ["text"])
    nb = dd.derive_buckets(ds.count(), rows_per_doc=8)

    def mg_part(b: pa.Table) -> pa.Table:
        return _crc_bucket_col(tx.mg_partial_counts(b), "word", nb)

    def mg_reduce(g):
        s = g.groupby("word", as_index=False).agg(n=("n", "sum"))
        s = s.sort_values(["n", "word"], ascending=[False, True],
                          kind="mergesort").head(tx.MG_CANDIDATES)
        return s.astype({"n": "int64"})

    cand = (
        ds.map_batches(mg_part, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(mg_reduce, batch_format="pandas")
        .sort(["n", "word"], descending=[True, False])
        .limit(tx.MG_CANDIDATES)
    )
    words = frozenset(r["word"] for r in cand.take(tx.MG_CANDIDATES))
    words_ref = ray.put(words)
    rescored = ds.map_batches(
        tx.CandidateCountStage(words_ref), batch_format="pyarrow",
        batch_size=256,
    )
    return (
        rescored.groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "word"], descending=[True, False])
        .limit(20)
    )


def q_lang_id(sf_dir: str):
    """Heuristic language ID (CJK ratio + marker-word voting); the
    DuckDB oracle is generated from the same marker tables."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(
        tx.LangIdStage(), batch_format="pyarrow", batch_size=256,
    )


def q_doc_fingerprints(sf_dir: str):
    """Rolling-hash + SimHash content fingerprints, pure map-side.
    Both hashes are SQL-mirrorable (polynomial window hash recomputed
    via HUGEINT ascii() sums; md5-token simhash), so this carries a
    full DuckDB oracle."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(tx.fingerprint_batch, batch_format="pyarrow")


def q_minhash_dup_pairs(sf_dir: str):
    """MinHash+LSH near-dup pairs with fully DISTRIBUTED exact-Jaccard
    verification (no driver-side pair loop, no whole-corpus broadcast):

    shingle→minhash→band (map_batches, no shuffle)
    → groupby(band bucket): vectorized candidate-pair emission
    → broadcast the candidate doc-id SET (ints, O(candidates));
      re-shingle only those docs in map_batches
    → groupby(doc bucket): attach each pair half's shingle set
      (duplicate pairs from overlapping bands deduped here, inside
      the shuffle that runs anyway)
    → groupby(pair bucket): integer-exact Jaccard ≥ 0.7.

    Only int64 ids/hashes shuffle; shingle sets shuffle only for
    candidate docs (≪ corpus by LSH construction)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()  # parquet metadata, no scan
    n_band_buckets = max(dd.width_floor(),
                         dd.derive_buckets(n_docs, rows_per_doc=16))
    bands = ds.map_batches(
        dd.MinHashStage(n_buckets=n_band_buckets),
        batch_format="pyarrow", batch_size=256,
    )
    # bucketed candidate shuffle: size-derived group count with a
    # cluster-width floor (pair-emission fanout — dedup.width_floor),
    # vectorized per-band pair emission inside (one Python call per
    # band_key was 38 s on 5k docs; this shape is ~2 s)
    n_pair_buckets = max(dd.width_floor(),
                         dd.derive_buckets(n_docs, rows_per_doc=2, floor=16))
    cand = bands.groupby("bucket").map_groups(
        dd.band_bucket_pairs, batch_format="pandas"
    ).materialize()  # small: candidate pairs only (consumed twice)
    empty = pa.Table.from_pydict(
        {"doc_id_a": pa.array([], pa.int64()),
         "doc_id_b": pa.array([], pa.int64()),
         "jaccard_micro": pa.array([], pa.int64())})
    if cand.count() == 0:
        return empty
    cand_ids = frozenset(cand.unique("doc_id_a")) | frozenset(
        cand.unique("doc_id_b"))
    cand_ref = ray.put(cand_ids)
    n_jb = dd.derive_buckets(len(cand_ids), rows_per_doc=1,
                             target=25_000, floor=8)
    sets = ds.map_batches(
        dd.ShingleSetStage(cand_ref, n_jb),
        batch_format="pyarrow", batch_size=256,
    )
    reqs = cand.map_batches(
        lambda b: dd.pair_fetch_requests(b, n_jb), batch_format="pyarrow"
    )
    halves = sets.union(reqs).groupby("jb").map_groups(
        lambda g: dd.attach_shingles(g, n_pair_buckets),
        batch_format="pandas",
    )
    return halves.groupby("pb").map_groups(
        lambda g: dd.pair_shingle_jaccard(g, 700_000), batch_format="pandas"
    )


def q_prefix_jaccard_dups(sf_dir: str):
    """All-pairs set-similarity join via PREFIX FILTERING (the
    SSJoin/PPJoin family — Chaudhuri, Ganti & Kaushik ICDE 2006;
    Xiao et al. WWW 2008) at Jaccard τ = 0.6: EXACT pairs without LSH
    and without full posting lists. Theorem: J(A,B) ≥ τ ⇒ the overlap
    o ≥ ⌈τ·|A|⌉, and the smallest common shingle (under any fixed
    total order) has rank ≤ |A| − o + 1 ≤ |A| − ⌈τ|A|⌉ + 1 in A (all
    o common shingles sit at-or-after it) — symmetrically for B — so
    indexing only each doc's first p = n − ⌈τn⌉ + 1 shingles finds
    every true pair. Plan: prefix posting rows → bucketed pair
    emission with the standard length filter → the SAME distributed
    exact-verify chain as minhash_dup_pairs (candidate-id broadcast,
    shingle-set attach, integer Jaccard). Prefix ORDER (any total
    order is sound): default is the broadcast-free unsigned-hash
    order; PPJoin's df-ascending order (rarest shingles in prefixes ⇒
    smallest posting triangles) is wired behind use_df_order — it wins
    on Zipf web vocabularies with long rare tails, while on the
    synthetic tables' tiny uniform vocabulary its extra df pass buys
    nothing (measured 15.4 s vs 12.1 s at sf0.1; pytest pins the two
    orders result-equal). Third member of the near-dup-join family:
    LSH (probabilistic recall), df-capped full index (T4), prefix
    filter (exact, reduced exchange)."""
    return _prefix_jaccard(sf_dir, use_df_order=False)


def _prefix_jaccard(sf_dir: str, use_df_order: bool):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()
    n_buckets = max(dd.width_floor(),
                    dd.derive_buckets(n_docs, rows_per_doc=50))
    n_pair_buckets = max(dd.width_floor(),
                         dd.derive_buckets(n_docs, rows_per_doc=8, floor=16))
    df_ref = None
    if use_df_order:
        dfs = (
            ds.map_batches(dd.shingle_df_partials,
                           batch_format="pyarrow", batch_size=256)
            .groupby("sh")
            .aggregate(Sum("df", alias_name="df"))
        )
        if dfs.count() <= TFIDF_BCAST_MAX_VOCAB:
            dpd = dfs.to_pandas().sort_values("sh", kind="mergesort")
            df_ref = ray.put((dpd["sh"].to_numpy(np.int64),
                              dpd["df"].to_numpy(np.int64)))
    rows = ds.map_batches(
        lambda b: dd.prefix_posting_rows(b, n_buckets, df_ref=df_ref),
        batch_format="pyarrow", batch_size=256,
    )
    cand = rows.groupby("bucket").map_groups(
        dd.prefix_partition_pairs, batch_format="pyarrow",
    ).materialize()  # small: length-filtered candidate pairs
    empty = pa.Table.from_pydict(
        {"doc_id_a": pa.array([], pa.int64()),
         "doc_id_b": pa.array([], pa.int64()),
         "jaccard_micro": pa.array([], pa.int64())})
    if cand.count() == 0:
        return empty
    cand_ids = frozenset(cand.unique("doc_id_a")) | frozenset(
        cand.unique("doc_id_b"))
    cand_ref = ray.put(cand_ids)
    n_jb = dd.derive_buckets(len(cand_ids), rows_per_doc=1,
                             target=25_000, floor=8)
    sets = ds.map_batches(
        dd.ShingleSetStage(cand_ref, n_jb),
        batch_format="pyarrow", batch_size=256,
    )
    reqs = cand.map_batches(
        lambda b: dd.pair_fetch_requests(b, n_jb), batch_format="pyarrow"
    )
    halves = sets.union(reqs).groupby("jb").map_groups(
        lambda g: dd.attach_shingles(g, n_pair_buckets),
        batch_format="pandas",
    )
    return halves.groupby("pb").map_groups(
        lambda g: dd.pair_shingle_jaccard(g, 600_000), batch_format="pandas"
    )


# Above this many verified pairs the driver union-find stops being
# "small" (the bounded-duplication-rate assumption) and clustering
# switches to distributed min-label propagation. Env-overridable so
# tests can force the distributed path on tiny data.
CC_DRIVER_MAX_PAIRS = 2_000_000


def q_near_dup_clusters(sf_dir: str):
    """Near-dup CLUSTERING: connected components over the verified
    MinHash pair set, each doc labeled with its component's min doc_id
    (the canonical representative a dedup keep-list keeps). Emits one
    (doc_id, rep_doc_id) row per clustered doc, rep rows included.

    Scale shape: the pair set is the output of the LSH+verify
    pipeline — candidates ≪ corpus by construction (the same bounded
    assumption as the url-dedup winner table, pipelines/extract.py),
    so up to CC_DRIVER_MAX_PAIRS the union-find folds the SMALL pair
    list on the driver and the corpus itself never materializes.
    Above the bound, _cc_distributed takes over: iterative min-label
    propagation to fixpoint (stages/dedup.cc_*) — identical labels,
    O(component diameter) bucketed shuffles, nothing on the driver
    but a per-round convergence scalar."""
    pairs = q_minhash_dup_pairs(sf_dir)
    if not isinstance(pairs, pa.Table):  # Dataset (non-empty corpus)
        pairs = pairs.materialize()  # small; consumed twice below
        limit = int(os.environ.get("CC_DRIVER_MAX_PAIRS",
                                   CC_DRIVER_MAX_PAIRS))
        if pairs.count() > limit:
            return _cc_distributed(pairs)
    pdf = pairs.to_pandas() if hasattr(pairs, "to_pandas") else pairs
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pdf["doc_id_a"], pdf["doc_id_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:  # union by min id → rep IS the component min
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    docs = sorted(set(map(int, pdf["doc_id_a"]))
                  | set(map(int, pdf["doc_id_b"])))
    return pa.Table.from_pydict(
        {"doc_id": pa.array(docs, pa.int64()),
         "rep_doc_id": pa.array([find(d) for d in docs], pa.int64())})


def _cc_distributed(pairs):
    """Connected components over a (doc_id_a, doc_id_b) pair Dataset by
    distributed min-label propagation (see stages/dedup.py for the
    algorithm notes). Per round: bucketed label→edge join, then a
    bucketed reduce that takes the per-node min AND counts exactly how
    many labels changed (each node's pre-round label rides along on
    its self-loop messages — see cc_propagate for why a sum-of-labels
    probe is NOT sound at scale); changed == 0 is the fixpoint.
    Labels materialize each round — one int64 row per clustered doc —
    to cut the recursive lineage; the edge set materializes once."""
    n_pairs = pairs.count()
    n_buckets = dd.derive_buckets(n_pairs, rows_per_doc=4, floor=8)
    edges = pairs.map_batches(
        lambda b: dd.cc_edge_rows(b, n_buckets), batch_format="pyarrow"
    ).materialize()
    # round 0 folded into init: label(v) = min(v, neighbors(v))
    labels = edges.groupby("src").aggregate(
        Min("dst", alias_name="lab")).materialize()
    # propagation moves the component minimum one hop per round, so
    # rounds needed == max component diameter. LSH components are
    # band-clique unions (tiny diameters), but a drift CHAIN of
    # near-dups can be long — so cap generously and REFUSE to return
    # silently-unconverged labels if the cap ever hits.
    max_rounds = 256
    converged = False
    for _ in range(max_rounds):
        lab_rows = labels.map_batches(
            lambda b: dd.cc_label_rows(b, n_buckets),
            batch_format="pyarrow",
        )
        msgs = edges.union(lab_rows).groupby("eb").map_groups(
            lambda g: dd.cc_propagate(g, n_buckets), batch_format="pandas"
        )
        red = msgs.groupby("nb").map_groups(
            dd.cc_reduce, batch_format="pandas"
        ).materialize()
        labels = red.drop_columns(["changed"])
        if red.sum("changed") == 0:  # exact fixpoint probe
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"near-dup clustering did not converge in {max_rounds} "
            "rounds (component diameter exceeds the cap); refusing to "
            "return partial labels")
    return labels.map_batches(
        lambda b: b.select(["node", "lab"]).rename_columns(
            ["doc_id", "rep_doc_id"]),
        batch_format="pyarrow",
    )


SIMHASH_MAX_HAMMING = 3  # verify threshold, shared with the oracle


def q_simhash_near_dups(sf_dir: str):
    """SimHash banding near-dup pairs (hamming ≤ 3). Verification is
    one vectorized map_batches over the carried sh_a/sh_b columns
    (numpy XOR+popcount) + a bucketed pair-dedup groupby; nothing ever
    leaves the cluster. Fully DuckDB-oracled: the per-token hash is
    md5_number_upper (textstats.simhash64), so hash → bit votes →
    16-bit band keys → MAX_BUCKET cap → hamming all mirror in SQL."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()
    # width floor: pair-emission fanout per group can dwarf the input-
    # row estimate (see dedup.width_floor) — keep every core busy in
    # the candidate/dedup stages
    wf = dd.width_floor()
    nb = max(wf, dd.derive_buckets(n_docs, rows_per_doc=4))
    npb = max(wf, dd.derive_buckets(n_docs, rows_per_doc=2, floor=16))
    bands = ds.map_batches(
        dd.SimHashStage(n_buckets=nb),
        batch_format="pyarrow", batch_size=256,
    )
    verified = (
        bands.groupby("bucket")
        .map_groups(dd.band_bucket_pairs, batch_format="pandas")
        .map_batches(
            lambda b: dd.hamming_filter_pairs(b, SIMHASH_MAX_HAMMING, npb),
            batch_format="pyarrow")
    )
    return verified.groupby("pair_bucket").map_groups(
        dd.dedup_pairs, batch_format="pandas"
    )


def q_ngram_jaccard_dups(sf_dir: str):
    """Exact n-gram Jaccard near-dup via inverted index (stages/dedup.py
    shingle_rows → per-shingle pairs → pair-count groupby). Integer
    micro-unit Jaccard, τ=0.6; hot shingles df>500 pruned on BOTH sides
    (scalability guard mirrored in the oracle's HAVING)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()
    # size-derived shuffle granularity (≈120 posting rows per doc),
    # width-floored for pair-emission fanout (dedup.width_floor)
    n_buckets = max(dd.width_floor(),
                    dd.derive_buckets(n_docs, rows_per_doc=120))
    n_pair_buckets = max(dd.width_floor(),
                         dd.derive_buckets(n_docs, rows_per_doc=8, floor=16))
    rows = ds.map_batches(
        lambda b: dd.shingle_rows(b, n_buckets),
        batch_format="pyarrow", batch_size=256,
    )
    # explicit hash bucketing: the shuffle has only n_buckets groups
    # (vs one per shingle), and pair emission is vectorized within
    # each bucket (beats a per-shingle map_groups ~30×)
    pairs = rows.groupby("bucket").map_groups(
        lambda g: dd.shingle_partition_pairs(g, n_pair_buckets),
        batch_format="pyarrow",
    )
    # second bucketed shuffle: combine per-shingle pair hits into
    # per-pair co-occurrence counts and the final thresholded Jaccard
    # (a generic multi-key Ray Aggregate here measured 150+ cpu-s on
    # 5k docs; the bucketed pandas combine is ~1 s)
    return pairs.groupby("pair_bucket").map_groups(
        lambda g: dd.pair_bucket_jaccard(g, 600_000), batch_format="pandas"
    )


def q_containment_dups(sf_dir: str):
    """Shingle-CONTAINMENT near-dup pairs (Broder 1997's asymmetric
    twin of q_ngram_jaccard_dups): containment = |A∩B| / min(|A|,|B|)
    ≥ 0.7 catches a short doc quoted inside a long one, which
    symmetric Jaccard structurally misses. Identical inverted-index
    plan (same posting/pair exchanges, stages/dedup.py); only the
    final per-pair formula differs — the denominator is the smaller
    shingle set instead of the union."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()
    n_buckets = max(dd.width_floor(),
                    dd.derive_buckets(n_docs, rows_per_doc=120))
    n_pair_buckets = max(dd.width_floor(),
                         dd.derive_buckets(n_docs, rows_per_doc=8, floor=16))
    rows = ds.map_batches(
        lambda b: dd.shingle_rows(b, n_buckets),
        batch_format="pyarrow", batch_size=256,
    )
    pairs = rows.groupby("bucket").map_groups(
        lambda g: dd.shingle_partition_pairs(g, n_pair_buckets),
        batch_format="pyarrow",
    )
    return pairs.groupby("pair_bucket").map_groups(
        lambda g: dd.pair_bucket_containment(g, 700_000),
        batch_format="pandas",
    )


# Above this corpus size the exact O(N²) broadcast sweep stops being a
# sane registry entry (the broadcast matrix alone is N·d·8 bytes on
# every node); the IVF-bucketed path takes over (VERDICT r2 #1).
EXACT_SWEEP_MAX_VECS = 1_000_000


def q_embedding_near_dups(sf_dir: str):
    """Embedding-cosine near-dup pairs (cos ≥ 0.4): broadcast-matrix
    blocked exact sweep (stages/similarity.py CosinePairsPartial);
    τ tuned to the synthetic tables (max pairwise cos ≈ 0.51).

    Size-gated: the exact sweep is the oracle baseline and only runs
    when the corpus fits a sane broadcast (≤ EXACT_SWEEP_MAX_VECS);
    past that the query routes to the IVF-bucketed scale path — same
    output schema, approximate recall (documented in the IVF twin).
    The registered exact-SQL oracle therefore holds on every corpus
    the gate can actually run (the driver checks at sf scale, far
    below the bound); beyond the bound the entry deliberately trades
    oracle-exactness for not broadcasting an N·d matrix to every
    node — callers needing guaranteed-exact pairs at that size should
    invoke the sweep explicitly."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    if ds.count() > EXACT_SWEEP_MAX_VECS:
        return q_embedding_near_dups_ivf(sf_dir)
    path = os.path.join(sf_dir, "embeddings.parquet")
    cref = ray.put(sim.load_corpus_matrix(path))
    return ds.map_batches(
        sim.CosinePairsPartial(cref, 0.4),
        batch_format="pyarrow",
        batch_size=512,
    )


def q_hash_sample(sf_dir: str):
    """Deterministic hash sampling (training-data subset selection):
    keep rows whose multiplicative doc_id hash lands under the rate.
    Pure map-side filter — no shuffle, no RNG, reproducible across
    runs/partitionings; the SQL oracle computes the same formula."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def flt(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()  # zero-copy int64
        keep = _knuth32(ids) % 100 < 7
        return batch.filter(pa.array(keep))

    return ds.map_batches(flt, batch_format="pyarrow")


TRAIN_SHARDS = 16  # oracle-mirrored; production derives from corpus
                   # size (dd.derive_buckets) so shards match blocks


def q_training_shuffle(sf_dir: str):
    """Deterministic global training shuffle (the final prep step
    before tokenization: every epoch reader wants the corpus in a
    reproducible pseudorandom order, sharded for parallel loading).
    Each doc gets a multiplicative-hash key (bijective mod 2^32 —
    collision-free ordering for any sub-4B-doc shard), shard = key mod
    TRAIN_SHARDS, pos = rank within the shard by (key, doc_id).

    Scale shape: key+shard are map-side; the ONLY exchange is the
    shard hash-partition every training-output write needs anyway;
    within-shard rank is one vectorized argsort per shard group
    (shards sized to blocks in production via derive_buckets — fixed
    here so the SQL oracle can mirror the constant)."""
    import pandas as pd

    ds = _read(sf_dir, "documents", ["doc_id"])

    def keyed(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        k = _knuth32(ids)
        return pa.Table.from_pydict({
            "doc_id": b.column("doc_id"),
            "k": pa.array(k, pa.int64()),
            "shard": pa.array(k % TRAIN_SHARDS, pa.int64()),
        })

    def rank(df):
        df = df.sort_values(["k", "doc_id"],
                            kind="mergesort").reset_index(drop=True)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "shard": df["shard"].to_numpy(np.int64),
            "pos": np.arange(len(df), dtype=np.int64),
        })

    return (ds.map_batches(keyed, batch_format="pyarrow")
            .groupby("shard").map_groups(rank, batch_format="pandas"))


# Per-language keep percentages for the stratified sample (corpus
# rebalancing: downweight the dominant language, keep more of the
# tail). The SQL oracle's CASE table is generated from this dict —
# one source of truth.
STRATA_PCT = {"en": 10, "zh": 25, "de": 50, "es": 50, "fr": 50}
STRATA_DEFAULT_PCT = 75


def q_stratified_sample(sf_dir: str):
    """Stratified deterministic sampling (per-group rates — the corpus
    rebalancing shape): each language stratum keeps a different
    fraction, decided by the same multiplicative doc_id hash as
    q_hash_sample. Pure map-side filter — the rate table is a tiny
    per-task constant, no RNG, no shuffle; the kept set is identical
    under any partitioning. SQL oracle inlines the identical CASE
    table and hash formula."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def flt(df):
        rates = (
            df["lang"].map(STRATA_PCT).fillna(STRATA_DEFAULT_PCT)
            .to_numpy(np.int64)
        )
        ids = df["doc_id"].to_numpy(np.int64)
        keep = _knuth32(ids) % 100 < rates
        return df[keep]

    return ds.map_batches(flt, batch_format="pandas")


TFIDF_TOPK = 3
# a term present in > 9/10 of all docs is "hot": excluded from scoring
# (near-zero idf) and from the exchange (hot-key skew removal)
TFIDF_HOT_NUM, TFIDF_HOT_DEN = 9, 10
# vocabulary ≤ this many terms → broadcast the (term → rarity) map and
# score map-side instead of a token-level hash join (~tens of MB at
# the gate; the join path stays for open web-scale vocabularies)
TFIDF_BCAST_MAX_VOCAB = 2_000_000


def q_tfidf_top_terms(sf_dir: str):
    """Distributed TF-IDF-style term scoring — the per-document top-3
    most characteristic terms. The idf weight is an exact rational,
    ``rarity = (N · 10^6) // df``, instead of ln(N/df): monotone in the
    same direction, but bit-deterministic in both numpy and SQL (no
    libm ulp hazard in the oracle compare).

    Shape (two passes over text + one term-key exchange):
      1. df combiner: per-batch distinct-term doc counts → vocabulary
         groupby (shuffles ≤ one row per (batch, term)). The aggregate
         is materialized ONCE — it is vocabulary-sized, orders of
         magnitude under the corpus — and feeds both branches below
         without recomputing the text pass.
      2. Hot-term split: terms in > 9/10 of the docs get near-zero
         idf and are EXCLUDED by definition (mirrored in the oracle's
         HAVING). By Zipf that set is a handful of stopwords → it is
         the broadcast small side, and filtering the probe rows
         map-side against it removes the join's hot-key skew: no
         partition ever receives a stopword's token rows.
      3. (doc_id, term, tf) rows join the (term, rarity) build side on
         a native hash join; per-doc top-3 runs as a per-batch partial
         top-k combiner before the final per-doc reduce."""
    import pandas as pd

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = docs.count()

    # BUCKETED vocabulary reduce (term-hash buckets + one vectorized
    # pandas sum per bucket) — a native per-term aggregate pays
    # per-distinct-key overhead (measured 30× on 100k+ keys)
    n_vb = dd.derive_buckets(n_docs, rows_per_doc=8)

    def vocab_reduce(g):
        return g.groupby("term", as_index=False).agg(df=("nd", "sum"))

    def df_bucketize(b: pa.Table) -> pa.Table:
        return _crc_bucket_col(tx.df_partial_counts(b), "term", n_vb)

    df_tbl = (
        docs.map_batches(df_bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(vocab_reduce, batch_format="pandas")
        .materialize()
    )

    def build_side(b: pa.Table) -> pa.Table:
        dfv = b.column("df").to_numpy()
        keep = dfv * TFIDF_HOT_DEN <= TFIDF_HOT_NUM * n_docs
        t = b.filter(pa.array(keep))
        rarity = (n_docs * 1_000_000) // t.column("df").to_numpy()
        return pa.Table.from_pydict(
            {"term_r": t.column("term"),
             "rarity": pa.array(rarity, pa.int64())})

    def hot_terms(b: pa.Table) -> pa.Table:
        hot = b.column("df").to_numpy() * TFIDF_HOT_DEN > TFIDF_HOT_NUM * n_docs
        return b.filter(pa.array(hot)).select(["term"])

    n_vocab = df_tbl.count()
    n_db = dd.derive_buckets(n_docs)

    if n_vocab <= TFIDF_BCAST_MAX_VOCAB:
        # SMALL-VOCABULARY fast path (size-gated, the
        # embedding_near_dups precedent): the whole (term → rarity)
        # map broadcasts once — hot terms simply absent — and scoring
        # is a map-side pandas .map; no token-level hash join, no
        # join-actor ramp. The gate keeps the broadcast ≪ worker heap;
        # a web-scale open vocabulary takes the join path below.
        rar_tbl = (df_tbl.map_batches(build_side, batch_format="pyarrow")
                   .to_pandas())
        rar_ref = ray.put(dict(zip(rar_tbl["term_r"], rar_tbl["rarity"])))

        def score_map_side(b: pa.Table):
            import pandas as pd

            rar = sim.resolve_broadcast(rar_ref, key="tfidf-rarity")
            t = tx.tf_rows_batch(b)
            df = t.to_pandas()
            df["rarity"] = df["term"].map(rar)
            df = df[df["rarity"].notna()]
            df["rarity"] = df["rarity"].astype(np.int64)
            return df

        joined = docs.map_batches(score_map_side, batch_format="pyarrow")
    else:
        # repartition to guaranteed-NONEMPTY blocks: Ray's hash-shuffle
        # join emits no shard for an empty input block, so a join
        # partition whose build rows all hashed elsewhere would
        # otherwise arrive schema-less and crash pyarrow's join ("No
        # match for key field term_r"). Block count is size-derived
        # from the vocabulary (kept terms ≫ block count by the Zipf
        # hot-set bound).
        build = df_tbl.map_batches(
            build_side, batch_format="pyarrow").repartition(
            max(1, min(64, -(-n_vocab // 50_000))))
        hot = frozenset(
            r["term"]
            for r in df_tbl.map_batches(hot_terms,
                                        batch_format="pyarrow").take_all()
        )
        hot_ref = ray.put(hot)

        def probe_rows(b: pa.Table) -> pa.Table:
            hs = sim.resolve_broadcast(hot_ref, key="tfidf-hot")
            t = tx.tf_rows_batch(b)
            if hs:
                mask = [w not in hs for w in t.column("term").to_pylist()]
                t = t.filter(pa.array(mask))
            return t

        probe = docs.map_batches(probe_rows, batch_format="pyarrow")
        cpus = int(ray.cluster_resources().get("CPU", 8))
        n_part = max(8, min(dd.derive_buckets(n_docs, rows_per_doc=64),
                            cpus // 2))
        joined = probe.join(
            build, "inner", n_part, on=("term",), right_on=("term_r",),
            aggregator_ray_remote_args=_join_remote_args(n_part),
        )

    def partial_top(df):
        score = df["tf"].to_numpy(np.int64) * df["rarity"].to_numpy(np.int64)
        df = df.assign(score_micro=score)
        out = (
            df.sort_values(["doc_id", "score_micro", "term"],
                           ascending=[True, False, True], kind="mergesort")
            .groupby("doc_id", sort=False).head(TFIDF_TOPK)
        )[["doc_id", "term", "tf", "score_micro"]]
        return out.assign(bucket=(out["doc_id"].to_numpy(np.int64)
                                  % n_db).astype("int32"))

    def final_top(g):
        # one vectorized sort + cumcount per doc-hash BUCKET (per-doc
        # map_groups would pay a python call per document)
        g = g.sort_values(["doc_id", "score_micro", "term"],
                          ascending=[True, False, True], kind="mergesort")
        gb = g.groupby("doc_id", sort=False)
        g = g.assign(rnk=gb.cumcount().to_numpy(np.int64) + 1)
        g = g[g["rnk"] <= TFIDF_TOPK]
        return g[["doc_id", "rnk", "term", "tf", "score_micro"]]

    return (
        joined.map_batches(partial_top, batch_format="pandas")
        .groupby("bucket")
        .map_groups(final_top, batch_format="pandas")
    )


def q_per_lang_top5(sf_dir: str):
    """Per-group top-k (quota sampling shape): the 5 largest docs per
    lang, deterministic tie-break (n_chars desc, doc_id asc). Per-batch
    partial top-5 per lang (combiner) → tiny per-lang final reduce —
    the shuffle carries ≤ 5·n_blocks rows per lang, never the corpus."""
    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def partial(df):
        return (
            df.sort_values(["lang", "n_chars", "doc_id"],
                           ascending=[True, False, True], kind="mergesort")
            .groupby("lang", sort=False)
            .head(5)
        )

    def final(g):
        g = g.sort_values(["n_chars", "doc_id"],
                          ascending=[False, True], kind="mergesort").head(5)
        g = g.reset_index(drop=True)
        g["rnk"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["lang", "doc_id", "n_chars", "rnk"]]

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .map_groups(final, batch_format="pandas")
    )


SOURCE_CAP_K = 20  # per-source quota (shared with the oracle)


def q_source_cap(sf_dir: str):
    """Per-source quota cap — the Common-Crawl per-domain quota rule
    (no single domain may dominate the training mix): keep the K docs
    per source with the smallest Knuth multiplicative hash (the
    deterministic stand-in for a uniform draw; same constant as
    hash_sample), tie-break doc_id. Per-batch partial min-K per source
    (combiner) → tiny per-source final reduce: the shuffle carries
    ≤ K·n_blocks rows per source, never the corpus — at 10^12 docs the
    exchange is bounded by K × sources × blocks regardless of skew."""
    import pandas as pd  # noqa: F401 (pandas batch format)

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def partial(df):
        df = df.copy()
        df["hkey"] = _knuth32(df["doc_id"].to_numpy(np.int64))
        return (
            df.sort_values(["source", "hkey", "doc_id"], kind="mergesort")
            .groupby("source", sort=False)
            .head(SOURCE_CAP_K)
        )

    def final(g):
        g = g.sort_values(["hkey", "doc_id"], kind="mergesort")
        g = g.head(SOURCE_CAP_K)
        return g[["source", "doc_id"]].reset_index(drop=True)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("source")
        .map_groups(final, batch_format="pandas")
    )


WEIGHTED_CHARS_PER_MILLION = 500  # acceptance reaches 1.0 at 500 chars


def q_weighted_sample(sf_dir: str):
    """Length-WEIGHTED deterministic sampling (importance sampling by
    token mass — the curation move that favors substantive documents
    without an RNG): keep doc iff knuth(doc_id) mod 10⁶ <
    min(10⁶, n_chars·10⁶/500). Integer-exact, pure map-side filter —
    the acceptance test and the probability are both functions of the
    row alone, so membership is partitioning- and scale-independent
    (hash_sample's shape with a per-row weight instead of a flat
    rate)."""
    import pandas as pd

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def keep(df):
        h = _knuth32(df["doc_id"].to_numpy(np.int64))
        thresh = np.minimum(
            1_000_000,
            df["n_chars"].to_numpy(np.int64) * 1_000_000
            // WEIGHTED_CHARS_PER_MILLION,
        )
        return df[(h % 1_000_000) < thresh]

    return ds.map_batches(keep, batch_format="pandas")


def q_corpus_curation(sf_dir: str):
    """Composite training-data curation — the end-to-end shape a real
    pipeline runs, as ONE streaming Dataset chain:

        quality gate (integer token/stopword ratios, map-side)
        → exact dedup (md5 groupby keeping min doc_id)
        → deterministic hash downsample (50%)

    Stays columnar throughout: text is consumed by the first
    map_batches (md5 + token stats computed in one pass) and never
    shuffles; the dedup groupby moves only 32-byte keys + ints."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def stats(batch: pa.Table) -> pa.Table:
        # compose the shared stage kernels (single pass, text dropped):
        # md5_batch supplies the dedup key, token_stats_batch the
        # quality columns — same rows, same order
        keyed = tx.md5_batch(batch)
        ts = tx.token_stats_batch(batch)
        return pa.Table.from_pydict(
            {"doc_id": batch.column("doc_id"),
             "text_md5": keyed.column("text_md5"),
             "n_tokens": ts.column("n_tokens"),
             "n_stop": ts.column("n_stop")})

    def quality(batch: pa.Table) -> pa.Table:
        nt = batch.column("n_tokens").to_numpy()
        ns = batch.column("n_stop").to_numpy()
        return batch.filter(pa.array((nt >= 10) & (ns * 50 >= nt)))

    nb = dd.derive_buckets(ds.count())

    def dedup_reduce(g):
        s = g.groupby("text_md5", as_index=False).agg(
            doc_id=("doc_id", "min"), n_tokens=("n_tokens", "min"))
        return s.astype({"doc_id": "int64", "n_tokens": "int64"})

    deduped = (
        ds.map_batches(stats, batch_format="pyarrow")
        .map_batches(quality, batch_format="pyarrow")
        .map_batches(lambda b: _crc_bucket_col(b, "text_md5", nb),
                     batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(dedup_reduce, batch_format="pandas")
    )

    def sample(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy()
        keep = _knuth32(ids) % 100 < 50
        return pa.Table.from_pydict(
            {"doc_id": batch.column("doc_id").filter(pa.array(keep)),
             "n_tokens": batch.column("n_tokens").filter(pa.array(keep))})

    return deduped.map_batches(sample, batch_format="pyarrow")


def q_embedding_near_dups_ivf(sf_dir: str):
    """The 100 TB path for embedding near-dup: IVF multi-probe
    bucketing (each vector lands in its nprobe=3 nearest-centroid
    buckets) → per-bucket O(B²) cosine sweep → bucketed pair dedup.
    Nothing is broadcast but the centroid matrix; per-bucket work is
    bounded by the centroid count scaling with N. Approximate (pairs
    can straddle all probed buckets) → no SQL oracle; recall vs the
    exact q_embedding_near_dups is asserted in tests."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    n_vecs = ds.count()
    n_cents = max(8, min(4096, n_vecs // 512))
    cents = sim.train_centroids(ds, n_centroids=n_cents, iters=3)
    cref = ray.put(cents)
    n_pb = dd.derive_buckets(n_vecs, rows_per_doc=4, floor=16)
    assigned = ds.map_batches(
        sim.IvfMultiAssign(cref, 3),
        batch_format="pyarrow", batch_size=512,
    )
    pairs = assigned.groupby("bucket").map_groups(
        lambda g: sim.bucket_cosine_pairs(g, 0.4, n_pb),
        batch_format="pandas",
    )
    return pairs.groupby("pair_bucket").map_groups(
        sim.dedup_vec_pairs, batch_format="pandas"
    )


def q_latest_orders(sf_dir: str):
    """Sort/limit (SURVEY.md §2.6 O1: ORDER BY ts DESC + LIMIT):
    100 most recent orders, deterministic (o_orderdate DESC,
    o_orderkey ASC tie-break), price in integer cents.

    Partial top-k shape (VERDICT r2 #3): each batch keeps only its own
    top-100, so the final sort orders ≤ 100·n_blocks rows instead of
    an all-to-all over the whole orders table."""
    ds = _read(
        sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )

    def partial_top(df):
        df = df.assign(
            neg_key=-df["o_orderkey"].to_numpy(dtype=np.int64),
            price_c=_cents_col(df["o_totalprice"]),
        )
        df = df.sort_values(["o_orderdate", "neg_key"],
                            ascending=False, kind="mergesort").head(100)
        return df[["o_orderkey", "o_custkey", "o_orderdate",
                   "neg_key", "price_c"]]

    out = (
        ds.map_batches(partial_top, batch_format="pandas")
        .sort(["o_orderdate", "neg_key"], descending=True)
        .limit(100)
    )
    return out.select_columns(["o_orderkey", "o_custkey", "o_orderdate", "price_c"])


def q_filter_regex(sf_dir: str):
    """Regex row filter (SURVEY.md §2.2 M7 file_pattern analogue):
    vectorized RE2 match inside map_batches, then count by source."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "documents", ["text", "source"])
    pattern = r"(fast|slow) (table|scan)"

    def flt(b: pa.Table) -> pa.Table:
        return b.filter(pc.match_substring_regex(b.column("text"), pattern))

    return (
        ds.map_batches(flt, batch_format="pyarrow")
        .groupby("source")
        .aggregate(Count(alias_name="n_docs"))
    )


def q_quality_scores(sf_dir: str):
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    stats = ds.map_batches(tx.token_stats_batch, batch_format="pyarrow")

    def flags(batch: pa.Table) -> pa.Table:
        nt = batch.column("n_tokens").to_numpy()
        np_ = batch.column("n_punct").to_numpy()  # noqa: F841
        ns = batch.column("n_stop").to_numpy()
        # integer-ratio quality gate: ≥10 tokens and stopwords ≥2% of tokens
        good = (nt >= 10) & (ns * 50 >= nt)
        return batch.append_column("is_quality", pa.array(good, pa.bool_()))

    return stats.map_batches(flags, batch_format="pyarrow")


def q_term_scrub(sf_dir: str):
    """Blocklist redaction (PII-scrub shape): the term blocklist is
    ray.put once and resolved per worker (broadcast small side), the
    scrub itself is a shuffle-free map_batches. See
    stages/text.TermScrubStage for the md5-of-normalized-text
    contract the oracle mirrors."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    block_ref = ray.put(tx.SCRUB_TERMS)
    return ds.map_batches(
        tx.TermScrubStage(block_ref), batch_format="pyarrow",
        batch_size=256,
    )


def q_pii_scrub(sf_dir: str):
    """PII redaction (C4 §2.2 / Dolma-style curation): regex scrub of
    emails / NANP phone numbers / IPv4 addresses with per-kind match
    counts and an md5-of-redacted-text contract the oracle mirrors.
    Shuffle-free map_batches — the 100 TB shape is one streaming pass.
    The sf corpus is PII-free, so a deterministic doc_id-keyed PII
    injection (identical formula on the SQL side, stages/text.py
    ``pii_augment``) makes the redaction kernel do verified work."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(tx.pii_scrub_batch, batch_format="pyarrow")


def q_repetition_stats(sf_dir: str):
    """Gopher-style repetition quality signals (type-token ratio +
    top-bigram mass) — map-side only, integer micro-units."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(tx.repetition_stats_batch, batch_format="pyarrow")


def q_benchmark_contamination(sf_dir: str):
    """Benchmark decontamination: build the benchmark slice's distinct
    8-gram set (small side — real eval suites ≪ corpus), broadcast it,
    then one shuffle-free map_batches flags overlapping corpus docs.
    The gram-set build is itself a Dataset pass (map-side distinct per
    batch + driver union of the SMALL result)."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    gram_rows = ds.map_batches(tx.benchmark_gram_rows,
                               batch_format="pyarrow")
    grams = frozenset(gram_rows.unique("g"))
    grams_ref = ray.put(grams)
    return ds.map_batches(
        tx.ContaminationStage(grams_ref), batch_format="pyarrow",
        batch_size=256,
    )


def _footer_col_max(path: str, col: str):
    """Column max from parquet row-group footer statistics — O(row
    groups) driver-side metadata reads instead of a full column scan.
    Returns None when any row group lacks stats."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    idx = md.schema.to_arrow_schema().get_field_index(col)
    best = None
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or not st.has_min_max:
            return None
        best = st.max if best is None else max(best, st.max)
    return best


def q_sequence_pack(sf_dir: str):
    """GPT-style sequence packing: concatenate all docs' tokens in
    doc_id order, cut into PACK_BLOCK-token training blocks (docs may
    straddle a cut — standard pretraining layout). Emits each doc's
    absolute start token + covered block span.

    Distributed shape = two-phase prefix scan (stages/text.py notes):
    per-doc counts with an ORDER-PRESERVING range key → per-range sums
    (small groupby) → driver exclusive-prefix over one int per range
    (broadcast back) → per-range local cumsum. The only driver-side
    state is n_ranges integers; text never shuffles."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()
    max_id = _footer_col_max(
        os.path.join(sf_dir, "documents.parquet"), "doc_id")
    if max_id is None:
        max_id = ds.max("doc_id")  # stats absent: one pruned scan
    n_ranges = dd.derive_buckets(n_docs, rows_per_doc=1,
                                 target=100_000, floor=16)
    counts = ds.map_batches(
        lambda b: tx.pack_count_rows(b, max_id, n_ranges),
        batch_format="pyarrow",
    ).materialize()  # 3 ints per doc; consumed twice (sums + scan)
    sums = counts.groupby("rb").aggregate(
        Sum("n_tokens", alias_name="tok")).take_all()
    off: dict[int, int] = {}
    acc = 0
    for row in sorted(sums, key=lambda r: r["rb"]):
        off[int(row["rb"])] = acc
        acc += int(row["tok"])
    scan = tx.PackScanStage(ray.put(off))
    return counts.groupby("rb").map_groups(
        lambda g: scan(g), batch_format="pandas")


# ---------------------------------------------------------- events queries


def q_events_hourly(sf_dir: str):
    """Tumbling 1-hour window aggregate (streaming-shaped op expressed
    as window-key groupby; guide §Streaming-shaped workloads)."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def add_window(batch) -> "pa.Table":
        import pandas as pd

        df = batch
        df["hour"] = df["ts"].dt.floor("h")
        df["value_micro"] = _micro_int_col(df["value"])
        # per-batch partial aggregation (combiner before the shuffle)
        g = (
            df.groupby(["event_type", "hour"], as_index=False)
            .agg(n_events=("value_micro", "size"),
                 sum_value_micro=("value_micro", "sum"))
        )
        g["n_events"] = g["n_events"].astype("int64")
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = ds.map_batches(add_window, batch_format="pandas")
    return partials.groupby(["event_type", "hour"]).aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_value_micro", alias_name="sum_value_micro"),
    )


def q_props_json_stats(sf_dir: str):
    """JSON scalar extraction (§2.8 map/json functions): parse the
    props JSON column map-side with stdlib json (general-JSON
    semantics — the oracle's json_extract, not a regex), pull $.k, and
    roll up per event type. The per-batch combiner reduces the
    exchange to ≤ n_types partial rows per batch; payload JSON never
    shuffles."""
    import json

    import pandas as pd

    ds = _read(sf_dir, "events", ["event_type", "props"])

    def partial(df):
        ks = np.fromiter(
            (json.loads(p)["k"] for p in df["props"]),
            dtype=np.int64, count=len(df),
        )
        out = pd.DataFrame({"event_type": df["event_type"], "k": ks})
        g = out.groupby("event_type", as_index=False).agg(
            n_events=("k", "size"), sum_k=("k", "sum"), max_k=("k", "max"))
        return g.astype({"n_events": "int64", "sum_k": "int64",
                         "max_k": "int64"})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("sum_k", alias_name="sum_k"),
                   Max("max_k", alias_name="max_k"))
    )


def q_events_by_dow(sf_dir: str):
    """Day-of-week × type traffic matrix (§2.8 date-function
    coverage). dow follows SQL semantics (Sunday = 0 — pandas counts
    Monday = 0, so the map-side key is (dayofweek+1) mod 7); values
    aggregate in integer micro units. Per-batch combiner → ≤ 7·types
    partial rows per batch into a tiny two-key groupby."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(df):
        out = pd.DataFrame({
            "event_type": df["event_type"],
            "dow": ((df["ts"].dt.dayofweek + 1) % 7).astype("int64"),
            "value_micro": _micro_int_col(df["value"]),
        })
        g = out.groupby(["dow", "event_type"], as_index=False).agg(
            n_events=("value_micro", "size"),
            sum_value_micro=("value_micro", "sum"))
        return g.astype({"n_events": "int64", "sum_value_micro": "int64"})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["dow", "event_type"])
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("sum_value_micro", alias_name="sum_value_micro"))
    )


def q_events_sliding(sf_dir: str):
    """SLIDING window aggregate (1-hour windows hopping every 15 min):
    each event lands in exactly 4 windows — emitted as window-key rows
    by a per-batch combiner (partial counts/sums per (type, window)),
    then a small groupby over partials. Window key is integer epoch
    seconds so the oracle compares exactly (no tz coercion)."""
    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])
    HOP, WIN = 900, 3600
    # distinct (type, window) keys grow with the corpus TIME SPAN
    # (≈ 57k at sf0.1) — squarely in the native aggregate's measured
    # per-key-overhead cliff, so the final reduce is the repo's
    # window-hash BUCKETED idiom (14.2 s native → ~3 s bucketed)
    nb = dd.derive_buckets(ds.count(), rows_per_doc=1)

    def partials(df):
        import pandas as pd

        # pin the unit: pandas may hand us datetime64[us] or [ns]
        epoch_us = df["ts"].astype("datetime64[us]").astype("int64")
        base = epoch_us // (HOP * 1_000_000)
        vm = _micro_int_col(df["value"])
        frames = []
        for k in range(WIN // HOP):
            frames.append(pd.DataFrame(
                {"event_type": df["event_type"],
                 "win_start_s": (base - k) * HOP,
                 "v": vm}))
        out = pd.concat(frames, ignore_index=True)
        g = (out.groupby(["event_type", "win_start_s"], as_index=False)
             .agg(n_events=("v", "size"), sum_value_micro=("v", "sum")))
        g["n_events"] = g["n_events"].astype("int64")
        g["win_start_s"] = g["win_start_s"].astype("int64")
        g["bucket"] = ((g["win_start_s"] // HOP) % nb).astype("int32")
        return g

    def reduce_bucket(g):
        return (g.groupby(["event_type", "win_start_s"], as_index=False)
                .agg(n_events=("n_events", "sum"),
                     sum_value_micro=("sum_value_micro", "sum")))

    return (
        ds.map_batches(partials, batch_format="pandas")
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


def q_value_quantiles(sf_dir: str):
    """Grouped EXACT order statistics (p25/p50/p90 of value per event
    type) — the histogram-combiner shape: per-batch partial counts per
    (type, value_micro) feed a per-type weighted-quantile reduce (the
    cumsum handles duplicate values across batches, so no intermediate
    aggregate pass is needed). Only batch-distinct (type, value) rows
    shuffle, never events; for continuous values at extreme scale use
    q_value_quantiles_sketch (stages/sketch.py) — same answer shape,
    O(batches·S) exchange. Discrete quantile index = ceil(q·N)−1,
    matching DuckDB's quantile_disc exactly."""
    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(df):
        df = df.assign(v=_micro_int_col(df["value"]))
        g = (df.groupby(["event_type", "v"], as_index=False)
             .agg(n=("v", "size")))
        g["n"] = g["n"].astype("int64")
        return g[["event_type", "v", "n"]]

    # ONE shuffle: the per-batch partials go straight into the
    # per-type reduce — the weighted cumsum handles duplicate values
    # across batches, so a second (type, value) aggregate pass would
    # only add an extra all-to-all (measured 19.6 s vs ~3 s at sf0.1)
    hist = ds.map_batches(partial, batch_format="pandas")

    def quantiles(g):
        import pandas as pd

        g = g.sort_values("v", kind="mergesort")
        v = g["v"].to_numpy(dtype=np.int64)
        c = g["n"].to_numpy(dtype=np.int64)
        cum = np.cumsum(c)
        total = int(cum[-1])

        def qd(q_micro: int) -> int:
            # ceil(q*N) - 1 in pure integers (q given in micro-units)
            target = -(-q_micro * total // 1_000_000) - 1
            return int(v[np.searchsorted(cum, target + 1)])

        return pd.DataFrame(
            {"event_type": [g["event_type"].iloc[0]],
             "p25_micro": [qd(250_000)],
             "p50_micro": [qd(500_000)],
             "p90_micro": [qd(900_000)],
             "n_events": [total]})

    return hist.groupby("event_type").map_groups(
        quantiles, batch_format="pandas"
    )


def q_value_quantiles_sketch(sf_dir: str):
    """Grouped APPROXIMATE quantiles via a mergeable sketch
    (stages/sketch.py) — the continuous-value twin of
    q_value_quantiles. Where the exact op shuffles distinct
    (key, value) histogram rows (degenerating to O(rows) when every
    value is unique), this shuffles one ≤SKETCH_SIZE summary row per
    (batch, key): exchange is O(batches · S), independent of row
    count. Two compression levels (per-batch, per-intermediate-bucket)
    bound rank error at ≈ 2/S = ±0.4%; the pytest gate asserts the
    returned values sit within ±2% rank of the request. n_buckets is
    size-derived but CAPPED at 4096 so the final per-key merge holds
    ≤ 4096·S pairs (~32 MB) on any worker; past ~1e6 blocks a third
    merge level (one more jb-groupby of the same compress step)
    extends the hierarchy — same module, documented, not needed below
    that. Rows-only entry: the result is partitioning-dependent by
    construction, so there is no SQL oracle; n_events IS exact
    (weights are preserved exactly) and is asserted in pytest."""
    from ..stages import sketch as sk

    ds = _read(sf_dir, "events", ["event_type", "value"])
    n_buckets = min(4096, dd.derive_buckets(ds.count()))

    def partial(batch: pa.Table) -> pa.Table:
        v = _micro_int_col(batch.column("value").to_numpy())
        t = pa.table({"event_type": batch.column("event_type"),
                      "v": pa.array(v, pa.int64())})
        return sk.sketch_partial(t, n_buckets)

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("jb")
        .map_groups(sk.sketch_merge, batch_format="pandas")
        .groupby("event_type")
        .map_groups(sk.sketch_final, batch_format="pandas")
    )


def q_purchase_attribution(sf_dir: str):
    """AS-OF JOIN (custom operator — Ray Data has no native asof):
    for each 'purchase' event, the same user's most recent 'view'
    event at-or-before its timestamp (classic attribution). Shape is
    the canonical distributed as-of join: project both roles map-side
    from ONE pass over events, co-partition by user-id hash
    (size-derived bucket count), then a per-bucket vectorized sorted
    merge (pandas merge_asof). Only (event_id, ts, user_id, role)
    rows ever shuffle. Deterministic tie-break at equal ts: max
    view_id (views sorted (ts, id) ascending — merge_asof takes the
    last match), mirrored by the oracle's ORDER BY ts DESC, id DESC."""
    import pyarrow.compute as pc

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    n_buckets = dd.derive_buckets(ds.count())

    def project(batch: pa.Table) -> pa.Table:
        et = batch.column("event_type")
        keep = pc.or_(pc.equal(et, "purchase"), pc.equal(et, "view"))
        b = batch.filter(keep)
        uid = b.column("user_id").to_numpy()
        role = pc.equal(b.column("event_type"), "purchase")
        return pa.Table.from_pydict(
            {"bucket": pa.array((uid % n_buckets).astype(np.int32)),
             "user_id": b.column("user_id"),
             "ts": b.column("ts"),
             "event_id": b.column("event_id"),
             "is_purchase": role})

    def asof_bucket(df):
        import pandas as pd

        p = df[df["is_purchase"]].sort_values(
            ["ts", "event_id"], kind="mergesort")
        v = df[~df["is_purchase"]].sort_values(
            ["ts", "event_id"], kind="mergesort")
        if not len(p) or not len(v):
            return pd.DataFrame(
                {"purchase_id": pd.Series(dtype="int64"),
                 "user_id": pd.Series(dtype="int64"),
                 "view_id": pd.Series(dtype="int64")})
        m = pd.merge_asof(
            p[["ts", "user_id", "event_id"]],
            v[["ts", "user_id", "event_id"]].rename(
                columns={"event_id": "view_id"}),
            on="ts", by="user_id", direction="backward",
            allow_exact_matches=True)
        m = m.dropna(subset=["view_id"])
        return pd.DataFrame(
            {"purchase_id": m["event_id"].astype("int64"),
             "user_id": m["user_id"].astype("int64"),
             "view_id": m["view_id"].astype("int64")})

    return (
        ds.map_batches(project, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(asof_bucket, batch_format="pandas")
    )


UNPIVOT_MEASURES = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
UNPIVOT_TOPK = 20


def q_lineitem_unpivot(sf_dir: str):
    """UNPIVOT / melt (wide→long reshaping — the inverse of
    events_daily_pivot): the four lineitem measure columns become
    (measure, value) long rows, keeping the top-20 per measure.
    Scale shape: the melt is purely map-side (numpy column stack, no
    row loop) and each block emits ONLY its per-measure partial
    top-20 — ≤ 20·|measures| rows per block enter the exchange
    regardless of corpus size; the final per-measure reduce sorts a
    ≤ 20·blocks set. Deterministic tie-break (value_micro DESC,
    l_orderkey ASC, l_linenumber ASC) mirrored by the oracle's
    QUALIFY row_number ORDER BY."""
    import pandas as pd

    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber"] + UNPIVOT_MEASURES)

    def melt_top(df):
        ok = df["l_orderkey"].to_numpy(np.int64)
        ln = df["l_linenumber"].to_numpy(np.int64)
        parts = []
        for m in UNPIVOT_MEASURES:
            p = pd.DataFrame(
                {"measure": m, "l_orderkey": ok, "l_linenumber": ln,
                 "value_micro": _micro_int_col(df[m])})
            parts.append(
                p.sort_values(
                    ["value_micro", "l_orderkey", "l_linenumber"],
                    ascending=[False, True, True], kind="mergesort",
                ).head(UNPIVOT_TOPK))
        return pd.concat(parts, ignore_index=True)

    def final_top(g):
        return g.sort_values(
            ["value_micro", "l_orderkey", "l_linenumber"],
            ascending=[False, True, True], kind="mergesort",
        ).head(UNPIVOT_TOPK)

    return (
        ds.map_batches(melt_top, batch_format="pandas")
        .groupby("measure")
        .map_groups(final_top, batch_format="pandas")
    )


def q_asof_last_order(sf_dir: str):
    """CROSS-TABLE AS-OF **LEFT** JOIN (point-in-time enrichment —
    the null-preserving asof shape purchase_attribution's inner
    same-table variant lacks): attach to every event the same user's
    most recent order at-or-before the event timestamp, where the
    order dimension is PARTIAL (even custkeys only — the
    user_customer_outer incomplete-dimension stand-in), so unmatched
    events survive with typed sentinels (COALESCE mirrored in the
    oracle's ASOF LEFT JOIN).

    Shape: both tables project map-side to (bucket, user_id, ts, rid,
    is_order) — 5 fixed-width columns, no payloads — co-partition by
    user-id hash (size-derived bucket count from the BIG side), one
    per-bucket vectorized sorted merge (pandas merge_asof, backward).
    Deterministic tie-break at equal order date: max o_orderkey
    (orders sorted (ts, rid) ascending — merge_asof takes the last
    match), mirrored by the oracle's max() pre-aggregate per
    (custkey, date). Exchange is O(events + orders) fixed-width rows;
    skew bounded by per-user row counts, same contract as
    purchase_attribution."""
    import pandas as pd

    ev = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    n_buckets = dd.derive_buckets(ev.count())

    def ev_project(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").to_numpy()
        return pa.Table.from_pydict(
            {"bucket": pa.array((uid % n_buckets).astype(np.int32)),
             "user_id": b.column("user_id"),
             "ts": b.column("ts"),
             "rid": b.column("event_id"),
             "is_order": pa.array(np.zeros(len(uid), bool))})

    def ord_project(b: pa.Table) -> pa.Table:
        ck = b.column("o_custkey").to_numpy()
        b = b.filter(pa.array(ck % 2 == 0))  # partial dimension
        ck = b.column("o_custkey").to_numpy()
        return pa.Table.from_pydict(
            {"bucket": pa.array((ck % n_buckets).astype(np.int32)),
             "user_id": pa.array(ck.astype(np.int64)),
             "ts": b.column("o_orderdate"),
             "rid": b.column("o_orderkey"),
             "is_order": pa.array(np.ones(len(ck), bool))})

    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(ord_project, batch_format="pyarrow")
    events = ev.map_batches(ev_project, batch_format="pyarrow")

    EPOCH = pd.Timestamp("1970-01-01")

    def asof_bucket(df):
        e = df[~df["is_order"]]
        if not len(e):
            return pd.DataFrame(
                {"event_id": pd.Series(dtype="int64"),
                 "user_id": pd.Series(dtype="int64"),
                 "ts": pd.Series(dtype="datetime64[us]"),
                 "last_orderkey": pd.Series(dtype="int64"),
                 "last_orderdate": pd.Series(dtype="datetime64[us]")})
        o = df[df["is_order"]]
        e = e.sort_values(["ts", "rid"], kind="mergesort")
        if len(o):
            o = o.sort_values(["ts", "rid"], kind="mergesort")
            m = pd.merge_asof(
                e[["ts", "user_id", "rid"]],
                o[["ts", "user_id", "rid"]]
                .rename(columns={"rid": "last_orderkey"})
                .assign(last_orderdate=lambda d: d["ts"]),
                on="ts", by="user_id", direction="backward",
                allow_exact_matches=True)
        else:
            m = e[["ts", "user_id", "rid"]].assign(
                last_orderkey=np.nan, last_orderdate=pd.NaT)
        return pd.DataFrame(
            {"event_id": m["rid"].astype("int64"),
             "user_id": m["user_id"].astype("int64"),
             "ts": m["ts"].astype("datetime64[us]"),
             "last_orderkey": m["last_orderkey"].fillna(-1).astype("int64"),
             "last_orderdate": m["last_orderdate"].fillna(EPOCH)
             .astype("datetime64[us]")})

    return (
        events.union(orders)
        .groupby("bucket")
        .map_groups(asof_bucket, batch_format="pandas")
    )


# band table for the range join: (name, lo, hi) in integer micro-units
# — half-open [lo, hi); tiny side, broadcast not shuffled
VALUE_BANDS = [
    ("p00_tiny", -(10 ** 15), 10_000_000),
    ("p10_small", 10_000_000, 50_000_000),
    ("p50_mid", 50_000_000, 200_000_000),
    ("p80_large", 200_000_000, 500_000_000),
    ("p95_huge", 500_000_000, 10 ** 15),
]


def q_event_value_bands(sf_dir: str):
    """RANGE JOIN (custom operator): classify every event's value into
    a band table on a half-open [lo, hi) interval condition, then roll
    up per (event_type, band). The small side is a constant table —
    the scale-correct shape is broadcast + per-batch np.searchsorted
    (O(log B) per row, no shuffle), NOT an interval-condition shuffle
    join; the only exchange is the tiny partial-rollup groupby."""
    ds = _read(sf_dir, "events", ["event_type", "value"])
    edges = np.asarray([b[1] for b in VALUE_BANDS] + [VALUE_BANDS[-1][2]],
                       dtype=np.int64)
    names = np.asarray([b[0] for b in VALUE_BANDS])

    def partial(df):
        vm = _micro_int_col(df["value"])
        idx = np.searchsorted(edges, vm, side="right") - 1
        idx = np.clip(idx, 0, len(names) - 1)
        out = df.assign(band=names[idx], v=vm)
        g = (out.groupby(["event_type", "band"], as_index=False)
             .agg(n_events=("v", "size"), sum_value_micro=("v", "sum")))
        g["n_events"] = g["n_events"].astype("int64")
        return g

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["event_type", "band"])
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("sum_value_micro", alias_name="sum_value_micro"))
    )


def q_user_sessions(sf_dir: str):
    """Session windows (30-min inactivity gap) per user — the repo's
    bucketed-combine idiom: user_id-hash buckets, then ONE vectorized
    pandas pass per bucket (sort + per-user shift) instead of a python
    map_groups call per user (VERDICT r1 #4: ~ms of Python per key at
    scale)."""
    ds = _read(sf_dir, "events", ["user_id", "ts", "event_id"])
    n_buckets = dd.derive_buckets(ds.count())

    def add_bucket(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").to_numpy()
        return batch.append_column(
            "bucket", pa.array((uid % n_buckets).astype(np.int32))
        )

    def sessions_bucket(df):
        import pandas as pd

        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev = df.groupby("user_id")["ts"].shift()
        new_s = prev.isna() | ((df["ts"] - prev) > pd.Timedelta(minutes=30))
        out = (
            df.assign(_ns=new_s)
            .groupby("user_id", as_index=False)
            .agg(n_sessions=("_ns", "sum"), n_events=("_ns", "size"))
        )
        out["user_id"] = out["user_id"].astype("int64")
        out["n_sessions"] = out["n_sessions"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        return out

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(sessions_bucket, batch_format="pandas")
    )


# -------------------------------------------------------- lineitem queries


def q_pricing_summary(sf_dir: str):
    """TPC-H-Q1-shaped rollup with integer cents/micro sums."""
    ds = _read(
        sf_dir,
        "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
         "l_discount", "l_shipdate"],
    )

    def partial(df):
        import pandas as pd

        df = df[df["l_shipdate"] <= pd.Timestamp("1998-09-02")]
        if len(df) == 0:
            return pd.DataFrame(
                {"l_returnflag": [], "l_linestatus": [], "sum_qty_c": [],
                 "sum_price_c": [], "sum_disc_price_micro": [], "n_rows": []}
            )
        out = pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "l_linestatus": df["l_linestatus"],
                "qty_c": _cents_col(df["l_quantity"]),
                "price_c": _cents_col(df["l_extendedprice"]),
                "disc_price_micro": np.floor(
                    np.asarray(df["l_extendedprice"], dtype=np.float64)
                    * (1.0 - np.asarray(df["l_discount"], dtype=np.float64))
                    * 1_000_000
                    + 0.5
                ).astype(np.int64),
            }
        )
        g = out.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty_c=("qty_c", "sum"),
            sum_price_c=("price_c", "sum"),
            sum_disc_price_micro=("disc_price_micro", "sum"),
            n_rows=("qty_c", "size"),
        )
        g["n_rows"] = g["n_rows"].astype("int64")
        return g

    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty_c", alias_name="sum_qty_c"),
        Sum("sum_price_c", alias_name="sum_price_c"),
        Sum("sum_disc_price_micro", alias_name="sum_disc_price_micro"),
        Sum("n_rows", alias_name="n_rows"),
    )


def q_user_first_last(sf_dir: str):
    """Per-user FIRST and LAST event (argmin/argmax by (ts, event_id))
    plus totals — the mergeable-partial-state shape: each batch
    reduces to ONE row per user it saw (first/last candidates +
    count/sum), and partials merge associatively in the per-user
    reduce, so the exchange carries O(users · batches) summary rows
    while the event payload never shuffles. The reduce runs per
    user-hash BUCKET with vectorized sort + drop_duplicates — a
    per-user map_groups would pay a python call per user."""
    import pandas as pd

    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "value"])
    n_buckets = dd.derive_buckets(ds.count())

    def partial(df):
        df = df.assign(v_micro=_micro_int_col(df["value"]))
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        g = df.groupby("user_id", sort=False)
        out = pd.DataFrame({
            "first_ts": g["ts"].first(),
            "first_event_id": g["event_id"].first(),
            "first_type": g["event_type"].first(),
            "last_ts": g["ts"].last(),
            "last_event_id": g["event_id"].last(),
            "last_type": g["event_type"].last(),
            "n_events": g.size().astype("int64"),
            "sum_value_micro": g["v_micro"].sum(),
        }).reset_index()
        out["bucket"] = (out["user_id"] % n_buckets).astype("int32")
        return out

    def merge(g):
        f = g.sort_values(["user_id", "first_ts", "first_event_id"],
                          kind="mergesort").drop_duplicates(
            "user_id", keep="first")
        l = g.sort_values(["user_id", "last_ts", "last_event_id"],
                          ascending=[True, False, False],
                          kind="mergesort").drop_duplicates(
            "user_id", keep="first")
        tot = g.groupby("user_id", as_index=False).agg(
            n_events=("n_events", "sum"),
            sum_value_micro=("sum_value_micro", "sum"))
        out = tot.merge(
            f[["user_id", "first_ts", "first_event_id", "first_type"]],
            on="user_id").merge(
            l[["user_id", "last_ts", "last_event_id", "last_type"]],
            on="user_id")
        out["user_id"] = out["user_id"].astype("int64")
        out["n_events"] = out["n_events"].astype("int64")
        out["sum_value_micro"] = out["sum_value_micro"].astype("int64")
        out["first_event_id"] = out["first_event_id"].astype("int64")
        out["last_event_id"] = out["last_event_id"].astype("int64")
        return out

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(merge, batch_format="pandas")
    )


def q_event_transitions(sf_dir: str):
    """Per-user event-type TRANSITION counts (the lag-window shape:
    consecutive-event pairs ordered by (ts, event_id) within each
    user) → global (prev_type, next_type) matrix. Events co-partition
    by user-id hash (size-derived buckets; a user's timeline never
    splits), each bucket sorts once and counts its adjacent pairs
    vectorized, and only the tiny per-bucket (prev, next, n) partials
    reach the final groupby."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    n_buckets = dd.derive_buckets(ds.count())

    def bucketize(df):
        df = df.copy()
        df["bucket"] = (df["user_id"] % n_buckets).astype("int32")
        return df

    def count_transitions(g):
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        same_user = g["user_id"].to_numpy()[1:] == g["user_id"].to_numpy()[:-1]
        prev = g["event_type"].to_numpy()[:-1][same_user]
        nxt = g["event_type"].to_numpy()[1:][same_user]
        out = (
            pd.DataFrame({"prev_type": prev, "next_type": nxt})
            .groupby(["prev_type", "next_type"], as_index=False)
            .agg(n=("prev_type", "size"))
        )
        out["n"] = out["n"].astype("int64")
        return out

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(count_transitions, batch_format="pandas")
        .groupby(["prev_type", "next_type"])
        .aggregate(Sum("n", alias_name="n"))
    )


FUNNEL_STEPS = ("view", "click", "purchase")  # ordered, shared w/ oracle


def q_funnel_users(sf_dir: str):
    """Ordered-funnel match (product-analytics sequence op): users
    whose timeline contains view → click → purchase in strict ts
    order, greedy-earliest at each step (ts1 = first view, ts2 = first
    click after ts1, ts3 = first purchase after ts2). Funnel-type rows
    are filtered map-side, co-partitioned by user-id hash (a timeline
    never splits), and each step is one vectorized groupby-min + merge
    per bucket — no self-join, no global sort; the exchange carries
    only funnel-type (user, type, ts) triples."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    n_buckets = dd.derive_buckets(ds.count())
    steps = list(FUNNEL_STEPS)

    def bucketize(df):
        df = df[df["event_type"].isin(steps)].copy()
        df["bucket"] = (df["user_id"] % n_buckets).astype("int32")
        return df

    def match_funnel(g):
        cur = (
            g[g["event_type"] == steps[0]]
            .groupby("user_id", as_index=False)
            .agg(ts1=("ts", "min"))
        )
        for i, step in enumerate(steps[1:], start=2):
            nxt = g[g["event_type"] == step][["user_id", "ts"]].merge(
                cur, on="user_id", how="inner")
            nxt = nxt[nxt["ts"] > nxt[f"ts{i - 1}"]]
            if not len(nxt):
                # empty frame with the BUCKET'S ts dtype (blocks must
                # unify across buckets whatever parquet's ts unit is)
                return pd.DataFrame({
                    "user_id": pd.Series(dtype="int64"),
                    **{f"ts{j}": pd.Series(dtype=g["ts"].dtype)
                       for j in range(1, len(steps) + 1)},
                })
            keep = [c for c in nxt.columns if c != "ts"]
            cur = (
                nxt.groupby(keep, as_index=False)
                .agg(**{f"ts{i}": ("ts", "min")})
            )
        cols = ["user_id"] + [f"ts{j}" for j in range(1, len(steps) + 1)]
        return cur[cols].sort_values("user_id").reset_index(drop=True)

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(match_funnel, batch_format="pandas")
    )


BIG_ORDER_QTY_MICRO = 300_000_000  # HAVING sum(l_quantity) >= 300


def q_big_orders(sf_dir: str):
    """TPC-H-Q18 shape (HAVING on a big rollup, then join back):
    per-batch partial quantity sums (combiner) → BUCKETED per-key
    reduce (key-hash buckets + one vectorized pandas sum per bucket —
    NOT a native per-key aggregate: Ray's sort-based aggregate pays
    per-distinct-key overhead, measured 76 s vs 2.6 s on the 147k
    orderkeys of sf0.1) → HAVING filter leaves a tiny survivor set BY
    CONSTRUCTION → the survivors BROADCAST (the textbook Q18 plan;
    measured 29 s → 9 s vs chaining two native hash joins at sf0.1)
    and both join legs run map-side over orders then customer; final
    deterministic (qty DESC, orderkey ASC) top-100 on the ≤bounded
    driver set. A native hash-join fallback guards the data-dependent
    rarity assumption above 100k survivors."""
    import pandas as pd

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
    n_orders = _read(sf_dir, "orders", ["o_orderkey"]).count()
    nb = dd.derive_buckets(n_orders)

    def partial(df):
        df = df.assign(q_micro=_micro_int_col(df["l_quantity"]))
        out = df.groupby("l_orderkey", as_index=False).agg(
            sum_qty_micro=("q_micro", "sum"))
        out["bucket"] = (out["l_orderkey"] % nb).astype("int32")
        return out

    def reduce_having(g):
        s = g.groupby("l_orderkey", as_index=False).agg(
            sum_qty_micro=("sum_qty_micro", "sum"))
        return s[s["sum_qty_micro"] >= BIG_ORDER_QTY_MICRO]

    survivors = (
        li.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(reduce_having, batch_format="pandas")
        .materialize()  # tiny by the HAVING bound; also lets the
        #                 fallback reuse it without re-scanning lineitem
    )

    # Q18's HAVING makes survivors RARE by construction (sum qty ≥ 300
    # ≈ top fraction of a percent of orders), so the textbook plan is
    # to broadcast them and keep both "joins" map-side; the native
    # hash-join fallback guards the data-dependent assumption. The
    # count decides BEFORE any driver transfer.
    n_surv = survivors.count()
    if n_surv > 100_000:
        cpus = int(ray.cluster_resources().get("CPU", 8))
        n_part = max(8, min(dd.derive_buckets(n_orders), cpus // 2))
        orders = _read(
            sf_dir, "orders",
            ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
        with_orders = orders.join(
            survivors.repartition(max(1, n_surv // 100_000)),
            "inner", n_part,
            on=("o_orderkey",), right_on=("l_orderkey",),
            aggregator_ray_remote_args=_join_remote_args(n_part),
        )
        cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
        joined = cust.join(
            with_orders.repartition(1), "inner", n_part,
            on=("c_custkey",), right_on=("o_custkey",),
            aggregator_ray_remote_args=_join_remote_args(n_part),
        )

        def project(df):
            return pd.DataFrame({
                "c_custkey": df["c_custkey"].to_numpy(np.int64),
                "c_name": df["c_name"],
                "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
                "o_orderdate": df["o_orderdate"],
                "price_c": _cents_col(df["o_totalprice"]),
                "sum_qty_micro": df["sum_qty_micro"].to_numpy(np.int64),
            })

        return (
            joined.map_batches(project, batch_format="pandas")
            .sort(["sum_qty_micro", "o_orderkey"], descending=[True, False])
            .limit(100)
        )

    # Broadcast path: the survivor set ships ONCE as a DataFrame and
    # every probe is a vectorized pandas hash merge — no per-row
    # Python membership tests anywhere.
    surv = survivors.to_pandas()  # ≤ the 100k bound checked above
    surv = surv.rename(columns={"l_orderkey": "o_orderkey"})
    surv_ref = ray.put(surv)

    def attach_orders(df):
        s = sim.resolve_broadcast(surv_ref, key="bigorders-qty")
        m = df.merge(s, on="o_orderkey", how="inner")
        return pd.DataFrame({
            "o_custkey": m["o_custkey"].to_numpy(np.int64),
            "o_orderkey": m["o_orderkey"].to_numpy(np.int64),
            "o_orderdate": m["o_orderdate"],
            "price_c": _cents_col(m["o_totalprice"]),
            "sum_qty_micro": m["sum_qty_micro"].to_numpy(np.int64),
        })

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    wo = orders.map_batches(attach_orders, batch_format="pandas").to_pandas()
    wo_ref = ray.put(wo)  # ≤ survivor-bounded rows (one per big order)

    def attach_cust(df):
        w = sim.resolve_broadcast(wo_ref, key="bigorders-cust")
        m = df.merge(w, left_on="c_custkey", right_on="o_custkey",
                     how="inner")
        return pd.DataFrame({
            "c_custkey": m["c_custkey"].to_numpy(np.int64),
            "c_name": m["c_name"],
            "o_orderkey": m["o_orderkey"].to_numpy(np.int64),
            "o_orderdate": pd.to_datetime(m["o_orderdate"]),
            "price_c": m["price_c"].to_numpy(np.int64),
            "sum_qty_micro": m["sum_qty_micro"].to_numpy(np.int64),
        })

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    out = cust.map_batches(attach_cust, batch_format="pandas").to_pandas()
    out = out.sort_values(["sum_qty_micro", "o_orderkey"],
                          ascending=[False, True],
                          kind="mergesort").head(100).reset_index(drop=True)
    out["o_orderdate"] = pd.to_datetime(out["o_orderdate"])
    return out


def q_length_outliers(sf_dir: str):
    """Two-phase percentile gate (trim docs above the exact global
    p99 of n_chars): phase 1 builds a value HISTOGRAM via a per-batch
    combiner — only distinct (value, count) rows shuffle, bounded by
    the value domain, never the corpus — and the tiny histogram
    reduces to one threshold on the driver (quantile_disc semantics:
    index ceil(0.99·N)−1, as q_value_quantiles). The threshold is a
    plain int broadcast into phase 2's map-side keep/drop counter."""
    import pandas as pd

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])

    def hist(df):
        vc = df["n_chars"].value_counts()
        return pd.DataFrame({"v": vc.index.to_numpy(np.int64),
                             "c": vc.to_numpy(np.int64)})

    # two-level map_batches tree reduce (no sort): per-block partial
    # histograms are value-domain-bounded, so level 1 coalesces block
    # partials and level 2 folds them in one tiny task — the native
    # per-key aggregate pays measured per-key overhead here
    def hist_fold(df):
        return df.groupby("v", as_index=False).agg(c=("c", "sum"))

    h = (
        ds.map_batches(hist, batch_format="pandas")
        .repartition(8)
        .map_batches(hist_fold, batch_format="pandas")
        .repartition(1)
        .map_batches(hist_fold, batch_format="pandas")
        .to_pandas()  # value-domain-sized: tiny
        .sort_values("v")
    )
    n_total = int(h["c"].sum())
    idx = -(-99 * n_total // 100) - 1  # ceil(0.99·N)−1
    thr = int(h["v"].to_numpy()[np.searchsorted(
        h["c"].cumsum().to_numpy(), idx + 1)])

    def counts(df):
        kept = df["n_chars"].to_numpy(np.int64) <= thr
        out = pd.DataFrame({"lang": df["lang"], "kept": kept})
        g = out.groupby("lang", as_index=False).agg(
            n_kept=("kept", "sum"), n_docs=("kept", "size"))
        g["n_kept"] = g["n_kept"].astype("int64")
        g["n_dropped"] = (g["n_docs"] - g["n_kept"]).astype("int64")
        return g[["lang", "n_kept", "n_dropped"]]

    return (
        ds.map_batches(counts, batch_format="pandas")
        .groupby("lang")
        .aggregate(Sum("n_kept", alias_name="n_kept"),
                   Sum("n_dropped", alias_name="n_dropped"))
    )


def q_dup_gram_mass(sf_dir: str):
    """Cross-document duplicated-substring mass (word-5-gram windows)
    — the substring-level dedup signal of Lee et al. 2022
    (arXiv:2107.06499): per doc, the fraction of 5-gram positions
    whose gram also appears in ≥ 1 OTHER document.

    Shape (one gram-key exchange, no broadcast of the dup set; the
    exchange carries 8-byte md5-derived gram HASHES, never gram
    strings — the SQL oracle applies the same md5_number_upper hash so
    both sides share collision semantics exactly; at 64 bits the
    birthday term is ~n²/2⁶⁵ spurious dup-gram keys over n distinct
    grams — negligible below ~10¹⁰ grams, and a documented
    approximation beyond):
      1. gram-df combiner (≤ one (gh, nd) row per (batch, distinct
         gram)) → gh groupby → df ≥ 2 keeps the duplicated grams. At
         web scale this relation is far too large to broadcast — it
         stays distributed and becomes the hash-join build side.
      2. probe rows: per (doc, distinct gram) occurrence counts, plus
         ONE is_tot row per doc (gh=doc_id, n_occ = total positions —
         per-doc keys so the denominators SPREAD instead of
         hot-keying one partition) so a single text pass emits both
         numerator candidates and the denominator.
      3. left-outer native hash join marks duplicated grams; a
         per-batch combiner collapses to one (doc, n_pos, n_dup)
         partial per partition before the per-doc sum.
    Partitioning note: per-gram probe fan-in is bounded by the doc
    count (distinct (doc,gram) rows); a corpus-wide boilerplate gram
    is the residual hot key — the df table itself stays balanced."""
    import pandas as pd

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = docs.count()

    # BUCKETED gram-df reduce (gram-hash buckets + one vectorized sum
    # per bucket; a native per-gram aggregate pays per-distinct-key
    # overhead — measured 30× on 100k+ keys) with the df≥2 filter
    # INSIDE the bucket reduce, so only duplicated grams leave it
    n_gb = dd.derive_buckets(n_docs, rows_per_doc=32)

    def gram_bucketize(b: pa.Table) -> pa.Table:
        t = tx.dupgram_partial_df(b)
        gh = t.column("gh").to_numpy().view(np.uint64)
        bk = (gh % np.uint64(n_gb)).astype(np.int32)
        return t.append_column("bucket", pa.array(bk))

    def dup_reduce(g):
        s = g.groupby("gh", as_index=False).agg(df=("nd", "sum"))
        s = s[s["df"] >= 2]
        return pd.DataFrame({"gh_r": s["gh"].to_numpy(np.int64),
                             "dup": np.ones(len(s), dtype=np.int64)})

    build = (
        docs.map_batches(gram_bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(dup_reduce, batch_format="pandas")
        .repartition(max(1, min(32, -(-n_docs // 25_000))))
    )
    probe = docs.map_batches(tx.dupgram_doc_rows, batch_format="pyarrow")

    cpus = int(ray.cluster_resources().get("CPU", 8))
    # the post-join combiner's task width == num_partitions (measured:
    # cpus//2 left the 125-cpu-s combiner 16-wide on 32 cpus)
    n_part = max(8, min(dd.derive_buckets(n_docs, rows_per_doc=64), cpus))
    joined = probe.join(
        build, "left_outer", n_part, on=("gh",), right_on=("gh_r",),
        aggregator_ray_remote_args=_join_remote_args(n_part),
    )

    n_db = dd.derive_buckets(n_docs)

    def partial(df):
        # np.unique + bincount: measured 15× over the pandas groupby
        # at the join's 800k-row block size
        occ = df["n_occ"].to_numpy(np.int64)
        is_tot = df["is_tot"].to_numpy(bool)
        is_dup = ~np.isnan(df["dup"].to_numpy(np.float64))
        u, inv = np.unique(df["doc_id"].to_numpy(np.int64),
                           return_inverse=True)
        n_pos = np.bincount(inv, weights=np.where(is_tot, occ, 0),
                            minlength=len(u)).astype(np.int64)
        n_dup = np.bincount(inv, weights=np.where(is_dup & ~is_tot,
                                                  occ, 0),
                            minlength=len(u)).astype(np.int64)
        return pd.DataFrame({
            "doc_id": u, "n_pos": n_pos, "n_dup": n_dup,
            "bucket": (u % n_db).astype("int32"),
        })

    def doc_reduce(g):
        s = g.groupby("doc_id", as_index=False).agg(
            n_pos=("n_pos", "sum"), n_dup=("n_dup", "sum"))
        s = s[s["n_pos"] > 0]
        n_pos = s["n_pos"].to_numpy(np.int64)
        n_dup = s["n_dup"].to_numpy(np.int64)
        return s.assign(dup_frac_micro=n_dup * 1_000_000 // n_pos)

    return (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(doc_reduce, batch_format="pandas")
    )


SAMPLE_K = 200


def q_sample_exact_k(sf_dir: str):
    """Exact-size-k uniform sample (reservoir semantics, made
    deterministic): the k docs with the smallest Knuth-hash values —
    a fixed-size sample whose membership is independent of row order
    and partitioning, unlike rate-based q_hash_sample. Per-batch
    partial top-k keeps ≤ k rows per block; the final sort orders
    ≤ k·n_blocks rows, never the corpus."""
    import pandas as pd

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def partial(df):
        ids = df["doc_id"].to_numpy(np.int64)
        df = df.assign(h=_knuth32(ids))
        return df.sort_values(["h", "doc_id"],
                              kind="mergesort").head(SAMPLE_K)

    return (
        ds.map_batches(partial, batch_format="pandas")
        .sort(["h", "doc_id"])
        .limit(SAMPLE_K)
        .select_columns(["doc_id", "lang", "n_chars"])
    )


def q_user_running_total(sf_dir: str):
    """Per-user RUNNING cumulative value (the window prefix-sum
    shape: SUM OVER PARTITION BY user ORDER BY ts ROWS UNBOUNDED
    PRECEDING) — per-event output. Events co-partition by user-id
    hash (a user's timeline never splits), each bucket sorts once and
    cumsums vectorized; no global sort, no driver state."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "value"])
    n_buckets = dd.derive_buckets(ds.count())

    def bucketize(df):
        df = df.assign(v_micro=_micro_int_col(df["value"]),
                       bucket=(df["user_id"] % n_buckets).astype("int32"))
        return df[["bucket", "event_id", "ts", "user_id", "v_micro"]]

    def scan(g):
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "user_id": g["user_id"].to_numpy(np.int64),
            "ts": g["ts"],
            "cum_value_micro": g.groupby("user_id", sort=False)["v_micro"]
                                .cumsum().to_numpy(np.int64),
        })

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(scan, batch_format="pandas")
    )


def q_purchase_ffill(sf_dir: str):
    """FORWARD-FILL window (last_value IGNORE NULLS — the gap-filling
    shape sessionized feature pipelines use): every event carries the
    user's most recent PURCHASE value at-or-before it, −1 sentinel
    before the first purchase. Same physical plan as the other window
    ops: user-hash co-partition (a timeline never splits), one sort
    per bucket, vectorized pandas groupby-ffill — no global sort, no
    driver state; deterministic (ts, event_id) tie order."""
    import pandas as pd

    ds = _read(sf_dir, "events",
               ["event_id", "ts", "user_id", "event_type", "value"])
    n_buckets = dd.derive_buckets(ds.count())

    def bucketize(df):
        v = _micro_int_col(df["value"]).astype(np.float64)
        pv = np.where(df["event_type"].to_numpy() == "purchase",
                      v, np.nan)
        df = df.assign(pv=pv,
                       bucket=(df["user_id"] % n_buckets).astype("int32"))
        return df[["bucket", "event_id", "ts", "user_id", "pv"]]

    def scan(g):
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        filled = g.groupby("user_id", sort=False)["pv"].ffill()
        # micro values ≤ 2^53 ⇒ the float carrier is exact
        last = filled.fillna(-1).to_numpy(np.float64).astype(np.int64)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "user_id": g["user_id"].to_numpy(np.int64),
            "ts": g["ts"],
            "last_purchase_micro": last,
        })

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(scan, batch_format="pandas")
    )


def q_retained_users(sf_dir: str):
    """Two-period retention INTERSECT: users active in BOTH halves of
    the observed time range. Pass 1 is a tiny per-batch (min, max)
    timestamp combiner (one row per block → driver midpoint, integer
    microseconds so the Ray and SQL halves split identically); pass 2
    flags each event's period map-side and reduces per user to two
    counts — the exchange carries one summary row per (batch, user).
    """
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])

    def minmax(df):
        us = df["ts"].astype("datetime64[us]").astype("int64")
        return pd.DataFrame({"lo": [int(us.min())], "hi": [int(us.max())]})

    mm = ds.map_batches(minmax, batch_format="pandas").to_pandas()
    lo, hi = int(mm["lo"].min()), int(mm["hi"].max())
    mid = (lo + hi) // 2

    n_buckets = dd.derive_buckets(ds.count())

    def partial(df):
        us = df["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        first = us <= mid
        out = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "n_first": first.astype(np.int64),
            "n_second": (~first).astype(np.int64),
        })
        out = out.groupby("user_id", as_index=False).agg(
            n_first=("n_first", "sum"), n_second=("n_second", "sum"))
        out["bucket"] = (out["user_id"] % n_buckets).astype("int32")
        return out

    def reduce_both(g):
        s = g.groupby("user_id", as_index=False).agg(
            n_first=("n_first", "sum"), n_second=("n_second", "sum"))
        s = s[(s["n_first"] > 0) & (s["n_second"] > 0)]
        return s.astype({"user_id": "int64", "n_first": "int64",
                         "n_second": "int64"})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(reduce_both, batch_format="pandas")
    )


def q_percentile_rank(sf_dir: str):
    """Per-doc PERCENTILE-RANK normalization of n_chars — the
    score-calibration shape (map a raw signal to its corpus
    percentile before thresholding). Integer-exact min-rank
    semantics: pct = (rank-1)·10^6 // (N-1), rank = #values < v + 1 —
    no doubles anywhere, so the SQL window twin matches bit-for-bit.

    Two phases: a value-HISTOGRAM combiner (distinct (v, count) rows
    shuffle — bounded by the value DOMAIN, never the corpus, as
    q_value_quantiles) reduces to a cumulative-below table on the
    driver; the tiny table broadcasts and phase 2 is a map-side
    searchsorted lookup."""
    import pandas as pd

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def hist(df):
        vc = df["n_chars"].value_counts()
        return pd.DataFrame({"v": vc.index.to_numpy(np.int64),
                             "c": vc.to_numpy(np.int64)})

    # two-level map_batches tree reduce (no sort): per-block partial
    # histograms are value-domain-bounded, so level 1 coalesces block
    # partials and level 2 folds them in one tiny task — the native
    # per-key aggregate pays measured per-key overhead here
    def hist_fold(df):
        return df.groupby("v", as_index=False).agg(c=("c", "sum"))

    h = (
        ds.map_batches(hist, batch_format="pandas")
        .repartition(8)
        .map_batches(hist_fold, batch_format="pandas")
        .repartition(1)
        .map_batches(hist_fold, batch_format="pandas")
        .to_pandas()  # value-domain-sized: tiny
        .sort_values("v")
    )
    vals = h["v"].to_numpy(np.int64)
    counts = h["c"].to_numpy(np.int64)
    n_total = int(counts.sum())
    cum_below = np.concatenate(([0], np.cumsum(counts)[:-1]))
    ref = ray.put((vals, cum_below, n_total))

    def rank_map(df):
        v_arr, cb, n = sim.resolve_broadcast(ref, key="pct-rank-hist")
        x = df["n_chars"].to_numpy(np.int64)
        idx = np.searchsorted(v_arr, x)
        pct = cb[idx] * 1_000_000 // max(1, n - 1)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "n_chars": x,
            "pct_micro": pct.astype(np.int64),
        })

    return ds.map_batches(rank_map, batch_format="pandas")


def q_user_customer_outer(sf_dir: str):
    """FULL OUTER enrichment join against a PARTIAL dimension table
    (the real-world case of a reference table missing keys): per-user
    event rollup ⟗ customer accounts restricted to even custkeys (the
    deterministic stand-in for an incomplete dimension). Left side is
    pre-aggregated to one row per user BEFORE the join (the exchange
    carries rollups, not events); the native full_outer hash join
    keeps unmatched rows from both sides; nulls are resolved to typed
    sentinels map-side (COALESCE mirrored in the oracle)."""
    import pandas as pd

    ev = _read(sf_dir, "events", ["user_id", "value"])
    n_users_hint = ev.count()
    nb = dd.derive_buckets(n_users_hint)

    def partial(df):
        out = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "n_events": np.ones(len(df), np.int64),
            "sum_value_micro": _micro_int_col(df["value"]),
        }).groupby("user_id", as_index=False).agg(
            n_events=("n_events", "sum"),
            sum_value_micro=("sum_value_micro", "sum"))
        out["bucket"] = (out["user_id"] % nb).astype("int32")
        return out

    def reduce_user(g):
        s = g.groupby("user_id", as_index=False).agg(
            n_events=("n_events", "sum"),
            sum_value_micro=("sum_value_micro", "sum"))
        return s.astype({"user_id": "int64", "n_events": "int64",
                         "sum_value_micro": "int64"})

    # repartition to guaranteed-NONEMPTY blocks for the join (empty
    # input blocks crash the hash-shuffle join); block count is
    # size-derived — user cardinality scales with the data, so a
    # fixed repartition(1) would bottleneck at scale
    left = (
        ev.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(reduce_user, batch_format="pandas")
        .repartition(max(1, min(64, n_users_hint // 500_000)))
    )

    def dim(df):
        df = df[df["c_custkey"].to_numpy(np.int64) % 2 == 0]
        return pd.DataFrame({
            "c_custkey": df["c_custkey"].to_numpy(np.int64),
            "c_name": df["c_name"],
            "acctbal_c": _cents_col(df["c_acctbal"]),
        })

    cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
    n_cust = cust_ds.count()
    right = (
        cust_ds.map_batches(dim, batch_format="pandas")
        .repartition(max(1, min(64, n_cust // 200_000)))
    )

    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_part = max(4, cpus // 4)
    joined = left.join(
        right, "full_outer", n_part,
        on=("user_id",), right_on=("c_custkey",),
        aggregator_ray_remote_args=_join_remote_args(n_part),
    )

    def project(df):
        # Ray's full_outer COALESCES the key pair into the LEFT key
        # column (user_id), so presence flags come from each side's
        # non-key columns (n_events / acctbal_c are NOT NULL on their
        # own side by construction)
        has_ev = df["n_events"].notna().to_numpy()
        has_acct = df["acctbal_c"].notna().to_numpy()
        return pd.DataFrame({
            "id": df["user_id"].to_numpy(np.int64),
            "has_events": has_ev,
            "n_events": df["n_events"].fillna(0).to_numpy(np.int64),
            "sum_value_micro": df["sum_value_micro"].fillna(0)
                                 .to_numpy(np.int64),
            "has_account": has_acct,
            "c_name": df["c_name"].fillna("").to_numpy(dtype=object),
            "acctbal_c": df["acctbal_c"].fillna(0).to_numpy(np.int64),
        })

    return joined.map_batches(project, batch_format="pandas")


def q_top_customers(sf_dir: str):
    """Broadcast join (small dim side via ray.put) + grouped rollup +
    deterministic top-k."""
    cust_df = (
        _read(sf_dir, "customer", ["c_custkey", "c_name"]).to_pandas()
    )
    names_ref = ray.put(
        dict(zip(cust_df["c_custkey"].astype(int), cust_df["c_name"]))
    )
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
    # size-derived combine granularity (VERDICT r2 #2: a fixed 32 made
    # per-bucket rows grow with the customer count)
    n_buckets = dd.derive_buckets(len(cust_df))

    def partial(df):
        df = df.copy()
        df["price_c"] = _cents_col(df["o_totalprice"])
        g = df.groupby("o_custkey", as_index=False).agg(
            revenue_c=("price_c", "sum"), n_orders=("price_c", "size")
        )
        g["n_orders"] = g["n_orders"].astype("int64")
        g["bucket"] = (g["o_custkey"] % n_buckets).astype("int32")
        return g[["bucket", "o_custkey", "revenue_c", "n_orders"]]

    def combine(g):
        return g.groupby("o_custkey", as_index=False).agg(
            revenue_c=("revenue_c", "sum"), n_orders=("n_orders", "sum")
        )

    # partial per batch → bucketed final combine (32 groups, C-speed
    # pandas inside; the generic Ray Aggregate here measured 20+ s)
    partials = orders.map_batches(partial, batch_format="pandas")
    totals = partials.groupby("bucket").map_groups(
        combine, batch_format="pandas"
    )
    top = totals.sort(["revenue_c", "o_custkey"], descending=[True, False]).limit(10)

    def finish(batch: pa.Table, names_ref=names_ref) -> pa.Table:
        names = ray.get(names_ref)
        keys = [int(k) for k in batch.column("o_custkey").to_pylist()]
        return pa.Table.from_pydict(
            {
                "c_custkey": pa.array(keys, pa.int64()),
                "c_name": pa.array([names.get(k, "") for k in keys], pa.string()),
                "revenue_c": batch.column("revenue_c"),
                "n_orders": batch.column("n_orders"),
            }
        )

    return top.map_batches(finish, batch_format="pyarrow")


def q_distinct_users(sf_dir: str):
    """Grouped EXACT count-distinct (users per event type) — the
    bucketed-distinct shape: per-batch drop_duplicates means only
    batch-distinct (type, user) pairs ever shuffle; the bucket key is
    user-id hash so one (type, user) never splits across groups and
    per-group nunique counts sum exactly; a tiny per-type reduce
    finishes. Exchange is O(distinct pairs) — when even that is too
    much, q_distinct_users_hll is the O(batches · 4 KiB) sketch twin."""
    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    n_buckets = dd.derive_buckets(ds.count())

    def partial(df):
        g = df.drop_duplicates(["event_type", "user_id"]).copy()
        g["bucket"] = (g["user_id"] % n_buckets).astype("int32")
        return g[["bucket", "event_type", "user_id"]]

    def count_bucket(g):
        out = (g.drop_duplicates(["event_type", "user_id"])
               .groupby("event_type", as_index=False)
               .agg(n_users=("user_id", "size")))
        out["n_users"] = out["n_users"].astype("int64")
        return out

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(count_bucket, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


def q_user_event_types(sf_dir: str):
    """Grouped string aggregation (collect-set / string_agg): per
    user, the ','-joined SORTED distinct event types + their count.
    Per-batch drop_duplicates means only batch-distinct (user, type)
    pairs shuffle; user-hash bucketing keeps every user's pairs in one
    group, where a single vectorized pandas pass dedups, sorts and
    joins. Sorted join order makes the result partitioning-independent
    (mirrors the oracle's string_agg(... ORDER BY))."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    n_buckets = dd.derive_buckets(ds.count())

    def partial(df):
        g = df.drop_duplicates(["user_id", "event_type"]).copy()
        g["bucket"] = (g["user_id"] % n_buckets).astype("int32")
        return g[["bucket", "user_id", "event_type"]]

    def rollup(g):
        g = (
            g.drop_duplicates(["user_id", "event_type"])
            .sort_values(["user_id", "event_type"], kind="mergesort")
        )
        out = g.groupby("user_id", as_index=False).agg(
            n_types=("event_type", "size"),
            types_csv=("event_type", ",".join))
        return out.astype({"n_types": "int64"})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(rollup, batch_format="pandas")
    )


def _click_purchase_days(sf_dir: str, final_mask):
    """Shared distinct-(user, day) flag pipeline behind the composite-
    key set ops (T62 EXCEPT / T72 INTERSECT): per-batch partials carry
    two booleans per distinct (user, day) instead of events; the
    user-hash bucketed reduce ORs the flags and applies the set-op's
    mask — no self-join, exchange O(distinct pairs per batch)."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
    n_buckets = dd.derive_buckets(ds.count())

    def partial(df):
        out = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "day": df["ts"].dt.floor("D"),
            "clicked": (df["event_type"] == "click").to_numpy(),
            "purchased": (df["event_type"] == "purchase").to_numpy(),
        }).groupby(["user_id", "day"], as_index=False).agg(
            clicked=("clicked", "max"), purchased=("purchased", "max"))
        out = out[out["clicked"] | out["purchased"]]
        out["bucket"] = (out["user_id"] % n_buckets).astype("int32")
        return out

    def reduce_bucket(g):
        s = g.groupby(["user_id", "day"], as_index=False).agg(
            clicked=("clicked", "max"), purchased=("purchased", "max"))
        s = s[final_mask(s)]
        return (s[["user_id", "day"]].astype({"user_id": "int64"})
                .reset_index(drop=True))

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


def q_click_no_purchase_days(sf_dir: str):
    """EXCEPT-distinct over a COMPOSITE key (§2.7 set op): (user, day)
    pairs with a click but no purchase that day."""
    return _click_purchase_days(
        sf_dir, lambda s: s["clicked"] & ~s["purchased"])


def q_click_and_purchase_days(sf_dir: str):
    """INTERSECT-distinct over a COMPOSITE key (§2.7 set op — the
    EXCEPT twin with the conjunctive mask): (user, day) pairs with
    BOTH a click and a purchase that day; same flag-partial pipeline,
    no self-join."""
    return _click_purchase_days(
        sf_dir, lambda s: s["clicked"] & s["purchased"])


def q_distinct_users_hll(sf_dir: str):
    """Grouped APPROXIMATE count-distinct via HyperLogLog
    (stages/cardinality.py) — the sketch twin of q_distinct_users.
    One 4 KiB register row per (batch, key) shuffles instead of the
    distinct pairs: exchange is O(batches · 2^P) bytes, independent
    of cardinality. Elementwise-max merging is associative and the
    hash fixed, so the estimate is partitioning-INdependent; still
    approximate (stderr ≈ 1.6% at P=12), hence rows-only — the
    pytest gate asserts ≤5% error vs the exact twin per key."""
    from ..stages import cardinality as cd

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    n_buckets = min(4096, dd.derive_buckets(ds.count()))

    return (
        ds.map_batches(
            lambda b: cd.hll_partial(b, "event_type", "user_id", n_buckets),
            batch_format="pyarrow",
        )
        .groupby("jb")
        .map_groups(lambda g: cd.hll_merge(g, "event_type"),
                    batch_format="pandas")
        .groupby("event_type")
        .map_groups(lambda g: cd.hll_final(g, "event_type", "n_users_est"),
                    batch_format="pandas")
    )


ORDER_JOIN_CUTOFF = "1996-06-30"


def _join_remote_args(num_partitions: int) -> dict:
    """Aggregator ray_remote_args for a native hash join. Ray's
    default reserves up to 50% of cluster CPUs PER JoinOperator's
    aggregator pool; a pipeline with two chained joins then reserves
    ~100% and the upstream map tasks starve — a measured DEADLOCK at
    num_partitions=32 on an 8-CPU node. Cap each pool at 25% of
    cluster CPUs instead (two concurrent joins reserve ≤ half, the
    feed stages keep the rest); SPREAD mirrors Ray's default
    anti-thundering-herd placement on multi-node clusters."""
    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_aggregators = min(num_partitions, 64)  # Ray's own aggregator cap
    return {
        "num_cpus": min(1.0, cpus / (4 * n_aggregators)),
        "scheduling_strategy": "SPREAD",
    }


def q_order_revenue_join(sf_dir: str):
    """TPC-H-Q3-shaped BIG-BIG JOIN — the co-partitioned hash-join
    shape the rest of §2.4 lacks (top_customers broadcasts its small
    side; here BOTH sides shuffle). customer⋉orders is a left_semi
    hash join (only orders rows survive, so no customer payload
    travels past it); the surviving orders inner-join lineitem on the
    order key. Both use Ray Data's native hash JoinOperator with
    SIZE-DERIVED partition counts taken from parquet metadata row
    counts (``_read(...).count()`` on a fresh read is footer-only —
    deriving them executes nothing). Filters and column pruning run
    map-side BEFORE the shuffles: only (l_orderkey, price, discount)
    resp. (o_orderkey, o_custkey, date, priority) rows enter an
    exchange. Revenue is per-row integer micro-units before summing
    (order-independent); final top-10 tie-break (revenue DESC, date
    ASC, orderkey ASC) mirrors the oracle's ORDER BY."""
    import pandas as pd
    import pyarrow.compute as pc

    cut = pa.scalar(pd.Timestamp(ORDER_JOIN_CUTOFF), pa.timestamp("us"))

    n_orders = _read(sf_dir, "orders", ["o_orderkey"]).count()
    n_li = _read(sf_dir, "lineitem", ["l_orderkey"]).count()

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda b: b.filter(
            pc.equal(b.column("c_mktsegment"), "BUILDING")
        ).select(["c_custkey"]),
        batch_format="pyarrow",
    )
    orders = _read(
        sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(
        lambda b: b.filter(pc.less(b.column("o_orderdate"), cut)),
        batch_format="pyarrow",
    )
    lineitem = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(
        lambda b: b.filter(pc.greater(b.column("l_shipdate"), cut)).select(
            ["l_orderkey", "l_extendedprice", "l_discount"]
        ),
        batch_format="pyarrow",
    )

    # Partition count: size-derived (≈200k rows each) but clamped to
    # half the cluster CPUs — Ray's hash join spins min(partitions,
    # 64) aggregator ACTORS per join, and the fresh-actor ramp has a
    # measured CLIFF: at 32 CPUs / sf0.1 the two-join pipeline runs
    # 12.4 s (np=8), 16.7 s (np=16), 109 s (np=32); 8 CPUs deadlock
    # outright at np=32 under Ray's default 50%-of-CPUs aggregator
    # reservation (see _join_remote_args). On a real cluster raise
    # DataContext.max_hash_shuffle_aggregators toward the node count
    # so per-aggregator accumulation stays node-sized; the CPU clamp
    # then admits the size-derived count unchanged.
    cpus = int(ray.cluster_resources().get("CPU", 8))
    np_orders = max(8, min(dd.derive_buckets(n_orders), cpus // 2))
    np_li = max(8, min(dd.derive_buckets(n_li), cpus // 2))
    o_semi = orders.join(
        cust, "left_semi", np_orders,
        on=("o_custkey",), right_on=("c_custkey",),
        aggregator_ray_remote_args=_join_remote_args(np_orders),
    ).select_columns(["o_orderkey", "o_orderdate", "o_orderpriority"])
    joined = lineitem.join(
        o_semi, "inner", np_li,
        on=("l_orderkey",), right_on=("o_orderkey",),
        aggregator_ray_remote_args=_join_remote_args(np_li),
    )

    # Final reduce is the repo's BUCKETED idiom, not a native per-key
    # aggregate: ~n_orders distinct (orderkey, date, priority) keys
    # survive the join at scale, and the native sort-based aggregate
    # pays per-distinct-key overhead (measured 30× on 100k+ keys —
    # BASELINE.md / q_big_orders). Buckets are o_orderkey-hash, one
    # vectorized pandas sum + a PARTIAL top-10 per bucket (the
    # (orderkey, date, priority) key is functionally o_orderkey, so a
    # per-bucket top-10 is a safe prune), then a tiny
    # ≤ 10×n_buckets-row global sort picks the real top-10.
    nb_agg = dd.derive_buckets(n_orders)

    def partial(df):
        rev = np.floor(
            df["l_extendedprice"].to_numpy(np.float64)
            * (1.0 - df["l_discount"].to_numpy(np.float64))
            * 1_000_000
            + 0.5
        ).astype(np.int64)
        g = df.assign(rev=rev).rename(
            columns={"l_orderkey": "o_orderkey"}
        ).groupby(
            ["o_orderkey", "o_orderdate", "o_orderpriority"], as_index=False
        ).agg(revenue_micro=("rev", "sum"))
        g["bucket"] = (g["o_orderkey"] % nb_agg).astype("int32")
        return g

    def reduce_topk(g):
        s = g.groupby(
            ["o_orderkey", "o_orderdate", "o_orderpriority"], as_index=False
        ).agg(revenue_micro=("revenue_micro", "sum"))
        return s.sort_values(
            ["revenue_micro", "o_orderdate", "o_orderkey"],
            ascending=[False, True, True], kind="mergesort",
        ).head(10)

    return (
        joined.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(reduce_topk, batch_format="pandas")
        .sort(["revenue_micro", "o_orderdate", "o_orderkey"],
              descending=[True, False, False])
        .limit(10)
    )


BLOOM_PRIORITY = "1-URGENT"


def q_bloom_semi_join(sf_dir: str):
    """Bloom-prefiltered SEMI JOIN (sideways information passing —
    the scale move when the build side's distinct key set is too big
    to broadcast exactly, T40's limit): revenue of lineitem rows
    belonging to urgent orders.

    Build: urgent o_orderkey per-batch packed-bitmap partials →
    bucketed OR-merge tree → one ≤ MiB bitmap via ray.put
    (stages/bloom.py; bits size-derived at 8/key). Probe: lineitem
    drops non-members map-side BEFORE any exchange (~80% of rows at
    this priority mix never shuffle). Bloom false positives are
    removed by the exact native hash join against the distinct urgent
    keys that follows, so the result is EXACT — the bitmap only
    shrinks the exchange. Revenue in integer micro-units."""
    import pandas as pd
    import pyarrow.compute as pc

    # ONE orders scan: the per-batch-unique urgent keys are
    # distributed-materialized once and reused as BOTH the bloom-build
    # input and the exact-verify join build side (this key set is what
    # is too big to broadcast — shuffling/pinning it stays fine)
    dedup_keys = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderpriority"]
    ).map_batches(
        lambda b: pa.Table.from_pydict(
            {"o_orderkey": pa.array(np.unique(
                b.filter(pc.equal(b.column("o_orderpriority"),
                                  BLOOM_PRIORITY))
                .column("o_orderkey").to_numpy()), pa.int64())}),
        batch_format="pyarrow",
    ).materialize()
    # bitmap sized from the ACTUAL materialized key count (metadata
    # read), not a priority-mix guess — a skewed mix would otherwise
    # silently gut the bits/key budget and with it the prune rate
    bits_ref = ray.put(
        bl.build_bloom(dedup_keys, "o_orderkey", dedup_keys.count()))

    def prefilter(batch: pa.Table) -> pa.Table:
        bits = ray.get(bits_ref)  # zero-copy from the local store
        return batch.filter(
            bl.contains(batch.column("l_orderkey").to_numpy(), bits))

    survivors = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    ).map_batches(prefilter, batch_format="pyarrow")
    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_li = _read(sf_dir, "lineitem", ["l_orderkey"]).count()
    n_part = max(8, min(dd.derive_buckets(n_li // 5), cpus // 2))
    verified = survivors.join(
        dedup_keys, "left_semi", n_part,
        on=("l_orderkey",), right_on=("o_orderkey",),
        aggregator_ray_remote_args=_join_remote_args(n_part),
    )

    def partial(df):
        rev = np.floor(
            df["l_extendedprice"].to_numpy(np.float64)
            * (1.0 - df["l_discount"].to_numpy(np.float64))
            * 1_000_000
            + 0.5
        ).astype(np.int64)
        return (
            df.assign(rev=rev)
            .groupby("l_returnflag", as_index=False)
            .agg(n_items=("rev", "size"), revenue_micro=("rev", "sum"))
            .astype({"n_items": "int64", "revenue_micro": "int64"})
        )

    return (
        verified.map_batches(partial, batch_format="pandas")
        .groupby("l_returnflag")
        .aggregate(Sum("n_items", alias_name="n_items"),
                   Sum("revenue_micro", alias_name="revenue_micro"))
    )


def q_top_event_type(sf_dir: str):
    """Grouped MODE (argmax-count per key — the aggregate family
    member plain Sum/Min/Max can't express): each user's dominant
    event type. Per-batch (user, type) count partials shuffle instead
    of events; the user-hash-bucketed reduce sums and picks the mode
    with a deterministic tie-break (count DESC, type ASC) mirrored by
    the oracle's row_number ORDER BY."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    nb = dd.derive_buckets(ds.count())

    def partial(df):
        g = df.groupby(["user_id", "event_type"], as_index=False).agg(
            n=("event_type", "size"))
        g["bucket"] = (g["user_id"] % nb).astype("int32")
        return g

    def reduce_bucket(g):
        s = g.groupby(["user_id", "event_type"], as_index=False).agg(
            n=("n", "sum"))
        s = s.sort_values(["user_id", "n", "event_type"],
                          ascending=[True, False, True])
        s = s.drop_duplicates("user_id")
        return pd.DataFrame({
            "user_id": s["user_id"].to_numpy(np.int64),
            "top_event_type": s["event_type"].to_numpy(),
            "n_events": s["n"].to_numpy(np.int64),
        })

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


PIVOT_TYPES = ("view", "click", "purchase", "signup", "error")


def q_events_daily_pivot(sf_dir: str):
    """PIVOT-shaped wide aggregate (§2.8 long→wide): one fixed count
    column per event type + the day's value total, produced by ONE
    combiner pass (events read once, not once per column); partial
    rows are ≤ days·1 per batch into a small per-day groupby. The
    type→column map is a fixed engine constant — at 100 TB a pivot on
    an unbounded type domain is a different op (T55's collect shape),
    not this one."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def partial(df):
        out = pd.DataFrame({"day": df["ts"].dt.floor("D")})
        out["value_micro"] = _micro_int_col(df["value"])
        et = df["event_type"].to_numpy()
        for t in PIVOT_TYPES:
            out[f"n_{t}"] = (et == t).astype("int64")
        return out.groupby("day", as_index=False).agg(
            **{f"n_{t}": (f"n_{t}", "sum") for t in PIVOT_TYPES},
            sum_value_micro=("value_micro", "sum"),
        ).astype({f"n_{t}": "int64" for t in PIVOT_TYPES}
                 | {"sum_value_micro": "int64"})

    aggs = [Sum(f"n_{t}", alias_name=f"n_{t}") for t in PIVOT_TYPES]
    aggs.append(Sum("sum_value_micro", alias_name="sum_value_micro"))
    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("day")
        .aggregate(*aggs)
    )


def q_nation_parties(sf_dir: str):
    """Query-level Dataset.union (§2.8 set-op coverage — dedup's
    internal tagged unions, made a first-class operator): customers ∪
    suppliers rolled up per nation. Each leg is pruned at the read and
    pre-aggregated per batch to (nationkey, n_customers, n_suppliers,
    sum_acctbal_micro) partials BEFORE the union, so the merged stream
    carries ≤ 25·batches tiny rows into a native groupby over the
    25-key nation column (small fixed key domain — the bucketed-reduce
    rule doesn't apply)."""
    import pandas as pd

    def leg(table: str, key: str, bal: str, is_cust: int):
        def partial(df):
            out = pd.DataFrame({
                "nationkey": df[key].to_numpy(np.int64),
                "bal_micro": _micro_int_col(df[bal]),
            })
            g = out.groupby("nationkey", as_index=False).agg(
                n=("bal_micro", "size"),
                sum_acctbal_micro=("bal_micro", "sum"))
            # arrow out (metadata-free): keeps the union→aggregate
            # exchange on one hashable schema
            return pa.Table.from_pydict({
                "nationkey": pa.array(
                    g["nationkey"].to_numpy(np.int64), pa.int64()),
                "n_customers": pa.array(
                    (g["n"] * is_cust).to_numpy(np.int64), pa.int64()),
                "n_suppliers": pa.array(
                    (g["n"] * (1 - is_cust)).to_numpy(np.int64),
                    pa.int64()),
                "sum_acctbal_micro": pa.array(
                    g["sum_acctbal_micro"].to_numpy(np.int64), pa.int64()),
            })

        return _read(sf_dir, table, [key, bal]).map_batches(
            partial, batch_format="pandas")

    merged = leg("customer", "c_nationkey", "c_acctbal", 1).union(
        leg("supplier", "s_nationkey", "s_acctbal", 0))
    return merged.groupby("nationkey").aggregate(
        Sum("n_customers", alias_name="n_customers"),
        Sum("n_suppliers", alias_name="n_suppliers"),
        Sum("sum_acctbal_micro", alias_name="sum_acctbal_micro"),
    )


# explicit ASCII whitespace class: Python re's \s matches Unicode
# whitespace (NBSP, thin space, …) while DuckDB's RE2 \s does not —
# spelling the class out makes both engines identical by construction
_SENT_RE = re.compile(r"[.!?]+[ \t\n\r\f\v]+")


def q_sentence_split(sf_dir: str):
    """Sentence EXPLODE (flat_map one-doc→N-rows — the long-form twin
    of the pivot): split on enders + explicit-ASCII whitespace (`\\s`
    is Unicode-wide in `re` but not in RE2, so the class is spelled
    out on both sides), drop empties, emit (doc_id, sent_idx,
    sentence, n_chars_sent). Pure map-side; downstream sentence-level
    filters (the curation use) chain as further map_batches. Output
    rows ≈ sentences, so blocks grow ~20×: Ray's streaming executor
    re-blocks after the flat map, no repartition needed."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        o_id: list[int] = []
        o_idx: list[int] = []
        o_sent: list[str] = []
        for did, t in zip(batch.column("doc_id").to_pylist(),
                          batch.column("text").to_pylist()):
            sents = [s for s in _SENT_RE.split(t) if s != ""]
            o_id.extend([did] * len(sents))
            o_idx.extend(range(len(sents)))
            o_sent.extend(sents)
        return pa.Table.from_pydict({
            "doc_id": pa.array(o_id, pa.int64()),
            "sent_idx": pa.array(o_idx, pa.int64()),
            "sentence": pa.array(o_sent, pa.string()),
            "n_chars_sent": pa.array([len(s) for s in o_sent], pa.int64()),
        })

    return ds.map_batches(explode, batch_format="pyarrow")


MOVING_WINDOW = 4  # trailing events per moving sum (incl. current)


def q_moving_sum(sf_dir: str):
    """Per-user trailing-4-event MOVING SUM (the bounded window frame
    T48's unbounded cumsum lacks — SQL ROWS BETWEEN 3 PRECEDING AND
    CURRENT ROW). User-hash co-partition so a timeline never splits;
    per-bucket ONE sort + vectorized prefix-sum difference with
    per-user run starts from the sorted key column (no per-user loop).
    Deterministic (ts, event_id) order mirrors the oracle's window
    ORDER BY."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    nb = dd.derive_buckets(ds.count())

    def partial(df):
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "user_id": df["user_id"].to_numpy(np.int64),
            "ts": df["ts"],
            "value_micro": _micro_int_col(df["value"]),
            "bucket": (df["user_id"].to_numpy(np.int64) % nb)
                .astype("int32"),
        })

    def reduce_bucket(g):
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        n = len(g)
        uid = g["user_id"].to_numpy(np.int64)
        cs = np.cumsum(g["value_micro"].to_numpy(np.int64))
        run_first = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        start = np.repeat(run_first, np.diff(np.r_[run_first, n]))
        lo = np.maximum(start, np.arange(n) - (MOVING_WINDOW - 1))
        ms = cs - np.where(lo > 0, cs[np.maximum(lo - 1, 0)], 0)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "user_id": uid,
            "moving_sum_micro": ms.astype(np.int64),
        })

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


def q_revenue_share(sf_dir: str):
    """Percent-of-total (window-over-ALL-rows: SQL sum() OVER ()) —
    per-priority revenue share in exact ppm. One combiner pass →
    5-row groupby; the global total is computed FROM those 5 rows on
    the driver (a scalar fold over an already-tiny result, like T49's
    midpoint) with unbounded Python ints, so cents·10⁶ can't overflow
    — the oracle casts through HUGEINT for the same reason."""
    import pandas as pd

    ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

    def partial(df):
        out = pd.DataFrame({
            "o_orderpriority": df["o_orderpriority"],
            "cents": _cents_col(df["o_totalprice"]),
        })
        return out.groupby("o_orderpriority", as_index=False).agg(
            revenue_cents=("cents", "sum"))

    small = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("o_orderpriority")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
        .to_pandas()
    )
    total = int(small["revenue_cents"].sum())
    small["share_ppm"] = np.array(
        [int(c) * 1_000_000 // total for c in small["revenue_cents"]],
        np.int64)
    small["revenue_cents"] = small["revenue_cents"].astype("int64")
    return small


def q_nation_order_avg(sf_dir: str):
    """NESTED aggregate (aggregate of aggregates — the two-level
    reduction a single groupby can't express): per-customer order
    counts, averaged per nation, customers WITHOUT orders included as
    zeros. Inner level: per-batch (custkey, n) partials → bucketed
    per-customer reduce (custkey cardinality scales with data). Join
    level: native left_outer hash join customer ⟕ counts (both sides
    big at scale; only (custkey, nationkey) resp. (custkey, n) rows
    shuffle). Outer level: per-batch (nation, n_cust, sum_n) combiner
    → 25-key groupby; exact floor-div micro average."""
    import pandas as pd

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    orders = _read(sf_dir, "orders", ["o_custkey"])
    nb = dd.derive_buckets(orders.count())

    def count_partial(df):
        g = df.groupby("o_custkey", as_index=False).agg(
            n=("o_custkey", "size"))
        g["bucket"] = (g["o_custkey"] % nb).astype("int32")
        return g

    def count_reduce(g):
        s = (g.groupby("o_custkey", as_index=False).agg(n=("n", "sum"))
             .astype({"o_custkey": "int64", "n": "int64"}))
        # arrow + metadata-free: pandas→arrow conversion at the join
        # exchange would attach the b'pandas' schema blob, which makes
        # pa.Schema unhashable and defeats Ray's schema dedup (same
        # root cause as the _read schema strip)
        return pa.Table.from_pandas(
            s, preserve_index=False).replace_schema_metadata(None)

    oc = (
        orders.map_batches(count_partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(count_reduce, batch_format="pandas")
    )
    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_cust = cust.count()
    n_part = max(8, min(dd.derive_buckets(n_cust), cpus // 2))
    joined = cust.join(
        oc, "left_outer", n_part,
        on=("c_custkey",), right_on=("o_custkey",),
        aggregator_ray_remote_args=_join_remote_args(n_part),
    )

    def nation_partial(df):
        n = df["n"].fillna(0).to_numpy(np.int64)
        out = pd.DataFrame({
            "nationkey": df["c_nationkey"].to_numpy(np.int64),
            "n_orders": n,
        })
        return out.groupby("nationkey", as_index=False).agg(
            n_customers=("n_orders", "size"), n_orders=("n_orders", "sum")
        ).astype({"n_customers": "int64", "n_orders": "int64"})

    small = (
        joined.map_batches(nation_partial, batch_format="pandas")
        .groupby("nationkey")
        .aggregate(Sum("n_customers", alias_name="n_customers"),
                   Sum("n_orders", alias_name="n_orders"))
    )

    def finalize(df):
        df = df.copy()
        df["avg_orders_micro"] = (
            df["n_orders"].to_numpy(np.int64) * 1_000_000
            // df["n_customers"].to_numpy(np.int64)
        )
        return df

    return small.map_batches(finalize, batch_format="pandas")


DENSITY_WINDOW_US = 3_600_000_000  # ±1 h, integer µs


def q_event_density(sf_dir: str):
    """Big-big SELF INTERVAL JOIN with NO equi key (the join family
    member T27/T28 can't cover — both sides are the full stream):
    per-event count of events within ±1 h. Technique: time-bucket
    co-partitioning with BOUNDARY REPLICATION — bucket width equals
    the half-window, probes land in their own bucket, builds replicate
    to buckets b−1/b/b+1 (any in-window pair is then co-bucketed
    EXACTLY once — probes double as their own bucket's build side),
    per-bucket sorted searchsorted counting in integer
    µs. Only (event_id, t) int64 rows shuffle, 3N total; bucket count
    grows with the time span, not the data, and a pathologically hot
    hour can be salted into sub-buckets whose counts merge (same
    fix as the dedup sentinel keys)."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_id", "ts"])

    def expand(df):
        t = df["ts"].to_numpy().astype("datetime64[us]").view("int64")
        eid = df["event_id"].to_numpy(np.int64)
        b = t // DENSITY_WINDOW_US
        # probes double as the in-bucket build side (their t values
        # ARE bucket b's events), so only the b±1 replicas ship —
        # 3N rows through the exchange instead of 4N
        parts = [pd.DataFrame({"event_id": eid, "t": t, "bucket": b,
                               "is_probe": True})]
        for off in (-1, 1):
            parts.append(pd.DataFrame({
                "event_id": np.int64(0), "t": t, "bucket": b + off,
                "is_probe": False}))
        return pd.concat(parts, ignore_index=True)

    def count_bucket(g):
        p = g[g["is_probe"]]
        if not len(p):  # bucket holds only replicated builds
            return pd.DataFrame({
                "event_id": np.array([], np.int64),
                "n_within_1h": np.array([], np.int64)})
        bt = np.sort(g["t"].to_numpy(np.int64))  # probes + b±1 builds
        pt = p["t"].to_numpy(np.int64)
        lo = np.searchsorted(bt, pt - DENSITY_WINDOW_US, "left")
        hi = np.searchsorted(bt, pt + DENSITY_WINDOW_US, "right")
        return pd.DataFrame({
            "event_id": p["event_id"].to_numpy(np.int64),
            "n_within_1h": (hi - lo).astype(np.int64)})

    return (
        ds.map_batches(expand, batch_format="pandas")
        .groupby("bucket")
        .map_groups(count_bucket, batch_format="pandas")
    )


INACTIVE_CUTOFF = "2000-01-01"


def q_inactive_customers(sf_dir: str):
    """Distributed ANTI-JOIN (NOT EXISTS — the §2.4 join family member
    the other queries lack): customers with no order on/after the
    cutoff. The probe side shrinks BEFORE any exchange: orders is
    pruned to (o_custkey, o_orderdate) at the read, date-filtered
    map-side, and each batch emits only its DISTINCT surviving keys
    (combiner), so the shuffle carries at most one int64 per (batch,
    active customer). The build side ships only (custkey, name,
    acctbal). Native hash left_anti join, size-derived partition count
    with the measured CPU clamp (see q_order_revenue_join)."""
    import pandas as pd
    import pyarrow.compute as pc

    cut = pa.scalar(pd.Timestamp(INACTIVE_CUTOFF), pa.timestamp("us"))
    n_cust = _read(sf_dir, "customer", ["c_custkey"]).count()
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])

    def active_keys(b: pa.Table) -> pa.Table:
        keys = (
            b.filter(pc.greater_equal(b.column("o_orderdate"), cut))
            .column("o_custkey").to_numpy()
        )
        return pa.Table.from_pydict(
            {"o_custkey": pa.array(np.unique(keys), pa.int64())})

    okeys = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
        active_keys, batch_format="pyarrow")

    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_part = max(8, min(dd.derive_buckets(n_cust), cpus // 2))
    anti = cust.join(
        okeys, "left_anti", n_part,
        on=("c_custkey",), right_on=("o_custkey",),
        aggregator_ray_remote_args=_join_remote_args(n_part),
    )

    def project(df):
        import pandas as pd

        return pd.DataFrame(
            {"c_custkey": df["c_custkey"].to_numpy(np.int64),
             "c_name": df["c_name"],
             "acctbal_c": _cents_col(df["c_acctbal"])})

    return anti.map_batches(project, batch_format="pandas")


# ------------------------------------------------------ embeddings queries


def q_embeddings_by_label(sf_dir: str):
    ds = _read(sf_dir, "embeddings", ["label"])
    return ds.groupby("label").aggregate(Count(alias_name="n_vecs"))


def q_label_centroids(sf_dir: str):
    """Per-label embedding centroid (class centroids / semantic-dedup
    cluster means), one (label, dim) row per output cell. Per-batch
    numpy partial sums mean only labels×dims tiny partial rows ever
    shuffle — the vectors themselves never cross an exchange, so the
    exchange is independent of corpus size. Integer-exact: each
    float32 component is floor(x·10⁶) in both engines and the mean is
    floor-div — no floating aggregation order to disagree on."""
    import pandas as pd

    ds = _read(sf_dir, "embeddings", ["label", "embedding"])

    def partial(df):
        mat = np.floor(
            np.stack(df["embedding"].to_numpy()).astype(np.float64) * 1e6
        ).astype(np.int64)
        labels = df["label"].to_numpy()
        out = []
        for lab in np.unique(labels):
            rows = mat[labels == lab]
            out.append(pd.DataFrame({
                "label": np.int64(lab),
                "dim": np.arange(mat.shape[1], dtype=np.int64),
                "n_vecs": np.int64(len(rows)),
                "sum_micro": rows.sum(axis=0, dtype=np.int64),
            }))
        return pd.concat(out, ignore_index=True)

    def finish(df):
        return pd.DataFrame({
            "label": df["label"].to_numpy(np.int64),
            "dim": df["dim"].to_numpy(np.int64),
            "n_vecs": df["n_vecs"].to_numpy(np.int64),
            "centroid_micro":
                df["sum_micro"].to_numpy(np.int64)
                // df["n_vecs"].to_numpy(np.int64),
        })

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["label", "dim"])
        .aggregate(Sum("n_vecs", alias_name="n_vecs"),
                   Sum("sum_micro", alias_name="sum_micro"))
        .map_batches(finish, batch_format="pandas")
    )


def q_vector_stats(sf_dir: str):
    """Per-vector list/array scalar functions (§2.8 array coverage):
    squared L2 norm in exact milli² units (each float32 component →
    floor(x·10³), squared and summed — integer-exact in both engines),
    the argmax-|component| dimension (tie-break: smallest dim), and
    the positive-component count. Pure map-side numpy over the whole
    component matrix at once — one vectorized pass per batch, no
    shuffle at all."""
    import pandas as pd

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def stats(df):
        mat = np.floor(
            np.stack(df["embedding"].to_numpy()).astype(np.float64) * 1e3
        ).astype(np.int64)
        a = np.abs(mat)
        return pd.DataFrame({
            "vec_id": df["vec_id"].to_numpy(np.int64),
            "sq_norm_milli2": (mat * mat).sum(axis=1),
            "argmax_dim": a.argmax(axis=1).astype(np.int64),
            "n_pos": (mat > 0).sum(axis=1).astype(np.int64),
        })

    return ds.map_batches(stats, batch_format="pandas")


N_KNN_QUERIES = 10
KNN_K = 5


def _query_vectors(sf_dir: str) -> dict[int, list[float]]:
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    out = {}
    for vid, emb in zip(t.column("vec_id").to_pylist(),
                        t.column("embedding").to_pylist()):
        if vid < N_KNN_QUERIES:
            out[int(vid)] = emb
    return out


def q_knn_cosine(sf_dir: str):
    """Brute-force cosine top-5 for queries (vec_id < 10): broadcast
    query matrix, per-batch matmul partial top-k, tiny global reduce."""
    qref = ray.put(_query_vectors(sf_dir))
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    partials = ds.map_batches(
        sim.CosineTopKPartial(qref, KNN_K),
        batch_format="pyarrow",
        batch_size=512,
    )
    return partials.groupby("query_id").map_groups(
        lambda g: sim.global_topk(g, KNN_K), batch_format="pandas"
    )


def q_ann_ivf(sf_dir: str):
    """IVF-bucketed ANN (the scale path): Lloyd-trained centroids,
    bucket assignment in map_batches, nprobe=4 probing. Approximate →
    no SQL oracle; recall vs brute force is asserted in tests."""
    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cents = sim.train_centroids(ds, n_centroids=16, iters=3)
    cref = ray.put(cents)
    qvecs = _query_vectors(sf_dir)
    qmat = sim.normalize(np.asarray([qvecs[i] for i in sorted(qvecs)], dtype=np.float64))
    csims = qmat @ cents.T
    probes = {
        int(qid): [int(c) for c in np.argsort(-csims[i])[:4]]
        for i, qid in enumerate(sorted(qvecs))
    }
    pref = ray.put(probes)
    qref = ray.put(qvecs)
    assigned = ds.map_batches(
        sim.IvfAssign(cref), batch_format="pyarrow", batch_size=512,
    )
    partials = assigned.map_batches(
        sim.IvfTopKPartial(qref, pref, KNN_K),
        batch_format="pyarrow",
        batch_size=512,
    )
    return partials.groupby("query_id").map_groups(
        lambda g: sim.global_topk(g, KNN_K), batch_format="pandas"
    )


# ------------------------------------------------------ multimodal queries


def _text_payload(batch: pa.Table) -> pa.Table:
    """documents.text → opaque binary payload column (the stand-in for
    image/audio/video bytes in the multimodal stages)."""
    payloads = [t.encode("utf-8") for t in batch.column("text").to_pylist()]
    return pa.Table.from_pydict(
        {"doc_id": batch.column("doc_id"),
         "payload": pa.array(payloads, pa.binary())}
    )


# synthetic image slice: format by doc_id mod, dims from text length
# (both SQL-derivable, so the oracle predicts the REAL decoder's
# output); slice 4 stays a raw-bytes payload exercising the stub path
_IMG_FMTS = ("ppm", "bmp", "png", "jpeg")  # doc_id % 5 ∈ 0..3; 4 = raw


def _image_payload(batch: pa.Table) -> pa.Table:
    """documents → binary image payloads: REAL PPM/BMP/PNG files
    (sources/corpus.synth_image) with dims w = 4 + L%60,
    h = 4 + 3L%60 (L = utf-8 text bytes), pixel content tiling the
    text bytes; the JPEG slice (doc_id % 5 = 3) is a REAL baseline
    sequential grayscale JPEG (synth_jpeg_gray — full entropy-coded
    scan, dims 8·(1+L%7) × 8·(1+3L%7), each 8×8 block the constant
    text byte at its block index, fully decodable by
    decode_jpeg_pixels); every 5th doc keeps raw text bytes (no image
    magic) to exercise the decode stage's declared stub fallback."""
    from ..sources.corpus import synth_image, synth_jpeg_gray

    ids = batch.column("doc_id").to_pylist()
    payloads: list[bytes] = []
    for i, t in zip(ids, batch.column("text").to_pylist()):
        raw = t.encode("utf-8")
        sel = i % 5
        n = len(raw)
        if sel == 4:
            payloads.append(raw)
        elif sel == 3:
            payloads.append(synth_jpeg_gray(
                8 * (1 + n % 7), 8 * (1 + (n * 3) % 7), raw))
        else:
            payloads.append(synth_image(
                _IMG_FMTS[sel], 4 + n % 60, 4 + (n * 3) % 60, raw))
    return pa.Table.from_pydict(
        {"doc_id": batch.column("doc_id"),
         "payload": pa.array(payloads, pa.binary())}
    )


def q_multimodal_decode(sf_dir: str):
    """Binary-column image decode: a REAL stdlib kernel
    (functions/image_codec.py — header parse for PPM/BMP/JPEG, full
    pixel unfilter for PNG) behind an actor-pool map_batches stage;
    unrecognized payloads (the raw slice) fall back to the declared
    deterministic stub. The oracle predicts the decoder's output from
    the payload-generation rule."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    ds = ds.map_batches(_image_payload, batch_format="pyarrow")
    return ds.map_batches(
        ImageDecodeStage(), batch_format="pyarrow", batch_size=128,
    )


RESIZE_MAX_SIDE = 16  # small enough that the sf corpus images (≤63px)
#                       actually exercise the resample path


def q_multimodal_resize(sf_dir: str):
    """REAL thumbnailing over the image slice: PPM/BMP/PNG payloads
    are decoded to pixels and NEAREST-NEIGHBOR resampled to an
    aspect-preserving RESIZE_MAX_SIDE bound with integer index math
    ((i·src)//dst); the signature is the md5 of the exact output
    buffer, which the oracle rebuilds pixel-by-pixel in the hex
    domain. Header-only JPEG keeps its real header dims (wire-byte
    signature); the raw slice runs the declared stub dims."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    return (
        ds.map_batches(_image_payload, batch_format="pyarrow")
        .map_batches(ImageResampleStage(RESIZE_MAX_SIDE),
                     batch_format="pyarrow", batch_size=128)
    )


def q_multimodal_features(sf_dir: str):
    """Feature-extraction stage over the image slice — a REAL kernel
    for the fully-decodable rasters: PPM/BMP/PNG payloads are decoded
    to pixels (incl. the PNG inflate+unfilter chain) and the feature
    signature is the md5 of the DECODED buffer; header-only JPEG and
    the raw slice fall back to wire-byte features (kind='wire'). The
    oracle reconstructs the exact pixel/wire buffers in the hex domain
    from the payload-generation rule and matches md5-for-md5."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    return (
        ds.map_batches(_image_payload, batch_format="pyarrow")
        .map_batches(FeatureExtractStage(), batch_format="pyarrow",
                     batch_size=128)
    )


def _ocr_payload(batch: pa.Table) -> pa.Table:
    """documents → planted bitmap-font OCR strips. The planted string
    is upper(substr(regexp_replace(text,'[^A-Za-z0-9 ]','','g'),1,32))
    — filtered to ASCII BEFORE uppercasing so Python and DuckDB agree
    byte-for-byte — rendered through sources/corpus.render_ocr_png.
    Every 7th doc renders with deterministic sub-budget pixel noise
    (the matcher must still recover exactly); docs whose planted
    string is empty carry raw text bytes (no image magic) to exercise
    the no_image leg."""
    from ..sources.corpus import render_ocr_png

    ids = batch.column("doc_id").to_pylist()
    payloads: list[bytes] = []
    noisy: list[bool] = []
    for i, t in zip(ids, batch.column("text").to_pylist()):
        planted = re.sub(r"[^A-Za-z0-9 ]", "", t or "")[:32].upper()
        if not planted:
            payloads.append((t or "").encode("utf-8"))
            noisy.append(False)
        else:
            nz = i % 7 == 3
            payloads.append(
                render_ocr_png(planted, noise_seed=i if nz else None))
            noisy.append(nz)
    return pa.Table.from_pydict(
        {"doc_id": batch.column("doc_id"),
         "payload": pa.array(payloads, pa.binary()),
         "noisy": pa.array(noisy, pa.bool_())})


def q_ocr_text(sf_dir: str):
    """OCR TEXT-FROM-PIXELS over the corpus's bitmap-font image slice
    — the end-to-end-real form of the reference's image→markdown leg
    (services/document_service.py:826-907; VERDICT r4 task 3): planted
    strings render to real grayscale PNGs (full filter/inflate wire
    format), an ACTOR-POOL OcrStage decodes pixels and nearest-
    template-matches every 8×8 glyph cell, and the recovered text
    must equal the planted ground truth BYTE-EXACTLY — on the clean
    slice and on the noisy slice (≤4 flipped pixels/cell, under the
    font table's Hamming-distance budget). The oracle recomputes the
    planted string in SQL, so the whole render→decode→match loop is
    hash-gated."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    # instance (task-pool) form, like the sibling multimodal stages:
    # the stage's only state is the tiny glyph table, so an actor
    # pool would pay spin-up for nothing — a REAL OCR model swaps in
    # as map_batches(OcrStage, concurrency=N) with the same __call__
    return (
        ds.map_batches(_ocr_payload, batch_format="pyarrow")
        .map_batches(OcrStage(), batch_format="pyarrow",
                     batch_size=128)
    )


def _audio_payload(batch: pa.Table) -> pa.Table:
    """documents → audio payloads: doc_id % 3 ∈ {0,1} carry REAL
    PCM16-mono WAV files (sources/corpus.synth_wav) with
    rate = 8000 + 100·(L % 80), n_samples = 16 + L % 500 and PCM
    tiling the text bytes (all SQL-derivable); every third doc keeps
    raw text bytes exercising the declared wire fallback."""
    from ..sources.corpus import synth_wav

    ids = batch.column("doc_id").to_pylist()
    payloads: list[bytes] = []
    for i, t in zip(ids, batch.column("text").to_pylist()):
        raw = t.encode("utf-8")
        if i % 3 == 2:
            payloads.append(raw)
        else:
            n = len(raw)
            payloads.append(
                synth_wav(8000 + 100 * (n % 80), 16 + n % 500, raw))
    return pa.Table.from_pydict(
        {"doc_id": batch.column("doc_id"),
         "payload": pa.array(payloads, pa.binary())}
    )


def q_audio_decode(sf_dir: str):
    """Binary-column AUDIO decode — a REAL stdlib kernel
    (functions/audio_codec.decode_wav: RIFF chunk walk → PCM fields +
    payload) behind an actor-pool map_batches stage; the signature is
    the md5 of the raw PCM bytes so the oracle checks the DECODED
    payload, not just header fields. Non-RIFF payloads fall back to
    the declared wire leg."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    return (
        ds.map_batches(_audio_payload, batch_format="pyarrow")
        .map_batches(AudioDecodeStage(), batch_format="pyarrow",
                     batch_size=128)
    )


def q_dedup_keep_best(sf_dir: str):
    """Near-dup KEEP-LIST (the survivor pick production dedup runs
    after clustering): every doc gets its cluster representative
    (T29's connected components; unclustered docs are singletons) and
    exactly one doc per cluster is kept — the LONGEST (n_chars DESC,
    doc_id ASC tie-break), i.e. keep-best-quality rather than
    keep-first.

    Scale shape: the cluster table is bounded by the LSH candidate
    contract (≪ corpus), so the rep map broadcasts; clustered docs'
    quality metric comes from ONE pruned scan filtered map-side by
    the broadcast id set; the keep decision folds on the driver over
    the bounded clustered subset; a final map-side pass labels the
    full corpus with zero additional exchange."""
    import pandas as pd

    cl = q_near_dup_clusters(sf_dir)
    cdf = (cl.to_pandas() if hasattr(cl, "to_pandas") else cl)
    if not isinstance(cdf, pd.DataFrame):
        cdf = pd.DataFrame(cdf)
    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    if len(cdf):
        reps = dict(zip(cdf["doc_id"].astype(int),
                        cdf["rep_doc_id"].astype(int)))
        cset = np.sort(cdf["doc_id"].to_numpy(np.int64))
        cset_ref = ray.put(cset)

        def clustered_chars(df):
            s = sim.resolve_broadcast(cset_ref, key="keepbest-ids")
            ids = df["doc_id"].to_numpy(np.int64)
            pos = np.minimum(np.searchsorted(s, ids), len(s) - 1)
            m = s[pos] == ids
            return df.loc[m, ["doc_id", "n_chars"]]

        cc = (docs.map_batches(clustered_chars, batch_format="pandas")
              .to_pandas())  # bounded by the clustered subset
        cc["rep"] = cc["doc_id"].map(reps)
        cc = cc.sort_values(["rep", "n_chars", "doc_id"],
                            ascending=[True, False, True],
                            kind="mergesort")
        keep_ids = frozenset(
            int(x) for x in cc.groupby("rep").head(1)["doc_id"])
        # broadcast PARALLEL SORTED ARRAYS, not dict/set — the label
        # pass probes with one vectorized searchsorted per batch
        # instead of per-row Python membership (cf. big_orders fix)
        order = np.argsort(cdf["doc_id"].to_numpy(np.int64),
                           kind="mergesort")
        ckeys = cdf["doc_id"].to_numpy(np.int64)[order]
        cvals = cdf["rep_doc_id"].to_numpy(np.int64)[order]
        ckeep = np.fromiter((int(i) in keep_ids for i in ckeys),
                            bool, len(ckeys))  # bounded clustered subset
    else:
        ckeys = np.empty(0, np.int64)
        cvals = np.empty(0, np.int64)
        ckeep = np.empty(0, bool)
    state_ref = ray.put((ckeys, cvals, ckeep))

    def label(df):
        import pandas as pd

        ks, vs, kp = sim.resolve_broadcast(state_ref, key="keepbest-state")
        ids = df["doc_id"].to_numpy(np.int64)
        if len(ks):
            pos = np.minimum(np.searchsorted(ks, ids), len(ks) - 1)
            found = ks[pos] == ids
            # singleton (doc absent from the cluster table): rep=self,
            # keep=True; else the cluster table's rep + pick
            rep = np.where(found, vs[pos], ids)
            keep = np.where(found, kp[pos], True)
        else:
            rep, keep = ids, np.ones(len(ids), bool)
        return pd.DataFrame({
            "doc_id": ids,
            "rep_doc_id": rep,
            "n_chars": df["n_chars"].to_numpy(np.int64),
            "keep": keep,
        })

    return docs.map_batches(label, batch_format="pandas")


AC_PATTERNS = ("ta", "art", "row", "an", "ue")  # borderless substrings


class SubstringScanStage:
    """Actor-pool multi-pattern SUBSTRING scanner: __init__ builds the
    Aho-Corasick automaton once per actor (functions/acmatch.py —
    goto/fail/output construction, borderless-pattern guard so
    overlap == non-overlap and the replace()-trick oracle is exact);
    __call__ scans each doc in ONE pass independent of pattern count.
    This is the substring-blocklist shape token-level term_scrub (T30)
    cannot express (in-word matches)."""

    def __init__(self, patterns=AC_PATTERNS) -> None:
        from ..functions.acmatch import AhoCorasick

        self._ac = AhoCorasick(list(patterns))

    def __call__(self, batch: pa.Table) -> pa.Table:
        hits: list[int] = []
        npat: list[int] = []
        for t in batch.column("text").to_pylist():
            c = self._ac.counts(t)
            hits.append(sum(c))
            npat.append(sum(1 for x in c if x))
        return pa.Table.from_pydict({
            "doc_id": batch.column("doc_id"),
            "n_hits": pa.array(hits, pa.int64()),
            "n_patterns_hit": pa.array(npat, pa.int64()),
        })


def q_substring_scan(sf_dir: str):
    """Substring-blocklist scan over the corpus: a REAL Aho-Corasick
    automaton (stateful actor-pool stage — built once per actor, one
    pass per doc) counts every occurrence of each blocklist pattern,
    including in-word matches. Map-side only, zero exchange; the
    oracle mirrors via the non-overlapping replace() length trick,
    exact because the automaton enforces borderless patterns."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    return ds.map_batches(
        SubstringScanStage, batch_format="pyarrow",
        concurrency=(1, 8), batch_size=256,
    )


def q_audio_features(sf_dir: str):
    """Integer-exact loudness statistics over DECODED PCM samples
    (the RMS/clipping audit of an audio curation pipeline): int16 LE
    sample parse → Σ|x|, Σx², peak |x| — all int64-exact, so the
    oracle recomputes every sample from the generation rule with
    hex-digit arithmetic and matches bit-for-bit."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    return (
        ds.map_batches(_audio_payload, batch_format="pyarrow")
        .map_batches(AudioFeatureStage(), batch_format="pyarrow",
                     batch_size=128)
    )


GIF_MAX_FRAMES = 30  # synthetic animation length bound (1 + L % 30)
AVI_MAX_FRAMES = 40  # synthetic video length bound (1 + L % 40)


def _video_payload(batch: pa.Table) -> pa.Table:
    """documents → frame-sample payloads: doc_id % 3 == 0 carries a
    REAL animated GIF89a (sources/corpus.synth_gif_anim,
    1 + L % GIF_MAX_FRAMES frames), % 3 == 1 a REAL AVI container
    (sources/corpus.synth_avi, 1 + L % AVI_MAX_FRAMES '00dc' chunks)
    — the oracle predicts both REAL counters' output from the rule;
    % 3 == 2 keeps raw text bytes exercising the declared stub leg."""
    from ..sources.corpus import synth_avi, synth_gif_anim

    ids = batch.column("doc_id").to_pylist()
    payloads: list[bytes] = []
    for i, t in zip(ids, batch.column("text").to_pylist()):
        raw = t.encode("utf-8")
        if i % 3 == 0:
            payloads.append(
                synth_gif_anim(8, 8, 1 + len(raw) % GIF_MAX_FRAMES, raw))
        elif i % 3 == 1:
            payloads.append(synth_avi(1 + len(raw) % AVI_MAX_FRAMES, raw))
        else:
            payloads.append(raw)
    return pa.Table.from_pydict(
        {"doc_id": batch.column("doc_id"),
         "payload": pa.array(payloads, pa.binary())}
    )


def q_frame_sample(sf_dir: str):
    """Frame sampling with REAL frame counters on the GIF and AVI
    slices (GIF image-descriptor block walk; AVI RIFF-tree movi-chunk
    count — no codec decode needed, as in real tools); the raw slice
    runs the declared stub formula."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    ds = ds.map_batches(_video_payload, batch_format="pyarrow")
    return ds.map_batches(
        FrameSampleStage(), batch_format="pyarrow", batch_size=128,
    )


# --------------------------------------------- round-4 operators T73-T76

FUZZY_PREFIX_LEN = 16


def _ed_le1(a: str, b: str) -> int | None:
    """Exact edit distance when ≤ 1, else None (two-pointer check —
    no DP table for the bounded case)."""
    if a == b:
        return 0
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return None
    if la == lb:  # one substitution?
        diff = sum(1 for x, y in zip(a, b) if x != y)
        return 1 if diff == 1 else None
    if la > lb:
        a, b = b, a
        la, lb = lb, la
    # one deletion from b?
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return 1 if a[i:] == b[i + 1:] else None


def q_fuzzy_prefix_dups(sf_dir: str):
    """Fuzzy near-duplicate JOIN at edit distance ≤ 1 over the
    16-char text prefix — the deletion-neighborhood (FastSS/SymSpell)
    scheme: ed(a,b) ≤ 1 ⟺ ({a} ∪ deletions₁(a)) ∩ ({b} ∪
    deletions₁(b)) ≠ ∅, so each doc emits ≤ L+1 md5-hashed variant
    keys and ONLY variant-key int64s shuffle; candidate pairs form
    inside each variant group and are verified with the exact bounded
    edit-distance check, then distinct-ed by a pair-key bucketed
    reduce (a pair can share several variants). Per-variant fan-in is
    bounded by the docs sharing a 16-char near-prefix — the fuzzy
    analogue of exact_dedup's hash groups. Oracle: DuckDB
    ``levenshtein`` over the (bounded) self-join at sf gate scale."""
    import pandas as pd

    from ..functions.textstats import _md5_u64

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = docs.count()
    n_vb = dd.derive_buckets(n_docs, rows_per_doc=FUZZY_PREFIX_LEN + 1)

    def variants(b: pa.Table) -> pa.Table:
        ids_out: list[int] = []
        vh_out: list[int] = []
        pfx_out: list[str] = []
        for i, t in zip(b.column("doc_id").to_pylist(),
                        b.column("text").to_pylist()):
            p = t[:FUZZY_PREFIX_LEN]
            vs = {p}
            vs.update(p[:j] + p[j + 1:] for j in range(len(p)))
            for v in sorted(vs):
                ids_out.append(i)
                vh_out.append(_md5_u64(v.encode("utf-8")))
                pfx_out.append(p)
        vh = np.array(vh_out, np.uint64)
        return pa.Table.from_pydict(
            {"doc_id": pa.array(ids_out, pa.int64()),
             "vh": pa.array(vh.view(np.int64)),
             "pfx": pa.array(pfx_out, pa.string()),
             "bucket": pa.array((vh % np.uint64(n_vb)).astype(np.int32))})

    def candidate_pairs(g):
        a_out: list[int] = []
        b_out: list[int] = []
        d_out: list[int] = []
        for _vh, grp in g.groupby("vh", sort=True):
            if len(grp) < 2:
                continue
            rows = sorted(zip(grp["doc_id"].to_numpy(np.int64),
                              grp["pfx"].to_numpy()))
            # drop same-doc repeats (a doc can emit one variant twice
            # only via distinct deletions colliding — vs is a set, so
            # repeats here are cross-doc only)
            for i in range(len(rows)):
                for j in range(i + 1, len(rows)):
                    ia, pa_ = rows[i]
                    ib, pb = rows[j]
                    if ia == ib:
                        continue
                    d = _ed_le1(pa_, pb)
                    if d is not None:
                        a_out.append(ia)
                        b_out.append(ib)
                        d_out.append(d)
        return pd.DataFrame({
            "doc_id_a": np.array(a_out, np.int64),
            "doc_id_b": np.array(b_out, np.int64),
            "edit_dist": np.array(d_out, np.int64)})

    n_pb = dd.derive_buckets(n_docs)

    def pair_bucket(df):
        return df.assign(
            bucket=(df["doc_id_a"] % n_pb).astype("int32"))

    def pair_distinct(g):
        return g.drop_duplicates(
            subset=["doc_id_a", "doc_id_b"]
        )[["doc_id_a", "doc_id_b", "edit_dist"]]

    return (
        docs.map_batches(variants, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(candidate_pairs, batch_format="pandas")
        .map_batches(pair_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(pair_distinct, batch_format="pandas")
    )


SAMPLE_PER_LANG_K = 20


def q_sample_k_per_lang(sf_dir: str):
    """Exact k-per-STRATUM sample (per-group reservoir made
    deterministic): each language keeps its k smallest Knuth-hash
    docs. Per-batch partial top-k PER GROUP bounds every block's
    output at k rows per stratum present in it — the min-k combiner is
    mergeable, so membership is partitioning-independent; the final
    per-lang reduce orders ≤ k·n_blocks rows. The missing shape
    between q_sample_exact_k (global k) and q_stratified_sample
    (per-group RATES)."""

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def partial(df):
        df = df.assign(h=_knuth32(df["doc_id"].to_numpy(np.int64)))
        return (df.sort_values(["lang", "h", "doc_id"], kind="mergesort")
                .groupby("lang", as_index=False, sort=False)
                .head(SAMPLE_PER_LANG_K))

    def final(g):
        return (g.sort_values(["h", "doc_id"], kind="mergesort")
                .head(SAMPLE_PER_LANG_K)
                [["doc_id", "lang", "n_chars", "h"]])

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("lang")
        .map_groups(final, batch_format="pandas")
    )


WINDOW_DEDUP_US = 3_600_000_000  # 1 hour


def q_window_dedup(sf_dir: str):
    """Streaming burst suppression (windowed dedup): drop an event
    when the same (user, event_type) fired within the preceding hour
    — the click-storm hygiene filter a training-data event pipeline
    runs before sessionization. EXISTS semantics (a dropped row still
    suppresses its successors), which reduces to one lag-gap test per
    row after a per-user-key sort: an earlier same-key row within the
    window exists iff the IMMEDIATE predecessor is within it. Events
    co-partition by user hash; each bucket sorts once, the gap test is
    vectorized; no global sort."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
    n_buckets = dd.derive_buckets(ds.count())

    def bucketize(df):
        return df.assign(
            bucket=(df["user_id"] % n_buckets).astype("int32"))

    def suppress(g):
        g = g.sort_values(["user_id", "event_type", "ts", "event_id"],
                          kind="mergesort")
        ts = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy()
        new_key = np.ones(len(g), dtype=bool)
        if len(g) > 1:
            new_key[1:] = (uid[1:] != uid[:-1]) | (et[1:] != et[:-1])
        gap = np.empty(len(g), dtype=np.int64)
        gap[0] = WINDOW_DEDUP_US + 1
        if len(g) > 1:
            gap[1:] = ts[1:] - ts[:-1]
        keep = new_key | (gap > WINDOW_DEDUP_US)
        out = g[keep]
        return pd.DataFrame({
            "event_id": out["event_id"].to_numpy(np.int64),
            "user_id": out["user_id"].to_numpy(np.int64),
            "event_type": out["event_type"].to_numpy(),
            "ts": out["ts"],
        })

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(suppress, batch_format="pandas")
    )


MIX_K = 200


def q_dataset_mix(sf_dir: str):
    """Weighted SOURCE INTERLEAVE — the data-mixing order a training
    run consumes multi-source corpora in: each source s gets weight
    w(s) = 1 + (numeric suffix % 5); doc r-th in its source's
    deterministic shuffle order (Knuth hash) is scheduled at
    mix_pos = r·10⁶ // w, and the first MIX_K positions form the mix
    slice (heavier sources appear proportionally more often — the
    standard weighted round-robin). Distributed shape: the global
    top-MIX_K of mix_pos can only contain each source's first MIX_K
    docs, so a per-source min-k combiner (≤ k rows per block per
    source) + per-source reduce bounds the driver set at
    MIX_K·n_sources rows; ranks, positions and the final slice are
    computed there. No global sort, no full shuffle."""
    import pandas as pd

    ds = _read(sf_dir, "documents", ["doc_id", "source"])

    def partial(df):
        df = df.assign(h=_knuth32(df["doc_id"].to_numpy(np.int64)))
        return (df.sort_values(["source", "h", "doc_id"], kind="mergesort")
                .groupby("source", as_index=False, sort=False)
                .head(MIX_K))

    def per_source(g):
        return (g.sort_values(["h", "doc_id"], kind="mergesort")
                .head(MIX_K)[["doc_id", "source", "h"]])

    small = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("source")
        .map_groups(per_source, batch_format="pandas")
        .to_pandas()  # ≤ MIX_K · n_sources rows by construction
    )
    if small.empty:
        return pd.DataFrame({
            "doc_id": pd.Series([], dtype=np.int64),
            "source": pd.Series([], dtype=object),
            "rank_in_source": pd.Series([], dtype=np.int64),
            "mix_pos": pd.Series([], dtype=np.int64)})
    small = small.sort_values(["source", "h", "doc_id"], kind="mergesort")
    small["rank_in_source"] = small.groupby("source").cumcount() + 1
    w = 1 + small["source"].str.extract(r"(\d+)$")[0].astype(np.int64) % 5
    small["mix_pos"] = (small["rank_in_source"].to_numpy(np.int64)
                        * 1_000_000) // w.to_numpy(np.int64)
    out = small.sort_values(["mix_pos", "source", "doc_id"],
                            kind="mergesort").head(MIX_K)
    return out[["doc_id", "source", "rank_in_source",
                "mix_pos"]].reset_index(drop=True)


PMI_MIN_PAIRS = 5  # bigram support floor — the PMI scale lever
PMI_BCAST_MAX_VOCAB = 2_000_000  # unigram-map broadcast gate (tfidf precedent)


def q_bigram_pmi(sf_dir: str):
    """Collocation mining: top-20 word bigrams by pointwise mutual
    information (the classic phrase-detection signal a training-data
    pipeline runs to pick merge-worthy token pairs). PMI ranking is
    monotone in c_xy·N_uni² / (N_bi·c_x·c_y), so the score is computed
    as exact-integer micro-units (Python bigints engine-side, HUGEINT
    in the oracle) — no libm, order-independent.

    Shape: ONE corpus pass emits unigram AND bigram count partials
    (unigram rows ride the same exchange with a ''-sentinel second
    word); a crc-bucketed vectorized reduce collapses them (vocabulary
    keys — the native per-key aggregate is the measured 30× pitfall);
    the support floor ``c ≥ PMI_MIN_PAIRS`` prunes the Zipf tail
    BEFORE the two native hash joins that attach c_x and c_y, so join
    input is the candidate set, not the bigram domain. Scoring is a
    per-candidate bigint loop (bounded by the support floor), then a
    per-batch partial top-20 → tiny global sort. The corpus is read
    once; only (word, word, count) rows ever shuffle."""
    import pandas as pd
    import pyarrow.compute as pc

    from ..functions import textstats as ts

    ds = _read(sf_dir, "documents", ["text"])
    n_docs = ds.count()
    nb = dd.derive_buckets(n_docs, rows_per_doc=32)

    def partials(df):
        from collections import Counter

        uni: Counter = Counter()
        bi: Counter = Counter()
        for text in df["text"]:
            tk = ts.tokens(text.lower())
            uni.update(tk)
            bi.update(zip(tk[:-1], tk[1:]))
        w1 = [w for w in uni] + [p[0] for p in bi]
        w2 = [""] * len(uni) + [p[1] for p in bi]
        c = [uni[w] for w in uni] + [bi[p] for p in bi]
        return pd.DataFrame({"w1": w1, "w2": w2,
                             "c": np.asarray(c, np.int64)})

    def bucketize(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            t.column("w1"), t.column("w2"), "\x00")
        return _crc_bucket_col(t.append_column("k", key), "k", nb)

    def reduce_counts(g):
        s = g.groupby(["w1", "w2"], as_index=False).agg(c=("c", "sum"))
        return s.astype({"c": "int64"})

    counts = (
        ds.map_batches(partials, batch_format="pandas")
        .map_batches(bucketize, batch_format="pyarrow")
        .drop_columns(["k"])
        .groupby("bucket")
        .map_groups(reduce_counts, batch_format="pandas")
        .materialize()  # vocabulary-sized (Heaps-law bounded); reused
        #                 as unigram build side ×2 + bigram probe + totals
    )
    uni = counts.map_batches(
        lambda t: t.filter(pc.equal(t.column("w2"), "")).select(["w1", "c"]),
        batch_format="pyarrow",
    )
    bi_all = counts.map_batches(
        lambda t: t.filter(pc.not_equal(t.column("w2"), "")).select(
            ["w1", "w2", "c"]),
        batch_format="pyarrow",
    )
    n_uni = int(uni.sum("c"))
    n_bi = int(bi_all.sum("c") or 0)

    cand = bi_all.map_batches(
        lambda t: t.filter(
            pc.greater_equal(t.column("c"), PMI_MIN_PAIRS)
        ).rename_columns(["w1", "w2", "n_pairs"]),
        batch_format="pyarrow",
    )
    def score(df):
        # exact bigint PMI micro-score on the support-floored candidate
        # set only (the per-row Python cost IS the work: the values
        # exceed int64 by construction — c·Nu²·10⁶)
        pmi = [
            int(c) * n_uni * n_uni * 1_000_000
            // (n_bi * int(cx) * int(cy))
            for c, cx, cy in zip(df["n_pairs"], df["cx"], df["cy"])
        ]
        out = pd.DataFrame({
            "w1": df["w1"], "w2": df["w2"],
            "n_pairs": df["n_pairs"].to_numpy(np.int64),
            "pmi_micro": np.asarray(pmi, np.int64),
        })
        return out.sort_values(
            ["pmi_micro", "w1", "w2"], ascending=[False, True, True],
            kind="mergesort").head(20)

    n_vocab = max(1, uni.count())
    if n_vocab <= PMI_BCAST_MAX_VOCAB:
        # SMALL-VOCABULARY fast path (the tfidf size-gated precedent):
        # the (word → count) map broadcasts once and c_x/c_y attach
        # map-side — no hash-join actor ramp for a Heaps-law-bounded
        # natural-language vocabulary. An open vocabulary (urls,
        # ids …) exceeds the gate and takes the join path below.
        uni_pd = uni.to_pandas()
        uni_ref = ray.put(dict(zip(uni_pd["w1"], uni_pd["c"])))

        def score_bcast(df):
            m = sim.resolve_broadcast(uni_ref, key="pmi-uni")
            df = df.assign(cx=df["w1"].map(m).astype(np.int64),
                           cy=df["w2"].map(m).astype(np.int64))
            return score(df)

        scored = cand.map_batches(score_bcast, batch_format="pandas")
    else:
        # repartition to guaranteed-nonempty build blocks (the tfidf
        # join-path hazard: an all-empty build partition arrives
        # schema-less at pyarrow's hash join)
        n_blk = max(1, min(64, -(-n_vocab // 50_000)))
        u1 = uni.map_batches(
            lambda t: t.rename_columns(["w1", "cx"]),
            batch_format="pyarrow").repartition(n_blk)
        u2 = uni.map_batches(
            lambda t: t.rename_columns(["w2", "cy"]),
            batch_format="pyarrow").repartition(n_blk)
        np_j = max(2, min(dd.derive_buckets(n_vocab),
                          int(ray.cluster_resources().get("CPU", 8)) // 4))
        joined = cand.join(
            u1, "inner", np_j, on=("w1",), right_on=("w1",),
            aggregator_ray_remote_args=_join_remote_args(np_j),
        ).join(
            u2, "inner", np_j, on=("w2",), right_on=("w2",),
            aggregator_ray_remote_args=_join_remote_args(np_j),
        )
        scored = joined.map_batches(score, batch_format="pandas")

    return (
        scored
        .sort(["pmi_micro", "w1", "w2"], descending=[True, False, False])
        .limit(20)
    )


_SQ_SPLIT = 1 << 30  # hi/lo split base for exact Σx² / Σxy partials


def _split_sq_sums(sq: "np.ndarray") -> tuple["np.ndarray", "np.ndarray"]:
    """Exact big-sum partials: each per-row product (≤ 2^40 here) is
    split into (hi = q >> 30, lo = q & (2^30−1)) int64 columns whose
    independent sums stay in int64 for ≥ 2^23·corpus rows; the final
    tiny reduce reassembles Σ = Σhi·2^30 + Σlo in Python bigints. This
    is how an exact second moment survives 100 TB without a 128-bit
    Arrow type."""
    return sq >> 30, sq & (_SQ_SPLIT - 1)


def q_value_variance(sf_dir: str):
    """Exact grouped population variance of event value (the
    statistical-aggregate family: one pass, mergeable partials). Per
    batch: n, Σx, and the hi/lo-split Σx² per event_type in integer
    milli-units; a native 5-key groupby sums partials; the final
    var = (n·Σx² − (Σx)²) // n² is Python-bigint exact (HUGEINT in
    the oracle). No shuffle beyond ≤ n_types partial rows per batch."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(df):
        x = np.floor(df["value"].to_numpy(np.float64) * 1000 + 0.5).astype(
            np.int64)
        hi, lo = _split_sq_sums(x * x)
        out = pd.DataFrame({"event_type": df["event_type"], "x": x,
                            "hi": hi, "lo": lo})
        g = out.groupby("event_type", as_index=False).agg(
            n_events=("x", "size"), s1=("x", "sum"),
            s2_hi=("hi", "sum"), s2_lo=("lo", "sum"))
        return g.astype({"n_events": "int64", "s1": "int64",
                         "s2_hi": "int64", "s2_lo": "int64"})

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("n_events", alias_name="n_events"),
                   Sum("s1", alias_name="s1"),
                   Sum("s2_hi", alias_name="s2_hi"),
                   Sum("s2_lo", alias_name="s2_lo"))
        .to_pandas()  # n_event_types rows: tiny
    )
    var = [
        (int(n) * (int(hi) * _SQ_SPLIT + int(lo)) - int(s1) * int(s1))
        // (int(n) * int(n))
        for n, s1, hi, lo in zip(agg["n_events"], agg["s1"],
                                 agg["s2_hi"], agg["s2_lo"])
    ]
    out = pd.DataFrame({
        "event_type": agg["event_type"],
        "n_events": agg["n_events"].to_numpy(np.int64),
        "var_milli2": np.asarray(var, np.int64),
    })
    return out.sort_values("event_type", kind="mergesort").reset_index(
        drop=True)


def q_price_date_cov(sf_dir: str):
    """Exact grouped population covariance (two-column co-moment —
    price drift over order date per priority class). Same mergeable-
    partial shape as q_value_variance with the cross-product Σxy
    hi/lo-split: x = totalprice cents, y = epoch days; cov =
    (n·Σxy − Σx·Σy) // n² in cents·days, bigint-exact both sides."""
    import pandas as pd

    ds = _read(sf_dir, "orders",
               ["o_orderpriority", "o_totalprice", "o_orderdate"])

    def partial(df):
        x = _cents_col(df["o_totalprice"])
        y = (df["o_orderdate"].to_numpy("datetime64[us]").astype(np.int64)
             // 86_400_000_000)
        hi, lo = _split_sq_sums(x * y)
        out = pd.DataFrame({"o_orderpriority": df["o_orderpriority"],
                            "x": x, "y": y, "hi": hi, "lo": lo})
        g = out.groupby("o_orderpriority", as_index=False).agg(
            n_orders=("x", "size"), sx=("x", "sum"), sy=("y", "sum"),
            sxy_hi=("hi", "sum"), sxy_lo=("lo", "sum"))
        return g.astype({c: "int64" for c in
                         ("n_orders", "sx", "sy", "sxy_hi", "sxy_lo")})

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("o_orderpriority")
        .aggregate(Sum("n_orders", alias_name="n_orders"),
                   Sum("sx", alias_name="sx"),
                   Sum("sy", alias_name="sy"),
                   Sum("sxy_hi", alias_name="sxy_hi"),
                   Sum("sxy_lo", alias_name="sxy_lo"))
        .to_pandas()  # n_priorities rows: tiny
    )
    cov = [
        (int(n) * (int(hi) * _SQ_SPLIT + int(lo)) - int(sx) * int(sy))
        // (int(n) * int(n))
        for n, sx, sy, hi, lo in zip(agg["n_orders"], agg["sx"], agg["sy"],
                                     agg["sxy_hi"], agg["sxy_lo"])
    ]
    out = pd.DataFrame({
        "o_orderpriority": agg["o_orderpriority"],
        "n_orders": agg["n_orders"].to_numpy(np.int64),
        "cov_cents_days": np.asarray(cov, np.int64),
    })
    return out.sort_values("o_orderpriority", kind="mergesort").reset_index(
        drop=True)


def q_lang_source_cube(sf_dir: str):
    """GROUP BY CUBE — all four grouping sets of (lang, source) in ONE
    corpus pass (completes the grouping-sets family next to
    lang_source_rollup's three): the per-batch combiner additionally
    emits the (ALL, source) level, so the shuffle still carries only
    tiny partial rows and the table is read once instead of four
    times."""
    import pandas as pd

    ds = _read(sf_dir, "documents", ["lang", "source", "n_chars"])

    def partial(df):
        base = df.groupby(["lang", "source"], as_index=False).agg(
            n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum"))
        by_lang = base.groupby("lang", as_index=False).agg(
            n_docs=("n_docs", "sum"), sum_chars=("sum_chars", "sum"))
        by_lang["source"] = ROLLUP_ALL
        by_source = base.groupby("source", as_index=False).agg(
            n_docs=("n_docs", "sum"), sum_chars=("sum_chars", "sum"))
        by_source["lang"] = ROLLUP_ALL
        total = pd.DataFrame({
            "lang": [ROLLUP_ALL], "source": [ROLLUP_ALL],
            "n_docs": [base["n_docs"].sum()],
            "sum_chars": [base["sum_chars"].sum()],
        })
        out = pd.concat([base, by_lang, by_source, total],
                        ignore_index=True)
        return out.astype({"n_docs": "int64", "sum_chars": "int64"})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby(["lang", "source"])
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("sum_chars", alias_name="sum_chars"))
    )


NTILE_K = 10


def q_ntile_deciles(sf_dir: str):
    """Equal-frequency bucketing (NTILE(10) over (n_chars, doc_id) —
    the quantile-binning step of score calibration) without a global
    sort: phase 1 builds the value-domain histogram (combiner; only
    distinct (value, count) rows shuffle) whose driver cumsum gives
    every value's global rank offset AND exact NTILE boundaries
    (first N mod k buckets take ⌈N/k⌉ rows — duckdb semantics);
    phase 2 groups by value, ranks ties by doc_id inside each
    (bounded) tie group, maps ranks to tiles vectorized, and emits
    per-tile partials. Per-value tie groups are assumed block-sized
    (documented; a doc_id-range sub-split with a second offset pass
    is the escape hatch at pathological tie mass)."""
    import pandas as pd

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def hist(df):
        vc = df["n_chars"].value_counts()
        return pd.DataFrame({"v": vc.index.to_numpy(np.int64),
                             "c": vc.to_numpy(np.int64)})

    # two-level map_batches tree reduce (no sort): per-block partial
    # histograms are value-domain-bounded, so level 1 coalesces block
    # partials and level 2 folds them in one tiny task — the native
    # per-key aggregate pays measured per-key overhead here
    def hist_fold(df):
        return df.groupby("v", as_index=False).agg(c=("c", "sum"))

    h = (
        ds.map_batches(hist, batch_format="pandas")
        .repartition(8)
        .map_batches(hist_fold, batch_format="pandas")
        .repartition(1)
        .map_batches(hist_fold, batch_format="pandas")
        .to_pandas()  # value-domain-sized: tiny
        .sort_values("v")
    )
    n_total = int(h["c"].sum())
    vals = h["v"].to_numpy(np.int64)
    offsets = np.concatenate([[0], h["c"].cumsum().to_numpy(np.int64)[:-1]])
    # parallel sorted arrays, not a dict: the per-bucket pass looks
    # offsets up vectorized via searchsorted
    off_ref = ray.put((vals, offsets))
    base, rem = divmod(n_total, NTILE_K)
    cut = rem * (base + 1)

    # VALUE-hash buckets, ONE vectorized pass per bucket over all its
    # value groups (a per-value map_groups invoked Python 523× at
    # sf0.1 and cost 7.3 s; same-value rows still co-locate because
    # the bucket key is a pure function of the value)
    cpus = int(ray.cluster_resources().get("CPU", 8))
    nb_t = max(8, min(64, cpus * 2))

    def add_bucket(df):
        v = df["n_chars"].to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "n_chars": v,
            "bucket": (v % nb_t).astype(np.int32),
        })

    def tile_bucket(g):
        vs_b, off_b = sim.resolve_broadcast(off_ref, key="ntile-offsets")
        g = g.sort_values(["n_chars", "doc_id"], kind="mergesort")
        v = g["n_chars"].to_numpy(np.int64)
        n = len(v)
        idx = np.arange(n, dtype=np.int64)
        starts = np.r_[0, np.flatnonzero(np.diff(v)) + 1]
        counts = np.diff(np.r_[starts, n])
        grp_start = np.repeat(starts, counts)
        rank = off_b[np.searchsorted(vs_b, v)] + (idx - grp_start) + 1
        if base == 0:
            tile = rank
        else:
            tile = np.where(
                rank <= cut,
                (rank - 1) // (base + 1),
                rem + (rank - 1 - cut) // max(base, 1),
            ) + 1
        out = pd.DataFrame({"decile": tile.astype(np.int64), "n_chars": v})
        return out.groupby("decile", as_index=False).agg(
            n_docs=("n_chars", "size"), min_chars=("n_chars", "min"),
            max_chars=("n_chars", "max")).astype(
                {"n_docs": "int64", "min_chars": "int64",
                 "max_chars": "int64"})

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(tile_bucket, batch_format="pandas")
        .groupby("decile")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Min("min_chars", alias_name="min_chars"),
                   Max("max_chars", alias_name="max_chars"))
    )


GAP_SENTINEL_US = -1


def q_next_event_gap(sf_dir: str):
    """lead() window gap — microseconds from each event to the same
    user's NEXT event (the inter-arrival signal behind session-gap
    tuning), −1 for a user's last event. User-hash co-partition (a
    timeline never splits), one sort + vectorized shifted diff per
    bucket, per-event output; deterministic (ts, event_id) tie order
    mirrors the oracle's window ORDER BY."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_id", "ts", "user_id"])
    nb = dd.derive_buckets(ds.count())

    def bucketize(df):
        return df.assign(bucket=(df["user_id"] % nb).astype("int32"))

    def gaps(g):
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        ts = g["ts"].to_numpy("datetime64[us]").astype(np.int64)
        uid = g["user_id"].to_numpy(np.int64)
        gap = np.full(len(g), GAP_SENTINEL_US, dtype=np.int64)
        if len(g) > 1:
            same = uid[:-1] == uid[1:]
            gap[:-1] = np.where(same, ts[1:] - ts[:-1], GAP_SENTINEL_US)
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "user_id": uid,
            "gap_us": gap,
        })

    return (
        ds.map_batches(bucketize, batch_format="pandas")
        .groupby("bucket")
        .map_groups(gaps, batch_format="pandas")
    )


SALT_FANOUT = 8
# hot iff count · SALT_HOT_DEN · n_users > SALT_HOT_NUM · n_events,
# i.e. count > (NUM/DEN)·mean — a plan-split tunable (results are
# oracle-identical on either path; tests pin both)
SALT_HOT_NUM = 5
SALT_HOT_DEN = 4


def q_salted_user_join(sf_dir: str):
    """Skew-salted hash join (per-event customer enrichment — the
    shape where pre-aggregation can't rescue a hot probe key because
    the output is per-row): keys whose measured event count exceeds
    5/4 of the mean take the SALTED path — their build rows replicate
    across SALT_FANOUT composite keys (user, salt) and their probe
    rows pick salt = event_id % SALT_FANOUT, spreading one hot user
    over SALT_FANOUT join partitions — while cold keys flow through a
    plain native hash join. The hot set is measured by a count
    combiner and is bounded by n_events/threshold BY CONSTRUCTION
    (Σ counts = n_events), so the broadcast is always safe. The split
    is plan-only: results are byte-identical to the unsalted join
    (one oracle, no salt leakage in the output)."""
    ev = _read(sf_dir, "events", ["event_id", "user_id", "value"])
    n_events = ev.count()

    def count_partial(df):
        g = df.groupby("user_id", as_index=False).agg(
            c=("user_id", "size"))
        return g.astype({"c": "int64"})

    per_user = (
        ev.map_batches(count_partial, batch_format="pandas")
        .groupby("user_id")
        .aggregate(Sum("c", alias_name="c"))
        .to_pandas()  # bounded: ≤ distinct users; only counts, no payload
    )
    n_users = max(1, len(per_user))
    # the hot-set size is ≤ n_events/threshold BY CONSTRUCTION
    # (Σ counts = n_events) regardless of the user-id domain
    hot = per_user[per_user["c"].to_numpy(np.int64) * SALT_HOT_DEN * n_users
                   > SALT_HOT_NUM * n_events]["user_id"].to_numpy(np.int64)
    hot_ref = ray.put(frozenset(int(u) for u in hot))

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    cpus = int(ray.cluster_resources().get("CPU", 8))
    np_j = max(2, min(dd.derive_buckets(n_events), cpus // 4))

    # explicit schemas so an EMPTY split (all-hot or all-cold plans)
    # still feeds the hash join a typed side
    _ev_schema = pa.schema([("event_id", pa.int64()),
                            ("user_id", pa.int64()),
                            ("value_micro", pa.int64())])
    _ev_salt_schema = _ev_schema.append(pa.field("salt", pa.int64()))

    def split_events(df, want_hot: bool):
        hs = sim.resolve_broadcast(hot_ref, key="salt-hot-users")
        mask = df["user_id"].isin(hs)
        part = df[mask] if want_hot else df[~mask]
        cols = {
            "event_id": part["event_id"].to_numpy(np.int64),
            "user_id": part["user_id"].to_numpy(np.int64),
            "value_micro": _micro_int_col(part["value"]),
        }
        if want_hot:
            cols["salt"] = cols["event_id"] % SALT_FANOUT
            return pa.Table.from_pydict(cols, schema=_ev_salt_schema)
        return pa.Table.from_pydict(cols, schema=_ev_schema)

    # the driver already knows both key sets (per_user is the measured
    # count table), so a leg whose key set is empty is SKIPPED rather
    # than fed to the hash join as a schema-less empty side
    have_hot = len(hot) > 0
    have_cold = len(per_user) > len(hot)

    cold_join = None
    if have_cold:
        cold_join = ev.map_batches(
            lambda df: split_events(df, False), batch_format="pandas"
        ).join(
            cust, "inner", np_j,
            on=("user_id",), right_on=("c_custkey",),
            aggregator_ray_remote_args=_join_remote_args(np_j),
        ).select_columns(["event_id", "user_id", "value_micro", "c_name"])

    _build_schema = pa.schema([("c_custkey", pa.int64()),
                               ("salt", pa.int64()),
                               ("c_name", pa.string())])

    def replicate_hot_build(df):
        hs = sim.resolve_broadcast(hot_ref, key="salt-hot-users")
        part = df[df["c_custkey"].isin(hs)]
        n = len(part)
        rep = part.loc[part.index.repeat(SALT_FANOUT)].reset_index(drop=True)
        return pa.Table.from_pydict({
            "c_custkey": rep["c_custkey"].to_numpy(np.int64),
            "salt": np.tile(np.arange(SALT_FANOUT, dtype=np.int64), n),
            "c_name": rep["c_name"].to_numpy(object),
        }, schema=_build_schema)

    hot_join = None
    if have_hot:
        hot_join = ev.map_batches(
            lambda df: split_events(df, True), batch_format="pandas"
        ).join(
            cust.map_batches(replicate_hot_build, batch_format="pandas"),
            "inner", np_j,
            on=("user_id", "salt"), right_on=("c_custkey", "salt"),
            aggregator_ray_remote_args=_join_remote_args(np_j),
        ).select_columns(["event_id", "user_id", "value_micro", "c_name"])

    if cold_join is None:
        return hot_join
    if hot_join is None:
        return cold_join
    return cold_join.union(hot_join)


def q_normalized_dedup(sf_dir: str):
    """Normalization-blind exact dedup (dedup up to boilerplate): the
    content key is md5 over the doc's token stream WITH STOPWORDS
    REMOVED and whitespace collapsed — catching copies that differ
    only in glue words, the cheap middle ground between exact and
    MinHash dedup. Same scale contract as exact_dedup: only 32-byte
    keys shuffle through crc-bucketed min-id reduces; the token pass
    is map-side."""
    import hashlib

    import pandas as pd

    from ..functions import textstats as ts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    nb = dd.derive_buckets(ds.count())
    sw = frozenset(ts.STOPWORDS)

    def keyed(df):
        hs = [
            hashlib.md5(" ".join(
                t for t in ts.tokens(x.lower()) if t not in sw
            ).encode()).hexdigest()
            for x in df["text"]
        ]
        out = pd.DataFrame({"doc_id": df["doc_id"].to_numpy(np.int64),
                            "norm_md5": hs})
        return out

    def reduce_bucket(g):
        s = g.groupby("norm_md5", as_index=False).agg(
            rep_doc_id=("doc_id", "min"), n_copies=("doc_id", "size"))
        return s.astype({"rep_doc_id": "int64", "n_copies": "int64"})

    return (
        ds.map_batches(keyed, batch_format="pandas")
        .map_batches(lambda t: _crc_bucket_col(t, "norm_md5", nb),
                     batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


def q_event_cooccurrence(sf_dir: str):
    """Market-basket co-occurrence: for every unordered event-type
    pair, how many users performed BOTH (the association-support
    matrix behind behavioral cohorting) — without a self-join. Per
    batch: distinct (user, type) flag rows (bounded by users×types,
    not events); user-hash bucketed reduce dedups across batches and
    emits each user's sorted type-pairs map-side (≤ C(n_types,2) rows
    per user); a tiny pair groupby finishes."""
    import itertools

    import pandas as pd

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    nb = dd.derive_buckets(ds.count())

    def distinct_pairs(df):
        d = df[["user_id", "event_type"]].drop_duplicates()
        out = pd.DataFrame({
            "user_id": d["user_id"].to_numpy(np.int64),
            "event_type": d["event_type"].to_numpy(),
        })
        out["bucket"] = (out["user_id"] % nb).astype("int32")
        return out

    def user_pairs(g):
        rows_a, rows_b = [], []
        for _, grp in g.drop_duplicates(
                ["user_id", "event_type"]).groupby("user_id"):
            for a, b in itertools.combinations(
                    sorted(grp["event_type"]), 2):
                rows_a.append(a)
                rows_b.append(b)
        out = pd.DataFrame({"type_a": rows_a, "type_b": rows_b})
        s = out.groupby(["type_a", "type_b"], as_index=False).agg(
            n_users=("type_a", "size"))
        return s.astype({"n_users": "int64"})

    return (
        ds.map_batches(distinct_pairs, batch_format="pandas")
        .groupby("bucket")
        .map_groups(user_pairs, batch_format="pandas")
        .groupby(["type_a", "type_b"])
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


PAGE_LIMIT = 100
PAGE_OFFSET = 100


def q_orders_page(sf_dir: str):
    """OFFSET/LIMIT pagination (reference O1's exact shape — ORDER BY
    created_at DESC + OFFSET/LIMIT task listing,
    database/database_manager.py:244-245 with the ≤100 limit guard at
    database/models.py:178-179): page 2 of orders by (o_orderdate
    DESC, o_orderkey ASC). Distributed form: every batch keeps only
    its own top-(offset+limit) (a page deep in the corpus still only
    ships offset+limit rows per block), the global sort orders
    ≤ (offset+limit)·n_blocks rows, and the driver slices the page —
    OFFSET never scans, it just deepens the per-batch partial k."""
    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_orderdate", "o_totalprice"])
    k = PAGE_OFFSET + PAGE_LIMIT

    def partial_top(df):
        df = df.assign(
            neg_key=-df["o_orderkey"].to_numpy(dtype=np.int64),
            price_c=_cents_col(df["o_totalprice"]),
        )
        df = df.sort_values(["o_orderdate", "neg_key"],
                            ascending=False, kind="mergesort").head(k)
        return df[["o_orderkey", "o_orderdate", "neg_key", "price_c"]]

    page = (
        ds.map_batches(partial_top, batch_format="pandas")
        .sort(["o_orderdate", "neg_key"], descending=True)
        .limit(k)
        .to_pandas()  # ≤ offset+limit rows by construction
        .iloc[PAGE_OFFSET:]
        .reset_index(drop=True)
    )
    return page[["o_orderkey", "o_orderdate", "price_c"]]


def q_dense_order_grid(sf_dir: str):
    """Zero-filled reporting grid (CROSS JOIN + LEFT JOIN COALESCE —
    the dense-dimension shape dashboards need so missing (nation,
    year) cells read 0 instead of vanishing): orders attribute to
    nations through a native orders⋈customer hash join on projected
    columns, a per-(nationkey, year) combiner reduces map-side, and
    the dense grid — nations × observed years, both tiny by
    definition — is assembled driver-side and left-merged with the
    rollup. Only (custkey, year, cents) rows ever shuffle."""
    import pandas as pd
    import pyarrow.compute as pc

    n_orders = _read(sf_dir, "orders", ["o_orderkey"]).count()

    def pre_rollup(b: pa.Table) -> pa.Table:
        # pre-aggregate per (custkey, year) BEFORE the join: the probe
        # side shrinks from one row per order to one partial per
        # (batch, customer, year) — the join exchange carries rollups,
        # not orders
        df = pa.Table.from_pydict({
            "o_custkey": b.column("o_custkey"),
            "order_year": pc.year(b.column("o_orderdate")),
            "price_c": pa.array(_cents_col(
                b.column("o_totalprice").to_numpy(zero_copy_only=False)),
                pa.int64()),
        }).to_pandas()
        g = df.groupby(["o_custkey", "order_year"], as_index=False).agg(
            n_part=("price_c", "size"), s_part=("price_c", "sum"))
        return pa.Table.from_pandas(
            g.astype({"o_custkey": "int64", "order_year": "int64",
                      "n_part": "int64", "s_part": "int64"}),
            preserve_index=False)

    orders = _read(
        sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"]
    ).map_batches(pre_rollup, batch_format="pyarrow")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    cpus = int(ray.cluster_resources().get("CPU", 8))
    np_j = max(2, min(dd.derive_buckets(n_orders), cpus // 2))

    def rollup(df):
        g = df.groupby(["c_nationkey", "order_year"], as_index=False).agg(
            n_orders=("n_part", "sum"), sum_cents=("s_part", "sum"))
        return g.astype({"c_nationkey": "int64", "order_year": "int64",
                         "n_orders": "int64", "sum_cents": "int64"})

    cnt = (
        orders.join(
            cust, "inner", np_j,
            on=("o_custkey",), right_on=("c_custkey",),
            aggregator_ray_remote_args=_join_remote_args(np_j),
        )
        .map_batches(rollup, batch_format="pandas")
        .groupby(["c_nationkey", "order_year"])
        .aggregate(Sum("n_orders", alias_name="n_orders"),
                   Sum("sum_cents", alias_name="sum_cents"))
        .to_pandas()  # ≤ nations × years rows: tiny
    )
    nations = _read(sf_dir, "nation",
                    ["n_nationkey", "n_name"]).to_pandas()
    years = pd.DataFrame(
        {"order_year": np.sort(cnt["order_year"].unique())})
    grid = nations.merge(years, how="cross").merge(
        cnt, how="left",
        left_on=["n_nationkey", "order_year"],
        right_on=["c_nationkey", "order_year"])
    return pd.DataFrame({
        "n_name": grid["n_name"],
        "order_year": grid["order_year"].to_numpy(np.int64),
        "n_orders": grid["n_orders"].fillna(0).to_numpy(np.int64),
        "sum_cents": grid["sum_cents"].fillna(0).to_numpy(np.int64),
    })


def q_label_pair_sim(sf_dir: str):
    """Exact mean pairwise similarity per label WITHOUT the O(n²)
    pair sweep (the intra-cluster cohesion signal behind SemDeDup-
    style cluster pruning): mean pairwise dot over a label's vectors
    equals (‖Σv‖² − Σ‖v‖²) / (n(n−1)) — three mergeable partials (a
    per-dim component sum, a squared-norm sum, a count), so vectors
    NEVER cross an exchange and the shuffle is labels × (dims + 2)
    int64 rows per batch. Components quantize to floor(x·10³) ints
    first, making both sides bigint-exact (q² ≤ 2^20·dims per vector
    → int64 partials survive ≥ 2^40 rows); negative numerators use
    floor-division (nonneg-mod mirror in the oracle)."""
    import pandas as pd

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def partials(df):
        rows_l, rows_d, rows_s = [], [], []
        for lab, grp in df.groupby("label"):
            mat = np.floor(
                np.stack(grp["embedding"].to_numpy()).astype(np.float64)
                * 1000
            ).astype(np.int64)
            dims = mat.shape[1]
            sd = mat.sum(axis=0)
            rows_l.extend([int(lab)] * (dims + 2))
            rows_d.extend(list(range(dims)) + [-1, -2])
            rows_s.extend(list(sd) + [int((mat * mat).sum()), len(grp)])
        return pd.DataFrame({
            "label": np.asarray(rows_l, np.int64),
            "dim": np.asarray(rows_d, np.int64),
            "s": np.asarray(rows_s, np.int64),
        })

    def fold(df):
        return df.groupby(["label", "dim"], as_index=False).agg(
            s=("s", "sum"))

    # two-level repartition fold instead of a native 660-key
    # Aggregate — the same per-aggregator-overhead cliff
    # embedding_outliers measured (8.0 s native → sub-second fold)
    agg = (
        ds.map_batches(partials, batch_format="pandas")
        .repartition(8)
        .map_batches(fold, batch_format="pandas")
        .repartition(1)
        .map_batches(fold, batch_format="pandas")
        .to_pandas()  # labels × (dims + 2) rows: tiny
    )
    out_rows = []
    for lab, grp in agg.groupby("label"):
        sd = grp[grp["dim"] >= 0]["s"].to_numpy(np.int64)
        qq = int(grp[grp["dim"] == -1]["s"].iloc[0])
        n = int(grp[grp["dim"] == -2]["s"].iloc[0])
        if n < 2:
            continue
        num = int(sum(int(v) * int(v) for v in sd)) - qq
        den = n * (n - 1)
        out_rows.append((int(lab), n, num // den))
    out = pd.DataFrame(
        out_rows, columns=["label", "n_vecs", "mean_pair_dot_micro"])
    return out.astype({"label": "int64", "n_vecs": "int64",
                       "mean_pair_dot_micro": "int64"}).sort_values(
        "label").reset_index(drop=True)


# --- T89: multi-way dimensional join (TPC-H Q5 shape) ---------------

# above this the custkey→nationkey broadcast stops being small-side
CUST_BROADCAST_MAX = 2_000_000

# order-date slice for the nation-revenue rollup (one calendar year)
NATION_REV_LO = "1996-01-01"
NATION_REV_HI = "1997-01-01"


def q_nation_revenue(sf_dir: str):
    """FIVE-table star join (TPC-H Q5 shape — the reference's result
    tables never exceed one join, so this is the beyond-reference
    multi-way leg): revenue by region/nation for orders placed in one
    calendar year, lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region.

    Scale shape: the two BIG sides meet in native hash joins on
    pruned projections only — orders is date-filtered and projected
    to (orderkey, custkey) BEFORE its join; lineitem collapses to
    per-batch (orderkey, revenue-micro) partials before its join (≈4
    lineitems/order combine map-side). nation/region are FIXED tiny
    relations (25/5 rows at every sf) — they never join at all: the
    25-key revenue rollup leaves the pipeline first, then the names
    attach on the driver. Revenue in exact integer micro per lineitem
    (int64-safe per order), folded to cents on the 25-row result."""
    import pandas as pd

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"])
    lo = pd.Timestamp(NATION_REV_LO)
    hi = pd.Timestamp(NATION_REV_HI)

    # size-gated dimension broadcast (same plan split as T95): below
    # the gate the custkey→nationkey map ships once via ray.put and
    # join 1 disappears; above it, the native hash join below takes
    # over — identical results either way
    n_cust = cust.count()
    if n_cust <= CUST_BROADCAST_MAX:
        cdf = cust.to_pandas()
        order_ck = np.argsort(cdf["c_custkey"].to_numpy(np.int64))
        ck = cdf["c_custkey"].to_numpy(np.int64)[order_ck]
        nk = cdf["c_nationkey"].to_numpy(np.int64)[order_ck]
        cref = ray.put((ck, nk))
    else:
        cref = None

    def ord_filter(df):
        m = (df["o_orderdate"] >= lo) & (df["o_orderdate"] < hi)
        df = df.loc[m, ["o_orderkey", "o_custkey"]]
        if cref is not None:
            ck_b, nk_b = sim.resolve_broadcast(cref, key="nrev-cust")
            idx = np.searchsorted(ck_b, df["o_custkey"].to_numpy(np.int64))
            return pd.DataFrame(
                {"o_orderkey": df["o_orderkey"].to_numpy(np.int64),
                 "c_nationkey": nk_b[idx]})
        return df

    ofil = orders.map_batches(ord_filter, batch_format="pandas")

    def li_partial(df):
        rev = np.floor(
            df["l_extendedprice"].to_numpy(np.float64)
            * (1.0 - df["l_discount"].to_numpy(np.float64))
            * 1_000_000 + 0.5
        ).astype(np.int64)
        out = pd.DataFrame(
            {"l_orderkey": df["l_orderkey"].to_numpy(np.int64),
             "rev_micro": rev})
        return out.groupby("l_orderkey", as_index=False).agg(
            rev_micro=("rev_micro", "sum"))

    lrev = li.map_batches(li_partial, batch_format="pandas")

    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_part = max(8, min(dd.derive_buckets(orders.count()), cpus // 2))
    j1 = ofil if cref is not None else ofil.join(
        cust, "inner", n_part,
        on=("o_custkey",), right_on=("c_custkey",),
        aggregator_ray_remote_args=_join_remote_args(n_part),
    )
    j2 = lrev.join(
        j1, "inner", n_part,
        on=("l_orderkey",), right_on=("o_orderkey",),
        aggregator_ray_remote_args=_join_remote_args(n_part),
    )

    def nat_partial(df):
        out = pd.DataFrame(
            {"nationkey": df["c_nationkey"].to_numpy(np.int64),
             "rev_micro": df["rev_micro"].to_numpy(np.int64)})
        return out.groupby("nationkey", as_index=False).agg(
            rev_micro=("rev_micro", "sum"))

    small = (
        j2.map_batches(nat_partial, batch_format="pandas")
        .groupby("nationkey")
        .aggregate(Sum("rev_micro", alias_name="rev_micro"))
        .to_pandas()  # ≤ 25 rows
    )
    nat = _read(sf_dir, "nation").to_pandas()
    reg = _read(sf_dir, "region").to_pandas()
    names = nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    out = small.merge(names, left_on="nationkey", right_on="n_nationkey")
    out["revenue_micro"] = out["rev_micro"].astype("int64")
    return (out[["r_name", "n_name", "revenue_micro"]]
            .sort_values(["r_name", "n_name"]).reset_index(drop=True))


def q_local_supplier_volume(sf_dir: str):
    """TPC-H Q5 proper — nation_revenue's star join PLUS the local-
    supplier equality (c_nationkey = s_nationkey), the join-attribute
    filter across TWO dimension paths that the star alone lacks.
    Plan: supplier (fixed small dimension) and the size-gated customer
    map broadcast once; orders date-filter + custkey→nation map-side;
    lineitem attaches its supplier nation map-side; ONE big-big hash
    join on the order key; the equality filter and the 25-key rollup
    run in the join's output batches, so the only exchange is the
    orderkey join of two pruned projections."""
    import pandas as pd

    lo = pd.Timestamp(NATION_REV_LO)
    hi = pd.Timestamp(NATION_REV_HI)
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    sdf = _read(sf_dir, "supplier",
                ["s_suppkey", "s_nationkey"]).to_pandas()
    s_order = np.argsort(sdf["s_suppkey"].to_numpy(np.int64))
    sref = ray.put((sdf["s_suppkey"].to_numpy(np.int64)[s_order],
                    sdf["s_nationkey"].to_numpy(np.int64)[s_order]))

    n_cust = cust.count()
    if n_cust <= CUST_BROADCAST_MAX:
        cdf = cust.to_pandas()
        c_order = np.argsort(cdf["c_custkey"].to_numpy(np.int64))
        cref = ray.put((cdf["c_custkey"].to_numpy(np.int64)[c_order],
                        cdf["c_nationkey"].to_numpy(np.int64)[c_order]))
    else:
        cref = None

    def ord_filter(df):
        m = (df["o_orderdate"] >= lo) & (df["o_orderdate"] < hi)
        df = df.loc[m, ["o_orderkey", "o_custkey"]]
        if cref is not None:
            ck, nk = sim.resolve_broadcast(cref, key="lsv-cust")
            idx = np.searchsorted(ck, df["o_custkey"].to_numpy(np.int64))
            return pd.DataFrame(
                {"o_orderkey": df["o_orderkey"].to_numpy(np.int64),
                 "c_nat": nk[idx]})
        return df

    ofil = orders.map_batches(ord_filter, batch_format="pandas")

    def li_map(df):
        sk, snk = sim.resolve_broadcast(sref, key="lsv-supp")
        idx = np.searchsorted(sk, df["l_suppkey"].to_numpy(np.int64))
        rev = np.floor(
            df["l_extendedprice"].to_numpy(np.float64)
            * (1.0 - df["l_discount"].to_numpy(np.float64))
            * 1_000_000 + 0.5
        ).astype(np.int64)
        return pd.DataFrame(
            {"l_orderkey": df["l_orderkey"].to_numpy(np.int64),
             "s_nat": snk[idx], "rev_micro": rev})

    lrev = li.map_batches(li_map, batch_format="pandas")

    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_part = max(8, min(dd.derive_buckets(orders.count()), cpus // 2))
    j1 = ofil if cref is not None else ofil.join(
        cust, "inner", n_part,
        on=("o_custkey",), right_on=("c_custkey",),
        aggregator_ray_remote_args=_join_remote_args(n_part),
    )
    if cref is None:
        j1 = j1.map_batches(
            lambda df: df.rename(columns={"c_nationkey": "c_nat"})[
                ["o_orderkey", "c_nat"]],
            batch_format="pandas")
    j2 = lrev.join(
        j1, "inner", n_part,
        on=("l_orderkey",), right_on=("o_orderkey",),
        aggregator_ray_remote_args=_join_remote_args(n_part),
    )

    def local_partial(df):
        df = df[df["s_nat"] == df["c_nat"]]
        out = pd.DataFrame({"nationkey": df["s_nat"].to_numpy(np.int64),
                            "revenue_micro":
                                df["rev_micro"].to_numpy(np.int64)})
        return out.groupby("nationkey", as_index=False).agg(
            revenue_micro=("revenue_micro", "sum"))

    small = (
        j2.map_batches(local_partial, batch_format="pandas")
        .groupby("nationkey")
        .aggregate(Sum("revenue_micro", alias_name="revenue_micro"))
        .to_pandas()  # ≤ 25 rows
    )
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    out = small.merge(nat, left_on="nationkey", right_on="n_nationkey")
    out["revenue_micro"] = out["revenue_micro"].astype("int64")
    return (out[["n_name", "revenue_micro"]]
            .sort_values("n_name", kind="mergesort").reset_index(drop=True))


# --- T90: grouped exact median / discrete quantiles ------------------


def q_lang_median_chars(sf_dir: str):
    """GROUPED EXACT MEDIAN + p90 (quantile_disc semantics: sorted
    0-based index ceil(n·q)−1) of document length per language —
    the exact per-group order statistic T26's global quantiles and
    T34's sketch don't give.

    No global sort and no per-group value materialization: per-batch
    (lang, n_chars) histogram partials → value-hash bucketed exact
    histogram reduce (rows bounded by langs × |value domain|,
    independent of corpus size) → per-lang rank-select against the
    cumulative histogram. A 100 TB corpus with a bounded length
    domain exchanges the same few thousand rows as sf0.001."""
    import pandas as pd

    docs = _read(sf_dir, "documents", ["lang", "n_chars"])
    nb = dd.derive_buckets(docs.count(), rows_per_doc=1, floor=16)

    def partial(df):
        g = df.groupby(["lang", "n_chars"], as_index=False).agg(
            n=("n_chars", "size"))
        g["n"] = g["n"].astype("int64")
        g["bucket"] = (g["n_chars"].to_numpy(np.int64) % nb).astype("int32")
        return g

    def hist_reduce(g):
        return (g.groupby(["lang", "n_chars"], as_index=False)
                .agg(n=("n", "sum")))

    def lang_quantiles(g):
        g = g.sort_values("n_chars")
        v = g["n_chars"].to_numpy(np.int64)
        c = g["n"].to_numpy(np.int64)
        cum = np.cumsum(c)
        n = int(cum[-1])

        def pick(num: int, den: int) -> int:
            # 0-based rank ceil(n·num/den) − 1, exact integer math
            rank = -((-n * num) // den) - 1
            return int(v[np.searchsorted(cum, rank + 1)])

        return pd.DataFrame({
            "lang": [g["lang"].iloc[0]],
            "median_chars": np.array([pick(1, 2)], np.int64),
            "p90_chars": np.array([pick(9, 10)], np.int64),
            "n_docs": np.array([n], np.int64),
        })

    return (
        docs.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(hist_reduce, batch_format="pandas")
        .groupby("lang")
        .map_groups(lang_quantiles, batch_format="pandas")
    )


# --- T91: unigram-LM rarity scoring (CCNet-style quality signal) -----

RARITY_TOP_K = 50


def q_rare_token_score(sf_dir: str):
    """Unigram-LM RARITY scoring (the integer-exact stand-in for
    CCNet-style perplexity filtering, Wenzek et al. 2020,
    arXiv:1911.00359): score(doc) = Σ over token occurrences of
    (TOTAL // count(token)) — hapax-heavy gibberish scores high,
    boilerplate scores low; top-RARITY_TOP_K docs returned.

    Shape (mirrors dup_gram_mass's exchange economics): token-hash
    (th, cnt) combiner partials → crc-bucketed vectorized count
    reduce, MATERIALIZED once (vocabulary-sized, corpus-independent)
    so TOTAL is a cheap aggregate over it instead of a second text
    pass; probe rows are per-(doc, distinct token) int64 triples —
    8-byte md5 hashes, never strings; native hash join → per-doc
    bucketed sum → per-block partial top-k → tiny final sort.
    Overflow margin: score ≤ n_tokens(doc) · TOTAL ≈ 2^62 at 10^13
    corpus tokens × 2^9-token docs — documented int64 edge; the
    oracle computes in HUGEINT and casts."""
    import pandas as pd

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = docs.count()

    n_gb = dd.derive_buckets(n_docs, rows_per_doc=32)

    def count_bucketize(b: pa.Table) -> pa.Table:
        t = tx.token_count_partial(b)
        th = t.column("th").to_numpy().view(np.uint64)
        bk = (th % np.uint64(n_gb)).astype(np.int32)
        return t.append_column("bucket", pa.array(bk))

    def count_reduce(g):
        s = g.groupby("th", as_index=False).agg(cnt=("cnt", "sum"))
        s = s.astype({"th": "int64", "cnt": "int64"}).rename(
            columns={"th": "th_r"})
        return pa.Table.from_pandas(
            s, preserve_index=False).replace_schema_metadata(None)

    counts = (
        docs.map_batches(count_bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(count_reduce, batch_format="pandas")
        # consolidate: an all-empty bucket otherwise emits a
        # zero-schema block that poisons the join's right side
        .repartition(max(1, min(32, -(-n_docs // 25_000))))
        .materialize()  # vocabulary-sized; reused for TOTAL + join
    )
    total = int(counts.sum("cnt"))

    probe = docs.map_batches(tx.rare_token_rows, batch_format="pyarrow")
    cpus = int(ray.cluster_resources().get("CPU", 8))
    # post-join combiner width == num_partitions (see dup_gram_mass)
    n_part = max(8, min(dd.derive_buckets(n_docs, rows_per_doc=64), cpus))
    joined = probe.join(
        counts, "inner", n_part, on=("th",), right_on=("th_r",),
        aggregator_ray_remote_args=_join_remote_args(n_part),
    )

    n_db = dd.derive_buckets(n_docs)

    def score_partial(df):
        # int64-exact per-doc fold (np.add.at, not float bincount —
        # rarity terms can exceed 2^53 at corpus scale)
        sc = (df["occ"].to_numpy(np.int64)
              * (total // df["cnt"].to_numpy(np.int64)))
        u, inv = np.unique(df["doc_id"].to_numpy(np.int64),
                           return_inverse=True)
        sums = np.zeros(len(u), np.int64)
        np.add.at(sums, inv, sc)
        return pd.DataFrame({
            "doc_id": u, "rarity_score": sums,
            "bucket": (u % n_db).astype("int32"),
        })

    def doc_reduce(g):
        s = g.groupby("doc_id", as_index=False).agg(
            rarity_score=("rarity_score", "sum"))
        s["neg_id"] = -s["doc_id"].to_numpy(np.int64)
        return s.sort_values(["rarity_score", "neg_id"],
                             ascending=False).head(RARITY_TOP_K)

    out = (
        joined.map_batches(score_partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(doc_reduce, batch_format="pandas")
        .sort(["rarity_score", "neg_id"], descending=True)
        .limit(RARITY_TOP_K)
    )
    return out.select_columns(["doc_id", "rarity_score"])


# --- T92: k-means clustering (iterative; no SQL oracle) --------------


def q_kmeans_embeddings(sf_dir: str):
    """Distributed Lloyd's k-means over the embeddings table (see
    stages/similarity.kmeans_fit for the exact-integer iteration
    contract). Iterative and therefore non-SQL — correctness is
    bounded by the pytest suite: partitioning invariance (identical
    centroids/sizes/trace at different block counts), size
    conservation, and inertia descent."""
    import pandas as pd

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cent, sizes, trace = sim.kmeans_fit(ds)
    return pd.DataFrame({
        "cluster_id": np.arange(len(sizes), dtype=np.int64),
        "n_vecs": sizes.astype(np.int64),
        "centroid_q0": cent[:, 0].astype(np.int64),
        "final_inertia": np.full(len(sizes), float(trace[-1])),
    })


# --- T93: gaps-and-islands (longest consecutive-day streak) ----------


def q_active_streaks(sf_dir: str):
    """GAPS-AND-ISLANDS: longest run of consecutive active days per
    user (the classic row_number-difference pattern — a window shape
    none of T42/T48/T68 cover). Batch-distinct (user, day) flag
    partials shuffle (bounded by users × days, never events) →
    user-hash bucketed reduce does ONE sort per bucket and detects
    island boundaries vectorized (day − within-user rank is constant
    inside an island)."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    nb = dd.derive_buckets(ds.count())

    def partial(df):
        day = df["ts"].to_numpy("datetime64[D]").astype(np.int64)
        out = pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                            "day": day}).drop_duplicates()
        out["bucket"] = (out["user_id"] % nb).astype("int32")
        return out

    def reduce_bucket(g):
        g = g.drop_duplicates(["user_id", "day"]).sort_values(
            ["user_id", "day"], kind="mergesort").reset_index(drop=True)
        uid = g["user_id"].to_numpy(np.int64)
        day = g["day"].to_numpy(np.int64)
        n = len(g)
        run_first = np.flatnonzero(np.r_[True, uid[1:] != uid[:-1]])
        start = np.repeat(run_first, np.diff(np.r_[run_first, n]))
        rank = np.arange(n) - start  # 0-based rank within user
        grp = day - rank  # constant within a consecutive-day island
        s = pd.DataFrame({"user_id": uid, "grp": grp})
        lens = s.groupby(["user_id", "grp"], as_index=False).agg(
            ln=("grp", "size"))
        out = lens.groupby("user_id", as_index=False).agg(
            max_streak=("ln", "max"), n_active_days=("ln", "sum"))
        return out.astype({"user_id": "int64", "max_streak": "int64",
                           "n_active_days": "int64"})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


# --- T94: cohort retention matrix ------------------------------------


def q_cohort_retention(sf_dir: str):
    """WEEKLY COHORT RETENTION matrix (cohort week = user's first
    active ISO-epoch week; cell = distinct users from that cohort
    active `week_offset` weeks later) — the triangular dashboard
    behind every retention analysis, and a two-level dependence
    (per-user min, then per-(cohort, offset) distinct count) a single
    groupby can't express.

    Batch-distinct (user, week) partials → user-hash bucketed reduce
    computes each user's cohort AND emits pre-counted (cohort,
    offset, n) partials map-side (a user's weeks all live in one
    bucket) → tiny (cohort × offset) groupby sum."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    nb = dd.derive_buckets(ds.count())

    def partial(df):
        day = df["ts"].to_numpy("datetime64[D]").astype(np.int64)
        out = pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64),
                            "wk": day // 7}).drop_duplicates()
        out["bucket"] = (out["user_id"] % nb).astype("int32")
        return out

    def reduce_bucket(g):
        g = g.drop_duplicates(["user_id", "wk"])
        cohort = g.groupby("user_id")["wk"].transform("min")
        s = pd.DataFrame({"cohort_week": cohort.to_numpy(np.int64),
                          "week_offset": g["wk"].to_numpy(np.int64)
                          - cohort.to_numpy(np.int64)})
        out = s.groupby(["cohort_week", "week_offset"],
                        as_index=False).agg(n_users=("week_offset", "size"))
        return out.astype({"cohort_week": "int64", "week_offset": "int64",
                           "n_users": "int64"})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
        .groupby(["cohort_week", "week_offset"])
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


# --- T95: broadcast dimension classify join (TPC-H Q14 shape) --------

# above this the (promo partkey set) broadcast stops being small-side
PART_BROADCAST_MAX = 2_000_000


def q_promo_revenue(sf_dir: str):
    """PROMO revenue share per ship month (TPC-H Q14 shape): lineitem
    ⋈ part classify join, monthly promo/total revenue in exact cents
    + share in ppm.

    Size-gated broadcast: when part fits the gate, only the SORTED
    PROMO PARTKEY ARRAY broadcasts (ray.put once, np.isin per batch —
    the classify join costs no shuffle at all and the month rollup is
    a pure combiner). Above the gate, a native hash join on pruned
    (l_partkey, month, rev) × (p_partkey, is_promo) projections takes
    over — plan-only split, identical results. Cents (not micro) keep
    per-month int64 partials safe at 100 TB; the ppm division happens
    on the ≤ n_months-row result with Python ints."""
    import pandas as pd

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"])
    part = _read(sf_dir, "part", ["p_partkey", "p_type"])
    n_parts = part.count()

    def month_rev(df):
        ts = pd.DatetimeIndex(df["l_shipdate"])
        month = (ts.year.to_numpy() * 100 + ts.month.to_numpy()).astype(
            np.int64)
        rev = np.floor(
            df["l_extendedprice"].to_numpy(np.float64)
            * (1.0 - df["l_discount"].to_numpy(np.float64))
            * 100 + 0.5
        ).astype(np.int64)
        return month, rev

    if n_parts <= PART_BROADCAST_MAX:
        pdf = part.to_pandas()
        promo = np.sort(
            pdf.loc[pdf["p_type"] == "PROMO", "p_partkey"]
            .to_numpy(np.int64))
        ref = ray.put(promo)

        def partial(df):
            pk = sim.resolve_broadcast(ref, key="promo-parts")
            month, rev = month_rev(df)
            isp = np.isin(df["l_partkey"].to_numpy(np.int64), pk)
            out = pd.DataFrame({
                "ship_month": month,
                "promo_c": np.where(isp, rev, 0),
                "total_c": rev,
            })
            return out.groupby("ship_month", as_index=False).agg(
                promo_c=("promo_c", "sum"), total_c=("total_c", "sum"))

        small = li.map_batches(partial, batch_format="pandas")
    else:  # hash-join leg: projections only, then the same combiner
        def li_proj(df):
            month, rev = month_rev(df)
            return pd.DataFrame(
                {"l_partkey": df["l_partkey"].to_numpy(np.int64),
                 "ship_month": month, "rev_c": rev})

        def part_proj(df):
            return pd.DataFrame(
                {"p_partkey": df["p_partkey"].to_numpy(np.int64),
                 "isp": (df["p_type"] == "PROMO").to_numpy(bool)})

        cpus = int(ray.cluster_resources().get("CPU", 8))
        n_part_j = max(8, min(dd.derive_buckets(n_parts), cpus // 2))
        j = li.map_batches(li_proj, batch_format="pandas").join(
            part.map_batches(part_proj, batch_format="pandas"),
            "inner", n_part_j,
            on=("l_partkey",), right_on=("p_partkey",),
            aggregator_ray_remote_args=_join_remote_args(n_part_j),
        )

        def partial(df):
            rev = df["rev_c"].to_numpy(np.int64)
            out = pd.DataFrame({
                "ship_month": df["ship_month"].to_numpy(np.int64),
                "promo_c": np.where(df["isp"].to_numpy(bool), rev, 0),
                "total_c": rev,
            })
            return out.groupby("ship_month", as_index=False).agg(
                promo_c=("promo_c", "sum"), total_c=("total_c", "sum"))

        small = j.map_batches(partial, batch_format="pandas")

    agg = (
        small.groupby("ship_month")
        .aggregate(Sum("promo_c", alias_name="promo_c"),
                   Sum("total_c", alias_name="total_c"))
        .to_pandas()  # ≤ n_months rows
    )
    agg["promo_ppm"] = np.array(
        [int(p) * 1_000_000 // int(t)
         for p, t in zip(agg["promo_c"], agg["total_c"])], np.int64)
    for c in ("ship_month", "promo_c", "total_c"):
        agg[c] = agg[c].astype("int64")
    return agg.sort_values("ship_month").reset_index(drop=True)


# --- T96: greatest-n-per-group join-back ------------------------------


def q_latest_order_per_customer(sf_dir: str):
    """GREATEST-N-PER-GROUP at group cardinality that scales with the
    data (every customer's single most recent order) — the per-group
    argmax T17's global top-100 and T23's per-lang top-5 (5 fixed
    groups) don't cover. SQL shape: row_number() OVER (PARTITION BY
    custkey ORDER BY date DESC, key ASC) = 1.

    Pure combiner + bucketed reduce — no join, no global sort: each
    batch keeps ONE candidate row per custkey it sees (vectorized
    sort + drop_duplicates), the custkey-hash bucket reduce repeats
    the same argmax over ≤ n_blocks candidates per customer. Exchange
    is O(customers · blocks-containing-them), independent of the
    order count per customer."""
    import pandas as pd

    ds = _read(sf_dir, "orders",
               ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    nb = dd.derive_buckets(ds.count())

    def argmax_rows(df):
        df = df.sort_values(["o_custkey", "o_orderdate", "o_orderkey"],
                            ascending=[True, False, True],
                            kind="mergesort")
        return df.drop_duplicates("o_custkey", keep="first")

    def partial(df):
        out = argmax_rows(pd.DataFrame({
            "o_custkey": df["o_custkey"].to_numpy(np.int64),
            "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
            "o_orderdate": df["o_orderdate"],
            "price_c": _cents_col(df["o_totalprice"]),
        }))
        return out.assign(bucket=(out["o_custkey"].to_numpy(np.int64)
                                  % nb).astype("int32"))

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(lambda g: argmax_rows(g).drop(columns=["bucket"]),
                    batch_format="pandas")
    )


# --- T97: LAG over an aggregated series (month-over-month ratio) ------


def q_revenue_mom(sf_dir: str):
    """MONTH-OVER-MONTH revenue ratio — a window function (LAG) over
    an AGGREGATED series, not over base rows like T82's lead(): cents
    combiner → per-month groupby (bounded by the calendar, tiny) →
    one driver pass computes ratio_ppm = cur·10⁶ // prev with Python
    ints (nonnegative, so floor == DuckDB's truncating //; the first
    month takes the 0 sentinel, mirrored by coalesce in the
    oracle)."""
    import pandas as pd

    ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

    def partial(df):
        ts = pd.DatetimeIndex(df["o_orderdate"])
        month = (ts.year.to_numpy() * 100 + ts.month.to_numpy()).astype(
            np.int64)
        out = pd.DataFrame({"order_month": month,
                            "revenue_c": _cents_col(df["o_totalprice"])})
        return out.groupby("order_month", as_index=False).agg(
            revenue_c=("revenue_c", "sum"))

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("order_month")
        .aggregate(Sum("revenue_c", alias_name="revenue_c"))
        .to_pandas()  # ≤ one row per calendar month
    ).sort_values("order_month").reset_index(drop=True)
    rev = [int(v) for v in agg["revenue_c"]]
    ratio = [0] + [c * 1_000_000 // p for c, p in zip(rev[1:], rev[:-1])]
    agg["revenue_c"] = agg["revenue_c"].astype("int64")
    agg["ratio_ppm"] = np.array(ratio, np.int64)
    return agg


# --------------------------------------------- round-4 operators T98-T100

CHUNK_TOKENS = 64    # tokens per training chunk
CHUNK_OVERLAP = 16   # trailing tokens repeated in the next chunk


def q_sentence_dedup(sf_dir: str):
    """SENTENCE-granularity exact dedup (the C4 three-sentence /
    RefinedWeb line-level dedup stage — Raffel et al. 2020,
    arXiv:1910.10683 §2.2; Penedo et al. 2023, arXiv:2306.01116): explode docs to sentences with T67's exact split
    rule, hash each sentence to an 8-byte md5 key, and keep the FIRST
    occurrence (min (doc_id, sent_idx)) as the winner — every other
    occurrence is flagged is_dup with a pointer at its winner.

    Scale shape: the exchange carries (sentence-hash, doc_id,
    sent_idx) int64 triples — never sentence text; hash-derived
    buckets (size-derived count) + ONE vectorized pandas first-winner
    transform per bucket, the repo's bucketed-reduce idiom. Collision
    semantics are shared with the oracle (same md5_number_upper hash
    on both sides)."""
    import pandas as pd

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = docs.count()
    nb = dd.derive_buckets(n_docs, rows_per_doc=8)

    def explode(batch: pa.Table) -> pa.Table:
        o_id: list[int] = []
        o_idx: list[int] = []
        o_h: list[int] = []
        from ..functions.textstats import _md5_u64
        for did, t in zip(batch.column("doc_id").to_pylist(),
                          batch.column("text").to_pylist()):
            sents = [s for s in _SENT_RE.split(t) if s != ""]
            o_id.extend([did] * len(sents))
            o_idx.extend(range(len(sents)))
            o_h.extend(_md5_u64(b"sd:" + s.encode()) for s in sents)
        sh = np.array(o_h, dtype=np.uint64).view(np.int64)
        return pa.Table.from_pydict({
            "doc_id": pa.array(o_id, pa.int64()),
            "sent_idx": pa.array(o_idx, pa.int64()),
            "sh": pa.array(sh, pa.int64()),
            "bucket": pa.array(
                (sh.view(np.uint64) % np.uint64(nb)).astype(np.int32)),
        })

    def mark(g: "pd.DataFrame") -> "pd.DataFrame":
        g = g.sort_values(["sh", "doc_id", "sent_idx"], kind="mergesort")
        win = g.groupby("sh")[["doc_id", "sent_idx"]].transform("first")
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "sent_idx": g["sent_idx"].to_numpy(np.int64),
            "is_dup": ((g["doc_id"].to_numpy() != win["doc_id"].to_numpy())
                       | (g["sent_idx"].to_numpy()
                          != win["sent_idx"].to_numpy())),
            "winner_doc_id": win["doc_id"].to_numpy(np.int64),
            "winner_sent_idx": win["sent_idx"].to_numpy(np.int64),
        })

    return (
        docs.map_batches(explode, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(mark, batch_format="pandas")
    )


def q_doc_chunks(sf_dir: str):
    """Fixed-size TOKEN CHUNKING with overlap (the context-window
    slicer every RAG / training-data pipeline needs — the sliding
    window of Lewis et al. 2020, arXiv:2005.11401-style retrieval
    corpora and GPT-style packing preprocessors): tokens via the
    RE2-exact tokenizer, chunks of CHUNK_TOKENS starting every
    CHUNK_TOKENS-CHUNK_OVERLAP tokens (trailing chunk may be short),
    each chunk carrying its token span and an md5 content hash (hex,
    same md5_number_upper convention as the dedup family so chunk-
    level dedup chains directly). Pure map-side flat explode — zero
    exchange; blocks re-size downstream via streaming re-blocking."""
    stride = CHUNK_TOKENS - CHUNK_OVERLAP
    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def explode(batch: pa.Table) -> pa.Table:
        o_id: list[int] = []
        o_ci: list[int] = []
        o_st: list[int] = []
        o_nt: list[int] = []
        o_hx: list[str] = []
        from ..functions.textstats import _md5_u64, tokens
        for did, t in zip(batch.column("doc_id").to_pylist(),
                          batch.column("text").to_pylist()):
            toks = tokens(t)
            n = len(toks)
            for ci, s in enumerate(range(0, n, stride)):
                chunk = toks[s:s + CHUNK_TOKENS]
                o_id.append(did)
                o_ci.append(ci)
                o_st.append(s)
                o_nt.append(len(chunk))
                h = _md5_u64(b"ck:" + " ".join(chunk).encode())
                o_hx.append(f"{h:016x}")
        return pa.Table.from_pydict({
            "doc_id": pa.array(o_id, pa.int64()),
            "chunk_idx": pa.array(o_ci, pa.int64()),
            "start_tok": pa.array(o_st, pa.int64()),
            "n_chunk_toks": pa.array(o_nt, pa.int64()),
            "chunk_hash_hex": pa.array(o_hx, pa.string()),
        })

    return ds.map_batches(explode, batch_format="pyarrow")


EMB_OUTLIER_K = 5  # per-label outliers reported


def q_embedding_outliers(sf_dir: str):
    """Per-label embedding OUTLIERS (mislabel / contamination triage):
    distance of every vector to its label centroid, top-K farthest per
    label. Two phases, both exchange-light: (1) the label_centroids
    integer-sum pipeline yields the tiny labels×dims table, floor-div
    centroids broadcast once via ray.put; (2) a map-side vectorized
    distance pass with a per-batch PARTIAL top-K per label (combiner),
    then one tiny per-label reduce. Distances are exact integers —
    components floor to micro units, centroid is floor-div, d2 =
    Σ(x_micro − centroid_micro)² — so both engines agree bit-for-bit
    (≤4·10¹² per dim × 64 dims ≪ int64)."""
    import pandas as pd

    ds = _read(sf_dir, "embeddings", ["vec_id", "label", "embedding"])

    def partial_sums(df):
        mat = np.floor(
            np.stack(df["embedding"].to_numpy()).astype(np.float64) * 1e6
        ).astype(np.int64)
        labels = df["label"].to_numpy()
        out = []
        for lab in np.unique(labels):
            rows = mat[labels == lab]
            out.append(pd.DataFrame({
                "label": np.int64(lab),
                "dim": np.arange(mat.shape[1], dtype=np.int64),
                "n_vecs": np.int64(len(rows)),
                "sum_micro": rows.sum(axis=0, dtype=np.int64),
            }))
        return pd.concat(out, ignore_index=True)

    # TWO-LEVEL map_batches tree reduce, no sort/groupby at all — a
    # native aggregate pays per-key overhead (measured 8.0 s for this
    # 640-key phase at sf0.1) and a sort-based map_groups emits
    # schema-less empty partitions (executor warning spam). Partial
    # rows per block are exactly labels×dims, so level 1 coalesces
    # blocks×(labels×dims) rows into nb_c block-local sums and level 2
    # folds nb_c×(labels×dims) rows in one tiny task.
    cpus = int(ray.cluster_resources().get("CPU", 8))
    nb_c = max(4, min(16, cpus // 2))

    def sum_block(df):
        return df.groupby(["label", "dim"], as_index=False).agg(
            n_vecs=("n_vecs", "sum"), sum_micro=("sum_micro", "sum"))

    cen = (
        ds.map_batches(partial_sums, batch_format="pandas")
        .repartition(nb_c)
        .map_batches(sum_block, batch_format="pandas")
        .repartition(1)
        .map_batches(sum_block, batch_format="pandas")
        .to_pandas()  # labels × dims — tiny by construction
    )
    cen = cen.sort_values(["label", "dim"], kind="mergesort")
    cent: dict[int, np.ndarray] = {}
    for lab, g in cen.groupby("label"):
        s = g["sum_micro"].to_numpy(np.int64)
        n = g["n_vecs"].to_numpy(np.int64)
        cent[int(lab)] = s // n  # python-style floor division
    cent_ref = ray.put(cent)

    def partial_topk(df):
        c = sim.resolve_broadcast(cent_ref, key="emb-outlier-centroids")
        mat = np.floor(
            np.stack(df["embedding"].to_numpy()).astype(np.float64) * 1e6
        ).astype(np.int64)
        labels = df["label"].to_numpy(np.int64)
        cm = np.stack([c[int(lab)] for lab in labels])
        d = mat - cm
        d2 = (d * d).sum(axis=1)
        out = pd.DataFrame({"label": labels,
                            "vec_id": df["vec_id"].to_numpy(np.int64),
                            "d2_micro2": d2})
        out = out.sort_values(["label", "d2_micro2", "vec_id"],
                              ascending=[True, False, True],
                              kind="mergesort")
        return out.groupby("label", as_index=False).head(EMB_OUTLIER_K)

    def final_topk(g):
        if len(g) == 0:  # empty sort partition (few labels): return a
            #              TYPED empty block so the schema stays stable
            return pd.DataFrame({
                "label": pd.Series([], dtype="int64"),
                "vec_id": pd.Series([], dtype="int64"),
                "d2_micro2": pd.Series([], dtype="int64")})
        g = g.sort_values(["d2_micro2", "vec_id"],
                          ascending=[False, True], kind="mergesort")
        return g.head(EMB_OUTLIER_K)

    return (
        ds.map_batches(partial_topk, batch_format="pandas")
        .repartition(4)  # ≤ 5·labels rows per block survive the
        #                  partial top-k — same empty-partition guard
        .groupby("label")
        .map_groups(final_topk, batch_format="pandas")
    )


VOCAB_K = 20  # top-K occurrence vocabulary for the OOV audit (the sf
#              corpus vocabulary is ~31 tokens, so the K boundary and
#              its (cnt DESC, th ASC) tie-break actually BIND)


def q_oov_rate(sf_dir: str):
    """Vocabulary COVERAGE audit (the OOV-rate gate a training
    pipeline runs before freezing a tokenizer/vocab — the coverage
    statistic of SentencePiece-style vocab selection, Kudo &
    Richardson 2018, arXiv:1808.06226): phase 1 builds
    the top-VOCAB_K occurrence vocabulary over md5 token hashes
    (token_count_partial combiner → hash-bucketed count reduce with a
    per-bucket PARTIAL top-K → driver merge of ≤ K·buckets rows);
    phase 2 broadcasts the sorted vocab hash array ONCE and scores
    every doc map-side (searchsorted membership, occurrence-weighted):
    n_oov = token occurrences outside the vocab, oov_ppm =
    n_oov·10⁶ // n_tokens. The K-boundary tie-break is
    (cnt DESC, th ASC in UNSIGNED order) on both sides — th is the
    same md5_number_upper key as the rest of the token family, so
    collision semantics are shared with the oracle exactly."""
    import pandas as pd

    from ..functions.textstats import tokens as _tokens

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = docs.count()
    nb = dd.derive_buckets(n_docs, rows_per_doc=32)

    def bucketize(b: pa.Table) -> pa.Table:
        t = tx.token_count_partial(b)
        th = t.column("th").to_numpy().view(np.uint64)
        return t.append_column(
            "bucket", pa.array((th % np.uint64(nb)).astype(np.int32)))

    def vocab_reduce(g):
        s = g.groupby("th", as_index=False).agg(cnt=("cnt", "sum"))
        thu = s["th"].to_numpy(np.int64).view(np.uint64)
        order = np.lexsort((thu, -s["cnt"].to_numpy(np.int64)))[:VOCAB_K]
        return pd.DataFrame({
            "th": s["th"].to_numpy(np.int64)[order],
            "cnt": s["cnt"].to_numpy(np.int64)[order]})

    vk = (
        docs.map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(vocab_reduce, batch_format="pandas")
        .to_pandas()  # ≤ VOCAB_K·n_buckets rows by the partial top-K
    )
    thu = vk["th"].to_numpy(np.int64).view(np.uint64)
    order = np.lexsort((thu, -vk["cnt"].to_numpy(np.int64)))[:VOCAB_K]
    vocab = np.sort(thu[order])  # sorted uint64 → searchsorted probes
    vref = ray.put(vocab)

    def score(b: pa.Table) -> pa.Table:
        from ..stages.text import _gram_hashes_i64

        v = sim.resolve_broadcast(vref, key="oov-vocab")
        ids, n_tok, n_oov = [], [], []
        for i, t in zip(b.column("doc_id").to_pylist(),
                        b.column("text").to_pylist()):
            c: dict = {}
            for w in _tokens(t):
                c[w] = c.get(w, 0) + 1
            words = sorted(c)
            occ = np.fromiter((c[w] for w in words), np.int64, len(words))
            hs = _gram_hashes_i64(words).view(np.uint64) if words else \
                np.empty(0, np.uint64)
            if len(v) and len(hs):
                pos = np.minimum(np.searchsorted(v, hs), len(v) - 1)
                hit = v[pos] == hs
            else:
                hit = np.zeros(len(hs), bool)
            ids.append(i)
            n_tok.append(int(occ.sum()))
            n_oov.append(int(occ[~hit].sum()))
        n_tok = np.array(n_tok, np.int64)
        n_oov = np.array(n_oov, np.int64)
        ppm = np.where(n_tok > 0, n_oov * 1_000_000 // np.maximum(n_tok, 1),
                       0)
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n_tok),
            "n_oov": pa.array(n_oov),
            "oov_ppm": pa.array(ppm.astype(np.int64)),
        })

    return docs.map_batches(score, batch_format="pyarrow")


def q_new_users_daily(sf_dir: str):
    """Cumulative DISTINCT-over-time (daily new users + running
    total) — the first-seen reduce: per-batch per-user min(ts)
    partials merge associatively in a user-hash-bucketed reduce, so
    the exchange carries O(users · batches) one-row summaries and the
    event payload never shuffles; the per-day counts that remain are
    O(days) and the running sum is a driver-side cumsum over that
    tiny frame (a distributed window would ship every row to one
    partition anyway — days are the bounded axis here)."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    nb = dd.derive_buckets(ds.count())

    def partial(df):
        g = df.groupby("user_id", as_index=False).agg(
            first_ts=("ts", "min"))
        g["bucket"] = (g["user_id"] % nb).astype("int32")
        return g

    def reduce_bucket(g):
        f = g.groupby("user_id", as_index=False).agg(
            first_ts=("first_ts", "min"))
        f["day"] = f["first_ts"].dt.floor("D")
        out = f.groupby("day", as_index=False).agg(
            n_new_users=("user_id", "size"))
        out["n_new_users"] = out["n_new_users"].astype("int64")
        return out

    per_day = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
        .groupby("day")
        .aggregate(Sum("n_new_users", alias_name="n_new_users"))
    ).to_pandas()
    per_day = per_day.sort_values("day", kind="mergesort").reset_index(
        drop=True)
    per_day["n_new_users"] = per_day["n_new_users"].astype("int64")
    per_day["cum_users"] = per_day["n_new_users"].cumsum().astype("int64")
    return per_day


def q_heavy_hitters_cms(sf_dir: str):
    """EXACT heavy hitters (users with ≥1.2× the mean event count)
    via a Count-Min candidate filter — the sketch-guided-exact
    pattern: the CMS never undercounts, so thresholding its broadcast
    estimates map-side selects a SUPERSET of the true heavy set, only
    those candidates' exact partial counts shuffle, and the final
    exact filter drops the false positives. Exchange: O(depth·width)
    sketch rows + O(candidates · batches), not O(distinct users).
    See stages/cms.py for the bound."""
    import pandas as pd

    from ..stages import cms

    ds = _read(sf_dir, "events", ["user_id"])
    total = ds.count()
    nb = dd.derive_buckets(total)

    # exact user cardinality (threshold input): bucketed distinct
    def upart(df):
        g = df.drop_duplicates(["user_id"]).copy()
        g["bucket"] = (g["user_id"] % nb).astype("int32")
        return g[["bucket", "user_id"]]

    def ucount(g):
        return pd.DataFrame({"n": [int(g["user_id"].nunique())]})

    n_users = int(
        ds.map_batches(upart, batch_format="pandas")
        .groupby("bucket")
        .map_groups(ucount, batch_format="pandas")
        .sum(on="n")
    )
    # count*users*10 >= 12*total  ⇔  count >= ceil(12·total / (10·users))
    thr = -(-12 * total // (10 * n_users))

    grid_rows = (
        ds.map_batches(lambda b: cms.cms_partial_rows(b, "user_id"),
                       batch_format="pyarrow")
        .groupby("slot")
        .aggregate(Sum("n", alias_name="n"))
    ).to_pandas()
    grid_ref = ray.put(cms.cms_grid(grid_rows))

    def exact_reduce(g):
        out = g.groupby("user_id", as_index=False).agg(n=("n", "sum"))
        out = out[out["n"] >= thr]
        return pd.DataFrame({
            "user_id": out["user_id"].astype("int64"),
            "n_events": out["n"].astype("int64")})

    return (
        ds.map_batches(
            cms.CmsCandidateCountStage(grid_ref, "user_id", thr, nb),
            batch_format="pyarrow", batch_size=8192)
        .groupby("bucket")
        .map_groups(exact_reduce, batch_format="pandas")
    )


def q_lang_confusion(sf_dir: str):
    """Label-vs-prediction CONFUSION MATRIX for the lang-ID heuristic
    (corpus QA audit): per-batch (label, prediction) partial counts —
    one row per cell per batch — then a native aggregate over the
    ≤ |langs|² cells. The SQL oracle re-derives predictions from the
    same marker tables (one source of truth via _lang_id_sql)."""
    ds = _read(sf_dir, "documents", ["lang", "text"])
    return (
        ds.map_batches(tx.lang_confusion_partial, batch_format="pyarrow")
        .groupby(["lang", "lang_pred"])
        .aggregate(Sum("n_docs", alias_name="n_docs"))
    )


ZIPF_RANKS = 50


def q_zipf_slope(sf_dir: str):
    """Per-language ZIPF-SLOPE audit (log-log OLS over the top-50
    token ranks) — the frequency-distribution health check a corpus
    curation pass runs before training. Word-hash-bucketed count
    reduce with per-(bucket, lang) partial top-50 (a word lives in
    exactly one bucket, so per-lang global top-50 ⊆ union of the
    per-bucket top-50s); the driver fits the ≤ langs·50-row result.
    Slope via the Σ-form normal equation, mirrored term-for-term in
    SQL (not regr_slope, whose streaming update order differs)."""
    import pandas as pd

    ds = _read(sf_dir, "documents", ["lang", "text"])
    nb = dd.derive_buckets(ds.count(), rows_per_doc=8)

    def part(b: pa.Table) -> pa.Table:
        return _crc_bucket_col(tx.lang_word_partial_counts(b), "word", nb)

    def reduce_top(g):
        s = g.groupby(["lang", "word"], as_index=False).agg(n=("n", "sum"))
        s = s.sort_values(["lang", "n", "word"],
                          ascending=[True, False, True], kind="mergesort")
        s = s.groupby("lang", sort=False).head(ZIPF_RANKS)
        return s.astype({"n": "int64"})

    tbl = (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(reduce_top, batch_format="pandas")
    ).to_pandas()
    tbl = tbl.sort_values(["lang", "n", "word"],
                          ascending=[True, False, True], kind="mergesort")
    tbl = tbl.groupby("lang", sort=False).head(ZIPF_RANKS)

    langs: list[str] = []
    n_types: list[int] = []
    slope_micro: list[int] = []
    for lang, g in tbl.groupby("lang", sort=True):
        m = len(g)
        langs.append(lang)
        n_types.append(m)
        x = np.log(np.arange(1, m + 1, dtype=np.float64))
        y = np.log(g["n"].to_numpy(np.float64))
        den = m * float((x * x).sum()) - float(x.sum()) ** 2
        if m < 2 or den == 0.0:
            slope_micro.append(0)
            continue
        slope = (m * float((x * y).sum())
                 - float(x.sum()) * float(y.sum())) / den
        slope_micro.append(int(np.floor(slope * 1_000_000 + 0.5)))
    return pd.DataFrame({
        "lang": langs,
        "n_types": pd.array(n_types, dtype="int64"),
        "slope_micro": pd.array(slope_micro, dtype="int64")})


def q_char_diversity(sf_dir: str):
    """Per-doc character-diversity quality signal (distinct codepoints
    + the Simpson 1949 "Measurement of Diversity" repeat
    probability) — integer-exact by construction
    (Σc(c−1)/n(n−1) in micro-units needs no float logs, unlike
    entropy, so the SQL mirror is equality-safe). Shuffle-free
    map_batches; one np.unique per doc over a utf-32 view."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(tx.char_diversity_batch, batch_format="pyarrow",
                          batch_size=512)


def q_bpe_pair_merge(sf_dir: str):
    """Corpus-level top-20 adjacent-character pairs inside tokens (the
    statistic a BPE tokenizer's first merge maximizes — Sennrich,
    Haddow & Birch 2016, "Neural Machine Translation of Rare Words
    with Subword Units", §3.1). Per batch: all
    tokens joined into ONE codepoint vector, pair codes formed
    vectorized, one np.unique — no per-token Python. Pair-code-hash
    bucketed sum with per-bucket partial top-20 (a pair lives in one
    bucket), final 20-row sort; tie-break (n desc, pair asc) == the
    int64 code order by construction (see stages/text._PAIR_SHIFT)."""
    import pandas as pd

    ds = _read(sf_dir, "documents", ["text"])
    nb = dd.derive_buckets(ds.count(), rows_per_doc=8)

    def part(b: pa.Table) -> pa.Table:
        t = tx.token_pair_partial_counts(b)
        bk = (np.asarray(t.column("pair_code")) % nb).astype(np.int32)
        return t.append_column("bucket", pa.array(bk, pa.int32()))

    def reduce_top(g):
        s = g.groupby("pair_code", as_index=False).agg(n=("n", "sum"))
        s = s.sort_values(["n", "pair_code"], ascending=[False, True],
                          kind="mergesort").head(20)
        return s.astype({"pair_code": "int64", "n": "int64"})

    top = (
        ds.map_batches(part, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(reduce_top, batch_format="pandas")
    ).to_pandas()
    top = top.sort_values(["n", "pair_code"], ascending=[False, True],
                          kind="mergesort").head(20)
    return pd.DataFrame({
        "pair": [tx.pair_code_to_str(c) for c in top["pair_code"]],
        "n": top["n"].astype("int64").to_numpy()})


_LINK_RE = re.compile(rb'href="https://(site-[0-9]+\.example)/')


def _link_edges(sf_dir: str):
    """Aggregated link-graph edge Dataset (src_domain, dst_domain,
    n_links): href scan on RAW payload bytes with an all-ASCII pattern
    (byte-transparent under every encoding variant the generator emits
    — gb18030/latin-1/BOM — so no decode pass precedes the scan);
    gzip-wrapped rows excluded on BOTH sides (the SQL mirror cannot
    inflate; at production the engine-side gate is one gunzip call).
    Map-side per-batch edge combiner, then a per-edge groupby (≤
    domains² rows)."""
    files = expand_input_files(_corpus_dir())
    ds = ray.data.read_parquet(files, columns=["url", "html"])
    dom_re = re.compile(r"https://([^/]+)/")

    def partial(b: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for u, raw in zip(b.column("url").to_pylist(),
                          b.column("html").to_pylist()):
            raw = raw or b""
            if raw[:2] == b"\x1f\x8b":
                continue
            m = dom_re.search(u)
            src = m.group(1) if m else ""
            for dst in _LINK_RE.findall(raw):
                c[(src, dst.decode("ascii"))] += 1
        items = sorted(c.items())
        return pa.Table.from_pydict({
            "src_domain": pa.array([k[0] for k, _ in items], pa.string()),
            "dst_domain": pa.array([k[1] for k, _ in items], pa.string()),
            "n_links": pa.array([v for _, v in items], pa.int64())})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["src_domain", "dst_domain"])
        .aggregate(Sum("n_links", alias_name="n_links"))
    )


def q_link_domains(sf_dir: str):
    """LINK-GRAPH edge extraction over the web corpus — the
    (src_domain, dst_domain, n_links) aggregation every web-scale
    ranker (PageRank/harmonic-centrality inputs) builds first. See
    _link_edges for the scan/mirror contract."""
    return _link_edges(sf_dir)


def q_domain_degrees(sf_dir: str):
    """Per-domain GRAPH DEGREE profile (out/in degree + link mass)
    from the aggregated edge set. Edges are already unique (src, dst)
    rows, so degrees are row counts; out- and in-side partials are
    emitted as one union stream and merged per domain-hash BUCKET (no
    driver-side outer join — at web scale the domain axis itself is
    too wide for the driver)."""
    import pandas as pd

    edges = _link_edges(sf_dir)
    nb = 32

    def sides(b: pa.Table) -> pa.Table:
        import pandas as _pd

        df = b.to_pandas()
        out = _pd.DataFrame({
            "domain": df["src_domain"], "out_degree": 1,
            "out_links": df["n_links"], "in_degree": 0, "in_links": 0})
        inn = _pd.DataFrame({
            "domain": df["dst_domain"], "out_degree": 0, "out_links": 0,
            "in_degree": 1, "in_links": df["n_links"]})
        u = _pd.concat([out, inn], ignore_index=True)
        u = u.groupby("domain", as_index=False).sum()
        u["bucket"] = pd.Series(
            [zlib.crc32(s.encode()) % nb for s in u["domain"]],
            dtype="int32")
        return u

    def merge(g):
        s = g.groupby("domain", as_index=False).agg(
            out_degree=("out_degree", "sum"),
            out_links=("out_links", "sum"),
            in_degree=("in_degree", "sum"),
            in_links=("in_links", "sum"))
        for c in ("out_degree", "out_links", "in_degree", "in_links"):
            s[c] = s[c].astype("int64")
        return s

    return (
        edges.map_batches(sides, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(merge, batch_format="pandas")
    )


def q_reciprocal_links(sf_dir: str):
    """RECIPROCAL link pairs (graph self-join): unordered domain pairs
    linked in BOTH directions, with each direction's link count. The
    edge set maps to normalized (lo, hi, direction) rows; a
    pair-hash-bucketed reduce pivots the two directions together (a
    pair lives in exactly one bucket), so the exchange is O(edges) and
    no side is broadcast."""
    import pandas as pd

    edges = _link_edges(sf_dir)
    nb = 32

    def norm(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        lo = df[["src_domain", "dst_domain"]].min(axis=1)
        hi = df[["src_domain", "dst_domain"]].max(axis=1)
        fwd = (df["src_domain"] == lo).to_numpy()
        out = pd.DataFrame({
            "domain_a": lo, "domain_b": hi,
            "n_ab": np.where(fwd, df["n_links"], 0).astype(np.int64),
            "n_ba": np.where(fwd, 0, df["n_links"]).astype(np.int64)})
        out = out[out["domain_a"] != out["domain_b"]]
        out["bucket"] = pd.Series(
            [zlib.crc32((a + "|" + b_).encode()) % nb
             for a, b_ in zip(out["domain_a"], out["domain_b"])],
            index=out.index, dtype="int32")
        return out

    def pivot(g):
        s = g.groupby(["domain_a", "domain_b"], as_index=False).agg(
            n_ab=("n_ab", "sum"), n_ba=("n_ba", "sum"))
        s = s[(s["n_ab"] > 0) & (s["n_ba"] > 0)]
        s["n_ab"] = s["n_ab"].astype("int64")
        s["n_ba"] = s["n_ba"].astype("int64")
        return s

    return (
        edges.map_batches(norm, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(pivot, batch_format="pandas")
    )


PAGERANK_ITERS = 20
PAGERANK_DAMPING = 0.85


def q_pagerank_domains(sf_dir: str):
    """PageRank (Page, Brin, Motwani & Winograd 1999, "The PageRank
    citation ranking") over the domain link graph — the ITERATIVE
    distributed op (power iteration, damping 0.85, dangling mass
    redistributed uniformly). Each iteration: the rank vector ships once via
    ray.put, edge batches emit (dst, contribution) partials map-side,
    a per-dst sum closes the step — exchange O(edges) per iteration,
    no edge rematerialization (the edge Dataset is materialized once).
    Domain-granular graphs have |nodes| ≪ |edges|, which is what makes
    the broadcast-vector form right; at url granularity the rank
    vector becomes a Dataset and each step is a hash join on dst (the
    documented scale path). No SQL oracle (iterative float fixpoint);
    bounded by the pytest vs-numpy tolerance + invariants test."""
    import pandas as pd

    edges = _link_edges(sf_dir).materialize()
    epd = edges.to_pandas()  # node axis: domains (small at any sf)
    nodes = sorted(set(epd["src_domain"]) | set(epd["dst_domain"]))
    idx = {d: i for i, d in enumerate(nodes)}
    n = len(nodes)
    out_links = np.zeros(n, np.float64)
    for s, w in zip(epd["src_domain"], epd["n_links"]):
        out_links[idx[s]] += w
    ranks = np.full(n, 1.0 / n)

    def contrib_factory(rref):
        def contrib(b: pa.Table) -> pa.Table:
            r, ix, ol = sim.resolve_broadcast(rref, key="pr-ranks")
            src = [ix[s] for s in b.column("src_domain").to_pylist()]
            dst = [ix[d] for d in b.column("dst_domain").to_pylist()]
            w = np.asarray(b.column("n_links"), np.float64)
            c = r[src] * w / ol[src]
            df = pd.DataFrame({"dst": np.asarray(dst, np.int64), "c": c})
            g = df.groupby("dst", as_index=False).agg(c=("c", "sum"))
            return pa.Table.from_pydict(
                {"dst": pa.array(g["dst"].to_numpy(np.int64), pa.int64()),
                 "c": pa.array(g["c"].to_numpy(np.float64), pa.float64())})
        return contrib

    for _ in range(PAGERANK_ITERS):
        rref = ray.put((ranks, idx, out_links))
        got = (
            edges.map_batches(contrib_factory(rref),
                              batch_format="pyarrow")
            .groupby("dst")
            .aggregate(Sum("c", alias_name="c"))
        ).to_pandas()
        flow = np.zeros(n, np.float64)
        flow[got["dst"].to_numpy(np.int64)] = got["c"].to_numpy(np.float64)
        dangling = ranks[out_links == 0].sum()
        ranks = ((1.0 - PAGERANK_DAMPING) / n
                 + PAGERANK_DAMPING * (flow + dangling / n))

    return pd.DataFrame({
        "domain": nodes,
        "rank_ppb": np.floor(ranks * 1e9 + 0.5).astype(np.int64)})


def q_dataset_split(sf_dir: str):
    """Deterministic TRAIN/VAL/TEST hash split (the id-keyed 90/5/5
    assignment every training run pins before anything else): split =
    knuth32(doc_id) % 100 bands, so membership is a pure function of
    the id — stable under repartitioning, appends, and re-runs, and
    any worker can recompute it without coordination. Per-batch split
    rollup combiner → 3-row aggregate; per-doc labels never shuffle."""
    import pandas as pd

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def partial(df):
        band = _knuth32(df["doc_id"].to_numpy(np.int64)) % 100
        split = np.where(band < 90, "train",
                         np.where(band < 95, "val", "test"))
        out = pd.DataFrame({"split": split,
                            "n_chars": df["n_chars"].to_numpy(np.int64)})
        return out.groupby("split", as_index=False).agg(
            n_docs=("n_chars", "size"), sum_chars=("n_chars", "sum"))

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("split")
        .aggregate(Sum("n_docs", alias_name="n_docs"),
                   Sum("sum_chars", alias_name="sum_chars"))
    )


def _und_edges(sf_dir: str):
    """Undirected distinct domain-pair Dataset from the link graph:
    (a, b) with a < b lexicographically, self-loops dropped, deduped
    through a pair-hash bucketed reduce (a pair lives in exactly one
    bucket, so the drop_duplicates is global)."""
    import pandas as pd

    edges = _link_edges(sf_dir)
    nb = 32

    def norm(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        lo = df[["src_domain", "dst_domain"]].min(axis=1)
        hi = df[["src_domain", "dst_domain"]].max(axis=1)
        out = pd.DataFrame({"a": lo, "b": hi})
        out = out[out["a"] != out["b"]].drop_duplicates()
        out["bucket"] = pd.Series(
            [zlib.crc32((a + "|" + b_).encode()) % nb
             for a, b_ in zip(out["a"], out["b"])],
            index=out.index, dtype="int32")
        return out

    return (
        edges.map_batches(norm, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(lambda g: g[["a", "b"]].drop_duplicates(),
                    batch_format="pandas")
    )


def _endpoint_nodes(edges):
    """Distinct endpoint domains of a directed (src_domain,
    dst_domain) edge Dataset, computed distributed: per-batch distinct
    union of both endpoint columns (combiner), then a per-domain
    first. Only the O(nodes) result frame reaches the driver — the
    edge list itself never does."""
    import pandas as pd

    def endpoints(b: pa.Table) -> pa.Table:
        u = pd.concat([b.column("src_domain").to_pandas(),
                       b.column("dst_domain").to_pandas()],
                      ignore_index=True).drop_duplicates()
        return pa.Table.from_pydict(
            {"domain": pa.array(u.to_numpy(object), pa.string())})

    return (
        edges.map_batches(endpoints, batch_format="pyarrow")
        .groupby("domain")
        .map_groups(lambda g: g.head(1), batch_format="pandas")
    ).to_pandas()


def _degree_ds(und):
    """Per-node degree Dataset from a (deduped) undirected edge
    Dataset: both endpoints emitted into one combiner stream → per-
    domain sum. Stays distributed; callers that need the broadcast
    form collect it explicitly (small-node-axis contract)."""
    import pandas as pd

    def deg_partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        u = pd.concat([df["a"], df["b"]], ignore_index=True)
        g = u.groupby(u).size()
        return pa.Table.from_pydict({
            "domain": pa.array(g.index.to_numpy(object), pa.string()),
            "deg": pa.array(g.to_numpy(np.int64), pa.int64())})

    return (
        und.map_batches(deg_partial, batch_format="pyarrow")
        .groupby("domain")
        .aggregate(Sum("deg", alias_name="deg"))
    )


def _degree_frame(und):
    """Per-node degree frame from a (deduped) undirected edge Dataset:
    both endpoints emitted into one combiner stream → per-domain sum.
    Driver-materialized — the domain axis is small relative to edges
    (the same bound PageRank's rank vector uses)."""
    return _degree_ds(und).to_pandas()


def _triangles_from(und, deg_pd):
    """Triangle Dataset from a materialized undirected edge Dataset +
    its degree frame (shared by q_domain_triangles and
    q_domain_clustering so the corpus is scanned once per query, not
    once per sub-step)."""
    import pandas as pd

    deg = dict(zip(deg_pd["domain"], deg_pd["deg"].astype(int)))
    dref = ray.put(deg)
    nb_src = 32
    nb_pair = 32

    def orient(b: pa.Table) -> pa.Table:
        d = sim.resolve_broadcast(dref, key="tri-degrees")
        df = b.to_pandas()
        da = df["a"].map(d).to_numpy(np.int64)
        db_ = df["b"].map(d).to_numpy(np.int64)
        an = df["a"].to_numpy(object)
        bn = df["b"].to_numpy(object)
        # strict total order (deg, name): names are unique so no ties
        fwd = (da < db_) | ((da == db_) & (an < bn))
        src = np.where(fwd, an, bn)
        dst = np.where(fwd, bn, an)
        sdeg = np.where(fwd, da, db_)
        ddeg = np.where(fwd, db_, da)
        out = pd.DataFrame({"src": src, "dst": dst,
                            "src_deg": sdeg, "dst_deg": ddeg})
        out["bucket"] = pd.Series(
            [zlib.crc32(s.encode()) % nb_src for s in out["src"]],
            index=out.index, dtype="int32")
        return out

    oriented = und.map_batches(orient, batch_format="pyarrow").materialize()

    def wedges(g):
        # one src-hash bucket: all of each pivot's out-neighbors are
        # present, so the per-pivot pair triangle is complete
        va, wa, ua = [], [], []
        for src, grp in g.groupby("src"):
            k = len(grp)
            if k < 2:
                continue
            # order out-neighbors by the SAME (deg, name) total order
            # so emitted wedges satisfy v ≺ w like oriented edges do
            grp = grp.sort_values(["dst_deg", "dst"], kind="mergesort")
            dn = grp["dst"].to_numpy(object)
            iu, ju = np.triu_indices(k, 1)
            va.append(dn[iu])
            wa.append(dn[ju])
            ua.extend([src] * len(iu))
        import pandas as pd
        if not va:
            return pd.DataFrame({"v": pd.Series([], dtype=object),
                                 "w": pd.Series([], dtype=object),
                                 "u": pd.Series([], dtype=object),
                                 "is_edge": pd.Series([], dtype=bool),
                                 "pair_bucket": pd.Series([], dtype="int32")})
        v = np.concatenate(va)
        w = np.concatenate(wa)
        out = pd.DataFrame({"v": v, "w": w, "u": ua, "is_edge": False})
        out["pair_bucket"] = pd.Series(
            [zlib.crc32((a + "|" + b_).encode()) % nb_pair
             for a, b_ in zip(out["v"], out["w"])],
            index=out.index, dtype="int32")
        return out

    def edge_rows(b: pa.Table) -> pa.Table:
        import pandas as pd
        df = b.to_pandas()
        out = pd.DataFrame({"v": df["src"], "w": df["dst"], "u": "",
                            "is_edge": True})
        out["pair_bucket"] = pd.Series(
            [zlib.crc32((a + "|" + b_).encode()) % nb_pair
             for a, b_ in zip(out["v"], out["w"])],
            index=out.index, dtype="int32")
        return out

    wedge_ds = oriented.groupby("bucket").map_groups(
        wedges, batch_format="pandas")
    edge_ds = oriented.map_batches(edge_rows, batch_format="pyarrow")

    def close(g):
        import pandas as pd
        e = g.loc[g["is_edge"], ["v", "w"]].drop_duplicates()
        wdg = g.loc[~g["is_edge"], ["v", "w", "u"]]
        tri = wdg.merge(e, on=["v", "w"])
        if not len(tri):
            return pd.DataFrame({
                "domain_a": pd.Series([], dtype=object),
                "domain_b": pd.Series([], dtype=object),
                "domain_c": pd.Series([], dtype=object)})
        # output order: lexicographic names (the SQL mirror's a<b<c)
        names = np.sort(tri[["u", "v", "w"]].to_numpy(object), axis=1)
        return pd.DataFrame({"domain_a": names[:, 0],
                             "domain_b": names[:, 1],
                             "domain_c": names[:, 2]})

    return wedge_ds.union(edge_ds).groupby("pair_bucket").map_groups(
        close, batch_format="pandas")


def q_domain_triangles(sf_dir: str):
    """TRIANGLE ENUMERATION over the undirected domain graph — the
    graph-mining primitive behind clustering coefficients and spam-farm
    detection. Degree-oriented "forward" algorithm (Schank & Wagner
    2005, "Finding, counting and listing all triangles in large
    graphs"): every edge is oriented from its lower (degree, name)
    endpoint, each vertex's oriented out-neighborhood emits wedge
    pairs, and a wedge (v, w) closes iff the oriented edge v→w exists —
    so each triangle is found EXACTLY once (at its order-min vertex)
    and per-vertex wedge work is bounded by the oriented out-degree
    (O(√m) on any graph, vs the unbounded hub fanout of the naive
    node-iterator). Wedge/edge streams meet in a pair-hash bucketed
    reduce; exchange is O(wedges + edges), nothing but domain-name
    pairs moves. The degree map broadcasts once (small-node-axis
    bound, see _degree_frame); at url granularity it becomes a degree
    join (documented scale path)."""
    und = _und_edges(sf_dir).materialize()
    return _triangles_from(und, _degree_frame(und))


def q_domain_clustering(sf_dir: str):
    """Per-domain LOCAL CLUSTERING COEFFICIENT (Watts & Strogatz 1998
    "Collective dynamics of small-world networks"): coeff =
    triangles_at(v)·10⁶ // C(deg(v), 2) — the neighborhood-cohesion
    signal link-spam and community detectors read. Composes the
    triangle enumeration (q_domain_triangles' oriented wedge join —
    each triangle appears once) with the degree rollup: triangles
    flat-explode to their 3 vertices map-side, a per-domain count
    closes distributed, and the count stream meets the DEGREE DATASET
    in a domain-hash bucketed reduce — no driver-side merge on the
    domain axis (r4 verdict fix: at ~10⁸ domains the old pandas merge
    was a multi-GB driver step; only the orientation broadcast of the
    degree map remains driver-mediated, the documented small-node-axis
    contract whose url-granular scale path is a degree join). The edge
    Dataset materializes ONCE and feeds both the triangle chain and
    the degree rollup; the degree Dataset materializes once and feeds
    both the orientation broadcast and the distributed close. Integer-
    exact ppm: deg·(deg−1)//2 is exact, and numerator·10⁶ fits int64
    at any real degree."""
    import pandas as pd

    und = _und_edges(sf_dir).materialize()
    deg_ds = _degree_ds(und).materialize()
    degs = deg_ds.to_pandas()  # orientation broadcast only (O(nodes))
    tri = _triangles_from(und, degs)
    nb = 32

    def explode(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        u = pd.concat([df["domain_a"], df["domain_b"], df["domain_c"]],
                      ignore_index=True)
        g = u.groupby(u).size()
        return pa.Table.from_pydict({
            "domain": pa.array(g.index.to_numpy(object), pa.string()),
            "n_tri": pa.array(g.to_numpy(np.int64), pa.int64())})

    def tag_tri(df):
        return pd.DataFrame({
            "domain": df["domain"],
            "deg": np.zeros(len(df), np.int64),
            "n_tri": df["n_tri"].to_numpy(np.int64),
            "bucket": pd.Series(
                [zlib.crc32(s.encode()) % nb for s in df["domain"]],
                index=df.index, dtype="int32")})

    def tag_deg(df):
        return pd.DataFrame({
            "domain": df["domain"],
            "deg": df["deg"].to_numpy(np.int64),
            "n_tri": np.zeros(len(df), np.int64),
            "bucket": pd.Series(
                [zlib.crc32(s.encode()) % nb for s in df["domain"]],
                index=df.index, dtype="int32")})

    # per-batch triangle-count partials feed the bucketed close
    # DIRECTLY — close() sums per domain inside the bucket, so a
    # separate domain-keyed aggregate before it would be a second
    # all-to-all for nothing (measured: 7.0 -> ~5 s at sf0.1)
    tv = tri.map_batches(explode, batch_format="pyarrow").map_batches(
        tag_tri, batch_format="pandas")

    def close(g):
        s = g.groupby("domain", as_index=False).agg(
            deg=("deg", "sum"), n_tri=("n_tri", "sum"))
        s = s[s["deg"] >= 2].copy()
        deg = s["deg"].to_numpy(np.int64)
        possible = deg * (deg - 1) // 2
        s["coeff_ppm"] = (s["n_tri"].to_numpy(np.int64)
                          * 1_000_000) // possible
        return s[["domain", "n_tri", "deg", "coeff_ppm"]].astype(
            {"n_tri": "int64", "deg": "int64", "coeff_ppm": "int64"})

    return (
        deg_ds.map_batches(tag_deg, batch_format="pandas")
        .union(tv)
        .groupby("bucket")
        .map_groups(close, batch_format="pandas")
    )


def q_mad_outliers(sf_dir: str):
    """ROBUST outlier gate: median absolute deviation (Hampel's rule,
    |x − median| > 3·MAD) over document length — the heavy-tail-safe
    alternative to T44's percentile gate (a percentile moves with the
    contamination it is trying to trim; the MAD doesn't). ONE
    value-domain histogram pass gives BOTH medians: the deviation
    histogram is a driver-side transform of the value histogram
    (|v − med| re-keyed, counts summed), so no second corpus scan —
    then the integer thresholds feed a map-side per-lang counter.
    Integer-exact throughout (quantile_disc medians, integer rule)."""
    import pandas as pd

    ds = _read(sf_dir, "documents", ["lang", "n_chars"])

    def hist(df):
        vc = df["n_chars"].value_counts()
        return pd.DataFrame({"v": vc.index.to_numpy(np.int64),
                             "c": vc.to_numpy(np.int64)})

    def hist_fold(df):
        return df.groupby("v", as_index=False).agg(c=("c", "sum"))

    h = (
        ds.map_batches(hist, batch_format="pandas")
        .repartition(8)
        .map_batches(hist_fold, batch_format="pandas")
        .repartition(1)
        .map_batches(hist_fold, batch_format="pandas")
        .to_pandas()  # value-domain-sized: tiny
        .sort_values("v")
    )
    v = h["v"].to_numpy(np.int64)
    c = h["c"].to_numpy(np.int64)
    n = int(c.sum())

    def hist_median(vals, cnts, total):
        idx = -(-total // 2) - 1  # ceil(n/2)−1, quantile_disc 0.5
        return int(vals[np.searchsorted(np.cumsum(cnts), idx + 1)])

    med = hist_median(v, c, n)
    dev = pd.DataFrame({"d": np.abs(v - med), "c": c}).groupby(
        "d", as_index=False).agg(c=("c", "sum")).sort_values("d")
    mad = hist_median(dev["d"].to_numpy(np.int64),
                      dev["c"].to_numpy(np.int64), n)
    bound = 3 * mad

    def counts(df):
        x = df["n_chars"].to_numpy(np.int64)
        out = pd.DataFrame({"lang": df["lang"],
                            "outlier": np.abs(x - med) > bound})
        g = out.groupby("lang", as_index=False).agg(
            n_outliers=("outlier", "sum"), n_docs=("outlier", "size"))
        return g.astype({"n_outliers": "int64", "n_docs": "int64"})

    return (
        ds.map_batches(counts, batch_format="pandas")
        .groupby("lang")
        .aggregate(Sum("n_outliers", alias_name="n_outliers"),
                   Sum("n_docs", alias_name="n_docs"))
    )


CONCURRENCY_WINDOW_US = 600 * 1_000_000  # each event "active" 10 min


def q_peak_concurrency(sf_dir: str):
    """PEAK CONCURRENCY (max overlapping 10-minute activity windows) —
    the DISTRIBUTED SWEEP-LINE with cross-partition carry: the one
    interval-analytics shape the window/interval family still lacked.
    Each event contributes (+1 at ts, −1 at ts+W) delta rows,
    time-bucket co-partitioned; phase A reduces per-bucket NET sums
    (one int per bucket → driver exclusive prefix = each bucket's
    entering count); phase B re-sweeps each bucket sorted by
    (t, delta) — half-open intervals: −1 before +1 at ties — adding
    its prefix offset, and emits the per-bucket running max; a tiny
    global max closes. Exchange: 2 int64 rows per event, twice; no
    global sort. Exact: the running count only rises at a +1, so the
    max over bucket sweeps equals the true global max."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_id", "ts"])

    def minmax(df):
        t = df["ts"].astype("int64")
        return pd.DataFrame({"lo": [int(t.min())], "hi": [int(t.max())]})

    mm = ds.map_batches(minmax, batch_format="pandas").to_pandas()
    lo = int(mm["lo"].min())
    hi = int(mm["hi"].max()) + CONCURRENCY_WINDOW_US
    nb = dd.derive_buckets(ds.count(), rows_per_doc=2, floor=16)
    span = max(1, (hi - lo + nb) // nb)

    def deltas(df):
        t = df["ts"].astype("int64").to_numpy()
        starts = pd.DataFrame({"t": t, "d": np.int64(1)})
        ends = pd.DataFrame({"t": t + CONCURRENCY_WINDOW_US,
                             "d": np.int64(-1)})
        out = pd.concat([starts, ends], ignore_index=True)
        out["bucket"] = ((out["t"] - lo) // span).astype("int32")
        return out

    rows = ds.map_batches(deltas, batch_format="pandas").materialize()

    # per-batch per-bucket partial sums + a driver fold (O(buckets ×
    # blocks) rows) instead of a native Aggregate shuffle of every
    # delta row — same per-aggregator-overhead cliff in_transit_daily
    # measured (22.9 s → 3.3 s there)
    def net_partial(df):
        return df.groupby("bucket", as_index=False).agg(net=("d", "sum"))

    nets = (
        rows.map_batches(net_partial, batch_format="pandas")
        .to_pandas()
        .groupby("bucket", as_index=False).agg(net=("net", "sum"))
        .sort_values("bucket")
    )
    offsets: dict[int, int] = {}
    acc = 0
    for b, net in zip(nets["bucket"].astype(int), nets["net"].astype(int)):
        offsets[b] = acc
        acc += net
    off_ref = ray.put(offsets)

    def bucket_max(g):
        off = sim.resolve_broadcast(off_ref, key="sweep-offsets")
        g = g.sort_values(["t", "d"], kind="mergesort")  # -1 before +1
        run = int(off[int(g["bucket"].iloc[0])]) + \
            g["d"].to_numpy(np.int64).cumsum()
        return pd.DataFrame({"m": [int(run.max())]})

    peak = (
        rows.groupby("bucket")
        .map_groups(bucket_max, batch_format="pandas")
    ).max("m")
    return pd.DataFrame({"peak_concurrency":
                         pd.Series([int(peak)], dtype="int64")})


def q_domain_components(sf_dir: str):
    """CONNECTED COMPONENTS over the (undirected) domain link graph —
    each domain labeled with its component's lexicographically-min
    member (the canonical crawl-partition key a per-site scheduler
    uses). The edge list is aggregated and tiny relative to pages
    (≤ domains², same small-node-axis bound as PageRank), so the fold
    is a driver union-find over the materialized edge Dataset;
    url-granular graphs take the distributed min-label-propagation
    path already built for doc near-dup clusters (stages/dedup.py's
    label-propagation section, Kiveris et al. SoCC'14). Output covers
    domains with at least one edge (mirrors the SQL reachability
    closure)."""
    import pandas as pd

    epd = _und_edges(sf_dir).to_pandas()
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(epd["a"], epd["b"]):
        for v in (a, b):
            if v not in parent:
                parent[v] = v
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = min(ra, rb), max(ra, rb)
            parent[hi] = lo
    rows = sorted((d, find(d)) for d in parent)
    return pd.DataFrame({
        "domain": [r[0] for r in rows],
        "component": [r[1] for r in rows]})


HOPS_SEED = "site-0.example"
HOPS_MAX = 50


def q_domain_hops(sf_dir: str):
    """BFS HOP DISTANCE from a seed domain over the undirected link
    graph — the crawl-frontier / influence-radius shape. Iterative
    distributed op in the PageRank mold: the frontier set broadcasts
    via ray.put, one map_batches over the materialized edge Dataset
    emits the next frontier's candidates, the driver folds the
    (≤ domains) result — O(edges) exchange per round, rounds = graph
    eccentricity (2-3 on web-scale domain graphs). Unreached domains
    are absent from the output (mirrors the SQL reachability CTE)."""
    import pandas as pd

    edges = _und_edges(sf_dir).materialize()
    dist = {HOPS_SEED: 0}
    frontier = {HOPS_SEED}
    for d in range(1, HOPS_MAX + 1):
        fref = ray.put(frontier)

        def nbrs(b: pa.Table, _fref=fref) -> pa.Table:
            f = sim.resolve_broadcast(_fref, key=f"hops-frontier-{d}")
            df = b.to_pandas()
            out = pd.concat([
                df.loc[df["a"].isin(f), "b"],
                df.loc[df["b"].isin(f), "a"]], ignore_index=True)
            out = out.drop_duplicates()
            return pa.Table.from_pydict(
                {"domain": pa.array(out.to_numpy(object), pa.string())})

        got = {r["domain"] for r in
               edges.map_batches(nbrs, batch_format="pyarrow").take_all()}
        new = {x for x in got if x not in dist}
        if not new:
            break
        for x in new:
            dist[x] = d
        frontier = new
    rows = sorted(dist.items())
    return pd.DataFrame({
        "domain": [r[0] for r in rows],
        "hops": pd.Series([r[1] for r in rows], dtype="int64")})


SN_KEY_LEN = 24
SN_WINDOW = 5
SN_MAX_ED = 2


def q_sorted_neighborhood_dups(sf_dir: str):
    """SORTED-NEIGHBORHOOD blocking (Hernández & Stolfo 1995, the
    merge/purge entity-resolution classic): sort records by a
    normalized key (lowercased 24-char text prefix), compare only
    rows within SN_WINDOW ranks, keep pairs within edit distance 2.

    Distributed shape — RANK-SPACE co-partitioning without a global
    sort OR a driver materialization:
    1. key-domain histogram (distinct (key, n) rows shuffle — bounded
       by the KEY domain, the same bound ntile_deciles' value
       histogram uses) → driver sorts the key frame once and
       broadcasts key → rank-offset;
    2. rows co-partition by key-hash; each bucket orders its keys'
       docs by doc_id (a key's docs never split), adds the broadcast
       offset → EXACT global rank = the rank a full sort would give;
    3. rank-bucket co-partitioning with BOUNDARY REPLICATION (rows
       within w of a bucket's left edge also join the previous
       bucket — event_density's trick in rank space; pivot-ownership
       keeps every pair emitted exactly once) → vectorized window
       sweep with the banded capped Levenshtein.
    Only (key-prefix, doc_id, rank) rows ever shuffle."""
    import pandas as pd

    from ..functions.textstats import levenshtein_capped

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    nb = dd.derive_buckets(ds.count(), floor=8)

    def keyed(b: pa.Table) -> pa.Table:
        ks = [(t or "").lower()[:SN_KEY_LEN]
              for t in b.column("text").to_pylist()]
        return pa.Table.from_pydict(
            {"key": pa.array(ks, pa.string()),
             "doc_id": b.column("doc_id"),
             "kb": pa.array([zlib.crc32(k.encode()) % nb for k in ks],
                            pa.int32())})

    rows = ds.map_batches(keyed, batch_format="pyarrow").materialize()

    def key_counts(b: pa.Table) -> pa.Table:
        s = b.to_pandas().groupby("key").size()
        return pa.Table.from_pydict(
            {"key": pa.array(s.index.to_numpy(object), pa.string()),
             "n": pa.array(s.to_numpy(np.int64), pa.int64())})

    hist = (
        rows.map_batches(key_counts, batch_format="pyarrow")
        .groupby("key")
        .aggregate(Sum("n", alias_name="n"))
    ).to_pandas().sort_values("key", kind="mergesort")
    starts = np.concatenate(
        ([0], np.cumsum(hist["n"].to_numpy(np.int64))[:-1]))
    off_ref = ray.put(dict(zip(hist["key"], starts)))
    bucket_w = max(SN_WINDOW + 1, 4096)

    def rank_rows(g):
        off = sim.resolve_broadcast(off_ref, key="sn-offsets")
        g = g.sort_values(["key", "doc_id"], kind="mergesort")
        base = g["key"].map(off).to_numpy(np.int64)
        within = g.groupby("key", sort=False).cumcount().to_numpy(np.int64)
        rank = base + within
        out = pd.DataFrame({
            "rank": rank, "key": g["key"].to_numpy(object),
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "bucket": (rank // bucket_w).astype(np.int32)})
        near_edge = (rank % bucket_w) < SN_WINDOW
        repl = out.loc[near_edge & (out["bucket"] > 0)].copy()
        repl["bucket"] = (repl["bucket"] - 1).astype(np.int32)
        return pd.concat([out, repl], ignore_index=True)

    long = rows.groupby("kb").map_groups(rank_rows, batch_format="pandas")

    def sweep(g):
        g = g.sort_values("rank", kind="mergesort")
        r = g["rank"].to_numpy(np.int64)
        keys = g["key"].to_numpy(object)
        ids = g["doc_id"].to_numpy(np.int64)
        bkt = int(g["bucket"].iloc[0])
        out_a, out_b, out_e = [], [], []
        for i in range(len(g)):
            # pivot must be OWNED by this bucket (not a replica) so a
            # pair is emitted exactly once
            if r[i] // bucket_w != bkt:
                continue
            for j in range(i + 1, len(g)):
                if r[j] - r[i] > SN_WINDOW:
                    break
                e = levenshtein_capped(keys[i], keys[j], SN_MAX_ED)
                if e <= SN_MAX_ED:
                    a, b_ = sorted((int(ids[i]), int(ids[j])))
                    out_a.append(a)
                    out_b.append(b_)
                    out_e.append(e)
        return pd.DataFrame({
            "doc_id_a": pd.Series(out_a, dtype="int64"),
            "doc_id_b": pd.Series(out_b, dtype="int64"),
            "edit_dist": pd.Series(out_e, dtype="int64")})

    return long.groupby("bucket").map_groups(sweep, batch_format="pandas")


def q_charset_audit(sf_dir: str):
    """Byte-class CORPUS HYGIENE audit per stored page (the decode-
    chain's triage view — reference M15's mojibake family,
    utils/encoding_utils.py:73-225): raw-payload byte statistics
    (high-byte ppm, control-byte count excluding \\t\\n\\r, BOM and
    gzip markers) that tell an operator how much of a crawl needs the
    fallback decode legs BEFORE running them. Pure map-side numpy
    bincount per payload — no shuffle, payloads never leave the read
    task; the oracle recomputes every byte in the hex domain."""
    import pandas as pd

    files = expand_input_files(_corpus_dir())
    ds = ray.data.read_parquet(files, columns=["url", "html"])

    def audit(b: pa.Table) -> pa.Table:
        urls = b.column("url").to_pylist()
        n_b, hi, ct, bom, gz = [], [], [], [], []
        for raw in b.column("html").to_pylist():
            raw = raw or b""
            a = np.frombuffer(raw, np.uint8)
            counts = np.bincount(a, minlength=256) if len(a) else \
                np.zeros(256, np.int64)
            n = len(a)
            n_b.append(n)
            high = int(counts[128:].sum())
            hi.append((high * 1_000_000) // n if n else 0)
            ctrl = int(counts[:32].sum()
                       - counts[9] - counts[10] - counts[13])
            ct.append(ctrl)
            bom.append(raw[:3] == b"\xef\xbb\xbf")
            gz.append(raw[:2] == b"\x1f\x8b")
        return pa.Table.from_pydict({
            "url": pa.array(urls, pa.string()),
            "n_bytes": pa.array(n_b, pa.int64()),
            "high_ppm": pa.array(hi, pa.int64()),
            "n_ctrl": pa.array(ct, pa.int64()),
            "has_bom": pa.array(bom, pa.bool_()),
            "is_gzip": pa.array(gz, pa.bool_())})

    return ds.map_batches(audit, batch_format="pyarrow")


_ANCHOR_RE = re.compile(
    rb'href="https://(site-[0-9]+\.example)/[a-z]+/html/[0-9]+"'
    rb'>([a-z]+)</a>')
ANCHOR_TOP_K = 3


def q_anchor_texts(sf_dir: str):
    """ANCHOR-TEXT aggregation per target domain — the web-graph text
    signal (how the rest of the web describes a site) used by search
    ranking and LLM corpus augmentation. Same byte-level scan contract
    as q_link_domains (all-ASCII pattern on RAW payloads, encoding-
    transparent, gzip rows excluded on both sides); per-batch
    (dst_domain, anchor) Counter combiner → dst-hash bucketed reduce →
    per-domain top-3 anchors with a fixed (n DESC, anchor ASC)
    tie-break. Exchange is O(distinct (domain, anchor) · batches) —
    the anchor vocabulary, never the corpus."""
    import pandas as pd

    files = expand_input_files(_corpus_dir())
    ds = ray.data.read_parquet(files, columns=["html"])
    nb = 32

    def partial(b: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for raw in b.column("html").to_pylist():
            raw = raw or b""
            if raw[:2] == b"\x1f\x8b":
                continue
            for dst, anchor in _ANCHOR_RE.findall(raw):
                c[(dst.decode("ascii"), anchor.decode("ascii"))] += 1
        items = sorted(c.items())
        doms = [k[0] for k, _ in items]
        return pa.Table.from_pydict({
            "bucket": pa.array(
                [zlib.crc32(d.encode()) % nb for d in doms], pa.int32()),
            "dst_domain": pa.array(doms, pa.string()),
            "anchor": pa.array([k[1] for k, _ in items], pa.string()),
            "n_links": pa.array([v for _, v in items], pa.int64())})

    def top_k(g):
        s = g.groupby(["dst_domain", "anchor"], as_index=False).agg(
            n_links=("n_links", "sum"))
        s = s.sort_values(["dst_domain", "n_links", "anchor"],
                          ascending=[True, False, True], kind="mergesort")
        s["arank"] = s.groupby("dst_domain").cumcount() + 1
        s = s[s["arank"] <= ANCHOR_TOP_K]
        return s.astype({"n_links": "int64", "arank": "int64"})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(top_k, batch_format="pandas")
    )


INDEX_POSTING_CAP = 1000


def q_inverted_index(sf_dir: str):
    """INVERTED-INDEX build (term → document posting list) — the
    retrieval-side primitive of every dedup-by-lookup / RAG corpus.
    Per-batch distinct (term, doc_id) posting rows (a doc lives in one
    batch, so batch-distinct IS globally distinct) → term-hash
    bucketed reduce: full df per term plus the FIRST
    INDEX_POSTING_CAP doc ids (sorted) joined into the posting string
    — the truncation real indexes apply to unbounded lists; df stays
    the untruncated count. Exchange is O(total postings): inherent —
    the postings ARE the output."""
    import pandas as pd

    from ..functions.textstats import tokens as _tokens

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    nb = max(dd.width_floor(),
             dd.derive_buckets(ds.count(), rows_per_doc=30))

    def postings(b: pa.Table) -> pa.Table:
        t_col: list[str] = []
        i_col: list[int] = []
        for i, t in zip(b.column("doc_id").to_pylist(),
                        b.column("text").to_pylist()):
            for w in set(_tokens((t or "").lower())):
                t_col.append(w)
                i_col.append(i)
        return pa.Table.from_pydict({
            "bucket": pa.array(
                [zlib.crc32(w.encode()) % nb for w in t_col], pa.int32()),
            "term": pa.array(t_col, pa.string()),
            "doc_id": pa.array(i_col, pa.int64())})

    def build(g):
        g = g.sort_values(["term", "doc_id"], kind="mergesort")
        rows = []
        for term, grp in g.groupby("term", sort=False):
            ids = grp["doc_id"].to_numpy(np.int64)
            rows.append((term, len(ids), ",".join(
                str(x) for x in ids[:INDEX_POSTING_CAP])))
        return pd.DataFrame(rows, columns=["term", "df", "postings"]) \
            .astype({"df": "int64"})

    return (
        ds.map_batches(postings, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(build, batch_format="pandas")
    )


# --- T133: calendar range join (in-transit inventory by day) ---------

US_PER_DAY = 86_400_000_000


def q_in_transit_daily(sf_dir: str):
    """CALENDAR RANGE JOIN — for every day, how many lineitems were in
    transit (ship_day ≤ day ≤ ship_day + transit_days) — the
    point-in-interval join shape (inventory/concurrency dashboards;
    the SQL is literally intervals × generate_series). The reference
    has no interval analytics; this is the grid-side twin of T132's
    sweep-line. Transit duration is a deterministic column function
    ((l_orderkey + l_linenumber) % 30 + 1 days) standing in for the
    receipt-date column TPC-H has but the sf tables don't carry.

    Scale shape: instead of exploding each interval to its O(duration)
    grid days (the oracle's formulation), each lineitem ships exactly
    TWO delta rows (+1 at ship day, −1 the day after receipt); the
    per-day nets aggregate is bounded by the CALENDAR AXIS (days, not
    rows), and the running sum over that tiny frame is driver-side —
    the same delta-encoding that makes T132 exact, reused for a daily
    series. Exchange: 2 int64 rows per lineitem, result O(days)."""
    import pandas as pd

    ds = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_linenumber", "l_shipdate"])

    def deltas(df):
        day0 = (df["l_shipdate"].astype("int64").to_numpy()
                // US_PER_DAY)
        dur = ((df["l_orderkey"].to_numpy(np.int64)
                + df["l_linenumber"].to_numpy(np.int64)) % 30 + 1)
        out = pd.DataFrame({
            "day": np.concatenate([day0, day0 + dur + 1]),
            "d": np.concatenate([np.ones(len(day0), np.int64),
                                 -np.ones(len(day0), np.int64)])})
        # batch-level combine: ≤ 2 rows per distinct day per batch
        return out.groupby("day", as_index=False).agg(d=("d", "sum"))

    def fold(df):
        return df.groupby("day", as_index=False).agg(d=("d", "sum"))

    # two-level fold instead of a native hash aggregate: each block is
    # already ≤ day-domain rows, so repartition+fold is O(days) per
    # block (the native Aggregate measured 22 s vs 1.5 s here — same
    # cliff BASELINE.md records for high-key native aggregates, hit
    # via per-aggregator overhead at this block count)
    nets = (
        ds.map_batches(deltas, batch_format="pandas")
        .repartition(8)
        .map_batches(fold, batch_format="pandas")
        .repartition(1)
        .map_batches(fold, batch_format="pandas")
    ).to_pandas().sort_values("day").reset_index(drop=True)
    days = nets["day"].to_numpy(np.int64)
    lo, hi = int(days.min()), int(days.max())
    dense = np.zeros(hi - lo + 1, np.int64)
    dense[days - lo] = nets["d"].to_numpy(np.int64)
    run = dense.cumsum()
    keep = run > 0
    return pd.DataFrame({
        "day": pd.to_datetime((np.arange(lo, hi + 1)[keep])
                              * US_PER_DAY, unit="us")
        .astype("datetime64[us]"),
        "n_in_transit": run[keep]})


# --- T134: DSIR hashed-ngram importance weights ----------------------


def q_dsir_weights(sf_dir: str):
    """DSIR-style IMPORTANCE WEIGHTS (Data Selection via Importance
    Resampling, Xie et al. 2023, arXiv:2302.03169): score every doc by
    how target-like its hashed unigram distribution is — the weight
    that drives importance resampling of a raw crawl toward a curated
    target. Target slice = lang == 'en'; per-token importance is the
    add-one-smoothed count ratio in ppm,
    w(t) = (ct+1)(S+1)·10⁶ // ((cs+1)(T+1)), and
    dsir_score(doc) = Σ over token occurrences of w(t) (integer-exact;
    the true DSIR log-ratio sum is monotone in each term — the ppm
    ratio sum is the established integer-exact stand-in, same
    convention as T91's rarity proxy for perplexity).

    Shape (clones T91's exchange economics): ONE corpus pass emits
    (th, ct, cs) count partials — both sides ride one exchange —
    crc-bucketed vectorized reduce MATERIALIZED once (vocab-sized), so
    T and S are cheap aggregates; per-token weights are computed
    distributed on the vocab relation (Python-bigint per vocab row —
    the (ct+1)(S+1) product overflows int64 at web scale, the ppm
    quotient doesn't); native hash join against per-(doc, token) int64
    probe rows; per-doc bucketed sum. Overflow margin on the final
    sum: documented int64 edge shared with T91 (oracle in HUGEINT)."""
    import pandas as pd

    docs = _read(sf_dir, "documents", ["doc_id", "text", "lang"])
    n_docs = docs.count()
    n_gb = dd.derive_buckets(n_docs, rows_per_doc=32)

    def count_bucketize(b: pa.Table) -> pa.Table:
        t = tx.dsir_count_partial(b)
        th = t.column("th").to_numpy().view(np.uint64)
        bk = (th % np.uint64(n_gb)).astype(np.int32)
        return t.append_column("bucket", pa.array(bk))

    def count_reduce(g):
        s = g.groupby("th", as_index=False).agg(
            ct=("ct", "sum"), cs=("cs", "sum"))
        s = s.astype({"th": "int64", "ct": "int64", "cs": "int64"}) \
            .rename(columns={"th": "th_r"})
        return pa.Table.from_pandas(
            s, preserve_index=False).replace_schema_metadata(None)

    counts = (
        docs.map_batches(count_bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(count_reduce, batch_format="pandas")
        .repartition(max(1, min(32, -(-n_docs // 25_000))))
        .materialize()  # vocab-sized; reused for totals + weights
    )
    t_total = int(counts.sum("ct"))
    s_total = int(counts.sum("cs"))

    def weigh(df):
        # Python-int per vocab row: (ct+1)(S+1)·10⁶ needs >64 bits at
        # corpus scale; the ppm quotient fits (documented edge)
        w = [int(((int(a) + 1) * (s_total + 1) * 1_000_000)
                 // ((int(b) + 1) * (t_total + 1)))
             for a, b in zip(df["ct"], df["cs"])]
        return pd.DataFrame({"th_r": df["th_r"].to_numpy(np.int64),
                             "w": pd.Series(w, dtype="int64")})

    weights = counts.map_batches(weigh, batch_format="pandas")

    probe = docs.map_batches(tx.rare_token_rows, batch_format="pyarrow")
    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_part = max(8, min(dd.derive_buckets(n_docs, rows_per_doc=64), cpus))
    joined = probe.join(
        weights, "inner", n_part, on=("th",), right_on=("th_r",),
        aggregator_ray_remote_args=_join_remote_args(n_part),
    )

    n_db = dd.derive_buckets(n_docs)

    def score_partial(df):
        sc = df["occ"].to_numpy(np.int64) * df["w"].to_numpy(np.int64)
        u, inv = np.unique(df["doc_id"].to_numpy(np.int64),
                           return_inverse=True)
        sums = np.zeros(len(u), np.int64)
        np.add.at(sums, inv, sc)
        return pd.DataFrame({
            "doc_id": u, "dsir_score": sums,
            "bucket": (u % n_db).astype("int32")})

    def doc_reduce(g):
        s = g.groupby("doc_id", as_index=False).agg(
            dsir_score=("dsir_score", "sum"))
        return s.astype({"doc_id": "int64", "dsir_score": "int64"})

    return (
        joined.map_batches(score_partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(doc_reduce, batch_format="pandas")
    )


# --- T135: signed-random-projection LSH embedding near-dups ----------

SRP_BITS = 48
SRP_BAND_BITS = 6  # 8 bands × 6 bits (recall-tuned for cos ≥ 0.4:
# P[share a band] = 1 − (1 − p^6)^8 with p = 1 − θ/π; ≈ 0.4 at the
# threshold, → 1 fast above it — the probabilistic-recall contract LSH
# always trades; the ORACLE mirrors the banding, so output equality
# is exact regardless)
SRP_COS_MIN = 0.4  # same acceptance threshold as T5 (comparable sets)


def _srp_planes() -> "np.ndarray":
    """(SRP_BITS, dims) int8 hyperplane matrix, entries
    md5_number_upper('srp:j:d') % 15 − 7 — deterministic, broadcast-
    free (every worker re-derives it), SQL-mirrorable."""
    from ..functions.textstats import _md5_u64

    return np.array(
        [[(_md5_u64(f"srp:{j}:{d}".encode()) % 15) - 7
          for d in range(64)] for j in range(SRP_BITS)], np.int64)


def q_srp_embedding_dups(sf_dir: str):
    """SRP-LSH embedding near-dup pairs (Charikar 2002 random-
    hyperplane signatures, STOC '02) — the third member of the
    embedding-similarity family: T5 is the size-gated exact sweep,
    T21 buckets by IVF centroid (needs a k-means), SRP needs NO
    trained state — signature bits are sign(v·h) against fixed
    hyperplanes, so it runs on a cold corpus in one pass. Banding the
    48-bit signature into 4 × 12-bit chunks yields candidates
    (sharing ≥ 1 band post-cap); the output predicate — shares a band
    AND exact cosine ≥ SRP_COS_MIN — is deterministic and fully
    SQL-mirrored (integer-micro signature dots; float64 cosine
    matches DuckDB's list_cosine_similarity on well-separated data,
    same contract as T5).

    Shape: signature map_batches (int64 matmul, zero-copy Arrow→numpy)
    → band rows (4 per vector) → band-hash bucketed pair emission with
    the MAX_BUCKET cap (dd.band_bucket_pairs, mirrored in SQL) → pair
    dedup → cosine verify against the BROADCAST candidate-vector
    subset (candidates ≪ corpus is the LSH contract, same bounded
    assumption as the MinHash chain documents)."""
    import pandas as pd

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    n_vecs = ds.count()
    wf = dd.width_floor()
    nb = max(wf, dd.derive_buckets(n_vecs, rows_per_doc=4))
    planes = _srp_planes()

    def sigs(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_numpy()
        emb = np.stack(b.column("embedding").to_numpy(zero_copy_only=False))
        e_micro = np.floor(emb.astype(np.float64) * 1_000_000) \
            .astype(np.int64)
        dots = e_micro @ planes.T  # (n, SRP_BITS) int64-exact
        bits = (dots >= 0).astype(np.uint64)
        sig = np.zeros(len(ids), np.uint64)
        for j in range(SRP_BITS):
            sig |= bits[:, j] << np.uint64(j)
        n_bands = SRP_BITS // SRP_BAND_BITS
        mask = np.uint64((1 << SRP_BAND_BITS) - 1)
        out_id, out_key = [], []
        for band in range(n_bands):
            chunk = (sig >> np.uint64(band * SRP_BAND_BITS)) & mask
            out_id.append(ids)
            # unique (band, chunk) key: band·2^SRP_BAND_BITS + chunk
            out_key.append(chunk.astype(np.int64)
                           + (band << SRP_BAND_BITS))
        key = np.concatenate(out_key)
        return pa.Table.from_pydict({
            "bucket": pa.array((key % nb).astype(np.int32)),
            "band_key": pa.array(key, pa.int64()),
            "doc_id": pa.array(np.concatenate(out_id), pa.int64())})

    pairs = (
        ds.map_batches(sigs, batch_format="pyarrow", batch_size=512)
        .groupby("bucket")
        .map_groups(dd.band_bucket_pairs, batch_format="pandas")
    )
    npb = max(wf, dd.derive_buckets(n_vecs, rows_per_doc=2, floor=16))

    def bucketize_pairs(df):
        a = df["doc_id_a"].to_numpy(np.int64)
        b = df["doc_id_b"].to_numpy(np.int64)
        return pd.DataFrame({
            "doc_id_a": a, "doc_id_b": b,
            "pair_bucket": ((a * 1_000_003 + b) % npb).astype("int32")})

    cand = (
        pairs.map_batches(bucketize_pairs, batch_format="pandas")
        .groupby("pair_bucket")
        .map_groups(dd.dedup_pairs, batch_format="pandas")
        .materialize()  # candidate-pair-sized (LSH contract)
    )

    # gather candidate vectors once, broadcast float64 matrix
    ids_pd = cand.to_pandas()
    cand_ids = np.unique(np.concatenate([
        ids_pd["doc_id_a"].to_numpy(np.int64),
        ids_pd["doc_id_b"].to_numpy(np.int64)])) if len(ids_pd) else \
        np.empty(0, np.int64)
    id_ref = ray.put(cand_ids)  # sorted int64 array (np.unique)

    def gather(b: pa.Table) -> pa.Table:
        want = sim.resolve_broadcast(id_ref, key="srp-cand-ids")
        keep = np.isin(b.column("vec_id").to_numpy(), want,
                       assume_unique=False)
        return b.filter(pa.array(keep))

    vecs = ds.map_batches(gather, batch_format="pyarrow").to_pandas()
    vmap = {int(i): np.asarray(v, np.float64)
            for i, v in zip(vecs["vec_id"], vecs["embedding"])}
    vref = ray.put(vmap)

    def verify(df):
        vm = sim.resolve_broadcast(vref, key="srp-cand-vecs")
        keep_a, keep_b = [], []
        for a, b in zip(df["doc_id_a"], df["doc_id_b"]):
            va, vb = vm[int(a)], vm[int(b)]
            denom = np.linalg.norm(va) * np.linalg.norm(vb)
            if denom > 0 and float(va @ vb) / denom >= SRP_COS_MIN:
                keep_a.append(int(a))
                keep_b.append(int(b))
        return pd.DataFrame({
            "vec_id_a": pd.Series(keep_a, dtype="int64"),
            "vec_id_b": pd.Series(keep_b, dtype="int64")})

    return cand.map_batches(verify, batch_format="pandas")


# --- T136: char-window cross-document substring dedup ----------------

SUBSTR_W = 64
SUBSTR_STRIDE = 16


def q_substring_dup_spans(sf_dir: str):
    """CROSS-DOCUMENT SUBSTRING dedup at character granularity — the
    windowed stand-in for suffix-array ExactSubstr dedup (Lee et al.
    2022, arXiv:2107.06499, 'Deduplicating Training Data Makes
    Language Models Better'): hash every SUBSTR_W-char window at
    SUBSTR_STRIDE alignment (md5, never the text), call a window
    duplicated when it appears in ≥ 2 DISTINCT docs, and report per
    doc the duplicated-window count plus the ppm of its chars covered
    by the UNION of its duplicated windows (merged-interval length —
    stride < width ⇒ windows overlap). Catches copy-paste spans that
    token n-grams miss under retokenization (T46 is the token twin).

    Shape: window rows (wh, doc_id, start) → wh-hash bucketed reduce
    emits ONLY dup windows' (doc_id, start) — the window set maps back
    to spans with NO second join; union-sentinel trick: the per-doc
    totals relation rides the SAME doc-bucket exchange as the dup
    rows (start = −1 sentinel), one reduce computes merged coverage +
    the left-outer zero fill. Exchange: O(chars / stride) 20-byte rows
    — inherent to substring-level dedup (Lee et al. burn a suffix
    array on one box for the same information)."""
    import pandas as pd

    from ..functions.textstats import _md5_u64

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()
    nwb = max(dd.width_floor(),
              dd.derive_buckets(n_docs, rows_per_doc=40))
    ndb = dd.derive_buckets(n_docs)

    def win_rows(b: pa.Table) -> pa.Table:
        ids, starts, whs = [], [], []
        for i, t in zip(b.column("doc_id").to_pylist(),
                        b.column("text").to_pylist()):
            t = t or ""
            for p in range(0, len(t) - (SUBSTR_W - 1), SUBSTR_STRIDE):
                ids.append(i)
                starts.append(p)
                whs.append(_md5_u64(t[p:p + SUBSTR_W].encode("utf-8")))
        wh = np.array(whs, np.uint64).view(np.int64) if whs else \
            np.empty(0, np.int64)
        return pa.Table.from_pydict({
            "bucket": pa.array((wh.view(np.uint64)
                                % np.uint64(nwb)).astype(np.int32)),
            "wh": pa.array(wh, pa.int64()),
            "doc_id": pa.array(np.array(ids, np.int64), pa.int64()),
            "start": pa.array(np.array(starts, np.int64), pa.int64())})

    def keep_dups(g):
        # runs of equal wh (sorted); emit rows of whs with ≥ 2
        # DISTINCT doc_ids — vectorized run-length + distinct count
        g = g.sort_values(["wh", "doc_id", "start"], kind="mergesort")
        wh = g["wh"].to_numpy(np.int64)
        di = g["doc_id"].to_numpy(np.int64)
        if not len(wh):
            return pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                                 "start": pd.Series(dtype="int64")})
        new_wh = np.empty(len(wh), bool)
        new_wh[0] = True
        new_wh[1:] = wh[1:] != wh[:-1]
        new_doc = np.empty(len(wh), bool)
        new_doc[0] = True
        new_doc[1:] = new_wh[1:] | (di[1:] != di[:-1])
        run_id = np.cumsum(new_wh) - 1
        n_docs_per_run = np.bincount(run_id, weights=new_doc).astype(
            np.int64)
        keep = n_docs_per_run[run_id] >= 2
        return pd.DataFrame({"doc_id": di[keep],
                             "start": g["start"].to_numpy(np.int64)[keep]})

    dup_rows = (
        ds.map_batches(win_rows, batch_format="pyarrow", batch_size=256)
        .groupby("bucket")
        .map_groups(keep_dups, batch_format="pandas")
    )

    def totals(b: pa.Table) -> pa.Table:
        ids, nw, ln = [], [], []
        for i, t in zip(b.column("doc_id").to_pylist(),
                        b.column("text").to_pylist()):
            t = t or ""
            w = max(0, (len(t) - (SUBSTR_W - 1) + SUBSTR_STRIDE - 1)
                    // SUBSTR_STRIDE)
            if w > 0:
                ids.append(i)
                nw.append(w)
                ln.append(len(t))
        return pa.Table.from_pydict({
            "doc_id": pa.array(np.array(ids, np.int64)),
            "n_windows": pa.array(np.array(nw, np.int64)),
            "len": pa.array(np.array(ln, np.int64)),
            "start": pa.array(np.full(len(ids), -1, np.int64))})

    tot = ds.map_batches(totals, batch_format="pyarrow")

    def add_bucket_dup(df):
        df = df.copy()
        df["n_windows"] = np.int64(0)
        df["len"] = np.int64(0)
        df["bkt"] = (df["doc_id"].to_numpy(np.int64) % ndb).astype("int32")
        return df[["bkt", "doc_id", "n_windows", "len", "start"]]

    def add_bucket_tot(df):
        df = df.copy()
        df["bkt"] = (df["doc_id"].to_numpy(np.int64) % ndb).astype("int32")
        return df[["bkt", "doc_id", "n_windows", "len", "start"]]

    unioned = dup_rows.map_batches(
        add_bucket_dup, batch_format="pandas").union(
        tot.map_batches(add_bucket_tot, batch_format="pandas"))

    def span_reduce(g):
        rows = []
        for did, grp in g.groupby("doc_id", sort=False):
            nwv = int(grp["n_windows"].max())
            lnv = int(grp["len"].max())
            st = np.sort(grp.loc[grp["start"] >= 0, "start"]
                         .to_numpy(np.int64))
            n_dup = len(st)
            if n_dup:
                gaps = np.diff(st)
                cov = int(np.minimum(gaps, SUBSTR_W).sum()) + SUBSTR_W
            else:
                cov = 0
            rows.append((did, nwv, n_dup,
                         cov * 1_000_000 // lnv if lnv else 0))
        out = pd.DataFrame(rows, columns=[
            "doc_id", "n_windows", "n_dup_windows", "dup_char_ppm"])
        return out.astype({c: "int64" for c in out.columns})

    return unioned.groupby("bkt").map_groups(
        span_reduce, batch_format="pandas")


# --- T137: hashed linear classifier scoring --------------------------


def q_quality_lr(sf_dir: str):
    """LINEAR TEXT-CLASSIFIER INFERENCE — the fastText-style quality
    gate every web pipeline runs (CCNet/RefinedWeb keep-or-drop):
    score(doc) = Σ over token occurrences of w(token), label =
    score ≥ 0. Pure map-side model scoring: ZERO exchange, one pass,
    vectorized per batch; in production the trained weight vector is
    ray.put once and resolved per actor — here the weights are a
    deterministic hash of the token (md5 % 2001 − 1000 milli-units)
    so the DuckDB oracle is closed-form while the Ray-side plumbing
    (broadcast-lookup scoring inside map_batches) is exactly the real
    thing. Docs with ≥ 1 token are scored (inner semantics both
    sides)."""
    import pandas as pd

    from ..functions.textstats import _md5_u64, tokens as _tokens

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def score(b: pa.Table) -> pa.Table:
        ids, sc = [], []
        for i, t in zip(b.column("doc_id").to_pylist(),
                        b.column("text").to_pylist()):
            tk = _tokens((t or "").lower())
            if not tk:
                continue
            s = 0
            for w in tk:
                s += (_md5_u64(b"lrw:" + w.encode("utf-8")) % 2001) - 1000
            ids.append(i)
            sc.append(s)
        sa = np.array(sc, np.int64) if sc else np.empty(0, np.int64)
        return pa.Table.from_pydict({
            "doc_id": pa.array(np.array(ids, np.int64), pa.int64()),
            "score_milli": pa.array(sa, pa.int64()),
            "is_quality": pa.array((sa >= 0).astype(np.int64),
                                   pa.int64())})

    return ds.map_batches(score, batch_format="pyarrow")


# --- T138: TPC-H Q21 shape (multi-EXISTS per join group) -------------

Q21_LATE_DAYS = 90
Q21_TOP_K = 20


def q_q21_waiting_suppliers(sf_dir: str):
    """TPC-H Q21 SHAPE — suppliers who kept multi-supplier orders
    waiting: on orders with ≥ 2 distinct suppliers, count per supplier
    the orders where THAT supplier shipped late (any line >
    o_orderdate + Q21_LATE_DAYS) and every OTHER supplier was on time
    — the classic EXISTS + NOT-EXISTS pair on one join key, the last
    TPC-H join archetype the battery lacked (late test adapted to the
    sf tables' columns: no commit/receipt dates). Top-Q21_TOP_K by
    (n_waiting DESC, s_suppkey ASC).

    Shape: NO native join — both sides co-partition by orderkey hash
    through ONE union exchange: lineitem pre-combines to per-(order,
    supplier, max_shipdate) partials BEFORE the shuffle (any-late ⇔
    max-late, so the EXISTS collapses into a mergeable max — exchange
    O(order-supplier pairs), not lines), orders rows ride the same
    exchange as suppkey = −1 sentinels carrying the date; the
    per-bucket reduce merges partials, attaches dates vectorized, and
    applies the both-quantifier predicate, emitting per-supplier
    PARTIAL counts map-side; a second tiny supplier-bucketed exchange
    sums + partial top-k → final sort. (First draft used a native
    hash join + a post-join bucketed reduce: 18.0 s at sf0.1; this
    single-exchange plan measures 10.8 s.)"""
    import pandas as pd

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_suppkey", "l_shipdate"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])
    n_rows = li.count()

    nob = dd.derive_buckets(n_rows, rows_per_doc=1)
    nsb = max(8, dd.derive_buckets(n_rows, rows_per_doc=64, floor=8))

    def pair_partial(df):
        g = df.groupby(["l_orderkey", "l_suppkey"], as_index=False).agg(
            ms=("l_shipdate", "max"))
        g = g.rename(columns={"l_orderkey": "ok", "l_suppkey": "sk"})
        g["ms"] = g["ms"].astype("int64")
        g["bkt"] = (g["ok"].to_numpy(np.int64) % nob).astype(np.int32)
        return g[["bkt", "ok", "sk", "ms"]]

    def order_rows(df):
        return pd.DataFrame({
            "bkt": (df["o_orderkey"].to_numpy(np.int64) % nob)
            .astype(np.int32),
            "ok": df["o_orderkey"].to_numpy(np.int64),
            "sk": np.full(len(df), -1, np.int64),
            "ms": df["o_orderdate"].astype("int64").to_numpy()})

    unioned = li.map_batches(pair_partial, batch_format="pandas").union(
        orders.map_batches(order_rows, batch_format="pandas"))

    def order_verdicts(g):
        dates = g[g["sk"] < 0]
        pairs = g[g["sk"] >= 0].groupby(["ok", "sk"], as_index=False) \
            .agg(ms=("ms", "max"))
        m = pairs.merge(dates[["ok", "ms"]].rename(columns={"ms": "od"}),
                        on="ok", how="inner")
        m["late"] = (m["ms"].to_numpy(np.int64)
                     > m["od"].to_numpy(np.int64)
                     + Q21_LATE_DAYS * US_PER_DAY)
        v = m.groupby("ok")["late"].agg(["size", "sum"])
        good = v.index[(v["size"] >= 2) & (v["sum"] == 1)]
        w = m[m["late"] & m["ok"].isin(good)]
        out = w.groupby("sk", as_index=False).size()
        out.columns = ["s_suppkey", "n_waiting"]
        out = out.astype({"s_suppkey": "int64", "n_waiting": "int64"})
        out["sbkt"] = (out["s_suppkey"].to_numpy(np.int64) % nsb) \
            .astype(np.int32)
        return out

    def supp_reduce(g):
        s = g.groupby("s_suppkey", as_index=False).agg(
            n_waiting=("n_waiting", "sum"))
        s = s.astype({"s_suppkey": "int64", "n_waiting": "int64"})
        s["neg_sk"] = -s["s_suppkey"].to_numpy(np.int64)
        return s.sort_values(["n_waiting", "neg_sk"],
                             ascending=False).head(Q21_TOP_K)

    out = (
        unioned.groupby("bkt")
        .map_groups(order_verdicts, batch_format="pandas")
        .groupby("sbkt")
        .map_groups(supp_reduce, batch_format="pandas")
        .sort(["n_waiting", "neg_sk"], descending=True)
        .limit(Q21_TOP_K)
    )
    return out.select_columns(["s_suppkey", "n_waiting"])


# --- T139: interpolated (continuous) grouped quantiles ---------------


def q_value_quantiles_cont(sf_dir: str):
    """Grouped INTERPOLATED quantiles (percentile_cont semantics) —
    completes the quantile family: T26 is discrete (quantile_disc),
    T34 the mergeable sketch, this the linear interpolation between
    adjacent order statistics at pos = q·(N−1). Integer-exact in
    pico-units: with q in micro, lo = q(N−1)//10⁶, r = q(N−1) mod 10⁶,
    out = v_lo·(10⁶−r) + v_hi·r — both sides compute this exact
    integer formula (DuckDB's own quantile_cont works in doubles, so
    the oracle spells the arithmetic out instead of calling it).
    Same single-exchange histogram shape as T26: only batch-distinct
    (type, value_micro) rows shuffle."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(df):
        df = df.assign(v=_micro_int_col(df["value"]))
        g = (df.groupby(["event_type", "v"], as_index=False)
             .agg(n=("v", "size")))
        g["n"] = g["n"].astype("int64")
        return g[["event_type", "v", "n"]]

    hist = ds.map_batches(partial, batch_format="pandas")

    def quantiles(g):
        g = g.sort_values("v", kind="mergesort")
        v = g["v"].to_numpy(dtype=np.int64)
        c = g["n"].to_numpy(dtype=np.int64)
        cum = np.cumsum(c)
        total = int(cum[-1])

        def qc(q_micro: int) -> int:
            num = q_micro * (total - 1)
            lo, r = num // 1_000_000, num % 1_000_000
            vlo = int(v[np.searchsorted(cum, lo + 1)])
            vhi = int(v[np.searchsorted(cum, lo + 2)]) \
                if lo + 1 < total else vlo
            return vlo * (1_000_000 - r) + vhi * r

        return pd.DataFrame(
            {"event_type": [g["event_type"].iloc[0]],
             "p25_pico": [qc(250_000)],
             "p50_pico": [qc(500_000)],
             "p90_pico": [qc(900_000)],
             "n_events": [total]})

    return hist.groupby("event_type").map_groups(
        quantiles, batch_format="pandas"
    )


# --- T140: sliding-window count-distinct (sliding DAU) ---------------

US_PER_HOUR = 3_600_000_000
SLIDE_WINDOW_HOURS = 24


def q_sliding_distinct_users(sf_dir: str):
    """SLIDING-WINDOW COUNT-DISTINCT — distinct users over the
    trailing 24 h, advancing hourly (the live-DAU dashboard shape and
    the sliding twin of T25's overlapping count windows; COUNT/SUM
    slide cheaply but DISTINCT does not distribute over overlaps, so
    the sketch-free exact form needs per-window flag rows). Window
    w covers hours (w−23 … w]; emitted for every window that saw ≥ 1
    event.

    Shape: per-batch DISTINCT (hour, user) flags first (bounded by
    users·hours, never events), each flag explodes to its ≤ 24
    windows, batch-distinct again, then a USER-hash bucketed reduce
    counts each window's users per bucket (a user lives in exactly
    one bucket ⇒ bucket partials sum to the global distinct count);
    the per-(window, bucket) partials fold through the two-level
    repartition reduce (window axis is calendar-bounded). Exchange:
    ≤ 24 · distinct(hour, user) 16-byte rows."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    nb = dd.derive_buckets(ds.count())

    def flags(df):
        h = df["ts"].astype("int64").to_numpy() // US_PER_HOUR
        d = pd.DataFrame({"h": h, "u": df["user_id"].to_numpy(np.int64)}
                         ).drop_duplicates()
        k = np.arange(SLIDE_WINDOW_HOURS, dtype=np.int64)
        w = (d["h"].to_numpy(np.int64)[:, None] + k[None, :]).ravel()
        u = np.repeat(d["u"].to_numpy(np.int64), SLIDE_WINDOW_HOURS)
        out = pd.DataFrame({"w": w, "u": u}).drop_duplicates()
        out["bucket"] = (out["u"] % nb).astype("int32")
        return out

    def bucket_counts(g):
        s = g.drop_duplicates(["w", "u"]).groupby(
            "w", as_index=False).agg(n=("u", "size"))
        return s.astype({"w": "int64", "n": "int64"})

    def fold(df):
        return df.groupby("w", as_index=False).agg(n=("n", "sum"))

    per_w = (
        ds.map_batches(flags, batch_format="pandas")
        .groupby("bucket")
        .map_groups(bucket_counts, batch_format="pandas")
        .repartition(8)
        .map_batches(fold, batch_format="pandas")
        .repartition(1)
        .map_batches(fold, batch_format="pandas")
    ).to_pandas().sort_values("w").reset_index(drop=True)
    return pd.DataFrame({
        "w_hour": pd.to_datetime(per_w["w"].to_numpy(np.int64)
                                 * US_PER_HOUR, unit="us")
        .astype("datetime64[us]"),
        "n_users": per_w["n"].astype("int64")})


# --- T143: bidirectional two-nation trade volume (TPC-H Q7 shape) ----

TRADE_NATION_A = 3  # NATION_3
TRADE_NATION_B = 7  # NATION_7


def q_nation_trade_volume(sf_dir: str):
    """TPC-H Q7 shape — cross-nation shipping volume between TWO
    nations, by (supplier nation, customer nation, ship year), both
    directions. The nation filter is the scale lever: BOTH join
    inputs drop ~23/25 of their rows MAP-SIDE against two tiny
    broadcast dimension maps (supplier suppkey→nationkey, customer
    custkey→nationkey, each restricted to the two nations) before the
    single orderkey exchange, so the big-big join runs over ~8% of
    lineitem and orders. The surviving rollup key space is ≤ 2
    directions × ship-years — per-batch partials then a tiny native
    aggregate. Reference class: §2.5 grouped rollups
    (document_service.py batch tallies) recast as a multi-dimension
    star join."""
    import pandas as pd

    nats = (TRADE_NATION_A, TRADE_NATION_B)

    sdf = _read(sf_dir, "supplier",
                ["s_suppkey", "s_nationkey"]).to_pandas()
    sdf = sdf[sdf["s_nationkey"].isin(nats)]
    s_keys = np.sort(sdf["s_suppkey"].to_numpy(np.int64))
    s_nat = sdf.set_index("s_suppkey")["s_nationkey"].astype(
        np.int64).sort_index().to_numpy()
    sref = ray.put((s_keys, s_nat))

    cdf = _read(sf_dir, "customer",
                ["c_custkey", "c_nationkey"]).map_batches(
        lambda b: b.loc[b["c_nationkey"].isin(nats),
                        ["c_custkey", "c_nationkey"]],
        batch_format="pandas").to_pandas()
    # the two-nation slice is ~8% of customers — small enough to
    # broadcast at any corpus sf this engine targets (the slice grows
    # with the CUSTOMER table, not the 100 TB fact tables; size-gate
    # with a left_semi join as in q_local_supplier_volume if a
    # deployment's dimension outgrows the object store)
    c_keys = np.sort(cdf["c_custkey"].to_numpy(np.int64))
    c_nat = cdf.set_index("c_custkey")["c_nationkey"].astype(
        np.int64).sort_index().to_numpy()
    cref = ray.put((c_keys, c_nat))

    def ord_map(df):
        ck, cn = sim.resolve_broadcast(cref, key="ntv-cust")
        ok = df["o_custkey"].to_numpy(np.int64)
        idx = np.searchsorted(ck, ok)
        idx_c = np.minimum(idx, len(ck) - 1) if len(ck) else idx
        m = len(ck) > 0
        hit = (ck[idx_c] == ok) if m else np.zeros(len(ok), bool)
        return pd.DataFrame(
            {"o_orderkey": df["o_orderkey"].to_numpy(np.int64)[hit],
             "cust_nat": cn[idx_c][hit]})

    def li_map(df):
        sk, sn = sim.resolve_broadcast(sref, key="ntv-supp")
        lk = df["l_suppkey"].to_numpy(np.int64)
        idx = np.searchsorted(sk, lk)
        idx_c = np.minimum(idx, len(sk) - 1) if len(sk) else idx
        hit = (sk[idx_c] == lk) if len(sk) else np.zeros(len(lk), bool)
        rev = np.floor(
            df["l_extendedprice"].to_numpy(np.float64)
            * (1.0 - df["l_discount"].to_numpy(np.float64))
            * 1_000_000 + 0.5).astype(np.int64)
        yr = df["l_shipdate"].dt.year.to_numpy(np.int64)
        return pd.DataFrame(
            {"l_orderkey": df["l_orderkey"].to_numpy(np.int64)[hit],
             "supp_nat": sn[idx_c][hit],
             "ship_year": yr[hit], "rev_micro": rev[hit]})

    ofil = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]
                 ).map_batches(ord_map, batch_format="pandas")
    lfil = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
         "l_shipdate"]).map_batches(li_map, batch_format="pandas")

    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_part = max(8, min(dd.derive_buckets(
        _read(sf_dir, "orders", ["o_orderkey"]).count()), cpus // 2))
    j = lfil.join(
        ofil, "inner", n_part,
        on=("l_orderkey",), right_on=("o_orderkey",),
        aggregator_ray_remote_args=_join_remote_args(n_part),
    )

    def partial(df):
        df = df[df["supp_nat"] != df["cust_nat"]]
        return df.groupby(["supp_nat", "cust_nat", "ship_year"],
                          as_index=False).agg(
            revenue_micro=("rev_micro", "sum"))

    small = (j.map_batches(partial, batch_format="pandas")
             .groupby(["supp_nat", "cust_nat", "ship_year"])
             .aggregate(Sum("revenue_micro", alias_name="revenue_micro"))
             .to_pandas())  # ≤ 2 × ship-years rows
    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_name"]).to_pandas()
    nm = nat.set_index("n_nationkey")["n_name"]
    out = pd.DataFrame({
        "supp_nation": small["supp_nat"].map(nm).astype(str),
        "cust_nation": small["cust_nat"].map(nm).astype(str),
        "ship_year": small["ship_year"].astype("int64"),
        "revenue_micro": small["revenue_micro"].astype("int64")})
    return out.sort_values(
        ["supp_nation", "cust_nation", "ship_year"],
        kind="mergesort").reset_index(drop=True)


# --- T144: market share of one nation in a region (TPC-H Q8 shape) ---

SHARE_REGION = 2        # ASIA
SHARE_NATION = 7        # NATION_7 (in region 2)
SHARE_PTYPE = "PROMO"


def q_market_share(sf_dir: str):
    """TPC-H Q8 shape — NATION_7's share of PROMO-part revenue sold
    to ASIA-region customers, per order year. Three dimension prunes
    run map-side off broadcasts (part keys of the chosen type;
    in-region customer keys, size-gated; supplier→nationkey), so the
    only exchange is one orderkey join of two heavily-pruned
    projections; the result space is ≤ order-years, reduced with
    per-batch partials. share_ppm is exact integer math
    (HUGEINT-mirrorable: nation·10⁶ // total)."""
    import pandas as pd

    nat = _read(sf_dir, "nation",
                ["n_nationkey", "n_regionkey"]).to_pandas()
    region_nats = set(nat.loc[nat["n_regionkey"] == SHARE_REGION,
                              "n_nationkey"].astype(int))

    pdf = _read(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        lambda b: b.loc[b["p_type"] == SHARE_PTYPE, ["p_partkey"]],
        batch_format="pandas").to_pandas()
    pref = ray.put(np.sort(pdf["p_partkey"].to_numpy(np.int64)))

    sdf = _read(sf_dir, "supplier",
                ["s_suppkey", "s_nationkey"]).to_pandas()
    s_keys = np.sort(sdf["s_suppkey"].to_numpy(np.int64))
    s_nat = sdf.set_index("s_suppkey")["s_nationkey"].astype(
        np.int64).sort_index().to_numpy()
    sref = ray.put((s_keys, s_nat))

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    rn = np.array(sorted(region_nats), np.int64)
    cfil = cust.map_batches(
        lambda b: b.loc[b["c_nationkey"].isin(rn), ["c_custkey"]],
        batch_format="pandas")
    if cust.count() <= CUST_BROADCAST_MAX:
        cref = ray.put(np.sort(
            cfil.to_pandas()["c_custkey"].to_numpy(np.int64)))
    else:
        cref = None

    def ord_map(df):
        yr = df["o_orderdate"].dt.year.to_numpy(np.int64)
        out = pd.DataFrame(
            {"o_orderkey": df["o_orderkey"].to_numpy(np.int64),
             "o_custkey": df["o_custkey"].to_numpy(np.int64),
             "o_year": yr})
        if cref is not None:
            ck = sim.resolve_broadcast(cref, key="ms-cust")
            hit = np.isin(out["o_custkey"].to_numpy(np.int64), ck,
                          assume_unique=False)
            return out.loc[hit, ["o_orderkey", "o_year"]]
        return out

    ofil = _read(sf_dir, "orders",
                 ["o_orderkey", "o_custkey", "o_orderdate"]
                 ).map_batches(ord_map, batch_format="pandas")
    if cref is None:
        n_c = 16
        ofil = ofil.join(
            cfil, "left_semi", n_c,
            on=("o_custkey",), right_on=("c_custkey",),
            aggregator_ray_remote_args=_join_remote_args(n_c),
        ).select_columns(["o_orderkey", "o_year"])

    def li_map(df):
        pk = sim.resolve_broadcast(pref, key="ms-part")
        sk, sn = sim.resolve_broadcast(sref, key="ms-supp")
        lp = df["l_partkey"].to_numpy(np.int64)
        hit = np.isin(lp, pk)
        df = df[hit]
        ls = df["l_suppkey"].to_numpy(np.int64)
        idx = np.searchsorted(sk, ls)
        idx_c = np.minimum(idx, len(sk) - 1) if len(sk) else idx
        is_nat = ((sk[idx_c] == ls) & (sn[idx_c] == SHARE_NATION)
                  if len(sk) else np.zeros(len(ls), bool))
        rev = np.floor(
            df["l_extendedprice"].to_numpy(np.float64)
            * (1.0 - df["l_discount"].to_numpy(np.float64))
            * 1_000_000 + 0.5).astype(np.int64)
        return pd.DataFrame(
            {"l_orderkey": df["l_orderkey"].to_numpy(np.int64),
             "rev_micro": rev,
             "nat_micro": np.where(is_nat, rev, 0)})

    lfil = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
         "l_discount"]).map_batches(li_map, batch_format="pandas")

    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_part = max(8, min(dd.derive_buckets(
        _read(sf_dir, "orders", ["o_orderkey"]).count()), cpus // 2))
    j = lfil.join(
        ofil, "inner", n_part,
        on=("l_orderkey",), right_on=("o_orderkey",),
        aggregator_ray_remote_args=_join_remote_args(n_part),
    )

    def partial(df):
        return df.groupby("o_year", as_index=False).agg(
            total_micro=("rev_micro", "sum"),
            nation_micro=("nat_micro", "sum"))

    small = (j.map_batches(partial, batch_format="pandas")
             .groupby("o_year")
             .aggregate(Sum("total_micro", alias_name="total_micro"),
                        Sum("nation_micro", alias_name="nation_micro"))
             .to_pandas())  # ≤ order-years rows
    small = small.sort_values("o_year", kind="mergesort")
    share = (small["nation_micro"].astype(object) * 1_000_000
             // small["total_micro"].astype(object))
    return pd.DataFrame({
        "o_year": small["o_year"].astype("int64"),
        "total_micro": small["total_micro"].astype("int64"),
        "nation_micro": small["nation_micro"].astype("int64"),
        "share_ppm": share.astype("int64")}).reset_index(drop=True)


# --- T145: returned-item revenue top-20 (TPC-H Q10 shape) ------------

RETURNED_LO = "1997-01-01"
RETURNED_HI = "1997-07-01"


def q_returned_items(sf_dir: str):
    """TPC-H Q10 shape — customers who returned the most revenue in a
    six-month order window. Both join inputs prune map-side (orders to
    the window, lineitem to returnflag='R') before ONE orderkey
    exchange; the per-customer reduce is the repo's bucketed idiom
    with a per-bucket PARTIAL top-20 (safe: the key is c_custkey, one
    bucket owns a key entirely), so the final sort sees ≤ 20·buckets
    rows. The 20 winners' names attach via a map-side filtered
    customer read — no customer payload enters any exchange."""
    import pandas as pd
    import pyarrow.compute as pc

    lo = pa.scalar(pd.Timestamp(RETURNED_LO), pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp(RETURNED_HI), pa.timestamp("us"))

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]
                   ).map_batches(
        lambda b: b.filter(
            pc.and_(pc.greater_equal(b.column("o_orderdate"), lo),
                    pc.less(b.column("o_orderdate"), hi))
        ).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow")
    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount",
                "l_returnflag"]).map_batches(
        lambda b: b.filter(
            pc.equal(b.column("l_returnflag"), "R")
        ).select(["l_orderkey", "l_extendedprice", "l_discount"]),
        batch_format="pyarrow")

    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_li = _read(sf_dir, "lineitem", ["l_orderkey"]).count()
    n_part = max(8, min(dd.derive_buckets(n_li), cpus // 2))
    j = li.join(
        orders, "inner", n_part,
        on=("l_orderkey",), right_on=("o_orderkey",),
        aggregator_ray_remote_args=_join_remote_args(n_part),
    )

    nb = dd.derive_buckets(n_li)

    def partial(df):
        rev = np.floor(
            df["l_extendedprice"].to_numpy(np.float64)
            * (1.0 - df["l_discount"].to_numpy(np.float64))
            * 1_000_000 + 0.5).astype(np.int64)
        g = df.assign(rev=rev).groupby("o_custkey", as_index=False).agg(
            revenue_micro=("rev", "sum"))
        g["bucket"] = (g["o_custkey"] % nb).astype("int32")
        return g

    def reduce_topk(g):
        s = g.groupby("o_custkey", as_index=False).agg(
            revenue_micro=("revenue_micro", "sum"))
        return s.sort_values(
            ["revenue_micro", "o_custkey"], ascending=[False, True],
            kind="mergesort").head(20)

    top = (j.map_batches(partial, batch_format="pandas")
           .groupby("bucket")
           .map_groups(reduce_topk, batch_format="pandas")
           ).to_pandas().sort_values(
        ["revenue_micro", "o_custkey"], ascending=[False, True],
        kind="mergesort").head(20)

    keys = np.sort(top["o_custkey"].to_numpy(np.int64))
    names = _read(sf_dir, "customer",
                  ["c_custkey", "c_name"]).map_batches(
        lambda b: b[b["c_custkey"].isin(keys)],
        batch_format="pandas").to_pandas()
    out = top.merge(names, left_on="o_custkey", right_on="c_custkey")
    return (out[["c_custkey", "c_name", "revenue_micro"]]
            .astype({"c_custkey": "int64", "revenue_micro": "int64"})
            .sort_values(["revenue_micro", "c_custkey"],
                         ascending=[False, True], kind="mergesort")
            .reset_index(drop=True))


# --- T146: customer order-count distribution (TPC-H Q13 shape) -------


def q_customer_order_dist(sf_dir: str):
    """TPC-H Q13 shape — the distribution of orders-per-customer,
    INCLUDING zero-order customers (the left-outer leg). No join at
    all: per-batch orders partials → custkey-hash bucketed exact
    per-customer counts → per-bucket histogram partials → one tiny
    fold, so the exchange carries (custkey, n) partials and then
    ≤ |distinct counts| rows. The zero bucket is arithmetic —
    |customer| − |custkeys seen in orders| — two footer/metadata-cheap
    scans, no outer-join shuffle. Exchange volume is O(distinct
    custkeys), never O(orders)."""
    import pandas as pd

    n_cust = _read(sf_dir, "customer", ["c_custkey"]).count()
    orders = _read(sf_dir, "orders", ["o_custkey"])
    nb = dd.derive_buckets(orders.count())

    def partial(df):
        g = df.groupby("o_custkey", as_index=False).agg(
            n=("o_custkey", "size"))
        g["bucket"] = (g["o_custkey"] % nb).astype("int32")
        return g

    def hist_bucket(g):
        s = g.groupby("o_custkey", as_index=False).agg(n=("n", "sum"))
        h = s.groupby("n", as_index=False).agg(
            n_customers=("o_custkey", "size"))
        return h.astype({"n": "int64", "n_customers": "int64"})

    parts = (orders.map_batches(partial, batch_format="pandas")
             .groupby("bucket")
             .map_groups(hist_bucket, batch_format="pandas")
             ).to_pandas()
    hist = parts.groupby("n", as_index=False).agg(
        n_customers=("n_customers", "sum"))
    # zero-order customers arithmetically: every customer counted in
    # hist has ≥1 order, so the histogram total IS |with-orders|
    n_zero = int(n_cust) - int(hist["n_customers"].sum())
    if n_zero > 0:
        hist = pd.concat(
            [pd.DataFrame({"n": [0], "n_customers": [n_zero]}), hist],
            ignore_index=True)
    return (hist.rename(columns={"n": "n_orders"})
            .astype({"n_orders": "int64", "n_customers": "int64"})
            .sort_values("n_orders", kind="mergesort")
            .reset_index(drop=True))


# --- T147: disjunctive bracket revenue (TPC-H Q19 shape) -------------

BRACKETS = (
    # (bracket_id, p_brand, size_lo, size_hi, qty_lo, qty_hi)
    (1, "Brand#7", 1, 10, 1, 15),
    (2, "Brand#12", 1, 20, 10, 25),
    (3, "Brand#23", 1, 30, 20, 35),
)


def q_bracket_revenue(sf_dir: str):
    """TPC-H Q19 shape — revenue under a DISJUNCTION of brand/size/
    quantity brackets, evaluated entirely map-side: the part
    dimension's (brand_id, size) broadcasts once as three sorted
    arrays, every lineitem batch resolves its bracket membership with
    vectorized searchsorted + boolean masks, and only (bracket,
    n_items, revenue) per-batch partials leave the scan — a
    zero-exchange aggregation no matter the corpus size. A row whose
    part matches several brackets counts once per matching bracket
    (the SQL mirror is one scan per bracket, UNION ALL)."""
    import pandas as pd

    pdf = _read(sf_dir, "part",
                ["p_partkey", "p_brand", "p_size"]).to_pandas()
    order = np.argsort(pdf["p_partkey"].to_numpy(np.int64))
    brands = sorted({b for _, b, *_ in BRACKETS})
    bmap = {b: i for i, b in enumerate(brands)}
    pref = ray.put((
        pdf["p_partkey"].to_numpy(np.int64)[order],
        pdf["p_brand"].map(bmap).fillna(-1).astype(np.int64)
        .to_numpy()[order],
        pdf["p_size"].to_numpy(np.int64)[order]))

    def partial(df):
        pk, pb, psz = sim.resolve_broadcast(pref, key="bracket-part")
        lp = df["l_partkey"].to_numpy(np.int64)
        idx = np.searchsorted(pk, lp)
        idx_c = np.minimum(idx, len(pk) - 1)
        hit = pk[idx_c] == lp
        qty = df["l_quantity"].to_numpy(np.float64)
        rev = np.floor(
            df["l_extendedprice"].to_numpy(np.float64)
            * (1.0 - df["l_discount"].to_numpy(np.float64))
            * 1_000_000 + 0.5).astype(np.int64)
        rows = []
        for bid, brand, slo, shi, qlo, qhi in BRACKETS:
            m = (hit & (pb[idx_c] == bmap[brand])
                 & (psz[idx_c] >= slo) & (psz[idx_c] <= shi)
                 & (qty >= qlo) & (qty <= qhi))
            rows.append((bid, int(m.sum()), int(rev[m].sum())))
        return pd.DataFrame(rows, columns=[
            "bracket", "n_items", "revenue_micro"])

    small = (_read(sf_dir, "lineitem",
                   ["l_partkey", "l_quantity", "l_extendedprice",
                    "l_discount"])
             .map_batches(partial, batch_format="pandas")
             .groupby("bracket")
             .aggregate(Sum("n_items", alias_name="n_items"),
                        Sum("revenue_micro", alias_name="revenue_micro"))
             .to_pandas())  # ≤ 3 rows
    return (small.astype({"bracket": "int64", "n_items": "int64",
                          "revenue_micro": "int64"})
            .sort_values("bracket", kind="mergesort")
            .reset_index(drop=True))


# --- T148: incremental dedup of a new batch against a corpus ---------


def q_incremental_dedup(sf_dir: str):
    """INCREMENTAL exact dedup — the production shape of T1: a NEW
    document batch (here the deterministic doc_id%3==2 slice) dedups
    against an ALREADY-INGESTED corpus (the rest) without
    re-materializing the corpus: both sides reduce to (md5, side)
    rows, hash-bucketed on the fingerprint so each bucket decides its
    keys locally — keep the new side's min-doc_id representative only
    when the corpus side never saw the hash. The exchange carries
    hashes, not text; at 100 TB the corpus side would read a stored
    fingerprint MANIFEST instead of rescanning text (same plan from
    the bucket stage on). Reference class: §2.7 idempotent-skip
    (existence probe before convert) lifted to content identity."""
    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    nb = dd.derive_buckets(ds.count())

    def keyed(b: pa.Table) -> pa.Table:
        t = tx.md5_batch(b).select(["doc_id", "text_md5"])
        t = t.append_column(
            "is_new", pa.array(
                (t.column("doc_id").to_numpy() % 3 == 2), pa.bool_()))
        return _crc_bucket_col(t, "text_md5", nb)

    def reduce_bucket(g):
        agg = g.assign(
            new_min=np.where(g["is_new"], g["doc_id"], np.iinfo(
                np.int64).max),
            n_old=(~g["is_new"]).astype(np.int64),
        ).groupby("text_md5", as_index=False).agg(
            doc_id=("new_min", "min"), n_old=("n_old", "sum"))
        keep = agg[(agg["n_old"] == 0)
                   & (agg["doc_id"] != np.iinfo(np.int64).max)]
        return keep[["doc_id", "text_md5"]].astype({"doc_id": "int64"})

    return (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


# --- T149: per-document token Shannon entropy ------------------------


def q_token_entropy(sf_dir: str):
    """Per-document token Shannon entropy in EXACT integer micro-bits:
    each distinct token contributes floor(n·log2(tot/n)·10⁶) — the
    per-term floor makes the sum order-independent and byte-mirrors
    DuckDB's log2 (both bind the platform libm; parity swept over the
    full (n, tot) domain in tests) — then one integer division by tot.
    Pure map-side: one documents scan, zero exchange; the only
    per-row Python is the tokenizer itself (shared textstats.tokens,
    the RE2-∩-Python whitespace contract every token oracle uses).
    Quality signal: low entropy ⇒ repetitive/templated text — the
    fourth member of the T9/T31/T46 quality family."""
    from collections import Counter

    from ..functions import textstats as ts

    def per_batch(b: pa.Table) -> pa.Table:
        texts = b.column("text").to_pylist()
        n_tok = np.empty(len(texts), np.int64)
        ent = np.empty(len(texts), np.int64)
        for i, t in enumerate(texts):
            c = Counter(ts.tokens(t))
            tot = sum(c.values())
            n_tok[i] = tot
            if tot == 0:
                ent[i] = 0
                continue
            n = np.fromiter(c.values(), np.float64, len(c))
            terms = np.floor(n * np.log2(tot / n) * 1_000_000)
            ent[i] = int(terms.sum(dtype=np.int64)) // tot
        return pa.Table.from_pydict({
            "doc_id": b.column("doc_id"),
            "n_tokens": pa.array(n_tok, pa.int64()),
            "entropy_micro": pa.array(ent, pa.int64())})

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        per_batch, batch_format="pyarrow")


# --- T150: greedy k-center coreset (farthest-point sampling) ---------

KCENTER_K = 8


def _list_mat(col) -> "np.ndarray":
    """list / fixed_size_list column → (n, d) matrix (zero-copy for
    fixed-size int64 lists)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_fixed_size_list(col.type):
        d = col.type.list_size
        return col.values.to_numpy(zero_copy_only=False).reshape(len(col), d)
    return np.stack(col.to_numpy(zero_copy_only=False))


def _emb_micro_mat(col) -> "np.ndarray":
    """embedding list<float> column → (n, d) int64 micro matrix via
    floor(float64(x)·10⁶) — the exact-integer embedding idiom shared
    with label_centroids / embedding_outliers and their oracles."""
    return np.floor(
        _list_mat(col).astype(np.float64) * 1_000_000).astype(np.int64)


def q_kcenter_coreset(sf_dir: str):
    """GREEDY K-CENTER coreset selection (Gonzalez farthest-point
    sampling — the classic 2-approx data-selection / diversity-
    sampling primitive; Sener & Savarese 2018 use exactly this for
    active-learning coresets). Deterministic and exact-integer, so it
    carries a full chained-CTE DuckDB oracle despite being iterative:
    seed = min vec_id, then k−1 rounds of argmax-of-min-distance
    (micro² ints, ties to the smallest vec_id).

    Shape per round (same skeleton as kmeans_fit): broadcast the
    selected (j, d) int64 center matrix → map_batches emits ONE
    candidate row per block (the block's farthest point + its vector)
    → driver folds n_blocks tiny rows. Vectors never shuffle; the
    micro-quantized projection is materialized once up front (an
    iterative op re-reads its input k−1 times — the kmeans_fit
    precedent). At 100 TB you would FPS over a uniform sample and
    assign the remainder map-side; the per-round shape is unchanged."""
    import pandas as pd

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

    def quant(b: pa.Table) -> pa.Table:
        q = _emb_micro_mat(b.column("embedding"))
        flat = pa.array(q.ravel(), pa.int64())
        return pa.Table.from_pydict({
            "vec_id": b.column("vec_id"),
            "q": pa.FixedSizeListArray.from_arrays(flat, q.shape[1])})

    qds = ds.map_batches(quant, batch_format="pyarrow").materialize()

    def _rows(tbl_ds):
        out = []
        for r in tbl_ds.take_all():
            out.append((int(r["vec_id"]), np.asarray(r["q"], np.int64)))
        return out

    def seed_partial(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_numpy()
        i = int(np.argmin(ids))
        return b.take(pa.array([i]))

    cand = _rows(qds.map_batches(seed_partial, batch_format="pyarrow"))
    sel_id, sel_vec = min(cand, key=lambda t: t[0])
    sel = [(0, sel_id, 0)]  # (rnk, vec_id, dist_micro2)
    cent = sel_vec[None, :]

    for j in range(1, KCENTER_K):
        ref = ray.put(cent)

        def far_partial(b: pa.Table, _ref=ref) -> pa.Table:
            C = sim.resolve_broadcast(_ref, key=f"kcenter-{j}")
            X = _list_mat(b.column("q")).astype(np.int64, copy=False)
            ids = b.column("vec_id").to_numpy().astype(np.int64)
            xx = np.einsum("ij,ij->i", X, X)
            cc = np.einsum("ij,ij->i", C, C)
            mind = (xx[:, None] - 2 * (X @ C.T) + cc[None, :]).min(axis=1)
            i = int(np.lexsort((ids, -mind))[0])  # max dist, tie min id
            return pa.Table.from_pydict({
                "vec_id": pa.array([ids[i]], pa.int64()),
                "dist": pa.array([int(mind[i])], pa.int64()),
                "q": pa.FixedSizeListArray.from_arrays(
                    pa.array(X[i], pa.int64()), X.shape[1])})

        best_id, best_d, best_vec = None, -1, None
        for r in qds.map_batches(
                far_partial, batch_format="pyarrow").take_all():
            d_, id_ = int(r["dist"]), int(r["vec_id"])
            if d_ > best_d or (d_ == best_d and id_ < best_id):
                best_id, best_d = id_, d_
                best_vec = np.asarray(r["q"], np.int64)
        sel.append((j, best_id, best_d))
        cent = np.vstack([cent, best_vec[None, :]])

    return pd.DataFrame(
        {"rnk": np.array([s[0] for s in sel], np.int64),
         "vec_id": np.array([s[1] for s in sel], np.int64),
         "dist_micro2": np.array([s[2] for s in sel], np.int64)})


# --- T151: per-vector scalar quantization (uint8 min-max codes) ------


def q_embedding_quantize(sf_dir: str):
    """SCALAR QUANTIZATION of embeddings to 8-bit codes (the standard
    4×-compression storage/ANN trick — FAISS SQ8 / product-quant
    precursors): per-vector min-max affine map to 0..255 in EXACT
    integers — code = ((x_micro − min_micro)·255) // span — so the
    codes, their sum and their energy byte-match the DuckDB oracle.
    Pure map-side: one embeddings scan, zero exchange. Emits the
    per-vector dequant params (min/max micros) plus two code
    checksums (sum, sum of squares) rather than 64 code columns."""

    def per_batch(b: pa.Table) -> pa.Table:
        m = _emb_micro_mat(b.column("embedding"))
        mn = m.min(axis=1)
        mx = m.max(axis=1)
        span = mx - mn
        safe = np.where(span == 0, 1, span)
        codes = ((m - mn[:, None]) * 255) // safe[:, None]
        codes[span == 0] = 0
        return pa.Table.from_pydict({
            "vec_id": b.column("vec_id"),
            "min_micro": pa.array(mn, pa.int64()),
            "max_micro": pa.array(mx, pa.int64()),
            "code_sum": pa.array(codes.sum(axis=1), pa.int64()),
            "code_sq_sum": pa.array(
                (codes * codes).sum(axis=1), pa.int64())})

    return _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
        per_batch, batch_format="pyarrow")


# --- T152–T157: the remaining TPC-H join archetypes -------------------
# (Q2 argmin-join-back, Q4 EXISTS semi-join, Q17 correlated per-key
# average, Q15 argmax-vs-global-max, Q22 anti-join + global scalar,
# Q16 count-distinct with an exclusion list — adapted to the sf schema,
# which carries no partsupp/shipmode/commitdate columns.)


def _sorted_lookup(keys: "np.ndarray", probe: "np.ndarray"):
    """Membership probe against a SORTED broadcast key array: returns
    (clamped insertion index, hit mask). The shared kernel behind
    every broadcast-dimension prune (T89/T143/T144 idiom)."""
    idx = np.searchsorted(keys, probe)
    if len(keys) == 0:
        return idx, np.zeros(len(probe), bool)
    idx_c = np.minimum(idx, len(keys) - 1)
    return idx_c, keys[idx_c] == probe


CHEAP_PSIZE = 15


def q_cheapest_supplier(sf_dir: str):
    """TPC-H Q2 shape — per-part ARGMIN with winner-attribute
    join-back: for every size-15 part, the supplier offering the
    lowest observed lineitem price (partsupp is absent from the sf
    schema, so observed sale price stands in for ps_supplycost; the
    plan shape is unchanged). The argmin is carried as ONE int64
    (price_cents·2²⁰ + suppkey — suppkeys are dimension-sized, far
    below 2²⁰) so min() IS the lexicographic (price, suppkey)
    tie-break everywhere: per-batch partial min → partkey-bucketed
    reduce. Only (partkey, packed) rows shuffle; part and supplier
    attributes attach from broadcasts. Reference class: §2.6 best-per-
    group picks (document_service best-result selection)."""
    import pandas as pd

    pdf = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]
                ).to_pandas()
    pdf = pdf[pdf["p_size"] == CHEAP_PSIZE]
    p_keys = np.sort(pdf["p_partkey"].to_numpy(np.int64))
    p_brand = pdf.set_index("p_partkey")["p_brand"].sort_index(
    ).to_numpy(object)
    pref = ray.put(p_keys)
    nb = 32

    def li_partial(df):
        pk = sim.resolve_broadcast(pref, key="cheap-parts")
        lk = df["l_partkey"].to_numpy(np.int64)
        _, hit = _sorted_lookup(pk, lk)
        pc = np.floor(df["l_extendedprice"].to_numpy(np.float64)
                      * 100 + 0.5).astype(np.int64)[hit]
        packed = pc * (1 << 20) + df["l_suppkey"].to_numpy(
            np.int64)[hit]
        out = pd.DataFrame({"p_partkey": lk[hit], "packed": packed})
        out = out.groupby("p_partkey", as_index=False).agg(
            packed=("packed", "min"))
        out["bucket"] = (out["p_partkey"] % nb).astype("int32")
        return out

    def reduce_bucket(g):
        m = g.groupby("p_partkey", as_index=False).agg(
            packed=("packed", "min"))
        return m

    best = (_read(sf_dir, "lineitem",
                  ["l_partkey", "l_suppkey", "l_extendedprice"])
            .map_batches(li_partial, batch_format="pandas")
            .groupby("bucket")
            .map_groups(reduce_bucket, batch_format="pandas")
            .to_pandas())  # ≤ |size-15 parts| rows — dimension-sized
    sdf = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    sname = sdf.set_index("s_suppkey")["s_name"]
    pk = best["p_partkey"].to_numpy(np.int64)
    packed = best["packed"].to_numpy(np.int64)
    sk = packed & ((1 << 20) - 1)
    bidx = np.searchsorted(p_keys, pk)
    out = pd.DataFrame({
        "p_partkey": pk,
        "p_brand": p_brand[bidx].astype(str),
        "s_suppkey": sk,
        "s_name": pd.Series(sk).map(sname).astype(str).to_numpy(),
        "price_cents": packed >> 20})
    return out.sort_values("p_partkey", kind="mergesort").reset_index(
        drop=True)


RET_WIN = (np.datetime64("1996-07-01"), np.datetime64("1996-10-01"))


def q_returned_priority_counts(sf_dir: str):
    """TPC-H Q4 shape — orders in a quarter with EXISTS ≥1 returned
    lineitem, counted per order priority (the sf schema has no
    commitdate/receiptdate, so l_returnflag='R' is the EXISTS
    predicate; the semi-join plan is identical). Both sides reduce to
    keyed rows BEFORE the one orderkey-hash exchange — orders to
    (okey, priority), lineitem to per-batch-distinct (okey) marks —
    each bucket decides membership locally with a sorted-array probe,
    emits pre-counted (priority, n) partials, and a ≤5-key native
    aggregate folds them. The incremental_dedup two-sided-bucket plan
    applied to a semi-join. Reference class: §2.4 resume anti-join,
    inverted to EXISTS."""
    import pandas as pd

    ods = _read(sf_dir, "orders",
                ["o_orderkey", "o_orderdate", "o_orderpriority"])
    nb = dd.derive_buckets(ods.count())

    def ord_side(df):
        d = df["o_orderdate"].to_numpy("datetime64[D]")
        m = (d >= RET_WIN[0]) & (d < RET_WIN[1])
        ok = df["o_orderkey"].to_numpy(np.int64)[m]
        return pd.DataFrame({
            "okey": ok,
            # explicit string dtype: an empty object column would
            # convert to Arrow null and break the union's schema
            "priority": pd.array(
                df["o_orderpriority"].to_numpy(object)[m],
                dtype="string"),
            "is_order": np.ones(len(ok), bool),
            "bucket": (ok % nb).astype("int32")})

    def li_side(df):
        ok = np.unique(df["l_orderkey"].to_numpy(np.int64)[
            df["l_returnflag"].to_numpy(object) == "R"])
        return pd.DataFrame({
            "okey": ok,
            "priority": pd.array(np.full(len(ok), "", object),
                                 dtype="string"),
            "is_order": np.zeros(len(ok), bool),
            "bucket": (ok % nb).astype("int32")})

    o = ods.map_batches(ord_side, batch_format="pandas")
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"]
               ).map_batches(li_side, batch_format="pandas")

    def reduce_bucket(g):
        ret = np.unique(g.loc[~g["is_order"], "okey"].to_numpy(
            np.int64))
        ords = g[g["is_order"]]
        _, hit = _sorted_lookup(ret, ords["okey"].to_numpy(np.int64))
        out = (ords.loc[hit].groupby("priority", as_index=False)
               .agg(n_orders=("okey", "size")))
        return out.astype({"n_orders": "int64"})

    return (
        o.union(li)
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
        .groupby("priority")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
    )


QTY_BRAND = "Brand#23"


def q_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 shape — revenue from SMALL-quantity orders of one
    brand's parts: lineitems with quantity below 20% of their part's
    average. The correlated per-key average is a two-pass broadcast,
    never a self-join: pass 1 folds per-part (Σqty, n) partials on
    the driver (bounded by the brand's part count — dimension-sized),
    pass 2 re-scans map-side keeping rows with 5·qty·n < Σqty (the
    avg compare in EXACT integers — quantities are integral in this
    schema) and emits per-batch revenue partials. Zero exchange.
    Reference class: §2.5 two-pass statistics (corpus stats before
    filter decisions)."""
    import pandas as pd

    pdf = _read(sf_dir, "part", ["p_partkey", "p_brand"]).to_pandas()
    p_keys = np.sort(pdf.loc[pdf["p_brand"] == QTY_BRAND,
                             "p_partkey"].to_numpy(np.int64))
    pref = ray.put(p_keys)

    def pass1(df):
        pk = sim.resolve_broadcast(pref, key="smallqty-parts")
        lk = df["l_partkey"].to_numpy(np.int64)
        _, hit = _sorted_lookup(pk, lk)
        qi = np.floor(df["l_quantity"].to_numpy(np.float64)
                      + 0.5).astype(np.int64)[hit]
        out = pd.DataFrame({"p": lk[hit], "sq": qi, "n": 1})
        return out.groupby("p", as_index=False).agg(
            sq=("sq", "sum"), n=("n", "sum"))

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_quantity", "l_extendedprice"])
    parts = li.map_batches(pass1, batch_format="pandas").to_pandas()
    stats = parts.groupby("p", as_index=False).agg(
        sq=("sq", "sum"), n=("n", "sum"))
    st_keys = stats["p"].to_numpy(np.int64)
    order = np.argsort(st_keys)
    sref = ray.put((st_keys[order],
                    stats["sq"].to_numpy(np.int64)[order],
                    stats["n"].to_numpy(np.int64)[order]))

    def pass2(df):
        ks, sq, n = sim.resolve_broadcast(sref, key="smallqty-stats")
        lk = df["l_partkey"].to_numpy(np.int64)
        idx, hit = _sorted_lookup(ks, lk)
        qi = np.floor(df["l_quantity"].to_numpy(np.float64)
                      + 0.5).astype(np.int64)
        small = hit & (5 * qi * n[idx] < sq[idx])
        pc = np.floor(df["l_extendedprice"].to_numpy(np.float64)
                      * 100 + 0.5).astype(np.int64)
        return pd.DataFrame({
            "pc": [int(pc[small].sum())],
            "n": [int(small.sum())]})

    tot = li.map_batches(pass2, batch_format="pandas").to_pandas()
    return pd.DataFrame({
        "avg_yearly_cents": np.array(
            [tot["pc"].sum() // 7], np.int64),
        "n_small_lineitems": np.array([tot["n"].sum()], np.int64)})


TOPSUPP_WIN = (np.datetime64("1996-01-01"), np.datetime64("1996-04-01"))


def q_top_suppliers(sf_dir: str):
    """TPC-H Q15 shape — ALL suppliers whose quarterly revenue equals
    the global maximum (ties kept, the point of Q15's view): per-batch
    (suppkey, rev) partials → suppkey-bucketed reduce to per-supplier
    totals (dimension-sized, materialized once because it feeds both
    the max and the filter), driver takes the max off per-block max
    partials, survivors filter map-side and dress with broadcast
    supplier names. Reference class: §2.6 global-best selection."""
    import pandas as pd

    nb = 32

    def li_partial(df):
        d = df["l_shipdate"].to_numpy("datetime64[D]")
        m = (d >= TOPSUPP_WIN[0]) & (d < TOPSUPP_WIN[1])
        rev = np.floor(
            df["l_extendedprice"].to_numpy(np.float64)[m]
            * (1.0 - df["l_discount"].to_numpy(np.float64)[m])
            * 1_000_000 + 0.5).astype(np.int64)
        out = pd.DataFrame(
            {"s": df["l_suppkey"].to_numpy(np.int64)[m], "r": rev})
        out = out.groupby("s", as_index=False).agg(r=("r", "sum"))
        out["bucket"] = (out["s"] % nb).astype("int32")
        return out

    totals = (_read(sf_dir, "lineitem",
                    ["l_suppkey", "l_extendedprice", "l_discount",
                     "l_shipdate"])
              .map_batches(li_partial, batch_format="pandas")
              .groupby("bucket")
              .map_groups(lambda g: g.groupby("s", as_index=False)
                          .agg(r=("r", "sum")),
                          batch_format="pandas")
              ).materialize()  # per-supplier totals — dimension-sized
    def block_max(df):
        return pd.DataFrame({"m": [int(df["r"].max()) if len(df)
                                   else np.iinfo(np.int64).min]})

    mx = max(r["m"] for r in totals.map_batches(
        block_max, batch_format="pandas").take_all())
    win = totals.map_batches(
        lambda df, _m=mx: df[df["r"] == _m],
        batch_format="pandas").to_pandas()
    sdf = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).to_pandas()
    sname = sdf.set_index("s_suppkey")["s_name"]
    out = pd.DataFrame({
        "s_suppkey": win["s"].astype("int64"),
        "s_name": win["s"].map(sname).astype(str),
        "total_rev_micro": win["r"].astype("int64")})
    return out.sort_values("s_suppkey", kind="mergesort").reset_index(
        drop=True)


RICH_SEGMENTS = ("BUILDING", "MACHINERY")
RICH_CUTOFF = np.datetime64("2000-07-01")


def q_idle_rich_customers(sf_dir: str):
    """TPC-H Q22 shape — customers in two market segments with an
    above-average positive balance and NO orders since a cutoff (the
    anti-join + global-scalar archetype; segments stand in for Q22's
    phone prefixes, and recency-idleness for its no-orders predicate
    because this corpus gives essentially every customer at least one
    order). The average is one cheap (Σ, n) pre-pass over customer
    folded on the driver; the strict compare bal·n > Σ stays in exact
    integer cents. Candidates and per-batch-distinct RECENT order
    custkeys (date-pruned map-side) then meet in ONE custkey-hash
    exchange where each bucket anti-joins locally and emits
    pre-counted (segment, n, Σbal) partials as typed Arrow blocks.
    Reference class: §2.4 resume anti-join (process only what has no
    result yet) over a derived predicate."""
    import pandas as pd

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_acctbal", "c_mktsegment"])
    nb = dd.derive_buckets(cust.count())

    def scal(df):
        seg = df["c_mktsegment"].to_numpy(object)
        bc = np.floor(df["c_acctbal"].to_numpy(np.float64)
                      * 100 + 0.5).astype(np.int64)
        m = np.isin(seg, RICH_SEGMENTS) & (bc > 0)
        return pd.DataFrame({"s": [int(bc[m].sum())],
                             "n": [int(m.sum())]})

    sc = cust.map_batches(scal, batch_format="pandas").to_pandas()
    s_tot, n_tot = int(sc["s"].sum()), int(sc["n"].sum())

    def cand(df):
        seg = df["c_mktsegment"].to_numpy(object)
        bc = np.floor(df["c_acctbal"].to_numpy(np.float64)
                      * 100 + 0.5).astype(np.int64)
        m = (np.isin(seg, RICH_SEGMENTS) & (bc > 0)
             & (bc * n_tot > s_tot))
        ck = df["c_custkey"].to_numpy(np.int64)[m]
        return pd.DataFrame({
            "ckey": ck,
            "seg": pd.array(seg[m], dtype="string"),
            "bal": bc[m],
            "is_cust": np.ones(len(ck), bool),
            "bucket": (ck % nb).astype("int32")})

    def ords(df):
        recent = (df["o_orderdate"].to_numpy("datetime64[D]")
                  >= RICH_CUTOFF)
        ck = np.unique(df["o_custkey"].to_numpy(np.int64)[recent])
        return pd.DataFrame({
            "ckey": ck,
            "seg": pd.array(np.full(len(ck), "", object),
                            dtype="string"),
            "bal": np.zeros(len(ck), np.int64),
            "is_cust": np.zeros(len(ck), bool),
            "bucket": (ck % nb).astype("int32")})

    c = cust.map_batches(cand, batch_format="pandas")
    o = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]
              ).map_batches(ords, batch_format="pandas")

    def reduce_bucket(g):
        have = np.unique(g.loc[~g["is_cust"], "ckey"].to_numpy(
            np.int64))
        cands = g[g["is_cust"]]
        _, hit = _sorted_lookup(have, cands["ckey"].to_numpy(np.int64))
        idle = cands.loc[~hit]
        out = idle.groupby("seg", as_index=False).agg(
            n_custs=("ckey", "size"), total_bal_cents=("bal", "sum"))
        # typed Arrow block: a mostly-empty pandas string column would
        # spam Ray's block-size estimator on every empty bucket
        return pa.Table.from_pydict({
            "seg": pa.array(out["seg"].to_numpy(object), pa.string()),
            "n_custs": pa.array(out["n_custs"].to_numpy(np.int64),
                                pa.int64()),
            "total_bal_cents": pa.array(
                out["total_bal_cents"].to_numpy(np.int64),
                pa.int64())})

    return (
        c.union(o)
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
        .groupby("seg")
        .aggregate(Sum("n_custs", alias_name="n_custs"),
                   Sum("total_bal_cents", alias_name="total_bal_cents"))
        .map_batches(lambda df: df.rename(
            columns={"seg": "c_mktsegment"}), batch_format="pandas")
    )


def q_brand_supplier_counts(sf_dir: str):
    """TPC-H Q16 shape — distinct suppliers per (brand, size),
    excluding a supplier blocklist (negative account balance stands
    in for Q16's complaints predicate). Lineitem attaches brand/size
    from a broadcast part projection and drops blocked suppliers
    map-side; the (brand, size, supplier) triple is PACKED into one
    int64 ((brand_id·64 + size) << 20 | suppkey) so per-batch dedup
    is one np.unique and the exchange carries no strings and no
    Python loops. Buckets hash on the (brand, size) HALF of the key,
    so a group's triples all land in one bucket and the per-bucket
    np.unique + count is FINAL — no second aggregate; brand strings
    attach to the ≤|brands|·|sizes| result only. (First draft carried
    string brands + a per-row crc32 loop and finished with a native
    1250-key aggregate: 15.2 s in-battery at sf0.1, 10.3 s of it the
    native agg — this shape is ~3 s.) Reference class: §2.5 grouped
    distinct tallies."""
    import pandas as pd

    pdf = _read(sf_dir, "part",
                ["p_partkey", "p_brand", "p_size"]).to_pandas()
    order = np.argsort(pdf["p_partkey"].to_numpy(np.int64))
    p_keys = pdf["p_partkey"].to_numpy(np.int64)[order]
    brands = np.sort(pdf["p_brand"].unique())
    p_bid = np.searchsorted(brands,
                            pdf["p_brand"].to_numpy(object)[order])
    p_size = pdf["p_size"].to_numpy(np.int64)[order]
    sdf = _read(sf_dir, "supplier",
                ["s_suppkey", "s_acctbal"]).to_pandas()
    bad = np.sort(sdf.loc[sdf["s_acctbal"] < 0,
                          "s_suppkey"].to_numpy(np.int64))
    ref = ray.put((p_keys, p_bid.astype(np.int64), p_size, bad))
    nb = 64

    def tri(b: pa.Table) -> pa.Table:
        pk, pbid, psz, bd = sim.resolve_broadcast(ref, key="q16-dims")
        lk = b.column("l_partkey").to_numpy().astype(np.int64)
        sk = b.column("l_suppkey").to_numpy().astype(np.int64)
        idx, hit = _sorted_lookup(pk, lk)
        _, isbad = _sorted_lookup(bd, sk)
        keep = hit & ~isbad
        packed = np.unique(
            ((pbid[idx][keep] * 64 + psz[idx][keep]) << 20)
            | sk[keep])
        return pa.Table.from_pydict({
            "packed": pa.array(packed, pa.int64()),
            "bucket": pa.array(((packed >> 20) % nb).astype(np.int32),
                               pa.int32())})

    def reduce_bucket(g):
        bs, cnt = np.unique(
            np.unique(g["packed"].to_numpy(np.int64)) >> 20,
            return_counts=True)
        return pd.DataFrame({"bs": bs,
                             "supplier_cnt": cnt.astype(np.int64)})

    small = (
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
        .map_batches(tri, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
        .to_pandas())  # ≤ |brands|·|sizes| rows — already final
    bs = small["bs"].to_numpy(np.int64)
    out = pd.DataFrame({
        "p_brand": brands[bs // 64].astype(str),
        "p_size": bs % 64,
        "supplier_cnt": small["supplier_cnt"].astype("int64")})
    return out.sort_values(["p_brand", "p_size"],
                           kind="mergesort").reset_index(drop=True)


# --- T158: grouped ordered string aggregation (link lists) -----------


def q_domain_link_agg(sf_dir: str):
    """GROUPED ORDERED STRING AGGREGATION (SQL string_agg — the one
    aggregate family the battery lacked): per source domain, the
    comma-joined ASCENDING list of distinct linked domains plus its
    size and link mass. Concatenation is order-sensitive, so the sort
    happens inside the per-src-hash bucket (a src's edges all land in
    one bucket) — never a global sort. Edges arrive pre-aggregated
    and unique from _link_edges, so the aggregation input is
    dimension-sized (≤ domains²). Reference class: §2.5 grouped
    rollups with a presentation-shaped value."""
    import pandas as pd

    edges = _link_edges(sf_dir)
    nb = 32

    def keyed(b: pa.Table) -> pa.Table:
        return _crc_bucket_col(b, "src_domain", nb)

    def reduce_bucket(g):
        g = g.sort_values(["src_domain", "dst_domain"],
                          kind="mergesort")
        out = g.groupby("src_domain", as_index=False).agg(
            dst_list=("dst_domain", ",".join),
            n_dsts=("dst_domain", "size"),
            total_links=("n_links", "sum"))
        return out.astype({"n_dsts": "int64", "total_links": "int64"})

    return (
        edges.map_batches(keyed, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


# --- T159: grouped geometric mean (exact log2-micro ints) ------------


def q_geo_mean_value(sf_dir: str):
    """Grouped GEOMETRIC MEAN of event values — the multiplicative
    aggregate (rate/ratio averaging) the battery lacked — carried
    entirely in EXACT integer log₂-micros: per row
    floor(log2(value_micro)·10⁶) (order-independent integer sum; the
    libm-log2 byte-parity contract proven for token_entropy), then
    one integer division by n. Rows with value_micro ≤ 0 are excluded
    and counted (none in this corpus; the gate matters on real data).
    Per-batch combiner → ≤|event_type| native aggregate → tiny map.
    The result is the geo-mean's exact log₂ in micros — callers
    exponentiate at presentation time."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(df):
        vm = _micro_int_col(df["value"])
        pos = vm > 0
        lg = np.floor(np.log2(vm[pos].astype(np.float64))
                      * 1_000_000).astype(np.int64)
        out = pd.DataFrame({
            "event_type": df["event_type"].to_numpy(object)[pos],
            "n_pos": 1, "sum_lg": lg})
        g = out.groupby("event_type", as_index=False).agg(
            n_pos=("n_pos", "sum"), sum_lg=("sum_lg", "sum"))
        return g.astype({"n_pos": "int64", "sum_lg": "int64"})

    agg = (ds.map_batches(partial, batch_format="pandas")
           .groupby("event_type")
           .aggregate(Sum("n_pos", alias_name="n_pos"),
                      Sum("sum_lg", alias_name="sum_lg")))

    def final(df):
        return pd.DataFrame({
            "event_type": df["event_type"],
            "n_pos": df["n_pos"].astype("int64"),
            "geo_log2_micro": (df["sum_lg"].to_numpy(np.int64)
                               // df["n_pos"].to_numpy(np.int64))})

    return agg.map_batches(final, batch_format="pandas")


# --- T160: iterative BPE tokenizer training --------------------------

BPE_MERGES = 10


def q_bpe_vocab(sf_dir: str):
    """ITERATIVE BPE TOKENIZER TRAINING (Sennrich, Haddow & Birch
    2016 §3.1 — the full merge LOOP, extending bpe_pair_merge's
    single-step statistic): learn the first 10 merge rules over the
    corpus. The distributed part is ONE word-frequency aggregation
    (token-hash bucketed reduce — the exchange carries (word, n),
    vocab-sized); the merge loop then runs on the driver over that
    dict, exactly like the reference GPT-2/Sennrich trainers, because
    each round's pair counts derive from the vocab-sized dict, not
    the corpus. Deterministic: ties break to the lexicographically
    smallest pair. Iterative string rewriting → no SQL oracle (the
    kmeans/pagerank precedent); correctness is bounded by pytest
    (independent brute-force trainer from the raw parquet + block-
    count invariance through the distributed stage)."""
    import pandas as pd
    from collections import Counter

    from ..functions import textstats as ts

    ds = _read(sf_dir, "documents", ["text"])
    nb = dd.derive_buckets(ds.count())

    def keyed(b: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in b.column("text").to_pylist():
            c.update(ts.tokens(t))
        items = sorted(c.items())
        t = pa.Table.from_pydict({
            "word": pa.array([k for k, _ in items], pa.string()),
            "n": pa.array([v for _, v in items], pa.int64())})
        return _crc_bucket_col(t, "word", nb)

    def reduce_bucket(g):
        out = g.groupby("word", as_index=False).agg(n=("n", "sum"))
        return out.astype({"n": "int64"})

    wf = (ds.map_batches(keyed, batch_format="pyarrow")
          .groupby("bucket")
          .map_groups(reduce_bucket, batch_format="pandas")
          .to_pandas())  # vocab-sized — the GPT-2 trainer's input

    words: dict[tuple, int] = {}
    for w, n in zip(wf["word"], wf["n"]):
        words[tuple(w)] = words.get(tuple(w), 0) + int(n)

    rows = []
    for r in range(BPE_MERGES):
        pc: Counter = Counter()
        for sym, n in words.items():
            for a, b2 in zip(sym, sym[1:]):
                pc[(a, b2)] += n
        if not pc:
            break
        (la, rb), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        rows.append((r, la, rb, la + rb, cnt))
        merged = la + rb
        new: dict[tuple, int] = {}
        for sym, n in words.items():
            out, i = [], 0
            while i < len(sym):
                if (i + 1 < len(sym) and sym[i] == la
                        and sym[i + 1] == rb):
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            k = tuple(out)
            new[k] = new.get(k, 0) + n
        words = new

    return pd.DataFrame(rows, columns=["rnk", "left", "right",
                                       "merged", "pair_count"]).astype(
        {"rnk": "int64", "pair_count": "int64"})


# --- T163: forecast revenue change, TPC-H Q6 shape --------------------

Q6_WIN = (np.datetime64("1996-01-01"), np.datetime64("1997-01-01"))


def q_filtered_revenue(sf_dir: str):
    """TPC-H Q6 shape — the simplest archetype, completing the
    TPC-H sweep (every one of the 22 query shapes expressible on this
    schema is now in the registry): one-year, discount-band,
    small-quantity revenue. Pure map-side per-batch partials in exact
    integers (the discount-band filter on micro units, the revenue
    term floor(price·disc·100 + 0.5) cents — ≤ 7·10⁵/row, overflow-
    safe at any corpus size, identical IEEE double product on both
    sides) → ONE-row fold; zero exchange, the floor for any
    distributed aggregate."""
    import pandas as pd

    def partial(df):
        d = df["l_shipdate"].to_numpy("datetime64[D]")
        dv = df["l_discount"].to_numpy(np.float64)
        disc = np.floor(dv * 1_000_000 + 0.5).astype(np.int64)
        qty = np.floor(df["l_quantity"].to_numpy(np.float64)
                       + 0.5).astype(np.int64)
        m = ((d >= Q6_WIN[0]) & (d < Q6_WIN[1])
             & (disc >= 50_000) & (disc <= 70_000) & (qty < 24))
        rev = np.floor(df["l_extendedprice"].to_numpy(np.float64)[m]
                       * dv[m] * 100 + 0.5).astype(np.int64)
        return pd.DataFrame({"revenue_cents": [int(rev.sum())],
                             "n_items": [int(m.sum())]})

    tot = (_read(sf_dir, "lineitem",
                 ["l_shipdate", "l_discount", "l_quantity",
                  "l_extendedprice"])
           .map_batches(partial, batch_format="pandas").to_pandas())
    return pd.DataFrame({
        "revenue_cents": np.array([tot["revenue_cents"].sum()],
                                  np.int64),
        "n_items": np.array([tot["n_items"].sum()], np.int64)})


# --- T164: group share vs global threshold, TPC-H Q11 shape -----------

# keep parts above 3/2 × the average per-part value — relative to the
# average (not a fixed fraction of the total as TPC-H's 0.0001/SF),
# so selectivity is scale-invariant: 2 / 29 / 252 parts at
# sf0.001/0.01/0.1
Q11_NUM, Q11_DEN = 3, 2


def q_important_parts(sf_dir: str):
    """TPC-H Q11 shape — the HAVING-vs-global-scalar archetype:
    parts whose total lineitem value exceeds 3/2 of the average
    per-part value (partsupp is absent, so lineitem value stands in
    for ps_supplycost·ps_availqty; the plan shape is unchanged).
    One partkey-bucketed reduce builds per-part totals; the global
    (total, n_parts) scalars fold off the SAME materialized result
    (no second scan) and the compare value·n·2 > total·3 runs in
    HUGEINT-safe python ints. Only (partkey, cents) rows shuffle."""
    import pandas as pd

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice"])
    nb = 32

    def partial(df):
        pc = np.floor(df["l_extendedprice"].to_numpy(np.float64)
                      * 100 + 0.5).astype(np.int64)
        out = pd.DataFrame({"p": df["l_partkey"].to_numpy(np.int64),
                            "v": pc})
        g = out.groupby("p", as_index=False).agg(v=("v", "sum"))
        g["bucket"] = (g["p"] % nb).astype("int32")
        return g

    per_part = (li.map_batches(partial, batch_format="pandas")
                .groupby("bucket")
                .map_groups(lambda g: g.groupby("p", as_index=False)
                            .agg(v=("v", "sum")),
                            batch_format="pandas")
                ).materialize()  # per-part totals, dimension-sized
    parts = per_part.map_batches(
        lambda df: pd.DataFrame({"t": [int(df["v"].sum())],
                                 "n": [len(df)]}),
        batch_format="pandas").take_all()
    total = sum(r["t"] for r in parts)
    n_parts = sum(r["n"] for r in parts)

    def keep(df, _tot=total, _n=n_parts):
        m = [int(v) * _n * Q11_DEN > _tot * Q11_NUM
             for v in df["v"].to_numpy(np.int64)]
        out = df.loc[np.asarray(m, bool), ["p", "v"]]
        return out.rename(columns={"p": "p_partkey",
                                   "v": "value_cents"})

    return per_part.map_batches(keep, batch_format="pandas")


# --- T161: hard-negative mining for contrastive training -------------


def q_hard_negatives(sf_dir: str):
    """HARD-NEGATIVE MINING (contrastive/metric-learning data prep —
    the top-k most-similar vectors with a DIFFERENT label per query;
    in-batch-negatives' offline counterpart): the knn_cosine plan
    (broadcast query matrix → per-batch matmul partial top-k → tiny
    per-query reduce) plus a label-exclusion mask in the partial, so
    the corpus still streams once and only k·n_blocks candidate rows
    per query reach the exchange."""
    import pandas as pd
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding", "label"])
    qids, qmat, qlab = [], [], []
    for vid, emb, lab in zip(t.column("vec_id").to_pylist(),
                             t.column("embedding").to_pylist(),
                             t.column("label").to_pylist()):
        if vid < N_KNN_QUERIES:
            qids.append(int(vid))
            qmat.append(emb)
            qlab.append(int(lab))
    order = np.argsort(qids)
    qids = np.asarray(qids, np.int64)[order]
    qlab = np.asarray(qlab, np.int64)[order]
    qmat = sim.normalize(np.asarray(qmat, np.float64)[order])
    ref = ray.put((qids, qlab, qmat))

    def partial(b: pa.Table) -> pa.Table:
        ids, labs, qm = sim.resolve_broadcast(ref, key="hardneg-q")
        vids = b.column("vec_id").to_numpy()
        vlab = b.column("label").to_numpy().astype(np.int64)
        mat = sim.normalize(_list_mat(b.column("embedding"))
                            .astype(np.float64))
        sims = qm @ mat.T
        out_q, out_n, out_s = [], [], []
        for qi in range(len(ids)):
            mask = vlab != labs[qi]
            idx = np.nonzero(mask)[0]
            if idx.size == 0:
                continue
            row = sims[qi]
            pick = idx[np.lexsort((vids[idx], -row[idx]))][:KNN_K]
            out_q.extend([int(ids[qi])] * len(pick))
            out_n.extend(vids[pick].tolist())
            out_s.extend(row[pick].tolist())
        return pa.Table.from_pydict({
            "query_id": pa.array(out_q, pa.int64()),
            "neighbor_id": pa.array(out_n, pa.int64()),
            "sim": pa.array(out_s, pa.float64())})

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=512)
    return partials.groupby("query_id").map_groups(
        lambda g: sim.global_topk(g, KNN_K), batch_format="pandas")


# --- T162: class-balance resampling plan ------------------------------


def q_class_balance_plan(sf_dir: str):
    """CLASS-BALANCE RESAMPLING PLAN (the oversampling table a
    balanced training epoch is built from): per label the vector
    count, the integer repeat factor ceil(max/n), and the post-
    oversampling size. One ≤|labels| native count aggregate; the max
    and the ceil-divisions are driver arithmetic on the label-sized
    result. Exact integers throughout."""
    import pandas as pd

    ds = _read(sf_dir, "embeddings", ["label"])
    c = (ds.groupby("label").aggregate(Count(alias_name="n_vecs"))
         .to_pandas())  # ≤ |labels| rows
    n = c["n_vecs"].to_numpy(np.int64)
    mx = int(n.max())
    rep = (mx + n - 1) // n
    return pd.DataFrame({
        "label": c["label"].to_numpy(np.int64),
        "n_vecs": n,
        "repeat_factor": rep,
        "n_after": n * rep}).sort_values("label").reset_index(
        drop=True)


# --- T165: bigram language-model NLL quality scoring ------------------

# bigram-model broadcast gate (the tfidf/pmi size-gate precedent):
# ≤ this many distinct bigrams → the (bigram → nll) map broadcasts
# once and scoring is map-side; above it, the model stays a Dataset
# and the probe side hash-joins. Env-overridable so the pytest gate
# can pin both paths equal on the same corpus.
LM_BCAST_MAX_BIGRAMS = 2_000_000


def q_bigram_lm_nll(sf_dir: str):
    """Per-document BIGRAM LM scoring — the KenLM-style fluency /
    quality signal a web-scale training pipeline ranks documents by
    (CCNet, Wenzek et al. 2020 use LM perplexity exactly this way):
    each doc's average negative log-likelihood -log2 P(w2|w1) under
    the corpus's OWN MLE bigram model. Carried in exact integer
    log2-micros — per bigram instance
    nll = floor(log2(c(w1·))·10⁶) − floor(log2(c(w1,w2))·10⁶)
    (the token_entropy/geo_mean libm-parity contract), so per-doc
    sums are order-independent and the DuckDB oracle matches
    bit-for-bit. Every doc bigram exists in the model by construction
    (trained on the same corpus), so MLE needs no smoothing here; a
    held-out scorer would add it in the dict-build step only.

    Shape: pass 1 = one corpus scan emitting bigram-count partials →
    crc-bucketed vectorized reduce (model is Heaps-law vocab-sized;
    the exchange carries (w1, w2, c) rows only). Left-context totals
    c(w1·) fold off the SAME materialized counts. Pass 2 re-reads the
    corpus (the oov_rate build-broadcast-score precedent) and scores
    map-side against the broadcast (bigram → nll) map; corpora whose
    bigram domain exceeds the gate instead keep the model distributed
    and attach nll via one composite-key hash join + a doc-bucketed
    reduce. Payload text never enters any exchange."""
    import pandas as pd
    import pyarrow.compute as pc

    from ..functions import textstats as ts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    n_docs = ds.count()
    nb = dd.derive_buckets(n_docs, rows_per_doc=32)

    def bigram_partials(df):
        from collections import Counter

        bi: Counter = Counter()
        for text in df["text"]:
            tk = ts.tokens(text.lower())
            bi.update(zip(tk[:-1], tk[1:]))
        return pd.DataFrame({
            "w1": [p[0] for p in bi], "w2": [p[1] for p in bi],
            "c": np.asarray([bi[p] for p in bi], np.int64)})

    def bucketize(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            t.column("w1"), t.column("w2"), "\x00")
        return _crc_bucket_col(t.append_column("k", key), "k", nb)

    def reduce_counts(g):
        s = g.groupby(["w1", "w2"], as_index=False).agg(c=("c", "sum"))
        return s.astype({"c": "int64"})

    counts = (
        ds.map_batches(bigram_partials, batch_format="pandas")
        .map_batches(bucketize, batch_format="pyarrow")
        .drop_columns(["k"])
        .groupby("bucket")
        .map_groups(reduce_counts, batch_format="pandas")
        .materialize()  # vocab-sized; reused as c1 source + model
    )
    gate = int(os.environ.get("LM_BCAST_MAX_BIGRAMS",
                              LM_BCAST_MAX_BIGRAMS))

    if counts.count() <= gate:
        # SMALL-MODEL fast path: fold c1 and the per-bigram nll on the
        # driver (vocab-sized), broadcast one dict, score map-side.
        cpd = counts.to_pandas()
        c1 = cpd.groupby("w1")["c"].transform("sum").to_numpy(np.int64)
        lg = lambda a: np.floor(  # noqa: E731 — shared libm contract
            np.log2(a.astype(np.float64)) * 1_000_000).astype(np.int64)
        nll = lg(c1) - lg(cpd["c"].to_numpy(np.int64))
        model_ref = ray.put(dict(zip(zip(cpd["w1"], cpd["w2"]),
                                     nll.tolist())))

        def score(df):
            m = sim.resolve_broadcast(model_ref, key="lm-nll")
            ids, nbi, tot = [], [], []
            for doc_id, text in zip(df["doc_id"], df["text"]):
                tk = ts.tokens(text.lower())
                if len(tk) < 2:
                    continue
                ids.append(doc_id)
                nbi.append(len(tk) - 1)
                tot.append(sum(map(m.__getitem__,
                                   zip(tk[:-1], tk[1:]))))
            return pd.DataFrame({
                "doc_id": np.asarray(ids, np.int64),
                "n_bigrams": np.asarray(nbi, np.int64),
                "nll_log2_micro": np.asarray(
                    [t // n for t, n in zip(tot, nbi)], np.int64)})

        return ds.map_batches(score, batch_format="pandas")

    # OPEN-DOMAIN path: model stays distributed. c1 attaches to the
    # counts via a w1-bucketed reduce-and-merge, the per-bigram nll is
    # computed model-side ONCE, the probe (doc bigram multiplicities)
    # hash-joins on the composite key, and a doc-bucketed reduce
    # finishes. Exchange: O(model) + O(distinct doc bigrams).
    def attach_c1(g):
        s = g.copy()
        s["c1"] = s.groupby("w1")["c"].transform("sum")
        lg = lambda a: np.floor(  # noqa: E731
            np.log2(a.to_numpy(np.float64)) * 1_000_000).astype(np.int64)
        s["nll"] = lg(s["c1"]) - lg(s["c"])
        return s[["w1", "w2", "nll"]]

    model = (counts.map_batches(
        lambda t: _crc_bucket_col(t, "w1", nb), batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(attach_c1, batch_format="pandas"))

    def probe_rows(df):
        from collections import Counter

        rows: list[tuple] = []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            tk = ts.tokens(text.lower())
            if len(tk) < 2:
                continue
            for (w1, w2), k in Counter(zip(tk[:-1], tk[1:])).items():
                rows.append((doc_id, w1, w2, k))
        return pd.DataFrame(
            rows, columns=["doc_id", "w1", "w2", "k"]).astype(
            {"doc_id": "int64", "k": "int64"})

    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_part = max(8, min(nb, cpus // 2))
    j = ds.map_batches(probe_rows, batch_format="pandas").join(
        model, "inner", n_part, on=("w1", "w2"),
        aggregator_ray_remote_args=_join_remote_args(n_part))

    def doc_partial(df):
        out = pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(np.int64),
            "n_bigrams": df["k"].to_numpy(np.int64),
            "tot": df["k"].to_numpy(np.int64)
            * df["nll"].to_numpy(np.int64)})
        g = out.groupby("doc_id", as_index=False).agg(
            n_bigrams=("n_bigrams", "sum"), tot=("tot", "sum"))
        g["bucket"] = (g["doc_id"] % nb).astype("int32")
        return g

    def doc_final(g):
        s = g.groupby("doc_id", as_index=False).agg(
            n_bigrams=("n_bigrams", "sum"), tot=("tot", "sum"))
        return pd.DataFrame({
            "doc_id": s["doc_id"].astype("int64"),
            "n_bigrams": s["n_bigrams"].astype("int64"),
            "nll_log2_micro": (s["tot"].to_numpy(np.int64)
                               // s["n_bigrams"].to_numpy(np.int64))})

    return (j.map_batches(doc_partial, batch_format="pandas")
            .groupby("bucket")
            .map_groups(doc_final, batch_format="pandas"))


# --- T166: near-dup cluster representative selection -------------------


def q_cluster_reps(sf_dir: str):
    """Cluster REPRESENTATIVE selection — the keep-list step a dedup
    pipeline runs after clustering (q_near_dup_clusters): per
    connected component keep the LONGEST document (chars; ties →
    smallest doc_id), reporting the kept doc, its length and the
    cluster size. Labels are pair-bounded (candidates ≪ corpus by the
    LSH construction), so the argmax folds driver-side over the label
    table; each clustered doc's length attaches via ONE map-side
    filtered corpus scan against the broadcast clustered-id set — no
    text ever leaves the scan stage, nothing shuffles."""
    import pandas as pd

    labels = q_near_dup_clusters(sf_dir)
    lpd = (labels.to_pandas()
           if hasattr(labels, "to_pandas") else labels)
    if not isinstance(lpd, pd.DataFrame):
        lpd = lpd.to_pandas()
    if len(lpd) == 0:
        return pd.DataFrame({
            "rep_doc_id": pd.Series([], dtype="int64"),
            "keep_doc_id": pd.Series([], dtype="int64"),
            "keep_chars": pd.Series([], dtype="int64"),
            "n_docs": pd.Series([], dtype="int64")})
    ids = np.sort(lpd["doc_id"].to_numpy(np.int64))
    ids_ref = ray.put(ids)

    def lengths(df):
        keys = sim.resolve_broadcast(ids_ref, key="creps-ids")
        d = df["doc_id"].to_numpy(np.int64)
        idx = np.searchsorted(keys, d)
        idx_c = np.minimum(idx, len(keys) - 1)
        hit = keys[idx_c] == d
        return pd.DataFrame({
            "doc_id": d[hit],
            "n_chars": df["text"].str.len().to_numpy(np.int64)[hit]})

    lens = (_read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(lengths, batch_format="pandas")
            .to_pandas())  # one row per clustered doc — pair-bounded
    m = lpd.merge(lens, on="doc_id")
    m = m.sort_values(["rep_doc_id", "n_chars", "doc_id"],
                      ascending=[True, False, True], kind="mergesort")
    sizes = m.groupby("rep_doc_id")["doc_id"].size()
    keep = m.drop_duplicates("rep_doc_id")
    return pd.DataFrame({
        "rep_doc_id": keep["rep_doc_id"].astype("int64").to_numpy(),
        "keep_doc_id": keep["doc_id"].astype("int64").to_numpy(),
        "keep_chars": keep["n_chars"].astype("int64").to_numpy(),
        "n_docs": sizes.loc[keep["rep_doc_id"]].astype(
            "int64").to_numpy()}).reset_index(drop=True)


# --- T167: profit by nation and order year, TPC-H Q9 shape ------------

PROFIT_PART_WORD = "plate"  # p_name substring filter (Q9's LIKE '%green%')


def q_nation_year_profit(sf_dir: str):
    """TPC-H Q9 shape ADAPTED — profit by (supplier nation, order
    year) for one part family. partsupp is absent from this schema,
    so profit is l_extendedprice·(1−l_discount) without the
    ps_supplycost term — the PLAN shape (two dimension broadcasts
    pruning the fact map-side, ONE big-big orderkey exchange, a tiny
    (nation × year) rollup) is Q9's. The part filter drops ~87% of
    lineitem before the exchange; supplier→nation attaches from a
    broadcast array (dimension tables are 10⁻⁵ of the fact at any
    TPC-H sf, safe in the object store at 100 TB corpus scale)."""
    import pandas as pd

    ppd = _read(sf_dir, "part", ["p_partkey", "p_name"]).to_pandas()
    p_keys = np.sort(ppd.loc[
        ppd["p_name"].str.contains(PROFIT_PART_WORD, regex=False),
        "p_partkey"].to_numpy(np.int64))
    pref = ray.put(p_keys)

    spd = _read(sf_dir, "supplier",
                ["s_suppkey", "s_nationkey"]).to_pandas()
    s_keys = np.sort(spd["s_suppkey"].to_numpy(np.int64))
    s_nat = spd.set_index("s_suppkey")["s_nationkey"].astype(
        np.int64).sort_index().to_numpy()
    sref = ray.put((s_keys, s_nat))

    def li_map(df):
        pk = sim.resolve_broadcast(pref, key="nyp-part")
        sk, sn = sim.resolve_broadcast(sref, key="nyp-supp")
        part = df["l_partkey"].to_numpy(np.int64)
        idx = np.searchsorted(pk, part)
        idx_c = np.minimum(idx, len(pk) - 1) if len(pk) else idx
        hit = (pk[idx_c] == part) if len(pk) else np.zeros(
            len(part), bool)
        supp = df["l_suppkey"].to_numpy(np.int64)[hit]
        nat = sn[np.searchsorted(sk, supp)]
        profit = np.floor(
            df["l_extendedprice"].to_numpy(np.float64)[hit]
            * (1.0 - df["l_discount"].to_numpy(np.float64)[hit])
            * 1_000_000 + 0.5).astype(np.int64)
        return pd.DataFrame({
            "l_orderkey": df["l_orderkey"].to_numpy(np.int64)[hit],
            "supp_nat": nat, "profit_micro": profit})

    lfil = _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_partkey", "l_suppkey",
                  "l_extendedprice", "l_discount"]
                 ).map_batches(li_map, batch_format="pandas")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]
                   ).map_batches(
        lambda df: pd.DataFrame({
            "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
            "o_year": df["o_orderdate"].dt.year.to_numpy(np.int64)}),
        batch_format="pandas")

    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_part = max(8, min(dd.derive_buckets(
        _read(sf_dir, "orders", ["o_orderkey"]).count()), cpus // 2))
    j = lfil.join(
        orders, "inner", n_part,
        on=("l_orderkey",), right_on=("o_orderkey",),
        aggregator_ray_remote_args=_join_remote_args(n_part))

    small = (j.map_batches(
        lambda df: df.groupby(["supp_nat", "o_year"],
                              as_index=False).agg(
            profit_micro=("profit_micro", "sum")),
        batch_format="pandas")
        .groupby(["supp_nat", "o_year"])
        .aggregate(Sum("profit_micro", alias_name="profit_micro"))
        .to_pandas())  # ≤ nations × years rows
    nm = _read(sf_dir, "nation", ["n_nationkey", "n_name"]
               ).to_pandas().set_index("n_nationkey")["n_name"]
    out = pd.DataFrame({
        "nation": small["supp_nat"].map(nm).astype(str),
        "o_year": small["o_year"].astype("int64"),
        "profit_micro": small["profit_micro"].astype("int64")})
    return out.sort_values(
        ["nation", "o_year"], ascending=[True, False],
        kind="mergesort").reset_index(drop=True)


# --- T168: line counts by ship-delay class, TPC-H Q12 shape -----------

SHIPMODE_YEAR = "1997"        # receipt-year window stand-in
SHIPMODE_SLOW_DAYS = 30       # delay ≥ this → 'slow' class


def q_ship_delay_modes(sf_dir: str):
    """TPC-H Q12 shape ADAPTED — l_shipmode/commitdate/receiptdate
    are absent from this schema, so the 'ship mode' classes derive
    from the one date pair available: delay = l_shipdate −
    o_orderdate, class 'slow' when ≥ 30 days else 'fast'. The payload
    semantics are Q12's exactly: per class, the CASE-sum split of
    line counts into high-priority (1-URGENT/2-HIGH) vs low-priority
    orders, over one ship-year. Lineitem prunes to the year map-side,
    then ONE orderkey exchange against the (orderkey, date, priority)
    projection; the rollup key space is 2, folded per-batch."""
    import pandas as pd
    import pyarrow.compute as pc

    lo = pa.scalar(pd.Timestamp(f"{SHIPMODE_YEAR}-01-01"),
                   pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp(f"{int(SHIPMODE_YEAR) + 1}-01-01"),
                   pa.timestamp("us"))
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]
               ).map_batches(
        lambda b: b.filter(
            pc.and_(pc.greater_equal(b.column("l_shipdate"), lo),
                    pc.less(b.column("l_shipdate"), hi))),
        batch_format="pyarrow")
    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderdate", "o_orderpriority"])

    cpus = int(ray.cluster_resources().get("CPU", 8))
    n_part = max(8, min(dd.derive_buckets(
        _read(sf_dir, "orders", ["o_orderkey"]).count()), cpus // 2))
    j = li.join(
        orders, "inner", n_part,
        on=("l_orderkey",), right_on=("o_orderkey",),
        aggregator_ray_remote_args=_join_remote_args(n_part))

    def partial(df):
        delay = (df["l_shipdate"].to_numpy("datetime64[D]")
                 - df["o_orderdate"].to_numpy("datetime64[D]")
                 ).astype(np.int64)
        slow = delay >= SHIPMODE_SLOW_DAYS
        high = df["o_orderpriority"].isin(
            ["1-URGENT", "2-HIGH"]).to_numpy()
        return pd.DataFrame({
            "ship_class": np.where(slow, "slow", "fast"),
            "high_line_count": high.astype(np.int64),
            "low_line_count": (~high).astype(np.int64),
        }).groupby("ship_class", as_index=False).agg(
            high_line_count=("high_line_count", "sum"),
            low_line_count=("low_line_count", "sum"))

    return (j.map_batches(partial, batch_format="pandas")
            .groupby("ship_class")
            .aggregate(Sum("high_line_count",
                           alias_name="high_line_count"),
                       Sum("low_line_count",
                           alias_name="low_line_count")))


# --- T169: suppliers with excess shipped volume, TPC-H Q20 shape ------

EXCESS_PART_PREFIX = "red"   # p_name prefix filter (Q20's 'forest%')
EXCESS_YEAR = "1997"
EXCESS_QTY = 400             # per-supplier shipped-qty threshold


def q_excess_suppliers(sf_dir: str):
    """TPC-H Q20 shape ADAPTED — partsupp/ps_availqty are absent, so
    the nested-aggregate semi-join chain runs on shipped volume:
    suppliers whose total shipped quantity of 'red%' parts in one
    year exceeds a threshold, returning their name and account
    balance. The part keyset broadcasts (map-side prune before any
    exchange), the per-supplier rollup is a tiny native aggregate
    (supplier count is 10⁻⁴ of lineitem at any sf), and the HAVING
    survivors fetch their names via a map-side filtered supplier
    read — the Q18/Q20 broadcast-survivors plan, zero hash joins."""
    import pandas as pd
    import pyarrow.compute as pc

    ppd = _read(sf_dir, "part", ["p_partkey", "p_name"]).to_pandas()
    p_keys = np.sort(ppd.loc[
        ppd["p_name"].str.startswith(EXCESS_PART_PREFIX),
        "p_partkey"].to_numpy(np.int64))
    pref = ray.put(p_keys)
    lo = pa.scalar(pd.Timestamp(f"{EXCESS_YEAR}-01-01"),
                   pa.timestamp("us"))
    hi = pa.scalar(pd.Timestamp(f"{int(EXCESS_YEAR) + 1}-01-01"),
                   pa.timestamp("us"))

    def li_map(df):
        pk = sim.resolve_broadcast(pref, key="exsup-part")
        part = df["l_partkey"].to_numpy(np.int64)
        idx = np.searchsorted(pk, part)
        idx_c = np.minimum(idx, len(pk) - 1) if len(pk) else idx
        hit = (pk[idx_c] == part) if len(pk) else np.zeros(
            len(part), bool)
        qty = np.floor(df["l_quantity"].to_numpy(np.float64)
                       + 0.5).astype(np.int64)
        return pd.DataFrame({
            "s_suppkey": df["l_suppkey"].to_numpy(np.int64)[hit],
            "qty": qty[hit]})

    per_supp = (_read(sf_dir, "lineitem",
                      ["l_partkey", "l_suppkey", "l_quantity",
                       "l_shipdate"])
                .map_batches(
        lambda b: b.filter(
            pc.and_(pc.greater_equal(b.column("l_shipdate"), lo),
                    pc.less(b.column("l_shipdate"), hi))),
        batch_format="pyarrow")
        .map_batches(li_map, batch_format="pandas")
        .map_batches(
        lambda df: df.groupby("s_suppkey", as_index=False).agg(
            qty=("qty", "sum")),
        batch_format="pandas")
        .groupby("s_suppkey")
        .aggregate(Sum("qty", alias_name="total_qty"))
        .to_pandas())  # ≤ |supplier| rows
    winners = per_supp[per_supp["total_qty"] > EXCESS_QTY]
    keys = pa.array(np.sort(winners["s_suppkey"].to_numpy(np.int64)))
    names = _read(sf_dir, "supplier",
                  ["s_suppkey", "s_name", "s_acctbal"]).map_batches(
        lambda b: b.filter(pc.is_in(b.column("s_suppkey"), keys)),
        batch_format="pyarrow").to_pandas()
    out = winners.merge(names, on="s_suppkey")
    out["acctbal_cents"] = np.floor(
        out["s_acctbal"].to_numpy(np.float64) * 100 + 0.5
    ).astype(np.int64)
    return (out[["s_suppkey", "s_name", "acctbal_cents", "total_qty"]]
            .astype({"s_suppkey": "int64", "total_qty": "int64"})
            .sort_values("s_name", kind="mergesort")
            .reset_index(drop=True))


# --- T170: deterministic uniform sample of exactly k docs -------------

SAMPLE_K = 100


def q_uniform_sample_k(sf_dir: str):
    """Deterministic UNIFORM SAMPLE of exactly k documents — the
    eval-set / human-review draw every curation pipeline needs,
    without a global shuffle: keep the k smallest md5(doc_id) values
    (a uniform permutation position, reproducible across runs and
    partitionings). Per-batch partial top-k (k·n_blocks candidate
    rows reach the driver — never the corpus), final fold + rank.
    The hash is DuckDB's md5_number_upper convention
    (functions/textstats._md5_u64), so the oracle is the same ORDER
    BY hash LIMIT k."""
    import pandas as pd

    from ..functions.textstats import _md5_u64

    ds = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        h = np.array([_md5_u64(b"smp:%d" % i) for i in ids.tolist()],
                     np.uint64)
        keep = np.lexsort((ids, h))[:SAMPLE_K]
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "lang": b.column("lang").take(pa.array(keep)),
            "n_chars": b.column("n_chars").take(pa.array(keep)),
            "h": pa.array(h[keep], pa.uint64())})

    cand = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["h", "doc_id"], kind="mergesort"
                            ).head(SAMPLE_K)
    return pd.DataFrame({
        "rnk": np.arange(1, len(cand) + 1, dtype=np.int64),
        "doc_id": cand["doc_id"].astype("int64").to_numpy(),
        "lang": cand["lang"].astype(str).to_numpy(),
        "n_chars": cand["n_chars"].astype("int64").to_numpy()})


# --- T171: quality-classifier calibration / lift table -----------------

CAL_BIN_MILLI = 2000        # score-bin width (milli-units)
CAL_LONG_CHARS = 300        # independent signal: doc is "long"
CAL_OFF = 1_000_000_000     # shift to keep // floor-semantics equal
#                             between numpy (floor) and DuckDB
#                             (truncation) — both sides nonnegative


def q_quality_calibration(sf_dir: str):
    """Classifier CALIBRATION / LIFT table — the held-out sanity check
    run before a quality gate ships: bin the T137 linear-model score
    into fixed-width bins and tabulate, per bin, the doc count, how
    many docs carry an INDEPENDENT quality signal (length ≥
    CAL_LONG_CHARS chars), and the score mass. A monotone n_long/n
    across bins is the go signal; flat means the model is noise. Pure
    map-side scoring + binning (the quality_lr kernel) → per-batch
    partials → a ≤|bins| native fold; ZERO data exchange. The bin
    arithmetic offsets scores positive before integer division so
    numpy's floor and the oracle's truncating // agree exactly."""
    import pandas as pd

    from ..functions.textstats import _md5_u64, tokens as _tokens

    ds = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

    def partial(b: pa.Table) -> pa.Table:
        bins, long_, sc = [], [], []
        for t, nc in zip(b.column("text").to_pylist(),
                         b.column("n_chars").to_pylist()):
            tk = _tokens((t or "").lower())
            if not tk:
                continue
            s = 0
            for w in tk:
                s += (_md5_u64(b"lrw:" + w.encode("utf-8")) % 2001) - 1000
            bins.append((s + CAL_OFF) // CAL_BIN_MILLI)
            long_.append(1 if nc >= CAL_LONG_CHARS else 0)
            sc.append(s)
        df = pd.DataFrame({"bin": bins, "n_long": long_, "s": sc})
        g = df.groupby("bin", as_index=False).agg(
            n_docs=("s", "size"), n_long=("n_long", "sum"),
            sum_score_milli=("s", "sum"))
        return pa.Table.from_pandas(
            g.astype({"bin": "int64", "n_docs": "int64",
                      "n_long": "int64", "sum_score_milli": "int64"}),
            preserve_index=False)

    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby("bin")
           .aggregate(Sum("n_docs", alias_name="n_docs"),
                      Sum("n_long", alias_name="n_long"),
                      Sum("sum_score_milli",
                          alias_name="sum_score_milli")))

    def final(df):
        b = df["bin"].to_numpy(np.int64)
        return pd.DataFrame({
            "bin_lo_milli": b * CAL_BIN_MILLI - CAL_OFF,
            "n_docs": df["n_docs"].astype("int64"),
            "n_long": df["n_long"].astype("int64"),
            "sum_score_milli": df["sum_score_milli"].astype("int64")})

    return agg.map_batches(final, batch_format="pandas")


# --- T172: weighted sample (A-ES) — token-budget-proportional draw ----

WSAMPLE_K = 100


def q_weighted_sample_k(sf_dir: str):
    """WEIGHTED sample of exactly k docs, probability ∝ length —
    Efraimidis-Spirakis A-ES (2006): keep the k largest u^(1/w) ⇔ the
    k largest log2(u)/w, with u a deterministic md5-derived uniform —
    the length-proportional draw a token-budget subsample uses
    (sampling docs ∝ tokens ≈ sampling tokens uniformly). The sort
    key is the SAME IEEE double on both sides (libm-log2 parity
    contract; the float never leaves the ranking — output is integer
    rank + attributes). Per-batch partial top-k → k·n_blocks fold;
    no shuffle, corpus streams once."""
    import pandas as pd

    from ..functions.textstats import _md5_u64

    ds = _read(sf_dir, "documents", ["doc_id", "n_chars"])

    def key_of(ids: np.ndarray, w: np.ndarray) -> np.ndarray:
        h = np.array([_md5_u64(b"wsmp:%d" % i) for i in ids.tolist()],
                     np.uint64)
        return (np.log2(h.astype(np.float64) + 1.0) - 64.0) / w

    def partial(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy()
        w = b.column("n_chars").to_numpy().astype(np.float64)
        key = key_of(ids, w)
        keep = np.lexsort((ids, -key))[:WSAMPLE_K]
        return pa.Table.from_pydict({
            "doc_id": pa.array(ids[keep], pa.int64()),
            "n_chars": b.column("n_chars").take(pa.array(keep)),
            "key": pa.array(key[keep], pa.float64())})

    cand = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["key", "doc_id"], ascending=[False, True],
                            kind="mergesort").head(WSAMPLE_K)
    return pd.DataFrame({
        "rnk": np.arange(1, len(cand) + 1, dtype=np.int64),
        "doc_id": cand["doc_id"].astype("int64").to_numpy(),
        "n_chars": cand["n_chars"].astype("int64").to_numpy()})


# --- T173: ordered funnel conversion (click → later purchase) ---------


def q_funnel_conversion(sf_dir: str):
    """ORDERED-SEQUENCE funnel — the product-analytics aggregate the
    event battery lacked: of users with ≥1 click, how many later
    purchased (strictly after their FIRST click), plus the exact
    summed first-click→first-qualifying-purchase delay in micros.
    Order-dependence makes this non-commutative: clicks pre-combine
    map-side (min is safe) but purchase candidates must ride WHOLE to
    the user's bucket (a batch-min purchase may precede the global
    first click while a later one qualifies) — the exchange is
    O(purchase events) projected to 16-byte rows, never all events.
    Per-bucket vectorized two-pass reduce, ≤1-row partials, 1-row
    fold."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
    nb = dd.derive_buckets(ds.count())

    def partial(df):
        # unit-pinned: pandas may carry ns or us depending on the
        # Arrow→pandas path; epoch MICROS is the oracle's epoch_us
        us = df["ts"].astype("datetime64[us]").astype("int64")
        uid = df["user_id"].to_numpy(np.int64)
        is_c = (df["event_type"] == "click").to_numpy()
        is_p = (df["event_type"] == "purchase").to_numpy()
        c = (pd.DataFrame({"user_id": uid[is_c], "ts_us": us[is_c]})
             .groupby("user_id", as_index=False).agg(
                 ts_us=("ts_us", "min")))
        c["is_click"] = True
        p = pd.DataFrame({"user_id": uid[is_p], "ts_us": us[is_p]})
        p["is_click"] = False
        out = pd.concat([c, p], ignore_index=True)
        out["bucket"] = (out["user_id"] % nb).astype("int32")
        return out.astype({"user_id": "int64", "ts_us": "int64"})

    def reduce_bucket(g):
        n_users = n_conv = 0
        delay = 0
        clicks = g[g["is_click"]].groupby("user_id")["ts_us"].min()
        pur = g[~g["is_click"]]
        by_u = dict(iter(pur.groupby("user_id")["ts_us"]))
        for u, t1 in clicks.items():
            n_users += 1
            ts = by_u.get(u)
            if ts is None:
                continue
            after = ts[ts > t1]
            if len(after):
                n_conv += 1
                delay += int(after.min() - t1)
        return pd.DataFrame({
            "n_click_users": np.array([n_users], np.int64),
            "n_converted": np.array([n_conv], np.int64),
            "sum_delay_micro": np.array([delay], np.int64)})

    parts = (ds.map_batches(partial, batch_format="pandas")
             .groupby("bucket")
             .map_groups(reduce_bucket, batch_format="pandas")
             .to_pandas())  # ≤ n_buckets rows
    return pd.DataFrame({
        "n_click_users": np.array([parts["n_click_users"].sum()],
                                  np.int64),
        "n_converted": np.array([parts["n_converted"].sum()], np.int64),
        "sum_delay_micro": np.array([parts["sum_delay_micro"].sum()],
                                    np.int64)})


# --- T174: per-column data-profiling audit -----------------------------

PROFILE_COLS = ["event_id", "ts", "user_id", "event_type", "value",
                "props"]


def q_column_profile(sf_dir: str):
    """DATA-PROFILING audit — the per-column (rows, nulls, EXACT
    distinct) table every ingestion pipeline runs before trusting a
    new feed. One scan: per batch each column emits one counter row
    (rows, nulls) plus its batch-distinct value keys (shortest
    round-trip repr — injective for doubles, so distinct-count
    semantics match SQL's count(DISTINCT)); a crc-bucketed reduce
    counts unique keys per column (a (col, value) never splits across
    buckets) and sums counters; a cols×buckets driver fold finishes.
    Exchange is O(batch-distinct values) string rows, never the
    table. NaN/None both count as SQL NULL."""
    import pandas as pd
    import pyarrow.compute as pc

    ds = _read(sf_dir, "events", PROFILE_COLS)
    nb = dd.derive_buckets(ds.count())

    def partial(df):
        col_l, key_l, nr, nn = [], [], [], []
        for c in PROFILE_COLS:
            s = df[c]
            col_l.append(c)
            key_l.append("")  # counter sentinel
            nr.append(len(s))
            nn.append(int(s.isna().sum()))
            for v in pd.unique(s.dropna()):
                col_l.append(c)
                key_l.append(repr(v))
                nr.append(0)
                nn.append(0)
        return pd.DataFrame({
            "col": col_l, "key": key_l,
            "n_rows": np.asarray(nr, np.int64),
            "n_nulls": np.asarray(nn, np.int64)})

    def bucketize(t: pa.Table) -> pa.Table:
        k = pc.binary_join_element_wise(
            t.column("col"), t.column("key"), "\x00")
        return _crc_bucket_col(t.append_column("k", k), "k", nb)

    def reduce_bucket(g):
        cnt = g[g["key"] == ""].groupby("col", as_index=False).agg(
            n_rows=("n_rows", "sum"), n_nulls=("n_nulls", "sum"))
        dis = (g[g["key"] != ""].drop_duplicates(["col", "key"])
               .groupby("col", as_index=False).agg(
                   n_distinct=("key", "size")))
        out = cnt.merge(dis, on="col", how="outer").fillna(0)
        return out.astype({"n_rows": "int64", "n_nulls": "int64",
                           "n_distinct": "int64"})

    parts = (ds.map_batches(partial, batch_format="pandas")
             .map_batches(bucketize, batch_format="pyarrow")
             .drop_columns(["k"])
             .groupby("bucket")
             .map_groups(reduce_bucket, batch_format="pandas")
             .to_pandas())  # ≤ cols × buckets rows
    out = parts.groupby("col", as_index=False).agg(
        n_rows=("n_rows", "sum"), n_nulls=("n_nulls", "sum"),
        n_distinct=("n_distinct", "sum"))
    return (out.rename(columns={"col": "column"})
            .astype({"n_rows": "int64", "n_nulls": "int64",
                     "n_distinct": "int64"})
            .sort_values("column", kind="mergesort")
            .reset_index(drop=True))


# --- T175: exact integer embedding covariance (Gram) matrix -----------


def q_embedding_covariance(sf_dir: str):
    """Embedding GRAM / covariance matrix — the PCA / whitening prep
    pass an embedding pipeline runs before dimensionality reduction:
    Σ x_i x_iᵀ over all vectors in EXACT integers (components floor
    to micros; int64 matmul per batch — products ≤ 10¹² × n_vecs,
    overflow-documented ≫ any gate sf). The map-side combiner is the
    whole trick: each batch collapses to ONE dims×dims partial
    (X_microᵀ·X_micro via np.matmul), so the exchange is
    O(blocks·dims²) regardless of corpus size; a two-level
    repartition tree folds the partials (the embedding_outliers
    idiom — a native aggregate pays per-key overhead at dims² keys).
    Output: upper triangle as (di ≤ dj) long rows + the vector
    count."""
    import pandas as pd

    ds = _read(sf_dir, "embeddings", ["embedding"])

    def partial(df):
        m = np.floor(
            np.stack(df["embedding"].to_numpy()).astype(np.float64)
            * 1e6).astype(np.int64)
        g = m.T @ m  # dims×dims, exact int64
        iu, ju = np.triu_indices(m.shape[1])
        return pd.DataFrame({
            "di": iu.astype(np.int64), "dj": ju.astype(np.int64),
            "sum_prod_micro2": g[iu, ju],
            "n_vecs": np.int64(m.shape[0])})

    def sum_block(df):
        return df.groupby(["di", "dj"], as_index=False).agg(
            sum_prod_micro2=("sum_prod_micro2", "sum"),
            n_vecs=("n_vecs", "sum"))

    cpus = int(ray.cluster_resources().get("CPU", 8))
    nb_c = max(4, min(16, cpus // 2))
    out = (ds.map_batches(partial, batch_format="pandas")
           .repartition(nb_c)
           .map_batches(sum_block, batch_format="pandas")
           .repartition(1)
           .map_batches(sum_block, batch_format="pandas")
           .to_pandas())  # dims×(dims+1)/2 rows — tiny
    # each batch emits every pair exactly once carrying its batch row
    # count, so the per-pair n_vecs sum IS the total vector count
    return (out.astype({"di": "int64", "dj": "int64",
                     "sum_prod_micro2": "int64", "n_vecs": "int64"})
            .sort_values(["di", "dj"], kind="mergesort")
            .reset_index(drop=True))


# --- T176: BPE tokenizer APPLICATION over the corpus -------------------


def q_bpe_encode_counts(sf_dir: str):
    """TOKENIZER APPLICATION at corpus scale — encode every document
    with the merge table the T160 trainer learned (same corpus, the
    GPT-2 deployment loop: train once, broadcast the rules, encode
    everywhere): per doc the word count and the resulting subword
    count. The merge list is rank-ordered and applied sequentially
    per word (reference Sennrich §3.2 semantics); a per-actor word →
    length memo makes the cost O(distinct words) per batch, not
    O(tokens). Pure map-side after one broadcast; the only exchange
    is the trainer's own vocab-sized count reduce. Iterative string
    rewriting → no SQL oracle (the bpe_vocab precedent); pytest
    re-encodes the raw parquet with an independent encoder."""
    import pandas as pd

    from ..functions import textstats as ts

    merges = q_bpe_vocab(sf_dir)
    rules = list(zip(merges["left"], merges["right"]))
    rules_ref = ray.put(rules)

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def encode_len(word: str, rules: list, memo: dict) -> int:
        n = memo.get(word)
        if n is not None:
            return n
        sym = list(word)
        for la, rb in rules:
            out, i = [], 0
            while i < len(sym):
                if (i + 1 < len(sym) and sym[i] == la
                        and sym[i + 1] == rb):
                    out.append(la + rb)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            sym = out
        memo[word] = len(sym)
        return memo[word]

    def score(df):
        rules = sim.resolve_broadcast(rules_ref, key="bpe-rules")
        memo: dict[str, int] = {}
        ids, nw, nsw = [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            tk = ts.tokens(text)
            ids.append(doc_id)
            nw.append(len(tk))
            nsw.append(sum(encode_len(w, rules, memo) for w in tk))
        return pd.DataFrame({
            "doc_id": np.asarray(ids, np.int64),
            "n_words": np.asarray(nw, np.int64),
            "n_subwords": np.asarray(nsw, np.int64)})

    return ds.map_batches(score, batch_format="pandas")


# --- T177: referential-integrity (orphan FK) audit ---------------------

FK_EDGES = [
    # (edge label, fact table, fk col, dim table, dim key col)
    ("orders.custkey", "orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem.orderkey", "lineitem", "l_orderkey", "orders",
     "o_orderkey"),
    ("lineitem.partkey", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem.suppkey", "lineitem", "l_suppkey", "supplier",
     "s_suppkey"),
]


def q_fk_integrity(sf_dir: str):
    """REFERENTIAL-INTEGRITY audit — the orphan-foreign-key check an
    ingestion pipeline runs next to the T174 column profile: per FK
    edge, the fact row count plus how many rows / distinct keys
    reference a missing dimension row. The textbook star-schema plan:
    the three DIMENSION keysets (customer/part/supplier — 10⁻⁴ of the
    facts at any sf) broadcast once, so edges 0/2/3 check orphans
    MAP-SIDE with a vectorized searchsorted (zero exchange; orphan
    keys — EMPTY on sane data — ride as tiny key-bucketed distinct
    rows so the global distinct count stays exact, bounded O(orphans)
    with the bucketed fallback documented for pathological feeds);
    only the big-big edge (lineitem.orderkey ⇄ orders) pays ONE
    bucketed exchange of batch-aggregated (key, n) rows, sharing it
    with orders' own fact-leg partials. Two fact scans, one exchange.
    (First drafts: 4 per-edge pipelines = 4× barrier latency, 10.1 s
    in-battery; an 8-leg union exchange, 24 s solo — this plan is the
    union-of-two q21 shape at the single-exchange floor.)"""
    import pandas as pd

    def keys_of(tbl, col):
        return np.sort(_read(sf_dir, tbl, [col]).to_pandas()[col]
                       .to_numpy(np.int64))

    dim_refs = {0: ray.put(keys_of("customer", "c_custkey")),
                2: ray.put(keys_of("part", "p_partkey")),
                3: ray.put(keys_of("supplier", "s_suppkey"))}
    n_li = _read(sf_dir, "lineitem", ["l_orderkey"]).count()
    nb = dd.derive_buckets(n_li)

    # row kinds in the shared exchange schema
    K_CNT, K_ORPH, K_FACT, K_DIM = 0, 1, 2, 3

    def _bcast_edge(edge, fk_vals):
        keys = sim.resolve_broadcast(dim_refs[edge],
                                     key=f"fk-dim-{edge}")
        idx = np.searchsorted(keys, fk_vals)
        idx_c = np.minimum(idx, len(keys) - 1) if len(keys) else idx
        hit = (keys[idx_c] == fk_vals) if len(keys) else np.zeros(
            len(fk_vals), bool)
        orph = np.unique(fk_vals[~hit])
        return pd.DataFrame({
            "edge": np.int8(edge),
            "kind": np.concatenate((
                np.array([K_CNT], np.int8),
                np.full(len(orph), K_ORPH, np.int8))),
            "key": np.concatenate((np.array([-1], np.int64), orph)),
            "n": np.concatenate((
                np.array([len(fk_vals)], np.int64),
                np.zeros(len(orph), np.int64))),
            "n2": np.concatenate((
                np.array([int((~hit).sum())], np.int64),
                np.zeros(len(orph), np.int64))),
            "bucket": np.concatenate((
                np.array([edge], np.int32),
                (orph % nb).astype(np.int32)))})

    def li_map(df):
        ok = df["l_orderkey"].to_numpy(np.int64)
        g = df.groupby("l_orderkey", as_index=False).size()
        k = g["l_orderkey"].to_numpy(np.int64)
        fact = pd.DataFrame({
            "edge": np.int8(1), "kind": np.int8(K_FACT), "key": k,
            "n": g["size"].to_numpy(np.int64),
            "n2": np.zeros(len(k), np.int64),
            "bucket": (k % nb).astype(np.int32)})
        return pd.concat([
            fact,
            _bcast_edge(2, df["l_partkey"].to_numpy(np.int64)),
            _bcast_edge(3, df["l_suppkey"].to_numpy(np.int64)),
        ], ignore_index=True)

    def ord_map(df):
        k = df["o_orderkey"].drop_duplicates().to_numpy(np.int64)
        dim = pd.DataFrame({
            "edge": np.int8(1), "kind": np.int8(K_DIM), "key": k,
            "n": np.zeros(len(k), np.int64),
            "n2": np.zeros(len(k), np.int64),
            "bucket": (k % nb).astype(np.int32)})
        return pd.concat([
            dim,
            _bcast_edge(0, df["o_custkey"].to_numpy(np.int64)),
        ], ignore_index=True)

    unioned = _read(sf_dir, "lineitem",
                    ["l_orderkey", "l_partkey", "l_suppkey"]
                    ).map_batches(li_map, batch_format="pandas").union(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]
              ).map_batches(ord_map, batch_format="pandas"))

    def reduce_bucket(g):
        rows = []
        for edge, ge in g.groupby("edge", sort=False):
            cnt = ge[ge["kind"] == K_CNT]
            if len(cnt):  # broadcast-checked edge: fold counters +
                #             distinct orphan keys (key-bucketed)
                orph = ge.loc[ge["kind"] == K_ORPH, "key"].nunique()
                rows.append((int(edge), int(cnt["n"].sum()),
                             int(cnt["n2"].sum()), int(orph)))
                continue
            dimk = ge.loc[ge["kind"] == K_DIM, "key"].unique()
            fsum = (ge[ge["kind"] == K_FACT]
                    .groupby("key", as_index=False).agg(n=("n", "sum")))
            if not len(fsum):
                continue
            orphan = ~fsum["key"].isin(dimk)
            rows.append((int(edge), int(fsum["n"].sum()),
                         int(fsum.loc[orphan, "n"].sum()),
                         int(orphan.sum())))
        if not rows:
            return pd.DataFrame({
                "edge": pd.Series([], dtype="int64"),
                "n_fk_rows": pd.Series([], dtype="int64"),
                "n_orphan_rows": pd.Series([], dtype="int64"),
                "n_orphan_keys": pd.Series([], dtype="int64")})
        return pd.DataFrame(
            rows, columns=["edge", "n_fk_rows", "n_orphan_rows",
                           "n_orphan_keys"]).astype("int64")

    parts = (unioned.groupby("bucket")
             .map_groups(reduce_bucket, batch_format="pandas")
             .to_pandas())  # ≤ 4 × n_buckets rows
    agg = parts.groupby("edge", as_index=False).agg(
        n_fk_rows=("n_fk_rows", "sum"),
        n_orphan_rows=("n_orphan_rows", "sum"),
        n_orphan_keys=("n_orphan_keys", "sum"))
    agg["fk_edge"] = [FK_EDGES[int(e)][0] for e in agg["edge"]]
    return (agg[["fk_edge", "n_fk_rows", "n_orphan_rows",
                 "n_orphan_keys"]]
            .astype({"n_fk_rows": "int64", "n_orphan_rows": "int64",
                     "n_orphan_keys": "int64"})
            .sort_values("fk_edge", kind="mergesort")
            .reset_index(drop=True))


# --- T178: corpus distribution-drift monitor (smoothed KL) -------------


def q_token_drift_kl(sf_dir: str):
    """DISTRIBUTION-DRIFT monitor — the data-drift alarm a production
    ingestion runs between corpus snapshots: add-one-smoothed
    KL(P_even ‖ P_odd) between the token distributions of the two
    doc_id-parity halves (a deterministic stand-in for
    yesterday/today). Exact integers end-to-end: each token's term is
    (c1+1)·[L((c1+1)·(n2+V)) − L((c2+1)·(n1+V))] with
    L(x) = floor(log2(x)·10⁶) on exact-double integer inputs (the
    libm-parity contract; products ≤ ~10¹⁴ ≪ 2⁵³ at any gate sf —
    re-derive the bound before corpora beyond ~10⁹ tokens). The
    UNDIVIDED term sum is returned next to the denominators (a
    slightly-negative smoothed sum would hit the DuckDB-truncation /
    numpy-floor division mismatch; callers divide by n1+V).

    Shape: ONE corpus scan → (token, half) count partials →
    crc-bucketed vocab-sized reduce (the word-count exchange); the
    three scalars (n1, n2, V) fold off the SAME materialized counts;
    the term pass is a map-side vectorized sweep over the counts.
    Exchange O(vocab), corpus read once."""
    import pandas as pd

    from ..functions import textstats as ts

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    nb = dd.derive_buckets(ds.count(), rows_per_doc=16)

    def partials(df):
        from collections import Counter

        c: Counter = Counter()
        for doc_id, text in zip(df["doc_id"], df["text"]):
            half = int(doc_id) % 2
            for w in ts.tokens(text.lower()):
                c[(w, half)] += 1
        w_l = [k[0] for k in c]
        return pd.DataFrame({
            "w": w_l,
            "c1": np.asarray(
                [c[k] if k[1] == 0 else 0 for k in c], np.int64),
            "c2": np.asarray(
                [c[k] if k[1] == 1 else 0 for k in c], np.int64)})

    def reduce_counts(g):
        s = g.groupby("w", as_index=False).agg(
            c1=("c1", "sum"), c2=("c2", "sum"))
        return s.astype({"c1": "int64", "c2": "int64"})

    counts = (
        ds.map_batches(partials, batch_format="pandas")
        .map_batches(lambda t: _crc_bucket_col(t, "w", nb),
                     batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(reduce_counts, batch_format="pandas")
        .materialize()  # vocab-sized; scalars + term pass reuse it
    )
    n1 = int(counts.sum("c1") or 0)
    n2 = int(counts.sum("c2") or 0)
    v = counts.count()

    def term(df):
        c1 = df["c1"].to_numpy(np.int64)
        c2 = df["c2"].to_numpy(np.int64)
        la = np.floor(np.log2(
            ((c1 + 1) * (n2 + v)).astype(np.float64)) * 1e6
        ).astype(np.int64)
        lb = np.floor(np.log2(
            ((c2 + 1) * (n1 + v)).astype(np.float64)) * 1e6
        ).astype(np.int64)
        return pd.DataFrame({
            "t": np.array([int(((c1 + 1) * (la - lb)).sum())],
                          np.int64)})

    tsum = int(counts.map_batches(
        term, batch_format="pandas").sum("t") or 0)
    return pd.DataFrame({
        "n1_tokens": np.array([n1], np.int64),
        "n2_tokens": np.array([n2], np.int64),
        "vocab_union": np.array([v], np.int64),
        "kl_sum_micro": np.array([tsum], np.int64)})


# --- T179: winsorized (robust) mean per group --------------------------

WINSOR_LO_MICRO = 50_000    # 5th percentile (micro-units of q)
WINSOR_HI_MICRO = 950_000   # 95th percentile


def q_winsorized_value_mean(sf_dir: str):
    """ROBUST (winsorized) grouped mean — the outlier-resistant
    aggregate a metrics pipeline uses when heavy tails poison plain
    means: per event type, clip values to the exact discrete
    p5/p95 (DuckDB quantile_disc semantics, index ceil(q·N)−1) and
    take the clipped integer mean. Rides the value_quantiles
    histogram-combiner shape unchanged: per-batch (type, value_micro,
    n) partials → ONE shuffle → a per-type weighted-cumsum reduce
    that finds both bounds AND folds the clipped sum in the same
    pass. Exchange O(batch-distinct values), never events; floor
    division is safe (sums of clipped micros are sign-stable: the
    mean of clipped values keeps the clipped sum's sign, and the
    oracle divides the SAME nonneg-shifted sum)."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(df):
        df = df.assign(v=_micro_int_col(df["value"]))
        g = (df.groupby(["event_type", "v"], as_index=False)
             .agg(n=("v", "size")))
        g["n"] = g["n"].astype("int64")
        return g[["event_type", "v", "n"]]

    def reduce_type(g):
        g = g.sort_values("v", kind="mergesort")
        v = g["v"].to_numpy(np.int64)
        c = g["n"].to_numpy(np.int64)
        cum = np.cumsum(c)
        total = int(cum[-1])

        def qd(q_micro: int) -> int:
            target = -(-q_micro * total // 1_000_000) - 1
            return int(v[np.searchsorted(cum, target + 1)])

        lo, hi = qd(WINSOR_LO_MICRO), qd(WINSOR_HI_MICRO)
        clipped = np.clip(v, lo, hi)
        s = int((clipped * c).sum())
        # nonneg shift before // so numpy floor == DuckDB truncation
        off = 10_000_000_000
        mean = (s + off * total) // total - off
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n_events": np.array([total], np.int64),
            "lo_micro": np.array([lo], np.int64),
            "hi_micro": np.array([hi], np.int64),
            "winsor_mean_micro": np.array([mean], np.int64)})

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("event_type")
            .map_groups(reduce_type, batch_format="pandas"))


# --- T180: BPE-ish regex pre-tokenizer stats ---------------------------

# letter runs | digit runs | single other-glyph — the GPT-2-style
# pre-tokenization split, restricted to EXPLICIT ASCII classes so
# Python re and DuckDB's RE2 agree on any input (Python \s is
# Unicode-wide, RE2's is not — the ADVICE-r3 divergence class)
REGEX_TOK = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\r\f\v]"


def q_regex_token_counts(sf_dir: str):
    """BPE-ish REGEX pre-tokenization stats — the GPT-2-family
    pre-tokenizer (letter runs / digit runs / punctuation glyphs)
    next to the whitespace tokenizer: per doc both token counts plus
    the per-class split. One compiled-regex map-side pass (compiled
    once per actor via the module-level cache), zero exchange.
    Classes are explicit ASCII so the RE2 oracle matches on ANY
    corpus, not just an ASCII one."""
    import re as _re

    import pandas as pd

    from ..functions.textstats import tokens as _tokens

    pat = _re.compile(REGEX_TOK)

    def stats(df):
        ids, nws, nrx, nw, nd, no = [], [], [], [], [], []
        for doc_id, text in zip(df["doc_id"], df["text"]):
            t = text or ""
            toks = pat.findall(t)
            w = sum(1 for x in toks if x[0].isalpha())
            d = sum(1 for x in toks if x[0].isdigit())
            ids.append(doc_id)
            nws.append(len(_tokens(t)))
            nrx.append(len(toks))
            nw.append(w)
            nd.append(d)
            no.append(len(toks) - w - d)
        return pd.DataFrame({
            "doc_id": np.asarray(ids, np.int64),
            "n_ws_tokens": np.asarray(nws, np.int64),
            "n_regex_tokens": np.asarray(nrx, np.int64),
            "n_word_runs": np.asarray(nw, np.int64),
            "n_digit_runs": np.asarray(nd, np.int64),
            "n_other_glyphs": np.asarray(no, np.int64)})

    return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
        stats, batch_format="pandas")


# --- T181: median absolute deviation (robust scale) per group ----------


def q_value_mad(sf_dir: str):
    """MAD — median absolute deviation, the robust SCALE companion to
    the T179 winsorized mean: per event type the exact discrete
    median and median(|v − median|). The second-order statistic costs
    NO second exchange: both fold inside the same per-type reduce
    over the (value, n) histogram (median from the weighted cumsum,
    then the |v−med| histogram re-sorts the SAME arrays). Exchange
    O(batch-distinct values) once; quantile_disc semantics both
    sides."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_type", "value"])

    def partial(df):
        df = df.assign(v=_micro_int_col(df["value"]))
        g = (df.groupby(["event_type", "v"], as_index=False)
             .agg(n=("v", "size")))
        g["n"] = g["n"].astype("int64")
        return g[["event_type", "v", "n"]]

    def reduce_type(g):
        g = g.sort_values("v", kind="mergesort")
        v = g["v"].to_numpy(np.int64)
        c = g["n"].to_numpy(np.int64)
        total = int(c.sum())

        def wq(vals, wts, q_micro=500_000):
            order = np.argsort(vals, kind="mergesort")
            vals, wts = vals[order], wts[order]
            cum = np.cumsum(wts)
            target = -(-q_micro * total // 1_000_000) - 1
            return int(vals[np.searchsorted(cum, target + 1)])

        med = wq(v, c)
        mad = wq(np.abs(v - med), c)
        return pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n_events": np.array([total], np.int64),
            "median_micro": np.array([med], np.int64),
            "mad_micro": np.array([mad], np.int64)})

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("event_type")
            .map_groups(reduce_type, batch_format="pandas"))


# --- T182: global stable row enumeration (distributed zipWithIndex) ----

ROWID_RANGE_BUCKETS = 64


def q_global_row_ids(sf_dir: str):
    """GLOBAL STABLE ENUMERATION — contiguous training-example ids in
    (lang, doc_id) order, the zipWithIndex primitive Ray Data lacks,
    WITHOUT a global sort: rank(row) = Σ counts of strictly-smaller
    (lang, range-bucket) cells + the row's rank inside its own cell.
    Phase 1 folds the tiny (lang × range-bucket) count grid off one
    map-side pass (doc_id value-range buckets, so cell order IS key
    order); the exclusive prefix sum over the grid broadcasts; phase
    2 ranks each cell independently inside a bucketed reduce and adds
    its offset. Two scans of a 2-int projection, one cell-hash
    exchange; no all-to-all sort of the data itself. Ids are
    partitioning-independent and dense 1..N."""
    import pandas as pd

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    n = ds.count()
    span = max(1, (int(_read(sf_dir, "documents", ["doc_id"])
                       .max("doc_id") or 0) + ROWID_RANGE_BUCKETS)
               // ROWID_RANGE_BUCKETS)

    def cell_counts(df):
        out = pd.DataFrame({
            "lang": df["lang"],
            "rb": (df["doc_id"].to_numpy(np.int64) // span)})
        g = out.groupby(["lang", "rb"], as_index=False).size()
        return g.rename(columns={"size": "n"}).astype(
            {"rb": "int64", "n": "int64"})

    grid = (ds.map_batches(cell_counts, batch_format="pandas")
            .groupby(["lang", "rb"])
            .aggregate(Sum("n", alias_name="n"))
            .to_pandas())  # ≤ langs × buckets rows
    grid = grid.sort_values(["lang", "rb"], kind="mergesort")
    offs = np.concatenate(
        ([0], np.cumsum(grid["n"].to_numpy(np.int64))[:-1]))
    off_ref = ray.put({(la, int(rb)): int(o) for la, rb, o in zip(
        grid["lang"], grid["rb"], offs)})

    def rank_cell(g):
        m = sim.resolve_broadcast(off_ref, key="rowid-offsets")
        g = g.sort_values("doc_id", kind="mergesort")
        out = []
        for (la, rb), sub in g.groupby(["lang", "rb"], sort=False):
            base = m[(la, int(rb))]
            out.append(pd.DataFrame({
                "doc_id": sub["doc_id"].to_numpy(np.int64),
                "global_id": base + 1 + np.arange(len(sub),
                                                  dtype=np.int64)}))
        return pd.concat(out, ignore_index=True)

    def keyed(df):
        df = df.copy()
        df["rb"] = df["doc_id"].to_numpy(np.int64) // span
        # cell-hash bucket via crc32 (process-stable — python hash()
        # is seed-randomized per worker): one cell never splits, so
        # in-cell ranks are globally exact
        lh = df["lang"].map(
            lambda s: zlib.crc32(s.encode())).astype(np.int64)
        df["bucket"] = ((df["rb"] * 131 + lh)
                        % ROWID_RANGE_BUCKETS).astype("int32")
        return df

    return (ds.map_batches(keyed, batch_format="pandas")
            .groupby("bucket")
            .map_groups(rank_cell, batch_format="pandas"))


# --- T183: per-user behavioral entropy ---------------------------------


def q_user_entropy(sf_dir: str):
    """Per-ENTITY behavioral entropy — the bot/spam signal (a user
    whose event-type mix has near-zero entropy is single-action
    automation; T148 token_entropy's formula applied per user over
    the event stream instead of per doc over tokens): Shannon entropy
    of each user's event-type distribution in exact integer
    log2-micros (per-type term floor(n·log2(tot/n)·10⁶), sum // tot —
    the established libm contract). Per-batch (user, type, n) count
    partials → ONE user-hash bucketed exchange (a user never splits,
    so per-bucket sums are final) → vectorized per-bucket entropy.
    Exchange O(batch-distinct pairs), never events."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    nb = dd.derive_buckets(ds.count())

    def partial(df):
        g = df.groupby(["user_id", "event_type"],
                       as_index=False).size()
        g = g.rename(columns={"size": "n"})
        g["bucket"] = (g["user_id"] % nb).astype("int32")
        return g.astype({"user_id": "int64", "n": "int64"})

    def reduce_bucket(g):
        c = g.groupby(["user_id", "event_type"], as_index=False).agg(
            n=("n", "sum"))
        tot = c.groupby("user_id")["n"].transform("sum").to_numpy(
            np.int64)
        n = c["n"].to_numpy(np.int64)
        term = np.floor(
            n * np.log2(tot.astype(np.float64) / n) * 1_000_000
        ).astype(np.int64)
        out = (pd.DataFrame({"user_id": c["user_id"], "t": term,
                             "tot": tot})
               .groupby("user_id", as_index=False)
               .agg(t=("t", "sum"), tot=("tot", "first")))
        return pd.DataFrame({
            "user_id": out["user_id"].astype("int64"),
            "n_events": out["tot"].astype("int64"),
            "entropy_micro": (out["t"].to_numpy(np.int64)
                              // out["tot"].to_numpy(np.int64))})

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("bucket")
            .map_groups(reduce_bucket, batch_format="pandas"))


# --- T184: embedded data-URI image inventory ----------------------------

_EMBED_IMG_RE = re.compile(
    rb'src="data:image/(png|jpeg|gif|bmp);base64,([A-Za-z0-9+/=]*)"')
# the exact base64 grammar b64decode(validate=True) accepts — mirrored
# structurally in the oracle so both sides skip the same embeds
_B64_OK_RE = re.compile(
    rb"^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|"
    rb"[A-Za-z0-9+/]{3}=|[A-Za-z0-9+/]{4})$")


from ..functions.html_extract import MAX_EMBED_IMAGES  # noqa: E402


def q_embedded_image_stats(sf_dir: str):
    """Embedded data-URI IMAGE INVENTORY over the raw crawl — the
    capacity-planning audit run before enabling the T-multimodal legs
    (how many inline images, which formats, how many payload bytes):
    per format the embed count, docs touched, and total DECODED bytes
    (computed arithmetically from base64 length — no decode needed
    for an inventory). Validity mirrors the extractor's
    b64decode(validate=True) via the structural base64 grammar, so
    this op, the extraction harvest and the SQL oracle all skip the
    SAME malformed embeds; gzip-wrapped transport rows are skipped on
    both sides (the link_domains blob-scan precedent). Map-side regex
    over the payload bytes → tiny per-format fold; zero exchange."""
    import pandas as pd

    files = expand_input_files(_corpus_dir())
    ds = ray.data.read_parquet(files, columns=["html"])

    def inventory(b: pa.Table) -> pa.Table:
        agg: dict = {}
        for raw in b.column("html").to_pylist():
            raw = raw or b""
            if raw[:2] == b"\x1f\x8b":
                continue  # transport-gzip rows: oracle can't inflate
            seen = set()
            n_in_doc = 0
            for m in _EMBED_IMG_RE.finditer(raw):
                if n_in_doc >= MAX_EMBED_IMAGES:
                    break
                b64 = m.group(2)
                if not b64 or not _B64_OK_RE.match(b64):
                    continue
                n_in_doc += 1
                fmt = m.group(1).decode()
                dec = len(b64) * 3 // 4 - b64.count(b"=")
                a = agg.setdefault(fmt, [0, 0, 0])
                a[0] += 1
                a[1] += dec
                if fmt not in seen:
                    a[2] += 1
                    seen.add(fmt)
        fmts = sorted(agg)
        return pa.Table.from_pydict({
            "fmt": pa.array(fmts, pa.string()),
            "n_images": pa.array([agg[f][0] for f in fmts], pa.int64()),
            "decoded_bytes": pa.array([agg[f][1] for f in fmts],
                                      pa.int64()),
            "n_docs": pa.array([agg[f][2] for f in fmts], pa.int64())})

    parts = ds.map_batches(inventory, batch_format="pyarrow").to_pandas()
    out = parts.groupby("fmt", as_index=False).agg(
        n_images=("n_images", "sum"),
        decoded_bytes=("decoded_bytes", "sum"),
        n_docs=("n_docs", "sum"))
    return (out.astype({"n_images": "int64", "decoded_bytes": "int64",
                        "n_docs": "int64"})
            .sort_values("fmt", kind="mergesort").reset_index(drop=True))


# --- T185: Gopher quality-rule battery -------------------------------

# Rae et al. 2021 (arXiv:2112.11446, Gopher) rule constants — the
# document-level filter battery beyond what quality_scores (T9) and
# repetition_stats (T31) cover: word-count band, mean word length
# band, symbol-to-word ratio, bullet/ellipsis line fractions,
# alphabetic-word fraction. All integer micro/ppm so the SQL oracle
# is equality-exact.
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_WLEN_MICRO = 3_000_000
GOPHER_MAX_WLEN_MICRO = 10_000_000
GOPHER_MAX_SYM_PPM = 100_000
GOPHER_MAX_BULLET_PPM = 900_000
GOPHER_MAX_ELLIPSIS_PPM = 300_000
GOPHER_MIN_ALPHA_PPM = 800_000

_ALPHA_RE = re.compile(r"[A-Za-z]")


def q_gopher_rules(sf_dir: str):
    """Full GOPHER quality-rule battery per document (Rae et al.
    2021) — the canonical pre-training document filter, complementing
    T9 (length/punct/stopword ratios) and T31 (repetition): word-count
    band, mean-word-length band, symbol-to-word ratio ('#' chars +
    non-overlapping '...' runs), bullet-start and ellipsis-end line
    fractions, alphabetic-word fraction, and the conjunctive pass
    flag. All ratios are exact integer ppm (floor-div), the line rule
    uses raw '\\n' splits and the token rule the RE2-exact tokenizer,
    so the SQL oracle matches byte-for-byte on any corpus. Pure
    map-side, zero exchange."""
    from ..functions.textstats import tokens

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def rules(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id")
        rows: list[list[int]] = []
        for t in b.column("text").to_pylist():
            toks = tokens(t)
            nw = len(toks)
            sum_len = sum(len(w) for w in toks)
            n_alpha = sum(1 for w in toks if _ALPHA_RE.search(w))
            lines = t.split("\n")
            nl = len(lines)  # >= 1 ('' splits to [''])
            n_bullet = sum(
                1 for ln in lines if ln.startswith(("- ", "* ")))
            n_ellip = sum(1 for ln in lines if ln.endswith("..."))
            n_sym = t.count("#") + t.count("...")
            mean_wlen = sum_len * 1_000_000 // nw if nw else 0
            sym_ppm = n_sym * 1_000_000 // nw if nw else 0
            alpha_ppm = n_alpha * 1_000_000 // nw if nw else 0
            rows.append([
                nw, mean_wlen, sym_ppm,
                n_bullet * 1_000_000 // nl,
                n_ellip * 1_000_000 // nl,
                alpha_ppm,
            ])
        cols = list(zip(*rows)) if rows else [[]] * 6
        nw_a, mw_a, sy_a, bu_a, el_a, al_a = [
            np.asarray(c, np.int64) for c in cols]
        passes = (
            (nw_a >= GOPHER_MIN_WORDS) & (nw_a <= GOPHER_MAX_WORDS)
            & (mw_a >= GOPHER_MIN_WLEN_MICRO)
            & (mw_a <= GOPHER_MAX_WLEN_MICRO)
            & (sy_a <= GOPHER_MAX_SYM_PPM)
            & (bu_a <= GOPHER_MAX_BULLET_PPM)
            & (el_a <= GOPHER_MAX_ELLIPSIS_PPM)
            & (al_a >= GOPHER_MIN_ALPHA_PPM)
        )
        return pa.Table.from_pydict({
            "doc_id": ids,
            "n_words": pa.array(nw_a, pa.int64()),
            "mean_wlen_micro": pa.array(mw_a, pa.int64()),
            "sym_ppm": pa.array(sy_a, pa.int64()),
            "bullet_ppm": pa.array(bu_a, pa.int64()),
            "ellipsis_ppm": pa.array(el_a, pa.int64()),
            "alpha_ppm": pa.array(al_a, pa.int64()),
            "passes": pa.array(passes, pa.bool_()),
        })

    return ds.map_batches(rules, batch_format="pyarrow")


# --- T186: domain concentration Gini ----------------------------------


def q_domain_gini(sf_dir: str):
    """Domain-CONCENTRATION Gini over the crawl — the corpus-diversity
    scalar data-mix work monitors (a crawl where 1% of hosts carry 90%
    of documents trains differently from a flat one). Exact integer
    Gini in ppm via the rank-sum identity G = (2·Σᵢ i·c₍ᵢ₎ − (n+1)·T)
    / (n·T) over ASCENDING per-domain counts — computed from the
    counts-of-counts HISTOGRAM (for count value v with multiplicity m
    over rank run [r+1, r+m]: Σ i·v = v·(m·r + m(m+1)/2)), which is
    tie-order invariant, so no per-domain sort is needed anywhere.

    Shape: map-side per-batch domain counts → crc-bucketed per-domain
    reduce emitting per-bucket (count value, n_domains) histogram
    partials → driver fold over the tiny distinct-count-value axis in
    Python bigints. The corpus never shuffles; the exchange is
    O(batch-distinct domains), the driver set O(distinct count
    values) — both corpus-size independent for a fixed host axis."""
    import pandas as pd
    import re as _re

    files = expand_input_files(_corpus_dir())
    ds = ray.data.read_parquet(files, columns=["url"])
    dom_re = _re.compile(r"https://([^/]+)/")
    nb = dd.width_floor()

    def partial(b: pa.Table) -> pa.Table:
        urls = b.column("url").to_pylist()
        doms = [m.group(1) if (m := dom_re.search(u)) else ""
                for u in urls]
        s = pd.Series(doms).value_counts()
        t = pa.Table.from_pydict({
            "domain": pa.array(s.index.to_list(), pa.string()),
            "n": pa.array(s.to_numpy(np.int64), pa.int64())})
        return _crc_bucket_col(t, "domain", nb)

    def hist_reduce(g):
        per_dom = g.groupby("domain", as_index=False).agg(c=("n", "sum"))
        h = per_dom.groupby("c", as_index=False).size()
        return pd.DataFrame({"c": h["c"].astype("int64"),
                             "m": h["size"].astype("int64")})

    parts = (ds.map_batches(partial, batch_format="pyarrow")
             .groupby("bucket")
             .map_groups(hist_reduce, batch_format="pandas")
             .to_pandas())
    hist = parts.groupby("c")["m"].sum().sort_index()
    rank, src, tot, n = 0, 0, 0, 0
    for v, m in hist.items():  # ascending count values, Python bigints
        v, m = int(v), int(m)
        src += v * (m * rank + m * (m + 1) // 2)
        rank += m
        tot += v * m
    n = rank
    gini_ppm = (2 * src - (n + 1) * tot) * 1_000_000 // (n * tot) \
        if n and tot else 0
    return pd.DataFrame({"n_domains": pd.Series([n], dtype="int64"),
                         "n_docs": pd.Series([tot], dtype="int64"),
                         "gini_ppm": pd.Series([gini_ppm],
                                               dtype="int64")})


# --- T187: inference padding-waste audit ------------------------------

PAD_BATCH = 32  # oracle-mirrored; production derives from the serving
                # engine's max-batch config


def q_padding_waste(sf_dir: str):
    """LENGTH-BUCKETED BATCHING audit — the inference/training serving
    question 'how much compute does padding burn if we batch PAD_BATCH
    docs in token-sorted order': documents rank by (n_tokens, doc_id),
    consecutive ranks form batches, each batch pads every member to
    its max. Reports per batch the doc count, max/sum token counts and
    padded-slot fraction in exact ppm.

    Global ranks WITHOUT a global sort (the T182 machinery on the
    token-count axis): scan 1 folds a value-domain histogram of
    n_tokens (distinct token counts ≪ corpus); the driver's exclusive
    prefix over it broadcasts; scan 2 buckets rows BY VALUE (a value
    never splits), ranks within each value by doc_id via one
    vectorized argsort, adds the offset, and emits (batch_id, n_tok)
    int rows; a batch_id-hash bucketed reduce folds per-batch stats.
    Exchange is O(corpus rows) of 2-int rows — inherent (every doc
    must learn its rank) — and the text never shuffles."""
    import pandas as pd

    from ..functions.textstats import tokens

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def tok_rows(b: pa.Table) -> pa.Table:
        nt = [len(tokens(t)) for t in b.column("text").to_pylist()]
        return pa.Table.from_pydict({
            "doc_id": b.column("doc_id"),
            "n_tok": pa.array(nt, pa.int64())})

    toks = ds.map_batches(tok_rows, batch_format="pyarrow").materialize()

    # scan 1: value-domain histogram → exclusive-prefix offsets
    def hist(b: pa.Table) -> pa.Table:
        v, c = np.unique(b.column("n_tok").to_numpy(), return_counts=True)
        return pa.Table.from_pydict({
            "v": pa.array(v, pa.int64()),
            "m": pa.array(c.astype(np.int64), pa.int64())})

    h = (toks.map_batches(hist, batch_format="pyarrow")
         .to_pandas().groupby("v")["m"].sum().sort_index())
    vals = h.index.to_numpy(np.int64)
    offs = np.concatenate([[0], np.cumsum(h.to_numpy(np.int64))[:-1]])
    off_ref = ray.put((vals, offs))

    nbv = dd.width_floor()
    nb2 = dd.derive_buckets(int(h.sum()))

    def by_value(b: pa.Table) -> pa.Table:
        nt = b.column("n_tok").to_numpy()
        return b.append_column(
            "bucket", pa.array((nt % nbv).astype(np.int32)))

    def rank_group(g):
        va, of = sim.resolve_broadcast(off_ref, key="pad-offsets")
        out = []
        for v, sub in g.groupby("n_tok"):
            ids = np.sort(sub["doc_id"].to_numpy(np.int64))
            base = int(of[np.searchsorted(va, v)])
            rk = base + np.arange(len(ids), dtype=np.int64)
            out.append(pd.DataFrame({
                "batch_id": rk // PAD_BATCH,
                "n_tok": np.full(len(ids), v, np.int64)}))
        res = pd.concat(out) if out else pd.DataFrame(
            {"batch_id": pd.Series(dtype="int64"),
             "n_tok": pd.Series(dtype="int64")})
        res["b2"] = (res["batch_id"] % nb2).astype("int32")
        return res

    def batch_stats(g):
        s = g.groupby("batch_id", as_index=False).agg(
            n_docs=("n_tok", "size"), max_tok=("n_tok", "max"),
            sum_tok=("n_tok", "sum"))
        cap = s["n_docs"].to_numpy(np.int64) * s["max_tok"].to_numpy(
            np.int64)
        pad = np.where(
            cap > 0,
            (cap - s["sum_tok"].to_numpy(np.int64)) * 1_000_000
            // np.maximum(cap, 1), 0)
        s["pad_ppm"] = pad.astype(np.int64)
        return s.astype({"n_docs": "int64", "max_tok": "int64",
                         "sum_tok": "int64"})

    return (toks.map_batches(by_value, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(rank_group, batch_format="pandas")
            .groupby("b2")
            .map_groups(batch_stats, batch_format="pandas"))


# --- T188: cross-slice embedding decontamination ----------------------

EVAL_SLICE_MOD = 20   # eval slice = vec_id % MOD == 0 (oracle-mirrored)
CONTAM_COS_MIN = 0.4  # same τ/float contract as T5


def q_embedding_contamination(sf_dir: str):
    """SEMANTIC DECONTAMINATION across corpus slices — flag training
    vectors too close (cosine ≥ τ) to ANY held-out eval vector, the
    embedding-space twin of T32's n-gram benchmark decontamination
    (catches paraphrased leakage that exact grams miss). The eval
    slice (vec_id % EVAL_SLICE_MOD == 0 — stand-in for a real
    benchmark table) is SMALL BY CONSTRUCTION (the decontamination
    contract: benchmarks are thousands of rows, corpora billions), so
    its normalized float64 matrix broadcasts once via ray.put and
    every training batch takes one matmul + row-max — zero exchange,
    the corpus streams. Per-label flagged counts fold from per-batch
    partials. Float contract: same normalized-matmul-vs-
    list_cosine_similarity equivalence T5/T135 rely on (data is
    well-separated at τ; nearest observed margin ~1e-3). Above the
    broadcast gate the same shape runs IVF-bucketed (T21's path);
    that variant is approximate, so this entry stays gated instead of
    silently switching."""
    import pandas as pd

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])

    def eval_only(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_numpy()
        return b.filter(pa.array(ids % EVAL_SLICE_MOD == 0))

    evals = (ds.map_batches(eval_only, batch_format="pyarrow")
             .to_pandas())
    if len(evals) > EXACT_SWEEP_MAX_VECS:
        raise ValueError(
            "eval slice exceeds the broadcast gate "
            f"({len(evals)} > {EXACT_SWEEP_MAX_VECS}); run the "
            "IVF-bucketed variant (T21 path) for approximate "
            "decontamination at this size")
    emat = sim.normalize(np.stack(
        [np.asarray(v, np.float64) for v in evals["embedding"]])) \
        if len(evals) else np.empty((0, 0))
    eref = ray.put(emat)

    def score(b: pa.Table) -> pa.Table:
        ids = b.column("vec_id").to_numpy()
        keep = ids % EVAL_SLICE_MOD != 0
        lab = b.column("label").to_numpy().astype(np.int64)[keep]
        if not keep.any():
            return pa.Table.from_pydict({
                "label": pa.array([], pa.int64()),
                "n_train": pa.array([], pa.int64()),
                "n_contaminated": pa.array([], pa.int64())})
        m = sim.normalize(sim._mat(b.column("embedding")))[keep]
        em = sim.resolve_broadcast(eref, key="contam-eval")
        mx = (m @ em.T).max(axis=1) if em.size else np.zeros(len(m))
        df = pd.DataFrame({"label": lab,
                           "cont": (mx >= CONTAM_COS_MIN)
                           .astype(np.int64)})
        g = df.groupby("label", as_index=False).agg(
            n_train=("cont", "size"), n_contaminated=("cont", "sum"))
        return pa.Table.from_pandas(
            g.astype({"label": "int64", "n_train": "int64",
                      "n_contaminated": "int64"}),
            preserve_index=False)

    parts = (ds.map_batches(score, batch_format="pyarrow",
                            batch_size=512).to_pandas())
    out = parts.groupby("label", as_index=False).agg(
        n_train=("n_train", "sum"),
        n_contaminated=("n_contaminated", "sum"))
    return out.astype({"label": "int64", "n_train": "int64",
                       "n_contaminated": "int64"})


# --- T189: UT1-style host-blocklist filter ----------------------------

BLK_MOD = 7  # deterministic stand-in blocklist: a dot-suffix of the
             # host is blocked iff md5_number_upper('blk:'||sfx) % 7
             # == 0 (the real deployment broadcasts a curated list —
             # UT1/adult-domain style; the hash rule keeps the oracle
             # closed-form while exercising identical plumbing)


def q_url_host_rules(sf_dir: str):
    """Crawl-hygiene URL filter with SUBDOMAIN-AWARE host blocklists
    (the UT1-blocklist stage every CC pipeline runs before extraction;
    reference S5's url parse feeding a policy decision): a url is
    'blocked_domain' when ANY dot-boundary suffix of its host is on
    the blocklist (blocking 'example' blocks 'a.b.example' — suffix
    semantics, not equality), else 'flagged_path' when the path
    carries a flag segment ('/junk/'), else 'kept'. Reports per
    reason the url count and payload bytes (what the filter saves
    downstream). Pure map-side: per-batch the ≤L suffix hashes per
    UNIQUE domain (domains ≪ rows per batch), byte lengths counted in
    place — payloads never leave the read task; tiny 3-row fold."""
    import pandas as pd
    import pyarrow.compute as pc
    import re as _re

    from ..functions.textstats import _md5_u64

    files = expand_input_files(_corpus_dir())
    ds = ray.data.read_parquet(files, columns=["url", "html"])
    dom_re = _re.compile(r"https://([^/]+)/")

    def blocked(domain: str) -> bool:
        parts = domain.split(".")
        return any(
            _md5_u64(b"blk:" + ".".join(parts[i:]).encode()) % BLK_MOD
            == 0
            for i in range(len(parts)))

    def classify(b: pa.Table) -> pa.Table:
        urls = b.column("url").to_pylist()
        nb = pc.binary_length(b.column("html")).to_numpy() \
            .astype(np.int64)
        doms = [m.group(1) if (m := dom_re.search(u)) else ""
                for u in urls]
        blk_map = {d: blocked(d) for d in set(doms)}
        reasons = [
            "blocked_domain" if blk_map[d]
            else ("flagged_path" if "/junk/" in u else "kept")
            for u, d in zip(urls, doms)]
        g = pd.DataFrame({"reason": reasons, "nb": nb}).groupby(
            "reason", as_index=False).agg(
                n_urls=("nb", "size"), sum_bytes=("nb", "sum"))
        return pa.Table.from_pandas(
            g.astype({"n_urls": "int64", "sum_bytes": "int64"}),
            preserve_index=False)

    parts = ds.map_batches(classify, batch_format="pyarrow").to_pandas()
    out = parts.groupby("reason", as_index=False).agg(
        n_urls=("n_urls", "sum"), sum_bytes=("sum_bytes", "sum"))
    return (out.astype({"n_urls": "int64", "sum_bytes": "int64"})
            .sort_values("reason", kind="mergesort")
            .reset_index(drop=True))


# --- T190: Unicode NFC normalization audit ----------------------------


def q_nfc_audit(sf_dir: str):
    """Unicode NFC HYGIENE audit per language — the pre-tokenization
    check every multilingual corpus runs (decomposed accents — 'e' +
    U+0301 vs 'é' — split tokenizer vocab entries and break exact
    dedup across crawls that normalized differently): per lang the
    doc count, docs whose NFC form differs from the stored text, and
    the total char counts before/after NFC. stdlib
    unicodedata.normalize('NFC') mirrors DuckDB's utf8proc-backed
    nfc_normalize (both implement UAX #15 canonical composition;
    equality on the pinned crafted inputs is asserted in pytest —
    the ASCII sf corpus is trivially NFC-invariant, so the crafted
    table carries the real signal). Pure map-side per-batch combiner
    → ≤|langs| fold; zero exchange."""
    import unicodedata

    import pandas as pd

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def partial(b: pa.Table) -> pa.Table:
        langs = b.column("lang").to_pylist()
        rows = []
        for lang, t in zip(langs, b.column("text").to_pylist()):
            n = unicodedata.normalize("NFC", t)
            rows.append((lang, 1, int(n != t), len(t), len(n)))
        df = pd.DataFrame(rows, columns=[
            "lang", "n_docs", "n_changed", "sum_chars",
            "sum_nfc_chars"])
        g = df.groupby("lang", as_index=False).sum()
        return pa.Table.from_pandas(
            g.astype({"n_docs": "int64", "n_changed": "int64",
                      "sum_chars": "int64", "sum_nfc_chars": "int64"}),
            preserve_index=False)

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out = parts.groupby("lang", as_index=False).sum()
    return out.astype({"n_docs": "int64", "n_changed": "int64",
                       "sum_chars": "int64", "sum_nfc_chars": "int64"})


# --- T191: fuzzy train/eval contamination (cross-slice Jaccard) -------

FUZZY_EVAL_MOD = 10  # eval slice = doc_id % 10 == 0 (oracle-mirrored;
                     # wider than T32's BENCH_MOD=100 so the cross-pair
                     # set is non-trivial at every test sf)


def q_fuzzy_contamination(sf_dir: str):
    """FUZZY train/eval decontamination — the RefinedWeb/Dolma stage
    between T32 (exact 8-gram overlap) and T188 (embedding cosine):
    flag every TRAINING document whose shingle Jaccard with ANY
    eval-slice document reaches τ = 0.6, reporting the match count
    and max similarity (the keep-list input for a leakage-aware
    training run). Composes the prefix-filter exact-Jaccard join
    (T127 — exact, so the oracle is closed-form; LSH would trade
    that for recall) exactly as near_dup_clusters composes T2: the
    pair set is candidates ≪ corpus by the length/prefix filters,
    the cross-slice projection and per-train-doc rollup are a tiny
    map + fold on top. Exchange = the prefix join's posting rows;
    nothing new shuffles."""
    import pandas as pd

    pairs = _prefix_jaccard(sf_dir, use_df_order=False)
    df = pairs.to_pandas()  # verified-pair-sized (prefix-join contract)
    if not len(df):
        return pd.DataFrame({
            "doc_id": pd.Series(dtype="int64"),
            "n_eval_matches": pd.Series(dtype="int64"),
            "max_jaccard_micro": pd.Series(dtype="int64")})
    a = df["doc_id_a"].to_numpy(np.int64)
    b = df["doc_id_b"].to_numpy(np.int64)
    a_ev = a % FUZZY_EVAL_MOD == 0
    b_ev = b % FUZZY_EVAL_MOD == 0
    cross = a_ev != b_ev
    train = np.where(a_ev, b, a)[cross]
    jac = df["jaccard_micro"].to_numpy(np.int64)[cross]
    out = (pd.DataFrame({"doc_id": train, "jaccard_micro": jac})
           .groupby("doc_id", as_index=False)
           .agg(n_eval_matches=("jaccard_micro", "size"),
                max_jaccard_micro=("jaccard_micro", "max")))
    return out.astype({"doc_id": "int64", "n_eval_matches": "int64",
                       "max_jaccard_micro": "int64"})


# --- T192: sentence-level code-switch audit ---------------------------


def q_sentence_lang_mismatch(sf_dir: str):
    """CODE-SWITCH detection — per document, how many sentences the
    lang-ID heuristic assigns a DIFFERENT language than the document's
    stored label (mixed-language pages poison per-language corpora;
    this is the sentence-granular audit run before per-lang
    splitting). Composes T67's sentence explode with T8's lang-ID,
    both already SQL-mirrored: per doc the sentence count, sentences
    with a confident prediction (pred ≠ ''), mismatching confident
    sentences, and mismatch ppm over ALL sentences. Pure map-side
    (split + per-sentence marker scoring inside one batch pass, the
    lang tables warm per process); zero exchange."""
    from ..functions.textstats import lang_id

    ds = _read(sf_dir, "documents", ["doc_id", "text", "lang"])

    def audit(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id")
        langs = b.column("lang").to_pylist()
        rows = []
        for lang, t in zip(langs, b.column("text").to_pylist()):
            sents = [s for s in _SENT_RE.split(t) if s != ""]
            preds = [lang_id(s) for s in sents]
            n_pred = sum(1 for p in preds if p != "")
            n_mis = sum(1 for p in preds if p != "" and p != lang)
            ns = len(sents)
            rows.append((ns, n_pred, n_mis,
                         n_mis * 1_000_000 // ns if ns else 0))
        cols = list(zip(*rows)) if rows else [[]] * 4
        return pa.Table.from_pydict({
            "doc_id": ids,
            "lang": pa.array(langs, pa.string()),
            "n_sents": pa.array(cols[0], pa.int64()),
            "n_pred": pa.array(cols[1], pa.int64()),
            "n_mismatch": pa.array(cols[2], pa.int64()),
            "mismatch_ppm": pa.array(cols[3], pa.int64()),
        })

    return ds.map_batches(audit, batch_format="pyarrow")


# --- T193: session duration distribution ------------------------------


def q_session_duration_stats(sf_dir: str):
    """SESSION-DURATION distribution — the behavioral-metrics rollup
    OVER the derived windows T14 builds (a second-order aggregate:
    sessionize first, then summarize the sessions): count, exact
    discrete p50/p90 (quantile_disc semantics), floor-div mean and
    max of session length in µs, one output row. Same 30-min gap
    rule as user_sessions.

    Shape: user-hash co-partition (a timeline never splits) → per
    bucket ONE sort + vectorized gap/cumsum session ids + per-session
    min/max → per-bucket VALUE HISTOGRAM of durations (the T26/T131
    idiom: distinct (duration, n) rows shuffle, never the sessions) →
    driver fold over the tiny value domain in exact ints."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    nb = dd.derive_buckets(ds.count())

    def add_bucket(b: pa.Table) -> pa.Table:
        uid = b.column("user_id").to_numpy()
        return b.append_column(
            "bucket", pa.array((uid % nb).astype(np.int32)))

    def dur_hist(g):
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        prev = g.groupby("user_id")["ts"].shift()
        ns = prev.isna() | ((g["ts"] - prev) > pd.Timedelta(minutes=30))
        sid = ns.cumsum()  # unique per (user, session): user-sorted
        # explicit µs (inputs may arrive as ns- or µs-unit timestamps)
        us = g["ts"].astype("datetime64[us]").astype("int64")
        d = (pd.DataFrame({"sid": sid, "us": us})
             .groupby("sid")["us"].agg(["min", "max"]))
        dur = (d["max"] - d["min"]).to_numpy(np.int64)
        v, m = np.unique(dur, return_counts=True)
        return pd.DataFrame({"v": v.astype("int64"),
                             "m": m.astype("int64")})

    parts = (ds.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("bucket")
             .map_groups(dur_hist, batch_format="pandas")
             .to_pandas())
    hist = parts.groupby("v")["m"].sum().sort_index()
    vals = hist.index.to_numpy(np.int64)
    cnts = hist.to_numpy(np.int64)
    n = int(cnts.sum())
    if n == 0:
        return pd.DataFrame({
            "n_sessions": pd.Series([0], dtype="int64"),
            "p50_us": pd.Series([0], dtype="int64"),
            "p90_us": pd.Series([0], dtype="int64"),
            "mean_us": pd.Series([0], dtype="int64"),
            "max_us": pd.Series([0], dtype="int64")})
    cum = np.cumsum(cnts)

    def q_disc(q: float) -> int:
        import math

        k = math.ceil(q * n)  # 1-based rank, quantile_disc semantics
        return int(vals[np.searchsorted(cum, k)])

    total = int((vals * cnts).sum())
    return pd.DataFrame({
        "n_sessions": pd.Series([n], dtype="int64"),
        "p50_us": pd.Series([q_disc(0.5)], dtype="int64"),
        "p90_us": pd.Series([q_disc(0.9)], dtype="int64"),
        "mean_us": pd.Series([total // n], dtype="int64"),
        "max_us": pd.Series([int(vals[-1])], dtype="int64")})


# --- T194: intra-domain link ratio ------------------------------------


def q_intra_domain_link_ratio(sf_dir: str):
    """Crawl INSULARITY per domain — the fraction of a host's
    outgoing links that point back at itself (navigation-heavy
    template sites score high; link farms and hubs score low): per
    src domain the total outgoing links, self-links (dst == src) and
    self ppm. Rides the T115 edge scan contract (byte-transparent
    href scan, gzip rows excluded both sides); the aggregated edge
    set maps to (src, total, self) partials and a domain-hash
    bucketed reduce folds them — exchange O(unique edges), the
    domain axis never lands on the driver."""
    import pandas as pd

    edges = _link_edges(sf_dir)
    nb = 32

    def partial(b: pa.Table) -> pa.Table:
        df = b.to_pandas()
        df["self_links"] = np.where(
            df["src_domain"] == df["dst_domain"], df["n_links"], 0)
        g = df.groupby("src_domain", as_index=False).agg(
            n_links=("n_links", "sum"), self_links=("self_links", "sum"))
        g["bucket"] = pd.Series(
            [zlib.crc32(s.encode()) % nb for s in g["src_domain"]],
            dtype="int32")
        return pa.Table.from_pandas(g, preserve_index=False)

    def reduce_dom(g):
        s = g.groupby("src_domain", as_index=False).agg(
            n_links=("n_links", "sum"), self_links=("self_links", "sum"))
        s["self_ppm"] = (s["self_links"].to_numpy(np.int64) * 1_000_000
                         // s["n_links"].to_numpy(np.int64))
        return s.astype({"n_links": "int64", "self_links": "int64",
                         "self_ppm": "int64"})

    return (edges.map_batches(partial, batch_format="pyarrow")
            .groupby("bucket")
            .map_groups(reduce_dom, batch_format="pandas"))


# --- T195: hour-of-week traffic anomaly flags -------------------------

ANOM_K = 3  # flag buckets beyond K standard deviations (3σ rule)
HOW_BUCKETS = 168  # 7 days × 24 hours — the fixed calendar axis


def q_hourly_anomaly(sf_dir: str):
    """TRAFFIC-ANOMALY monitor over the hour-of-week profile — the
    pipeline-health check run before trusting a new events feed (a
    bucket 3σ above profile is a bot burst or replayed shard; 3σ
    below is an ingestion gap): per (dow, hour) bucket the event
    count and an EXACT-integer anomaly flag. No float sqrt anywhere:
    z² > K² ⟺ H·(H·c_b − S)² > K²·Σ_j(H·c_j − S)² with H=168 fixed,
    S=Σc — both sides exact in Python bigints (HUGEINT in the
    oracle), so the flag is equality-safe cross-engine. Empty buckets
    count 0 (the calendar grid is fixed, not observed). Shape:
    per-batch (bucket, n) combiner → 168-row driver fold; exchange
    O(batches·168), corpus never moves."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["ts"])

    def partial(df):
        dow = ((df["ts"].dt.dayofweek + 1) % 7).astype("int64")
        hb = dow * 24 + df["ts"].dt.hour.astype("int64")
        g = hb.value_counts()
        return pd.DataFrame({
            "hb": g.index.to_numpy(np.int64),
            "n": g.to_numpy(np.int64)})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    cnt = np.zeros(HOW_BUCKETS, np.int64)
    if len(parts):
        agg = parts.groupby("hb")["n"].sum()
        cnt[agg.index.to_numpy(np.int64)] = agg.to_numpy(np.int64)
    s_tot = int(cnt.sum())
    devs = [HOW_BUCKETS * int(c) - s_tot for c in cnt]
    ssq = sum(d * d for d in devs)
    flags = [HOW_BUCKETS * d * d > ANOM_K * ANOM_K * ssq for d in devs]
    hb = np.arange(HOW_BUCKETS, dtype=np.int64)
    return pd.DataFrame({
        "dow": hb // 24, "hour": hb % 24,
        "n_events": cnt,
        "anomalous": pd.Series(flags, dtype=bool)})


# --- T196: Pareto frontier / skyline query ----------------------------


def _skyline2(df):
    """Exact 2D MAXIMA (skyline) of a (x, y[, …]) frame: rows not
    dominated by any other row (q dominates p iff q.x ≥ p.x ∧
    q.y ≥ p.y with at least one strict; exact (x, y) duplicates never
    dominate each other, so all copies survive). O(n log n): per
    distinct x keep max y, sweep x DESC — a pair survives iff its y
    strictly exceeds every y at strictly greater x (the shifted
    cummax); rows survive iff their (x, ymax) pair does."""
    import pandas as pd

    gm = df.groupby("x")["y"].max().sort_index(ascending=False)
    prev = gm.cummax().shift(1, fill_value=np.iinfo(np.int64).min)
    keep = gm[gm > prev]
    pairs = pd.DataFrame({"x": keep.index.to_numpy(np.int64),
                          "y": keep.to_numpy(np.int64)})
    return df.merge(pairs, on=["x", "y"], how="inner")


def q_pareto_docs(sf_dir: str):
    """SKYLINE / Pareto-frontier query — the multi-objective
    curation pick ('docs that are long AND lexically rich, with no
    doc better on both axes') that no single ORDER BY expresses:
    maximize (n_tokens, n_distinct tokens). A doc is on the frontier
    iff no other doc is ≥ on both axes and > on one.

    Distributed shape: the LOCAL skyline is a sound combiner — a row
    dominated inside its own batch is dominated globally, and no
    global-frontier row can be eliminated locally, so global ⊆
    union(local). Each batch emits only its local frontier (expected
    O(log batch) rows for correlated axes), the driver runs the same
    exact sweep on the tiny union. The corpus never shuffles; no
    sort, no groupby. Tokenizer = shared textstats.tokens (the
    RE2-∩-Python whitespace contract every token oracle uses)."""
    import pandas as pd

    from ..functions import textstats as ts

    def partial(b: pa.Table) -> "pd.DataFrame":
        import pandas as pd

        texts = b.column("text").to_pylist()
        n_tok = np.empty(len(texts), np.int64)
        n_dis = np.empty(len(texts), np.int64)
        for i, t in enumerate(texts):
            toks = ts.tokens(t)
            n_tok[i] = len(toks)
            n_dis[i] = len(set(toks))
        df = pd.DataFrame({
            "doc_id": b.column("doc_id").to_numpy(),
            "x": n_tok, "y": n_dis})
        return _skyline2(df)

    cand = (_read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(partial, batch_format="pyarrow")
            .to_pandas())
    sky = _skyline2(cand).sort_values("doc_id", kind="mergesort")
    return pd.DataFrame({
        "doc_id": sky["doc_id"].to_numpy(np.int64),
        "n_tokens": sky["x"].to_numpy(np.int64),
        "n_distinct": sky["y"].to_numpy(np.int64)})


# --- T197: mutual information between two categorical axes ------------


def q_lang_source_mi(sf_dir: str):
    """MUTUAL INFORMATION between the corpus's two categorical axes
    (lang × source) — the data-mix diagnostic behind 'is source a
    proxy for language' (high MI ⇒ per-source sampling skews the
    language mix; T134's DSIR and T76's mixing assume it is low).
    Exact integers end-to-end: each cell contributes
    floor(n_xy·log2((N·n_xy)/(n_x·n_y))·10⁶) with the log2 argument
    formed as exact-bigint products converted once to double on both
    sides (libm-parity contract of T149/T159); MI terms can be
    NEGATIVE, so the UNDIVIDED term sum ships beside N (the
    T178/token_drift_kl rule dodging the floor-vs-truncate divide
    mismatch); the marginal entropies are nonnegative and divide
    normally. ONE (lang, source) count combiner — rides T80's cube
    exchange shape: O(batch-distinct cells), the corpus never
    shuffles; driver fold over the ≤|langs|·|sources| grid."""
    import pandas as pd

    ds = _read(sf_dir, "documents", ["lang", "source"])

    def partial(df):
        g = df.groupby(["lang", "source"], as_index=False).size()
        return g.rename(columns={"size": "n"}).astype({"n": "int64"})

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    cells = parts.groupby(["lang", "source"], as_index=False)["n"].sum()
    n_tot = int(cells["n"].sum())
    nx = cells.groupby("lang")["n"].sum()
    ny = cells.groupby("source")["n"].sum()
    mi_sum = 0
    for lang, source, n in cells.itertuples(index=False):
        n = int(n)
        num, den = n_tot * n, int(nx[lang]) * int(ny[source])
        mi_sum += int(np.floor(n * np.log2(float(num) / float(den))
                               * 1_000_000))
    h_lang = sum(int(np.floor(int(c) * np.log2(float(n_tot) / float(c))
                              * 1_000_000)) for c in nx) // n_tot
    h_src = sum(int(np.floor(int(c) * np.log2(float(n_tot) / float(c))
                             * 1_000_000)) for c in ny) // n_tot
    return pd.DataFrame({
        "n_docs": pd.Series([n_tot], dtype="int64"),
        "mi_sum_micro": pd.Series([mi_sum], dtype="int64"),
        "h_lang_micro": pd.Series([h_lang], dtype="int64"),
        "h_source_micro": pd.Series([h_src], dtype="int64")})


# --- T198: KMV (k-minimum-values) distinct / overlap sketch -----------

KMV_K = 128


def q_user_overlap_kmv(sf_dir: str):
    """KMV / theta-sketch SET-OVERLAP estimation — the sketch family's
    missing member next to HLL (T36, counts only): k-minimum-values
    sketches support UNION and INTERSECTION estimates, the 'how much
    do the click and purchase audiences overlap' question exact
    COUNT DISTINCT answers only with a full self-join. Because the
    hash is deterministic (md5_number_upper over 'kmv:'||user_id) and
    the k-min set is a pure function of the distinct-user SET, the
    estimates are partitioning-independent and carry a FULL SQL
    oracle — a sketch with a hash-exact correctness gate. Estimator:
    n̂ = (K−1)·2⁶⁴ // h_(K) when n > K else exact n; intersection via
    the union sketch's matched fraction ρ·n̂_union (exact when the
    union fits the sketch). Shape: per-batch distinct (user, side)
    flags → user-hash bucketed OR-reduce emits its counts plus ≤2K
    candidate rows (the union k-mins are a subset of the per-side
    k-mins) → driver folds ≤(2K+1)·buckets rows. Exchange
    O(batch-distinct users), corpus never moves."""
    import pandas as pd

    from ..functions.textstats import _md5_u64

    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    nb = dd.derive_buckets(ds.count())

    def partial(df):
        is_a = (df["event_type"] == "click").to_numpy()
        is_b = (df["event_type"] == "purchase").to_numpy()
        keep = is_a | is_b
        g = (pd.DataFrame({"user_id": df["user_id"].to_numpy(np.int64)[keep],
                           "in_a": is_a[keep], "in_b": is_b[keep]})
             .groupby("user_id", as_index=False).agg(
                 in_a=("in_a", "any"), in_b=("in_b", "any")))
        g["bucket"] = (g["user_id"] % nb).astype("int32")
        return g

    def reduce_bucket(g):
        u = g.groupby("user_id", as_index=False).agg(
            in_a=("in_a", "any"), in_b=("in_b", "any"))
        h = np.array([_md5_u64(f"kmv:{int(x)}".encode())
                      for x in u["user_id"]], np.uint64)
        in_a = u["in_a"].to_numpy()
        in_b = u["in_b"].to_numpy()
        order = np.argsort(h, kind="stable")
        cand = np.zeros(len(u), bool)
        cand[order[in_a[order]][:KMV_K]] = True
        cand[order[in_b[order]][:KMV_K]] = True
        return pd.DataFrame({
            "kind": ["cnt"] + ["cand"] * int(cand.sum()),
            "h": np.concatenate([[np.uint64(0)], h[cand]]).astype(np.uint64),
            "in_a": np.concatenate([[True], in_a[cand]]),
            "in_b": np.concatenate([[True], in_b[cand]]),
            "n_a": np.concatenate(
                [[int(in_a.sum())], np.zeros(int(cand.sum()), np.int64)]),
            "n_b": np.concatenate(
                [[int(in_b.sum())], np.zeros(int(cand.sum()), np.int64)]),
            "n_u": np.concatenate(
                [[len(u)], np.zeros(int(cand.sum()), np.int64)]),
        })

    rows = (ds.map_batches(partial, batch_format="pandas")
            .groupby("bucket")
            .map_groups(reduce_bucket, batch_format="pandas")
            .to_pandas())
    cnt = rows[rows["kind"] == "cnt"]
    n_a, n_b = int(cnt["n_a"].sum()), int(cnt["n_b"].sum())
    n_u = int(cnt["n_u"].sum())
    cand = rows[rows["kind"] == "cand"]

    def est(hs, n_exact):
        if n_exact <= KMV_K:
            return n_exact
        kth = int(sorted(int(x) for x in hs)[KMV_K - 1])
        return (KMV_K - 1) * (1 << 64) // kth

    est_a = est(cand.loc[cand["in_a"], "h"], n_a)
    est_b = est(cand.loc[cand["in_b"], "h"], n_b)
    est_u = est(cand["h"], n_u)
    hs = sorted((int(h), bool(a), bool(b)) for h, a, b in
                zip(cand["h"], cand["in_a"], cand["in_b"]))
    ku = hs[:KMV_K]
    c_both = sum(1 for _, a, b in ku if a and b)
    est_i = c_both if n_u <= KMV_K else c_both * est_u // KMV_K
    return pd.DataFrame({
        "n_click_users": pd.Series([n_a], dtype="int64"),
        "n_purchase_users": pd.Series([n_b], dtype="int64"),
        "n_union": pd.Series([n_u], dtype="int64"),
        "est_click": pd.Series([est_a], dtype="int64"),
        "est_purchase": pd.Series([est_b], dtype="int64"),
        "est_union": pd.Series([est_u], dtype="int64"),
        "est_intersection": pd.Series([est_i], dtype="int64")})


# --- T199: multi-touch attribution (windowed many-to-many credit) -----

MTA_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # 7-day lookback


def q_multi_touch_attribution(sf_dir: str):
    """LINEAR (multi-touch) ATTRIBUTION — the many-to-many windowed
    credit assignment next to T27's last-touch asof: every purchase
    counts the SAME USER's clicks in [t−7d, t) and splits credit
    equally (credit_ppm = 10⁶ // n when n > 0). Unlike the asof join
    (one winner per purchase) each click can back many purchases and
    each purchase many clicks — materializing the pair set is
    O(clicks·purchases) worst-case, so only the COUNT crosses
    anything: one events pass projects both roles into a shared
    user-hash exchange (click rows as 16-byte (user, ts); purchases
    keep their ids), per-bucket vectorized searchsorted against each
    user's sorted click timeline. Exchange O(click+purchase events),
    never the pair set."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    nb = dd.derive_buckets(ds.count())

    def partial(df):
        us = df["ts"].astype("datetime64[us]").astype("int64")
        uid = df["user_id"].to_numpy(np.int64)
        is_c = (df["event_type"] == "click").to_numpy()
        is_p = (df["event_type"] == "purchase").to_numpy()
        out = pd.DataFrame({
            "event_id": np.where(is_p, df["event_id"].to_numpy(np.int64),
                                 -1)[is_c | is_p],
            "user_id": uid[is_c | is_p],
            "ts_us": us[is_c | is_p]})
        out["bucket"] = (out["user_id"] % nb).astype("int32")
        return out

    def reduce_bucket(g):
        res = []
        for uid, grp in g.groupby("user_id"):
            pur = grp[grp["event_id"] >= 0]
            if not len(pur):
                continue
            cts = np.sort(grp.loc[grp["event_id"] < 0, "ts_us"]
                          .to_numpy(np.int64))
            t = pur["ts_us"].to_numpy(np.int64)
            n = (np.searchsorted(cts, t, side="left")
                 - np.searchsorted(cts, t - MTA_WINDOW_US, side="left"))
            res.append(pd.DataFrame({
                "event_id": pur["event_id"].to_numpy(np.int64),
                "user_id": np.full(len(pur), uid, np.int64),
                "n_touches": n.astype(np.int64)}))
        if not res:
            return pd.DataFrame({"event_id": pd.Series([], dtype="int64"),
                                 "user_id": pd.Series([], dtype="int64"),
                                 "n_touches": pd.Series([], dtype="int64")})
        out = pd.concat(res, ignore_index=True)
        return out

    out = (ds.map_batches(partial, batch_format="pandas")
           .groupby("bucket")
           .map_groups(reduce_bucket, batch_format="pandas"))

    def credit(df):
        n = df["n_touches"].to_numpy(np.int64)
        df["credit_ppm"] = np.where(n > 0, 1_000_000 // np.maximum(n, 1),
                                    0).astype(np.int64)
        return df

    return out.map_batches(credit, batch_format="pandas")


# --- T200: per-user run-length encoding (sequence compaction) ---------


def q_event_rle(sf_dir: str):
    """RUN-LENGTH ENCODING of each user's event-type SEQUENCE (ordered
    by ts, event_id) — the sequence-compaction view behind session
    replay and behavioral n-grams ('view view view click' → (view,3),
    (click,1)); the islands trick of T93 applied to ORDER runs rather
    than calendar days. Emits (user_id, run_idx, event_type, run_len).
    Shape: user-hash co-partition (a timeline never splits), ONE sort
    per bucket, run boundaries + lengths + per-user run indices all
    vectorized (diff / cumsum / groupby-cumcount); exchange is the
    (user, ts, event_id, type) projection, output ≤ input rows."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
    nb = dd.derive_buckets(ds.count())

    def partial(df):
        us = df["ts"].astype("datetime64[us]").astype("int64")
        out = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "ts_us": us,
            "event_id": df["event_id"].to_numpy(np.int64),
            "event_type": df["event_type"]})
        out["bucket"] = (out["user_id"] % nb).astype("int32")
        return out

    def reduce_bucket(g):
        g = g.sort_values(["user_id", "ts_us", "event_id"],
                          kind="mergesort")
        uid = g["user_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy()
        new_run = np.ones(len(g), bool)
        if len(g) > 1:
            new_run[1:] = (uid[1:] != uid[:-1]) | (et[1:] != et[:-1])
        starts = np.flatnonzero(new_run)
        lens = np.diff(np.append(starts, len(g)))
        r_uid = uid[starts]
        new_user = np.ones(len(starts), bool)
        if len(starts) > 1:
            new_user[1:] = r_uid[1:] != r_uid[:-1]
        # 1-based run index within each user
        idx = np.arange(len(starts), dtype=np.int64)
        idx = idx - np.maximum.accumulate(np.where(new_user, idx, -1)) + 1
        return pd.DataFrame({
            "user_id": r_uid,
            "run_idx": idx,
            "event_type": et[starts],
            "run_len": lens.astype(np.int64)})

    return (ds.map_batches(partial, batch_format="pandas")
            .groupby("bucket")
            .map_groups(reduce_bucket, batch_format="pandas"))


FEATURE_HASH_D = 64  # hashed feature dimensions (hashing trick)


def q_feature_hash_vectors(sf_dir: str):
    """FEATURE HASHING (the "hashing trick", Weinberger et al. 2009,
    ICML — public algorithm): each lowercased token hashes to one of
    FEATURE_HASH_D signed dimensions (dim = h % D, sign = bit 6 of h —
    the first bit independent of dim for D = 64) and the per-(doc, dim)
    signed counts are the sparse hashed feature vector, emitted as
    (doc_id, dim, weight) rows with zero-cancelled weights dropped.
    Entirely MAP-SIDE: a document is one row, so a per-batch pandas
    groupby finishes each vector — no shuffle at any corpus size.
    Token hash is the SQL-mirrorable md5 family
    (md5_number_upper('fh:' || tok)), so the oracle reproduces dims,
    signs, and collisions exactly."""
    import pandas as pd

    from ..functions.textstats import _md5_u64, tokens

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def partial(b: pa.Table) -> pa.Table:
        cache: dict[str, int] = {}
        ids: list[int] = []
        hs: list[int] = []
        for doc_id, text in zip(b.column("doc_id").to_pylist(),
                                b.column("text").to_pylist()):
            for t in tokens(text):
                t = t.lower()
                h = cache.get(t)
                if h is None:
                    h = _md5_u64(b"fh:" + t.encode("utf-8"))
                    cache[t] = h
                ids.append(doc_id)
                hs.append(h)
        ha = np.asarray(hs, np.uint64)
        df = pd.DataFrame({
            "doc_id": np.asarray(ids, np.int64),
            "dim": (ha % np.uint64(FEATURE_HASH_D)).astype(np.int64),
            "w": np.where((ha >> np.uint64(6)) & np.uint64(1), 1, -1)
                .astype(np.int64)})
        g = df.groupby(["doc_id", "dim"], as_index=False).agg(
            weight=("w", "sum"))
        g = g[g["weight"] != 0]
        return pa.Table.from_pydict({
            "doc_id": pa.array(g["doc_id"].to_numpy(np.int64), pa.int64()),
            "dim": pa.array(g["dim"].to_numpy(np.int64), pa.int64()),
            "weight": pa.array(g["weight"].to_numpy(np.int64), pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow")


TIME_WINDOW_US = 3_600_000_000  # RANGE frame width: 1 hour, in µs


def q_events_time_window(sf_dir: str):
    """Per-user trailing 1-HOUR time-RANGE window (SQL RANGE BETWEEN
    INTERVAL 1 HOUR PRECEDING AND CURRENT ROW — the value-based frame
    T68's ROWS frame cannot express; peers at the same ts are IN the
    frame, per the SQL standard). User-hash co-partition so a timeline
    never splits; per bucket ONE sort, then fully vectorized frame
    bounds: timestamps are offset per user-run so a single
    np.searchsorted over the bucket respects run boundaries, and the
    windowed sum is a prefix-sum difference. Micro-integer values keep
    the sum order-independent and exactly SQL-mirrorable."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])
    nb = dd.derive_buckets(ds.count())

    def partial(df):
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "user_id": df["user_id"].to_numpy(np.int64),
            "ts": df["ts"],
            "value_micro": _micro_int_col(df["value"]),
            "bucket": (df["user_id"].to_numpy(np.int64) % nb)
                .astype("int32"),
        })

    def reduce_bucket(g):
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        n = len(g)
        uid = g["user_id"].to_numpy(np.int64)
        ts = g["ts"].to_numpy("datetime64[us]").view(np.int64)
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        run_id = np.cumsum(new_user) - 1
        run_first = np.flatnonzero(new_user)
        rel = ts - ts[run_first][run_id]  # ≥0, nondecreasing per run
        # cumulative per-run offsets (NOT run_id · max_span: that
        # product overflows int64 once runs-per-bucket × the longest
        # user span passes 2⁶³; the cumulative form is bounded by the
        # SUM of spans ≈ total observed time mass per bucket)
        run_last = np.r_[run_first[1:] - 1, n - 1]
        spans = rel[run_last]  # rel is nondecreasing within a run
        offs = np.zeros(len(run_first), np.int64)
        if len(run_first) > 1:
            offs[1:] = np.cumsum(spans[:-1] + TIME_WINDOW_US + 2)
        adj = rel + offs[run_id]
        lo = np.searchsorted(adj, adj - TIME_WINDOW_US, side="left")
        hi = np.searchsorted(adj, adj, side="right")  # ts peers incl.
        csz = np.r_[0, np.cumsum(g["value_micro"].to_numpy(np.int64))]
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "user_id": uid,
            "win_sum_micro": (csz[hi] - csz[lo]).astype(np.int64),
            "win_n": (hi - lo).astype(np.int64),
        })

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


def q_vocab_growth(sf_dir: str):
    """HEAPS'-LAW vocabulary-growth curve (Heaps 1978 — public
    empirical law; the curve every corpus-scaling study plots):
    distinct TRIGRAM-shingle vocabulary as the corpus grows in doc_id
    order, reported per doc_id decile as (decile, new_terms,
    cum_vocab). The unit is the 3-token shingle — the unigram axis of
    a bounded-vocabulary corpus saturates in the first decile, while
    the shingle space keeps growing, which is what the curve is FOR.
    A term's decile is where it FIRST occurs, so the distributed form
    is a per-shingle min-doc_id reduce: batches emit (shingle_hash,
    batch-min doc_id) partials (combiner: one row per distinct shingle
    per batch), a hash-bucketed reduce takes the global min,
    per-bucket decile counts collapse to ≤10 rows each, and a tiny
    final Sum + driver cumsum closes the curve. Shingles travel ONLY
    as md5 int64 hashes (the SQL-mirrorable family — the oracle groups
    by the same hash, so even collisions agree)."""
    import pandas as pd

    from ..functions.textstats import _md5_u64, tokens

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    # footer-statistics max — no second scan (ADVICE r4)
    n_docs = _parquet_col_max(sf_dir, "documents", "doc_id") + 1
    nb = 32

    def partial(b: pa.Table) -> pa.Table:
        first: dict[int, int] = {}
        for doc_id, text in zip(b.column("doc_id").to_pylist(),
                                b.column("text").to_pylist()):
            toks = [t.lower() for t in tokens(text)]
            for i in range(len(toks) - 2):
                g = " ".join(toks[i:i + 3])
                h = _md5_u64(b"vg:" + g.encode("utf-8"))
                p = first.get(h)
                if p is None or doc_id < p:
                    first[h] = doc_id
        hs = np.fromiter(first.keys(), np.uint64, len(first))
        return pa.Table.from_pydict({
            "h": pa.array(hs.view(np.int64), pa.int64()),
            "first_doc": pa.array(list(first.values()), pa.int64()),
            "bucket": pa.array((hs % np.uint64(nb)).astype(np.int32),
                               pa.int32())})

    def reduce_bucket(g):
        fo = g.groupby("h", as_index=False).agg(
            first_doc=("first_doc", "min"))
        dec = (fo["first_doc"].to_numpy(np.int64) * 10) // n_docs
        out = pd.DataFrame({"decile": dec})
        return out.groupby("decile", as_index=False).agg(
            new_terms=("decile", "size"))

    small = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
        .groupby("decile")
        .aggregate(Sum("new_terms", alias_name="new_terms"))
        .to_pandas()
        .sort_values("decile")
        .reset_index(drop=True)
    )
    small["new_terms"] = small["new_terms"].astype(np.int64)
    small["cum_vocab"] = small["new_terms"].cumsum().astype(np.int64)
    return small


HITS_ITERS = 20


def q_hits_domains(sf_dir: str):
    """HITS hubs & authorities (Kleinberg 1999, JACM, "Authoritative
    sources in a hyperlinked environment" — public algorithm) over the
    weighted domain link graph. Same broadcast-vector power-iteration
    shape as q_pagerank_domains: per half-step the current vector
    ships ONCE via ray.put, edge batches emit weighted per-endpoint
    partials map-side (per-batch combiner), a per-key Sum closes the
    matvec — a = Aᵀh then h = Aa, each L2-normalized. Exchange is
    O(edges) per half-step; the edge Dataset is materialized exactly
    once and NEVER leaves the cluster — the node index is built
    distributed (per-batch distinct endpoints → per-domain first) and
    only the O(nodes) domain list reaches the driver, which is the
    broadcast-vector contract's own bound (at url granularity the
    vector becomes a Dataset and each half-step a hash join on the
    endpoint — the documented scale path). No SQL oracle (iterative
    float fixpoint, like PageRank/k-means); bounded by the pytest
    vs-dense-numpy test."""
    import pandas as pd

    edges = _link_edges(sf_dir).materialize()
    # distributed node index: O(edges) exchange of bare domain
    # strings, O(nodes) driver result (r4 verdict: never materialize
    # the edge list driver-side just to enumerate its endpoints)
    nodes = sorted(_endpoint_nodes(edges)["domain"])
    idx = {d: i for i, d in enumerate(nodes)}
    n = len(nodes)
    hubs = np.full(n, 1.0 / np.sqrt(n))
    auth = np.full(n, 1.0 / np.sqrt(n))

    def pass_factory(vref, in_col, out_col, tag):
        def contrib(b: pa.Table) -> pa.Table:
            v, ix = sim.resolve_broadcast(vref, key=tag)
            src = [ix[s] for s in b.column(in_col).to_pylist()]
            dst = [ix[d] for d in b.column(out_col).to_pylist()]
            w = np.asarray(b.column("n_links"), np.float64)
            df = pd.DataFrame({"k": np.asarray(dst, np.int64),
                               "c": v[src] * w})
            g = df.groupby("k", as_index=False).agg(c=("c", "sum"))
            return pa.Table.from_pydict(
                {"k": pa.array(g["k"].to_numpy(np.int64), pa.int64()),
                 "c": pa.array(g["c"].to_numpy(np.float64),
                               pa.float64())})
        return contrib

    def matvec(vec, in_col, out_col, tag):
        vref = ray.put((vec, idx))
        got = (
            edges.map_batches(pass_factory(vref, in_col, out_col, tag),
                              batch_format="pyarrow")
            .groupby("k")
            .aggregate(Sum("c", alias_name="c"))
        ).to_pandas()
        out = np.zeros(n, np.float64)
        out[got["k"].to_numpy(np.int64)] = got["c"].to_numpy(np.float64)
        return out

    for _ in range(HITS_ITERS):
        auth = matvec(hubs, "src_domain", "dst_domain", "hits-a")
        na = np.linalg.norm(auth)
        auth = auth / na if na else auth
        hubs = matvec(auth, "dst_domain", "src_domain", "hits-h")
        nh = np.linalg.norm(hubs)
        hubs = hubs / nh if nh else hubs

    return pd.DataFrame({
        "domain": nodes,
        "hub_ppb": np.floor(hubs / hubs.sum() * 1e9 + 0.5)
            .astype(np.int64),
        "auth_ppb": np.floor(auth / auth.sum() * 1e9 + 0.5)
            .astype(np.int64)})


# Loud-failure cap on h-index rounds. Convergence needs O(longest
# induced path) rounds on chain-like graphs (ADVICE r4: 64 was
# reachable on plausible web graphs); post-BSP a round costs one task
# wave over pre-packed CSR blocks, so the cap is generous.
KCORE_MAX_ROUNDS = 4096


@ray.remote
def _kcore_round_task(block: "pa.Table", c: np.ndarray):
    """One synchronous h-index round over a block of packed CSR
    buckets: for every node in the block, the new value is the
    H-index of its neighbors' current values (largest h with ≥ h
    neighbors valued ≥ h). Fully vectorized: one lexsort per block,
    per-segment rank compare, segment-max via reduceat. Returns only
    the CHANGED (node_id, new_value) pairs — the task wave's result
    is O(changes), not O(nodes)."""
    empty = (np.empty(0, np.int64), np.empty(0, np.int64))
    # Ray may emit schema-less empty blocks from a grouped exchange
    if block.num_rows == 0 or "nodes" not in block.schema.names:
        return empty
    out_nodes, out_vals = [], []
    ncol, pcol, bcol = (block.column("nodes"), block.column("indptr"),
                        block.column("nbrs"))
    for i in range(block.num_rows):
        nodes_u = np.asarray(ncol[i].values, np.int64)
        indptr = np.asarray(pcol[i].values, np.int64)
        nbrs = np.asarray(bcol[i].values, np.int64)
        if not len(nodes_u):
            continue
        v = c[nbrs]
        counts = np.diff(indptr)
        seg = np.repeat(np.arange(len(nodes_u)), counts)
        order = np.lexsort((-v, seg))
        sv = v[order]
        rank = np.arange(len(v), dtype=np.int64) - indptr[seg] + 1
        h = np.maximum.reduceat(np.where(sv >= rank, rank, 0),
                                indptr[:-1])
        mask = h != c[nodes_u]
        if mask.any():
            out_nodes.append(nodes_u[mask])
            out_vals.append(h[mask])
    if not out_nodes:
        return empty
    return (np.concatenate(out_nodes), np.concatenate(out_vals))


def q_domain_kcore(sf_dir: str):
    """K-CORE DECOMPOSITION (coreness per node) of the undirected
    domain graph — the graph-robustness / spam-nest peel every
    web-graph curation pass wants. H-INDEX FIXPOINT iteration (Lü,
    Chen, Ren, Zhang, Zhang & Zhou 2016, Nature Communications, "The
    H-index of a network node and its relation to degree and
    coreness" — public algorithm): c⁰ = degree; each round a node's
    value becomes the H-index of its neighbors' current values; the
    sequence is pointwise nonincreasing and converges EXACTLY to
    coreness (integer fixpoint, no tolerance). Distributed BSP form
    (r4-verdict task 6 — per-round Ray fixed cost was the wall-time
    at sf0.1, not data volume): the adjacency co-partitions ONCE by
    node-hash into packed CSR rows (one bucketed exchange total), the
    block refs pin in the object store, and each round is one wave of
    raw Ray tasks (the brief's sanctioned escape hatch for iterative
    fixpoints) computing per-node H-indices against the broadcast
    value vector — no per-round shuffle, result traffic O(changed
    nodes). Value vector + node index are driver-held (small-node-
    axis bound, same as PageRank/HITS; the url-granular scale path is
    a value join). Exact integer convergence probe (zero changes);
    loud RuntimeError at the round cap. No SQL oracle (iterative
    fixpoint, like PageRank/k-means); pytest pins it EQUAL to brute
    Matula–Beck peeling."""
    import pandas as pd

    und = _und_edges(sf_dir).materialize()
    degs = _degree_frame(und)
    nodes = sorted(degs["domain"])
    if not nodes:
        return pd.DataFrame({"domain": pd.Series([], dtype=object),
                             "coreness": pd.Series([], dtype="int64")})
    idx = {dname: i for i, dname in enumerate(nodes)}
    c = (degs.set_index("domain").loc[nodes, "deg"]
         .to_numpy(np.int64))
    nb = 32
    iref = ray.put(idx)

    def to_ids(df):
        ix = sim.resolve_broadcast(iref, key="kcore-idx")
        a = df["a"].map(ix).to_numpy(np.int64)
        b = df["b"].map(ix).to_numpy(np.int64)
        out = pd.DataFrame({"node": np.r_[a, b], "nbr": np.r_[b, a]})
        out["bucket"] = (out["node"] % nb).astype("int32")
        return out

    def csr_pack(g):
        g = g.sort_values(["node", "nbr"], kind="mergesort")
        nodes_u, counts = np.unique(g["node"].to_numpy(np.int64),
                                    return_counts=True)
        indptr = np.r_[0, np.cumsum(counts)].astype(np.int64)
        return pd.DataFrame({
            "nodes": [nodes_u.tolist()],
            "indptr": [indptr.tolist()],
            "nbrs": [g["nbr"].to_numpy(np.int64).tolist()]})

    packed = (
        und.map_batches(to_ids, batch_format="pandas")
        .groupby("bucket")
        .map_groups(csr_pack, batch_format="pandas")
    ).materialize()
    refs = packed.to_arrow_refs()

    for _ in range(KCORE_MAX_ROUNDS):
        cref = ray.put(c)
        futs = [_kcore_round_task.remote(r, cref) for r in refs]
        changed = 0
        new_c = c.copy()
        for nds, vals in ray.get(futs):
            changed += len(nds)
            new_c[nds] = vals
        if changed == 0:
            break
        c = new_c
    else:
        raise RuntimeError(
            f"k-core h-index fixpoint did not converge within "
            f"{KCORE_MAX_ROUNDS} rounds")

    return pd.DataFrame({
        "domain": nodes,
        "coreness": c.astype(np.int64)})


def q_degree_assortativity(sf_dir: str):
    """DEGREE ASSORTATIVITY (Newman 2002, Phys. Rev. Lett.,
    "Assortative mixing in networks" — public formula) of the
    undirected domain graph: the Pearson correlation between the
    degrees at the two ends of each edge — hub-to-hub wiring (r > 0)
    vs hub-to-leaf (r < 0), the link-farm topology signal.
    Exact-integer form: the edge-degree moment sums (m, Σjk, Σ(j+k),
    Σ(j²+k²)) accumulate as int64 single-row partials map-side (the
    degree map broadcasts once — small-node-axis bound) and r closes
    on the driver from 4 scalars with unbounded Python ints:
    r = (4m·Σjk − (Σ(j+k))²) / (2m·Σ(j²+k²) − (Σ(j+k))²), emitted as
    floor-divided ppm (0 on a degree-regular graph where the variance
    denominator is 0). The oracle mirrors through HUGEINT and the
    repo's floor-division emulation. Int64 moment bound: Σ(j²+k²) ≤
    2m·D² — lift the partials to per-shard Python ints before this
    overflows (documented, not hit at any test scale)."""
    import pandas as pd

    und = _und_edges(sf_dir).materialize()
    degs = _degree_frame(und)
    dref = ray.put(dict(zip(degs["domain"],
                            (int(x) for x in degs["deg"]))))

    def moments(b: pa.Table) -> pa.Table:
        d = sim.resolve_broadcast(dref, key="assort-deg")
        df = b.to_pandas()
        j = df["a"].map(d).to_numpy(np.int64)
        k = df["b"].map(d).to_numpy(np.int64)
        # loud int64 guard (ADVICE r4): the batch moment bound is
        # rows·D² — fail instead of wrapping silently; the fix at
        # that scale is Python-int accumulation per shard
        dmax = int(max(j.max(), k.max())) if len(df) else 0
        if len(df) * dmax * dmax >= (1 << 62):
            raise RuntimeError(
                "degree moments exceed the int64 batch bound "
                f"(rows={len(df)}, max_deg={dmax}); lift the partial "
                "sums to Python ints")
        return pa.Table.from_pydict({
            "m": pa.array([len(df)], pa.int64()),
            "s_jk": pa.array([int((j * k).sum())], pa.int64()),
            "s_sum": pa.array([int((j + k).sum())], pa.int64()),
            "s_sq": pa.array([int((j * j + k * k).sum())],
                             pa.int64())})

    # global fold in unbounded Python ints — one tiny row per batch,
    # so take_all is O(n_batches), never data-sized
    parts = und.map_batches(moments, batch_format="pyarrow").take_all()
    m = sum(int(r["m"]) for r in parts)
    s_jk = sum(int(r["s_jk"]) for r in parts)
    s_sum = sum(int(r["s_sum"]) for r in parts)
    s_sq = sum(int(r["s_sq"]) for r in parts)
    num = 4 * m * s_jk - s_sum * s_sum
    den = 2 * m * s_sq - s_sum * s_sum
    r_ppm = (num * 1_000_000) // den if den else 0
    return pd.DataFrame({
        "m": [np.int64(m)], "s_jk": [np.int64(s_jk)],
        "s_sum": [np.int64(s_sum)], "s_sq": [np.int64(s_sq)],
        "r_ppm": [np.int64(r_ppm)]})


def q_value_interp(sf_dir: str):
    """Two-sided LINEAR GAP INTERPOLATION (the imputation sibling of
    q_purchase_ffill's one-sided fill): every event gets a value
    interpolated between the user's surrounding PURCHASE values,
    position-weighted within the gap — interp = pvp + (pvn − pvp) ·
    (rn − rnp) // (rnn − rnp) over per-user row numbers, −1 sentinel
    outside the first/last purchase. Row-number weighting (not
    timestamp) keeps every product inside int64 at any scale
    (|Δvalue_micro| · events-per-user ≪ 2⁶³; a timestamp-weighted
    lerp would need 128-bit). Same physical plan as the other window
    ops: user-hash co-partition, one sort per bucket, vectorized
    groupwise ffill/bfill on exact float64 micro carriers (≤ 2⁵³).
    Floor-division semantics pinned on both sides (numpy
    floor_divide == Python // ; the oracle emulates floor with the
    repo's positive-modulus trick)."""
    import pandas as pd

    ds = _read(sf_dir, "events",
               ["event_id", "user_id", "ts", "event_type", "value"])
    nb = dd.derive_buckets(ds.count())

    def partial(df):
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "user_id": df["user_id"].to_numpy(np.int64),
            "ts": df["ts"],
            "is_p": df["event_type"].to_numpy() == "purchase",
            "value_micro": _micro_int_col(df["value"]),
            "bucket": (df["user_id"].to_numpy(np.int64) % nb)
                .astype("int32"),
        })

    def reduce_bucket(g):
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        n = len(g)
        uid = g["user_id"].to_numpy(np.int64)
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        run_id = np.cumsum(new_user) - 1
        run_first = np.flatnonzero(new_user)
        rn = np.arange(n, dtype=np.int64) - run_first[run_id] + 1
        is_p = g["is_p"].to_numpy(bool)
        pv = g["value_micro"].to_numpy(np.int64)
        grp = pd.Series(run_id)
        s_pv = pd.Series(np.where(is_p, pv.astype(np.float64), np.nan))
        s_rn = pd.Series(np.where(is_p, rn.astype(np.float64), np.nan))
        pvp = s_pv.groupby(grp).ffill()
        pvn = s_pv.groupby(grp).bfill()
        rnp = s_rn.groupby(grp).ffill()
        rnn = s_rn.groupby(grp).bfill()
        have = (pvp.notna() & pvn.notna()).to_numpy(bool)
        pvp_i = pvp.fillna(0).to_numpy(np.float64).astype(np.int64)
        pvn_i = pvn.fillna(0).to_numpy(np.float64).astype(np.int64)
        rnp_i = rnp.fillna(0).to_numpy(np.float64).astype(np.int64)
        rnn_i = rnn.fillna(0).to_numpy(np.float64).astype(np.int64)
        span = rnn_i - rnp_i
        num = (pvn_i - pvp_i) * (rn - rnp_i)
        lerp = pvp_i + np.floor_divide(num, np.where(span == 0,
                                                     1, span))
        interp = np.where(~have, -1,
                          np.where(span == 0, pvp_i, lerp))
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "user_id": uid,
            "interp_micro": interp.astype(np.int64)})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
    )


HARMONIC_MAX = 12  # BFS depth cap, pinned on both engine + oracle

# Above this node count the whole-adjacency broadcast flips to the
# frontier-join BFS (the CC_DRIVER_MAX_PAIRS cutover idiom); env-
# overridable so tests can force the distributed path on tiny graphs.
HARMONIC_BCAST_MAX_NODES = 2_000_000


def _harmonic_distributed(und):
    """Frontier-join multi-source BFS — the above-cutover form of
    harmonic centrality (q_domain_hops' frontier shape generalized to
    every source at once): adjacency, frontier and reached set stay
    Datasets end-to-end, nothing graph-sized touches the driver. Each
    depth d runs two bucketed reduces: (1) EXPAND — frontier and the
    once-materialized symmetric adjacency co-partition by node hash,
    a per-bucket merge emits (src, neighbor) candidates; (2) ANTI-
    JOIN — candidates and the reached set co-partition by (src, node)
    hash, per-bucket set-difference keeps first-time pairs, stamped
    depth=d. Exchange per round: O(frontier·avg_deg + reached). The
    reached set is the all-pairs-within-HARMONIC_MAX BFS output — its
    size IS the operator's inherent cost; sub-linear forms
    (HyperBall) are approximations and stay out of the exact op."""
    import pandas as pd

    nb = 32

    def sym(df):
        out = pd.DataFrame({
            "node": pd.concat([df["a"], df["b"]], ignore_index=True),
            "nbr": pd.concat([df["b"], df["a"]], ignore_index=True)})
        out["src"] = ""
        out["kind"] = np.int32(1)
        out["bucket"] = pd.Series(
            [zlib.crc32(s.encode()) % nb for s in out["node"]],
            index=out.index, dtype="int32")
        return out[["src", "node", "nbr", "kind", "bucket"]]

    adj = und.map_batches(sym, batch_format="pandas").materialize()

    def seed_rows(df):
        return pd.DataFrame({
            "src": df["domain"], "node": df["domain"],
            "depth": np.zeros(len(df), np.int64)})

    reached = (_degree_ds(und)
               .map_batches(seed_rows, batch_format="pandas")
               .materialize())
    frontier = reached

    def tag_frontier(df):
        return pd.DataFrame({
            "src": df["src"], "node": df["node"],
            "nbr": df["node"],  # unused on kind-0 rows
            "kind": np.zeros(len(df), np.int32),
            "bucket": pd.Series(
                [zlib.crc32(s.encode()) % nb for s in df["node"]],
                index=df.index, dtype="int32")})

    def expand(g):
        f = g[g["kind"] == 0]
        a = g[g["kind"] == 1]
        if not len(f) or not len(a):
            return pd.DataFrame({"src": pd.Series([], dtype=object),
                                 "node": pd.Series([], dtype=object)})
        m = f[["src", "node"]].merge(a[["node", "nbr"]], on="node")
        out = (m[["src", "nbr"]].drop_duplicates()
               .rename(columns={"nbr": "node"}))
        return out.reset_index(drop=True)

    def pair_bucket(df):
        df = df.copy()
        df["bucket"] = pd.Series(
            [zlib.crc32((s + "|" + n).encode()) % nb
             for s, n in zip(df["src"], df["node"])],
            index=df.index, dtype="int32")
        return df

    for d in range(1, HARMONIC_MAX + 1):
        cand = (
            frontier.map_batches(tag_frontier, batch_format="pandas")
            .union(adj)
            .groupby("bucket")
            .map_groups(expand, batch_format="pandas")
        )

        def tag_cand(df):
            out = df[["src", "node"]].copy()
            out["kind"] = np.int32(0)
            return pair_bucket(out)

        def tag_seen(df):
            out = df[["src", "node"]].copy()
            out["kind"] = np.int32(1)
            return pair_bucket(out)

        def newonly(g, _d=d):
            seen = set(zip(g.loc[g["kind"] == 1, "src"],
                           g.loc[g["kind"] == 1, "node"]))
            c = (g.loc[g["kind"] == 0, ["src", "node"]]
                 .drop_duplicates())
            keep = [t not in seen
                    for t in zip(c["src"], c["node"])]
            c = c[np.asarray(keep, bool)] if len(c) else c
            c = c.copy()
            c["depth"] = np.int64(_d)
            return c.reset_index(drop=True)

        new = (
            cand.map_batches(tag_cand, batch_format="pandas")
            .union(reached.map_batches(tag_seen,
                                       batch_format="pandas"))
            .groupby("bucket")
            .map_groups(newonly, batch_format="pandas")
        ).materialize()
        if new.count() == 0:
            break
        reached = reached.union(new).materialize()
        frontier = new

    def harm_partial(df):
        df = df[df["depth"] >= 1]
        w = 1_000_000 // df["depth"].to_numpy(np.int64)
        g = pd.DataFrame({"domain": df["src"], "n_reached": 1,
                          "harmonic_ppm": w}).groupby(
            "domain", as_index=False).sum()
        g["n_reached"] = g["n_reached"].astype("int64")
        g["harmonic_ppm"] = g["harmonic_ppm"].astype("int64")
        return g

    return (
        reached.map_batches(harm_partial, batch_format="pandas")
        .groupby("domain")
        .aggregate(Sum("n_reached", alias_name="n_reached"),
                   Sum("harmonic_ppm", alias_name="harmonic_ppm"))
    )


def q_harmonic_centrality(sf_dir: str):
    """HARMONIC CENTRALITY (Boldi & Vigna 2014, "Axioms for
    centrality" — the closeness variant that handles disconnected
    graphs) over the undirected domain graph: Σ 1/d(u, v) across
    reachable v ≠ u, emitted integer-exact as Σ (1000000 // d) so
    both sides agree bit-for-bit; depth capped at HARMONIC_MAX on
    engine AND oracle (part of the operator contract — web domain
    graphs have single-digit diameters). EMBARRASSINGLY PARALLEL
    multi-source BFS: the adjacency broadcasts ONCE (domain-granular
    small-node-axis bound, same as the PageRank vector) and the
    SOURCE axis is the Dataset — each batch of sources runs a local
    BFS against the broadcast graph, zero shuffle, exchange
    O(sources + results). Above HARMONIC_BCAST_MAX_NODES nodes
    (env-overridable) the whole-adjacency broadcast flips to
    _harmonic_distributed's frontier-join BFS — same results, nothing
    graph-sized on the driver (r4 verdict fix; the
    CC_DRIVER_MAX_PAIRS cutover idiom). The recursive-CTE oracle
    mirrors the same min-hop floor sums."""
    import pandas as pd

    limit = int(os.environ.get("HARMONIC_BCAST_MAX_NODES",
                               HARMONIC_BCAST_MAX_NODES))
    # materialized: the node-count probe and the chosen path both
    # consume the edge Dataset
    und = _und_edges(sf_dir).materialize()
    # O(nodes) probe decides the path BEFORE any driver transfer
    if _degree_ds(und).count() > limit:
        return _harmonic_distributed(und)
    epd = und.to_pandas()  # domain-granular: small axis
    adj: dict[str, set] = {}
    for a, b in zip(epd["a"], epd["b"]):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    aref = ray.put(adj)
    nodes = ray.data.from_pandas(
        pd.DataFrame({"domain": sorted(adj)}))

    def bfs(b: pa.Table) -> pa.Table:
        g = sim.resolve_broadcast(aref, key="harm-adj")
        doms, reached, harm = [], [], []
        for src in b.column("domain").to_pylist():
            seen = {src}
            frontier = {src}
            n_r = 0
            h = 0
            for d in range(1, HARMONIC_MAX + 1):
                nxt = set()
                for u in frontier:
                    nxt |= g[u]
                nxt -= seen
                if not nxt:
                    break
                seen |= nxt
                n_r += len(nxt)
                h += (1_000_000 // d) * len(nxt)
                frontier = nxt
            doms.append(src)
            reached.append(n_r)
            harm.append(h)
        return pa.Table.from_pydict({
            "domain": pa.array(doms, pa.string()),
            "n_reached": pa.array(reached, pa.int64()),
            "harmonic_ppm": pa.array(harm, pa.int64())})

    return nodes.map_batches(bfs, batch_format="pyarrow")


PATH_TOP_K = 20  # top event-type trigram paths


def q_event_path_trigrams(sf_dir: str):
    """SEQUENTIAL-PATTERN MINING over ordered event streams: the
    top-K consecutive event-type TRIPLES (e1→e2→e3) across all user
    timelines — the length-3 extension of T43's transition matrix
    (SQL lead(,1)/lead(,2) window shape). User-hash co-partition so a
    timeline never splits; per bucket one sort, vectorized triple
    assembly from shifted arrays masked at user-run boundaries, a
    per-batch combiner (the event-type alphabet is tiny, so the
    per-bucket partial is ≤ |types|³ rows), a small global Sum, and a
    deterministic (count desc, then lexicographic) top-K."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts",
                                  "event_type"])
    nb = dd.derive_buckets(ds.count())

    def partial(df):
        return pd.DataFrame({
            "event_id": df["event_id"].to_numpy(np.int64),
            "user_id": df["user_id"].to_numpy(np.int64),
            "ts": df["ts"],
            "event_type": df["event_type"],
            "bucket": (df["user_id"].to_numpy(np.int64) % nb)
                .astype("int32"),
        })

    def reduce_bucket(g):
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        n = len(g)
        if n < 3:
            return pd.DataFrame({"e1": pd.Series([], dtype=object),
                                 "e2": pd.Series([], dtype=object),
                                 "e3": pd.Series([], dtype=object),
                                 "n": pd.Series([], dtype="int64")})
        uid = g["user_id"].to_numpy(np.int64)
        et = g["event_type"].to_numpy(object)
        ok = (uid[:-2] == uid[1:-1]) & (uid[1:-1] == uid[2:])
        out = pd.DataFrame({"e1": et[:-2][ok], "e2": et[1:-1][ok],
                            "e3": et[2:][ok]})
        return out.groupby(["e1", "e2", "e3"], as_index=False).agg(
            n=("e1", "size"))

    small = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
        .groupby(["e1", "e2", "e3"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    small["n"] = small["n"].astype(np.int64)
    small = small.sort_values(["n", "e1", "e2", "e3"],
                              ascending=[False, True, True, True],
                              kind="mergesort")
    return small.head(PATH_TOP_K).reset_index(drop=True)


def q_weighted_median_price(sf_dir: str):
    """Exact WEIGHTED MEDIAN (lower median: smallest value whose
    cumulative weight reaches half the total) of the lineitem price
    weighted by quantity, per return flag — the robust-center
    aggregate percentile_cont can't express with weights. Two-level
    exact reduce: per-batch (flag, cents) weight partials (combiner —
    the distinct-price axis, not rows, is what shuffles), per-flag
    merge + cumulative-weight scan inside one map_groups, integer
    cents so both sides agree bit-for-bit (2·cum ≥ tot avoids the
    half-integer)."""
    import pandas as pd

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_extendedprice", "l_quantity"])

    def partial(df):
        out = pd.DataFrame({
            "flag": df["l_returnflag"],
            "cents": _cents_col(df["l_extendedprice"]),
            # round-half-up, mirrored by the oracle's floor(q + 0.5)
            # (plain int64 cast would TRUNCATE while SQL CAST rounds)
            "qty": np.floor(df["l_quantity"].to_numpy(np.float64)
                            + 0.5).astype(np.int64),
        })
        return out.groupby(["flag", "cents"], as_index=False).agg(
            wt=("qty", "sum"))

    def wmedian(g):
        flag = g["flag"].iloc[0]
        m = g.groupby("cents", as_index=False).agg(wt=("wt", "sum")) \
            .sort_values("cents", kind="mergesort")
        cum = m["wt"].cumsum().to_numpy(np.int64)
        tot = int(cum[-1])
        i = int(np.searchsorted(2 * cum, tot, side="left"))
        return pd.DataFrame({
            "flag": [flag],
            "wmedian_cents": [np.int64(m["cents"].iloc[i])],
            "total_qty": [np.int64(tot)]})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("flag")
        .map_groups(wmedian, batch_format="pandas")
    )


# --- T213: per-document n-gram novelty -------------------------------


def q_ngram_novelty(sf_dir: str):
    """PER-DOCUMENT N-GRAM NOVELTY — the memorization-risk twin of
    T46's corpus-level dup-gram mass: for every doc, the fraction of
    its DISTINCT lowercase word-trigrams that occur in NO other
    document (corpus df == 1), as novelty_ppm = n_unique·10⁶ //
    n_grams — the score a curation pass reads to find boilerplate-
    heavy (low) vs memorization-risk one-off (high) documents.
    Distributed shape: per-batch per-doc DISTINCT (gram-hash, doc_id)
    pairs (set-combiner — a doc lives in one row, so pairs are
    globally distinct by construction) → ONE gram-hash bucketed
    exchange where each bucket computes df per hash (a hash lives in
    exactly one bucket) and collapses to per-doc (n_grams, n_unique)
    partials → a doc-keyed Sum closes. Exchange O(distinct pairs),
    then O(docs); grams travel only as md5 int64 hashes
    (md5_number_upper family — even collisions agree on both
    sides)."""
    import pandas as pd

    from ..functions.textstats import _md5_u64, tokens

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    nb = 64

    def partial(b: pa.Table) -> pa.Table:
        hs: list[int] = []
        dids: list[int] = []
        for doc_id, text in zip(b.column("doc_id").to_pylist(),
                                b.column("text").to_pylist()):
            toks = [t.lower() for t in tokens(text)]
            seen = set()
            for i in range(len(toks) - 2):
                seen.add(_md5_u64(
                    b"nv:" + " ".join(toks[i:i + 3]).encode("utf-8")))
            hs.extend(seen)
            dids.extend([doc_id] * len(seen))
        ha = np.array(hs, np.uint64)
        return pa.Table.from_pydict({
            "h": pa.array(ha.view(np.int64), pa.int64()),
            "doc_id": pa.array(dids, pa.int64()),
            "bucket": pa.array((ha % np.uint64(nb)).astype(np.int32),
                               pa.int32())})

    def reduce_bucket(g):
        df = g.groupby("h")["h"].transform("size")
        out = pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(np.int64),
            "n_grams": np.ones(len(g), np.int64),
            "n_unique": (df.to_numpy(np.int64) == 1).astype(np.int64)})
        s = out.groupby("doc_id", as_index=False).sum()
        # re-key the per-doc partials by doc hash for the close (a
        # doc lives in exactly one close bucket)
        s["b2"] = (s["doc_id"].to_numpy(np.int64) % 32).astype(np.int32)
        return s

    def close(g):
        s = g.groupby("doc_id", as_index=False).agg(
            n_grams=("n_grams", "sum"), n_unique=("n_unique", "sum"))
        ng = s["n_grams"].to_numpy(np.int64)
        nu = s["n_unique"].to_numpy(np.int64)
        s["novelty_ppm"] = nu * 1_000_000 // ng
        return s[["doc_id", "n_grams", "n_unique", "novelty_ppm"]].astype(
            {"n_grams": "int64", "n_unique": "int64",
             "novelty_ppm": "int64"})

    # NOTE: the per-doc rollup is a bucketed map_groups, NOT a
    # groupby(doc_id).aggregate — Ray's sort-based aggregate measured
    # 13.3 s for the 5000-key close where the bucketed reduce runs in
    # ~1 s (the repo's standard many-key-rollup idiom)
    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(reduce_bucket, batch_format="pandas")
        .groupby("b2")
        .map_groups(close, batch_format="pandas")
    )


# --- T214: recency-decayed activity mass -----------------------------


def q_event_decay_mass(sf_dir: str):
    """RECENCY-DECAY WEIGHTING per user — the temporal-curation
    weight (DataComp-style freshness bias) every crawl-refresh
    sampler wants: each event carries weight 10⁶ // (1 + age_days)
    relative to the corpus's newest event, and users roll up to
    (n_events, decay_mass) — integer-exact, so both sides agree
    bit-for-bit. Shape: one O(1)-row max-ts pre-pass (column-pruned),
    then map-side per-batch per-user partials → a user-hash bucketed
    rollup (the many-key close idiom — never a sort-based
    groupby(user).aggregate)."""
    import pandas as pd

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    max_us = int(pd.Timestamp(
        _read(sf_dir, "events", ["ts"]).max("ts")).value // 1000)
    nb = 32

    def partial(df):
        ts = df["ts"].to_numpy("datetime64[us]").astype(np.int64)
        age_days = (max_us - ts) // US_PER_DAY
        w = 1_000_000 // (1 + age_days)
        out = pd.DataFrame({
            "user_id": df["user_id"].to_numpy(np.int64),
            "n_events": np.ones(len(df), np.int64),
            "decay_mass": w})
        s = out.groupby("user_id", as_index=False).sum()
        s["bucket"] = (s["user_id"].to_numpy(np.int64) % nb) \
            .astype(np.int32)
        return s

    def close(g):
        s = g.groupby("user_id", as_index=False).agg(
            n_events=("n_events", "sum"),
            decay_mass=("decay_mass", "sum"))
        return s.astype({"user_id": "int64", "n_events": "int64",
                         "decay_mass": "int64"})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bucket")
        .map_groups(close, batch_format="pandas")
    )


# ---------------------------------------------------------------- registry


def queries() -> dict:
    # ORDER MATTERS: the driver's per-round CORRECTNESS check takes the
    # FIRST ~50 entries of this dict, so entries are sorted by
    # verification need — (1) flagship (extraction core changed this
    # round: formula blocks, AES-256 PDFs, JPEG pixel decode), (2) the
    # r4-verdict backlog of never-driver-sampled keys (impl-changing
    # ones first), (3) changed-this-round but already driver-green,
    # (4) least-recently driver-checked. Reorder each round.
    return {
        # -- (1) flagship: extraction core changed this round --------
        "extract_pipeline": q_extract_pipeline,
        "extract_error_stats": q_extract_error_stats,
        # -- (1b) NEW this round, never checked ----------------------
        "ocr_text": q_ocr_text,
        "ngram_novelty": q_ngram_novelty,
        "event_decay_mass": q_event_decay_mass,
        # -- (2) NEVER driver-sampled in r1–r4 (VERDICT r4 task 1);
        # first two also have impl changes this round ----------------
        "domain_clustering": q_domain_clustering,
        "kmeans_embeddings": q_kmeans_embeddings,
        "cheapest_supplier": q_cheapest_supplier,
        "returned_priority_counts": q_returned_priority_counts,
        "small_qty_revenue": q_small_qty_revenue,
        "top_suppliers": q_top_suppliers,
        "idle_rich_customers": q_idle_rich_customers,
        "brand_supplier_counts": q_brand_supplier_counts,
        "domain_link_agg": q_domain_link_agg,
        "geo_mean_value": q_geo_mean_value,
        "bpe_vocab": q_bpe_vocab,
        "hard_negatives": q_hard_negatives,
        "class_balance_plan": q_class_balance_plan,
        "filtered_revenue": q_filtered_revenue,
        "important_parts": q_important_parts,
        "nation_trade_volume": q_nation_trade_volume,
        "market_share": q_market_share,
        "returned_items": q_returned_items,
        "customer_order_dist": q_customer_order_dist,
        "bracket_revenue": q_bracket_revenue,
        "incremental_dedup": q_incremental_dedup,
        "token_entropy": q_token_entropy,
        "pii_scrub": q_pii_scrub,
        "training_shuffle": q_training_shuffle,
        "order_revenue_join": q_order_revenue_join,
        "big_orders": q_big_orders,
        "bloom_semi_join": q_bloom_semi_join,
        "event_density": q_event_density,
        "nation_order_avg": q_nation_order_avg,
        "sentence_split": q_sentence_split,
        "moving_sum": q_moving_sum,
        "revenue_share": q_revenue_share,
        "top_event_type": q_top_event_type,
        "events_daily_pivot": q_events_daily_pivot,
        "nation_parties": q_nation_parties,
        "inactive_customers": q_inactive_customers,
        "distinct_users": q_distinct_users,
        "user_event_types": q_user_event_types,
        "click_no_purchase_days": q_click_no_purchase_days,
        "click_and_purchase_days": q_click_and_purchase_days,
        "distinct_users_hll": q_distinct_users_hll,
        "label_centroids": q_label_centroids,
        "vector_stats": q_vector_stats,
        "new_users_daily": q_new_users_daily,
        "heavy_hitters_cms": q_heavy_hitters_cms,
        "lang_confusion": q_lang_confusion,
        "zipf_slope": q_zipf_slope,
        "char_diversity": q_char_diversity,
        "bpe_pair_merge": q_bpe_pair_merge,
        "local_supplier_volume": q_local_supplier_volume,
        "link_domains": q_link_domains,
        "domain_degrees": q_domain_degrees,
        "reciprocal_links": q_reciprocal_links,
        "pagerank_domains": q_pagerank_domains,
        "dataset_split": q_dataset_split,
        "domain_triangles": q_domain_triangles,
        "domain_components": q_domain_components,
        "domain_hops": q_domain_hops,
        "sorted_neighborhood_dups": q_sorted_neighborhood_dups,
        "mad_outliers": q_mad_outliers,
        "peak_concurrency": q_peak_concurrency,
        "anchor_texts": q_anchor_texts,
        "charset_audit": q_charset_audit,
        "containment_dups": q_containment_dups,
        "prefix_jaccard_dups": q_prefix_jaccard_dups,
        "inverted_index": q_inverted_index,
        "purchase_ffill": q_purchase_ffill,
        "in_transit_daily": q_in_transit_daily,
        "dsir_weights": q_dsir_weights,
        "srp_embedding_dups": q_srp_embedding_dups,
        "substring_dup_spans": q_substring_dup_spans,
        "quality_lr": q_quality_lr,
        "q21_waiting_suppliers": q_q21_waiting_suppliers,
        "value_quantiles_cont": q_value_quantiles_cont,
        "sliding_distinct_users": q_sliding_distinct_users,
        "sentence_dedup": q_sentence_dedup,
        "doc_chunks": q_doc_chunks,
        "embedding_outliers": q_embedding_outliers,
        "oov_rate": q_oov_rate,
        "audio_decode": q_audio_decode,
        "audio_features": q_audio_features,
        "substring_scan": q_substring_scan,
        "dedup_keep_best": q_dedup_keep_best,
        "asof_last_order": q_asof_last_order,
        "lineitem_unpivot": q_lineitem_unpivot,
        "nation_revenue": q_nation_revenue,
        "lang_median_chars": q_lang_median_chars,
        "rare_token_score": q_rare_token_score,
        "active_streaks": q_active_streaks,
        "cohort_retention": q_cohort_retention,
        "promo_revenue": q_promo_revenue,
        "latest_order_per_customer": q_latest_order_per_customer,
        "revenue_mom": q_revenue_mom,
        "bigram_pmi": q_bigram_pmi,
        "value_variance": q_value_variance,
        "price_date_cov": q_price_date_cov,
        "lang_source_cube": q_lang_source_cube,
        "ntile_deciles": q_ntile_deciles,
        "next_event_gap": q_next_event_gap,
        "salted_user_join": q_salted_user_join,
        "normalized_dedup": q_normalized_dedup,
        "event_cooccurrence": q_event_cooccurrence,
        "orders_page": q_orders_page,
        "dense_order_grid": q_dense_order_grid,
        "label_pair_sim": q_label_pair_sim,
        "fuzzy_prefix_dups": q_fuzzy_prefix_dups,
        "sample_k_per_lang": q_sample_k_per_lang,
        "window_dedup": q_window_dedup,
        "dataset_mix": q_dataset_mix,
        # -- (3) impl changed this round, driver-green in r4 ---------
        "hits_domains": q_hits_domains,
        "harmonic_centrality": q_harmonic_centrality,
        "domain_kcore": q_domain_kcore,
        "vocab_growth": q_vocab_growth,
        "degree_assortativity": q_degree_assortativity,
        # -- (4) driver-green in some prior round, unchanged ---------
        "feature_hash_vectors": q_feature_hash_vectors,
        "events_time_window": q_events_time_window,
        "value_interp": q_value_interp,
        "event_path_trigrams": q_event_path_trigrams,
        "weighted_median_price": q_weighted_median_price,
        "pareto_docs": q_pareto_docs,
        "lang_source_mi": q_lang_source_mi,
        "user_overlap_kmv": q_user_overlap_kmv,
        "multi_touch_attribution": q_multi_touch_attribution,
        "event_rle": q_event_rle,
        "session_duration_stats": q_session_duration_stats,
        "intra_domain_link_ratio": q_intra_domain_link_ratio,
        "hourly_anomaly": q_hourly_anomaly,
        "nfc_audit": q_nfc_audit,
        "fuzzy_contamination": q_fuzzy_contamination,
        "sentence_lang_mismatch": q_sentence_lang_mismatch,
        "gopher_rules": q_gopher_rules,
        "domain_gini": q_domain_gini,
        "padding_waste": q_padding_waste,
        "embedding_contamination": q_embedding_contamination,
        "url_host_rules": q_url_host_rules,
        "bigram_lm_nll": q_bigram_lm_nll,
        "cluster_reps": q_cluster_reps,
        "nation_year_profit": q_nation_year_profit,
        "ship_delay_modes": q_ship_delay_modes,
        "excess_suppliers": q_excess_suppliers,
        "uniform_sample_k": q_uniform_sample_k,
        "quality_calibration": q_quality_calibration,
        "weighted_sample_k": q_weighted_sample_k,
        "funnel_conversion": q_funnel_conversion,
        "column_profile": q_column_profile,
        "embedding_covariance": q_embedding_covariance,
        "bpe_encode_counts": q_bpe_encode_counts,
        "fk_integrity": q_fk_integrity,
        "token_drift_kl": q_token_drift_kl,
        "winsorized_value_mean": q_winsorized_value_mean,
        "regex_token_counts": q_regex_token_counts,
        "value_mad": q_value_mad,
        "global_row_ids": q_global_row_ids,
        "user_entropy": q_user_entropy,
        "embedded_image_stats": q_embedded_image_stats,
        "kcenter_coreset": q_kcenter_coreset,
        "embedding_quantize": q_embedding_quantize,
        "multimodal_features": q_multimodal_features,
        "multimodal_resize": q_multimodal_resize,
        "frame_sample": q_frame_sample,
        "dup_gram_mass": q_dup_gram_mass,
        "pricing_summary": q_pricing_summary,
        "top_customers": q_top_customers,
        "embeddings_by_label": q_embeddings_by_label,
        "knn_cosine": q_knn_cosine,
        "ann_ivf": q_ann_ivf,
        "multimodal_decode": q_multimodal_decode,
        "ngram_top20": q_ngram_top20,
        "ngram_top20_mg": q_ngram_top20_mg,
        "token_counts": q_token_counts,
        "quality_scores": q_quality_scores,
        "term_scrub": q_term_scrub,
        "repetition_stats": q_repetition_stats,
        "benchmark_contamination": q_benchmark_contamination,
        "sequence_pack": q_sequence_pack,
        "tfidf_top_terms": q_tfidf_top_terms,
        "domain_stats": q_domain_stats,
        "doc_stats_by_lang": q_doc_stats_by_lang,
        "lang_source_rollup": q_lang_source_rollup,
        "lang_id": q_lang_id,
        "exact_dedup": q_exact_dedup,
        "doc_fingerprints": q_doc_fingerprints,
        "minhash_dup_pairs": q_minhash_dup_pairs,
        "near_dup_clusters": q_near_dup_clusters,
        "ngram_jaccard_dups": q_ngram_jaccard_dups,
        "simhash_near_dups": q_simhash_near_dups,
        "embedding_near_dups": q_embedding_near_dups,
        "embedding_near_dups_ivf": q_embedding_near_dups_ivf,
        "hash_sample": q_hash_sample,
        "stratified_sample": q_stratified_sample,
        "sample_exact_k": q_sample_exact_k,
        "per_lang_top5": q_per_lang_top5,
        "source_cap": q_source_cap,
        "weighted_sample": q_weighted_sample,
        "corpus_curation": q_corpus_curation,
        "latest_orders": q_latest_orders,
        "filter_regex": q_filter_regex,
        "events_hourly": q_events_hourly,
        "events_sliding": q_events_sliding,
        "props_json_stats": q_props_json_stats,
        "events_by_dow": q_events_by_dow,
        "value_quantiles": q_value_quantiles,
        "value_quantiles_sketch": q_value_quantiles_sketch,
        "purchase_attribution": q_purchase_attribution,
        "event_value_bands": q_event_value_bands,
        "user_sessions": q_user_sessions,
        "user_first_last": q_user_first_last,
        "event_transitions": q_event_transitions,
        "funnel_users": q_funnel_users,
        "user_running_total": q_user_running_total,
        "retained_users": q_retained_users,
        "percentile_rank": q_percentile_rank,
        "user_customer_outer": q_user_customer_outer,
        "length_outliers": q_length_outliers,
    }


_STOP_SQL = "('the','a','and','of','to')"

# exact-Jaccard pair set (τ=0.7) over word-3-gram shingles — the
# shared CTE body behind the minhash_dup_pairs and near_dup_clusters
# oracles; tokenization/short-doc semantics mirror textstats.shingles()
_MINHASH_PAIRS_CTE = """
        toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x <> '') AS tk
          FROM documents
        ),
        sh AS (
          -- 1-2-token docs get one whole-text shingle, mirroring
          -- textstats.shingles()'s short-doc branch exactly
          SELECT DISTINCT doc_id,
                 tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS shingle
          FROM toks, unnest(range(1, len(tk) - 1)) AS t(i)
          WHERE len(tk) >= 3
          UNION
          SELECT doc_id, array_to_string(tk, ' ') AS shingle
          FROM toks WHERE len(tk) BETWEEN 1 AND 2
        ),
        sized AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        co AS (
          SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
          FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          GROUP BY ia, ib
        ),
        mpairs AS (
          SELECT ia AS doc_id_a, ib AS doc_id_b,
                 CAST((c * 1000000) // (sa.n + sb.n - c) AS BIGINT)
                     AS jaccard_micro
          FROM co
          JOIN sized sa ON co.ia = sa.doc_id
          JOIN sized sb ON co.ib = sb.doc_id
          WHERE (c * 1000000) // (sa.n + sb.n - c) >= 700000
        )"""


def _lang_pred_sql(src: str, keys: tuple[str, ...] = ("doc_id",),
                   text_col: str = "text") -> str:
    """Build a lang-prediction SELECT over ANY (keys…, text) relation
    from the SAME marker tables the Python heuristic uses
    (functions/textstats._LANG_MARKERS) — one source of truth;
    tie-break = first language in ascending name order with the max
    score, exactly the Python scan order. ``src`` may be a table name
    or a parenthesized subquery; the T192 sentence audit reuses this
    with (doc_id, sent_idx) keys over the exploded sentence
    relation."""
    from ..functions.textstats import _LANG_MARKERS

    langs = sorted(_LANG_MARKERS)
    kl = ", ".join(keys)

    def markers(lang: str) -> str:
        return "(" + ",".join(f"'{w}'" for w in sorted(_LANG_MARKERS[lang])) + ")"

    scores = ",\n               ".join(
        f"len(list_filter(toks, t -> t IN {markers(l)})) AS s_{l}"
        for l in langs
    )
    best = "greatest(" + ",".join(f"s_{l}" for l in langs) + ")"
    pick = ("CASE "
            + " ".join(f"WHEN s_{l} = {best} THEN '{l}'" for l in langs)
            + " END")
    return f"""
        WITH t AS (
          SELECT {kl}, {text_col} AS text,
                 list_transform(
                   list_filter(
                     string_split_regex(lower(substr({text_col},1,4000)),
                                        '\\s+'),
                     x -> x <> ''),
                   x -> trim(x, '.,!?;:()[]"''')) AS toks
          FROM {src}
        ),
        s AS (
          SELECT {kl}, text, len(toks) AS n_toks,
               {scores}
          FROM t
        ),
        cjk AS (
          SELECT {kl},
                 length(regexp_replace(substr({text_col},1,2000),
                        '[^\\x{{4E00}}-\\x{{9FFF}}]', '', 'g')) AS n_cjk,
                 least(length({text_col}), 2000) AS n_head
          FROM {src}
        )
        SELECT {kl},
               CASE
                 WHEN length(s.text) = 0 THEN ''
                 WHEN cjk.n_cjk * 10 >= cjk.n_head THEN 'zh'
                 WHEN s.n_toks = 0 OR {best} = 0 THEN ''
                 WHEN {best} * 50 < s.n_toks THEN ''
                 ELSE {pick}
               END AS lang_pred
        FROM s JOIN cjk USING ({kl})
    """


def _lang_id_sql() -> str:
    return _lang_pred_sql("documents")

# rolling_fingerprint's SQL mirror: per-window polynomial hash
# Σ byte·257^(7−j) mod 2^61−1 as a HUGEINT sum of ascii() terms.
# ascii() addresses CHARACTERS, so the window path only mirrors ASCII
# text — both engine and oracle route non-ASCII docs to the md5
# fallback (octet_length(encode())<>length() CASE), keeping the
# mirror total for any input.
_FP_M = (1 << 61) - 1
_FP_TERMS_SQL = " + ".join(
    "ascii(substr(text, i + {j}, 1))::HUGEINT * {c}::HUGEINT".format(
        j=j, c=pow(257, 7 - j, _FP_M))
    for j in range(8))

ORACLES: dict[str, str] = {
    # recency-decay weight: integer floor division over microsecond
    # ages (epoch_us on both sides; age ≥ 0 so floor == trunc)
    "event_decay_mass": """
        WITH mx AS (SELECT max(ts) AS m FROM events),
        w AS (
          SELECT user_id,
                 1000000 // (1 + CAST(epoch_us(m) - epoch_us(ts)
                                      AS BIGINT) // 86400000000) AS w
          FROM events, mx)
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(w) AS BIGINT) AS decay_mass
        FROM w GROUP BY user_id
    """,
    # per-doc trigram novelty: distinct doc-gram pairs → corpus df →
    # df==1 fraction per doc (same tokenization + 'nv:'-prefixed
    # md5_number_upper hash family as the engine partial)
    "ngram_novelty": """
        WITH toks AS (
          SELECT doc_id,
                 list_transform(
                   list_filter(string_split_regex(text, '\\s+'),
                               x -> x <> ''),
                   x -> lower(x)) AS ts
          FROM documents),
        tg AS (
          SELECT DISTINCT doc_id,
                 md5_number_upper('nv:' || ts[i.i] || ' '
                                  || ts[i.i + 1] || ' '
                                  || ts[i.i + 2]) AS h
          FROM toks, unnest(range(1, len(ts) - 1)) AS i(i)
          WHERE len(ts) >= 3),
        df AS (SELECT h, count(*) AS df FROM tg GROUP BY h),
        per AS (
          SELECT doc_id, count(*) AS n_grams,
                 count(*) FILTER (WHERE df = 1) AS n_unique
          FROM tg JOIN df USING (h) GROUP BY doc_id)
        SELECT doc_id,
               CAST(n_grams AS BIGINT) AS n_grams,
               CAST(n_unique AS BIGINT) AS n_unique,
               CAST(n_unique * 1000000 // n_grams AS BIGINT)
                   AS novelty_ppm
        FROM per
    """,
    # OCR ground truth: the planted string (ASCII-filtered BEFORE
    # uppercasing — both sides byte-identical); the engine must
    # recover it from rendered pixels, clean and noisy slices alike
    "ocr_text": """
        SELECT doc_id,
               CASE WHEN planted = '' THEN 'no_image'
                    WHEN doc_id % 7 = 3 THEN 'ocr_noisy'
                    ELSE 'ocr' END AS kind,
               planted AS ocr_text
        FROM (SELECT doc_id,
                     upper(substr(regexp_replace(
                         text, '[^A-Za-z0-9 ]', '', 'g'), 1, 32))
                         AS planted
              FROM documents)
    """,
    "latest_order_per_customer": """
        SELECT o_custkey, o_orderkey, o_orderdate,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
        FROM orders
        QUALIFY row_number() OVER (
            PARTITION BY o_custkey
            ORDER BY o_orderdate DESC, o_orderkey ASC) = 1
    """,
    "revenue_mom": """
        WITH m AS (
          SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate)
                      AS BIGINT) AS order_month,
                 CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                               AS BIGINT)) AS BIGINT) AS revenue_c
          FROM orders GROUP BY 1)
        SELECT order_month, revenue_c,
               CAST(coalesce(
                 CAST(revenue_c AS HUGEINT) * 1000000
                   // lag(revenue_c) OVER (ORDER BY order_month),
                 0) AS BIGINT) AS ratio_ppm
        FROM m ORDER BY order_month
    """,
    "nation_revenue": """
        SELECT r_name, n_name,
               CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                   * 1000000 + 0.5) AS BIGINT))
                    AS BIGINT) AS revenue_micro
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE o_orderdate >= TIMESTAMP '{lo} 00:00:00'
          AND o_orderdate <  TIMESTAMP '{hi} 00:00:00'
        GROUP BY r_name, n_name
        ORDER BY r_name, n_name
    """.format(lo=NATION_REV_LO, hi=NATION_REV_HI),
    "lang_median_chars": """
        SELECT lang,
               CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS median_chars,
               CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS p90_chars,
               count(*) AS n_docs
        FROM documents GROUP BY lang
    """,
    "rare_token_score": """
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS tk
          FROM documents),
        occ AS (
          SELECT doc_id, md5_number_upper(t.x) AS th,
                 count(*) AS occ
          FROM toks, unnest(tk) AS t(x) GROUP BY 1, 2),
        cnt AS (SELECT th, sum(occ) AS cnt FROM occ GROUP BY th),
        tot AS (SELECT sum(cnt) AS total FROM cnt),
        sc AS (
          SELECT doc_id,
                 sum(occ * (total // cnt)) AS rarity
          FROM occ JOIN cnt USING (th) CROSS JOIN tot
          GROUP BY doc_id)
        SELECT doc_id, CAST(rarity AS BIGINT) AS rarity_score
        FROM sc
        ORDER BY rarity_score DESC, doc_id ASC
        LIMIT {k}
    """.format(k=RARITY_TOP_K),
    # T103: same md5_number_upper token keys; vocab tie-break
    # (cnt DESC, th ASC) is unsigned on both sides (UBIGINT there,
    # uint64 view here)
    "oov_rate": """
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS tk
          FROM documents),
        occ AS (
          SELECT doc_id, md5_number_upper(t.x) AS th,
                 count(*) AS occ
          FROM toks, unnest(tk) AS t(x) GROUP BY 1, 2),
        cnt AS (SELECT th, sum(occ) AS cnt FROM occ GROUP BY th),
        vocab AS (
          SELECT th FROM cnt ORDER BY cnt DESC, th ASC LIMIT VOCABK),
        per AS (
          SELECT o.doc_id, sum(o.occ) AS n_tok,
                 sum(CASE WHEN v.th IS NULL THEN o.occ ELSE 0 END)
                     AS n_oov
          FROM occ o LEFT JOIN vocab v ON o.th = v.th
          GROUP BY o.doc_id)
        SELECT d.doc_id,
               CAST(coalesce(p.n_tok, 0) AS BIGINT) AS n_tokens,
               CAST(coalesce(p.n_oov, 0) AS BIGINT) AS n_oov,
               CAST(CASE WHEN coalesce(p.n_tok, 0) = 0 THEN 0
                    ELSE p.n_oov * 1000000 // p.n_tok END AS BIGINT)
                   AS oov_ppm
        FROM documents d LEFT JOIN per p USING (doc_id)
    """.replace("VOCABK", str(VOCAB_K)),
    "active_streaks": """
        WITH days AS (
          SELECT DISTINCT user_id,
                 CAST(ts AS DATE) - DATE '1970-01-01' AS day
          FROM events),
        r AS (
          SELECT user_id, day,
                 day - row_number() OVER (PARTITION BY user_id
                                          ORDER BY day) AS grp
          FROM days),
        s AS (SELECT user_id, count(*) AS ln
              FROM r GROUP BY user_id, grp)
        SELECT user_id, CAST(max(ln) AS BIGINT) AS max_streak,
               CAST(sum(ln) AS BIGINT) AS n_active_days
        FROM s GROUP BY user_id
    """,
    "cohort_retention": """
        WITH weeks AS (
          SELECT DISTINCT user_id,
                 (CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS wk
          FROM events),
        c AS (SELECT user_id, min(wk) AS cohort FROM weeks
              GROUP BY user_id)
        SELECT CAST(cohort AS BIGINT) AS cohort_week,
               CAST(wk - cohort AS BIGINT) AS week_offset,
               count(*) AS n_users
        FROM weeks JOIN c USING (user_id)
        GROUP BY 1, 2
    """,
    "promo_revenue": """
        WITH g AS (
          SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate)
                      AS BIGINT) AS ship_month,
                 CAST(sum(CASE WHEN p_type = 'PROMO'
                          THEN CAST(floor(l_extendedprice
                                          * (1.0 - l_discount)
                                          * 100 + 0.5) AS BIGINT)
                          ELSE 0 END) AS BIGINT) AS promo_c,
                 CAST(sum(CAST(floor(l_extendedprice
                                     * (1.0 - l_discount)
                                     * 100 + 0.5) AS BIGINT))
                      AS BIGINT) AS total_c
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY 1)
        SELECT ship_month, promo_c, total_c,
               CAST(CAST(promo_c AS HUGEINT) * 1000000 // total_c
                    AS BIGINT) AS promo_ppm
        FROM g ORDER BY ship_month
    """,
    # fingerprint: bit_xor of the h%16==0 window hashes; 0/NULL (no
    # sampled window, <8 bytes ⇒ no windows, or NON-ASCII text — SQL
    # addresses characters, the engine rolls UTF-8 bytes, so both
    # route non-ASCII docs to the fallback) falls back to
    # md5_number_upper('fp:'||text) — exactly textstats._md5_u64.
    # simhash: same md5-token bit-vote CTE as the simhash_near_dups
    # oracle. lpad(hex()) == python's '%016x'.
    "doc_fingerprints": """
        WITH pos AS (
          SELECT doc_id, text, r.i AS i
          FROM documents, unnest(range(1, length(text) - 6)) AS r(i)
          WHERE length(text) >= 8
            AND octet_length(encode(text)) = length(text)),
        wh AS (
          SELECT doc_id, CAST(({terms}) % {m} AS BIGINT) AS h FROM pos),
        xr AS (
          SELECT doc_id, bit_xor(h) FILTER (WHERE h % 16 = 0) AS x
          FROM wh GROUP BY doc_id),
        toks AS (
          SELECT doc_id, lower(t.tok) AS tok
          FROM documents,
               unnest(list_filter(string_split_regex(text, '\\s+'),
                                  x -> x <> '')) AS t(tok)),
        th AS (
          SELECT doc_id, md5_number_upper('simhash:' || tok) AS h
          FROM toks),
        acc AS (
          SELECT doc_id, b.b AS bit,
                 SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END)
                     AS votes
          FROM th, range(64) b(b) GROUP BY 1, 2),
        sh0 AS (
          SELECT doc_id,
                 SUM(CASE WHEN votes > 0 THEN (1::UBIGINT << bit)
                          ELSE 0::UBIGINT END)::UBIGINT AS sh
          FROM acc GROUP BY doc_id)
        SELECT d.doc_id,
               lpad(lower(hex(CASE WHEN xr.x IS NOT NULL AND xr.x <> 0
                                   THEN xr.x::UBIGINT
                                   ELSE md5_number_upper('fp:' || d.text)
                              END)), 16, '0') AS fingerprint_hex,
               lpad(lower(hex(COALESCE(s.sh, 0::UBIGINT))), 16, '0')
                   AS simhash_hex
        FROM documents d
        LEFT JOIN xr USING (doc_id) LEFT JOIN sh0 s USING (doc_id)
    """.format(terms=_FP_TERMS_SQL, m=_FP_M),
    "doc_stats_by_lang": """
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars,
               CAST(min(n_chars) AS BIGINT) AS min_chars,
               CAST(max(n_chars) AS BIGINT) AS max_chars
        FROM documents GROUP BY lang
    """,
    "token_counts": """
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                    x -> x <> '')) AS BIGINT) AS n_tokens,
               CAST(length(text)
                    - length(regexp_replace(text, '[.!,?;:]', '', 'g'))
                    AS BIGINT) AS n_punct,
               CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                    x -> x IN {stop})) AS BIGINT) AS n_stop
        FROM documents
    """.format(stop=_STOP_SQL),
    "quality_scores": """
        WITH t AS (
          SELECT doc_id,
                 CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                      x -> x <> '')) AS BIGINT) AS n_tokens,
                 CAST(length(text)
                      - length(regexp_replace(text, '[.!,?;:]', '', 'g'))
                      AS BIGINT) AS n_punct,
                 CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                      x -> x IN {stop})) AS BIGINT) AS n_stop
          FROM documents)
        SELECT doc_id, n_tokens, n_punct, n_stop,
               (n_tokens >= 10 AND n_stop * 50 >= n_tokens) AS is_quality
        FROM t
    """.format(stop=_STOP_SQL),
    # blocklist IN-list generated from the SAME frozenset the stage
    # broadcasts (stages/text.SCRUB_TERMS) — one source of truth
    "term_scrub": """
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS tk
          FROM documents)
        SELECT doc_id,
               CAST(len(list_filter(tk, x -> x IN {block}))
                    AS BIGINT) AS n_redacted,
               md5(array_to_string(
                     list_transform(tk,
                       x -> CASE WHEN x IN {block}
                            THEN '[REDACTED]' ELSE x END),
                     ' ')) AS redacted_md5
        FROM toks
    """.format(block="(" + ",".join(
        f"'{w}'" for w in sorted(tx.SCRUB_TERMS)) + ")"),
    # pii_augment's injection formulas mirrored literally; regexes are
    # the stage's own module constants (RE2 ∩ Python common subset)
    "pii_scrub": """
        WITH aug AS (
          SELECT doc_id,
                 text
                 || CASE WHEN doc_id % 3 = 0
                    THEN ' contact user' || doc_id || '@example.com now'
                    ELSE '' END
                 || CASE WHEN doc_id % 5 = 0
                    THEN ' call 555-' || (100 + doc_id % 900) || '-'
                         || (1000 + doc_id % 9000) || ' today'
                    ELSE '' END
                 || CASE WHEN doc_id % 7 = 0
                    THEN ' from 10.' || (doc_id % 256) || '.'
                         || ((doc_id // 7) % 256) || '.'
                         || (doc_id % 100) || ' logged'
                    ELSE '' END AS t
          FROM documents)
        SELECT doc_id,
               CAST(len(regexp_extract_all(t, '{em}')) AS BIGINT)
                   AS n_emails,
               CAST(len(regexp_extract_all(t, '{ph}')) AS BIGINT)
                   AS n_phones,
               CAST(len(regexp_extract_all(t, '{ip}')) AS BIGINT)
                   AS n_ips,
               md5(regexp_replace(regexp_replace(regexp_replace(
                     t, '{em}', '<EMAIL>', 'g'),
                     '{ph}', '<PHONE>', 'g'),
                     '{ip}', '<IP>', 'g')) AS redacted_md5
        FROM aug
    """.format(em=tx.PII_EMAIL_RE, ph=tx.PII_PHONE_RE,
               ip=tx.PII_IP_RE),
    "repetition_stats": """
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS tk
          FROM documents),
        base AS (
          SELECT doc_id, len(tk) AS n_tokens,
                 CASE WHEN len(tk) = 0 THEN 0
                      ELSE len(list_distinct(tk)) * 1000000 // len(tk)
                 END AS distinct_frac_micro
          FROM toks),
        big AS (
          SELECT doc_id, tk[i] || ' ' || tk[i+1] AS g
          FROM toks, unnest(range(1, len(tk))) AS t(i)
          WHERE len(tk) >= 2),
        topb AS (
          SELECT doc_id, max(c) * 1000000 // sum(c)
                     AS top_bigram_frac_micro
          FROM (SELECT doc_id, g, count(*) AS c
                FROM big GROUP BY doc_id, g)
          GROUP BY doc_id)
        SELECT b.doc_id,
               CAST(b.n_tokens AS BIGINT) AS n_tokens,
               CAST(b.distinct_frac_micro AS BIGINT)
                   AS distinct_frac_micro,
               CAST(coalesce(t.top_bigram_frac_micro, 0) AS BIGINT)
                   AS top_bigram_frac_micro,
               ((b.n_tokens >= 20
                 AND coalesce(t.top_bigram_frac_micro, 0) >= 100000)
                OR (b.n_tokens >= 10
                    AND b.distinct_frac_micro <= 300000))
                   AS is_repetitive
        FROM base b LEFT JOIN topb t USING (doc_id)
    """,
    # mod / n-gram width generated from the stage's own constants
    # (stages/text.BENCH_MOD / BENCH_NGRAM) — one source of truth, as
    # for term_scrub above. DuckDB list slices are 1-based inclusive:
    # tk[i:i+k-1] is k tokens.
    "benchmark_contamination": """
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS tk
          FROM documents),
        bg AS (
          SELECT DISTINCT array_to_string(tk[i:i+{km1}], ' ') AS g
          FROM toks, unnest(range(1, len(tk) - {km2})) AS t(i)
          WHERE doc_id % {mod} = 0 AND len(tk) >= {k}),
        dg AS (
          SELECT DISTINCT doc_id, array_to_string(tk[i:i+{km1}], ' ') AS g
          FROM toks, unnest(range(1, len(tk) - {km2})) AS t(i)
          WHERE doc_id % {mod} <> 0 AND len(tk) >= {k}),
        hits AS (
          SELECT doc_id, count(*) AS n_hits
          FROM dg JOIN bg USING (g) GROUP BY doc_id)
        SELECT t.doc_id,
               CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
               coalesce(h.n_hits, 0) > 0 AS contaminated
        FROM toks t LEFT JOIN hits h USING (doc_id)
        WHERE t.doc_id % {mod} <> 0
    """.format(mod=tx.BENCH_MOD, k=tx.BENCH_NGRAM,
               km1=tx.BENCH_NGRAM - 1, km2=tx.BENCH_NGRAM - 2),
    # block width generated from the stage constant (stages/text
    # .PACK_BLOCK); the window cumsum is the sequential spec of the
    # distributed two-phase scan
    "sequence_pack": """
        WITH t AS (
          SELECT doc_id,
                 CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                      x -> x <> '')) AS BIGINT)
                     AS n_tokens
          FROM documents),
        c AS (
          SELECT doc_id, n_tokens,
                 sum(n_tokens) OVER (
                   ORDER BY doc_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS cum
          FROM t)
        SELECT doc_id, n_tokens,
               CAST(cum - n_tokens AS BIGINT) AS start_tok,
               CAST((cum - n_tokens) // {blk} AS BIGINT) AS block_start,
               CAST(CASE WHEN n_tokens = 0 THEN (cum - n_tokens) // {blk}
                         ELSE (cum - 1) // {blk} END AS BIGINT)
                   AS block_end
        FROM c
    """.format(blk=tx.PACK_BLOCK),
    "exact_dedup": """
        SELECT md5(text) AS text_md5,
               CAST(min(doc_id) AS BIGINT) AS rep_doc_id,
               count(*) AS n_copies
        FROM documents GROUP BY md5(text)
    """,
    "ngram_top20": """
        SELECT word, CAST(count(*) AS BIGINT) AS n
        FROM (SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                                        x -> x <> '')) AS word
              FROM documents)
        GROUP BY word
        ORDER BY n DESC, word ASC
        LIMIT 20
    """,
    "events_hourly": """
        SELECT event_type,
               date_trunc('hour', ts) AS hour,
               count(*) AS n_events,
               CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_value_micro
        FROM events GROUP BY 1, 2
    """,
    "events_sliding": """
        WITH e AS (
          SELECT event_type,
                 CAST(floor(epoch(ts) / 900) AS BIGINT) AS b,
                 CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
          FROM events),
        x AS (
          SELECT event_type, (b - k) * 900 AS win_start_s, v
          FROM e, unnest([0, 1, 2, 3]) AS t(k))
        SELECT event_type, CAST(win_start_s AS BIGINT) AS win_start_s,
               count(*) AS n_events,
               CAST(sum(v) AS BIGINT) AS sum_value_micro
        FROM x GROUP BY 1, 2
    """,
    "value_quantiles": """
        WITH e AS (
          SELECT event_type,
                 CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
          FROM events)
        SELECT event_type,
               CAST(quantile_disc(v, 0.25) AS BIGINT) AS p25_micro,
               CAST(quantile_disc(v, 0.50) AS BIGINT) AS p50_micro,
               CAST(quantile_disc(v, 0.90) AS BIGINT) AS p90_micro,
               count(*) AS n_events
        FROM e GROUP BY event_type
    """,
    "lineitem_unpivot": """
        WITH long AS (
          SELECT l_orderkey, l_linenumber, 'l_quantity' AS measure,
                 CAST(floor(l_quantity * 1000000 + 0.5) AS BIGINT)
                     AS value_micro FROM lineitem
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'l_extendedprice',
                 CAST(floor(l_extendedprice * 1000000 + 0.5) AS BIGINT)
          FROM lineitem
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'l_discount',
                 CAST(floor(l_discount * 1000000 + 0.5) AS BIGINT)
          FROM lineitem
          UNION ALL
          SELECT l_orderkey, l_linenumber, 'l_tax',
                 CAST(floor(l_tax * 1000000 + 0.5) AS BIGINT)
          FROM lineitem)
        SELECT measure, l_orderkey, l_linenumber, value_micro
        FROM long
        QUALIFY row_number() OVER (
            PARTITION BY measure
            ORDER BY value_micro DESC, l_orderkey, l_linenumber) <= 20
    """,
    "asof_last_order": """
        WITH ords AS (
          SELECT o_custkey, o_orderdate,
                 max(o_orderkey) AS o_orderkey
          FROM orders WHERE o_custkey % 2 = 0
          GROUP BY o_custkey, o_orderdate)
        SELECT e.event_id, e.user_id, e.ts,
               COALESCE(o.o_orderkey, -1) AS last_orderkey,
               COALESCE(o.o_orderdate, TIMESTAMP '1970-01-01')
                   AS last_orderdate
        FROM events e ASOF LEFT JOIN ords o
          ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    "purchase_attribution": """
        WITH p AS (
          SELECT event_id AS purchase_id, user_id, ts
          FROM events WHERE event_type = 'purchase'),
        v AS (
          SELECT event_id AS view_id, user_id, ts
          FROM events WHERE event_type = 'view'),
        j AS (
          SELECT p.purchase_id, p.user_id, v.view_id,
                 row_number() OVER (
                   PARTITION BY p.purchase_id
                   ORDER BY v.ts DESC, v.view_id DESC) AS rnk
          FROM p JOIN v
            ON v.user_id = p.user_id AND v.ts <= p.ts)
        SELECT purchase_id, CAST(user_id AS BIGINT) AS user_id, view_id
        FROM j WHERE rnk = 1
    """,
    "event_value_bands": """
        WITH bands(band, lo, hi) AS (VALUES {bands}),
        e AS (
          SELECT event_type,
                 CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
          FROM events)
        SELECT e.event_type, b.band,
               count(*) AS n_events,
               CAST(sum(e.v) AS BIGINT) AS sum_value_micro
        FROM e JOIN bands b ON e.v >= b.lo AND e.v < b.hi
        GROUP BY 1, 2
    """.format(bands=", ".join(
        f"('{n}', {lo}, {hi})" for (n, lo, hi) in VALUE_BANDS)),
    "user_sessions": """
        WITH x AS (
          SELECT user_id, ts,
                 lag(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev
          FROM events)
        SELECT user_id,
               CAST(count(*) FILTER (WHERE prev IS NULL
                                     OR ts - prev > INTERVAL 30 MINUTE)
                    AS BIGINT) AS n_sessions,
               count(*) AS n_events
        FROM x GROUP BY user_id
    """,
    "distinct_users": """
        SELECT event_type,
               CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events GROUP BY event_type
    """,
    "order_revenue_join": """
        SELECT l_orderkey AS o_orderkey, o_orderdate, o_orderpriority,
               CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                   * 1000000 + 0.5) AS BIGINT))
                    AS BIGINT) AS revenue_micro
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '{cut} 00:00:00'
          AND l_shipdate  > TIMESTAMP '{cut} 00:00:00'
        GROUP BY 1, 2, 3
        ORDER BY revenue_micro DESC, o_orderdate ASC, o_orderkey ASC
        LIMIT 10
    """.format(cut=ORDER_JOIN_CUTOFF),
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_qty_c,
               CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_price_c,
               CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                   * 1000000 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_disc_price_micro,
               count(*) AS n_rows
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
    """,
    "top_customers": """
        SELECT c.c_custkey, c.c_name,
               CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                    AS BIGINT) AS revenue_c,
               count(*) AS n_orders
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_custkey, c.c_name
        ORDER BY revenue_c DESC, c.c_custkey ASC
        LIMIT 10
    """,
    "embeddings_by_label": """
        SELECT label, count(*) AS n_vecs FROM embeddings GROUP BY label
    """,
    "knn_cosine": """
        WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
        r AS (
          SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
                 row_number() OVER (
                   PARTITION BY q.vec_id
                   ORDER BY list_cosine_similarity(
                              CAST(q.embedding AS DOUBLE[]),
                              CAST(e.embedding AS DOUBLE[])) DESC,
                            e.vec_id ASC) AS rnk
          FROM q CROSS JOIN embeddings e
          WHERE e.vec_id <> q.vec_id)
        SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk
        FROM r WHERE rnk <= 5
    """,
    "lang_id": _lang_id_sql(),
    # MinHash+LSH banding itself is not SQL, but every pair it emits
    # carries the EXACT (distributed-verified) shingle Jaccard, so the
    # full result is checkable against the exact-Jaccard pair set
    # (VERDICT r2 #4). Equality holds because (a) verification is
    # exact, so no false positive can ever appear, and (b) on the
    # synthetic tables every true pair at τ=0.7 is caught by the
    # 16-band/4-row LSH (duplicates are near-identical, J≈1 ⇒ all
    # bands match) — asserted empirically at sf0.001/0.01/0.1; hashed
    # 64-bit shingle sets produce the same Jaccard as the string sets
    # (collision-free on this data by construction check).
    "minhash_dup_pairs": """
        WITH {cte}
        SELECT doc_id_a, doc_id_b, jaccard_micro FROM mpairs
    """.format(cte=_MINHASH_PAIRS_CTE),
    # prefix filtering is EXACT (no df cap, no banding): the oracle is
    # the same exact-Jaccard pair set at τ = 0.6
    "prefix_jaccard_dups": """
        WITH {cte}
        SELECT doc_id_a, doc_id_b, jaccard_micro FROM mpairs
    """.format(cte=_MINHASH_PAIRS_CTE.replace("700000", "600000")),
    # connected components over the same pair set: transitive closure
    # by recursive CTE, rep = min reachable id — mirrors the query's
    # union-by-min-id fold exactly
    "near_dup_clusters": """
        WITH RECURSIVE {cte},
        edges AS (
          SELECT doc_id_a AS a, doc_id_b AS b FROM mpairs
          UNION SELECT doc_id_b, doc_id_a FROM mpairs),
        reach(a, b) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a)
        SELECT a AS doc_id,
               CAST(least(a, min(b)) AS BIGINT) AS rep_doc_id
        FROM reach GROUP BY a
    """.format(cte=_MINHASH_PAIRS_CTE),
    # full SimHash mirror: per-token md5_number_upper == the Python
    # token hash by construction (textstats.simhash64 reads the first
    # 8 md5 digest bytes little-endian); bit votes, the 4×16-bit band
    # keys, the per-band MAX_BUCKET candidate cap (smallest doc_ids
    # win — band_bucket_pairs sorts before capping) and the hamming
    # verify are all integer-exact
    "simhash_near_dups": """
        WITH toks AS (
          SELECT doc_id, lower(t.tok) AS tok
          FROM documents,
               unnest(list_filter(string_split_regex(text, '\\s+'),
                                  x -> x <> '')) AS t(tok)
        ),
        th AS (
          SELECT doc_id, md5_number_upper('simhash:' || tok) AS h
          FROM toks
        ),
        acc AS (
          SELECT doc_id, b.b AS bit,
                 SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END)
                     AS votes
          FROM th, range(64) b(b) GROUP BY 1, 2
        ),
        sh0 AS (
          SELECT doc_id,
                 SUM(CASE WHEN votes > 0 THEN (1::UBIGINT << bit)
                          ELSE 0::UBIGINT END)::UBIGINT AS sh
          FROM acc GROUP BY doc_id
        ),
        sims AS (
          -- token-less docs simhash to 0 (the Python empty branch)
          SELECT d.doc_id, COALESCE(s.sh, 0::UBIGINT) AS sh
          FROM documents d LEFT JOIN sh0 s USING (doc_id)
        ),
        bands AS (
          SELECT doc_id, sh, r.b AS band,
                 (sh >> (r.b * 16)) & 65535 AS chunk,
                 row_number() OVER (
                   PARTITION BY r.b, (sh >> (r.b * 16)) & 65535
                   ORDER BY doc_id) AS rk
          FROM sims, range(4) r(b)
        ),
        capped AS (SELECT * FROM bands WHERE rk <= {max_bucket}),
        cand AS (
          SELECT DISTINCT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
                          a.sh AS sh_a, b.sh AS sh_b
          FROM capped a JOIN capped b
            ON a.band = b.band AND a.chunk = b.chunk
           AND a.doc_id < b.doc_id
        )
        SELECT doc_id_a, doc_id_b,
               CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming
        FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= {max_ham}
    """.format(max_bucket=dd.MAX_BUCKET, max_ham=SIMHASH_MAX_HAMMING),
    # K and the Knuth constant come from the stage definition
    "source_cap": """
        SELECT source, doc_id FROM (
          SELECT source, doc_id,
                 row_number() OVER (
                   PARTITION BY source
                   ORDER BY (doc_id::HUGEINT * 2654435761) % 4294967296, doc_id
                 ) AS rk
          FROM documents)
        WHERE rk <= {k}
    """.format(k=SOURCE_CAP_K),
    "lang_source_rollup": """
        SELECT CASE WHEN GROUPING(lang) = 1 THEN '{all}' ELSE lang END
                   AS lang,
               CASE WHEN GROUPING(source) = 1 THEN '{all}' ELSE source
                   END AS source,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY ROLLUP(lang, source)
    """.format(all=ROLLUP_ALL),
    "props_json_stats": """
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT))
                   AS BIGINT) AS sum_k,
               CAST(max(CAST(json_extract(props, '$.k') AS BIGINT))
                   AS BIGINT) AS max_k
        FROM events GROUP BY event_type
    """,
    "user_event_types": """
        WITH pairs AS (
          SELECT DISTINCT user_id, event_type FROM events)
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_types,
               string_agg(event_type, ',' ORDER BY event_type)
                   AS types_csv
        FROM pairs GROUP BY user_id
    """,
    # greedy-earliest funnel: ts1 = first view, ts2 = first click
    # AFTER ts1, ts3 = first purchase AFTER ts2 (strict >)
    "funnel_users": """
        WITH s1 AS (
          SELECT user_id, min(ts) AS ts1 FROM events
          WHERE event_type = '{f0}' GROUP BY user_id),
        s2 AS (
          SELECT e.user_id, min(e.ts) AS ts2
          FROM events e JOIN s1 ON e.user_id = s1.user_id
          WHERE e.event_type = '{f1}' AND e.ts > s1.ts1
          GROUP BY e.user_id),
        s3 AS (
          SELECT e.user_id, min(e.ts) AS ts3
          FROM events e JOIN s2 ON e.user_id = s2.user_id
          WHERE e.event_type = '{f2}' AND e.ts > s2.ts2
          GROUP BY e.user_id)
        SELECT s1.user_id, s1.ts1, s2.ts2, s3.ts3
        FROM s1 JOIN s2 ON s1.user_id = s2.user_id
                JOIN s3 ON s1.user_id = s3.user_id
    """.format(f0=FUNNEL_STEPS[0], f1=FUNNEL_STEPS[1], f2=FUNNEL_STEPS[2]),
    # float32 → double is exact; floor(x·1e6) then FLOOR-division by n
    # is integer-exact. DuckDB's // truncates toward zero, so the
    # Python floor semantics are spelled out: (s - mod(s, n)) / n with
    # a nonnegative mod
    "label_centroids": """
        WITH sums AS (
          SELECT CAST(label AS BIGINT) AS label,
                 r.i - 1 AS dim,
                 CAST(count(*) AS BIGINT) AS n_vecs,
                 CAST(sum(CAST(floor(CAST(embedding[r.i] AS DOUBLE)
                                     * 1000000) AS BIGINT))
                      AS BIGINT) AS s
          FROM embeddings,
               unnest(range(1, len(embedding) + 1)) AS r(i)
          GROUP BY label, r.i)
        SELECT label, dim, n_vecs,
               CAST((s - (((s % n_vecs) + n_vecs) % n_vecs)) // n_vecs
                    AS BIGINT) AS centroid_micro
        FROM sums
    """,
    "weighted_sample": """
        SELECT doc_id, lang, n_chars FROM documents
        WHERE ((doc_id::HUGEINT * 2654435761) % 4294967296) % 1000000 <
              least(1000000, n_chars * 1000000 // {w})
    """.format(w=WEIGHTED_CHARS_PER_MILLION),
    "events_by_dow": """
        SELECT dayofweek(ts) AS dow, event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_value_micro
        FROM events GROUP BY 1, 2
    """,
    "bloom_semi_join": """
        WITH u AS (SELECT DISTINCT o_orderkey FROM orders
                   WHERE o_orderpriority = '{prio}')
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n_items,
               CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                                   * 1000000 + 0.5) AS BIGINT))
                    AS BIGINT) AS revenue_micro
        FROM lineitem l JOIN u ON l.l_orderkey = u.o_orderkey
        GROUP BY 1
    """.format(prio=BLOOM_PRIORITY),
    "nation_order_avg": """
        WITH oc AS (
          SELECT o_custkey, CAST(count(*) AS BIGINT) AS n
          FROM orders GROUP BY 1)
        SELECT c_nationkey AS nationkey,
               CAST(count(*) AS BIGINT) AS n_customers,
               CAST(sum(COALESCE(n, 0)) AS BIGINT) AS n_orders,
               CAST(sum(COALESCE(n, 0)) * 1000000 // count(*)
                    AS BIGINT) AS avg_orders_micro
        FROM customer LEFT JOIN oc ON c_custkey = o_custkey
        GROUP BY 1
    """,
    "event_density": """
        SELECT a.event_id, CAST(count(*) AS BIGINT) AS n_within_1h
        FROM events a JOIN events b
          ON b.ts BETWEEN a.ts - INTERVAL 1 HOUR
                      AND a.ts + INTERVAL 1 HOUR
        GROUP BY 1
    """,
    "sentence_split": """
        WITH l AS (
          SELECT doc_id,
                 list_filter(
                   string_split_regex(text,
                                      '[.!?]+[ \\t\\n\\r\\f\\v]+'),
                   x -> x <> '') AS sents
          FROM documents)
        SELECT doc_id, r.i - 1 AS sent_idx, sents[r.i] AS sentence,
               CAST(length(sents[r.i]) AS BIGINT) AS n_chars_sent
        FROM l, unnest(range(1, len(sents) + 1)) AS r(i)
    """,
    # T98: same split rule as sentence_split; winner = first
    # occurrence under (doc_id, sent_idx); hash collision semantics
    # shared with the engine via the same md5_number_upper key
    "sentence_dedup": """
        WITH l AS (
          SELECT doc_id,
                 list_filter(
                   string_split_regex(text,
                                      '[.!?]+[ \\t\\n\\r\\f\\v]+'),
                   x -> x <> '') AS sents
          FROM documents),
        e AS (
          SELECT doc_id, r.i - 1 AS sent_idx,
                 md5_number_upper('sd:' || sents[r.i]) AS sh
          FROM l, unnest(range(1, len(sents) + 1)) AS r(i)),
        w AS (
          SELECT doc_id, sent_idx,
                 first_value(doc_id) OVER win AS wd,
                 first_value(sent_idx) OVER win AS wi
          FROM e
          WINDOW win AS (
            PARTITION BY sh ORDER BY doc_id, sent_idx
            ROWS BETWEEN UNBOUNDED PRECEDING
                     AND UNBOUNDED FOLLOWING))
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               CAST(sent_idx AS BIGINT) AS sent_idx,
               (doc_id <> wd OR sent_idx <> wi) AS is_dup,
               CAST(wd AS BIGINT) AS winner_doc_id,
               CAST(wi AS BIGINT) AS winner_sent_idx
        FROM w
    """,
    # T99: token chunks of CHUNK_TOKENS every CHUNK_TOKENS-OVERLAP;
    # chunk hash = md5_number_upper('ck:' || chunk text), hex-lpad'd
    "doc_chunks": f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS tk
          FROM documents),
        starts AS (
          SELECT doc_id, tk, len(tk) AS n,
                 CAST(s.s AS BIGINT) AS start_tok,
                 CAST(s.s // {CHUNK_TOKENS - CHUNK_OVERLAP} AS BIGINT)
                     AS chunk_idx
          FROM toks,
               unnest(range(0, greatest(len(tk), 1),
                            {CHUNK_TOKENS - CHUNK_OVERLAP})) AS s(s)
          WHERE s.s < len(tk))
        SELECT doc_id, chunk_idx, start_tok,
               CAST(least({CHUNK_TOKENS}, n - start_tok) AS BIGINT)
                   AS n_chunk_toks,
               lpad(lower(hex(md5_number_upper(
                 'ck:' || array_to_string(
                   tk[start_tok + 1 : start_tok + {CHUNK_TOKENS}],
                   ' ')))), 16, '0') AS chunk_hash_hex
        FROM starts
    """,
    # T100: exact-integer centroid distance, python floor-div emulated
    "embedding_outliers": f"""
        WITH x AS (
          SELECT vec_id, CAST(label AS BIGINT) AS label,
                 r.i - 1 AS dim,
                 CAST(floor(CAST(embedding[r.i] AS DOUBLE) * 1000000)
                      AS BIGINT) AS xm
          FROM embeddings,
               unnest(range(1, len(embedding) + 1)) AS r(i)),
        c AS (
          SELECT label, dim, sum(xm) AS s,
                 CAST(count(*) AS BIGINT) AS n
          FROM x GROUP BY label, dim),
        cm AS (
          SELECT label, dim,
                 CAST((s - (((s % n) + n) % n)) // n AS BIGINT) AS c
          FROM c),
        d AS (
          SELECT x.vec_id, x.label,
                 sum((x.xm - cm.c) * (x.xm - cm.c)) AS d2
          FROM x JOIN cm ON x.label = cm.label AND x.dim = cm.dim
          GROUP BY x.vec_id, x.label)
        SELECT label, CAST(vec_id AS BIGINT) AS vec_id,
               CAST(d2 AS BIGINT) AS d2_micro2
        FROM d
        QUALIFY row_number() OVER (
          PARTITION BY label ORDER BY d2 DESC, vec_id
        ) <= {EMB_OUTLIER_K}
    """,
    "moving_sum": """
        SELECT event_id, user_id,
               CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN {wm1} PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS moving_sum_micro
        FROM events
    """.format(wm1=MOVING_WINDOW - 1),
    "revenue_share": """
        WITH s AS (
          SELECT o_orderpriority,
                 sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                     AS cents
          FROM orders GROUP BY 1)
        SELECT o_orderpriority,
               CAST(cents AS BIGINT) AS revenue_cents,
               CAST(CAST(cents AS HUGEINT) * 1000000
                    // (SELECT sum(cents) FROM s) AS BIGINT) AS share_ppm
        FROM s
    """,
    "top_event_type": """
        WITH c AS (
          SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2)
        SELECT user_id, event_type AS top_event_type, n AS n_events
        FROM (SELECT *, row_number() OVER (
                PARTITION BY user_id ORDER BY n DESC, event_type) AS rk
              FROM c)
        WHERE rk = 1
    """,
    "events_daily_pivot": """
        SELECT date_trunc('day', ts) AS day,
               {counts},
               CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_value_micro
        FROM events GROUP BY 1
    """.format(counts=",\n               ".join(
        "CAST(count(*) FILTER (WHERE event_type = '{t}') AS BIGINT)"
        " AS n_{t}".format(t=t) for t in PIVOT_TYPES)),
    "nation_parties": """
        WITH parties AS (
          SELECT c_nationkey AS nationkey, c_acctbal AS bal, 1 AS isc
          FROM customer
          UNION ALL
          SELECT s_nationkey, s_acctbal, 0 FROM supplier)
        SELECT nationkey,
               CAST(sum(isc) AS BIGINT) AS n_customers,
               CAST(count(*) - sum(isc) AS BIGINT) AS n_suppliers,
               CAST(sum(CAST(floor(bal * 1000000 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_acctbal_micro
        FROM parties GROUP BY 1
    """,
    "click_no_purchase_days": """
        SELECT user_id, date_trunc('day', ts) AS day
        FROM events WHERE event_type = 'click'
        EXCEPT
        SELECT user_id, date_trunc('day', ts)
        FROM events WHERE event_type = 'purchase'
    """,
    "click_and_purchase_days": """
        SELECT user_id, date_trunc('day', ts) AS day
        FROM events WHERE event_type = 'click'
        INTERSECT
        SELECT user_id, date_trunc('day', ts)
        FROM events WHERE event_type = 'purchase'
    """,
    # abs AFTER floor (mirrors the map's floor-then-abs); argmax dim =
    # first max, i.e. smallest dim on ties (row_number tie-break)
    "vector_stats": """
        WITH comps AS (
          SELECT vec_id, r.i - 1 AS dim,
                 CAST(floor(CAST(embedding[r.i] AS DOUBLE) * 1000)
                      AS BIGINT) AS c
          FROM embeddings,
               unnest(range(1, len(embedding) + 1)) AS r(i)),
        stats AS (
          SELECT vec_id,
                 CAST(sum(c * c) AS BIGINT) AS sq_norm_milli2,
                 CAST(count(*) FILTER (WHERE c > 0) AS BIGINT) AS n_pos
          FROM comps GROUP BY vec_id),
        am AS (
          SELECT vec_id, dim AS argmax_dim FROM (
            SELECT vec_id, dim,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY abs(c) DESC, dim) AS rn
            FROM comps) WHERE rn = 1)
        SELECT s.vec_id, s.sq_norm_milli2, am.argmax_dim, s.n_pos
        FROM stats s JOIN am ON s.vec_id = am.vec_id
    """,
    "ngram_jaccard_dups": """
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x <> '') AS tk
          FROM documents
        ),
        sh AS (
          SELECT DISTINCT doc_id,
                 tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS shingle
          FROM toks, unnest(range(1, len(tk) - 1)) AS t(i)
        ),
        sized AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        co AS (
          SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
          FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          WHERE a.shingle IN (
            SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 500)
          GROUP BY ia, ib
        )
        SELECT ia AS doc_id_a, ib AS doc_id_b,
               CAST((c * 1000000) // (sa.n + sb.n - c) AS BIGINT)
                   AS jaccard_micro
        FROM co
        JOIN sized sa ON co.ia = sa.doc_id
        JOIN sized sb ON co.ib = sb.doc_id
        WHERE (c * 1000000) // (sa.n + sb.n - c) >= 600000
    """,
    # containment twin: identical CTEs, least-size denominator
    "containment_dups": """
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x <> '') AS tk
          FROM documents
        ),
        sh AS (
          SELECT DISTINCT doc_id,
                 tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2] AS shingle
          FROM toks, unnest(range(1, len(tk) - 1)) AS t(i)
        ),
        sized AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
        co AS (
          SELECT a.doc_id AS ia, b.doc_id AS ib, count(*) AS c
          FROM sh a JOIN sh b
            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
          WHERE a.shingle IN (
            SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 500)
          GROUP BY ia, ib
        )
        SELECT ia AS doc_id_a, ib AS doc_id_b,
               CAST((c * 1000000) // least(sa.n, sb.n) AS BIGINT)
                   AS containment_micro
        FROM co
        JOIN sized sa ON co.ia = sa.doc_id
        JOIN sized sb ON co.ib = sb.doc_id
        WHERE (c * 1000000) // least(sa.n, sb.n) >= 700000
    """,
    # same integer medians (quantile_disc 0.5) from the value and
    # deviation domains; Hampel rule in plain integers
    "mad_outliers": """
        WITH med AS (
          SELECT quantile_disc(n_chars, 0.5) AS m FROM documents),
        mad AS (
          SELECT quantile_disc(abs(n_chars - med.m), 0.5) AS s
          FROM documents, med)
        SELECT lang,
               CAST(count(*) FILTER (
                 WHERE abs(n_chars - med.m) > 3 * mad.s) AS BIGINT)
                   AS n_outliers,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM documents, med, mad
        GROUP BY lang
    """,
    # max over window starts == max of the running sweep (the count
    # only rises at a +1); half-open [ts, ts+W) intervals
    "peak_concurrency": """
        SELECT CAST(max(c) AS BIGINT) AS peak_concurrency FROM (
          SELECT count(*) AS c
          FROM events a JOIN events b
            ON b.ts <= a.ts
           AND a.ts < b.ts + INTERVAL 10 MINUTE
          GROUP BY a.event_id)
    """,
    # rank window + capped edit distance — the engine's distributed
    # rank construction is provably the row_number of this ORDER BY
    "sorted_neighborhood_dups": """
        WITH k AS (
          SELECT doc_id, lower(substr(text, 1, {klen})) AS key,
                 row_number() OVER (
                   ORDER BY lower(substr(text, 1, {klen})), doc_id)
                   - 1 AS rnk
          FROM documents)
        SELECT least(a.doc_id, b.doc_id) AS doc_id_a,
               greatest(a.doc_id, b.doc_id) AS doc_id_b,
               CAST(levenshtein(a.key, b.key) AS BIGINT) AS edit_dist
        FROM k a JOIN k b
          ON b.rnk > a.rnk AND b.rnk - a.rnk <= {w}
        WHERE levenshtein(a.key, b.key) <= {maxed}
    """.format(klen=SN_KEY_LEN, w=SN_WINDOW, maxed=SN_MAX_ED),
    # df is the FULL count; string_agg skips the NULLs the CASE emits
    # past the cap, mirroring the engine's posting truncation
    "inverted_index": """
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x <> '') AS tk
          FROM documents),
        t AS (SELECT DISTINCT doc_id, unnest(tk) AS term FROM toks),
        r AS (SELECT term, doc_id,
                     row_number() OVER (PARTITION BY term
                                        ORDER BY doc_id) AS rn
              FROM t)
        SELECT term, CAST(count(*) AS BIGINT) AS df,
               string_agg(CASE WHEN rn <= {cap}
                               THEN CAST(doc_id AS VARCHAR) END,
                          ',' ORDER BY doc_id) AS postings
        FROM r GROUP BY term
    """.format(cap=INDEX_POSTING_CAP),
    "embedding_near_dups": """
        SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
        FROM embeddings a CROSS JOIN embeddings b
        WHERE a.vec_id < b.vec_id
          AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                     CAST(b.embedding AS DOUBLE[])) >= 0.4
    """,
    # CASE table generated from STRATA_PCT — one source of truth
    "stratified_sample": """
        SELECT doc_id, lang, n_chars FROM documents
        WHERE (doc_id::HUGEINT * 2654435761) % 4294967296 % 100 <
              CASE lang {cases} ELSE {dflt} END
    """.format(
        cases=" ".join(f"WHEN '{k}' THEN {v}"
                       for k, v in sorted(STRATA_PCT.items())),
        dflt=STRATA_DEFAULT_PCT,
    ),
    "sample_exact_k": """
        SELECT doc_id, lang, n_chars
        FROM documents
        ORDER BY (doc_id::HUGEINT * 2654435761) % 4294967296, doc_id
        LIMIT {k}
    """.format(k=SAMPLE_K),
    # gram width constants from stages/text.DUPG_N (one source of
    # truth): slice end = i + N - 1 (DuckDB list slices are 1-based
    # inclusive), range end = len - (N - 2)
    "dup_gram_mass": """
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS tk
          FROM documents),
        -- gram keys are md5_number_upper HASHES on both sides (the
        -- Ray side ships int64 hashes, never gram strings) — same
        -- hash ⇒ identical collision semantics
        pos AS (
          SELECT doc_id,
                 md5_number_upper(array_to_string(tk[i:i+{nm1}], ' '))
                     AS gh
          FROM toks, unnest(range(1, len(tk) - {nm2})) AS t(i)
          WHERE len(tk) >= {n}),
        dg AS (SELECT doc_id, gh, count(*) AS n_occ
               FROM pos GROUP BY doc_id, gh),
        dup AS (SELECT gh FROM dg GROUP BY gh HAVING count(*) >= 2),
        tot AS (SELECT doc_id, count(*) AS n_pos
                FROM pos GROUP BY doc_id),
        hits AS (SELECT doc_id, sum(n_occ) AS n_dup
                 FROM dg JOIN dup USING (gh) GROUP BY doc_id)
        SELECT t.doc_id, CAST(t.n_pos AS BIGINT) AS n_pos,
               CAST(coalesce(h.n_dup, 0) AS BIGINT) AS n_dup,
               CAST(coalesce(h.n_dup, 0) * 1000000 // t.n_pos
                    AS BIGINT) AS dup_frac_micro
        FROM tot t LEFT JOIN hits h USING (doc_id)
    """.format(n=tx.DUPG_N, nm1=tx.DUPG_N - 1, nm2=tx.DUPG_N - 2),
    "user_running_total": """
        SELECT event_id, user_id, ts,
               CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
                    OVER (PARTITION BY user_id
                          ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cum_value_micro
        FROM events
    """,
    "purchase_ffill": """
        SELECT event_id, user_id, ts,
               CAST(COALESCE(last_value(
                       CASE WHEN event_type = 'purchase'
                            THEN CAST(floor(value * 1000000 + 0.5)
                                      AS BIGINT) END IGNORE NULLS)
                    OVER (PARTITION BY user_id
                          ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING), -1)
                    AS BIGINT) AS last_purchase_micro
        FROM events
    """,
    "retained_users": """
        WITH b AS (
          SELECT (epoch_us(min(ts)) + epoch_us(max(ts))) // 2 AS mid
          FROM events),
        f AS (
          SELECT user_id,
                 CAST(count(*) FILTER (WHERE epoch_us(ts) <= b.mid)
                      AS BIGINT) AS n_first,
                 CAST(count(*) FILTER (WHERE epoch_us(ts) > b.mid)
                      AS BIGINT) AS n_second
          FROM events, b GROUP BY user_id)
        SELECT user_id, n_first, n_second
        FROM f WHERE n_first > 0 AND n_second > 0
    """,
    # integer-exact min-rank percentile: (rank-1)*1e6 // (N-1); rank()
    # gives min-rank on ties, matching the histogram cum-below + 1
    "percentile_rank": """
        WITH r AS (
          SELECT doc_id, n_chars,
                 rank() OVER (ORDER BY n_chars) AS rk,
                 count(*) OVER () AS n
          FROM documents)
        SELECT doc_id, CAST(n_chars AS BIGINT) AS n_chars,
               CAST((rk - 1) * 1000000 // greatest(1, n - 1) AS BIGINT)
                   AS pct_micro
        FROM r
    """,
    "user_customer_outer": """
        WITH u AS (
          SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                 CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
                      AS BIGINT) AS sum_value_micro
          FROM events GROUP BY user_id),
        c AS (
          SELECT c_custkey, c_name,
                 CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_c
          FROM customer WHERE c_custkey % 2 = 0)
        SELECT CAST(coalesce(u.user_id, c.c_custkey) AS BIGINT) AS id,
               u.user_id IS NOT NULL AS has_events,
               CAST(coalesce(u.n_events, 0) AS BIGINT) AS n_events,
               CAST(coalesce(u.sum_value_micro, 0) AS BIGINT)
                   AS sum_value_micro,
               c.c_custkey IS NOT NULL AS has_account,
               coalesce(c.c_name, '') AS c_name,
               CAST(coalesce(c.acctbal_c, 0) AS BIGINT) AS acctbal_c
        FROM u FULL OUTER JOIN c ON u.user_id = c.c_custkey
    """,
    # rarity = (N·10^6) // df — the exact-rational idf stand-in; the
    # df*2<=N HAVING mirrors the stage's hot-term exclusion; top-k from
    # TFIDF_TOPK (one source of truth)
    "tfidf_top_terms": """
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(text, '\\s+'),
                             x -> x <> '') AS tk
          FROM documents),
        tf AS (
          SELECT doc_id, term, count(*) AS tf
          FROM (SELECT doc_id, unnest(tk) AS term FROM toks)
          GROUP BY doc_id, term),
        n AS (SELECT count(*) AS n FROM documents),
        r AS (
          SELECT term, (n.n * 1000000) // count(*) AS rarity
          FROM tf, n GROUP BY term, n.n
          HAVING count(*) * {hden} <= {hnum} * n.n),
        sc AS (
          SELECT tf.doc_id, tf.term, tf.tf,
                 tf.tf * r.rarity AS score_micro,
                 row_number() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY tf.tf * r.rarity DESC, tf.term ASC) AS rnk
          FROM tf JOIN r USING (term))
        SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, term,
               CAST(tf AS BIGINT) AS tf,
               CAST(score_micro AS BIGINT) AS score_micro
        FROM sc WHERE rnk <= {k}
    """.format(k=TFIDF_TOPK, hnum=TFIDF_HOT_NUM, hden=TFIDF_HOT_DEN),
    "user_first_last": """
        WITH e AS (
          SELECT event_id, ts, user_id, event_type,
                 CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
          FROM events),
        f AS (
          SELECT user_id, ts, event_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts ASC, event_id ASC) AS rn
          FROM e),
        l AS (
          SELECT user_id, ts, event_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn
          FROM e),
        a AS (
          SELECT user_id, count(*) AS n_events,
                 CAST(sum(v) AS BIGINT) AS sum_value_micro
          FROM e GROUP BY user_id)
        SELECT a.user_id, a.n_events, a.sum_value_micro,
               f.ts AS first_ts, f.event_id AS first_event_id,
               f.event_type AS first_type,
               l.ts AS last_ts, l.event_id AS last_event_id,
               l.event_type AS last_type
        FROM a
        JOIN f ON f.user_id = a.user_id AND f.rn = 1
        JOIN l ON l.user_id = a.user_id AND l.rn = 1
    """,
    "event_transitions": """
        WITH x AS (
          SELECT user_id, event_type,
                 lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_type
          FROM events)
        SELECT prev_type, event_type AS next_type, count(*) AS n
        FROM x WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
    """,
    "length_outliers": """
        WITH t AS (
          SELECT CAST(quantile_disc(n_chars, 0.99) AS BIGINT) AS thr
          FROM documents)
        SELECT lang,
               CAST(count(*) FILTER (WHERE n_chars <= t.thr) AS BIGINT)
                   AS n_kept,
               CAST(count(*) FILTER (WHERE n_chars > t.thr) AS BIGINT)
                   AS n_dropped
        FROM documents, t GROUP BY lang
    """,
    # threshold from BIG_ORDER_QTY_MICRO (one source of truth)
    "big_orders": """
        WITH q AS (
          SELECT l_orderkey,
                 CAST(sum(CAST(floor(l_quantity * 1000000 + 0.5)
                               AS BIGINT)) AS BIGINT) AS sum_qty_micro
          FROM lineitem GROUP BY l_orderkey
          HAVING sum(CAST(floor(l_quantity * 1000000 + 0.5) AS BIGINT))
                 >= {thr})
        SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
               CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)
                   AS price_c,
               q.sum_qty_micro
        FROM q
        JOIN orders o ON o.o_orderkey = q.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        ORDER BY q.sum_qty_micro DESC, o.o_orderkey ASC
        LIMIT 100
    """.format(thr=BIG_ORDER_QTY_MICRO),
    "inactive_customers": """
        SELECT c_custkey, c_name,
               CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS acctbal_c
        FROM customer c
        WHERE NOT EXISTS (
          SELECT 1 FROM orders o
          WHERE o.o_custkey = c.c_custkey
            AND o.o_orderdate >= TIMESTAMP '{cut}')
    """.format(cut=INACTIVE_CUTOFF),
    "hash_sample": """
        SELECT doc_id, lang, n_chars
        FROM documents
        WHERE ((doc_id::HUGEINT * 2654435761) % 4294967296) % 100 < 7
    """,
    # shard count from the stage constant (TRAIN_SHARDS) — one source
    # of truth; key formula is the wrap-safe Knuth hash (_knuth32)
    "training_shuffle": """
        WITH keyed AS (
          SELECT doc_id,
                 CAST((doc_id::HUGEINT * 2654435761) % 4294967296
                      AS BIGINT) AS k
          FROM documents)
        SELECT doc_id, k % {ns} AS shard,
               CAST(row_number() OVER (
                      PARTITION BY k % {ns} ORDER BY k, doc_id) - 1
                    AS BIGINT) AS pos
        FROM keyed
    """.format(ns=TRAIN_SHARDS),
    "corpus_curation": """
        WITH s AS (
          SELECT doc_id, text,
                 CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                      x -> x <> '')) AS BIGINT) AS n_tokens,
                 CAST(len(list_filter(string_split_regex(text, '\\s+'),
                                      x -> x IN {stop})) AS BIGINT) AS n_stop
          FROM documents),
        q AS (SELECT * FROM s
              WHERE n_tokens >= 10 AND n_stop * 50 >= n_tokens),
        d AS (SELECT md5(text) AS m,
                     CAST(min(doc_id) AS BIGINT) AS doc_id,
                     CAST(min(n_tokens) AS BIGINT) AS n_tokens
              FROM q GROUP BY md5(text))
        SELECT doc_id, n_tokens FROM d
        WHERE ((doc_id::HUGEINT * 2654435761) % 4294967296) % 100 < 50
    """.format(stop=_STOP_SQL),
    "per_lang_top5": """
        WITH r AS (
          SELECT lang, doc_id, n_chars,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY n_chars DESC, doc_id ASC) AS rnk
          FROM documents)
        SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS n_chars,
               CAST(rnk AS BIGINT) AS rnk
        FROM r WHERE rnk <= 5
    """,
    "latest_orders": """
        SELECT o_orderkey, o_custkey, o_orderdate,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
        FROM orders
        ORDER BY o_orderdate DESC, o_orderkey ASC
        LIMIT 100
    """,
    "filter_regex": """
        SELECT source, count(*) AS n_docs
        FROM documents
        WHERE regexp_matches(text, '(fast|slow) (table|scan)')
        GROUP BY source
    """,
    # real-decoder prediction from the payload-generation rule: image
    # slices (doc_id%5 in 0..3) carry real PPM/BMP/PNG/JPEG files with
    # w = 4+L%60, h = 4+3L%60; PNG is grayscale (1 channel); n_bytes
    # is the DECODED buffer w*h*c. The raw slice (doc_id%5=4) takes
    # the stub formula over the wire length.
    "multimodal_decode": """
        WITH d AS (
          SELECT doc_id, octet_length(encode(text)) AS L
          FROM documents),
        dim AS (
          SELECT doc_id, L,
                 CASE WHEN doc_id % 5 = 4 THEN 64 + L % 512
                      WHEN doc_id % 5 = 3 THEN 8 * (1 + L % 7)
                      ELSE 4 + L % 60 END AS w,
                 CASE WHEN doc_id % 5 = 4 THEN 64 + (L * 7) % 512
                      WHEN doc_id % 5 = 3 THEN 8 * (1 + (L * 3) % 7)
                      ELSE 4 + (L * 3) % 60 END AS h,
                 CASE WHEN doc_id % 5 IN (2, 3) THEN 1 ELSE 3 END AS c
          FROM d)
        SELECT doc_id,
               CAST(w AS BIGINT) AS width,
               CAST(h AS BIGINT) AS height,
               CAST(c AS BIGINT) AS channels,
               CAST(CASE WHEN doc_id % 5 = 4 THEN L
                    ELSE w * h * c END AS BIGINT) AS n_bytes
        FROM dim
    """,
    # real NN-resample oracle: the decoded buffers rebuild exactly as
    # in multimodal_features (incl. the REAL decoded grayscale-JPEG
    # slice — constant 8×8 blocks from the text bytes), then the
    # thumbnail is re-derived pixel-by-pixel — output cell (r,c) is
    # the 2·ch hex chars at source pixel ((r·h)//nh)·w + ((c·w)//nw),
    # concatenated in row-major order (string_agg ORDER BY r,c) — and
    # md5'd. Wire rows (the raw slice) run the same resize
    # arithmetic; their sig covers wire bytes.
    "multimodal_resize": """
        WITH d AS (
          SELECT doc_id,
                 CASE WHEN octet_length(encode(text)) = 0 THEN '00'
                      ELSE to_hex(encode(text)) END AS th,
                 greatest(octet_length(encode(text)), 1) AS L,
                 octet_length(encode(text)) AS L0
          FROM documents),
        dim AS (
          SELECT doc_id, th, L, L0,
                 CASE WHEN doc_id % 5 = 4 THEN 64 + L0 % 512
                      WHEN doc_id % 5 = 3 THEN 8 * (1 + L0 % 7)
                      ELSE 4 + L0 % 60 END AS w,
                 CASE WHEN doc_id % 5 = 4 THEN 64 + (L0 * 7) % 512
                      WHEN doc_id % 5 = 3 THEN 8 * (1 + (L0 * 3) % 7)
                      ELSE 4 + (L0 * 3) % 60 END AS h,
                 CASE WHEN doc_id % 5 IN (2, 3) THEN 1 ELSE 3 END AS ch
          FROM d),
        jdim AS (
          SELECT doc_id, th, L,
                 1 + L0 % 7 AS jbw, 1 + (L0 * 3) % 7 AS jbh
          FROM d WHERE doc_id % 5 = 3),
        jcell AS (
          SELECT j.doc_id, y.by, x.bx,
                 repeat(substr(j.th,
                               ((y.by * j.jbw + x.bx) % j.L) * 2 + 1,
                               2), 8) AS cell
          FROM jdim j, unnest(range(j.jbh)) AS y(by),
               unnest(range(j.jbw)) AS x(bx)),
        jline AS (
          SELECT doc_id, by,
                 repeat(string_agg(cell, '' ORDER BY bx), 8) AS line
          FROM jcell GROUP BY doc_id, by),
        jbuf AS (
          SELECT doc_id, string_agg(line, '' ORDER BY by) AS jh
          FROM jline GROUP BY doc_id),
        buf AS (
          SELECT dim.doc_id, w, h, ch,
                 CASE dim.doc_id % 5
                   WHEN 0 THEN substr(repeat(th, (w*h*3) // L + 1),
                                      1, 2*w*h*3)
                   WHEN 1 THEN repeat(substr(repeat(th, (w*3) // L + 1),
                                             1, 2*w*3), h)
                   WHEN 2 THEN repeat(substr(repeat(th, w // L + 1),
                                             1, 2*w), h)
                   WHEN 3 THEN jbuf.jh
                 END AS bh
          FROM dim LEFT JOIN jbuf ON dim.doc_id = jbuf.doc_id
          WHERE dim.doc_id % 5 IN (0, 1, 2, 3)),
        geo AS (
          SELECT doc_id, w, h, ch, bh, greatest(w, h) AS m,
                 CASE WHEN greatest(w, h) > MAXS
                      THEN w * MAXS // greatest(w, h) ELSE w END AS nw,
                 CASE WHEN greatest(w, h) > MAXS
                      THEN h * MAXS // greatest(w, h) ELSE h END AS nh
          FROM buf),
        rs AS (
          SELECT g.doc_id,
                 string_agg(substr(g.bh,
                                   (((r.r * g.h) // g.nh) * g.w
                                    + ((c.c * g.w) // g.nw))
                                   * g.ch * 2 + 1,
                                   g.ch * 2), '' ORDER BY r.r, c.c) AS rb
          FROM geo g,
               unnest(range(g.nh)) AS r(r),
               unnest(range(g.nw)) AS c(c)
          WHERE g.m > MAXS
          GROUP BY g.doc_id),
        pix AS (
          SELECT g.doc_id, 'pixels' AS kind,
                 CAST(g.nw AS BIGINT) AS width,
                 CAST(g.nh AS BIGINT) AS height,
                 g.m > MAXS AS resized,
                 substr(md5(CASE WHEN g.m > MAXS THEN rs.rb
                                 ELSE g.bh END), 1, 16) AS sig
          FROM geo g LEFT JOIN rs ON g.doc_id = rs.doc_id),
        wire AS (
          SELECT doc_id, 'wire' AS kind,
                 CAST(CASE WHEN greatest(w, h) > MAXS
                      THEN w * MAXS // greatest(w, h) ELSE w END
                      AS BIGINT) AS width,
                 CAST(CASE WHEN greatest(w, h) > MAXS
                      THEN h * MAXS // greatest(w, h) ELSE h END
                      AS BIGINT) AS height,
                 greatest(w, h) > MAXS AS resized,
                 substr(md5(CASE WHEN L0 = 0 THEN '' ELSE th END),
                        1, 16) AS sig
          FROM dim WHERE doc_id % 5 = 4)
        SELECT * FROM pix UNION ALL SELECT * FROM wire
    """.replace("MAXS", str(RESIZE_MAX_SIDE)),
    # the real-pixel feature kernel reconstructed in the hex domain:
    # every byte is exactly 2 hex chars, so tiling/row-repeat in hex
    # equals tiling bytes; md5 runs over the UPPERCASE hex string on
    # both sides (DuckDB md5() is VARCHAR-only — the kernel hashes
    # buf.hex().upper() to match). PPM rasters tile the text bytes
    # continuously; BMP/PNG rows each restart the tile (generator
    # rule, sources/corpus.synth_image); the JPEG slice is now a REAL
    # baseline grayscale JPEG decoded to PIXELS (VERDICT r4 task 4) —
    # each 8×8 block is the constant text byte at its block index, so
    # the decoded buffer rebuilds as rows of 8-repeated hex pairs;
    # the raw slice is the utf-8 text itself.
    "multimodal_features": """
        WITH d AS (
          SELECT doc_id,
                 CASE WHEN octet_length(encode(text)) = 0 THEN '00'
                      ELSE to_hex(encode(text)) END AS th,
                 greatest(octet_length(encode(text)), 1) AS L,
                 octet_length(encode(text)) AS L0
          FROM documents),
        dim AS (
          SELECT doc_id, th, L, L0,
                 4 + L0 % 60 AS w, 4 + (L0 * 3) % 60 AS h
          FROM d),
        jdim AS (
          SELECT doc_id, th, L,
                 1 + L0 % 7 AS jbw, 1 + (L0 * 3) % 7 AS jbh
          FROM d WHERE doc_id % 5 = 3),
        jcell AS (
          SELECT j.doc_id, y.by, x.bx,
                 repeat(substr(j.th,
                               ((y.by * j.jbw + x.bx) % j.L) * 2 + 1,
                               2), 8) AS cell
          FROM jdim j, unnest(range(j.jbh)) AS y(by),
               unnest(range(j.jbw)) AS x(bx)),
        jline AS (
          SELECT doc_id, by,
                 repeat(string_agg(cell, '' ORDER BY bx), 8) AS line
          FROM jcell GROUP BY doc_id, by),
        jbuf AS (
          SELECT doc_id, string_agg(line, '' ORDER BY by) AS jh
          FROM jline GROUP BY doc_id),
        buf AS (
          SELECT dim.doc_id,
                 CASE dim.doc_id % 5
                   WHEN 0 THEN substr(repeat(th, (w*h*3) // L + 1),
                                      1, 2*w*h*3)
                   WHEN 1 THEN repeat(substr(repeat(th, (w*3) // L + 1),
                                             1, 2*w*3), h)
                   WHEN 2 THEN repeat(substr(repeat(th, w // L + 1),
                                             1, 2*w), h)
                   WHEN 3 THEN jbuf.jh
                   ELSE CASE WHEN L0 = 0 THEN '' ELSE th END
                 END AS bh,
                 CASE WHEN dim.doc_id % 5 IN (0, 1, 2, 3)
                      THEN 'pixels' ELSE 'wire' END AS kind
          FROM dim LEFT JOIN jbuf ON dim.doc_id = jbuf.doc_id)
        SELECT doc_id, kind,
               substr(md5(bh), 1, 16) AS feature_sig,
               CAST(length(bh) // 2 AS BIGINT) AS n_units
        FROM buf
    """,
    # real WAV RIFF-walk decode: PCM fields + md5 of the exact PCM
    # buffer (tiled text bytes, reconstructed in the hex domain)
    "audio_decode": """
        WITH d AS (
          SELECT doc_id,
                 CASE WHEN octet_length(encode(text)) = 0 THEN '00'
                      ELSE to_hex(encode(text)) END AS th,
                 greatest(octet_length(encode(text)), 1) AS L,
                 octet_length(encode(text)) AS L0
          FROM documents),
        w AS (
          SELECT doc_id, th, L, L0,
                 8000 + 100 * (L0 % 80) AS rate,
                 16 + L0 % 500 AS ns
          FROM d)
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 2 THEN 'wire' ELSE 'wav' END
                   AS kind,
               CAST(CASE WHEN doc_id % 3 = 2 THEN 0 ELSE rate END
                    AS BIGINT) AS sample_rate,
               CAST(CASE WHEN doc_id % 3 = 2 THEN 0 ELSE 1 END
                    AS BIGINT) AS channels,
               CAST(CASE WHEN doc_id % 3 = 2 THEN 0 ELSE ns END
                    AS BIGINT) AS n_samples,
               CAST(CASE WHEN doc_id % 3 = 2 THEN 0
                    ELSE ns * 1000 // rate END AS BIGINT) AS duration_ms,
               substr(md5(CASE WHEN doc_id % 3 = 2
                          THEN CASE WHEN L0 = 0 THEN '' ELSE th END
                          ELSE substr(repeat(th, (2 * ns) // L + 1),
                                      1, 4 * ns) END), 1, 16) AS sig
        FROM w
    """,
    # T107: clusters CTE (T29) + keep = longest per cluster
    "dedup_keep_best": """
        WITH RECURSIVE {cte},
        edges AS (
          SELECT doc_id_a AS a, doc_id_b AS b FROM mpairs
          UNION SELECT doc_id_b, doc_id_a FROM mpairs),
        reach(a, b) AS (
          SELECT a, b FROM edges
          UNION
          SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
        cl AS (
          SELECT a AS doc_id, least(a, min(b)) AS rep
          FROM reach GROUP BY a),
        f AS (
          SELECT d.doc_id, d.n_chars,
                 coalesce(cl.rep, d.doc_id) AS rep_doc_id
          FROM documents d LEFT JOIN cl USING (doc_id))
        SELECT doc_id, CAST(rep_doc_id AS BIGINT) AS rep_doc_id,
               CAST(n_chars AS BIGINT) AS n_chars,
               row_number() OVER (
                 PARTITION BY rep_doc_id
                 ORDER BY n_chars DESC, doc_id) = 1 AS keep
        FROM f
    """.format(cte=_MINHASH_PAIRS_CTE),
    # T106: non-overlapping replace() counts == the automaton's
    # overlapping counts for borderless patterns (enforced at build)
    "substring_scan": """
        SELECT doc_id,
               CAST((length(text) - length(replace(text, 'ta', ''))) // 2 + (length(text) - length(replace(text, 'art', ''))) // 3 + (length(text) - length(replace(text, 'row', ''))) // 3 + (length(text) - length(replace(text, 'an', ''))) // 2 + (length(text) - length(replace(text, 'ue', ''))) // 2 AS BIGINT) AS n_hits,
               CAST(CASE WHEN length(text) <> length(replace(text, 'ta', '')) THEN 1 ELSE 0 END + CASE WHEN length(text) <> length(replace(text, 'art', '')) THEN 1 ELSE 0 END + CASE WHEN length(text) <> length(replace(text, 'row', '')) THEN 1 ELSE 0 END + CASE WHEN length(text) <> length(replace(text, 'an', '')) THEN 1 ELSE 0 END + CASE WHEN length(text) <> length(replace(text, 'ue', '')) THEN 1 ELSE 0 END AS BIGINT) AS n_patterns_hit
        FROM documents
    """,
    # T105: every PCM sample recomputed in SQL — hex digit pairs →
    # little-endian int16 (two's complement via the >=32768 branch)
    "audio_features": """
        WITH d AS (
          SELECT doc_id,
                 CASE WHEN octet_length(encode(text)) = 0 THEN '00'
                      ELSE to_hex(encode(text)) END AS th,
                 greatest(octet_length(encode(text)), 1) AS L,
                 octet_length(encode(text)) AS L0
          FROM documents),
        w AS (
          SELECT doc_id, th, L, 16 + L0 % 500 AS ns
          FROM d WHERE doc_id % 3 <> 2),
        pcm AS (
          SELECT doc_id, ns,
                 substr(repeat(th, (2 * ns) // L + 1), 1, 4 * ns) AS ph
          FROM w),
        sam AS (
          SELECT doc_id,
                 (strpos('0123456789ABCDEF',
                         substr(ph, 4 * t.i + 1, 1)) - 1) * 16
                 + (strpos('0123456789ABCDEF',
                           substr(ph, 4 * t.i + 2, 1)) - 1)
                 + 256 * ((strpos('0123456789ABCDEF',
                                  substr(ph, 4 * t.i + 3, 1)) - 1) * 16
                          + (strpos('0123456789ABCDEF',
                                    substr(ph, 4 * t.i + 4, 1)) - 1))
                     AS u
          FROM pcm, unnest(range(ns)) AS t(i)),
        val AS (
          SELECT doc_id,
                 CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS v
          FROM sam),
        agg AS (
          SELECT doc_id, count(*) AS n, sum(abs(v)) AS sa,
                 sum(v * v) AS sq, max(abs(v)) AS pk
          FROM val GROUP BY doc_id)
        SELECT d.doc_id,
               CASE WHEN d.doc_id % 3 = 2 THEN 'wire' ELSE 'wav' END
                   AS kind,
               CAST(coalesce(a.n, 0) AS BIGINT) AS n_samples,
               CAST(coalesce(a.sa, 0) AS BIGINT) AS sum_abs,
               CAST(coalesce(a.sq, 0) AS BIGINT) AS sum_sq,
               CAST(coalesce(a.pk, 0) AS BIGINT) AS peak
        FROM d LEFT JOIN agg a USING (doc_id)
    """,
    # real GIF / AVI container counters (frame counts from the
    # generation rule), declared stub formula on the raw slice
    "frame_sample": f"""
        WITH n AS (
          SELECT doc_id,
                 CASE doc_id % 3 WHEN 0 THEN 'gif' WHEN 1 THEN 'avi'
                      ELSE 'stub' END AS kind,
                 CASE doc_id % 3
                   WHEN 0 THEN 1 + octet_length(encode(text))
                               % {GIF_MAX_FRAMES}
                   WHEN 1 THEN 1 + octet_length(encode(text))
                               % {AVI_MAX_FRAMES}
                   ELSE 1 + octet_length(encode(text)) % 300 END
                     AS nf
          FROM documents)
        SELECT doc_id, kind,
               CAST(unnest(range(0, nf, 10)) AS BIGINT) AS frame_idx
        FROM n
    """,
    # T73: deletion-neighborhood result == the exact ed≤1 self-join
    "fuzzy_prefix_dups": f"""
        WITH p AS (
          SELECT doc_id, substr(text, 1, {FUZZY_PREFIX_LEN}) AS pfx
          FROM documents)
        SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
               CAST(levenshtein(a.pfx, b.pfx) AS BIGINT) AS edit_dist
        FROM p a JOIN p b ON a.doc_id < b.doc_id
        WHERE levenshtein(a.pfx, b.pfx) <= 1
    """,
    "sample_k_per_lang": f"""
        SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST((doc_id::HUGEINT * 2654435761) % 4294967296
                    AS BIGINT) AS h
        FROM documents
        QUALIFY row_number() OVER (
            PARTITION BY lang
            ORDER BY (doc_id::HUGEINT * 2654435761) % 4294967296, doc_id
        ) <= {SAMPLE_PER_LANG_K}
    """,
    # T75: EXISTS-based burst suppression (a dropped row still
    # suppresses its successors — mirrors the lag-gap reduction)
    "window_dedup": f"""
        SELECT event_id, user_id, event_type, ts
        FROM events e
        WHERE NOT EXISTS (
          SELECT 1 FROM events p
          WHERE p.user_id = e.user_id AND p.event_type = e.event_type
            AND (p.ts < e.ts OR (p.ts = e.ts AND p.event_id < e.event_id))
            AND epoch_us(e.ts) - epoch_us(p.ts) <= {WINDOW_DEDUP_US})
    """,
    "dataset_mix": f"""
        WITH r AS (
          SELECT doc_id, source,
                 row_number() OVER (
                   PARTITION BY source
                   ORDER BY (doc_id::HUGEINT * 2654435761) % 4294967296,
                            doc_id) AS rk,
                 1 + CAST(regexp_extract(source, '(\\d+)$', 1) AS BIGINT) % 5
                     AS w
          FROM documents)
        SELECT doc_id, source, CAST(rk AS BIGINT) AS rank_in_source,
               CAST(rk * 1000000 // w AS BIGINT) AS mix_pos
        FROM r
        ORDER BY mix_pos, source, doc_id
        LIMIT {MIX_K}
    """,
    "bigram_pmi": f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> x <> '') AS tk
          FROM documents),
        uni AS (
          SELECT tk[i] AS w, count(*)::HUGEINT AS c
          FROM toks, unnest(range(1, len(tk) + 1)) AS t(i)
          GROUP BY w),
        bi AS (
          SELECT tk[i] AS w1, tk[i+1] AS w2, count(*)::HUGEINT AS c
          FROM toks, unnest(range(1, len(tk))) AS t(i)
          WHERE len(tk) >= 2
          GROUP BY w1, w2),
        tot AS (SELECT (SELECT sum(c) FROM uni) AS nu,
                       (SELECT sum(c) FROM bi) AS nb)
        SELECT w1, w2, CAST(bi.c AS BIGINT) AS n_pairs,
               CAST(bi.c * nu * nu * 1000000
                    // (nb * u1.c * u2.c) AS BIGINT) AS pmi_micro
        FROM bi
        CROSS JOIN tot
        JOIN uni u1 ON bi.w1 = u1.w
        JOIN uni u2 ON bi.w2 = u2.w
        WHERE bi.c >= {PMI_MIN_PAIRS}
        ORDER BY pmi_micro DESC, w1, w2
        LIMIT 20
    """,
    "value_variance": """
        WITH x AS (
          SELECT event_type,
                 CAST(floor(value * 1000 + 0.5) AS HUGEINT) AS v
          FROM events)
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST((count(*)::HUGEINT * sum(v * v)
                     - sum(v) * sum(v))
                    // (count(*)::HUGEINT * count(*)::HUGEINT)
                    AS BIGINT) AS var_milli2
        FROM x GROUP BY event_type
    """,
    "price_date_cov": """
        WITH x AS (
          SELECT o_orderpriority,
                 CAST(floor(o_totalprice * 100 + 0.5) AS HUGEINT) AS px,
                 CAST(epoch_us(o_orderdate) // 86400000000 AS HUGEINT)
                     AS dy
          FROM orders),
        m AS (
          -- DuckDB // truncates toward zero; the engine's Python //
          -- floors, so spell out floor semantics with a nonnegative
          -- mod (the covariance numerator CAN be negative)
          SELECT o_orderpriority,
                 count(*)::HUGEINT AS n,
                 count(*)::HUGEINT * sum(px * dy) - sum(px) * sum(dy)
                     AS num
          FROM x GROUP BY o_orderpriority)
        SELECT o_orderpriority,
               CAST(n AS BIGINT) AS n_orders,
               CAST((num - (((num % (n * n)) + n * n) % (n * n)))
                    // (n * n) AS BIGINT) AS cov_cents_days
        FROM m
    """,
    "lang_source_cube": f"""
        SELECT COALESCE(lang, '{ROLLUP_ALL}') AS lang,
               COALESCE(source, '{ROLLUP_ALL}') AS source,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents
        GROUP BY CUBE (lang, source)
    """,
    "ntile_deciles": f"""
        WITH t AS (
          SELECT n_chars,
                 ntile({NTILE_K}) OVER (ORDER BY n_chars, doc_id)
                     AS decile
          FROM documents)
        SELECT CAST(decile AS BIGINT) AS decile,
               count(*) AS n_docs,
               CAST(min(n_chars) AS BIGINT) AS min_chars,
               CAST(max(n_chars) AS BIGINT) AS max_chars
        FROM t GROUP BY decile
    """,
    "next_event_gap": f"""
        SELECT event_id, user_id,
               COALESCE(
                 lead(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id)
                 - epoch_us(ts), {GAP_SENTINEL_US}) AS gap_us
        FROM events
    """,
    "salted_user_join": """
        SELECT e.event_id, e.user_id,
               CAST(floor(e.value * 1000000 + 0.5) AS BIGINT)
                   AS value_micro,
               c.c_name
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
    "normalized_dedup": f"""
        WITH n AS (
          SELECT doc_id,
                 md5(array_to_string(
                   list_filter(string_split_regex(lower(text), '\\s+'),
                               x -> x <> '' AND x NOT IN {_STOP_SQL}),
                   ' ')) AS norm_md5
          FROM documents)
        SELECT norm_md5,
               CAST(min(doc_id) AS BIGINT) AS rep_doc_id,
               count(*) AS n_copies
        FROM n GROUP BY norm_md5
    """,
    "event_cooccurrence": """
        WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*) AS n_users
        FROM d a JOIN d b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY type_a, type_b
    """,
    "orders_page": f"""
        SELECT o_orderkey, o_orderdate,
               CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_c
        FROM orders
        ORDER BY o_orderdate DESC, o_orderkey
        LIMIT {PAGE_LIMIT} OFFSET {PAGE_OFFSET}
    """,
    "dense_order_grid": """
        WITH cnt AS (
          SELECT c_nationkey AS nk, year(o_orderdate) AS y,
                 count(*) AS c,
                 sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS s
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY nk, y),
        years AS (SELECT DISTINCT y FROM cnt)
        SELECT n.n_name, CAST(years.y AS BIGINT) AS order_year,
               COALESCE(cnt.c, 0) AS n_orders,
               CAST(COALESCE(cnt.s, 0) AS BIGINT) AS sum_cents
        FROM nation n CROSS JOIN years
        LEFT JOIN cnt ON cnt.nk = n.n_nationkey AND cnt.y = years.y
    """,
    "label_pair_sim": """
        WITH q AS (
          SELECT label, vec_id, r.i - 1 AS dim,
                 CAST(floor(CAST(embedding[r.i] AS DOUBLE) * 1000)
                      AS HUGEINT) AS v
          FROM embeddings,
               unnest(range(1, len(embedding) + 1)) AS r(i)),
        s AS (
          SELECT label, dim, sum(v) AS sd, sum(v * v) AS qd
          FROM q GROUP BY label, dim),
        l AS (
          SELECT label, sum(sd * sd) - sum(qd) AS num
          FROM s GROUP BY label),
        n AS (SELECT label, count(*)::HUGEINT AS n FROM embeddings
              GROUP BY label)
        SELECT CAST(l.label AS BIGINT) AS label,
               CAST(n.n AS BIGINT) AS n_vecs,
               CAST((num - (((num % (n * (n - 1))) + n * (n - 1))
                            % (n * (n - 1))))
                    // (n * (n - 1)) AS BIGINT) AS mean_pair_dot_micro
        FROM l JOIN n ON l.label = n.label
        WHERE n.n >= 2
    """,
}

# The MG heavy-hitters twin must EQUAL the exact top-20 (sketch-prune +
# exact rescore), so it shares the oracle verbatim.
ORACLES["ngram_top20_mg"] = ORACLES["ngram_top20"]

ORACLES["dataset_split"] = """
    WITH s AS (
      SELECT CASE
               WHEN ((doc_id::HUGEINT * 2654435761) % 4294967296)
                    % 100 < 90 THEN 'train'
               WHEN ((doc_id::HUGEINT * 2654435761) % 4294967296)
                    % 100 < 95 THEN 'val'
               ELSE 'test' END AS split,
             n_chars
      FROM documents)
    SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
    FROM s GROUP BY split
"""

ORACLES["local_supplier_volume"] = """
    SELECT n_name,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                               * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
               AS revenue_micro
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE c_nationkey = s_nationkey
      AND o_orderdate >= TIMESTAMP '{lo}'
      AND o_orderdate <  TIMESTAMP '{hi}'
    GROUP BY n_name
""".format(lo=NATION_REV_LO, hi=NATION_REV_HI)

ORACLES["new_users_daily"] = """
    WITH fs AS (
      SELECT user_id, min(ts) AS first_ts FROM events GROUP BY user_id),
    d AS (
      SELECT date_trunc('day', first_ts) AS day,
             CAST(count(*) AS BIGINT) AS n_new_users
      FROM fs GROUP BY 1)
    SELECT day, n_new_users,
           CAST(sum(n_new_users) OVER (ORDER BY day) AS BIGINT)
               AS cum_users
    FROM d
"""

ORACLES["heavy_hitters_cms"] = """
    WITH tot AS (
      SELECT count(*) AS t, count(DISTINCT user_id) AS u FROM events)
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id
    HAVING count(*) * (SELECT u FROM tot) * 10 >= 12 * (SELECT t FROM tot)
"""

ORACLES["lang_confusion"] = f"""
    SELECT d.lang AS lang, p.lang_pred AS lang_pred,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM documents d JOIN ({_lang_id_sql()}) p ON d.doc_id = p.doc_id
    GROUP BY 1, 2
"""

ORACLES["zipf_slope"] = f"""
    WITH tk AS (
      SELECT lang,
             unnest(list_filter(string_split_regex(text, '\\s+'),
                                x -> x <> '')) AS w
      FROM documents),
    c AS (SELECT lang, w, count(*) AS n FROM tk GROUP BY 1, 2),
    r AS (
      SELECT lang, n,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n DESC, w ASC) AS rk
      FROM c QUALIFY rk <= {ZIPF_RANKS}),
    s AS (
      SELECT lang, count(*) AS m,
             sum(ln(rk)) AS sx, sum(ln(n)) AS sy,
             sum(ln(rk) * ln(n)) AS sxy, sum(ln(rk) * ln(rk)) AS sxx
      FROM r GROUP BY lang)
    SELECT lang, CAST(m AS BIGINT) AS n_types,
           CAST(CASE WHEN m < 2 OR (m * sxx - sx * sx) = 0 THEN 0
                ELSE floor((m * sxy - sx * sy) / (m * sxx - sx * sx)
                           * 1000000 + 0.5) END AS BIGINT) AS slope_micro
    FROM s
"""

ORACLES["char_diversity"] = """
    WITH ch AS (
      SELECT doc_id, substr(text, i, 1) AS ch
      FROM documents, unnest(range(1, length(text) + 1)) AS r(i)),
    c AS (SELECT doc_id, ch, count(*) AS c FROM ch GROUP BY 1, 2),
    s AS (
      SELECT doc_id, sum(c) AS n, count(*) AS d,
             sum(c * (c - 1)) AS num
      FROM c GROUP BY doc_id)
    SELECT d.doc_id AS doc_id,
           CAST(COALESCE(s.n, 0) AS BIGINT) AS n_chars_obs,
           CAST(COALESCE(s.d, 0) AS BIGINT) AS n_distinct_chars,
           CAST(CASE WHEN COALESCE(s.n, 0) < 2 THEN 0
                ELSE s.num * 1000000 // (s.n * (s.n - 1))
                END AS BIGINT) AS char_repeat_micro
    FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id
"""

ORACLES["bpe_pair_merge"] = """
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(text, '\\s+'),
                                x -> x <> '')) AS w
      FROM documents),
    p AS (
      SELECT substr(w, i, 2) AS pair
      FROM toks, unnest(range(1, length(w))) AS r(i)
      WHERE length(w) >= 2)
    SELECT pair, CAST(count(*) AS BIGINT) AS n
    FROM p GROUP BY pair
    ORDER BY n DESC, pair ASC LIMIT 20
"""


def _extract_oracle_cte() -> str:
    """Shared CTE for the flagship oracles: derives doc_type / ok /
    error_kind / n_bytes INDEPENDENTLY from the raw corpus parquet —
    kind from the generator's url path (ground truth by construction),
    pdf success from the %%EOF trailer bytes minus the /Encrypt token,
    legacy-OLE2 success from the UTF-16 stream-name markers
    (WordDocument / Workbook / PowerPoint Document) that survive iff
    the CFB directory survives (cfb_write puts it last; the corpus
    truncation variant cuts before it). Byte-aligned token scans use
    odd-1-based strpos over hex(); the Python side's upfront checks
    make every rule exact — equivalence asserted per-doc in
    tests/test_pdf_extract.py and tests/test_office_extract.py."""
    glob = os.path.join(_corpus_dir(), "*.parquet")
    doc_hex = "WordDocument".encode("utf-16-le").hex().upper()
    xls_hex = "Workbook".encode("utf-16-le").hex().upper()
    ppt_hex = "PowerPoint Document".encode("utf-16-le").hex().upper()
    # the PASSWORDED slice's marker: the generator's bogus /U entry
    # (b"/U <" + b"11"*32 + b">"), which validates NO password — the
    # Python side proves the same classification via the real
    # standard-security-handler empty-password check (Algorithm 4/5);
    # per-doc equivalence asserted in tests/test_pdf_crypt.py
    bogus_u_hex = (b"/U <" + b"11" * 32 + b">").hex().upper()
    return f"""
        WITH src AS (
          SELECT url,
                 regexp_extract(url, '/(html|pdf|office|junk)/', 1) AS kind,
                 octet_length(html) AS nb,
                 (octet_length(html) >= 6 AND
                  substr(hex(html), octet_length(html)*2 - 11, 12)
                    = '2525454F460A') AS has_eof,
                 -- '/Encrypt' token, byte-aligned (odd 1-based hex pos);
                 -- an /Encrypt document is an ERROR only when the
                 -- empty user password fails (the bogus-/U slice) —
                 -- RC4-empty-password documents decrypt and extract
                 ((strpos(hex(html), '2F456E6372797074') % 2) = 1 AND
                  (strpos(hex(html), '{bogus_u_hex}') % 2) = 1) AS has_enc,
                 substr(hex(html), 1, 8) = 'D0CF11E0' AS is_ole2,
                 -- '{{\\rtf' magic; the RTF scanner is total, so the
                 -- magic alone decides ok (truncation-tolerant)
                 substr(hex(html), 1, 10) = '7B5C727466' AS is_rtf,
                 ((strpos(hex(html), '{doc_hex}') % 2) = 1 OR
                  (strpos(hex(html), '{xls_hex}') % 2) = 1 OR
                  (strpos(hex(html), '{ppt_hex}') % 2) = 1)
                     AS has_ole2_stream,
                 (octet_length(html) >= 22 AND
                  substr(hex(html), octet_length(html)*2 - 43, 8)
                    = '504B0506') AS has_eocd
          FROM read_parquet('{glob}')
        ),
        derived AS (
          SELECT url,
                 CASE WHEN kind = 'junk' THEN 'other' ELSE kind END
                     AS doc_type,
                 CASE WHEN kind = 'html' THEN TRUE
                      WHEN kind = 'pdf' THEN has_eof AND NOT has_enc
                      WHEN kind = 'office' AND is_ole2
                          THEN has_ole2_stream
                      WHEN kind = 'office' AND is_rtf THEN TRUE
                      WHEN kind = 'office' THEN has_eocd
                      ELSE FALSE END AS ok,
                 CASE WHEN kind = 'html' THEN ''
                      WHEN kind = 'pdf' AND NOT has_eof
                          THEN 'truncated_pdf'
                      WHEN kind = 'pdf' AND has_enc THEN 'encrypted_pdf'
                      WHEN kind = 'pdf' THEN ''
                      WHEN kind = 'office' AND is_ole2
                           AND has_ole2_stream THEN ''
                      WHEN kind = 'office' AND is_ole2
                          THEN 'office_unsupported'
                      WHEN kind = 'office' AND is_rtf THEN ''
                      WHEN kind = 'office' AND has_eocd THEN ''
                      WHEN kind = 'office' THEN 'office_truncated'
                      ELSE 'unsupported' END AS error_kind,
                 CAST(nb AS BIGINT) AS n_bytes
          FROM src
        )
    """


# T133: intervals × generate_series — the textbook range-join
# formulation the engine's delta encoding is provably equal to
ORACLES["in_transit_daily"] = """
    WITH li AS (
      SELECT date_trunc('day', l_shipdate) AS s,
             (l_orderkey + l_linenumber) % 30 + 1 AS dur
      FROM lineitem),
    days AS (
      SELECT s + x.x * INTERVAL 1 DAY AS day
      FROM li, unnest(range(0, dur + 1)) x(x))
    SELECT day, CAST(count(*) AS BIGINT) AS n_in_transit
    FROM days GROUP BY day
"""

# T134: add-one-smoothed hashed-unigram importance ratio in ppm —
# HUGEINT products (the engine computes them in Python bigints)
ORACLES["dsir_weights"] = """
    WITH toks AS (
      SELECT doc_id, lang, t.tok
      FROM documents,
           unnest(list_filter(string_split_regex(text, '\\s+'),
                              x -> x <> '')) AS t(tok)),
    occ AS (
      SELECT doc_id, lang, md5_number_upper(tok) AS th,
             count(*) AS occ
      FROM toks GROUP BY 1, 2, 3),
    cnts AS (
      SELECT th,
             coalesce(sum(occ) FILTER (WHERE lang = 'en'), 0) AS ct,
             coalesce(sum(occ) FILTER (WHERE lang <> 'en'), 0) AS cs
      FROM occ GROUP BY th),
    tot AS (SELECT sum(ct) AS t, sum(cs) AS s FROM cnts),
    w AS (
      SELECT th,
             (ct + 1)::HUGEINT * (tot.s + 1) * 1000000
               // ((cs + 1)::HUGEINT * (tot.t + 1)) AS w
      FROM cnts, tot)
    SELECT o.doc_id,
           CAST(sum(o.occ::HUGEINT * w.w) AS BIGINT) AS dsir_score
    FROM occ o JOIN w USING (th)
    GROUP BY o.doc_id
"""

# T135: integer-micro SRP signatures → banded candidates (MAX_BUCKET
# cap mirrored) → float cosine acceptance, shared threshold with T5
ORACLES["srp_embedding_dups"] = """
    WITH planes AS (
      SELECT j.j AS j, d.d AS d,
             CAST(md5_number_upper('srp:' || j.j || ':' || d.d) % 15
                  AS BIGINT) - 7 AS h
      FROM range({bits}) j(j), range(64) d(d)),
    comp AS (
      SELECT vec_id, r.i - 1 AS d,
             CAST(floor(CAST(embedding[r.i] AS DOUBLE) * 1000000)
                  AS BIGINT) AS e
      FROM embeddings, unnest(range(1, len(embedding) + 1)) AS r(i)),
    dots AS (
      SELECT vec_id, j, sum(e * h) AS dot
      FROM comp JOIN planes USING (d) GROUP BY 1, 2),
    sigs AS (
      SELECT vec_id,
             SUM(CASE WHEN dot >= 0 THEN 1::UBIGINT << j
                      ELSE 0::UBIGINT END)::UBIGINT AS sig
      FROM dots GROUP BY vec_id),
    bands AS (
      SELECT vec_id, r.b AS band,
             (sig >> (r.b * {bb})) & {bmask} AS chunk,
             row_number() OVER (
               PARTITION BY r.b, (sig >> (r.b * {bb})) & {bmask}
               ORDER BY vec_id) AS rk
      FROM sigs, range({nbands}) r(b)),
    capped AS (SELECT * FROM bands WHERE rk <= {max_bucket}),
    cand AS (
      SELECT DISTINCT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b
      FROM capped a JOIN capped b
        ON a.band = b.band AND a.chunk = b.chunk
       AND a.vec_id < b.vec_id)
    SELECT vec_id_a, vec_id_b
    FROM cand c
    JOIN embeddings ea ON ea.vec_id = c.vec_id_a
    JOIN embeddings eb ON eb.vec_id = c.vec_id_b
    WHERE list_cosine_similarity(CAST(ea.embedding AS DOUBLE[]),
                                 CAST(eb.embedding AS DOUBLE[]))
          >= {cos}
""".format(bits=SRP_BITS, bb=SRP_BAND_BITS,
           bmask=(1 << SRP_BAND_BITS) - 1,
           nbands=SRP_BITS // SRP_BAND_BITS,
           max_bucket=dd.MAX_BUCKET, cos=SRP_COS_MIN)

# T136: windows via range(); union coverage = Σ least(W, next−start)
# over each doc's dup windows sorted by start (stride-aligned merge)
ORACLES["substring_dup_spans"] = """
    WITH w AS (
      SELECT doc_id, i.i AS start,
             md5_number_upper(substr(text, i.i + 1, {W})) AS wh,
             length(text) AS len
      FROM documents,
           unnest(range(0, length(text) - {Wm1}, {S})) AS i(i)
      WHERE length(text) >= {W}),
    dup AS (
      SELECT wh FROM (SELECT DISTINCT wh, doc_id FROM w)
      GROUP BY wh HAVING count(*) >= 2),
    dw AS (
      SELECT doc_id, start,
             least({W}, coalesce(
               lead(start) OVER (PARTITION BY doc_id ORDER BY start)
               - start, {W})) AS cov
      FROM w JOIN dup USING (wh)),
    agg AS (
      SELECT doc_id, count(*) AS n_dup, sum(cov) AS chars
      FROM dw GROUP BY doc_id),
    tot AS (
      SELECT doc_id, count(*) AS n_windows, any_value(len) AS len
      FROM w GROUP BY doc_id)
    SELECT t.doc_id, CAST(t.n_windows AS BIGINT) AS n_windows,
           CAST(coalesce(a.n_dup, 0) AS BIGINT) AS n_dup_windows,
           CAST(coalesce(a.chars, 0) * 1000000 // t.len AS BIGINT)
               AS dup_char_ppm
    FROM tot t LEFT JOIN agg a USING (doc_id)
""".format(W=SUBSTR_W, Wm1=SUBSTR_W - 1, S=SUBSTR_STRIDE)

# T138: any-late ⇔ max-late makes the EXISTS a mergeable aggregate;
# the single-late-supplier predicate is the Q21 EXISTS/NOT-EXISTS pair
ORACLES["q21_waiting_suppliers"] = """
    WITH ls AS (
      SELECT l_orderkey, l_suppkey, max(l_shipdate) AS ms
      FROM lineitem GROUP BY 1, 2),
    f AS (
      SELECT ls.l_orderkey, ls.l_suppkey,
             CASE WHEN ls.ms > o.o_orderdate + INTERVAL {d} DAY
                  THEN 1 ELSE 0 END AS late
      FROM ls JOIN orders o ON ls.l_orderkey = o.o_orderkey),
    g AS (
      SELECT l_orderkey, count(*) AS ns, sum(late) AS nl
      FROM f GROUP BY 1)
    SELECT f.l_suppkey AS s_suppkey,
           CAST(count(*) AS BIGINT) AS n_waiting
    FROM f JOIN g USING (l_orderkey)
    WHERE g.ns >= 2 AND g.nl = 1 AND f.late = 1
    GROUP BY 1
    ORDER BY n_waiting DESC, s_suppkey
    LIMIT {k}
""".format(d=Q21_LATE_DAYS, k=Q21_TOP_K)

# T139: percentile_cont spelled out in exact integer arithmetic
# (lo/hi order statistics from a raw row_number rank; DuckDB's own
# quantile_cont interpolates in doubles, so the formula is explicit)
ORACLES["value_quantiles_cont"] = """
    WITH v AS (
      SELECT event_type,
             CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
      FROM events),
    r AS (
      SELECT event_type, v,
             row_number() OVER (PARTITION BY event_type ORDER BY v)
               - 1 AS rk,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM v),
    q AS (SELECT * FROM (VALUES (250000), (500000), (900000)) t(qm)),
    pos AS (
      SELECT d.event_type, d.n, q.qm,
             (q.qm::HUGEINT * (d.n - 1)) // 1000000 AS lo,
             (q.qm::HUGEINT * (d.n - 1)) % 1000000 AS r
      FROM (SELECT DISTINCT event_type, n FROM r) d, q),
    lohi AS (
      SELECT p.event_type, p.n, p.qm, p.r,
             rl.v AS vlo, coalesce(rh.v, rl.v) AS vhi
      FROM pos p
      JOIN r rl ON rl.event_type = p.event_type AND rl.rk = p.lo
      LEFT JOIN r rh ON rh.event_type = p.event_type
                    AND rh.rk = p.lo + 1)
    SELECT event_type,
           CAST(max(CASE WHEN qm = 250000
                THEN vlo * (1000000 - r) + vhi * r END) AS BIGINT)
               AS p25_pico,
           CAST(max(CASE WHEN qm = 500000
                THEN vlo * (1000000 - r) + vhi * r END) AS BIGINT)
               AS p50_pico,
           CAST(max(CASE WHEN qm = 900000
                THEN vlo * (1000000 - r) + vhi * r END) AS BIGINT)
               AS p90_pico,
           CAST(max(n) AS BIGINT) AS n_events
    FROM lohi GROUP BY event_type
"""

# T140: the window set is generated from event hours (a window exists
# iff ≥1 event falls in it), distinct per (window, user)
ORACLES["sliding_distinct_users"] = """
    WITH eh AS (
      SELECT DISTINCT date_trunc('hour', ts) AS h, user_id
      FROM events),
    wins AS (
      SELECT DISTINCT eh.h + x.x * INTERVAL 1 HOUR AS w_hour, user_id
      FROM eh, range({W}) x(x))
    SELECT w_hour, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM wins GROUP BY w_hour
""".format(W=SLIDE_WINDOW_HOURS)

# T137: hash-derived milli-unit weights, inner semantics (≥ 1 token)
ORACLES["quality_lr"] = """
    WITH toks AS (
      SELECT doc_id, t.tok
      FROM documents,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS t(tok)),
    sc AS (
      SELECT doc_id,
             sum(CAST(md5_number_upper('lrw:' || tok) % 2001
                      AS BIGINT) - 1000) AS s
      FROM toks GROUP BY doc_id)
    SELECT doc_id, CAST(s AS BIGINT) AS score_milli,
           CAST(CASE WHEN s >= 0 THEN 1 ELSE 0 END AS BIGINT)
               AS is_quality
    FROM sc
"""

ORACLES["nation_trade_volume"] = f"""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS BIGINT) AS ship_year,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                               * 1000000 + 0.5) AS BIGINT)) AS BIGINT)
               AS revenue_micro
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE s_nationkey IN ({TRADE_NATION_A}, {TRADE_NATION_B})
      AND c_nationkey IN ({TRADE_NATION_A}, {TRADE_NATION_B})
      AND s_nationkey <> c_nationkey
    GROUP BY 1, 2, 3
"""

ORACLES["market_share"] = f"""
    WITH x AS (
      SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
             CAST(floor(l_extendedprice * (1 - l_discount)
                        * 1000000 + 0.5) AS BIGINT) AS rev,
             CASE WHEN s_nationkey = {SHARE_NATION} THEN 1 ELSE 0 END
                 AS is_nat
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN part     ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      WHERE n_regionkey = {SHARE_REGION}
        AND p_type = '{SHARE_PTYPE}'),
    g AS (
      SELECT o_year,
             sum(rev)::HUGEINT AS total_micro,
             sum(rev * is_nat)::HUGEINT AS nation_micro
      FROM x GROUP BY o_year)
    SELECT o_year, CAST(total_micro AS BIGINT) AS total_micro,
           CAST(nation_micro AS BIGINT) AS nation_micro,
           CAST(nation_micro * 1000000 // total_micro AS BIGINT)
               AS share_ppm
    FROM g
"""

ORACLES["returned_items"] = f"""
    WITH r AS (
      SELECT o_custkey,
             sum(CAST(floor(l_extendedprice * (1 - l_discount)
                            * 1000000 + 0.5) AS BIGINT)) AS revenue_micro
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '{RETURNED_LO}'
        AND o_orderdate <  TIMESTAMP '{RETURNED_HI}'
      GROUP BY o_custkey)
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name,
           CAST(revenue_micro AS BIGINT) AS revenue_micro
    FROM r JOIN customer ON o_custkey = c_custkey
    ORDER BY revenue_micro DESC, c_custkey
    LIMIT 20
"""

ORACLES["customer_order_dist"] = """
    WITH pc AS (
      SELECT c_custkey, count(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey)
    SELECT CAST(n_orders AS BIGINT) AS n_orders,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM pc GROUP BY n_orders
"""

ORACLES["bracket_revenue"] = "\nUNION ALL\n".join(
    f"""
    SELECT CAST({bid} AS BIGINT) AS bracket,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(COALESCE(sum(CAST(floor(l_extendedprice
                                        * (1 - l_discount)
                                        * 1000000 + 0.5) AS BIGINT)), 0)
                AS BIGINT) AS revenue_micro
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = '{brand}'
      AND p_size BETWEEN {slo} AND {shi}
      AND l_quantity BETWEEN {qlo} AND {qhi}
    """
    for bid, brand, slo, shi, qlo, qhi in BRACKETS)

ORACLES["incremental_dedup"] = """
    WITH f AS (
      SELECT doc_id, md5(text) AS text_md5,
             doc_id % 3 = 2 AS is_new
      FROM documents),
    old AS (SELECT DISTINCT text_md5 FROM f WHERE NOT is_new)
    SELECT CAST(min(doc_id) AS BIGINT) AS doc_id, text_md5
    FROM f
    WHERE is_new
      AND text_md5 NOT IN (SELECT text_md5 FROM old)
    GROUP BY text_md5
"""

# entropy term: per-distinct-token floor(n·log2(tot/n)·1e6) summed as
# BIGINT (order-independent), // tot — byte-identical to the numpy
# path (both bind the platform libm log2; parity swept in tests)
ORACLES["token_entropy"] = """
    WITH t AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(text, '\\s+'),
                                x -> x <> '')) AS tok
      FROM documents),
    c AS (SELECT doc_id, tok, count(*)::BIGINT AS n
          FROM t GROUP BY 1, 2),
    s AS (SELECT doc_id, sum(n)::BIGINT AS tot FROM c GROUP BY doc_id),
    e AS (
      SELECT c.doc_id,
             sum(CAST(floor(c.n * log2(CAST(s.tot AS DOUBLE) / c.n)
                            * 1000000) AS BIGINT)) AS ent_sum,
             any_value(s.tot) AS tot
      FROM c JOIN s ON c.doc_id = s.doc_id
      GROUP BY c.doc_id)
    SELECT d.doc_id AS doc_id,
           CAST(COALESCE(e.tot, 0) AS BIGINT) AS n_tokens,
           CAST(COALESCE(e.ent_sum // e.tot, 0) AS BIGINT)
               AS entropy_micro
    FROM documents d LEFT JOIN e ON d.doc_id = e.doc_id
"""


# greedy k-center IS SQL-expressible despite being iterative: the
# selection is deterministic (exact micro² ints, fixed tie-breaks) and
# k is a constant, so the k−1 rounds unroll into a chained-CTE ladder
# (sel_j = sel_{j−1} ∪ argmax of min-dist-to-sel_{j−1}).
def _kcenter_oracle(k: int) -> str:
    parts = ["""
    WITH x AS (
      SELECT vec_id, r.i - 1 AS dim,
             CAST(floor(CAST(embedding[r.i] AS DOUBLE) * 1000000)
                  AS BIGINT) AS xm
      FROM embeddings,
           unnest(range(1, len(embedding) + 1)) AS r(i)),
    sel0 AS (SELECT CAST(min(vec_id) AS BIGINT) AS cid,
                    CAST(0 AS BIGINT) AS rnk,
                    CAST(0 AS BIGINT) AS dist FROM embeddings)"""]
    for j in range(1, k):
        parts.append(f""",
    d{j} AS (
      SELECT p.vec_id, min(p.dd) AS mind FROM (
        SELECT x.vec_id, s.cid,
               sum((x.xm - c.xm) * (x.xm - c.xm)) AS dd
        FROM x
        JOIN sel{j - 1} s ON TRUE
        JOIN x c ON c.vec_id = s.cid AND c.dim = x.dim
        GROUP BY x.vec_id, s.cid) p
      GROUP BY p.vec_id),
    pick{j} AS (
      SELECT CAST(vec_id AS BIGINT) AS cid, CAST({j} AS BIGINT) AS rnk,
             CAST(mind AS BIGINT) AS dist
      FROM d{j} ORDER BY mind DESC, vec_id LIMIT 1),
    sel{j} AS (SELECT * FROM sel{j - 1} UNION ALL
               SELECT * FROM pick{j})""")
    parts.append(f"""
    SELECT rnk, cid AS vec_id, dist AS dist_micro2 FROM sel{k - 1}""")
    return "".join(parts)


ORACLES["kcenter_coreset"] = _kcenter_oracle(KCENTER_K)

ORACLES["filtered_revenue"] = """
    WITH x AS (
      SELECT l_shipdate,
             CAST(floor(l_discount * 1000000 + 0.5) AS BIGINT)
                 AS disc,
             CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
             CAST(floor(l_extendedprice * l_discount * 100 + 0.5)
                  AS BIGINT) AS rc
      FROM lineitem)
    SELECT CAST(COALESCE(sum(rc), 0) AS BIGINT) AS revenue_cents,
           CAST(count(*) AS BIGINT) AS n_items
    FROM x
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND disc BETWEEN 50000 AND 70000 AND qty < 24
"""

ORACLES["important_parts"] = f"""
    WITH pv AS (
      SELECT l_partkey AS p_partkey,
             sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))
                 AS value_cents
      FROM lineitem GROUP BY 1),
    t AS (SELECT sum(value_cents) AS tot,
                 CAST(count(*) AS BIGINT) AS np FROM pv)
    SELECT p_partkey, CAST(value_cents AS BIGINT) AS value_cents
    FROM pv, t
    WHERE CAST(value_cents AS HUGEINT) * np * {Q11_DEN}
          > CAST(tot AS HUGEINT) * {Q11_NUM}
"""

ORACLES["hard_negatives"] = f"""
    WITH q AS (SELECT vec_id, label, embedding FROM embeddings
               WHERE vec_id < {N_KNN_QUERIES}),
    r AS (
      SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(
                          CAST(q.embedding AS DOUBLE[]),
                          CAST(e.embedding AS DOUBLE[])) DESC,
                        e.vec_id ASC) AS rnk
      FROM q CROSS JOIN embeddings e
      WHERE e.label <> q.label)
    SELECT query_id, neighbor_id, CAST(rnk AS BIGINT) AS rnk
    FROM r WHERE rnk <= {KNN_K}
"""

ORACLES["class_balance_plan"] = """
    WITH c AS (SELECT CAST(label AS BIGINT) AS label,
                      CAST(count(*) AS BIGINT) AS n_vecs
               FROM embeddings GROUP BY 1),
    m AS (SELECT max(n_vecs) AS mx FROM c)
    SELECT label, n_vecs,
           CAST((m.mx + n_vecs - 1) // n_vecs AS BIGINT)
               AS repeat_factor,
           CAST(n_vecs * ((m.mx + n_vecs - 1) // n_vecs) AS BIGINT)
               AS n_after
    FROM c, m
"""

# geo-mean: per-row floor(log2(vm)·1e6) summed as BIGINT (order-
# independent), // n — libm log2 byte-parity per the token_entropy
# contract
ORACLES["geo_mean_value"] = """
    WITH x AS (
      SELECT event_type,
             CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS vm
      FROM events),
    p AS (
      SELECT event_type,
             CAST(floor(log2(CAST(vm AS DOUBLE)) * 1000000)
                  AS BIGINT) AS lg
      FROM x WHERE vm > 0)
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_pos,
           CAST(sum(lg) // count(*) AS BIGINT) AS geo_log2_micro
    FROM p GROUP BY 1
"""

ORACLES["cheapest_supplier"] = f"""
    WITH pk AS (SELECT p_partkey, p_brand FROM part
                WHERE p_size = {CHEAP_PSIZE}),
    li AS (
      SELECT l_partkey, l_suppkey,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS pc
      FROM lineitem JOIN pk ON l_partkey = p_partkey),
    w AS (
      SELECT l_partkey, l_suppkey, pc,
             row_number() OVER (PARTITION BY l_partkey
                                ORDER BY pc, l_suppkey) AS rn
      FROM li)
    SELECT w.l_partkey AS p_partkey, pk.p_brand,
           CAST(w.l_suppkey AS BIGINT) AS s_suppkey, s.s_name,
           w.pc AS price_cents
    FROM w JOIN pk ON w.l_partkey = pk.p_partkey
           JOIN supplier s ON w.l_suppkey = s.s_suppkey
    WHERE w.rn = 1
"""

ORACLES["returned_priority_counts"] = """
    SELECT o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01'
      AND o_orderdate < TIMESTAMP '1996-10-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_returnflag = 'R')
    GROUP BY 1
"""

ORACLES["small_qty_revenue"] = f"""
    WITH pk AS (SELECT p_partkey FROM part
                WHERE p_brand = '{QTY_BRAND}'),
    li AS (
      SELECT l_partkey,
             CAST(floor(l_quantity + 0.5) AS BIGINT) AS qi,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS pc
      FROM lineitem JOIN pk ON l_partkey = p_partkey),
    st AS (SELECT l_partkey, sum(qi) AS sq,
                  CAST(count(*) AS BIGINT) AS n
           FROM li GROUP BY 1)
    SELECT CAST(COALESCE(sum(li.pc), 0) // 7 AS BIGINT)
               AS avg_yearly_cents,
           CAST(count(*) AS BIGINT) AS n_small_lineitems
    FROM li JOIN st ON li.l_partkey = st.l_partkey
    WHERE 5 * li.qi * st.n < st.sq
"""

ORACLES["top_suppliers"] = """
    WITH r AS (
      SELECT l_suppkey,
             sum(CAST(floor(l_extendedprice * (1 - l_discount)
                            * 1000000 + 0.5) AS BIGINT)) AS tr
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1996-04-01'
      GROUP BY 1)
    SELECT CAST(r.l_suppkey AS BIGINT) AS s_suppkey, s.s_name,
           CAST(r.tr AS BIGINT) AS total_rev_micro
    FROM r JOIN supplier s ON r.l_suppkey = s.s_suppkey
    WHERE r.tr = (SELECT max(tr) FROM r)
"""

ORACLES["idle_rich_customers"] = f"""
    WITH pos AS (
      SELECT c_custkey, c_mktsegment,
             CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bc
      FROM customer
      WHERE c_mktsegment IN {RICH_SEGMENTS!r}
        AND CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) > 0),
    g AS (SELECT sum(bc) AS s, CAST(count(*) AS BIGINT) AS n
          FROM pos),
    idle AS (
      SELECT pos.* FROM pos, g
      WHERE pos.bc * g.n > g.s
        AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = pos.c_custkey
            AND o_orderdate >= TIMESTAMP '2000-07-01'))
    SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_custs,
           CAST(sum(bc) AS BIGINT) AS total_bal_cents
    FROM idle GROUP BY 1
"""

ORACLES["brand_supplier_counts"] = """
    WITH tri AS (
      SELECT DISTINCT p.p_brand, CAST(p.p_size AS BIGINT) AS p_size,
                      l.l_suppkey
      FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      WHERE l.l_suppkey NOT IN
            (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
    SELECT p_brand, p_size, CAST(count(*) AS BIGINT) AS supplier_cnt
    FROM tri GROUP BY 1, 2
"""

ORACLES["embedding_quantize"] = """
    WITH x AS (
      SELECT vec_id,
             CAST(floor(CAST(embedding[r.i] AS DOUBLE) * 1000000)
                  AS BIGINT) AS xm
      FROM embeddings,
           unnest(range(1, len(embedding) + 1)) AS r(i)),
    v AS (SELECT vec_id, min(xm) AS mn, max(xm) AS mx
          FROM x GROUP BY vec_id),
    c AS (
      SELECT x.vec_id,
             CASE WHEN v.mx = v.mn THEN 0
                  ELSE ((x.xm - v.mn) * 255) // (v.mx - v.mn)
             END AS code
      FROM x JOIN v ON x.vec_id = v.vec_id)
    SELECT v.vec_id,
           CAST(v.mn AS BIGINT) AS min_micro,
           CAST(v.mx AS BIGINT) AS max_micro,
           CAST(sum(c.code) AS BIGINT) AS code_sum,
           CAST(sum(c.code * c.code) AS BIGINT) AS code_sq_sum
    FROM c JOIN v ON c.vec_id = v.vec_id
    GROUP BY v.vec_id, v.mn, v.mx
"""

ORACLES["bigram_lm_nll"] = """
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\\s+'),
                         x -> x <> '') AS tk
      FROM documents),
    bi AS (
      SELECT doc_id, tk[i] AS w1, tk[i+1] AS w2
      FROM toks, unnest(range(1, len(tk))) AS t(i)
      WHERE len(tk) >= 2),
    cnt AS (SELECT w1, w2, count(*)::BIGINT AS c
            FROM bi GROUP BY 1, 2),
    c1 AS (SELECT w1, sum(c)::BIGINT AS cl FROM cnt GROUP BY 1),
    sc AS (
      SELECT bi.doc_id,
             CAST(floor(log2(CAST(c1.cl AS DOUBLE)) * 1000000)
                  AS BIGINT)
           - CAST(floor(log2(CAST(cnt.c AS DOUBLE)) * 1000000)
                  AS BIGINT) AS nll
      FROM bi
      JOIN cnt ON bi.w1 = cnt.w1 AND bi.w2 = cnt.w2
      JOIN c1 ON bi.w1 = c1.w1)
    SELECT doc_id, count(*)::BIGINT AS n_bigrams,
           CAST(sum(nll) // count(*) AS BIGINT) AS nll_log2_micro
    FROM sc GROUP BY 1
"""

# cluster_reps extends the near_dup_clusters component SQL: its final
# SELECT becomes a `labs` CTE, then the per-cluster argmax (longest
# doc, ties → smallest id) attaches lengths from the documents table.
ORACLES["cluster_reps"] = ORACLES["near_dup_clusters"].rstrip().replace(
    "SELECT a AS doc_id,",
    ", labs AS (\n          SELECT a AS doc_id,", 1) + """)
        SELECT rep_doc_id, keep_doc_id, keep_chars, n_docs FROM (
          SELECT l.rep_doc_id,
                 l.doc_id AS keep_doc_id,
                 CAST(length(d.text) AS BIGINT) AS keep_chars,
                 CAST(count(*) OVER (PARTITION BY l.rep_doc_id)
                      AS BIGINT) AS n_docs,
                 row_number() OVER (
                   PARTITION BY l.rep_doc_id
                   ORDER BY length(d.text) DESC, l.doc_id) AS rn
          FROM labs l JOIN documents d ON l.doc_id = d.doc_id)
        WHERE rn = 1
"""

ORACLES["nation_year_profit"] = f"""
    SELECT n_name AS nation,
           CAST(year(o_orderdate) AS BIGINT) AS o_year,
           CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount)
                               * 1000000 + 0.5) AS BIGINT))
                AS BIGINT) AS profit_micro
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN orders ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%{PROFIT_PART_WORD}%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
"""

ORACLES["ship_delay_modes"] = f"""
    SELECT CASE WHEN datediff('day', o_orderdate, l_shipdate)
                     >= {SHIPMODE_SLOW_DAYS}
                THEN 'slow' ELSE 'fast' END AS ship_class,
           CAST(count(*) FILTER (WHERE o_orderpriority IN
                ('1-URGENT', '2-HIGH')) AS BIGINT)
               AS high_line_count,
           CAST(count(*) FILTER (WHERE o_orderpriority NOT IN
                ('1-URGENT', '2-HIGH')) AS BIGINT)
               AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate >= DATE '{SHIPMODE_YEAR}-01-01'
      AND l_shipdate < DATE '{int(SHIPMODE_YEAR) + 1}-01-01'
    GROUP BY 1
"""

ORACLES["excess_suppliers"] = f"""
    WITH w AS (
      SELECT l_suppkey,
             CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT))
                  AS BIGINT) AS total_qty
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE p_name LIKE '{EXCESS_PART_PREFIX}%'
        AND l_shipdate >= DATE '{EXCESS_YEAR}-01-01'
        AND l_shipdate < DATE '{int(EXCESS_YEAR) + 1}-01-01'
      GROUP BY 1
      HAVING total_qty > {EXCESS_QTY})
    SELECT s_suppkey, s_name,
           CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT)
               AS acctbal_cents,
           total_qty
    FROM w JOIN supplier ON l_suppkey = s_suppkey
    ORDER BY s_name
"""

ORACLES["uniform_sample_k"] = f"""
    SELECT CAST(row_number() OVER (
               ORDER BY md5_number_upper('smp:' || doc_id::VARCHAR),
                        doc_id) AS BIGINT) AS rnk,
           doc_id, lang, n_chars
    FROM documents
    ORDER BY md5_number_upper('smp:' || doc_id::VARCHAR), doc_id
    LIMIT {SAMPLE_K}
"""

ORACLES["quality_calibration"] = f"""
    WITH toks AS (
      SELECT doc_id, n_chars, t.tok
      FROM documents,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS t(tok)),
    sc AS (
      SELECT doc_id, any_value(n_chars) AS n_chars,
             sum(CAST(md5_number_upper('lrw:' || tok) % 2001
                      AS BIGINT) - 1000) AS s
      FROM toks GROUP BY doc_id)
    SELECT CAST(((s + {CAL_OFF}) // {CAL_BIN_MILLI})
                * {CAL_BIN_MILLI} - {CAL_OFF} AS BIGINT)
               AS bin_lo_milli,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE n_chars >= {CAL_LONG_CHARS})
                AS BIGINT) AS n_long,
           CAST(sum(s) AS BIGINT) AS sum_score_milli
    FROM sc GROUP BY 1
"""

ORACLES["weighted_sample_k"] = f"""
    WITH k AS (
      SELECT doc_id, n_chars,
             (log2(CAST(md5_number_upper('wsmp:' || doc_id::VARCHAR)
                        AS DOUBLE) + 1) - 64) / n_chars AS key
      FROM documents)
    SELECT CAST(row_number() OVER (ORDER BY key DESC, doc_id)
                AS BIGINT) AS rnk,
           doc_id, n_chars
    FROM k
    ORDER BY key DESC, doc_id
    LIMIT {WSAMPLE_K}
"""

ORACLES["funnel_conversion"] = """
    WITH c AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = 'click' GROUP BY 1),
    p AS (
      SELECT c.user_id, c.t1, min(e.ts) AS t2
      FROM c JOIN events e
        ON e.user_id = c.user_id
       AND e.event_type = 'purchase' AND e.ts > c.t1
      GROUP BY 1, 2)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_click_users,
           CAST(count(*) AS BIGINT) AS n_converted,
           CAST(coalesce(sum(epoch_us(t2) - epoch_us(t1)), 0)
                AS BIGINT) AS sum_delay_micro
    FROM p
"""

ORACLES["embedding_covariance"] = """
    WITH x AS (
      SELECT vec_id, CAST(r.i AS BIGINT) AS i,
             CAST(floor(CAST(embedding[r.i] AS DOUBLE) * 1000000)
                  AS BIGINT) AS v
      FROM embeddings,
           unnest(range(1, len(embedding) + 1)) AS r(i))
    SELECT a.i - 1 AS di, b.i - 1 AS dj,
           CAST(sum(a.v * b.v) AS BIGINT) AS sum_prod_micro2,
           (SELECT CAST(count(*) AS BIGINT) FROM embeddings) AS n_vecs
    FROM x a JOIN x b ON a.vec_id = b.vec_id AND a.i <= b.i
    GROUP BY 1, 2
"""

ORACLES["user_entropy"] = """
    WITH c AS (
      SELECT user_id, event_type, count(*)::BIGINT AS n
      FROM events GROUP BY 1, 2),
    s AS (SELECT user_id, sum(n)::BIGINT AS tot FROM c GROUP BY 1),
    e AS (
      SELECT c.user_id,
             sum(CAST(floor(c.n * log2(CAST(s.tot AS DOUBLE) / c.n)
                            * 1000000) AS BIGINT)) AS ent_sum,
             any_value(s.tot) AS tot
      FROM c JOIN s ON c.user_id = s.user_id
      GROUP BY c.user_id)
    SELECT user_id, CAST(tot AS BIGINT) AS n_events,
           CAST(ent_sum // tot AS BIGINT) AS entropy_micro
    FROM e
"""

ORACLES["global_row_ids"] = """
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY lang, doc_id) AS BIGINT)
               AS global_id
    FROM documents
"""

ORACLES["regex_token_counts"] = f"""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(lower(text),
                '\\s+'), x -> x <> '')) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '{REGEX_TOK}'))
                AS BIGINT) AS n_regex_tokens,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+'))
                AS BIGINT) AS n_word_runs,
           CAST(len(regexp_extract_all(text, '[0-9]+'))
                AS BIGINT) AS n_digit_runs,
           CAST(len(regexp_extract_all(text,
                '[^A-Za-z0-9 \\t\\n\\r\\f\\v]')) AS BIGINT)
               AS n_other_glyphs
    FROM documents
"""

ORACLES["value_mad"] = """
    WITH e AS (
      SELECT event_type,
             CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
      FROM events),
    m AS (
      SELECT event_type,
             CAST(quantile_disc(v, 0.5) AS BIGINT) AS med,
             CAST(count(*) AS BIGINT) AS n
      FROM e GROUP BY event_type)
    SELECT e.event_type, m.n AS n_events, m.med AS median_micro,
           CAST(quantile_disc(abs(e.v - m.med), 0.5) AS BIGINT)
               AS mad_micro
    FROM e JOIN m ON e.event_type = m.event_type
    GROUP BY e.event_type, m.n, m.med
"""

ORACLES["winsorized_value_mean"] = """
    WITH e AS (
      SELECT event_type,
             CAST(floor(value * 1000000 + 0.5) AS BIGINT) AS v
      FROM events),
    b AS (
      SELECT event_type,
             CAST(quantile_disc(v, 0.05) AS BIGINT) AS lo,
             CAST(quantile_disc(v, 0.95) AS BIGINT) AS hi,
             CAST(count(*) AS BIGINT) AS n
      FROM e GROUP BY event_type)
    SELECT e.event_type, b.n AS n_events,
           b.lo AS lo_micro, b.hi AS hi_micro,
           CAST((sum(least(greatest(e.v, b.lo), b.hi))
                 + 10000000000 * b.n) // b.n - 10000000000
                AS BIGINT) AS winsor_mean_micro
    FROM e JOIN b ON e.event_type = b.event_type
    GROUP BY e.event_type, b.n, b.lo, b.hi
"""

ORACLES["token_drift_kl"] = """
    WITH toks AS (
      SELECT doc_id % 2 AS half, t.tok
      FROM documents,
           unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS t(tok)),
    cnt AS (
      SELECT tok,
             CAST(count(*) FILTER (WHERE half = 0) AS BIGINT) AS c1,
             CAST(count(*) FILTER (WHERE half = 1) AS BIGINT) AS c2
      FROM toks GROUP BY tok),
    tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1,
                   CAST(sum(c2) AS BIGINT) AS n2,
                   CAST(count(*) AS BIGINT) AS v
            FROM cnt),
    term AS (
      SELECT (c1 + 1)
             * (CAST(floor(log2(CAST((c1 + 1) * (n2 + v) AS DOUBLE))
                           * 1000000) AS BIGINT)
              - CAST(floor(log2(CAST((c2 + 1) * (n1 + v) AS DOUBLE))
                           * 1000000) AS BIGINT)) AS t
      FROM cnt CROSS JOIN tot)
    SELECT tot.n1 AS n1_tokens, tot.n2 AS n2_tokens,
           tot.v AS vocab_union,
           CAST((SELECT sum(t) FROM term) AS BIGINT) AS kl_sum_micro
    FROM tot
"""

ORACLES["fk_integrity"] = "\n    UNION ALL\n".join(
    f"""
    SELECT '{label}' AS fk_edge,
           CAST(count(*) AS BIGINT) AS n_fk_rows,
           CAST(count(*) FILTER (WHERE d.{dk} IS NULL) AS BIGINT)
               AS n_orphan_rows,
           CAST(count(DISTINCT f.{fk})
                FILTER (WHERE d.{dk} IS NULL) AS BIGINT)
               AS n_orphan_keys
    FROM {fact} f LEFT JOIN {dim} d ON f.{fk} = d.{dk}"""
    for label, fact, fk, dim, dk in FK_EDGES)

ORACLES["column_profile"] = "\n    UNION ALL\n".join(
    f"""
    SELECT '{c}' AS column, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
    FROM events"""
    for c in PROFILE_COLS)


ORACLES["hourly_anomaly"] = f"""
    WITH grid AS (SELECT g.x AS hb FROM unnest(range(0, {HOW_BUCKETS}))
                  AS g(x)),
    c AS (
      SELECT dayofweek(ts) * 24 + hour(ts) AS hb,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1),
    f AS (SELECT grid.hb, COALESCE(c.n, 0) AS n
          FROM grid LEFT JOIN c USING (hb)),
    s AS (
      SELECT hb, n,
             {HOW_BUCKETS} * CAST(n AS HUGEINT)
                 - sum(CAST(n AS HUGEINT)) OVER () AS dev
      FROM f),
    t AS (SELECT CAST(sum(dev * dev) AS HUGEINT) AS ssq FROM s)
    SELECT CAST(s.hb // 24 AS BIGINT) AS dow,
           CAST(s.hb % 24 AS BIGINT) AS hour,
           s.n AS n_events,
           ({HOW_BUCKETS} * s.dev * s.dev
            > {ANOM_K * ANOM_K} * t.ssq) AS anomalous
    FROM s, t
"""

ORACLES["session_duration_stats"] = """
    WITH l AS (
      SELECT user_id, ts, event_id,
             lag(ts) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS pts
      FROM events),
    f AS (
      SELECT user_id, ts, event_id,
             CASE WHEN pts IS NULL
                       OR ts - pts > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS ns
      FROM l),
    s AS (
      SELECT user_id, ts,
             sum(ns) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
      FROM f),
    d AS (
      SELECT user_id, sid,
             epoch_us(max(ts)) - epoch_us(min(ts)) AS dur
      FROM s GROUP BY 1, 2)
    SELECT CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(quantile_disc(dur, 0.5) AS BIGINT) AS p50_us,
           CAST(quantile_disc(dur, 0.9) AS BIGINT) AS p90_us,
           CAST(sum(dur) // count(*) AS BIGINT) AS mean_us,
           CAST(max(dur) AS BIGINT) AS max_us
    FROM d
"""

ORACLES["nfc_audit"] = """
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) FILTER (WHERE nfc_normalize(text) <> text)
               AS BIGINT) AS n_changed,
           CAST(sum(length(text)) AS BIGINT) AS sum_chars,
           CAST(sum(length(nfc_normalize(text))) AS BIGINT)
               AS sum_nfc_chars
    FROM documents GROUP BY lang
"""

# cross-slice projection of the prefix-join exact pair set (τ=0.6):
# eval side = doc_id % FUZZY_EVAL_MOD == 0, train doc = the other end
ORACLES["fuzzy_contamination"] = """
    WITH {cte},
    crossp AS (
      SELECT CASE WHEN doc_id_a % {mod} = 0 THEN doc_id_b
                  ELSE doc_id_a END AS doc_id,
             jaccard_micro
      FROM mpairs
      WHERE (doc_id_a % {mod} = 0) <> (doc_id_b % {mod} = 0))
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_eval_matches,
           CAST(max(jaccard_micro) AS BIGINT) AS max_jaccard_micro
    FROM crossp GROUP BY doc_id
""".format(cte=_MINHASH_PAIRS_CTE.replace("700000", "600000"),
           mod=FUZZY_EVAL_MOD)

# T192: T67's sentence explode feeding T8's lang predictor (the
# generalized _lang_pred_sql with (doc_id, sent_idx) keys), LEFT JOIN
# back so 0-sentence docs keep a row
ORACLES["sentence_lang_mismatch"] = f"""
    WITH sents AS (
      SELECT doc_id, r.i - 1 AS sent_idx, sents[r.i] AS sentence
      FROM (SELECT doc_id,
                   list_filter(
                     string_split_regex(text,
                                        '[.!?]+[ \\t\\n\\r\\f\\v]+'),
                     x -> x <> '') AS sents
            FROM documents) l,
           unnest(range(1, len(sents) + 1)) AS r(i)),
    preds AS (
      {_lang_pred_sql("sents", keys=("doc_id", "sent_idx"),
                      text_col="sentence")}),
    roll AS (
      SELECT p.doc_id,
             CAST(count(*) AS BIGINT) AS n_sents,
             CAST(count(*) FILTER (WHERE p.lang_pred <> '')
                 AS BIGINT) AS n_pred,
             CAST(count(*) FILTER (WHERE p.lang_pred <> ''
                  AND p.lang_pred <> d.lang) AS BIGINT) AS n_mismatch
      FROM preds p JOIN documents d ON p.doc_id = d.doc_id
      GROUP BY p.doc_id)
    SELECT d.doc_id, d.lang,
           COALESCE(r.n_sents, 0) AS n_sents,
           COALESCE(r.n_pred, 0) AS n_pred,
           COALESCE(r.n_mismatch, 0) AS n_mismatch,
           CAST(CASE WHEN COALESCE(r.n_sents, 0) = 0 THEN 0
                ELSE r.n_mismatch * 1000000 // r.n_sents END
               AS BIGINT) AS mismatch_ppm
    FROM documents d LEFT JOIN roll r ON d.doc_id = r.doc_id
"""

ORACLES["gopher_rules"] = f"""
    WITH w AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(text, '\\s+'),
                         x -> x <> '') AS toks,
             string_split(text, chr(10)) AS lines
      FROM documents),
    t AS (
      SELECT doc_id,
             CAST(len(toks) AS BIGINT) AS n_words,
             CAST(COALESCE(list_sum(list_transform(toks,
                  x -> length(x))), 0) AS BIGINT) AS sum_len,
             CAST(len(list_filter(toks,
                  x -> regexp_matches(x, '[A-Za-z]'))) AS BIGINT)
                 AS n_alpha,
             CAST(len(lines) AS BIGINT) AS n_lines,
             CAST(len(list_filter(lines,
                  x -> x LIKE '- %' OR x LIKE '* %')) AS BIGINT)
                 AS n_bullet,
             CAST(len(list_filter(lines, x -> x LIKE '%...'))
                 AS BIGINT) AS n_ellip,
             CAST(length(text) - length(replace(text, '#', ''))
                  + (length(text) - length(replace(text, '...', '')))
                    // 3 AS BIGINT) AS n_sym
      FROM w),
    p AS (
      SELECT doc_id, n_words,
             CAST(CASE WHEN n_words = 0 THEN 0
                  ELSE sum_len * 1000000 // n_words END AS BIGINT)
                 AS mean_wlen_micro,
             CAST(CASE WHEN n_words = 0 THEN 0
                  ELSE n_sym * 1000000 // n_words END AS BIGINT)
                 AS sym_ppm,
             CAST(n_bullet * 1000000 // n_lines AS BIGINT)
                 AS bullet_ppm,
             CAST(n_ellip * 1000000 // n_lines AS BIGINT)
                 AS ellipsis_ppm,
             CAST(CASE WHEN n_words = 0 THEN 0
                  ELSE n_alpha * 1000000 // n_words END AS BIGINT)
                 AS alpha_ppm
      FROM t)
    SELECT doc_id, n_words, mean_wlen_micro, sym_ppm, bullet_ppm,
           ellipsis_ppm, alpha_ppm,
           (n_words >= {GOPHER_MIN_WORDS}
            AND n_words <= {GOPHER_MAX_WORDS}
            AND mean_wlen_micro >= {GOPHER_MIN_WLEN_MICRO}
            AND mean_wlen_micro <= {GOPHER_MAX_WLEN_MICRO}
            AND sym_ppm <= {GOPHER_MAX_SYM_PPM}
            AND bullet_ppm <= {GOPHER_MAX_BULLET_PPM}
            AND ellipsis_ppm <= {GOPHER_MAX_ELLIPSIS_PPM}
            AND alpha_ppm >= {GOPHER_MIN_ALPHA_PPM}) AS passes
    FROM p
"""

ORACLES["padding_waste"] = f"""
    WITH t AS (
      SELECT doc_id,
             CAST(len(list_filter(string_split_regex(text, '\\s+'),
                  x -> x <> '')) AS BIGINT) AS n_tok
      FROM documents),
    r AS (
      SELECT doc_id, n_tok,
             row_number() OVER (ORDER BY n_tok, doc_id) - 1 AS rk
      FROM t)
    SELECT CAST(rk // {PAD_BATCH} AS BIGINT) AS batch_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(n_tok) AS BIGINT) AS max_tok,
           CAST(sum(n_tok) AS BIGINT) AS sum_tok,
           CAST(CASE WHEN max(n_tok) = 0 THEN 0
                ELSE (count(*) * max(n_tok) - sum(n_tok)) * 1000000
                     // (count(*) * max(n_tok)) END AS BIGINT)
               AS pad_ppm
    FROM r GROUP BY 1
"""

ORACLES["embedding_contamination"] = f"""
    WITH e AS (
      SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      WHERE vec_id % {EVAL_SLICE_MOD} = 0),
    tr AS (
      SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
      FROM embeddings WHERE vec_id % {EVAL_SLICE_MOD} <> 0),
    f AS (
      SELECT tr.vec_id, tr.label,
             max(list_cosine_similarity(tr.v, e.v)) AS mx
      FROM tr CROSS JOIN e GROUP BY 1, 2)
    SELECT CAST(label AS BIGINT) AS label,
           CAST(count(*) AS BIGINT) AS n_train,
           CAST(count(*) FILTER (WHERE mx >= {CONTAM_COS_MIN})
               AS BIGINT) AS n_contaminated
    FROM f GROUP BY label
"""

# T196: skyline by NOT-EXISTS dominance; empty docs count (0, 0) on
# both sides via the LEFT JOIN (the token CTE has no row for them)
ORACLES["pareto_docs"] = """
    WITH t AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(text, '\\s+'),
                                x -> x <> '')) AS tok
      FROM documents),
    tc AS (SELECT doc_id, count(*)::BIGINT AS nt,
                  count(DISTINCT tok)::BIGINT AS nd
           FROM t GROUP BY 1),
    c AS (SELECT d.doc_id,
                 COALESCE(tc.nt, 0) AS n_tokens,
                 COALESCE(tc.nd, 0) AS n_distinct
          FROM documents d LEFT JOIN tc ON d.doc_id = tc.doc_id)
    SELECT doc_id, n_tokens, n_distinct FROM c p
    WHERE NOT EXISTS (
      SELECT 1 FROM c o
      WHERE o.n_tokens >= p.n_tokens AND o.n_distinct >= p.n_distinct
        AND (o.n_tokens > p.n_tokens OR o.n_distinct > p.n_distinct))
"""

# T197: MI term sum UNDIVIDED (terms can be negative — the
# floor-vs-truncate divide rule); log2 args as exact-bigint products
# converted once to DOUBLE (HUGEINT guards the products at scale)
ORACLES["lang_source_mi"] = """
    WITH c AS (SELECT lang, source, count(*)::BIGINT AS n
               FROM documents GROUP BY 1, 2),
    nx AS (SELECT lang, sum(n)::BIGINT AS n_x FROM c GROUP BY 1),
    ny AS (SELECT source, sum(n)::BIGINT AS n_y FROM c GROUP BY 1),
    t AS (SELECT sum(n)::BIGINT AS nn FROM c),
    mi AS (
      SELECT sum(CAST(floor(c.n * log2(
                 CAST(CAST(t.nn AS HUGEINT) * c.n AS DOUBLE)
                 / CAST(CAST(nx.n_x AS HUGEINT) * ny.n_y AS DOUBLE))
                 * 1000000) AS BIGINT)) AS s
      FROM c, t
      JOIN nx ON c.lang = nx.lang
      JOIN ny ON c.source = ny.source),
    hx AS (
      SELECT sum(CAST(floor(n_x * log2(CAST(t.nn AS DOUBLE) / n_x)
                 * 1000000) AS BIGINT)) AS s
      FROM nx, t),
    hy AS (
      SELECT sum(CAST(floor(n_y * log2(CAST(t.nn AS DOUBLE) / n_y)
                 * 1000000) AS BIGINT)) AS s
      FROM ny, t)
    SELECT CAST(t.nn AS BIGINT) AS n_docs,
           CAST(mi.s AS BIGINT) AS mi_sum_micro,
           CAST(hx.s // t.nn AS BIGINT) AS h_lang_micro,
           CAST(hy.s // t.nn AS BIGINT) AS h_source_micro
    FROM t, mi, hx, hy
"""

# T198: the KMV estimates are pure functions of the distinct user
# sets under a deterministic hash, so the sketch itself is oracled
ORACLES["user_overlap_kmv"] = f"""
    WITH a AS (SELECT DISTINCT user_id FROM events
               WHERE event_type = 'click'),
    b AS (SELECT DISTINCT user_id FROM events
          WHERE event_type = 'purchase'),
    u AS (
      SELECT user_id,
             md5_number_upper('kmv:' || CAST(user_id AS VARCHAR)) AS h,
             user_id IN (SELECT user_id FROM a) AS in_a,
             user_id IN (SELECT user_id FROM b) AS in_b
      FROM (SELECT user_id FROM a UNION SELECT user_id FROM b)),
    n AS (SELECT count(*) FILTER (WHERE in_a)::BIGINT AS n_a,
                 count(*) FILTER (WHERE in_b)::BIGINT AS n_b,
                 count(*)::BIGINT AS n_u FROM u),
    ka AS (SELECT max(h) AS kth FROM (
             SELECT h FROM u WHERE in_a ORDER BY h LIMIT {KMV_K})),
    kb AS (SELECT max(h) AS kth FROM (
             SELECT h FROM u WHERE in_b ORDER BY h LIMIT {KMV_K})),
    ku AS (SELECT max(h) AS kth,
                  count(*) FILTER (WHERE in_a AND in_b)::BIGINT AS c
           FROM (SELECT h, in_a, in_b FROM u
                 ORDER BY h LIMIT {KMV_K})),
    est AS (
      SELECT
        CASE WHEN n.n_a <= {KMV_K} THEN n.n_a
             ELSE CAST(CAST({KMV_K - 1} AS HUGEINT)
                  * 18446744073709551616 // ka.kth AS BIGINT) END AS ea,
        CASE WHEN n.n_b <= {KMV_K} THEN n.n_b
             ELSE CAST(CAST({KMV_K - 1} AS HUGEINT)
                  * 18446744073709551616 // kb.kth AS BIGINT) END AS eb,
        CASE WHEN n.n_u <= {KMV_K} THEN n.n_u
             ELSE CAST(CAST({KMV_K - 1} AS HUGEINT)
                  * 18446744073709551616 // ku.kth AS BIGINT) END AS eu,
        ku.c AS c, n.n_a AS n_a, n.n_b AS n_b, n.n_u AS n_u
      FROM n, ka, kb, ku)
    SELECT n_a AS n_click_users, n_b AS n_purchase_users,
           n_u AS n_union, ea AS est_click, eb AS est_purchase,
           eu AS est_union,
           CASE WHEN n_u <= {KMV_K} THEN c
                ELSE CAST(CAST(c AS HUGEINT) * eu // {KMV_K}
                          AS BIGINT) END AS est_intersection
    FROM est
"""

# T199: epoch-µs window arithmetic on both sides (no INTERVAL
# semantics in play); clicks strictly before the purchase
ORACLES["multi_touch_attribution"] = f"""
    WITH p AS (SELECT event_id, user_id, epoch_us(ts) AS t
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT user_id, epoch_us(ts) AS t FROM events
          WHERE event_type = 'click'),
    j AS (
      SELECT p.event_id, p.user_id, count(c.t)::BIGINT AS n_touches
      FROM p LEFT JOIN c
        ON c.user_id = p.user_id
       AND c.t >= p.t - {MTA_WINDOW_US} AND c.t < p.t
      GROUP BY 1, 2)
    SELECT event_id, user_id, n_touches,
           CASE WHEN n_touches > 0
                THEN CAST(1000000 // n_touches AS BIGINT)
                ELSE 0 END AS credit_ppm
    FROM j
"""

# T200: textbook gaps-and-islands (row_number difference) over the
# deterministic (ts, event_id) order
ORACLES["event_rle"] = """
    WITH e AS (
      SELECT user_id, event_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rt
      FROM events),
    r AS (SELECT user_id, event_type, rn - rt AS grp,
                 count(*)::BIGINT AS run_len, min(rn) AS srn
          FROM e GROUP BY 1, 2, 3)
    SELECT user_id,
           CAST(row_number() OVER (PARTITION BY user_id ORDER BY srn)
                AS BIGINT) AS run_idx,
           event_type, run_len
    FROM r
"""

ORACLES["event_path_trigrams"] = f"""
    WITH e AS (
      SELECT event_type AS e1,
             lead(event_type, 1) OVER w AS e2,
             lead(event_type, 2) OVER w AS e3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT e1, e2, e3, count(*)::BIGINT AS n
    FROM e WHERE e3 IS NOT NULL
    GROUP BY 1, 2, 3
    ORDER BY n DESC, e1, e2, e3
    LIMIT {PATH_TOP_K}
"""

# lower weighted median: smallest value with 2*cum_weight >= total
ORACLES["weighted_median_price"] = """
    WITH w AS (
      SELECT l_returnflag AS flag,
             CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                 AS cents,
             CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty
      FROM lineitem),
    g AS (SELECT flag, cents, sum(qty) AS wt FROM w GROUP BY 1, 2),
    c AS (
      SELECT flag, cents,
             sum(wt) OVER (PARTITION BY flag ORDER BY cents) AS cum,
             sum(wt) OVER (PARTITION BY flag) AS tot
      FROM g)
    SELECT flag, CAST(min(cents) AS BIGINT) AS wmedian_cents,
           CAST(min(tot) AS BIGINT) AS total_qty
    FROM c WHERE 2 * cum >= tot GROUP BY flag
"""

# gap lerp over per-user row numbers; floor division emulated with
# the positive-modulus trick (num may be negative, span > 0)
ORACLES["value_interp"] = """
    WITH e AS (
      SELECT event_id, user_id, ts,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn,
             CASE WHEN event_type = 'purchase'
                  THEN CAST(floor(value * 1000000 + 0.5) AS BIGINT)
             END AS pv
      FROM events),
    w AS (
      SELECT event_id, user_id, rn,
             last_value(pv IGNORE NULLS) OVER wp AS pvp,
             first_value(pv IGNORE NULLS) OVER wf AS pvn,
             last_value(CASE WHEN pv IS NOT NULL THEN rn END
                        IGNORE NULLS) OVER wp AS rnp,
             first_value(CASE WHEN pv IS NOT NULL THEN rn END
                         IGNORE NULLS) OVER wf AS rnn
      FROM e
      WINDOW wp AS (PARTITION BY user_id ORDER BY rn
                    ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW),
             wf AS (PARTITION BY user_id ORDER BY rn
                    ROWS BETWEEN CURRENT ROW
                             AND UNBOUNDED FOLLOWING))
    SELECT event_id, user_id,
           CAST(CASE
             WHEN pvp IS NULL OR pvn IS NULL THEN -1
             WHEN rnn = rnp THEN pvp
             ELSE pvp + ((pvn - pvp) * (rn - rnp)
                         - ((((pvn - pvp) * (rn - rnp))
                             % (rnn - rnp) + (rnn - rnp))
                            % (rnn - rnp)))
                        // (rnn - rnp)
           END AS BIGINT) AS interp_micro
    FROM w
"""

# dim = h % 64, sign = bit 6 of h (first bit independent of dim) —
# exactly the engine's md5 family, so collisions cancel identically.
ORACLES["feature_hash_vectors"] = f"""
    WITH toks AS (
      SELECT doc_id, lower(t.tok) AS tok
      FROM documents,
           unnest(list_filter(string_split_regex(text, '\\s+'),
                              x -> x <> '')) AS t(tok)),
    h AS (
      SELECT doc_id, md5_number_upper('fh:' || tok) AS h FROM toks)
    SELECT doc_id,
           CAST(h % {FEATURE_HASH_D} AS BIGINT) AS dim,
           CAST(sum(CASE WHEN (h >> 6) & 1 = 1 THEN 1 ELSE -1 END)
                AS BIGINT) AS weight
    FROM h GROUP BY 1, 2
    HAVING sum(CASE WHEN (h >> 6) & 1 = 1 THEN 1 ELSE -1 END) <> 0
"""

ORACLES["events_time_window"] = """
    SELECT event_id, user_id,
           CAST(sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT))
                OVER w AS BIGINT) AS win_sum_micro,
           CAST(count(*) OVER w AS BIGINT) AS win_n
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                       AND CURRENT ROW)
"""

# groups by the SAME md5 trigram hash as the engine so collisions
# agree; a shingle's decile is where its global-min doc_id lands
ORACLES["vocab_growth"] = """
    WITH toks AS (
      SELECT doc_id,
             list_transform(
               list_filter(string_split_regex(text, '\\s+'),
                           x -> x <> ''),
               x -> lower(x)) AS ts
      FROM documents),
    tg AS (
      SELECT doc_id,
             ts[i.i] || ' ' || ts[i.i + 1] || ' ' || ts[i.i + 2] AS g
      FROM toks, unnest(range(1, len(ts) - 1)) AS i(i)
      WHERE len(ts) >= 3),
    th AS (
      SELECT doc_id, md5_number_upper('vg:' || g) AS h FROM tg),
    fo AS (SELECT h, min(doc_id) AS first_doc FROM th GROUP BY h),
    dec AS (
      SELECT CAST(first_doc * 10
                  // (SELECT max(doc_id) + 1 FROM documents)
                  AS BIGINT) AS decile,
             count(*) AS new_terms
      FROM fo GROUP BY 1)
    SELECT decile, CAST(new_terms AS BIGINT) AS new_terms,
           CAST(sum(new_terms) OVER (ORDER BY decile) AS BIGINT)
               AS cum_vocab
    FROM dec ORDER BY decile
"""


def oracle_sql() -> dict[str, str]:
    out = dict(ORACLES)
    # built lazily: the CTE embeds the (engine-versioned) corpus path
    # and materializes the corpus if needed
    cte = _extract_oracle_cte()
    out["extract_pipeline"] = (
        cte + "SELECT url, doc_type, ok, error_kind, n_bytes FROM derived"
    )
    out["extract_error_stats"] = (
        cte + """SELECT doc_type, ok, error_kind, count(*) AS n_docs
                 FROM derived GROUP BY 1, 2, 3"""
    )
    glob = os.path.join(_corpus_dir(), "*.parquet")
    out["domain_stats"] = f"""
        WITH src AS (
          SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS domain,
                 regexp_extract(url, '/(html|pdf|office|junk)/', 1) AS kind,
                 octet_length(html) AS nb
          FROM read_parquet('{glob}'))
        SELECT domain,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(count(*) FILTER (WHERE kind = 'html') AS BIGINT)
                   AS n_html,
               CAST(count(*) FILTER (WHERE kind = 'pdf') AS BIGINT)
                   AS n_pdf,
               CAST(count(*) FILTER (WHERE kind = 'office') AS BIGINT)
                   AS n_office,
               CAST(sum(nb) AS BIGINT) AS sum_bytes
        FROM src GROUP BY domain
    """
    out["domain_gini"] = f"""
        WITH d AS (
          SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS domain,
                 CAST(count(*) AS BIGINT) AS c
          FROM read_parquet('{glob}') GROUP BY 1),
        r AS (SELECT c, row_number() OVER (ORDER BY c, domain) AS rn
              FROM d),
        s AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                     CAST(sum(c) AS HUGEINT) AS t,
                     CAST(sum(rn * c) AS HUGEINT) AS src FROM r)
        SELECT CAST(n AS BIGINT) AS n_domains,
               CAST(t AS BIGINT) AS n_docs,
               CAST((2 * src - (n + 1) * t) * 1000000 // (n * t)
                   AS BIGINT) AS gini_ppm
        FROM s
    """
    out["url_host_rules"] = f"""
        WITH u AS (
          SELECT url,
                 regexp_extract(url, 'https://([^/]+)/', 1) AS domain,
                 octet_length(html) AS nb
          FROM read_parquet('{glob}')),
        s AS (SELECT url, domain, nb,
                     string_split(domain, '.') AS parts FROM u),
        b AS (
          SELECT url, nb,
                 len(list_filter(range(1, len(parts) + 1),
                     i -> md5_number_upper('blk:' || array_to_string(
                              list_slice(parts, i, len(parts)), '.'))
                          % {BLK_MOD} = 0)) > 0 AS blocked
          FROM s)
        SELECT CASE WHEN blocked THEN 'blocked_domain'
                    WHEN url LIKE '%/junk/%' THEN 'flagged_path'
                    ELSE 'kept' END AS reason,
               CAST(count(*) AS BIGINT) AS n_urls,
               CAST(sum(nb) AS BIGINT) AS sum_bytes
        FROM b GROUP BY 1
    """
    # blob → varchar renders non-printables (and quotes) as \xNN
    # escapes, so an all-ASCII href pattern scans the BYTES exactly —
    # the double-quote before https becomes the literal text \x22
    out["embedded_image_stats"] = f"""
        WITH src AS (
          SELECT url, CAST(html AS VARCHAR) AS body
          FROM read_parquet('{glob}')
          WHERE substr(hex(html), 1, 4) <> '1F8B'),
        l AS (
          SELECT url, regexp_extract_all(body,
              'src=\\\\x22data:image/(png|jpeg|gif|bmp);base64,'
              || '[A-Za-z0-9+/=]*\\\\x22') AS ms
          FROM src),
        m AS (
          SELECT url, t.i AS idx, ms[t.i] AS s
          FROM l, unnest(range(1, len(ms) + 1)) AS t(i)),
        p AS (
          SELECT url, idx,
                 regexp_extract(s, 'data:image/([a-z]+);', 1) AS fmt,
                 regexp_extract(s, ';base64,([A-Za-z0-9+/=]*)', 1)
                     AS b64
          FROM m),
        v AS (
          SELECT url, fmt, b64,
                 row_number() OVER (PARTITION BY url ORDER BY idx)
                     AS rn
          FROM p
          WHERE b64 <> '' AND regexp_full_match(b64,
              '([A-Za-z0-9+/]{{4}})*([A-Za-z0-9+/]{{2}}==|'
              || '[A-Za-z0-9+/]{{3}}=|[A-Za-z0-9+/]{{4}})'))
        SELECT fmt,
               CAST(count(*) AS BIGINT) AS n_images,
               CAST(sum(len(b64) * 3 // 4
                    - (len(b64) - len(replace(b64, '=', ''))))
                    AS BIGINT) AS decoded_bytes,
               CAST(count(DISTINCT url) AS BIGINT) AS n_docs
        FROM v WHERE rn <= {MAX_EMBED_IMAGES}
        GROUP BY fmt
    """
    out["link_domains"] = f"""
        WITH src AS (
          SELECT regexp_extract(url, 'https://([^/]+)/', 1)
                     AS src_domain,
                 CAST(html AS VARCHAR) AS body
          FROM read_parquet('{glob}')
          WHERE substr(hex(html), 1, 4) <> '1F8B'),
        e AS (
          SELECT src_domain,
                 unnest(regexp_extract_all(body,
                     'href=\\\\x22https://(site-[0-9]+\\.example)/', 1))
                     AS dst_domain
          FROM src)
        SELECT src_domain, dst_domain,
               CAST(count(*) AS BIGINT) AS n_links
        FROM e GROUP BY 1, 2
    """
    edges_cte = f"""
        WITH src AS (
          SELECT regexp_extract(url, 'https://([^/]+)/', 1)
                     AS src_domain,
                 CAST(html AS VARCHAR) AS body
          FROM read_parquet('{glob}')
          WHERE substr(hex(html), 1, 4) <> '1F8B'),
        ex AS (
          SELECT src_domain,
                 unnest(regexp_extract_all(body,
                     'href=\\\\x22https://(site-[0-9]+\\.example)/', 1))
                     AS dst_domain
          FROM src),
        edges AS (
          SELECT src_domain, dst_domain, count(*) AS n_links
          FROM ex GROUP BY 1, 2)
    """
    out["intra_domain_link_ratio"] = edges_cte + """
        SELECT src_domain,
               CAST(sum(n_links) AS BIGINT) AS n_links,
               CAST(COALESCE(sum(n_links)
                    FILTER (WHERE src_domain = dst_domain), 0)
                   AS BIGINT) AS self_links,
               CAST(COALESCE(sum(n_links)
                    FILTER (WHERE src_domain = dst_domain), 0)
                    * 1000000 // sum(n_links) AS BIGINT) AS self_ppm
        FROM edges GROUP BY src_domain
    """
    out["domain_degrees"] = edges_cte + """
        , o AS (
          SELECT src_domain AS domain,
                 count(*) AS out_degree, sum(n_links) AS out_links
          FROM edges GROUP BY 1),
        i AS (
          SELECT dst_domain AS domain,
                 count(*) AS in_degree, sum(n_links) AS in_links
          FROM edges GROUP BY 1)
        SELECT COALESCE(o.domain, i.domain) AS domain,
               CAST(COALESCE(out_degree, 0) AS BIGINT) AS out_degree,
               CAST(COALESCE(out_links, 0) AS BIGINT) AS out_links,
               CAST(COALESCE(in_degree, 0) AS BIGINT) AS in_degree,
               CAST(COALESCE(in_links, 0) AS BIGINT) AS in_links
        FROM o FULL OUTER JOIN i ON o.domain = i.domain
    """
    out["domain_link_agg"] = edges_cte + """
        SELECT src_domain,
               string_agg(dst_domain, ',' ORDER BY dst_domain)
                   AS dst_list,
               CAST(count(*) AS BIGINT) AS n_dsts,
               CAST(sum(n_links) AS BIGINT) AS total_links
        FROM edges GROUP BY 1
    """
    out["reciprocal_links"] = edges_cte + """
        SELECT a.src_domain AS domain_a, a.dst_domain AS domain_b,
               CAST(a.n_links AS BIGINT) AS n_ab,
               CAST(b.n_links AS BIGINT) AS n_ba
        FROM edges a
        JOIN edges b ON a.src_domain = b.dst_domain
                    AND a.dst_domain = b.src_domain
        WHERE a.src_domain < a.dst_domain
    """
    out["domain_triangles"] = edges_cte + """
        , und AS (
          SELECT DISTINCT least(src_domain, dst_domain) AS a,
                 greatest(src_domain, dst_domain) AS b
          FROM edges WHERE src_domain <> dst_domain)
        SELECT e1.a AS domain_a, e1.b AS domain_b, e2.b AS domain_c
        FROM und e1
        JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
        JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b
    """
    out["domain_clustering"] = edges_cte + """
        , und AS (
          SELECT DISTINCT least(src_domain, dst_domain) AS a,
                 greatest(src_domain, dst_domain) AS b
          FROM edges WHERE src_domain <> dst_domain),
        tri AS (
          SELECT e1.a AS da, e1.b AS db, e2.b AS dc
          FROM und e1
          JOIN und e2 ON e2.a = e1.a AND e2.b > e1.b
          JOIN und e3 ON e3.a = e1.b AND e3.b = e2.b),
        tv AS (
          SELECT domain, count(*) AS n_tri FROM (
            SELECT da AS domain FROM tri
            UNION ALL SELECT db FROM tri
            UNION ALL SELECT dc FROM tri)
          GROUP BY domain),
        degs AS (
          SELECT domain, count(*) AS deg FROM (
            SELECT a AS domain FROM und
            UNION ALL SELECT b FROM und)
          GROUP BY domain)
        SELECT d.domain,
               CAST(COALESCE(n_tri, 0) AS BIGINT) AS n_tri,
               CAST(deg AS BIGINT) AS deg,
               CAST((COALESCE(n_tri, 0) * 1000000)
                    // ((deg * (deg - 1)) // 2) AS BIGINT) AS coeff_ppm
        FROM degs d LEFT JOIN tv ON d.domain = tv.domain
        WHERE deg >= 2
    """
    out["harmonic_centrality"] = (edges_cte + f"""
        , und AS (
          SELECT DISTINCT least(src_domain, dst_domain) AS a,
                 greatest(src_domain, dst_domain) AS b
          FROM edges WHERE src_domain <> dst_domain),
        bidir AS (SELECT a, b FROM und UNION SELECT b, a FROM und),
        nodes AS (SELECT DISTINCT a AS n FROM bidir),
        walk(s, node, d) AS (
          SELECT n AS s, n AS node, 0 AS d FROM nodes
          UNION
          SELECT w.s, e.b, w.d + 1 FROM walk w
          JOIN bidir e ON e.a = w.node WHERE w.d < {HARMONIC_MAX}),
        sp AS (SELECT s, node, min(d) AS d FROM walk GROUP BY 1, 2)
        SELECT s AS domain,
               CAST(count(*) FILTER (WHERE node <> s) AS BIGINT)
                   AS n_reached,
               CAST(COALESCE(sum(1000000 // d)
                    FILTER (WHERE node <> s), 0) AS BIGINT)
                   AS harmonic_ppm
        FROM sp GROUP BY s
    """).replace("WITH src AS", "WITH RECURSIVE src AS", 1)
    out["degree_assortativity"] = edges_cte + """
        , und AS (
          SELECT DISTINCT least(src_domain, dst_domain) AS a,
                 greatest(src_domain, dst_domain) AS b
          FROM edges WHERE src_domain <> dst_domain),
        degs AS (
          SELECT domain, count(*)::HUGEINT AS deg FROM (
            SELECT a AS domain FROM und
            UNION ALL SELECT b FROM und)
          GROUP BY domain),
        ed AS (
          SELECT da.deg AS j, db.deg AS k
          FROM und JOIN degs da ON und.a = da.domain
                   JOIN degs db ON und.b = db.domain),
        s AS (
          SELECT count(*)::HUGEINT AS m, sum(j * k) AS s_jk,
                 sum(j + k) AS s_sum, sum(j * j + k * k) AS s_sq
          FROM ed),
        f AS (
          SELECT m, s_jk, s_sum, s_sq,
                 4 * m * s_jk - s_sum * s_sum AS num,
                 2 * m * s_sq - s_sum * s_sum AS den
          FROM s)
        SELECT CAST(m AS BIGINT) AS m, CAST(s_jk AS BIGINT) AS s_jk,
               CAST(s_sum AS BIGINT) AS s_sum,
               CAST(s_sq AS BIGINT) AS s_sq,
               CAST(CASE WHEN den = 0 THEN 0
                    ELSE (num * 1000000
                          - (((num * 1000000) % den) + den) % den)
                         // den
                    END AS BIGINT) AS r_ppm
        FROM f
    """
    out["charset_audit"] = f"""
        WITH src AS (
          SELECT url, hex(html) AS h FROM read_parquet('{glob}')),
        b AS (
          SELECT url, substr(h, 2 * i + 1, 2) AS byte
          FROM src, unnest(range(0, length(h) // 2)) AS t(i)),
        stats AS (
          SELECT url, count(*) AS n_bytes,
                 count(*) FILTER (WHERE byte >= '80') AS n_high,
                 count(*) FILTER (WHERE byte < '20'
                     AND byte NOT IN ('09', '0A', '0D')) AS n_ctrl
          FROM b GROUP BY url)
        SELECT s.url,
               CAST(COALESCE(n_bytes, 0) AS BIGINT) AS n_bytes,
               CAST(CASE WHEN COALESCE(n_bytes, 0) = 0 THEN 0
                    ELSE (n_high * 1000000) // n_bytes END AS BIGINT)
                   AS high_ppm,
               CAST(COALESCE(n_ctrl, 0) AS BIGINT) AS n_ctrl,
               substr(s.h, 1, 6) = 'EFBBBF' AS has_bom,
               substr(s.h, 1, 4) = '1F8B' AS is_gzip
        FROM src s LEFT JOIN stats ON s.url = stats.url
    """
    out["domain_components"] = edges_cte + """
        , und AS (
          SELECT DISTINCT least(src_domain, dst_domain) AS a,
                 greatest(src_domain, dst_domain) AS b
          FROM edges WHERE src_domain <> dst_domain),
        bidir AS (SELECT a, b FROM und UNION SELECT b, a FROM und),
        reach(a, b) AS (
          SELECT a, b FROM bidir
          UNION
          SELECT r.a, e.b FROM reach r JOIN bidir e ON r.b = e.a)
        SELECT a AS domain, least(a, min(b)) AS component
        FROM reach GROUP BY a
    """
    # the recursive closure needs WITH RECURSIVE: patch the shared CTE
    out["domain_components"] = out["domain_components"].replace(
        "WITH src AS", "WITH RECURSIVE src AS", 1)
    out["domain_hops"] = (edges_cte + f"""
        , und AS (
          SELECT DISTINCT least(src_domain, dst_domain) AS a,
                 greatest(src_domain, dst_domain) AS b
          FROM edges WHERE src_domain <> dst_domain),
        bidir AS (SELECT a, b FROM und UNION SELECT b, a FROM und),
        walk(domain, d) AS (
          SELECT '{HOPS_SEED}' AS domain, 0 AS d
          UNION
          SELECT e.b, w.d + 1 FROM walk w
          JOIN bidir e ON e.a = w.domain WHERE w.d < {HOPS_MAX})
        SELECT domain, CAST(min(d) AS BIGINT) AS hops
        FROM walk GROUP BY domain
    """).replace("WITH src AS", "WITH RECURSIVE src AS", 1)
    out["anchor_texts"] = f"""
        WITH src AS (
          SELECT CAST(html AS VARCHAR) AS body
          FROM read_parquet('{glob}')
          WHERE substr(hex(html), 1, 4) <> '1F8B'),
        m AS (
          SELECT unnest(regexp_extract_all(body,
              'href=\\\\x22https://site-[0-9]+\\.example/'
              || '[a-z]+/html/[0-9]+\\\\x22>[a-z]+</a>')) AS s
          FROM src),
        p AS (
          SELECT regexp_extract(s,
                     'https://(site-[0-9]+\\.example)/', 1) AS dst_domain,
                 regexp_extract(s, '>([a-z]+)</a>$', 1) AS anchor
          FROM m),
        c AS (
          SELECT dst_domain, anchor, count(*) AS n
          FROM p GROUP BY 1, 2)
        SELECT dst_domain, anchor, CAST(n AS BIGINT) AS n_links,
               CAST(row_number() OVER (PARTITION BY dst_domain
                    ORDER BY n DESC, anchor) AS BIGINT) AS arank
        FROM c
        QUALIFY arank <= {ANCHOR_TOP_K}
    """
    return out
