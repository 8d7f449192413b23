"""Text-analysis stages over a `documents`-shaped table.

Each is a vectorized map_batches callable. Stateful ones (compiled
automata, marker tables) are classes for actor pools; the cheap ones
are plain functions. Semantics are kept exactly SQL-expressible where
an oracle exists (see pipelines/queries.py — e.g. token counting ==
``list_filter(string_split_regex(text,'\\s+'), x -> x <> '')``).
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..functions.textstats import (
    lang_id,
    punct_count,
    rolling_fingerprint,
    simhash64,
    stopword_count,
    token_count,
)


def token_stats_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens, n_punct, n_stop) per document."""
    texts = batch.column("text").to_pylist()
    return pa.Table.from_pydict(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array([token_count(t) for t in texts], pa.int64()),
            "n_punct": pa.array([punct_count(t) for t in texts], pa.int64()),
            "n_stop": pa.array([stopword_count(t) for t in texts], pa.int64()),
        }
    )


def md5_batch(batch: pa.Table) -> pa.Table:
    """Adds text_md5 (hex) — the exact-dedup key (== SQL md5(text))."""
    md5s = [
        hashlib.md5(t.encode("utf-8")).hexdigest()
        for t in batch.column("text").to_pylist()
    ]
    return batch.append_column("text_md5", pa.array(md5s, pa.string()))


class LangIdStage:
    """Actor-pool language-ID stage: marker tables built once per actor
    (the ST1 pattern — warm state amortized across batches)."""

    def __init__(self) -> None:
        from ..functions import textstats as _ts  # warm tables
        self._lang_id = _ts.lang_id

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds = [self._lang_id(t) for t in batch.column("text").to_pylist()]
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "lang_pred": pa.array(preds, pa.string()),
            }
        )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, fingerprint_hex, simhash_hex) — stable content ids."""
    texts = batch.column("text").to_pylist()
    return pa.Table.from_pydict(
        {
            "doc_id": batch.column("doc_id"),
            "fingerprint_hex": pa.array(
                [f"{rolling_fingerprint(t):016x}" for t in texts], pa.string()
            ),
            "simhash_hex": pa.array(
                [f"{simhash64(t):016x}" for t in texts], pa.string()
            ),
        }
    )


def ngram_partial_counts(batch: pa.Table) -> pa.Table:
    """Per-batch partial unigram counts (the combiner before the global
    groupby — SURVEY-guide 'pre-aggregate before a shuffle')."""
    from collections import Counter

    c: Counter = Counter()
    for t in batch.column("text").to_pylist():
        c.update(tok for tok in t.split() if tok)
    if not c:
        return pa.Table.from_pydict(
            {"word": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
        )
    words, ns = zip(*sorted(c.items()))
    return pa.Table.from_pydict(
        {"word": pa.array(list(words), pa.string()),
         "n": pa.array(list(ns), pa.int64())}
    )
