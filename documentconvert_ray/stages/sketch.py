"""Mergeable quantile sketch — the continuous-value scale path beside
the exact ``value_quantiles`` operator.

The exact operator shuffles distinct (key, value) histogram rows,
which is right for discrete/low-cardinality values and degenerates to
O(rows) exchange when every value is unique (its docstring names this
sketch as the fallback). This module makes the fallback real:

- per batch, per key: sort the values and compress to ≤ S
  evenly-rank-spaced (value, weight) pairs whose weights sum EXACTLY
  to the batch count (deterministic decimation, no randomness);
- intermediate merge: hash-bucketed groupby concatenates partial
  summaries, re-sorts, re-compresses to S (bounds the final group at
  n_buckets·S pairs however many batches existed);
- final merge per key: exact weighted quantile over the ≤ n_buckets·S
  surviving pairs.

Rank-error bound: each compression level displaces a query rank by at
most W/S of the weight it summarized, and there are exactly two
levels, so the returned value's true rank is within ≈ 2/S of the
requested quantile (S = 512 → ±0.4%; the pytest gate asserts ±2%).
Exchange volume is O(batches · S), independent of row count — the
100 TB shape. The result is approximate and can vary with block
partitioning (like the IVF paths); the test gate is therefore a rank
bound, not equality, and the op is registered rows-only (no SQL
oracle).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SKETCH_SIZE = 512


def _compress(vals: np.ndarray, wts: np.ndarray,
              s: int = SKETCH_SIZE) -> tuple[np.ndarray, np.ndarray]:
    """Sorted weighted multiset → ≤ s evenly-rank-spaced pairs; total
    weight preserved exactly (W//s each, remainder spread over the
    lowest-rank picks — deterministic)."""
    if len(vals) <= s:
        return vals, wts
    w_total = int(wts.sum())
    cum = np.cumsum(wts)
    # s weight intervals with floor-sequence boundaries (remainder
    # spread evenly — bunching it at the low ranks biases the merged
    # CDF upward by up to (s-1) ranks PER BATCH, which compounds);
    # each interval is represented by the element at its center rank
    # and weighted by its exact width, so totals are preserved and the
    # per-level CDF error is ≤ W/(2s), unbiased.
    b = np.arange(s + 1, dtype=np.int64) * w_total // s
    t = (b[:-1] + b[1:]) // 2
    idx = np.searchsorted(cum, t, side="right")
    out_v = vals[idx]
    out_w = np.diff(b)
    return out_v, out_w


def sketch_partial(batch: pa.Table, n_buckets: int) -> pa.Table:
    """(event_type, v) rows → one summary row per (key, batch):
    (jb, event_type, vals list, wts list). jb hash-buckets the
    intermediate merge so no group ever holds more than
    ≈ n_buckets · S pairs regardless of batch count."""
    import zlib

    df = batch.select(["event_type", "v"]).to_pandas()
    out_jb: list[int] = []
    out_k: list[str] = []
    out_v: list[np.ndarray] = []
    out_w: list[np.ndarray] = []
    for k, g in df.groupby("event_type", sort=True):
        vs = np.sort(g["v"].to_numpy())
        cv, cw = _compress(vs, np.ones(len(vs), dtype=np.int64))
        out_k.append(k)
        out_v.append(cv)
        out_w.append(cw)
        # deterministic content hash spreads a key's many batches
        # across the intermediate merge groups
        out_jb.append(zlib.crc32(k.encode() + cv.tobytes()) % n_buckets)
    return pa.Table.from_pydict(
        {"jb": pa.array(out_jb, pa.int32()),
         "event_type": pa.array(out_k, pa.string()),
         "vals": pa.array([x.tolist() for x in out_v],
                          pa.list_(pa.int64())),
         "wts": pa.array([x.tolist() for x in out_w],
                         pa.list_(pa.int64()))})


def sketch_merge(group):
    """One intermediate bucket (pandas) → per-key re-compressed
    summaries (jb dropped; the final groupby is by key only)."""
    import pandas as pd

    out_k: list[str] = []
    out_v: list[list[int]] = []
    out_w: list[list[int]] = []
    for k, g in group.groupby("event_type", sort=True):
        v = np.concatenate([np.asarray(x, dtype=np.int64)
                            for x in g["vals"]])
        w = np.concatenate([np.asarray(x, dtype=np.int64)
                            for x in g["wts"]])
        order = np.argsort(v, kind="mergesort")
        cv, cw = _compress(v[order], w[order])
        out_k.append(k)
        out_v.append(cv.tolist())
        out_w.append(cw.tolist())
    return pd.DataFrame(
        {"event_type": out_k, "vals": out_v, "wts": out_w})


def sketch_final(group, quantiles=(0.25, 0.50, 0.90)):
    """One key's surviving summaries → exact weighted quantiles of the
    sketch (value at the smallest cumulative weight ≥ q·W)."""
    import pandas as pd

    out = []
    for k, g in group.groupby("event_type", sort=True):
        v = np.concatenate([np.asarray(x, dtype=np.int64)
                            for x in g["vals"]])
        w = np.concatenate([np.asarray(x, dtype=np.int64)
                            for x in g["wts"]])
        order = np.argsort(v, kind="mergesort")
        v, w = v[order], w[order]
        cum = np.cumsum(w)
        w_total = int(cum[-1])
        row = {"event_type": k, "n_events": w_total}
        for q, name in zip(quantiles, ("p25_micro", "p50_micro",
                                       "p90_micro")):
            target = max(1, int(np.ceil(q * w_total)))
            row[name] = int(v[np.searchsorted(cum, target, side="left")])
        out.append(row)
    return pd.DataFrame(out, columns=["event_type", "p25_micro",
                                      "p50_micro", "p90_micro",
                                      "n_events"])
