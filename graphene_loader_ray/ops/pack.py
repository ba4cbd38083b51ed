"""Sequence packing — the training-batch preparation step: assign
documents to fixed-token-budget packs so concatenated sequences waste
as little context window as possible.

Distributed shape: one hash shuffle of (id, weight) rows partitions the
corpus; each partition packs independently with a TWO-POINTER greedy —
sort by (weight DESC, id), each pack takes the heaviest unpacked
document plus the longest run of lightest documents that still fits
(one ``searchsorted`` on the tail cumsum per pack). The loop is O(packs)
— never a Python loop over rows — and the big-plus-smalls shape fills
far tighter than next-fit on uniform weight mixes while staying fully
deterministic.

Determinism: pack membership depends only on the partition's row set
(hash of id) and the sort order (weight DESC, id ASC) — invariant to
input partitioning, run, and cluster size. ``pack_id`` is the smallest
doc id in the pack (unique corpus-wide, stable). A document heavier
than the budget gets a singleton pack flagged ``oversize`` (the caller
splits or drops those — this op never silently truncates).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset

from .partition import group_partitioned


def _pack_partition(df: pd.DataFrame, weight_col: str, id_col: str,
                    budget: int) -> pd.DataFrame:
    df = df.sort_values([weight_col, id_col], kind="mergesort",
                        ascending=[False, True]).reset_index(drop=True)
    w = df[weight_col].to_numpy(np.int64)
    ids = df[id_col].to_numpy()
    n = len(w)
    tail_cum = np.cumsum(w[::-1])        # lightest-first running sum
    pack_id = np.empty(n, np.int64)
    fill = np.empty(n, np.int64)
    n_docs = np.empty(n, np.int64)
    h, tcnt = 0, 0                       # head pointer / tail docs consumed
    while h < n - tcnt:
        rem = budget - int(w[h])
        base = int(tail_cum[tcnt - 1]) if tcnt else 0
        extra = 0
        if rem > 0:
            extra = int(np.searchsorted(tail_cum, base + rem,
                                        side="right")) - tcnt
            extra = min(extra, n - tcnt - h - 1)
        members = np.concatenate(
            [[h], np.arange(n - tcnt - extra, n - tcnt)]) if extra \
            else np.array([h])
        pid = ids[members].min()
        f = int(w[members].sum())
        pack_id[members] = pid
        fill[members] = f
        n_docs[members] = len(members)
        tcnt += extra
        h += 1
    out = df.copy()
    out["pack_id"] = pack_id
    out["pack_fill"] = fill
    out["pack_n_docs"] = n_docs
    out["oversize"] = w > budget
    return out


def pack_sequences(docs: Dataset, budget: int, weight_col: str,
                   id_col: str = "doc_id",
                   num_partitions: int = 16) -> Dataset:
    """→ input rows + ``pack_id`` (smallest doc id in the pack),
    ``pack_fill`` (sum of weights), ``pack_n_docs``, ``oversize``.
    Every pack satisfies fill ≤ budget except singleton oversize docs."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            out = df.copy()
            for c in ("pack_id", "pack_fill", "pack_n_docs"):
                out[c] = pd.Series(dtype="int64")
            out["oversize"] = pd.Series(dtype="bool")
            return out
        return _pack_partition(df, weight_col, id_col, budget)

    return group_partitioned(docs, [id_col], fn,
                             num_partitions=num_partitions)
