"""Similarity search over an embedding column (list<float>).

- ``knn_brute``: exact cosine top-k. The query matrix is broadcast once
  (``ray.put``); each batch does one float64 matmul against it and emits its
  LOCAL top-k rows; a single small groupby(query) reduces to the global
  top-k. Shuffle volume is O(n_queries × k × n_blocks), never O(corpus).
- ``knn_lsh``: the scale path — seeded random-hyperplane buckets (multi-
  probe by Hamming-adjacent buckets); candidates re-scored exactly. Recall
  < 1 by construction; measured against knn_brute in tests.

Determinism: fixed seeds, float64 accumulation, ties broken by vec_id.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset


def _unit(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def vec_matrix(col) -> np.ndarray:
    """Embedding column (fixed_size_list or list<float>) → (n, dim)
    float64 matrix with NO per-row Python: flatten the child values in C
    and reshape (zero-copy from the Arrow buffer when dtypes line up;
    list_flatten — not .values — so sliced arrays stay correct). Ragged
    input falls back to to_pylist."""
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), np.float64)
    lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
    if (lens == lens[0]).all():
        flat = pc.list_flatten(col).to_numpy(zero_copy_only=False)
        return flat.astype(np.float64, copy=False).reshape(n, int(lens[0]))
    return np.asarray(col.to_pylist(), np.float64)


class _BruteScorer:
    def __init__(self, queries_ref, k: int, vec_col: str, id_col: str) -> None:
        q = ray.get(queries_ref)                      # {qid: vector}
        self.qids = np.array(sorted(q))
        self.qmat = _unit(np.asarray([q[i] for i in self.qids], np.float64))
        self.k, self.vec_col, self.id_col = k, vec_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _unit(vec_matrix(batch[self.vec_col]))
        ids = np.asarray(batch[self.id_col].to_pylist())
        sims = self.qmat @ vecs.T                     # (nq, nb)
        k = min(self.k, sims.shape[1])
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(self.qids):
            # rank by the ROUNDED score with vec_id tie-break — the same
            # total order the global reduce and the SQL twin use, so a
            # rounded tie straddling the per-batch top-k boundary can't
            # select a different row than DuckDB's ROW_NUMBER
            row = np.round(sims[qi], 6)
            top = np.lexsort((ids, -row))[:k]
            for j in top:
                out_q.append(int(qid))
                out_v.append(int(ids[j]))
                out_s.append(float(row[j]))
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})


def _global_topk(local: Dataset, k: int) -> Dataset:
    def reduce_topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["score", "vec_id"],
                             ascending=[False, True]).head(k)
    return local.groupby("query_id").map_groups(reduce_topk,
                                                batch_format="pandas")


def knn_brute(embs: Dataset, queries: dict[int, list[float]], k: int = 10,
              vec_col: str = "embedding", id_col: str = "vec_id") -> Dataset:
    """Exact top-k: (query_id, vec_id, score), k rows per query."""
    qref = ray.put(queries)
    local = embs.map_batches(
        _BruteScorer, fn_constructor_args=(qref, k, vec_col, id_col),
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 8))
    return _global_topk(local, k)


class _LshScorer:
    """Score only vectors whose bucket is within 1 Hamming bit of the
    query's bucket (multi-probe LSH)."""

    def __init__(self, queries_ref, k: int, n_planes: int,
                 vec_col: str, id_col: str) -> None:
        q = ray.get(queries_ref)
        self.qids = np.array(sorted(q))
        self.qmat = _unit(np.asarray([q[i] for i in self.qids], np.float64))
        self.k, self.n_planes = k, n_planes
        self.vec_col, self.id_col = vec_col, id_col
        dim = self.qmat.shape[1]
        self.planes = np.random.default_rng(7).standard_normal((dim, n_planes))
        qsigns = (self.qmat @ self.planes) >= 0
        self.qbuckets = (qsigns * (1 << np.arange(n_planes))).sum(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _unit(vec_matrix(batch[self.vec_col]))
        ids = np.asarray(batch[self.id_col].to_pylist())
        signs = (vecs @ self.planes) >= 0
        buckets = (signs * (1 << np.arange(self.n_planes))).sum(axis=1)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(self.qids):
            qb = self.qbuckets[qi]
            # exact bucket + all 1-bit probes
            probe = {qb} | {qb ^ (1 << b) for b in range(self.n_planes)}
            mask = np.isin(buckets, list(probe))
            if not mask.any():
                continue
            row = np.round(vecs[mask] @ self.qmat[qi], 6)
            sel_ids = ids[mask]
            k = min(self.k, len(row))
            # rounded score + vec_id tie-break: same total order as the
            # global reduce, deterministic across batch splits
            top = np.lexsort((sel_ids, -row))[:k]
            for j in top:
                out_q.append(int(qid))
                out_v.append(int(sel_ids[j]))
                out_s.append(float(row[j]))
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})


def knn_lsh(embs: Dataset, queries: dict[int, list[float]], k: int = 10,
            n_planes: int = 8, vec_col: str = "embedding",
            id_col: str = "vec_id") -> Dataset:
    """Approximate top-k via multi-probe hyperplane LSH."""
    qref = ray.put(queries)
    local = embs.map_batches(
        _LshScorer,
        fn_constructor_args=(qref, k, n_planes, vec_col, id_col),
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 8))
    return _global_topk(local, k)


# ------------------------------------------------------------------- IVF

def train_centroids(embs: Dataset, n_cells: int = 16, sample: int = 4096,
                    iters: int = 5, vec_col: str = "embedding") -> np.ndarray:
    """k-means-lite coarse quantizer: Lloyd iterations on a driver-side
    sample (seeded, deterministic). The corpus never materializes — only a
    bounded sample does; the centroid matrix is the broadcastable artifact
    (IVF's small side)."""
    rows = []
    for batch in embs.iter_batches(batch_size=4096, batch_format="pyarrow"):
        rows.extend(batch[vec_col].to_pylist())
        if len(rows) >= sample:
            break
    x = _unit(np.asarray(rows[:sample], np.float64))
    rng = np.random.default_rng(13)
    cent = x[rng.choice(len(x), size=min(n_cells, len(x)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(x @ cent.T, axis=1)          # cosine on unit vecs
        for c in range(len(cent)):
            members = x[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent = _unit(cent)
    return cent


class _IvfScorer:
    """Score only vectors whose nearest centroid is among the query's
    n_probe closest cells (classic IVF search)."""

    def __init__(self, queries_ref, centroids_ref, k: int, n_probe: int,
                 vec_col: str, id_col: str) -> None:
        q = ray.get(queries_ref)
        self.qids = np.array(sorted(q))
        self.qmat = _unit(np.asarray([q[i] for i in self.qids], np.float64))
        self.cent = ray.get(centroids_ref)
        self.k, self.n_probe = k, n_probe
        self.vec_col, self.id_col = vec_col, id_col
        qsim = self.qmat @ self.cent.T                  # (nq, cells)
        self.qcells = np.argsort(-qsim, axis=1)[:, :n_probe]

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = _unit(vec_matrix(batch[self.vec_col]))
        ids = np.asarray(batch[self.id_col].to_pylist())
        cells = np.argmax(vecs @ self.cent.T, axis=1)
        out_q, out_v, out_s = [], [], []
        for qi, qid in enumerate(self.qids):
            mask = np.isin(cells, self.qcells[qi])
            if not mask.any():
                continue
            row = np.round(vecs[mask] @ self.qmat[qi], 6)
            sel_ids = ids[mask]
            k = min(self.k, len(row))
            # rounded score + vec_id tie-break: same total order as the
            # global reduce, deterministic across batch splits
            top = np.lexsort((sel_ids, -row))[:k]
            for j in top:
                out_q.append(int(qid))
                out_v.append(int(sel_ids[j]))
                out_s.append(float(row[j]))
        return pa.table({"query_id": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "score": pa.array(out_s, pa.float64())})


def knn_ivf(embs: Dataset, queries: dict[int, list[float]], k: int = 10,
            n_cells: int = 16, n_probe: int = 4,
            vec_col: str = "embedding", id_col: str = "vec_id") -> Dataset:
    """IVF ANN: k-means-lite coarse cells (trained on a sample, broadcast),
    per-batch cell assignment, search restricted to the query's n_probe
    cells. Recall grows with n_probe (n_probe=n_cells degenerates to
    brute force)."""
    cent = train_centroids(embs, n_cells=n_cells, vec_col=vec_col)
    qref, cref = ray.put(queries), ray.put(cent)
    local = embs.map_batches(
        _IvfScorer, fn_constructor_args=(qref, cref, k, n_probe,
                                         vec_col, id_col),
        batch_format="pyarrow", batch_size=4096, concurrency=(1, 8))
    return _global_topk(local, k)
