"""Distributed k-means (Lloyd) over an embedding column — the iterative
counterpart of the one-shot quantizer `ops/similarity.py:knn_ivf` builds
from a driver sample: here every iteration sees the FULL corpus.

Shape per iteration (the only scalable one):
  - centroids broadcast once via ``ray.put`` (k×dim floats);
  - one ``map_batches`` pass emits per-batch PARTIALS — (cluster, count,
    per-dimension sum) — so the data leaving a task is k rows, never the
    corpus;
  - the partials (≤ k × n_blocks rows, bounded and tiny) reduce on the
    driver in numpy — the same bounded tree-aggregate every distributed
    k-means uses. The corpus itself is never collected.

Determinism: float64 partial sums; assignment ties (equal distance)
break to the LOWEST cluster index via ``np.argmin``; an emptied cluster
keeps its previous centroid. Init is the k rows with the smallest
``md5(id)`` — partition/run-invariant (the `hash_sample` recipe), found
with per-batch local top-k so no sort shuffle.

The input Dataset is re-executed once per iteration — pass a
materialized (or freshly-read parquet) Dataset, not a long lazy chain.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from .similarity import vec_matrix


def _init_centroids(ds: Dataset, vec_col: str, id_col: str,
                    k: int, n_cand: int = 0) -> np.ndarray:
    """Deterministic maximin (farthest-point) init: gather the ``n_cand``
    rows with the smallest md5(id) hex (partition/run-invariant; per-batch
    local top-n keeps the shuffle at n_cand×blocks), seed with the
    hash-smallest row, then greedily add the candidate farthest from the
    chosen set (ties → hash order). Bounded driver work: n_cand×k dists."""
    n_cand = n_cand or max(32 * k, 256)

    def local_topn(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        hs = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
        order = np.argsort(np.asarray(hs))[:n_cand]
        out = t.select([id_col, vec_col]).take(pa.array(order, pa.int64()))
        return out.append_column(
            "_h", pa.array([hs[j] for j in order], pa.string()))

    cand = ds.map_batches(local_topn, batch_format="pyarrow").to_pandas()
    cand = cand.sort_values(["_h", id_col], kind="mergesort").head(n_cand)
    mat = np.asarray(cand[vec_col].tolist(), np.float64)
    if len(mat) < k:
        raise ValueError(f"k={k} but only {len(mat)} rows")
    chosen = [0]                                     # hash-smallest seed
    mind = ((mat - mat[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        nxt = int(np.argmax(mind))                   # ties → hash order
        chosen.append(nxt)
        mind = np.minimum(mind, ((mat - mat[nxt]) ** 2).sum(axis=1))
    return mat[chosen]


def _partial_sums_fn(cent_ref, vec_col: str):
    """One batch → ≤k partial rows: (cluster, count, sum vector). A plain
    closure (not an actor): the centroid ref is a tiny plasma object,
    ``ray.get`` per batch hits the local object-store cache."""

    def fn(t: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)                      # (k, dim) float64
        x = vec_matrix(t[vec_col])                    # (n, dim) float64
        # ||x-c||² = ||x||² - 2x·c + ||c||²; ||x||² constant per row →
        # argmin over (-2x·c + ||c||²), one matmul per batch
        d = -2.0 * (x @ cent.T) + (cent ** 2).sum(axis=1)
        assign = np.argmin(d, axis=1)                 # ties → lowest index
        k, dim = cent.shape
        counts = np.bincount(assign, minlength=k)
        sums = np.zeros((k, dim), np.float64)
        np.add.at(sums, assign, x)
        live = np.flatnonzero(counts)
        return pa.table({
            "cluster": pa.array(live, pa.int64()),
            "count": pa.array(counts[live], pa.int64()),
            "sum": pa.array(list(sums[live]),
                            pa.list_(pa.float64()))})

    return fn


def kmeans(ds: Dataset, k: int, vec_col: str = "embedding",
           id_col: str = "vec_id", max_iter: int = 20,
           tol: float = 1e-9) -> dict:
    """Lloyd iterations until centroid movement ≤ ``tol`` (squared L2,
    max over clusters) or ``max_iter``. Returns ``{"centroids": (k,dim)
    ndarray, "n_iter": int, "inertia": float}`` — attach assignments with
    :func:`assign_clusters`."""
    cent = _init_centroids(ds, vec_col, id_col, k)
    n_iter = 0
    for n_iter in range(1, max_iter + 1):
        ref = ray.put(cent)
        part = ds.map_batches(_partial_sums_fn(ref, vec_col),
                              batch_format="pyarrow").to_pandas()
        counts = np.zeros(k, np.int64)
        sums = np.zeros_like(cent)
        np.add.at(counts, part["cluster"].to_numpy(), part["count"].to_numpy())
        np.add.at(sums, part["cluster"].to_numpy(),
                  np.asarray(part["sum"].tolist(), np.float64))
        new = cent.copy()                             # empty cluster: keep
        live = counts > 0
        new[live] = sums[live] / counts[live, None]
        shift = float(((new - cent) ** 2).sum(axis=1).max())
        cent = new
        if shift <= tol:
            break
    inertia = _inertia(ds, cent, vec_col)
    return {"centroids": cent, "n_iter": n_iter, "inertia": inertia}


def _inertia(ds: Dataset, cent: np.ndarray, vec_col: str) -> float:
    ref = ray.put(cent)

    def part(t: pa.Table) -> pa.Table:
        x = vec_matrix(t[vec_col])
        c = ray.get(ref)
        d = (x ** 2).sum(1)[:, None] - 2.0 * (x @ c.T) + (c ** 2).sum(1)
        return pa.table({"s": pa.array([float(d.min(axis=1).sum())],
                                       pa.float64())})

    tot = ds.map_batches(part, batch_format="pyarrow").to_pandas()
    return float(tot["s"].sum())


def assign_clusters(ds: Dataset, centroids: np.ndarray,
                    vec_col: str = "embedding") -> Dataset:
    """Add a ``cluster`` column (nearest centroid, ties → lowest index)."""
    ref = ray.put(np.asarray(centroids, np.float64))

    def assign(t: pa.Table) -> pa.Table:
        cent = ray.get(ref)
        x = vec_matrix(t[vec_col])
        d = -2.0 * (x @ cent.T) + (cent ** 2).sum(axis=1)
        return t.append_column(
            "cluster", pa.array(np.argmin(d, axis=1), pa.int64()))

    return ds.map_batches(assign, batch_format="pyarrow")
