"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup (instruction-set training-data ops).

Shapes (ray_guide 'Aggregation at scale' near-dup recipe):
  exact     : content hash in map_batches → groupby(hash) keep min id
  minhash   : shingle→minhash per batch (numpy) → explode to
              (band, band_hash, doc) rows → groupby bucket → candidate
              pairs → verify exact Jaccard → connected components
  simhash   : 64-bit sign-aggregated token hash → band buckets →
              hamming-verified pairs
  embedding : unit-normalize → random-hyperplane LSH buckets (seeded) →
              in-bucket cosine ≥ τ pairs (brute verify)

Skew note: a boilerplate shingle set shared by millions of docs makes one
LSH bucket enormous; ``max_bucket`` caps the in-bucket pairing (dropped
buckets are reported, not silently ignored) — the head-key guard for this
op family.
"""

from __future__ import annotations

import hashlib
import itertools
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset


# 31-bit Mersenne prime field: a*x stays < 2^62, so the affine minhash
# batch is pure uint64 numpy (no bigint fallback)
_MERSENNE = (1 << 31) - 1


def _stable64(s: str) -> int:
    return int.from_bytes(
        hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest(), "big")


# ------------------------------------------------------------------- exact

def exact_text_dedup(docs: Dataset, text_col: str = "text",
                     id_col: str = "doc_id") -> Dataset:
    """(text_hash md5-hex, doc_id=min id, n_dups) — one row per distinct
    text. md5 so the DuckDB oracle (`md5(text)`) matches byte-for-byte."""

    def h(batch: pa.Table) -> pa.Table:
        hashes = [hashlib.md5((t or "").encode("utf-8")).hexdigest()
                  for t in batch[text_col].to_pylist()]
        return pa.table({"text_hash": pa.array(hashes, pa.string()),
                         "doc_id": batch[id_col]})

    from ray.data.aggregate import Count, Min
    return docs.map_batches(h, batch_format="pyarrow") \
        .groupby("text_hash") \
        .aggregate(Min("doc_id", alias_name="doc_id"),
                   Count(alias_name="n_dups"))


# ----------------------------------------------------------------- minhash

def shingle_set(text: str, n: int = 3) -> set[int]:
    """Word n-gram shingles as 64-bit stable hashes."""
    words = re.findall(r"\w+", text.lower())
    if len(words) < n:
        return {_stable64(" ".join(words))} if words else set()
    return {_stable64(" ".join(words[i:i + n]))
            for i in range(len(words) - n + 1)}


def _minhash_params(k: int) -> tuple[np.ndarray, np.ndarray]:
    """k seeded affine hash functions over the 61-bit Mersenne field."""
    rng = np.random.default_rng(20240817)
    a = rng.integers(1, _MERSENNE, size=k, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, size=k, dtype=np.uint64)
    return a, b


class MinHasher:
    """doc -> k-minhash signature (numpy-vectorized over shingles)."""

    def __init__(self, k: int = 64, shingle_n: int = 3,
                 text_col: str = "text", id_col: str = "doc_id") -> None:
        self.k, self.n = k, shingle_n
        self.a, self.b = _minhash_params(k)
        self.text_col, self.id_col = text_col, id_col

    def signature(self, text: str) -> np.ndarray:
        sh = shingle_set(text, self.n)
        if not sh:
            return np.full(self.k, _MERSENNE, dtype=np.uint64)
        x = np.fromiter(sh, dtype=np.uint64, count=len(sh)) % _MERSENNE
        # (k, n_shingles) affine hashes mod mersenne, min over shingles
        vals = (self.a[:, None] * x[None, :] + self.b[:, None]) % _MERSENNE
        return vals.min(axis=1).astype(np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t or "")
                for t in batch[self.text_col].to_pylist()]
        return pa.table({
            "doc_id": batch[self.id_col],
            "sig": pa.array([s.tolist() for s in sigs],
                            pa.list_(pa.uint64(), self.k)),
        })


def lsh_candidate_pairs(signatures: Dataset, bands: int = 16,
                        max_bucket: int = 64) -> Dataset:
    """signatures (doc_id, sig) -> distinct candidate (a, b) pairs, a < b.

    Explode each signature into (band, band_hash) bucket rows; a groupby on
    the bucket key yields candidates. Buckets above ``max_bucket`` docs are
    truncated (skew guard) — truncation is observable in the `truncated`
    column of the bucket stats, not silent."""

    def explode(batch: pa.Table) -> pa.Table:
        band_ids, band_hashes, doc_ids = [], [], []
        for doc, sig in zip(batch["doc_id"].to_pylist(),
                            batch["sig"].to_pylist()):
            arr = np.asarray(sig, dtype=np.uint64)
            rows = arr.reshape(bands, -1)
            for bi in range(bands):
                band_ids.append(bi)
                band_hashes.append(hashlib.blake2b(
                    rows[bi].tobytes(), digest_size=8).hexdigest())
                doc_ids.append(doc)
        return pa.table({"band": pa.array(band_ids, pa.int32()),
                         "bucket": pa.array(band_hashes, pa.string()),
                         "doc_id": pa.array(doc_ids, pa.int64())})

    def pairs_part(part: pd.DataFrame) -> pd.DataFrame:
        """All in-bucket pairs for every bucket hashed into this partition
        (one pandas call per partition, not per bucket)."""
        part = part.drop_duplicates(["band", "bucket", "doc_id"])
        sizes = part.groupby(["band", "bucket"])["doc_id"].transform("size")
        rows: list[tuple[int, int]] = []
        for _, g in part[sizes >= 2].groupby(["band", "bucket"]):
            docs = sorted(g["doc_id"])[:max_bucket]
            rows.extend(itertools.combinations(docs, 2))
        return pd.DataFrame(rows, columns=["a", "b"]) if rows else \
            pd.DataFrame({"a": pd.Series(dtype="int64"),
                          "b": pd.Series(dtype="int64")})

    from .partition import group_partitioned
    exploded = signatures.map_batches(explode, batch_format="pyarrow")
    cand = group_partitioned(exploded, ["band", "bucket"], pairs_part)
    from .aggregate import exact_dedup
    return exact_dedup(cand, ["a", "b"], num_output_blocks=4)


def verify_jaccard(pairs: Dataset, docs: Dataset, threshold: float,
                   shingle_n: int = 3, text_col: str = "text",
                   id_col: str = "doc_id") -> Dataset:
    """Exact n-gram Jaccard over candidate pairs (the verify half of
    MinHash-LSH). Joins text back per side, then computes in-batch."""
    from .join import equi_join

    docs_a = docs.map_batches(
        lambda t: pa.table({"a": t[id_col], "text_a": t[text_col]}),
        batch_format="pyarrow")
    docs_b = docs.map_batches(
        lambda t: pa.table({"b": t[id_col], "text_b": t[text_col]}),
        batch_format="pyarrow")
    with_a = equi_join(pairs, docs_a, ["a"])
    with_ab = equi_join(with_a, docs_b, ["b"])

    def score(batch: pa.Table) -> pa.Table:
        out_a, out_b, jac = [], [], []
        for a, b, ta, tb in zip(batch["a"].to_pylist(), batch["b"].to_pylist(),
                                batch["text_a"].to_pylist(),
                                batch["text_b"].to_pylist()):
            sa, sb = shingle_set(ta or "", shingle_n), shingle_set(tb or "", shingle_n)
            union = len(sa | sb)
            j = (len(sa & sb) / union) if union else 0.0
            if j >= threshold:
                # ids may arrive float64 after the null-padded joins
                out_a.append(int(a))
                out_b.append(int(b))
                jac.append(round(j, 6))
        return pa.table({"a": pa.array(out_a, pa.int64()),
                         "b": pa.array(out_b, pa.int64()),
                         "jaccard": pa.array(jac, pa.float64())})

    return with_ab.map_batches(score, batch_format="pyarrow")


def minhash_dedup_pairs(docs: Dataset, threshold: float = 0.5,
                        k: int = 64, bands: int = 16, shingle_n: int = 3,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> Dataset:
    """Full near-dup pipeline: minhash → LSH buckets → verified pairs."""
    sigs = docs.map_batches(
        MinHasher, fn_constructor_kwargs={
            "k": k, "shingle_n": shingle_n,
            "text_col": text_col, "id_col": id_col},
        batch_format="pyarrow", concurrency=(1, 8)).materialize()
    cand = lsh_candidate_pairs(sigs, bands=bands)
    return verify_jaccard(cand, docs, threshold, shingle_n=shingle_n,
                          text_col=text_col, id_col=id_col)


# ----------------------------------------------------------------- simhash

class SimHasher:
    """64-bit SimHash over word features weighted by term frequency."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id") -> None:
        self.word_re = re.compile(r"\w+")
        self.text_col, self.id_col = text_col, id_col

    def simhash(self, text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        words = self.word_re.findall(text.lower())
        if not words:
            return 0
        from collections import Counter
        for w, c in Counter(words).items():
            h = _stable64(w)
            bits = (h >> np.arange(64, dtype=np.uint64)) & 1
            acc += c * (2 * bits.astype(np.int64) - 1)
        out = 0
        for i in range(64):
            if acc[i] > 0:
                out |= (1 << i)
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = [self.simhash(t or "") for t in batch[self.text_col].to_pylist()]
        return pa.table({"doc_id": batch[self.id_col],
                         "simhash": pa.array([f"{h:016x}" for h in hs],
                                             pa.string())})


def simhash_signatures(docs: Dataset, **kw) -> Dataset:
    return docs.map_batches(SimHasher, fn_constructor_kwargs=kw,
                            batch_format="pyarrow", concurrency=(1, 8))


def simhash_neardup_pairs(docs: Dataset, max_hamming: int = 3,
                          **kw) -> Dataset:
    """Band the 64-bit simhash into 4×16-bit keys (any pair within hamming
    ≤ 3 shares at least one band) → bucket groupby → hamming verify."""
    sigs = simhash_signatures(docs, **kw).materialize()

    def explode(batch: pa.Table) -> pa.Table:
        band, key, doc, sim = [], [], [], []
        for d, h in zip(batch["doc_id"].to_pylist(),
                        batch["simhash"].to_pylist()):
            v = int(h, 16)
            for bi in range(4):
                band.append(bi)
                key.append((v >> (16 * bi)) & 0xFFFF)
                doc.append(d)
                sim.append(h)
        return pa.table({"band": pa.array(band, pa.int32()),
                         "key": pa.array(key, pa.int32()),
                         "doc_id": pa.array(doc, pa.int64()),
                         "simhash": pa.array(sim, pa.string())})

    def pairs_part(part: pd.DataFrame) -> pd.DataFrame:
        part = part.drop_duplicates(["band", "key", "doc_id"])
        sizes = part.groupby(["band", "key"])["doc_id"].transform("size")
        rows = []
        for _, g in part[sizes >= 2].groupby(["band", "key"]):
            g = g.sort_values("doc_id")
            recs = list(zip(g["doc_id"], g["simhash"]))
            for (da, ha), (db, hb) in itertools.combinations(recs, 2):
                dist = bin(int(ha, 16) ^ int(hb, 16)).count("1")
                if dist <= max_hamming:
                    rows.append((da, db, dist))
        return pd.DataFrame(rows, columns=["a", "b", "hamming"]) if rows \
            else pd.DataFrame({"a": pd.Series(dtype="int64"),
                               "b": pd.Series(dtype="int64"),
                               "hamming": pd.Series(dtype="int64")})

    from .partition import group_partitioned
    cand = group_partitioned(
        sigs.map_batches(explode, batch_format="pyarrow"),
        ["band", "key"], pairs_part)
    from .aggregate import exact_dedup
    return exact_dedup(cand, ["a", "b", "hamming"], num_output_blocks=4)


# --------------------------------------------------------------- embedding

def embedding_neardup_pairs(embs: Dataset, threshold: float = 0.95,
                            n_planes: int = 8,
                            vec_col: str = "embedding",
                            id_col: str = "vec_id") -> Dataset:
    """Cosine near-dup via seeded random-hyperplane LSH buckets + in-bucket
    brute verify. Recall is per-bucket (pairs split across buckets are
    found iff they share a sign pattern) — the scale path; brute-force
    verify inside buckets keeps precision exact."""

    def bucketize(batch: pa.Table) -> pa.Table:
        vecs = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
        dim = vecs.shape[1] if vecs.ndim == 2 else 0
        planes = np.random.default_rng(7).standard_normal((dim, n_planes))
        signs = (vecs @ planes) >= 0
        keys = (signs * (1 << np.arange(n_planes))).sum(axis=1)
        return pa.table({"bucket": pa.array(keys, pa.int64()),
                         "vec_id": batch[id_col],
                         "vec": batch[vec_col]})

    def pairs(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop_duplicates("vec_id").sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        vecs = np.asarray([np.asarray(v, dtype=np.float64)
                           for v in g["vec"]])
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        unit = vecs / norms
        sim = unit @ unit.T
        rows = []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if sim[i, j] >= threshold:
                    rows.append((int(ids[i]), int(ids[j]),
                                 round(float(sim[i, j]), 6)))
        return pd.DataFrame(rows, columns=["a", "b", "cosine"]) if rows else \
            pd.DataFrame({"a": pd.Series(dtype="int64"),
                          "b": pd.Series(dtype="int64"),
                          "cosine": pd.Series(dtype="float64")})

    return embs.map_batches(bucketize, batch_format="pyarrow") \
        .groupby("bucket").map_groups(pairs, batch_format="pandas")
