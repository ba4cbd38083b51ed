"""Benchmark decontamination: flag corpus documents that share any word
n-gram with a benchmark/eval set (the standard train-test-overlap filter a
training-data pipeline runs before export; n=13 in the common recipe,
configurable — tests use a small n so the synthetic corpus produces a
non-degenerate hit mix).

Shape: the benchmark side is SMALL by definition (eval suites are a few
thousand documents against a corpus of billions), so its distinct n-gram
set is computed once, sorted, and broadcast via ``ray.put`` — the corpus
scan is then a stateless vectorized ``np.searchsorted`` membership test
per batch with NO shuffle at all. The only driver materialization is the
benchmark n-gram set itself (bounded by benchmark size, same bound as the
IVF centroid sample in ops/similarity.py).

Hashing: uint64 shingle hashes from the shared ``ShingleHasher`` kernel
(ASCII ``\\w`` over lowercased text — the DuckDB twin's tokenization);
string-exactness rests on 64-bit no-collision, the documented assumption
of every hashed-shingle path (pinned by
test_ngram_jaccard_hashed_equals_strings).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
from ray.data import Dataset

from .dedup import ShingleHasher


def benchmark_ngram_set(bench_docs: Dataset, n: int = 13,
                        text_col: str = "text") -> "ray.ObjectRef":
    """Distinct n-gram hash set of the benchmark docs as a SORTED uint64
    array, placed in the object store once (read by every scan task)."""

    def shingles(t: pa.Table) -> pa.Table:
        sh = ShingleHasher(n=n, ascii_words=True)
        parts = [sh.shingle_hashes(x or "", strict=True)
                 for x in t[text_col].to_pylist()]
        u = (np.unique(np.concatenate(parts)) if parts
             else np.empty(0, dtype=np.uint64))
        return pa.table({"h": pa.array(u, pa.uint64())})

    chunks = [b["h"].to_numpy(zero_copy_only=False)
              for b in bench_docs.map_batches(
                  shingles, batch_format="pyarrow").iter_batches(
                  batch_size=1 << 20, batch_format="pyarrow")
              if b.num_rows]
    merged = (np.unique(np.concatenate(chunks)) if chunks
              else np.empty(0, dtype=np.uint64))
    return ray.put(merged)


class ContaminationFlagger:
    """Per-batch membership scan against the broadcast benchmark set
    (actor pool: the hasher's word cache and the ray.get of the sorted
    set happen once per actor)."""

    def __init__(self, bench_ref, n: int, text_col: str, id_col: str) -> None:
        self.bench: np.ndarray = ray.get(bench_ref)
        self.sh = ShingleHasher(n=n, ascii_words=True)
        self.text_col, self.id_col = text_col, id_col

    def __call__(self, t: pa.Table) -> pa.Table:
        n_hit = np.zeros(t.num_rows, dtype=np.int64)
        bench = self.bench
        for i, text in enumerate(t[self.text_col].to_pylist()):
            doc = self.sh.shingle_hashes(text or "", strict=True)
            if len(doc) == 0 or len(bench) == 0:
                continue
            pos = np.searchsorted(bench, doc)
            pos[pos == len(bench)] = 0
            n_hit[i] = int(np.count_nonzero(bench[pos] == doc))
        return pa.table({
            self.id_col: t[self.id_col],
            "n_hit": pa.array(n_hit, pa.int64()),
            "contaminated": pa.array(n_hit > 0, pa.bool_()),
        })


def flag_contamination(docs: Dataset, bench_ref, n: int = 13,
                       text_col: str = "text", id_col: str = "doc_id",
                       concurrency=(1, 8)) -> Dataset:
    """(id, n_hit, contaminated) per corpus doc: n_hit = how many of the
    doc's DISTINCT n-grams appear in the benchmark set. Docs shorter than
    n words have no n-grams and are never flagged (strict shingling, same
    rule as the exact-Jaccard path and the SQL twin)."""
    return docs.map_batches(
        ContaminationFlagger, batch_format="pyarrow", batch_size=2048,
        concurrency=concurrency,
        fn_constructor_kwargs={"bench_ref": bench_ref, "n": n,
                               "text_col": text_col, "id_col": id_col})
