"""Unigram language-model perplexity scoring — the CCNet-style "score
every document against a corpus LM" quality signal, as two Ray stages:

TRAIN (one pass, combiner-first): per-batch partial term counts →
vocab-sized groupby-sum → top-``vocab_size`` head by (count DESC, term)
plus the total token count. The corpus is never shuffled; only
O(vocab × batches) partial rows move.

SCORE (map-only, no shuffle): the model broadcasts once via ``ray.put``
as (sorted term array, per-term integer cost, OOV cost); each batch
tokenizes, looks terms up with one vectorized ``np.searchsorted``
(the `ops/decontam.py` recipe), and sums INTEGER costs per document.

Determinism / SQL parity: add-one smoothing over the vocab + one OOV
bucket, p(w) = (c(w)+1)/(total+|V|+1), per-token cost
``floor(-ln(p)·1e6 + 0.5)`` as int64 micro-nats — integer sums are
order-independent, so the DuckDB twin (same ln, same floor, same
integer average) hash-matches exactly; float summation would not.
The 4-decimal mean NLL is computed from integers:
``((2·cost + 100·n) // (200·n)) / 10000``  (half-up of cost/(100·n)).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

from .textstats import WORD_PATTERN, TermPartials


def train_unigram_lm(docs: Dataset, text_col: str = "text",
                     vocab_size: int = 512) -> dict:
    """One counting pass → ``{"terms": sorted str ndarray, "cost":
    int64 ndarray aligned to terms, "oov_cost": int, "total": int,
    "n_vocab": int}``. The aggregated vocabulary (distinct-term-sized,
    bounded) is materialized once to derive both the head and the total
    without re-running the corpus scan."""
    from ray.data.aggregate import Sum

    counts = docs.map_batches(
        TermPartials, batch_format="pyarrow", batch_size=2048,
        concurrency=(1, 8),
        fn_constructor_kwargs={"text_col": text_col}) \
        .groupby("term").aggregate(Sum("n", alias_name="n")) \
        .materialize()

    tdf = counts.map_batches(
        lambda t: pa.table(
            {"s": pa.array([pa.compute.sum(t["n"]).as_py() or 0],
                           pa.int64())}),
        batch_format="pyarrow").to_pandas()
    # a token-free corpus yields an empty counts dataset whose (empty)
    # blocks skip the partial-sum UDF entirely
    total = int(tdf["s"].sum()) if "s" in tdf.columns and len(tdf) else 0
    if total == 0:
        # formula-consistent degenerate LM: denom = 0+0+1, p_oov = 1,
        # cost = floor(-ln(1)*1e6+0.5) = 0
        return {"terms": np.array([], dtype=str),
                "cost": np.array([], np.int64),
                "oov_cost": 0, "total": 0, "n_vocab": 0}
    head = counts.sort(["n", "term"], descending=[True, False]) \
        .limit(vocab_size).to_pandas()

    n_vocab = len(head)
    denom = float(total + n_vocab + 1)
    order = np.argsort(head["term"].to_numpy())
    terms = head["term"].to_numpy()[order]
    c = head["n"].to_numpy()[order].astype(np.float64)
    cost = np.floor(-np.log((c + 1.0) / denom) * 1e6 + 0.5).astype(np.int64)
    oov = int(np.floor(-np.log(1.0 / denom) * 1e6 + 0.5))
    return {"terms": terms.astype(str), "cost": cost, "oov_cost": oov,
            "total": total, "n_vocab": n_vocab}


def score_perplexity(docs: Dataset, model: dict, text_col: str = "text",
                     id_col: str = "doc_id") -> Dataset:
    """Per document: ``n_tokens``, ``lm_cost_micro`` (int64 sum of
    per-token micro-nat costs), ``avg_nll`` (4-decimal half-up mean,
    computed in integer arithmetic). Zero-token documents are omitted
    (the SQL twin's GROUP BY never sees them)."""
    model_ref = ray.put(model)

    class Scorer:
        def __init__(self) -> None:
            import re
            m = ray.get(model_ref)
            self.terms = np.asarray(m["terms"], dtype=str)
            self.cost = m["cost"]
            self.oov = m["oov_cost"]
            self.word_re = re.compile(WORD_PATTERN, re.ASCII)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids, ns, costs = [], [], []
            for did, text in zip(t[id_col].to_pylist(),
                                 t[text_col].to_pylist()):
                toks = self.word_re.findall((text or "").lower())
                if not toks:
                    continue
                if len(self.terms) == 0:      # degenerate LM: all OOV
                    q = np.full(len(toks), self.oov, np.int64)
                else:
                    arr = np.asarray(toks, dtype=str)
                    pos = np.searchsorted(self.terms, arr)
                    pos[pos >= len(self.terms)] = 0
                    hit = self.terms[pos] == arr
                    q = np.where(hit, self.cost[pos], self.oov)
                ids.append(did)
                ns.append(len(toks))
                costs.append(int(q.sum()))
            n = np.asarray(ns, np.int64)
            c = np.asarray(costs, np.int64)
            avg = ((2 * c + 100 * n) // (200 * n)).astype(np.float64) / 1e4 \
                if len(n) else np.array([], np.float64)
            return pa.table({
                id_col: pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n, pa.int64()),
                "lm_cost_micro": pa.array(c, pa.int64()),
                "avg_nll": pa.array(avg, pa.float64())})

    return docs.map_batches(Scorer, batch_format="pyarrow",
                            batch_size=2048, concurrency=(1, 8))
