"""TF-IDF keyword extraction — the retrieval-style "top terms per
document" op: score every (doc, term) by tf · idf and keep each
document's top-k.

Two passes, corpus never shuffled:
  1. document frequency, combiner-first: each batch emits one
     (term, df_partial) row per distinct term (a term counted once per
     doc), then one vocab-sized groupby-sum; the distinct-doc count
     rides along the same partials.
  2. idf broadcasts once as (sorted term array, idf array) — the
     ``np.searchsorted`` lookup recipe — and a map-side pass computes
     per-doc term counts (pandas value_counts, C), scores
     ``tf · (ln((N+1)/(df+1)) + 1)``, and emits the local top-k rows.

Determinism / SQL parity: the score is rounded half-up to 6 decimals
BEFORE ranking and the rank order is (score DESC, term ASC) — the same
total order the DuckDB twin's ``row_number()`` uses, so a rounded tie
at the k boundary cannot select different rows (the knn_top10 rule).
Every term is in-vocabulary by construction (pass 1 saw the same
corpus).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from .textstats import WORD_PATTERN


def top_terms_per_doc(docs: Dataset, k: int = 3, text_col: str = "text",
                      id_col: str = "doc_id") -> Dataset:
    """→ Dataset(doc_id, term, tf int64, score float64) — ≤ k rows per
    document with ≥1 token; zero-token/NULL documents emit nothing."""
    import re
    from ray.data.aggregate import Sum

    word_re = re.compile(WORD_PATTERN, re.ASCII)

    def df_partial(t: pa.Table) -> pa.Table:
        doc_idx, words = [], []
        n_docs = 0
        for i, text in enumerate(t[text_col].to_pylist()):
            toks = word_re.findall((text or "").lower())
            if not toks:
                continue
            n_docs += 1
            doc_idx.extend([i] * len(toks))
            words.extend(toks)
        # one (doc, term) per distinct pair, then a C value_counts —
        # no per-token python dict work
        pairs = pd.DataFrame({"d": doc_idx, "w": words}) \
            .drop_duplicates()
        vc = pairs["w"].value_counts(sort=False)
        return pa.table({
            "term": pa.array(list(vc.index) + ["\x00__ndocs"],
                             pa.string()),
            "n": pa.array(np.concatenate([vc.to_numpy(),
                                          [n_docs]]).astype(np.int64),
                          pa.int64())})

    dfreq = docs.map_batches(df_partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("n", alias_name="n")).to_pandas()
    nd_mask = dfreq["term"] == "\x00__ndocs"
    n_total = int(dfreq.loc[nd_mask, "n"].sum())
    dfreq = dfreq[~nd_mask]
    order = np.argsort(dfreq["term"].to_numpy())
    terms_sorted = dfreq["term"].to_numpy()[order]
    df_sorted = dfreq["n"].to_numpy()[order].astype(np.float64)
    idf_sorted = np.log((n_total + 1.0) / (df_sorted + 1.0)) + 1.0
    model_ref = ray.put((terms_sorted.astype(str), idf_sorted))

    def score(t: pa.Table) -> pa.Table:
        terms_s, idf_s = ray.get(model_ref)
        out_id, out_term, out_tf, out_score = [], [], [], []
        for did, text in zip(t[id_col].to_pylist(),
                             t[text_col].to_pylist()):
            toks = word_re.findall((text or "").lower())
            if not toks:
                continue
            vc = pd.Series(toks, dtype=object).value_counts(sort=False)
            uniq = vc.index.to_numpy(dtype=str)
            tf = vc.to_numpy(np.float64)
            pos = np.searchsorted(terms_s, uniq)
            sc = np.floor(tf * idf_s[pos] * 1e6 + 0.5) / 1e6
            top = np.lexsort((uniq, -sc))[:k]      # score DESC, term ASC
            out_id.extend([did] * len(top))
            out_term.extend(uniq[top])
            out_tf.extend(tf[top])
            out_score.extend(sc[top])
        return pa.table({
            id_col: pa.array(out_id, pa.int64()),
            "term": pa.array(out_term, pa.string()),
            "tf": pa.array(np.asarray(out_tf, np.int64), pa.int64()),
            "score": pa.array(out_score, pa.float64())})

    return docs.map_batches(score, batch_format="pyarrow")


def top_terms_per_doc_sql(table: str, k: int = 3, text_col: str = "text",
                          id_col: str = "doc_id") -> str:
    """DuckDB twin generated from the same scoring rule (round-then-rank
    with the (score DESC, term) total order)."""
    return f"""
        WITH w AS (
          SELECT {id_col},
                 unnest(regexp_extract_all(lower({text_col}), '\\w+'))
                   AS term
          FROM {table}),
        tf AS (SELECT {id_col}, term, count(*) AS tf
               FROM w GROUP BY {id_col}, term),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        nd AS (SELECT count(DISTINCT {id_col}) AS n FROM tf),
        scored AS (
          SELECT tf.{id_col}, tf.term, CAST(tf.tf AS BIGINT) AS tf,
                 floor(tf.tf * (ln((nd.n + 1.0) / (df.df + 1.0)) + 1.0)
                       * 1e6 + 0.5) / 1e6 AS score
          FROM tf JOIN df USING (term), nd)
        SELECT {id_col}, term, tf, score FROM (
          SELECT *, row_number() OVER (
            PARTITION BY {id_col} ORDER BY score DESC, term) AS rn
          FROM scored) WHERE rn <= {k}"""
