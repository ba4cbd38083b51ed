"""Corpus-level duplicate-span removal (the C4 / CCNet "remove any line
seen elsewhere in the corpus" rule, keep-first-occurrence): documents are
chunked into consecutive ≤10-word spans, every span that occurs more than
once in the WHOLE corpus is kept only at its first occurrence (smallest
(doc_id, position)), and documents are reassembled without the dropped
spans.

Chunking is one greedy RE2 pattern (``\\S+( \\S+){0,9}``) so the DuckDB
twin (regexp_extract_all — also RE2) produces byte-identical spans; the
first-occurrence winner is the min of an encoded ``doc_id*2^20 + idx``
key, so it is total-ordered and partition-independent.

Scale shape: the explode is a pure map (same bytes as the corpus). The
winner table is DISTINCT-span-sized and aggregated combiner-first (one
min per span hash per batch). Resolution auto-switches: if few spans are
actually duplicated (the normal web case — boilerplate is a small
fraction of distinct spans), the dup winners broadcast via ``ray.put``
and occurrences filter map-side with NO shuffle; above
``broadcast_max`` dups it falls back to a hash-partitioned join. The
reassembly groupby(doc_id) is the one unavoidable corpus shuffle.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Count, Min, Sum

from .partition import group_partitioned

_CHUNK = re.compile(r"\S+( \S+){0,9}")
_IDX_BITS = 20          # positions per document < 2^20 (docs < ~10M words)
# k = (doc_id << 20) + idx. For doc ids above 2^43 the shift wraps mod
# 2^64 (numpy semantics, identical everywhere the key is computed): the
# winner is then an arbitrary-but-deterministic occurrence rather than
# the smallest (doc_id, idx) — still a valid keep-exactly-one rule, and
# the one hash-derived ids (pipelines/curate.py) rely on.


class _Explode:
    """doc -> one row per span: (doc_id, idx [1-based], chunk, h, k).

    ``hash_fn="md5"`` (default) hashes spans with md5 hex so the DuckDB
    twin is byte-comparable. ``hash_fn="fast"`` is the scale knob (the
    same trade as ngram_jaccard's ``hashed=True``): the vectorized
    stable 64-bit pandas row hash — ~8 B per span on the wire instead of
    32+ and no per-span digest call; a 64-bit collision merges two
    distinct spans (≈ n²/2⁶⁵ — negligible until ~10¹⁰ distinct spans,
    where collisions drop the odd extra occurrence)."""

    def __init__(self, text_col: str, id_col: str, hash_fn: str = "md5"):
        self.text_col, self.id_col = text_col, id_col
        self.hash_fn = hash_fn

    def __call__(self, t: pa.Table) -> pa.Table:
        doc_ids, idxs, chunks = [], [], []
        for did, text in zip(t[self.id_col].to_pylist(),
                             t[self.text_col].to_pylist()):
            spans = [m.group(0) for m in _CHUNK.finditer(text or "")]
            doc_ids.extend([did] * len(spans))
            idxs.extend(range(1, len(spans) + 1))
            chunks.extend(spans)
        if self.hash_fn == "fast":
            from .partition import stable_hash63
            h = pa.array(stable_hash63(chunks), pa.int64())
        else:
            h = pa.array([hashlib.md5(c.encode()).hexdigest()
                          for c in chunks], pa.string())
        ids = np.asarray(doc_ids, dtype=np.int64)
        ix = np.asarray(idxs, dtype=np.int64)
        # a doc with ≥2^20 spans (~10M words) would bleed its high span
        # indexes into the next doc_id's key space and corrupt keep-first
        # resolution for BOTH docs — fail loudly instead (ADVICE r3)
        if ix.size and int(ix.max()) >= (1 << _IDX_BITS):
            raise ValueError(
                f"document with >= 2^{_IDX_BITS} spans exceeds the "
                "span-index key budget; split oversized documents upstream")
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "idx": pa.array(ix, pa.int64()),
            "chunk": pa.array(chunks, pa.string()),
            "h": h,
            "k": pa.array((ids << _IDX_BITS) + ix, pa.int64())})


def _winners(occ: Dataset) -> Dataset:
    """(h, wk=min k, n=occurrences) per distinct span — combiner-first."""
    import pyarrow.compute as pc

    def partial(t: pa.Table) -> pa.Table:
        g = t.select(["h", "k"]).group_by("h") \
            .aggregate([("k", "min"), ("k", "count")])
        return pa.table({"h": g["h"], "wk": g["k_min"],
                         "n": pc.cast(g["k_count"], pa.int64())})

    return occ.map_batches(partial, batch_format="pyarrow") \
        .groupby("h").aggregate(Min("wk", alias_name="wk"),
                                Sum("n", alias_name="n"))


def span_dedup(docs: Dataset, text_col: str = "text",
               id_col: str = "doc_id", broadcast_max: int = 2_000_000,
               num_partitions: int = 16, hash_fn: str = "md5",
               passthrough: Dataset | None = None) -> Dataset:
    """One row per document: ``doc_id``, ``text`` (spans deduplicated
    corpus-wide, first occurrence kept, null if nothing survived),
    ``n_total`` and ``n_kept`` span counts. ``hash_fn`` — see
    :class:`_Explode` (md5 = SQL-twin-comparable, fast = scale knob).

    ``passthrough``: an optional per-document metadata Dataset keyed by
    ``id_col``; its other columns are attached to the output rows by
    riding the SAME reassembly shuffle as marker rows (idx 0 — span
    indexes are 1-based) instead of a second doc_id-keyed join after the
    fact. This keeps the pipeline at EXACTLY ONE full-text exchange
    (pipelines/curate.py, VERDICT r3 #2): the metadata rows are
    doc-count-sized, the spans would shuffle anyway. Requirements:
    one metadata row per id (duplicates would multiply output rows),
    ids int64-castable, column names disjoint from
    {doc_id, idx, chunk, keep, text, n_total, n_kept}; a doc missing
    from ``passthrough`` gets null metadata (and int64 metadata columns
    then upcast to float64 in the pandas merge — keep it complete)."""
    import pyarrow.compute as pc

    import ray

    occ = docs.map_batches(_Explode(text_col, id_col, hash_fn),
                           batch_format="pyarrow")
    win = _winners(occ)

    # distinct DUPLICATED spans only — object-store blocks, never driver
    # rows until the size check passes
    dup = win.map_batches(
        lambda t: t.filter(pc.greater(t["n"], 1)).select(["h", "wk"]),
        batch_format="pyarrow").materialize()
    if dup.count() <= broadcast_max:
        dup_tbl = dup.to_pandas()
        # sorted fixed-width hash array + aligned winner keys: the mark
        # becomes one vectorized searchsorted per batch (the decontam
        # recipe) instead of a per-row dict probe; int64 winner keys stay
        # integers end-to-end (a float64 round-trip would ROUND keys
        # above 2^53 — doc ids from hashes — and match nothing)
        fast = hash_fn == "fast"
        harr = dup_tbl["h"].to_numpy(dtype=np.int64 if fast else "U32")
        order = np.argsort(harr)
        handle = ray.put((harr[order],
                          dup_tbl["wk"].to_numpy(np.int64)[order]))

        def mark(t: pa.Table) -> pa.Table:
            hs_s, wk_s = ray.get(handle)
            hs = t["h"].to_numpy(zero_copy_only=False)
            hs = hs.astype(np.int64 if fast else "U32")
            pos = np.searchsorted(hs_s, hs)
            pos[pos >= len(hs_s)] = 0
            hit = (hs_s[pos] == hs) if len(hs_s) else \
                np.zeros(len(hs), bool)
            keep = ~hit | (wk_s[pos] == t["k"].to_numpy()) if len(hs_s) \
                else np.ones(len(hs), bool)
            return t.append_column("keep", pa.array(keep, pa.bool_()))

        marked = occ.map_batches(mark, batch_format="pyarrow")
    else:
        # Corpus-scale duplicated-span set: resolve with two keyed
        # shuffles of the occurrences instead of a broadcast — an
        # anti-join marks never-duplicated spans keep=True, an inner
        # join compares duplicated occurrences against their winner.
        from .join import equi_join
        # both joins consume the SAME (h, wk) dataset: two different
        # select_columns projections of one materialized input can be
        # wrongly merged by Ray 2.49's operator dedup when schema hashing
        # fails (observed: the h-only Project fed the tag expecting wk);
        # the anti join simply ignores the tiny wk column
        nondup = equi_join(occ, dup, on=["h"],
                           how="left_anti",
                           num_partitions=num_partitions) \
            .map_batches(lambda t: t.append_column(
                "keep", pa.array(np.ones(t.num_rows, dtype=bool))),
                batch_format="pyarrow")
        dupocc = equi_join(occ, dup,
                           on=["h"], num_partitions=num_partitions) \
            .map_batches(lambda t: t.append_column(
                "keep", pc.equal(t["wk"], t["k"])).drop_columns(["wk"]),
                batch_format="pyarrow")
        marked = nondup.union(dupocc)

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({
                "doc_id": pd.Series(dtype="int64"),
                "text": pd.Series(dtype=object),
                "n_total": pd.Series(dtype="int64"),
                "n_kept": pd.Series(dtype="int64")})
        df = df.sort_values(["doc_id", "idx"], kind="mergesort")
        g = df.groupby("doc_id", sort=False)
        kept = df[df["keep"]].groupby("doc_id", sort=False)
        text = kept["chunk"].agg(" ".join)
        out = pd.DataFrame({
            "n_total": g.size().astype("int64"),
            "n_kept": kept.size().reindex(g.size().index,
                                          fill_value=0).astype("int64")})
        out["text"] = text.reindex(out.index)
        out = out.reset_index()[["doc_id", "text", "n_total", "n_kept"]]
        # the join fallback path reaches pandas as nullable Int64 (merge
        # upcast); doc_id is null-free by construction — pin plain int64
        out["doc_id"] = out["doc_id"].astype("int64")
        return out

    core = marked.select_columns(["doc_id", "idx", "chunk", "keep"])
    if passthrough is None:
        return group_partitioned(core, ["doc_id"], reassemble,
                                 num_partitions=num_partitions)

    meta_schema = passthrough.schema()      # ray.data Schema wrapper
    meta_types = dict(zip(meta_schema.names, meta_schema.types))
    meta_cols = [n for n in meta_schema.names if n != id_col]
    reserved = {"doc_id", "idx", "chunk", "keep", "text", "n_total", "n_kept"}
    clash = reserved.intersection(meta_cols)
    if clash:
        raise ValueError(f"passthrough columns collide with span_dedup "
                         f"columns: {sorted(clash)}")

    def pad_spans(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in t.column_names}
        for n in meta_cols:
            cols[n] = pa.nulls(t.num_rows, meta_types[n])
        return pa.table(cols)

    def meta_rows(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": pc.cast(t[id_col], pa.int64()),
            "idx": pa.array(np.zeros(t.num_rows, np.int64)),
            "chunk": pa.nulls(t.num_rows, pa.string()),
            "keep": pa.array(np.zeros(t.num_rows, bool)),
            **{n: t[n] for n in meta_cols}})

    unioned = core.map_batches(pad_spans, batch_format="pyarrow") \
        .union(passthrough.map_batches(meta_rows, batch_format="pyarrow"))

    def reassemble_meta(t: pa.Table) -> pd.DataFrame:
        # split in ARROW first: each side is null-free in its own columns,
        # so int64 metadata stays int64 through pandas (the equi_join
        # splitting rule — a whole-table conversion would float-upcast
        # null-padded ints and round values above 2^53)
        is_meta = pc.equal(t["idx"], 0)
        meta_df = t.filter(is_meta) \
            .select(["doc_id", *meta_cols]).to_pandas()
        spans = t.filter(pc.invert(is_meta)) \
            .select(["doc_id", "idx", "chunk", "keep"]).to_pandas()
        out = reassemble(spans)
        return out.merge(meta_df, on="doc_id", how="left")

    return group_partitioned(unioned, ["doc_id"], reassemble_meta,
                             num_partitions=num_partitions,
                             batch_format="pyarrow")
