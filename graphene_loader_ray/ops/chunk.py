"""Document chunking with overlap — the RAG / context-window
preparation step: split every document into fixed-size character
windows with a fixed overlap, one output row per chunk.

Pure map (flat_map shape, no shuffle): each batch explodes its
documents into chunk rows with vectorized Arrow slicing — one
``utf8_slice_codeunits`` call per CHUNK INDEX (bounded by the longest
doc in the batch), never a Python loop over rows.

Window rule (mirrored exactly by the DuckDB twin, which generates
starts with ``generate_series`` and cuts with ``substring``): chunk i
starts at ``i·(size−overlap)`` (codepoints, 0-based) and takes
``size`` codepoints; a document of length ≤ size (even ≤ overlap) is
one whole chunk, and text is never dropped; NULL/empty documents emit
nothing.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset


def chunk_table(t: pa.Table, size: int, overlap: int,
                text_col: str = "text",
                id_col: str = "doc_id") -> pa.Table:
    """The pure per-batch kernel of :func:`chunk_documents` (exposed for
    Ray-free property tests): → (id, chunk_idx, n_chunks, chunk) rows."""
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")
    step = size - overlap
    lens = pc.fill_null(pc.utf8_length(t[text_col]), 0) \
        .to_numpy(zero_copy_only=False).astype(np.int64)
    n_chunks = 1 + np.maximum(lens - overlap - 1, 0) // step
    n_chunks[lens == 0] = 0
    ids = t[id_col].to_numpy(zero_copy_only=False)
    out_id, out_idx, out_n, out_chunk = [], [], [], []
    max_c = int(n_chunks.max()) if len(n_chunks) else 0
    # iterate chunk indices over a SHRINKING live set (sorted by chunk
    # count): slicing the full column every iteration would cost
    # O(rows × max_chunks) slice work when one long doc dominates a batch
    order = np.argsort(n_chunks, kind="stable")
    text_sorted = t[text_col].take(pa.array(order, pa.int64()))
    if isinstance(text_sorted, pa.ChunkedArray):
        text_sorted = text_sorted.combine_chunks()
    ids_sorted, n_sorted = ids[order], n_chunks[order]
    for i in range(max_c):
        start = int(np.searchsorted(n_sorted, i + 1))   # first live doc
        live_text = text_sorted.slice(start)
        sl = pc.utf8_slice_codeunits(live_text, i * step, i * step + size)
        out_id.append(ids_sorted[start:])
        out_idx.append(np.full(len(n_sorted) - start, i, np.int64))
        out_n.append(n_sorted[start:])
        out_chunk.append(sl)
    if not out_id:
        return pa.table({
            id_col: pa.array([], pa.int64()),
            "chunk_idx": pa.array([], pa.int64()),
            "n_chunks": pa.array([], pa.int64()),
            "chunk": pa.array([], pa.string())})
    chunks = pa.concat_arrays([c.combine_chunks()
                               if isinstance(c, pa.ChunkedArray) else c
                               for c in out_chunk])
    return pa.table({
        id_col: pa.array(np.concatenate(out_id), pa.int64()),
        "chunk_idx": pa.array(np.concatenate(out_idx), pa.int64()),
        "n_chunks": pa.array(np.concatenate(out_n), pa.int64()),
        "chunk": chunks})


def chunk_documents(docs: Dataset, size: int = 500, overlap: int = 100,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> Dataset:
    """→ Dataset(doc_id, chunk_idx [0-based], n_chunks, chunk)."""
    if not 0 <= overlap < size:
        raise ValueError("need 0 <= overlap < size")

    def explode(t: pa.Table) -> pa.Table:
        return chunk_table(t, size, overlap, text_col, id_col)

    return docs.map_batches(explode, batch_format="pyarrow")


def chunk_documents_sql(table: str, size: int, overlap: int,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> str:
    """DuckDB twin generated from the same window rule (1-based
    substring; generate_series upper bound = greatest(len−overlap−1, 0)
    // step gives the same last-start)."""
    step = size - overlap
    return f"""
        WITH d AS (
          SELECT {id_col}, {text_col} AS t, length({text_col}) AS n
          FROM {table}
          WHERE {text_col} IS NOT NULL AND length({text_col}) > 0),
        s AS (
          SELECT {id_col}, t, n,
                 unnest(generate_series(
                   0, greatest(n - {overlap} - 1, 0) // {step})) AS i,
                 (greatest(n - {overlap} - 1, 0) // {step}) + 1
                   AS n_chunks
          FROM d)
        SELECT {id_col},
               CAST(i AS BIGINT) AS chunk_idx,
               CAST(n_chunks AS BIGINT) AS n_chunks,
               substring(t, i * {step} + 1, {size}) AS chunk
        FROM s"""
