"""Hash-partitioned group processing — the scalable alternative to per-key
``map_groups``.

``groupby(key).map_groups(fn)`` invokes a Python UDF once per DISTINCT KEY;
at 10^5+ keys the interpreter dispatch dominates (measured: a 15k-key join
spent 45 s in per-group calls). The classic fix is to shuffle by
``hash(key) % P`` and run ONE vectorized pandas call per partition — work
scales with rows, parallelism with P, and the UDF cost is O(P).

Determinism: ``pd.util.hash_pandas_object`` with the default fixed hash key
— stable across processes and runs (no PYTHONHASHSEED dependence).
"""

from __future__ import annotations

from collections.abc import Callable

import pandas as pd

from ray.data import Dataset

_PART = "__hash_part"


def stable_hash63(values) -> "np.ndarray":
    """Vectorized stable 63-bit content hash (int64, top bit dropped):
    ``pd.util.hash_pandas_object`` with its fixed default key, so ids are
    identical across runs, partitionings and processes. The int63 range
    matters twice: uint64 above 2^63 trips Ray's pandas→arrow int
    inference, and span_dedup's winner-key encoding relies on these ids.
    Shared by curate doc ids and span_dedup's fast span hash — the two
    MUST stay bit-identical (span winners are curate doc-id ordered).

    Accepts pa.Array / pa.ChunkedArray / numpy / pandas / list input —
    Arrow callers pass their column directly (no per-stage ``.to_pandas``
    detour); the one object-dtype conversion the pandas hash requires
    happens here, and the hash value is identical for all input kinds."""
    import numpy as np
    import pyarrow as _pa

    if isinstance(values, (_pa.Array, _pa.ChunkedArray)):
        values = values.to_pandas()
    h = pd.util.hash_pandas_object(
        pd.Series(values, dtype=object), index=False).to_numpy()
    return (h >> 1).astype(np.int64)


def group_partitioned(ds: Dataset, keys: list[str],
                      fn: Callable,
                      num_partitions: int = 16,
                      batch_format: str = "pandas") -> Dataset:
    """Apply ``fn`` once per hash partition of ``keys``. ``fn`` sees every
    row of every key hashed into its partition (all rows of one key are in
    exactly one partition) and returns any DataFrame (or, with
    ``batch_format="pyarrow"``, receives a pa.Table — use that whenever the
    partition carries int64 columns WITH nulls: the pandas conversion
    upcasts those to float64 and silently rounds values above 2^53)."""

    import pyarrow as pa

    def add_part(t: pa.Table) -> pa.Table:
        """Arrow in/out: pandas conversion of the FULL table would upcast
        null-padded int columns to float and change their hashes; key
        columns are null-free, so only they round-trip through pandas.
        Numeric keys hash as float64 so int64 and float64 views of the
        same value land in the same partition (a column can arrive as
        either after an upstream outer-ish join)."""
        if t.num_rows == 0:
            return t.append_column(_PART, pa.array([], pa.uint64()))
        key_df = pd.DataFrame()
        for k in keys:
            s = t[k].to_pandas()
            if pd.api.types.is_numeric_dtype(s):
                s = s.astype("float64")
            key_df[k] = s
        h = pd.util.hash_pandas_object(key_df, index=False) % num_partitions
        return t.append_column(_PART, pa.array(h.to_numpy(), pa.uint64()))

    if batch_format == "pyarrow":
        def run(group: pa.Table):
            return fn(group.drop_columns([_PART]))
    else:
        def run(group: pd.DataFrame):
            return fn(group.drop(columns=[_PART]))

    out = ds.map_batches(add_part, batch_format="pyarrow") \
        .groupby(_PART).map_groups(run, batch_format=batch_format)
    # Normalize block types: Ray's sort shuffle emits empty PANDAS blocks
    # for empty partitions and the map operator passes empty blocks through
    # without running the UDF — leaving a pandas/arrow mix that crashes
    # downstream sort/aggregate block builders. An explicit batch_size
    # coalesces blocks (including empties) into batches, so the conversion
    # actually runs and every output block is arrow.
    #
    # The batch_size is a BUNDLING MINIMUM for the whole fused operator
    # chain: 65536 here made Ray bundle every sort output block (and any
    # downstream map fused with this one) into ONE task below ~65k rows,
    # serializing all post-shuffle stages (measured: the curate pipeline's
    # ScoreFilter ran 1 task at sf0.1). 4096 still coalesces empty/tiny
    # blocks but leaves real blocks one-task-each.
    return out.map_batches(lambda t: t, batch_format="pyarrow",
                           batch_size=4096)
