"""Distributed equi-join built on groupby/map_groups (the portable pattern).

Ray 2.49's native ``Dataset.join`` hash-shuffle breaks when a partition
receives rows on only one side (empty-side blocks lose their schema inside
the aggregator — reproduced in this sandbox), so joins here use the explicit
pattern from the Ray Data guide: tag each side, union, hash-shuffle by key
via ``groupby``, and cross-match inside ``map_groups``.

Scale notes: this is an all-to-all shuffle of both sides — reach for it only
when BOTH sides are large. A small side should be broadcast instead
(``ray.put`` + dict lookup inside ``map_batches`` — see stages/vocab.py
ResolveRefs, stages/link.py). Skewed keys hurt: a hot join key serializes
into one group — pre-filter head keys or salt (ops/aggregate.py doc).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

_SIDE = "__join_side"


def as_arrow_schema(schema) -> pa.Schema:
    """Normalize a ray.data Schema (arrow- or pandas-backed) to pyarrow.
    Pandas-backed blocks report numpy dtypes / python classes; object
    dtype is assumed string (all join payloads here are scalar columns)."""
    base = getattr(schema, "base_schema", schema)
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for n, t in zip(base.names, base.types):
        if isinstance(t, pa.DataType):
            pt = t
        else:
            try:
                dt = np.dtype(t)
                pt = pa.string() if dt == np.dtype(object) \
                    else pa.from_numpy_dtype(dt)
            except TypeError:
                pt = pa.string()
        fields.append(pa.field(n, pt))
    return pa.schema(fields)


def equi_join(left: Dataset, right: Dataset, on: list[str],
              how: str = "inner", num_partitions: int = 16) -> Dataset:
    """Join two datasets on equal key columns.

    Non-key columns must be disjoint between the two sides (rename before
    joining). ``how`` ∈ {inner, left_semi, left_anti}. Output columns:
    keys + left payload + right payload (inner), or the left side unchanged
    (semi/anti).

    ``num_partitions`` is the hash-partition count (ops/partition.py): the
    shuffle key is ``hash(on) % P`` and each partition is matched with ONE
    vectorized pandas merge. Size P to ~(total rows / target partition
    rows) at scale; skewed join keys spread only up to their partition —
    salt hot keys upstream if one key dominates.
    """
    lschema, rschema = as_arrow_schema(left.schema()), \
        as_arrow_schema(right.schema())
    lcols = [c for c in lschema.names if c not in on]
    rcols = [c for c in rschema.names if c not in on]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"non-key columns overlap: {overlap}")

    def tag(side: str, other_cols: list[str], other_schema):
        def fn(t: pa.Table) -> pa.Table:
            t = t.append_column(_SIDE, pa.array([side] * t.num_rows))
            for c in other_cols:
                idx = other_schema.names.index(c)
                t = t.append_column(
                    c, pa.nulls(t.num_rows, other_schema.types[idx]))
            cols = on + lcols + rcols + [_SIDE]
            return t.select(cols)
        return fn

    tagged = left.map_batches(tag("l", rcols, rschema), batch_format="pyarrow") \
        .union(right.map_batches(tag("r", lcols, lschema), batch_format="pyarrow"))

    # declared-integer columns: the tagged union null-pads the other side's
    # columns, so partitions holding both sides see int64-with-nulls →
    # pandas upcasts the WHOLE column to float64, while one-sided
    # partitions keep int64 — mixed-dtype blocks crash the next shuffle's
    # sort merge ("Types mismatch: double != int64"). Restore the declared
    # dtype on the way out (nullable Int64 → arrow int64, nulls preserved).
    int_cols = {n for sch in (lschema, rschema)
                for n, t in zip(sch.names, sch.types)
                if pa.types.is_integer(t)}

    def restore_ints(out: pd.DataFrame) -> pd.DataFrame:
        for c in out.columns:
            if c in int_cols and out[c].dtype.kind == "f":
                out[c] = out[c].astype("Int64")
        return out

    def match(part: pd.DataFrame) -> pd.DataFrame:
        """One vectorized pandas merge per hash partition (NOT per key —
        per-key UDF dispatch dominates at high key cardinality)."""
        lhs = part[part[_SIDE] == "l"]
        rhs = part[part[_SIDE] == "r"]
        if how == "inner":
            out = lhs[on + lcols].merge(rhs[on + rcols], on=on, how="inner")
            return restore_ints(out.reindex(columns=on + lcols + rcols))
        keys_r = rhs[on].drop_duplicates()
        if how == "left_semi":
            return restore_ints(lhs[on + lcols].merge(keys_r, on=on,
                                                      how="inner"))
        if how == "left_anti":
            marked = lhs[on + lcols].merge(
                keys_r.assign(__hit=1), on=on, how="left")
            return restore_ints(marked[marked["__hit"].isna()][on + lcols])
        raise ValueError(how)

    from .partition import group_partitioned
    return group_partitioned(tagged, on, match,
                             num_partitions=num_partitions)
