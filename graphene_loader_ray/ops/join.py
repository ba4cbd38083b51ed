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

    NULL join keys follow SQL semantics (ADVICE r3 — pandas merge would
    otherwise match NA==NA): a row with ANY null key value never matches,
    so it is dropped from inner/semi output and KEPT in anti output (the
    NOT-EXISTS rule: a null-key correlate finds nothing).

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

    # The tagged union null-pads the other side's columns, so a partition
    # holding both sides carries int64-with-nulls. A whole-table pandas
    # conversion would upcast those to float64 — which both crashes the
    # next shuffle on mixed-dtype blocks AND silently ROUNDS int64 values
    # above 2^53 (hash-derived ids). So the match UDF receives ARROW,
    # splits the sides, and converts each side without the padded columns;
    # genuinely-null int columns map to pandas nullable Int dtypes (exact).
    _PD_INT = {pa.int64(): pd.Int64Dtype(), pa.int32(): pd.Int32Dtype(),
               pa.int16(): pd.Int16Dtype(), pa.int8(): pd.Int8Dtype(),
               pa.uint64(): pd.UInt64Dtype(), pa.uint32(): pd.UInt32Dtype(),
               pa.uint16(): pd.UInt16Dtype(), pa.uint8(): pd.UInt8Dtype()}

    def match(part: pa.Table) -> pd.DataFrame:
        """One vectorized pandas merge per hash partition (NOT per key —
        per-key UDF dispatch dominates at high key cardinality)."""
        import pyarrow.compute as pc
        is_l = pc.equal(part[_SIDE], "l")
        lhs = part.filter(is_l).select(on + lcols) \
            .to_pandas(types_mapper=_PD_INT.get)
        rhs = part.filter(pc.invert(is_l)).select(on + rcols) \
            .to_pandas(types_mapper=_PD_INT.get)
        # SQL NULL-key semantics: null keys never equal anything. Right
        # rows with null keys can't match (drop always); left rows with
        # null keys drop from inner/semi and stay in anti.
        lhs_null = lhs[on].isna().any(axis=1)
        rhs = rhs.dropna(subset=on) if len(rhs) else rhs
        if how == "inner":
            out = lhs[~lhs_null].merge(rhs, on=on, how="inner")
            return out.reindex(columns=on + lcols + rcols)
        keys_r = rhs[on].drop_duplicates()
        if how == "left_semi":
            return lhs[~lhs_null].merge(keys_r, on=on, how="inner")
        if how == "left_anti":
            nn = lhs[~lhs_null]
            marked = nn.merge(keys_r.assign(__hit=1), on=on, how="left")
            return pd.concat([marked[marked["__hit"].isna()][on + lcols],
                              lhs[lhs_null][on + lcols]],
                             ignore_index=True)
        raise ValueError(how)

    from .partition import group_partitioned
    return group_partitioned(tagged, on, match,
                             num_partitions=num_partitions,
                             batch_format="pyarrow")
