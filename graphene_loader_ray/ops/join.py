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

import pandas as pd
import pyarrow as pa

from ray.data import Dataset

_SIDE = "__join_side"


def equi_join(left: Dataset, right: Dataset, on: list[str],
              how: str = "inner", num_partitions: int = 16) -> Dataset:
    """Join two datasets on equal key columns.

    Non-key columns must be disjoint between the two sides (rename before
    joining). ``how`` ∈ {inner, left_semi, left_anti}. Output columns:
    keys + left payload + right payload (inner), or the left side unchanged
    (semi/anti).

    ``num_partitions`` bounds the shuffle width: upstream groupbys can leave
    hundreds of near-empty blocks, and shuffling B blocks costs O(B²) tiny
    tasks — an explicit repartition before the groupby keeps the join
    proportional to data, not to upstream block fragmentation. Size it to
    ~(total rows / target block rows) at scale.
    """
    lschema, rschema = left.schema(), right.schema()
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
        .union(right.map_batches(tag("r", lcols, lschema), batch_format="pyarrow")) \
        .repartition(num_partitions)

    def match(group: pd.DataFrame) -> pd.DataFrame:
        lhs = group[group[_SIDE] == "l"]
        rhs = group[group[_SIDE] == "r"]
        if how == "inner":
            if lhs.empty or rhs.empty:
                return group.head(0).drop(columns=[_SIDE])
            out = lhs[on + lcols].merge(rhs[on + rcols], on=on, how="inner")
            return out.reindex(columns=on + lcols + rcols)
        if how == "left_semi":
            keep = lhs if not rhs.empty else lhs.head(0)
            return keep[on + lcols]
        if how == "left_anti":
            keep = lhs if rhs.empty else lhs.head(0)
            return keep[on + lcols]
        raise ValueError(how)

    return tagged.groupby(on).map_groups(match, batch_format="pandas")
