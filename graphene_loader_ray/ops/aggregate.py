"""Pre-aggregated (combiner) groupbys and exact dedup.

The scale pattern (SURVEY.md §4 skew row; ray_guide 'Aggregation at scale'):
a bare ``groupby(key)`` shuffles every row, and Zipf-skewed keys (head
entities — the reference's "common metabolites", post-import-cypher.txt:6)
all land on one reducer. Pre-aggregating inside ``map_batches`` (one row per
key per batch) is the combiner/salt: each input block contributes at most one
row per key to the shuffle, so a key appearing in 10% of a 100 TB corpus
moves O(#blocks) rows, not O(#occurrences).
"""

from __future__ import annotations

import pyarrow as pa

from ray.data import Dataset
from ray.data.aggregate import Sum

_PARTIAL = "__partial_count"


def pre_aggregated_count(ds: Dataset, keys: list[str],
                         count_col: str = "support",
                         num_output_blocks: int | None = None) -> Dataset:
    """Distinct ``keys`` rows with occurrence counts; two-phase (combine →
    shuffle → reduce). Output columns: ``keys + [count_col]``.

    ``num_output_blocks`` coalesces the result — groupby can emit one block
    per shuffle partition (hundreds of near-empty blocks for small inputs),
    which makes every downstream shuffle O(blocks²); compact explicitly when
    the result feeds further shuffles."""

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(keys).group_by(keys).aggregate([([], "count_all")])
        return t.rename_columns(keys + [_PARTIAL])

    # large partial batches: each batch contributes ≤ its distinct-key count
    # of rows to the shuffle, so bigger batches = fewer shuffle rows
    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536)
    out = partials.groupby(keys).aggregate(Sum(_PARTIAL, alias_name=count_col))
    if num_output_blocks is not None:
        out = out.repartition(num_output_blocks)
    return out


def pre_aggregated_sum(ds: Dataset, keys: list[str], value_col: str,
                       out_col: str | None = None,
                       num_output_blocks: int | None = None) -> Dataset:
    """groupby(keys).sum(value_col) with the same combiner-first shape."""
    out_col = out_col or value_col

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.select(keys + [value_col]).group_by(keys) \
            .aggregate([(value_col, "sum")])
        return t.rename_columns(keys + [_PARTIAL])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              batch_size=65536)
    out = partials.groupby(keys).aggregate(Sum(_PARTIAL, alias_name=out_col))
    if num_output_blocks is not None:
        out = out.repartition(num_output_blocks)
    return out


def salted_group_apply(ds: Dataset, keys: list[str],
                       partial_fn, combine_fn,
                       n_salts: int = 16,
                       num_partitions: int = 16) -> Dataset:
    """Two-phase grouped apply with SALTED keys — the skew-mitigation shape
    for head keys (post-import-cypher.txt:6's common metabolites appear in
    ≥10% of pages; a bare groupby sends every such row to one reducer).

    phase 1: group by ``keys + [salt]`` (salt = row position % n_salts,
             deterministic) and reduce each salted sub-group with
             ``partial_fn(df) -> one-row df`` — a hot key's rows split
             across n_salts groups, each bounded
    phase 2: group the n_salts partials by ``keys`` and merge with
             ``combine_fn(df) -> one-row df``

    For algebraic aggregates (sum/count/min/max) prefer
    ``pre_aggregated_*`` — the in-batch combiner subsumes salting. Use
    this when the per-group reduction is non-algebraic or per-group state
    is large (e.g. heavy sketches, per-key sorts)."""
    import numpy as np

    from .partition import group_partitioned

    _SALT = "__salt"

    def add_salt(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            _SALT, pa.array(np.arange(batch.num_rows) % n_salts, pa.int32()))

    def phase1(part):
        import pandas as pd
        out = [partial_fn(g.drop(columns=[_SALT]))
               for _, g in part.groupby(keys + [_SALT], sort=False)]
        return pd.concat(out, ignore_index=True) if out else \
            partial_fn(part.drop(columns=[_SALT]).head(0))

    def phase2(part):
        import pandas as pd
        out = [combine_fn(g) for _, g in part.groupby(keys, sort=False)]
        return pd.concat(out, ignore_index=True) if out else part.head(0)

    salted = ds.map_batches(add_salt, batch_format="pyarrow")
    partials = group_partitioned(salted, keys + [_SALT], phase1,
                                 num_partitions=num_partitions)
    return group_partitioned(partials, keys, phase2,
                             num_partitions=num_partitions)


def dedup_merge_props(ds: Dataset, keys: list[str],
                      props_col: str = "props",
                      support_col: str | None = None,
                      num_partitions: int = 8) -> Dataset:
    """One row per distinct ``keys`` tuple, merging the canonical-JSON
    ``props_col`` with the commutative per-key rule (kb/spec.py:merge_props)
    and, when ``support_col`` is given, summing it. The props-merging
    variant of :func:`exact_dedup` (D4 edge dedup with edge properties —
    rank/evidence, ReactomeLoader.groovy:267-270, GeneLoader.groovy:84-117).

    Hash-partitioned single-shuffle (ops/partition.py); per-group fold cost
    is bounded by the distinct-key count per partition (KB edges are
    vocabulary-scale; corpus-scale triples reach this only after the
    per-partition pre-aggregation)."""
    from ..kb.spec import merge_props_json
    from .partition import group_partitioned

    import pandas as pd

    def reduce_part(part: pd.DataFrame) -> pd.DataFrame:
        if part.empty:
            out = {k: pd.Series(dtype=object) for k in keys}
            out[props_col] = pd.Series(dtype=object)
            if support_col:
                out[support_col] = pd.Series(dtype="int64")
            return pd.DataFrame(out)

        def fold_props(series):
            out = None
            for s in series:
                if s is not None:
                    out = merge_props_json(out, s)
            return out

        aggs = {props_col: (props_col, fold_props)}
        if support_col:
            aggs[support_col] = (support_col, "sum")
        return part.groupby(keys, sort=False).agg(**aggs).reset_index()

    return group_partitioned(ds, keys, reduce_part,
                             num_partitions=num_partitions)


def exact_dedup(ds: Dataset, keys: list[str],
                num_output_blocks: int | None = None) -> Dataset:
    """One row per distinct ``keys`` tuple (columns = ``keys``), via the same
    combiner-first shuffle (D4/D5 edge-dedup semantics,
    post-import-cypher.txt merge / Loader.groovy:397 Set<Rel>)."""
    return pre_aggregated_count(
        ds, keys, num_output_blocks=num_output_blocks).drop_columns(["support"])


def distinct_values(ds: Dataset, col: str,
                    num_output_blocks: int | None = 2) -> Dataset:
    """Distinct values of one column — the A3 'distinct label set' surface
    (Importer.groovy:57-59,141: labels collected for index creation).
    Combiner-first (each block contributes ≤ its distinct count to the
    shuffle), unlike ``Dataset.unique`` which materializes to the driver."""
    return exact_dedup(ds.select_columns([col]), [col],
                       num_output_blocks=num_output_blocks)


def distinct_to_driver(ds: Dataset, col: str) -> "pa.Array":
    """Distinct values of one column collected AS AN ARROW ARRAY on the
    driver, with NO shuffle: each batch contributes its ``pc.unique``
    (map-side combine), the driver merges the small partials. For
    METADATA-scale key sets about to be broadcast (``ray.put`` + an
    ``is_in`` mask) — a full distinct shuffle costs seconds of fixed
    all-to-all latency to produce a set the driver must collect anyway.
    Use :func:`distinct_values` when the distinct set itself is large or
    stays distributed."""
    import pyarrow.compute as pc

    partial = ds.select_columns([col]).map_batches(
        lambda t: pa.table({col: pc.unique(t[col].combine_chunks())}),
        batch_format="pyarrow")
    chunks = [b[col].combine_chunks()
              for b in partial.iter_batches(batch_size=65536,
                                            batch_format="pyarrow")
              if b.num_rows]
    if not chunks:
        # keep the COLUMN's type on the empty result (schema() is cached
        # post-execution) so callers can feed it straight to pc.is_in
        # without a null-type special case
        sch = partial.schema()
        typ = (sch.base_schema.field(col).type
               if sch is not None and col in sch.names else pa.null())
        return pa.array([], typ)
    return pc.unique(pa.concat_arrays(chunks))
