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


def exact_dedup(ds: Dataset, keys: list[str],
                num_output_blocks: int | None = None) -> Dataset:
    """One row per distinct ``keys`` tuple (columns = ``keys``), via the same
    combiner-first shuffle (D4/D5 edge-dedup semantics,
    post-import-cypher.txt merge / Loader.groovy:397 Set<Rel>)."""
    return pre_aggregated_count(
        ds, keys, num_output_blocks=num_output_blocks).drop_columns(["support"])
