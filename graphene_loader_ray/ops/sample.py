"""Stratified deterministic sampling — per-group caps for training-data
mixing (take at most k documents per language / per source / per domain,
the same k documents on every run and under any partitioning).

The selection rule is "k smallest md5(CAST(id AS VARCHAR)) per group"
(ties broken by id), which a SQL twin reproduces exactly with
``row_number() OVER (PARTITION BY key ORDER BY md5(...), id)`` — so the
driver can hash-compare it against DuckDB.

Scale shape: combiner-first. Every batch reduces to ≤ k rows per group it
contains (a partial top-k is itself mergeable: the global k smallest are
always among the union of per-batch k smallest), so the key shuffle moves
O(groups × k × batches) rows, never the corpus. The md5 is per-row Python
(hashlib has no vectorized form and the SQL twin pins the exact function)
— the same documented trade as ops/dedup.hash_sample.
"""

from __future__ import annotations

import hashlib

import pandas as pd

from ray.data import Dataset

from .partition import group_partitioned

_H = "__strat_h"


def _rank_hash(df: pd.DataFrame, id_col: str) -> pd.Series:
    return df[id_col].map(
        lambda x: hashlib.md5(str(x).encode()).hexdigest())


def _sort_grouped(df: pd.DataFrame, key: str, id_col: str) -> pd.DataFrame:
    """Order rows by (key, hash, id) with NULL keys sortable for ANY key
    dtype: multi-key object sorts lexsort raw values (None < str raises
    TypeError; a string fill on a numeric key mixes types), so the key
    sorts via its dense rank with nulls ranked last — dtype-agnostic and
    total. Group interleaving doesn't matter: within-group (hash, id)
    order, which is all the head/cumcount selection reads, is
    preserved."""
    return df.assign(_kr=df[key].rank(method="dense", na_option="bottom")) \
        .sort_values(["_kr", _H, id_col], kind="mergesort") \
        .drop(columns=["_kr"])


def _topk_per_group(df: pd.DataFrame, key: str, id_col: str,
                    k: int) -> pd.DataFrame:
    # dropna=False: NULL is a group like any other (the generated SQL
    # twin's PARTITION BY keeps a NULL partition)
    return _sort_grouped(df, key, id_col) \
        .groupby(key, sort=False, dropna=False).head(k)


def stratified_sample(ds: Dataset, key: str, id_col: str, k: int,
                      num_partitions: int = 16) -> Dataset:
    """At most ``k`` rows per distinct ``key`` value, chosen as the k
    smallest ``md5(str(id))`` (then id) — deterministic across runs,
    partitionings and cluster sizes. All input columns pass through."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.assign(**{_H: pd.Series(dtype="object")})
        df = df.assign(**{_H: _rank_hash(df, id_col)})
        return _topk_per_group(df, key, id_col, k)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.drop(columns=[_H])
        return _topk_per_group(df, key, id_col, k).drop(columns=[_H])

    partials = ds.map_batches(partial, batch_format="pandas")
    return group_partitioned(partials, [key], final,
                             num_partitions=num_partitions)


def stratified_sample_sql(table: str, key: str, id_col: str, k: int,
                          columns: list[str]) -> str:
    """The DuckDB twin of :func:`stratified_sample` over ``table``,
    generated from the same rule so the two can't drift."""
    cols = ", ".join(columns)
    return (f"SELECT {cols} FROM ("
            f"SELECT {cols}, row_number() OVER ("
            f"PARTITION BY {key} "
            f"ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col}) AS rn "
            f"FROM {table}) WHERE rn <= {k}")


def temperature_sample(ds: Dataset, key: str, id_col: str,
                       alpha: float = 0.5, scale: float = 1.0,
                       num_partitions: int = 16) -> Dataset:
    """Temperature / alpha rebalancing (the multilingual-corpus mixing
    rule): group ``l`` of size ``n_l`` keeps its
    ``k_l = min(n_l, floor(scale · n_l^alpha + 0.5))`` rows with the
    smallest ``md5(str(id))`` (ties by id) — after sampling, group sizes
    are ∝ n^alpha, flattening head languages/domains while keeping tail
    groups intact. Deterministic across runs, partitionings and cluster
    sizes; :func:`temperature_sample_sql` generates the DuckDB twin from
    the same rule.

    Scale shape: one combiner-first counting pass (groups-sized shuffle)
    to size every group; the per-group caps broadcast as a dict; then the
    same mergeable partial-top-k selection as :func:`stratified_sample`
    with a per-group k — the key shuffle moves O(Σ k_l × batches) rows,
    never the corpus."""
    import numpy as np
    import pyarrow as pa

    import ray

    def count_partial(t: pa.Table) -> pa.Table:
        g = t.select([key]).group_by(key).aggregate([([], "count_all")])
        return pa.table({key: g[key],
                         "n": g["count_all"].cast(pa.int64())})

    # driver reduce of the groups×batches partials (bounded, tiny) — a
    # Dataset groupby here would sort the key column, and Ray's sort
    # boundary search crashes comparing None to str on nullable keys
    parts = ds.map_batches(count_partial,
                           batch_format="pyarrow").to_pandas()
    sizes = parts.groupby(key, dropna=False, sort=False)["n"] \
        .sum().reset_index()
    n = sizes["n"].to_numpy().astype(np.float64)
    k = np.minimum(sizes["n"].to_numpy(),
                   np.floor(scale * np.power(n, alpha) + 0.5)
                   .astype(np.int64))
    # normalize the null key to None (numeric pandas nulls arrive as NaN,
    # which never equals itself in a dict lookup)
    caps_ref = ray.put({(None if pd.isna(g) else g): int(x)
                        for g, x in zip(sizes[key], k)})

    def take_caps(df: pd.DataFrame) -> pd.DataFrame:
        caps = ray.get(caps_ref)
        df = _sort_grouped(df, key, id_col).reset_index(drop=True)
        # dropna=False: the SQL twin's PARTITION BY keeps a NULL-key
        # partition, so the engine must cap (not drop) null-key rows;
        # pyarrow's count pass groups nulls too, so caps has a None entry
        rank = df.groupby(key, sort=False, dropna=False).cumcount()
        kvals = df[key].map(
            lambda v: caps.get(None if pd.isna(v) else v, 0)).to_numpy()
        return df[rank < kvals]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.assign(**{_H: pd.Series(dtype="object")})
        df = df.assign(**{_H: _rank_hash(df, id_col)})
        return take_caps(df)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df.drop(columns=[_H])
        return take_caps(df).drop(columns=[_H])

    partials = ds.map_batches(partial, batch_format="pandas")
    return group_partitioned(partials, [key], final,
                             num_partitions=num_partitions)


def temperature_sample_sql(table: str, key: str, id_col: str,
                           alpha: float, scale: float,
                           columns: list[str]) -> str:
    """DuckDB twin of :func:`temperature_sample`, generated from the same
    rule (identical IEEE pow/floor, half-up cap) so the two can't
    drift."""
    cols = ", ".join(columns)
    return (f"SELECT {cols} FROM ("
            f"SELECT {cols}, row_number() OVER ("
            f"PARTITION BY {key} "
            f"ORDER BY md5(CAST({id_col} AS VARCHAR)), {id_col}) AS rn, "
            f"count(*) OVER (PARTITION BY {key}) AS n "
            f"FROM {table}) "
            f"WHERE rn <= least(n, CAST(floor({scale!r} * pow(n, {alpha!r})"
            f" + 0.5) AS BIGINT))")
