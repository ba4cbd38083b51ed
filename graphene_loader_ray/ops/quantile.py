"""Distributed quantiles over grouped values.

Exact path (``grouped_quantiles``): one hash shuffle on the group key
(``ops/partition.py:group_partitioned``), then ONE vectorized pass per
partition — sort by (key, value), find group boundaries with np.unique,
and gather each quantile by index arithmetic; no per-group Python loop.
Discrete-quantile convention matches DuckDB's ``quantile_disc`` exactly:
``idx = max(0, ceil(q*n) - 1)`` over the ascending-sorted group (probed
empirically; both sides evaluate q*n in IEEE doubles, so the index — and
hence the picked element — is identical). Values pass through untouched
(bit-exact, no float math).

Scale assumption (same as interval_count_join): ALL values of one group
must fit one partition. That holds for grouped telemetry (values-per-key
≪ corpus) but not for e.g. a global quantile over 10^12 rows — for that,
``sampled_quantiles`` computes the same exact machinery over a
DETERMINISTIC md5-prefix row sample (the hash_sample rule): partition- and
run-invariant, mergeable by construction (a union of sampled partitions
is the sample of the union), rank error O(1/sqrt(sample size)) — and
still SQL-twinnable because the sample predicate is a pure function of
the row.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa

from ray.data import Dataset

from .partition import group_partitioned


def q_col_name(q: float) -> str:
    """0.25 -> 'p25', 0.99 -> 'p99', 0.999 -> 'p99_9'."""
    s = f"{q * 100:.6f}".rstrip("0").rstrip(".")
    return "p" + s.replace(".", "_")


def _disc_indices(q: float, counts: np.ndarray) -> np.ndarray:
    # DuckDB quantile_disc: element at max(0, ceil(q*n) - 1) ascending
    return np.maximum(0, np.ceil(q * counts).astype(np.int64) - 1)


def grouped_quantiles(ds: Dataset, key: str, value_col: str,
                      qs: tuple[float, ...] = (0.25, 0.5, 0.9, 0.99),
                      num_partitions: int = 16) -> Dataset:
    """One row per group: key + one column per quantile (q_col_name).
    Nulls in value_col are not supported (mirror of SQL quantile_disc
    semantics would drop them; callers filter first)."""

    def part(df: pd.DataFrame) -> pd.DataFrame:
        cols = {key: pd.Series(dtype=df[key].dtype)}
        cols.update({q_col_name(q): pd.Series(dtype="float64") for q in qs})
        if df.empty:
            return pd.DataFrame(cols)
        df = df.sort_values([key, value_col], kind="mergesort")
        keys = df[key].to_numpy()
        vals = df[value_col].to_numpy()
        uniq, starts, counts = np.unique(keys, return_index=True,
                                         return_counts=True)
        out = {key: uniq}
        for q in qs:
            out[q_col_name(q)] = vals[starts + _disc_indices(q, counts)]
        return pd.DataFrame(out)

    return group_partitioned(ds, [key], part,
                             num_partitions=num_partitions)


def hash_keep(ds: Dataset, id_col: str, keep_below: str = "4") -> Dataset:
    """Deterministic row sample: keep rows whose md5(str(id)) hex starts
    below ``keep_below`` ('4' ≈ 25%). Same rule as ops/dedup.hash_sample,
    keyed on the id column so it works for non-text tables; SQL twin:
    ``WHERE md5(CAST(id AS VARCHAR)) < '<keep_below>'``."""

    def f(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_pylist()
        mask = [hashlib.md5(str(x).encode()).hexdigest() < keep_below
                for x in ids]
        return t.filter(pa.array(mask, pa.bool_()))

    return ds.map_batches(f, batch_format="pyarrow")


def sampled_quantiles(ds: Dataset, key: str, value_col: str, id_col: str,
                      qs: tuple[float, ...] = (0.25, 0.5, 0.9, 0.99),
                      keep_below: str = "4",
                      num_partitions: int = 16) -> Dataset:
    """Exact quantiles of a deterministic ~25% hash sample — the scale
    path when single groups exceed a partition. Deterministic AND
    partition-invariant (the sample is a pure row predicate), so the
    result is reproducible and SQL-twinnable, unlike a random sample."""
    return grouped_quantiles(hash_keep(ds, id_col, keep_below), key,
                             value_col, qs, num_partitions=num_partitions)


def percentile_band_filter(ds: Dataset, key: str, value_col: str,
                           lo: float = 0.05, hi: float = 0.95,
                           num_partitions: int = 16) -> Dataset:
    """Keep only rows whose ``value_col`` lies inside the per-group
    [quantile_disc(lo), quantile_disc(hi)] band — the standard
    length-outlier cut in a training-data pipeline (drop the shortest and
    longest tail per language).

    Two passes over the (lazy) input: pass 1 computes the per-group
    bounds with :func:`grouped_quantiles` (a groups-sized result — safe
    to collect and broadcast via ``ray.put`` once), pass 2 is a pure
    vectorized map filter, NO shuffle. The filter re-reads only
    (key, value) plus whatever columns the caller kept, so the expensive
    pass streams."""
    import ray

    lo_col, hi_col = q_col_name(lo), q_col_name(hi)
    bounds = grouped_quantiles(ds.select_columns([key, value_col]), key,
                               value_col, qs=(lo, hi),
                               num_partitions=num_partitions).to_pandas()
    handle = ray.put((dict(zip(bounds[key], bounds[lo_col])),
                      dict(zip(bounds[key], bounds[hi_col]))))

    def keep(t: pa.Table) -> pa.Table:
        lo_map, hi_map = ray.get(handle)   # tiny dicts, read from store
        keys = t[key].to_pandas()
        lo_v = keys.map(lo_map).to_numpy(dtype="float64")  # C dict lookup
        hi_v = keys.map(hi_map).to_numpy(dtype="float64")
        vals = t[value_col].to_pandas().to_numpy(dtype="float64")
        return t.filter(pa.array((vals >= lo_v) & (vals <= hi_v)))

    return ds.map_batches(keep, batch_size=8192, batch_format="pyarrow")
