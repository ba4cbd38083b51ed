"""Group-wise z-score normalization — the feature-engineering step that
standardizes a metric within each group (per event type, per language,
per domain) without ever shuffling the corpus.

Two passes:
  1. sufficient statistics, combiner-first: each batch emits one
     (group, n, Σcents, Σcents²) partial row; the partials (groups ×
     batches, bounded and tiny) reduce on the driver in PYTHON ints —
     arbitrary precision, so Σx² cannot overflow int64 at corpus scale
     and the totals are exactly the integers DuckDB's HUGEINT sums
     produce;
  2. the per-group (n, Σ, Σ²) table broadcasts via ``ray.put`` and a
     map-side pass computes z = (x − mean)/std with the IDENTICAL double
     expression the generated SQL twin uses, rounded half-up to
     ``ndigits`` — bit-identical results, no shuffle.

Assumes a 2-decimal money-style value column (the repo's integer-cents
convention, see queries._cents): cents = round(value·100) is exact, so
the sufficient statistics are order-independent integers. Rows with a
NULL group key are dropped (the SQL twin's JOIN never matches NULL).
Groups with n < 2 or zero variance get a NULL z-score.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset


def _cents(col) -> pa.Array:
    return pc.cast(pc.round(pc.multiply(col, pa.scalar(100.0))),
                   pa.int64())


def zscore_by_group(ds: Dataset, key: str, value_col: str,
                    ndigits: int = 4) -> Dataset:
    """→ input rows (NULL-key rows dropped) + ``zscore`` (float64,
    half-up rounded to ``ndigits``; NULL when the group's std is 0 or
    n < 2)."""

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t[key]))
        c = _cents(t[value_col])
        g = pa.table({key: t[key], "c": c, "c2": pc.multiply(c, c)}) \
            .group_by(key).aggregate([("c", "count"), ("c", "sum"),
                                      ("c2", "sum")])
        return pa.table({key: g[key],
                         "n": pc.cast(g["c_count"], pa.int64()),
                         "s": g["c_sum"], "q": g["c2_sum"]})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    stats: dict = {}
    for k_, n_, s_, q_ in zip(parts[key], parts["n"], parts["s"],
                              parts["q"]):
        acc = stats.setdefault(k_, [0, 0, 0])
        acc[0] += int(n_)                 # python ints: exact Σ and Σx²
        acc[1] += int(s_)
        acc[2] += int(q_)
    # per-group (mean_c, sqrt(var_c)) as the EXACT double expression of
    # the SQL twin, from the same exact integers — computed once here,
    # broadcast, applied vectorized (NaN std → NaN z → NULL)
    model = {}
    for k_, (n, s, q) in stats.items():
        if n < 2:
            model[k_] = (np.nan, np.nan)
            continue
        mean_c = float(s) / n
        var_c = (float(q) - float(s) * float(s) / n) / (n - 1)
        model[k_] = (mean_c, np.sqrt(var_c) if var_c > 0.0 else np.nan)
    model_ref = ray.put(model)
    scale = float(10 ** ndigits)

    def attach(t: pa.Table) -> pa.Table:
        m = ray.get(model_ref)
        t = t.filter(pc.is_valid(t[key]))
        kser = pd.Series(t[key].to_pylist(), dtype=object)
        mean_a = kser.map(lambda k_: m[k_][0]).to_numpy(np.float64)
        std_a = kser.map(lambda k_: m[k_][1]).to_numpy(np.float64)
        x = t[value_col].to_numpy(zero_copy_only=False)
        z = np.floor((x * 100.0 - mean_a) / std_a * scale + 0.5) / scale
        return t.append_column(
            "zscore", pa.array(z, pa.float64(), from_pandas=True))

    return ds.map_batches(attach, batch_format="pyarrow")


def zscore_by_group_sql(table: str, key: str, value_col: str,
                        columns: list[str], ndigits: int = 4) -> str:
    """DuckDB twin generated from the same expression (HUGEINT exact
    sums → identical double arithmetic → identical half-up rounding)."""
    scale = 10 ** ndigits
    cents = f"CAST(round({value_col} * 100) AS BIGINT)"
    cols = ", ".join(f"e.{c}" for c in columns)
    return f"""
        WITH s AS (
          SELECT {key}, count(*) AS n,
                 sum({cents}) AS sc,
                 sum({cents} * {cents}) AS sq
          FROM {table} WHERE {key} IS NOT NULL GROUP BY {key})
        SELECT {cols},
               CASE WHEN n < 2 OR (sq * 1.0 - (sc * 1.0) * (sc * 1.0) / n)
                         / (n - 1) <= 0.0 THEN NULL
                    ELSE floor((e.{value_col} * 100.0 - sc * 1.0 / n)
                               / sqrt((sq * 1.0 - (sc * 1.0) * (sc * 1.0)
                                       / n) / (n - 1))
                               * {scale} + 0.5) / {scale}
               END AS zscore
        FROM {table} e JOIN s USING ({key})"""
