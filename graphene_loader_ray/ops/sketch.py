"""Mergeable sketches: HyperLogLog distinct counts and Count-Min
frequencies (SURVEY.md §2.5 "Sketches" — approximate metrics the
reference lacks; the instruction-set "novel sketch" custom-operator slot).

Both follow the only shape that works at 100 TB: each batch computes a
FIXED-SIZE partial (registers / count matrix) independently, partials
merge with a commutative, associative elementwise op (max / +), and only
sketch-sized data ever moves — never rows. Determinism: the 64-bit value
hash is pandas' stable hash (no PYTHONHASHSEED dependence), so estimates
are identical across runs and partitionings.

- ``hll_distinct``: p-bit register HLL (Flajolet et al. 2007) with the
  standard small-range (linear counting) and large-range corrections;
  std error ≈ 1.04/√(2^p) (~1.6% at p=12).
- ``CountMinSketch`` + ``count_min``: d×w counter matrix; point query =
  min over d rows; overestimates only, ε ≈ e/w with prob 1-δ, δ ≈ e^-d.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset


def _stable_hash64(values: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Stable uint64 hash of a column (pd.util.hash_pandas_object uses a
    fixed key — identical across processes and runs)."""
    s = values.to_pandas()
    return pd.util.hash_pandas_object(s, index=False).to_numpy(
        dtype=np.uint64)


def _md5_hash64(values: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """DuckDB-computable uint64 hash: first 8 md5 bytes of ``str(value)``,
    matching ``CAST(('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 16)) AS
    UBIGINT)`` for int/string columns (the simhash_sql parity recipe).
    NULLS ARE DROPPED: the output has one hash per VALID value, so it can
    be shorter than the input — callers that build row masks must realign
    via ``pc.is_valid`` (bloom_filter_absent does; the SQL twins exclude
    nulls with ``WHERE col IS NOT NULL``). Parity mode only — the default
    pandas hash is ~100x faster per value."""
    import hashlib
    return np.fromiter(
        (int.from_bytes(hashlib.md5(str(v).encode()).digest()[:8], "big")
         for v in values.to_pylist() if v is not None),
        dtype=np.uint64)


# ------------------------------------------------------------------- HLL

def _hll_partial(batch: pa.Table, col: str, p: int,
                 hash_name: str = "pandas") -> pa.Table:
    """One batch -> its 2^p register maxima, emitted sparse (register,
    rho) — at most min(batch, 2^p) rows enter the merge."""
    h = (_md5_hash64 if hash_name == "md5" else _stable_hash64)(batch[col])
    m = np.uint64(1) << np.uint64(p)
    reg = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | (np.uint64(1) << np.uint64(p - 1))
    # rho = leading zeros of the remaining bits + 1 (the injected low bit
    # caps rho at 64-p+1 and guarantees rest != 0). Pure integer bit
    # length — float64 log2 rounds values within ~2^11 of 2^64 UP to
    # exactly 2^64, mis-recording a hit register as rho=0
    bit_len = np.zeros(rest.shape, dtype=np.int64)
    v = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        big = v >= (np.uint64(1) << np.uint64(shift))
        bit_len[big] += shift
        v[big] >>= np.uint64(shift)
    rho = 65 - (bit_len + 1)        # = 64 - floor(log2(rest)), exactly
    df = pd.DataFrame({"register": reg, "rho": rho})
    best = df.groupby("register", sort=False)["rho"].max().reset_index()
    del m
    return pa.table({"register": pa.array(best["register"], pa.int64()),
                     "rho": pa.array(best["rho"], pa.int64())})


def hll_distinct(ds: Dataset, col: str, p: int = 12,
                 hash_name: str = "pandas") -> dict:
    """Approximate distinct count of ``ds[col]``.

    map_batches partials (sparse register maxima) → ONE groupby(register)
    max → driver estimate from 2^p rows. Returns
    {"estimate": float, "p": p, "registers_used": int}.

    The estimate is EXACTLY reproducible (and with hash_name="md5"
    exactly matched by the generated :func:`hll_sql` DuckDB twin): the
    register sum is the exact integer Σ 2^(64-rho) — float summation
    order can round differently between numpy and a SQL engine — and the
    log corrections go through libm's ``math.log`` (numpy's SIMD log can
    differ from libm in the last ulp)."""
    import math

    from ray.data.aggregate import Max

    partials = ds.map_batches(
        lambda t, c=col, pp=p, hn=hash_name: _hll_partial(t, c, pp, hn),
        batch_format="pyarrow", batch_size=65536)
    merged = partials.groupby("register") \
        .aggregate(Max("rho", alias_name="rho")).take_all()

    m = 1 << p
    regs = np.zeros(m, dtype=np.int64)
    for r in merged:
        regs[r["register"]] = r["rho"]
    alpha = 0.7213 / (1.0 + 1.079 / m)
    # exact integer register sum: Σ 2^(64-rho), rho=0 contributing 2^64
    s_int = sum(1 << (64 - int(r)) for r in regs)
    raw = alpha * m * m * 2.0 ** 64 / float(s_int)
    zeros = int(np.count_nonzero(regs == 0))
    if raw <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)            # linear counting
    elif raw > (1 << 64) / 30.0:
        est = -(1 << 64) * math.log1p(-raw / (1 << 64))
    else:
        est = raw
    return {"estimate": float(est), "p": p, "registers_used": m - zeros}


def hll_sql(table: str, col: str, p: int = 12) -> str:
    """Generated DuckDB twin of ``hll_distinct(..., hash_name="md5")``:
    same md5-prefix value hash, same register/rho bit arithmetic (the
    wrap-around ``h << p`` becomes mask-then-shift — DuckDB shifts error
    on overflow), the same exact-integer register sum (HUGEINT), and the
    same IEEE expression shapes so every float rounds identically. Emits
    one row ``floor(est + 0.5)`` exactly like the engine query."""
    m = 1 << p
    two64 = "(CAST(1 AS HUGEINT) << 64)"
    alpha = f"(0.7213 / (1.0 + 1.079 / {m}))"
    return f"""
        WITH h AS (
          SELECT CAST(('0x' || substr(md5(CAST({col} AS VARCHAR)), 1, 16))
                      AS UBIGINT) AS hv
          FROM {table} WHERE {col} IS NOT NULL),
        rr AS (
          -- the masked shift runs in HUGEINT: DuckDB's UBIGINT << checks
          -- overflow against 2^63, rejecting in-range uint64 results
          SELECT CAST(hv >> {64 - p} AS BIGINT) AS register,
                 CAST(65 - length(bin(CAST(
                     ((CAST(hv & ((CAST(1 AS UBIGINT) << {64 - p}) - 1)
                           AS HUGEINT) << {p})
                      | {2 ** (p - 1)}) AS UBIGINT)))
                      AS BIGINT) AS rho
          FROM h),
        regs AS (SELECT register, max(rho) AS rho FROM rr GROUP BY register),
        st AS (
          SELECT coalesce(sum(CAST(1 AS HUGEINT) << (64 - rho)),
                          CAST(0 AS HUGEINT)) AS s_present,
                 count(*) AS n_present
          FROM regs),
        fin AS (
          SELECT {alpha} * {m} * {m} * CAST({two64} AS DOUBLE)
                 / CAST(s_present + ({m} - n_present) * {two64} AS DOUBLE)
                   AS raw,
                 {m} - n_present AS zeros
          FROM st)
        SELECT CAST(floor(
                 CASE WHEN raw <= 2.5 * {m} AND zeros > 0
                      THEN {m} * ln(CAST({m} AS DOUBLE) / zeros)
                      WHEN raw > CAST({two64} AS DOUBLE) / 30.0
                      THEN -CAST({two64} AS DOUBLE)
                           * ln(1.0 - raw / CAST({two64} AS DOUBLE))
                      ELSE raw END + 0.5) AS BIGINT)
               AS approx_distinct_users
        FROM fin
    """


# -------------------------------------------------------------- Count-Min

_CMS_SEEDS = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                       0x165667B19E3779F9, 0x27D4EB2F165667C5],
                      dtype=np.uint64)


class CountMinSketch:
    """d×w counter matrix; rows index by d independent derived hashes."""

    def __init__(self, width: int = 2048, depth: int = 4):
        if depth > len(_CMS_SEEDS):          # loud under -O too
            raise ValueError(f"depth > {len(_CMS_SEEDS)} unsupported")
        self.width, self.depth = width, depth
        self.counts = np.zeros((depth, width), dtype=np.int64)

    def _indices(self, h: np.ndarray) -> np.ndarray:
        """(depth, n) column indices from one base hash per value."""
        with np.errstate(over="ignore"):
            mixed = h[None, :] * _CMS_SEEDS[:self.depth, None]
        return (mixed >> np.uint64(32)).astype(np.int64) % self.width

    def add_hashes(self, h: np.ndarray) -> None:
        idx = self._indices(h)
        for d in range(self.depth):
            np.add.at(self.counts[d], idx[d], 1)

    def merge(self, other: "CountMinSketch") -> "CountMinSketch":
        if (self.width, self.depth) != (other.width, other.depth):
            raise ValueError("merging incompatible CountMin sketches")
        self.counts += other.counts
        return self

    def query_hashes(self, h: np.ndarray) -> np.ndarray:
        idx = self._indices(h)
        return np.min(np.stack([self.counts[d][idx[d]]
                                for d in range(self.depth)]), axis=0)


def count_min(ds: Dataset, col: str, width: int = 2048,
              depth: int = 4) -> CountMinSketch:
    """Build a Count-Min sketch of ``ds[col]`` frequencies: one fixed-size
    partial per batch, elementwise-summed — sketch-sized shuffle only.
    Query with ``sketch.query_hashes(_stable_hash64(values))``."""

    def partial(batch: pa.Table) -> pa.Table:
        s = CountMinSketch(width, depth)
        s.add_hashes(_stable_hash64(batch[col]))
        return pa.table({"sketch": pa.FixedSizeListArray.from_arrays(
            pa.array(s.counts.reshape(-1), pa.int64()), width * depth)})

    out = CountMinSketch(width, depth)
    for b in ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=65536) \
               .iter_batches(batch_size=256, batch_format="pyarrow"):
        flat = np.asarray(b["sketch"].combine_chunks().flatten(),
                          dtype=np.int64).reshape(-1, depth * width)
        out.counts += flat.sum(axis=0).reshape(depth, width)
    return out


# ------------------------------------------------------------------ Bloom

class BloomFilter:
    """m-bit Bloom filter, k probes by double hashing (Kirsch-Mitzenmacker:
    pos_j = h1 + j*h2 mod m preserves the classic FP bound). Fixed-size
    uint64 words; merge = elementwise OR (commutative/associative/
    idempotent), so a filter built from partials equals one built
    sequentially. NO false negatives ever; FP rate ≈ (1-e^(-kn/m))^k."""

    def __init__(self, n_bits: int = 1 << 20, k: int = 7):
        if n_bits % 64:                      # loud under -O too
            raise ValueError("n_bits must be a multiple of 64")
        self.n_bits, self.k = n_bits, k
        self.words = np.zeros(n_bits // 64, dtype=np.uint64)

    @staticmethod
    def _mix(x: np.ndarray) -> np.ndarray:
        """splitmix64-style finalizer: every output bit depends on every
        input bit (a bare multiply leaves pos = f(low bits only) once
        reduced mod m, collapsing the FP bound)."""
        with np.errstate(over="ignore"):
            x = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
            x = (x ^ (x >> np.uint64(33))) * np.uint64(0xC4CEB9FE1A85EC53)
        return x ^ (x >> np.uint64(33))

    def _positions(self, h: np.ndarray) -> np.ndarray:
        """(k, n) bit positions from one stable uint64 hash per value."""
        with np.errstate(over="ignore"):
            h1 = self._mix(h)
            h2 = self._mix(h ^ np.uint64(0x9E3779B97F4A7C15)) | np.uint64(1)
            j = np.arange(self.k, dtype=np.uint64)[:, None]
            return ((h1[None, :] + j * h2[None, :])
                    % np.uint64(self.n_bits)).astype(np.int64)

    def add_hashes(self, h: np.ndarray) -> None:
        pos = self._positions(h).reshape(-1)
        np.bitwise_or.at(self.words, pos >> 6,
                         np.uint64(1) << (pos.astype(np.uint64)
                                          & np.uint64(63)))

    def contains_hashes(self, h: np.ndarray) -> np.ndarray:
        """bool[n]: True = possibly present, False = DEFINITELY absent."""
        if h.size == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(h)
        bit = (self.words[pos >> 6] >> (pos.astype(np.uint64)
                                        & np.uint64(63))) & np.uint64(1)
        return bit.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (self.n_bits, self.k) != (other.n_bits, other.k):
            raise ValueError("merging incompatible Bloom filters")
        self.words |= other.words
        return self

    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.words.view(np.uint8)).mean())


def bloom_build(ds: Dataset, col: str, n_bits: int = 1 << 20,
                k: int = 7, hash_name: str = "pandas") -> BloomFilter:
    """Distributed build: one fixed-size packed-bit partial per batch,
    OR-merged on the driver — filter-sized shuffle only (m/8 bytes per
    batch), never rows. The result is broadcastable via ``ray.put`` for
    shuffle-free membership tests (incremental dedup: drop documents
    already ingested by a previous run)."""

    hash_fn = _md5_hash64 if hash_name == "md5" else _stable_hash64

    def partial(batch: pa.Table) -> pa.Table:
        b = BloomFilter(n_bits, k)
        b.add_hashes(hash_fn(batch[col]))
        return pa.table({"words": pa.FixedSizeListArray.from_arrays(
            pa.array(b.words.view(np.int64), pa.int64()), n_bits // 64)})

    out = BloomFilter(n_bits, k)
    for b in ds.map_batches(partial, batch_format="pyarrow",
                            batch_size=65536) \
               .iter_batches(batch_size=256, batch_format="pyarrow"):
        flat = np.asarray(b["words"].combine_chunks().flatten(),
                          dtype=np.int64).reshape(-1, n_bits // 64)
        out.words |= np.bitwise_or.reduce(
            flat.view(np.uint64), axis=0)
    return out


def bloom_filter_absent(ds: Dataset, col: str, bloom: BloomFilter,
                        hash_name: str = "pandas") -> Dataset:
    """Keep only rows whose ``col`` is DEFINITELY not in ``bloom`` (the
    'new documents' side of an incremental-ingest dedup). One ray.put of
    the filter, a pure vectorized map per batch — no shuffle. Rows the
    filter false-positives on (≈ fpp) are dropped with the dups; no
    already-seen row ever survives. Null ``col`` rows are dropped in md5
    mode (matching the SQL twin's ``WHERE col IS NOT NULL``) — the
    _md5_hash64 output is valid-rows-only, so the mask realigns through
    ``pc.is_valid`` instead of crashing on a length mismatch."""
    import ray

    handle = ray.put(bloom)
    hash_fn = _md5_hash64 if hash_name == "md5" else _stable_hash64

    def keep_new(t: pa.Table) -> pa.Table:
        bf = ray.get(handle)           # zero-copy words array from store
        arr = t[col]
        if hash_name == "md5" and arr.null_count:
            valid = pc.is_valid(arr).combine_chunks() \
                .to_numpy(zero_copy_only=False)
            mask = np.zeros(t.num_rows, dtype=bool)
            mask[valid] = ~bf.contains_hashes(hash_fn(arr))
            return t.filter(pa.array(mask))
        return t.filter(pa.array(~bf.contains_hashes(hash_fn(arr))))

    return ds.map_batches(keep_new, batch_format="pyarrow",
                          batch_size=65536)


def _mul64_sql(expr: str, c: int) -> str:
    """SQL for ``(expr * c) mod 2^64`` (numpy's wrapping uint64 multiply):
    32-bit split so every HUGEINT intermediate stays below 2^97 — a plain
    64x64 product overflows int128 and DuckDB UBIGINT ``*`` errors."""
    return (f"CAST(((CAST({c} AS HUGEINT)"
            f" * CAST(({expr}) & 4294967295 AS HUGEINT))"
            f" + (((CAST({c} AS HUGEINT)"
            f" * CAST(({expr}) >> 32 AS HUGEINT)) % 4294967296)"
            f" * 4294967296)) % 18446744073709551616 AS UBIGINT)")


def bloom_absent_sql(table: str, col: str, id_col: str,
                     seen_pred: str, out_cols: list[str],
                     n_bits: int = 1 << 20, k: int = 7) -> str:
    """Generated DuckDB twin of ``bloom_build(hash_name="md5") +
    bloom_filter_absent``: same md5-prefix value hash, the splitmix64
    finalizer reproduced with wrap-exact split multiplies
    (:func:`_mul64_sql`), the same k double-hash probe positions
    (``(h1 + j*h2) mod 2^64 mod n_bits``), and the same keep rule — a row
    survives iff at least one of its probe bits was never set by any row
    matching ``seen_pred``. Exact INCLUDING false positives: the FP set
    is a deterministic function of the hash, so the twin reproduces it
    bit-for-bit rather than bounding it."""
    c1, c2 = 0xFF51AFD7ED558CCD, 0xC4CEB9FE1A85EC53
    golden = 0x9E3779B97F4A7C15
    m = 18446744073709551616    # staged CTEs keep the expression shallow
    return f"""
        WITH hv AS (
          SELECT {id_col} AS _id, ({seen_pred}) AS _seen,
                 CAST(('0x' || substr(md5({col}), 1, 16)) AS UBIGINT) AS h
          FROM {table} WHERE {col} IS NOT NULL),
        s1 AS (SELECT _id, _seen,
                      xor(h, h >> 33) AS a,
                      xor(xor(h, CAST({golden} AS UBIGINT)),
                          xor(h, CAST({golden} AS UBIGINT)) >> 33) AS b
               FROM hv),
        s2 AS (SELECT _id, _seen, {_mul64_sql('a', c1)} AS a,
                      {_mul64_sql('b', c1)} AS b FROM s1),
        s3 AS (SELECT _id, _seen, xor(a, a >> 33) AS a,
                      xor(b, b >> 33) AS b FROM s2),
        s4 AS (SELECT _id, _seen, {_mul64_sql('a', c2)} AS a,
                      {_mul64_sql('b', c2)} AS b FROM s3),
        hs AS (SELECT _id, _seen, xor(a, a >> 33) AS h1,
                      xor(b, b >> 33) | CAST(1 AS UBIGINT) AS h2 FROM s4),
        pos AS (
          SELECT _id, _seen,
                 CAST((CAST(h1 AS HUGEINT) + j.j * CAST(h2 AS HUGEINT))
                      % {m} % {n_bits} AS BIGINT) AS p
          FROM hs CROSS JOIN (SELECT unnest(range({k})) AS j) j),
        new_ids AS (
          SELECT DISTINCT _id FROM pos
          WHERE p NOT IN (SELECT p FROM pos WHERE _seen))
        SELECT {', '.join('d.' + c for c in out_cols)}
        FROM {table} d JOIN new_ids ON new_ids._id = d.{id_col}
    """
