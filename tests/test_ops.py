"""General-operator tests: dedup family, similarity search, text stats,
relational/stream ops (vs DuckDB oracles), multimodal plumbing."""

from __future__ import annotations

import os
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def doc_ds():
    """Synthetic docs with planted exact + near duplicates."""
    import ray.data as rd

    base = ("the quick brown fox jumps over the lazy dog while the rain "
            "falls gently on the quiet green meadow beside the old mill")
    near = base.replace("gently", "softly")          # high jaccard
    other = ("completely different content about distributed dataflow "
             "engines shuffling arrow record batches across worker nodes")
    rows = [
        {"doc_id": 0, "text": base},
        {"doc_id": 1, "text": base},                 # exact dup of 0
        {"doc_id": 2, "text": near},                 # near dup of 0
        {"doc_id": 3, "text": other},
        {"doc_id": 4, "text": other + " with a tail"},
        {"doc_id": 5, "text": "short unrelated text"},
    ]
    return rd.from_items(rows)


def test_exact_text_dedup(doc_ds):
    from graphene_loader_ray.ops.dedup import exact_text_dedup

    out = exact_text_dedup(doc_ds).to_pandas()
    assert len(out) == 5                      # 6 docs, one exact dup
    dup = out[out["n_dups"] == 2]
    assert len(dup) == 1 and dup["doc_id"].iloc[0] == 0   # min id kept


def test_minhash_neardup(doc_ds):
    from graphene_loader_ray.ops.dedup import minhash_dedup_pairs

    pairs = minhash_dedup_pairs(doc_ds, threshold=0.5).to_pandas()
    got = {(a, b) for a, b in zip(pairs["a"], pairs["b"])}
    assert (0, 1) in got                      # exact dup (jaccard 1.0)
    assert (0, 2) in got and (1, 2) in got    # near dup
    assert (3, 4) in got                      # containment-style near dup
    assert not any({a, b} == {0, 3} for a, b in got)
    jac = dict(zip(zip(pairs["a"], pairs["b"]), pairs["jaccard"]))
    assert jac[(0, 1)] == 1.0
    assert 0.5 <= jac[(0, 2)] < 1.0


def test_hll_distinct_accuracy_and_partition_invariance(ray_session):
    import ray.data as rd

    from graphene_loader_ray.ops.sketch import hll_distinct

    n_distinct = 5000
    ds = rd.from_items([{"v": f"user-{i % n_distinct}"}
                        for i in range(20000)])
    est = hll_distinct(ds, "v")
    assert abs(est["estimate"] - n_distinct) / n_distinct < 0.05
    # merge is commutative/associative: a different partitioning must give
    # the IDENTICAL estimate
    est2 = hll_distinct(ds.repartition(13), "v")
    assert est2["estimate"] == est["estimate"]


def test_hll_sql_twin(ray_session):
    """hll_distinct(hash_name="md5") is value-identical to the generated
    DuckDB twin in BOTH estimator branches — linear counting (few
    distinct) and the raw HLL path (distinct >> 2.5m at p=6) — including
    null skipping and string vs int key columns."""
    import duckdb
    import ray.data as rd

    from graphene_loader_ray.ops.sketch import hll_distinct, hll_sql

    con = duckdb.connect()
    # branch 1: ints with nulls, few distinct -> linear counting
    small = pa.table({"user_id": pa.array(
        [i % 97 for i in range(4000)] + [None, None], pa.int64())})
    # branch 2: many distinct strings at p=6 (m=64, 2.5m=160) -> raw path
    big = pa.table({"user_id": pa.array(
        [f"u-{i}" for i in range(3000)], pa.string())})
    for name, tbl, p in [("small", small, 12), ("big", big, 6)]:
        est = hll_distinct(rd.from_arrow(tbl), "user_id", p=p,
                           hash_name="md5")["estimate"]
        con.register(name, tbl)
        gold = con.execute(hll_sql(name, "user_id", p=p)).fetchone()[0]
        import math
        assert int(math.floor(est + 0.5)) == gold, (name, est, gold)
    assert abs(hll_distinct(rd.from_arrow(small), "user_id",
                            hash_name="md5")["estimate"] - 97) < 5


def test_bloom_sql_twin(ray_session):
    """The distributed bloom build+filter in md5-parity mode keeps the
    EXACT row set of the generated DuckDB twin — false positives
    included: both sides compute the same splitmix64 double-hash probe
    positions, so the FP set is a deterministic function of the data. A
    dense filter (tiny n_bits) forces real FPs so the equality is
    non-vacuous."""
    import duckdb
    import ray.data as rd

    from graphene_loader_ray.ops.sketch import (bloom_absent_sql,
                                                bloom_build,
                                                bloom_filter_absent)

    tbl = pa.table({
        "doc_id": pa.array(range(400), pa.int64()),
        "text": pa.array([f"document body {i}" for i in range(400)],
                         pa.string()),
        "lang": pa.array(["en"] * 400, pa.string())})
    ds = rd.from_arrow(tbl).repartition(5)
    seen = ds.filter(lambda r: r["doc_id"] % 2 == 0)
    n_bits, k = 512, 4               # dense: ~odd docs hit FPs for sure
    bloom = bloom_build(seen, "text", n_bits=n_bits, k=k,
                        hash_name="md5")
    kept = bloom_filter_absent(ds, "text", bloom, hash_name="md5") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", tbl)
    gold = con.execute(bloom_absent_sql(
        "documents", "text", "doc_id", "doc_id % 2 = 0",
        ["doc_id", "text", "lang"], n_bits=n_bits, k=k)).fetchdf() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(kept, gold)
    assert 0 < len(kept) < 200       # some FPs dropped, none kept wrongly
    assert (kept["doc_id"] % 2 == 1).all()


def test_count_min_bounds(ray_session):
    import ray.data as rd

    from graphene_loader_ray.ops.sketch import _stable_hash64, count_min

    rows = []
    truth = {}
    for i in range(400):
        c = 1000 if i == 0 else (200 if i == 1 else 3)
        truth[f"k{i}"] = c
        rows += [{"v": f"k{i}"}] * c
    ds = rd.from_items(rows)
    sk = count_min(ds, "v", width=2048, depth=4)
    keys = pa.array(list(truth), pa.string())
    got = sk.query_hashes(_stable_hash64(keys))
    exact = np.array([truth[k] for k in truth])
    assert (got >= exact).all()                  # CMS never undercounts
    n_total = sum(truth.values())
    assert (got - exact).max() <= np.e / 2048 * n_total * 4  # ε bound, slack
    assert got[0] == 1000 and got[1] == 200      # heavy keys near-exact


def test_distinct_values(ray_session):
    """A3 distinct label set as a named, tested op."""
    import ray.data as rd

    from graphene_loader_ray.ops.aggregate import distinct_values

    ds = rd.from_items([{"label": l} for l in
                        ["Gene", "Taxon", "Gene", "Pathway", "Gene"]])
    got = sorted(r["label"] for r in distinct_values(ds, "label").take_all())
    assert got == ["Gene", "Pathway", "Taxon"]


def test_distinct_to_driver(ray_session):
    """Shuffle-free distinct collection for broadcast key sets: values
    exact, Arrow-typed, and an EMPTY result keeps the column's type so
    pc.is_in needs no null-type special case."""
    import pyarrow.compute as pc
    import ray.data as rd

    from graphene_loader_ray.ops.aggregate import distinct_to_driver

    ds = rd.from_items([{"k": v} for v in [3, 1, 3, 2, 1, 3]])
    got = distinct_to_driver(ds, "k")
    assert sorted(got.to_pylist()) == [1, 2, 3]
    assert got.type == pa.int64()

    empty = ds.filter(lambda r: r["k"] > 99)
    e = distinct_to_driver(empty, "k")
    assert len(e) == 0
    # the whole point: directly consumable by an is_in mask
    mask = pc.is_in(pa.array([1, 2], pa.int64()), value_set=e)
    assert mask.to_pylist() == [False, False]


def test_minhash_truncation_reported(ray_session):
    """A degenerate bucket (identical docs beyond max_bucket) is truncated
    AND reported in the stats dict — never silent (ADVICE r1)."""
    import ray.data as rd

    from graphene_loader_ray.ops.dedup import minhash_dedup_pairs

    text = "identical boilerplate page body repeated across the whole crawl"
    ds = rd.from_items([{"doc_id": i, "text": text} for i in range(10)])
    stats: dict = {}
    pairs = minhash_dedup_pairs(ds, threshold=0.5, max_bucket=4,
                                stats_out=stats).to_pandas()
    assert stats["truncated_buckets"] > 0
    assert stats["dropped_docs"] > 0
    got = {(a, b) for a, b in zip(pairs["a"], pairs["b"])}
    assert (0, 1) in got                       # kept prefix still pairs
    assert all(a < 4 and b < 4 for a, b in got)   # only the 4 least ids


def test_embedding_bucket_cap(ray_session):
    """The embedding-LSH path has the same skew guard: a degenerate
    all-identical bucket completes in bounded time with the truncation
    reported (VERDICT r1 task 7)."""
    import ray.data as rd

    from graphene_loader_ray.ops.dedup import embedding_neardup_pairs

    v = np.ones(16)
    ds = rd.from_items([{"vec_id": i, "embedding": v.tolist()}
                        for i in range(300)])
    stats: dict = {}
    out = embedding_neardup_pairs(ds, threshold=0.9, max_bucket=50,
                                  stats_out=stats).to_pandas()
    assert stats["truncated_buckets"] == 1
    assert stats["dropped_docs"] == 250
    # pairs only among the 50 least ids: C(50,2) of them
    assert len(out) == 50 * 49 // 2
    assert out["a"].max() < 50 and out["b"].max() < 50


def test_ngram_jaccard_exact(doc_ds):
    """Inverted-index exact Jaccard: the planted exact dup scores 1.0,
    the near dup scores high, unrelated docs are absent; results equal a
    brute-force driver reference over the same shingle definition."""
    import itertools
    import re

    from graphene_loader_ray.ops.dedup import ngram_jaccard_pairs

    stats: dict = {}
    out = ngram_jaccard_pairs(doc_ds, threshold=0.1,
                              stats_out=stats).to_pandas()
    got = {(a, b): j for a, b, j in zip(out["a"], out["b"], out["jaccard"])}
    assert got[(0, 1)] == 1.0                  # exact dup
    assert got[(0, 2)] > 0.5 and got[(3, 4)] > 0.5
    assert stats == {"truncated_postings": 0, "dropped_docs": 0}

    # brute-force reference on the driver
    docs = {r["doc_id"]: r["text"] for r in doc_ds.take_all()}

    def sh(t):
        ws = re.findall(r"\w+", t.lower(), re.ASCII)
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    want = {}
    for a, b in itertools.combinations(sorted(docs), 2):
        sa, sb = sh(docs[a]), sh(docs[b])
        u = len(sa | sb)
        j = len(sa & sb) / u if u else 0.0
        if j >= 0.1:
            want[(a, b)] = round(j, 6)
    assert got == want


def test_ngram_jaccard_truncation_reported(ray_session):
    """A posting list longer than max_posting is cut AND reported —
    never silent (house rule for every skew cap)."""
    import ray.data as rd

    from graphene_loader_ray.ops.dedup import ngram_jaccard_pairs

    text = "alpha beta gamma delta shared boilerplate run"
    ds = rd.from_items([{"doc_id": i, "text": text} for i in range(10)])
    stats: dict = {}
    out = ngram_jaccard_pairs(ds, threshold=0.5, max_posting=4,
                              stats_out=stats).to_pandas()
    # 7 words -> 5 distinct shingles, each posted by all 10 docs and cut
    # to 4: EXACT totals (postings dropping the same #docs must not
    # collapse into one reported row)
    assert stats["truncated_postings"] == 5
    assert stats["dropped_docs"] == 30
    got = {(a, b) for a, b in zip(out["a"], out["b"])}
    assert (0, 1) in got                       # surviving docs still pair


def test_ngram_jaccard_hashed_equals_strings(doc_ds):
    """The hashed scale mode (uint64 shingles through the shuffle)
    produces the same verified pairs + scores as the SQL-comparable
    string mode — incl. on non-ASCII text (both tokenize with ASCII \\w)
    and sub-n docs (strict rule: <n words -> no shingles)."""
    import ray.data as rd

    from graphene_loader_ray.ops.dedup import ngram_jaccard_pairs

    extra = rd.from_items([
        {"doc_id": 100, "text": "Üñï wörds 光 the quick brown fox jumps"},
        {"doc_id": 101, "text": "Üñï wörds 光 the quick brown fox jumps"},
        {"doc_id": 102, "text": "two words"},
    ])
    ds = doc_ds.union(extra)

    def run(hashed):
        out = ngram_jaccard_pairs(ds, threshold=0.1,
                                  hashed=hashed).to_pandas()
        return {(int(a), int(b)): j for a, b, j in
                zip(out["a"], out["b"], out["jaccard"])}

    strings = run(False)
    hashed = run(True)
    assert strings == hashed
    assert (100, 101) in strings and strings[(100, 101)] == 1.0
    assert not any(102 in p for p in strings)


def test_verify_jaccard_distributed_equals_driver(doc_ds):
    """The partitioned verify (hash-partitioned pair dedup + two keyed
    equi-joins + per-partition scoring) produces EXACTLY the driver
    path's verified pairs — same (a, b) set, same rounded jaccard. This
    is the scale path that replaces the r2 driver-side shingle map
    (VERDICT r2 next-round #1)."""
    from graphene_loader_ray.ops.dedup import minhash_dedup_pairs

    def run(distributed):
        out = minhash_dedup_pairs(doc_ds, threshold=0.3,
                                  distributed=distributed).to_pandas()
        return {(int(a), int(b)): j for a, b, j in
                zip(out["a"], out["b"], out["jaccard"])}

    driver = run(False)
    dist = run(True)
    assert driver == dist
    assert driver            # the fixture actually produces verified pairs
    assert (0, 1) in driver and driver[(0, 1)] == 1.0


def test_near_dup_groups(doc_ds):
    """pairs → clusters: canonical = numeric-min doc id per component
    (distributed label propagation == driver union_find)."""
    import ray.data as rd

    from graphene_loader_ray.ops.components import union_find
    from graphene_loader_ray.ops.dedup import near_dup_groups

    pairs = [(0, 1), (1, 2), (3, 4), (10, 2)]
    ds = rd.from_items([{"a": a, "b": b} for a, b in pairs])
    got = {r["doc_id"]: r["canonical_id"]
           for r in near_dup_groups(ds).take_all()}
    want = {int(k): int(v) for k, v in
            union_find([(f"{a:020d}", f"{b:020d}")
                        for a, b in pairs]).items()}
    assert got == want
    assert got[10] == 0 and got[4] == 3
    # the distributed (label-propagation) path produces identical labels
    ds2 = rd.from_items([{"a": a, "b": b} for a, b in pairs])
    got_dist = {r["doc_id"]: r["canonical_id"]
                for r in near_dup_groups(ds2, distributed=True).take_all()}
    assert got_dist == want


def test_simhash_vectorized_equals_reference_loop():
    """The vectorized SimHash kernel (one bit-matrix op per doc over
    cached word hashes) produces BIT-IDENTICAL signatures to the naive
    per-word reference loop (the r2 implementation)."""
    import re
    from collections import Counter

    from graphene_loader_ray.ops.dedup import SimHasher, _stable64

    def ref_simhash(text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        words = re.findall(r"\w+", text.lower())
        if not words:
            return 0
        for w, c in Counter(words).items():
            bits = (_stable64(w) >> np.arange(64, dtype=np.uint64)) & 1
            acc += c * (2 * bits.astype(np.int64) - 1)
        return sum(1 << i for i in range(64) if acc[i] > 0)

    sh = SimHasher()
    for t in ["", "one", "the quick brown fox the quick",
              "Üñïçødé wörds 光合作用 test 123 123 123",
              " ".join(f"w{i % 37}" for i in range(500))]:
        assert sh.simhash(t) == ref_simhash(t), t


def test_simhash_neardup(doc_ds):
    from graphene_loader_ray.ops.dedup import simhash_neardup_pairs

    pairs = simhash_neardup_pairs(doc_ds, max_hamming=6).to_pandas()
    got = {(a, b): h for a, b, h in
           zip(pairs["a"], pairs["b"], pairs["hamming"])}
    assert got.get((0, 1)) == 0               # identical text
    assert (0, 2) in got                      # one-word change: small dist
    assert (0, 3) not in got


def test_simhash_popcount_and_banding():
    """The vectorized popcount equals int.bit_count, and the block-pair
    banding keys cover all C(B,2) combos with the full 64 bits."""
    from graphene_loader_ray.ops.dedup import _popcount64, _simhash_blocks

    rng = np.random.default_rng(5)
    xs = rng.integers(0, 2**63, size=100, dtype=np.uint64) * 2 + 1
    assert all(int(p) == int(x).bit_count()
               for p, x in zip(_popcount64(xs), xs))
    for h in (0, 1, 3, 6):
        blocks = _simhash_blocks(h)
        assert len(blocks) == h + 2
        assert sum(w for _, w in blocks) == 64
        assert blocks[0][0] == 0 and all(
            blocks[i][0] + blocks[i][1] == blocks[i + 1][0]
            for i in range(len(blocks) - 1))


def test_ann_recall_query_pinned(ray_session):
    """The driver-visible ann_recall row is deterministic and at least
    the recall measured when it was added (VERDICT r3 #8) — a regression
    floor for the LSH/IVF scale paths on the standard test embeddings."""
    import os

    import pytest

    from graphene_loader_ray.pipelines.queries import QUERIES

    sf = "/root/testdata/sf0.01"
    if not os.path.isdir(sf):
        pytest.skip("driver testdata not present")
    got = {r["method"]: r["recall"]
           for r in QUERIES["ann_recall"](sf).to_pylist()}
    assert got["lsh"] >= 0.2
    assert got["ivf"] >= 0.52


def test_winnow_fingerprint_sql_twin():
    """The generated DuckDB winnowing twin is byte-exact vs the engine
    kernel across empty/null/short/long/unicode texts (VERDICT r3 #7)."""
    import duckdb

    from graphene_loader_ray.ops.textstats import (QualityScorer,
                                                   winnow_fingerprint_sql)

    texts = ["", None, "a", "ab", "abcdefg", "abcdefgh", "abcdefghi",
             "the quick brown fox jumps over the lazy dog",
             "á光𝄞 mixed ünïcode text with runs runs runs runs",
             "x" * 300, " ".join(f"w{i % 13}" for i in range(200))]
    qs = QualityScorer()
    eng = [(i, *qs._fingerprint(t or "")) for i, t in enumerate(texts)]
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    con = duckdb.connect()
    con.register("documents", tbl)
    got = sorted(con.execute(winnow_fingerprint_sql("documents"))
                 .fetchall())
    assert got == eng


def test_keep_first_per_key_paths(ray_session):
    """keep_first_per_key keeps exactly the min-order row per duplicated
    key and all single-row keys, identically on the broadcast path and
    the keyed-join fallback, for int and string key/order columns."""
    import ray.data as rd

    from graphene_loader_ray.ops.dedup import keep_first_per_key

    rows = [{"k": 1, "o": "b", "v": 10}, {"k": 1, "o": "a", "v": 11},
            {"k": 2, "o": "z", "v": 12},
            {"k": 3, "o": "m", "v": 13}, {"k": 3, "o": "n", "v": 14},
            {"k": 3, "o": "l", "v": 15}]
    want = {(1, "a"), (2, "z"), (3, "l")}
    for bmax in (2_000_000, 0):            # broadcast vs join fallback
        out = keep_first_per_key(rd.from_items(rows), "k", "o",
                                 broadcast_max=bmax).to_pandas()
        assert {(int(k), o) for k, o in zip(out["k"], out["o"])} == want
        assert len(out) == 3

    # string key, int order (the curate exact-text shape)
    rows2 = [{"h": "x", "doc_id": 7}, {"h": "x", "doc_id": 3},
             {"h": "y", "doc_id": 9}]
    for bmax in (2_000_000, 0):
        out = keep_first_per_key(rd.from_items(rows2), "h", "doc_id",
                                 broadcast_max=bmax).to_pandas()
        assert {(h, int(d)) for h, d in zip(out["h"], out["doc_id"])} \
            == {("x", 3), ("y", 9)}


def test_simhash_truncation_reported(ray_session):
    """A degenerate bucket (identical docs beyond max_bucket) is truncated
    AND reported in the stats dict — never silent (VERDICT r3 #1: same
    contract as the minhash sibling)."""
    import ray.data as rd

    from graphene_loader_ray.ops.dedup import simhash_neardup_pairs

    text = "identical boilerplate page body repeated across the whole crawl"
    ds = rd.from_items([{"doc_id": i, "text": text} for i in range(10)])
    stats: dict = {}
    pairs = simhash_neardup_pairs(ds, max_hamming=3, max_bucket=4,
                                  stats_out=stats).to_pandas()
    assert stats["truncated_buckets"] > 0
    assert stats["dropped_docs"] > 0
    got = {(a, b) for a, b in zip(pairs["a"], pairs["b"])}
    assert (0, 1) in got                       # kept prefix still pairs
    assert all(a < 4 and b < 4 for a, b in got)   # only the 4 least ids


def test_simhash_sql_twin(ray_session):
    """SimHasher(sql_parity=True) is bit-identical to the generated
    DuckDB twin (md5-prefix word hashes, ASCII \\w tokens) on real docs
    plus planted edge cases: empty text, tokenless punctuation, repeated
    words, case folding, underscores/digits, and unicode words that the
    ASCII tokenizer drops on BOTH sides."""
    import duckdb
    import pyarrow.parquet as pq

    from graphene_loader_ray.ops.dedup import SimHasher, simhash_sql

    real = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    planted = pa.table({
        "doc_id": pa.array([9001, 9002, 9003, 9004, 9005], pa.int64()),
        "text": pa.array(["", "?! ... --", "the the THE tHe",
                          "under_score 123 a1_b2 0007",
                          "Üñïçødé wörds 光合作用 plain words"],
                         pa.string())})
    docs = pa.concat_tables([real, planted])
    sh = SimHasher(sql_parity=True)
    eng = {d: format(sh.simhash(x or ""), "016x")
           for d, x in zip(docs["doc_id"].to_pylist(),
                           docs["text"].to_pylist())}
    con = duckdb.connect()
    con.register("documents", docs)
    gold = dict(con.execute(simhash_sql("documents")).fetchall())
    assert eng == gold
    # parity mode leaves the production (blake2b) signatures alone
    assert SimHasher().simhash("the quick fox") != \
        sh.simhash("the quick fox")


def test_minhash_sql_twin(ray_session):
    """MinHasher(sql_parity=True) signatures are bit-identical to the
    generated DuckDB twin on real docs plus planted edge cases: empty
    text (all-ones signature), tokenless punctuation, one- and two-word
    docs (shorter-than-n shingle fallback), repeated words (DISTINCT ≙
    np.unique), and unicode the ASCII tokenizer drops on both sides."""
    import duckdb
    import pyarrow.parquet as pq

    from graphene_loader_ray.ops.dedup import (MinHasher, MinHashRows,
                                               minhash_sql)

    real = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])
    planted = pa.table({
        "doc_id": pa.array([9001, 9002, 9003, 9004, 9005, 9006],
                           pa.int64()),
        "text": pa.array(["", "?! ... --", "single", "one two",
                          "the the THE tHe", "Üñïçødé wörds 光 plain"],
                         pa.string())})
    docs = pa.concat_tables([real, planted])
    eng_t = MinHashRows(k=16, sql_parity=True)(docs)
    eng = {(d, i): h for d, i, h in zip(eng_t["doc_id"].to_pylist(),
                                        eng_t["h_ix"].to_pylist(),
                                        eng_t["minhash"].to_pylist())}
    con = duckdb.connect()
    con.register("documents", docs)
    gold = {(d, i): h for d, i, h in
            con.execute(minhash_sql("documents", k=16)).fetchall()}
    assert eng == gold and len(eng) == docs.num_rows * 16
    # empty doc -> all-ones signature on both sides
    assert eng[(9001, 0)] == "f" * 16
    # parity mode leaves the production (blake2b) signatures alone
    assert MinHasher(k=16, sql_parity=True).signature("a b c d")[0] != \
        MinHasher(k=16).signature("a b c d")[0]


def test_embedding_neardup(ray_session):
    import ray.data as rd

    from graphene_loader_ray.ops.dedup import embedding_neardup_pairs

    rng = np.random.default_rng(11)
    base = rng.standard_normal((20, 32))
    vecs = list(base)
    vecs.append(base[0] + 0.01 * rng.standard_normal(32))   # near-dup of 0
    vecs.append(base[5])                                     # exact dup of 5
    ds = rd.from_items([{"vec_id": i, "embedding": v.tolist()}
                        for i, v in enumerate(vecs)])
    out = embedding_neardup_pairs(ds, threshold=0.98).to_pandas()
    got = {(int(a), int(b)) for a, b in zip(out["a"], out["b"])}
    assert (0, 20) in got and (5, 21) in got
    assert all(a in (0, 5) and b in (20, 21) for a, b in got)


def test_embedding_neardup_exact(ray_session):
    """Exact all-pairs cosine: equals a numpy brute-force reference, and
    the LSH path's pairs are a subset with identical rounded cosines
    (the recall-audit relationship the docstring promises)."""
    import itertools

    import ray.data as rd

    from graphene_loader_ray.ops.dedup import (embedding_neardup_exact,
                                               embedding_neardup_pairs)

    rng = np.random.default_rng(11)
    base = rng.standard_normal((20, 32))
    vecs = list(base)
    vecs.append(base[0] + 0.01 * rng.standard_normal(32))   # near-dup of 0
    vecs.append(base[5])                                     # exact dup of 5
    ds = rd.from_items([{"vec_id": i, "embedding": v.tolist()}
                        for i, v in enumerate(vecs)])
    out = embedding_neardup_exact(ds, threshold=0.3,
                                  batch_size=7).to_pandas()
    got = {(int(a), int(b)): c
           for a, b, c in zip(out["a"], out["b"], out["cosine"])}

    m = np.asarray(vecs)
    unit = m / np.linalg.norm(m, axis=1, keepdims=True)
    sims = np.round(unit @ unit.T, 6)
    want = {(i, j): sims[i, j]
            for i, j in itertools.combinations(range(len(vecs)), 2)
            if sims[i, j] >= 0.3}
    assert got == want
    assert got[(5, 21)] == 1.0 and got[(0, 20)] > 0.99

    lsh = embedding_neardup_pairs(ds, threshold=0.3).to_pandas()
    lsh_pairs = {(int(a), int(b)): c
                 for a, b, c in zip(lsh["a"], lsh["b"], lsh["cosine"])}
    assert set(lsh_pairs) <= set(got)
    assert all(got[p] == c for p, c in lsh_pairs.items())


def test_knn_brute_matches_numpy(ray_session):
    import ray.data as rd

    from graphene_loader_ray.ops.similarity import knn_brute

    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((200, 16))
    ds = rd.from_items([{"vec_id": i, "embedding": vecs[i].tolist()}
                        for i in range(200)])
    queries = {0: vecs[0].tolist(), 7: vecs[7].tolist()}
    out = knn_brute(ds, queries, k=5).to_pandas()

    unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    for qid in queries:
        sims = unit @ unit[qid]
        order = sorted(range(200), key=lambda i: (-round(sims[i], 6), i))[:5]
        got = out[out["query_id"] == qid].sort_values(
            ["score", "vec_id"], ascending=[False, True])["vec_id"].tolist()
        assert got == order


def test_knn_lsh_recall(ray_session):
    import ray.data as rd

    from graphene_loader_ray.ops.similarity import knn_brute, knn_lsh

    # clustered vectors — the regime ANN is for (uniform random vectors
    # have no meaningful neighbors and defeat any LSH)
    rng = np.random.default_rng(4)
    centers = rng.standard_normal((10, 16)) * 3
    vecs = np.concatenate([c + 0.3 * rng.standard_normal((30, 16))
                           for c in centers])
    ds = rd.from_items([{"vec_id": i, "embedding": vecs[i].tolist()}
                        for i in range(len(vecs))])
    queries = {0: vecs[0].tolist(), 40: vecs[40].tolist(),
               80: vecs[80].tolist()}
    brute = knn_brute(ds, queries, k=10).to_pandas()
    approx = knn_lsh(ds, queries, k=10, n_planes=6).to_pandas()
    recalls = []
    for qid in queries:
        b = set(brute[brute["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        recalls.append(len(a & b) / len(b))
    assert sum(recalls) / len(recalls) >= 0.6   # approximate, but useful


def test_knn_ivf_recall(ray_session):
    import ray.data as rd

    from graphene_loader_ray.ops.similarity import knn_brute, knn_ivf

    rng = np.random.default_rng(9)
    centers = rng.standard_normal((8, 16)) * 3
    vecs = np.concatenate([c + 0.3 * rng.standard_normal((40, 16))
                           for c in centers])
    ds = rd.from_items([{"vec_id": i, "embedding": vecs[i].tolist()}
                        for i in range(len(vecs))])
    queries = {0: vecs[0].tolist(), 100: vecs[100].tolist(),
               200: vecs[200].tolist()}
    brute = knn_brute(ds, queries, k=10).to_pandas()
    approx = knn_ivf(ds, queries, k=10, n_cells=8, n_probe=2).to_pandas()
    recalls = []
    for qid in queries:
        b = set(brute[brute["query_id"] == qid]["vec_id"])
        a = set(approx[approx["query_id"] == qid]["vec_id"])
        recalls.append(len(a & b) / len(b))
    assert sum(recalls) / len(recalls) >= 0.8   # clustered data, 2 probes
    # full-probe degenerates to brute force
    full = knn_ivf(ds, queries, k=10, n_cells=8, n_probe=8).to_pandas()
    for qid in queries:
        b = set(brute[brute["query_id"] == qid]["vec_id"])
        f = set(full[full["query_id"] == qid]["vec_id"])
        assert f == b


def test_text_stats_vs_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from graphene_loader_ray.ops.textstats import STOPWORDS, token_stats

    sf = "/root/testdata/sf0.001"
    out = token_stats(rd.read_parquet(f"{sf}/documents.parquet",
                                      columns=["doc_id", "text"])) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    stop_sql = ", ".join(f"'{w}'" for w in sorted(STOPWORDS["en"]))
    gold = duckdb.sql(f"""
        SELECT doc_id, length(text) AS n_chars,
               len(regexp_extract_all(text, '\\w+|[^\\w\\s]')) AS n_tokens,
               len(regexp_extract_all(text, '\\w+')) AS n_words,
               len(list_filter(regexp_extract_all(lower(text), '\\w+'),
                               w -> w IN ({stop_sql}))) AS n_stop,
               len(list_filter(regexp_extract_all(text,
                   '''s|''t|''re|''ve|''m|''ll|''d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\\s]+|\\s+'),
                   t -> NOT regexp_matches(t, '^\\s+$'))) AS n_bpe_tokens
        FROM '{sf}/documents.parquet' ORDER BY doc_id
    """).fetchdf()
    pd.testing.assert_frame_equal(out, gold, check_dtype=False)


def test_repetition_vs_duckdb(ray_session):
    """RepetitionScorer (hashed n-grams) equals the string-exact DuckDB
    computation on real docs + planted degenerate cases."""
    import duckdb
    import ray.data as rd

    from graphene_loader_ray.ops.textstats import repetition_stats
    from graphene_loader_ray.pipelines.queries import ORACLE_SQL

    sf = "/root/testdata/sf0.001"
    extra = pa.table({
        "doc_id": pa.array([90001, 90002, 90003, 90004], pa.int64()),
        "text": pa.array(["", "word", "spam spam spam spam",
                          "a b a b a b c"], pa.string())})
    docs = rd.read_parquet(f"{sf}/documents.parquet",
                           columns=["doc_id", "text"]) \
        .union(rd.from_arrow(extra))
    out = repetition_stats(docs).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"""CREATE VIEW documents AS
        SELECT doc_id, text FROM '{sf}/documents.parquet'
        UNION ALL SELECT * FROM extra""")
    gold = con.execute(ORACLE_SQL["text_repetition"]
                       + " ORDER BY 1").fetchdf()
    pd.testing.assert_frame_equal(out, gold, check_exact=True)
    # the planted all-same doc is maximally repetitious
    spam = out[out["doc_id"] == 90003].iloc[0]
    assert spam["dup_word_frac"] == 0.75 and spam["top_bigram_frac"] == 1.0


def test_term_frequencies_topk_cut(ray_session):
    """term_frequencies equals the SQL twin when the LIMIT actually cuts
    through a tie plateau (the deterministic (n DESC, term) order is what
    makes the cut reproducible)."""
    import duckdb
    import ray.data as rd

    from graphene_loader_ray.ops.textstats import term_frequencies

    # 80 distinct terms: t00..t39 appear twice, u40..u79 once → k=50 cuts
    # 10 deep into the tied singletons
    texts = [" ".join(f"t{i:02d}" for i in range(40))] * 2 \
        + [" ".join(f"u{i}" for i in range(40, 80))]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = term_frequencies(rd.from_arrow(t), k=50).to_pandas() \
        .reset_index(drop=True)
    con = duckdb.connect()
    con.register("documents", t)
    gold = con.execute("""
        WITH w AS (SELECT unnest(regexp_extract_all(lower(text), '\\w+'))
                   AS term FROM documents)
        SELECT term, CAST(count(*) AS BIGINT) AS n
        FROM w GROUP BY term ORDER BY n DESC, term LIMIT 50""").fetchdf()
    pd.testing.assert_frame_equal(out, gold, check_exact=True)
    assert len(out) == 50 and out["n"].iloc[0] == 2 and out["n"].iloc[-1] == 1


def test_grouped_quantiles_vs_duckdb(ray_session):
    """grouped_quantiles picks the exact same elements as DuckDB
    quantile_disc on adversarial data: skewed group sizes (incl. n=1/2),
    heavy ties, negative values."""
    import duckdb
    import ray.data as rd

    rng = np.random.default_rng(11)
    sizes = {"a": 1, "b": 2, "c": 7, "d": 100, "e": 997}
    keys, vals = [], []
    for k, n in sizes.items():
        keys += [k] * n
        v = rng.integers(-50, 50, n).astype("float64")
        v[: n // 3] = 7.0                         # heavy ties
        vals += v.tolist()
    t = pa.table({"k": pa.array(keys), "v": pa.array(vals, pa.float64())})

    from graphene_loader_ray.ops.quantile import grouped_quantiles
    qs = (0.0, 0.25, 0.5, 0.9, 0.99, 1.0)
    out = grouped_quantiles(rd.from_arrow(t), "k", "v", qs=qs,
                            num_partitions=4).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t)
    gold = con.execute("""
        SELECT k, quantile_disc(v, 0.0) AS p0, quantile_disc(v, 0.25) AS p25,
               quantile_disc(v, 0.5) AS p50, quantile_disc(v, 0.9) AS p90,
               quantile_disc(v, 0.99) AS p99, quantile_disc(v, 1.0) AS p100
        FROM t GROUP BY k ORDER BY k""").fetchdf()
    pd.testing.assert_frame_equal(out, gold, check_exact=True)


def test_sampled_quantiles_accuracy(ray_session):
    """The deterministic-hash-sample quantile path lands close to the
    exact quantile in rank terms (the 100-TB fallback when one group
    exceeds a partition)."""
    import ray.data as rd

    from graphene_loader_ray.ops.quantile import (grouped_quantiles,
                                                  sampled_quantiles)

    rng = np.random.default_rng(5)
    n = 20000
    t = pa.table({
        "rid": pa.array(range(n), pa.int64()),
        "k": pa.array(["g"] * n),
        "v": pa.array(rng.exponential(10.0, n), pa.float64())})
    ds = rd.from_arrow(t)
    exact = grouped_quantiles(ds, "k", "v", qs=(0.5, 0.9)).to_pandas()
    approx = sampled_quantiles(ds, "k", "v", id_col="rid",
                               qs=(0.5, 0.9)).to_pandas()
    v = np.sort(t["v"].to_numpy())
    for col in ("p50", "p90"):
        rank_exact = np.searchsorted(v, exact[col].iloc[0]) / n
        rank_approx = np.searchsorted(v, approx[col].iloc[0]) / n
        assert abs(rank_exact - rank_approx) < 0.02   # ~5k-row sample


def test_scrub_rules(ray_session):
    """Each scrub rule fires on a literal fixture; the cascade order holds
    (an email's digits never reach the number rule); engine output equals
    the generated DuckDB twin byte-for-byte."""
    import duckdb
    import ray.data as rd

    from graphene_loader_ray.ops.scrub import scrub, scrub_sql

    rows = pa.table({
        "rid": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "txt": pa.array([
            "contact alice.smith+spam@example.co.uk or bob@x.io today",
            "server 10.0.255.3 and 192.168.1.1 rebooted",
            "call +1 (415) 555-0133 now",
            "order 12345 qty 7",
            "no sensitive content here"], pa.string())})
    out = scrub(rd.from_arrow(rows), "txt", "rid").to_pandas() \
        .set_index("rid").sort_index()
    assert out.loc[1, "n_email"] == 2
    assert out.loc[1, "redacted"] == "contact <EMAIL> or <EMAIL> today"
    assert out.loc[2, "n_ip"] == 2 and "<IP>" in out.loc[2, "redacted"]
    assert out.loc[3, "n_phone"] == 1
    assert out.loc[3, "redacted"] == "call <PHONE> now"
    assert out.loc[4, "n_number"] == 2
    assert out.loc[4, "redacted"] == "order <NUM> qty <NUM>"
    assert out.loc[5, "redacted"] == "no sensitive content here"
    con = duckdb.connect()
    con.register("fixture", rows)
    gold = con.execute(scrub_sql("fixture", "txt", "rid")
                       + " ORDER BY rid").fetchdf().set_index("rid")
    pd.testing.assert_frame_equal(out, gold, check_exact=True)


def test_decontamination_planted(ray_session):
    """flag_contamination: a doc quoting ≥n consecutive benchmark words is
    flagged, unrelated/short docs are not; n_hit counts distinct shared
    n-grams."""
    import ray.data as rd

    from graphene_loader_ray.ops.decontam import (benchmark_ngram_set,
                                                  flag_contamination)

    bench = rd.from_items([
        {"doc_id": 0, "text": "the capital of france is paris indeed"}])
    corpus = rd.from_items([
        {"doc_id": 1, "text": "quiz says the capital of france is paris"},
        {"doc_id": 2, "text": "unrelated words about arrow record batches"},
        {"doc_id": 3, "text": "capital of"},                 # < n words
        {"doc_id": 4, "text": "france is paris indeed today"}])
    out = flag_contamination(corpus, benchmark_ngram_set(bench, n=3), n=3) \
        .to_pandas().set_index("doc_id").sort_index()
    assert bool(out.loc[1, "contaminated"]) is True
    # "the capital of france is paris" shares 4 of the bench trigrams
    assert out.loc[1, "n_hit"] == 4
    assert bool(out.loc[2, "contaminated"]) is False
    assert bool(out.loc[3, "contaminated"]) is False and out.loc[3, "n_hit"] == 0
    assert out.loc[4, "n_hit"] == 2   # "france is paris", "is paris indeed"


def test_decontamination_vs_duckdb(ray_session):
    """Engine (hashed trigrams, broadcast scan) equals the string-exact
    SQL twin on the sf0.001 documents."""
    import duckdb

    from graphene_loader_ray.pipelines.queries import (ORACLE_SQL,
                                                       decontaminate_docs)

    sf = "/root/testdata/sf0.001"
    out = decontaminate_docs(sf).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf}/documents.parquet'")
    gold = con.execute(ORACLE_SQL["decontaminate_docs"]
                       + " ORDER BY 1").fetchdf()
    pd.testing.assert_frame_equal(out, gold, check_exact=True)
    assert out["contaminated"].any()          # non-degenerate fixture


def test_quality_and_langid(doc_ds):
    from graphene_loader_ray.ops.textstats import quality

    out = quality(doc_ds).to_pandas()
    assert (out["quality"] > 0).all() and (out["quality"] <= 1).all()
    guesses = dict(zip(out["doc_id"], out["lang_guess"]))
    assert guesses[0] == guesses[1] == guesses[2] == "en"  # stopword-bearing
    assert guesses[5] == "und"                 # no function words → unknown
    assert out["fingerprint"].notna().all()
    # fingerprints deterministic: identical docs share them
    by_id = dict(zip(out["doc_id"], out["fingerprint"]))
    assert by_id[0] == by_id[1]


def test_langid_per_language(ray_session):
    import ray.data as rd

    from graphene_loader_ray.ops.textstats import quality

    rows = [
        {"doc_id": 0, "text": "the cat sat on the mat and it was warm"},
        {"doc_id": 1, "text": "el perro corre por la calle y es muy rápido"},
        {"doc_id": 2, "text": "der Hund läuft und die Katze ist im Haus"},
        {"doc_id": 3, "text": "le chat est dans la maison et les chiens"},
        {"doc_id": 4, "text": "光合作用 是 植物 的 过程"},
    ]
    out = quality(rd.from_items(rows)).to_pandas()
    got = dict(zip(out["doc_id"], out["lang_guess"]))
    assert got == {0: "en", 1: "es", 2: "de", 3: "fr", 4: "zh"}


def test_sessionize_vs_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from graphene_loader_ray.ops.relational import sessionize

    sf = "/root/testdata/sf0.001"
    ev = rd.read_parquet(f"{sf}/events.parquet",
                         columns=["user_id", "ts", "event_id"])
    out = sessionize(ev, "user_id", "ts", 1800, order_cols=["event_id"]) \
        .to_pandas().sort_values("user_id").reset_index(drop=True)
    gold = duckdb.sql(f"""
        WITH e AS (
          SELECT user_id, ts,
                 lag(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_ts
          FROM '{sf}/events.parquet')
        SELECT user_id, count(*) AS n_events,
               sum(CASE WHEN prev_ts IS NULL
                        OR epoch(ts) - epoch(prev_ts) > 1800
                        THEN 1 ELSE 0 END) AS n_sessions
        FROM e GROUP BY user_id ORDER BY user_id
    """).fetchdf()
    pd.testing.assert_frame_equal(out, gold, check_dtype=False)


def test_asof_join_vs_duckdb(ray_session):
    import duckdb
    import ray.data as rd

    from graphene_loader_ray.pipelines.queries import purchase_asof_click

    sf = "/root/testdata/sf0.001"
    out = purchase_asof_click(sf).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    gold = duckdb.sql(f"""
        SELECT p.event_id, p.user_id, c.value AS click_value
        FROM (SELECT * FROM '{sf}/events.parquet'
              WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM '{sf}/events.parquet'
                        WHERE event_type = 'click') c
          ON p.user_id = c.user_id AND c.ts <= p.ts
        ORDER BY p.event_id
    """).fetchdf()
    pd.testing.assert_frame_equal(out, gold, check_dtype=False)


def test_image_header_parser():
    """Dims derive from ACTUAL payload structure (PNG IHDR, JPEG SOFn
    marker scan, GIF screen descriptor); corrupt/truncated payloads are
    rejected, not mis-parsed."""
    from graphene_loader_ray.sources.synth import (_gif_bytes, _jpeg_bytes,
                                                   _png_bytes)
    from graphene_loader_ray.stages.multimodal import parse_image_header

    assert parse_image_header(_png_bytes(120, 45, 1)) == ("png", 120, 45)
    assert parse_image_header(_jpeg_bytes(640, 480)) == ("jpeg", 640, 480)
    assert parse_image_header(_gif_bytes(31, 7)) == ("gif", 31, 7)
    # PIL/file(1) agree: dims live exactly where we read them — verify the
    # PNG round-trips through an independent decoder when available
    try:
        import io

        import PIL.Image
        img = PIL.Image.open(io.BytesIO(_png_bytes(120, 45, 1)))
        assert img.size == (120, 45)
    except ImportError:
        pass
    assert parse_image_header(b"") is None
    assert parse_image_header(_png_bytes(9, 9, 0)[:5]) is None   # truncated
    assert parse_image_header(b"\x89PNGnope" + b"\x00" * 32) is None
    assert parse_image_header(b"\xff\xd8\xff\xd9") is None       # no SOF
    assert parse_image_header(b"plain text payload") is None


def test_multimodal_decode_pipeline(smoke_fixture_dir):
    import ray.data as rd

    from graphene_loader_ray.stages.multimodal import (FEATURE_DIM,
                                                       HIST_BINS,
                                                       extract_features)

    images = rd.read_parquet(smoke_fixture_dir + "/images.parquet")
    kinds = dict(zip(
        images.to_pandas()["url"], images.to_pandas()["kind"]))
    out = extract_features(
        images.select_columns(["url", "payload"])).to_pandas()
    assert len(out) == len(kinds)
    for _, row in out.iterrows():
        kind = kinds[row["url"]]
        if kind == "corrupt":
            assert not row["ok"] and row["width"] == 0
            assert row["feature_kind"] is None
            assert not any(row["feature"])
        else:
            assert row["ok"] and row["format"] == kind
            assert row["width"] > 0 and row["height"] > 0
            # real kernels: PNGs decode to pixels, JPEG/GIF (header-only
            # fixtures, and no entropy codec here) fall back to bytes
            assert row["feature_kind"] == \
                ("pixels" if kind == "png" else "bytes")
            assert any(row["feature"])            # real nonzero statistics
            # bins are individually rounded to 6 dp → sum drifts ≤ 16·5e-7
            assert abs(sum(row["luma_hist"]) - 1.0) < 1e-5
    assert (~out["ok"]).sum() >= 1               # quarantine path exercised
    assert all(len(f) == FEATURE_DIM for f in out["feature"])
    assert all(len(h) == HIST_BINS for h in out["luma_hist"])
    # deterministic re-run
    out2 = extract_features(
        images.select_columns(["url", "payload"])).to_pandas()
    a = out.sort_values("url").reset_index(drop=True)
    b = out2.sort_values("url").reset_index(drop=True)
    assert (a["payload_sha256"].fillna("") == b["payload_sha256"].fillna("")).all()
    assert a["feature"].map(tuple).equals(b["feature"].map(tuple))


def _encode_png(px, ctype: int, filters, plte: bytes | None = None) -> bytes:
    """Independent PNG encoder for decode tests: applies the REQUESTED
    filter type per scanline (the test's own implementation of PNG spec
    §9 filtering, written forward — decode must invert it)."""
    import struct as st
    import zlib

    h, w, c = px.shape
    def chunk(tag, data):
        return (st.pack(">I", len(data)) + tag + data
                + st.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))
    flat = px.astype(np.int64)
    raw = bytearray()
    prev = np.zeros((w, c), np.int64)
    for r in range(h):
        f = filters[r % len(filters)]
        row = flat[r]
        if f == 0:
            enc = row
        elif f == 1:
            left = np.vstack([np.zeros((1, c), np.int64), row[:-1]])
            enc = (row - left) % 256
        elif f == 2:
            enc = (row - prev) % 256
        elif f == 3:
            left = np.vstack([np.zeros((1, c), np.int64), row[:-1]])
            enc = (row - (left + prev) // 2) % 256
        else:                                     # Paeth
            enc = np.empty((w, c), np.int64)
            for x in range(w):
                for ch in range(c):
                    a = row[x - 1, ch] if x else 0
                    b = prev[x, ch]
                    cc = prev[x - 1, ch] if x else 0
                    p = a + b - cc
                    pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa_ <= pb and pa_ <= pc_) else \
                        (b if pb <= pc_ else cc)
                    enc[x, ch] = (row[x, ch] - pred) % 256
        raw.append(f)
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = row
    ihdr = st.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    body = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if plte is not None:
        body += chunk(b"PLTE", plte)
    return body + chunk(b"IDAT", zlib.compress(bytes(raw))) \
        + chunk(b"IEND", b"")


def test_png_pixel_decode_all_filters():
    """decode_png_pixels inverts every scanline filter type (0-4) and
    every 8-bit color type (gray, RGB, palette, gray+alpha, RGBA),
    byte-exactly, against an independent forward encoder; broken /
    unsupported payloads return None instead of garbage."""
    from graphene_loader_ray.stages.multimodal import decode_png_pixels

    rng = np.random.default_rng(42)
    for ctype, c in ((0, 1), (2, 3), (4, 2), (6, 4)):
        px = rng.integers(0, 256, (11, 7, c), dtype=np.uint8)
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            got = decode_png_pixels(_encode_png(px, ctype, filters))
            assert got is not None and np.array_equal(got, px), \
                (ctype, filters)
    # palette: indices decode THROUGH the PLTE lookup to RGB
    idx = rng.integers(0, 4, (5, 6, 1), dtype=np.uint8)
    plte = bytes(rng.integers(0, 256, 12, dtype=np.uint8))
    pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
    got = decode_png_pixels(_encode_png(idx, 3, [0, 2], plte=plte))
    assert np.array_equal(got, pal[idx[:, :, 0]])
    # rejects: truncated, bad filter byte, 16-bit depth, interlace
    ok = _encode_png(px, 6, [0])
    assert decode_png_pixels(ok[:40]) is None
    assert decode_png_pixels(b"notapng") is None
    deep = bytearray(ok)
    deep[24] = 16                                 # bit depth byte in IHDR
    assert decode_png_pixels(bytes(deep)) is None
    inter = bytearray(ok)
    inter[28] = 1                                 # interlace byte in IHDR
    assert decode_png_pixels(bytes(inter)) is None


def test_png_deflate_bomb_quarantined():
    """A crafted payload whose IHDR promises huge dimensions with a tiny
    deflate-bomb IDAT must quarantine (None) with BOUNDED memory — the
    per-record policy means no corrupt/hostile payload may OOM the
    feature actor. Also: trailing-garbage and short streams reject."""
    import struct as st
    import zlib

    from graphene_loader_ray.stages.multimodal import decode_png_pixels

    def chunk(tag, data):
        return (st.pack(">I", len(data)) + tag + data
                + st.pack(">I", zlib.crc32(tag + data)))

    # 65535 x 65535 RGBA -> promises ~17 GB of raw scanlines; the bomb
    # itself is ~1 MB of compressed zeros. Bounded inflate must bail at
    # the 64 MB dims cap / expected-size cap, never allocate the 17 GB.
    ihdr = st.pack(">IIBBBBB", 65535, 65535, 8, 6, 0, 0, 0)
    bomb = zlib.compress(b"\x00" * (1 << 26), 9)   # 64 MiB zeros -> ~64 KB
    payload = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", bomb) + chunk(b"IEND", b""))
    assert decode_png_pixels(payload) is None

    # stream longer than the header promises (1x1 gray wants 2 bytes)
    ihdr1 = st.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0)
    overlong = zlib.compress(b"\x00" * 100)
    p2 = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr1)
          + chunk(b"IDAT", overlong) + chunk(b"IEND", b""))
    assert decode_png_pixels(p2) is None
    # exact-size stream still decodes
    exact = zlib.compress(b"\x00\x07")
    p3 = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr1)
          + chunk(b"IDAT", exact) + chunk(b"IEND", b""))
    px = decode_png_pixels(p3)
    assert px is not None and px.shape == (1, 1, 1) and px[0, 0, 0] == 7


def test_image_features_pinned():
    """Feature values over the synth fixture PNG equal an independent
    numpy reference computed straight from the known generator formula
    (pixel[r, c] = (seed + 31 r + c) % 256) — no shared code path."""
    from graphene_loader_ray.sources.synth import _jpeg_bytes, _png_bytes
    from graphene_loader_ray.stages.multimodal import (ImageFeatures,
                                                       decode_png_pixels)

    w, h, seed = 20, 9, 77
    payload = _png_bytes(w, h, seed)
    px = decode_png_pixels(payload)
    expect = np.array([[(seed + 31 * r + c) % 256 for c in range(w)]
                       for r in range(h)], np.uint8)
    assert np.array_equal(px[:, :, 0], expect)

    t = pa.table({"url": pa.array(["a", "b"]),
                  "payload": pa.array([payload, _jpeg_bytes(6, 4)],
                                      pa.binary())})
    out = ImageFeatures()(t)
    v = expect.astype(np.float64)
    counts = np.bincount(v.reshape(-1).astype(np.int64), minlength=256)
    p = counts[counts > 0] / v.size
    q = np.percentile(v, [25, 50, 75])
    ref = [round(float(x), 6) for x in (
        v.mean() / 255, v.std() / 255, -(p * np.log2(p)).sum() / 8,
        w / (w + h), q[0] / 255, q[1] / 255, q[2] / 255,
        np.abs(np.diff(v, axis=1)).mean() / 255)]
    assert out["feature"].to_pylist()[0] == ref
    hist_ref = [round(float(x), 6)
                for x in counts.reshape(16, 16).sum(axis=1) / v.size]
    assert out["luma_hist"].to_pylist()[0] == hist_ref
    assert out["feature_kind"].to_pylist() == ["pixels", "bytes"]
    # byte path: same statistics over the raw jpeg payload bytes
    bv = np.frombuffer(_jpeg_bytes(6, 4), np.uint8).astype(np.float64)
    assert out["feature"].to_pylist()[1][0] == round(bv.mean() / 255, 6)


def test_audio_features_pinned():
    """Audio features over a constructed sine WAV equal an independent
    numpy reference (sample reconstruction straight from the int16
    quantization), and the spectral centroid of a pure tone lands on the
    tone (±1 FFT bin)."""
    import struct as st

    from graphene_loader_ray.stages.multimodal import (AudioFeatures,
                                                       parse_wav_samples)

    rate, n, f0 = 8000, 800, 440.0
    x = np.sin(2 * np.pi * f0 * np.arange(n) / rate)
    pcm = (x * 32767).astype(np.int16)
    fmt = st.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (b"WAVE" + b"fmt " + st.pack("<I", len(fmt)) + fmt
            + b"data" + st.pack("<I", pcm.nbytes) + pcm.tobytes())
    wav = b"RIFF" + st.pack("<I", len(body)) + body

    got_rate, mono = parse_wav_samples(wav)
    ref = pcm.astype(np.float64) / 32768
    assert got_rate == rate and np.array_equal(mono, ref)

    t = pa.table({"url": pa.array(["s", "junk"]),
                  "payload": pa.array([wav, b"RIFX" + wav[4:]],
                                      pa.binary())})
    out = AudioFeatures()(t)
    row = {c: out[c].to_pylist()[0] for c in out.column_names}
    assert row["ok"] and row["sample_rate"] == rate
    assert row["rms"] == round(float(np.sqrt((ref ** 2).mean())), 6)
    assert row["zero_cross_rate"] == \
        round(float((ref[1:] * ref[:-1] < 0).mean()), 6)
    assert abs(row["spectral_centroid_hz"] - f0) < 2 * rate / n
    assert row["spectral_bandwidth_hz"] > 0
    assert row["peak"] == round(float(np.abs(ref).max()), 6)
    junk = {c: out[c].to_pylist()[1] for c in out.column_names}
    assert not junk["ok"] and junk["rms"] == 0.0


def test_domain_stats_vs_duckdb(smoke_fixture_dir):
    """domain_stats (combiner-first host×lang partials) equals the exact
    DuckDB computation over the real pages fixture, including the
    quarantine rows' byte counts."""
    import duckdb
    import ray.data as rd

    from graphene_loader_ray.ops.webstats import domain_stats

    pages = rd.read_parquet(smoke_fixture_dir + "/pages",
                            columns=["url", "html", "lang"],
                            override_num_blocks=2)
    out = domain_stats(pages).to_pandas() \
        .sort_values("host").reset_index(drop=True)
    con = duckdb.connect()
    gold = con.execute(f"""
        SELECT regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1)
                   AS host,
               count(*) AS n_pages,
               CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
               CAST(sum(octet_length(html)) AS BIGINT) AS n_bytes
        FROM '{smoke_fixture_dir}/pages/*.parquet'
        GROUP BY host ORDER BY host""").fetchdf()
    pd.testing.assert_frame_equal(out, gold, check_exact=True)
    assert len(out) > 100 and (out["n_langs"] >= 1).all()


def test_wav_header_parser():
    """Real RIFF walk: valid file parsed field-for-field; extra unknown
    chunk skipped; truncation / wrong magic / non-PCM rejected."""
    from graphene_loader_ray.sources.synth import _wav_bytes
    from graphene_loader_ray.stages.multimodal import parse_wav_header

    wav = _wav_bytes(n_frames=100, rate=16000, channels=2, bits=16, seed=3)
    assert parse_wav_header(wav) == (2, 16000, 16, 100)
    # unknown chunk between fmt and data must be skipped (incl. odd-size
    # word alignment): rebuild with a LIST chunk injected
    body = wav[12:]
    fmt_chunk = body[:8 + 16]
    rest = body[8 + 16:]
    extra = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"  # padded
    patched = b"RIFF" + struct.pack(
        "<I", 4 + len(fmt_chunk) + len(extra) + len(rest)) \
        + b"WAVE" + fmt_chunk + extra + rest
    assert parse_wav_header(patched) == (2, 16000, 16, 100)
    assert parse_wav_header(wav[:7]) is None
    assert parse_wav_header(b"RIFX" + wav[4:]) is None
    assert parse_wav_header(wav[:-10]) is None          # truncated data
    nonpcm = bytearray(wav)
    nonpcm[20] = 3                                       # IEEE float fmt
    assert parse_wav_header(bytes(nonpcm)) is None


def test_multimodal_audio_pipeline(smoke_fixture_dir):
    import ray.data as rd

    from graphene_loader_ray.stages.multimodal import decode_audio

    clips = rd.read_parquet(smoke_fixture_dir + "/audio.parquet")
    kinds = dict(zip(clips.to_pandas()["url"], clips.to_pandas()["kind"]))
    out = decode_audio(clips.select_columns(["url", "payload"])).to_pandas()
    assert len(out) == len(kinds)
    for _, row in out.iterrows():
        if kinds[row["url"]] == "corrupt":
            assert not row["ok"] and row["sample_rate"] == 0
        else:
            assert row["ok"] and row["format"] == "wav"
            assert row["sample_rate"] in (8000, 16000, 44100)
            assert row["duration_ms"] == row["n_frames"] * 1000 \
                // row["sample_rate"]
    assert (~out["ok"]).sum() >= 1


def test_video_frame_sampler(smoke_fixture_dir):
    """GLV1 demux + every-k sampling: sampled indices are 0,k,2k,…; each
    sampled frame is a real PNG whose parsed dims are consistent per
    video; corrupt containers quarantine as one ok=False row."""
    import ray.data as rd

    from graphene_loader_ray.stages.multimodal import sample_frames

    vids = rd.read_parquet(smoke_fixture_dir + "/videos.parquet")
    pdf = vids.to_pandas()
    kinds = dict(zip(pdf["url"], pdf["kind"]))
    out = sample_frames(vids.select_columns(["url", "payload"]),
                        every_k=4).to_pandas()
    for url, g in out.groupby("url"):
        if kinds[url] == "corrupt":
            assert len(g) == 1 and not g["ok"].iloc[0]
            continue
        assert g["ok"].all()
        n_frames = g["n_frames"].iloc[0]
        expect = list(range(0, int(n_frames), 4))
        assert sorted(g["frame_index"].tolist()) == expect
        assert (g["frame_format"] == "png").all()
        assert g["width"].nunique() == 1 and (g["width"] > 0).all()
    assert (~out["ok"]).sum() >= 1


def test_stratified_sample_invariance_and_rule(ray_session):
    """stratified_sample returns the exact k-smallest-md5 rows per group
    (pandas reference), identically under 1-block and 8-block inputs, and
    whole groups when k exceeds the group size."""
    import hashlib

    import ray.data as rd

    from graphene_loader_ray.ops.sample import stratified_sample

    rng = np.random.default_rng(3)
    n = 1000
    t = pa.table({
        "id": pa.array(range(n), pa.int64()),
        "g": pa.array(rng.choice(["a", "b", "c", "tiny"],
                                 p=[0.5, 0.3, 0.198, 0.002], size=n)),
        "x": pa.array(rng.normal(size=n)),
    })
    ref = t.to_pandas()
    ref["_h"] = ref["id"].map(
        lambda i: hashlib.md5(str(i).encode()).hexdigest())
    gold = (ref.sort_values(["g", "_h", "id"]).groupby("g").head(5)
               .drop(columns=["_h"])
               .sort_values("id").reset_index(drop=True))

    for blocks in (1, 8):
        ds = rd.from_arrow(t).repartition(blocks)
        out = stratified_sample(ds, "g", "id", 5, num_partitions=4) \
            .to_pandas().sort_values("id").reset_index(drop=True)
        pd.testing.assert_frame_equal(out, gold, check_exact=True)

    tiny = int((ref["g"] == "tiny").sum())
    assert 0 < tiny < 5
    assert (gold["g"] == "tiny").sum() == tiny   # k > group size: keep all


def test_percentile_band_filter_vs_reference(ray_session):
    """percentile_band_filter equals the quantile_disc-band reference
    (DuckDB), keeps constant-valued groups whole, and drops tails."""
    import duckdb
    import ray.data as rd

    from graphene_loader_ray.ops.quantile import percentile_band_filter

    rng = np.random.default_rng(9)
    n = 2000
    g = rng.choice(["x", "y"], size=n).tolist() + ["const"] * 50
    v = rng.integers(0, 10_000, n).tolist() + [42] * 50
    t = pa.table({"id": pa.array(range(len(g)), pa.int64()),
                  "g": pa.array(g), "v": pa.array(v, pa.int64())})

    out = percentile_band_filter(rd.from_arrow(t).repartition(4),
                                 "g", "v", lo=0.1, hi=0.9,
                                 num_partitions=4).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    con = duckdb.connect()
    con.register("t", t)
    gold = con.execute("""
        WITH b AS (SELECT g, quantile_disc(v, 0.1) AS lo,
                          quantile_disc(v, 0.9) AS hi
                   FROM t GROUP BY g)
        SELECT t.id, t.g, t.v FROM t JOIN b USING (g)
        WHERE t.v >= b.lo AND t.v <= b.hi ORDER BY id""").fetchdf()
    pd.testing.assert_frame_equal(out, gold, check_exact=True)
    assert (out["g"] == "const").sum() == 50     # constant group survives
    assert len(out) < len(g)                     # tails were cut


def test_bloom_filter_properties(ray_session):
    """Bloom: zero false negatives, FP rate within 2x the analytic bound,
    and the distributed build is partition-invariant (bit-identical
    words under 1 vs 8 blocks)."""
    import ray.data as rd

    from graphene_loader_ray.ops.sketch import (BloomFilter, bloom_build,
                                                bloom_filter_absent,
                                                _stable_hash64)

    present = pa.array([f"doc-{i}" for i in range(5000)])
    absent = pa.array([f"other-{i}" for i in range(20000)])
    t = pa.table({"key": present})

    blooms = [bloom_build(rd.from_arrow(t).repartition(b), "key",
                          n_bits=1 << 16, k=7) for b in (1, 8)]
    assert np.array_equal(blooms[0].words, blooms[1].words)
    bf = blooms[0]

    assert bf.contains_hashes(_stable_hash64(present)).all()   # no FN ever
    n, m, k = 5000, 1 << 16, 7
    analytic = (1 - np.exp(-k * n / m)) ** k
    fp = bf.contains_hashes(_stable_hash64(absent)).mean()
    assert fp <= 2 * analytic and analytic < 0.25

    mixed = pa.table({"key": pa.chunked_array([present, absent]).combine_chunks()})
    new = bloom_filter_absent(rd.from_arrow(mixed).repartition(4), "key",
                              bf).to_pandas()
    assert not new["key"].str.startswith("doc-").any()         # seen all dropped
    assert len(new) >= (1 - 2 * analytic) * len(absent)        # most new kept

    other = BloomFilter(1 << 16, 7)
    other.add_hashes(_stable_hash64(absent))
    merged = BloomFilter(1 << 16, 7)
    merged.merge(bf).merge(other)
    assert merged.contains_hashes(_stable_hash64(present)).all()
    assert merged.contains_hashes(_stable_hash64(absent)).all()


def test_bloom_filter_absent_md5_nulls(ray_session):
    """md5 mode with a nullable column: null rows drop (the SQL twin's
    WHERE col IS NOT NULL) instead of crashing on a hash/mask length
    mismatch (_md5_hash64 hashes valid rows only — ADVICE r4 #1)."""
    import ray.data as rd

    from graphene_loader_ray.ops.sketch import (bloom_build,
                                                bloom_filter_absent)

    seen = pa.table({"key": pa.array([f"doc-{i}" for i in range(100)])})
    bf = bloom_build(rd.from_arrow(seen), "key", n_bits=1 << 14, k=7,
                     hash_name="md5")
    mixed = pa.table({"key": pa.array(
        ["doc-1", None, "new-a", None, "doc-2", "new-b"])})
    out = bloom_filter_absent(rd.from_arrow(mixed).repartition(2), "key",
                              bf, hash_name="md5").to_pandas()
    assert sorted(out["key"]) == ["new-a", "new-b"]


def test_canonicalize_urls_pinned():
    """Every canonicalization rule on literal fixtures: fragment strip,
    scheme/host lowercase (path case preserved), default-port strip
    (incl. NOT stripping non-default ports), tracking-param drop, param
    sort, empty-param drop, bare '?', schemeless -> null."""
    from graphene_loader_ray.ops.webstats import canonicalize_urls

    cases = {
        "HTTPS://Host.Example:443/P/x?utm_source=a&b=2&a=1#f":
            "https://host.example/P/x?a=1&b=2",
        "http://h.example:80/x?b=2&a=1&": "http://h.example/x?a=1&b=2",
        "http://h.example:8080/x": "http://h.example:8080/x",
        "https://h.example/p?utm_campaign=z&fbclid=1&gclid&msclkid=2":
            "https://h.example/p",
        "https://h.example/p?": "https://h.example/p",
        "https://h.example/p#only-frag": "https://h.example/p",
        "relative/path": None,
        "https://h.example": "https://h.example",
    }
    out = canonicalize_urls(pa.array(list(cases))).to_pylist()
    assert out == list(cases.values())


def test_url_dedup_vs_duckdb(smoke_fixture_dir, ray_session):
    """url_dedup (canonicalize + combiner-first min/count) equals the
    same canonicalization spelled in DuckDB SQL over the identical
    variantized frontier — hash-exact."""
    import duckdb
    import ray.data as rd

    from graphene_loader_ray.ops.webstats import url_dedup
    from graphene_loader_ray.pipelines.queries import _url_variants

    pages = rd.read_parquet(smoke_fixture_dir + "/pages", columns=["url"],
                            override_num_blocks=2)
    variants = pages.map_batches(_url_variants, batch_format="pyarrow")
    out = url_dedup(variants).to_pandas() \
        .sort_values("canonical_url").reset_index(drop=True)

    import pyarrow.parquet as pq
    raw = pq.read_table(smoke_fixture_dir + "/pages", columns=["url"])
    vt = _url_variants(raw)
    con = duckdb.connect()
    con.register("v", vt)
    gold = con.execute(r"""
        WITH s AS (SELECT url, regexp_replace(url, '#.*$', '') AS u0 FROM v),
        p AS (SELECT url,
          lower(regexp_extract(u0, '^([^/?#]*://[^/?#]*)', 1)) AS head0,
          regexp_extract(u0, '^[^/?#]*://[^/?#]*([^?#]*)', 1) AS path,
          CASE WHEN contains(u0, '?')
               THEN regexp_extract(u0, '\?(.*)$', 1) END AS q
          FROM s),
        n AS (SELECT url,
          regexp_replace(regexp_replace(head0,
              '^(https://[^/?#:]*):443$', '\1'),
              '^(http://[^/?#:]*):80$', '\1') || path AS base,
          CASE WHEN q IS NULL THEN NULL ELSE
            array_to_string(list_sort(list_filter(string_split(q, '&'),
              x -> x <> '' AND NOT regexp_matches(x,
                '^(utm_[^=]*|fbclid|gclid|msclkid)(=|$)'))), '&')
          END AS q2 FROM p)
        SELECT base || CASE WHEN q2 IS NULL OR q2 = '' THEN ''
                            ELSE '?' || q2 END AS canonical_url,
               min(url) AS url, CAST(count(*) AS BIGINT) AS n_variants
        FROM n GROUP BY 1 ORDER BY 1""").fetchdf()
    pd.testing.assert_frame_equal(out, gold, check_exact=True)
    assert (out["n_variants"] == 2).all()        # 4 variants -> 2 groups


def test_span_dedup_vs_duckdb(ray_session):
    """Corpus-level duplicate-span removal equals the identical rule
    spelled in DuckDB (RE2 chunking, min-(doc_id,idx) winner,
    order-preserving reassembly) — hash-exact — and the corpus-scale
    join path returns exactly the broadcast path's rows."""
    import duckdb
    import ray.data as rd

    from graphene_loader_ray.ops.span_dedup import span_dedup

    rng = np.random.default_rng(17)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    boiler = "subscribe to our newsletter for updates every single day ok"
    docs = []
    for i in range(60):
        body = " ".join(rng.choice(words, size=int(rng.integers(5, 40))))
        if i % 3 == 0:                       # plant corpus-wide boilerplate
            body = boiler + " " + body
        if i % 7 == 0:
            body = body + " " + boiler
        docs.append(body)
    docs[10] = boiler                        # doc that is ONLY boilerplate
    t = pa.table({"doc_id": pa.array(range(60), pa.int64()),
                  "text": pa.array(docs)})

    results = {}
    for label, bmax in (("broadcast", 2_000_000), ("join", 0)):
        out = span_dedup(rd.from_arrow(t).repartition(4),
                         broadcast_max=bmax, num_partitions=4) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        results[label] = out
    pd.testing.assert_frame_equal(results["broadcast"], results["join"],
                                  check_exact=True)

    con = duckdb.connect()
    con.register("docs", t)
    gold = con.execute(r"""
        WITH ex AS (
          SELECT doc_id, unnest(l) AS chunk,
                 unnest(range(1, len(l) + 1)) AS idx
          FROM (SELECT doc_id,
                       regexp_extract_all(text, '\S+( \S+){0,9}') AS l
                FROM docs) s),
        occ AS (
          SELECT doc_id, idx, chunk,
                 doc_id * 1048576 + idx AS k, md5(chunk) AS h FROM ex),
        win AS (SELECT h, min(k) AS wk FROM occ GROUP BY h)
        SELECT doc_id,
               string_agg(CASE WHEN k = wk THEN chunk END, ' '
                          ORDER BY idx) AS text,
               CAST(count(*) AS BIGINT) AS n_total,
               CAST(count(CASE WHEN k = wk THEN 1 END) AS BIGINT) AS n_kept
        FROM occ JOIN win USING (h)
        GROUP BY doc_id ORDER BY doc_id""").fetchdf()
    pd.testing.assert_frame_equal(results["broadcast"], gold,
                                  check_exact=True)
    out = results["broadcast"]
    assert (out["n_kept"] < out["n_total"]).sum() >= 20   # dups were cut
    assert out.loc[0, "n_kept"] > 0                       # first occ kept

    # hash-scale doc ids (> 2^53): the winner key must survive exactly —
    # a float64 round-trip anywhere silently deduplicates NOTHING (or
    # everything); exactly one of the two docs may lose the shared span
    big = pa.table({
        "doc_id": pa.array([8987654566713296024, 2659271329261968917],
                           pa.int64()),
        "text": pa.array(["shared span one two three four five six "
                          "seven eight tail x",
                          "shared span one two three four five six "
                          "seven eight other y"])})
    for bmax in (2_000_000, 0):
        got = span_dedup(rd.from_arrow(big), broadcast_max=bmax,
                         num_partitions=2).to_pandas()
        assert sorted(got["n_kept"] - got["n_total"]) == [-1, 0], bmax


def test_span_dedup_passthrough_equals_join(ray_session):
    """``passthrough=`` attaches per-doc metadata by riding the reassembly
    shuffle; the result must equal span_dedup-then-merge exactly — on both
    resolution paths, including int64 metadata above 2^53 (the Arrow-side
    row split must keep ints out of pandas' float upcast)."""
    import ray.data as rd

    from graphene_loader_ray.ops.span_dedup import span_dedup

    rng = np.random.default_rng(23)
    words = ["red", "green", "blue", "cyan", "teal"]
    boiler = "one common span shared by many documents in this corpus yes"
    texts = [(boiler + " " if i % 2 else "")
             + " ".join(rng.choice(words, size=int(rng.integers(4, 30))))
             for i in range(40)]
    t = pa.table({"doc_id": pa.array(range(40), pa.int64()),
                  "text": pa.array(texts)})
    meta = pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "host": pa.array([f"h{i % 7}" for i in range(40)]),
        "big_id": pa.array([9007199254740993 + i for i in range(40)],
                           pa.int64())})          # 2^53 + 1 + i

    for bmax in (2_000_000, 0):
        plain = span_dedup(rd.from_arrow(t).repartition(4),
                           broadcast_max=bmax, num_partitions=4) \
            .to_pandas()
        merged = plain.merge(meta.to_pandas(), on="doc_id") \
            .sort_values("doc_id").reset_index(drop=True)
        fused = span_dedup(rd.from_arrow(t).repartition(4),
                           broadcast_max=bmax, num_partitions=4,
                           passthrough=rd.from_arrow(meta).repartition(3)) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            fused[merged.columns.tolist()], merged, check_exact=True)
        assert fused["big_id"].dtype == "int64"

    # reserved-name collision fails loudly
    bad = pa.table({"doc_id": pa.array([1], pa.int64()),
                    "n_kept": pa.array([1], pa.int64())})
    with pytest.raises(ValueError, match="collide"):
        span_dedup(rd.from_arrow(t), passthrough=rd.from_arrow(bad))


def test_ngram_jaccard_size_paths_equal(doc_ds):
    """The broadcast size-map path (default) and the two-keyed-join
    fallback return identical pairs and scores."""
    from graphene_loader_ray.ops.dedup import ngram_jaccard_pairs

    outs = [ngram_jaccard_pairs(doc_ds, threshold=0.1, size_join_min=m)
            .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
            for m in (5_000_000, 0)]
    pd.testing.assert_frame_equal(outs[0], outs[1], check_exact=True)


def test_curate_pages_pipeline(ray_session):
    """The composed curation pipeline: quarantine dropped, canonical-URL
    dups collapse to one, junk quality filtered, corpus-duplicated spans
    removed from later docs, exact text dups collapse — and the whole
    pipeline is partitioning-invariant."""
    import ray.data as rd

    from graphene_loader_ray.pipelines.curate import curate_pages

    def page(url, body):
        html = f"<html><article><p>{body}</p></article></html>".encode()
        return {"url": url, "warc_ts": None, "lang": "en", "html": html}

    boiler = ("subscribe to our newsletter today for the very best "
              "updates and offers")
    good = ("the quick brown fox jumps over the lazy dog and then walks "
            "slowly back to the old barn where it sleeps")
    rows = [
        page("https://a.example/p/1?utm_source=x", good),          # dup of next
        page("https://a.example/p/1", good),                       # URL-dup
        page("https://b.example/p/2", boiler + " " + good),        # 1st boiler
        page("https://c.example/p/3", boiler + " completely other "
             "words about rivers and mountains under a bright sky"),
        page("https://d.example/p/4", "??? !!! ... ;;; ###"),      # junk
        page("https://e.example/p/5",
             "these words are shared exactly between two documents "
             "for the exact dedup stage to collapse"),
        page("https://f.example/p/6",
             "these words are shared exactly between two documents "
             "for the exact dedup stage to collapse"),             # text-dup
        {"url": "https://g.example/p/7", "warc_ts": None, "lang": "en",
         "html": b"<html>no article here</html>"},                 # quarantine
    ]
    t = pa.Table.from_pylist(rows)

    outs = []
    for blocks in (1, 7):
        out = curate_pages(rd.from_arrow(t).repartition(blocks),
                           num_partitions=4).to_pandas() \
            .sort_values("url").reset_index(drop=True)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1], check_exact=True)
    out = outs[0]

    urls = set(out["url"])
    assert "https://g.example/p/7" not in urls          # quarantined
    assert "https://d.example/p/4" not in urls          # junk quality
    # URL dedup: exactly one of the two a.example variants survived
    assert len([u for u in urls if u.startswith("https://a.example")]) == 1
    # exact text dedup: exactly one of e/f survived
    assert len([u for u in urls if u[8] in "ef"]) == 1
    # span dedup: b and c shared the boiler span; exactly one lost spans
    bc = out[out["url"].str.contains("[bc].example", regex=True)]
    assert len(bc) == 2
    assert (bc["n_kept"] < bc["n_total"]).sum() == 1
    assert (bc["n_kept"] == bc["n_total"]).sum() == 1
    # the loser's text no longer contains the boilerplate
    loser = bc[bc["n_kept"] < bc["n_total"]]["text"].iloc[0]
    assert "subscribe to our newsletter" not in loser
    assert (out["quality"] >= 0.4).all()
    assert (out["host"] == out["url"].str.extract(
        r"https://([^/]+)/", expand=False)).all()


def _blobs(n_per: int = 40, k: int = 3, dim: int = 8):
    """Well-separated deterministic blobs; returns (table, labels)."""
    rng = np.random.RandomState(7)
    centers = np.eye(k, dim) * 50.0
    vecs, labels = [], []
    for c in range(k):
        vecs.append(centers[c] + rng.randn(n_per, dim))
        labels.extend([c] * n_per)
    x = np.vstack(vecs)
    t = pa.table({
        "vec_id": pa.array(range(len(x)), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in x],
                              pa.list_(pa.float64()))})
    return t, np.asarray(labels)


def _lloyd_reference(x, ids, k, max_iter=20, tol=1e-9):
    """Driver-side Lloyd with the engine's exact rules (md5-ordered
    candidates → maximin init, ties to lowest cluster, empty keeps
    previous)."""
    import hashlib as _h
    order = np.argsort(np.asarray(
        [_h.md5(str(i).encode()).hexdigest() for i in ids]))
    cand = x[order].astype(np.float64)
    chosen = [0]
    mind = ((cand - cand[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        nxt = int(np.argmax(mind))
        chosen.append(nxt)
        mind = np.minimum(mind, ((cand - cand[nxt]) ** 2).sum(axis=1))
    cent = cand[chosen]
    for n_iter in range(1, max_iter + 1):
        d = -2.0 * (x @ cent.T) + (cent ** 2).sum(axis=1)
        assign = np.argmin(d, axis=1)
        new = cent.copy()
        for c in range(k):
            m = assign == c
            if m.any():
                new[c] = x[m].mean(axis=0)
        shift = float(((new - cent) ** 2).sum(axis=1).max())
        cent = new
        if shift <= tol:
            break
    d = -2.0 * (x @ cent.T) + (cent ** 2).sum(axis=1)
    return cent, np.argmin(d, axis=1), n_iter


def test_kmeans_recovers_blobs_and_matches_reference(ray_session):
    import ray.data as rd

    from graphene_loader_ray.ops.kmeans import assign_clusters, kmeans

    t, labels = _blobs()
    x = np.asarray([list(v) for v in t["embedding"].to_pylist()], np.float64)
    ids = t["vec_id"].to_pylist()

    model = kmeans(rd.from_arrow(t).repartition(5), k=3)
    ref_cent, ref_assign, _ = _lloyd_reference(x, ids, k=3)
    # same init + float64 partials → centroids equal to tight tolerance
    assert np.allclose(model["centroids"], ref_cent, atol=1e-9)

    got = assign_clusters(rd.from_arrow(t), model["centroids"]) \
        .to_pandas().sort_values("vec_id")["cluster"].to_numpy()
    assert (got == ref_assign).all()
    # blob recovery: each planted label maps to exactly one cluster
    mapping = {}
    for lab, cl in zip(labels, got):
        mapping.setdefault(lab, cl)
        assert mapping[lab] == cl
    assert len(set(mapping.values())) == 3

    # inertia equals the reference inertia
    d = ((x[:, None, :] - ref_cent[None, :, :]) ** 2).sum(axis=2)
    assert abs(model["inertia"] - d.min(axis=1).sum()) < 1e-6


def test_kmeans_partitioning_invariance(ray_session):
    import ray.data as rd

    from graphene_loader_ray.ops.kmeans import assign_clusters, kmeans

    t, _ = _blobs(n_per=30, k=4, dim=6)
    runs = []
    for blocks in (1, 7):
        model = kmeans(rd.from_arrow(t).repartition(blocks), k=4)
        a = assign_clusters(rd.from_arrow(t), model["centroids"]) \
            .to_pandas().sort_values("vec_id")["cluster"].to_numpy()
        runs.append((model["centroids"], a))
    assert np.allclose(runs[0][0], runs[1][0], atol=1e-8)
    assert (runs[0][1] == runs[1][1]).all()


def test_unigram_lm_scoring(ray_session):
    """Train/score rules pinned on a tiny corpus: costs ordered
    frequent < rare < OOV, exact integer cost arithmetic, zero-token
    docs omitted, vocab cut at (count DESC, term)."""
    import math

    import ray.data as rd

    from graphene_loader_ray.ops.lm import (score_perplexity,
                                            train_unigram_lm)

    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": ["aa aa aa bb", "aa bb cc", "zz", "   "]})
    docs = rd.from_arrow(t).repartition(2)
    m = train_unigram_lm(docs, vocab_size=3)
    # counts: aa=4 bb=2 cc=1 zz=1 → total 8; vocab(3) = aa,bb,cc (tie
    # cc<zz by term); denom = 8+3+1
    assert m["total"] == 8 and m["n_vocab"] == 3
    assert list(m["terms"]) == ["aa", "bb", "cc"]

    def q(c):
        return math.floor(-math.log((c + 1.0) / 12.0) * 1e6 + 0.5)

    cost = dict(zip(m["terms"], m["cost"]))
    assert cost == {"aa": q(4), "bb": q(2), "cc": q(1)}
    assert m["oov_cost"] == q(0)
    assert cost["aa"] < cost["bb"] < cost["cc"] < m["oov_cost"]

    out = score_perplexity(docs, m).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out["doc_id"]) == [1, 2, 3]          # doc 4 omitted
    assert list(out["n_tokens"]) == [4, 3, 1]
    assert out.loc[0, "lm_cost_micro"] == 3 * q(4) + q(2)
    assert out.loc[2, "lm_cost_micro"] == m["oov_cost"]  # zz is OOV
    c, n = out.loc[1, "lm_cost_micro"], 3
    assert out.loc[1, "avg_nll"] == ((2 * c + 100 * n) // (200 * n)) / 1e4


def test_temperature_sample_rule_and_invariance(ray_session):
    """Temperature rebalancing: group l keeps min(n_l,
    floor(scale*n_l^alpha + 0.5)) smallest-md5(id) rows — pinned vs a
    pandas reference and invariant to input partitioning; head groups
    flatten, tail groups pass through whole."""
    import hashlib as _h

    import ray.data as rd

    from graphene_loader_ray.ops.sample import temperature_sample

    sizes = {"en": 400, "fr": 100, "de": 25, "sw": 4}
    rows = []
    i = 0
    for lang, n in sizes.items():
        for _ in range(n):
            rows.append({"doc_id": i, "lang": lang})
            i += 1
    t = pa.Table.from_pylist(rows)

    outs = []
    for blocks in (1, 9):
        out = temperature_sample(
            rd.from_arrow(t).repartition(blocks), key="lang",
            id_col="doc_id", alpha=0.5, scale=2.0,
            num_partitions=4).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1], check_exact=True)
    out = outs[0]

    df = t.to_pandas()
    df["_h"] = df["doc_id"].map(
        lambda x: _h.md5(str(x).encode()).hexdigest())
    expect = []
    for lang, n in sizes.items():
        k = min(n, int(np.floor(2.0 * n ** 0.5 + 0.5)))
        sel = df[df["lang"] == lang].sort_values(["_h", "doc_id"]).head(k)
        expect.append(sel.drop(columns=["_h"]))
    expect = pd.concat(expect).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, expect, check_exact=True)

    got = out.groupby("lang").size().to_dict()
    assert got == {"en": 40, "fr": 20, "de": 10, "sw": 4}  # 2*sqrt, sw whole


def test_chunk_documents_rules(ray_session):
    """Window rule pinned: reconstruction from chunks (overlap-aware)
    equals the original text; short docs emit one whole chunk; empty/
    NULL emit none; multibyte text slices by codepoint."""
    import ray.data as rd

    from graphene_loader_ray.ops.chunk import chunk_documents

    texts = ["x" * 901, "y" * 500, "z" * 501, "short", "", None,
             "héllo wörld " * 40]                    # 480 codepoints
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = chunk_documents(rd.from_arrow(t).repartition(3),
                          size=500, overlap=100).to_pandas() \
        .sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)

    got_counts = out.groupby("doc_id")["n_chunks"].first().to_dict()
    assert got_counts == {0: 3, 1: 1, 2: 2, 3: 1, 6: 1}  # 4,5 emit none
    assert (out.groupby("doc_id").size() ==
            out.groupby("doc_id")["n_chunks"].first()).all()

    # overlap-aware reconstruction: chunk_i[overlap:] appended to chunk_0
    for did, text in enumerate(texts):
        if not text:
            continue
        chunks = out[out["doc_id"] == did]["chunk"].tolist()
        rebuilt = chunks[0] + "".join(c[100:] for c in chunks[1:])
        assert rebuilt == text, did
        assert all(len(c) <= 500 for c in chunks)
        # consecutive chunks agree on the 100-codepoint overlap
        for a, b in zip(chunks, chunks[1:]):
            assert a[400:] == b[:len(a[400:])]


def test_pack_sequences_rules(ray_session):
    """Two-pointer packing pinned: every doc assigned exactly once, pack fill ≤
    budget except oversize singletons, pack_id is the pack's min doc id,
    invariant to input partitioning, and fill is tight on mixed sizes."""
    import ray.data as rd

    from graphene_loader_ray.ops.pack import pack_sequences

    rng = np.random.RandomState(11)
    w = np.concatenate([rng.randint(50, 900, 300),
                        rng.randint(1500, 2500, 3)])     # 3 oversize
    t = pa.table({"doc_id": pa.array(range(len(w)), pa.int64()),
                  "n_chars": pa.array(w, pa.int64())})

    outs = []
    for blocks in (1, 6):
        out = pack_sequences(rd.from_arrow(t).repartition(blocks),
                             budget=1000, weight_col="n_chars",
                             num_partitions=4).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1], check_exact=True)
    out = outs[0]

    assert len(out) == len(w) and out["doc_id"].is_unique
    packs = out.groupby("pack_id")
    assert (packs["n_chars"].sum() == packs["pack_fill"].first()).all()
    assert (packs.size() == packs["pack_n_docs"].first()).all()
    assert (packs.apply(lambda g: g["doc_id"].min() ==
                        g["pack_id"].iloc[0])).all()
    over = out[out["oversize"]]
    assert len(over) == 3 and (over["pack_n_docs"] == 1).all()
    ok = out[~out["oversize"]].groupby("pack_id")["pack_fill"].first()
    assert (ok <= 1000).all()
    assert ok.mean() >= 880          # big-plus-smalls packs tightly

    # exact rule pinned on one partition: heaviest doc + the longest run
    # of lightest docs that fits
    from graphene_loader_ray.ops.pack import _pack_partition
    small = pd.DataFrame({"doc_id": [1, 2, 3, 4, 5, 6],
                          "n_chars": [900, 700, 400, 90, 60, 50]})
    got = _pack_partition(small, "n_chars", "doc_id", budget=1000) \
        .sort_values("doc_id")
    # pack 1: 900, rem=100 → lightest run {50} (50+60 > 100);
    # pack 2: 700, rem=300 → {60, 90}; pack 3: 400 alone
    assert got.set_index("doc_id")["pack_id"].to_dict() == \
        {1: 1, 6: 1, 2: 2, 4: 2, 5: 2, 3: 3}
    assert got.set_index("doc_id")["pack_fill"].to_dict() == \
        {1: 950, 6: 950, 2: 850, 4: 850, 5: 850, 3: 400}


def test_equi_join_big_ints_and_nulls(ray_session):
    """equi_join preserves int64 values above 2^53 exactly (the padded
    union must never round-trip them through float64) and keeps genuine
    nulls in integer payload columns, across all three join modes."""
    import ray.data as rd

    from graphene_loader_ray.ops.join import equi_join

    big = 9_007_199_254_740_993            # 2^53 + 1: float64 rounds it
    left = pa.table({
        "k": pa.array([big, big + 2, 5, 7], pa.int64()),
        "lv": pa.array([big + 10, None, 50, 70], pa.int64())})
    right = pa.table({
        "k": pa.array([big, 5, 999], pa.int64()),
        "rv": pa.array([big + 20, None, 1], pa.int64())})
    l = rd.from_arrow(left).repartition(3)
    r = rd.from_arrow(right).repartition(2)

    inner = equi_join(l, r, on=["k"], num_partitions=4).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert list(inner["k"]) == [5, big]
    assert inner.loc[1, "lv"] == big + 10 and inner.loc[1, "rv"] == big + 20
    assert pd.isna(inner.loc[0, "rv"]) and inner.loc[0, "lv"] == 50

    semi = equi_join(l, r, on=["k"], how="left_semi",
                     num_partitions=4).to_pandas()
    assert sorted(semi["k"]) == [5, big]

    anti = equi_join(l, r, on=["k"], how="left_anti",
                     num_partitions=4).to_pandas()
    assert sorted(anti["k"]) == [7, big + 2]
    # the null payload of the anti-surviving big row is intact
    assert pd.isna(anti.set_index("k").loc[big + 2, "lv"])


def test_curate_to_parquet_resume(ray_session, tmp_path):
    """Atomic curated sink: first run writes + counts, identical rerun
    is a no-op skip, input change invalidates (global dedups must not
    survive stale inputs)."""
    import ray.data as rd

    from graphene_loader_ray.pipelines.curate import curate_to_parquet
    from graphene_loader_ray.sources.synth import synthesize

    fixture = synthesize(n_pages=400)
    pdir = os.path.join(fixture, "pages")
    paths = sorted(os.path.join(pdir, f) for f in os.listdir(pdir))

    def pages():
        return rd.read_parquet(paths, columns=["url", "warc_ts",
                                               "lang", "html"])

    out = str(tmp_path / "cur")
    r1 = curate_to_parquet(pages(), paths, out, num_partitions=4)
    assert not r1["skipped"]
    n1 = pq.read_table(r1["dir"]).num_rows
    assert n1 > 0

    r2 = curate_to_parquet(pages(), paths, out, num_partitions=4)
    assert r2["skipped"] and r2["dir"] == r1["dir"]

    # touching an input invalidates the fingerprint → recompute
    os.utime(paths[0])
    r3 = curate_to_parquet(pages(), paths, out, num_partitions=4)
    assert not r3["skipped"]
    assert pq.read_table(r3["dir"]).num_rows == n1


def test_span_dedup_fast_hash_equals_md5(ray_session):
    """The 64-bit fast span hash (scale knob) produces the same
    reassembled output as the md5 path on both resolution modes."""
    import ray.data as rd

    from graphene_loader_ray.ops.span_dedup import span_dedup

    rng = np.random.RandomState(3)
    words = [f"w{i}" for i in range(40)]
    docs = []
    boiler = " ".join(words[:12])
    for d in range(60):
        body = " ".join(rng.choice(words, size=30))
        docs.append({"doc_id": d, "text": (boiler + " " + body)
                     if d % 3 == 0 else body})
    t = pa.Table.from_pylist(docs)

    outs = {}
    for fn in ("md5", "fast"):
        outs[fn] = span_dedup(rd.from_arrow(t).repartition(4),
                              num_partitions=4, hash_fn=fn,
                              broadcast_max=2_000_000).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(outs["md5"], outs["fast"],
                                  check_exact=True)
    # and through the join fallback too
    j = span_dedup(rd.from_arrow(t).repartition(4), num_partitions=4,
                   hash_fn="fast", broadcast_max=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(outs["md5"], j, check_exact=True)


def test_temperature_sample_null_keys_match_sql(ray_session):
    """Null group keys are CAPPED like any group (the SQL twin's
    PARTITION BY keeps a NULL partition), not silently dropped."""
    import duckdb

    import ray.data as rd

    from graphene_loader_ray.ops.sample import (temperature_sample,
                                                temperature_sample_sql)

    rows = [{"doc_id": i, "lang": (None if i % 3 == 0 else "en")}
            for i in range(90)]
    t = pa.Table.from_pylist(rows)
    got = temperature_sample(rd.from_arrow(t).repartition(4), key="lang",
                             id_col="doc_id", alpha=0.5, scale=2.0,
                             num_partitions=4).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    con = duckdb.connect()
    con.register("tbl", t.to_pandas())
    gold = con.execute(temperature_sample_sql(
        "tbl", "lang", "doc_id", 0.5, 2.0,
        ["doc_id", "lang"])).fetchdf() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, gold, check_exact=True)
    assert got["lang"].isna().sum() > 0       # null group sampled, kept


def test_unigram_lm_empty_vocab_all_oov(ray_session):
    """A degenerate corpus (no tokens at train time) must score later
    docs as all-OOV, not crash."""
    import ray.data as rd

    from graphene_loader_ray.ops.lm import (score_perplexity,
                                            train_unigram_lm)

    empty = pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array(["   "], pa.string())})
    m = train_unigram_lm(rd.from_arrow(empty), vocab_size=8)
    assert m["n_vocab"] == 0 and m["total"] == 0
    docs = pa.table({"doc_id": pa.array([2], pa.int64()),
                     "text": pa.array(["hello world"], pa.string())})
    out = score_perplexity(rd.from_arrow(docs), m).to_pandas()
    assert out.loc[0, "lm_cost_micro"] == 2 * m["oov_cost"]


def test_zscore_by_group_rules(ray_session):
    """Z-score rules pinned: exact small case, singleton and
    zero-variance groups NULL, null keys dropped, partitioning
    invariant, and hash-exact vs the generated SQL twin."""
    import duckdb

    import ray.data as rd

    from graphene_loader_ray.ops.normalize import (zscore_by_group,
                                                   zscore_by_group_sql)

    rows = ([{"event_id": i, "event_type": "a",
              "value": float(v)} for i, v in enumerate([1.0, 2.0, 3.0])]
            + [{"event_id": 10, "event_type": "b", "value": 5.0}]   # n=1
            + [{"event_id": 11, "event_type": "c", "value": 7.0},
               {"event_id": 12, "event_type": "c", "value": 7.0}]   # var=0
            + [{"event_id": 13, "event_type": None, "value": 9.0}])
    t = pa.Table.from_pylist(rows)

    outs = []
    for blocks in (1, 5):
        out = zscore_by_group(rd.from_arrow(t).repartition(blocks),
                              key="event_type", value_col="value") \
            .to_pandas().sort_values("event_id").reset_index(drop=True)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1], check_exact=True)
    out = outs[0]

    assert 13 not in set(out["event_id"])          # null key dropped
    a = out[out["event_type"] == "a"].set_index("event_id")["zscore"]
    assert a.loc[0] == -1.0 and a.loc[1] == 0.0 and a.loc[2] == 1.0
    assert out[out["event_type"].isin(["b", "c"])]["zscore"].isna().all()

    con = duckdb.connect()
    con.register("tbl", t.to_pandas())
    gold = con.execute(zscore_by_group_sql(
        "tbl", "event_type", "value",
        ["event_id", "event_type", "value"])).fetchdf() \
        .sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, gold, check_exact=True)


def test_tfidf_keywords_rules(ray_session):
    """TF-IDF pinning: a corpus-wide stopword loses to a rare term at
    equal tf, exactly k rows per tokenful doc, and the result is
    partitioning-invariant."""
    import ray.data as rd

    from graphene_loader_ray.ops.tfidf import top_terms_per_doc

    rows = [{"doc_id": i,
             "text": f"common common rare{i} rare{i} filler{i % 2}"}
            for i in range(8)]
    rows.append({"doc_id": 99, "text": None})
    t = pa.Table.from_pylist(rows)

    outs = []
    for blocks in (1, 4):
        out = top_terms_per_doc(rd.from_arrow(t).repartition(blocks),
                                k=2).to_pandas() \
            .sort_values(["doc_id", "term"]).reset_index(drop=True)
        outs.append(out)
    pd.testing.assert_frame_equal(outs[0], outs[1], check_exact=True)
    out = outs[0]

    assert 99 not in set(out["doc_id"])           # null text emits nothing
    assert (out.groupby("doc_id").size() == 2).all()
    for did, g in out.groupby("doc_id"):
        terms = list(g["term"])
        # rare{i} (df=1) must outrank common (df=8) at equal tf=2
        assert f"rare{did}" in terms
        top = g.sort_values("score", ascending=False).iloc[0]
        assert top["term"] == f"rare{did}" and top["tf"] == 2


def test_resize_pixels_kernel():
    """Area resize equals a brute-force overlap-integration reference;
    nearest equals pixel-center index sampling; identity resize is exact;
    channel normalization covers every decoded layout."""
    from graphene_loader_ray.stages.multimodal import (resize_pixels,
                                                       to_rgb)

    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, (9, 13, 3), dtype=np.uint8)

    def brute_area(img, oh, ow):
        h, w, c = img.shape
        sh, sw = h / oh, w / ow
        out = np.zeros((oh, ow, c))
        for i in range(oh):
            for j in range(ow):
                acc = np.zeros(c)
                for y in range(h):
                    oy = min((i + 1) * sh, y + 1) - max(i * sh, y)
                    if oy <= 0:
                        continue
                    for x in range(w):
                        ox = min((j + 1) * sw, x + 1) - max(j * sw, x)
                        if ox > 0:
                            acc += img[y, x] * oy * ox
                out[i, j] = acc / (sh * sw)
        return np.clip(np.floor(out + 0.5), 0, 255).astype(np.uint8)

    for oh, ow in ((4, 4), (3, 7), (9, 13), (2, 1)):
        got = resize_pixels(px, oh, ow, method="area")
        assert np.array_equal(got, brute_area(px, oh, ow)), (oh, ow)

    # identity area resize reproduces the input exactly (weights = I)
    assert np.array_equal(resize_pixels(px, 9, 13, method="area"), px)

    # nearest: center-sample formula, independently computed
    got = resize_pixels(px, 3, 4, method="nearest")
    for i in range(3):
        for j in range(4):
            y, x = ((2 * i + 1) * 9) // 6, ((2 * j + 1) * 13) // 8
            assert (got[i, j] == px[min(y, 8), min(x, 12)]).all()

    # channel normalization
    g = rng.integers(0, 256, (4, 5, 1), dtype=np.uint8)
    assert to_rgb(g).shape == (4, 5, 3)
    assert np.array_equal(to_rgb(g)[:, :, 0], g[:, :, 0])
    ga = rng.integers(0, 256, (4, 5, 2), dtype=np.uint8)
    assert np.array_equal(to_rgb(ga)[:, :, 2], ga[:, :, 0])
    rgba = rng.integers(0, 256, (4, 5, 4), dtype=np.uint8)
    assert np.array_equal(to_rgb(rgba), rgba[:, :, :3])

    import pytest as _pytest
    with _pytest.raises(ValueError):
        resize_pixels(px, 4, 4, method="bilinear")


def test_resize_images_stage(ray_session):
    """The resize actor stage over the synth image fixture: every PNG row
    yields a (32*32*3) uint8 tensor whose values equal resizing the
    independently decoded pixels; JPEG/GIF/broken rows quarantine with
    the zero tensor; output schema is fixed-size so training prep gets a
    uniform layout."""
    import ray.data as rd

    from graphene_loader_ray.sources.synth import synthesize
    from graphene_loader_ray.stages.multimodal import (decode_png_pixels,
                                                       resize_images,
                                                       resize_pixels,
                                                       to_rgb)

    fx = synthesize(n_pages=400)
    images = rd.read_parquet(os.path.join(fx, "images.parquet"))
    out = resize_images(images, out_w=32, out_h=32).to_pandas() \
        .set_index("url")
    src = pq.read_table(os.path.join(fx, "images.parquet")).to_pylist()
    n_png = 0
    for row in src:
        got = out.loc[row["url"]]
        px = decode_png_pixels(row["payload"] or b"")
        if px is None:
            assert not got["ok"]
            assert not any(got["pixels"])
            continue
        n_png += 1
        want = resize_pixels(to_rgb(px), 32, 32).reshape(-1)
        assert got["ok"]
        assert np.array_equal(np.asarray(got["pixels"], np.uint8), want)
    assert n_png >= 10          # the fixture really exercises the path
