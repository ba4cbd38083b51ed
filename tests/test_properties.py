"""Property tests (SURVEY.md §5e): canonicalization must be commutative /
order-independent — the deliberate fix for the reference's order-dependent
upsert (Importer.groovy:117-123) — and the linking grammar deterministic."""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from graphene_loader_ray.functions.linking import Gazetteer, parse_sentence
from graphene_loader_ray.ops.components import union_find

ids = st.integers(min_value=0, max_value=30).map(lambda i: f"n{i}")


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(ids, ids), max_size=40), st.randoms())
def test_union_find_order_independent(pairs, rnd):
    a = union_find(pairs)
    shuffled = list(pairs)
    rnd.shuffle(shuffled)
    b = union_find(shuffled)
    assert a == b
    # canonical = min of component, and symmetric pairs merge
    for x, y in pairs:
        assert a[x] == a[y]
        assert a[x] <= x and a[x] <= y


@settings(max_examples=100, deadline=None)
@given(st.lists(
    st.tuples(st.text(alphabet="abc XYZ", min_size=1, max_size=8),
              ids, st.booleans()),
    max_size=30), st.randoms())
def test_gazetteer_build_order_independent(rows, rnd):
    g1 = Gazetteer.build(rows)
    shuffled = list(rows)
    rnd.shuffle(shuffled)
    g2 = Gazetteer.build(shuffled)
    surfaces = {s for s, _, _ in rows}
    for s in surfaces:
        assert g1.resolve(s) == g2.resolve(s)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet="abcdef .!of\n", max_size=60))
def test_parse_sentence_total(text):
    # never raises; a match always re-serializes to the original paragraph
    out = parse_sentence(text)
    if out is not None:
        s, phrase, o = out
        assert f"{s} {phrase} {o}." == text


_prop_vals = st.one_of(
    st.integers(min_value=-10**6, max_value=10**6),
    st.text(alphabet="abcXYZ0 _'\"", max_size=8),
    st.lists(st.text(alphabet="abc", max_size=4), max_size=3))
_props = st.dictionaries(st.text(alphabet="abcRk_", min_size=1, max_size=6),
                         _prop_vals, max_size=5)


@settings(max_examples=200, deadline=None)
@given(_props, _props, _props)
def test_merge_props_commutative_associative_idempotent(a, b, c):
    """The props merge rule (kb/spec.py) must be a commutative,
    associative, idempotent fold — otherwise parallel schedule order
    leaks into nodes.parquet (SURVEY.md §7.4)."""
    from graphene_loader_ray.kb import spec

    assert spec.merge_props(a, b) == spec.merge_props(b, a)
    assert spec.merge_props(spec.merge_props(a, b), c) == \
        spec.merge_props(a, spec.merge_props(b, c))
    assert spec.merge_props(a, a) == a
    # serialized form composes the same way
    ja, jb = spec.props_json(a), spec.props_json(b)
    assert spec.merge_props_json(ja, jb) == \
        spec.props_json(spec.merge_props(a, b)) \
        or (not a and not b)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.text(alphabet="abx 2[]()-", min_size=1, max_size=10),
                min_size=1, max_size=12),
       st.text(alphabet="abx 2[]()-qz.", max_size=80))
def test_matcher_equals_regex_property(surfaces, text):
    """TokenAhoCorasick reproduces the reference regex scan on arbitrary
    surface sets and texts (hypothesis-driven twin of the fuzz test)."""
    from graphene_loader_ray.functions.linking import Gazetteer
    from graphene_loader_ray.functions.naming import normalize_surface

    rows = [(s, f"N:X:{normalize_surface(s)}", True)
            for s in surfaces if normalize_surface(s)]
    if not rows:
        return
    gaz = Gazetteer.build(rows)
    nt = normalize_surface(text)
    regex = [m.group(1) for m in gaz.mention_pattern().finditer(nt)]
    assert gaz.matcher().iter_matches(nt) == regex


def test_salted_group_apply_matches_direct(ray_session):
    """Zipf-skewed keys: salted two-phase == direct pandas groupby."""
    import ray.data as rd

    from graphene_loader_ray.ops.aggregate import salted_group_apply

    rng = np.random.default_rng(5)
    keys = rng.zipf(1.5, size=4000) % 7          # heavy head key
    vals = rng.integers(0, 100, size=4000)
    df = pd.DataFrame({"k": [f"k{k}" for k in keys], "v": vals})
    ds = rd.from_pandas(df)

    def partial(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame([{"k": g["k"].iloc[0], "s": g["v"].sum(),
                              "mx": g["v"].max()}])

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame([{"k": g["k"].iloc[0], "s": g["s"].sum(),
                              "mx": g["mx"].max()}])

    out = salted_group_apply(ds, ["k"], partial, combine).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    want = df.groupby("k").agg(s=("v", "sum"), mx=("v", "max")) \
        .reset_index().sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(out[["k", "s", "mx"]], want,
                                  check_dtype=False)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.text(alphabet=st.characters(max_codepoint=0x2FFF),
                        max_size=60),
                min_size=1, max_size=8),
       st.integers(min_value=2, max_value=40),
       st.integers(min_value=0, max_value=39))
def test_chunk_window_rule(texts, size, overlap):
    """For any unicode docs and any (size, overlap): chunks reconstruct
    the text exactly, every chunk is ≤ size codepoints, counts obey the
    pinned formula, and empty docs emit nothing."""
    import pyarrow as pa

    from graphene_loader_ray.ops.chunk import chunk_table

    if overlap >= size:
        overlap = size - 1
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = chunk_table(t, size, overlap).to_pandas() \
        .sort_values(["doc_id", "chunk_idx"])
    step = size - overlap
    for did, text in enumerate(texts):
        chunks = out[out["doc_id"] == did]["chunk"].tolist()
        if not text:
            assert chunks == []
            continue
        expect_n = 1 + max(len(text) - overlap - 1, 0) // step
        assert len(chunks) == expect_n
        assert all(len(c) <= size for c in chunks)
        assert chunks == [text[i * step:i * step + size]
                          for i in range(expect_n)]
        rebuilt = chunks[0] + "".join(c[overlap:] for c in chunks[1:])
        assert rebuilt == text


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=500),
                min_size=1, max_size=60),
       st.integers(min_value=10, max_value=400), st.randoms())
def test_pack_partition_invariants(weights, budget, rnd):
    """For any weights and budget: every doc packed exactly once, every
    pack ≤ budget unless an oversize singleton, pack_id = min member id,
    pack stats self-consistent, and input row order never matters."""
    from graphene_loader_ray.ops.pack import _pack_partition

    df = pd.DataFrame({"doc_id": range(len(weights)), "w": weights})
    shuffled = df.sample(frac=1, random_state=rnd.randint(0, 2**31))
    a = _pack_partition(df, "w", "doc_id", budget) \
        .sort_values("doc_id").reset_index(drop=True)
    b = _pack_partition(shuffled, "w", "doc_id", budget) \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_exact=True)

    assert a["doc_id"].is_unique and len(a) == len(weights)
    g = a.groupby("pack_id")
    assert (g["w"].sum() == g["pack_fill"].first()).all()
    assert (g.size() == g["pack_n_docs"].first()).all()
    for pid, grp in g:
        assert pid == grp["doc_id"].min()
        if not grp["oversize"].any():
            assert grp["w"].sum() <= budget
        else:
            assert len(grp) == 1
