"""JSONL/NDJSON source (sources/jsonl.py): round-trip fidelity against a
parquet table, per-record quarantine on malformed lines (the reference's
log-and-skip policy, GrameneMongoLoader.groovy:35-38 — never crash, never
silently drop), gz shards, heterogeneous/missing keys, type salvage."""

from __future__ import annotations

import gzip
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from graphene_loader_ray.sources.jsonl import read_jsonl

DOC_SCHEMA = pa.schema([("doc_id", pa.int64()), ("text", pa.string()),
                        ("lang", pa.string()), ("source", pa.string()),
                        ("n_chars", pa.int64())])

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_jsonl(tmp_path_factory):
    """The documents table dumped as two JSONL shards (one gz)."""
    out = tmp_path_factory.mktemp("jsonl")
    t = pq.read_table(os.path.join(SF, "documents.parquet"))
    rows = t.to_pylist()
    mid = len(rows) // 2
    p1 = str(out / "part0.jsonl")
    with open(p1, "w") as fh:
        for r in rows[:mid]:
            fh.write(json.dumps(r) + "\n")
    p2 = str(out / "part1.jsonl.gz")
    with gzip.open(p2, "wt") as fh:
        for r in rows[mid:]:
            fh.write(json.dumps(r) + "\n")
    return {"plain": p1, "gz": p2, "table": t}


def test_roundtrip_matches_parquet(docs_jsonl):
    ds = read_jsonl(docs_jsonl["plain"], DOC_SCHEMA,
                    override_num_blocks=2)
    got = pa.concat_tables(
        [b for b in ds.iter_batches(batch_size=65536,
                                    batch_format="pyarrow")])
    assert got["ok"].to_pylist() == [True] * got.num_rows
    want = docs_jsonl["table"].slice(0, got.num_rows)
    got = got.drop_columns(["ok"]).sort_by("doc_id")
    want = want.select(got.column_names).sort_by("doc_id")
    assert got.equals(want.cast(got.schema))


def test_gz_shard_reads(docs_jsonl):
    ds = read_jsonl(docs_jsonl["gz"], DOC_SCHEMA, override_num_blocks=1)
    n_src = docs_jsonl["table"].num_rows - docs_jsonl["table"].num_rows // 2
    assert ds.count() == n_src


def test_malformed_lines_quarantined_not_dropped(tmp_path):
    p = str(tmp_path / "bad.jsonl")
    lines = ['{"doc_id": 1, "text": "a"}',
             '{"doc_id": 2, "text": "b"',      # truncated
             'not json at all',
             '42',                              # valid JSON, not an object
             '{"doc_id": 5, "text": "e"}']
    with open(p, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    ds = read_jsonl(p, schema, override_num_blocks=1)
    t = pa.concat_tables(list(ds.iter_batches(batch_size=100,
                                              batch_format="pyarrow")))
    assert t.num_rows == 5                       # nothing silently dropped
    by_ok = dict(zip(t["ok"].to_pylist(), range(5)))
    assert sum(t["ok"].to_pylist()) == 2
    good = t.filter(t["ok"])
    assert sorted(good["doc_id"].to_pylist()) == [1, 5]
    bad = t.filter(pa.compute.invert(t["ok"].combine_chunks()))
    assert bad["doc_id"].null_count == 3         # quarantine rows all-null


def test_missing_and_extra_keys_normalized(tmp_path):
    p = str(tmp_path / "mixed.jsonl")
    with open(p, "w") as fh:
        fh.write('{"doc_id": 1, "text": "a", "extra_key": "zzz"}\n')
        fh.write('{"doc_id": 2}\n')              # missing text
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    ds = read_jsonl(p, schema, override_num_blocks=1)
    t = pa.concat_tables(list(ds.iter_batches(batch_size=100,
                                              batch_format="pyarrow")))
    assert t.column_names == ["doc_id", "text", "ok"]
    assert t["text"].to_pylist() == ["a", None]
    assert t["ok"].to_pylist() == [True, True]


def test_type_mismatch_salvaged_per_field(tmp_path):
    """One shard's string doc_id nulls that FIELD, not the row and not
    the read (per-record policy extended per-field)."""
    p = str(tmp_path / "typed.jsonl")
    with open(p, "w") as fh:
        fh.write('{"doc_id": 1, "text": "a"}\n')
        fh.write('{"doc_id": "oops", "text": "b"}\n')
        fh.write('bad line\n')                   # forces the careful path
    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    ds = read_jsonl(p, schema, override_num_blocks=1)
    t = pa.concat_tables(list(ds.iter_batches(batch_size=100,
                                              batch_format="pyarrow")))
    assert t.num_rows == 3
    assert t["text"].to_pylist() == ["a", "b", None]
    assert t["doc_id"].to_pylist() == [1, None, None]
    assert t["ok"].to_pylist() == [True, True, False]


def test_write_jsonl_pages_roundtrip(tmp_path):
    """The fixture writer's base64/epoch-us encoding round-trips exactly
    (naive-datetime local-time pitfalls would shift warc_ts)."""
    from graphene_loader_ray.sources.jsonl import (read_jsonl_pages,
                                                   write_jsonl_pages)
    t = pa.table({
        "url": pa.array(["https://x.example/a"], pa.string()),
        "warc_ts": pa.array([1_600_000_000_123_456], pa.timestamp("us")),
        "html": pa.array([b"<html>\xff raw bytes</html>"], pa.binary())})
    p1, p2 = str(tmp_path / "a.jsonl.gz"), str(tmp_path / "b.jsonl.gz")
    write_jsonl_pages(t, p1)
    write_jsonl_pages(t, p2)
    assert open(p1, "rb").read() == open(p2, "rb").read()  # deterministic
    got = pa.concat_tables(list(read_jsonl_pages(p1).iter_batches(
        batch_size=10, batch_format="pyarrow")))
    assert got["ok"].to_pylist() == [True]
    assert got["url"].to_pylist() == ["https://x.example/a"]
    assert got["html"].to_pylist() == [b"<html>\xff raw bytes</html>"]
    assert got["warc_ts"].cast(pa.int64()).to_pylist() == [
        1_600_000_000_123_456]


def test_kg_from_jsonl_equals_parquet(tmp_path):
    """The flagship KG pipeline ingesting the JSONL interchange format
    produces identical graph outputs (edges, nodes, counters) to the
    parquet path over the same corpus — the same gate the WARC source
    has (test_kg_from_warc_equals_parquet)."""
    import pandas as pd

    from graphene_loader_ray.pipelines.kg import run_kg_pipeline
    from graphene_loader_ray.sources.synth import synthesize

    fixture_dir = synthesize(n_pages=400)
    outs = {}
    for fmt in ("parquet", "jsonl"):
        res = run_kg_pipeline(fixture_dir, str(tmp_path / fmt),
                              n_page_partitions=2, pages_format=fmt)
        gdir = res["graph_dir"]
        outs[fmt] = {
            "counters": res["counters"],
            "edges": pq.read_table(os.path.join(gdir, "edges")).to_pandas(),
            "nodes": pq.read_table(os.path.join(gdir, "nodes")).to_pandas(),
        }
    assert outs["parquet"]["counters"] == outs["jsonl"]["counters"]
    for k in ("edges", "nodes"):
        pd.testing.assert_frame_equal(outs["parquet"][k], outs["jsonl"][k],
                                      check_exact=True)


from hypothesis import given, settings
from hypothesis import strategies as st

_ROW = st.fixed_dictionaries({}, optional={
    "i": st.integers(min_value=-2**62, max_value=2**62),
    "s": st.text(max_size=40),
    "f": st.floats(allow_nan=False, allow_infinity=False, width=64),
    "b": st.booleans(),
})
_SCHEMA = pa.schema([("i", pa.int64()), ("s", pa.string()),
                     ("f", pa.float64()), ("b", pa.bool_())])


@settings(max_examples=150, deadline=None)
@given(st.lists(_ROW, min_size=1, max_size=30))
def test_parse_lines_property_roundtrip(rows):
    """Any batch of well-formed JSON objects (per-key stable types,
    arbitrary missing keys, arbitrary unicode) parses with ok=true
    everywhere and value-exact round-trip — regardless of whether the
    pyarrow-C fast path or the per-line careful path served it."""
    from graphene_loader_ray.sources.jsonl import _parse_lines_batch

    lines = [json.dumps(r) for r in rows]
    t = _parse_lines_batch(lines, _SCHEMA)
    assert t.num_rows == len(rows)
    assert t["ok"].to_pylist() == [True] * len(rows)
    for k in ("i", "s", "f", "b"):
        assert t[k].to_pylist() == [r.get(k) for r in rows], k


@settings(max_examples=100, deadline=None)
@given(st.lists(st.one_of(
    st.fixed_dictionaries({"i": st.integers(-10**6, 10**6)}),
    st.text(max_size=20).filter(
        lambda s: not s.strip().startswith(("{", "[")))),
    min_size=1, max_size=20))
def test_parse_lines_property_quarantine(mixed):
    """Interleaved garbage lines: row count is always preserved, garbage
    is ok=false with null fields, objects keep their values."""
    from graphene_loader_ray.sources.jsonl import _parse_lines_batch

    lines = [json.dumps(m) if isinstance(m, dict) else m for m in mixed]
    t = _parse_lines_batch(lines, pa.schema([("i", pa.int64())]))
    assert t.num_rows == len(mixed)
    for got_ok, got_i, m in zip(t["ok"].to_pylist(), t["i"].to_pylist(),
                                mixed):
        if isinstance(m, dict):
            assert got_ok and got_i == m["i"]
        else:
            try:
                obj = json.loads(m)
                valid = isinstance(obj, dict)
            except ValueError:
                valid = False
            assert got_ok == valid
            if not got_ok:
                assert got_i is None


def test_mixed_plain_and_gz_shards(docs_jsonl):
    """gz decision is PER FILE: one plain + one gz shard in a single read
    must surface every row (an all-or-nothing switch would read the gz
    shard as raw bytes and quarantine it wholesale)."""
    ds = read_jsonl([docs_jsonl["plain"], docs_jsonl["gz"]], DOC_SCHEMA,
                    override_num_blocks=1)
    t = pa.concat_tables(list(ds.iter_batches(batch_size=65536,
                                              batch_format="pyarrow")))
    assert t.num_rows == docs_jsonl["table"].num_rows
    assert t["ok"].to_pylist() == [True] * t.num_rows
    assert (sorted(t["doc_id"].to_pylist())
            == sorted(docs_jsonl["table"]["doc_id"].to_pylist()))


def test_schema_violating_json_salvaged_not_crashed():
    """Well-formed JSON whose field type contradicts the schema (a list
    where int64 is requested) must take the per-field salvage path, not
    crash the read task with ArrowNotImplementedError."""
    from graphene_loader_ray.sources.jsonl import _parse_lines_batch

    schema = pa.schema([("doc_id", pa.int64()), ("text", pa.string())])
    t = _parse_lines_batch(['{"doc_id": [1,2], "text": "x"}',
                            '{"doc_id": 3, "text": "y"}'], schema)
    assert t.num_rows == 2
    assert t["ok"].to_pylist() == [True, True]   # lines ARE valid JSON
    assert t["doc_id"].to_pylist() == [None, 3]  # field salvaged to null
    assert t["text"].to_pylist() == ["x", "y"]


def test_curate_from_any_source_equal(tmp_path):
    """curate_pages composes with EVERY page source: parquet, JSONL and
    WARC reads of the same corpus produce identical curated output
    (extract fills absent warc_ts/lang metadata with nulls — crawl wire
    formats don't carry the parquet fixture's extra columns)."""
    import pandas as pd
    import ray.data as rd

    from graphene_loader_ray.pipelines.curate import curate_pages
    from graphene_loader_ray.sources.jsonl import read_jsonl_pages
    from graphene_loader_ray.sources.synth import synthesize
    from graphene_loader_ray.sources.warc import read_warc

    fx = synthesize(n_pages=400)

    def paths(sub, suffix):
        d = os.path.join(fx, sub)
        return [os.path.join(d, f) for f in sorted(os.listdir(d))
                if f.endswith(suffix)]

    sources = {
        "parquet": rd.read_parquet(paths("pages", ".parquet")),
        "jsonl": read_jsonl_pages(paths("jsonl", ".jsonl.gz"),
                                  override_num_blocks=4),
        "warc": read_warc(paths("warc", ".warc.gz")),
    }
    outs = {}
    for name, pages in sources.items():
        outs[name] = curate_pages(pages, num_partitions=4).to_pandas() \
            .sort_values("url").reset_index(drop=True)
    assert len(outs["parquet"]) > 100
    pd.testing.assert_frame_equal(outs["parquet"], outs["jsonl"],
                                  check_exact=True)
    pd.testing.assert_frame_equal(outs["parquet"], outs["warc"],
                                  check_exact=True)


def test_kg_jsonl_corrupt_line_quarantined(tmp_path):
    """A corrupted line mid-shard must not lose the rest of the shard or
    crash the pipeline: the line surfaces as one extra quarantined page
    (html=null through the link stage), the page count still counts it,
    and every other page processes — the JSONL analog of
    test_warc_midfile_corruption_resyncs."""
    import shutil

    from graphene_loader_ray.pipelines.kg import run_kg_pipeline
    from graphene_loader_ray.sources.synth import synthesize

    fx = synthesize(n_pages=400)
    fx2 = str(tmp_path / "fixture")
    shutil.copytree(fx, fx2)
    shard_dir = os.path.join(fx2, "jsonl")
    shard = os.path.join(shard_dir,
                         sorted(os.listdir(shard_dir))[0])
    with gzip.open(shard, "rt", encoding="utf-8") as fh:
        lines = fh.read().splitlines()
    lines[3] = lines[3][: len(lines[3]) // 2]      # truncate one record
    with gzip.open(shard, "wt", encoding="utf-8") as fh:
        fh.write("\n".join(lines) + "\n")

    base = run_kg_pipeline(fx, str(tmp_path / "base"),
                           n_page_partitions=2, pages_format="jsonl")
    got = run_kg_pipeline(fx2, str(tmp_path / "corrupt"),
                          n_page_partitions=2, pages_format="jsonl")
    assert got["counters"]["pages"] == base["counters"]["pages"]
    assert (got["counters"]["quarantined_pages"]
            == base["counters"]["quarantined_pages"] + 1)
    # graph output still produced over the surviving pages
    t = pq.read_table(os.path.join(got["graph_dir"], "edges"))
    assert t.num_rows > 0
