"""WARC source: parquet-equivalence roundtrip, record-level random
access via the member index, and corrupt-member quarantine."""

import gzip
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from graphene_loader_ray.sources.synth import synthesize
from graphene_loader_ray.sources.warc import (index_warc, read_warc,
                                              write_warc)


@pytest.fixture(scope="module")
def fixture_dir(ray_session):
    return synthesize(n_pages=400)


def _pages_table(fixture_dir) -> pa.Table:
    d = os.path.join(fixture_dir, "pages")
    return pa.concat_tables(
        [pq.read_table(os.path.join(d, f)) for f in sorted(os.listdir(d))])


def test_warc_roundtrip_equals_parquet(fixture_dir):
    """read_warc over the fixture shards reproduces the pages parquet
    byte-for-byte on (url, warc_ts, html)."""
    import pandas as pd

    got = read_warc(os.path.join(fixture_dir, "warc")).to_pandas()
    assert got["ok"].all() and got["error"].isna().all()
    assert (got["status"] == 200).all()

    want = _pages_table(fixture_dir).select(
        ["url", "warc_ts", "html"]).to_pandas()
    got = got[["url", "warc_ts", "html"]] \
        .sort_values("url").reset_index(drop=True)
    want = want.sort_values("url").reset_index(drop=True)
    got["warc_ts"] = got["warc_ts"].dt.tz_localize(None)
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_warc_index_random_access(fixture_dir):
    """Every indexed span decompresses standalone — the property the
    distributed parse tasks rely on."""
    path = sorted(os.listdir(os.path.join(fixture_dir, "warc")))[0]
    path = os.path.join(fixture_dir, "warc", path)
    spans = index_warc(path)
    assert len(spans) >= 2
    # spans tile the file exactly
    assert spans[0][0] == 0
    for (o1, l1), (o2, _) in zip(spans, spans[1:]):
        assert o1 + l1 == o2
    assert spans[-1][0] + spans[-1][1] == os.path.getsize(path)
    with open(path, "rb") as fh:
        fh.seek(spans[1][0])
        raw = gzip.decompress(fh.read(spans[1][1]))
    assert raw.startswith(b"WARC/1.0\r\n")


def test_warc_corrupt_member_quarantined(fixture_dir, tmp_path):
    """A corrupted member becomes ok=false with an error; intact members
    still parse."""
    src = sorted(os.listdir(os.path.join(fixture_dir, "warc")))[0]
    src = os.path.join(fixture_dir, "warc", src)
    spans = index_warc(src)
    dst = tmp_path / "broken.warc.gz"
    shutil.copy(src, dst)
    # flip bytes inside the SECOND member's deflate stream
    off = spans[1][0] + spans[1][1] // 2
    with open(dst, "r+b") as fh:
        fh.seek(off)
        fh.write(b"\x00\x00\x00\x00")
    got = read_warc([str(dst)]).to_pandas()
    assert (~got["ok"]).sum() >= 1
    assert got.loc[~got["ok"], "error"].notna().all()
    # the first member is before the corruption and must survive
    assert got.loc[0, "ok"]
    n_intact = got["ok"].sum()
    assert n_intact >= 1


def test_write_warc_deterministic(tmp_path):
    t = pa.table({
        "url": pa.array(["https://x.example/a"], pa.string()),
        "warc_ts": pa.array([1_600_000_000_000_000], pa.timestamp("us")),
        "html": pa.array([b"<html>hi</html>"], pa.binary())})
    p1, p2 = tmp_path / "a.warc.gz", tmp_path / "b.warc.gz"
    write_warc(t, str(p1))
    write_warc(t, str(p2))
    assert p1.read_bytes() == p2.read_bytes()
    assert index_warc(str(p1)) == [(0, os.path.getsize(p1))]


def test_kg_from_warc_equals_parquet(fixture_dir, tmp_path):
    """The flagship KG pipeline ingesting the WARC wire format produces
    byte-identical graph outputs (triples, nodes, counters) to the
    parquet path over the same corpus."""
    import pandas as pd

    from graphene_loader_ray.pipelines.kg import run_kg_pipeline

    outs = {}
    for fmt in ("parquet", "warc"):
        res = run_kg_pipeline(fixture_dir, str(tmp_path / fmt),
                              n_page_partitions=2, pages_format=fmt)
        gdir = res["graph_dir"]
        outs[fmt] = {
            "counters": res["counters"],
            "edges": pq.read_table(os.path.join(gdir, "edges")).to_pandas(),
            "nodes": pq.read_table(os.path.join(gdir, "nodes")).to_pandas(),
        }
    assert outs["parquet"]["counters"] == outs["warc"]["counters"]
    for k in ("edges", "nodes"):
        pd.testing.assert_frame_equal(outs["parquet"][k], outs["warc"][k],
                                      check_exact=True)


def test_warc_subsecond_timestamps_roundtrip(tmp_path):
    """WARC-Date carries microseconds — a sub-second warc_ts must
    survive write→read exactly (whole-second formatting would silently
    truncate it)."""
    t = pa.table({
        "url": pa.array(["https://x.example/a"], pa.string()),
        "warc_ts": pa.array([1_600_000_000_123_456], pa.timestamp("us")),
        "html": pa.array([b"<html>x</html>"], pa.binary())})
    p = tmp_path / "sub.warc.gz"
    write_warc(t, str(p))
    got = read_warc([str(p)]).to_pandas()
    assert got.loc[0, "ok"]
    assert got.loc[0, "warc_ts"].value // 1000 == 1_600_000_000_123_456


def test_warc_midfile_corruption_resyncs(fixture_dir, tmp_path):
    """A flipped byte in an EARLY member must not swallow the rest of
    the shard: the index resyncs at the next gzip magic and every later
    intact record still parses."""
    src = sorted(os.listdir(os.path.join(fixture_dir, "warc")))[0]
    src = os.path.join(fixture_dir, "warc", src)
    spans = index_warc(src)
    n_total = len(spans)
    assert n_total >= 10
    dst = tmp_path / "early_corrupt.warc.gz"
    shutil.copy(src, dst)
    off = spans[1][0] + spans[1][1] // 2      # inside member 2 of many
    with open(dst, "r+b") as fh:
        fh.seek(off)
        fh.write(b"\x00\x00\x00\x00")
    got = read_warc([str(dst)]).to_pandas()
    assert (~got["ok"]).sum() >= 1
    # nearly everything after the corruption survives
    assert got["ok"].sum() >= n_total - 2
