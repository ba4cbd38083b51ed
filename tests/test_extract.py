"""M1 — the extraction invariant: engine text is byte-identical per url to
the pinned reference extractor AND to the generator's text column."""

import pyarrow.parquet as pq
import ray.data as rd

from graphene_loader_ray.functions.text import extract_text, text_sha256
from graphene_loader_ray.stages.extract import extract, good_text


def test_extract_byte_identical(smoke_fixture_dir):
    pages_tbl = pq.read_table(smoke_fixture_dir + "/pages")
    ds = rd.read_parquet(smoke_fixture_dir + "/pages")
    out = extract(ds).to_pandas()
    assert len(out) == pages_tbl.num_rows
    assert set(out.columns) == {"url", "warc_ts", "lang", "text", "ok"}

    # reference extractor applied per-row, single process
    ref = {}
    for url, html in zip(pages_tbl.column("url").to_pylist(),
                         pages_tbl.column("html").to_pylist()):
        ref[url] = extract_text(html)

    gen_text = dict(zip(pages_tbl.column("url").to_pylist(),
                        pages_tbl.column("text").to_pylist()))

    n_bad = 0
    for row in out.itertuples():
        if not row.ok:
            n_bad += 1
            assert ref[row.url] is None
            assert gen_text[row.url] is None
            continue
        # byte-identical: compare SHA-256 of utf-8 bytes per url
        assert text_sha256(row.text) == text_sha256(ref[row.url]), row.url
        assert row.text == gen_text[row.url], row.url
    assert n_bad > 0, "fixture must include malformed rows (quarantine path)"


def test_good_text_filter(smoke_fixture_dir):
    ds = rd.read_parquet(smoke_fixture_dir + "/pages")
    good = good_text(extract(ds))
    n_good = good.count()
    n_all = rd.read_parquet(smoke_fixture_dir + "/pages").count()
    assert 0 < n_good < n_all
