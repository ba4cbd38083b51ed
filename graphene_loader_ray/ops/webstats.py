"""Per-domain (host) statistics over a Common-Crawl-style page table —
the host-level grouping a web pipeline needs for per-domain page caps,
crawl-politeness audits and domain-level dedup/quality decisions.

Combiner-first: each batch pre-aggregates to one row per (host, lang)
with pyarrow's native ``Table.group_by`` (C++), so the shuffle moves
O(hosts × langs × batches) rows, never O(pages); the host extraction is
a single vectorized RE2 ``extract_regex`` over the url column.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ray.data import Dataset
from ray.data.aggregate import Count, Sum

_HOST_PATTERN = r"^[a-z][a-z0-9+.-]*://(?P<host>[^/?#]+)"


def extract_host(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """scheme://host[/...] -> host (null when the url has no scheme)."""
    s = pc.extract_regex(urls, pattern=_HOST_PATTERN)
    return pc.struct_field(s, "host")


def domain_stats(pages: Dataset, url_col: str = "url",
                 payload_col: str = "html",
                 lang_col: str = "lang") -> Dataset:
    """One row per host: n_pages, n_langs (distinct), n_bytes (sum of
    payload sizes). Pages whose url yields no host are dropped (they are
    the quarantine path's concern, not the stats')."""

    def partials(t: pa.Table) -> pa.Table:
        host = extract_host(t[url_col])
        nb = pc.cast(pc.binary_length(t[payload_col]), pa.int64())
        g = pa.table({"host": host, "lang": t[lang_col], "n_bytes": nb}) \
            .filter(pc.is_valid(host)) \
            .group_by(["host", "lang"]) \
            .aggregate([("n_bytes", "sum"), ("host", "count")])
        return pa.table({"host": g["host"], "lang": g["lang"],
                         "n_bytes": g["n_bytes_sum"],
                         "n_pages": g["host_count"]})

    per_host_lang = pages.map_batches(partials, batch_format="pyarrow") \
        .groupby(["host", "lang"]) \
        .aggregate(Sum("n_bytes", alias_name="n_bytes"),
                   Sum("n_pages", alias_name="n_pages"))
    out = per_host_lang.groupby("host") \
        .aggregate(Sum("n_pages", alias_name="n_pages"),
                   Count(alias_name="n_langs"),
                   Sum("n_bytes", alias_name="n_bytes"))
    return out.map_batches(
        lambda t: t.select(["host", "n_pages", "n_langs", "n_bytes"]),
        batch_format="pyarrow")
