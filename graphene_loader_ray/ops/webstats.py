"""Per-domain (host) statistics over a Common-Crawl-style page table —
the host-level grouping a web pipeline needs for per-domain page caps,
crawl-politeness audits and domain-level dedup/quality decisions.

Combiner-first: each batch pre-aggregates to one row per (host, lang)
with pyarrow's native ``Table.group_by`` (C++), so the shuffle moves
O(hosts × langs × batches) rows, never O(pages); the host extraction is
a single vectorized RE2 ``extract_regex`` over the url column.
"""

from __future__ import annotations

import re

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


# ------------------------------------------------------- canonicalization

_TRACKING = re.compile(r"^(utm_[^=]*|fbclid|gclid|msclkid)(=|$)")


def canonicalize_urls(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Canonical form for URL-level dedup / frontier keys:

    1. drop the fragment;
    2. lowercase scheme://host[:port] (path case preserved);
    3. strip default ports (http:80 / https:443);
    4. drop tracking params (utm_*, fbclid, gclid, msclkid) and empty
       params, sort the survivors lexicographically (full ``k=v``
       string), drop a bare ``?``.

    URLs with no scheme://authority yield null (quarantine). Steps 1-3
    are single vectorized RE2 kernels; step 4 is per-row Python but ONLY
    over rows that contain a query string (a small fraction of a crawl).
    Userinfo (user:pass@host) URLs are out of scope (the port strip
    requires a single-colon authority). DuckDB-twinnable: lexicographic
    param sort = list_sort on ASCII params, same regexes (Arrow and
    DuckDB both run RE2)."""
    u = pc.replace_substring_regex(urls, pattern=r"#.*$", replacement="")
    parts = pc.extract_regex(
        u, pattern=r"^(?P<head>[^/?#]*://[^/?#]*)(?P<path>[^?#]*)")
    head = pc.utf8_lower(pc.struct_field(parts, "head"))
    head = pc.replace_substring_regex(
        head, pattern=r"^(https://[^/?#:]*):443$", replacement=r"\1")
    head = pc.replace_substring_regex(
        head, pattern=r"^(http://[^/?#:]*):80$", replacement=r"\1")
    base = pc.binary_join_element_wise(head, pc.struct_field(parts, "path"),
                                       "")
    qs = pc.struct_field(pc.extract_regex(u, pattern=r"\?(?P<q>.*)$"), "q")

    out = []
    for b, q in zip(base.to_pylist(), qs.to_pylist()):
        if b is None:
            out.append(None)
            continue
        if q:
            kept = sorted(p for p in q.split("&")
                          if p and not _TRACKING.match(p))
            b = b + "?" + "&".join(kept) if kept else b
        out.append(b)
    return pa.array(out, pa.string())


def url_dedup(pages: Dataset, url_col: str = "url") -> Dataset:
    """One row per canonical URL: a representative original url (min) and
    the variant count — the URL-level exact dedup a crawl ingest runs
    before any content dedup. Combiner-first: canonicalization is a map;
    the shuffle moves one row per (canonical, batch)."""
    from ray.data.aggregate import Min

    def canon(t: pa.Table) -> pa.Table:
        c = canonicalize_urls(t[url_col])
        return pa.table({"canonical_url": c, "url": t[url_col],
                         "n_variants": pa.array([1] * t.num_rows,
                                                pa.int64())}) \
            .filter(pc.is_valid(c))

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by("canonical_url").aggregate(
            [("url", "min"), ("n_variants", "sum")])
        return pa.table({"canonical_url": g["canonical_url"],
                         "url": g["url_min"],
                         "n_variants": g["n_variants_sum"]})

    return pages.map_batches(canon, batch_format="pyarrow") \
        .map_batches(partial, batch_format="pyarrow") \
        .groupby("canonical_url") \
        .aggregate(Min("url", alias_name="url"),
                   Sum("n_variants", alias_name="n_variants"))
