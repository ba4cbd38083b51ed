"""Stage 1 — text extraction over the pages Dataset.

``read_parquet(pages) → map_batches(extract_batch, batch_format="pyarrow")``.

Semantics:
  - per-row canonical text via the pinned reference extractor
    (functions/text.py); the engine output must be byte-identical per url
    (BASELINE.json input_hint; asserted in tests/test_extract.py)
  - rows that fail extraction are NOT dropped silently and do NOT crash the
    stage: they come out with ``ok = false`` (the reference's per-record
    log-and-skip policy, GrameneMongoLoader.groovy:35-38, upgraded to a
    queryable quarantine column)
  - the wide ``html`` binary column is projected away in the same batch fn
    ("project early", SURVEY.md §7.4) so downstream blocks stay narrow.

Scale notes: the batch function is stateless → plain tasks; the per-row
regex work is compiled-RE2/``re`` bound (decode + search over bytes), the
Python loop only dispatches it. At 100 TB the stage is embarrassingly
parallel over parquet files/row groups; nothing here materializes.
"""

from __future__ import annotations

import pyarrow as pa

from ..functions.text import extract_text

EXTRACTED_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("lang", pa.string()),
    ("text", pa.large_string()),     # large_string: >2 GiB column chunks at scale
    ("ok", pa.bool_()),
])


def extract_batch(batch: pa.Table) -> pa.Table:
    html_col = batch.column("html")
    texts: list[str | None] = []
    oks: list[bool] = []
    for chunk in html_col.chunks if isinstance(html_col, pa.ChunkedArray) else [html_col]:
        for v in chunk:
            t = extract_text(v.as_py())
            texts.append(t)
            oks.append(t is not None)

    def opt(name: str, typ: pa.DataType):
        # warc_ts / lang are passthrough metadata the parquet fixtures
        # carry but crawl wire formats (WARC status lines, JSONL dumps)
        # may not — absent columns ride as nulls so any (url, html)
        # source feeds this stage (and curate_pages) directly
        return (batch.column(name).cast(typ)
                if name in batch.column_names
                else pa.nulls(batch.num_rows, typ))

    return pa.table({
        "url": batch.column("url"),
        "warc_ts": opt("warc_ts", pa.timestamp("us")),
        "lang": opt("lang", pa.string()),
        "text": pa.array(texts, pa.large_string()),
        "ok": pa.array(oks, pa.bool_()),
    }, schema=EXTRACTED_SCHEMA)


def extract(pages_ds, batch_size: int = 1024):
    """pages Dataset -> extracted Dataset (url, warc_ts, lang, text, ok).

    ``batch_size`` is deliberately modest: html is the wide column and a
    batch x concurrency worth of raw pages must fit each worker heap.
    """
    return pages_ds.map_batches(extract_batch, batch_format="pyarrow",
                                batch_size=batch_size, zero_copy_batch=True)


def good_text(extracted_ds):
    """Filter to successfully extracted rows (vectorized mask, not ds.filter(row_fn))."""
    return extracted_ds.map_batches(
        lambda t: t.filter(t.column("ok")), batch_format="pyarrow")
