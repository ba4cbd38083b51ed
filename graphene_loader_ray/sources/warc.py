"""WARC source — the actual input format of web-scale crawl corpora
(ISO 28500; Common Crawl layout), Ray-native.

Layout produced/consumed: one gzip MEMBER per WARC record ("response"
records: WARC headers + an HTTP/1.1 response whose body is the page
bytes). Per-record gzip members are the Common Crawl convention that
makes record-level random access possible: a reader can seek to any
member offset and decompress one record without touching the rest of
the file.

Read architecture (the same two-phase shape as
``sources/mysql_dump.py``): an INDEX pass runs one task per file and
emits (path, offset, length) per record — it must walk the gzip stream
once, but decompressed bytes are discarded, so it is IO-bound and tiny;
then PARSE tasks fan out over slices of the record index, each seeking
straight to its members. At corpus scale the index rows (3 ints + a
path per record) are the only thing shuffled — page payloads go
straight from file slices into Arrow blocks.

Corrupt members (bad gzip, truncated record, malformed headers) become
``ok=false`` quarantine rows carrying the error — the per-record error
policy every source in this repo follows (SURVEY.md §2 S3).
"""

from __future__ import annotations

import gzip
import io
import os
import zlib

import pyarrow as pa

from ray.data import Dataset

_CRLF = b"\r\n"


# ------------------------------------------------------------------ writer

def _iso(ts_us: int) -> str:
    """WARC-Date with microsecond precision (WARC 1.1 allows fractional
    seconds) — whole-second formatting would silently truncate sub-second
    timestamps through a write→read roundtrip."""
    import datetime as dt
    t = dt.datetime.fromtimestamp(ts_us / 1e6, dt.timezone.utc)
    return t.strftime("%Y-%m-%dT%H:%M:%S.%fZ")


def write_warc(pages: pa.Table, out_path: str) -> int:
    """Write one ``.warc.gz`` file (one gzip member per record) from a
    pages table with ``url``, ``warc_ts`` (timestamp[us]) and ``html``
    (binary) columns. Deterministic bytes (gzip mtime pinned to 0).
    Returns the record count."""
    n = pages.num_rows
    urls = pages["url"].to_pylist()
    tss = pages["warc_ts"].cast(pa.int64()).to_pylist()
    htmls = pages["html"].to_pylist()
    with open(out_path, "wb") as out:
        for url, ts, html in zip(urls, tss, htmls):
            html = html or b""
            http = (b"HTTP/1.1 200 OK" + _CRLF
                    + b"Content-Type: text/html; charset=utf-8" + _CRLF
                    + b"Content-Length: " + str(len(html)).encode() + _CRLF
                    + _CRLF + html)
            rec = (b"WARC/1.0" + _CRLF
                   + b"WARC-Type: response" + _CRLF
                   + b"WARC-Target-URI: " + url.encode() + _CRLF
                   + b"WARC-Date: " + _iso(ts).encode() + _CRLF
                   + b"Content-Type: application/http; msgtype=response"
                   + _CRLF
                   + b"Content-Length: " + str(len(http)).encode() + _CRLF
                   + _CRLF + http + _CRLF + _CRLF)
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(rec)
            out.write(buf.getvalue())
    return n


# ------------------------------------------------------------------- index

_GZ_MAGIC = b"\x1f\x8b\x08"


def index_warc(path: str, chunk_size: int = 1 << 20) -> list[tuple[int,
                                                                   int]]:
    """(offset, length) of every gzip member in ``path``. One streaming
    decompress-and-discard walk in ``chunk_size`` reads (constant memory,
    no O(file²) buffer copies), parallelized one task per file.

    A corrupt member does NOT swallow the rest of the shard: the walk
    emits the bad bytes as one span (the parse task turns it into an
    ok=false quarantine row) and RESYNCS at the next gzip magic
    (``1f 8b 08``), so every intact member after a flipped byte still
    parses. A truncated final member surfaces the same way."""
    spans: list[tuple[int, int]] = []
    size = os.path.getsize(path)
    with open(path, "rb") as fh:
        member_start = 0
        buf = b""                 # unconsumed bytes; buf[0] is at buf_off
        buf_off = 0
        fed_any = False
        d = zlib.decompressobj(wbits=31)
        while True:
            if not buf:
                buf = fh.read(chunk_size)
                if not buf:
                    if fed_any:   # mid-member EOF: truncated final member
                        spans.append((member_start, size - member_start))
                    break
            try:
                d.decompress(buf)
            except zlib.error:
                # resync: find the next member magic strictly after the
                # failing member's start and continue from there. Search
                # from member_start+1, NOT from the failing chunk: the
                # decompressor may consume whole chunks of a corrupt
                # member before erroring, and an intact member whose
                # magic lies in that already-consumed region would
                # otherwise be folded into the quarantined span. The
                # rescan cost is bounded by one member.
                resync = -1
                search_from = member_start + 1
                fh.seek(search_from)
                window = b""
                pos = search_from
                while True:
                    block = fh.read(chunk_size)
                    if not block:
                        break
                    window = window[-2:] + block   # magic may straddle
                    hit = window.find(_GZ_MAGIC)
                    if hit != -1:
                        # window starts (len(window)-len(block)) bytes
                        # before the current block's file position
                        resync = pos - (len(window) - len(block)) + hit
                        break
                    pos += len(block)
                if resync == -1:
                    spans.append((member_start, size - member_start))
                    break
                spans.append((member_start, resync - member_start))
                member_start = resync
                fh.seek(resync)
                buf, buf_off = b"", resync
                fed_any = False
                d = zlib.decompressobj(wbits=31)
                continue
            fed_any = True
            consumed = len(buf) - len(d.unused_data)
            buf_off += consumed
            buf = d.unused_data   # bounded by chunk_size, never the file
            if d.eof:
                spans.append((member_start, buf_off - member_start))
                member_start = buf_off
                d = zlib.decompressobj(wbits=31)
                fed_any = False
    return spans


# ------------------------------------------------------------------- parse

def _parse_record(raw: bytes) -> dict:
    """One decompressed WARC record → row dict (raises on malformed)."""
    head_end = raw.index(_CRLF + _CRLF)
    headers = {}
    lines = raw[:head_end].split(_CRLF)
    if not lines[0].startswith(b"WARC/"):
        raise ValueError("missing WARC/ magic")
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        headers[k.strip().lower()] = v.strip()
    clen = int(headers[b"content-length"])
    body = raw[head_end + 4:head_end + 4 + clen]
    if len(body) != clen:
        raise ValueError("short record body")
    # HTTP response: status line, headers, payload
    http_head_end = body.index(_CRLF + _CRLF)
    status = int(body.split(_CRLF, 1)[0].split(b" ")[1])
    payload = body[http_head_end + 4:]
    import datetime as dt
    raw_date = headers[b"warc-date"].decode()
    fmt = "%Y-%m-%dT%H:%M:%S.%fZ" if "." in raw_date \
        else "%Y-%m-%dT%H:%M:%SZ"
    ts = dt.datetime.strptime(raw_date, fmt) \
        .replace(tzinfo=dt.timezone.utc)
    return {"url": headers[b"warc-target-uri"].decode(),
            # integer µs since epoch: float .timestamp()*1e6 rounds some
            # microsecond fractions
            "warc_ts": (ts - dt.datetime(1970, 1, 1,
                                         tzinfo=dt.timezone.utc))
            // dt.timedelta(microseconds=1),
            "status": status, "html": payload}


def read_warc(paths: str | list[str], records_per_block: int = 2048,
              index_parallelism: int | None = None) -> Dataset:
    """Distributed WARC read → Dataset(url, warc_ts timestamp[us],
    status int64, html binary, ok bool, error string). ``paths`` is a
    directory of ``.warc.gz`` files or an explicit list."""
    import ray.data as rd

    if isinstance(paths, str):
        paths = [os.path.join(paths, f) for f in sorted(os.listdir(paths))
                 if f.endswith(".warc.gz")]
    files = rd.from_items([{"path": p} for p in paths],
                          override_num_blocks=max(1, len(paths)))

    def index_batch(t: pa.Table) -> pa.Table:
        rows = {"path": [], "offset": [], "length": []}
        for p in t["path"].to_pylist():
            for off, ln in index_warc(p):
                rows["path"].append(p)
                rows["offset"].append(off)
                rows["length"].append(ln)
        return pa.table({"path": pa.array(rows["path"], pa.string()),
                         "offset": pa.array(rows["offset"], pa.int64()),
                         "length": pa.array(rows["length"], pa.int64())})

    idx = files.map_batches(index_batch, batch_format="pyarrow")

    def parse_batch(t: pa.Table) -> pa.Table:
        out = {"url": [], "warc_ts": [], "status": [], "html": [],
               "ok": [], "error": []}
        by_path: dict[str, list[tuple[int, int]]] = {}
        order: list[tuple[str, int, int]] = []
        for p, off, ln in zip(t["path"].to_pylist(),
                              t["offset"].to_pylist(),
                              t["length"].to_pylist()):
            by_path.setdefault(p, []).append((off, ln))
            order.append((p, off, ln))
        cache: dict[tuple[str, int], dict | Exception] = {}
        for p, spans in by_path.items():
            with open(p, "rb") as fh:
                for off, ln in sorted(spans):
                    fh.seek(off)
                    raw = fh.read(ln)
                    try:
                        cache[(p, off)] = _parse_record(
                            gzip.decompress(raw))
                    except Exception as ex:   # quarantine, never crash
                        cache[(p, off)] = ex
        for p, off, _ in order:
            r = cache[(p, off)]
            if isinstance(r, Exception):
                out["url"].append(None)
                out["warc_ts"].append(None)
                out["status"].append(None)
                out["html"].append(None)
                out["ok"].append(False)
                out["error"].append(f"{type(r).__name__}: {r}")
            else:
                out["url"].append(r["url"])
                out["warc_ts"].append(r["warc_ts"])
                out["status"].append(r["status"])
                out["html"].append(r["html"])
                out["ok"].append(True)
                out["error"].append(None)
        return pa.table({
            "url": pa.array(out["url"], pa.string()),
            "warc_ts": pa.array(out["warc_ts"], pa.timestamp("us")),
            "status": pa.array(out["status"], pa.int64()),
            "html": pa.array(out["html"], pa.binary()),
            "ok": pa.array(out["ok"], pa.bool_()),
            "error": pa.array(out["error"], pa.string())})

    return idx.map_batches(parse_batch, batch_format="pyarrow",
                           batch_size=records_per_block)
