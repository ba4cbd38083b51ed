"""JSONL / NDJSON source — the interchange format of web-text corpora
(Common Crawl derivatives, open LLM-pretraining dumps ship as
``*.jsonl[.gz]`` shards, one JSON object per line).

Shape mirrors the repo's other sources (``mysql_dump.py``, ``warc.py``):
distributed per-line read (Ray's ``read_text`` splits files across
tasks), a vectorized fast parse path with a bail-to-careful-path rule,
and the reference's per-record error policy — a malformed line is
QUARANTINED as a row with ``ok = false`` and every requested column
null, never a crash and never a silent drop
(GrameneMongoLoader.groovy:35-38 log-and-skip, upgraded to a queryable
quarantine column exactly like stages/extract.py does for html).

Scale notes: embarrassingly parallel over files/blocks; the fast path is
pyarrow's C JSON parser over each batch of lines re-joined into one
buffer (one allocation, no per-row Python until the parser rejects the
batch); only a batch containing a malformed line falls back to per-line
``json.loads``. Schema is normalized batch-side (missing keys → null,
extra keys dropped, values cast), so downstream blocks are uniform no
matter how heterogeneous the shards are.
"""

from __future__ import annotations

import io
import json

import pyarrow as pa

__all__ = ["read_jsonl", "JSONL_QUARANTINE_COL"]

JSONL_QUARANTINE_COL = "ok"


def _normalize(tbl: pa.Table, schema: pa.Schema, n: int) -> pa.Table:
    """Project ``tbl`` onto ``schema`` + ok=true: missing columns become
    nulls, extra columns are dropped, present columns are cast."""
    cols: dict[str, pa.Array] = {}
    for field in schema:
        if field.name in tbl.column_names:
            cols[field.name] = tbl[field.name].cast(field.type)
        else:
            cols[field.name] = pa.nulls(n, field.type)
    cols[JSONL_QUARANTINE_COL] = pa.array([True] * n, pa.bool_())
    return pa.table(cols)


def _parse_lines_batch(lines: list[str], schema: pa.Schema) -> pa.Table:
    """One batch of raw lines -> normalized table. Fast path: one
    pyarrow.json parse over the whole batch; bail to per-line loads (with
    quarantine rows) only when the C parser rejects the batch."""
    from pyarrow import json as pa_json

    buf = ("\n".join(lines)).encode("utf-8", errors="surrogateescape")
    try:
        raw = pa_json.read_json(io.BytesIO(buf))
        # the C parser silently SKIPS blank lines — that would break the
        # one-row-per-line quarantine contract, so any count mismatch
        # bails to the careful path (which quarantines them). read_text
        # drops empty lines before they reach us, so this is a pure
        # alignment safety net, not the common path.
        if raw.num_rows == len(lines):
            return _normalize(raw, schema, raw.num_rows)
    except (pa.ArrowInvalid, pa.ArrowTypeError,
            pa.ArrowNotImplementedError, UnicodeEncodeError):
        # ArrowNotImplementedError covers schema-violating but
        # well-formed JSON (e.g. a list where the schema wants int64):
        # the cast inside _normalize must bail to the careful path's
        # per-field salvage, not crash the read task
        pass
    # careful path: per-line parse, malformed lines -> quarantine rows
    rows: list[dict] = []
    oks: list[bool] = []
    for ln in lines:
        try:
            obj = json.loads(ln)
            if not isinstance(obj, dict):
                raise ValueError("not an object")
            rows.append(obj)
            oks.append(True)
        except (ValueError, TypeError):
            rows.append({})
            oks.append(False)
    cols: dict[str, pa.Array] = {}
    for field in schema:
        vals = [r.get(field.name) if ok else None
                for r, ok in zip(rows, oks)]
        cols[field.name] = _coerce(vals, field.type)
    cols[JSONL_QUARANTINE_COL] = pa.array(oks, pa.bool_())
    return pa.table(cols)


def _coerce(vals: list, typ: pa.DataType) -> pa.Array:
    """Values -> typed array; a value the type rejects becomes null (the
    per-record policy extends to per-FIELD: one shard's string doc_id must
    not crash the read)."""
    if not any(v is not None for v in vals):
        return pa.nulls(len(vals), typ)
    try:
        return pa.array(vals).cast(typ)
    except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError):
        out = []
        for v in vals:
            try:
                out.append(pa.array([v]).cast(typ)[0].as_py())
            except (pa.ArrowInvalid, pa.ArrowTypeError,
                    pa.ArrowNotImplementedError):
                out.append(None)
        return pa.array(out, typ)


def read_jsonl(paths, schema: pa.Schema, *, gz: bool | str = "auto",
               override_num_blocks: int | None = None):
    """Distributed JSONL read -> Dataset with columns ``schema`` + ``ok``.

    ``schema`` is REQUIRED (a source of record for a pipeline should not
    schema-sniff shards that may disagree); ``gz`` follows the file
    extension when "auto". Small shard sets should pass
    ``override_num_blocks`` (the usual Ray 2.49 ~200-near-empty-blocks
    fan-out guard, see BASELINE.md).
    """
    if isinstance(paths, str):
        paths = [paths]
    lines = _read_lines(paths, gz, override_num_blocks)

    def parse(batch: pa.Table) -> pa.Table:
        return _parse_lines_batch(batch["text"].to_pylist(), schema)

    return lines.map_batches(parse, batch_format="pyarrow",
                             batch_size=4096)


def _read_lines(paths: list[str], gz: bool | str,
                override_num_blocks: int | None):
    """Line Dataset over possibly-MIXED plain/gz shards: compression is
    decided PER FILE under gz="auto" (an all-or-nothing switch would read
    gz shards as raw bytes and silently quarantine every row in them), so
    the path list is split and the two reads unioned."""
    import ray.data as rd

    if gz == "auto":
        gz_paths = [p for p in paths if p.endswith(".gz")]
        plain = [p for p in paths if not p.endswith(".gz")]
    else:
        gz_paths, plain = (paths, []) if gz else ([], paths)
    if not paths:
        raise ValueError("read_jsonl: empty path list")
    parts = []
    for group, is_gz in ((plain, False), (gz_paths, True)):
        if not group:
            continue
        kwargs = {}
        if is_gz:
            kwargs["arrow_open_stream_args"] = {"compression": "gzip"}
        if override_num_blocks is not None:
            kwargs["override_num_blocks"] = override_num_blocks
        parts.append(rd.read_text(group, **kwargs))
    return parts[0] if len(parts) == 1 else parts[0].union(*parts[1:])


def write_jsonl_pages(table: pa.Table, path: str) -> None:
    """Deterministic JSONL dump of a pages shard (url, warc_ts, html) —
    the fixture-writer twin of ``warc.write_warc``. ``html`` bytes are
    base64-encoded (JSON carries no raw bytes; base64 is what web-text
    JSONL dumps with binary payloads use), ``warc_ts`` rides as epoch
    MICROSECONDS (integer — exact round-trip, no ISO parse ambiguity).
    Gzipped when ``path`` ends in ``.gz``. Byte-identical across calls:
    sorted keys, no whitespace variance."""
    import base64
    import datetime as _dt
    import gzip as _gzip

    epoch = _dt.datetime(1970, 1, 1)

    def _us(ts) -> int:
        # exact integer math on the timedelta — datetime.timestamp() on a
        # naive value assumes LOCAL time and floats lose sub-us precision
        td = ts - epoch
        return (td.days * 86_400_000_000 + td.seconds * 1_000_000
                + td.microseconds)

    import contextlib

    rows = table.to_pylist()
    with contextlib.ExitStack() as stack:
        if path.endswith(".gz"):
            # GzipFile via fileobj with mtime=0 (gzip.open has no mtime
            # arg, and a filename arg embeds the basename in the FNAME
            # header): byte-deterministic shards, same reason
            # warc.write_warc pins it. The raw file is closed EXPLICITLY
            # by the stack — GzipFile never closes an external fileobj,
            # so relying on GC could truncate the trailer.
            raw = stack.enter_context(open(path, "wb"))
            gzf = stack.enter_context(
                _gzip.GzipFile(filename="", fileobj=raw, mode="wb",
                               compresslevel=6, mtime=0))
            fh = stack.enter_context(io.TextIOWrapper(gzf,
                                                      encoding="utf-8"))
        else:
            fh = stack.enter_context(open(path, "w", encoding="utf-8"))
        for r in rows:
            ts = r.get("warc_ts")
            if ts is not None and not isinstance(ts, int):
                ts = _us(ts)
            obj = {"url": r.get("url"), "warc_ts_us": ts,
                   "html_b64": (base64.b64encode(r["html"]).decode("ascii")
                                if r.get("html") is not None else None)}
            fh.write(json.dumps(obj, sort_keys=True,
                                separators=(",", ":")) + "\n")


def read_jsonl_pages(paths, override_num_blocks: int | None = None):
    """Read a ``write_jsonl_pages`` dump back to (url, warc_ts, html, ok)
    — the KG pipeline's ``pages_format="jsonl"`` entry point. Malformed
    lines surface as ok=false rows with html null, which the link stage
    quarantines exactly like the parquet/WARC paths (counters must not
    diverge between input formats)."""
    import base64

    schema = pa.schema([("url", pa.string()), ("warc_ts_us", pa.int64()),
                        ("html_b64", pa.string())])
    ds = read_jsonl(paths, schema, override_num_blocks=override_num_blocks)

    def decode(t: pa.Table) -> pa.Table:
        htmls = [None if v is None else base64.b64decode(v)
                 for v in t["html_b64"].to_pylist()]
        return pa.table({
            "url": t["url"],
            "warc_ts": t["warc_ts_us"].cast(pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            JSONL_QUARANTINE_COL: t[JSONL_QUARANTINE_COL]})

    return ds.map_batches(decode, batch_format="pyarrow")
