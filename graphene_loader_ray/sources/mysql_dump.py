r"""MySQL-dump source — the reference's actual input format, Ray-native.

The reference parses the Plant-Reactome MySQL dump itself with a
line-oriented 6-state machine and re-reads the file per table
(/root/reference/src/main/groovy/graphene/LoadMysqlDump.groovy:34-146
states and transitions, :148-249 row iterator). A user of the reference
holds .sql dumps, not parquet — this module lets them switch:

  schema scan (driver, ONE sequential pass):
      the same state machine — BEFORE_CREATE → CREATE → COLUMN_DEFS →
      BEFORE_VALUES → VALUES → TABLE_DONE — but instead of buffering rows
      it records, per table, the column map and the BYTE RANGES of its
      INSERT lines (the dump must be scanned at least once; the scan does
      only prefix checks + offset arithmetic).
  distributed parse:
      the byte ranges become read tasks — ``map_batches`` over a ranges
      Dataset; each task seeks into the file, reads only its slice, and
      parses tuples into an Arrow table. Parallelism = number of INSERT
      lines (mysqldump emits many bounded-size INSERT lines per table),
      so a 100 TB dump scans wide with no driver materialization.

Row semantics mirrored exactly (same file:line cites):
  - table name = CREATE line chars [14:-3]  (TableBuilder.getTableName)
  - column names = backtick-delimited substring of each ``  `col` …``
    line; the FIRST line after CREATE is always treated as a column def
    (updateState falls through CREATE→COLUMN_DEFS before the prefix
    check)
  - a table whose VALUES never appear is dropped (``if
    (tableInfo.linesWithData)``)
  - the bail rule: hitting ``-- Table structure for table \`` mid-table
    closes the current table
  - INSERT lines split on ``),(``; first tuple loses everything through
    its first ``(``, last tuple its trailing ``);``  (DumpIterator)
  - tuples parse as CSV with ',' delimiter, ``'`` quote char and ``\\``
    escape (opencsv ``CSVParser((char)',', (char)'\\'')``); every value
    is a STRING; SQL NULL arrives as the literal string ``"NULL"``
  - charset ISO-8859-1 (LoadMysqlDump.CHARSET)

One deliberate deviation: the line that closes a VALUES run moves straight
to BEFORE_CREATE here, so a ``CREATE TABLE`` on the very next line is
recognized; the reference burns that line in its TABLE_DONE state and
would drop such a table. Real mysqldump output never exercises the
difference (UNLOCK TABLES / banner / blank lines always intervene), and
recognizing the table is the safer behavior for hand-built dumps.

``cast_dump_table`` converts that all-strings surface to a typed Arrow
schema ("NULL" → null + cast) for pipelines that want typed columns.
"""

from __future__ import annotations

import csv
import io
import os
from dataclasses import dataclass, field

import pyarrow as pa

import ray.data as rd
from ray.data import Dataset

CHARSET = "iso-8859-1"


@dataclass
class DumpTable:
    name: str
    columns: list[str]
    # byte ranges [(start, end), ...] of this table's INSERT lines
    ranges: list[tuple[int, int]] = field(default_factory=list)


def scan_dump_schema(path: str) -> dict[str, DumpTable]:
    """ONE sequential driver pass: table → (columns, INSERT byte ranges).
    The reference's TablesParser state machine with offsets instead of
    line numbers."""
    tables: dict[str, DumpTable] = {}
    state = "BEFORE_CREATE"
    cur_name: str | None = None
    col_defs: list[str] = []
    ranges: list[tuple[int, int]] = []

    def close_table() -> None:
        nonlocal cur_name, col_defs, ranges
        if cur_name is not None and ranges:          # no-data tables dropped
            cols = [d[d.index("`") + 1:d.rindex("`")] for d in col_defs]
            tables[cur_name] = DumpTable(cur_name, cols, ranges)
        cur_name, col_defs, ranges = None, [], []

    offset = 0
    with open(path, "rb") as fh:
        for raw in fh:
            start = offset
            offset += len(raw)
            line = raw.decode(CHARSET).rstrip("\r\n")
            # bail rule: next table's banner closes an unfinished table
            if state != "BEFORE_CREATE" and \
                    line.startswith("-- Table structure for table `"):
                close_table()
                state = "BEFORE_CREATE"
            if state == "BEFORE_CREATE":
                if line.startswith("CREATE TABLE"):
                    cur_name = line[14:-3]           # getTableName
                    state = "CREATE"
            elif state == "CREATE":
                # first line after CREATE is unconditionally a column def
                col_defs.append(line)
                state = "COLUMN_DEFS"
            elif state == "COLUMN_DEFS":
                if line.startswith("  `"):
                    col_defs.append(line)
                else:
                    # single-step transition like the reference's assert:
                    # an INSERT on THIS line is not recorded (it only moves
                    # COLUMN_DEFS → BEFORE_VALUES); real dumps always have
                    # the ") ENGINE…" line between
                    state = "BEFORE_VALUES"
            elif state == "BEFORE_VALUES":
                if line.startswith("INSERT INTO"):
                    ranges.append((start, offset))
                    state = "VALUES"
            elif state == "VALUES":
                if line.startswith("INSERT INTO"):
                    ranges.append((start, offset))
                else:
                    close_table()
                    state = "BEFORE_CREATE"
    close_table()
    return tables


def parse_insert_line(line: str, n_cols: int) -> list[list[str]]:
    """One INSERT line -> rows of n_cols strings (DumpIterator + opencsv
    semantics; malformed tuples are skipped like the reference's
    log-and-continue)."""
    body = line.rstrip("\r\n")
    tuples = body.split("),(")
    if not tuples:
        return []
    tuples[0] = tuples[0][tuples[0].index("(") + 1:]
    tuples[-1] = tuples[-1][:-2]                     # strip ");"
    out: list[list[str]] = []
    for t in tuples:
        vals = next(csv.reader(io.StringIO(t), delimiter=",",
                               quotechar="'", escapechar="\\",
                               doublequote=False))
        if len(vals) == n_cols:
            out.append(vals)
    return out


def read_mysql_dump(path: str, table: str,
                    schema: dict[str, DumpTable] | None = None,
                    lines_per_task: int = 8,
                    with_order: bool = False,
                    columns: list[str] | None = None) -> Dataset:
    """Distributed scan of one dump table -> Dataset of all-STRING columns
    (the reference's row surface: every value a string, NULL literal).

    ``lines_per_task`` groups INSERT-line byte ranges into read tasks;
    mysqldump bounds INSERT lines to ~1 MB (net_buffer_length), so a task
    reads ≤ lines_per_task MB and the task count grows with the dump.

    ``with_order=True`` appends ``_off`` (INSERT-line start byte) and
    ``_row`` (tuple index within the line) int64 columns — a total order
    over the table's rows identical to the reference's sequential read,
    used by consumers that must reproduce last-writer-wins semantics
    under parallel execution (pipelines/dump_graph.py).

    ``columns`` renames the scanned column map positionally (the decorator
    renames of ReactomeLoader.groovy:128-134); len must match."""
    tbl = (schema or scan_dump_schema(path))[table]
    cols, n_cols = tbl.columns, len(tbl.columns)
    if columns is not None:
        if len(columns) != n_cols:      # loud under -O too (not an assert)
            raise ValueError(
                f"columns rename for {table!r} has {len(columns)} names "
                f"but the dump declares {n_cols} columns")
        cols = columns
    groups = [tbl.ranges[i:i + lines_per_task]
              for i in range(0, len(tbl.ranges), lines_per_task)]
    ranges_ds = rd.from_items([
        {"start": g[0][0], "end": g[-1][1],
         "starts": [s for s, _ in g], "ends": [e for _, e in g]}
        for g in groups])

    def parse_ranges(batch: pa.Table) -> pa.Table:
        rows: list[list[str]] = []
        offs: list[int] = []
        rowidx: list[int] = []
        with open(path, "rb") as fh:
            for starts, ends in zip(batch["starts"].to_pylist(),
                                    batch["ends"].to_pylist()):
                for s, e in zip(starts, ends):
                    fh.seek(s)
                    line = fh.read(e - s).decode(CHARSET)
                    parsed = parse_insert_line(line, n_cols)
                    rows.extend(parsed)
                    if with_order:
                        offs.extend([s] * len(parsed))
                        rowidx.extend(range(len(parsed)))
        out_cols = list(cols) + (["_off", "_row"] if with_order else [])
        if not rows:
            return pa.table({c: pa.array([], pa.int64() if c in ("_off", "_row")
                                         else pa.string()) for c in out_cols})
        arrays = [pa.array([r[i] for r in rows], pa.string())
                  for i in range(n_cols)]
        if with_order:
            arrays += [pa.array(offs, pa.int64()), pa.array(rowidx, pa.int64())]
        return pa.table(dict(zip(out_cols, arrays)))

    return ranges_ds.map_batches(parse_ranges, batch_format="pyarrow",
                                 batch_size=1)


def cast_dump_table(ds: Dataset, target: pa.Schema) -> Dataset:
    """All-strings dump surface -> typed schema: literal "NULL" becomes
    null, then each column casts to the target type (the typed twin of
    the reference's on-demand digit promotion)."""
    import pyarrow.compute as pc

    def cast(batch: pa.Table) -> pa.Table:
        out = {}
        for fld in target:
            col = batch[fld.name]
            col = pc.if_else(pc.equal(col, "NULL"),
                             pa.nulls(len(col), pa.string()), col)
            out[fld.name] = pc.cast(col, fld.type)
        return pa.table(out, schema=target)

    return ds.map_batches(cast, batch_format="pyarrow")


# ----------------------------------------------------------------- writer

def write_mysql_dump(tables: dict[str, pa.Table], path: str,
                     rows_per_insert: int = 50) -> None:
    """mysqldump-shaped writer (fixture/test helper): CREATE TABLE with
    backticked column defs, multi-row INSERT lines, ' quoting with \\
    escapes, NULL literals, ISO-8859-1."""

    def sql_val(v) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, bool):
            return "1" if v else "0"
        if isinstance(v, (int, float)):
            return str(v)
        s = str(v).replace("\\", "\\\\").replace("'", "\\'")
        return f"'{s}'"

    with open(path, "w", encoding=CHARSET, errors="replace") as fh:
        for name, t in tables.items():
            fh.write(f"-- Table structure for table `{name}`\n")
            fh.write(f"CREATE TABLE `{name}` (\n")
            for fld in t.schema:
                fh.write(f"  `{fld.name}` varchar(255) DEFAULT NULL,\n")
            fh.write(f"  PRIMARY KEY (`{t.schema[0].name}`)\n);\n")
            fh.write(f"-- Dumping data for table `{name}`\n")
            rows = t.to_pylist()
            for i in range(0, len(rows), rows_per_insert):
                chunk = rows[i:i + rows_per_insert]
                tuples = ",".join(
                    "(" + ",".join(sql_val(r[f.name]) for f in t.schema) + ")"
                    for r in chunk)
                fh.write(f"INSERT INTO `{name}` VALUES {tuples};\n")
            fh.write("UNLOCK TABLES;\n")
