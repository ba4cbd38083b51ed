"""Single-process oracle for the convention-driven dump loader.

A faithful, sequential port of the reference's ReactomeLoader flow
(/root/reference/src/main/groovy/graphene/loaders/ReactomeLoader.groovy),
driven ONLY by the name-convention classifier (kb/dump_conventions.py) over
the dump's scanned column maps — no static manifest. The Ray engine
(pipelines/dump_graph.py) must EQUAL this oracle's output exactly
(tests/test_dump_graph.py).

Flow (ReactomeLoader.groovy:20-43 ``load``):
  1. special.DatabaseObject -> one node per row: labels [_class, Reactome],
     props {name: _displayName}                         (:45-66)
  2. the same table again -> 1:m relationships for the ``created`` and
     ``stableIdentifier`` columns                       (:68-78)
  3. decorators -> extra label (= table name), scalar props (digit-promoted,
     '' and 'NULL' skipped), relationships from ``_class``-twin columns;
     DatabaseIdentifier/ReferenceEntity/GO_* rows also feed the
     cross-loader registry                              (:119-173)
  4. newnodes -> mint (label=Prop.capitalize(), name) nodes and link with a
     rank-carrying dynamic relationship                 (:176-212)
  5. relationships -> pure edge tables                  (:214-238)

Relationship semantics (:260-280 ``addRelationships``): a ``<rship>_rank``
column with a truthy value marks m:m (edge prop rank=int); otherwise m:1 —
the TARGET's name is denormalized onto the source as ``<rship>Name`` and
the edge carries no props.

Documented deviations, shared with the engine (both sides implement the
SAME rule, so parity stays exact):
  - quarantine-and-count instead of crash for unparseable DB_IDs, dangling
    references, missing nodes, and bad ranks (the repo's S3 error policy;
    the reference throws from Long.valueOf / BatchInserter)
  - the m:1 denormalized name is the target's ORIGINAL DatabaseObject
    ``_displayName`` (phase-1 state), not "name as of this row" — the
    reference's value depends on dump-file table order when a decorator
    overwrites ``name`` (DatabaseIdentifier/ReferenceEntity identifier
    rename); a parallel engine needs an order-free rule (SURVEY §7.4)
  - physical Neo4j ids are replaced by content-derived keys
    (kb/dump_conventions.dump_node_key, kb/spec.node_key), and output is
    canonically sorted — the kb/spec.py identity model
  - duplicate DatabaseObject DB_IDs: first row wins + counter (the
    reference's BatchInserter.createNode(id, ...) throws on reuse)

Prop-write conflicts resolve LAST-WRITER-WINS in reference processing order
(phase, table order within phase, row order) — exactly the sequential
semantics of setNodeProperties/putAll; the engine reproduces it with
order-stamped emissions, not a global sequential pass.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field

from ..kb import dump_conventions as conv
from ..kb.spec import node_key, promote_digits, props_json
from ..sources.mysql_dump import CHARSET, DumpTable, parse_insert_line, scan_dump_schema


@dataclass
class _Node:
    primary: str
    extras: set[str] = field(default_factory=set)
    props: dict = field(default_factory=dict)

    def labels(self) -> tuple[str, ...]:
        return (self.primary, *sorted(self.extras - {self.primary}))


def _rows(path: str, tbl: DumpTable, columns: list[str] | None = None):
    """Sequential row iterator over one dump table (the reference re-reads
    the file per table, LoadMysqlDump.groovy:148-249)."""
    cols = columns if columns is not None else tbl.columns
    n = len(tbl.columns)
    with open(path, "rb") as fh:
        for s, e in tbl.ranges:
            fh.seek(s)
            line = fh.read(e - s).decode(CHARSET)
            for vals in parse_insert_line(line, n):
                yield dict(zip(cols, vals))


def load_dump_graph_oracle(path: str) -> dict:
    """Run the full convention-driven load sequentially; returns
    ``{"nodes": {key: (labels, props_json)}, "edges": sorted [(subj, pred,
    obj, props_json)], "registry": {(label, key): node_key},
    "counters": {...}}``."""
    schema = scan_dump_schema(path)
    kinds = conv.classify_tables(schema)

    nodes: dict[str, _Node] = {}
    edges: list[tuple[str, str, str, str | None]] = []
    registry: dict[tuple[str, str], str] = {}
    counters: Counter = Counter()
    names: dict[int, str | None] = {}        # DB_ID -> _displayName (phase 1)

    def add_relationships(key: str, row: dict, rships, cols) -> None:
        # ReactomeLoader.groovy:260-280
        for rship in rships:
            v = row.get(rship)
            if not v or v == "NULL":
                continue
            rel = conv.parse_db_id(v)
            if rel is None:
                counters["bad_ref"] += 1
                continue
            if rel not in names:
                counters["dangling_ref"] += 1
                continue
            rank_col = rship + "_rank"
            pred = conv.camel_to_constant(rship)
            if rank_col in cols and row.get(rank_col):
                rank = conv.parse_db_id(row[rank_col])   # Integer.valueOf
                if rank is None:
                    counters["bad_rank"] += 1
                    continue
                edges.append((key, pred, conv.dump_node_key(rel),
                              props_json({"rank": rank})))
            else:
                # m:1 — denormalize the target's name onto the source
                nodes[key].props[rship + "Name"] = names[rel]
                edges.append((key, pred, conv.dump_node_key(rel), None))

    # ---- phase 1: DatabaseObject nodes (ReactomeLoader.groovy:45-66)
    if "DatabaseObject" not in kinds["special"]:
        raise ValueError("dump has no DatabaseObject table")
    base = schema["DatabaseObject"]
    for row in _rows(path, base):
        db_id = conv.parse_db_id(row.get("DB_ID"))
        if db_id is None:
            counters["bad_id"] += 1
            continue
        cls = row.get("_class")
        if not cls:
            counters["bad_class"] += 1
            continue
        key = conv.dump_node_key(db_id)
        if key in nodes:
            counters["duplicate_db_id"] += 1
            continue
        disp = row.get("_displayName")
        nodes[key] = _Node(primary=cls, extras={conv.BASE_LABEL},
                           props={} if disp is None else {"name": disp})
        names[db_id] = disp

    # ---- phase 2: 1:m rels from the node table (:68-78; asserts mirrored)
    for col in conv.NODE_TABLE_RSHIPS:
        if col not in base.columns:
            raise ValueError(f"DatabaseObject lacks required column {col!r}")
    for row in _rows(path, base):
        db_id = conv.parse_db_id(row.get("DB_ID"))
        if db_id is None:
            counters["bad_id"] += 1
            continue
        key = conv.dump_node_key(db_id)
        if key not in nodes:
            counters["missing_node"] += 1
            continue
        add_relationships(key, row, conv.NODE_TABLE_RSHIPS, base.columns)

    # ---- phase 3: decorators (:119-173)
    for tname in kinds["decorators"]:
        tbl = schema[tname]
        cols = conv.decorator_columns(tname, tbl.columns)
        cache_ref = tname in conv.REGISTRY_BY_NAME_TABLES
        cache_go = tname.startswith(conv.GO_TABLE_PREFIX)
        rships = conv.find_relationships(cols)
        props = conv.find_props(cols, rships)
        for row in _rows(path, tbl, columns=cols):
            db_id = conv.parse_db_id(row.get("DB_ID"))
            if db_id is None:
                counters["bad_id"] += 1
                continue
            if not db_id:                      # Groovy `if (!id)` — 0 falsy
                counters["no_id"] += 1
                continue
            key = conv.dump_node_key(db_id)
            if key not in nodes:
                counters["missing_node"] += 1
                continue
            if cache_ref:
                reg = row.get("name")
                if reg is not None:
                    registry[(tname, reg)] = key
            elif cache_go:
                acc = conv.parse_db_id(row.get("id"))   # Integer.parseInt
                if acc is None:
                    counters["bad_accession"] += 1
                else:
                    registry[(tname, str(acc))] = key   # zero-strip (:158)
            nodes[key].extras.add(tname)                # addLabel (:163)
            for p in props:                             # addProperties (:248)
                v = row.get(p)
                if v and v != "NULL":
                    nodes[key].props[p] = promote_digits(v)
            add_relationships(key, row, rships, cols)

    # ---- phase 4: newnodes (:176-212)
    for tname in kinds["newnodes"]:
        tbl = schema[tname]
        cols = tbl.columns
        if len(cols) != 3:
            raise ValueError(f"newnodes table {tname} has {len(cols)} columns")
        props = conv.find_props(cols)
        if len(props) != 1 or props[0] + "_rank" not in cols:
            raise ValueError(f"newnodes table {tname} breaks the "
                             "(DB_ID, prop, prop_rank) convention")
        prop = props[0]
        label = conv.capitalize_first(prop)
        pred = conv.camel_to_constant(prop)
        for row in _rows(path, tbl):
            db_id = conv.parse_db_id(row.get("DB_ID"))
            if db_id is None:
                counters["bad_id"] += 1
                continue
            if not db_id:                      # Groovy `if (!id)` (:194)
                counters["no_id"] += 1
                continue
            name = row.get(prop)
            if not name:                                # :200-203
                counters["empty_name"] += 1
                continue
            key = conv.dump_node_key(db_id)
            if key not in nodes:
                counters["missing_node"] += 1
                continue
            nk = node_key(label, name)
            if nk not in nodes:                         # NodeCache.getOrCreate
                nodes[nk] = _Node(primary=label, extras={conv.BASE_LABEL},
                                  props={"name": name})
            else:
                nodes[nk].extras.add(conv.BASE_LABEL)
                nodes[nk].props["name"] = name
            # rank stays a RAW STRING here (:208) — unlike addRelationships
            edges.append((key, pred, nk,
                          props_json({"rank": row.get(prop + "_rank")})))

    # ---- phase 5: relationships (:214-238)
    for tname in kinds["relationships"]:
        tbl = schema[tname]
        cols = tbl.columns
        if len(cols) != 4:
            raise ValueError(f"relationship table {tname} has "
                             f"{len(cols)} columns")
        rships = conv.find_relationships(cols)
        if len(rships) != 1 or conv.find_props(cols, rships):
            raise ValueError(f"relationship table {tname} breaks the "
                             "single-rship/no-props convention")
        for row in _rows(path, tbl):
            db_id = conv.parse_db_id(row.get("DB_ID"))
            if db_id is None:
                counters["bad_id"] += 1
                continue
            if not db_id:                      # Groovy `if (!id)` (:229)
                counters["no_id"] += 1
                continue
            key = conv.dump_node_key(db_id)
            if key not in nodes:
                counters["missing_node"] += 1
                continue
            add_relationships(key, row, rships, cols)

    return {
        "nodes": {k: (n.labels(), props_json(n.props)) for k, n in nodes.items()},
        "edges": sorted(edges, key=lambda e: (e[0], e[1], e[2], e[3] or "")),
        "registry": registry,
        "counters": dict(counters),
    }
