"""Convention-driven MySQL-dump -> graph loader, Ray-Data-native.

The runtime twin of the reference's ReactomeLoader
(/root/reference/src/main/groovy/graphene/loaders/ReactomeLoader.groovy):
table roles and column roles are inferred from NAME CONVENTIONS over the
dump's scanned column maps (kb/dump_conventions.py), so a dump with unseen
satellite tables loads with NO code or manifest change — the SURVEY §2 M9
behavior the static fixture manifest (stages/vocab.py) does not cover.
Must EQUAL oracle/dump_graph.py (tests/test_dump_graph.py).

Execution shape
---------------
  scan_dump_schema      ONE sequential driver pass (offsets only)
  classify_tables       name-convention dispatch (shared with the oracle)
  DatabaseObject        distributed byte-range parse -> 3-column projection
                        collected on the driver: the id->_displayName map
                        is THE broadcast artifact every later phase needs
                        (the C3 registry pattern, stages/vocab.py) — a
                        Reactome-style dump is star-schema METADATA
                        (~10^6 rows), not the 100 TB corpus path; at larger
                        node tables this collect+broadcast becomes an
                        equi_join (ops/join.py), same as the C3 note
  phases 1-5            independent map_batches stages over per-table
                        byte-range reads (plain tasks — vocab-scale inputs,
                        actor pools would be spin-up-dominated), each
                        emitting order-stamped rows into ONE schema
  node merge            single hash shuffle (group_partitioned on key);
                        per key, emissions fold in (phase, tbl, off, row)
                        order — reproducing the reference's sequential
                        last-writer-wins without a sequential pass
  edges                 no shuffle: the reference inserts one relationship
                        per link() call (duplicates preserved), so the edge
                        stream is map-only
  registry / counters   metadata-scale driver collects

Row loops inside the emission tasks are the vocab-scale exception the
project allows (see VERDICT r3: "stages/vocab.py row loops are
vocab-scale"); per-row work is dict/JSON construction that Arrow kernels
cannot express.

Deviations from the reference (quarantine-not-crash, phase-1 name snapshot
for m:1 denormalization, content-derived keys, canonical sorted output) are
documented in oracle/dump_graph.py — both sides implement the same rule.
"""

from __future__ import annotations

import json
from collections import Counter

import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd
from ray.data import Dataset

from ..kb import dump_conventions as conv
from ..kb.spec import node_key, promote_digits, props_json
from ..ops.partition import group_partitioned
from ..sources.mysql_dump import DumpTable, read_mysql_dump, scan_dump_schema

EMIT_SCHEMA = pa.schema([
    ("kind", pa.string()),      # node | mint | upd | edge | registry | counter
    ("key", pa.string()),
    ("primary", pa.string()),
    ("label", pa.string()),
    ("props", pa.string()),     # JSON dict of prop writes, fold-ordered
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("eprops", pa.string()),
    ("rlabel", pa.string()),
    ("rkey", pa.string()),
    ("cname", pa.string()),
    ("cval", pa.int64()),
    ("phase", pa.int32()),
    ("tbl", pa.int32()),
    ("off", pa.int64()),
    ("row", pa.int64()),
])
_EMPTY = {f.name: None for f in EMIT_SCHEMA}


def _emit(**kw) -> dict:
    return {**_EMPTY, **kw}


def _emissions_table(rows: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(rows, schema=EMIT_SCHEMA)


def _rel_emissions(key: str, row: dict, rships, cols, names: dict,
                   stamp: dict) -> tuple[list[dict], dict | None, Counter]:
    """addRelationships (ReactomeLoader.groovy:260-280) for one row:
    -> (edge emissions, m:1 denormalized prop writes, counters)."""
    out: list[dict] = []
    m1: dict = {}
    ctr: Counter = Counter()
    for rship in rships:
        v = row.get(rship)
        if not v or v == "NULL":
            continue
        rel = conv.parse_db_id(v)
        if rel is None:
            ctr["bad_ref"] += 1
            continue
        if rel not in names:
            ctr["dangling_ref"] += 1
            continue
        rank_col = rship + "_rank"
        pred = conv.camel_to_constant(rship)
        if rank_col in cols and row.get(rank_col):
            rank = conv.parse_db_id(row[rank_col])
            if rank is None:
                ctr["bad_rank"] += 1
                continue
            out.append(_emit(kind="edge", subj=key, pred=pred,
                             obj=conv.dump_node_key(rel),
                             eprops=props_json({"rank": rank}), **stamp))
        else:
            m1[rship + "Name"] = names[rel]
            out.append(_emit(kind="edge", subj=key, pred=pred,
                             obj=conv.dump_node_key(rel), **stamp))
    return out, (m1 or None), ctr


def _counter_rows(ctr: Counter, stamp: dict) -> list[dict]:
    return [_emit(kind="counter", cname=k, cval=v, **stamp)
            for k, v in sorted(ctr.items())]


def _node_table_rels(batch: pa.Table, names: dict, cols: list[str],
                     phase: int, tbl: int) -> pa.Table:
    """Phase 2: 1:m rels from the DatabaseObject table itself (:68-78)."""
    out: list[dict] = []
    ctr: Counter = Counter()
    rows = batch.to_pylist()
    for r in rows:
        stamp = {"phase": phase, "tbl": tbl, "off": r["_off"], "row": r["_row"]}
        db_id = conv.parse_db_id(r.get("DB_ID"))
        if db_id is None:
            ctr["bad_id"] += 1
            continue
        if db_id not in names:
            ctr["missing_node"] += 1
            continue
        key = conv.dump_node_key(db_id)
        edges, m1, c = _rel_emissions(key, r, conv.NODE_TABLE_RSHIPS,
                                      cols, names, stamp)
        out.extend(edges)
        if m1:
            out.append(_emit(kind="upd", key=key, props=props_json(m1), **stamp))
        ctr.update(c)
    out.extend(_counter_rows(ctr, {"phase": phase, "tbl": tbl, "off": 0, "row": 0}))
    return _emissions_table(out)


def _decorator_emissions(batch: pa.Table, names: dict, tname: str,
                         cols: list[str], rships: list[str],
                         props: list[str], phase: int, tbl: int) -> pa.Table:
    """Phase 3: one decorator table (:119-173) -> label adds, prop writes,
    edges, registry rows."""
    cache_ref = tname in conv.REGISTRY_BY_NAME_TABLES
    cache_go = tname.startswith(conv.GO_TABLE_PREFIX)
    out: list[dict] = []
    ctr: Counter = Counter()
    for r in batch.to_pylist():
        stamp = {"phase": phase, "tbl": tbl, "off": r["_off"], "row": r["_row"]}
        db_id = conv.parse_db_id(r.get("DB_ID"))
        if db_id is None:
            ctr["bad_id"] += 1
            continue
        if not db_id:
            ctr["no_id"] += 1
            continue
        if db_id not in names:
            ctr["missing_node"] += 1
            continue
        key = conv.dump_node_key(db_id)
        if cache_ref:
            reg = r.get("name")
            if reg is not None:
                out.append(_emit(kind="registry", rlabel=tname, rkey=reg,
                                 key=key, **stamp))
        elif cache_go:
            acc = conv.parse_db_id(r.get("id"))
            if acc is None:
                ctr["bad_accession"] += 1
            else:
                out.append(_emit(kind="registry", rlabel=tname, rkey=str(acc),
                                 key=key, **stamp))
        writes = {}
        for p in props:                       # addProperties (:248-258)
            v = r.get(p)
            if v and v != "NULL":
                writes[p] = promote_digits(v)
        edges, m1, c = _rel_emissions(key, r, rships, cols, names, stamp)
        if m1:
            writes.update(m1)                 # rels write AFTER props (:166-169)
        out.append(_emit(kind="upd", key=key, label=tname,
                         props=props_json(writes), **stamp))
        out.extend(edges)
        ctr.update(c)
    out.extend(_counter_rows(ctr, {"phase": phase, "tbl": tbl, "off": 0, "row": 0}))
    return _emissions_table(out)


def _newnodes_emissions(batch: pa.Table, names: dict, prop: str,
                        phase: int, tbl: int) -> pa.Table:
    """Phase 4: mint (Prop.capitalize(), name) nodes + rank edges (:176-212)."""
    label = conv.capitalize_first(prop)
    pred = conv.camel_to_constant(prop)
    out: list[dict] = []
    ctr: Counter = Counter()
    for r in batch.to_pylist():
        stamp = {"phase": phase, "tbl": tbl, "off": r["_off"], "row": r["_row"]}
        db_id = conv.parse_db_id(r.get("DB_ID"))
        if db_id is None:
            ctr["bad_id"] += 1
            continue
        if not db_id:
            ctr["no_id"] += 1
            continue
        name = r.get(prop)
        if not name:                          # :200-203 (NULL literal passes)
            ctr["empty_name"] += 1
            continue
        if db_id not in names:
            ctr["missing_node"] += 1
            continue
        nk = node_key(label, name)
        out.append(_emit(kind="mint", key=nk, primary=label,
                         label=conv.BASE_LABEL,
                         props=props_json({"name": name}), **stamp))
        # rank stays a RAW STRING (:208), unlike addRelationships' int rank
        out.append(_emit(kind="edge", subj=conv.dump_node_key(db_id),
                         pred=pred, obj=nk,
                         eprops=props_json({"rank": r.get(prop + "_rank")}),
                         **stamp))
    out.extend(_counter_rows(ctr, {"phase": phase, "tbl": tbl, "off": 0, "row": 0}))
    return _emissions_table(out)


def _relation_emissions(batch: pa.Table, names: dict, rships: list[str],
                        cols: list[str], phase: int, tbl: int) -> pa.Table:
    """Phase 5: pure m:m relationship tables (:214-238)."""
    out: list[dict] = []
    ctr: Counter = Counter()
    for r in batch.to_pylist():
        stamp = {"phase": phase, "tbl": tbl, "off": r["_off"], "row": r["_row"]}
        db_id = conv.parse_db_id(r.get("DB_ID"))
        if db_id is None:
            ctr["bad_id"] += 1
            continue
        if not db_id:
            ctr["no_id"] += 1
            continue
        if db_id not in names:
            ctr["missing_node"] += 1
            continue
        key = conv.dump_node_key(db_id)
        edges, m1, c = _rel_emissions(key, r, rships, cols, names, stamp)
        out.extend(edges)
        if m1:     # EMPTY rank value falls through to the m:1 branch (:268)
            out.append(_emit(kind="upd", key=key, props=props_json(m1), **stamp))
        ctr.update(c)
    out.extend(_counter_rows(ctr, {"phase": phase, "tbl": tbl, "off": 0, "row": 0}))
    return _emissions_table(out)


def _validate_conventions(schema: dict[str, DumpTable],
                          kinds: dict[str, list[str]]) -> dict[str, tuple]:
    """The reference's asserts (:70-72, :181-185, :218-223), raised
    driver-side BEFORE any task launches. Returns per-table parse plans."""
    if "DatabaseObject" not in kinds["special"]:
        raise ValueError("dump has no DatabaseObject table")
    base = schema["DatabaseObject"]
    for col in conv.NODE_TABLE_RSHIPS:
        if col not in base.columns:
            raise ValueError(f"DatabaseObject lacks required column {col!r}")
    plans: dict[str, tuple] = {}
    for tname in kinds["newnodes"]:
        cols = schema[tname].columns
        props = conv.find_props(cols)
        if len(cols) != 3 or len(props) != 1 or props[0] + "_rank" not in cols:
            raise ValueError(f"newnodes table {tname} breaks the "
                             "(DB_ID, prop, prop_rank) convention")
        plans[tname] = (props[0],)
    for tname in kinds["relationships"]:
        cols = schema[tname].columns
        rships = conv.find_relationships(cols)
        if len(cols) != 4 or len(rships) != 1 or conv.find_props(cols, rships):
            raise ValueError(f"relationship table {tname} breaks the "
                             "single-rship/no-props convention")
        plans[tname] = (rships,)
    return plans


def _merge_nodes(part) -> "pd.DataFrame":
    """Per-partition fold: emissions sorted by (phase, tbl, off, row) per
    key reproduce the reference's sequential last-writer-wins; labels are
    an order-free union (addLabel/setLabels only ever grow the set)."""
    import pandas as pd

    if len(part) == 0:
        return pd.DataFrame({"key": pd.Series(dtype=object),
                             "labels": pd.Series(dtype=object),
                             "props": pd.Series(dtype=object)})
    part = part.sort_values(["key", "phase", "tbl", "off", "row"],
                            kind="stable")
    out_keys, out_labels, out_props = [], [], []
    for key, g in part.groupby("key", sort=True):
        primary = None
        extras: set[str] = set()
        props: dict = {}
        for kind, prim, label, pjson in zip(g["kind"], g["primary"],
                                            g["label"], g["props"]):
            if kind in ("node", "mint") and primary is None:
                primary = prim
            if label is not None:
                extras.add(label)
            if pjson is not None:
                props.update(json.loads(pjson))
        if primary is None:        # update to a never-created key (gated
            continue               # upstream; belt-and-braces)
        out_keys.append(key)
        out_labels.append([primary] + sorted(extras - {primary}))
        out_props.append(props_json(props))
    return pd.DataFrame({"key": out_keys, "labels": out_labels,
                         "props": out_props})


def load_dump_graph(path: str, num_partitions: int = 8) -> dict:
    """Load a Reactome-style dump into graph tables by name convention.

    Returns ``{"nodes": Dataset(key, labels, props), "edges": Dataset(subj,
    pred, obj, eprops), "registry": {(label, key): node_key},
    "counters": {...}}``. Edge multiplicity is preserved (the reference
    creates one relationship per link() call)."""
    schema = scan_dump_schema(path)
    kinds = conv.classify_tables(schema)
    plans = _validate_conventions(schema, kinds)
    base = schema["DatabaseObject"]

    # ---- phase 1 (driver collect + broadcast): winners, names, counters
    proj = read_mysql_dump(path, "DatabaseObject", schema=schema,
                           with_order=True).map_batches(
        lambda t: t.select(["DB_ID", "_class", "_displayName", "_off", "_row"]),
        batch_format="pyarrow")
    counters: Counter = Counter()
    seen: dict[int, tuple] = {}       # id -> (off, row, cls, disp)
    n_valid = 0
    for b in proj.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for i, c, d, o, w in zip(b["DB_ID"].to_pylist(), b["_class"].to_pylist(),
                                 b["_displayName"].to_pylist(),
                                 b["_off"].to_pylist(), b["_row"].to_pylist()):
            db_id = conv.parse_db_id(i)
            if db_id is None:
                counters["bad_id"] += 1
                continue
            if not c:
                counters["bad_class"] += 1
                continue
            n_valid += 1
            cur = seen.get(db_id)
            if cur is None or (o, w) < cur[:2]:
                seen[db_id] = (o, w, c, d)
    if n_valid > len(seen):
        counters["duplicate_db_id"] += n_valid - len(seen)
    names = {i: v[3] for i, v in seen.items()}
    names_ref = ray.put(names)

    base_rows = [_emit(kind="node", key=conv.dump_node_key(i), primary=c,
                       label=conv.BASE_LABEL,
                       props=None if d is None else props_json({"name": d}),
                       phase=0, tbl=0, off=o, row=w)
                 for i, (o, w, c, d) in sorted(seen.items())]
    emissions = [rd.from_arrow(_emissions_table(base_rows))]

    # ---- phases 2-5: independent order-stamped emission stages
    def stage(table: str, fn, columns=None):
        ds = read_mysql_dump(path, table, schema=schema, with_order=True,
                             columns=columns)
        return ds.map_batches(
            lambda t, f=fn: f(t, ray.get(names_ref)), batch_format="pyarrow")

    emissions.append(stage(
        "DatabaseObject",
        lambda t, nm: _node_table_rels(t, nm, base.columns, 1, 0)))
    for ti, tname in enumerate(kinds["decorators"]):
        cols = conv.decorator_columns(tname, schema[tname].columns)
        rships = conv.find_relationships(cols)
        props = conv.find_props(cols, rships)
        emissions.append(stage(
            tname,
            lambda t, nm, tn=tname, c=cols, rs=rships, pr=props, i=ti:
                _decorator_emissions(t, nm, tn, c, rs, pr, 2, i),
            columns=cols))
    for ti, tname in enumerate(kinds["newnodes"]):
        (prop,) = plans[tname]
        emissions.append(stage(
            tname,
            lambda t, nm, p=prop, i=ti: _newnodes_emissions(t, nm, p, 3, i)))
    for ti, tname in enumerate(kinds["relationships"]):
        (rships,) = plans[tname]
        cols = schema[tname].columns
        emissions.append(stage(
            tname,
            lambda t, nm, rs=rships, c=cols, i=ti:
                _relation_emissions(t, nm, rs, c, 4, i)))

    all_emit = emissions[0]
    for e in emissions[1:]:
        all_emit = all_emit.union(e)
    all_emit = all_emit.materialize()     # vocab-scale, consumed 4×

    node_rows = all_emit.map_batches(
        lambda t: t.filter(pc.is_in(t["kind"],
                                    pa.array(["node", "mint", "upd"]))),
        batch_format="pyarrow")
    nodes = group_partitioned(node_rows, ["key"], _merge_nodes,
                              num_partitions=num_partitions)

    edges = all_emit.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "edge"))
                   .select(["subj", "pred", "obj", "eprops"]),
        batch_format="pyarrow")

    # registry + counters: metadata-scale driver collects
    registry_rows: list[tuple] = []
    for b in all_emit.iter_batches(batch_size=65536, batch_format="pyarrow"):
        reg = b.filter(pc.equal(b["kind"], "registry"))
        registry_rows.extend(zip(reg["rlabel"].to_pylist(),
                                 reg["rkey"].to_pylist(),
                                 reg["key"].to_pylist(),
                                 reg["phase"].to_pylist(),
                                 reg["tbl"].to_pylist(),
                                 reg["off"].to_pylist(),
                                 reg["row"].to_pylist()))
        ctr = b.filter(pc.equal(b["kind"], "counter"))
        for k, v in zip(ctr["cname"].to_pylist(), ctr["cval"].to_pylist()):
            counters[k] += v
    registry: dict[tuple[str, str], str] = {}
    for rl, rk, key, *_stamp in sorted(registry_rows,
                                       key=lambda r: (r[3], r[4], r[5], r[6])):
        registry[(rl, rk)] = key          # last-writer-wins in stamp order

    return {"nodes": nodes, "edges": edges, "registry": registry,
            "counters": dict(counters)}


def dump_graph_tables(path: str) -> dict:
    """Collected, canonically-sorted comparison surface (tests): same shape
    as oracle/dump_graph.load_dump_graph_oracle."""
    res = load_dump_graph(path)
    nodes = {}
    for b in res["nodes"].iter_batches(batch_size=65536,
                                       batch_format="pyarrow"):
        for k, ls, ps in zip(b["key"].to_pylist(), b["labels"].to_pylist(),
                             b["props"].to_pylist()):
            nodes[k] = (tuple(ls), ps)
    edges = []
    for b in res["edges"].iter_batches(batch_size=65536,
                                       batch_format="pyarrow"):
        edges.extend(zip(b["subj"].to_pylist(), b["pred"].to_pylist(),
                         b["obj"].to_pylist(), b["eprops"].to_pylist()))
    edges.sort(key=lambda e: (e[0], e[1], e[2], e[3] or ""))
    return {"nodes": nodes, "edges": edges, "registry": res["registry"],
            "counters": res["counters"]}
