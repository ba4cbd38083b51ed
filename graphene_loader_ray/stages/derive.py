"""Derived-edge stage — the post-import-cypher.txt rewrites as Ray Data joins.

The reference shells out to `neo4j-shell` for these (LoadGrameneGraphDb.
groovy:56-69); here they stay inside the Dataset pipeline as self-joins of
the edge table keyed on the mid node (SURVEY.md §2.4 J7-J10):

  - TO (entity→entity, event→event): INPUT ⋈ OUTPUT on the event / entity
    mid-key, common-entity blacklist applied (post-import-cypher.txt:6-12)
  - To reification + VIA/RXN/SPECIES (line 14)
  - ENCODED_BY ≤3-hop closure: 3 chained hash joins, dedup between rounds
    (line 16), then the DATABASE_BRIDGE hop to Gene (line 17)
  - METABOLITE_LINK (line 19; Cypher edge-isomorphism ⇒ r2 ≠ r)
  - name-equality DATABASE_BRIDGEs (lines 21-23) via broadcast key sets

Partitioning assumption: joins are hash-partitioned on the mid-node key
(``ops.join.equi_join`` — groupby shuffle; Ray 2.49's native Dataset.join
mis-handles one-sided partitions, see ops/join.py). The KB edge table is
vocabulary-scale, so these are NOT corpus-scale shuffles.

Node keys are self-describing ("N:{label}:{name}") so label/name predicates
need no node-table join — a vectorized split per batch suffices.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd
from ray.data import Dataset

from ..functions.blacklist import is_common_name
from ..ops.join import equi_join
from ..kb import spec

_EDGE_SCHEMA = pa.schema([("subj", pa.string()), ("pred", pa.string()),
                          ("obj", pa.string())])


def key_label(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """'N:{label}:{name}' -> label (vectorized)."""
    parts = pc.split_pattern(col, ":", max_splits=2)
    return pc.list_element(parts, 1)


def key_name(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    parts = pc.split_pattern(col, ":", max_splits=2)
    return pc.list_element(parts, 2)


def _label_in(col, classes: frozenset[str]) -> pa.Array:
    return pc.is_in(key_label(col), pa.array(sorted(classes)))


def _common_mask(col) -> pa.Array:
    """Vector mask of the common-metabolite blacklist over node keys
    (post-import-cypher.txt:6; functions/blacklist.py)."""
    names = key_name(col)
    return pa.array([is_common_name(n) for n in names.to_pylist()],
                    pa.bool_())


def _edges(batch_rows: list[tuple[str, str, str]]) -> pa.Table:
    if not batch_rows:
        return _EDGE_SCHEMA.empty_table()
    s, p, o = zip(*batch_rows)
    return pa.table({"subj": list(s), "pred": list(p), "obj": list(o)},
                    schema=_EDGE_SCHEMA)


def _filter_pred(edges: Dataset, pred: str) -> Dataset:
    return edges.map_batches(
        lambda t, p=pred: t.filter(pc.equal(t["pred"], p)),
        batch_format="pyarrow")


def derive_edges(edges: Dataset, registry: dict,
                 num_partitions: int = 8) -> tuple[Dataset, Dataset]:
    """edges (deduped KB edges) -> (derived_edges, to_node_rows).

    derived_edges: new (subj, pred, obj) rows (union with input + dedup is
    the caller's job); to_node_rows: (label, name, extra) for reified To
    nodes."""

    # ---- typed views --------------------------------------------------
    def in_view(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["pred"], "INPUT"))
        t = t.filter(pc.and_(_label_in(t["subj"], spec.PHYSICAL_ENTITY_CLASSES),
                             _label_in(t["obj"], spec.EVENT_CLASSES)))
        return pa.table({"ent_in": t["subj"], "mid": t["obj"],
                         "in_common": _common_mask(t["subj"])})

    def out_view(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["pred"], "OUTPUT"))
        t = t.filter(pc.and_(_label_in(t["subj"], spec.EVENT_CLASSES),
                             _label_in(t["obj"], spec.PHYSICAL_ENTITY_CLASSES)))
        return pa.table({"mid": t["subj"], "ent_out": t["obj"],
                         "out_common": _common_mask(t["obj"])})

    ins = edges.map_batches(in_view, batch_format="pyarrow").materialize()
    outs = edges.map_batches(out_view, batch_format="pyarrow").materialize()

    # witnesses (s)-[:INPUT]->(r)-[:OUTPUT]->(p), joined on the event mid
    witnesses = equi_join(ins, outs, ["mid"]).materialize()

    # line 10: entity TO entity (both non-common)
    to_entity = witnesses.map_batches(
        lambda t: pa.table({
            "subj": t.filter(pc.and_(pc.invert(t["in_common"]),
                                     pc.invert(t["out_common"])))["ent_in"],
            "obj": t.filter(pc.and_(pc.invert(t["in_common"]),
                                    pc.invert(t["out_common"])))["ent_out"]}),
        batch_format="pyarrow").map_batches(
        lambda t: t.append_column("pred", pa.array(["TO"] * t.num_rows)
                                  ).select(["subj", "pred", "obj"]),
        batch_format="pyarrow")

    # line 12: event TO event via non-common intermediate entity
    ev_out = outs.map_batches(
        lambda t: pa.table({"pent": t.filter(pc.invert(t["out_common"]))["ent_out"],
                            "r1": t.filter(pc.invert(t["out_common"]))["mid"]}),
        batch_format="pyarrow")
    ev_in = ins.map_batches(
        lambda t: pa.table({"pent": t["ent_in"], "r2": t["mid"]}),
        batch_format="pyarrow")
    to_event = equi_join(ev_out, ev_in, ["pent"]) \
        .map_batches(lambda t: pa.table({
            "subj": t["r1"],
            "pred": pa.array(["TO"] * t.num_rows),
            "obj": t["r2"]}), batch_format="pyarrow")

    # line 14: To reification for SimpleEntity witnesses with a species
    species = edges.map_batches(
        lambda t: (lambda f: pa.table({"mid": f["subj"], "sp": f["obj"]}))(
            t.filter(pc.and_(pc.equal(t["pred"], spec.REL_SPECIES),
                             _label_in(t["subj"], spec.EVENT_CLASSES)))),
        batch_format="pyarrow")
    simple_wit = witnesses.map_batches(
        lambda t: t.filter(pc.and_(
            pc.and_(pc.equal(key_label(t["ent_in"]), "SimpleEntity"),
                    pc.equal(key_label(t["ent_out"]), "SimpleEntity")),
            pc.and_(pc.invert(t["in_common"]), pc.invert(t["out_common"])))),
        batch_format="pyarrow")
    reified = equi_join(simple_wit, species, ["mid"]).materialize()

    def reify_edges(t: pa.Table) -> pa.Table:
        rows = []
        for a, b, r, sp in zip(t["ent_in"].to_pylist(), t["ent_out"].to_pylist(),
                               t["mid"].to_pylist(), t["sp"].to_pylist()):
            to_key = spec.node_key(spec.LABEL_TO_NODE, f"{a}|{b}")
            rows += [(a, spec.REL_VIA, to_key), (to_key, spec.REL_VIA, b),
                     (to_key, spec.REL_RXN, r), (to_key, spec.REL_SPECIES, sp)]
        return _edges(rows)

    reify = reified.map_batches(reify_edges, batch_format="pyarrow")
    to_nodes = reified.map_batches(
        lambda t: pa.table({
            "label": pa.array([spec.LABEL_TO_NODE] * t.num_rows),
            "name": pa.array([f"{a}|{b}" for a, b in
                              zip(t["ent_in"].to_pylist(),
                                  t["ent_out"].to_pylist())], pa.string()),
            "extra": pa.array([[]] * t.num_rows, pa.list_(pa.string())),
            "props": pa.nulls(t.num_rows, pa.string())}),
        batch_format="pyarrow")

    # line 16: ENCODED_BY bounded closure (3 chained hash joins)
    ca = edges.map_batches(
        lambda t: (lambda f: pa.table({"rxn": f["subj"], "ca": f["obj"]}))(
            t.filter(pc.and_(pc.equal(t["pred"], "CATALYST_ACTIVITY"),
                             pc.equal(key_label(t["subj"]), "Reaction")))),
        batch_format="pyarrow")
    pe = edges.map_batches(
        lambda t: (lambda f: pa.table({"ca": f["subj"], "cur": f["obj"]}))(
            t.filter(pc.equal(t["pred"], "PHYSICAL_ENTITY"))),
        batch_format="pyarrow")
    hops = edges.map_batches(
        lambda t: (lambda f: pa.table({"cur": f["subj"], "nxt": f["obj"]}))(
            t.filter(pc.is_in(t["pred"],
                              pa.array(sorted(spec.ENCODED_BY_HOP_PREDS))))),
        batch_format="pyarrow").materialize()

    frontier = equi_join(ca, pe, ["ca"]) \
        .map_batches(lambda t: t.select(["rxn", "cur"]),
                     batch_format="pyarrow").materialize()
    reached = []
    for _ in range(spec.ENCODED_BY_MAX_HOPS):
        frontier = equi_join(frontier, hops, ["cur"]) \
            .map_batches(lambda t: pa.table({"rxn": t["rxn"], "cur": t["nxt"]}),
                         batch_format="pyarrow").materialize()
        reached.append(frontier)
    closure = reached[0].union(*reached[1:])
    encoded_by = closure.map_batches(
        lambda t: (lambda f: pa.table({
            "subj": f["rxn"],
            "pred": pa.array([spec.REL_ENCODED_BY] * f.num_rows),
            "obj": f["cur"]}))(
            t.filter(pc.equal(key_label(t["cur"]), "ReferenceGeneProduct"))),
        batch_format="pyarrow").materialize()

    # line 17: hop through DATABASE_BRIDGE to Gene
    gene_bridges = edges.map_batches(
        lambda t: (lambda f: pa.table({"gp": f["subj"], "gene": f["obj"]}))(
            t.filter(pc.and_(pc.equal(t["pred"], spec.REL_DATABASE_BRIDGE),
                             pc.equal(key_label(t["obj"]), "Gene")))),
        batch_format="pyarrow")
    encoded_by_gene = equi_join(
        encoded_by.map_batches(
            lambda t: pa.table({"gp": t["obj"], "rxn": t["subj"]}),
            batch_format="pyarrow"),
        gene_bridges, ["gp"]) \
        .map_batches(lambda t: pa.table({
            "subj": t["rxn"],
            "pred": pa.array([spec.REL_ENCODED_BY] * t.num_rows),
            "obj": t["gene"]}), batch_format="pyarrow")

    # line 19: METABOLITE_LINK — witnesses self-joined on (i, o); r2 ≠ r
    w_rxn = witnesses.map_batches(
        lambda t: (lambda f: pa.table({"ent_in": f["ent_in"],
                                       "ent_out": f["ent_out"], "r": f["mid"]}))(
            t.filter(pc.and_(pc.equal(key_label(t["mid"]), "Reaction"),
                             pc.and_(pc.invert(t["in_common"]),
                                     pc.invert(t["out_common"]))))),
        batch_format="pyarrow")
    w_any = witnesses.map_batches(
        lambda t: pa.table({"ent_in": t["ent_in"], "ent_out": t["ent_out"],
                            "r2": t["mid"]}), batch_format="pyarrow")
    metabolite = equi_join(w_rxn, w_any, ["ent_in", "ent_out"]) \
        .map_batches(lambda t: (lambda f: pa.table({
            "subj": f["r"],
            "pred": pa.array([spec.REL_METABOLITE_LINK] * f.num_rows),
            "obj": f["r2"]}))(t.filter(pc.not_equal(t["r"], t["r2"]))),
        batch_format="pyarrow")

    # lines 21-23: name-equality bridges via broadcast key sets
    taxon_by_id = {ext: key for (src, ext), key in registry.items()
                   if src == spec.TAXONOMY_SOURCE}

    refdb_adj = edges.map_batches(
        lambda t: _refdb_adjacency(t), batch_format="pyarrow")

    def j7(t: pa.Table) -> pa.Table:
        rows = []
        for ident_key, refdb_name in zip(t["ident"].to_pylist(),
                                         t["refdb"].to_pylist()):
            name = ident_key.split(":", 2)[2]
            if refdb_name == spec.REFDB_NCBI_TAXONOMY and name in taxon_by_id:
                rows.append((ident_key, spec.REL_DATABASE_BRIDGE,
                             taxon_by_id[name]))
            if refdb_name == spec.REFDB_EC:
                rows.append((ident_key, spec.REL_DATABASE_BRIDGE,
                             spec.node_key("EC", name)))
        return _edges(rows)

    # the EC side must actually exist as a node (xref-created); guard by
    # semi-join against EC node keys derived from the edge table
    ec_keys = set()
    for batch in edges.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for col in ("subj", "obj"):
            for k in batch[col].to_pylist():
                if k.startswith("N:EC:"):
                    ec_keys.add(k)

    def j7_guarded(t: pa.Table) -> pa.Table:
        out = j7(t)
        mask = [not o.startswith("N:EC:") or o in ec_keys
                for o in out["obj"].to_pylist()]
        return out.filter(pa.array(mask, pa.bool_()))

    bridges_j7 = refdb_adj.map_batches(j7_guarded, batch_format="pyarrow")

    derived = to_entity.union(to_event, reify, encoded_by, encoded_by_gene,
                              metabolite, bridges_j7) \
        .map_batches(lambda t: t.append_column(
            "props", pa.nulls(t.num_rows, pa.string())),
            batch_format="pyarrow")      # derived edges carry no props
    return derived, to_nodes


def _refdb_adjacency(t: pa.Table) -> pa.Table:
    """(DatabaseIdentifier key, ReferenceDatabase name) pairs from edges
    touching a ReferenceDatabase node in either direction
    (post-import-cypher.txt:21-23 `(d)--(i)`)."""
    idents, refdbs = [], []
    for s, o in zip(t["subj"].to_pylist(), t["obj"].to_pylist()):
        s_lab, o_lab = s.split(":", 2)[1], o.split(":", 2)[1]
        if s_lab == "DatabaseIdentifier" and o_lab == "ReferenceDatabase":
            idents.append(s)
            refdbs.append(o.split(":", 2)[2])
        elif o_lab == "DatabaseIdentifier" and s_lab == "ReferenceDatabase":
            idents.append(o)
            refdbs.append(s.split(":", 2)[2])
    return pa.table({"ident": pa.array(idents, pa.string()),
                     "refdb": pa.array(refdbs, pa.string())})
