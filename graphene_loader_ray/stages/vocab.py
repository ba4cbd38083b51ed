"""KB build — vocabulary tables → node/edge datasets + broadcast artifacts.

Ray Data expression of the reference's loaders (SURVEY.md §2.2/§2.3):

  read_parquet(vocab_*) ──map_batches(parse_*)──▶ emission rows
     kind=node|edge|ref|edge_ids|registry|surface|genepos|maptaxon
  registry rows (vocab-scale, ≪ corpus) ──collect──▶ broadcast dict
     (the Ray-native home of Loader.groovy:398 externalIdToNeoId /
      ReactomeLoader.groovy:155-159 decorator caches — C3 in SURVEY §2.3)
  ref/edge_ids rows ──map_batches(ResolveRefs, broadcast registry)──▶ edges
     (deferred-edge semantics: misses counted + dropped, never crash —
      Loader.groovy:414-427)
  genepos rows ──groupby(region).map_groups(chain)──▶ FIRST/NEXT/LAST edges
     (GeneLoader.groovy:79-95 adjacency TreeMaps become a per-region sort)
  node rows ──groupby(label,name)──▶ deduped node table (NodeCache D1,
     Importer.groovy:97-123, as a shuffle)

Scale notes: the vocabulary is the SMALL side (reference corpus ~600k rows,
notes.txt:1-3) — parse functions may walk Python rows per batch; the
registries/gazetteer are built once and broadcast via ray.put to the
corpus-side actor pools. The page corpus never flows through this module.

Ordering-dependence in the reference (stage order is load-bearing,
SURVEY.md §2.9) is replaced by commutative rules:
  - taxon→map CONTAINS is decided by the min-_id gene per map
    (GeneLoader.groovy:162-165 'first gene creating the map' made
    deterministic under parallelism)
  - per-(region,start) collisions keep the lexicographically-least gene key
    (TreeMap last-writer-wins made deterministic)
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import pandas as pd
import pyarrow as pa

import ray
import ray.data as rd
from ray.data import Dataset

from ..functions.naming import strip_leading_zeros, underscore_to_camel
from ..functions.ontology import extract_rank, parse_relationship, relationship_pattern
from ..functions.xref import parse_xref
from ..kb import spec

EMIT_SCHEMA = pa.schema([
    ("kind", pa.string()),
    ("label", pa.string()), ("name", pa.string()),
    ("extra", pa.list_(pa.string())),
    ("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string()),
    ("source", pa.string()), ("ext_id", pa.string()),
    ("surface", pa.string()), ("is_primary", pa.bool_()),
    ("rev", pa.bool_()),
    ("props", pa.string()),            # canonical-JSON property map or null
])

_EMPTY = {f.name: None for f in EMIT_SCHEMA}


class _Emitter:
    """Accumulates emission rows inside one parse batch."""

    def __init__(self) -> None:
        self.rows: list[dict] = []

    def node(self, label: str, name: str, extra: list[str] | None = None,
             surface: bool = False, props: dict | None = None) -> str:
        key = spec.node_key(label, name)
        self.rows.append({**_EMPTY, "kind": "node", "label": label,
                          "name": name, "extra": extra or [],
                          "props": spec.props_json(props)})
        if surface:
            self.surface(name, key, True)
        return key

    def edge(self, subj: str, pred: str, obj: str,
             props: dict | None = None) -> None:
        self.rows.append({**_EMPTY, "kind": "edge", "subj": subj,
                          "pred": pred, "obj": obj,
                          "props": spec.props_json(props)})

    def ref(self, subj: str, pred: str, source: str, ext_id,
            rev: bool = False, props: dict | None = None) -> None:
        """Edge whose target is an external id (deferred-rel analog, C4)."""
        self.rows.append({**_EMPTY, "kind": "ref", "subj": subj, "pred": pred,
                          "source": source, "ext_id": str(ext_id), "rev": rev,
                          "props": spec.props_json(props)})

    def registry(self, source: str, ext_id, key: str) -> None:
        self.rows.append({**_EMPTY, "kind": "registry", "source": source,
                          "ext_id": str(ext_id), "subj": key})

    def surface(self, surface: str, key: str, is_primary: bool) -> None:
        self.rows.append({**_EMPTY, "kind": "surface", "surface": surface,
                          "subj": key, "is_primary": is_primary})

    def table(self) -> pa.Table:
        if not self.rows:
            return EMIT_SCHEMA.empty_table()
        return pa.Table.from_pylist(self.rows, schema=EMIT_SCHEMA)


# ----------------------------------------------------------- parse functions

def parse_objects(batch: pa.Table) -> pa.Table:
    """vocab_objects → nodes/registries (ReactomeLoader.groovy:45-66,119-173)."""
    em = _Emitter()
    for row in batch.to_pylist():
        cls, ident, acc = row["_class"], row.get("identifier"), row.get("accession")
        name_from_ident = cls in spec.NAME_FROM_IDENTIFIER_CLASSES and ident
        name = ident if name_from_ident else row["_displayName"]
        # scalar prop columns, digit-promoted (ReactomeLoader.groovy:248-258);
        # identifier consumed as name is NOT also a prop (:129)
        props = {c: spec.promote_digits(row[c])
                 for c in spec.OBJECT_PROP_COLS
                 if row.get(c) is not None
                 and not (c == "identifier" and name_from_ident)}
        key = em.node(cls, name, extra=["Reactome"], surface=True, props=props)
        em.registry("reactome", row["DB_ID"], key)
        if cls in spec.IDENTIFIER_REGISTRY_CLASSES and ident:
            em.registry(f"ident:{cls}", ident, key)
        if cls.startswith(spec.GO_CLASS_PREFIX) and acc:
            em.registry("go_acc", strip_leading_zeros(acc), key)
    return em.table()


def parse_object_edges(batch: pa.Table) -> pa.Table:
    """vocab_edges → edge_ids rows; INPUT pre-flipped
    (post-import-cypher.txt:4; ReactomeLoader.groovy:260-282).

    m:m columns (rank present) carry the rank as an edge prop
    (ReactomeLoader.groovy:267-270); m:1 columns (no rank) additionally
    denormalize the target's name onto the source node as `<col>Name`
    (J6, :271-278) — emitted as 'm1prop' rows resolved against the
    registry in ResolveRefs."""
    em = _Emitter()
    for row in batch.to_pylist():
        s, o = str(row["subj_id"]), str(row["obj_id"])
        pred, rank = row["pred"], row.get("rank")
        props = {"rank": int(rank)} if rank is not None else None
        if rank is None:
            em.rows.append({**_EMPTY, "kind": "m1prop", "subj": s,
                            "pred": pred, "obj": o})
        if pred in spec.FLIPPED_PREDS:
            s, o = o, s
        em.rows.append({**_EMPTY, "kind": "edge_ids", "subj": s,
                        "pred": spec.pred_name(pred), "obj": o,
                        "props": spec.props_json(props)})
    return em.table()


def _common_term(em: _Emitter, key: str, t: dict) -> None:
    """Synonyms + xrefs (GrameneMongoLoader.groovy:331-375)."""
    for s in set(t.get("synonym") or []):
        name_key = em.node(spec.LABEL_NAME, s)
        em.edge(key, spec.REL_SYNONYM, name_key)
        em.surface(s, key, False)
    for x in t.get("xref") or []:
        parsed = parse_xref(x)
        if parsed is None:
            continue
        typ, val, _desc = parsed
        xkey = em.node(typ, val, extra=["Xref"])
        em.edge(key, spec.REL_XREF, xkey)


def parse_terms(batch: pa.Table,
                sig_types: frozenset[str] = frozenset()) -> pa.Table:
    """vocab_terms → emissions, dispatched on `source`
    (OntologyLoader / NCBITaxonLoader / DomainLoader / GeneLoader).

    ``sig_types``: protein-signature type names collected from the domains
    source BEFORE this stage runs (the C5 DomainLoader.signatureTypes
    coupling, DomainLoader.groovy:13,45-47, made an explicit broadcast
    instead of a hidden singleton)."""
    em = _Emitter()
    patterns = {s: relationship_pattern(s) for s in spec.ONTOLOGY_SOURCES}
    for t in batch.to_pylist():
        src = t["source"]
        if src in patterns:
            _parse_ontology_term(em, t, src, patterns[src])
        elif src == spec.TAXONOMY_SOURCE:
            _parse_taxon(em, t)
        elif src == spec.DOMAINS_SOURCE:
            _parse_domain(em, t)
        elif src == spec.GENES_SOURCE:
            _parse_gene(em, t, sig_types)
    return em.table()


def _parse_ontology_term(em: _Emitter, t: dict, src: str, pat) -> None:
    """OntologyLoader.groovy:18-114."""
    if t["is_obsolete"]:
        return
    extra = [src, "Ontology"]
    if t.get("namespace"):
        extra.append(underscore_to_camel(t["namespace"]))
    for sub in t.get("subset") or []:
        extra.append(underscore_to_camel(sub))
    # leftover scalar -> node prop (OntologyLoader.groovy:44 `node(id,
    # labels[path], oNode, …)` — after the pops only _id remains scalar)
    key = em.node(src, t["name"], extra=extra, surface=True,
                  props={"_id": t["_id"]})
    em.registry(src, t["_id"], key)
    _common_term(em, key, t)
    if src == "GO":
        # GOLoader bridge (OntologyLoader.groovy:122-133): reactome GO_* node
        # (cached by zero-stripped accession) -> term
        em.ref(key, spec.REL_DATABASE_BRIDGE, "go_acc", t["_id"], rev=True)
    for rship in t.get("relationship") or []:
        parsed = parse_relationship(rship, pat)
        if parsed is not None:
            em.ref(key, parsed[0], src, parsed[1])
    inter = t.get("intersection_of") or []
    if inter:
        em.ref(key, spec.REL_INTERSECTION, src, int(inter[0]))
        if len(inter) > 1:
            parsed = parse_relationship(inter[1], pat)
            if parsed is not None:
                em.ref(key, parsed[0], src, parsed[1])
    # leftover collection-valued keys → dynamic rels named KEY.upper()
    # (OntologyLoader.groovy:56-67 findOtherRelations/createOtherRels;
    # is_a → IS_A, consider → CONSIDER, …); targets resolve via the
    # deferred-rel path (miss → counted+dropped)
    for rel_name, ids in spec.leftover_collections(t):
        for target in ids:
            em.ref(key, rel_name, src, target)


def _parse_taxon(em: _Emitter, t: dict) -> None:
    """NCBITaxonLoader.groovy:175-215."""
    extra = ["NCBITaxonomy"]
    rank = extract_rank(t.get("property_value"))
    if rank:
        extra.append(rank)
    key = em.node(spec.LABEL_TAXON, t["name"], extra=extra, surface=True,
                  props={"_id": t["_id"]})
    em.registry(spec.TAXONOMY_SOURCE, t["_id"], key)
    _common_term(em, key, t)
    is_a = t.get("is_a") or []
    if is_a:
        em.ref(key, spec.REL_SUPER_TAXON, spec.TAXONOMY_SOURCE, is_a[0])


def _parse_domain(em: _Emitter, t: dict) -> None:
    """DomainLoader.groovy:224-264."""
    extra = []
    props: dict = {"_id": t["_id"]}
    for x in t.get("xref") or []:
        parsed = parse_xref(x)
        if parsed and parsed[0] == "type":
            # `type` is BOTH a NODE_PROP_KEY (DomainLoader.groovy:227) and
            # an extra label (:244)
            extra.append(parsed[1])
            props["type"] = parsed[1]
    key = em.node(spec.LABEL_INTERPRO, t["name"], extra=extra, surface=True,
                  props=props)
    em.registry(spec.DOMAINS_SOURCE, t["_id"], key)
    for feat in t.get("protein_features") or []:
        parsed = parse_xref(feat)
        if parsed is None:
            continue
        ftype, fname, _ = parsed
        sig_key = em.node(ftype, fname, extra=[spec.LABEL_INTERPRO_SIGNATURE])
        em.edge(sig_key, spec.REL_CONTRIBUTES_TO, key)


def _parse_gene(em: _Emitter, t: dict,
                sig_types: frozenset[str] = frozenset()) -> None:
    """GeneLoader.groovy:37-219."""
    # leftover scalars -> node props (GeneLoader.groovy:22-40: after the
    # pops, _id(.toString()), gene_id, start/end/strand remain; the Groovy
    # `findAll{it.key && it.value}` drops null/empty values)
    loc = t.get("location")
    props: dict = {"_id": str(t["_id"])}
    if t.get("gene_id"):
        props["gene_id"] = t["gene_id"]
    if loc:
        for k in ("start", "end", "strand"):
            if loc.get(k):
                props[k] = loc[k]
    # non-signature protein features -> array-valued props via the direct
    # setNodeProperty path (GeneLoader.groovy:181, Loader.groovy:102-107);
    # signature-typed features are ignored (:160-162); 'interpro' is the
    # separate CONTAINS path below
    feat_by_type: dict[str, list[str]] = {}
    for feat in t.get("protein_features") or []:
        parsed = parse_xref(feat)
        if parsed is None:
            continue
        ftype, fname, _ = parsed
        if ftype.lower() in sig_types:
            continue
        feat_by_type.setdefault(ftype, []).append(fname)
    for ftype, names in feat_by_type.items():
        props[ftype] = sorted(names)
    key = em.node("Gene", t["name"], surface=True, props=props)
    if t.get("gene_id"):
        for cls in sorted(spec.IDENTIFIER_REGISTRY_CLASSES):
            em.ref(key, spec.REL_DATABASE_BRIDGE, f"ident:{cls}",
                   t["gene_id"], rev=True)
    if t.get("taxon_id") is not None:
        em.ref(key, spec.REL_SPECIES, spec.TAXONOMY_SOURCE, t["taxon_id"])
    for x in t.get("xref") or []:
        parsed = parse_xref(x)
        if parsed is None:
            continue
        typ, val, _ = parsed
        if typ in spec.GENE_ONTOLOGY_XREF_SKIPPED:
            continue                     # GeneLoader.groovy:88 — no output
        if typ in spec.GENE_ONTOLOGY_XREF_KEYS:
            oid, evidence = spec.parse_ontology_xref_value(val)
            em.ref(key, spec.REL_ONTOLOGY_REF, typ, oid,
                   props={"evidence": evidence} if evidence else None)
        else:
            xkey = em.node(typ, val, extra=["Xref"])
            em.edge(key, spec.REL_XREF, xkey)
    ipr = sorted(t.get("interpro") or [])
    if ipr:
        set_key = em.node(spec.LABEL_INTERPRO_SET, spec.interpro_set_name(ipr))
        for ipr_id in ipr:
            em.ref(key, spec.REL_CONTAINS, spec.DOMAINS_SOURCE, ipr_id)
            em.ref(set_key, spec.REL_CONTAINS, spec.DOMAINS_SOURCE, ipr_id)
            # set→gene CONTAINS only when some (gene, ipr) ref resolves —
            # GeneLoader.groovy: link(setNodeId, nodeId) sits INSIDE the
            # if(interproNodeId) branch. A gene whose interpro ids ALL
            # dangle gets no set→gene edge. 'gated_edge' emits (subj,
            # pred, obj) iff (source, ext_id) resolves; never counts a
            # miss (the two companion refs above already count 2).
            em.rows.append({**_EMPTY, "kind": "gated_edge", "subj": set_key,
                            "pred": spec.REL_CONTAINS, "obj": key,
                            "source": spec.DOMAINS_SOURCE,
                            "ext_id": str(ipr_id)})
    # GeneTree nodes + IN edges (GeneLoader.groovy:37,186-193): each
    # non-empty gene-tree field becomes a name-cached GeneTree node and a
    # gene-[IN]->tree edge
    for gt_field in spec.GENE_TREE_KEYS:
        tree = t.get(gt_field)
        if tree:
            tree_key = em.node(spec.LABEL_GENE_TREE, tree)
            em.edge(key, spec.REL_IN, tree_key)
    loc = t.get("location")
    if loc and loc.get("map"):
        map_key = em.node(spec.LABEL_MAP, loc["map"])
        region_name = spec.region_node_name(loc["map"], loc["region"])
        region_key = em.node(spec.LABEL_REGION, region_name)
        em.edge(map_key, spec.REL_CONTAINS, region_key)
        em.edge(key, spec.REL_LOCATION, region_key)
        # adjacency material: chained after a per-region shuffle
        em.rows.append({**_EMPTY, "kind": "genepos", "subj": key,
                        "obj": region_key, "ext_id": str(loc["start"])})
        # taxon→map CONTAINS decided by min-_id gene per map
        em.rows.append({**_EMPTY, "kind": "maptaxon", "subj": map_key,
                        "source": spec.TAXONOMY_SOURCE,
                        "ext_id": (str(t["taxon_id"])
                                   if t.get("taxon_id") is not None else None),
                        "name": f"{t['_id']:012d}"})


# --------------------------------------------------------------- resolution

class ResolveRefs:
    """Resolver against the broadcast registry dict; misses become 'miss'
    rows (Loader.groovy:414-427 log-and-drop, upgraded to queryable
    counters).

    Used as plain TASKS over the vocab-scale ref rows (see build_kb) —
    an actor pool's spin-up costs more than the whole resolution at this
    scale; the class form remains for reference-scale vocabularies where
    per-actor registry residency pays off."""

    def __init__(self, registry_ref) -> None:
        self.reg: dict[tuple[str, str], str] = ray.get(registry_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.resolve(batch, self.reg)

    @staticmethod
    def resolve(batch: pa.Table, reg: dict) -> pa.Table:
        em = _Emitter()
        for row in batch.to_pylist():
            kind = row["kind"]
            if kind == "edge_ids":
                s = reg.get(("reactome", row["subj"]))
                o = reg.get(("reactome", row["obj"]))
                if s is None or o is None:
                    em.rows.append({**_EMPTY, "kind": "miss",
                                    "pred": row["pred"], "source": "reactome"})
                else:
                    em.rows.append({**_EMPTY, "kind": "edge", "subj": s,
                                    "pred": row["pred"], "obj": o,
                                    "props": row.get("props")})
            elif kind == "gated_edge":
                # edge gated on a registry hit (InterProSet→Gene CONTAINS:
                # GeneLoader.groovy link(setNodeId, nodeId) inside the
                # if(interproNodeId) branch); a miss emits NOTHING — the
                # companion ref rows carry the dangling counters
                if reg.get((row["source"], row["ext_id"])) is not None:
                    em.rows.append({**_EMPTY, "kind": "edge",
                                    "subj": row["subj"], "pred": row["pred"],
                                    "obj": row["obj"],
                                    "props": row.get("props")})
            elif kind == "m1prop":
                # J6 m:1 name denormalization (ReactomeLoader.groovy:271-278):
                # source node gains `<col>Name` = target's display name.
                # A dangling side emits nothing extra — the companion
                # edge_ids row already counted the dangling edge.
                s = reg.get(("reactome", row["subj"]))
                o = reg.get(("reactome", row["obj"]))
                if s is not None and o is not None:
                    _, s_label, s_name = s.split(":", 2)
                    o_name = o.split(":", 2)[2]
                    em.rows.append({
                        **_EMPTY, "kind": "node", "label": s_label,
                        "name": s_name, "extra": [],
                        "props": spec.props_json(
                            {spec.m1_prop_name(row["pred"]): o_name})})
            else:  # ref
                target = reg.get((row["source"], row["ext_id"]))
                if target is None:
                    # gene-identifier bridges probe several registries and the
                    # GO bridge probes every term; a miss is expected, not an
                    # error (GeneLoader.groovy:101-108 `if(reactomeId)`;
                    # OntologyLoader.groovy:126-129)
                    silent = (row["source"].startswith("ident:")
                              or row["source"] == "go_acc")
                    if not silent:
                        em.rows.append({**_EMPTY, "kind": "miss",
                                        "pred": row["pred"],
                                        "source": row["source"]})
                elif row["rev"]:
                    em.rows.append({**_EMPTY, "kind": "edge",
                                    "subj": target, "pred": row["pred"],
                                    "obj": row["subj"],
                                    "props": row.get("props")})
                else:
                    em.rows.append({**_EMPTY, "kind": "edge",
                                    "subj": row["subj"], "pred": row["pred"],
                                    "obj": target, "props": row.get("props")})
        return em.table()


def chain_genes_part(part: pd.DataFrame) -> pd.DataFrame:
    """Per-region FIRST_GENE/NEXT/LAST_GENE chains over every region hashed
    into this partition (GeneLoader.groovy:79-95: TreeMap iteration becomes
    an in-group sort). Per-start collisions keep the lexicographically-least
    gene key."""
    rows: list[dict] = []
    for region, g in part.groupby("obj", sort=False):
        g = g.assign(_start=g["ext_id"].astype(int)) \
             .sort_values(["_start", "subj"]) \
             .drop_duplicates("_start", keep="first")
        genes = g["subj"].tolist()
        rows.append({"subj": region, "pred": spec.REL_FIRST_GENE,
                     "obj": genes[0]})
        rows.append({"subj": region, "pred": spec.REL_LAST_GENE,
                     "obj": genes[-1]})
        rows += [{"subj": a, "pred": spec.REL_NEXT, "obj": b}
                 for a, b in zip(genes, genes[1:])]
    if not rows:
        return pd.DataFrame({"subj": pd.Series(dtype=object),
                             "pred": pd.Series(dtype=object),
                             "obj": pd.Series(dtype=object)})
    return pd.DataFrame(rows)


def merge_nodes_part(part: pd.DataFrame) -> pd.DataFrame:
    """Node-dedup reducer per hash partition (D1): union of extra labels
    (D2, Importer.groovy:125-139) + commutative props merge (the
    order-independent replacement for addPropertiesToNode's putAll,
    Importer.groovy:117-123; rule in kb/spec.py:merge_props)."""
    if part.empty:
        return pd.DataFrame({"label": pd.Series(dtype=object),
                             "name": pd.Series(dtype=object),
                             "extra": pd.Series(dtype=object),
                             "props": pd.Series(dtype=object)})

    def union_extras(series) -> list[str]:
        return sorted({e for lst in series
                       for e in (lst if lst is not None else [])})

    def fold_props(series):
        out = None
        for s in series:
            out = spec.merge_props_json(out, s)
        return out

    return part.groupby(["label", "name"], sort=False) \
        .agg(extra=("extra", union_extras),
             props=("props", fold_props)).reset_index()


# ------------------------------------------------------------------ assembly

@dataclass
class KB:
    # RAW node emission rows (label, name, extra, props) — NOT yet merged;
    # the caller runs ONE merge_nodes_part pass after unioning any derived
    # node rows (one shuffle instead of two at vocab scale)
    nodes: Dataset
    edges: Dataset                 # (subj, pred, obj, props) — deduped, pre-derive
    registry: dict                 # (source, ext_id) -> node_key
    gazetteer_rows: list = field(default_factory=list)  # (surface, key, is_primary)
    counters: dict = field(default_factory=dict)


def _kept(batch: pa.Table, kind: str, cols: list[str]) -> pa.Table:
    import pyarrow.compute as pc
    return batch.filter(pc.equal(batch["kind"], kind)).select(cols)


def build_kb(fixture_dir: str, num_partitions: int = 8) -> KB:
    """vocab parquet → KB (nodes/edges datasets + broadcast artifacts)."""
    # override_num_blocks: Ray's default read fans a small file into ~64
    # near-empty blocks (read_op_min_num_blocks) — at vocab scale that
    # block bloat, not data, dominates every downstream op. At reference
    # scale (~600k rows) raise this toward num CPUs.
    objects = rd.read_parquet(os.path.join(fixture_dir, "vocab_objects.parquet"),
                              override_num_blocks=2)
    v_edges = rd.read_parquet(os.path.join(fixture_dir, "vocab_edges.parquet"),
                              override_num_blocks=2)
    terms = rd.read_parquet(os.path.join(fixture_dir, "vocab_terms.parquet"),
                            override_num_blocks=4)

    # C5 signatureTypes: collected from the domains source BEFORE the term
    # parse (explicit stage ordering replacing the reference's hidden
    # singleton coupling, DomainLoader.groovy:13 → GeneLoader.groovy:160).
    # Driver-side is fine: this reads two columns of the vocab-scale table.
    import pyarrow.parquet as _pq
    _dom = _pq.read_table(os.path.join(fixture_dir, "vocab_terms.parquet"),
                          columns=["source", "protein_features"])
    sig_types = set()
    for src, feats in zip(_dom["source"].to_pylist(),
                          _dom["protein_features"].to_pylist()):
        if src != spec.DOMAINS_SOURCE:
            continue
        for feat in feats or []:
            parsed = parse_xref(feat)
            if parsed is not None:
                sig_types.add(parsed[0].lower())
    sig_types = frozenset(sig_types)

    emissions = objects.map_batches(parse_objects, batch_format="pyarrow") \
        .union(v_edges.map_batches(parse_object_edges, batch_format="pyarrow")) \
        .union(terms.map_batches(
            lambda t, st=sig_types: parse_terms(t, st),
            batch_format="pyarrow")) \
        .materialize()          # vocab-scale: small, reused intermediate

    # ONE driver pass over the (vocab-scale, materialized) emissions for
    # every driver-bound artifact: the broadcast registry (C3), the
    # gazetteer surface rows, and the per-map min-_id gene for the
    # taxon→map CONTAINS rule. These are broadcast/metadata artifacts by
    # design — collecting them in one iter_batches avoids three separate
    # dataset executions whose fixed cost dwarfs the data.
    import pyarrow.compute as pc
    registry: dict[tuple[str, str], str] = {}
    gazetteer_rows: list[tuple[str, str, bool]] = []
    map_min: dict[str, tuple[str, str | None, str]] = {}  # map_key -> (gene_sort, ext_id, source)
    for batch in emissions.iter_batches(batch_size=65536,
                                        batch_format="pyarrow"):
        reg = batch.filter(pc.equal(batch["kind"], "registry"))
        for s, e, k in zip(reg["source"].to_pylist(), reg["ext_id"].to_pylist(),
                           reg["subj"].to_pylist()):
            registry[(s, e)] = k
        surf = batch.filter(pc.equal(batch["kind"], "surface"))
        gazetteer_rows.extend(zip(surf["surface"].to_pylist(),
                                  surf["subj"].to_pylist(),
                                  surf["is_primary"].to_pylist()))
        mt = batch.filter(pc.equal(batch["kind"], "maptaxon"))
        for mk, nm, src, ext in zip(mt["subj"].to_pylist(),
                                    mt["name"].to_pylist(),
                                    mt["source"].to_pylist(),
                                    mt["ext_id"].to_pylist()):
            cur = map_min.get(mk)
            if cur is None or nm < cur[0]:
                map_min[mk] = (nm, ext, src)
    registry_ref = ray.put(registry)

    maptaxon_rows = [{**_EMPTY, "kind": "ref", "subj": mk,
                      "pred": spec.REL_CONTAINS, "source": src,
                      "ext_id": ext, "rev": True}
                     for mk, (_nm, ext, src) in sorted(map_min.items())
                     if ext is not None]
    maptaxon_refs = rd.from_arrow(
        pa.Table.from_pylist(maptaxon_rows, schema=EMIT_SCHEMA))

    refs = emissions.map_batches(
        lambda t: t.filter(pa.compute.is_in(
            t["kind"], pa.array(["ref", "edge_ids", "m1prop", "gated_edge"]))),
        batch_format="pyarrow")
    from ..ops.partition import group_partitioned

    # materialized: consumed thrice (edge union + m1prop node rows + miss
    # counters). Plain tasks, not an actor pool: the ref rows are
    # vocab-scale (a handful of blocks), so pool spin-up would dominate;
    # ray.get of the broadcast registry inside the task is a local
    # object-store hit
    resolved = refs.union(maptaxon_refs).map_batches(
        lambda t, ref=registry_ref: ResolveRefs.resolve(t, ray.get(ref)),
        batch_format="pyarrow").materialize()

    _ecols = ["subj", "pred", "obj", "props"]
    direct_edges = emissions.map_batches(
        lambda t: _kept(t, "edge", _ecols), batch_format="pyarrow")
    resolved_edges = resolved.map_batches(
        lambda t: _kept(t, "edge", _ecols), batch_format="pyarrow")
    chain_edges = group_partitioned(
        emissions.map_batches(
            lambda t: _kept(t, "genepos", ["subj", "obj", "ext_id"]),
            batch_format="pyarrow"),
        ["obj"], chain_genes_part, num_partitions=num_partitions) \
        .map_batches(lambda t: t.append_column(
            "props", pa.nulls(t.num_rows, pa.string())),
            batch_format="pyarrow")

    from ..ops.aggregate import dedup_merge_props
    edges = dedup_merge_props(
        direct_edges.union(resolved_edges).union(chain_edges),
        ["subj", "pred", "obj"], num_partitions=num_partitions).materialize()

    # miss counters (quarantine-not-crash policy)
    miss_df = resolved.map_batches(
        lambda t: _kept(t, "miss", ["pred", "source"]), batch_format="pyarrow") \
        .to_pandas()
    counters = {f"dangling_edge:{r.source}:{r.pred}": 0 for r in miss_df.itertuples()}
    for r in miss_df.itertuples():
        counters[f"dangling_edge:{r.source}:{r.pred}"] += 1

    # raw node rows (m1prop resolutions contribute node rows too); the
    # single D1/D2 merge shuffle runs in the caller after derived To-node
    # rows join the union
    node_rows = emissions.map_batches(
        lambda t: _kept(t, "node", ["label", "name", "extra", "props"]),
        batch_format="pyarrow") \
        .union(resolved.map_batches(
            lambda t: _kept(t, "node", ["label", "name", "extra", "props"]),
            batch_format="pyarrow"))

    return KB(nodes=node_rows, edges=edges, registry=registry,
              gazetteer_rows=gazetteer_rows, counters=counters)
