"""Pure-Python reference-semantics oracle.

A deliberately NON-distributed, dict-based implementation of the KG
construction semantics, structured like the reference's loaders
(one pass per source, in-memory surface-key registries, deferred-edge
resolution) so the Ray Data engine has an independent implementation to be
compared against in pytest (SURVEY.md §5, build plan M0).

Mirrors, loader by loader (citations into /root/reference):
  - ReactomeLoader.groovy      -> load_objects / load_object_edges
  - OntologyLoader.groovy      -> load_ontology (incl. GOLoader bridge)
  - NCBITaxonLoader.groovy     -> load_taxonomy
  - DomainLoader.groovy        -> load_domains
  - GeneLoader.groovy          -> load_genes (+ adjacency chains in `after`)
  - post-import-cypher.txt     -> derive()
  - Importer.groovy NodeCache  -> the (label, name) -> Node dict
  - Loader.groovy deferred set -> resolved at end-of-loader; misses counted
    and dropped (Loader.groovy:414-427)

Output: nodes, canonical map (connected components over DATABASE_BRIDGE),
golden triple set, per-url text hashes, quarantine counters.
"""

from __future__ import annotations

import os
from collections import Counter
from dataclasses import dataclass, field

import pyarrow.parquet as pq

from ..functions.blacklist import is_common_name
from ..functions.linking import Gazetteer, link_paragraphs
from ..functions.naming import strip_leading_zeros, underscore_to_camel
from ..functions.ontology import extract_rank, parse_relationship, relationship_pattern
from ..functions.text import extract_text, text_sha256
from ..functions.xref import parse_xref
from ..kb import spec


@dataclass
class Node:
    label: str
    name: str
    extra_labels: set[str] = field(default_factory=set)
    props: dict = field(default_factory=dict)

    @property
    def key(self) -> str:
        return spec.node_key(self.label, self.name)

    @property
    def labels(self) -> tuple[str, ...]:
        """Full label union, primary first (D2, Importer.groovy:125-139)."""
        return (self.label, *sorted(self.extra_labels - {self.label}))


class OracleKG:
    def __init__(self) -> None:
        self.nodes: dict[str, Node] = {}              # node_key -> Node
        self.edges: set[tuple[str, str, str]] = set()  # (subj_key, pred, obj_key)
        self.edge_props: dict[tuple[str, str, str], dict] = {}
        # per-source external-id registries (Loader.groovy:398 externalIdToNeoId)
        self.registry: dict[str, dict[object, str]] = {}
        # ReactomeLoader decorator caches (ReactomeLoader.groovy:155-159)
        self.identifier_cache: dict[str, dict[str, str]] = {}
        self.go_accession_cache: dict[str, str] = {}
        self.counters: Counter = Counter()
        self.signature_types: set[str] = set()        # DomainLoader.groovy:229
        self.gazetteer_rows: list[tuple[str, str, bool]] = []

    # ---------------------------------------------------------------- nodes
    def node(self, label: str, name: str, extra: set[str] | None = None,
             surface: bool = False, props: dict | None = None) -> str:
        """(label, name) upsert — NodeCache semantics (Importer.groovy:97-123).
        Label union per Importer.groovy:125-139; props merged with the
        commutative rule (kb/spec.py:merge_props, replacing the
        order-dependent putAll of addPropertiesToNode :117-123)."""
        key = spec.node_key(label, name)
        n = self.nodes.get(key)
        if n is None:
            n = Node(label, name)
            self.nodes[key] = n
            if surface:
                self.gazetteer_rows.append((name, key, True))
        if extra:
            n.extra_labels |= extra
        if props:
            n.props = spec.merge_props(n.props, props)
        return key

    def link(self, subj_key: str, pred: str, obj_key: str,
             props: dict | None = None) -> None:
        self.edges.add((subj_key, pred, obj_key))
        if props:
            t = (subj_key, pred, obj_key)
            self.edge_props[t] = spec.merge_props(self.edge_props.get(t, {}),
                                                  props)

    def link_external(self, source: str, subj_key: str, pred: str, ext_id,
                      props: dict | None = None) -> None:
        """linkToExternal + deferred resolution collapsed: the oracle defers
        by running this pass after all of a loader's nodes exist; a miss is
        counted and dropped (Loader.groovy:414-427)."""
        obj_key = self.registry.get(source, {}).get(ext_id)
        if obj_key is None:
            self.counters[f"dangling_edge:{source}:{pred}"] += 1
            return
        self.link(subj_key, pred, obj_key, props=props)

    # ------------------------------------------------------- vocab_objects
    def load_objects(self, objects) -> dict[int, str]:
        """DatabaseObject + decorator semantics (ReactomeLoader.groovy:45-66,
        119-173). Returns DB_ID -> node_key."""
        by_id: dict[int, str] = {}
        reg = self.registry.setdefault("reactome", {})
        for row in objects.to_pylist():
            cls, disp = row["_class"], row["_displayName"]
            ident, acc = row.get("identifier"), row.get("accession")
            # effective name: identifier replaces the name column for the
            # cached reference classes (ReactomeLoader.groovy:129)
            name_from_ident = cls in spec.NAME_FROM_IDENTIFIER_CLASSES and ident
            name = ident if name_from_ident else disp
            # scalar prop columns with digit promotion
            # (ReactomeLoader.groovy addProperties :248-258)
            props = {c: spec.promote_digits(row[c])
                     for c in spec.OBJECT_PROP_COLS
                     if row.get(c) is not None
                     and not (c == "identifier" and name_from_ident)}
            key = self.node(cls, name, extra={"Reactome"}, surface=True,
                            props=props)
            by_id[row["DB_ID"]] = key
            reg[row["DB_ID"]] = key
            if cls in spec.IDENTIFIER_REGISTRY_CLASSES and ident:
                self.identifier_cache.setdefault(cls, {})[ident] = key
            if cls.startswith(spec.GO_CLASS_PREFIX) and acc:
                # zero-stripped accession (ReactomeLoader.groovy:157-159)
                self.go_accession_cache[strip_leading_zeros(acc)] = key
                # remember which GO_* class for the GOLoader bridge
                self.nodes[key].extra_labels.add(cls)
        return by_id

    def load_object_edges(self, edges, by_id: dict[int, str]) -> None:
        """vocab_edges (star-schema relationship columns,
        ReactomeLoader.groovy:260-282). INPUT edges are emitted pre-flipped
        per post-import-cypher.txt:4. m:m columns (rank present) carry a
        rank edge prop (:267-270); m:1 columns denormalize the target's
        name onto the source node as `<col>Name` (J6, :271-278)."""
        for row in edges.to_pylist():
            s, o = by_id.get(row["subj_id"]), by_id.get(row["obj_id"])
            pred, rank = row["pred"], row.get("rank")
            if s is None or o is None:
                self.counters[f"dangling_edge:reactome:{spec.pred_name(pred)}"] += 1
                continue
            props = None
            if rank is not None:
                props = {"rank": int(rank)}
            else:
                self.node(self.nodes[s].label, self.nodes[s].name,
                          props={spec.m1_prop_name(pred):
                                 self.nodes[o].name})
            if pred in spec.FLIPPED_PREDS:
                s, o = o, s
            self.link(s, spec.pred_name(pred), o, props=props)

    # --------------------------------------------------------- mongo-style
    def _synonyms(self, key: str, synonyms) -> None:
        """GrameneMongoLoader.groovy:331-339: Name nodes + SYNONYM edges."""
        for s in set(synonyms or []):
            name_key = self.node(spec.LABEL_NAME, s)
            self.link(key, spec.REL_SYNONYM, name_key)
            self.gazetteer_rows.append((s, key, False))

    def _xrefs(self, key: str, xrefs) -> None:
        """GrameneMongoLoader.groovy:354-375."""
        for x in xrefs or []:
            parsed = parse_xref(x)
            if parsed is None:
                continue
            typ, val, _desc = parsed
            xkey = self.node(typ, val, extra={"Xref"})
            self.link(key, spec.REL_XREF, xkey)

    def load_ontology(self, rows: list[dict], source: str) -> None:
        """OntologyLoader.groovy:18-114 (+GOLoader bridge :117-133)."""
        reg = self.registry.setdefault(source, {})
        pat = relationship_pattern(source)
        kept = []
        for t in rows:
            if t["is_obsolete"]:
                self.counters[f"obsolete:{source}"] += 1
                continue
            extra = {source, "Ontology"}
            ns = underscore_to_camel(t.get("namespace")) if t.get("namespace") else None
            if ns:
                extra.add(ns)
            for sub in t.get("subset") or []:
                extra.add(underscore_to_camel(sub))
            key = self.node(source, t["name"], extra=extra, surface=True,
                            props={"_id": t["_id"]})
            reg[t["_id"]] = key
            kept.append((t, key))
            self._synonyms(key, t.get("synonym"))
            self._xrefs(key, t.get("xref"))
            if source == "GO":
                # GOLoader bridge: reactome GO_* node cached by zero-stripped
                # accession vs str(term _id) (OntologyLoader.groovy:122-133)
                r_key = self.go_accession_cache.get(str(t["_id"]))
                if r_key is not None:
                    self.link(r_key, spec.REL_DATABASE_BRIDGE, key)
        # second pass = deferred-edge resolution (Loader.groovy:410-427)
        for t, key in kept:
            for rship in t.get("relationship") or []:
                parsed = parse_relationship(rship, pat)
                if parsed is None:
                    continue
                rel, target = parsed
                self.link_external(source, key, rel, target)
            inter = t.get("intersection_of") or []
            if inter:
                # `def (Long id, String name) = intersections`
                # (OntologyLoader.groovy:91-96)
                self.link_external(source, key, spec.REL_INTERSECTION, int(inter[0]))
                if len(inter) > 1:
                    parsed = parse_relationship(inter[1], pat)
                    if parsed is not None:
                        self.link_external(source, key, parsed[0], parsed[1])
            # leftover collection keys -> dynamic rels named KEY.upper()
            # (OntologyLoader.groovy:56-67 findOtherRelations/createOtherRels:
            # is_a -> IS_A, consider -> CONSIDER, any future column alike)
            for rel_name, ids in spec.leftover_collections(t):
                for target in ids:
                    self.link_external(source, key, rel_name, target)

    def load_taxonomy(self, rows: list[dict]) -> None:
        """NCBITaxonLoader.groovy:175-215. ALT_ID is dead code (preprocess
        removes alt_id first — GrameneMongoLoader.groovy:312; SURVEY.md §2.11)."""
        reg = self.registry.setdefault(spec.TAXONOMY_SOURCE, {})
        kept = []
        for t in rows:
            extra = {"NCBITaxonomy"}
            rank = extract_rank(t.get("property_value"))
            if rank:
                extra.add(rank)
            key = self.node(spec.LABEL_TAXON, t["name"], extra=extra,
                            surface=True, props={"_id": t["_id"]})
            reg[t["_id"]] = key
            kept.append((t, key))
            self._synonyms(key, t.get("synonym"))
            self._xrefs(key, t.get("xref"))
        for t, key in kept:
            is_a = t.get("is_a") or []
            if is_a:            # first parent only (NCBITaxonLoader.groovy:204-214)
                self.link_external(spec.TAXONOMY_SOURCE, key,
                                   spec.REL_SUPER_TAXON, is_a[0])

    def load_domains(self, rows: list[dict]) -> None:
        """DomainLoader.groovy:224-264. Descriptor entries (protein_features
        "KEY:value" in the fixture flattening) become InterProSignature nodes
        + CONTRIBUTES_TO; keys feed signatureTypes (consumed by GeneLoader)."""
        reg = self.registry.setdefault(spec.DOMAINS_SOURCE, {})
        for t in rows:
            extra: set[str] = set()
            props: dict = {"_id": t["_id"]}
            for x in t.get("xref") or []:
                parsed = parse_xref(x)
                # `type` is a NODE_PROP_KEY (DomainLoader.groovy:227) and an
                # extra label (DomainLoader.groovy:244)
                if parsed and parsed[0] == "type":
                    extra.add(parsed[1])
                    props["type"] = parsed[1]
            key = self.node(spec.LABEL_INTERPRO, t["name"], extra=extra,
                            surface=True, props=props)
            reg[t["_id"]] = key
            for feat in t.get("protein_features") or []:
                parsed = parse_xref(feat)
                if parsed is None:
                    continue
                ftype, fname, _ = parsed
                self.signature_types.add(ftype.lower())
                sig_key = self.node(ftype, fname,
                                    extra={spec.LABEL_INTERPRO_SIGNATURE})
                self.link(sig_key, spec.REL_CONTRIBUTES_TO, key)

    def load_genes(self, rows: list[dict]) -> None:
        """GeneLoader.groovy:37-219 (+ adjacency chains from after())."""
        adjacency: dict[str, dict[int, str]] = {}
        known_sets: set[str] = set()
        # taxon→map CONTAINS: decided by the min-_id gene per map (the
        # commutative replacement for the reference's 'first gene creating
        # the map' row-order rule, GeneLoader.groovy:162-165) — identical to
        # the engine's map_min reduction (stages/vocab.py)
        map_taxon: dict[str, tuple[int, object]] = {}  # map_key -> (_id, taxon_id)
        for g in rows:
            # leftover scalars -> props (GeneLoader.groovy:22-40: _id as
            # string, gene_id, location start/end/strand; Groovy
            # `findAll{it.key && it.value}` drops null/empty)
            loc0 = g.get("location")
            props: dict = {"_id": str(g["_id"])}
            if g.get("gene_id"):
                props["gene_id"] = g["gene_id"]
            if loc0:
                for fk in ("start", "end", "strand"):
                    if loc0.get(fk):
                        props[fk] = loc0[fk]
            # non-signature protein features -> array props via the direct
            # setNodeProperty path (GeneLoader.groovy:181); signature-typed
            # features are ignored (:160-162)
            feat_by_type: dict[str, list[str]] = {}
            for feat in g.get("protein_features") or []:
                parsed = parse_xref(feat)
                if parsed is None:
                    continue
                ftype, fname, _ = parsed
                if ftype.lower() in self.signature_types:
                    continue
                feat_by_type.setdefault(ftype, []).append(fname)
            for ftype, fnames in feat_by_type.items():
                props[ftype] = sorted(fnames)
            key = self.node("Gene", g["name"], surface=True, props=props)
            # linkToReactome (GeneLoader.groovy:101-108)
            if g.get("gene_id"):
                for cls in sorted(spec.IDENTIFIER_REGISTRY_CLASSES):
                    r_key = self.identifier_cache.get(cls, {}).get(g["gene_id"])
                    if r_key is not None:
                        self.link(r_key, spec.REL_DATABASE_BRIDGE, key)
            # linkToTaxon (GeneLoader.groovy:145-154)
            taxon_key = None
            if g.get("taxon_id") is not None:
                taxon_key = self.registry.get(spec.TAXONOMY_SOURCE, {}).get(g["taxon_id"])
                if taxon_key is None:
                    # counter keyed by registry source, matching the engine's
                    # ResolveRefs miss rows (stages/vocab.py)
                    self.counters[
                        f"dangling_edge:{spec.TAXONOMY_SOURCE}:"
                        f"{spec.REL_SPECIES}"] += 1
                else:
                    self.link(key, spec.REL_SPECIES, taxon_key)
            # ontology xrefs (GeneLoader.groovy:110-143); goslim_goa is
            # selected then skipped entirely (:88); evidence codes become
            # edge props (createOntologyXrefs :84-117)
            for x in g.get("xref") or []:
                parsed = parse_xref(x)
                if parsed is None:
                    continue
                typ, val, _ = parsed
                if typ in spec.GENE_ONTOLOGY_XREF_SKIPPED:
                    continue
                if typ in spec.GENE_ONTOLOGY_XREF_KEYS:
                    oid, evidence = spec.parse_ontology_xref_value(val)
                    self.link_external(
                        typ, key, spec.REL_ONTOLOGY_REF, oid,
                        props={"evidence": evidence} if evidence else None)
                else:
                    xkey = self.node(typ, val, extra={"Xref"})
                    self.link(key, spec.REL_XREF, xkey)
            # interpro -> InterProSet + CONTAINS (GeneLoader.groovy:186-204)
            ipr = sorted(g.get("interpro") or [])
            if ipr:
                set_name = spec.interpro_set_name(ipr)
                is_new = spec.node_key(spec.LABEL_INTERPRO_SET, set_name) not in known_sets
                set_key = self.node(spec.LABEL_INTERPRO_SET, set_name)
                known_sets.add(set_key)
                for ipr_id in ipr:
                    d_key = self.registry.get(spec.DOMAINS_SOURCE, {}).get(ipr_id)
                    if d_key is None:
                        # two probes per (gene, ipr) — gene-CONTAINS and
                        # set-CONTAINS — mirroring the engine's two ref
                        # emissions through ResolveRefs
                        self.counters[
                            f"dangling_edge:{spec.DOMAINS_SOURCE}:"
                            f"{spec.REL_CONTAINS}"] += 2
                        continue
                    self.link(key, spec.REL_CONTAINS, d_key)
                    if is_new:
                        self.link(set_key, spec.REL_CONTAINS, d_key)
                    self.link(set_key, spec.REL_CONTAINS, key)
            # GeneTree nodes + IN edges (GeneLoader.groovy:37,186-193):
            # popped fields epl_gene_tree/eg_gene_tree, each non-empty value
            # becomes a cached GeneTree node + gene-[IN]->tree edge
            for gt_field in spec.GENE_TREE_KEYS:
                tree = g.get(gt_field)
                if tree:
                    tree_key = self.node(spec.LABEL_GENE_TREE, tree)
                    self.link(key, spec.REL_IN, tree_key)
            # protein features that are NOT interpro signatures stay props
            # (GeneLoader.groovy:176-209) — no edges
            # location (GeneLoader.groovy:156-174)
            loc = g.get("location")
            if loc and loc.get("map"):
                map_name = loc["map"]
                region_name = spec.region_node_name(map_name, loc["region"])
                map_key = self.node(spec.LABEL_MAP, map_name)
                cur = map_taxon.get(map_key)
                if cur is None or g["_id"] < cur[0]:
                    map_taxon[map_key] = (g["_id"], g.get("taxon_id"))
                region_key = spec.node_key(spec.LABEL_REGION, region_name)
                region_is_new = region_key not in self.nodes
                region_key = self.node(spec.LABEL_REGION, region_name)
                if region_is_new:
                    self.link(map_key, spec.REL_CONTAINS, region_key)
                self.link(key, spec.REL_LOCATION, region_key)
                # per-(region, start) collisions keep the lexicographically-
                # least gene key (deterministic replacement for the TreeMap's
                # insertion-order overwrite, GeneLoader.groovy:97-98)
                slot = adjacency.setdefault(region_key, {})
                if loc["start"] not in slot or key < slot[loc["start"]]:
                    slot[loc["start"]] = key
        # taxon→map CONTAINS from the per-map min-_id gene; a present-but-
        # unresolvable taxon_id is a dangling ref (engine: maptaxon ref
        # through ResolveRefs, source=taxonomy)
        for map_key, (_gid, taxon_id) in map_taxon.items():
            if taxon_id is None:
                continue
            t_key = self.registry.get(spec.TAXONOMY_SOURCE, {}).get(taxon_id)
            if t_key is None:
                self.counters[
                    f"dangling_edge:{spec.TAXONOMY_SOURCE}:"
                    f"{spec.REL_CONTAINS}"] += 1
            else:           # reversed: taxon CONTAINS map (engine rev=True)
                self.link(t_key, spec.REL_CONTAINS, map_key)
        # after(): FIRST_GENE / NEXT / LAST_GENE chains (GeneLoader.groovy:79-95)
        for region_key, by_start in adjacency.items():
            ordered = [by_start[s] for s in sorted(by_start)]
            self.link(region_key, spec.REL_FIRST_GENE, ordered[0])
            for prev, nxt in zip(ordered, ordered[1:]):
                self.link(prev, spec.REL_NEXT, nxt)
            self.link(region_key, spec.REL_LAST_GENE, ordered[-1])

    # ------------------------------------------------------- derived edges
    def derive(self) -> None:
        """post-import-cypher.txt rewrites, on set-semantics edges (the
        Cypher `merge`s are the dedup)."""
        label = {k: n.label for k, n in self.nodes.items()}
        phys = {k for k, l in label.items() if l in spec.PHYSICAL_ENTITY_CLASSES}
        event = {k for k, l in label.items() if l in spec.EVENT_CLASSES}
        common = {k for k in phys if is_common_name(self.nodes[k].name)}  # line 6

        inputs = [(s, o) for s, p, o in self.edges
                  if p == "INPUT" and s in phys and o in event]
        outputs = [(s, o) for s, p, o in self.edges
                   if p == "OUTPUT" and s in event and o in phys]
        out_by_event: dict[str, list[str]] = {}
        for r, p in outputs:
            out_by_event.setdefault(r, []).append(p)
        in_by_event: dict[str, list[str]] = {}
        for s, r in inputs:
            in_by_event.setdefault(r, []).append(s)

        # line 10: entity TO entity
        to_pairs: set[tuple[str, str]] = set()
        for s, r in inputs:
            if s in common:
                continue
            for p in out_by_event.get(r, []):
                if p not in common:
                    to_pairs.add((s, p))
                    self.link(s, spec.REL_TO, p)
        # line 12: event TO event (via non-common intermediate)
        for r1, p in outputs:
            if p in common:
                continue
            for s2, r2 in inputs:
                if s2 == p:
                    self.link(r1, spec.REL_TO, r2)
        # line 14: To reification for SimpleEntity pairs
        species_of = {}
        for s, p, o in self.edges:
            if p == spec.REL_SPECIES and s in event:
                species_of.setdefault(s, []).append(o)
        for a, b in sorted(to_pairs):
            if label.get(a) != "SimpleEntity" or label.get(b) != "SimpleEntity":
                continue
            for r in [r for (s, r) in inputs if s == a]:
                if b in out_by_event.get(r, []):
                    for sp in species_of.get(r, []):
                        to_key = self.node(spec.LABEL_TO_NODE, f"{a}|{b}")
                        self.link(a, spec.REL_VIA, to_key)
                        self.link(to_key, spec.REL_VIA, b)
                        self.link(to_key, spec.REL_RXN, r)
                        self.link(to_key, spec.REL_SPECIES, sp)
        # line 16: ENCODED_BY bounded closure
        hop: dict[str, list[str]] = {}
        for s, p, o in self.edges:
            if p in spec.ENCODED_BY_HOP_PREDS:
                hop.setdefault(s, []).append(o)
        ca_of = [(s, o) for s, p, o in self.edges if p == "CATALYST_ACTIVITY"
                 and label.get(s) == "Reaction"]
        pe_of: dict[str, list[str]] = {}
        for s, p, o in self.edges:
            if p == "PHYSICAL_ENTITY":
                pe_of.setdefault(s, []).append(o)
        for rxn, ca in ca_of:
            for start in pe_of.get(ca, []):
                frontier, seen = {start}, set()
                for _ in range(spec.ENCODED_BY_MAX_HOPS):
                    frontier = {t for f in frontier for t in hop.get(f, [])} - seen
                    seen |= frontier
                for gp in seen:
                    if label.get(gp) == "ReferenceGeneProduct":
                        self.link(rxn, spec.REL_ENCODED_BY, gp)
        # line 17: hop ENCODED_BY through DATABASE_BRIDGE to Gene
        bridge_to_gene: dict[str, list[str]] = {}
        for s, p, o in list(self.edges):
            if p == spec.REL_DATABASE_BRIDGE and label.get(o) == "Gene":
                bridge_to_gene.setdefault(s, []).append(o)
        for s, p, o in list(self.edges):
            if p == spec.REL_ENCODED_BY and label.get(o) == "ReferenceGeneProduct":
                for g in bridge_to_gene.get(o, []):
                    self.link(s, spec.REL_ENCODED_BY, g)
        # line 19: METABOLITE_LINK (edge-distinctness => r2 != r)
        reactions = {k for k, l in label.items() if l == "Reaction"}
        for i, r in inputs:
            if r not in reactions or i in common:
                continue
            for o in out_by_event.get(r, []):
                if o in common:
                    continue
                for i2, r2 in inputs:
                    if i2 == i and r2 != r and o in out_by_event.get(r2, []):
                        self.link(r, spec.REL_METABOLITE_LINK, r2)
        # lines 21-23: name-equality DATABASE_BRIDGEs
        refdb = {k for k, n in self.nodes.items()
                 if n.label == "ReferenceDatabase"}
        adj_refdb: dict[str, set[str]] = {}
        for s, p, o in self.edges:
            if s in refdb:
                adj_refdb.setdefault(o, set()).add(self.nodes[s].name)
            if o in refdb:
                adj_refdb.setdefault(s, set()).add(self.nodes[o].name)
        taxon_by_id = {str(_id): k
                       for _id, k in self.registry.get(spec.TAXONOMY_SOURCE, {}).items()}
        ec_nodes = {n.name: k for k, n in self.nodes.items() if n.label == "EC"}
        for k, n in self.nodes.items():
            if n.label != "DatabaseIdentifier":
                continue
            dbs = adj_refdb.get(k, set())
            if spec.REFDB_NCBI_TAXONOMY in dbs and n.name in taxon_by_id:
                self.link(k, spec.REL_DATABASE_BRIDGE, taxon_by_id[n.name])
            if spec.REFDB_EC in dbs and n.name in ec_nodes:
                self.link(k, spec.REL_DATABASE_BRIDGE, ec_nodes[n.name])

    # ----------------------------------------------------- canonicalization
    def canonical_map(self) -> dict[str, str]:
        """Union-find over DATABASE_BRIDGE pairs; canonical = min key."""
        parent: dict[str, str] = {}

        def find(x: str) -> str:
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for s, p, o in self.edges:
            if p != spec.REL_DATABASE_BRIDGE:
                continue
            rs, ro = find(s), find(o)
            if rs != ro:
                lo, hi = sorted((rs, ro))
                parent[hi] = lo
        return {k: find(k) for k in self.nodes if find(k) != k} | \
               {k: k for k in self.nodes if find(k) == k}

    def final_triples(self, canonical: dict[str, str]) -> set[tuple[str, str, str]]:
        """Canonical edge set: bridges dropped (they became the merge)."""
        out = set()
        for s, p, o in self.edges:
            if p == spec.REL_DATABASE_BRIDGE:
                continue
            out.add((canonical.get(s, s), p, canonical.get(o, o)))
        return out

    def final_edge_props(self, canonical: dict[str, str]) \
            -> dict[tuple[str, str, str], str]:
        """Canonical-endpoint edge props; edges collapsing onto one
        canonical triple merge commutatively. Values are canonical-JSON
        strings (the engine's edges.parquet `props` column format)."""
        out: dict[tuple[str, str, str], dict] = {}
        for (s, p, o), props in self.edge_props.items():
            if p == spec.REL_DATABASE_BRIDGE or not props:
                continue
            t = (canonical.get(s, s), p, canonical.get(o, o))
            out[t] = spec.merge_props(out.get(t, {}), props)
        return {t: spec.props_json(d) for t, d in out.items() if d}


def run_oracle(fixture_dir: str) -> dict:
    """Full oracle over one fixture dir; returns the golden artifacts."""
    kg = OracleKG()
    objects = pq.read_table(os.path.join(fixture_dir, "vocab_objects.parquet"))
    v_edges = pq.read_table(os.path.join(fixture_dir, "vocab_edges.parquet"))
    terms = pq.read_table(os.path.join(fixture_dir, "vocab_terms.parquet")).to_pylist()

    by_id = kg.load_objects(objects)
    kg.load_object_edges(v_edges, by_id)
    # loader order per Importer.groovy:21-24 (EO GO GRO PO SO TO);
    # with commutative canonicalization the order is immaterial (SURVEY §7.4)
    for source in ("EO", "GO", "GRO", "PO", "SO", "TO"):
        kg.load_ontology([t for t in terms if t["source"] == source], source)
    kg.load_taxonomy([t for t in terms if t["source"] == spec.TAXONOMY_SOURCE])
    kg.load_domains([t for t in terms if t["source"] == spec.DOMAINS_SOURCE])
    kg.load_genes([t for t in terms if t["source"] == spec.GENES_SOURCE])
    kg.derive()

    canonical = kg.canonical_map()
    kb_triples = kg.final_triples(canonical)
    gaz = Gazetteer.build(kg.gazetteer_rows)

    # page pass: extract + link, single process
    pages = pq.read_table(os.path.join(fixture_dir, "pages"))
    text_hashes: dict[str, str | None] = {}
    page_triples: set[tuple[str, str, str]] = set()
    mentions: dict[str, int] = {}
    miss_counts: dict[tuple[str, str], int] = {}
    n_miss = 0
    for row in pages.to_pylist():
        text = extract_text(row["html"])
        text_hashes[row["url"]] = None if text is None else text_sha256(text)
        if text is None:
            kg.counters["quarantined_pages"] += 1
            continue
        triples, misses = link_paragraphs(text, gaz, canonical)
        n_miss += len(misses)
        for surface, role in misses:
            miss_counts[(surface, role)] = miss_counts.get((surface, role),
                                                           0) + 1
        for s, p, o, _conf in triples:
            page_triples.add((s, p, o))
        # full-text mention scan (A4 frequency analysis), canonical ids
        for nk, n in gaz.mention_counts(text).items():
            ck = canonical.get(nk, nk)
            mentions[ck] = mentions.get(ck, 0) + n
    kg.counters["unlinked_mentions"] = n_miss

    return {
        # (label, name, canonical_id, labels-union, props-json) per node
        "nodes": {k: (n.label, n.name, canonical[k], n.labels,
                      spec.props_json(n.props))
                  for k, n in kg.nodes.items()},
        "edge_props": kg.final_edge_props(canonical),
        "canonical": canonical,
        "kb_triples": kb_triples,
        "page_triples": page_triples,
        "triples": kb_triples | page_triples,
        "text_hashes": text_hashes,
        "mentions": mentions,
        "miss_counts": miss_counts,
        "counters": dict(kg.counters),
        "gazetteer": gaz,
    }
