"""The KG construction spec — constants shared by the oracle and the engine.

The reference (ajo2995/graphene-loader) defines WHAT is computed; this module
pins those semantics as data so the single-process oracle
(``oracle/kg.py``) and the Ray Data engine (``stages/``) implement the SAME
contract from two independent code paths. Every constant cites the reference
file:line it mirrors (paths relative to /root/reference).

Identity model
--------------
Node identity = ``(label, name)`` — the NodeCache key
(``src/main/groovy/graphene/Importer.groovy:97-103``). The reference's
physical Neo4j ids (sequence numbers / grandfathered Reactome DB_IDs,
``Loader.groovy:57-60``) are replaced by deterministic, content-derived keys
``N:{label}:{name}`` so any worker mints the same id independently
(idempotent re-load; SURVEY.md §4).

Canonicalization = connected components over DATABASE_BRIDGE same-as pairs
(``Loader.groovy Rels.DATABASE_BRIDGE``; emitted by GeneLoader.groovy:101-108,
OntologyLoader.groovy:122-133, post-import-cypher.txt:21-23).
``canonical_id(node) = min(node_key over its component)`` (lexicographic) —
a commutative, order-independent merge rule replacing the reference's
order-dependent upsert (SURVEY.md §7.4). Bridge edges are then dropped from
the final edge table (they became the merge); all other edges survive with
canonical endpoints, deduplicated on (subj, pred, obj)
(post-import-cypher.txt merge semantics).
"""

from __future__ import annotations

import json
import re

# ---------------------------------------------------------------- node keys


def node_key(label: str, name: str) -> str:
    """Deterministic node id: the NodeCache key (Importer.groovy:97-103)."""
    return f"N:{label}:{name}"


def to_pair_key(a: str, b: str) -> str:
    """Reified To{between, and} node key (post-import-cypher.txt:14)."""
    return f"To:{a}|{b}"


# ------------------------------------------------- vocab_objects semantics

# Decorator classes whose nodes are indexed by `identifier` for the gene
# bridge (ReactomeLoader.groovy:125,155-157 caches DatabaseIdentifier and
# ReferenceEntity; ReferenceGeneProduct is this corpus's ReferenceEntity-
# shaped class and carries the gene identifiers in the fixtures).
IDENTIFIER_REGISTRY_CLASSES = frozenset(
    {"DatabaseIdentifier", "ReferenceEntity", "ReferenceGeneProduct"})

# Classes whose effective node NAME is the identifier column
# (ReactomeLoader.groovy:129: `cols.name = cols.remove('identifier')`).
NAME_FROM_IDENTIFIER_CLASSES = frozenset({"DatabaseIdentifier", "ReferenceEntity"})

# GO_* decorator classes are indexed by zero-stripped accession
# (ReactomeLoader.groovy:126,157-159).
GO_CLASS_PREFIX = "GO_"

# Labels that play the :PhysicalEntity / :Event roles in the post-load
# Cypher (post-import-cypher.txt:4-19). The reference's star schema gives
# those nodes the PhysicalEntity/Event labels via decorator tables; the
# fixture's single `_class` column enumerates the concrete classes.
PHYSICAL_ENTITY_CLASSES = frozenset({"SimpleEntity", "Complex", "ReferenceGeneProduct"})
EVENT_CLASSES = frozenset({"Reaction", "Pathway"})

# vocab_edges.pred values are snake_case column names; relationship names are
# CONSTANT_CASE (ReactomeLoader.groovy:264,284-287 — camelCase column →
# CONSTANT_CASE; our snake_case source needs only upper()).
def pred_name(col: str) -> str:
    return col.upper()


# The INPUT edge is flipped to (PhysicalEntity)-[:INPUT]->(Event) by the
# first post-load rewrite (post-import-cypher.txt:4); we emit it flipped at
# the source so the rewrite stage disappears.
FLIPPED_PREDS = frozenset({"input"})

# ---------------------------------------------------- vocab_terms semantics

ONTOLOGY_SOURCES = ("GO", "PO", "TO", "EO", "SO", "GRO")   # OntologyLoader subclasses
TAXONOMY_SOURCE = "taxonomy"                                # NCBITaxonLoader
GENES_SOURCE = "genes"                                      # GeneLoader
DOMAINS_SOURCE = "domains"                                  # DomainLoader

# Gene xref keys routed to ONTOLOGY_REF links (GeneLoader.groovy:55,110-143);
# 'goslim_goa' is explicitly skipped (GeneLoader.groovy:113).
GENE_ONTOLOGY_XREF_KEYS = frozenset({"GO", "TO", "PO", "EO", "GRO", "SO"})

# Fixed relationship enum (Loader.groovy:486-492). ALT_ID is dead code —
# preprocess removes alt_id before NCBITaxonLoader reads it
# (GrameneMongoLoader.groovy:312, NCBITaxonLoader.groovy:187) — so the
# golden set contains NO ALT_ID edges (SURVEY.md §2.11).
REL_SUPER_TAXON = "SUPER_TAXON"
REL_SYNONYM = "SYNONYM"
REL_XREF = "XREF"
REL_ONTOLOGY_REF = "ONTOLOGY_REF"
REL_INTERSECTION = "INTERSECTION"
REL_CONTRIBUTES_TO = "CONTRIBUTES_TO"
REL_CONTAINS = "CONTAINS"
REL_SPECIES = "SPECIES"
REL_LOCATION = "LOCATION"
REL_DATABASE_BRIDGE = "DATABASE_BRIDGE"
REL_NEXT = "NEXT"
REL_FIRST_GENE = "FIRST_GENE"
REL_LAST_GENE = "LAST_GENE"

# Derived-edge preds (post-import-cypher.txt)
REL_TO = "TO"
REL_VIA = "VIA"
REL_RXN = "RXN"
REL_ENCODED_BY = "ENCODED_BY"
REL_METABOLITE_LINK = "METABOLITE_LINK"

# Dynamic rel minted by createGenetrees (GeneLoader.groovy:186-193:
# `DynamicRelationshipType.withName('IN')`).
REL_IN = "IN"

# node labels minted by the loaders themselves
LABEL_NAME = "Name"            # synonym nodes (GrameneMongoLoader.groovy:334)
LABEL_GENE_TREE = "GeneTree"   # GeneLoader.groovy:188 `labels.GeneTree`
LABEL_MAP = "Map"              # GeneLoader.groovy:159
LABEL_REGION = "Region"        # GeneLoader.groovy:160
LABEL_INTERPRO = "InterPro"    # DomainLoader.groovy:244
LABEL_INTERPRO_SET = "InterProSet"  # GeneLoader.groovy:191
LABEL_TO_NODE = "To"           # post-import-cypher.txt:14
LABEL_TAXON = "Taxon"          # NCBITaxonLoader.groovy:183

# ENCODED_BY closure preds and bound (post-import-cypher.txt:16:
# [:HAS_MEMBER|HAS_COMPONENT|REFERENCE_ENTITY*..3])
ENCODED_BY_HOP_PREDS = frozenset({"HAS_MEMBER", "HAS_COMPONENT", "REFERENCE_ENTITY"})
ENCODED_BY_MAX_HOPS = 3

# J7 name-equality bridges (post-import-cypher.txt:21-23)
REFDB_NCBI_TAXONOMY = "NCBI Taxonomy"
REFDB_EC = "EC"

# Domain descriptor handling (DomainLoader.groovy:226-259): keys in
# NODE_PROP_KEYS stay node props; others become signature nodes + the
# signatureTypes set consumed by GeneLoader.groovy:184-185.
DOMAIN_NODE_PROP_KEYS = frozenset(
    {"_id", "id", "name", "short_name", "synonym", "type", "description", "abstract"})
LABEL_INTERPRO_SIGNATURE = "InterProSignature"


# ------------------------------------------------------------- property maps
#
# Node/edge property semantics mirrored from the reference:
#   - scalar props merged onto cached nodes, collections dropped in the
#     cached merge (Importer.groovy addPropertiesToNode ~117-123) but
#     stored as arrays on direct sets (Loader.groovy:102-107) — the two
#     policies are applied AT EMISSION (cached-merge sites never emit
#     collections; direct-set sites may), so the merge itself is uniform
#   - digit-string promotion to int before storing (ReactomeLoader.groovy
#     addProperties :248-258); edge `rank` likewise (:267-270)
#   - m:1 relationship columns denormalize the target's name onto the
#     source node as `<rship>Name` (ReactomeLoader.groovy:271-278)
#   - gene ontology xrefs carry the evidence code as an edge prop
#     (GeneLoader.groovy createOntologyXrefs :84-117)
#
# The reference's merge is last-writer-wins (order-dependent); ours is the
# commutative rule SURVEY.md §7.4 requires: per key, conflicting values
# resolve to the least by canonical-JSON ordering — deterministic under any
# parallel schedule. Props serialize as a canonical JSON object string
# (sorted keys) so Arrow carries one nullable string column.

_ALL_DIGITS = re.compile(r"\d+\Z")


def promote_digits(v):
    """ReactomeLoader.groovy:252-254: string of digits -> int."""
    if isinstance(v, str) and _ALL_DIGITS.match(v):
        return int(v)
    return v


def props_json(props: dict | None) -> str | None:
    """Canonical serialized form (sorted keys, compact); None when empty."""
    if not props:
        return None
    return json.dumps(props, sort_keys=True, separators=(",", ":"),
                      ensure_ascii=False)


def parse_props(s: str | None) -> dict:
    return json.loads(s) if s else {}


def _value_order(v) -> str:
    return json.dumps(v, sort_keys=True, ensure_ascii=False)


def merge_props(a: dict, b: dict) -> dict:
    """Commutative per-key merge: union of keys; on conflict the value that
    is least in canonical-JSON order wins (SURVEY.md §7.4)."""
    out = dict(a)
    for k, v in b.items():
        cur = out.get(k)
        if cur is None and k not in out:
            out[k] = v
        elif cur != v:
            out[k] = min(cur, v, key=_value_order)
    return out


def merge_props_json(a: str | None, b: str | None) -> str | None:
    if not a:
        return b or None
    if not b:
        return a
    if a == b:
        return a
    return props_json(merge_props(parse_props(a), parse_props(b)))


def m1_prop_name(pred_col: str) -> str:
    """snake_case m:1 relationship column -> `<camelCol>Name` prop key
    (ReactomeLoader.groovy:271-278; the reference's columns are camelCase
    already — ours are snake_case by fixture manifest, so camelize)."""
    parts = pred_col.split("_")
    camel = parts[0] + "".join(p.capitalize() for p in parts[1:])
    return camel + "Name"


def parse_ontology_xref_value(val: str) -> tuple[int, str | None]:
    """Gene ontology-xref value: `"1234"` or `"1234|IEA"` (fixture
    flattening of the reference's {evidence_code: [ids]} maps,
    GeneLoader.groovy:84-117) -> (term id, evidence code or None)."""
    if "|" in val:
        i, ev = val.split("|", 1)
        return int(i), ev
    return int(val), None


# Declared scalar-prop columns of vocab_objects (the fixture manifest's
# flattening of the reference's "scalar columns become props" convention,
# ReactomeLoader.groovy:301-315); `identifier` is consumed as the node name
# for NAME_FROM_IDENTIFIER_CLASSES and is NOT also a prop there
# (ReactomeLoader.groovy:129 `cols.name = cols.remove('identifier')`).
OBJECT_PROP_COLS = ("identifier", "accession", "ec_number")

# Gene ontology-xref keys the reference selects into ontologyXrefs but then
# skips entirely in createOntologyXrefs (GeneLoader.groovy:88) — they
# produce NO output (not even an Xref node).
GENE_ONTOLOGY_XREF_SKIPPED = frozenset({"goslim_goa"})


# Gene-tree fields popped before node creation and turned into GeneTree
# nodes + IN edges (GeneLoader.groovy:37 `[gene.remove('epl_gene_tree'),
# gene.remove('eg_gene_tree')]` → createGenetrees :186-193). Order mirrors
# the reference's list literal (immaterial under edge dedup).
GENE_TREE_KEYS = ("epl_gene_tree", "eg_gene_tree")

# ---------------------- generalized leftover-collection dynamic relationships
#
# OntologyLoader.groovy:56-67: after the reserved keys are popped, ANY
# remaining collection-valued key becomes a dynamically-named relationship
# `KEY.toUpperCase()` whose values are same-ontology term ids resolved via
# linkToExternal (miss → logged+dropped). In this fixture manifest the term
# record schema is fixed, so "leftover" = every column NOT consumed by a
# dedicated loader path below; the mechanism stays generic — adding a new
# collection column to vocab_terms (e.g. `consider`, `replaced_by`) flows
# through with no engine/oracle change.
ONTOLOGY_RESERVED_KEYS = frozenset({
    # identity/bookkeeping columns of the fixture flattening
    "_id", "source", "name", "label", "is_obsolete",
    # popped by preprocess (GrameneMongoLoader.groovy:45-56)
    "property_value",
    # popped by OntologyLoader.process (OntologyLoader.groovy:33-41)
    "synonym", "xref", "relationship", "intersection_of", "subset",
    "namespace",
    # gene/taxon/domain-only columns (other loaders' dedicated paths)
    "taxon_id", "gene_id", "interpro", "protein_features", "location",
    *GENE_TREE_KEYS,
})


def leftover_collections(term: dict) -> list[tuple[str, list]]:
    """findOtherRelations (OntologyLoader.groovy:65-67): the non-reserved
    collection-valued keys of one term record, as (KEY.upper(), ids) sorted
    by key for determinism (emission order is immaterial — edges dedup and
    misses count per (source, pred))."""
    return sorted((k.upper(), v) for k, v in term.items()
                  if k not in ONTOLOGY_RESERVED_KEYS
                  and isinstance(v, list) and v)


def interpro_set_name(ipr_ids: list[int]) -> str:
    """Canonical sorted-set name (GeneLoader.groovy:188-189)."""
    return "; ".join(f"IPR{i:06d}" for i in sorted(ipr_ids))


def region_node_name(map_name: str, region: str) -> str:
    """'oops, all chromosome 1s were the same' fix (GeneLoader.groovy:158,167)."""
    return f"{map_name}:{region}"
