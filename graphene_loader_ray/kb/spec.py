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

# node labels minted by the loaders themselves
LABEL_NAME = "Name"            # synonym nodes (GrameneMongoLoader.groovy:334)
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


def interpro_set_name(ipr_ids: list[int]) -> str:
    """Canonical sorted-set name (GeneLoader.groovy:188-189)."""
    return "; ".join(f"IPR{i:06d}" for i in sorted(ipr_ids))


def region_node_name(map_name: str, region: str) -> str:
    """'oops, all chromosome 1s were the same' fix (GeneLoader.groovy:158,167)."""
    return f"{map_name}:{region}"
