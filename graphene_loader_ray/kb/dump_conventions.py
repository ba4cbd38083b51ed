"""Name-convention classifier for Reactome-style MySQL dumps — the rules
BOTH the engine (pipelines/dump_graph.py) and the oracle
(oracle/dump_graph.py) dispatch on, pinned here so the two implementations
cannot drift (CLAUDE.md: shared semantics live in kb/ + functions/).

This closes the one SURVEY §2 gap (M9): the reference infers table roles
and column roles from NAME CONVENTIONS at runtime, so pointing it at a dump
with unseen satellite tables needs no code change. Every rule cites the
reference line it mirrors (paths relative to /root/reference):

Table roles (ReactomeLoader.groovy:81-111 ``getAndOrganizeFilesFrom`` —
a Groovy switch of FULL-match regexes, first hit wins):
  'DatabaseObject' | 'DataModel' | 'Ontology'            -> special
  .*_2_name.* | .*_2_synonym.* | .*_2_ec.* | .*_2_chain.*
    | .*_2_otherIdentifier.* | .*_2_secondCoordinate.*
    | ReferenceSequence_2_.*                             -> newnodes
  .*_2_.*                                                -> relationships
  (anything else)                                        -> decorators

Column roles (ReactomeLoader.groovy:291-315):
  - a column ending ``_class`` marks a RELATIONSHIP named by the prefix
    (``findRelationships`` strips the 6-char suffix): the twin column
    ``<rship>`` holds the referent DB_ID, ``<rship>_class`` its class
  - props = remaining columns minus the rships, minus ``DB_ID``, minus
    every column containing ``_`` (``findProps``)

Relationship-type names are CONSTANT_CASE of the camelCase column
(ReactomeLoader.groovy:284-287 ``camelCaseToConstantCase``: split before
every uppercase letter, join with ``_``, upper-case — including the quirk
that a LEADING capital yields a leading underscore, because Java's split
keeps the leading empty field).
"""

from __future__ import annotations

import re

# ReactomeLoader.groovy:84-87 (three literal cases share one branch)
SPECIAL_TABLES = ("DatabaseObject", "DataModel", "Ontology")

# ReactomeLoader.groovy:91-98 — order is the switch order (first match wins)
_NEWNODES_PATTERNS = tuple(re.compile(p) for p in (
    r".*_2_name.*",
    r".*_2_synonym.*",
    r".*_2_ec.*",
    r".*_2_chain.*",
    r".*_2_otherIdentifier.*",
    r".*_2_secondCoordinate.*",
    r"ReferenceSequence_2_.*",
))
_RELATIONSHIP_PATTERN = re.compile(r".*_2_.*")     # ReactomeLoader.groovy:101

# Decorator tables whose nodes are cached by a business key for cross-loader
# bridging (ReactomeLoader.groovy:125-126); the column renames they trigger
# (:128-134) change which columns classify as props.
REGISTRY_BY_NAME_TABLES = frozenset({"DatabaseIdentifier", "ReferenceEntity"})
GO_TABLE_PREFIX = "GO_"

# DatabaseObject's two 1:m relationship columns, asserted present
# (ReactomeLoader.groovy:70-72).
NODE_TABLE_RSHIPS = ("created", "stableIdentifier")

# The label every node receives (ReactomeLoader.groovy:54 labels.Reactome).
BASE_LABEL = "Reactome"


def classify_table(name: str) -> str:
    """ReactomeLoader.groovy:81-111, one table name -> role."""
    if name in SPECIAL_TABLES:
        return "special"
    for pat in _NEWNODES_PATTERNS:
        if pat.fullmatch(name):
            return "newnodes"
    if _RELATIONSHIP_PATTERN.fullmatch(name):
        return "relationships"
    return "decorators"


def classify_tables(names) -> dict[str, list[str]]:
    """All four role buckets, each in INPUT order (the reference's groupBy
    preserves dump-file order, which fixes decorator processing order)."""
    out: dict[str, list[str]] = {
        "special": [], "newnodes": [], "relationships": [], "decorators": []}
    for n in names:
        out[classify_table(n)].append(n)
    return out


def find_relationships(cols) -> list[str]:
    """Columns ending ``_class`` -> relationship names
    (ReactomeLoader.groovy:291-299; Groovy ``it[0..-7]`` strips 6 chars)."""
    return [c[:-6] for c in cols if c.endswith("_class")]


def find_props(cols, rships=()) -> list[str]:
    """ReactomeLoader.groovy:302-315: drop rships, ``DB_ID``, and every
    column containing ``_``."""
    drop = set(rships) | {"DB_ID"}
    return [c for c in cols if c not in drop and "_" not in c]


def camel_to_constant(camel: str) -> str:
    """ReactomeLoader.groovy:284-287 — ``hasEvent`` -> ``HAS_EVENT``.

    Leading-capital inputs keep the empty lead field (``Species`` ->
    ``_SPECIES``) — that is Java ≤7 ``String.split`` semantics; Java 8+
    drops the zero-width leading match (``SPECIES``), so this quirk is
    JDK-version-dependent in the reference itself. We pin the Java-7
    behavior (engine and oracle share this function, so parity is
    unaffected either way; convention column names start lowercase, so
    the branch is unreachable for real dump columns)."""
    return "_".join(re.split(r"(?=[A-Z])", camel)).upper()


def capitalize_first(s: str) -> str:
    """Groovy ``String.capitalize()`` — first char upper, REST UNCHANGED
    (Python's str.capitalize lowercases the rest; ReactomeLoader.groovy:187
    ``prop.capitalize()`` keeps inner capitals: otherIdentifier ->
    OtherIdentifier)."""
    return s[:1].upper() + s[1:] if s else s


def decorator_columns(table_name: str, cols: list[str]) -> list[str]:
    """The column renames a decorator table undergoes BEFORE role
    classification (ReactomeLoader.groovy:128-134): registry-by-name tables
    expose ``identifier`` as ``name``; ``GO_*`` tables expose ``accession``
    as ``id``. (The reference also re-sorts the column map by index — a
    CSV-parsing detail with no effect on the column SET.)"""
    if table_name in REGISTRY_BY_NAME_TABLES:
        return ["name" if c == "identifier" else c for c in cols]
    if table_name.startswith(GO_TABLE_PREFIX):
        return ["id" if c == "accession" else c for c in cols]
    return list(cols)


_DIGITS = re.compile(r"-?\d+\Z")


def parse_db_id(v) -> int | None:
    """``Long.valueOf(line.DB_ID)`` (ReactomeLoader.groovy:113-115) with the
    repo's quarantine policy: unparseable -> None (the reference throws)."""
    if v is None or not _DIGITS.match(v):
        return None
    return int(v)


def dump_node_key(db_id: int) -> str:
    """Deterministic node id for a dump-defined node. The reference uses the
    DB_ID as the physical Neo4j id (ReactomeLoader.groovy:54 nodeNoCache);
    content-derived keys replace physical ids per the identity model in
    kb/spec.py."""
    return f"D:{db_id}"
