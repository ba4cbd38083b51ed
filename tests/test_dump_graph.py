"""Convention-driven dump loader (SURVEY §2 M9): the engine
(pipelines/dump_graph.py) must EQUAL the sequential oracle
(oracle/dump_graph.py) on a synthesized dump containing SATELLITE TABLES
that appear in no static manifest — roles are inferred from name
conventions alone (ReactomeLoader.groovy:81-111, 291-315)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from graphene_loader_ray.kb import dump_conventions as conv
from graphene_loader_ray.sources.mysql_dump import write_mysql_dump


# --------------------------------------------------------------- classifier

def test_table_role_classifier():
    # ReactomeLoader.groovy:84-87 literal specials
    assert conv.classify_table("DatabaseObject") == "special"
    assert conv.classify_table("DataModel") == "special"
    assert conv.classify_table("Ontology") == "special"
    # :91-97 newnodes patterns (substring-style .* wrappers)
    assert conv.classify_table("Complex_2_name") == "newnodes"
    assert conv.classify_table("Event_2_synonym") == "newnodes"
    assert conv.classify_table("Thing_2_ec") == "newnodes"
    assert conv.classify_table("X_2_chain") == "newnodes"
    assert conv.classify_table("Y_2_otherIdentifier") == "newnodes"
    assert conv.classify_table("Z_2_secondCoordinate") == "newnodes"
    # :98 ReferenceSequence_2_.* beats the generic rule
    assert conv.classify_table("ReferenceSequence_2_anything") == "newnodes"
    # :101 generic m:m
    assert conv.classify_table("Pathway_2_hasEvent") == "relationships"
    assert conv.classify_table("Complex_2_hasComponent") == "relationships"
    # default: decorators — including tables never seen before
    assert conv.classify_table("CatalystActivity") == "decorators"
    assert conv.classify_table("GO_MolecularFunction") == "decorators"
    kinds = conv.classify_tables(
        ["DatabaseObject", "Pathway", "Complex_2_name", "Pathway_2_hasEvent"])
    assert kinds["decorators"] == ["Pathway"]
    assert kinds["newnodes"] == ["Complex_2_name"]


def test_column_role_classifier():
    cols = ["DB_ID", "hasDiagram", "species", "species_class",
            "stoichiometry_coeff"]
    # _class twin ⇒ relationship (:291-299)
    assert conv.find_relationships(cols) == ["species"]
    # props: minus the rships themselves, DB_ID, and every underscore
    # column (:302-315 removeAll(rships) + remove('DB_ID') + `_` filter)
    assert conv.find_props(cols, ["species"]) == ["hasDiagram"]
    assert conv.find_props(["DB_ID", "name", "name_rank"]) == ["name"]


def test_camel_to_constant_and_capitalize():
    assert conv.camel_to_constant("hasEvent") == "HAS_EVENT"
    assert conv.camel_to_constant("stableIdentifier") == "STABLE_IDENTIFIER"
    assert conv.camel_to_constant("name") == "NAME"
    # Java-split quirk: a LEADING capital keeps the empty lead field
    assert conv.camel_to_constant("Species") == "_SPECIES"
    # Groovy String.capitalize keeps inner capitals (Python's doesn't)
    assert conv.capitalize_first("otherIdentifier") == "OtherIdentifier"
    assert conv.capitalize_first("name") == "Name"


def test_decorator_column_renames():
    assert conv.decorator_columns(
        "DatabaseIdentifier", ["DB_ID", "identifier", "referenceDatabase"]) \
        == ["DB_ID", "name", "referenceDatabase"]
    assert conv.decorator_columns(
        "GO_MolecularFunction", ["DB_ID", "accession", "definition"]) \
        == ["DB_ID", "id", "definition"]
    assert conv.decorator_columns("Pathway", ["DB_ID", "x"]) == ["DB_ID", "x"]


# ------------------------------------------------------------- fixture dump

def _t(cols: list[str], rows: list[tuple]) -> pa.Table:
    return pa.table({c: pa.array([r[i] for r in rows], pa.string())
                     for i, c in enumerate(cols)})


def _build_dump(path: str) -> None:
    """Deterministic Reactome-shaped dump. Tables 'Pathway',
    'CatalystActivity', 'ReferenceSequence_2_otherIdentifier' and
    'Complex_2_hasComponent' are SATELLITES no manifest mentions — the
    classifier must route them. rows_per_insert=2 forces multiple INSERT
    lines per table so order stamps cross line boundaries."""
    tables = {
        "DatabaseObject": _t(
            ["DB_ID", "_displayName", "_class", "created", "stableIdentifier"],
            [
                ("1", "ATP", "SimpleEntity", None, "11"),
                ("2", "glycolysis", "Pathway", "9", "12"),
                ("3", "hexokinase", "Complex", "9", "13"),
                ("3", "dupe-of-3", "Complex", None, None),      # duplicate id
                ("4", "phosphorylation", "Reaction", "9", None),
                ("5", "molecular_function", "GO_MolecularFunction", None, None),
                ("6", "TAIR:AT1G01010", "DatabaseIdentifier", None, None),
                ("7", "cytosol", "Compartment", None, None),
                ("8", "Oryza sativa", "Taxon", None, None),
                ("9", "Jane Doe", "Person", None, None),
                ("11", "R-OSA-1", "StableIdentifier", None, None),
                ("12", "R-OSA-2", "StableIdentifier", None, None),
                ("13", "R-OSA-3", "StableIdentifier", None, None),
                ("14", "orphan-ref", "Pathway", "99", None),    # dangling created
                ("15", "", "Complex", None, None),              # empty display
                ("16", "TAIR", "ReferenceDatabase", None, None),
                ("17", "TAIR:AT1G01010-b", "DatabaseIdentifier", None, None),
                ("NULL", "bad id row", "Complex", None, None),  # unparseable id
                ("18", "classless", "", None, None),            # bad class
                # SQL NULL _class arrives as the LITERAL 'NULL' string and
                # becomes a real label (LabelCache mints it) — pinned below
                ("19", "null-class", None, None, None),
            ]),
        # unseen SATELLITE decorator: m:1 species + scalar prop
        "Pathway": _t(
            ["DB_ID", "hasDiagram", "species", "species_class"],
            [
                ("2", "123", "8", "Taxon"),
                ("14", "true", "18", "Taxon"),   # 18 classless -> dangling
                ("99", "x", None, None),         # id not in DatabaseObject
                ("0", "x", None, None),          # Groovy-falsy id
            ]),
        "GO_MolecularFunction": _t(
            ["DB_ID", "accession", "definition"],
            [
                ("5", "0003674", "catalytic activity"),
                ("5", "GO:3674", "bad accession"),
            ]),
        "DatabaseIdentifier": _t(
            ["DB_ID", "identifier", "referenceDatabase",
             "referenceDatabase_class"],
            [
                ("6", "AT1G01010", "16", "ReferenceDatabase"),
                ("17", "AT1G01010", None, None),   # same key: last wins
            ]),
        # two decorators writing the SAME prop on node 7: file order decides
        "Compartment": _t(
            ["DB_ID", "definition"],
            [("7", "first-def"), ("7", "mid-def")]),
        "CatalystActivity": _t(
            ["DB_ID", "definition", "physicalEntity", "physicalEntity_class"],
            [("7", "last-def", "1", "SimpleEntity")]),
        # newnodes: shared NodeCache across tables, raw-string rank quirk
        "Complex_2_name": _t(
            ["DB_ID", "name", "name_rank"],
            [
                ("3", "HXK1", "0"),
                ("3", "hexokinase 1", "1"),
                ("3", "", "2"),           # empty name -> ignored
                ("4", "HXK1", None),      # shared minted node; rank 'NULL'
            ]),
        "ReferenceSequence_2_otherIdentifier": _t(
            ["DB_ID", "otherIdentifier", "otherIdentifier_rank"],
            [("6", "NM_001", "0")]),
        # relationships: duplicates preserved, empty rank -> m:1 branch
        "Pathway_2_hasEvent": _t(
            ["DB_ID", "hasEvent", "hasEvent_class", "hasEvent_rank"],
            [
                ("2", "4", "Reaction", "0"),
                ("2", "4", "Reaction", "1"),     # duplicate pair, new rank
                ("2", "99", "Reaction", "0"),    # dangling target
                ("2", "4", "Reaction", ""),      # empty rank -> m:1 (:268)
                ("2", "4", "Reaction", "xx"),    # bad rank
            ]),
        "Complex_2_hasComponent": _t(
            ["DB_ID", "hasComponent", "hasComponent_class",
             "hasComponent_rank"],
            [("3", "1", "SimpleEntity", "0")]),
        # special non-DatabaseObject tables are ignored entirely
        "Ontology": _t(["DB_ID", "ontology"], [("1", "ignored")]),
    }
    write_mysql_dump(tables, path, rows_per_insert=2)


@pytest.fixture(scope="module")
def dump_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("dumpkg") / "reactome.sql")
    _build_dump(p)
    return p


@pytest.fixture(scope="module")
def oracle_result(dump_path):
    from graphene_loader_ray.oracle.dump_graph import load_dump_graph_oracle
    return load_dump_graph_oracle(dump_path)


@pytest.fixture(scope="module")
def engine_result(ray_session, dump_path):
    from graphene_loader_ray.pipelines.dump_graph import dump_graph_tables
    return dump_graph_tables(dump_path)


# ----------------------------------------------------------------- parity

def test_nodes_match_oracle(engine_result, oracle_result):
    assert engine_result["nodes"] == oracle_result["nodes"]


def test_edges_match_oracle(engine_result, oracle_result):
    assert engine_result["edges"] == oracle_result["edges"]


def test_registry_and_counters_match_oracle(engine_result, oracle_result):
    assert engine_result["registry"] == oracle_result["registry"]
    assert engine_result["counters"] == oracle_result["counters"]


# ------------------------------------------- pinned satellite expectations

def test_satellite_decorator_auto_classified(oracle_result, engine_result):
    """'Pathway' and 'CatalystActivity' are in NO manifest: label add, digit
    promotion, m:1 name denorm, and cross-table last-writer-wins all flow
    from the convention classifier."""
    for res in (oracle_result, engine_result):
        labels, props = res["nodes"]["D:2"]
        # primary (_class) == decorator label: the add merges into the set
        assert labels == ("Pathway", "Reactome")
        assert '"hasDiagram":123' in props          # digit-promoted
        assert '"speciesName":"Oryza sativa"' in props
        assert ("D:2", "SPECIES", "D:8", None) in res["edges"]
        # file order: Compartment writes, then CatalystActivity overwrites
        _, props7 = res["nodes"]["D:7"]
        assert '"definition":"last-def"' in props7
        assert ("D:7", "PHYSICAL_ENTITY", "D:1", None) in res["edges"]


def test_satellite_newnodes_and_relationships(oracle_result, engine_result):
    for res in (oracle_result, engine_result):
        # minted node shared across tables via the (label, name) cache
        labels, props = res["nodes"]["N:Name:HXK1"]
        assert labels == ("Name", "Reactome")
        assert props == '{"name":"HXK1"}'
        # raw-string rank quirk (ReactomeLoader.groovy:208): 'NULL' literal
        assert ("D:4", "NAME", "N:Name:HXK1", '{"rank":"NULL"}') in res["edges"]
        assert ("D:6", "OTHER_IDENTIFIER", "N:OtherIdentifier:NM_001",
                '{"rank":"0"}') in res["edges"]
        # duplicate m:m pairs preserved with their own ranks
        he = [e for e in res["edges"]
              if e[:3] == ("D:2", "HAS_EVENT", "D:4")]
        assert [e[3] for e in he] == [None, '{"rank":0}', '{"rank":1}']
        # the empty-rank row fell through to m:1: name denorm happened
        _, props2 = res["nodes"]["D:2"]
        assert '"hasEventName":"phosphorylation"' in props2


def test_null_class_literal_becomes_label(oracle_result, engine_result):
    """opencsv hands the reference the literal string 'NULL' for SQL NULLs;
    LabelCache happily mints a 'NULL' label (no null-check on _class) —
    mirrored, while an EMPTY _class quarantines (LabelCache throws)."""
    for res in (oracle_result, engine_result):
        assert res["nodes"]["D:19"][0] == ("NULL", "Reactome")
        assert "D:18" not in res["nodes"]


def test_registry_semantics(oracle_result, engine_result):
    for res in (oracle_result, engine_result):
        # GO accession zero-strip (:157-159)
        assert res["registry"][("GO_MolecularFunction", "3674")] == "D:5"
        # name-keyed registry, last writer wins (:155-157)
        assert res["registry"][("DatabaseIdentifier", "AT1G01010")] == "D:17"


def test_quarantine_counters(oracle_result):
    c = oracle_result["counters"]
    assert c["duplicate_db_id"] == 1
    assert c["bad_id"] == 2          # the NULL-id row, phases 1 and 2
    assert c["bad_class"] == 1
    assert c["no_id"] == 1           # decorator row with DB_ID 0
    assert c["missing_node"] >= 2    # decorator 99 + classless-18 references
    assert c["dangling_ref"] >= 2    # created->99, hasEvent->99
    assert c["bad_rank"] == 1
    assert c["bad_accession"] == 1
    assert c["empty_name"] == 1


def test_convention_violation_raises(tmp_path, ray_session):
    """A mis-shaped newnodes table trips the reference's assert in BOTH
    implementations (ReactomeLoader.groovy:181-185)."""
    from graphene_loader_ray.oracle.dump_graph import load_dump_graph_oracle
    from graphene_loader_ray.pipelines.dump_graph import load_dump_graph
    p = str(tmp_path / "bad.sql")
    write_mysql_dump({
        "DatabaseObject": _t(
            ["DB_ID", "_displayName", "_class", "created", "stableIdentifier"],
            [("1", "x", "Thing", None, None)]),
        "Thing_2_name": _t(["DB_ID", "name", "name_rank", "extra"],
                           [("1", "a", "0", "b")]),
    }, p)
    with pytest.raises(ValueError, match="newnodes"):
        load_dump_graph_oracle(p)
    with pytest.raises(ValueError, match="newnodes"):
        load_dump_graph(p)
