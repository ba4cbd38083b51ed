"""Unit tests for the pure scalar helpers (reference-semantics pins)."""

from graphene_loader_ray.functions.blacklist import is_common_name
from graphene_loader_ray.functions.naming import (
    camel_to_constant, capitalize, normalize_surface, strip_leading_zeros,
    underscore_to_camel)
from graphene_loader_ray.functions.ontology import (
    extract_rank, parse_relationship, relationship_pattern)
from graphene_loader_ray.functions.text import extract_text
from graphene_loader_ray.functions.xref import parse_xref


def test_underscore_to_camel():
    # GrameneMongoLoader.groovy:76-78
    assert underscore_to_camel("biological_process") == "BiologicalProcess"
    assert underscore_to_camel("goslim_plant") == "GoslimPlant"
    assert underscore_to_camel("plain") == "Plain"
    assert underscore_to_camel(None) is None


def test_camel_to_constant():
    # ReactomeLoader.groovy:284-287
    assert camel_to_constant("catalystActivity") == "CATALYST_ACTIVITY"
    assert camel_to_constant("hasEvent") == "HAS_EVENT"
    assert camel_to_constant("ec") == "EC"
    assert camel_to_constant("stableIdentifier") == "STABLE_IDENTIFIER"


def test_capitalize_groovy_semantics():
    assert capitalize("species") == "Species"
    assert capitalize("aBC") == "ABC"  # only first char changes


def test_strip_leading_zeros():
    # ReactomeLoader.groovy:157-159
    assert strip_leading_zeros("0001234") == "1234"
    assert strip_leading_zeros("1234") == "1234"


def test_parse_xref():
    # GrameneMongoLoader.groovy:89-110
    assert parse_xref("EC:1.1.1.1") == ("EC", "1.1.1.1", None)
    assert parse_xref("GC_ID:11") is None           # skipped key
    assert parse_xref("nocolon") is None            # indexOf(':') > 0 guard
    assert parse_xref(":leading") is None
    assert parse_xref("Reactome:R-ALL-123 some desc") == ("Reactome", "R-ALL-123", "some desc")
    assert parse_xref("Reactome:R-ALL-9") == ("Reactome", "R-ALL-9", None)
    assert parse_xref("web:a:b:c") == ("web", "a:b:c", None)  # first ':' only


def test_parse_relationship():
    # OntologyLoader.groovy:16,99-106 — full match, 0* zero-absorb, uppercased type
    pat = relationship_pattern("GO")
    assert parse_relationship("part_of GO:0001234 ! desc", pat) == ("PART_OF", 1234)
    assert parse_relationship("regulates GO:991 ! x", pat) == ("REGULATES", 991)
    assert parse_relationship("part_of PO:0001 ! wrong-ontology", pat) is None
    assert parse_relationship("prefix part_of GO:01 ! not-full-match", pat) is None


def test_extract_rank():
    # GrameneMongoLoader.groovy:51-55
    assert extract_rank("has_rank NCBITaxon:genus") == "Genus"
    assert extract_rank("has_rank NCBITaxon:species") == "Species"
    assert extract_rank("unrelated") is None
    assert extract_rank(None) is None


def test_blacklist():
    # post-import-cypher.txt:6 — prefixes, .*ase.* exception, literal exception
    assert is_common_name("H2O [cytosol]")
    assert is_common_name("ATP [cytosol]")
    assert is_common_name("NAD+ [cytosol]")
    assert not is_common_name("ATPase complex 1")          # contains 'ase'
    assert not is_common_name("UDP-GlcNAc-enolpyruvate [cytosol]")
    assert not is_common_name("sucrose synthase")          # no prefix
    assert not is_common_name(None)


def test_extract_text_roundtrip():
    html = (b"<html><body><nav>x</nav><article>\n"
            b"<p>alpha &amp; beta.</p>\n<p>second \xc3\xa9l\xc3\xa9ment.</p>\n"
            b"</article><footer>f</footer></body></html>")
    assert extract_text(html) == "alpha & beta.\n\nsecond élément."
    assert extract_text(b"<html><body>no article</body></html>") is None
    assert extract_text(b"<article></article>") is None     # no paragraphs
    assert extract_text(None) is None


def test_normalize_surface():
    assert normalize_surface("  H2O   [Cytosol] ") == "h2o [cytosol]"
    assert normalize_surface("ABC") == normalize_surface("abc")
