"""Ontology record parsing helpers (OntologyLoader.groovy, GrameneMongoLoader.groovy).

- relationship strings: ``"part_of GO:0000123 ! some description"`` ->
  ``(PART_OF, 123)`` — regex ``([a-z_]+) <PATH>:0*(\\d+) ! (.*)`` with the
  rel type upper-cased and the target id's leading zeros absorbed by the
  ``0*`` in the pattern (OntologyLoader.groovy:16,99-106).
- taxon-rank extraction: ``property_value`` matching
  ``has_rank NCBITaxon:(\\w+)`` -> capitalized rank label
  (GrameneMongoLoader.groovy:51-55).
"""

from __future__ import annotations

import re

from .naming import capitalize

_RANK = re.compile(r"has_rank NCBITaxon:(\w+)")


def relationship_pattern(path: str) -> re.Pattern[str]:
    """The per-ontology relationship regex (path = 'GO', 'PO', ...)."""
    return re.compile(r"([a-z_]+) " + re.escape(path) + r":0*(\d+) ! (.*)")


def parse_relationship(rship: str, pattern: re.Pattern[str]) -> tuple[str, int] | None:
    """``"part_of GO:0000123 ! x"`` -> ``("PART_OF", 123)``; None if no match.

    The reference requires a FULL match (Groovy ``==~``,
    OntologyLoader.groovy:100).
    """
    m = pattern.fullmatch(rship)
    if m is None:
        return None
    return m.group(1).upper(), int(m.group(2), 10)


def extract_rank(property_value: str | None) -> str | None:
    """First ``has_rank NCBITaxon:<rank>`` match, capitalized, else None."""
    if not property_value:
        return None
    m = _RANK.search(property_value)
    if m is None:
        return None
    return capitalize(m.group(1))
