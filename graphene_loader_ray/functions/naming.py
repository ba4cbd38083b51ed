"""Case and key normalizers.

Semantics mirrored from the reference (cited file:line in /root/reference):
  - underscore_case -> CamelCase   (GrameneMongoLoader.groovy:76-78)
  - camelCase -> CONSTANT_CASE     (ReactomeLoader.groovy:284-287)
  - capitalize of rank matches     (GrameneMongoLoader.groovy:53)
  - leading-zero stripping of GO accessions (ReactomeLoader.groovy:157-159)
"""

from __future__ import annotations

import re

_UPPER_SPLIT = re.compile(r"(?=[A-Z])")


def underscore_to_camel(s: str | None) -> str | None:
    """``biological_process`` -> ``BiologicalProcess``."""
    if s is None:
        return None
    return "".join(part.capitalize() for part in s.lower().split("_"))


def camel_to_constant(s: str) -> str:
    """``catalystActivity`` -> ``CATALYST_ACTIVITY`` (ReactomeLoader.groovy:284-287).

    The reference splits before every uppercase letter and upper-cases the
    join; an initial uppercase produces no leading separator.
    """
    parts = [p for p in _UPPER_SPLIT.split(s) if p]
    return "_".join(parts).upper()


def capitalize(s: str | None) -> str | None:
    """Groovy ``String.capitalize()``: first char upper, rest untouched."""
    if not s:
        return s
    return s[0].upper() + s[1:]


def strip_leading_zeros(accession: str) -> str:
    """GO accession join-key normalization: ``"0001234"`` -> ``"1234"``.

    The reference does ``Integer.parseInt(acc, 10)`` then stringifies
    (ReactomeLoader.groovy:158); non-numeric accessions raise there, so we
    keep the same contract and let ValueError propagate to the caller's
    quarantine path.
    """
    return str(int(accession, 10))


def normalize_surface(s: str) -> str:
    """Normalization applied to mention surfaces and gazetteer keys.

    Exact-match linking discipline (the reference links on exact normalized
    keys — Importer.groovy:97-103, GeneLoader.groovy:75-82): lowercase,
    collapse internal whitespace, strip.
    """
    return " ".join(s.lower().split())
