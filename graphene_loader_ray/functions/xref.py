"""Xref string parsing (GrameneMongoLoader.groovy:89-110).

An xref is a ``"KEY:value"`` string:
  - no ``:`` (or ``:`` at position 0) -> ignored (``indexOf(':') > 0`` guard)
  - split on the FIRST ``:`` only (``split(':', 2)``)
  - key ``GC_ID`` -> skipped entirely
  - for keys in SPLIT_DESC_TYPES the value is split on the FIRST space into
    ``name`` + optional ``desc`` (GrameneMongoLoader.groovy:102-106)
"""

from __future__ import annotations

SPLIT_DESC_TYPES = frozenset({"Reactome", "VZ", "http", "loinc"})


def parse_xref(xref: str) -> tuple[str, str, str | None] | None:
    """Return ``(type, name, desc)`` or ``None`` when the xref is ignored."""
    i = xref.find(":")
    if i <= 0:
        return None
    key, value = xref[:i], xref[i + 1 :]
    if key == "GC_ID":
        return None
    desc = None
    if key in SPLIT_DESC_TYPES:
        parts = value.split(" ", 1)
        value = parts[0]
        if len(parts) > 1:
            desc = parts[1]
    return key, value, desc
