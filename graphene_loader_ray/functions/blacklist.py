"""The promiscuous-entity ("common metabolite") blacklist.

Ported exactly from post-import-cypher.txt:6: a PhysicalEntity whose name
starts with one of these prefixes is flagged ``common = true`` and excluded
from derived TO edges — UNLESS its name contains ``ase`` (enzymes) or is the
single hard-coded exception. This is the reference's skew handling for head
entities (notes.txt:149-155); in the new engine the same list also seeds
salted-key canonicalization for head surface forms (SURVEY.md §4).
"""

from __future__ import annotations

import re

# prefixes from the Cypher `p.name =~ '<prefix>.*'` disjunction, in order
COMMON_NAME_PREFIXES: tuple[str, ...] = (
    "H2O", "Pi", "ATP", "ADP", "AMP", "H+", "PPi", "L-Glu", "2OG", "NAD",
    "CoA", "NH3", "THF", "UDP-Glc", "AdoMet", "AdoHcy",
)

# `not p.name =~ '.*ase.*'` and the one literal exception
_ASE = re.compile(r".*ase.*", re.S)
EXCEPTION_NAME = "UDP-GlcNAc-enolpyruvate [cytosol]"


def is_common_name(name: str | None) -> bool:
    """True iff the reference's post-load query would set ``common = true``."""
    if not name:
        return False
    if not any(name.startswith(p) for p in COMMON_NAME_PREFIXES):
        return False
    if _ASE.fullmatch(name):
        return False
    if name == EXCEPTION_NAME:
        return False
    return True
