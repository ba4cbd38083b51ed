"""Mention detection + entity-link scoring semantics (shared verbatim).

The reference has no web-text linker (it consumes structured records); the
north star defines one: gazetteer/trie mention detection over extracted page
text with TF-IDF + alias-prior link scoring, exact-match on normalized
surface keys — the discipline of the reference's in-memory surface-key
indexes (GeneLoader.groovy:101-108, OntologyLoader.groovy:122-133,
Importer.groovy:97-103: linking is exact on a normalized key, never fuzzy).

This module is imported by BOTH the single-process oracle and the Ray
actor-pool linker so the two code paths share one semantic definition.
Everything here is deterministic and pure.

Triple-sentence grammar (our extraction spec): one candidate assertion per
paragraph ("\\n\\n"-separated), of the shape

    <subject surface> <predicate phrase> <object surface>.

Predicate phrases map to the reference's relationship vocabulary; the two
`*_of` phrases express the edge in prose order REVERSED relative to the
stored direction (INPUT edges are (entity)->(event) after the
post-import-cypher.txt:4 flip; OUTPUT edges are (event)->(entity)).
"""

from __future__ import annotations

import math
import re
from dataclasses import dataclass

from .naming import normalize_surface

# phrase -> (pred, flip): flip=True stores (obj, pred, subj)
PHRASE_TO_PRED: dict[str, tuple[str, bool]] = {
    "is part of": ("PART_OF", False),
    "is a member of": ("MEMBER_OF", False),
    "catalyzes": ("CATALYZES", False),
    "is an input of": ("INPUT", False),      # entity INPUT event (flipped store)
    "is an output of": ("OUTPUT", True),     # event OUTPUT entity
    "occurs in": ("SPECIES", False),         # reaction/gene SPECIES taxon
}

# longest-first alternation so 'is a member of' can't be split by 'is a'
_PHRASE_ALT = "|".join(re.escape(p) for p in
                       sorted(PHRASE_TO_PRED, key=len, reverse=True))
SENTENCE_RE = re.compile(rf"^(.+?) ({_PHRASE_ALT}) (.+)\.$", re.S)


def parse_sentence(paragraph: str) -> tuple[str, str, str] | None:
    """Paragraph -> (subj_surface, phrase, obj_surface) or None (noise)."""
    m = SENTENCE_RE.match(paragraph)
    if m is None:
        return None
    return m.group(1), m.group(2), m.group(3)


# ----------------------------------------------------------------- gazetteer

@dataclass(frozen=True)
class Candidate:
    node_key: str       # N:{label}:{name}
    is_primary: bool    # surface == entity primary name (vs synonym)


class Gazetteer:
    """normalized surface -> candidates, with deterministic link scoring.

    score(surface, cand) = alias_prior * idf(surface)
      alias_prior = 1.0 for a primary-name match, 0.5 for a synonym match
        (the reference links primary keys exactly; synonyms reach entities
        only through SYNONYM Name-nodes — GrameneMongoLoader.groovy:331-339 —
        so a synonym match is weaker evidence)
      idf(surface) = log(1 + N / df)  with df = #entities sharing the surface
        (constant across one surface's candidates; it is the emitted
        confidence, not the tiebreak)

    Resolution is argmax by (score, then lexicographically-least node_key) —
    fully deterministic, mirroring "lexicographically-least source wins"
    (SURVEY.md §5e).
    """

    def __init__(self, entries: dict[str, list[Candidate]]):
        self.entries = entries
        self.n_entities = max(1, len({c.node_key for cs in entries.values() for c in cs}))

    @classmethod
    def build(cls, surface_rows: list[tuple[str, str, bool]]) -> "Gazetteer":
        """surface_rows: (surface, node_key, is_primary); surfaces raw."""
        entries: dict[str, list[Candidate]] = {}
        seen: set[tuple[str, str]] = set()
        for surface, nk, is_primary in surface_rows:
            ns = normalize_surface(surface)
            if not ns:
                continue
            if (ns, nk) in seen:
                # keep the strongest form: primary beats synonym
                if is_primary:
                    entries[ns] = [Candidate(c.node_key, True) if c.node_key == nk
                                   else c for c in entries[ns]]
                continue
            seen.add((ns, nk))
            entries.setdefault(ns, []).append(Candidate(nk, is_primary))
        # deterministic candidate order
        for ns in entries:
            entries[ns].sort(key=lambda c: (not c.is_primary, c.node_key))
        return cls(entries)

    def idf(self, norm_surface: str) -> float:
        cands = self.entries.get(norm_surface)
        if not cands:
            return 0.0
        return math.log(1.0 + self.n_entities / len(cands))

    def resolve(self, surface: str) -> tuple[str, float] | None:
        """surface -> (node_key, confidence) or None when unlinkable."""
        ns = normalize_surface(surface)
        cands = self.entries.get(ns)
        if not cands:
            return None
        idf = self.idf(ns)
        # candidates are pre-sorted (primary first, then lexicographic key)
        best = cands[0]
        prior = 1.0 if best.is_primary else 0.5
        return best.node_key, prior * idf

    def mention_pattern(self) -> "re.Pattern[str]":
        """Multi-pattern scan regex over every gazetteer surface (longest
        first so overlapping surfaces prefer the longer mention), compiled
        once per actor/process. Input side is ``normalize_surface``d text,
        so surfaces match case- and whitespace-insensitively."""
        if not hasattr(self, "_mention_re"):
            alts = sorted(self.entries, key=len, reverse=True)
            if alts:
                pat = r"(?<!\w)(" + "|".join(re.escape(s) for s in alts) \
                    + r")(?!\w)"
            else:
                pat = r"(?!x)x"          # matches nothing
            self._mention_re = re.compile(pat)
        return self._mention_re

    def mention_counts(self, text: str) -> dict[str, int]:
        """All gazetteer mentions in a text (the reference's frequency-
        analysis input, notes.txt:149-155 / SURVEY.md A4): node_key ->
        occurrence count. Each matched surface resolves to its best
        candidate (same deterministic rule as ``resolve``)."""
        counts: dict[str, int] = {}
        for m in self.mention_pattern().finditer(normalize_surface(text)):
            cands = self.entries.get(m.group(1))
            if not cands:
                continue
            nk = cands[0].node_key
            counts[nk] = counts.get(nk, 0) + 1
        return counts

    def to_rows(self) -> list[tuple[str, str, bool]]:
        """Flatten back to (norm_surface, node_key, is_primary) rows
        (the broadcastable artifact; rebuilt per actor from ray.put)."""
        return [(ns, c.node_key, c.is_primary)
                for ns, cs in sorted(self.entries.items()) for c in cs]

    @classmethod
    def from_rows(cls, rows: list[tuple[str, str, bool]]) -> "Gazetteer":
        entries: dict[str, list[Candidate]] = {}
        for ns, nk, is_primary in rows:
            entries.setdefault(ns, []).append(Candidate(nk, is_primary))
        for ns in entries:
            entries[ns].sort(key=lambda c: (not c.is_primary, c.node_key))
        return cls(entries)


def link_paragraphs(text: str, gaz: Gazetteer,
                    canonical: dict[str, str] | None = None):
    """Extract + link all assertions in one page text.

    Returns (triples, misses):
      triples: list of (subj_id, pred, obj_id, confidence)
      misses:  list of (surface, role) for unlinkable surfaces (quarantine
               counters — the reference's log-and-drop deferred-edge policy,
               Loader.groovy:414-427)
    ids are canonical ids when ``canonical`` is given, else raw node keys.
    """
    triples: list[tuple[str, str, str, float]] = []
    misses: list[tuple[str, str]] = []
    for para in text.split("\n\n"):
        parsed = parse_sentence(para)
        if parsed is None:
            continue
        s_surf, phrase, o_surf = parsed
        pred, flip = PHRASE_TO_PRED[phrase]
        s_res = gaz.resolve(s_surf)
        o_res = gaz.resolve(o_surf)
        if s_res is None:
            misses.append((s_surf, "subj"))
        if o_res is None:
            misses.append((o_surf, "obj"))
        if s_res is None or o_res is None:
            continue
        (s_key, s_conf), (o_key, o_conf) = s_res, o_res
        if flip:
            s_key, o_key = o_key, s_key
        if canonical is not None:
            s_key = canonical.get(s_key, s_key)
            o_key = canonical.get(o_key, o_key)
        triples.append((s_key, pred, o_key, min(s_conf, o_conf)))
    return triples, misses
