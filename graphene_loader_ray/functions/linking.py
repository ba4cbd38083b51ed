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


# ------------------------------------------------------- mention automaton

# symbol alphabet: maximal \w-runs, single punctuation chars, single spaces
# (normalized text has single spaces only, so every char lands in exactly
# one symbol)
_TOKEN_RE = re.compile(r"\w+|[^\w\s]| ")
_WORD_CHAR = re.compile(r"\w")


class TokenAhoCorasick:
    """Token-level Aho-Corasick with the exact semantics of the r1 regex
    ``(?<!\\w)(S_longest|…|S_shortest)(?!\\w)`` under ``re.finditer``:

      - leftmost scan, non-overlapping, resume at match end
      - at each start, the LONGEST surface whose trailing boundary holds
      - a match is valid iff the char before its start and the char after
        its end are not word chars (BOS/EOS count as non-word)

    Token alignment is equivalence-preserving: a char-level match can never
    start or end inside a \\w-run (the lookarounds forbid it) and punct/
    space symbols are single chars, so every regex match is symbol-aligned;
    conversely symbol-sequence equality is substring equality. The boundary
    lookarounds are re-applied on the neighbor symbols, which covers the
    punct-edged cases token alignment alone would admit (e.g. ``[x]`` right
    after a letter).

    Build is O(total surface tokens); scan is O(text tokens + matches) and
    independent of vocabulary size — this is what makes a reference-scale
    vocabulary (~600k entities, notes.txt:1-3) scannable where the regex
    alternation collapses. Built once per linker actor (stages/link.py).
    """

    def __init__(self, surfaces: list[str]):
        self.vocab: dict[str, int] = {}
        toks_per_surface: list[tuple[str, list[int]]] = []
        for s in surfaces:
            toks = _TOKEN_RE.findall(s)
            if not toks:
                continue
            ids = []
            for t in toks:
                i = self.vocab.get(t)
                if i is None:
                    i = self.vocab[t] = len(self.vocab)
                ids.append(i)
            toks_per_surface.append((s, ids))
        # goto trie
        self.goto: list[dict[int, int]] = [{}]
        # out[node]: (tok_len, surface) pairs for patterns ENDING here,
        # own + inherited via fail links, longest first
        self.out: list[list[tuple[int, str]]] = [[]]
        for s, ids in toks_per_surface:
            node = 0
            for i in ids:
                nxt = self.goto[node].get(i)
                if nxt is None:
                    nxt = len(self.goto)
                    self.goto[node][i] = nxt
                    self.goto.append({})
                    self.out.append([])
                node = nxt
            self.out[node].append((len(ids), s))
        # fail links (BFS), merging inherited outputs
        from collections import deque
        self.fail = [0] * len(self.goto)
        q = deque()
        for child in self.goto[0].values():
            q.append(child)
        while q:
            node = q.popleft()
            for sym, child in self.goto[node].items():
                q.append(child)
                f = self.fail[node]
                while f and sym not in self.goto[f]:
                    f = self.fail[f]
                self.fail[child] = self.goto[f].get(sym, 0)
                if self.fail[child] == child:
                    self.fail[child] = 0
                inherited = self.out[self.fail[child]]
                if inherited:
                    merged = self.out[child] + inherited
                    merged.sort(key=lambda p: -p[0])
                    self.out[child] = merged
            if self.out[node]:
                self.out[node].sort(key=lambda p: -p[0])

    def iter_matches(self, norm_text: str) -> list[str]:
        """Matched surfaces in scan order over ALREADY-normalized text."""
        toks = _TOKEN_RE.findall(norm_text)
        n = len(toks)
        if not n:
            return []
        vocab = self.vocab
        is_word = [_WORD_CHAR.match(t[0]) is not None for t in toks]
        sym = [vocab.get(t, -1) for t in toks]
        goto, fail, out = self.goto, self.fail, self.out
        # best valid (longest) match per start token index
        best: dict[int, int] = {}
        node = 0
        for i in range(n):
            s = sym[i]
            if s < 0:
                node = 0
                continue
            while node and s not in goto[node]:
                node = fail[node]
            node = goto[node].get(s, 0)
            o = out[node]
            if not o:
                continue
            if i + 1 < n and is_word[i + 1]:
                continue                    # (?!\w) fails for any end at i
            for length, _surf in o:
                start = i + 1 - length
                if start > 0 and is_word[start - 1]:
                    continue                # (?<!\w) fails at this start
                if best.get(start, 0) < length:
                    best[start] = length
        # leftmost/longest non-overlapping greedy = finditer scan order
        result: list[str] = []
        cursor = 0
        for start in sorted(best):
            if start < cursor:
                continue
            length = best[start]
            result.append("".join(toks[start:start + length]))
            cursor = start + length
        return result

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

    def matcher(self) -> "TokenAhoCorasick":
        """Multi-pattern mention scanner, built once per actor/process.

        A token-level Aho-Corasick automaton (pure Python — the sandbox has
        no C extension for this) replacing the r1 giant regex alternation:
        regex compile and match collapse at a realistic vocabulary (the
        reference corpus alone is ~600k entities, notes.txt:1-3), while the
        automaton build is O(total surface tokens) and the scan is
        O(text tokens), independent of vocabulary size."""
        if not hasattr(self, "_matcher"):
            self._matcher = TokenAhoCorasick(list(self.entries))
        return self._matcher

    def mention_pattern(self) -> "re.Pattern[str]":
        """The r1 char-level regex alternation over every surface (longest
        first). Kept as the independent reference implementation for the
        matcher-equivalence test; production scanning uses ``matcher()``."""
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
        for surf in self.matcher().iter_matches(normalize_surface(text)):
            cands = self.entries.get(surf)
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
