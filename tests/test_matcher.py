"""TokenAhoCorasick mention scanner vs the r1 regex-alternation reference.

The automaton (functions/linking.py:TokenAhoCorasick) must reproduce the
regex ``(?<!\\w)(S_longest|…)(?!\\w)`` finditer semantics EXACTLY — it is
the shared scan used by both the engine's LinkerActor and the oracle, so a
divergence here would silently shift the golden mention/triple sets.

Scale motivation (VERDICT r1 "What's wrong" #4): the regex alternation
collapses at a realistic vocabulary (~600k entities in the reference
corpus, /root/reference/notes.txt:1-3); the automaton is O(text tokens)
regardless of vocabulary size. The 100k-surface test pins that.
"""

from __future__ import annotations

import random
import string
import time

from graphene_loader_ray.functions.linking import Gazetteer
from graphene_loader_ray.functions.naming import normalize_surface

_WORDS = ["h2o", "atp", "kinase", "gene", "alpha", "beta", "x1", "map",
          "[cytosol]", "ribo-5p", "a", "b2", "pathway", "glucose", "nad+",
          "(ec 1.1.1.1)", "super long gene name", "name"]


def _gaz(surfaces):
    return Gazetteer.build([(s, f"N:X:{s}", True) for s in surfaces])


def _regex_matches(gaz, text):
    nt = normalize_surface(text)
    return [m.group(1) for m in gaz.mention_pattern().finditer(nt)]


def _ac_matches(gaz, text):
    return gaz.matcher().iter_matches(normalize_surface(text))


def test_matcher_pinned_cases():
    gaz = _gaz(["h2o", "h2o [cytosol]", "[cytosol]", "atp", "gene name",
                "name"])
    cases = [
        # longest-at-start wins over prefix surface
        "the h2o [cytosol] pool",
        # non-overlapping resume after match end
        "h2o h2o [cytosol] atp",
        # (?<!\w): letter glued before a punct-initial surface blocks it
        "x[cytosol] but [cytosol] alone matches",
        # (?!\w): letter glued after blocks, boundary at punct allows
        "atpx is not atp, (atp) is",
        # multiword vs inner word
        "a gene name here, just a name there",
        # no-space glue breaks multiword surfaces
        "h2o[cytosol]",
    ]
    for text in cases:
        assert _ac_matches(gaz, text) == _regex_matches(gaz, text), text


def test_matcher_equals_regex_fuzz():
    rng = random.Random(7)

    def rand_surface():
        return " ".join(rng.choice(_WORDS)
                        for _ in range(rng.randint(1, 3)))

    surfaces = sorted({normalize_surface(rand_surface())
                       for _ in range(200)})
    gaz = _gaz(surfaces)
    for _trial in range(500):
        parts = []
        for _ in range(rng.randint(1, 25)):
            r = rng.random()
            if r < 0.5:
                parts.append(rng.choice(surfaces))
            elif r < 0.8:
                parts.append(rng.choice(_WORDS))
            else:
                parts.append("".join(
                    rng.choice(string.ascii_lowercase + "()[]-+., ")
                    for _ in range(rng.randint(1, 8))))
        text = rng.choice(["", "x"]) + " ".join(parts) + rng.choice(["", "y"])
        if rng.random() < 0.3:
            text = text.replace(" ", "", rng.randint(0, 3))
        assert _ac_matches(gaz, text) == _regex_matches(gaz, text), text


def test_matcher_100k_surfaces_bounded():
    """A reference-scale vocabulary builds and scans in bounded time (the
    regex path needs ~5 s to COMPILE here and ~100 docs/s to scan; the
    automaton must be build-once cheap and scan orders of magnitude
    faster)."""

    def surf(i):
        if i % 3 == 0:
            return f"gene{i:06d} [cytosol]"
        if i % 3 == 1:
            return f"gene{i:06d}-like protein {i % 97}"
        return f"gene{i:06d}"

    surfaces = [surf(i) for i in range(100_000)]
    gaz = _gaz(surfaces)
    t0 = time.time()
    gaz.matcher()
    build_s = time.time() - t0
    assert build_s < 30.0, f"automaton build pathological: {build_s:.1f}s"

    rng = random.Random(11)
    texts = []
    for _ in range(40):
        parts = []
        for _ in range(60):
            if rng.random() < 0.3:
                parts.append(surf(rng.randrange(100_000)))
            else:
                parts.append("the quick brown fox catalyzes lorem ipsum")
        texts.append(". ".join(parts))
    t0 = time.time()
    n_mentions = sum(sum(gaz.mention_counts(t).values()) for t in texts)
    scan_s = time.time() - t0
    assert n_mentions > 0
    docs_per_s = len(texts) / scan_s
    assert docs_per_s > 300, f"scan pathological: {docs_per_s:.0f} docs/s"
    # spot-check equality vs the regex reference on a few docs (regex is
    # too slow at this vocab to compare everything)
    for text in texts[:3]:
        assert _ac_matches(gaz, text) == _regex_matches(gaz, text)
