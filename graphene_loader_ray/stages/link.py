"""Entity-linking stage — the corpus-side actor pool (SURVEY.md §2.3 C7,
build plan M3).

``extracted pages ──map_batches(LinkerActor, concurrency=pool)──▶ partials``

This is the scale-critical stage: it runs once per page over the whole
corpus. Design per the north star:

  - stateful actor pool: the gazetteer (surface dict + compiled mention
    regex + alias priors + IDF) and the canonical map are built ONCE per
    actor in ``__init__`` from ``ray.put`` handles — never re-shipped per
    batch
  - the per-paragraph work is one compiled regex match + dict lookups,
    plus a full-text multi-pattern mention scan (functions/linking.py,
    shared verbatim with the oracle so engine and gold implement one
    semantic)
  - **combiner-in-actor**: the actor emits PER-BATCH AGGREGATES, not
    per-occurrence rows — distinct (subj, pred, obj) triples with counts,
    per-entity mention counts, per-surface miss counts, one quarantine
    row. A 16k-page batch collapses to a few thousand rows, so nothing
    row-per-mention ever hits the object store and the downstream shuffle
    moves O(distinct × batches), not O(occurrences). This is the in-actor
    half of the two-phase aggregation (ops/aggregate.py); head-entity skew
    (the reference's common metabolites, post-import-cypher.txt:6) is
    absorbed here — a surface in 10% of pages still contributes ≤ one row
    per batch per key.
  - unlinkable surfaces become 'miss' rows (quarantine-not-crash,
    Loader.groovy:414-427 / GrameneMongoLoader.groovy:295-305), counted
    downstream — never raised

Batch size: text rows are narrow once html is projected away; 16k
rows/batch amortizes actor dispatch. A corpus of ~100 KB documents needs a
smaller batch so batch × concurrency fits worker heaps.

Pool sizing: pass a FIXED ``concurrency`` ≈ 3/4 of the session CPUs — a
pool reserving every CPU starves the read tasks (livelock); an autoscaling
(1, N) pool ramps too slowly for short jobs.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from ..functions.linking import Gazetteer, link_paragraphs

LINKED_SCHEMA = pa.schema([
    ("kind", pa.string()),          # triple | mention | miss | quarantined
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("n", pa.int64()),
])


class LinkerActor:
    """Mention detection + linking + in-batch aggregation."""

    def __init__(self, gaz_rows_ref, canon_ref) -> None:
        self.gaz = Gazetteer.from_rows(ray.get(gaz_rows_ref))
        self.gaz.matcher()                    # build automaton once per actor
        self.canon: dict[str, str] = ray.get(canon_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        triples: dict[tuple[str, str, str], int] = {}
        mentions: dict[str, int] = {}
        misses: dict[tuple[str, str], int] = {}
        n_quarantined = 0
        ok = batch["ok"].to_pylist() if "ok" in batch.schema.names \
            else [True] * batch.num_rows
        canon = self.canon
        for text, good in zip(batch["text"].to_pylist(), ok):
            if not good or text is None:
                n_quarantined += 1
                continue
            trs, mis = link_paragraphs(text, self.gaz, canon)
            for s, p, o, _conf in trs:
                triples[(s, p, o)] = triples.get((s, p, o), 0) + 1
            for surface, role in mis:
                misses[(surface, role)] = misses.get((surface, role), 0) + 1
            for nk, n in self.gaz.mention_counts(text).items():
                ck = canon.get(nk, nk)
                mentions[ck] = mentions.get(ck, 0) + n
        kinds, subjs, preds, objs, ns = [], [], [], [], []
        for (s, p, o), n in triples.items():
            kinds.append("triple")
            subjs.append(s)
            preds.append(p)
            objs.append(o)
            ns.append(n)
        for nk, n in mentions.items():
            kinds.append("mention")
            subjs.append(nk)
            preds.append(None)
            objs.append(None)
            ns.append(n)
        for (surface, role), n in misses.items():
            kinds.append("miss")
            subjs.append(surface)
            preds.append(role)
            objs.append(None)
            ns.append(n)
        if n_quarantined:
            kinds.append("quarantined")
            subjs.append(None)
            preds.append(None)
            objs.append(None)
            ns.append(n_quarantined)
        return pa.table({"kind": kinds, "subj": subjs, "pred": preds,
                         "obj": objs, "n": ns}, schema=LINKED_SCHEMA)


def link(extracted: Dataset, gaz_rows_ref, canon_ref,
         batch_size: int = 16384,
         concurrency: tuple[int, int] | int = (1, 8),
         num_cpus: float = 1.0) -> Dataset:
    """Extracted pages -> per-batch aggregate rows (LINKED_SCHEMA)."""
    return extracted.map_batches(
        LinkerActor, fn_constructor_args=(gaz_rows_ref, canon_ref),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=num_cpus)


class ExtractLinkActor(LinkerActor):
    """FUSED extract+link: one actor stage over raw pages instead of a
    task-stage (extract) feeding an actor-stage (link).

    Why: the r1 control ladder (BASELINE.md) showed a third of pages-stage
    throughput at 28 workers lost to Ray Data per-task machinery — two
    stages mean twice the task dispatches and an intermediate text block
    per batch through the object store. Fusing halves the per-batch fixed
    cost and never materializes the extracted text at all (html in →
    aggregate rows out). `extract()` remains the standalone stage (its
    byte-identical-text contract is pinned by tests; the fused path calls
    the same extract_text per row)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.text import extract_text
        texts = [extract_text(h) for h in batch["html"].to_pylist()]
        slim = pa.table({
            "text": pa.array(texts, pa.large_string()),
            "ok": pa.array([t is not None for t in texts], pa.bool_())})
        return super().__call__(slim)


def link_pages(pages: Dataset, gaz_rows_ref, canon_ref,
               batch_size: int = 16384,
               concurrency: tuple[int, int] | int = (1, 8),
               num_cpus: float = 1.0) -> Dataset:
    """Raw pages (url, html, …) -> LINKED_SCHEMA aggregates, fused."""
    return pages.map_batches(
        ExtractLinkActor, fn_constructor_args=(gaz_rows_ref, canon_ref),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=num_cpus)


def triples_only(linked: Dataset) -> Dataset:
    """(subj, pred, obj, n) batch partials for the triple dedup."""
    return linked.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "triple"))
                   .select(["subj", "pred", "obj", "n"]),
        batch_format="pyarrow")


def mentions_only(linked: Dataset) -> Dataset:
    """(node_key, n) partials — surface-frequency counters and head-entity
    (skew) detection input."""
    def f(t: pa.Table) -> pa.Table:
        m = t.filter(pc.equal(t["kind"], "mention"))
        return pa.table({"node_key": m["subj"], "n": m["n"]})
    return linked.map_batches(f, batch_format="pyarrow")


def misses_only(linked: Dataset) -> Dataset:
    """(surface, role, n) partials for the quarantine counters."""
    def f(t: pa.Table) -> pa.Table:
        m = t.filter(pc.equal(t["kind"], "miss"))
        return pa.table({"surface": m["subj"], "role": m["pred"],
                         "n": m["n"]})
    return linked.map_batches(f, batch_format="pyarrow")


