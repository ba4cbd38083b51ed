"""Entity-linking stage — the corpus-side actor pool (SURVEY.md §2.3 C7,
build plan M3).

``extracted pages ──map_batches(LinkerActor, concurrency=(n,m))──▶ triples``

This is the scale-critical stage: it runs once per page over the whole
corpus. Design per the north star:

  - stateful actor pool: the gazetteer (surface trie/dict + alias priors +
    IDF) and the canonical map are built ONCE per actor in ``__init__`` from
    ``ray.put`` handles — never re-shipped per batch
  - the batch loop only dispatches; the per-paragraph work is one compiled
    regex match + two dict lookups (functions/linking.py, shared verbatim
    with the oracle so engine and gold implement one semantic)
  - unlinkable surfaces become 'miss' rows (quarantine-not-crash,
    Loader.groovy:414-427 / GrameneMongoLoader.groovy:295-305), counted
    downstream — never raised
  - output rows are canonical triples, so downstream is exactly one shuffle:
    the combiner-first dedup (ops/aggregate.py)

Batch size: text rows are narrow once html is projected away (extract stage
drops it); 1-4k rows/batch amortizes actor dispatch without inflating heap.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray
from ray.data import Dataset

from ..functions.linking import Gazetteer, link_paragraphs

TRIPLE_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("subj", pa.string()), ("pred", pa.string()), ("obj", pa.string()),
    ("conf", pa.float32()),
    ("kind", pa.string()),          # 'triple' | 'miss'
])


class LinkerActor:
    """Mention detection + linking; one gazetteer build per actor."""

    def __init__(self, gaz_rows_ref, canon_ref) -> None:
        self.gaz = Gazetteer.from_rows(ray.get(gaz_rows_ref))
        self.canon: dict[str, str] = ray.get(canon_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls_out, subjs, preds, objs, confs, kinds = [], [], [], [], [], []
        ok = batch["ok"].to_pylist() if "ok" in batch.schema.names \
            else [True] * batch.num_rows
        for url, text, good in zip(batch["url"].to_pylist(),
                                   batch["text"].to_pylist(), ok):
            if not good or text is None:
                # quarantined page marker (GrameneMongoLoader.groovy:295-305
                # log-and-skip, as a countable row instead of a log line)
                urls_out.append(url)
                subjs.append(None)
                preds.append(None)
                objs.append(None)
                confs.append(0.0)
                kinds.append("quarantined")
                continue
            triples, misses = link_paragraphs(text, self.gaz, self.canon)
            for s, p, o, conf in triples:
                urls_out.append(url)
                subjs.append(s)
                preds.append(p)
                objs.append(o)
                confs.append(conf)
                kinds.append("triple")
            for surface, role in misses:
                urls_out.append(url)
                subjs.append(surface)
                preds.append(role)
                objs.append(None)
                confs.append(0.0)
                kinds.append("miss")
        return pa.table({"url": urls_out, "subj": subjs, "pred": preds,
                         "obj": objs, "conf": confs, "kind": kinds},
                        schema=TRIPLE_SCHEMA)


def link(extracted: Dataset, gaz_rows_ref, canon_ref,
         batch_size: int = 2048,
         concurrency: tuple[int, int] | int = (1, 8),
         num_cpus: float = 1.0) -> Dataset:
    """Extracted pages -> (url, subj, pred, obj, conf, kind) rows."""
    return extracted.map_batches(
        LinkerActor, fn_constructor_args=(gaz_rows_ref, canon_ref),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency, num_cpus=num_cpus)


def triples_only(linked: Dataset) -> Dataset:
    return linked.map_batches(
        lambda t: t.filter(pc.equal(t["kind"], "triple"))
                   .select(["subj", "pred", "obj"]),
        batch_format="pyarrow")


def misses_only(linked: Dataset) -> Dataset:
    """Unlinkable-mention (surface, role) rows for the counters table."""
    return linked.map_batches(
        lambda t: (lambda f: pa.table({"surface": f["subj"], "role": f["pred"]}))(
            t.filter(pc.equal(t["kind"], "miss"))),
        batch_format="pyarrow")


def kind_counts(linked: Dataset) -> dict[str, int]:
    """row counts per kind (triple / miss / quarantined) in one pass."""
    out = linked.groupby("kind").count().to_pandas()
    return dict(zip(out["kind"], out["count()"]))
