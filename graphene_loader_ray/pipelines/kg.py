"""The flagship pipeline: pages + vocab → canonical KG Parquet, resumable.

    vocab parquet ─┬─ build_kb ── derive ── canonicalize ──▶ kb stage
                   └─ gazetteer + canonical map (broadcast artifacts)
    pages parquet ── per-partition: FUSED extract+link actor pool →
                     combined in-actor partials (triples/mentions/misses/
                     quarantine) → committed part dirs      ▶ triples stage
    final: kb edges ∪ page partials → per-kind global reduces → sorted
           nodes/edges/mentions/misses parquet              ▶ graph stage

Each stage checkpoints through pipelines/checkpoint.py manifests; a killed
run resumes and skips completed partitions (north rule). The page stage is
the only corpus-scale phase: partitions are input-file groups, so at 100 TB
a partition is a few hundred parquet files and the loop commits progress at
that granularity while Ray Data streams within each partition.
"""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..ops.aggregate import pre_aggregated_sum
from ..stages.canonicalize import (canonical_map, canonicalize_edges,
                                   canonicalize_nodes)
from ..stages.derive import derive_edges
from ..stages.link import (link_pages, mentions_only, misses_only,
                           triples_only)
from ..stages.vocab import build_kb
from .checkpoint import StageManifest, fingerprint_paths

_GAZ_SCHEMA = pa.schema([("surface", pa.string()), ("node_key", pa.string()),
                         ("is_primary", pa.bool_())])


def _vocab_paths(fixture_dir: str) -> list[str]:
    return [os.path.join(fixture_dir, f"vocab_{n}.parquet")
            for n in ("objects", "edges", "terms")]


def _page_paths(fixture_dir: str) -> list[str]:
    pages = os.path.join(fixture_dir, "pages")
    return sorted(os.path.join(pages, f) for f in os.listdir(pages)
                  if f.endswith(".parquet"))


def _warc_paths(fixture_dir: str) -> list[str]:
    d = os.path.join(fixture_dir, "warc")
    return sorted(os.path.join(d, f) for f in os.listdir(d)
                  if f.endswith(".warc.gz"))


def run_kb_stage(fixture_dir: str, outdir: str, resume: bool = True) -> dict:
    """Build + canonicalize the KB; publish artifacts under <outdir>/kb."""
    man = StageManifest(outdir, "kb")
    fp = fingerprint_paths(_vocab_paths(fixture_dir))
    pdir = man.partition_dir("all")
    if resume and man.is_done("all", fp):
        return {"dir": pdir, "skipped": True,
                "counters": man.partitions["all"]["counters"]}

    tmp = man.start("all")
    kb = build_kb(fixture_dir)
    derived, to_nodes = derive_edges(kb.edges, kb.registry)
    from ..ops.aggregate import dedup_merge_props
    all_edges = dedup_merge_props(kb.edges.union(derived),
                                  ["subj", "pred", "obj"],
                                  num_partitions=8).materialize()

    canon = canonical_map(all_edges)
    canon_ref = ray.put(canon)

    canonicalize_edges(all_edges, canon_ref, num_output_blocks=8) \
        .write_parquet(os.path.join(tmp, "edges"))
    # the ONE node-merge shuffle (D1 dedup + D2 label union + props merge)
    # over raw emission rows ∪ reified To rows, before the canonical map
    # is applied (vocab.merge_nodes_part; kb.nodes is deliberately
    # unmerged so this runs exactly once)
    from ..ops.partition import group_partitioned
    from ..stages.vocab import merge_nodes_part
    all_nodes = group_partitioned(kb.nodes.union(to_nodes),
                                  ["label", "name"], merge_nodes_part,
                                  num_partitions=8)
    canonicalize_nodes(all_nodes, canon_ref) \
        .write_parquet(os.path.join(tmp, "nodes"))
    # normalize + dedup surfaces through Gazetteer.build so the published
    # artifact rows are exactly what Gazetteer.from_rows expects (normalized
    # keys, primary-beats-synonym applied)
    from ..functions.linking import Gazetteer
    gaz_rows = Gazetteer.build(kb.gazetteer_rows).to_rows()
    if gaz_rows:
        surfaces, keys, prims = zip(*gaz_rows)
    else:
        surfaces, keys, prims = (), (), ()
    pq.write_table(pa.table({"surface": list(surfaces), "node_key": list(keys),
                             "is_primary": list(prims)}, schema=_GAZ_SCHEMA),
                   os.path.join(tmp, "gazetteer.parquet"))
    with open(os.path.join(tmp, "canonical.json"), "w") as fh:
        json.dump(canon, fh)
    man.commit("all", fp, counters=kb.counters)
    return {"dir": pdir, "skipped": False, "counters": kb.counters}


def load_kb_artifacts(kb_dir: str):
    """(gaz_rows_ref, canon_ref) broadcast handles from a committed kb stage."""
    gaz_tbl = pq.read_table(os.path.join(kb_dir, "gazetteer.parquet"))
    rows = list(zip(gaz_tbl["surface"].to_pylist(),
                    gaz_tbl["node_key"].to_pylist(),
                    gaz_tbl["is_primary"].to_pylist()))
    with open(os.path.join(kb_dir, "canonical.json")) as fh:
        canon = json.load(fh)
    return ray.put(rows), ray.put(canon)


def run_pages_stage(fixture_dir: str, outdir: str, kb_dir: str,
                    n_partitions: int = 4, resume: bool = True,
                    batch_size: int = 8192,
                    concurrency=(1, 8),
                    max_partitions: int | None = None,
                    repeat: int = 1,
                    pages_format: str = "parquet") -> dict:
    """Per-partition extract → link → partial dedup; commit each partition.

    ``max_partitions`` stops after that many partitions have been processed
    this call — the kill-and-resume test hook, and an operational lever for
    incremental runs.

    ``repeat`` re-reads the input file list that many times (benchmark
    input amplification: multiplies per-row work without synthesizing a
    bigger corpus; duplicate rows fold into the triple-dedup supports).

    ``pages_format="warc"`` ingests the crawl wire format directly
    (``<fixture>/warc/*.warc.gz`` via ``sources/warc.py``) instead of the
    parquet twins — identical graph output (pinned by
    ``test_kg_from_warc_equals_parquet``)."""
    man = StageManifest(outdir, "triples")
    paths_of = _warc_paths if pages_format == "warc" else _page_paths
    files = paths_of(fixture_dir) * repeat
    groups = [files[i::n_partitions] for i in range(n_partitions)]
    groups = [g for g in groups if g]
    gaz_ref, canon_ref = load_kb_artifacts(kb_dir)

    ran, skipped = 0, 0
    for i, group in enumerate(groups):
        if max_partitions is not None and ran >= max_partitions:
            break
        pid = f"{i:05d}"
        fp = fingerprint_paths(group)
        if resume and man.is_done(pid, fp):
            skipped += 1
            continue
        tmp = man.start(pid)
        # prune at the read: the fused extract+link stage needs ONLY the
        # raw html bytes (the generator's pre-extracted `text` column is
        # test-only; url/ts/lang don't flow into the aggregates)
        if pages_format == "warc":
            from collections import Counter

            from ..sources.warc import index_warc, read_warc
            # corrupt records keep flowing as html=null rows so the link
            # stage quarantines them exactly like the parquet path
            # (counters must not diverge between input formats)
            pages = read_warc(group).map_batches(
                lambda t: t.select(["html"]), batch_format="pyarrow")
            # record count from the member index alone (decompress-and-
            # discard walk, no parse) — pages.count() would re-run the
            # whole read; index each UNIQUE path once (repeat duplicates
            # paths for benchmark amplification)
            n_pages = sum(len(index_warc(p)) * m
                          for p, m in Counter(group).items())
        else:
            pages = rd.read_parquet(group, columns=["html"])
            n_pages = None
        # ONE streaming execution per partition: FUSED extract+link (a
        # single actor stage over raw pages — halves task dispatches and
        # never puts extracted text in the object store), materialized as
        # compact triple/mention/miss/quarantine rows; all counters and
        # dedups derive from this. batch_size: sized for ~KB pages; a
        # corpus of ~100 KB documents needs a smaller value so batch ×
        # concurrency fits worker heaps.
        linked = link_pages(pages, gaz_ref, canon_ref,
                            batch_size=batch_size,
                            concurrency=concurrency).materialize()
        # ONE write of the in-actor partials (triple/mention/miss/
        # quarantine rows together, already per-batch-aggregated) — the
        # per-kind reduces run ONCE in the graph stage over all committed
        # partitions instead of 3× per partition; a partition commit is
        # 2 executions (materialize + write), which is what bounds the
        # per-partition fixed cost at a 100 TB partition count
        linked.write_parquet(os.path.join(tmp, "linked"))
        # counters: driver pass over the (partial-aggregate-scale)
        # materialized rows — no extra Dataset execution
        counts: dict[str, int] = {}
        for b in linked.iter_batches(batch_size=65536,
                                     batch_format="pyarrow"):
            for kind, n in zip(b["kind"].to_pylist(), b["n"].to_pylist()):
                counts[kind] = counts.get(kind, 0) + n
        man.commit(pid, fp, counters={
            # parquet: file metadata, no read; warc: the member index
            "pages": n_pages if n_pages is not None else pages.count(),
            "unlinked_mentions": int(counts.get("miss", 0)),
            "quarantined_pages": int(counts.get("quarantined", 0))})
        ran += 1
    return {"ran": ran, "skipped": skipped,
            "counters": man.counters_total(),
            "dirs": man.completed_dirs()}


def run_graph_stage(outdir: str, kb_dir: str, resume: bool = True) -> dict:
    """Global dedup of kb edges ∪ page triples; sorted node/edge output."""
    man = StageManifest(outdir, "graph")
    up_kb = os.path.join(outdir, "kb", "_manifest.json")
    up_tr = os.path.join(outdir, "triples", "_manifest.json")
    fp = fingerprint_paths([up_kb, up_tr])
    pdir = man.partition_dir("all")
    if resume and man.is_done("all", fp):
        return {"dir": pdir, "skipped": True}

    tmp = man.start("all")
    tr_man = StageManifest(outdir, "triples")
    # combined per-partition partials (triple/mention/miss rows together,
    # already in-actor aggregated). override_num_blocks on every read
    # here: these inputs are partial-aggregate-scale; Ray's default read
    # fan-out would split each into ~200 near-empty blocks and the
    # downstream union+shuffle goes O(blocks²) (CLAUDE.md Ray 2.49 quirk)
    linked_dirs = [os.path.join(d, "linked") for d in tr_man.completed_dirs()]
    lparts = [rd.read_parquet(d, override_num_blocks=2)
              for d in linked_dirs if os.path.isdir(d)]
    linked = None
    if lparts:
        linked = lparts[0]
        for p in lparts[1:]:
            linked = linked.union(p)

    _cols = ["subj", "pred", "obj", "support", "props"]
    kb_edges = rd.read_parquet(os.path.join(kb_dir, "edges"),
                               override_num_blocks=2) \
        .map_batches(lambda t: t.append_column(
            "support", pa.array([1] * t.num_rows, pa.int64())).select(_cols),
            batch_format="pyarrow")
    union = kb_edges
    if linked is not None:
        # page triples carry no props — pad so the union schema is uniform
        union = union.union(triples_only(linked).map_batches(
            lambda t: pa.table({
                "subj": t["subj"], "pred": t["pred"], "obj": t["obj"],
                "support": t["n"],
                "props": pa.nulls(t.num_rows, pa.string())}),
            batch_format="pyarrow"))
    # sum partial supports per triple + merge edge props (the reduce half
    # of the two-phase dedup; props exist only on the KB side)
    from ..ops.aggregate import dedup_merge_props
    final_edges = dedup_merge_props(union, ["subj", "pred", "obj"],
                                    support_col="support", num_partitions=8) \
        .map_batches(lambda t: t.select(_cols), batch_format="pyarrow")
    final_edges.sort(["subj", "pred", "obj"]) \
               .write_parquet(os.path.join(tmp, "edges"))
    rd.read_parquet(os.path.join(kb_dir, "nodes"), override_num_blocks=2) \
        .sort(["canonical_id", "label", "name"]) \
        .write_parquet(os.path.join(tmp, "nodes"))
    if linked is not None:
        # surface-frequency reduce (A4); the head of this table is the
        # salt/blacklist candidate list
        pre_aggregated_sum(mentions_only(linked), ["node_key"], "n",
                           out_col="n_mentions", num_output_blocks=4) \
            .sort(["node_key"]) \
            .write_parquet(os.path.join(tmp, "mentions"))
        # quarantine reduce: per-(surface, role) unlinkable-mention counts
        pre_aggregated_sum(misses_only(linked), ["surface", "role"], "n",
                           out_col="n_misses", num_output_blocks=2) \
            .sort(["surface", "role"]) \
            .write_parquet(os.path.join(tmp, "misses"))
    man.commit("all", fp)
    return {"dir": pdir, "skipped": False}


def run_kg_pipeline(fixture_dir: str, outdir: str, *,
                    n_page_partitions: int = 4, resume: bool = True,
                    batch_size: int = 2048, concurrency=(1, 8),
                    pages_format: str = "parquet") -> dict:
    """End-to-end: kb → triples (per-partition) → graph. Returns summary."""
    kb_res = run_kb_stage(fixture_dir, outdir, resume=resume)
    pages_res = run_pages_stage(fixture_dir, outdir, kb_res["dir"],
                                n_partitions=n_page_partitions, resume=resume,
                                batch_size=batch_size, concurrency=concurrency,
                                pages_format=pages_format)
    graph_res = run_graph_stage(outdir, kb_res["dir"], resume=resume)

    counters = dict(kb_res.get("counters", {}))
    for k, v in pages_res["counters"].items():
        counters[k] = counters.get(k, 0) + v
    with open(os.path.join(outdir, "counters.json"), "w") as fh:
        json.dump(counters, fh, indent=1, sort_keys=True)
    return {"outdir": outdir, "graph_dir": graph_res["dir"],
            "kb_skipped": kb_res["skipped"],
            "page_partitions_ran": pages_res["ran"],
            "page_partitions_skipped": pages_res["skipped"],
            "graph_skipped": graph_res["skipped"],
            "counters": counters}
