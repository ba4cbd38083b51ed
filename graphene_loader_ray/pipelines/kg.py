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


def _jsonl_paths(fixture_dir: str) -> list[str]:
    d = os.path.join(fixture_dir, "jsonl")
    return sorted(os.path.join(d, f) for f in os.listdir(d)
                  if f.endswith((".jsonl", ".jsonl.gz")))


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
    ``test_kg_from_warc_equals_parquet``). ``pages_format="jsonl"`` does
    the same for the web-text interchange format
    (``<fixture>/jsonl/*.jsonl.gz`` via ``sources/jsonl.py``, html
    base64; pinned by ``test_kg_from_jsonl_equals_parquet``)."""
    man = StageManifest(outdir, "triples")
    paths_of = {"warc": _warc_paths,
                "jsonl": _jsonl_paths}.get(pages_format, _page_paths)
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
        elif pages_format == "jsonl":
            from ..sources.jsonl import read_jsonl_pages

            # malformed lines keep flowing as html=null rows → the link
            # stage quarantines them (counter parity with parquet/warc)
            pages = read_jsonl_pages(group).map_batches(
                lambda t: t.select(["html"]), batch_format="pyarrow")
            # line count via a parse-free text pass (the JSONL analog of
            # warc's decompress-and-discard member walk); pages.count()
            # would re-run the full parse+decode chain. _read_lines
            # decides compression PER FILE, so mixed .jsonl/.jsonl.gz
            # groups count (and parse) every shard correctly.
            from ..sources.jsonl import _read_lines
            n_pages = _read_lines(group, "auto", None).count()
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


def head_mention_keys(mentions_ds, k: int = 64,
                      hot_factor: float = 4.0,
                      share_floor: float = 1.0 / 16.0) -> list[str]:
    """Hot node keys from the A4 surface-frequency reduce — the
    skew-detection input SURVEY §4 names (the reference knows these as
    the "common metabolites", post-import-cypher.txt:6). A key is hot
    when its mention count is ≥ ``hot_factor`` × the median count AND
    ≥ ``share_floor`` of all mentions. The share floor is the load test:
    the triple reduce consumes map-side-combined PARTIALS (a key's rows
    there are bounded by the upstream task count, not its mention count),
    so a head key only bottlenecks a reduce partition when it carries a
    partition-sized fraction of the data — below that, routing it through
    the salted path buys nothing and costs a second shuffle. 1/16 ≈ half
    of one of the 8 reduce partitions. Returns at most ``k`` keys,
    highest-count first (ties by key, so the list is deterministic).
    Driver-side scan is fine: the mentions reduce is
    node-vocabulary-scale, never corpus-scale."""
    import numpy as np

    keys: list[str] = []
    counts: list[int] = []
    for b in mentions_ds.iter_batches(batch_size=65536,
                                      batch_format="pyarrow"):
        keys += b["node_key"].to_pylist()
        counts += b["n_mentions"].to_pylist()
    if not keys:
        return []
    arr = np.asarray(counts, dtype=np.int64)
    med = max(1.0, float(np.median(arr)))
    floor = max(hot_factor * med, share_floor * float(arr.sum()))
    hot = sorted(((n, s) for n, s in zip(counts, keys) if n >= floor),
                 key=lambda t: (-t[0], t[1]))
    return [s for _, s in hot[:k]]


def _fold_triple_group(df):
    """One-row fold of a (subj, pred, obj) group: sum supports, merge props
    with the commutative kb/spec rule. Serves as BOTH phases of
    ``salted_group_apply`` (props-merge and support-sum are associative and
    commutative, so partial-of-partials equals the plain fold)."""
    import pandas as pd

    from ..kb.spec import merge_props_json
    if df.empty:
        return pd.DataFrame({"subj": pd.Series(dtype=object),
                             "pred": pd.Series(dtype=object),
                             "obj": pd.Series(dtype=object),
                             "support": pd.Series(dtype="int64"),
                             "props": pd.Series(dtype=object)})
    props = None
    for s in df["props"]:
        if s is not None and not (isinstance(s, float) and s != s):
            props = merge_props_json(props, s)
    return pd.DataFrame({"subj": [df["subj"].iloc[0]],
                         "pred": [df["pred"].iloc[0]],
                         "obj": [df["obj"].iloc[0]],
                         "support": [int(df["support"].sum())],
                         "props": [props]})


def run_graph_stage(outdir: str, kb_dir: str, resume: bool = True) -> dict:
    """Global dedup of kb edges ∪ page triples; sorted node/edge output.

    Skew control (VERDICT r4 next-round #6): the A4 mentions reduce runs
    FIRST and its head (:func:`head_mention_keys`) becomes the salt list
    for the triple reduce — triples touching a hot entity route through
    ``salted_group_apply`` (hot keys split across n_salts sub-reduces
    before the per-key merge; props-merge and support-sum are commutative,
    so the result is identical), everything else through the plain
    combiner-first ``dedup_merge_props``. The chosen head is published as
    ``salt_head.json`` next to the graph tables (test_kg_skew.py asserts
    the planted hot surface lands on it)."""
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
    # surface-frequency reduce (A4) FIRST — its head is the skew-detection
    # input for the triple reduce below (and the reference's blacklist
    # candidate list). Materialized: it feeds both the parquet write and
    # the driver-side head scan without recomputing.
    hot_keys: list[str] = []
    if linked is not None:
        mentions = pre_aggregated_sum(mentions_only(linked), ["node_key"],
                                      "n", out_col="n_mentions",
                                      num_output_blocks=4).materialize()
        mentions.sort(["node_key"]) \
                .write_parquet(os.path.join(tmp, "mentions"))
        hot_keys = head_mention_keys(mentions)
    with open(os.path.join(tmp, "salt_head.json"), "w") as fh:
        json.dump(hot_keys, fh)

    # sum partial supports per triple + merge edge props (the reduce half
    # of the two-phase dedup; props exist only on the KB side). Hot-entity
    # triples (subj or obj in the mentions head) take the salted two-phase
    # reduce; both folds are commutative (kb/spec.merge_props property
    # test), so the split is a pure scheduling decision.
    from ..ops.aggregate import dedup_merge_props, salted_group_apply
    keys3 = ["subj", "pred", "obj"]
    if hot_keys:
        import pyarrow.compute as pc
        hot_arr = pa.array(sorted(set(hot_keys)), pa.string())
        # one cheap materialize of the (partial-aggregate-scale) union so
        # the hot/cold split doesn't re-run the upstream reads twice
        union = union.materialize()

        def cold_rows(t: pa.Table) -> pa.Table:
            m = pc.or_(pc.is_in(t["subj"], value_set=hot_arr),
                       pc.is_in(t["obj"], value_set=hot_arr))
            return t.filter(pc.invert(m))

        def hot_rows(t: pa.Table) -> pa.Table:
            m = pc.or_(pc.is_in(t["subj"], value_set=hot_arr),
                       pc.is_in(t["obj"], value_set=hot_arr))
            return t.filter(m)

        cold = dedup_merge_props(
            union.map_batches(cold_rows, batch_format="pyarrow"),
            keys3, support_col="support", num_partitions=8) \
            .map_batches(lambda t: t.select(_cols), batch_format="pyarrow")
        hot = salted_group_apply(
            union.map_batches(hot_rows, batch_format="pyarrow"),
            keys3, _fold_triple_group, _fold_triple_group,
            n_salts=8, num_partitions=8) \
            .map_batches(lambda t: t.select(_cols), batch_format="pyarrow")
        final_edges = cold.union(hot)
    else:
        final_edges = dedup_merge_props(union, keys3,
                                        support_col="support",
                                        num_partitions=8) \
            .map_batches(lambda t: t.select(_cols), batch_format="pyarrow")
    final_edges.sort(keys3).write_parquet(os.path.join(tmp, "edges"))
    rd.read_parquet(os.path.join(kb_dir, "nodes"), override_num_blocks=2) \
        .sort(["canonical_id", "label", "name"]) \
        .write_parquet(os.path.join(tmp, "nodes"))
    if linked is not None:
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
                    pages_format: str = "parquet",
                    repeat: int = 1) -> dict:
    """End-to-end: kb → triples (per-partition) → graph. Returns summary
    incl. per-stage wall seconds (``stage_sec``). ``repeat`` amplifies the
    page input (see :func:`run_pages_stage`) for scale benchmarking."""
    import time
    t0 = time.time()
    kb_res = run_kb_stage(fixture_dir, outdir, resume=resume)
    t1 = time.time()
    pages_res = run_pages_stage(fixture_dir, outdir, kb_res["dir"],
                                n_partitions=n_page_partitions, resume=resume,
                                batch_size=batch_size, concurrency=concurrency,
                                pages_format=pages_format, repeat=repeat)
    t2 = time.time()
    graph_res = run_graph_stage(outdir, kb_res["dir"], resume=resume)
    t3 = time.time()

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
            "stage_sec": {"kb": round(t1 - t0, 3),
                          "pages": round(t2 - t1, 3),
                          "graph": round(t3 - t2, 3)},
            "counters": counters}
