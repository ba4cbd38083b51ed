"""End-to-end KG pipeline vs the reference-semantics oracle (SURVEY.md §5).

The gate from BASELINE.json: triple P/R ≥ 0.95 vs the oracle. The engine
and oracle are independent implementations of one pinned spec, so we assert
exact equality (any drop below 1.0 is a semantics divergence to fix, not
round off)."""

from __future__ import annotations

import os
import shutil

import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def pipeline_result(smoke_fixture_dir, tmp_path_factory):
    from graphene_loader_ray.pipelines.kg import run_kg_pipeline

    out = str(tmp_path_factory.mktemp("kg_out"))
    res = run_kg_pipeline(smoke_fixture_dir, out, n_page_partitions=4)
    return res


@pytest.fixture(scope="module")
def oracle_result(smoke_fixture_dir):
    from graphene_loader_ray.oracle.kg import run_oracle

    return run_oracle(smoke_fixture_dir)


def _triples(graph_dir: str) -> set[tuple[str, str, str]]:
    t = pq.read_table(os.path.join(graph_dir, "edges"))
    return set(zip(t["subj"].to_pylist(), t["pred"].to_pylist(),
                   t["obj"].to_pylist()))


def test_triples_match_oracle(pipeline_result, oracle_result):
    eng = _triples(pipeline_result["graph_dir"])
    gold = oracle_result["triples"]
    tp = len(eng & gold)
    precision = tp / max(1, len(eng))
    recall = tp / max(1, len(gold))
    assert precision >= 0.95 and recall >= 0.95, (precision, recall)
    # strict: identical sets (deterministic shared spec)
    assert eng == gold


def test_nodes_match_oracle(pipeline_result, oracle_result):
    """Exact node-set equality including the label union (D2) and the
    merged property map (VERDICT r1 tasks 3-4)."""
    t = pq.read_table(os.path.join(pipeline_result["graph_dir"], "nodes"))
    eng = set(zip(t["label"].to_pylist(), t["name"].to_pylist(),
                  t["canonical_id"].to_pylist(),
                  (tuple(ls) for ls in t["labels"].to_pylist()),
                  t["props"].to_pylist()))
    gold = {(l, n, c, tuple(labels), props)
            for l, n, c, labels, props in oracle_result["nodes"].values()}
    assert eng == gold


def test_edge_props_match_oracle(pipeline_result, oracle_result):
    """Edge property maps (rank on m:m columns, evidence codes on gene
    ontology refs) equal the oracle's, after canonical merge."""
    t = pq.read_table(os.path.join(pipeline_result["graph_dir"], "edges"))
    eng = {(s, p, o): props for s, p, o, props in
           zip(t["subj"].to_pylist(), t["pred"].to_pylist(),
               t["obj"].to_pylist(), t["props"].to_pylist())
           if props is not None}
    assert eng == oracle_result["edge_props"]
    # the fixture must actually exercise both prop kinds
    assert any('"rank"' in p for p in eng.values())
    assert any('"evidence"' in p for p in eng.values())


def test_node_props_exercised(oracle_result):
    """The fixture exercises every props family: scalar merge with digit
    promotion, J6 m:1 name denorm, and array-valued protein features."""
    props = [p for *_, p in oracle_result["nodes"].values() if p]
    assert any('"identifier"' in p for p in props)
    assert any('"accession":1' in p for p in props)     # digit-promoted int
    assert any('Name"' in p for p in props)             # <col>Name denorm
    assert any('"coils":["Coil"]' in p for p in props)  # String[] feature


def test_output_sorted_by_canonical_id(pipeline_result):
    t = pq.read_table(os.path.join(pipeline_result["graph_dir"], "nodes"))
    ids = t["canonical_id"].to_pylist()
    assert ids == sorted(ids)
    e = pq.read_table(os.path.join(pipeline_result["graph_dir"], "edges"))
    key = list(zip(e["subj"].to_pylist(), e["pred"].to_pylist(),
                   e["obj"].to_pylist()))
    assert key == sorted(key)


def test_counters_quarantine_policy(pipeline_result, oracle_result):
    c = pipeline_result["counters"]
    # malformed pages quarantined, not crashed (GrameneMongoLoader.groovy:295-305)
    assert c["quarantined_pages"] >= 1
    # unknown surfaces dropped + counted (Loader.groovy:414-427)
    assert c["unlinked_mentions"] == oracle_result["counters"]["unlinked_mentions"]
    # dangling KB refs counted per (source, pred) — identical diagnostics
    # from both paths (keys AND values), per the shared counter naming rule
    eng_dangling = {k: v for k, v in c.items()
                    if k.startswith("dangling_edge:")}
    gold_dangling = {k: v for k, v in oracle_result["counters"].items()
                     if k.startswith("dangling_edge:")}
    assert eng_dangling == gold_dangling
    assert eng_dangling


def test_no_alt_id_edges(pipeline_result, oracle_result):
    """SURVEY.md §2.11: preprocess removes alt_id before NCBITaxonLoader
    reads it (GrameneMongoLoader.groovy:312 vs NCBITaxonLoader.groovy:187)
    — the ALT_ID path is dead code, so the golden set has NO ALT_ID edges."""
    eng = _triples(pipeline_result["graph_dir"])
    assert not any(p == "ALT_ID" for _, p, _ in eng)
    assert not any(p == "ALT_ID" for _, p, _ in oracle_result["triples"])


def test_mention_counts_match_oracle(pipeline_result, oracle_result):
    """Surface-frequency table (A4 head-entity/skew input) matches the
    oracle's single-process scan, and head entities dominate it."""
    t = pq.read_table(os.path.join(pipeline_result["graph_dir"], "mentions"))
    eng = dict(zip(t["node_key"].to_pylist(), t["n_mentions"].to_pylist()))
    assert eng == oracle_result["mentions"]
    # the fixture plants Zipf-skewed head entities (H2O/ATP analogs):
    # at least one should sit in the global top 5
    top = sorted(eng, key=lambda k: -eng[k])[:5]
    assert any("[cytosol]" in k for k in top)


def test_miss_surfaces_match_oracle(pipeline_result, oracle_result):
    """The quarantine SIDE TABLE: per-(surface, role) unlinkable-mention
    counts equal the oracle's (the reference only log-lines these,
    Loader.groovy:414-427 — a queryable table is the upgrade)."""
    t = pq.read_table(os.path.join(pipeline_result["graph_dir"], "misses"))
    eng = {(s, r): n for s, r, n in
           zip(t["surface"].to_pylist(), t["role"].to_pylist(),
               t["n_misses"].to_pylist())}
    assert eng == oracle_result["miss_counts"]
    assert sum(eng.values()) == oracle_result["counters"]["unlinked_mentions"]


def test_gene_trees_and_dynamic_rels(pipeline_result, oracle_result):
    """Round-3 parity additions: GeneTree nodes + IN edges
    (GeneLoader.groovy:37,186-193 createGenetrees) and generalized
    leftover-collection dynamic rels (OntologyLoader.groovy:56-67 — the
    fixture's `consider` column → CONSIDER edges). Exact engine==oracle
    equality is asserted elsewhere; this pins that the fixture exercises
    the features at all (the r2 gap was invisible precisely because the
    fixtures lacked the fields)."""
    eng = _triples(pipeline_result["graph_dir"])
    in_edges = {(s, o) for s, p, o in eng if p == "IN"}
    assert in_edges
    assert all(o.startswith("N:GeneTree:") for _, o in in_edges)
    # trees are shared across genes: more IN edges than distinct tree nodes
    assert len({o for _, o in in_edges}) < len(in_edges)
    assert any(p == "CONSIDER" for _, p, _ in eng)
    assert any(p == "IN" for _, p, _ in oracle_result["triples"])
    assert any(p == "CONSIDER" for _, p, _ in oracle_result["triples"])


def test_dangling_interpro_set_edge_gated(pipeline_result, oracle_result):
    """The set→gene CONTAINS edge is emitted only when at least one
    (gene, interpro) ref resolves — GeneLoader.groovy keeps
    link(setNodeId, nodeId) INSIDE the if(interproNodeId) branch. The
    fixture's gene 11 has ALL-dangling interpro ids: its orphan
    InterProSet node must exist with NO edges touching it."""
    from graphene_loader_ray.kb import spec

    set_key = spec.node_key(spec.LABEL_INTERPRO_SET,
                            spec.interpro_set_name([990_001, 990_002]))
    t = pq.read_table(os.path.join(pipeline_result["graph_dir"], "nodes"))
    names = set(zip(t["label"].to_pylist(), t["name"].to_pylist()))
    assert (spec.LABEL_INTERPRO_SET,
            spec.interpro_set_name([990_001, 990_002])) in names
    eng = _triples(pipeline_result["graph_dir"])
    assert not any(s == set_key or o == set_key for s, _, o in eng)
    # the four probes (2 per dangling ipr) are counted, engine == oracle
    assert pipeline_result["counters"]["dangling_edge:domains:CONTAINS"] == 4
    assert oracle_result["counters"]["dangling_edge:domains:CONTAINS"] == 4


def test_resume_skips_everything(pipeline_result, smoke_fixture_dir):
    from graphene_loader_ray.pipelines.kg import run_kg_pipeline

    res2 = run_kg_pipeline(smoke_fixture_dir, pipeline_result["outdir"],
                           n_page_partitions=4)
    assert res2["kb_skipped"]
    assert res2["page_partitions_ran"] == 0
    assert res2["graph_skipped"]


def test_kill_and_resume_equivalence(smoke_fixture_dir, tmp_path_factory,
                                     oracle_result):
    """A run killed after 2 of 4 page partitions resumes without recompute
    and converges to the same graph."""
    from graphene_loader_ray.pipelines.kg import (run_kb_stage,
                                                  run_kg_pipeline,
                                                  run_pages_stage)

    out = str(tmp_path_factory.mktemp("kg_killed"))
    kb = run_kb_stage(smoke_fixture_dir, out)
    partial = run_pages_stage(smoke_fixture_dir, out, kb["dir"],
                              n_partitions=4, max_partitions=2)
    assert partial["ran"] == 2
    # "restart": full pipeline over the same outdir
    res = run_kg_pipeline(smoke_fixture_dir, out, n_page_partitions=4)
    assert res["kb_skipped"]
    assert res["page_partitions_skipped"] == 2
    assert res["page_partitions_ran"] == 2
    assert _triples(res["graph_dir"]) == oracle_result["triples"]


def test_changed_input_invalidates_partition(tmp_path):
    """A partition is skipped iff its input fingerprint matches — touching
    an input file re-runs exactly that partition."""
    import shutil

    from graphene_loader_ray.pipelines.checkpoint import (StageManifest,
                                                          fingerprint_paths)

    f1 = tmp_path / "a.parquet"
    f1.write_bytes(b"one")
    f2 = tmp_path / "b.parquet"
    f2.write_bytes(b"two")
    man = StageManifest(str(tmp_path / "out"), "stage")
    fp1 = fingerprint_paths([str(f1)])
    man.start("p0")
    man.commit("p0", fp1)
    assert man.is_done("p0", fingerprint_paths([str(f1)]))
    # same content, different mtime => invalidated (conservative)
    import os
    os.utime(f1, ns=(1, 1))
    assert not man.is_done("p0", fingerprint_paths([str(f1)]))
    # re-open manifest from disk: state survives process restart
    man2 = StageManifest(str(tmp_path / "out"), "stage")
    assert "p0" in man2.partitions


def test_incremental_append_equals_fresh(tmp_path):
    """North-rule incremental ingest (VERDICT r4 next-round #5): append
    new pages partitions to a COMPLETED run → (a) only the new
    partitions compute (the file→partition striping ``files[i::n]`` is
    append-stable: file j always lands in partition j % n, so existing
    partitions keep their fingerprints), (b) the kb stage stays skipped
    but the graph stage's reduces refresh (its fingerprint covers the
    triples manifest), and (c) the final graph tables are byte-identical
    to a from-scratch run over the full input. This is the restart gap
    the north rule exists to fix — the reference refuses to load into a
    nonempty store (LoadGrameneGraphDb.groovy:40-42)."""
    from graphene_loader_ray.pipelines.kg import run_kg_pipeline
    from graphene_loader_ray.sources.synth import synthesize

    src = synthesize(n_pages=400)
    fix = tmp_path / "fixture"
    fix.mkdir()
    for f in os.listdir(src):
        p = os.path.join(src, f)
        if os.path.isfile(p):
            os.symlink(p, fix / f)
    pages = fix / "pages"
    pages.mkdir()
    all_files = sorted(os.listdir(os.path.join(src, "pages")))
    assert len(all_files) == 8
    for f in all_files[:6]:
        os.symlink(os.path.join(src, "pages", f), pages / f)

    out_inc = str(tmp_path / "inc")
    r1 = run_kg_pipeline(str(fix), out_inc, n_page_partitions=8)
    assert r1["page_partitions_ran"] == 6 and not r1["graph_skipped"]

    for f in all_files[6:]:                       # the append
        os.symlink(os.path.join(src, "pages", f), pages / f)
    r2 = run_kg_pipeline(str(fix), out_inc, n_page_partitions=8)
    assert r2["kb_skipped"]
    assert r2["page_partitions_skipped"] == 6     # (a) old partitions skip
    assert r2["page_partitions_ran"] == 2         #     only the new compute
    assert not r2["graph_skipped"]                # (b) reduces refreshed

    out_fresh = str(tmp_path / "fresh")
    r3 = run_kg_pipeline(str(fix), out_fresh, n_page_partitions=8)
    for tbl in ("nodes", "edges", "mentions", "misses"):
        a = pq.read_table(os.path.join(r2["graph_dir"], tbl))
        b = pq.read_table(os.path.join(r3["graph_dir"], tbl))
        assert a.equals(b), tbl                   # (c) append == fresh
    assert r2["counters"] == r3["counters"]
    assert r2["counters"]["pages"] == 400


def test_parity_holds_at_larger_vocabulary(tmp_path_factory):
    """Engine == oracle on a 4× vocabulary (more genes → more surfaces,
    registries, bridges, adjacency chains): guards against scale-dependent
    divergence (band-hash collisions, registry key clashes, automaton
    construction) that the 64-gene smoke fixture can't see."""
    from graphene_loader_ray.oracle.kg import run_oracle
    from graphene_loader_ray.pipelines.kg import run_kg_pipeline
    from graphene_loader_ray.sources.synth import synthesize

    fixture = synthesize(n_pages=200, n_genes=256)
    out = str(tmp_path_factory.mktemp("kg_big_vocab"))
    res = run_kg_pipeline(fixture, out, n_page_partitions=2)
    gold = run_oracle(fixture)
    assert _triples(res["graph_dir"]) == gold["triples"]
    t = pq.read_table(os.path.join(res["graph_dir"], "nodes"))
    eng = set(zip(t["label"].to_pylist(), t["name"].to_pylist(),
                  t["canonical_id"].to_pylist(), t["props"].to_pylist()))
    want = {(l, n, c, p) for l, n, c, _labels, p in gold["nodes"].values()}
    assert eng == want


def test_components_distributed_matches_union_find(smoke_fixture_dir):
    """label_propagation (scale path) == union_find (driver path)."""
    import ray.data as rd

    from graphene_loader_ray.ops.components import (label_propagation,
                                                    union_find)

    pairs = [("a", "b"), ("b", "c"), ("d", "e"), ("f", "f2"), ("e", "g"),
             ("x", "a")]
    want = union_find(pairs)
    ds = rd.from_items([{"a": a, "b": b} for a, b in pairs])
    got = {r["node"]: r["canonical"]
           for r in label_propagation(ds).take_all()}
    assert got == want
