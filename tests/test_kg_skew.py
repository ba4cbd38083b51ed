"""Adversarial head-entity skew through the FULL KG flagship (SURVEY §4's
"H2O problem" at pipeline level, VERDICT r3 item 6).

The fixture plants ONE surface ("H2O [cytosol]") three times on ~30% of
all pages on top of the generator's organic Zipf head (~12% of ALL
mentions — a reduce-partition-sized share, which is what the load-based
salt trigger keys on). The pipeline must (a) still equal
the oracle exactly, and (b) keep the corpus-scale triple reduce BALANCED:
the fused link actors combine per batch (stages/link.py), so the hottest
triple reaches the (subj, pred, obj) shuffle as O(n_batches) partial rows,
not O(n_pages) raw rows — no reduce partition may exceed ~2× the median."""

from __future__ import annotations

import os
import shutil

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

# three occurrences per planted page: the salt trigger is LOAD-based
# (head_mention_keys share_floor) — a planted key must hold a
# partition-sized share of ALL mentions to qualify as a bottleneck, and
# one occurrence on 30% of pages dilutes to ~6% of mentions (organic
# density ~7/page), right at the floor. 3x lands it at ~12%, a share
# that genuinely overloads one of the 8 reduce partitions.
HOT = (b"<p>H2O [cytosol] is part of ATP [cytosol].</p>\n" * 3
       + b"</article>")
N_PARTITIONS = 4


@pytest.fixture(scope="module")
def skew_fixture_dir(smoke_fixture_dir, tmp_path_factory):
    """Derived fixture: same vocab, pages with the hot surface injected
    into every (idx % 10 < 3) well-formed page's article body."""
    out = str(tmp_path_factory.mktemp("skewfix"))
    for name in ("vocab_objects", "vocab_edges", "vocab_terms"):
        shutil.copy(os.path.join(smoke_fixture_dir, f"{name}.parquet"),
                    os.path.join(out, f"{name}.parquet"))
    os.makedirs(os.path.join(out, "pages"))
    idx = 0
    n_hot = 0
    src = os.path.join(smoke_fixture_dir, "pages")
    for f in sorted(os.listdir(src)):
        if not f.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(src, f))
        htmls = []
        for h in t["html"].to_pylist():
            if idx % 10 < 3 and b"</article>" in h:
                h = h.replace(b"</article>", HOT, 1)
                n_hot += 1
            htmls.append(h)
            idx += 1
        t = t.set_column(t.schema.get_field_index("html"), "html",
                         [htmls])
        pq.write_table(t, os.path.join(out, "pages", f))
    assert n_hot >= 0.25 * idx
    return out


@pytest.fixture(scope="module")
def skew_pipeline(skew_fixture_dir, tmp_path_factory):
    from graphene_loader_ray.pipelines.kg import run_kg_pipeline

    out = str(tmp_path_factory.mktemp("skew_out"))
    res = run_kg_pipeline(skew_fixture_dir, out,
                          n_page_partitions=N_PARTITIONS)
    return res


@pytest.fixture(scope="module")
def skew_oracle(skew_fixture_dir):
    from graphene_loader_ray.oracle.kg import run_oracle

    return run_oracle(skew_fixture_dir)


def test_skewed_output_matches_oracle(skew_pipeline, skew_oracle):
    t = pq.read_table(os.path.join(skew_pipeline["graph_dir"], "edges"))
    eng = set(zip(t["subj"].to_pylist(), t["pred"].to_pylist(),
                  t["obj"].to_pylist()))
    assert eng == skew_oracle["triples"]
    m = pq.read_table(os.path.join(skew_pipeline["graph_dir"], "mentions"))
    eng_m = dict(zip(m["node_key"].to_pylist(), m["n_mentions"].to_pylist()))
    assert eng_m == skew_oracle["mentions"]


def test_hot_surface_dominates(skew_oracle, skew_pipeline):
    """The injection really is adversarial: one entity is mentioned on
    ≥25% of pages (plus its organic occurrences)."""
    counts = skew_oracle["mentions"]
    hot = [k for k in counts if "H2O [cytosol]" in k]
    assert hot, sorted(counts)[:5]
    n_pages = skew_pipeline["counters"]["pages"]
    assert counts[hot[0]] >= 0.25 * n_pages


def test_hot_surface_on_salted_path(skew_pipeline):
    """The A4 mentions head feeds the salt list (VERDICT r4 #6): the
    planted hot entity must appear in the published salt_head.json —
    i.e. its triples took the salted two-phase reduce — and parity
    (test_skewed_output_matches_oracle) holds with that path active."""
    import json
    with open(os.path.join(skew_pipeline["graph_dir"],
                           "salt_head.json")) as fh:
        head = json.load(fh)
    assert any("H2O [cytosol]" in k for k in head), head


def test_reduce_partitions_stay_balanced(skew_pipeline):
    """Replay the exact partition assignment of the graph-stage triple
    reduce (ops/partition.py group_partitioned: pandas stable hash of the
    key columns mod 8, as dedup_merge_props uses in run_graph_stage) over
    the REAL per-partition partials the pipeline committed. The in-actor
    per-batch combine must have absorbed the hot key: its partial rows are
    bounded by the task count, and no reduce partition sees more than ~2×
    the median row count."""
    linked_root = os.path.join(skew_pipeline["outdir"], "triples")
    parts = []
    for d in sorted(os.listdir(linked_root)):
        ld = os.path.join(linked_root, d, "linked")
        if os.path.isdir(ld):
            parts.append(pq.read_table(ld))
    assert parts
    import pyarrow as pa
    t = pa.concat_tables(parts)
    df = t.to_pandas()
    tri = df[df["kind"] == "triple"]
    # (a) combiner-first: hottest triple ≤ a couple of partial rows per
    # page partition (one per in-actor batch), NOT one per page
    per_key = tri.groupby(["subj", "pred", "obj"]).size()
    assert per_key.max() <= 2 * N_PARTITIONS, per_key.nlargest(3)
    # ...while its merged support really is corpus-hot
    support = tri.groupby(["subj", "pred", "obj"])["n"].sum()
    assert support.max() >= 100
    # (b) reduce balance: same hash, same mod as the graph stage
    key_df = tri[["subj", "pred", "obj"]].astype(object)
    part = pd.util.hash_pandas_object(key_df, index=False) % 8
    counts = part.value_counts().reindex(range(8), fill_value=0).to_numpy()
    med = float(np.median(counts))
    assert med > 0
    assert counts.max() <= 2 * med, counts


def test_head_keys_require_partition_scale_share():
    """The salt trigger is LOAD-based, not just median-relative: a key at
    4x the median but holding a tiny share of total mentions cannot
    bottleneck a reduce partition (the reduce input is map-side-combined
    partials), so it must NOT be salted — salting it would cost a second
    shuffle for nothing. A key holding a partition-sized share must be."""
    import ray.data as rd

    from graphene_loader_ray.pipelines.kg import head_mention_keys

    # 200 uniform keys (count 100) + one 4x-median key: share 400/20400
    # ~ 2% < 1/16 -> not hot
    tame = rd.from_items(
        [{"node_key": f"k{i:03d}", "n_mentions": 100} for i in range(200)]
        + [{"node_key": "warm", "n_mentions": 400}])
    assert head_mention_keys(tame) == []
    # same tail + one key holding ~33% of all mentions -> hot
    skewed = rd.from_items(
        [{"node_key": f"k{i:03d}", "n_mentions": 100} for i in range(200)]
        + [{"node_key": "hot", "n_mentions": 10000}])
    assert head_mention_keys(skewed) == ["hot"]
