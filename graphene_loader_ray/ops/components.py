"""Connected components over same-as pairs (the canonical-merge engine, D6).

Two implementations with identical results:

- ``union_find``: driver-side, for pair sets that are provably small. The
  KG same-as graph is vocabulary-scale (one pair per DATABASE_BRIDGE edge —
  GeneLoader.groovy:101-108, OntologyLoader.groovy:122-133,
  post-import-cypher.txt:21-23), orders of magnitude smaller than the page
  corpus, so the driver path is the default for the KG pipeline.

- ``label_propagation``: distributed bounded-round min-label propagation via
  ``groupby().aggregate(Min)`` — the scale path when the same-as graph
  itself is too large to collect (e.g. corpus-level near-dup components).
  Same-as graphs here are shallow (stars around canonical entities), so few
  rounds reach fixpoint; rounds are capped and convergence is checked by a
  cheap changed-row count per round (SURVEY.md §7.4 "union-find on a
  distributed engine").

Canonical label = lexicographic min of the component — commutative and
order-independent, unlike the reference's last-writer-wins upsert
(Importer.groovy:117-123; SURVEY.md §5e).
"""

from __future__ import annotations

import pyarrow as pa

import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Min


def union_find(pairs: list[tuple[str, str]]) -> dict[str, str]:
    """node -> canonical (min member) for every node appearing in a pair."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != root:          # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    nodes = {n for p in pairs for n in p}
    return {n: find(n) for n in nodes}


def label_propagation(pairs_ds: Dataset, max_rounds: int = 16) -> Dataset:
    """pairs_ds(a, b) -> Dataset(node, canonical). Distributed min-label
    propagation: each round every node takes min(own label, neighbors'
    labels); fixpoint = component-min everywhere."""

    def sym(batch: pa.Table) -> pa.Table:
        # undirected: emit both directions (src, dst)
        return pa.table({
            "src": pa.concat_arrays([batch["a"].combine_chunks(),
                                     batch["b"].combine_chunks()]),
            "dst": pa.concat_arrays([batch["b"].combine_chunks(),
                                     batch["a"].combine_chunks()]),
        })

    from .join import equi_join

    edges = pairs_ds.map_batches(sym, batch_format="pyarrow") \
        .repartition(8).materialize()
    # init: label(node) = node
    labels = edges.groupby("src").aggregate(Min("dst", alias_name="_drop")) \
                  .map_batches(lambda t: pa.table({
                      "node": t["src"],
                      "label": t["src"]}), batch_format="pyarrow") \
                  .repartition(8).materialize()

    edges_by_src = edges.map_batches(
        lambda t: pa.table({"node": t["src"], "dst": t["dst"]}),
        batch_format="pyarrow").materialize()

    for _ in range(max_rounds):
        # messages: for edge (src,dst), dst hears src's current label
        msgs = equi_join(edges_by_src, labels, ["node"], num_partitions=8) \
            .map_batches(lambda t: pa.table({
                "node": t["dst"], "label": t["label"]}), batch_format="pyarrow")
        combined = msgs.union(labels)
        new_labels = combined.groupby("node") \
                             .aggregate(Min("label", alias_name="label")) \
                             .repartition(8).materialize()
        # convergence: any label changed?
        old = labels.map_batches(
            lambda t: t.rename_columns(["node", "label_old"]),
            batch_format="pyarrow")
        changed = equi_join(new_labels, old, ["node"], num_partitions=8) \
            .map_batches(lambda t: t.filter(
                pa.compute.not_equal(t["label"], t["label_old"])),
                batch_format="pyarrow") \
            .count()
        labels = new_labels
        if changed == 0:
            break
    else:
        # min-label propagation needs O(component diameter) rounds; a
        # silent non-fixpoint would return wrong canonicals and diverge
        # from union_find (ADVICE r1)
        raise RuntimeError(
            f"label_propagation did not converge in {max_rounds} rounds "
            f"({changed} labels still changing); component diameter exceeds "
            f"the round cap — raise max_rounds")
    return labels.map_batches(
        lambda t: t.rename_columns(["node", "canonical"]), batch_format="pyarrow")
