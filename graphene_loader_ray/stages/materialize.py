"""Graph materialization — sorted, deduplicated node/edge Parquet (M5/O4).

Output contract (north star): nodes and edges sorted by canonical id so
re-loads are byte-stable and idempotent — the replacement for the
reference's caller-chosen BatchInserter ids (Loader.groovy:433-436) and
`merge`-based idempotent Cypher (post-import-cypher.txt). ``ds.sort`` is a
global all-to-all shuffle; it runs once, at the very end, on the already-
deduplicated tables.
"""

from __future__ import annotations

from ray.data import Dataset


def write_nodes(nodes: Dataset, outdir: str) -> None:
    """(canonical_id, label, name) sorted by (canonical_id, label, name)."""
    nodes.sort(["canonical_id", "label", "name"]).write_parquet(outdir)


def write_edges(edges: Dataset, outdir: str) -> None:
    """(subj, pred, obj[, support]) sorted by the triple key."""
    edges.sort(["subj", "pred", "obj"]).write_parquet(outdir)
