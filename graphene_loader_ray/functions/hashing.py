"""Deterministic ids and hashes.

The reference uses Neo4j's sequence ids (with Reactome DB_IDs grandfathered
in as physical node ids, Loader.groovy:57-60) — an id space that only works
single-writer. The new engine replaces it with content-derived ids so any
worker can mint the id for a node independently and re-runs are idempotent
(SURVEY.md §4 "Idempotent load").
"""

from __future__ import annotations

import hashlib
import struct


def stable_hash64(s: str) -> int:
    """Deterministic 64-bit hash of a string (never Python's salted hash())."""
    digest = hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest()
    return struct.unpack("<q", digest)[0]


def node_key(label: str, name: str) -> str:
    """Key for nodes deduped by (label, name) — the NodeCache key
    (Importer.groovy:97-103): dedup is per-(label, name), NOT name alone."""
    return f"N:{label}:{name}"


def reified_pair_key(a: str, b: str) -> str:
    """Deterministic id for a To{between, and} reified pair node
    (post-import-cypher.txt:14) — one node per (a, b) ordered pair."""
    return f"To:{a}|{b}"
