"""Multimodal column plumbing — opaque binary payloads through actor pools.

Per the instruction set: image/audio/video are opaque ``binary`` columns
with typed metadata; decode / feature-extract are actor-pool ``map_batches``
stages.

The DECODE stage is REAL: a pure-python structural parser reads the actual
payload bytes and derives format + dimensions from the container headers
(PNG IHDR, JPEG SOFn marker scan, GIF logical screen descriptor) — no
codec library needed. Payloads that don't parse land on the quarantine
path (ok=False), never crash (the reference's log-and-skip policy,
GrameneMongoLoader.groovy:295-305).

The FEATURE stage remains a clearly-marked stub: real feature extraction
is model inference, and no model runtime ships in this container; the
sha-derived embedding keeps the batching/actor/schema plumbing exercised.
A real deployment replaces ``FeatureStub`` only.

Batch size stays small (256) because the payload column dominates block
memory (SURVEY.md §4 memory row: batch × concurrency must fit the worker
heap; large binary rows need small batches).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pyarrow as pa

from ray.data import Dataset

FEATURE_DIM = 8

DECODED_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("format", pa.string()),
    ("payload_sha256", pa.string()),
    ("n_bytes", pa.int64()),
    ("width", pa.int32()), ("height", pa.int32()),
    ("ok", pa.bool_()),
])

# JPEG start-of-frame markers carrying dimensions: 0xC0-0xCF minus
# DHT(0xC4), JPG(0xC8), DAC(0xCC)
_JPEG_SOF = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}
_JPEG_STANDALONE = frozenset(range(0xD0, 0xD9))          # RSTn + SOI


def parse_image_header(payload: bytes) -> tuple[str, int, int] | None:
    """(format, width, height) from the payload's own container structure,
    or None when it isn't a recognizable/intact image.

    - PNG: 8-byte signature, then the IHDR chunk's big-endian dims
    - GIF: GIF87a/GIF89a signature, little-endian logical screen dims
    - JPEG: marker scan to the first SOFn segment (big-endian dims)
    """
    n = len(payload)
    # PNG
    if n >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        if payload[12:16] != b"IHDR":
            return None
        w, h = struct.unpack(">II", payload[16:24])
        return ("png", w, h) if w and h else None
    # GIF
    if n >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return ("gif", w, h) if w and h else None
    # JPEG
    if n >= 4 and payload[:2] == b"\xff\xd8":
        pos = 2
        while pos + 4 <= n:
            if payload[pos] != 0xFF:
                return None
            marker = payload[pos + 1]
            if marker == 0xFF:                   # fill byte
                pos += 1
                continue
            if marker in _JPEG_STANDALONE:
                pos += 2
                continue
            if marker == 0xD9:                   # EOI before any SOF
                return None
            seg_len = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
            if seg_len < 2:
                return None
            if marker in _JPEG_SOF:
                if pos + 9 > n:
                    return None
                h, w = struct.unpack(">HH", payload[pos + 5:pos + 9])
                return ("jpeg", w, h) if w and h else None
            pos += 2 + seg_len
        return None
    return None


class ImageDecoder:
    """Actor: decode a binary payload into typed metadata by parsing the
    real container headers (see module docstring). Undecodable payloads
    quarantine (ok=False) with the sha/n_bytes still recorded."""

    def __init__(self, payload_col: str = "payload",
                 id_col: str = "url") -> None:
        self.payload_col, self.id_col = payload_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {"url": [], "format": [], "payload_sha256": [], "n_bytes": [],
                "width": [], "height": [], "ok": []}
        for uid, payload in zip(batch[self.id_col].to_pylist(),
                                batch[self.payload_col].to_pylist()):
            rows["url"].append(uid)
            if not payload:
                rows["format"].append(None)
                rows["payload_sha256"].append(None)
                rows["n_bytes"].append(0)
                rows["width"].append(0)
                rows["height"].append(0)
                rows["ok"].append(False)
                continue
            rows["payload_sha256"].append(hashlib.sha256(payload).hexdigest())
            rows["n_bytes"].append(len(payload))
            parsed = parse_image_header(payload)
            if parsed is None:                   # quarantine, not crash
                rows["format"].append(None)
                rows["width"].append(0)
                rows["height"].append(0)
                rows["ok"].append(False)
            else:
                fmt, w, h = parsed
                rows["format"].append(fmt)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["ok"].append(True)
        return pa.table(rows, schema=DECODED_SCHEMA)


class FeatureStub:
    """Actor: payload metadata -> unit-norm FEATURE_DIM embedding.
    STUB (declared): real feature extraction is model inference and no
    model runtime ships in this container; the sha-derived vector keeps
    the batched-inference plumbing (actor pool, batch sizing, fixed-size
    list schema) real and deterministic."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for sha, ok in zip(batch["payload_sha256"].to_pylist(),
                           batch["ok"].to_pylist()):
            if not ok or sha is None:
                feats.append([0.0] * FEATURE_DIM)
                continue
            raw = np.frombuffer(bytes.fromhex(sha)[:FEATURE_DIM * 4],
                                dtype=np.uint32).astype(np.float64)
            v = raw / np.linalg.norm(raw)
            feats.append([round(float(x), 6) for x in v])
        return batch.append_column(
            "feature", pa.array(feats, pa.list_(pa.float64(), FEATURE_DIM)))


def decode_payloads(ds: Dataset, payload_col: str = "payload",
                    id_col: str = "url", batch_size: int = 256,
                    concurrency=(1, 8)) -> Dataset:
    return ds.map_batches(ImageDecoder,
                          fn_constructor_args=(payload_col, id_col),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def extract_features(decoded: Dataset, batch_size: int = 1024,
                     concurrency=(1, 8)) -> Dataset:
    return decoded.map_batches(FeatureStub, batch_format="pyarrow",
                               batch_size=batch_size, concurrency=concurrency)
