"""Multimodal column plumbing — opaque binary payloads through actor pools.

Per the instruction set: image/audio/video are opaque ``binary`` columns
with typed metadata; decode / feature-extract are actor-pool ``map_batches``
stages. The actual codec libraries (PIL, ffmpeg, torchaudio …) are NOT in
this container, so the decode kernel is STUBBED deterministically (clearly
marked below) while the Ray-side plumbing — schema, batch sizing, actor
signature, output layout — is real and tested.

Batch size stays small (256) because the payload column dominates block
memory (SURVEY.md §4 memory row: batch × concurrency must fit the worker
heap; large binary rows need small batches).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ray.data import Dataset

try:  # pragma: no cover - the container has no PIL; import-gated by design
    import PIL.Image  # type: ignore  # noqa: F401
    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

FEATURE_DIM = 8

DECODED_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("payload_sha256", pa.string()),
    ("n_bytes", pa.int64()),
    ("width", pa.int32()), ("height", pa.int32()),
    ("ok", pa.bool_()),
])


class DecodeStub:
    """Actor: 'decode' a binary payload into typed metadata.

    STUB: real decoding would open the payload with the codec library in
    ``__init__``-loaded state; here the metadata is a deterministic
    function of the payload bytes (sha256-derived fake dimensions) so the
    pipeline shape, error path, and schema are exercised end-to-end.
    A real deployment replaces ``_decode`` only.
    """

    def __init__(self, payload_col: str = "html", id_col: str = "url") -> None:
        self.payload_col, self.id_col = payload_col, id_col
        if _HAVE_PIL:  # pragma: no cover
            raise NotImplementedError(
                "real image decode not wired; replace DecodeStub._decode")

    @staticmethod
    def _decode(payload: bytes | None):
        if payload is None or len(payload) == 0:
            return None                      # quarantine, not crash
        digest = hashlib.sha256(payload).digest()
        width = 64 + digest[0] % 192         # fake dims, deterministic
        height = 64 + digest[1] % 192
        return digest.hex(), len(payload), width, height

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = {"url": [], "payload_sha256": [], "n_bytes": [],
                "width": [], "height": [], "ok": []}
        for uid, payload in zip(batch[self.id_col].to_pylist(),
                                batch[self.payload_col].to_pylist()):
            rows["url"].append(uid)
            dec = self._decode(payload)
            if dec is None:
                rows["payload_sha256"].append(None)
                rows["n_bytes"].append(0)
                rows["width"].append(0)
                rows["height"].append(0)
                rows["ok"].append(False)
            else:
                sha, n, w, h = dec
                rows["payload_sha256"].append(sha)
                rows["n_bytes"].append(n)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["ok"].append(True)
        return pa.table(rows, schema=DECODED_SCHEMA)


class FeatureStub:
    """Actor: payload metadata -> unit-norm FEATURE_DIM embedding (STUB:
    sha-derived; a real model would batch-infer here)."""

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


def decode_payloads(ds: Dataset, payload_col: str = "html",
                    id_col: str = "url", batch_size: int = 256,
                    concurrency=(1, 8)) -> Dataset:
    return ds.map_batches(DecodeStub,
                          fn_constructor_args=(payload_col, id_col),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def extract_features(decoded: Dataset, batch_size: int = 1024,
                     concurrency=(1, 8)) -> Dataset:
    return decoded.map_batches(FeatureStub, batch_format="pyarrow",
                               batch_size=batch_size, concurrency=concurrency)
