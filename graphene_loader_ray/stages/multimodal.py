"""Multimodal column plumbing — opaque binary payloads through actor pools.

Per the instruction set: image/audio/video are opaque ``binary`` columns
with typed metadata; decode / feature-extract are actor-pool ``map_batches``
stages.

The DECODE stages are REAL: pure-python structural parsers read the
actual payload bytes and derive format + dimensions from the container
headers (PNG IHDR, JPEG SOFn marker scan, GIF logical screen descriptor;
RIFF/WAVE chunk walk for audio) — no codec library needed. Video framing
uses the repo's GLV1 fixture container (see FrameSampler) whose frames
are real PNGs. Payloads that don't parse land on the quarantine path
(ok=False), never crash (the reference's log-and-skip policy,
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


AUDIO_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("format", pa.string()),
    ("payload_sha256", pa.string()),
    ("n_bytes", pa.int64()),
    ("channels", pa.int32()), ("sample_rate", pa.int32()),
    ("bits_per_sample", pa.int32()), ("n_frames", pa.int64()),
    ("duration_ms", pa.int64()),
    ("ok", pa.bool_()),
])


def parse_wav_header(payload: bytes) -> tuple[int, int, int, int] | None:
    """(channels, sample_rate, bits_per_sample, n_frames) from a REAL
    RIFF/WAVE chunk walk (fmt then data; unknown chunks skipped by their
    declared size, word-aligned), or None when the container is broken.
    Only integer PCM (audio_format 1) is accepted — compressed codecs
    would need a decoder this container doesn't ship."""
    n = len(payload)
    if n < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, fmt, data_size = 12, None, None
    while pos + 8 <= n:
        tag = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if tag == b"fmt " and len(body) >= 16:
            audio_format, channels, rate, _br, block, bits = \
                struct.unpack("<HHIIHH", body[:16])
            if audio_format != 1 or not (channels and rate and block):
                return None
            fmt = (channels, rate, bits, block)
        elif tag == b"data":
            if len(body) < size:                  # truncated payload
                return None
            data_size = size
        pos += 8 + size + (size & 1)              # RIFF word alignment
    if fmt is None or data_size is None:
        return None
    channels, rate, bits, block = fmt
    return channels, rate, bits, data_size // block


class AudioDecoder:
    """Actor: binary audio payload -> typed metadata via the real WAV
    container parse; broken payloads quarantine (ok=False) like the image
    path."""

    def __init__(self, payload_col: str = "payload",
                 id_col: str = "url") -> None:
        self.payload_col, self.id_col = payload_col, id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: dict[str, list] = {f.name: [] for f in AUDIO_SCHEMA}
        for uid, payload in zip(batch[self.id_col].to_pylist(),
                                batch[self.payload_col].to_pylist()):
            rows["url"].append(uid)
            payload = payload or b""
            rows["payload_sha256"].append(
                hashlib.sha256(payload).hexdigest() if payload else None)
            rows["n_bytes"].append(len(payload))
            parsed = parse_wav_header(payload) if payload else None
            if parsed is None:
                rows["format"].append(None)
                rows["channels"].append(0)
                rows["sample_rate"].append(0)
                rows["bits_per_sample"].append(0)
                rows["n_frames"].append(0)
                rows["duration_ms"].append(0)
                rows["ok"].append(False)
            else:
                ch, rate, bits, frames = parsed
                rows["format"].append("wav")
                rows["channels"].append(ch)
                rows["sample_rate"].append(rate)
                rows["bits_per_sample"].append(bits)
                rows["n_frames"].append(frames)
                rows["duration_ms"].append(frames * 1000 // rate)
                rows["ok"].append(True)
        return pa.table(rows, schema=AUDIO_SCHEMA)


FRAME_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("frame_index", pa.int32()),
    ("fps", pa.int32()), ("n_frames", pa.int64()),
    ("frame_format", pa.string()),
    ("width", pa.int32()), ("height", pa.int32()),
    ("frame_sha256", pa.string()),
    ("ok", pa.bool_()),
])


class FrameSampler:
    """Actor: demux the GLV1 fixture container and emit every k-th frame's
    parsed header as a row (flat_map shape: one video -> many frames).

    The demux framing (magic, fps, count, length-prefixed frames) is the
    repo's own fixture format — a real deployment swaps THIS parse for a
    container demuxer (mp4/mkv), which no library in this sandbox
    provides; everything downstream of the framing is real: each sampled
    frame is an actual PNG parsed by parse_image_header, broken containers
    quarantine as a single ok=False row."""

    def __init__(self, every_k: int = 4, payload_col: str = "payload",
                 id_col: str = "url") -> None:
        self.every_k = max(1, every_k)
        self.payload_col, self.id_col = payload_col, id_col

    def _quarantine(self, rows: dict, uid: str) -> None:
        rows["url"].append(uid)
        rows["frame_index"].append(-1)
        rows["fps"].append(0)
        rows["n_frames"].append(0)
        rows["frame_format"].append(None)
        rows["width"].append(0)
        rows["height"].append(0)
        rows["frame_sha256"].append(None)
        rows["ok"].append(False)

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows: dict[str, list] = {f.name: [] for f in FRAME_SCHEMA}
        for uid, payload in zip(batch[self.id_col].to_pylist(),
                                batch[self.payload_col].to_pylist()):
            payload = payload or b""
            if len(payload) < 10 or payload[:4] != b"GLV1":
                self._quarantine(rows, uid)
                continue
            fps, n_frames = struct.unpack("<HI", payload[4:10])
            pos, bad = 10, False
            offsets: list[tuple[int, int]] = []
            for _ in range(n_frames):
                if pos + 4 > len(payload):
                    bad = True
                    break
                flen = struct.unpack("<I", payload[pos:pos + 4])[0]
                if pos + 4 + flen > len(payload):
                    bad = True
                    break
                offsets.append((pos + 4, flen))
                pos += 4 + flen
            if bad:
                self._quarantine(rows, uid)
                continue
            for idx in range(0, n_frames, self.every_k):
                start, flen = offsets[idx]
                frame = payload[start:start + flen]
                parsed = parse_image_header(frame)
                rows["url"].append(uid)
                rows["frame_index"].append(idx)
                rows["fps"].append(fps)
                rows["n_frames"].append(n_frames)
                rows["frame_sha256"].append(
                    hashlib.sha256(frame).hexdigest())
                if parsed is None:
                    rows["frame_format"].append(None)
                    rows["width"].append(0)
                    rows["height"].append(0)
                    rows["ok"].append(False)
                else:
                    fmt, w, h = parsed
                    rows["frame_format"].append(fmt)
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["ok"].append(True)
        return pa.table(rows, schema=FRAME_SCHEMA)


def decode_audio(ds: Dataset, payload_col: str = "payload",
                 id_col: str = "url", batch_size: int = 256,
                 concurrency=(1, 8)) -> Dataset:
    return ds.map_batches(AudioDecoder,
                          fn_constructor_args=(payload_col, id_col),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


def sample_frames(ds: Dataset, every_k: int = 4,
                  payload_col: str = "payload", id_col: str = "url",
                  batch_size: int = 64, concurrency=(1, 8)) -> Dataset:
    """Small batch_size: video payloads are the fattest rows in the repo
    (frames × png), and each input row fans out to many output rows."""
    return ds.map_batches(FrameSampler,
                          fn_constructor_args=(every_k, payload_col, id_col),
                          batch_format="pyarrow", batch_size=batch_size,
                          concurrency=concurrency)


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
