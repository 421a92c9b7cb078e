"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Real image/audio codecs are not available in this container, so the decode
kernels are STUBS behind ``DecodeBackend``: the default ``"fake"`` backend is a
deterministic pure-numpy pseudo-decoder (so the Ray-side plumbing — schemas,
actor-pool stages, batch sizing, output layout — is real and testable) and the
``"pil"``/``"ffmpeg"`` backends raise ``NotImplementedError`` until the libs
exist. Stages follow the actor-pool pattern: decoder state in ``__init__``,
small batches because rows are wide binary payloads.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

# canonical multimodal record schema: payload + typed metadata
MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),  # "image" | "audio" | "video"
        ("payload", pa.large_binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),  # image/video
        ("height", pa.int32()),
        ("sample_rate", pa.int32()),  # audio
        ("duration_ms", pa.int32()),  # audio/video
    ]
)


def synthesize_media(n: int, seed: int = 42, kind: str = "image",
                     payload_bytes: int = 4096) -> pa.Table:
    """Deterministic fake media table (for tests and bench plumbing).

    Payload bytes are an md5 chain — ``concat_j md5("media:{seed}:{i}:{j}")``
    — rather than an RNG stream, so a SQL oracle can rebuild the exact bytes
    (DuckDB ``md5(...)`` per 16-byte chunk) and attest the decode pipeline's
    output end-to-end. Statistically the bytes are still uniform noise."""
    rng = np.random.default_rng(seed)
    payloads = [
        b"".join(
            hashlib.md5(f"media:{seed}:{i}:{j}".encode()).digest()
            for j in range((payload_bytes + 15) // 16)
        )[:payload_bytes]
        for i in range(n)
    ]
    return pa.table(
        {
            "media_id": pa.array(np.arange(n, dtype=np.int64)),
            "kind": pa.array([kind] * n),
            "payload": pa.array(payloads, pa.large_binary()),
            "mime": pa.array(["application/x-fake"] * n),
            "width": pa.array(rng.integers(32, 512, n).astype(np.int32)),
            "height": pa.array(rng.integers(32, 512, n).astype(np.int32)),
            "sample_rate": pa.array(np.zeros(n, dtype=np.int32)),
            "duration_ms": pa.array(np.zeros(n, dtype=np.int32)),
        },
        schema=MEDIA_SCHEMA,
    )


class DecodeBackend:
    FAKE = "fake"
    PIL = "pil"
    FFMPEG = "ffmpeg"


class ImageDecoder:
    """Actor-pool stage: payload → fixed-size feature vector.

    ``backend="fake"``: deterministic pseudo-decode — byte histogram (256 bins,
    L1-normalized) as the "feature", so outputs are reproducible and the full
    Ray plumbing (schema in/out, batch size, actor init) is exercised.
    ``backend="pil"`` would decode + resize via Pillow: STUBBED —
    ``NotImplementedError`` (library not present in this environment).
    """

    def __init__(self, backend: str = DecodeBackend.FAKE, feature_dim: int = 256):
        if backend != DecodeBackend.FAKE:
            raise NotImplementedError(
                f"decode backend {backend!r} requires image/audio libraries that "
                "are not available in this container; use backend='fake'"
            )
        self.backend = backend
        self.feature_dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, shas = [], []
        for buf in batch.column("payload"):
            b = np.frombuffer(buf.as_py(), dtype=np.uint8)
            hist = np.bincount(b, minlength=256).astype(np.float64)
            s = hist.sum()
            feats.append((hist / s if s else hist)[: self.feature_dim])
            shas.append(hashlib.sha256(b.tobytes()).hexdigest())
        return pa.table(
            {
                "media_id": batch.column("media_id"),
                "payload_sha256": pa.array(shas, pa.string()),
                "feature": pa.array([f.tolist() for f in feats], pa.list_(pa.float64())),
                "payload_bytes": pa.compute.binary_length(batch.column("payload")).cast(pa.int64()),
            }
        )


def decode_features(ds, backend: str = DecodeBackend.FAKE, concurrency=(1, 4),
                    batch_size: int = 64):
    """media table → feature table. Small ``batch_size`` on purpose: rows are
    wide binary payloads; batch x concurrency must fit the worker heap."""
    return ds.map_batches(
        ImageDecoder, fn_constructor_kwargs={"backend": backend},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )


class AverageHasher:
    """Actor-pool perceptual-hash stage (aHash family): bit ``v`` of the
    60-bit hash is set iff the payload's byte-value-``v`` count exceeds the
    mean over values 0..59 (integer form ``60·hist[v] > Σ hist[0:60]`` — no
    float boundary, SQL-replayable). With ``backend="fake"`` the "image" is
    the byte stream itself, mirroring :class:`ImageDecoder`'s histogram
    feature; a real backend would average 8×8 grayscale pixels instead
    (classic aHash) — same plumbing, stubbed like the other codecs. Media
    rows sharing a hash are near-dup candidates (the image analogue of the
    text MinHash bucket stage)."""

    def __init__(self, backend: str = DecodeBackend.FAKE, n_bits: int = 60):
        if backend != DecodeBackend.FAKE:
            raise NotImplementedError(
                "perceptual hashing over real pixels requires an image "
                "decoder that is not available in this container")
        if not 1 <= n_bits <= 62:  # BIGINT-safe; a bare assert would strip
            raise ValueError(f"n_bits must be in [1, 62], got {n_bits}")
        self.n_bits = n_bits

    def __call__(self, batch: pa.Table) -> pa.Table:
        k = self.n_bits
        weights = (np.uint64(1) << np.arange(k, dtype=np.uint64))
        hs = []
        for buf in batch.column("payload"):
            b = np.frombuffer(buf.as_py(), dtype=np.uint8)
            hist = np.bincount(b, minlength=256)[:k].astype(np.int64)
            bits = k * hist > hist.sum()
            hs.append(int(weights[bits].sum()))
        return pa.table({"media_id": batch.column("media_id"),
                         "ahash": pa.array(hs, pa.int64())})


class FrameSampler:
    """Video frame-sampling stage (STUB): emits every k-th synthetic "frame"
    reference per video row — the flat_map-shaped plumbing for video pipelines.
    Real decoding would use ffmpeg (NotImplementedError outside fake mode)."""

    def __init__(self, every_ms: int = 1000, backend: str = DecodeBackend.FAKE):
        if backend != DecodeBackend.FAKE:
            raise NotImplementedError("ffmpeg backend not available in this container")
        self.every_ms = every_ms

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ts = [], []
        for mid, dur in zip(batch.column("media_id").to_pylist(),
                            batch.column("duration_ms").to_pylist()):
            n = max(1, int(dur or 0) // self.every_ms)
            ids.extend([mid] * n)
            ts.extend(range(0, n * self.every_ms, self.every_ms))
        return pa.table({"media_id": pa.array(ids, pa.int64()),
                         "frame_ts_ms": pa.array(ts, pa.int64())})


class ImageResizer:
    """Actor-pool resize stage (STUB backend, real plumbing): payload →
    resized payload + updated (width, height) metadata, the in-pipeline
    transform between decode and feature extraction.

    ``backend="fake"``: the payload is treated as a row-major ``height x
    (len/height)`` byte grid and resized by deterministic nearest-neighbor
    index sampling — pure numpy, reproducible, exercising the real concerns
    (payload rewrite, metadata update, small batches for wide binary rows).
    ``backend="pil"`` (Pillow ``Image.resize``) is STUBBED:
    ``NotImplementedError`` until the library exists in the container."""

    def __init__(self, target_w: int = 64, target_h: int = 64,
                 backend: str = DecodeBackend.FAKE):
        if backend != DecodeBackend.FAKE:
            raise NotImplementedError(
                f"resize backend {backend!r} requires Pillow, which is not "
                "available in this container; use backend='fake'")
        self.tw, self.th = int(target_w), int(target_h)

    def __call__(self, batch: pa.Table) -> pa.Table:
        outs = []
        for buf, h in zip(batch.column("payload"),
                          batch.column("height").to_pylist()):
            raw = buf.as_py()
            b = np.frombuffer(raw, dtype=np.uint8) if raw else np.empty(0, np.uint8)
            if len(b) == 0:  # null/empty payload → all-zero target grid
                outs.append(np.zeros(self.th * self.tw, dtype=np.uint8).tobytes())
                continue
            rows = max(1, min(int(h or 1), len(b)))
            cols = max(1, len(b) // rows)
            grid = b[: rows * cols].reshape(rows, cols)
            ri = (np.arange(self.th) * rows) // self.th
            ci = (np.arange(self.tw) * cols) // self.tw
            outs.append(grid[np.ix_(ri, ci)].tobytes())
        t = batch.set_column(batch.column_names.index("payload"), "payload",
                             pa.array(outs, pa.large_binary()))
        t = t.set_column(t.column_names.index("width"), "width",
                         pa.array(np.full(t.num_rows, self.tw, dtype=np.int32)))
        return t.set_column(t.column_names.index("height"), "height",
                            pa.array(np.full(t.num_rows, self.th, dtype=np.int32)))


def resize_images(ds, target_w: int = 64, target_h: int = 64,
                  backend: str = DecodeBackend.FAKE, concurrency=(1, 4),
                  batch_size: int = 64):
    """media table → media table with resized payloads (same schema), ready
    to feed ``decode_features``. Small batches: wide binary rows."""
    return ds.map_batches(
        ImageResizer,
        fn_constructor_kwargs={"target_w": target_w, "target_h": target_h,
                               "backend": backend},
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )
