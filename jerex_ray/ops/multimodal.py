"""Multimodal column plumbing: opaque binary payloads with typed
metadata, processed by actor-pool stages.

The container ships no image/audio codecs, so the decode kernels are
STUBS (deterministic fakes clearly marked below) — but the Ray-side
plumbing is real and tested: schema (``payload: binary`` + metadata
columns), small batches for wide rows, actor-pool stage shape, and the
output layout a real decoder would produce. Swap ``_decode_image`` /
``_decode_audio`` for PIL/librosa kernels when the libs exist.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from jerex_ray.util import stable_hash32


def synth_media_table(n: int, *, kind: str = "image", seed: int = 21) -> pa.Table:
    """Deterministic synthetic media rows (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    payloads, widths, heights, durations = [], [], [], []
    for i in range(n):
        size = int(rng.integers(64, 2048))
        payloads.append(rng.integers(0, 256, size=size, dtype=np.uint8).tobytes())
        widths.append(int(rng.integers(16, 512)))
        heights.append(int(rng.integers(16, 512)))
        durations.append(float(rng.random() * 30))
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "kind": pa.array([kind] * n, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(widths, pa.int32()),
        "height": pa.array(heights, pa.int32()),
        "duration_s": pa.array(durations, pa.float32()),
    })


def _decode_image(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB decode — deterministic fake pixels derived from the payload
    hash. A real implementation raises on undecodable bytes; keep that
    contract by validating payload length."""
    if not payload:
        raise ValueError("empty image payload")
    rng = np.random.default_rng(stable_hash32(payload[:64]))
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


class ImageFeatures:
    """Actor stage: decode → resize → global feature vector.

    Real-world shape: model/codec loaded once in __init__, small
    batches (wide binary rows), numpy work per batch."""

    def __init__(self, *, target: int = 32):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, ok = [], []
        payloads = batch["payload"].to_pylist()
        widths = batch["width"].to_pylist()
        heights = batch["height"].to_pylist()
        for p, w, h in zip(payloads, widths, heights):
            try:
                img = _decode_image(p, w, h)
                t = self.target
                # nearest-neighbor resize (pure numpy)
                yi = (np.arange(t) * h // t)
                xi = (np.arange(t) * w // t)
                small = img[yi][:, xi]
                feat = small.mean(axis=(0, 1)).astype(np.float32)  # RGB means
                feats.append(feat.tolist())
                ok.append(True)
            except ValueError:
                feats.append([0.0, 0.0, 0.0])
                ok.append(False)
        return pa.table({
            "media_id": batch["media_id"],
            "feature": pa.array(feats, pa.list_(pa.float32())),
            "decode_ok": pa.array(ok, pa.bool_()),
        })


class AudioFrames:
    """Actor stage: frame-sample an audio payload (stubbed decode).

    Emits one row per sampled frame — a flat_map-shaped output built
    vectorized inside map_batches."""

    def __init__(self, *, fps: float = 1.0):
        self.fps = fps

    def __call__(self, batch: pa.Table) -> pa.Table:
        media_ids, frame_idxs, energies = [], [], []
        ids = batch["media_id"].to_pylist()
        durs = batch["duration_s"].to_pylist()
        payloads = batch["payload"].to_pylist()
        for mid, dur, p in zip(ids, durs, payloads):
            n_frames = max(1, int(dur * self.fps))
            rng = np.random.default_rng(stable_hash32(p[:64] if p else b"x"))
            vals = rng.random(n_frames)          # STUB frame energies
            for fi in range(n_frames):
                media_ids.append(mid)
                frame_idxs.append(fi)
                energies.append(float(vals[fi]))
        return pa.table({
            "media_id": pa.array(media_ids, pa.int64()),
            "frame_idx": pa.array(frame_idxs, pa.int32()),
            "energy": pa.array(energies, pa.float32()),
        })


def image_features(media_ds, *, concurrency=(1, 4), batch_size: int = 64):
    """Small batch size on purpose: binary rows are wide."""
    return media_ds.map_batches(ImageFeatures, batch_format="pyarrow",
                                batch_size=batch_size, concurrency=concurrency)


def audio_frames(media_ds, *, concurrency=(1, 4), batch_size: int = 64):
    return media_ds.map_batches(AudioFrames, batch_format="pyarrow",
                                batch_size=batch_size, concurrency=concurrency)
