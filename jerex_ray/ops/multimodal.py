"""Multimodal column plumbing: opaque binary payloads with typed
metadata, processed by actor-pool stages.

The decode kernels are REAL pure-python/numpy codecs for formats whose
specs are public and simple enough to implement without external libs
(this container ships no PIL/librosa):

* images — PPM (P6 binary, netpbm spec) and BMP (24-bit uncompressed
  Windows BITMAPINFOHEADER); dispatch on the magic bytes;
* audio — PCM16 WAV via the stdlib ``wave`` module.

Payloads in other formats (JPEG/PNG/MP3/…) raise ``ValueError`` from
the decoders, surfaced as ``decode_ok=False`` rows — the slot where a
PIL/ffmpeg kernel drops in unchanged. The Ray-side plumbing is the
production shape: ``payload: binary`` + metadata columns, small
batches for wide rows, actor-pool stages with per-actor setup.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np
import pyarrow as pa


# ---------- image codecs (pure python/numpy, public formats) ----------

def encode_ppm(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 → binary PPM (P6)."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("PPM P6 needs 3 channels")
    return b"P6\n%d %d\n255\n" % (w, h) + \
        np.ascontiguousarray(img, dtype=np.uint8).tobytes()


def decode_ppm(data: bytes) -> np.ndarray:
    """Binary PPM (P6) → (H, W, 3) uint8. Handles whitespace and
    ``#`` comments in the header per the netpbm spec."""
    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(data) and data[pos:pos + 1].isspace():
            pos += 1
        if data[pos:pos + 1] == b"#":
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos:pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("truncated PPM header")
        fields.append(int(data[start:pos]))
    pos += 1                                  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    need = w * h * 3
    raster = data[pos:pos + need]
    if len(raster) != need:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → 24-bit uncompressed BMP (bottom-up BGR
    rows padded to 4 bytes, BITMAPINFOHEADER)."""
    h, w, c = img.shape
    if c != 3:
        raise ValueError("BMP writer needs 3 channels")
    row_bytes = (w * 3 + 3) & ~3
    img_size = row_bytes * h
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + img_size, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size,
                       2835, 2835, 0, 0)
    bgr = np.ascontiguousarray(img[::-1, :, ::-1], dtype=np.uint8)
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, :w * 3] = bgr.reshape(h, w * 3)
    return header + info + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (H, W, 3) uint8 RGB."""
    if not data.startswith(b"BM") or len(data) < 54:
        raise ValueError("not a BMP")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError("only 24-bit uncompressed BMP supported")
    flipped = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    need = row_bytes * h
    raster = data[offset:offset + need]
    if len(raster) != need:
        raise ValueError("truncated BMP raster")
    rows = np.frombuffer(raster, dtype=np.uint8).reshape(h, row_bytes)
    bgr = rows[:, :w * 3].reshape(h, w, 3)
    img = bgr[:, :, ::-1]
    return img[::-1] if flipped else img


def _decode_image(payload: bytes) -> np.ndarray:
    """Dispatch on magic bytes; raises ValueError for anything that is
    not a supported format (the caller records decode_ok=False)."""
    if not payload:
        raise ValueError("empty image payload")
    if payload.startswith(b"P6"):
        return decode_ppm(payload)
    if payload.startswith(b"BM"):
        return decode_bmp(payload)
    raise ValueError("unsupported image format (PPM/BMP implemented; "
                     "JPEG/PNG need an external codec)")


def encode_ppm_stream(frames: list[np.ndarray]) -> bytes:
    """Video as a netpbm PPM STREAM: concatenated P6 images (the
    documented multi-image convention of the netpbm formats)."""
    return b"".join(encode_ppm(f) for f in frames)


def decode_ppm_stream(payload: bytes, *, max_frames: int | None = None):
    """PPM stream → list of (H, W, 3) uint8 frames. Frame boundaries
    come from each header's own dimensions; ``max_frames`` bounds the
    decode for sampling use."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a PPM stream")
    frames, pos = [], 0
    while pos < len(payload):
        if payload[pos:pos + 2] != b"P6":
            raise ValueError(f"garbage between frames at byte {pos}")
        frame = decode_ppm(payload[pos:])
        frames.append(frame)
        # advance past this frame: header length = everything before
        # the raster = total consumed − raster size, recomputed by
        # re-encoding the header deterministically is fragile; instead
        # scan: find the raster start (3 header fields + 1 whitespace)
        p, fields = pos + 2, 0
        while fields < 3:
            while payload[p:p + 1].isspace():
                p += 1
            if payload[p:p + 1] == b"#":
                while p < len(payload) and payload[p] != 0x0A:
                    p += 1
                continue
            while not payload[p:p + 1].isspace():
                p += 1
            fields += 1
        pos = p + 1 + frame.shape[0] * frame.shape[1] * 3
        if max_frames is not None and len(frames) >= max_frames:
            break
    return frames


class VideoFrameSample:
    """Actor stage: decode a PPM-stream video payload, keep every
    ``stride``-th frame, and emit one row per sampled frame with its
    per-channel means — the frame-sample operator of a multimodal
    training-data pipeline (flat_map shape)."""

    def __init__(self, *, stride: int = 2):
        self.stride = max(1, stride)

    def __call__(self, batch: pa.Table) -> pa.Table:
        media_ids, frame_idxs, feats, oks = [], [], [], []
        ids = batch["media_id"].to_pylist()
        for mid, p in zip(ids, batch["payload"].to_pylist()):
            try:
                frames = decode_ppm_stream(p)
            except ValueError:
                media_ids.append(mid)
                frame_idxs.append(0)
                feats.append([0.0, 0.0, 0.0])
                oks.append(False)
                continue
            for fi in range(0, len(frames), self.stride):
                media_ids.append(mid)
                frame_idxs.append(fi)
                feats.append(frames[fi].mean(axis=(0, 1))
                             .astype(np.float32).tolist())
                oks.append(True)
        return pa.table({
            "media_id": pa.array(media_ids, pa.int64()),
            "frame_idx": pa.array(frame_idxs, pa.int32()),
            "feature": pa.array(feats, pa.list_(pa.float32())),
            "decode_ok": pa.array(oks, pa.bool_()),
        })


def video_frame_sample(media_ds, *, stride: int = 2,
                       concurrency=(1, 4), batch_size: int = 16):
    """Tiny batches: video payloads are the widest rows."""
    return media_ds.map_batches(VideoFrameSample, batch_format="pyarrow",
                                batch_size=batch_size,
                                concurrency=concurrency,
                                fn_kwargs=None,
                                fn_constructor_kwargs={"stride": stride})


# ---------- audio codec (stdlib wave, PCM16) ----------

def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono samples → WAV bytes."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 mono samples, sample rate). Multi-channel
    input is averaged to mono."""
    if not payload:
        raise ValueError("empty audio payload")
    try:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            nch, width, rate = (wf.getnchannels(), wf.getsampwidth(),
                                wf.getframerate())
            if width != 2:
                raise ValueError("only PCM16 WAV supported")
            raw = wf.readframes(wf.getnframes())
    except (wave.Error, EOFError, struct.error) as e:
        raise ValueError(f"not a WAV payload: {e}") from e
    samples = np.frombuffer(raw, dtype="<i2")
    if nch > 1:
        samples = samples.reshape(-1, nch).mean(axis=1).astype(np.int16)
    return samples, rate


# ---------- synthetic media (REAL encoded payloads) ----------

def synth_media_table(n: int, *, kind: str = "image", seed: int = 21) -> pa.Table:
    """Deterministic synthetic media rows with REAL payloads: images
    alternate PPM/BMP encodings of seeded pixels; audio rows are PCM16
    WAV of a seeded sine + noise at 8 kHz."""
    rng = np.random.default_rng(seed)
    payloads, widths, heights, durations = [], [], [], []
    for i in range(n):
        if kind == "video":
            w = int(rng.integers(16, 48))
            h = int(rng.integers(16, 48))
            n_frames = int(rng.integers(4, 16))
            frames = [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
                      for _ in range(n_frames)]
            payloads.append(encode_ppm_stream(frames))
            widths.append(w)
            heights.append(h)
            durations.append(float(n_frames))     # 1 fps nominal
        elif kind == "audio":
            dur = float(rng.random() * 8 + 0.5)
            rate = 8000
            t = np.arange(int(dur * rate)) / rate
            freq = float(rng.integers(100, 1000))
            wave_f = (np.sin(2 * np.pi * freq * t) * 8000
                      + rng.normal(0, 500, t.size))
            payloads.append(encode_wav(wave_f.astype(np.int16), rate))
            widths.append(0)
            heights.append(0)
            durations.append(dur)
        else:
            w = int(rng.integers(16, 96))
            h = int(rng.integers(16, 96))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            payloads.append(encode_ppm(img) if i % 2 == 0
                            else encode_bmp(img))
            widths.append(w)
            heights.append(h)
            durations.append(0.0)
    return pa.table({
        "media_id": pa.array(range(n), pa.int64()),
        "kind": pa.array([kind] * n, pa.string()),
        "payload": pa.array(payloads, pa.binary()),
        "width": pa.array(widths, pa.int32()),
        "height": pa.array(heights, pa.int32()),
        "duration_s": pa.array(durations, pa.float32()),
    })


# ---------- actor-pool stages ----------

class ImageFeatures:
    """Actor stage: decode → nearest-neighbor resize → global feature
    vector (per-channel means of the resized image).

    Real-world shape: codec/model state built once in __init__, small
    batches (wide binary rows), numpy work per batch."""

    def __init__(self, *, target: int = 32):
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, ok = [], []
        for p in batch["payload"].to_pylist():
            try:
                img = _decode_image(p)
                h, w = img.shape[:2]
                t = self.target
                yi = (np.arange(t) * h // t)
                xi = (np.arange(t) * w // t)
                small = img[yi][:, xi]
                feat = small.mean(axis=(0, 1)).astype(np.float32)
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
    """Actor stage: decode WAV → one row per sampled frame with its
    RMS energy (frame length = 1/fps seconds) — a flat_map-shaped
    output built vectorized inside map_batches."""

    def __init__(self, *, fps: float = 1.0):
        self.fps = fps

    def __call__(self, batch: pa.Table) -> pa.Table:
        media_ids, frame_idxs, energies, oks = [], [], [], []
        ids = batch["media_id"].to_pylist()
        for mid, p in zip(ids, batch["payload"].to_pylist()):
            try:
                samples, rate = decode_wav(p)
            except ValueError:
                media_ids.append(mid)
                frame_idxs.append(0)
                energies.append(0.0)
                oks.append(False)
                continue
            frame_len = max(1, int(rate / self.fps))
            n_frames = max(1, int(np.ceil(samples.size / frame_len)))
            x = samples.astype(np.float64)
            pad = n_frames * frame_len - x.size
            if pad:
                x = np.concatenate([x, np.zeros(pad)])
            rms = np.sqrt((x.reshape(n_frames, frame_len) ** 2)
                          .mean(axis=1))
            media_ids.extend([mid] * n_frames)
            frame_idxs.extend(range(n_frames))
            energies.extend(rms.astype(np.float32).tolist())
            oks.extend([True] * n_frames)
        return pa.table({
            "media_id": pa.array(media_ids, pa.int64()),
            "frame_idx": pa.array(frame_idxs, pa.int32()),
            "energy": pa.array(energies, pa.float32()),
            "decode_ok": pa.array(oks, pa.bool_()),
        })


def image_features(media_ds, *, concurrency=(1, 4), batch_size: int = 64):
    """Small batch size on purpose: binary rows are wide."""
    return media_ds.map_batches(ImageFeatures, batch_format="pyarrow",
                                batch_size=batch_size, concurrency=concurrency)


def audio_frames(media_ds, *, concurrency=(1, 4), batch_size: int = 64):
    return media_ds.map_batches(AudioFrames, batch_format="pyarrow",
                                batch_size=batch_size, concurrency=concurrency)


# ---------- image resize (pure numpy nearest-neighbor) ----------

def resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resample to (out_h, out_w): pure index
    arithmetic (the standard pixel-center mapping
    src = floor((dst + 0.5) * in/out)), no codec libs."""
    h, w = img.shape[:2]
    ri = np.minimum(((np.arange(out_h) + 0.5) * h / out_h)
                    .astype(np.int64), h - 1)
    ci = np.minimum(((np.arange(out_w) + 0.5) * w / out_w)
                    .astype(np.int64), w - 1)
    return img[ri[:, None], ci[None, :]]


class ImageResize:
    """Actor stage: decode → nearest-neighbor resize to a fixed
    (target_h, target_w) → re-encode PPM. The resize-to-fixed-shape
    stage every multimodal training pipeline needs before batching
    tensors; bad payloads flow to the side channel as
    decode_ok=False rows, never exceptions."""

    def __init__(self, *, target_h: int = 32, target_w: int = 32):
        self.th, self.tw = target_h, target_w

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_ids, payloads, hs, ws, oks = [], [], [], [], []
        for mid, p in zip(batch["media_id"].to_pylist(),
                          batch["payload"].to_pylist()):
            out_ids.append(mid)
            try:
                img = _decode_image(p)
                resized = resize_nearest(img, self.th, self.tw)
                payloads.append(encode_ppm(resized))
                hs.append(self.th)
                ws.append(self.tw)
                oks.append(True)
            except ValueError:
                payloads.append(b"")
                hs.append(0)
                ws.append(0)
                oks.append(False)
        return pa.table({
            "media_id": pa.array(out_ids, pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
            "height": pa.array(hs, pa.int32()),
            "width": pa.array(ws, pa.int32()),
            "decode_ok": pa.array(oks, pa.bool_()),
        })


def image_resize(media_ds, *, target_h: int = 32, target_w: int = 32,
                 concurrency=(1, 4), batch_size: int = 64):
    """Small batches: binary payloads are wide rows; a batch ×
    concurrency must fit a worker heap (brief's memory-aware rule)."""
    return media_ds.map_batches(
        ImageResize, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
        fn_constructor_kwargs={"target_h": target_h,
                               "target_w": target_w})
