"""Multimodal columns: image/audio/video as opaque ``binary`` columns with typed
metadata, processed by actor-pool ``map_batches`` stages.

The decode kernels themselves are STUBBED (the container ships no image/audio
libraries): each stage raises ``NotImplementedError`` unless constructed with
``fake=True``, in which case a deterministic fake decode (content-hash-seeded) stands
in so the Ray-side plumbing — schema, batch sizing, actor signature, output layout —
is real and tested. Swapping in Pillow/torchaudio is a one-method change per stage.

Scale notes: binary payloads make blocks wide — run these stages with a small
``batch_size`` (64–256) and let `DataContext.target_max_block_size` stay default so
the object store never holds more than concurrency × batch_size payloads.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from byzer_retrieval_ray.functions.murmur3 import murmur3_x86_32

MEDIA_SCHEMA = pa.schema([
    ("media_id", pa.int64()),
    ("kind", pa.string()),            # image | audio | video
    ("payload", pa.binary()),         # opaque encoded bytes
    ("mime", pa.string()),
    ("width", pa.int32()),            # typed metadata (0 when unknown)
    ("height", pa.int32()),
    ("duration_ms", pa.int32()),
])


def _fake_rng(payload: bytes) -> np.random.Generator:
    return np.random.default_rng(murmur3_x86_32(payload) & 0x7FFFFFFF)


class ImageDecode:
    """binary → (height, width, 3) uint8 pixels (summarized as per-channel stats).

    Actor-pool stage: ``ds.map_batches(ImageDecode(fake=True), batch_size=128,
    concurrency=N)``. The real implementation would decode with Pillow in __call__
    and load nothing per batch (no per-batch setup)."""

    def __init__(self, fake: bool = False, payload_col: str = "payload"):
        self.fake = fake
        self.payload_col = payload_col

    def _decode(self, payload: bytes, width: int, height: int) -> np.ndarray:
        if not self.fake:
            raise NotImplementedError(
                "image decoding requires an image library not present in this "
                "container; construct ImageDecode(fake=True) for the deterministic stub")
        rng = _fake_rng(payload)
        h = max(int(height), 4)
        w = max(int(width), 4)
        return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)

    def __call__(self, batch: pa.Table) -> pa.Table:
        means, stds = [], []
        for payload, w, h in zip(batch[self.payload_col].to_pylist(),
                                 batch["width"].to_pylist(),
                                 batch["height"].to_pylist()):
            px = self._decode(payload, w, h)
            means.append([float(px[:, :, c].mean()) for c in range(3)])
            stds.append([float(px[:, :, c].std()) for c in range(3)])
        batch = batch.append_column("channel_mean", pa.array(means, pa.list_(pa.float64(), 3)))
        return batch.append_column("channel_std", pa.array(stds, pa.list_(pa.float64(), 3)))


class ImageResize:
    """Deterministic nearest-neighbor resize of decoded fake pixels → feature vector."""

    def __init__(self, out: tuple[int, int] = (8, 8), fake: bool = False,
                 payload_col: str = "payload"):
        self.out = out
        self.decode = ImageDecode(fake=fake, payload_col=payload_col)

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        oh, ow = self.out
        for payload, w, h in zip(batch[self.decode.payload_col].to_pylist(),
                                 batch["width"].to_pylist(),
                                 batch["height"].to_pylist()):
            px = self.decode._decode(payload, w, h)
            ys = (np.arange(oh) * px.shape[0] // oh)
            xs = (np.arange(ow) * px.shape[1] // ow)
            small = px[np.ix_(ys, xs)].astype(np.float32) / 255.0
            feats.append(small.mean(axis=2).reshape(-1).tolist())
        return batch.append_column(
            "image_embedding", pa.array(feats, pa.list_(pa.float32(), oh * ow)))


class AudioFrameSample:
    """binary audio → every-nth-frame energy summary (stubbed decode)."""

    def __init__(self, frame_ms: int = 20, stride: int = 4, fake: bool = False,
                 payload_col: str = "payload"):
        self.frame_ms = frame_ms
        self.stride = stride
        self.fake = fake
        self.payload_col = payload_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for payload, dur in zip(batch[self.payload_col].to_pylist(),
                                batch["duration_ms"].to_pylist()):
            if not self.fake:
                raise NotImplementedError(
                    "audio decoding requires an audio library not present; "
                    "construct AudioFrameSample(fake=True) for the stub")
            rng = _fake_rng(payload)
            n_frames = max(int(dur) // self.frame_ms, 1)
            energies = rng.random(n_frames)[::self.stride]
            out.append([float(e) for e in energies[:64]])
        return batch.append_column("frame_energy", pa.array(out, pa.list_(pa.float64())))


def synth_media_table(n: int, kind: str = "image", seed: int = 42) -> pa.Table:
    """Deterministic synthetic media rows for plumbing tests."""
    rng = np.random.default_rng(seed)
    payloads = [rng.integers(0, 256, size=int(rng.integers(64, 256)),
                             dtype=np.uint8).tobytes() for _ in range(n)]
    return pa.table({
        "media_id": pa.array(np.arange(n, dtype=np.int64)),
        "kind": pa.array([kind] * n),
        "payload": pa.array(payloads, pa.binary()),
        "mime": pa.array(["image/fake" if kind == "image" else "audio/fake"] * n),
        "width": pa.array(rng.integers(4, 64, n).astype(np.int32)),
        "height": pa.array(rng.integers(4, 64, n).astype(np.int32)),
        "duration_ms": pa.array(rng.integers(100, 4000, n).astype(np.int32)),
    })
