"""Multimodal column stages: image/audio/video as opaque binary + metadata.

Schema convention (the engine-level contract):

    media(asset_id: string, kind: string,          # "image"|"audio"|"video"
          payload: binary,                          # encoded bytes, opaque
          meta: struct<format: string, width: int32, height: int32,
                       sample_rate: int32, n_frames: int32>)

Every stage is an actor-pool ``map_batches`` class (codec/model state loads
once per actor in ``__init__``) with SMALL batch sizes — a batch of decoded
frames is orders of magnitude bigger than its encoded payload, so
``batch_size`` bounds worker heap, and the decoded representation never
outlives the fused stage (decode -> feature -> drop pixels in one __call__).

The container has no image/audio codec libraries, so the codec boundary is a
``Codec`` protocol: ``RealCodec`` raises NotImplementedError (STUB — swap in
PIL/ffmpeg in production), and ``FakeCodec`` provides a deterministic
seeded decode so the Ray-side plumbing (schema, actor signature, batch
sizing, output layout) is real and tested end-to-end.
"""

from __future__ import annotations

import hashlib
from typing import Any, Dict, List, Optional

import numpy as np
import pyarrow as pa

MEDIA_META = pa.struct([
    ("format", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("sample_rate", pa.int32()),
    ("n_frames", pa.int32()),
])
MEDIA_SCHEMA = pa.schema([
    ("asset_id", pa.string()),
    ("kind", pa.string()),
    ("payload", pa.large_binary()),
    ("meta", MEDIA_META),
])


class Codec:
    """Decode boundary. Implementations must be deterministic per payload."""

    def decode_image(self, payload: bytes, meta: Dict[str, Any]) -> np.ndarray:
        raise NotImplementedError

    def decode_audio(self, payload: bytes, meta: Dict[str, Any]) -> np.ndarray:
        raise NotImplementedError

    def decode_video_frames(self, payload: bytes, meta: Dict[str, Any],
                            stride: int) -> List[np.ndarray]:
        raise NotImplementedError


class RealCodec(Codec):
    """STUB: production codec (PIL / soundfile / pyav). The libraries are not
    available in this environment; wire them here and nothing else changes."""

    def decode_image(self, payload, meta):
        raise NotImplementedError("image codec not available in this build")

    def decode_audio(self, payload, meta):
        raise NotImplementedError("audio codec not available in this build")

    def decode_video_frames(self, payload, meta, stride):
        raise NotImplementedError("video codec not available in this build")


class FakeCodec(Codec):
    """Deterministic stand-in: expands payload bytes into typed arrays via a
    seeded PRNG keyed on the payload hash — stable across processes/runs."""

    def _rng(self, payload: bytes):
        seed = int.from_bytes(hashlib.blake2b(payload, digest_size=8).digest(), "little")
        return np.random.default_rng(seed)

    def decode_image(self, payload, meta):
        h, w = int(meta["height"]), int(meta["width"])
        return self._rng(payload).integers(0, 256, size=(h, w, 3), dtype=np.uint8)

    def decode_audio(self, payload, meta):
        n = int(meta["sample_rate"])  # 1 second of samples
        return (self._rng(payload).standard_normal(n) * 0.1).astype(np.float32)

    def decode_video_frames(self, payload, meta, stride):
        h, w = int(meta["height"]), int(meta["width"])
        total = int(meta["n_frames"])
        rng = self._rng(payload)
        frames = []
        for i in range(0, total, stride):
            frames.append(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))
        return frames


def _resize_nn(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize (pure numpy index math)."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[ys][:, xs]


class ImageFeatureStage:
    """Decode -> resize -> feature-extract for image rows; actor pool.

    Output: (asset_id, width, height, mean_luma_milli, feat: list<float>)
    where feat is a 64-bin luma histogram (the deterministic stand-in for an
    embedding model — swap the histogram for a model forward pass; the actor
    shape is identical). Decoded pixels never leave __call__.
    """

    def __init__(self, codec: Optional[Codec] = None, resize_to: int = 64):
        self.codec = codec or FakeCodec()
        self.resize_to = resize_to

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ws, hs, lumas, feats, errors = [], [], [], [], [], []
        metas = batch["meta"].to_pylist()
        payloads = batch["payload"].to_pylist()
        for i in range(batch.num_rows):
            ids.append(batch["asset_id"][i].as_py())
            try:
                img = self.codec.decode_image(payloads[i], metas[i])
                h, w = img.shape[:2]
                small = _resize_nn(img, self.resize_to, self.resize_to)
                luma = (small.astype(np.uint32).sum(axis=2) // 3).astype(np.uint8)
                hist = np.bincount((luma // 4).ravel(), minlength=64).astype(np.float64)
                hist /= hist.sum()
                ws.append(w); hs.append(h)
                lumas.append(int(round(float(luma.mean()) * 1000)))
                feats.append([float(x) for x in hist])
                errors.append(None)
            except Exception as e:  # in-band error channel (M31)
                ws.append(0); hs.append(0); lumas.append(0); feats.append([])
                errors.append(str(e))
        return pa.table({
            "asset_id": pa.array(ids, pa.string()),
            "width": pa.array(ws, pa.int32()),
            "height": pa.array(hs, pa.int32()),
            "mean_luma_milli": pa.array(lumas, pa.int64()),
            "feat": pa.array(feats, pa.list_(pa.float64())),
            "error": pa.array(errors, pa.string()),
        })


class AudioFeatureStage:
    """Decode -> frame -> energy features for audio rows; actor pool.
    Output: (asset_id, n_samples, rms_milli, n_frames_out)."""

    def __init__(self, codec: Optional[Codec] = None, frame: int = 1024):
        self.codec = codec or FakeCodec()
        self.frame = frame

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, ns, rms, nf, errors = [], [], [], [], []
        metas = batch["meta"].to_pylist()
        payloads = batch["payload"].to_pylist()
        for i in range(batch.num_rows):
            ids.append(batch["asset_id"][i].as_py())
            try:
                wav = self.codec.decode_audio(payloads[i], metas[i])
                n = len(wav)
                frames = n // self.frame
                r = float(np.sqrt(np.mean(wav[: frames * self.frame] ** 2))) if frames else 0.0
                ns.append(n); rms.append(int(round(r * 1000))); nf.append(frames)
                errors.append(None)
            except Exception as e:  # in-band error channel (M31)
                ns.append(0); rms.append(0); nf.append(0)
                errors.append(str(e))
        return pa.table({
            "asset_id": pa.array(ids, pa.string()),
            "n_samples": pa.array(ns, pa.int64()),
            "rms_milli": pa.array(rms, pa.int64()),
            "n_frames_out": pa.array(nf, pa.int64()),
            "error": pa.array(errors, pa.string()),
        })


class VideoFrameSampleStage:
    """Decode every ``stride``-th frame -> per-frame luma; actor pool.
    Output one row PER SAMPLED FRAME (flat_map shape):
    (asset_id, frame_idx, mean_luma_milli)."""

    def __init__(self, codec: Optional[Codec] = None, stride: int = 10):
        self.codec = codec or FakeCodec()
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, idxs, lumas = [], [], []
        metas = batch["meta"].to_pylist()
        payloads = batch["payload"].to_pylist()
        for i in range(batch.num_rows):
            aid = batch["asset_id"][i].as_py()
            try:
                frames = self.codec.decode_video_frames(payloads[i], metas[i], self.stride)
            except Exception:  # in-band: a bad asset contributes no frames
                continue
            for k, f in enumerate(frames):
                ids.append(aid)
                idxs.append(k * self.stride)
                luma = f.astype(np.uint32).sum(axis=2) // 3
                lumas.append(int(round(float(luma.mean()) * 1000)))
        return pa.table({
            "asset_id": pa.array(ids, pa.string()),
            "frame_idx": pa.array(idxs, pa.int64()),
            "mean_luma_milli": pa.array(lumas, pa.int64()),
        })


def synth_media_table(n_assets: int = 30, seed: int = 5) -> pa.Table:
    """Deterministic media table for tests/benchmarks (payload = seeded
    bytes; meta declares the decoded shape the FakeCodec will produce)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n_assets):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 256)),
                               dtype=np.uint8).tobytes()
        rows.append({
            "asset_id": f"asset-{i:05d}",
            "kind": kind,
            "payload": payload,
            "meta": {
                "format": {"image": "png", "audio": "wav", "video": "mp4"}[kind],
                "width": int(rng.integers(32, 129)),
                "height": int(rng.integers(32, 129)),
                "sample_rate": 16000,
                "n_frames": int(rng.integers(30, 121)),
            },
        })
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def build_media_pipeline(ds, kind: str, codec: Optional[Codec] = None,
                         batch_size: int = 8, concurrency=(1, 4)):
    """Route a media Dataset through the stage for ``kind``. Small batches:
    decoded frames dominate memory, not the encoded payload."""
    stage = {"image": ImageFeatureStage, "audio": AudioFeatureStage,
             "video": VideoFrameSampleStage}[kind]
    kwargs = {"codec": codec} if codec is not None else {}
    return ds.filter(expr=f"kind == '{kind}'").map_batches(
        stage, fn_constructor_kwargs=kwargs, batch_format="pyarrow",
        batch_size=batch_size, concurrency=concurrency,
    )
