"""Raw media ingestion: a directory (or bucket prefix) of encoded files ->
the engine's media table (S1 at the ingestion boundary).

``ray.data.read_binary_files`` streams file bytes as blocks with paths; the
mapping to (media_ref, kind, payload, meta) is a vectorized batch transform.
Decoding stays OUT of ingestion — payloads remain opaque binary until the
multimodal/OCR stage that needs pixels (stages/multimodal.py), so ingest
throughput is IO-bound, not codec-bound, and the object store holds encoded
bytes (10-100x smaller than decoded frames).
"""

from __future__ import annotations

import os
from typing import Dict

import pyarrow as pa

import ray.data

_EXT_KIND = {
    ".png": "image", ".jpg": "image", ".jpeg": "image", ".tiff": "image",
    ".tif": "image", ".bmp": "image", ".gif": "image", ".webp": "image",
    ".wav": "audio", ".flac": "audio", ".mp3": "audio", ".ogg": "audio",
    ".mp4": "video", ".mkv": "video", ".webm": "video", ".avi": "video",
    ".npz8": "image", ".npy": "image",  # this engine's compressed page store
}


def ingest_media_dir(path: str, default_kind: str = "binary") -> "ray.data.Dataset":
    """Read every file under ``path`` into the media table shape
    (asset_id = filename stem, kind from extension allowlist, payload bytes,
    meta nulls — decode-time stages fill real dimensions)."""
    ds = ray.data.read_binary_files(path, include_paths=True)

    def to_media(batch: Dict) -> pa.Table:
        ids, kinds, fmts = [], [], []
        for p in batch["path"]:
            base = os.path.basename(p)
            stem, ext = os.path.splitext(base)
            ids.append(stem)
            kinds.append(_EXT_KIND.get(ext.lower(), default_kind))
            fmts.append(ext.lstrip(".").lower())
        n = len(ids)
        meta = pa.array(
            [{"format": f, "width": None, "height": None,
              "sample_rate": None, "n_frames": None} for f in fmts],
            pa.struct([("format", pa.string()), ("width", pa.int32()),
                       ("height", pa.int32()), ("sample_rate", pa.int32()),
                       ("n_frames", pa.int32())]))
        return pa.table({
            "asset_id": pa.array(ids, pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array([bytes(b) for b in batch["bytes"]], pa.large_binary()),
            "meta": meta,
        })

    return ds.map_batches(to_media, batch_format="numpy")
