"""Debug tee sink (reference S7, Ocr/src/cli/debug_output.py:24-339).

The reference writes step_01..step_08 PNGs + debug_summary.json per job. Here
the debug stage is an optional TEE on the span stage: when enabled it writes,
per media span, the preprocessed page (compressed .npz8 — no PNG codec in
this container) and a JSON record of the words found, into a per-partition
directory. Off by default; zero cost when disabled.

Event log (reference S8, the stdout {"event": ...} stream parsed by C#,
commands.py:241-258 / ServiceSideDocumentProcessor.cs:636-657): replaced by
``log_event`` appending JSON-lines to a per-worker file — progress telemetry
becomes durable rows, not a parsed pipe; aggregate counters live in the
checkpoint manifests (state/checkpoint.py).
"""

from __future__ import annotations

import json
import os
import time
import zlib
from typing import Any, Dict, List, Optional

import numpy as np


def save_page(debug_dir: str, media_ref: str, image: np.ndarray,
              words: List[Dict[str, Any]]) -> None:
    """Write one preprocessed page + its word dump under debug_dir."""
    os.makedirs(debug_dir, exist_ok=True)
    header = np.asarray([image.ndim, *image.shape], dtype=np.int32).tobytes()
    with open(os.path.join(debug_dir, media_ref + ".pre.npz8"), "wb") as f:
        f.write(header + zlib.compress(np.ascontiguousarray(image).tobytes(), 1))
    with open(os.path.join(debug_dir, media_ref + ".words.json"), "w") as f:
        json.dump({"media_ref": media_ref, "n_words": len(words), "words": words},
                  f, indent=2)


def _to_rgb(img: np.ndarray) -> np.ndarray:
    if img.ndim == 2:
        return np.repeat(img[:, :, None], 3, axis=2)
    return img


def _draw_boxes(img: np.ndarray, boxes: List[List[int]]) -> np.ndarray:
    """Red box outlines on an RGB copy (the reference draws engine pixel
    boxes on the final page, debug_output.py:123-180)."""
    rgb = _to_rgb(img).copy()
    h, w = rgb.shape[:2]
    for box in boxes:
        x0 = int(np.clip(box[0], 0, w - 1))
        y0 = int(np.clip(box[1], 0, h - 1))
        x1 = int(np.clip(box[2], 0, w - 1))
        y1 = int(np.clip(box[3], 0, h - 1))
        rgb[y0, x0:x1 + 1] = (255, 0, 0)
        rgb[y1, x0:x1 + 1] = (255, 0, 0)
        rgb[y0:y1 + 1, x0] = (255, 0, 0)
        rgb[y0:y1 + 1, x1] = (255, 0, 0)
    return rgb


def save_steps(debug_dir: str, media_ref: str,
               steps: List[Any], final: np.ndarray,
               words_px: List[Dict[str, Any]],
               words_norm: List[Dict[str, Any]]) -> None:
    """Reference-parity debug artifacts for one media span
    (Ocr/src/cli/debug_output.py:24-339): numbered per-step PNGs for every
    preprocessing stage that RAN (step order follows this engine's fused
    chain), the final page, an OCR-bbox overlay, the word dump + compressed
    page (save_page, kept for tooling back-compat), and a
    debug_summary.json listing everything. PNGs are real (the in-repo
    numpy+zlib encoder) — no external imaging library needed."""
    from .multimodal import encode_png

    os.makedirs(debug_dir, exist_ok=True)
    files: List[str] = []
    numbered = [(n, im) for n, im in steps]
    numbered.append(("preprocessed_final", final))
    for i, (name, img) in enumerate(numbered, start=1):
        fn = f"{media_ref}.step_{i:02d}_{name}.png"
        with open(os.path.join(debug_dir, fn), "wb") as f:
            f.write(encode_png(_to_rgb(np.asarray(img))))
        files.append(fn)
    fn = f"{media_ref}.step_{len(numbered) + 1:02d}_ocr_bboxes.png"
    with open(os.path.join(debug_dir, fn), "wb") as f:
        f.write(encode_png(_draw_boxes(np.asarray(final),
                                       [w["box"] for w in words_px])))
    files.append(fn)
    save_page(debug_dir, media_ref, final, words_norm)
    files += [media_ref + ".pre.npz8", media_ref + ".words.json"]
    summary = {
        "media_ref": media_ref,
        "n_words": len(words_px),
        "steps": [n for n, _ in numbered] + ["ocr_bboxes"],
        "files": files,
    }
    with open(os.path.join(debug_dir, media_ref + ".debug_summary.json"),
              "w") as f:
        json.dump(summary, f, indent=2)


def log_event(log_dir: Optional[str], event: str, **payload: Any) -> None:
    """Append one JSON-lines telemetry event; no-op when log_dir is None."""
    if not log_dir:
        return
    os.makedirs(log_dir, exist_ok=True)
    rec = {"event": event, "ts": time.time(), "pid": os.getpid(), **payload}
    with open(os.path.join(log_dir, f"events-{os.getpid()}.jsonl"), "a") as f:
        f.write(json.dumps(rec) + "\n")


def read_events(log_dir: str) -> List[Dict[str, Any]]:
    out: List[Dict[str, Any]] = []
    if not os.path.isdir(log_dir):
        return out
    for name in sorted(os.listdir(log_dir)):
        if name.startswith("events-") and name.endswith(".jsonl"):
            with open(os.path.join(log_dir, name)) as f:
                for line in f:
                    line = line.strip()
                    if line:
                        out.append(json.loads(line))
    return out
