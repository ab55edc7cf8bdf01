"""Image preprocessing kernels (M1-M9) as pure numpy functions.

The reference shells out to ImageMagick per image per step
(Ocr/src/preprocessing/image_preprocessor.py:186-220 — one `magick`
subprocess each). We re-derive each step as a deterministic, vectorized numpy
kernel so the whole chain runs subprocess-free inside one fused map_batches
UDF (SURVEY.md section 2.2, M1-M9). Default order mirrors the reference
composer (image_preprocessor.py:336-478): deskew -> grayscale -> background
removal -> contrast -> [threshold] -> denoise; resample is deliberately a
separate, last step (image_preprocessor.py:510-553).

All kernels take/return uint8 arrays; grayscale images are (H, W), RGB
(H, W, 3). Everything is integer/LUT math -> bit-exact across runs and
parallelism levels.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import Optional

import numpy as np

_LOG = logging.getLogger(__name__)

# Safety caps from the reference (image_preprocessor.py:40-43)
MAX_DIM = 32767              # Tesseract per-dimension cap
MAX_PIXELS = 178_956_970     # Pillow decompression-bomb cap
DPI_STEP = 50
MIN_DPI = 100


def to_grayscale(img: np.ndarray) -> np.ndarray:
    """M2: colorspace Gray via integer luma (ITU-R 601 weights, /1000)."""
    if img.ndim == 2:
        return img
    r = img[..., 0].astype(np.uint32)
    g = img[..., 1].astype(np.uint32)
    b = img[..., 2].astype(np.uint32)
    return ((299 * r + 587 * g + 114 * b) // 1000).astype(np.uint8)


# LUT-composition versions of the point operations: every step here is a
# function of the PIXEL VALUE only, so a chain of steps composes into one
# 256-entry LUT and the image is touched once per public call (one histogram
# pass where a min/max is needed + one gather) instead of once per step —
# bit-identical by construction (uint8 domain, same per-value arithmetic).

def _minmax_from_hist(hist: np.ndarray) -> tuple:
    nz = np.flatnonzero(hist)
    return int(nz[0]), int(nz[-1])


def _auto_level_lut(lo: int, hi: int) -> np.ndarray:
    if hi <= lo:
        return np.arange(256, dtype=np.uint8)  # identity (matches .copy())
    return np.clip((np.arange(256, dtype=np.int64) - lo) * 255
                   // (hi - lo), 0, 255).astype(np.uint8)


def auto_level(img: np.ndarray) -> np.ndarray:
    """Linear histogram stretch to full [0, 255] (ImageMagick -auto-level)."""
    lo = int(img.min())
    hi = int(img.max())
    if hi <= lo:
        return img.copy()
    return _auto_level_lut(lo, hi)[img]


def _whiten_lut(fuzz_percent: float) -> np.ndarray:
    thresh = 255 - int(round(255 * fuzz_percent / 100.0))
    lut = np.arange(256, dtype=np.uint8)
    lut[thresh:] = 255
    return lut


def remove_background(img: np.ndarray, fuzz_percent: float = 30.0) -> np.ndarray:
    """M3: pixels within fuzz% of white forced to pure white, then auto-level.
    One histogram pass + one gather (whiten and stretch LUTs composed)."""
    wlut = _whiten_lut(fuzz_percent)
    hist = np.bincount(img.reshape(-1), minlength=256)
    whist = np.bincount(wlut, weights=hist, minlength=256)
    lo, hi = _minmax_from_hist(whist)
    return _auto_level_lut(lo, hi)[wlut][img]


def _sigmoid_lut(strength: float, midpoint_percent: float) -> np.ndarray:
    mid = 255.0 * midpoint_percent / 100.0 / 2.0  # ImageMagick midpoint is % of range
    x = np.arange(256, dtype=np.float64)
    s = 1.0 / (1.0 + np.exp(strength * (mid - x) / 255.0 * 10.0 / 3.0))
    s0 = 1.0 / (1.0 + np.exp(strength * mid / 255.0 * 10.0 / 3.0))
    s1 = 1.0 / (1.0 + np.exp(strength * (mid - 255.0) / 255.0 * 10.0 / 3.0))
    return np.clip(np.round((s - s0) / (s1 - s0) * 255.0), 0, 255).astype(np.uint8)


def sigmoidal_contrast(img: np.ndarray, strength: float = 3.0, midpoint_percent: float = 120.0) -> np.ndarray:
    """M4: -auto-level then sigmoidal contrast LUT (strength x midpoint%).
    One histogram pass + one gather (stretch and sigmoid LUTs composed)."""
    hist = np.bincount(img.reshape(-1), minlength=256)
    lo, hi = _minmax_from_hist(hist)
    return _sigmoid_lut(strength, midpoint_percent)[_auto_level_lut(lo, hi)][img]


def threshold(img: np.ndarray, percent: float = 50.0) -> np.ndarray:
    """M5: global binarize at percent of full scale (off by default upstream)."""
    t = int(round(255 * percent / 100.0))
    return np.where(img >= t, np.uint8(255), np.uint8(0))


def denoise(img: np.ndarray) -> np.ndarray:
    """M6: despeckle — isolated dark pixels on light ground are lifted to the
    max of their 8-neighborhood (a one-pixel morphological open, integer-exact).
    Running pairwise max/min over the 8 shifted views (no (8,H,W) stack)."""
    p = np.pad(img, 1, mode="edge")
    views = (
        p[:-2, :-2], p[:-2, 1:-1], p[:-2, 2:],
        p[1:-1, :-2], p[1:-1, 2:],
        p[2:, :-2], p[2:, 1:-1], p[2:, 2:],
    )
    nmax = views[0].copy()
    nmin = views[0].copy()
    for v in views[1:]:
        np.maximum(nmax, v, out=nmax)
        np.minimum(nmin, v, out=nmin)
    isolated_dark = (img < 128) & (nmin >= 128)
    out = img.copy()
    out[isolated_dark] = nmax[isolated_dark]
    return out


def estimate_skew_angle(img: np.ndarray, max_angle: int = 3) -> int:
    """M1 (estimate): integer-degree angle maximizing row-profile variance
    under horizontal shear; 0 for clean axis-aligned pages."""
    ink = (img < 128)
    if not ink.any():
        return 0
    h, w = ink.shape
    ys, xs = np.nonzero(ink)
    # per-column shear offsets once per |angle| (round/tan are odd functions,
    # so the -ang offsets are the negated +ang ones); gather per pixel
    col = np.arange(w, dtype=np.float64)
    off = {0: np.zeros(w, np.int64)}
    for ang in range(1, max_angle + 1):
        r = np.round(col * np.tan(np.deg2rad(ang))).astype(np.int64)
        off[ang] = r
        off[-ang] = -r
    best_angle, best_var = 0, -1.0
    for ang in range(-max_angle, max_angle + 1):
        yy = np.clip(ys - off[ang][xs], 0, h - 1)
        prof = np.bincount(yy, minlength=h).astype(np.float64)
        var = prof.var()
        if var > best_var + 1e-9:
            best_var, best_angle = var, ang
    return best_angle


def deskew(img: np.ndarray, max_angle: int = 3) -> np.ndarray:
    """M1: undo the estimated shear by integer row-shifts (nearest-neighbor,
    deterministic); white background fill."""
    ang = estimate_skew_angle(img, max_angle)
    if ang == 0:
        return img
    h, w = img.shape[:2]
    shear = np.tan(np.deg2rad(ang))
    out = np.full_like(img, 255)
    shifts = np.round(np.arange(w) * shear).astype(np.int64)
    for x in range(w):
        s = shifts[x]
        if s == 0:
            out[:, x] = img[:, x]
        elif s > 0:
            out[: h - s, x] = img[s:, x]
        else:
            out[-s:, x] = img[: h + s, x]
    return out


def resample(img: np.ndarray, scale_num: int, scale_den: int) -> np.ndarray:
    """M8 core: nearest-neighbor resample by a rational factor (deterministic)."""
    h, w = img.shape[:2]
    nh = max(1, h * scale_num // scale_den)
    nw = max(1, w * scale_num // scale_den)
    ri = (np.arange(nh) * scale_den // scale_num).clip(0, h - 1)
    ci = (np.arange(nw) * scale_den // scale_num).clip(0, w - 1)
    return img[np.ix_(ri, ci)]


def find_safe_dpi(width: int, height: int, current_dpi: int, target_dpi: int) -> Optional[int]:
    """M8 guard: step target DPI down by 50 until the resampled image fits the
    Tesseract/Pillow caps; None when even MIN_DPI would not fit
    (image_preprocessor.py:283-334)."""
    dpi = target_dpi
    while dpi >= MIN_DPI:
        nw = width * dpi // current_dpi
        nh = height * dpi // current_dpi
        if nw <= MAX_DIM and nh <= MAX_DIM and nw * nh <= MAX_PIXELS:
            return dpi
        dpi -= DPI_STEP
    return None


@dataclass
class PreprocessConfig:
    deskew: bool = True
    grayscale: bool = True
    remove_background: bool = True
    bg_fuzz_percent: float = 30.0
    contrast: str = "sigmoidal"  # 'sigmoidal' | 'linear' | 'none'
    contrast_strength: float = 3.0
    contrast_midpoint: float = 120.0
    apply_threshold: bool = False
    threshold_percent: float = 50.0
    denoise: bool = True
    # M8: DPI resample, reference-order LAST and separate
    # (image_preprocessor.py:510-553). None disables; when set, the page is
    # resampled assumed_dpi -> find_safe_dpi(target_dpi), the safety caps
    # stepping the target down by DPI_STEP until the result fits. A page
    # that cannot fit even at MIN_DPI matches the reference by default
    # (image_preprocessor.py:330-334, :533): WARN and skip the resample so
    # the page still OCRs; error_on_unsafe_dpi=True raises instead ->
    # in-band error channel (M31).
    target_dpi: Optional[int] = None
    assumed_dpi: int = 300
    error_on_unsafe_dpi: bool = False


def preprocess(img: np.ndarray, cfg: PreprocessConfig = PreprocessConfig(),
               tap=None) -> np.ndarray:
    """M9: fused chain in the reference composer's order (grayscale hoisted
    before deskew — deskew estimation needs single-channel; output-equivalent
    because the reference's deskew precedes any color-dependent step).

    ``tap(step_name, image)`` is the S7 debug hook: called after every stage
    that RAN (the debug sink numbers and PNG-encodes them,
    stages/debug.save_steps). None (the default) costs nothing."""
    t = tap if tap is not None else (lambda _n, _i: None)
    if cfg.grayscale:
        img = to_grayscale(img)
        t("grayscale", img)
    if cfg.deskew:
        img = deskew(img)
        t("deskewed", img)
    if cfg.remove_background:
        img = remove_background(img, cfg.bg_fuzz_percent)
        t("background_removed", img)
    if cfg.contrast == "sigmoidal":
        img = sigmoidal_contrast(img, cfg.contrast_strength, cfg.contrast_midpoint)
        t("contrast_enhanced", img)
    elif cfg.contrast == "linear":
        img = auto_level(img)
        t("contrast_enhanced", img)
    if cfg.apply_threshold:
        img = threshold(img, cfg.threshold_percent)
        t("threshold", img)
    if cfg.denoise:
        img = denoise(img)
        t("denoised", img)
    if cfg.target_dpi:
        h, w = img.shape[:2]
        safe = find_safe_dpi(w, h, cfg.assumed_dpi, cfg.target_dpi)
        if safe is None:
            if cfg.error_on_unsafe_dpi:
                raise ValueError(
                    f"page {w}x{h}@{cfg.assumed_dpi}dpi exceeds safety caps "
                    f"even at MIN_DPI={MIN_DPI}")
            # reference behavior (image_preprocessor.py:330-334): warn and
            # proceed un-resampled so the page still OCRs
            _LOG.warning(
                "page %dx%d@%ddpi exceeds safety caps even at MIN_DPI=%d; "
                "skipping DPI adjustment", w, h, cfg.assumed_dpi, MIN_DPI)
        elif safe != cfg.assumed_dpi:
            img = resample(img, safe, cfg.assumed_dpi)
            t("resampled", img)
    return img
