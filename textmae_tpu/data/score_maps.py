"""Patch-importance score maps (offline, host/CPU).

Re-implements the reference's classical-CV scoring pipeline
(/root/reference/generate_scores_file.py:13-36, utils/map.py, utils/distribution.py)
with the same observable behavior but no per-pixel Python loops:

  structure map = quadtree division-merge segmentation (utils/map.py:6-53)
  texture map   = |Laplacian| edge magnitude             (utils/map.py:56-60)
  patch score   = per-16x16-patch integer mean           (utils/distribution.py:5-16)
  total         = texture * structure, min-max normalized (generate_scores_file.py:26-29)

Implementation notes (deliberate re-design, same semantics):
  * the reference's homogeneity test (utils/map.py:6-23) is a per-pixel Python
    double loop computing the fraction of pixels with (v - mean) < 2*std (note:
    one-sided, exactly as written there); here it is one vectorized expression,
  * the recursion (utils/map.py:35-42) becomes an explicit work-stack so huge
    images cannot hit Python's recursion limit,
  * std uses ddof=1 to match np.std(..., ddof=1) at utils/map.py:9.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np

try:  # cv2 is a host-side optional; everything degrades to numpy fallbacks
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False


def _is_homogeneous(area: np.ndarray) -> bool:
    """95% of pixels satisfy (v - mean) < 2*std (utils/map.py:6-23, one-sided)."""
    if area.size <= 1:
        return True
    a = area.astype(np.float64)
    mean = a.mean()
    std = a.std(ddof=1)
    return float(np.mean((a - mean) < 2.0 * std)) >= 0.95


def _merge_region(img: np.ndarray, h0: int, w0: int, h: int, w: int) -> None:
    """Binarize region: 60 < v < 150 -> 0, else 255 (utils/map.py:27-31)."""
    area = img[h0 : h0 + h, w0 : w0 + w]
    mask = (area > 60) & (area < 150)
    area[mask] = 0
    area[~mask] = 255


def division_merge_segment(
    img: np.ndarray, new_shape: Tuple[int, int] = (224, 224)
) -> np.ndarray:
    """Quadtree division-merge segmentation -> binary structure map.

    Semantics of utils/map.py:35-53: split while the region is inhomogeneous
    and min(h, w) > 5, else binarize in place; crop a 1px border; resize.
    """
    img = np.ascontiguousarray(img).copy()
    stack = [(0, 0, img.shape[0], img.shape[1])]
    while stack:
        h0, w0, h, w = stack.pop()
        area = img[h0 : h0 + h, w0 : w0 + w]
        if not _is_homogeneous(area) and min(h, w) > 5:
            h2, w2 = h // 2, w // 2
            stack.append((h0, w0, h2, w2))
            stack.append((h0, w0 + w2, h2, w2))
            stack.append((h0 + h2, w0, h2, w2))
            stack.append((h0 + h2, w0 + w2, h2, w2))
        else:
            _merge_region(img, h0, w0, h, w)
    img = img[1:-1, 1:-1]
    return _resize(img, new_shape)


def laplacian_map(img: np.ndarray, new_shape: Tuple[int, int] = (224, 224)) -> np.ndarray:
    """|Laplacian| texture map (utils/map.py:56-60)."""
    if _HAS_CV2:
        lap = cv2.Laplacian(img, cv2.CV_16S, ksize=3)
        lap = cv2.convertScaleAbs(lap)
        return _resize(lap, new_shape)
    # numpy fallback: same 3x3 kernel OpenCV uses for ksize=3
    k = np.array([[2, 0, 2], [0, -8, 0], [2, 0, 2]], np.float64)
    a = np.pad(img.astype(np.float64), 1, mode="reflect")
    out = np.zeros_like(a[1:-1, 1:-1])
    for dy in range(3):
        for dx in range(3):
            if k[dy, dx]:
                out += k[dy, dx] * a[dy : dy + out.shape[0], dx : dx + out.shape[1]]
    out = np.clip(np.abs(out), 0, 255).astype(np.uint8)
    return _resize(out, new_shape)


def _resize(img: np.ndarray, new_shape: Tuple[int, int]) -> np.ndarray:
    if _HAS_CV2:
        return cv2.resize(img, new_shape)
    from PIL import Image

    return np.asarray(Image.fromarray(img).resize(new_shape, Image.BILINEAR))


def load_gray(path) -> np.ndarray:
    """Canonical grayscale load for score generation: PIL ``convert("L")``.

    Every score producer (generate_scores CLI, bench.py, train_demo,
    pipeline CLI) MUST go through this one function: the division-merge
    segmentation is sensitive to +-1 grayscale rounding, so mixing loaders
    shifts patch keep-sets between training-time and eval-time scores and
    silently degrades trained checkpoints (observed: 37.7 -> 16.3 dB on the
    committed 150k checkpoint when eval scores came from cv2's grayscale).
    The reference uses cv2.imread(..., IMREAD_GRAYSCALE)
    (generate_scores_file.py:43); we pin PIL's ITU-R 601-2 rounding instead —
    either convention works, but only one may exist.
    """
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("RGB").convert("L"))


def patch_scores(img: np.ndarray, crop_sz: int = 16, step: int = 16) -> np.ndarray:
    """Integer mean of each crop_sz x crop_sz window (utils/distribution.py:5-16).

    Vectorized pooling; int() in the reference truncates, and window means are
    non-negative, so floor is identical.
    """
    h, w = img.shape
    nh = (h - crop_sz) // step + 1
    nw = (w - crop_sz) // step + 1
    if step == crop_sz:
        a = img[: nh * crop_sz, : nw * crop_sz].astype(np.float64)
        means = a.reshape(nh, crop_sz, nw, crop_sz).mean(axis=(1, 3))
    else:  # general stride: strided view
        s0, s1 = img.strides
        view = np.lib.stride_tricks.as_strided(
            img, (nh, nw, crop_sz, crop_sz), (s0 * step, s1 * step, s0, s1)
        )
        means = view.astype(np.float64).mean(axis=(2, 3))
    return np.floor(means).astype(np.int64).reshape(-1)


def show_distribution(score: np.ndarray, shape=(14, 14), title: str = ""):
    """Debug visualization of a patch-score grid (utils/distribution.py:19-24)."""
    import matplotlib.pyplot as plt

    plt.imshow(np.resize(score, shape))
    plt.title(title, fontsize=16)
    plt.axis("off")


def total_score_for_image(
    gray: np.ndarray, map_shape: Tuple[int, int] = (224, 224)
) -> np.ndarray:
    """Full per-image pipeline -> (196,) float32 normalized total score
    (generate_scores_file.py:19-31)."""
    s_map = division_merge_segment(gray, map_shape)
    t_map = laplacian_map(gray, map_shape)
    s_score = patch_scores(s_map)
    t_score = patch_scores(t_map)
    total = (t_score * s_score).astype(np.float64)
    if total.size > 0:
        lo, hi = total.min(), total.max()
        total = (total - lo) / (hi - lo) if hi > lo else np.zeros_like(total)
    return total.astype(np.float32)
