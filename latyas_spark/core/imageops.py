"""Raster-side operators: small-image padding (F8), background-color
mode (A4), page-render plumbing (S2).

These are the reference's image-space helpers re-expressed over the
engine's opaque-binary media model (relational/multimodal.py).  The
*geometry* (scale/margin/canvas/offset arithmetic, corner selection,
Counter tie semantics) is reproduced exactly; the *resampling kernels*
(cv2 INTER_LINEAR / cv2.blur) are stubbed with deterministic NumPy
stand-ins and swappable via :func:`register_resampler` — the container
ships no cv2/PIL, and exact resampler parity is a model-adapter
concern, not an engine one.

Reference cites:

* ``small_image_padding`` / ``add_margin`` — latyas/ocr/ocr_utils.py:7-56
  (2x resize, 5x5 blur, 160px white margin, centered on a >=800px
  white canvas); callers paddleocr_ocr_model.py:69-70,
  texmix_model.py:78-79.
* background-color mode — Counter of the 4 corner pixels,
  ``most_common(1)`` (first-encountered wins count ties) —
  texteller/utils/mix_inference.py:152-154.
* page render at ``scale=2`` — base_pipeline.py:95-102; the constant
  is load-bearing for coordinate parity: the C7 text-layer projection
  (pipeline/extract.py dual path) divides by the same ``rs=2``.
"""

from __future__ import annotations

from collections import Counter
from typing import Callable, Tuple

import hashlib

import numpy as np

PAD_BG_SIZE = 800
PAD_BG_MARGIN = 160
PAD_BLUR = 5
PAD_SCALE = 2
RENDER_SCALE = 2


def _nearest_2x(raster: np.ndarray) -> np.ndarray:
    """Deterministic 2x upsample stand-in for cv2.resize INTER_LINEAR
    (ocr_utils.py:39).  Geometry (2x both axes) is exact; the
    interpolation kernel is nearest-neighbor — swap via
    register_resampler for bit-parity with cv2 on a real cluster."""
    return np.repeat(np.repeat(raster, PAD_SCALE, axis=0), PAD_SCALE, axis=1)


def _box_blur(raster: np.ndarray, k: int) -> np.ndarray:
    """k x k normalized box filter with reflect-101 borders (numpy
    'reflect' == cv2 BORDER_DEFAULT), rounding to nearest like cv2.blur
    (ocr_utils.py:40-41)."""
    if k <= 1:
        return raster
    pad = k // 2
    padded = np.pad(raster, pad, mode="reflect").astype(np.float64)
    # separable sliding mean via cumsum along each axis
    for axis in (0, 1):
        cs = np.cumsum(padded, axis=axis)
        zero = np.zeros_like(np.take(cs, [0], axis=axis))
        cs = np.concatenate([zero, cs], axis=axis)
        hi = np.take(cs, range(k, cs.shape[axis]), axis=axis)
        lo = np.take(cs, range(0, cs.shape[axis] - k), axis=axis)
        padded = hi - lo
    out = np.rint(padded / float(k * k)).astype(np.uint8)
    return out


_RESAMPLER: Callable[[np.ndarray], np.ndarray] = _nearest_2x
_BLUR: Callable[[np.ndarray, int], np.ndarray] = _box_blur


def register_resampler(
    upsample: Callable[[np.ndarray], np.ndarray],
    blur: Callable[[np.ndarray, int], np.ndarray],
) -> None:
    """Swap in real cv2-backed kernels on a cluster that has them."""
    global _RESAMPLER, _BLUR
    _RESAMPLER = upsample
    _BLUR = blur


def pad_geometry(width: int, height: int) -> dict:
    """The exact output geometry of small_image_padding
    (ocr_utils.py:31-56): 2x resize, +160 margin each side, centered
    on a white canvas of at least 800x800."""
    mw = PAD_SCALE * int(width) + 2 * PAD_BG_MARGIN
    mh = PAD_SCALE * int(height) + 2 * PAD_BG_MARGIN
    bg_w = max(mw, PAD_BG_SIZE)
    bg_h = max(mh, PAD_BG_SIZE)
    return {
        "padded_w": mw,
        "padded_h": mh,
        "bg_w": bg_w,
        "bg_h": bg_h,
        "x_off": (bg_w - mw) // 2,
        "y_off": (bg_h - mh) // 2,
    }


def add_margin(raster: np.ndarray, margin: int, color: int = 255) -> np.ndarray:
    """White border of ``margin`` px on every side (ocr_utils.py:7-29;
    single-channel analog of the reference's 3-channel canvas)."""
    h, w = raster.shape[:2]
    background = np.full((h + 2 * margin, w + 2 * margin), color, np.uint8)
    background[margin:margin + h, margin:margin + w] = raster
    return background


def small_image_padding(raster: np.ndarray) -> np.ndarray:
    """F8: 2x upsample -> 5x5 blur -> 160px margin -> centered on a
    >=800px white canvas (ocr_utils.py:31-56)."""
    up = _RESAMPLER(raster)
    blurred = _BLUR(up, PAD_BLUR)
    with_margin = add_margin(blurred, PAD_BG_MARGIN)
    h, w = with_margin.shape[:2]
    bg_h, bg_w = max(h, PAD_BG_SIZE), max(w, PAD_BG_SIZE)
    background = np.full((bg_h, bg_w), 255, np.uint8)
    x_off = (bg_w - w) // 2
    y_off = (bg_h - h) // 2
    background[y_off:y_off + h, x_off:x_off + w] = with_margin
    return background


def bg_color_mode(raster: np.ndarray) -> int:
    """A4: modal value of the 4 corner pixels, first-encountered on
    count ties (Counter.most_common(1) insertion-order semantics,
    mix_inference.py:152-154)."""
    corners = [
        int(raster[0, 0]),
        int(raster[0, -1]),
        int(raster[-1, 0]),
        int(raster[-1, -1]),
    ]
    return Counter(corners).most_common(1)[0][0]


def fake_render(doc_id: str, page: int, scale: int = RENDER_SCALE) -> Tuple[int, int, bytes]:
    """Deterministic page-render stand-in (S2 plumbing): A4 points
    (612x792) times ``scale``, payload = md5 of "doc_id:page".  Swap
    via register_renderer for a real rasterizer (pdfium/poppler)."""
    w, h = 612 * scale, 792 * scale
    payload = hashlib.md5(f"{doc_id}:{page}".encode()).digest()
    return w, h, payload


_RENDERER: Callable[[str, int, int], Tuple[int, int, bytes]] = fake_render


def register_renderer(
    fn: Callable[[str, int, int], Tuple[int, int, bytes]],
) -> None:
    global _RENDERER
    _RENDERER = fn


def render_one(doc_id: str, page: int, scale: int = RENDER_SCALE):
    return _RENDERER(doc_id, page, scale)
