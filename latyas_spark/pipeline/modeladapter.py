"""M-row model plug point: the batched-inference template (M7).

The reference's one genuinely batched model call is TexTeller's LaTeX
OCR (tex_ocr/.../utils/inference.py:13-49): transform every crop to a
fixed 448px grayscale tensor (transforms.py:22-41, globals.py:1-23),
stack the batch, run ``model.generate`` once, ``batch_decode``.  Every
other model wrapper in the reference predicts image-by-image — the
survey (§2.8) calls M7 out as the template our Arrow-batch stages
should follow, and this module is that template made generic:

  decode (pluggable codec) -> fixed-size resize -> np.stack into ONE
  (B, S, S) tensor per model call -> registered model fn -> columns.

The model weights are a plug point like every M1-M9 row: the default
``fake_model`` is a deterministic batch classifier (label from the
batch-row mean, confidence from its spread) so the batching plumbing —
Arrow transfer, fixed-shape stacking, remainder batches, per-batch
model invocation count — is real and tested while the weights are
swappable via :func:`register_model` on a real cluster
(``spark-submit --py-files``).
"""

from __future__ import annotations

from typing import Callable, Iterator, List, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FIXED_SIZE = 448  # the M7 transform's fixed edge (globals.py:1-23)

INFER_SCHEMA = "media_ref string, label string, conf double, batch_size int"

_LABELS = [
    "text", "title", "caption", "figure", "figurecaption", "table",
    "tablecaption", "header", "footer", "reference", "equation",
    "embedeq", "toc", "list", "icon", "qrcode", "barcode",
    "textwithequation", "unknown",
]


def fake_model(batch: np.ndarray) -> Tuple[List[str], List[float]]:
    """Deterministic stand-in: one call per stacked batch.  Label is
    keyed off each row's mean intensity, confidence off its std — any
    real classifier head has the same (B,) -> (labels, confs) shape."""
    # explicit raise, not assert: asserts vanish under python -O and
    # this shape check is the adapter's contract with register_model
    if batch.ndim != 3 or batch.shape[1:] != (FIXED_SIZE, FIXED_SIZE):
        raise ValueError(f"model batch must be (B, {FIXED_SIZE}, {FIXED_SIZE}), got {batch.shape}")
    means = batch.mean(axis=(1, 2))
    stds = batch.std(axis=(1, 2))
    labels = [_LABELS[int(m) % len(_LABELS)] for m in means]
    confs = [round(float(s % 64) / 64.0, 6) for s in stds]
    return labels, confs


_MODEL: Callable[[np.ndarray], Tuple[List[str], List[float]]] = fake_model


def register_model(
    fn: Callable[[np.ndarray], Tuple[List[str], List[float]]],
) -> None:
    """Swap in real weights (executors pick the module up via
    --py-files; the fn must be importable, not a closure)."""
    global _MODEL
    _MODEL = fn


def _resize_fixed(raster: np.ndarray, size: int = FIXED_SIZE) -> np.ndarray:
    """Nearest-neighbor resize to (size, size) — the deterministic
    stand-in for the M7 448px transform chain; index-map based, so
    it's exact and fast for any input shape."""
    h, w = raster.shape[:2]
    ys = (np.arange(size) * h // size).clip(0, h - 1)
    xs = (np.arange(size) * w // size).clip(0, w - 1)
    return raster[np.ix_(ys, xs)]


def infer_media(
    media: DataFrame, batch_size: int = 32, spread: bool = True
) -> DataFrame:
    """Batched model inference over the media table (columns media_ref,
    width, height, payload).  Decodes with the registered codec,
    resizes to the fixed edge, stacks ``batch_size`` rasters into one
    tensor per model call (the M7 pattern — never image-by-image), and
    emits one row per media with the batch size it rode in (so tests
    can assert the batching actually happened).

    Salt-repartitions before the expensive decode+model step, same
    rationale as extract_media_features: inference cost must not
    inherit upstream layout skew."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..relational import multimodal

        stack: List[np.ndarray] = []
        refs: List[str] = []

        def flush() -> pd.DataFrame:
            tensor = np.stack(stack)  # ONE (B, S, S) model call
            labels, confs = _MODEL(tensor)
            out = pd.DataFrame(
                {
                    "media_ref": pd.Series(refs, dtype=object),
                    "label": pd.Series(labels, dtype=object),
                    "conf": pd.Series(confs, dtype="float64"),
                    "batch_size": pd.Series(
                        [len(refs)] * len(refs), dtype="int32"
                    ),
                }
            )
            stack.clear()
            refs.clear()
            return out

        for pdf in batches:
            for ref, w, h, payload in zip(
                pdf["media_ref"], pdf["width"], pdf["height"], pdf["payload"]
            ):
                raster = multimodal._DECODER(bytes(payload), int(w), int(h))
                stack.append(_resize_fixed(raster))
                refs.append(ref)
                if len(stack) >= batch_size:
                    yield flush()
        if stack:
            yield flush()  # remainder batch

    shaped = media
    if spread:
        shaped = media.repartition(
            F.pmod(F.xxhash64("media_ref"), F.lit(64))
        )
    return shaped.mapInPandas(run, schema=INFER_SCHEMA)
