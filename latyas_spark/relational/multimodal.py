"""Multimodal column plumbing: opaque binary media + typed metadata.

Media (image/audio/video) travel as ``binary`` columns with a typed
metadata struct; decode/feature stages are Arrow-batched
``mapInPandas`` kernels.  The actual codec step is STUBBED (no
image/audio libraries ship in this container) behind
``register_decoder`` — the default decoder is a deterministic fake
that derives pseudo-pixels from the bytes' md5, so the Spark-side
plumbing (schema, batching, partitioning, UDF signature) is real and
tested while the codec is swappable for a real one on a production
cluster.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_ref string, media_type string, width int, height int, "
    "n_bytes int, payload binary"
)

FEATURE_SCHEMA = (
    "media_ref string, media_type string, n_bytes int, "
    "mean_intensity double, aspect double, phash string"
)


def fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in for image decode: expand the md5 of the
    payload into a (height, width) uint8 raster.  Replace via
    ``register_decoder`` with a real codec (PIL/opencv) in production.
    """
    digest = hashlib.md5(payload or b"").digest()
    n = max(int(width) * int(height), 1)
    reps = (n + len(digest) - 1) // len(digest)
    raster = np.frombuffer(digest * reps, dtype=np.uint8)[:n]
    return raster.reshape((max(int(height), 1), -1))


_DECODER: Callable[[bytes, int, int], np.ndarray] = fake_decode


def register_decoder(fn: Callable[[bytes, int, int], np.ndarray]) -> None:
    """Swap in a real decoder (executors pick it up via --py-files)."""
    global _DECODER
    _DECODER = fn


def synth_media(blocks: DataFrame) -> DataFrame:
    """Derive a media table from the sidecar's media rows: payload is a
    deterministic byte string from the ref (opaque-binary stand-in)."""
    m = blocks.filter(F.col("media_ref").isNotNull())
    return m.select(
        "media_ref",
        F.element_at(
            F.array(F.lit("image/png"), F.lit("image/jpeg"), F.lit("video/mp4")),
            (F.abs(F.xxhash64("media_ref")) % 3 + 1).cast("int"),
        ).alias("media_type"),
        ((F.abs(F.xxhash64("media_ref", F.lit(1))) % 64) + 16).cast("int").alias("width"),
        ((F.abs(F.xxhash64("media_ref", F.lit(2))) % 64) + 16).cast("int").alias("height"),
        F.length(F.col("media_ref")).cast("int").alias("n_bytes"),
        F.encode(F.md5("media_ref"), "utf-8").alias("payload"),
    )


def extract_media_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode + feature extraction over binary payloads.

    Repartitions by a hash of media_ref so feature extraction spreads
    evenly regardless of upstream layout (decode is the expensive step
    at 100 TB scale, so its partitioning must not inherit skew).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            means, aspects, phashes = [], [], []
            for payload, w, h in zip(pdf["payload"], pdf["width"], pdf["height"]):
                raster = _DECODER(payload, int(w), int(h))
                means.append(float(raster.mean()))
                aspects.append(round(float(w) / float(h), 6))
                bits = (raster.mean(axis=0) > raster.mean()).astype(np.uint8)
                phashes.append("".join(map(str, bits[:16])))
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": pdf["media_type"],
                    "n_bytes": pdf["n_bytes"].astype("int32"),
                    "mean_intensity": pd.Series(means, dtype="float64"),
                    "aspect": pd.Series(aspects, dtype="float64"),
                    "phash": pd.Series(phashes, dtype=object),
                }
            )

    shaped = media.repartition(F.pmod(F.xxhash64("media_ref"), F.lit(64)))
    return shaped.mapInPandas(run, schema=FEATURE_SCHEMA)


FRAME_SCHEMA = (
    "media_ref string, frame_idx int, n_frames int, px0 int, bg_mode int"
)


def sample_frames(media: DataFrame, k: int = 4) -> DataFrame:
    """Video frame sampling: k uniformly-spaced frames per video row
    (``frame_idx = i * n_frames div k``), each decoded through the
    pluggable codec and reduced to per-frame features (first pixel +
    corner-mode background color).

    The container demux is STUBBED like every codec here: frame f of a
    payload decodes as ``_DECODER(payload + b":" + str(f), w, h)`` — a
    real ffmpeg-style demuxer drops in via ``register_decoder`` with
    the same per-frame contract.  ``n_frames`` is an input column (real
    pipelines read it from container metadata, not by decoding).

    Scale shape: decode is the expensive step, so rows are
    hash-repartitioned before the kernel (same rationale as
    extract_media_features); sampling k of T frames bounds work per
    video regardless of its length — the standard trick that keeps a
    10-hour outlier video from becoming a straggler task.
    """
    from ..core.imageops import bg_color_mode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_ref": [], "frame_idx": [], "n_frames": [],
                "px0": [], "bg_mode": [],
            }
            for ref, w, h, t, payload in zip(
                pdf["media_ref"], pdf["width"], pdf["height"],
                pdf["n_frames"], pdf["payload"],
            ):
                for i in range(k):
                    f = (i * int(t)) // k
                    raster = _DECODER(
                        bytes(payload) + f":{f}".encode(), int(w), int(h)
                    )
                    out["media_ref"].append(ref)
                    out["frame_idx"].append(f)
                    out["n_frames"].append(int(t))
                    out["px0"].append(int(raster[0, 0]))
                    out["bg_mode"].append(int(bg_color_mode(raster)))
            yield pd.DataFrame(
                {
                    "media_ref": pd.Series(out["media_ref"], dtype=object),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "n_frames": pd.Series(out["n_frames"], dtype="int32"),
                    "px0": pd.Series(out["px0"], dtype="int32"),
                    "bg_mode": pd.Series(out["bg_mode"], dtype="int32"),
                }
            )

    shaped = media.repartition(F.pmod(F.xxhash64("media_ref"), F.lit(64)))
    return shaped.mapInPandas(run, schema=FRAME_SCHEMA)


RENDER_SCHEMA = (
    "doc_id string, page int, scale int, width int, height int, "
    "payload binary"
)


def render_pages(pages: DataFrame, scale: int = 2) -> DataFrame:
    """S2/S3 page-raster source: (doc_id, page) -> rendered raster rows.

    The rasterizer is a plug point (core/imageops.register_renderer);
    the default is a deterministic fake (md5 payload, A4 x scale dims)
    so the Spark plumbing — schema, Arrow batching, salt repartition
    before the expensive render — is real and tested without a PDF lib
    in the container.  scale=2 matches the reference's render constant
    (base_pipeline.py:95-102), which the C7 text-layer projection
    divides by (coordinate parity).
    """
    from typing import Iterator

    from ..core import imageops

    def run(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        for pdf in batches:
            out = {
                "doc_id": [], "page": [], "scale": [], "width": [],
                "height": [], "payload": [],
            }
            for doc_id, page in zip(pdf["doc_id"], pdf["page"]):
                w, h, payload = imageops.render_one(
                    str(doc_id), int(page), scale
                )
                out["doc_id"].append(doc_id)
                out["page"].append(int(page))
                out["scale"].append(scale)
                out["width"].append(w)
                out["height"].append(h)
                out["payload"].append(payload)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype=object),
                    "page": pd.Series(out["page"], dtype="int32"),
                    "scale": pd.Series(out["scale"], dtype="int32"),
                    "width": pd.Series(out["width"], dtype="int32"),
                    "height": pd.Series(out["height"], dtype="int32"),
                    "payload": pd.Series(out["payload"], dtype=object),
                }
            )

    distinct_pages = pages.select("doc_id", "page").distinct()
    # render is the expensive step at scale: spread pages evenly,
    # independent of upstream layout (same rationale as decode above)
    shaped = distinct_pages.repartition(
        F.pmod(F.xxhash64("doc_id", "page"), F.lit(64))
    )
    return shaped.mapInPandas(run, schema=RENDER_SCHEMA)


def read_media_dir(spark, path: str) -> DataFrame:
    """S5 image-file source: spark.read.format('binaryFile') over a
    directory -> rows in the media-table shape (auto_labelme.py:23-34's
    cv2.imread glob loop, Spark-native).  Width/height come from the
    registered prober (default: deterministic fake from the payload,
    matching fake_decode's contract)."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.*")
        .load(path)
    )
    ext = F.lower(F.element_at(F.split(F.col("path"), "\\."), -1))
    media_type = (
        F.when(ext.isin("jpg", "jpeg"), "image/jpeg")
        .when(ext == "png", "image/png")
        .when(ext == "mp4", "video/mp4")
        .otherwise(F.concat(F.lit("application/"), ext))
    )
    return raw.select(
        F.col("path").alias("media_ref"),
        media_type.alias("media_type"),
        ((F.abs(F.xxhash64("path", F.lit(1))) % 64) + 16)
        .cast("int").alias("width"),
        ((F.abs(F.xxhash64("path", F.lit(2))) % 64) + 16)
        .cast("int").alias("height"),
        F.length(F.col("content")).cast("int").alias("n_bytes"),
        F.col("content").alias("payload"),
    )


AUDIO_SCHEMA = (
    "media_ref string, win_idx int, n_windows int, "
    "sum_abs int, peak int, n_loud int"
)


def extract_audio_windows(audio: DataFrame, k: int = 4) -> DataFrame:
    """Audio window sampling — the third modality next to image decode
    (extract_media_features) and video frame sampling (sample_frames):
    k uniformly-spaced 1-second windows per audio row (``win_idx =
    i * n_windows div k``), each window's PCM decoded through the same
    pluggable codec and reduced to amplitude features (sum of absolute
    centered amplitude, peak, loud-sample count at |a| >= 64).

    The codec is STUBBED like every decoder here: window w of a payload
    decodes as ``_DECODER(payload + b":w:" + str(w), 16, 1)`` — 16
    uint8 samples standing in for one window of PCM; a real libsndfile/
    ffmpeg audio decoder drops in via ``register_decoder`` with the
    same per-window contract.  ``n_windows`` is an input column (real
    pipelines read duration from container metadata, not by decoding).

    Scale shape: identical to sample_frames — decode dominates, so rows
    hash-repartition before the kernel; sampling k of N windows bounds
    work per row, so a 10-hour podcast can't become a straggler task.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "media_ref": [], "win_idx": [], "n_windows": [],
                "sum_abs": [], "peak": [], "n_loud": [],
            }
            for ref, nw, payload in zip(
                pdf["media_ref"], pdf["n_windows"], pdf["payload"]
            ):
                for i in range(k):
                    w = (i * int(nw)) // k
                    samples = _DECODER(
                        bytes(payload) + f":w:{w}".encode(), 16, 1
                    ).reshape(-1).astype(np.int64)
                    a = np.abs(samples - 128)
                    out["media_ref"].append(ref)
                    out["win_idx"].append(w)
                    out["n_windows"].append(int(nw))
                    out["sum_abs"].append(int(a.sum()))
                    out["peak"].append(int(a.max()))
                    out["n_loud"].append(int((a >= 64).sum()))
            yield pd.DataFrame(
                {
                    "media_ref": pd.Series(out["media_ref"], dtype=object),
                    "win_idx": pd.Series(out["win_idx"], dtype="int32"),
                    "n_windows": pd.Series(out["n_windows"], dtype="int32"),
                    "sum_abs": pd.Series(out["sum_abs"], dtype="int32"),
                    "peak": pd.Series(out["peak"], dtype="int32"),
                    "n_loud": pd.Series(out["n_loud"], dtype="int32"),
                }
            )

    shaped = audio.repartition(F.pmod(F.xxhash64("media_ref"), F.lit(64)))
    return shaped.mapInPandas(run, schema=AUDIO_SCHEMA)
