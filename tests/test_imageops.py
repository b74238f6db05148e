"""F8 pad / A4 bg-mode / S2 render / S5 binaryFile source / S8 SVG sink."""

import numpy as np
import pytest

from latyas_spark.core import imageops as io


def test_pad_geometry_clamp_small():
    # 50x40 -> 2x = 100x80 -> +320 margin = 420x400 -> clamped to 800
    g = io.pad_geometry(50, 40)
    assert g == {
        "padded_w": 420, "padded_h": 400, "bg_w": 800, "bg_h": 800,
        "x_off": (800 - 420) // 2, "y_off": (800 - 400) // 2,
    }


def test_pad_geometry_no_clamp():
    g = io.pad_geometry(400, 300)
    assert g["padded_w"] == 1120 and g["bg_w"] == 1120
    assert g["bg_h"] == 920 and g["x_off"] == 0 and g["y_off"] == 0


def test_small_image_padding_shape_and_placement():
    raster = np.full((40, 50), 7, np.uint8)
    out = io.small_image_padding(raster)
    g = io.pad_geometry(50, 40)
    assert out.shape == (g["bg_h"], g["bg_w"])
    # corners are canvas white
    assert out[0, 0] == 255 and out[-1, -1] == 255
    # constant image survives blur: interior of the placed region == 7
    cy, cx = g["bg_h"] // 2, g["bg_w"] // 2
    assert out[cy, cx] == 7
    # margin band is white (margin starts at offset, image at offset+160)
    assert out[g["y_off"] + 1, g["x_off"] + 1] == 255


def test_box_blur_preserves_constant_and_rounds():
    r = np.full((10, 12), 123, np.uint8)
    assert (io._box_blur(r, 5) == 123).all()
    # impulse spreads to a 5x5 neighborhood mean (25*? -> rint)
    imp = np.zeros((9, 9), np.uint8)
    imp[4, 4] = 250
    out = io._box_blur(imp, 5)
    assert out[4, 4] == 10 and out[0, 0] == 0


def test_bg_color_mode_tie_and_majority():
    r = np.arange(16, dtype=np.uint8).reshape(4, 4)
    # corners 0, 3, 12, 15: all distinct -> first corner wins the tie
    assert io.bg_color_mode(r) == 0
    r2 = r.copy()
    r2[0, -1] = 15  # corners 0, 15, 12, 15 -> 15 has count 2
    assert io.bg_color_mode(r2) == 15


def test_fake_render_deterministic():
    w, h, p = io.render_one("doc-x", 3)
    w2, h2, p2 = io.render_one("doc-x", 3)
    assert (w, h) == (1224, 1584) and p == p2 and len(p) == 16
    assert io.render_one("doc-x", 4)[2] != p


def test_render_pages_spark(spark):
    from latyas_spark.relational.multimodal import render_pages

    pages = spark.createDataFrame(
        [("d1", 0), ("d1", 1), ("d2", 0), ("d1", 0)], "doc_id string, page int"
    )
    out = render_pages(pages).toPandas().sort_values(["doc_id", "page"])
    assert len(out) == 3  # distinct pages
    assert (out["width"] == 1224).all() and (out["height"] == 1584).all()
    assert (out["scale"] == 2).all()
    # deterministic payloads
    out2 = render_pages(pages).toPandas().sort_values(["doc_id", "page"])
    assert [bytes(b) for b in out["payload"]] == [
        bytes(b) for b in out2["payload"]
    ]


def test_read_media_dir(spark, tmp_path):
    from latyas_spark.relational.multimodal import read_media_dir

    (tmp_path / "a.png").write_bytes(b"\x89PNG fake")
    (tmp_path / "b.jpg").write_bytes(b"\xff\xd8 jpeg bytes.")
    out = read_media_dir(spark, str(tmp_path)).toPandas()
    out = out.sort_values("media_ref").reset_index(drop=True)
    assert len(out) == 2
    assert out["media_type"].tolist() == ["image/png", "image/jpeg"]
    assert out["n_bytes"].tolist() == [9, 14]
    assert (out["width"] >= 16).all() and (out["height"] >= 16).all()


def test_svg_overlay_exact(spark):
    from latyas_spark.pipeline.sinks import svg_overlay

    blocks = spark.createDataFrame(
        [
            ("d", 0, 0, 10.0, 20.0, 110.0, 60.0, "text"),
            ("d", 0, 1, 5.0, 100.0, 205.0, 180.0, "figure"),
        ],
        "doc_id string, page int, offset int, x1 double, y1 double,"
        " x2 double, y2 double, kind string",
    )
    svg = svg_overlay(blocks).first()["svg"]
    assert svg == (
        '<svg xmlns="http://www.w3.org/2000/svg" width="205" height="180">'
        '<rect x="10" y="20" width="100" height="40" fill="none"'
        ' stroke="rgb(255,0,0)" stroke-width="2"/>'
        '<text x="110" y="20" fill="rgb(255,0,0)" font-size="16">text-0</text>'
        '<rect x="5" y="100" width="200" height="80" fill="none"'
        ' stroke="rgb(255,165,0)" stroke-width="2"/>'
        '<text x="205" y="100" fill="rgb(255,165,0)" font-size="16">'
        "figure-1</text></svg>"
    )


def test_register_resampler_swap():
    called = {}

    def up(r):
        called["up"] = True
        return np.repeat(np.repeat(r, 2, 0), 2, 1)

    def blur(r, k):
        called["blur"] = k
        return r

    old_up, old_blur = io._RESAMPLER, io._BLUR
    try:
        io.register_resampler(up, blur)
        io.small_image_padding(np.zeros((4, 4), np.uint8))
        assert called == {"up": True, "blur": 5}
    finally:
        io.register_resampler(old_up, old_blur)
