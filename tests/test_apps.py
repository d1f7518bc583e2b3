"""CLI app smoke tests (in-process, tiny assets, CPU platform)."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    d = tmp_path_factory.mktemp("assets")
    from PIL import Image, ImageDraw
    img = Image.new("RGB", (96, 72), (70, 75, 85))
    dr = ImageDraw.Draw(img)
    dr.polygon([(12, 10), (60, 14), (56, 46), (16, 42)], fill=(200, 185, 160))
    png = str(d / "scene.png")
    img.save(png)

    import cv2
    vid = str(d / "v.avi")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"MJPG"), 10, (96, 72))
    rgb = np.asarray(img, np.uint8)
    for _ in range(4):
        w.write(rgb[..., ::-1].copy())
    w.release()
    return {"png": png, "vid": vid, "dir": str(d)}


def test_poly_app(assets, monkeypatch):
    monkeypatch.chdir(assets["dir"])
    from rectdetect_tpu.apps import poly
    assert poly.main(["poly", assets["png"], "0"]) == 0
    assert os.path.exists(os.path.join(assets["dir"], "output.png"))


def test_rect_app(assets):
    out = os.path.join(assets["dir"], "rect_out.jpg")
    from rectdetect_tpu.apps import rect
    assert rect.main(["rect", assets["png"], "0", out]) == 0
    assert os.path.exists(out)


def test_vidrect_app(assets, monkeypatch):
    monkeypatch.chdir(assets["dir"])
    out = os.path.join(assets["dir"], "vr.avi")
    from rectdetect_tpu.apps import vidrect
    assert vidrect.main(["vidrect", "0", assets["vid"], out, "72"]) == 0
    assert os.path.getsize(out) > 0


def test_vidrect_app_streams(assets, monkeypatch):
    monkeypatch.chdir(assets["dir"])
    out = os.path.join(assets["dir"], "vrs.avi")
    from rectdetect_tpu.apps import vidrect
    assert vidrect.main(["vidrect", "0", assets["vid"], out, "72",
                         "--streams=3"]) == 0
    assert os.path.getsize(out) > 0


def test_vidrect_app_tiles(assets, monkeypatch):
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    monkeypatch.chdir(assets["dir"])
    out = os.path.join(assets["dir"], "vrt.avi")
    from rectdetect_tpu.apps import vidrect
    assert vidrect.main(["vidrect", "0", assets["vid"], out, "72",
                         "--tiles=2"]) == 0
    assert os.path.getsize(out) > 0


def test_vidpoly_app(assets, monkeypatch):
    monkeypatch.chdir(assets["dir"])
    out = os.path.join(assets["dir"], "vp.avi")
    from rectdetect_tpu.apps import vidpoly
    assert vidpoly.main(["vidpoly", "0", assets["vid"], out]) == 0
    assert os.path.getsize(out) > 0


def test_videotest_app(assets):
    out = os.path.join(assets["dir"], "vt.avi")
    from rectdetect_tpu.apps import videotest
    assert videotest.main(["videotest", assets["vid"], out]) == 0
    assert os.path.getsize(out) > 0


def test_vidrect_app_trace(assets, monkeypatch, tmp_path):
    monkeypatch.chdir(assets["dir"])
    out = os.path.join(assets["dir"], "vtr.avi")
    trace = str(tmp_path / "trace")
    from rectdetect_tpu.apps import vidrect
    assert vidrect.main(["vidrect", "0", assets["vid"], out, "72",
                         f"--trace={trace}"]) == 0
    assert os.path.isdir(trace) and os.listdir(trace)


def test_vidrect_app_batched(assets, monkeypatch):
    monkeypatch.chdir(assets["dir"])
    out = os.path.join(assets["dir"], "vrb.avi")
    from rectdetect_tpu.apps import vidrect
    assert vidrect.main(["vidrect", "0", assets["vid"], out, "72",
                         "--batch=2"]) == 0
    assert os.path.getsize(out) > 0
