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


@pytest.mark.slow
def test_vidrect_app_over_100_frame_clip(tmp_path):
    """The reference's demo medium is a video stream (vidrect.cpp:
    159-205); exercise the app loop over a real >=100-frame synthetic
    clip (tools/make_clip.py) and require sustained detection of the
    moving screen quad.  Runs in a subprocess: full-pipeline compiles
    count against the XLA:CPU accumulated-compile crash budget."""
    import subprocess
    import sys as _sys

    script = r"""
import sys
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")
import json, math
import numpy as np
from tools.make_clip import write_clip, gt_corners
from tools.clip_eval import corner_err
from rectdetect_tpu.pipeline.video import VideoRectDetector
from rectdetect_tpu.config import DEFAULT_CONFIG
import cv2

h, w, n = 120, 192, 104
clip = %(clip)r
write_clip(clip, h, w, n)
cap = cv2.VideoCapture(clip)
frames = []
while True:
    ok, f = cap.read()
    if not ok:
        break
    frames.append(f)
cap.release()
assert len(frames) == n, len(frames)
det = VideoRectDetector(math.tan(math.radians(72) / 2), DEFAULT_CONFIG)
res = []
det.enqueue(frames[0])
for i in range(1, n):
    det.enqueue(frames[i])
    res.append(det.poll())
res.append(det.poll())
hits = 0
for i, rects in enumerate(res):
    gt = gt_corners(i, n, h, w)[0]          # the screen quad
    if any(corner_err(r["c2"], gt) <= 4.0 for r in rects or []):
        hits += 1
print("HITS", hits, "OF", n)
assert hits >= int(0.7 * n), hits
print("CLIP_OK")
"""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    clip = str(tmp_path / "clip.avi")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    out = subprocess.run(
        [_sys.executable, "-c", script % {"repo": repo, "clip": clip}],
        env=env, capture_output=True, text=True, timeout=2400)
    assert out.returncode == 0, out.stderr[-3000:]
    assert "CLIP_OK" in out.stdout, out.stdout[-2000:]
