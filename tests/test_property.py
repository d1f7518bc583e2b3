"""Randomized property test: scenes of projected 3D rectangles at random
poses must be detected with accurate corners; golden pose agreement."""

import math

import numpy as np
import jax.numpy as jnp

from rectdetect_tpu.pipeline.rect import rect_frame, live_rects

W, H = 224, 168
TAN = math.tan(math.radians(72) / 2)


def project(center, yaw, pitch, w3, h3):
    f = (W / 2) / TAN
    u = np.array([math.cos(yaw), 0, -math.sin(yaw)])
    v = np.array([math.sin(yaw) * math.sin(pitch), math.cos(pitch),
                  math.cos(yaw) * math.sin(pitch)])
    c = np.asarray(center)
    pts = []
    for sx, sy in [(-1, -1), (1, -1), (1, 1), (-1, 1)]:
        q = c + u * sx * w3 / 2 + v * sy * h3 / 2
        pts.append((q[0] / q[2] * f + W / 2, -(q[1] / q[2]) * f + H / 2))
    return pts


def random_scene(seed):
    from PIL import Image, ImageDraw
    r = np.random.default_rng(seed)
    img = Image.new("RGB", (W, H), tuple(int(v) for v in
                                         r.integers(60, 100, 3)))
    d = ImageDraw.Draw(img)
    quads = []
    for i in range(2):
        yaw = float(r.uniform(-0.5, 0.5))
        pitch = float(r.uniform(-0.35, 0.35))
        cx = float(r.uniform(-0.55, 0.55)) * (1 - i) + (0.55 if i else -0.5)
        c = [cx, float(r.uniform(-0.2, 0.2)), float(r.uniform(2.4, 3.2))]
        q = project(c, yaw, pitch, float(r.uniform(0.8, 1.2)),
                    float(r.uniform(0.6, 0.9)))
        if all(10 < x < W - 10 and 10 < y < H - 10 for x, y in q):
            color = tuple(int(v) for v in r.integers(0, 256, 3))
            d.polygon(q, fill=color)
            quads.append(q)
    rgb = np.asarray(img, np.uint8)
    return jnp.asarray(rgb[..., ::-1].copy()), quads


def test_random_scenes_detected():
    found, total = 0, 0
    for seed in (11, 23, 37):
        bgr, quads = random_scene(seed)
        if not quads:
            continue
        res = rect_frame(bgr, TAN)
        screens = [r for r in live_rects(res) if r["status"] & 1]
        for q in quads:
            total += 1
            for r in screens:
                err = max(min(np.hypot(r["c2"][:, 0] - cx,
                                       r["c2"][:, 1] - cy))
                          for cx, cy in q)
                if err < 5.0:
                    found += 1
                    break
    assert total >= 4
    assert found >= total - 1, (found, total)
