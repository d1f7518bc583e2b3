"""Deterministic synthetic 720p video clip for the vidrect/vidpoly demo
medium (the reference's demo is a 1280x720 camera stream, README.md:52-54;
BASELINE names a vidpoly-on-a-clip config).

Zero egress: the clip is rendered procedurally — two textured
perspective quads (a slowly rotating "screen" and a translating card)
over a gradient background with fixed-seed sensor noise and a gentle
camera pan, so every frame has known-ish ground truth (the quads stay
on screen and rigid) and the scene class matches the bench frame.

Usage: python tools/make_clip.py [out.avi] [HxW] [n_frames]
"""

from __future__ import annotations

import sys

import numpy as np


def quad_at(t: float, kind: str, h: int, w: int) -> np.ndarray:
    """4 corner points (x, y) of a moving quad at time t in [0, 1)."""
    if kind == "screen":
        cx, cy = 0.32 * w + 0.04 * w * np.sin(2 * np.pi * t), 0.42 * h
        ww, hh = 0.34 * w, 0.42 * h
        a = 0.12 * np.sin(2 * np.pi * t)           # rotation
        p = 0.10 + 0.06 * np.cos(2 * np.pi * t)    # perspective pinch
        base = np.array([[-ww / 2, -hh / 2], [ww / 2, -hh / 2],
                         [ww / 2, hh / 2], [-ww / 2, hh / 2]])
        rot = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])
        pts = base @ rot.T
        pts[0] *= (1 - p)
        pts[1] *= (1 - p * 0.5)
        return pts + (cx, cy)
    cx = 0.70 * w + 0.06 * w * np.cos(2 * np.pi * t)
    cy = 0.55 * h + 0.10 * h * np.sin(4 * np.pi * t)
    ww, hh = 0.20 * w, 0.26 * h
    sh = 0.18 * np.sin(2 * np.pi * t + 1.0)
    return np.array([[cx - ww / 2 + sh * ww, cy - hh / 2],
                     [cx + ww / 2 + sh * ww, cy - hh / 2],
                     [cx + ww / 2 - sh * ww, cy + hh / 2],
                     [cx - ww / 2 - sh * ww, cy + hh / 2]])


def render_frame(i: int, n: int, h: int, w: int) -> np.ndarray:
    import cv2
    t = i / n
    rng = np.random.default_rng(1234 + i)          # per-frame fixed seed
    yy, xx = np.mgrid[0:h, 0:w]
    pan = int(20 * np.sin(2 * np.pi * t))
    bg = np.stack([60 + ((xx + pan) * 40 // w),
                   80 + (yy * 30 // h),
                   70 + ((xx + yy + pan) * 25 // (h + w))],
                  axis=-1).astype(np.uint8)
    img = bg.copy()
    for kind, col in (("screen", (40, 60, 200)), ("card", (190, 160, 60))):
        pts = quad_at(t, kind, h, w).astype(np.int32)
        cv2.fillPoly(img, [pts], col)
        # interior texture so the quad face is not flat (screen content)
        if kind == "screen":
            inner = (pts * 0.82 + pts.mean(0) * 0.18).astype(np.int32)
            cv2.fillPoly(img, [inner], (90, 110, 230))
    noise = rng.integers(-4, 5, img.shape, dtype=np.int16)
    return np.clip(img.astype(np.int16) + noise, 0, 255).astype(np.uint8)


def write_clip(path: str, h: int = 720, w: int = 1280,
               n_frames: int = 120, fps: float = 30.0) -> str:
    import cv2
    four = cv2.VideoWriter_fourcc(*"MJPG")
    vw = cv2.VideoWriter(path, four, fps, (w, h))
    assert vw.isOpened(), path
    for i in range(n_frames):
        vw.write(render_frame(i, n_frames, h, w))
    vw.release()
    return path


def gt_corners(i: int, n: int, h: int, w: int):
    return [quad_at(i / n, "screen", h, w), quad_at(i / n, "card", h, w)]


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "clip_720p.avi"
    res = sys.argv[2] if len(sys.argv) > 2 else "720x1280"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 120
    h, w = (int(v) for v in res.split("x"))
    write_clip(path, h, w, n)
    print(f"wrote {path}: {n} frames {w}x{h}")


if __name__ == "__main__":
    main()
