"""Shared CLI plumbing: device selection, image/video IO, drawing.

CLI conventions mirror the reference tools (rect.cpp:48-58,
vidrect.cpp:51-123): positional args, `cam:<id>,<w>,<h>` camera inputs,
`-` for window output, device list printed on missing args."""

from __future__ import annotations

import sys

import numpy as np


def pick_device(did: int):
    """Select jax device by index (the reference's OpenCL device number,
    oclhelper.c:171-196) and print its name like rect.cpp:61."""
    import jax
    from rectdetect_tpu.runtime.cache import enable_persistent_cache
    enable_persistent_cache()
    devs = jax.devices()
    if did < 0 or did >= len(devs):
        print_devices()
        sys.exit(-1)
    dev = devs[did]
    print(dev.device_kind)
    return dev


def print_devices():
    import jax
    sys.stderr.write("\nAvailable JAX Devices :\n")
    for i, d in enumerate(jax.devices()):
        sys.stderr.write(f"  {i} : {d.device_kind} ({d.platform})\n")


def load_image_bgr(path: str) -> np.ndarray:
    try:
        import cv2
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            sys.exit(f"Could not load {path}")
        return img
    except ImportError:
        from PIL import Image
        rgb = np.asarray(Image.open(path).convert("RGB"), np.uint8)
        return rgb[..., ::-1].copy()


def save_image_bgr(path: str, bgr: np.ndarray) -> None:
    try:
        import cv2
        cv2.imwrite(path, bgr)
    except ImportError:
        from PIL import Image
        Image.fromarray(bgr[..., ::-1]).save(path)


def open_capture(spec: str | None):
    """VideoCapture from a file path, `cam:<id>,<w>,<h>`, or default cam 0
    (vidrect.cpp:64-89)."""
    import cv2
    if spec is None:
        cap = cv2.VideoCapture(0)
    elif spec.startswith("cam:"):
        parts = (spec[4:] + ",0,0").split(",")
        n, w, h = int(parts[0]), int(parts[1]), int(parts[2])
        cap = cv2.VideoCapture(n)
        if cap.isOpened() and w and h:
            cap.set(cv2.CAP_PROP_FRAME_WIDTH, w)
            cap.set(cv2.CAP_PROP_FRAME_HEIGHT, h)
    else:
        cap = cv2.VideoCapture(spec)
    if not cap.isOpened():
        sys.exit(f"Cannot open {spec!r}")
    return cap


def open_writer(path: str, iw: int, ih: int, fps: float = 30.0):
    import cv2
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"PIM1"), fps,
                             (iw, ih), True)
    if not writer.isOpened():
        # PIM1 (mpeg1) may be unavailable; fall back to mp4v
        writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                                 fps, (iw, ih), True)
    if not writer.isOpened():
        sys.exit(f"Cannot open writer {path}")
    return writer


def draw_rect(img, c2, color, thickness: int):
    """showRect (rect.cpp:33-46): 4 sides + both diagonals."""
    import cv2
    pts = [(int(round(x)), int(round(y))) for x, y in c2]
    for i in range(4):
        cv2.line(img, pts[i], pts[(i + 1) % 4], color, thickness)
    cv2.line(img, pts[0], pts[2], color, 1)
    cv2.line(img, pts[1], pts[3], color, 1)


# status -> (BGR color, thickness); rect.cpp:107-121 / vidrect.cpp:174-189.
# (OpenCV Scalar order in the reference calls is (r,g,b) passed to Scalar,
# which OpenCV treats as (B,G,R) — we reproduce the *displayed* colors.)
RECT_STYLE_STILL = {0: ((255, 0, 0), 1), 2: ((255, 0, 0), 1),
                    1: ((0, 200, 255), 2), 3: ((0, 0, 255), 2)}
RECT_STYLE_VIDEO = {0: ((0, 255, 0), 1), 2: ((255, 0, 0), 1),
                    1: ((0, 200, 255), 2), 3: ((0, 0, 255), 2)}


def draw_rects(img, rects, style):
    for r in rects:
        color, th = style.get(r["status"], ((255, 255, 255), 1))
        draw_rect(img, r["c2"], color, th)


def draw_segments(img, segs, alternating: bool):
    """poly.cpp:137-154: walk each polyline from its head, alternating
    segment colors; vidpoly draws plain white (vidpoly.cpp:183-189)."""
    import cv2
    by_id = {s["id"]: s for s in segs}
    drawn = set()
    heads = [g for g, s in by_id.items() if s["left"] <= 0]
    for g in heads:
        cnt = 0
        j = g
        while j > 0 and j not in drawn and j in by_id:
            s = by_id[j]
            drawn.add(j)
            color = ((100, 100, 255) if (cnt & 1) else (255, 255, 100)) \
                if alternating else (255, 255, 255)
            cv2.line(img, (int(round(s["x0"])), int(round(s["y0"]))),
                     (int(round(s["x1"])), int(round(s["y1"]))), color, 1)
            j = s["right"]
            cnt += 1
