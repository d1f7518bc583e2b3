"""Real-photograph test corpus builder (zero network egress).

The reference's quality bar is visual performance on real video
(README.md:11-14); synthetic rendered quads miss photographic texture,
JPEG artifacts and low-contrast edges.  This builds a corpus from the
real photographs shipped inside locally installed open-source packages
(scikit-learn's china/flower [CC-BY per its images/README.txt],
matplotlib's grace_hopper, pygame's webcam captures):

  * composites: a perspective-projected rectangle whose CONTENT is a
    real photo crop pasted over a real photo background, then JPEG
    round-tripped and lightly noised -> photographic statistics with
    EXACT ground-truth corners;
  * raws: the photos themselves (no ground truth; used for build-vs-
    proxy agreement and visual dumps).

Usage: python tools/photo_corpus.py [outdir] [n_composites]
Writes scene_XX.png + gt.json to outdir (default docs/photo_corpus/).
"""

from __future__ import annotations

import glob
import json
import os
import sys
import io

import numpy as np

SOURCES = [
    "/opt/venv/lib/python3.12/site-packages/sklearn/datasets/images/china.jpg",
    "/opt/venv/lib/python3.12/site-packages/sklearn/datasets/images/flower.jpg",
    "/opt/venv/lib/python3.12/site-packages/matplotlib/mpl-data/sample_data/"
    "grace_hopper.jpg",
    "/opt/venv/lib/python3.12/site-packages/pygame/docs/generated/_images/"
    "camera_rgb.jpg",
    "/opt/venv/lib/python3.12/site-packages/pygame/docs/generated/_images/"
    "camera_background.jpg",
]


def _find_sources():
    out = []
    for pat in SOURCES:
        hits = glob.glob(pat)
        if hits:
            out.append(hits[0])
        else:
            # fall back to a site-packages-wide search by basename
            base = os.path.basename(pat)
            for root in sys.path:
                hits = glob.glob(os.path.join(root, "**", base),
                                 recursive=True)
                if hits:
                    out.append(hits[0])
                    break
    return out


def load_photos():
    from PIL import Image
    photos = []
    for p in _find_sources():
        im = Image.open(p).convert("RGB")
        photos.append((os.path.basename(p), im))
    return photos


def _find_coeffs(dst, src):
    """PIL PERSPECTIVE coeffs mapping OUTPUT quad `dst` from INPUT
    rectangle corners `src` (standard 8-parameter DLT solve)."""
    A = []
    for (x, y), (u, v) in zip(dst, src):
        A.append([x, y, 1, 0, 0, 0, -u * x, -u * y])
        A.append([0, 0, 0, x, y, 1, -v * x, -v * y])
    A = np.asarray(A, np.float64)
    b = np.asarray([c for uv in src for c in uv], np.float64)
    return np.linalg.solve(A, b)


def _random_quad(rng, w, h):
    """Convex quad with margin, moderate perspective, min side length."""
    for _ in range(100):
        cx = rng.uniform(0.3, 0.7) * w
        cy = rng.uniform(0.3, 0.7) * h
        sw = rng.uniform(0.18, 0.34) * w
        sh = rng.uniform(0.18, 0.34) * h
        base = np.array([[-sw, -sh], [sw, -sh], [sw, sh], [-sw, sh]],
                        np.float64)
        th = rng.uniform(0, np.pi)
        R = np.array([[np.cos(th), -np.sin(th)],
                      [np.sin(th), np.cos(th)]])
        q = base @ R.T
        q += rng.uniform(-0.15, 0.15, (4, 2)) * [sw, sh]  # perspective-ish
        q += [cx, cy]
        if q[:, 0].min() < 8 or q[:, 1].min() < 8 or \
           q[:, 0].max() > w - 8 or q[:, 1].max() > h - 8:
            continue
        # convexity + min side
        ok = True
        for i in range(4):
            a, b, c = q[i], q[(i + 1) % 4], q[(i + 2) % 4]
            cross = (b[0] - a[0]) * (c[1] - b[1]) - \
                    (b[1] - a[1]) * (c[0] - b[0])
            if cross <= 0 or np.linalg.norm(b - a) < 0.12 * min(w, h):
                ok = False
                break
        if ok:
            return q
    raise RuntimeError("no quad found")


def make_scene(photos, seed, w=448, h=336):
    """-> (bgr uint8 (h,w,3), gt corners (4,2) in xy image coords)."""
    from PIL import Image, ImageFilter
    rng = np.random.default_rng(seed)

    bg_name, bg = photos[seed % len(photos)]
    fg_name, fg = photos[(seed + 1 + seed // len(photos)) % len(photos)]

    # random background crop at target aspect
    bw, bh = bg.size
    cw = int(min(bw, bh * w / h) * rng.uniform(0.7, 1.0))
    ch = int(cw * h / w)
    x0 = rng.integers(0, max(1, bw - cw))
    y0 = rng.integers(0, max(1, bh - ch))
    scene = bg.crop((x0, y0, x0 + cw, y0 + ch)).resize((w, h),
                                                       Image.BILINEAR)

    quad = _random_quad(rng, w, h)
    # content: a crop of the fg photo, slightly darkened/lightened so
    # contrast against the background varies (low-contrast cases are
    # the interesting regime)
    fw, fh = fg.size
    s = rng.uniform(0.5, 0.95)
    fx0 = rng.integers(0, max(1, int(fw * (1 - s))))
    fy0 = rng.integers(0, max(1, int(fh * (1 - s))))
    content = fg.crop((fx0, fy0, fx0 + int(fw * s), fy0 + int(fh * s)))
    content = content.resize((w, h), Image.BILINEAR)
    gain = rng.uniform(0.55, 1.35)
    content = Image.fromarray(
        np.clip(np.asarray(content, np.float32) * gain, 0,
                255).astype(np.uint8))

    coeffs = _find_coeffs(quad, [(0, 0), (w, 0), (w, h), (0, h)])
    warped = content.transform((w, h), Image.PERSPECTIVE, tuple(coeffs),
                               Image.BILINEAR)
    mask = Image.new("L", (w, h), 0)
    from PIL import ImageDraw
    ImageDraw.Draw(mask).polygon([tuple(p) for p in quad], fill=255)
    mask = mask.filter(ImageFilter.GaussianBlur(0.5))   # soft edge like optics
    scene.paste(warped, (0, 0), mask)
    if seed % 2 == 0:
        # half the composites get a bezel (screens, framed photos,
        # signs all have one; the borderless half is the hard tail —
        # content pasted straight onto photo background)
        dark = rng.random() < 0.7
        c = int(rng.integers(10, 55)) if dark else int(
            rng.integers(200, 250))
        bez = ImageDraw.Draw(scene)
        pts = [tuple(p) for p in quad] + [tuple(quad[0])]
        bez.line(pts, fill=(c, c, c), width=int(rng.integers(2, 5)),
                 joint="curve")

    # camera pipeline artifacts: slight blur, JPEG, sensor noise
    if rng.random() < 0.5:
        scene = scene.filter(ImageFilter.GaussianBlur(rng.uniform(0.3, 0.8)))
    buf = io.BytesIO()
    scene.save(buf, "JPEG", quality=int(rng.integers(55, 92)))
    scene = Image.open(buf).convert("RGB")
    arr = np.asarray(scene).astype(np.int16)
    arr = arr + rng.integers(-3, 4, arr.shape, dtype=np.int16)
    rgb = arr.clip(0, 255).astype(np.uint8)
    bgr = rgb[:, :, ::-1].copy()
    return bgr, quad, (bg_name, fg_name)


def build_corpus(outdir, n=20, w=448, h=336):
    from PIL import Image
    os.makedirs(outdir, exist_ok=True)
    photos = load_photos()
    if len(photos) < 2:
        raise SystemExit("no source photos found in installed packages")
    gt = {}
    for seed in range(n):
        bgr, quad, names = make_scene(photos, seed, w, h)
        name = f"scene_{seed:02d}.png"
        Image.fromarray(bgr[:, :, ::-1]).save(os.path.join(outdir, name))
        gt[name] = {"corners_xy": np.asarray(quad).round(2).tolist(),
                    "sources": names}
    # raw photos, letterboxed to the eval size
    for pname, im in photos:
        iw, ih = im.size
        sc = min(w / iw, h / ih)
        rs = im.resize((int(iw * sc), int(ih * sc)), Image.BILINEAR)
        canvas = Image.new("RGB", (w, h), (24, 24, 24))
        canvas.paste(rs, ((w - rs.size[0]) // 2, (h - rs.size[1]) // 2))
        name = f"raw_{os.path.splitext(pname)[0]}.png"
        canvas.save(os.path.join(outdir, name))
        gt[name] = {"corners_xy": None, "sources": [pname]}
    with open(os.path.join(outdir, "gt.json"), "w") as f:
        json.dump(gt, f, indent=1)
    print(f"wrote {n} composites + {len(photos)} raw photos to {outdir}")


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(__file__), "..", "docs", "photo_corpus")
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    build_corpus(outdir, n)
