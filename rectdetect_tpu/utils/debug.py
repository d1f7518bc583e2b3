"""Per-stage observability: render any intermediate tensor to PNG.

The reference's debugging story is ~10 commented-out visualization dumps
at pipeline points (oclrect.c:255-363: convert_bgr_labeli / _plab /
_lumaf).  Here the same three renderers are first-class, plus a stage
registry: `dump_dir` set -> every registered stage image is written as
<dir>/<NN>_<name>.png after the frame.

Renderers mirror the reference kernels:
  * label images  -> pseudocolor hash 1103515245*c+12345 (oclimgutil.cl:306)
  * packed Lab    -> BGR via the inverse conversion (lab2srgb)
  * float maps    -> normalized grayscale (convert_bgr_lumaf)
"""

from __future__ import annotations

import os
import pathlib

import numpy as np


def render_labels(label) -> np.ndarray:
    """Pseudocolor a label image (convert_bgr_labeli, oclimgutil.cl:298-321)."""
    lab = np.asarray(label).astype(np.int64)
    h = (lab * 1103515245 + 12345) & 0xFFFFFF
    out = np.stack([h & 255, (h >> 8) & 255, (h >> 16) & 255],
                   axis=-1).astype(np.uint8)
    out[lab <= 0] = 0
    return out


def render_packed_lab(packed) -> np.ndarray:
    import jax.numpy as jnp
    from rectdetect_tpu.core import color
    labf = color.unpack_labf(jnp.asarray(packed))
    return np.asarray(color.labf_to_bgr(labf))


def render_gray(img, scale: float | None = None) -> np.ndarray:
    x = np.asarray(img, np.float64)
    if scale is None:
        m = x.max()
        scale = 255.0 / m if m > 0 else 1.0
    g = np.clip(x * scale, 0, 255).astype(np.uint8)
    return np.stack([g, g, g], axis=-1)


class StageDumper:
    """Collects (name, kind, array) stage outputs and writes PNGs.

    kind in {"labels", "packed", "gray", "binary", "bgr"}.  Enabled by
    constructing with a directory (or RECTDETECT_DUMP env var); a None
    dir makes add() a no-op so production paths can call unconditionally.
    """

    def __init__(self, dump_dir: str | None = None):
        self.dir = dump_dir or os.environ.get("RECTDETECT_DUMP") or None
        self._stages: list[tuple[str, str, object]] = []

    @property
    def enabled(self) -> bool:
        return self.dir is not None

    def add(self, name: str, kind: str, array) -> None:
        if self.enabled:
            self._stages.append((name, kind, array))

    def flush(self, prefix: str = "") -> list[str]:
        if not self.enabled:
            return []
        pathlib.Path(self.dir).mkdir(parents=True, exist_ok=True)
        written = []
        for i, (name, kind, arr) in enumerate(self._stages):
            arr = np.asarray(arr)
            if kind == "labels":
                img = render_labels(arr)
            elif kind == "packed":
                img = render_packed_lab(arr)
            elif kind == "binary":
                img = render_gray(arr != 0, 255.0)
            elif kind == "bgr":
                img = arr.astype(np.uint8)
            else:
                img = render_gray(arr)
            path = os.path.join(self.dir, f"{prefix}{i:02d}_{name}.png")
            _write_png(path, img)
            written.append(path)
        self._stages.clear()
        return written


def _write_png(path: str, bgr: np.ndarray) -> None:
    try:
        import cv2
        cv2.imwrite(path, bgr)
    except ImportError:
        from PIL import Image
        Image.fromarray(bgr[..., ::-1]).save(path)
