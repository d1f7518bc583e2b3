"""Corner-parity / accuracy report on randomized projected-rectangle
scenes (the BASELINE.md parity metric, measured against ground truth —
the reference itself is buffer-level nondeterministic, SURVEY.md §4, so
corner SETS are the comparison unit).

For each scene: render quads with known corners, run the full rect
pipeline, greedily match detections to ground truth, report the hit
rate and corner error distribution.  Runs on whatever platform is live.

Measured on CPU (24 scenes, 168x224): 90.9% of isolated quads at mean
0.93 px corner error; the misses are marginal-NMS cases (the strict
thinthres comparisons sit on f32 rounding for weak-contrast edges — the
same sensitivity the reference's thinning has, oclimgutil.cl:456-491;
any single compiled program is deterministic about them).

Usage: python tools/parity_report.py [n_scenes] [HxW]
"""

from __future__ import annotations

import math
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    args = [a for a in sys.argv[1:] if a != "--extended"]
    extended = "--extended" in sys.argv
    n_scenes = int(args[0]) if len(args) > 0 else 24
    res = args[1] if len(args) > 1 else "168x224"
    h, w = (int(v) for v in res.split("x"))

    import jax
    import jax.numpy as jnp
    from rectdetect_tpu.runtime.cache import enable_persistent_cache
    enable_persistent_cache()
    import tests.test_property as tp

    tp.W, tp.H = w, h            # scene generator resolution
    from rectdetect_tpu.config import DEFAULT_CONFIG, EXTENDED_CONFIG
    from rectdetect_tpu.pipeline.rect import rect_frame, live_rects
    cfg = EXTENDED_CONFIG if extended else DEFAULT_CONFIG
    tan = math.tan(math.radians(72) / 2)
    print(f"platform={jax.devices()[0].platform} {h}x{w} "
          f"scenes={n_scenes} config="
          f"{'extended' if extended else 'faithful'}", flush=True)

    def corner_err(c2, quad):
        """Min-over-cyclic-alignment mean corner distance."""
        g = np.asarray(quad, np.float32)
        best = np.inf
        for s in range(4):
            for flip in (1, -1):
                idx = [(s + flip * k) % 4 for k in range(4)]
                d = np.linalg.norm(c2 - g[idx], axis=1).mean()
                best = min(best, float(d))
        return best

    def _mask(q, pad=2):
        from PIL import Image, ImageDraw
        im = Image.new("1", (w + 2 * pad, h + 2 * pad))
        ImageDraw.Draw(im).polygon([(x + pad, y + pad) for x, y in q],
                                   fill=1, outline=1, width=1 + pad)
        return np.asarray(im)

    def occluded(q, later_quads):
        """A quad drawn before another that overlaps/touches it is
        partially hidden or edge-corrupted — no longer a clean 4-sided
        rectangle in the image (the reference cannot detect those
        either: no occlusion reasoning, 4 visible sides required,
        oclrect.c:1148).  Rasterized dilated-overlap test."""
        m = _mask(q)
        return any((m & _mask(o)).any() for o in later_quads)

    n_quads = n_hit = n_spurious = n_occluded = 0
    n_iso = n_iso_hit = 0
    errs = []
    for seed in range(n_scenes):
        frame, quads = tp.random_scene(seed)
        vis = []
        for i, q in enumerate(quads):
            if occluded(list(q), [list(o) for o in quads[i + 1:]]):
                n_occluded += 1
                continue
            others = [list(o) for j, o in enumerate(quads) if j != i]
            vis.append((q, not occluded(list(q), others)))
        dets = live_rects(rect_frame(jnp.asarray(frame), tan, cfg))
        used = set()
        for q, isolated in vis:
            n_quads += 1
            n_iso += int(isolated)
            cand = [(corner_err(np.asarray(d["c2"]), q), i)
                    for i, d in enumerate(dets) if i not in used]
            if cand:
                e, i = min(cand)
                if e <= 3.0:
                    n_hit += 1
                    n_iso_hit += int(isolated)
                    used.add(i)
                    errs.append(e)
        # distinct unmatched detection GROUPS (A/B sources duplicate)
        rest = [np.sort(np.asarray(dets[i]["c2"]), axis=0)
                for i in range(len(dets)) if i not in used]
        uniq = []
        for c in rest:
            if not any(np.abs(c - u).max() < 2.0 for u in uniq):
                uniq.append(c)
        n_spurious += len(uniq)

    errs = np.asarray(errs) if errs else np.zeros(1)
    print(f"occluded (skipped) : {n_occluded}")
    print(f"ground-truth quads : {n_quads}")
    print(f"detected (<=3 px)  : {n_hit}  ({100.0 * n_hit / max(n_quads, 1):.1f}%)")
    print(f"isolated quads     : {n_iso_hit}/{n_iso}  "
          f"({100.0 * n_iso_hit / max(n_iso, 1):.1f}%)  "
          "(touching/overlapping structures break the shared "
          "4-visible-sides assumption)")
    print(f"spurious groups    : {n_spurious}")
    print(f"corner err px      : mean {errs.mean():.3f}  p50 "
          f"{np.percentile(errs, 50):.3f}  p95 {np.percentile(errs, 95):.3f}"
          f"  max {errs.max():.3f}")


if __name__ == "__main__":
    main()
