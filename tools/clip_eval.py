"""Run the vidrect detection loop over a real frame SEQUENCE and report
per-frame detection stability + fps — the reference's demo medium
(vidrect.cpp:159-205 prints fps once per second on a camera stream; this
records the equivalent table for a deterministic clip).

Metrics per clip:
  * detection rate: fraction of frames where each ground-truth quad is
    matched by an accepted rect within `tol` px per corner (best cyclic/
    reflected alignment, like tools/ab_parity.py);
  * temporal jitter: per-quad mean corner distance between CONSECUTIVE
    matched frames minus the ground-truth motion (how much the detector
    wobbles on top of the true motion);
  * steady-state fps through the enqueue/poll pipeline.

Usage: python tools/clip_eval.py [clip.avi] [n_frames] [--json=path]
  (no clip argument: synthesizes tools/make_clip.py's default in /tmp)
"""

from __future__ import annotations

import json
import math
import sys
import time

import numpy as np


def corner_err(a, b):
    """Min over cyclic/reflected alignments of the max corner distance."""
    best = np.inf
    for refl in (a, a[::-1]):
        for s in range(4):
            d = np.linalg.norm(np.roll(refl, s, 0) - b, axis=1).max()
            best = min(best, float(d))
    return best


def main():
    args = [a for a in sys.argv[1:]]
    json_path = None
    for a in list(args):
        if a.startswith("--json="):
            json_path = a.split("=", 1)[1]
            args.remove(a)
    clip = args[0] if args else None
    n_req = int(args[1]) if len(args) > 1 else 120

    sys.path.insert(0, ".")
    import cv2
    import jax

    from rectdetect_tpu.runtime.cache import enable_persistent_cache
    enable_persistent_cache()
    from tools.make_clip import write_clip, gt_corners
    from rectdetect_tpu.pipeline.video import VideoRectDetector
    from rectdetect_tpu.runtime.calibrate import load_calibrated_config

    if clip is None:
        clip = "/tmp/rectdetect_clip_720p.avi"
        write_clip(clip, 720, 1280, n_req)
    cap = cv2.VideoCapture(clip)
    assert cap.isOpened(), clip
    frames = []
    while len(frames) < n_req:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    cap.release()
    n = len(frames)
    h, w = frames[0].shape[:2]
    print(f"clip: {clip} {n} frames {w}x{h} "
          f"platform={jax.devices()[0].platform}", flush=True)

    cfg = load_calibrated_config(h, w, verbose=True)
    det = VideoRectDetector(math.tan(math.radians(72) / 2), cfg)

    # warmup/compile on frame 0
    det.enqueue(frames[0])
    det.poll()

    tol = 4.0
    per_frame = []
    t0 = time.perf_counter()
    det.enqueue(frames[0])
    for i in range(1, n):
        det.enqueue(frames[i])
        rects = det.poll()          # result for frame i-1
        per_frame.append(rects)
    per_frame.append(det.poll())
    dt = time.perf_counter() - t0
    fps = n / dt

    gts = [gt_corners(i, n, h, w) for i in range(n)]
    matched = np.zeros((n, 2), bool)
    match_err = np.full((n, 2), np.nan)
    match_c2 = [[None, None] for _ in range(n)]
    for i, rects in enumerate(per_frame):
        for q in range(2):
            best = np.inf
            bc = None
            for r in rects or []:
                e = corner_err(r["c2"][:, :2] if r["c2"].shape[1] > 2
                               else r["c2"], gts[i][q])
                if e < best:
                    best = e
                    bc = r["c2"]
            if best <= tol:
                matched[i, q] = True
                match_err[i, q] = best
                match_c2[i][q] = np.asarray(bc)

    jitters = [[], []]
    for q in range(2):
        for i in range(1, n):
            if matched[i, q] and matched[i - 1, q]:
                dmeas = np.abs(match_c2[i][q] - match_c2[i - 1][q]).mean()
                dtrue = np.abs(gts[i][q] - gts[i - 1][q]).mean()
                jitters[q].append(abs(dmeas - dtrue))

    out = {
        "clip": clip, "frames": n, "w": w, "h": h,
        "fps": round(fps, 2),
        "detect_rate": [round(float(matched[:, q].mean()), 3)
                        for q in range(2)],
        "mean_corner_err_px": [
            round(float(np.nanmean(match_err[:, q])), 3)
            if matched[:, q].any() else None for q in range(2)],
        "temporal_jitter_px": [
            round(float(np.mean(j)), 3) if j else None for j in jitters],
        "longest_gap": [int(max(np.diff(np.flatnonzero(
            np.concatenate([[True], matched[:, q], [True]]))).max() - 1,
            0)) if matched[:, q].any() else n for q in range(2)],
    }
    print(json.dumps(out))
    if json_path:
        with open(json_path, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
