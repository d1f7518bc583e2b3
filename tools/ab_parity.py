"""A/B parity harness: golden reference proxy vs the TPU build.

Engine A is golden.rect.rect_frame — the loop-level transcription of
every reference kernel composed end-to-end (the container has no OpenCL
vendor ICD, so /root/reference cannot execute; A is its deterministic
stand-in; oracle writers: rect.cpp:122, poly.cpp:156).  Engine B is
rectdetect_tpu.pipeline.rect.rect_frame with the reference-faithful
default config.

Per SURVEY.md §4's tolerance definition, the comparison is between
ACCEPTED RECTANGLE CORNER SETS (deduped across hypothesis duplicates),
not internal buffers: both engines are deterministic, but ids and group
order differ by design.  A matched pair = mean corner distance <= tol
(2 px) under the best cyclic/reflected vertex alignment.

Usage:  python tools/ab_parity.py [n_scenes] [--procs=N] [--extended]
Writes a markdown table to stdout and a JSON blob to
docs/ab_parity.json.
"""

import json
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

TAN = math.tan(math.radians(72) / 2)
TOL = 2.0


def corner_err(a, b):
    """Best mean corner distance over cyclic shifts + reflection."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    best = np.inf
    for s in range(4):
        for f in (1, -1):
            idx = [(s + f * k) % 4 for k in range(4)]
            best = min(best, float(np.linalg.norm(a - b[idx],
                                                  axis=1).mean()))
    return best


def dedupe(quads, tol=3.0):
    out = []
    for q in quads:
        if all(corner_err(q, o) > tol for o in out):
            out.append(np.asarray(q, np.float64))
    return out


def match_sets(a_set, b_set, tol=TOL):
    """Greedy one-to-one matching; returns (n_matched, a_only, b_only)."""
    used = [False] * len(b_set)
    matched = 0
    for qa in a_set:
        errs = [corner_err(qa, qb) if not used[j] else np.inf
                for j, qb in enumerate(b_set)]
        if errs and min(errs) <= tol:
            used[int(np.argmin(errs))] = True
            matched += 1
    return matched, len(a_set) - matched, used.count(False)


def one_scene(args):
    seed, w, h, extended = args
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    import jax
    jax.config.update("jax_platforms", "cpu")
    import tests.test_property as tp
    import golden.rect as grect
    from rectdetect_tpu.config import DEFAULT_CONFIG, EXTENDED_CONFIG
    from rectdetect_tpu.pipeline.rect import rect_frame, live_rects

    tp.W, tp.H = w, h
    frame, gt = tp.random_scene(seed)
    bgr = np.asarray(frame)

    a_rects = grect.rect_frame(bgr, TAN)
    a_set = dedupe([r["c2"] for r in a_rects])

    cfg = EXTENDED_CONFIG if extended else DEFAULT_CONFIG
    res = rect_frame(frame, TAN, cfg)
    b_set = dedupe([r["c2"] for r in live_rects(res)])

    n_ab, a_only, b_only = match_sets(a_set, b_set)
    gt_a = sum(1 for q in gt if any(corner_err(q, d) <= TOL
                                    for d in a_set))
    gt_b = sum(1 for q in gt if any(corner_err(q, d) <= TOL
                                    for d in b_set))
    return {"seed": seed, "gt": len(gt), "a": len(a_set),
            "b": len(b_set), "ab_matched": n_ab, "a_only": a_only,
            "b_only": b_only, "gt_hit_a": gt_a, "gt_hit_b": gt_b}


def main(argv):
    n = next((int(a) for a in argv[1:] if a.isdigit()), 20)
    procs = next((int(a.split("=")[1]) for a in argv if
                  a.startswith("--procs=")), 4)
    extended = "--extended" in argv
    w, h = 448, 336
    jobs = [(seed, w, h, extended) for seed in range(n)]

    import multiprocessing as mp
    # per-task process recycling: scene workers accumulate full-pipeline
    # compiles and XLA:CPU segfaults past ~90 in one process (CLAUDE.md)
    with mp.get_context("spawn").Pool(procs,
                                      maxtasksperchild=2) as pool:
        rows = pool.map(one_scene, jobs)

    tot = {k: sum(r[k] for r in rows) for k in
           ("gt", "a", "b", "ab_matched", "a_only", "b_only",
            "gt_hit_a", "gt_hit_b")}
    print(f"| seed | gt | A(ref-proxy) | B(build) | A∩B≤{TOL}px | "
          "A-only | B-only | gt hit A | gt hit B |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['seed']} | {r['gt']} | {r['a']} | {r['b']} | "
              f"{r['ab_matched']} | {r['a_only']} | {r['b_only']} | "
              f"{r['gt_hit_a']} | {r['gt_hit_b']} |")
    print(f"| **tot** | {tot['gt']} | {tot['a']} | {tot['b']} | "
          f"{tot['ab_matched']} | {tot['a_only']} | {tot['b_only']} | "
          f"{tot['gt_hit_a']} | {tot['gt_hit_b']} |")
    agree = tot["ab_matched"] / max(1, max(tot["a"], tot["b"]))
    print(f"\ncorner-set agreement (matched / max(|A|,|B|)): "
          f"{agree:.1%}")
    out = {"tol_px": TOL, "scenes": rows, "totals": tot,
           "agreement": agree,
           "config": "extended" if extended else "faithful"}
    with open(os.path.join(os.path.dirname(__file__), "..", "docs",
                           "ab_parity.json"), "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
