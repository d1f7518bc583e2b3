"""Build-vs-proxy A/B on the real-photograph corpus (tools/photo_corpus.py).

Same acceptance semantics as tools/ab_parity.py (accepted corner sets,
best cyclic/reflected alignment), but the scenes are real photographs:
composites carry exact ground-truth corners; raw photos have no ground
truth and report proxy/build agreement only.

Usage: python tools/photo_parity.py [--procs=N] [--corpus=DIR] [--tol=PX]
Writes docs/photo_parity.json and a markdown table to stdout.
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

from tools.ab_parity import corner_err, dedupe, match_sets

TAN = math.tan(math.radians(72) / 2)
TOL = 3.0   # photographic edges localize a bit looser than clean renders


def one_image(args):
    path, gt_corners, tol = args
    os.environ["PALLAS_AXON_POOL_IPS"] = ""
    import dataclasses
    import tempfile

    import jax
    jax.config.update("jax_platforms", "cpu")
    from PIL import Image
    import golden.rect as grect
    from rectdetect_tpu.config import DEFAULT_CONFIG
    from rectdetect_tpu.pipeline.rect import rect_frame, live_rects
    from rectdetect_tpu.runtime.calibrate import calibrate

    rgb = np.asarray(Image.open(path).convert("RGB"))
    bgr = rgb[:, :, ::-1].copy()

    a_rects = grect.rect_frame(bgr, TAN)
    a_set = dedupe([r["c2"] for r in a_rects])
    import jax.numpy as jnp
    # production behavior (apps.rect): no plan exists for this
    # resolution -> calibrate capacities on the image itself (the
    # reference allocates dynamically; calibration is the static-shape
    # equivalent, and the photo corpus is exactly the scene class whose
    # group/arc demand the synthetic defaults under-cover)
    with tempfile.TemporaryDirectory() as td:
        cfg = calibrate([jnp.asarray(bgr)],
                        plan_path=os.path.join(td, "plan.txt"))
    # the proxy computes the reference's fixed-point LUT color path;
    # compare like with like (the float default is the documented
    # speed deviation, A/B'd on the synthetic set)
    cfg = dataclasses.replace(cfg, color_exact=True)
    res = rect_frame(jnp.asarray(bgr), TAN, cfg)
    b_set = dedupe([r["c2"] for r in live_rects(res)])

    n_ab, a_only, b_only = match_sets(a_set, b_set, tol)
    row = {"image": os.path.basename(path), "a": len(a_set),
           "b": len(b_set), "ab_matched": n_ab,
           "a_only": a_only, "b_only": b_only,
           "a_set": [np.asarray(q).tolist() for q in a_set],
           "b_set": [np.asarray(q).tolist() for q in b_set]}
    if gt_corners is not None:
        gtq = np.asarray(gt_corners, np.float64)
        ea = min([corner_err(gtq, d) for d in a_set], default=np.inf)
        eb = min([corner_err(gtq, d) for d in b_set], default=np.inf)
        row.update(gt=1, gt_hit_a=int(ea <= tol), gt_hit_b=int(eb <= tol),
                   err_a=round(float(ea), 2) if np.isfinite(ea) else None,
                   err_b=round(float(eb), 2) if np.isfinite(eb) else None)
    else:
        row.update(gt=0, gt_hit_a=0, gt_hit_b=0, err_a=None, err_b=None)
    return row


def main(argv):
    procs = next((int(a.split("=")[1]) for a in argv if
                  a.startswith("--procs=")), 4)
    corpus = next((a.split("=")[1] for a in argv if
                   a.startswith("--corpus=")),
                  os.path.join(os.path.dirname(__file__), "..", "docs",
                               "photo_corpus"))
    tol = next((float(a.split("=")[1]) for a in argv if
                a.startswith("--tol=")), TOL)
    gt_path = os.path.join(corpus, "gt.json")
    if not os.path.exists(gt_path):
        from tools.photo_corpus import build_corpus
        build_corpus(corpus)
    with open(gt_path) as f:
        gt = json.load(f)

    jobs = [(os.path.join(corpus, name), meta["corners_xy"], tol)
            for name, meta in sorted(gt.items())]
    import multiprocessing as mp
    # maxtasksperchild=1: each image gets a FRESH process — one_image
    # compiles the dense calibration pipeline + the build per image,
    # and XLA:CPU segfaults after ~90 accumulated compiles in one
    # process (CLAUDE.md); worker reuse crossed that budget once the
    # corpus grew (round-4 finding: silent libgcc segfaults killed the
    # pool with no traceback)
    with mp.get_context("spawn").Pool(procs, maxtasksperchild=1) as pool:
        rows = pool.map(one_image, jobs, chunksize=1)

    comp = [r for r in rows if r["gt"]]
    raw = [r for r in rows if not r["gt"]]
    print(f"| image | A(proxy) | B(build) | A∩B≤{tol}px | gtA | gtB | "
          "errA | errB |")
    print("|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['image']} | {r['a']} | {r['b']} | {r['ab_matched']} "
              f"| {r['gt_hit_a']} | {r['gt_hit_b']} | {r['err_a']} | "
              f"{r['err_b']} |")
    t = {k: sum(r[k] for r in comp) for k in
         ("gt", "gt_hit_a", "gt_hit_b", "ab_matched", "a", "b")}
    print(f"\ncomposites: gt {t['gt']}, proxy hits {t['gt_hit_a']}, "
          f"build hits {t['gt_hit_b']}, A∩B {t['ab_matched']}")
    tr = {k: sum(r[k] for r in raw) for k in ("a", "b", "ab_matched")}
    print(f"raw photos: proxy {tr['a']} / build {tr['b']} detections, "
          f"matched {tr['ab_matched']}")
    # attribute every one-sided detection (round-3 verdict item 5):
    # nearest counterpart among the OTHER engine's accepted quads —
    # within tol (taken by the 1:1 matching) => a duplicate shape the
    # dedupe collapsed on one side only; within 3*tol => the same quad
    # localized past the matching tolerance (alignment margin); farther
    # => genuinely missing on the other side (the class that hides
    # real bugs; drill those with stage dumps).
    attrib = []
    for r in rows:
        a_set = [np.asarray(q) for q in r.pop("a_set")]
        b_set = [np.asarray(q) for q in r.pop("b_set")]
        for side, mine, other in (("a_only", a_set, b_set),
                                  ("b_only", b_set, a_set)):
            if not r[side]:
                continue
            # re-derive the one-sided members: greedy 1:1 like match_sets
            import itertools
            used = set()
            matched_mine = set()
            pairs = sorted(
                ((corner_err(x, y), i, j)
                 for (i, x), (j, y) in itertools.product(
                     enumerate(mine), enumerate(other))),
                key=lambda t3: t3[0])
            for e, i, j in pairs:
                if e > tol or i in matched_mine or j in used:
                    continue
                matched_mine.add(i)
                used.add(j)
            for i, q in enumerate(mine):
                if i in matched_mine:
                    continue
                near = min((corner_err(q, y) for y in other),
                           default=float("inf"))
                cls = ("duplicate" if near <= tol else
                       "alignment-margin" if near <= 3 * tol else
                       "missing")
                attrib.append({"image": r["image"], "side": side,
                               "nearest_px": round(float(near), 2)
                               if np.isfinite(near) else None,
                               "class": cls})
    print("\none-sided attribution:")
    for a in attrib:
        print(f"  {a['image']:34s} {a['side']:7s} "
              f"nearest={a['nearest_px']} -> {a['class']}")
    out = {"tol_px": tol, "rows": rows, "composites": t, "raws": tr,
           "one_sided": attrib}
    with open(os.path.join(os.path.dirname(__file__), "..", "docs",
                           "photo_parity.json"), "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
