"""Per-stage device timing at a given resolution.

Times each pipeline stage as its own jitted program with the amortized
single-readback protocol (submit N, fetch one scalar from the last result;
in-order execution makes the elapsed time cover all N).  This is the
profiling story the reference gets from CL event timestamps
(oclhelper.c:555-605) — here per-stage wall clock on the live platform.

Usage: python tools/stage_bench.py [HxW] [N]
"""

from __future__ import annotations

import math
import sys
import time

import numpy as np


def amortized(fn, args_list, n):
    import jax
    # warmup/compile
    r = fn(*args_list[0])
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for i in range(n):
        r = fn(*args_list[i % len(args_list)])
    np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp
    sys.path.insert(0, ".")
    from rectdetect_tpu.runtime.cache import enable_persistent_cache
    enable_persistent_cache()
    from rectdetect_tpu.config import DEFAULT_CONFIG as cfg
    from rectdetect_tpu.core import color
    from rectdetect_tpu.ops import blur, gradient, thin, ccl, morphology, \
        polyline, regions, reduce_ls
    from rectdetect_tpu.pipeline.frontend import edge_frontend
    from rectdetect_tpu.pipeline import rect as prect
    from rectdetect_tpu.geometry import quad as gquad, pose as gpose
    from bench import synth_frame

    res = sys.argv[1] if len(sys.argv) > 1 else "720x1280"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    h, w = (int(v) for v in res.split("x"))
    print(f"platform={jax.devices()[0].platform} {h}x{w} N={n}", flush=True)

    frames = [jax.device_put(synth_frame(h, w, seed=s)) for s in range(2)]
    tan = math.tan(math.radians(72) / 2)

    fe = jax.jit(lambda f: edge_frontend(f, cfg))
    t = amortized(fe, [(f,) for f in frames], n)
    print(f"frontend            {t*1000:9.2f} ms", flush=True)

    fes = [fe(f) for f in frames]
    for f_ in fes:
        jax.block_until_ready(f_.edge_thin)

    # --- frontend sub-stages --------------------------------------------
    col = jax.jit(lambda f: color.pack_lab(color.bgr_to_labf(f)))
    t = amortized(col, [(f,) for f in frames], n)
    print(f"  fe/color+pack     {t*1000:9.2f} ms", flush=True)

    labqs = [jax.jit(lambda f: color.quantize_labf(
        color.bgr_to_labf(f)))(f) for f in frames]
    blr = jax.jit(lambda q: jnp.stack(
        [blur.gaussian_blur(q[..., c], cfg.blur_radius) for c in range(3)],
        axis=-1))
    t = amortized(blr, [(q,) for q in labqs], n)
    print(f"  fe/blur x3        {t*1000:9.2f} ms", flush=True)
    labbs = [blr(q) for q in labqs]

    ev = jax.jit(lambda b: gradient.edgevec(b[..., 0]))
    t = amortized(ev, [(b,) for b in labbs], n)
    print(f"  fe/edgevec        {t*1000:9.2f} ms", flush=True)
    vecs = [ev(b) for b in labbs]

    el = jax.jit(lambda b: gradient.edge_lab(color.quantize_labf(b)))
    t = amortized(el, [(b,) for b in labbs], n)
    print(f"  fe/edge_lab       {t*1000:9.2f} ms", flush=True)
    ems = [el(b) for b in labbs]

    th = jax.jit(thin.thinthres)
    t = amortized(th, list(zip(ems, vecs)), n)
    print(f"  fe/thinthres      {t*1000:9.2f} ms", flush=True)

    morph = jax.jit(lambda eb: morphology.stringify(
        morphology.simple_connect_rect(
            morphology.simple_junction(eb, positive_only=True)), 0))
    t = amortized(morph, [(f.edge_bin,) for f in fes], n)
    print(f"morphology          {t*1000:9.2f} ms", flush=True)

    sp = max(4096, h * w // cfg.sparse_factor) if cfg.sparse_factor else None
    cclf = jax.jit(lambda s: ccl.label_components(s, 0, cfg.ccl_passes,
                                                  cfg.ccl_jumps,
                                                  sparse_cap=sp))
    strings = [morph(f.edge_bin) for f in fes]
    t = amortized(cclf, [(s,) for s in strings], n)
    print(f"ccl (one instance)  {t*1000:9.2f} ms", flush=True)

    cclw = jax.jit(lambda s: ccl.label_components_adaptive(
        s, 0, cfg.ccl_passes, cfg.ccl_jumps,
        small_cap=max(4096, h * w // 8), big_cap=sp or 4096,
        round_cap=cfg.weak_ccl_round_cap, pieces_ok=True))
    t = amortized(cclw, [(s,) for s in strings], n)
    print(f"ccl weak (pieces)   {t*1000:9.2f} ms", flush=True)

    labels = [cclf(s) for s in strings]

    blb = jax.jit(lambda p, e: regions.blblur(p, e, cfg.blblur_iters))
    ebs = [(f.edge_bin > 0).astype(jnp.int32) for f in fes]
    t = amortized(blb, [(f.packed0, e) for f, e in zip(fes, ebs)], n)
    print(f"blblur x10          {t*1000:9.2f} ms", flush=True)

    dsp = jax.jit(lambda p, e: regions.despeckle(
        regions.quantize_packed(p), e))
    t = amortized(dsp, [(f.packed0, f.edge_thin) for f in fes], n)
    print(f"quantize+despeckle  {t*1000:9.2f} ms", flush=True)

    lm = jax.jit(lambda p, m, e: regions.label_merge(
        p, m, e, cfg.labelmerge_passes, cfg.labelmerge_jumps))
    masks = [jnp.zeros((h, w), jnp.int32) for _ in fes]
    t = amortized(lm, [(f.packed0, m, l) for f, m, l in
                       zip(fes, masks, labels)], n)
    print(f"label_merge x8      {t*1000:9.2f} ms", flush=True)

    cap = cfg.ls_cap_for(w, h)
    pl = jax.jit(lambda e: polyline.polyline_execute(
        e, cfg.minerror_rect, cfg.size_thre_rect, cap, cfg))
    t = amortized(pl, [(e,) for e in ebs], n)
    print(f"polyline            {t*1000:9.2f} ms", flush=True)

    arenas = [pl(e) for e in ebs]

    # --- polyline sub-stages (the LEGACY dense op chain; the production
    # sparse tail is the one-walk form — profile it with tools/pl_bisect.py)
    from rectdetect_tpu.ops import chain as pchain
    sp = (max(4096, h * w // cfg.strings_sparse_factor)
          if cfg.sparse_factor else None)
    mstr = jax.jit(lambda e: morphology.strings_chain(e, "poly_branch"))
    t = amortized(mstr, [(e,) for e in ebs], n)
    print(f"  pl/strings        {t*1000:9.2f} ms", flush=True)
    strs = [mstr(e) for e in ebs]

    pccl = jax.jit(lambda s: ccl.label_components(
        s, 0, cfg.ccl_passes, cfg.ccl_jumps, sparse_cap=sp,
        scan_boost=sp is not None))
    t = amortized(pccl, [(s,) for s in strs], n)
    print(f"  pl/ccl            {t*1000:9.2f} ms", flush=True)

    def prep(s):
        lab = pccl(s)
        jn2 = morphology.simple_junction(s)
        ne = pchain.count_ends(jn2, lab)
        return pchain.break_loops(s, lab, ne)
    sl = [jax.jit(prep)(s) for s in strs]

    num = jax.jit(lambda lab: pchain.arc_number(
        lab, cfg.number_doublings, sparse_cap=sp)[0])
    t = amortized(num, [(x[1],) for x in sl], n)
    print(f"  pl/arc_number     {t*1000:9.2f} ms", flush=True)
    nums = [num(x[1]) for x in sl]

    arcsf = jax.jit(lambda nm: ccl.label_arcs(
        nm, cfg.labelpl_passes, cfg.labelpl_jumps, sparse_cap=sp,
        scan_boost=sp is not None))
    t = amortized(arcsf, [(nm,) for nm in nums], n)
    print(f"  pl/label_arcs     {t*1000:9.2f} ms", flush=True)
    arcls = [arcsf(nm) for nm in nums]

    filt = jax.jit(lambda a: ccl.relabel_dense(ccl.filter_size(
        a, ccl.component_sizes(a, ignore=0), cfg.size_thre_rect))[0])
    t = amortized(filt, [(a,) for a in arcls], n)
    print(f"  pl/size+relabel   {t*1000:9.2f} ms", flush=True)
    denses = [filt(a) for a in arcls]

    def mk(dense, nm):
        comp = None
        if sp is not None:
            from rectdetect_tpu.ops.compact import compact_mask
            sp_arc = max(4096, h * w // cfg.arc_sparse_factor)
            comp = compact_mask((dense > 0).reshape(-1), sp_arc)
        ar = polyline.mkpl_init(dense, nm, cap, comp)
        ar, lsid = polyline.mkpl_subdivide(ar, dense, nm,
                                           cfg.minerror_rect,
                                           cfg.mkpl_iters, comp)
        return ar, lsid
    mkj = jax.jit(mk)
    t = amortized(mkj, list(zip(denses, nums)), n)
    print(f"  pl/mkpl           {t*1000:9.2f} ms", flush=True)

    hyp = jax.jit(lambda a, l, b: prect._hypotheses(a, l, b, w, h, cfg))
    t = amortized(hyp, [(a[0], a[1], lb) for a, lb in zip(arenas, labels)],
                  n)
    print(f"hypotheses+reduceLS {t*1000:9.2f} ms", flush=True)

    hyps = [hyp(a[0], a[1], lb) for a, lb in zip(arenas, labels)]

    red = jax.jit(lambda s, v: gquad.reduce_groups(s, v,
                                                   cfg.hull_max_vertices))
    t = amortized(red, [(hh[0], hh[1]) for hh in hyps], n)
    print(f"quad reduction      {t*1000:9.2f} ms", flush=True)

    quads = [red(hh[0], hh[1]) for hh in hyps]

    pose = jax.jit(lambda c: gpose.pose_estimate(c, w, h, tan, cfg.cg_iters,
                                                 cfg.cg_line_search_iters))
    t = amortized(pose, [(q[0],) for q in quads], n)
    print(f"pose (CG)           {t*1000:9.2f} ms", flush=True)

    full = jax.jit(lambda f: prect.rect_frame(f, tan, cfg))
    t = amortized(full, [(f,) for f in frames], max(2, n // 2))
    print(f"FULL rect_frame     {t*1000:9.2f} ms  ({1.0/t:.1f} fps)",
          flush=True)


if __name__ == "__main__":
    main()
