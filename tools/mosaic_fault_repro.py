"""Minimal standalone repro for the wide-frame Mosaic runtime fault.

Symptom (round 2): the links-mode CCL flood (pallas_ccl._links_block_kernel,
used by label_merge / labelMergeMain, oclrect.cl:300-334) kills the TPU
worker at runtime for w=3840 blocks taller than ~96 rows, while bh<=96 runs
clean and 224x1920 — the same element count — also runs clean.  Production
clamps wide frames to bh<=96 (pallas_ccl._clamp_bh); this tool isolates
WHICH kernel feature faults so the clamp can be replaced by a targeted fix
or an upstream bug note.

Every (variant, bh, w) candidate runs in a FRESH SUBPROCESS on the real
TPU: a fault kills only the child.  Exit 0 = ran, nonzero/timeout = fault.

Variants (all on (h, w) int32 inputs, same BlockSpec as production):
  full      the production links flood (while_loop of neighbor mins +
            4 segmented Hillis-Steele scans)
  noscan    while_loop of neighbor mins only (no segmented scans)
  scanonly  one round of the 4 segmented scans (no while_loop)
  whilescan while_loop of the 4 segmented scans (no neighbor mins)
  rolls     log2(w)+log2(bh) plain jnp.roll+min chain (no masks, no loop)

Usage: python tools/mosaic_fault_repro.py [--run] [--full4k]
       python tools/mosaic_fault_repro.py --child VARIANT BH W [H] (internal)

--full4k appends the production path (label_merge_exact: flood + seam
union + reseeded second flood) at the true 2160x3840 frame size —
variant "prod" — plus the raw flood at full height, in case the fault
needs the real grid/HBM footprint rather than the kernel body.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

H = 260                      # a few blocks at every candidate bh
WS = (3840, 1920)
BHS = (96, 112, 128)
VARIANTS = ("full", "noscan", "scanonly", "whilescan", "rolls")


def _child_prod(bh: int, w: int, h: int, stage: str = "prod") -> int:
    import numpy as np
    import jax
    import jax.numpy as jnp
    from rectdetect_tpu.ops import pallas_ccl

    rng = np.random.default_rng(0)
    packed = jnp.asarray(rng.integers(0, 2 ** 22, (h, w), dtype=np.int32))
    zero = jnp.zeros((h, w), jnp.int32)
    # bypass _clamp_bh: drive _run_links_blocks via label_merge_exact's
    # own plumbing but with the clamp disabled
    orig = pallas_ccl._clamp_bh
    pallas_ccl._clamp_bh = lambda b, hh, ww: b
    try:
        if stage == "prod":
            out = pallas_ccl.label_merge_exact(packed, zero, zero, bh=bh)
        else:
            # label_links_blocked truncated after seam union + resolve
            # (no reseeded second flood)
            lh = jnp.asarray((rng.random((h, w)) < 0.5).astype(np.int32))
            lv = jnp.asarray((rng.random((h, w)) < 0.5).astype(np.int32))

            @jax.jit
            def noreseed(lh, lv):
                lbl = pallas_ccl._run_links_blocks(lh, lv, None, bh=bh,
                                                   interpret=False)
                t = pallas_ccl._links_seam_union(lv, lbl, bh=bh)
                rows = list(range(bh - 1, h - 1, bh))
                seam_rows = rows + [r + 1 for r in rows]
                sv = jnp.stack([lbl[r] for r in seam_rows])
                return pallas_ccl._resolve(t, sv)

            out = noreseed(lh, lv)
        v = int(np.asarray(out).ravel()[0])
    finally:
        pallas_ccl._clamp_bh = orig
    print(f"ok variant={stage} bh={bh} w={w} h={h} out0={v}")
    return 0


def _child(variant: str, bh: int, w: int) -> int:
    import functools

    import numpy as np
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from rectdetect_tpu.ops import vmem
    from rectdetect_tpu.ops.pallas_ccl import _links_block_kernel

    h = H
    rng = np.random.default_rng(0)
    lh = jnp.asarray((rng.random((h, w)) < 0.5).astype(np.int32))
    lv = jnp.asarray((rng.random((h, w)) < 0.5).astype(np.int32))

    def sh(arr, ly, xx, dy, dx, fill, bh_, w_):
        v = arr
        if dy:
            v = jnp.roll(v, -dy, 0)
        if dx:
            v = jnp.roll(v, -dx, 1)
        ok = None
        if dy:
            ok = (ly + dy >= 0) & (ly + dy < bh_)
        if dx:
            okx = (xx + dx >= 0) & (xx + dx < w_)
            ok = okx if ok is None else (ok & okx)
        return v if ok is None else jnp.where(ok, v, fill)

    def reduced_kernel(lh_ref, lv_ref, seed_ref, out_ref, *, mode: str):
        blk = pl.program_id(0)
        ly = jax.lax.broadcasted_iota(jnp.int32, (bh, w), 0)
        xx = jax.lax.broadcasted_iota(jnp.int32, (bh, w), 1)
        yy = ly + blk * bh
        idx = yy * w + xx
        sent = jnp.int32(h * w)
        lhv = jnp.where(yy < h, lh_ref[:], 0)
        lvv = jnp.where((yy < h) & (ly < bh - 1), lv_ref[:], 0)
        conn_l = sh(lhv, ly, xx, 0, -1, 0, bh, w)
        conn_u = sh(lvv, ly, xx, -1, 0, 0, bh, w)
        label = jnp.where(yy < h, idx, sent)

        def seg_scan(v, conn, axis, reverse, length):
            if reverse:
                f = sh(conn, ly, xx, 0, 1, 0, bh, w) if axis == 1 else \
                    sh(conn, ly, xx, 1, 0, 0, bh, w)
            else:
                f = conn
            d = 1
            while d < length:
                step = d if reverse else -d
                if axis == 1:
                    v_sh = sh(v, ly, xx, 0, step, sent, bh, w)
                    f_sh = sh(f, ly, xx, 0, step, 0, bh, w)
                else:
                    v_sh = sh(v, ly, xx, step, 0, sent, bh, w)
                    f_sh = sh(f, ly, xx, step, 0, 0, bh, w)
                v = jnp.where(f != 0, jnp.minimum(v, v_sh), v)
                f = f & f_sh
                d *= 2
            return v

        def mins(g):
            g = jnp.minimum(g, jnp.where(
                conn_l != 0, sh(g, ly, xx, 0, -1, sent, bh, w), sent))
            g = jnp.minimum(g, jnp.where(
                lhv != 0, sh(g, ly, xx, 0, 1, sent, bh, w), sent))
            g = jnp.minimum(g, jnp.where(
                conn_u != 0, sh(g, ly, xx, -1, 0, sent, bh, w), sent))
            g = jnp.minimum(g, jnp.where(
                lvv != 0, sh(g, ly, xx, 1, 0, sent, bh, w), sent))
            return g

        def scans(g):
            g = seg_scan(g, conn_l, 1, False, w)
            g = seg_scan(g, conn_l, 1, True, w)
            g = seg_scan(g, conn_u, 0, False, bh)
            g = seg_scan(g, conn_u, 0, True, bh)
            return g

        if mode == "scanonly":
            label = scans(label)
        elif mode == "rolls":
            d = 1
            while d < w:
                label = jnp.minimum(label, jnp.roll(label, -d, 1))
                d *= 2
            d = 1
            while d < bh:
                label = jnp.minimum(label, jnp.roll(label, -d, 0))
                d *= 2
        else:
            body_fn = mins if mode == "noscan" else scans

            def cond(c):
                _, changed, it = c
                return changed & (it < 64)

            def body(c):
                g, _, it = c
                new = body_fn(g)
                return new, jnp.any(new != g), it + 1

            label, _, _ = jax.lax.while_loop(
                cond, body, (label, jnp.bool_(True), jnp.int32(0)))
        out_ref[:] = label

    nb = pl.cdiv(h, bh)
    spec = pl.BlockSpec((bh, w), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    if variant in ("full", "fullseed"):
        kern = functools.partial(_links_block_kernel, h=h, w=w, bh=bh,
                                 seeded=variant == "fullseed")
    else:
        kern = functools.partial(reduced_kernel, mode=variant)
    seed = (jnp.asarray(rng.integers(0, h * w, (h, w), dtype=np.int32))
            if variant == "fullseed" else lh)
    out = pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((h, w), jnp.int32),
        grid=(nb,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        interpret=jax.default_backend() != "tpu",
        compiler_params=vmem.compiler_params(),
    )(lh, lv, seed)
    v = int(np.asarray(out)[0, 0])
    print(f"ok variant={variant} bh={bh} w={w} out00={v}")
    return 0


def main(argv) -> int:
    if "--child" in argv:
        i = argv.index("--child")
        variant = argv[i + 1]
        bh, w = int(argv[i + 2]), int(argv[i + 3])
        if variant in ("prod", "noreseed"):
            return _child_prod(bh, w, int(argv[i + 4]), variant)
        if len(argv) > i + 4:
            global H
            H = int(argv[i + 4])
        return _child(variant, bh, w)
    run = "--run" in argv
    cases = [(v, bh, w, None) for w in WS for bh in BHS for v in VARIANTS]
    if "--full4k" in argv:
        cases = ([("prod", bh, 3840, 2160) for bh in (96, 112, 128)] +
                 [("full", bh, 3840, 2160) for bh in (112, 128)] +
                 [("fullseed", 112, 3840, 2160)])
    results = []
    for variant, bh, w, h in cases:
        if not run:
            print(f"plan: {variant} bh={bh} w={w} h={h or H}")
            continue
        args = [sys.executable, os.path.abspath(__file__),
                "--child", variant, str(bh), str(w)]
        if h is not None:
            args.append(str(h))
        try:
            p = subprocess.run(args, capture_output=True, text=True,
                               timeout=420)
            ok = p.returncode == 0
            note = "" if ok else (p.stderr.strip()[-200:] or
                                  f"rc={p.returncode}")
        except subprocess.TimeoutExpired:
            ok, note = False, "timeout"
        results.append({"variant": variant, "bh": bh, "w": w,
                        "h": h or H, "ok": ok, "note": note})
        print(json.dumps(results[-1]), flush=True)
    if run:
        suffix = "_4k" if "--full4k" in argv else ""
        with open(os.path.join(os.path.dirname(__file__), "..", "docs",
                               f"mosaic_fault_repro{suffix}.json"),
                  "w") as f:
            json.dump(results, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
