"""Per-device/per-resolution calibration, persisted like the reference's
autotune plan.

The reference profiles every kernel over a grid of local work-group sizes
and persists the winners per device in plan.txt (oclhelper.c:312-605,
driven by rect.cpp:86-101).  XLA owns that level of tuning here; what is
worth calibrating for this pipeline are the *capacity* knobs that trade
silent truncation against gather cost:

  * sparse_factor / boundary_sparse_factor — slot-list sizes for the
    labeling machinery (cost scales linearly with them);
  * ls_capacity — the segment arena.

`calibrate()` measures the actual foreground densities on sample frames
(with a safety margin), derives the tightest safe capacities, and
persists them with runtime.native.plan_save keyed by device kind and
resolution; `load_calibrated_config()` applies them at startup — the
moral equivalent of loadPlan at app start (rect.cpp:86)."""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

from rectdetect_tpu.config import PipelineConfig, DEFAULT_CONFIG
from rectdetect_tpu.runtime import native

PLAN_PATH = "plan.txt"
MARGIN = 1.6


def _densities(bgr_frames, cfg: PipelineConfig):
    """Per-stage foreground densities on sample frames: the stringified
    edge map (strings CCL / labelpl), the boundary strip map (boundary
    CCL), and the post-size-filter arc pixels + arc count (mkpl)."""
    import dataclasses as dc
    import jax
    import jax.numpy as jnp
    from rectdetect_tpu.pipeline import rect as prect

    dense_cfg = dc.replace(cfg, sparse_factor=0)

    @jax.jit
    def stats(bgr):
        from rectdetect_tpu.ops import morphology
        from rectdetect_tpu.ops.chain import arc_chain_sparse
        from rectdetect_tpu.ops.compact import compact_mask
        st = prect.rect_stage_images(bgr, dense_cfg)
        boundary_d = jnp.mean((st["boundary"] >= 0).astype(jnp.float32))
        # hypothesis-group demand: distinct boundary components (labels
        # are min flat indices, so components == root pixels).  The
        # reference's group list is dynamic (ArrayMap); the static
        # max_groups cap must cover the scene class or whole regions
        # (and their quads) silently drop out of hypothesis generation
        # (round-3 photo-corpus finding: 466 groups on a textured photo
        # vs the 192 default).
        bflat = st["boundary"].reshape(-1)
        hw2 = bflat.shape[0]
        groups_n = jnp.sum(((bflat == jnp.arange(hw2, dtype=bflat.dtype))
                            & (bflat >= 0)).astype(jnp.int32))
        arcs_d = jnp.mean((st["lsid"] > 0).astype(jnp.float32))
        n_arcs = jnp.max(st["lsid"])
        edge_d = jnp.mean((st["edge_thin"] > 0).astype(jnp.float32))
        # sparse_factor compacts the rect-variant stringified map (the
        # weak-CCL instance + strength filters, pipeline/rect.py) — its
        # actual density, not a proxy
        edge_bin = (st["edge_thin"] > 0).astype(jnp.int32)
        srect = morphology.strings_chain(edge_bin, "rect",
                                         bridge2=cfg.bridge_gap2)
        rect_strings_d = jnp.mean((srect != 0).astype(jnp.float32))
        # strings_sparse_factor compacts the polyline strings (post
        # removeBranch, ~half the rect-variant density)
        strong_bin = (st["strong_labels"] > 0).astype(jnp.int32)
        strings = morphology.strings_chain(strong_bin, "poly_branch",
                                           bridge2=cfg.bridge_gap2)
        strings_d = jnp.mean((strings != 0).astype(jnp.float32))
        hw = strings.shape[0] * strings.shape[1]
        comp = compact_mask((strings != 0).reshape(-1), max(4096, hw // 2))
        _, _, _, cyc, _, _ = arc_chain_sparse(strings, comp,
                                              cfg.number_doublings, 4096)
        cyc_d = jnp.sum(cyc.astype(jnp.float32)) / hw
        # walk-prefilter survivor density (slots whose component is NOT
        # provably <= size_thre px; sizes the filtered walk capacity)
        from rectdetect_tpu.ops.polyline import _small_component_kill
        keep_s = _small_component_kill(strings, comp,
                                       cfg.size_thre_rect, cfg)
        surv_d = jnp.sum(keep_s.astype(jnp.float32)) / hw
        # run density of the PRE-despeckle2 region map (what
        # regions.sizes_despeckle2 compacts; despeckle2 only merges, so
        # pre-despeckle2 is the worst case)
        from rectdetect_tpu.ops import regions as tregions
        seg_pre = tregions.label_merge(st["despeckled"], st["merge_mask"],
                                       st["strong_labels"])
        runs_d = jnp.mean(jnp.concatenate(
            [jnp.ones((seg_pre.shape[0], 1), jnp.float32),
             (seg_pre[:, 1:] != seg_pre[:, :-1]).astype(jnp.float32)],
            axis=1))
        return (edge_d, rect_strings_d, strings_d, boundary_d, arcs_d,
                n_arcs, cyc_d, runs_d, groups_n, surv_d)

    edge_d = rect_d = strings_d = boundary_d = arcs_d = cyc_d = 0.0
    runs_d = surv_d = 0.0
    arcs = groups = 0
    for f in bgr_frames:
        e, rs, s, b, a, n, c, rd, g, sv = stats(f)
        edge_d = max(edge_d, float(e))
        rect_d = max(rect_d, float(rs))
        strings_d = max(strings_d, float(s))
        boundary_d = max(boundary_d, float(b))
        arcs_d = max(arcs_d, float(a))
        arcs = max(arcs, int(n))
        cyc_d = max(cyc_d, float(c))
        runs_d = max(runs_d, float(rd))
        groups = max(groups, int(g))
        surv_d = max(surv_d, float(sv))
    return (edge_d, rect_d, strings_d, boundary_d, arcs_d, arcs, cyc_d,
            runs_d, groups, surv_d)


def _key(device_kind: str, h: int, w: int) -> str:
    return f"{device_kind}|{h}x{w}".replace(" ", "_")


def calibrate(bgr_frames, cfg: PipelineConfig = DEFAULT_CONFIG,
              plan_path: str = PLAN_PATH,
              device_kind: str | None = None) -> PipelineConfig:
    """Measure densities on sample frames, derive tight safe capacities,
    persist, and return the calibrated config.

    device_kind overrides the plan key: densities are properties of the
    workload, not the chip, so a CPU run can pre-populate TPU entries
    (tools/calibrate_bench.py writes the bench-scene plan this way)."""
    import jax
    h, w = np.asarray(bgr_frames[0]).shape[:2]
    (edge_d, rect_d, strings_d, boundary_d, arcs_d, arcs,
     cyc_d, runs_d, groups, surv_d) = _densities(bgr_frames, cfg)

    def factor_for(density, cap=64):
        d = min(max(density * MARGIN, 1e-4), 1.0)
        return max(1, min(cap, int(1.0 / d)))

    new = dataclasses.replace(
        cfg,
        sparse_factor=factor_for(rect_d, cap=16),
        # strength-pair small branch: 1.2x margin over the measured
        # rect-strings density (overflow falls back to the sparse_factor
        # cap with exactly equal output)
        rect_strings_small=max(1, min(
            24, int(1.0 / min(max(rect_d * 1.2, 1e-4), 1.0)))),
        strings_sparse_factor=factor_for(strings_d, cap=24),
        # the small branch of polyline's runtime capacity switch only
        # needs to cover TYPICAL frames (overflow falls back to the big
        # list with exactly equal output), so a 1.5x margin suffices
        strings_small_factor=max(1, min(
            40, int(1.0 / min(max(strings_d * 1.5, 1e-4), 1.0)))),
        boundary_sparse_factor=factor_for(boundary_d, cap=32),
        arc_sparse_factor=factor_for(arcs_d, cap=128),
        # arc small branch: 1.5x margin like strings_small_factor
        # (overflow falls back to the big list, exactly equal output)
        arc_small_factor=max(1, min(
            512, int(1.0 / min(max(arcs_d * 1.5, 1e-4), 1.0)))),
        cycle_sparse_factor=factor_for(cyc_d, cap=256),
        # run-list capacity for the fused calcSize+despeckle2 (overflow
        # falls back to the dense pair via a runtime cond)
        region_run_factor=factor_for(runs_d, cap=48),
        ls_capacity=int(min(max(arcs * 4 * MARGIN, 4096), 262144)),
        # the reference's group list is dynamic; cover the measured
        # boundary-component demand (rounded to 64, capped for the
        # (G+1, arena cap) membership matrices' memory)
        max_groups=int(min(2048, max(cfg.max_groups,
                                     -(-int(groups * MARGIN) // 64) * 64))),
        # prefilter overflow falls back to the full walk via a runtime
        # cond (exact, just slower) — unlike the truncating caps a thin
        # 1.25x margin is safe here, and the sweep (tools/walk_tune.py)
        # measured the tighter survivor list 3 ms faster at 720p
        walk_prefilter_factor=max(1, min(
            128, int(1.0 / min(max(surv_d * 1.25, 1e-4), 1.0)))),
    )
    # batched-mode branch pin for the run-length despeckle2: the cond's
    # predicate is nruns <= H*W//region_run_factor; pin run-length when
    # the measured run density clears it with a 1.5x margin
    pin_runs = (1 if new.region_run_factor and
                runs_d * 1.5 <= 1.0 / new.region_run_factor else 2)
    dev = device_kind or jax.devices()[0].device_kind
    # merge with any existing entries (tune_kernels' block winners live
    # in the same section — a recalibration must not drop them)
    entries = native.plan_load(plan_path, _key(dev, h, w))
    # the walk-prefilter capacity is owned by the measured sweep
    # (tools/walk_tune.py persists its winner): the density model here
    # overestimates production survivors (it derives strings from the
    # dense oracle pipeline), so never overwrite a sweep-tuned entry
    if "walk_prefilter_factor" in entries:
        new = dataclasses.replace(
            new,
            walk_prefilter_factor=int(entries["walk_prefilter_factor"]))
    entries.update({
        "sparse_factor": str(new.sparse_factor),
        "rect_strings_small": str(new.rect_strings_small),
        "strings_sparse_factor": str(new.strings_sparse_factor),
        "strings_small_factor": str(new.strings_small_factor),
        "boundary_sparse_factor": str(new.boundary_sparse_factor),
        "arc_sparse_factor": str(new.arc_sparse_factor),
        "arc_small_factor": str(new.arc_small_factor),
        "cycle_sparse_factor": str(new.cycle_sparse_factor),
        "region_run_factor": str(new.region_run_factor),
        "ls_capacity": str(new.ls_capacity),
        "max_groups": str(new.max_groups),
        "walk_prefilter_factor": str(new.walk_prefilter_factor),
        "pin_region_runs": str(pin_runs),
    })
    native.plan_save(plan_path, _key(dev, h, w), entries)
    return new


def plan_fits(cfg: PipelineConfig, bgr, headroom: float = 1.1) -> bool:
    """Cheap probe: does this frame's foreground fit the plan's slot
    capacities?

    A capacity plan calibrated on one scene class can silently truncate
    a much denser one (a clean-scene plan on a noisy frame drops most of
    the edge map and detections collapse — measured, not hypothetical).
    This checks the string densities (front-end + morphology) AND the
    strong-strings density: post-size-filter arc pixels are a SUBSET of
    the strong strings, so the strong density bounds the arc-compaction
    demand from above (round-3 photo-corpus finding: a textured photo's
    arcs overflowed max(4096, n//arc_sparse_factor) while every string
    cap fit, silently dropping 60% of segments).  Callers recalibrate
    when it returns False (apps.rect) or warn (vidrect)."""
    import jax.numpy as jnp
    from rectdetect_tpu.ops import ccl, morphology
    from rectdetect_tpu.pipeline.frontend import edge_frontend

    if not cfg.sparse_factor:
        return True                       # dense mode has no caps
    fe = edge_frontend(jnp.asarray(bgr), cfg)
    srect = morphology.strings_chain(fe.edge_bin, "rect",
                                     bridge2=cfg.bridge_gap2,
                                     bh=cfg.morph_bh)
    spoly = morphology.strings_chain(fe.edge_bin, "poly_branch",
                                     bridge2=cfg.bridge_gap2,
                                     bh=cfg.morph_bh)
    rect_d = float(jnp.mean((srect != 0).astype(jnp.float32)))
    poly_d = float(jnp.mean((spoly != 0).astype(jnp.float32)))
    # strong density via the uncapped exact CCL (probe-only; the probe
    # must not itself truncate)
    lbl = ccl.label_components(srect, 0, cfg.ccl_passes, cfg.ccl_jumps,
                               bh=cfg.ccl_bh or None)
    st = ccl.calc_strength(fe.edge_thin, lbl, cfg.strength_scale)
    weak = ccl.filter_strength(lbl, st, cfg.strength_weak)
    strong = ccl.filter_strength(weak, st, cfg.strength_strong)
    strong_d = float(jnp.mean((strong > 0).astype(jnp.float32)))
    h, w = srect.shape
    arc_cap_d = max(4096, h * w // cfg.arc_sparse_factor) / (h * w)
    return (rect_d * headroom <= 1.0 / cfg.sparse_factor and
            poly_d * headroom <= 1.0 / cfg.strings_sparse_factor and
            strong_d * headroom <= arc_cap_d)


def _plan_lookup(dev: str, platform: str, h: int, w: int,
                 plan_path: str):
    """Exact device-kind key, else (for non-CPU devices) any persisted
    TPU entry at the same resolution.  Returns (entries, key_used)."""
    import pathlib
    used = _key(dev, h, w)
    entries = native.plan_load(plan_path, used)
    if not entries and ("tpu" in dev.lower() or platform != "cpu"):
        suffix = f"|{h}x{w}]"
        p = pathlib.Path(plan_path)
        if p.exists():
            for line in p.read_text().splitlines():
                line = line.strip()
                if line.startswith("[TPU") and line.endswith(suffix):
                    used = line[1:-1]
                    entries = native.plan_load(plan_path, used)
                    break
    return entries, used


def tune_kernels(h: int, w: int, cfg: PipelineConfig = DEFAULT_CONFIG,
                 plan_path: str = PLAN_PATH, n_iter: int = 16,
                 time_fn=None) -> PipelineConfig:
    """Profile EVERY Pallas kernel instance on THIS device and persist
    the winning block geometry — the reference's local-work-size
    autotune (startProfiling/finishProfiling/savePlan,
    oclhelper.c:312-605, driven by rect.cpp:88-98) reduced to the block
    parameters that matter for this pipeline's kernels: the three CCL
    instances plus the gradient front, NMS thinning, morphology chain,
    quantize+despeckle, distinct-bid window and blblur kernels (walk and
    slot capacities are data-dependent, covered by calibrate() instead).

    The instances want OPPOSITE block shapes (docs/STATUS.md): the
    PIECES instance (strength labels, block-local by design) floods
    fastest with small blocks; the EXACT instances (region-merge links,
    boundary) want the largest legal block because seam union + the
    reseeded second pass dominate.  Tuned and persisted separately as
    pieces_bh / merge_bh / boundary_bh.

    Timing uses the amortized single-readback protocol (pre-uploaded
    input, n_iter submissions, one tiny readback) — the only protocol
    that is truthful on relay-transported devices, where
    block_until_ready acks enqueue rather than completion.

    time_fn(kind, bh) -> seconds overrides the measurement (tests).
    Candidates that exceed the VMEM budget at this width are clamped or
    skipped (pallas_ccl._clamp_bh); failures are skipped.  NOTE: pieces
    boundaries depend on pieces_bh — rerun the capacity calibration
    after changing it."""
    import time

    import jax
    import jax.numpy as jnp

    if time_fn is None and jax.default_backend() != "tpu":
        print("tune_kernels: backend is not TPU — the block height only "
              "drives the Pallas kernels; nothing to tune, plan unchanged")
        return cfg

    if time_fn is None:
        from rectdetect_tpu.ops.pallas_ccl import (label_components_exact,
                                                   label_components_pieces,
                                                   label_merge_exact)
        from rectdetect_tpu.ops.pallas_grad import edge_front_pallas
        from rectdetect_tpu.ops.pallas_thin import thinthres_pallas
        from rectdetect_tpu.ops.pallas_morph import (morph_chain_pallas,
                                                     quant_despeckle_pallas,
                                                     distinct_bids_pallas)
        from rectdetect_tpu.ops.pallas_blblur import (blblur_pallas_blocked,
                                                      blblur_pallas_fused)

        rng = np.random.default_rng(0)
        # pieces tune at noisy strings density (~30%); boundary at the
        # sparse strip density (~2%); merge on quantized color blocks
        noisy = jax.device_put(jnp.asarray(
            (rng.random((h, w)) < 0.3).astype(np.int32)))
        strip = jax.device_put(jnp.asarray(
            (rng.random((h, w)) < 0.02).astype(np.int32) - 1))
        packed = jax.device_put(jnp.asarray(
            rng.integers(0, 2 ** 22, (h, w), dtype=np.int32)))
        zero = jax.device_put(jnp.zeros((h, w), jnp.int32))
        labb = jax.device_put(jnp.asarray(
            rng.random((h, w, 3), np.float32)))
        emag = jax.device_put(jnp.asarray(
            rng.random((h, w), np.float32)))
        th = rng.uniform(0, 2 * np.pi, (h, w)).astype(np.float32)
        vec = jax.device_put(jnp.stack(
            [jnp.asarray(np.cos(th)), jnp.asarray(np.sin(th))], -1))
        np.asarray(noisy)[:1]

        def runner(make):
            def f(bh):
                g = jax.jit(lambda: make(bh))
                r = g()
                np.asarray(r)[:1, :1]          # compile + settle
                t0 = time.perf_counter()
                for _ in range(n_iter):
                    r = g()
                np.asarray(r)[:1, :1]          # drain the queue
                return (time.perf_counter() - t0) / n_iter
            return f

        kinds = {
            "pieces_bh": ((8, 16, 32, 64), runner(
                lambda bh: label_components_pieces(
                    noisy, 0, cfg.weak_ccl_round_cap, bh=bh))),
            "merge_bh": ((96, 192, 256), runner(
                lambda bh: label_merge_exact(packed, zero, zero, bh=bh))),
            "boundary_bh": ((96, 192, 256), runner(
                lambda bh: label_components_exact(
                    strip, -1, bh=bh,
                    round_cap=cfg.boundary_ccl_round_cap))),
            "grad_bh": ((16, 32, 64, 128), runner(
                lambda bh: edge_front_pallas(labb, bh=bh)[0])),
            "thin_bh": ((8, 16, 32, 64), runner(
                lambda bh: thinthres_pallas(emag, vec, bh=bh))),
            "morph_bh": ((64, 128, 192, 256), runner(
                lambda bh: morph_chain_pallas(noisy, "rect", bh=bh))),
            "quant_bh": ((32, 64, 128), runner(
                lambda bh: quant_despeckle_pallas(packed, emag, bh=bh))),
            "bids_bh": ((32, 64, 128), runner(
                lambda bh: distinct_bids_pallas(strip, bh=bh)[0])),
            "blblur_block": ((64, 128, 256), runner(
                lambda b: blblur_pallas_blocked(packed, noisy, 10,
                                                block=b))),
            # form switch: 0 = per-pass blocked (at block=256, the
            # typical blblur_block winner), >0 = fused iterations per
            # launch with its budget-derived block
            "blblur_fuse": ((0, 1, 2), runner(
                lambda f: blblur_pallas_blocked(packed, noisy, 10,
                                                block=256) if f == 0
                else blblur_pallas_fused(packed, noisy, 10, fuse=f))),
        }
    else:
        _cands = {
            "pieces_bh": (8, 16, 32, 64),
            "merge_bh": (96, 192, 256),
            "boundary_bh": (96, 192, 256),
            "grad_bh": (16, 32, 64, 128),
            "thin_bh": (8, 16, 32, 64),
            "morph_bh": (64, 128, 192, 256),
            "quant_bh": (32, 64, 128),
            "bids_bh": (32, 64, 128),
            "blblur_block": (64, 128, 256),
            "blblur_fuse": (0, 1, 2),
        }
        kinds = {k: (c, functools.partial(time_fn, k))
                 for k, c in _cands.items()}

    winners = {}
    for kind, (candidates, fn) in kinds.items():
        results = {}
        for bh in candidates:
            try:
                results[bh] = fn(bh)
            except Exception as e:              # illegal block / fault
                print(f"tune_kernels: {kind} bh={bh} failed "
                      f"({type(e).__name__})")
        if not results:
            continue
        best = min(results, key=results.get)
        for bh in sorted(results):
            mark = " <-- best" if bh == best else ""
            print(f"tune_kernels: {kind:12s} bh={bh:4d}  "
                  f"{results[bh] * 1e3:8.2f} ms{mark}")
        winners[kind] = int(best)
    if not winners:
        return cfg

    new = dataclasses.replace(cfg, **winners)
    import jax as _jax
    dev = _jax.devices()[0].device_kind
    key = _key(dev, h, w)
    entries = native.plan_load(plan_path, key)
    for k, v in winners.items():
        entries[k] = str(v)
    native.plan_save(plan_path, key, entries)
    return new


def load_calibrated_config(h: int, w: int,
                           cfg: PipelineConfig = DEFAULT_CONFIG,
                           plan_path: str = PLAN_PATH,
                           verbose: bool = False,
                           batch: bool = False) -> PipelineConfig:
    """Apply a persisted calibration if one exists (loadPlan analog).

    Falls back across TPU device-kind spellings ("TPU v5 lite" vs
    "TPU v5e" vs relay-specific kinds): if the exact key misses and the
    device looks like a TPU, any persisted TPU entry at the same
    resolution applies — capacities depend on the workload, not the
    chip generation.

    batch=True additionally pins the runtime capacity switches for
    vmapped throughput mode (a batched lax.cond predicate makes XLA run
    BOTH branches and select): the strings/arc switches pin to the
    small branch (calibration sizes those caps to fit the scene class
    by construction), the region-runs switch pins per the plan's
    measured run density, and the walk tail pins to full-table rounds
    (its engage predicate depends on chain structure, which the density
    plan does not capture — full is the exact, cond-free choice)."""
    import sys

    import jax
    d0 = jax.devices()[0]
    dev = d0.device_kind
    entries, used = _plan_lookup(dev, d0.platform, h, w, plan_path)
    if not entries:
        if verbose:
            print(f"calibrate: no plan entry for {_key(dev, h, w)}",
                  file=sys.stderr)
        return cfg
    if verbose:
        print(f"calibrate: applying plan [{used}] (device kind "
              f"{dev!r})", file=sys.stderr)
    pins = {}
    if batch:
        pins = dict(
            pin_strings_branch=1,
            pin_arc_branch=1,
            pin_walk_tail=2,
            pin_walk_prefilter=1,
            pin_cycle_walk=2,
            pin_rect_strings=1,
            pin_region_runs=int(entries.get("pin_region_runs", 1)),
        )
    return dataclasses.replace(
        cfg,
        **pins,
        sparse_factor=int(entries.get("sparse_factor",
                                      cfg.sparse_factor)),
        rect_strings_small=int(entries.get("rect_strings_small",
                                           cfg.rect_strings_small)),
        strings_sparse_factor=int(entries.get(
            "strings_sparse_factor", cfg.strings_sparse_factor)),
        strings_small_factor=int(entries.get(
            "strings_small_factor", cfg.strings_small_factor)),
        boundary_sparse_factor=int(entries.get(
            "boundary_sparse_factor", cfg.boundary_sparse_factor)),
        arc_sparse_factor=int(entries.get("arc_sparse_factor",
                                          cfg.arc_sparse_factor)),
        arc_small_factor=int(entries.get("arc_small_factor",
                                         cfg.arc_small_factor)),
        cycle_sparse_factor=int(entries.get("cycle_sparse_factor",
                                            cfg.cycle_sparse_factor)),
        region_run_factor=int(entries.get("region_run_factor",
                                          cfg.region_run_factor)),
        ls_capacity=int(entries.get("ls_capacity", cfg.ls_capacity)),
        max_groups=int(entries.get("max_groups", cfg.max_groups)),
        walk_prefilter_factor=int(entries.get(
            "walk_prefilter_factor", cfg.walk_prefilter_factor)),
        ccl_bh=int(entries.get("ccl_bh", cfg.ccl_bh)),
        pieces_bh=int(entries.get("pieces_bh", cfg.pieces_bh)),
        merge_bh=int(entries.get("merge_bh", cfg.merge_bh)),
        boundary_bh=int(entries.get("boundary_bh", cfg.boundary_bh)),
        grad_bh=int(entries.get("grad_bh", cfg.grad_bh)),
        thin_bh=int(entries.get("thin_bh", cfg.thin_bh)),
        morph_bh=int(entries.get("morph_bh", cfg.morph_bh)),
        quant_bh=int(entries.get("quant_bh", cfg.quant_bh)),
        bids_bh=int(entries.get("bids_bh", cfg.bids_bh)),
        blblur_block=int(entries.get("blblur_block", cfg.blblur_block)),
        blblur_fuse=int(entries.get("blblur_fuse", cfg.blblur_fuse)),
    )


def show_plan(plan_path: str = PLAN_PATH) -> None:
    """Print the persisted calibration table (showPlan analog,
    oclhelper.c:443-462)."""
    import pathlib
    p = pathlib.Path(plan_path)
    if not p.exists():
        print(f"no plan at {plan_path}")
        return
    section = None
    rows = {}
    for line in p.read_text().splitlines():
        line = line.strip()
        if line.startswith("[") and line.endswith("]"):
            section = line[1:-1]
            rows[section] = {}
        elif section and " " in line:
            k, v = line.split(None, 1)
            rows[section][k] = v
    keys = sorted({k for r in rows.values() for k in r})
    wid = max((len(s) for s in rows), default=10)
    print(f"{'device|res':{wid}}  " + "  ".join(f"{k}" for k in keys))
    for sec in sorted(rows):
        print(f"{sec:{wid}}  " + "  ".join(
            f"{rows[sec].get(k, '-'):>{len(k)}}" for k in keys))


def clear_plan(plan_path: str = PLAN_PATH) -> None:
    """Delete the persisted calibration (clearPlan analog,
    oclhelper.c:529-553)."""
    import pathlib
    pathlib.Path(plan_path).unlink(missing_ok=True)
    print(f"cleared {plan_path}")


def main(argv=None):
    """showPlan / clearPlan / kernel-autotune CLI (rect.cpp:86-101
    analogs)."""
    import sys as _sys
    argv = _sys.argv if argv is None else argv
    if "--clear" in argv:
        clear_plan()
    elif "--kernels" in argv:
        res = next((a for a in argv[1:] if "x" in a), "720x1280")
        _h, _w = (int(v) for v in res.split("x"))
        tune_kernels(_h, _w)
        show_plan()
    else:
        show_plan()
    return 0


if __name__ == "__main__":
    main()
