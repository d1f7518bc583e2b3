"""Pipeline configuration.

All tunables of the reference are compile-time literals scattered through the
sources (e.g. strength thresholds oclrect.c:277/307, minerror/sizeThre
oclrect.c:361, BLBLURSIZE oclrect.cl:72, MINNINDEX oclpolyline.cl:21).  Here
they live in one dataclass with the same defaults, so every app and test uses
a single source of truth.  Fields are hashable so a config can be a static
argument to jit.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    # ---- edge front-end -------------------------------------------------
    blur_radius: int = 2          # reference runs iirblur with r=2 (oclrect.c:248)
    # bit-parity mode: use the reference's fixed-point LUT sRGB->packed-Lab
    # conversion (srgb2plab, regenerated tables — core/luts.py) instead of
    # the closed form (<=0.4% scale difference, docs/STATUS.md)
    color_exact: bool = False
    # ---- connected component labeling (fixed trip counts, ref values) ---
    # The reference runs MAXPASS=10 passes x 6 jumps (oclimgutil.c:229,
    # oclimgutil.cl:531).  With the row/column scan flood each pass is
    # strictly stronger; 8x2 converges on 45%-density noise and spirals
    # (tests/test_ccl.py::test_convergence_margin pins this empirically)
    # at under half the serial gather count.
    ccl_passes: int = 8
    ccl_jumps: int = 2
    # ACCURACY EXTENSION (not in the reference): bridge straight 2-px
    # gaps between chain ends before stringify (morphology.
    # simple_connect2) — closes the staircase holes the reference's
    # thinning leaves on shallow-slope edges, which otherwise fragment
    # a quad side below the polyline size filter.  Off by default so
    # PipelineConfig() reproduces reference semantics; use
    # EXTENDED_CONFIG / PipelineConfig.extended() to opt in.
    bridge_gap2: bool = False
    # Fail-open repair rounds after each strength filter (see
    # ccl.rescue_filtered): a killed string pixel 8-adjacent to a
    # surviving one is same-component under exact CCL, so exact
    # filtering would keep it.  0 disables (reference-faithful default;
    # extension preset enables 3 rounds).
    strength_rescue_rounds: int = 0
    # Pallas block-CCL block height; 0 = derive from the VMEM budget
    # (pallas_ccl._pick_bh).  Autotuned per device+resolution by
    # runtime.calibrate.tune_kernels (the plan.txt local-work-size
    # analog, oclhelper.c:312-605) and applied by load_calibrated_config.
    ccl_bh: int = 0
    # Per-instance block heights (override ccl_bh=0; measured on v5e at
    # 720p, tools notes in docs/STATUS.md).  The PIECES instance (weak
    # strength labels) floods fastest with small blocks — its output is
    # per-block by design so seams are free; EXACT instances (region
    # merge links, boundary) want the largest legal block because the
    # seam-union + reseeded second pass dominate: fewer seams win.
    pieces_bh: int = 16
    merge_bh: int = 192
    boundary_bh: int = 256
    # Block geometry of every other Pallas kernel (defaults = measured
    # v5e 720p winners); all are profiled and persisted per
    # device+resolution by tune_kernels alongside the CCL instances, so
    # the plan.txt analog covers every pallas_call site.
    grad_bh: int = 32             # edge_front_pallas (fused gradient stage)
    thin_bh: int = 16             # thinthres/thincubic NMS kernel
    morph_bh: int = 128           # morph_chain_pallas (all variants)
    quant_bh: int = 64            # quant_despeckle_pallas
    bids_bh: int = 64             # distinct_bids_pallas (reduceLS window)
    blblur_block: int = 128       # blblur_pallas_blocked row block
    blblur_fuse: int = 0          # >0: fused (H,V) iterations per kernel
                                  # launch (blblur_pallas_fused); 0 =
                                  # per-pass blocked form
    labelpl_passes: int = 12      # N, oclpolyline.c:172
    labelpl_jumps: int = 2        # ref 8, oclpolyline.cl:340; see ccl_jumps
    labelmerge_passes: int = 8    # oclrect.c:328
    labelmerge_jumps: int = 8     # oclrect.cl:328
    # ---- arc numbering --------------------------------------------------
    number_doublings: int = 14    # reach 2^14 px chains (ref reaches ~32768, oclpolyline.cl:287)
    # Two-phase walk (chain.arc_chain_sparse): after reach
    # 2^walk_tail_switch the short-fragment states have converged and
    # the remaining doublings run over a compacted sub-list of
    # 2S//walk_tail_factor states.  On the strong-edge strings the walk
    # actually runs on, the survivors are the LONG chains (quad sides),
    # so the cap must cover a large fraction: /3 engages the sub-list on
    # the bench scene (-6.5 ms vs a tight cap whose runtime overflow
    # check falls back to full-table rounds).  Overflow falls back via
    # lax.cond — always exact.  walk_tail_factor=0 disables.
    # (measured sweep, round 3: switch 3 + factor 4 beat the round-2
    # defaults 22.3 -> 19.2 ms on the bench scene; factor2=32 variants
    # overflow and fall back, much slower)
    walk_tail_switch: int = 3
    walk_tail_factor: int = 4
    # Small-component pre-kill before the walk (polyline tail): an
    # 8-connected strings component of <= size_thre px can never yield
    # a kept arc (walk chains are subsets of components, and the arc
    # size filter needs chain length - 1 > size_thre), so those slots
    # are dropped BEFORE the walk and the dominant doubling gathers run
    # at the survivor capacity n//walk_prefilter_factor.  Detection is
    # exact without converged CCL: capped block-local pieces + a
    # closure test (see polyline._small_component_kill).  A runtime
    # cond falls back to the unfiltered walk when survivors overflow.
    # 0 disables.
    walk_prefilter_factor: int = 24
    # Second tail stage: after walk_tail_rounds2 more rounds at the
    # first cap (reach 2^(switch+rounds2)), the survivors are
    # re-compacted to 2S//walk_tail_factor2 — only states further than
    # the reach from both chain ends (and cycles) remain, so the last
    # rounds run over a far shorter list.  Overflow falls back to
    # full-table rounds for that stage (exact).  factor2=0 disables.
    walk_tail_rounds2: int = 4
    walk_tail_factor2: int = 16
    # ---- polyline stage -------------------------------------------------
    mkpl_iters: int = 16          # N, oclpolyline.c:188 (N-1 subdivision rounds)
    # TPU: run the mkpl subdivision iterations in one sorted-domain VMEM
    # megakernel (ops/pallas_mkpl.py) instead of the XLA per-iteration
    # form — identical output, removes ~6 latency-bound random row ops
    # per iteration.  0 disables (XLA everywhere).
    mkpl_pallas: int = 1
    min_n_index: int = 4          # MINNINDEX, oclpolyline.cl:21
    min_edge_len: float = 1.0     # MINEDGELEN, oclpolyline.cl:20
    # Segment arena capacity.  Arcs survive only above sizeThre (~20 px),
    # so even a pathological all-structure 720p frame yields < 16k arcs
    # (16k x 21 px = 37% of the frame); the reference's byte budget allows
    # 263k (oclrect.c:361) but never approaches it post-filter.
    ls_capacity: int = 16384
    # ---- rect pipeline --------------------------------------------------
    strength_scale: float = 10000.0  # fixed-point scale, oclimgutil.cl:648
    strength_weak: int = 500      # oclrect.c:277
    strength_strong: int = 2500   # oclrect.c:307
    blblur_size: int = 4          # BLBLURSIZE, oclrect.cl:72
    blblur_iters: int = 10        # oclrect.c:286-296
    quantize_levels: int = 24     # oclrect.c:300
    despeckle2_thre: int = 16     # oclrect.c:335
    minerror_rect: float = 4.0    # oclrect.c:361
    size_thre_rect: int = 20      # oclrect.c:361
    # ---- poly tool defaults ---------------------------------------------
    minerror_poly: float = 1.0    # poly.cpp:123
    size_thre_poly: int = 20      # poly.cpp:123
    strength_poly: int = 500      # poly.cpp:120
    # ---- sparse labeling ------------------------------------------------
    # Pointer-jump/scatter machinery runs over compacted foreground slot
    # lists of capacity H*W//sparse_factor (0 = dense).  NMS thinning of
    # sensor noise keeps ~30% of pixels regardless of noise amplitude
    # (local-maxima fraction is scale-free), so /3 is the worst-case-safe
    # default; clean synthetic scenes can use /8+.
    sparse_factor: int = 3
    boundary_sparse_factor: int = 3
    # small-capacity branch of the rect-strings strength pair (see
    # pipeline/rect.py edge_labeling): engaged at runtime whenever the
    # stringified foreground fits h*w//rect_strings_small — exactly
    # equal output; 0 disables.  Calibrated at 1.2x margin over the
    # measured rect-strings density (sparse_factor keeps its 1.6x
    # truncation-safety margin as the fallback cap).
    rect_strings_small: int = 0
    # ---- Pallas CCL round caps (TPU path) -------------------------------
    # In-VMEM flood rounds per block pass.  The weak-edge instance's labels
    # feed only the strength filters, so block-local piece labels with a
    # modest cap give the identical filtered output (the reference makes
    # the same approximation with MAXPASS=10, oclimgutil.c:229); pieces of
    # geodesic radius >= cap always clear the 2500 threshold.  The
    # boundary instance keeps the two-level seam-exact scheme, capped high
    # enough that real region boundaries always converge (scans close
    # straight strips per round; only percolated-noise boundaries are cut
    # off).  0 = uncapped.
    weak_ccl_round_cap: int = 48
    boundary_ccl_round_cap: int = 128
    # Boundary strips are 1-5% dense on typical frames: the XLA sparse
    # gather CCL can undercut the density-independent Pallas block flood
    # there.  Off until measured on hardware (tools/ccl_bench.py
    # boundary); both paths are exact.
    boundary_tpu_sparse: bool = False
    # Inside polyline_execute the strings have passed removeBranch
    # (degree <= 2), which caps realistic density well below the raw
    # stringified map: measured 12% on a 30%-noise frame and 21.5% on
    # 45% adversarial noise (the theoretical 50% needs pixel-perfect
    # alternating diagonal texture; truncation degrades gracefully and
    # calibration tightens/loosens per scene).  /4 covers the measured
    # adversarial tail; the runtime small-list switch keeps typical
    # frames at strings_small_factor cost regardless.
    strings_sparse_factor: int = 4
    # small-capacity branch of the runtime switch in polyline_execute:
    # used whenever the actual strings foreground fits (exactly equal
    # output then — compact_mask drops nothing below the cap); measured
    # 8.1% on the noisy 720p bench scene, so /10 engages on typical
    # frames and /6 absorbs the adversarial tail.
    strings_small_factor: int = 10
    # cycle re-numbering sub-list in chain.arc_chain_sparse: cycles that
    # survive stringify/removeBranch are closed rings (>= ~12 px each);
    # even ring-packed adversarial frames stay under ~8% of pixels, and
    # noise frames measure far lower.  Overflow drops whole rings
    # deterministically (they become no arcs, like break_loops residue).
    cycle_sparse_factor: int = 24
    # mkpl/refine run after the arc size filter (> sizeThre px), which
    # kills nearly all noise arcs: measured 0.32% density on a 30%-noise
    # 720p frame but 3.5% on a real textured photograph (the size filter
    # keeps long structure chains).  The DEFAULT is sized for robustness
    # at /12 (~8.3%) — real photos measured <=4.6% strong density, which
    # bounds arcs from above; calibrated plans tighten it per scene
    # class (factor_for(arcs_d)), and plan_fits probes the strong
    # density against this cap so stale plans recalibrate rather than
    # silently truncate (round-3 photo-corpus finding: /48 dropped 60%
    # of grace_hopper's segments at the 4096 floor).  The runtime
    # small-branch switch keeps the fast path on sparse scenes either
    # way.
    arc_sparse_factor: int = 12
    # small-capacity branch of the runtime arc switch in the polyline
    # tail: when the post-filter arc pixels fit n//arc_small_factor,
    # mkpl/refine's 15 iterations of slot gathers and arena scatters run
    # at this capacity AND the working segment arena shrinks to match
    # (segment count <= arc pixel count, see _polyline_tail_sparse).
    # 0 disables the switch.
    arc_small_factor: int = 192
    # run-length region representation for calcSize + despeckle2
    # (regions.sizes_despeckle2): run-list capacity H*W//factor; region
    # maps measure ~2% run density, /16 keeps a 3x margin and a runtime
    # cond falls back to the dense pair beyond it.  0 = always dense.
    region_run_factor: int = 16
    # ---- hypothesis / pose ----------------------------------------------
    probe_n: int = 3              # probe points along segment, oclrect.c:1070
    probe_dist: int = 2           # perpendicular probe offsets, oclrect.c:1070
    ls_min_len_polyline: float = 32.0   # LSTHRE, oclrect.c:1182
    short_ls_ratio: float = 0.05  # removeShortLS, oclrect.c:1134
    max_groups: int = 192         # fixed cap of boundary/polyline hypothesis groups
    max_group_segs: int = 48      # fixed cap of candidate segments per group
    hull_max_vertices: int = 24   # fixed cap of hull vertices per group
    cg_iters: int = 12            # oclrect.c:612
    cg_line_search_iters: int = 10
    accept_value: float = 0.05    # looksLikeAScreen, oclrect.c:637
    aspect_limit: float = 12.0    # oclrect.c:643
    offset_ratio_limit: float = 100.0  # oclrect.c:653

    # ---- branch pinning (batched throughput mode) -----------------------
    # The runtime capacity switches above are lax.conds on per-frame
    # scalars; under vmap (rect_frames) a batched predicate makes XLA
    # execute BOTH branches and select — the measured cause of batching
    # running ~3x slower per frame than single-frame mode.  Batch serving
    # pins each switch from the calibration plan instead (the plan's
    # densities decide the branch for the scene class; overflow on a
    # pinned small branch degrades deterministically exactly like the
    # documented overflow behavior of that branch).  0 = runtime cond,
    # 1 = pin small/run-length/sub-list, 2 = pin big/dense/full-table.
    pin_strings_branch: int = 0
    pin_arc_branch: int = 0
    pin_walk_tail: int = 0
    pin_region_runs: int = 0
    pin_walk_prefilter: int = 0
    # cycle re-walk skip (chain.arc_chain_sparse pass B): 0 = runtime
    # cond on the cycle count (typical frames have zero surviving
    # cycles, so the n_doublings re-walk rounds are skipped), 1 = pin
    # skip, 2 = pin always-run (batched mode: exact and cond-free)
    pin_cycle_walk: int = 0
    # rect-strings strength-pair capacity switch: 0 = runtime cond,
    # 1 = pin small, 2 = pin the sparse_factor cap
    pin_rect_strings: int = 0

    def ls_cap_for(self, iw: int, ih: int) -> int:
        """Arena capacity: min(config cap, reference's byte budget iw*ih*4*4/56)."""
        return int(min(self.ls_capacity, max(256, iw * ih * 16 // 56)))

    @classmethod
    def extended(cls, **overrides) -> "PipelineConfig":
        """Accuracy-extension preset (beyond-reference behavior, opt-in):
        2-px staircase gap bridging + strength-filter rescue rounds.
        Measured A/B vs the faithful default in tools/parity_report.py."""
        base = dict(bridge_gap2=True, strength_rescue_rounds=3)
        base.update(overrides)
        return cls(**base)


DEFAULT_CONFIG = PipelineConfig()
EXTENDED_CONFIG = PipelineConfig.extended()
