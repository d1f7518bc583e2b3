"""Sharded rect-tail stages: exact tile-vs-single-chip equivalence.

The front-end products are computed ONCE single-chip and sharded into the
tiled stages, so these tests pin the tail's cross-tile machinery (halo
exchanges, root-table CCL, psum'd component tables) bit-exactly, without
the known borderline-NMS float flips at tile seams (test_dist.py)."""

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import PartitionSpec as P
import pytest

from rectdetect_tpu.config import PipelineConfig
from rectdetect_tpu.dist import mesh as dmesh
from rectdetect_tpu.dist import tile as dtile
from rectdetect_tpu.ops import ccl, morphology, regions
from rectdetect_tpu.pipeline.frontend import edge_frontend
from tests.conftest import synth_scene

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")

CFG = PipelineConfig(ls_capacity=512, max_groups=16, max_group_segs=16,
                     number_doublings=10, sparse_factor=0)


def _frontend(h, w, seed=7):
    fe = edge_frontend(jnp.asarray(synth_scene(h=h, w=w, seed=seed)), CFG)
    return fe.packed0, fe.edge_thin, fe.edge_bin


def _single_chip_tail_maps(packed0, edge_thin, edge_bin, cfg=CFG):
    """The dense single-chip stage sequence of rect_tail up to boundary."""
    s = morphology.strings_chain(edge_bin, "rect",
                                 bridge2=cfg.bridge_gap2)
    lbl = ccl.label_components(s, 0, cfg.ccl_passes, cfg.ccl_jumps)
    st = ccl.calc_strength(edge_thin, lbl, cfg.strength_scale)
    weak = ccl.filter_strength(lbl, st, cfg.strength_weak)
    weak_bin = (weak > 0).astype(jnp.int32)
    blurred = regions.blblur(packed0, weak_bin, cfg.blblur_iters)
    despeck = regions.quantize_despeckle(blurred, edge_thin,
                                         cfg.quantize_levels,
                                         cfg.quantize_levels,
                                         cfg.quantize_levels)
    strong = ccl.filter_strength(weak, st, cfg.strength_strong)
    mask = regions.junction_merge_mask(strong)
    seg = regions.label_merge(despeck, mask, strong,
                              cfg.labelmerge_passes, cfg.labelmerge_jumps)
    sizes = regions.label_sizes(seg)
    seg = regions.despeckle2(seg, sizes, cfg.despeckle2_thre)
    bmark = regions.mark_boundary(seg)
    boundary = ccl.label_components(bmark, -1, cfg.ccl_passes,
                                    cfg.ccl_jumps)
    return dict(strings=s, weak=weak, blurred=blurred, despeck=despeck,
                strong=strong, mask=mask, seg=seg, bmark=bmark,
                boundary=boundary)


def _tiled_tail_maps(packed0, edge_thin, edge_bin, n_tiles, cfg=CFG):
    m = dmesh.make_mesh(1, n_tiles)

    @functools.partial(
        shard_map, mesh=m,
        in_specs=(P(None, "tile"),) * 3,
        out_specs={k: P(None, "tile") for k in
                   ("strings", "weak", "blurred", "despeck", "strong",
                    "mask", "seg", "bmark", "boundary")},
        check_vma=False)
    def run(pk, et, eb):
        s = dtile.strings_chain_tiled(eb, "rect",
                                      bridge2=cfg.bridge_gap2)
        glabel = dtile.ccl_tiled(s, 0, cfg=cfg)
        st = dtile.calc_strength_tiled(et, glabel, cfg.strength_scale)
        weak = dtile.filter_strength_tiled(glabel, st, cfg.strength_weak)
        weak_bin = (weak > 0).astype(jnp.int32)
        blurred = dtile.blblur_tiled(pk, weak_bin, cfg.blblur_iters)
        despeck = dtile.quantize_despeckle_tiled(blurred, et, cfg)
        strong = dtile.filter_strength_tiled(weak, st, cfg.strength_strong)
        mask = dtile.junction_merge_mask_tiled(strong)
        seg = dtile.label_merge_tiled(despeck, mask, strong, cfg)
        sizes = dtile.label_sizes_tiled(seg)
        seg2 = dtile.despeckle2_tiled(seg, sizes, cfg.despeckle2_thre)
        bmark = dtile.mark_boundary_tiled(seg2)
        boundary = dtile.ccl_tiled(bmark, -1, cfg=cfg)
        return dict(strings=s, weak=weak, blurred=blurred,
                    despeck=despeck, strong=strong, mask=mask, seg=seg2,
                    bmark=bmark, boundary=boundary)

    return jax.jit(run)(packed0, edge_thin, edge_bin)


@pytest.mark.parametrize("seed,hw", [(7, (48, 32 * 8)),
                                     (21, (56, 24 * 8))])
def test_tail_stages_tiled_exact(seed, hw):
    """Every sharded stage equals its single-chip stage bitwise
    (fuzzed over scene seeds and non-128-aligned tile widths)."""
    packed0, et, eb = _frontend(hw[0], hw[1], seed=seed)
    ref = {k: np.asarray(v) for k, v in
           _single_chip_tail_maps(packed0, et, eb).items()}
    got = {k: np.asarray(v) for k, v in
           _tiled_tail_maps(packed0, et, eb, 8).items()}
    for k in ("strings", "weak", "blurred", "despeck", "strong", "mask",
              "seg", "bmark", "boundary"):
        np.testing.assert_array_equal(got[k], ref[k], err_msg=k)


def test_tail_stages_tiled_exact_multihop_halo():
    """Tiles narrower than the blblur halo force the multi-hop const
    halo-exchange path; still bit-exact."""
    packed0, et, eb = _frontend(40, 16 * 8, seed=11)
    ref = _single_chip_tail_maps(packed0, et, eb)
    got = _tiled_tail_maps(packed0, et, eb, 8)
    np.testing.assert_array_equal(np.asarray(got["blurred"]),
                                  np.asarray(ref["blurred"]))
    np.testing.assert_array_equal(np.asarray(got["seg"]),
                                  np.asarray(ref["seg"]))
    np.testing.assert_array_equal(np.asarray(got["boundary"]),
                                  np.asarray(ref["boundary"]))


def test_ccl_tiled_boustrophedon_exact():
    """A single serpentine component crossing every seam ~H/2 times: the
    seam-graph resolve must converge exactly (per-round seam relaxation
    would need one round per crossing)."""
    from rectdetect_tpu.ops.ccl import label_components

    h, wl, nt = 48, 16, 8
    w = wl * nt
    pix = np.zeros((h, w), np.int32)
    # boustrophedon: full rows joined by alternating end columns
    for r, y in enumerate(range(2, h - 2, 2)):
        pix[y, 1:w - 1] = 1
        col = w - 2 if r % 2 == 0 else 1
        if y + 2 < h - 2:
            pix[y + 1, col] = 1
    ref = np.asarray(label_components(jnp.asarray(pix), 0, 24, 8))
    assert len(np.unique(ref[ref >= 0])) == 1     # one component

    m = dmesh.make_mesh(1, nt)

    @functools.partial(shard_map, mesh=m, in_specs=P(None, "tile"),
                       out_specs=P(None, "tile"), check_vma=False)
    def run(tile):
        return dtile.ccl_tiled(tile, 0)

    got = np.asarray(jax.jit(run)(jnp.asarray(pix)))
    np.testing.assert_array_equal(got, ref)


def test_polyline_execute_sharded_slots_exact():
    """polyline_execute with axis_name (sharded arc walk + sharded mkpl
    slot iterations) is bit-identical to the replicated computation."""
    from rectdetect_tpu.ops.polyline import polyline_execute

    cfg = PipelineConfig(ls_capacity=512, number_doublings=10)
    packed0, et, eb = _frontend(48, 32 * 8, seed=9)
    sb = eb  # any binary edge map works as polyline input
    ref_arena, ref_lsid = polyline_execute(sb, 4.0, 20, 512, cfg)

    m = dmesh.make_mesh(1, 8)

    @functools.partial(shard_map, mesh=m, in_specs=P(),
                       out_specs=P(), check_vma=False)
    def run(x):
        a, l = polyline_execute(x, 4.0, 20, 512, cfg, axis_name="tile")
        return a, l

    got_arena, got_lsid = jax.jit(run)(sb)
    np.testing.assert_array_equal(np.asarray(got_lsid),
                                  np.asarray(ref_lsid))
    for f in ("sx", "sy", "ex", "ey", "polyid", "right_ptr", "npix"):
        np.testing.assert_array_equal(np.asarray(getattr(got_arena, f)),
                                      np.asarray(getattr(ref_arena, f)),
                                      err_msg=f)


def test_rect_tail_tiled_matches_dense_rect_tail():
    """End-to-end: sharded tail + replicated geometry equals the dense
    single-chip rect_tail on identical front-end products."""
    from rectdetect_tpu.pipeline.rect import rect_tail
    packed0, et, eb = _frontend(48, 32 * 4, seed=3)
    tan = math.tan(math.radians(72) / 2)
    ref = rect_tail(packed0, et, eb, tan, CFG)

    m = dmesh.make_mesh(1, 4)

    @functools.partial(shard_map, mesh=m, in_specs=(P(None, "tile"),) * 3,
                       out_specs=P(), check_vma=False)
    def run(pk, e_t, e_b):
        return dtile.rect_tail_tiled(pk, e_t, e_b, tan, CFG)

    got = jax.jit(run)(packed0, et, eb)
    np.testing.assert_array_equal(np.asarray(got.valid),
                                  np.asarray(ref.valid))
    np.testing.assert_allclose(np.asarray(got.c2), np.asarray(ref.c2),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.value),
                               np.asarray(ref.value), atol=1e-5)


def test_poly_step_tiled_matches_single_chip():
    """Tiled poly pipeline (sharded front-end + edge labeling, replicated
    polyline with sharded walk) equals the exact single-chip composition."""
    from rectdetect_tpu.ops import ccl as C, morphology, polyline as PL
    from rectdetect_tpu.pipeline.frontend import edge_frontend

    cfg = PipelineConfig(ls_capacity=512, number_doublings=10)
    bgr = synth_scene(h=48, w=32 * 8, seed=15)
    fe = edge_frontend(jnp.asarray(bgr), cfg)
    lbl = C.label_components(fe.edge_bin, 0, cfg.ccl_passes, cfg.ccl_jumps)
    st = C.calc_strength(fe.edge_thin, lbl, cfg.strength_scale)
    edge = (C.filter_strength(lbl, st, 2000) > 0).astype(jnp.int32)
    ref_arena, ref_lsid = PL.polyline_execute(edge, 1.0, 20, 512, cfg)

    m = dmesh.make_mesh(1, 8)

    @functools.partial(shard_map, mesh=m, in_specs=P(None, "tile", None),
                       out_specs=P(), check_vma=False)
    def run(t):
        return dtile.poly_step_tiled(t, cfg, 1.0, 20, 2000)

    got_arena, got_lsid = jax.jit(run)(jnp.asarray(bgr))
    # front-end float reassociation can flip borderline NMS pixels at
    # seams; require full agreement of the surviving segment geometry
    # for matching ids and <1% lsid disagreement
    ref_l = np.asarray(ref_lsid)
    got_l = np.asarray(got_lsid)
    assert (ref_l != got_l).mean() < 0.01
    live = (np.asarray(ref_arena.polyid) != 0) & \
        (np.asarray(got_arena.polyid) != 0)
    for f in ("sx", "sy", "ex", "ey"):
        np.testing.assert_allclose(np.asarray(getattr(got_arena, f))[live],
                                   np.asarray(getattr(ref_arena, f))[live],
                                   atol=2.0)


def test_label_merge_tiled_boustrophedon_exact():
    """A single uniform-color region snaking across every seam dozens of
    times: the link-mode seam-graph resolve must converge exactly."""
    h, wl, nt = 40, 16, 8
    w = wl * nt
    # background color A, snake color B carved as a boustrophedon path
    packed = np.full((h, w), 7, np.int32)
    for r, y in enumerate(range(2, h - 2, 2)):
        packed[y, 1:w - 1] = 9
        col = w - 2 if r % 2 == 0 else 1
        if y + 2 < h - 2:
            packed[y + 1, col] = 9
    mask = np.zeros((h, w), np.int32)
    edge = np.zeros((h, w), np.int32)
    ref = np.asarray(regions.label_merge(jnp.asarray(packed),
                                         jnp.asarray(mask),
                                         jnp.asarray(edge), n_rounds=64))

    m = dmesh.make_mesh(1, nt)

    @functools.partial(shard_map, mesh=m, in_specs=(P(None, "tile"),) * 3,
                       out_specs=P(None, "tile"), check_vma=False)
    def run(p, mk, e):
        return dtile.label_merge_tiled(p, mk, e, CFG)

    got = np.asarray(jax.jit(run)(jnp.asarray(packed), jnp.asarray(mask),
                                  jnp.asarray(edge)))
    np.testing.assert_array_equal(got, ref)
