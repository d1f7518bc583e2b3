"""The sorted-domain mkpl megakernel must reproduce mkpl_subdivide
bit-for-bit: same arena (ids, pointers, coordinates) and same lsid map.
Runs the kernel in interpreter mode on the CPU test backend; the XLA
path is the oracle (itself golden-tested in test_polyline.py)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from rectdetect_tpu.config import DEFAULT_CONFIG
from rectdetect_tpu.ops import morphology, polyline
from rectdetect_tpu.ops.compact import compact_mask, compact_subset
from rectdetect_tpu.pipeline.frontend import edge_frontend


def _arc_inputs(strings, cfg, sp, sp_arc, size_thre):
    """Replicates _polyline_tail_sparse up to the mkpl inputs."""
    from rectdetect_tpu.ops.chain import arc_chain_sparse

    h, w = strings.shape
    n = h * w
    comp0 = compact_mask((strings != 0).reshape(-1), sp)
    S = comp0.cap
    cyc_cap = max(1024, n // 8)
    out = arc_chain_sparse(strings, comp0, cfg.number_doublings, cyc_cap)
    number_w, _, live_w, _, chainlen_w, arcmin_w = out
    p_w = jnp.clip(comp0.idx, 0, n - 1)
    keep = live_w & (number_w > 0) & (chainlen_w > size_thre)
    root_slot = comp0.slot_of[jnp.clip(arcmin_w, 0, n)]
    keep = keep & (root_slot < S)
    is_root = keep & (p_w == arcmin_w)
    rank = jnp.cumsum(is_root.astype(jnp.int32))
    dense_w = jnp.where(keep, rank[jnp.clip(root_slot, 0, S - 1)],
                        0).astype(jnp.int32)
    comp_arc = compact_subset(comp0, dense_w > 0, sp_arc)
    slot_a = comp0.slot_of[jnp.clip(comp_arc.idx, 0, n)]
    sa = jnp.clip(slot_a, 0, S - 1)
    a_ok = comp_arc.valid()
    dense_a = jnp.where(a_ok, dense_w[sa], 0)
    number_a = jnp.where(a_ok, number_w[sa], 0)
    return dense_a, number_a, comp_arc


def _scene_strings(h, w, seed, noise=0.0):
    from bench import synth_frame
    cfg = dataclasses.replace(DEFAULT_CONFIG, sparse_factor=0)
    bgr = synth_frame(h, w, seed=seed)
    if noise:
        r = np.random.default_rng(seed + 77)
        bgr = np.clip(bgr.astype(np.int16) +
                      r.integers(-int(noise), int(noise) + 1, bgr.shape),
                      0, 255).astype(np.uint8)
    fe = edge_frontend(jnp.asarray(bgr), cfg)
    return morphology.strings_chain(fe.edge_bin, "poly_branch")


def _run_both(strings, cap, minerror=4.0, size_thre=20, iters=16):
    from rectdetect_tpu.ops.pallas_mkpl import mkpl_subdivide_pallas

    h, w = strings.shape
    n = h * w
    sp = max(512, n // 4)
    sp_arc = 1024
    cfg = DEFAULT_CONFIG
    dense_a, number_a, comp = _arc_inputs(strings, cfg, sp, sp_arc,
                                          size_thre)
    tgt_a = jnp.where(comp.valid(), jnp.clip(comp.idx, 0, n - 1), n)
    dense = jnp.zeros((n + 1,), jnp.int32).at[tgt_a].set(
        dense_a, mode="drop")[:n].reshape(h, w)
    number = jnp.zeros((n + 1,), jnp.int32).at[tgt_a].set(
        number_a, mode="drop")[:n].reshape(h, w)
    arena0 = polyline.mkpl_init(dense, number, cap, comp)
    a_ref, lsid_ref = polyline.mkpl_subdivide(arena0, dense, number,
                                              minerror, iters, comp)
    a_pal, lsid_pal = mkpl_subdivide_pallas(arena0, dense_a, number_a,
                                            comp, h, w, minerror, iters,
                                            interpret=True)
    return (a_ref, lsid_ref), (a_pal, lsid_pal)


def _assert_equal(ref, pal):
    a_ref, lsid_ref = ref
    a_pal, lsid_pal = pal
    assert int(a_ref.count) == int(a_pal.count)
    for f in ("sx", "sy", "ex", "ey", "start_index", "end_index",
              "left_ptr", "right_ptr", "start_count", "end_count",
              "polyid", "npix", "level"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a_ref, f)), np.asarray(getattr(a_pal, f)),
            err_msg=f)
    np.testing.assert_array_equal(np.asarray(lsid_ref),
                                  np.asarray(lsid_pal))


def test_mkpl_pallas_matches_xla_synthetic():
    strings = _scene_strings(96, 128, seed=0)
    _assert_equal(*_run_both(strings, cap=1024))


def test_mkpl_pallas_matches_xla_noisy():
    strings = _scene_strings(96, 128, seed=3, noise=6)
    _assert_equal(*_run_both(strings, cap=1024))


def test_mkpl_pallas_matches_xla_curvy():
    # curves exercise many split iterations and the curvature test
    h, w = 96, 128
    img = np.zeros((h, w), np.int32)
    yy = np.arange(8, w - 8)
    xx = (30 + 18 * np.sin(yy / 9.0)).astype(int)
    img[xx, yy] = 1
    xx2 = (70 + 12 * np.cos(yy / 5.0)).astype(int)
    img[xx2, yy] = 1
    strings = morphology.strings_chain(jnp.asarray(img), "poly_branch")
    _assert_equal(*_run_both(strings, cap=1024, minerror=1.0,
                             size_thre=5))


def test_mkpl_pallas_heavy_splitting_exact_cap():
    # arena cap == slot cap (the tightest supported arena) with a small
    # minerror drives many splits across all iterations; ids must still
    # match the XLA allocation exactly via the genealogy remap
    strings = _scene_strings(96, 128, seed=0)
    _assert_equal(*_run_both(strings, cap=1024, minerror=1.0,
                             size_thre=5))


def test_mkpl_pallas_vmap_matches_per_frame():
    """Batched serving vmaps the kernel (rect_frames); the vmapped
    kernel must equal per-frame results."""
    from rectdetect_tpu.ops.pallas_mkpl import mkpl_subdivide_pallas

    h, w = 96, 128
    n = h * w
    cap, sp_arc = 1024, 1024
    per_frame = []
    refs = []
    for seed in (0, 3):
        strings = _scene_strings(h, w, seed=seed, noise=4 if seed else 0)
        dense_a, number_a, comp = _arc_inputs(strings, DEFAULT_CONFIG,
                                              max(512, n // 4), sp_arc,
                                              20)
        tgt_a = jnp.where(comp.valid(), jnp.clip(comp.idx, 0, n - 1), n)
        dense = jnp.zeros((n + 1,), jnp.int32).at[tgt_a].set(
            dense_a, mode="drop")[:n].reshape(h, w)
        number = jnp.zeros((n + 1,), jnp.int32).at[tgt_a].set(
            number_a, mode="drop")[:n].reshape(h, w)
        arena0 = polyline.mkpl_init(dense, number, cap, comp)
        per_frame.append((arena0, dense_a, number_a, comp))
        refs.append(mkpl_subdivide_pallas(arena0, dense_a, number_a,
                                          comp, h, w, 4.0, 16,
                                          interpret=True))
    b_arena, b_dense, b_num, b_comp = jax.tree_util.tree_map(
        lambda x, y: jnp.stack([x, y]), per_frame[0], per_frame[1])
    vf = jax.vmap(lambda a, d, nn, c: mkpl_subdivide_pallas(
        a, d, nn, c, h, w, 4.0, 16, interpret=True))
    va, vl = vf(b_arena, b_dense, b_num, b_comp)
    for i, (ra, rl) in enumerate(refs):
        for f in ("sx", "sy", "ex", "ey", "start_index", "end_index",
                  "left_ptr", "right_ptr", "polyid", "level"):
            np.testing.assert_array_equal(
                np.asarray(getattr(va, f))[i],
                np.asarray(getattr(ra, f)), err_msg=f"{i}:{f}")
        np.testing.assert_array_equal(np.asarray(vl)[i], np.asarray(rl))
