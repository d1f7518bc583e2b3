"""Calibration subsystem: density-derived capacities, plan persistence."""

import numpy as np
import jax.numpy as jnp

from rectdetect_tpu.runtime import calibrate
from tests.conftest import synth_scene


def test_calibrate_roundtrip(tmp_path, monkeypatch):
    plan = str(tmp_path / "plan.txt")
    frames = [jnp.asarray(synth_scene(h=48, w=64, seed=s)) for s in (0, 1)]
    cfg = calibrate.calibrate(frames, plan_path=plan)
    assert 1 <= cfg.sparse_factor <= 16
    assert cfg.ls_capacity >= 4096

    h, w = 48, 64
    loaded = calibrate.load_calibrated_config(h, w, plan_path=plan)
    assert loaded.sparse_factor == cfg.sparse_factor
    assert loaded.ls_capacity == cfg.ls_capacity

    # unknown resolution falls back to defaults
    from rectdetect_tpu.config import DEFAULT_CONFIG
    other = calibrate.load_calibrated_config(99, 77, plan_path=plan)
    assert other == DEFAULT_CONFIG

    # recalibration must MERGE with existing section entries, not
    # overwrite them (tune_kernels' block winners live in the same
    # section; a refresh dropped them once — round 3)
    import jax
    from rectdetect_tpu.runtime import native
    key = calibrate._key(jax.devices()[0].device_kind, h, w)
    entries = native.plan_load(plan, key)
    entries["merge_bh"] = "256"
    native.plan_save(plan, key, entries)
    calibrate.calibrate(frames, plan_path=plan)
    assert native.plan_load(plan, key)["merge_bh"] == "256"
    assert calibrate.load_calibrated_config(
        h, w, plan_path=plan).merge_bh == 256


def test_plan_lookup_tpu_kind_fallback(tmp_path):
    # a relay may report a device_kind spelling that was never calibrated;
    # any persisted TPU entry at the same resolution must still apply
    plan = str(tmp_path / "plan.txt")
    from rectdetect_tpu.runtime import native
    native.plan_save(plan, "TPU_v5_lite|720x1280", {"sparse_factor": "2"})

    exact, used = calibrate._plan_lookup("TPU v5 lite", "tpu",
                                         720, 1280, plan)
    assert exact and used == "TPU_v5_lite|720x1280"

    fb, used = calibrate._plan_lookup("TPU v5e (axon)", "axon",
                                      720, 1280, plan)
    assert fb.get("sparse_factor") == "2"
    assert used == "TPU_v5_lite|720x1280"

    # CPU never borrows TPU entries; wrong resolution never matches
    none, _ = calibrate._plan_lookup("cpu", "cpu", 720, 1280, plan)
    assert not none
    none, _ = calibrate._plan_lookup("TPU weird", "tpu", 480, 640, plan)
    assert not none


def test_calibrated_config_runs():
    import math
    from rectdetect_tpu.pipeline.rect import rect_frame, live_rects
    frames = [jnp.asarray(synth_scene(h=48, w=64, seed=0))]
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        cfg = calibrate.calibrate(frames, plan_path=os.path.join(d, "p.txt"))
    res = rect_frame(frames[0], math.tan(math.radians(72) / 2), cfg)
    assert np.asarray(res.value).shape[0] > 0


def test_tune_kernels_persist_and_apply(tmp_path):
    """Kernel-block autotune: per-instance winners persisted next to
    the capacity plan and applied by load_calibrated_config (plan.txt
    local-work-size analog).  Timing injected — the mechanism is what's
    under test."""
    import jax
    plan = str(tmp_path / "plan.txt")
    times = {("pieces_bh", 8): 2.0, ("pieces_bh", 16): 1.0,
             ("pieces_bh", 32): 3.0, ("pieces_bh", 64): 4.0,
             ("merge_bh", 96): 3.0, ("merge_bh", 192): 1.0,
             ("merge_bh", 256): 2.0,
             ("boundary_bh", 96): 3.0, ("boundary_bh", 192): 2.0,
             ("boundary_bh", 256): 1.0}

    def fake_time(kind, bh):
        # non-CCL kernels: make 64 the winner everywhere it's a candidate
        return times.get((kind, bh), 1.0 if bh == 64 else 2.0)

    cfg = calibrate.tune_kernels(24, 32, plan_path=plan,
                                 time_fn=fake_time)
    assert cfg.pieces_bh == 16
    assert cfg.merge_bh == 192
    assert cfg.boundary_bh == 256
    # breadth: every other Pallas kernel knob is tuned + applied too
    assert cfg.grad_bh == 64
    assert cfg.thin_bh == 64
    assert cfg.morph_bh == 64
    assert cfg.quant_bh == 64
    assert cfg.bids_bh == 64
    assert cfg.blblur_block == 64

    dev = jax.devices()[0].device_kind
    from rectdetect_tpu.runtime import native
    entries = native.plan_load(plan, calibrate._key(dev, 24, 32))
    assert entries["merge_bh"] == "192"

    loaded = calibrate.load_calibrated_config(24, 32, plan_path=plan)
    assert loaded.pieces_bh == 16
    assert loaded.boundary_bh == 256

    # a failing candidate is skipped, not fatal
    def flaky(kind, bh):
        if (kind, bh) == ("merge_bh", 192):
            raise RuntimeError("VMEM")
        return fake_time(kind, bh)
    cfg2 = calibrate.tune_kernels(24, 32, plan_path=plan, time_fn=flaky)
    assert cfg2.merge_bh == 256


def test_plan_fits_probe():
    """A plan calibrated on a sparse scene must be flagged unfit for a
    dense noisy frame (the zero-detection stale-plan failure), and fit
    for its own scene class."""
    import dataclasses
    import sys
    sys.path.insert(0, ".")
    from bench import synth_frame
    from rectdetect_tpu.config import DEFAULT_CONFIG

    noisy = synth_frame(96, 128, seed=0)
    tight = dataclasses.replace(DEFAULT_CONFIG, sparse_factor=16,
                                strings_sparse_factor=24)
    assert not calibrate.plan_fits(tight, noisy)
    assert calibrate.plan_fits(DEFAULT_CONFIG, noisy)
    assert calibrate.plan_fits(
        dataclasses.replace(DEFAULT_CONFIG, sparse_factor=0), noisy)
