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


def test_calibrated_config_runs():
    import math
    from rectdetect_tpu.pipeline.rect import rect_frame, live_rects
    frames = [jnp.asarray(synth_scene(h=48, w=64, seed=0))]
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        cfg = calibrate.calibrate(frames, plan_path=os.path.join(d, "p.txt"))
    res = rect_frame(frames[0], math.tan(math.radians(72) / 2), cfg)
    assert np.asarray(res.value).shape[0] > 0
