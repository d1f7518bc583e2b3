"""Native host runtime (librectrt.so) vs Python fallbacks."""

import os

import numpy as np
import pytest

from rectdetect_tpu.runtime import native


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="librectrt.so not built")


def test_plan_roundtrip(tmp_path):
    p = str(tmp_path / "plan.txt")
    native.plan_save(p, "TPU v5 lite", {"blur_block": "256", "fe_halo": "16"})
    native.plan_save(p, "cpu", {"blur_block": "64"})
    got = native.plan_load(p, "TPU v5 lite")
    assert got == {"blur_block": "256", "fe_halo": "16"}
    assert native.plan_load(p, "cpu") == {"blur_block": "64"}
    # update preserves the other section
    native.plan_save(p, "cpu", {"blur_block": "128"})
    assert native.plan_load(p, "TPU v5 lite")["blur_block"] == "256"
    assert native.plan_load(p, "unknown dev") == {}


@needs_native
def test_native_packedlab_matches_jax():
    import jax.numpy as jnp
    from rectdetect_tpu.core import color
    r = np.random.default_rng(0)
    bgr = r.integers(0, 256, (24, 32, 3), dtype=np.uint8)
    got = native.bgr_to_packedlab_host(bgr, n_threads=1)
    want = np.asarray(color.pack_lab(color.bgr_to_labf(jnp.asarray(bgr))))
    # identical lattice; allow off-by-one from float rounding at cell edges
    gl, ga, gb = got & 4095, (got >> 12) & 1023, (got >> 22) & 1023
    wl, wa, wb = want & 4095, (want >> 12) & 1023, (want >> 22) & 1023
    assert np.abs(gl - wl).max() <= 1
    assert np.abs(ga - wa).max() <= 1
    assert np.abs(gb - wb).max() <= 1
    assert (got == want).mean() > 0.97


@needs_native
def test_frame_pump_reads_video(tmp_path):
    import cv2
    path = str(tmp_path / "v.avi")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"MJPG"), 10, (64, 48))
    for i in range(6):
        frame = np.full((48, 64, 3), i * 20, np.uint8)
        w.write(frame)
    w.release()

    pump = native.FramePump(path)
    assert (pump.width, pump.height) == (64, 48)
    got = 0
    while True:
        f = pump.next(timeout_ms=2000)
        if f is None:
            break
        assert f.shape == (48, 64, 3)
        got += 1
        if got > 10:
            break
    pump.close()
    assert 1 <= got <= 6
