"""Pose estimation: TPU CG (autodiff, f32) vs golden CG (central diff, f64)
vs geometric ground truth."""

import math

import numpy as np
import jax.numpy as jnp

from golden import geometry as ggeo
from rectdetect_tpu.geometry import pose as tpose

IW, IH = 640, 480
AOV_DEG = 72.0
TAN_AOV = math.tan(math.radians(AOV_DEG) / 2)


def project_rect(center, normal_yaw, normal_pitch, w3, h3):
    """Render a 3D rectangle's corners through the pinhole model the
    reference inverts (oclrect.c:604-606): x right, y up, z forward,
    focal = (iw/2)/tanAOV."""
    f = (IW / 2) / TAN_AOV
    cy, sy = math.cos(normal_yaw), math.sin(normal_yaw)
    cp, sp = math.cos(normal_pitch), math.sin(normal_pitch)
    # rectangle axes
    u = np.array([cy, 0, -sy])
    v = np.array([sy * sp, cp, cy * sp])
    c = np.asarray(center, np.float64)
    corners3 = [c - u * w3 / 2 - v * h3 / 2,
                c + u * w3 / 2 - v * h3 / 2,
                c + u * w3 / 2 + v * h3 / 2,
                c - u * w3 / 2 + v * h3 / 2]
    corners2 = []
    for q in corners3:
        x = q[0] / q[2] * f + IW / 2
        y = -(q[1] / q[2]) * f + IH / 2
        corners2.append([x, y])
    return np.array(corners2), np.array(corners3)


def test_pose_recovers_planar_rectangle():
    c2, c3_true = project_rect([0.2, -0.1, 3.0], 0.4, 0.25, 1.6, 1.0)
    gc2, gc3, gval = ggeo.pose_estimation(c2, IW, IH, TAN_AOV)
    assert gval < 1e-3, gval
    assert ggeo.looks_like_a_screen(gc2, gc3, gval)

    tc2, tc3, tval = tpose.pose_estimate(
        jnp.asarray(c2, jnp.float32)[None], IW, IH, TAN_AOV)
    tval = float(tval[0])
    assert tval < 1e-3, tval
    ok = tpose.looks_like_a_screen(tc2, tc3, jnp.asarray([tval]))
    assert bool(ok[0])

    # same corner rotation as golden
    np.testing.assert_allclose(np.asarray(tc2[0]), gc2, atol=1e-3)

    # 3D recovery matches ground truth up to global scale; corner
    # correspondence is defined by the returned c2 (rotated so the
    # top-left corner is first, oclrect.c:593-601)
    tc3 = np.asarray(tc3[0], np.float64)
    tc2np = np.asarray(tc2[0], np.float64)
    idx = [int(np.argmin(np.abs(c2 - tc2np[i]).sum(1))) for i in range(4)]
    tgt = c3_true[idx]
    scale = float((tc3 * tgt).sum() / (tc3 * tc3).sum())
    assert np.abs(tc3 * scale - tgt).max() < 0.05

    # golden and TPU agree on the minimum
    assert abs(tval - gval) < 5e-3


def test_pose_rejects_extreme_aspect():
    c2, _ = project_rect([0.0, 0.0, 3.0], 0.1, 0.05, 4.0, 0.2)  # 20:1
    gc2, gc3, gval = ggeo.pose_estimation(c2, IW, IH, TAN_AOV)
    assert not ggeo.looks_like_a_screen(gc2, gc3, gval)
    tc2, tc3, tval = tpose.pose_estimate(
        jnp.asarray(c2, jnp.float32)[None], IW, IH, TAN_AOV)
    ok = tpose.looks_like_a_screen(tc2, tc3, tval)
    assert not bool(ok[0])


def test_pose_batch_consistency():
    quads = []
    for yaw in (0.0, 0.5, -0.4):
        c2, _ = project_rect([0.1, 0.05, 2.5], yaw, 0.2, 1.2, 0.9)
        quads.append(c2)
    batch = jnp.asarray(np.stack(quads), jnp.float32)
    c2b, c3b, vb = tpose.pose_estimate(batch, IW, IH, TAN_AOV)
    for i in range(3):
        c2s, c3s, vs = tpose.pose_estimate(batch[i:i + 1], IW, IH, TAN_AOV)
        np.testing.assert_allclose(np.asarray(vb[i]), np.asarray(vs[0]),
                                   atol=1e-5)
