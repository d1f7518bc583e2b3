"""3D pose estimation of quad candidates.

Re-design of the reference's CPU pose stage (oclrect.c:427-656): given the 4
image-space corners of a candidate quad and the horizontal angle of view,
find per-corner ray depths such that the 3D corners form a planar rectangle,
by minimizing the same objective `value` (oclrect.c:441-477):

    unit side lengths + opposite-side closure + Pythagorean diagonal
    consistency + coplanarity of both triangle normals,

with nonlinear conjugate gradient (oclrect.c:557-588), Newton line search
(oclrect.c:514-536), diagonal-Hessian preconditioning (inversedot,
oclrect.c:538-555), run twice with the two normalization modes
(oclrect.c:611-619).

TPU-first changes:
  * everything is batched: the whole candidate set is one vmapped
    `lax.fori_loop` CG program on (G,4) tensors, instead of a serial
    per-candidate CPU loop;
  * derivatives are exact (jax.grad / jvp) instead of the reference's
    central differences with h=1e-6 (oclrect.c:479-512) — in f32 that h
    would be pure cancellation noise, and exact gradients converge at
    least as well;
  * f32 instead of f64 (TPU-native); the acceptance margin (value <= 0.05,
    oclrect.c:637) is far above f32 noise at this scale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

INIT_SCALE = 1.0     # oclrect.c:429
CG_RESET_K = 10      # oclrect.c:576


def _sq(x):
    return x * x


def quad_value(v, points, mode: int):
    """The planarity/rectangularity objective (value, oclrect.c:441-477).

    v: (4,) ray depths; points: (4,3) unit rays; mode in {0,1} static.
    """
    q = points * v[:, None]                      # (4,3)

    def dsq(i, j):
        d = q[i] - q[j]
        return jnp.dot(d, d)

    l01, l12, l23, l03 = dsq(0, 1), dsq(1, 2), dsq(2, 3), dsq(0, 3)
    l02, l13 = dsq(0, 2), dsq(1, 3)

    score = _sq((l23 if mode else l03) - 1.0)
    score += _sq((l01 if mode else l12) - 1.0)
    comp = 1.0 / (l12 if mode else l01)

    a = (q[0] if mode else q[2]) - q[1]
    b = (q[2] if mode else q[0]) - q[3]
    score += jnp.dot(a + b, a + b)
    c = q[1] - (q[2] if mode else q[0])
    d = q[3] - (q[0] if mode else q[2])
    score += comp * jnp.dot(c + d, c + d)

    score += _sq(l01 + l12 - l02)
    score += _sq(l03 + l23 - l02)
    score += _sq(l01 + l03 - l13)
    score += _sq(l12 + l23 - l13)

    n013 = jnp.cross(q[1] - q[0], q[3] - q[0])
    score += comp * _sq(jnp.dot(n013, q[2]) - jnp.dot(n013, q[0])) / \
        jnp.maximum(jnp.dot(n013, n013), 1e-20)
    n102 = jnp.cross(q[0] - q[1], q[2] - q[1])
    score += comp * _sq(jnp.dot(n102, q[3]) - jnp.dot(n102, q[1])) / \
        jnp.maximum(jnp.dot(n102, n102), 1e-20)
    return score


def _line_search(f, x, direction, n_iter: int):
    """Newton line search along `direction` (lineSearch, oclrect.c:514-536).

    Directional first/second derivatives via two jvps (exact, vs the
    reference's central differences)."""
    d = direction / jnp.maximum(jnp.linalg.norm(direction), 1e-20)

    def dir_derivs(x):
        val, g1 = jax.jvp(f, (x,), (d,))
        _, g2 = jax.jvp(lambda y: jax.jvp(f, (y,), (d,))[1], (x,), (d,))
        return val, g1, g2

    def body(_, state):
        x, scale, stop = state
        val, g1, g2 = dir_derivs(x)
        g2 = jnp.where(g2 * g2 < 1e-10, 1.0, g2)
        delta = jnp.abs(g1 / g2)
        stop = stop | (delta < 1e-10)
        cand = x + d * (delta * scale)
        worse = f(cand) > val
        x_new = jnp.where(stop | worse, x, cand)
        scale_new = jnp.where(worse, scale * 0.5, scale)
        return x_new, scale_new, stop

    x, _, _ = jax.lax.fori_loop(0, n_iter, body,
                                (x, jnp.float32(INIT_SCALE),
                                 jnp.asarray(False)))
    return x


def _inversedot(m, r):
    """Diagonal preconditioner (inversedot, oclrect.c:538-555): r/m when the
    diagonal Hessian is all-positive, else r."""
    all_pos = jnp.all(m > 0)
    return jnp.where(all_pos, r / jnp.where(m > 0, m, 1.0), r)


def _grad_and_diag_hess(f, x):
    g = jax.grad(f)(x)
    basis = jnp.eye(x.shape[0], dtype=x.dtype)
    hd = jax.vmap(lambda e: jax.jvp(jax.grad(f), (x,), (e,))[1] @ e)(basis)
    return g, hd


def cg_minimize(f, x0, n_iter: int, ls_iter: int):
    """Preconditioned nonlinear CG (cgexecute, oclrect.c:557-588)."""
    g, m = _grad_and_diag_hess(f, x0)
    r = -g
    s = _inversedot(m, r)
    d = s
    deltanew = jnp.dot(r, s)

    def body(i, state):
        x, d, s, deltanew, k = state
        x = _line_search(f, x, d, ls_iter)
        g, m = _grad_and_diag_hess(f, x)
        r = -g
        deltaold = deltanew
        deltamid = jnp.dot(r, s)
        s = _inversedot(m, r)
        deltanew = jnp.dot(r, s)
        beta = (deltanew - deltamid) / jnp.where(deltaold == 0, 1.0,
                                                 deltaold)
        reset = (k == CG_RESET_K) | (beta <= 0) | (deltaold == 0)
        d = jnp.where(reset, s, s + d * beta)
        k = jnp.where(reset, 0, k) + 1
        return x, d, s, deltanew, k

    x, *_ = jax.lax.fori_loop(0, n_iter, body,
                              (x0, d, s, deltanew, jnp.int32(0)))
    return x


def _pose_single(corners, iw: int, ih: int, tan_aov, cg_iters: int,
                 ls_iters: int):
    """poseEstimation (oclrect.c:590-634) for one quad.

    corners: (4,2) image-space corners, ordered around the quad (each edge
    i is corners[i] -> corners[(i+1)%4]); returns (c2 (4,2) rotated so the
    top-left corner is first, c3 (4,3), value)."""
    e0 = corners
    e1 = jnp.roll(corners, -1, axis=0)
    gv = jnp.mean(corners, axis=0)  # only used for orientation sign

    # top-left edge: outward normal with most negative y (oclrect.c:597-601)
    v = e1 - e0
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-20)
    vperp = jnp.stack([-v[:, 1], v[:, 0]], axis=1)
    sign = jnp.sum((e0 - gv) * vperp, axis=1) < 0
    vperp = jnp.where(sign[:, None], -vperp, vperp)
    tl = jnp.argmin(vperp[:, 1])

    order = (jnp.arange(4) + tl) & 3
    c2 = e0[order]                               # (4,2)

    p = jnp.stack([c2[:, 0] - iw / 2,
                   -(c2[:, 1] - ih / 2),
                   jnp.full((4,), (iw / 2) / tan_aov, c2.dtype)], axis=1)
    p = p / jnp.maximum(jnp.linalg.norm(p, axis=1, keepdims=True), 1e-20)

    def dist(i, j):
        return jnp.maximum(jnp.linalg.norm(p[i] - p[j]), 1e-20)

    f1 = functools.partial(quad_value, points=p, mode=1)
    f0 = functools.partial(quad_value, points=p, mode=0)

    d01 = 1.0 / dist(0, 1)
    d23 = 1.0 / dist(2, 3)
    x0 = cg_minimize(f1, jnp.stack([d01, d01, d23, d23]), cg_iters, ls_iters)
    v0 = f1(x0)

    d12 = 1.0 / dist(1, 2)
    d03 = 1.0 / dist(0, 3)
    x1 = cg_minimize(f0, jnp.stack([d03, d12, d12, d03]), cg_iters, ls_iters)
    v1 = f0(x1)

    val = jnp.minimum(v0, v1)
    x = jnp.where(v0 < v1, x0, x1)
    x = jnp.where(x[0] < 0, -x, x)
    c3 = p * x[:, None]
    return c2, c3, val


def pose_estimate(corners, iw: int, ih: int, tan_aov, cg_iters: int = 12,
                  ls_iters: int = 10):
    """Batched pose estimation: corners (G,4,2) -> (c2 (G,4,2),
    c3 (G,4,3), value (G,))."""
    fn = functools.partial(_pose_single, iw=iw, ih=ih, tan_aov=tan_aov,
                           cg_iters=cg_iters, ls_iters=ls_iters)
    return jax.vmap(fn)(corners)


def _closest_point_ls(v, w, p):
    """closestPointLS2 (oclrect.c:408-416): clamped to the segment."""
    d = w - v
    l2 = jnp.dot(d, d)
    t = jnp.where(l2 > 0, jnp.dot(p - v, d) / jnp.maximum(l2, 1e-20), 0.0)
    t = jnp.clip(t, 0.0, 1.0)
    return v + t * d


def looks_like_a_screen(c2, c3, val, accept_value: float = 0.05,
                        aspect_limit: float = 12.0,
                        offset_ratio_limit: float = 100.0):
    """Acceptance test (looksLikeAScreen, oclrect.c:636-656), batched.

    c2: (G,4,2), c3: (G,4,3), val: (G,).  Returns bool (G,)."""
    ok = val <= accept_value
    ok &= jnp.all(c3[:, :, 2] >= 0, axis=1)
    asp = (jnp.linalg.norm(c3[:, 0] - c3[:, 1], axis=1) /
           jnp.maximum(jnp.linalg.norm(c3[:, 1] - c3[:, 2], axis=1), 1e-20))
    ok &= (asp >= 1.0 / aspect_limit) & (asp <= aspect_limit)

    def corner_offset(i):
        a = c2[:, i]
        b = c2[:, (i + 1) % 4]
        p2 = c2[:, (i + 2) % 4]
        p3 = c2[:, (i + 3) % 4]
        cp2 = jax.vmap(_closest_point_ls)(a, b, p2)
        cp3 = jax.vmap(_closest_point_ls)(a, b, p3)
        s0 = jnp.sum((p2 - cp2) ** 2, axis=1)
        s1 = jnp.sum((p3 - cp3) ** 2, axis=1)
        return jnp.maximum(s0, s1)

    offs = jnp.stack([corner_offset(i) for i in range(4)], axis=1)  # (G,4)
    maxs = jnp.max(offs, axis=1)
    mins = jnp.min(offs, axis=1)
    ok &= maxs <= offset_ratio_limit * jnp.maximum(mins, 1e-20)
    return ok
