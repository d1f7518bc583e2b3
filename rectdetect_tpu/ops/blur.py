"""Gaussian blur.

The reference implements a recursive (IIR) approximation of a Gaussian with
sigma = r/3 per axis (iirblur_*, oclimgutil.cl:542-637; the coefficient table
iircoef[r][0] equals the Gaussian peak 1/(sigma*sqrt(2*pi)) with sigma = r/3,
e.g. r=3 -> 0.3989422804 = 1/sqrt(2*pi)).  An IIR scan is the right call on a
GPU with one thread per row; on TPU a sequential per-row recurrence is the
*worst* shape, so we keep the math (a normalized Gaussian with sigma = r/3,
reflect-101 borders) and change the algorithm:

  * small r (the pipeline always uses r=2, oclrect.c:248-250): separable FIR
    with taps sampled from the continuous Gaussian out to 4 sigma.  Seven
    static shifts per axis, fully fused by XLA, zero sequential deps.
  * large r: same FIR with a wider (static) radius — still cheaper on TPU
    than a scan because every tap is a vectorized shifted add.

An associative-scan IIR variant is provided for completeness/benchmarks; it
implements the classic forward+backward 3-tap recursive Gaussian via
companion-matrix `lax.associative_scan`, demonstrating how the reference's
recurrence maps onto TPU when a true IIR is wanted (very large sigma).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from rectdetect_tpu.ops.shifts import pad2d, shifted


@functools.lru_cache(maxsize=None)
def gaussian_taps(r: int) -> tuple[float, ...]:
    """Symmetric FIR taps for sigma = r/3, radius = max(2, ceil(4*sigma))."""
    sigma = r / 3.0
    rad = max(2, int(math.ceil(4.0 * sigma)))
    k = np.arange(-rad, rad + 1, dtype=np.float64)
    t = np.exp(-0.5 * (k / sigma) ** 2)
    t /= t.sum()
    return tuple(float(v) for v in t)


def gaussian_blur(img, r: int):
    """Separable Gaussian blur with sigma = r/3, reflect-101 borders.

    img: (..., H, W) float32.  Matches the effective response of the
    reference's iirblur_f_f chain (oclimgutil.c:243-273) to ~1e-3.
    """
    taps = gaussian_taps(r)
    rad = len(taps) // 2
    h, w = img.shape[-2], img.shape[-1]
    p = pad2d(img, rad, "mirror")
    out = None
    for i, t in enumerate(taps):  # horizontal
        term = t * shifted(p, rad, 0, i - rad, h, w)
        out = term if out is None else out + term
    p = pad2d(out, rad, "mirror")
    out = None
    for i, t in enumerate(taps):  # vertical
        term = t * shifted(p, rad, i - rad, 0, h, w)
        out = term if out is None else out + term
    return out


# ---------------------------------------------------------------------------
# Associative-scan IIR Gaussian (Young & van Vliet 3rd-order recursion).
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _yvv_coeffs(sigma: float):
    """Young-van Vliet 3rd order recursive Gaussian coefficients.

    Standard published design (Young & van Vliet 1995): q from sigma, then
    b-coefficients of 1/(b0 + b1 z^-1 + b2 z^-2 + b3 z^-3).
    """
    if sigma >= 2.5:
        q = 0.98711 * sigma - 0.96330
    else:
        q = 3.97156 - 4.14554 * math.sqrt(1.0 - 0.26891 * sigma)
    b0 = 1.57825 + 2.44413 * q + 1.4281 * q * q + 0.422205 * q ** 3
    b1 = 2.44413 * q + 2.85619 * q * q + 1.26661 * q ** 3
    b2 = -(1.4281 * q * q + 1.26661 * q ** 3)
    b3 = 0.422205 * q ** 3
    bb = 1.0 - (b1 + b2 + b3) / b0
    return (b1 / b0, b2 / b0, b3 / b0, bb)


def _iir_scan_1d(x, a1, a2, a3, b, reverse: bool):
    """y[n] = b*x[n] + a1*y[n-1] + a2*y[n-2] + a3*y[n-3] along the last axis.

    Implemented as an associative scan over 3x3 companion matrices — the TPU
    formulation of the reference's per-row sequential loop
    (iirblur_f_f_pass0a, oclimgutil.cl:542-559).  O(log n) depth.
    """
    *lead, n = x.shape
    comp = jnp.array([[a1, a2, a3],
                      [1.0, 0.0, 0.0],
                      [0.0, 1.0, 0.0]], dtype=x.dtype)
    # scan axis must be axis 0 of every leaf
    mats = jnp.broadcast_to(comp, (n, *lead, 3, 3))
    xt = jnp.moveaxis(x, -1, 0)  # (n, *lead)
    vecs = jnp.stack([b * xt, jnp.zeros_like(xt), jnp.zeros_like(xt)], axis=-1)

    def combine(p, q):
        mp, vp = p
        mq, vq = q
        return mq @ mp, jnp.einsum("...ij,...j->...i", mq, vp) + vq

    _, ys = jax.lax.associative_scan(combine, (mats, vecs), axis=0,
                                     reverse=reverse)
    return jnp.moveaxis(ys[..., 0], 0, -1)


def gaussian_blur_iir(img, sigma: float):
    """True recursive Gaussian (YvV) along both axes via associative scans.

    For very large sigma where a FIR becomes wasteful.  img: (..., H, W).
    """
    a1, a2, a3, b = _yvv_coeffs(float(sigma))

    def axis_pass(z):
        fwd = _iir_scan_1d(z, a1, a2, a3, b, reverse=False)
        return _iir_scan_1d(fwd, a1, a2, a3, b, reverse=True)

    out = axis_pass(img)
    out = axis_pass(jnp.swapaxes(out, -1, -2))
    return jnp.swapaxes(out, -1, -2)
