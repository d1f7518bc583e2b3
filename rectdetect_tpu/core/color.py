"""sRGB <-> CIELAB conversion and the packed-Lab on-chip image format.

The reference stores every color frame as one uint32 per pixel with
L:12 bits, a:10 bits, b:10 bits (packlab/unpacklab, oclimgutil.cl:28-39) and
converts sRGB->Lab with fixed-point LUT arithmetic (srgb2plab,
oclimgutil.cl:106-134).  The packed values are normalized:

    Lf = L*/256          in [0, ~0.39)   stored as floor(Lf*4096), 12 bits
    af = (a*+128)/256    in [0,1)        stored as floor(af*1024), 10 bits
    bf = (b*+128)/256    in [0,1)        stored as floor(bf*1024), 10 bits

(The lab2srgb inverse at oclimgutil.cl:146-178 fixes these scales: it
multiplies the normalized values by 256 and offsets a/b by 128.)

Here the conversion is computed in float32 directly from the standard sRGB /
CIELAB(D65) formulas (identical matrix constants to oclimgutil.cl:113-115),
then quantized onto the same packed grid, so downstream integer-domain stages
(blblur, quantize, despeckle) see the exact same discrete value lattice as
the reference.  The reference's LUT interpolation introduces <=0.4% scale
deviation from the closed form; downstream processing is gradient- and
threshold-based, so this is well inside the geometric parity tolerance.

TPU note: all of this is pure element-wise VPU work and fuses with whatever
consumes it.  The packed uint32 (held as int32) form is the canonical
region-stage format: one i32 plane instead of three f32 planes = 1/3 the HBM
traffic for the blblur/quantize/despeckle loop.
"""

from __future__ import annotations

import jax.numpy as jnp

# D65 sRGB -> XYZ matrix, same literals as oclimgutil.cl:113-115.
_M_RGB2XYZ = (
    (0.412453, 0.357580, 0.180423),
    (0.212671, 0.715160, 0.072169),
    (0.019334, 0.119193, 0.950227),
)
# XYZ -> sRGB inverse matrix, same literals as oclimgutil.cl:167-169.
_M_XYZ2RGB = (
    (3.240479, -1.537150, -0.498535),
    (-0.969256, 1.875991, 0.041556),
    (0.055648, -0.204043, 1.057311),
)
_XN = 0.950456
_ZN = 1.088754
_LAB_EPS = 0.008856      # (6/29)^3
_LAB_KAPPA = 903.3
_F_THRESH = 0.20689270648  # f-space threshold used by the reference


def srgb_to_linear(u8):
    """sRGB byte -> linear light in [0,1] (matches the s2l LUT generator)."""
    s = u8.astype(jnp.float32) * (1.0 / 255.0)
    return jnp.where(s <= 0.04045, s * (1.0 / 12.92),
                     ((s + 0.055) * (1.0 / 1.055)) ** 2.4)


def linear_to_srgb(lin):
    """Linear light -> sRGB byte value in [0,255] float (closed form)."""
    lin = jnp.clip(lin, 0.0, 1.0)
    s = jnp.where(lin <= 0.0031308, lin * 12.92,
                  1.055 * lin ** (1.0 / 2.4) - 0.055)
    return jnp.clip(jnp.round(s * 255.0), 0, 255)


def linear_to_srgb_exact(lin):
    """Linear light -> sRGB byte through the regenerated l2s LUT, exactly
    as lab2srgb consumes it: l2s[clamp(convert_int_rtn(lin * 1024), 0,
    1023)] (oclimgutil.cl:173-175; table :697-762)."""
    from rectdetect_tpu.core.luts import l2s_table
    tbl = jnp.asarray(l2s_table())
    i = jnp.clip(jnp.floor(lin * 1024.0).astype(jnp.int32), 0, 1023)
    return tbl[i]


def _lab_f(t):
    return jnp.where(t > _LAB_EPS, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)


def bgr_to_labf(bgr_u8):
    """(H,W,3) uint8 BGR -> (H,W,3) float32 normalized Lab (Lf, af, bf).

    Continuous (unquantized) values; apply quantize_labf / pack_lab to land
    on the packed lattice.
    """
    b = srgb_to_linear(bgr_u8[..., 0])
    g = srgb_to_linear(bgr_u8[..., 1])
    r = srgb_to_linear(bgr_u8[..., 2])
    m = _M_RGB2XYZ
    x = (m[0][0] * r + m[0][1] * g + m[0][2] * b) * (1.0 / _XN)
    y = m[1][0] * r + m[1][1] * g + m[1][2] * b
    z = (m[2][0] * r + m[2][1] * g + m[2][2] * b) * (1.0 / _ZN)
    fx, fy, fz = _lab_f(x), _lab_f(y), _lab_f(z)
    lstar = jnp.where(y > _LAB_EPS, 116.0 * fy - 16.0, _LAB_KAPPA * y)
    astar = 500.0 * (fx - fy)
    bstar = 200.0 * (fy - fz)
    lf = lstar * (1.0 / 256.0)
    af = (astar + 128.0) * (1.0 / 256.0)
    bf = (bstar + 128.0) * (1.0 / 256.0)
    return jnp.stack([lf, af, bf], axis=-1)


def quantize_labf(labf):
    """Snap normalized Lab floats onto the packed 12/10/10-bit lattice.

    Equivalent to unpacklab(packlab(x)) in the reference: floor to the grid,
    then add half a quantum (oclimgutil.cl:36-39).
    """
    scale = jnp.asarray([4096.0, 1024.0, 1024.0], dtype=jnp.float32)
    hi = jnp.asarray([4095.0, 1023.0, 1023.0], dtype=jnp.float32)
    q = jnp.clip(jnp.floor(labf * scale), 0.0, hi)
    return (q + 0.5) / scale


def bgr_to_packed_exact(bgr_u8):
    """(H,W,3) BGR uint8 -> packed int32, BIT-IDENTICAL to the reference's
    fixed-point LUT conversion (srgb2plab, oclimgutil.cl:106-134; tables
    regenerated from the sRGB/CIELAB formulas, core/luts.py).

    This is the `color_exact` parity path: closed-form bgr_to_labf +
    pack_lab lands on the same 12/10/10 lattice within <=0.4% but not
    bit-identically.  Cost: per-pixel gathers into the three small LUTs —
    fine for parity runs, slower than the fused closed form in
    production."""
    from rectdetect_tpu.core.luts import (cfunc2_table, cfunc_table,
                                          s2l_table)
    s2l = jnp.asarray(s2l_table())
    cfunc = jnp.asarray(cfunc_table())
    cfunc2 = jnp.asarray(cfunc2_table())

    b = bgr_u8[..., 0].astype(jnp.int32)
    g = bgr_u8[..., 1].astype(jnp.int32)
    r = bgr_u8[..., 2].astype(jnp.int32)
    ir = jnp.take(s2l, r)
    ig = jnp.take(s2l, g)
    ib = jnp.take(s2l, b)

    def k(c):                        # (int)(coef * 16384 + 0.5)
        return int(c * 16384 + 0.5)

    kxn = int(32768 / _XN + 0.5)
    kzn = int(32768 / _ZN + 0.5)
    cx = ((((ir * k(0.412453) + ig * k(0.357580) + ib * k(0.180423)
             + (1 << 14)) >> 15) * kxn) + (1 << 10)) >> 11
    cy = ((ir * k(0.212671) + ig * k(0.715160) + ib * k(0.072169))
          + (1 << 10)) >> 11
    cz = ((((ir * k(0.019334) + ig * k(0.119193) + ib * k(0.950227)
             + (1 << 14)) >> 15) * kzn) + (1 << 10)) >> 11

    def interp(tbl, c):
        hi = c >> 8
        frac = c & 255
        return (jnp.take(tbl, hi) * (256 - frac)
                + jnp.take(tbl, hi + 1) * frac)

    cl = ((interp(cfunc2, cy) >> 12) + 1) >> 1
    fx = interp(cfunc, cx)
    fy = interp(cfunc, cy)
    fz = interp(cfunc, cz)
    fxy = (fx - fy + (1 << 7)) >> 8
    fyz = (fy - fz + (1 << 7)) >> 8
    # 8031/3213 and 134744072 are the reference's a*/b* fixed-point
    # rescale literals (oclimgutil.cl:126-127)
    ca = (fxy * 8031 + (134744072 + (1 << 17))) >> 18
    cb = (fyz * 3213 + (134744072 + (1 << 17))) >> 18
    return pack_lab_int(cl, ca, cb)


def pack_lab(labf):
    """(...,3) normalized Lab floats -> packed int32 (b<<22 | a<<12 | L)."""
    cl = jnp.clip(jnp.floor(labf[..., 0] * 4096.0), 0, 4095).astype(jnp.int32)
    ca = jnp.clip(jnp.floor(labf[..., 1] * 1024.0), 0, 1023).astype(jnp.int32)
    cb = jnp.clip(jnp.floor(labf[..., 2] * 1024.0), 0, 1023).astype(jnp.int32)
    return (cb << 22) | (ca << 12) | cl


def pack_lab_int(cl, ca, cb):
    """Pack raw integer lattice coordinates (clamped) -> packed int32.

    Mirrors packlabbl (oclrect.cl:38-44).
    """
    cl = jnp.clip(cl, 0, 4095).astype(jnp.int32)
    ca = jnp.clip(ca, 0, 1023).astype(jnp.int32)
    cb = jnp.clip(cb, 0, 1023).astype(jnp.int32)
    return (cb << 22) | (ca << 12) | cl


def unpack_lab_int(packed):
    """packed int32 -> (cl, ca, cb) raw int32 lattice coordinates.

    Mirrors unpacklabbl (oclrect.cl:46-48).
    """
    cl = packed & 4095
    ca = (packed >> 12) & 1023
    cb = (packed >> 22) & 1023
    return cl, ca, cb


def unpack_labf(packed):
    """packed int32 -> (...,3) normalized Lab floats at lattice centers."""
    cl, ca, cb = unpack_lab_int(packed)
    lf = (cl.astype(jnp.float32) + 0.5) * (1.0 / 4096.0)
    af = (ca.astype(jnp.float32) + 0.5) * (1.0 / 1024.0)
    bf = (cb.astype(jnp.float32) + 0.5) * (1.0 / 1024.0)
    return jnp.stack([lf, af, bf], axis=-1)


def labf_to_bgr(labf, exact: bool = False):
    """(H,W,3) normalized Lab -> (H,W,3) uint8 BGR (inverse conversion).

    Mirrors lab2srgb (oclimgutil.cl:146-178): scales back to L*/a*/b*, inverts
    the f() transfer, applies the XYZ->sRGB matrix and gamma-encodes.
    exact=True gamma-encodes through the regenerated l2s LUT exactly as
    the reference kernel does (floor-to-1024-grid indexing).
    """
    lstar = labf[..., 0] * 256.0
    astar = labf[..., 1] * 256.0 - 128.0
    bstar = labf[..., 2] * 256.0 - 128.0
    y = jnp.where(lstar > 8.0, ((lstar + 16.0) / 116.0) ** 3,
                  lstar * (1.0 / _LAB_KAPPA))
    fy = _lab_f(y)
    fx = fy + astar * (1.0 / 500.0)
    fz = fy - bstar * (1.0 / 200.0)

    def inv_f(ft):
        return jnp.where(ft > _F_THRESH, ft ** 3,
                         (ft - 16.0 / 116.0) * (1.0 / 7.787))

    x = inv_f(fx) * _XN
    z = inv_f(fz) * _ZN
    m = _M_XYZ2RGB
    r = m[0][0] * x + m[0][1] * y + m[0][2] * z
    g = m[1][0] * x + m[1][1] * y + m[1][2] * z
    b = m[2][0] * x + m[2][1] * y + m[2][2] * z
    enc = linear_to_srgb_exact if exact else linear_to_srgb
    bgr = jnp.stack([enc(b), enc(g), enc(r)], axis=-1)
    return bgr.astype(jnp.uint8)
