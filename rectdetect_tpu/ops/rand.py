"""The reference's counter-based PRNG (xrandom, oclpolyline.cl:870-888).

A stateless 64-bit rotate-xor mixing ladder seeded per element.  In the
reference its only pipeline use is perturbing mkpl's max-distance
tie-break so the atomic argmax is unique (oclpolyline.cl:536); the TPU
build replaced that with the deterministic min-flat-index winner, so this
module exists for capability parity (the `rand` kernel, oclimgutil.cl:248
/ oclpolyline.cl:883) and for users who want reference-style stochastic
tie-breaking.

TPU has no native 64-bit integers, so the ladder runs on (hi, lo) uint32
pairs — bit-exact against the reference's uint64 arithmetic."""

from __future__ import annotations

import jax.numpy as jnp

_XOR = (0xf3dd0fb7820fde37, 0xe6c6ac2c59e52811, 0x2fc7871fff7c5b45,
        0x47c7e1f70aa4f7c5, 0x094f02b7fb9ba895, 0x89afda817e744570,
        0xc7277d052c7bf14b)
_SHIFTS = (24, 6, 18, 48, 0, 12, 36)

_U32 = jnp.uint32


def _rotl64(hi, lo, n):
    """Rotate the (hi, lo) pair left by n (vector n in [0, 64))."""
    n = n.astype(_U32) & _U32(63)
    big = n >= 32
    hi1 = jnp.where(big, lo, hi)
    lo1 = jnp.where(big, hi, lo)
    m = jnp.where(big, n - 32, n).astype(_U32)
    # shift by 0 must not do x >> 32 (UB-ish); mask it out
    inv = (_U32(32) - m) & _U32(31)
    carry_hi = jnp.where(m == 0, _U32(0), lo1 >> inv)
    carry_lo = jnp.where(m == 0, _U32(0), hi1 >> inv)
    return ((hi1 << m) | carry_hi, (lo1 << m) | carry_lo)


def _mul64(ahi, alo, b):
    """(ahi, alo) * b (python int) mod 2^64 via 16-bit limbs."""
    out_hi = jnp.zeros_like(ahi)
    out_lo = jnp.zeros_like(alo)
    a_limbs = [alo & _U32(0xffff), alo >> _U32(16),
               ahi & _U32(0xffff), ahi >> _U32(16)]
    b_limbs = [(b >> (16 * i)) & 0xffff for i in range(4)]
    acc = [jnp.zeros_like(alo) for _ in range(4)]  # 32-bit accum per limb
    for i in range(4):
        for j in range(4 - i):
            acc[i + j] = acc[i + j] + a_limbs[i] * _U32(b_limbs[j])
    # propagate carries (each acc < 2^32; carries into next limb)
    limbs = []
    carry = jnp.zeros_like(alo)
    for k in range(4):
        v = acc[k] + carry
        limbs.append(v & _U32(0xffff))
        carry = v >> _U32(16)
    out_lo = limbs[0] | (limbs[1] << _U32(16))
    out_hi = limbs[2] | (limbs[3] << _U32(16))
    return out_hi, out_lo


def _add64(ahi, alo, bhi, blo):
    lo = alo + blo
    carry = (lo < alo).astype(_U32)
    return ahi + bhi + carry, lo


def xrandom_pair(shi, slo):
    """uint64 (hi, lo) -> mixed uint64 (hi, lo); bit-exact xrandom."""
    thi, tlo = shi, slo
    for sh, x in zip(_SHIFTS, _XOR):
        if sh == 0:
            n = slo & _U32(63)
        elif sh < 32:
            n = (slo >> _U32(sh)) & _U32(63)
        else:
            n = (shi >> _U32(sh - 32)) & _U32(63)
        thi, tlo = _rotl64(thi, tlo, n)
        thi = thi ^ _U32(x >> 32)
        tlo = tlo ^ _U32(x & 0xffffffff)
    return thi, tlo


def rand_field(size: int, seed: int = 0):
    """The `rand` kernel (oclpolyline.cl:883-889): int32 noise per index,
    out[x] = (int)xrandom((x ^ C1)*C2 + (seed ^ C3)*C4)."""
    x_lo = jnp.arange(size, dtype=_U32)
    x_hi = jnp.zeros_like(x_lo)
    c1, c2 = 0xb21c2cb635b48285, 0x9b923b9cec745401
    c3, c4 = 0x7bb93d75a79d2f15, 0x22cab58ada573a29
    ahi = x_hi ^ _U32(c1 >> 32)
    alo = x_lo ^ _U32(c1 & 0xffffffff)
    ahi, alo = _mul64(ahi, alo, c2)
    s = seed & 0xFFFFFFFFFFFFFFFF
    t = ((s ^ c3) * c4) & 0xFFFFFFFFFFFFFFFF
    ahi, alo = _add64(ahi, alo, jnp.full_like(ahi, _U32(t >> 32)),
                      jnp.full_like(alo, _U32(t & 0xffffffff)))
    _, lo = xrandom_pair(ahi, alo)
    return lo.astype(jnp.int32)
