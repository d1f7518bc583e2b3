"""Binary edge-map morphology: junction counting, gap bridging, thinning to
strings, branch removal.

Every op is interior-masked static shifts (the reference kernels guard the
1-2 px border), pure VPU work.  The reference leaves some output borders
unwritten and relies on zero-initialized buffers (e.g. the oclpolyline
simpleConnect early-return, oclpolyline.cl:91); here borders are explicitly
zeroed — the deterministic equivalent.
"""

from __future__ import annotations

import jax.numpy as jnp

from rectdetect_tpu.ops.shifts import NEIGH8, pad2d, shifted
from rectdetect_tpu.ops.ccl import interior_mask


def _neighbor_count(nz):
    """#nonzero 8-neighbors (zero padding)."""
    h, w = nz.shape
    p = pad2d(nz.astype(jnp.int32), 1, "zero")
    cnt = jnp.zeros(nz.shape, jnp.int32)
    for dy, dx in NEIGH8:
        cnt = cnt + shifted(p, 1, dy, dx, h, w)
    return cnt


def simple_junction(img, positive_only: bool = False, x0=0,
                    w_total=None):
    """Neighbor-degree map (simpleJunction, oclpolyline.cl:66-87).

    out = 0 for background/isolated pixels, else 1 + #nonzero 8-neighbors.
    positive_only=True mirrors the oclrect.cl:74-95 variant which treats
    only values > 0 as set (labels can be -1 there).

    x0/w_total: global-x offset and true frame width when img is a
    halo-widened width tile (dist/tile.py) — the border guard then means
    the true frame border.
    """
    h, w = img.shape
    nz = (img > 0) if positive_only else (img != 0)
    cnt = 1 + _neighbor_count(nz)
    out = jnp.where(nz & (cnt > 1), cnt, 0)
    return jnp.where(interior_mask(h, w, 1, x0, w_total), out,
                     0).astype(jnp.int32)


def simple_connect_poly(jn, x0=0, w_total=None):
    """1px gap bridging on a junction-degree map (oclpolyline.cl:89-110).

    Input is the simpleJunction output; a background pixel becomes set when
    it lies between opposing degree-2 string ends in one of 8 patterns.
    Output is binarized (0/1); the 2px border is zero.
    """
    h, w = jn.shape
    p = pad2d(jn, 2, "zero")

    def n(dy, dx):
        return shifted(p, 2, dy, dx, h, w)

    set0 = jn != 0
    bridge = ((n(0, -2) != 0) & (n(0, -1) == 2) & (n(0, 1) == 2) & (n(0, 2) != 0))
    bridge |= ((n(-2, 0) != 0) & (n(-1, 0) == 2) & (n(1, 0) == 2) & (n(2, 0) != 0))
    bridge |= ((n(-2, -2) != 0) & (n(-1, -1) == 2) & (n(1, 1) == 2) & (n(2, 2) != 0))
    bridge |= ((n(-2, 2) != 0) & (n(-1, 1) == 2) & (n(1, -1) == 2) & (n(2, -2) != 0))
    bridge |= ((n(0, 2) != 0) & (n(0, 1) == 2) & (n(1, -1) == 2) & (n(1, -2) != 0))
    bridge |= ((n(0, -2) != 0) & (n(0, -1) == 2) & (n(1, 1) == 2) & (n(1, 2) != 0))
    bridge |= ((n(-2, 1) != 0) & (n(-1, 1) == 2) & (n(1, 0) == 2) & (n(2, 0) != 0))
    bridge |= ((n(-2, -1) != 0) & (n(-1, -1) == 2) & (n(1, 0) == 2) & (n(2, 0) != 0))
    out = jnp.where(set0 | bridge, 1, 0)
    return jnp.where(interior_mask(h, w, 2, x0, w_total), out,
                     0).astype(jnp.int32)


def simple_connect_rect(jn, x0=0, w_total=None):
    """The oclrect.cl:97-121 variant (different bridging patterns)."""
    h, w = jn.shape
    p = pad2d(jn, 1, "zero")

    def n(dy, dx):
        return shifted(p, 1, dy, dx, h, w)

    set0 = jn != 0
    bridge = ((n(0, -1) == 2) & (n(0, 1) != 0))
    bridge |= ((n(0, -1) != 0) & (n(0, 1) == 2))
    bridge |= ((n(-1, 0) == 2) & (n(1, 0) != 0))
    bridge |= ((n(-1, 0) != 0) & (n(1, 0) == 2))
    bridge |= ((n(-1, -1) == 2) & (n(1, 1) == 2))
    bridge |= ((n(-1, 1) == 2) & (n(1, -1) == 2))
    bridge |= ((n(0, 1) == 2) & (n(1, -1) == 2))
    bridge |= ((n(0, -1) == 2) & (n(1, 1) == 2))
    bridge |= ((n(-1, 1) == 2) & (n(1, 0) == 2))
    bridge |= ((n(-1, -1) == 2) & (n(1, 0) == 2))
    out = jnp.where(set0 | bridge, 1, 0)
    return jnp.where(interior_mask(h, w, 2, x0, w_total), out,
                     0).astype(jnp.int32)


def simple_connect2(conn, x0=0, w_total=None):
    """2-px gap bridging — an ACCURACY EXTENSION over the reference.

    The reference's thinning drops exactly two pixels at every staircase
    step of a shallow-slope edge (the NMS local-max test fails where the
    ridge changes rows), and its simpleConnect patterns only close 1-px
    gaps (oclrect.cl:97-121 / oclpolyline.cl:89-110) — so near-axis
    edges fragment into ~(1/slope)-px pieces that the polyline size
    filter (sizeThre=20) then discards, losing whole quad sides.  This
    stage sets the two background pixels of a straight 2-px gap when
    both flanks are chain ends (degree 2), in the 4 axis/diagonal
    directions.  Gated by PipelineConfig.bridge_gap2.
    """
    h, w = conn.shape
    nz = conn != 0
    deg = jnp.where(nz, 1 + _neighbor_count(nz), 0)
    p = pad2d(deg, 3, "zero")

    def n(dy, dx):
        return shifted(p, 3, dy, dx, h, w)

    fill = jnp.zeros((h, w), bool)
    for dy, dx in ((0, 1), (1, 0), (1, 1), (1, -1)):
        # ends at p-(dy,dx) and p+2(dy,dx): set p (and the mirrored
        # pattern sets the other gap pixel)
        a = (n(-dy, -dx) == 2) & (n(2 * dy, 2 * dx) == 2)
        b = (n(-2 * dy, -2 * dx) == 2) & (n(dy, dx) == 2)
        fill = fill | a | b
    out = jnp.where(nz | fill, 1, 0)
    return jnp.where(interior_mask(h, w, 2, x0, w_total), out,
                     0).astype(jnp.int32)


def stringify(img, parity: int, x0=0, w_total=None):
    """Checkerboard corner-thinning (stringify, oclpolyline.cl:112-124).

    On pixels of the given checkerboard parity: clear the pixel if it has
    both a vertical and a horizontal nonzero neighbor.  Applied twice
    (parity 0 then 1) to thin edges into 8-connected strings.
    """
    h, w = img.shape
    p = pad2d(img, 1, "zero")

    def n(dy, dx):
        return shifted(p, 1, dy, dx, h, w)

    corner = (((n(-1, 0) != 0) & (n(0, -1) != 0)) |
              ((n(-1, 0) != 0) & (n(0, 1) != 0)) |
              ((n(1, 0) != 0) & (n(0, -1) != 0)) |
              ((n(1, 0) != 0) & (n(0, 1) != 0)))
    yy = jnp.arange(h)[:, None]
    xx = jnp.arange(w)[None, :] + x0     # checkerboard is global-x based
    on_parity = ((yy + xx) & 1) == parity
    clear = on_parity & corner & interior_mask(h, w, 1, x0, w_total)
    return jnp.where(clear, 0, img).astype(jnp.int32)


def remove_branch(img, x0=0, w_total=None):
    """Keep only pixels with <= 2 nonzero neighbors (oclpolyline.cl:126-147)."""
    h, w = img.shape
    nz = img != 0
    cnt = _neighbor_count(nz)
    out = jnp.where(nz & (cnt <= 2), 1, 0)
    return jnp.where(interior_mask(h, w, 1, x0, w_total), out,
                     0).astype(jnp.int32)


def strings_chain(edge_bin, variant: str, x0=0, w_total=None,
                  bridge2: bool = False, bh: int = 128):
    """The full edge->strings morphology prefix as one op.

    variant "rect": junction -> connect_rect -> stringify x2
    (oclrect.c:265-272); "poly_branch": junction -> connect_poly ->
    stringify x2 -> removeBranch (oclpolyline.c stages 1-4).
    bridge2 inserts the simple_connect2 accuracy extension after the
    reference bridging (closes the 2-px staircase gaps of shallow
    edges; see its docstring).

    On TPU this dispatches to the fused Pallas kernel
    (ops/pallas_morph.py) — the 4-5 stencil chain runs per block in VMEM
    with intermediates never touching HBM; bit-exact vs this composition,
    including the x0/w_total offset form (halo-widened width tiles,
    dist/tile.py: border guards and the stringify checkerboard are
    frame-global via a column-map kernel input).
    """
    import jax
    if jax.default_backend() == "tpu":
        from rectdetect_tpu.ops.pallas_morph import morph_chain_pallas
        return morph_chain_pallas(edge_bin, variant, bh=bh, x0=x0,
                                  w_total=w_total, bridge2=bridge2)
    if variant == "rect":
        c = simple_connect_rect(
            simple_junction(edge_bin, positive_only=True, x0=x0,
                            w_total=w_total), x0, w_total)
        if bridge2:
            c = simple_connect2(c, x0, w_total)
        s = stringify(c, 0, x0, w_total)
        return stringify(s, 1, x0, w_total)
    c = simple_connect_poly(
        simple_junction(edge_bin, x0=x0, w_total=w_total), x0, w_total)
    if bridge2:
        c = simple_connect2(c, x0, w_total)
    s = stringify(c, 0, x0, w_total)
    return remove_branch(stringify(s, 1, x0, w_total), x0, w_total)
