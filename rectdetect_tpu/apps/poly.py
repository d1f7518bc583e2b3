"""Still-image edge -> polyline extraction (the reference's `poly` tool,
poly.cpp:47-196; writes output.png).

Usage: python -m rectdetect_tpu.apps.poly <image> [device]
"""

from __future__ import annotations

import sys

import numpy as np

from rectdetect_tpu.apps import common


def main(argv=None) -> int:
    argv = sys.argv if argv is None else argv
    if len(argv) < 2:
        sys.stderr.write(f"Usage : {argv[0]} <image file name> "
                         "[device number]\n")
        common.print_devices()
        return -1

    did = int(argv[2]) if len(argv) >= 3 else 0
    common.pick_device(did)

    img = common.load_image_bgr(argv[1])

    import jax.numpy as jnp
    from rectdetect_tpu.pipeline.poly import poly_frame, live_segments

    # poly.cpp:118-123: strength 500, minerror 1, sizeThre 20
    arena, _ = poly_frame(jnp.asarray(img), minerror=1.0, size_thre=20,
                          strength=500)
    segs = live_segments(arena)

    canvas = np.zeros_like(img)                      # poly.cpp:132 memset
    common.draw_segments(canvas, segs, alternating=True)
    common.save_image_bgr("output.png", canvas)
    print(f"{len(segs)} segments -> output.png")
    return 0


if __name__ == "__main__":
    sys.exit(main())
