"""Still-image rectangle detection (the reference's `rect` tool,
rect.cpp:47-138).

Usage: python -m rectdetect_tpu.apps.rect <image> [device] [output]
"""

from __future__ import annotations

import math
import sys

from rectdetect_tpu.apps import common


def main(argv=None) -> int:
    argv = sys.argv if argv is None else argv
    if len(argv) < 2:
        sys.stderr.write(
            f"Usage : {argv[0]} <image file name> [device number] "
            "[output file name]\n")
        common.print_devices()
        return -1

    extended = "--extended" in argv
    argv = [a for a in argv if a != "--extended"]
    did = int(argv[2]) if len(argv) >= 3 else 0
    common.pick_device(did)

    img = common.load_image_bgr(argv[1])

    import jax.numpy as jnp
    from rectdetect_tpu.pipeline.rect import rect_frame, live_rects
    from rectdetect_tpu.runtime import calibrate as cal

    # the reference autotunes and saves plan.txt when it is missing
    # (rect.cpp:86-101); here: calibrate capacities on this image
    ih, iw = img.shape[:2]
    from rectdetect_tpu.config import DEFAULT_CONFIG, EXTENDED_CONFIG
    base = EXTENDED_CONFIG if extended else DEFAULT_CONFIG
    cfg = cal.load_calibrated_config(ih, iw, cfg=base)
    if cfg == base:
        print("No plan")                              # vidrect.cpp:125
        cfg = cal.calibrate([jnp.asarray(img)], cfg=base)
    elif not cal.plan_fits(cfg, img):
        # a plan calibrated on a sparser scene class would silently
        # truncate this image's edge map — recalibrate on it instead
        print("Plan does not fit this image; recalibrating")
        cfg = cal.calibrate([jnp.asarray(img)], cfg=base)

    tan_aov = math.tan(72.0 / 2 / 180.0 * math.pi)   # rect.cpp:84
    res = rect_frame(jnp.asarray(img), tan_aov, cfg)
    rects = live_rects(res)

    # RECTDETECT_DUMP=<dir>: render every intermediate stage to PNG (the
    # reference's commented-out visualization hooks, oclrect.c:255-363)
    import os
    if os.environ.get("RECTDETECT_DUMP"):
        from rectdetect_tpu.pipeline.rect import rect_stage_images, \
            STAGE_KINDS
        from rectdetect_tpu.utils.debug import StageDumper
        dumper = StageDumper()
        for name, arr in rect_stage_images(jnp.asarray(img), cfg).items():
            dumper.add(name, STAGE_KINDS[name], arr)
        for path in dumper.flush():
            print(f"  dump: {path}")

    common.draw_rects(img, rects, common.RECT_STYLE_STILL)
    out = argv[3] if len(argv) >= 4 else "output.jpg"
    common.save_image_bgr(out, img)
    print(f"{len(rects)} rectangles -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
