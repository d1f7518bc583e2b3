"""Realtime video polyline extraction (the reference's `vidpoly`,
vidpoly.cpp:45-262).

Usage: python -m rectdetect_tpu.apps.vidpoly [device] [input] [output]
"""

from __future__ import annotations

import sys

import numpy as np

from rectdetect_tpu.apps import common


def main(argv=None) -> int:
    argv = sys.argv if argv is None else argv
    if len(argv) < 2:
        sys.stderr.write(
            f"Usage : {argv[0]} [device number] [input video file] "
            "[output video file]\n"
            "By specifying cam:<cam id>,<width>,<height> as an input, a "
            "camera can be used.\n")
        common.print_devices()
        return -1

    import cv2

    did = int(argv[1]) if len(argv) >= 2 else 0
    dev = common.pick_device(did)

    from rectdetect_tpu.runtime.native import FramePump
    pump = FramePump(argv[2] if len(argv) >= 3 else None)
    iw, ih = pump.width, pump.height
    print(f"Resolution : {iw} x {ih}")

    writer = None
    winname = "Polyline Demo"
    if len(argv) < 4 or argv[3] == "-":
        cv2.namedWindow(winname, cv2.WINDOW_AUTOSIZE)
    else:
        writer = common.open_writer(argv[3], iw, ih)

    from rectdetect_tpu.pipeline.video import VideoPolyDetector, FpsMeter

    # vidpoly.cpp:151-166: strength 2000, minerror 1, sizeThre 10
    det = VideoPolyDetector(minerror=1.0, size_thre=10, strength=2000,
                            device=dev)
    meter = FpsMeter()
    n = 0

    frame = pump.next(timeout_ms=5000)
    if frame is None:
        sys.exit("no frames")
    det.enqueue(frame)
    n += 1

    while True:
        frame = pump.next(timeout_ms=5000)
        if frame is None:
            break
        det.enqueue(frame)
        n += 1

        segs = det.poll()
        canvas = np.zeros((ih, iw, 3), np.uint8)
        common.draw_segments(canvas, segs, alternating=False)

        if writer is not None:
            writer.write(canvas)
            fps = meter.tick()
            if fps is not None:
                print(f"{fps:.3g} fps")
        else:
            cv2.imshow(winname, canvas)
            key = cv2.waitKey(1) & 0xFF
            if key in (27, 13):
                break

    if writer is not None:
        writer.release()
    pump.close()
    cv2.destroyAllWindows()
    return 0


if __name__ == "__main__":
    sys.exit(main())
