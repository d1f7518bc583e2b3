"""Realtime video rectangle detection (the reference's `vidrect`,
vidrect.cpp:51-227).

Usage: python -m rectdetect_tpu.apps.vidrect [device] [input] [output] [AOV]
  input:  video file, or cam:<id>,<w>,<h>, default camera 0
  output: file path, or `-` for a window
  AOV:    horizontal angle of view in degrees (default 90; demo uses 72)
  --batch=N: TPU throughput mode — process N frames per dispatch
  (rect_frames); best for file transcoding, adds N frames of latency.
  --streams=N: multi-stream serving mode — N independent copies of the
  input (files only) served across all visible devices through the
  fault-tolerant StreamSupervisor (dist/stream.py); reports aggregate
  frames/s, writes stream 0's annotated output.
  --tiles=N: width-tile spatial parallelism — each frame is sharded over
  N chips (halo-exchange stencils, cross-tile CCL; dist/tile.py) for
  resolutions where one chip can't hold the frame pipeline at rate (4K).
  --trace=DIR: capture a jax profiler trace of the steady-state loop into
  DIR (view with tensorboard/xprof) — the CL-event-timestamp observability
  the reference's plan system provides (oclhelper.c:555-605), device-side.
"""

from __future__ import annotations

import math
import sys

from rectdetect_tpu.apps import common


def main(argv=None) -> int:
    argv = sys.argv if argv is None else argv
    batch = 0
    streams = 0
    tiles = 0
    trace_dir = None
    argv = [a for a in argv if not (a.startswith("--batch=") and
                                    (batch := int(a.split("=")[1])) >= 0)]
    argv = [a for a in argv if not (a.startswith("--streams=") and
                                    (streams := int(a.split("=")[1])) >= 0)]
    argv = [a for a in argv if not (a.startswith("--tiles=") and
                                    (tiles := int(a.split("=")[1])) >= 0)]
    extended = "--extended" in argv
    kept = []
    for a in argv:
        if a.startswith("--trace="):
            trace_dir = a.split("=", 1)[1] or None
        elif a == "--extended":
            pass
        else:
            kept.append(a)
    argv = kept
    if len(argv) < 2:
        sys.stderr.write(
            f"Usage : {argv[0]} [device number] [input video file] "
            "[output video file] [AOV]\n"
            "By specifying cam:<cam id>,<width>,<height> as an input, a "
            "camera can be used.\n"
            "Output is displayed on an window by specifying - to the "
            "output.\n"
            f"Example command line : {argv[0]} 0 cam:0,1280,720 - 72\n")
        common.print_devices()
        return -1

    import cv2

    did = int(argv[1]) if len(argv) >= 2 else 0
    dev = common.pick_device(did)

    from rectdetect_tpu.runtime.native import FramePump
    pump = FramePump(argv[2] if len(argv) >= 3 else None)
    iw, ih = pump.width, pump.height
    print(f"Resolution : {iw} x {ih}")

    aov = float(argv[4]) if len(argv) >= 5 else 90.0   # vidrect.cpp:112-116
    print(f"Horizontal angle of view : {aov:g} degrees")
    tan_aov = math.tan(aov / 2 / 180.0 * math.pi)

    writer = None
    winname = "Rectangle Detection Demo"
    if len(argv) < 4 or argv[3] == "-":
        cv2.namedWindow(winname, cv2.WINDOW_AUTOSIZE)
        print("\n>>>>> Press ENTER on the window to exit <<<<<")
    else:
        writer = common.open_writer(argv[3], iw, ih)

    from rectdetect_tpu.pipeline.video import VideoRectDetector, FpsMeter
    from rectdetect_tpu.runtime.calibrate import load_calibrated_config

    # loadPlan analog (rect.cpp:86 / vidrect.cpp:125): apply persisted
    # per-device calibration if present
    from rectdetect_tpu.config import DEFAULT_CONFIG, EXTENDED_CONFIG
    # batch serving pins the runtime capacity switches (a vmapped
    # lax.cond predicate would execute both branches — measured 3x
    # slower; see load_calibrated_config)
    cfg = load_calibrated_config(
        ih, iw, cfg=EXTENDED_CONFIG if extended else DEFAULT_CONFIG,
        batch=batch > 1)
    if tiles > 1 and (streams > 1 or batch > 1):
        sys.exit("--tiles cannot be combined with --streams/--batch")
    if trace_dir and (streams > 1 or batch > 1):
        sys.exit("--trace only supports the single-stream loop")
    if tiles > 1:
        import jax
        devs = jax.devices()
        if did + tiles > len(devs):
            sys.exit(f"--tiles={tiles} from device {did} needs "
                     f"{did + tiles} devices, have {len(devs)}")
        from rectdetect_tpu.pipeline.video import TiledVideoRectDetector
        det = TiledVideoRectDetector(tan_aov, cfg=cfg, n_tiles=tiles,
                                     devices=devs[did:did + tiles])
        print(f"width sharded over {tiles} tiles "
              f"(devices {did}..{did + tiles - 1})")
    else:
        det = VideoRectDetector(tan_aov, cfg=cfg, device=dev)
    meter = FpsMeter()
    frames = [None, None]
    n = 0

    if streams > 1:
        pump.close()
        return _run_streams(argv[2], writer, winname, tan_aov, cfg,
                            streams, meter)
    if batch > 1:
        return _run_batched(pump, writer, winname, tan_aov, cfg, batch,
                            meter)

    frame = pump.next(timeout_ms=5000)
    if frame is None:
        sys.exit("no frames")
    from rectdetect_tpu.runtime.calibrate import plan_fits
    if not plan_fits(cfg, frame):
        print("WARNING: the capacity plan does not fit this stream's "
              "scene density — detections may be truncated; run "
              "tools/calibrate_bench.py (or apps.rect on a sample "
              "frame) to recalibrate", file=sys.stderr)
    frames[n & 1] = frame
    det.enqueue(frames[n & 1])
    n += 1

    tracing = False
    if trace_dir:
        import jax
        jax.profiler.start_trace(trace_dir)
        tracing = True
        print(f"tracing to {trace_dir}")

    try:
        return _steady_loop(pump, det, writer, winname, frames, n, meter)
    finally:
        if tracing:
            import jax
            jax.profiler.stop_trace()
            print(f"trace written to {trace_dir}")


def _steady_loop(pump, det, writer, winname, frames, n, meter):
    import cv2
    while True:
        frame = pump.next(timeout_ms=5000)
        if frame is None:
            break
        frames[n & 1] = frame
        det.enqueue(frames[n & 1])
        n += 1

        rects = det.poll()                 # frame n-1 results
        canvas = frames[n & 1]
        common.draw_rects(canvas, rects, common.RECT_STYLE_VIDEO)

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


def _run_streams(path, writer, winname, tan_aov, cfg, n_streams, meter):
    """Multi-stream serving: N copies of a video file served across all
    devices via the fault-tolerant StreamSupervisor; stream 0's frames
    are annotated and written/shown, aggregate frames/s printed."""
    import cv2
    from rectdetect_tpu.apps import common
    from rectdetect_tpu.dist.stream import StreamSupervisor
    from rectdetect_tpu.runtime.native import FramePump

    pumps = [FramePump(path) for _ in range(n_streams)]
    sup = StreamSupervisor(tan_aov, cfg=cfg)
    print(f"{n_streams} streams over {len(sup.healthy_devices)} devices")
    done = 0
    while True:
        frames = [p.next(timeout_ms=5000) for p in pumps]
        if any(f is None for f in frames):
            break
        for sid, f in enumerate(frames):
            sup.submit(sid, f)
        for sid in range(n_streams):
            rects = sup.collect(sid)
            done += 1
            if sid == 0 and rects is not None:
                common.draw_rects(frames[0], rects,
                                  common.RECT_STYLE_VIDEO)
                if writer is not None:
                    writer.write(frames[0])
                else:
                    cv2.imshow(winname, frames[0])
                    cv2.waitKey(1)
            fps = meter.tick()
            if fps is not None:
                print(f"{fps:.3g} frames/s aggregate")
    for p in pumps:
        p.close()
    if writer is not None:
        writer.release()
    cv2.destroyAllWindows()
    print(f"{done} frames served")
    return 0


def _run_batched(pump, writer, winname, tan_aov, cfg, batch, meter):
    """Throughput mode: dispatch `batch` frames at once via rect_frames."""
    import cv2
    import numpy as np
    import jax.numpy as jnp
    from rectdetect_tpu.pipeline.rect import rect_frames, RectResult

    while True:
        group = []
        while len(group) < batch:
            f = pump.next(timeout_ms=5000)
            if f is None:
                break
            group.append(f)
        if not group:
            break
        # pad the tail group to the compiled batch shape
        padded = group + [group[-1]] * (batch - len(group))
        res = rect_frames(jnp.asarray(np.stack(padded)), tan_aov, cfg)
        c2 = np.asarray(res.c2)
        stat = np.asarray(res.status)
        ok = np.asarray(res.valid)
        for bi, frame in enumerate(group):
            rects = [{"c2": c2[bi, i], "status": int(stat[bi, i])}
                     for i in range(c2.shape[1]) if ok[bi, i]]
            common.draw_rects(frame, rects, common.RECT_STYLE_VIDEO)
            if writer is not None:
                writer.write(frame)
                fps = meter.tick()
                if fps is not None:
                    print(f"{fps:.3g} fps")
            else:
                cv2.imshow(winname, frame)
                if (cv2.waitKey(1) & 0xFF) in (27, 13):
                    return 0
        if len(group) < batch:
            break
    if writer is not None:
        writer.release()
    pump.close()
    cv2.destroyAllWindows()
    return 0


if __name__ == "__main__":
    sys.exit(main())
