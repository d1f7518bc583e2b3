"""ctypes bindings for the native host runtime (native/rectrt.cpp), with a
pure-Python fallback for every facility.

Build: `cmake -S native -B native/build -G Ninja && ninja -C native/build`
(or `python -m rectdetect_tpu.runtime.native --build`).  The library is
looked up in native/build/, then $RECTRT_LIB."""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import sys
import threading
import time

_ROOT = pathlib.Path(__file__).resolve().parents[2]
_BUILD = _ROOT / "native" / "build"
_LIB: ctypes.CDLL | None = None
_TRIED = False


def build(verbose: bool = False) -> bool:
    """Compile the native library; returns success."""
    try:
        subprocess.run(["cmake", "-S", str(_ROOT / "native"), "-B",
                        str(_BUILD), "-G", "Ninja"],
                       check=True, capture_output=not verbose)
        subprocess.run(["ninja", "-C", str(_BUILD)], check=True,
                       capture_output=not verbose)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def load():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    candidates = [os.environ.get("RECTRT_LIB"),
                  str(_BUILD / "librectrt.so")]
    for c in candidates:
        if c and os.path.exists(c):
            try:
                lib = ctypes.CDLL(c)
            except OSError:
                continue
            lib.rectrt_time_ms.restype = ctypes.c_uint64
            lib.rectrt_plan_load.restype = ctypes.c_int
            lib.rectrt_plan_save.restype = ctypes.c_int
            lib.rectrt_pump_open.restype = ctypes.c_void_p
            lib.rectrt_pump_open.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                             ctypes.c_int, ctypes.c_int,
                                             ctypes.c_int]
            lib.rectrt_pump_next.restype = ctypes.c_int
            lib.rectrt_pump_next.argtypes = [ctypes.c_void_p,
                                             ctypes.c_void_p, ctypes.c_int]
            lib.rectrt_pump_width.argtypes = [ctypes.c_void_p]
            lib.rectrt_pump_height.argtypes = [ctypes.c_void_p]
            lib.rectrt_pump_close.argtypes = [ctypes.c_void_p]
            lib.rectrt_writer_open.restype = ctypes.c_void_p
            lib.rectrt_writer_open.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                               ctypes.c_int, ctypes.c_double]
            lib.rectrt_writer_write.argtypes = [ctypes.c_void_p,
                                                ctypes.c_void_p]
            lib.rectrt_writer_close.argtypes = [ctypes.c_void_p]
            lib.rectrt_bgr_to_packedlab.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int, ctypes.c_int]
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return load() is not None


# ------------------------------------------------------------- plan cache --

def plan_load(path: str, device: str) -> dict[str, str]:
    """Per-device calibration cache (loadPlan, oclhelper.c:394-443)."""
    lib = load()
    if lib is not None:
        buf = ctypes.create_string_buffer(1 << 20)
        n = lib.rectrt_plan_load(path.encode(), device.encode(), buf,
                                 len(buf))
        if n <= 0:
            return {}
        out = {}
        for line in buf.value.decode().splitlines():
            k, _, v = line.partition(" ")
            if k:
                out[k] = v
        return out
    # fallback
    out = {}
    cur = None
    want = device.replace(" ", "_")
    try:
        with open(path) as f:
            for line in f:
                line = line.rstrip("\n")
                if line.startswith("["):
                    cur = line.strip("[]")
                elif cur == want and " " in line:
                    k, _, v = line.partition(" ")
                    out[k] = v
    except OSError:
        return {}
    return out


def plan_save(path: str, device: str, entries: dict[str, str]) -> None:
    """savePlan (oclhelper.c:464-527): rewrites the device's section,
    preserving other devices'."""
    lib = load()
    content = "".join(f"{k} {v}\n" for k, v in entries.items())
    if lib is not None:
        lib.rectrt_plan_save(path.encode(), device.encode(),
                             content.encode())
        return
    # fallback
    want = device.replace(" ", "_")
    sections: dict[str, list[str]] = {}
    cur = None
    try:
        with open(path) as f:
            for line in f:
                line = line.rstrip("\n")
                if line.startswith("["):
                    cur = line.strip("[]")
                    sections.setdefault(cur, [])
                elif cur is not None and line:
                    sections[cur].append(line)
    except OSError:
        pass
    sections[want] = [ln for ln in content.splitlines()]
    with open(path, "w") as f:
        for name, lines in sections.items():
            f.write(f"[{name}]\n")
            for ln in lines:
                f.write(ln + "\n")


# -------------------------------------------------------------- frame pump --

class FramePump:
    """Threaded frame source with realtime newest-frame semantics.

    Native when librectrt.so is built (capture thread in C++, zero GIL
    contention); otherwise a Python thread over cv2."""

    def __init__(self, spec: str | None, cam_w: int = 0, cam_h: int = 0,
                 ring: int = 4, realtime: bool | None = None):
        import numpy as np
        self._np = np
        if realtime is None:
            # cameras: realtime (drop to newest); files: lossless
            realtime = spec is None or spec.startswith("cam:")
        self._realtime = realtime
        lib = load()
        self._lib = lib
        if lib is not None:
            self._h = lib.rectrt_pump_open(
                (spec or "").encode(), cam_w, cam_h, ring,
                1 if realtime else 0)
            if not self._h:
                raise RuntimeError(f"cannot open {spec!r}")
            self.width = lib.rectrt_pump_width(self._h)
            self.height = lib.rectrt_pump_height(self._h)
            return
        # Python fallback
        import cv2
        import queue
        from rectdetect_tpu.apps.common import open_capture
        self._cap = open_capture(spec)
        self.width = int(self._cap.get(cv2.CAP_PROP_FRAME_WIDTH))
        self.height = int(self._cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
        self._q = queue.Queue(maxsize=ring)
        self._eof = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self):
        import queue
        while True:
            ok, frame = self._cap.read()
            if not ok:
                self._eof = True
                self._q.put(None)
                return
            if self._realtime:
                # drop the oldest if full (newest-frame semantics)
                while True:
                    try:
                        self._q.put_nowait(frame)
                        break
                    except queue.Full:
                        try:
                            self._q.get_nowait()
                        except queue.Empty:
                            pass
            else:
                self._q.put(frame)          # backpressure

    def next(self, timeout_ms: int = 1000):
        """Next frame as (H,W,3) uint8 BGR, or None at end of stream.
        Realtime pumps return the newest frame (dropping stale ones);
        lossless pumps return frames in order."""
        np = self._np
        if self._lib is not None:
            out = np.empty((self.height, self.width, 3), np.uint8)
            r = self._lib.rectrt_pump_next(
                self._h, out.ctypes.data_as(ctypes.c_void_p), timeout_ms)
            if r < 0:
                return None
            return out
        import queue
        try:
            frame = self._q.get(timeout=timeout_ms / 1000.0)
        except queue.Empty:
            return None
        if frame is None:
            return None
        if self._realtime:
            while True:                      # drain to newest
                try:
                    nxt = self._q.get_nowait()
                except queue.Empty:
                    break
                if nxt is None:
                    break
                frame = nxt
        return frame

    def close(self):
        if self._lib is not None:
            self._lib.rectrt_pump_close(self._h)
            self._h = None
        else:
            self._cap.release()


def bgr_to_packedlab_host(bgr, n_threads: int = 0):
    """Native host-side packed-Lab staging; None if the library is absent
    (callers then use the on-chip conversion, which is the default path)."""
    lib = load()
    if lib is None:
        return None
    import numpy as np
    h, w = bgr.shape[:2]
    out = np.empty((h, w), np.int32)
    bgr = np.ascontiguousarray(bgr)
    lib.rectrt_bgr_to_packedlab(bgr.ctypes.data_as(ctypes.c_void_p),
                                out.ctypes.data_as(ctypes.c_void_p),
                                h * w, n_threads)
    return out


if __name__ == "__main__":
    if "--build" in sys.argv:
        ok = build(verbose=True)
        print("build:", "ok" if ok else "FAILED")
        sys.exit(0 if ok else 1)
    print("native available:", available())
