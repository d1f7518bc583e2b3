"""rect_frame end-to-end latency at several resolutions (amortized
single-readback, N=10)."""
import sys, time, math
import numpy as np

def main():
    import jax, jax.numpy as jnp
    sys.path.insert(0, ".")
    from rectdetect_tpu.runtime.cache import enable_persistent_cache
    enable_persistent_cache()
    from rectdetect_tpu.pipeline.rect import rect_frame
    from bench import synth_frame
    tan = math.tan(math.radians(72) / 2)
    print(f"platform={jax.devices()[0].platform}", flush=True)
    for h, w in ((360, 640), (720, 1280), (1080, 1920),
                 (2160, 3840)):
        from rectdetect_tpu.runtime.calibrate import load_calibrated_config
        cfg = load_calibrated_config(h, w)
        frames = [jax.device_put(synth_frame(h, w, seed=s)) for s in range(2)]
        f = jax.jit(lambda fr: rect_frame(fr, tan, cfg))
        for attempt in range(3):            # relay compiles can flake
            try:
                r = f(frames[0]); np.asarray(r.value)[:1]
                break
            except Exception as e:
                print(f"{w}x{h}: attempt {attempt} failed: "
                      f"{str(e)[:100]}", flush=True)
        else:
            continue
        t0 = time.perf_counter()
        for i in range(10):
            r = f(frames[i % 2])
        np.asarray(r.value)[:1]
        t = (time.perf_counter() - t0) / 10
        print(f"{w}x{h}: {t*1000:8.2f} ms  ({1/t:5.2f} fps)", flush=True)

if __name__ == "__main__":
    main()
