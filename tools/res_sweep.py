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
    for h, w in ((360, 640), (720, 1280), (1080, 1920)):
        frames = [jax.device_put(synth_frame(h, w, seed=s)) for s in range(2)]
        f = jax.jit(lambda fr: rect_frame(fr, tan))
        r = f(frames[0]); np.asarray(r.value)[:1]
        t0 = time.perf_counter()
        for i in range(10):
            r = f(frames[i % 2])
        np.asarray(r.value)[:1]
        t = (time.perf_counter() - t0) / 10
        print(f"{w}x{h}: {t*1000:8.2f} ms  ({1/t:5.2f} fps)", flush=True)

if __name__ == "__main__":
    main()
