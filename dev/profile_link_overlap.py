"""Characterize the dev-tunnel link: bandwidths, and whether h2d uploads,
d2h fetches, and device compute can overlap each other — the answer
decides the e2e pipelining design (max(link, device) vs sum).

All timings use wall clock around genuinely-blocking host calls
(device_get / np.asarray); block_until_ready can return early here.
"""
import time
from concurrent.futures import ThreadPoolExecutor

import jax
import jax.numpy as jnp
import numpy as np

MB = 1e6


def timed(label, f):
    t0 = time.perf_counter()
    out = f()
    dt = time.perf_counter() - t0
    print(f"{label}: {dt * 1e3:.1f} ms", flush=True)
    return out, dt


def main():
    print("platform:", jax.devices()[0].platform, flush=True)
    up = np.random.RandomState(0).randint(
        0, 255, (8, 480, 640, 3), np.uint8)           # 7.37 MB
    nbytes_up = up.nbytes

    # a compute of known duration: chained matmuls
    a = jnp.asarray(np.random.rand(4096, 4096).astype(np.float32))

    @jax.jit
    def burn(a, n):
        def body(_, x):
            return x @ a * (1.0 / 64.0)
        return jax.lax.fori_loop(0, n, body, a)[0, 0]

    float(np.asarray(burn(a, 4)))                      # compile
    # calibrate burn duration via scalar fetch
    t0 = time.perf_counter()
    float(np.asarray(burn(a, 64)))
    t_burn = time.perf_counter() - t0
    print(f"burn(64): {t_burn * 1e3:.1f} ms", flush=True)

    # --- h2d alone (blocking: force materialization via tiny use) -------
    def h2d():
        x = jax.device_put(up)
        x.block_until_ready()
        # force: fetch 1 byte derived from the array so the transfer is done
        return float(jnp.asarray(x[0, 0, 0, 0], jnp.float32))

    _, t_up = timed("h2d 7.37MB (incl dispatch)", h2d)
    _, t_up = timed("h2d 7.37MB (warm)", h2d)
    print(f"  -> h2d {nbytes_up / t_up / MB:.1f} MB/s", flush=True)

    # --- d2h alone -------------------------------------------------------
    big = jax.device_put(up)
    float(jnp.asarray(big[0, 0, 0, 0], jnp.float32))
    _, t_down = timed("d2h 7.37MB", lambda: np.asarray(big).sum())
    print(f"  -> d2h {nbytes_up / t_down / MB:.1f} MB/s", flush=True)

    # --- compute then upload: does h2d wait for the queued compute? -----
    def compute_then_up():
        r = burn(a, 64)                                # enqueue ~t_burn
        t0 = time.perf_counter()
        h2d()
        t_mid = time.perf_counter() - t0
        float(np.asarray(r))
        return t_mid

    t_mid = compute_then_up()
    print(f"h2d issued while burn(64) in flight: {t_mid * 1e3:.1f} ms "
          f"(serial would be ~{(t_burn + t_up) * 1e3:.0f}, overlapped "
          f"~{max(t_burn, t_up) * 1e3:.0f})", flush=True)

    # --- compute then fetch of an UNRELATED ready array ------------------
    def compute_then_down():
        r = burn(a, 64)
        t0 = time.perf_counter()
        np.asarray(big).sum()
        t_mid = time.perf_counter() - t0
        float(np.asarray(r))
        return t_mid

    t_mid = compute_then_down()
    print(f"d2h of ready array while burn(64) in flight: "
          f"{t_mid * 1e3:.1f} ms (serial ~{(t_burn + t_down) * 1e3:.0f}, "
          f"overlapped ~{max(t_burn, t_down) * 1e3:.0f})", flush=True)

    # --- h2d + d2h from two threads (full duplex?) -----------------------
    pool = ThreadPoolExecutor(2)
    t0 = time.perf_counter()
    f1 = pool.submit(h2d)
    f2 = pool.submit(lambda: np.asarray(big).sum())
    f1.result(); f2.result()
    t_both = time.perf_counter() - t0
    print(f"h2d || d2h: {t_both * 1e3:.1f} ms (serial "
          f"~{(t_up + t_down) * 1e3:.0f}, duplex ~"
          f"{max(t_up, t_down) * 1e3:.0f})", flush=True)
    pool.shutdown()


if __name__ == "__main__":
    main()
